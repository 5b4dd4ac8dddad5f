"""Composed incremental CRAWL-DEDUP loop.

A crawler hands the engine one increment at a time; each increment is
screened against ALL previously committed content through the three
dedup tiers — exact (sha vs the lake), near-dup (persisted minhash band
index), fuzzy identity (persisted deletion-key index) — then the
survivors commit and the indices EXTEND by appending the increment's
key rows (no corpus re-keying, ever).  Round 2 plants collisions
against round-1 commits, so a match found there proves the appended
index state works, not just the initial build.
"""

import pyarrow as pa
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.pipelines.ingest import ingest
from etl_cms_ray.stages.dedup import (
    build_minhash_band_index,
    incremental_exact_dedup,
    incremental_minhash_pairs,
    minhash_band_batch,
)
from etl_cms_ray.stages.fuzzy import (
    build_fuzzy_key_index,
    deletion_key_table,
    fuzzy_pairs,
    incremental_fuzzy_pairs,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(rows):
    return pa.table({
        "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
        "text": pa.array([r[1] for r in rows], type=pa.string()),
        "name": pa.array([r[2] for r in rows], type=pa.string()),
    })


def _events_of(t: pa.Table, epoch: int) -> pa.Table:
    n = t.num_rows
    return pa.table({
        "repo": pa.array(["crawl"] * n, type=pa.string()),
        "path": t["name"],
        "op": pa.array(["update"] * n, type=pa.string()),
        "commit": pa.array([f"c{epoch}"] * n, type=pa.string()),
        "epoch": pa.array([epoch] * n, type=pa.int64()),
        "seq": pa.array(range(n), type=pa.int64()),
        "lang": pa.array(["py"] * n, type=pa.string()),
        "content": t["text"],
    })


def test_crawl_dedup_loop(tmp_path):
    base_texts = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "red orange yellow green blue indigo violet cyan magenta",
        "north south east west up down left right forward backward",
    ]
    committed = [(i, base_texts[i], f"doc_{i:04d}.txt")
                 for i in range(len(base_texts))]
    lake_root = str(tmp_path / "crawl_lake")
    cfg = EngineConfig(lake_root=lake_root, num_partitions=8)
    ingest(ray.data.from_arrow(_events_of(_docs(committed), 0)), cfg)
    mh_idx = str(tmp_path / "mh_idx")
    fz_idx = str(tmp_path / "fz_idx")
    build_minhash_band_index(ray.data.from_arrow(_docs(committed)), mh_idx)
    build_fuzzy_key_index(ray.data.from_arrow(_docs(committed)), fz_idx,
                          id_col="doc_id", name_col="name")

    all_rows = list(committed)
    next_id = 100
    for rnd in (1, 2):
        # increment: one brand-new doc, one EXACT dup of a committed
        # text, one NEAR dup of a doc committed in the PREVIOUS round,
        # one fuzzy variant of a previous-round name
        prev = all_rows[-1]
        fresh = (next_id, f"fresh words round {rnd} " * 3 + "tail",
                 f"new_{rnd:04d}.txt")
        exact_dup = (next_id + 1, all_rows[0][1], f"dup_{rnd:04d}.txt")
        near = (next_id + 2, prev[1] + " zqnear", f"near_{rnd:04d}.txt")
        fuzzy_var = (next_id + 3, f"totally different text {rnd} " * 2,
                     prev[2][:-5] + "X.txt")  # one substitution in name
        batch = [fresh, exact_dup, near, fuzzy_var]
        bt = _docs(batch)
        bds = ray.data.from_arrow(bt)

        # tier 1: exact vs the lake — only the replayed content drops
        surv = incremental_exact_dedup(
            bds, lake_root, lake_content_col="content").to_pandas()
        assert set(surv["doc_id"]) == {fresh[0], near[0], fuzzy_var[0]}

        # tier 2: near-dup probe against the PERSISTED band index
        all_ds = ray.data.from_arrow(_docs(all_rows)).union(bds)
        pairs = incremental_minhash_pairs(
            bds, mh_idx, all_ds, threshold=0.5,
            text_type=pa.string()).to_pandas()
        hit = set(map(tuple, pairs[["a", "b"]].to_numpy()))
        assert (prev[0], near[0]) in hit or (near[0], prev[0]) in hit
        # every reported pair involves a new doc
        new_ids = {r[0] for r in batch}
        assert all(a in new_ids or b in new_ids for a, b in hit)

        # tier 3: fuzzy identity probe against the PERSISTED key index
        fz = incremental_fuzzy_pairs(
            bds, fz_idx, id_col="doc_id", name_col="name").to_pandas()
        fz_pairs = set(map(tuple, fz[["a", "b"]].to_numpy()))
        assert (prev[0], fuzzy_var[0]) in fz_pairs
        # probe == full recompute restricted to new-involving pairs
        full = fuzzy_pairs(ray.data.from_arrow(
            _docs(all_rows + batch)), id_col="doc_id",
            name_col="name").to_pandas()
        full_pairs = {(a, b) for a, b in
                      map(tuple, full[["a", "b"]].to_numpy())
                      if a in new_ids or b in new_ids}
        assert fz_pairs == full_pairs

        # commit survivors; EXTEND both indices by appending the
        # increment's key rows (no rebuild — Ray write_parquet into the
        # existing dir adds files, and the probes read the whole dir)
        keep = [r for r in batch if r[0] in set(surv["doc_id"])]
        ingest(ray.data.from_arrow(_events_of(_docs(keep), rnd)), cfg)
        kd = ray.data.from_arrow(_docs(keep))
        kd.map_batches(minhash_band_batch,
                       batch_format="pyarrow").write_parquet(mh_idx)
        kd.map_batches(
            lambda t: deletion_key_table(t, id_col="doc_id",
                                         name_col="name"),
            batch_format="pyarrow").write_parquet(fz_idx)
        all_rows += keep
        next_id += 10
