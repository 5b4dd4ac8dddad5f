"""Merge-on-read commit mode: delta append, auto-compaction, read paths,
replay, equivalence with copy-on-write."""

import glob
import os

import pyarrow.compute as pc
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos, make_schema_changes
from etl_cms_ray.oracle import replay, tables_equal_by_sha
from etl_cms_ray.pipelines.ingest import ingest, read_lake, read_lake_table
from etl_cms_ray.schema import SchemaRegistry
from etl_cms_ray.state.manifest import LakeStore


def _cfg(tmp_path, name, **kw):
    return EngineConfig(lake_root=str(tmp_path / name), num_partitions=8, **kw)


def test_mor_incremental_matches_oracle(ray_session, tmp_path):
    """Epoch-at-a-time MOR ingest: base written on first commit, deltas
    appended after, merged state equals the oracle at every step."""
    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=50, scenario="tombstone")
    cfg = _cfg(tmp_path, "lake_mor", commit_mode="mor")
    for ep in range(4):
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        if chunk.num_rows:
            ingest(ray.data.from_arrow(chunk), cfg)
        expected = replay(ev, through_epoch=ep)
        assert tables_equal_by_sha(read_lake_table(cfg.lake_root), expected), f"epoch {ep}"

    store = LakeStore(cfg.lake_root)
    m = store.load_manifest()
    assert m.has_deltas()  # later commits appended deltas, not base rewrites
    deltas = glob.glob(os.path.join(cfg.lake_root, "data", "**", "delta-*.parquet"),
                       recursive=True)
    assert deltas


def test_mor_equals_cow(ray_session, tmp_path):
    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=60, scenario="outoforder")
    import pyarrow.compute as pc

    cfg_mor = _cfg(tmp_path, "l_mor", commit_mode="mor")
    cfg_cow = _cfg(tmp_path, "l_cow")
    for ep in range(4):
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        if chunk.num_rows:
            ingest(ray.data.from_arrow(chunk), cfg_mor)
            ingest(ray.data.from_arrow(chunk), cfg_cow)
    assert tables_equal_by_sha(
        read_lake_table(cfg_mor.lake_root), read_lake_table(cfg_cow.lake_root)
    )


def test_mor_auto_compaction(ray_session, tmp_path):
    """At max_deltas the applier folds deltas back into the base."""
    repos = make_repos(2, 4)
    cfg = _cfg(tmp_path, "lake_compact", commit_mode="mor", max_deltas=3)
    all_ev = make_events(repos, n_epochs=6, events_per_epoch=20)
    for ep in range(7):
        chunk = all_ev.filter(pc.equal(all_ev["epoch"], ep))
        if chunk.num_rows:
            ingest(ray.data.from_arrow(chunk), cfg)
    store = LakeStore(cfg.lake_root)
    m = store.load_manifest()
    # after enough commits every partition compacted at least once:
    # delta chains never reach max_deltas
    assert all(len(ps.deltas) < 3 for ps in m.partitions.values())
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(all_ev))


def test_mor_replay_and_read_lake_dataset(ray_session, tmp_path):
    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40, scenario="tombstone")
    cfg = _cfg(tmp_path, "lake_mor_rd", commit_mode="mor")
    import pyarrow.compute as pc

    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 0))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 0))), cfg)
    # exactly-once replay under mor
    res = ingest(ray.data.from_arrow(ev), cfg)
    assert res.events_applied == 0
    expected = replay(ev)
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), expected)
    # Dataset read path merges deltas too; pruning works
    ds = read_lake(cfg.lake_root)
    assert ds.count() == expected.num_rows
    pruned = read_lake(cfg.lake_root, columns=["repo", "path", "size"]).to_pandas()
    assert set(pruned.columns) == {"repo", "path", "size"}
    assert len(pruned) == expected.num_rows


def test_mor_with_schema_evolution(ray_session, tmp_path):
    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=4, events_per_epoch=40)
    changes = make_schema_changes()
    cfg = _cfg(tmp_path, "lake_mor_evo", commit_mode="mor")
    import pyarrow.compute as pc

    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg,
           schema_changes=changes)
    expected = replay(ev, registry=SchemaRegistry(changes=changes))
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), expected)


def test_explicit_compact_and_audit(ray_session, tmp_path):
    from etl_cms_ray.pipelines.maintenance import audit_lake, compact_lake

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40, scenario="tombstone")
    cfg = _cfg(tmp_path, "lake_mor_cpt", commit_mode="mor")
    for ep in range(4):
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        if chunk.num_rows:
            ingest(ray.data.from_arrow(chunk), cfg)
    store = LakeStore(cfg.lake_root)
    assert store.load_manifest().has_deltas()
    # audit works on the un-compacted (merge-on-read) lake
    assert audit_lake(cfg.lake_root)["healthy"]

    before = read_lake_table(cfg.lake_root)
    m = compact_lake(cfg.lake_root)
    assert not store.load_manifest().has_deltas()
    assert m.metrics["partitions_compacted"] > 0
    after = read_lake_table(cfg.lake_root)
    assert tables_equal_by_sha(before, after)
    audit = audit_lake(cfg.lake_root)
    assert audit["healthy"] and audit["rows_expected"] == after.num_rows
    # ingest continues after compaction, replay fenced
    res = ingest(ray.data.from_arrow(ev), cfg)
    assert res.events_applied == 0


def test_auto_maintain_policy_sweep(ray_session, tmp_path):
    """auto_maintain composes the engine's fenced ops into one idempotent
    policy sweep: compacts when delta depth hits the bound, refreshes
    the token index + a sorted projection incrementally, reports planted
    orphans, and a second run is a full no-op (nothing rebuilt)."""
    from etl_cms_ray.pipelines.index import build_token_index, token_search
    from etl_cms_ray.pipelines.maintenance import audit_lake, auto_maintain
    from etl_cms_ray.pipelines.projection import build_projection

    repos = make_repos(4, 8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=60,
                     scenario="tombstone")
    cfg = _cfg(tmp_path, "lake_am", commit_mode="mor", max_deltas=8)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    build_token_index(cfg.lake_root, column="content", num_buckets=512)
    build_projection(cfg.lake_root, "by_size", "size", num_ranges=4)

    # second commit: deltas deepen, artifacts go stale, plant debris
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    debris = os.path.join(cfg.lake_root, "data", "part=00001",
                          "crashed-writer.parquet")
    os.makedirs(os.path.dirname(debris), exist_ok=True)
    with open(debris, "wb") as f:
        f.write(b"debris")

    rep = auto_maintain(cfg.lake_root, compact_delta_depth=1,
                        orphan_grace_sec=0.0)
    assert rep["compacted"], "delta chain at depth >=1 must compact"
    assert rep["index"]["rebuilt"] >= 1
    assert rep["projections"]["by_size"] is not None
    assert [os.path.basename(o["file"]) for o in rep["orphans"]] == [
        "crashed-writer.parquet"]
    store = LakeStore(cfg.lake_root)
    assert not store.load_manifest().has_deltas()
    assert audit_lake(cfg.lake_root)["healthy"]
    # the refreshed index answers correctly post-compaction
    assert token_search(cfg.lake_root, "def").count() >= 0

    # idempotence: a quiet lake needs nothing
    rep2 = auto_maintain(cfg.lake_root, compact_delta_depth=1,
                         orphan_grace_sec=0.0)
    assert not rep2["compacted"]
    assert rep2["index"]["rebuilt"] == 0
    assert rep2["projections"]["by_size"]["changed_parts"] == 0
    assert [os.path.basename(o["file"]) for o in rep2["orphans"]] == [
        "crashed-writer.parquet"]  # report-only: still there until expire


def test_auto_maintain_skew_rebalance(ray_session, tmp_path):
    """The freshness report's skew signal, ACTED on: keys chosen to hash
    into one partition trigger the opt-in rebalance policy (partition
    count doubles, content byte-identical, replay still a fenced
    no-op); a balanced lake never rebalances."""
    import pyarrow as pa

    import ray.data

    from etl_cms_ray.functions.hashing import part_id_one
    from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
    from etl_cms_ray.pipelines.maintenance import audit_lake, auto_maintain
    from etl_cms_ray.state.manifest import LakeStore

    nparts = 4
    hot, cold = [], []
    i = 0
    while len(hot) < 40 or len(cold) < 6:
        key = ("r0", f"f{i:05d}.py")
        if part_id_one(*key, nparts) == 0 and len(hot) < 40:
            hot.append(key)
        elif part_id_one(*key, nparts) != 0 and len(cold) < 6:
            cold.append(key)
        i += 1
    keys = hot + cold
    ev = pa.table({
        "repo": pa.array([k[0] for k in keys], type=pa.string()),
        "path": pa.array([k[1] for k in keys], type=pa.string()),
        "op": pa.array(["update"] * len(keys), type=pa.string()),
        "commit": pa.array(["c0"] * len(keys), type=pa.string()),
        "epoch": pa.array([0] * len(keys), type=pa.int64()),
        "seq": pa.array(range(len(keys)), type=pa.int64()),
        "lang": pa.array(["py"] * len(keys), type=pa.string()),
        "content": pa.array([f"body {k[1]}" for k in keys],
                            type=pa.string()),
    })
    from etl_cms_ray.config import EngineConfig

    cfg = EngineConfig(lake_root=str(tmp_path / "skew_lake"),
                       num_partitions=nparts)
    ingest(ray.data.from_arrow(ev), cfg)
    before = read_lake_table(cfg.lake_root).sort_by(
        [("repo", "ascending"), ("path", "ascending")])

    rep = auto_maintain(cfg.lake_root, rebalance_skew_ratio=4.0,
                        rebalance_max_partitions=8)
    assert rep["rebalanced"] and rep["rebalanced"]["to_partitions"] == 8
    m = LakeStore(cfg.lake_root).load_manifest()
    assert m.num_partitions == 8
    after = read_lake_table(cfg.lake_root).sort_by(
        [("repo", "ascending"), ("path", "ascending")])
    assert before.equals(after)
    assert audit_lake(cfg.lake_root)["healthy"]
    # fences survived: full replay applies nothing (config follows the
    # manifest's authoritative bucket count, as the CLI does)
    cfg8 = EngineConfig(lake_root=cfg.lake_root, num_partitions=8)
    res = ingest(ray.data.from_arrow(ev), cfg8)
    assert res.events_applied == 0
    # the growth cap stops adversarial hash-residue clumping (these
    # synthetic hot keys collide at every width) from doubling forever
    rep2 = auto_maintain(cfg.lake_root, rebalance_skew_ratio=4.0,
                         rebalance_max_partitions=8)
    assert not rep2["rebalanced"]
    assert LakeStore(cfg.lake_root).load_manifest().num_partitions == 8
