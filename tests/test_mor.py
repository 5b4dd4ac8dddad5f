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
