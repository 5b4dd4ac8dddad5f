"""Queryable lake metadata tables (pipelines/meta.py): files /
partitions / snapshots reflect the manifest exactly, across CoW
commits, MOR deltas and tags — zero data reads (contract: values come
from the manifest the other state tests already pin)."""

import os
import tempfile

import pyarrow.compute as pc
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest
from etl_cms_ray.pipelines.meta import (
    lake_files,
    lake_partitions,
    lake_snapshots,
)
from etl_cms_ray.state.manifest import LakeStore

pytestmark = pytest.mark.fast


@pytest.fixture()
def two_commit_lake(ray_session, tmp_path):
    root = str(tmp_path / "metalake")
    ev = make_events(make_repos(4, 8), n_epochs=4, events_per_epoch=50)
    cfg = EngineConfig(lake_root=root, num_partitions=8)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    return root


def test_lake_files_matches_manifest(two_commit_lake):
    root = two_commit_lake
    store = LakeStore(root)
    m = store.load_manifest()
    df = lake_files(root).to_pandas()
    assert sorted(df["path"]) == sorted(m.live_files())
    assert (df["kind"] == "base").all()  # CoW lake: no deltas
    # per-file bytes are real stat sizes
    for _, r in df.iterrows():
        assert r["bytes"] == os.stat(os.path.join(root, r["path"])).st_size
    # row counts per partition agree with the manifest
    for _, r in df.iterrows():
        assert r["rows"] == m.part(int(r["part_id"])).rows
    # version pinning: v1 lists fewer/equal files and older fences
    df1 = lake_files(root, version=1).to_pandas()
    assert df1["applied_through_epoch"].max() <= \
        df["applied_through_epoch"].max()


def test_lake_partitions_and_mor_depth(ray_session, tmp_path):
    root = str(tmp_path / "morlake")
    ev = make_events(make_repos(4, 8), n_epochs=4, events_per_epoch=50)
    cfg = EngineConfig(lake_root=root, num_partitions=8, commit_mode="mor",
                       max_deltas=10)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    df = lake_partitions(root).to_pandas()
    m = LakeStore(root).load_manifest()
    assert set(df["part_id"]) == set(m.partitions.keys())
    for _, r in df.iterrows():
        ps = m.part(int(r["part_id"]))
        assert r["delta_depth"] == len(ps.deltas)
        assert r["n_files"] == len(ps.all_files())
    # the second MOR commit left at least one live delta somewhere
    assert df["delta_depth"].max() >= 1
    files = lake_files(root).to_pandas()
    assert (files[files["kind"] == "delta"]["rows"].isna()).all()


def test_lake_snapshots_versions_tags_rows(two_commit_lake):
    root = two_commit_lake
    store = LakeStore(root)
    store.set_tag("first", 1)
    df = lake_snapshots(root).to_pandas().set_index("version")
    assert list(df.index) == [1, 2]
    assert bool(df.loc[2, "is_current"]) and not bool(df.loc[1, "is_current"])
    assert df.loc[1, "tag"] == "first" and df.loc[2, "tag"] is None
    # total_rows matches the manifests' own counts
    for v in (1, 2):
        m = store.load_manifest(v)
        assert df.loc[v, "total_rows"] == sum(
            ps.rows for ps in m.partitions.values())
    assert df.loc[2, "max_fence"] > df.loc[1, "max_fence"]
    # commit timestamps come from lineage and are ordered
    assert df.loc[2, "committed_ts"] >= df.loc[1, "committed_ts"] > 0


def test_fast_count_cow_and_mor(ray_session, tmp_path):
    """fast_count == read_lake().count() on a pure-metadata CoW lake
    (zero unknown partitions) AND on a MOR lake with live deltas
    (unknown partitions folded), including a pinned snapshot version."""
    from etl_cms_ray.pipelines.ingest import read_lake
    from etl_cms_ray.pipelines.meta import fast_count

    ev = make_events(make_repos(4, 8), n_epochs=4, events_per_epoch=50)

    cow = str(tmp_path / "fc_cow")
    cfg = EngineConfig(lake_root=cow, num_partitions=8)
    ingest(ray.data.from_arrow(ev), cfg)
    m = LakeStore(cow).load_manifest()
    assert all(ps.rows >= 0 for ps in m.partitions.values())
    assert fast_count(cow) == read_lake(cow, columns=["repo"]).count()

    mor = str(tmp_path / "fc_mor")
    cfg = EngineConfig(lake_root=mor, num_partitions=8, commit_mode="mor",
                       max_deltas=10)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    m = LakeStore(mor).load_manifest()
    assert any(ps.rows < 0 for ps in m.partitions.values())
    assert fast_count(mor) == read_lake(mor, columns=["repo"]).count()
    # version-pinned count equals the v1 snapshot's size
    from etl_cms_ray.pipelines.history import read_snapshot
    assert fast_count(mor, version=1) == \
        read_snapshot(mor, 1).count()


def test_fast_minmax_cow_mor_and_missing_stats(ray_session, tmp_path):
    """fast_minmax == exact min/max of the live relation: zone-map-served
    on delta-free partitions, folded on live-delta MOR partitions and on
    columns without recorded stats (e.g. content-like strings)."""
    import pyarrow.compute as pa_pc

    from etl_cms_ray.pipelines.ingest import read_lake
    from etl_cms_ray.pipelines.meta import fast_minmax

    ev = make_events(make_repos(4, 8), n_epochs=4, events_per_epoch=50)

    def exact(root, col):
        t = read_lake(root, columns=[col]).to_pandas()[col]
        return t.min(), t.max()

    cow = str(tmp_path / "fmm_cow")
    ingest(ray.data.from_arrow(ev),
           EngineConfig(lake_root=cow, num_partitions=8))
    assert fast_minmax(cow, "size") == exact(cow, "size")
    # path records no stats (high-distinct string) -> every partition
    # takes the fold path even on a CoW lake, still exact
    assert fast_minmax(cow, "path") == exact(cow, "path")

    mor = str(tmp_path / "fmm_mor")
    cfg = EngineConfig(lake_root=mor, num_partitions=8, commit_mode="mor",
                       max_deltas=10)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    m = LakeStore(mor).load_manifest()
    assert any(ps.deltas for ps in m.partitions.values())
    assert fast_minmax(mor, "size") == exact(mor, "size")


def test_fast_minmax_exact_after_gdpr_purge(ray_session, tmp_path):
    """A gdpr purge rewrites subject-bearing files; the rewritten
    partitions' zone maps are stale (computed over pre-purge rows), so
    they must be invalidated — fast_minmax must never report the purged
    subject's extremes as live values (r4 ADVICE high)."""
    from etl_cms_ray.pipelines.ingest import read_lake
    from etl_cms_ray.pipelines.maintenance import purge_history
    from etl_cms_ray.pipelines.meta import fast_minmax

    ev = make_events(make_repos(4, 8), n_epochs=4, events_per_epoch=50)
    root = str(tmp_path / "fmm_purge")
    ingest(ray.data.from_arrow(ev), EngineConfig(lake_root=root,
                                                 num_partitions=8))
    live = read_lake(root, columns=["repo", "size"]).to_pandas()
    # purge the repo holding the GLOBAL max so a stale zone map would
    # provably report a value no live row holds
    victim = live.loc[live["size"].idxmax(), "repo"]
    purge_history(root, victim)
    kept = live[live["repo"] != victim]["size"]
    assert fast_minmax(root, "size") == (kept.min(), kept.max())
    live2 = read_lake(root, columns=["repo"]).to_pandas()
    assert victim not in set(live2["repo"])


def test_fast_minmax_backfill_default_after_schema_add(ray_session, tmp_path):
    """A column added by schema evolution AFTER the last write must
    surface its backfill default through fast_minmax (promotion at
    registry.latest_version, matching read_lake — r4 ADVICE low)."""
    from etl_cms_ray.pipelines.ingest import read_lake
    from etl_cms_ray.pipelines.meta import fast_count, fast_minmax
    from etl_cms_ray.schema import SchemaChange

    ev = make_events(make_repos(4, 8), n_epochs=2, events_per_epoch=50)
    root = str(tmp_path / "fmm_evolve")
    ingest(ray.data.from_arrow(ev), EngineConfig(lake_root=root,
                                                 num_partitions=8))
    store = LakeStore(root)
    reg = store.load_registry()
    reg.changes.append(SchemaChange(epoch=99, change="add_column",
                                    column="stars", type_name="int64",
                                    default=7))
    store.save_registry(reg)
    df = read_lake(root, columns=["stars"]).to_pandas()["stars"]
    assert fast_minmax(root, "stars") == (df.min(), df.max()) == (7, 7)
    assert fast_count(root) == len(df)
