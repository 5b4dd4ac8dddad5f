"""Named snapshot refs (tags): pinning against expire_snapshots, read
by name, immutability, and the sha guard against manifest version reuse
after rollback + roll-forward."""

import shutil

import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.history import read_snapshot
from etl_cms_ray.pipelines.ingest import ingest
from etl_cms_ray.pipelines.maintenance import expire_snapshots
from etl_cms_ray.state.manifest import LakeStore

LAKE = "/tmp/test_tags_lake"


@pytest.fixture()
def lake(ray_session):
    shutil.rmtree(LAKE, ignore_errors=True)
    repos = make_repos(n_repos=4, files_per_repo=6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=30)
    cfg = EngineConfig(lake_root=LAKE, num_partitions=8)
    r1 = ingest(rd.from_arrow(ev.filter(pc.equal(ev["epoch"], 0))), cfg)
    r2 = ingest(rd.from_arrow(ev.filter(pc.equal(ev["epoch"], 1))), cfg)
    r3 = ingest(rd.from_arrow(ev.filter(pc.equal(ev["epoch"], 2))), cfg)
    return LAKE, ev, cfg, (r1, r2, r3)


def test_set_resolve_delete(lake):
    lake_root, _ev, _cfg, (r1, _r2, _r3) = lake
    store = LakeStore(lake_root)
    store.set_tag("v1_backfill", version=r1.manifest_version)
    assert store.resolve_ref("v1_backfill") == r1.manifest_version
    assert store.resolve_ref(r1.manifest_version) == r1.manifest_version
    assert store.resolve_ref(str(r1.manifest_version)) == r1.manifest_version
    assert "v1_backfill" in store.tags()
    with pytest.raises(ValueError):  # tags are immutable
        store.set_tag("v1_backfill")
    with pytest.raises(KeyError):
        store.resolve_ref("no_such_tag")
    store.delete_tag("v1_backfill")
    assert store.tags() == {}
    with pytest.raises(KeyError):
        store.delete_tag("v1_backfill")


def test_tag_read_equals_version_read(lake):
    lake_root, _ev, _cfg, (r1, _r2, _r3) = lake
    LakeStore(lake_root).set_tag("base", version=r1.manifest_version)
    by_tag = read_snapshot(lake_root, version="base").to_pandas()
    by_ver = read_snapshot(lake_root, version=r1.manifest_version).to_pandas()
    cols = sorted(by_tag.columns)
    a = by_tag[cols].sort_values(cols).reset_index(drop=True)
    b = by_ver[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b) and len(a) > 0


def test_expire_pins_tagged_version(lake):
    lake_root, _ev, _cfg, (r1, _r2, r3) = lake
    store = LakeStore(lake_root)
    expected = read_snapshot(lake_root, version=r1.manifest_version).to_pandas()
    store.set_tag("base", version=r1.manifest_version)
    rep = expire_snapshots(lake_root, keep_last=1)
    assert r1.manifest_version in rep["kept_versions"]
    assert r3.manifest_version in rep["kept_versions"]
    # the untagged middle version is gone, the tagged one stays readable
    got = read_snapshot(lake_root, version="base").to_pandas()
    cols = sorted(expected.columns)
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = expected[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)
    # after the tag is dropped, expiry reclaims the old version
    store.delete_tag("base")
    rep2 = expire_snapshots(lake_root, keep_last=1)
    assert r1.manifest_version not in rep2["kept_versions"]
    with pytest.raises(FileNotFoundError):
        read_snapshot(lake_root, version=r1.manifest_version)


def test_sha_guard_on_version_reuse(lake):
    lake_root, ev, cfg, (r1, r2, _r3) = lake
    store = LakeStore(lake_root)
    store.set_tag("at_v2", version=r2.manifest_version)
    # rollback past v2, then roll forward: the reused version number now
    # names DIFFERENT manifest content (epoch 1+2 applied in one commit)
    store.rollback(r1.manifest_version)
    ingest(rd.from_arrow(ev.filter(pc.greater(ev["epoch"], 0))), cfg)
    assert store.current_version() == r2.manifest_version
    with pytest.raises(RuntimeError, match="rewritten"):
        store.resolve_ref("at_v2")


# -- as-of-timestamp resolution (Iceberg snapshot-as-of analog) ----------


def test_resolve_as_of_between_commits(lake):
    lake_root, _ev, _cfg, (r1, r2, r3) = lake
    store = LakeStore(lake_root)
    lin = [r for r in store.read_lineage() if "manifest_version" in r]
    ts_by_v = {r["manifest_version"]: r["ts"] for r in lin}
    t1, t2, t3 = (ts_by_v[r.manifest_version] for r in (r1, r2, r3))
    assert store.resolve_as_of(t1) == r1.manifest_version
    assert store.resolve_as_of((t1 + t2) / 2) == r1.manifest_version
    assert store.resolve_as_of((t2 + t3) / 2) == r2.manifest_version
    assert store.resolve_as_of(t3 + 10.0) == r3.manifest_version
    with pytest.raises(KeyError):
        store.resolve_as_of(t1 - 10.0)

    # read_snapshot(as_of=...) == read_snapshot(version=...)
    a = read_snapshot(lake_root, as_of=(t1 + t2) / 2).to_pandas()
    b = read_snapshot(lake_root, version=r1.manifest_version).to_pandas()
    cols = sorted(a.columns)
    assert a[cols].sort_values(cols).reset_index(drop=True).equals(
        b[cols].sort_values(cols).reset_index(drop=True))
    with pytest.raises(ValueError):
        read_snapshot(lake_root, version=1, as_of=t1)


def test_resolve_as_of_rollback_window(lake):
    lake_root, _ev, _cfg, (r1, _r2, r3) = lake
    store = LakeStore(lake_root)
    store.rollback(r1.manifest_version)
    lin = store.read_lineage()
    t_rb = [r for r in lin if r.get("op") == "rollback"][-1]["ts"]
    # a reader at rollback time saw v1, not v3
    assert store.resolve_as_of(t_rb) == r1.manifest_version
    # just before the rollback, CURRENT was still v3
    t3 = [r for r in lin if r.get("manifest_version") == r3.manifest_version
          and "op" not in r][-1]["ts"]
    assert store.resolve_as_of((t3 + t_rb) / 2) == r3.manifest_version
