"""Sorted secondary projection (incremental MV): build, scan parity vs
the lake, range-file pruning, incremental refresh O(changed ranges),
and the per-source-partition staleness fallback — the projection serves
rows directly, so a stale row would be a WRONG answer (unlike bitmap
pruning); these tests corrupt freshness on purpose and require parity
anyway."""

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.projection import (
    build_projection,
    load_projection_meta,
    projection_scan,
)

LAKE = "/tmp/test_projection_lake"
LO, HI = 120, 520


def _expected(lake_root, lo=LO, hi=HI) -> pa.Table:
    t = read_lake_table(lake_root)
    t = t.filter(
        pc.and_(pc.greater_equal(t["size"], pa.scalar(lo)),
                pc.less_equal(t["size"], pa.scalar(hi)))
    )
    return t.select(["repo", "path", "size"]).take(
        pc.sort_indices(t.select(["repo", "path", "size"]),
                        sort_keys=[("repo", "ascending"),
                                   ("path", "ascending")])
    )


def _got(lake_root, lo=LO, hi=HI, info=None) -> pa.Table:
    ds = projection_scan(lake_root, "by_size", lo, hi,
                         columns=["repo", "path", "size"], info=info)
    t = pa.concat_tables([pa.Table.from_pandas(df, preserve_index=False)
                          for df in [ds.to_pandas()]])
    return t.take(
        pc.sort_indices(t, sort_keys=[("repo", "ascending"),
                                      ("path", "ascending")])
    )


@pytest.fixture()
def lake(ray_session):
    shutil.rmtree(LAKE, ignore_errors=True)
    repos = make_repos(n_repos=6, files_per_repo=8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40)
    cfg = EngineConfig(lake_root=LAKE, num_partitions=16)
    ingest(rd.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    return LAKE, ev, cfg


def test_build_and_scan_parity(lake):
    lake_root, _ev, _cfg = lake
    rep = build_projection(lake_root, "by_size", "size",
                           columns=["repo", "path", "size"], num_ranges=8)
    assert rep["rows"] == read_lake_table(lake_root).num_rows
    assert rep["ranges"] >= 2  # sizes vary, cuts split the space
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert got.equals(exp)
    assert info["stale_parts"] == 0 and not info["fallback"]


def test_range_file_pruning(lake):
    lake_root, _ev, _cfg = lake
    build_projection(lake_root, "by_size", "size",
                     columns=["repo", "path", "size"], num_ranges=8)
    meta = load_projection_meta(lake_root, "by_size")
    vmax = max(e["max"] for e in meta["files"].values())
    info = {}
    got = _got(lake_root, lo=vmax, hi=vmax + 1e9, info=info)
    # a top-sliver probe must open a strict subset of range files
    assert info["files_scanned"] < info["files_total"]
    exp = _expected(lake_root, lo=vmax, hi=vmax + 1e9)
    assert got.equals(exp)


def test_stale_fallback_before_refresh(lake):
    lake_root, ev, cfg = lake
    build_projection(lake_root, "by_size", "size",
                     columns=["repo", "path", "size"], num_ranges=8)
    # second commit changes some partitions; the projection is now stale
    ingest(rd.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert info["stale_parts"] > 0  # fallback path really exercised
    assert got.equals(exp)


def test_incremental_refresh(lake):
    lake_root, ev, cfg = lake
    build_projection(lake_root, "by_size", "size",
                     columns=["repo", "path", "size"], num_ranges=8)
    before = load_projection_meta(lake_root, "by_size")
    # a NARROW commit (one repo) so most source partitions keep their
    # state_id — the refresh must reuse their range files
    late = ev.filter(pc.and_(pc.greater(ev["epoch"], 1),
                             pc.equal(ev["repo"], ev["repo"][0])))
    assert late.num_rows > 0
    ingest(rd.from_arrow(late), cfg)
    rep = build_projection(lake_root, "by_size", "size",
                           columns=["repo", "path", "size"], num_ranges=8)
    after = load_projection_meta(lake_root, "by_size")
    assert rep["changed_parts"] > 0
    assert after["bounds"] == before["bounds"]  # cuts stay fixed
    # untouched ranges keep their exact (immutable) files
    untouched = [
        rid for rid, e in before["files"].items()
        if rid in after["files"] and after["files"][rid]["file"] == e["file"]
    ]
    assert untouched, "no range file was reused — refresh is not incremental"
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert info["stale_parts"] == 0
    assert got.equals(exp)
    assert rep["rows"] == read_lake_table(lake_root).num_rows


def test_missing_projection_raises(lake):
    lake_root, _ev, _cfg = lake
    with pytest.raises(FileNotFoundError):
        projection_scan(lake_root, "nope", 0, 1)
