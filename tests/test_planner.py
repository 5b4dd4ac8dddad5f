"""Unified scan planner: metadata-only costing across lake zone maps,
sorted projections and z-order layouts; the chosen plan may only change
READS — every strategy must return exactly the filtered lake."""

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.planner import scan_plans, smart_scan
from etl_cms_ray.pipelines.projection import build_projection
from etl_cms_ray.pipelines.zorder import build_zorder

LAKE = "/tmp/test_planner_lake"
PREDS = {"lang": ("py", "py"), "size": (100.0, 620.0)}
COLS = ["repo", "path", "lang", "size"]


def _expected(lake_root, preds=PREDS) -> pa.Table:
    t = read_lake_table(lake_root)
    mask = None
    for c, (lo, hi) in preds.items():
        m = pc.and_(pc.greater_equal(t[c], pa.scalar(lo)),
                    pc.less_equal(t[c], pa.scalar(hi)))
        mask = m if mask is None else pc.and_(mask, m)
    t = t.filter(pc.fill_null(mask, False)).select(COLS)
    return t.take(pc.sort_indices(
        t, sort_keys=[("repo", "ascending"), ("path", "ascending")]))


def _got(lake_root, preds=PREDS, info=None) -> pa.Table:
    ds = smart_scan(lake_root, preds, columns=COLS, info=info)
    t = pa.Table.from_pandas(ds.to_pandas(), preserve_index=False)
    return t.take(pc.sort_indices(
        t, sort_keys=[("repo", "ascending"), ("path", "ascending")]))


@pytest.fixture()
def lake(ray_session):
    shutil.rmtree(LAKE, ignore_errors=True)
    repos = make_repos(n_repos=6, files_per_repo=8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40)
    cfg = EngineConfig(lake_root=LAKE, num_partitions=16)
    ingest(rd.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    return LAKE, ev, cfg


def test_no_layouts_parity(lake):
    lake_root, _ev, _cfg = lake
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert info["strategy"] in ("lake_zonemap", "full_scan")
    assert got.equals(exp)


def test_layout_choice_and_parity(lake):
    lake_root, _ev, _cfg = lake
    build_projection(lake_root, "by_size", "size", columns=COLS,
                     num_ranges=8)
    build_zorder(lake_root, "zls", ["lang", "size"], columns=COLS,
                 num_files=8)
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    # both layouts + lake + full are candidates
    strategies = {p["strategy"] for p in info["candidates"]}
    assert {"zorder", "projection", "lake_zonemap", "full_scan"} <= strategies
    # the chosen plan is the cheapest candidate (which physical path wins
    # is data-dependent — at toy scale tiny hash partitions can prune
    # better than clustered files; parity must hold regardless)
    fracs = [p["frac"] for p in info["candidates"]]
    assert info["frac"] == min(fracs)
    zo = next(p for p in info["candidates"] if p["strategy"] == "zorder")
    assert zo["frac"] < 1.0  # the clustered layout really prunes
    assert got.equals(exp)
    # single-column numeric probe: projection/zorder/lake all eligible
    info2 = {}
    preds2 = {"size": (600.0, 1e9)}
    got2 = _got(lake_root, preds=preds2, info=info2)
    assert got2.equals(_expected(lake_root, preds=preds2))


def test_stale_layouts_still_exact(lake):
    lake_root, ev, cfg = lake
    build_zorder(lake_root, "zls", ["lang", "size"], columns=COLS,
                 num_files=8)
    ingest(rd.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert got.equals(exp)  # whatever was picked, the answer is the lake


def test_plans_are_metadata_only(lake):
    lake_root, _ev, _cfg = lake
    build_zorder(lake_root, "zls", ["lang", "size"], columns=COLS,
                 num_files=8)
    plans = scan_plans(lake_root, PREDS, columns=COLS)
    assert plans[0]["frac"] <= plans[-1]["frac"]
    assert all("units_scanned" in p and "units_total" in p for p in plans)
    # cow lake: every partition reports rows, so costing is row-weighted
    full = next(p for p in plans if p["strategy"] == "full_scan")
    assert full["est_rows"] is not None and full["est_rows"] > 0
    for p in plans:
        if p["est_rows"] is not None and full["est_rows"]:
            assert p["frac"] <= 1.0 + 1e-9
