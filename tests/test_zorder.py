"""Z-order clustered layout: build + multi-predicate scan parity vs the
lake, multi-column zone-map pruning, and the per-source-partition
staleness fallback (the layout serves rows directly, so a stale row
would be a WRONG answer — same discipline as the sorted projection)."""

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.zorder import (
    build_zorder,
    load_zorder_meta,
    zorder_scan,
)

LAKE = "/tmp/test_zorder_lake"
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
    ds = zorder_scan(lake_root, "by_lang_size", preds, columns=COLS,
                     info=info)
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


def _build(lake_root, num_files=8):
    return build_zorder(lake_root, "by_lang_size", ["lang", "size"],
                        columns=COLS, num_files=num_files)


def test_build_and_scan_parity(lake):
    lake_root, _ev, _cfg = lake
    rep = _build(lake_root)
    assert rep["rows"] == read_lake_table(lake_root).num_rows
    assert rep["files"] >= 2
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert info["stale_parts"] == 0
    assert got.equals(exp)


def test_multi_column_pruning(lake):
    lake_root, _ev, _cfg = lake
    _build(lake_root)
    meta = load_zorder_meta(lake_root, "by_lang_size")
    # a thin box on BOTH dimensions must open a strict subset of files
    smax = max(e["maxs"]["size"] for e in meta["files"].values())
    preds = {"lang": ("py", "py"), "size": (smax, smax + 1e9)}
    info = {}
    got = _got(lake_root, preds=preds, info=info)
    assert info["files_scanned"] < info["files_total"]
    assert got.equals(_expected(lake_root, preds=preds))
    # single-column probe on the OTHER dimension prunes too
    info2 = {}
    got2 = _got(lake_root, preds={"size": (smax, smax + 1e9)}, info=info2)
    assert info2["files_scanned"] < info2["files_total"]
    assert got2.equals(_expected(lake_root, preds={"size": (smax, smax + 1e9)}))


def test_stale_fallback(lake):
    lake_root, ev, cfg = lake
    _build(lake_root)
    ingest(rd.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert info["stale_parts"] > 0  # fallback path really exercised
    assert got.equals(exp)


def test_rebuild_refreshes(lake):
    lake_root, ev, cfg = lake
    _build(lake_root)
    ingest(rd.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    _build(lake_root)
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert info["stale_parts"] == 0
    assert got.equals(exp)


def test_incremental_refresh(lake):
    lake_root, ev, cfg = lake
    _build(lake_root)
    before = load_zorder_meta(lake_root, "by_lang_size")
    # a NARROW commit (one repo) so most source partitions keep their
    # state_id — the refresh must reuse their untouched bucket files
    late = ev.filter(pc.and_(pc.greater(ev["epoch"], 1),
                             pc.equal(ev["repo"], ev["repo"][0])))
    assert late.num_rows > 0
    ingest(rd.from_arrow(late), cfg)
    rep = _build(lake_root)
    after = load_zorder_meta(lake_root, "by_lang_size")
    assert rep["changed_parts"] > 0
    assert after["domains"] == before["domains"]  # codes stay fixed
    reused = [
        bid for bid, e in before["files"].items()
        if bid in after["files"] and after["files"][bid]["file"] == e["file"]
    ]
    assert rep["rebuilt_files"] < len(before["files"]) or reused, \
        "refresh rewrote every bucket — not incremental"
    info = {}
    got, exp = _got(lake_root, info=info), _expected(lake_root)
    assert info["stale_parts"] == 0
    assert got.equals(exp)
    assert rep["rows"] == read_lake_table(lake_root).num_rows


def test_guards(lake):
    lake_root, _ev, _cfg = lake
    _build(lake_root)
    with pytest.raises(FileNotFoundError):
        zorder_scan(lake_root, "nope", PREDS)
    with pytest.raises(ValueError):
        zorder_scan(lake_root, "by_lang_size", {"content": ("a", "b")})
