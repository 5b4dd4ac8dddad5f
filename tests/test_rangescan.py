"""Zone-map file skipping: per-partition [min,max] column stats in the
manifest + range_plan/range_scan pruned reads.

The reference has no data skipping (every run is a full forward pass,
``FileControl.py:181-236``); here a value-range scan must (a) agree
row-for-row with filtering the full lake state, and (b) provably skip
partitions whose zone map is disjoint from the range.  Pruning is
CONSERVATIVE: missing stats mean "cannot prune", never "empty".
"""

import copy
import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import (
    eq_plan,
    eq_scan,
    ingest,
    range_plan,
    range_scan,
    read_lake_table,
)
from etl_cms_ray.pipelines.maintenance import compact_lake, repartition_lake
from etl_cms_ray.state.manifest import LakeStore

LAKE = "/tmp/test_rangescan_lake"


@pytest.fixture(scope="module")
def lake(ray_session):
    shutil.rmtree(LAKE, ignore_errors=True)
    repos = make_repos(n_repos=6, files_per_repo=8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40)
    cfg = EngineConfig(lake_root=LAKE, num_partitions=16)
    ingest(rd.from_arrow(ev), cfg)
    return LAKE


def _sorted(t: pa.Table) -> pa.Table:
    return t.take(
        pc.sort_indices(t, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    )


def _scan_table_ds(ds) -> pa.Table:
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return None
    return _sorted(pa.concat_tables(tables))


def _scan_table(lake_root, column, lo, hi, **kw) -> pa.Table:
    return _scan_table_ds(range_scan(lake_root, column, lo, hi, **kw))


def test_range_scan_matches_full_filter(lake):
    full = read_lake_table(lake)
    sizes = sorted(full["size"].to_pylist())
    lo, hi = sizes[len(sizes) // 4], sizes[3 * len(sizes) // 4]
    got = _scan_table(lake, "size", lo, hi)
    mask = pc.and_(
        pc.greater_equal(full["size"], pa.scalar(lo, type=pa.int32())),
        pc.less_equal(full["size"], pa.scalar(hi, type=pa.int32())),
    )
    expect = _sorted(full.filter(mask))
    assert expect.num_rows > 0
    assert got.cast(expect.schema).equals(expect)


def test_stats_recorded_and_disjoint_range_prunes_everything(lake):
    manifest = LakeStore(lake).load_manifest()
    live = [p for p in manifest.partitions.values() if p.rows > 0]
    assert live, "fixture lake must have data"
    # CoW ingest writes tight zone maps for every numeric column
    assert all("size" in p.stats for p in live)
    # a range beyond every partition's max prunes the whole plan
    global_hi = max(p.stats["size"][1] for p in live)
    assert range_plan(manifest, "size", global_hi + 1, global_hi + 10**6) == []
    t = _scan_table(lake, "size", global_hi + 1, global_hi + 10**6)
    assert t is None  # empty dataset, zero partitions opened
    # full range keeps every live partition
    plan = range_plan(manifest, "size", 0, global_hi)
    assert {e["part_id"] for e in plan} == {p.part_id for p in live}


def test_partial_prune_is_exact(lake):
    """The plan keeps exactly the partitions whose interval intersects."""
    manifest = LakeStore(lake).load_manifest()
    live = [p for p in manifest.partitions.values() if p.rows > 0]
    mids = sorted(p.stats["size"][0] for p in live)
    lo = mids[len(mids) // 2]  # some partitions' max falls below lo
    hi = max(p.stats["size"][1] for p in live)
    keep = {p.part_id for p in live if p.stats["size"][1] >= lo}
    plan = range_plan(manifest, "size", lo, hi)
    assert {e["part_id"] for e in plan} == keep


def test_missing_stats_never_prune(lake):
    """Legacy manifests (no stats) must scan everything — and the scan
    result must be identical to the stats-pruned one."""
    manifest = LakeStore(lake).load_manifest()
    stripped = copy.deepcopy(manifest)
    for p in stripped.partitions.values():
        p.stats = {}
    live = [p for p in stripped.partitions.values() if p.rows > 0]
    plan = range_plan(stripped, "size", 10**9, 2 * 10**9)
    assert {e["part_id"] for e in plan} == {p.part_id for p in live}
    # unknown column: same conservative keep-everything
    plan2 = range_plan(manifest, "no_such_column", 0, 1)
    assert {e["part_id"] for e in plan2} == {
        p.part_id for p in manifest.partitions.values() if p.rows > 0
    }


def test_mor_widen_then_compact_tightens():
    """MOR deltas widen the zone map (never narrow — conservative), the
    scan stays exact, and compaction recomputes tight stats."""
    root = "/tmp/test_rangescan_mor"
    shutil.rmtree(root, ignore_errors=True)
    repos = make_repos(n_repos=4, files_per_repo=6)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30, scenario="tombstone")
    cfg = EngineConfig(lake_root=root, num_partitions=8, commit_mode="mor")
    ingest(rd.from_arrow(ev).filter(expr="epoch <= 1"), cfg)
    ingest(rd.from_arrow(ev).filter(expr="epoch == 2"), cfg)
    store = LakeStore(root)
    manifest = store.load_manifest()
    full = read_lake_table(root)
    lo, hi = 1, 10**6
    got = _scan_table(root, "size", lo, hi)
    assert got.num_rows == full.num_rows  # full range: everything survives
    # widened stats are a valid over-approximation of the live data
    for p in manifest.partitions.values():
        if p.rows > 0 and "size" in p.stats:
            pass  # bounds checked via the compact comparison below
    compact_lake(root)
    m2 = LakeStore(root).load_manifest()
    for p in m2.partitions.values():
        if p.rows > 0 and p.part_id in manifest.partitions:
            pre = manifest.partitions[p.part_id].stats.get("size")
            post = p.stats.get("size")
            if pre and post:
                # compaction can only tighten (or keep) the interval
                assert post[0] >= pre[0] and post[1] <= pre[1]
    got2 = _scan_table(root, "size", lo, hi)
    assert got2.equals(got)


def test_eq_scan_matches_full_filter_and_prunes(lake):
    """Dictionary stats: every partition records its lang value set; a
    probe value present nowhere prunes the whole plan; a real value
    returns exactly the filtered lake rows."""
    full = read_lake_table(lake)
    manifest = LakeStore(lake).load_manifest()
    live = [p for p in manifest.partitions.values() if p.rows > 0]
    assert all(isinstance(p.stats.get("lang"), dict) for p in live)
    # per-partition sets reflect the actual data
    langs = set(full["lang"].to_pylist())
    assert set().union(*(p.stats["lang"]["in"] for p in live)) == langs
    assert eq_plan(manifest, "lang", "no_such_lang") == []
    lang = sorted(langs)[0]
    got = _scan_table_ds(eq_scan(lake, "lang", lang))
    expect = _sorted(full.filter(pc.equal(full["lang"], lang)))
    assert expect.num_rows > 0
    assert got.cast(expect.schema).equals(expect)
    # the plan keeps exactly the partitions whose set contains the value
    keep = {p.part_id for p in live if lang in p.stats["lang"]["in"]}
    assert {e["part_id"] for e in eq_plan(manifest, "lang", lang)} == keep
    # eq_plan also consumes numeric range stats
    hi = max(p.stats["size"][1] for p in live)
    assert eq_plan(manifest, "size", hi + 1) == []
    # content (high-cardinality string) records no dictionary: no pruning
    assert all("content" not in p.stats for p in live)
    assert {e["part_id"] for e in eq_plan(manifest, "content", "x")} == {
        p.part_id for p in live
    }


def test_dict_stats_mor_union_and_overflow():
    """MOR deltas union the value sets; overflowing the cap drops the
    column (unknown), never produces a wrong set."""
    from etl_cms_ray.stages.applier import _DICT_MAX_VALUES, _widen_stats

    a = {"lang": {"in": ["en", "fr"]}, "size": [1, 5]}
    b = {"lang": {"in": ["de"]}, "size": [3, 9]}
    w = _widen_stats(a, b)
    assert w == {"lang": {"in": ["de", "en", "fr"]}, "size": [1, 9]}
    big = {"lang": {"in": [f"l{i}" for i in range(_DICT_MAX_VALUES)]}}
    assert "lang" not in _widen_stats(a, big)  # union > cap -> unknown
    # mixed kinds (schema drift) -> unknown, not a crash
    assert "lang" not in _widen_stats({"lang": [0, 1]}, {"lang": {"in": ["x"]}})


def test_repartition_recomputes_stats(lake):
    root = "/tmp/test_rangescan_rp"
    shutil.rmtree(root, ignore_errors=True)
    shutil.copytree(lake, root)
    repartition_lake(root, 8)
    manifest = LakeStore(root).load_manifest()
    live = [p for p in manifest.partitions.values() if p.rows > 0]
    assert live and all("size" in p.stats for p in live)
    before = _sorted(read_lake_table(lake))
    after = _sorted(read_lake_table(root))
    assert after.equals(before)
    # stats round-trip through the manifest JSON as exact values
    for p in live:
        lo, hi = p.stats["size"]
        assert isinstance(lo, int) and isinstance(hi, int) and lo <= hi
