"""Inverted token index (pipelines/index.py): bitmap pruning for token
search.  Pruning must be provably-absent-only: search results always
equal filtering the full lake state; a stale index falls back to a full
plan rather than trusting old bits."""

import shutil

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.index import build_token_index, token_plan, token_search
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table

LAKE = "/tmp/test_tokenindex_lake"


SENTINEL = "xyzzysentinel"


@pytest.fixture(scope="module")
def lake(ray_session):
    shutil.rmtree(LAKE, ignore_errors=True)
    repos = make_repos(n_repos=6, files_per_repo=8)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40)
    # plant one document with a token no fixture vocabulary word shares:
    # it lands in exactly one partition, so pruning has something to skip
    planted = pa.table(
        {
            "repo": ["r-sentinel"],
            "path": ["p-sentinel"],
            "op": ["insert"],
            "commit": ["cafebabe"],
            "epoch": [2],
            "seq": [0],
            "lang": ["py"],
            "content": [f"needle {SENTINEL} haystack"],
        },
        schema=ev.schema,
    )
    cfg = EngineConfig(lake_root=LAKE, num_partitions=16)
    ingest(rd.from_arrow(pa.concat_tables([ev, planted])), cfg)
    stats = build_token_index(LAKE)
    assert stats["partitions"] > 0 and stats["set_bits"] > 0
    return LAKE


def _expected(lake_root: str, token: str) -> pa.Table:
    t = read_lake_table(lake_root)
    content = t["content"].cast(pa.string())
    padded = pc.binary_join_element_wise(" ", content, " ", "")
    t = t.filter(pc.match_substring(padded, f" {token} "))
    return t.select(["repo", "path"]).sort_by([("repo", "ascending"), ("path", "ascending")])


def test_search_equals_full_filter_and_prunes(lake):
    token = SENTINEL
    plan, info = token_plan(lake, token)
    assert not info["fallback"]
    assert info["pruned"] > 0, "rare token should skip some partitions"
    got = (
        token_search(lake, token, columns=["repo", "path"])
        .to_pandas()
        .sort_values(["repo", "path"])
        .reset_index(drop=True)
    )
    exp = _expected(lake, token).to_pandas().reset_index(drop=True)
    assert got.equals(exp)
    assert len(got) > 0


def test_absent_token_empty_without_reading(lake):
    plan, info = token_plan(lake, "zz-never-a-token-zz")
    assert not info["fallback"] and len(plan) == 0
    out = token_search(lake, "zz-never-a-token-zz").to_pandas()
    # (all-empty Datasets lose column names at to_pandas — the documented
    # engine-wide Ray quirk — so only the row count is asserted)
    assert len(out) == 0


def test_common_token_matches_everywhere(lake):
    # 'def' is in the fixture vocabulary: many docs, bit set in many parts
    got = token_search(lake, "def", columns=["repo", "path"]).to_pandas()
    exp = _expected(lake, "def").to_pandas()
    assert len(got) == len(exp)


def test_stale_partitions_included_unconditionally(lake):
    repos = make_repos(n_repos=6, files_per_repo=8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40, seed=99)
    cfg = EngineConfig(lake_root=lake, num_partitions=16)
    ingest(rd.from_arrow(ev).filter(expr="epoch == 3"), cfg)
    # per-partition staleness: changed partitions are in the plan
    # regardless of their old bits; unchanged ones still prune
    plan, info = token_plan(lake, "def")
    assert not info["fallback"] and info["stale"] > 0
    stale_pids = {p["part_id"] for p in plan}
    # a token absent everywhere must still read every STALE partition
    plan_absent, info_absent = token_plan(lake, "zz-never-a-token-zz")
    assert {p["part_id"] for p in plan_absent} <= stale_pids
    assert len(plan_absent) == info_absent["stale"] > 0
    # search still correct against the NEW state
    got = token_search(lake, "def", columns=["repo", "path"]).to_pandas()
    exp = _expected(lake, "def").to_pandas()
    assert len(got) == len(exp)
    # rebuild refreshes the state ids and full pruning returns
    build_token_index(lake)
    _, info2 = token_plan(lake, "def")
    assert not info2["fallback"] and info2["stale"] == 0


def test_version_reuse_after_rollback_never_trusted(ray_session):
    # Regression (ADVICE r2, index.py:217): manifest version numbers are
    # REUSED after rollback + roll-forward, so an index built at old
    # version N must NOT validate against a different roll-forward state
    # also numbered N — stale bits would prune partitions that now
    # contain the token and silently drop rows.
    import pyarrow.parquet as pq
    from etl_cms_ray.pipelines.index import _index_path
    from etl_cms_ray.state.manifest import LakeStore

    root = "/tmp/test_tokenindex_rollback"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(lake_root=root, num_partitions=8)
    base = pa.table(
        {
            "repo": ["r0", "r1"], "path": ["a", "b"],
            "op": ["insert", "insert"], "commit": ["c0", "c1"],
            "epoch": [1, 1], "seq": [0, 1], "lang": ["py", "py"],
            "content": ["plain words only", "more plain words"],
        }
    )
    ingest(rd.from_arrow(base), cfg)  # v1
    second = base.set_column(
        4, "epoch", pa.array([2, 2])).set_column(
        7, "content", pa.array(["still plain", "nothing special"]))
    ingest(rd.from_arrow(second), cfg)  # v2, no sentinel anywhere
    build_token_index(root)  # index at version 2: sentinel bit unset
    store = LakeStore(root)
    assert store.current_version() == 2
    store.rollback(1)
    withtok = base.set_column(
        4, "epoch", pa.array([2, 2])).set_column(
        7, "content", pa.array([f"now has {SENTINEL} inside", "plain"]))
    ingest(rd.from_arrow(withtok), cfg)  # roll-forward: version 2 REUSED
    assert store.current_version() == 2
    meta_version = int(
        __import__("json").loads(
            pq.read_table(_index_path(root)).schema.metadata[b"token_index"]
        )["version"]
    )
    assert meta_version == 2  # versions collide — the trap this test pins
    plan, info = token_plan(root, SENTINEL)
    assert info["stale"] > 0
    got = token_search(root, SENTINEL, columns=["repo", "path"]).to_pandas()
    assert got["repo"].tolist() == ["r0"], "stale bits must not drop rows"


def test_incremental_rebuild_reuses_unchanged_partitions(lake):
    # lake currently has a fresh full index (built by the stale test).
    # One tiny commit touches few partitions; the refresh must recompute
    # only those and still answer exactly.
    planted = pa.table(
        {
            "repo": ["r-inc"], "path": ["p-inc"], "op": ["insert"],
            "commit": ["beef"], "epoch": [9], "seq": [0], "lang": ["py"],
            "content": ["incremental flag token qqincrementalqq here"],
        }
    )
    cfg = EngineConfig(lake_root=lake, num_partitions=16)
    ingest(rd.from_arrow(planted), cfg)
    stats = build_token_index(lake)
    assert stats["reused"] > 0, "unchanged partitions must reuse bitmaps"
    assert 0 < stats["rebuilt"] < stats["partitions"]
    got = token_search(lake, "qqincrementalqq", columns=["repo", "path"]).to_pandas()
    assert got["repo"].tolist() == ["r-inc"]
    # and an unrelated common token still matches the full filter
    exp = _expected(lake, "def").to_pandas()
    got2 = token_search(lake, "def", columns=["repo", "path"]).to_pandas()
    assert len(got2) == len(exp)
