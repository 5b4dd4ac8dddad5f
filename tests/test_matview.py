"""Materialized join view stored as a lake (pipelines/matview.py).

Pins: refresh == full recompute == relational join of the final dumps;
replayed refresh is a fenced no-op; the refresh rewrites ONLY the view
partitions that touched keys hash to (the O(changed partitions) claim)."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.matview import (materialize_join_view,
                                           read_join_view, refresh_join_view)
from etl_cms_ray.state.manifest import LakeStore


@pytest.fixture()
def base_lakes(ray_session, tmp_path):
    repos = make_repos(n_repos=6, files_per_repo=6)
    out = {}
    for name, seed in (("a", 43), ("b", 99)):
        root = str(tmp_path / name)
        cfg = EngineConfig(lake_root=root, num_partitions=8)
        ev = make_events(repos, n_epochs=3, events_per_epoch=90,
                         seed=seed, scenario="tombstone")
        store = LakeStore(root)
        vs = []
        for lo, hi in ((0, 1), (2, 3)):
            part = rd.from_arrow(ev.filter(pc.and_(
                pc.greater_equal(ev["epoch"], lo),
                pc.less_equal(ev["epoch"], hi))))
            ingest(part, cfg)
            vs.append(store.current_version())
        out[name] = (root, vs)
    return out


def _inner_df(view_root: str) -> pd.DataFrame:
    df = read_join_view(view_root).to_pandas()
    return df.sort_values(["repo", "path"]).reset_index(drop=True)


def test_matview_refresh_replay_and_partition_pruning(base_lakes, tmp_path):
    root_a, (va1, va2) = base_lakes["a"]
    root_b, (vb1, vb2) = base_lakes["b"]
    view_cfg = EngineConfig(lake_root=str(tmp_path / "view"), num_partitions=8)

    r0 = materialize_join_view(root_a, root_b, view_cfg,
                               version_a=va1, version_b=vb1)
    assert r0.events_applied > 0
    store = LakeStore(view_cfg.lake_root)
    v_pre = store.current_version()
    m_pre = store.load_manifest()

    r1 = refresh_join_view(root_a, root_b, view_cfg,
                           from_version_a=va1, from_version_b=vb1)
    assert r1.events_applied > 0

    # replayed refresh: fenced no-op (exactly-once view maintenance)
    r2 = refresh_join_view(root_a, root_b, view_cfg,
                           from_version_a=va1, from_version_b=vb1)
    assert r2.events_applied == 0

    # refresh == fresh full materialization at the final versions
    cfg2 = EngineConfig(lake_root=str(tmp_path / "view2"), num_partitions=8)
    materialize_join_view(root_a, root_b, cfg2)
    got, exp = _inner_df(view_cfg.lake_root), _inner_df(cfg2.lake_root)
    pd.testing.assert_frame_equal(got, exp)
    assert len(got) > 0

    # == the plain relational join of the two final lake dumps
    da = read_lake_table(root_a).to_pandas()[["repo", "path", "content"]]
    db = read_lake_table(root_b).to_pandas()[["repo", "path", "content"]]
    exp2 = (da.merge(db.rename(columns={"content": "b_content"}),
                     on=["repo", "path"])
            .sort_values(["repo", "path"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp2[got.columns.tolist()])

    # O(changed partitions): every view partition the refresh rewrote must
    # hash-contain a touched key (computed independently from the base
    # diffs), and the refresh must NOT have rewritten every partition
    from etl_cms_ray.functions.hashing import part_id_one
    from etl_cms_ray.pipelines.history import snapshot_diff

    touched = set()
    for root, v1 in ((root_a, va1), (root_b, vb1)):
        d = snapshot_diff(root, v1).to_pandas()
        for r, p in zip(d["repo"], d["path"]):
            touched.add(part_id_one(r, p, view_cfg.num_partitions))
    m_post = LakeStore(view_cfg.lake_root).load_manifest()
    rewritten = {
        pid for pid, ps in m_post.partitions.items()
        if pid not in m_pre.partitions
        or (m_pre.partitions[pid].file, tuple(m_pre.partitions[pid].deltas))
        != (ps.file, tuple(ps.deltas))
    }
    assert rewritten, "refresh should have rewritten something"
    assert rewritten <= touched, (rewritten, touched)


def test_matview_one_side_advance_and_lake_properties(base_lakes, tmp_path):
    root_a, (va1, va2) = base_lakes["a"]
    root_b, (vb1, vb2) = base_lakes["b"]
    view_cfg = EngineConfig(lake_root=str(tmp_path / "view"), num_partitions=8)
    materialize_join_view(root_a, root_b, view_cfg,
                          version_a=va1, version_b=vb1)
    # only A advances
    refresh_join_view(root_a, root_b, view_cfg,
                      from_version_a=va1, from_version_b=vb1,
                      to_version_a=va2, to_version_b=vb1)
    cfg2 = EngineConfig(lake_root=str(tmp_path / "view2"), num_partitions=8)
    materialize_join_view(root_a, root_b, cfg2,
                          version_a=va2, version_b=vb1)
    pd.testing.assert_frame_equal(_inner_df(view_cfg.lake_root),
                                  _inner_df(cfg2.lake_root))

    # the view is a normal lake: audit passes, history is time-travelable
    from etl_cms_ray.pipelines.history import read_snapshot
    from etl_cms_ray.pipelines.maintenance import audit_lake

    assert audit_lake(view_cfg.lake_root)["healthy"]
    v_now = LakeStore(view_cfg.lake_root).current_version()
    old = read_snapshot(view_cfg.lake_root, version=v_now - 1)
    assert old.count() > 0  # pre-refresh state still readable


def test_matview_multi_refresh_chain(ray_session, tmp_path):
    """Three commits per base lake, view rolled forward through TWO
    successive refreshes — each against a fresh full materialization,
    so drift cannot accumulate silently across refresh generations."""
    repos = make_repos(n_repos=5, files_per_repo=5)
    lakes = {}
    for name, seed in (("a", 7), ("b", 11)):
        root = str(tmp_path / name)
        cfg = EngineConfig(lake_root=root, num_partitions=8)
        ev = make_events(repos, n_epochs=5, events_per_epoch=70,
                         seed=seed, scenario="tombstone")
        store = LakeStore(root)
        vs = []
        for lo, hi in ((0, 1), (2, 3), (4, 5)):
            part = rd.from_arrow(ev.filter(pc.and_(
                pc.greater_equal(ev["epoch"], lo),
                pc.less_equal(ev["epoch"], hi))))
            ingest(part, cfg)
            vs.append(store.current_version())
        lakes[name] = (root, vs)
    root_a, va = lakes["a"]
    root_b, vb = lakes["b"]
    view_cfg = EngineConfig(lake_root=str(tmp_path / "view"), num_partitions=8)
    materialize_join_view(root_a, root_b, view_cfg,
                          version_a=va[0], version_b=vb[0])
    for i in (1, 2):
        refresh_join_view(root_a, root_b, view_cfg,
                          from_version_a=va[i - 1], from_version_b=vb[i - 1],
                          to_version_a=va[i], to_version_b=vb[i])
        cfg_full = EngineConfig(lake_root=str(tmp_path / f"full{i}"),
                                num_partitions=8)
        materialize_join_view(root_a, root_b, cfg_full,
                              version_a=va[i], version_b=vb[i])
        pd.testing.assert_frame_equal(_inner_df(view_cfg.lake_root),
                                      _inner_df(cfg_full.lake_root))


# ---------------------------------------------------------------------------
# aggregate (stats) view materialized as a lake


def test_stats_view_refresh_replay_and_tombstone(ray_session, tmp_path):
    from etl_cms_ray.pipelines.history import repo_stats_snapshot
    from etl_cms_ray.pipelines.matview import (materialize_stats_view,
                                               read_stats_view,
                                               refresh_stats_view)

    root = str(tmp_path / "base")
    cfg = EngineConfig(lake_root=root, num_partitions=8)
    # commit 1: repo_keep has two files, repo_gone has ONE file
    ev1 = pa.table({
        "repo": ["repo_keep", "repo_keep", "repo_gone"],
        "path": ["a.py", "b.py", "only.py"],
        "op": ["insert"] * 3, "commit": ["c1"] * 3,
        "epoch": pa.array([0] * 3, pa.int64()),
        "seq": pa.array([0, 1, 2], pa.int64()),
        "lang": ["py"] * 3,
        "content": ["aaaa", "bb", "cccccc"],
    })
    # commit 2: repo_gone fully deleted, repo_keep updates a file (size-only
    # delta: file count unchanged) and repo_new appears
    ev2 = pa.table({
        "repo": ["repo_gone", "repo_keep", "repo_new"],
        "path": ["only.py", "a.py", "x.py"],
        "op": ["delete", "update", "insert"], "commit": ["c2"] * 3,
        "epoch": pa.array([1] * 3, pa.int64()),
        "seq": pa.array([0, 1, 2], pa.int64()),
        "lang": ["py"] * 3,
        "content": [None, "aaaaaaaa", "zz"],
    })
    store = LakeStore(root)
    ingest(rd.from_arrow(ev1), cfg)
    v1 = store.current_version()
    ingest(rd.from_arrow(ev2), cfg)

    vcfg = EngineConfig(lake_root=str(tmp_path / "view"), num_partitions=8)
    materialize_stats_view(root, vcfg, version=v1)
    r1 = refresh_stats_view(root, vcfg, from_version=v1)
    assert r1.events_applied > 0
    # replay is fenced
    assert refresh_stats_view(root, vcfg, from_version=v1).events_applied == 0

    got = (read_stats_view(vcfg.lake_root).to_pandas()
           .sort_values("repo").reset_index(drop=True))
    exp = (repo_stats_snapshot(root).to_pandas()
           .sort_values("repo").reset_index(drop=True))
    cols = ["repo", "n_files", "total_size"]
    pd.testing.assert_frame_equal(got[cols], exp[cols])
    # repo_gone was tombstoned out of the view; the size-only update and
    # the brand-new repo both landed
    assert set(got["repo"]) == {"repo_keep", "repo_new"}
    keep = got[got["repo"] == "repo_keep"].iloc[0]
    assert keep["n_files"] == 2 and keep["total_size"] == 8 + 2


def test_stats_view_matches_fixture_lake(base_lakes, tmp_path):
    from etl_cms_ray.pipelines.history import repo_stats_snapshot
    from etl_cms_ray.pipelines.matview import (materialize_stats_view,
                                               read_stats_view,
                                               refresh_stats_view)

    root, (v1, v2) = base_lakes["a"]
    vcfg = EngineConfig(lake_root=str(tmp_path / "view"), num_partitions=8)
    materialize_stats_view(root, vcfg, version=v1)
    refresh_stats_view(root, vcfg, from_version=v1, to_version=v2)
    got = (read_stats_view(vcfg.lake_root).to_pandas()
           .sort_values("repo").reset_index(drop=True))
    exp = (repo_stats_snapshot(root, version=v2).to_pandas()
           .sort_values("repo").reset_index(drop=True))
    cols = ["repo", "n_files", "total_size"]
    pd.testing.assert_frame_equal(got[cols], exp[cols])


def test_matview_composes_view_of_view(ray_session, tmp_path):
    """Views compose because views are lakes: V1 = A join B; V2 = V1
    join C (V1's content + b_content payloads feed V2 as ordinary base
    columns).  After all three bases advance, refreshing V1 and then V2
    — each purely from its direct base's changelog — must equal a full
    three-way recompute.  This is the cascade property: incremental
    maintenance propagates through view DAGs."""
    repos = make_repos(n_repos=5, files_per_repo=5)
    roots, vers = {}, {}
    for name, seed in (("a", 43), ("b", 99), ("c", 7)):
        root = str(tmp_path / name)
        cfg = EngineConfig(lake_root=root, num_partitions=8)
        ev = make_events(repos, n_epochs=3, events_per_epoch=80,
                         seed=seed, scenario="tombstone")
        store = LakeStore(root)
        vs = []
        for lo, hi in ((0, 1), (2, 3)):
            part = rd.from_arrow(ev.filter(pc.and_(
                pc.greater_equal(ev["epoch"], lo),
                pc.less_equal(ev["epoch"], hi))))
            ingest(part, cfg)
            vs.append(store.current_version())
        roots[name], vers[name] = root, vs

    v1_cfg = EngineConfig(lake_root=str(tmp_path / "v1"), num_partitions=8)
    v2_cfg = EngineConfig(lake_root=str(tmp_path / "v2"), num_partitions=8)
    v2_cols_a = ("content", "b_content")

    materialize_join_view(roots["a"], roots["b"], v1_cfg,
                          version_a=vers["a"][0], version_b=vers["b"][0])
    v1_store = LakeStore(v1_cfg.lake_root)
    v1_v1 = v1_store.current_version()
    materialize_join_view(v1_cfg.lake_root, roots["c"], v2_cfg,
                          version_a=v1_v1, version_b=vers["c"][0],
                          columns_a=v2_cols_a, inner_a=True)

    # all three bases advance; refresh cascades level by level
    refresh_join_view(roots["a"], roots["b"], v1_cfg,
                      from_version_a=vers["a"][0],
                      from_version_b=vers["b"][0])
    refresh_join_view(v1_cfg.lake_root, roots["c"], v2_cfg,
                      from_version_a=v1_v1, from_version_b=vers["c"][0],
                      columns_a=v2_cols_a, inner_a=True)

    got = (read_join_view(v2_cfg.lake_root, columns_a=v2_cols_a)
           .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True))
    # full three-way recompute from the final dumps
    da = read_lake_table(roots["a"]).to_pandas()[["repo", "path", "content"]]
    db = read_lake_table(roots["b"]).to_pandas()[["repo", "path", "content"]]
    dc = read_lake_table(roots["c"]).to_pandas()[["repo", "path", "content"]]
    exp = (da.merge(db.rename(columns={"content": "b_content"}),
                    on=["repo", "path"])
           .rename(columns={"b_content": "a_b_content"})
           .merge(dc.rename(columns={"content": "b_content"}),
                  on=["repo", "path"])
           .sort_values(["repo", "path"]).reset_index(drop=True))
    assert len(got) > 0
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)


def test_matview_payload_name_collisions_rejected(ray_session):
    from etl_cms_ray.pipelines.matview import _mapped_names

    with pytest.raises(ValueError):
        _mapped_names(("content", "content"), ("content",))  # duplicate
    # the a_/b_ prefixes make cross-side and engine-column collisions
    # impossible for distinct inputs
    a_map, b_map = _mapped_names(("content", "b_x"), ("x",))
    assert a_map["b_x"] == "a_b_x" and b_map["x"] == "b_x"
