"""Time-travel and changelog reads (pipelines/history.py).

Oracle style: the expected snapshot/diff is computed from full table
dumps captured at each commit (the reference's expected-output CSV
comparison shape); the engine must reproduce them from manifests alone.
"""

import shutil

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos, make_schema_changes
from etl_cms_ray.pipelines.history import read_snapshot, snapshot_diff
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.state.manifest import LakeStore


@pytest.fixture()
def lake(ray_session, tmp_path):
    """Three commits over a tombstone-heavy stream + a schema change;
    returns (lake_root, [(manifest_version, expected_table_df)...])."""
    root = str(tmp_path / "lake")
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(lake_root=root, num_partitions=8)
    ev = make_events(make_repos(n_repos=8, files_per_repo=8),
                     n_epochs=4, events_per_epoch=120, scenario="tombstone")
    store = LakeStore(root)
    snaps = []
    splits = [(0, 1), (2, 2), (3, 4)]
    for i, (lo, hi) in enumerate(splits):
        part = rd.from_arrow(
            ev.filter(
                pa.compute.and_(
                    pa.compute.greater_equal(ev["epoch"], lo),
                    pa.compute.less_equal(ev["epoch"], hi),
                )
            )
        )
        ingest(part, cfg,
               schema_changes=make_schema_changes() if i == 1 else None)
        snaps.append((store.current_version(), read_lake_table(root).to_pandas()))
    return root, snaps


def _sorted(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(["repo", "path"]).reset_index(drop=True)


def test_read_snapshot_reproduces_each_commit(lake):
    root, snaps = lake
    for version, expected in snaps:
        got = read_snapshot(root, version=version).to_pandas()
        pd.testing.assert_frame_equal(
            _sorted(got), _sorted(expected), check_dtype=False
        )
    # default = current
    got = read_snapshot(root).to_pandas()
    pd.testing.assert_frame_equal(_sorted(got), _sorted(snaps[-1][1]),
                                  check_dtype=False)


def test_snapshot_schema_is_as_of_version(lake):
    root, snaps = lake
    v1, first = snaps[0]
    # 'stars' was added by the second commit's schema change: a historical
    # read must NOT retroactively grow the column
    assert "stars" not in read_snapshot(root, version=v1).schema().names
    assert "stars" in read_snapshot(root).schema().names
    # pruned historical read
    got = read_snapshot(root, version=v1, columns=["repo", "path"]).to_pandas()
    assert sorted(got.columns) == ["path", "repo"]
    assert len(got) == len(first)


def _expected_diff(old: pd.DataFrame, new: pd.DataFrame) -> pd.DataFrame:
    m = new[["repo", "path", "content_sha"]].merge(
        old[["repo", "path", "content_sha"]].rename(
            columns={"content_sha": "old_content_sha"}),
        on=["repo", "path"], how="outer", indicator=True,
    )
    change = np.where(m["_merge"] == "left_only", "insert",
                      np.where(m["_merge"] == "right_only", "delete", "update"))
    m = m.assign(change=change).drop(columns=["_merge"])
    m = m[(m["change"] != "update") | (m["content_sha"] != m["old_content_sha"])]
    return m[["repo", "path", "change", "content_sha", "old_content_sha"]]


def test_snapshot_diff_matches_dump_diff(lake):
    root, snaps = lake
    (v1, s1), (v2, s2), (v3, s3) = snaps
    for (va, sa), (vb, sb) in [((v1, s1), (v2, s2)), ((v2, s2), (v3, s3)),
                               ((v1, s1), (v3, s3))]:
        got = snapshot_diff(root, va, vb).to_pandas()
        exp = _expected_diff(sa, sb)
        pd.testing.assert_frame_equal(_sorted(got), _sorted(exp),
                                      check_dtype=False)
        assert set(got["change"]) <= {"insert", "update", "delete"}
    # a tombstone scenario must actually produce deletes somewhere
    full = snapshot_diff(root, v1, v3).to_pandas()
    assert (full["change"] == "delete").any() or (
        (full["change"] == "insert").any() and (full["change"] == "update").any()
    )


def test_snapshot_diff_self_is_empty_and_skips_reads(lake):
    root, snaps = lake
    v3 = snaps[-1][0]
    got = snapshot_diff(root, v3, v3).to_pandas()
    # (column names are gone here: Ray drops empty blocks, so an all-empty
    # Dataset is schema-less at to_pandas — engine-wide quirk)
    assert len(got) == 0


def test_incremental_stats_equal_full_recompute(lake):
    """IVM invariant: stats(v_a) + delta(v_a -> v_b) == full recompute at
    v_b, across every commit pair — including deletes (tombstone
    scenario) and the schema change between commits 1 and 2."""
    from etl_cms_ray.pipelines.history import (incremental_repo_stats,
                                               repo_stats_snapshot)

    root, snaps = lake
    versions = [v for v, _ in snaps]
    for va, vb in [(versions[0], versions[1]), (versions[1], versions[2]),
                   (versions[0], versions[2])]:
        base = repo_stats_snapshot(root, version=va)
        inc = incremental_repo_stats(root, base, va, vb).to_pandas()
        full = repo_stats_snapshot(root, version=vb).to_pandas()
        cols = ["repo", "n_files", "total_size"]
        pd.testing.assert_frame_equal(
            inc[cols].sort_values("repo").reset_index(drop=True),
            full[cols].sort_values("repo").reset_index(drop=True),
        )


def test_incremental_token_df_equal_full_recompute(lake):
    """IVM through the tokenize flat-map: token_df(v_a) + delta(v_a ->
    v_b) == full recompute at v_b, across commit pairs with updates,
    deletes (tombstone scenario) and a schema change in between."""
    from etl_cms_ray.pipelines.history import (incremental_token_df,
                                               token_df_snapshot)

    root, snaps = lake
    versions = [v for v, _ in snaps]
    for va, vb in [(versions[0], versions[1]), (versions[0], versions[2])]:
        base = token_df_snapshot(root, version=va)
        inc = incremental_token_df(root, base, va, vb).to_pandas()
        full = token_df_snapshot(root, version=vb).to_pandas()
        pd.testing.assert_frame_equal(
            inc.sort_values("token").reset_index(drop=True),
            full.sort_values("token").reset_index(drop=True),
        )
        assert (inc["df"] > 0).all()


def test_expire_snapshots_reclaims_and_preserves_kept(lake):
    import os

    import pytest as _pytest

    from etl_cms_ray.pipelines.maintenance import audit_lake, expire_snapshots

    root, snaps = lake
    (v1, s1), (v2, s2), (v3, s3) = snaps
    rep = expire_snapshots(root, keep_last=2)
    assert rep["kept_versions"] == [v2, v3]
    assert rep["manifests_deleted"] >= 1
    assert rep["files_deleted"] > 0 and rep["bytes_reclaimed"] > 0
    # expired snapshot unreadable; kept snapshots still byte-exact
    with _pytest.raises(FileNotFoundError):
        read_snapshot(root, version=v1).to_pandas()
    for v, s in [(v2, s2), (v3, s3)]:
        got = read_snapshot(root, version=v).to_pandas()
        pd.testing.assert_frame_equal(_sorted(got), _sorted(s),
                                      check_dtype=False)
    # live lake healthy; second expiry is a no-op
    assert audit_lake(root)["healthy"] is True
    rep2 = expire_snapshots(root, keep_last=2)
    assert rep2["manifests_deleted"] == 0 and rep2["files_deleted"] == 0
    # lineage recorded the operation
    ops = [e.get("op") for e in LakeStore(root).read_lineage()]
    assert "expire_snapshots" in ops


def test_expire_keep_last_zero_rejected(lake):
    from etl_cms_ray.pipelines.maintenance import expire_snapshots

    root, _snaps = lake
    with pytest.raises(ValueError):
        expire_snapshots(root, keep_last=0)


def test_expire_grace_period_spares_young_orphans(lake):
    """grace_sec spares unreferenced files younger than the window (the
    in-flight-writer guard), and a later graceless pass collects them."""
    import os

    from etl_cms_ray.pipelines.maintenance import expire_snapshots

    root, _snaps = lake
    orphan = os.path.join(root, "data", "part=00000", "orphan_young.parquet")
    os.makedirs(os.path.dirname(orphan), exist_ok=True)
    with open(orphan, "wb") as f:
        f.write(b"not-yet-committed")
    rep = expire_snapshots(root, keep_last=1, grace_sec=3600)
    assert os.path.exists(orphan), "young orphan must survive the grace window"
    rep2 = expire_snapshots(root, keep_last=1)
    assert not os.path.exists(orphan), "graceless pass collects the orphan"
    assert rep2["files_deleted"] >= 1


# ---------------------------------------------------------------------------
# keyed join-view IVM (delta join, outer stored state)


@pytest.fixture()
def join_lakes(ray_session, tmp_path):
    """Two (repo, path)-keyed lakes over the SAME key space, each
    ingested in two commits with independent tombstone-heavy edit
    scripts; returns (root_a, root_b, (va1, va2), (vb1, vb2))."""
    from etl_cms_ray.state.manifest import LakeStore

    repos = make_repos(n_repos=6, files_per_repo=6)
    versions = []
    roots = []
    for name, seed in (("a", 43), ("b", 99)):
        root = str(tmp_path / f"jl_{name}")
        cfg = EngineConfig(lake_root=root, num_partitions=8)
        ev = make_events(repos, n_epochs=3, events_per_epoch=90,
                         seed=seed, scenario="tombstone")
        store = LakeStore(root)
        vs = []
        for lo, hi in ((0, 1), (2, 3)):
            part = rd.from_arrow(ev.filter(pa.compute.and_(
                pa.compute.greater_equal(ev["epoch"], lo),
                pa.compute.less_equal(ev["epoch"], hi))))
            ingest(part, cfg)
            vs.append(store.current_version())
        roots.append(root)
        versions.append(tuple(vs))
    return roots[0], roots[1], versions[0], versions[1]


def _state_df(state) -> pd.DataFrame:
    df = state.to_pandas()
    cols = sorted(df.columns)
    return (df[cols].sort_values(["repo", "path"])
            .reset_index(drop=True))


def test_join_view_refresh_equals_full_recompute(join_lakes):
    from etl_cms_ray.pipelines.history import (
        keyed_join_view, keyed_join_view_refresh, keyed_join_view_snapshot)

    root_a, root_b, (va1, va2), (vb1, vb2) = join_lakes
    state1 = keyed_join_view_snapshot(root_a, root_b,
                                      version_a=va1, version_b=vb1)
    refreshed = keyed_join_view_refresh(
        root_a, root_b, state1,
        from_version_a=va1, from_version_b=vb1,
        to_version_a=va2, to_version_b=vb2)
    full = keyed_join_view_snapshot(root_a, root_b,
                                    version_a=va2, version_b=vb2)
    got, exp = _state_df(refreshed), _state_df(full)
    pd.testing.assert_frame_equal(got, exp)
    assert len(exp) > 0

    # the inner projection equals a plain relational join of the two
    # final lake dumps (the expected-output-dump oracle style)
    inner = _state_df(keyed_join_view(refreshed))
    da = read_lake_table(root_a).to_pandas()[["repo", "path", "content"]]
    db = read_lake_table(root_b).to_pandas()[["repo", "path", "content"]]
    exp_inner = da.merge(db.rename(columns={"content": "content_b"}),
                         on=["repo", "path"], how="inner")
    cols = sorted(exp_inner.columns)
    exp_inner = (exp_inner[cols].sort_values(["repo", "path"])
                 .reset_index(drop=True))
    pd.testing.assert_frame_equal(inner, exp_inner)
    # both sides must have contributed deletes/updates for the pin to
    # mean anything; outer state must also be strictly larger than inner
    assert len(inner) < len(got)


def test_join_view_refresh_one_side_only_and_noop(join_lakes):
    from etl_cms_ray.pipelines.history import (
        keyed_join_view_refresh, keyed_join_view_snapshot)

    root_a, root_b, (va1, va2), (vb1, vb2) = join_lakes
    # only lake A advances; B stays at vb1 (empty B changelog path)
    state1 = keyed_join_view_snapshot(root_a, root_b,
                                      version_a=va1, version_b=vb1)
    refreshed = keyed_join_view_refresh(
        root_a, root_b, state1,
        from_version_a=va1, from_version_b=vb1,
        to_version_a=va2, to_version_b=vb1)
    full = keyed_join_view_snapshot(root_a, root_b,
                                    version_a=va2, version_b=vb1)
    pd.testing.assert_frame_equal(_state_df(refreshed), _state_df(full))

    # no-op refresh (both changelogs empty) is an identity
    noop = keyed_join_view_refresh(
        root_a, root_b, full,
        from_version_a=va2, from_version_b=vb1,
        to_version_a=va2, to_version_b=vb1)
    pd.testing.assert_frame_equal(_state_df(noop), _state_df(full))


def test_find_orphan_files_reports_debris_only(lake):
    """An unreferenced file planted under data/ (the crashed-writer
    residue) is reported as an orphan; every manifest-referenced file is
    not; grace_sec hides young debris; expire_snapshots then reclaims
    exactly the reported file and the lake stays healthy."""
    import os

    from etl_cms_ray.pipelines.maintenance import (audit_lake,
                                                   expire_snapshots,
                                                   find_orphan_files)

    lake_root, _snaps = lake
    assert find_orphan_files(lake_root) == []

    part_dir = os.path.join(lake_root, "data", "part=00003")
    os.makedirs(part_dir, exist_ok=True)
    debris = os.path.join(part_dir, "deadbeef-crashed.parquet")
    with open(debris, "wb") as f:
        f.write(b"not really parquet")

    got = find_orphan_files(lake_root)
    assert [os.path.basename(r["file"]) for r in got] == [
        "deadbeef-crashed.parquet"]
    assert got[0]["bytes"] == 18

    # a grace window hides the just-written file (in-flight writer)
    assert find_orphan_files(lake_root, grace_sec=3600) == []

    # vacuum reclaims exactly the debris; the lake audits healthy
    before = expire_snapshots(lake_root, keep_last=10)
    assert before["files_deleted"] == 1
    assert not os.path.exists(debris)
    assert find_orphan_files(lake_root) == []
    assert audit_lake(lake_root)["healthy"]


def test_consume_changelog_consumer_groups(lake):
    """Consumer-group semantics over the changelog: independent durable
    cursors, exact spans, at-least-once redelivery before ack, no-op at
    head, and a fresh consumer replaying from version 0."""
    from etl_cms_ray.pipelines.history import (consume_changelog,
                                               consumer_cursor)

    lake_root, snaps = lake
    head = snaps[-1][0]

    # fresh consumer sees everything since v0
    ch, ack, span = consume_changelog(lake_root, "sink-a")
    assert span == (0, head)
    first = ch.to_pandas()
    assert len(first) > 0
    # crash before ack -> identical redelivery
    ch2, ack2, span2 = consume_changelog(lake_root, "sink-a")
    assert span2 == span
    pd.testing.assert_frame_equal(
        first.sort_values(["repo", "path"]).reset_index(drop=True),
        ch2.to_pandas().sort_values(["repo", "path"]).reset_index(drop=True))
    ack2()
    assert consumer_cursor(lake_root, "sink-a") == head

    # at head: nothing to consume, ack is a no-op
    ch3, ack3, span3 = consume_changelog(lake_root, "sink-a")
    assert ch3 is None and span3 == (head, head)
    ack3()

    # a second consumer is independent (still at 0)
    assert consumer_cursor(lake_root, "sink-b") == 0
    chb, ackb, spanb = consume_changelog(lake_root, "sink-b")
    assert spanb == (0, head)
    ackb()

    # new commit -> sink-a consumes ONLY the increment
    import ray.data as _rd

    from etl_cms_ray.config import EngineConfig as _Cfg
    from etl_cms_ray.pipelines.ingest import ingest as _ingest

    ev = make_events(make_repos(n_repos=8, files_per_repo=8),
                     n_epochs=6, events_per_epoch=120, scenario="tombstone")
    part = _rd.from_arrow(
        ev.filter(pa.compute.equal(ev["epoch"], 5)))
    _ingest(part, _Cfg(lake_root=lake_root, num_partitions=8),
            count_input=False)
    new_head = LakeStore(lake_root).current_version()
    ch4, ack4, span4 = consume_changelog(lake_root, "sink-a")
    assert span4 == (head, new_head)
    inc = ch4.to_pandas()
    ack4()
    # the increment equals the full diff between those two versions
    ref = snapshot_diff(lake_root, head, new_head).to_pandas()
    pd.testing.assert_frame_equal(
        inc.sort_values(["repo", "path"]).reset_index(drop=True),
        ref.sort_values(["repo", "path"]).reset_index(drop=True))

    # hostile consumer ids are rejected
    with pytest.raises(ValueError):
        consume_changelog(lake_root, "../evil")


def test_key_history_walks_retained_versions(ray_session, tmp_path):
    """key_history: per-version presence/sha for one key, changed flags
    only where the key actually changed, delete visible as absent."""
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from etl_cms_ray.config import EngineConfig
    from etl_cms_ray.pipelines.history import key_history
    from etl_cms_ray.pipelines.ingest import ingest

    root = str(tmp_path / "kh_lake")
    cfg = EngineConfig(lake_root=root, num_partitions=4)

    def ev(epoch, seq, op, content):
        return {"repo": "r1", "path": "f.py", "op": op,
                "commit": f"c{seq}", "epoch": epoch, "seq": seq,
                "lang": "py", "content": content}

    other = {"repo": "r2", "path": "g.py", "op": "insert", "commit": "x",
             "epoch": 0, "seq": 1, "lang": "py", "content": "zzz"}
    # v1: key created; v2: unrelated commit (key untouched); v3: key
    # updated; v4: key deleted
    ingest(rd.from_items([ev(0, 1, "insert", "v1"), other]), cfg)
    ingest(rd.from_items([{**other, "epoch": 1, "seq": 2,
                           "content": "zzz2", "op": "update"}]), cfg)
    ingest(rd.from_items([ev(2, 3, "update", "v2")]), cfg)
    ingest(rd.from_items([ev(3, 4, "delete", "")]), cfg)

    h = key_history(root, "r1", "f.py").to_pandas().set_index("version")
    assert list(h.index) == [1, 2, 3, 4]
    assert h["present"].tolist() == [True, True, True, False]
    assert h["changed"].tolist() == [True, False, True, True]
    assert h.loc[1, "content_sha_hex"] == h.loc[2, "content_sha_hex"]
    assert h.loc[3, "content_sha_hex"] != h.loc[1, "content_sha_hex"]
    import pandas as pd
    assert pd.isna(h.loc[4, "content_sha_hex"])
