"""purge_history: GDPR right-to-be-forgotten across retained history.

delete_where already removes a key from the LIVE relation; these tests
pin the stronger contract — the subject's rows leave EVERY retained
snapshot, the dead-letter store and every branch, while version numbers,
epoch fences, tags and all other rows' bytes survive (replay stays a
fenced no-op)."""

import glob
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.branch import branch_root, create_branch
from etl_cms_ray.pipelines.history import read_snapshot
from etl_cms_ray.pipelines.index import build_token_index
from etl_cms_ray.pipelines.ingest import ingest, read_lake
from etl_cms_ray.pipelines.maintenance import audit_lake, purge_history
from etl_cms_ray.state.manifest import LakeStore

pytestmark = pytest.mark.fast


def _build_lake(tmp_path, n_repos=4, files=12):
    repos = make_repos(n_repos, files)
    ev = make_events(repos, n_epochs=4, events_per_epoch=50)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    r1 = ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    r2 = ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    return cfg, ev, r1, r2


def _rows_for_repo_everywhere(lake_root: str, repo: str) -> int:
    """Row-level scan of EVERY parquet file under the lake root (data,
    deadletter, branches): the erasure check that byte-grepping a zstd
    file cannot give."""
    n = 0
    for f in glob.glob(os.path.join(lake_root, "**", "*.parquet"),
                       recursive=True):
        t = pq.read_table(f)
        if "repo" in t.column_names:
            n += int(pc.sum(pc.cast(pc.equal(t["repo"], repo),
                                    pa.int64())).as_py() or 0)
    return n


def test_purge_history_scrubs_every_snapshot(ray_session, tmp_path):
    cfg, ev, r1, r2 = _build_lake(tmp_path)
    store = LakeStore(cfg.lake_root)
    store.set_tag("audited", r1.manifest_version)
    build_token_index(cfg.lake_root)
    create_branch(cfg.lake_root, "exp")

    # a synthetic dead-letter file holding the subject
    repo = sorted(set(ev["repo"].to_pylist()))[0]
    dl_dir = os.path.join(cfg.lake_root, "deadletter", "part=00000")
    os.makedirs(dl_dir, exist_ok=True)
    pq.write_table(
        pa.table({"repo": [repo, "other_repo"], "path": ["x", "y"],
                  "reason": ["bad", "bad"]}),
        os.path.join(dl_dir, "dl-0000000000000000.parquet"))

    pre_v1 = read_snapshot(cfg.lake_root, version=r1.manifest_version).to_pandas()
    pre_v2 = read_lake(cfg.lake_root).to_pandas()
    assert (pre_v1["repo"] == repo).any() and (pre_v2["repo"] == repo).any()
    fences_before = {
        pid: ps.applied_through_epoch
        for pid, ps in store.load_manifest().partitions.items()
    }

    rep = purge_history(cfg.lake_root, repo)
    assert rep["rows_removed"] > 0 and rep["files_rewritten"] > 0
    assert rep["versions_rewritten"] >= 2
    assert rep["dead_letter_files"] == 1
    assert "_index" in rep["artifacts_dropped"]
    assert "exp" in rep["branches"]
    assert rep["tags_refreshed"] >= 1

    # complete erasure: zero rows for the subject in ANY parquet file
    # under the root (live data, history, dead letter, branch)
    assert _rows_for_repo_everywhere(cfg.lake_root, repo) == 0

    # every other row of every snapshot survives byte-for-byte
    for v, pre in ((r1.manifest_version, pre_v1), (None, pre_v2)):
        post = (read_snapshot(cfg.lake_root, version=v) if v else
                read_lake(cfg.lake_root)).to_pandas()
        want = pre[pre["repo"] != repo]
        cols = ["repo", "path"]
        got = post.sort_values(cols).reset_index(drop=True)
        want = want.sort_values(cols).reset_index(drop=True)
        assert got.equals(want[got.columns.tolist()])

    # structure intact: audit healthy on current AND historical versions,
    # fences unchanged, tag still resolvable, replay a fenced no-op
    assert audit_lake(cfg.lake_root)["healthy"]
    assert audit_lake(cfg.lake_root, version=r1.manifest_version)["healthy"]
    fences_after = {
        pid: ps.applied_through_epoch
        for pid, ps in store.load_manifest().partitions.items()
    }
    assert fences_after == fences_before
    assert store.resolve_ref("audited") == r1.manifest_version
    r3 = ingest(ray.data.from_arrow(ev), cfg)
    assert r3.events_applied == 0

    # dead letter kept the unrelated row
    kept = [pq.read_table(f) for f in glob.glob(os.path.join(dl_dir, "*.parquet"))]
    assert sum(t.num_rows for t in kept) == 1
    assert kept[0]["repo"][0].as_py() == "other_repo"


def test_purge_history_single_path_prunes_and_scrubs(ray_session, tmp_path):
    cfg, ev, r1, r2 = _build_lake(tmp_path)
    live = read_lake(cfg.lake_root).to_pandas()
    repo = live["repo"].iloc[0]
    path = live[live["repo"] == repo]["path"].iloc[0]

    rep = purge_history(cfg.lake_root, repo, path=path)
    assert rep["rows_removed"] > 0
    # key-partition pruning: candidates touch at most one partition per
    # manifest, so the rewrite count is bounded by files of those
    # partitions, never the lake
    assert rep["files_rewritten"] <= 2 * 2  # <= versions x (base+delta)

    post = read_lake(cfg.lake_root).to_pandas()
    assert not ((post["repo"] == repo) & (post["path"] == path)).any()
    # the repo's OTHER paths survive
    assert (post["repo"] == repo).any()
    want = live[~((live["repo"] == repo) & (live["path"] == path))]
    assert len(post) == len(want)
    assert audit_lake(cfg.lake_root)["healthy"]
    for v in (r1.manifest_version, r2.manifest_version):
        snap = read_snapshot(cfg.lake_root, version=v).to_pandas()
        assert not ((snap["repo"] == repo) & (snap["path"] == path)).any()


def test_purge_history_absent_subject_is_noop(ray_session, tmp_path):
    cfg, ev, r1, r2 = _build_lake(tmp_path, n_repos=2, files=6)
    before = read_lake(cfg.lake_root).to_pandas()
    rep = purge_history(cfg.lake_root, "no-such-repo")
    assert rep["rows_removed"] == 0 and rep["files_rewritten"] == 0
    assert rep["versions_rewritten"] == 0 and rep["artifacts_dropped"] == []
    after = read_lake(cfg.lake_root).to_pandas()
    cols = ["repo", "path"]
    assert after.sort_values(cols).reset_index(drop=True).equals(
        before.sort_values(cols).reset_index(drop=True))
    assert audit_lake(cfg.lake_root)["healthy"]


def test_purge_history_crash_before_deletion_is_recoverable(
        ray_session, tmp_path, monkeypatch):
    """Crash-ordering contract: old files are unlinked strictly AFTER
    every manifest version is patched, so a crash in the deletion loop
    leaves only harmless orphans (every snapshot readable, audit green)
    and a re-run completes the erasure idempotently."""
    import etl_cms_ray.pipelines.maintenance as mod

    cfg, ev, r1, r2 = _build_lake(tmp_path, n_repos=3, files=8)
    build_token_index(cfg.lake_root)  # a derived artifact holding tokens
    store = LakeStore(cfg.lake_root)
    store.set_tag("pinned", r1.manifest_version)
    repo = sorted(set(ev["repo"].to_pylist()))[0]
    pre = read_lake(cfg.lake_root).to_pandas()
    assert (pre["repo"] == repo).any()

    real_unlink = os.unlink
    calls = {"n": 0}

    def exploding_unlink(p):
        calls["n"] += 1
        raise OSError("injected crash during erasure deletion")

    monkeypatch.setattr(mod.os, "unlink", exploding_unlink)
    with pytest.raises(OSError, match="injected crash"):
        purge_history(cfg.lake_root, repo)
    monkeypatch.setattr(mod.os, "unlink", real_unlink)
    assert calls["n"] == 1  # it WAS in the deletion phase when it died

    # every snapshot still serves the scrubbed relation (manifests were
    # fully patched before deletion began); audit healthy despite the
    # orphaned old files (audits read manifests, not directories)
    for v in (r1.manifest_version, r2.manifest_version):
        snap = read_snapshot(cfg.lake_root, version=v).to_pandas()
        assert not (snap["repo"] == repo).any()
        assert audit_lake(cfg.lake_root, version=v)["healthy"]

    # the subject's bytes still exist as orphans -> the re-run (or any
    # expire_snapshots) finishes the physical erasure
    assert _rows_for_repo_everywhere(cfg.lake_root, repo) > 0
    # the crash died before the tag refresh, artifact drop and shard
    # prune — the re-run must repair ALL of them, not just the data files
    rep2 = purge_history(cfg.lake_root, repo)
    assert rep2["orphan_files_purged"] > 0
    assert "_index" in rep2["artifacts_dropped"]
    assert not os.path.exists(
        os.path.join(cfg.lake_root, "_index", "tokens.parquet"))
    assert store.resolve_ref("pinned") == r1.manifest_version
    assert _rows_for_repo_everywhere(cfg.lake_root, repo) == 0
    assert audit_lake(cfg.lake_root)["healthy"]


def test_purge_history_across_partition_evolution(ray_session, tmp_path):
    """Candidate discovery honors PER-MANIFEST bucket counts: after a
    live 8→12 re-bucket, a path-scoped purge must find the key's file in
    the 8-bucket manifests AND the 12-bucket ones (a single global
    partition id would miss one side and leave readable subject rows)."""
    from etl_cms_ray.pipelines.maintenance import repartition_lake

    cfg, ev, r1, r2 = _build_lake(tmp_path, n_repos=3, files=10)
    r3 = repartition_lake(cfg.lake_root, 12)
    live = read_lake(cfg.lake_root).to_pandas()
    repo = live["repo"].iloc[0]
    path = live[live["repo"] == repo]["path"].iloc[0]

    rep = purge_history(cfg.lake_root, repo, path=path)
    assert rep["rows_removed"] > 0
    assert rep["versions_rewritten"] >= 2  # both bucketing eras hit
    assert _rows_for_repo_everywhere(cfg.lake_root, repo) >= 0  # scan runs
    for v in (r1.manifest_version, r2.manifest_version, r3.version):
        snap = read_snapshot(cfg.lake_root, version=v).to_pandas()
        assert not ((snap["repo"] == repo) & (snap["path"] == path)).any()
        assert audit_lake(cfg.lake_root, version=v)["healthy"]
