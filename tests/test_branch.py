"""Lake branches: fork isolation, three-way merge, conflicts, vacuum safety.

The reference's analog is load-into-a-scratch-schema-then-swap (the ETL
fills a fresh CDM schema and consumers repoint only after validation);
branches generalize WAP's one-commit isolation to whole development
lines.  Golden rule throughout: merged state == the same events
ingested directly, compared by full-table sha (oracle.replay)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.functions.hashing import part_id_one
from etl_cms_ray.oracle import replay, tables_equal_by_sha
from etl_cms_ray.pipelines.branch import (
    branch_root,
    create_branch,
    delete_branch,
    list_branches,
    merge_branch,
)
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.maintenance import audit_lake, expire_snapshots
from etl_cms_ray.state.manifest import LakeStore

pytestmark = pytest.mark.fast

NP = 8


def _cfg(root, **kw):
    return EngineConfig(lake_root=str(root), num_partitions=NP,
                        normalize_concurrency=2, applier_concurrency=2, **kw)


def _edit(repo, path, epoch, seq, content, op="update", lang="py"):
    """One single-row change event."""
    return {
        "repo": repo, "path": path, "op": op, "commit": f"m{epoch}_{seq}",
        "epoch": epoch, "seq": seq, "lang": lang, "content": content,
    }


def _events_table(rows):
    from etl_cms_ray.schema import EVENTS_SCHEMA

    cols = {f.name: [r[f.name] for r in rows] for f in EVENTS_SCHEMA}
    return pa.table(cols, schema=EVENTS_SCHEMA)


def _base_lake(tmp_path, name="main"):
    """Epoch 0+1 ingested; returns (cfg, events_so_far)."""
    repos = make_repos(4, 8)
    ev = make_events(repos, n_epochs=1, events_per_epoch=40)
    cfg = _cfg(tmp_path / name)
    ingest(ray.data.from_arrow(ev), cfg)
    return cfg, ev


def _keys_by_partition(ev: pa.Table):
    """{part_id: (repo, path)} one representative key per partition."""
    out = {}
    for repo, path in zip(ev["repo"].to_pylist(), ev["path"].to_pylist()):
        out.setdefault(part_id_one(repo, path, NP), (repo, path))
    return out


def test_fork_is_isolated_and_readable(ray_session, tmp_path):
    cfg, ev = _base_lake(tmp_path)
    create_branch(cfg.lake_root, "feature")
    broot = branch_root(cfg.lake_root, "feature")

    # the branch IS the snapshot (no data copied, hard links)
    assert tables_equal_by_sha(read_lake_table(broot), read_lake_table(cfg.lake_root))
    assert audit_lake(broot)["healthy"]

    # writes on the branch are invisible to main and vice versa
    keys = _keys_by_partition(ev)
    (r1, p1), (r2, p2) = list(keys.values())[0], list(keys.values())[1]
    bcfg = _cfg(broot)
    ingest(ray.data.from_arrow(_events_table(
        [_edit(r1, p1, 2, 0, "branch edit")])), bcfg, count_input=False)
    main_state = read_lake_table(cfg.lake_root)
    assert "branch edit" not in main_state["content"].to_pylist()
    ingest(ray.data.from_arrow(_events_table(
        [_edit(r2, p2, 2, 0, "main edit")])), cfg, count_input=False)
    branch_state = read_lake_table(broot)
    assert "main edit" not in branch_state["content"].to_pylist()
    assert "branch edit" in branch_state["content"].to_pylist()

    info = list_branches(cfg.lake_root)
    assert [b["name"] for b in info] == ["feature"]
    assert info[0]["head_version"] == 2 and info[0]["base_version"] == 1


def test_fast_forward_merge_equals_direct_ingest(ray_session, tmp_path):
    """Fork -> two commits on the branch -> merge while main never
    advanced == ingesting the whole stream directly."""
    repos = make_repos(4, 8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=60, scenario="tombstone")
    cfg = _cfg(tmp_path / "main")
    ep0 = ev.filter(pc.less_equal(ev["epoch"], 1))
    ingest(ray.data.from_arrow(ep0), cfg)
    create_branch(cfg.lake_root, "dev")
    bcfg = _cfg(branch_root(cfg.lake_root, "dev"))
    for ep in (2, 3):
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        if chunk.num_rows:
            ingest(ray.data.from_arrow(chunk), bcfg)
    before = read_lake_table(cfg.lake_root)
    assert tables_equal_by_sha(before, replay(ep0))  # still pre-branch

    rep = merge_branch(cfg.lake_root, "dev")
    assert rep["fast_forward"] and rep["merged_partitions"] > 0
    assert not rep["conflicts"]
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))
    assert audit_lake(cfg.lake_root)["healthy"]

    # re-merge with no new branch commits: no-op, same version
    rep2 = merge_branch(cfg.lake_root, "dev")
    assert rep2["no_op"] and rep2["version"] == rep["version"]


def test_three_way_merge_disjoint_partitions(ray_session, tmp_path):
    """Main and branch both advance, touching DISJOINT partitions:
    merge == both edit sets applied."""
    cfg, ev = _base_lake(tmp_path)
    keys = _keys_by_partition(ev)
    pids = sorted(keys)
    assert len(pids) >= 2
    (rm, pm), (rb, pb) = keys[pids[0]], keys[pids[1]]
    create_branch(cfg.lake_root, "dev")
    bcfg = _cfg(branch_root(cfg.lake_root, "dev"))
    main_edit = _edit(rm, pm, 2, 0, "main-side edit")
    branch_edit = _edit(rb, pb, 2, 0, "branch-side edit")
    ingest(ray.data.from_arrow(_events_table([main_edit])), cfg, count_input=False)
    ingest(ray.data.from_arrow(_events_table([branch_edit])), bcfg, count_input=False)

    rep = merge_branch(cfg.lake_root, "dev")
    assert not rep["fast_forward"] and rep["merged_partitions"] == 1
    merged = read_lake_table(cfg.lake_root)
    expected = replay(pa.concat_tables(
        [ev, _events_table([main_edit, branch_edit])]))
    assert tables_equal_by_sha(merged, expected)
    assert audit_lake(cfg.lake_root)["healthy"]


def test_conflicting_partition_fails_then_strategies(ray_session, tmp_path):
    cfg, ev = _base_lake(tmp_path)
    keys = _keys_by_partition(ev)
    repo, path = next(iter(keys.values()))
    create_branch(cfg.lake_root, "dev")
    bcfg = _cfg(branch_root(cfg.lake_root, "dev"))
    ingest(ray.data.from_arrow(_events_table(
        [_edit(repo, path, 2, 0, "ours")])), cfg, count_input=False)
    ingest(ray.data.from_arrow(_events_table(
        [_edit(repo, path, 2, 1, "theirs")])), bcfg, count_input=False)

    with pytest.raises(RuntimeError, match="merge conflict"):
        merge_branch(cfg.lake_root, "dev")

    # 'ours': main wins, branch partition state dropped
    rep = merge_branch(cfg.lake_root, "dev", strategy="ours")
    assert rep["conflicts"] and rep["merged_partitions"] == 0
    t = read_lake_table(cfg.lake_root)
    row = {k: v for k, v in zip(t["path"].to_pylist(), t["content"].to_pylist())}
    assert row[path] == "ours"

    # 'theirs': branch partition state replaces main's
    rep = merge_branch(cfg.lake_root, "dev", strategy="theirs")
    assert rep["merged_partitions"] == 1
    t = read_lake_table(cfg.lake_root)
    row = {k: v for k, v in zip(t["path"].to_pylist(), t["content"].to_pylist())}
    assert row[path] == "theirs"
    assert audit_lake(cfg.lake_root)["healthy"]


def test_identical_changes_coalesce(ray_session, tmp_path):
    """The same events ingested on BOTH sides produce identical partition
    states (content addressing) — not a conflict, and merge is a no-op."""
    cfg, ev = _base_lake(tmp_path)
    keys = _keys_by_partition(ev)
    repo, path = next(iter(keys.values()))
    create_branch(cfg.lake_root, "dev")
    bcfg = _cfg(branch_root(cfg.lake_root, "dev"))
    same = _events_table([_edit(repo, path, 2, 0, "same edit")])
    ingest(ray.data.from_arrow(same), cfg, count_input=False)
    ingest(ray.data.from_arrow(same), bcfg, count_input=False)
    rep = merge_branch(cfg.lake_root, "dev")
    assert rep["no_op"] and not rep["conflicts"]


def test_vacuum_on_main_cannot_break_branch(ray_session, tmp_path):
    """Hard links make retention local: expiring main's old snapshots
    (rewriting every partition first so the fork's files go
    unreferenced on main) leaves the branch fully readable."""
    cfg, ev = _base_lake(tmp_path)
    create_branch(cfg.lake_root, "keepme")
    broot = branch_root(cfg.lake_root, "keepme")
    before = read_lake_table(broot)
    # rewrite every live partition on main (touch every key), then vacuum
    bump = [_edit(r, p, 2, i, f"rewrite {i}")
            for i, (r, p) in enumerate(zip(ev["repo"].to_pylist()[:64],
                                           ev["path"].to_pylist()[:64]))]
    ingest(ray.data.from_arrow(_events_table(bump)), cfg, count_input=False)
    expire_snapshots(cfg.lake_root, keep_last=1)
    assert tables_equal_by_sha(read_lake_table(broot), before)
    assert audit_lake(broot)["healthy"]

    delete_branch(cfg.lake_root, "keepme")
    assert not os.path.exists(broot)
    assert list_branches(cfg.lake_root) == []
    # main unaffected by branch deletion
    assert audit_lake(cfg.lake_root)["healthy"]


def test_branch_schema_change_merges(ray_session, tmp_path):
    from etl_cms_ray.schema import SchemaChange

    cfg, ev = _base_lake(tmp_path)
    keys = _keys_by_partition(ev)
    repo, path = next(iter(keys.values()))
    create_branch(cfg.lake_root, "schema")
    bcfg = _cfg(branch_root(cfg.lake_root, "schema"))
    ingest(ray.data.from_arrow(_events_table(
        [_edit(repo, path, 2, 0, "with col")])), bcfg, count_input=False,
        schema_changes=[SchemaChange(epoch=2, change="add_column",
                                     column="stars", type_name="int64",
                                     default=0)])
    rep = merge_branch(cfg.lake_root, "schema")
    assert rep["merged_partitions"] >= 1
    t = read_lake_table(cfg.lake_root)
    assert "stars" in t.schema.names
    assert audit_lake(cfg.lake_root)["healthy"]


def test_merge_refuses_unknown_branch_and_bad_names(ray_session, tmp_path):
    cfg, _ = _base_lake(tmp_path)
    with pytest.raises(KeyError):
        merge_branch(cfg.lake_root, "nope")
    with pytest.raises(ValueError):
        create_branch(cfg.lake_root, "bad/name")
    create_branch(cfg.lake_root, "dup")
    with pytest.raises(ValueError):
        create_branch(cfg.lake_root, "dup")
