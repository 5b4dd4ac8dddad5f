"""Changelog-driven replication: sync_lake + verify_replica.

The replica must converge to the primary's keyed content (per-row sha256
invariant) after every sync, tolerate replays (fenced no-op), recover
from a lost replica commit (rollback -> re-sync reconverges), follow
schema evolution, and work under a different partition count.
"""

import shutil

import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos, make_schema_changes
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.replicate import (
    lake_content_hash,
    sync_lake,
    verify_replica,
)
from etl_cms_ray.state.manifest import LakeStore

PRIMARY = "/tmp/test_repl_primary"
REPLICA = "/tmp/test_repl_replica"


def _fresh(*roots):
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)


def _sorted_content(root):
    t = read_lake_table(root)
    t = t.take(
        pc.sort_indices(t, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    )
    # epoch/seq are bookkeeping and legitimately differ between lakes
    return t.drop_columns([c for c in ("epoch", "seq") if c in t.column_names])


def test_incremental_sync_with_deletes(ray_session):
    _fresh(PRIMARY, REPLICA)
    repos = make_repos(n_repos=5, files_per_repo=8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40, scenario="tombstone")
    cfg = EngineConfig(lake_root=PRIMARY, num_partitions=16)
    events = rd.from_arrow(ev)
    for ep in (0, 1, 2, 3):
        ingest(events.filter(expr=f"epoch == {ep}"), cfg, count_input=False)
        res = sync_lake(PRIMARY, REPLICA, num_partitions=8)
        assert res is not None and res.dead_rows == 0
        chk = verify_replica(PRIMARY, REPLICA)
        assert chk["converged"], chk
    # replica bucketing differs, content identical
    assert LakeStore(REPLICA).load_manifest().num_partitions == 8
    assert _sorted_content(REPLICA).equals(_sorted_content(PRIMARY))
    # converged: another sync is a no-op and commits nothing
    v = LakeStore(REPLICA).current_version()
    assert sync_lake(PRIMARY, REPLICA) is None
    assert LakeStore(REPLICA).current_version() == v


def test_replay_after_replica_rollback_reconverges(ray_session):
    """Losing the replica's last commit (crash before the manifest
    publish) must be recoverable by just running sync again — the fence
    cursor reverts with the rollback and the diff replays cleanly."""
    _fresh(PRIMARY, REPLICA)
    repos = make_repos(n_repos=4, files_per_repo=6)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30)
    cfg = EngineConfig(lake_root=PRIMARY, num_partitions=8)
    events = rd.from_arrow(ev)
    ingest(events.filter(expr="epoch <= 1"), cfg, count_input=False)
    sync_lake(PRIMARY, REPLICA)
    ingest(events.filter(expr="epoch == 2"), cfg, count_input=False)
    sync_lake(PRIMARY, REPLICA)
    assert verify_replica(PRIMARY, REPLICA)["converged"]
    rstore = LakeStore(REPLICA)
    v2 = rstore.current_version()
    rstore.rollback(v2 - 1)  # replica "lost" its last sync commit
    assert not verify_replica(PRIMARY, REPLICA)["converged"]
    res = sync_lake(PRIMARY, REPLICA)
    assert res is not None
    assert verify_replica(PRIMARY, REPLICA)["converged"]


def test_schema_evolution_follows_primary(ray_session):
    _fresh(PRIMARY, REPLICA)
    repos = make_repos(n_repos=4, files_per_repo=6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=30)
    cfg = EngineConfig(lake_root=PRIMARY, num_partitions=8)
    events = rd.from_arrow(ev)
    ingest(events.filter(expr="epoch <= 1"), cfg, count_input=False)
    sync_lake(PRIMARY, REPLICA)
    # primary evolves: add 'stars' (default 0) + widen 'size' to int64
    ingest(events.filter(expr="epoch >= 2"), cfg,
           schema_changes=make_schema_changes(), count_input=False)
    sync_lake(PRIMARY, REPLICA)
    p = _sorted_content(PRIMARY)
    r = _sorted_content(REPLICA)
    assert "stars" in r.column_names
    assert r.schema.field("size").type == p.schema.field("size").type
    assert r.equals(p)
    assert verify_replica(PRIMARY, REPLICA)["converged"]


def test_multiset_hash_detects_divergence(ray_session):
    """The convergence check must actually have teeth: two lakes with
    different content produce different summaries."""
    _fresh(PRIMARY, REPLICA)
    repos = make_repos(n_repos=3, files_per_repo=5)
    ev = make_events(repos, n_epochs=1, events_per_epoch=10)
    events = rd.from_arrow(ev)
    ingest(events, EngineConfig(lake_root=PRIMARY, num_partitions=4),
           count_input=False)
    ingest(events.filter(expr="epoch == 0"),
           EngineConfig(lake_root=REPLICA, num_partitions=4), count_input=False)
    a, b = lake_content_hash(PRIMARY), lake_content_hash(REPLICA)
    assert a != b
