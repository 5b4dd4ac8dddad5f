"""Binlog-tail driver: incremental discovery, epoch-ordered commits,
crash recovery via the lake-as-cursor."""

import os

import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.oracle import replay, tables_equal_by_sha
from etl_cms_ray.pipelines.ingest import read_lake_table
from etl_cms_ray.pipelines.tail import applied_through, discover_epochs, tail_loop, tail_once
from etl_cms_ray.state.manifest import LakeStore


def _write_epoch_files(ev, events_dir, epochs):
    os.makedirs(events_dir, exist_ok=True)
    for ep in epochs:
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(events_dir, f"epoch={ep}.parquet"))


def test_tail_incremental_and_catchup(ray_session, tmp_path):
    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=50, scenario="tombstone")
    events_dir = str(tmp_path / "binlog")
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)

    # producer writes epochs 0-1; tailer catches up
    _write_epoch_files(ev, events_dir, [0, 1])
    results = tail_once(events_dir, cfg)
    assert len(results) == 2
    assert applied_through(cfg.lake_root) == 1
    assert tables_equal_by_sha(
        read_lake_table(cfg.lake_root), replay(ev, through_epoch=1)
    )

    # producer appends epochs 2-3; a NEW tailer (fresh process semantics —
    # no in-memory cursor) sees only the unapplied ones
    _write_epoch_files(ev, events_dir, [2, 3])
    results = tail_once(events_dir, cfg)
    assert len(results) == 2
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))

    # nothing new -> no commits
    assert tail_once(events_dir, cfg) == []


def test_tail_loop_terminates_and_is_crash_safe(ray_session, tmp_path):
    repos = make_repos(2, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30)
    events_dir = str(tmp_path / "binlog")
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    _write_epoch_files(ev, events_dir, [0, 1, 2])
    n_files = len(discover_epochs(events_dir))

    commits = tail_loop(events_dir, cfg, poll_seconds=0.01, idle_polls_to_stop=2)
    assert commits == n_files

    # "crash" after a manual rollback: tail re-applies only missing epochs
    store = LakeStore(cfg.lake_root)
    store.rollback(1)
    commits = tail_loop(events_dir, cfg, poll_seconds=0.01, idle_polls_to_stop=2)
    assert commits == n_files - 1  # epochs above the restored fence
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))
