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


def test_tail_late_epoch_policies(ray_session, tmp_path):
    """A late epoch file (below the lake fence) must never vanish
    silently: ignore records the skip once, strict raises, rescue
    applies the salvageable subset exactly once."""
    import pytest

    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=50)
    events_dir = str(tmp_path / "binlog")
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    # producer skips epoch 1: epochs 0, 2, 3 arrive and apply
    _write_epoch_files(ev, events_dir, [0, 2, 3])
    tail_once(events_dir, cfg)
    fence = applied_through(cfg.lake_root)
    assert fence == 3

    # epoch 1 shows up late
    _write_epoch_files(ev, events_dir, [1])

    with pytest.raises(RuntimeError, match="late"):
        tail_once(events_dir, cfg, late_policy="strict")

    # ignore: no commit, one lineage record, recorded only once
    assert tail_once(events_dir, cfg, late_policy="ignore") == []
    store = LakeStore(cfg.lake_root)
    lates = [r for r in store.read_lineage() if r.get("op") == "late_epoch"]
    assert len(lates) == 1 and lates[0]["action"] == "skipped"
    assert lates[0]["epoch"] == 1 and lates[0]["fence"] == 3

    # rescue on a FRESH lake that applied 0,2,3: late epoch 1 rows are
    # fenced per partition — rescue applies exactly the salvageable ones
    cfg2 = EngineConfig(lake_root=str(tmp_path / "lake2"), num_partitions=8)
    tail_once(events_dir2 := str(tmp_path / "binlog2"), cfg2)  # empty dir
    _write_epoch_files(ev, events_dir2, [0, 2, 3])
    tail_once(events_dir2, cfg2)
    before = read_lake_table(cfg2.lake_root)
    _write_epoch_files(ev, events_dir2, [1])
    results = tail_once(events_dir2, cfg2, late_policy="rescue")
    assert len(results) == 1  # the rescued commit
    store2 = LakeStore(cfg2.lake_root)
    acts = [r for r in store2.read_lineage() if r.get("op") == "late_epoch"]
    assert [a["action"] for a in acts] == ["rescued"]
    after = read_lake_table(cfg2.lake_root)
    # salvage is monotone: only keys whose partition fence permitted the
    # late epoch changed; everything else is bit-identical.  A second
    # poll neither re-rescues nor recommits.
    assert after.num_rows >= before.num_rows
    assert tail_once(events_dir2, cfg2, late_policy="rescue") == []
    assert read_lake_table(cfg2.lake_root).equals(after)
