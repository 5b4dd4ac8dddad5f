"""Oracle self-consistency (no Ray): the single-process replayer must obey
LWW / tombstone / replay semantics on the seeded fixtures."""

import hashlib

import pyarrow as pa

from etl_cms_ray.fixtures import make_events, make_repos, snapshot_to_events
from etl_cms_ray.oracle import replay, tables_equal_by_sha
from etl_cms_ray.schema import SchemaRegistry
from etl_cms_ray.fixtures import make_schema_changes


def test_snapshot_replay_matches_snapshot():
    repos = make_repos(3, 5)
    state = replay(snapshot_to_events(repos))
    assert state.num_rows == repos.num_rows
    # per-row sha256 invariant
    for content, sha in zip(state["content"].to_pylist(), state["content_sha"].to_pylist()):
        assert hashlib.sha256(content.encode()).digest() == sha


def test_lww_picks_max_epoch_seq():
    repos = make_repos(2, 3)
    ev = make_events(repos, n_epochs=3, events_per_epoch=30, scenario="linear")
    state = replay(ev)
    # winning version per key must equal max (epoch, seq) among non-obsolete events
    best = {}
    for i in range(ev.num_rows):
        k = (ev["repo"][i].as_py(), ev["path"][i].as_py())
        v = (ev["epoch"][i].as_py(), ev["seq"][i].as_py())
        if k not in best or v > best[k][0]:
            best[k] = (v, ev["op"][i].as_py(), ev["content"][i].as_py())
    live = {k: v for k, v in best.items() if v[1] != "delete"}
    assert state.num_rows == len(live)
    got = {
        (state["repo"][i].as_py(), state["path"][i].as_py()): state["content"][i].as_py()
        for i in range(state.num_rows)
    }
    assert got == {k: v[2] for k, v in live.items()}


def test_replay_scenario_idempotent():
    repos = make_repos(2, 4)
    once = make_events(repos, n_epochs=2, events_per_epoch=20, scenario="linear")
    twice = make_events(repos, n_epochs=2, events_per_epoch=20, scenario="replay")
    assert tables_equal_by_sha(replay(once), replay(twice))


def test_outoforder_matches_inorder():
    repos = make_repos(2, 4)
    a = make_events(repos, n_epochs=2, events_per_epoch=20, scenario="linear")
    b = make_events(repos, n_epochs=2, events_per_epoch=20, scenario="outoforder")
    assert a.num_rows == b.num_rows
    assert tables_equal_by_sha(replay(a), replay(b))


def test_tombstones_remove_keys():
    repos = make_repos(2, 4)
    ev = make_events(repos, n_epochs=4, events_per_epoch=40, scenario="tombstone")
    state = replay(ev)
    assert state.num_rows < repos.num_rows + 1  # some keys deleted at head
    assert state["content"].null_count == 0


def test_through_epoch_checkpoint_semantics():
    repos = make_repos(2, 4)
    ev = make_events(repos, n_epochs=3, events_per_epoch=20)
    partial = replay(ev, through_epoch=1)
    full_of_partial = replay(ev.filter(pa.compute.less_equal(ev["epoch"], 1)))
    assert tables_equal_by_sha(partial, full_of_partial)


def test_schema_evolution_adds_and_widens():
    repos = make_repos(2, 3)
    ev = make_events(repos, n_epochs=4, events_per_epoch=10)
    reg = SchemaRegistry(changes=make_schema_changes())
    state = replay(ev, registry=reg)
    assert state.schema.field("stars").type == pa.int64()
    assert state.schema.field("size").type == pa.int64()  # widened from int32
    assert set(state["stars"].to_pylist()) == {0}
    # pre-evolution replay keeps v0 schema
    early = replay(ev, registry=reg, through_epoch=1)
    assert "stars" not in early.column_names
    assert early.schema.field("size").type == pa.int32()
