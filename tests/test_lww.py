"""Vectorized LWW reduce: associativity, idempotence, tombstone handling."""

import pyarrow as pa

from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.stages.lww import drop_tombstones, lww_reduce, max_version


def _ev(rows):
    cols = {c: [] for c in ("repo", "path", "op", "commit", "epoch", "seq", "lang", "content")}
    for r in rows:
        for c in cols:
            cols[c].append(r.get(c))
    t = pa.table(cols)
    return t.set_column(4, "epoch", t["epoch"].cast(pa.int64())).set_column(
        5, "seq", t["seq"].cast(pa.int64())
    )


def test_lww_basic():
    t = _ev(
        [
            dict(repo="a", path="x", op="insert", epoch=0, seq=0, content="v0"),
            dict(repo="a", path="x", op="update", epoch=1, seq=5, content="v1"),
            dict(repo="a", path="x", op="update", epoch=1, seq=3, content="old"),
            dict(repo="a", path="y", op="insert", epoch=0, seq=1, content="y0"),
        ]
    )
    r = lww_reduce(t)
    assert r.num_rows == 2
    got = {(r["repo"][i].as_py(), r["path"][i].as_py()): r["content"][i].as_py() for i in range(2)}
    assert got == {("a", "x"): "v1", ("a", "y"): "y0"}


def test_lww_associative_random():
    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=60, scenario="outoforder")
    whole = lww_reduce(ev)
    # split into 3 arbitrary chunks, reduce each, reduce the union
    n = ev.num_rows
    parts = [ev.slice(0, n // 3), ev.slice(n // 3, n // 3), ev.slice(2 * (n // 3))]
    two_level = lww_reduce(pa.concat_tables([lww_reduce(p) for p in parts]))
    import pyarrow.compute as pc

    sk = [("repo", "ascending"), ("path", "ascending")]
    a = whole.take(pc.sort_indices(whole, sort_keys=sk))
    b = two_level.take(pc.sort_indices(two_level, sort_keys=sk))
    assert a.equals(b)


def test_lww_idempotent_on_duplicates():
    t = _ev(
        [
            dict(repo="a", path="x", op="update", epoch=1, seq=1, content="same"),
            dict(repo="a", path="x", op="update", epoch=1, seq=1, content="same"),
        ]
    )
    assert lww_reduce(t).num_rows == 1


def test_drop_tombstones_and_max_version():
    t = _ev(
        [
            dict(repo="a", path="x", op="delete", epoch=2, seq=0, content=None),
            dict(repo="a", path="y", op="update", epoch=1, seq=9, content="y"),
        ]
    )
    r = drop_tombstones(lww_reduce(t))
    assert r.num_rows == 1 and r["path"][0].as_py() == "y"
    assert max_version(t) == (2, 0)
    assert max_version(t.slice(0, 0)) == (-1, -1)
