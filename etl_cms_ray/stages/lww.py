"""Last-writer-wins reduction — the engine's core semantic.

The reference resolves multi-version rows with ``LatestYearData``
(2010 > 2009 > 2008, ``python_etl/beneficiary.py:126-132``) and restores
per-key order with a stable sort suffix (``beneficiary.py:185-198``).
Here: per (repo, path) key, the event with max (epoch, seq) wins; the
reduce is associative + commutative given that total order, so it can be
applied per batch (combiner), per partition, and across lake merges —
two-level reduce is safe even under hot-key salting (SURVEY.md §7.4).

Everything is vectorized Arrow: sort_indices + dictionary-encode +
adjacent-compare; no Python loop over rows.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import key_array

_SORT_KEYS = [
    ("repo", "ascending"),
    ("path", "ascending"),
    ("epoch", "descending"),
    ("seq", "descending"),
]


def lww_reduce(t: pa.Table) -> pa.Table:
    """Keep, per (repo, path), only the row with max (epoch, seq).

    Idempotent and associative: lww(lww(A) ∪ lww(B)) == lww(A ∪ B).
    Exact duplicate deliveries (same epoch, seq) collapse to one row.
    """
    if t.num_rows <= 1:
        return t
    t = t.take(pc.sort_indices(t, sort_keys=_SORT_KEYS))
    keys = pc.dictionary_encode(key_array(t["repo"], t["path"]))
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    codes = keys.indices.to_numpy(zero_copy_only=False)
    first = np.empty(len(codes), dtype=bool)
    first[0] = True
    np.not_equal(codes[1:], codes[:-1], out=first[1:])
    return t.filter(pa.array(first))


def drop_tombstones(t: pa.Table) -> pa.Table:
    """Remove rows whose winning op is delete (final state keeps no
    tombstone; fencing makes persisted tombstones unnecessary — an older
    replayed insert is rejected by the epoch fence, not by a tombstone)."""
    if "op" not in t.column_names:
        return t
    return t.filter(pc.not_equal(t["op"], pa.scalar("delete")))


def max_version(t: pa.Table) -> tuple[int, int]:
    """Max (epoch, seq) present in the table ((-1, -1) when empty)."""
    if t.num_rows == 0:
        return (-1, -1)
    me = pc.max(t["epoch"]).as_py()
    sq = pc.max(t.filter(pc.equal(t["epoch"], me))["seq"]).as_py()
    return (me, sq)
