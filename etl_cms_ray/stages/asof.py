"""As-of (temporal) join — for each left row, the latest right row at or
before it in event time, within the same entity key.

Ray Data has no native as-of join; the composition is the engine's
standard co-group shape (CLAUDE.md rule 3 / stages/join.py): tag both
sides, null-pad to a union schema, coarse hash-partition on the BY key
(every row of one entity lands in one partition), and run ONE vectorized
``pd.merge_asof`` per partition.  One task-based sort shuffle total; no
actor pools; both sides stream.

Determinism: ``merge_asof`` resolves ties among right rows with equal
(by, on) by taking the last one in sort order, so the right side is
stable-sorted by every column before the on-sort — byte-identical output
across runs.  For a SQL-oracle-comparable result, deduplicate the right
side to one row per (by, on) upstream (DuckDB's ASOF JOIN picks an
arbitrary row otherwise).

Partitioning assumption (documented per the custom-operator contract):
correctness requires only that equal BY keys co-locate — guaranteed by
the hash partitioning; a single pathologically hot entity concentrates
its partition (salt upstream if needed).

Reference analog: the co-sequential beneficiary x claim scan
(``CMS_SynPuf_ETL_CDM_v5.py`` main loop) — each claim picks up the
latest-known beneficiary state at its date.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions.threads import single_threaded_kernels
from .join import _key_part, _ray_schema_to_arrow


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str,
    by: str,
    direction: str = "backward",
    suffix: str = "_r",
    num_partitions: int = 64,
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
) -> "ray.data.Dataset":
    """LEFT as-of join: every left row, plus the right row whose ``on``
    is the latest <= (backward) / earliest >= (forward) the left ``on``
    for the same ``by`` key; right columns are null when no such row
    exists.  Right's non-key columns are suffixed on collision.  The
    right ``on`` value is exposed as ``{on}{suffix}``.
    """
    l_schema = (left_schema or getattr(left, "_cogroup_schema", None)
                or _ray_schema_to_arrow(left.schema()))
    r_schema = (right_schema or getattr(right, "_cogroup_schema", None)
                or _ray_schema_to_arrow(right.schema()))
    l_cols = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    if on not in l_cols or on not in r_schema.names:
        raise ValueError(f"both sides need the on column {on!r}")
    if by not in l_cols or by not in r_schema.names:
        raise ValueError(f"both sides need the by column {by!r}")
    for c in (on, by):
        lt_, rt_ = l_types[c], dict(zip(r_schema.names, r_schema.types))[c]
        if lt_ != rt_:
            # the by key rides in ONE union slot and merge_asof requires
            # matching on-key dtypes — mismatches would corrupt the union
            # schema / raise per-partition; fail loudly at plan time
            raise TypeError(f"{c!r} type mismatch: left {lt_} vs right {rt_}")
    r_vals = [c for c in r_schema.names if c not in (by,)]
    taken = set(l_cols)
    ren = {}
    for c in r_vals:
        name = c
        while name in taken:
            name = name + suffix
        ren[c] = name
        taken.add(name)
    out_r_cols = [ren[c] for c in r_vals]
    out_types = {**l_types, **{ren[c]: r_types[c] for c in r_vals}}
    out_cols = l_cols + out_r_cols

    def _col(t: pa.Table, name: str, want: pa.DataType):
        if name not in t.column_names:
            return pa.nulls(t.num_rows, type=want)
        arr = t[name]
        return arr if arr.type == want else arr.cast(want)

    def prep_left(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        n = t.num_rows
        cols = {c: _col(t, c, l_types[c]) for c in l_cols}
        for c in r_vals:
            cols[ren[c]] = pa.nulls(n, type=r_types[c])
        cols["__jp"] = _key_part(pa.table({by: cols[by]}), [by], num_partitions)
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        n = t.num_rows
        cols = {c: pa.nulls(n, type=l_types[c]) for c in l_cols}
        cols[by] = _col(t, by, r_types[by])  # by rides in the left slot
        for c in r_vals:
            cols[ren[c]] = _col(t, c, r_types[c])
        cols["__jp"] = _key_part(pa.table({by: cols[by]}), [by], num_partitions)
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    lu = left.map_batches(prep_left, batch_format="pyarrow", batch_size=65536)
    ru = right.map_batches(prep_right, batch_format="pyarrow", batch_size=65536)
    u = lu.union(ru)

    def _empty_out() -> pa.Table:
        return pa.table({c: pa.nulls(0, type=out_types[c]) for c in out_cols})

    def merge(g: pa.Table) -> pa.Table:
        single_threaded_kernels()
        if g.num_rows == 0 or "__side" not in g.column_names:
            return _empty_out()
        import pyarrow.compute as pc

        df = g.to_pandas()
        lt = df[df["__side"] == 0]
        rt = df[df["__side"] == 1]
        if lt.empty:
            return _empty_out()
        lt = lt[l_cols].sort_values([on] + [c for c in l_cols if c != on],
                                    kind="mergesort")
        r_use = [by] + out_r_cols
        rt = rt[r_use].sort_values(r_use, kind="mergesort")
        rt = rt.sort_values(ren[on], kind="mergesort")
        m = pd.merge_asof(
            lt, rt,
            left_on=on, right_on=ren[on], left_by=by, right_by=by,
            direction=direction, allow_exact_matches=True,
        )
        return pa.table(
            {c: pa.array(m[c], type=out_types[c], from_pandas=True)
             for c in out_cols}
        )

    out = u.groupby("__jp").map_groups(merge, batch_format="pyarrow")
    out._cogroup_schema = pa.schema([(c, out_types[c]) for c in out_cols])
    return out
