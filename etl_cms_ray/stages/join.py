"""Task-based co-group hash join.

Ray's native ``Dataset.join`` reserves one long-lived aggregator actor
per hash partition; on this engine's pipelines that spin-up dominates
wall time (measured at sf0.01: a single native inner join runs 15-23 s
vs 3-4 s for this operator on the same input) and a chained pair of
joins at ``num_partitions`` >> CPUs can starve a small session.  This
operator expresses the same hash-partitioned equi-join with Ray Data's
TASK-based primitives only:

1. each side is tagged (``__side``) and null-padded to a shared union
   schema inside ``map_batches`` (vectorized, zero driver involvement),
   with a coarse partition id ``__jp = mix(key) % num_partitions``
   computed by the same splitmix64/FNV kernels the engine's partitioner
   uses;
2. one ``union`` + ``groupby("__jp").map_groups`` moves both sides
   through a single task-based sort shuffle (the engine-wide coarse
   hash-partition pattern — CLAUDE.md rule 3);
3. each partition is joined by ONE vectorized Arrow Acero
   ``pa.Table.join`` call (C++ hash join, exact types end-to-end — no
   pandas int->float null coercion).

Rows with equal keys land in the same partition by construction, so the
partitioned join equals the global join for every supported ``how``.
Skewed keys spread across *different* key values still balance (the
partition id mixes the full 64-bit key hash); a single pathological hot
KEY concentrates its partition exactly as it would concentrate one
native join partition — salt upstream if that matters.

Scale notes (100 TB): both sides stream through the shuffle once; no
driver materialization, no broadcast, no actor pools.  Size
``num_partitions`` so the LARGER side's per-partition slice fits a
worker's heap (partitions ~ join-side bytes / target block size);
the default (64, the engine's coarse-partition constant) is right for
the bench scales and is a parameter, not a cap, for clusters.

Reference analog: the claims-side merge joins of the reference ETL
(co-sequential reader over beneficiary x claim files,
``CMS_SynPuf_ETL_CDM_v5.py`` main loop) — reframed as a bulk hash join
instead of a sorted scan.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa

import ray.data

from ..functions.text import fingerprint_column
from ..functions.threads import single_threaded_kernels

_HOW_TO_ACERO = {
    "inner": "inner",
    "left": "left outer",
    "left_outer": "left outer",
    "semi": "left semi",
    "left_semi": "left semi",
    "anti": "left anti",
    "left_anti": "left anti",
    "outer": "full outer",
    "full": "full outer",
    "full_outer": "full outer",
}

_RKEY_FMT = "__rk{}"


def _hash_one(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """uint64 mix of one key column (splitmix64 for integral/temporal
    types, the engine's vectorized FNV-1a for strings); nulls -> 0."""
    t = col.type
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        h = fingerprint_column(col).to_numpy(zero_copy_only=False).view(np.uint64)
        return h.copy()
    if pa.types.is_floating(t):
        raise TypeError("refusing to hash-join on a float key")
    import pyarrow.compute as pc

    if pa.types.is_date32(t):
        col = col.cast(pa.int32())  # date32 -> int64 directly is unsupported
    col = pc.fill_null(col.cast(pa.int64()), 0)  # null keys never match; any
    arr = col.to_numpy(zero_copy_only=False)     # consistent slot works
    x = arr.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return x


def _key_part(t: pa.Table, cols: Sequence[str], P: int) -> pa.Array:
    h = np.zeros(t.num_rows, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in cols:
            h = h * np.uint64(1099511628211) ^ _hash_one(t[c])
    return pa.array((h % np.uint64(P)).astype(np.int64))


def hash_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    on: str | Sequence[str],
    right_on: str | Sequence[str] | None = None,
    how: str = "inner",
    num_partitions: int = 64,
    suffix: str = "_r",
    left_schema: pa.Schema | None = None,
    right_schema: pa.Schema | None = None,
    shuffle_batch_rows: int = 65536,
    hot_keys: Sequence | None = None,
    salt: int = 8,
) -> "ray.data.Dataset":
    """Equi-join ``left`` with ``right`` on key column(s).

    Output columns: every left column, then right's non-key columns
    (``suffix`` appended where a name collides with a left column) —
    matching ``pa.Table.join``.  Row order is not defined (hash join);
    sort downstream if order matters.  ``how``: inner / left / semi /
    anti / outer (semi and anti return left columns only; ``outer`` is
    FULL outer — unmatched rows of both sides survive, and the key
    columns carry the Acero-coalesced left∪right key under the LEFT
    names, cast to the left key types; right outer = swap the inputs).

    Schemas: the union plan needs both input schemas up front, but
    ``Dataset.schema()`` on a COMPUTED input (anything behind a shuffle)
    executes that whole sub-plan once just to learn the schema — and the
    real run then executes it again.  So: pass ``left_schema`` /
    ``right_schema`` whenever the input isn't a plain read (the shape is
    statically known to the caller in every catalog use); outputs of
    this function carry their schema forward automatically (chained
    joins never re-execute).

    Skew: a single pathologically hot KEY concentrates its partition.
    Pass its value(s) in ``hot_keys`` (single-column joins only) for
    explicit salting: each hot LEFT row lands in one of ``salt``
    consecutive partitions (spread by row position), while hot RIGHT
    rows REPLICATE into all ``salt`` of them — every (left, right) pair
    still meets exactly once, so results are identical to the unsalted
    join (test-pinned), but the hot key's work spreads over ``salt``
    merge tasks at the cost of salt-1 extra copies of its right rows.

    Caveat: if EVERY partition joins to zero rows, Ray drops the empty
    group outputs and the resulting Dataset has no schema — guard
    downstream code that requires column names on empty results.
    """
    l_on = [on] if isinstance(on, str) else list(on)
    r_on = l_on if right_on is None else (
        [right_on] if isinstance(right_on, str) else list(right_on)
    )
    if len(l_on) != len(r_on):
        raise ValueError("on/right_on arity mismatch")
    acero_how = _HOW_TO_ACERO[how]
    semi_like = acero_how in ("left semi", "left anti")
    full_outer = acero_how == "full outer"
    if hot_keys is not None and len(l_on) != 1:
        raise ValueError("hot_keys salting supports single-column joins only")
    if hot_keys is not None and full_outer:
        # replicated hot build rows would emit their unmatched copies
        # `salt` times on the right-outer side
        raise ValueError("hot_keys salting is incompatible with a full outer join")
    # salt > P would wrap (base+s) % P onto the same slot, replicating a
    # hot right row INTO a partition twice -> duplicated join rows
    salt = min(max(1, int(salt)), num_partitions)

    l_schema = (left_schema or getattr(left, "_cogroup_schema", None)
                or _ray_schema_to_arrow(left.schema()))
    r_schema = (right_schema or getattr(right, "_cogroup_schema", None)
                or _ray_schema_to_arrow(right.schema()))
    l_cols = list(l_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    # right key columns travel under reserved names; right value columns
    # under their FINAL output names (suffix pre-applied on collision)
    rk_names = [_RKEY_FMT.format(i) for i in range(len(r_on))]
    r_vals = [] if semi_like else [c for c in r_schema.names if c not in r_on]
    taken = set(l_cols) | set(rk_names)
    ren = {}
    for c in r_vals:
        name = c
        while name in taken:  # repeat the suffix until unique (chained joins)
            name = name + suffix
        ren[c] = name
        taken.add(name)
    out_r_cols = [ren[c] for c in r_vals]

    def _col(t: pa.Table, name: str, want: pa.DataType):
        # degenerate upstream blocks (a skew guard capped every candidate
        # away, an all-empty map_groups) can arrive with null-typed or
        # even MISSING columns; coerce to the declared schema so union
        # and Acero always see the right types
        if name not in t.column_names:
            return pa.nulls(t.num_rows, type=want)
        arr = t[name]
        return arr if arr.type == want else arr.cast(want)

    def prep_left(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        n = t.num_rows
        cols = {c: _col(t, c, l_types[c]) for c in l_cols}
        for i, _ in enumerate(rk_names):
            cols[rk_names[i]] = pa.nulls(n, type=r_types[r_on[i]])
        for c in r_vals:
            cols[ren[c]] = pa.nulls(n, type=r_types[c])
        jp = _key_part(pa.table({c: cols[c] for c in l_on}),
                       l_on, num_partitions)
        if hot_keys is not None and salt > 1:
            import pyarrow.compute as pc

            hot = pc.fill_null(
                pc.is_in(cols[l_on[0]], value_set=pa.array(list(hot_keys))),
                False,
            ).to_numpy(zero_copy_only=False).astype(bool)
            base = jp.to_numpy(zero_copy_only=False).copy()
            spread = (base + np.arange(n, dtype=np.int64) % salt) % num_partitions
            jp = pa.array(np.where(hot, spread, base))
        cols["__jp"] = jp
        cols["__side"] = pa.array(np.zeros(n, dtype=np.int8))
        return pa.table(cols)

    def prep_right(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        n = t.num_rows
        cols = {c: pa.nulls(n, type=l_types[c]) for c in l_cols}
        for i, k in enumerate(r_on):
            cols[rk_names[i]] = _col(t, k, r_types[k])
        for c in r_vals:
            cols[ren[c]] = _col(t, c, r_types[c])
        jp = _key_part(
            pa.table({rk_names[i]: cols[rk_names[i]] for i in range(len(r_on))}),
            rk_names, num_partitions)
        if hot_keys is not None and salt > 1:
            import pyarrow.compute as pc

            # column order must match prep_left exactly (union schema)
            t2 = pa.table({**cols, "__jp": jp,
                           "__side": pa.array(np.ones(n, dtype=np.int8))})
            hot_mask = pc.fill_null(
                pc.is_in(t2[rk_names[0]], value_set=pa.array(list(hot_keys))),
                False,
            )
            hot_t = t2.filter(hot_mask)
            cold_t = t2.filter(pc.invert(hot_mask))
            copies = [cold_t]
            hb = hot_t["__jp"].to_numpy(zero_copy_only=False)
            jp_idx = hot_t.schema.get_field_index("__jp")
            for s in range(salt):  # replicate hot build rows to every slot
                shifted = pa.array((hb + s) % num_partitions)
                copies.append(hot_t.set_column(jp_idx, "__jp", shifted))
            return pa.concat_tables(copies)
        cols["__jp"] = jp
        cols["__side"] = pa.array(np.ones(n, dtype=np.int8))
        return pa.table(cols)

    # batch_size here COALESCES small upstream blocks before the sort
    # shuffle: the all-to-all's overhead is O(M x R) block-pair objects,
    # so feeding it a few large blocks instead of many tiny ones is a
    # 2-3x wall-time win at bench scale (measured); at real scale Ray's
    # 128 MB target block size governs and this is a no-op.
    lu = left.map_batches(prep_left, batch_format="pyarrow",
                          batch_size=shuffle_batch_rows)
    ru = right.map_batches(prep_right, batch_format="pyarrow",
                           batch_size=shuffle_batch_rows)
    u = lu.union(ru)

    out_cols = l_cols if semi_like else l_cols + out_r_cols

    out_types = {**{c: l_types[c] for c in l_cols},
                 **{ren[c]: r_types[c] for c in r_vals},
                 **{rk_names[i]: r_types[k] for i, k in enumerate(r_on)}}

    def _empty_out() -> pa.Table:
        return pa.table({c: pa.nulls(0, type=out_types[c]) for c in out_cols})

    def merge(g: pa.Table) -> pa.Table:
        single_threaded_kernels()
        import pyarrow.compute as pc

        # empty zero-column blocks bypass map_batches UDFs entirely in Ray
        # (the batcher never yields them), so the prep stages can't
        # normalize every degenerate block — guard here too
        if g.num_rows == 0 or "__side" not in g.column_names:
            return _empty_out()

        def _gcol(t: pa.Table, name: str, want: pa.DataType):
            if name not in t.column_names:
                return pa.nulls(t.num_rows, type=want)
            arr = t[name]
            return arr if arr.type == want else arr.cast(want)

        side = g["__side"]
        lt_raw = g.filter(pc.equal(side, 0))
        rt_raw = g.filter(pc.equal(side, 1))
        lt = pa.table({c: _gcol(lt_raw, c, out_types[c]) for c in l_cols})
        rt = pa.table({c: _gcol(rt_raw, c, out_types[c])
                       for c in rk_names + out_r_cols})
        # index join: Acero sees only (keys, row-index) — payloads attach
        # afterwards via zero-copy take, so ANY column type (lists,
        # structs, binary) rides through, and the hash join itself moves
        # two narrow columns instead of the full row
        lt2 = pa.table(
            {**{k: lt[k] for k in l_on},
             "__li": pa.array(np.arange(lt.num_rows, dtype=np.int64))}
        )
        rt2 = pa.table(
            {**{k: rt[k] for k in rk_names},
             "__ri": pa.array(np.arange(rt.num_rows, dtype=np.int64))}
        )
        j = lt2.join(
            rt2,
            keys=l_on,
            right_keys=rk_names,
            join_type=acero_how,
        )
        out = lt.take(j["__li"])  # null __li (right-only rows) take as nulls
        if full_outer:
            # key columns come back Acero-coalesced (left∪right key) under
            # the left names; overwrite the null-padded left keys with them
            for k in l_on:
                idx = out.schema.get_field_index(k)
                key = j[k]
                if key.type != out_types[k]:
                    key = key.cast(out_types[k])
                out = out.set_column(idx, k, key)
        if not semi_like:
            rtaken = rt.select(out_r_cols).take(j["__ri"])
            for c in out_r_cols:
                out = out.append_column(c, rtaken[c])
        return out.select(out_cols)

    out = u.groupby("__jp").map_groups(merge, batch_format="pyarrow")
    out._cogroup_schema = pa.schema(
        [(c, l_types[c]) for c in l_cols]
        + [(c, r_types[_inv(ren, c)]) for c in out_r_cols]
    )
    return out


def _inv(ren: dict, out_name: str) -> str:
    for k, v in ren.items():
        if v == out_name:
            return k
    raise KeyError(out_name)


def _ray_schema_to_arrow(s) -> pa.Schema:
    if s is None:
        raise ValueError("input Dataset has no schema; pass left_schema/right_schema")
    if isinstance(s, pa.Schema):
        return s
    base = getattr(s, "base_schema", None)
    if isinstance(base, pa.Schema):
        return base
    return pa.schema(list(zip(s.names, s.types)))
