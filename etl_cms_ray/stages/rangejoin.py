"""Broadcast interval (range) join: each row matched to the interval
[lo, hi) containing its value.

The interval table is the classic small side (bands, SLAs, rate tables,
age brackets — dimension-sized at any data scale), so this is a
broadcast join by construction: intervals ship once via ``ray.put`` and
every batch resolves membership with ONE vectorized ``np.searchsorted``
against the sorted interval starts — no shuffle, the scan stays a
single streaming pass.  For the general overlapping-intervals /
many-to-many range join, compose the coarse-partition co-group pattern
instead (stages/join.py notes); this operator documents and enforces
its non-overlap assumption rather than silently mis-joining.

Reference analog: the month-window membership checks of coverage
expansion (A2, ``SURVEY.md §2``) — value-in-range against a small
static table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def interval_join(
    ds: "ray.data.Dataset",
    intervals: pa.Table,
    value_col: str,
    lo_col: str = "lo",
    hi_col: str = "hi",
    how: str = "inner",
) -> "ray.data.Dataset":
    """Join each row to the single interval with lo <= value < hi.

    ``intervals``: small Arrow table with ``lo_col``, ``hi_col`` and any
    payload columns; intervals must be NON-OVERLAPPING (validated here,
    ValueError otherwise).  ``how='inner'`` drops unmatched rows;
    ``'left'`` keeps them with null interval columns.
    """
    # native-dtype comparisons: float64 coercion would crash on temporal
    # bands and lose precision on int64 values > 2^53, so lo/hi keep the
    # interval table's own dtype and searchsorted compares natively
    # (int64 / float64 / datetime64 all supported)
    los = np.asarray(intervals[lo_col].to_numpy(zero_copy_only=False))
    his = np.asarray(intervals[hi_col].to_numpy(zero_copy_only=False))
    order = np.argsort(los, kind="stable")
    los, his = los[order], his[order]
    if np.any(his <= los):
        raise ValueError("empty interval (hi <= lo)")
    if np.any(his[:-1] > los[1:]):
        raise ValueError("intervals overlap; interval_join requires disjoint bands")
    sorted_iv = intervals.take(pa.array(order))
    payload_cols = [c for c in intervals.column_names]
    ref = ray.put({"los": los, "his": his, "table": sorted_iv})

    def attach(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        iv = ray.get(ref)
        v = np.asarray(batch[value_col].to_numpy(zero_copy_only=False))
        idx = np.searchsorted(iv["los"], v, side="right") - 1
        ok = idx >= 0
        if v.dtype.kind == "f":
            ok &= np.isfinite(v)  # NaN/inf never band-match
        safe = np.where(ok, idx, 0)
        ok &= v < iv["his"][safe]
        take_idx = pa.array(np.where(ok, safe, -1), type=pa.int64())
        take_idx = pa.compute.if_else(
            pa.compute.equal(take_idx, -1), pa.nulls(len(v), pa.int64()), take_idx
        )
        out = batch
        taken = iv["table"].take(take_idx)
        for c in payload_cols:
            name = c if c not in batch.column_names else c + "_band"
            out = out.append_column(name, taken[c])
        if how == "inner":
            out = out.filter(pa.array(ok))
        return out

    return ds.map_batches(attach, batch_format="pyarrow", batch_size=65536)
