"""Broadcast dimension join — the vocabulary-lookup analog.

The reference loads CONCEPT / CONCEPT_RELATIONSHIP into process dicts
once per run and probes them per record (``build_maps``,
``CMS_SynPuf_ETL_CDM_v5.py:290-498``; probe sites ``:948``, ``:1222``).
Here the dim table is put in the Ray object store ONCE (``ray.put``) and
each actor fetches the handle in ``__init__`` — zero-copy shared memory on
a node, one transfer per node on a cluster — then probes per batch with
``pc.index_in`` (single-match) or a pandas merge (one-to-many fan-out,
J2's multi-mapping).  Misses are tagged, not dropped — dead-letter routing
(anti-join J3) is a filter on the ``<prefix>matched`` column.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray


def put_dim(dim: pa.Table) -> "ray.ObjectRef":
    """Broadcast a small dimension table: one object-store copy, shared by
    every actor that receives the ref."""
    return ray.put(dim)


class BroadcastJoiner:
    """map_batches callable class: left-join ``batch`` to the broadcast dim.

    one_to_many=False -> vectorized pc.index_in probe (first match).
    one_to_many=True  -> pandas merge fan-out (a probe key may map to
    multiple dim rows; rows multiply, like the reference's multi-concept
    expansion at ``CMS:481-487``).
    """

    def __init__(
        self,
        dim_ref,
        key: str,
        dim_key: str | None = None,
        value_cols: list[str] | None = None,
        one_to_many: bool = False,
        matched_col: str = "matched",
    ):
        dim = ray.get(dim_ref) if isinstance(dim_ref, ray.ObjectRef) else dim_ref
        self.key = key
        self.dim_key = dim_key or key
        self.value_cols = value_cols or [c for c in dim.column_names if c != self.dim_key]
        self.one_to_many = one_to_many
        self.matched_col = matched_col
        self.dim = dim.combine_chunks()
        self._dim_keys = self.dim[self.dim_key].combine_chunks()
        if one_to_many:
            import pandas as pd

            self._dim_pd = self.dim.select([self.dim_key, *self.value_cols]).to_pandas()

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.one_to_many:
            left = batch.to_pandas()
            out = left.merge(
                self._dim_pd, how="left", left_on=self.key, right_on=self.dim_key,
                indicator="__merged",
            )
            if self.dim_key != self.key:
                out = out.drop(columns=[self.dim_key])
            # indicator, not notna() on a value column: a matched dim row
            # whose first value is legitimately NULL must not dead-letter
            out[self.matched_col] = out["__merged"].eq("both").to_numpy()
            out = out.drop(columns=["__merged"])
            return pa.Table.from_pandas(out, preserve_index=False)
        idx = pc.index_in(batch[self.key], value_set=self._dim_keys)
        for c in self.value_cols:
            batch = batch.append_column(c, pc.take(self.dim[c], idx))
        batch = batch.append_column(self.matched_col, pc.is_valid(idx))
        return batch


def split_matched(t: pa.Table, matched_col: str = "matched") -> tuple[pa.Table, pa.Table]:
    """(matched, dead_letter) — J3 anti-join complement."""
    m = t[matched_col]
    return (
        t.filter(m).drop_columns([matched_col]),
        t.filter(pc.invert(m)).drop_columns([matched_col]),
    )
