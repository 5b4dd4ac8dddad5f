"""Declarative ingest-time expectations: row-level data-quality
constraints checked vectorized inside the normalize stage, with
violating rows routed to the dead-letter sink carrying a per-row
``dead_reason`` (comma-joined names of every failed check, in
declaration order) instead of being dropped or silently accepted.

This is the WRITE-side complement of ``audit_lake``'s constraint
checks (reference analog: the 170 post-load ALTERs of
``SQL/create_CDMv5_constraints.sql`` plus the unmapped-code logging of
``CMS_SynPuf_ETL_CDM_v5.py:963-976``): an expectation rejects the row
before it can enter the lake, and the reason survives in the
dead-letter parquet for triage.

Semantics:

- ``op`` vocabulary: not_null / ge / le / gt / lt / between / in_set /
  matches (RE2 regex) / min_bytes / max_bytes.
- A NULL value FAILS every check except on rows the check skips — the
  Delta-expectations convention; use an explicit ``not_null``
  expectation when that is the actual constraint, and name checks so
  the reason string reads as documentation.
- Delete events carry null payloads by design, so expectations skip
  them unless ``on_delete=True`` (key/op well-formedness is the
  normalize stage's built-in job either way).

Scale shape: every check is one Arrow kernel per batch; the per-row
reason string is built from a uint64 violation BITMASK via a
unique-codes lookup (O(distinct failure combinations) Python, O(n)
numpy take) — no per-row Python on the hot path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_OPS = {
    "not_null", "ge", "le", "gt", "lt", "between", "in_set", "matches",
    "min_bytes", "max_bytes",
}


@dataclass(frozen=True)
class Expectation:
    """One named row constraint on one column."""

    name: str
    column: str
    op: str
    value: Any = None
    value2: Any = None  # upper bound for "between"
    on_delete: bool = False

    def __post_init__(self):
        if self.op not in _OPS:
            raise ValueError(f"unknown expectation op {self.op!r}; "
                             f"one of {sorted(_OPS)}")


def _byte_len(col):
    return pc.binary_length(col.cast(pa.large_binary()))


def _ok_mask(t: pa.Table, e: Expectation):
    """Arrow bool (nulls preserved): does each row SATISFY ``e``?"""
    col = t[e.column]
    if e.op == "not_null":
        return pc.is_valid(col)
    if e.op == "ge":
        return pc.greater_equal(col, pa.scalar(e.value))
    if e.op == "le":
        return pc.less_equal(col, pa.scalar(e.value))
    if e.op == "gt":
        return pc.greater(col, pa.scalar(e.value))
    if e.op == "lt":
        return pc.less(col, pa.scalar(e.value))
    if e.op == "between":
        return pc.and_(pc.greater_equal(col, pa.scalar(e.value)),
                       pc.less_equal(col, pa.scalar(e.value2)))
    if e.op == "in_set":
        return pc.is_in(col, value_set=pa.array(list(e.value)))
    if e.op == "matches":
        return pc.match_substring_regex(col, e.value)
    if e.op == "min_bytes":
        return pc.greater_equal(_byte_len(col), pa.scalar(e.value))
    if e.op == "max_bytes":
        return pc.less_equal(_byte_len(col), pa.scalar(e.value))
    raise AssertionError(e.op)


def violation_masks(
    t: pa.Table, expectations: Sequence[Expectation]
) -> list[np.ndarray]:
    """One bool numpy mask per expectation: True = row VIOLATES it.
    Nulls violate (see module docstring); delete rows pass unless the
    expectation opts in via ``on_delete``."""
    not_del = None
    if "op" in t.column_names:
        not_del = pc.invert(
            pc.fill_null(pc.equal(t["op"], pa.scalar("delete")), False)
        ).to_numpy(zero_copy_only=False).astype(bool)
    out = []
    for e in expectations:
        viol = pc.fill_null(pc.invert(_ok_mask(t, e)), True)
        v = viol.to_numpy(zero_copy_only=False).astype(bool)
        if not e.on_delete and not_del is not None:
            v &= not_del
        out.append(v)
    return out


def reason_strings(
    viol_masks: Sequence[np.ndarray], names: Sequence[str], n: int
) -> tuple[np.ndarray, pa.Array]:
    """(valid bool mask, per-row reason string-or-null) from per-check
    violation masks.  Reasons are comma-joined check names in
    declaration order; rows violating nothing get a null reason."""
    if n and len(viol_masks) > 64:
        raise ValueError("at most 64 checks per stage (bitmask width)")
    code = np.zeros(n, dtype=np.uint64)
    for i, v in enumerate(viol_masks):
        code |= v.astype(np.uint64) << np.uint64(i)
    valid = code == 0
    if valid.all():
        return valid, pa.nulls(n, type=pa.string())
    uniq = np.unique(code)
    labels = np.array(
        [None if c == 0 else ",".join(
            names[i] for i in range(len(names)) if (int(c) >> i) & 1
        ) for c in uniq],
        dtype=object,
    )
    reasons = labels[np.searchsorted(uniq, code)]
    return valid, pa.array(reasons, type=pa.string())
