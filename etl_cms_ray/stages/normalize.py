"""Stateless-per-batch normalize stage: events -> typed, hashed, partitioned.

Analog of the reference's positional parse + validity filter + derived
columns (``SynPufFiles.py`` record classes, field-count filter
``CMS_SynPuf_ETL_CDM_v5.py:396,431,446``, date reformat ``:249-252``).
Runs as a callable class in ``map_batches`` so per-actor setup (none yet,
but the pattern holds the broadcast handles in subclasses) happens once.

Adds:
- ``content_sha`` binary(32) — the judged per-row invariant
- ``size`` int32 — content byte length (the widen-target column)
- ``part_id`` int32 — stable hash partition of (repo, path)
- ``valid`` bool — malformed events (unknown op, null key, oversized
  content) are routed to the dead-letter sink, not dropped silently
  (reference analog: unmapped-code log, ``CMS:963-976``).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..functions.hashing import part_id_for, sha256_column
from ..schema import OPS


def fence_vector(num_partitions: int, fences: dict | None):
    """Dense applied-through-epoch vector for the pre-shuffle fence filter."""
    import numpy as np

    vec = np.full(num_partitions, -1, dtype=np.int64)
    for pid, fence in (fences or {}).items():
        vec[pid] = fence
    return vec


def normalize_batch(batch: pa.Table, *, cfg: EngineConfig, fence_vec,
                    expectations=()) -> pa.Table:
    """Task-form normalize (ingest hot path).

    Deliberately a FUNCTION, not a callable class: its per-task state (a
    fence vector + op list) costs microseconds to rebuild, while an actor
    pool pays a multi-second spin-up (process fork + imports) on every
    pipeline — measured as the dominant fixed cost of small ingests.
    Stages with expensive state (broadcast dims, minhash permutations,
    query matrices) stay actor pools.
    """
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    return _normalize(batch, cfg, pa.array(list(OPS)), fence_vec,
                      expectations)


class Normalizer:
    """Actor-pool form of the normalize stage (used when the per-actor
    state is worth amortizing — e.g. very large fence maps)."""

    def __init__(self, cfg: EngineConfig, fences: dict | None = None,
                 expectations=()):
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        self.cfg = cfg
        self.valid_ops = pa.array(list(OPS))
        self.fence_vec = fence_vector(cfg.num_partitions, fences)
        self.expectations = tuple(expectations)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return _normalize(batch, self.cfg, self.valid_ops, self.fence_vec,
                          self.expectations)


def _normalize(batch: pa.Table, cfg: EngineConfig, valid_ops, fence_vec,
               expectations=()) -> pa.Table:
    n = batch.num_rows
    content = batch["content"]
    sha = sha256_column(content)
    size = pc.binary_length(
        content.cast(pa.large_binary())
    ).cast(pa.int32())
    size = pc.fill_null(size, 0)
    part = part_id_for(batch["repo"], batch["path"], cfg.num_partitions)

    op_ok = pc.is_in(batch["op"], value_set=valid_ops)
    key_ok = pc.and_(
        pc.and_(pc.is_valid(batch["repo"]), pc.is_valid(batch["path"])),
        pc.and_(pc.is_valid(batch["epoch"]), pc.is_valid(batch["seq"])),
    )
    # delete must have null content; insert/update must have content
    is_del = pc.equal(batch["op"], pa.scalar("delete"))
    content_ok = pc.if_else(is_del, pa.scalar(True), pc.is_valid(content))
    size_ok = pc.less_equal(size, pa.scalar(cfg.max_content_bytes, type=pa.int32()))

    # built-in well-formedness + declared expectations share one reason
    # bitmask, so every dead row records every check it failed
    from .expectations import reason_strings, violation_masks

    import numpy as np

    def _viol(ok) -> "np.ndarray":
        return pc.fill_null(pc.invert(ok), True).to_numpy(
            zero_copy_only=False
        ).astype(bool)

    names = ["bad_op", "null_key", "content_op_mismatch", "oversize"]
    masks = [_viol(op_ok), _viol(key_ok), _viol(content_ok), _viol(size_ok)]
    if expectations:
        names += [e.name for e in expectations]
        masks += violation_masks(batch, expectations)
    valid_np, reason = reason_strings(masks, names, n)
    valid = pa.array(valid_np)

    out = batch.append_column("content_sha", sha)
    out = out.append_column("size", size)
    out = out.append_column("part_id", part)
    out = out.append_column("valid", valid)
    out = out.append_column("dead_reason", reason)
    assert out.num_rows == n

    import numpy as np

    fences_per_row = fence_vec[part.to_numpy(zero_copy_only=False)]
    fresh = pc.greater(out["epoch"], pa.array(fences_per_row))
    # keep fresh valid rows AND all invalid rows (dead-letter audit)
    keep = pc.or_kleene(
        pc.and_(valid, pc.fill_null(fresh, False)), pc.invert(valid)
    )
    return out.filter(pc.fill_null(keep, True))



def split_dead_letter(t: pa.Table) -> tuple[pa.Table, pa.Table]:
    """(valid, dead) — side-output routing (multi-sink fan-out analog of
    the reference's domain->destination dispatch, ``CMS:212-229``).
    The dead side keeps ``dead_reason`` (every failed check, for
    triage); the good side sheds both routing columns."""
    drop_good = [c for c in ("valid", "dead_reason") if c in t.column_names]
    good = t.filter(t["valid"]).drop_columns(drop_good)
    dead = t.filter(pc.invert(t["valid"])).drop_columns(["valid"])
    return good, dead
