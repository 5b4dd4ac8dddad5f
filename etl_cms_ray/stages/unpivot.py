"""Wide->long unpivot of list columns (and re-zip of parallel lists).

Reference analog: the repeated-column-group flatten — `ICD9_DGNS_CD_1..10`
/ `HCPCS_CD_1..45` exploded into one row per code
(``python_etl/SynPufFiles.py:135-153``) and the 13 parallel claim-line
arrays re-zipped into per-line records (``SynPufFiles.py:315-330``).
There the unpivot is a Python loop over numbered fields; here it is one
zero-copy Arrow kernel: ``ListArray.flatten()`` for the values plus
``list_parent_indices`` to gather the parent row's scalar columns — no
per-row Python, O(total elements).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def unpivot_list(
    t: pa.Table,
    list_cols: list[str] | str,
    pos_name: str = "pos",
) -> pa.Table:
    """Explode one or more PARALLEL list columns into long form.

    Each output row carries every non-list column of its parent row, a
    1-based ``pos`` within the list, and one element from each listed
    column (multiple list columns are zipped — the claim-line re-zip
    shape — and must be equal-length per row).

    Pure batch kernel: call inside ``map_batches(fn, batch_format=
    "pyarrow")``; rows only fan OUT, so it needs no shuffle and
    parallelizes embarrassingly at any scale.
    """
    if isinstance(list_cols, str):
        list_cols = [list_cols]
    first = t[list_cols[0]].combine_chunks()
    parents = pc.list_parent_indices(first)
    parents_np = parents.to_numpy(zero_copy_only=False)
    n_el = len(parents_np)
    if n_el == 0:
        pos = np.empty(0, dtype=np.int64)
    else:
        # 1-based position within each list, derived from the parent runs
        # (robust to null lists, sliced arrays and non-zero value offsets)
        run_start = np.flatnonzero(np.r_[True, parents_np[1:] != parents_np[:-1]])
        run_len = np.diff(np.r_[run_start, n_el])
        pos = np.arange(n_el, dtype=np.int64) - np.repeat(run_start, run_len) + 1
    out = t.drop_columns(list_cols).take(parents)
    out = out.append_column(pos_name, pa.array(pos, type=pa.int64()))
    for col in list_cols:
        arr = t[col].combine_chunks()
        if col != list_cols[0]:
            # null-safe parallelism check: fill null lengths with -1 so a
            # null row in one column and a non-null row in the other is a
            # hard error, not a silent misalignment (pc.all ignores nulls,
            # and flatten() skips null rows, so differing null PATTERNS
            # would otherwise zip values onto the wrong parent rows)
            lens_a = pc.fill_null(pc.list_value_length(first), -1)
            lens_b = pc.fill_null(pc.list_value_length(arr), -1)
            if t.num_rows and not pc.all(pc.equal(lens_a, lens_b)).as_py():
                raise ValueError(
                    f"unpivot_list: column {col!r} is not parallel to "
                    f"{list_cols[0]!r} (per-row lengths or null patterns differ)"
                )
        out = out.append_column(f"{col}_item", arr.flatten())
    return out
