"""Scalar function library — the reference's inline helpers, vectorized.

Reference analogs (SURVEY.md §2.8):
- date reformat YYYYMMDD -> YYYY-MM-DD (``CMS_SynPuf_ETL_CDM_v5.py:249-252``)
- month arithmetic with end-of-month clamp (``CMS:803-808``,
  ``beneficiary.py:159``)
- zero-pad codes (``CMS:828-833``), key concat (``CMS:630``, ``:834``)
- dict decode with default (gender/race M5 ``CMS:601-627``, SSA state M6
  ``CMS:158-210``)
- float parse with silent-0 fallback (``CMS:1550-1554``)

All operate on Arrow arrays/columns inside map_batches — no row loops.
"""

from __future__ import annotations

import calendar

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def reformat_date_col(col, in_fmt: str = "%Y%m%d") -> pa.Array:
    """'YYYYMMDD' strings -> date32, empty/null-safe (invalid -> null)."""
    cleaned = pc.if_else(pc.equal(col, pa.scalar("")), pa.scalar(None, type=pa.string()), col)
    ts = pc.strptime(cleaned, format=in_fmt, unit="s", error_is_null=True)
    return ts.cast(pa.date32())


def date_to_iso_col(col) -> pa.Array:
    """date/timestamp -> 'YYYY-MM-DD' strings (the reference's output form)."""
    t = col
    if not pa.types.is_timestamp(t.type):
        t = t.cast(pa.timestamp("us"))
    return pc.strftime(t, format="%Y-%m-%d")


def add_months_clamped(dates: np.ndarray, months: int) -> np.ndarray:
    """Month arithmetic with end-of-month clamp, vectorized on
    datetime64[D]: Jan 31 + 1 month -> Feb 28/29 (``CMS:803-808``)."""
    d = dates.astype("datetime64[D]")
    m = d.astype("datetime64[M]")
    day = (d - m).astype(np.int64)  # 0-based day within month
    m2 = m + np.timedelta64(months, "M")
    next_m = m2 + np.timedelta64(1, "M")
    last_day = (next_m.astype("datetime64[D]") - m2.astype("datetime64[D]")).astype(
        np.int64
    ) - 1
    return m2.astype("datetime64[D]") + np.minimum(day, last_day).astype("timedelta64[D]")


def zero_pad_col(col, width: int) -> pa.Array:
    """Left-pad codes with '0' to fixed width (``pc.utf8_lpad``)."""
    return pc.utf8_lpad(col, width, padding="0")


def concat_key_col(*cols, sep: str = "-") -> pa.Array:
    """Composite key column (``CMS:630`` county_code concat analog)."""
    return pc.binary_join_element_wise(*cols, sep)


def dict_decode_col(col, mapping: dict, default=None, value_type=None) -> pa.Array:
    """Small-dict decode via index_in + take — the M5/M6 vocabulary decode
    pattern (never a Python loop per row)."""
    keys = pa.array(list(mapping.keys()))
    values = list(mapping.values())
    idx = pc.index_in(col, value_set=keys)
    vals = pa.array(values + [default], type=value_type)
    idx_filled = pc.fill_null(idx, len(values))
    return pc.take(vals, idx_filled)


def parse_float_col(col, default: float = 0.0) -> pa.Array:
    """String -> float64 with silent-default fallback (``CMS:1550-1554``)."""
    # arrow cast with safe=False maps unparseable to error; do it manually
    stripped = pc.utf8_trim_whitespace(col)
    empty = pc.or_(pc.is_null(stripped), pc.equal(stripped, pa.scalar("")))
    as_num = pc.if_else(empty, pa.scalar(None, type=pa.string()), stripped)
    import pandas as pd

    series = pd.to_numeric(pd.Series(as_num.to_pandas()), errors="coerce")
    out = pa.array(series.fillna(default).to_numpy(), type=pa.float64())
    return out
