"""Interval merge ("era derivation") — the reference's one window-function
workload, re-expressed as a per-group vectorized sweep.

Reference: condition/drug era SQL builds 30-day-gap eras with a stack of
window functions (``SQL/create_CDMv5_condition_era.sql:33-118``,
``SQL/create_CDMv5_drug_era_non_stockpile.sql:19-172``).  Here the same
semantics are one ``groupby(keys).map_groups`` with a numpy sweep per
group: sort by start, new era where start - running_max(prev end) > gap.

Used two ways:
- ``merge_intervals_table``: generic (start,end,gap) era merge;
- ``sessionize``: point events -> sessions with an idle-gap threshold
  (the CDC engine's per-key compaction sweep, SURVEY.md §7.1 A3 analog).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def merge_intervals_pd(
    g: pd.DataFrame,
    start_col: str,
    end_col: str,
    gap: float,
    keys: list[str],
) -> pd.DataFrame:
    """Merge a single group's [start, end] intervals allowing ``gap`` slack.

    Returns one row per era: keys + era_start + era_end + n_events.
    Starts/ends may be numeric (epoch seconds) or datetime64; ``gap`` is in
    the same unit (seconds for datetimes).
    """
    g = g.sort_values([start_col, end_col], kind="mergesort")
    s = g[start_col].to_numpy()
    e = g[end_col].to_numpy()
    if np.issubdtype(s.dtype, np.datetime64):
        s = s.astype("datetime64[us]").astype(np.int64) / 1e6
        e = e.astype("datetime64[us]").astype(np.int64) / 1e6
    run_end = np.maximum.accumulate(e)
    new_era = np.empty(len(s), dtype=bool)
    new_era[0] = True
    np.greater(s[1:], run_end[:-1] + gap, out=new_era[1:])
    era_id = np.cumsum(new_era) - 1
    out = pd.DataFrame(
        {
            "era_id": era_id,
            "_start": g[start_col].to_numpy(),
            "_end": g[end_col].to_numpy(),
        }
    )
    agg = out.groupby("era_id", sort=True).agg(
        era_start=("_start", "min"), era_end=("_end", "max"), n_events=("_start", "size")
    )
    agg = agg.reset_index(drop=True)
    for k in keys:
        agg.insert(0, k, g[k].iloc[0])
    return agg


def make_era_merger(start_col: str, end_col: str, gap: float, keys: list[str]):
    """A map_groups fn over pandas groups (pass batch_format='pandas')."""

    def _fn(g: pd.DataFrame) -> pd.DataFrame:
        return merge_intervals_pd(g, start_col, end_col, gap, keys)

    return _fn


def make_sessionizer(ts_col: str, gap_seconds: float, keys: list[str]):
    """Point-event sessionization: events closer than gap_seconds chain into
    one session (era merge with zero-length intervals)."""

    def _fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.assign(_end=g[ts_col])
        return merge_intervals_pd(g, ts_col, "_end", gap_seconds, keys).rename(
            columns={"era_start": "session_start", "era_end": "session_end"}
        )

    return _fn


def sessionize_partition(
    df: pd.DataFrame, keys: list, ts_col: str, gap_seconds: float
) -> pd.DataFrame:
    """Vectorized sessionization of a WHOLE hash partition holding many
    keys: one sort + one cumsum, no per-key Python calls (the scalable
    form of make_sessionizer for bounded-size partitions)."""
    df = df.sort_values([*keys, ts_col], kind="mergesort")
    ts = df[ts_col].to_numpy()
    if np.issubdtype(ts.dtype, np.datetime64):
        ts = ts.astype("datetime64[us]").astype(np.int64) / 1e6
    new_key = np.ones(len(df), dtype=bool)
    for k in keys:
        vals = df[k].to_numpy()
        same = np.empty(len(df), dtype=bool)
        same[0] = False
        same[1:] = vals[1:] == vals[:-1]
        new_key &= ~same
    gap = np.empty(len(df), dtype=bool)
    gap[0] = True
    gap[1:] = (ts[1:] - ts[:-1]) > gap_seconds
    new_session = new_key | gap
    sid = np.cumsum(new_session)
    out = df.assign(_sid=sid).groupby([*keys, "_sid"], sort=False).agg(
        session_start=(ts_col, "min"),
        session_end=(ts_col, "max"),
        n_events=(ts_col, "size"),
    )
    return out.reset_index().drop(columns=["_sid"])
