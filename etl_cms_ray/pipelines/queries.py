"""Operator-level query catalog: Ray Data pipelines + matching DuckDB SQL.

Each entry in QUERIES is a Ray-Data-first implementation of one operator
family from SURVEY.md §2 over the driver's testdata tables; ORACLE_SQL
holds the equivalent ANSI/DuckDB SQL with IDENTICAL output column names
and rounding so the driver's order-insensitive value-hash comparison
passes bit-for-bit.  Entries without SQL (near-dup, LSH, fingerprints,
multimodal) get rows-only checks.

Float discipline: every aggregate of doubles is rounded (2 or 4 digits)
on BOTH sides; rank/limit queries use fully deterministic tie-breaks.
"""

from __future__ import annotations

import os
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray
import ray.data as rd

from ..config import EngineConfig
from ..functions.hashing import sha256_hex_column
from ..functions.rayutil import read_parquet_clean as _rpc
from ..functions.text import (
    char_count_column,
    fingerprint_column,
    lang_id_table,
    punct_count_column,
    token_count_column,
)
from ..stages.ann import brute_force_topk, lsh_topk
from ..stages.compact import sessionize_partition
from ..stages.dedup import exact_dedup_groups, minhash_lsh_pairs, simhash_pairs
from ..stages.dimjoin import BroadcastJoiner, put_dim
from ..stages.join import hash_join
from ..stages.multimodal import DecodeStub, FrameSampler, synth_media_table
from ..stages.packing import pack_token_chunks, weighted_corpus_mix
from .ingest import ingest, read_lake



def _qround(x, digits: int = 2):
    """Tie-unambiguous decimal quantization: floor(x*10^d + 0.5)/10^d.

    round() differs between engines exactly at representable ties (pandas
    half-even vs DuckDB half-away); floor of identical IEEE doubles never
    does.  Every cross-engine float in this module uses _qround, and every
    oracle SQL uses the literal floor((x)*scale + 0.5)/scale mirror.
    """
    scale = float(10 ** digits)
    return np.floor(x * scale + 0.5) / scale


def _sql_q(expr: str, digits: int = 2) -> str:
    scale = 10 ** digits
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def _final_agg(partials: "rd.Dataset", agg_fn) -> "rd.Dataset":
    """Final reduce over pre-aggregated partials as ONE coalesced task.

    BOUNDED-cardinality keys only (statuses, priorities, languages,
    months, histogram bins, top-k candidate pools): the surviving rows
    number ~(#keys x #blocks), which stays tiny at any data scale, and a
    single pandas groupby over the coalesced partials beats Ray's
    sort-based Aggregate operator (~300ms/block fixed cost).  Aggregations
    keyed by an UNBOUNDED entity space (users, customers, orderkeys) must
    use _coarse_final instead — one coalesced task over #keys rows is a
    scale bottleneck.
    """
    return partials.repartition(1).map_batches(
        agg_fn, batch_format="pandas", batch_size=None
    )


_COARSE_PARTS = 64


def _coarse_final(
    partials: "rd.Dataset", key: str, final_fn, parts: int = _COARSE_PARTS
) -> "rd.Dataset":
    """Scale-safe final reduce for UNBOUNDED integer key spaces.

    Hash-partitions the per-batch partials into ``parts`` coarse buckets
    (key % parts, so every partial row of one key lands in one bucket) and
    runs ONE vectorized ``final_fn`` sweep per bucket via
    groupby(bucket).map_groups — the cdc_sessionize pattern (CLAUDE.md
    rule 3).  Work per final task is #keys/parts, independent of any
    single task holding the whole key space; ``parts`` bounds the shuffle
    fan-in and can rise with the cluster.
    """

    def add_part(t: pa.Table) -> pa.Table:
        # pandas-format partials arrive with a pandas metadata dict on the
        # schema, which is unhashable and defeats Ray's schema-dedup early
        # exit in the sort shuffle ("Failed to hash the schemas" spam)
        t = t.replace_schema_metadata(None)
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("fpart", pa.array((k % parts).astype(np.int64)))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return final_fn(df.drop(columns=["fpart"]))

    # batch_size coalesces the many tiny partial blocks before the sort
    # shuffle — its overhead is O(M x R) block pairs, so few big blocks
    # beat many small ones (same rationale as stages/join.py)
    parted = partials.map_batches(add_part, batch_format="pyarrow",
                                  batch_size=65536)
    return parted.groupby("fpart").map_groups(per_part, batch_format="pandas")


def _join_parts(cap: int = 8) -> int:
    """Session-sized num_partitions for native Dataset.join (see
    functions/rayutil.default_join_partitions — the single source of
    truth for the sizing rationale)."""
    from ..functions.rayutil import default_join_partitions

    return default_join_partitions(cap)



def _pq_cols_schema(sf_dir: str, table: str, cols: list) -> pa.Schema:
    """Static column schema from parquet footer metadata — the zero-cost
    way to feed hash_join's left_schema/right_schema for map_batches
    chains over reads (Dataset.schema() would execute a block)."""
    s = pq.read_schema(f"{sf_dir}/{table}.parquet")
    return pa.schema([(c, s.field(c).type) for c in cols])


def _nometa(t: pa.Table) -> pa.Table:
    """Strip schema metadata for join inputs (see
    functions/rayutil.strip_schema_metadata).  Also pins the worker's
    Arrow thread pool (CLAUDE.md rule 2): every join-input stage wraps
    its filter/is_in kernels in _nometa, so pinning here covers each of
    those hot lambdas without a separate pass."""
    from ..functions.rayutil import strip_schema_metadata
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    return strip_schema_metadata(t)


def _add_upart(t: pa.Table) -> pa.Table:
    """Coarse key-hash partition column for per-partition vectorized
    sweeps (CLAUDE.md rule 3): one group per hash bucket, never per key."""
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    return t.append_column("upart", pa.array((uid % 64).astype(np.int64)))


def _events(sf_dir: str, columns=None) -> "rd.Dataset":
    return _rpc(f"{sf_dir}/events.parquet", columns=columns)


# ===========================================================================
# CDC semantics over the `events` stream (key = user_id, LWW on (ts, event_id))


def cdc_lww_latest(sf_dir: str) -> "rd.Dataset":
    """LWW final state per key (D5 LatestYearData analog): per-batch partial
    reduce, then per-key final pick after the hash shuffle."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def last_per_user(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        return df.groupby("user_id", sort=False).tail(1)

    ds = ds.map_batches(last_per_user, batch_format="pandas")  # combiner
    return _coarse_final(
        ds,
        "user_id",
        lambda df: last_per_user(df).rename(
            columns={"event_type": "last_type", "value": "last_value", "ts": "last_ts"}
        )[["user_id", "last_type", "last_value", "last_ts"]],
    )


_SQL_LWW = """
SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def cdc_lww_tombstone(sf_dir: str) -> "rd.Dataset":
    """Same, but a winning 'error' event acts as a delete tombstone."""
    ds = cdc_lww_latest(sf_dir)
    return ds.map_batches(
        lambda t: t.filter(pc.not_equal(t["last_type"], pa.scalar("error"))),
        batch_format="pyarrow",
    )


_SQL_LWW_TOMBSTONE = """
WITH last AS (
  SELECT user_id, event_type, value, ts
  FROM events
  QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
)
SELECT user_id, event_type AS last_type, value AS last_value, ts AS last_ts
FROM last WHERE event_type <> 'error'
"""


def cdc_first_occurrence(sf_dir: str) -> "rd.Dataset":
    """Emit-once per (user_id, event_type) — visit-dedup/emit-once analog
    (T4/T5): first (ts, event_id) wins."""
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type"])

    def first_per(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["ts", "event_id"], kind="mergesort")
        return df.groupby(["user_id", "event_type"], sort=False).head(1)

    ds = ds.map_batches(first_per, batch_format="pandas")
    return _coarse_final(
        ds,
        "user_id",
        lambda df: first_per(df).rename(
            columns={"ts": "first_ts", "event_id": "first_event_id"}
        )[["user_id", "event_type", "first_ts", "first_event_id"]],
    )


_SQL_FIRST = """
SELECT user_id, event_type, ts AS first_ts, event_id AS first_event_id
FROM events
QUALIFY row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts ASC, event_id ASC) = 1
"""


def cdc_partition_stats(sf_dir: str) -> "rd.Dataset":
    """Per-key grouped stats (observation_period min/max + counters analog,
    A1/A4): per-batch partials before the shuffle."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_v=_qround(df["value"], 2))
        g = df.groupby("user_id", sort=False).agg(
            _n=("ts", "size"), _min=("ts", "min"), _max=("ts", "max"), _sum=("_v", "sum")
        )
        return g.reset_index()

    def final(df):
        g = df.groupby("user_id", sort=False).agg(
            n_events=("_n", "sum"), min_ts=("_min", "min"),
            max_ts=("_max", "max"), _s=("_sum", "sum"),
        ).reset_index()
        return g.assign(
            n_events=g["n_events"].astype("int64"), sum_value=_qround(g["_s"], 2)
        ).drop(columns=["_s"])

    return _coarse_final(
        ds.map_batches(partial, batch_format="pandas"), "user_id", final
    )


_SQL_PARTITION_STATS = """
SELECT user_id, count(*) AS n_events, min(ts) AS min_ts, max(ts) AS max_ts,
       floor((sum(floor((value) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_value
FROM events GROUP BY user_id
"""


def cdc_sessionize(sf_dir: str) -> "rd.Dataset":
    """30-minute-gap sessionization per user (streaming-window analog):
    groupby(key).map_groups over ts-sorted groups."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        s = sessionize_partition(df, ["user_id"], "ts", gap_seconds=30 * 60)
        g = s.groupby("user_id", sort=False).agg(
            n_sessions=("n_events", "size"), n_events=("n_events", "sum")
        )
        return g.reset_index().astype({"n_sessions": "int64", "n_events": "int64"})

    # key-hash partitions instead of per-user groups: one vectorized
    # sweep per partition, not one Python call per user
    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    return parts.groupby("upart").map_groups(per_partition, batch_format="pandas")


_SQL_SESSIONIZE = """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, CAST(sum(new_s) AS BIGINT) AS n_sessions, count(*) AS n_events
FROM d GROUP BY user_id
"""


def cdc_era_merge(sf_dir: str) -> "rd.Dataset":
    """Interval merge with 1-hour gap per (user_id, event_type) — the era
    derivation A3 (condition_era 30-day-gap merge) re-expressed as a
    per-group vectorized sweep instead of window-function SQL."""
    ds = _events(sf_dir, ["user_id", "event_type", "ts"])

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        s = sessionize_partition(df, ["user_id", "event_type"], "ts", gap_seconds=3600.0)
        s = s.rename(columns={"session_start": "era_start", "session_end": "era_end"})
        s["n_events"] = s["n_events"].astype("int64")
        return s[["user_id", "event_type", "era_start", "era_end", "n_events"]]

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    return parts.groupby("upart").map_groups(per_partition, batch_format="pandas")


_SQL_ERA_MERGE = """
WITH o AS (
  SELECT user_id, event_type, ts,
         lag(ts) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id) AS prev_ts,
         event_id
  FROM events
), m AS (
  SELECT user_id, event_type, ts, event_id,
         CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 1 HOUR THEN 1 ELSE 0 END AS new_era
  FROM o
), g AS (
  SELECT *, sum(new_era) OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id
                               ROWS UNBOUNDED PRECEDING) AS era_id
  FROM m
)
SELECT user_id, event_type, min(ts) AS era_start, max(ts) AS era_end, count(*) AS n_events
FROM g GROUP BY user_id, event_type, era_id
"""


def cdc_prev_event_gap(sf_dir: str) -> "rd.Dataset":
    """Per-event lag to the previous event of the same user — the
    reference's lag() OVER (PARTITION BY person) analog (O4), PLUS the
    intra-group back-reference to the previous record's ID (J6, the
    ``preceding_visit_occurrence_id`` backfill,
    ``V5.0_TO_V5.2_SCRIPT/insert_visit_occurrence.sql:41``): per-group
    vectorized shift inside map_groups after the key shuffle."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts"])

    def with_gap(g: pd.DataFrame) -> pd.DataFrame:
        # one vectorized shift per coarse partition; groupby-shift keeps
        # the first event of each user at NaN/null
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        prev = grp["ts"].shift(1)
        g = g.assign(
            # microsecond-grid quantization (CLAUDE.md rule 4): pandas
            # ns->seconds division and DuckDB epoch(interval) differ in
            # the last ulp on fractional-second gaps
            gap_s=_qround((g["ts"] - prev).dt.total_seconds(), 6),
            # float64 with NaN for the first event of each user: nullable
            # BIGINT lands as float64+NaN on the DuckDB->pandas side too,
            # so both engines hash identically
            prev_event_id=grp["event_id"].shift(1).astype("float64"),
        )
        return g[["user_id", "event_id", "ts", "gap_s", "prev_event_id"]]

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    return parts.groupby("upart").map_groups(with_gap, batch_format="pandas")


_SQL_PREV_GAP = """
SELECT user_id, event_id, ts,
       floor(epoch(ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) * 1000000 + 0.5) / 1000000 AS gap_s,
       CAST(lag(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS DOUBLE) AS prev_event_id
FROM events
"""


def events_scalar_decode(sf_dir: str) -> "rd.Dataset":
    """Scalar-library showcase with an exact SQL mirror (SURVEY §2.8
    analogs: date->iso output form M4, zero-pad M6, composite key)."""
    from ..functions.scalars import concat_key_col, date_to_iso_col, zero_pad_col

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def decode(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        iso_day = date_to_iso_col(t["ts"])
        user_code = zero_pad_col(pc.cast(t["user_id"], pa.string()), 4)
        route_key = concat_key_col(t["event_type"], user_code, sep="-")
        return pa.table(
            {
                "event_id": t["event_id"],
                "iso_day": iso_day,
                "user_code": user_code,
                "route_key": route_key,
            }
        )

    return ds.map_batches(decode, batch_format="pyarrow")


_SQL_SCALAR_DECODE = """
SELECT event_id,
       strftime(ts, '%Y-%m-%d') AS iso_day,
       lpad(CAST(user_id AS VARCHAR), CAST(greatest(length(CAST(user_id AS VARCHAR)), 4) AS INTEGER), '0') AS user_code,
       event_type || '-' || lpad(CAST(user_id AS VARCHAR), CAST(greatest(length(CAST(user_id AS VARCHAR)), 4) AS INTEGER), '0') AS route_key
FROM events
"""


def user_month_spans(sf_dir: str) -> "rd.Dataset":
    """Per-user activity expanded to one row per covered month — the
    payer-plan coverage->date-range expansion analog (A2,
    ``CMS_SynPuf_ETL_CDM_v5.py:720-797``): grouped min/max then a
    vectorized range expansion (row fan-out) in the final stage."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).agg(_a=("ts", "min"), _b=("ts", "max"))
        return g.reset_index()

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).agg(a=("_a", "min"), b=("_b", "max")).reset_index()
        a = g["a"].to_numpy().astype("datetime64[M]")
        b = g["b"].to_numpy().astype("datetime64[M]")
        n_months = (b - a).astype(np.int64) + 1
        uid = np.repeat(g["user_id"].to_numpy(), n_months)
        offsets = np.concatenate([np.arange(k) for k in n_months])
        months = np.repeat(a, n_months) + offsets.astype("timedelta64[M]")
        return pd.DataFrame({"user_id": uid, "month": months.astype("datetime64[us]")})

    return _coarse_final(
        ds.map_batches(partial, batch_format="pandas"), "user_id", expand
    )


_SQL_MONTH_SPANS = """
WITH spans AS (SELECT user_id, min(ts) AS a, max(ts) AS b FROM events GROUP BY user_id)
SELECT user_id, CAST(u.m AS TIMESTAMP) AS month
FROM spans,
     LATERAL unnest(generate_series(date_trunc('month', a), date_trunc('month', b),
                                    INTERVAL 1 MONTH)) AS u(m)
"""


def cdc_user_topk_events(sf_dir: str) -> "rd.Dataset":
    """Per-group top-k (row_number() OVER (PARTITION BY ...) <= k): each
    user's 3 highest-value events.  Scale shape: a per-batch combiner
    keeps only each user's LOCAL top-3 (so at most k rows per user per
    block enter the shuffle), then coarse user-hash partitions do one
    vectorized sort/head/cumcount sweep each — never a Python call per
    user.  Deterministic tie-break on event_id; identical doubles order
    identically on both engines."""
    K = 3
    ds = _events(sf_dir, ["event_id", "user_id", "value"])

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(
            ["user_id", "value", "event_id"],
            ascending=[True, False, True], kind="mergesort",
        )
        return df.groupby("user_id", sort=False).head(K)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = local_topk(df.drop(columns=["upart"]))
        df = df.assign(rnk=df.groupby("user_id", sort=False).cumcount() + 1)
        return df.assign(value=_qround(df["value"], 2))[
            ["user_id", "rnk", "event_id", "value"]
        ]

    partials = ds.map_batches(local_topk, batch_format="pandas")
    parts = partials.map_batches(_add_upart, batch_format="pyarrow",
                                 batch_size=65536)
    return parts.groupby("upart").map_groups(finalize, batch_format="pandas")


_SQL_USER_TOPK = f"""
WITH r AS (
  SELECT user_id, event_id, value,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rnk
  FROM events
)
SELECT user_id, CAST(rnk AS BIGINT) AS rnk, event_id,
       {_sql_q('value', 2)} AS value
FROM r WHERE rnk <= 3
"""


def cdc_tumbling_window(sf_dir: str) -> "rd.Dataset":
    """Tumbling (fixed, non-overlapping) time-window aggregate: per-user
    daily event count + value sum.  The streaming-window shape done
    batch-style: per-batch partials pre-aggregate (user, window) inside
    map_batches, then coarse user-hash partitions finish with one
    vectorized sweep — (user x window) is an unbounded key space, so no
    single-task final (CLAUDE.md rule 3).  Grid discipline on the sum."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(win_start=df["ts"].dt.floor("D"), _v=_qround(df["value"], 2))
        return (
            df.groupby(["user_id", "win_start"], sort=False)
            .agg(_n=("_v", "size"), _s=("_v", "sum"))
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop(columns=["upart"])
            .groupby(["user_id", "win_start"], sort=False)
            .agg(n_events=("_n", "sum"), _s=("_s", "sum"))
            .reset_index()
        )
        return g.assign(
            n_events=g["n_events"].astype("int64"),
            sum_value=_qround(g["_s"], 2),
        ).drop(columns=["_s"])

    partials = ds.map_batches(partial, batch_format="pandas")
    parts = partials.map_batches(_add_upart, batch_format="pyarrow",
                                 batch_size=65536)
    return parts.groupby("upart").map_groups(finalize, batch_format="pandas")


_SQL_TUMBLING = f"""
SELECT user_id, date_trunc('day', ts) AS win_start,
       CAST(count(*) AS BIGINT) AS n_events,
       {_sql_q("sum(floor((value) * 100 + 0.5) / 100)", 2)} AS sum_value
FROM events GROUP BY user_id, date_trunc('day', ts)
"""


def top_events_by_value(sf_dir: str) -> "rd.Dataset":
    """Global sort + limit through Ray Data's distributed sort operator
    (O1/O3 parity: the engine-produced total ordering the reference gets
    from its external pre-sort).  Raw column values, deterministic
    tie-break on event_id."""
    ds = _events(sf_dir, ["event_id", "user_id", "event_type", "value"])
    out = ds.sort(["value", "event_id"], descending=[True, False]).limit(20)
    return out


_SQL_TOP_EVENTS = """
SELECT event_id, user_id, event_type, value
FROM events
ORDER BY value DESC, event_id
LIMIT 20
"""


def cdc_rolling_value_mean(sf_dir: str) -> "rd.Dataset":
    """Windowed aggregate: rolling mean of `value` over each user's last 3
    events (ts, event_id order) — the windowed-aggregate custom operator:
    key-hash partitions + one vectorized pandas rolling per partition."""
    ds = _events(sf_dir, ["event_id", "user_id", "ts", "value"])

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        # grid discipline (CLAUDE.md rule 4): quantize terms, then an
        # explicit shift-based sum/count — pandas' incremental rolling
        # accumulator can drift from DuckDB's per-frame recompute
        df = df.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        v = _qround(df["value"], 2)
        g = df.assign(_v=v).groupby("user_id", sort=False)["_v"]
        s1, s2 = g.shift(1), g.shift(2)
        total = v + s1.fillna(0.0) + s2.fillna(0.0)
        n = 1 + s1.notna().astype("int64") + s2.notna().astype("int64")
        df = df.assign(rolling_mean=_qround(_qround(total, 2) / n, 4))
        return df[["event_id", "user_id", "ts", "rolling_mean"]]

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    return parts.groupby("upart").map_groups(per_partition, batch_format="pandas")


_SQL_ROLLING = """
SELECT event_id, user_id, ts,
       floor(((floor((sum(floor(value * 100 + 0.5) / 100)
                      OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 100 + 0.5) / 100)
              / count(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)) * 10000 + 0.5)
           / 10000 AS rolling_mean
FROM events
"""


def order_status_revenue_native_join(sf_dir: str) -> "rd.Dataset":
    """Both-sides-large hash join through Ray Data's native Dataset.join
    (hash-partitioned on the key) — the non-broadcast join path, kept
    alongside the broadcast-probe pattern used when one side is small."""
    orders = _rpc(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderstatus"]
    ).map_batches(_nometa, batch_format="pyarrow")
    lineitem = _rpc(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_extendedprice", "l_discount"]
    ).map_batches(_nometa, batch_format="pyarrow")
    joined = lineitem.join(
        orders, join_type="inner", num_partitions=_join_parts(),
        on=("l_orderkey",), right_on=("o_orderkey",),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = _qround(df["l_extendedprice"] * (1 - df["l_discount"]), 2)
        g = df.assign(_rev=rev).groupby("o_orderstatus", sort=False).agg(
            _n=("_rev", "size"), _sum=("_rev", "sum")
        )
        return g.reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_orderstatus", sort=False).agg(
            n_lines=("_n", "sum"), _s=("_sum", "sum")
        ).reset_index()
        return g.assign(
            n_lines=g["n_lines"].astype("int64"), revenue=_qround(g["_s"], 2)
        ).drop(columns=["_s"])

    return _final_agg(joined.map_batches(partial, batch_format="pandas"), final)


_SQL_NATIVE_JOIN = """
SELECT o_orderstatus, count(*) AS n_lines,
       floor((sum(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderstatus
"""


def customer_order_counts(sf_dir: str) -> "rd.Dataset":
    """LEFT-join semantics: every customer, zero-filled order counts.

    Both sides are unbounded, so neither is broadcast or driver-read:
    per-batch count partials -> coarse-partition final per custkey ->
    task-based co-group LEFT join (stages/join.py) onto customer."""
    orders = _rpc(f"{sf_dir}/orders.parquet", columns=["o_custkey"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", sort=False).size().rename("_n").reset_index()

    counts = _coarse_final(
        orders.map_batches(partial, batch_format="pandas"),
        "o_custkey",
        lambda df: df.groupby("o_custkey", sort=False)["_n"].sum().reset_index(),
    )
    cust = _rpc(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    joined = hash_join(
        cust, counts, on="c_custkey", right_on="o_custkey", how="left",
        left_schema=_pq_cols_schema(sf_dir, "customer", ["c_custkey", "c_name"]),
        right_schema=pa.schema([("o_custkey", pa.int64()), ("_n", pa.int64())]),
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": df["c_custkey"],
                "c_name": df["c_name"],
                "n_orders": df["_n"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(finalize, batch_format="pandas")


_SQL_CUST_ORDER_COUNTS = """
SELECT c_custkey, c_name, CAST(COALESCE(count(o_custkey), 0) AS BIGINT) AS n_orders
FROM customer LEFT JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
"""


def events_value_histogram(sf_dir: str) -> "rd.Dataset":
    """Fixed-width histogram of `value` (bin = floor(value/50)*50):
    per-batch binning partials, coalesced final."""
    ds = _events(sf_dir, ["value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        bins = np.floor(df["value"].to_numpy() / 50.0) * 50.0
        return pd.DataFrame({"bin_lo": bins}).groupby("bin_lo", sort=False).size().rename(
            "_n"
        ).reset_index()

    return _final_agg(
        ds.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("bin_lo", sort=False)["_n"].sum().rename("n")
        .reset_index().astype({"n": "int64"}),
    )


_SQL_VALUE_HISTOGRAM = """
SELECT floor(value / 50.0) * 50.0 AS bin_lo, count(*) AS n
FROM events GROUP BY 1
"""


def lineitem_quantity_quantiles(sf_dir: str) -> pa.Table:
    """Exact discrete quantiles computed DISTRIBUTED from a value-count
    sketch: per-batch counts per distinct quantity -> tiny merged count
    vector -> cumulative walk (never ships raw rows to the driver)."""
    ds = _rpc(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_quantity", sort=False).size().rename("_n").reset_index()

    counts = (
        _final_agg(
            ds.map_batches(partial, batch_format="pandas"),
            lambda df: df.groupby("l_quantity", sort=False)["_n"].sum().reset_index(),
        )
        .to_pandas()
        .sort_values("l_quantity")
    )
    total = counts["_n"].sum()
    cum = counts["_n"].cumsum()
    qs = [0.25, 0.5, 0.75, 0.9]
    vals = []
    for q in qs:
        # quantile_disc: smallest value with cumulative fraction >= q
        target = q * total
        vals.append(float(counts["l_quantity"][(cum >= target).idxmax()]))
    return pa.table(
        {"q": pa.array(qs, type=pa.float64()), "quantity": pa.array(vals, type=pa.float64())}
    )


_SQL_QUANTILES = """
SELECT CAST(0.25 AS DOUBLE) AS q, quantile_disc(l_quantity, 0.25) AS quantity FROM lineitem
UNION ALL SELECT 0.5, quantile_disc(l_quantity, 0.5) FROM lineitem
UNION ALL SELECT 0.75, quantile_disc(l_quantity, 0.75) FROM lineitem
UNION ALL SELECT 0.9, quantile_disc(l_quantity, 0.9) FROM lineitem
"""


def doc_quality_filter(sf_dir: str) -> "rd.Dataset":
    """Composite training-data quality filter: keep documents inside
    token/char bounds with a punctuation ratio cap — the kind of rule
    chain a pretraining pipeline applies before dedup.  Pure vectorized
    Arrow predicate, SQL-mirrored."""
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def keep(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        text = t["text"]
        n_tok = token_count_column(text)
        n_chars = char_count_column(text)
        n_punct = punct_count_column(text)
        ratio = pc.divide(n_punct.cast(pa.float64()), n_chars.cast(pa.float64()))
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(n_tok, pa.scalar(5, type=pa.int64())),
                pc.less_equal(n_tok, pa.scalar(5000, type=pa.int64())),
            ),
            pc.and_(
                pc.greater_equal(n_chars, pa.scalar(30, type=pa.int64())),
                pc.less(ratio, pa.scalar(0.1)),
            ),
        )
        out = t.filter(mask)
        return pa.table({"doc_id": out["doc_id"], "lang": out["lang"]})

    return ds.map_batches(keep, batch_format="pyarrow")


_SQL_QUALITY_FILTER = """
SELECT doc_id, lang
FROM documents
WHERE array_length(string_split(text, ' ')) BETWEEN 5 AND 5000
  AND length(text) >= 30
  AND CAST(length(text) - length(replace(text, '.', '')) AS DOUBLE) / length(text) < 0.1
"""


#: event_type dimension (vocabulary analog); 'error' intentionally missing
#: -> dead-letter (unmapped-code-log analog).
_EVENT_DIM = pa.table(
    {
        "event_type": ["click", "view", "purchase", "signup"],
        "type_id": pa.array([1, 2, 3, 4], type=pa.int64()),
        "family": ["engagement", "engagement", "commerce", "account"],
    }
)


def cdc_dim_route(sf_dir: str) -> "rd.Dataset":
    """Broadcast dim join (T1/J2) + family rollup."""
    dim_ref = put_dim(_EVENT_DIM)
    ds = _events(sf_dir, ["event_type"])
    joined = ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(dim_ref=dim_ref, key="event_type"),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    matched = joined.map_batches(
        lambda t: t.filter(t["matched"]).select(["family"]), batch_format="pyarrow"
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("family", sort=False).size().rename("_n").reset_index()

    partials = matched.map_batches(partial, batch_format="pandas")
    return _final_agg(
        partials,
        lambda df: df.groupby("family", sort=False)["_n"].sum().rename("n")
        .reset_index().astype({"n": "int64"}),
    )


_SQL_DIM_ROUTE = """
WITH dim(event_type, type_id, family) AS (
  VALUES ('click', 1, 'engagement'), ('view', 2, 'engagement'),
         ('purchase', 3, 'commerce'), ('signup', 4, 'account')
)
SELECT d.family, count(*) AS n
FROM events e JOIN dim d USING (event_type)
GROUP BY d.family
"""


def cdc_dead_letter(sf_dir: str) -> "rd.Dataset":
    """Anti-join complement (J3): events whose type misses the dim."""
    dim_ref = put_dim(_EVENT_DIM)
    ds = _events(sf_dir, ["event_type"])
    joined = ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(dim_ref=dim_ref, key="event_type"),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    dead = joined.map_batches(
        lambda t: t.filter(pc.invert(t["matched"])).select(["event_type"]),
        batch_format="pyarrow",
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("event_type", sort=False).size().rename("_n").reset_index()

    return _final_agg(
        dead.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("event_type", sort=False)["_n"].sum().rename("n")
        .reset_index().astype({"n": "int64"}),
    )


_SQL_DEAD_LETTER = """
SELECT event_type, count(*) AS n
FROM events
WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
GROUP BY event_type
"""


# ===========================================================================
# Flagship: repos-shaped CDC ingest through the real lake (oracle-checked)


def _docs_change_events(sf_dir: str) -> "rd.Dataset":
    """Deterministic change stream derived from `documents`: epoch 0 full
    insert backfill; epoch 1 updates doc_id%3==0 with content||' v2' and
    deletes doc_id%7==0.  Shared by repos_lake_ingest and
    cdc_time_travel_diff so both oracles describe the same stream."""
    docs = _rpc(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def to_events(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = batch["doc_id"]
        path = pc.binary_join_element_wise("doc_", pc.cast(ids, pa.string()), "")
        n = batch.num_rows

        def mk(op, commit, epoch, seq, content, mask=None):
            t = pa.table(
                {
                    "repo": batch["source"],
                    "path": path,
                    "op": pa.array([op] * n),
                    "commit": pa.array([commit] * n),
                    "epoch": pa.array([epoch] * n, type=pa.int64()),
                    "seq": seq,
                    "lang": batch["lang"],
                    "content": content,
                }
            )
            return t.filter(mask) if mask is not None else t

        seq0 = pc.cast(ids, pa.int64())
        base = mk("insert", "c0", 0, seq0, batch["text"])
        ids_np = ids.to_numpy(zero_copy_only=False)
        upd_mask = pa.array(ids_np % 3 == 0)
        del_mask = pa.array(ids_np % 7 == 0)
        upd_content = pc.binary_join_element_wise(batch["text"], " v2", "")
        updates = mk("update", "c1", 1, seq0, upd_content, upd_mask)
        del_seq = pc.add(seq0, pa.scalar(1_000_000, type=pa.int64()))
        nulls = pa.nulls(n, type=pa.string())
        deletes = mk("delete", "c1", 1, del_seq, nulls, del_mask)
        return pa.concat_tables([base, updates, deletes])

    return docs.map_batches(to_events, batch_format="pyarrow")


def repos_lake_ingest(sf_dir: str) -> "rd.Dataset":
    """Run the REAL ingest pipeline over the _docs_change_events stream
    into a fresh lake and return the final lake state.  The per-row
    sha256(content) invariant is exposed as hex for the DuckDB oracle."""
    events = _docs_change_events(sf_dir)
    # deterministic scratch lake per sf_dir, recycled per call: repeated
    # driver/bench invocations must not accumulate unbounded /tmp copies
    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"repos_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16,
                       normalize_concurrency=2, applier_concurrency=2)
    ingest(events, cfg, count_input=False)
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def _two_commit_lake(sf_dir: str, prefix: str):
    """Fresh scratch lake ingested in TWO commits from the
    _docs_change_events stream (epoch 0, then epoch 1).  Shared by the
    time-travel / IVM catalog entries; returns (lake_root, r1, r2).
    Deterministic dir per sf_dir, recycled per call (no /tmp buildup)."""
    import hashlib as _hl
    import shutil as _sh

    events = _docs_change_events(sf_dir)
    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"{prefix}_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    r1 = ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    r2 = ingest(events.filter(expr="epoch == 1"), cfg, count_input=False)
    return lake_root, r1, r2


def cdc_time_travel_diff(sf_dir: str) -> "rd.Dataset":
    """Time travel + changelog as one oracle-checked pipeline: ingest the
    _docs_change_events stream in TWO commits (epoch 0, then epoch 1)
    into a fresh lake, then read the CHANGELOG between the two manifest
    versions with pipelines/history.snapshot_diff — partitions whose
    manifest content_hash is unchanged are skipped unread, so the diff
    costs O(changed data).  The oracle reconstructs the same diff
    relationally from `documents` (update rows for doc_id%3==0 not
    deleted, delete rows for doc_id%7==0; epoch 1 creates no new keys)."""
    from .history import snapshot_diff

    lake_root, r1, r2 = _two_commit_lake(sf_dir, "tt_lake")
    diff = snapshot_diff(lake_root, r1.manifest_version, r2.manifest_version)

    def to_hex(t: pa.Table) -> pa.Table:
        def hx(col):
            return pa.array(
                [v.hex() if v is not None else None for v in col.to_pylist()],
                type=pa.string(),
            )

        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "change": t["change"],
                "content_sha_hex": hx(t["content_sha"]),
                "old_content_sha_hex": hx(t["old_content_sha"]),
            }
        )

    return diff.map_batches(to_hex, batch_format="pyarrow")


_SQL_TIME_TRAVEL_DIFF = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       'delete' AS change,
       CAST(NULL AS VARCHAR) AS content_sha_hex,
       sha256(text) AS old_content_sha_hex
FROM documents WHERE doc_id % 7 = 0
UNION ALL
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       'update' AS change,
       sha256(text || ' v2') AS content_sha_hex,
       sha256(text) AS old_content_sha_hex
FROM documents WHERE doc_id % 3 = 0 AND doc_id % 7 <> 0
"""


def cdc_incremental_stats(sf_dir: str) -> "rd.Dataset":
    """Incremental view maintenance: a materialized per-repo aggregate
    (n_files, total_size) computed at commit 1, then rolled FORWARD by
    applying the manifest-diff changelog of commit 2 — never recomputed
    from the lake.  count/sum are abelian, so stats(v1) + delta(v1→v2)
    must equal the full recompute at v2; the oracle pins exactly that
    against a relational reconstruction of the final state."""
    from .history import incremental_repo_stats, repo_stats_snapshot

    lake_root, r1, r2 = _two_commit_lake(sf_dir, "ivm_lake")
    v1_stats = repo_stats_snapshot(lake_root, version=r1.manifest_version)
    return incremental_repo_stats(
        lake_root, v1_stats, r1.manifest_version, r2.manifest_version
    )


_SQL_INCREMENTAL_STATS = """
SELECT source AS repo,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(octet_length(encode(
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END
       ))) AS BIGINT) AS total_size
FROM documents
WHERE doc_id % 7 <> 0
GROUP BY source
"""


def cdc_incremental_token_df(sf_dir: str) -> "rd.Dataset":
    """IVM through a flat-map: the per-token document-frequency view is
    materialized at commit 1, then rolled FORWARD by tokenizing only the
    changelog's old/new content (+1 for tokens a changed doc gained, -1
    for tokens it lost) — never recomputed from the lake.  Cost is
    O(changed docs x tokens/doc), independent of lake and vocabulary
    size.  The oracle computes token df over the FINAL state directly,
    so prev + delta must equal the full recompute exactly."""
    from .history import incremental_token_df, token_df_snapshot

    lake_root, r1, r2 = _two_commit_lake(sf_dir, "tdf_lake")
    v1 = token_df_snapshot(lake_root, version=r1.manifest_version)
    return incremental_token_df(
        lake_root, v1, r1.manifest_version, r2.manifest_version
    )


_SQL_INCREMENTAL_TOKEN_DF = """
WITH final AS (
  SELECT doc_id,
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS c
  FROM documents WHERE doc_id % 7 <> 0
), toks AS (
  SELECT doc_id, unnest(list_distinct(string_split(c, ' '))) AS token
  FROM final
)
SELECT token, CAST(count(*) AS BIGINT) AS df
FROM toks WHERE token <> ''
GROUP BY token
"""


def _annot_change_events(sf_dir: str) -> "rd.Dataset":
    """Deterministic SIDECAR-annotation change stream keyed like the
    docs lake ((source, doc_<id>)): epoch 0 inserts annotations for even
    doc_ids only; epoch 1 inserts the odd half (brand-new keys), updates
    doc_id%10==0 (content||' r2') and deletes doc_id%11==0.  Paired with
    `_docs_change_events` so a join view between the two lakes sees
    inserts/updates/deletes arriving on BOTH sides of the join."""
    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "source"])

    def to_events(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = batch["doc_id"]
        ids_np = ids.to_numpy(zero_copy_only=False)
        path = pc.binary_join_element_wise("doc_", pc.cast(ids, pa.string()), "")
        score = pc.binary_join_element_wise(
            "score=", pc.cast(pa.array(ids_np % 97), pa.string()), "")
        n = batch.num_rows

        def mk(op, commit, epoch, seq, content, mask):
            t = pa.table({
                "repo": batch["source"], "path": path,
                "op": pa.array([op] * n), "commit": pa.array([commit] * n),
                "epoch": pa.array([epoch] * n, type=pa.int64()), "seq": seq,
                "lang": pa.array(["meta"] * n), "content": content,
            })
            return t.filter(mask)

        seq0 = pc.cast(ids, pa.int64())
        parts = [
            mk("insert", "a0", 0, seq0, score, pa.array(ids_np % 2 == 0)),
            mk("insert", "a1", 1, seq0, score, pa.array(ids_np % 2 == 1)),
            mk("update", "a1", 1,
               pc.add(seq0, pa.scalar(1_000_000, type=pa.int64())),
               pc.binary_join_element_wise(score, " r2", ""),
               pa.array(ids_np % 10 == 0)),
            mk("delete", "a1", 1,
               pc.add(seq0, pa.scalar(2_000_000, type=pa.int64())),
               pa.nulls(n, type=pa.string()), pa.array(ids_np % 11 == 0)),
        ]
        return pa.concat_tables(parts)

    return docs.map_batches(to_events, batch_format="pyarrow")


def cdc_ivm_join(sf_dir: str) -> "rd.Dataset":
    """Incremental view maintenance of a JOIN between two lakes: a docs
    lake and a sidecar-annotations lake (both (repo, path)-keyed) each
    ingest two commits; the join view's stored state is computed ONCE at
    (v1_a, v1_b), then rolled forward from the two changelogs alone
    (`history.keyed_join_view_refresh` — delta-join IVM, no base-lake
    rescan), and the INNER projection is returned.  The oracle computes
    the plain join over both final states relationally, so refresh ==
    full recompute exactly.  Exercises every delta case: A-only change,
    B-only change, both-change, delete-one-side, and a brand-new B key
    whose A row is supplied by the stored outer state."""
    from .history import (keyed_join_view, keyed_join_view_refresh,
                          keyed_join_view_snapshot)

    lake_a, a1, a2 = _two_commit_lake(sf_dir, "ivmj_a")
    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_b = os.path.join(tempfile.gettempdir(), f"ivmj_b_{tag}")
    _sh.rmtree(lake_b, ignore_errors=True)
    annots = _annot_change_events(sf_dir)
    cfg_b = EngineConfig(lake_root=lake_b, num_partitions=16)
    b1 = ingest(annots.filter(expr="epoch == 0"), cfg_b, count_input=False)
    b2 = ingest(annots.filter(expr="epoch == 1"), cfg_b, count_input=False)

    state0 = keyed_join_view_snapshot(
        lake_a, lake_b,
        version_a=a1.manifest_version, version_b=b1.manifest_version,
    )
    state1 = keyed_join_view_refresh(
        lake_a, lake_b, state0,
        from_version_a=a1.manifest_version,
        from_version_b=b1.manifest_version,
        to_version_a=a2.manifest_version,
        to_version_b=b2.manifest_version,
    )
    view = keyed_join_view(state1)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": t["repo"], "path": t["path"],
            "content": t["content"].cast(pa.string()),
            "annot": t["content_b"].cast(pa.string()),
        })

    return view.map_batches(project, batch_format="pyarrow")


def cdc_materialized_view(sf_dir: str) -> "rd.Dataset":
    """The keyed join view MATERIALIZED AS A LAKE
    (`pipelines/matview.py`): the docs lake and the sidecar-annotation
    lake each ingest two commits; the view lake materializes at
    (v1_a, v1_b) and then REFRESHES from the two changelogs — reading
    only the view partitions that touched keys hash to and rewriting
    only partitions that receive events, with epoch fences making a
    replayed refresh a no-op.  The oracle is the plain relational join
    over both final states, so the refreshed lake == full recompute.
    Same stream pair as `cdc_ivm_join`, which keeps the state as a
    Dataset instead."""
    from .matview import (materialize_join_view, read_join_view,
                          refresh_join_view)

    lake_a, a1, a2 = _two_commit_lake(sf_dir, "mvj_a")
    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_b = os.path.join(tempfile.gettempdir(), f"mvj_b_{tag}")
    _sh.rmtree(lake_b, ignore_errors=True)
    annots = _annot_change_events(sf_dir)
    cfg_b = EngineConfig(lake_root=lake_b, num_partitions=16)
    b1 = ingest(annots.filter(expr="epoch == 0"), cfg_b, count_input=False)
    ingest(annots.filter(expr="epoch == 1"), cfg_b, count_input=False)

    view_root = os.path.join(tempfile.gettempdir(), f"mvj_view_{tag}")
    _sh.rmtree(view_root, ignore_errors=True)
    view_cfg = EngineConfig(lake_root=view_root, num_partitions=16)
    materialize_join_view(lake_a, lake_b, view_cfg,
                          version_a=a1.manifest_version,
                          version_b=b1.manifest_version)
    refresh_join_view(lake_a, lake_b, view_cfg,
                      from_version_a=a1.manifest_version,
                      from_version_b=b1.manifest_version)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": t["repo"], "path": t["path"],
            "content": t["content"].cast(pa.string()),
            "annot": t["b_content"].cast(pa.string()),
        })

    return read_join_view(view_root).map_batches(project,
                                                 batch_format="pyarrow")


def cdc_materialized_stats(sf_dir: str) -> "rd.Dataset":
    """The per-repo aggregate view MATERIALIZED AS A LAKE
    (`matview.py` stats family): the docs lake ingests two commits; the
    stats view lake materializes at v1 and refreshes from the v1->v2
    changelog — per-repo abelian deltas + stored values read from only
    the touched view partitions, tombstoning repos whose file count
    reaches zero.  The oracle recomputes the aggregate over the final
    relational state, so refresh == full recompute.  The Dataset-state
    counterpart is `cdc_incremental_stats`."""
    from .matview import (materialize_stats_view, read_stats_view,
                          refresh_stats_view)

    lake_root, r1, r2 = _two_commit_lake(sf_dir, "mvs_base")
    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    view_root = os.path.join(tempfile.gettempdir(), f"mvs_view_{tag}")
    _sh.rmtree(view_root, ignore_errors=True)
    vcfg = EngineConfig(lake_root=view_root, num_partitions=16)
    materialize_stats_view(lake_root, vcfg, version=r1.manifest_version)
    refresh_stats_view(lake_root, vcfg,
                       from_version=r1.manifest_version,
                       to_version=r2.manifest_version)
    return read_stats_view(view_root)


_SQL_IVM_JOIN = """
WITH a AS (
  SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path,
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS content
  FROM documents WHERE doc_id % 7 <> 0
), b AS (
  SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path,
         'score=' || CAST(doc_id % 97 AS VARCHAR)
           || CASE WHEN doc_id % 10 = 0 THEN ' r2' ELSE '' END AS annot
  FROM documents WHERE doc_id % 11 <> 0
)
SELECT a.repo, a.path, a.content, b.annot
FROM a JOIN b ON a.repo = b.repo AND a.path = b.path
"""


def cdc_point_lookup(sf_dir: str) -> pa.Table:
    """Hash-pruned random access: ingest the _docs_change_events stream
    into a fresh lake, then ``point_lookup`` a fixed key set — only the
    partitions those keys hash to are opened (<= K of P; see
    ``lookup_plan``), instead of the reference's full forward pass
    (``FileControl.py:181-236``).  The key set deliberately includes
    deleted docs (%7==0 — LWW tombstoned, must return no row) and a key
    that never existed."""
    from .ingest import point_lookup

    lake_root, _r1, _r2 = _two_commit_lake(sf_dir, "pl_lake")
    ids = [1, 2, 3, 6, 9, 12, 14, 35]
    src = pq.read_table(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "source"],
        filters=[("doc_id", "in", ids)],
    )
    keys = [
        (s, f"doc_{d}")
        for d, s in zip(src["doc_id"].to_pylist(), src["source"].to_pylist())
    ]
    keys.append(("no_such_source", "doc_999999999"))  # guaranteed miss
    t = point_lookup(lake_root, keys)
    return pa.table(
        {
            "repo": t["repo"],
            "path": t["path"],
            "lang": t["lang"],
            "content": t["content"].cast(pa.string()),
            "content_sha_hex": sha256_hex_column(t["content"]),
            "size": t["size"].cast(pa.int64()),
        }
    )


def cdc_replica_sync(sf_dir: str) -> "rd.Dataset":
    """Changelog-driven replication: a primary lake is built in two
    commits; after EACH commit a replica (with a DIFFERENT partition
    count) is advanced via ``sync_lake`` — the manifest-diff changelog
    re-applied through the replica's own ingest with epoch = primary
    manifest version, so the replica's fences are the sync cursor and
    replaying a completed sync is a fenced no-op.  The pipeline asserts
    the no-op, asserts multiset-hash convergence (the BASELINE.json
    per-row sha256 invariant), and returns the REPLICA's state — the
    oracle is the same relational reconstruction the primary must match,
    so replication is value-checked end to end."""
    from .replicate import sync_lake, verify_replica

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    primary = os.path.join(tempfile.gettempdir(), f"repl_p_{tag}")
    replica = os.path.join(tempfile.gettempdir(), f"repl_r_{tag}")
    for d in (primary, replica):
        _sh.rmtree(d, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=primary, num_partitions=16)
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    r1 = sync_lake(primary, replica, num_partitions=8)  # initial full sync
    ingest(events.filter(expr="epoch == 1"), cfg, count_input=False)
    r2 = sync_lake(primary, replica)  # incremental: only changed partitions
    r3 = sync_lake(primary, replica)  # converged -> no-op, no commit
    chk = verify_replica(primary, replica)
    if r1 is None or r2 is None or r3 is not None or not chk["converged"]:
        raise AssertionError(f"replication invariants violated: {chk}")
    lake = read_lake(replica)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_wap_publish(sf_dir: str) -> "rd.Dataset":
    """Write-audit-publish: each commit of the _docs_change_events stream
    is STAGED (all data + manifest files written, CURRENT untouched —
    readers still see the prior snapshot), then the staged snapshot is
    integrity-audited (sha256/size recompute + key-placement, the
    reference's expected-output-diff spirit), and only then atomically
    published.  The pipeline asserts staged-invisibility and audit
    health at every step and returns the final lake state — the oracle
    is the same relational reconstruction as the direct-ingest path, so
    WAP must be a pure visibility protocol with zero effect on content."""
    from ..state.manifest import LakeStore
    from .maintenance import audit_lake

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"wap_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    store = LakeStore(lake_root)
    for ep in (0, 1):
        before = store.current_version()
        r = ingest(events.filter(expr=f"epoch == {ep}"), cfg,
                   count_input=False, stage=True)
        rep = audit_lake(lake_root, version=r.manifest_version)
        if store.current_version() != before or not rep["healthy"]:
            raise AssertionError(f"WAP protocol violated: {rep}")
        store.commit_staged(r.manifest_version)
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_branch_merge(sf_dir: str) -> "rd.Dataset":
    """Branch workflow over the _docs_change_events stream: epoch 0 is
    committed on MAIN, then a branch forks (zero data copied — hard
    links) and epoch 1 lands on the BRANCH in TWO isolated commits
    (updates, then deletes — the multi-commit staging WAP cannot
    express).  The branch is audited, main is asserted untouched
    throughout, and the merge fast-forwards main in one atomic
    manifest publish.  The oracle is the same relational reconstruction
    as direct ingest, so branching must be a pure visibility protocol
    with zero effect on content (reference analog: load into a scratch
    schema, validate, swap — `SQL/create_CDMv5_constraints.sql` runs
    pre-swap)."""
    from ..state.manifest import LakeStore
    from .branch import branch_root, create_branch, merge_branch
    from .maintenance import audit_lake

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"branch_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    store = LakeStore(lake_root)
    main_v0 = store.current_version()

    create_branch(lake_root, "release")
    broot = branch_root(lake_root, "release")
    bcfg = EngineConfig(lake_root=broot, num_partitions=16)
    ingest(events.filter(expr="epoch == 1 and op == 'update'"), bcfg,
           count_input=False)

    def bump_epoch(t: pa.Table) -> pa.Table:
        # the deletes commit AFTER the updates commit: it needs its own
        # epoch (fences skip epoch <= applied_through as replays); the
        # (epoch, seq) LWW order is unchanged — deletes already sort
        # after updates by seq, and the oracle reconstructs final state
        return t.set_column(t.schema.get_field_index("epoch"), "epoch",
                            pc.add(t["epoch"], pa.scalar(1, type=pa.int64())))

    ingest(events.filter(expr="epoch == 1 and op == 'delete'")
           .map_batches(bump_epoch, batch_format="pyarrow"), bcfg,
           count_input=False)
    rep = audit_lake(broot)
    if not rep["healthy"] or store.current_version() != main_v0:
        raise AssertionError(f"branch isolation violated: {rep}")
    mrep = merge_branch(lake_root, "release")
    if not mrep["fast_forward"] or mrep["conflicts"]:
        raise AssertionError(f"expected clean fast-forward: {mrep}")
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_debezium_ingest(sf_dir: str) -> "rd.Dataset":
    """Real-CDC source family: the _docs_change_events stream is
    serialized as Debezium envelopes (JSONL binlog segments — the
    fixture-generation step, driver-side by design), then the
    DISTRIBUTED connector (`sources/debezium.py`) reads the segments
    block-parallel, decodes the envelopes vectorized (struct_field
    extraction, op map via index_in/take, delete pre-images), and the
    result ingests through the standard exactly-once lake path.  The
    oracle is the same relational reconstruction as direct ingest — the
    envelope trip must be lossless."""
    from ..sources.debezium import read_events_debezium, to_debezium_lines

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    seg_dir = os.path.join(tempfile.gettempdir(), f"dbz_segments_{tag}")
    lake_root = os.path.join(tempfile.gettempdir(), f"dbz_lake_{tag}")
    _sh.rmtree(seg_dir, ignore_errors=True)
    _sh.rmtree(lake_root, ignore_errors=True)
    os.makedirs(seg_dir)
    events = _docs_change_events(sf_dir)
    # fixture generation: envelope segments, one file per input block so
    # the connector read is block-parallel
    for i, t in enumerate(events.iter_batches(batch_format="pyarrow",
                                              batch_size=65536)):
        with open(os.path.join(seg_dir, f"segment-{i:04d}.json"), "w") as f:
            f.write("\n".join(to_debezium_lines(t)) + "\n")

    stream = read_events_debezium(seg_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    ingest(stream, cfg, count_input=False)
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_partition_evolution(sf_dir: str) -> "rd.Dataset":
    """Sanctioned partition-count migration (pipelines/maintenance.py
    repartition_lake — CLAUDE.md rule 7's one legal way to change the
    bucketing of an existing lake): ingest epoch 0 at 16 partitions,
    migrate the live lake to 24 buckets (one full rewrite; every new
    bucket gets a manifest entry carrying the collapsed MAX fence so
    replayed pre-migration epochs stay no-ops and deleted keys cannot
    resurrect), then ingest epoch 1 INTO THE MIGRATED LAKE and assert a
    replay of epoch 0 applies zero events.  The oracle is the direct
    relational reconstruction — migration must be invisible to the
    relation while changing every file's bucket address."""
    import hashlib as _hl
    import shutil as _sh

    from .maintenance import repartition_lake

    events = _docs_change_events(sf_dir)
    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"pevo_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    cfg16 = EngineConfig(lake_root=lake_root, num_partitions=16)
    ingest(events.filter(expr="epoch == 0"), cfg16, count_input=False)
    m = repartition_lake(lake_root, 24)
    assert m.num_partitions == 24
    cfg24 = EngineConfig(lake_root=lake_root, num_partitions=24)
    ingest(events.filter(expr="epoch == 1"), cfg24, count_input=False)
    replay = ingest(events.filter(expr="epoch == 0"), cfg24,
                    count_input=False)
    assert replay.events_applied == 0, "migration must preserve fences"
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_debezium_export(sf_dir: str) -> "rd.Dataset":
    """CDC OUT — the write side of the Debezium connector: a lake's
    changelog published as envelope segments and consumed back through
    the same connector must reconstruct the relation exactly.  Pipeline:
    direct-ingest lake A in two commits (epoch 0, then epoch 1 with
    updates+deletes), export v0→v1 and v1→v2 via
    sources/debezium.export_changelog_debezium (snapshot_diff reads only
    changed partitions; envelopes are built as masked Arrow structs —
    before null on insert, after null on delete — and stream out
    block-parallel via write_json), then re-ingest both segment dirs
    into lake B with source.txId as the epoch.  The oracle is the same
    relational reconstruction as direct ingest (_SQL_REPOS_LAKE) — a
    FOURTH physical plan for that relation, pinning the exporter as
    lossless including pre-image delete keys."""
    import hashlib as _hl
    import shutil as _sh

    from ..sources.debezium import export_changelog_debezium, read_events_debezium

    lake_a, r1, r2 = _two_commit_lake(sf_dir, "dbzout_lake")
    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    seg1 = os.path.join(tempfile.gettempdir(), f"dbzout_seg1_{tag}")
    seg2 = os.path.join(tempfile.gettempdir(), f"dbzout_seg2_{tag}")
    lake_b = os.path.join(tempfile.gettempdir(), f"dbzout_lakeb_{tag}")
    for d in (seg1, seg2, lake_b):
        _sh.rmtree(d, ignore_errors=True)
    export_changelog_debezium(lake_a, 0, r1.manifest_version, out_dir=seg1)
    export_changelog_debezium(lake_a, r1.manifest_version,
                              r2.manifest_version, out_dir=seg2)
    cfg = EngineConfig(lake_root=lake_b, num_partitions=16)
    ingest(read_events_debezium(seg1), cfg, count_input=False)
    ingest(read_events_debezium(seg2), cfg, count_input=False)
    lake = read_lake(lake_b)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_schema_evolution(sf_dir: str) -> "rd.Dataset":
    """Full schema-evolution lifecycle on the documents-derived stream:
    commit 1 ADDs a payload column (backfilled default), commit 2 WIDENs
    size to int64 and soft-DROPs the added column (the CDM v5.0->v5.2
    DDL-migration analog, including column removal).  Old partition
    files are promoted on read, dropped columns vanish from current
    reads but remain time-travelable; the oracle pins that none of this
    perturbed the payload (same relational reconstruction as direct
    ingest)."""
    from ..schema import SchemaChange
    from ..state.manifest import LakeStore

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"evo_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    add = SchemaChange(epoch=0, change="add_column", column="stars",
                       type_name="int64", default=7)
    widen = SchemaChange(epoch=1, change="widen", column="size",
                         type_name="int64")
    drop = SchemaChange(epoch=1, change="drop_column", column="stars")
    ingest(events.filter(expr="epoch == 0"), cfg, schema_changes=[add],
           count_input=False)
    ingest(events.filter(expr="epoch == 1"), cfg,
           schema_changes=[add, widen, drop], count_input=False)
    store = LakeStore(lake_root)
    sch = store.load_registry().schema_for(store.load_registry().latest_version)
    if "stars" in sch.names or sch.field("size").type != pa.int64():
        raise AssertionError(f"evolution lifecycle violated: {sch}")
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_inplace_rewrite(sf_dir: str) -> "rd.Dataset":
    """DELETE WHERE + UPDATE WHERE over the live lake (Delta/Iceberg-
    style in-place amendment; the reference can only re-run the whole
    forward pass, ``Main.py``): ingest the _docs_change_events stream,
    then physically remove the 'de' rows (GDPR-delete path — gone from
    the base files now, not merely tombstoned) and stamp the 'fr' rows'
    content in place.  content_sha/size are re-derived centrally by the
    rewrite core, so the oracle recomputes both from the amended text
    and must match hash-for-hash."""
    from .maintenance import delete_where, update_where

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"rw_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    ingest(events, cfg, count_input=False)
    delete_where(lake_root, lambda t: pc.equal(t["lang"], pa.scalar("de")))

    def stamp(rows: pa.Table) -> pa.Table:
        marked = pc.binary_join_element_wise(
            rows["content"].cast(pa.large_string()),
            pa.array([" [fr]"] * rows.num_rows, type=pa.large_string()),
            pa.scalar("", type=pa.large_string()),
        )
        return rows.set_column(
            rows.schema.get_field_index("content"), "content", marked
        )

    update_where(lake_root,
                 lambda t: pc.equal(t["lang"], pa.scalar("fr")), stamp)
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


_SQL_INPLACE_REWRITE = """
WITH final AS (
  SELECT source, doc_id, lang,
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS c0
  FROM documents
  WHERE doc_id % 7 <> 0 AND lang <> 'de'
)
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       CASE WHEN lang = 'fr' THEN c0 || ' [fr]' ELSE c0 END AS content,
       sha256(CASE WHEN lang = 'fr' THEN c0 || ' [fr]' ELSE c0 END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN lang = 'fr' THEN c0 || ' [fr]' ELSE c0 END)) AS BIGINT) AS size
FROM final
"""


def cdc_range_scan(sf_dir: str) -> "rd.Dataset":
    """Zone-map file skipping: ingest the _docs_change_events stream into
    a fresh lake (the applier records per-partition [min,max] stats for
    every numeric column in the manifest), then ``range_scan`` the lake
    for ``150 <= size <= 450`` — partitions whose zone map is provably
    disjoint from the range are never opened (Iceberg/Delta-style data
    skipping; the reference always scans forward,
    ``FileControl.py:181-236``).  The exact predicate is re-applied after
    the MOR-aware merge, so the result is independent of how much the
    stats actually pruned."""
    from .ingest import range_scan

    lake_root, _r1, _r2 = _two_commit_lake(sf_dir, "rs_lake")
    ds = range_scan(lake_root, "size", 150, 450)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


def cdc_projection_scan(sf_dir: str) -> "rd.Dataset":
    """Sorted secondary projection (incremental MV,
    pipelines/projection.py): ingest commit 1, build a size-sorted
    projection, ingest commit 2 (updates + deletes land in many source
    partitions), REFRESH the projection incrementally (O(changed
    partitions + affected ranges); cut points fixed from the first
    build), then serve ``200 <= size <= 500`` from the projection's
    range files.  The oracle is the plain relational range filter over
    the final state, so the result must be independent of the
    projection machinery entirely — range pruning, src_part tracking
    and the refresh rewrite decide READS, never the answer.  (Reference
    analog: the post-load INDEX DDL, ``SQL/create_CDMv5_indices.sql`` —
    a physical layout built after load to serve value predicates.)"""
    import hashlib as _hl
    import shutil as _sh

    from .projection import build_projection, projection_scan

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"pj_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    build_projection(lake_root, "by_size", "size",
                     columns=["repo", "path", "lang", "content", "size"],
                     num_ranges=16)
    ingest(events.filter(expr="epoch == 1"), cfg, count_input=False)
    build_projection(lake_root, "by_size", "size",
                     columns=["repo", "path", "lang", "content", "size"],
                     num_ranges=16)
    ds = projection_scan(lake_root, "by_size", 200, 500)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_SQL_PROJECTION_SCAN = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) AS BIGINT) AS size
FROM documents
WHERE doc_id % 7 <> 0
  AND octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) BETWEEN 200 AND 500
"""


def user_value_window_ranks(sf_dir: str) -> "rd.Dataset":
    """NTILE(4) + percent_rank per user — the rank-window members the
    gap/top-k/running-total entries don't cover.  Scale shape: ranks
    need all rows of a key co-located, which is only scale-safe for
    UNBOUNDED small groups (users), never for bounded-cardinality giants
    (a per-event_type rank at 100 TB would put one group on one task) —
    so this partitions by user hash and does ONE vectorized sweep per
    coarse bucket.  Exactness: ntile is integer arithmetic on the fully
    deterministic (value, event_id) order; percent_rank is
    (min-rank-1)/(n-1), a division of identical small ints on both
    engines, hence IEEE-identical doubles."""
    ds = _events(sf_dir, ["user_id", "event_id", "value"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "value", "event_id"], kind="mergesort")
        grp = g.groupby("user_id", sort=False)
        r = grp.cumcount().to_numpy()          # 0-based deterministic pos
        c = grp["event_id"].transform("size").to_numpy()
        q, m = c // 4, c % 4
        thr = m * (q + 1)
        nt = np.where(r < thr, r // (q + 1),
                      m + (r - thr) // np.maximum(q, 1)) + 1
        rank = grp["value"].rank(method="min").to_numpy()  # ties share
        pr = np.where(c > 1, (rank - 1.0) / np.maximum(c - 1.0, 1.0), 0.0)
        return pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "event_id": g["event_id"].to_numpy(),
                "ntile4": nt.astype("int64"),
                "pct_rank": pr,
            }
        )

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    return parts.groupby("upart").map_groups(
        lambda g: sweep(g.drop(columns=["upart"])), batch_format="pandas"
    )


_SQL_WINDOW_RANKS = """
SELECT user_id, event_id,
       CAST(ntile(4) OVER (PARTITION BY user_id ORDER BY value, event_id) AS BIGINT) AS ntile4,
       percent_rank() OVER (PARTITION BY user_id ORDER BY value) AS pct_rank
FROM events
"""


def _doc_distinct_pairs(t: pa.Table, text_col: str = "text"):
    """Vectorized per-batch (distinct-token-pair -> doc count) partials.

    Replaces the pandas string self-merge (O(u^2) object-dtype join per
    doc) with integer-code index arithmetic: factorize tokens ONCE with
    lexicographically sorted codes (so code order == the SQL mirrors'
    tok_a < tok_b string order), dedup (doc, code) via one np.unique on
    a packed int64 key, then materialize each doc's within-group pairs
    by the repeat/cumsum partner-index construction — every step a numpy
    kernel, no Python per row and no string comparisons until the final
    code->string gather.  Returns (tok_a, tok_b, n_ab) numpy arrays;
    token-DF partials reuse _doc_token_codes directly."""
    d, c, uarr = _doc_token_codes(t, text_col)
    V = np.int64(len(uarr))
    # within-doc all-pairs: element at global idx i pairs with the next
    # rep[i] elements of its own (contiguous, code-sorted) group
    _, starts, sizes = np.unique(d, return_index=True, return_counts=True)
    ends = starts + sizes
    pos = np.arange(len(d), dtype=np.int64)
    rep = np.repeat(ends, sizes) - pos - 1
    L = np.repeat(pos, rep)
    R = np.arange(rep.sum(), dtype=np.int64) - np.repeat(
        np.cumsum(rep) - rep, rep) + L + 1
    pair_key, n_ab = np.unique(c[L] * V + c[R], return_counts=True)
    ca, cb = pair_key // V, pair_key % V
    return uarr[ca], uarr[cb], n_ab.astype(np.int64)


def _doc_token_codes(t: pa.Table, text_col: str = "text"):
    """Distinct (doc, token-code) incidence for one batch, sorted by
    (doc, code), with codes in LEXICOGRAPHIC token order (so code
    comparisons mirror the SQL oracles' string comparisons).  One
    factorize + one np.unique on a packed int64 key — no string dedup."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    toks = pc.split_pattern(t[text_col], pattern=" ")
    n_tok = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
    flat = pc.list_flatten(toks)
    doc_of = np.repeat(np.arange(len(n_tok), dtype=np.int64), n_tok)
    codes, uniq = pd.factorize(flat.to_pandas(), sort=True)
    V = np.int64(len(uniq))
    dedup = np.unique(doc_of * V + codes)
    return dedup // V, dedup % V, np.asarray(uniq, dtype=object)


def doc_token_cooccurrence(sf_dir: str) -> "rd.Dataset":
    """Top-20 token co-occurrence pairs (distinct-doc counts — the
    collocation/PMI-prep statistic): pair (a, b), a < b, counted once
    per document in which BOTH tokens appear.  Scale shape: pair
    generation is per-document (distinct tokens per doc are small, so
    the within-doc pair blowup is bounded and batch-local); per-batch
    pair-count partials shrink the stream to distinct pairs before ONE
    coarse pair-hash shuffle; each bucket sums and keeps only its local
    top-k (a pair lives in exactly one bucket, so the global top-k is a
    subset of the union), and the final merge is one coalesced task
    over 64×k rows.  Fully deterministic: integer counts with a total
    (count DESC, tok_a, tok_b) tie-break."""
    K = 20
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pair_counts(t: pa.Table) -> pa.Table:
        tok_a, tok_b, n_ab = _doc_distinct_pairs(t)
        a = pa.array(tok_a, type=pa.string())
        b = pa.array(tok_b, type=pa.string())
        key = fingerprint_column(
            pc.binary_join_element_wise(a, b, "\x00")
        ).to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table({
            "tok_a": a, "tok_b": b, "_n": pa.array(n_ab),
            "ppart": pa.array((key % np.uint64(64)).astype(np.int64)),
        })

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["tok_a", "tok_b"], sort=False)["_n"]
             .sum().reset_index())
        g = g.sort_values(["_n", "tok_a", "tok_b"],
                          ascending=[False, True, True], kind="mergesort")
        return g.head(K)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["_n", "tok_a", "tok_b"],
                            ascending=[False, True, True], kind="mergesort")
        out = df.head(K).rename(columns={"_n": "n_docs"})
        return out.assign(n_docs=out["n_docs"].astype("int64"))

    partials = ds.map_batches(pair_counts, batch_format="pyarrow")
    buckets = partials.groupby("ppart").map_groups(
        lambda g: bucket_topk(g.drop(columns=["ppart"])),
        batch_format="pandas",
    )
    return _final_agg(buckets, final)


_SQL_TOKEN_COOCCUR = """
WITH dt AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(tok)
), p AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, count(*) AS n_docs
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2
)
SELECT tok_a, tok_b, n_docs
FROM p ORDER BY n_docs DESC, tok_a, tok_b LIMIT 20
"""


def user_event_type_pivot(sf_dir: str) -> "rd.Dataset":
    """Long→wide PIVOT — the inverse of the unpivot family (M2/M3):
    one row per user with per-event-type counts and value sums as
    COLUMNS.  Scale shape: the pivoted column set must be BOUNDED
    (#event_types; an unbounded pivot is a schema explosion, not an
    operator), so each batch crosstabs locally into the fixed wide
    schema and the coarse user-hash final just SUMS the wide partials —
    the shuffle carries ~#users × #types numbers, never the events.
    Value sums ride the 0.01 grid (rule 4)."""
    TYPES = ["click", "error", "purchase", "signup", "view"]
    ds = _events(sf_dir, ["user_id", "event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = _qround(df["value"], 2)
        g = pd.DataFrame({"user_id": df["user_id"],
                          "event_type": df["event_type"], "_v": v})
        ct = (g.groupby(["user_id", "event_type"], sort=False)["_v"]
              .agg(["size", "sum"]).reset_index())
        wide = pd.DataFrame({"user_id": ct["user_id"].unique()})
        wide = wide.set_index("user_id")
        for ty in TYPES:
            sel = ct[ct["event_type"] == ty].set_index("user_id")
            wide[f"n_{ty}"] = sel["size"].reindex(wide.index).fillna(0)
            wide[f"sum_{ty}"] = sel["sum"].reindex(wide.index).fillna(0.0)
        return wide.reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("user_id", sort=False).sum().reset_index()
        out = {"user_id": g["user_id"].astype("int64")}
        for ty in TYPES:
            out[f"n_{ty}"] = g[f"n_{ty}"].astype("int64")
            out[f"sum_{ty}"] = _qround(g[f"sum_{ty}"], 2)
        return pd.DataFrame(out)

    partials = ds.map_batches(partial, batch_format="pandas")
    return _coarse_final(partials, "user_id", final)


_SQL_TYPE_PIVOT = """
SELECT user_id,
       count(*) FILTER (WHERE event_type = 'click') AS n_click,
       {q_click} AS sum_click,
       count(*) FILTER (WHERE event_type = 'error') AS n_error,
       {q_error} AS sum_error,
       count(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       {q_purchase} AS sum_purchase,
       count(*) FILTER (WHERE event_type = 'signup') AS n_signup,
       {q_signup} AS sum_signup,
       count(*) FILTER (WHERE event_type = 'view') AS n_view,
       {q_view} AS sum_view
FROM (SELECT user_id, event_type, floor(value * 100 + 0.5) / 100 AS v
      FROM events)
GROUP BY user_id
""".format(**{
    f"q_{ty}": _sql_q(
        f"coalesce(sum(v) FILTER (WHERE event_type = '{ty}'), 0)", 2
    )
    for ty in ("click", "error", "purchase", "signup", "view")
})


def cdc_zorder_scan(sf_dir: str) -> "rd.Dataset":
    """Z-order clustered rewrite + multi-column zone-map pruned scan
    (pipelines/zorder.py — the Delta OPTIMIZE ZORDER analog): ingest
    both commits, cluster the live lake by bit-interleaved
    (lang, size) rank codes into range files whose zone maps are tight
    on BOTH columns, then serve the 2-D predicate ``lang = 'fr' AND
    150 <= size <= 450`` from the pruned files.  The oracle is the
    plain relational filter over the final state — clustering and
    pruning decide READS, never the answer (staleness fallback and
    pruning subsets are pytest-checked in tests/test_zorder.py).
    (Reference analog: the several single-column post-load indices of
    ``SQL/create_CDMv5_indices.sql``, served here by ONE layout.)"""
    import hashlib as _hl
    import shutil as _sh

    from .zorder import build_zorder, zorder_scan

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"zo_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    ingest(events.filter(expr="epoch == 1"), cfg, count_input=False)
    build_zorder(lake_root, "by_lang_size", ["lang", "size"],
                 columns=["repo", "path", "lang", "content", "size"],
                 num_files=16)
    ds = zorder_scan(lake_root, "by_lang_size",
                     {"lang": ("fr", "fr"), "size": (150, 450)})

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_SQL_ZORDER_SCAN = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) AS BIGINT) AS size
FROM documents
WHERE doc_id % 7 <> 0 AND lang = 'fr'
  AND octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) BETWEEN 150 AND 450
"""


def cdc_smart_scan(sf_dir: str) -> "rd.Dataset":
    """Unified scan planner end-to-end (pipelines/planner.py): a lake
    with BOTH physical layouts built — a size-sorted projection and a
    (lang, size) z-order cluster — serves the 2-D predicate
    ``lang = 'fr' AND 150 <= size <= 450`` through ``smart_scan``,
    which costs every candidate path from METADATA ONLY (manifest zone
    maps, projection range files, z-order per-file zone maps) and
    executes the cheapest.  Whatever plan wins, the exact predicate is
    re-applied to the rows that come back, so the answer is identical
    to filtering the lake — the oracle is the same relational filter
    as cdc_zorder_scan, which is the point: the planner may only
    change READS.  (Reference analog: the database planner choosing
    among the 59 post-load indices of
    ``SQL/create_CDMv5_indices.sql``; a lake engine brings its own.)"""
    from .planner import smart_scan
    from .projection import build_projection
    from .zorder import build_zorder

    lake_root, _r1, _r2 = _two_commit_lake(sf_dir, "plan_lake")
    cols = ["repo", "path", "lang", "content", "size"]
    build_projection(lake_root, "by_size", "size", columns=cols,
                     num_ranges=16)
    build_zorder(lake_root, "by_lang_size", ["lang", "size"],
                 columns=cols, num_files=16)
    ds = smart_scan(lake_root, {"lang": ("fr", "fr"), "size": (150, 450)},
                    columns=cols)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_SQL_SMART_SCAN = _SQL_ZORDER_SCAN


def cdc_tag_read(sf_dir: str) -> "rd.Dataset":
    """Named snapshot refs (Iceberg tag semantics): after the epoch-0
    commit the version is tagged ``baseline``; epoch 1 then
    updates/deletes on top, and ``expire_snapshots(keep_last=1)`` —
    which WOULD reclaim every version but the head — must keep the
    tagged manifest and its data files alive.  The pipeline asserts the
    expiry actually ran against a shorter history than it kept (the tag
    did the pinning) and returns ``read_snapshot(lake, 'baseline')``,
    whose oracle is the pristine epoch-0 insert state: all documents,
    original content.  Tag targets are sha-guarded against manifest
    version reuse after rollback + roll-forward
    (state/manifest.py resolve_ref)."""
    from ..state.manifest import LakeStore
    from .history import read_snapshot
    from .maintenance import expire_snapshots

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"tag_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    r1 = ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    store = LakeStore(lake_root)
    store.set_tag("baseline", version=r1.manifest_version)
    ingest(events.filter(expr="epoch == 1"), cfg, count_input=False)
    rep = expire_snapshots(lake_root, keep_last=1)
    if r1.manifest_version not in rep["kept_versions"]:
        raise AssertionError(f"tag failed to pin v{r1.manifest_version}: {rep}")
    snap = read_snapshot(lake_root, version="baseline")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return snap.map_batches(project, batch_format="pyarrow")


_SQL_TAG_READ = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       text AS content,
       sha256(text) AS content_sha_hex,
       CAST(octet_length(encode(text)) AS BIGINT) AS size
FROM documents
"""


def cdc_expectations(sf_dir: str) -> "rd.Dataset":
    """Ingest-time expectations (stages/expectations.py — the
    write-side constraint gate; reference analog: the 170 post-load
    constraint ALTERs of ``SQL/create_CDMv5_constraints.sql`` enforced
    BEFORE the row can enter the lake): the documents change stream is
    ingested under two declared constraints (content <= 400 bytes,
    lang within the supported set); violating events divert to the
    dead-letter sink carrying a comma-joined reason.  Output is the
    dead-letter reason census read back from the lake's deadletter/
    parquet — the oracle recomputes which events violate which checks
    from the stream definition (deletes skip expectations by design)."""
    from ..stages.expectations import Expectation
    from .ingest import read_dead_letter

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"exp_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    exps = [
        Expectation("size_cap", "content", "max_bytes", 400),
        Expectation("lang_known", "lang", "in_set", ("en", "fr", "de", "es")),
    ]
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False,
           expectations=exps)
    ingest(events.filter(expr="epoch == 1"), cfg, count_input=False,
           expectations=exps)
    dead = read_dead_letter(lake_root)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("dead_reason", sort=False).size()
                .rename("_n").reset_index())

    return _final_agg(
        dead.map_batches(partial, batch_format="pandas"),
        lambda df: df.groupby("dead_reason", sort=False)["_n"].sum()
        .rename("n").reset_index().astype({"n": "int64"}),
    )


_SQL_EXPECTATIONS = """
WITH ev AS (
  SELECT lang, text AS content FROM documents
  UNION ALL
  SELECT lang, text || ' v2' FROM documents WHERE doc_id % 3 = 0
), f AS (
  SELECT (octet_length(encode(content)) > 400) AS v_size,
         (lang NOT IN ('en', 'fr', 'de', 'es')) AS v_lang
  FROM ev
)
SELECT CASE WHEN v_size AND v_lang THEN 'size_cap,lang_known'
            WHEN v_size THEN 'size_cap'
            ELSE 'lang_known' END AS dead_reason,
       count(*) AS n
FROM f WHERE v_size OR v_lang
GROUP BY 1
"""


def cdc_eq_scan(sf_dir: str) -> "rd.Dataset":
    """Dictionary-stat file skipping: the applier records the distinct
    value set of low-cardinality string columns (<= 8 short values —
    lang/category shapes) per partition in the manifest; ``eq_scan``
    opens only partitions whose set contains the probe value.  The
    equality predicate is re-applied after the MOR-aware merge, so the
    result is independent of how much the stats pruned (conservative
    contract shared with ``range_scan``)."""
    from .ingest import eq_scan

    lake_root, _r1, _r2 = _two_commit_lake(sf_dir, "eq_lake")
    ds = eq_scan(lake_root, "lang", "fr")

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_SQL_EQ_SCAN = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) AS BIGINT) AS size
FROM documents
WHERE doc_id % 7 <> 0 AND lang = 'fr'
"""


_SQL_RANGE_SCAN = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) AS BIGINT) AS size
FROM documents
WHERE doc_id % 7 <> 0
  AND octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) BETWEEN 150 AND 450
"""


_SQL_POINT_LOOKUP = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS content,
       sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) AS BIGINT) AS size
FROM documents
WHERE doc_id IN (1, 2, 3, 6, 9, 12, 14, 35) AND doc_id % 7 <> 0
"""


_SQL_REPOS_LAKE = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS content,
       sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) AS BIGINT) AS size
FROM documents
WHERE doc_id % 7 <> 0
"""


def cdc_scd2_history(sf_dir: str) -> "rd.Dataset":
    """SCD type-2 dimension history from the change stream (D5/T3 family
    extension; the validity-interval shape of the reference's era/
    observation-period derivations — ``write_observation_period_records``,
    ``CMS_SynPuf_ETL_CDM_v5.py:844``, and the event-ordinal window of
    ``SQL/create_CDMv5_drug_era_non_stockpile.sql:57`` — applied to the
    key's own version chain).  Every surviving (non-delete) version of a key
    becomes one row with its validity interval
    ``[(valid_from_epoch, valid_from_seq), (valid_to_epoch, valid_to_seq))``;
    a delete event closes the last open interval without emitting a row;
    ``is_current=1`` marks intervals still open at head.

    Scale shape: content is hashed to its 64-char sha BEFORE the
    exchange (the sweep only needs ordering columns + the sha, so the
    shuffle ships ~100 B/row instead of whole documents), then one
    coarse key-hash partition (part_id_for % 64) and ONE vectorized
    lead() sweep per bucket — per-key windows never span buckets and no
    task ever holds the whole key space.
    """
    from ..functions.hashing import part_id_for

    events = _docs_change_events(sf_dir)

    def prep(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "op": t["op"],
                "epoch": t["epoch"],
                "seq": t["seq"],
                "content_sha_hex": sha256_hex_column(t["content"]),
                "kpart": pc.cast(part_id_for(t["repo"], t["path"], 64), pa.int64()),
            }
        )

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["repo", "path", "epoch", "seq"], kind="mergesort")
        same_key = (df["repo"].shift(-1) == df["repo"]) & (
            df["path"].shift(-1) == df["path"]
        )
        # nullable lead() -> float64 + NaN on BOTH engines (the
        # prev_event_id precedent: DuckDB nullable BIGINT lands as
        # float64 in pandas too, so hashes agree)
        to_epoch = df["epoch"].shift(-1).where(same_key).astype("float64")
        to_seq = df["seq"].shift(-1).where(same_key).astype("float64")
        out = pd.DataFrame(
            {
                "repo": df["repo"],
                "path": df["path"],
                "valid_from_epoch": df["epoch"],
                "valid_from_seq": df["seq"],
                "valid_to_epoch": to_epoch,
                "valid_to_seq": to_seq,
                "is_current": to_epoch.isna().astype("int64"),
                "content_sha_hex": df["content_sha_hex"],
            }
        )
        return out[(df["op"] != "delete").values]

    # batch_size coalesces the tiny per-read blocks before the sort
    # shuffle (O(M x R) block pairs — the engine-wide pre-shuffle rule)
    parts = events.map_batches(prep, batch_format="pyarrow", batch_size=65536)
    return parts.groupby("kpart").map_groups(sweep, batch_format="pandas")


_SQL_SCD2 = """
WITH stream AS (
  SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path,
         'insert' AS op, CAST(0 AS BIGINT) AS epoch,
         CAST(doc_id AS BIGINT) AS seq, text AS content
  FROM documents
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR), 'update',
         CAST(1 AS BIGINT), CAST(doc_id AS BIGINT), text || ' v2'
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR), 'delete',
         CAST(1 AS BIGINT), CAST(doc_id + 1000000 AS BIGINT), NULL
  FROM documents WHERE doc_id % 7 = 0
), v AS (
  SELECT repo, path, op, epoch, seq, content,
         lead(epoch) OVER w AS nxt_epoch,
         lead(seq) OVER w AS nxt_seq
  FROM stream
  WINDOW w AS (PARTITION BY repo, path ORDER BY epoch, seq)
)
SELECT repo, path,
       epoch AS valid_from_epoch, seq AS valid_from_seq,
       CAST(nxt_epoch AS DOUBLE) AS valid_to_epoch,
       CAST(nxt_seq AS DOUBLE) AS valid_to_seq,
       CAST(nxt_epoch IS NULL AS BIGINT) AS is_current,
       sha256(content) AS content_sha_hex
FROM v WHERE op <> 'delete'
"""


def cdc_patch_merge(sf_dir: str) -> "rd.Dataset":
    """Partial-column (patch) upsert merge — the Debezium-style sparse
    update: a change event carries only the columns it touches (others
    NULL = untouched), and the merged state per key is the LATEST
    NON-NULL value per column, each column independently.  Extends the
    row-granularity LWW core (D5, the reference's ``LatestYearData``
    pick at ``CMS_SynPuf_ETL_CDM_v5.py:546``) to column granularity.

    Patch stream (deterministic, mirrored in the oracle): epoch 0
    inserts every doc with (content, lang); epoch 1 patches content only
    for doc_id%3==0 and lang only for doc_id%5==0.

    Scale shape: content is pre-hashed before any exchange; a per-batch
    COMBINER keeps at most 2 rows per key per batch (the per-column
    winners — the same latest-non-null sweep as the final, so combine is
    idempotent), then one coarse key-hash partition and one vectorized
    sweep per bucket.
    """
    from ..functions.hashing import part_id_for

    docs = _rpc(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "lang", "source"]
    )

    def to_patches(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = batch["doc_id"]
        path = pc.binary_join_element_wise("doc_", pc.cast(ids, pa.string()), "")
        n = batch.num_rows
        seq0 = pc.cast(ids, pa.int64())
        ids_np = ids.to_numpy(zero_copy_only=False)

        def mk(epoch, seq, sha, lang, mask=None):
            t = pa.table(
                {
                    "repo": batch["source"],
                    "path": path,
                    "epoch": pa.array([epoch] * n, type=pa.int64()),
                    "seq": seq,
                    "content_sha": sha,
                    "lang": lang,
                }
            )
            return t.filter(mask) if mask is not None else t

        base = mk(0, seq0, sha256_hex_column(batch["text"]), batch["lang"])
        upd_content = pc.binary_join_element_wise(batch["text"], " v2", "")
        patch_c = mk(1, seq0, sha256_hex_column(upd_content),
                     pa.nulls(n, type=pa.string()),
                     pa.array(ids_np % 3 == 0))
        lang_alt = pc.binary_join_element_wise(batch["lang"], "-alt", "")
        patch_l = mk(1, pc.add(seq0, pa.scalar(1_000_000, type=pa.int64())),
                     pa.nulls(n, type=pa.string()), lang_alt,
                     pa.array(ids_np % 5 == 0))
        t = pa.concat_tables([base, patch_c, patch_l])
        return t.append_column(
            "kpart", pc.cast(part_id_for(t["repo"], t["path"], 64), pa.int64())
        )

    def latest_nonnull(df: pd.DataFrame) -> pd.DataFrame:
        """Per-column LWW: the latest non-null (epoch, seq) row wins each
        column independently.  Same function serves as combiner and final
        (idempotent: output rows re-enter as a valid patch stream)."""
        df = df.sort_values(["epoch", "seq"], kind="mergesort")
        a = df[df["content_sha"].notna()].groupby(["repo", "path"], sort=False).tail(1)
        b = df[df["lang"].notna()].groupby(["repo", "path"], sort=False).tail(1)
        return pd.concat([a, b], ignore_index=True)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["epoch", "seq"], kind="mergesort")
        sha = (
            df[df["content_sha"].notna()]
            .groupby(["repo", "path"], sort=False)
            .tail(1)[["repo", "path", "content_sha"]]
        )
        lang = (
            df[df["lang"].notna()]
            .groupby(["repo", "path"], sort=False)
            .tail(1)[["repo", "path", "lang"]]
        )
        out = sha.merge(lang, on=["repo", "path"], how="outer")
        return out.rename(columns={"content_sha": "content_sha_hex"})[
            ["repo", "path", "lang", "content_sha_hex"]
        ]

    patches = docs.map_batches(to_patches, batch_format="pyarrow")
    combined = patches.map_batches(latest_nonnull, batch_format="pandas")
    return combined.groupby("kpart").map_groups(final, batch_format="pandas")


_SQL_PATCH_MERGE = """
WITH stream AS (
  SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path,
         CAST(0 AS BIGINT) AS epoch, CAST(doc_id AS BIGINT) AS seq,
         text AS content, lang
  FROM documents
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR),
         CAST(1 AS BIGINT), CAST(doc_id AS BIGINT), text || ' v2', NULL
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR),
         CAST(1 AS BIGINT), CAST(doc_id + 1000000 AS BIGINT), NULL, lang || '-alt'
  FROM documents WHERE doc_id % 5 = 0
)
SELECT repo, path,
       arg_max(lang, epoch * 100000000 + seq)
         FILTER (WHERE lang IS NOT NULL) AS lang,
       arg_max(sha256(content), epoch * 100000000 + seq)
         FILTER (WHERE content IS NOT NULL) AS content_sha_hex
FROM stream GROUP BY repo, path
"""


def _contam_corpus(sf_dir: str):
    """(corpus, bench) shared by the decontamination-family oracles:
    pool = documents minus the benchmark (doc_id%97==1) plus PLANTED
    contaminated copies of every benchmark doc (id+10M, prefixed);
    bench = the original %97 docs.  One definition so every oracle
    adjudicates the same planted overlap."""
    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def _bench_mask(t: pa.Table) -> pa.Array:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return pa.array(ids % 97 == 1)

    def planted(t: pa.Table) -> pa.Table:
        t = t.filter(_bench_mask(t))
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 10_000_000),
                "text": pc.binary_join_element_wise(
                    "benchmark passage copied verbatim ", t["text"], ""
                ),
            }
        )

    def bench_only(t: pa.Table) -> pa.Table:
        return t.filter(_bench_mask(t))

    def pool_only(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(_bench_mask(t)))

    corpus = docs.map_batches(pool_only, batch_format="pyarrow").union(
        docs.map_batches(planted, batch_format="pyarrow")
    )
    bench = docs.map_batches(bench_only, batch_format="pyarrow")
    return corpus, bench


def decontaminate_docs(sf_dir: str) -> "rd.Dataset":
    """Benchmark decontamination (stages/decontam.py): the corpus is
    documents plus PLANTED contaminated copies (each benchmark doc
    doc_id%97==1 re-appears at id+10M with a prefix), the benchmark set
    is the original %97 docs, and the output is the pool with every
    document sharing >=1 exact 5-token shingle with the benchmark
    dropped.  Two task-based hash joins (shingle semi, id anti) — no
    broadcast of either side; runs the DEFAULT 64-bit hashed-gram key
    (the scale path — the oracle compares on shingle STRINGS, exact up
    to a 2^-64 gram collision, the n-gram-Jaccard precedent); the
    oracle recomputes contamination from the shingle definition itself,
    so organic (non-planted) collisions are adjudicated identically."""
    from ..stages.decontam import decontaminate

    corpus, bench = _contam_corpus(sf_dir)
    clean = decontaminate(
        corpus, bench, n=5,
        pool_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "content_sha_hex": sha256_hex_column(t["text"]),
            }
        )

    return clean.map_batches(project, batch_format="pyarrow")


_SQL_DECONTAMINATE = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 1
  UNION ALL
  SELECT doc_id + 10000000, 'benchmark passage copied verbatim ' || text
  FROM documents WHERE doc_id % 97 = 1
), tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos
  FROM corpus
), sh AS (
  SELECT doc_id,
         token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w
               || ' ' || lead(token, 3) OVER w || ' ' || lead(token, 4) OVER w
           AS shingle
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(token, 4) OVER w IS NOT NULL
), btok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos
  FROM documents WHERE doc_id % 97 = 1
), bench AS (
  SELECT DISTINCT token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w
               || ' ' || lead(token, 3) OVER w || ' ' || lead(token, 4) OVER w
           AS shingle
  FROM btok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(token, 4) OVER w IS NOT NULL
), hits AS (
  SELECT DISTINCT s.doc_id FROM sh s JOIN bench b USING (shingle)
)
SELECT c.doc_id, sha256(c.text) AS content_sha_hex
FROM corpus c
WHERE c.doc_id NOT IN (SELECT doc_id FROM hits)
"""


def doc_ngram_overlap_frac(sf_dir: str) -> "rd.Dataset":
    """Graded contamination measurement: for every corpus document the
    FRACTION of its distinct 5-token shingles that appear anywhere in
    the benchmark set (decontaminate_docs's boolean gate, upgraded to
    the score thresholded pipelines actually tune on).  Same planted
    corpus as decontaminate_docs, same 64-bit hashed-gram scale path
    (oracle on shingle strings, exact up to a 2^-64 collision).

    Scale shape: per-doc-distinct gram hashes from the one vectorized
    shingle sweep; the benchmark side dedupes INSIDE coarse gram-hash
    partitions (stays a Dataset); one task-based LEFT join marks hits;
    one coarse doc-hash sweep counts hit/total and emits the ratio —
    neither corpus nor benchmark grams ever leave the task space."""
    from ..stages.decontam import shingle_hash_rows
    from ..stages.join import hash_join

    corpus, bench = _contam_corpus(sf_dir)
    sh_schema = pa.schema([("doc_id", pa.int64()), ("gh", pa.int64())])
    pool_sh = corpus.map_batches(shingle_hash_rows, batch_format="pyarrow",
                                 fn_kwargs=dict(n=5))

    def add_gpart(t: pa.Table) -> pa.Table:
        g = t["gh"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "gpart", pa.array(((g % 64) + 64) % 64)
        )

    bench_u = (
        bench.map_batches(shingle_hash_rows, batch_format="pyarrow",
                          fn_kwargs=dict(n=5))
        .map_batches(lambda t: t.select(["gh"]), batch_format="pyarrow")
        .map_batches(add_gpart, batch_format="pyarrow", batch_size=65536)
        .groupby("gpart")
        .map_groups(
            lambda d: d[["gh"]].drop_duplicates().assign(hit=np.int64(1)),
            batch_format="pandas",
        )
    )

    marked = hash_join(
        pool_sh, bench_u, on="gh", how="left",
        left_schema=sh_schema,
        right_schema=pa.schema([("gh", pa.int64()), ("hit", pa.int64())]),
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("doc_id", sort=False).agg(
            n_grams=("gh", "size"), n_hit=("hit", "count")
        ).reset_index()
        return pd.DataFrame({
            "doc_id": g["doc_id"].astype("int64"),
            "n_grams": g["n_grams"].astype("int64"),
            "n_hit": g["n_hit"].astype("int64"),
            "overlap_frac": _qround(
                g["n_hit"].astype("float64") * 1.0
                / g["n_grams"].astype("float64"), 6
            ),
        })

    return _coarse_final(marked, "doc_id", final)


_SQL_NGRAM_OVERLAP = """
WITH corpus AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 97 <> 1
  UNION ALL
  SELECT doc_id + 10000000, 'benchmark passage copied verbatim ' || text
  FROM documents WHERE doc_id % 97 = 1
), tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos
  FROM corpus
), sh AS (
  SELECT DISTINCT doc_id,
         token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w
               || ' ' || lead(token, 3) OVER w || ' ' || lead(token, 4) OVER w
           AS shingle
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(token, 4) OVER w IS NOT NULL
), btok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos
  FROM documents WHERE doc_id % 97 = 1
), bench AS (
  SELECT DISTINCT token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w
               || ' ' || lead(token, 3) OVER w || ' ' || lead(token, 4) OVER w
           AS shingle
  FROM btok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(token, 4) OVER w IS NOT NULL
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_grams,
       CAST(count(b.shingle) AS BIGINT) AS n_hit,
       floor((CAST(count(b.shingle) AS DOUBLE) * 1.0 / CAST(count(*) AS DOUBLE))
             * 1000000 + 0.5) / 1000000 AS overlap_frac
FROM sh s LEFT JOIN bench b USING (shingle)
GROUP BY s.doc_id
"""


def doc_chunk_windows(sf_dir: str) -> "rd.Dataset":
    """Sliding-window document chunking — the RAG / long-context prep
    operator: 64-token windows at stride 48 (16-token overlap), the
    last window stretching to the document end, no window fully
    contained in its predecessor (start positions
    1, 49, ... <= max(len-16, 1)).

    Scale shape: embarrassingly parallel — ONE vectorized sweep per
    batch (ragged-range index arithmetic over the flat token buffer ->
    ListArray reassembly -> pc.binary_join), zero shuffles, streams
    straight to the sink.  Emits (doc_id, chunk_id, n_tokens,
    chunk_sha_hex) so the oracle compares content identity without
    shipping the duplicated window text."""
    N, STRIDE, OVERLAP = 64, 48, 16
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def chunks(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        toks = pc.split_pattern(t["text"], pattern=" ").combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        base = off[0]
        flat = toks.values
        doc_len = np.diff(off)
        n_chunks = 1 + (np.maximum(doc_len - OVERLAP, 1) - 1) // STRIDE
        total_chunks = int(n_chunks.sum())
        # per-chunk: owning doc, k-th window, global start, clipped length
        doc_idx = np.repeat(np.arange(len(doc_len)), n_chunks)
        cum = np.concatenate(([0], np.cumsum(n_chunks)))
        k = np.arange(total_chunks) - cum[doc_idx]
        start_local = k * STRIDE
        chunk_len = np.minimum(N, doc_len[doc_idx] - start_local)
        start_global = (off[:-1] - base)[doc_idx] + start_local
        # ragged ranges: flat token index of every chunk member
        coff = np.concatenate(([0], np.cumsum(chunk_len)))
        ar = np.arange(int(coff[-1]))
        idx = ar - np.repeat(coff[:-1], chunk_len) + np.repeat(
            start_global, chunk_len
        )
        values = flat.take(pa.array(idx + base))
        lists = pa.ListArray.from_arrays(pa.array(coff, type=pa.int32()),
                                         values)
        text = pc.binary_join(lists, " ")
        doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[doc_idx]
        return pa.table({
            "doc_id": pa.array(doc_ids, type=pa.int64()),
            "chunk_id": pa.array(k + 1, type=pa.int64()),
            "n_tokens": pa.array(chunk_len, type=pa.int64()),
            "chunk_sha_hex": sha256_hex_column(text),
        })

    return ds.map_batches(chunks, batch_format="pyarrow")


_SQL_CHUNK_WINDOWS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         array_length(string_split(text, ' ')) AS len
  FROM documents
), s AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len - 16, 1), 48)) AS st
  FROM t
)
SELECT s.doc_id,
       CAST(row_number() OVER (PARTITION BY s.doc_id ORDER BY st) AS BIGINT)
         AS chunk_id,
       CAST(least(st + 63, t.len) - st + 1 AS BIGINT) AS n_tokens,
       sha256(array_to_string(t.toks[st:least(st + 63, t.len)], ' '))
         AS chunk_sha_hex
FROM s JOIN t USING (doc_id)
"""


def chunk_exact_dups(sf_dir: str) -> "rd.Dataset":
    """Chunk-level cross-document duplication census — the dedup signal
    at the granularity training pipelines actually pack (composes the
    sliding-window chunker with the exact-dedup family): every 64-token
    window content (by sha256) that appears in MORE THAN ONE document,
    with its distinct-document and total-occurrence counts.

    Scale shape: the chunker is map-only; per-batch (sha, doc)
    occurrence partials compress before the ONE coarse sha-hash
    shuffle; each bucket counts distinct docs + occurrences and keeps
    only cross-doc duplicates, so the output is the (small) duplicated
    subset, never the chunk universe."""
    ds = doc_chunk_windows(sf_dir)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["chunk_sha_hex", "doc_id"], sort=False)
             .size().rename("_occ").reset_index())
        return g

    def add_spart(t: pa.Table) -> pa.Table:
        fp = fingerprint_column(t["chunk_sha_hex"]).to_numpy(zero_copy_only=False)
        return t.append_column("spart", pa.array((fp % 64).astype(np.int64)))

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["spart"])
        # re-merge cross-batch (sha, doc) partials, then census per sha
        pair = (df.groupby(["chunk_sha_hex", "doc_id"], sort=False)["_occ"]
                .sum().reset_index())
        g = pair.groupby("chunk_sha_hex", sort=False).agg(
            n_docs=("doc_id", "size"), n_occurrences=("_occ", "sum")
        ).reset_index()
        g = g[g["n_docs"] > 1]
        return pd.DataFrame({
            "chunk_sha_hex": g["chunk_sha_hex"],
            "n_docs": g["n_docs"].astype("int64"),
            "n_occurrences": g["n_occurrences"].astype("int64"),
        })

    partials = ds.map_batches(partial, batch_format="pandas")
    parted = partials.map_batches(add_spart, batch_format="pyarrow",
                                  batch_size=65536)
    return parted.groupby("spart").map_groups(final, batch_format="pandas")


_SQL_CHUNK_DUPS = """
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks,
         array_length(string_split(text, ' ')) AS len
  FROM documents
), s AS (
  SELECT doc_id, unnest(generate_series(1, greatest(len - 16, 1), 48)) AS st
  FROM t
), ch AS (
  SELECT s.doc_id,
         sha256(array_to_string(t.toks[st:least(st + 63, t.len)], ' '))
           AS chunk_sha_hex
  FROM s JOIN t USING (doc_id)
)
SELECT chunk_sha_hex,
       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_occurrences
FROM ch
GROUP BY chunk_sha_hex
HAVING count(DISTINCT doc_id) > 1
"""


def training_token_budget_sample(sf_dir: str) -> "rd.Dataset":
    """Token-budget-constrained corpus selection: per source, documents
    enter the training mix in the deterministic content-sha order
    (unbiased by position or length) until the source's running token
    total exceeds a fixed budget — the per-source cap step of corpus
    assembly (the epochs/budget knob next to the weighted mix).

    Scale shape: one map-only pass computes (source, sha, n_tokens) —
    the text itself never shuffles; one coarse source-hash exchange,
    then a single vectorized sweep per bucket (sort, segmented cumsum,
    gate).  The gate is <= BUDGET on the INCLUSIVE prefix sum, so the
    first over-budget document is excluded — mirrored exactly by the
    SQL window frame."""
    BUDGET = 800
    ds = _rpc(f"{sf_dir}/documents.parquet",
              columns=["doc_id", "source", "text"])

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        toks = pc.split_pattern(t["text"], pattern=" ")
        return pa.table({
            "doc_id": t["doc_id"],
            "source": t["source"],
            "sha": sha256_hex_column(t["text"]),
            "n_tokens": pc.cast(pc.list_value_length(toks), pa.int64()),
        })

    def add_srcpart(t: pa.Table) -> pa.Table:
        fp = fingerprint_column(t["source"]).to_numpy(zero_copy_only=False)
        return t.append_column("spart", pa.array((fp % 64).astype(np.int64)))

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=["spart"]).sort_values(
            ["source", "sha", "doc_id"], kind="mergesort"
        )
        cum = df.groupby("source", sort=False)["n_tokens"].cumsum()
        keep = df[cum <= BUDGET]
        return pd.DataFrame({
            "doc_id": keep["doc_id"].astype("int64"),
            "source": keep["source"],
            "n_tokens": keep["n_tokens"].astype("int64"),
        })

    parts = ds.map_batches(partial, batch_format="pyarrow").map_batches(
        add_srcpart, batch_format="pyarrow", batch_size=65536
    )
    return parts.groupby("spart").map_groups(sweep, batch_format="pandas")


_SQL_TOKEN_BUDGET = """
WITH d AS (
  SELECT doc_id, source, sha256(text) AS sha,
         CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens,
         sum(n_tokens) OVER (PARTITION BY source ORDER BY sha, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, source, n_tokens FROM c WHERE cum <= 800
"""


def user_customer_full_outer(sf_dir: str) -> "rd.Dataset":
    """FULL OUTER hash join (stages/join.py how='outer'): per-user event
    counts x a customer key range chosen so BOTH unmatched sides are
    non-empty (users below the range, customers above the user space).
    The coalesced join key rides under the left name; unmatched-side
    BIGINTs surface as float64+NaN on both engines (the prev_event_id
    convention)."""
    from ..stages.join import hash_join

    left = _coarse_final(
        _events(sf_dir, ["user_id"]).map_batches(
            lambda df: df.groupby("user_id", sort=False)
            .size()
            .rename("_n")
            .reset_index(),
            batch_format="pandas",
        ),
        "user_id",
        lambda df: df.groupby("user_id", sort=False)["_n"]
        .sum()
        .rename("n_events")
        .reset_index()
        .assign(n_events=lambda d: d["n_events"].astype("int64")),
    )
    right = _rpc(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    right = right.map_batches(
        lambda t: t.filter(
            pa.array(
                (t["c_custkey"].to_numpy(zero_copy_only=False) >= 50)
                & (t["c_custkey"].to_numpy(zero_copy_only=False) <= 200)
            )
        ),
        batch_format="pyarrow",
    )
    joined = hash_join(
        left, right, on="user_id", right_on="c_custkey", how="outer",
        left_schema=pa.schema([("user_id", pa.int64()), ("n_events", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64()), ("c_name", pa.string())]),
    )

    def to_float(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "user_id": t["user_id"],
                "n_events": t["n_events"].cast(pa.float64()),
                "c_name": t["c_name"],
            }
        )

    return joined.map_batches(to_float, batch_format="pyarrow")


_SQL_FULL_OUTER = """
WITH u AS (
  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
), c AS (
  SELECT c_custkey, c_name FROM customer WHERE c_custkey BETWEEN 50 AND 200
)
SELECT COALESCE(u.user_id, c.c_custkey) AS user_id,
       CAST(u.n_events AS DOUBLE) AS n_events,
       c.c_name
FROM u FULL OUTER JOIN c ON u.user_id = c.c_custkey
"""


def doc_compression_ratio(sf_dir: str) -> "rd.Dataset":
    """Gopher-style compression-ratio quality signal: a document that
    DEFLATE shrinks too well is repetitive boilerplate; one that barely
    compresses is noise/binary junk.  Emits integer byte lengths (raw,
    zlib level-6 compressed) so downstream gates are integer
    cross-multiplications (``comp*1000 < raw*k``) with zero float risk;
    the keep-band [8%, 85%] follows the published heuristics.  Per-row
    zlib is a C-dominated loop (same footing as the sha256 invariant —
    irreducible); a document never leaves its batch, so the stage is
    embarrassingly parallel at any scale.  No SQL oracle exists (DuckDB
    has no DEFLATE) — rows-only; the pinned-reference pytest covers the
    kernel."""
    import zlib

    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def ratio(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        texts = t["text"].to_pylist()
        raw = np.array([len(x.encode()) if x else 0 for x in texts],
                       dtype=np.int64)
        comp = np.array(
            [len(zlib.compress(x.encode(), 6)) if x else 0 for x in texts],
            dtype=np.int64)
        keep = (comp * 100 >= raw * 8) & (comp * 100 <= raw * 85) & (raw > 0)
        return pa.table({
            "doc_id": t["doc_id"].cast(pa.int64()),
            "raw_bytes": pa.array(raw),
            "compressed_bytes": pa.array(comp),
            "keep": pa.array(keep),
        })

    return docs.map_batches(ratio, batch_format="pyarrow")


def doc_repetition_stats(sf_dir: str) -> "rd.Dataset":
    """Gopher-style within-document repetition statistics: per document,
    total vs distinct word-trigram windows and the duplicate-gram ratio
    (1 - distinct/total), flagging documents above a 10% threshold.
    Pure per-batch vectorization — a document's windows never leave its
    row, so the stage is embarrassingly parallel at any scale; reuses
    the decontamination shingle kernel with multiplicity kept."""
    from ..stages.decontam import shingle_rows

    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        sh = shingle_rows(t, n=3, distinct=False).to_pandas()
        g = (
            sh.groupby("doc_id", sort=False)
            .agg(n_grams=("shingle", "size"), n_distinct=("shingle", "nunique"))
            .reset_index()
        )
        m = pd.DataFrame(
            {"doc_id": t["doc_id"].to_numpy(zero_copy_only=False)}
        ).merge(g, on="doc_id", how="left").fillna(0)
        n_grams = m["n_grams"].to_numpy(dtype=np.float64)
        n_distinct = m["n_distinct"].to_numpy(dtype=np.float64)
        ratio = np.where(n_grams > 0, 1.0 - n_distinct / np.maximum(n_grams, 1), 0.0)
        return pa.table(
            {
                "doc_id": pa.array(m["doc_id"].to_numpy(), type=pa.int64()),
                "n_grams": pa.array(n_grams.astype(np.int64)),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "dup_ratio": pa.array(ratio, type=pa.float64()),
                "is_repetitive": pa.array(
                    ((n_grams > 0) & (ratio > 0.1)).astype(np.int64)
                ),
            }
        )

    return docs.map_batches(stats, batch_format="pyarrow")


_SQL_REPETITION = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos
  FROM documents
), tri AS (
  SELECT doc_id,
         token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w AS g
  FROM tok
  WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(token, 2) OVER w IS NOT NULL
), c AS (
  SELECT doc_id, count(*) AS n_grams, count(DISTINCT g) AS n_distinct
  FROM tri GROUP BY doc_id
)
SELECT d.doc_id,
       COALESCE(c.n_grams, 0) AS n_grams,
       COALESCE(c.n_distinct, 0) AS n_distinct,
       CASE WHEN c.n_grams IS NULL THEN 0.0
            ELSE 1.0 - CAST(c.n_distinct AS DOUBLE) / c.n_grams END AS dup_ratio,
       CAST(CASE WHEN c.n_grams IS NOT NULL
                  AND 1.0 - CAST(c.n_distinct AS DOUBLE) / c.n_grams > 0.1
                 THEN 1 ELSE 0 END AS BIGINT) AS is_repetitive
FROM documents d LEFT JOIN c USING (doc_id)
"""


def cdc_token_search(sf_dir: str) -> "rd.Dataset":
    """Inverted-token-index search over the lake (pipelines/index.py):
    ingest the change stream, build the per-partition token-bucket
    bitmap in one pass, then answer "documents mentioning X" reading
    only partitions whose bit is set — an unset bit proves absence, a
    set bit is re-checked exactly after the MOR merge, so the result
    always equals filtering the full state.  Probe token 'v2' (the
    update marker every epoch-1 content rewrite appends)."""
    import hashlib as _hl
    import shutil as _sh

    from .index import build_token_index, token_search

    events = _docs_change_events(sf_dir)
    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"tokidx_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16)
    ingest(events, cfg, count_input=False)
    build_token_index(lake_root)
    ds = token_search(lake_root, "v2", columns=["repo", "path", "lang", "content"])

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content_sha_hex": sha256_hex_column(t["content"]),
            }
        )

    return ds.map_batches(project, batch_format="pyarrow")


_SQL_TOKEN_SEARCH = """
WITH final AS (
  SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path, lang,
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS content
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT repo, path, lang, sha256(content) AS content_sha_hex
FROM final WHERE list_contains(string_split(content, ' '), 'v2')
"""


def event_type_exact_median(sf_dir: str) -> pa.Table:
    """EXACT per-group median without sorting or gathering the column:
    sketch-guided iterative refinement (stages/selection.py) — KLL
    brackets the target rank, counting passes shrink the live set ~50x
    per round, and only the final <=cap candidates are ever gathered.
    The emitted value is an exact element of the data (no interpolation),
    so both engines return identical IEEE doubles with no rounding."""
    from ..stages.selection import exact_group_quantile

    ds = _events(sf_dir, ["event_type", "value"])
    # cap 64Ki: one refinement round suffices through sf1 (the gather is
    # a few MB); the multi-round path is pinned by tests/test_selection.py
    med = exact_group_quantile(ds, "event_type", "value", q=0.5, cap=65536)
    rows = sorted(med.items())
    return pa.table(
        {
            "event_type": pa.array([g for g, _ in rows], type=pa.string()),
            "median_value": pa.array([v for _, v in rows], type=pa.float64()),
        }
    )


_SQL_EXACT_MEDIAN = """
SELECT event_type, quantile_disc(value, 0.5) AS median_value
FROM events GROUP BY event_type
"""


def lineitem_price_p25_cont(sf_dir: str) -> pa.Table:
    """EXACT percentile_cont (interpolated percentile) per group with
    streaming passes only: two exact order statistics per group —
    rank floor((n-1)p) and ceil((n-1)p) via the sketch-guided rank
    selector (stages/selection.py rank_fn) — then
    ``vl + (h - floor(h)) * (vh - vl)``.  p = 0.25 is exactly
    representable in binary and the inputs ride the cents grid, so
    every interpolation double is IEEE-identical to the SQL mirror,
    which computes the SAME expression from row_number order
    statistics (not DuckDB's quantile_cont, whose internal expression
    is not pinned)."""
    from ..stages.selection import exact_group_percentile_cont

    ds = _rpc(f"{sf_dir}/lineitem.parquet",
              columns=["l_returnflag", "l_extendedprice"])

    def quant(t: pa.Table) -> pa.Table:
        v = _qround(t["l_extendedprice"].to_numpy(zero_copy_only=False), 2)
        return pa.table({"l_returnflag": t["l_returnflag"],
                         "price_q": pa.array(v, type=pa.float64())})

    dsq = ds.map_batches(quant, batch_format="pyarrow")
    p25 = exact_group_percentile_cont(dsq, "l_returnflag", "price_q",
                                      p=0.25, cap=65536)
    rows = sorted(p25.items())
    return pa.table(
        {
            "l_returnflag": pa.array([g for g, _ in rows], type=pa.string()),
            "price_p25": pa.array([v for _, v in rows], type=pa.float64()),
        }
    )


_SQL_P25_CONT = """
WITH v AS (
  SELECT l_returnflag, floor(l_extendedprice * 100 + 0.5) / 100 AS x
  FROM lineitem
), r AS (
  SELECT l_returnflag, x,
         row_number() OVER (PARTITION BY l_returnflag ORDER BY x) - 1 AS rk,
         count(*) OVER (PARTITION BY l_returnflag) AS n
  FROM v
), h AS (
  SELECT l_returnflag,
         (CAST(n AS DOUBLE) - 1) * 0.25 AS hh,
         CAST(floor((CAST(n AS DOUBLE) - 1) * 0.25) AS BIGINT) AS rl,
         CAST(ceil((CAST(n AS DOUBLE) - 1) * 0.25) AS BIGINT) AS rh
  FROM (SELECT DISTINCT l_returnflag, n FROM r)
), sel AS (
  SELECT r.l_returnflag,
         max(CASE WHEN r.rk = h.rl THEN r.x END) AS vl,
         max(CASE WHEN r.rk = h.rh THEN r.x END) AS vh,
         any_value(h.hh) AS hh, any_value(h.rl) AS rl
  FROM r JOIN h USING (l_returnflag)
  GROUP BY r.l_returnflag
)
SELECT l_returnflag, vl + (hh - CAST(rl AS DOUBLE)) * (vh - vl) AS price_p25
FROM sel
"""


def event_value_outliers(sf_dir: str) -> "rd.Dataset":
    """Robust per-group outlier gate (Hampel / 3×MAD rule — the
    median-based quality filter a training pipeline uses where mean/σ
    would be dragged by the outliers themselves): per event_type, the
    EXACT median, then the EXACT median absolute deviation, then the
    rows with |v − med| > 3·MAD.  Composes the sketch-guided exact
    grouped quantile (stages/selection.py) twice — the second pass runs
    over a DERIVED column that never materializes, and the flag pass is
    a streaming filter with the bounded (type → med, mad) table in the
    task closure.  Exactness: v is grid-quantized identically on both
    engines, quantile_disc returns an exact data element, so med / dev /
    MAD / the 3·MAD comparison are all identical IEEE doubles — no
    rounding anywhere downstream."""
    from ..stages.selection import exact_group_quantile

    ds = _events(sf_dir, ["event_id", "event_type", "value"])

    def quant(t: pa.Table) -> pa.Table:
        v = _qround(t["value"].to_numpy(zero_copy_only=False), 2)
        return pa.table(
            {"event_id": t["event_id"], "event_type": t["event_type"],
             "value_q": pa.array(v, type=pa.float64())}
        )

    dsq = ds.map_batches(quant, batch_format="pyarrow")
    med = exact_group_quantile(dsq, "event_type", "value_q", q=0.5,
                               cap=65536)
    types = sorted(med)
    keys = pa.array(types, type=pa.string())
    med_arr = np.array([med[k] for k in types], dtype=np.float64)

    def add_dev(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=keys) \
            .to_numpy(zero_copy_only=False)
        dev = np.abs(
            t["value_q"].to_numpy(zero_copy_only=False) - med_arr[idx]
        )
        return t.append_column("deviation",
                               pa.array(dev, type=pa.float64()))

    dsd = dsq.map_batches(add_dev, batch_format="pyarrow")
    mad = exact_group_quantile(dsd, "event_type", "deviation", q=0.5,
                               cap=65536)
    mad_arr = np.array([mad[k] for k in types], dtype=np.float64)

    def flag(t: pa.Table) -> pa.Table:
        idx = pc.index_in(t["event_type"], value_set=keys) \
            .to_numpy(zero_copy_only=False)
        keep = t["deviation"].to_numpy(zero_copy_only=False) \
            > 3.0 * mad_arr[idx]
        return t.filter(pa.array(keep))

    return dsd.map_batches(flag, batch_format="pyarrow")


_SQL_VALUE_OUTLIERS = """
WITH q AS (
  SELECT event_id, event_type, floor(value * 100 + 0.5) / 100 AS value_q
  FROM events
), m AS (
  SELECT event_type, quantile_disc(value_q, 0.5) AS med FROM q GROUP BY 1
), d AS (
  SELECT q.event_id, q.event_type, q.value_q,
         abs(q.value_q - m.med) AS deviation
  FROM q JOIN m USING (event_type)
), s AS (
  SELECT event_type, quantile_disc(deviation, 0.5) AS mad FROM d GROUP BY 1
)
SELECT d.event_id, d.event_type, d.value_q, d.deviation
FROM d JOIN s USING (event_type)
WHERE d.deviation > 3 * s.mad
"""


def event_type_value_stats(sf_dir: str) -> "rd.Dataset":
    """Grouped statistical moments (population variance / stddev) from
    mergeable (n, sum, sumsq) partials — the moments family the flat
    sum/avg aggregates don't cover.  Grid discipline (CLAUDE.md rule 4):
    inputs quantize to the 0.01 grid so both engines' sums are EXACT
    grid integers regardless of summation order, and the variance
    expression is mirrored literally so the final doubles are identical
    IEEE values."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        v = _qround(df["value"], 2)
        return (
            pd.DataFrame({"event_type": df["event_type"], "_v": v, "_vv": v * v})
            .groupby("event_type", sort=False)
            .agg(_n=("_v", "size"), _s=("_v", "sum"), _ss=("_vv", "sum"))
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("event_type", sort=False)
            .agg(_n=("_n", "sum"), _s=("_s", "sum"), _ss=("_ss", "sum"))
            .reset_index()
        )
        n = g["_n"].astype("float64")
        s, ss = g["_s"], g["_ss"]
        var = (ss - s * s / n) / n
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_events": g["_n"].astype("int64"),
                "mean_value": _qround(s / n, 6),
                "var_pop": _qround(var, 6),
                "std_pop": _qround(np.sqrt(var), 6),
            }
        )

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


_SQL_VALUE_STATS = """
WITH q AS (
  SELECT event_type, floor((value) * 100 + 0.5) / 100 AS v FROM events
), a AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(v) AS s, sum(v * v) AS ss
  FROM q GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       floor((s / n) * 1000000 + 0.5) / 1000000 AS mean_value,
       floor(((ss - s * s / n) / n) * 1000000 + 0.5) / 1000000 AS var_pop,
       floor(sqrt((ss - s * s / n) / n) * 1000000 + 0.5) / 1000000 AS std_pop
FROM a
"""


def user_distinct_event_types(sf_dir: str) -> "rd.Dataset":
    """Exact grouped COUNT(DISTINCT) over an UNBOUNDED key space: the
    per-batch combiner collapses to distinct (user, type) pairs (at most
    #types rows per user per block), the coarse key-hash final dedups
    across blocks and counts — no global distinct shuffle, no single
    final task (A4/D4 family; complements the global-distinct
    lineitem_distinct_suppliers)."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def distinct_pairs(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.drop_duplicates()
            .groupby("user_id", sort=False)["event_type"]
            .nunique()
            .reset_index(name="n_types")
        )
        return g.assign(n_types=g["n_types"].astype("int64"))

    ds = ds.map_batches(distinct_pairs, batch_format="pandas")
    return _coarse_final(ds, "user_id", final)


_SQL_DISTINCT_TYPES = """
SELECT user_id, count(DISTINCT event_type) AS n_types
FROM events GROUP BY user_id
"""


def orders_rollup(sf_dir: str) -> "rd.Dataset":
    """ROLLUP / hierarchical totals (GROUPING SETS family, missing from
    the flat-groupby catalog): per-batch partials at the finest grain,
    then ONE bounded-key final that re-aggregates the fine cells into
    the (priority, status) / (priority) / () levels — super-aggregates
    derive from partials, so the input is read once and nothing beyond
    #fine_cells x #blocks rows ever shuffles."""
    ds = _rpc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_t=_qround(df["o_totalprice"], 2))
        return (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
            .agg(_n=("_t", "size"), _s=("_t", "sum"))
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        fine = (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
            .agg(_n=("_n", "sum"), _s=("_s", "sum"))
            .reset_index()
        )
        mid = (
            fine.groupby("o_orderpriority", sort=False)
            .agg(_n=("_n", "sum"), _s=("_s", "sum"))
            .reset_index()
        )
        mid["o_orderstatus"] = None
        top = pd.DataFrame(
            {
                "o_orderpriority": [None],
                "o_orderstatus": [None],
                "_n": [fine["_n"].sum()],
                "_s": [fine["_s"].sum()],
            }
        )
        out = pd.concat(
            [fine, mid[fine.columns], top[fine.columns]], ignore_index=True
        )
        return pd.DataFrame(
            {
                "o_orderpriority": out["o_orderpriority"],
                "o_orderstatus": out["o_orderstatus"],
                "n_orders": out["_n"].astype("int64"),
                "sum_total": _qround(out["_s"], 2),
            }
        )

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


_SQL_ORDERS_ROLLUP = f"""
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       {_sql_q("sum(floor((o_totalprice) * 100 + 0.5) / 100)", 2)} AS sum_total
FROM orders GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
"""


def orders_cube(sf_dir: str) -> "rd.Dataset":
    """Full CUBE over (priority, status) — ROLLUP's sibling grouping-sets
    shape: all FOUR aggregation levels derive from ONE pass of fine-grain
    partials (the (status)-only level that ROLLUP lacks is just another
    re-aggregation of the bounded fine-cell table; the input never
    re-reads and nothing beyond #fine_cells x #blocks rows shuffles)."""
    ds = _rpc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderpriority", "o_orderstatus", "o_totalprice"],
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_t=_qround(df["o_totalprice"], 2))
        return (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
            .agg(_n=("_t", "size"), _s=("_t", "sum"))
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        fine = (
            df.groupby(["o_orderpriority", "o_orderstatus"], sort=False)
            .agg(_n=("_n", "sum"), _s=("_s", "sum"))
            .reset_index()
        )
        by_prio = (
            fine.groupby("o_orderpriority", sort=False)
            .agg(_n=("_n", "sum"), _s=("_s", "sum")).reset_index()
        )
        by_prio["o_orderstatus"] = None
        by_status = (
            fine.groupby("o_orderstatus", sort=False)
            .agg(_n=("_n", "sum"), _s=("_s", "sum")).reset_index()
        )
        by_status["o_orderpriority"] = None
        top = pd.DataFrame(
            {
                "o_orderpriority": [None],
                "o_orderstatus": [None],
                "_n": [fine["_n"].sum()],
                "_s": [fine["_s"].sum()],
            }
        )
        out = pd.concat(
            [fine, by_prio[fine.columns], by_status[fine.columns],
             top[fine.columns]],
            ignore_index=True,
        )
        return pd.DataFrame(
            {
                "o_orderpriority": out["o_orderpriority"],
                "o_orderstatus": out["o_orderstatus"],
                "n_orders": out["_n"].astype("int64"),
                "sum_total": _qround(out["_s"], 2),
            }
        )

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


_SQL_ORDERS_CUBE = f"""
SELECT o_orderpriority, o_orderstatus, count(*) AS n_orders,
       {_sql_q("sum(floor((o_totalprice) * 100 + 0.5) / 100)", 2)} AS sum_total
FROM orders GROUP BY CUBE(o_orderpriority, o_orderstatus)
"""


def events_props_extract(sf_dir: str) -> "rd.Dataset":
    """Schema-on-read JSON payload extraction (the semi-structured
    source-decode family member — events carry a JSON ``props`` string
    the relational catalog otherwise never touches): pull the integer
    ``k`` field out of every payload and aggregate it per event type.

    Scale shape: extraction is ONE vectorized RE2 kernel per batch
    (``pc.extract_regex``) — schema-on-read for a known scalar field
    needs no parser object per row; per-batch partials then a bounded
    final.  The oracle extracts with DuckDB's real JSON parser
    (``json_extract``), so the regex path is checked against a strict
    parse, not against itself."""
    ds = _events(sf_dir, ["event_type", "props"])

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ext = pc.extract_regex(t["props"], r'"k"\s*:\s*(?P<k>-?\d+)')
        k = pc.cast(pc.struct_field(ext, "k"), pa.int64())
        g = (
            pd.DataFrame({
                "event_type": t["event_type"].to_pandas(),
                "k": k.to_pandas(),
            })
            .groupby("event_type", sort=False)["k"]
            .agg(_n="size", _s="sum").reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("event_type", sort=False).agg(
            n=("_n", "sum"), sum_k=("_s", "sum")
        ).reset_index()
        return pd.DataFrame({
            "event_type": g["event_type"],
            "n": g["n"].astype("int64"),
            "sum_k": g["sum_k"].astype("int64"),
            "avg_k": _qround(
                g["sum_k"].astype("float64") / g["n"].astype("float64"), 6
            ),
        })

    return _final_agg(ds.map_batches(partial, batch_format="pyarrow"), final)


_SQL_PROPS_EXTRACT = """
WITH e AS (
  SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k,
       floor((CAST(sum(k) AS DOUBLE) / CAST(count(*) AS DOUBLE)) * 1000000
             + 0.5) / 1000000 AS avg_k
FROM e GROUP BY event_type
"""


def doc_lang_temperature_weights(sf_dir: str) -> "rd.Dataset":
    """Temperature-based multilingual resampling weights (the mC4/XLM
    alpha-smoothing recipe): p_l ∝ (n_l/N)^α with α=0.5, normalized —
    low-resource languages up-weighted relative to their share.  α=0.5
    makes the power a SQRT, which IEEE 754 rounds correctly in both
    engines (a general pow() is not pinned cross-libm), and each term
    rides the 1e-9 grid before the 5-term normalization (bounded key
    space: one tiny partial per batch, one driver-side final)."""
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["lang"])
    n_total = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("lang", sort=False).size()
                .rename("_n").reset_index())

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False)["_n"].sum().rename("n_docs") \
            .reset_index().sort_values("lang", kind="mergesort")
        term = np.floor(
            np.sqrt(g["n_docs"].to_numpy(np.float64) / float(n_total))
            * 1e9 + 0.5
        ) / 1e9
        # 5 grid-quantized terms; the 1e-6 output grid has 1000x headroom
        # over any summation-order ulp (the corr/variance precedent)
        denom = float(term.sum())
        return pd.DataFrame({
            "lang": g["lang"],
            "n_docs": g["n_docs"].astype("int64"),
            "weight": np.floor(term / denom * 1e6 + 0.5) / 1e6,
        })

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), final)


_SQL_LANG_TEMPERATURE = """
WITH c AS (
  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY lang
), t AS (
  SELECT lang, n_docs,
         floor(sqrt(CAST(n_docs AS DOUBLE)
                    / (SELECT CAST(count(*) AS DOUBLE) FROM documents))
               * 1000000000 + 0.5) / 1000000000 AS term
  FROM c
), d AS (
  SELECT sum(term) AS denom FROM t
)
SELECT lang, n_docs,
       floor(term / (SELECT denom FROM d) * 1000000 + 0.5) / 1000000 AS weight
FROM t
"""


# ===========================================================================
# TPC-H-style relational operators


def q1_pricing_summary(sf_dir: str) -> "rd.Dataset":
    """Grouped aggregate with per-batch partials (the canonical wide step)."""
    ds = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                 "l_discount", "l_tax", "l_shipdate"],
    )
    cutoff = pd.Timestamp("1998-09-02")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        # per-row quantization to a fixed decimal grid: sums of grid values
        # stay on the grid (fp error << grid step), so the final round() is
        # engine-independent — the cross-engine float-equality discipline
        df = df[df["l_shipdate"] <= cutoff]
        disc_price = _qround(df["l_extendedprice"] * (1 - df["l_discount"]), 2)
        charge = _qround(disc_price * (1 + df["l_tax"]), 2)
        df = df.assign(
            _disc_price=disc_price,
            _charge=charge,
            _qty=_qround(df["l_quantity"], 2),
            _base=_qround(df["l_extendedprice"], 2),
            _disc=_qround(df["l_discount"], 6),
        )
        g = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            _sum_qty=("_qty", "sum"),
            _sum_base=("_base", "sum"),
            _sum_disc=("_disc_price", "sum"),
            _sum_charge=("_charge", "sum"),
            _sum_discount=("_disc", "sum"),
            _n=("_qty", "size"),
        )
        return g.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.groupby(["l_returnflag", "l_linestatus"], sort=False).agg(
            _sq=("_sum_qty", "sum"), _sb=("_sum_base", "sum"),
            _sd=("_sum_disc", "sum"), _sc=("_sum_charge", "sum"),
            _sdisc=("_sum_discount", "sum"), count_order=("_n", "sum"),
        ).reset_index()
        n = df["count_order"].astype("float64")
        sq, sb = _qround(df["_sq"], 2), _qround(df["_sb"], 2)
        sdisc = _qround(df["_sdisc"], 6)
        return pd.DataFrame(
            {
                "l_returnflag": df["l_returnflag"],
                "l_linestatus": df["l_linestatus"],
                "sum_qty": sq,
                "sum_base_price": sb,
                "sum_disc_price": _qround(df["_sd"], 2),
                "sum_charge": _qround(df["_sc"], 2),
                "avg_qty": _qround(sq / n, 4),
                "avg_price": _qround(sb / n, 4),
                "avg_disc": _qround(sdisc / n, 4),
                "count_order": df["count_order"].astype("int64"),
            }
        )

    return _final_agg(partials, finalize)


_SQL_Q1 = """
SELECT l_returnflag, l_linestatus,
       floor((sum(floor((l_quantity) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_qty,
       floor((sum(floor((l_extendedprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_base_price,
       floor((sum(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_disc_price,
       floor((sum(floor(((floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100) * (1 + l_tax)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS sum_charge,
       floor(((floor((sum(floor((l_quantity) * 100 + 0.5) / 100)) * 100 + 0.5) / 100) / count(*)) * 10000 + 0.5) / 10000 AS avg_qty,
       floor(((floor((sum(floor((l_extendedprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100) / count(*)) * 10000 + 0.5) / 10000 AS avg_price,
       floor(((floor((sum(floor((l_discount) * 1000000 + 0.5) / 1000000)) * 1000000 + 0.5) / 1000000) / count(*)) * 10000 + 0.5) / 10000 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
"""


def q3_top_orders(sf_dir: str) -> "rd.Dataset":
    """Fully distributed top-k join: BUILDING customers semi-restrict
    orders via a task-based co-group hash join, filtered lineitem joins
    the result via a second one (no fact table ever touches the driver),
    then per-orderkey revenue finals in coarse hash partitions with a
    local top-10 each, and a bounded global top-10 over <= parts x 10
    rows."""
    cust = _rpc(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: _nometa(t.filter(pc.equal(t["c_mktsegment"], "BUILDING")).select(["c_custkey"])),
        batch_format="pyarrow",
    )
    orders = _rpc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(
        lambda t: _nometa(t.filter(
            pc.less(t["o_orderdate"], pa.scalar(pd.Timestamp("1998-01-01")))
        )),
        batch_format="pyarrow",
    )
    orders_b = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="semi",
        left_schema=_pq_cols_schema(
            sf_dir, "orders",
            ["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"]),
        right_schema=_pq_cols_schema(sf_dir, "customer", ["c_custkey"]),
    )
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda t: _nometa(t.filter(
            pc.greater(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-01-01")))
        ).select(["l_orderkey", "l_extendedprice", "l_discount"])),
        batch_format="pyarrow",
    )
    joined = hash_join(
        li, orders_b, on="l_orderkey", right_on="o_orderkey",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = _qround(df["l_extendedprice"] * (1 - df["l_discount"]), 2)
        return (
            df.assign(_rev=rev)
            .groupby(["l_orderkey", "o_orderdate", "o_orderpriority"], sort=False)["_rev"]
            .sum()
            .reset_index()
        )

    partials = joined.map_batches(partial, batch_format="pandas")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        # every partial row of one orderkey is in this partition, so the
        # per-key revenue is final here; keep only this bucket's top 10
        g = df.groupby(["l_orderkey", "o_orderdate", "o_orderpriority"], sort=False)[
            "_rev"
        ].sum().reset_index()
        g = g.assign(revenue=_qround(g["_rev"], 2)).drop(columns=["_rev"])
        return g.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(10)

    candidates = _coarse_final(partials, "l_orderkey", local_topk)

    def global_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.sort_values(
            ["revenue", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(10)
        return g[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]

    return _final_agg(candidates, global_topk)


_SQL_Q3 = """
SELECT l_orderkey,
       floor((sum(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS revenue,
       o_orderdate, o_orderpriority
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-01-01'
  AND l_shipdate > TIMESTAMP '1998-01-01'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


def q5_local_supplier(sf_dir: str) -> "rd.Dataset":
    """Five-way join: ALL three fact/dimension-scale sides
    (orders⨝customer, lineitem⨝that, then ⨝supplier) go through
    task-based co-group hash joins — supplier grows with scale, so it
    streams through the join exchange like the facts (VERDICT r2 #3:
    the previous broadcast map was ~1.6 GB at 100x).  Only the
    genuinely bounded side is broadcast: region/nation (25 rows at any
    scale).  The final groupby key (n_name) is bounded, so the
    coalesced final is safe."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    asia_rk = region.filter(pc.equal(region["r_name"], "ASIA"))["r_regionkey"][0].as_py()
    nat = nation.filter(pc.equal(nation["n_regionkey"], asia_rk))
    asia_keys = pa.array(nat["n_nationkey"].to_pylist(), type=pa.int64())
    asia_pd = pd.DataFrame(
        {"nat": nat["n_nationkey"].to_pylist(), "n_name": nat["n_name"].to_pylist()}
    )
    maps_ref = ray.put(asia_pd)

    cust = _rpc(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: _nometa(t.filter(pc.is_in(t["c_nationkey"], value_set=asia_keys))),
        batch_format="pyarrow",
    )
    orders = _rpc(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: _nometa(t.filter(
            pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(pd.Timestamp("1996-01-01"))),
                pc.less(t["o_orderdate"], pa.scalar(pd.Timestamp("1997-01-01"))),
            )
        ).select(["o_orderkey", "o_custkey"])),
        batch_format="pyarrow",
    )
    orders_c = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey",
        left_schema=_pq_cols_schema(sf_dir, "orders", ["o_orderkey", "o_custkey"]),
        right_schema=_pq_cols_schema(sf_dir, "customer",
                                     ["c_custkey", "c_nationkey"]),
    )
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    ).map_batches(_nometa, batch_format="pyarrow")
    joined = hash_join(
        li, orders_c, on="l_orderkey", right_on="o_orderkey",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem",
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"]),
    )
    supp = _rpc(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: _nometa(t.filter(pc.is_in(t["s_nationkey"], value_set=asia_keys))),
        batch_format="pyarrow",
    )
    with_supp = hash_join(
        joined, supp, on="l_suppkey", right_on="s_suppkey",
        right_schema=_pq_cols_schema(sf_dir, "supplier",
                                     ["s_suppkey", "s_nationkey"]),
    )

    def partial(df: pd.DataFrame, maps_ref=maps_ref) -> pd.DataFrame:
        asia = ray.get(maps_ref)
        df = df[df["s_nationkey"] == df["c_nationkey"]]
        df = df.merge(asia, left_on="s_nationkey", right_on="nat")
        if df.empty:
            return pd.DataFrame({"n_name": pd.Series(dtype="object"),
                                 "_rev": pd.Series(dtype="float64")})
        rev = _qround(df["l_extendedprice"] * (1 - df["l_discount"]), 2)
        return df.assign(_rev=rev).groupby("n_name", sort=False)["_rev"].sum().reset_index()

    partials = with_supp.map_batches(partial, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_name", sort=False)["_rev"].sum().reset_index()
        return g.assign(revenue=_qround(g["_rev"], 2)).drop(columns=["_rev"])

    return _final_agg(partials, finalize)


_SQL_Q5 = """
SELECT n_name, floor((sum(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS revenue
FROM region
JOIN nation ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders ON o_custkey = c_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON s_suppkey = l_suppkey AND s_nationkey = c_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY n_name
"""


def top_customers_by_spend(sf_dir: str) -> "rd.Dataset":
    orders = _rpc(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df.assign(_tp=_qround(df["o_totalprice"], 2))
        g = df.groupby("o_custkey", sort=False).agg(
            _sum=("_tp", "sum"), _n=("_tp", "size")
        )
        return g.reset_index()

    partials = orders.map_batches(partial, batch_format="pandas")

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        # per-custkey spend is final within this coarse partition
        g = df.groupby("o_custkey", sort=False).agg(
            _spend=("_sum", "sum"), n_orders=("_n", "sum")
        ).reset_index()
        g = g.assign(total_spend=_qround(g["_spend"], 2),
                     n_orders=g["n_orders"].astype("int64")).drop(columns=["_spend"])
        return g.sort_values(
            ["total_spend", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(10)

    candidates = _coarse_final(partials, "o_custkey", local_topk)
    top10 = _final_agg(
        candidates,
        lambda df: df.sort_values(
            ["total_spend", "o_custkey"], ascending=[False, True], kind="mergesort"
        ).head(10),
    )
    # names only for the 10 winners: tiny-side co-group join against the
    # distributed customer read (no driver materialization of customer)
    cust = _rpc(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"]
    )
    joined = hash_join(
        top10, cust, on="o_custkey", right_on="c_custkey", num_partitions=8,
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("n_orders", pa.int64()),
                               ("total_spend", pa.float64())]),
        right_schema=_pq_cols_schema(sf_dir, "customer", ["c_custkey", "c_name"]),
    )
    return _final_agg(
        joined,
        lambda df: df.assign(c_custkey=df["o_custkey"])[
            ["c_custkey", "c_name", "total_spend", "n_orders"]
        ].sort_values(
            ["total_spend", "c_custkey"], ascending=[False, True], kind="mergesort"
        ),
    )


_SQL_TOP_CUSTOMERS = """
SELECT c_custkey, c_name, floor((sum(floor((o_totalprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS total_spend, count(*) AS n_orders
FROM customer JOIN orders ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spend DESC, c_custkey
LIMIT 10
"""


def order_priority_counts(sf_dir: str) -> "rd.Dataset":
    ds = _rpc(f"{sf_dir}/orders.parquet", columns=["o_orderpriority"])
    partials = ds.map_batches(
        lambda df: df.groupby("o_orderpriority", sort=False).size().rename("_n").reset_index(),
        batch_format="pandas",
    )
    return _final_agg(
        partials,
        lambda df: df.groupby("o_orderpriority", sort=False)["_n"].sum().rename("n")
        .reset_index().astype({"n": "int64"}),
    )


_SQL_PRIORITY = """
SELECT o_orderpriority, count(*) AS n FROM orders GROUP BY o_orderpriority
"""


def q4_late_orders(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q4 shape — correlated EXISTS with a CROSS-TABLE predicate:
    orders having at least one lineitem shipped more than 60 days after
    the order date, counted per priority.  A plain semi join can't
    carry the l_shipdate > o_orderdate + 60 comparison, so the shape
    is: one task-based inner hash join ships only the 2+3 key/predicate
    columns, the date predicate filters vectorized, matching orderkeys
    dedupe inside coarse orderkey-hash partitions (EXISTS semantics:
    one vote per order however many late lines), and a bounded final
    counts the 5 priorities."""
    from ..stages.join import hash_join

    li = _rpc(f"{sf_dir}/lineitem.parquet",
              columns=["l_orderkey", "l_shipdate"])
    ords = _rpc(f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_orderdate", "o_orderpriority"])
    j = hash_join(
        li, ords, on="l_orderkey", right_on="o_orderkey",
        left_schema=_pq_cols_schema(sf_dir, "lineitem",
                                    ["l_orderkey", "l_shipdate"]),
        right_schema=_pq_cols_schema(
            sf_dir, "orders", ["o_orderkey", "o_orderdate", "o_orderpriority"]
        ),
    )

    def late_partial(df: pd.DataFrame) -> pd.DataFrame:
        ship = df["l_shipdate"].values.astype("datetime64[D]")
        odate = df["o_orderdate"].values.astype("datetime64[D]")
        late = df[ship > odate + np.timedelta64(60, "D")]
        return late[["l_orderkey", "o_orderpriority"]].drop_duplicates()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop_duplicates()

    hits = _coarse_final(
        j.map_batches(late_partial, batch_format="pandas"),
        "l_orderkey", final,
    )
    return _final_agg(
        hits.map_batches(
            lambda d: d.groupby("o_orderpriority", sort=False).size()
            .rename("_n").reset_index(),
            batch_format="pandas",
        ),
        lambda d: d.groupby("o_orderpriority", sort=False)["_n"].sum()
        .rename("order_count").reset_index().astype({"order_count": "int64"}),
    )


_SQL_Q4_LATE = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE EXISTS (
  SELECT 1 FROM lineitem l
  WHERE l.l_orderkey = o.o_orderkey
    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
)
GROUP BY o_orderpriority
"""


def q14_promo_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q14 shape — conditional-aggregate ratio over a fact⨝dim
    join: the share of one month's revenue that came from PROMO parts.
    part grows with scale, so it streams through the task-based hash
    join like lineitem (never a driver collect); the month filter
    prunes lineitem BEFORE the exchange.  Float discipline is the
    strictest tier (integer-cents): per-row revenue quantizes to the
    cent grid and accumulates as EXACT int64 cents, so the two final
    sums are bit-identical across engines and the single division
    100*promo/total is one IEEE op on identical operands (int64 cents
    caps at ~9e16 dollars — far past 100 TB of lineitem; the mirror
    casts identically).  Reference analog: conditional per-claim
    revenue splits (lib/etl/claims.py money-line handling)."""
    lo, hi = pd.Timestamp("1997-09-01"), pd.Timestamp("1997-10-01")
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda t: _nometa(
            t.filter(
                pc.and_(
                    pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)),
                )
            ).select(["l_partkey", "l_extendedprice", "l_discount"])
        ),
        batch_format="pyarrow",
    )
    part = _rpc(f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"])
    j = hash_join(
        li, part, on="l_partkey", right_on="p_partkey",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"]),
        right_schema=_pq_cols_schema(sf_dir, "part", ["p_partkey", "p_type"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["l_extendedprice"].to_numpy() * (1 - df["l_discount"].to_numpy())
            * 100 + 0.5
        ).astype(np.int64)
        promo = (df["p_type"].to_numpy() == "PROMO")
        return pd.DataFrame(
            {"_promo": [int(cents[promo].sum())], "_total": [int(cents.sum())]}
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        promo, total = float(df["_promo"].sum()), float(df["_total"].sum())
        return pd.DataFrame({"promo_revenue_pct": [_qround(
            np.float64(100.0) * promo / total, 6)]})

    return _final_agg(j.map_batches(partial, batch_format="pandas"), finalize)


_SQL_Q14_PROMO = """
WITH j AS (
  SELECT CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) AS BIGINT) AS cents,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-09-01' AND l_shipdate < TIMESTAMP '1997-10-01'
)
SELECT floor((100.0 * CAST(sum(CASE WHEN p_type = 'PROMO' THEN cents ELSE 0 END) AS DOUBLE)
              / CAST(sum(cents) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS promo_revenue_pct
FROM j
"""


def q16_supplier_cnt(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q16 shape — anti-join + grouped count(DISTINCT): how many
    distinct suppliers ship each (brand, type, size) part family,
    excluding blacklisted suppliers (negative balance stands in for the
    reference's comment-pattern complaint filter; no partsupp table in
    this corpus, so lineitem supplies the part⨝supplier incidence).
    Topology: the blacklist is a FILTERED SUPPLIER TABLE — it grows
    with scale, so it anti-joins through the task-based exchange
    rather than broadcasting; part prunes on its predicate before its
    join; the 4-tuple distinct dedupes inside coarse suppkey-hash
    partitions (all rows of one suppkey share a partition, so local
    drop_duplicates is globally exact); the final count per family is
    a bounded-key coalesced reduce (#brands x #types x #sizes)."""
    sizes = [1, 5, 9, 13, 17, 21, 25, 29, 33, 37, 41, 45, 49]
    bad = _rpc(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_acctbal"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.less(t["s_acctbal"], 0.0)).select(["s_suppkey"])),
        batch_format="pyarrow",
    )
    li = _rpc(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    li_ok = hash_join(
        li, bad, on="l_suppkey", right_on="s_suppkey", how="anti",
        left_schema=_pq_cols_schema(sf_dir, "lineitem",
                                    ["l_partkey", "l_suppkey"]),
        right_schema=_pq_cols_schema(sf_dir, "supplier", ["s_suppkey"]),
    )
    part = _rpc(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).map_batches(
        lambda t: _nometa(
            t.filter(
                pc.and_(
                    pc.and_(
                        pc.not_equal(t["p_brand"], "Brand#1"),
                        pc.not_equal(t["p_type"], "PROMO"),
                    ),
                    pc.is_in(t["p_size"], value_set=pa.array(sizes)),
                )
            )
        ),
        batch_format="pyarrow",
    )
    j = hash_join(
        li_ok, part, on="l_partkey", right_on="p_partkey",
        right_schema=_pq_cols_schema(
            sf_dir, "part", ["p_partkey", "p_brand", "p_type", "p_size"]),
    )

    def distinct_partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[["p_brand", "p_type", "p_size", "l_suppkey"]].drop_duplicates()

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates()
        return (
            d.groupby(["p_brand", "p_type", "p_size"], sort=False)
            .size().rename("_n").reset_index()
        )

    partials = _coarse_final(
        j.map_batches(distinct_partial, batch_format="pandas"),
        "l_suppkey", per_bucket,
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["p_brand", "p_type", "p_size"], sort=False)["_n"]
            .sum().rename("supplier_cnt").reset_index()
        )
        return g.astype({"supplier_cnt": "int64", "p_size": "int64"})

    return _final_agg(partials, finalize)


_SQL_Q16_SUPPLIER_CNT = """
SELECT p_brand, p_type, CAST(p_size AS BIGINT) AS p_size,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1,5,9,13,17,21,25,29,33,37,41,45,49)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


def q18_large_orders(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q18 shape — grouped HAVING as a semi-join driver: orders
    whose total lineitem quantity exceeds 250, reported with customer
    identity, top 100 by o_totalprice.  The quantity sum per orderkey
    finalizes inside coarse orderkey-hash partitions (exact int64
    centi-units, so the HAVING comparison has no float dust on either
    engine); only the SURVIVORS (a tiny HAVING-selected set) flow into
    the orders join, and customer joins after — both task-based
    exchanges, no driver collect of any scale-growing side.  Top-100
    is local-per-bucket then one bounded global pass (q3 pattern)."""
    li = _rpc(f"{sf_dir}/lineitem.parquet",
              columns=["l_orderkey", "l_quantity"])

    def qty_partial(df: pd.DataFrame) -> pd.DataFrame:
        centi = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
        return (
            pd.DataFrame({"l_orderkey": df["l_orderkey"], "_c": centi})
            .groupby("l_orderkey", sort=False)["_c"].sum().reset_index()
        )

    def qty_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_orderkey", sort=False)["_c"].sum().reset_index()
        return g[g["_c"] > 250 * 100]

    big = _coarse_final(
        li.map_batches(qty_partial, batch_format="pandas"),
        "l_orderkey", qty_final,
    )
    ords = _rpc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"],
    )
    jo = hash_join(
        big, ords, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("_c", pa.int64())]),
    )
    cust = _rpc(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    jc = hash_join(
        jo, cust, on="o_custkey", right_on="c_custkey",
        right_schema=_pq_cols_schema(sf_dir, "customer",
                                     ["c_custkey", "c_name"]),
    )

    def local_topk(df: pd.DataFrame) -> pd.DataFrame:
        d = df.assign(
            sum_qty=df["_c"].to_numpy().astype(np.float64) / 100.0,
            o_totalprice=_qround(df["o_totalprice"], 2),
        )[["c_name", "o_custkey", "l_orderkey", "o_orderdate",
           "o_totalprice", "sum_qty"]]
        return d.sort_values(
            ["o_totalprice", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(100)

    candidates = _coarse_final(jc, "l_orderkey", local_topk)

    def global_topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["o_totalprice", "o_orderdate", "l_orderkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(100)

    return _final_agg(candidates, global_topk)


_SQL_Q18_LARGE = """
WITH s AS (
  SELECT l_orderkey, sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS c
  FROM lineitem GROUP BY l_orderkey HAVING sum(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) > 25000
)
SELECT c_name, o_custkey, l_orderkey, o_orderdate,
       floor((o_totalprice) * 100 + 0.5) / 100 AS o_totalprice,
       CAST(c AS DOUBLE) / 100.0 AS sum_qty
FROM s JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY floor((o_totalprice) * 100 + 0.5) / 100 DESC, o_orderdate, l_orderkey
LIMIT 100
"""


def q17_small_qty_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q17 shape — correlated per-key aggregate joined back to the
    same fact: average yearly revenue lost if small-quantity lines of
    Brand#3 STANDARD parts were not shipped (qty below 20% of that
    part's average).  The correlated avg and the per-row comparison both
    happen INSIDE one coarse partkey-hash partition — every lineitem of
    a part shares a bucket, so a local groupby-transform is globally
    exact and the fact shuffles ONCE.  The threshold comparison is pure
    int64 arithmetic (qty < avg/5  <=>  5*qty_centi*cnt < sum_centi), so
    there is no float dust in row selection on either engine; the single
    final division happens on identical int64 operands.  Reference
    analog: per-person claim screens against that person's own history
    (lib/etl/claims.py)."""
    part = _rpc(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_type"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(
                pc.and_(
                    pc.equal(t["p_brand"], "Brand#3"),
                    pc.equal(t["p_type"], "STANDARD"),
                )
            ).select(["p_partkey"])
        ),
        batch_format="pyarrow",
    )
    li = _rpc(f"{sf_dir}/lineitem.parquet",
              columns=["l_partkey", "l_quantity", "l_extendedprice"])
    j = hash_join(
        li, part, on="l_partkey", right_on="p_partkey", how="semi",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem", ["l_partkey", "l_quantity", "l_extendedprice"]),
        right_schema=pa.schema([("p_partkey", pa.int64())]),
    )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        qc = np.floor(df["l_quantity"].to_numpy() * 100 + 0.5).astype(np.int64)
        pc_ = np.floor(
            df["l_extendedprice"].to_numpy() * 100 + 0.5).astype(np.int64)
        d = pd.DataFrame({"k": df["l_partkey"].to_numpy(), "qc": qc, "pc": pc_})
        gg = d.groupby("k", sort=False)["qc"]
        ssum = gg.transform("sum").to_numpy()
        cnt = gg.transform("size").to_numpy().astype(np.int64)
        mask = 5 * qc * cnt < ssum
        return pd.DataFrame({"_cents": [int(pc_[mask].sum())]})

    partials = _coarse_final(j, "l_partkey", per_bucket)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        total = np.int64(df["_cents"].sum())
        return pd.DataFrame({"avg_yearly": [_qround(
            np.float64(total) / 100.0 / 7.0, 6)]})

    return _final_agg(partials, finalize)


_SQL_Q17_SMALL_QTY = """
WITH j AS (
  SELECT l_partkey AS k,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pcents
  FROM lineitem
  WHERE l_partkey IN (
    SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_type = 'STANDARD')
), s AS (
  SELECT k, qc, pcents,
         sum(qc) OVER (PARTITION BY k) AS ssum,
         count(*) OVER (PARTITION BY k) AS cnt
  FROM j
)
SELECT floor((CAST(sum(pcents) AS DOUBLE) / 100.0 / 7.0) * 1000000 + 0.5) / 1000000
       AS avg_yearly
FROM s WHERE 5 * qc * cnt < ssum
"""


def q13_order_count_distribution(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q13 shape — outer-join count distribution: how many
    customers placed exactly N non-urgent orders, INCLUDING the
    zero-order customers only an outer join can see.  Per-customer
    counts finalize inside coarse custkey-hash partitions; customer then
    LEFT-joins onto the counts through the task-based exchange (both
    sides scale, neither broadcasts); missing matches become zero; the
    (order-count -> customer-count) distribution is a bounded-key
    coalesced reduce (max orders per customer).  Reference analog:
    per-beneficiary claim counts where zero-claim beneficiaries still
    emit an OMOP person row."""
    ords = _rpc(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(
                pc.not_equal(t["o_orderpriority"], "1-URGENT")
            ).select(["o_custkey"])
        ),
        batch_format="pyarrow",
    )

    def cnt_partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby("o_custkey", sort=False).size()
            .rename("_n").reset_index()
        )

    def cnt_final(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("o_custkey", sort=False)["_n"].sum().reset_index()

    counts = _coarse_final(
        ords.map_batches(cnt_partial, batch_format="pandas"),
        "o_custkey", cnt_final,
    )
    cust = _rpc(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
    j = hash_join(
        cust, counts, on="c_custkey", right_on="o_custkey", how="left",
        right_schema=pa.schema([("o_custkey", pa.int64()), ("_n", pa.int64())]),
    )

    def dist_partial(df: pd.DataFrame) -> pd.DataFrame:
        n = df["_n"].fillna(0).astype("int64")
        return n.value_counts().rename("custdist").rename_axis(
            "c_count").reset_index()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_count", sort=False)["custdist"].sum().reset_index()
        return g.astype({"c_count": "int64", "custdist": "int64"})

    return _final_agg(j.map_batches(dist_partial, batch_format="pandas"),
                      finalize)


_SQL_Q13_CUSTDIST = """
WITH c AS (
  SELECT c_custkey, count(o_custkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM c GROUP BY c_count
"""


def q15_top_supplier(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q15 shape — max-of-aggregates with self-comparison: the
    supplier(s) whose Q3-1997 discounted revenue equals the global
    maximum.  Per-supplier revenue accumulates as exact int64 cents
    inside coarse suppkey-hash partitions, so the max and the equality
    filter compare identical integers on both engines (genuine ties
    survive identically — no epsilon games).  Each coarse bucket emits
    only its local max row(s); the global max + filter is a bounded
    final (<= parts x ties rows).  Supplier identity attaches AFTER
    selection — the join input is the tiny winner set."""
    lo, hi = pd.Timestamp("1997-07-01"), pd.Timestamp("1997-10-01")
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_suppkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(
        lambda t: _nometa(
            t.filter(
                pc.and_(
                    pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi)),
                )
            ).select(["l_suppkey", "l_extendedprice", "l_discount"])
        ),
        batch_format="pyarrow",
    )

    def rev_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["l_extendedprice"].to_numpy()
            * (1 - df["l_discount"].to_numpy()) * 100 + 0.5
        ).astype(np.int64)
        return (
            pd.DataFrame({"l_suppkey": df["l_suppkey"], "_c": cents})
            .groupby("l_suppkey", sort=False)["_c"].sum().reset_index()
        )

    def local_max(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", sort=False)["_c"].sum().reset_index()
        return g[g["_c"] == g["_c"].max()]

    candidates = _coarse_final(
        li.map_batches(rev_partial, batch_format="pandas"),
        "l_suppkey", local_max,
    )

    def global_max(df: pd.DataFrame) -> pd.DataFrame:
        w = df[df["_c"] == df["_c"].max()]
        return pd.DataFrame({
            "s_suppkey": w["l_suppkey"].astype("int64"),
            "total_revenue": w["_c"].to_numpy().astype(np.float64) / 100.0,
        })

    winners = _final_agg(candidates, global_max)
    sup = _rpc(f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"])
    out = hash_join(
        winners, sup, on="s_suppkey",
        left_schema=pa.schema(
            [("s_suppkey", pa.int64()), ("total_revenue", pa.float64())]),
        right_schema=_pq_cols_schema(sf_dir, "supplier",
                                     ["s_suppkey", "s_name"]),
    )
    return out.map_batches(
        lambda t: _nometa(t.select(["s_suppkey", "s_name", "total_revenue"])),
        batch_format="pyarrow",
    )


_SQL_Q15_TOP_SUPPLIER = """
WITH r AS (
  SELECT l_suppkey AS s_suppkey,
         sum(CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5)
                  AS BIGINT)) AS c
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-07-01'
    AND l_shipdate < TIMESTAMP '1997-10-01'
  GROUP BY l_suppkey
)
SELECT r.s_suppkey, s_name, CAST(c AS DOUBLE) / 100.0 AS total_revenue
FROM r JOIN supplier ON r.s_suppkey = supplier.s_suppkey
WHERE c = (SELECT max(c) FROM r)
"""


def q22_dormant_customers(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q22 shape — global-scalar filter + anti-join: per market
    segment, the count and total balance of customers whose balance
    exceeds the average POSITIVE balance and who placed no order since
    2000-01-01 (the dormancy window — Q22's "no orders in N years").
    The global average is a two-int64 scalar (sum cents, count) reduced
    from per-batch partials — the one legitimate driver materialization
    (two numbers, any scale); the per-row comparison is exact integer
    cross-multiplication (bal_cents * cnt > sum_cents), so no float
    boundary dust.  The order anti-join runs through the task-based
    exchange — orders scales, so it is never collected or broadcast.
    Segment totals are a bounded-key coalesced reduce."""
    cust_all = _rpc(f"{sf_dir}/customer.parquet",
                    columns=["c_custkey", "c_acctbal", "c_mktsegment"])

    def bal_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
        pos = cents > 0
        return pd.DataFrame({"_s": [int(cents[pos].sum())],
                             "_n": [int(pos.sum())]})

    stat = _final_agg(
        cust_all.map_batches(bal_partial, batch_format="pandas"),
        lambda df: pd.DataFrame({"_s": [int(df["_s"].sum())],
                                 "_n": [int(df["_n"].sum())]}),
    ).to_pandas()
    ssum, cnt = int(stat["_s"].iloc[0]), int(stat["_n"].iloc[0])

    rich = cust_all.map_batches(
        lambda t, s, n: _nometa(
            t.filter(
                pc.greater(
                    pc.multiply(
                        pc.cast(
                            pc.floor(pc.add(pc.multiply(
                                t["c_acctbal"], pa.scalar(100.0)),
                                pa.scalar(0.5))),
                            pa.int64(),
                        ),
                        pa.scalar(n, pa.int64()),
                    ),
                    pa.scalar(s, pa.int64()),
                )
            )
        ),
        batch_format="pyarrow", fn_kwargs={"s": ssum, "n": cnt},
    )
    ords = _rpc(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(
                pc.greater_equal(
                    t["o_orderdate"], pa.scalar(pd.Timestamp("2000-01-01")))
            ).select(["o_custkey"])
        ),
        batch_format="pyarrow",
    )
    dormant = hash_join(
        rich, ords, on="c_custkey", right_on="o_custkey", how="anti",
        left_schema=_pq_cols_schema(
            sf_dir, "customer", ["c_custkey", "c_acctbal", "c_mktsegment"]),
        right_schema=pa.schema([("o_custkey", pa.int64())]),
    )

    def seg_partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(df["c_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
        d = pd.DataFrame({"c_mktsegment": df["c_mktsegment"], "_c": cents})
        g = d.groupby("c_mktsegment", sort=False)["_c"]
        return pd.DataFrame({"numcust": g.size(), "_c": g.sum()}).reset_index()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("c_mktsegment", sort=False).agg(
            numcust=("numcust", "sum"), _c=("_c", "sum")).reset_index()
        g["totacctbal"] = g.pop("_c").to_numpy().astype(np.float64) / 100.0
        return g.astype({"numcust": "int64"})

    return _final_agg(dormant.map_batches(seg_partial, batch_format="pandas"),
                      finalize)


_SQL_Q22_DORMANT = """
WITH c AS (
  SELECT c_custkey, c_mktsegment,
         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM customer
), s AS (
  SELECT sum(CASE WHEN cents > 0 THEN cents ELSE 0 END) AS ssum,
         sum(CASE WHEN cents > 0 THEN 1 ELSE 0 END) AS cnt
  FROM c
)
SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS totacctbal
FROM c, s
WHERE cents * cnt > ssum
  AND c_custkey NOT IN (
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '2000-01-01')
GROUP BY c_mktsegment
"""


def q8_market_share(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q8 shape — per-year market share: among STANDARD-part
    revenue sold to customers of region AMERICA in 1996-1997, the
    fraction supplied by NATION_6.  Four scale-growing sides (lineitem,
    part, orders, customer, supplier) all stream through task-based
    hash joins; only region/nation (25 rows at any scale) resolve on
    the driver.  Revenue accumulates as exact int64 cents split into
    (target, total) per year, so the one share division per year runs
    on identical operands in both engines."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    am_rk = region.filter(
        pc.equal(region["r_name"], "AMERICA"))["r_regionkey"][0].as_py()
    am_keys = pa.array(
        nation.filter(pc.equal(nation["n_regionkey"], am_rk))
        ["n_nationkey"].to_pylist(), type=pa.int32())
    target_nk = nation.filter(
        pc.equal(nation["n_name"], "NATION_6"))["n_nationkey"][0].as_py()

    part_f = _rpc(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.equal(t["p_type"], "STANDARD")).select(["p_partkey"])),
        batch_format="pyarrow",
    )
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(_nometa, batch_format="pyarrow")
    li_p = hash_join(
        li, part_f, on="l_partkey", right_on="p_partkey", how="semi",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey",
             "l_extendedprice", "l_discount"]),
        right_schema=pa.schema([("p_partkey", pa.int64())]),
    )

    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")

    def orders_prep(t: pa.Table) -> pa.Table:
        f = t.filter(pc.and_(
            pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
            pc.less(t["o_orderdate"], pa.scalar(hi)),
        ))
        return _nometa(pa.table({
            "o_orderkey": f["o_orderkey"],
            "o_custkey": f["o_custkey"],
            "o_year": pc.cast(pc.year(f["o_orderdate"]), pa.int64()),
        }))

    orders = _rpc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(orders_prep, batch_format="pyarrow")
    cust = _rpc(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.is_in(t["c_nationkey"], value_set=am_keys))
            .select(["c_custkey"])),
        batch_format="pyarrow",
    )
    orders_am = hash_join(
        orders, cust, on="o_custkey", right_on="c_custkey", how="semi",
        left_schema=pa.schema([("o_orderkey", pa.int64()),
                               ("o_custkey", pa.int64()),
                               ("o_year", pa.int64())]),
        right_schema=pa.schema([("c_custkey", pa.int64())]),
    )
    j1 = hash_join(
        li_p, orders_am, on="l_orderkey", right_on="o_orderkey",
    )
    supp = _rpc(f"{sf_dir}/supplier.parquet",
                columns=["s_suppkey", "s_nationkey"]
                ).map_batches(_nometa, batch_format="pyarrow")
    j2 = hash_join(
        j1, supp, on="l_suppkey", right_on="s_suppkey",
        right_schema=_pq_cols_schema(sf_dir, "supplier",
                                     ["s_suppkey", "s_nationkey"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cents = np.floor(
            df["l_extendedprice"].to_numpy()
            * (1 - df["l_discount"].to_numpy()) * 100 + 0.5
        ).astype(np.int64)
        tgt = np.where(
            df["s_nationkey"].to_numpy() == target_nk, cents, np.int64(0))
        d = pd.DataFrame({"o_year": df["o_year"], "_t": tgt, "_a": cents})
        return d.groupby("o_year", sort=False).sum().reset_index()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_year", sort=False).sum().reset_index()
        share = _qround(
            g["_t"].to_numpy().astype(np.float64)
            / g["_a"].to_numpy().astype(np.float64), 6)
        return pd.DataFrame({"o_year": g["o_year"].astype("int64"),
                             "mkt_share": share})

    return _final_agg(j2.map_batches(partial, batch_format="pandas"),
                      finalize)


_SQL_Q8_MARKET_SHARE = """
WITH j AS (
  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5)
              AS BIGINT) AS cents,
         s_nationkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'STANDARD')
    AND o_custkey IN (
      SELECT c_custkey FROM customer WHERE c_nationkey IN (
        SELECT n_nationkey FROM nation JOIN region
          ON n_regionkey = r_regionkey WHERE r_name = 'AMERICA'))
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
)
SELECT o_year,
       floor((CAST(sum(CASE WHEN s_nationkey = (
                SELECT n_nationkey FROM nation WHERE n_name = 'NATION_6')
              THEN cents ELSE 0 END) AS DOUBLE)
              / CAST(sum(cents) AS DOUBLE)) * 1000000 + 0.5) / 1000000
         AS mkt_share
FROM j GROUP BY o_year
"""


def embedding_hard_negatives(sf_dir: str) -> "rd.Dataset":
    """Hard-negative mining (contrastive-training prep): for query
    vectors vec_id<3, the exact cosine top-5 among DIFFERENT-label
    vectors — the highest-similarity wrong-class examples a retrieval
    trainer wants as negatives.  Scale shape = ann_cosine_topk's
    (broadcast query matrix, one streaming corpus pass, vectorized
    label mask via the BatchScorer hook, bounded per-query final)."""
    from ..stages.ann import hard_negative_topk

    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding", "label"],
        filters=[("vec_id", "<", 3)],
    )
    q_ids = np.array(q["vec_id"].to_pylist(), dtype=np.int64)
    q_vecs = np.array(q["embedding"].to_pylist(), dtype=np.float64)
    q_labels = np.array(q["label"].to_pylist(), dtype=np.int64)
    ds = _rpc(f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding", "label"])
    out = hard_negative_topk(ds, q_ids, q_vecs, q_labels, k=5,
                             concurrency=2, round_digits=4)
    return out.map_batches(
        lambda df: df[["query_id", "neighbor_id", "score", "rank"]].astype(
            {"query_id": "int64", "neighbor_id": "int64", "rank": "int64"}
        ),
        batch_format="pandas",
    )


_SQL_HARD_NEGATIVES = """
WITH q AS (
  SELECT vec_id AS query_id, label AS qlabel,
         CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         floor((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe))
               * 10000 + 0.5) / 10000 AS score
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id AND e.label <> q.qlabel
)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id
                          ORDER BY score DESC, neighbor_id) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id
                           ORDER BY score DESC, neighbor_id) <= 5
"""


def events_touch_attribution(sf_dir: str) -> "rd.Dataset":
    """Multi-touch LINEAR attribution — the time-band self-join the
    nearest-only asof family can't express: every purchase splits its
    value EQUALLY across all of that user's clicks in the preceding
    24 h, and each click reports its total earned credit.  The band
    join realizes inside coarse user-hash partitions (one pandas merge
    per bucket + a vectorized band filter; every event of a user shares
    a bucket, so per-purchase touch counts are locally exact and the
    events shuffle ONCE; per-user volume bounds the pair blow-up — a
    pathological hot user is the hash_join hot_keys salting case).
    Credit rides an exact integer micro-dollar grid
    (floor(cents*10000/n + 0.5)), so per-click sums are int64 and the
    engines can never drift in float summation order."""
    W_US = 24 * 3600 * 1_000_000
    ds = _events(sf_dir, ["event_id", "ts", "user_id", "event_type", "value"])

    def narrow(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        keep = t.filter(pc.is_in(
            t["event_type"], value_set=pa.array(["click", "purchase"])))
        is_p = pc.equal(keep["event_type"], "purchase")
        cents = pc.cast(pc.floor(pc.add(pc.multiply(
            keep["value"], pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        return pa.table({
            "user_id": keep["user_id"],
            "event_id": keep["event_id"],
            "ts_us": pc.cast(keep["ts"], pa.int64()),
            "side": pc.cast(is_p, pa.int8()),
            "cents": pc.if_else(is_p, cents, pa.scalar(0, pa.int64())),
        })

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        c = df[df["side"] == 0][["user_id", "event_id", "ts_us"]].rename(
            columns={"event_id": "cid", "ts_us": "cts"})
        p = df[df["side"] == 1][["user_id", "event_id", "ts_us", "cents"]].rename(
            columns={"event_id": "pid", "ts_us": "pts"})
        m = c.merge(p, on="user_id")
        d = m["pts"].to_numpy() - m["cts"].to_numpy()
        m = m[(d > 0) & (d <= W_US)]
        if m.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "click_event_id": pd.Series(dtype="int64"),
                                 "credit": pd.Series(dtype="float64")})
        n = m.groupby("pid")["cid"].transform("size").to_numpy()
        micro = np.floor(
            m["cents"].to_numpy().astype(np.float64) * 10000.0 / n + 0.5
        ).astype(np.int64)
        g = (pd.DataFrame({"user_id": m["user_id"].to_numpy(),
                           "click_event_id": m["cid"].to_numpy(),
                           "_m": micro})
             .groupby(["user_id", "click_event_id"], sort=False)["_m"]
             .sum().reset_index())
        g["credit"] = g.pop("_m").to_numpy().astype(np.float64) / 1000000.0
        return g

    partials = ds.map_batches(narrow, batch_format="pyarrow")
    return _coarse_final(partials, "user_id", per_bucket)


_SQL_TOUCH_ATTRIBUTION = """
WITH c AS (
  SELECT user_id, event_id AS cid, ts AS cts FROM events
  WHERE event_type = 'click'
), p AS (
  SELECT user_id, event_id AS pid, ts AS pts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), j AS (
  SELECT c.user_id, cid, pid, cents,
         count(*) OVER (PARTITION BY pid) AS n
  FROM c JOIN p ON c.user_id = p.user_id
   AND cts < pts AND cts >= pts - INTERVAL 24 HOURS
), cr AS (
  SELECT user_id, cid,
         CAST(floor(CAST(cents AS DOUBLE) * 10000.0 / n + 0.5) AS BIGINT)
           AS micro
  FROM j
)
SELECT user_id, cid AS click_event_id,
       CAST(sum(micro) AS DOUBLE) / 1000000.0 AS credit
FROM cr GROUP BY 1, 2
"""


def embedding_covariance(sf_dir: str) -> "rd.Dataset":
    """Distributed covariance matrix of the embedding column (the moment
    half of PCA; partial->coalesce aggregate family of SURVEY.md §2
    T7/A4).  Each batch emits d^2+d+1 integer-grid moment sums —
    independent of row count — and `_final_agg`'s one coalesced task
    reduces them (bounded keys: 4161 at d=64).  Grid discipline
    (CLAUDE.md rule 4): sums are over per-row ``floor(x*1e8+0.5)`` /
    ``floor(x_i*x_j*1e8+0.5)`` int64 terms, so the DuckDB oracle
    reproduces the identical sums regardless of order and the final
    float64 covariance expression is mirrored literally."""
    from ..stages.pca import covariance_finalize, covariance_partials

    ds = _rpc(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    part = ds.map_batches(covariance_partials, batch_format="pyarrow")
    return _final_agg(part, covariance_finalize)


_SQL_EMBEDDING_COVARIANCE = """
WITH e AS (
  SELECT vec_id, CAST(i AS BIGINT) AS i,
         CAST(embedding[CAST(i AS INT)] AS DOUBLE) AS x
  FROM embeddings, unnest(range(1, len(embedding) + 1)) AS t(i)
),
s AS (
  SELECT i, SUM(CAST(floor(x * 100000000.0 + 0.5) AS BIGINT)) AS sx,
         COUNT(*) AS n
  FROM e GROUP BY i
),
p AS (
  SELECT a.i AS i, b.i AS j,
         SUM(CAST(floor(a.x * b.x * 100000000.0 + 0.5) AS BIGINT)) AS sxy
  FROM e a JOIN e b USING (vec_id)
  GROUP BY a.i, b.i
)
SELECT p.i - 1 AS i, p.j - 1 AS j,
       floor(((CAST(sxy AS DOUBLE) / 100000000.0) / CAST(sa.n AS DOUBLE)
              - (CAST(sa.sx AS DOUBLE) / 100000000.0 / CAST(sa.n AS DOUBLE))
                * (CAST(sb.sx AS DOUBLE) / 100000000.0 / CAST(sb.n AS DOUBLE)))
             * 100000000.0 + 0.5) / 100000000.0 AS cov
FROM p JOIN s sa ON sa.i = p.i JOIN s sb ON sb.i = p.j
"""


def embedding_pca_project(sf_dir: str) -> "rd.Dataset":
    """Distributed PCA: fit on the exact integer-grid covariance (one
    bounded d^2-row gather — model state, not data), eigendecompose the
    d x d matrix on the driver (O(d^3), model width not data scale),
    sign-canonicalize the basis, then project every vector with one
    matmul per batch.  Deterministic end to end (exact integer moments
    -> identical cov -> identical eigh in one build), so the driver's
    rows-only check sees a stable schema and stable values; the
    eigenbasis itself is not SQL-expressible, hence no oracle — the
    orthonormality/variance-ordering/numpy-agreement invariants are
    pinned in tests/test_pca.py."""
    from ..stages.pca import fit_pca, project_batch

    ds = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    mean, comps, _evals = fit_pca(ds, k=4)
    return ds.map_batches(
        lambda t: project_batch(t, mean, comps), batch_format="pyarrow"
    )


def cdc_fast_count(sf_dir: str) -> "rd.Dataset":
    """Metadata-served COUNT(*) (the Iceberg/Delta metadata-count
    contract, `pipelines/meta.fast_count`): ingest the docs change
    stream into a MOR lake in two commits so the manifest holds a MIX
    of delta-free partitions (count answered from metadata, zero data
    reads) and live-delta partitions (count unknown, folded one Ray
    task each) — both paths must be exercised or the entry raises as
    vacuous.  Pins fast_count == the relational COUNT(*) the oracle
    computes, and == read_lake().count() (the slow path it replaces)."""
    from ..functions.hashing import part_id_for
    from ..state.manifest import LakeStore
    from .maintenance import compact_lake
    from .meta import fast_count

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"fcnt_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16,
                       commit_mode="mor", max_deltas=64)

    def epoch1_part(t: pa.Table, want_zero: bool) -> pa.Table:
        pid = part_id_for(t["repo"], t["path"], 16).to_numpy(
            zero_copy_only=False)
        keep = (pid == 0) if want_zero else (pid != 0)
        return t.filter(pa.array(
            keep & (t["epoch"].to_numpy(zero_copy_only=False) == 1)))

    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    # epoch 1 lands in two fenced sub-commits split by the engine's OWN
    # key partitioner, with a compaction between them: afterwards
    # exactly partition 0 carries live deltas (count unknown -> folded)
    # and every other partition answers from metadata — both fast_count
    # paths deterministically exercised.
    ingest(events.map_batches(epoch1_part, fn_kwargs={"want_zero": False},
                              batch_format="pyarrow"),
           cfg, count_input=False)
    compact_lake(lake_root)
    ingest(events.map_batches(epoch1_part, fn_kwargs={"want_zero": True},
                              batch_format="pyarrow"),
           cfg, count_input=False)
    man = LakeStore(lake_root).load_manifest()
    kinds = {ps.rows >= 0 for ps in man.partitions.values()}
    if kinds != {True, False}:
        raise AssertionError(
            "fast_count fixture must mix known and unknown partition "
            f"counts, got {kinds}")
    n = fast_count(lake_root)
    slow = read_lake(lake_root, columns=["repo"]).count()
    if n != slow:
        raise AssertionError(f"fast_count {n} != read_lake count {slow}")
    return rd.from_arrow(pa.table({"n_rows": pa.array([n], type=pa.int64())}))


_SQL_FAST_COUNT = f"""
SELECT CAST(count(*) AS BIGINT) AS n_rows FROM ({_SQL_REPOS_LAKE})
"""


def cdc_compaction(sf_dir: str) -> "rd.Dataset":
    """Merge-on-read delta-fold compaction as an oracle-checked lifecycle
    (Iceberg rewrite_data_files / Delta OPTIMIZE analog; the reference
    can only re-run its whole forward pass, ``Main.py``): ingest the
    _docs_change_events stream into a MOR lake in two commits (commit 2
    appends per-partition delta files instead of rewriting bases), fold
    every delta chain back into its base with ``compact_lake`` (one task
    per dirty partition), then pin that the compacted lake equals the
    direct relational reconstruction hash-for-hash AND is structurally
    clean: deltas actually existed before, zero remain after, and the
    full audit (sha/size/key-placement/uniqueness/fences) is healthy."""
    from ..state.manifest import LakeStore
    from .maintenance import audit_lake, compact_lake

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"cpx_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    events = _docs_change_events(sf_dir)
    # max_deltas high enough that commit 2 cannot auto-compact underneath
    # the explicit fold being exercised here
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16,
                       commit_mode="mor", max_deltas=64)
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    ingest(events.filter(expr="epoch == 1"), cfg, count_input=False)
    pre = LakeStore(lake_root).load_manifest()
    if not any(ps.deltas for ps in pre.partitions.values()):
        raise AssertionError("MOR commit 2 produced no deltas — vacuous")
    post = compact_lake(lake_root)
    if any(ps.deltas for ps in post.partitions.values()):
        raise AssertionError("compaction left delta chains behind")
    rep = audit_lake(lake_root)
    if not rep["healthy"]:
        raise AssertionError(f"post-compaction audit unhealthy: {rep}")
    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


def cdc_temporal_join(sf_dir: str) -> "rd.Dataset":
    """Temporal (event-time) join — the Flink "temporal table join"
    shape: every fact event of the docs change stream picks up the
    sidecar-annotation DIMENSION STATE that was valid AT ITS OWN
    (epoch, seq) instant, not the final state.  With LWW ordering, the
    state at time t is exactly the max-ord event <= t (a winning delete
    means "state absent" -> NULL attributes), so the operator is the
    engine's keyed as-of join (`stages/asof.py`) over the composite
    order encoded as ``epoch * 2^32 + seq``, keyed by the exact
    (repo NUL path) string.  The oracle is DuckDB's native ASOF LEFT
    JOIN over both relational stream reconstructions — two independent
    implementations of the same inclusive as-of contract."""
    from ..stages.asof import asof_join

    OE = 1 << 32
    facts = _docs_change_events(sf_dir)
    annots = _annot_change_events(sf_dir)

    def prep_fact(t: pa.Table) -> pa.Table:
        from ..functions.hashing import key_array
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ordv = pc.add(pc.multiply(t["epoch"], pa.scalar(OE, type=pa.int64())),
                      t["seq"])
        return pa.table({
            "k": key_array(t["repo"], t["path"]),
            "ord": ordv,
            "repo": t["repo"], "path": t["path"], "op": t["op"],
            "epoch": t["epoch"], "seq": t["seq"],
        })

    def prep_annot(t: pa.Table) -> pa.Table:
        from ..functions.hashing import key_array
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ordv = pc.add(pc.multiply(t["epoch"], pa.scalar(OE, type=pa.int64())),
                      t["seq"])
        return pa.table({
            "k": key_array(t["repo"], t["path"]),
            "ord": ordv,
            "a_op": t["op"],
            "a_content": t["content"],
        })

    f = facts.map_batches(prep_fact, batch_format="pyarrow")
    a = annots.map_batches(prep_annot, batch_format="pyarrow")
    f_schema = pa.schema([("k", pa.string()), ("ord", pa.int64()),
                          ("repo", pa.string()), ("path", pa.string()),
                          ("op", pa.string()), ("epoch", pa.int64()),
                          ("seq", pa.int64())])
    a_schema = pa.schema([("k", pa.string()), ("ord", pa.int64()),
                          ("a_op", pa.string()), ("a_content", pa.string())])
    joined = asof_join(f, a, on="ord", by="k", suffix="_a",
                       left_schema=f_schema, right_schema=a_schema)

    def finish(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        # a winning delete = dimension state ABSENT at fact time
        live = pc.and_kleene(pc.is_valid(t["a_op"]),
                             pc.not_equal(t["a_op"], "delete"))
        live = pc.fill_null(live, False)
        return pa.table({
            "repo": t["repo"], "path": t["path"], "op": t["op"],
            "epoch": t["epoch"], "seq": t["seq"],
            "annot": pc.if_else(live, t["a_content"],
                                pa.nulls(t.num_rows, type=pa.string())),
            "annot_ord": pc.if_else(live, t["ord_a"],
                                    pa.nulls(t.num_rows, type=pa.int64())),
        })

    return joined.map_batches(finish, batch_format="pyarrow")


_SQL_TEMPORAL_JOIN = """
WITH facts AS (
  SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path,
         'insert' AS op, CAST(0 AS BIGINT) AS epoch,
         CAST(doc_id AS BIGINT) AS seq
  FROM documents
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR), 'update',
         CAST(1 AS BIGINT), CAST(doc_id AS BIGINT)
  FROM documents WHERE doc_id % 3 = 0
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR), 'delete',
         CAST(1 AS BIGINT), CAST(doc_id + 1000000 AS BIGINT)
  FROM documents WHERE doc_id % 7 = 0
), annots AS (
  SELECT source AS repo, 'doc_' || CAST(doc_id AS VARCHAR) AS path,
         'insert' AS a_op,
         'score=' || CAST(doc_id % 97 AS VARCHAR) AS a_content,
         CAST(doc_id AS BIGINT) AS a_ord
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR), 'insert',
         'score=' || CAST(doc_id % 97 AS VARCHAR),
         4294967296 + CAST(doc_id AS BIGINT)
  FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR), 'update',
         'score=' || CAST(doc_id % 97 AS VARCHAR) || ' r2',
         4294967296 + CAST(doc_id + 1000000 AS BIGINT)
  FROM documents WHERE doc_id % 10 = 0
  UNION ALL
  SELECT source, 'doc_' || CAST(doc_id AS VARCHAR), 'delete',
         CAST(NULL AS VARCHAR),
         4294967296 + CAST(doc_id + 2000000 AS BIGINT)
  FROM documents WHERE doc_id % 11 = 0
)
SELECT f.repo, f.path, f.op, f.epoch, f.seq,
       CASE WHEN a.a_op IS NULL OR a.a_op = 'delete'
            THEN NULL ELSE a.a_content END AS annot,
       CASE WHEN a.a_op IS NULL OR a.a_op = 'delete'
            THEN NULL ELSE a.a_ord END AS annot_ord
FROM facts f
ASOF LEFT JOIN annots a
  ON f.repo = a.repo AND f.path = a.path
 AND f.epoch * 4294967296 + f.seq >= a.a_ord
"""


def _trading_edges(sf_dir: str) -> "rd.Dataset":
    """Symmetric directed edge list of the supplier↔customer
    trading-partner graph: distinct (l_suppkey, o_custkey) pairs from
    lineitem⨝orders, customer ids offset by 2^32 into a disjoint
    node-id range.  Shared by graph_pagerank and graph_bfs_hops (the
    SQL oracles share the matching pairs/edges CTE)."""
    li = _rpc(f"{sf_dir}/lineitem.parquet",
              columns=["l_orderkey", "l_suppkey"])
    orders = _rpc(f"{sf_dir}/orders.parquet",
                  columns=["o_orderkey", "o_custkey"])
    joined = hash_join(
        li, orders, on="l_orderkey", right_on="o_orderkey",
        left_schema=_pq_cols_schema(sf_dir, "lineitem",
                                    ["l_orderkey", "l_suppkey"]),
        right_schema=_pq_cols_schema(sf_dir, "orders",
                                     ["o_orderkey", "o_custkey"]),
    )

    OFF = 1 << 32

    def pair_partial(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        s = t["l_suppkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        u = np.unique(np.stack([s, c], axis=1), axis=0)
        return pa.table({"s": pa.array(u[:, 0]), "c": pa.array(u[:, 1]),
                         "fpart": pa.array(
                             (u[:, 0] * 1000003 + u[:, 1]) % 64)})

    def pair_distinct(df: pd.DataFrame) -> pd.DataFrame:
        return df[["s", "c"]].drop_duplicates()

    pairs = joined.map_batches(
        pair_partial, batch_format="pyarrow", batch_size=65536
    ).groupby("fpart").map_groups(pair_distinct, batch_format="pandas")

    def to_edges(t: pa.Table) -> pa.Table:
        s = t["s"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = t["c"].to_numpy(zero_copy_only=False).astype(np.int64) + OFF
        return pa.table({"src": pa.array(np.concatenate([s, c])),
                         "dst": pa.array(np.concatenate([c, s]))})

    return pairs.map_batches(to_edges, batch_format="pyarrow")


def graph_pagerank(sf_dir: str) -> "rd.Dataset":
    """Integer-grid PageRank (`stages/graph.py`) over the
    supplier↔customer trading-partner graph (_trading_edges), 4
    scatter-gather iterations of
    ``mass'[v] = T + Σ (mass[u]*85)//(100*outdeg[u])`` — every sum is
    order-independent int64 arithmetic, so the unrolled SQL oracle
    reproduces the ranks BIT-exactly (no float quantization at all).
    The host-importance quality signal of web-scale corpus pipelines,
    over the test schema's natural bipartite graph."""
    from ..stages.graph import pagerank

    return pagerank(_trading_edges(sf_dir), iters=4)


def graph_bfs_hops(sf_dir: str) -> "rd.Dataset":
    """Multi-source BFS hop distance (`stages/graph.py bfs_hops`) from
    trusted seed suppliers {0,1,2} over the trading-partner graph —
    the crawl-depth-from-seeds corpus-quality signal (Pregel frontier
    pattern: one edges⨝frontier hash join + one coarse min-reduce per
    level, distance vector materialized between levels, early exit on
    an empty frontier).  Pure integers; the oracle is a recursive CTE
    over the same edges."""
    from ..stages.graph import bfs_hops

    seeds = rd.from_arrow(pa.table({
        "node": pa.array([0, 1, 2], type=pa.int64()),
    }))
    return bfs_hops(_trading_edges(sf_dir), seeds, max_hops=3)


def graph_pagerank_personalized(sf_dir: str) -> "rd.Dataset":
    """Personalized PageRank (TrustRank shape) from trusted seed
    suppliers {0,1,2}: initial mass and teleport concentrate on the
    seed set, so scores measure PROXIMITY to the seeds instead of
    global importance — the trusted-host propagation signal of
    web-corpus curation, next to graph_bfs_hops' hop distance.  Same
    int64 mass grid and scatter-gather shape as graph_pagerank; the
    unrolled SQL oracle is BIT-exact."""
    from ..stages.graph import pagerank

    return pagerank(_trading_edges(sf_dir), iters=4, seed_nodes=[0, 1, 2])


def _ppr_oracle_sql(iters: int = 4) -> str:
    """Unrolled SQL mirror of the personalized integer recurrence —
    teleport and initial mass only on the seed set {0,1,2}."""
    body = """
WITH pairs AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                  CAST(o_custkey AS BIGINT) AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT s AS src, c + 4294967296 AS dst FROM pairs
  UNION ALL
  SELECT c + 4294967296 AS src, s AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), r0 AS (
  SELECT node,
         CASE WHEN node IN (0, 1, 2)
              THEN CAST(1000000000000 // 3 AS BIGINT)
              ELSE 0 END AS mass
  FROM nodes
)"""
    for k in range(1, iters + 1):
        body += f""", r{k} AS (
  SELECT n.node,
         CASE WHEN n.node IN (0, 1, 2)
              THEN ((1000000000000 // 3) * 15) // 100
              ELSE 0 END
         + COALESCE(SUM((r.mass * 85) // (100 * d.outdeg)), 0) AS mass
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{k - 1} r ON r.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
)"""
    # SUM(BIGINT) widens to HUGEINT in DuckDB, which pandas renders as
    # float64 and the driver's dtype-sensitive hash rejects — cast back.
    return body + f"\nSELECT node, CAST(mass AS BIGINT) AS mass FROM r{iters}"


_SQL_BFS_HOPS = """
WITH RECURSIVE pairs AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                  CAST(o_custkey AS BIGINT) AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT s AS src, c + 4294967296 AS dst FROM pairs
  UNION ALL
  SELECT c + 4294967296 AS src, s AS dst FROM pairs
), walk(node, hops) AS (
  SELECT CAST(v.node AS BIGINT), CAST(0 AS BIGINT)
  FROM (VALUES (0), (1), (2)) v(node)
  UNION
  SELECT e.dst, w.hops + 1
  FROM walk w JOIN edges e ON e.src = w.node
  WHERE w.hops < 3
)
SELECT node, min(hops) AS hops FROM walk GROUP BY node
"""


def _pagerank_oracle_sql(iters: int = 4) -> str:
    """Unrolled SQL mirror of the integer PageRank recurrence — same
    int64 grid, so the comparison is bit-exact with zero quantization."""
    body = """
WITH pairs AS (
  SELECT DISTINCT CAST(l_suppkey AS BIGINT) AS s,
                  CAST(o_custkey AS BIGINT) AS c
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
), edges AS (
  SELECT s AS src, c + 4294967296 AS dst FROM pairs
  UNION ALL
  SELECT c + 4294967296 AS src, s AS dst FROM pairs
), nodes AS (
  SELECT DISTINCT src AS node FROM edges
), deg AS (
  SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src
), const AS (
  SELECT CAST(1000000000000 // COUNT(*) AS BIGINT) AS m0 FROM nodes
), r0 AS (
  SELECT node, (SELECT m0 FROM const) AS mass FROM nodes
)"""
    for k in range(1, iters + 1):
        body += f""", r{k} AS (
  SELECT n.node,
         (SELECT (m0 * 15) // 100 FROM const)
         + COALESCE(SUM((r.mass * 85) // (100 * d.outdeg)), 0) AS mass
  FROM nodes n
  LEFT JOIN edges e ON e.dst = n.node
  LEFT JOIN r{k - 1} r ON r.node = e.src
  LEFT JOIN deg d ON d.src = e.src
  GROUP BY n.node
)"""
    # Same HUGEINT->float64 hazard as _ppr_oracle_sql — keep int64.
    return body + f"\nSELECT node, CAST(mass AS BIGINT) AS mass FROM r{iters}"


def cdc_gdpr_purge(sf_dir: str) -> "rd.Dataset":
    """GDPR right-to-be-forgotten as an oracle-checked lifecycle
    (`pipelines/maintenance.py purge_history`): ingest the
    _docs_change_events stream in TWO commits, then scrub one subject
    repo (the lexicographically smallest `source`) from EVERY retained
    snapshot IN PLACE — version numbers and epoch fences preserved, so
    a full-stream replay is still a fenced no-op even for the purged
    subject's old events.  Structural gates: the subject existed before
    the purge, zero rows remain in ANY retained version afterwards,
    both the current and the historical audit stay healthy, and the
    replay applies 0 events.  The oracle is the relational
    reconstruction minus the subject."""
    from ..state.manifest import LakeStore
    from .history import read_snapshot
    from .maintenance import audit_lake, purge_history

    lake_root, r1, r2 = _two_commit_lake(sf_dir, "gdpr_lake")
    store = LakeStore(lake_root)
    # subject = min(source) over DOCUMENTS — the oracle's own expression.
    # Computing it over the live lake instead would diverge whenever the
    # smallest source's docs were all deleted by the epoch-1 stream
    # (data-dependent oracle fragility).
    subject = (
        _rpc(f"{sf_dir}/documents.parquet", columns=["source"])
        .map_batches(lambda t: pa.table(
            {"s": pa.array([pc.min(t["source"]).as_py()])}),
            batch_format="pyarrow")
        .to_pandas()["s"].min()
    )
    pre = read_lake(lake_root)
    n_pre = pre.filter(expr=f"repo == '{subject}'").count()
    if n_pre == 0:
        raise AssertionError("subject repo absent pre-purge — vacuous")

    rep = purge_history(lake_root, subject)
    if rep["rows_removed"] == 0 or rep["versions_rewritten"] < 2:
        raise AssertionError(f"purge did not rewrite history: {rep}")
    for v in (r1.manifest_version, r2.manifest_version):
        left = read_snapshot(lake_root, version=v).filter(
            expr=f"repo == '{subject}'").count()
        if left:
            raise AssertionError(f"{left} subject rows survive in v{v}")
        if not audit_lake(lake_root, version=v)["healthy"]:
            raise AssertionError(f"post-purge audit unhealthy at v{v}")
    r3 = ingest(_docs_change_events(sf_dir), EngineConfig(
        lake_root=lake_root, num_partitions=16), count_input=False)
    if r3.events_applied != 0:
        raise AssertionError(
            f"replay applied {r3.events_applied} events after purge — "
            "fences were not preserved")

    lake = read_lake(lake_root)

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "lang": t["lang"],
                "content": t["content"].cast(pa.string()),
                "content_sha_hex": sha256_hex_column(t["content"]),
                "size": t["size"].cast(pa.int64()),
            }
        )

    return lake.map_batches(project, batch_format="pyarrow")


_SQL_GDPR_PURGE = """
SELECT source AS repo,
       'doc_' || CAST(doc_id AS VARCHAR) AS path,
       lang,
       CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS content,
       sha256(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END) AS content_sha_hex,
       CAST(octet_length(encode(CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END)) AS BIGINT) AS size
FROM documents
WHERE doc_id % 7 <> 0
  AND source <> (SELECT min(source) FROM documents)
"""


def cdc_copartition_join(sf_dir: str) -> "rd.Dataset":
    """Storage-partitioned join (`pipelines/spj.py`): the docs lake and
    the sidecar-annotation lake share the engine's deterministic key
    partitioner, so their INNER join on (repo, path) runs as one task
    per partition id with ZERO exchange — no shuffle, no broadcast, no
    block of either lake crossing the wire (the Iceberg SPJ idea; the
    generic alternative is stages/join.py hash_join, which exchanges
    both sides).  The oracle is the plain relational join over both
    final states — same relation `cdc_ivm_join` maintains incrementally,
    arrived at by a third, independent physical plan."""
    from .spj import copartitioned_join

    lake_a, _a1, _a2 = _two_commit_lake(sf_dir, "spj_a")
    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    lake_b = os.path.join(tempfile.gettempdir(), f"spj_b_{tag}")
    _sh.rmtree(lake_b, ignore_errors=True)
    annots = _annot_change_events(sf_dir)
    cfg_b = EngineConfig(lake_root=lake_b, num_partitions=16)
    ingest(annots.filter(expr="epoch == 0"), cfg_b, count_input=False)
    ingest(annots.filter(expr="epoch == 1"), cfg_b, count_input=False)

    out = copartitioned_join(lake_a, lake_b, ["content"], ["content"],
                             how="inner")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": t["repo"], "path": t["path"],
            "content": t["content"].cast(pa.string()),
            "annot": t["content_b"].cast(pa.string()),
        })

    return out.map_batches(project, batch_format="pyarrow")


def q21_sole_supplier(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q21 essence — EXISTS + NOT EXISTS over the SAME fact table:
    count, per supplier, the multi-line orders where that supplier
    supplied EVERY line (exists another line of the same order from the
    same supplier; not exists a line from a different supplier), top 10
    by count.  Both quantifiers resolve inside one coarse orderkey-hash
    partition — every line of an order shares a bucket, so per-order
    distinct-supplier and per-(order, supplier) line counts are
    locally exact and the fact shuffles ONCE.  The per-supplier count
    final is a second coarse reduce (suppkey space is unbounded); top-10
    = per-bucket local top-k + bounded merge with a total
    (count DESC, suppkey) tie-break."""
    li = _rpc(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_suppkey"])

    def per_order(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby(["l_orderkey", "l_suppkey"], sort=False).size()
        d = g.rename("n_lines").reset_index()
        per_ord = d.groupby("l_orderkey", sort=False)["l_suppkey"].transform("size")
        sole = d[(per_ord == 1) & (d["n_lines"] > 1)]
        return (sole.groupby("l_suppkey", sort=False).size()
                .rename("_n").reset_index())

    per_supp = _coarse_final(li, "l_orderkey", per_order)

    def supp_final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_suppkey", sort=False)["_n"].sum().reset_index()
        return g.sort_values(["_n", "l_suppkey"],
                             ascending=[False, True], kind="mergesort").head(10)

    candidates = _coarse_final(per_supp, "l_suppkey", supp_final)

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        out = df.sort_values(["_n", "l_suppkey"],
                             ascending=[False, True], kind="mergesort").head(10)
        return pd.DataFrame({
            "l_suppkey": out["l_suppkey"].astype("int64"),
            "sole_orders": out["_n"].astype("int64"),
        })

    return _final_agg(candidates, topk)


_SQL_Q21_SOLE_SUPPLIER = """
WITH d AS (
  SELECT l_orderkey, l_suppkey, count(*) AS n_lines
  FROM lineitem GROUP BY 1, 2
), sole AS (
  SELECT l_orderkey, l_suppkey
  FROM d
  WHERE n_lines > 1
    AND NOT EXISTS (
      SELECT 1 FROM d o
      WHERE o.l_orderkey = d.l_orderkey AND o.l_suppkey <> d.l_suppkey)
)
SELECT l_suppkey, CAST(count(*) AS BIGINT) AS sole_orders
FROM sole GROUP BY l_suppkey
ORDER BY sole_orders DESC, l_suppkey
LIMIT 10
"""


def embedding_sq8_error(sf_dir: str) -> "rd.Dataset":
    """Scalar int8 quantization of the embedding table with exact
    per-vector reconstruction error — the compression/recall trade
    measurement that precedes shipping a quantized ANN index (PQ's
    simpler sibling; stages/ann.py:431 holds the PQ variant).  Two
    passes: (1) per-dimension global min/max from per-batch partials
    (DIMS is bounded, so partials are DIMS rows/batch and the final is
    one coalesced task); (2) quantize q = floor((x-mn)*255/(mx-mn)+.5),
    dequantize, and score — all arithmetic on float64 with the operand
    tree mirrored literally in SQL, and the per-dim squared error
    quantized to an integer picounit grid so the 64-term sum is exact
    int64 (float summation order can never diverge).  The broadcast is
    2xDIMS doubles — bounded at any corpus scale."""
    from ..stages.ann import _to_matrix

    # 64 must equal the SQL mirror's `/ 64.0` literal (embedding width)
    DIMS = 64.0
    ds = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def stat_partial(t: pa.Table) -> pd.DataFrame:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        x = _to_matrix(t["embedding"])
        return pd.DataFrame({"dim": np.arange(x.shape[1], dtype=np.int64),
                             "mn": x.min(axis=0), "mx": x.max(axis=0)})

    stats = _final_agg(
        ds.map_batches(stat_partial, batch_format="pyarrow"),
        lambda df: df.groupby("dim", sort=False).agg(
            mn=("mn", "min"), mx=("mx", "max")).reset_index(),
    ).to_pandas().sort_values("dim")
    mn = stats["mn"].to_numpy()
    mx = stats["mx"].to_numpy()
    if not (mx > mn).all():
        # a constant dimension makes (x-mn)/(mx-mn) NaN and
        # floor(NaN).astype(int64) undefined — fail loudly rather than
        # diverge silently from the SQL mirror
        raise ValueError("embedding_sq8_error: constant embedding dimension")

    def score(t: pa.Table, mn, mx) -> pd.DataFrame:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        x = _to_matrix(t["embedding"])
        q = np.floor((x - mn) * 255.0 / (mx - mn) + 0.5)
        dq = mn + q * (mx - mn) / 255.0
        d = x - dq
        pico = np.floor(d * d * 1e12 + 0.5).astype(np.int64)
        return pd.DataFrame({
            "vec_id": t["vec_id"].to_numpy(zero_copy_only=False),
            "mse": pico.sum(axis=1).astype(np.float64) / DIMS / 1e12,
        })

    return ds.map_batches(score, batch_format="pyarrow",
                          fn_kwargs={"mn": mn, "mx": mx})


_SQL_SQ8_ERROR = """
WITH e AS (
  SELECT vec_id,
         CAST(unnest(embedding) AS DOUBLE) AS val,
         unnest(generate_series(1, array_length(embedding))) AS dim
  FROM embeddings
), s AS (
  SELECT dim, min(val) AS mn, max(val) AS mx FROM e GROUP BY dim
), q AS (
  SELECT vec_id,
         CAST(floor(
           (val - dq) * (val - dq) * 1000000000000.0 + 0.5) AS BIGINT) AS pico
  FROM (
    SELECT vec_id, val,
           mn + floor((val - mn) * 255.0 / (mx - mn) + 0.5)
                * (mx - mn) / 255.0 AS dq
    FROM e JOIN s USING (dim))
)
SELECT vec_id, CAST(sum(pico) AS DOUBLE) / 64.0 / 1000000000000.0 AS mse
FROM q GROUP BY vec_id
"""


def orders_by_month(sf_dir: str) -> "rd.Dataset":
    ds = _rpc(f"{sf_dir}/orders.parquet", columns=["o_orderdate", "o_totalprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        month = df["o_orderdate"].values.astype("datetime64[M]").astype("datetime64[us]")
        g = (
            pd.DataFrame({"month": month, "_p": _qround(df["o_totalprice"], 2).to_numpy()})
            .groupby("month", sort=False)
            .agg(_n=("_p", "size"), _sum=("_p", "sum"))
        )
        return g.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("month", sort=False).agg(n=("_n", "sum"), _t=("_sum", "sum")).reset_index()
        return g.assign(n=g["n"].astype("int64"), total=_qround(g["_t"], 2)).drop(columns=["_t"])

    return _final_agg(partials, finalize)


_SQL_ORDERS_BY_MONTH = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       count(*) AS n, floor((sum(floor((o_totalprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS total
FROM orders GROUP BY 1
"""


def part_type_stats(sf_dir: str) -> "rd.Dataset":
    ds = _rpc(f"{sf_dir}/part.parquet", columns=["p_type", "p_retailprice"])
    partials = ds.map_batches(
        # grid discipline (CLAUDE.md rule 4): quantize each term before the
        # partial sum so summation order can never tie-flip vs the oracle
        lambda df: df.assign(_p=_qround(df["p_retailprice"], 2))
        .groupby("p_type", sort=False)
        .agg(_n=("_p", "size"), _sum=("_p", "sum"), _max=("_p", "max"))
        .reset_index(),
        batch_format="pandas",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("p_type", sort=False).agg(
            n=("_n", "sum"), _sum=("_sum", "sum"), _max=("_max", "max")
        ).reset_index()
        return g.assign(
            n=g["n"].astype("int64"),
            avg_price=_qround(_qround(g["_sum"], 2) / g["n"], 4),
            max_price=_qround(g["_max"], 2),
        ).drop(columns=["_sum", "_max"])

    return _final_agg(partials, finalize)


_SQL_PART_STATS = """
SELECT p_type, count(*) AS n,
       floor(((floor((sum(floor((p_retailprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100) / count(*)) * 10000 + 0.5) / 10000 AS avg_price,
       floor((max(floor((p_retailprice) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS max_price
FROM part GROUP BY p_type
"""


def supplier_balance_by_nation(sf_dir: str) -> "rd.Dataset":
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_name"])
    dim_ref = put_dim(nation)
    ds = _rpc(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"])
    joined = ds.map_batches(
        BroadcastJoiner,
        fn_constructor_kwargs=dict(dim_ref=dim_ref, key="s_nationkey", dim_key="n_nationkey",
                                   value_cols=["n_name"]),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )
    joined = joined.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("s_acctbal"), "s_acctbal",
            pa.array(_qround(t["s_acctbal"].to_numpy(zero_copy_only=False), 2)),
        ),
        batch_format="pyarrow",
    )
    partials = joined.map_batches(
        lambda df: df.groupby("n_name", sort=False).agg(
            _b=("s_acctbal", "sum"), _n=("s_acctbal", "size")
        ).reset_index(),
        batch_format="pandas",
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("n_name", sort=False).agg(_b=("_b", "sum"), n=("_n", "sum")).reset_index()
        return g.assign(total_bal=_qround(g["_b"], 2), n=g["n"].astype("int64")).drop(columns=["_b"])

    return _final_agg(partials, finalize)


_SQL_SUPPLIER_BAL = """
SELECT n_name, floor((sum(floor((s_acctbal) * 100 + 0.5) / 100)) * 100 + 0.5) / 100 AS total_bal, count(*) AS n
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


def lineitem_distinct_suppliers(sf_dir: str) -> pa.Table:
    ds = _rpc(f"{sf_dir}/lineitem.parquet", columns=["l_suppkey"])
    n = len(ds.unique("l_suppkey"))
    return pa.table({"n_suppliers": pa.array([n], type=pa.int64())})


_SQL_DISTINCT_SUPP = """
SELECT count(DISTINCT l_suppkey) AS n_suppliers FROM lineitem
"""


# ===========================================================================
# Documents / text analysis


def doc_tfidf_topterms(sf_dir: str) -> "rd.Dataset":
    """TF-IDF feature extraction: each document's top-3 terms by
    tf x N / df (a RATIONAL idf — log-free, so the score is one double
    multiply + divide over exact integers and both engines compute the
    identical IEEE value; ordering ties break on token).

    Scale shape: tokenize + per-doc term counts in one vectorized
    map_batches pass (docs never straddle batches, so per-batch tf IS
    final tf), materialized ONCE and consumed by both branches —
    document frequencies via coarse token-hash partitions (vocabulary
    stays a Dataset, never a driver broadcast: the rarest-first df_join
    discipline of dedup_ngram_jaccard), joined back onto the term
    stream by token with the task-based hash join, then one coarse
    doc-hash sweep ranks terms per document."""
    from ..stages.join import hash_join
    from ..stages.unpivot import unpivot_list

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def tf_batch(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        toks = pc.split_pattern(t["text"], pattern=" ")
        long = unpivot_list(pa.table({"doc_id": t["doc_id"], "token": toks}),
                            "token")
        g = (
            long.select(["doc_id", "token_item"])
            .rename_columns(["doc_id", "token"]).to_pandas()
            .groupby(["doc_id", "token"], sort=False)
            .size().rename("tf").reset_index()
        )
        # strip pandas metadata: a schema carrying a dict is unhashable and
        # defeats Ray's schema-dedup early exit (functions/rayutil.py)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    # (doc_id, token, tf) is O(distinct terms per doc), far smaller than
    # the text; materializing it lets the tf and df branches share one
    # tokenization pass instead of re-executing it
    tf_mat = ds.map_batches(tf_batch, batch_format="pyarrow").materialize()

    def add_tpart(t: pa.Table) -> pa.Table:
        fp = fingerprint_column(t["token"]).to_numpy(zero_copy_only=False)
        return t.append_column("tpart", pa.array((fp % 64).astype(np.int64)))

    df_ds = (
        tf_mat.map_batches(add_tpart, batch_format="pyarrow", batch_size=65536)
        .groupby("tpart")
        .map_groups(
            lambda d: d.groupby("token", sort=False).size().rename("df")
            .reset_index(),
            batch_format="pandas",
        )
    )

    joined = hash_join(
        tf_mat, df_ds, on="token",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )

    def add_dpart(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("dpart", pa.array((k % 64).astype(np.int64)))

    def score_topk(d: pd.DataFrame) -> pd.DataFrame:
        d = d.drop(columns=["dpart"])
        d = d.assign(
            score_raw=d["tf"].astype("float64") * float(n_docs)
            / d["df"].astype("float64")
        )
        d = d.sort_values(["doc_id", "score_raw", "token"],
                          ascending=[True, False, True], kind="mergesort")
        d = d.groupby("doc_id", sort=False).head(3)
        return pd.DataFrame(
            {
                "doc_id": d["doc_id"],
                "rnk": d.groupby("doc_id", sort=False).cumcount() + 1,
                "token": d["token"],
                "score": _qround(d["score_raw"], 4),
            }
        )

    parted = joined.map_batches(add_dpart, batch_format="pyarrow",
                                batch_size=65536)
    return parted.groupby("dpart").map_groups(score_topk, batch_format="pandas")


_SQL_TFIDF = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, count(DISTINCT doc_id) AS df FROM tok GROUP BY token
), scored AS (
  SELECT tf.doc_id, tf.token,
         CAST(tf.tf AS DOUBLE) * (SELECT count(*) FROM documents) / df.df AS score_raw
  FROM tf JOIN df USING (token)
), r AS (
  SELECT doc_id, token, score_raw,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_raw DESC, token) AS rnk
  FROM scored
)
SELECT doc_id, CAST(rnk AS BIGINT) AS rnk, token,
       floor((score_raw) * 10000 + 0.5) / 10000 AS score
FROM r WHERE rnk <= 3
"""


def doc_bigram_fluency(sf_dir: str) -> "rd.Dataset":
    """Statistical-LM quality scoring: train a bigram model ON the
    corpus (maximum-likelihood transition probabilities), then score
    every document by its mean transition probability — the classic
    model-based fluency filter of large-scale pretraining pipelines,
    implemented log-free so the doubles are mirror-exact in SQL
    (p = c(w1,w2)/c(w1) over exact integer counts, quantized to the
    1e-9 grid per CLAUDE.md rule 4; per-doc mean re-quantized at 1e-6).

    Scale shape (the doc_tfidf_topterms discipline end-to-end): ONE
    vectorized offset-masked bigram sweep per batch compresses
    instances to (doc_id, bigram, k) partials, materialized once and
    shared by the model and scoring branches; bigram counts and
    context counts reduce inside coarse fingerprint-hash partitions
    (the model stays a DATASET, never a driver broadcast — at 100 TB
    the bigram table is itself huge); probabilities attach back to the
    instance stream via two task-based hash joins; one coarse doc-hash
    sweep emits the means.  No stage ever materializes the corpus or
    the model on the driver."""
    from ..stages.join import hash_join

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    SEP = "\x1f"

    def inst_batch(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        toks = pc.split_pattern(t["text"], pattern=" ").combine_chunks()
        off = toks.offsets.to_numpy().astype(np.int64)
        base = off[0]
        flat = toks.values
        n_tok = np.diff(off)
        # w1 positions: every token index except each doc's last
        valid = np.ones(int(off[-1] - base), dtype=bool)
        last = off[1:] - 1 - base
        valid[last[n_tok > 0]] = False
        i1 = np.nonzero(valid)[0] + base
        w1 = flat.take(pa.array(i1))
        w2 = flat.take(pa.array(i1 + 1))
        doc_rep = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False),
            np.maximum(n_tok - 1, 0),
        )
        big = pc.binary_join_element_wise(w1, SEP, w2)
        g = (
            pd.DataFrame({
                "doc_id": doc_rep,
                "w1": w1.to_pandas(),
                "big": big.to_pandas(),
            })
            .groupby(["doc_id", "w1", "big"], sort=False)
            .size().rename("k").reset_index()
        )
        # explicit schema: a batch of only <2-token docs yields an empty
        # frame whose pandas->Arrow dtypes would be null-typed and break
        # the union's schema
        return pa.table({
            "doc_id": pa.array(g["doc_id"].to_numpy(np.int64, copy=False),
                               type=pa.int64()),
            "w1": pa.array(g["w1"], type=pa.string()),
            "big": pa.array(g["big"], type=pa.string()),
            "k": pa.array(g["k"].to_numpy(np.int64, copy=False),
                          type=pa.int64()),
        })

    inst = ds.map_batches(inst_batch, batch_format="pyarrow").materialize()

    def add_wpart(t: pa.Table) -> pa.Table:
        fp = fingerprint_column(t["w1"]).to_numpy(zero_copy_only=False)
        return t.append_column("wpart", pa.array((fp % 64).astype(np.int64)))

    # model in ONE sweep: bucket instance partials by fingerprint(w1) —
    # every bigram of a context word shares the bucket, so c(w1,w2) AND
    # its denominator c(w1) both finalize locally and the probability
    # emits without any model-side join (the previous shape paid a
    # second bucketing pass over the bigram table plus a bc⨝cc hash
    # join for exactly this division)
    def bucket_probs(d: pd.DataFrame) -> pd.DataFrame:
        g = (d.groupby(["w1", "big"], sort=False)["k"].sum()
             .rename("c").reset_index())
        n = g.groupby("w1", sort=False)["c"].transform("sum")
        p = np.floor(
            (g["c"].to_numpy().astype(np.float64) * 1.0
             / n.to_numpy().astype(np.float64)) * 1e9 + 0.5) / 1e9
        return pd.DataFrame({"big": g["big"], "p": p})

    probs = (
        inst.map_batches(add_wpart, batch_format="pyarrow", batch_size=65536)
        .groupby("wpart")
        .map_groups(bucket_probs, batch_format="pandas")
    )

    scored = hash_join(
        inst.map_batches(lambda t: t.select(["doc_id", "big", "k"]),
                         batch_format="pyarrow"),
        probs, on="big",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("big", pa.string()), ("k", pa.int64())]
        ),
        right_schema=pa.schema([("big", pa.string()), ("p", pa.float64())]),
    )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        term = df["k"].astype("float64") * df["p"]
        g = pd.DataFrame({"doc_id": df["doc_id"], "term": term, "k": df["k"]})
        agg = g.groupby("doc_id", sort=False).agg(
            s=("term", "sum"), n_bigrams=("k", "sum")
        ).reset_index()
        return pd.DataFrame({
            "doc_id": agg["doc_id"].astype("int64"),
            "n_bigrams": agg["n_bigrams"].astype("int64"),
            "fluency": _qround(agg["s"] / agg["n_bigrams"].astype("float64"), 6),
        })

    return _coarse_final(scored, "doc_id", final)


_SQL_BIGRAM_FLUENCY = """
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos
  FROM documents
), bg AS (
  SELECT doc_id, w AS w1, lead(w) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
  FROM toks
  QUALIFY w2 IS NOT NULL
), dk AS (
  SELECT doc_id, w1, w2, CAST(count(*) AS BIGINT) AS k FROM bg GROUP BY 1, 2, 3
), bc AS (
  SELECT w1, w2, CAST(sum(k) AS BIGINT) AS c FROM dk GROUP BY 1, 2
), cc AS (
  SELECT w1, CAST(sum(c) AS BIGINT) AS n FROM bc GROUP BY 1
), p AS (
  SELECT bc.w1, bc.w2,
         floor((CAST(bc.c AS DOUBLE) * 1.0 / CAST(cc.n AS DOUBLE)) * 1000000000 + 0.5)
           / 1000000000 AS p
  FROM bc JOIN cc USING (w1)
), terms AS (
  SELECT dk.doc_id, CAST(dk.k AS DOUBLE) * p.p AS term, dk.k
  FROM dk JOIN p ON dk.w1 = p.w1 AND dk.w2 = p.w2
)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_bigrams,
       floor((sum(term) / CAST(sum(k) AS DOUBLE)) * 1000000 + 0.5) / 1000000 AS fluency
FROM terms GROUP BY doc_id
"""


def doc_pmi_collocations(sf_dir: str) -> "rd.Dataset":
    """Top-20 collocations by pointwise mutual information over
    document co-occurrence — the association-strength upgrade of
    doc_token_cooccurrence (raw counts rank stopword pairs first; PMI
    ranks genuinely associated pairs).  Log-free: the PMI ordering is
    monotone in the lift ratio p(a,b)/(p(a)p(b)) = n_ab*N/(n_a*n_b),
    an exact rational of int64 counts, so both engines quantize the
    SAME double (identical operand tree) and ties break lexically.

    Scale shape: pair counts reuse the cooccurrence topology (per-doc
    distinct pairs -> per-batch partials -> coarse pair-hash buckets);
    a min-count gate (n_ab >= 4) prunes the long tail BEFORE any join;
    per-token document frequencies reduce in coarse token-hash buckets
    and stay a Dataset; frequencies attach to the surviving pairs via
    two task-based hash joins (string keys); N is the one legitimate
    driver scalar (a single int64).  Top-20 = per-bucket local top-k
    (a pair lives in one bucket) + bounded final merge."""
    from ..stages.join import hash_join

    K, MINC = 20, 4
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def pair_partial(t: pa.Table) -> pa.Table:
        tok_a, tok_b, n_ab = _doc_distinct_pairs(t)
        a = pa.array(tok_a, type=pa.string())
        b = pa.array(tok_b, type=pa.string())
        key = fingerprint_column(
            pc.binary_join_element_wise(a, b, "\x00")
        ).to_numpy(zero_copy_only=False).view(np.uint64)
        return pa.table({
            "tok_a": a, "tok_b": b, "n_ab": pa.array(n_ab),
            "ppart": pa.array((key % np.uint64(64)).astype(np.int64)),
        })

    pairs = (
        ds.map_batches(pair_partial, batch_format="pyarrow")
        .groupby("ppart")
        .map_groups(
            lambda d: (lambda g: g[g["n_ab"] >= MINC])(
                d.groupby(["tok_a", "tok_b"], sort=False)["n_ab"]
                .sum().reset_index()),
            batch_format="pandas",
        )
    )

    def df_partial(t: pa.Table) -> pa.Table:
        _, c, uarr = _doc_token_codes(t)
        code, n = np.unique(c, return_counts=True)
        tok = pa.array(uarr[code], type=pa.string())
        fp = fingerprint_column(tok).to_numpy(
            zero_copy_only=False).view(np.uint64)
        return pa.table({
            "tok": tok,
            "n": pa.array(n.astype(np.int64)),
            "tpart": pa.array((fp % np.uint64(64)).astype(np.int64)),
        })

    tok_df = (
        ds.map_batches(df_partial, batch_format="pyarrow")
        .groupby("tpart")
        .map_groups(
            lambda d: d.groupby("tok", sort=False)["n"].sum().reset_index(),
            batch_format="pandas",
        )
    )
    # corpus size from the parquet footer — zero-compute exact scalar
    # (mirrors SQL count(*); a metadata read, not a pipeline pass)
    n_docs = float(pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows)

    # one-pass frequency attach (the _attach_pair_payload shape, string
    # keys): each pair expands to two token-keyed rows carrying a pair
    # fingerprint + the partner string; ONE hash join ships tok_df
    # across the exchange ONCE (the two-chained-joins shape shipped the
    # corpus vocabulary twice); a coarse pair-fingerprint bucket then
    # re-zips, scores and local-top-ks in a single sweep.  The re-zip
    # merges on the 64-bit fingerprint with an EXACT string guard
    # (tok==other crosswise), so a 2^-64 collision produces no wrong
    # pair — only two extra filtered rows.
    df_schema = pa.schema([("tok", pa.string()), ("n", pa.int64())])

    def expand(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        pk = fingerprint_column(
            pc.binary_join_element_wise(t["tok_a"], t["tok_b"], "\x00")
        )  # already int64
        zeros = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        ones = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.concat_tables([
            pa.table({"pk": pk, "tok": t["tok_a"], "other": t["tok_b"],
                      "n_ab": t["n_ab"], "side": zeros}),
            pa.table({"pk": pk, "tok": t["tok_b"], "other": t["tok_a"],
                      "n_ab": t["n_ab"], "side": ones}),
        ])

    exp_schema = pa.schema([
        ("pk", pa.int64()), ("tok", pa.string()), ("other", pa.string()),
        ("n_ab", pa.int64()), ("side", pa.int8()),
    ])
    joined = hash_join(
        pairs.map_batches(expand, batch_format="pyarrow"), tok_df,
        on="tok", left_schema=exp_schema, right_schema=df_schema,
    )

    def add_zpart(t: pa.Table) -> pa.Table:
        k = t["pk"].to_numpy(zero_copy_only=False)
        return t.append_column("zpart", pa.array(((k % 64) + 64) % 64))

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return df.sort_values(
            ["pmi_lift", "tok_a", "tok_b"], ascending=[False, True, True],
            kind="mergesort",
        ).head(K)

    def zip_score_topk(df: pd.DataFrame) -> pd.DataFrame:
        a = df[df["side"] == 0]
        b = df[df["side"] == 1]
        m = a.merge(b, on="pk", suffixes=("_a", "_b"))
        m = m[(m["tok_a"] == m["other_b"]) & (m["tok_b"] == m["other_a"])]
        lift = np.floor(
            (m["n_ab_a"].to_numpy().astype(np.float64) * n_docs)
            / (m["n_a"].to_numpy().astype(np.float64)
               * m["n_b"].to_numpy().astype(np.float64)) * 1e6 + 0.5
        ) / 1e6
        out = pd.DataFrame({
            "tok_a": m["tok_a"].to_numpy(),
            "tok_b": m["tok_b"].to_numpy(),
            "n_ab": m["n_ab_a"].to_numpy(),
            "pmi_lift": lift,
        })
        return topk(out)

    buckets = (
        joined.map_batches(add_zpart, batch_format="pyarrow",
                           batch_size=65536)
        .groupby("zpart")
        .map_groups(lambda d: zip_score_topk(d.drop(columns=["zpart"])),
                    batch_format="pandas")
    )
    return _final_agg(buckets, topk)


_SQL_PMI_COLLOCATIONS = """
WITH dt AS (
  SELECT DISTINCT doc_id, t.tok
  FROM documents, LATERAL unnest(string_split(text, ' ')) AS t(tok)
), p AS (
  SELECT a.tok AS tok_a, b.tok AS tok_b, CAST(count(*) AS BIGINT) AS n_ab
  FROM dt a JOIN dt b ON a.doc_id = b.doc_id AND a.tok < b.tok
  GROUP BY 1, 2 HAVING count(*) >= 4
), tc AS (
  SELECT tok, CAST(count(*) AS BIGINT) AS n FROM dt GROUP BY tok
), nd AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents
)
SELECT tok_a, tok_b, n_ab,
       floor(((CAST(n_ab AS DOUBLE) * n_docs)
              / (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE))) * 1000000 + 0.5)
         / 1000000 AS pmi_lift
FROM p JOIN tc a ON tok_a = a.tok JOIN tc b ON tok_b = b.tok, nd
ORDER BY pmi_lift DESC, tok_a, tok_b
LIMIT 20
"""


def doc_winnow_fingerprints(sf_dir: str) -> "rd.Dataset":
    """Robust winnowing (the MOSS document-fingerprint selection,
    Schleimer et al. 2003): slide a window of W consecutive token
    4-grams over each document and keep each window's MINIMUM gram; the
    distinct selected grams are the document's fingerprint sketch, with
    the winnowing guarantee that any match of >= W+3 consecutive tokens
    between two documents shares a fingerprint.  Selection happens on
    the gram STRING's lexicographic order — identically computable in
    both engines, so the oracle is exact (no hash-order divergence).

    Scale shape: zero shuffles — grams, the W-way vectorized
    elementwise-min sweep (W-1 Arrow min_element_wise passes over
    shifted gram columns, never a Python loop over rows), and the
    per-doc distinct count all stay inside the row's batch; the output
    is one row per document."""
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_winnow_batch, batch_format="pyarrow")


def _winnow_batch(t: pa.Table, W: int = 4, N: int = 4) -> pd.DataFrame:
    """Batch kernel of doc_winnow_fingerprints (module-level so the
    property suite can pin it against a per-doc Python reference)."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    toks = pc.split_pattern(t["text"], pattern=" ").combine_chunks()
    off = toks.offsets.to_numpy().astype(np.int64)
    base = off[0]
    flat = toks.values
    n_tok = np.diff(off)
    n_gram = np.maximum(n_tok - (N - 1), 0)
    # gram i of doc d = tokens[i .. i+N-1]; valid starts exclude the
    # last N-1 positions of each doc
    total = int(off[-1] - base)
    valid = np.ones(total, dtype=bool)
    for k in range(1, N):
        end = off[1:] - k - base
        valid[end[n_tok >= k]] = False
    i0 = np.nonzero(valid)[0] + base
    parts = [flat.take(pa.array(i0 + k)) for k in range(N)]
    # last arg is the SEPARATOR (Arrow binary_join_element_wise
    # signature) — produces "t0 t1 t2 t3", byte-identical to the
    # SQL mirror's `token || ' ' || ...`
    grams = pc.binary_join_element_wise(*parts, " ")
    # window min over W consecutive grams WITHIN each doc: shift and
    # elementwise-min; windows are gram starts 0 .. n_gram-W per doc
    n_win = np.maximum(n_gram - (W - 1), 0)
    goff = np.concatenate(([0], np.cumsum(n_gram)))
    wvalid = np.ones(int(goff[-1]), dtype=bool)
    for k in range(1, W):
        end = goff[1:] - k
        wvalid[end[n_gram >= k]] = False
    j0 = np.nonzero(wvalid)[0]
    m = grams.take(pa.array(j0))
    for k in range(1, W):
        m = pc.min_element_wise(m, grams.take(pa.array(j0 + k)))
    doc_rep = np.repeat(t["doc_id"].to_numpy(zero_copy_only=False), n_win)
    sel = pd.DataFrame({"doc_id": doc_rep,
                        "fp": m.to_pandas().to_numpy()}).drop_duplicates()
    g = sel.groupby("doc_id", sort=False).size().rename(
        "n_fingerprints").reset_index()
    out = pd.DataFrame({"doc_id": t["doc_id"].to_numpy(
        zero_copy_only=False), "n_windows": n_win.astype(np.int64)})
    out = out.merge(g, on="doc_id", how="left")
    out["n_fingerprints"] = out["n_fingerprints"].fillna(0).astype("int64")
    return out



_SQL_WINNOW = """
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos
  FROM documents
), gr AS (
  SELECT doc_id, pos,
         token || ' ' || lead(token, 1) OVER w || ' ' || lead(token, 2) OVER w
               || ' ' || lead(token, 3) OVER w AS gram
  FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(token, 3) OVER w IS NOT NULL
), wm AS (
  SELECT doc_id, pos,
         min(gram) OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS fp,
         count(*) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS span
  FROM gr
), sel AS (
  SELECT doc_id, fp FROM wm WHERE span = 4
)
SELECT d.doc_id,
       CAST(coalesce(w.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(coalesce(f.n_fingerprints, 0) AS BIGINT) AS n_fingerprints
FROM documents d
LEFT JOIN (SELECT doc_id, count(*) AS n_windows FROM sel GROUP BY doc_id) w
  ON d.doc_id = w.doc_id
LEFT JOIN (SELECT doc_id, count(DISTINCT fp) AS n_fingerprints
           FROM sel GROUP BY doc_id) f
  ON d.doc_id = f.doc_id
"""


def cdc_hopping_window(sf_dir: str) -> "rd.Dataset":
    """Hopping (sliding) window aggregate — 1-hour windows every 15
    minutes, so each event contributes to exactly 4 overlapping
    windows: the streaming-analytics counterpart of cdc_tumbling_window
    (tumbling = hop == size).  Window replication is pure vectorized
    index arithmetic (np.repeat + tiled hop offsets), the per-window
    partials shrink each batch to (window, n, cents) before the only
    shuffle, and window starts hash into coarse buckets (windows are
    unbounded over event time — never a driver-bounded final).  Value
    sums ride the exact integer-cent grid."""
    HOP_US = 15 * 60 * 1_000_000
    K = 4  # size / hop
    ds = _events(sf_dir, ["ts", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ts = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").view(np.int64)
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        bucket = (ts // HOP_US) * HOP_US
        ws = np.repeat(bucket, K) - np.tile(
            np.arange(K, dtype=np.int64) * HOP_US, len(ts))
        d = pd.DataFrame({"w_start": ws, "_c": np.repeat(cents, K)})
        g = d.groupby("w_start", sort=False)["_c"].agg(["size", "sum"])
        return g.rename(columns={"size": "_n", "sum": "_s"}).reset_index()

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("w_start", sort=False).agg(
            n_events=("_n", "sum"), _s=("_s", "sum")).reset_index()
        return pd.DataFrame({
            # datetime64[us] to the byte: pd.to_datetime would yield ns,
            # which diverges from the oracle's timestamp[us] under a
            # unit-sensitive value hash (caught by the sf0.01 mirror r4)
            "w_start": g["w_start"].to_numpy().astype("datetime64[us]"),
            "n_events": g["n_events"].astype("int64"),
            "sum_value": g["_s"].to_numpy().astype(np.float64) / 100.0,
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _coarse_final(partials, "w_start", final)


_SQL_HOPPING_WINDOW = """
WITH r AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts)
           - k.k * INTERVAL '15 minutes' AS w_start,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
  FROM events, LATERAL unnest(generate_series(0, 3)) AS k(k)
)
SELECT w_start, CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS sum_value
FROM r GROUP BY w_start
"""


def user_active_streak(sf_dir: str) -> "rd.Dataset":
    """Gaps-and-islands: each user's LONGEST run of consecutive active
    calendar days (plus total active days) — the classic engagement /
    retention window shape that needs per-key ordered reasoning, not
    just an aggregate.

    Scale shape: per-batch distinct (user, day) compresses the event
    stream to at most #users x #days rows BEFORE any exchange; one
    coarse user-hash shuffle then one vectorized sweep per bucket
    (cross-batch re-distinct -> single sort -> day_num minus per-user
    rank is constant within a run -> groupby(run).size -> max/sum per
    user).  Runs never span buckets because a user never does."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def days_partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        day = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        g = pd.DataFrame({
            "user_id": t["user_id"].to_numpy(zero_copy_only=False),
            "day_num": day.astype(np.int64),
        }).drop_duplicates()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def final(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates().sort_values(["user_id", "day_num"],
                                             kind="mergesort")
        u = d["user_id"].to_numpy()
        dn = d["day_num"].to_numpy()
        new_run = np.ones(len(d), dtype=bool)
        if len(d) > 1:
            new_run[1:] = (u[1:] != u[:-1]) | (dn[1:] != dn[:-1] + 1)
        run_id = np.cumsum(new_run)
        runs = pd.DataFrame({"user_id": u, "run": run_id}).groupby(
            ["user_id", "run"], sort=False
        ).size().rename("len").reset_index()
        agg = runs.groupby("user_id", sort=False)["len"].agg(
            ["max", "sum"]
        ).reset_index()
        return pd.DataFrame({
            "user_id": agg["user_id"].astype("int64"),
            "longest_streak": agg["max"].astype("int64"),
            "n_active_days": agg["sum"].astype("int64"),
        })

    partials = ds.map_batches(days_partial, batch_format="pyarrow")
    return _coarse_final(partials, "user_id", final)


_SQL_ACTIVE_STREAK = """
WITH d AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
), r AS (
  SELECT user_id, day,
         day - CAST(row_number() OVER (PARTITION BY user_id ORDER BY day)
                    AS INTEGER) AS grp
  FROM d
), runs AS (
  SELECT user_id, grp, count(*) AS len FROM r GROUP BY 1, 2
)
SELECT user_id,
       CAST(max(len) AS BIGINT) AS longest_streak,
       CAST(sum(len) AS BIGINT) AS n_active_days
FROM runs GROUP BY user_id
"""


def lineitem_bloom_semi_join(sf_dir: str) -> "rd.Dataset":
    """Semi join with Bloom pre-pruning (stages/bloom.py): revenue of
    lineitems whose order is 1-URGENT.  The Bloom filter over the
    filtered orders keys is built distributed and broadcast once; the
    fact stream drops definitely-non-matching rows BEFORE the join
    shuffle (no false negatives -> the exact semi join downstream makes
    false positives invisible).  ~80% of the fact stream never enters
    the exchange — the bloom_kept/bloom_pruned counters make the
    pruning power observable (asserted in tests)."""
    from ..stages.bloom import bloom_prune, build_bloom

    orders = _rpc(f"{sf_dir}/orders.parquet",
                  columns=["o_orderkey", "o_orderpriority"]).map_batches(
        lambda t: t.filter(pc.equal(t["o_orderpriority"], "1-URGENT"))
        .select(["o_orderkey"]),
        batch_format="pyarrow",
    )
    bloom_ref = build_bloom(orders, "o_orderkey", n_bits=1 << 20, k=5)

    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )
    pruned = bloom_prune(li, "l_orderkey", bloom_ref)
    matched = hash_join(
        pruned,
        orders,
        on="l_orderkey",
        right_on="o_orderkey",
        how="semi",
        left_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("l_extendedprice", pa.float64()),
             ("l_discount", pa.float64()), ("l_returnflag", pa.string())]
        ),
        right_schema=pa.schema([("o_orderkey", pa.int64())]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rev = _qround(df["l_extendedprice"] * (1.0 - df["l_discount"]), 2)
        return (
            df.assign(_r=rev).groupby("l_returnflag", sort=False)
            .agg(_n=("_r", "size"), _s=("_r", "sum")).reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", sort=False).agg(
            n=("_n", "sum"), _s=("_s", "sum")
        ).reset_index()
        return g.assign(n=g["n"].astype("int64"),
                        revenue=_qround(g["_s"], 2)).drop(columns=["_s"])

    return _final_agg(matched.map_batches(partial, batch_format="pandas"),
                      finalize)


_SQL_BLOOM_SEMI = f"""
SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
       {_sql_q("sum(floor((l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100)", 2)} AS revenue
FROM lineitem
WHERE l_orderkey IN (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


def doc_token_stats(sf_dir: str) -> "rd.Dataset":
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        text = t["text"]
        n_tok = token_count_column(text)
        n_chars = char_count_column(text)
        n_punct = punct_count_column(text)
        raw = pc.add(
            pc.multiply(
                pc.divide(n_tok.cast(pa.float64()), n_chars.cast(pa.float64())), 100.0
            ),
            n_punct.cast(pa.float64()),
        )
        score = pa.array(_qround(raw.to_numpy(zero_copy_only=False), 4))
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": n_tok,
                "n_chars": n_chars,
                "n_punct": n_punct,
                "quality_score": score,
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def events_asof_join(sf_dir: str) -> "rd.Dataset":
    """Temporal as-of join (stages/asof.py): every purchase event picks
    up the latest click of the SAME user at or before its timestamp —
    the attribution shape.  The right side is pre-deduplicated to one
    row per (user_id, ts) (max value) so both engines are deterministic;
    oracle = DuckDB's native ASOF LEFT JOIN."""
    from ..stages.asof import asof_join

    ev_cols = ["event_id", "user_id", "ts", "event_type", "value"]
    purchases = _events(sf_dir, ev_cols).map_batches(
        lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
            ["event_id", "user_id", "ts"]
        ),
        batch_format="pyarrow",
    )

    def click_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "click"]
        df = df.assign(click_value=_qround(df["value"], 2))
        return df.groupby(["user_id", "ts"], sort=False)["click_value"].max().reset_index()

    clicks = _coarse_final(
        _events(sf_dir, ["user_id", "ts", "event_type", "value"]).map_batches(
            click_partial, batch_format="pandas"
        ),
        "user_id",
        lambda df: df.groupby(["user_id", "ts"], sort=False)["click_value"]
        .max()
        .reset_index(),
    )
    ev_schema = _pq_cols_schema(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = asof_join(
        purchases, clicks, on="ts", by="user_id",
        left_schema=ev_schema,
        right_schema=pa.schema(
            [("user_id", ev_schema.field("user_id").type),
             ("ts", ev_schema.field("ts").type),
             ("click_value", pa.float64())]
        ),
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            [("click_ts" if c == "ts_r" else c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


_SQL_ASOF_JOIN = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, max(floor(value * 100 + 0.5) / 100) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts
)
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts, c.click_value
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


def events_asof_forward(sf_dir: str) -> "rd.Dataset":
    """FORWARD as-of join (the other direction of stages/asof.py —
    time-to-convert attribution): every click picks up the EARLIEST
    purchase of the same user at or after its timestamp.  Same
    per-(user, ts) right-side dedup discipline as the backward entry;
    oracle = DuckDB's native ASOF LEFT JOIN with the inequality
    flipped."""
    from ..stages.asof import asof_join

    clicks = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "click")).select(
                ["event_id", "user_id", "ts"]
            ),
            batch_format="pyarrow",
        )

    def purchase_partial(df: pd.DataFrame) -> pd.DataFrame:
        df = df[df["event_type"] == "purchase"]
        df = df.assign(purchase_value=_qround(df["value"], 2))
        return df.groupby(["user_id", "ts"], sort=False)["purchase_value"] \
            .max().reset_index()

    purchases = _coarse_final(
        _events(sf_dir, ["user_id", "ts", "event_type", "value"]).map_batches(
            purchase_partial, batch_format="pandas"
        ),
        "user_id",
        lambda df: df.groupby(["user_id", "ts"], sort=False)["purchase_value"]
        .max()
        .reset_index(),
    )
    ev_schema = _pq_cols_schema(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = asof_join(
        clicks, purchases, on="ts", by="user_id", direction="forward",
        left_schema=ev_schema,
        right_schema=pa.schema(
            [("user_id", ev_schema.field("user_id").type),
             ("ts", ev_schema.field("ts").type),
             ("purchase_value", pa.float64())]
        ),
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            [("purchase_ts" if c == "ts_r" else c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


_SQL_ASOF_FORWARD = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purchases AS (
  SELECT user_id, ts, max(floor(value * 100 + 0.5) / 100) AS purchase_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, c.ts, p.ts AS purchase_ts, p.purchase_value
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
"""


def events_interval_join(sf_dir: str) -> "rd.Dataset":
    """Windowed (Flink-style interval) event-time join
    (stages/intervaljoin.py): every purchase paired with ALL clicks of
    the same user inside the preceding hour, bounds inclusive — the
    many-to-many conversion-window shape the as-of join (latest-only)
    can't express.  One co-group shuffle; per-partition matching is a
    rank-composite double searchsorted + grouped arange (no per-key
    Python, no expand-then-filter cross product).  Oracle = the plain
    BETWEEN join."""
    from ..stages.intervaljoin import interval_event_join

    purchases = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
                ["event_id", "user_id", "ts"]
            ),
            batch_format="pyarrow",
        )

    def click_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        cents = pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5))
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"],
            "click_event_id": t["event_id"],
            "click_value": pc.divide(cents, 100.0),
        })

    clicks = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                              "value"]).map_batches(
        click_prep, batch_format="pyarrow")
    ev_schema = _pq_cols_schema(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = interval_event_join(
        purchases, clicks, on="ts", by="user_id",
        lower=np.timedelta64(-3600, "s"), upper=np.timedelta64(0, "s"),
        left_schema=ev_schema,
        right_schema=pa.schema(
            [("user_id", ev_schema.field("user_id").type),
             ("ts", ev_schema.field("ts").type),
             ("click_event_id", pa.int64()),
             ("click_value", pa.float64())]
        ),
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            [("click_ts" if c == "ts_r" else c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


_SQL_INTERVAL_JOIN = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, event_id AS click_event_id,
         floor(value * 100 + 0.5) / 100 AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
       c.click_event_id, c.click_value
FROM purchases p JOIN clicks c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
"""


def events_interval_join_left(sf_dir: str) -> "rd.Dataset":
    """LEFT-OUTER windowed interval join (stages/intervaljoin.py
    how='left'): every purchase paired with ALL clicks of the same user
    inside the preceding hour — AND every purchase with NO click in the
    window retained once with null click columns, the conversion-funnel
    "unattributed purchase" shape the inner variant drops.  Oracle =
    the plain BETWEEN LEFT JOIN."""
    from ..stages.intervaljoin import interval_event_join

    purchases = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"]) \
        .map_batches(
            lambda t: t.filter(pc.equal(t["event_type"], "purchase")).select(
                ["event_id", "user_id", "ts"]
            ),
            batch_format="pyarrow",
        )

    def click_prep(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["event_type"], "click"))
        cents = pc.floor(pc.add(pc.multiply(t["value"], 100.0), 0.5))
        return pa.table({
            "user_id": t["user_id"],
            "ts": t["ts"],
            "click_event_id": t["event_id"],
            "click_value": pc.divide(cents, 100.0),
        })

    clicks = _events(sf_dir, ["event_id", "user_id", "ts", "event_type",
                              "value"]).map_batches(
        click_prep, batch_format="pyarrow")
    ev_schema = _pq_cols_schema(sf_dir, "events", ["event_id", "user_id", "ts"])
    joined = interval_event_join(
        purchases, clicks, on="ts", by="user_id",
        lower=np.timedelta64(-3600, "s"), upper=np.timedelta64(0, "s"),
        how="left",
        left_schema=ev_schema,
        right_schema=pa.schema(
            [("user_id", ev_schema.field("user_id").type),
             ("ts", ev_schema.field("ts").type),
             ("click_event_id", pa.int64()),
             ("click_value", pa.float64())]
        ),
    )
    return joined.map_batches(
        lambda t: t.rename_columns(
            [("click_ts" if c == "ts_r" else c) for c in t.column_names]
        ),
        batch_format="pyarrow",
    )


_SQL_INTERVAL_JOIN_LEFT = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT user_id, ts, event_id AS click_event_id,
         floor(value * 100 + 0.5) / 100 AS click_value
  FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, p.ts, c.ts AS click_ts,
       c.click_event_id, c.click_value
FROM purchases p LEFT JOIN clicks c
  ON p.user_id = c.user_id
 AND c.ts BETWEEN p.ts - INTERVAL 1 HOUR AND p.ts
"""


def events_value_bands(sf_dir: str) -> "rd.Dataset":
    """Broadcast interval (range) join (stages/rangejoin.py): every event
    matched to the [lo, hi) value band containing it — one vectorized
    searchsorted per batch against a broadcast band table, no shuffle.
    Unmatched rows (value outside every band) are dropped (inner) —
    the 'extreme' band is deliberately open-ended short of +inf so the
    inner-join semantics are exercised."""
    from ..stages.rangejoin import interval_join

    bands = pa.table(
        {
            "band": pa.array(["low", "mid", "high"], type=pa.string()),
            "lo": pa.array([0.0, 25.0, 100.0], type=pa.float64()),
            "hi": pa.array([25.0, 100.0, 300.0], type=pa.float64()),
        }
    )
    ds = _events(sf_dir, ["event_id", "value"])
    return interval_join(ds, bands, "value").map_batches(
        lambda t: t.select(["event_id", "value", "band", "lo", "hi"]),
        batch_format="pyarrow",
    )


_SQL_VALUE_BANDS = """
WITH bands(band, lo, hi) AS (
  VALUES ('low', 0.0, 25.0), ('mid', 25.0, 100.0), ('high', 100.0, 300.0)
)
SELECT event_id, value, band, lo, hi
FROM events JOIN bands ON value >= lo AND value < hi
"""


def doc_bpe_token_stats(sf_dir: str) -> "rd.Dataset":
    """Compiled-regex BPE-ish pre-tokenizer counts next to the whitespace
    count — the token-budget operator for a pretraining pipeline.  The
    pattern is RE2-compatible so the DuckDB oracle runs the IDENTICAL
    regex (functions/text.BPE_SPLIT_PATTERN)."""
    from ..functions.text import bpe_token_count_column

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stats(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_ws_tokens": token_count_column(t["text"]),
                "n_bpe_tokens": bpe_token_count_column(t["text"]),
            }
        )

    return ds.map_batches(stats, batch_format="pyarrow")


def _sql_bpe_token_stats() -> str:
    """Oracle generated FROM the single pattern constant — a tokenizer
    edit that isn't mirrored character-for-character cannot silently
    diverge (same protection as _lang_id_oracle_sql)."""
    from ..functions.text import BPE_SPLIT_PATTERN

    pat = BPE_SPLIT_PATTERN.replace("'", "''")
    return f"""
SELECT doc_id,
       CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT) AS n_bpe_tokens
FROM documents
"""


_SQL_BPE_TOKEN_STATS = _sql_bpe_token_stats()


_SQL_DOC_TOKEN_STATS = """
SELECT doc_id,
       CAST(array_length(string_split(text, ' ')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(text) - length(replace(text, '.', '')) AS BIGINT) AS n_punct,
       floor((CAST(array_length(string_split(text, ' ')) AS DOUBLE) / length(text) * 100 + (length(text) - length(replace(text, '.', '')))) * 10000 + 0.5) / 10000 AS quality_score
FROM documents
"""


def lang_doc_stats(sf_dir: str) -> "rd.Dataset":
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def partial(t: pa.Table) -> pa.Table:
        chars = char_count_column(t["text"])
        df = pd.DataFrame({"lang": t["lang"].to_pandas(), "_c": chars.to_pandas()})
        g = df.groupby("lang", sort=False).agg(_n=("_c", "size"), _sum=("_c", "sum"))
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("lang", sort=False).agg(n_docs=("_n", "sum"), _c=("_sum", "sum")).reset_index()
        return g.assign(
            n_docs=g["n_docs"].astype("int64"), avg_chars=_qround(g["_c"] / g["n_docs"], 4)
        ).drop(columns=["_c"])

    return _final_agg(partials, finalize)


_SQL_LANG_DOC_STATS = """
SELECT lang, count(*) AS n_docs,
       floor((sum(CAST(length(text) AS DOUBLE)) / count(*)) * 10000 + 0.5) / 10000 AS avg_chars
FROM documents GROUP BY lang
"""


def doc_pii_redact(sf_dir: str) -> "rd.Dataset":
    """PII / secret scrub (stages/redact.py): docs with doc_id%5==0 get a
    deterministic injected contact line (email + IPv4 + 32-hex token) so
    the rules demonstrably fire, then every doc runs the vectorized RE2
    redaction chain.  Returns the redacted text and per-doc replacement
    count; the oracle SQL is GENERATED from the same RedactRule constants
    (nested regexp_replace / regexp_extract_all), so engine and oracle
    cannot drift."""
    from ..stages.redact import redact_batch

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def inject(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = t["doc_id"]
        idstr = pc.cast(ids, pa.string())
        suffix = pc.binary_join_element_wise(
            "contact u",
            idstr,
            "@example.com from 10.0.",
            pc.cast(pc.bit_wise_and(ids, 127), pa.string()),
            ".7 token 0123456789abcdef0123456789abcdef",
            "",
        )
        pii = pc.binary_join_element_wise(t["text"], suffix, " ")
        # doc_id % 5 == 0 without pc.mod (absent in this pyarrow)
        mask = pc.equal(pc.subtract(ids, pc.multiply(pc.divide(ids, 5), 5)), 0)
        text = pc.if_else(mask, pii, t["text"])
        return pa.table({"doc_id": ids, "text": text})

    return ds.map_batches(inject, batch_format="pyarrow").map_batches(
        redact_batch, batch_format="pyarrow"
    )


def _sql_pii_redact() -> str:
    from ..stages.redact import oracle_redact_sql

    injected = (
        "CASE WHEN doc_id % 5 = 0 THEN text || ' contact u' || CAST(doc_id AS VARCHAR)"
        " || '@example.com from 10.0.' || CAST((doc_id & 127) AS VARCHAR)"
        " || '.7 token 0123456789abcdef0123456789abcdef' ELSE text END"
    )
    red, cnt = oracle_redact_sql(injected)
    return (
        f"SELECT doc_id, {red} AS text, CAST({cnt} AS BIGINT) AS n_redactions"
        " FROM documents"
    )


def doc_content_sample(sf_dir: str) -> "rd.Dataset":
    """Deterministic content-hash sampling (the stable way to downsample
    a training corpus: the decision is keyed on sha256(text), so it is
    reproducible across runs, engines and epochs and independent of row
    order/partitioning — unlike random_shuffle/limit).  Keeps docs whose
    first sha256 hex nibble is 0 or 1 (a 1/8 sample in expectation)."""
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def keep(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        sha = sha256_hex_column(t["text"])
        nibble = pc.utf8_slice_codeunits(sha, 0, 1)
        mask = pc.is_in(nibble, value_set=pa.array(["0", "1"]))
        out = t.filter(mask)
        return pa.table({"doc_id": out["doc_id"], "lang": out["lang"]})

    return ds.map_batches(keep, batch_format="pyarrow")


_SQL_CONTENT_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE substr(sha256(text), 1, 1) IN ('0', '1')
"""


_QUOTA_K = 40


def doc_lang_quota_sample(sf_dir: str) -> "rd.Dataset":
    """Per-group quota cap (the per-domain document cap of a pretraining
    mix): keep at most K docs per lang, selected by a DETERMINISTIC
    content-hash order (sha256(text), doc_id) — reproducible across
    runs, engines, and partitioning.  Per-batch local top-K combiner
    bounds the shuffle to langs x K rows per block; the final re-merge
    is bounded-key (langs x K x blocks), so no unbounded task exists."""
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def local_topk(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        df = pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "sha": sha256_hex_column(t["text"]),
            }
        ).to_pandas()
        df = df.sort_values(["lang", "sha", "doc_id"], kind="mergesort")
        return pa.Table.from_pandas(
            df.groupby("lang", sort=False).head(_QUOTA_K), preserve_index=False
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["lang", "sha", "doc_id"], kind="mergesort")
        out = df.groupby("lang", sort=False).head(_QUOTA_K)
        return out[["doc_id", "lang"]]

    return _final_agg(ds.map_batches(local_topk, batch_format="pyarrow"), final)


_SQL_QUOTA_SAMPLE = f"""
SELECT doc_id, lang FROM documents
QUALIFY row_number() OVER (PARTITION BY lang ORDER BY sha256(text), doc_id)
        <= {_QUOTA_K}
"""


def user_top_event_type(sf_dir: str) -> "rd.Dataset":
    """Grouped MODE / argmax aggregate over an unbounded key space: each
    user's most frequent event type (ties -> lexicographically smallest
    type).  Per-batch (user, type) count partials, coarse key-hash final
    sum + one vectorized argmax sweep per bucket."""
    ds = _events(sf_dir, ["user_id", "event_type"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (
            df.groupby(["user_id", "event_type"], sort=False)
            .size()
            .rename("_n")
            .reset_index()
        )

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["user_id", "event_type"], sort=False)["_n"]
            .sum()
            .reset_index()
        )
        g = g.sort_values(
            ["user_id", "_n", "event_type"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        out = g.groupby("user_id", sort=False).head(1)
        return pd.DataFrame(
            {
                "user_id": out["user_id"],
                "top_type": out["event_type"],
                "n_events": out["_n"].astype("int64"),
            }
        )

    return _coarse_final(ds.map_batches(partial, batch_format="pandas"),
                         "user_id", final)


_SQL_TOP_EVENT_TYPE = """
WITH c AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
)
SELECT user_id, event_type AS top_type, n AS n_events FROM c
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY n DESC, event_type) = 1
"""


def doc_stratified_sample(sf_dir: str) -> "rd.Dataset":
    """Stratified (per-group-RATE) content-hash sampling — the quota
    rebalancing step of a corpus mix: 'en' keeps a 1/2 rate, every other
    lang 1/4, each decision keyed on sha256(text) so the sample is
    order/partitioning/engine independent.  Pure per-batch vectorization
    (single hex-nibble compare against a per-row threshold)."""
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def keep(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        sha = sha256_hex_column(t["text"])
        nibble = pc.utf8_slice_codeunits(sha, 0, 1)
        thr = pc.if_else(
            pc.equal(t["lang"], pa.scalar("en")), pa.scalar("8"), pa.scalar("4")
        )
        out = t.filter(pc.less(nibble, thr))
        return pa.table({"doc_id": out["doc_id"], "lang": out["lang"]})

    return ds.map_batches(keep, batch_format="pyarrow")


_SQL_STRATIFIED_SAMPLE = """
SELECT doc_id, lang FROM documents
WHERE substr(sha256(text), 1, 1) < (CASE WHEN lang = 'en' THEN '8' ELSE '4' END)
"""


def user_train_val_split(sf_dir: str) -> "rd.Dataset":
    """Leakage-safe train/val split: the split decision hashes the ENTITY
    key (user_id), so every event of one user lands on the same side —
    the grouping discipline a training pipeline needs so evaluation users
    are never seen in training.  Emits per-split event counts."""
    ds = _events(sf_dir, ["user_id"])

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        sha = sha256_hex_column(pc.cast(t["user_id"], pa.string()))
        nibble = pc.utf8_slice_codeunits(sha, 0, 1)
        is_val = pc.is_in(nibble, value_set=pa.array(["0", "1"]))
        df = pd.DataFrame({"split": np.where(is_val.to_numpy(zero_copy_only=False),
                                             "val", "train")})
        return pa.Table.from_pandas(
            df.groupby("split", sort=False).size().rename("_n").reset_index(),
            preserve_index=False,
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _final_agg(
        partials,
        lambda df: df.groupby("split", sort=False)["_n"].sum().rename("n_events")
        .reset_index().astype({"n_events": "int64"}),
    )


_SQL_TRAIN_VAL_SPLIT = """
SELECT CASE WHEN substr(sha256(CAST(user_id AS VARCHAR)), 1, 1) IN ('0', '1')
            THEN 'val' ELSE 'train' END AS split,
       count(*) AS n_events
FROM events GROUP BY 1
"""


def _docs_with_dups(sf_dir: str) -> "rd.Dataset":
    """documents ∪ re-keyed copies of doc_id<50 (deterministic exact dups)."""
    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def shift(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["doc_id"], 50))
        return pa.table(
            {"doc_id": pc.add(t["doc_id"], 100_000), "text": t["text"]}
        )

    dups = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        shift, batch_format="pyarrow"
    )
    return docs.union(dups)


def dedup_exact_docs(sf_dir: str) -> "rd.Dataset":
    """Exact dedup first-wins (D2/D3): hash-partition on content sha."""
    agg = exact_dedup_groups(_docs_with_dups(sf_dir))
    return agg.map_batches(
        lambda df: df[["keep_id", "n_dups"]].astype({"keep_id": "int64", "n_dups": "int64"}),
        batch_format="pandas",
    )


_SQL_DEDUP_EXACT = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id < 50
)
SELECT min(doc_id) AS keep_id, count(*) AS n_dups
FROM all_docs GROUP BY text
"""


def ann_cosine_topk(sf_dir: str) -> "rd.Dataset":
    """Exact brute-force cosine top-5 for query vectors vec_id<3."""
    # few query vectors: pruned driver read (row-group filter pushdown),
    # never the full embedding table
    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 3)],
    )
    q_ids = np.array(q["vec_id"].to_pylist(), dtype=np.int64)
    q_vecs = np.array(q["embedding"].to_pylist(), dtype=np.float64)
    ds = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    out = brute_force_topk(ds, q_ids, q_vecs, k=5, concurrency=2, round_digits=4)
    return out.map_batches(
        lambda df: df[["query_id", "neighbor_id", "score", "rank"]].astype(
            {"query_id": "int64", "neighbor_id": "int64", "rank": "int64"}
        ),
        batch_format="pandas",
    )


_SQL_ANN_TOPK = """
WITH q AS (
  SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id < 3
), scored AS (
  SELECT q.query_id, e.vec_id AS neighbor_id,
         floor((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), q.qe)) * 10000 + 0.5) / 10000 AS score
  FROM embeddings e, q
  WHERE e.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, score,
       row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) AS rank
FROM scored
QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY score DESC, neighbor_id) <= 5
"""


def embedding_norms(sf_dir: str) -> "rd.Dataset":
    ds = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def norms(t: pa.Table) -> pa.Table:
        from ..stages.ann import _to_matrix

        m = _to_matrix(t["embedding"])
        l2 = _qround(np.sqrt((m * m).sum(axis=1)), 4)
        return pa.table({"vec_id": t["vec_id"], "l2_norm": pa.array(l2, type=pa.float64())})

    return ds.map_batches(norms, batch_format="pyarrow")


_SQL_EMBEDDING_NORMS = """
SELECT vec_id,
       floor((sqrt(list_sum(list_transform(CAST(embedding AS DOUBLE[]), x -> x * x)))) * 10000 + 0.5) / 10000 AS l2_norm
FROM embeddings
"""


def cdc_multi_sink_route(sf_dir: str) -> "rd.Dataset":
    """Multi-sink fan-out (the reference's 19-table dispatch shape,
    ``CMS_SynPuf_ETL_CDM_v5.py:212-229``/``:1226-1291``): one pass over the
    event stream routes each record to typed tables with per-table
    projections, committed by ONE atomic manifest publish; the result is
    the read-back of all four routed tables tagged by sink."""
    from ..stages.fanout import Route, fanout_write, read_fanout_table

    ds = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
    routes = [
        Route(
            "engagement",
            lambda t: pc.is_in(
                t["event_type"], value_set=pa.array(["click", "view"])
            ),
            ["event_id", "user_id", "ts"],
        ),
        Route("commerce", lambda t: pc.equal(t["event_type"], "purchase"),
              ["event_id", "user_id", "value"]),
        Route("account", lambda t: pc.equal(t["event_type"], "signup"),
              ["event_id", "user_id"]),
        Route("deadletter", None, ["event_id", "event_type"]),
    ]
    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(sf_dir.encode()).hexdigest()[:10]
    out_root = os.path.join(tempfile.gettempdir(), f"fanout_{tag}")
    _sh.rmtree(out_root, ignore_errors=True)
    fanout_write(ds, routes, out_root)

    parts = []
    for r in routes:
        # prune to the one compared column at the read; every part then
        # carries the identical (sink, event_id) schema into the union
        t = read_fanout_table(out_root, r.name, columns=["event_id"])
        parts.append(
            t.map_batches(
                lambda b, name=r.name: pa.table(
                    {
                        "sink": pa.array([name] * b.num_rows),
                        "event_id": b["event_id"],
                    }
                ),
                batch_format="pyarrow",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


_SQL_MULTI_SINK = """
SELECT 'engagement' AS sink, event_id FROM events WHERE event_type IN ('click', 'view')
UNION ALL
SELECT 'commerce', event_id FROM events WHERE event_type = 'purchase'
UNION ALL
SELECT 'account', event_id FROM events WHERE event_type = 'signup'
UNION ALL
SELECT 'deadletter', event_id FROM events
WHERE event_type NOT IN ('click', 'view', 'purchase', 'signup')
"""


#: event-type hierarchy (concept_ancestor analog): two roots, three levels.
#: 'error' is deliberately absent -> excluded by the rollup (inner join).
_TYPE_EDGES = pa.table(
    {
        "child": ["click", "view", "purchase", "signup",
                  "engagement", "commerce", "account"],
        "parent": ["engagement", "engagement", "commerce", "account",
                   "interaction", "interaction", "profile"],
    }
)


def closure_rollup_events(sf_dir: str) -> "rd.Dataset":
    """Ancestor-closure rollup (J4, ``create_CDMv5_drug_era_non_stockpile
    .sql:37-43`` analog): flatten the type hierarchy into a node->root
    broadcast map with closure_roots (pointer doubling), then count events
    per ROOT — the fact stream only ever joins the pre-flattened closure."""
    from ..stages.closure import closure_roots

    roots = closure_roots(_TYPE_EDGES)  # tiny dim: driver-side flatten
    roots_ref = ray.put(roots[["node", "root"]])
    ds = _events(sf_dir, ["event_type"])

    def partial(df: pd.DataFrame, roots_ref=roots_ref) -> pd.DataFrame:
        m = ray.get(roots_ref)
        df = df.merge(m, left_on="event_type", right_on="node")
        return df.groupby("root", sort=False).size().rename("_n").reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")
    return _final_agg(
        partials,
        lambda df: df.groupby("root", sort=False)["_n"].sum().rename("n")
        .reset_index().astype({"n": "int64"}),
    )


_SQL_CLOSURE_ROLLUP = """
WITH RECURSIVE edges(child, parent) AS (
  VALUES ('click', 'engagement'), ('view', 'engagement'),
         ('purchase', 'commerce'), ('signup', 'account'),
         ('engagement', 'interaction'), ('commerce', 'interaction'),
         ('account', 'profile')
), up(node, anc) AS (
  SELECT child, parent FROM edges
  UNION ALL
  SELECT up.node, e.parent FROM up JOIN edges e ON up.anc = e.child
), closure AS (
  SELECT node, anc AS root FROM up
  WHERE anc NOT IN (SELECT child FROM edges)
)
SELECT c.root, count(*) AS n
FROM events ev JOIN closure c ON ev.event_type = c.node
GROUP BY c.root
"""


def doc_token_unpivot(sf_dir: str) -> "rd.Dataset":
    """Wide->long list-column unpivot (M2/M3, ``SynPufFiles.py:135-153``):
    split each document into its token list, then one zero-copy
    flatten+parent-indices explode to (doc_id, pos, token) rows.  Row
    fan-out only — no shuffle at any scale."""
    from ..stages.unpivot import unpivot_list

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        toks = pc.split_pattern(t["text"], " ")
        wide = pa.table({"doc_id": t["doc_id"], "tok": toks})
        out = unpivot_list(wide, "tok")
        return out.rename_columns(["doc_id", "pos", "token"])

    return ds.map_batches(explode, batch_format="pyarrow")


_SQL_TOKEN_UNPIVOT = """
SELECT doc_id,
       unnest(generate_series(1, array_length(string_split(text, ' ')))) AS pos,
       unnest(string_split(text, ' ')) AS token
FROM documents
"""


# ===========================================================================
# Rows-only operators (non-SQL-expressible; driver records weaker check)


def _docs_with_near_dups(sf_dir: str) -> "rd.Dataset":
    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def shift(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["doc_id"], 30))
        return pa.table(
            {
                "doc_id": pc.add(t["doc_id"], 200_000),
                "text": pc.binary_join_element_wise(t["text"], " near dup tail", ""),
            }
        )

    near = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        shift, batch_format="pyarrow"
    )
    return docs.union(near)


def dedup_minhash_pairs(sf_dir: str) -> "rd.Dataset":
    return minhash_lsh_pairs(_docs_with_near_dups(sf_dir), threshold=0.8,
                             concurrency=2, text_type=pa.string())


def dedup_minhash_signatures(sf_dir: str) -> "rd.Dataset":
    """The MinHash kernel itself, oracle-checked bit-for-bit: per-doc
    128-permutation signatures over the PRODUCTION gram sweep
    (`stages/dedup._window_hashes`: vectorized FNV-1a per token + k-wide
    uint64 polynomial roll) and the production `MinHasher` universal
    hash ((a*g mod 2^64 + b) mod 2^64 mod (2^61-1), RandomState(7)
    constants).  The DuckDB oracle recomputes the identical integer
    recurrence — FNV-1a via list_reduce over code points (ASCII corpus,
    asserted upstream), wraparound via HUGEINT mod 2^64, the 128 (a,b)
    pairs embedded as a VALUES table — so any drift in gram hashing,
    windowing or permutation math is a hard hash mismatch.  Restricted
    to a deterministic 1-in-20 doc slice: the SQL side is a per-byte
    lambda fold (exactness, not throughput — `dedup_minhash_pairs` is
    the scale path and stays rows-only on the banded/capped plan)."""
    from ..functions.minhash import MinHasher
    from ..stages.dedup import _window_hashes

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_batch(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = ids % 20 == 0
        t = t.filter(pa.array(keep))
        ids = ids[keep]
        if len(ids) == 0:
            return pa.table({"doc_id": pa.array([], type=pa.int64()),
                             "perm": pa.array([], type=pa.int64()),
                             "sig": pa.array([], type=pa.int64())})
        mh = MinHasher(num_perm=128, bands=32)
        grams, counts = _window_hashes(t["text"].combine_chunks()
                                       if isinstance(t["text"], pa.ChunkedArray)
                                       else t["text"], 3,
                                       fallback_whole_text=True)
        seg_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        sigs = mh.signatures_flat(grams, seg_starts)  # (ndocs, 128)
        n, K = sigs.shape
        return pa.table({
            "doc_id": pa.array(np.repeat(ids, K)),
            "perm": pa.array(np.tile(np.arange(K, dtype=np.int64), n)),
            "sig": pa.array(sigs.reshape(-1).astype(np.int64)),  # < 2^61
        })

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def _minhash_sig_oracle_sql(num_perm: int = 128, seed: int = 7,
                            k: int = 3, mod: int = 20,
                            docs_sql: str | None = None,
                            select: str | None = None) -> str:
    """SQL mirror of dedup_minhash_signatures: same FNV-1a/roll/perm
    integer recurrence on the uint64 wraparound grid, permutation
    constants embedded from the same RandomState(seed) draw.
    ``docs_sql`` overrides the doc-slice CTE body; ``select`` overrides
    the final statement over the ``sigs`` (doc_id, perm, sig) and
    ``gr`` (doc_id, g gram-hash) relations — the hook
    `_minhash_pairs_oracle_sql` uses to mirror the banded pipeline."""
    m = (1 << 61) - 1
    rng = np.random.RandomState(seed)
    a = rng.randint(1, m, size=num_perm, dtype=np.uint64)
    b = rng.randint(0, m, size=num_perm, dtype=np.uint64)
    perm_rows = ", ".join(
        f"({i}, CAST({int(a[i])} AS UBIGINT), CAST({int(b[i])} AS UBIGINT))"
        for i in range(num_perm))
    P, W64 = 1099511628211, 1 << 64
    assert k == 3, "gram roll below is unrolled for k=3"
    if docs_sql is None:
        docs_sql = f"SELECT doc_id, text FROM documents WHERE doc_id % {mod} = 0"
    if select is None:
        select = "SELECT doc_id, perm, sig FROM sigs"
    return f"""
WITH docs AS (
  {docs_sql}
), tok AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS token,
         unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
  FROM docs
), th AS (
  SELECT doc_id, pos,
         CAST(list_reduce(
           list_prepend(CAST(14695981039346656037 AS UBIGINT),
             list_transform(generate_series(1, length(token)),
                            i -> CAST(ord(substr(token, i, 1)) AS UBIGINT))),
           (acc, byte) -> CAST((CAST(xor(acc, byte) AS HUGEINT) * {P})
                               % {W64} AS UBIGINT)
         ) AS UBIGINT) AS h
  FROM tok
), gr AS (
  SELECT doc_id,
         CAST(xor(
           CAST((CAST(xor(
             CAST((CAST(h AS HUGEINT) * {P}) % {W64} AS UBIGINT),
             lead(h, 1) OVER w) AS HUGEINT) * {P}) % {W64} AS UBIGINT),
           lead(h, 2) OVER w) AS UBIGINT) AS g
  FROM th WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(h, 2) OVER w IS NOT NULL
), perms(perm, pa, pb) AS (
  VALUES {perm_rows}
), sigs AS (
  SELECT g.doc_id, CAST(p.perm AS BIGINT) AS perm,
         CAST(min(((CAST(p.pa AS HUGEINT) * g.g) % {W64} + p.pb)
                  % {W64} % {m}) AS BIGINT) AS sig
  FROM gr g CROSS JOIN perms p
  GROUP BY g.doc_id, p.perm
)
{select}
"""


def _minhash_pairs_oracle_sql(threshold: float = 0.8, rows: int = 4,
                              max_bucket: int = 64) -> str:
    """Exact end-to-end oracle for dedup_minhash_pairs — the COMPLETE
    banded pipeline in SQL, not an idealized all-pairs relaxation: the
    bit-exact signature kernel runs over the full planted corpus, band
    keys are the production FNV fold over each band's ``rows``
    signature values (ordered list_reduce on the uint64 wraparound
    grid), candidacy is sharing any band bucket whose deduped
    membership is within the skew cap (HAVING <= max_bucket — mirroring
    `_partition_pairs`' counted drop), and verification is the exact
    distinct-gram-hash-set Jaccard >= threshold with the same integer
    intersection/union and the same single IEEE division.  So banding
    drift, cap drift, signature drift and verify drift are all hard
    row/hash mismatches.  (Unlike simhash's pigeonhole-exact banding,
    minhash banding is probabilistic — which is exactly why the oracle
    mirrors the banding instead of relaxing to all-pairs.)"""
    docs_sql = (
        "SELECT doc_id, text FROM documents\n"
        "  UNION ALL\n"
        "  SELECT doc_id + 200000 AS doc_id, text || ' near dup tail'"
        " AS text FROM documents WHERE doc_id < 30"
    )
    W64 = 1 << 64
    select = f"""
, bandk AS (
  SELECT doc_id, CAST(perm // {rows} AS BIGINT) AS band_id,
         list_reduce(
           list_prepend(CAST(14695981039346656037 AS UBIGINT),
                        list(CAST(sig AS UBIGINT) ORDER BY perm)),
           (acc, s) -> CAST((CAST(xor(acc, s) AS HUGEINT)
                             * 1099511628211) % {W64} AS UBIGINT)) AS ku
  FROM sigs GROUP BY doc_id, perm // {rows}
), members AS (
  SELECT DISTINCT band_id, ku, doc_id FROM bandk
), okb AS (
  SELECT band_id, ku FROM members GROUP BY band_id, ku
  HAVING count(*) BETWEEN 2 AND {max_bucket}
), cand AS (
  SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
  FROM okb JOIN members x USING (band_id, ku)
           JOIN members y USING (band_id, ku)
  WHERE x.doc_id < y.doc_id
), gset AS (
  SELECT DISTINCT doc_id, g FROM gr
), gsz AS (
  SELECT doc_id, count(*) AS sz FROM gset GROUP BY doc_id
), inter AS (
  SELECT c.a, c.b, count(gb.g) AS i
  FROM cand c
  JOIN gset ga ON ga.doc_id = c.a
  LEFT JOIN gset gb ON gb.doc_id = c.b AND gb.g = ga.g
  GROUP BY c.a, c.b
)
SELECT i.a, i.b,
       CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE) AS jaccard
FROM inter i JOIN gsz sa ON sa.doc_id = i.a
             JOIN gsz sb ON sb.doc_id = i.b
WHERE CAST(i.i AS DOUBLE) / CAST(sa.sz + sb.sz - i.i AS DOUBLE)
      >= {threshold}
"""
    return _minhash_sig_oracle_sql(docs_sql=docs_sql, select=select)


def dedup_simhash_pairs(sf_dir: str) -> "rd.Dataset":
    """Banded simhash near-dup pairs over the planted corpus.  Oracle-
    checked EXACTLY (not rows-only): 4x16-bit banding has exact recall
    at hamming<=3 by pigeonhole, so `_simhash_pairs_oracle_sql`'s
    quadratic bit_count sweep over the bit-exact SQL signature kernel
    must reproduce the full pair set row-for-row."""
    return simhash_pairs(_docs_with_near_dups(sf_dir), max_hamming=3, concurrency=2)


def dedup_simhash_signatures(sf_dir: str) -> "rd.Dataset":
    """The SimHash kernel oracle-checked bit-for-bit (companion of
    dedup_minhash_signatures): per-doc 64-bit simhash over the
    PRODUCTION kernel (`functions/minhash.char_shingles` distinct
    crc32 byte-5-grams; `simhash64` widens each shingle with a second
    crc32 pass over its 8 little-endian bytes, then takes the per-bit
    majority vote).  The DuckDB oracle recomputes the identical integer
    recurrence — crc32 as a nested bitwise list_reduce fold (reflected
    polynomial 0xEDB88320, no lookup table), the hi|lo widening, the
    64-way bit-vote — so any drift in shingling, crc math or vote/tie
    handling is a hard hash mismatch.  Same deterministic 1-in-20 doc
    slice rationale: the SQL is a per-byte×8-bit-step fold (exactness,
    not throughput; `dedup_simhash_pairs` stays the banded scale
    path)."""
    from ..stages.dedup import SimHasher

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_batch(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        t = t.filter(pa.array(ids % 20 == 0))
        return SimHasher(shingle_k=5)(t)

    return ds.map_batches(sig_batch, batch_format="pyarrow")


def _simhash_sig_oracle_sql(k: int = 5, mod: int = 20,
                            docs_sql: str | None = None,
                            select: str | None = None) -> str:
    """SQL mirror of dedup_simhash_signatures: crc32 via a nested
    bitwise fold, uint64 recomposition, per-bit majority vote — all on
    exact integer arithmetic (HUGEINT where 2^63..2^64 values occur).
    ``docs_sql`` overrides the doc-slice CTE body (default: the 1-in-mod
    slice); ``select`` overrides the final projection over the ``sigs``
    relation (doc_id, simhash) — the hook `_simhash_pairs_oracle_sql`
    uses to turn the same signature kernel into an all-pairs oracle."""
    crc = """
CAST(xor(list_reduce(
  list_prepend(CAST(4294967295 AS BIGINT), {bytes}),
  (acc, b) -> list_reduce(
       list_prepend(xor(acc, b), [1,2,3,4,5,6,7,8]),
       (c, s) -> xor(c // 2, CASE WHEN c % 2 = 1 THEN 3988292384 ELSE 0 END))
), 4294967295) AS BIGINT)
"""
    gram_bytes = (f"list_transform(generate_series(0, {k - 1}), "
                  "j -> CAST(ord(substr(text, pos + j, 1)) AS BIGINT))")
    lo_bytes = ("list_transform(generate_series(0, 7), "
                "j -> (lo // CAST(power(256, j) AS BIGINT)) % 256)")
    if docs_sql is None:
        docs_sql = f"SELECT doc_id, text FROM documents WHERE doc_id % {mod} = 0"
    if select is None:
        select = "SELECT doc_id, simhash FROM sigs"
    return f"""
WITH docs AS (
  {docs_sql}
), pos AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text) - {k - 1})) AS pos
  FROM docs
), sh AS (
  SELECT DISTINCT doc_id, {crc.format(bytes=gram_bytes)} AS lo FROM pos
), h64 AS (
  SELECT doc_id,
         CAST({crc.format(bytes=lo_bytes)} AS HUGEINT) * 4294967296
         + (lo % 4294967296) AS h
  FROM sh
), bits AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h // CAST(power(2, b.bit) AS HUGEINT)) % 2 = 1
                  THEN 1 ELSE -1 END) AS vote
  FROM h64, (SELECT unnest(generate_series(0, 63)) AS bit) b
  GROUP BY doc_id, b.bit
), agg AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0 THEN CAST(power(2, bit) AS HUGEINT)
                  ELSE 0 END) AS sim
  FROM bits GROUP BY doc_id
), sigs AS (
  SELECT doc_id,
         CAST(CASE WHEN sim >= 9223372036854775808
                   THEN sim - 18446744073709551616 ELSE sim END
              AS BIGINT) AS simhash
  FROM agg
)
{select}
"""


def _simhash_pairs_oracle_sql(max_hamming: int = 3) -> str:
    """Exact all-pairs oracle for dedup_simhash_pairs: signatures come
    from the SAME bit-exact crc32/vote kernel as the signature oracle,
    computed over the full planted near-dup corpus (documents ∪ 30
    '+200000 … near dup tail' copies), then EVERY (a<b) pair within
    hamming<=3 via bit_count(xor(...)).  The banded Ray path (4 x
    16-bit bands) has exact recall at this radius by pigeonhole — 3
    differing bits cannot touch all 4 bands — so any missed or extra
    pair, skew-cap drop, or signature drift is a hard row/hash
    mismatch.  Affordable because the documents table is corpus-capped
    (500 docs at every sf), so the per-byte fold runs 530x."""
    docs_sql = (
        "SELECT doc_id, text FROM documents\n"
        "  UNION ALL\n"
        "  SELECT doc_id + 200000 AS doc_id, text || ' near dup tail'"
        " AS text FROM documents WHERE doc_id < 30"
    )
    select = f"""
SELECT x.doc_id AS a, y.doc_id AS b,
       CAST(bit_count(xor(x.simhash, y.simhash)) AS BIGINT) AS hamming
FROM sigs x JOIN sigs y ON x.doc_id < y.doc_id
WHERE bit_count(xor(x.simhash, y.simhash)) <= {max_hamming}
"""
    return _simhash_sig_oracle_sql(docs_sql=docs_sql, select=select)


def dedup_ngram_jaccard(sf_dir: str) -> "rd.Dataset":
    """EXACT word-trigram Jaccard near-dup pairs via prefix filtering —
    the complete (non-approximate) member of the dedup family, so it
    carries a full all-pairs DuckDB oracle: any missed pair is a hard
    row-count mismatch.  order='df_join' is the unbounded-vocabulary
    scale path: rarest-first prefixes (smallest buckets) with NO
    vocabulary broadcast — per-gram document frequencies stay a Dataset
    and join back onto the gram stream; prefix completeness holds for
    any total order, so the oracle still pins exactness."""
    from ..stages.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        _docs_with_near_dups(sf_dir), threshold=0.8, n=3, order="df_join",
        text_type=pa.string(),
    )


_SQL_NGRAM_JACCARD = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || ' near dup tail' FROM documents
  WHERE doc_id < 30
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM all_docs
), grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                                      i -> ws[i] || chr(31) || ws[i+1] || chr(31) || ws[i+2])) AS gs
  FROM toks
)
SELECT x.doc_id AS a, y.doc_id AS b,
       floor((CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
              / (len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs)))) * 10000 + 0.5) / 10000 AS jaccard
FROM grams x JOIN grams y ON x.doc_id < y.doc_id
WHERE len(x.gs) > 0 AND len(y.gs) > 0
  AND CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
      / (len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs))) >= 0.8
"""


def cdc_incremental_dedup(sf_dir: str) -> "rd.Dataset":
    """Ingest-time exact dedup against the committed lake: the even-id
    half of `documents` is committed as epoch-0 lake content; the "next
    crawl increment" is the odd-id half PLUS re-crawled copies of
    committed content (even ids < 60, re-keyed +500000) and an in-batch
    duplicate block (odd ids < 20, re-keyed +600000).  Survivors are
    exactly the new shas, first-wins within the batch — the rows a real
    incremental crawl would hand to ``ingest``.  Lake membership is a
    task-based co-group ANTI join on the sha (nothing broadcast); the
    oracle reproduces lake + batch + survivor rule in SQL."""
    from ..stages.dedup import incremental_exact_dedup

    docs = _rpc(f"{sf_dir}/documents.parquet",
                columns=["doc_id", "text", "lang", "source"])

    def to_insert(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids_np = batch["doc_id"].to_numpy(zero_copy_only=False)
        t = batch.filter(pa.array(ids_np % 2 == 0))
        ids = t["doc_id"]
        n = t.num_rows
        return pa.table({
            "repo": t["source"],
            "path": pc.binary_join_element_wise("doc_", pc.cast(ids, pa.string()), ""),
            "op": pa.array(["insert"] * n),
            "commit": pa.array(["c0"] * n),
            "epoch": pa.array([0] * n, type=pa.int64()),
            "seq": pc.cast(ids, pa.int64()),
            "lang": t["lang"],
            "content": t["text"],
        })

    import hashlib as _hl
    import shutil as _sh

    tag = _hl.sha1(f"incdedup:{sf_dir}".encode()).hexdigest()[:10]
    lake_root = os.path.join(tempfile.gettempdir(), f"incdedup_lake_{tag}")
    _sh.rmtree(lake_root, ignore_errors=True)
    cfg = EngineConfig(lake_root=lake_root, num_partitions=16,
                       normalize_concurrency=2, applier_concurrency=2)
    ingest(docs.map_batches(to_insert, batch_format="pyarrow"), cfg,
           count_input=False)

    def new_batch(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids_np = batch["doc_id"].to_numpy(zero_copy_only=False)
        odd = batch.filter(pa.array(ids_np % 2 == 1))
        recrawl = batch.filter(pa.array((ids_np % 2 == 0) & (ids_np < 60)))
        indup = batch.filter(pa.array((ids_np % 2 == 1) & (ids_np < 20)))

        def shift(t: pa.Table, by: int) -> pa.Table:
            return pa.table({"doc_id": pc.add(t["doc_id"], by),
                             "text": t["text"]})

        return pa.concat_tables([
            pa.table({"doc_id": odd["doc_id"], "text": odd["text"]}),
            shift(recrawl, 500_000),
            shift(indup, 600_000),
        ])

    newb = docs.map_batches(new_batch, batch_format="pyarrow")
    return incremental_exact_dedup(newb, lake_root)


def cdc_incremental_minhash(sf_dir: str) -> "rd.Dataset":
    """Ingest-time NEAR-dup detection against a committed corpus — the
    similarity tier above cdc_incremental_dedup: the even-id half of
    `documents` is the committed corpus whose LSH band index was
    persisted once (stages/dedup.build_minhash_band_index); the crawl
    increment is the odd-id half plus near-dup copies of committed
    docs (even ids < 40, re-keyed past the table's footer-max id, one
    appended token — high but non-1.0 Jaccard).  Signature compute is O(increment); the
    corpus contributes only its narrow band-index read and the texts
    of candidate partners.  Result: (a, b, jaccard) pairs with at
    least one new side.  No SQL oracle by nature (LSH banding); the
    hard check pins incremental == full-recompute restricted to
    new-involving pairs plus planted recall
    (tests/test_incremental_minhash.py)."""
    import hashlib as _hl

    from ..stages.dedup import build_minhash_band_index, incremental_minhash_pairs

    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # re-key offset ABOVE the table's real id space (parquet footer max),
    # preserving incremental_minhash_pairs' disjoint-id precondition at
    # any scale — a fixed +700000 would collide once the table grows
    # past it
    _md = pq.ParquetFile(f"{sf_dir}/documents.parquet")
    _max_id = max(
        _md.metadata.row_group(i).column(0).statistics.max
        for i in range(_md.metadata.num_row_groups)
    )
    rekey_off = int(_max_id) + 1_000_000

    def evens(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return _nometa(t.filter(pa.array(ids % 2 == 0)))

    def increment(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        odd = t.filter(pa.array(ids % 2 == 1))
        near = t.filter(pa.array((ids % 2 == 0) & (ids < 40)))
        return pa.concat_tables([
            pa.table({"doc_id": odd["doc_id"], "text": odd["text"]}),
            pa.table({
                "doc_id": pc.add(near["doc_id"], rekey_off),
                "text": pc.binary_join_element_wise(
                    near["text"], " zqxnear", ""),
            }),
        ])

    corpus = docs.map_batches(evens, batch_format="pyarrow")
    tag = _hl.sha1(f"incminhash:{sf_dir}".encode()).hexdigest()[:10]
    index_dir = os.path.join(tempfile.gettempdir(), f"incmh_index_{tag}")
    build_minhash_band_index(corpus, index_dir)
    new = docs.map_batches(increment, batch_format="pyarrow")
    all_docs = docs.map_batches(evens, batch_format="pyarrow").union(
        docs.map_batches(increment, batch_format="pyarrow"))
    return incremental_minhash_pairs(
        new, index_dir, all_docs, text_type=pa.string())


_SQL_INCREMENTAL_DEDUP = """
WITH lake AS (
  SELECT DISTINCT sha256(text) AS sha FROM documents WHERE doc_id % 2 = 0
), newb AS (
  SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1
  UNION ALL
  SELECT doc_id + 500000 AS doc_id, text FROM documents
  WHERE doc_id % 2 = 0 AND doc_id < 60
  UNION ALL
  SELECT doc_id + 600000 AS doc_id, text FROM documents
  WHERE doc_id % 2 = 1 AND doc_id < 20
), winners AS (
  SELECT sha256(text) AS content_sha_hex, min(doc_id) AS doc_id
  FROM newb GROUP BY sha256(text)
)
SELECT w.doc_id, w.content_sha_hex
FROM winners w LEFT JOIN lake l ON w.content_sha_hex = l.sha
WHERE l.sha IS NULL
"""


def doc_substring_dup(sf_dir: str) -> "rd.Dataset":
    """Corpus-level exact substring duplication (Lee et al. 2022 signal):
    per document, how many of its distinct 8-token windows occur in at
    least one OTHER document.  Runs over the planted near-dup corpus so
    duplicated spans are guaranteed; the full chain (window sweep -> df
    partials -> co-group join back -> per-doc rollup) is oracle-pinned —
    any window miscount is a hard value-hash mismatch."""
    from ..stages.dedup import substring_dup_stats

    return substring_dup_stats(_docs_with_near_dups(sf_dir), window=8)


_SQL_SUBSTRING_DUP = """
WITH all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || ' near dup tail' FROM documents
  WHERE doc_id < 30
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM all_docs
), wins AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(ws) - 7, 0) + 1),
                                      i -> array_to_string(ws[i:i+7], chr(31)))) AS gs
  FROM toks
), dwins AS (
  SELECT doc_id, unnest(gs) AS w FROM wins
), df AS (
  SELECT w, count(*) AS d FROM dwins GROUP BY w
)
SELECT v.doc_id,
       count(*) AS n_windows,
       CAST(sum(CASE WHEN f.d >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_windows,
       floor((CAST(sum(CASE WHEN f.d >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
              / count(*)) * 10000 + 0.5) / 10000 AS dup_ratio
FROM dwins v JOIN df f ON v.w = f.w
GROUP BY v.doc_id
"""


def embedding_centroid_scores(sf_dir: str) -> "rd.Dataset":
    """Per-label centroid cosine scoring (embedding-space outlier/quality
    signal for curating training corpora): cosine of every vector to its
    OWN label's mean vector.  Two streaming passes — bounded per-label
    centroid partials (one row per (batch, label)), then a broadcast of
    the (G, dim) centroid matrix and a vectorized row-wise dot sweep.
    The label key is bounded (class-count-sized), never doc-sized."""
    from ..stages.ann import centroid_cosine_scores

    ds = _rpc(f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "label", "embedding"])
    out = centroid_cosine_scores(ds, id_col="vec_id", group_col="label",
                                 emb_col="embedding", round_digits=4)
    return out.map_batches(
        lambda df: df.astype({"vec_id": "int64", "label": "int64"}),
        batch_format="pandas",
    )


_SQL_CENTROID_SCORES = """
WITH flat AS (
  SELECT vec_id, label,
         unnest(CAST(embedding AS DOUBLE[])) AS val,
         generate_subscripts(embedding, 1) AS i
  FROM embeddings
), cent AS (
  SELECT label, i, avg(val) AS c FROM flat GROUP BY label, i
), dots AS (
  SELECT f.vec_id, f.label,
         sum(f.val * c.c) AS dot,
         sqrt(sum(f.val * f.val)) AS n1,
         sqrt(sum(c.c * c.c)) AS n2
  FROM flat f JOIN cent c ON f.label = c.label AND f.i = c.i
  GROUP BY f.vec_id, f.label
)
SELECT vec_id, CAST(label AS BIGINT) AS label,
       floor((CASE WHEN n1 * n2 > 0 THEN dot / (n1 * n2) ELSE 0 END)
             * 10000 + 0.5) / 10000 AS cos_sim
FROM dots
"""


#: BM25 query-term set for the retrieval catalog entry — corpus words
#: chosen so df varies (common, mid, rare-ish); the oracle SQL is
#: GENERATED from this same list (stages/retrieval.bm25_oracle_sql), so
#: the two expression trees cannot drift.
_BM25_TERMS = ["merge", "window", "stream"]


def doc_bm25_search(sf_dir: str) -> pa.Table:
    """Ranked lexical retrieval (BM25 top-10) over the documents table —
    the training-lake analog of the reference's warehouse text lookups.
    Rational (log-free) idf and left-associated term summation make the
    pre-quantization double bit-identical to the oracle; both passes
    reduce per batch (one stats row / k candidates), so the final gather
    is n_batches x k rows, never the corpus."""
    from ..stages.retrieval import bm25_topk

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bm25_topk(ds, _BM25_TERMS, k=10)


def _sql_bm25() -> str:
    from ..stages.retrieval import bm25_oracle_sql

    return bm25_oracle_sql(_BM25_TERMS, k=10)


_OOV_V = 24  # top-V corpus vocabulary size


def doc_oov_rate(sf_dir: str) -> "rd.Dataset":
    """Out-of-vocabulary rate per document against the exact top-V corpus
    vocabulary — the tokenizer-coverage signal of a pretraining mix (a
    doc whose tokens mostly fall outside the vocabulary is boilerplate,
    another language, or junk).

    Scale shape: vocabulary selection reuses the heavy-hitters discipline
    — per-batch ``value_counts`` partials (O(batch-distinct), never the
    corpus), coarse fp-hash partitions summing each token wholly inside
    one bucket, per-bucket candidate top-V, bounded final merge of
    64 x V rows.  The V-token vocabulary is then broadcast once
    (``ray.put``) and the rate pass is one C-kernel ``is_in`` + cumsum
    segment-count per batch.  Tie at the V boundary breaks (count DESC,
    token ASC) on both engines."""
    from ..functions.threads import single_threaded_kernels

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        toks = pc.list_flatten(pc.split_pattern(t["text"], pattern=" "))
        vc = pc.value_counts(toks)
        tok = vc.field("values")
        return pa.table(
            {
                "token": tok,
                "cnt": vc.field("counts").cast(pa.int64()),
                "fp": fingerprint_column(tok),
            }
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["cnt"].sum().reset_index()
        return g.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(_OOV_V)

    partials = ds.map_batches(count_tokens, batch_format="pyarrow")
    cands = _coarse_final(partials, "fp", per_part)
    vocab = _final_agg(
        cands,
        lambda df: df.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(_OOV_V),
    ).to_pandas()["token"].tolist()
    vocab_ref = ray.put(pa.array(sorted(vocab), type=pa.string()))

    def rate(t: pa.Table, *, _ref) -> pa.Table:
        single_threaded_kernels()
        vocab_arr = ray.get(_ref)
        toks = pc.split_pattern(t["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        inv = pc.is_in(flat, value_set=vocab_arr).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        offs = np.concatenate([[0], np.cumsum(dl)])
        csum = np.concatenate([[0], np.cumsum(inv)])
        nin = csum[offs[1:]] - csum[offs[:-1]]
        oov = _qround(1 - nin.astype(np.float64) / dl, 4)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tokens": pa.array(dl, type=pa.int64()),
                "n_invocab": pa.array(nin, type=pa.int64()),
                "oov_rate": pa.array(oov, type=pa.float64()),
            }
        )

    return ds.map_batches(rate, batch_format="pyarrow",
                          fn_kwargs={"_ref": vocab_ref})


_SQL_OOV_RATE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
), tok AS (
  SELECT unnest(ws) AS token FROM toks
), vocab AS (
  SELECT token FROM tok GROUP BY token
  ORDER BY count(*) DESC, token ASC LIMIT {_OOV_V}
), dtok AS (
  SELECT doc_id, unnest(ws) AS token FROM toks
), inv AS (
  SELECT d.doc_id, count(*) AS nin
  FROM dtok d JOIN vocab v USING (token) GROUP BY d.doc_id
)
SELECT t.doc_id,
       CAST(len(t.ws) AS BIGINT) AS n_tokens,
       CAST(coalesce(i.nin, 0) AS BIGINT) AS n_invocab,
       floor((1 - CAST(coalesce(i.nin, 0) AS DOUBLE) / len(t.ws))
             * 10000 + 0.5) / 10000 AS oov_rate
FROM toks t LEFT JOIN inv i USING (doc_id)
"""


def embedding_kmeans(sf_dir: str) -> "rd.Dataset":
    """Distributed spherical k-means over the embeddings table
    (stages/ann.kmeans_fit): full-dataset Lloyd iterations with
    per-batch (cluster, sum, count) partials, then per-cluster size +
    mean assignment cosine.  The semantic-clustering primitive of a
    SemDeDup-style curation stack.  No SQL oracle (iterative float
    algorithm — avg order is engine-dependent); the driver records a
    rows-only check and test_hard_checks pins exact recovery of
    planted separated clusters."""
    from ..stages.ann import kmeans_assign, kmeans_fit

    # materialize the two pruned columns once: every Lloyd iteration is
    # a fresh pass, and re-decoding parquet per pass triples the wall
    # (object-store blocks spill if the cluster is tight — fine)
    ds = _rpc(f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"]).materialize()
    C = kmeans_fit(ds, k=8, iters=3)
    assigned = kmeans_assign(ds, C)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("cluster", sort=False).agg(
            _n=("cos_sim", "size"), _s=("cos_sim", "sum")).reset_index()
        return g

    partials = assigned.map_batches(partial, batch_format="pandas")
    return _final_agg(
        partials,
        lambda d: d.groupby("cluster", sort=False)
        .agg(size=("_n", "sum"), _s=("_s", "sum")).reset_index()
        .assign(mean_cos=lambda g: _qround(g["_s"] / g["size"], 4))
        .astype({"cluster": "int64", "size": "int64"})
        [["cluster", "size", "mean_cos"]],
    )


def embedding_diversity_sample(sf_dir: str) -> "rd.Dataset":
    """Cluster-stratified coreset: fit k-means on the full embeddings
    table, then keep the 2 vectors nearest each centroid
    (stages/ann.kmeans_diversity_sample) — per-batch bounded local
    top-m, one bounded-key final; ties (cos DESC, vec_id ASC).
    Rows-only driver check; determinism pinned in test_hard_checks."""
    from ..stages.ann import kmeans_diversity_sample, kmeans_fit

    ds = _rpc(f"{sf_dir}/embeddings.parquet",
              columns=["vec_id", "embedding"]).materialize()
    C = kmeans_fit(ds, k=8, iters=3)
    return kmeans_diversity_sample(ds, C, per_cluster=2)


def doc_rarity_score(sf_dir: str) -> "rd.Dataset":
    """Token-rarity quality score per document: the mean corpus document
    frequency of the document's token INSTANCES, normalized by corpus
    size — ``sum(tf * df) / n_tokens / n_docs``.  A low score means the
    document is dominated by tokens few other documents use (junk,
    boilerplate in another language, binary spill); a training-mix
    curation signal next to doc_quality_filter / doc_oov_rate.

    Exactness discipline: both factors of the score stay EXACT INTEGERS
    (tf, df, their weighted sum) until two final double divisions whose
    operand order the SQL mirrors literally, so the pre-quantization
    double is IEEE-identical cross-engine — no log(), no float
    accumulation order to diverge.

    Scale shape (the doc_tfidf_topterms topology): one shared tokenize
    pass materialized at O(doc x distinct-term) rows; document
    frequencies via coarse token-fp partitions (df stays a Dataset,
    never a driver broadcast); df joins back onto the term stream with
    the task-based hash join; per-doc integer sums in one coarse
    doc-hash sweep.  (Reference analog: the unmapped-code FREQUENCY
    reports of python_etl — per-entity aggregation of a corpus-wide
    dictionary statistic.)"""
    from ..stages.join import hash_join as _hj
    from ..stages.unpivot import unpivot_list

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows

    def tf_batch(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        toks = pc.split_pattern(t["text"], pattern=" ")
        long = unpivot_list(pa.table({"doc_id": t["doc_id"], "token": toks}),
                            "token")
        g = (
            long.select(["doc_id", "token_item"])
            .rename_columns(["doc_id", "token"]).to_pandas()
            .groupby(["doc_id", "token"], sort=False)
            .size().rename("tf").reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    tf_mat = ds.map_batches(tf_batch, batch_format="pyarrow").materialize()

    def add_tpart(t: pa.Table) -> pa.Table:
        fp = fingerprint_column(t["token"]).to_numpy(zero_copy_only=False)
        return t.append_column("tpart", pa.array((fp % 64).astype(np.int64)))

    # tf rows are unique per (doc, token), so df(token) == row count
    df_ds = (
        tf_mat.map_batches(add_tpart, batch_format="pyarrow", batch_size=65536)
        .groupby("tpart")
        .map_groups(
            lambda d: d.groupby("token", sort=False).size().rename("df")
            .reset_index(),
            batch_format="pandas",
        )
    )

    joined = _hj(
        tf_mat, df_ds, on="token",
        left_schema=pa.schema(
            [("doc_id", pa.int64()), ("token", pa.string()), ("tf", pa.int64())]
        ),
        right_schema=pa.schema([("token", pa.string()), ("df", pa.int64())]),
    )

    def add_dpart(t: pa.Table) -> pa.Table:
        k = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("dpart", pa.array((k % 64).astype(np.int64)))

    def score(d: pd.DataFrame) -> pd.DataFrame:
        d = d.assign(_w=d["tf"].astype("int64") * d["df"].astype("int64"))
        g = d.groupby("doc_id", sort=False).agg(
            n_tokens=("tf", "sum"), df_sum=("_w", "sum")
        ).reset_index()
        # operand order mirrored in SQL: (df_sum / n_tokens) / n_docs
        rar = (g["df_sum"].astype("float64") / g["n_tokens"].astype("float64")
               ) / float(n_docs)
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"],
                "n_tokens": g["n_tokens"].astype("int64"),
                "df_sum": g["df_sum"].astype("int64"),
                "rarity": _qround(rar, 6),
            }
        )

    parted = joined.map_batches(add_dpart, batch_format="pyarrow",
                                batch_size=65536)
    return parted.groupby("dpart").map_groups(score, batch_format="pandas")


_SQL_RARITY = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), df AS (
  SELECT token, count(*) AS df FROM tf GROUP BY token
), s AS (
  SELECT tf.doc_id,
         sum(tf.tf) AS n_tokens,
         sum(tf.tf * df.df) AS df_sum
  FROM tf JOIN df USING (token) GROUP BY tf.doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(df_sum AS BIGINT) AS df_sum,
       floor((CAST(df_sum AS DOUBLE) / CAST(n_tokens AS DOUBLE)
              / (SELECT count(*) FROM documents)) * 1000000 + 0.5) / 1000000
         AS rarity
FROM s
"""


def lang_token_drift(sf_dir: str) -> "rd.Dataset":
    """Distribution drift per corpus slice: total-variation distance
    between each language's token distribution and the whole corpus —
    0.5 * sum_t |c_l(t)/N_l - c_g(t)/N_g|.  The domain-shift /
    mix-imbalance detector of a pretraining pipeline (a slice whose TVD
    spikes after an ingest got polluted or its sampling drifted).

    Exactness discipline: the per-token contribution is computed as the
    EXACT INTEGER |c_l * N_g - c_g * N_l| (common-denominator form) and
    summed as integers; one final double division, operand order
    mirrored in SQL.  (The int64 cross products hold while the corpus
    has < 2^31 token instances — checked explicitly, since numpy wraps
    silently; a 100 TB deployment lifts the partial to object/HUGEINT
    arithmetic or pre-scales the common denominator.)

    Scale shape: per-batch (lang, token) count partials (O(batch
    distinct)); coarse token-fp partitions put every token's rows wholly
    in one bucket, so each bucket computes exact slice counts c_l AND
    corpus counts c_g locally; per-language totals N_l are
    BOUNDED-cardinality and reduce via _final_agg to driver scalars
    (#langs rows) broadcast into the bucket sweep.  Tokens a language
    never uses contribute N_l * c_g WITHOUT materializing the lang x
    vocab cross product: per bucket that mass is
    N_l * (C_bucket - sum_{t present in l} c_g(t)) — one merge + two
    vectorized sums per language."""
    from ..functions.threads import single_threaded_kernels

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["lang", "text"])

    def count_batch(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        toks = pc.split_pattern(t["text"], pattern=" ")
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        lang = np.repeat(
            np.asarray(t["lang"].to_pylist(), dtype=object), dl
        )
        flat = pc.list_flatten(toks).to_pandas()
        g = (
            pd.DataFrame({"lang": lang, "token": flat})
            .groupby(["lang", "token"], sort=False)
            .size().rename("c").reset_index()
        )
        g["fp"] = fingerprint_column(
            pa.array(g["token"], type=pa.string())
        ).to_numpy(zero_copy_only=False)
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    partials = ds.map_batches(count_batch, batch_format="pyarrow").materialize()

    # per-language totals: bounded keys -> one coalesced reduce, then
    # driver-side scalars (#langs rows)
    totals = _final_agg(
        partials,
        lambda d: d.groupby("lang", sort=False)["c"].sum().reset_index(
            name="n_l"),
    ).to_pandas()
    n_l = {r["lang"]: int(r["n_l"]) for _, r in totals.iterrows()}
    n_g = sum(n_l.values())
    if n_g >= 2**31:
        raise NotImplementedError(
            "lang_token_drift int64 cross products need corpus token count "
            "< 2^31; lift the bucket partials to object/HUGEINT arithmetic"
        )

    def bucket_sweep(d: pd.DataFrame, *, _nl, _ng) -> pd.DataFrame:
        d = d.groupby(["lang", "token"], sort=False)["c"].sum().reset_index()
        cg = d.groupby("token", sort=False)["c"].sum().rename("cg").reset_index()
        c_bucket = int(cg["cg"].sum())
        m = d.merge(cg, on="token", how="left")
        out_lang, out_sum = [], []
        for lang, nl in _nl.items():
            ml = m[m["lang"] == lang]
            c = ml["c"].to_numpy(dtype=np.int64)
            g = ml["cg"].to_numpy(dtype=np.int64)
            present = int(np.abs(c * np.int64(_ng) - g * np.int64(nl)).sum())
            missing = nl * (c_bucket - int(g.sum()))
            out_lang.append(lang)
            out_sum.append(present + missing)
        return pd.DataFrame({"lang": out_lang, "part_sum": out_sum})

    def add_tpart(t: pa.Table) -> pa.Table:
        fp = t["fp"].to_numpy(zero_copy_only=False)
        return t.append_column("tpart", pa.array((fp % 64).astype(np.int64)))

    sums = (
        partials.map_batches(add_tpart, batch_format="pyarrow",
                             batch_size=65536)
        .groupby("tpart")
        .map_groups(
            lambda d, _nl=n_l, _ng=n_g: bucket_sweep(
                d.drop(columns=["tpart", "fp"]), _nl=_nl, _ng=_ng),
            batch_format="pandas",
        )
    )

    def final(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby("lang", sort=False)["part_sum"].sum().reset_index()
        nl = g["lang"].map(n_l).astype("int64")
        # operand order mirrored in SQL: sum / ((2.0 * N_l) * N_g)
        tvd = g["part_sum"].astype("float64") / (
            (2.0 * nl.astype("float64")) * float(n_g)
        )
        return pd.DataFrame(
            {
                "lang": g["lang"],
                "n_tokens": nl,
                "tvd": _qround(tvd, 6),
            }
        )

    return _final_agg(sums, final)


_SQL_LANG_DRIFT = """
WITH tok AS (
  SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
), cnt AS (
  SELECT lang, token, count(*) AS c FROM tok GROUP BY lang, token
), cg AS (
  SELECT token, sum(c) AS cg FROM cnt GROUP BY token
), nl AS (
  SELECT lang, sum(c) AS n_l FROM cnt GROUP BY lang
), ng AS (
  SELECT sum(c) AS n_g FROM cnt
), pairs AS (
  SELECT l.lang, g.token, coalesce(c.c, 0) AS c, g.cg
  FROM (SELECT DISTINCT lang FROM cnt) l
  CROSS JOIN cg g
  LEFT JOIN cnt c ON c.lang = l.lang AND c.token = g.token
), s AS (
  SELECT p.lang,
         sum(abs(p.c * (SELECT n_g FROM ng) - p.cg * n.n_l)) AS ssum,
         any_value(n.n_l) AS n_l
  FROM pairs p JOIN nl n ON n.lang = p.lang
  GROUP BY p.lang
)
SELECT lang, CAST(n_l AS BIGINT) AS n_tokens,
       floor((CAST(ssum AS DOUBLE)
              / ((2.0 * CAST(n_l AS DOUBLE)) * (SELECT n_g FROM ng)))
             * 1000000 + 0.5) / 1000000 AS tvd
FROM s
"""


def hybrid_search_rrf(sf_dir: str) -> pa.Table:
    """Hybrid retrieval: reciprocal-rank fusion of the BM25 lexical
    top-20 (documents) with the brute-force cosine top-20 around query
    vector 0 (embeddings; vec_id = doc_id by fixture construction) —
    the lexical+dense fusion step of a retrieval/curation stack.  Both
    pools are already bounded top-k pipelines (per-batch candidates,
    never the corpus); fusion itself is driver-side arithmetic over
    <=40 rows with exact-integer rank denominators, so every fused
    double is IEEE-identical to the SQL mirror."""
    from ..stages.retrieval import bm25_topk, rrf_fuse

    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bm = bm25_topk(docs, _BM25_TERMS, k=20).to_pandas()

    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "=", 0)],
    )
    q_ids = np.array(q["vec_id"].to_pylist(), dtype=np.int64)
    q_vecs = np.array(q["embedding"].to_pylist(), dtype=np.float64)
    emb = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    ann = brute_force_topk(emb, q_ids, q_vecs, k=20, concurrency=2,
                           round_digits=4).to_pandas()
    ann = ann.rename(columns={"neighbor_id": "doc_id"})[["doc_id", "rank"]]
    return rrf_fuse([bm[["doc_id", "rank"]], ann], k=10)


def _sql_hybrid() -> str:
    from ..stages.retrieval import hybrid_oracle_sql

    return hybrid_oracle_sql(_BM25_TERMS, query_vec_id=0, k=10, pool=20)


_FUNNEL_STEPS = ["view", "click", "purchase"]
_FUNNEL_WINDOW = pd.Timedelta(hours=24)


def user_funnel(sf_dir: str) -> "rd.Dataset":
    """Ordered multi-step conversion funnel (sequence analytics the
    reference's SQL warehouse answers with chained min-ts self-joins):
    how many users reach step k of view -> click -> purchase, where each
    step must occur within 24 h AT OR AFTER the user's earliest
    completion of the previous step.

    Scale shape: one coarse user-hash shuffle co-locates each user's
    events (the cdc_sessionize pattern — 64 hash groups, never per-user
    tasks); inside a partition the chained mins are THREE vectorized
    groupby-min sweeps, and only (step, count) partials leave, so the
    final reduce folds 64 x 3 rows."""
    ds = _events(sf_dir, ["user_id", "ts", "event_type"])

    def per_partition(df: pd.DataFrame) -> pd.DataFrame:
        prev = None  # Series: user_id -> min ts of previous step chain
        counts = []
        for step in _FUNNEL_STEPS:
            sub = df[df["event_type"] == step]
            if prev is not None:
                sub = sub.merge(prev.rename("prev_t"), left_on="user_id",
                                right_index=True)
                sub = sub[(sub["ts"] >= sub["prev_t"])
                          & (sub["ts"] <= sub["prev_t"] + _FUNNEL_WINDOW)]
            cur = sub.groupby("user_id", sort=False)["ts"].min()
            counts.append(len(cur))
            prev = cur
        return pd.DataFrame(
            {"step": np.arange(1, len(_FUNNEL_STEPS) + 1, dtype=np.int64),
             "n_users": np.array(counts, dtype=np.int64)}
        )

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    partials = parts.groupby("upart").map_groups(
        per_partition, batch_format="pandas"
    )
    return _final_agg(
        partials,
        lambda df: df.groupby("step", sort=True)["n_users"].sum()
        .reset_index().astype({"step": "int64", "n_users": "int64"}),
    )


_SQL_FUNNEL = """
WITH u1 AS (
  SELECT user_id, min(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
), u2 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN u1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= u1.t
    AND e.ts <= u1.t + INTERVAL 24 HOUR GROUP BY e.user_id
), u3 AS (
  SELECT e.user_id, min(e.ts) AS t FROM events e JOIN u2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= u2.t
    AND e.ts <= u2.t + INTERVAL 24 HOUR GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, count(*) AS n_users FROM u1
UNION ALL SELECT 2, count(*) FROM u2
UNION ALL SELECT 3, count(*) FROM u3
"""


def doc_lang_median_filter(sf_dir: str) -> "rd.Dataset":
    """Per-language percentile gate: keep documents whose token count is
    at or above their OWN language's exact median — the
    relative-quality cut of a multilingual pretraining mix (absolute
    thresholds over-prune low-resource languages; a per-group percentile
    adapts).  Composes the sketch-guided exact grouped quantile
    (stages/selection.py — no sort, no column gather) over the bounded
    lang key with a broadcast threshold filter; the doc stream is
    touched twice, both times vectorized, never shuffled."""
    from ..stages.selection import exact_group_quantile

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def with_ntok(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang": t["lang"],
                "n_tok": token_count_column(t["text"]).cast(pa.float64()),
            }
        )

    scored = ds.map_batches(with_ntok, batch_format="pyarrow")
    med = exact_group_quantile(scored, "lang", "n_tok", q=0.5, cap=65536)
    med_ref = ray.put(med)

    def keep(t: pa.Table, *, _ref) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        med = ray.get(_ref)
        langs = sorted(med)
        thr = np.array([med[l] for l in langs])
        ix = np.searchsorted(np.array(langs), t["lang"].to_numpy(zero_copy_only=False))
        ntok = t["n_tok"].to_numpy(zero_copy_only=False)
        mask = ntok >= thr[ix]
        out = t.filter(pa.array(mask))
        oix = np.searchsorted(np.array(langs), out["lang"].to_numpy(zero_copy_only=False))
        return pa.table(
            {
                "doc_id": out["doc_id"],
                "lang": out["lang"],
                "n_tokens": out["n_tok"].cast(pa.int64()),
                "lang_median": pa.array(thr[oix], type=pa.float64()),
            }
        )

    return scored.map_batches(keep, batch_format="pyarrow",
                              fn_kwargs={"_ref": med_ref})


_SQL_LANG_MEDIAN_FILTER = """
WITH d AS (
  SELECT doc_id, lang,
         CAST(len(string_split(text, ' ')) AS DOUBLE) AS n_tok
  FROM documents
), med AS (
  SELECT lang, quantile_disc(n_tok, 0.5) AS lang_median FROM d GROUP BY lang
)
SELECT d.doc_id, d.lang, CAST(d.n_tok AS BIGINT) AS n_tokens, m.lang_median
FROM d JOIN med m USING (lang)
WHERE d.n_tok >= m.lang_median
"""


def training_shard_shuffle(sf_dir: str) -> "rd.Dataset":
    """Deterministic global training shuffle: every doc gets a shard (its
    content-sha first nibble, 16 shards) and a stable position within the
    shard ordered by (sha256, doc_id) — the reproducible, engine- and
    partitioning-independent way to lay out data-loader shards (contrast
    random_shuffle, which is neither resumable nor replayable).

    Scale shape: the shard key is computed per batch (vectorized sha);
    positions need one bounded-key shuffle — 16 shard groups, each
    ranked by ONE vectorized argsort sweep (the cdc_sessionize coarse
    pattern), with tiny pre-shuffle blocks coalesced."""
    from ..functions.threads import single_threaded_kernels

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def keyed(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        sha = sha256_hex_column(t["text"])
        nib = pc.utf8_slice_codeunits(sha, 0, 1)
        shard = pc.index_in(
            nib, value_set=pa.array(list("0123456789abcdef"))
        ).cast(pa.int64())
        return pa.table({"doc_id": t["doc_id"], "shard": shard, "sha": sha})

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["sha", "doc_id"], kind="mergesort")
        df["pos"] = np.arange(1, len(df) + 1, dtype=np.int64)
        return df[["doc_id", "shard", "pos"]]

    parts = ds.map_batches(keyed, batch_format="pyarrow", batch_size=65536)
    return parts.groupby("shard").map_groups(rank, batch_format="pandas")


_SQL_SHARD_SHUFFLE = """
WITH s AS (
  SELECT doc_id, sha256(text) AS sha,
         CAST(strpos('0123456789abcdef', substr(sha256(text), 1, 1)) - 1
              AS BIGINT) AS shard
  FROM documents
)
SELECT doc_id, shard,
       row_number() OVER (PARTITION BY shard ORDER BY sha, doc_id) AS pos
FROM s
"""


#: shared CTE block: the exact trigram-Jaccard near-dup pair set over the
#: planted corpus — the SAME pair semantics as _SQL_NGRAM_JACCARD, reused
#: by the clustering oracle so the two entries can never drift apart.
_SQL_NGRAM_PAIR_CTES = """
all_docs AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 200000 AS doc_id, text || ' near dup tail' FROM documents
  WHERE doc_id < 30
), toks AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM all_docs
), grams AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, greatest(len(ws) - 2, 0) + 1),
                                      i -> ws[i] || chr(31) || ws[i+1] || chr(31) || ws[i+2])) AS gs
  FROM toks
), pairs AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM grams x JOIN grams y ON x.doc_id < y.doc_id
  WHERE len(x.gs) > 0 AND len(y.gs) > 0
    AND CAST(len(list_intersect(x.gs, y.gs)) AS DOUBLE)
        / (len(x.gs) + len(y.gs) - len(list_intersect(x.gs, y.gs))) >= 0.8
)
"""


def dedup_cluster_docs(sf_dir: str) -> "rd.Dataset":
    """Duplicate clustering: exact near-dup pairs -> connected components.

    The action step of the dedup family: pairs alone don't say which doc
    to keep — the transitive closure does.  Pairs come from the EXACT
    n-gram Jaccard operator (so the full chain is oracle-checkable), the
    component labels from the distributed hook+compress iteration in
    ``stages/cluster.py``; ``cluster_id`` = min doc id of the component
    (the deterministic survivor a keep-one filter would retain).
    """
    from ..stages.cluster import connected_components
    from ..stages.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(
        _docs_with_near_dups(sf_dir), threshold=0.8, n=3, order="df_join",
        text_type=pa.string(),
    )
    cc = connected_components(pairs, a_col="a", b_col="b")
    return cc.map_batches(
        lambda t: pa.table({"doc_id": t["node"], "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


_SQL_CLUSTER_DOCS = f"""
WITH RECURSIVE {_SQL_NGRAM_PAIR_CTES},
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
walk AS (
  SELECT x AS node, x AS reach FROM edges
  UNION
  SELECT w.node, e.y FROM walk w JOIN edges e ON w.reach = e.x
)
SELECT node AS doc_id, min(reach) AS cluster_id FROM walk GROUP BY node
"""


def dedup_apply_docs(sf_dir: str) -> "rd.Dataset":
    """The end artifact of the dedup family: the FILTERED CORPUS.
    Pairs (exact n-gram Jaccard) -> connected components -> keep ONE
    canonical doc per cluster (min doc id — the component label itself)
    and drop the rest via a hash anti-join; singleton docs pass through
    untouched.  Everything upstream is shuffle-based (no broadcast of
    the duplicate set — it scales with corpus duplication, which at
    100 TB is exactly the side you cannot hold on one node)."""
    from ..stages.cluster import connected_components
    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.join import hash_join

    corpus = _docs_with_near_dups(sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.8, n=3, order="df_join",
                                text_type=pa.string())
    cc = connected_components(pairs, a_col="a", b_col="b")

    def losers(t: pa.Table) -> pa.Table:
        keep = pc.not_equal(t["node"], t["label"])
        return pa.table({"doc_id": t["node"].filter(keep)})

    dup_ids = cc.map_batches(losers, batch_format="pyarrow")
    kept = hash_join(
        _docs_with_near_dups(sf_dir), dup_ids, on="doc_id", how="anti",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64())]),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_sha_hex": sha256_hex_column(t["text"]),
                "n_bytes": pc.binary_length(
                    t["text"].cast(pa.large_binary())
                ).cast(pa.int64()),
            }
        )

    return kept.map_batches(project, batch_format="pyarrow")


_SQL_DEDUP_APPLY = f"""
WITH RECURSIVE {_SQL_NGRAM_PAIR_CTES},
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
walk AS (
  SELECT x AS node, x AS reach FROM edges
  UNION
  SELECT w.node, e.y FROM walk w JOIN edges e ON w.reach = e.x
),
labels AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node)
SELECT d.doc_id,
       sha256(d.text) AS text_sha_hex,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes
FROM all_docs d LEFT JOIN labels l ON d.doc_id = l.node
WHERE l.node IS NULL OR l.cluster_id = d.doc_id
"""


def dedup_apply_best_docs(sf_dir: str) -> "rd.Dataset":
    """Quality-aware dedup apply: keep the BEST doc per near-dup cluster
    instead of the min-id one — the production policy (dedup should
    retain the most complete variant, not an arbitrary survivor).
    Quality = byte length (deterministic, oracle-mirrorable), ties break
    to the smaller doc_id.  Topology: components as in
    `dedup_apply_docs`; clustered docs join their lengths through the
    task exchange; the per-cluster argmax runs as ONE vectorized sweep
    inside coarse label-hash partitions (all rows of a cluster share a
    bucket); losers anti-join the corpus.  Nothing is broadcast — the
    duplicate side scales with corpus duplication."""
    from ..stages.cluster import connected_components
    from ..stages.dedup import ngram_jaccard_pairs
    from ..stages.join import hash_join

    corpus = _docs_with_near_dups(sf_dir)
    pairs = ngram_jaccard_pairs(corpus, threshold=0.8, n=3, order="df_join",
                                text_type=pa.string())
    cc = connected_components(pairs, a_col="a", b_col="b")
    lens = _docs_with_near_dups(sf_dir).map_batches(
        lambda t: _nometa(pa.table({
            "doc_id": t["doc_id"],
            "nb": pc.binary_length(
                t["text"].cast(pa.large_binary())).cast(pa.int64()),
        })),
        batch_format="pyarrow",
    )
    scored = hash_join(
        cc.map_batches(lambda t: _nometa(t.select(["node", "label"])),
                       batch_format="pyarrow"),
        lens, on="node", right_on="doc_id",
        left_schema=pa.schema([("node", pa.int64()), ("label", pa.int64())]),
        right_schema=pa.schema([("doc_id", pa.int64()), ("nb", pa.int64())]),
    )

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["label", "nb", "node"],
                           ascending=[True, False, True], kind="mergesort")
        keep_mask = ~d["label"].duplicated()  # first per label = argmax
        return d.loc[~keep_mask, ["node"]].rename(columns={"node": "doc_id"})

    dup_ids = _coarse_final(scored, "label", losers)
    kept = hash_join(
        _docs_with_near_dups(sf_dir), dup_ids, on="doc_id", how="anti",
        left_schema=pa.schema([("doc_id", pa.int64()), ("text", pa.string())]),
        right_schema=pa.schema([("doc_id", pa.int64())]),
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": t["doc_id"],
            "text_sha_hex": sha256_hex_column(t["text"]),
            "n_bytes": pc.binary_length(
                t["text"].cast(pa.large_binary())).cast(pa.int64()),
        })

    return kept.map_batches(project, batch_format="pyarrow")


_SQL_DEDUP_APPLY_BEST = f"""
WITH RECURSIVE {_SQL_NGRAM_PAIR_CTES},
edges AS (SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs),
walk AS (
  SELECT x AS node, x AS reach FROM edges
  UNION
  SELECT w.node, e.y FROM walk w JOIN edges e ON w.reach = e.x
),
labels AS (SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node),
scored AS (
  SELECT l.node, l.cluster_id,
         CAST(octet_length(encode(d.text)) AS BIGINT) AS nb
  FROM labels l JOIN all_docs d ON l.node = d.doc_id
),
win AS (
  SELECT node, row_number() OVER (
    PARTITION BY cluster_id ORDER BY nb DESC, node) AS rn
  FROM scored
)
SELECT d.doc_id, sha256(d.text) AS text_sha_hex,
       CAST(octet_length(encode(d.text)) AS BIGINT) AS n_bytes
FROM all_docs d LEFT JOIN labels l ON d.doc_id = l.node
WHERE l.node IS NULL OR d.doc_id IN (SELECT node FROM win WHERE rn = 1)
"""


def lang_id_pred(sf_dir: str) -> "rd.Dataset":
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    return ds.map_batches(
        lambda t: lang_id_table(t).select(["doc_id", "lang", "lang_pred"]),
        batch_format="pyarrow",
    )


def _lang_id_oracle_sql() -> str:
    """DuckDB mirror of lang_id_table generated FROM the marker dict, so
    the heuristic and its oracle cannot drift: per-lang score = sum of
    replace-based substring counts; argmax with first-in-dict-order wins
    (numpy argmax semantics); all-zero -> 'unknown'."""
    from ..functions.text import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    score_exprs = []
    for lang in langs:
        terms = [
            f"(length(lower(text)) - length(replace(lower(text), '{m}', ''))) // {len(m)}"
            for m in _LANG_MARKERS[lang]
        ]
        score_exprs.append(f"({' + '.join(terms)}) AS s_{lang}")
    all_zero = " AND ".join(f"s_{lang} = 0" for lang in langs)
    cases = [f"WHEN {all_zero} THEN 'unknown'"]
    for i, lang in enumerate(langs):
        geq = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1 :])
        cases.append(f"WHEN {geq} THEN '{lang}'" if geq else f"ELSE '{lang}'")
    case_sql = "\n         ".join(cases)
    return f"""
WITH scored AS (
  SELECT doc_id, lang, {", ".join(score_exprs)}
  FROM documents
)
SELECT doc_id, lang,
       CASE {case_sql}
       END AS lang_pred
FROM scored
"""


def training_corpus(sf_dir: str) -> "rd.Dataset":
    """The capstone composition a pretraining-data user actually runs:
    quality filter -> language-ID consistency check -> exact dedup
    (first-wins by min doc id) -> deterministic content-keyed train/val
    split, as ONE streaming pipeline.  Stage 1 is a single vectorized
    pass per batch (all three filters + sha + per-batch dedup combiner);
    the only exchange is the coarse sha-hash final dedup.  The split is
    keyed on sha256(text) (first hex nibble < 'c' -> train, 12/16 =
    75%), so membership is reproducible across runs, engines, and
    repartitioning.  Every rule is mirrored exactly in the generated
    SQL oracle (marker scores and argmax order generated from the same
    constants as lang_id_table)."""
    import zlib

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def stage1(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        text = t["text"]
        n_tok = token_count_column(text)
        n_chars = char_count_column(text)
        n_punct = punct_count_column(text)
        ratio = pc.divide(n_punct.cast(pa.float64()), n_chars.cast(pa.float64()))
        mask = pc.and_(
            pc.and_(
                pc.greater_equal(n_tok, pa.scalar(5, type=pa.int64())),
                pc.less_equal(n_tok, pa.scalar(5000, type=pa.int64())),
            ),
            pc.and_(
                pc.greater_equal(n_chars, pa.scalar(30, type=pa.int64())),
                pc.less(ratio, pa.scalar(0.1)),
            ),
        )
        t2 = lang_id_table(t.filter(mask))
        t3 = t2.filter(pc.equal(t2["lang_pred"], t2["lang"]))
        df = pd.DataFrame(
            {
                "text_sha_hex": sha256_hex_column(t3["text"]).to_pandas(),
                "doc_id": t3["doc_id"].to_pandas(),
                "lang": t3["lang"].to_pandas(),
            }
        )
        # per-batch dedup combiner: keep the min-doc-id row per sha (the
        # whole row, so the kept lang is the min-doc row's — arg_min)
        g = df.sort_values("doc_id", kind="mergesort").drop_duplicates(
            "text_sha_hex", keep="first"
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def add_part(t: pa.Table) -> pa.Table:
        part = np.fromiter(
            (zlib.crc32(s.encode()) % 64 for s in t["text_sha_hex"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        return t.append_column("sp", pa.array(part))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort").drop_duplicates(
            "text_sha_hex", keep="first"
        )
        g = g.assign(
            split=np.where(g["text_sha_hex"].str[0] < "c", "train", "val")
        )
        return g[["doc_id", "lang", "text_sha_hex", "split"]].astype(
            {"doc_id": "int64"}
        )

    return (
        ds.map_batches(stage1, batch_format="pyarrow")
        .map_batches(add_part, batch_format="pyarrow", batch_size=65536)
        .groupby("sp")
        .map_groups(final, batch_format="pandas")
    )


def _training_corpus_sql() -> str:
    """Composed oracle generated from the same constants as the Ray
    pipeline: quality predicates + marker-score lang CASE + min-doc-id
    dedup (arg_min for the carried lang) + sha-nibble split."""
    from ..functions.text import _LANG_MARKERS

    langs = list(_LANG_MARKERS)
    score_exprs = []
    for lang in langs:
        terms = [
            f"(length(lower(text)) - length(replace(lower(text), '{m}', ''))) // {len(m)}"
            for m in _LANG_MARKERS[lang]
        ]
        score_exprs.append(f"({' + '.join(terms)}) AS s_{lang}")
    all_zero = " AND ".join(f"s_{lang} = 0" for lang in langs)
    cases = [f"WHEN {all_zero} THEN 'unknown'"]
    for i, lang in enumerate(langs):
        geq = " AND ".join(f"s_{lang} >= s_{other}" for other in langs[i + 1 :])
        cases.append(f"WHEN {geq} THEN '{lang}'" if geq else f"ELSE '{lang}'")
    case_sql = "\n         ".join(cases)
    return f"""
WITH scored AS (
  SELECT doc_id, lang, text, {", ".join(score_exprs)}
  FROM documents
  WHERE array_length(string_split(text, ' ')) BETWEEN 5 AND 5000
    AND length(text) >= 30
    AND CAST(length(text) - length(replace(text, '.', '')) AS DOUBLE) / length(text) < 0.1
), pred AS (
  SELECT doc_id, lang, text,
         CASE {case_sql}
         END AS lang_pred
  FROM scored
), kept AS (
  SELECT doc_id, lang, text FROM pred WHERE lang_pred = lang
), dedup AS (
  SELECT min(doc_id) AS doc_id, arg_min(lang, doc_id) AS lang,
         sha256(text) AS text_sha_hex
  FROM kept GROUP BY sha256(text)
)
SELECT doc_id, lang, text_sha_hex,
       CASE WHEN substr(text_sha_hex, 1, 1) < 'c' THEN 'train' ELSE 'val' END AS split
FROM dedup
"""


def doc_fingerprints(sf_dir: str) -> "rd.Dataset":
    """Whole-document FNV-1a 64 fingerprints (the exact-dup /
    content-addressing primitive), oracle-checked bit-for-bit over the
    FULL corpus since round 4: the DuckDB mirror recomputes the same
    per-byte integer recurrence (list_reduce fold, HUGEINT wraparound —
    the machinery proven on the minhash kernel oracle) and re-applies
    the int64 view's wrap-to-negative."""
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(
        lambda t: pa.table(
            {"doc_id": t["doc_id"], "fingerprint": fingerprint_column(t["text"])}
        ),
        batch_format="pyarrow",
    )


_SQL_DOC_FINGERPRINTS = """
WITH h AS (
  SELECT doc_id,
         CAST(list_reduce(
           list_prepend(CAST(14695981039346656037 AS UBIGINT),
             list_transform(generate_series(1, length(text)),
                            i -> CAST(ord(substr(text, i, 1)) AS UBIGINT))),
           (acc, byte) -> CAST((CAST(xor(acc, byte) AS HUGEINT)
                                * 1099511628211)
                               % 18446744073709551616 AS UBIGINT)
         ) AS HUGEINT) AS fp
  FROM documents
)
SELECT doc_id,
       CAST(CASE WHEN fp >= 9223372036854775808
                 THEN fp - 18446744073709551616 ELSE fp END
            AS BIGINT) AS fingerprint
FROM h
"""


def ann_lsh_topk(sf_dir: str) -> pd.DataFrame:
    """LSH top-k with a per-query ``recall`` column vs the exact
    brute-force answer (both final results are k x #queries rows, so the
    comparison is a tiny driver-side merge — the scans stay distributed).
    Both rankings run the floor-quantized (1e-4 grid) score discipline,
    which makes the WHOLE pipeline SQL-expressible: the oracle
    recomputes hyperplane sign buckets from the embedded
    RandomState(11) plane constants, multi-probes hamming<=3 via
    bit_count(xor(...)), and re-ranks candidates + exact top-5 on the
    same quantized grid — so bucket drift, probe-mask drift or ranking
    drift is a hard hash mismatch."""
    return _approx_topk_with_recall(
        sf_dir,
        lambda ds, q_ids, q_vecs: lsh_topk(
            ds, q_ids, q_vecs, k=5, bits=8, probe_radius=3, concurrency=2,
            round_digits=4,
        ),
        round_digits=4,
    )


def _lsh_topk_oracle_sql(bits: int = 8, dim: int = 64, seed: int = 11,
                         probe_radius: int = 3, k: int = 5) -> str:
    """SQL mirror of ann_lsh_topk (stages/ann.lsh_topk + the recall
    harness): the RandomState(seed) hyperplane constants are embedded
    verbatim (Python repr round-trips float64 exactly); bucket bit b is
    the sign of the plane-b inner product (sign is invariant under the
    Ray side's L2 normalization, so the oracle skips it); multi-probe
    candidacy is hamming<=radius against ANY query bucket via
    bit_count(xor(...)); candidates are then scored against EVERY query
    (the BucketScorer mask is any-query, not per-query) minus self;
    approx and exact rankings both run the floor-quantized 1e-4 grid
    with neighbor_id tie-break; recall = approx hits / exact rows."""
    planes = np.random.RandomState(seed).standard_normal((bits, dim))
    rows = ",\n  ".join(
        "({}, [{}]::DOUBLE[])".format(
            b, ", ".join(repr(float(w)) for w in planes[b]))
        for b in range(bits)
    )
    q = "floor((list_cosine_similarity(e.e, qb.qe)) * 10000 + 0.5) / 10000"
    return f"""
WITH planes(bit, w) AS (VALUES
  {rows}
), emb AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), buck AS (
  SELECT vec_id,
         CAST(SUM(CASE WHEN list_inner_product(e, p.w) > 0
                       THEN CAST(power(2, p.bit) AS BIGINT)
                       ELSE 0 END) AS BIGINT) AS bucket
  FROM emb, planes p GROUP BY vec_id
), qb AS (
  SELECT b.vec_id AS query_id, b.bucket AS qbucket, e.e AS qe
  FROM buck b JOIN emb e USING (vec_id) WHERE b.vec_id < 3
), cand AS (
  SELECT DISTINCT b.vec_id FROM buck b, qb
  WHERE bit_count(xor(b.bucket, qb.qbucket)) <= {probe_radius}
), ascore AS (
  SELECT qb.query_id, e.vec_id AS neighbor_id, {q} AS score
  FROM emb e JOIN cand c ON e.vec_id = c.vec_id, qb
  WHERE e.vec_id <> qb.query_id
), approx AS (
  SELECT query_id, neighbor_id, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, neighbor_id) AS rank
  FROM ascore
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id) <= {k}
), escore AS (
  SELECT qb.query_id, e.vec_id AS neighbor_id, {q} AS score
  FROM emb e, qb WHERE e.vec_id <> qb.query_id
), exact AS (
  SELECT query_id, neighbor_id
  FROM escore
  QUALIFY row_number() OVER (PARTITION BY query_id
                             ORDER BY score DESC, neighbor_id) <= {k}
), rec AS (
  SELECT a.query_id,
         CAST(count(x.neighbor_id) AS DOUBLE)
         / (SELECT count(*) FROM exact e2
            WHERE e2.query_id = a.query_id) AS recall
  FROM approx a LEFT JOIN exact x
    ON a.query_id = x.query_id AND a.neighbor_id = x.neighbor_id
  GROUP BY a.query_id
)
SELECT a.query_id, a.neighbor_id, a.score, a.rank, r.recall
FROM approx a JOIN rec r ON a.query_id = r.query_id
"""


def ann_ivf_topk(sf_dir: str) -> pd.DataFrame:
    """IVF (inverted-file coarse quantizer) top-k with a per-query
    ``recall`` column vs exact brute force — the many-queries scale path
    (stages/ann.py ivf_topk): spherical-k-means cells trained on a
    bounded deterministic sample, scan masked to the queries' nprobe
    nearest cells, no shuffle."""
    from ..stages.ann import ivf_topk

    return _approx_topk_with_recall(
        sf_dir,
        lambda ds, q_ids, q_vecs: ivf_topk(
            ds, q_ids, q_vecs, k=5, n_cells=16, nprobe=4, concurrency=2
        ),
    )


def ann_pq_topk(sf_dir: str) -> pd.DataFrame:
    """Product-quantization top-k with a per-query ``recall`` column vs
    exact brute force — the memory-bound scale path (stages/ann.py
    pq_topk): embeddings compress to one uint8 code per subspace
    (64-dim float -> 8 bytes here), queries stay full precision, and
    scoring is ADC table lookups instead of dot products.  Codebooks
    train on the same bounded deterministic sample contract as IVF."""
    from ..stages.ann import pq_topk

    return _approx_topk_with_recall(
        sf_dir,
        lambda ds, q_ids, q_vecs: pq_topk(
            ds, q_ids, q_vecs, k=5, n_subspaces=8, n_codes=16, concurrency=2
        ),
    )


def cdc_incremental_ann(sf_dir: str) -> pd.DataFrame:
    """Vector index maintained ACROSS commits — the ANN sibling of
    cdc_incremental_minhash: the committed corpus (vec_id % 5 != 0)
    gets its IVF index built ONCE (stages/ann.build_ivf_index: trained
    centroids + cell-sorted postings persisted as parquet); the crawl
    increment (vec_id % 5 == 0) extends the postings in O(increment)
    against the FROZEN quantizer (extend_ivf_index — zero reads of
    existing postings); queries probe the persisted index reading only
    their nprobe cells (predicate pushdown over cell-sorted row
    groups).  The committed corpus is never re-embedded, re-assigned or
    fully rescanned.  No SQL oracle by nature (ANN); hard checks pin
    extended-index == full-corpus ivf_topk under the same centroids
    (bit-equal) plus a recall floor vs brute force, reported here as a
    per-query ``recall`` column."""
    import hashlib as _hl

    from ..stages.ann import build_ivf_index, extend_ivf_index, ivf_index_topk

    def _mod5(keep_new: bool):
        def f(t: pa.Table) -> pa.Table:
            ids = t["vec_id"].to_numpy(zero_copy_only=False)
            m = (ids % 5 == 0) if keep_new else (ids % 5 != 0)
            return _nometa(t.filter(pa.array(m)))

        return f

    def approx(ds, q_ids, q_vecs):
        corpus = ds.map_batches(_mod5(False), batch_format="pyarrow")
        new = ds.map_batches(_mod5(True), batch_format="pyarrow")
        tag = _hl.sha1(f"ivfindex:{sf_dir}".encode()).hexdigest()[:10]
        index_dir = os.path.join(tempfile.gettempdir(), f"ivf_index_{tag}")
        build_ivf_index(corpus, index_dir, n_cells=16)
        extend_ivf_index(new, index_dir)
        return ivf_index_topk(index_dir, q_ids, q_vecs, k=5, nprobe=4,
                              concurrency=2)

    return _approx_topk_with_recall(sf_dir, approx)


def _approx_topk_with_recall(sf_dir: str, approx_fn,
                             round_digits: int | None = None) -> pd.DataFrame:
    """Shared harness for approximate top-k catalog entries: run the
    approximate operator and exact brute force over the same distributed
    scan, then annotate per-query recall (tiny driver-side merge).
    ``round_digits`` quantizes the EXACT ranking too (oracle-bearing
    entries must rank both sides on the same grid)."""
    q = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", 3)],
    )
    q_ids = np.array(q["vec_id"].to_pylist(), dtype=np.int64)
    q_vecs = np.array(q["embedding"].to_pylist(), dtype=np.float64)
    ds = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    approx = approx_fn(ds, q_ids, q_vecs).to_pandas()
    ds2 = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    exact = brute_force_topk(
        ds2, q_ids, q_vecs, k=5, concurrency=2, round_digits=round_digits
    ).to_pandas()
    exact_sets = exact.groupby("query_id")["neighbor_id"].agg(set)
    hit = [
        int(n in exact_sets.get(qid, set()))
        for qid, n in zip(approx["query_id"], approx["neighbor_id"])
    ]
    approx = approx.assign(_hit=hit)
    recall = (
        approx.groupby("query_id")["_hit"].sum() / exact.groupby("query_id").size()
    ).rename("recall")
    out = approx.merge(recall.reset_index(), on="query_id").drop(columns=["_hit"])
    # a query whose probe matched NO rows must still appear — at recall 0
    # with a null neighbor — or the metric silently inflates (the whole
    # point of the column is making recall loss observable)
    missing = sorted(set(q_ids.tolist()) - set(out["query_id"]))
    if missing:
        out = pd.concat(
            [
                out,
                pd.DataFrame(
                    {
                        "query_id": pd.array(missing, dtype="int64"),
                        "neighbor_id": pd.array([-1] * len(missing), dtype="int64"),
                        "score": np.nan,
                        "rank": pd.array([0] * len(missing), dtype="int64"),
                        "recall": 0.0,
                    }
                ),
            ],
            ignore_index=True,
        )
    return out



def dedup_cosine_pairs(sf_dir: str) -> "rd.Dataset":
    """Embedding near-dup pairs: embeddings ∪ slightly-perturbed copies of
    vec_id<20 (re-keyed +300000), LSH-bucketed exact-cosine verify."""
    from ..stages.ann import cosine_pairs

    def perturb(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t["vec_id"], 20))
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "embedding": pa.array([], type=pa.list_(pa.float32()))}
            )
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        m = m * 1.001 + 0.0005  # tiny deterministic drift, cosine ~0.9999
        return pa.table(
            {
                "vec_id": pc.add(t["vec_id"], 300_000),
                "embedding": pa.array([row.astype(np.float32) for row in m],
                                      type=pa.list_(pa.float32())),
            }
        )

    base = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    near = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]).map_batches(
        perturb, batch_format="pyarrow"
    )
    return cosine_pairs(base.union(near), threshold=0.99, round_digits=4,
                        vec_type=pa.list_(pa.float32()))


#: exact all-pairs oracle for the LSH-bucketed operator: at oracle scale
#: DuckDB can afford the quadratic cosine sweep, so any LSH recall loss or
#: skew-guard drop shows up as a hard row/hash mismatch.
_SQL_COSINE_PAIRS = """
WITH pert AS (
  SELECT vec_id + 300000 AS vec_id,
         list_transform(
           CAST(embedding AS DOUBLE[]),
           x -> CAST(CAST(x * CAST(1.001 AS DOUBLE) + CAST(0.0005 AS DOUBLE) AS REAL) AS DOUBLE)
         ) AS emb
  FROM embeddings WHERE vec_id < 20
), allv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  UNION ALL
  SELECT vec_id, emb FROM pert
)
SELECT x.vec_id AS a, y.vec_id AS b,
       floor((list_cosine_similarity(x.emb, y.emb)) * 10000 + 0.5) / 10000 AS cosine
FROM allv x JOIN allv y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.emb, y.emb) >= 0.99
"""


def dedup_semantic_pairs(sf_dir: str) -> "rd.Dataset":
    """SemDeDup-style semantic near-dup pairs (Abbas et al. 2023):
    embeddings ∪ perturbed copies of vec_id in [20, 40) (re-keyed
    +400000), candidates blocked by spherical-kmeans CELL instead of
    hyperplane bands — within a cell everything is a candidate, across
    cells nothing is.  The exact all-pairs oracle makes any cross-cell
    recall loss (a qualifying pair whose members land in different
    cells) a hard row/hash mismatch, so the green row certifies the
    paper's co-location assumption holds on this corpus."""
    from ..stages.ann import semdedup_pairs

    def perturb(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["vec_id"], 20),
                             pc.less(t["vec_id"], 40)))
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "embedding": pa.array([], type=pa.list_(pa.float32()))}
            )
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        m = m * 1.002 + 0.001  # tiny deterministic drift, cosine ~0.999
        return pa.table(
            {
                "vec_id": pc.add(t["vec_id"], 400_000),
                "embedding": pa.array([row.astype(np.float32) for row in m],
                                      type=pa.list_(pa.float32())),
            }
        )

    base = _rpc(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    near = _rpc(f"{sf_dir}/embeddings.parquet",
                columns=["vec_id", "embedding"]).map_batches(
        perturb, batch_format="pyarrow"
    )
    return semdedup_pairs(base.union(near), k=16, threshold=0.99,
                          round_digits=4, vec_type=pa.list_(pa.float32()))


def dedup_semantic_apply(sf_dir: str) -> "rd.Dataset":
    """The COMPLETE SemDeDup prune (Abbas et al. 2023 end-to-end):
    kmeans-cell-blocked near-dup pairs -> pointer-doubling connected
    components -> keep ONE representative per semantic cluster (min
    vec_id — the original survives, its perturbed copies drop) ->
    anti-join the corpus.  Every stage is the engine's existing
    distributed primitive; the oracle rebuilds the same relation from
    the exact all-pairs graph with a recursive closure, so both the
    blocking recall AND the clustering/keep policy are hash-checked."""
    from ..stages.ann import semdedup_pairs
    from ..stages.cluster import connected_components

    def perturb(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.greater_equal(t["vec_id"], 20),
                             pc.less(t["vec_id"], 40)))
        if t.num_rows == 0:
            return pa.table(
                {"vec_id": pa.array([], type=pa.int64()),
                 "embedding": pa.array([], type=pa.list_(pa.float32()))}
            )
        m = np.stack(t["embedding"].to_pylist()).astype(np.float64)
        m = m * 1.002 + 0.001
        return pa.table(
            {
                "vec_id": pc.add(t["vec_id"], 400_000),
                "embedding": pa.array([row.astype(np.float32) for row in m],
                                      type=pa.list_(pa.float32())),
            }
        )

    def allv():
        base = _rpc(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
        near = _rpc(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"]).map_batches(
            perturb, batch_format="pyarrow")
        return base.union(near)

    pairs = semdedup_pairs(allv(), k=16, threshold=0.99, round_digits=4,
                           vec_type=pa.list_(pa.float32()))
    cc = connected_components(pairs, a_col="a", b_col="b")

    def losers(df: pd.DataFrame) -> pd.DataFrame:
        d = df.sort_values(["label", "node"], kind="mergesort")
        return d.loc[d["label"].duplicated(), ["node"]].rename(
            columns={"node": "vec_id"})

    dup_ids = _coarse_final(
        cc.map_batches(lambda t: _nometa(t.select(["node", "label"])),
                       batch_format="pyarrow"),
        "label", losers)
    ids = allv().map_batches(
        lambda t: _nometa(t.select(["vec_id"])), batch_format="pyarrow")
    kept = hash_join(
        ids, dup_ids, on="vec_id", how="anti",
        left_schema=pa.schema([("vec_id", pa.int64())]),
        right_schema=pa.schema([("vec_id", pa.int64())]),
    )
    return kept


_SQL_SEMDEDUP_APPLY = """
WITH RECURSIVE pert AS (
  SELECT vec_id + 400000 AS vec_id,
         list_transform(
           CAST(embedding AS DOUBLE[]),
           x -> CAST(CAST(x * CAST(1.002 AS DOUBLE) + CAST(0.001 AS DOUBLE) AS REAL) AS DOUBLE)
         ) AS emb
  FROM embeddings WHERE vec_id >= 20 AND vec_id < 40
), allv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  UNION ALL
  SELECT vec_id, emb FROM pert
), pairs AS (
  SELECT x.vec_id AS a, y.vec_id AS b
  FROM allv x JOIN allv y ON x.vec_id < y.vec_id
  WHERE list_cosine_similarity(x.emb, y.emb) >= 0.99
), edges AS (
  SELECT a AS x, b AS y FROM pairs UNION SELECT b, a FROM pairs
), walk AS (
  SELECT x AS node, x AS reach FROM edges
  UNION
  SELECT w.node, e.y FROM walk w JOIN edges e ON w.reach = e.x
), labels AS (
  SELECT node, min(reach) AS cluster_id FROM walk GROUP BY node
), losers AS (
  SELECT node FROM (
    SELECT node, row_number() OVER (
      PARTITION BY cluster_id ORDER BY node) AS rn
    FROM labels
  ) WHERE rn > 1
)
SELECT v.vec_id FROM allv v
WHERE v.vec_id NOT IN (SELECT node FROM losers)
"""


#: exact all-pairs oracle — identical shape to _SQL_COSINE_PAIRS but over
#: the semantic-blocking query's own planted set, so the two operators
#: certify independently.
_SQL_SEMDEDUP_PAIRS = """
WITH pert AS (
  SELECT vec_id + 400000 AS vec_id,
         list_transform(
           CAST(embedding AS DOUBLE[]),
           x -> CAST(CAST(x * CAST(1.002 AS DOUBLE) + CAST(0.001 AS DOUBLE) AS REAL) AS DOUBLE)
         ) AS emb
  FROM embeddings WHERE vec_id >= 20 AND vec_id < 40
), allv AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
  UNION ALL
  SELECT vec_id, emb FROM pert
)
SELECT x.vec_id AS a, y.vec_id AS b,
       floor((list_cosine_similarity(x.emb, y.emb)) * 10000 + 0.5) / 10000 AS cosine
FROM allv x JOIN allv y ON x.vec_id < y.vec_id
WHERE list_cosine_similarity(x.emb, y.emb) >= 0.99
"""


def _exact_distinct_count(ds: "rd.Dataset", col: str) -> int:
    """Distributed exact COUNT(DISTINCT): per-batch distinct partial ->
    coarse value-hash partitions -> per-partition nunique -> 64-row sum."""
    partials = ds.map_batches(
        lambda df: df[[col]].drop_duplicates(), batch_format="pandas"
    )
    per_part = _coarse_final(
        partials, col, lambda df: pd.DataFrame({"_n": [df[col].nunique()]})
    )
    out = _final_agg(per_part, lambda df: pd.DataFrame({"n": [df["_n"].sum()]}))
    return int(out.to_pandas()["n"].iloc[0])


def approx_distinct_sketch(sf_dir: str) -> pa.Table:
    """HLL sketch with an error-bound gate: the exact distinct count is
    computed distributed alongside the estimate, and ``est_ok`` asserts
    the sketch is within 5% — a drift in the HLL implementation flips the
    flag and fails the value-hash against the oracle (which emits the
    exact counts and TRUE literals)."""
    from ..functions.sketch import approx_distinct

    li = _rpc(f"{sf_dir}/lineitem.parquet", columns=["l_orderkey"])
    ev = _events(sf_dir, ["user_id"])
    rows = []
    for metric, ds, col in (
        ("distinct_orderkeys", li, "l_orderkey"),
        ("distinct_users", ev, "user_id"),
    ):
        est = float(approx_distinct(ds, col))
        exact = _exact_distinct_count(ds, col)
        rows.append((metric, exact, abs(est - exact) / exact <= 0.05))
    return pa.table(
        {
            "metric": [r[0] for r in rows],
            "exact_count": pa.array([r[1] for r in rows], type=pa.int64()),
            "est_ok": pa.array([r[2] for r in rows], type=pa.bool_()),
        }
    )


_SQL_APPROX_DISTINCT = """
SELECT 'distinct_orderkeys' AS metric,
       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_count, TRUE AS est_ok
FROM lineitem
UNION ALL
SELECT 'distinct_users', CAST(count(DISTINCT user_id) AS BIGINT), TRUE
FROM events
"""

def approx_quantiles_sketch(sf_dir: str) -> pa.Table:
    """KLL quantile sketch over a CONTINUOUS column (l_extendedprice —
    effectively one distinct value per row, where the exact value-count
    approach of lineitem_quantity_quantiles would ship the whole column)
    with a hard error gate: the TRUE rank of each estimated quantile is
    computed distributed (per-batch vectorized counts of values <= est,
    summed), and ``rank_ok`` asserts it sits within 2% of the target
    rank.  A drift in the compactor/merge flips the flag and fails the
    value-hash (oracle emits exact counts + TRUE)."""
    from ..functions.sketch import approx_quantiles

    qs = [0.25, 0.5, 0.75, 0.9]
    ds = _rpc(f"{sf_dir}/lineitem.parquet", columns=["l_extendedprice"])
    acc = approx_quantiles(ds, "l_extendedprice", qs, k=200)
    ests = [acc.quantile(q) for q in qs]

    def rank_partial(t: pa.Table) -> pa.Table:
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "_n": pa.array([len(v)], type=pa.int64()),
                **{
                    f"_le{i}": pa.array([int((v <= e).sum())], type=pa.int64())
                    for i, e in enumerate(ests)
                },
            }
        )

    sums = _final_agg(
        ds.map_batches(rank_partial, batch_format="pyarrow"),
        lambda df: df.sum().to_frame().T,
    ).to_pandas()
    n = int(sums["_n"].iloc[0])
    oks = [
        abs(int(sums[f"_le{i}"].iloc[0]) / n - q) <= 0.02
        for i, q in enumerate(qs)
    ]
    return pa.table(
        {
            "q": pa.array(qs, type=pa.float64()),
            "n": pa.array([n] * len(qs), type=pa.int64()),
            "rank_ok": pa.array(oks, type=pa.bool_()),
        }
    )


_SQL_APPROX_QUANTILES = """
SELECT CAST(0.25 AS DOUBLE) AS q, CAST(count(*) AS BIGINT) AS n, TRUE AS rank_ok FROM lineitem
UNION ALL SELECT 0.5, count(*), TRUE FROM lineitem
UNION ALL SELECT 0.75, count(*), TRUE FROM lineitem
UNION ALL SELECT 0.9, count(*), TRUE FROM lineitem
"""


def doc_token_heavy_hitters(sf_dir: str) -> pa.Table:
    """Top-20 corpus tokens by frequency with a mergeable Misra-Gries
    heavy-hitters summary checked against the exact distributed count.

    Three consumers share ONE materialized per-batch partial (token,
    cnt, fp) — the partials are O(per-batch distinct tokens), not
    O(corpus), so the mid-pipeline materialize holds the reduced
    vocabulary only:

    - exact top-k: coarse fnv-hash partitions -> per-partition sum +
      candidate top-k -> bounded final merge (64 x k candidate rows);
    - an m=64 Misra-Gries sketch whose merged counters are PROVABLY
      exact while the observed vocabulary fits in m (no reduction ever
      fires) — the oracle compares ``mg_count`` against count(*), so an
      insert/merge drift in the sketch is a value-hash mismatch;
    - an m=8 sketch that DOES reduce, gating the PODS'12 invariant
      (counter <= true, counter >= true - err, heavy keys tracked) as
      ``mg8_ok`` — the reduction path ships with teeth, not just a
      unit test.
    """
    from ..functions.sketch import heavy_hitters

    K = 20
    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["text"])

    def count_tokens(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        toks = pc.list_flatten(pc.split_pattern(t["text"], pattern=" "))
        vc = pc.value_counts(toks)
        tok = vc.field("values")
        return pa.table(
            {
                "token": tok,
                "cnt": vc.field("counts").cast(pa.int64()),
                "fp": fingerprint_column(tok),
            }
        )

    partials = ds.map_batches(count_tokens, batch_format="pyarrow").materialize()

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("token", sort=False)["cnt"].sum().reset_index()
        return g.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(K)

    cands = _coarse_final(partials.select_columns(["token", "cnt", "fp"]), "fp", per_part)
    top = _final_agg(
        cands,
        lambda df: df.sort_values(
            ["cnt", "token"], ascending=[False, True], kind="mergesort"
        ).head(K),
    ).to_pandas()

    acc64 = heavy_hitters(partials, "token", "cnt", m=64)
    acc8 = heavy_hitters(partials, "token", "cnt", m=8)

    def inv8_ok(tok: str, exact: int) -> bool:
        c = acc8.counts.get(tok)
        if c is None:  # untracked is only legal for light keys
            return exact <= acc8.err
        return exact - acc8.err <= c <= exact

    toks = top["token"].tolist()
    exacts = top["cnt"].astype("int64").tolist()
    return pa.table(
        {
            "token": pa.array(toks, type=pa.string()),
            "n_occurrences": pa.array(exacts, type=pa.int64()),
            "mg_count": pa.array(
                [int(acc64.counts.get(t, 0)) for t in toks], type=pa.int64()
            ),
            "mg8_ok": pa.array(
                [inv8_ok(t, e) for t, e in zip(toks, exacts)], type=pa.bool_()
            ),
        }
    )


_SQL_HEAVY_HITTERS = """
WITH tok AS (
  SELECT unnest(string_split(text, ' ')) AS token FROM documents
), cnt AS (
  SELECT token, count(*) AS n FROM tok GROUP BY token
)
SELECT token, CAST(n AS BIGINT) AS n_occurrences,
       CAST(n AS BIGINT) AS mg_count, TRUE AS mg8_ok
FROM cnt ORDER BY n DESC, token ASC LIMIT 20
"""


def training_pack_chunks(sf_dir: str) -> "rd.Dataset":
    """Concat-and-chunk sequence packing (stages/packing.py): every doc's
    global token offset + the fixed-256-token chunk range it spans, via
    the two-level distributed prefix sum — the oracle is one SQL window
    cumsum, which is exactly what the operator distributes."""
    docs = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return pack_token_chunks(docs, max_tokens=256)


_SQL_PACK_CHUNKS = """
WITH c AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS ntok
  FROM documents
), p AS (
  SELECT doc_id, ntok,
         CAST(COALESCE(sum(ntok) OVER (
           ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) AS tok_start
  FROM c
)
SELECT doc_id, ntok, tok_start,
       tok_start // 256 AS chunk_start,
       (tok_start + greatest(ntok, 1) - 1) // 256 AS chunk_end
FROM p
"""


def training_weighted_mix(sf_dir: str) -> "rd.Dataset":
    """Deterministic weighted language mix (stages/packing.py): en 100%,
    zh 50%, es 25%, everything else 12.5%, decided by the first
    sha256(text) nibble — reproducible across runs/engines/partitioning,
    no RNG."""
    docs = _rpc(f"{sf_dir}/documents.parquet",
                columns=["doc_id", "lang", "text"])
    return weighted_corpus_mix(docs)


_SQL_WEIGHTED_MIX = """
SELECT doc_id, lang FROM documents
WHERE (lang = 'en')
   OR (lang = 'zh' AND substr(sha256(text), 1, 1)
       IN ('0','1','2','3','4','5','6','7'))
   OR (lang = 'es' AND substr(sha256(text), 1, 1) IN ('0','1','2','3'))
   OR (lang NOT IN ('en','zh','es')
       AND substr(sha256(text), 1, 1) IN ('0','1'))
"""


def multimodal_features(sf_dir: str) -> "rd.Dataset":
    """Media decode: REAL container parsing for the image (BMP) and audio
    (WAV PCM) payloads via the pure-numpy codecs — width/height/RGB/edge
    features and duration/rms/spectral-centroid features come from the
    actual bytes; video rows fall back to the documented deterministic
    stub (no video codec in this container)."""
    from ..stages.multimodal import MediaDecoder

    media = rd.from_arrow(synth_media_table(n=96))
    feats = media.map_batches(
        MediaDecoder, batch_format="pyarrow", batch_size=16, concurrency=2
    )

    def summarize(t: pa.Table) -> pa.Table:
        m = np.asarray(t["features"].combine_chunks().flatten().to_numpy(zero_copy_only=False))
        m = m.reshape(t.num_rows, -1)
        return pa.table(
            {
                "media_id": t["media_id"],
                "kind": t["kind"],
                "feat_mean": pa.array(np.round(m.mean(axis=1), 6), type=pa.float64()),
            }
        )

    return feats.map_batches(summarize, batch_format="pyarrow")


def multimodal_frames(sf_dir: str) -> "rd.Dataset":
    media = rd.from_arrow(synth_media_table(n=96))
    frames = media.map_batches(
        FrameSampler, batch_format="pyarrow", batch_size=16, concurrency=2
    )
    partials = frames.map_batches(
        lambda df: df.groupby("media_id", sort=False).size().rename("_n").reset_index(),
        batch_format="pandas",
    )
    return _final_agg(
        partials,
        lambda df: df.groupby("media_id", sort=False)["_n"].sum().rename("n_frames")
        .reset_index().astype({"n_frames": "int64"}),
    )


def bpe_train_merges(sf_dir: str) -> pd.DataFrame:
    """Distributed BPE tokenizer training over the documents corpus
    (stages/bpe.py): 10 byte-level, word-internal merge rounds, each one
    streaming apply pass + one count pass with coarse pair-hash partial
    reduction (the driver only ever sees <=64 candidate rows per round).
    Deterministic (exact integer counts, count-DESC/pair-ASC ties), so
    the merge table is a fixed function of the corpus — pinned against
    a hand-computed sequence in test_bpe; rows-only driver check
    (iterative algorithm, not SQL-expressible)."""
    from ..stages.bpe import bpe_train

    ds = _rpc(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return bpe_train(ds, n_merges=10)


def multimodal_video_frames(sf_dir: str) -> "rd.Dataset":
    """REAL video decode: uncompressed-AVI fixtures through the
    VideoFrameFeatures actor pool (per-frame mean RGB / luma std /
    motion energy from the actual RIFF bytes), then per-clip totals —
    n_frames plus summed motion.  Rows-only driver check; the planted
    constant-vs-alternating-clip exactness lives in test_codecs."""
    from ..stages.multimodal import VideoFrameFeatures

    media = rd.from_arrow(synth_media_table(n=96, video="avi"))
    frames = media.map_batches(
        VideoFrameFeatures, batch_format="pyarrow", batch_size=8,
        concurrency=2, fn_constructor_kwargs={"strict": True},
    )
    partials = frames.map_batches(
        lambda df: df.groupby("media_id", sort=False)
        .agg(_n=("frame_idx", "size"), _m=("motion", "sum")).reset_index(),
        batch_format="pandas",
    )
    return _final_agg(
        partials,
        lambda df: df.groupby("media_id", sort=False)
        .agg(n_frames=("_n", "sum"), motion_total=("_m", "sum")).reset_index()
        .assign(motion_total=lambda g: _qround(g["motion_total"], 4))
        .astype({"media_id": "int64", "n_frames": "int64"}),
    )


def user_retention_cohorts(sf_dir: str) -> "rd.Dataset":
    """Cohort retention matrix — the classic product-analytics rollup
    (cohort = day of a user's first event; cell = #cohort users active on
    each later day; the testdata spans one month, so daily buckets keep
    the matrix discriminative).  Scale shape: per-batch DISTINCT
    (user, day) partials shrink the stream to at most #users x #days
    rows BEFORE the one coarse user-hash shuffle; the per-bucket sweep
    derives each user's cohort with one vectorized transform('min') (no
    per-user Python), and the surviving (cohort, day) matrix is bounded
    (#days^2), so the last reduce is a single coalesced task."""
    ds = _events(sf_dir, ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        day = pc.strftime(t["ts"], format="%Y-%m-%d")
        df = pd.DataFrame(
            {"user_id": t["user_id"].to_numpy(zero_copy_only=False),
             "day": day.to_pandas()}
        )
        return pa.Table.from_pandas(
            df.drop_duplicates(["user_id", "day"]), preserve_index=False
        )

    def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["user_id", "day"])
        cohort = df.groupby("user_id", sort=False)["day"].transform("min")
        pairs = pd.DataFrame(
            {"cohort_day": cohort, "activity_day": df["day"]}
        )
        return (
            pairs.groupby(["cohort_day", "activity_day"], sort=False)
            .size().rename("_n").reset_index()
        )

    partials = ds.map_batches(partial, batch_format="pyarrow")
    cells = _coarse_final(partials, "user_id", per_bucket)
    return _final_agg(
        cells,
        lambda df: df.groupby(["cohort_day", "activity_day"], sort=False)
        ["_n"].sum().rename("n_users").reset_index()
        .astype({"n_users": "int64"}),
    )


_SQL_RETENTION_COHORTS = """
WITH a AS (SELECT DISTINCT user_id, strftime(ts, '%Y-%m-%d') AS d FROM events),
f AS (SELECT user_id, min(d) AS cohort FROM a GROUP BY 1)
SELECT f.cohort AS cohort_day, a.d AS activity_day, count(*) AS n_users
FROM a JOIN f USING (user_id) GROUP BY 1, 2
"""


def event_type_transitions(sf_dir: str) -> "rd.Dataset":
    """First-order Markov transition counts over each user's ordered
    event stream (the bigram statistic a sequence model or session-flow
    analysis starts from).  Same topology as cdc_prev_event_gap: one
    coarse user-hash shuffle, then ONE vectorized groupby-shift sweep
    per bucket; the (prev, next) matrix is bounded (#types^2), so the
    final sum is a single coalesced task."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["event_type"].shift(1)
        m = prev.notna()
        out = pd.DataFrame(
            {"prev_type": prev[m], "next_type": g["event_type"][m]}
        )
        return (
            out.groupby(["prev_type", "next_type"], sort=False)
            .size().rename("_n").reset_index()
        )

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    partials = parts.groupby("upart").map_groups(
        lambda g: sweep(g.drop(columns=["upart"])), batch_format="pandas"
    )
    return _final_agg(
        partials,
        lambda df: df.groupby(["prev_type", "next_type"], sort=False)
        ["_n"].sum().rename("n").reset_index().astype({"n": "int64"}),
    )


_SQL_EVENT_TRANSITIONS = """
WITH s AS (
  SELECT event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
)
SELECT prev AS prev_type, event_type AS next_type, count(*) AS n
FROM s WHERE prev IS NOT NULL GROUP BY 1, 2
"""


def cdc_running_total(sf_dir: str) -> "rd.Dataset":
    """Per-user running cumulative sum (SUM ... OVER ROWS UNBOUNDED
    PRECEDING) — the running-balance window the gap/top-k/rolling
    entries don't cover.  Cross-engine exactness WITHOUT grid-ulp
    worries: values quantize to integer cents (int64) before the
    cumsum, both engines sum exact integers (order-independent by
    construction, unlike double partials), and dividing identical
    int64s by 100.0 yields identical IEEE doubles.  Topology: one
    coarse user-hash shuffle, then a single vectorized groupby-cumsum
    sweep per bucket — never a Python call per user (CLAUDE.md
    rule 3)."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "value"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        cents = np.floor(g["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        run = pd.Series(cents, index=g.index).groupby(
            g["user_id"], sort=False).cumsum()
        return g.assign(
            run_total=run.to_numpy().astype(np.float64) / 100.0
        )[["user_id", "event_id", "ts", "run_total"]]

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    return parts.groupby("upart").map_groups(
        lambda g: sweep(g.drop(columns=["upart"])), batch_format="pandas"
    )


_SQL_RUNNING_TOTAL = """
SELECT user_id, event_id, ts,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) / 100.0
         AS run_total
FROM events
"""


def event_type_value_corr(sf_dir: str) -> "rd.Dataset":
    """Grouped Pearson correlation from mergeable co-moment partials
    (n, Σx, Σy, Σxy, Σx², Σy²) — the bivariate member of the moments
    family (event value vs hour-of-day: does value drift across the
    day?).  Grid discipline (CLAUDE.md rule 4): x quantizes to the
    0.01 grid, y (hour) is an exact small integer, and the covariance /
    sqrt(varx·vary) expression is mirrored LITERALLY in the SQL so the
    pre-quantization doubles agree; final quantized to 6 digits.  Keys
    are bounded (#event_types), so the final reduce is one coalesced
    task over per-block partials — same shape as
    event_type_value_stats."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = _qround(df["value"], 2)
        y = df["ts"].dt.hour.astype("float64")
        d = pd.DataFrame({"event_type": df["event_type"], "_x": x, "_y": y,
                          "_xy": x * y, "_xx": x * x, "_yy": y * y})
        return (
            d.groupby("event_type", sort=False)
            .agg(_n=("_x", "size"), _sx=("_x", "sum"), _sy=("_y", "sum"),
                 _sxy=("_xy", "sum"), _sxx=("_xx", "sum"), _syy=("_yy", "sum"))
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("event_type", sort=False)
            .agg(_n=("_n", "sum"), _sx=("_sx", "sum"), _sy=("_sy", "sum"),
                 _sxy=("_sxy", "sum"), _sxx=("_sxx", "sum"),
                 _syy=("_syy", "sum"))
            .reset_index()
        )
        n = g["_n"].astype("float64")
        cov = g["_sxy"] - g["_sx"] * g["_sy"] / n
        vx = g["_sxx"] - g["_sx"] * g["_sx"] / n
        vy = g["_syy"] - g["_sy"] * g["_sy"] / n
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_events": g["_n"].astype("int64"),
                "corr_value_hour": _qround(cov / np.sqrt(vx * vy), 6),
            }
        )

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


_SQL_VALUE_CORR = """
WITH q AS (
  SELECT event_type, floor((value) * 100 + 0.5) / 100 AS x,
         CAST(EXTRACT(hour FROM ts) AS DOUBLE) AS y
  FROM events
), a AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM q GROUP BY event_type
)
SELECT event_type, CAST(n AS BIGINT) AS n_events,
       floor(((sxy - sx * sy / n) / sqrt((sxx - sx * sx / n) * (syy - sy * sy / n))) * 1000000 + 0.5) / 1000000 AS corr_value_hour
FROM a
"""


def event_type_value_regression(sf_dir: str) -> "rd.Dataset":
    """Grouped simple linear regression (OLS of value on hour-of-day):
    slope / intercept / r² per event_type — the predictive member of
    the moments family (corr gives direction, regression gives the
    line).  Unlike corr's float partials, EVERY partial here is an
    exact int64: y quantizes to integer cents, x (hour) is already a
    small integer, so Σx, Σy, Σxy, Σx², Σy² accumulate associatively in
    any order and both engines derive the closed-form estimates from
    bit-identical sums (CLAUDE.md rule 4 grid discipline, no partial-
    order dust at all).  Keys are bounded (#event_types) → one
    coalesced final over per-batch partials."""
    ds = _events(sf_dir, ["event_type", "ts", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df["ts"].dt.hour.to_numpy().astype(np.int64)
        y = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        d = pd.DataFrame({"event_type": df["event_type"], "_x": x, "_y": y,
                          "_xy": x * y, "_xx": x * x, "_yy": y * y})
        return (
            d.groupby("event_type", sort=False)
            .agg(_n=("_x", "size"), _sx=("_x", "sum"), _sy=("_y", "sum"),
                 _sxy=("_xy", "sum"), _sxx=("_xx", "sum"), _syy=("_yy", "sum"))
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby("event_type", sort=False)
            .agg(_n=("_n", "sum"), _sx=("_sx", "sum"), _sy=("_sy", "sum"),
                 _sxy=("_sxy", "sum"), _sxx=("_sxx", "sum"),
                 _syy=("_syy", "sum"))
            .reset_index()
        )
        n = g["_n"].astype("float64")
        sx = g["_sx"].astype("float64")
        sy = g["_sy"].astype("float64")
        sxy = g["_sxy"].astype("float64")
        sxx = g["_sxx"].astype("float64")
        syy = g["_syy"].astype("float64")
        cov = sxy - sx * sy / n
        vx = sxx - sx * sx / n
        vy = syy - sy * sy / n
        slope_c = cov / vx                      # cents per hour
        intercept_c = sy / n - slope_c * (sx / n)  # cents at hour 0
        return pd.DataFrame(
            {
                "event_type": g["event_type"],
                "n_events": g["_n"].astype("int64"),
                "slope": _qround(slope_c / 100.0, 6),
                "intercept": _qround(intercept_c / 100.0, 6),
                "r2": _qround(cov * cov / (vx * vy), 6),
            }
        )

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


_SQL_VALUE_REGRESSION = """
WITH q AS (
  SELECT event_type, CAST(EXTRACT(hour FROM ts) AS BIGINT) AS x,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS y
  FROM events
), a AS (
  SELECT event_type, count(*) AS ni,
         sum(x) AS sxi, sum(y) AS syi, sum(x * y) AS sxyi,
         sum(x * x) AS sxxi, sum(y * y) AS syyi
  FROM q GROUP BY event_type
), f AS (
  SELECT event_type, ni,
         CAST(ni AS DOUBLE) AS n, CAST(sxi AS DOUBLE) AS sx,
         CAST(syi AS DOUBLE) AS sy, CAST(sxyi AS DOUBLE) AS sxy,
         CAST(sxxi AS DOUBLE) AS sxx, CAST(syyi AS DOUBLE) AS syy
  FROM a
)
SELECT event_type, CAST(ni AS BIGINT) AS n_events,
       floor((((sxy - sx * sy / n) / (sxx - sx * sx / n)) / 100.0) * 1000000 + 0.5) / 1000000 AS slope,
       floor(((sy / n - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * (sx / n)) / 100.0) * 1000000 + 0.5) / 1000000 AS intercept,
       floor(((sxy - sx * sy / n) * (sxy - sx * sy / n) / ((sxx - sx * sx / n) * (syy - sy * sy / n))) * 1000000 + 0.5) / 1000000 AS r2
FROM f
"""


def user_trailing_7d_value(sf_dir: str) -> "rd.Dataset":
    """Time-RANGE window: per user-day, the trailing 7-calendar-day
    value sum (RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
    — the interval-frame sibling of the ROWS-frame rolling mean.  Days
    are sparse per user, so a ROWS frame is wrong; the window must
    reason over the day axis.

    Scale shape: a per-batch (user, day)→Σcents combiner compresses the
    stream to ≤ users×days rows BEFORE the one coarse user-hash
    exchange.  Per bucket, ONE vectorized sweep: merge partials, sort
    by (user, day), then a composite key `urank·2²² + day_num` makes
    the bucket's (user, day) axis globally monotone so one
    np.searchsorted((comp − 6)) finds every window start at once — the
    7-day lookback can never cross a user boundary because day_num
    (~19–20k for modern dates) dwarfs the 6-day offset.  Windowed sums
    come from one prefix-sum array (csum[i+1] − csum[lo]); exact int64
    cents end-to-end (rule 4)."""
    ds = _events(sf_dir, ["user_id", "ts", "value"])

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        day = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[D]")
        cents = np.floor(
            t["value"].to_numpy(zero_copy_only=False) * 100.0 + 0.5
        ).astype(np.int64)
        g = (
            pd.DataFrame({
                "user_id": t["user_id"].to_numpy(zero_copy_only=False),
                "day_num": day.astype(np.int64),
                "cents": cents,
            })
            .groupby(["user_id", "day_num"], sort=False)["cents"]
            .sum()
            .reset_index()
        )
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df.groupby(["user_id", "day_num"], sort=False)["cents"]
            .sum()
            .reset_index()
            .sort_values(["user_id", "day_num"], kind="mergesort")
        )
        day_num = d["day_num"].to_numpy()
        urank = pd.factorize(d["user_id"].to_numpy())[0].astype(np.int64)
        comp = urank * (1 << 22) + day_num  # day_num < 2^22 for any real date
        cents = d["cents"].to_numpy()
        csum = np.concatenate([[0], np.cumsum(cents)])
        lo = np.searchsorted(comp, comp - 6, side="left")
        trail = csum[np.arange(len(d)) + 1] - csum[lo]
        return pd.DataFrame({
            "user_id": d["user_id"].to_numpy().astype("int64"),
            "day": day_num.astype("datetime64[D]").astype("datetime64[us]"),
            "trail_7d_value": trail.astype(np.float64) / 100.0,
        })

    partials = ds.map_batches(partial, batch_format="pyarrow")
    return _coarse_final(partials, "user_id", sweep)


_SQL_TRAILING_7D = """
WITH d AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT user_id, CAST(day AS TIMESTAMP) AS day,
       CAST(sum(cents) OVER (
         PARTITION BY user_id ORDER BY day
         RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) / 100.0 AS trail_7d_value
FROM d
"""


def event_daily_anomaly(sf_dir: str) -> "rd.Dataset":
    """Ingest-volume anomaly gate: days whose event count deviates more
    than 2 population-σ from that event_type's own daily mean — the
    data-quality monitor a production feed runs per commit (a stuck
    producer or a replay storm shows up as a volume z-score spike
    before any content check fires).  Counts are exact int64 partials
    (per-batch (type, day) census, associative merge); the z expression
    is derived from bit-identical integer sums on both engines and the
    |z| > 2 cut compares identical IEEE doubles, so the filter can
    never disagree (rule 4).  Keys are bounded (#types × #days) → one
    coalesced final."""
    ds = _events(sf_dir, ["event_type", "ts"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        day = df["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        return (
            pd.DataFrame({"event_type": df["event_type"], "day_num": day})
            .groupby(["event_type", "day_num"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df.groupby(["event_type", "day_num"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        s = d.groupby("event_type", sort=False)["c"].agg(
            n="size", s1="sum"
        ).reset_index()
        s2 = d.assign(cc=d["c"] * d["c"]).groupby(
            "event_type", sort=False)["cc"].sum().rename("s2").reset_index()
        s = s.merge(s2, on="event_type")
        m = d.merge(s, on="event_type")
        n = m["n"].astype("float64")
        s1 = m["s1"].astype("float64")
        sq = m["s2"].astype("float64")
        c = m["c"].astype("float64")
        z = (c - s1 / n) / np.sqrt((sq - s1 * s1 / n) / n)
        keep = np.abs(z.to_numpy()) > 2.0
        out = pd.DataFrame({
            "event_type": m["event_type"],
            "day": m["day_num"].to_numpy().astype("datetime64[D]").astype("datetime64[us]"),
            "n_events": m["c"].astype("int64"),
            "z_score": _qround(z, 6),
        })
        return out[keep].reset_index(drop=True)

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


_SQL_DAILY_ANOMALY = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(c) AS DOUBLE) AS s1, CAST(sum(c * c) AS DOUBLE) AS s2
  FROM d GROUP BY 1
)
SELECT d.event_type, CAST(d.day AS TIMESTAMP) AS day,
       CAST(d.c AS BIGINT) AS n_events,
       floor(((CAST(d.c AS DOUBLE) - s1 / n) / sqrt((s2 - s1 * s1 / n) / n)) * 1000000 + 0.5) / 1000000 AS z_score
FROM d JOIN s ON d.event_type = s.event_type
WHERE abs((CAST(d.c AS DOUBLE) - s1 / n) / sqrt((s2 - s1 * s1 / n) / n)) > 2.0
"""


def ab_test_value(sf_dir: str) -> "rd.Dataset":
    """Welch's two-sample t-test per event_type: cohort A = even
    user_id, cohort B = odd (the deterministic assignment an
    experimentation pipeline would hash users into), statistic on the
    event value.  The A/B gate every product-analytics stack runs —
    and the same exact-integer-moments shape as the regression entry:
    per-batch partials are int64 (n, Σcents, Σcents²) per (type,
    cohort), so both engines derive mean/variance/t/Welch-df from
    bit-identical sums (rule 4; no p-value — that needs incomplete
    beta, out of scope for a cross-engine-exact gate).  Bounded keys →
    one coalesced final."""
    ds = _events(sf_dir, ["event_type", "user_id", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        d = pd.DataFrame({
            "event_type": df["event_type"],
            "cohort": (df["user_id"].to_numpy() % 2).astype(np.int64),
            "_c": c, "_cc": c * c,
        })
        return (
            d.groupby(["event_type", "cohort"], sort=False)
            .agg(_n=("_c", "size"), _s=("_c", "sum"), _ss=("_cc", "sum"))
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["event_type", "cohort"], sort=False)
            .agg(_n=("_n", "sum"), _s=("_s", "sum"), _ss=("_ss", "sum"))
            .reset_index()
        )
        w = g.pivot(index="event_type", columns="cohort",
                    values=["_n", "_s", "_ss"])
        na = w[("_n", 0)].astype("float64")
        nb = w[("_n", 1)].astype("float64")
        sa = w[("_s", 0)].astype("float64")
        sb = w[("_s", 1)].astype("float64")
        ssa = w[("_ss", 0)].astype("float64")
        ssb = w[("_ss", 1)].astype("float64")
        ma = sa / na / 100.0
        mb = sb / nb / 100.0
        # unbiased sample variance on the cents grid, then to units²
        va = (ssa - sa * sa / na) / (na - 1.0) / 10000.0
        vb = (ssb - sb * sb / nb) / (nb - 1.0) / 10000.0
        se2 = va / na + vb / nb
        t = (ma - mb) / np.sqrt(se2)
        dfree = se2 * se2 / (
            (va / na) * (va / na) / (na - 1.0)
            + (vb / nb) * (vb / nb) / (nb - 1.0)
        )
        return pd.DataFrame({
            "event_type": w.index,
            "n_a": w[("_n", 0)].astype("int64"),
            "n_b": w[("_n", 1)].astype("int64"),
            "mean_a": _qround(ma, 6),
            "mean_b": _qround(mb, 6),
            "t_stat": _qround(t, 6),
            "welch_df": _qround(dfree, 4),
        }).reset_index(drop=True)

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


_SQL_AB_TEST = """
WITH q AS (
  SELECT event_type, user_id % 2 AS cohort,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS c
  FROM events
), a AS (
  SELECT event_type, cohort, count(*) AS ni, sum(c) AS si,
         sum(c * c) AS ssi
  FROM q GROUP BY 1, 2
), w AS (
  SELECT event_type,
         CAST(max(CASE WHEN cohort = 0 THEN ni END) AS BIGINT) AS n_a_i,
         CAST(max(CASE WHEN cohort = 1 THEN ni END) AS BIGINT) AS n_b_i,
         CAST(max(CASE WHEN cohort = 0 THEN ni END) AS DOUBLE) AS na,
         CAST(max(CASE WHEN cohort = 1 THEN ni END) AS DOUBLE) AS nb,
         CAST(max(CASE WHEN cohort = 0 THEN si END) AS DOUBLE) AS sa,
         CAST(max(CASE WHEN cohort = 1 THEN si END) AS DOUBLE) AS sb,
         CAST(max(CASE WHEN cohort = 0 THEN ssi END) AS DOUBLE) AS ssa,
         CAST(max(CASE WHEN cohort = 1 THEN ssi END) AS DOUBLE) AS ssb
  FROM a GROUP BY event_type
), f AS (
  SELECT event_type, n_a_i, n_b_i,
         sa / na / 100.0 AS ma, sb / nb / 100.0 AS mb,
         (ssa - sa * sa / na) / (na - 1.0) / 10000.0 AS va,
         (ssb - sb * sb / nb) / (nb - 1.0) / 10000.0 AS vb,
         na, nb
  FROM w
)
SELECT event_type, n_a_i AS n_a, n_b_i AS n_b,
       floor(ma * 1000000 + 0.5) / 1000000 AS mean_a,
       floor(mb * 1000000 + 0.5) / 1000000 AS mean_b,
       floor(((ma - mb) / sqrt(va / na + vb / nb)) * 1000000 + 0.5) / 1000000 AS t_stat,
       floor(((va / na + vb / nb) * (va / na + vb / nb) /
              ((va / na) * (va / na) / (na - 1.0) + (vb / nb) * (vb / nb) / (nb - 1.0))) * 10000 + 0.5) / 10000 AS welch_df
FROM f
"""


def event_value_benford(sf_dir: str) -> "rd.Dataset":
    """Benford first-significant-digit conformance per event_type — the
    forensic data-quality gate (fabricated or unit-mangled feeds break
    the log-uniform digit law).  The first digit comes from the DECIMAL
    STRING of the cent-quantized integer (never log10 — exact in both
    engines, no ulp risk at power-of-ten boundaries); digit counts are
    exact int64 partials; the χ² statistic against the Benford
    probabilities uses literal double constants shared by construction
    (the SQL is generated from the same array).  Bounded keys (#types ×
    9 digits) → one coalesced final."""
    ds = _events(sf_dir, ["event_type", "value"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        c = np.floor(df["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        keep = c > 0
        first = (
            pd.Series(c[keep]).astype(str).str[0].astype(np.int64).to_numpy()
        )
        return (
            pd.DataFrame({"event_type": df["event_type"].to_numpy()[keep],
                          "digit": first})
            .groupby(["event_type", "digit"], sort=False)
            .size()
            .rename("c")
            .reset_index()
        )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        d = (
            df.groupby(["event_type", "digit"], sort=False)["c"]
            .sum()
            .reset_index()
        )
        # pivot to one column per digit (0 when absent — an absent digit
        # still contributes its full expected term) and sum the nine χ²
        # terms in EXPLICIT d=1..9 order: float addition isn't
        # associative, so both engines must associate identically
        w = d.pivot_table(index="event_type", columns="digit", values="c",
                          fill_value=0, aggfunc="sum")
        for k in range(1, 10):
            if k not in w.columns:
                w[k] = 0
        n_i = sum(w[k] for k in range(1, 10)).astype("int64")
        n = n_i.astype("float64")
        chi2 = None
        for k in range(1, 10):
            obs = w[k].astype("float64")
            exp = n * _BENFORD_P[k - 1]
            term = (obs - exp) * (obs - exp) / exp
            chi2 = term if chi2 is None else chi2 + term
        return pd.DataFrame({
            "event_type": w.index,
            "n_values": n_i,
            "chi2": _qround(chi2, 6),
        }).reset_index(drop=True)

    return _final_agg(ds.map_batches(partial, batch_format="pandas"), finalize)


#: Benford P(d) = log10(1 + 1/d) as the literal doubles BOTH engines use
#: (the SQL below is generated from this array — never recomputed via log)
_BENFORD_P = [float(np.log10(1.0 + 1.0 / d)) for d in range(1, 10)]


def _benford_sql() -> str:
    """Generated from _BENFORD_P: per-digit observed counts pivot to
    columns (0 when absent), and the nine χ² terms add in EXPLICIT
    d=1..9 left-associative order — the same association the Ray
    finalize uses, so the doubles match bit-for-bit."""
    obs_cols = ",\n         ".join(
        f"COALESCE(max(CASE WHEN digit = {k} THEN c END), 0) AS o{k}"
        for k in range(1, 10))
    n_expr = " + ".join(f"o{k}" for k in range(1, 10))
    terms = " + ".join(
        f"((CAST(o{k} AS DOUBLE) - CAST(n_i AS DOUBLE) * {_BENFORD_P[k-1]!r})"
        f" * (CAST(o{k} AS DOUBLE) - CAST(n_i AS DOUBLE) * {_BENFORD_P[k-1]!r})"
        f" / (CAST(n_i AS DOUBLE) * {_BENFORD_P[k-1]!r}))"
        for k in range(1, 10))
    return f"""
WITH q AS (
  SELECT event_type,
         CAST(substr(CAST(CAST(floor(value * 100 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM events
  WHERE CAST(floor(value * 100 + 0.5) AS BIGINT) > 0
), d AS (
  SELECT event_type, digit, count(*) AS c FROM q GROUP BY 1, 2
), w AS (
  SELECT event_type,
         {obs_cols}
  FROM d GROUP BY event_type
), f AS (
  SELECT *, {n_expr} AS n_i FROM w
)
SELECT event_type, CAST(n_i AS BIGINT) AS n_values,
       floor(({terms}) * 1000000 + 0.5) / 1000000 AS chi2
FROM f
"""


def user_running_distinct(sf_dir: str) -> "rd.Dataset":
    """Per-event running COUNT(DISTINCT event_type) per user — the
    cumulative-novelty window SQL engines refuse as a window aggregate
    (DuckDB rejects COUNT(DISTINCT …) OVER); the standard rewrite is
    first-occurrence flags summed over an ordered frame, and that
    rewrite IS the oracle.  One coarse user-hash exchange (no combiner:
    the output is row-level), then one vectorized sweep per bucket —
    sort by (user, ts, event_id), `duplicated(user, type)` marks first
    sightings in time order, per-user cumsum of the flags.  Exact
    integers end-to-end; event_id makes the order total so both
    engines agree at ts ties."""
    ds = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"])

    def sweep(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        first = (~g.duplicated(subset=["user_id", "event_type"])).to_numpy()
        run = pd.Series(first.astype(np.int64), index=g.index).groupby(
            g["user_id"], sort=False).cumsum()
        return pd.DataFrame({
            "user_id": g["user_id"].to_numpy().astype("int64"),
            "event_id": g["event_id"].to_numpy().astype("int64"),
            "ts": g["ts"],
            "distinct_types_seen": run.to_numpy().astype("int64"),
        })

    parts = ds.map_batches(_add_upart, batch_format="pyarrow",
                           batch_size=65536)
    return parts.groupby("upart").map_groups(
        lambda g: sweep(g.drop(columns=["upart"])), batch_format="pandas"
    )


_SQL_RUNNING_DISTINCT = """
WITH f AS (
  SELECT user_id, event_id, ts,
         CASE WHEN row_number() OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id
         ) = 1 THEN 1 ELSE 0 END AS is_first
  FROM events
)
SELECT user_id, event_id, ts,
       CAST(sum(is_first) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS distinct_types_seen
FROM f
"""


# ===========================================================================
# Catalog

# ---------------------------------------------------------------------------
# TPC-H shape battery completion: Q2/Q6/Q7/Q9/Q10/Q11/Q12/Q19/Q20.  This
# corpus has no partsupp / shipmode / container / comment columns, so those
# shapes substitute lineitem incidence (Q2/Q11/Q20), l_returnflag (Q12) and
# brand+size predicates (Q19) while keeping each query's distinctive plan
# topology.  Float discipline: integer cents/centi-qty grids end-to-end
# (CLAUDE.md rule 4).


def _nation_names(sf_dir: str) -> dict:
    """nationkey -> n_name (25 rows at any scale: bounded driver dim)."""
    n = pq.read_table(f"{sf_dir}/nation.parquet",
                      columns=["n_nationkey", "n_name"])
    return dict(zip(n["n_nationkey"].to_pylist(), n["n_name"].to_pylist()))


def _region_nation_keys(sf_dir: str, r_name: str) -> list:
    """nationkeys of one region (bounded driver dims, as in q5/q8)."""
    nation = pq.read_table(f"{sf_dir}/nation.parquet")
    region = pq.read_table(f"{sf_dir}/region.parquet")
    rk = region.filter(pc.equal(region["r_name"], r_name))["r_regionkey"][0].as_py()
    return nation.filter(
        pc.equal(nation["n_regionkey"], rk))["n_nationkey"].to_pylist()


def _cents64(arr) -> np.ndarray:
    """floor(x*100+0.5) on the exact cent grid, as int64 (rule 4).
    Accepts a pandas Series, numpy array or Arrow array."""
    if hasattr(arr, "to_numpy"):
        try:
            arr = arr.to_numpy(zero_copy_only=False)  # Arrow
        except TypeError:
            arr = arr.to_numpy()  # pandas
    return np.floor(np.asarray(arr, dtype=np.float64) * 100 + 0.5).astype(np.int64)


def q6_forecast_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q6 shape — pure scan-filter-sum, zero shuffles: 1997
    shipments with discount in the 5-7% band and quantity < 24; revenue
    = sum(extendedprice x discount).  The discount band compares on the
    exact centi-grid int (stored doubles re-quantized identically in
    both engines); the sum accumulates int64 cents per batch and one
    coalesced final adds the partials.  The scan prunes to 4 columns at
    the read.  Reference analog: the single-pass money-line totals of
    the claims ETL."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_shipdate", "l_discount", "l_extendedprice", "l_quantity"],
    )

    def partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        dc = pc.cast(pc.floor(pc.add(pc.multiply(
            t["l_discount"], pa.scalar(100.0)), pa.scalar(0.5))), pa.int64())
        mask = pc.and_(
            pc.and_(pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                    pc.less(t["l_shipdate"], pa.scalar(hi))),
            pc.and_(
                pc.and_(pc.greater_equal(dc, pa.scalar(5, pa.int64())),
                        pc.less_equal(dc, pa.scalar(7, pa.int64()))),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            ),
        )
        sel = t.filter(mask)
        cents = np.floor(
            sel["l_extendedprice"].to_numpy(zero_copy_only=False)
            * sel["l_discount"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pa.table({"_c": pa.array([int(cents.sum())], type=pa.int64())})

    return _final_agg(
        li.map_batches(partial, batch_format="pyarrow"),
        lambda df: pd.DataFrame({"revenue": [df["_c"].sum() / 100.0]}),
    )


_SQL_Q6_FORECAST = """
SELECT CAST(sum(CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
  AND CAST(floor(l_discount * 100 + 0.5) AS BIGINT) BETWEEN 5 AND 7
  AND l_quantity < 24
"""


def q12_priority_by_flag(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q12 shape — join + dual conditional counts per bounded
    group (no l_shipmode in this corpus; l_returnflag stands in): for
    1997 shipments, per return flag, how many lines belong to
    critical-priority orders (1-URGENT / 2-HIGH) vs the rest.  The
    shipdate filter prunes lineitem BEFORE the one task-based exchange;
    the flag x 2-counter aggregate is a bounded-key coalesced final."""
    lo, hi = pd.Timestamp("1997-01-01"), pd.Timestamp("1998-01-01")
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"],
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.and_(
                pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
                pc.less(t["l_shipdate"], pa.scalar(hi)),
            )).select(["l_orderkey", "l_returnflag"])
        ),
        batch_format="pyarrow",
    )
    ords = _rpc(f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_orderpriority"])
    j = hash_join(
        li, ords, on="l_orderkey", right_on="o_orderkey",
        left_schema=_pq_cols_schema(sf_dir, "lineitem",
                                    ["l_orderkey", "l_returnflag"]),
        right_schema=_pq_cols_schema(sf_dir, "orders",
                                     ["o_orderkey", "o_orderpriority"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        high = df["o_orderpriority"].isin(["1-URGENT", "2-HIGH"])
        d = pd.DataFrame({"l_returnflag": df["l_returnflag"],
                          "_h": high.astype("int64"),
                          "_l": (~high).astype("int64")})
        return d.groupby("l_returnflag", sort=False).sum().reset_index()

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("l_returnflag", sort=False).sum().reset_index()
        g = g.rename(columns={"_h": "high_line_count", "_l": "low_line_count"})
        return g.sort_values("l_returnflag").reset_index(drop=True).astype(
            {"high_line_count": "int64", "low_line_count": "int64"})

    return _final_agg(j.map_batches(partial, batch_format="pandas"), finalize)


_SQL_Q12_PRIORITY = """
SELECT l_returnflag,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
GROUP BY l_returnflag
ORDER BY l_returnflag
"""


def q7_volume_shipping(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q7 shape — two-nation trade volume by year: revenue of
    1996-1997 shipments where the supplier sits in one nation and the
    ordering customer in the other (both directions).  All four
    scale-growing sides (lineitem, supplier, orders, customer) stream
    through task-based hash joins; nation resolves to two driver ints.
    Lineitem pre-computes (year, cents) BEFORE its exchange so only 4
    narrow columns move; the (supp_nation x cust_nation x year) final
    is bounded (2x2x2)."""
    names = _nation_names(sf_dir)
    inv = {v: k for k, v in names.items()}
    k1, k2 = inv["NATION_12"], inv["NATION_11"]
    lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")

    def li_prep(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        t = t.filter(pc.and_(
            pc.greater_equal(t["l_shipdate"], pa.scalar(lo)),
            pc.less(t["l_shipdate"], pa.scalar(hi))))
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        cents = np.floor(ep * (1 - d) * 100 + 0.5).astype(np.int64)
        return pa.table({
            "l_orderkey": t["l_orderkey"], "l_suppkey": t["l_suppkey"],
            "l_year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
            "cents": pa.array(cents),
        })

    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_shipdate",
                 "l_extendedprice", "l_discount"],
    ).map_batches(li_prep, batch_format="pyarrow")
    li_schema = pa.schema([("l_orderkey", pa.int64()),
                           ("l_suppkey", pa.int64()),
                           ("l_year", pa.int64()), ("cents", pa.int64())])
    sup = _rpc(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: _nometa(t.filter(pc.is_in(
            t["s_nationkey"], value_set=pa.array([k1, k2], pa.int32())))),
        batch_format="pyarrow",
    )
    j1 = hash_join(
        li, sup, on="l_suppkey", right_on="s_suppkey",
        left_schema=li_schema,
        right_schema=_pq_cols_schema(sf_dir, "supplier",
                                     ["s_suppkey", "s_nationkey"]),
    )
    cust = _rpc(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).map_batches(
        lambda t: _nometa(t.filter(pc.is_in(
            t["c_nationkey"], value_set=pa.array([k1, k2], pa.int32())))),
        batch_format="pyarrow",
    )
    ords = _rpc(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    j2 = hash_join(
        ords, cust, on="o_custkey", right_on="c_custkey",
        left_schema=_pq_cols_schema(sf_dir, "orders",
                                    ["o_orderkey", "o_custkey"]),
        right_schema=_pq_cols_schema(sf_dir, "customer",
                                     ["c_custkey", "c_nationkey"]),
    )
    j3 = hash_join(j1, j2, on="l_orderkey", right_on="o_orderkey")

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        sn = df["s_nationkey"].to_numpy()
        cn = df["c_nationkey"].to_numpy()
        keep = ((sn == k1) & (cn == k2)) | ((sn == k2) & (cn == k1))
        d = df.loc[keep, ["s_nationkey", "c_nationkey", "l_year", "cents"]]
        return (d.groupby(["s_nationkey", "c_nationkey", "l_year"], sort=False)
                ["cents"].sum().reset_index())

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["s_nationkey", "c_nationkey", "l_year"], sort=False)
             ["cents"].sum().reset_index())
        g["supp_nation"] = g.pop("s_nationkey").map(names)
        g["cust_nation"] = g.pop("c_nationkey").map(names)
        g["revenue"] = g.pop("cents").to_numpy().astype(np.float64) / 100.0
        return (g[["supp_nation", "cust_nation", "l_year", "revenue"]]
                .sort_values(["supp_nation", "cust_nation", "l_year"])
                .reset_index(drop=True))

    return _final_agg(j3.map_batches(partial, batch_format="pandas"), finalize)


_SQL_Q7_VOLUME = """
WITH j AS (
  SELECT ns.n_name AS supp_nation, nc.n_name AS cust_nation,
         CAST(year(l_shipdate) AS BIGINT) AS l_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ns ON s_nationkey = ns.n_nationkey
  JOIN nation nc ON c_nationkey = nc.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
    AND ((ns.n_name = 'NATION_12' AND nc.n_name = 'NATION_11')
      OR (ns.n_name = 'NATION_11' AND nc.n_name = 'NATION_12'))
)
SELECT supp_nation, cust_nation, l_year,
       CAST(sum(cents) AS DOUBLE) / 100.0 AS revenue
FROM j GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""


def q9_product_profit(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q9 shape — product-type profit by nation and year (no
    partsupp here: p_retailprice x quantity stands in for the supply
    cost).  Three scale-growing joins (part-pruned lineitem, supplier,
    orders) all task-based; the profit amount collapses to one int64
    cents column BEFORE the supplier/orders exchanges so the wide money
    columns never travel twice.  (nation x year) final is bounded."""
    names = _nation_names(sf_dir)
    part_f = _rpc(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name", "p_retailprice"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.match_substring(t["p_name"], "red"))
            .select(["p_partkey", "p_retailprice"])),
        batch_format="pyarrow",
    )
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
                 "l_extendedprice", "l_discount"],
    )
    j1 = hash_join(
        li, part_f, on="l_partkey", right_on="p_partkey",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem",
            ["l_orderkey", "l_partkey", "l_suppkey", "l_quantity",
             "l_extendedprice", "l_discount"]),
        right_schema=_pq_cols_schema(sf_dir, "part",
                                     ["p_partkey", "p_retailprice"]),
    )

    def amount(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        d = t["l_discount"].to_numpy(zero_copy_only=False)
        q = t["l_quantity"].to_numpy(zero_copy_only=False)
        rp = t["p_retailprice"].to_numpy(zero_copy_only=False)
        amt = (np.floor(ep * (1 - d) * 100 + 0.5).astype(np.int64)
               - np.floor(rp * q * 100 + 0.5).astype(np.int64))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "l_suppkey": t["l_suppkey"],
                         "amt": pa.array(amt)})

    slim = j1.map_batches(amount, batch_format="pyarrow")
    slim_schema = pa.schema([("l_orderkey", pa.int64()),
                             ("l_suppkey", pa.int64()), ("amt", pa.int64())])
    sup = _rpc(f"{sf_dir}/supplier.parquet",
               columns=["s_suppkey", "s_nationkey"])
    j2 = hash_join(
        slim, sup, on="l_suppkey", right_on="s_suppkey",
        left_schema=slim_schema,
        right_schema=_pq_cols_schema(sf_dir, "supplier",
                                     ["s_suppkey", "s_nationkey"]),
    )
    ords = _rpc(f"{sf_dir}/orders.parquet",
                columns=["o_orderkey", "o_orderdate"])
    j3 = hash_join(
        j2, ords, on="l_orderkey", right_on="o_orderkey",
        right_schema=_pq_cols_schema(sf_dir, "orders",
                                     ["o_orderkey", "o_orderdate"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({
            "s_nationkey": df["s_nationkey"],
            "o_year": df["o_orderdate"].dt.year.astype("int64"),
            "amt": df["amt"],
        })
        return (d.groupby(["s_nationkey", "o_year"], sort=False)["amt"]
                .sum().reset_index())

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["s_nationkey", "o_year"], sort=False)["amt"]
             .sum().reset_index())
        g["nation"] = g.pop("s_nationkey").map(names)
        g["sum_profit"] = g.pop("amt").to_numpy().astype(np.float64) / 100.0
        return (g[["nation", "o_year", "sum_profit"]]
                .sort_values(["nation", "o_year"],
                             ascending=[True, False]).reset_index(drop=True))

    return _final_agg(j3.map_batches(partial, batch_format="pandas"), finalize)


_SQL_Q9_PROFIT = """
WITH j AS (
  SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)
         - CAST(floor(p_retailprice * l_quantity * 100 + 0.5) AS BIGINT) AS amt
  FROM lineitem
  JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN nation ON s_nationkey = n_nationkey
)
SELECT nation, o_year, CAST(sum(amt) AS DOUBLE) / 100.0 AS sum_profit
FROM j GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""


def q10_returned_items(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q10 shape — top 20 customers by revenue lost to returns in
    one quarter: returned lineitems join their quarter's orders, revenue
    sums per customer inside coarse custkey-hash partitions with a
    per-bucket top-20 (global top-20 is exact: every custkey's rows
    share a bucket), and only the 20 winners join customer identity and
    the 25-row nation map.  Total order (revenue DESC, custkey ASC)
    makes the LIMIT deterministic."""
    names = _nation_names(sf_dir)
    lo, hi = pd.Timestamp("1997-10-01"), pd.Timestamp("1998-01-01")
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: _nometa(_q10_li_prep(t)), batch_format="pyarrow",
    )
    ords = _rpc(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.and_(
                pc.greater_equal(t["o_orderdate"], pa.scalar(lo)),
                pc.less(t["o_orderdate"], pa.scalar(hi)),
            )).select(["o_orderkey", "o_custkey"])),
        batch_format="pyarrow",
    )
    j = hash_join(
        li, ords, on="l_orderkey", right_on="o_orderkey",
        left_schema=pa.schema([("l_orderkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=_pq_cols_schema(sf_dir, "orders",
                                     ["o_orderkey", "o_custkey"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby("o_custkey", sort=False)["cents"]
                .sum().reset_index())

    def local_top(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("o_custkey", sort=False)["cents"].sum().reset_index()
        return g.sort_values(["cents", "o_custkey"],
                             ascending=[False, True],
                             kind="mergesort").head(20)

    cand = _coarse_final(j.map_batches(partial, batch_format="pandas"),
                         "o_custkey", local_top)
    top20 = _final_agg(
        cand,
        lambda df: df.sort_values(["cents", "o_custkey"],
                                  ascending=[False, True],
                                  kind="mergesort").head(20),
    )
    cust = _rpc(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"],
    )
    joined = hash_join(
        top20, cust, on="o_custkey", right_on="c_custkey", num_partitions=8,
        left_schema=pa.schema([("o_custkey", pa.int64()),
                               ("cents", pa.int64())]),
        right_schema=_pq_cols_schema(
            sf_dir, "customer",
            ["c_custkey", "c_name", "c_acctbal", "c_nationkey"]),
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "c_custkey": df["o_custkey"].astype("int64"),
            "c_name": df["c_name"],
            "revenue": df["cents"].to_numpy().astype(np.float64) / 100.0,
            "c_acctbal": df["c_acctbal"],
            "n_name": df["c_nationkey"].map(names),
        })
        return out.sort_values(["revenue", "c_custkey"],
                               ascending=[False, True],
                               kind="mergesort").reset_index(drop=True)

    return _final_agg(joined, finalize)


def _q10_li_prep(t: pa.Table) -> pa.Table:
    t = t.filter(pc.equal(t["l_returnflag"], "R"))
    ep = t["l_extendedprice"].to_numpy(zero_copy_only=False)
    d = t["l_discount"].to_numpy(zero_copy_only=False)
    cents = np.floor(ep * (1 - d) * 100 + 0.5).astype(np.int64)
    return pa.table({"l_orderkey": t["l_orderkey"], "cents": pa.array(cents)})


_SQL_Q10_RETURNED = """
WITH j AS (
  SELECT o_custkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE l_returnflag = 'R'
    AND o_orderdate >= TIMESTAMP '1997-10-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
), g AS (
  SELECT o_custkey, sum(cents) AS cents FROM j GROUP BY o_custkey
)
SELECT c_custkey, c_name, CAST(g.cents AS DOUBLE) / 100.0 AS revenue,
       c_acctbal, n_name
FROM g JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
ORDER BY revenue DESC, c_custkey
LIMIT 20
"""


def q19_disjunctive_revenue(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q19 shape — disjunction of three conjunctive brand/size/
    quantity bands (no container column; p_size bands stand in).  The
    part side prunes to the three brands BEFORE the one task-based
    exchange and lineitem prunes to the overall quantity envelope
    [1, 30]; the residual OR evaluates vectorized after the join.
    Revenue is exact int64 cents; the global sum is one coalesced
    final."""
    brands = ["Brand#2", "Brand#3", "Brand#4"]
    part_f = _rpc(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).map_batches(
        lambda t: _nometa(t.filter(
            pc.is_in(t["p_brand"], value_set=pa.array(brands)))),
        batch_format="pyarrow",
    )
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    ).map_batches(
        lambda t: _nometa(t.filter(pc.and_(
            pc.greater_equal(t["l_quantity"], pa.scalar(1.0)),
            pc.less_equal(t["l_quantity"], pa.scalar(30.0))))),
        batch_format="pyarrow",
    )
    j = hash_join(
        li, part_f, on="l_partkey", right_on="p_partkey",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem",
            ["l_partkey", "l_quantity", "l_extendedprice", "l_discount"]),
        right_schema=_pq_cols_schema(sf_dir, "part",
                                     ["p_partkey", "p_brand", "p_size"]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        b = df["p_brand"].to_numpy()
        s = df["p_size"].to_numpy()
        q = df["l_quantity"].to_numpy()
        keep = (
            ((b == "Brand#2") & (s >= 1) & (s <= 15) & (q >= 1) & (q <= 11))
            | ((b == "Brand#3") & (s >= 1) & (s <= 25) & (q >= 10) & (q <= 20))
            | ((b == "Brand#4") & (s >= 1) & (s <= 35) & (q >= 20) & (q <= 30))
        )
        d = df.loc[keep]
        cents = np.floor(
            d["l_extendedprice"].to_numpy()
            * (1 - d["l_discount"].to_numpy()) * 100 + 0.5
        ).astype(np.int64)
        return pd.DataFrame({"_c": [int(cents.sum())]})

    return _final_agg(
        j.map_batches(partial, batch_format="pandas"),
        lambda df: pd.DataFrame({"revenue": [df["_c"].sum() / 100.0]}),
    )


_SQL_Q19_DISJUNCT = """
SELECT CAST(sum(CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#4' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30)
"""


def q2_min_acctbal_supplier(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q2 shape — correlated per-group MIN with join-back (no
    partsupp: the (part, supplier) incidence comes from lineitem and
    s_acctbal stands in for ps_supplycost): among EUROPE suppliers
    shipping STANDARD parts of size <= 10, the minimum-balance
    supplier(s) per part.  One coarse partkey-hash sweep dedupes the
    incidence pairs, computes the per-part min AND selects the argmin
    rows (all rows of a part share the bucket, so min + join-back is
    one vectorized transform, not a second exchange).  Total order +
    LIMIT 100 mirrors Q2's output discipline."""
    names = _nation_names(sf_dir)
    eu = _region_nation_keys(sf_dir, "EUROPE")
    part_f = _rpc(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_name", "p_type", "p_size"],
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.and_(pc.equal(t["p_type"], "STANDARD"),
                             pc.less_equal(t["p_size"], 10)))
            .select(["p_partkey", "p_name"])),
        batch_format="pyarrow",
    )
    li = _rpc(f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
    j1 = hash_join(
        li, part_f, on="l_partkey", right_on="p_partkey",
        left_schema=_pq_cols_schema(sf_dir, "lineitem",
                                    ["l_partkey", "l_suppkey"]),
        right_schema=_pq_cols_schema(sf_dir, "part", ["p_partkey", "p_name"]),
    )
    sup_f = _rpc(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_name", "s_nationkey", "s_acctbal"],
    ).map_batches(
        lambda t: _nometa(t.filter(pc.is_in(
            t["s_nationkey"], value_set=pa.array(eu, pa.int32())))),
        batch_format="pyarrow",
    )
    j2 = hash_join(
        j1, sup_f, on="l_suppkey", right_on="s_suppkey",
        right_schema=_pq_cols_schema(
            sf_dir, "supplier",
            ["s_suppkey", "s_name", "s_nationkey", "s_acctbal"]),
    )

    def winners(df: pd.DataFrame) -> pd.DataFrame:
        d = df.drop_duplicates(subset=["l_partkey", "l_suppkey"]).copy()
        d["_cents"] = np.floor(
            d["s_acctbal"].to_numpy() * 100 + 0.5).astype(np.int64)
        mn = d.groupby("l_partkey", sort=False)["_cents"].transform("min")
        return d.loc[d["_cents"] == mn]

    cand = _coarse_final(j2, "l_partkey", winners)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "s_acctbal": df["_cents"].to_numpy().astype(np.float64) / 100.0,
            "s_name": df["s_name"],
            "n_name": df["s_nationkey"].map(names),
            "p_partkey": df["l_partkey"].astype("int64"),
            "p_name": df["p_name"],
            "s_suppkey": df["l_suppkey"].astype("int64"),
        })
        return out.sort_values(
            ["s_acctbal", "p_partkey", "s_suppkey"],
            ascending=[False, True, True], kind="mergesort",
        ).head(100).reset_index(drop=True)

    return _final_agg(cand, finalize)


_SQL_Q2_MIN_SUPP = """
WITH pairs AS (
  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
), eu AS (
  SELECT s_suppkey, s_name, n_name,
         CAST(floor(s_acctbal * 100 + 0.5) AS BIGINT) AS cents
  FROM supplier
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
), j AS (
  SELECT p.p_partkey, p.p_name, eu.*
  FROM pairs
  JOIN part p ON l_partkey = p_partkey
    AND p_type = 'STANDARD' AND p_size <= 10
  JOIN eu ON l_suppkey = eu.s_suppkey
), m AS (
  SELECT *, min(cents) OVER (PARTITION BY p_partkey) AS mn FROM j
)
SELECT CAST(cents AS DOUBLE) / 100.0 AS s_acctbal, s_name, n_name,
       p_partkey, p_name, s_suppkey
FROM m WHERE cents = mn
ORDER BY s_acctbal DESC, p_partkey, s_suppkey
LIMIT 100
"""


def q11_important_parts(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q11 shape — grouped value vs a global-total threshold (no
    partsupp: one nation's suppliers' shipped extendedprice stands in
    for supplycost x availqty): parts whose NATION_7-supplied value
    exceeds 0.1% of that nation's total.  The per-part values
    materialize ONCE (an O(#parts) aggregate — the view, not the fact
    table), the grand total reduces from it as two driver ints, and the
    threshold filter is exact integer cross-multiplication
    (value_cents * 1000 > total_cents).  At most 1000 rows can pass by
    construction, so the ordered final is bounded at any scale."""
    inv = {v: k for k, v in _nation_names(sf_dir).items()}
    k7 = inv["NATION_12"]
    sup_f = _rpc(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.equal(t["s_nationkey"],
                              pa.scalar(k7, pa.int32())))
            .select(["s_suppkey"])),
        batch_format="pyarrow",
    )
    li = _rpc(f"{sf_dir}/lineitem.parquet",
              columns=["l_partkey", "l_suppkey", "l_extendedprice"])
    j = hash_join(
        li, sup_f, on="l_suppkey", right_on="s_suppkey", how="semi",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_extendedprice"]),
        right_schema=pa.schema([("s_suppkey", pa.int64())]),
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"l_partkey": df["l_partkey"],
                          "_c": _cents64(df["l_extendedprice"])})
        return d.groupby("l_partkey", sort=False)["_c"].sum().reset_index()

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        return df.groupby("l_partkey", sort=False)["_c"].sum().reset_index()

    vals = _coarse_final(
        j.map_batches(partial, batch_format="pandas"), "l_partkey", per_part
    ).materialize()  # O(#parts) rows: the aggregate view, reused twice
    total = int(_final_agg(
        vals, lambda df: pd.DataFrame({"_t": [int(df["_c"].sum())]})
    ).to_pandas()["_t"].iloc[0])

    hot = vals.map_batches(
        lambda t, tot: _nometa(t.filter(pc.greater(
            pc.multiply(t["_c"], pa.scalar(1000, pa.int64())),
            pa.scalar(tot, pa.int64())))),
        batch_format="pyarrow", fn_kwargs={"tot": total},
    )

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({
            "p_partkey": df["l_partkey"].astype("int64"),
            "value": df["_c"].to_numpy().astype(np.float64) / 100.0,
        })
        return out.sort_values(["value", "p_partkey"],
                               ascending=[False, True],
                               kind="mergesort").reset_index(drop=True)

    return _final_agg(hot, finalize)


_SQL_Q11_IMPORTANT = """
WITH g AS (
  SELECT l_partkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
  WHERE l_suppkey IN (
    SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_12')
), v AS (
  SELECT l_partkey, sum(cents) AS val FROM g GROUP BY l_partkey
), t AS (
  SELECT sum(val) AS total FROM v
)
SELECT l_partkey AS p_partkey, CAST(val AS DOUBLE) / 100.0 AS value
FROM v, t WHERE val * 1000 > total
ORDER BY value DESC, p_partkey
"""


def q20_excess_shippers(sf_dir: str) -> "rd.Dataset":
    """TPC-H Q20 shape — nested semi-joins with a correlated
    two-granularity threshold (no partsupp: 'supplied the MAJORITY of a
    red part's 1997 volume' stands in for availqty > half of a year's
    demand): per-(part, supplier) 1997 quantities aggregate against the
    per-part 1997 total in the SAME coarse partkey space (one sweep
    computes both granularities and applies the threshold — all rows of
    a part share the bucket), on the exact centi-quantity grid
    (2 x q_supp > q_part); the surviving supplier keys then semi-join
    the supplier roster for identity."""
    part_f = _rpc(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).map_batches(
        lambda t: _nometa(
            t.filter(pc.match_substring(t["p_name"], "red"))
            .select(["p_partkey"])),
        batch_format="pyarrow",
    )
    li = _rpc(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
    ).map_batches(
        lambda t: _nometa(t.filter(pc.equal(
            pc.year(t["l_shipdate"]), pa.scalar(1997, pa.int64())))
            .select(["l_partkey", "l_suppkey", "l_quantity"])),
        batch_format="pyarrow",
    )
    li_red = hash_join(
        li, part_f, on="l_partkey", right_on="p_partkey", how="semi",
        left_schema=_pq_cols_schema(
            sf_dir, "lineitem", ["l_partkey", "l_suppkey", "l_quantity"]),
        right_schema=pa.schema([("p_partkey", pa.int64())]),
    )

    def partials(df: pd.DataFrame) -> pd.DataFrame:
        d = pd.DataFrame({"l_partkey": df["l_partkey"],
                          "l_suppkey": df["l_suppkey"],
                          "_q": _cents64(df["l_quantity"])})
        return (d.groupby(["l_partkey", "l_suppkey"], sort=False)["_q"]
                .sum().reset_index())

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        g = (df.groupby(["l_partkey", "l_suppkey"], sort=False)["_q"]
             .sum().reset_index())
        tot = g.groupby("l_partkey", sort=False)["_q"].transform("sum")
        win = g.loc[2 * g["_q"].to_numpy() > tot.to_numpy()]
        return win[["l_suppkey"]].drop_duplicates()

    excess = _coarse_final(
        li_red.map_batches(partials, batch_format="pandas"),
        "l_partkey", per_part,
    )
    sup = _rpc(f"{sf_dir}/supplier.parquet",
               columns=["s_suppkey", "s_name"])
    winners = hash_join(
        sup, excess, on="s_suppkey", right_on="l_suppkey", how="semi",
        left_schema=_pq_cols_schema(sf_dir, "supplier",
                                    ["s_suppkey", "s_name"]),
        right_schema=pa.schema([("l_suppkey", pa.int64())]),
    )
    return _final_agg(
        winners,
        lambda df: df.drop_duplicates(subset=["s_suppkey"])
        .sort_values("s_suppkey").reset_index(drop=True)
        .astype({"s_suppkey": "int64"}),
    )


_SQL_Q20_EXCESS = """
WITH red AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc
  FROM lineitem
  WHERE year(l_shipdate) = 1997
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE '%red%')
), ps AS (
  SELECT l_partkey, l_suppkey, sum(qc) AS q97
  FROM red GROUP BY l_partkey, l_suppkey
), tot AS (
  SELECT l_partkey, sum(q97) AS total FROM ps GROUP BY l_partkey
), ex AS (
  SELECT DISTINCT ps.l_suppkey
  FROM ps JOIN tot ON ps.l_partkey = tot.l_partkey
  WHERE 2 * ps.q97 > tot.total
)
SELECT s_suppkey, s_name FROM supplier
WHERE s_suppkey IN (SELECT l_suppkey FROM ex)
ORDER BY s_suppkey
"""

def lineitem_skyline(sf_dir: str) -> "rd.Dataset":
    """Pareto frontier (skyline operator, Börzsönyi et al. 2001): the
    maximal (quantity, price) points — rows no other row dominates
    (>= on both dims, > on at least one) — with the multiplicity of
    each surviving point.  Scale shape: the union of per-batch local
    skylines contains the global skyline (a globally non-dominated row
    is non-dominated in its own batch), so each batch collapses to one
    (qty, local max price, count-at-max) row per quantity — the
    quantity axis is a bounded grid (1..50), so the partial stream is
    ~#batches x 50 rows and the final single-task sweep (_final_agg,
    bounded keys) runs the running-max dominance scan over <=50 groups.
    An unbounded first axis would use a sort + per-range sweep instead;
    the bounded-grid assumption is what licenses the coalesced final.
    Prices ride the cents grid (rule 4)."""
    ds = _rpc(f"{sf_dir}/lineitem.parquet",
              columns=["l_quantity", "l_extendedprice"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        q = df["l_quantity"].astype("int64")
        p = _qround(df["l_extendedprice"], 2)
        g = pd.DataFrame({"qty": q, "price": p})
        mx = g.groupby("qty", sort=False)["price"].transform("max")
        at_max = g[g["price"] == mx]
        out = (at_max.groupby(["qty", "price"], sort=False)
               .size().reset_index(name="n"))
        return out

    def final(df: pd.DataFrame) -> pd.DataFrame:
        mx = df.groupby("qty", sort=False)["price"].transform("max")
        df = df[df["price"] == mx]
        g = (df.groupby(["qty", "price"], sort=False)["n"]
             .sum().reset_index())
        g = g.sort_values("qty", ascending=False, kind="mergesort")
        run = g["price"].cummax().shift(1)
        keep = run.isna() | (g["price"] > run)
        out = g[keep].sort_values("qty", kind="mergesort")
        return pd.DataFrame({
            "qty": out["qty"].astype("int64"),
            "price": out["price"],
            "n": out["n"].astype("int64"),
        })

    partials = ds.map_batches(partial, batch_format="pandas")
    return _final_agg(partials, final)


_SQL_SKYLINE = """
WITH pts AS (
  SELECT CAST(l_quantity AS BIGINT) AS qty,
         floor(l_extendedprice * 100 + 0.5) / 100 AS price
  FROM lineitem
), g AS (
  SELECT qty, max(price) AS gmax FROM pts GROUP BY qty
), c AS (
  SELECT p.qty, g.gmax AS price, count(*) AS n
  FROM pts p JOIN g ON p.qty = g.qty AND p.price = g.gmax
  GROUP BY p.qty, g.gmax
), w AS (
  SELECT qty, price, n,
         max(price) OVER (ORDER BY qty DESC
                          ROWS BETWEEN UNBOUNDED PRECEDING
                          AND 1 PRECEDING) AS mgt
  FROM c
)
SELECT qty, price, n FROM w
WHERE mgt IS NULL OR price > mgt
ORDER BY qty
"""


def _fuzzy_name_project(t: pa.Table) -> pa.Table:
    """Shared final projection of the fuzzy-pair entries: emit the name
    pair in lexicographic order (name_a < name_b), matching the
    oracles' join predicate."""
    if t.num_rows == 0:
        return pa.table({"name_a": pa.array([], type=pa.string()),
                         "name_b": pa.array([], type=pa.string())})
    a = t["name_a"].to_numpy(zero_copy_only=False)
    b = t["name_b"].to_numpy(zero_copy_only=False)
    sw = a > b
    return pa.table({
        "name_a": pa.array(np.where(sw, b, a), type=pa.string()),
        "name_b": pa.array(np.where(sw, a, b), type=pa.string()),
    })


def customer_fuzzy_pairs(sf_dir: str) -> "rd.Dataset":
    """Entity-resolution fuzzy self-join: customer-name pairs within
    edit distance 1 (byte semantics == character semantics on this
    ASCII key).  Scale shape: FastSS deletion-neighborhood blocking
    (stages/fuzzy.py) — candidate generation is a key groupby with
    EXACT recall (never an all-pairs scan; the oracle's quadratic
    levenshtein cross join is what this operator exists to avoid),
    degenerate key buckets are capped AND counted, global pair dedup is
    one coarse exchange, and the final verify is the exact vectorized
    dist<=1 predicate, so the result matches the cross join
    row-for-row."""
    from ..stages.fuzzy import fuzzy_pairs_edit1

    ds = _rpc(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    pairs = fuzzy_pairs_edit1(ds, id_col="c_custkey", name_col="c_name")

    return pairs.map_batches(_fuzzy_name_project, batch_format="pyarrow")


_SQL_FUZZY_PAIRS = """
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM customer a JOIN customer b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 1
ORDER BY name_a, name_b
"""


def customer_fuzzy_pairs_k2(sf_dir: str) -> "rd.Dataset":
    """Fuzzy self-join at edit distance <= 2 — the k=2 tier of
    customer_fuzzy_pairs: FastSS 2-deletion neighborhoods (still
    exact-recall blocking — every substitution deletes one byte on
    both sides, every indel one byte on one side) and a banded
    Levenshtein DP verify (maxlen x 5 vectorized steps per batch, never
    a per-pair Python DP).  Wider neighborhoods mean larger natural
    buckets, so the cap defaults higher (4096) and stays counted."""
    from ..stages.fuzzy import fuzzy_pairs

    ds = _rpc(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_name"])
    pairs = fuzzy_pairs(ds, id_col="c_custkey", name_col="c_name", k=2)
    return pairs.map_batches(_fuzzy_name_project, batch_format="pyarrow")


_SQL_FUZZY_PAIRS_K2 = """
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM customer a JOIN customer b ON a.c_name < b.c_name
WHERE levenshtein(a.c_name, b.c_name) <= 2
ORDER BY name_a, name_b
"""


def customer_fuzzy_clusters(sf_dir: str) -> "rd.Dataset":
    """Entity-resolution CLUSTERS — the deliverable of record linkage:
    fuzzy name pairs blocked by nation -> connected components ->
    (c_custkey, cluster_id = min member).  Blocking rides INSIDE the
    match key (name '|' zero-padded nation): all segments are
    fixed-width, so dist<=1 on the combined key is EXACTLY "same
    nation AND name dist<=1" (equal lengths make lev<=1 ⇔ hamming<=1,
    which decomposes by position) — no post-join filter, one operator.
    Components come from the shared pointer-doubling clusterer
    (stages/cluster.py, O(log diameter) rounds); only paired nodes are
    emitted (singletons are their own clusters by definition), matching
    the oracle's edge-walk scope."""
    from ..stages.cluster import connected_components
    from ..stages.fuzzy import fuzzy_pairs

    ds = _rpc(f"{sf_dir}/customer.parquet",
              columns=["c_custkey", "c_name", "c_nationkey"])

    def with_key(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        nat = pc.utf8_lpad(pc.cast(t["c_nationkey"], pa.string()), 2, "0")
        return pa.table({
            "c_custkey": t["c_custkey"],
            "nm": pc.binary_join_element_wise(t["c_name"], nat, "|"),
        })

    keyed = ds.map_batches(with_key, batch_format="pyarrow")
    pairs = fuzzy_pairs(keyed, id_col="c_custkey", name_col="nm", k=1)
    cc = connected_components(pairs, a_col="a", b_col="b")
    return cc.map_batches(
        lambda t: pa.table({"c_custkey": t["node"],
                            "cluster_id": t["label"]}),
        batch_format="pyarrow",
    )


_SQL_FUZZY_CLUSTERS = """
WITH RECURSIVE nk AS MATERIALIZED (
  SELECT c_custkey,
         c_name || '|' || lpad(CAST(c_nationkey AS VARCHAR), 2, '0') AS nm
  FROM customer
), fp AS MATERIALIZED (
  SELECT a.c_custkey AS a, b.c_custkey AS b
  FROM nk a JOIN nk b ON a.c_custkey < b.c_custkey
  WHERE levenshtein(a.nm, b.nm) <= 1
), edges AS MATERIALIZED (
  SELECT a AS x, b AS y FROM fp UNION SELECT b, a FROM fp
), walk AS (
  SELECT x AS node, x AS reach FROM edges
  UNION
  SELECT w.node, e.y FROM walk w JOIN edges e ON w.reach = e.x
)
SELECT node AS c_custkey, min(reach) AS cluster_id FROM walk GROUP BY node
"""


def cdc_incremental_fuzzy(sf_dir: str) -> "rd.Dataset":
    """Ingest-time fuzzy-duplicate detection against a committed
    corpus — entity resolution as an INCREMENTAL operator: the first
    80% of customers (dense ids; K = floor(0.8·n) from the parquet
    footer row count) are the committed side whose deletion-key index
    was persisted once (stages/fuzzy.build_fuzzy_key_index); the
    increment is the remaining 20%.  Key compute is O(increment); the
    corpus contributes only its narrow index read; old×old pairs are
    side-filtered before any exchange.  Result: new-involving name
    pairs at edit distance <= 1, matching the oracle's filtered
    levenshtein cross join row-for-row."""
    from ..stages.fuzzy import build_fuzzy_key_index, incremental_fuzzy_pairs

    path = f"{sf_dir}/customer.parquet"
    n = pq.ParquetFile(path).metadata.num_rows
    K = int(n * 8 // 10)
    ds = _rpc(path, columns=["c_custkey", "c_name"])

    def old_side(t: pa.Table) -> pa.Table:
        return _nometa(t.filter(pc.less(t["c_custkey"], K)))

    def new_side(t: pa.Table) -> pa.Table:
        return _nometa(t.filter(pc.greater_equal(t["c_custkey"], K)))

    import hashlib as _hl
    tag = _hl.sha1(f"incfuzzy:{sf_dir}".encode()).hexdigest()[:10]
    index_dir = os.path.join(tempfile.gettempdir(), f"incfz_index_{tag}")
    build_fuzzy_key_index(ds.map_batches(old_side, batch_format="pyarrow"),
                          index_dir, id_col="c_custkey", name_col="c_name")
    pairs = incremental_fuzzy_pairs(
        ds.map_batches(new_side, batch_format="pyarrow"), index_dir,
        id_col="c_custkey", name_col="c_name")

    return pairs.map_batches(_fuzzy_name_project, batch_format="pyarrow")


_SQL_INCREMENTAL_FUZZY = """
WITH k AS (SELECT CAST(floor(count(*) * 0.8) AS BIGINT) AS kv FROM customer)
SELECT a.c_name AS name_a, b.c_name AS name_b
FROM customer a JOIN customer b ON a.c_name < b.c_name, k
WHERE levenshtein(a.c_name, b.c_name) <= 1
  AND (a.c_custkey >= k.kv OR b.c_custkey >= k.kv)
ORDER BY name_a, name_b
"""


def events_profile(sf_dir: str) -> "rd.Dataset":
    """Table profiling / ANALYZE: per-column row count, null count,
    EXACT distinct count, min/max and quantized mean over `events` —
    the statistics a planner or data-quality monitor collects.  Scale
    shape: TWO streaming passes over the pruned columns (scalar stats
    and distinct keys have different exchange shapes; re-reading pruned
    parquet beats pinning the whole table in the object store, which is
    why this deliberately does NOT materialize the input — rule 9
    trades re-execution against held memory and at profile scale the
    read is the cheap side).  Scalar stats (n/nulls/min/max/sum)
    collapse to one row per column per batch; distinct counts exchange
    per-batch-unique (column, value) rows through a coarse value-hash
    dedup (each distinct value crosses once, never the raw rows); the
    final merge is a bounded #columns-row reduce.  Means ride exact
    integer grids (cents for `value`; raw int64 sums otherwise) so the
    derived doubles are IEEE-identical to the SQL mirror.  Double
    distinctness compares bit patterns — equal to SQL DISTINCT absent
    -0.0/NaN (none on the 2-dp-positive grid here; documented)."""
    NUM = ["event_id", "user_id", "value"]
    STR = ["event_type"]
    ds = _events(sf_dir, NUM + STR)

    def stat_partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        t = _nometa(t)
        rows = {k: [] for k in ("column", "n", "nulls", "min_num",
                                "max_num", "sum_num", "nn",
                                "min_str", "max_str", "nd")}
        for c in NUM + STR:
            arr = t[c]
            rows["column"].append(c)
            rows["n"].append(len(arr))
            rows["nulls"].append(arr.null_count)
            rows["nd"].append(0)
            if c in NUM:
                if c == "value":
                    v = _qround(arr.to_numpy(zero_copy_only=False), 2)
                    v = v[~np.isnan(v)]
                    s = int(np.round(v * 100).astype(np.int64).sum())
                else:
                    v = arr.drop_null().to_numpy(zero_copy_only=False) \
                           .astype(np.int64)
                    s = int(v.sum())
                rows["min_num"].append(float(v.min()) if len(v) else None)
                rows["max_num"].append(float(v.max()) if len(v) else None)
                rows["sum_num"].append(s)
                rows["nn"].append(int(len(v)))
                rows["min_str"].append(None)
                rows["max_str"].append(None)
            else:
                sv = arr.drop_null()
                rows["min_num"].append(None)
                rows["max_num"].append(None)
                rows["sum_num"].append(0)
                rows["nn"].append(len(sv))
                rows["min_str"].append(
                    pc.min(sv).as_py() if len(sv) else None)
                rows["max_str"].append(
                    pc.max(sv).as_py() if len(sv) else None)
        return pa.table({
            "column": pa.array(rows["column"], type=pa.string()),
            "n": pa.array(rows["n"], type=pa.int64()),
            "nulls": pa.array(rows["nulls"], type=pa.int64()),
            "min_num": pa.array(rows["min_num"], type=pa.float64()),
            "max_num": pa.array(rows["max_num"], type=pa.float64()),
            "sum_num": pa.array(rows["sum_num"], type=pa.int64()),
            "nn": pa.array(rows["nn"], type=pa.int64()),
            "min_str": pa.array(rows["min_str"], type=pa.string()),
            "max_str": pa.array(rows["max_str"], type=pa.string()),
            "nd": pa.array(rows["nd"], type=pa.int64()),
        })

    def dis_partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        t = _nometa(t)
        cols, ivs, svs = [], [], []
        for c in NUM:
            arr = t[c].drop_null().to_numpy(zero_copy_only=False)
            if c == "value":
                u = np.unique(_qround(arr, 2)).view(np.int64)
            else:
                u = np.unique(arr.astype(np.int64))
            cols.append(np.full(len(u), NUM.index(c), dtype=np.int64))
            ivs.append(u)
            svs.append(np.full(len(u), "", dtype=object))
        st = t[STR[0]].drop_null()
        su = pc.unique(st)
        cols.append(np.full(len(su), len(NUM), dtype=np.int64))
        ivs.append(np.zeros(len(su), dtype=np.int64))
        svs.append(np.asarray(su.to_pylist(), dtype=object))
        ci = np.concatenate(cols)
        iv = np.concatenate(ivs)
        sv = pa.array(np.concatenate(svs), type=pa.string())
        key = fingerprint_column(sv).to_numpy(zero_copy_only=False) \
            .view(np.uint64) ^ iv.view(np.uint64) ^ (ci.view(np.uint64) << 56)
        return pa.table({
            "ci": pa.array(ci), "iv": pa.array(iv), "sv": sv,
            "dpart": pa.array((key % np.uint64(64)).astype(np.int64)),
        })

    def dis_count(df: pd.DataFrame) -> pa.Table:
        g = (df.drop_duplicates(["ci", "iv", "sv"])
             .groupby("ci", sort=False).size().reset_index(name="nd"))
        names = [(NUM + STR)[int(i)] for i in g["ci"]]
        z = np.zeros(len(g), dtype=np.int64)
        return pa.table({
            "column": pa.array(names, type=pa.string()),
            "n": pa.array(z), "nulls": pa.array(z),
            "min_num": pa.array([None] * len(g), type=pa.float64()),
            "max_num": pa.array([None] * len(g), type=pa.float64()),
            "sum_num": pa.array(z), "nn": pa.array(z),
            "min_str": pa.array([None] * len(g), type=pa.string()),
            "max_str": pa.array([None] * len(g), type=pa.string()),
            "nd": pa.array(g["nd"].to_numpy(dtype=np.int64)),
        })

    stats = ds.map_batches(stat_partial, batch_format="pyarrow")
    dis = ds.map_batches(dis_partial, batch_format="pyarrow") \
            .groupby("dpart").map_groups(dis_count, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("column", sort=False)
        out = pd.DataFrame({
            "n": g["n"].sum(), "nulls": g["nulls"].sum(),
            "n_distinct": g["nd"].sum(),
            "min_num": g["min_num"].min(), "max_num": g["max_num"].max(),
            "_sum": g["sum_num"].sum(), "_nn": g["nn"].sum(),
            # object columns mix str and NaN: a plain groupby min would
            # compare str<=float; bounded groups make the lambda cheap
            "min_str": g["min_str"].agg(
                lambda s: s.dropna().min() if s.notna().any() else None),
            "max_str": g["max_str"].agg(
                lambda s: s.dropna().max() if s.notna().any() else None),
        }).reset_index()
        # value sums are cents; integer columns raw — scale per column
        scale = np.where(out["column"] == "value", 100.0, 1.0)
        mean = (out["_sum"].to_numpy(dtype=np.float64) / scale) \
            / out["_nn"].to_numpy(dtype=np.float64)
        is_num = out["column"].isin(NUM).to_numpy()
        return pd.DataFrame({
            "column": out["column"],
            "n": out["n"].astype("int64"),
            "nulls": out["nulls"].astype("int64"),
            "n_distinct": out["n_distinct"].astype("int64"),
            "min_num": out["min_num"],
            "max_num": out["max_num"],
            "mean": np.where(is_num, _qround(mean, 4), np.nan),
            "min_str": out["min_str"],
            "max_str": out["max_str"],
        })

    return _final_agg(stats.union(dis), final)


def _profile_sql() -> str:
    num = {"event_id": "event_id", "user_id": "user_id",
           "value": "floor(value * 100 + 0.5) / 100"}
    parts = []
    for c, expr in num.items():
        cents = "CAST(floor(value * 100 + 0.5) AS BIGINT)" if c == "value" \
            else f"CAST({c} AS BIGINT)"
        div = "100.0" if c == "value" else "1.0"
        parts.append(f"""
SELECT '{c}' AS "column", count(*) AS n,
       count(*) - count({c}) AS nulls,
       count(DISTINCT {expr}) AS n_distinct,
       CAST(min({expr}) AS DOUBLE) AS min_num,
       CAST(max({expr}) AS DOUBLE) AS max_num,
       {_sql_q(f'(sum({cents}) / {div}) / count({c})', 4)} AS mean,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
FROM events""")
    parts.append("""
SELECT 'event_type' AS "column", count(*) AS n,
       count(*) - count(event_type) AS nulls,
       count(DISTINCT event_type) AS n_distinct,
       CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
       CAST(NULL AS DOUBLE) AS mean,
       min(event_type) AS min_str, max(event_type) AS max_str
FROM events""")
    return " UNION ALL ".join(parts) + ' ORDER BY "column"'


QUERIES = {
    # --- driver evidence routing (scripts/rotate_queries.py):
    # the driver checks list(QUERIES)[:50] per round, so
    # never-driver-checked oracle-bearing entries lead.
    "doc_fingerprints": doc_fingerprints,
    "dedup_cosine_pairs": dedup_cosine_pairs,
    "lang_id_pred": lang_id_pred,
    "approx_distinct_sketch": approx_distinct_sketch,
    "ann_lsh_topk": ann_lsh_topk,
    "dedup_simhash_pairs": dedup_simhash_pairs,
    "dedup_minhash_pairs": dedup_minhash_pairs,
    "events_interval_join": events_interval_join,
    "events_interval_join_left": events_interval_join_left,
    "dedup_minhash_signatures": dedup_minhash_signatures,
    "dedup_simhash_signatures": dedup_simhash_signatures,
    "cdc_fast_count": cdc_fast_count,
    "event_type_value_regression": event_type_value_regression,
    "user_trailing_7d_value": user_trailing_7d_value,
    "event_daily_anomaly": event_daily_anomaly,
    "user_running_distinct": user_running_distinct,
    "cdc_debezium_export": cdc_debezium_export,
    "ab_test_value": ab_test_value,
    "event_value_benford": event_value_benford,
    "cdc_partition_evolution": cdc_partition_evolution,
    "customer_fuzzy_pairs": customer_fuzzy_pairs,
    "lineitem_skyline": lineitem_skyline,
    "cdc_incremental_fuzzy": cdc_incremental_fuzzy,
    "graph_bfs_hops": graph_bfs_hops,
    "events_profile": events_profile,
    "customer_fuzzy_pairs_k2": customer_fuzzy_pairs_k2,
    "customer_fuzzy_clusters": customer_fuzzy_clusters,
    "graph_pagerank_personalized": graph_pagerank_personalized,
    "cdc_incremental_minhash": cdc_incremental_minhash,
    "embedding_pca_project": embedding_pca_project,
    "ann_ivf_topk": ann_ivf_topk,
    "ann_pq_topk": ann_pq_topk,
    "cdc_incremental_ann": cdc_incremental_ann,
    "multimodal_video_frames": multimodal_video_frames,
    "graph_pagerank": graph_pagerank,
    "cdc_tag_read": cdc_tag_read,
    "doc_bigram_fluency": doc_bigram_fluency,
    "user_active_streak": user_active_streak,
    "doc_ngram_overlap_frac": doc_ngram_overlap_frac,
    "user_value_window_ranks": user_value_window_ranks,
    "user_event_type_pivot": user_event_type_pivot,
    "event_value_outliers": event_value_outliers,
    "doc_token_cooccurrence": doc_token_cooccurrence,
    "doc_chunk_windows": doc_chunk_windows,
    "cdc_expectations": cdc_expectations,
    "q4_late_orders": q4_late_orders,
    "lineitem_price_p25_cont": lineitem_price_p25_cont,
    "orders_cube": orders_cube,
    "cdc_ivm_join": cdc_ivm_join,
    "cdc_materialized_view": cdc_materialized_view,
    # --- below the <=50 driver gate: remaining never-checked, then the
    # driver-green set (all pinned by the local oracle sweep)
    "cdc_materialized_stats": cdc_materialized_stats,
    "dedup_apply_best_docs": dedup_apply_best_docs,
    "q6_forecast_revenue": q6_forecast_revenue,
    "q12_priority_by_flag": q12_priority_by_flag,
    "q7_volume_shipping": q7_volume_shipping,
    "q9_product_profit": q9_product_profit,
    "q10_returned_items": q10_returned_items,
    "q19_disjunctive_revenue": q19_disjunctive_revenue,
    "q2_min_acctbal_supplier": q2_min_acctbal_supplier,
    "q11_important_parts": q11_important_parts,
    "q20_excess_shippers": q20_excess_shippers,
    "events_props_extract": events_props_extract,
    "doc_lang_temperature_weights": doc_lang_temperature_weights,
    "chunk_exact_dups": chunk_exact_dups,
    "events_asof_forward": events_asof_forward,
    "training_token_budget_sample": training_token_budget_sample,
    "q14_promo_revenue": q14_promo_revenue,
    "q16_supplier_cnt": q16_supplier_cnt,
    "q18_large_orders": q18_large_orders,
    "q17_small_qty_revenue": q17_small_qty_revenue,
    "q13_order_count_distribution": q13_order_count_distribution,
    "q15_top_supplier": q15_top_supplier,
    "q22_dormant_customers": q22_dormant_customers,
    "doc_pmi_collocations": doc_pmi_collocations,
    "doc_winnow_fingerprints": doc_winnow_fingerprints,
    "cdc_hopping_window": cdc_hopping_window,
    "q8_market_share": q8_market_share,
    "embedding_sq8_error": embedding_sq8_error,
    "q21_sole_supplier": q21_sole_supplier,
    "embedding_hard_negatives": embedding_hard_negatives,
    "events_touch_attribution": events_touch_attribution,
    "embedding_covariance": embedding_covariance,
    "cdc_compaction": cdc_compaction,
    "cdc_copartition_join": cdc_copartition_join,
    "decontaminate_docs": decontaminate_docs,
    "training_corpus": training_corpus,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_cluster_docs": dedup_cluster_docs,
    "dedup_apply_docs": dedup_apply_docs,
    "events_asof_join": events_asof_join,
    "events_value_bands": events_value_bands,
    "doc_token_unpivot": doc_token_unpivot,
    "doc_tfidf_topterms": doc_tfidf_topterms,
    "doc_token_heavy_hitters": doc_token_heavy_hitters,
    "approx_quantiles_sketch": approx_quantiles_sketch,
    "doc_bpe_token_stats": doc_bpe_token_stats,
    "doc_pii_redact": doc_pii_redact,
    "doc_repetition_stats": doc_repetition_stats,
    "doc_content_sample": doc_content_sample,
    "doc_lang_quota_sample": doc_lang_quota_sample,
    "doc_stratified_sample": doc_stratified_sample,
    "user_top_event_type": user_top_event_type,
    "user_train_val_split": user_train_val_split,
    "dedup_semantic_pairs": dedup_semantic_pairs,
    "cdc_gdpr_purge": cdc_gdpr_purge,
    "cdc_temporal_join": cdc_temporal_join,
    "doc_compression_ratio": doc_compression_ratio,
    "dedup_semantic_apply": dedup_semantic_apply,
    "cdc_branch_merge": cdc_branch_merge,
    "cdc_debezium_ingest": cdc_debezium_ingest,
    "training_pack_chunks": training_pack_chunks,
    "training_weighted_mix": training_weighted_mix,
    "doc_substring_dup": doc_substring_dup,
    "cdc_incremental_dedup": cdc_incremental_dedup,
    "embedding_centroid_scores": embedding_centroid_scores,
    "doc_bm25_search": doc_bm25_search,
    "doc_oov_rate": doc_oov_rate,
    "training_shard_shuffle": training_shard_shuffle,
    "doc_lang_median_filter": doc_lang_median_filter,
    "user_funnel": user_funnel,
    "hybrid_search_rrf": hybrid_search_rrf,
    "doc_rarity_score": doc_rarity_score,
    "lang_token_drift": lang_token_drift,
    "cdc_projection_scan": cdc_projection_scan,
    "embedding_kmeans": embedding_kmeans,
    "bpe_train_merges": bpe_train_merges,
    "embedding_diversity_sample": embedding_diversity_sample,
    "user_retention_cohorts": user_retention_cohorts,
    "event_type_transitions": event_type_transitions,
    "cdc_running_total": cdc_running_total,
    "event_type_value_corr": event_type_value_corr,
    "cdc_zorder_scan": cdc_zorder_scan,
    "cdc_smart_scan": cdc_smart_scan,
    "cdc_lww_latest": cdc_lww_latest,
    "cdc_lww_tombstone": cdc_lww_tombstone,
    "cdc_first_occurrence": cdc_first_occurrence,
    "cdc_partition_stats": cdc_partition_stats,
    "cdc_sessionize": cdc_sessionize,
    "cdc_era_merge": cdc_era_merge,
    "cdc_dim_route": cdc_dim_route,
    "cdc_dead_letter": cdc_dead_letter,
    "closure_rollup_events": closure_rollup_events,
    "cdc_multi_sink_route": cdc_multi_sink_route,
    "cdc_prev_event_gap": cdc_prev_event_gap,
    "events_scalar_decode": events_scalar_decode,
    "user_month_spans": user_month_spans,
    "top_events_by_value": top_events_by_value,
    "cdc_user_topk_events": cdc_user_topk_events,
    "cdc_tumbling_window": cdc_tumbling_window,
    "cdc_rolling_value_mean": cdc_rolling_value_mean,
    "order_status_revenue_native_join": order_status_revenue_native_join,
    "user_customer_full_outer": user_customer_full_outer,
    "customer_order_counts": customer_order_counts,
    "events_value_histogram": events_value_histogram,
    "lineitem_quantity_quantiles": lineitem_quantity_quantiles,
    "event_type_exact_median": event_type_exact_median,
    "event_type_value_stats": event_type_value_stats,
    "user_distinct_event_types": user_distinct_event_types,
    "orders_rollup": orders_rollup,
    "repos_lake_ingest": repos_lake_ingest,
    "cdc_scd2_history": cdc_scd2_history,
    "cdc_patch_merge": cdc_patch_merge,
    "cdc_time_travel_diff": cdc_time_travel_diff,
    "cdc_incremental_stats": cdc_incremental_stats,
    "cdc_incremental_token_df": cdc_incremental_token_df,
    "cdc_point_lookup": cdc_point_lookup,
    "cdc_range_scan": cdc_range_scan,
    "cdc_eq_scan": cdc_eq_scan,
    "cdc_token_search": cdc_token_search,
    "cdc_inplace_rewrite": cdc_inplace_rewrite,
    "cdc_schema_evolution": cdc_schema_evolution,
    "cdc_replica_sync": cdc_replica_sync,
    "cdc_wap_publish": cdc_wap_publish,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_top_orders": q3_top_orders,
    "q5_local_supplier": q5_local_supplier,
    "top_customers_by_spend": top_customers_by_spend,
    "order_priority_counts": order_priority_counts,
    "orders_by_month": orders_by_month,
    "part_type_stats": part_type_stats,
    "supplier_balance_by_nation": supplier_balance_by_nation,
    "lineitem_distinct_suppliers": lineitem_distinct_suppliers,
    "lineitem_bloom_semi_join": lineitem_bloom_semi_join,
    "doc_token_stats": doc_token_stats,
    "doc_quality_filter": doc_quality_filter,
    "lang_doc_stats": lang_doc_stats,
    "dedup_exact_docs": dedup_exact_docs,
    "ann_cosine_topk": ann_cosine_topk,
    "embedding_norms": embedding_norms,
    "multimodal_features": multimodal_features,
    "multimodal_frames": multimodal_frames,
}

ORACLE_SQL = {
    "cdc_lww_latest": _SQL_LWW,
    "cdc_lww_tombstone": _SQL_LWW_TOMBSTONE,
    "cdc_first_occurrence": _SQL_FIRST,
    "cdc_partition_stats": _SQL_PARTITION_STATS,
    "cdc_sessionize": _SQL_SESSIONIZE,
    "cdc_era_merge": _SQL_ERA_MERGE,
    "cdc_dim_route": _SQL_DIM_ROUTE,
    "cdc_dead_letter": _SQL_DEAD_LETTER,
    "closure_rollup_events": _SQL_CLOSURE_ROLLUP,
    "cdc_multi_sink_route": _SQL_MULTI_SINK,
    "cdc_prev_event_gap": _SQL_PREV_GAP,
    "events_scalar_decode": _SQL_SCALAR_DECODE,
    "user_month_spans": _SQL_MONTH_SPANS,
    "top_events_by_value": _SQL_TOP_EVENTS,
    "cdc_user_topk_events": _SQL_USER_TOPK,
    "cdc_tumbling_window": _SQL_TUMBLING,
    "cdc_rolling_value_mean": _SQL_ROLLING,
    "order_status_revenue_native_join": _SQL_NATIVE_JOIN,
    "user_customer_full_outer": _SQL_FULL_OUTER,
    "customer_order_counts": _SQL_CUST_ORDER_COUNTS,
    "events_value_histogram": _SQL_VALUE_HISTOGRAM,
    "lineitem_quantity_quantiles": _SQL_QUANTILES,
    "event_type_exact_median": _SQL_EXACT_MEDIAN,
    "event_type_value_stats": _SQL_VALUE_STATS,
    "user_distinct_event_types": _SQL_DISTINCT_TYPES,
    "orders_rollup": _SQL_ORDERS_ROLLUP,
    "repos_lake_ingest": _SQL_REPOS_LAKE,
    "cdc_scd2_history": _SQL_SCD2,
    "cdc_patch_merge": _SQL_PATCH_MERGE,
    "cdc_time_travel_diff": _SQL_TIME_TRAVEL_DIFF,
    "cdc_incremental_stats": _SQL_INCREMENTAL_STATS,
    "cdc_incremental_token_df": _SQL_INCREMENTAL_TOKEN_DF,
    "cdc_ivm_join": _SQL_IVM_JOIN,
    "cdc_materialized_view": _SQL_IVM_JOIN,
    "cdc_materialized_stats": _SQL_INCREMENTAL_STATS,
    "dedup_apply_best_docs": _SQL_DEDUP_APPLY_BEST,
    "q6_forecast_revenue": _SQL_Q6_FORECAST,
    "q12_priority_by_flag": _SQL_Q12_PRIORITY,
    "q7_volume_shipping": _SQL_Q7_VOLUME,
    "q9_product_profit": _SQL_Q9_PROFIT,
    "q10_returned_items": _SQL_Q10_RETURNED,
    "q19_disjunctive_revenue": _SQL_Q19_DISJUNCT,
    "q2_min_acctbal_supplier": _SQL_Q2_MIN_SUPP,
    "q11_important_parts": _SQL_Q11_IMPORTANT,
    "q20_excess_shippers": _SQL_Q20_EXCESS,
    "cdc_point_lookup": _SQL_POINT_LOOKUP,
    "cdc_range_scan": _SQL_RANGE_SCAN,
    "cdc_eq_scan": _SQL_EQ_SCAN,
    "cdc_token_search": _SQL_TOKEN_SEARCH,
    "cdc_inplace_rewrite": _SQL_INPLACE_REWRITE,
    "cdc_schema_evolution": _SQL_REPOS_LAKE,
    "cdc_replica_sync": _SQL_REPOS_LAKE,
    "cdc_wap_publish": _SQL_REPOS_LAKE,
    "cdc_branch_merge": _SQL_REPOS_LAKE,
    "cdc_debezium_ingest": _SQL_REPOS_LAKE,
    "cdc_debezium_export": _SQL_REPOS_LAKE,
    "cdc_partition_evolution": _SQL_REPOS_LAKE,
    "q1_pricing_summary": _SQL_Q1,
    "q3_top_orders": _SQL_Q3,
    "q5_local_supplier": _SQL_Q5,
    "top_customers_by_spend": _SQL_TOP_CUSTOMERS,
    "order_priority_counts": _SQL_PRIORITY,
    "orders_by_month": _SQL_ORDERS_BY_MONTH,
    "part_type_stats": _SQL_PART_STATS,
    "supplier_balance_by_nation": _SQL_SUPPLIER_BAL,
    "lineitem_distinct_suppliers": _SQL_DISTINCT_SUPP,
    "lineitem_bloom_semi_join": _SQL_BLOOM_SEMI,
    "doc_token_stats": _SQL_DOC_TOKEN_STATS,
    "doc_bpe_token_stats": _SQL_BPE_TOKEN_STATS,
    "doc_token_heavy_hitters": _SQL_HEAVY_HITTERS,
    "doc_tfidf_topterms": _SQL_TFIDF,
    "approx_quantiles_sketch": _SQL_APPROX_QUANTILES,
    "events_asof_join": _SQL_ASOF_JOIN,
    "events_interval_join": _SQL_INTERVAL_JOIN,
    "events_interval_join_left": _SQL_INTERVAL_JOIN_LEFT,
    "dedup_minhash_signatures": _minhash_sig_oracle_sql(),
    "dedup_minhash_pairs": _minhash_pairs_oracle_sql(),
    "dedup_simhash_signatures": _simhash_sig_oracle_sql(),
    "dedup_simhash_pairs": _simhash_pairs_oracle_sql(),
    "doc_fingerprints": _SQL_DOC_FINGERPRINTS,
    "cdc_fast_count": _SQL_FAST_COUNT,
    "events_value_bands": _SQL_VALUE_BANDS,
    "doc_token_unpivot": _SQL_TOKEN_UNPIVOT,
    "doc_quality_filter": _SQL_QUALITY_FILTER,
    "doc_content_sample": _SQL_CONTENT_SAMPLE,
    "doc_lang_quota_sample": _SQL_QUOTA_SAMPLE,
    "doc_stratified_sample": _SQL_STRATIFIED_SAMPLE,
    "user_top_event_type": _SQL_TOP_EVENT_TYPE,
    "doc_pii_redact": _sql_pii_redact(),
    "user_train_val_split": _SQL_TRAIN_VAL_SPLIT,
    "training_pack_chunks": _SQL_PACK_CHUNKS,
    "training_weighted_mix": _SQL_WEIGHTED_MIX,
    "doc_substring_dup": _SQL_SUBSTRING_DUP,
    "embedding_centroid_scores": _SQL_CENTROID_SCORES,
    "doc_bm25_search": _sql_bm25(),
    "doc_oov_rate": _SQL_OOV_RATE,
    "training_shard_shuffle": _SQL_SHARD_SHUFFLE,
    "doc_lang_median_filter": _SQL_LANG_MEDIAN_FILTER,
    "user_funnel": _SQL_FUNNEL,
    "hybrid_search_rrf": _sql_hybrid(),
    "doc_rarity_score": _SQL_RARITY,
    "lang_token_drift": _SQL_LANG_DRIFT,
    "cdc_projection_scan": _SQL_PROJECTION_SCAN,
    "cdc_incremental_dedup": _SQL_INCREMENTAL_DEDUP,
    "lang_doc_stats": _SQL_LANG_DOC_STATS,
    "dedup_exact_docs": _SQL_DEDUP_EXACT,
    "decontaminate_docs": _SQL_DECONTAMINATE,
    "doc_repetition_stats": _SQL_REPETITION,
    "dedup_ngram_jaccard": _SQL_NGRAM_JACCARD,
    "dedup_cluster_docs": _SQL_CLUSTER_DOCS,
    "dedup_apply_docs": _SQL_DEDUP_APPLY,
    "training_corpus": _training_corpus_sql(),
    "ann_cosine_topk": _SQL_ANN_TOPK,
    "embedding_norms": _SQL_EMBEDDING_NORMS,
    # formerly rows-only, now hard-checked
    "lang_id_pred": _lang_id_oracle_sql(),
    "ann_lsh_topk": _lsh_topk_oracle_sql(),
    "dedup_cosine_pairs": _SQL_COSINE_PAIRS,
    "dedup_semantic_pairs": _SQL_SEMDEDUP_PAIRS,
    "cdc_gdpr_purge": _SQL_GDPR_PURGE,
    "graph_pagerank": _pagerank_oracle_sql(),
    "cdc_temporal_join": _SQL_TEMPORAL_JOIN,
    "dedup_semantic_apply": _SQL_SEMDEDUP_APPLY,
    "approx_distinct_sketch": _SQL_APPROX_DISTINCT,
    "user_retention_cohorts": _SQL_RETENTION_COHORTS,
    "event_type_transitions": _SQL_EVENT_TRANSITIONS,
    "cdc_running_total": _SQL_RUNNING_TOTAL,
    "event_type_value_corr": _SQL_VALUE_CORR,
    "cdc_zorder_scan": _SQL_ZORDER_SCAN,
    "cdc_smart_scan": _SQL_SMART_SCAN,
    "cdc_tag_read": _SQL_TAG_READ,
    "doc_bigram_fluency": _SQL_BIGRAM_FLUENCY,
    "user_active_streak": _SQL_ACTIVE_STREAK,
    "doc_ngram_overlap_frac": _SQL_NGRAM_OVERLAP,
    "doc_chunk_windows": _SQL_CHUNK_WINDOWS,
    "cdc_expectations": _SQL_EXPECTATIONS,
    "q4_late_orders": _SQL_Q4_LATE,
    "lineitem_price_p25_cont": _SQL_P25_CONT,
    "q14_promo_revenue": _SQL_Q14_PROMO,
    "q16_supplier_cnt": _SQL_Q16_SUPPLIER_CNT,
    "q18_large_orders": _SQL_Q18_LARGE,
    "q17_small_qty_revenue": _SQL_Q17_SMALL_QTY,
    "q13_order_count_distribution": _SQL_Q13_CUSTDIST,
    "q15_top_supplier": _SQL_Q15_TOP_SUPPLIER,
    "q22_dormant_customers": _SQL_Q22_DORMANT,
    "doc_pmi_collocations": _SQL_PMI_COLLOCATIONS,
    "doc_winnow_fingerprints": _SQL_WINNOW,
    "cdc_hopping_window": _SQL_HOPPING_WINDOW,
    "q8_market_share": _SQL_Q8_MARKET_SHARE,
    "embedding_sq8_error": _SQL_SQ8_ERROR,
    "q21_sole_supplier": _SQL_Q21_SOLE_SUPPLIER,
    "embedding_hard_negatives": _SQL_HARD_NEGATIVES,
    "events_touch_attribution": _SQL_TOUCH_ATTRIBUTION,
    "embedding_covariance": _SQL_EMBEDDING_COVARIANCE,
    "cdc_compaction": _SQL_REPOS_LAKE,
    "cdc_copartition_join": _SQL_IVM_JOIN,
    "event_type_value_regression": _SQL_VALUE_REGRESSION,
    "user_trailing_7d_value": _SQL_TRAILING_7D,
    "event_daily_anomaly": _SQL_DAILY_ANOMALY,
    "user_running_distinct": _SQL_RUNNING_DISTINCT,
    "ab_test_value": _SQL_AB_TEST,
    "customer_fuzzy_pairs": _SQL_FUZZY_PAIRS,
    "lineitem_skyline": _SQL_SKYLINE,
    "cdc_incremental_fuzzy": _SQL_INCREMENTAL_FUZZY,
    "graph_bfs_hops": _SQL_BFS_HOPS,
    "events_profile": _profile_sql(),
    "customer_fuzzy_pairs_k2": _SQL_FUZZY_PAIRS_K2,
    "customer_fuzzy_clusters": _SQL_FUZZY_CLUSTERS,
    "graph_pagerank_personalized": _ppr_oracle_sql(),
    "event_value_benford": _benford_sql(),
    "orders_cube": _SQL_ORDERS_CUBE,
    "events_props_extract": _SQL_PROPS_EXTRACT,
    "doc_lang_temperature_weights": _SQL_LANG_TEMPERATURE,
    "chunk_exact_dups": _SQL_CHUNK_DUPS,
    "events_asof_forward": _SQL_ASOF_FORWARD,
    "training_token_budget_sample": _SQL_TOKEN_BUDGET,
    "user_value_window_ranks": _SQL_WINDOW_RANKS,
    "user_event_type_pivot": _SQL_TYPE_PIVOT,
    "event_value_outliers": _SQL_VALUE_OUTLIERS,
    "doc_token_cooccurrence": _SQL_TOKEN_COOCCUR,
}
