"""interval_event_join (stages/intervaljoin.py) semantics vs an
in-memory quadratic reference: all same-key pairs with
left.on + lower <= right.on <= left.on + upper, bounds inclusive.

Pins the rank-composite searchsorted + grouped-arange kernel against
brute force on randomized inputs (numeric and timestamp on-columns),
plus the edge shapes: empty windows, boundary inclusivity, key
isolation, suffixing, and negative-to-negative windows.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

import ray.data

from etl_cms_ray.stages.intervaljoin import (
    interval_event_join,
    match_window_pairs,
)


def _quadratic(lt: pd.DataFrame, rt: pd.DataFrame, on, by, lower, upper,
               rcols) -> pd.DataFrame:
    rows = []
    for _, l in lt.iterrows():
        for _, r in rt.iterrows():
            if l[by] == r[by] and l[on] + lower <= r[on] <= l[on] + upper:
                rows.append({**l.to_dict(),
                             **{f"{c}_pair": r[c] for c in rcols}})
    cols = list(lt.columns) + [f"{c}_pair" for c in rcols]
    return pd.DataFrame(rows, columns=cols)


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    return df.sort_values(list(df.columns), kind="mergesort") \
             .reset_index(drop=True)


@pytest.mark.fast
def test_matches_quadratic_numeric(ray_session):
    rng = np.random.default_rng(11)
    lt = pa.table({
        "k": rng.integers(0, 9, 120),
        "t": rng.integers(0, 200, 120),
        "lv": np.arange(120, dtype=np.int64),
    })
    rt = pa.table({
        "k": rng.integers(0, 9, 150),
        "t": rng.integers(0, 200, 150),
        "rv": np.arange(150, dtype=np.int64) * 7,
    })
    out = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", lower=-10, upper=5, num_partitions=8,
    ).to_pandas()
    # engine output: left cols + t_r + rv
    exp = _quadratic(lt.to_pandas(), rt.to_pandas(), "t", "k", -10, 5,
                     ["t", "rv"])
    exp = exp.rename(columns={"t_pair": "t_r", "rv_pair": "rv"})
    assert _canon(out).equals(_canon(exp[out.columns.tolist()]))


@pytest.mark.fast
def test_bounds_inclusive_and_key_isolation(ray_session):
    lt = pa.table({"k": [1, 1, 2], "t": [100, 50, 100],
                   "lid": [0, 1, 2]})
    rt = pa.table({"k": [1, 1, 1, 2, 3], "t": [90, 105, 111, 100, 100],
                   "rid": [10, 11, 12, 13, 14]})
    out = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", lower=-10, upper=5, num_partitions=4,
    ).to_pandas()
    pairs = set(zip(out["lid"], out["rid"]))
    # lid 0 (k=1, t=100): window [90, 105] -> rids 10 and 11, NOT 12;
    # both ends inclusive.  lid 1 (k=1, t=50): empty window.  lid 2
    # (k=2, t=100): rid 13 only — k=3's identical timestamp is excluded.
    assert pairs == {(0, 10), (0, 11), (2, 13)}


@pytest.mark.fast
def test_timestamp_window(ray_session):
    base = np.datetime64("2024-03-01T00:00:00", "us")
    lt = pa.table({"u": [7, 7], "ts": pa.array(
        [base + np.timedelta64(2, "h"), base + np.timedelta64(9, "h")],
        type=pa.timestamp("us"))})
    rt = pa.table({"u": [7, 7, 7], "ts": pa.array(
        [base + np.timedelta64(90, "m"),   # inside window of left[0]
         base + np.timedelta64(2, "h"),    # equal -> inclusive upper
         base + np.timedelta64(5, "h")],   # inside no window
        type=pa.timestamp("us")), "rid": [0, 1, 2]})
    out = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="ts", by="u",
        lower=np.timedelta64(-3600, "s"), upper=np.timedelta64(0, "s"),
        num_partitions=2,
    ).to_pandas()
    assert sorted(out["rid"]) == [0, 1]
    assert str(out["ts_r"].dtype) == "datetime64[us]"


@pytest.mark.fast
def test_string_keys_and_suffixing(ray_session):
    lt = pa.table({"k": ["a", "b"], "t": [10, 20],
                   "v": [1, 2]})  # left has v too -> right v suffixes
    rt = pa.table({"k": ["a", "b"], "t": [12, 99], "v": [100, 200]})
    out = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", lower=0, upper=5, num_partitions=2,
    ).to_pandas()
    assert set(out.columns) == {"k", "t", "v", "t_r", "v_r"}
    assert len(out) == 1 and out.iloc[0]["v_r"] == 100


@pytest.mark.fast
def test_empty_sides(ray_session):
    lt = pa.table({"k": pa.array([], type=pa.int64()),
                   "t": pa.array([], type=pa.int64())})
    rt = pa.table({"k": [1], "t": [5], "rv": [9]})
    ds = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", lower=-1, upper=1, num_partitions=2,
        left_schema=lt.schema, right_schema=rt.schema,
    )
    # an all-empty map_groups output loses block schema in Ray; the
    # _cogroup_schema attribute is the downstream schema carrier (same
    # contract as asof_join)
    assert set(ds._cogroup_schema.names) == {"k", "t", "t_r", "rv"}
    assert len(ds.to_pandas()) == 0


@settings(max_examples=80, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32),  # rng seed
    st.integers(min_value=-20, max_value=20),
    st.integers(min_value=0, max_value=25),
)
def test_match_kernel_matches_quadratic(seed, lower, width):
    """Ray-free property: the rank-composite searchsorted kernel equals
    the O(n*m) reference for arbitrary key/ts multisets and windows
    (incl. lower > upper -> empty, duplicate timestamps, hot keys)."""
    upper = lower + width - 5  # sometimes lower > upper (empty window)
    rng = np.random.default_rng(seed)
    nl, nr = int(rng.integers(0, 30)), int(rng.integers(0, 40))
    lkey = rng.integers(0, 5, nl)
    rkey = rng.integers(0, 5, nr)
    lts = rng.integers(0, 60, nl)
    rts = rng.integers(0, 60, nr)
    lidx, ridx = match_window_pairs(lkey, lts, rkey, rts, lower, upper)
    got = set(zip(lidx.tolist(), ridx.tolist()))
    expect = {(i, j)
              for i in range(nl) for j in range(nr)
              if lkey[i] == rkey[j] and lts[i] + lower <= rts[j] <= lts[i] + upper}
    assert got == expect
    assert len(got) == len(lidx)  # no duplicate emissions


@pytest.mark.fast
def test_type_mismatch_fails_at_plan_time(ray_session):
    lt = pa.table({"k": [1], "t": pa.array([1.5], type=pa.float64())})
    rt = pa.table({"k": [1], "t": pa.array([2], type=pa.int64())})
    with pytest.raises(TypeError, match="type mismatch"):
        interval_event_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            on="t", by="k", lower=0, upper=1,
            left_schema=lt.schema, right_schema=rt.schema,
        )


@pytest.mark.fast
def test_null_keys_dropped_inner_join_semantics(ray_session):
    """NULL by-keys and NULL on-values never match (SQL inner-join /
    BETWEEN-oracle semantics): string-key Nones must not crash the
    kernel's np.unique sort and nullable-int NaN keys must not match
    each other (r4 ADVICE low)."""
    lt = pa.table({
        "k": pa.array(["a", None, "b", None], pa.string()),
        "t": pa.array([10, 10, None, 10], pa.int64()),
        "lv": pa.array([1, 2, 3, 4], pa.int64()),
    })
    rt = pa.table({
        "k": pa.array(["a", None, "b"], pa.string()),
        "t": pa.array([12, 12, 12], pa.int64()),
        "rv": pa.array([100, 200, 300], pa.int64()),
    })
    out = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", lower=0, upper=5, num_partitions=4,
    ).to_pandas()
    # only ("a",10)x("a",12) survives: null keys on either side and the
    # null left timestamp all drop
    assert out[["lv", "rv"]].values.tolist() == [[1, 100]]

    # nullable INT keys: the null-key rows drop instead of NaN-matching
    lt2 = pa.table({"k": pa.array([1, None], pa.int64()),
                    "t": pa.array([10, 10], pa.int64()),
                    "lv": pa.array([1, 2], pa.int64())})
    rt2 = pa.table({"k": pa.array([1, None], pa.int64()),
                    "t": pa.array([11, 11], pa.int64()),
                    "rv": pa.array([5, 6], pa.int64())})
    out2 = interval_event_join(
        ray.data.from_arrow(lt2), ray.data.from_arrow(rt2),
        on="t", by="k", lower=0, upper=5, num_partitions=4,
    ).to_pandas()
    assert out2[["lv", "rv"]].values.tolist() == [[1, 5]]


@pytest.mark.fast
def test_left_outer_retains_unmatched_and_null_keys(ray_session):
    """how='left': unmatched left rows (including null-key/null-ts left
    rows, per SQL LEFT JOIN ON semantics) emit once with null right
    columns; matched rows are identical to the inner join."""
    lt = pa.table({
        "k": pa.array(["a", "b", None, "c"], pa.string()),
        "t": pa.array([10, 10, 10, None], pa.int64()),
        "lv": pa.array([1, 2, 3, 4], pa.int64()),
    })
    rt = pa.table({
        "k": pa.array(["a", "z"], pa.string()),
        "t": pa.array([12, 12], pa.int64()),
        "rv": pa.array([100, 300], pa.int64()),
    })
    out = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        on="t", by="k", lower=0, upper=5, num_partitions=4, how="left",
    ).to_pandas().sort_values("lv").reset_index(drop=True)
    assert len(out) == 4  # every left row exactly once here
    assert out["lv"].tolist() == [1, 2, 3, 4]
    assert out.loc[0, "rv"] == 100 and out.loc[0, "t_r"] == 12
    assert out.loc[1:, "rv"].isna().all()
    assert out.loc[1:, "t_r"].isna().all()

    # a key with multiple matches duplicates the left row per match,
    # and the inner join is exactly the left join minus null-rv rows
    rt2 = pa.table({
        "k": pa.array(["a", "a"], pa.string()),
        "t": pa.array([11, 12], pa.int64()),
        "rv": pa.array([7, 8], pa.int64()),
    })
    left2 = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt2),
        on="t", by="k", lower=0, upper=5, num_partitions=4, how="left",
    ).to_pandas()
    inner2 = interval_event_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt2),
        on="t", by="k", lower=0, upper=5, num_partitions=4,
    ).to_pandas()
    assert len(left2) == 5 and len(inner2) == 2
    got = left2.dropna(subset=["rv"]).sort_values(["lv", "rv"]).reset_index(drop=True)
    exp = inner2.sort_values(["lv", "rv"]).reset_index(drop=True)
    assert got[["lv"]].astype("int64").equals(exp[["lv"]].astype("int64"))
    assert got["rv"].astype("int64").tolist() == exp["rv"].astype("int64").tolist()


def test_left_outer_matches_quadratic_randomized(ray_session):
    """Randomized left-outer semantics vs an in-memory reference: the
    result is exactly (inner pairs) ∪ (each matchless left row once with
    null right columns) — across duplicate timestamps, hot keys,
    matchless keys and empty windows."""
    rng = np.random.default_rng(29)
    for trial in range(3):
        nl, nr = int(rng.integers(5, 40)), int(rng.integers(0, 50))
        lt = pa.table({
            "k": rng.integers(0, 6, nl),
            "t": rng.integers(0, 50, nl),
            "lv": np.arange(nl, dtype=np.int64),
        })
        rt = pa.table({
            "k": rng.integers(0, 6, nr),
            "t": rng.integers(0, 50, nr),
            "rv": np.arange(nr, dtype=np.int64) * 3,
        })
        lower, upper = -4, 3
        out = interval_event_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(rt),
            on="t", by="k", lower=lower, upper=upper, num_partitions=4,
            how="left",
            left_schema=lt.schema, right_schema=rt.schema,
        ).to_pandas()
        lk, lts = lt["k"].to_numpy(), lt["t"].to_numpy()
        rk, rts = rt["k"].to_numpy(), rt["t"].to_numpy()
        expect = set()
        for i in range(nl):
            ms = [j for j in range(nr)
                  if lk[i] == rk[j] and lts[i] + lower <= rts[j] <= lts[i] + upper]
            if ms:
                expect |= {(int(lt["lv"][i].as_py()), int(rt["rv"][j].as_py()))
                           for j in ms}
            else:
                expect.add((int(lt["lv"][i].as_py()), None))
        got = {(int(r.lv), None if pd.isna(r.rv) else int(r.rv))
               for r in out.itertuples()}
        assert got == expect, trial
        assert len(out) == len(expect), trial


@pytest.mark.fast
def test_invalid_how_fails_at_plan_time(ray_session):
    lt = pa.table({"k": [1], "t": pa.array([1], type=pa.int64())})
    with pytest.raises(ValueError, match="how must be"):
        interval_event_join(
            ray.data.from_arrow(lt), ray.data.from_arrow(lt),
            on="t", by="k", lower=0, upper=1, how="outer",
        )
