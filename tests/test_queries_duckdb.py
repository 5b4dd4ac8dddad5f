"""Local mirror of the driver's correctness gate: run every queries()
entry at sf0.001 and compare against its oracle_sql() via DuckDB —
row count, column names, dtype kinds (incl. datetime units), and
order-insensitive values.

The driver itself runs at sf0.01, where scale-dependent drift can hide
(e.g. the round-4 hopping-window ns-vs-us unit bug only had visible
consequences there).  Set GRAFT_ORACLE_SF_DIR=/root/testdata/sf0.01 to
run this same sweep at driver scale (slower; used before each round's
gate)."""

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def _to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def _dtype_kind(s: pd.Series) -> str:
    """Coarse dtype family matching what the driver's value-hash is
    sensitive to: int-vs-float-vs-bool-vs-datetime-vs-object drift."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def _assert_equal(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame):
    assert sorted(ray_df.columns) == sorted(sql_df.columns), (
        f"{name}: columns {sorted(ray_df.columns)} != {sorted(sql_df.columns)}"
    )
    assert len(ray_df) == len(sql_df), f"{name}: rows {len(ray_df)} != {len(sql_df)}"
    # Dtype-kind strictness BEFORE canonicalization: the driver hashes
    # raw values, so an int64-vs-float64 drift (e.g. DuckDB HUGEINT ->
    # pandas float64) fails the gate even when every value is equal.
    for c in ray_df.columns:
        rk, sk = _dtype_kind(ray_df[c]), _dtype_kind(sql_df[c])
        assert rk == sk, (
            f"{name}.{c}: dtype-kind drift ray={rk}({ray_df[c].dtype}) "
            f"!= oracle={sk}({sql_df[c].dtype})"
        )
        if rk == "datetime":
            # unit-exact: datetime64[ns] vs [us] hashes differently under
            # a byte-level value hash even when every instant is equal
            assert str(ray_df[c].dtype) == str(sql_df[c].dtype), (
                f"{name}.{c}: datetime unit drift ray={ray_df[c].dtype} "
                f"!= oracle={sql_df[c].dtype}"
            )
    a, b = _canon(ray_df), _canon(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av):
            ok = ((av - bv).abs() < 1e-9) | (av.isna() & bv.isna())
            assert ok.all(), f"{name}.{c}: float mismatch\n{a[~ok].head()}\n{b[~ok].head()}"
        else:
            ok = (av == bv) | (av.isna() & bv.isna())
            assert ok.all(), f"{name}.{c}: mismatch\n{a[~ok.values].head()}\n{b[~ok.values].head()}"


def _oracle_names():
    import __ray_entry__ as m

    return sorted(m.oracle_sql().keys())


@pytest.mark.parametrize("name", _oracle_names())
def test_query_matches_oracle(ray_session, name):
    import __ray_entry__ as m

    ray_df = _to_pandas(m.queries()[name](SF_DIR))
    sql_df = _duck(m.oracle_sql()[name])
    _assert_equal(name, ray_df, sql_df)


def test_rows_only_queries_run(ray_session):
    import __ray_entry__ as m

    oracle = set(m.oracle_sql())
    for name, fn in m.queries().items():
        if name in oracle:
            continue
        df = _to_pandas(fn(SF_DIR))
        assert df is not None and len(df.columns) > 0, name


def test_entry_smoke(ray_session):
    import __ray_entry__ as m

    res = _to_pandas(m.entry())
    assert len(res) > 0
    assert "content_sha_hex" in res.columns
