"""Driver-gate mirror: run catalog entries against their DuckDB oracles
with the DRIVER's comparison semantics — row count, column names, and a
dtype-SENSITIVE value hash (sorted columns, per-column dtype kind +
byte-level value hashing) — at any scale directory.

This is strictly stronger than the pytest sweep's tolerance-based value
comparison and catches exactly the drift class the driver's
CORRECTNESS gate catches (int64-vs-float64 from HUGEINT widening,
datetime64[ns]-vs-[us] units): both classes were found this way in
round 4 (graph_pagerank, cdc_hopping_window).

Usage:
    python scripts/driver_mirror.py [SF_DIR] [N]
        SF_DIR  testdata dir (default /root/testdata/sf0.01 — the
                driver's scale)
        N       check only the first N QUERIES entries (driver checks
                50); pass a large number for the full catalog

Writes per-entry results to /tmp/driver_mirror.json and prints a BAD
list (anything not hash-green and not an honest no_oracle row).
"""
import hashlib
import json
import sys

import duckdb
import pandas as pd

import ray

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
N = int(sys.argv[2]) if len(sys.argv) > 2 else 50

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con.sql(sql).df()


def to_pd(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def vhash(df: pd.DataFrame) -> str:
    """Order-insensitive, dtype-SENSITIVE value hash (the driver's
    comparison class): sort columns by name, sort rows, hash each
    column's dtype kind + raw value bytes."""
    df = df[sorted(df.columns)].copy()
    df = df.sort_values(list(df.columns), kind="mergesort") \
           .reset_index(drop=True)
    h = hashlib.sha256()
    for c in df.columns:
        s = df[c]
        h.update(c.encode())
        h.update(str(s.dtype.kind).encode())
        h.update(pd.util.hash_pandas_object(s, index=False).values.tobytes())
    return h.hexdigest()


def main() -> int:
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m

    qs, osql = m.queries(), m.oracle_sql()
    out = {}
    for name in list(qs)[:N]:
        try:
            rdf = to_pd(qs[name](SF))
            if name not in osql:
                out[name] = {"err": "no_oracle", "rows": len(rdf)}
                print(f"{name}: no_oracle rows={len(rdf)}", flush=True)
                continue
            sdf = duck(osql[name])
            rows = len(rdf) == len(sdf)
            cols = sorted(rdf.columns) == sorted(sdf.columns)
            hm = rows and cols and vhash(rdf) == vhash(sdf)
            out[name] = {"rows_match": rows, "schema_match": cols,
                         "hash_match": hm, "ray_rows": len(rdf),
                         "oracle_rows": len(sdf)}
            print(f"{name}: rows={rows} cols={cols} hash={hm}", flush=True)
        except Exception as e:  # noqa: BLE001 — per-entry isolation
            out[name] = {"err": f"{type(e).__name__}: {e}"}
            print(f"{name}: ERR {type(e).__name__}: {str(e)[:200]}",
                  flush=True)
    json.dump(out, open("/tmp/driver_mirror.json", "w"), indent=1)
    bad = [k for k, v in out.items()
           if v.get("err") not in (None, "no_oracle")
           or v.get("hash_match") is False]
    print("BAD:", bad)
    ray.shutdown()
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
