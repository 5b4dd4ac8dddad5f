"""Full driver-style correctness sweep of EVERY oracle entry at an
arbitrary scale factor (default sf0.01 — the driver's own scale; the
pytest mirror runs sf0.001).  Prints one JSON line per failure and a
summary; exit code 1 on any mismatch.

Usage: PYTHONPATH=/root/repo python scripts/verify_sf001_sweep.py [sf_dir]
"""

import json
import sys
import time

import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    return con.sql(sql).df()


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as m
    from tests.test_queries_duckdb import _assert_equal, _to_pandas

    queries = m.queries()
    oracles = m.oracle_sql()
    failures = []
    t_start = time.time()
    for i, name in enumerate(sorted(oracles)):
        t0 = time.time()
        try:
            ray_df = _to_pandas(queries[name](SF_DIR))
            sql_df = _duck(oracles[name])
            _assert_equal(name, ray_df, sql_df)
            status = "ok"
        except Exception as e:  # noqa: BLE001 — report, keep sweeping
            failures.append(name)
            status = f"FAIL: {e}"
            print(json.dumps({"name": name, "err": str(e)[:400]}),
                  flush=True)
        print(f"[{i + 1}/{len(oracles)}] {name}: {status} "
              f"({time.time() - t0:.1f}s)", flush=True)
    print(json.dumps({
        "sf": SF_DIR, "checked": len(oracles),
        "failed": len(failures), "failures": failures,
        "wall_sec": round(time.time() - t_start, 1),
    }), flush=True)
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
