"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).

No function here (or in etl_cms_ray) calls ray.init/ray.shutdown.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: repos-shaped change
    stream derived from `documents`, ingested through the real LWW lake
    (normalize -> combiner -> groupby shuffle -> MergeApplier actor pool ->
    epoch-fenced manifest commit), final lake state returned."""
    from etl_cms_ray.pipelines.queries import repos_lake_ingest

    return repos_lake_ingest("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2
    (plus the training-data operators: dedup, ANN, text analysis,
    multimodal plumbing)."""
    from etl_cms_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable SQL equivalents (column names and rounding match the
    Ray pipelines exactly).  Keys absent here (minhash/simhash/LSH-topk/
    fingerprints/multimodal) are non-SQL-expressible; the driver records
    rows-only checks for them and tests/test_hard_checks.py pins their
    planted-duplicate recall / exact precision / recall-floor instead."""
    from etl_cms_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
