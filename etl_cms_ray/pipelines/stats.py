"""Lake analytics: per-repo grouped statistics over the live lake.

Reference analog: record-count stats + observation-period min/max
(``FileControl.py:255-275``, ``CMS_SynPuf_ETL_CDM_v5.py:844-860``,
``:2104-2113``).  Partial-per-batch then coalesced final — repo
cardinality is bounded (it is the coarse half of the partition key).
"""

from __future__ import annotations

import pandas as pd

import ray.data

from .ingest import read_lake


def lake_repo_stats(lake_root: str) -> pd.DataFrame:
    """Per-repo: file count, total bytes, min/max applied (epoch, seq).

    Returns a small pandas frame (one row per repo).
    """
    ds = read_lake(lake_root, columns=["repo", "size", "epoch", "seq"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("repo", sort=False).agg(
            _n=("size", "size"),
            _bytes=("size", "sum"),
            _min_ep=("epoch", "min"),
            _max_ep=("epoch", "max"),
        )
        return g.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    def final(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("repo", sort=False).agg(
            n_files=("_n", "sum"),
            total_bytes=("_bytes", "sum"),
            min_epoch=("_min_ep", "min"),
            max_epoch=("_max_ep", "max"),
        )
        return g.reset_index().astype(
            {"n_files": "int64", "total_bytes": "int64",
             "min_epoch": "int64", "max_epoch": "int64"}
        )

    out = partials.repartition(1).map_batches(final, batch_format="pandas", batch_size=None)
    return out.to_pandas().sort_values("repo").reset_index(drop=True)
