"""lake_freshness: ingest-lag / SLA report from manifest metadata only."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest
from etl_cms_ray.pipelines.maintenance import lake_freshness

pytestmark = pytest.mark.fast


def test_freshness_reports_lag_backlog_and_age(ray_session, tmp_path):
    repos = make_repos(4, 10)
    ev = make_events(repos, n_epochs=4, events_per_epoch=60)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8,
                       commit_mode="mor", max_deltas=64)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)

    head = pc.max(ev["epoch"]).as_py()
    rep = lake_freshness(cfg.lake_root, source_max_epoch=head)
    assert rep["version"] == 2 and rep["partitions"] == 8
    assert rep["fence_max"] == head
    assert rep["fence_min"] <= rep["fence_median"] <= head
    # partitions behind the source head are listed with their lag
    behind = {e["part_id"]: e["lag_epochs"] for e in rep["lagging_partitions"]}
    assert all(lag > 0 for lag in behind.values())
    assert rep["max_lag"] == (max(behind.values()) if behind else 0)
    # MOR commit 2 left delta chains -> backlog histogram has depth >= 1
    assert any(int(k) >= 1 for k in rep["delta_depth_histogram"])
    assert sum(rep["delta_depth_histogram"].values()) == 8
    assert rep["commit_age_sec"] is not None and rep["commit_age_sec"] >= 0
    assert rep["dead_letter_files"] == 0 and rep["dead_letter_rows"] == 0

    # a source head FAR ahead flags every partition
    rep2 = lake_freshness(cfg.lake_root, source_max_epoch=100)
    assert len(rep2["lagging_partitions"]) == 8
    assert rep2["max_lag"] == 100 - rep["fence_min"]

    # dead-letter backlog counts from parquet footers only
    dl = os.path.join(cfg.lake_root, "deadletter", "part=00001")
    os.makedirs(dl, exist_ok=True)
    pq.write_table(pa.table({"repo": ["r"], "reason": ["bad"]}),
                   os.path.join(dl, "x.parquet"))
    rep3 = lake_freshness(cfg.lake_root)
    assert rep3["dead_letter_files"] == 1 and rep3["dead_letter_rows"] == 1
    assert rep3["max_lag"] is None  # no source head supplied


def test_freshness_empty_lake(ray_session, tmp_path):
    rep = lake_freshness(str(tmp_path / "nolake"))
    assert rep["version"] == 0 and rep["partitions"] == 0
