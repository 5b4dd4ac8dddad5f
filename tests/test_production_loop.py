"""Composed incremental production loop.

A binlog producer appends one epoch file at a time; after EVERY tail
commit the derived artifacts refresh INCREMENTALLY — token index,
per-repo stats materialized view — and each is pinned against a
from-scratch recompute.  This is the composition contract the pieces
promise individually: a user runs tail + index + matview as one
incremental pipeline and never rebuilds anything from zero (the
reference's only option is re-running its whole forward pass,
``Main.py``).
"""

import os

import pandas as pd
import pyarrow.compute as pc
import pyarrow.parquet as pq

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.oracle import replay, tables_equal_by_sha
from etl_cms_ray.pipelines.history import repo_stats_snapshot
from etl_cms_ray.pipelines.index import build_token_index, token_plan, token_search
from etl_cms_ray.pipelines.ingest import read_lake_table
from etl_cms_ray.pipelines.maintenance import audit_lake
from etl_cms_ray.pipelines.matview import (
    materialize_stats_view,
    read_stats_view,
    refresh_stats_view,
)
from etl_cms_ray.pipelines.tail import tail_once
from etl_cms_ray.state.manifest import LakeStore

TOKEN = "def"  # appears in fixture code content


def _expected_search(lake_root: str, token: str) -> pd.DataFrame:
    import pyarrow as pa

    t = read_lake_table(lake_root)
    content = t["content"].cast(pa.string())
    padded = pc.binary_join_element_wise(" ", content, " ", "")
    t = t.filter(pc.match_substring(padded, f" {token} "))
    return (
        t.select(["repo", "path"]).to_pandas()
        .sort_values(["repo", "path"]).reset_index(drop=True)
    )


def test_incremental_production_loop(ray_session, tmp_path):
    repos = make_repos(4, 8)
    n_epochs = 4
    ev = make_events(repos, n_epochs=n_epochs, events_per_epoch=40,
                     scenario="tombstone")
    events_dir = str(tmp_path / "binlog")
    os.makedirs(events_dir)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(lake_root=lake, num_partitions=8)
    vcfg = EngineConfig(lake_root=str(tmp_path / "view"), num_partitions=8)
    store = LakeStore(lake)

    view_at = None  # base version the stats view reflects
    for ep in range(n_epochs):
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        pq.write_table(chunk, os.path.join(events_dir, f"epoch={ep}.parquet"))
        results = tail_once(events_dir, cfg)
        assert len(results) == 1, f"epoch {ep} should be one commit"

        # lake state == oracle replay through this epoch
        assert tables_equal_by_sha(
            read_lake_table(lake), replay(ev, through_epoch=ep)
        )

        # token index: incremental refresh touches only changed partitions
        info = build_token_index(lake, incremental=True)
        assert info["rebuilt"] + info["reused"] == info["partitions"]
        plan, pinfo = token_plan(lake, TOKEN)
        assert not pinfo["fallback"], "fresh index must never be stale"
        got = (
            token_search(lake, TOKEN, columns=["repo", "path"])
            .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
        )
        assert got.equals(_expected_search(lake, TOKEN))

        # stats matview: incremental refresh == from-scratch snapshot
        if view_at is None:
            materialize_stats_view(lake, vcfg)
        else:
            r = refresh_stats_view(lake, vcfg, from_version=view_at)
            assert r.events_applied > 0  # every epoch changes some repo stats
        view_at = store.current_version()
        got_v = (
            read_stats_view(vcfg.lake_root).to_pandas()
            .sort_values("repo").reset_index(drop=True)
        )
        exp_v = (
            repo_stats_snapshot(lake).to_pandas()
            .sort_values("repo").reset_index(drop=True)
        )
        cols = ["repo", "n_files", "total_size"]
        pd.testing.assert_frame_equal(got_v[cols], exp_v[cols])

    # quiescence: replaying the whole binlog is a no-op everywhere
    assert tail_once(events_dir, cfg) == []
    assert refresh_stats_view(lake, vcfg, from_version=view_at).events_applied == 0
    info = build_token_index(lake, incremental=True)
    assert info["rebuilt"] == 0 and info["reused"] == info["partitions"]
    assert audit_lake(lake)["healthy"]


def test_lifecycle_loop_freshness_maintain_purge(ray_session, tmp_path):
    """The operations day-2 loop composed end-to-end: tail commits →
    freshness tells the operator where the lake stands → auto_maintain
    refreshes artifacts → a GDPR request purges a subject → the index
    dropped by the purge is rebuilt by the NEXT maintain sweep and
    searches stay exact — no from-scratch rebuild anywhere except the
    artifact the erasure contract forces."""
    from etl_cms_ray.pipelines.maintenance import (auto_maintain,
                                                   lake_freshness,
                                                   purge_history)

    repos = make_repos(4, 8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40)
    events_dir = str(tmp_path / "binlog")
    os.makedirs(events_dir)
    lake = str(tmp_path / "lake")
    cfg = EngineConfig(lake_root=lake, num_partitions=8)

    head = int(pc.max(ev["epoch"]).as_py())
    for ep in range(head + 1):
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        pq.write_table(chunk, os.path.join(events_dir, f"epoch={ep}.parquet"))
        tail_once(events_dir, cfg)
        if ep == 0:
            build_token_index(lake)  # registered once; maintain refreshes it
        rep = lake_freshness(lake, source_max_epoch=head)
        assert rep["fence_max"] == ep  # the loop is exactly caught up to ep
        sweep = auto_maintain(lake)
        assert isinstance(sweep, dict)

    fresh = lake_freshness(lake, source_max_epoch=head)
    assert fresh["max_lag"] == 0 and fresh["lagging_partitions"] == []

    # GDPR request arrives mid-operation
    subject = sorted({r for r in read_lake_table(lake)["repo"].to_pylist()})[0]
    prep = purge_history(lake, subject)
    assert prep["rows_removed"] > 0
    assert "_index" in prep["artifacts_dropped"]

    # the erasure dropped the index; rebuild (the operator's runbook step
    # after a purge) and maintain keeps it incremental thereafter
    build_token_index(lake)
    auto_maintain(lake)
    plan, pinfo = token_plan(lake, TOKEN)
    assert not pinfo["fallback"]
    got = (
        token_search(lake, TOKEN, columns=["repo", "path"])
        .to_pandas().sort_values(["repo", "path"]).reset_index(drop=True)
    )
    assert got.equals(_expected_search(lake, TOKEN))
    assert not (got["repo"] == subject).any()
    assert audit_lake(lake)["healthy"]
