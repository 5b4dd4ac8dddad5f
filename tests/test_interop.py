"""export_duckdb_view: an external DuckDB session must see BYTE-for-byte
the snapshot the engine serves (CoW, MOR chains, schema evolution,
historical versions), from one generated SQL statement with no engine
code involved."""

import duckdb
import pandas as pd
import pyarrow.compute as pc
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos, make_schema_changes
from etl_cms_ray.pipelines.history import read_snapshot
from etl_cms_ray.pipelines.ingest import ingest, read_lake
from etl_cms_ray.pipelines.interop import export_duckdb_view

pytestmark = pytest.mark.fast


def _cmp(lake_df: pd.DataFrame, sql: str):
    con = duckdb.connect()
    con.execute(sql)
    duck = con.execute("SELECT * FROM lake").df()
    cols = sorted(lake_df.columns)
    a = lake_df[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    b = duck[cols].sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_duckdb_view_matches_engine_cow_and_history(ray_session, tmp_path):
    repos = make_repos(4, 10)
    ev = make_events(repos, n_epochs=4, events_per_epoch=60)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8)
    r1 = ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    r2 = ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg,
                schema_changes=make_schema_changes())

    # current snapshot (post schema evolution: added column + defaults)
    _cmp(read_lake(cfg.lake_root).to_pandas(),
         export_duckdb_view(cfg.lake_root))
    # historical snapshot keeps ITS schema (no retroactive add_column)
    hist = read_snapshot(cfg.lake_root, version=r1.manifest_version).to_pandas()
    sql1 = export_duckdb_view(cfg.lake_root, version=r1.manifest_version)
    _cmp(hist, sql1)
    assert set(hist.columns) != set(read_lake(cfg.lake_root).to_pandas().columns)


def test_duckdb_view_folds_mor_chains(ray_session, tmp_path):
    repos = make_repos(3, 8)
    ev = make_events(repos, n_epochs=4, events_per_epoch=50)
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=8,
                       commit_mode="mor", max_deltas=64)
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 0))), cfg)
    ingest(ray.data.from_arrow(ev.filter(
        pc.and_(pc.greater(ev["epoch"], 0), pc.less_equal(ev["epoch"], 2)))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 2))), cfg)

    from etl_cms_ray.state.manifest import LakeStore

    m = LakeStore(cfg.lake_root).load_manifest()
    assert any(ps.deltas for ps in m.partitions.values())  # MOR exercised
    sql = export_duckdb_view(cfg.lake_root)
    assert "row_number()" in sql and "'delete'" in sql
    _cmp(read_lake(cfg.lake_root).to_pandas(), sql)


def test_duckdb_view_empty_lake(ray_session, tmp_path):
    cfg = EngineConfig(lake_root=str(tmp_path / "lake"), num_partitions=4)
    repos = make_repos(1, 2)
    ev = make_events(repos, n_epochs=1, events_per_epoch=2)
    ingest(ray.data.from_arrow(ev), cfg)
    # a view over version 0 (pre-first-commit) is empty but well-typed
    sql = export_duckdb_view(cfg.lake_root, version=0)
    con = duckdb.connect()
    con.execute(sql)
    out = con.execute("SELECT * FROM lake").df()
    assert len(out) == 0 and "repo" in out.columns


def test_duckdb_view_reads_through_renames(ray_session, tmp_path):
    """A rename leaves old physical names in pre-rename files; the
    generated view must COALESCE through the alias history instead of
    surfacing silent NULLs — checked on CoW AND MOR mixed lakes."""
    from etl_cms_ray.schema import SchemaChange

    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=4, events_per_epoch=50)
    changes = [
        SchemaChange(epoch=1, change="add_column", column="stars",
                     type_name="int64", default=3),
        SchemaChange(epoch=2, change="rename_column", column="lang",
                     new_name="language"),
        SchemaChange(epoch=3, change="rename_column", column="stars",
                     new_name="rating"),
    ]
    first_repo = ev["repo"].to_pylist()[0]
    for mode in ("cow", "mor"):
        cfg = EngineConfig(lake_root=str(tmp_path / f"rlake_{mode}"),
                           num_partitions=8, commit_mode=mode)
        ingest(ray.data.from_arrow(
            ev.filter(pc.less_equal(ev["epoch"], 1))), cfg,
            schema_changes=changes[:1])
        # touch ONLY one repo so other partitions keep pre-rename files
        late = ev.filter(pc.and_(pc.greater(ev["epoch"], 1),
                                 pc.equal(ev["repo"], first_repo)))
        ingest(ray.data.from_arrow(late), cfg, schema_changes=changes)
        lake_df = read_lake(cfg.lake_root).to_pandas()
        assert "language" in lake_df.columns and "rating" in lake_df.columns
        # old-file rows must carry real values, not NULLs
        assert lake_df["language"].notna().all()
        _cmp(lake_df, export_duckdb_view(cfg.lake_root))
