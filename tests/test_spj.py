"""Storage-partitioned join (pipelines/spj.py): partition-local
lake-lake joins pinned against a pandas reference over the live states."""

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest

import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.spj import copartitioned_join
from etl_cms_ray.state.manifest import LakeStore


def _mk_lake(tmp_path, name, ev, parts=8, **cfg_kw):
    cfg = EngineConfig(lake_root=str(tmp_path / name), num_partitions=parts,
                       **cfg_kw)
    for ep in sorted(set(ev["epoch"].to_pylist())):
        ingest(rd.from_arrow(ev.filter(pc.equal(ev["epoch"], ep))), cfg)
    return cfg.lake_root


def _ref(lake_a, lake_b, how):
    a = read_lake_table(lake_a).select(["repo", "path", "content"]).to_pandas()
    b = read_lake_table(lake_b).select(["repo", "path", "content"]).to_pandas()
    m = a.merge(b, on=["repo", "path"], how=how, suffixes=("", "_b"))
    return m.sort_values(["repo", "path"]).reset_index(drop=True)


def _got(lake_a, lake_b, how, **kw):
    out = copartitioned_join(lake_a, lake_b, ["content"], ["content"],
                             how=how, **kw).to_pandas()
    return out[["repo", "path", "content", "content_b"]].sort_values(
        ["repo", "path"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def lakes(ray_session, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("spj")
    repos = make_repos(4, 8)
    ev_a = make_events(repos, n_epochs=3, events_per_epoch=60,
                       scenario="tombstone")
    ev_b = make_events(repos, n_epochs=2, events_per_epoch=45)
    lake_a = _mk_lake(tmp, "a", ev_a)
    # b-side is merge-on-read so the SPJ exercises delta-chain loads
    lake_b = _mk_lake(tmp, "b", ev_b, commit_mode="mor", max_deltas=64)
    assert any(ps.deltas
               for ps in LakeStore(lake_b).load_manifest().partitions.values())
    return lake_a, lake_b


@pytest.mark.parametrize("how", ["inner", "left", "outer"])
def test_spj_matches_pandas_reference(lakes, how):
    lake_a, lake_b = lakes
    got, ref = _got(lake_a, lake_b, how), _ref(lake_a, lake_b, how)
    assert len(got) > 0
    pd.testing.assert_frame_equal(got, ref)


def test_spj_snapshot_join(lakes):
    lake_a, lake_b = lakes
    v1 = 1  # first commit of lake_a
    got = copartitioned_join(lake_a, lake_b, ["content"], ["content"],
                             how="inner", version_a=v1).to_pandas()
    from etl_cms_ray.pipelines.history import read_snapshot

    a = (read_snapshot(lake_a, version=v1).to_pandas()
         [["repo", "path", "content"]])
    b = read_lake_table(lake_b).select(["repo", "path", "content"]).to_pandas()
    ref = a.merge(b, on=["repo", "path"], suffixes=("", "_b"))
    got = got[["repo", "path", "content", "content_b"]].sort_values(
        ["repo", "path"]).reset_index(drop=True)
    ref = ref.sort_values(["repo", "path"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, ref)


def test_spj_rejects_mismatched_partitioning(ray_session, tmp_path):
    repos = make_repos(2, 4)
    ev = make_events(repos, n_epochs=1, events_per_epoch=20)
    la = _mk_lake(tmp_path, "la", ev, parts=8)
    lb = _mk_lake(tmp_path, "lb", ev, parts=16)
    with pytest.raises(ValueError, match="not co-partitioned"):
        copartitioned_join(la, lb, ["content"], ["content"])


def test_spj_left_join_keeps_int_payload_types(lakes):
    """Unmatched left rows must NOT upcast int payloads to float, and
    every emitted block must carry the identical Arrow schema (pandas
    merge would diverge per partition; the Acero join keeps types)."""
    lake_a, lake_b = lakes
    out = copartitioned_join(lake_a, lake_b, ["content"], ["size"],
                             how="left")
    schemas = set()
    total = 0
    for b in out.iter_batches(batch_format="pyarrow"):
        schemas.add(str(b.schema))
        assert pa.types.is_integer(b.schema.field("size").type)
        total += b.num_rows
    assert len(schemas) == 1 and total > 0


def test_spj_outer_one_sided_partitions_stable_schema(ray_session, tmp_path):
    """Outer join where one side's partitions are missing entirely must
    still emit typed (not null-typed) b-side columns."""
    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=1, events_per_epoch=30)
    la = _mk_lake(tmp_path, "oa", ev, parts=8)
    # b-side: only a handful of keys -> most partitions empty on b
    small = ev.slice(0, 3)
    lb = _mk_lake(tmp_path, "ob", small, parts=8)
    out = copartitioned_join(la, lb, ["content"], ["size"], how="outer")
    tbl = pa.concat_tables(
        list(out.iter_batches(batch_format="pyarrow")))
    assert pa.types.is_integer(tbl.schema.field("size").type)
    ka = read_lake_table(la).select(["repo", "path"]).to_pandas()
    kb = read_lake_table(lb).select(["repo", "path"]).to_pandas()
    n_union = len(pd.concat([ka, kb]).drop_duplicates())
    assert tbl.num_rows == n_union > 0
