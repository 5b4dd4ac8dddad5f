"""Point lookup: hash-partition pruning plan + random-access reads.

The reference has no random access (any lookup is a full forward pass,
``FileControl.py:181-236``); here a K-key lookup must open <= K of the
lake's P partitions and agree row-for-row with the full lake state.
"""

import shutil

import pyarrow.compute as pc
import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.functions.hashing import part_id_one
from etl_cms_ray.pipelines.ingest import (
    ingest,
    lookup_plan,
    point_lookup,
    read_lake_table,
)
from etl_cms_ray.state.manifest import LakeStore

LAKE = "/tmp/test_lookup_lake"


@pytest.fixture(scope="module")
def lake(ray_session):
    shutil.rmtree(LAKE, ignore_errors=True)
    repos = make_repos(n_repos=6, files_per_repo=8)
    ev = make_events(repos, n_epochs=3, events_per_epoch=40)
    cfg = EngineConfig(lake_root=LAKE, num_partitions=16)
    ingest(rd.from_arrow(ev), cfg)
    return LAKE


def test_plan_opens_at_most_k_partitions(lake):
    full = read_lake_table(lake)
    keys = list(
        zip(full["repo"].to_pylist()[:5], full["path"].to_pylist()[:5])
    )
    manifest = LakeStore(lake).load_manifest()
    plan = lookup_plan(manifest, keys)
    assert 1 <= len(plan) <= len(keys) < manifest.num_partitions
    # the plan is exactly the distinct partitions the keys hash to
    want = {part_id_one(r, p, manifest.num_partitions) for r, p in keys}
    got = {e["part_id"] for e in plan}
    assert got <= want


def test_lookup_matches_full_state(lake):
    full = read_lake_table(lake)
    keys = list(
        zip(full["repo"].to_pylist()[:7], full["path"].to_pylist()[:7])
    )
    got = point_lookup(lake, keys)
    mask = pc.is_in(
        pc.binary_join_element_wise(full["repo"], full["path"], "\x00"),
        value_set=pc.binary_join_element_wise(
            got["repo"], got["path"], "\x00"
        ).combine_chunks()
        if got.num_rows
        else None,
    )
    assert got.num_rows == len(keys)
    expect = full.filter(mask)
    assert got.equals(expect.cast(got.schema))


def test_missing_and_deleted_keys_return_nothing(lake):
    full = read_lake_table(lake)
    live = set(zip(full["repo"].to_pylist(), full["path"].to_pylist()))
    # fabricated key + a key that was deleted by the event stream (exists
    # in the repos snapshot domain but not in live state)
    missing = [("no_such_repo", "no/such/path")]
    got = point_lookup(lake, missing)
    assert got.num_rows == 0
    assert got.schema.names == full.schema.names
    r, p = next(iter(live))
    got2 = point_lookup(lake, [("no_such_repo", "x"), (r, p)], columns=["repo", "path", "size"])
    assert got2.num_rows == 1
    assert got2.column_names == ["repo", "path", "size"]
    assert got2["repo"][0].as_py() == r and got2["path"][0].as_py() == p
