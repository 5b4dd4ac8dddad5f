"""Write-audit-publish: staged commits are invisible until published,
auditable as a snapshot, abortable with vacuum-reclaimable files, and a
pure visibility protocol (published WAP state == direct-ingest state).
"""

import os
import shutil

import pytest
import ray.data as rd

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos
from etl_cms_ray.pipelines.ingest import ingest, read_lake_table
from etl_cms_ray.pipelines.maintenance import audit_lake, expire_snapshots
from etl_cms_ray.pipelines.replicate import lake_content_hash
from etl_cms_ray.state.manifest import LakeStore

WAP = "/tmp/test_wap_lake"
DIRECT = "/tmp/test_wap_direct"


@pytest.fixture(scope="module")
def events(ray_session):
    repos = make_repos(n_repos=5, files_per_repo=8)
    return rd.from_arrow(
        make_events(repos, n_epochs=2, events_per_epoch=40, scenario="tombstone")
    )


def test_stage_audit_publish_equals_direct(events):
    shutil.rmtree(WAP, ignore_errors=True)
    shutil.rmtree(DIRECT, ignore_errors=True)
    wcfg = EngineConfig(lake_root=WAP, num_partitions=8)
    dcfg = EngineConfig(lake_root=DIRECT, num_partitions=8)
    store = LakeStore(WAP)
    for ep in (0, 1, 2):
        batch = events.filter(expr=f"epoch == {ep}")
        pre = read_lake_table(WAP) if ep else None
        r = ingest(batch, wcfg, count_input=False, stage=True)
        # staged: CURRENT unmoved, readers see the pre-stage state
        assert store.current_version() == r.manifest_version - 1
        if pre is not None:
            assert read_lake_table(WAP).equals(pre)
        rep = audit_lake(WAP, version=r.manifest_version)
        assert rep["healthy"], rep
        store.commit_staged(r.manifest_version)
        assert store.current_version() == r.manifest_version
        ingest(batch, dcfg, count_input=False)
    assert lake_content_hash(WAP) == lake_content_hash(DIRECT)
    # replay of a published epoch is still a fenced no-op
    r = ingest(events.filter(expr="epoch == 2"), wcfg, count_input=False)
    assert r.events_applied == 0


def test_abort_discards_and_vacuum_reclaims(events):
    root = "/tmp/test_wap_abort"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(lake_root=root, num_partitions=8)
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    store = LakeStore(root)
    before = read_lake_table(root)
    r = ingest(events.filter(expr="epoch >= 1"), cfg, count_input=False,
               stage=True)
    staged_path = os.path.join(store.manifest_dir,
                               f"manifest-{r.manifest_version:06d}.json")
    assert os.path.exists(staged_path)
    store.abort_staged(r.manifest_version)
    assert not os.path.exists(staged_path)
    assert store.current_version() == 1
    assert read_lake_table(root).equals(before)
    # the aborted stage's data files are unreferenced -> vacuumed
    rep = expire_snapshots(root, keep_last=1)
    assert rep["files_deleted"] > 0 and rep["bytes_reclaimed"] > 0
    assert audit_lake(root)["healthy"]
    assert read_lake_table(root).equals(before)
    # after the abort the version slot is free: re-stage and publish
    r2 = ingest(events.filter(expr="epoch >= 1"), cfg, count_input=False,
                stage=True)
    assert r2.manifest_version == r.manifest_version
    assert audit_lake(root, version=r2.manifest_version)["healthy"]
    store.commit_staged(r2.manifest_version)
    assert read_lake_table(root).num_rows > 0


def test_commit_staged_guards(events):
    root = "/tmp/test_wap_guard"
    shutil.rmtree(root, ignore_errors=True)
    cfg = EngineConfig(lake_root=root, num_partitions=4)
    ingest(events.filter(expr="epoch == 0"), cfg, count_input=False)
    store = LakeStore(root)
    with pytest.raises(RuntimeError):
        store.commit_staged(3)  # not CURRENT+1
    with pytest.raises(FileNotFoundError):
        store.commit_staged(2)  # CURRENT+1 but never staged
    with pytest.raises(RuntimeError):
        store.abort_staged(1)  # already published
