"""End-to-end: Ray Data ingest pipeline vs the single-process oracle.

The golden comparison is the reference's methodology (SURVEY.md §5):
full-table equality including the per-row sha256(content) invariant.
"""

import os

import pyarrow as pa
import pytest

import ray.data

from etl_cms_ray.config import EngineConfig
from etl_cms_ray.fixtures import make_events, make_repos, make_schema_changes
from etl_cms_ray.oracle import replay, tables_equal_by_sha
from etl_cms_ray.pipelines.ingest import ingest, read_lake, read_lake_table
from etl_cms_ray.schema import SchemaRegistry
from etl_cms_ray.state.manifest import LakeStore


def _cfg(tmp_path, name, **kw):
    return EngineConfig(lake_root=str(tmp_path / name), num_partitions=8,
                        normalize_concurrency=2, applier_concurrency=2, **kw)


@pytest.mark.parametrize("scenario", ["linear", "dupkeys", "hotkey", "tombstone", "outoforder"])
def test_ingest_matches_oracle(ray_session, tmp_path, scenario):
    repos = make_repos(4, 8, zipf_hot=(scenario == "hotkey"))
    ev = make_events(repos, n_epochs=3, events_per_epoch=80, scenario=scenario)
    cfg = _cfg(tmp_path, f"lake_{scenario}")
    res = ingest(ray.data.from_arrow(ev), cfg)
    assert res.events_in == ev.num_rows
    lake = read_lake_table(cfg.lake_root)
    expected = replay(ev)
    assert tables_equal_by_sha(lake, expected), f"{scenario}: lake != oracle"
    assert res.lake_rows == expected.num_rows


def test_exactly_once_replayed_input(ray_session, tmp_path):
    """At-least-once delivery: re-ingesting already-applied epochs is a no-op
    (epoch fence), including the delete-resurrection hazard."""
    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=60, scenario="tombstone")
    cfg = _cfg(tmp_path, "lake_replay")
    ingest(ray.data.from_arrow(ev), cfg)
    state1 = read_lake_table(cfg.lake_root)
    res2 = ingest(ray.data.from_arrow(ev), cfg)  # full replay
    assert res2.events_applied == 0
    state2 = read_lake_table(cfg.lake_root)
    assert tables_equal_by_sha(state1, state2)
    assert tables_equal_by_sha(state2, replay(ev))


def test_incremental_equals_batch(ray_session, tmp_path):
    """Epoch-at-a-time ingest (checkpoint/restart between epochs) converges
    to the same state as one-shot ingest — replay-from-checkpoint."""
    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=50, scenario="tombstone")
    import pyarrow.compute as pc

    cfg_inc = _cfg(tmp_path, "lake_inc")
    for ep in range(4):
        chunk = ev.filter(pc.equal(ev["epoch"], ep))
        if chunk.num_rows:
            ingest(ray.data.from_arrow(chunk), cfg_inc)
    cfg_one = _cfg(tmp_path, "lake_one")
    ingest(ray.data.from_arrow(ev), cfg_one)
    a = read_lake_table(cfg_inc.lake_root)
    b = read_lake_table(cfg_one.lake_root)
    assert tables_equal_by_sha(a, b)
    assert tables_equal_by_sha(a, replay(ev))
    # lineage log recorded one commit per epoch
    store = LakeStore(cfg_inc.lake_root)
    lineage = store.read_lineage()
    assert len(lineage) == 4
    assert [r["manifest_version"] for r in lineage] == [1, 2, 3, 4]


def test_schema_evolution_end_to_end(ray_session, tmp_path):
    """Column add + type widen mid-stream; engine state matches oracle with
    the same registry; old partition files are promoted on read."""
    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=4, events_per_epoch=40)
    changes = make_schema_changes()  # stars@2 add, size widen@3
    import pyarrow.compute as pc

    cfg = _cfg(tmp_path, "lake_evolve")
    # epochs 0-1 under v0 schema, then 2-4 with evolution registered
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    assert read_lake_table(cfg.lake_root).schema.field("size").type == pa.int32()
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg, schema_changes=changes)
    lake = read_lake_table(cfg.lake_root)
    assert lake.schema.field("stars").type == pa.int64()
    assert lake.schema.field("size").type == pa.int64()
    expected = replay(ev, registry=SchemaRegistry(changes=changes))
    assert tables_equal_by_sha(lake, expected)


def test_schema_drop_column_end_to_end(ray_session, tmp_path):
    """add -> drop lifecycle: a payload column added mid-stream is soft-
    dropped later; current reads lack it, engine state matches the
    oracle under the same registry, time travel at a pre-drop version
    still shows it, and engine columns are undroppable."""
    import pyarrow.compute as pc

    from etl_cms_ray.pipelines.history import read_snapshot
    from etl_cms_ray.schema import SchemaChange

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=4, events_per_epoch=40)
    add = SchemaChange(epoch=1, change="add_column", column="stars",
                       type_name="int64", default=3)
    drop = SchemaChange(epoch=3, change="drop_column", column="stars")
    cfg = _cfg(tmp_path, "lake_drop")
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 2))),
           cfg, schema_changes=[add])
    v1 = LakeStore(cfg.lake_root).current_version()
    assert "stars" in read_lake_table(cfg.lake_root).column_names
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 2))),
           cfg, schema_changes=[add, drop])
    lake = read_lake_table(cfg.lake_root)
    assert "stars" not in lake.column_names
    expected = replay(ev, registry=SchemaRegistry(changes=[add, drop]))
    assert "stars" not in expected.column_names
    assert tables_equal_by_sha(lake, expected)
    # time travel: the pre-drop snapshot still carries the column
    snap = read_snapshot(cfg.lake_root, version=v1).to_pandas()
    assert "stars" in snap.columns
    # guards: engine columns are undroppable; unknown columns fail loudly
    for bad in ("content", "repo", "size"):
        with pytest.raises(ValueError):
            SchemaRegistry(
                changes=[SchemaChange(epoch=0, change="drop_column", column=bad)]
            ).schema_for(1)
    with pytest.raises((ValueError, KeyError)):
        SchemaRegistry(
            changes=[SchemaChange(epoch=0, change="drop_column", column="ghost")]
        ).schema_for(1)


def test_dead_letter_routing(ray_session, tmp_path):
    """Malformed events (bad op / null key / missing content) land in the
    dead-letter sink, not the lake (unmapped-code-log analog)."""
    good = make_events(make_repos(2, 3), n_epochs=1, events_per_epoch=10)
    bad = pa.table(
        {
            "repo": ["r", None, "r"],
            "path": ["p1", "p2", "p3"],
            "op": ["frobnicate", "update", "update"],
            "commit": ["c", "c", "c"],
            "epoch": pa.array([1, 1, 1], type=pa.int64()),
            "seq": pa.array([900, 901, 902], type=pa.int64()),
            "lang": ["py", "py", "py"],
            "content": ["x", "y", None],
        },
        schema=good.schema,
    )
    cfg = _cfg(tmp_path, "lake_dead")
    res = ingest(ray.data.from_arrow(pa.concat_tables([good, bad])), cfg)
    assert res.dead_rows == 3
    lake = read_lake_table(cfg.lake_root)
    assert tables_equal_by_sha(lake, replay(good))
    # dead letters persisted under the lake root
    dl_root = os.path.join(cfg.lake_root, "deadletter")
    import glob

    files = glob.glob(os.path.join(dl_root, "**", "*.parquet"), recursive=True)
    assert files
    dead = pa.concat_tables([__import__("pyarrow.parquet", fromlist=["pq"]).read_table(f) for f in files])
    assert dead.num_rows == 3


def test_read_lake_dataset(ray_session, tmp_path):
    repos = make_repos(2, 4)
    ev = make_events(repos, n_epochs=2, events_per_epoch=20)
    cfg = _cfg(tmp_path, "lake_ds")
    ingest(ray.data.from_arrow(ev), cfg)
    ds = read_lake(cfg.lake_root)
    assert ds.count() == replay(ev).num_rows
    # no hive-inferred 'part' column from the data/part=NNNNN layout
    assert set(ds.schema().names) == set(read_lake_table(cfg.lake_root).column_names)
    pruned = read_lake(cfg.lake_root, columns=["repo", "path", "size"])
    assert set(pruned.schema().names) == {"repo", "path", "size"}


def test_salted_ingest_matches_oracle(ray_session, tmp_path):
    """Explicit hot-key salting (salt_factor > 1) must not change the
    result — LWW associativity under the salted two-level reduce."""
    repos = make_repos(4, 8, zipf_hot=True)
    ev = make_events(repos, n_epochs=3, events_per_epoch=200, scenario="hotkey")
    cfg = _cfg(tmp_path, "lake_salted", salt_factor=4)
    ingest(ray.data.from_arrow(ev), cfg)
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_retried_apply_is_idempotent(ray_session, tmp_path):
    """Simulated task retry: applying the same group twice writes the
    same content-addressed file and identical manifest rows (the
    exactly-once-under-retries guarantee, SURVEY §7.4 #1)."""
    import glob

    from etl_cms_ray.schema import SchemaRegistry
    from etl_cms_ray.stages.applier import apply_group
    from etl_cms_ray.stages.normalize import fence_vector, normalize_batch

    repos = make_repos(2, 4)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30)
    cfg = _cfg(tmp_path, "lake_retry")
    norm = normalize_batch(ev, cfg=cfg, fence_vec=fence_vector(cfg.num_partitions, {}))
    pid = norm["part_id"][0].as_py()
    import pyarrow.compute as pc

    group = norm.filter(pc.equal(norm["part_id"], pid))
    kwargs = dict(lake_root=cfg.lake_root, fences={}, registry_json=SchemaRegistry().to_json(),
                  target_schema_version=0, prior_meta={})
    r1 = apply_group(group, **kwargs)
    r2 = apply_group(group, **kwargs)  # the retry
    assert r1["file"][0].as_py() == r2["file"][0].as_py()
    assert r1["content_hash"][0].as_py() == r2["content_hash"][0].as_py()
    files = glob.glob(os.path.join(cfg.lake_root, "data", "**", "*.parquet"), recursive=True)
    assert len(files) == 1  # retry overwrote the same name, no orphan


def test_manifest_publish_conflict(ray_session, tmp_path):
    """Optimistic-concurrency fence on manifest publish."""
    import pytest

    from etl_cms_ray.state.manifest import LakeStore, Manifest

    store = LakeStore(str(tmp_path / "lake_conflict"))
    store.publish(Manifest(version=1), expect_version=0)
    with pytest.raises(RuntimeError, match="manifest conflict"):
        store.publish(Manifest(version=2), expect_version=0)
    store.publish(Manifest(version=2), expect_version=1)
    assert store.current_version() == 2


def test_evolution_with_carried_values(ray_session, tmp_path):
    """Events may carry actual values for evolved columns; null means
    'use the registered backfill default' in both engine and oracle."""
    from etl_cms_ray.fixtures import make_schema_changes

    repos = make_repos(2, 4)
    ev = make_events(repos, n_epochs=3, events_per_epoch=30)
    # attach a stars column: value = seq for epoch>=2 events, null before
    seqs = ev["seq"].to_pylist()
    epochs = ev["epoch"].to_pylist()
    stars = [s if e >= 2 else None for s, e in zip(seqs, epochs)]
    ev2 = ev.append_column("stars", pa.array(stars, type=pa.int64()))
    changes = make_schema_changes()
    cfg = _cfg(tmp_path, "lake_evo_vals")
    ingest(ray.data.from_arrow(ev2), cfg, schema_changes=changes)
    lake = read_lake_table(cfg.lake_root)
    expected = replay(ev2, registry=SchemaRegistry(changes=changes))
    assert tables_equal_by_sha(lake, expected)
    vals = set(lake["stars"].to_pylist())
    assert vals - {0}, "some rows should carry real stars values"


def test_rollback_and_reconverge(ray_session, tmp_path):
    """Restore-from-checkpoint: roll CURRENT back to an earlier manifest,
    re-apply the missing epochs, reach the same final state."""
    import pyarrow.compute as pc

    repos = make_repos(3, 6)
    ev = make_events(repos, n_epochs=3, events_per_epoch=50, scenario="tombstone")
    cfg = _cfg(tmp_path, "lake_rb")
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    ingest(ray.data.from_arrow(ev.filter(pc.greater(ev["epoch"], 1))), cfg)
    final = read_lake_table(cfg.lake_root)

    store = LakeStore(cfg.lake_root)
    assert store.current_version() == 2
    store.rollback(1)
    # historical state == state after the first commit only
    partial = read_lake_table(cfg.lake_root)
    assert tables_equal_by_sha(
        partial, replay(ev.filter(pc.less_equal(ev["epoch"], 1)))
    )
    # re-apply the whole stream: epochs <=1 are fenced, 2+ re-applied
    ingest(ray.data.from_arrow(ev), cfg)
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), final)
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_partition_count_mismatch_rejected(ray_session, tmp_path):
    """Changing num_partitions on an existing lake must fail loudly —
    fences are per-partition, a silent mismatch mis-fences every key."""
    repos = make_repos(2, 4)
    ev = make_events(repos, n_epochs=1, events_per_epoch=10)
    cfg = _cfg(tmp_path, "lake_np")
    ingest(ray.data.from_arrow(ev), cfg)
    bad = EngineConfig(lake_root=cfg.lake_root, num_partitions=16)
    with pytest.raises(ValueError, match="repartition_lake"):
        ingest(ray.data.from_arrow(ev), bad)


def test_wide_content_rows(ray_session, tmp_path):
    """Very wide records (content >> typical row): engine ingests 100KB+
    payloads correctly (block sizing tolerates wide rows) and the
    oversized-content guard dead-letters payloads above the limit."""
    big = "x" * 120_000
    huge = "y" * 300_000
    ev = pa.table(
        {
            "repo": ["r", "r", "r"],
            "path": ["small", "big", "huge"],
            "op": ["insert"] * 3,
            "commit": ["c"] * 3,
            "epoch": pa.array([0, 0, 0], type=pa.int64()),
            "seq": pa.array([0, 1, 2], type=pa.int64()),
            "lang": ["txt"] * 3,
            "content": ["tiny", big, huge],
        }
    )
    cfg = EngineConfig(lake_root=str(tmp_path / "lake_wide"), num_partitions=4,
                       max_content_bytes=200_000)
    res = ingest(ray.data.from_arrow(ev), cfg)
    assert res.dead_rows == 1  # the 300KB payload
    lake = read_lake_table(cfg.lake_root)
    assert lake.num_rows == 2
    got = dict(zip(lake["path"].to_pylist(), lake["size"].to_pylist()))
    assert got == {"small": 4, "big": 120_000}


def test_pruned_read_over_mixed_schema_lake(ray_session, tmp_path):
    """Column-pruned read_lake must work when only SOME partitions were
    rewritten after a schema evolution: evolved columns are default-filled
    / widened per batch for old files (promote-on-read with pushdown)."""
    import pyarrow.compute as pc

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=4, events_per_epoch=40)
    cfg = _cfg(tmp_path, "lake_mixed")
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))), cfg)
    # post-evolution events carry REAL stars values (non-default) so a
    # pruned read that default-fills instead of reading them is caught
    sub = ev.filter(pc.greater(ev["epoch"], 1)).slice(0, 10)
    sub = sub.append_column(
        "stars", pa.array([7] * sub.num_rows, type=pa.int64())
    )
    ingest(ray.data.from_arrow(sub), cfg, schema_changes=make_schema_changes())

    pruned = read_lake(cfg.lake_root, columns=["repo", "path", "stars", "size"]).to_pandas()
    full = read_lake_table(cfg.lake_root).to_pandas()
    assert set(pruned.columns) == {"repo", "path", "stars", "size"}
    assert (full["stars"] == 7).any()  # real values exist in the lake
    a = pruned.sort_values(["repo", "path"]).reset_index(drop=True)
    b = full[["repo", "path", "stars", "size"]].sort_values(["repo", "path"]).reset_index(drop=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))
    assert (a["stars"] == 7).any()  # ...and survive the pruned read
    # single evolved column alone (previously a KeyError)
    only_stars = read_lake(cfg.lake_root, columns=["stars"]).to_pandas()
    assert sorted(only_stars["stars"]) == sorted(full["stars"])


def test_crash_before_publish_recovers(ray_session, tmp_path, monkeypatch):
    """Crash between partition-file writes and manifest publish: the lake
    still reads as the previous version (manifest-as-commit), and a
    re-run converges — retried appliers overwrite their own
    content-addressed files, no orphan state becomes visible."""
    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40)
    cfg = _cfg(tmp_path, "lake_crash")

    import etl_cms_ray.state.manifest as mstate

    real_publish = mstate.LakeStore.publish

    def exploding_publish(self, manifest, expect_version=None,
                          changed_parts=None, stage=False):
        raise RuntimeError("simulated crash before commit")

    monkeypatch.setattr(mstate.LakeStore, "publish", exploding_publish)
    with pytest.raises(RuntimeError, match="simulated crash"):
        ingest(ray.data.from_arrow(ev), cfg)
    monkeypatch.setattr(mstate.LakeStore, "publish", real_publish)

    # nothing visible: manifest never advanced
    store = LakeStore(cfg.lake_root)
    assert store.current_version() == 0
    assert read_lake_table(cfg.lake_root).num_rows == 0

    # the retry commits and matches the oracle
    res = ingest(ray.data.from_arrow(ev), cfg)
    assert res.manifest_version == 1
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_ingest_with_retry_survives_racing_committer(ray_session, tmp_path,
                                                     monkeypatch):
    """Optimistic concurrency: a second committer advances CURRENT between
    this ingest's manifest load and its publish.  The publish CAS fails,
    ingest_with_retry reruns the whole apply against the fresh manifest,
    and the final state equals the oracle replay — the racing commit is
    metadata-only, so relational state must be exactly the events'."""
    from etl_cms_ray.pipelines.ingest import ingest_with_retry

    import etl_cms_ray.state.manifest as mstate
    from etl_cms_ray.state.manifest import Manifest

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=40)
    cfg = _cfg(tmp_path, "lake_race")
    ingest(ray.data.from_arrow(ev).filter(expr="epoch == 0"), cfg)

    real_publish = mstate.LakeStore.publish
    state = {"raced": False}

    def racing_publish(self, manifest, expect_version=None,
                       changed_parts=None, stage=False):
        if not state["raced"] and not stage:
            state["raced"] = True  # a rival writer lands a commit first
            other = mstate.LakeStore(self.root)
            cur = other.load_manifest()
            bump = Manifest(version=cur.version + 1,
                            num_partitions=cur.num_partitions,
                            partitions=dict(cur.partitions),
                            partitioner=cur.partitioner)
            bump.metrics = {"op": "rival_touch"}
            real_publish(other, bump, expect_version=cur.version)
        return real_publish(self, manifest, expect_version=expect_version,
                            changed_parts=changed_parts, stage=stage)

    monkeypatch.setattr(mstate.LakeStore, "publish", racing_publish)
    res = ingest_with_retry(
        ray.data.from_arrow(ev).filter(expr="epoch > 0"), cfg)
    monkeypatch.setattr(mstate.LakeStore, "publish", real_publish)

    assert state["raced"]
    assert res.manifest_version == 3  # v1 ingest, v2 rival, v3 retried
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_ingest_with_retry_gives_up_and_reraises(ray_session, tmp_path,
                                                 monkeypatch):
    from etl_cms_ray.pipelines.ingest import ingest_with_retry

    import etl_cms_ray.state.manifest as mstate

    repos = make_repos(2, 3)
    ev = make_events(repos, n_epochs=1, events_per_epoch=10)
    cfg = _cfg(tmp_path, "lake_race_giveup")

    def always_conflict(self, manifest, expect_version=None,
                        changed_parts=None, stage=False):
        raise RuntimeError("manifest conflict: CURRENT=9 != expected 0")

    monkeypatch.setattr(mstate.LakeStore, "publish", always_conflict)
    with pytest.raises(RuntimeError, match="manifest conflict"):
        ingest_with_retry(ray.data.from_arrow(ev), cfg, retries=1)


def test_publish_claim_blocks_overlapped_committers(ray_session, tmp_path):
    """The version check alone is check-then-act; the O_EXCL claim file is
    the real CAS.  A rival that claimed the version inside the window
    (before our CURRENT check could observe its flip) must force a
    conflict rather than a silent manifest clobber."""
    from etl_cms_ray.state.manifest import LakeStore, Manifest

    store = LakeStore(str(tmp_path / "lake_claim"))
    os.makedirs(os.path.join(store.manifest_dir, "claims"), exist_ok=True)
    open(os.path.join(store.manifest_dir, "claims", "v000001"), "x").close()
    with pytest.raises(RuntimeError, match="manifest conflict"):
        store.publish(Manifest(version=1), expect_version=0)


def test_rollback_and_abort_release_version_claims(ray_session, tmp_path):
    from etl_cms_ray.state.manifest import LakeStore, Manifest

    store = LakeStore(str(tmp_path / "lake_claimroll"))
    store.publish(Manifest(version=1), expect_version=0)
    store.publish(Manifest(version=2), expect_version=1)
    store.rollback(1)
    # roll-forward reuses the version number: the claim must be gone
    store.publish(Manifest(version=2), expect_version=1)
    assert store.current_version() == 2
    # staged version numbers are reusable after abort
    store.publish(Manifest(version=3), expect_version=2, stage=True)
    store.abort_staged(3)
    store.publish(Manifest(version=3), expect_version=2)
    assert store.current_version() == 3


def test_uri_glob_source_ingest(ray_session, tmp_path):
    """S1 closure (VERDICT r2 #8): ingest from a file:// URI glob through
    read_events_parquet and converge to the same lake state as the
    in-memory stream.  Object-store URIs (s3://...) ride the SAME
    pyarrow-filesystem path inside ray.data.read_parquet — file:// is
    the only scheme testable in this sandbox."""
    import glob

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from etl_cms_ray.sources.events import read_events_parquet

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30)
    drop = tmp_path / "drop"
    drop.mkdir()
    for e in (0, 1, 2):  # one file per epoch (0 = backfill), glob-discovered
        pq.write_table(ev.filter(pc.equal(ev["epoch"], e)),
                       str(drop / f"epoch{e}.parquet"))
    uris = [f"file://{p}" for p in sorted(glob.glob(str(drop / "*.parquet")))]
    assert len(uris) == 3
    ds = read_events_parquet(uris)
    cfg = _cfg(tmp_path, "lake_uri")
    res = ingest(ds, cfg)
    assert res.events_in == ev.num_rows and res.events_applied > 0
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_fsspec_scheme_source_ingest(ray_session, tmp_path):
    """S1 closure beyond file:// (VERDICT r3 #4): ingest from a
    non-local-pyarrow URI scheme.  `dir://` is unknown to
    pyarrow.fs.FileSystem.from_uri, so this exercises the fsspec
    fallback branch in read_parquet_clean — the same code path an
    object-store scheme routed through fsspec (s3/gcs/abfs) rides —
    including pickling the wrapped filesystem into Ray read workers."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from etl_cms_ray.sources.events import read_events_parquet

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30)
    drop = tmp_path / "bucket"
    drop.mkdir()
    for e in (0, 1, 2):
        pq.write_table(ev.filter(pc.equal(ev["epoch"], e)),
                       str(drop / f"epoch{e}.parquet"))
    uris = [f"dir://epoch{e}.parquet" for e in (0, 1, 2)]
    ds = read_events_parquet(
        uris, storage_options={"path": str(drop), "target_protocol": "file"})
    cfg = _cfg(tmp_path, "lake_fsspec")
    res = ingest(ds, cfg)
    assert res.events_in == ev.num_rows and res.events_applied > 0
    assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))


def test_http_scheme_source_ingest(ray_session, tmp_path):
    """S1 full closure (VERDICT r4 #3): e2e ingest from an HTTP URI — a
    scheme whose filesystem is NOT local-posix under the hood.  A real
    http.server serves the drop zone over TCP; `stdhttp://` (the
    engine's stdlib-urllib fsspec filesystem, functions/httpfs.py)
    rides the identical url_to_fs -> PyFileSystem(FSSpecHandler)
    fallback as s3/gcs/abfs, and Ray read workers unpickle the
    filesystem and fetch the bytes over the network themselves.
    Reference analog: scripts/get_synpuf_files.py:65-140 (HTTP
    acquisition is the reference's entry point 0)."""
    import functools
    import http.server
    import threading

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    import etl_cms_ray.functions.httpfs  # noqa: F401 — registers stdhttp://
    from etl_cms_ray.sources.events import read_events_parquet

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=2, events_per_epoch=30)
    drop = tmp_path / "webroot"
    drop.mkdir()
    for e in (0, 1, 2):
        pq.write_table(ev.filter(pc.equal(ev["epoch"], e)),
                       str(drop / f"epoch{e}.parquet"))
    handler = functools.partial(http.server.SimpleHTTPRequestHandler,
                                directory=str(drop))
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    port = httpd.server_address[1]
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    try:
        uris = [f"stdhttp://127.0.0.1:{port}/epoch{e}.parquet"
                for e in (0, 1, 2)]
        ds = read_events_parquet(uris)
        cfg = _cfg(tmp_path, "lake_http")
        res = ingest(ds, cfg)
        assert res.events_in == ev.num_rows and res.events_applied > 0
        assert tables_equal_by_sha(read_lake_table(cfg.lake_root), replay(ev))
    finally:
        httpd.shutdown()
        thread.join(timeout=5)


def test_fsspec_scheme_column_pruning(ray_session, tmp_path):
    """The fsspec fallback must compose with columns= pruning (the
    explicit-schema subset path in read_parquet_clean)."""
    import pyarrow.parquet as pq

    from etl_cms_ray.functions.rayutil import read_parquet_clean

    t = pa.table({"a": pa.array([1, 2, 3], type=pa.int64()),
                  "b": pa.array(["x", "y", "z"], type=pa.string())})
    drop = tmp_path / "bucket2"
    drop.mkdir()
    pq.write_table(t, str(drop / "t.parquet"))
    ds = read_parquet_clean(
        "dir://t.parquet", columns=["b"],
        storage_options={"path": str(drop), "target_protocol": "file"})
    out = ds.take_all()
    assert sorted(r["b"] for r in out) == ["x", "y", "z"]
    assert all(set(r) == {"b"} for r in out)


def test_failed_publish_releases_claim(ray_session, tmp_path, monkeypatch):
    """Regression (ADVICE r2, manifest.py:283): an exception AFTER the
    O_EXCL claim but before the CURRENT flip must unlink the claim —
    otherwise every retry of the same version hits a phantom 'manifest
    conflict' until a manual rollback."""
    import etl_cms_ray.state.manifest as mstate
    from etl_cms_ray.state.manifest import LakeStore, Manifest

    store = LakeStore(str(tmp_path / "lake_claimfail"))
    real = LakeStore._write_manifest

    def exploding(self, manifest, expect_version, changed_parts, stage):
        raise OSError("disk full while writing shards")

    monkeypatch.setattr(mstate.LakeStore, "_write_manifest", exploding)
    with pytest.raises(OSError, match="disk full"):
        store.publish(Manifest(version=1), expect_version=0)
    monkeypatch.setattr(mstate.LakeStore, "_write_manifest", real)
    # the claim was released: retrying the SAME version succeeds
    store.publish(Manifest(version=1), expect_version=0)
    assert store.current_version() == 1


def test_requeue_dead_letter_repairs_and_purges(ray_session, tmp_path):
    """Dead letters are replayable: a vectorized repair re-enters the
    lake under the real validity gates at a fresh epoch; handled files
    purge; still-broken rows go back to the store with fresh reasons."""
    import glob

    import pyarrow.compute as pc

    import ray.data as rd
    from etl_cms_ray.pipelines.ingest import read_dead_letter, read_lake_table
    from etl_cms_ray.pipelines.maintenance import requeue_dead_letter

    root = str(tmp_path / "lake")
    cfg = EngineConfig(lake_root=root, num_partitions=8)
    ev = pa.table({
        "repo": ["r1", "r1", "r2", None],
        "path": ["ok.py", "bad.py", "bad2.py", "nokey.py"],
        "op": ["insert", "upsert", "insert", "insert"],  # 'upsert' invalid
        "commit": ["c1"] * 4,
        "epoch": pa.array([0] * 4, pa.int64()),
        "seq": pa.array([0, 1, 2, 3], pa.int64()),
        "lang": ["py"] * 4,
        "content": ["good", "fixable", None, "unkeyable"],  # null content
    })
    ingest(rd.from_arrow(ev), cfg)
    assert read_lake_table(root).num_rows == 1  # only ok.py entered
    dead = read_dead_letter(root).to_pandas()
    assert len(dead) == 3

    def fix(t: pa.Table) -> pa.Table:
        # repair the op typo and backfill the missing content; the
        # null-key row is unrepairable and must go back to the store
        op = pc.if_else(pc.equal(t["op"], "upsert"),
                        pa.scalar("insert"), t["op"])
        content = pc.fill_null(t["content"].cast(pa.large_string()),
                               "backfilled")
        return t.set_column(t.column_names.index("op"), "op", op) \
                .set_column(t.column_names.index("content"), "content",
                            content)

    res = requeue_dead_letter(root, cfg, fix_fn=fix)
    assert res is not None and res.events_applied == 2
    lake = read_lake_table(root).to_pandas()
    assert sorted(lake["path"]) == ["bad.py", "bad2.py", "ok.py"]
    # requeued rows applied at a fresh epoch above the original fence
    assert lake["epoch"].max() > 0
    dead2 = read_dead_letter(root).to_pandas()
    assert len(dead2) == 1 and "null_key" in dead2["dead_reason"].iloc[0]
    # handled files were purged; only the fresh failure's file remains
    files = glob.glob(str(tmp_path / "lake" / "deadletter" / "part=*" / "*"))
    assert len(files) == 1

    # requeue with no fix: the unrepairable row cycles back, lake stable
    res2 = requeue_dead_letter(root, cfg)
    assert res2.events_applied == 0
    assert read_lake_table(root).num_rows == 3
    assert len(read_dead_letter(root).to_pandas()) == 1

    # empty store: no-op
    for f in glob.glob(str(tmp_path / "lake" / "deadletter" / "part=*" / "*")):
        import os as _os
        _os.unlink(f)
    assert requeue_dead_letter(root, cfg) is None


def test_requeue_preserves_cross_epoch_lww_order(ray_session, tmp_path):
    """A key that dead-lettered in TWO epochs must resolve to its NEWEST
    failed value after requeue — the rank-image seq keeps the original
    (epoch, seq) order inside the fresh epoch (code-review regression:
    flat re-stamping let an older high-seq value win)."""
    import pyarrow.compute as pc

    import ray.data as rd
    from etl_cms_ray.pipelines.ingest import read_lake_table
    from etl_cms_ray.pipelines.maintenance import requeue_dead_letter

    root = str(tmp_path / "lake")
    cfg = EngineConfig(lake_root=root, num_partitions=8)

    def bad(epoch, seq, content):
        return pa.table({
            "repo": ["r1"], "path": ["f.py"], "op": ["upsert"],  # invalid op
            "commit": ["c"], "epoch": pa.array([epoch], pa.int64()),
            "seq": pa.array([seq], pa.int64()), "lang": ["py"],
            "content": pa.array([content], pa.large_string()),
        })

    # older epoch has the HIGHER seq — the adversarial case
    ingest(rd.from_arrow(bad(1, 10, "OLD")), cfg, count_input=False)
    ingest(rd.from_arrow(bad(2, 2, "NEW")), cfg, count_input=False)
    assert read_lake_table(root).num_rows == 0

    def fix(t: pa.Table) -> pa.Table:
        op = pc.if_else(pc.equal(t["op"], "upsert"),
                        pa.scalar("insert"), t["op"])
        return t.set_column(t.column_names.index("op"), "op", op)

    res = requeue_dead_letter(root, cfg, fix_fn=fix)
    assert res.events_applied >= 1
    lake = read_lake_table(root).to_pandas()
    assert len(lake) == 1 and lake["content"].iloc[0] == "NEW"


def test_requeue_unions_heterogeneous_dead_letter_schemas(ray_session, tmp_path):
    """Dead-letter files written before and after a schema evolution
    carry different physical schemas; the requeue read must promote to
    the union instead of pinning the first file's schema (which would
    null out evolved payload columns)."""
    import pyarrow.compute as pc

    import ray.data as rd
    from etl_cms_ray.pipelines.ingest import read_lake_table
    from etl_cms_ray.pipelines.maintenance import requeue_dead_letter
    from etl_cms_ray.schema import SchemaChange

    root = str(tmp_path / "lake")
    cfg = EngineConfig(lake_root=root, num_partitions=8)
    pre = pa.table({
        "repo": ["r1"], "path": ["a.py"], "op": ["upsert"],
        "commit": ["c"], "epoch": pa.array([0], pa.int64()),
        "seq": pa.array([0], pa.int64()), "lang": ["py"],
        "content": pa.array(["A"], pa.large_string()),
    })
    ingest(rd.from_arrow(pre), cfg, count_input=False)
    post = pre.set_column(1, "path", pa.array(["b.py"])) \
              .set_column(4, "epoch", pa.array([1], pa.int64())) \
              .append_column("stars", pa.array([7], pa.int64()))
    ingest(rd.from_arrow(post), cfg, count_input=False,
           schema_changes=[SchemaChange(epoch=1, change="add_column",
                                        column="stars", type_name="int64",
                                        default=0)])

    def fix(t: pa.Table) -> pa.Table:
        op = pc.if_else(pc.equal(t["op"], "upsert"),
                        pa.scalar("insert"), t["op"])
        return t.set_column(t.column_names.index("op"), "op", op)

    res = requeue_dead_letter(root, cfg, fix_fn=fix)
    assert res.events_applied == 2
    lake = read_lake_table(root).to_pandas().set_index("path")
    # the evolved payload value survived the union read (not nulled to
    # the backfill default for the row that carried it)
    assert int(lake.loc["b.py", "stars"]) == 7
    assert int(lake.loc["a.py", "stars"]) == 0  # pre-evolution row backfills


def test_schema_rename_end_to_end(ray_session, tmp_path):
    """Metadata-plane column rename (Iceberg model): base and evolved
    columns renamed mid-stream; old data files keep the old physical
    name and promote through the alias history on full AND pruned
    reads; engine state matches the oracle under the same registry;
    time travel at a pre-rename version shows the old names; engine
    columns are unrenamable."""
    import pyarrow.compute as pc

    from etl_cms_ray.pipelines.history import read_snapshot
    from etl_cms_ray.schema import SchemaChange

    repos = make_repos(3, 5)
    ev = make_events(repos, n_epochs=4, events_per_epoch=40)
    add = SchemaChange(epoch=1, change="add_column", column="stars",
                       type_name="int64", default=3)
    ren1 = SchemaChange(epoch=2, change="rename_column", column="lang",
                        new_name="language")
    ren2 = SchemaChange(epoch=3, change="rename_column", column="stars",
                        new_name="rating")
    changes = [add, ren1, ren2]
    cfg = _cfg(tmp_path, "lake_rename")
    ingest(ray.data.from_arrow(ev.filter(pc.less_equal(ev["epoch"], 1))),
           cfg, schema_changes=[add])
    v1 = LakeStore(cfg.lake_root).current_version()
    # second increment touches ONLY repo r0000's partitions so other
    # partitions keep v1 files (old physical names) — the mixed lake
    first_repo = ev["repo"].to_pylist()[0]
    late = ev.filter(pc.and_(pc.greater(ev["epoch"], 1),
                             pc.equal(ev["repo"], first_repo)))
    assert late.num_rows > 0
    ingest(ray.data.from_arrow(late), cfg, schema_changes=changes)

    lake = read_lake_table(cfg.lake_root)
    assert "language" in lake.column_names and "rating" in lake.column_names
    assert "lang" not in lake.column_names and "stars" not in lake.column_names
    applied = ev.filter(pc.or_(pc.less_equal(ev["epoch"], 1),
                               pc.equal(ev["repo"], first_repo)))
    expected = replay(applied, registry=SchemaRegistry(changes=changes))
    assert tables_equal_by_sha(lake, expected)

    # pruned mixed-schema read resolves old physical names per file
    pruned = read_lake(cfg.lake_root,
                       columns=["repo", "path", "language", "rating"]
                       ).to_pandas().sort_values(["repo", "path"])
    full = lake.to_pandas().sort_values(["repo", "path"])
    assert list(pruned["language"]) == list(full["language"])
    assert list(pruned["rating"]) == list(full["rating"])

    # time travel: the pre-rename snapshot still shows the old names
    snap = read_snapshot(cfg.lake_root, version=v1).to_pandas()
    assert "lang" in snap.columns and "stars" in snap.columns

    # guards
    for bad_kw in (dict(column="repo", new_name="r2"),
                   dict(column="lang", new_name="size"),
                   dict(column="ghost", new_name="g2"),
                   dict(column="lang", new_name=None)):
        with pytest.raises((ValueError, KeyError)):
            SchemaRegistry(changes=[SchemaChange(
                epoch=0, change="rename_column", **bad_kw)]).schema_for(1)

    # registry plumbing: alias chains + per-version physical names
    reg = SchemaRegistry(changes=[
        SchemaChange(epoch=0, change="rename_column", column="lang",
                     new_name="tongue"),
        SchemaChange(epoch=1, change="rename_column", column="tongue",
                     new_name="language"),
    ])
    assert reg.alias_history() == {"language": ["tongue", "lang"]}
    assert reg.physical_names(0)["language"] == "lang"
    assert reg.physical_names(1)["language"] == "tongue"
    assert reg.physical_names(2)["language"] == "language"


def test_renamed_away_names_are_retired(ray_session):
    """Re-adding (or renaming onto) a name consumed by a rename must
    fail loudly: old files physically carry it holding the pre-rename
    column's data, so reusing it would surface stale values."""
    from etl_cms_ray.schema import SchemaChange

    with pytest.raises(ValueError, match="retired"):
        SchemaRegistry(changes=[
            SchemaChange(epoch=0, change="rename_column", column="lang",
                         new_name="language"),
            SchemaChange(epoch=1, change="add_column", column="lang",
                         type_name="string", default="?"),
        ]).schema_for(2)
    with pytest.raises(ValueError, match="retired"):
        SchemaRegistry(changes=[
            SchemaChange(epoch=0, change="add_column", column="stars",
                         type_name="int64", default=0),
            SchemaChange(epoch=1, change="rename_column", column="lang",
                         new_name="language"),
            SchemaChange(epoch=2, change="rename_column", column="stars",
                         new_name="lang"),
        ]).schema_for(3)


def test_dropped_names_cannot_be_reused(ray_session):
    """Re-adding (or renaming onto) a name that was ever soft-dropped
    must fail loudly: old files physically carry the dropped column, and
    promote-on-read prefers a physically-present name, so reuse would
    surface stale pre-drop data (ADVICE r3: drop d then rename c->d)."""
    from etl_cms_ray.schema import SchemaChange

    with pytest.raises(ValueError, match="dropped"):
        SchemaRegistry(changes=[
            SchemaChange(epoch=0, change="drop_column", column="lang"),
            SchemaChange(epoch=1, change="add_column", column="lang",
                         type_name="string", default="?"),
        ]).schema_for(2)
    with pytest.raises(ValueError, match="dropped"):
        SchemaRegistry(changes=[
            SchemaChange(epoch=0, change="add_column", column="stars",
                         type_name="int64", default=0),
            SchemaChange(epoch=1, change="drop_column", column="lang"),
            SchemaChange(epoch=2, change="rename_column", column="stars",
                         new_name="lang"),
        ]).schema_for(3)


def test_oracle_reads_evolved_values_through_renames(ray_session):
    """Events that carried an evolved value under its PRE-rename name
    must surface it in the oracle's post-rename output column."""
    from etl_cms_ray.schema import SchemaChange

    changes = [
        SchemaChange(epoch=1, change="add_column", column="stars",
                     type_name="int64", default=0),
        SchemaChange(epoch=2, change="rename_column", column="stars",
                     new_name="rating"),
    ]
    # epoch-2 event activates the rename (the oracle emits the schema in
    # force at the max applied epoch); the epoch-1 event carried its
    # value under the pre-rename name
    ev = pa.table({
        "repo": ["r", "r", "r"], "path": ["a", "b", "c"],
        "op": ["update", "update", "update"],
        "commit": ["c1", "c2", "c3"],
        "epoch": pa.array([1, 1, 2], type=pa.int64()),
        "seq": pa.array([0, 1, 0], type=pa.int64()),
        "lang": ["py", "py", "py"], "content": ["x", "y", "z"],
        "stars": pa.array([7, None, None], type=pa.int64()),
    })
    out = replay(ev, registry=SchemaRegistry(changes=changes)).to_pydict()
    assert "rating" in out and "stars" not in out
    by_path = dict(zip(out["path"], out["rating"]))
    assert by_path["a"] == 7      # carried value survives the rename
    assert by_path["b"] == 0      # null -> backfill default


def test_stdhttp_timeout_and_options():
    """stdhttp:// requests carry a timeout (wedged server must fail the
    task, not hang it) and the option plumbs through storage options."""
    from etl_cms_ray.functions.httpfs import StdlibHTTPFileSystem

    assert StdlibHTTPFileSystem().timeout == 30.0
    assert StdlibHTTPFileSystem(timeout=2.5).timeout == 2.5
    # read-only contract
    import pytest as _pytest
    with _pytest.raises(NotImplementedError):
        StdlibHTTPFileSystem()._open("127.0.0.1:1/x", mode="wb")
