"""Lake maintenance: re-bucketing / compaction and integrity audit.

- ``repartition_lake``: rewrite the lake under a new partition count —
  the shard-merge analog (S8, ``merge.py``) and the escape hatch when a
  lake's key space outgrows its original bucket count.  Runs as one
  read -> re-key -> groupby -> rewrite pipeline and publishes a fresh
  manifest atomically; the old layout stays live until the publish.
- ``audit_lake``: verify per-partition invariants (row counts vs
  manifest, content sha256 recomputation, key->partition placement) —
  the golden-comparison spirit of the reference's expected-output diffs,
  applied to a live lake.
"""

from __future__ import annotations

import json
import os
import time

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import part_id_for, sha256_column
from ..state.manifest import LakeStore, Manifest, PartitionState
from ..stages.applier import _column_stats, _write_deterministic
from .ingest import read_lake


def repartition_lake(lake_root: str, new_num_partitions: int) -> Manifest:
    """Rewrite every live row under a new (repo, path)-hash bucketing.

    Epoch fences collapse to the MAX over source partitions.  This relies
    on the engine's delivery contract (ingest/tail apply epochs in
    non-decreasing order): under it, every event of an epoch <= max was
    already offered — a key's events always advance its own partition's
    fence, so fence(A) < max only means later epochs had no events for
    A's keys.  Crucially, EVERY new bucket gets a manifest entry (even
    empty ones): dropping entries for empty partitions would lose fence
    knowledge and let a replayed pre-delete insert resurrect a deleted
    key whose bucket emptied out.
    """
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    global_fence = max(
        (p.applied_through_epoch for p in manifest.partitions.values()), default=-1
    )

    ds = read_lake(lake_root)

    def rekey(t: pa.Table) -> pa.Table:
        return t.append_column(
            "part_id", part_id_for(t["repo"], t["path"], new_num_partitions)
        )

    def write_partition(group: pa.Table) -> pa.Table:
        part_id = group["part_id"][0].as_py()
        live = group.drop_columns(["part_id"])
        live = live.take(
            pc.sort_indices(live, sort_keys=[("repo", "ascending"), ("path", "ascending")])
        )
        fname, sha16 = _write_deterministic(
            live,
            os.path.join(lake_root, "data", f"part={part_id:05d}"),
            f"e{global_fence:010d}-rp{new_num_partitions}",
        )
        return pa.table(
            {
                "part_id": pa.array([part_id], type=pa.int32()),
                "file": [os.path.relpath(fname, lake_root)],
                "rows": pa.array([live.num_rows], type=pa.int64()),
                "content_hash": [sha16],
                "stats": [json.dumps(_column_stats(live), sort_keys=True)],
            }
        )

    rows = (
        ds.map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("part_id")
        .map_groups(write_partition, batch_format="pyarrow")
        .take_all()
    )

    new_manifest = Manifest(version=manifest.version + 1, num_partitions=new_num_partitions)
    # every bucket gets an entry carrying the fence — including empty ones
    for pid in range(new_num_partitions):
        new_manifest.partitions[pid] = PartitionState(
            part_id=pid,
            file=None,
            rows=0,
            applied_through_epoch=global_fence,
            content_hash="",
            schema_version=latest,
        )
    for r in rows:
        pid = int(r["part_id"])
        new_manifest.partitions[pid] = PartitionState(
            part_id=pid,
            file=r["file"],
            rows=int(r["rows"]),
            applied_through_epoch=global_fence,
            content_hash=r["content_hash"],
            schema_version=latest,
            stats=json.loads(r["stats"]) if r.get("stats") else {},
        )
    new_manifest.metrics = {
        "op": "repartition",
        "from_partitions": manifest.num_partitions,
        "to_partitions": new_num_partitions,
        "lake_rows": sum(p.rows for p in new_manifest.partitions.values()),
    }
    store.publish(new_manifest, expect_version=manifest.version)
    store.append_lineage({"manifest_version": new_manifest.version, **new_manifest.metrics})
    return new_manifest


def compact_lake(lake_root: str) -> Manifest:
    """Fold every merge-on-read delta chain back into its base file (one
    task per partition), publishing a fresh manifest.  No-op partitions
    (no deltas) keep their files untouched."""
    import pyarrow.parquet  # noqa: F401  (ensure worker import)

    import ray.data as rd

    from ..schema import SchemaRegistry
    from ..stages.applier import _write_deterministic as _wd
    from .ingest import load_partition_live

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    todo = [
        {"part_id": ps.part_id, "file": ps.file, "deltas": list(ps.deltas),
         "fence": ps.applied_through_epoch}
        for ps in manifest.partitions.values()
        if ps.deltas
    ]
    new_manifest = Manifest(
        version=manifest.version + 1,
        num_partitions=manifest.num_partitions,
        partitions=dict(manifest.partitions),
    )
    if todo:
        reg_json = registry.to_json()

        def fold(batch: pa.Table) -> pa.Table:
            reg = SchemaRegistry.from_json(reg_json)
            out = {"part_id": [], "file": [], "rows": [], "content_hash": [],
                   "fence": [], "stats": []}
            for pid, f0, ds_, fence in zip(
                batch["part_id"].to_pylist(), batch["file"].to_pylist(),
                batch["deltas"].to_pylist(), batch["fence"].to_pylist(),
            ):
                live = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
                fname, sha16 = _wd(
                    live, os.path.join(lake_root, "data", f"part={pid:05d}"),
                    f"e{fence:010d}",
                )
                out["part_id"].append(pid)
                out["file"].append(os.path.relpath(fname, lake_root))
                out["rows"].append(live.num_rows)
                out["content_hash"].append(sha16)
                out["fence"].append(fence)
                # compaction folds tombstones away — recompute TIGHT zone
                # maps over the live rows (MOR widening is undone here)
                out["stats"].append(json.dumps(_column_stats(live), sort_keys=True))
            return pa.table(
                {
                    "part_id": pa.array(out["part_id"], type=pa.int32()),
                    "file": out["file"],
                    "rows": pa.array(out["rows"], type=pa.int64()),
                    "content_hash": out["content_hash"],
                    "fence": pa.array(out["fence"], type=pa.int64()),
                    "stats": out["stats"],
                }
            )

        rows = rd.from_items(todo).map_batches(
            fold, batch_format="pyarrow", batch_size=1
        ).take_all()
        for r in rows:
            pid = int(r["part_id"])
            new_manifest.partitions[pid] = PartitionState(
                part_id=pid,
                file=r["file"],
                rows=int(r["rows"]),
                applied_through_epoch=int(r["fence"]),
                content_hash=r["content_hash"],
                schema_version=latest,
                deltas=[],
                stats=json.loads(r["stats"]) if r.get("stats") else {},
            )
    new_manifest.metrics = {
        "op": "compact",
        "partitions_compacted": len(todo),
        "lake_rows": sum(p.rows for p in new_manifest.partitions.values()),
    }
    store.publish(new_manifest, expect_version=manifest.version)
    store.append_lineage({"manifest_version": new_manifest.version, **new_manifest.metrics})
    return new_manifest


def audit_lake(lake_root: str, version: int | None = None) -> dict:
    """Distributed integrity audit of the live lake (or, with
    ``version``, of any manifest snapshot — including a STAGED one, which
    is the audit step of write-audit-publish: validate what an ingest
    wrote before CURRENT moves to it).

    Checks per batch (vectorized, streaming): stored content_sha equals
    recomputed sha256(content); size equals byte length; and every key
    hashes into the partition file that holds it.  Per partition:
    post-merge KEY UNIQUENESS ((repo, path) appears once in the live
    state — the analog of the reference's PK constraints,
    ``SQL/create_CDMv5_constraints.sql``) and EPOCH-FENCE consistency
    (no live row's epoch exceeds the partition's
    ``applied_through_epoch``, and no fence regressed vs the previous
    manifest version).  Returns violation counts (all zero on a healthy
    lake).
    """
    from .history import read_snapshot

    store = LakeStore(lake_root)
    manifest = store.load_manifest(version=version)
    num_parts = manifest.num_partitions
    rows_known = all(p.rows >= 0 for p in manifest.partitions.values())
    expected_rows = (
        sum(p.rows for p in manifest.partitions.values()) if rows_known else -1
    )

    ds = read_snapshot(lake_root, version=version)

    def check(t: pa.Table) -> pa.Table:
        sha_ok = pc.equal(sha256_column(t["content"]), t["content_sha"])
        size_ok = pc.equal(
            pc.binary_length(t["content"].cast(pa.large_binary())).cast(t["size"].type),
            t["size"],
        )
        return pa.table(
            {
                "n": pa.array([t.num_rows], type=pa.int64()),
                "bad_sha": pa.array(
                    [t.num_rows - pc.sum(pc.cast(sha_ok, pa.int64())).as_py()],
                    type=pa.int64(),
                ),
                "bad_size": pa.array(
                    [t.num_rows - pc.sum(pc.cast(size_ok, pa.int64())).as_py()],
                    type=pa.int64(),
                ),
            }
        )

    agg = ds.map_batches(check, batch_format="pyarrow").to_pandas().sum()

    # key->partition placement: every row of part=<p>'s file must hash to p
    # (one Ray task per partition; file origin is lost after read_lake, so
    # this pass reads per-partition files directly)
    import ray.data as rd

    parts = [
        {"part_id": ps.part_id, "file": store.abspath(f),
         "fence": ps.applied_through_epoch}
        for ps in manifest.partitions.values()
        for f in ps.all_files()
    ]
    misplaced = dup_keys = over_fence = 0
    if parts:
        def check_files(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as pq

            from ..functions.hashing import key_array

            bad, dups, over = [], [], []
            for pid, path, fence in zip(
                batch["part_id"].to_pylist(), batch["file"].to_pylist(),
                batch["fence"].to_pylist(),
            ):
                pf = pq.ParquetFile(path)
                cols = ["repo", "path"] + (
                    ["epoch"] if "epoch" in pf.schema_arrow.names else []
                )
                t = pq.read_table(path, columns=cols)
                got = part_id_for(t["repo"], t["path"], num_parts)
                bad.append(int(pc.sum(pc.cast(pc.not_equal(got, pid), pa.int64())).as_py() or 0))
                # key uniqueness is a PER-FILE invariant: the applier
                # writes every base/delta file LWW-merged (one row per
                # key per commit), so any in-file duplicate is corruption
                # — the merged live state dedups by construction and
                # would hide it
                keys = key_array(t["repo"], t["path"])
                dups.append(t.num_rows - len(pc.unique(keys)))
                over.append(int(pc.sum(pc.cast(
                    pc.greater(t["epoch"], fence), pa.int64()
                )).as_py() or 0) if "epoch" in t.column_names else 0)
            return pa.table({"bad": pa.array(bad, type=pa.int64()),
                             "dups": pa.array(dups, type=pa.int64()),
                             "over": pa.array(over, type=pa.int64())})

        file_agg = (
            rd.from_items(parts)
            .map_batches(check_files, batch_format="pyarrow", batch_size=4)
            .to_pandas().sum()
        )
        misplaced = int(file_agg["bad"])
        dup_keys, over_fence = int(file_agg["dups"]), int(file_agg["over"])

    # fence monotonicity vs the previous manifest version (cheap driver
    # pass over two partition maps; version numbers may be reused after
    # rollback, so only a still-readable prior version is compared)
    fence_regressions = 0
    if manifest.version > 1:
        try:
            prev = store.load_manifest(version=manifest.version - 1)
        except FileNotFoundError:
            prev = None
        if prev is not None and prev.num_partitions == manifest.num_partitions:
            for pid, ps in manifest.partitions.items():
                if pid in prev.partitions and (
                    ps.applied_through_epoch
                    < prev.partitions[pid].applied_through_epoch
                ):
                    fence_regressions += 1

    return {
        "rows_scanned": int(agg["n"]),
        "rows_expected": expected_rows,
        "bad_sha": int(agg["bad_sha"]),
        "bad_size": int(agg["bad_size"]),
        "misplaced_keys": misplaced,
        "duplicate_keys": dup_keys,
        "rows_over_fence": over_fence,
        "fence_regressions": fence_regressions,
        "num_partitions": num_parts,
        "healthy": int(agg["bad_sha"]) == 0
        and int(agg["bad_size"]) == 0
        and misplaced == 0
        and dup_keys == 0
        and over_fence == 0
        and fence_regressions == 0
        and (expected_rows < 0 or int(agg["n"]) == expected_rows),
    }


def expire_snapshots(lake_root: str, keep_last: int = 2,
                     grace_sec: float = 0.0) -> dict:
    """Retention / vacuum: delete manifest versions older than the newest
    ``keep_last`` and every data file no kept manifest references — the
    Delta/Iceberg VACUUM analog that bounds the lake's disk growth
    (content-addressed files are immutable and shared across manifests,
    so referenced-set subtraction is the only safe deletion rule).

    Time travel / rollback to expired versions is gone afterwards (by
    design); the operation is crash-safe in this order: expired MANIFESTS
    are unlinked first (no pointer can dangle), then unreferenced data
    files — a crash in between leaves re-collectable orphans, never a
    broken snapshot.  Returns counts + bytes reclaimed and logs a
    lineage entry.

    ``grace_sec``: skip unreferenced data files younger than this (by
    mtime).  0 (default) collects every orphan immediately — correct
    under the engine's single-writer discipline; set a retention window
    (e.g. 3600) when an operator cannot rule out an in-flight ingest
    whose just-written files are not yet referenced by any manifest —
    the Delta VACUUM retention-period analog.
    """
    import glob

    if keep_last < 1:
        # keep_last=0 would compute horizon=cur+1, keep NOTHING, and
        # vacuum the live lake out from under CURRENT
        raise ValueError("keep_last must be >= 1 (the current snapshot)")
    store = LakeStore(lake_root)
    cur = store.current_version()
    if cur == 0:
        return {"kept_versions": [], "manifests_deleted": 0,
                "files_deleted": 0, "bytes_reclaimed": 0}
    existing = sorted(
        int(os.path.basename(p)[len("manifest-"):-len(".json")])
        for p in glob.glob(os.path.join(store.manifest_dir, "manifest-*.json"))
    )
    horizon = cur - keep_last + 1
    # versions NEWER than current (roll-forward manifests left by a
    # rollback) are kept too — expiry only trims the past; TAGGED
    # versions are pinned regardless of age (a tag is a promise that
    # the snapshot stays readable — Iceberg tag-retention semantics)
    tagged = {int(e["version"]) for e in store.tags().values()}
    keep = [v for v in existing if v >= horizon or v in tagged]
    referenced: set[str] = set()
    kept_shards: set[str] = set()
    for v in keep:
        m = store.load_manifest(version=v)
        referenced.update(m.live_files())
        idx = store._load_index(v)
        if idx:
            kept_shards.update(ref["file"] for ref in idx.get("shards", {}).values())

    manifests_deleted = 0
    for v in existing:
        if v not in keep:
            os.unlink(os.path.join(store.manifest_dir, f"manifest-{v:06d}.json"))
            manifests_deleted += 1
    # shard files: content-addressed and shared across versions — keep
    # exactly those the kept indexes reference
    for path in glob.glob(os.path.join(store.manifest_dir, "shards", "*.json")):
        rel = os.path.join("shards", os.path.basename(path))
        if rel not in kept_shards:
            os.unlink(path)

    files_deleted = 0
    bytes_reclaimed = 0
    now = time.time()
    data_root = os.path.join(lake_root, "data")
    for dirpath, _dirs, files in os.walk(data_root):
        for f in files:
            abspath = os.path.join(dirpath, f)
            rel = os.path.relpath(abspath, lake_root)
            if rel not in referenced:
                if grace_sec > 0 and now - os.path.getmtime(abspath) < grace_sec:
                    continue  # possibly an in-flight writer's file
                bytes_reclaimed += os.path.getsize(abspath)
                os.unlink(abspath)
                files_deleted += 1

    report = {
        "kept_versions": keep,
        "manifests_deleted": manifests_deleted,
        "files_deleted": files_deleted,
        "bytes_reclaimed": bytes_reclaimed,
    }
    store.append_lineage({"op": "expire_snapshots", **report})
    return report


def find_orphan_files(lake_root: str, grace_sec: float = 0.0) -> list[dict]:
    """Dry-run debris report: data files under ``data/`` that NO existing
    manifest version references — the residue of a writer that crashed
    between its content-addressed file write and the manifest publish
    (such files are invisible to every reader by construction; they only
    hold disk).  Deletion stays with ``expire_snapshots`` — this is the
    inspection half (Delta's VACUUM DRY RUN analog), cheap enough to run
    per commit: O(existing manifests) metadata reads + one directory
    walk, no data reads.

    ``grace_sec`` skips files younger than the window (a concurrent
    in-flight ingest's just-written files are not orphans yet).  Returns
    ``{"file", "bytes", "age_sec"}`` per orphan, oldest first."""
    import glob

    store = LakeStore(lake_root)
    referenced: set[str] = set()
    versions = sorted(
        int(os.path.basename(p)[len("manifest-"):-len(".json")])
        for p in glob.glob(os.path.join(store.manifest_dir, "manifest-*.json"))
    )
    for v in versions:
        referenced.update(store.load_manifest(version=v).live_files())
    now = time.time()
    out = []
    for dirpath, _dirs, files in os.walk(os.path.join(lake_root, "data")):
        for f in files:
            abspath = os.path.join(dirpath, f)
            rel = os.path.relpath(abspath, lake_root)
            if rel in referenced:
                continue
            age = now - os.path.getmtime(abspath)
            if age < grace_sec:
                continue
            out.append({"file": rel, "bytes": os.path.getsize(abspath),
                        "age_sec": round(age, 1)})
    out.sort(key=lambda r: -r["age_sec"])
    return out


def auto_maintain(
    lake_root: str,
    *,
    compact_delta_depth: int = 1,
    expire_keep_last: int | None = None,
    orphan_grace_sec: float = 3600.0,
    refresh_artifacts: bool = True,
    rebalance_skew_ratio: float | None = None,
    rebalance_growth: int = 2,
    rebalance_max_partitions: int | None = None,
) -> dict:
    """One idempotent maintenance sweep — the policy loop a production
    deployment schedules after every commit batch, composed from the
    engine's own fenced operations so re-running it is always safe:

    1. **Compact** the MOR delta chains when any partition's depth has
       reached ``compact_delta_depth`` (read amplification bound).
    2. **Rebalance** (opt-in via ``rebalance_skew_ratio``): when the
       hottest partition holds >= ratio × the median partition's rows,
       repartition the lake to ``num_partitions × rebalance_growth`` —
       acting on exactly the skew signal ``lake_freshness`` reports.
       This fixes KEY-COUNT skew (too many keys hashing together);
       single-key hot spots need ingest-side salting instead (the
       partitioner keeps a key's rows co-located by design).  Runs
       before artifact refresh so artifacts rebuild against the new
       layout; fences ride the repartition unchanged (replays stay
       no-ops — the partition-evolution contract).
       ``rebalance_max_partitions`` caps growth: hash-residue clumping
       (keys that collide at every width) would otherwise re-trigger
       each sweep and double forever.
    3. **Refresh every registered derived artifact** incrementally —
       the token index (``_index/``), every sorted projection
       (``_projections/<name>``), every z-order layout
       (``_zorder/<name>``) — each refresh is O(changed partitions) by
       construction and rebuilds nothing when already fresh, so this
       step costs metadata reads on a quiet lake.
    4. **Expire** snapshots beyond ``expire_keep_last`` (opt-in: time
       travel shrinks, so the default keeps everything).
    5. **Report** orphaned data files (grace-windowed) — report only;
       deletion stays with expire_snapshots.

    Returns the action report.  The decision inputs are manifest
    metadata only; no data is read to decide anything."""
    import glob
    import json as _json

    import pyarrow.parquet as _pq

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    report: dict = {"compacted": False, "rebalanced": False, "index": None,
                    "projections": {}, "zorders": {}, "expired": None,
                    "orphans": []}

    max_depth = max((len(p.deltas) for p in manifest.partitions.values()),
                    default=0)
    if max_depth >= compact_delta_depth and manifest.has_deltas():
        m = compact_lake(lake_root)
        report["compacted"] = {"from_max_depth": max_depth,
                               "new_version": m.version}
        manifest = store.load_manifest()

    if rebalance_skew_ratio is not None:
        known = [p.rows for p in manifest.partitions.values()
                 if p.rows is not None and p.rows >= 0]
        if len(known) >= 2:
            # same median convention as lake_freshness (upper-middle
            # element), so operators can tune the threshold from the
            # monitor's own numbers
            med = sorted(known)[len(known) // 2]
            mx = max(known)
            new_n = manifest.num_partitions * rebalance_growth
            capped = (rebalance_max_partitions is not None
                      and new_n > rebalance_max_partitions)
            if med > 0 and mx / med >= rebalance_skew_ratio and not capped:
                m = repartition_lake(lake_root, new_n)
                report["rebalanced"] = {
                    "max_rows": int(mx), "median_rows": float(med),
                    "ratio": round(mx / med, 2),
                    "from_partitions": manifest.num_partitions,
                    "to_partitions": new_n, "new_version": m.version,
                }
                manifest = store.load_manifest()

    if refresh_artifacts:
        idx_path = os.path.join(lake_root, "_index", "tokens.parquet")
        if os.path.exists(idx_path):
            from .index import build_token_index

            meta = _json.loads(
                _pq.read_schema(idx_path).metadata[b"token_index"].decode())
            report["index"] = build_token_index(
                lake_root, column=meta["column"],
                num_buckets=int(meta["num_buckets"]), incremental=True)
        from .projection import build_projection, load_projection_meta
        from .zorder import build_zorder, load_zorder_meta

        for name_dir in sorted(glob.glob(
                os.path.join(lake_root, "_projections", "*"))):
            name = os.path.basename(name_dir)
            m = load_projection_meta(lake_root, name)
            if m:
                report["projections"][name] = build_projection(
                    lake_root, name, m["sort_col"], columns=m["columns"],
                    num_ranges=int(m["num_ranges"]), incremental=True)
        for name_dir in sorted(glob.glob(
                os.path.join(lake_root, "_zorder", "*"))):
            name = os.path.basename(name_dir)
            m = load_zorder_meta(lake_root, name)
            if m:
                report["zorders"][name] = build_zorder(
                    lake_root, name, m["zcols"], columns=m["columns"],
                    num_files=int(m["num_files"]), incremental=True)

    if expire_keep_last is not None:
        report["expired"] = expire_snapshots(lake_root,
                                             keep_last=expire_keep_last)
    report["orphans"] = find_orphan_files(lake_root,
                                          grace_sec=orphan_grace_sec)
    store.append_lineage({"op": "auto_maintain",
                          "compacted": bool(report["compacted"]),
                          "rebalanced": bool(report["rebalanced"]),
                          "artifacts": {
                              "index": bool(report["index"]),
                              "projections": sorted(report["projections"]),
                              "zorders": sorted(report["zorders"])},
                          "orphans": len(report["orphans"])})
    return report


# ---------------------------------------------------------------------------
# In-place rewrites: DELETE WHERE / UPDATE WHERE over the live lake


def _rewrite_lake(lake_root: str, rewrite_fn, op_name: str,
                  allow_row_loss: bool) -> Manifest:
    """Shared core of ``delete_where``/``update_where``: one task per
    partition loads the live rows (MOR deltas folded), applies
    ``rewrite_fn``, re-derives the invariant columns (content_sha =
    sha256(content), size = byte length — so ``audit_lake`` stays green
    by construction), key-sorts, rewrites the base and publishes a fresh
    manifest with tight stats.  Epoch fences are UNCHANGED: the rewrite
    is outside the event stream, so later events still win by (epoch,
    seq) and replays of already-applied epochs stay fenced no-ops.

    Keys must keep their hash placement: rewrite_fn may drop rows (when
    ``allow_row_loss``) but NEVER change repo/path — the task verifies
    the surviving key set is a subset of the input's and fails loudly
    otherwise (a silently moved key would corrupt point_lookup and the
    fence semantics).

    Reference analog: the reference can only re-run the whole forward
    pass to amend output (``Main.py``); Delta/Iceberg expose this as
    DELETE/UPDATE.  snapshot_diff sees the rewrite as ordinary
    update/delete changelog rows, so replicas converge via sync_lake.
    """
    import ray.data as rd

    from ..functions.hashing import key_array
    from ..schema import SchemaRegistry
    from .ingest import load_partition_live

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    todo = [
        {"part_id": ps.part_id, "file": ps.file, "deltas": list(ps.deltas),
         "fence": ps.applied_through_epoch}
        for ps in manifest.partitions.values()
        if ps.file or ps.deltas
    ]
    new_manifest = Manifest(
        version=manifest.version + 1,
        num_partitions=manifest.num_partitions,
        partitions=dict(manifest.partitions),
        partitioner=manifest.partitioner,
    )
    rows_before = rows_after = 0
    if todo:
        reg_json = registry.to_json()

        def rewrite(batch: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            reg = SchemaRegistry.from_json(reg_json)
            out = {"part_id": [], "file": [], "rows": [], "content_hash": [],
                   "fence": [], "stats": [], "rows_in": []}
            for pid, f0, ds_, fence in zip(
                batch["part_id"].to_pylist(), batch["file"].to_pylist(),
                batch["deltas"].to_pylist(), batch["fence"].to_pylist(),
            ):
                live = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
                new = rewrite_fn(live)
                in_keys = set(key_array(live["repo"], live["path"]).to_pylist())
                out_keys = key_array(new["repo"], new["path"]).to_pylist()
                if not set(out_keys) <= in_keys or len(out_keys) != len(set(out_keys)):
                    raise ValueError(
                        f"{op_name}: rewrite changed or duplicated keys in "
                        f"partition {pid} — repo/path are immutable here"
                    )
                if not allow_row_loss and new.num_rows != live.num_rows:
                    raise ValueError(f"{op_name}: rewrite dropped rows")
                # re-derive the judged invariants from the (possibly new)
                # content, whatever the rewrite touched
                content = new["content"]
                new = new.set_column(
                    new.schema.get_field_index("content_sha"), "content_sha",
                    sha256_column(content),
                )
                size = pc.fill_null(
                    pc.binary_length(content.cast(pa.large_binary())), 0
                ).cast(new.schema.field("size").type)
                new = new.set_column(
                    new.schema.get_field_index("size"), "size", size
                )
                new = new.take(pc.sort_indices(
                    new, sort_keys=[("repo", "ascending"), ("path", "ascending")]
                ))
                fname, sha16 = _write_deterministic(
                    new, os.path.join(lake_root, "data", f"part={pid:05d}"),
                    f"e{fence:010d}-rw",
                )
                out["part_id"].append(pid)
                out["file"].append(os.path.relpath(fname, lake_root))
                out["rows"].append(new.num_rows)
                out["content_hash"].append(sha16)
                out["fence"].append(fence)
                out["stats"].append(json.dumps(_column_stats(new), sort_keys=True))
                out["rows_in"].append(live.num_rows)
            return pa.table(
                {"part_id": pa.array(out["part_id"], type=pa.int32()),
                 "file": out["file"],
                 "rows": pa.array(out["rows"], type=pa.int64()),
                 "content_hash": out["content_hash"],
                 "fence": pa.array(out["fence"], type=pa.int64()),
                 "stats": out["stats"],
                 "rows_in": pa.array(out["rows_in"], type=pa.int64())}
            )

        rows = rd.from_items(todo).map_batches(
            rewrite, batch_format="pyarrow", batch_size=1
        ).take_all()
        for r in rows:
            pid = int(r["part_id"])
            rows_before += int(r["rows_in"])
            rows_after += int(r["rows"])
            new_manifest.partitions[pid] = PartitionState(
                part_id=pid,
                file=r["file"] if int(r["rows"]) else None,
                rows=int(r["rows"]),
                applied_through_epoch=int(r["fence"]),
                content_hash=r["content_hash"] if int(r["rows"]) else "",
                schema_version=latest,
                deltas=[],
                stats=json.loads(r["stats"]) if r.get("stats") else {},
            )
    new_manifest.metrics = {
        "op": op_name,
        "rows_before": rows_before,
        "rows_after": rows_after,
        "lake_rows": sum(max(p.rows, 0) for p in new_manifest.partitions.values()),
    }
    store.publish(new_manifest, expect_version=manifest.version)
    store.append_lineage({"manifest_version": new_manifest.version,
                          **new_manifest.metrics})
    return new_manifest


def delete_where(lake_root: str, mask_fn) -> Manifest:
    """DELETE WHERE over the live lake: ``mask_fn(table) -> bool array``
    selects rows to REMOVE (the GDPR right-to-be-forgotten path — rows
    leave the base files now, not at the next tombstone compaction).
    One streaming pass, fences unchanged, stats recomputed; the
    changelog shows ordinary deletes, so replicas converge via sync."""
    def rewrite(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.fill_null(mask_fn(t), False)))

    return _rewrite_lake(lake_root, rewrite, "delete_where",
                         allow_row_loss=True)


def update_where(lake_root: str, mask_fn, transform_fn) -> Manifest:
    """UPDATE WHERE over the live lake: rows where ``mask_fn`` is true
    are replaced by ``transform_fn(rows) -> table`` (same schema, keys
    immutable); content_sha/size are re-derived centrally, so transforms
    just edit the payload columns (backfill / in-place redaction)."""
    def rewrite(t: pa.Table) -> pa.Table:
        mask = pc.fill_null(mask_fn(t), False)
        hit = t.filter(mask)
        if hit.num_rows == 0:
            return t
        changed = transform_fn(hit)
        if changed.schema.names != t.schema.names:
            changed = changed.select(t.schema.names)
        return pa.concat_tables([t.filter(pc.invert(mask)),
                                 changed.cast(t.schema)])

    return _rewrite_lake(lake_root, rewrite, "update_where",
                         allow_row_loss=False)


def _dead_letter_envelope(files: list[str]) -> tuple:
    """Global (min_epoch, max_epoch, min_seq, max_seq) over dead-letter
    files — parquet footer statistics only (no data reads); falls back
    to a pruned column read for a file without stats."""
    import pyarrow.parquet as _pq

    min_e = min_s = None
    max_e = max_s = None

    def fold(lo_e, hi_e, lo_s, hi_s):
        nonlocal min_e, max_e, min_s, max_s
        min_e = lo_e if min_e is None else min(min_e, lo_e)
        max_e = hi_e if max_e is None else max(max_e, hi_e)
        min_s = lo_s if min_s is None else min(min_s, lo_s)
        max_s = hi_s if max_s is None else max(max_s, hi_s)

    for f in files:
        md = _pq.ParquetFile(f).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
        got = False
        if "epoch" in idx and "seq" in idx:
            lo_e = hi_e = lo_s = hi_s = None
            ok = True
            for rg in range(md.num_row_groups):
                se = md.row_group(rg).column(idx["epoch"]).statistics
                ss = md.row_group(rg).column(idx["seq"]).statistics
                if se is None or ss is None or not se.has_min_max or not ss.has_min_max:
                    ok = False
                    break
                lo_e = se.min if lo_e is None else min(lo_e, se.min)
                hi_e = se.max if hi_e is None else max(hi_e, se.max)
                lo_s = ss.min if lo_s is None else min(lo_s, ss.min)
                hi_s = ss.max if hi_s is None else max(hi_s, ss.max)
            if ok and lo_e is not None:
                fold(lo_e, hi_e, lo_s, hi_s)
                got = True
        if not got:
            t = _pq.read_table(f, columns=["epoch", "seq"])
            if t.num_rows:
                fold(pc.min(t["epoch"]).as_py(), pc.max(t["epoch"]).as_py(),
                     pc.min(t["seq"]).as_py(), pc.max(t["seq"]).as_py())
    if min_e is None:
        return 0, 0, 0, 0
    return int(min_e), int(max_e), int(min_s), int(max_s)


def requeue_dead_letter(lake_root: str, cfg, fix_fn=None,
                        purge: bool = True, expectations=None):
    """Repair-and-replay the dead-letter store.

    Reads the dead-letter files present NOW (a snapshot — failures
    written by this very requeue are untouched), applies the caller's
    vectorized ``fix_fn(pa.Table) -> pa.Table`` repair, re-stamps every
    row onto a FRESH epoch (``global fence + 1``: requeued events are
    delivered as the newest epoch, so they are not fenced out as
    replays and they WIN last-write-wins against the state they failed
    to enter — the documented repair policy), and runs the REAL ingest
    under the same validity gates: rows that still fail go straight
    back to the dead-letter store with fresh reasons.  On success
    (``purge=True``) the handled files are deleted, so the store only
    holds unresolved failures.

    Ordering: the original binlog order among requeued rows is
    PRESERVED inside the fresh epoch — ``seq`` is rebuilt as the
    lexicographic rank image ``(epoch - min_e) * seq_span + (seq -
    min_s)`` over the queue's (epoch, seq) envelope (computed from
    parquet footer stats, metadata-only), so a key that dead-lettered
    twice resolves to its NEWEST failed value under LWW, never an
    older one.  Dead-letter files carry heterogeneous schemas across
    evolutions; the read promotes each file group to the union schema
    (see ``dead_letter_union``) so evolved payload columns survive the
    requeue.

    Crash window: a crash after the ingest commit but before the purge
    re-requeues the same rows on retry at yet another epoch — the
    repaired content is identical, so the merge converges (idempotent
    content, at-least-once requeue).

    Reference analog: the reference drops unmapped claims on the floor
    after counting them (`CMS_SynPuf_ETL_CDM_v5.py` skip counters);
    this engine keeps them replayable.
    """
    import glob as _glob

    import ray.data

    from ..schema import EVENTS_SCHEMA
    from .ingest import dead_letter_union, ingest

    files = sorted(_glob.glob(
        os.path.join(lake_root, "deadletter", "part=*", "*.parquet")))
    if not files:
        return None
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    fence = max((ps.applied_through_epoch
                 for ps in manifest.partitions.values()), default=-1)
    registry = store.load_registry()
    evolved = [f.name for f in registry.schema_for(registry.latest_version)]
    base = set(EVENTS_SCHEMA.names)
    new_epoch = fence + 1
    min_e, max_e, min_s, max_s = _dead_letter_envelope(files)
    span = max_s - min_s + 1
    if (max_e - min_e + 1) * span >= 2**62:
        raise OverflowError(
            "dead-letter (epoch, seq) envelope too wide to re-rank into "
            f"one int64 seq space: epochs [{min_e},{max_e}], seq span {span}")

    def prep(t: pa.Table, _fix=fix_fn, _epoch=new_epoch) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        if _fix is not None:
            t = _fix(t)
        keep = [c for c in t.column_names
                if c in base or (c in evolved and c not in
                                 ("content_sha", "size"))]
        t = t.select(keep)
        # order-preserving rank image of the original (epoch, seq)
        new_seq = pc.add(
            pc.multiply(pc.subtract(t["epoch"], pa.scalar(min_e, pa.int64())),
                        pa.scalar(span, pa.int64())),
            pc.subtract(t["seq"], pa.scalar(min_s, pa.int64())))
        t = t.set_column(t.column_names.index("seq"), "seq",
                         pc.cast(new_seq, pa.int64()))
        i = t.column_names.index("epoch")
        return t.set_column(
            i, "epoch", pa.array([_epoch] * t.num_rows, type=pa.int64()))

    events = dead_letter_union(files).map_batches(
        prep, batch_format="pyarrow")
    res = ingest(events, cfg, count_input=False, expectations=expectations)
    if purge:
        for f in files:
            try:
                os.unlink(f)
            except FileNotFoundError:
                pass
    return res


def purge_history(lake_root: str, repo: str, path: str | None = None,
                  include_branches: bool = True) -> dict:
    """GDPR right-to-be-forgotten across RETAINED HISTORY.

    ``delete_where`` removes a key from the LIVE relation, but every
    retained time-travel snapshot still serves its rows.  This scrubs a
    subject key (``repo``, optionally one ``repo``+``path``) from EVERY
    retained manifest version IN PLACE: version numbers, epoch fences
    and all other rows' bytes are preserved — replays of the purged
    key's old events stay fenced no-ops and ``snapshot_diff`` /
    changelog consumers keep working — while the key's rows leave every
    readable snapshot, the dead-letter store, and (recursively) every
    branch lake under ``_branches/`` (branch files are hard links, so
    scrubbing only the parent would leave the bytes alive under the
    branch's link — recursion is the only complete erasure).

    Derived layouts that hold row or token copies (``_projections``,
    ``_zorder``, ``_index``) are DROPPED when rows were actually
    removed: a stale copy is not acceptable erasure, and all three are
    rebuildable from the scrubbed lake (re-run their builders —
    ``build_token_index`` / projection / z-order; ``auto_maintain``
    keeps them incremental thereafter).  Tag refs
    are re-pointed at the scrubbed manifest bytes (the one sanctioned
    history rewrite; ``resolve_ref``'s tamper check keeps rejecting any
    OTHER rewrite).  Exported Debezium segments and ``sync_lake``
    replicas live outside this root — purge them separately.

    Scale shape: candidate files are discovered from manifest METADATA
    only — with ``path`` the key hashes to exactly one partition per
    manifest (the partitioner invariant, computed per manifest because
    ``repartition_lake`` may have changed the bucket count), and
    repo-dictionary zone stats prune partitions that provably never
    held the subject.  Each candidate file is rewritten by one Ray task
    (content-addressed, deterministic); manifests are then patched
    shard-by-shard (untouched shards are reused by reference).  Cost is
    O(files that can contain the key), never O(lake).

    Reference analog: ETL-CMS amends output only by re-running the whole
    forward pass (``Main.py``); Delta/Iceberg ship this as VACUUM +
    rewrite guidance for GDPR erasure.
    """
    import glob as _glob
    import re as _re
    import shutil as _sh

    import ray.data as rd

    store = LakeStore(lake_root)
    versions = sorted(
        int(os.path.basename(p)[len("manifest-"):-len(".json")])
        for p in _glob.glob(os.path.join(store.manifest_dir, "manifest-*.json"))
    )
    report = {
        "repo": repo, "path": path, "rows_removed": 0,
        "files_rewritten": 0, "files_deleted": 0, "versions_rewritten": 0,
        "dead_letter_files": 0, "artifacts_dropped": [],
        "orphan_files_purged": 0, "shards_pruned": 0,
        "tags_refreshed": 0, "branches": {},
    }

    manifests = {v: store.load_manifest(version=v) for v in versions}
    # --- candidate discovery: metadata only -----------------------------
    candidates: set[str] = set()
    candidate_dirs: set[str] = set()
    for m in manifests.values():
        if path is not None:
            from ..functions.hashing import part_id_one

            pids = [part_id_one(repo, path, m.num_partitions)]
        else:
            pids = list(m.partitions)
        for pid in pids:
            ps = m.partitions.get(pid)
            if ps is None:
                continue
            st = ps.stats.get("repo")
            if isinstance(st, dict) and repo not in st.get("in", ()):
                continue  # dictionary stats prove the subject never hit it
            candidates.update(ps.all_files())
        candidate_dirs.update(
            f"part={pid:05d}" for pid in pids if pid in m.partitions)

    # subject-bearing ORPHANS in the candidate directories: a crash in a
    # previous purge's deletion phase (or an aborted writer) leaves files
    # no manifest references — a re-run's manifest-driven candidates
    # would never touch them, so the bytes would linger until vacuum.
    # Referenced-set subtraction limited to the pruned partition dirs
    # keeps the walk inside the same cost class as the candidate reads.
    referenced_all: set[str] = set()
    for m in manifests.values():
        referenced_all.update(m.live_files())
    orphan_candidates: list[str] = []
    for d in sorted(candidate_dirs):
        absdir = os.path.join(lake_root, "data", d)
        if not os.path.isdir(absdir):
            continue
        for f in sorted(os.listdir(absdir)):
            rel = os.path.join("data", d, f)
            if f.endswith(".parquet") and rel not in referenced_all:
                orphan_candidates.append(rel)

    # --- distributed scrub of candidate files ---------------------------
    def _scrub_one(abspath: str) -> tuple[str | None, int, int, str]:
        """Rewrite one parquet file minus the subject's rows.  Returns
        (new_abspath or None-if-empty-or-unchanged, rows_left, removed,
        sha16); unchanged files report removed=0 and new=None."""
        import pyarrow.parquet as _pq

        t = _pq.read_table(abspath)
        mask = pc.equal(t["repo"], repo)
        if path is not None and "path" in t.column_names:
            mask = pc.and_(mask, pc.equal(t["path"], path))
        mask = pc.fill_null(mask, False)
        removed = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
        if removed == 0:
            return None, t.num_rows, 0, ""
        kept = t.filter(pc.invert(mask))
        if kept.num_rows == 0:
            return None, 0, removed, ""
        base = os.path.basename(abspath)[: -len(".parquet")]
        stem = _re.sub(r"-[0-9a-f]{16}$", "", base) + "-px"
        fname, sha16 = _write_deterministic(kept, os.path.dirname(abspath), stem)
        return fname, kept.num_rows, removed, sha16

    mapping: dict[str, dict] = {}
    todo = sorted(candidates)
    if todo:
        def scrub_batch(batch: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            out = {"old": [], "new": [], "rows": [], "removed": [], "sha": []}
            for rel in batch["rel"].to_pylist():
                new_abs, rows_left, removed, sha16 = _scrub_one(
                    store.abspath(rel))
                out["old"].append(rel)
                out["new"].append(
                    os.path.relpath(new_abs, lake_root) if new_abs else None)
                out["rows"].append(rows_left)
                out["removed"].append(removed)
                out["sha"].append(sha16)
            return pa.table({
                "old": out["old"],
                "new": pa.array(out["new"], type=pa.string()),
                "rows": pa.array(out["rows"], type=pa.int64()),
                "removed": pa.array(out["removed"], type=pa.int64()),
                "sha": out["sha"],
            })

        rows = rd.from_items([{"rel": r} for r in todo]).map_batches(
            scrub_batch, batch_format="pyarrow", batch_size=1
        ).take_all()
        for r in rows:
            if int(r["removed"]) > 0:
                mapping[r["old"]] = {
                    "new": r["new"], "rows": int(r["rows"]),
                    "removed": int(r["removed"]), "sha": r["sha"],
                }
                report["rows_removed"] += int(r["removed"])
                report["files_rewritten"] += 1

    # --- patch every manifest version in place ---------------------------
    if mapping:
        for v, m in manifests.items():
            changed: set[int] = set()
            for pid, ps in m.partitions.items():
                hit = False
                if ps.file and ps.file in mapping:
                    e = mapping[ps.file]
                    ps.file, ps.content_hash = e["new"], e["sha"]
                    if ps.rows >= 0:
                        ps.rows = e["rows"] if e["new"] else 0
                    if e["new"] is None:
                        ps.content_hash = ""
                    hit = True
                if ps.deltas:
                    new_deltas = []
                    for d in ps.deltas:
                        if d in mapping:
                            hit = True
                            if mapping[d]["new"]:
                                new_deltas.append(mapping[d]["new"])
                        else:
                            new_deltas.append(d)
                    ps.deltas = new_deltas
                if hit:
                    # ALL stats of a rewritten partition are stale: the
                    # dictionary stats name the subject (retained
                    # personal data) and the numeric [min,max] zone maps
                    # were computed over the pre-purge rows, so a later
                    # zone-map-served MIN/MAX (fast_minmax) could report
                    # the purged subject's extremes as live values.
                    # Unknown is valid conservative semantics — readers
                    # fold the partition instead of trusting the map.
                    ps.stats = {}
                    changed.add(pid)
            if changed:
                store._write_manifest(m, expect_version=v,
                                      changed_parts=changed, stage=True)
                report["versions_rewritten"] += 1

    # tags: re-point shas at the scrubbed manifest bytes.  ALWAYS runs
    # (not only when this run rewrote files): a crash between a prior
    # run's manifest patching and ITS tag refresh leaves tags
    # unresolvable, and only an unconditional recompute can repair them.
    refs = store.tags()
    dirty = False
    for name, entry in refs.items():
        sha_now = store._manifest_sha(int(entry["version"]))
        if sha_now != entry["sha"]:
            entry["sha"] = sha_now
            dirty = True
            report["tags_refreshed"] += 1
    if dirty:
        from ..state.manifest import _atomic_write

        _atomic_write(store._refs_path(), json.dumps(refs, sort_keys=True))

    # superseded manifest SHARDS: the in-place patch repointed indexes at
    # new content-addressed shard files, but the replaced shard JSONs
    # still carry the subject in their dictionary stats — retained
    # personal data at the metadata layer.  Referenced-set subtraction
    # over every current index (the expire_snapshots rule) removes them;
    # unconditional so a crashed prior run is repaired too.
    kept_shards: set[str] = set()
    for v in versions:
        idx = store._load_index(v)
        if idx:
            kept_shards.update(
                ref["file"] for ref in idx.get("shards", {}).values())
    for pth in _glob.glob(os.path.join(store.manifest_dir, "shards", "*.json")):
        rel = os.path.join("shards", os.path.basename(pth))
        if rel not in kept_shards:
            os.unlink(pth)
            report["shards_pruned"] += 1

    # --- dead-letter store + subject-bearing orphans (one distributed
    # pass; both are whole-file reads that must not serialize on the
    # driver when a full-repo purge walks every partition dir) ---------
    dl_files = sorted(_glob.glob(
        os.path.join(lake_root, "deadletter", "part=*", "*.parquet")))
    side_todo = (
        [{"f": f, "kind": "dl"} for f in dl_files]
        + [{"f": store.abspath(r), "kind": "orphan"} for r in orphan_candidates]
    )
    if side_todo:
        def side_scrub(batch: pa.Table) -> pa.Table:
            import pyarrow.parquet as _pq

            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            out = {"kind": [], "removed": []}
            for f, kind in zip(batch["f"].to_pylist(),
                               batch["kind"].to_pylist()):
                try:
                    t = _pq.read_table(f)
                except (FileNotFoundError, OSError):
                    continue
                if "repo" not in t.column_names:
                    continue
                mask = pc.equal(t["repo"], repo)
                if path is not None and "path" in t.column_names:
                    mask = pc.and_(mask, pc.equal(t["path"], path))
                mask = pc.fill_null(mask, False)
                removed = int(pc.sum(pc.cast(mask, pa.int64())).as_py() or 0)
                if removed == 0:
                    continue
                if kind == "dl":
                    kept = t.filter(pc.invert(mask))
                    if kept.num_rows:
                        base = os.path.basename(f)[: -len(".parquet")]
                        stem = _re.sub(r"-[0-9a-f]{16}$", "", base) + "-px"
                        _write_deterministic(kept, os.path.dirname(f), stem)
                os.unlink(f)  # orphans serve no snapshot; dl replaced above
                out["kind"].append(kind)
                out["removed"].append(removed)
            return pa.table({"kind": out["kind"],
                             "removed": pa.array(out["removed"],
                                                 type=pa.int64())})

        import ray.data as _rd

        for r in _rd.from_items(side_todo).map_batches(
                side_scrub, batch_format="pyarrow", batch_size=4).take_all():
            if r["kind"] == "dl":
                report["rows_removed"] += int(r["removed"])
                report["dead_letter_files"] += 1
            else:
                report["orphan_files_purged"] += 1

    # --- derived layouts holding copies.  Gated on subject data having
    # been removed NOW (fresh rows or recovered orphans) and ordered
    # BEFORE the old-file deletion below: every crash window then leaves
    # either the old files (re-run finds orphans -> re-drops) or nothing
    # left to drop — never a stale artifact with no repair signal. ------
    if report["rows_removed"] > 0 or report["orphan_files_purged"] > 0:
        for rel in ("_projections", "_zorder"):
            d = os.path.join(lake_root, rel)
            if os.path.isdir(d):
                _sh.rmtree(d)
                report["artifacts_dropped"].append(rel)
        idx = os.path.join(lake_root, "_index", "tokens.parquet")
        if os.path.exists(idx):
            os.unlink(idx)
            report["artifacts_dropped"].append("_index")

    # --- the actual erasure of replaced bytes: strictly LAST, so any
    # crash above leaves every snapshot readable and the re-run finishes
    for old in mapping:
        try:
            os.unlink(store.abspath(old))
            report["files_deleted"] += 1
        except FileNotFoundError:
            pass

    # --- branches: standalone hard-linked lakes ----------------------------
    if include_branches:
        from .branch import branch_root, list_branches

        for b in list_branches(lake_root):
            sub = purge_history(branch_root(lake_root, b["name"]), repo,
                                path=path, include_branches=True)
            report["branches"][b["name"]] = sub
            report["rows_removed"] += sub["rows_removed"]

    store.append_lineage({
        "op": "purge_history",
        **{k: report[k] for k in
           ("repo", "path", "rows_removed", "files_rewritten",
            "files_deleted", "versions_rewritten", "dead_letter_files",
            "orphan_files_purged", "shards_pruned", "tags_refreshed")},
    })
    return report


def lake_freshness(lake_root: str, source_max_epoch: int | None = None) -> dict:
    """Ingest-freshness / SLA report from manifest METADATA only (zero
    data reads — safe to poll from a monitor at any lake size).

    Reports the per-partition fence distribution (min/median/max
    ``applied_through_epoch``), the lag of every partition behind
    ``source_max_epoch`` when the caller knows the source head (a binlog
    tailer does), merge-on-read backlog (delta-chain depth histogram —
    the compaction SLA), dead-letter backlog (files + rows from parquet
    FOOTERS only), and the age of the current commit (lineage
    timestamp).  The observability face of the T7 metrics family: the
    reference prints per-table row counts at the end of a 14 h run;
    a tailing engine needs "how far behind is every partition" while
    the run is still going.
    """
    import glob as _glob

    store = LakeStore(lake_root)
    cur = store.current_version()
    if cur == 0:
        return {"version": 0, "partitions": 0, "fence_min": -1,
                "fence_median": -1, "fence_max": -1, "max_lag": None,
                "lagging_partitions": [], "delta_depth_histogram": {},
                "skew": None,
                "dead_letter_files": 0, "dead_letter_rows": 0,
                "commit_age_sec": None}
    m = store.load_manifest()
    fences = sorted(ps.applied_through_epoch for ps in m.partitions.values())
    depth_hist: dict = {}
    for ps in m.partitions.values():
        d = len(ps.deltas)
        depth_hist[d] = depth_hist.get(d, 0) + 1
    # partition skew from manifest row counts (MOR partitions report -1 =
    # unknown and are excluded): a hot partition here is the signal to
    # repartition_lake / salt before it becomes a straggler at scale
    known = sorted((ps.rows, ps.part_id) for ps in m.partitions.values()
                   if ps.rows >= 0)
    skew = None
    if known:
        rows_sorted = [r for r, _ in known]
        med = rows_sorted[len(rows_sorted) // 2]
        top = [{"part_id": pid, "rows": r} for r, pid in known[-3:][::-1]]
        skew = {"rows_median": med, "rows_max": rows_sorted[-1],
                "hot_partitions": top,
                "max_over_median": (round(rows_sorted[-1] / med, 2)
                                    if med > 0 else None)}
    lagging = []
    max_lag = None
    if source_max_epoch is not None:
        for ps in sorted(m.partitions.values(), key=lambda p: p.part_id):
            lag = int(source_max_epoch) - ps.applied_through_epoch
            if lag > 0:
                lagging.append({"part_id": ps.part_id, "lag_epochs": lag})
        max_lag = max((e["lag_epochs"] for e in lagging), default=0)

    dl_files = sorted(_glob.glob(
        os.path.join(lake_root, "deadletter", "part=*", "*.parquet")))
    dl_rows = 0
    if dl_files:
        import pyarrow.parquet as _pq

        dl_rows = sum(_pq.ParquetFile(f).metadata.num_rows for f in dl_files)

    commit_age = None
    lineage = store.read_lineage()
    for rec in reversed(lineage):
        if rec.get("manifest_version") == cur and "ts" in rec:
            commit_age = max(0.0, time.time() - float(rec["ts"]))
            break

    n = len(fences)
    return {
        "version": cur,
        "partitions": n,
        "fence_min": fences[0] if n else -1,
        "fence_median": fences[n // 2] if n else -1,
        "fence_max": fences[-1] if n else -1,
        "max_lag": max_lag,
        "lagging_partitions": lagging,
        "delta_depth_histogram": {str(k): v for k, v in sorted(depth_hist.items())},
        "skew": skew,
        "dead_letter_files": len(dl_files),
        "dead_letter_rows": dl_rows,
        "commit_age_sec": commit_age,
    }
