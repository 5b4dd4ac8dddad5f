"""Queryable lake METADATA tables — the Iceberg `table.files` /
`table.snapshots` / `table.partitions` analog: every question a
planner, monitor or operator asks about a lake answered from manifest
and lineage METADATA only (zero data-file reads), returned as normal
Ray Datasets so the caller can filter/join/aggregate them like any
relation.

Scale shape: each table is O(live files), O(retained versions) or
O(partitions) rows — manifest-sized, never data-sized; rows build on
the driver from the already-loaded manifest (the same metadata walk
`lake_freshness` does) and enter Ray via ``from_arrow``.  File sizes
come from os.stat, the only filesystem touch (cheap: one stat per live
file; pass ``stat_sizes=False`` to skip even that).

Reference parity: the reference engine answers these questions by
querying its warehouse's information_schema and row counts after load
(`SURVEY.md` §2 T7 stats/metrics accumulators); here the manifest IS
that catalog.
"""

from __future__ import annotations

import glob
import os

import pyarrow as pa

import ray.data

from ..state.manifest import LakeStore


def _versions(store: LakeStore) -> list[int]:
    return sorted(
        int(os.path.basename(p)[len("manifest-"):-len(".json")])
        for p in glob.glob(os.path.join(store.manifest_dir, "manifest-*.json"))
    )


def lake_files(lake_root: str, version: int | None = None,
               stat_sizes: bool = True) -> "ray.data.Dataset":
    """One row per live data file of a snapshot: (part_id, kind
    base|delta, delta_pos, path, rows, applied_through_epoch,
    content_hash, schema_version, bytes).  ``rows`` is the partition's
    live-row count on the base row (-1 = unknown under live MOR
    deltas, matching the manifest contract) and null on delta rows."""
    store = LakeStore(lake_root)
    m = store.load_manifest(version)
    cols = {k: [] for k in ("part_id", "kind", "delta_pos", "path", "rows",
                            "applied_through_epoch", "content_hash",
                            "schema_version", "bytes")}
    for ps in sorted(m.partitions.values(), key=lambda q: q.part_id):
        entries = []
        if ps.file:
            entries.append(("base", 0, ps.file, ps.rows))
        entries += [("delta", i + 1, f, None)
                    for i, f in enumerate(ps.deltas)]
        for kind, pos, rel, rows in entries:
            cols["part_id"].append(ps.part_id)
            cols["kind"].append(kind)
            cols["delta_pos"].append(pos)
            cols["path"].append(rel)
            cols["rows"].append(rows)
            cols["applied_through_epoch"].append(ps.applied_through_epoch)
            cols["content_hash"].append(ps.content_hash if kind == "base"
                                        else None)
            cols["schema_version"].append(ps.schema_version)
            cols["bytes"].append(
                os.stat(store.abspath(rel)).st_size if stat_sizes else None)
    return ray.data.from_arrow(pa.table({
        "part_id": pa.array(cols["part_id"], type=pa.int64()),
        "kind": pa.array(cols["kind"], type=pa.string()),
        "delta_pos": pa.array(cols["delta_pos"], type=pa.int64()),
        "path": pa.array(cols["path"], type=pa.string()),
        "rows": pa.array(cols["rows"], type=pa.int64()),
        "applied_through_epoch": pa.array(
            cols["applied_through_epoch"], type=pa.int64()),
        "content_hash": pa.array(cols["content_hash"], type=pa.string()),
        "schema_version": pa.array(cols["schema_version"], type=pa.int64()),
        "bytes": pa.array(cols["bytes"], type=pa.int64()),
    }))


def lake_partitions(lake_root: str,
                    version: int | None = None) -> "ray.data.Dataset":
    """One row per partition of a snapshot: (part_id, rows, n_files,
    delta_depth, applied_through_epoch, schema_version, has_base) —
    the skew/backlog view `lake_freshness` aggregates, exposed as a
    relation.  Only partitions that have ever received state appear
    (the manifest is sparse); `lake_snapshots.n_partitions` carries the
    configured partition count."""
    store = LakeStore(lake_root)
    m = store.load_manifest(version)
    rows = {k: [] for k in ("part_id", "rows", "n_files", "delta_depth",
                            "applied_through_epoch", "schema_version",
                            "has_base")}
    for ps in sorted(m.partitions.values(), key=lambda q: q.part_id):
        rows["part_id"].append(ps.part_id)
        rows["rows"].append(ps.rows)
        rows["n_files"].append(len(ps.all_files()))
        rows["delta_depth"].append(len(ps.deltas))
        rows["applied_through_epoch"].append(ps.applied_through_epoch)
        rows["schema_version"].append(ps.schema_version)
        rows["has_base"].append(ps.file is not None)
    return ray.data.from_arrow(pa.table({
        "part_id": pa.array(rows["part_id"], type=pa.int64()),
        "rows": pa.array(rows["rows"], type=pa.int64()),
        "n_files": pa.array(rows["n_files"], type=pa.int64()),
        "delta_depth": pa.array(rows["delta_depth"], type=pa.int64()),
        "applied_through_epoch": pa.array(
            rows["applied_through_epoch"], type=pa.int64()),
        "schema_version": pa.array(rows["schema_version"], type=pa.int64()),
        "has_base": pa.array(rows["has_base"], type=pa.bool_()),
    }))


def lake_snapshots(lake_root: str) -> "ray.data.Dataset":
    """One row per RETAINED manifest version: (version, is_current,
    tag, n_partitions, live_files, total_rows, max_fence,
    schema_version, committed_ts).  total_rows is null when any
    partition's count is unknown (live MOR deltas).  committed_ts
    joins from the lineage log (first record naming the version; null
    for versions committed without lineage, e.g. staged WAP)."""
    store = LakeStore(lake_root)
    current = store.current_version()
    tags = {int(v["version"]): name for name, v in store.tags().items()}
    lineage_ts: dict[int, float] = {}
    for rec in store.read_lineage():
        v = rec.get("manifest_version")
        if isinstance(v, int) and v not in lineage_ts and "ts" in rec:
            lineage_ts[v] = float(rec["ts"])
    cols = {k: [] for k in ("version", "is_current", "tag", "n_partitions",
                            "live_files", "total_rows", "max_fence",
                            "schema_version", "committed_ts")}
    for v in _versions(store):
        m = store.load_manifest(v)
        parts = list(m.partitions.values())
        rows = [ps.rows for ps in parts]
        cols["version"].append(v)
        cols["is_current"].append(v == current)
        cols["tag"].append(tags.get(v))
        cols["n_partitions"].append(m.num_partitions)
        cols["live_files"].append(len(m.live_files()))
        cols["total_rows"].append(
            None if any(r < 0 for r in rows) else int(sum(rows)))
        cols["max_fence"].append(
            max((ps.applied_through_epoch for ps in parts), default=-1))
        cols["schema_version"].append(
            max((ps.schema_version for ps in parts), default=0))
        cols["committed_ts"].append(lineage_ts.get(v))
    return ray.data.from_arrow(pa.table({
        "version": pa.array(cols["version"], type=pa.int64()),
        "is_current": pa.array(cols["is_current"], type=pa.bool_()),
        "tag": pa.array(cols["tag"], type=pa.string()),
        "n_partitions": pa.array(cols["n_partitions"], type=pa.int64()),
        "live_files": pa.array(cols["live_files"], type=pa.int64()),
        "total_rows": pa.array(cols["total_rows"], type=pa.int64()),
        "max_fence": pa.array(cols["max_fence"], type=pa.int64()),
        "schema_version": pa.array(cols["schema_version"], type=pa.int64()),
        "committed_ts": pa.array(cols["committed_ts"], type=pa.float64()),
    }))


def fast_count(lake_root: str, version: int | None = None) -> int:
    """Exact ``COUNT(*)`` of the live relation, served from manifest
    metadata wherever possible — the Iceberg/Delta metadata-count
    contract: a delta-free partition's post-merge row count is recorded
    in the manifest, so it contributes with ZERO data reads; only
    merge-on-read partitions whose count is unknown (``rows == -1``,
    live delta chains) are folded, one Ray task per such partition.

    Cost: O(partitions) metadata walk + data reads bounded by the MOR
    backlog (zero on a compacted lake at ANY size); the driver holds
    one int per folded partition, never rows.  Equals
    ``read_lake(...).count()`` by construction — oracle-pinned by the
    ``cdc_fast_count`` catalog entry."""
    store = LakeStore(lake_root)
    manifest = store.load_manifest(version)
    known = 0
    todo = []
    for ps in manifest.partitions.values():
        if ps.rows >= 0:
            known += ps.rows
        else:
            todo.append({"part_id": ps.part_id, "file": ps.file,
                         "deltas": list(ps.deltas)})
    if not todo:
        return known
    registry = store.load_registry()
    reg_json = registry.to_json()
    # Promote folded partitions to the REGISTRY's latest version, the
    # same target read_lake uses — a column added by schema evolution
    # after the last write must surface its backfill default here too.
    schema_version = registry.latest_version

    def fold_count(batch: pa.Table) -> pa.Table:
        from ..schema import SchemaRegistry
        from .ingest import load_partition_live

        reg = SchemaRegistry.from_json(reg_json)
        counts = []
        # batch_size=1 below makes this loop one MOR partition per task
        # (the row IS the unit of work — a partition merge, not a row);
        # raising the batch size would serialize partition merges inside
        # a task, so keep it at 1
        for i in range(batch.num_rows):
            live = load_partition_live(
                lake_root, batch["file"][i].as_py(),
                list(batch["deltas"][i].as_py() or []), reg, schema_version)
            counts.append(live.num_rows)
        return pa.table({"n": pa.array(counts, type=pa.int64())})

    folded = ray.data.from_arrow(pa.table({
        "part_id": pa.array([t["part_id"] for t in todo], type=pa.int64()),
        "file": pa.array([t["file"] for t in todo], type=pa.string()),
        "deltas": pa.array([t["deltas"] for t in todo],
                           type=pa.list_(pa.string())),
    })).map_batches(fold_count, batch_format="pyarrow", batch_size=1)
    return known + sum(r["n"] for r in folded.take_all())


def fast_minmax(lake_root: str, column: str,
                version: int | None = None) -> tuple:
    """Exact ``(MIN(column), MAX(column))`` of the live relation served
    from manifest zone maps wherever they are exact — the companion of
    :func:`fast_count` (Iceberg metadata-stats contract): a DELTA-FREE
    partition's ``[min, max]`` zone map was computed from exactly its
    live rows at write time, so it contributes with zero data reads.
    Partitions with live MOR deltas (widened, possibly-stale stats) or
    with no recorded stats for the column (all-null, content-like, or
    pre-stats manifests) are folded, one Ray task each — conservative,
    never wrong.  Returns ``(None, None)`` for an empty or all-null
    column."""
    store = LakeStore(lake_root)
    manifest = store.load_manifest(version)
    lo = hi = None
    todo = []
    for ps in manifest.partitions.values():
        zone = ps.stats.get(column) if not ps.deltas else None
        if isinstance(zone, list) and len(zone) == 2:
            zlo, zhi = zone
            lo = zlo if lo is None else min(lo, zlo)
            hi = zhi if hi is None else max(hi, zhi)
        elif ps.file or ps.deltas:
            todo.append({"part_id": ps.part_id, "file": ps.file,
                         "deltas": list(ps.deltas)})
    if not todo:
        return lo, hi
    registry = store.load_registry()
    reg_json = registry.to_json()
    # registry.latest_version, matching read_lake (see fast_count).
    schema_version = registry.latest_version

    def fold_minmax(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..schema import SchemaRegistry
        from .ingest import load_partition_live

        reg = SchemaRegistry.from_json(reg_json)
        los, his = [], []
        # one MOR partition per task (batch_size=1) — see fold_count
        for i in range(batch.num_rows):
            live = load_partition_live(
                lake_root, batch["file"][i].as_py(),
                list(batch["deltas"][i].as_py() or []), reg, schema_version)
            if column not in live.column_names or live.num_rows == 0:
                continue
            mm = pc.min_max(live[column])
            if mm["min"].as_py() is not None:
                los.append(mm["min"].as_py())
                his.append(mm["max"].as_py())
        return pa.table({"lo": pa.array(los), "hi": pa.array(his)})

    folded = ray.data.from_arrow(pa.table({
        "part_id": pa.array([t["part_id"] for t in todo], type=pa.int64()),
        "file": pa.array([t["file"] for t in todo], type=pa.string()),
        "deltas": pa.array([t["deltas"] for t in todo],
                           type=pa.list_(pa.string())),
    })).map_batches(fold_minmax, batch_format="pyarrow", batch_size=1)
    for r in folded.take_all():
        lo = r["lo"] if lo is None else min(lo, r["lo"])
        hi = r["hi"] if hi is None else max(hi, r["hi"])
    return lo, hi
