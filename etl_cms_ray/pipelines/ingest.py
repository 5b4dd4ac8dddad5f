"""The flagship pipeline: change-event stream -> partitioned Parquet lake.

    events (Dataset)
      -> normalize_batch       map_batches tasks, zero-copy Arrow
                                (sha256, size, part_id, validity,
                                PRE-SHUFFLE epoch fence)
      -> _combiner              per-batch LWW pre-reduce (collapses hot-key
                                duplicates BEFORE the shuffle; LWW is
                                associative — SURVEY.md §7.4 #4)
      -> groupby(part_id)       THE one hash shuffle
      -> apply_group            per-partition merge vs prior lake state
                                (cow: base rewrite; mor: delta append),
                                content-addressed deterministic writes
      -> manifest publish       atomic, epoch-fenced, exactly-once

All hot-path stages are task-based (see the inline rationale); the
Normalizer/MergeApplier classes remain for actor-pool deployments with
heavy per-actor state.  Reference analog of the whole flow: the
per-beneficiary main loop + append sinks + control-file resume
(SURVEY.md §3).
"""

from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import EngineConfig
from ..schema import SchemaChange, SchemaRegistry
from ..stages.applier import apply_group
from ..stages.lww import lww_reduce
from ..stages.normalize import fence_vector, normalize_batch
from ..state.manifest import LakeStore, Manifest, PartitionState


@dataclass
class IngestResult:
    manifest_version: int
    schema_version: int
    events_in: int
    events_applied: int
    dead_rows: int
    lake_rows: int
    partitions_touched: int
    #: {reason: count} over this commit's dead-letter rows (built-in
    #: well-formedness checks + declared expectations, comma-joined on
    #: multi-violation rows)
    dead_reasons: dict = dataclasses.field(default_factory=dict)


def _combiner(batch: pa.Table) -> pa.Table:
    """Partial LWW per batch, valid rows only; dead-letter rows pass through."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    valid = batch.filter(batch["valid"])
    dead = batch.filter(pc.invert(batch["valid"]))
    reduced = lww_reduce(valid)
    if dead.num_rows == 0:
        return reduced
    return pa.concat_tables([reduced, dead])


def _salted_prereduce(ds: "ray.data.Dataset", salt_factor: int) -> "ray.data.Dataset":
    """Explicit hot-key salting: reduce per (part_id, salt) before the
    main partition shuffle.  salt = seq % factor spreads each key's
    versions over ``factor`` sub-groups; per-sub-group LWW keeps at most
    one row per (key, salt), so the final reducer for a hot partition
    receives <= factor rows per key instead of every version.  Dead-letter
    rows (valid == false) bypass the reduce untouched."""

    def add_salt(t: pa.Table) -> pa.Table:
        import numpy as np

        seq = t["seq"].to_numpy(zero_copy_only=False)
        salt = (seq % salt_factor).astype(np.int32)
        return t.append_column("salt", pa.array(salt))

    def reduce_group(g: pa.Table) -> pa.Table:
        valid = g.filter(g["valid"])
        dead = g.filter(pc.invert(g["valid"]))
        out = lww_reduce(valid)
        if dead.num_rows:
            out = pa.concat_tables([out, dead])
        return out

    salted = ds.map_batches(add_salt, batch_format="pyarrow", zero_copy_batch=True)
    reduced = salted.groupby(["part_id", "salt"]).map_groups(
        reduce_group, batch_format="pyarrow"
    )
    return reduced.drop_columns(["salt"])


def ingest(
    events: "ray.data.Dataset",
    cfg: EngineConfig,
    schema_changes: list[SchemaChange] | None = None,
    count_input: bool = True,
    stage: bool = False,
    expectations=None,
) -> IngestResult:
    """Apply one batch of change events to the lake, exactly once.

    Delivery contract: epochs are ingested in NON-DECREASING order (the
    binlog order — what the tail driver produces and the fencing design
    assumes); within that, at-least-once delivery at whole-epoch
    granularity is tolerated — replays are fenced no-ops, including the
    delete-resurrection hazard.  ``schema_changes`` are merged into the
    lake's persistent schema registry before application (the CDM
    v5.0->v5.2 DDL-migration analog).

    ``stage=True`` = the write step of write-audit-publish: all data and
    manifest files land, but CURRENT is not moved — readers (and the
    next ingest's fences) keep seeing the prior snapshot until
    ``LakeStore.commit_staged(result.manifest_version)``; validate the
    staged snapshot first with ``audit_lake(..., version=...)`` and
    discard a failed one with ``abort_staged``.
    """
    import time as _time

    _t0 = _time.perf_counter()
    store = LakeStore(cfg.lake_root)
    manifest = store.load_manifest()
    if manifest.partitions and manifest.num_partitions != cfg.num_partitions:
        # the partition count is lake metadata: keys hash to partitions and
        # fences are per-partition, so a silent mismatch mis-fences every
        # key.  Changing the bucket count is repartition_lake's job.
        raise ValueError(
            f"lake {cfg.lake_root} has num_partitions="
            f"{manifest.num_partitions}, config says {cfg.num_partitions}; "
            "use repartition_lake to change the bucketing"
        )
    from ..functions.hashing import PARTITIONER_ID

    if manifest.partitions and manifest.partitioner != PARTITIONER_ID:
        # the partitioner is engine ABI: fences and prior state are
        # per-partition, so applying events through a different hash
        # silently duplicates keys and breaks exactly-once replay
        raise ValueError(
            f"lake {cfg.lake_root} was written with partitioner="
            f"{manifest.partitioner!r}; this engine uses {PARTITIONER_ID!r} — "
            "rebuild via repartition_lake before ingesting"
        )
    registry = store.load_registry()
    if schema_changes:
        known = {(c.epoch, c.change, c.column) for c in registry.changes}
        for ch in schema_changes:
            if (ch.epoch, ch.change, ch.column) not in known:
                registry.changes.append(ch)
        registry = SchemaRegistry(changes=registry.changes)  # re-sort
        store.save_registry(registry)
    target_version = registry.latest_version

    fences = {
        pid: (ps.applied_through_epoch, ps.file) for pid, ps in manifest.partitions.items()
    }

    # raw input size: metadata-cheap for parquet sources and materialized
    # tables, but a full extra pass for derived datasets — callers on the
    # hot path disable it (the pipeline's own counters see post-combiner
    # rows only)
    events_in = events.count() if count_input else -1

    # task-based stages throughout the hot path: Ray task workers are
    # pre-started and REUSED across pipelines, while actor pools fork +
    # import on every ingest (~2-3 s fixed cost that destroys scaling on
    # incremental commits).  Stage state here is tiny, so it ships in
    # fn_kwargs.
    ds = events.map_batches(
        normalize_batch,
        fn_kwargs={
            "cfg": cfg,
            "fence_vec": fence_vector(
                cfg.num_partitions, {pid: f for pid, (f, _) in fences.items()}
            ),
            "expectations": tuple(expectations or ()),
        },
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
    # NOTE: do NOT force a large batch_size here to "help" the shuffle —
    # the combiner does real per-batch work, and a 65536-row batch cuts
    # the task count below the CPU count at bench scale (measured: 7x
    # slower ingest).  Block coalescing pays only on trivial pre-shuffle
    # stages (see stages/join.py).
    ds = ds.map_batches(_combiner, batch_format="pyarrow", zero_copy_batch=True)
    if cfg.salt_factor > 1:
        ds = _salted_prereduce(ds, cfg.salt_factor)
    results = ds.groupby("part_id").map_groups(
        apply_group,
        fn_kwargs={
            "lake_root": cfg.lake_root,
            "fences": fences,
            "registry_json": registry.to_json(),
            "target_schema_version": target_version,
            "prior_meta": {
                pid: (ps.rows, ps.content_hash, ps.schema_version,
                      list(ps.deltas), dict(ps.stats))
                for pid, ps in manifest.partitions.items()
            },
            "commit_mode": cfg.commit_mode,
            "max_deltas": cfg.max_deltas,
        },
        batch_format="pyarrow",
    )
    rows = results.take_all()  # one small row per touched partition

    new_manifest = Manifest(
        version=manifest.version + 1,
        num_partitions=cfg.num_partitions,
        partitions=dict(manifest.partitions),
    )
    applied = dead = shuffled = 0
    dead_reasons: dict = {}
    for r in rows:
        pid = int(r["part_id"])
        new_manifest.partitions[pid] = PartitionState(
            part_id=pid,
            file=r["file"],
            rows=int(r["rows"]),
            applied_through_epoch=int(r["applied_through_epoch"]),
            content_hash=r["content_hash"],
            schema_version=int(r["schema_version"]),
            deltas=list(r["delta_files"] or []),
            stats=json.loads(r["stats"]) if r.get("stats") else {},
        )
        shuffled += int(r["events_shuffled"])
        applied += int(r["events_applied"])
        dead += int(r["dead_rows"])
        for reason, cnt in json.loads(r["dead_reasons"] or "{}").items():
            dead_reasons[reason] = dead_reasons.get(reason, 0) + int(cnt)
    known = [p.rows for p in new_manifest.partitions.values() if p.rows >= 0]
    lake_rows = sum(known) if len(known) == len(new_manifest.partitions) else -1
    new_manifest.metrics = {
        "events_in": events_in,
        "events_shuffled": shuffled,
        "events_applied": applied,
        "dead_rows": dead,
        "dead_reasons": dead_reasons,
        "lake_rows": lake_rows,
        "schema_version": target_version,
        "commit_mode": cfg.commit_mode,
        "wall_s": round(_time.perf_counter() - _t0, 3),
    }
    store.publish(
        new_manifest,
        expect_version=manifest.version,
        changed_parts={int(r["part_id"]) for r in rows},
        stage=stage,
    )
    store.append_lineage(
        {
            **({"op": "wap_stage"} if stage else {}),
            "manifest_version": new_manifest.version,
            "partitions_touched": len(rows),
            **new_manifest.metrics,
        }
    )
    return IngestResult(
        manifest_version=new_manifest.version,
        schema_version=target_version,
        events_in=events_in,
        events_applied=applied,
        dead_rows=dead,
        lake_rows=lake_rows,
        partitions_touched=len(rows),
        dead_reasons=dead_reasons,
    )


def ingest_with_retry(
    events: "ray.data.Dataset",
    cfg: EngineConfig,
    retries: int = 2,
    **kwargs,
) -> IngestResult:
    """``ingest`` with optimistic-concurrency retry.

    The manifest publish is a true compare-and-swap: a fast CURRENT
    version check plus an O_EXCL per-version claim file, so of two
    committers overlapping in the check-then-act window exactly one
    lands and the other gets ``manifest conflict`` (see
    ``LakeStore.publish``).  Retrying by re-running the WHOLE
    ingest is safe and exact: each attempt reloads the fresh manifest,
    so fences are recomputed against the racing commit's state (already-
    applied epochs fence out, new ones apply); data files are
    content-addressed, so a redo rewrites identical bytes under
    identical names; the failed attempt's unreferenced files are
    reclaimed by ``expire_snapshots``.  Single-writer remains the normal
    discipline — this makes the occasional race a retry, not a corruption.
    """
    last: Exception | None = None
    for _attempt in range(retries + 1):
        try:
            return ingest(events, cfg, **kwargs)
        except RuntimeError as e:
            if "manifest conflict" not in str(e):
                raise
            last = e
    assert last is not None
    raise last


def load_partition_live(
    lake_root: str, file: str | None, deltas: list, registry: SchemaRegistry,
    version: int, key_filters: list | None = None,
) -> pa.Table:
    """LIVE rows of one partition: LWW(base ∪ deltas), tombstones dropped,
    promoted to the target schema version, key-sorted.

    ``key_filters`` (parquet DNF, e.g. ``[[("repo","=",r),("path","=",p)],
    ...]``) pushes row-group/page skipping into every file read.  ONLY
    predicates on the LWW KEY columns are safe here: a key's whole
    version chain satisfies or fails a key predicate together, so the
    merge sees either all of a key's rows or none — a VALUE predicate
    pushed pre-merge could drop the newest version and resurrect an
    older matching one (see range_scan for the delta-free fast path).
    Files are written key-sorted, so key predicates align with row-group
    min/max stats."""
    import pyarrow.parquet as pq

    from ..stages.lww import drop_tombstones, lww_reduce

    schema = registry.schema_for(version)
    tables = []
    if file:
        base = registry.evolve_table(
            pq.read_table(os.path.join(lake_root, file), filters=key_filters),
            version,
        )
        tables.append(base.append_column(
            "op", pa.array(["insert"] * base.num_rows, type=pa.string())
        ))
    for rel in deltas:
        d = pq.read_table(os.path.join(lake_root, rel), filters=key_filters)
        op = d["op"]
        tables.append(registry.evolve_table(d, version).append_column("op", op))
    if not tables:
        return pa.table({f.name: pa.array([], type=f.type) for f in schema})
    merged = lww_reduce(pa.concat_tables(tables, promote_options="default"))
    live = drop_tombstones(merged).drop_columns(["op"])
    live = live.select(schema.names).cast(schema)
    return live.take(
        pc.sort_indices(live, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    )


def read_dead_letter(lake_root: str) -> "ray.data.Dataset":
    """Every dead-letter row the lake has accumulated, with the original
    event columns plus ``dead_reason`` (comma-joined failed checks —
    built-in well-formedness and declared ``Expectation``s).  Streams the
    ``deadletter/part=*/`` parquet files; empty lake -> empty Dataset
    with just the reason column (the event schema is stream-defined)."""
    import glob as _glob

    from ..functions.rayutil import read_parquet_clean

    files = sorted(_glob.glob(
        os.path.join(lake_root, "deadletter", "part=*", "*.parquet")
    ))
    if not files:
        return ray.data.from_arrow(
            pa.table({"dead_reason": pa.array([], type=pa.string())})
        )
    return dead_letter_union(files)


def dead_letter_union(files: list[str]) -> "ray.data.Dataset":
    """Dead-letter files accumulate across ingests and schema evolutions,
    so they do NOT share one physical schema — reading them through a
    single pinned-schema scan would silently project evolved payload
    columns away (and a later requeue would overwrite real values with
    backfill defaults).  Group the files by footer schema (metadata-only
    reads), scan each group pinned to its own schema, promote every
    batch to the union schema (missing columns -> typed nulls), union
    the streams."""
    import pyarrow.parquet as _pq

    from ..functions.rayutil import read_parquet_clean

    groups: dict[str, list[str]] = {}
    target: dict[str, pa.DataType] = {}
    names: list[str] = []
    for f in files:
        s = _pq.read_schema(f)
        key = ";".join(f"{fld.name}:{fld.type}" for fld in s)
        groups.setdefault(key, []).append(f)
        for fld in s:
            if fld.name not in target:
                target[fld.name] = fld.type
                names.append(fld.name)

    def promote(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        cols = [
            t[n].cast(target[n]) if n in t.column_names
            else pa.nulls(t.num_rows, type=target[n])
            for n in names
        ]
        return pa.table(cols, names=names)

    parts = [
        read_parquet_clean(fs).map_batches(promote, batch_format="pyarrow")
        for fs in groups.values()
    ]
    out = parts[0]
    for d in parts[1:]:
        out = out.union(d)
    return out


def read_lake(lake_root: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """Live lake state as a Dataset (manifested files only), promoted to the
    latest schema version on read."""
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    files = [store.abspath(f) for f in manifest.live_files()]
    if not files:
        sch = registry.schema_for(latest)
        empty = pa.table({f.name: pa.array([], type=f.type) for f in sch})
        return ray.data.from_arrow(empty)
    # partitioning=None: the data/part=NNNNN layout must not hive-infer a
    # spurious 'part' column into the lake schema.  (Ray 2.49 bug: passing
    # partitioning=None together with columns= raises UnboundLocalError in
    # its column splitter — with an explicit column list the hive column is
    # already excluded, so only disable inference for full-schema reads.)
    if manifest.has_deltas():
        # merge-on-read: one task per partition performs the LWW merge of
        # base + deltas, then optional column pruning
        parts = [
            {"part_id": ps.part_id, "file": ps.file, "deltas": list(ps.deltas)}
            for ps in manifest.partitions.values()
            if ps.file or ps.deltas
        ]
        reg_json = registry.to_json()

        def merge_part(batch: pa.Table, cols=tuple(columns) if columns else None):
            reg = SchemaRegistry.from_json(reg_json)
            out = []
            for f0, ds_ in zip(batch["file"].to_pylist(), batch["deltas"].to_pylist()):
                t = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
                out.append(t.select(list(cols)) if cols else t)
            return pa.concat_tables(out)

        return ray.data.from_items(parts).map_batches(
            merge_part, batch_format="pyarrow", batch_size=1
        )

    versions = [ps.schema_version for ps in manifest.partitions.values() if ps.file]
    needs_promote = any(v != latest for v in versions)
    if columns is None:
        ds = ray.data.read_parquet(files, partitioning=None)
        if needs_promote:
            ds = ds.map_batches(
                lambda t, reg=registry.to_json(), v=latest: SchemaRegistry.from_json(
                    reg
                ).evolve_table(t, v),
                batch_format="pyarrow",
            )
        return ds

    # pruned read over a mixed-schema lake
    oldest = registry.schema_for(min(versions, default=latest))
    target = registry.schema_for(latest)
    requested = [c for c in columns if c in target.names]

    def _cast_widened(t: pa.Table, req=tuple(requested), reg=registry.to_json(), v=latest):
        r = SchemaRegistry.from_json(reg)
        tgt = r.schema_for(v)
        cols, names = [], []
        for name in req:
            f0 = tgt.field(name)
            names.append(name)
            col = t.column(name)
            cols.append(col.cast(f0.type) if col.type != f0.type else col)
        return pa.table(cols, names=names)

    if not needs_promote or all(c in oldest.names for c in requested):
        # every live file has every requested column: plain pushdown read,
        # plus widen casts when versions mix
        ds = ray.data.read_parquet(files, columns=requested)
        if needs_promote and any(
            oldest.field(c).type != target.field(c).type for c in requested
        ):
            ds = ds.map_batches(_cast_widened, batch_format="pyarrow")
        return ds

    # some requested columns were ADDED after some files were written:
    # each file must be read with ITS OWN available subset (reading the
    # union would either crash or silently default-fill real values), so
    # the read becomes one task per partition file
    reg_json = registry.to_json()
    parts = [
        {"file": store.abspath(ps.file), "schema_version": ps.schema_version}
        for ps in manifest.partitions.values()
        if ps.file
    ]

    def read_promote(batch: pa.Table, req=tuple(requested)):
        import pyarrow.parquet as pq

        r = SchemaRegistry.from_json(reg_json)
        tgt = r.schema_for(latest)
        dv = r.defaults_for(latest)
        out = []
        for path, ver in zip(batch["file"].to_pylist(), batch["schema_version"].to_pylist()):
            # latest-name -> physical name in a file written at `ver`
            # (None = column didn't exist yet); renames resolve here
            phys = r.physical_names(ver, latest)
            src = {c: phys.get(c) for c in req}
            t = pq.read_table(
                path, columns=[s for s in src.values() if s is not None])
            cols, names = [], []
            for name in req:
                f0 = tgt.field(name)
                names.append(name)
                s = src[name]
                if s is not None and s in t.column_names:
                    col = t.column(s)
                    if col.type != f0.type:
                        col = col.cast(f0.type)
                    if dv.get(name) is not None and col.null_count > 0:
                        col = pc.fill_null(col, pa.scalar(dv[name], type=f0.type))
                    cols.append(col)
                else:
                    cols.append(pa.array([dv.get(name)] * t.num_rows, type=f0.type))
            out.append(pa.table(cols, names=names))
        return pa.concat_tables(out)

    return ray.data.from_items(parts).map_batches(
        read_promote, batch_format="pyarrow", batch_size=1
    )


def lookup_plan(manifest: Manifest, keys: list) -> list[dict]:
    """Partition pruning plan for a point lookup: each (repo, path) key
    hashes to exactly ONE partition under the ingest shuffle's fnv1a64
    partitioner, so a K-key lookup opens <= K of the lake's P partitions
    — O(keys), not O(lake).  (The reference has no random access at all:
    any lookup is a full forward pass, ``FileControl.py:181-236``.)

    Returns one dict per HIT partition (empty partitions are dropped
    here, so a miss on an empty partition costs zero reads)."""
    from ..functions.hashing import part_id_one

    by_part: dict[int, list] = {}
    for repo, path in keys:
        pid = part_id_one(repo, path, manifest.num_partitions)
        by_part.setdefault(pid, []).append((repo, path))
    plan = []
    for pid in sorted(by_part):
        ps = manifest.part(pid)
        if not ps.file and not ps.deltas:
            continue
        plan.append(
            {
                "part_id": pid,
                "file": ps.file,
                "deltas": list(ps.deltas),
                "repos": [k[0] for k in by_part[pid]],
                "paths": [k[1] for k in by_part[pid]],
            }
        )
    return plan


def point_lookup(
    lake_root: str, keys: list, columns: list[str] | None = None,
    version: int | None = None,
) -> pa.Table:
    """Random access into the lake: live rows for the given (repo, path)
    keys, reading ONLY the partitions those keys hash to (hash-partition
    data skipping — see ``lookup_plan``).  Deleted / absent keys simply
    return no row (LWW tombstones are dropped by the partition merge).

    One Ray task per hit partition performs the same MOR-aware
    ``load_partition_live`` merge as ``read_lake`` and filters to its
    keys, so the result is bounded by ``len(keys)`` rows and is safe to
    materialize as one Arrow table.  Sized for interactive key counts
    (up to ~1e5); a bulk keyed read should use a join against
    ``read_lake`` instead."""
    import ray

    from ..functions.hashing import key_array

    store = LakeStore(lake_root)
    # version pins the SNAPSHOT (manifest) being probed; promotion stays
    # at the latest registry schema, so engine/audit columns are stable
    # across versions (key_history depends on this)
    manifest = store.load_manifest(version)
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    out_names = [c for c in (columns or schema.names)]
    plan = lookup_plan(manifest, keys)
    empty = pa.table(
        {n: pa.array([], type=schema.field(n).type) for n in out_names}
    )
    if not plan:
        return empty
    reg_json = registry.to_json()

    def fetch(batch: pa.Table) -> pa.Table:
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_, repos, paths in zip(
            batch["file"].to_pylist(),
            batch["deltas"].to_pylist(),
            batch["repos"].to_pylist(),
            batch["paths"].to_pylist(),
        ):
            # key-predicate pushdown: parquet row groups whose (repo,
            # path) stats exclude every probe key are never decoded
            kf = [[("repo", "=", r), ("path", "=", p)]
                  for r, p in zip(repos, paths)]
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg,
                                    latest, key_filters=kf)
            wanted = [f"{r}\x00{p}" for r, p in zip(repos, paths)]
            mask = pc.is_in(key_array(t["repo"], t["path"]), value_set=pa.array(wanted))
            out.append(t.filter(mask).select(out_names))
        return pa.concat_tables(out)

    ds = ray.data.from_items(plan).map_batches(
        fetch, batch_format="pyarrow", batch_size=1
    )
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return empty
    t = pa.concat_tables(tables).cast(empty.schema)
    sort_keys = [(k, "ascending") for k in ("repo", "path") if k in out_names]
    return t.take(pc.sort_indices(t, sort_keys=sort_keys)) if sort_keys else t


def range_plan(manifest: Manifest, column: str, lo, hi) -> list[dict]:
    """Zone-map pruning plan for a value-range scan: keep only partitions
    whose manifest ``stats[column]`` interval intersects ``[lo, hi]``.

    CONSERVATIVE by construction: a partition with no zone map for the
    column (legacy manifest, maintenance rewrite, all-null column) is
    always kept — pruning may only drop partitions PROVEN disjoint, so
    the scan result never depends on stats freshness (stats widened by
    MOR tombstones just prune less).  Iceberg/Delta file-skipping shape;
    the reference always scans forward (``FileControl.py:181-236``)."""
    plan = []
    for pid in sorted(manifest.partitions):
        ps = manifest.partitions[pid]
        if not ps.file and not ps.deltas:
            continue
        s = (ps.stats or {}).get(column)
        if isinstance(s, list) and (s[1] < lo or s[0] > hi):
            continue  # provably disjoint (dict stats: eq_plan's job)
        # push=True: recorded range stats prove the column exists in the
        # file with a filterable type, so the scan may push the predicate
        # into the parquet read (delta-free partitions only — see fetch)
        plan.append({"part_id": pid, "file": ps.file, "deltas": list(ps.deltas),
                     "push": isinstance(s, list)})
    return plan


def eq_plan(manifest: Manifest, column: str, value) -> list[dict]:
    """Equality-pruning plan: keep only partitions whose stats cannot
    rule out ``column == value`` — dictionary stats ({"in": [...]}) by
    set membership, range stats by interval membership.  Same
    conservative contract as ``range_plan``: missing/unknown stats keep
    the partition."""
    plan = []
    for pid in sorted(manifest.partitions):
        ps = manifest.partitions[pid]
        if not ps.file and not ps.deltas:
            continue
        s = (ps.stats or {}).get(column)
        if isinstance(s, dict) and value not in s["in"]:
            continue  # provably absent
        if isinstance(s, list) and not (s[0] <= value <= s[1]):
            continue
        plan.append({"part_id": pid, "file": ps.file, "deltas": list(ps.deltas),
                     "push": isinstance(s, (list, dict))})
    return plan


def eq_scan(
    lake_root: str, column: str, value, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Live lake rows with ``column == value``, reading ONLY the
    partitions ``eq_plan`` cannot rule out (dictionary-stat file
    skipping — the low-cardinality-string complement of ``range_scan``).
    The exact predicate is re-applied after the MOR-aware merge."""
    import ray

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    out_names = [c for c in (columns or schema.names)]
    plan = eq_plan(manifest, column, value)
    if not plan:
        return ray.data.from_arrow(
            pa.table({n: pa.array([], type=schema.field(n).type) for n in out_names})
        )
    reg_json = registry.to_json()

    def fetch(batch: pa.Table) -> pa.Table:
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_, push in zip(batch["file"].to_pylist(),
                                 batch["deltas"].to_pylist(),
                                 batch["push"].to_pylist()):
            # delta-free partition + stats-proven column: the base file IS
            # the live state (CoW / compacted — no tombstones), so a VALUE
            # predicate may push into the read; with deltas the predicate
            # must wait for the LWW merge (pre-merge filtering could drop
            # the newest version and resurrect an older matching one)
            kf = [[(column, "=", value)]] if push and not ds_ else None
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg,
                                    latest, key_filters=kf)
            mask = pc.equal(t[column], pa.scalar(value))
            out.append(t.filter(mask).select(out_names))
        return pa.concat_tables(out)

    return ray.data.from_items(plan).map_batches(
        fetch, batch_format="pyarrow", batch_size=1
    )


def range_scan(
    lake_root: str, column: str, lo, hi, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Live lake rows with ``lo <= column <= hi``, reading ONLY the
    partitions the zone maps cannot rule out (``range_plan``).  The exact
    predicate is re-applied after the MOR-aware partition merge, so the
    result is identical to filtering ``read_lake`` — stats only decide
    how little gets read."""
    import ray

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    out_names = [c for c in (columns or schema.names)]
    plan = range_plan(manifest, column, lo, hi)
    if not plan:
        return ray.data.from_arrow(
            pa.table({n: pa.array([], type=schema.field(n).type) for n in out_names})
        )
    reg_json = registry.to_json()

    def fetch(batch: pa.Table) -> pa.Table:
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_, push in zip(batch["file"].to_pylist(),
                                 batch["deltas"].to_pylist(),
                                 batch["push"].to_pylist()):
            # same delta-free pushdown contract as eq_scan's fetch
            kf = ([[(column, ">=", lo), (column, "<=", hi)]]
                  if push and not ds_ else None)
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg,
                                    latest, key_filters=kf)
            mask = pc.and_(
                pc.greater_equal(t[column], pa.scalar(lo)),
                pc.less_equal(t[column], pa.scalar(hi)),
            )
            out.append(t.filter(mask).select(out_names))
        return pa.concat_tables(out)

    return ray.data.from_items(plan).map_batches(
        fetch, batch_format="pyarrow", batch_size=1
    )


def read_lake_table(lake_root: str) -> pa.Table:
    """Whole lake as one Arrow table — tests/small data only."""
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    files = [store.abspath(f) for f in manifest.live_files()]
    if not files:
        sch = registry.schema_for(latest)
        return pa.table({f.name: pa.array([], type=f.type) for f in sch})
    tables = [
        load_partition_live(lake_root, ps.file, list(ps.deltas), registry, latest)
        for ps in manifest.partitions.values()
        if ps.file or ps.deltas
    ]
    t = pa.concat_tables(tables)
    return t.take(
        pc.sort_indices(t, sort_keys=[("repo", "ascending"), ("path", "ascending")])
    )
