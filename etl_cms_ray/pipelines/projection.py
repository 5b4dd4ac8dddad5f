"""Sorted secondary projection (incremental materialized view) over the
lake: range-partitioned, value-sorted copies of selected columns for
scan acceleration on a NON-key dimension.

The lake itself is hash-partitioned and key-sorted by (repo, path) —
the right layout for upserts, the wrong one for "all rows with
200 <= size <= 500": zone maps prune partitions (ingest.range_scan),
but within a hash partition values are scattered, so a selective range
still opens most of the lake.  A projection is the Iceberg/Delta
"sort-ordered materialized view" analog (the reference's closest
relative is its warehouse INDEX DDL, ``SQL/create_CDMv5_indices.sql`` —
a physical layout created AFTER load to serve value predicates):

- ``build_projection`` picks ``num_ranges - 1`` cut points on the sort
  column ONCE (mergeable KLL sketch over per-partition samples, fixed
  thereafter so refreshes stay incremental), then writes one
  value-SORTED, content-addressed parquet per range under
  ``_projections/<name>/`` with tight [min, max] and the set of source
  partitions that contributed rows.  Every projection row carries its
  ``src_part`` id — the unit of both freshness tracking and refresh.
- Refresh (``build_projection`` again, ``incremental=True``) costs
  O(changed source partitions + affected ranges): a source partition
  whose (base file, delta chain) ``state_id`` is unchanged is already
  correctly represented; only ranges that (a) hold rows of a changed
  partition (drop + re-add) or (b) receive new rows are rewritten.
  Range files are immutable; the meta flip is tmp + atomic rename, and
  replaced files are unlinked only after the flip (a crash leaves
  re-collectable orphans, never a broken projection — the manifest
  discipline).
- ``projection_scan`` serves a range predicate FROM the projection,
  pruning range files by [min, max].  Staleness is per SOURCE partition
  by state_id (never manifest version numbers — they are reused after
  rollback + roll-forward, the token-index lesson): rows whose
  ``src_part`` changed since the build are EXCLUDED from the projection
  read (they may be deleted/updated — unlike bitmap pruning, a
  projection serves rows directly, so a stale row is a wrong answer,
  not just a wasted read) and those partitions are served by a direct
  MOR-aware lake scan instead.  The exact predicate is re-applied on
  both paths, so the result equals filtering ``read_lake`` regardless
  of how stale the projection is — pruning decides reads, never the
  answer.

Scale notes: the projection holds only the projected columns (column
pruning at build); ranges are written by one ``groupby(range_id)``
shuffle over O(changed data), not the lake; ``num_ranges`` bounds the
shuffle fan-in and can rise with the cluster.  Cut points fixed at
first build can skew as the distribution drifts — ``meta["files"]``
row counts make the skew observable, and a full rebuild
(``incremental=False``) re-cuts.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import SchemaRegistry
from ..state.manifest import LakeStore
from ..stages.applier import _write_deterministic
from .index import _state_id
from .ingest import load_partition_live


def _proj_dir(lake_root: str, name: str) -> str:
    return os.path.join(lake_root, "_projections", name)


def _meta_path(lake_root: str, name: str) -> str:
    return os.path.join(_proj_dir(lake_root, name), "meta.json")


def load_projection_meta(lake_root: str, name: str) -> dict | None:
    try:
        with open(_meta_path(lake_root, name)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _pick_bounds(plan, lake_root, reg_json, latest, sort_col, num_ranges):
    """KLL-quantile cut points over the current live rows (one mergeable
    sketch per partition, merged on the driver — bytes, not rows)."""
    import ray

    from ..functions.sketch import KLL

    def sketch_partition(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_ in zip(batch["file"].to_pylist(), batch["deltas"].to_pylist()):
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
            sk = KLL(200)
            sk.add_many(t[sort_col].to_numpy(zero_copy_only=False))
            out.append(sk.to_bytes())
        return pa.table({"sk": pa.array(out, type=pa.binary())})

    rows = (
        ray.data.from_items(plan)
        .map_batches(sketch_partition, batch_format="pyarrow", batch_size=4)
        .take_all()
    )
    from ..functions.sketch import KLL

    merged = KLL(200)
    for r in rows:
        merged = merged.merge(KLL.from_bytes(r["sk"]))
    qs = [i / num_ranges for i in range(1, num_ranges)]
    # strictly increasing cut points (duplicate quantiles collapse —
    # fewer, fatter ranges on massive ties, never an empty-range error)
    bounds: list[float] = []
    for q in qs:
        v = merged.quantile(q)
        if not bounds or v > bounds[-1]:
            bounds.append(v)
    return bounds


def build_projection(
    lake_root: str,
    name: str,
    sort_col: str,
    columns: list[str] | None = None,
    num_ranges: int = 16,
    incremental: bool = True,
) -> dict:
    """Create or refresh the sorted projection ``name``; returns
    {"ranges", "rows", "rebuilt_ranges", "reused_ranges",
    "changed_parts"}.  ``columns`` defaults to the full schema; the sort
    column and the repo/path keys are always included (the keys make
    projection rows traceable back to lake rows)."""
    import ray

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    reg_json = registry.to_json()
    cols = list(columns or schema.names)
    for need in (sort_col, "path", "repo"):
        if need not in cols:
            cols.insert(0, need)

    live = {pid: ps for pid, ps in sorted(manifest.partitions.items())
            if ps.file or ps.deltas}
    cur_state = {pid: _state_id(ps) for pid, ps in live.items()}

    old = load_projection_meta(lake_root, name) if incremental else None
    if old is not None and (
        old["sort_col"] != sort_col
        or old["columns"] != cols
        or old["num_ranges"] != num_ranges
    ):
        old = None  # config changed: full rebuild

    if old is None:
        full_plan = [
            {"part_id": pid, "file": ps.file, "deltas": list(ps.deltas)}
            for pid, ps in live.items()
        ]
        bounds = _pick_bounds(
            full_plan, lake_root, reg_json, latest, sort_col, num_ranges
        ) if full_plan else []
        changed = set(live)
        old_files: dict[str, dict] = {}
        old_state: dict[str, str] = {}
    else:
        bounds = old["bounds"]
        old_files = old["files"]
        old_state = old["src_state"]
        changed = {
            pid for pid, sid in cur_state.items()
            if old_state.get(str(pid)) != sid
        }
        # vanished partitions (emptied out): their rows must leave too
        changed |= {int(p) for p in old_state if int(p) not in cur_state}

    bounds_arr = np.asarray(bounds, dtype=np.float64)

    def assign_range(t: pa.Table) -> pa.Table:
        v = t[sort_col].to_numpy(zero_copy_only=False).astype(np.float64)
        rid = np.searchsorted(bounds_arr, v, side="right").astype(np.int64)
        return t.append_column("range_id", pa.array(rid))

    # --- new rows: live state of every changed partition, projected ---
    plan = [
        {"part_id": pid, "file": live[pid].file, "deltas": list(live[pid].deltas)}
        for pid in sorted(changed)
        if pid in live
    ]

    def fetch_changed(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for pid, f0, ds_ in zip(
            batch["part_id"].to_pylist(), batch["file"].to_pylist(),
            batch["deltas"].to_pylist(),
        ):
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
            t = t.select(cols).append_column(
                "src_part", pa.array([pid] * t.num_rows, type=pa.int32())
            )
            out.append(t)
        return pa.concat_tables(out)

    rebuilt: dict[int, dict] = {}
    hit_ranges: set[int] = set()
    if plan or changed:
        ds_new = None
        if plan:
            ds_new = (
                ray.data.from_items(plan)
                .map_batches(fetch_changed, batch_format="pyarrow", batch_size=1)
                .map_batches(assign_range, batch_format="pyarrow")
                .materialize()  # O(changed data); consumed twice below
            )
            hits = ds_new.map_batches(
                lambda t: pa.table(
                    {"range_id": pc.unique(t["range_id"])}
                ),
                batch_format="pyarrow",
            ).take_all()
            hit_ranges = {int(r["range_id"]) for r in hits}

        affected = set(hit_ranges)
        for rid_s, entry in old_files.items():
            if set(entry["src_parts"]) & changed:
                affected.add(int(rid_s))

        # --- old rows of affected ranges, minus the changed partitions ---
        old_plan = [
            {"range_id": int(r), "file": old_files[str(r)]["file"]}
            for r in sorted(affected)
            if str(r) in old_files
        ]
        changed_arr = pa.array(sorted(changed), type=pa.int32())

        def fetch_old(batch: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            out = []
            for rid, f in zip(batch["range_id"].to_pylist(),
                              batch["file"].to_pylist()):
                t = pq.read_table(os.path.join(lake_root, f))
                keep = pc.invert(pc.is_in(t["src_part"], value_set=changed_arr))
                t = t.filter(keep)
                out.append(t.append_column(
                    "range_id", pa.array([rid] * t.num_rows, type=pa.int64())
                ))
            return pa.concat_tables(out)

        parts_ds = []
        if ds_new is not None:
            parts_ds.append(ds_new)
        if old_plan:
            parts_ds.append(
                ray.data.from_items(old_plan).map_batches(
                    fetch_old, batch_format="pyarrow", batch_size=4
                )
            )

        def write_range(group: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            rid = group["range_id"][0].as_py()
            rows = group.drop_columns(["range_id"])
            rows = rows.take(pc.sort_indices(
                rows,
                sort_keys=[(sort_col, "ascending"), ("repo", "ascending"),
                           ("path", "ascending")],
            ))
            if rows.num_rows == 0:
                return pa.table(
                    {"range_id": pa.array([rid], type=pa.int64()),
                     "file": pa.array([None], type=pa.string()),
                     "rows": pa.array([0], type=pa.int64()),
                     "vmin": pa.array([None], type=pa.float64()),
                     "vmax": pa.array([None], type=pa.float64()),
                     "src_parts": pa.array([[]], type=pa.list_(pa.int32()))}
                )
            fname, _sha = _write_deterministic(
                rows, _proj_dir(lake_root, name), f"r{rid:05d}"
            )
            vm = pc.min_max(rows[sort_col])
            return pa.table(
                {"range_id": pa.array([rid], type=pa.int64()),
                 "file": [os.path.relpath(fname, lake_root)],
                 "rows": pa.array([rows.num_rows], type=pa.int64()),
                 "vmin": pa.array([float(vm["min"].as_py())], type=pa.float64()),
                 "vmax": pa.array([float(vm["max"].as_py())], type=pa.float64()),
                 "src_parts": pa.array(
                     [sorted(set(rows["src_part"].to_pylist()))],
                     type=pa.list_(pa.int32()))}
            )

        if parts_ds:
            union = parts_ds[0]
            for d in parts_ds[1:]:
                union = union.union(d)
            out_rows = (
                union.groupby("range_id")
                .map_groups(write_range, batch_format="pyarrow")
                .take_all()
            )
            rebuilt = {
                int(r["range_id"]): r for r in out_rows
            }

    files: dict[str, dict] = {}
    for rid_s, entry in old_files.items():
        rid = int(rid_s)
        if rid not in rebuilt and not (set(entry["src_parts"]) & changed):
            files[rid_s] = entry
    for rid, r in rebuilt.items():
        if int(r["rows"]):
            files[str(rid)] = {
                "file": r["file"], "rows": int(r["rows"]),
                "min": float(r["vmin"]), "max": float(r["vmax"]),
                "src_parts": [int(p) for p in r["src_parts"]],
            }

    meta = {
        "name": name,
        "sort_col": sort_col,
        "columns": cols,
        "num_ranges": num_ranges,
        "bounds": [float(b) for b in bounds],
        "version": manifest.version,
        "src_state": {str(pid): sid for pid, sid in cur_state.items()},
        "files": files,
    }
    os.makedirs(_proj_dir(lake_root, name), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_proj_dir(lake_root, name))
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, _meta_path(lake_root, name))
    # GC: projection files only this meta references — unlink leftovers
    # AFTER the flip (crash above leaves orphans, never a broken view)
    referenced = {os.path.basename(e["file"]) for e in files.values()}
    for fn in os.listdir(_proj_dir(lake_root, name)):
        if fn.endswith(".parquet") and fn not in referenced:
            os.unlink(os.path.join(_proj_dir(lake_root, name), fn))

    return {
        "ranges": len(files),
        "rows": sum(e["rows"] for e in files.values()),
        "rebuilt_ranges": len(rebuilt),
        "reused_ranges": len(files) - len([r for r in rebuilt if str(r) in files]),
        "changed_parts": len(changed),
    }


def projection_scan(
    lake_root: str,
    name: str,
    lo,
    hi,
    columns: list[str] | None = None,
    info: dict | None = None,
) -> "ray.data.Dataset":
    """Rows with ``lo <= sort_col <= hi`` served from the projection's
    range files (pruned by [min, max]), with per-source-partition
    staleness fallback to a direct lake scan.  Pass ``info={}`` to
    receive {"files_total", "files_scanned", "stale_parts",
    "fallback"} for observability/tests."""
    import ray

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    reg_json = registry.to_json()

    meta = load_projection_meta(lake_root, name)
    live = {pid: ps for pid, ps in sorted(manifest.partitions.items())
            if ps.file or ps.deltas}
    if meta is None:
        raise FileNotFoundError(
            f"projection '{name}' does not exist under {lake_root} — "
            "build_projection first (scan needs its sort_col from meta)"
        )
    out_cols = list(columns or meta["columns"])

    sort_col = meta["sort_col"]
    stale = {
        pid for pid, ps in live.items()
        if meta["src_state"].get(str(pid)) != _state_id(ps)
    }

    plan = [
        {"file": e["file"]}
        for _rid, e in sorted(meta["files"].items(), key=lambda kv: int(kv[0]))
        if not (e["max"] < lo or e["min"] > hi)
    ]
    if info is not None:
        info.update({"files_total": len(meta["files"]),
                     "files_scanned": len(plan),
                     "stale_parts": len(stale), "fallback": False})

    stale_arr = pa.array(sorted(stale), type=pa.int32())

    def fetch_proj(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        out = []
        for f in batch["file"].to_pylist():
            t = pq.read_table(os.path.join(lake_root, f))
            keep = pc.and_(
                pc.invert(pc.is_in(t["src_part"], value_set=stale_arr)),
                pc.and_(pc.greater_equal(t[sort_col], pa.scalar(lo)),
                        pc.less_equal(t[sort_col], pa.scalar(hi))),
            )
            out.append(t.filter(keep).select(out_cols))
        return pa.concat_tables(out)

    parts = []
    if plan:
        parts.append(
            ray.data.from_items(plan).map_batches(
                fetch_proj, batch_format="pyarrow", batch_size=4
            )
        )

    stale_plan = [
        {"file": live[pid].file, "deltas": list(live[pid].deltas)}
        for pid in sorted(stale)
    ]
    if stale_plan:
        def fetch_stale(batch: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            reg = SchemaRegistry.from_json(reg_json)
            out = []
            for f0, ds_ in zip(batch["file"].to_pylist(),
                               batch["deltas"].to_pylist()):
                t = load_partition_live(lake_root, f0, list(ds_ or []), reg,
                                        latest)
                mask = pc.and_(
                    pc.greater_equal(t[sort_col], pa.scalar(lo)),
                    pc.less_equal(t[sort_col], pa.scalar(hi)),
                )
                out.append(t.filter(mask).select(out_cols))
            return pa.concat_tables(out)

        parts.append(
            ray.data.from_items(stale_plan).map_batches(
                fetch_stale, batch_format="pyarrow", batch_size=1
            )
        )

    if not parts:
        return ray.data.from_arrow(
            pa.table({
                n: pa.array(
                    [],
                    type=(schema.field(n).type if n in schema.names
                          else pa.int32()),
                ) for n in out_cols
            })
        )
    union = parts[0]
    for d in parts[1:]:
        union = union.union(d)
    return union
