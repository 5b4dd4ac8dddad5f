"""Z-order clustered layout over the lake: a multi-dimensional
clustering rewrite (the Delta `OPTIMIZE ... ZORDER BY`/Iceberg
sort-order analog) so ONE physical copy serves selective predicates on
SEVERAL columns at once.

The single-column sorted projection (pipelines/projection.py) is the
right layout for one range dimension; a second predicate column still
scans every surviving range file.  Z-ordering interleaves the bits of
rank-normalized column codes into one scalar key and range-partitions
on that key, so files end up rectangular-ish in (col1, col2, ...)
space and per-file zone maps become tight on EVERY clustered column —
multi-dimensional data skipping from one layout.

Reference analog: the post-load index DDL
(``SQL/create_CDMv5_indices.sql``) builds several single-column
indices; a z-ordered clustered copy is the lake-native way to serve the
same multi-predicate scans without one physical copy per column.

Scale shape:
- Domain pass: one mergeable sketch per partition per z-column (KLL
  for numerics, bounded distinct sets for strings — bytes to the
  driver, never rows).  Rank/quantile codes make the z-key robust to
  skew: equal-width bucketing of the z-key is equal-FREQUENCY in value
  space, so file sizes stay balanced without a second shuffle.
- Layout pass: one streaming read of the live rows, a vectorized
  bit-interleave per batch, then ONE groupby(z_bucket) shuffle writes
  each clustered file sorted by z-key.  ``num_files`` bounds the
  shuffle fan-in and rises with the cluster.
- Scan: prune files where ANY predicate column's [min, max] is
  provably disjoint; per-source-partition staleness (state_id, never
  reused version numbers) falls back to a direct MOR-aware lake scan,
  and the exact predicate is re-applied on both paths — pruning
  decides READS, never the answer (the projection/token-index
  discipline).
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

_CODE_BITS = 8  # rank codes per column; k cols -> k*8-bit z-key
_MAX_CATEGORIES = 4096


def _zo_dir(lake_root: str, name: str) -> str:
    return os.path.join(lake_root, "_zorder", name)


def _zo_meta_path(lake_root: str, name: str) -> str:
    return os.path.join(_zo_dir(lake_root, name), "meta.json")


def load_zorder_meta(lake_root: str, name: str) -> dict | None:
    try:
        with open(_zo_meta_path(lake_root, name)) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def _interleave(codes: list[np.ndarray], bits: int = _CODE_BITS) -> np.ndarray:
    """Vectorized Morton interleave: bit b of column i lands at position
    b*k + i.  k*bits <= 64; the loop is k*bits iterations of whole-array
    bit ops, never per element."""
    k = len(codes)
    z = np.zeros(len(codes[0]), dtype=np.uint64)
    for b in range(bits):
        for i, c in enumerate(codes):
            z |= ((c.astype(np.uint64) >> np.uint64(b)) & np.uint64(1)) << np.uint64(b * k + i)
    return z


def _domains(plan, lake_root, reg_json, latest, zcols, schema) -> dict:
    """One pass over the live partitions collecting a mergeable summary
    per z-column: KLL bytes for numerics, distinct value lists (bounded)
    for strings.  Driver-side merge handles bytes/small lists only."""
    import ray

    from ..functions.sketch import KLL

    numeric = {c for c in zcols if pa.types.is_integer(schema.field(c).type)
               or pa.types.is_floating(schema.field(c).type)}

    def summarize(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        reg = SchemaRegistry.from_json(reg_json)
        cols: dict[str, list] = {f"_k_{c}": [] for c in zcols if c in numeric}
        cols.update({f"_d_{c}": [] for c in zcols if c not in numeric})
        for f0, ds_ in zip(batch["file"].to_pylist(), batch["deltas"].to_pylist()):
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
            for c in zcols:
                col = t[c].drop_null()
                if c in numeric:
                    sk = KLL(200)
                    sk.add_many(col.to_numpy(zero_copy_only=False).astype(np.float64))
                    cols[f"_k_{c}"].append(sk.to_bytes())
                else:
                    vals = pc.unique(col.combine_chunks()).to_pylist()
                    if len(vals) > _MAX_CATEGORIES:
                        raise ValueError(
                            f"z-order column '{c}' has >{_MAX_CATEGORIES} "
                            "distinct strings in one partition — use a "
                            "numeric/rankable column instead"
                        )
                    cols[f"_d_{c}"].append(vals)
        arrays = {}
        for name_, v in cols.items():
            if name_.startswith("_k_"):
                arrays[name_] = pa.array(v, type=pa.binary())
            else:
                arrays[name_] = pa.array(v, type=pa.list_(pa.string()))
        return pa.table(arrays)

    rows = (
        ray.data.from_items(plan)
        .map_batches(summarize, batch_format="pyarrow", batch_size=4)
        .take_all()
    )
    dom: dict[str, dict] = {}
    for c in zcols:
        if c in numeric:
            merged = KLL(200)
            for r in rows:
                merged = merged.merge(KLL.from_bytes(r[f"_k_{c}"]))
            ncodes = 1 << _CODE_BITS
            cuts: list[float] = []
            for i in range(1, ncodes):
                v = merged.quantile(i / ncodes)
                if not cuts or v > cuts[-1]:
                    cuts.append(float(v))
            dom[c] = {"kind": "numeric", "cuts": cuts}
        else:
            seen: set[str] = set()
            for r in rows:
                seen.update(r[f"_d_{c}"])
            if len(seen) > _MAX_CATEGORIES:
                raise ValueError(
                    f"z-order column '{c}' has {len(seen)} distinct strings "
                    f"(max {_MAX_CATEGORIES})"
                )
            dom[c] = {"kind": "category", "values": sorted(seen)}
    return dom


def _codes_for(t: pa.Table, zcols: list[str], domains: dict) -> np.ndarray:
    """Per-batch rank codes -> interleaved z-key (uint64)."""
    codes = []
    for c in zcols:
        d = domains[c]
        if d["kind"] == "numeric":
            v = t[c].to_numpy(zero_copy_only=False).astype(np.float64)
            v = np.nan_to_num(v, nan=-np.inf)  # nulls/NaN -> lowest code
            idx = np.searchsorted(np.asarray(d["cuts"]), v, side="right")
            # duplicate quantiles collapse the cut list on low-cardinality
            # data; rescale so codes still span the full range (otherwise
            # the high interleave bits are constant and buckets collapse)
            code = (idx * ((1 << _CODE_BITS) - 1)) // max(len(d["cuts"]), 1)
        else:
            cats = d["values"]
            ncat = max(len(cats), 1)
            idx = pc.index_in(t[c], value_set=pa.array(cats, type=pa.string()))
            raw = pc.fill_null(idx, 0).to_numpy(zero_copy_only=False).astype(np.int64)
            # spread bounded categories across the full code range so
            # interleave bits are meaningful even for few categories
            code = (raw * ((1 << _CODE_BITS) - 1)) // max(ncat - 1, 1)
        codes.append(np.clip(code, 0, (1 << _CODE_BITS) - 1).astype(np.uint64))
    return _interleave(codes)


def build_zorder(
    lake_root: str,
    name: str,
    zcols: list[str],
    columns: list[str] | None = None,
    num_files: int = 16,
    incremental: bool = True,
) -> dict:
    """Build or refresh the z-ordered clustered copy ``name`` over
    ``zcols``.  First build picks the rank-code domains ONCE (fixed
    thereafter, like the projection's cut points, so refreshes stay
    incremental); a refresh costs O(changed source partitions +
    affected z-buckets): a source partition whose (base, delta-chain)
    state_id is unchanged is already correctly clustered, and only
    buckets that hold its rows or receive new rows are rewritten.
    Domains fixed at first build can drift from the data — per-file
    row counts in meta make the skew observable, and a full rebuild
    (``incremental=False``) re-derives them (Delta's periodic full
    OPTIMIZE ZORDER).  Returns {"files", "rows", "rebuilt_files",
    "changed_parts"}."""
    import ray

    if not 2 <= len(zcols) * _CODE_BITS <= 64:
        raise ValueError("1..8 z-order columns supported")
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    reg_json = registry.to_json()
    cols = list(columns or schema.names)
    for need in (*zcols, "path", "repo"):
        if need not in cols:
            cols.insert(0, need)

    live = {pid: ps for pid, ps in sorted(manifest.partitions.items())
            if ps.file or ps.deltas}
    cur_state = {pid: _state_id(ps) for pid, ps in live.items()}

    old = load_zorder_meta(lake_root, name) if incremental else None
    if old is not None and (
        old["zcols"] != list(zcols)
        or old["columns"] != cols
        or old["num_files"] != num_files
    ):
        old = None  # config changed: full rebuild

    if old is None:
        full_plan = [
            {"part_id": pid, "file": ps.file, "deltas": list(ps.deltas)}
            for pid, ps in live.items()
        ]
        domains = _domains(full_plan, lake_root, reg_json, latest, zcols,
                           schema) if full_plan else \
            {c: {"kind": "numeric", "cuts": []} for c in zcols}
        changed = set(live)
        old_files: dict[str, dict] = {}
        old_state: dict[str, str] = {}
    else:
        domains = old["domains"]
        old_files = old["files"]
        old_state = old["src_state"]
        changed = {
            pid for pid, sid in cur_state.items()
            if old_state.get(str(pid)) != sid
        }
        changed |= {int(p) for p in old_state if int(p) not in cur_state}

    plan = [
        {"part_id": pid, "file": live[pid].file, "deltas": list(live[pid].deltas)}
        for pid in sorted(changed)
        if pid in live
    ]

    zbits = len(zcols) * _CODE_BITS

    def fetch(batch: pa.Table) -> pa.Table:
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
            z = _codes_for(t, zcols, domains)
            bucket = ((z.astype(np.uint64) * np.uint64(num_files))
                      >> np.uint64(zbits)).astype(np.int64)
            t = t.append_column("_zkey", pa.array(z.astype(np.int64)))
            out.append(t.append_column("z_bucket", pa.array(bucket)))
        return pa.concat_tables(out)

    def write_bucket(group: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        bid = group["z_bucket"][0].as_py()
        rows = group.sort_by([("_zkey", "ascending"), ("repo", "ascending"),
                              ("path", "ascending")])
        rows = rows.drop_columns(["_zkey", "z_bucket"])
        fname, _sha = _write_deterministic(
            rows, _zo_dir(lake_root, name), f"z{bid:05d}"
        )
        mins, maxs = {}, {}
        for c in zcols:
            mm = pc.min_max(rows[c])
            mins[c] = mm["min"].as_py()
            maxs[c] = mm["max"].as_py()
        return pa.table(
            {"z_bucket": pa.array([bid], type=pa.int64()),
             "file": [os.path.relpath(fname, lake_root)],
             "rows": pa.array([rows.num_rows], type=pa.int64()),
             "mins": [json.dumps(mins)],
             "maxs": [json.dumps(maxs)],
             "src_parts": pa.array(
                 [sorted(set(rows["src_part"].to_pylist()))],
                 type=pa.list_(pa.int32()))}
        )

    rebuilt: dict[str, dict] = {}
    if plan or changed:
        ds_new = None
        hit_buckets: set[int] = set()
        if plan:
            ds_new = (
                ray.data.from_items(plan)
                .map_batches(fetch, batch_format="pyarrow", batch_size=1)
                .materialize()  # O(changed data); consumed twice below
            )
            hits = ds_new.map_batches(
                lambda t: pa.table({"z_bucket": pc.unique(t["z_bucket"])}),
                batch_format="pyarrow",
            ).take_all()
            hit_buckets = {int(r["z_bucket"]) for r in hits}

        affected = set(hit_buckets)
        for bid_s, entry in old_files.items():
            if set(entry["src_parts"]) & changed:
                affected.add(int(bid_s))

        # surviving rows of affected buckets: re-read, drop changed
        # partitions' rows, re-derive the z-key for the in-file sort
        old_plan = [
            {"z_bucket": int(b), "file": old_files[str(b)]["file"]}
            for b in sorted(affected)
            if str(b) in old_files
        ]
        changed_arr = pa.array(sorted(changed), type=pa.int32())

        def fetch_old(batch: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            out = []
            for bid, f in zip(batch["z_bucket"].to_pylist(),
                              batch["file"].to_pylist()):
                t = pq.read_table(os.path.join(lake_root, f))
                keep = pc.invert(pc.is_in(t["src_part"], value_set=changed_arr))
                t = t.filter(keep)
                z = _codes_for(t, zcols, domains)
                t = t.append_column("_zkey", pa.array(z.astype(np.int64)))
                out.append(t.append_column(
                    "z_bucket", pa.array([bid] * t.num_rows, type=pa.int64())
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
        if parts_ds:
            union = parts_ds[0]
            for d in parts_ds[1:]:
                union = union.union(d)
            out_rows = (
                union.groupby("z_bucket")
                .map_groups(write_bucket, batch_format="pyarrow")
                .take_all()
            )
            rebuilt = {str(int(r["z_bucket"])): r for r in out_rows}

    files: dict[str, dict] = {}
    for bid_s, entry in old_files.items():
        if bid_s not in rebuilt and not (set(entry["src_parts"]) & changed):
            files[bid_s] = entry
    for bid_s, r in rebuilt.items():
        if int(r["rows"]):
            files[bid_s] = {
                "file": r["file"], "rows": int(r["rows"]),
                "mins": json.loads(r["mins"]),
                "maxs": json.loads(r["maxs"]),
                "src_parts": [int(p) for p in r["src_parts"]],
            }
    total_rows = sum(e["rows"] for e in files.values())

    meta = {
        "name": name,
        "zcols": list(zcols),
        "columns": cols,
        "num_files": num_files,
        "domains": domains,
        "version": manifest.version,
        "src_state": {str(pid): sid for pid, sid in cur_state.items()},
        "files": files,
    }
    os.makedirs(_zo_dir(lake_root, name), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=_zo_dir(lake_root, name))
    with os.fdopen(fd, "w") as f:
        json.dump(meta, f, sort_keys=True)
    os.replace(tmp, _zo_meta_path(lake_root, name))
    referenced = {os.path.basename(e["file"]) for e in files.values()}
    for fn in os.listdir(_zo_dir(lake_root, name)):
        if fn.endswith(".parquet") and fn not in referenced:
            os.unlink(os.path.join(_zo_dir(lake_root, name), fn))
    return {"files": len(files), "rows": total_rows,
            "rebuilt_files": len(rebuilt), "changed_parts": len(changed)}


def zorder_scan(
    lake_root: str,
    name: str,
    preds: dict[str, tuple],
    columns: list[str] | None = None,
    info: dict | None = None,
) -> "ray.data.Dataset":
    """Rows satisfying ALL ``preds`` ({col: (lo, hi)} inclusive; equality
    = (v, v)) served from the z-ordered files, pruned by per-file
    multi-column zone maps, with per-source-partition staleness fallback
    to a direct lake scan.  Pass ``info={}`` for {"files_total",
    "files_scanned", "stale_parts"}."""
    import ray

    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    reg_json = registry.to_json()

    meta = load_zorder_meta(lake_root, name)
    if meta is None:
        raise FileNotFoundError(
            f"z-order layout '{name}' does not exist under {lake_root}"
        )
    for c in preds:
        if c not in meta["zcols"]:
            raise ValueError(
                f"predicate column '{c}' is not in the z-order columns "
                f"{meta['zcols']} — its zone maps were not recorded"
            )
    out_cols = list(columns or meta["columns"])

    live = {pid: ps for pid, ps in sorted(manifest.partitions.items())
            if ps.file or ps.deltas}
    stale = {
        pid for pid, ps in live.items()
        if meta["src_state"].get(str(pid)) != _state_id(ps)
    }
    # partitions that vanished since the build also invalidate their rows
    gone = {int(p) for p in meta["src_state"] if int(p) not in live}

    def overlaps(entry: dict) -> bool:
        for c, (lo, hi) in preds.items():
            mn, mx = entry["mins"].get(c), entry["maxs"].get(c)
            if mn is None or mx is None:
                continue  # all-null file column: exact filter drops rows
            if mx < lo or mn > hi:
                return False
        return True

    plan = [
        {"file": e["file"]}
        for _bid, e in sorted(meta["files"].items(), key=lambda kv: int(kv[0]))
        if overlaps(e)
    ]
    if info is not None:
        info.update({"files_total": len(meta["files"]),
                     "files_scanned": len(plan),
                     "stale_parts": len(stale | gone)})

    stale_arr = pa.array(sorted(stale | gone), type=pa.int32())

    def exact_mask(t: pa.Table):
        mask = None
        for c, (lo, hi) in preds.items():
            m = pc.and_(pc.greater_equal(t[c], pa.scalar(lo)),
                        pc.less_equal(t[c], pa.scalar(hi)))
            mask = m if mask is None else pc.and_(mask, m)
        return pc.fill_null(mask, False) if mask is not None else None

    def fetch_z(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        out = []
        for f in batch["file"].to_pylist():
            t = pq.read_table(os.path.join(lake_root, f))
            keep = pc.invert(pc.is_in(t["src_part"], value_set=stale_arr))
            m = exact_mask(t)
            if m is not None:
                keep = pc.and_(keep, m)
            out.append(t.filter(keep).select(out_cols))
        return pa.concat_tables(out)

    parts = []
    if plan:
        parts.append(
            ray.data.from_items(plan).map_batches(
                fetch_z, batch_format="pyarrow", batch_size=4
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
                m = exact_mask(t)
                out.append((t.filter(m) if m is not None else t).select(out_cols))
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
