"""Unified predicate-scan planner: pick the cheapest physical path —
lake zone maps, a sorted projection, or a z-order layout — for a
multi-column predicate, from METADATA ONLY (manifest stats + layout
metas; no data is read to plan).

The engine has four ways to serve ``{col: (lo, hi)}`` predicates:

1. the lake itself, pruning partitions by the manifest's per-partition
   zone maps / dictionary stats (``ingest.range_plan``/``eq_plan``) —
   intersected across ALL predicate columns here;
2. a sorted projection (``pipelines/projection.py``) when one predicate
   column is its sort column;
3. a z-order layout (``pipelines/zorder.py``) when any predicate columns
   are clustered;
4. a full lake scan (always available).

``scan_plans`` costs each candidate as the FRACTION of estimated ROWS
scanned (manifest partition rows / per-file layout rows — still
metadata-only), falling back to unit counts when any row count is
unknown (MOR partitions awaiting compaction report -1), so planning is
O(partitions + layout files) on the driver.  ``smart_scan``
executes the cheapest plan and re-applies the EXACT full predicate on
whatever comes back (the projection/z-order/token-index discipline:
the planner decides READS, never the answer — a wrong cost estimate can
only waste IO, not change a row).

Reference analog: the reference's warehouse relies on the database
planner to pick among its 59 post-load indices
(``SQL/create_CDMv5_indices.sql``); a lake engine must bring its own.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..schema import SchemaRegistry
from ..state.manifest import LakeStore
from .index import _state_id
from .ingest import eq_plan, load_partition_live, range_plan, read_lake
from .projection import load_projection_meta
from .zorder import load_zorder_meta, zorder_scan


def _layout_names(lake_root: str, kind: str) -> list[str]:
    import os

    d = os.path.join(lake_root, kind)
    try:
        return sorted(
            n for n in os.listdir(d)
            if os.path.isfile(os.path.join(d, n, "meta.json"))
        )
    except FileNotFoundError:
        return []


def scan_plans(
    lake_root: str,
    preds: dict[str, tuple],
    columns: list[str] | None = None,
) -> list[dict]:
    """Enumerate executable plans for ``preds`` ({col: (lo, hi)}
    inclusive; equality = (v, v)), cheapest first.  Each plan carries
    {"strategy", "layout", "units_scanned", "units_total", "frac"}."""
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    schema = store.load_registry().schema_for(
        store.load_registry().latest_version
    )
    live = {pid: ps for pid, ps in manifest.partitions.items()
            if ps.file or ps.deltas}
    n_live = max(len(live), 1)
    needed = set(columns or schema.names) | set(preds)

    # row-weighted costing when every live partition reports rows (MOR
    # partitions awaiting compaction report -1 = unknown -> unit counts)
    part_rows = {pid: ps.rows for pid, ps in live.items()}
    rows_known = all(r >= 0 for r in part_rows.values())
    total_rows = sum(part_rows.values()) if rows_known else None

    def _frac(scan_units: int, total_units: int,
              scan_rows: "int | None", tot_rows: "int | None") -> float:
        if scan_rows is not None and tot_rows:
            return scan_rows / tot_rows
        return scan_units / max(total_units, 1)

    plans: list[dict] = [{
        "strategy": "full_scan", "layout": None,
        "units_scanned": len(live), "units_total": n_live,
        "est_rows": total_rows, "frac": 1.0,
    }]

    # --- lake zone maps, intersected across every predicate column ---
    keep: set[int] | None = None
    for c, (lo, hi) in preds.items():
        if lo == hi:
            ids = {p["part_id"] for p in eq_plan(manifest, c, lo)}
        elif isinstance(lo, str) or isinstance(hi, str):
            continue  # string RANGE: dict stats can't prune; mask-only
        else:
            ids = {p["part_id"] for p in range_plan(manifest, c, lo, hi)}
        keep = ids if keep is None else (keep & ids)
    if keep is not None:
        krows = sum(part_rows[p] for p in keep) if rows_known else None
        plans.append({
            "strategy": "lake_zonemap", "layout": None,
            "units_scanned": len(keep), "units_total": n_live,
            "est_rows": krows,
            "frac": _frac(len(keep), n_live, krows, total_rows),
            "_part_ids": keep,
        })

    def _stale_cost(meta: dict) -> tuple[int, "int | None"]:
        stale_pids = [pid for pid, ps in live.items()
                      if meta["src_state"].get(str(pid)) != _state_id(ps)]
        srows = (sum(part_rows[p] for p in stale_pids)
                 if rows_known else None)
        return len(stale_pids), srows

    # --- sorted projections: sort_col must carry a predicate ---
    for name in _layout_names(lake_root, "_projections"):
        meta = load_projection_meta(lake_root, name)
        if meta is None or meta["sort_col"] not in preds:
            continue
        if not needed <= set(meta["columns"]):
            continue
        lo, hi = preds[meta["sort_col"]]
        stale, stale_rows = _stale_cost(meta)
        total = max(len(meta["files"]), 1)
        hits = [e for e in meta["files"].values()
                if not (e["max"] < lo or e["min"] > hi)]
        layout_rows = sum(e["rows"] for e in meta["files"].values())
        hrows = (sum(e["rows"] for e in hits) + stale_rows
                 if stale_rows is not None else None)
        plans.append({
            "strategy": "projection", "layout": name,
            "units_scanned": len(hits) + stale, "units_total": total,
            "est_rows": hrows,
            "frac": _frac(len(hits) + stale, total + stale,
                          hrows, (layout_rows + stale_rows)
                          if stale_rows is not None else None),
        })

    # --- z-order layouts: any covered predicate column prunes ---
    for name in _layout_names(lake_root, "_zorder"):
        meta = load_zorder_meta(lake_root, name)
        if meta is None:
            continue
        covered = {c: b for c, b in preds.items() if c in meta["zcols"]}
        if not covered or not needed <= set(meta["columns"]):
            continue
        stale, stale_rows = _stale_cost(meta)
        total = max(len(meta["files"]), 1)

        def _hit(entry: dict) -> bool:
            for c, (lo, hi) in covered.items():
                mn, mx = entry["mins"].get(c), entry["maxs"].get(c)
                if mn is not None and mx is not None and (mx < lo or mn > hi):
                    return False
            return True

        hits = [e for e in meta["files"].values() if _hit(e)]
        layout_rows = sum(e["rows"] for e in meta["files"].values())
        hrows = (sum(e["rows"] for e in hits) + stale_rows
                 if stale_rows is not None else None)
        plans.append({
            "strategy": "zorder", "layout": name,
            "units_scanned": len(hits) + stale, "units_total": total,
            "est_rows": hrows,
            "frac": _frac(len(hits) + stale, total + stale,
                          hrows, (layout_rows + stale_rows)
                          if stale_rows is not None else None),
            "_covered": covered,
        })

    # cheapest fraction first; deterministic tie-break prefers the more
    # selective physical layouts over a full scan
    order = {"zorder": 0, "projection": 1, "lake_zonemap": 2, "full_scan": 3}
    plans.sort(key=lambda p: (p["frac"], order[p["strategy"]],
                              p["layout"] or ""))
    return plans


def _full_mask(t: pa.Table, preds: dict[str, tuple]):
    mask = None
    for c, (lo, hi) in preds.items():
        m = pc.and_(pc.greater_equal(t[c], pa.scalar(lo)),
                    pc.less_equal(t[c], pa.scalar(hi)))
        mask = m if mask is None else pc.and_(mask, m)
    return pc.fill_null(mask, False)


def smart_scan(
    lake_root: str,
    preds: dict[str, tuple],
    columns: list[str] | None = None,
    info: dict | None = None,
) -> "ray.data.Dataset":
    """Execute the cheapest plan from ``scan_plans`` and re-apply the
    exact full predicate — the result equals filtering ``read_lake``
    whatever the planner picked.  Pass ``info={}`` to receive the chosen
    plan plus the full candidate list."""
    import ray

    store = LakeStore(lake_root)
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    out_cols = list(columns or schema.names)

    plans = scan_plans(lake_root, preds, columns=out_cols)
    chosen = plans[0]
    if info is not None:
        info.update({k: v for k, v in chosen.items()
                     if not k.startswith("_")})
        info["candidates"] = [
            {k: v for k, v in p.items() if not k.startswith("_")}
            for p in plans
        ]

    def finish(ds: "ray.data.Dataset") -> "ray.data.Dataset":
        def apply(t: pa.Table) -> pa.Table:
            return t.filter(_full_mask(t, preds)).select(out_cols)

        return ds.map_batches(apply, batch_format="pyarrow")

    if chosen["strategy"] == "zorder":
        ds = zorder_scan(lake_root, chosen["layout"], chosen["_covered"],
                         columns=sorted(set(out_cols) | set(preds)))
        return finish(ds)
    if chosen["strategy"] == "projection":
        from .projection import projection_scan

        meta = load_projection_meta(lake_root, chosen["layout"])
        lo, hi = preds[meta["sort_col"]]
        ds = projection_scan(lake_root, chosen["layout"], lo, hi,
                             columns=sorted(set(out_cols) | set(preds)))
        return finish(ds)
    if chosen["strategy"] == "lake_zonemap":
        manifest = store.load_manifest()
        reg_json = registry.to_json()
        plan = [
            {"file": ps.file, "deltas": list(ps.deltas)}
            for pid, ps in sorted(manifest.partitions.items())
            if pid in chosen["_part_ids"]
        ]
        if not plan:
            return ray.data.from_arrow(pa.table({
                n: pa.array([], type=schema.field(n).type) for n in out_cols
            }))

        def fetch(batch: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            reg = SchemaRegistry.from_json(reg_json)
            out = []
            for f0, ds_ in zip(batch["file"].to_pylist(),
                               batch["deltas"].to_pylist()):
                t = load_partition_live(lake_root, f0, list(ds_ or []),
                                        reg, latest)
                out.append(t.filter(_full_mask(t, preds)).select(out_cols))
            return pa.concat_tables(out)

        return ray.data.from_items(plan).map_batches(
            fetch, batch_format="pyarrow", batch_size=1
        )
    return finish(read_lake(lake_root))
