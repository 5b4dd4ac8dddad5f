"""Storage-partitioned join (SPJ): shuffle-free lake-lake join.

Every lake in this engine is written by the SAME deterministic key
partitioner (``fnv1a64(repo \\0 path) % P`` — CLAUDE.md rule 7 pins it
stable forever), so equal ``(repo, path)`` keys are GUARANTEED to live
in equal partition ids of any two lakes with the same partition count.
A join on the full lake key therefore needs ZERO exchange: one task per
partition id loads both sides' live state (LWW(base ∪ deltas),
tombstones dropped, schema-promoted) and joins in memory — the
Iceberg/Spark storage-partitioned-join idea applied to this layout.

Scale shape: at 10^10-event scale this replaces the all-to-all shuffle
a generic join needs with P embarrassingly-parallel tasks, each reading
only its own partition pair; no block of either lake crosses the wire
and nothing is broadcast.  Skew is bounded by the key partitioner, and
P rises with the cluster (``repartition_lake`` migrates P for BOTH
lakes when they must stay joinable).

Reference contact: the row-at-a-time vocabulary/person lookups of
``python_etl/CMS_SynPuf_ETL_CDM_v5.py`` (provider/person joins)
reframed as partition-local joins over co-partitioned lakes.
"""
from __future__ import annotations

import pyarrow as pa

from ..state.manifest import LakeStore

KEY_COLS = ["repo", "path"]


def copartitioned_join(
    lake_a: str,
    lake_b: str,
    columns_a: list[str],
    columns_b: list[str],
    how: str = "inner",
    version_a: int | None = None,
    version_b: int | None = None,
    suffix_b: str = "_b",
) -> "ray.data.Dataset":
    """Join two co-partitioned lakes on the full lake key with no shuffle.

    ``columns_a`` / ``columns_b`` are the payload columns to carry from
    each side (keys are always carried); a b-side payload whose name
    collides with an a-side one gets ``suffix_b``.  ``how`` is
    ``inner`` / ``left`` / ``outer`` (left = all live A keys).  Pass
    ``version_a`` / ``version_b`` to join SNAPSHOTS (time-travel joins
    ride the same partition alignment).

    Raises ``ValueError`` when the partition counts differ — those lakes
    are not co-partitioned and a generic exchange join (stages/join.py
    ``hash_join`` over ``read_lake`` datasets) is the correct tool.
    """
    import ray.data as rd

    from ..schema import SchemaRegistry
    from .ingest import load_partition_live

    if how not in ("inner", "left", "outer"):
        raise ValueError(f"unsupported how={how!r}")
    store_a, store_b = LakeStore(lake_a), LakeStore(lake_b)
    ma = store_a.load_manifest(version=version_a)
    mb = store_b.load_manifest(version=version_b)
    if ma.num_partitions != mb.num_partitions:
        raise ValueError(
            "lakes are not co-partitioned "
            f"({ma.num_partitions} vs {mb.num_partitions} partitions); "
            "repartition_lake one side or use a generic hash_join"
        )
    reg_a, reg_b = store_a.load_registry(), store_b.load_registry()
    # promote each side to ITS manifest's newest committed schema version
    # (read_snapshot's contract: a later add_column does not retroactively
    # appear in a historical/snapshot join)
    va = max((ps.schema_version for ps in ma.partitions.values()
              if ps.file or ps.deltas), default=reg_a.latest_version)
    vb = max((ps.schema_version for ps in mb.partitions.values()
              if ps.file or ps.deltas), default=reg_b.latest_version)
    reg_a_json, reg_b_json = reg_a.to_json(), reg_b.to_json()

    items = []
    for pid in range(ma.num_partitions):
        psa, psb = ma.partitions.get(pid), mb.partitions.get(pid)
        has_a = psa is not None and bool(psa.file or psa.deltas)
        has_b = psb is not None and bool(psb.file or psb.deltas)
        if how == "inner" and not (has_a and has_b):
            continue
        if how == "left" and not has_a:
            continue
        if not (has_a or has_b):
            continue
        items.append(
            {
                "part_id": pid,
                "file_a": psa.file if has_a else None,
                "deltas_a": list(psa.deltas) if has_a else [],
                "file_b": psb.file if has_b else None,
                "deltas_b": list(psb.deltas) if has_b else [],
            }
        )

    sel_a = KEY_COLS + [c for c in columns_a if c not in KEY_COLS]
    sel_b = KEY_COLS + [c for c in columns_b if c not in KEY_COLS]
    join_type = {"inner": "inner", "left": "left outer",
                 "outer": "full outer"}[how]

    def join_part(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ra = SchemaRegistry.from_json(reg_a_json)
        rb = SchemaRegistry.from_json(reg_b_json)
        outs = []
        for fa, da, fb, db in zip(
            batch["file_a"].to_pylist(), batch["deltas_a"].to_pylist(),
            batch["file_b"].to_pylist(), batch["deltas_b"].to_pylist(),
        ):
            if fa or da:
                ta = load_partition_live(lake_a, fa, list(da or []), ra, va)
            else:
                ta = ra.schema_for(va).empty_table()
            if fb or db:
                tb = load_partition_live(lake_b, fb, list(db or []), rb, vb)
            else:
                tb = rb.schema_for(vb).empty_table()
            # Arrow (Acero) join keeps exact types on unmatched rows
            # (pandas merge would upcast unmatched int payloads to float
            # and infer null-typed columns on one-sided partitions, so
            # per-partition block schemas would diverge); key-sort makes
            # the per-partition row order value-determined.
            out = ta.select(sel_a).join(
                tb.select(sel_b), keys=KEY_COLS, join_type=join_type,
                right_suffix=suffix_b,
            ).sort_by([(k, "ascending") for k in KEY_COLS])
            outs.append(out)
        return pa.concat_tables(outs)

    return rd.from_items(items).map_batches(
        join_part, batch_format="pyarrow", batch_size=1
    )
