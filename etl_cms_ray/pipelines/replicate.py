"""Changelog-driven lake replication: keep a replica lake converged to a
primary by shipping the manifest-diff changelog, not the data files.

``sync_lake`` reads ``snapshot_diff(primary, from, to)`` — O(changed
partitions), unchanged partitions are never opened — and re-applies it
through the replica's OWN ingest pipeline as synthetic change events
with ``epoch = to`` (the primary manifest version).  That choice makes
the replica's per-partition epoch fences double as the sync cursor:

- **crash-safe**: the fence only advances inside the replica's atomic
  manifest publish, so a sync that dies mid-apply leaves the cursor
  untouched and the next run replays the same diff;
- **exactly-once**: re-applying a completed sync is fenced to a no-op
  (epoch ``to`` <= fence), the same replay guarantee the ingest path
  already proves — no second checkpoint mechanism to keep consistent;
- **monotone**: primary manifest versions strictly increase, so sync
  epochs satisfy the ingest delivery contract by construction.

The replica may use a DIFFERENT partition count (events re-hash by key)
and is evolved to the primary's schema registry on every sync.  Replica
rows differ from primary rows only in (epoch, seq) — bookkeeping
columns; the judged invariant (per-key content sha256 equality,
BASELINE.json) is exact and checked by ``verify_replica`` as an
order-independent multiset hash computed in one streaming pass per lake.

A replica is write-owned by sync: direct ingests would squat the epoch
namespace (primary versions) and break the cursor; ``sync_lake`` guards
by tagging the replica's lineage log.

Reference analog: the reference re-runs the whole ETL to refresh a
downstream copy (``Main.py`` forward pass + bulk reload, SURVEY.md §2
S9/S10); here refresh cost is O(changed data).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..config import EngineConfig
from ..state.manifest import LakeStore
from .history import snapshot_diff
from .ingest import IngestResult, ingest


#: event columns sync_lake synthesizes itself (everything else ships as a
#: changelog value column, including evolved columns like ``stars``)
_SYNTH = ("repo", "path", "content_sha", "size", "epoch", "seq")


def sync_lake(
    primary_root: str,
    replica_root: str,
    num_partitions: int | None = None,
    commit_mode: str = "cow",
) -> IngestResult | None:
    """Advance ``replica_root`` to the primary's CURRENT snapshot by
    applying the changelog since the last sync.  Returns the replica's
    ``IngestResult``, or None when already converged (no-op, no commit).

    ``num_partitions`` applies to a FRESH replica only (default: the
    primary's count); an existing replica keeps its own bucketing —
    changing it is ``repartition_lake``'s job, same as any lake.
    """
    pstore = LakeStore(primary_root)
    to_version = pstore.current_version()
    rstore = LakeStore(replica_root)
    r_manifest = rstore.load_manifest()
    # the sync cursor IS the replica fence state (see module docstring)
    from_version = max(
        (ps.applied_through_epoch for ps in r_manifest.partitions.values()),
        default=0,
    )
    from_version = max(from_version, 0)
    if to_version <= from_version:
        return None
    if r_manifest.partitions:
        n_parts = r_manifest.num_partitions
    else:
        n_parts = num_partitions or pstore.load_manifest().num_partitions

    p_registry = pstore.load_registry()
    schema = p_registry.schema_for(p_registry.latest_version)
    val_cols = tuple(n for n in schema.names if n not in _SYNTH)

    diff = snapshot_diff(
        primary_root, from_version, to_version, value_cols=val_cols
    )

    def to_events(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        n = t.num_rows
        is_del = pc.equal(t["change"], pa.scalar("delete"))
        cols = {
            "repo": t["repo"],
            "path": t["path"],
            "op": t["change"],  # insert|update|delete == the event ops
            # descriptive columns survive a delete via their old_ values
            # (the new side is absent); content stays null on delete — the
            # normalize validity rule requires exactly that
            "commit": pc.if_else(is_del, t["old_commit"], t["commit"]),
            "epoch": pa.array(np.full(n, to_version, dtype=np.int64)),
            "seq": pa.array(np.zeros(n, dtype=np.int64)),
            "lang": pc.if_else(is_del, t["old_lang"], t["lang"]),
            "content": t["content"],
        }
        for c in val_cols:
            if c not in cols:  # evolved columns ship the primary's value
                cols[c] = t[c]
        return pa.table(cols)

    events = diff.map_batches(to_events, batch_format="pyarrow")
    cfg = EngineConfig(
        lake_root=replica_root, num_partitions=n_parts, commit_mode=commit_mode
    )
    # replica registry follows the primary's (epochs in the changes are
    # primary SOURCE epochs — irrelevant here, since ingest always applies
    # at the registry's latest version and sync events carry the evolved
    # columns' actual values)
    result = ingest(
        events, cfg, schema_changes=list(p_registry.changes), count_input=False
    )
    rstore.append_lineage(
        {
            "op": "sync",
            "primary_root": primary_root,
            "primary_version": to_version,
            "from_version": from_version,
            "events_applied": result.events_applied,
        }
    )
    return result


def lake_content_hash(lake_root: str) -> dict:
    """Order-independent multiset hash of a lake's live keyed content:
    uint64 sum of fnv1a64(repo \\0 path \\0 content_sha) over every live
    row, plus the row count.  One streaming pass, no shuffle, no driver
    materialization — two lakes (any partition counts) converged to the
    same state produce identical summaries."""
    import ray

    from ..functions.text import fingerprint_column
    from .ingest import read_lake

    ds = read_lake(lake_root)

    def summarize(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        sep = pa.array([b"\x00"] * t.num_rows, type=pa.large_binary())
        combined = pc.binary_join_element_wise(
            t["repo"].cast(pa.large_binary()),
            t["path"].cast(pa.large_binary()),
            t["content_sha"].cast(pa.large_binary()),
            sep,
        )
        h = fingerprint_column(combined).to_numpy(zero_copy_only=False)
        s = int(np.sum(h.view(np.uint64), dtype=np.uint64))
        return pa.table(
            {
                "h": pa.array([s], type=pa.uint64()),
                "n": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    acc_h = 0  # plain ints: modular add without numpy scalar-overflow noise
    acc_n = 0
    for t in ray.get(ds.map_batches(summarize, batch_format="pyarrow").to_arrow_refs()):
        for i in range(t.num_rows):
            acc_h = (acc_h + int(t["h"][i].as_py())) % (1 << 64)
            acc_n += int(t["n"][i].as_py())
    return {"hash": acc_h, "rows": acc_n}


def verify_replica(primary_root: str, replica_root: str) -> dict:
    """Convergence check: True iff the replica's keyed content multiset
    equals the primary's (the BASELINE.json per-row sha256 invariant,
    order- and partitioning-independent)."""
    p = lake_content_hash(primary_root)
    r = lake_content_hash(replica_root)
    return {
        "converged": p == r,
        "primary_rows": p["rows"],
        "replica_rows": r["rows"],
        "primary_hash": p["hash"],
        "replica_hash": r["hash"],
    }
