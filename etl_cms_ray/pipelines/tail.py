"""Binlog-tail driver: discover new epoch files, ingest incrementally.

The north rule's "binlog/WAL tail -> lake upsert" verb: a producer
appends `epoch=<n>.parquet` files to a directory; the tailer discovers
unprocessed ones (by comparing against the lake's lineage), ingests them
in epoch order with the normal exactly-once machinery, and repeats.
Crash-safe by construction: the lake's per-partition fences make
re-ingesting a half-processed epoch idempotent, so the tailer keeps no
state of its own — the lake IS the cursor (the reference keeps this
cursor in control files, ``utility_classes.py:26-100``).
"""

from __future__ import annotations

import glob
import os
import re
import time

from ..config import EngineConfig
from ..schema import SchemaChange
from ..sources.events import read_events_parquet
from ..state.manifest import LakeStore
from .ingest import IngestResult, ingest

_EPOCH_RE = re.compile(r"epoch=(\d+)\.parquet$")


def discover_epochs(events_dir: str) -> dict[int, str]:
    """epoch -> file path for every epoch file currently in the directory."""
    out = {}
    for path in glob.glob(os.path.join(events_dir, "epoch=*.parquet")):
        m = _EPOCH_RE.search(path)
        if m:
            out[int(m.group(1))] = path
    return out


def applied_through(lake_root: str) -> int:
    """Max epoch the lake has fully applied (min over non-empty partition
    fences would be over-conservative; the tailer re-offers every epoch
    above the global max and lets per-partition fences skip work)."""
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    fences = [p.applied_through_epoch for p in manifest.partitions.values()]
    return max(fences, default=-1)


def tail_once(
    events_dir: str,
    cfg: EngineConfig,
    schema_changes: list[SchemaChange] | None = None,
    late_policy: str = "ignore",
) -> list[IngestResult]:
    """Ingest every not-yet-applied epoch file, in epoch order, one commit
    per epoch (the commit granularity IS the epoch — FIXTURES.md F2).

    ``late_policy`` governs epoch files that appear AFTER a higher epoch
    was already applied — i.e. the producer broke the non-decreasing
    delivery contract (the watermark here is the lake's global fence):

    - ``"ignore"`` (default): skip them, but RECORD each skip in the
      lineage log (op=late_epoch) — silent data loss is the one thing a
      tail must never do quietly.  A skip is recorded once per epoch.
    - ``"rescue"``: ingest them anyway — per-partition fences make this
      safe and exactly-once: rows for partitions whose fence still
      permits the epoch apply normally; rows already superseded are
      fenced out (events_shuffled - events_applied in the commit metrics
      shows how much of the late epoch was unsalvageable).
    - ``"strict"``: raise — for producers that guarantee order, a late
      file means corruption upstream.
    """
    if late_policy not in ("ignore", "rescue", "strict"):
        raise ValueError(f"unknown late_policy {late_policy!r}")
    store = LakeStore(cfg.lake_root)
    done_through = applied_through(cfg.lake_root)
    epochs = discover_epochs(events_dir)
    results = []
    # epochs this tailer has already handled (committed, skipped-late, or
    # rescued) — recorded in the lineage log, so a fresh process knows.
    # An epoch <= fence WITHOUT such a record was never offered through
    # this tailer: that is a genuinely late file, not a replay.
    seen = {
        int(r["epoch"])
        for r in store.read_lineage()
        if r.get("op") in ("tail_commit", "late_epoch") and "epoch" in r
    }
    late = sorted(e for e in epochs if e <= done_through and e not in seen)
    if late and late_policy == "strict":
        raise RuntimeError(
            f"late epoch files {late} below the lake fence {done_through}"
        )
    if late and late_policy == "ignore":
        for ep in late:
            store.append_lineage(
                {"op": "late_epoch", "epoch": ep, "fence": done_through,
                 "file": epochs[ep], "action": "skipped"}
            )
    todo = sorted(e for e in epochs if e > done_through)
    if late and late_policy == "rescue":
        todo = late + todo  # late first: keeps the offered order sorted
        for ep in late:
            store.append_lineage(
                {"op": "late_epoch", "epoch": ep, "fence": done_through,
                 "file": epochs[ep], "action": "rescued"}
            )
    for ep in todo:
        r = ingest(read_events_parquet(epochs[ep]), cfg,
                   schema_changes=schema_changes)
        store.append_lineage(
            {"op": "tail_commit", "epoch": ep,
             "manifest_version": r.manifest_version}
        )
        results.append(r)
    return results


def tail_loop(
    events_dir: str,
    cfg: EngineConfig,
    poll_seconds: float = 1.0,
    max_polls: int | None = None,
    idle_polls_to_stop: int | None = None,
    late_policy: str = "ignore",
) -> int:
    """Poll-and-ingest loop.  Returns total commits made.  Bounded by
    ``max_polls`` and/or ``idle_polls_to_stop`` so tests and batch jobs
    terminate; run unbounded (None, None) as a service."""
    commits = 0
    idle = 0
    polls = 0
    while True:
        results = tail_once(events_dir, cfg, late_policy=late_policy)
        commits += len(results)
        idle = idle + 1 if not results else 0
        polls += 1
        if max_polls is not None and polls >= max_polls:
            break
        if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
            break
        time.sleep(poll_seconds)
    return commits
