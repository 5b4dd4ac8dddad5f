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
) -> list[IngestResult]:
    """Ingest every not-yet-applied epoch file, in epoch order, one commit
    per epoch (the commit granularity IS the epoch — FIXTURES.md F2)."""
    done_through = applied_through(cfg.lake_root)
    epochs = discover_epochs(events_dir)
    results = []
    for ep in sorted(e for e in epochs if e > done_through):
        results.append(
            ingest(read_events_parquet(epochs[ep]), cfg, schema_changes=schema_changes)
        )
    return results


def tail_loop(
    events_dir: str,
    cfg: EngineConfig,
    poll_seconds: float = 1.0,
    max_polls: int | None = None,
    idle_polls_to_stop: int | None = None,
) -> int:
    """Poll-and-ingest loop.  Returns total commits made.  Bounded by
    ``max_polls`` and/or ``idle_polls_to_stop`` so tests and batch jobs
    terminate; run unbounded (None, None) as a service."""
    commits = 0
    idle = 0
    polls = 0
    while True:
        results = tail_once(events_dir, cfg)
        commits += len(results)
        idle = idle + 1 if not results else 0
        polls += 1
        if max_polls is not None and polls >= max_polls:
            break
        if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
            break
        time.sleep(poll_seconds)
    return commits
