"""Multi-sink table fan-out: one pass over a stream, N routed tables.

Reference analog: the 19-table dispatch — one claim row fans out to up to
6 output tables through a routing table and per-table formatters
(``CMS_SynPuf_ETL_CDM_v5.py:212-229`` builds the routing map, ``:1226-1291``
consumes it; every table is an open append sink, ``FileControl.py:310-329``).

Ray-native shape: ONE ``map_batches`` pass evaluates every route's
vectorized predicate + projection per batch and writes each routed slice
as a content-addressed parquet file under ``<root>/<table>/`` (the
applier's deterministic-write discipline, so at-least-once task retries
rewrite identical bytes); the tiny per-file result rows flow back and a
single atomic manifest publish commits ALL tables at once — readers only
see files listed in the manifest, so a half-failed run commits nothing.

Scale notes: routed writes are side-effect-free w.r.t. the shuffle plan —
no repartition, no driver materialization of data; the only driver-side
state is one row per written file.  Routes may overlap (a record can fan
out to several tables); ``predicate=None`` marks the catch-all route
(records matched by NO other route — the dead-letter sink).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..state.manifest import _atomic_write
from .applier import _write_deterministic


@dataclass
class Route:
    """One output table: name, vectorized row predicate, projection."""

    name: str
    #: batch -> BooleanArray mask; None = catch-all (no other route matched)
    predicate: Callable[[pa.Table], "pa.Array"] | None
    columns: list[str]


MANIFEST_NAME = "_fanout_manifest.json"


def fanout_write(
    events: "ray.data.Dataset", routes: list[Route], out_root: str,
    batch_size: int | None = 65536,
) -> dict:
    """Execute the fan-out (consumes the Dataset) and commit one manifest.

    Returns ``{table: {"rows": n, "files": [...]}}``.  Tables with zero
    matching rows still appear (empty file list).

    ``batch_size`` coalesces input blocks before routing: every batch
    writes up to ``len(routes)`` files, so file count — which is what
    read-back task count, manifest size and small-file IO all scale
    with — is ``#batches x #routes``.  Routing itself is a light
    vectorized pass, so the coalesce does not starve task parallelism
    (measured 4x faster end-to-end at sf0.1 vs per-block batches); at
    stream scale 65536-row batches still yield thousands of tasks.
    """
    names = [r.name for r in routes]
    if len(set(names)) != len(names):
        raise ValueError("duplicate route names")
    if sum(1 for r in routes if r.predicate is None) > 1:
        raise ValueError("at most one catch-all route")

    def route_batch(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        out_names, out_files, out_rows = [], [], []
        masks: list = []
        for r in routes:
            masks.append(None if r.predicate is None else r.predicate(t))
        matched_any = None
        for m in masks:
            if m is None:
                continue
            matched_any = m if matched_any is None else pc.or_(matched_any, m)
        for r, m in zip(routes, masks):
            if m is None:  # catch-all: rows no other route claimed
                m = (
                    pc.invert(matched_any)
                    if matched_any is not None
                    else pa.array([True] * t.num_rows)
                )
            part = t.filter(m).select(r.columns).replace_schema_metadata(None)
            if part.num_rows == 0:
                continue
            fname, _sha = _write_deterministic(
                part, os.path.join(out_root, r.name), "part"
            )
            out_names.append(r.name)
            out_files.append(os.path.relpath(fname, out_root))
            out_rows.append(part.num_rows)
        return pa.table(
            {
                "table": pa.array(out_names, type=pa.string()),
                "file": pa.array(out_files, type=pa.string()),
                "rows": pa.array(out_rows, type=pa.int64()),
            }
        )

    written = events.map_batches(
        route_batch, batch_format="pyarrow", batch_size=batch_size
    ).take_all()
    manifest: dict = {r.name: {"rows": 0, "files": []} for r in routes}
    for row in written:
        entry = manifest[row["table"]]
        entry["rows"] += int(row["rows"])
        entry["files"].append(row["file"])
    for entry in manifest.values():
        entry["files"].sort()
    # one atomic publish for ALL tables: the all-or-nothing commit point
    _atomic_write(os.path.join(out_root, MANIFEST_NAME), json.dumps(manifest, indent=1))
    return manifest


def read_fanout_table(
    out_root: str, table: str, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Read one routed table back — only files the manifest committed."""
    with open(os.path.join(out_root, MANIFEST_NAME)) as f:
        manifest = json.load(f)
    files = [os.path.join(out_root, rel) for rel in manifest[table]["files"]]
    if not files:
        return ray.data.from_arrow(pa.table({}))
    from ..functions.rayutil import read_parquet_clean

    # one physical schema per routed table -> stripped-schema read keeps
    # every downstream block schema hashable (schema-dedup early exit)
    return read_parquet_clean(files, columns=columns)
