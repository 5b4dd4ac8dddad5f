"""Debezium-envelope CDC source (the S-family connector for real
change-data-capture feeds).

Debezium (the de-facto open CDC format for MySQL/Postgres binlogs)
emits one JSON envelope per change:

    {"payload": {"before": {...}|null, "after": {...}|null,
                 "op": "c"|"u"|"d"|"r",
                 "ts_ms": 1700000000000,
                 "source": {"txId": 7, "lsn": 91, "table": "files", ...}}}

This module maps that envelope onto the engine's canonical
EVENTS_SCHEMA, fully vectorized:

- ``op``: c (create) and r (snapshot read) → insert, u → update,
  d → delete;
- the row image is ``after`` (``before`` for deletes — Debezium deletes
  carry the pre-image plus a null after);
- ``epoch`` comes from a configurable envelope path (default
  ``source.txId`` — the transaction IS the commit, matching the
  engine's whole-epoch at-least-once contract) and ``seq`` from
  ``source.lsn`` (the intra-transaction total order);
- payload columns map by ``field_map`` (engine column → image field).

Envelopes with schemas disabled (no ``payload`` wrapper) are handled
transparently.  The decode is pyarrow ``struct_field`` extraction on
the JSON-inferred Arrow structs — zero per-row Python; the reader is
``ray.data.read_json`` so a directory of binlog segment files streams
block-parallel like every other source.

Reference analog: the reference's CSV claim feeds are its only change
feed (SURVEY.md §2.1 S4/S7); this is the same role for a real CDC bus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..schema import EVENTS_SCHEMA

#: Debezium op → engine op.  'r' is a snapshot row (initial load).
_OP_MAP = {"c": "insert", "r": "insert", "u": "update", "d": "delete"}

#: default engine-column → row-image field mapping (repos-shaped feeds)
DEFAULT_FIELD_MAP = {
    "repo": "repo",
    "path": "path",
    "commit": "commit",
    "lang": "lang",
    "content": "content",
}


def _struct_path(col: pa.ChunkedArray | pa.Array, path: list[str]):
    """Nested struct_field extraction; None if the path is absent from
    the inferred schema (e.g. ``before`` never materialized because the
    file holds no deletes)."""
    try:
        out = col
        for p in path:
            if pa.types.is_null(out.type):
                # JSON inference yields `null` type for a field that is
                # null in EVERY row of the segment (e.g. `before` in an
                # all-insert export) — same meaning as absent
                return None
            out = pc.struct_field(out, p)
        return out
    except (KeyError, pa.ArrowInvalid, pa.ArrowTypeError,
            pa.ArrowNotImplementedError):
        return None


def decode_debezium(t: pa.Table, field_map: dict | None = None,
                    epoch_path: str = "source.txId",
                    seq_path: str = "source.lsn") -> pa.Table:
    """One batch of raw envelopes → EVENTS_SCHEMA rows (vectorized)."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    fmap = dict(DEFAULT_FIELD_MAP if field_map is None else field_map)
    n = t.num_rows
    # schemas-disabled envelopes have before/after/op at the top level
    env = t["payload"] if "payload" in t.column_names else None

    def top(path: list[str]):
        if env is not None:
            return _struct_path(env, path)
        if path[0] in t.column_names:
            return _struct_path(t[path[0]], path[1:]) if len(path) > 1 else t[path[0]]
        return None

    op_raw = top(["op"])
    if op_raw is None:
        raise ValueError("not a Debezium envelope: no 'op' field")
    is_del = pc.equal(op_raw, "d")
    # vectorized op translation via take on a tiny dictionary
    keys = list(_OP_MAP)
    idx = pc.index_in(op_raw, value_set=pa.array(keys))
    if idx.null_count:
        # unknown op codes AND null ops are both malformed envelopes —
        # fail loud (a silent null op would flow downstream as a
        # droppable malformed event, hiding an unsupported op class)
        bad = pc.unique(pc.filter(op_raw, pc.is_null(idx))).to_pylist()
        raise ValueError(f"unknown Debezium op codes {bad!r}")
    op = pc.take(pa.array([_OP_MAP[k] for k in keys]), idx)

    def image_field(field: str):
        after = top(["after", field])
        before = top(["before", field])
        if after is None and before is None:
            return pa.nulls(n, type=pa.string())
        if before is None:  # no pre-images in this segment
            return after
        if after is None:
            return pc.if_else(is_del, before, pa.nulls(n, type=before.type))
        return pc.if_else(is_del, before, after)

    def int_path(dotted: str, default: int) -> pa.Array:
        arr = top(dotted.split("."))
        if arr is None:
            return pa.array([default] * n, type=pa.int64())
        return pc.fill_null(pc.cast(arr, pa.int64()), default)

    cols = {
        "repo": pc.cast(image_field(fmap["repo"]), pa.string()),
        "path": pc.cast(image_field(fmap["path"]), pa.string()),
        "op": op,
        "commit": pc.cast(image_field(fmap.get("commit", "commit")), pa.string()),
        "epoch": int_path(epoch_path, 0),
        "seq": int_path(seq_path, 0),
        "lang": pc.cast(image_field(fmap.get("lang", "lang")), pa.string()),
        "content": pc.cast(image_field(fmap.get("content", "content")),
                           pa.large_string()),
    }
    # engine contract: delete events carry a null content payload (the
    # pre-image's other fields still ride along for dead-letter context)
    cols["content"] = pc.if_else(is_del, pa.nulls(n, type=pa.large_string()),
                                 cols["content"])
    return pa.table(cols, schema=EVENTS_SCHEMA)


def read_events_debezium(paths, field_map: dict | None = None,
                         epoch_path: str = "source.txId",
                         seq_path: str = "source.lsn") -> "rd.Dataset":
    """Debezium JSONL segment files → canonical event stream."""
    ds = rd.read_json(paths)
    return ds.map_batches(
        decode_debezium, batch_format="pyarrow",
        fn_kwargs={"field_map": field_map, "epoch_path": epoch_path,
                   "seq_path": seq_path},
    )


def export_changelog_debezium(
    lake_root: str,
    from_version: int,
    to_version: int | None = None,
    out_dir: str = None,
    table: str = "files",
    value_cols: tuple = ("commit", "lang", "content"),
) -> str:
    """CDC OUT — the write side of this connector: publish a lake's
    changelog between two manifest versions as Debezium-envelope JSONL
    segments, so any downstream consumer (another engine, a Kafka-shaped
    bus, this engine's own read_events_debezium) can subscribe to the
    lake like a topic.

    Shape: `snapshot_diff` already computes the per-key net change
    reading only partitions whose manifest state differs (O(changed
    partitions)); this stage turns each diff row into an envelope
    FULLY VECTORIZED — before/after images are Arrow StructArrays
    masked null on insert/delete respectively, the op code is an
    index_in/take dictionary map (the exact inverse of decode), and the
    segments stream out via `write_json` block-parallel.  No row loop,
    no driver materialization.

    Envelope contract (mirrors decode): op c/u/d; after = new image
    (null on delete), before = old image (null on insert);
    source.txId = to_version (the manifest commit IS the transaction,
    so a re-ingest of the exported stream applies under the engine's
    whole-epoch fence semantics); source.lsn = 0 (one net change per
    key per commit — no intra-transaction order to preserve).  The
    round trip export → read_events_debezium → ingest reconstructs the
    source relation exactly (oracle cdc_debezium_export)."""
    from ..pipelines.history import snapshot_diff
    from ..state.manifest import LakeStore

    if to_version is None:
        to_version = LakeStore(lake_root).current_version()
    diff = snapshot_diff(lake_root, from_version, to_version,
                         value_cols=tuple(value_cols))
    txid = int(to_version)

    def to_env(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        n = t.num_rows
        change = t["change"]
        is_del = pc.equal(change, "delete")
        is_ins = pc.equal(change, "insert")

        def img(cols: dict, null_mask) -> pa.StructArray:
            arrays = [
                (v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v)
                for v in cols.values()
            ]
            mask = pc.fill_null(null_mask, False)
            return pa.StructArray.from_arrays(
                arrays, names=list(cols), mask=mask.combine_chunks()
                if isinstance(mask, pa.ChunkedArray) else mask)

        after = img(
            {"repo": t["repo"], "path": t["path"],
             **{c: t[c] for c in value_cols}},
            is_del,
        )
        before = img(
            {"repo": t["repo"], "path": t["path"],
             **{c: t[f"old_{c}"] for c in value_cols}},
            is_ins,
        )
        keys = ["insert", "update", "delete"]
        idx = pc.index_in(change, value_set=pa.array(keys))
        op = pc.take(pa.array(["c", "u", "d"]), idx)
        source = pa.StructArray.from_arrays(
            [pa.array(np.full(n, txid, dtype=np.int64)),
             pa.array(np.zeros(n, dtype=np.int64)),
             pa.array([table] * n)],
            names=["txId", "lsn", "table"],
        )
        payload = pa.StructArray.from_arrays(
            [before, after,
             op.combine_chunks() if isinstance(op, pa.ChunkedArray) else op,
             pa.array(np.full(n, 1_700_000_000_000 + txid, dtype=np.int64)),
             source],
            names=["before", "after", "op", "ts_ms", "source"],
        )
        return pa.table({"payload": payload})

    diff.map_batches(to_env, batch_format="pyarrow").write_json(out_dir)
    return out_dir


def to_debezium_lines(events: pa.Table, table: str = "files") -> list[str]:
    """Inverse transform for tests/fixtures: engine events → envelope
    JSONL lines (driver-side; fixture generation, not a pipeline stage)."""
    import json

    inv = {"insert": "c", "update": "u", "delete": "d"}
    out = []
    for row in events.to_pylist():
        image = {k: row[k] for k in ("repo", "path", "commit", "lang", "content")}
        op = inv[row["op"]]
        env = {
            "before": image if op == "d" else None,
            "after": None if op == "d" else image,
            "op": op,
            "ts_ms": 1_700_000_000_000 + row["seq"],
            "source": {"txId": row["epoch"], "lsn": row["seq"], "table": table},
        }
        out.append(json.dumps({"payload": env}))
    return out
