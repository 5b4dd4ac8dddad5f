"""MergeApplier — the stateful actor-pool stage that applies LWW upserts
to the lake, one hash partition per call.

Reference analog: the per-beneficiary driver loop + visit identity index +
emit-once sets (``CMS_SynPuf_ETL_CDM_v5.py:2057-2087``, ``:541-590``) —
the state that the reference holds in process-wide dicts lives here
per-partition: the prior lake files (base + merge-on-read deltas), the
epoch fence, and the schema registry.  The ingest hot path runs the
task-form ``apply_group`` (cheap per-group construction); the class form
suits actor pools (``map_groups(MergeApplier, concurrency=N)``) when
per-actor state is heavy.  Each call receives the complete event group
of one ``part_id`` after the hash shuffle.

Exactly-once: events with epoch <= the partition's fence are dropped
(they were applied by a previous commit — replayed input is a no-op);
output files carry deterministic names (parquet-bytes hash), so retried
tasks rewrite identical bytes.  The delete-resurrection hazard (a
replayed pre-delete insert re-creating a deleted key) is exactly what the
fence prevents — no persisted tombstones needed.
"""

from __future__ import annotations

import json
import hashlib
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..schema import SchemaRegistry
from .lww import drop_tombstones, lww_reduce
from .normalize import split_dead_letter

#: Columns the applier returns to the driver — one row per partition, the
#: future manifest entry plus commit metrics.
RESULT_SCHEMA = pa.schema(
    [
        ("part_id", pa.int32()),
        ("file", pa.string()),
        ("rows", pa.int64()),
        ("applied_through_epoch", pa.int64()),
        ("content_hash", pa.string()),
        ("schema_version", pa.int64()),
        ("dead_file", pa.string()),
        ("dead_rows", pa.int64()),
        ("dead_reasons", pa.string()),  # JSON {reason: count}
        ("events_shuffled", pa.int64()),
        ("events_applied", pa.int64()),
        ("delta_files", pa.list_(pa.string())),
        ("stats", pa.string()),  # JSON zone map {col: [min, max]}
    ]
)

_EVENT_META = ["op", "part_id"]  # event-only columns, not persisted in the lake


#: dictionary-stat caps: a string column qualifies only while its
#: per-partition distinct set stays tiny (lang/status/category shapes);
#: content-like columns blow past these and record nothing
_DICT_MAX_VALUES = 8
_DICT_MAX_VALUE_BYTES = 64


def _column_stats(t: pa.Table) -> dict:
    """Per-column pruning stats of a written partition table:

    - int/float columns -> ``[min, max]`` zone map
    - string columns with <= 8 short distinct values -> ``{"in": [...]}``
      dictionary (equality pruning for lang/category-shaped columns)

    Content-like columns (binary, or strings over the caps) record
    nothing.  Empty table -> {} (= unknown; readers must not prune)."""
    out: dict = {}
    if t.num_rows == 0:
        return out
    for field_ in t.schema:
        if pa.types.is_integer(field_.type) or pa.types.is_floating(field_.type):
            mm = pc.min_max(t[field_.name])
            lo, hi = mm["min"].as_py(), mm["max"].as_py()
            if lo is None:  # all-null column
                continue
            out[field_.name] = [lo, hi]
        elif pa.types.is_string(field_.type) or pa.types.is_large_string(field_.type):
            # cheap distinct probe; drop_null — null presence never blocks
            # equality pruning (an eq predicate cannot match null)
            vals = pc.unique(t[field_.name]).drop_null()
            if len(vals) == 0 or len(vals) > _DICT_MAX_VALUES:
                continue
            pys = sorted(vals.to_pylist())
            if any(len(v.encode()) > _DICT_MAX_VALUE_BYTES for v in pys):
                continue
            out[field_.name] = {"in": pys}
    return out


def _widen_stats(prior: dict, extra: dict) -> dict:
    """Conservative MOR widen: only columns known in BOTH summaries keep
    stats (a column absent from the prior is unknown over the base rows,
    so claiming the delta's bounds would be WRONG, not just loose).
    Ranges take the interval union; dictionaries take the set union,
    dropping the column entirely once it outgrows the cap (= unknown).
    Mixed kinds (schema drift) also drop — unknown beats wrong."""
    out: dict = {}
    for c in prior.keys() & extra.keys():
        p, e = prior[c], extra[c]
        if isinstance(p, list) and isinstance(e, list):
            out[c] = [min(p[0], e[0]), max(p[1], e[1])]
        elif isinstance(p, dict) and isinstance(e, dict):
            u = sorted(set(p["in"]) | set(e["in"]))
            if len(u) <= _DICT_MAX_VALUES:
                out[c] = {"in": u}
    return out


def _write_deterministic(table: pa.Table, directory: str, stem: str) -> tuple[str, str]:
    """Write parquet to a content-addressed name; returns (filename, sha16).

    Deterministic bytes: table content is deterministic (sorted) and the
    writer options are fixed, so every retry produces the same file name
    and bytes; os.replace makes concurrent attempts safe.
    """
    os.makedirs(directory, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=directory, prefix=".tmp-")
    os.close(fd)
    # 128Ki-row row groups: partitions are key-sorted, so parquet
    # row-group stats give the key/value predicate pushdown
    # (load_partition_live key_filters, range/eq_scan delta-free push)
    # intra-file skipping to work with — one giant row group per file
    # would make every pushdown read the whole partition anyway.
    # Fixed option => file bytes stay deterministic (content addressing).
    pq.write_table(table, tmp, compression="zstd", data_page_version="2.0",
                   row_group_size=131072)
    h = hashlib.sha256()
    with open(tmp, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    sha16 = h.hexdigest()[:16]
    final = os.path.join(directory, f"{stem}-{sha16}.parquet")
    os.replace(tmp, final)
    return final, sha16


class MergeApplier:
    def __init__(self, lake_root: str, fences: dict, registry_json: str,
                 target_schema_version: int, prior_meta: dict | None = None,
                 commit_mode: str = "cow", max_deltas: int = 8):
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        self.lake_root = lake_root
        self.fences = fences  # part_id -> (applied_through_epoch, prior_file|None)
        self.registry = SchemaRegistry.from_json(registry_json)
        self.target_version = target_schema_version
        self.lake_schema = self.registry.schema_for(target_schema_version)
        self.commit_mode = commit_mode  # cow: rewrite partition; mor: append delta
        self.max_deltas = max_deltas  # mor partitions auto-compact at this depth
        # prior manifest metadata for the replay-no-op fast path + deltas
        prior_meta = prior_meta or {}
        self._prior_rows = {p: m[0] for p, m in prior_meta.items()}
        self._prior_hash = {p: m[1] for p, m in prior_meta.items()}
        self._prior_schema_version = {p: m[2] for p, m in prior_meta.items()}
        self._prior_deltas = {
            p: list(m[3]) if len(m) > 3 else [] for p, m in prior_meta.items()
        }
        self._prior_stats = {
            p: dict(m[4]) if len(m) > 4 else {} for p, m in prior_meta.items()
        }

    def _with_op(self, t: pa.Table, default_op: str = "insert") -> pa.Table:
        if "op" in t.column_names:
            return t
        return t.append_column("op", pa.array([default_op] * t.num_rows))

    def _prior_table(self, part_id: int) -> pa.Table | None:
        """Prior LIVE state of the partition: LWW(base ∪ deltas), tombstones
        dropped (fencing makes persisted tombstones unnecessary once
        merged — see module docstring)."""
        _, prior_file = self.fences.get(part_id, (-1, None))
        deltas = self._prior_deltas.get(part_id, [])
        tables = []
        if prior_file:
            base = pq.read_table(os.path.join(self.lake_root, prior_file))
            tables.append(self._with_op(self.registry.evolve_table(base, self.target_version)))
        for rel in deltas:
            d = pq.read_table(os.path.join(self.lake_root, rel))
            op = d["op"]
            d = self.registry.evolve_table(d, self.target_version).append_column("op", op)
            tables.append(d)
        if not tables:
            return None
        merged = lww_reduce(pa.concat_tables(tables, promote_options="default"))
        return drop_tombstones(merged).drop_columns(["op"])

    def __call__(self, group: pa.Table) -> pa.Table:
        part_id = group["part_id"][0].as_py()
        fence, _ = self.fences.get(part_id, (-1, None))
        events_shuffled = group.num_rows

        valid, dead = split_dead_letter(group)

        dead_file, dead_rows, dead_reasons = None, dead.num_rows, "{}"
        if dead_rows:
            if "dead_reason" in dead.column_names:
                vc = pc.value_counts(pc.fill_null(dead["dead_reason"],
                                                  "unknown"))
                dead_reasons = json.dumps(
                    {d["values"]: d["counts"] for d in vc.to_pylist()},
                    sort_keys=True,
                )
            # dead rows may have null epoch (that can be WHY they are dead)
            max_dead_epoch = pc.max(dead["epoch"]).as_py()
            stem_epoch = max_dead_epoch if max_dead_epoch is not None else 0
            fname, _sha = _write_deterministic(
                dead.drop_columns(["part_id"]),
                os.path.join(self.lake_root, "deadletter", f"part={part_id:05d}"),
                f"e{stem_epoch:010d}",
            )
            dead_file = os.path.relpath(fname, self.lake_root)

        # epoch fence: drop events already applied by an earlier commit
        fresh = valid.filter(pc.greater(valid["epoch"], pa.scalar(fence, type=pa.int64())))
        applied = fresh.num_rows
        new_fence = fence
        if applied:
            new_fence = max(fence, pc.max(fresh["epoch"]).as_py())

        if applied == 0:
            # replay no-op: nothing fresh for this partition — keep the
            # prior file untouched instead of re-merging and rewriting
            # identical bytes (makes full-stream replay ~free)
            prior_state = self.fences.get(part_id, (-1, None))
            prior_rows = self._prior_rows.get(part_id, 0)
            return pa.table(
                {
                    "part_id": pa.array([part_id], type=pa.int32()),
                    "file": [prior_state[1]],
                    "rows": pa.array([prior_rows], type=pa.int64()),
                    "applied_through_epoch": pa.array([fence], type=pa.int64()),
                    "content_hash": [self._prior_hash.get(part_id, "")],
                    "schema_version": pa.array(
                        [self._prior_schema_version.get(part_id, self.target_version)],
                        type=pa.int64(),
                    ),
                    "dead_file": [dead_file],
                    "dead_rows": pa.array([dead_rows], type=pa.int64()),
                    "dead_reasons": [dead_reasons],
                    "events_shuffled": pa.array([events_shuffled], type=pa.int64()),
                    "events_applied": pa.array([0], type=pa.int64()),
                    "delta_files": [self._prior_deltas.get(part_id, [])],
                    "stats": [json.dumps(self._prior_stats.get(part_id, {}),
                                         sort_keys=True)],
                },
                schema=RESULT_SCHEMA,
            )
        incoming = lww_reduce(fresh)

        # ---- merge-on-read: append a delta instead of rewriting the base
        base_file = self.fences.get(part_id, (-1, None))[1]
        prior_deltas = self._prior_deltas.get(part_id, [])
        if (
            self.commit_mode == "mor"
            and base_file
            and len(prior_deltas) + 1 < self.max_deltas
        ):
            delta = self.registry.evolve_table(incoming, self.target_version)
            delta = delta.append_column("op", incoming["op"])
            delta = delta.take(
                pc.sort_indices(delta, sort_keys=[("repo", "ascending"), ("path", "ascending")])
            )
            fname, dsha = _write_deterministic(
                delta,
                os.path.join(self.lake_root, "data", f"part={part_id:05d}"),
                f"delta-e{new_fence:010d}",
            )
            # widen the zone map with the delta's bounds (tombstones too —
            # conservative over-approximation, tightened at compaction)
            mor_stats = _widen_stats(
                self._prior_stats.get(part_id, {}),
                _column_stats(delta.drop_columns(["op"])),
            )
            return pa.table(
                {
                    "part_id": pa.array([part_id], type=pa.int32()),
                    "file": [base_file],
                    "rows": pa.array([-1], type=pa.int64()),  # unknown until compaction
                    "applied_through_epoch": pa.array([new_fence], type=pa.int64()),
                    "content_hash": [dsha],
                    "schema_version": pa.array([self.target_version], type=pa.int64()),
                    "dead_file": [dead_file],
                    "dead_rows": pa.array([dead_rows], type=pa.int64()),
                    "dead_reasons": [dead_reasons],
                    "events_shuffled": pa.array([events_shuffled], type=pa.int64()),
                    "events_applied": pa.array([applied], type=pa.int64()),
                    "delta_files": [prior_deltas + [os.path.relpath(fname, self.lake_root)]],
                    "stats": [json.dumps(mor_stats, sort_keys=True)],
                },
                schema=RESULT_SCHEMA,
            )
        # cow (or mor compaction at max_deltas): full merge + base rewrite
        prior = self._prior_table(part_id)
        if prior is not None:
            # prior rows re-enter the reduce as op='insert' at their stored
            # (epoch, seq) version — LWW then merges old state and new events
            prior = prior.append_column("op", pa.array(["insert"] * prior.num_rows))
            inc = self.registry.evolve_table(incoming, self.target_version)
            inc = inc.append_column("op", incoming["op"])
            merged = lww_reduce(pa.concat_tables([prior, inc], promote_options="default"))
        else:
            merged = self.registry.evolve_table(incoming, self.target_version)
            merged = merged.append_column("op", incoming["op"])

        live = drop_tombstones(merged).drop_columns(["op"])
        live = live.select(self.lake_schema.names).cast(self.lake_schema)
        live = live.take(
            pc.sort_indices(live, sort_keys=[("repo", "ascending"), ("path", "ascending")])
        )

        file_rel, content_hash = None, ""
        if live.num_rows:
            fname, content_hash = _write_deterministic(
                live,
                os.path.join(self.lake_root, "data", f"part={part_id:05d}"),
                f"e{new_fence:010d}",
            )
            file_rel = os.path.relpath(fname, self.lake_root)

        return pa.table(
            {
                "part_id": pa.array([part_id], type=pa.int32()),
                "file": [file_rel],
                "rows": pa.array([live.num_rows], type=pa.int64()),
                "applied_through_epoch": pa.array([new_fence], type=pa.int64()),
                "content_hash": [content_hash],
                "schema_version": pa.array([self.target_version], type=pa.int64()),
                "dead_file": [dead_file],
                "dead_rows": pa.array([dead_rows], type=pa.int64()),
                    "dead_reasons": [dead_reasons],
                "events_shuffled": pa.array([events_shuffled], type=pa.int64()),
                "events_applied": pa.array([applied], type=pa.int64()),
                "delta_files": [[]],  # base rewrite folds all deltas
                "stats": [json.dumps(_column_stats(live), sort_keys=True)],
            },
            schema=RESULT_SCHEMA,
        )


def apply_group(group: pa.Table, *, lake_root: str, fences: dict, registry_json: str,
                target_schema_version: int, prior_meta: dict | None = None,
                commit_mode: str = "cow", max_deltas: int = 8) -> pa.Table:
    """Task-form merge apply (ingest hot path): per-group construction of
    the applier state costs sub-ms (a small JSON parse + dict copies),
    while an actor pool pays multi-second spin-up per pipeline.  Use the
    MergeApplier class via map_groups(..., concurrency=N) only when the
    per-actor state is genuinely heavy."""
    ap = MergeApplier(lake_root, fences, registry_json, target_schema_version,
                      prior_meta, commit_mode=commit_mode, max_deltas=max_deltas)
    return ap(group)
