"""Inverted token index over the lake: bucket-bitmap file skipping for
token search.

The zone-map / dictionary stats (stages/applier.py) prune partitions by
VALUE range or small value sets; neither helps "which partitions contain
a document mentioning X".  This module adds the third pruning family —
a per-partition token-bucket bitmap:

- ``build_token_index`` runs one streaming pass over the live lake (one
  task per partition, the audit/scan shape), space-tokenizes the target
  column, hashes every distinct token (the engine's vectorized fnv1a64),
  and sets bit ``hash % num_buckets`` in that partition's bitmap.  The
  index is #partitions x (num_buckets/8) bytes — 512 B/partition at the
  4096-bucket default, 32 MB for a 64Ki-partition lake — written as ONE
  parquet under ``_index/`` with the manifest version it describes
  (tmp + atomic rename, the manifest discipline).
- ``token_search`` prunes to partitions whose bit for the probe token is
  set.  An unset bit PROVES absence (no token of that hash bucket occurs
  in the partition); a set bit may be a hash collision, so the exact
  membership predicate is re-applied after the MOR-aware merge — same
  conservative contract as range_scan/eq_scan: pruning decides how
  little gets read, never the answer.
- Staleness is decided PER PARTITION by state identity, never by
  manifest version number: versions are reused after rollback +
  roll-forward (state/manifest.py rollback releases the claim), so an
  index built at old version N could otherwise validate against a
  different roll-forward state also numbered N and prune partitions
  that now contain the token.  Data files are immutable and
  content-addressed, so a matching ``state_id`` (sha1 of base file +
  delta chain) PROVES the bitmap describes the current rows; any
  mismatched or missing partition is included in the plan
  unconditionally (reported as ``stale``) — pruning still never
  decides the answer, and a partially-stale index keeps pruning the
  unchanged partitions instead of falling back wholesale.

Token semantics are the catalog's single-space split, so the DuckDB
mirror is ``list_contains(string_split(content, ' '), token)`` exactly.
"""

from __future__ import annotations

import json
import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..state.manifest import LakeStore
from ..schema import SchemaRegistry
from .ingest import load_partition_live

_INDEX_REL = os.path.join("_index", "tokens.parquet")


def _index_path(lake_root: str) -> str:
    return os.path.join(lake_root, _INDEX_REL)


def _state_id(ps) -> str:
    """Identity of a partition's LIVE state: data files are immutable and
    content-addressed, so (base file, delta chain) determines the rows
    exactly — the incremental rebuild's reuse key."""
    import hashlib

    raw = (ps.file or "") + "|" + "|".join(ps.deltas or [])
    return hashlib.sha1(raw.encode()).hexdigest()[:16]


def build_token_index(
    lake_root: str, column: str = "content", num_buckets: int = 4096,
    incremental: bool = True,
) -> dict:
    """One pass over the live lake -> ``_index/tokens.parquet``.

    ``incremental`` (default): partitions whose (base file, delta chain)
    is unchanged since the existing index was built REUSE their bitmap —
    a refresh after a commit costs O(changed partitions), the same cost
    class as the changelog.  The index version always advances to the
    CURRENT manifest, so token_plan's staleness check passes after every
    refresh.  Returns {"version", "num_buckets", "partitions",
    "set_bits", "rebuilt", "reused"}.
    """
    import ray

    assert num_buckets % 8 == 0
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    reg_json = registry.to_json()

    reuse: dict[int, bytes] = {}
    if incremental and os.path.exists(_index_path(lake_root)):
        old = pq.read_table(_index_path(lake_root))
        old_meta = json.loads(old.schema.metadata[b"token_index"].decode())
        if (old_meta.get("column") == column
                and int(old_meta.get("num_buckets", -1)) == num_buckets
                and "state_id" in old.column_names):
            old_state = dict(zip(old["part_id"].to_pylist(),
                                 old["state_id"].to_pylist()))
            old_bm = dict(zip(old["part_id"].to_pylist(),
                              old["bitmap"].to_pylist()))
            for pid, ps in manifest.partitions.items():
                if (ps.file or ps.deltas) and old_state.get(pid) == _state_id(ps):
                    reuse[pid] = old_bm[pid]

    live = {pid: ps for pid, ps in sorted(manifest.partitions.items())
            if ps.file or ps.deltas}
    plan = [
        {"part_id": pid, "file": ps.file, "deltas": list(ps.deltas)}
        for pid, ps in live.items()
        if pid not in reuse
    ]

    def bitmap_partition(batch: pa.Table) -> pa.Table:
        from ..functions.text import fingerprint_column
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        reg = SchemaRegistry.from_json(reg_json)
        pids, maps = [], []
        for pid, f0, ds_ in zip(
            batch["part_id"].to_pylist(),
            batch["file"].to_pylist(),
            batch["deltas"].to_pylist(),
        ):
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
            bits = np.zeros(num_buckets // 8, dtype=np.uint8)
            col = t[column]
            if not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            toks = pc.list_flatten(pc.split_pattern(col, " "))
            if len(toks) > 0:
                toks = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
                uniq = pc.unique(toks)
                h = fingerprint_column(uniq).to_numpy(zero_copy_only=False).view(
                    np.uint64
                )
                b = (h % np.uint64(num_buckets)).astype(np.int64)
                np.bitwise_or.at(bits, b // 8, (1 << (b % 8)).astype(np.uint8))
            pids.append(pid)
            maps.append(bits.tobytes())
        return pa.table(
            {
                "part_id": pa.array(pids, type=pa.int32()),
                "bitmap": pa.array(maps, type=pa.binary(num_buckets // 8)),
            }
        )

    fresh: dict[int, bytes] = {}
    if plan:
        rows = (
            ray.data.from_items(plan)
            .map_batches(bitmap_partition, batch_format="pyarrow", batch_size=1)
            .take_all()
        )
        fresh = {r["part_id"]: r["bitmap"] for r in rows}
    bitmaps = {**reuse, **fresh}
    pids = sorted(bitmaps)
    t = pa.table(
        {
            "part_id": pa.array(pids, type=pa.int32()),
            "bitmap": pa.array(
                [bitmaps[p] for p in pids], type=pa.binary(num_buckets // 8)
            ),
            "state_id": pa.array(
                [_state_id(live[p]) for p in pids], type=pa.string()
            ),
        }
    )
    meta = {
        "version": manifest.version,
        "num_buckets": num_buckets,
        "column": column,
        "partitioner": "fnv1a64",
    }
    t = t.replace_schema_metadata({"token_index": json.dumps(meta)})
    os.makedirs(os.path.dirname(_index_path(lake_root)), exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(_index_path(lake_root)))
    os.close(fd)
    pq.write_table(t, tmp)
    os.replace(tmp, _index_path(lake_root))
    set_bits = int(
        sum(bin(int.from_bytes(b, "little")).count("1") for b in bitmaps.values())
    )
    return {
        "version": manifest.version,
        "num_buckets": num_buckets,
        "partitions": len(pids),
        "set_bits": set_bits,
        "rebuilt": len(fresh),
        "reused": len(reuse),
    }


def token_plan(
    lake_root: str, token: str, column: str = "content"
) -> tuple[list[dict], dict]:
    """Pruned partition plan for ``token``; (plan, info) where info
    reports {"pruned", "total", "fallback", "stale"}.  Missing index or
    an index built over a DIFFERENT column -> full plan (``fallback``);
    a partition whose stored ``state_id`` does not match the CURRENT
    manifest's (base file, delta chain) is counted ``stale`` and kept in
    the plan unconditionally — never trust a bitmap for rows it was not
    built over.  Manifest version numbers are deliberately NOT used for
    trust: they are reused after rollback + roll-forward, so two
    different lake states can share a version (conservative: never a
    wrong answer, only a bigger read)."""
    from ..functions.text import fingerprint64

    if " " in token:
        # the index is built over single-space-split tokens; a multi-word
        # probe's bit was never set, so pruning would change the ANSWER
        # depending on index freshness instead of just the read size
        raise ValueError("token_plan/token_search probe must be a single token")
    store = LakeStore(lake_root)
    manifest = store.load_manifest()
    live = {pid: ps for pid, ps in sorted(manifest.partitions.items())
            if ps.file or ps.deltas}
    full = [
        {"part_id": pid, "file": ps.file, "deltas": list(ps.deltas)}
        for pid, ps in live.items()
    ]
    info = {"total": len(full), "pruned": 0, "fallback": True, "stale": 0}
    path = _index_path(lake_root)
    if not os.path.exists(path):
        return full, info
    t = pq.read_table(path)
    meta = json.loads(t.schema.metadata[b"token_index"].decode())
    if meta.get("column") != column or "state_id" not in t.column_names:
        return full, info  # an index over a different column / pre-state_id
    nb = int(meta["num_buckets"])
    bucket = fingerprint64(token) % nb
    byte_i, bit = bucket // 8, 1 << (bucket % 8)
    idx_state = dict(zip(t["part_id"].to_pylist(), t["state_id"].to_pylist()))
    idx_bm = dict(zip(t["part_id"].to_pylist(), t["bitmap"].to_pylist()))
    keep, stale = set(), 0
    for pid, ps in live.items():
        if idx_state.get(pid) != _state_id(ps):
            keep.add(pid)  # changed since indexing: cannot prune
            stale += 1
        elif idx_bm[pid][byte_i] & bit:
            keep.add(pid)
    plan = [p for p in full if p["part_id"] in keep]
    return plan, {"total": len(full), "pruned": len(full) - len(plan),
                  "fallback": False, "stale": stale}


def token_search(
    lake_root: str,
    token: str,
    columns: list[str] | None = None,
    column: str = "content",
    plan: list[dict] | None = None,
) -> "ray.data.Dataset":
    """Live lake rows whose ``column`` token list contains ``token``,
    reading only the partitions the bitmap cannot rule out.  Pass a
    precomputed ``plan`` from ``token_plan`` to avoid re-reading the
    index (the CLI does; the plan must be for the same token/column)."""
    import ray

    store = LakeStore(lake_root)
    registry = store.load_registry()
    latest = registry.latest_version
    schema = registry.schema_for(latest)
    out_names = list(columns or schema.names)
    if plan is None:
        plan, _info = token_plan(lake_root, token, column=column)
    if not plan:
        return ray.data.from_arrow(
            pa.table({n: pa.array([], type=schema.field(n).type) for n in out_names})
        )
    reg_json = registry.to_json()
    needle = f" {token} "

    def fetch(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_ in zip(batch["file"].to_pylist(), batch["deltas"].to_pylist()):
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg, latest)
            col = t[column]
            if not pa.types.is_string(col.type):
                col = col.cast(pa.string())
            padded = pc.binary_join_element_wise(" ", col, " ", "")
            mask = pc.match_substring(padded, needle)
            out.append(t.filter(mask).select(out_names))
        return pa.concat_tables(out)

    return ray.data.from_items(plan).map_batches(
        fetch, batch_format="pyarrow", batch_size=1
    )
