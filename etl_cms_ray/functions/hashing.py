"""Hashing kernels used across the engine.

- ``sha256_column``: per-row sha256 of a string/binary Arrow column.  The
  per-row invariant the whole engine is judged on (BASELINE.json
  ``input_hint``).  hashlib's C core does the work; the Python loop is the
  thin driver and runs distributed inside ``map_batches``.
- ``part_id_for``: stable hash partition of the (repo, path) key, via
  the vectorized numpy FNV-1a kernel (functions/text.py) — stable across
  processes, Python versions and runs (checkpoints and fences are
  per-partition, so the partitioner may NEVER change for an existing
  lake; stability is a correctness requirement, not a nicety).
- ``canonical_table_hash``: order-insensitive content hash of a table,
  used by manifests and the golden-comparison tests (the analog of the
  reference's expected-output CSV diffs, ``python_etl/README.md:133-146``).
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_EMPTY_SHA = hashlib.sha256(b"").digest()

#: Engine ABI: the key->partition function identity.  Persisted in every
#: manifest; ingest refuses a lake whose recorded partitioner differs
#: (fences and prior state are per-partition — applying events through a
#: different partitioner silently duplicates keys and breaks replay).
PARTITIONER_ID = "fnv1a64"


def sha256_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """sha256 digest (binary(32)) per row; null in -> null out."""
    sha = hashlib.sha256
    out: list[bytes | None] = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        if pa.types.is_string(chunk.type) or pa.types.is_large_string(chunk.type):
            chunk = chunk.cast(pa.large_binary())
        out.extend(sha(v.as_py()).digest() if v.is_valid else None for v in chunk)
    return pa.array(out, type=pa.binary(32))


def sha256_hex_column(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Hex form, for human-readable outputs and DuckDB ``sha256()`` parity."""
    sha = hashlib.sha256
    out: list[str | None] = []
    chunks = col.chunks if isinstance(col, pa.ChunkedArray) else [col]
    for chunk in chunks:
        if pa.types.is_string(chunk.type) or pa.types.is_large_string(chunk.type):
            chunk = chunk.cast(pa.large_binary())
        out.extend(sha(v.as_py()).hexdigest() if v.is_valid else None for v in chunk)
    return pa.array(out, type=pa.string())


def key_array(repo: pa.ChunkedArray | pa.Array, path: pa.ChunkedArray | pa.Array) -> pa.Array:
    """The composite upsert key as one string column (NUL separator —
    paths are posix-ish and never contain NUL)."""
    arr = pc.binary_join_element_wise(repo, path, "\x00")
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    return arr


def part_id_for(repo, path, num_partitions: int) -> pa.Array:
    """Stable partition id per row: fnv1a64(repo \\0 path) % num_partitions.

    Fully vectorized (no per-row Python on the ingest hot path): the
    numpy byte-position FNV kernel hashes the whole key column, then one
    modulo.  Must stay equal to ``part_id_one`` row-for-row.
    """
    from .text import fingerprint_column

    keys = key_array(repo, path)
    h = fingerprint_column(keys).to_numpy(zero_copy_only=False).view(np.uint64)
    return pa.array((h % np.uint64(num_partitions)).astype(np.int32), type=pa.int32())


def part_id_one(repo: str, path: str, num_partitions: int) -> int:
    from .text import fingerprint64

    return fingerprint64(f"{repo}\x00{path}") % num_partitions


def canonical_table_hash(t: pa.Table, sort_keys: list[str] | None = None) -> str:
    """Deterministic hash of a table's content, independent of row order.

    Rows are serialized in sorted-key order; column order is by name.
    """
    if t.num_rows == 0:
        return hashlib.sha256(b"empty").hexdigest()
    t = t.select(sorted(t.column_names))
    keys = sort_keys or t.column_names
    t = t.take(pc.sort_indices(t, sort_keys=[(k, "ascending") for k in keys]))
    h = hashlib.sha256()
    # names+types only: parquet round-trips attach schema metadata that must
    # not affect content equality
    h.update(";".join(f"{f.name}:{f.type}" for f in t.schema).encode())
    for batch in t.to_batches():
        for col in batch.columns:
            for v in col:
                h.update(repr(v.as_py() if v.is_valid else None).encode())
            h.update(b"\x1f")
    return h.hexdigest()
