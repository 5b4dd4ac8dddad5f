"""Benchmark decontamination: drop documents that share any n-token
shingle with a benchmark/eval set.

The standard pretraining-hygiene operator (the reference's anti-join →
dead-letter shape, J3 — the unmapped-code log of
``CMS_SynPuf_ETL_CDM_v5.py:966`` — applied to eval leakage): a document is
CONTAMINATED iff at least one of its word n-grams appears verbatim in
the benchmark corpus.  Everything is streaming set algebra on the
existing engine primitives — no broadcast of either side:

  doc_shingles(pool)  ⋉ (semi, on shingle)  doc_shingles(benchmark)
        -> contaminated doc ids
  pool  ▷ (anti, on id)  contaminated ids   -> clean corpus

Both joins are the task-based co-group ``hash_join``, so the benchmark
side may be arbitrarily large (it stays a Dataset end-to-end).  The
DEFAULT join key is the engine's 64-bit gram hash (vectorized FNV-1a
token hashes combined by a uint64 polynomial window roll — the
``_word_ngram_hashes`` construction of stages/dedup.py, here fully
batch-vectorized with document boundaries masked via list offsets): ~8x
less shuffle bandwidth than shingle strings, at a 2^-64-per-pair
false-drop risk (the same 64-bit argument as the n-gram Jaccard oracle,
stages/dedup.py:449).  ``key="string"`` joins the exact shingle text
instead — bit-perfect against any oracle, for audits.

Shingle construction is one vectorized sweep per batch: Arrow
split_pattern gives the token ListArray; the flat token buffer is
shingled by shifted pandas string adds with document boundaries masked
via the list offsets — no per-row Python loop.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def shingle_rows(
    batch: pa.Table, n: int = 5, id_col: str = "doc_id", text_col: str = "text",
    distinct: bool = True,
) -> pa.Table:
    """(id, shingle) rows: every n-token window of every document,
    deduped per document when ``distinct`` (membership semantics);
    ``distinct=False`` keeps multiplicity (repetition statistics)."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    toks = pc.split_pattern(batch[text_col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    lengths = offsets[1:] - offsets[:-1]
    ids = np.repeat(
        batch[id_col].to_numpy(zero_copy_only=False), lengths
    )
    ends = np.repeat(offsets[1:], lengths)  # exclusive end of own doc
    s = pd.Series(flat.to_pandas().to_numpy(), dtype="object")
    shingle = s.copy()
    for i in range(1, n):
        shingle = shingle + " " + s.shift(-i)
    idx = np.arange(len(s))
    valid = idx + n <= ends  # window stays inside its document
    out = pd.DataFrame({id_col: ids[valid], "shingle": shingle.to_numpy()[valid]})
    if distinct:
        out = out.drop_duplicates()
    return pa.table(
        {
            id_col: pa.array(out[id_col].to_numpy(), type=batch[id_col].type),
            "shingle": pa.array(out["shingle"].tolist(), type=pa.string()),
        }
    )


def shingle_hash_rows(
    batch: pa.Table, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    """(id, gh) rows: the 64-bit hash of every n-token window, deduped
    per document.  One vectorized sweep per batch: FNV-1a over the flat
    token buffer, then an n-wide uint64 polynomial roll with windows
    crossing document boundaries masked out — no per-document Python."""
    from ..functions.text import fingerprint_column
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    toks = pc.split_pattern(batch[text_col], " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    lengths = offsets[1:] - offsets[:-1]
    ids = np.repeat(batch[id_col].to_numpy(zero_copy_only=False), lengths)
    ends = np.repeat(offsets[1:], lengths)
    m = len(ids)
    th = np.zeros(m, dtype=np.uint64)
    if m:
        th[:] = (
            fingerprint_column(flat).to_numpy(zero_copy_only=False).view(np.uint64)
        )
    h = th.copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            shifted = np.zeros(m, dtype=np.uint64)
            shifted[: m - j] = th[j:]
            h = h * np.uint64(1099511628211) ^ shifted
    idx = np.arange(m)
    valid = idx + n <= ends
    out = pd.DataFrame({id_col: ids[valid], "gh": h[valid].view(np.int64)})
    out = out.drop_duplicates()
    return pa.table(
        {
            id_col: pa.array(out[id_col].to_numpy(), type=batch[id_col].type),
            "gh": pa.array(out["gh"].to_numpy(), type=pa.int64()),
        }
    )


def contaminated_ids(
    pool: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_type: pa.DataType = None,
    num_partitions: int = 16,
    key: str = "hash",
) -> "ray.data.Dataset":
    """Distinct-enough pool ids sharing >=1 shingle with the benchmark
    (rows may repeat across partitions — harmless for the anti-join)."""
    from .join import hash_join

    id_type = id_type or pa.int64()
    if key == "hash":
        kernel, kcol, ktype = shingle_hash_rows, "gh", pa.int64()
    else:
        kernel, kcol, ktype = shingle_rows, "shingle", pa.string()
    sh_schema = pa.schema([(id_col, id_type), (kcol, ktype)])
    pool_sh = pool.map_batches(
        kernel, batch_format="pyarrow",
        fn_kwargs=dict(n=n, id_col=id_col, text_col=text_col),
    )
    bench_sh = benchmark.map_batches(
        kernel, batch_format="pyarrow",
        fn_kwargs=dict(n=n, id_col=id_col, text_col=text_col),
    ).select_columns([kcol])
    hits = hash_join(
        pool_sh, bench_sh, on=kcol, how="semi",
        num_partitions=num_partitions,
        left_schema=sh_schema,
        right_schema=pa.schema([(kcol, ktype)]),
    )

    def distinct_ids(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        u = pc.unique(t[id_col])
        return pa.table({id_col: u})

    return hits.map_batches(distinct_ids, batch_format="pyarrow")


def decontaminate(
    pool: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
    pool_schema: Optional[pa.Schema] = None,
    num_partitions: int = 16,
    key: str = "hash",
) -> "ray.data.Dataset":
    """The clean corpus: pool minus contaminated documents."""
    from .join import hash_join

    id_type = (pool_schema or pa.schema([(id_col, pa.int64())])).field(id_col).type
    hits = contaminated_ids(
        pool, benchmark, n=n, id_col=id_col, text_col=text_col,
        id_type=id_type, num_partitions=num_partitions, key=key,
    )
    return hash_join(
        pool, hits, on=id_col, how="anti", num_partitions=num_partitions,
        left_schema=pool_schema,
        right_schema=pa.schema([(id_col, id_type)]),
    )
