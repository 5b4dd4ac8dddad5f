"""Training-sequence packing and weighted corpus mixing.

Two operators a pretraining data pipeline runs after cleaning/dedup:

- ``pack_token_chunks``: the standard concat-and-chunk sequence packing —
  the token streams of all documents, ordered by doc_id, form ONE global
  stream cut every ``max_tokens``; each document learns its global token
  offset and the chunk range it spans.  The hard part at scale is the
  GLOBAL ORDERED PREFIX SUM over per-doc token counts; implemented as a
  two-level distributed prefix sum (per-bucket sums -> driver prefix of
  the bucket sums -> broadcast -> exact within-bucket offsets), never a
  global sort of the corpus and never a driver pass over per-doc rows.
- ``weighted_corpus_mix``: per-language sampling rates applied by
  DETERMINISTIC content-hash thresholding (sha256(text) prefix), so the
  mix is reproducible across runs/engines/partitionings and independent
  of row order — the property random sampling lacks.

Reference analog: the reference fixes its output record layout per table
(`python_etl` formatters); packing reframes that as the training-batch
layout problem.  Token semantics are the catalog's single-space split,
so DuckDB oracles reproduce both operators exactly.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray

#: coarse-partition constant shared with the rest of the engine
_PARTS = 64


def pack_token_chunks(
    docs: "ray.data.Dataset",
    max_tokens: int = 256,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_width: int = 4096,
) -> "ray.data.Dataset":
    """(doc_id, ntok, tok_start, chunk_start, chunk_end) per document.

    ``tok_start`` is the document's offset in the global token stream
    ordered by ``id_col``; chunks are fixed ``max_tokens`` windows of
    that stream (a document may span several — concat-and-chunk, not
    first-fit, which is what LLM pretraining actually does).

    Scale shape: per-doc token counts are one vectorized sweep; bucket
    (= ``doc_id // bucket_width``) sums flow through per-batch partials
    + coarse hash partitions and only |docs| / bucket_width rows reach
    the driver to build the prefix map (~20 MB at 10^10 docs with the
    4096 default; a second bucket level is the documented extension
    past that).  Exact per-doc offsets are then one vectorized
    sort+cumsum per coarse partition — all docs of a bucket co-locate
    because the partition key is derived from the bucket.
    """

    def count_batch(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ntok = pc.list_value_length(
            pc.split_pattern(t[text_col], " ")
        ).to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": ids,
                "ntok": ntok,
                "bucket": ids // bucket_width,
            }
        )

    counts = docs.select_columns([id_col, text_col]).map_batches(
        count_batch, batch_format="pyarrow"
    )

    # ---- level 1: bucket sums (partial per batch -> coarse partitions) --
    def bucket_partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"bucket": t["bucket"].to_pandas(),
                           "_s": t["ntok"].to_pandas()})
        g = df.groupby("bucket", sort=False)["_s"].sum().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def add_gp(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        return t.append_column("gp", pa.array(b % _PARTS))

    bucket_sums = (
        counts.map_batches(bucket_partial, batch_format="pyarrow")
        .map_batches(add_gp, batch_format="pyarrow", batch_size=65536)
        .groupby("gp")
        .map_groups(
            lambda g: g.groupby("bucket", sort=False)["_s"].sum().reset_index(),
            batch_format="pandas",
        )
        .to_pandas()
        .sort_values("bucket")
    )
    # prefix offset of each bucket = total tokens of all EARLIER buckets
    prefix = dict(
        zip(
            bucket_sums["bucket"].to_numpy(),
            (bucket_sums["_s"].cumsum() - bucket_sums["_s"]).to_numpy(),
        )
    )
    prefix_ref = ray.put(prefix)

    # ---- level 2: exact offsets within each bucket ----------------------
    def add_bp(t: pa.Table) -> pa.Table:
        b = t["bucket"].to_numpy(zero_copy_only=False)
        return t.append_column("bp", pa.array(b % _PARTS))

    def assign(g: pd.DataFrame, _ref=prefix_ref) -> pd.DataFrame:
        pre = ray.get(_ref)
        g = g.sort_values(["bucket", "doc_id"], kind="mergesort")
        within = g.groupby("bucket", sort=False)["ntok"].cumsum() - g["ntok"]
        base = g["bucket"].map(pre).astype("int64")
        start = (base + within).to_numpy()
        ntok = g["ntok"].to_numpy()
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "ntok": ntok,
                "tok_start": start,
                "chunk_start": start // max_tokens,
                "chunk_end": (start + np.maximum(ntok, 1) - 1) // max_tokens,
            }
        )

    return (
        counts.map_batches(add_bp, batch_format="pyarrow", batch_size=65536)
        .groupby("bp")
        .map_groups(assign, batch_format="pandas")
    )


#: power-of-two per-lang keep rates (fractions of 16 by first sha nibble)
#: — powers of two so the DuckDB oracle is a plain substr IN (...) test
DEFAULT_MIX_RATES = {"en": 1.0, "zh": 0.5, "es": 0.25}
DEFAULT_MIX_FLOOR = 0.125  # every other language


def weighted_corpus_mix(
    docs: "ray.data.Dataset",
    rates: dict | None = None,
    floor: float = DEFAULT_MIX_FLOOR,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    text_col: str = "text",
) -> "ray.data.Dataset":
    """Deterministic weighted mix: keep a doc iff its first sha256(text)
    hex nibble falls under its language's rate (rate = fraction of the
    16 nibble values; rates must be multiples of 1/16 — powers of two in
    practice).  Content-keyed, so the decision is stable under
    re-partitioning, replay and engine changes; no RNG anywhere."""
    from ..functions.hashing import sha256_hex_column
    from ..functions.threads import single_threaded_kernels

    rates = dict(DEFAULT_MIX_RATES if rates is None else rates)
    nibbles = "0123456789abcdef"

    def allowed(rate: float) -> list[str]:
        k = int(round(rate * 16))
        if not (0 <= k <= 16) or abs(rate * 16 - k) > 1e-9:
            raise ValueError(f"rate {rate} is not a multiple of 1/16")
        return list(nibbles[:k])

    allow_map = {lang: allowed(r) for lang, r in rates.items()}
    floor_allow = allowed(floor)

    def keep(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        sha = sha256_hex_column(t[text_col])
        nib = pc.utf8_slice_codeunits(sha, 0, 1)
        langs = t[lang_col]
        mask = np.zeros(t.num_rows, dtype=bool)
        lang_np = np.asarray(langs.to_pylist(), dtype=object)
        nib_np = np.asarray(nib.to_pylist(), dtype=object)
        for lang, allow in allow_map.items():
            mask |= (lang_np == lang) & np.isin(nib_np, allow)
        known = np.isin(lang_np, np.asarray(list(allow_map), dtype=object))
        mask |= ~known & np.isin(nib_np, floor_allow)
        out = t.filter(pa.array(mask))
        return pa.table({"doc_id": out[id_col], "lang": out[lang_col]})

    return docs.select_columns([id_col, lang_col, text_col]).map_batches(
        keep, batch_format="pyarrow"
    )
