"""Deduplication operators over a document Dataset.

- exact_dedup: hash-partition by content sha256 -> per-group first
  (reference analog: visit dedup on a composite key + emit-once sets,
  ``CMS_SynPuf_ETL_CDM_v5.py:541-590``), with a per-batch partial reduce
  so the shuffle moves one row per (sha, batch) instead of every row.
- minhash_lsh_pairs: shingle -> minhash -> banded LSH buckets ->
  candidate pairs -> exact-Jaccard verify (broadcast text lookup).
- simhash_pairs: 64-bit simhash, 16-bit band buckets, hamming verify.

Heavy-state stages (minhash permutation matrices, broadcast text maps)
are map_batches callable classes (actor pools) so state loads once per
actor; pair generation and reductions run as vectorized sweeps over
coarse hash partitions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
import ray.data

from ..functions.hashing import sha256_hex_column
from ..functions.minhash import MinHasher, char_shingles, simhash64


# ---------------------------------------------------------------------------
# Exact dedup


def exact_dedup_groups(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """One row per distinct text: keep_id = min id, n_dups = group size.

    Partial-aggregates inside map_batches (combiner) before the groupby so
    the all-to-all exchange carries pre-reduced rows.
    """

    def partial(batch: pa.Table) -> pa.Table:
        sha = sha256_hex_column(batch[text_col])
        df = pd.DataFrame({"content_sha": sha.to_pandas(), id_col: batch[id_col].to_pandas()})
        g = df.groupby("content_sha", sort=False).agg(
            _min_id=(id_col, "min"), _n=(id_col, "size")
        )
        return pa.Table.from_pandas(g.reset_index(), preserve_index=False)

    def add_sha_part(t: pa.Table) -> pa.Table:
        import zlib

        crc = zlib.crc32
        part = np.fromiter(
            (crc(s.encode()) % _PAIR_PARTS for s in t["content_sha"].to_pylist()),
            dtype=np.int64,
            count=t.num_rows,
        )
        return t.append_column("sha_part", pa.array(part))

    def final(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("content_sha", sort=False).agg(
            keep_id=("_min_id", "min"), n_dups=("_n", "sum")
        )
        return out.reset_index()

    # unbounded key space -> a real hash shuffle is required, but on the
    # coarse sha_part key: ~_PAIR_PARTS groups, each reduced by ONE
    # vectorized pandas groupby (Ray's Aggregate operator costs ~300ms
    # per block regardless of size; per-sha map_groups would be one
    # Python call per distinct document)
    ds = ds.select_columns([id_col, text_col]).map_batches(
        partial, batch_format="pyarrow", batch_size=4096
    )
    ds = ds.map_batches(add_sha_part, batch_format="pyarrow",
                        batch_size=65536)
    return ds.groupby("sha_part").map_groups(final, batch_format="pandas")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup


def minhash_band_batch(batch: pa.Table, *, num_perm: int = 128, bands: int = 32,
                       shingle_k: int = 3, id_col: str = "doc_id",
                       text_col: str = "text") -> pa.Table:
    """Task-form banding (CLAUDE.md rule 1): MinHasher state is two small
    int vectors, so per-task construction costs ~us while an actor pool
    pays multi-second spin-up per pipeline and caps parallelism at its
    pool size."""
    return MinHashBander(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                         id_col=id_col, text_col=text_col)(batch)


def _window_hashes(col: pa.Array, k: int, fallback_whole_text: bool):
    """Flat word-k-gram 64-bit hashes for every row of a string column in
    ONE list-offset-masked sweep (vectorized FNV-1a per token + an n-wide
    uint64 polynomial roll with cross-row windows masked out).

    Returns ``(grams, counts)``: ``grams`` is the flat uint64 array in
    row order, ``counts[i]`` the number of grams of row i.  With
    ``fallback_whole_text`` rows shorter than k tokens contribute ONE
    gram — the hash of the whole text (identical short rows still
    match); without it they contribute zero grams.
    """
    import pyarrow.compute as pc

    from ..functions.text import fingerprint_column

    if not pa.types.is_string(col.type):
        col = col.cast(pa.string())
    n_rows = len(col)
    toks = pc.split_pattern(col, " ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    offsets = toks.offsets.to_numpy(zero_copy_only=False)
    lengths = offsets[1:] - offsets[:-1]
    m = int(offsets[-1] - offsets[0])
    th = np.zeros(m, dtype=np.uint64)
    if m:
        th[:] = (
            fingerprint_column(flat).to_numpy(zero_copy_only=False).view(np.uint64)
        )
    h = th.copy()
    with np.errstate(over="ignore"):
        for j in range(1, k):
            shifted = np.zeros(m, dtype=np.uint64)
            shifted[: m - j] = th[j:]
            h = h * np.uint64(1099511628211) ^ shifted
    ends = np.repeat(offsets[1:] - offsets[0], lengths)
    valid = np.arange(m) + k <= ends
    grams = h[valid]
    counts = np.maximum(lengths - k + 1, 0)
    if not fallback_whole_text:
        return grams, counts
    need_fb = counts == 0
    if not need_fb.any():
        return grams, counts
    counts_adj = np.where(need_fb, 1, counts)
    seg_starts = np.concatenate([[0], np.cumsum(counts_adj)[:-1]])
    out_g = np.empty(int(counts_adj.sum()), dtype=np.uint64)
    if len(grams):
        did = np.repeat(np.arange(n_rows), counts)
        real_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
        out_g[seg_starts[did] + (np.arange(len(grams)) - real_starts[did])] = grams
    fb = fingerprint_column(col).to_numpy(zero_copy_only=False).view(np.uint64)
    out_g[seg_starts[need_fb]] = fb[need_fb]
    return out_g, counts_adj


def _pair_jaccard(batch: pa.Table, k: int, *, fallback_whole_text: bool,
                  empty_is_one: bool) -> np.ndarray:
    """Exact gram-set Jaccard per (text_a, text_b) pair, fully vectorized:
    one gram sweep over both sides stacked, per-row distinct via a pandas
    drop_duplicates, intersection sizes via one inner merge on
    (pair, gh) + bincount — no per-pair Python."""
    n = batch.num_rows
    if n == 0:
        return np.empty(0, dtype=np.float64)
    both = pa.concat_arrays([
        (batch["text_a"].combine_chunks() if isinstance(batch["text_a"], pa.ChunkedArray) else batch["text_a"]).cast(pa.string()),
        (batch["text_b"].combine_chunks() if isinstance(batch["text_b"], pa.ChunkedArray) else batch["text_b"]).cast(pa.string()),
    ])
    grams, counts = _window_hashes(both, k, fallback_whole_text)
    rid = np.repeat(np.arange(2 * n), counts)
    # pandas hash dedup + hash merge beat a two-lexsort numpy rewrite
    # here (121 vs 215 ms/4096-pair batch, measured r4) — keep them
    df = pd.DataFrame({"rid": rid, "gh": grams.view(np.int64)}).drop_duplicates()
    pid = df["rid"].to_numpy() % n
    side = df["rid"].to_numpy() // n
    a = pd.DataFrame({"pid": pid[side == 0], "gh": df["gh"].to_numpy()[side == 0]})
    b = pd.DataFrame({"pid": pid[side == 1], "gh": df["gh"].to_numpy()[side == 1]})
    inter = np.bincount(
        a.merge(b, on=["pid", "gh"])["pid"].to_numpy(), minlength=n
    ).astype(np.float64)
    sa = np.bincount(a["pid"].to_numpy(), minlength=n).astype(np.float64)
    sb = np.bincount(b["pid"].to_numpy(), minlength=n).astype(np.float64)
    union = sa + sb - inter
    empty_val = 1.0 if empty_is_one else 0.0
    with np.errstate(invalid="ignore", divide="ignore"):
        j = np.where(union > 0, inter / np.maximum(union, 1), empty_val)
    return j


class MinHashBander:
    """doc -> exploded (band_id, band_key, doc_id) rows.

    Fully vectorized (VERDICT r2 #1): word-k-gram hashes come from ONE
    list-offset-masked sweep over the flat token buffer (the
    ``decontam.shingle_hash_rows`` kernel shape: vectorized FNV-1a per
    token + an n-wide uint64 polynomial roll with cross-document windows
    masked out), signatures are a segmented ``np.minimum.reduceat`` over
    the flat gram array, and band keys an FNV fold across each band's
    rows — no per-document Python, no per-(doc, band) crc loop.  The
    gram-hash universe differs from ``word_shingles`` (crc32 of joined
    strings); banding is candidate GENERATION only, so recall properties
    are preserved (MinHash estimates the same window-set Jaccard under
    any injective-enough gram hash) and the verify stage still computes
    exact Jaccard on its own shingles.
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, shingle_k: int = 3,
                 id_col: str = "doc_id", text_col: str = "text"):
        self.mh = MinHasher(num_perm=num_perm, bands=bands)
        self.k = shingle_k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = np.asarray(batch[self.id_col].to_numpy(zero_copy_only=False),
                         dtype=np.int64)
        n_docs = len(ids)
        if n_docs == 0:
            return pa.table({"band_id": pa.array([], type=pa.int32()),
                             "band_key": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        # one gram per <k-token doc (whole-text hash): identical short
        # docs still collide in every band
        out_g, counts_adj = _window_hashes(
            batch[self.text_col], self.k, fallback_whole_text=True
        )
        seg_starts = np.concatenate([[0], np.cumsum(counts_adj)[:-1]])
        sigs = self.mh.signatures_flat(out_g, seg_starts)
        bands = self.mh.bands
        return pa.table(
            {
                "band_id": pa.array(np.tile(np.arange(bands, dtype=np.int32), n_docs)),
                "band_key": pa.array(self.mh.band_keys_batch(sigs)),
                "doc_id": pa.array(np.repeat(ids, bands)),
            }
        )


_PAIR_PARTS = 64
# text-attach co-group join: task-based, so partitions cost ~nothing and
# bound per-task text volume (corpus_bytes / parts per merge task)
_TEXT_JOIN_PARTS = 32


def _add_bucket_part(t: pa.Table) -> pa.Table:
    """Deterministic partition id per LSH bucket, so pair generation runs as
    ~_PAIR_PARTS vectorized self-merges instead of one Python call per
    bucket (thousands of tiny groups otherwise dominate wall time)."""
    bid = t["band_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    bkey = t["band_key"].to_numpy(zero_copy_only=False).astype(np.int64)
    ph = (bkey + 1000003 * bid) % _PAIR_PARTS
    # strip schema metadata: upstream pandas-origin blocks carry a
    # `pandas` dict that defeats schema hashing in the groupby shuffle
    return t.append_column("ph", pa.array(ph)).replace_schema_metadata(None)


def _partition_pairs(g: pd.DataFrame, max_bucket: int = 64,
                     extra_cols: tuple = (), metrics=None,
                     metric_prefix: str = "lsh") -> pd.DataFrame:
    """All (a<b) candidate pairs across every bucket in one hash partition:
    a single pandas self-merge on (band_id, band_key). Oversized buckets
    (degenerate content) are capped — the skew guard — and every cap is
    counted into ``metrics`` so dropped recall is observable."""
    g = g.drop_duplicates(["band_id", "band_key", "doc_id"])
    sizes = g.groupby(["band_id", "band_key"])["doc_id"].transform("size")
    over = sizes > max_bucket
    if metrics is not None and bool(over.any()):
        dropped = g[over]
        # synchronous on the (rare) cap path: the count must be registered
        # before this task completes, so a driver reading the counter after
        # consuming the pipeline never races the increments
        ray.get([
            metrics.add.remote(
                f"{metric_prefix}_capped_buckets",
                int(dropped.groupby(["band_id", "band_key"]).ngroups),
            ),
            metrics.add.remote(
                f"{metric_prefix}_capped_bucket_rows", int(len(dropped))
            ),
        ])
    g = g[~over]
    m = g.merge(g, on=["band_id", "band_key"])
    m = m[m["doc_id_x"] < m["doc_id_y"]]
    cols = {"a": m["doc_id_x"], "b": m["doc_id_y"]}
    for c in extra_cols:
        cols[f"{c}_a"] = m[f"{c}_x"]
        cols[f"{c}_b"] = m[f"{c}_y"]
    out = pd.DataFrame(cols).drop_duplicates(["a", "b"])
    if out.empty:
        # preserve the SOURCE dtypes (string extra_cols would otherwise
        # come back as int64/null-typed empty blocks and poison schema
        # unification downstream)
        return pd.DataFrame({k: v.iloc[0:0] for k, v in cols.items()})
    return out


def _tag_side(side: int):
    """Stage factory appending a constant int8 ``side`` column — the
    old(0)/new(1) tagging protocol shared by every incremental probe
    (minhash band index, fuzzy deletion-key index): stored-index rows
    tag 0, increment rows tag 1, and old×old candidate pairs drop via
    ``side_a + side_b >= 1`` after _partition_pairs."""
    def f(t: pa.Table) -> pa.Table:
        return t.append_column(
            "side", pa.array(np.full(t.num_rows, side, dtype=np.int8)))
    return f


def _add_pair_part(t: pa.Table) -> pa.Table:
    # blocks arrive from pandas map_groups: drop the unhashable pandas
    # schema metadata so Ray's schema-dedup early exit works
    t = t.replace_schema_metadata(None)
    a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
    b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
    pp = (a * 31 + b) % _PAIR_PARTS
    return t.append_column("pp", pa.array(pp))


def _dedup_pairs(pairs: "ray.data.Dataset", keep_cols: list,
                 pre_split_rows: int | None = None) -> "ray.data.Dataset":
    """Global (a, b) dedup: hash-partition pairs, vectorized drop_duplicates
    per partition (bands produce the same pair many times).

    ``pre_split_rows``: split any pre-shuffle block larger than this
    many rows (`repartition(target_num_rows_per_block=...)` — ONLY
    splits, never merges).  Ray's sort-based groupby derives its reduce
    parallelism from the INPUT block count, and a producer task packs
    output at ~128 MB/block — so a few-GB candidate stream otherwise
    reduces (and runs its fused verify) on a handful of partitions
    while the ``pp`` space has `_PAIR_PARTS` buckets (measured 2-task
    reduce on a 30M-pair stream).  Streams already in small blocks are
    untouched, so the option is safe at any scale; None disables."""
    pairs = pairs.map_batches(_add_pair_part, batch_format="pyarrow",
                              batch_size=65536)
    if pre_split_rows:
        pairs = pairs.repartition(target_num_rows_per_block=pre_split_rows)
    return pairs.groupby("pp").map_groups(
        lambda g: g.drop_duplicates(["a", "b"])[keep_cols], batch_format="pandas"
    )


class JaccardVerifier:
    """Verify candidate pairs by exact gram-set Jaccard; texts come from a
    broadcast id->text dict (one object-store copy per node).  Uses the
    same vectorized ``_pair_jaccard`` kernel as the join-verify path, so
    the two modes report identical similarities by construction."""

    def __init__(self, texts_ref, shingle_k: int = 3, threshold: float = 0.8):
        self.texts = ray.get(texts_ref) if isinstance(texts_ref, ray.ObjectRef) else texts_ref
        self.k = shingle_k
        self.threshold = threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        probe = pa.table({
            "text_a": pa.array([self.texts[i] for i in batch["a"].to_pylist()],
                               type=pa.string()),
            "text_b": pa.array([self.texts[i] for i in batch["b"].to_pylist()],
                               type=pa.string()),
        })
        sims = _pair_jaccard(probe, self.k, fallback_whole_text=True,
                             empty_is_one=True)
        out = batch.append_column("jaccard", pa.array(sims, type=pa.float64()))
        return out.filter(pc.greater_equal(out["jaccard"], self.threshold))


def minhash_lsh_pairs(
    docs: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    concurrency: int = 4,
    broadcast_texts: bool = False,
    join_partitions: int | None = None,
    metrics=None,
    text_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """Near-duplicate pairs (a < b, jaccard >= threshold).

    ``metrics``: optional MetricCounterActor handle (stages/metrics.py);
    capped LSH buckets are counted there instead of vanishing silently.

    Verify-stage text access has two modes:
    - broadcast_texts=True (explicit small-corpus fast path): id->text
      dict via ray.put, probed per pair — materializes the corpus on the
      driver, so never the default.
    - broadcast_texts=False (default, the 100 TB path): texts are JOINED
      onto the candidate pairs with the task-based co-group hash join
      (stages/join.py) — no driver materialization, no whole-corpus
      broadcast, no aggregator actors; candidate-pair volume (post-LSH)
      plus one streaming pass of the text column is what moves.  Size
      join_partitions so a partition's text slice fits a worker heap.
    """
    if join_partitions is None:
        join_partitions = _TEXT_JOIN_PARTS
    if broadcast_texts:
        _texts_pd = docs.select_columns([id_col, text_col]).to_pandas()
        texts_ref = ray.put(dict(zip(_texts_pd[id_col], _texts_pd[text_col])))
    bands_ds = docs.map_batches(
        minhash_band_batch,
        fn_kwargs=dict(
            num_perm=num_perm, bands=bands, shingle_k=shingle_k,
            id_col=id_col, text_col=text_col,
        ),
        batch_format="pyarrow",
        # vectorized kernel, but keep batches small enough that the band
        # stage still fans out across the CPU budget (CLAUDE.md rule 3a:
        # large batch_size on a working stage kills task parallelism)
        batch_size=1024,
    )
    bands_ds = bands_ds.map_batches(_add_bucket_part, batch_format="pyarrow",
                                    batch_size=65536)
    pairs = bands_ds.groupby("ph").map_groups(
        lambda g: _partition_pairs(g, metrics=metrics), batch_format="pandas"
    )
    if broadcast_texts:
        pairs = _dedup_pairs(pairs, ["a", "b"])
        return pairs.map_batches(
            JaccardVerifier,
            fn_constructor_kwargs=dict(texts_ref=texts_ref, shingle_k=shingle_k,
                                       threshold=threshold),
            batch_format="pyarrow",
            batch_size=4096,
            concurrency=(1, concurrency),
        )

    with_ab = _attach_pair_texts(pairs, docs, id_col, text_col,
                                 join_partitions, text_type=text_type)
    return _verify_jaccard_pairs(with_ab, shingle_k, threshold)


def _verify_jaccard_pairs(
    with_ab: "ray.data.Dataset", shingle_k: int, threshold: float
) -> "ray.data.Dataset":
    """Shared exact-Jaccard verify for (a, b, text_a, text_b) candidate
    streams — ONE copy of the kernel flags (fallback_whole_text,
    empty_is_one) and the >= threshold filter, so the batch and
    incremental near-dup paths can never drift apart (the
    incremental == full-recompute test contract depends on it)."""

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        sims = _pair_jaccard(batch, shingle_k, fallback_whole_text=True,
                             empty_is_one=True)
        out = pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": pa.array(sims, type=pa.float64()),
            }
        )
        return out.filter(pc.greater_equal(out["jaccard"], threshold))

    return with_ab.map_batches(verify, batch_format="pyarrow", batch_size=4096)


def build_minhash_band_index(
    docs: "ray.data.Dataset",
    index_dir: str,
    *,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """Persist a corpus's LSH band index as narrow parquet
    (band_id int32, band_key int64, doc_id int64) — the state that makes
    near-dup detection INCREMENTAL: signatures are computed once per
    committed doc, and every later crawl increment probes this table
    instead of re-shingling the corpus.  3 int columns/doc/band
    (~1.3 KB/doc at 32 bands) — a small fixed fraction of corpus bytes
    at any scale.  Streaming write; never materialized on the driver."""
    import shutil

    shutil.rmtree(index_dir, ignore_errors=True)
    bds = docs.map_batches(
        minhash_band_batch,
        fn_kwargs=dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                       id_col=id_col, text_col=text_col),
        batch_format="pyarrow", batch_size=1024,
    )
    bds.write_parquet(index_dir)
    return index_dir


def incremental_minhash_pairs(
    new_docs: "ray.data.Dataset",
    index_dir: str,
    all_docs: "ray.data.Dataset",
    *,
    threshold: float = 0.8,
    num_perm: int = 128,
    bands: int = 32,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    join_partitions: int | None = None,
    metrics=None,
    text_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """Near-dup pairs INVOLVING at least one new document, against a
    corpus whose band index was persisted by build_minhash_band_index —
    the crawl-increment analog of ``incremental_exact_dedup`` (see
    pipelines/queries.cdc_incremental_dedup) one similarity tier up.

    Cost shape: signature/banding compute is O(|new batch|) only; the
    corpus contributes one streaming read of its NARROW band index (3
    int columns — no re-shingling, no text read) plus the text of
    candidate PARTNERS via the one-pass payload join.  Candidate
    generation reuses the bucketed self-merge with its skew cap (capped
    buckets counted into ``metrics`` under inc_lsh_*); old×old pairs
    are dropped by the side filter, so committed-corpus pairs are never
    recomputed.  Equals the full-batch ``minhash_lsh_pairs`` restricted
    to new-involving pairs (test-pinned: identical bucket contents →
    identical caps → identical candidates → same verify kernel).

    ``all_docs`` must cover the texts of both sides (corpus ∪ new,
    disjoint ``doc_id`` spaces — a re-crawled doc gets a NEW id and is
    handled by exact dedup first, matching the reference's emit-once
    registry discipline at SURVEY.md §2 T2/T5)."""
    from ..functions.rayutil import read_parquet_clean

    if join_partitions is None:
        join_partitions = _TEXT_JOIN_PARTS

    new_bands = new_docs.map_batches(
        minhash_band_batch,
        fn_kwargs=dict(num_perm=num_perm, bands=bands, shingle_k=shingle_k,
                       id_col=id_col, text_col=text_col),
        batch_format="pyarrow", batch_size=1024,
    ).map_batches(_tag_side(1), batch_format="pyarrow")
    stored = read_parquet_clean(index_dir).map_batches(
        _tag_side(0), batch_format="pyarrow")
    both = stored.union(new_bands).map_batches(
        _add_bucket_part, batch_format="pyarrow", batch_size=65536)

    def gen(g: pd.DataFrame) -> pd.DataFrame:
        out = _partition_pairs(g, extra_cols=("side",), metrics=metrics,
                               metric_prefix="inc_lsh")
        out = out[(out["side_a"].to_numpy(dtype=np.int64)
                   + out["side_b"].to_numpy(dtype=np.int64)) >= 1]
        return out[["a", "b"]]

    pairs = both.groupby("ph").map_groups(gen, batch_format="pandas")
    # no _dedup_pairs exchange: _attach_pair_payload.zip_sides performs
    # the global (a, b) dedup in-line (same reasoning the full-batch join
    # path used to drop this whole extra groupby)
    with_ab = _attach_pair_texts(pairs, all_docs, id_col, text_col,
                                 join_partitions, text_type=text_type)
    return _verify_jaccard_pairs(with_ab, shingle_k, threshold)


def _attach_pair_texts(
    pairs: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    id_col: str,
    text_col: str,
    join_partitions: int,
    text_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """Scalable verify-side text access shared by the near-dup operators:
    join text_a and text_b onto (a, b) candidate pairs with two chained
    task-based co-group hash joins (stages/join.py) — no driver
    materialization, no whole-corpus broadcast, no per-pipeline
    aggregator-actor spin-up; candidate-pair volume plus one streaming
    pass of the text column is what moves.  Schemas are passed
    statically so neither join samples (= re-executes) its inputs; pass
    ``text_type`` when ``docs`` is a computed pipeline — the fallback
    ``docs.schema()`` executes that sub-plan once just to learn the
    column type."""
    from .join import _ray_schema_to_arrow

    text_t = text_type
    if text_t is None:
        text_t = _ray_schema_to_arrow(docs.schema()).field(text_col).type
    return _attach_pair_payload(
        pairs, docs, id_col, text_col, "text_a", "text_b",
        join_partitions, text_t,
    )


def _attach_pair_payload(
    pairs: "ray.data.Dataset",
    payload_ds: "ray.data.Dataset",
    id_col: str,
    payload_col: str,
    out_a: str,
    out_b: str,
    join_partitions: int,
    payload_t: pa.DataType,
) -> "ray.data.Dataset":
    """Attach a per-doc payload column to both sides of (a, b) candidate
    pairs with ONE pass of the payload through the join exchange.

    Shape: each pair expands to two keyed rows (side 0 keyed by a, side
    1 keyed by b); ONE co-group hash join attaches the payload; a
    second, CANDIDATE-VOLUME-only shuffle (coarse a-hash partitions,
    one vectorized Arrow sweep per partition — payload types survive
    untouched) re-zips the two sides into (a, b, out_a, out_b).  The
    corpus-sized side crosses exactly one exchange — the previous
    two-chained-joins shape shipped it twice and re-executed a computed
    ``payload_ds`` twice (measured ~1.8x slower end-to-end on the
    minhash catalog entry)."""
    from .join import hash_join

    def expand(t: pa.Table) -> pa.Table:
        zeros = pa.array(np.zeros(t.num_rows, dtype=np.int8))
        ones = pa.array(np.ones(t.num_rows, dtype=np.int8))
        return pa.concat_tables([
            pa.table({"a": t["a"], "b": t["b"], "_id": t["a"], "_side": zeros}),
            pa.table({"a": t["a"], "b": t["b"], "_id": t["b"], "_side": ones}),
        ])

    exp = pairs.map_batches(expand, batch_format="pyarrow")
    joined = hash_join(
        exp,
        payload_ds.select_columns([id_col, payload_col]),
        on="_id",
        right_on=id_col,
        num_partitions=join_partitions,
        left_schema=pa.schema(
            [("a", pa.int64()), ("b", pa.int64()),
             ("_id", pa.int64()), ("_side", pa.int8())]
        ),
        right_schema=pa.schema([(id_col, pa.int64()), (payload_col, payload_t)]),
    )

    def add_ppart(t: pa.Table) -> pa.Table:
        k = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("ppart", pa.array((k % 64).astype(np.int64)))

    def zip_sides(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = t.drop(["ppart"])
        t = t.take(pc.sort_indices(
            t, sort_keys=[("a", "ascending"), ("b", "ascending"),
                          ("_side", "ascending")]
        ))
        # global (a, b) dedup happens HERE, not in a separate shuffle:
        # every copy of a pair hashes to the same ppart (keyed by a), so
        # one vectorized first-occurrence sweep per partition is globally
        # correct — LSH bands emit the same pair many times and a
        # dedicated dedup exchange was a whole extra groupby
        a = t["a"].to_numpy(zero_copy_only=False)
        b = t["b"].to_numpy(zero_copy_only=False)
        sd = t["_side"].to_numpy(zero_copy_only=False)
        keep = np.ones(len(a), dtype=bool)
        keep[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1]) | (sd[1:] != sd[:-1])
        t = t.filter(pa.array(keep))
        side = t["_side"].to_numpy(zero_copy_only=False)
        t0 = t.take(pa.array(np.nonzero(side == 0)[0]))
        t1 = t.take(pa.array(np.nonzero(side == 1)[0]))
        # one row per side per (a, b) after the sweep; the sort aligns
        # them positionally
        return pa.table({"a": t0["a"], "b": t0["b"],
                         out_a: t0[payload_col], out_b: t1[payload_col]})

    parted = joined.map_batches(add_ppart, batch_format="pyarrow",
                                batch_size=65536)
    return parted.groupby("ppart").map_groups(zip_sides, batch_format="pyarrow")


def _attach_pair_vectors(
    pairs: "ray.data.Dataset",
    vectors: "ray.data.Dataset",
    id_col: str,
    emb_col: str,
    join_partitions: int = _TEXT_JOIN_PARTS,
    vec_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """_attach_pair_texts for an embedding list column: vec_a / vec_b are
    joined onto (a, b) candidate pairs from the ORIGINAL vector dataset
    via the expand -> one co-group join -> re-zip shape of
    ``_attach_pair_payload`` — the vectors stream through the join
    exchange exactly once, instead of riding every LSH band.
    Pass ``vec_type`` when ``vectors`` is computed (the schema()
    fallback executes the sub-plan once just to learn the type)."""
    from .join import _ray_schema_to_arrow

    vec_t = vec_type
    if vec_t is None:
        vec_t = _ray_schema_to_arrow(vectors.schema()).field(emb_col).type
    return _attach_pair_payload(
        pairs, vectors, id_col, emb_col, "vec_a", "vec_b",
        join_partitions, vec_t,
    )


# ---------------------------------------------------------------------------
# Exact n-gram Jaccard near-dup (prefix filtering)


def _word_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Sorted distinct 64-bit hashes of the word n-grams of ``text``.

    Tokenization matches DuckDB string_split semantics exactly (split on
    single space, empty tokens kept) so the SQL oracle reproduces the
    same gram SETS; hashing grams to int64 is safe for Jaccard
    completeness (any total order works for prefix filtering, and a
    collision can only merge two grams on BOTH sides of a comparison
    inside this engine — the verify stage recomputes on hashes too, so
    J is computed over the same hashed universe for every pair — BUT the
    oracle computes on the gram STRINGS, so a collision DOES cross
    engines through its effect on |A|, |B| and the intersection; the
    token hash therefore must be 64-bit — a 32-bit crc expects a
    colliding token pair at ~77k distinct tokens, and no crc-derived
    64-bit widening helps, since crc(b, salt)/crc(b+suffix) are linear
    functions of crc(b) and len(b)).  Hash = the engine's vectorized
    FNV-1a 64 kernel over the token array (byte-position numpy sweeps,
    no per-byte Python), combined across the n-gram window by a
    vectorized uint64 polynomial roll.
    """
    from ..functions.text import fingerprint_column

    ws = text.split(" ")
    m = len(ws) - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.uint64)
    th = (
        fingerprint_column(pa.array(ws, type=pa.string()))
        .to_numpy(zero_copy_only=False)
        .view(np.uint64)
        .copy()
    )
    h = th[:m].copy()
    with np.errstate(over="ignore"):
        for j in range(1, n):
            h = h * np.uint64(1099511628211) ^ th[j : j + m]
    return np.unique(h)


def ngram_jaccard_pairs(
    docs: "ray.data.Dataset",
    threshold: float = 0.8,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: str = "df",
    join_partitions: int | None = None,
    metrics=None,
    max_bucket: int = 256,
    text_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """EXACT word-n-gram-set Jaccard pairs (a < b, J >= threshold) via
    prefix filtering — complete, not approximate: for any global total
    order over grams, two sets with J >= t must share a gram within
    their first ``|x| - ceil(t*|x|) + 1`` grams (the classic all-pairs
    similarity-join prefix theorem), so bucketing ONLY prefix grams
    generates every qualifying pair.  Completeness holds unless a skew
    cap fires — capped buckets are counted in ``metrics``, making any
    incompleteness observable.

    ``order="df"`` ranks grams rarest-first via a document-frequency
    pass whose vocabulary is collected to a broadcast map — the
    bucket-minimizing choice for dimension-sized vocabularies;
    ``order="hash"`` skips the global pass entirely (fully streaming, no
    broadcast — at the cost of bigger buckets on skewed corpora);
    ``order="df_join"`` gets the rarest-first buckets WITHOUT the
    broadcast: per-gram document frequencies stay a Dataset and are
    joined back onto the gram stream (task-based co-group join), then
    each doc's prefix is selected by one vectorized sweep per coarse
    doc-hash partition — the unbounded-vocabulary scale path.  All three
    orders yield the same final pairs (completeness holds per-order and
    the verify stage recomputes exact Jaccard).
    """
    if join_partitions is None:
        join_partitions = _TEXT_JOIN_PARTS

    def gram_rows(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_g = [], []
        for i, t in zip(ids, texts):
            gs = _word_ngram_hashes(t, n)
            out_id.append(np.full(len(gs), i, dtype=np.int64))
            out_g.append(gs.view(np.int64))
        return pa.table(
            {
                "doc_id": np.concatenate(out_id) if out_id else np.empty(0, np.int64),
                "gh": np.concatenate(out_g) if out_g else np.empty(0, np.int64),
            }
        )

    if order == "df_join":
        from .join import hash_join

        gr = docs.map_batches(gram_rows, batch_format="pyarrow")
        partials = gr.map_batches(
            lambda df: df.groupby("gh", sort=False).size().rename("_df").reset_index(),
            batch_format="pandas",
        )

        def add_gp(t: pa.Table) -> pa.Table:
            gh = t["gh"].to_numpy(zero_copy_only=False).view(np.uint64)
            return t.append_column(
                "gp", pa.array((gh % np.uint64(_PAIR_PARTS)).astype(np.int64))
            ).replace_schema_metadata(None)

        counts = (
            partials.map_batches(add_gp, batch_format="pyarrow", batch_size=65536)
            .groupby("gp")
            .map_groups(
                lambda g: g.groupby("gh", sort=False)["_df"].sum().reset_index(),
                batch_format="pandas",
            )
        )
        with_df = hash_join(
            gr, counts, on="gh",
            num_partitions=join_partitions,
            left_schema=pa.schema([("doc_id", pa.int64()), ("gh", pa.int64())]),
            right_schema=pa.schema([("gh", pa.int64()), ("_df", pa.int64())]),
        )

        def add_dp(t: pa.Table) -> pa.Table:
            d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column(
                "dp", pa.array(d % _PAIR_PARTS)).replace_schema_metadata(None)

        def select_prefix(g: pd.DataFrame) -> pd.DataFrame:
            # rarest-first within each doc; one vectorized sweep for every
            # doc in this coarse partition (all of a doc's grams are here)
            g = g.sort_values(["doc_id", "_df", "gh"], kind="mergesort")
            L = g.groupby("doc_id", sort=False)["gh"].transform("size")
            k = (L - np.ceil(threshold * L).astype(np.int64) + 1).to_numpy()
            rank = g.groupby("doc_id", sort=False).cumcount().to_numpy()
            out = g[rank < k]
            return pd.DataFrame(
                {
                    "band_id": np.zeros(len(out), dtype=np.int32),
                    "band_key": out["gh"].to_numpy(),
                    "doc_id": out["doc_id"].to_numpy(),
                }
            )

        emitted = (
            with_df.map_batches(add_dp, batch_format="pyarrow", batch_size=65536)
            .groupby("dp")
            .map_groups(select_prefix, batch_format="pandas")
        )
        return _ngram_pairs_tail(
            emitted, docs, threshold, n, id_col, text_col,
            join_partitions, metrics, max_bucket, text_type,
        )

    rank_ref = None
    if order == "df":
        # document frequency per gram hash: per-batch partials -> coarse
        # hash partitions -> one merged vocab frame -> broadcast
        gr = docs.map_batches(gram_rows, batch_format="pyarrow")
        partials = gr.map_batches(
            lambda df: df.groupby("gh", sort=False).size().rename("_n").reset_index(),
            batch_format="pandas",
        )

        def add_part(t: pa.Table) -> pa.Table:
            gh = t["gh"].to_numpy(zero_copy_only=False).view(np.uint64)
            return t.append_column(
                "gp", pa.array((gh % np.uint64(_PAIR_PARTS)).astype(np.int64))
            )

        dfs = (
            partials.map_batches(add_part, batch_format="pyarrow", batch_size=65536)
            .groupby("gp")
            .map_groups(
                lambda g: g.groupby("gh", sort=False)["_n"].sum().reset_index(),
                batch_format="pandas",
            )
            .to_pandas()
        )
        rank_ref = ray.put(dict(zip(dfs["gh"].astype("int64"), dfs["_n"].astype("int64"))))

    def prefix_emit(batch: pa.Table, rank_ref=rank_ref) -> pa.Table:
        dfm = ray.get(rank_ref) if rank_ref is not None else None
        ids = batch[id_col].to_pylist()
        texts = batch[text_col].to_pylist()
        out_id, out_g = [], []
        for i, t in zip(ids, texts):
            gs = _word_ngram_hashes(t, n)
            L = len(gs)
            if L == 0:
                continue
            k = L - int(np.ceil(threshold * L)) + 1
            if dfm is not None:
                signed = gs.view(np.int64)
                key = np.fromiter(
                    ((dfm.get(int(g), 0), int(g)) for g in signed),
                    dtype=[("df", np.int64), ("g", np.int64)],
                    count=L,
                )
                pref = signed[np.argsort(key, order=("df", "g"), kind="stable")[:k]]
            else:
                pref = gs.view(np.int64)[:k]  # gs already hash-sorted
            out_id.append(np.full(len(pref), i, dtype=np.int64))
            out_g.append(pref)
        return pa.table(
            {
                "band_id": np.zeros(
                    sum(len(x) for x in out_g), dtype=np.int32
                ),
                "band_key": np.concatenate(out_g) if out_g else np.empty(0, np.int64),
                "doc_id": np.concatenate(out_id) if out_id else np.empty(0, np.int64),
            }
        )

    emitted = docs.map_batches(prefix_emit, batch_format="pyarrow", batch_size=1024)
    return _ngram_pairs_tail(
        emitted, docs, threshold, n, id_col, text_col,
        join_partitions, metrics, max_bucket, text_type,
    )


def _ngram_pairs_tail(
    emitted: "ray.data.Dataset",
    docs: "ray.data.Dataset",
    threshold: float,
    n: int,
    id_col: str,
    text_col: str,
    join_partitions: int,
    metrics,
    max_bucket: int,
    text_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """Shared tail of every ngram-order mode: prefix rows -> coarse-
    partition candidate pairs -> global pair dedup -> text attach ->
    exact-Jaccard verify."""
    emitted = emitted.map_batches(_add_bucket_part, batch_format="pyarrow",
                                  batch_size=65536)
    # emit metadata-stripped Arrow (not pandas): pandas-origin blocks
    # carry a `pandas` schema-metadata dict that defeats Ray's schema
    # dedup in the downstream attach shuffle ('Failed to hash the
    # schemas' per task)
    pairs = emitted.groupby("ph").map_groups(
        lambda g: pa.Table.from_pandas(
            _partition_pairs(g, max_bucket=max_bucket, metrics=metrics),
            preserve_index=False).replace_schema_metadata(None),
        batch_format="pandas",
    )
    # no dedicated pair-dedup exchange: the attach stage's zip partition
    # (keyed by a-hash) dedups (a, b) globally in its vectorized sweep
    with_ab = _attach_pair_texts(pairs, docs, id_col, text_col,
                                 join_partitions, text_type=text_type)

    def verify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        # oracle-exact semantics: no short-doc fallback gram, empty gram
        # set -> J = 0; one vectorized sweep over both sides stacked
        out_j = _pair_jaccard(batch, n, fallback_whole_text=False,
                              empty_is_one=False)
        out = pa.table(
            {
                "a": batch["a"],
                "b": batch["b"],
                "jaccard": pa.array(
                    np.floor(out_j * 10000 + 0.5) / 10000, type=pa.float64()
                ),
            }
        )
        mask = pc.greater_equal(
            pa.array(out_j, type=pa.float64()), pa.scalar(threshold)
        )
        return out.filter(mask)

    return with_ab.map_batches(verify, batch_format="pyarrow", batch_size=4096)


# ---------------------------------------------------------------------------
# Exact substring duplication (duplicated token windows across documents)


def substring_dup_stats(
    docs: "ray.data.Dataset",
    window: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    join_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Per-document duplicated-substring stats: for every document with at
    least one ``window``-token window, the number of DISTINCT windows, how
    many of them also occur in at least one OTHER document, and the
    duplicated fraction — the corpus-level exact-substring-duplication
    signal ("Deduplicating Training Data Makes Language Models Better",
    Lee et al. 2022, trims such duplicated spans; reference analog: the
    emit-once/dedup family, ``CMS_SynPuf_ETL_CDM_v5.py:541-590``,
    reframed from row identity to intra-text span identity).

    Scale shape (no all-pairs, no broadcast, nothing driver-side):

    1. one list-offset-masked gram sweep per batch (``_window_hashes``,
       the shared minhash/decontam kernel) + a per-doc distinct —
       gram-row volume is O(total tokens);
    2. per-window document frequency via per-batch partials -> coarse
       gram-hash partitions (bounded groups, one vectorized sum each);
    3. frequencies join BACK onto the gram stream with the task-based
       co-group ``hash_join`` (the df stays a Dataset — unbounded window
       vocabulary never lands on the driver);
    4. per-doc rollup in coarse doc-hash partitions.

    A window counts as duplicated when its document frequency >= 2; the
    per-doc distinct in step 1 makes the df a true document count, so a
    window repeated WITHIN one document only is not "duplicated" — that
    intra-doc signal is ``doc_repetition_stats``'s job.
    """
    from .join import hash_join

    if join_partitions is None:
        join_partitions = _TEXT_JOIN_PARTS

    def gram_rows(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        ids = np.asarray(t[id_col].to_numpy(zero_copy_only=False), dtype=np.int64)
        grams, counts = _window_hashes(t[text_col], window,
                                       fallback_whole_text=False)
        did = np.repeat(ids, counts)
        df = pd.DataFrame({"doc_id": did, "gh": grams.view(np.int64)})
        df = df.drop_duplicates()
        return pa.table({"doc_id": df["doc_id"].to_numpy(),
                         "gh": df["gh"].to_numpy()})

    gr = docs.select_columns([id_col, text_col]).map_batches(
        gram_rows, batch_format="pyarrow", batch_size=1024
    )

    # document frequency per window hash: (doc, gh) rows are distinct per
    # doc, and a doc never splits across batches, so per-batch counts sum
    # to the exact number of distinct documents containing the window
    partials = gr.map_batches(
        lambda df: df.groupby("gh", sort=False).size().rename("_df").reset_index(),
        batch_format="pandas",
    )

    def add_gp(t: pa.Table) -> pa.Table:
        gh = t["gh"].to_numpy(zero_copy_only=False).view(np.uint64)
        return t.append_column(
            "gp", pa.array((gh % np.uint64(_PAIR_PARTS)).astype(np.int64))
        )

    counts_ds = (
        partials.map_batches(add_gp, batch_format="pyarrow", batch_size=65536)
        .groupby("gp")
        .map_groups(
            lambda g: g.groupby("gh", sort=False)["_df"].sum().reset_index(),
            batch_format="pandas",
        )
    )
    with_df = hash_join(
        gr, counts_ds, on="gh",
        num_partitions=join_partitions,
        left_schema=pa.schema([("doc_id", pa.int64()), ("gh", pa.int64())]),
        right_schema=pa.schema([("gh", pa.int64()), ("_df", pa.int64())]),
    )

    def add_dp(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column("dp", pa.array(d % _PAIR_PARTS))

    def per_doc(g: pd.DataFrame) -> pd.DataFrame:
        tmp = pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "_d": (g["_df"].to_numpy() >= 2).astype(np.int64),
        })
        out = tmp.groupby("doc_id", sort=False).agg(
            n_windows=("_d", "size"), n_dup_windows=("_d", "sum")
        ).reset_index()
        ratio = out["n_dup_windows"].to_numpy() / out["n_windows"].to_numpy()
        out["dup_ratio"] = np.floor(ratio * 10000 + 0.5) / 10000
        return out

    return (
        with_df.map_batches(add_dp, batch_format="pyarrow", batch_size=65536)
        .groupby("dp")
        .map_groups(per_doc, batch_format="pandas")
    )


# ---------------------------------------------------------------------------
# Incremental exact dedup against a committed lake


def incremental_exact_dedup(
    new_docs: "ray.data.Dataset",
    lake_root: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    lake_content_col: str = "content",
    join_partitions: int | None = None,
) -> "ray.data.Dataset":
    """Ingest-time exact dedup of a NEW document batch against the
    already-committed lake: a new document survives iff (a) no document
    with the same content sha256 exists in the lake, and (b) it is the
    min-``id_col`` holder of its sha within the new batch (first-wins,
    the engine's LWW-adjacent survivor rule).  Returns
    ``(doc_id, content_sha_hex)`` for the survivors — the rows an
    incremental crawl would actually hand to ``ingest``.

    This is the CDC x training-data crossover the lake exists for: each
    crawl increment dedups against ALL previously committed content
    without re-reading texts — only the lake's content column streams
    through one sha pass.  (Reference analog: the emit-once dims /
    visit-identity sets, ``CMS_SynPuf_ETL_CDM_v5.py:541-590``, which
    dedup each run's rows against state accumulated across runs.)

    Scale shape: within-batch winners via per-batch sha partials ->
    coarse fingerprint partitions (the ``exact_dedup_groups`` shape);
    the lake side is a streamed projection of one column, hashed
    per batch and deduped per batch before the exchange; the final
    membership test is a task-based co-group ANTI join — neither side
    is broadcast or driver-materialized.
    """
    from ..functions.text import fingerprint_column
    from .join import hash_join

    if join_partitions is None:
        join_partitions = _TEXT_JOIN_PARTS

    def partial(batch: pa.Table) -> pa.Table:
        sha = sha256_hex_column(batch[text_col])
        df = pd.DataFrame({
            "content_sha_hex": sha.to_pandas(),
            "_min_id": batch[id_col].to_pandas(),
        })
        g = df.groupby("content_sha_hex", sort=False)["_min_id"].min().reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    def add_sp(t: pa.Table) -> pa.Table:
        fp = fingerprint_column(t["content_sha_hex"]).to_numpy(
            zero_copy_only=False
        ).view(np.uint64)
        return t.append_column(
            "sp", pa.array((fp % np.uint64(_PAIR_PARTS)).astype(np.int64))
        )

    winners = (
        new_docs.select_columns([id_col, text_col])
        .map_batches(partial, batch_format="pyarrow", batch_size=4096)
        .map_batches(add_sp, batch_format="pyarrow", batch_size=65536)
        .groupby("sp")
        .map_groups(
            lambda g: g.groupby("content_sha_hex", sort=False)["_min_id"]
            .min().reset_index(),
            batch_format="pandas",
        )
    )

    def lake_shas(t: pa.Table) -> pa.Table:
        sha = sha256_hex_column(t[lake_content_col])
        # per-batch distinct: the anti probe only needs membership
        return pa.table({"content_sha_hex": sha}).group_by(
            "content_sha_hex"
        ).aggregate([])

    from ..pipelines.ingest import read_lake

    lake_side = read_lake(lake_root, columns=[lake_content_col]).map_batches(
        lake_shas, batch_format="pyarrow"
    )

    fresh = hash_join(
        winners, lake_side, on="content_sha_hex", how="anti",
        num_partitions=join_partitions,
        left_schema=pa.schema([("content_sha_hex", pa.string()),
                               ("_min_id", pa.int64())]),
        right_schema=pa.schema([("content_sha_hex", pa.string())]),
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["_min_id"],
                         "content_sha_hex": t["content_sha_hex"]})

    return fresh.map_batches(rename, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup


def simhash_batch(batch: pa.Table, *, shingle_k: int = 5, id_col: str = "doc_id",
                  text_col: str = "text") -> pa.Table:
    """Task-form simhash (stateless kernel — see minhash_band_batch)."""
    return SimHasher(shingle_k=shingle_k, id_col=id_col, text_col=text_col)(batch)


class SimHasher:
    def __init__(self, shingle_k: int = 5, id_col: str = "doc_id", text_col: str = "text"):
        self.k = shingle_k
        self.id_col, self.text_col = id_col, text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch[self.id_col].to_pylist()
        texts = batch[self.text_col].to_pylist()
        hashes = [simhash64(char_shingles(t, self.k)) for t in texts]
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "simhash": pa.array(np.array(hashes, dtype=np.uint64).view(np.int64)),
            }
        )


def simhash_pairs(
    docs: "ray.data.Dataset",
    max_hamming: int = 3,
    shingle_k: int = 5,
    concurrency: int = 4,
    metrics=None,
) -> "ray.data.Dataset":
    """Near-dup pairs by simhash: 4 x 16-bit band buckets (any pair within
    hamming<=3 of 64 bits shares at least one exact 16-bit band), verified
    by full hamming distance."""
    sigs = docs.map_batches(
        simhash_batch,
        fn_kwargs=dict(shingle_k=shingle_k),
        batch_format="pyarrow",
        batch_size=1024,
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        ids = np.asarray(batch["doc_id"].to_numpy(zero_copy_only=False))
        h = batch["simhash"].to_numpy(zero_copy_only=False).view(np.uint64)
        out_band, out_key, out_id, out_h = [], [], [], []
        for band in range(4):
            key = (h >> np.uint64(band * 16)) & np.uint64(0xFFFF)
            out_band.append(np.full(len(ids), band, dtype=np.int32))
            out_key.append(key.astype(np.int64))
            out_id.append(ids)
            out_h.append(h.view(np.int64))
        return pa.table(
            {
                "band_id": np.concatenate(out_band),
                "band_key": np.concatenate(out_key),
                "doc_id": np.concatenate(out_id),
                "simhash": np.concatenate(out_h),
            }
        )

    bands_ds = sigs.map_batches(explode_bands, batch_format="pyarrow")

    def part_pairs(g: pd.DataFrame) -> pd.DataFrame:
        m = _partition_pairs(g, extra_cols=("simhash",), metrics=metrics)
        if m.empty:
            return pd.DataFrame({c: pd.Series(dtype="int64") for c in ("a", "b", "hamming")})
        x = m["simhash_a"].to_numpy().astype(np.int64).view(np.uint64)
        y = m["simhash_b"].to_numpy().astype(np.int64).view(np.uint64)
        xor = (x ^ y).copy()
        ham = np.unpackbits(xor.view(np.uint8).reshape(-1, 8), axis=1).sum(axis=1)
        m = m.assign(hamming=ham.astype("int64"))
        m = m[m["hamming"] <= max_hamming]
        return m[["a", "b", "hamming"]]

    bands_ds = bands_ds.map_batches(_add_bucket_part, batch_format="pyarrow",
                                    batch_size=65536)
    pairs = bands_ds.groupby("ph").map_groups(part_pairs, batch_format="pandas")
    return _dedup_pairs(pairs, ["a", "b", "hamming"])
