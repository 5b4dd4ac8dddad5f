"""Approximate string-matching self-join by edit distance — the
entity-resolution / record-linkage operator family (fuzzy dedup of
names/titles/codes), the string cousin of stages/dedup.py's set- and
vector-similarity joins.

Blocking is FastSS deletion neighborhoods (Bocek et al. 2007, "Fast
Similarity Search in Large Dictionaries"): for byte edit distance <= k,
two strings MUST share a member of their deletion neighborhood
U_k(s) = {s with at most k bytes deleted} (each substitution deletes
one byte on both sides, each indel one byte on one side) — so
candidate generation is a plain groupby on neighborhood keys with
EXACT recall, never an all-pairs scan.  Keys are 64-bit polynomial
hashes composed from prefix/suffix partial hashes: O(len) numpy work
per row on the Arrow flat byte buffer, no per-row Python, no variant
strings materialized.  A hash collision only ADDS a candidate — the
verify stage applies the exact predicate, so both recall and precision
of the final result are exact.

Verification is exact and vectorized across the pair batch.  For
k=1, with |len(a) - len(b)| <= 1,

    dist(a, b) <= 1  <=>  lcp(a, b) + lcs(a, b) >= max(len) - 1

(lcp/lcs = longest common prefix/suffix in BYTES; equality with
character-level Levenshtein holds on ASCII payloads — documented at
the query entry, which feeds ASCII keys).  Proof sketch: same length
-> the condition is exactly "hamming <= 1"; length diff 1 -> the
shorter string splits into a prefix+suffix of the longer covering all
but one byte, i.e. one insertion.  For k>=2, a banded Levenshtein DP
(editk_mask) runs maxlen x (2k+1) vectorized steps per batch.

Scale shape (mirrors minhash_lsh_pairs): key rows ~ O(total_bytes);
candidates pair up inside coarse key-hash partitions via the shared
capped self-merge (stages/dedup._partition_pairs — degenerate buckets
are capped AND counted into metrics so dropped recall is observable);
global (a, b) dedup is the shared coarse pair exchange; verify is one
vectorized map_batches.  No stage materializes the input or holds more
than one partition's candidates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import (_add_bucket_part, _dedup_pairs, _partition_pairs,
                    _tag_side)

# polynomial base: the FNV prime (odd, full 64-bit mixing under wraparound)
_B = np.uint64(1099511628211)

_EMPTY_PAIRS = pa.table({
    "a": pa.array([], type=pa.int64()),
    "b": pa.array([], type=pa.int64()),
    "name_a": pa.array([], type=pa.string()),
    "name_b": pa.array([], type=pa.string()),
})


def _verify_pairs(t: pa.Table, k: int = 1) -> pa.Table:
    """Shared exact-verify stage: drop unhashable pandas schema metadata
    (blocks arrive from pandas map_groups — Ray's schema-dedup early
    exit needs hashable schemas), rebuild empty blocks on the canonical
    (a, b, name_a, name_b) schema (all-singleton partitions emit empty
    frames whose pandas->arrow types degrade to int64/null), and apply
    the exact edit<=k predicate."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    t = t.replace_schema_metadata(None)
    if t.num_rows == 0:
        return _EMPTY_PAIRS
    return t.filter(pa.array(editk_mask(t["name_a"], t["name_b"], k)))


def _byte_matrix(col):
    """(n, W) uint8 padded byte matrix + int64 lengths for a string
    column — one gather over the Arrow flat buffer (same buffer idiom
    as functions/text.fingerprint_column); pad bytes are 0 and always
    masked by length downstream.  Nulls read as length-0; callers that
    must distinguish null from empty handle validity themselves."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    n = len(arr)
    lb = arr.cast(pa.large_binary())
    off_buf, data_buf = lb.buffers()[1], lb.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype=np.int64)[lb.offset: lb.offset + n + 1]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.empty(0, dtype=np.uint8))
    starts, lengths = offsets[:-1], np.diff(offsets)
    W = int(lengths.max()) if n and lengths.size else 0
    if W == 0:
        return np.zeros((n, 0), dtype=np.uint8), lengths.astype(np.int64)
    cols = np.arange(W, dtype=np.int64)
    idx = starts[:, None] + cols[None, :]
    mask = cols[None, :] < lengths[:, None]
    M = np.where(mask, data[np.clip(idx, 0, max(len(data) - 1, 0))], 0)
    return M.astype(np.uint8), lengths.astype(np.int64)


def deletion_key_table(batch: pa.Table, *, id_col: str, name_col: str,
                       k: int = 1) -> pa.Table:
    """(band_id=0, band_key, doc_id, name) rows: one row per deletion-
    neighborhood member of each name (the name itself, each single-byte
    deletion, and for ``k=2`` each two-byte deletion).  band_key is the
    64-bit polynomial hash H(s) = Σ s[i]·B^(len-1-i) mod 2^64 of the
    member, composed from prefix/suffix partial hashes — a 1-deletion
    is prefix·B^m + suffix; a 2-deletion at (i, i+d) splices the middle
    segment hash out of two prefixes ((P[i+d] − P[i+1]·B^(d-1)) under
    wraparound) — O(len) numpy column steps per gap, no variant strings
    ever built.  Emitting (band_id, band_key, doc_id) rows feeds the
    shared LSH pair plumbing (_add_bucket_part / _partition_pairs)
    unchanged.  Null names emit NO keys (SQL levenshtein semantics:
    null matches nothing).  FastSS supports any k; this ships k in
    {1, 2} (neighborhood size grows as C(len, k))."""
    if k not in (1, 2):
        raise ValueError("deletion_key_table supports k in {1, 2}")
    if batch[name_col].null_count:
        import pyarrow.compute as _pc

        batch = batch.filter(_pc.is_valid(batch[name_col]))
    M8, lens = _byte_matrix(batch[name_col])
    n, W = M8.shape
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    names = batch[name_col]
    if n == 0 or W == 0:
        return pa.table({
            "band_id": pa.array(np.zeros(n, dtype=np.int64)),
            "band_key": pa.array(np.zeros(n, dtype=np.int64)),
            "doc_id": pa.array(ids),
            "name": names,
        })
    M = M8.astype(np.uint64)
    cols = np.arange(W, dtype=np.int64)
    bpow = np.empty(W + 2, dtype=np.uint64)
    bpow[0] = np.uint64(1)
    key_chunks, row_chunks = [], []
    with np.errstate(over="ignore"):
        for j in range(1, W + 2):
            bpow[j] = bpow[j - 1] * _B
        # prefix hashes P[:, d] = H(s[:d])
        P = np.zeros((n, W + 1), dtype=np.uint64)
        for d in range(1, W + 1):
            P[:, d] = P[:, d - 1] * _B + M[:, d - 1]
        # T[:, i] = s[i]·B^(len-1-i) for i < len — each byte at its final
        # weight; suffix hashes are one reverse cumsum away
        e = lens[:, None] - 1 - cols[None, :]
        T = np.where(e >= 0, M * bpow[np.clip(e, 0, W)], np.uint64(0))
        # sfx[:, d] = Σ_{i>=d} T[:, i]  (reverse cumsum; sfx[:, W] = 0)
        rc = np.cumsum(T[:, ::-1], axis=1, dtype=np.uint64)[:, ::-1]
        sfx = np.concatenate([rc, np.zeros((n, 1), dtype=np.uint64)], axis=1)
        # full hash + 1-deletion hashes
        H = np.zeros((n, W + 1), dtype=np.uint64)
        H[:, 0] = sfx[:, 0]
        dd = cols[None, :]
        H[:, 1:] = (P[:, :-1] * bpow[np.clip(lens[:, None] - 1 - dd, 0, W)]
                    + sfx[:, 1:])
        valid = np.ones((n, W + 1), dtype=bool)
        valid[:, 1:] = dd < lens[:, None]
        r1, _ = np.nonzero(valid)
        key_chunks.append(H[valid])
        row_chunks.append(r1)
        if k >= 2:
            for d in range(1, W):
                ii = cols[:W - d]
                mid = P[:, ii + d] - P[:, ii + 1] * bpow[d - 1]
                H2 = (P[:, ii] * bpow[np.clip(
                          lens[:, None] - 2 - ii[None, :], 0, W)]
                      + mid * bpow[np.clip(
                          lens[:, None] - 1 - ii[None, :] - d, 0, W)]
                      + sfx[:, ii + d + 1])
                v2 = (ii[None, :] + d) < lens[:, None]
                r2, _ = np.nonzero(v2)
                key_chunks.append(H2[v2])
                row_chunks.append(r2)
    rows = np.concatenate(row_chunks)
    keys = np.concatenate(key_chunks).view(np.int64)
    return pa.table({
        "band_id": pa.array(np.zeros(len(rows), dtype=np.int64)),
        "band_key": pa.array(keys),
        "doc_id": pa.array(ids[rows]),
        "name": names.take(pa.array(rows, type=pa.int64())),
    })


def _lcp_lcs(A, la, B, lb):
    """Vectorized longest-common-prefix / -suffix lengths for two padded
    byte matrices of equal width."""
    n, W = A.shape
    if W == 0:
        z = np.zeros(n, dtype=np.int64)
        return z, z
    cols = np.arange(W, dtype=np.int64)
    m = np.minimum(la, lb)
    eq = (A == B) & (cols[None, :] < m[:, None])
    lcp = np.cumprod(eq, axis=1).sum(axis=1)
    ridx = np.arange(n)[:, None]
    ia = la[:, None] - 1 - cols[None, :]
    ib = lb[:, None] - 1 - cols[None, :]
    Ar = np.where(ia >= 0, A[ridx, np.clip(ia, 0, W - 1)], 0)
    Br = np.where(ib >= 0, B[ridx, np.clip(ib, 0, W - 1)], 0)
    eqr = (Ar == Br) & (cols[None, :] < m[:, None])
    lcs = np.cumprod(eqr, axis=1).sum(axis=1)
    return lcp.astype(np.int64), lcs.astype(np.int64)


def edit1_mask(name_a, name_b) -> np.ndarray:
    """Exact byte-level edit-distance<=1 predicate, vectorized across
    the pair batch (see module docstring for the lcp+lcs equivalence).
    A null on either side never matches (SQL levenshtein semantics)."""
    import pyarrow.compute as _pc

    Ma, la = _byte_matrix(name_a)
    Mb, lb = _byte_matrix(name_b)
    W = max(Ma.shape[1], Mb.shape[1])
    if Ma.shape[1] < W:
        Ma = np.pad(Ma, ((0, 0), (0, W - Ma.shape[1])))
    if Mb.shape[1] < W:
        Mb = np.pad(Mb, ((0, 0), (0, W - Mb.shape[1])))
    lcp, lcs = _lcp_lcs(Ma, la, Mb, lb)
    mx = np.maximum(la, lb)
    out = (np.abs(la - lb) <= 1) & (lcp + lcs >= mx - 1)
    for col in (name_a, name_b):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.null_count:
            out &= np.asarray(_pc.is_valid(arr).to_numpy(
                zero_copy_only=False), dtype=bool)
    return out


def editk_mask(name_a, name_b, k: int) -> np.ndarray:
    """Exact byte-level edit-distance<=k predicate (banded Levenshtein,
    Ukkonen): dp over alignment offsets j-i in [-k, k], vectorized
    across the pair batch — maxlen × (2k+1) numpy steps per batch,
    never a per-pair Python DP.  Nulls never match.  ``k=1`` delegates
    to the closed-form lcp+lcs kernel."""
    import pyarrow.compute as _pc

    if k == 1:
        return edit1_mask(name_a, name_b)
    A, la = _byte_matrix(name_a)
    Bm, lb = _byte_matrix(name_b)
    W = max(A.shape[1], Bm.shape[1], 1)
    if A.shape[1] < W:
        A = np.pad(A, ((0, 0), (0, W - A.shape[1])))
    if Bm.shape[1] < W:
        Bm = np.pad(Bm, ((0, 0), (0, W - Bm.shape[1])))
    n = A.shape[0]
    BIG = np.int32(127)
    band = 2 * k + 1
    # dp column o+1 holds distance at (i, j=i+o-k); cols 0 / band+1 pad
    dp = np.full((n, band + 2), BIG, dtype=np.int32)
    for o in range(band):
        j = o - k
        dp[:, o + 1] = np.where((j >= 0) & (j <= lb), j, BIG)
    final = dp.copy()
    done = la == 0
    maxla = int(la.max()) if n else 0
    for i in range(1, maxla + 1):
        new = np.full((n, band + 2), BIG, dtype=np.int32)
        ai = A[:, i - 1] if i - 1 < W else np.zeros(n, dtype=A.dtype)
        for o in range(band):
            j = i + o - k
            if j < 0:
                continue
            if j >= 1:
                bj = Bm[:, j - 1] if j - 1 < W else np.zeros(n, dtype=Bm.dtype)
                sub = dp[:, o + 1] + np.where(ai == bj, 0, 1)
            else:
                sub = np.full(n, BIG, dtype=np.int32)
            dele = dp[:, o + 2] + 1
            ins = new[:, o] + 1
            val = np.minimum(np.minimum(sub, dele), ins)
            new[:, o + 1] = np.where(j <= lb, val, BIG)
        dp = new
        hit = (~done) & (la == i)
        final[hit] = dp[hit]
        done |= hit
    off = np.clip(lb - la + k, 0, band - 1)
    res = final[np.arange(n), off + 1]
    out = (np.abs(la - lb) <= k) & (res <= k)
    for col in (name_a, name_b):
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        if arr.null_count:
            out &= np.asarray(_pc.is_valid(arr).to_numpy(
                zero_copy_only=False), dtype=bool)
    return out


def _index_meta_path(index_dir: str) -> str:
    return index_dir.rstrip("/") + "_meta.json"


def build_fuzzy_key_index(
    ds: "object", index_dir: str, *, id_col: str, name_col: str, k: int = 1
) -> str:
    """Persist a relation's deletion-neighborhood key index as narrow
    parquet (band_id, band_key, doc_id, name) — the state that makes
    fuzzy matching INCREMENTAL: keys are computed once per committed
    name, and later increments probe this table instead of re-keying
    the corpus.  Names ride along (short identity strings) so the probe
    needs NO payload join.  Streaming write; never driver-materialized."""
    import json
    import os
    import shutil

    from ..functions.threads import single_threaded_kernels

    shutil.rmtree(index_dir, ignore_errors=True)

    def key_rows(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        return deletion_key_table(t, id_col=id_col, name_col=name_col, k=k)

    ds.map_batches(key_rows, batch_format="pyarrow").write_parquet(index_dir)
    # sidecar (OUTSIDE the parquet dir, so directory reads stay clean):
    # probes validate their k against the build k — a k=2 probe of a
    # k=1 index would silently lose recall otherwise
    with open(_index_meta_path(index_dir), "w") as f:
        json.dump({"k": k, "id_col": id_col, "name_col": name_col}, f)
    return index_dir


def incremental_fuzzy_pairs(
    new_ds: "object",
    index_dir: str,
    *,
    id_col: str,
    name_col: str,
    k: int = 1,
    max_bucket: int | None = None,
    metrics=None,
) -> "object":
    """Edit-distance<=1 pairs INVOLVING at least one new row, against a
    corpus whose deletion-key index was persisted by
    build_fuzzy_key_index — the entity-resolution analog of
    incremental_minhash_pairs.  Key compute is O(|increment|); the
    corpus contributes one streaming read of its narrow index (no
    re-keying); old×old pairs are dropped by the side filter before the
    pair-dedup exchange, so committed-corpus pairs are never recomputed.
    Equals fuzzy_pairs_edit1 over corpus ∪ increment restricted to
    new-involving pairs (test-pinned; requires disjoint id spaces, the
    same T2/T5 emit-once discipline as the minhash path)."""
    import json
    import os

    from ..functions.rayutil import read_parquet_clean
    from ..functions.threads import single_threaded_kernels

    if max_bucket is None:
        max_bucket = 512 if k == 1 else 4096
    mp = _index_meta_path(index_dir)
    if os.path.exists(mp):
        with open(mp) as f:
            stored_k = int(json.load(f).get("k", 1))
    else:
        # a pre-sidecar index can only have been built at k=1; assume
        # that rather than silently skipping the depth check, so a k>1
        # probe against an unlabeled index still fails loudly below
        # instead of silently losing recall.
        import warnings

        warnings.warn(
            f"fuzzy index at {index_dir} has no meta sidecar ({mp}); "
            "assuming it was built with k=1", stacklevel=2)
        stored_k = 1
    if stored_k < k:
        raise ValueError(
            f"index at {index_dir} was built with k={stored_k} but the "
            f"probe asks k={k}: stored neighborhoods are too shallow "
            "and recall would silently drop — rebuild the index at "
            f"k>={k}")

    def key_rows(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        return deletion_key_table(t, id_col=id_col, name_col=name_col, k=k)

    new_keys = new_ds.map_batches(key_rows, batch_format="pyarrow") \
                     .map_batches(_tag_side(1), batch_format="pyarrow")
    stored = read_parquet_clean(index_dir).map_batches(
        _tag_side(0), batch_format="pyarrow")
    both = stored.union(new_keys).map_batches(
        _add_bucket_part, batch_format="pyarrow", batch_size=65536)

    def gen(g):
        out = _partition_pairs(g, max_bucket=max_bucket,
                               extra_cols=("name", "side"), metrics=metrics,
                               metric_prefix="inc_fuzzy")
        out = out[(out["side_a"].to_numpy(dtype=np.int64)
                   + out["side_b"].to_numpy(dtype=np.int64)) >= 1]
        return out[["a", "b", "name_a", "name_b"]]

    pairs = both.groupby("ph").map_groups(gen, batch_format="pandas")
    pairs = _dedup_pairs(pairs, ["a", "b", "name_a", "name_b"])

    return pairs.map_batches(_verify_pairs, fn_kwargs={"k": k},
                             batch_format="pyarrow")


def fuzzy_pairs(
    ds: "object",
    *,
    id_col: str,
    name_col: str,
    k: int = 1,
    max_bucket: int | None = None,
    metrics=None,
    pre_split_rows: int | None = 65536,
) -> "object":
    """All (a < b) id pairs whose names are within byte edit distance
    ``k`` (1 or 2), with both names attached: FastSS deletion-key
    blocking -> capped coarse-bucket self-merge -> global pair dedup ->
    exact vectorized verify (banded DP for k=2).  max_bucket guards
    degenerate key skew (mass-duplicate names); caps are counted into
    ``metrics`` under the ``fuzzy_`` prefix so any recall loss is
    observable, and the defaults (512 for k=1, 4096 for k=2 — 2-byte
    neighborhoods are naturally larger) are sized so natural
    neighborhoods never cap.

    ``pre_split_rows`` splits any pre-shuffle block larger than that
    many rows (``repartition(target_num_rows_per_block=...)`` — ONLY
    splits, never merges, so it is safe at any corpus size): Ray's
    sort-based groupby derives reduce parallelism from input block
    count, and producer tasks pack output at ~128 MB/block, so a
    medium corpus otherwise runs the expensive pair-generation/verify
    reduces on 2-3 partitions while the bucket space has 64 (measured:
    k=2 over 15k names = 2.6M key rows packed into 2 blocks -> 2-task
    pair generation, 21 s; split -> ~40-way, ~2.3x faster end to
    end).  A corpus already streaming in many small blocks is left
    untouched.  None disables."""
    from ..functions.threads import single_threaded_kernels

    if max_bucket is None:
        max_bucket = 512 if k == 1 else 4096

    def key_rows(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        return deletion_key_table(t, id_col=id_col, name_col=name_col, k=k)

    keys = ds.map_batches(key_rows, batch_format="pyarrow")
    keys = keys.map_batches(_add_bucket_part, batch_format="pyarrow",
                            batch_size=65536)
    if pre_split_rows:
        keys = keys.repartition(target_num_rows_per_block=pre_split_rows)
    pairs = keys.groupby("ph").map_groups(
        lambda g: _partition_pairs(g, max_bucket=max_bucket,
                                   extra_cols=("name",), metrics=metrics,
                                   metric_prefix="fuzzy"),
        batch_format="pandas",
    )
    # the candidate stream is ~an order of magnitude taller than the key
    # stream (every bucket self-merge multiplies), and a sort shuffle's
    # intermediate-object count grows as blocks^2 — splitting it at the
    # keys' row target produced 460+ blocks and a 4x SLOWDOWN (measured);
    # 8x the target lands near the same ~64-block sweet spot as the keys
    pairs = _dedup_pairs(pairs, ["a", "b", "name_a", "name_b"],
                         pre_split_rows=(pre_split_rows * 8
                                         if pre_split_rows else None))

    return pairs.map_batches(_verify_pairs, fn_kwargs={"k": k},
                             batch_format="pyarrow")


def fuzzy_pairs_edit1(ds: "object", *, id_col: str, name_col: str,
                      max_bucket: int | None = None, metrics=None) -> "object":
    """Back-compat alias: fuzzy_pairs at k=1."""
    return fuzzy_pairs(ds, id_col=id_col, name_col=name_col, k=1,
                       max_bucket=max_bucket, metrics=metrics)
