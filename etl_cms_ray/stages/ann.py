"""Similarity search over an embedding column (list<float>).

- brute_force_topk: exact cosine top-k — per batch, one numpy matmul
  against a broadcast query matrix (`ray.put` once, fetched per actor),
  per-batch top-k partials, then a tiny global reduce per query.
- lsh_topk: random-hyperplane LSH variant (the scale path): only rows
  whose sign-bucket matches a query's bucket (within probe distance) are
  scored, trading recall for a ~2^bits candidate reduction.
- cosine_pairs: embedding near-duplicate pairs above a cosine threshold
  (brute-force within LSH buckets).
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def _to_matrix(col) -> np.ndarray:
    """list<float> column -> (n, d) float64 matrix."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def _canonical_order(M: np.ndarray) -> np.ndarray:
    """Rows in a value-determined order (lexicographic by dimension).
    Training samples arrive in Ray block order, which can differ between
    executions of the same read — and k-means first-rows init + mean
    accumulation order would leak that nondeterminism into the model."""
    return M[np.lexsort(M.T[::-1])]


class BatchScorer:
    """Per-batch exact cosine scores vs the broadcast query matrix; emits
    each batch's local top-k candidates per query."""

    def __init__(self, queries_ref, k: int, id_col: str = "vec_id",
                 emb_col: str = "embedding", exclude_self: bool = True,
                 round_digits: int | None = None):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.query_ids = np.asarray(q["ids"])
        self.Q = _normalize(np.asarray(q["vecs"], dtype=np.float64))
        self.k = k
        self.id_col, self.emb_col = id_col, emb_col
        self.exclude_self = exclude_self
        self.round_digits = round_digits

    def _extra_mask(self, batch: pa.Table):
        """Optional (n_rows, n_queries) bool mask of EXCLUDED candidates;
        subclass hook (e.g. hard-negative label masking).  None = no
        extra exclusions."""
        return None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table(
                {
                    "query_id": pa.array([], type=pa.int64()),
                    "neighbor_id": pa.array([], type=pa.int64()),
                    "score": pa.array([], type=pa.float64()),
                }
            )
        ids = batch[self.id_col].to_numpy(zero_copy_only=False)
        M = _normalize(_to_matrix(batch[self.emb_col]))
        scores = M @ self.Q.T  # (n, q)
        if self.exclude_self:
            self_mask = ids[:, None] == self.query_ids[None, :]
            scores = np.where(self_mask, -np.inf, scores)
        extra = self._extra_mask(batch)
        if extra is not None:
            scores = np.where(extra, -np.inf, scores)
        k = min(self.k, scores.shape[0])
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(self.query_ids):
            col = scores[:, j]
            # deterministic local top-k on the SAME key the global stage
            # ranks by: the (possibly rounded) score with smallest-id
            # tie-break — selecting on raw scores could evict a rounded-tie
            # candidate the oracle keeps
            if self.round_digits is not None:
                scale = float(10 ** self.round_digits)
                key = np.floor(col * scale + 0.5) / scale
            else:
                key = col
            order = np.lexsort((ids, -key))[:k]
            for i in order:
                if np.isfinite(col[i]):
                    out_q.append(qid)
                    out_n.append(ids[i])
                    out_s.append(col[i])
        return pa.table(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_n, type=pa.int64()),
                "score": pa.array(out_s, type=pa.float64()),
            }
        )


def _global_topk_fn(k: int, round_digits: int | None = None):
    """Per-query final reducer shared by every top-k operator.  The
    deterministic tie-break contract — (optionally floor-quantized)
    score desc, neighbor_id asc — is load-bearing for oracle comparison,
    so exactly ONE copy of it exists."""

    def global_topk(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        if round_digits is not None:
            scale = float(10 ** round_digits)
            g["score"] = np.floor(g["score"] * scale + 0.5) / scale
        g = g.sort_values(["score", "neighbor_id"], ascending=[False, True],
                          kind="mergesort")
        g = g.head(k).reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return global_topk


def brute_force_topk(
    vectors: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
    round_digits: int | None = 4,
) -> "ray.data.Dataset":
    """Exact cosine top-k for each query vector.

    Two-level: per-batch local top-k (map_batches, vectorized matmul) then
    per-query global top-k (tiny groupby over k x num_batches rows).
    Deterministic tie-break: (rounded score desc, neighbor_id asc).
    """
    queries_ref = ray.put({"ids": np.asarray(query_ids), "vecs": np.asarray(query_vecs)})
    partials = vectors.map_batches(
        BatchScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k, id_col=id_col,
                                   emb_col=emb_col, round_digits=round_digits),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )

    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k, round_digits), batch_format="pandas"
    )


def hard_negative_topk(
    vectors: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    query_labels: np.ndarray,
    k: int = 5,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    label_col: str = "label",
    concurrency: int = 4,
    round_digits: int | None = 4,
) -> "ray.data.Dataset":
    """Hard-negative mining for contrastive/retrieval training: for each
    query, the exact cosine top-k among vectors whose ``label_col``
    DIFFERS from the query's — the highest-similarity wrong-class
    examples.  Same two-level scale shape as brute_force_topk (broadcast
    query matrix, per-batch vectorized matmul + local top-k, bounded
    per-query final); the label exclusion is one vectorized (n, q) mask
    through the BatchScorer hook, so the corpus still streams in a
    single pass."""
    queries_ref = ray.put({
        "ids": np.asarray(query_ids), "vecs": np.asarray(query_vecs),
        "labels": np.asarray(query_labels),
    })

    class LabelMaskScorer(BatchScorer):
        def __init__(self, queries_ref, k, id_col, emb_col, label_col,
                     round_digits):
            q = ray.get(queries_ref)
            super().__init__({"ids": q["ids"], "vecs": q["vecs"]}, k,
                             id_col, emb_col, round_digits=round_digits)
            self.q_labels = np.asarray(q["labels"])
            self.label_col = label_col

        def _extra_mask(self, batch: pa.Table):
            labels = batch[self.label_col].to_numpy(zero_copy_only=False)
            return labels[:, None] == self.q_labels[None, :]

    partials = vectors.map_batches(
        LabelMaskScorer,
        fn_constructor_kwargs=dict(
            queries_ref=queries_ref, k=k, id_col=id_col, emb_col=emb_col,
            label_col=label_col, round_digits=round_digits),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )
    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k, round_digits), batch_format="pandas"
    )


def hyperplane_buckets(M: np.ndarray, planes: np.ndarray) -> np.ndarray:
    """Sign-pattern bucket id per row: bit b set iff M @ planes[b] > 0."""
    signs = (M @ planes.T) > 0  # (n, bits)
    weights = (1 << np.arange(planes.shape[0], dtype=np.int64))
    return signs.astype(np.int64) @ weights


def lsh_topk(
    vectors: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    bits: int = 8,
    seed: int = 11,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
    probe_radius: int = 1,
    round_digits: int | None = None,
) -> "ray.data.Dataset":
    """Approximate top-k via multi-probe hyperplane LSH: score only rows
    whose sign-bucket is within hamming ``probe_radius`` of a query's
    bucket.  Candidate fraction ~ sum_{i<=r} C(bits,i) / 2^bits per query
    (recall < 1); radius 0 is classic single-bucket LSH.
    ``round_digits`` applies the brute_force_topk floor-quantized
    ranking discipline (score desc on the 10^-d grid, neighbor_id asc)
    so the result is bit-comparable against a SQL oracle."""
    dim = np.asarray(query_vecs).shape[1]
    planes = np.random.RandomState(seed).standard_normal((bits, dim))
    q_buckets = hyperplane_buckets(_normalize(np.asarray(query_vecs, dtype=np.float64)), planes)
    queries_ref = ray.put(
        {"ids": np.asarray(query_ids), "vecs": np.asarray(query_vecs),
         "buckets": q_buckets, "planes": planes, "probe_radius": probe_radius}
    )

    class BucketScorer(BatchScorer):
        def __init__(self, queries_ref, k, id_col, emb_col, round_digits):
            q = ray.get(queries_ref)
            super().__init__({"ids": q["ids"], "vecs": q["vecs"]}, k, id_col,
                             emb_col, round_digits=round_digits)
            self.planes = q["planes"]
            self.q_buckets = np.asarray(q["buckets"], dtype=np.uint64)
            self.radius = int(q["probe_radius"])

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return super().__call__(batch)
            M = _normalize(_to_matrix(batch[self.emb_col]))
            buckets = hyperplane_buckets(M, self.planes).astype(np.uint64)
            # multi-probe: row qualifies if its signature is within hamming
            # radius of ANY query signature — one vectorized popcount over
            # the (n, q) xor matrix
            xor = buckets[:, None] ^ self.q_buckets[None, :]
            b8 = xor.copy().view(np.uint8).reshape(xor.shape[0], xor.shape[1], 8)
            ham = np.unpackbits(b8, axis=2).sum(axis=2)  # (n, q)
            mask = (ham <= self.radius).any(axis=1)
            return super().__call__(batch.filter(pa.array(mask)))

    partials = vectors.map_batches(
        BucketScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k, id_col=id_col,
                                   emb_col=emb_col, round_digits=round_digits),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )

    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k, round_digits), batch_format="pandas"
    )


def train_centroids(
    vectors: "ray.data.Dataset",
    n_cells: int = 32,
    sample_size: int = 2048,
    iters: int = 8,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Spherical k-means centroids from a deterministic sample.

    The sample is ``limit(sample_size)`` — the streaming executor stops
    the scan after enough blocks, so training reads a bounded prefix no
    matter the corpus size; Lloyd runs on the driver over a
    (sample_size x dim) matrix (a few MB).  Deterministic: first-rows
    init, no RNG, ties broken by lowest cell index.  Empty cells keep
    their previous centroid.  Returns L2-normalized (n_cells, dim).
    """
    sample = vectors.select_columns([emb_col]).limit(sample_size).to_pandas()
    M = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    M = _canonical_order(M)
    n_cells = min(n_cells, len(M))
    C = M[:n_cells].copy()
    for _ in range(iters):
        assign = np.argmax(M @ C.T, axis=1)  # ties -> lowest index
        for c in range(n_cells):
            members = M[assign == c]
            if len(members):
                C[c] = members.mean(axis=0)
        C = _normalize(C)
    return C


def ivf_topk(
    vectors: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_cells: int = 32,
    nprobe: int = 4,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
    centroids: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """Approximate top-k via an IVF (inverted-file) coarse quantizer —
    the classic many-queries scale path alongside lsh_topk: vectors are
    assigned to their nearest spherical-k-means centroid per batch (one
    matmul), and only rows whose cell is among some query's ``nprobe``
    closest cells are scored.  Candidate fraction ~ nprobe / n_cells;
    recall rises with nprobe (nprobe = n_cells is exact).

    At cluster scale the centroid matrix ships once via ray.put (a few
    hundred KB); no shuffle — the scan stays a single streaming pass,
    exactly like brute_force_topk, just masked.

    ``centroids`` skips training (the persisted-index path: the stored
    quantizer must keep scoring new corpus states — see build_ivf_index).
    """
    C = centroids if centroids is not None else train_centroids(
        vectors, n_cells=n_cells, sample_size=sample_size, emb_col=emb_col)
    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    order = np.argsort(-(Q @ C.T), axis=1, kind="stable")
    probe = order[:, : min(nprobe, C.shape[0])]  # (q, nprobe)
    probed_cells = np.unique(probe)
    queries_ref = ray.put(
        {"ids": np.asarray(query_ids), "vecs": np.asarray(query_vecs),
         "centroids": C, "probed": probed_cells}
    )

    class CellScorer(BatchScorer):
        def __init__(self, queries_ref, k, id_col, emb_col):
            q = ray.get(queries_ref)
            super().__init__({"ids": q["ids"], "vecs": q["vecs"]}, k, id_col, emb_col)
            self.C = q["centroids"]
            self.probed = q["probed"]

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return super().__call__(batch)
            M = _normalize(_to_matrix(batch[self.emb_col]))
            cells = np.argmax(M @ self.C.T, axis=1)
            mask = np.isin(cells, self.probed)
            return super().__call__(batch.filter(pa.array(mask)))

    partials = vectors.map_batches(
        CellScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k, id_col=id_col,
                                   emb_col=emb_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )

    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k), batch_format="pandas"
    )


def _ivf_assign_batch(batch: pa.Table, *, C: np.ndarray, id_col: str,
                      emb_col: str) -> pa.Table:
    """Assign each vector to its nearest stored centroid and sort the
    batch by cell — cell-sorted row groups are what lets the probed read
    prune by parquet [min,max] stats."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    if batch.num_rows == 0:
        return pa.table({"cell": pa.array([], type=pa.int32()),
                         id_col: batch[id_col], emb_col: batch[emb_col]})
    M = _normalize(_to_matrix(batch[emb_col]))
    cells = np.argmax(M @ C.T, axis=1).astype(np.int32)
    t = pa.table({"cell": pa.array(cells), id_col: batch[id_col],
                  emb_col: batch[emb_col]})
    return t.take(pc.sort_indices(t["cell"]))


def build_ivf_index(
    vectors: "ray.data.Dataset",
    index_dir: str,
    *,
    n_cells: int = 32,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """Persist an IVF index as a lake-side artifact: the trained
    centroid matrix (one tiny parquet — model width, not data scale)
    plus cell-assigned postings (cell int32, id, embedding) written
    cell-sorted per file so probed reads prune row groups by parquet
    column stats.  This is the vector sibling of
    dedup.build_minhash_band_index: the expensive global pass (train +
    assign) runs once per corpus; every later crawl increment extends
    the postings in O(increment) (extend_ivf_index) and every query
    batch reads only its nprobe cells (ivf_index_topk) — the committed
    corpus is never re-embedded, re-assigned or fully rescanned."""
    import shutil

    import pyarrow.parquet as _pq

    shutil.rmtree(index_dir, ignore_errors=True)
    os.makedirs(index_dir, exist_ok=True)
    C = train_centroids(vectors, n_cells=n_cells, sample_size=sample_size,
                        emb_col=emb_col)
    _pq.write_table(
        pa.table({"cell": pa.array(np.arange(len(C), dtype=np.int32)),
                  "centroid": pa.array(list(C))}),
        os.path.join(index_dir, "centroids.parquet"),
    )
    vectors.map_batches(
        _ivf_assign_batch, fn_kwargs=dict(C=C, id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow", batch_size=4096,
    ).write_parquet(os.path.join(index_dir, "postings"))
    return index_dir


def _ivf_centroids(index_dir: str) -> np.ndarray:
    import pyarrow.parquet as _pq

    t = _pq.read_table(os.path.join(index_dir, "centroids.parquet"))
    return np.stack(t["centroid"].to_pylist()).astype(np.float64)


def extend_ivf_index(
    new_vectors: "ray.data.Dataset",
    index_dir: str,
    *,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> str:
    """Incremental index maintenance: assign ONLY the new vectors to the
    STORED centroids and append their postings files — O(new batch)
    compute, zero reads of existing postings.  The quantizer is frozen
    at build time (the standard IVF production contract: retrain +
    rebuild when drift accumulates; until then the same cells keep both
    sides of the corpus comparable — and equality with a full-corpus
    ivf_topk run under the same centroids is test-pinned)."""
    C = _ivf_centroids(index_dir)
    new_vectors.map_batches(
        _ivf_assign_batch, fn_kwargs=dict(C=C, id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow", batch_size=4096,
    ).write_parquet(os.path.join(index_dir, "postings"))
    return index_dir


def ivf_index_topk(
    index_dir: str,
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    nprobe: int = 4,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Top-k against the persisted IVF index: rank cells for the query
    batch on the driver (centroid matrix is model-width), then read ONLY
    postings rows in the probed cells — the `cell in probed` predicate
    pushes into the parquet scan, so cell-sorted row groups outside the
    probe set never leave storage (candidate fraction ~ nprobe/n_cells
    of the INDEX, not of the corpus files).  Scoring and the bounded
    per-query final reduce are shared with brute_force_topk."""
    import pyarrow.dataset as _pds

    from ..functions.rayutil import read_parquet_clean

    C = _ivf_centroids(index_dir)
    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    order = np.argsort(-(Q @ C.T), axis=1, kind="stable")
    probed = np.unique(order[:, : min(nprobe, C.shape[0])])
    queries_ref = ray.put({"ids": np.asarray(query_ids),
                           "vecs": np.asarray(query_vecs)})
    postings = read_parquet_clean(
        os.path.join(index_dir, "postings"),
        filter=_pds.field("cell").isin([int(c) for c in probed]),
    )
    partials = postings.map_batches(
        BatchScorer,
        fn_constructor_kwargs=dict(queries_ref=queries_ref, k=k, id_col=id_col,
                                   emb_col=emb_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )
    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k), batch_format="pandas"
    )


def cosine_pairs(
    vectors: "ray.data.Dataset",
    threshold: float = 0.9,
    bits: int = 8,
    seed: int = 17,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    max_bucket: int = 512,
    metrics=None,
    round_digits: int = 6,
    vec_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """Embedding near-duplicate pairs (a < b, cosine >= threshold).

    ``metrics``: optional MetricCounterActor (stages/metrics.py) —
    buckets over ``max_bucket`` are skipped (skew guard) and counted
    there rather than dropped silently.

    Scale path, the same shape as minhash_lsh_pairs: random-hyperplane
    band buckets co-locate candidates (vectors with cosine >= ~0.9 agree
    on most hyperplane signs, so they share at least one of the 4 probe
    bands of the bit signature); the band explode ships (band, bucket,
    id) rows ONLY — never the vectors, which in the earlier design moved
    4x through the shuffle as list<float64> (8x the float32 source
    bandwidth); candidate pairs are generated by one vectorized
    self-merge per coarse hash partition; then the original embedding
    column is attached per pair via two task-based co-group hash joins
    (stages/join.py) and verified with an exact float64 rowwise dot.
    """

    def add_buckets(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"band_id": pa.array([], type=pa.int32()),
                             "band_key": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        M = _normalize(_to_matrix(batch[emb_col]))
        planes = np.random.RandomState(seed).standard_normal((bits, M.shape[1]))
        sig = hyperplane_buckets(M, planes)  # full bit signature
        # 4 probe bands of bits/4 bits each: near-identical vectors agree
        # on at least one band with high probability
        bandsz = max(1, bits // 4)
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        out_band, out_bucket, out_id = [], [], []
        for band in range(4):
            key = (sig >> (band * bandsz)) & ((1 << bandsz) - 1)
            out_band.append(np.full(len(ids), band, dtype=np.int32))
            out_bucket.append(key.astype(np.int64))
            out_id.append(ids)
        return pa.table(
            {
                "band_id": pa.array(np.concatenate(out_band)),
                "band_key": pa.array(np.concatenate(out_bucket)),
                "doc_id": pa.array(np.concatenate(out_id)),
            }
        )

    from .dedup import (_add_bucket_part, _attach_pair_vectors, _dedup_pairs,
                        _partition_pairs)

    exploded = vectors.map_batches(add_buckets, batch_format="pyarrow")
    exploded = exploded.map_batches(_add_bucket_part, batch_format="pyarrow",
                                    batch_size=65536)
    pairs = exploded.groupby("ph").map_groups(
        lambda g: _partition_pairs(g, max_bucket=max_bucket, metrics=metrics,
                                   metric_prefix="ann"),
        batch_format="pandas",
    )
    pairs = _dedup_pairs(pairs, ["a", "b"])
    with_ab = _attach_pair_vectors(pairs, vectors, id_col, emb_col,
                                   vec_type=vec_type)

    return with_ab.map_batches(
        _verify_cosine_batch,
        fn_kwargs=dict(threshold=threshold, round_digits=round_digits),
        batch_format="pyarrow", batch_size=8192)


def _verify_cosine_batch(batch: pa.Table, *, threshold: float,
                         round_digits: int) -> pa.Table:
    """Exact-cosine verify over attached pair vectors (shared by the
    hyperplane-blocked and kmeans-blocked candidate generators)."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    if batch.num_rows == 0:
        return pa.table({"a": pa.array([], type=pa.int64()),
                         "b": pa.array([], type=pa.int64()),
                         "cosine": pa.array([], type=pa.float64())})
    A = _normalize(_to_matrix(batch["vec_a"]))
    B = _normalize(_to_matrix(batch["vec_b"]))
    # matmul-grade accumulation: einsum over float64 rows (the oracle
    # recomputes from the same source column, so only quantized values
    # are compared — CLAUDE.md rule 4 floor-quantization below)
    cos = np.einsum("ij,ij->i", A, B)
    mask = cos >= threshold
    scale = float(10 ** round_digits)
    return pa.table(
        {
            "a": batch["a"].filter(pa.array(mask)),
            "b": batch["b"].filter(pa.array(mask)),
            "cosine": pa.array(np.floor(cos[mask] * scale + 0.5) / scale,
                               type=pa.float64()),
        }
    )


def semdedup_pairs(
    vectors: "ray.data.Dataset",
    k: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    iters: int = 4,
    sample_size: int = 2048,
    max_cluster: int = 4096,
    metrics=None,
    round_digits: int = 6,
    vec_type: pa.DataType | None = None,
) -> "ray.data.Dataset":
    """SemDeDup-style semantic near-duplicate pairs: candidates are
    blocked by SPHERICAL K-MEANS CELL (Abbas et al. 2023's semantic
    clusters) instead of hyperplane bands — within a cell everything is
    a candidate, across cells nothing is (the paper's explicit trade:
    semantic duplicates co-locate in centroid space, so intra-cluster
    comparison finds them at k× less pair volume than global LSH; a
    pair straddling a cell boundary is out of contract).

    Topology is the cosine_pairs chain with the blocking stage swapped:
    one deterministic kmeans fit (streaming passes, centroids ship via
    ray.put), one assignment pass emitting (cell, id) rows ONLY — the
    vectors never enter the shuffle — then the shared coarse-partition
    pair generator (cell skew capped at ``max_cluster``, drops counted
    into ``metrics``), one-pass vector attach, exact-cosine verify."""
    from .dedup import (_add_bucket_part, _attach_pair_vectors, _dedup_pairs,
                        _partition_pairs)

    # many consumers (iters+1 kmeans passes, the assignment pass, the
    # pair-vector attach): materialize the vector table ONCE or every
    # consumer re-executes the whole upstream derivation — measured 12 s
    # -> ~3 s at sf0.1 (O(V·dim) in the object store, spill-safe)
    vectors = vectors.materialize()
    C = kmeans_fit(vectors, k=k, iters=iters, sample_size=sample_size,
                   emb_col=emb_col)
    ref = ray.put(C)

    def add_cell(batch: pa.Table, _ref=ref) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        if batch.num_rows == 0:
            return pa.table({"band_id": pa.array([], type=pa.int32()),
                             "band_key": pa.array([], type=pa.int64()),
                             "doc_id": pa.array([], type=pa.int64())})
        Cm = ray.get(_ref)
        M = _normalize(_to_matrix(batch[emb_col]))
        cells = np.argmax(M @ Cm.T, axis=1).astype(np.int64)
        return pa.table(
            {
                "band_id": pa.array(
                    np.zeros(batch.num_rows, dtype=np.int32)),
                "band_key": pa.array(cells),
                "doc_id": pa.array(
                    batch[id_col].to_numpy(zero_copy_only=False)),
            }
        )

    exploded = vectors.map_batches(add_cell, batch_format="pyarrow")
    exploded = exploded.map_batches(_add_bucket_part, batch_format="pyarrow",
                                    batch_size=65536)
    pairs = exploded.groupby("ph").map_groups(
        lambda g: _partition_pairs(g, max_bucket=max_cluster, metrics=metrics,
                                   metric_prefix="semdedup"),
        batch_format="pandas",
    )
    pairs = _dedup_pairs(pairs, ["a", "b"])
    with_ab = _attach_pair_vectors(pairs, vectors, id_col, emb_col,
                                   vec_type=vec_type)
    return with_ab.map_batches(
        _verify_cosine_batch,
        fn_kwargs=dict(threshold=threshold, round_digits=round_digits),
        batch_format="pyarrow", batch_size=8192)


# ---------------------------------------------------------------------------
# Product quantization (PQ): compress embeddings to uint8 codes, search
# with asymmetric distance computation (ADC)


def train_pq(
    vectors: "ray.data.Dataset",
    n_subspaces: int = 8,
    n_codes: int = 16,
    sample_size: int = 2048,
    iters: int = 8,
    emb_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace k-means codebooks from a bounded deterministic sample
    (same sampling/determinism contract as ``train_centroids``:
    ``limit(sample_size)`` prefix, first-rows init, no RNG, argmin ties
    to the lowest code).  Vectors are L2-normalized BEFORE splitting, so
    summed per-subspace inner products approximate cosine.  Returns
    ``(n_subspaces, n_codes, dim // n_subspaces)`` float64; dim must
    divide evenly (a transparent failure beats silent zero-padding)."""
    sample = vectors.select_columns([emb_col]).limit(sample_size).to_pandas()
    M = _normalize(np.stack(sample[emb_col].to_numpy()).astype(np.float64))
    M = _canonical_order(M)
    n, dim = M.shape
    if dim % n_subspaces:
        raise ValueError(f"dim {dim} not divisible by n_subspaces {n_subspaces}")
    dsub = dim // n_subspaces
    n_codes = min(n_codes, n)
    books = np.empty((n_subspaces, n_codes, dsub), dtype=np.float64)
    for s in range(n_subspaces):
        X = M[:, s * dsub : (s + 1) * dsub]
        C = X[:n_codes].copy()
        for _ in range(iters):
            # squared-L2 assignment (== max dot only for unit rows, and
            # SUBvectors are not unit): ||x-c||^2 = ||x||^2 - 2xc + ||c||^2
            d2 = (
                -2.0 * (X @ C.T)
                + np.sum(C * C, axis=1)[None, :]
            )
            assign = np.argmin(d2, axis=1)  # ties -> lowest code
            for c in range(n_codes):
                members = X[assign == c]
                if len(members):
                    C[c] = members.mean(axis=0)
        books[s] = C
    return books


def _pq_codes(M: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, dim) float -> (n, n_subspaces) uint8 nearest-code assignment."""
    n_sub, _n_codes, dsub = books.shape
    codes = np.empty((M.shape[0], n_sub), dtype=np.uint8)
    for s in range(n_sub):
        X = M[:, s * dsub : (s + 1) * dsub]
        C = books[s]
        d2 = -2.0 * (X @ C.T) + np.sum(C * C, axis=1)[None, :]
        codes[:, s] = np.argmin(d2, axis=1).astype(np.uint8)
    return codes


def pq_encode(
    vectors: "ray.data.Dataset",
    codebooks: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> "ray.data.Dataset":
    """Compress the embedding column to PQ codes: one uint8 per subspace
    per row (e.g. 64-dim float32 -> 8 bytes, 32x).  Streaming map_batches
    with the codebooks broadcast once via ray.put — the storage-side
    operator; ``pq_topk`` searches such codes with full-precision
    queries (ADC)."""
    books_ref = ray.put(np.ascontiguousarray(codebooks))

    def encode(batch: pa.Table, *, books_ref=books_ref) -> pa.Table:
        books = ray.get(books_ref)
        if batch.num_rows == 0:
            return pa.table(
                {id_col: pa.array([], type=pa.int64()),
                 "code": pa.array([], type=pa.list_(pa.uint8()))}
            )
        M = _normalize(_to_matrix(batch[emb_col]))
        codes = _pq_codes(M, books)
        return pa.table(
            {
                id_col: batch[id_col],
                "code": pa.FixedSizeListArray.from_arrays(
                    pa.array(codes.reshape(-1), type=pa.uint8()), codes.shape[1]
                ).cast(pa.list_(pa.uint8())),
            }
        )

    return vectors.map_batches(encode, batch_format="pyarrow", batch_size=4096)


def pq_topk(
    vectors: "ray.data.Dataset",
    query_ids: np.ndarray,
    query_vecs: np.ndarray,
    k: int = 5,
    n_subspaces: int = 8,
    n_codes: int = 64,
    sample_size: int = 2048,
    rerank: int = 8,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    concurrency: int = 4,
) -> "ray.data.Dataset":
    """Approximate cosine top-k over PQ-compressed vectors via ADC with
    exact re-ranking: queries stay full precision; per (query, subspace,
    code) inner products are precomputed ONCE into a lookup table, so
    the bulk scan scores a row with ``n_subspaces`` uint8 gathers + adds
    instead of a dim-length dot — the memory-bound scale path (LUT ships
    via ray.put; one streaming pass, no shuffle).  Per batch, each
    query's top ``rerank * k`` ADC candidates get an exact dot product
    (the standard IVFPQ re-rank step — ADC distortion ~ the tiny cosine
    margins between true neighbors on near-random corpora, so raw ADC
    ordering alone loses recall), and the emitted scores are EXACT —
    comparable across batches and to brute force.

    Self-matches are excluded by id (same contract as brute_force_topk);
    recall vs exact is reported by the catalog entry."""
    books = train_pq(vectors, n_subspaces=n_subspaces, n_codes=n_codes,
                     sample_size=sample_size, emb_col=emb_col)
    Q = _normalize(np.asarray(query_vecs, dtype=np.float64))
    n_sub, real_codes, dsub = books.shape
    # LUT[q, s, c] = <Q_sub, C_c>: all the dot products ADC will ever need
    lut = np.einsum(
        "qsd,scd->qsc", Q.reshape(Q.shape[0], n_sub, dsub), books
    )
    state_ref = ray.put(
        {"ids": np.asarray(query_ids), "books": books, "lut": lut,
         "qvecs": Q}
    )

    class ADCScorer:
        def __init__(self, state_ref, k, rerank, id_col, emb_col):
            s = ray.get(state_ref)
            self.query_ids = s["ids"]
            self.books = s["books"]
            self.lut = s["lut"]  # (q, n_sub, n_codes)
            self.Q = s["qvecs"]  # full-precision queries for the re-rank
            self.k = k
            self.shortlist = max(k, rerank * k)
            self.id_col, self.emb_col = id_col, emb_col

        def __call__(self, batch: pa.Table) -> pa.Table:
            if batch.num_rows == 0:
                return pa.table(
                    {"query_id": pa.array([], type=pa.int64()),
                     "neighbor_id": pa.array([], type=pa.int64()),
                     "score": pa.array([], type=pa.float64())}
                )
            ids = batch[self.id_col].to_numpy(zero_copy_only=False)
            M = _normalize(_to_matrix(batch[self.emb_col]))
            codes = _pq_codes(M, self.books)  # (n, n_sub)
            nq = self.lut.shape[0]
            scores = np.zeros((len(ids), nq), dtype=np.float64)
            for s in range(codes.shape[1]):
                # gather the subspace's code dot-products for every query
                scores += self.lut[:, s, codes[:, s]].T  # (n, q)
            self_mask = ids[:, None] == self.query_ids[None, :]
            scores = np.where(self_mask, -np.inf, scores)
            R = min(self.shortlist, scores.shape[0])
            k = min(self.k, scores.shape[0])
            out_q, out_n, out_s = [], [], []
            for j, qid in enumerate(self.query_ids):
                col = scores[:, j]
                short = np.lexsort((ids, -col))[:R]
                short = short[np.isfinite(col[short])]
                if not len(short):
                    continue
                # exact re-rank of the ADC shortlist only: R dot products
                # per (query, batch), not n
                ex = M[short] @ self.Q[j]
                order = np.lexsort((ids[short], -ex))[:k]
                for i in order:
                    out_q.append(qid)
                    out_n.append(ids[short[i]])
                    out_s.append(ex[i])
            return pa.table(
                {"query_id": pa.array(out_q, type=pa.int64()),
                 "neighbor_id": pa.array(out_n, type=pa.int64()),
                 "score": pa.array(out_s, type=pa.float64())}
            )

    partials = vectors.map_batches(
        ADCScorer,
        fn_constructor_kwargs=dict(state_ref=state_ref, k=k, rerank=rerank,
                                   id_col=id_col, emb_col=emb_col),
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, concurrency),
    )
    return partials.groupby("query_id").map_groups(
        _global_topk_fn(k), batch_format="pandas"
    )


def group_centroids(
    vectors: "ray.data.Dataset",
    group_col: str = "label",
    emb_col: str = "embedding",
) -> dict:
    """Exact per-group mean vector over a BOUNDED group key (labels,
    languages, shards — dimension-sized, never doc-sized).

    Scale shape: one streaming pass; each batch reduces to one
    (group, sum-vector, count) row per group present (a vectorized
    pandas groupby over the batch matrix), so the driver materializes
    only n_batches x n_groups partial rows — never vectors.  Returns
    {group: (dim,) float64 centroid}.
    """
    def partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        m = _to_matrix(t[emb_col])
        g = t[group_col].to_numpy(zero_copy_only=False)
        df = pd.DataFrame(m)
        df["_g"] = g
        agg = df.groupby("_g", sort=False).sum()
        cnt = df.groupby("_g", sort=False).size()
        return pa.table({
            "g": pa.array(agg.index.to_numpy()),
            "s": pa.array(list(agg.to_numpy()),
                          type=pa.list_(pa.float64())),
            "n": pa.array(cnt.to_numpy(), type=pa.int64()),
        })

    rows = vectors.select_columns([group_col, emb_col]).map_batches(
        partial, batch_format="pyarrow"
    ).to_pandas()
    out = {}
    for gval, sub in rows.groupby("g", sort=False):
        s = np.stack(sub["s"].to_numpy()).sum(axis=0)
        out[gval] = s / sub["n"].sum()
    return out


def centroid_cosine_scores(
    vectors: "ray.data.Dataset",
    id_col: str = "vec_id",
    group_col: str = "label",
    emb_col: str = "embedding",
    round_digits: int = 4,
) -> "ray.data.Dataset":
    """(id, group, cos_sim) — cosine of every vector to ITS group's mean
    vector: the embedding-space quality/outlier signal (low similarity =
    candidate mislabel or junk doc).  Two streaming passes: the bounded
    per-group centroids (``group_centroids``) are broadcast once via
    ``ray.put``; scoring is one vectorized matmul-free sweep per batch
    (row-wise dot with the group-gathered centroid matrix).  Zero-norm
    rows score 0."""
    cents = group_centroids(vectors, group_col=group_col, emb_col=emb_col)
    keys = np.array(sorted(cents))                  # sorted -> searchsorted
    C = np.stack([cents[k] for k in keys])          # (G, dim)
    ref = ray.put((C, keys))
    scale = float(10 ** round_digits)

    def score(t: pa.Table, _ref=ref) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        C, keys = ray.get(_ref)
        m = _to_matrix(t[emb_col])
        g = t[group_col].to_numpy(zero_copy_only=False)
        ix = np.searchsorted(keys, g)                # vectorized gather ix
        cg = C[ix]                                   # (n, dim) gathered
        dot = (m * cg).sum(axis=1)
        denom = np.linalg.norm(m, axis=1) * np.linalg.norm(cg, axis=1)
        with np.errstate(invalid="ignore", divide="ignore"):
            cos = np.where(denom > 0, dot / np.where(denom == 0, 1, denom), 0.0)
        cos = np.floor(cos * scale + 0.5) / scale
        return pa.table({
            id_col: t[id_col],
            group_col: t[group_col],
            "cos_sim": pa.array(cos, type=pa.float64()),
        })

    return vectors.select_columns([id_col, group_col, emb_col]).map_batches(
        score, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# Distributed spherical k-means over the FULL dataset (vs train_centroids,
# which Lloyd-iterates a bounded driver sample for IVF seeding)


def kmeans_fit(
    vectors: "ray.data.Dataset",
    k: int = 8,
    iters: int = 4,
    emb_col: str = "embedding",
    sample_size: int = 2048,
) -> np.ndarray:
    """Spherical k-means centroids fit on EVERY vector: per Lloyd
    iteration one streaming assignment pass emits k (cluster,
    sum-vector, count) partial rows per batch (a matmul + np.add.at —
    vectors never leave their batch), combined on the driver into the
    next (k, dim) centroid matrix.  The semantic-clustering primitive
    under diversity sampling / cluster-balanced mixes (SemDeDup-style
    pipelines).

    Deterministic: init = ``train_centroids(iters=0)`` (canonical-order
    first-k from a bounded sample prefix), argmax ties break to the
    lowest cluster, empty clusters keep their previous centroid — a
    fixed input yields fixed centroids on any cluster size or batch
    split (summation grid: per-CLUSTER partial sums are combined in
    cluster-id order, so float addition order is batch-count-dependent
    only across batches of one cluster; the hard check pins exactness
    on separated data, not bitwise floats).

    Scale: the centroid matrix ships once per iteration via ``ray.put``
    (k x dim x 8 B); driver combine materializes n_batches x k partial
    rows — the group_centroids discipline, never vectors.  Each
    iteration re-executes the input pipeline (streaming, nothing
    pinned); pass a materialized/checkpointed Dataset when the source
    read dominates.
    """
    C = train_centroids(vectors, n_cells=k, sample_size=sample_size,
                        iters=0, emb_col=emb_col)
    k = C.shape[0]  # may clamp to sample size

    for _ in range(iters):
        ref = ray.put(C)

        def partial(t: pa.Table, _ref=ref, _k=k) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            Cm = ray.get(_ref)
            m = _normalize(_to_matrix(t[emb_col]))
            a = np.argmax(m @ Cm.T, axis=1)  # ties -> lowest cluster
            sums = np.zeros((_k, m.shape[1]), dtype=np.float64)
            np.add.at(sums, a, m)
            cnt = np.bincount(a, minlength=_k).astype(np.int64)
            return pa.table({
                "c": pa.array(np.arange(_k, dtype=np.int64)),
                "s": pa.array(list(sums), type=pa.list_(pa.float64())),
                "n": pa.array(cnt, type=pa.int64()),
            })

        rows = vectors.select_columns([emb_col]).map_batches(
            partial, batch_format="pyarrow"
        ).to_pandas()
        newC = C.copy()
        for c, sub in rows.groupby("c", sort=True):
            n = int(sub["n"].sum())
            if n:
                newC[int(c)] = np.stack(sub["s"].to_numpy()).sum(axis=0) / n
        C = _normalize(newC)
    return C


def kmeans_assign(
    vectors: "ray.data.Dataset",
    centroids: np.ndarray,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int = 4,
) -> "ray.data.Dataset":
    """(id, cluster, cos_sim): nearest-centroid assignment, one
    vectorized matmul per batch against the broadcast (k, dim) matrix."""
    ref = ray.put(np.asarray(centroids, dtype=np.float64))
    scale = float(10 ** round_digits)

    def assign(t: pa.Table, _ref=ref) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        Cm = ray.get(_ref)
        m = _normalize(_to_matrix(t[emb_col]))
        sims = m @ Cm.T
        a = np.argmax(sims, axis=1)
        best = sims[np.arange(len(a)), a]
        return pa.table({
            id_col: t[id_col],
            "cluster": pa.array(a.astype(np.int64)),
            "cos_sim": pa.array(np.floor(best * scale + 0.5) / scale,
                                type=pa.float64()),
        })

    return vectors.select_columns([id_col, emb_col]).map_batches(
        assign, batch_format="pyarrow"
    )


def kmeans_diversity_sample(
    vectors: "ray.data.Dataset",
    centroids: np.ndarray,
    per_cluster: int = 2,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    round_digits: int = 4,
) -> "ray.data.Dataset":
    """Cluster-stratified representatives: the ``per_cluster`` vectors
    NEAREST their centroid, per cluster — the coreset/diversity picker
    of a semantic-clustering curation stage (every region of embedding
    space contributes, dominant regions can't flood the sample).

    Scale shape: assignment batches keep only their local top
    ``per_cluster`` per cluster (bounded k x m rows per batch), then one
    bounded-key grouped final takes the global top — the
    _global_topk_fn discipline keyed by cluster.  Ties break (cos DESC,
    id ASC) deterministically."""
    assigned = kmeans_assign(vectors, centroids, id_col=id_col,
                             emb_col=emb_col, round_digits=round_digits)

    def local_top(df: "pd.DataFrame") -> "pd.DataFrame":
        df = df.sort_values(["cluster", "cos_sim", id_col],
                            ascending=[True, False, True], kind="mergesort")
        return df.groupby("cluster", sort=False).head(per_cluster)

    def final_top(df: "pd.DataFrame") -> "pd.DataFrame":
        out = local_top(df)
        out["rnk"] = out.groupby("cluster", sort=False).cumcount() + 1
        return out[["cluster", "rnk", id_col, "cos_sim"]]

    partials = assigned.map_batches(local_top, batch_format="pandas")
    # cluster count is bounded (k), so the final is one coalesced task
    # over <= n_batches x k x m tiny rows
    return partials.repartition(1).map_batches(
        final_top, batch_format="pandas", batch_size=None
    )
