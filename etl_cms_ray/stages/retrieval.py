"""BM25 retrieval over a document corpus.

The reference's search surface is SQL `LIKE` / vocabulary lookups over
warehouse tables (reference queries in ``SQL/``); a training-data lake
needs ranked lexical retrieval.  This stage scores every document
against a small fixed term set with BM25 and returns the global top-k.

Scale shape (the part that must survive 100 TB):

- **Pass 1 (corpus stats)** reduces each batch to ONE row — doc count,
  token count, and a df vector over the query terms (bounded: |terms|,
  not vocabulary).  The driver folds ``n_batches`` tiny rows.
- **Pass 2 (scoring)** broadcasts the (N, avgdl, idf) scalars once and
  scores each batch with Arrow split + C-kernel equality + a cumsum
  segment-count — no Python per row, no token ever leaves its batch.
  Each batch emits only its local top-k candidates, so the final gather
  is ``n_batches x k`` rows, never the corpus.

Cross-engine determinism (CLAUDE.md rule 4): the score uses the
RATIONAL idf ``(N - df + 0.5) / (df + 0.5)`` (log-free — every input is
an integer or an exact half, so `+ - * /` are IEEE-deterministic), and
the per-term contributions are summed LEFT-ASSOCIATIVELY in query-term
order on both engines, making the pre-quantization double bit-identical
to the SQL oracle's expression tree.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray

__all__ = ["bm25_topk", "bm25_oracle_sql", "rrf_fuse", "hybrid_oracle_sql"]


def _qround(x: np.ndarray, digits: int) -> np.ndarray:
    scale = float(10**digits)
    return np.floor(x * scale + 0.5) / scale


def _term_counts(t: pa.Table, text_col: str, terms: list[str]):
    """(dl, [tf per term]) for one batch — all C kernels + one cumsum."""
    toks = pc.split_pattern(t[text_col], pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    offsets = np.concatenate([[0], np.cumsum(dl)])
    tfs = []
    for term in terms:
        eq = pc.equal(flat, term).to_numpy(zero_copy_only=False).astype(np.int64)
        csum = np.concatenate([[0], np.cumsum(eq)])
        tfs.append(csum[offsets[1:]] - csum[offsets[:-1]])
    return dl, tfs


def bm25_topk(
    docs: "ray.data.Dataset",
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    round_digits: int = 4,
) -> pa.Table:
    """Global BM25 top-k of ``docs`` against ``terms``.

    Returns a pa.Table (doc_id, score, rank) of at most ``k`` rows —
    the final gather is bounded at ``n_batches x k`` candidates.
    Ranking key is (quantized score DESC, doc_id ASC); zero-score
    documents never rank.
    """
    from ..functions.threads import single_threaded_kernels

    terms = list(terms)
    docs = docs.select_columns([id_col, text_col])

    def stats_partial(t: pa.Table, *, text_col: str, terms: list[str]) -> pa.Table:
        single_threaded_kernels()
        dl, tfs = _term_counts(t, text_col, terms)
        return pa.table(
            {
                "n": pa.array([len(dl)], type=pa.int64()),
                "sum_dl": pa.array([int(dl.sum())], type=pa.int64()),
                "df": pa.array(
                    [[int((tf > 0).sum()) for tf in tfs]], type=pa.list_(pa.int64())
                ),
            }
        )

    # pass 1: one tiny row per batch -> fold on the driver
    parts = docs.map_batches(
        stats_partial,
        batch_format="pyarrow",
        fn_kwargs={"text_col": text_col, "terms": terms},
    ).take_all()
    n_docs = sum(r["n"] for r in parts)
    sum_dl = sum(r["sum_dl"] for r in parts)
    df = np.sum([r["df"] for r in parts], axis=0).astype(np.int64)
    if n_docs == 0:
        return pa.table(
            {
                id_col: pa.array([], type=pa.int64()),
                "score": pa.array([], type=pa.float64()),
                "rank": pa.array([], type=pa.int64()),
            }
        )
    avgdl = sum_dl / n_docs  # exact-int division: IEEE-identical to SQL
    idf = (n_docs - df + 0.5) / (df + 0.5)  # rational idf, log-free
    ref = ray.put((idf, float(avgdl)))

    def score_batch(
        t: pa.Table, *, _ref, text_col: str, terms: list[str], id_col: str
    ) -> pa.Table:
        single_threaded_kernels()
        idf, avgdl = ray.get(_ref)
        dl, tfs = _term_counts(t, text_col, terms)
        dlf = dl.astype(np.float64)
        score = np.zeros(len(dl), dtype=np.float64)
        # LEFT-ASSOCIATIVE accumulation in term order: bit-identical to
        # the oracle's  s(t0) + s(t1) + ...  expression tree.
        for j in range(len(terms)):
            tf = tfs[j].astype(np.float64)
            s = idf[j] * (tf * (k1 + 1)) / (tf + k1 * (1 - b + b * dlf / avgdl))
            score = score + s
        score = _qround(score, round_digits)
        keep = score > 0
        ids = t[id_col].to_numpy(zero_copy_only=False)[keep]
        sc = score[keep]
        if len(sc) > k:  # local top-k: candidates only ever leave a batch
            # tie-aware (score DESC, id ASC) — the same key as the global
            # rank, so a boundary tie never drops the globally-ranked row
            top = np.lexsort((ids, -sc))[:k]
            ids, sc = ids[top], sc[top]
        return pa.table(
            {id_col: pa.array(ids), "score": pa.array(sc, type=pa.float64())}
        )

    cands = docs.map_batches(
        score_batch,
        batch_format="pyarrow",
        fn_kwargs={"_ref": ref, "text_col": text_col, "terms": terms, "id_col": id_col},
    ).to_pandas()  # bounded: n_batches x k rows
    cands = cands.sort_values(
        ["score", id_col], ascending=[False, True], kind="mergesort"
    ).head(k)
    cands["rank"] = np.arange(1, len(cands) + 1, dtype=np.int64)
    return pa.Table.from_pandas(cands.reset_index(drop=True), preserve_index=False)


def _bm25_scored_ctes(
    terms: list[str],
    k1: float,
    b: float,
    round_digits: int,
    table: str,
    id_col: str,
    text_col: str,
) -> str:
    """The shared ``toks / st / scored`` CTE block computing the BM25
    score with the IDENTICAL expression tree as :func:`bm25_topk` —
    generated from the same term list so Ray and SQL can never drift.
    Per-term contributions appear as an explicit left-associated sum in
    term order."""
    scale = int(10**round_digits)

    def s(term: str) -> str:
        tq = term.replace("'", "''")
        tf = f"CAST(len(list_filter(ws, x -> x = '{tq}')) AS DOUBLE)"
        dfq = (
            f"(SELECT CAST(count(*) AS DOUBLE) FROM toks "
            f"WHERE list_contains(ws, '{tq}'))"
        )
        idf = f"((st.n - {dfq} + 0.5) / ({dfq} + 0.5))"
        return (
            f"({idf} * ({tf} * ({k1} + 1)) / "
            f"({tf} + {k1} * (1 - {b} + {b} * len(ws) / st.avgdl)))"
        )

    total = " + ".join(s(t) for t in terms)
    return f"""toks AS (
  SELECT {id_col}, string_split({text_col}, ' ') AS ws FROM {table}
), st AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         CAST(sum(len(ws)) AS BIGINT) / CAST(count(*) AS DOUBLE) AS avgdl
  FROM toks
), scored AS (
  SELECT {id_col},
         floor(({total}) * {scale} + 0.5) / {scale} AS score
  FROM toks, st
)"""


def bm25_oracle_sql(
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    round_digits: int = 4,
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB SQL mirror of :func:`bm25_topk` (see _bm25_scored_ctes)."""
    ctes = _bm25_scored_ctes(terms, k1, b, round_digits, table, id_col, text_col)
    return f"""
WITH {ctes}
SELECT {id_col}, score,
       row_number() OVER (ORDER BY score DESC, {id_col}) AS rank
FROM scored WHERE score > 0
ORDER BY score DESC, {id_col} LIMIT {k}
"""


def rrf_fuse(
    lists: list[pd.DataFrame],
    k: int = 10,
    c: int = 60,
    id_col: str = "doc_id",
    rank_col: str = "rank",
    round_digits: int = 6,
) -> pa.Table:
    """Reciprocal-rank fusion of ranked candidate lists (hybrid
    lexical+dense retrieval): rrf(d) = sum over lists of 1/(c + rank_d),
    a missing entry contributing 0.  Runs on the driver over the
    already-bounded top-k pools (never the corpus).  Contributions are
    summed in LIST ORDER left-associatively — with exact-integer
    denominators every double is IEEE-identical to the SQL mirror."""
    fused: pd.DataFrame | None = None
    for i, df in enumerate(lists):
        part = df[[id_col, rank_col]].rename(columns={rank_col: f"_r{i}"})
        fused = part if fused is None else fused.merge(part, on=id_col, how="outer")
    rrf = np.zeros(len(fused), dtype=np.float64)
    for i in range(len(lists)):
        r = fused[f"_r{i}"].to_numpy(dtype=np.float64, na_value=np.nan)
        rrf = rrf + np.where(np.isnan(r), 0.0, 1.0 / (c + r))
    fused["rrf"] = _qround(rrf, round_digits)
    fused = fused.sort_values(["rrf", id_col], ascending=[False, True],
                              kind="mergesort").head(k)
    fused["rank"] = np.arange(1, len(fused) + 1, dtype=np.int64)
    out = fused[[id_col, "rrf", "rank"]].reset_index(drop=True)
    out[id_col] = out[id_col].astype("int64")
    return pa.Table.from_pandas(out, preserve_index=False)


def hybrid_oracle_sql(
    terms: list[str],
    query_vec_id: int,
    k: int = 10,
    pool: int = 20,
    c: int = 60,
    k1: float = 1.2,
    b: float = 0.75,
    score_digits: int = 4,
    rrf_digits: int = 6,
) -> str:
    """DuckDB mirror of BM25-pool + brute-force-cosine-pool + rrf_fuse
    over (documents, embeddings) with vec_id = doc_id.  The BM25 CTEs
    are generated from the SAME term list as the Ray side; the cosine
    rank uses the ann_cosine_topk convention (quantized score DESC,
    id ASC, query vector excluded)."""
    ctes = _bm25_scored_ctes(
        terms, k1, b, score_digits, "documents", "doc_id", "text"
    )
    sscale = int(10**score_digits)
    rscale = int(10**rrf_digits)
    return f"""
WITH {ctes},
brank AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS r
  FROM scored WHERE score > 0 ORDER BY score DESC, doc_id LIMIT {pool}
), qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings
  WHERE vec_id = {query_vec_id}
), ascored AS (
  SELECT e.vec_id AS doc_id,
         floor((list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qv.qe))
               * {sscale} + 0.5) / {sscale} AS s
  FROM embeddings e, qv WHERE e.vec_id <> {query_vec_id}
), arank AS (
  SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
  FROM ascored ORDER BY s DESC, doc_id LIMIT {pool}
), fused AS (
  SELECT coalesce(b.doc_id, a.doc_id) AS doc_id,
         floor((coalesce(1.0 / ({c} + b.r), 0) + coalesce(1.0 / ({c} + a.r), 0))
               * {rscale} + 0.5) / {rscale} AS rrf
  FROM brank b FULL OUTER JOIN arank a ON b.doc_id = a.doc_id
)
SELECT doc_id, rrf, row_number() OVER (ORDER BY rrf DESC, doc_id) AS rank
FROM fused ORDER BY rrf DESC, doc_id LIMIT {k}
"""
