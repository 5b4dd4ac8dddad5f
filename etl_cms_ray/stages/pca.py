"""Distributed PCA over an embedding column (covariance -> eigh -> project).

An LLM-pipeline operator per the brief's similarity/embedding family (no
reference analog; the partial->coalesce aggregate shape mirrors the
vocabulary-frequency accumulators of `python_etl/CMS_SynPuf_ETL_CDM_v5.py`
stats counters, SURVEY.md §2 T7/A4).

Scale shape
-----------
The only exchange is ``d^2 + d + 1`` integer partial rows per *batch*
(4161 at d=64) — independent of row count — reduced by `_final_agg`'s
single coalesced task (bounded keys, CLAUDE.md rule 3).  The d x d
eigendecomposition runs on the driver: O(d^3) with d = model width,
never data scale.  Components/mean broadcast into the projection stage
as a closure (d*k doubles, ~2 KB).

Cross-engine grid discipline (CLAUDE.md rule 4): sums are over per-row
integer-quantized terms — ``floor(x*1e8 + 0.5)`` for first moments and
``floor(x_i*x_j*1e8 + 0.5)`` for second moments — so the DuckDB oracle
reproduces the exact same int64 sums regardless of summation order, and
the final covariance expression is the literal float64 mirror on both
sides.  Headroom at 10^10 rows: |x| <= ~1 -> |sum| <= 1e8 * 1e10 = 1e18
< 2^63; for wider value ranges lower ``GRID``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.threads import single_threaded_kernels

GRID = 100_000_000  # 1e8 integer grid for both first and second moments

#: rows per outer-product chunk: 512 rows x 64^2 doubles = 16 MiB temp,
#: bounded regardless of Ray batch size.
_CHUNK = 512


def _matrix(col) -> np.ndarray:
    from .ann import _to_matrix  # shared list<float> -> (n, d) kernel

    return _to_matrix(col)


_PARTIAL_SCHEMA = pa.schema(
    [("i", pa.int64()), ("j", pa.int64()), ("s", pa.int64())]
)


def covariance_partials(t: pa.Table, col: str = "embedding") -> pa.Table:
    """Per-batch quantized moment sums as (i, j, s) int64 rows.

    Encoding: (i, j >= 0) -> Sxy[i, j]; (i >= 0, j = -1) -> Sx[i];
    (i = -1, j = -1) -> row count.  Every batch emits the same bounded
    key set, so the final reduce input is O(#blocks * d^2).
    """
    single_threaded_kernels()
    if t.num_rows == 0:  # empty block (filtered/empty fragment): no moments
        return _PARTIAL_SCHEMA.empty_table()
    m = _matrix(t[col])
    n, d = m.shape
    sxy = np.zeros((d, d), dtype=np.int64)
    sx = np.zeros(d, dtype=np.int64)
    for lo in range(0, n, _CHUNK):
        c = m[lo : lo + _CHUNK]
        prod = c[:, :, None] * c[:, None, :]
        sxy += np.floor(prod * GRID + 0.5).astype(np.int64).sum(axis=0)
        sx += np.floor(c * GRID + 0.5).astype(np.int64).sum(axis=0)
    ii, jj = np.indices((d, d))
    i_col = np.concatenate([ii.ravel(), np.arange(d), [-1]])
    j_col = np.concatenate([jj.ravel(), np.full(d, -1), [-1]])
    s_col = np.concatenate([sxy.ravel(), sx, [n]])
    return pa.table(
        {
            "i": pa.array(i_col, type=pa.int64()),
            "j": pa.array(j_col, type=pa.int64()),
            "s": pa.array(s_col, type=pa.int64()),
        }
    )


def _reduced_moments(df: pd.DataFrame):
    """Coalesced partials -> (n, Sx vector, Sxy matrix) exact int64."""
    g = df.groupby(["i", "j"], sort=False)["s"].sum().reset_index()
    n = int(g.loc[(g["i"] == -1) & (g["j"] == -1), "s"].iloc[0])
    sx_rows = g[(g["i"] >= 0) & (g["j"] == -1)].sort_values("i")
    d = len(sx_rows)
    sx = sx_rows["s"].to_numpy(dtype=np.int64)
    pair = g[g["j"] >= 0].sort_values(["i", "j"])
    sxy = pair["s"].to_numpy(dtype=np.int64).reshape(d, d)
    return n, sx, sxy


def _cov_from_moments(n: int, sx: np.ndarray, sxy: np.ndarray) -> np.ndarray:
    """Population covariance via the literal expression mirrored in SQL:
    (Sxy/GRID)/n - (Sx_i/GRID/n) * (Sx_j/GRID/n), all float64."""
    gridf, nf = float(GRID), float(n)
    mean_term = sx.astype(np.float64) / gridf / nf
    return (sxy.astype(np.float64) / gridf) / nf - mean_term[:, None] * mean_term[None, :]


def covariance_finalize(df: pd.DataFrame) -> pd.DataFrame:
    """Final sweep for the oracle query: (i, j, cov) rows, cov on a 1e-8
    output grid (both engines compute bit-identical doubles from the
    same int64 sums, so the quantization is a stability guard only)."""
    n, sx, sxy = _reduced_moments(df)
    cov = _cov_from_moments(n, sx, sxy)
    d = len(sx)
    ii, jj = np.indices((d, d))
    covq = np.floor(cov * GRID + 0.5) / GRID
    return pd.DataFrame(
        {"i": ii.ravel().astype(np.int64), "j": jj.ravel().astype(np.int64),
         "cov": covq.ravel()}
    )


def fit_pca(ds, col: str = "embedding", k: int = 4):
    """Fit PCA over a Dataset's embedding column.

    Returns (mean (d,), components (d, k), eigenvalues (k,)).  The
    reduced moment table is d^2 + d + 1 rows — a bounded driver gather
    (the documented exception to no-driver-materialization; it is model
    state, not data).  Components are sign-canonicalized (largest-|v|
    coordinate positive) so the basis is unique and runs reproduce
    bit-identically from the exact integer moments.
    """
    part = ds.map_batches(
        lambda t, c=col: covariance_partials(t, col=c), batch_format="pyarrow"
    )
    df = pd.DataFrame(part.take_all())
    if df.empty:
        raise ValueError("fit_pca: dataset has no rows")
    n, sx, sxy = _reduced_moments(df)
    cov = _cov_from_moments(n, sx, sxy)
    mean = sx.astype(np.float64) / float(GRID) / float(n)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    evals = evals[order]
    flip = np.sign(comps[np.argmax(np.abs(comps), axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    return mean, comps * flip, evals


def project_batch(t: pa.Table, mean: np.ndarray, comps: np.ndarray,
                  id_col: str = "vec_id", col: str = "embedding",
                  digits: int = 6) -> pa.Table:
    """(n, d) batch -> (n, k) principal coordinates, one matmul."""
    single_threaded_kernels()
    if t.num_rows == 0:
        y = np.empty((0, comps.shape[1]), dtype=np.float64)
    else:
        y = (_matrix(t[col]) - mean) @ comps
    scale = float(10 ** digits)
    y = np.floor(y * scale + 0.5) / scale
    cols = {id_col: t[id_col]}
    for c in range(comps.shape[1]):
        cols[f"pc{c}"] = pa.array(y[:, c], type=pa.float64())
    return pa.table(cols)
