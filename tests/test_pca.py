"""Distributed PCA invariants (stages/pca.py).

The covariance query itself is pinned against DuckDB by the oracle
mirror (test_queries_duckdb); these tests pin the parts SQL cannot
express: exactness/associativity of the integer moment sums, the
eigenbasis contract, and projection semantics.
"""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from etl_cms_ray.stages.pca import (
    GRID,
    covariance_finalize,
    covariance_partials,
    fit_pca,
    project_batch,
)


def _table(n=300, d=16, seed=0):
    rng = np.random.default_rng(seed)
    m = (rng.standard_normal((n, d)) * 0.2).astype(np.float32)
    t = pa.table(
        {
            "vec_id": pa.array(np.arange(n, dtype=np.int64)),
            "embedding": pa.array(m.tolist(), type=pa.list_(pa.float32())),
        }
    )
    return t, m.astype(np.float64)


def _finalized(t, batch_size):
    import pandas as pd

    parts = [
        covariance_partials(t.slice(lo, batch_size))
        for lo in range(0, t.num_rows, batch_size)
    ]
    df = pd.concat([p.to_pandas() for p in parts], ignore_index=True)
    return covariance_finalize(df)


def test_covariance_matches_numpy_and_is_split_invariant():
    t, m = _table()
    full = _finalized(t, t.num_rows)
    split = _finalized(t, 37)  # ragged splits
    # integer-grid sums are exactly associative: any batching, same bits
    assert full.equals(split)
    d = m.shape[1]
    got = full.sort_values(["i", "j"])["cov"].to_numpy().reshape(d, d)
    ref = np.cov(m.T, bias=True)
    # per-row product quantization error is <= 0.5/GRID each side of the
    # mean-product difference
    assert np.abs(got - ref).max() < 3.0 / GRID


def test_fit_pca_basis_contract(ray_session):
    t, m = _table(n=400, d=12, seed=1)
    ds = rd.from_arrow(t)
    mean, comps, evals = fit_pca(ds, k=12)
    # orthonormal basis
    assert np.allclose(comps.T @ comps, np.eye(12), atol=1e-10)
    # eigenvalues descending and non-negative
    assert np.all(np.diff(evals) <= 1e-12) and evals[-1] > -1e-9
    # spans the same principal directions as numpy PCA on the raw data
    ref_evals, ref_vecs = np.linalg.eigh(np.cov(m.T, bias=True))
    order = np.argsort(ref_evals)[::-1]
    dots = np.abs(np.einsum("ij,ij->j", comps, ref_vecs[:, order]))
    assert np.all(dots > 1 - 1e-5)
    # mean matches
    assert np.allclose(mean, m.mean(axis=0), atol=2.0 / GRID)
    # deterministic: refit gives identical bits
    mean2, comps2, evals2 = fit_pca(ds, k=12)
    assert np.array_equal(comps, comps2) and np.array_equal(mean, mean2)


def test_projection_variance_equals_eigenvalues(ray_session):
    t, m = _table(n=500, d=10, seed=2)
    ds = rd.from_arrow(t)
    mean, comps, evals = fit_pca(ds, k=3)
    out = ds.map_batches(
        lambda b: project_batch(b, mean, comps), batch_format="pyarrow"
    ).to_pandas()
    assert list(out.columns) == ["vec_id", "pc0", "pc1", "pc2"]
    assert len(out) == 500
    y = out[["pc0", "pc1", "pc2"]].to_numpy()
    # projected coordinates are centered with variance = eigenvalue
    assert np.abs(y.mean(axis=0)).max() < 1e-5
    assert np.allclose(y.var(axis=0), evals, rtol=1e-4, atol=1e-7)


def test_project_batch_quantizes_and_keeps_ids():
    t, m = _table(n=50, d=8, seed=3)
    mean = m.mean(axis=0)
    comps = np.eye(8)[:, :2]
    out = project_batch(t, mean, comps, digits=2)
    got = out["pc0"].to_numpy()
    ref = np.floor((m - mean)[:, 0] * 100 + 0.5) / 100
    assert np.array_equal(got, ref)
    assert out["vec_id"].to_pylist() == t["vec_id"].to_pylist()


def test_empty_batches_are_harmless(ray_session):
    t, m = _table(n=120, d=8, seed=4)
    ds = rd.from_arrow(t).filter(
        lambda r: r["vec_id"] < 60)  # leaves some empty blocks downstream
    mean, comps, _ = fit_pca(ds, k=2)
    ref_mean = m[:60].mean(axis=0)
    assert np.allclose(mean, ref_mean, atol=2.0 / GRID)
    out = ds.map_batches(
        lambda b: project_batch(b, mean, comps), batch_format="pyarrow"
    )
    assert out.count() == 60
    # a literally empty batch projects to a 0-row table with full schema
    empty = project_batch(t.slice(0, 0), mean, comps)
    assert empty.num_rows == 0 and empty.column_names == ["vec_id", "pc0", "pc1"]


def test_fit_pca_empty_dataset_raises(ray_session):
    t, _ = _table(n=10, d=4, seed=5)
    ds = rd.from_arrow(t.slice(0, 0))
    with pytest.raises(ValueError, match="no rows"):
        fit_pca(ds, k=2)
