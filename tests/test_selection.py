"""Exact distributed grouped quantile (stages/selection.py)."""

import math

import numpy as np
import pyarrow as pa

import ray.data as rd

from etl_cms_ray.stages.selection import exact_group_quantile


def _make_ds(groups: dict[str, np.ndarray], block_rows: int = 4096) -> rd.Dataset:
    g = np.concatenate([[k] * len(v) for k, v in groups.items()])
    v = np.concatenate(list(groups.values()))
    order = np.random.RandomState(7).permutation(len(v))
    t = pa.table({"g": pa.array(g[order]), "v": pa.array(v[order], pa.float64())})
    return rd.from_arrow(t).map_batches(
        lambda b: b, batch_format="pyarrow", batch_size=block_rows
    )


def _disc(vals: np.ndarray, q: float) -> float:
    """The ORACLE convention, straight from DuckDB — not a reimplementation
    of the engine's rank formula (a shared formula would hide a
    convention bug, as it did for q=0.9 before this test asked DuckDB)."""
    import duckdb

    con = duckdb.connect()
    con.register("t", __import__("pandas").DataFrame({"x": vals}))
    return float(
        con.sql(f"SELECT quantile_disc(x, {q}) FROM t").fetchone()[0]
    )


def test_exact_median_multi_round_tiny_cap():
    # cap far below group size forces >=2 refinement rounds (resketch path)
    rng = np.random.RandomState(11)
    groups = {
        "a": rng.normal(0.0, 10.0, 60_000),
        "b": rng.exponential(3.0, 50_000),
        "c": rng.uniform(-5, 5, 40_000),
    }
    ds = _make_ds(groups)
    got = exact_group_quantile(ds, "g", "v", q=0.5, cap=64, guard=0.02)
    for k, vals in groups.items():
        assert got[k] == _disc(vals, 0.5), k


def test_exact_quantiles_various_q_with_ties_and_nans():
    rng = np.random.RandomState(5)
    base = np.round(rng.normal(0, 3, 20_000), 1)  # heavy ties
    withnan = np.concatenate([base, np.full(500, np.nan)])
    groups = {"x": withnan, "y": rng.gamma(2.0, 2.0, 9_999)}
    ds = _make_ds(groups)
    for q in (0.0, 0.25, 0.9, 1.0):
        got = exact_group_quantile(ds, "g", "v", q=q, cap=2048)
        assert got["x"] == _disc(base, q), q  # NaNs ignored
        assert got["y"] == _disc(groups["y"], q), q


def test_tight_guard_recovers_via_widening():
    # guard so small the sandwich check must fail and widen at least once
    rng = np.random.RandomState(3)
    vals = rng.normal(0, 1, 30_000)
    ds = _make_ds({"only": vals})
    got = exact_group_quantile(ds, "g", "v", q=0.5, cap=128, guard=1e-5)
    assert got["only"] == _disc(vals, 0.5)


def test_low_edge_band_never_reopens_committed_offset():
    # Regression (ADVICE r2, selection.py:150): with a committed offset
    # from round 1, a later round whose guard band touches the lower
    # edge (q_lo <= 0) must clamp to the CURRENT bracket bound, not
    # -inf — reopening re-admits rows already counted into `offset` and
    # the gather returns a value ~offset ranks too low.  A tiny sketch
    # (k=8) makes rank error huge, so the widening loop pushes the
    # guard toward 0.5 and q_lo <= 0 occurs on multi-round paths with
    # offset > 0 across these seeds/qs.
    for seed in (0, 1, 2, 3, 4):
        rng = np.random.RandomState(seed)
        vals = np.concatenate(
            [rng.lognormal(0.0, 1.5, 40_000), np.full(5_000, 1.0)]
        )
        ds = _make_ds({"g0": vals})
        for q in (0.3, 0.5, 0.9):
            got = exact_group_quantile(
                ds, "g", "v", q=q, cap=256, k=8, guard=0.01
            )
            assert got["g0"] == _disc(vals, q), (seed, q)


def test_massive_ties_collapse_bracket_without_gather():
    # one value repeated far beyond cap: the bracket collapses to [x, x]
    # and the answer is emitted without ever gathering `cap` rows
    vals = np.full(200_000, 3.25)
    ds = _make_ds({"t": vals})
    got = exact_group_quantile(ds, "g", "v", q=0.5, cap=64)
    assert got["t"] == 3.25


def test_rank_fn_order_statistic_and_percentile_cont():
    import math

    from etl_cms_ray.stages.selection import exact_group_percentile_cont

    rng = np.random.RandomState(7)
    vals = np.round(rng.lognormal(1.0, 1.0, 30_000), 2)
    ds = _make_ds({"g0": vals})
    srt = np.sort(vals)
    # explicit order statistics via rank_fn (multi-round: tiny cap/sketch)
    for r0 in (0, 17, 14_999, len(vals) - 1):
        got = exact_group_quantile(
            ds, "g", "v", rank_fn=lambda n, r=r0: r, cap=256, k=16
        )
        assert got["g0"] == srt[r0], r0
    # interpolated percentile matches the explicit expression
    p = 0.25
    h = (len(vals) - 1) * p
    rl, rh = math.floor(h), math.ceil(h)
    expect = srt[rl] + (h - rl) * (srt[rh] - srt[rl])
    got = exact_group_percentile_cont(ds, "g", "v", p=p, cap=256, k=16)
    assert got["g0"] == expect
