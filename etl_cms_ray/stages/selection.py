"""Exact distributed per-group quantile by sketch-guided refinement.

The reference derives medians/percentiles only in its warehouse SQL
(post-load aggregate queries over the final tables); at engine scale an
exact grouped quantile cannot sort or gather a whole column.  This stage
computes the EXACT ``quantile_disc`` element per group with streaming
passes only:

1. one pass builds per-group counts + KLL sketches (tiny, driver-merged),
2. each refinement round uses the sketch to bracket the target rank with
   a guard band, then one counting pass measures the bracket exactly —
   rows below the bracket are accounted into a rank offset and never
   revisited,
3. when a bracket's exact row count fits under ``cap``, one final pass
   gathers just those candidate values and picks the answer locally.

Every round shrinks the live row set by ~2x the sketch's rank error
(0.5-2% at k=200), so 10^12 rows reach a 10^6 cap in <= 4 rounds; all
groups advance through the same passes simultaneously.  If the guard
band was too tight (sketch error exceeded it), the round widens the band
and re-counts instead of failing — correctness never depends on the
sketch, only the pass count does.

Rank convention: 0-based rank max(0, ceil(q*n) - 1), matching DuckDB's
``quantile_disc`` (verified empirically for every n in 1..29 x q in
{0, .1, .25, .33, .5, .66, .75, .9, .99, 1} — the earlier floor(q*(n-1))
formula coincides at q in {0, .25, .5, 1} but diverges at e.g. q=0.9,
n=2, where quantile_disc returns the max and floor returns the min).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from ..functions.sketch import KLL
from ..functions.threads import single_threaded_kernels

_INF = float("inf")


def _group_pass(ds, group_col: str, value_col: str, fn):
    """Run a per-batch partial that emits one tiny table per batch and
    merge the partial rows on the driver (the HLL/Misra-Gries pattern:
    output is O(groups) per batch, so take_all is bounded)."""
    parts = ds.map_batches(fn, batch_format="pyarrow").take_all()
    return parts


def exact_group_quantile(
    ds,
    group_col: str,
    value_col: str,
    q: float = 0.5,
    cap: int = 1_000_000,
    k: int = 200,
    guard: float = 0.02,
    max_rounds: int = 8,
    rank_fn=None,
) -> dict:
    """Exact per-group quantile_disc element. Returns {group: value}.

    ``cap`` bounds the final local gather per call (across all groups);
    ``guard`` is the initial sketch rank-error guard band (fraction of
    the live rows), doubled on a sandwich violation.  NaN/null values are
    ignored, matching SQL aggregate semantics.  Groups must be
    bounded-cardinality (statuses, types): per-pass partial output is
    O(groups x blocks).

    ``rank_fn``: optional ``n -> 0-based rank`` override of the
    quantile_disc rank convention (clamped to [0, n-1]) — the exact
    ORDER-STATISTIC selector.  percentile_cont composes two of these
    (floor/ceil of ``(n-1)*p``) and interpolates.
    """

    ds = ds.select_columns([group_col, value_col])

    # ---- pass 1: per-group count + sketch -------------------------------
    def sketch_batch(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        import pandas as pd

        df = pd.DataFrame(
            {
                "g": t[group_col].to_pandas(),
                "v": t[value_col].to_numpy(zero_copy_only=False).astype(np.float64),
            }
        )
        df = df[~np.isnan(df["v"].to_numpy())]
        gs, sk = [], []
        for g, sub in df.groupby("g", sort=False):
            kll = KLL(k)
            kll.add_many(sub["v"].to_numpy())
            gs.append(g)
            sk.append(kll.to_bytes())
        return pa.table({"g": gs, "sketch": pa.array(sk, type=pa.large_binary())})

    sketches: dict = {}
    for row in _group_pass(ds, group_col, value_col, sketch_batch):
        g = row["g"]
        kll = KLL.from_bytes(row["sketch"])
        sketches[g] = sketches[g].merge(kll) if g in sketches else kll

    # per-group live state: rank r (0-based, within all rows), bracket
    # [lo, hi] (inclusive; rows < lo are counted in `offset` and dead)
    state = {}
    for g, kll in sketches.items():
        n = kll.n
        # quantile_disc rank: 1-based ceil(q*n), clamped; the epsilon
        # keeps exact products (q=0.5, n=4 -> 2.0) from ceiling upward
        if rank_fn is not None:
            r = max(0, min(n - 1, int(rank_fn(n)))) if n > 0 else 0
        else:
            r = max(0, int(math.ceil(q * n - 1e-9)) - 1) if n > 0 else 0
        state[g] = {"r": r, "offset": 0, "lo": -_INF, "hi": _INF,
                    "live": n, "sk": kll, "done": n == 0}
    result = {g: float("nan") for g in state}

    def count_batch_factory(brackets):
        # brackets: {g: (lo, hi, new_lo, new_hi)} — count rows of the
        # CURRENT bracket below new_lo, and rows inside [new_lo, new_hi]
        def count_batch(t: pa.Table, brk=brackets) -> pa.Table:
            single_threaded_kernels()
            import pandas as pd

            gcol = t[group_col].to_pandas()
            v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
            out_g, out_below, out_cand = [], [], []
            for g, (lo, hi, nlo, nhi) in brk.items():
                m = (gcol == g).to_numpy() & ~np.isnan(v) & (v >= lo) & (v <= hi)
                vv = v[m]
                out_g.append(g)
                out_below.append(int((vv < nlo).sum()))
                out_cand.append(int(((vv >= nlo) & (vv <= nhi)).sum()))
            return pa.table({"g": out_g, "below": out_below, "cand": out_cand})

        return count_batch

    guard_now = {g: guard for g in state}
    for _ in range(max_rounds):
        live = {g: s for g, s in state.items() if not s["done"]}
        if not live:
            break
        # propose brackets from each group's sketch over its live rows
        while True:
            brackets = {}
            for g, s in live.items():
                rr = s["r"] - s["offset"]  # 0-based rank within live rows
                m = s["live"]
                q_mid = (rr + 1) / m
                gband = guard_now[g]
                q_lo, q_hi = q_mid - gband, q_mid + gband
                # the sketch only stores a subsample: its 0/1 quantiles
                # are NOT the true min/max, so a band touching either
                # boundary must open the bracket — but only to the
                # CURRENT bracket bound, never past it: opening to -inf
                # in a later round would re-admit rows already counted
                # into `offset`, and the gather would then return a
                # value ~offset ranks too low.  (Round 1 has
                # lo/hi = -inf/+inf, preserving the subsample-min/max
                # concern above.)
                nlo = s["lo"] if q_lo <= 0.0 else s["sk"].quantile(q_lo)
                nhi = s["hi"] if q_hi >= 1.0 else s["sk"].quantile(q_hi)
                brackets[g] = (s["lo"], s["hi"], nlo, nhi)
            counts = {g: [0, 0] for g in live}
            for row in _group_pass(
                ds, group_col, value_col, count_batch_factory(brackets)
            ):
                if row["g"] in counts:
                    counts[row["g"]][0] += row["below"]
                    counts[row["g"]][1] += row["cand"]
            # sandwich check: target rank must fall inside the bracket
            bad = [
                g
                for g, s in live.items()
                if not (
                    s["offset"] + counts[g][0] <= s["r"]
                    < s["offset"] + counts[g][0] + counts[g][1]
                )
            ]
            if not bad:
                break
            for g in bad:  # sketch error exceeded the guard: widen, recount
                guard_now[g] = min(0.5, guard_now[g] * 2)

        gather = {}
        for g, s in live.items():
            below, cand = counts[g]
            s["offset"] += below
            s["lo"], s["hi"] = brackets[g][2], brackets[g][3]
            s["live"] = cand
            if s["lo"] == s["hi"] and np.isfinite(s["lo"]):
                # bracket collapsed to one value (massive ties): every
                # candidate IS that value — no gather needed, and without
                # this exit re-sketching could never shrink the bracket
                result[g] = float(s["lo"])
                s["done"] = True
            elif cand <= max(1, cap // max(1, len(live))):
                gather[g] = (s["lo"], s["hi"])

        if gather:  # final gather for the groups whose bracket fits
            def gather_batch(t: pa.Table, brk=dict(gather)) -> pa.Table:
                single_threaded_kernels()
                gcol = t[group_col].to_pandas()
                v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
                gs, vs = [], []
                for g, (lo, hi) in brk.items():
                    m = (gcol == g).to_numpy() & ~np.isnan(v) & (v >= lo) & (v <= hi)
                    vv = v[m]
                    gs.extend([g] * len(vv))
                    vs.extend(vv.tolist())
                return pa.table({"g": gs, "v": pa.array(vs, type=pa.float64())})

            pool: dict = {g: [] for g in gather}
            for row in _group_pass(ds, group_col, value_col, gather_batch):
                pool[row["g"]].append(row["v"])
            for g in gather:
                s = state[g]
                vals = np.sort(np.asarray(pool[g], dtype=np.float64))
                result[g] = float(vals[s["r"] - s["offset"]])
                s["done"] = True

        # groups still too big: rebuild their sketch over the new bracket
        rebuild = {g: s for g, s in live.items() if not s["done"]}
        if rebuild:
            def resketch_batch(t: pa.Table, brk={g: (s["lo"], s["hi"]) for g, s in rebuild.items()}) -> pa.Table:
                single_threaded_kernels()
                gcol = t[group_col].to_pandas()
                v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
                gs, sk = [], []
                for g, (lo, hi) in brk.items():
                    m = (gcol == g).to_numpy() & ~np.isnan(v) & (v >= lo) & (v <= hi)
                    vv = v[m]
                    if len(vv) == 0:
                        continue
                    kll = KLL(k)
                    kll.add_many(vv)
                    gs.append(g)
                    sk.append(kll.to_bytes())
                return pa.table({"g": gs, "sketch": pa.array(sk, type=pa.large_binary())})

            fresh: dict = {}
            for row in _group_pass(ds, group_col, value_col, resketch_batch):
                g = row["g"]
                kll = KLL.from_bytes(row["sketch"])
                fresh[g] = fresh[g].merge(kll) if g in fresh else kll
            for g, s in rebuild.items():
                s["sk"] = fresh[g]
                guard_now[g] = guard

    undone = [g for g, s in state.items() if not s["done"]]
    if undone:
        raise RuntimeError(f"quantile refinement did not converge for {undone}")
    return result


def exact_group_percentile_cont(
    ds,
    group_col: str,
    value_col: str,
    p: float,
    **kw,
) -> dict:
    """Exact INTERPOLATED percentile per group (SQL percentile_cont):
    ``h = (n-1)*p``, ``v = vl + (h - floor(h)) * (vh - vl)`` over the two
    neighboring exact order statistics, each found by the multi-pass
    rank selector (``rank_fn``).  Returns {group: value}.

    Cross-engine exactness: pass a ``p`` exactly representable in
    binary (0.25, 0.5, 0.375, ...) and mirror the SAME interpolation
    expression in SQL — then every intermediate double is IEEE-identical
    on both engines (CLAUDE.md rule 4 applies to the inputs).
    """
    import math

    def cnt_batch(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        import pandas as pd

        v = t[value_col].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({"g": t[group_col].to_pandas()})[~np.isnan(v)]
        g = df.groupby("g", sort=False).size().rename("c").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    counts: dict = {}
    sub = ds.select_columns([group_col, value_col])
    for row in _group_pass(sub, group_col, value_col, cnt_batch):
        counts[row["g"]] = counts.get(row["g"], 0) + int(row["c"])

    vl = exact_group_quantile(
        ds, group_col, value_col,
        rank_fn=lambda n: math.floor((n - 1) * p), **kw,
    )
    vh = exact_group_quantile(
        ds, group_col, value_col,
        rank_fn=lambda n: math.ceil((n - 1) * p), **kw,
    )
    out = {}
    for g, n in counts.items():
        h = (n - 1) * p
        frac = h - math.floor(h)
        out[g] = vl[g] + frac * (vh[g] - vl[g])
    return out
