"""HyperLogLog — the mergeable-sketch pattern for distributed approximate
distinct counts.

The canonical two-stage sketch flow (ray_guide "Aggregation at scale"):
one serialized sketch per batch inside map_batches, merged in a tiny
second stage — no shuffle of raw values at all.  Deterministic (sha1-based
hashing), numpy-vectorized register updates.  Standard HLL with the
small-range linear-counting correction; register count m = 2^p.
"""

from __future__ import annotations

import hashlib

import numpy as np


class HyperLogLog:
    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)
        if p == 12:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        elif p >= 7:
            self.alpha = 0.7213 / (1 + 1.079 / self.m)
        else:
            self.alpha = 0.673

    def add_many(self, values) -> None:
        """Vectorized-ish insert: C-core sha1 per value, numpy register max."""
        if len(values) == 0:
            return
        sha = hashlib.sha1
        hashes = np.fromiter(
            (
                int.from_bytes(sha(str(v).encode()).digest()[:8], "little")
                for v in values
            ),
            dtype=np.uint64,
            count=len(values),
        )
        idx = (hashes >> np.uint64(64 - self.p)).astype(np.int64)
        rest = hashes << np.uint64(self.p)
        # rank = leading zeros of the remaining 64-p bits + 1
        ranks = np.zeros(len(hashes), dtype=np.uint8)
        remaining = rest.copy()
        mask = np.ones(len(hashes), dtype=bool)
        for r in range(1, 64 - self.p + 2):
            top = (remaining >> np.uint64(63)) & np.uint64(1)
            hit = mask & (top == 1)
            ranks[hit] = r
            mask &= top == 0
            remaining = remaining << np.uint64(1)
            if not mask.any():
                break
        ranks[mask] = 64 - self.p + 1
        np.maximum.at(self.registers, idx, ranks)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        out = HyperLogLog(self.p)
        out.registers = np.maximum(self.registers, other.registers)
        return out

    def cardinality(self) -> float:
        est = self.alpha * self.m**2 / np.sum(2.0 ** (-self.registers.astype(np.float64)))
        zeros = int((self.registers == 0).sum())
        if est <= 2.5 * self.m and zeros:
            return self.m * np.log(self.m / zeros)  # linear counting
        return float(est)

    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "HyperLogLog":
        h = HyperLogLog(b[0])
        h.registers = np.frombuffer(b[1:], dtype=np.uint8).copy()
        return h


def approx_distinct(ds, column: str, p: int = 12) -> float:
    """Approximate distinct count of a Dataset column: one HLL per batch
    (map_batches), merged on the driver (sketches are ~4 KB each)."""
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        h = HyperLogLog(p)
        h.add_many(t[column].to_pylist())
        return pa.table({"sketch": pa.array([h.to_bytes()], type=pa.binary())})

    parts = ds.select_columns([column]).map_batches(
        sketch_batch, batch_format="pyarrow"
    ).take_all()
    acc = HyperLogLog(p)
    for row in parts:
        acc = acc.merge(HyperLogLog.from_bytes(row["sketch"]))
    return acc.cardinality()


class MisraGries:
    """Mergeable heavy-hitters summary (Misra-Gries with m counters).

    Invariant maintained by ``insert_counts`` and ``merge`` (the
    "subtract the (m+1)-th largest counter" reduction of Agarwal et al.,
    Mergeable Summaries, PODS'12): for every key,

        true_count - self.err  <=  counter(key)  <=  true_count

    with counter(key) = 0 for untracked keys, and ``self.err`` (the sum
    of all subtracted reduction thresholds) bounded by n/(m+1) over a
    total inserted weight n.  Hence any key whose true count exceeds
    n/(m+1) is guaranteed present.  Counters accept pre-aggregated
    (key, weight) batches — feed it value_counts output, not raw tokens,
    so the Python dict loop runs over per-batch DISTINCT keys only.
    """

    def __init__(self, m: int = 64):
        self.m = int(m)
        self.counts: dict = {}
        self.err = 0
        self.n = 0

    def _reduce(self) -> None:
        if len(self.counts) <= self.m:
            return
        vals = sorted(self.counts.values(), reverse=True)
        thr = vals[self.m]  # (m+1)-th largest
        self.counts = {k: c - thr for k, c in self.counts.items() if c > thr}
        self.err += thr

    def insert_counts(self, keys, weights) -> None:
        c = self.counts
        for k, w in zip(keys, weights):
            c[k] = c.get(k, 0) + int(w)
        self.n += int(sum(weights))
        self._reduce()

    def merge(self, other: "MisraGries") -> "MisraGries":
        out = MisraGries(min(self.m, other.m))
        out.counts = dict(self.counts)
        for k, v in other.counts.items():
            out.counts[k] = out.counts.get(k, 0) + v
        out.err = self.err + other.err
        out.n = self.n + other.n
        out._reduce()
        return out

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.m, self.counts, self.err, self.n))

    @staticmethod
    def from_bytes(b: bytes) -> "MisraGries":
        import pickle

        m, counts, err, n = pickle.loads(b)
        out = MisraGries(m)
        out.counts, out.err, out.n = counts, err, n
        return out


class KLL:
    """Mergeable quantile sketch (KLL-style compactor chain, deterministic).

    Level ``i`` holds a numpy buffer of items with weight ``2^i``.  When a
    level exceeds ``k`` items, it is sorted and every other item (starting
    at a deterministically ALTERNATING offset, replacing KLL's coin flip
    so runs are reproducible) is promoted to level ``i+1``; an odd tail
    item stays behind, so total weight is conserved exactly and
    ``rank(v)`` estimates drift at most ±(items compacted)/2 per level —
    the classic Manku-Rajagopalan-Lindsay collapse bound.  ``merge``
    concatenates level-wise then re-compacts; with identical ``k`` the
    result is independent of merge order up to the alternation state
    (rank-error bound unaffected).  Empirical rank error at k=200 is
    ~0.5-1% (asserted in tests); size is O(k log(n/k))."""

    def __init__(self, k: int = 200):
        self.k = int(k)
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.flips: list[int] = [0]

    def _compact_level(self, i: int) -> None:
        buf = np.sort(self.levels[i])
        if len(buf) % 2:  # odd tail stays: weight conserved exactly
            keep, buf = buf[-1:], buf[:-1]
        else:
            keep = buf[:0]
        promoted = buf[self.flips[i] :: 2]
        self.flips[i] ^= 1
        self.levels[i] = keep
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.flips.append(0)
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])

    def _cascade(self) -> None:
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self.k:
                self._compact_level(i)
            i += 1

    def add_many(self, values) -> None:
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += len(v)
        self._cascade()

    def merge(self, other: "KLL") -> "KLL":
        assert self.k == other.k
        out = KLL(self.k)
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        out.flips = []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]))
            fa = self.flips[i] if i < len(self.flips) else 0
            fb = other.flips[i] if i < len(other.flips) else 0
            out.flips.append(fa ^ fb)
        out.n = self.n + other.n
        out._cascade()
        return out

    def _weighted(self) -> tuple[np.ndarray, np.ndarray]:
        vals = np.concatenate(self.levels)
        wts = np.concatenate(
            [np.full(len(b), 1 << i, dtype=np.int64)
             for i, b in enumerate(self.levels)]
        )
        order = np.argsort(vals, kind="stable")
        return vals[order], wts[order]

    def quantile(self, q: float) -> float:
        """Smallest stored value whose cumulative weight >= q * total
        (the quantile_disc convention of the exact catalog query)."""
        vals, wts = self._weighted()
        if len(vals) == 0:
            return float("nan")
        cum = np.cumsum(wts)
        idx = int(np.searchsorted(cum, q * cum[-1]))
        return float(vals[min(idx, len(vals) - 1)])

    def rank(self, v: float) -> int:
        """Estimated count of items <= v."""
        vals, wts = self._weighted()
        return int(wts[: np.searchsorted(vals, v, side="right")].sum())

    def to_bytes(self) -> bytes:
        import pickle

        return pickle.dumps((self.k, self.n, self.flips,
                             [b.tobytes() for b in self.levels]))

    @staticmethod
    def from_bytes(b: bytes) -> "KLL":
        import pickle

        k, n, flips, bufs = pickle.loads(b)
        out = KLL(k)
        out.n, out.flips = n, list(flips)
        out.levels = [np.frombuffer(x, dtype=np.float64).copy() for x in bufs]
        return out


def approx_quantiles(ds, column: str, qs, k: int = 200) -> "KLL":
    """Merged KLL over a Dataset column: one sketch per batch inside
    map_batches, merged on the driver (each sketch is O(k log n) floats
    — the HLL/Misra-Gries pattern).  Returns the merged sketch; call
    ``.quantile(q)`` on it."""
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        g = KLL(k)
        g.add_many(t[column].to_numpy(zero_copy_only=False))
        return pa.table({"sketch": pa.array([g.to_bytes()], type=pa.large_binary())})

    parts = ds.select_columns([column]).map_batches(
        sketch_batch, batch_format="pyarrow"
    ).take_all()
    acc = KLL(k)
    for row in parts:
        acc = acc.merge(KLL.from_bytes(row["sketch"]))
    return acc


def heavy_hitters(ds, key_col: str, weight_col: str, m: int = 64) -> MisraGries:
    """Merged Misra-Gries summary of a pre-aggregated (key, weight)
    Dataset: one sketch per batch inside map_batches (the HLL pattern
    above), merged on the driver — each serialized sketch holds at most
    ``m`` keys, so the driver merge is O(#blocks x m) regardless of the
    underlying stream size."""
    import pyarrow as pa

    def sketch_batch(t: pa.Table) -> pa.Table:
        g = MisraGries(m)
        g.insert_counts(
            t[key_col].to_pylist(),
            t[weight_col].to_numpy(zero_copy_only=False),
        )
        return pa.table({"sketch": pa.array([g.to_bytes()], type=pa.binary())})

    parts = ds.select_columns([key_col, weight_col]).map_batches(
        sketch_batch, batch_format="pyarrow"
    ).take_all()
    acc = MisraGries(m)
    for row in parts:
        acc = acc.merge(MisraGries.from_bytes(row["sketch"]))
    return acc
