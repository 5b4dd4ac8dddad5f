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
