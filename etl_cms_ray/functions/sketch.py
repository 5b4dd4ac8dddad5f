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
