"""Bloom-filter semi-join pruning — shrink the shuffle before an exact join.

At scale, joining a huge fact stream against a filtered build side moves
every fact block through the all-to-all exchange even though most rows
cannot match.  A Bloom filter over the build-side keys is built
DISTRIBUTED (one partial bitmap per batch, OR-merged — bitmap OR is the
same mergeable-sketch shape as functions/sketch.py), broadcast once via
``ray.put``, and applied inside ``map_batches`` to drop
definitely-non-matching fact rows before the shuffle.  Bloom filters
have NO false negatives, so pruning never changes the result of the
exact join that follows; false positives only cost the shuffle a few
extra rows (rate set by bits-per-key).

Analog of the reference's prefilter-before-lookup pattern
(`python_etl/CMS_SynPuf_ETL_CDM_v5.py` vocabulary pre-checks before the
per-claim dictionary probes), re-expressed as a broadcast bitmap stage.

Hashing: splitmix64 finalizer over int64 keys (numpy-vectorized), k
probe positions derived by Kirsch-Mitzenmacher double hashing
(h1 + i*h2 mod n_bits) — one mix pass regardless of k.  String keys:
fingerprint them to int64 first (functions/text.fingerprint_column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

__all__ = ["BloomFilter", "build_bloom", "bloom_prune"]


def _mix64(x: np.ndarray, seed: np.uint64) -> np.ndarray:
    """splitmix64 finalizer — deterministic, vectorized, well-mixed."""
    x = x.view(np.uint64) if x.dtype == np.int64 else x.astype(np.uint64)
    x = (x + seed).copy()
    x ^= x >> np.uint64(30)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(27)
    x *= np.uint64(0x94D049BB133111EB)
    x ^= x >> np.uint64(31)
    return x


class BloomFilter:
    """Fixed-size mergeable Bloom filter over int64 keys.

    ``n_bits`` must be identical across every partial that will merge
    (it is a structural parameter, like HLL's p).  Size rule of thumb:
    ~10 bits per expected key gives ~1% false positives with k=4..7.
    """

    def __init__(self, n_bits: int = 1 << 20, k: int = 5):
        assert n_bits % 8 == 0 and n_bits > 0
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) probe bit positions via double hashing."""
        h1 = _mix64(keys, np.uint64(0x9E3779B97F4A7C15))
        h2 = _mix64(keys, np.uint64(0xC2B2AE3D27D4EB4F)) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[:, None]
        return ((h1[None, :] + i * h2[None, :]) % np.uint64(self.n_bits))

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(np.asarray(keys))
        byte, bit = (pos >> np.uint64(3)).astype(np.int64), pos & np.uint64(7)
        np.bitwise_or.at(self.bits, byte.ravel(),
                         (np.uint8(1) << bit.ravel().astype(np.uint8)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """Boolean mask; True may be a false positive, False never is."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(np.asarray(keys))
        byte, bit = (pos >> np.uint64(3)).astype(np.int64), pos & np.uint64(7)
        probes = (self.bits[byte] >> bit.astype(np.uint8)) & np.uint8(1)
        return probes.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        out = BloomFilter(self.n_bits, self.k)
        out.bits = np.bitwise_or(self.bits, other.bits)
        return out

    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.k], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @staticmethod
    def from_bytes(b: bytes) -> "BloomFilter":
        n_bits, k = np.frombuffer(b[:16], dtype=np.int64)
        f = BloomFilter(int(n_bits), int(k))
        f.bits = np.frombuffer(b[16:], dtype=np.uint8).copy()
        return f


def build_bloom(ds, key_col: str, n_bits: int = 1 << 20, k: int = 5):
    """Distributed Bloom build: one partial bitmap per batch inside
    map_batches, OR-merged on the driver, broadcast via ``ray.put``.

    Returns an ObjectRef to the merged filter — pass it to
    ``bloom_prune`` (read once per task from the object store, never
    re-shipped per batch).  Driver cost is O(#blocks x n_bits/8) bytes
    of partials; size n_bits for the BUILD side (the small one)."""
    import ray

    def partial(t: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits, k)
        f.add_many(t[key_col].to_numpy(zero_copy_only=False).astype(np.int64))
        return pa.table({"bloom": pa.array([f.to_bytes()], type=pa.large_binary())})

    parts = ds.select_columns([key_col]).map_batches(
        partial, batch_format="pyarrow"
    ).take_all()
    acc = BloomFilter(n_bits, k)
    for row in parts:
        acc = acc.merge(BloomFilter.from_bytes(row["bloom"]))
    return ray.put(acc)


def bloom_prune(ds, key_col: str, bloom_ref, counter=None):
    """Drop rows whose key is DEFINITELY absent from the broadcast filter.

    Safe before any exact join/filter on the same key (no false
    negatives).  ``counter`` (stages/metrics.make_counter) records
    ``bloom_kept`` / ``bloom_pruned`` so the pruning power is observable,
    not guessed."""

    def prune(t: pa.Table, *, _ref, _counter) -> pa.Table:
        import ray

        f = ray.get(_ref) if not isinstance(_ref, BloomFilter) else _ref
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        mask = f.contains_many(keys)
        if _counter is not None:
            kept = int(mask.sum())
            _counter.add.remote("bloom_kept", kept)
            _counter.add.remote("bloom_pruned", t.num_rows - kept)
        return t.filter(pa.array(mask))

    return ds.map_batches(
        prune, batch_format="pyarrow",
        fn_kwargs={"_ref": bloom_ref, "_counter": counter},
    )
