"""MinHash / SimHash / shingle kernels for near-duplicate detection.

Deterministic (fixed-seed permutations), numpy-vectorized per document:
shingle hashing is a C-core crc32 loop, signature computation is a single
broadcasted (K x S) min-reduce.  Designed for actor-pool map_batches
stages — the permutation matrices are built once per actor.
"""

from __future__ import annotations

import zlib

import numpy as np

_MERSENNE = (1 << 61) - 1
_MAXH = np.uint64(1 << 62)


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct k-gram crc32 hashes of a document (uint64)."""
    if len(text) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    b = text.encode()
    # byte-level k-grams approximate char k-grams and avoid re-encoding
    hs = {zlib.crc32(b[i : i + k]) for i in range(len(b) - k + 1)}
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


def word_shingles(text: str, k: int = 3) -> np.ndarray:
    """Distinct word k-gram crc32 hashes — ~20x fewer shingles than char
    5-grams on prose, the standard choice for document near-dup at scale."""
    toks = text.split()
    if len(toks) < k:
        return np.array([zlib.crc32(text.encode())], dtype=np.uint64)
    crc = zlib.crc32
    hs = {crc(" ".join(toks[i : i + k]).encode()) for i in range(len(toks) - k + 1)}
    return np.fromiter(hs, dtype=np.uint64, count=len(hs))


class MinHasher:
    """K-permutation MinHash + banded LSH keys.

    sig_i = min over shingles s of (a_i * s + b_i) mod p — the standard
    universal-hash construction; band key = crc32 of the band's rows.
    """

    def __init__(self, num_perm: int = 128, bands: int = 32, seed: int = 7):
        assert num_perm % bands == 0
        self.num_perm = num_perm
        self.bands = bands
        self.rows = num_perm // bands
        rng = np.random.RandomState(seed)
        self.a = rng.randint(1, _MERSENNE, size=num_perm, dtype=np.uint64)
        self.b = rng.randint(0, _MERSENNE, size=num_perm, dtype=np.uint64)

    def signature(self, shingles: np.ndarray) -> np.ndarray:
        # (K, S): (a[:,None] * s[None,:] + b[:,None]) mod p, min over S
        # (out= form: see signatures_flat on the (K,1)x(1,S) numpy trap)
        S = shingles.astype(np.uint64, copy=False)
        x = np.empty((self.num_perm, len(S)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            np.multiply(self.a[:, None], S[None, :], out=x)
            x += self.b[:, None]
            x %= np.uint64(_MERSENNE)
        return x.min(axis=1)

    def signatures_batch(self, shingle_arrays: list) -> np.ndarray:
        """(ndocs, K) signatures for a whole batch in a handful of numpy
        ops: concatenate all shingles, one broadcasted hash per perm-chunk,
        segmented min via np.minimum.reduceat — no per-document loop."""
        if not shingle_arrays:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        lengths = np.array([len(a) for a in shingle_arrays])
        starts = np.concatenate([[0], np.cumsum(lengths)[:-1]])
        S = np.concatenate(shingle_arrays).astype(np.uint64)
        return self.signatures_flat(S, starts)

    def signatures_flat(self, S: np.ndarray, seg_starts: np.ndarray) -> np.ndarray:
        """(nsegs, K) signatures over a FLAT uint64 gram array segmented by
        ``seg_starts`` (one start index per document; every segment must be
        non-empty).  This is the zero-Python-loop entry the banding stage
        feeds directly from a list-offset gram sweep; duplicates within a
        segment are harmless (min over a multiset == min over its set)."""
        nsegs = len(seg_starts)
        if nsegs == 0:
            return np.empty((0, self.num_perm), dtype=np.uint64)
        out = np.empty((nsegs, self.num_perm), dtype=np.uint64)
        chunk = 32  # bound the (chunk x total_shingles) temporary
        seg_starts = np.asarray(seg_starts, dtype=np.intp)
        S = S.astype(np.uint64, copy=False)
        x = np.empty((chunk, len(S)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for c0 in range(0, self.num_perm, chunk):
                a = self.a[c0 : c0 + chunk, None]
                b = self.b[c0 : c0 + chunk, None]
                cn = len(a)
                xv = x[:cn]
                # out= / in-place forms skip the two (K, N) temporaries of
                # the naive expression (~1.7x on the multiply+add+mod
                # chain at K=32, N=50k, best-of-20); this IS the minhash
                # inner loop
                np.multiply(a, S[None, :], out=xv)
                xv += b
                xv %= np.uint64(_MERSENNE)
                out[:, c0 : c0 + chunk] = np.minimum.reduceat(
                    xv, seg_starts, axis=1
                ).T
        return out

    def band_keys_batch(self, sigs: np.ndarray) -> np.ndarray:
        """(ndocs * bands,) int64 band keys, doc-major: an FNV-style
        uint64 fold across each band's rows — one numpy op per row
        (rows = num_perm/bands, typically 4), replacing the per-(doc,
        band) crc32-of-bytes loop."""
        n = sigs.shape[0]
        sig3 = sigs.reshape(n, self.bands, self.rows)
        key = np.full((n, self.bands), 0xCBF29CE484222325, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for r in range(self.rows):
                key = (key ^ sig3[:, :, r]) * np.uint64(1099511628211)
        return key.view(np.int64).ravel()

    def band_keys(self, sig: np.ndarray) -> list[int]:
        out = []
        for band in range(self.bands):
            chunk = sig[band * self.rows : (band + 1) * self.rows]
            out.append(zlib.crc32(chunk.tobytes()) & 0xFFFFFFFF)
        return out


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def simhash64(shingles: np.ndarray) -> int:
    """64-bit SimHash: sign of per-bit vote over shingle hashes.

    Shingle hashes are widened to 64 bits by a second crc pass so all 64
    positions carry signal.
    """
    if shingles.size == 0:
        return 0
    lo = shingles.astype(np.uint64)
    hi = np.array(
        [zlib.crc32(int(s).to_bytes(8, "little")) for s in shingles], dtype=np.uint64
    )
    h64 = (hi << np.uint64(32)) | (lo & np.uint64(0xFFFFFFFF))
    bits = ((h64[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
        np.int64
    )
    votes = (2 * bits - 1).sum(axis=0)
    out = np.uint64(0)
    for i in range(64):
        if votes[i] > 0:
            out |= np.uint64(1) << np.uint64(i)
    return int(out)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")
