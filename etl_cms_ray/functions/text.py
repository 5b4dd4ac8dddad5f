"""Text-analysis kernels for the documents pipeline (vectorized where the
kernel allows; per-row work uses C-core helpers inside map_batches).

These are the training-data-pipeline operators layered on the engine:
language-ID (char-n-gram heuristic), quality scoring, token counting and
document fingerprinting (rolling hash).  The SQL-mirrorable ones
(token/char/punct counts) use single-space-split semantics so the DuckDB
oracle (`string_split(text, ' ')`) matches exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# SQL-mirrorable counts (exact DuckDB parity)


def token_count_column(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Number of single-space-separated fields == array_length(string_split(text,' ')).

    Vectorized: count of ' ' occurrences + 1 (DuckDB counts empty fields too).
    """
    spaces = pc.count_substring(text, " ")
    return pc.add(spaces, 1).cast(pa.int64())


def char_count_column(text) -> pa.Array:
    return pc.utf8_length(text).cast(pa.int64())


def punct_count_column(text, ch: str = ".") -> pa.Array:
    return pc.count_substring(text, ch).cast(pa.int64())


def quality_score_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality heuristics per row: token/char/punct counts and a score.

    score = round(n_tokens / n_chars * 100 + n_punct, 4) — deliberately a
    closed-form so the DuckDB oracle can reproduce it bit-for-bit after
    rounding.  (Reference analog: the inline scalar library, SURVEY.md §2.8.)
    """
    text = t[text_col]
    n_tok = token_count_column(text)
    n_chars = char_count_column(text)
    n_punct = punct_count_column(text)
    score = pc.round(
        pc.add(
            pc.multiply(
                pc.divide(n_tok.cast(pa.float64()), n_chars.cast(pa.float64())), 100.0
            ),
            n_punct.cast(pa.float64()),
        ),
        ndigits=4,
    )
    out = t.append_column("n_tokens", n_tok)
    out = out.append_column("n_chars_c", n_chars)
    out = out.append_column("n_punct", n_punct)
    out = out.append_column("quality_score", score)
    return out


# ---------------------------------------------------------------------------
# BPE-ish pre-tokenization — GPT-2-style split pattern, simplified to
# RE2-compatible syntax (no lookahead, no \p classes) so the DuckDB
# oracle can run the IDENTICAL pattern via regexp_extract_all

BPE_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^ A-Za-z0-9]+| +"
)
_BPE_RE = None


def bpe_token_count_column(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Token count under the BPE-ish pre-tokenizer (contractions, letter
    runs, digit runs, punctuation runs, space runs — each with optional
    leading space).  The regex is compiled once per process; the scan
    itself is C-core (re module) per row — tokenization is inherently
    per-row, so this is the vectorization floor."""
    global _BPE_RE
    if _BPE_RE is None:
        import re

        _BPE_RE = re.compile(BPE_SPLIT_PATTERN)
    find = _BPE_RE.findall
    arr = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    counts = np.fromiter(
        (0 if v is None else len(find(v)) for v in arr.to_pylist()),
        dtype=np.int64,
        count=len(arr),
    )
    return pa.array(counts)


# ---------------------------------------------------------------------------
# Language ID — tiny char-trigram profile heuristic (deterministic)

_LANG_MARKERS = {
    "en": [" the ", " and ", " of ", " to ", " is "],
    "fr": [" le ", " la ", " et ", " les ", " des "],
    "es": [" el ", " los ", " que ", " y ", " las "],
    "de": [" der ", " die ", " und ", " das ", " ist "],
    "zh": ["的", "是", "了", "在", "我"],
}


def lang_id_table(t: pa.Table, text_col: str = "text") -> pa.Table:
    """Predict language by marker-hit voting (vectorized: one
    count_substring pass per marker, argmax across the score matrix)."""
    text = t[text_col]
    lowered = pc.utf8_lower(text)
    langs = list(_LANG_MARKERS)
    scores = np.zeros((t.num_rows, len(langs)), dtype=np.int64)
    for j, lang in enumerate(langs):
        for marker in _LANG_MARKERS[lang]:
            scores[:, j] += pc.count_substring(lowered, marker).to_numpy(
                zero_copy_only=False
            )
    best = np.argmax(scores, axis=1)
    hit = scores[np.arange(len(best)), best] > 0
    pred = np.where(hit, np.array(langs, dtype=object)[best], "unknown")
    return t.append_column("lang_pred", pa.array(pred.tolist(), type=pa.string()))


# ---------------------------------------------------------------------------
# Fingerprinting — 64-bit polynomial rolling hash over tokens

_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint64(s: str) -> int:
    """FNV-1a 64-bit over utf-8 bytes — deterministic, portable."""
    h = int(_FP_OFFSET)
    for b in s.encode():
        h ^= b
        h = (h * int(_FP_BASE)) & 0xFFFFFFFFFFFFFFFF
    return h


def fingerprint_column(text: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized FNV-1a 64 over a string column (identical output to
    fingerprint64 per row; nulls -> 0).

    The per-byte hash recurrence is sequential WITHIN a row but
    independent ACROSS rows, so the loop runs over byte POSITIONS: at
    step j every row longer than j bytes advances one FNV round via
    numpy uint64 kernels on the column's raw utf-8 buffer (zero-copy,
    no per-row Python).  Total work is O(total_bytes) with numpy
    constant factors; a scalar tail finishes the few rows that outlive
    the vectorized population (length skew guard)."""
    arr = text.combine_chunks() if isinstance(text, pa.ChunkedArray) else text
    n = len(arr)
    if n == 0:
        return pa.array([], type=pa.int64())
    lb = arr.cast(pa.large_binary())  # int64 offsets, handles >2 GB slabs
    off_buf, data_buf = lb.buffers()[1], lb.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype=np.int64)[lb.offset : lb.offset + n + 1]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None
        else np.empty(0, dtype=np.uint8)
    )
    starts, lengths = offsets[:-1], np.diff(offsets)
    valid = np.asarray(
        pa.compute.is_valid(lb).to_numpy(zero_copy_only=False), dtype=bool
    )
    # rows sorted by length desc: the rows still alive at byte position j
    # are always a contiguous PREFIX, so each step is one gather + one
    # fused xor-mul over hs[:k] — no per-step mask scan over all n rows
    order = np.argsort(-lengths, kind="stable")
    slen, sstart = lengths[order], starts[order]
    hs = np.full(n, _FP_OFFSET, dtype=np.uint64)
    maxlen = int(slen[0]) if n else 0
    neg_slen = -slen
    with np.errstate(over="ignore"):
        for j in range(maxlen):
            k = int(np.searchsorted(neg_slen, -j, side="left"))  # rows len>j
            if k == 0:
                break
            if k < 32 and j > 64:
                # few long stragglers: finish each sequentially instead of
                # one numpy call per remaining byte of the longest row
                for i in range(k):
                    hv = int(hs[i])
                    for b in data[sstart[i] + j : sstart[i] + slen[i]].tolist():
                        hv = ((hv ^ b) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
                    hs[i] = np.uint64(hv)
                break
            byts = data[sstart[:k] + j].astype(np.uint64)
            hs[:k] = (hs[:k] ^ byts) * _FP_BASE
    h = np.empty(n, dtype=np.uint64)
    h[order] = hs
    h[~valid] = 0
    return pa.array(h.view(np.int64), type=pa.int64())
