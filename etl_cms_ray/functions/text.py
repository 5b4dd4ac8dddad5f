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
    chunks = text.chunks if isinstance(text, pa.ChunkedArray) else [text]
    out: list[int] = []
    for chunk in chunks:
        out.extend(fingerprint64(v.as_py()) if v.is_valid else 0 for v in chunk)
    return pa.array(np.array(out, dtype=np.uint64).view(np.int64), type=pa.int64())
