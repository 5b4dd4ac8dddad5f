"""Distributed BPE tokenizer TRAINING over the corpus (byte-level,
word-internal merges) — the learn-the-vocabulary step of an LLM data
pipeline, next to the catalog's BPE-ish pre-tokenizer COUNTS
(functions/text.bpe_token_count_column counts with a fixed regex; this
module learns merge rules from the data).

Algorithm (classic BPE, Sennrich et al. 2016, made Ray-Data-shaped):

- Encode once: every document becomes one int32 symbol array — utf-8
  bytes (ids 0..255) with ``-1`` separators between single-space-split
  words and at document edges, so merges NEVER cross word boundaries.
  The encode kernel is a numpy scatter over the Arrow flat-word buffer
  (no per-word Python).
- Per merge round, ONE fused streaming pass: each batch APPLIES the
  previous round's winning pair to its sequences (vectorized hit scan
  with run-parity overlap resolution — "aaa" merges left-to-right
  greedily, exactly like the reference implementation), then COUNTS its
  adjacent-pair frequencies (np.unique over a packed u64 key).  Batch
  partials reduce through coarse pair-hash buckets to ONE candidate row
  per bucket (max count, tie -> lexicographically smallest pair), and
  the driver picks the global winner from <=64 rows — never a
  vocabulary-sized gather.
- The corpus is re-materialized once per round (sequences after merges
  so far): n_merges rounds cost n_merges streaming passes + n_merges
  bounded materializations of an int32 corpus.  That is the honest cost
  of exact distributed BPE; at extreme scale one trains on a quota
  sample (doc_* samplers) or caps rounds — a cap is a training-quality
  knob, not a correctness one.

Determinism: counts are exact integers; ties break (count DESC, left
ASC, right ASC); numpy kernels are order-independent — fixed input
yields a fixed merge table on any batch split (pinned by the planted
hard check).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

_SEP = np.int32(-1)
_PACK = np.int64(1) << np.int64(32)


def encode_docs(t: pa.Table, text_col: str = "text") -> pa.Table:
    """(doc_id, syms list<int32>): utf-8 bytes with -1 word separators.

    Vectorized: one split_pattern, then a single numpy scatter of the
    flat word-byte buffer into a separator-prefilled output array."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    words = pc.split_pattern(t[text_col], pattern=" ")
    if isinstance(words, pa.ChunkedArray):
        words = words.combine_chunks()
    wc = pc.list_value_length(words).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(words)
    flat = flat.combine_chunks() if isinstance(flat, pa.ChunkedArray) else flat
    lb = flat.cast(pa.large_binary())
    n_words = len(lb)
    off_buf, data_buf = lb.buffers()[1], lb.buffers()[2]
    offsets = np.frombuffer(off_buf, dtype=np.int64)[lb.offset : lb.offset + n_words + 1]
    data = (np.frombuffer(data_buf, dtype=np.uint8)
            if data_buf is not None else np.empty(0, dtype=np.uint8))
    wlens = np.diff(offsets)
    total = int(wlens.sum())
    # output: every word's bytes followed by one separator slot
    out = np.full(total + n_words, _SEP, dtype=np.int32)
    if total:
        word_of_byte = np.repeat(np.arange(n_words, dtype=np.int64), wlens)
        starts = np.concatenate([[0], np.cumsum(wlens + 1)[:-1]])
        # position within word = arange - (word's start offset in flat data)
        pos_in_word = np.arange(total, dtype=np.int64) - np.repeat(
            offsets[:-1] - offsets[0], wlens
        )
        tgt = starts[word_of_byte] + pos_in_word
        out[tgt] = data[offsets[0] : offsets[0] + total].astype(np.int32)
    # per-doc sym lengths: sum over the doc's words of (len + 1)
    doc_words = wc
    doc_sym_lens = np.zeros(len(doc_words), dtype=np.int64)
    w_starts = np.concatenate([[0], np.cumsum(doc_words)])
    per_word = wlens + 1
    cs = np.concatenate([[0], np.cumsum(per_word)])
    doc_sym_lens = cs[w_starts[1:]] - cs[w_starts[:-1]]
    sym_offsets = np.concatenate([[0], np.cumsum(doc_sym_lens)]).astype(np.int64)
    syms = pa.LargeListArray.from_arrays(sym_offsets, pa.array(out, type=pa.int32()))
    return pa.table({"doc_id": t["doc_id"], "syms": syms})


def _flatten(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(flat int32 syms incl. separators, per-doc offsets)."""
    col = batch["syms"]
    col = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int32)
    offs = col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    return flat, offs


def apply_merge(flat: np.ndarray, offs: np.ndarray, left: int, right: int,
                new_id: int) -> tuple[np.ndarray, np.ndarray]:
    """Greedy left-to-right merge of (left,right) -> new_id, vectorized.

    Overlap rule: within a run of consecutive hits (e.g. 'aaaa' for
    pair (a,a)), keep hits at even positions in the run — exactly the
    sequential greedy result.  Separators (-1) at word/doc boundaries
    can never match, so merges stay word-internal for free."""
    if len(flat) < 2:
        return flat, offs
    hits = np.flatnonzero((flat[:-1] == left) & (flat[1:] == right))
    if len(hits) == 0:
        return flat, offs
    new_run = np.concatenate([[True], np.diff(hits) > 1])
    run_first = hits[new_run][np.cumsum(new_run) - 1]
    keep = ((hits - run_first) % 2) == 0
    p = hits[keep]
    flat = flat.copy()
    flat[p] = new_id
    mask = np.ones(len(flat), dtype=bool)
    mask[p + 1] = False
    # per-doc removed counts -> new offsets
    doc_of = np.searchsorted(offs, p + 1, side="right") - 1
    removed = np.zeros(len(offs) - 1, dtype=np.int64)
    np.add.at(removed, doc_of, 1)
    new_offs = offs.copy()
    new_offs[1:] -= np.cumsum(removed)
    return flat[mask], new_offs


def _count_pairs(flat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    if len(flat) < 2:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    a, b = flat[:-1].astype(np.int64), flat[1:].astype(np.int64)
    valid = (a >= 0) & (b >= 0)
    keys = a[valid] * _PACK + b[valid]
    return np.unique(keys, return_counts=True)


def bpe_train(
    docs: "object",
    n_merges: int = 16,
    text_col: str = "text",
    coarse_parts: int = 64,
) -> pd.DataFrame:
    """Learn ``n_merges`` BPE merges over a Dataset of documents.

    Returns a DataFrame (rank, left, right, new_id, count, token_str)
    — token_str is the merged byte string (utf-8, replacement on
    invalid) for readability.  See module docstring for the round
    structure and scale shape.
    """
    enc = docs.map_batches(
        lambda t: encode_docs(t, text_col=text_col), batch_format="pyarrow"
    ).materialize()

    merges: list[dict] = []
    vocab: dict[int, bytes] = {i: bytes([i]) for i in range(256)}
    pending: tuple | None = None  # (left, right, new_id) applied next pass

    for rank in range(1, n_merges + 1):
        prev = pending

        # two passes per round: APPLY last round's winner (this pass IS
        # the round's corpus materialization), then COUNT on the result
        # (a single map_batches cannot emit two differently-shaped
        # outputs, and the count pass reads the just-written blocks)
        def apply_only(batch: pa.Table, _prev=prev) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            if _prev is None:
                return batch
            flat, offs = _flatten(batch)
            flat, offs = apply_merge(flat, offs, *_prev)
            return pa.table({
                "doc_id": batch["doc_id"],
                "syms": pa.LargeListArray.from_arrays(
                    offs, pa.array(flat, type=pa.int32())),
            })

        if prev is not None:
            enc = enc.map_batches(apply_only, batch_format="pyarrow").materialize()

        def count_batch(batch: pa.Table) -> pa.Table:
            from ..functions.threads import single_threaded_kernels

            single_threaded_kernels()
            flat, _offs = _flatten(batch)
            keys, cnts = _count_pairs(flat)
            return pa.table({
                "pair": pa.array(keys, type=pa.int64()),
                "cnt": pa.array(cnts, type=pa.int64()),
                "fpart": pa.array((keys % coarse_parts).astype(np.int64)),
            })

        def bucket_best(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("pair", sort=False)["cnt"].sum().reset_index()
            g = g.sort_values(["cnt", "pair"], ascending=[False, True],
                              kind="mergesort")
            return g.head(1)

        cands = (
            enc.map_batches(count_batch, batch_format="pyarrow")
            .groupby("fpart")
            .map_groups(lambda d: bucket_best(d.drop(columns=["fpart"])),
                        batch_format="pandas")
            .to_pandas()
        )
        if len(cands) == 0:
            break
        cands = cands.sort_values(["cnt", "pair"], ascending=[False, True],
                                  kind="mergesort")
        best_pair, best_cnt = int(cands.iloc[0]["pair"]), int(cands.iloc[0]["cnt"])
        if best_cnt < 2:
            break  # nothing left worth merging
        left, right = best_pair // int(_PACK), best_pair % int(_PACK)
        new_id = 256 + len(merges)
        vocab[new_id] = vocab[left] + vocab[right]
        merges.append({
            "rank": rank, "left": left, "right": right, "new_id": new_id,
            "count": best_cnt,
            "token_str": vocab[new_id].decode("utf-8", errors="replace"),
        })
        pending = (left, right, new_id)

    return pd.DataFrame(
        merges,
        columns=["rank", "left", "right", "new_id", "count", "token_str"],
    )


def bpe_encode_counts(
    docs: "object", merges: pd.DataFrame, text_col: str = "text"
) -> "object":
    """(doc_id, n_syms): per-document token count AFTER applying the
    learned merges in rank order — the vocabulary-efficiency readout
    (tokens-per-doc drops as merges bite).  One streaming pass; the
    merge table ships via closure (tiny)."""
    rules = [(int(r["left"]), int(r["right"]), int(r["new_id"]))
             for _, r in merges.sort_values("rank").iterrows()]

    def enc_count(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        e = encode_docs(t, text_col=text_col)
        flat, offs = _flatten(e)
        for left, right, new_id in rules:
            flat, offs = apply_merge(flat, offs, left, right, new_id)
        lens = np.diff(offs)
        # separators (one per word) still count in lens; n_syms excludes them
        sep_per_doc = np.zeros(len(lens), dtype=np.int64)
        if len(flat):
            doc_of = np.searchsorted(offs, np.flatnonzero(flat == _SEP),
                                     side="right") - 1
            np.add.at(sep_per_doc, doc_of, 1)
        return pa.table({
            "doc_id": t["doc_id"],
            "n_syms": pa.array(lens - sep_per_doc, type=pa.int64()),
        })

    return docs.map_batches(enc_count, batch_format="pyarrow")
