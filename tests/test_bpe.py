"""Distributed BPE tokenizer training: hand-computed merge sequence on
the classic corpus, greedy-overlap semantics, determinism across batch
splits, and the post-merge token-count readout."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from etl_cms_ray.stages.bpe import (apply_merge, bpe_encode_counts,
                                    bpe_train, encode_docs)

CORPUS = pa.table({
    "doc_id": pa.array(range(4), type=pa.int64()),
    "text": ["low low low", "lower lower", "newest newest newest", "widest"],
})

# hand-derived greedy BPE sequence for CORPUS (count DESC, pair ASC ties):
# (l,o)x5 -> lo, (w,e)x5 -> we, (s,t)x4 -> st, (e,we)x3 -> ewe,
# (n,ewe)x3 -> newe, (lo,w)x3 -> low
EXPECTED = [("lo", 5), ("we", 5), ("st", 4), ("ewe", 3), ("newe", 3),
            ("low", 3)]


def test_encode_docs_layout(ray_session):
    t = pa.table({"doc_id": pa.array([0, 1], type=pa.int64()),
                  "text": ["ab ab", "aab"]})
    e = encode_docs(t)
    assert e["syms"].to_pylist() == [[97, 98, -1, 97, 98, -1],
                                     [97, 97, 98, -1]]


def test_apply_merge_greedy_overlap():
    offs = np.array([0, 5], dtype=np.int64)
    flat = np.array([97, 97, 97, 97, -1], dtype=np.int32)
    out, oo = apply_merge(flat, offs, 97, 97, 300)
    assert out.tolist() == [300, 300, -1] and oo.tolist() == [0, 3]
    flat = np.array([97, 97, 97, -1], dtype=np.int32)
    out, oo = apply_merge(flat, np.array([0, 4], dtype=np.int64), 97, 97, 300)
    assert out.tolist() == [300, 97, -1] and oo.tolist() == [0, 3]
    # a pair involving the separator never WINS (the counter masks it),
    # but apply itself is mechanical: both (97,-1) sites rewrite
    flat = np.array([97, -1, 97, -1], dtype=np.int32)
    out, _ = apply_merge(flat, np.array([0, 4], dtype=np.int64), 97, -1, 300)
    assert out.tolist() == [300, 300]


def test_bpe_train_classic_corpus(ray_session):
    m = bpe_train(rd.from_arrow(CORPUS), n_merges=6)
    assert list(zip(m["token_str"], m["count"])) == EXPECTED
    assert list(m["rank"]) == [1, 2, 3, 4, 5, 6]
    assert list(m["new_id"]) == [256, 257, 258, 259, 260, 261]
    # stops when nothing repeats: a corpus of unique chars learns nothing
    empty = bpe_train(rd.from_arrow(pa.table({
        "doc_id": pa.array([0], type=pa.int64()), "text": ["abcdefg"],
    })), n_merges=4)
    assert len(empty) == 0


def test_bpe_train_deterministic_across_splits(ray_session):
    m1 = bpe_train(rd.from_arrow(CORPUS), n_merges=6)
    m2 = bpe_train(rd.from_arrow(CORPUS).repartition(5), n_merges=6)
    assert m1.equals(m2)


def test_bpe_encode_counts(ray_session):
    m = bpe_train(rd.from_arrow(CORPUS), n_merges=6)
    cnts = bpe_encode_counts(rd.from_arrow(CORPUS), m).to_pandas()
    got = dict(zip(cnts["doc_id"], cnts["n_syms"]))
    # low->1 sym x3; lower->[lo,we,r] x2; newest->[newe,st] x3; widest->5
    assert got == {0: 3, 1: 6, 2: 6, 3: 5}
    # with no merges, counts are plain byte counts per word
    cnts0 = bpe_encode_counts(rd.from_arrow(CORPUS),
                              bpe_train(rd.from_arrow(CORPUS), n_merges=0)
                              ).to_pandas()
    got0 = dict(zip(cnts0["doc_id"], cnts0["n_syms"]))
    assert got0 == {0: 9, 1: 10, 2: 18, 3: 6}
