"""Incremental MinHash near-dup vs full recompute.

The contract (stages/dedup.incremental_minhash_pairs): probing a
persisted corpus band index with a new batch yields EXACTLY the pairs
the full-batch minhash_lsh_pairs over (corpus ∪ new) would emit,
restricted to pairs with at least one new side — identical bucket
contents → identical skew caps → identical candidates → same verify
kernel, so jaccard values match bit-for-bit too.
"""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from etl_cms_ray.stages.dedup import (
    build_minhash_band_index,
    incremental_minhash_pairs,
    minhash_lsh_pairs,
)


def _mk_docs(ids, texts):
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(ids, type=pa.int64()),
        "text": pa.array(texts, type=pa.string()),
    }))


@pytest.fixture(scope="module")
def corpus_and_new(ray_session):
    rng = np.random.RandomState(7)
    words = [f"w{i}" for i in range(50)]
    corpus_ids, corpus_texts = [], []
    for i in range(40):
        corpus_ids.append(i)
        corpus_texts.append(" ".join(rng.choice(words, size=30)))
    new_ids, new_texts = [], []
    # planted near-dups of committed docs 0..9: one appended token
    for i in range(10):
        new_ids.append(1000 + i)
        new_texts.append(corpus_texts[i] + " zz")
    # fresh unrelated docs
    for i in range(10):
        new_ids.append(2000 + i)
        new_texts.append(" ".join(rng.choice(words, size=30)))
    # one new-new near-dup pair
    base = " ".join(rng.choice(words, size=30))
    new_ids += [3000, 3001]
    new_texts += [base, base + " qq"]
    return (corpus_ids, corpus_texts, new_ids, new_texts)


def test_incremental_equals_full_recompute(ray_session, tmp_path, corpus_and_new):
    corpus_ids, corpus_texts, new_ids, new_texts = corpus_and_new
    corpus = _mk_docs(corpus_ids, corpus_texts)
    new = _mk_docs(new_ids, new_texts)
    all_docs = _mk_docs(corpus_ids + new_ids, corpus_texts + new_texts)

    index_dir = str(tmp_path / "band_index")
    build_minhash_band_index(corpus, index_dir)
    inc = incremental_minhash_pairs(
        new, index_dir, all_docs, threshold=0.5,
        text_type=pa.string()).to_pandas()

    full = minhash_lsh_pairs(all_docs, threshold=0.5).to_pandas()
    new_set = set(new_ids)
    full_new = full[[a in new_set or b in new_set
                     for a, b in zip(full["a"], full["b"])]]

    key = ["a", "b"]
    inc_s = inc.sort_values(key).reset_index(drop=True)
    full_s = full_new.sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(inc_s, full_s, check_like=True)


def test_incremental_planted_recall_and_no_old_pairs(
    ray_session, tmp_path, corpus_and_new
):
    corpus_ids, corpus_texts, new_ids, new_texts = corpus_and_new
    corpus = _mk_docs(corpus_ids, corpus_texts)
    new = _mk_docs(new_ids, new_texts)
    all_docs = _mk_docs(corpus_ids + new_ids, corpus_texts + new_texts)

    index_dir = str(tmp_path / "band_index2")
    build_minhash_band_index(corpus, index_dir)
    inc = incremental_minhash_pairs(
        new, index_dir, all_docs, threshold=0.5,
        text_type=pa.string()).to_pandas()

    got = set(zip(inc["a"], inc["b"]))
    for i in range(10):
        assert (i, 1000 + i) in got, f"planted corpus near-dup {i} missed"
    assert (3000, 3001) in got, "planted new-new near-dup missed"

    new_set = set(new_ids)
    assert all(a in new_set or b in new_set for a, b in got), \
        "old x old pair leaked through the side filter"
    assert (inc["jaccard"] >= 0.5).all()
