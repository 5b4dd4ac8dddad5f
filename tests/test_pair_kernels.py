"""Property tests: the vectorized doc-pair / winnowing kernels vs
brute-force references.

_doc_distinct_pairs' partner-index construction (factorize + packed-key
np.unique + repeat/cumsum) and doc_winnow_fingerprints' window-min sweep
(Arrow min_element_wise over shifted gram columns) are pure index
arithmetic — easy to get off-by-one wrong at doc boundaries, so each is
pinned against an obvious per-doc Python reference over randomized
corpora including the degenerate shapes (empty-ish docs, single-token
docs, all-identical tokens).
"""

import itertools

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_cms_ray.pipelines.queries import _doc_distinct_pairs

WORDS = ["a", "b", "c", "aa", "ab", "zz", "q"]


def _ref_pairs(texts):
    cnt = {}
    for txt in texts:
        toks = sorted(set(txt.split(" ")))
        for x, y in itertools.combinations(toks, 2):
            cnt[(x, y)] = cnt.get((x, y), 0) + 1
    return cnt


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=12),
    min_size=1, max_size=20,
))
def test_doc_distinct_pairs_matches_bruteforce(docs):
    texts = [" ".join(d) for d in docs]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    a, b, n = _doc_distinct_pairs(t)
    got = dict(zip(zip(a.tolist(), b.tolist()), n.tolist()))
    assert got == _ref_pairs(texts)
    assert all(x < y for x, y in got), "pairs must be string-ordered a < b"


def _ref_winnow(texts, n=4, w=4):
    rows = []
    for i, txt in enumerate(texts):
        toks = txt.split(" ")
        grams = [" ".join(toks[j:j + n]) for j in range(len(toks) - n + 1)]
        wins = [min(grams[j:j + w]) for j in range(len(grams) - w + 1)]
        rows.append((i, max(len(grams) - w + 1, 0), len(set(wins))))
    return rows


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.lists(st.sampled_from(WORDS), min_size=1, max_size=16),
    min_size=1, max_size=12,
))
def test_winnow_kernel_matches_bruteforce(docs):
    # drive the batch kernel directly (no Ray): reach inside the query's
    # map_batches callable via a tiny in-process table
    from etl_cms_ray.pipelines import queries as Q

    texts = [" ".join(d) for d in docs]
    t = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": pa.array(texts, type=pa.string())})
    # the winnow() closure lives inside doc_winnow_fingerprints; replicate
    # its invocation by calling the query at a fake sf_dir is not possible
    # without parquet, so the kernel body is re-entered through a module
    # helper extracted for exactly this test
    out = Q._winnow_batch(t)
    got = list(zip(out["doc_id"], out["n_windows"], out["n_fingerprints"]))
    assert got == _ref_winnow(texts)
