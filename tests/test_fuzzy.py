"""Fuzzy string-matching join (stages/fuzzy.py): deletion-key hashes vs
a scalar polynomial reference, the vectorized edit<=1 predicate vs a
full Levenshtein DP, and end-to-end exact recall of the FastSS
blocking pipeline on planted single-edit pairs."""

import random

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_cms_ray.stages.fuzzy import (
    deletion_key_table,
    edit1_mask,
    fuzzy_pairs_edit1,
)

_B = 1099511628211


def _poly(s: bytes) -> int:
    h = 0
    for c in s:
        h = (h * _B + c) & 0xFFFFFFFFFFFFFFFF
    return h


def _neighborhood(s: bytes) -> set:
    ks = {_poly(s)}
    for d in range(len(s)):
        ks.add(_poly(s[:d] + s[d + 1:]))
    return ks


def _lev(a: bytes, b: bytes) -> int:
    la, lb = len(a), len(b)
    d = list(range(lb + 1))
    for i in range(1, la + 1):
        prev, d[0] = d[0], i
        for j in range(1, lb + 1):
            cur = d[j]
            d[j] = min(d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return d[lb]


@settings(max_examples=40, deadline=None)
@given(st.lists(st.text(alphabet="abcde#0 ", max_size=16), min_size=0,
                max_size=40))
def test_deletion_keys_match_scalar_reference(names):
    t = pa.table({
        "id": pa.array(range(len(names)), type=pa.int64()),
        "nm": pa.array(names, type=pa.string()),
    })
    kt = deletion_key_table(t, id_col="id", name_col="nm")
    got = {}
    for k, i in zip(kt["band_key"].to_pylist(), kt["doc_id"].to_pylist()):
        got.setdefault(i, set()).add(k & 0xFFFFFFFFFFFFFFFF)
    for i, nm in enumerate(names):
        assert got.get(i, set()) == _neighborhood(nm.encode()), (i, nm)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abc", max_size=9),
                          st.text(alphabet="abc", max_size=9)),
                min_size=1, max_size=80))
def test_edit1_mask_matches_levenshtein(pairs):
    a = pa.array([p[0] for p in pairs], type=pa.string())
    b = pa.array([p[1] for p in pairs], type=pa.string())
    got = edit1_mask(a, b)
    ref = np.array([_lev(x.encode(), y.encode()) <= 1 for x, y in pairs])
    assert (got == ref).all()


def test_edit1_mask_planted_edits():
    rng = random.Random(11)
    xs, ys = [], []
    for _ in range(2000):
        s = "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 15)))
        op = rng.choice(["sub", "ins", "del", "eq"])
        i = rng.randrange(len(s))
        if op == "sub":
            t = s[:i] + rng.choice("abcdef") + s[i + 1:]
        elif op == "ins":
            t = s[:i] + rng.choice("abcdef") + s[i:]
        elif op == "del":
            t = s[:i] + s[i + 1:]
        else:
            t = s
        xs.append(s)
        ys.append(t)
    got = edit1_mask(pa.array(xs), pa.array(ys))
    assert bool(got.all())


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_exact_recall_and_precision():
    """Planted single-edit variants: the pipeline must return EXACTLY
    the set of pairs at edit distance <= 1 (FastSS recall theorem +
    exact verify) — checked against the quadratic reference."""
    import ray.data as rd

    rng = random.Random(23)
    names = set()
    while len(names) < 120:
        names.add("".join(rng.choice("abcdefgh")
                          for _ in range(rng.randint(4, 10))))
    names = sorted(names)
    # plant variants of the first 30 (some may collide with existing)
    for s in list(names[:30]):
        i = rng.randrange(len(s))
        v = s[:i] + rng.choice("abcdefgh") + s[i:]
        if v not in names:
            names.append(v)
    ids = list(range(len(names)))
    ds = rd.from_arrow(pa.table({
        "id": pa.array(ids, type=pa.int64()),
        "nm": pa.array(names, type=pa.string()),
    })).repartition(5)
    got = fuzzy_pairs_edit1(ds, id_col="id", name_col="nm").to_pandas()
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    ref_pairs = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if abs(len(names[i]) - len(names[j])) <= 1 and \
                    _lev(names[i].encode(), names[j].encode()) <= 1:
                ref_pairs.add((i, j))
    assert got_pairs == ref_pairs
    assert len(ref_pairs) >= 20  # the planted edits make the test teethy
    # attached names agree with ids
    for _, r in got.iterrows():
        assert names[int(r["a"])] == r["name_a"]
        assert names[int(r["b"])] == r["name_b"]


@pytest.mark.usefixtures("ray_session")
def test_incremental_fuzzy_equals_full_restricted(tmp_path):
    """Probe of an increment against the persisted deletion-key index
    == the full-batch pipeline over corpus ∪ increment restricted to
    new-involving pairs (same buckets -> same candidates -> same
    verify)."""
    import ray.data as rd

    from etl_cms_ray.stages.fuzzy import (
        build_fuzzy_key_index,
        incremental_fuzzy_pairs,
    )

    rng = random.Random(5)
    names = []
    seen = set()
    while len(names) < 150:
        s = "".join(rng.choice("abcdefg") for _ in range(rng.randint(4, 9)))
        if s not in seen:
            seen.add(s)
            names.append(s)
    # plant edits straddling the old/new boundary both ways
    for i in (0, 1, 2, 100, 101, 102):
        s = names[i]
        j = rng.randrange(len(s))
        v = s[:j] + rng.choice("abcdefg") + s[j:]
        if v not in seen:
            seen.add(v)
            names.append(v)
    K = 100
    t = pa.table({"id": pa.array(range(len(names)), type=pa.int64()),
                  "nm": pa.array(names, type=pa.string())})
    old = rd.from_arrow(t.filter(pa.array([i < K for i in range(len(names))])))
    new = rd.from_arrow(t.filter(pa.array([i >= K for i in range(len(names))])))
    idx = str(tmp_path / "fzidx")
    build_fuzzy_key_index(old.repartition(4), idx, id_col="id", name_col="nm")
    inc = incremental_fuzzy_pairs(new.repartition(3), idx,
                                  id_col="id", name_col="nm").to_pandas()
    full = fuzzy_pairs_edit1(rd.from_arrow(t), id_col="id",
                             name_col="nm").to_pandas()
    full = full[(full["a"] >= K) | (full["b"] >= K)]
    got = set(zip(inc["a"].astype(int), inc["b"].astype(int)))
    ref = set(zip(full["a"].astype(int), full["b"].astype(int)))
    assert got == ref
    assert len(ref) >= 6  # planted straddling edits keep it teethy


@pytest.mark.usefixtures("ray_session")
def test_null_names_never_match():
    """SQL levenshtein semantics: null matches nothing — not other
    nulls, not 1-byte names (which are edit distance 1 from empty)."""
    import ray.data as rd

    t = pa.table({
        "id": pa.array([0, 1, 2, 3, 4], type=pa.int64()),
        "nm": pa.array(["a", None, None, "", "b"], type=pa.string()),
    })
    got = fuzzy_pairs_edit1(rd.from_arrow(t), id_col="id",
                            name_col="nm").to_pandas()
    pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    # "", "a", "b" all pairwise within distance 1; nulls appear nowhere
    assert pairs == {(0, 3), (0, 4), (3, 4)}
    # the predicate itself also refuses nulls
    m = edit1_mask(pa.array(["a", None, None]), pa.array([None, None, "x"]))
    assert not m.any()


@settings(max_examples=30, deadline=None)
@given(st.lists(st.tuples(st.text(alphabet="abc", max_size=9),
                          st.text(alphabet="abc", max_size=9)),
                min_size=1, max_size=60),
       st.integers(2, 3))
def test_editk_mask_matches_levenshtein(pairs, k):
    from etl_cms_ray.stages.fuzzy import editk_mask

    a = pa.array([p[0] for p in pairs], type=pa.string())
    b = pa.array([p[1] for p in pairs], type=pa.string())
    got = editk_mask(a, b, k)
    ref = np.array([_lev(x.encode(), y.encode()) <= k for x, y in pairs])
    assert (got == ref).all()


@settings(max_examples=25, deadline=None)
@given(st.lists(st.text(alphabet="abcd#0 ", max_size=12), min_size=0,
                max_size=25))
def test_deletion_keys_k2_match_scalar_reference(names):
    t = pa.table({
        "id": pa.array(range(len(names)), type=pa.int64()),
        "nm": pa.array(names, type=pa.string()),
    })
    kt = deletion_key_table(t, id_col="id", name_col="nm", k=2)
    got = {}
    for key, i in zip(kt["band_key"].to_pylist(), kt["doc_id"].to_pylist()):
        got.setdefault(i, set()).add(key & 0xFFFFFFFFFFFFFFFF)
    for i, nm in enumerate(names):
        s = nm.encode()
        ref = {_poly(s)}
        for x in range(len(s)):
            ref.add(_poly(s[:x] + s[x + 1:]))
            for y in range(x + 1, len(s)):
                ref.add(_poly(s[:x] + s[x + 1:y] + s[y + 1:]))
        assert got.get(i, set()) == ref, (i, nm)


@pytest.mark.usefixtures("ray_session")
def test_fuzzy_pairs_k2_matches_quadratic_reference():
    import ray.data as rd

    from etl_cms_ray.stages.fuzzy import fuzzy_pairs

    rng = random.Random(41)
    names = []
    seen = set()
    while len(names) < 100:
        s = "".join(rng.choice("abcdef") for _ in range(rng.randint(4, 9)))
        if s not in seen:
            seen.add(s)
            names.append(s)
    # plant 2-edit variants
    for s in list(names[:25]):
        b = list(s)
        for _ in range(2):
            i = rng.randrange(len(b))
            b[i] = rng.choice("abcdef")
        v = "".join(b)
        if v not in seen:
            seen.add(v)
            names.append(v)
    ds = rd.from_arrow(pa.table({
        "id": pa.array(range(len(names)), type=pa.int64()),
        "nm": pa.array(names, type=pa.string()),
    })).repartition(4)
    got = fuzzy_pairs(ds, id_col="id", name_col="nm", k=2).to_pandas()
    got_pairs = set(zip(got["a"].astype(int), got["b"].astype(int)))
    ref_pairs = set()
    for i in range(len(names)):
        for j in range(i + 1, len(names)):
            if _lev(names[i].encode(), names[j].encode()) <= 2:
                ref_pairs.add((i, j))
    assert got_pairs == ref_pairs
    assert len(ref_pairs) >= 20


@pytest.mark.usefixtures("ray_session")
def test_incremental_probe_refuses_shallower_index(tmp_path):
    import ray.data as rd

    from etl_cms_ray.stages.fuzzy import (
        build_fuzzy_key_index,
        incremental_fuzzy_pairs,
    )

    t = pa.table({"id": pa.array([0, 1], type=pa.int64()),
                  "nm": pa.array(["abcd", "bcde"], type=pa.string())})
    idx = str(tmp_path / "k1idx")
    build_fuzzy_key_index(rd.from_arrow(t), idx, id_col="id", name_col="nm")
    with pytest.raises(ValueError, match="k=1"):
        incremental_fuzzy_pairs(rd.from_arrow(t), idx, id_col="id",
                                name_col="nm", k=2)
    # k<=stored is fine (k=2 index serves k=1 probes: superset keys)
    idx2 = str(tmp_path / "k2idx")
    build_fuzzy_key_index(rd.from_arrow(t), idx2, id_col="id",
                          name_col="nm", k=2)
    incremental_fuzzy_pairs(rd.from_arrow(t), idx2, id_col="id",
                            name_col="nm", k=1).to_pandas()


def test_incremental_probe_missing_sidecar_assumes_k1(tmp_path):
    """An index without the meta sidecar must be treated as k=1 (warn),
    so a k=2 probe against it still fails loudly instead of silently
    losing recall (ADVICE r3)."""
    import os
    import warnings

    import ray.data as rd

    from etl_cms_ray.stages.fuzzy import (
        _index_meta_path,
        build_fuzzy_key_index,
        incremental_fuzzy_pairs,
    )

    t = pa.table({"id": pa.array([0, 1], type=pa.int64()),
                  "nm": pa.array(["abcd", "bcde"], type=pa.string())})
    idx = str(tmp_path / "nosidecar")
    build_fuzzy_key_index(rd.from_arrow(t), idx, id_col="id", name_col="nm")
    os.remove(_index_meta_path(idx))  # simulate a pre-sidecar index
    with pytest.warns(UserWarning, match="no meta sidecar"):
        with pytest.raises(ValueError, match="k=1"):
            incremental_fuzzy_pairs(rd.from_arrow(t), idx, id_col="id",
                                    name_col="nm", k=2)
    # a k=1 probe is allowed (with the warning), matching the only
    # depth a sidecar-less index can have
    with pytest.warns(UserWarning, match="no meta sidecar"):
        incremental_fuzzy_pairs(rd.from_arrow(t), idx, id_col="id",
                                name_col="nm", k=1).to_pandas()
