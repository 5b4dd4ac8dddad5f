"""Property tests for the round-2 kernels: the vectorized FNV fingerprint
against its scalar reference, list unpivot as the inverse of list
construction, and pointer-doubling closure against a naive walk.
No Ray needed — these are pure batch kernels.
"""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.one_of(st.none(), st.text(max_size=300)),
        min_size=0,
        max_size=50,
    )
)
def test_fingerprint_column_matches_scalar(strings):
    from etl_cms_ray.functions.text import fingerprint64, fingerprint_column

    arr = pa.array(strings, type=pa.string())
    got = fingerprint_column(arr).to_pylist()
    expect = [
        int(np.array([fingerprint64(s)], dtype=np.uint64).view(np.int64)[0])
        if s is not None
        else 0
        for s in strings
    ]
    assert got == expect


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.text(min_size=1, max_size=6), min_size=0, max_size=8),
        min_size=0,
        max_size=30,
    )
)
def test_unpivot_list_roundtrip(rows):
    """Exploding then regrouping by parent key reconstructs every list
    (empty lists vanish — they contribute no elements)."""
    from etl_cms_ray.stages.unpivot import unpivot_list

    t = pa.table(
        {
            "k": pa.array(range(len(rows)), type=pa.int64()),
            "xs": pa.array(rows, type=pa.list_(pa.string())),
        }
    )
    out = unpivot_list(t, "xs")
    # reconstruct
    rebuilt: dict[int, list] = {}
    for k, pos, v in zip(
        out["k"].to_pylist(), out["pos"].to_pylist(), out["xs_item"].to_pylist()
    ):
        rebuilt.setdefault(k, []).append((pos, v))
    for k, row in enumerate(rows):
        got = [v for _, v in sorted(rebuilt.get(k, []))]
        assert got == row
        if row:
            assert [p for p, _ in sorted(rebuilt[k])] == list(range(1, len(row) + 1))


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=60), st.randoms())
def test_closure_roots_matches_naive_walk(nodes, rnd):
    """Random forests: pointer doubling equals a naive per-node walk."""
    from etl_cms_ray.stages.closure import closure_roots

    nodes = sorted(set(nodes))
    parent = {}
    for i, n in enumerate(nodes):
        if i > 0 and rnd.random() < 0.8:
            parent[n] = rnd.choice(nodes[:i])  # earlier node -> acyclic
    if not parent:
        return  # no edges: closure over an empty edge table is trivial
    edges = pa.table(
        {
            "child": pa.array([f"n{c}" for c in parent], type=pa.string()),
            "parent": pa.array([f"n{p}" for p in parent.values()], type=pa.string()),
        }
    )
    got = closure_roots(edges).set_index("node")

    def walk(n):
        d = 0
        while n in parent:
            n, d = parent[n], d + 1
        return n, d

    seen = set(parent) | set(parent.values())
    for n in seen:
        root, depth = walk(n)
        assert got.loc[f"n{n}", "root"] == f"n{root}", n
        assert got.loc[f"n{n}", "depth"] == depth, n


@settings(max_examples=40, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from("abcdefgh"), min_size=0, max_size=12),
        min_size=1,
        max_size=12,
    )
)
def test_shingle_hash_rows_equivalent_to_string_shingles(token_lists):
    """The hashed-gram kernel must induce the SAME doc↔shingle structure
    as the string kernel: per-doc distinct counts match, and the grouping
    of documents by shared shingle is identical (collision-free at these
    sizes, which is the point of 64-bit grams)."""
    import pyarrow as pa

    from etl_cms_ray.stages.decontam import shingle_hash_rows, shingle_rows

    batch = pa.table(
        {
            "doc_id": pa.array(range(len(token_lists)), pa.int64()),
            "text": pa.array([" ".join(ts) for ts in token_lists], pa.string()),
        }
    )
    s = shingle_rows(batch, n=3).to_pandas()
    h = shingle_hash_rows(batch, n=3).to_pandas()
    # identical per-doc distinct window counts
    sc = s.groupby("doc_id").size().to_dict()
    hc = h.groupby("doc_id").size().to_dict()
    assert sc == hc
    # identical doc-grouping structure: the multiset of doc-sets reachable
    # from one shingle equals the multiset reachable from one hash
    sg = sorted(s.groupby("shingle")["doc_id"].apply(frozenset).tolist(),
                key=lambda x: sorted(x))
    hg = sorted(h.groupby("gh")["doc_id"].apply(frozenset).tolist(),
                key=lambda x: sorted(x))
    assert sg == hg


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(["insert", "update", "delete"]),
            st.one_of(st.none(), st.integers(-100, 100)),
            st.one_of(st.none(), st.sampled_from(["py", "rs", "go", "zz"])),
        ),
        min_size=0,
        max_size=40,
    ),
    st.booleans(),
)
def test_expectation_reasons_match_bruteforce(rows, on_delete):
    """The vectorized bitmask reason builder equals a per-row reference:
    nulls violate, deletes skip unless on_delete, reasons comma-join in
    declaration order, clean rows get null reasons."""
    from etl_cms_ray.stages.expectations import (Expectation, reason_strings,
                                                 violation_masks)

    t = pa.table({
        "op": pa.array([r[0] for r in rows], type=pa.string()),
        "n": pa.array([r[1] for r in rows], type=pa.int64()),
        "lang": pa.array([r[2] for r in rows], type=pa.string()),
    })
    exps = [
        Expectation("n_nonneg", "n", "ge", 0, on_delete=on_delete),
        Expectation("n_band", "n", "between", -50, 50, on_delete=on_delete),
        Expectation("lang_known", "lang", "in_set", ("py", "rs", "go"),
                    on_delete=on_delete),
        Expectation("lang_nn", "lang", "not_null", on_delete=on_delete),
    ]
    valid, reasons = reason_strings(
        violation_masks(t, exps), [e.name for e in exps], t.num_rows
    )

    def ref_row(op, n, lang):
        if op == "delete" and not on_delete:
            return []
        fails = []
        if n is None or n < 0:
            fails.append("n_nonneg")
        if n is None or not (-50 <= n <= 50):
            fails.append("n_band")
        if lang is None or lang not in ("py", "rs", "go"):
            fails.append("lang_known")
        if lang is None:
            fails.append("lang_nn")
        return fails

    for i, (op, n, lang) in enumerate(rows):
        fails = ref_row(op, n, lang)
        assert bool(valid[i]) == (not fails), (i, rows[i])
        expect = ",".join(fails) if fails else None
        assert reasons[i].as_py() == expect, (i, rows[i])
