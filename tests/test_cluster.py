"""Connected-components duplicate clustering (stages/cluster.py)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data as rd

from etl_cms_ray.stages.cluster import connected_components


def _labels(pairs: list[tuple[int, int]], **kw) -> dict[int, int]:
    ds = rd.from_arrow(pa.table({
        "a": pa.array([p[0] for p in pairs], pa.int64()),
        "b": pa.array([p[1] for p in pairs], pa.int64()),
    }))
    out = connected_components(ds, num_partitions=8, **kw).to_pandas()
    assert not out["node"].duplicated().any()
    return dict(zip(out["node"], out["label"]))


def test_cc_path_clique_and_bridge():
    # path 1-2-3-4-5 (worst case for pure hooking), clique {10,11,12},
    # and a two-component merge via a late bridge edge
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5),
             (10, 11), (11, 12), (10, 12),
             (20, 21), (30, 31), (21, 30)]
    lab = _labels(pairs)
    assert {lab[n] for n in (1, 2, 3, 4, 5)} == {1}
    assert {lab[n] for n in (10, 11, 12)} == {10}
    assert {lab[n] for n in (20, 21, 30, 31)} == {20}
    assert len(lab) == 12


def test_cc_reversed_ids_and_self_pairs():
    # labels must be the MIN id regardless of pair orientation; self-pairs
    # and duplicate edges are harmless
    pairs = [(9, 3), (3, 7), (7, 7), (9, 3), (100, 4), (4, 100)]
    lab = _labels(pairs)
    assert lab[9] == lab[3] == lab[7] == 3
    assert lab[100] == lab[4] == 4


def test_cc_long_path_converges_fast():
    # 64-node path: pure min-propagation needs ~64 rounds; hook+compress
    # must converge well inside the max_rounds guard
    pairs = [(i, i + 1) for i in range(64)]
    lab = _labels(pairs, max_rounds=16)
    assert set(lab.values()) == {0}


def test_cc_distributed_path_matches_local():
    # small edge lists take the driver-side fast path; driver_threshold=0
    # forces the distributed rounds — both must produce identical labels
    import numpy as np

    rng = np.random.default_rng(3)
    pairs = [(int(a), int(b))
             for a, b in rng.integers(0, 120, size=(300, 2)) if a != b]
    local = _labels(pairs)
    dist = _labels(pairs, driver_threshold=0, max_rounds=16)
    assert local == dist


def test_cc_paths_agree_on_schema_for_non_int64_input():
    # both paths normalize node ids through to_edges' int64 cast, so
    # crossing driver_threshold must never change the output schema
    # (dtype-drift guard, CLAUDE.md rule 5a / r4 ADVICE)
    t = pa.table({"a": pa.array([1, 2, 3], pa.int32()),
                  "b": pa.array([2, 3, 9], pa.int32())})
    fast = connected_components(rd.from_arrow(t))
    slow = connected_components(rd.from_arrow(t), driver_threshold=0)
    fa = pa.concat_tables([b for b in fast.iter_batches(batch_format="pyarrow")])
    sa = pa.concat_tables([b for b in slow.iter_batches(batch_format="pyarrow")])
    assert fa.schema.field("node").type == sa.schema.field("node").type == pa.int64()
    assert fa.schema.field("label").type == sa.schema.field("label").type == pa.int64()
    key = lambda r: r["node"]  # noqa: E731
    assert sorted(fa.to_pylist(), key=key) == sorted(sa.to_pylist(), key=key)


def test_cc_local_kernel_matches_bruteforce():
    """Hypothesis-style randomized sweep (fixed seeds, Ray-free): the
    driver-side hook+compress kernel labels every node with the true
    min reachable id, checked against an O(V*E) relaxation reference."""
    import numpy as np

    from etl_cms_ray.stages.cluster import _cc_local

    for seed in range(40):
        rng = np.random.default_rng(seed)
        m = int(rng.integers(1, 60))
        src = rng.integers(0, 40, m)
        dst = rng.integers(0, 40, m)
        t = _cc_local(np.concatenate([src, dst]),
                      np.concatenate([dst, src]))
        got = dict(zip(t["node"].to_pylist(), t["label"].to_pylist()))
        # brute force: repeatedly relax labels over the edge list
        nodes = sorted(set(src.tolist()) | set(dst.tolist()))
        lab = {v: v for v in nodes}
        for _ in range(len(nodes)):
            changed = False
            for a, b in zip(src.tolist(), dst.tolist()):
                lo = min(lab[a], lab[b])
                if lab[a] != lo or lab[b] != lo:
                    lab[a] = lab[b] = lo
                    changed = True
            if not changed:
                break
        assert got == lab, seed
