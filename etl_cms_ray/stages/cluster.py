"""Duplicate clustering: distributed connected components over a pair list.

Near-dup detection (minhash / simhash / n-gram Jaccard, ``stages/dedup.py``)
emits PAIRS; acting on them (keep one doc per duplicate group) needs the
transitive closure of those pairs — the connected components of the
undirected doc graph, with the canonical representative chosen
deterministically (min doc id).  The reference's emit-once identity sets
(``CMS_SynPuf_ETL_CDM_v5.py`` provider/visit registries, SURVEY.md §2.3
T4/T5) are the degenerate exact-match version of the same idea; this
operator generalizes it to a graph.

Algorithm: iterated hook + compress (min-label propagation with pointer
shortcutting), the standard shared-nothing CC formulation:

  label(v)  <-  min(label(v), min over neighbors u of label(u))   [hook]
  label(v)  <-  label(label(v))                                   [compress]

until no label changes.  Hooking alone needs O(diameter) rounds; the
compress step collapses label chains through the *label graph*, giving
O(log n) rounds on pathological paths while duplicate clusters (near-
cliques, diameter 1-3) converge in 2-3.  Every step is a hash-partitioned
join or a combiner-then-coarse-partition min — no driver-side graph, no
per-node Python.

Partitioning / scale assumptions (custom-operator rule, SURVEY.md §2):
the edge list is the *near-duplicate* pair set — orders of magnitude
smaller than the corpus — and each round moves O(E + N_touched) rows
through ``stages/join.py`` hash joins keyed by int64 node ids.  The
driver holds only per-round row counts (convergence test), never labels.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data as rd

from .join import hash_join

_LBL = pa.schema([("node", pa.int64()), ("label", pa.int64())])
_EDG = pa.schema([("src", pa.int64()), ("dst", pa.int64())])


def _coarse_min(ds: "rd.Dataset", key: str, val: str, parts: int) -> "rd.Dataset":
    """min(val) per key: per-batch combiner -> coarse hash partition ->
    one vectorized sweep each (CLAUDE.md rule 3 shape)."""

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({key: t[key].to_numpy(zero_copy_only=False),
                           val: t[val].to_numpy(zero_copy_only=False)})
        g = df.groupby(key, sort=False)[val].min().reset_index()
        k = g[key].to_numpy()
        g["fpart"] = (k % parts).astype(np.int64)
        return pa.Table.from_pandas(g, preserve_index=False)

    def sweep(df: pd.DataFrame) -> pd.DataFrame:
        return (df.groupby(key, sort=False)[val].min().reset_index())

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("fpart")
        .map_groups(sweep, batch_format="pandas")
    )


def _cc_local(src: np.ndarray, dst: np.ndarray) -> pa.Table:
    """Exact min-label CC over an in-memory edge list: same hook +
    compress recurrence as the distributed rounds, on numpy."""
    nodes, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    e_src = inv[: len(src)]
    e_dst = inv[len(src):]
    labels = np.arange(len(nodes), dtype=np.int64)
    while True:
        cand = labels.copy()
        np.minimum.at(cand, e_src, labels[e_dst])
        np.minimum.at(cand, e_dst, labels[e_src])
        cand = np.minimum(cand, cand[cand])  # compress
        if np.array_equal(cand, labels):
            break
        labels = cand
    return pa.table({"node": pa.array(nodes.astype(np.int64)),
                     "label": pa.array(nodes[labels].astype(np.int64))})


def connected_components(
    pairs: "rd.Dataset",
    a_col: str = "a",
    b_col: str = "b",
    num_partitions: int = 64,
    max_rounds: int = 64,
    driver_threshold: int = 1 << 21,
) -> "rd.Dataset":
    """Label every node appearing in ``pairs`` with the min node id of its
    connected component.

    Returns a Dataset with columns ``(node, label)`` — one row per
    distinct node, ``label`` = canonical (smallest) member id.  Nodes not
    present in any pair are their own singletons by definition and are
    NOT emitted (callers union them in if needed — avoids dragging the
    full corpus through the iteration).

    Edge lists at or under ``driver_threshold`` edges run the SAME
    hook+compress recurrence locally on the driver instead of through
    the distributed rounds: each distributed round costs 3 hash-join +
    2 coarse-min exchanges of fixed stage overhead, which dominates
    wall time when the pair graph is small (measured 12.9 s -> 0.2 s on
    a 10k-pair list at 32 cpus).  The gather is bounded by the
    threshold (2M edges = ~32 MB), NOT by corpus size — a near-dup edge
    list above it takes the distributed path unchanged, so the operator
    still scales to billion-edge graphs.
    """

    def to_edges(t: pa.Table) -> pa.Table:
        a = pa.compute.cast(t[a_col], pa.int64())
        b = pa.compute.cast(t[b_col], pa.int64())
        return pa.table({
            "src": pa.chunked_array([pa.concat_arrays([c.combine_chunks() for c in (a, b)])]),
            "dst": pa.chunked_array([pa.concat_arrays([c.combine_chunks() for c in (b, a)])]),
        })

    def _checkpoint(ds: "rd.Dataset") -> "rd.Dataset":
        """Materialize AND truncate the stats lineage.  Ray's stats
        summarizer recurses over the full operator ancestry; an
        iterative loop's chain (rounds × ~10 operators, on top of an
        arbitrarily deep upstream pipeline such as the fuzzy-pair
        derivation) exceeds the Python recursion limit at scale.
        Rebuilding from the materialized block refs keeps the data
        (zero copy) and drops the ancestry."""
        import ray.data as rd

        mat = ds.materialize()
        return rd.from_arrow_refs(mat.to_arrow_refs())

    edges = _checkpoint(pairs.map_batches(
        to_edges, batch_format="pyarrow", batch_size=65536
    ))

    # size the per-round exchanges to the EDGE LIST, not the caller's
    # corpus-shaped default: each round is 3 hash joins + 2 coarse mins,
    # and a near-dup edge list is typically orders of magnitude smaller
    # than the corpus, so 64-way joins are ~pure fixed task overhead
    # (measured 19.2 s -> ~8 s for customer_fuzzy_clusters at sf0.1).
    # count() on the materialized checkpoint is metadata-only.
    n_edges = edges.count()
    if n_edges <= driver_threshold:
        # bounded gather (threshold-sized, not corpus-sized): edges is
        # the doubled (src,dst)+(dst,src) list built above
        t = pa.concat_tables(
            [b for b in edges.iter_batches(batch_format="pyarrow")],
            promote_options="default") if n_edges else pa.table(
                {"src": pa.array([], type=pa.int64()),
                 "dst": pa.array([], type=pa.int64())})
        return rd.from_arrow(_cc_local(
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False)))
    num_partitions = int(min(num_partitions,
                             max(4, -(-n_edges // 131072))))

    def init_labels(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "label": t["src"]})

    # distinct nodes, label = self
    labels = _checkpoint(_coarse_min(
        edges.map_batches(init_labels, batch_format="pyarrow"),
        "node", "label", num_partitions,
    ))

    for _ in range(max_rounds):
        # hook: neighbor-min labels.  Join each directed edge's dst to its
        # current label, then min per src.
        nbr = hash_join(
            edges, labels, on="dst", right_on="node",
            num_partitions=num_partitions,
            left_schema=_EDG, right_schema=_LBL,
        )
        cand = _coarse_min(
            nbr.map_batches(
                lambda t: pa.table({"node": t["src"], "cand": t["label"]}),
                batch_format="pyarrow", batch_size=65536,
            ),
            "node", "cand", num_partitions,
        )
        merged = hash_join(
            labels, cand, on="node",
            num_partitions=num_partitions,
            left_schema=_LBL,
            right_schema=pa.schema([("node", pa.int64()), ("cand", pa.int64())]),
        )

        def hook(t: pa.Table) -> pa.Table:
            lab = t["label"].to_numpy(zero_copy_only=False)
            cnd = t["cand"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": t["node"],
                "label": pa.array(np.minimum(lab, cnd)),
                "old": t["label"],
            })

        hooked = merged.map_batches(hook, batch_format="pyarrow",
                                    batch_size=65536)
        # compress: label(v) <- label(label(v)) through the labels map
        h_schema = pa.schema([("node", pa.int64()), ("label", pa.int64()),
                              ("old", pa.int64())])
        comp = hash_join(
            hooked, labels.map_batches(
                lambda t: pa.table({"lnode": t["node"], "llabel": t["label"]}),
                batch_format="pyarrow", batch_size=65536,
            ),
            on="label", right_on="lnode",
            num_partitions=num_partitions,
            left_schema=h_schema,
            right_schema=pa.schema([("lnode", pa.int64()),
                                    ("llabel", pa.int64())]),
        )

        def shortcut(t: pa.Table) -> pa.Table:
            lab = t["label"].to_numpy(zero_copy_only=False)
            ll = t["llabel"].to_numpy(zero_copy_only=False)
            return pa.table({
                "node": t["node"],
                "label": pa.array(np.minimum(lab, ll)),
                "old": t["old"],
            })

        new_labels = _checkpoint(comp.map_batches(
            shortcut, batch_format="pyarrow", batch_size=65536
        ))
        changed = new_labels.filter(expr="label != old").count()
        labels = _checkpoint(new_labels.select_columns(["node", "label"]))
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: no convergence in {max_rounds} rounds"
    )
