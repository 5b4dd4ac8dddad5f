"""Distributed graph centrality over edge-list Datasets.

``pagerank`` is the host/entity-importance primitive of large-scale
training-data pipelines (Common-Crawl-style host PageRank is a standard
document-quality signal — the same role the reference's vocabulary
weights play for code mapping, computed from link structure instead of
a lookup CSV).

Exactness contract: the whole recurrence runs on an INTEGER mass grid —
``mass' [v] = T + Σ_{u→v} (mass[u] * d_num) // (d_den * outdeg[u])`` —
so every sum is order-independent int64 arithmetic and any engine
(this one, DuckDB, numpy) reproduces the result BIT-exactly; there is
no float dust to quantize away (CLAUDE.md rule 4 taken to its limit).
Dangling nodes (no out-edges) leak their mass by design — deterministic
and mirrored exactly by the SQL oracle; the bipartite-symmetric edge
derivation used by the catalog entry has none.

Scale shape: outdegrees and node ids reduce via per-batch partials into
coarse hash partitions (never a fine-grained groupby); the edge list is
joined with the rank vector once per iteration through
``stages/join.py hash_join`` (an O(E) exchange per iteration is
inherent to distributed PageRank — GraphX/Pregel pay the same); rank
vectors materialize between iterations (O(nodes) rows, the standard
iterative-dataflow checkpoint that keeps lazy re-execution from going
exponential).  Nothing ever gathers O(E) or O(V) onto the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from .join import hash_join

_COARSE = 64


def _coarse_sum(rows: "ray.data.Dataset", key: str, val: str,
                add_const: int = 0) -> "ray.data.Dataset":
    """Scale-safe Σ``val`` per ``key`` (+ ``add_const``): coarse hash
    partitions, one vectorized pandas sweep each (CLAUDE.md rule 3)."""
    def add_part(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        t = t.replace_schema_metadata(None)
        k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "fpart", pa.array((k % _COARSE).astype(np.int64)))

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        g = df.groupby(key, sort=False)[val].sum().reset_index()
        g[val] = g[val].astype(np.int64) + np.int64(add_const)
        return g

    return rows.map_batches(
        add_part, batch_format="pyarrow", batch_size=65536
    ).groupby("fpart").map_groups(per_part, batch_format="pandas")


def pagerank(
    edges: "ray.data.Dataset",
    iters: int = 4,
    total_mass: int = 10 ** 12,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    seed_nodes=None,
) -> "ray.data.Dataset":
    """Integer-grid PageRank over a directed edge list (int64 ``src``,
    ``dst`` columns; parallel edges count into outdegree and contribute
    independently — pre-dedup upstream if unwanted).

    Returns a Dataset of (``node`` int64, ``mass`` int64) covering every
    node that appears as a source or target.  ``total_mass`` plays the
    role of 1.0: initial mass is ``total_mass // N`` per node and the
    per-node teleport term is ``(m0 * (den-num)) // den``.

    ``seed_nodes`` (optional, small list/array of node ids) switches to
    PERSONALIZED PageRank: initial mass and the teleport term
    concentrate on the seed set (m0 = total_mass // len(seeds); zero
    elsewhere) — proximity-to-trusted-seeds instead of global
    importance (TrustRank).  The seed set ships inside the stage
    closures (personalization sets are small by design — hosts you
    trust, not the corpus); everything stays on the same int64 grid,
    so the unrolled SQL oracle stays bit-exact.  With ``seed_nodes``
    None the math reduces exactly to the uniform recurrence.
    """
    sch = pa.schema([(src, pa.int64()), (dst, pa.int64())])

    def norm(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        return pa.table({src: t[src].cast(pa.int64()),
                         dst: t[dst].cast(pa.int64())})

    # three consumers (outdegree, node set, the per-iteration join) —
    # materialize the normalized edge list ONCE or each consumer would
    # re-execute the whole upstream derivation (O(E) in the object
    # store; Ray spills if it outgrows memory)
    edges = edges.map_batches(norm, batch_format="pyarrow").materialize()

    # outdegree: per-batch count partial -> coarse sum
    def deg_partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        t = t.replace_schema_metadata(None)
        s = t[src].to_numpy(zero_copy_only=False)
        u, c = np.unique(s, return_counts=True)
        return pa.table({src: pa.array(u, type=pa.int64()),
                         "outdeg": pa.array(c.astype(np.int64))})

    outdeg = _coarse_sum(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        src, "outdeg")

    # node set: distinct src ∪ dst via per-batch unique -> coarse distinct
    def node_partial(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        t = t.replace_schema_metadata(None)
        u = np.unique(np.concatenate([
            t[src].to_numpy(zero_copy_only=False),
            t[dst].to_numpy(zero_copy_only=False)]))
        return pa.table({"node": pa.array(u, type=pa.int64())})

    def add_part(t: pa.Table) -> pa.Table:
        k = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.append_column(
            "fpart", pa.array((k % _COARSE).astype(np.int64)))

    def distinct_part(df: pd.DataFrame) -> pd.DataFrame:
        return df[["node"]].drop_duplicates()

    nodes = edges.map_batches(
        node_partial, batch_format="pyarrow"
    ).map_batches(add_part, batch_format="pyarrow", batch_size=65536
    ).groupby("fpart").map_groups(
        distinct_part, batch_format="pandas").materialize()

    n = nodes.count()
    if n == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], type=pa.int64()),
             "mass": pa.array([], type=pa.int64())}))
    seeds_arr = (None if seed_nodes is None
                 else np.unique(np.asarray(list(seed_nodes), dtype=np.int64)))
    m0 = total_mass // (n if seeds_arr is None else max(len(seeds_arr), 1))
    teleport = (m0 * (damping_den - damping_num)) // damping_den

    # edge list annotated with its source's outdegree, materialized ONCE
    # (the per-iteration join re-reads it; without the checkpoint every
    # iteration would re-execute the whole upstream derivation)
    edeg = hash_join(
        edges, outdeg, on=src,
        left_schema=sch,
        right_schema=pa.schema([(src, pa.int64()), ("outdeg", pa.int64())]),
    ).materialize()
    edeg_schema = pa.schema([(src, pa.int64()), (dst, pa.int64()),
                             ("outdeg", pa.int64())])

    rank_schema = pa.schema([("node", pa.int64()), ("mass", pa.int64())])

    def _node_amount(t: pa.Table, amount: int) -> pa.Table:
        nd = t["node"].cast(pa.int64())
        if seeds_arr is None:
            m = np.full(t.num_rows, amount, dtype=np.int64)
        else:
            isin = np.isin(nd.to_numpy(zero_copy_only=False), seeds_arr)
            m = np.where(isin, np.int64(amount), np.int64(0))
        return pa.table({"node": nd, "mass": pa.array(m)})

    def seed(t: pa.Table) -> pa.Table:
        return _node_amount(t, m0)

    ranks = nodes.map_batches(seed, batch_format="pyarrow").materialize()

    def contrib(t: pa.Table, _num=damping_num, _den=damping_den) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        mass = t["mass"].to_numpy(zero_copy_only=False).astype(np.int64)
        deg = t["outdeg"].to_numpy(zero_copy_only=False).astype(np.int64)
        c = (mass * np.int64(_num)) // (np.int64(_den) * deg)
        return pa.table({"node": t[dst].cast(pa.int64()),
                         "mass": pa.array(c)})

    def zero(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"].cast(pa.int64()),
            "mass": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        })

    def tele_rows(t: pa.Table) -> pa.Table:
        return _node_amount(t, teleport)

    for _ in range(iters):
        scattered = hash_join(
            edeg, ranks, on=src, right_on="node",
            left_schema=edeg_schema, right_schema=rank_schema,
        ).map_batches(contrib, batch_format="pyarrow")
        if seeds_arr is None:
            # union the zero-seeded node set so isolated-in-edge nodes
            # keep a row (teleport only) without a left join
            seeded = scattered.union(
                nodes.map_batches(zero, batch_format="pyarrow"))
            ranks = _coarse_sum(seeded, "node", "mass",
                                add_const=teleport).materialize()
        else:
            # per-node teleport rows (seeds only) double as the
            # every-node-has-a-row cover; integer addition makes this
            # exactly the add_const path when every node is a seed
            seeded = scattered.union(
                nodes.map_batches(tele_rows, batch_format="pyarrow"))
            ranks = _coarse_sum(seeded, "node", "mass").materialize()
    return ranks


def bfs_hops(
    edges: "ray.data.Dataset",
    seeds: "ray.data.Dataset",
    max_hops: int = 4,
    src: str = "src",
    dst: str = "dst",
) -> "ray.data.Dataset":
    """Multi-source BFS hop distance over a directed edge list — the
    reachability/proximity primitive next to ``pagerank`` (crawl-depth
    from trusted seed hosts is a standard corpus-quality signal).

    Returns (``node`` int64, ``hops`` int64) for every node reachable
    from the seed set within ``max_hops`` edges (seeds themselves at
    hops 0; unreachable nodes absent).  Pure integer arithmetic — any
    engine reproduces the relation exactly (the oracle is a recursive
    CTE over the same edges).

    Scale shape (the Pregel frontier pattern, same costs as pagerank):
    per level ONE hash_join of the edge list against the CURRENT
    frontier (O(edges incident to the frontier) exchange, per-batch
    dedup shrinks the scatter) and one coarse-partition min-reduce;
    the distance vector (O(reached nodes)) materializes between levels
    so lazy re-execution can't go exponential, and the loop exits early
    once a level discovers nothing.  Nothing gathers O(V) or O(E) onto
    the driver."""
    from ..functions.threads import single_threaded_kernels

    sch = pa.schema([(src, pa.int64()), (dst, pa.int64())])

    def norm(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        return pa.table({src: t[src].cast(pa.int64()),
                         dst: t[dst].cast(pa.int64())})

    edges = edges.map_batches(norm, batch_format="pyarrow").materialize()

    def seed(t: pa.Table) -> pa.Table:
        single_threaded_kernels()
        return pa.table({
            "node": t["node"].cast(pa.int64()),
            "hops": pa.array(np.zeros(t.num_rows, dtype=np.int64)),
        })

    dist = seeds.map_batches(seed, batch_format="pyarrow").materialize()
    frontier = dist
    dist_schema = pa.schema([("node", pa.int64()), ("hops", pa.int64())])

    def coarse_min(rows: "ray.data.Dataset") -> "ray.data.Dataset":
        def add_part(t: pa.Table) -> pa.Table:
            single_threaded_kernels()
            t = t.replace_schema_metadata(None)
            k = t["node"].to_numpy(zero_copy_only=False).astype(np.int64)
            return t.append_column(
                "fpart", pa.array((k % _COARSE).astype(np.int64)))

        def per_part(df: pd.DataFrame) -> pa.Table:
            single_threaded_kernels()
            g = df.groupby("node", sort=False)["hops"].min().reset_index()
            # arrow out: the next level unions this with arrow scatter
            # blocks, and mixed block types break the shuffle builder
            return pa.table({
                "node": pa.array(g["node"].to_numpy(dtype=np.int64)),
                "hops": pa.array(g["hops"].to_numpy(dtype=np.int64)),
            })

        return rows.map_batches(
            add_part, batch_format="pyarrow", batch_size=65536
        ).groupby("fpart").map_groups(per_part, batch_format="pandas")

    for k in range(1, max_hops + 1):
        def scatter(t: pa.Table, _k=k) -> pa.Table:
            single_threaded_kernels()
            t = t.replace_schema_metadata(None)
            u = np.unique(t[dst].to_numpy(zero_copy_only=False)
                          .astype(np.int64))
            return pa.table({
                "node": pa.array(u),
                "hops": pa.array(np.full(len(u), _k, dtype=np.int64)),
            })

        reached = hash_join(
            edges, frontier, on=src, right_on="node",
            left_schema=sch, right_schema=dist_schema,
        ).map_batches(scatter, batch_format="pyarrow")
        dist = coarse_min(dist.union(reached)).materialize()
        if k == max_hops:
            break  # no further level reads the frontier

        def only_level(t: pa.Table, _k=k) -> pa.Table:
            single_threaded_kernels()
            h = t["hops"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(h == _k))

        # materialize: the emptiness check AND the next level's join
        # both consume this filter — lazy, it would execute twice
        frontier = dist.map_batches(
            only_level, batch_format="pyarrow").materialize()
        if frontier.count() == 0:
            break
    return dist
