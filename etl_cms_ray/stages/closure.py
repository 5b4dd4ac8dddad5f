"""Hierarchy closure flatten: descendant -> root broadcast map.

Reference analog: the drug -> ingredient rollup through
``concept_ancestor`` (``SQL/create_CDMv5_drug_era_non_stockpile.sql:37-43``)
— facts are joined to a PRE-FLATTENED closure of a small hierarchy, never
to the recursive structure itself.  Here the flatten is an explicit
operator: O(log depth) vectorized pandas self-joins (pointer doubling)
collapse child->parent edges into node->root, and the resulting map is
the broadcast side of an ordinary dim join (stages/dimjoin.py pattern).

Partitioning assumption (documented per SURVEY.md §2 custom-operator
rule): the hierarchy is dimension-sized (vocabulary-scale, fits one
worker's memory as a 2-column frame) while the fact stream is unbounded.
That matches concept_ancestor (~10^7 rows max) vs the claims stream.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def closure_roots(
    edges: pa.Table, child_col: str = "child", parent_col: str = "parent"
) -> pd.DataFrame:
    """Flatten child->parent edges into (node, root, depth).

    Every node that appears in the hierarchy maps to its ultimate root
    (a node with no outgoing edge); roots map to themselves at depth 0.
    Pointer doubling: each iteration follows two hops at once, so a chain
    of depth d resolves in ceil(log2 d) + 1 self-merges, each a single
    vectorized pandas join — no per-node recursion.

    Raises on cycles (a cycle never resolves to a root and would loop).
    """
    e = pd.DataFrame(
        {
            "node": edges[child_col].to_pandas(),
            "anc": edges[parent_col].to_pandas(),
        }
    )
    if e["node"].duplicated().any():
        raise ValueError("closure_roots: multiple parents per child")
    all_nodes = pd.unique(pd.concat([e["node"], e["anc"]], ignore_index=True))
    # current pointer: node -> its highest known ancestor; depth = hops so far
    cur = pd.DataFrame({"node": all_nodes})
    cur = cur.merge(e, on="node", how="left")
    cur["depth"] = cur["anc"].notna().astype("int64")
    cur["anc"] = cur["anc"].where(cur["anc"].notna(), cur["node"])
    max_iters = 64  # 2^64 depth bound; cycles exhaust this and raise
    for _ in range(max_iters):
        step = cur.merge(
            cur[["node", "anc", "depth"]].rename(
                columns={"node": "anc", "anc": "anc2", "depth": "d2"}
            ),
            on="anc",
            how="left",
        )
        moved = step["anc2"].notna() & (step["anc2"] != step["anc"])
        if not bool(moved.any()):
            break
        step.loc[moved, "depth"] = step.loc[moved, "depth"] + step.loc[moved, "d2"]
        step.loc[moved, "anc"] = step.loc[moved, "anc2"]
        cur = step[["node", "anc", "depth"]]
    out = cur.rename(columns={"anc": "root"}).reset_index(drop=True)
    # a true root has no outgoing edge; a cycle "converges" onto one of its
    # own members, which still has a parent — reject that explicitly
    if bool(out["root"].isin(set(e["node"])).any()):
        raise ValueError("closure_roots: cycle detected (resolved root has a parent)")
    out["depth"] = out["depth"].astype("int64")
    return out[["node", "root", "depth"]]
