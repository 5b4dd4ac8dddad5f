"""Single-process reference replayer — the correctness oracle.

Mirrors the reference's per-key forward loop
(``python_etl/CMS_SynPuf_ETL_CDM_v5.py:2057-2087``: one pass, key at a
time, dict state) and its golden-output comparison methodology
(SURVEY.md §5).  Pure Python dicts, no Ray: deliberately slow and simple
so the distributed engine can be judged against it by per-row
``sha256(content)`` equality.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

from .fixtures import LANGMAP
from .schema import SchemaRegistry


def replay(
    events: pa.Table,
    registry: SchemaRegistry | None = None,
    through_epoch: int | None = None,
) -> pa.Table:
    """Apply the change stream one event at a time; return final lake state.

    LWW on max (epoch, seq) per (repo, path); exact-duplicate deliveries
    (same epoch, seq) are idempotent; delete removes the key.  Events with
    epoch > ``through_epoch`` are ignored (checkpoint semantics).  Output
    is the evolved lake schema sorted by (repo, path).
    """
    registry = registry or SchemaRegistry()
    cols = events.to_pydict()
    n = events.num_rows
    order = sorted(range(n), key=lambda i: (cols["epoch"][i], cols["seq"][i]))

    state: dict[tuple, dict] = {}
    applied: dict[tuple, tuple] = {}  # key -> (epoch, seq) last applied
    max_epoch = -1
    for i in order:
        ep, sq = cols["epoch"][i], cols["seq"][i]
        if through_epoch is not None and ep > through_epoch:
            continue
        key = (cols["repo"][i], cols["path"][i])
        if key in applied and applied[key] >= (ep, sq):
            continue  # replayed / out-of-order older event: LWW ignores
        applied[key] = (ep, sq)
        max_epoch = max(max_epoch, ep)
        if cols["op"][i] == "delete":
            state.pop(key, None)
            continue
        content = cols["content"][i]
        row = {
            "repo": key[0],
            "path": key[1],
            "commit": cols["commit"][i],
            "epoch": ep,
            "seq": sq,
            "lang": cols["lang"][i],
            "content": content,
            "content_sha": hashlib.sha256(content.encode()).digest(),
            "size": len(content.encode()),
        }
        for col in registry.defaults_for(registry.latest_version):
            # events may carry actual values for evolved columns — under
            # the name in force at THEIR epoch, so read through the alias
            # history (first non-null candidate wins, newest name first)
            for cand in (col, *registry.alias_history().get(col, ())):
                if cand in cols and cols[cand][i] is not None:
                    row[col] = cols[cand][i]
                    break
        state[key] = row

    version = registry.version_at(max_epoch) if max_epoch >= 0 else 0
    schema = registry.schema_for(version)
    defaults = registry.defaults_for(version)
    aliases = registry.alias_history(version)
    rows = [state[k] for k in sorted(state)]

    def val(r: dict, name: str):
        # rows are keyed by the names in force when the event applied;
        # a renamed column reads through its alias history
        for cand in (name, *aliases.get(name, ())):
            if r.get(cand) is not None:
                return r[cand]
        return defaults.get(name)  # whole-column backfill at evolution

    out = {f.name: [val(r, f.name) for r in rows] for f in schema}
    return pa.table(out, schema=schema)


def replay_dead_letter(events: pa.Table) -> pa.Table:
    """Events whose lang has no LANGMAP entry (unmapped-code-log analog)."""
    mask = [lang not in LANGMAP for lang in events["lang"].to_pylist()]
    return events.filter(pa.array(mask))


def replay_repo_stats(events: pa.Table) -> pa.Table:
    """Per-repo grouped stats (observation_period min/max analog,
    ``CMS_SynPuf_ETL_CDM_v5.py:844-860`` + record counters ``:2104-2113``)."""
    agg: dict[str, list] = {}
    for i in range(events.num_rows):
        r = events["repo"][i].as_py()
        ep = events["epoch"][i].as_py()
        a = agg.setdefault(r, [0, ep, ep])
        a[0] += 1
        a[1] = min(a[1], ep)
        a[2] = max(a[2], ep)
    repos = sorted(agg)
    return pa.table(
        {
            "repo": repos,
            "n_events": pa.array([agg[r][0] for r in repos], type=pa.int64()),
            "min_epoch": pa.array([agg[r][1] for r in repos], type=pa.int64()),
            "max_epoch": pa.array([agg[r][2] for r in repos], type=pa.int64()),
        }
    )


def tables_equal_by_sha(a: pa.Table, b: pa.Table, keys=("repo", "path")) -> bool:
    """Golden comparison: sort both by key, compare per-row content_sha and
    full row equality (the reference's expected-CSV diff, README.md:133-146)."""
    from .functions.hashing import canonical_table_hash

    if a.num_rows != b.num_rows:
        return False
    if sorted(a.column_names) != sorted(b.column_names):
        return False
    # null-safe exact comparison via the canonical content hash
    b = pa.table(
        {c: b.column(c).cast(a.column(c).type) for c in a.column_names}
    )
    return canonical_table_hash(a, list(keys)) == canonical_table_hash(b, list(keys))
