"""Deterministic synthetic fixtures (FIXTURES.md F1-F4).

Plays the role of the reference's golden test inputs
(``python_etl/test_data/DE_0/`` — 2 hand-converted persons,
``python_etl/README.md:133-146``): tiny, seeded, fully reproducible.
No external data; everything derives from ``random.Random(seed)``.
"""

from __future__ import annotations

import hashlib
import random

import pyarrow as pa

from .schema import EVENTS_SCHEMA, REPOS_SCHEMA, SchemaChange

LANGS = ["py", "rs", "go", "js", "md", "txt", "unknown"]

#: F4 broadcast dimension (vocabulary analog).  ``unknown`` is absent on
#: purpose -> probes miss -> dead-letter (analog of unmapped_code_log,
#: ``CMS_SynPuf_ETL_CDM_v5.py:963-976``).
LANGMAP = {
    "py": (1, "scripting"),
    "rs": (2, "systems"),
    "go": (3, "systems"),
    "js": (4, "scripting"),
    "md": (5, "docs"),
    "txt": (6, "docs"),
}

_WORDS = (
    "def fn let mut return import struct impl class for while if else match "
    "async await pub static const var package func type interface map chan"
).split()


def _commit_hex(repo: str, seqno: int) -> str:
    return hashlib.sha256(f"{repo}:{seqno}".encode()).hexdigest()[:40]


def _content(rng: random.Random, min_words: int = 3, max_words: int = 120) -> str:
    n = rng.randint(min_words, max_words)
    return " ".join(rng.choice(_WORDS) for _ in range(n))


def make_repos(n_repos: int = 5, files_per_repo: int = 10, seed: int = 42,
               zipf_hot: bool = False) -> pa.Table:
    """F1 base snapshot.  With ``zipf_hot`` the first repo gets 10x files
    (skew/salting scenarios)."""
    rng = random.Random(seed)
    rows = {c: [] for c in REPOS_SCHEMA.names}
    for r in range(n_repos):
        repo = f"org{r % 3}/repo{r}"
        nf = files_per_repo * (10 if (zipf_hot and r == 0) else 1)
        for f in range(nf):
            lang = rng.choice(LANGS)
            rows["repo"].append(repo)
            rows["path"].append(f"src/d{f % 7}/f_{f}.{lang}")
            rows["commit"].append(_commit_hex(repo, f))
            rows["lang"].append(lang)
            rows["content"].append(_content(rng))
    return pa.table(rows, schema=REPOS_SCHEMA)


def snapshot_to_events(repos: pa.Table, epoch: int = 0) -> pa.Table:
    """Epoch-0 insert events for every row of the snapshot (the initial
    binlog backfill)."""
    n = repos.num_rows
    t = pa.table(
        {
            "repo": repos["repo"],
            "path": repos["path"],
            "op": pa.array(["insert"] * n),
            "commit": repos["commit"],
            "epoch": pa.array([epoch] * n, type=pa.int64()),
            "seq": pa.array(list(range(n)), type=pa.int64()),
            "lang": repos["lang"],
            "content": repos["content"],
        },
        schema=EVENTS_SCHEMA,
    )
    return t


def make_events(
    repos: pa.Table,
    n_epochs: int = 4,
    events_per_epoch: int = 50,
    seed: int = 43,
    scenario: str = "linear",
) -> pa.Table:
    """F2 change stream over the snapshot keys.

    Scenarios (FIXTURES.md): linear | dupkeys | hotkey | tombstone |
    outoforder | replay.  Epoch 0 is always the full snapshot backfill;
    epochs 1..n_epochs apply the scenario's edit script.
    """
    rng = random.Random(seed)
    keys = list(zip(repos["repo"].to_pylist(), repos["path"].to_pylist(),
                    repos["lang"].to_pylist()))
    parts = [snapshot_to_events(repos, epoch=0)]
    deleted: set = set()
    for ep in range(1, n_epochs + 1):
        rows = {c: [] for c in EVENTS_SCHEMA.names}
        seqno = 0

        def emit(repo, path, op, lang, content):
            nonlocal seqno
            rows["repo"].append(repo)
            rows["path"].append(path)
            rows["op"].append(op)
            rows["commit"].append(_commit_hex(repo, 10_000 * ep + seqno))
            rows["epoch"].append(ep)
            rows["seq"].append(seqno)
            rows["lang"].append(lang)
            rows["content"].append(content)
            seqno += 1

        for _ in range(events_per_epoch):
            if scenario == "hotkey" and rng.random() < 0.8:
                repo, path, lang = keys[rng.randrange(min(10, len(keys)))]
            else:
                repo, path, lang = rng.choice(keys)
            k = (repo, path)
            if scenario == "tombstone":
                roll = rng.random()
                if k in deleted and roll < 0.6:
                    emit(repo, path, "insert", lang, _content(rng))
                    deleted.discard(k)
                elif roll < 0.25:
                    emit(repo, path, "delete", lang, None)
                    deleted.add(k)
                else:
                    emit(repo, path, "update", lang, _content(rng))
                    deleted.discard(k)
            elif scenario == "dupkeys":
                c = _content(rng)
                emit(repo, path, "update", lang, c)
                if rng.random() < 0.5:  # distinct (epoch,seq), same payload
                    emit(repo, path, "update", lang, c)
            else:
                op = "delete" if rng.random() < 0.08 else "update"
                emit(repo, path, op, lang, None if op == "delete" else _content(rng))
        parts.append(pa.table(rows, schema=EVENTS_SCHEMA))

    t = pa.concat_tables(parts)
    if scenario == "outoforder":
        order = list(range(t.num_rows))
        random.Random(seed + 1).shuffle(order)
        t = t.take(pa.array(order))
    if scenario == "replay":  # at-least-once delivery: every epoch twice
        t = pa.concat_tables([t, t])
    return t


def make_schema_changes() -> list[SchemaChange]:
    """F3 evolution script, mirroring the CDM v5.0->v5.2 migration shape
    (column add with backfilled default + type widen)."""
    return [
        SchemaChange(epoch=2, change="add_column", column="stars", type_name="int64", default=0),
        SchemaChange(epoch=3, change="widen", column="size", type_name="int64"),
    ]


def langmap_table() -> pa.Table:
    return pa.table(
        {
            "lang": list(LANGMAP.keys()),
            "lang_id": pa.array([v[0] for v in LANGMAP.values()], type=pa.int64()),
            "family": [v[1] for v in LANGMAP.values()],
        }
    )
