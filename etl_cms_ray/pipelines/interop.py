"""Open-table-format interop: serve a lake snapshot to EXTERNAL engines.

``export_duckdb_view`` compiles a manifest version into one standalone
SQL statement any DuckDB (or DuckDB-dialect) session can run directly
against the lake's parquet files — no engine import, no Ray: the
manifest's file list, the schema registry's promote-on-read rules
(backfill defaults, type widening) and the merge-on-read LWW +
tombstone fold are all expressed IN the generated SQL.  This is the
Iceberg/Delta "external engines read the table format" contract — the
snapshot a warehouse analyst queries is byte-for-byte the one the
engine serves (pinned by test against ``read_snapshot``), and stays
frozen because data files are immutable + content-addressed.

Scale note: the statement enumerates live files explicitly (the
manifest IS the source of truth — a ``data/**`` glob would read
orphans and superseded files), so regenerate after each commit; cost is
O(live files) string building on the driver, zero data reads.

Reference analog: ETL-CMS's final state is only consumable by loading
its CSVs into PostgreSQL (``SQL/load_CDMv5*.sql``); here the lake is
directly queryable in place.
"""

from __future__ import annotations

import os

import pyarrow as pa

from ..state.manifest import LakeStore

_DUCK_TYPES: list[tuple] = [
    (pa.types.is_large_string, "VARCHAR"),
    (pa.types.is_string, "VARCHAR"),
    (pa.types.is_int64, "BIGINT"),
    (pa.types.is_int32, "INTEGER"),
    (pa.types.is_int16, "SMALLINT"),
    (pa.types.is_int8, "TINYINT"),
    (pa.types.is_float64, "DOUBLE"),
    (pa.types.is_float32, "REAL"),
    (pa.types.is_boolean, "BOOLEAN"),
    (pa.types.is_large_binary, "BLOB"),
    (pa.types.is_binary, "BLOB"),
    (pa.types.is_fixed_size_binary, "BLOB"),
]


def _duck_type(t: pa.DataType) -> str:
    for pred, name in _DUCK_TYPES:
        if pred(t):
            return name
    raise TypeError(f"no DuckDB type mapping for arrow type {t}")


def _lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return repr(v)
    return "'" + str(v).replace("'", "''") + "'"


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def export_duckdb_view(lake_root: str, version: "int | str | None" = None,
                       table_name: str = "lake") -> str:
    """One ``CREATE OR REPLACE VIEW`` statement serving the snapshot.

    Mirrors ``read_snapshot`` exactly: the snapshot's own schema version
    (max committed by any non-empty partition — a later add_column does
    not retroactively appear), promote-on-read backfill defaults as
    ``COALESCE``, type widening via ``union_by_name`` + final casts, and
    for merge-on-read chains the LWW fold (max ``(epoch, seq)`` per key,
    winning delete drops the key) as one window pass."""
    store = LakeStore(lake_root)
    if version is not None:
        version = store.resolve_ref(version)
    m = store.load_manifest(version=version)
    registry = store.load_registry()
    snap_v = max(
        (ps.schema_version for ps in m.partitions.values()
         if ps.file or ps.deltas),
        default=registry.latest_version,
    )
    schema = registry.schema_for(snap_v)
    defaults = registry.defaults_for(snap_v)
    aliases = registry.alias_history(snap_v)

    bases = sorted(os.path.join(lake_root, ps.file)
                   for ps in m.partitions.values() if ps.file)
    deltas = sorted(os.path.join(lake_root, d)
                    for ps in m.partitions.values() for d in ps.deltas)

    def _names_in(files: list[str]):
        """Physical column names present across a file group — needed
        only when the registry has renames (files written pre-rename
        carry the OLD name; union_by_name surfaces both and the view
        must COALESCE through them, but referencing a name absent from
        EVERY file is a binder error).  One parquet FOOTER read per
        file; the rename-free fast path skips even that."""
        if not aliases:
            return None
        import pyarrow.parquet as pq

        s: set = set()
        for f in files:
            s |= set(pq.read_schema(f).names)
        return s

    def proj(prefix: str = "", avail: "set | None" = None) -> str:
        cols = []
        for f in schema:
            cands = [f.name] + list(aliases.get(f.name, ()))
            present = [c for c in cands if avail is None or c in avail] \
                or [f.name]
            exprs = [f'{prefix}"{c}"' for c in present]
            expr = exprs[0] if len(exprs) == 1 \
                else f"COALESCE({', '.join(exprs)})"
            dv = defaults.get(f.name)
            if dv is not None:
                expr = f"COALESCE({expr}, {_lit(dv)})"
            cols.append(f'CAST({expr} AS {_duck_type(f.type)}) AS "{f.name}"')
        return ",\n       ".join(cols)

    if not bases and not deltas:
        empty = ", ".join(
            f'CAST(NULL AS {_duck_type(f.type)}) AS "{f.name}"'
            for f in schema)
        return (f"CREATE OR REPLACE VIEW {table_name} AS "
                f"SELECT {empty} WHERE FALSE")

    def rp(files: list[str]) -> str:
        lst = ", ".join(_sql_str(f) for f in files)
        return f"read_parquet([{lst}], union_by_name=true)"

    if not deltas:
        return (f"CREATE OR REPLACE VIEW {table_name} AS\n"
                f"SELECT {proj(avail=_names_in(bases))}\nFROM {rp(bases)}")

    # merge-on-read: base rows rank as op='insert'; the newest
    # (epoch, seq) per (repo, path) wins; a winning delete drops the key
    parts = []
    if bases:
        parts.append(
            f"SELECT {proj(avail=_names_in(bases))}, 'insert' AS _op,\n"
            f'       "epoch" AS _e, "seq" AS _s\nFROM {rp(bases)}')
    parts.append(
        f"SELECT {proj(avail=_names_in(deltas))}, \"op\" AS _op,\n"
        f'       "epoch" AS _e, "seq" AS _s\nFROM {rp(deltas)}')
    union = "\nUNION ALL\n".join(parts)
    out_cols = ", ".join(f'"{f.name}"' for f in schema)
    return (
        f"CREATE OR REPLACE VIEW {table_name} AS\n"
        f"WITH _all AS (\n{union}\n),\n"
        f"_ranked AS (\n"
        f"  SELECT *, row_number() OVER (\n"
        f'    PARTITION BY "repo", "path" ORDER BY _e DESC, _s DESC\n'
        f"  ) AS _rn FROM _all\n"
        f")\n"
        f"SELECT {out_cols} FROM _ranked WHERE _rn = 1 AND _op <> 'delete'"
    )
