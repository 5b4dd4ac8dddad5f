"""Canonical Arrow schemas and the versioned schema registry.

The reference encodes schemas as positional integer-constant classes
(``python_etl/constants.py:139-509``) and evolves them out-of-band via
versioned DDL migrations (CDM v5.0 -> v5.2,
``hand_conversion/V5.0_TO_V5.2_SCRIPT/synpuf_etl.sql``).  Here schemas are
first-class ``pyarrow.Schema`` objects and evolution (column add /
type-widen) is an ordered list of versioned schemas with promote-on-read
casts (SURVEY.md §1.4, §7.1).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

import pyarrow as pa

# ---------------------------------------------------------------------------
# Canonical schemas

#: The BASELINE.json input_hint table: one row per file at head.
REPOS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
    ]
)

#: The change-event stream (FIXTURES.md F2).  LWW order = (epoch, seq).
EVENTS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("op", pa.string()),  # insert | update | delete
        ("commit", pa.string()),
        ("epoch", pa.int64()),
        ("seq", pa.int64()),
        ("lang", pa.string()),
        ("content", pa.large_string()),  # null when op == 'delete'
    ]
)

OPS = ("insert", "update", "delete")

#: Lake schema v1: events minus op, plus derived columns.  ``size`` is
#: deliberately int32 so the type-widen evolution scenario has a target.
LAKE_SCHEMA_V1 = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("epoch", pa.int64()),
        ("seq", pa.int64()),
        ("lang", pa.string()),
        ("content", pa.large_string()),
        ("content_sha", pa.binary(32)),
        ("size", pa.int32()),
    ]
)

_WIDEN_OK = {
    (pa.int8(), pa.int16()),
    (pa.int8(), pa.int32()),
    (pa.int8(), pa.int64()),
    (pa.int16(), pa.int32()),
    (pa.int16(), pa.int64()),
    (pa.int32(), pa.int64()),
    (pa.float32(), pa.float64()),
    (pa.string(), pa.large_string()),
}


def is_widening(src: pa.DataType, dst: pa.DataType) -> bool:
    return src == dst or (src, dst) in _WIDEN_OK


# ---------------------------------------------------------------------------
# Versioned registry


@dataclass
class SchemaChange:
    """One evolution step (FIXTURES.md F3): takes effect at ``epoch``."""

    epoch: int
    change: str  # add_column | widen | drop_column | rename_column
    column: str
    # for add_column: arrow type name + backfill default; for widen: target type
    type_name: str = "int64"
    default: object = None
    # for rename_column: the new name (``column`` is the old one)
    new_name: str | None = None

    def to_json(self) -> dict:
        return {
            "epoch": self.epoch,
            "change": self.change,
            "column": self.column,
            "type_name": self.type_name,
            "default": self.default,
            "new_name": self.new_name,
        }

    @staticmethod
    def from_json(d: dict) -> "SchemaChange":
        return SchemaChange(
            epoch=int(d["epoch"]),
            change=d["change"],
            column=d["column"],
            type_name=d.get("type_name", "int64"),
            default=d.get("default"),
            new_name=d.get("new_name"),
        )


_TYPES = {
    "int8": pa.int8(),
    "int16": pa.int16(),
    "int32": pa.int32(),
    "int64": pa.int64(),
    "float32": pa.float32(),
    "float64": pa.float64(),
    "string": pa.string(),
    "large_string": pa.large_string(),
}


def type_from_name(name: str) -> pa.DataType:
    return _TYPES[name]


@dataclass
class SchemaRegistry:
    """Ordered versioned schemas; version N = base + changes[:N].

    Version 0 is always ``LAKE_SCHEMA_V1``.  ``version_at(epoch)`` gives the
    schema in force for events of that epoch; promote-on-read is
    ``evolve_table(t, to_version)`` (the analog of the reference's
    backfilled-default column adds in
    ``hand_conversion/V5.0_TO_V5.2_SCRIPT/insert_visit_occurrence.sql:20-45``).
    """

    base: pa.Schema = LAKE_SCHEMA_V1
    changes: list = field(default_factory=list)  # list[SchemaChange], epoch-sorted

    def __post_init__(self) -> None:
        self.changes = sorted(self.changes, key=lambda c: (c.epoch, c.column))

    @property
    def latest_version(self) -> int:
        return len(self.changes)

    #: engine-invariant columns: keys, LWW order, and derived invariants
    #: can never be dropped (placement, fencing and the audit depend on
    #: them) — only evolved/payload columns are droppable
    PROTECTED = ("repo", "path", "epoch", "seq", "content", "content_sha", "size")

    def schema_for(self, version: int) -> pa.Schema:
        sch = self.base
        retired: set = set()  # names consumed by renames — see below
        dropped: set = set()  # names ever soft-dropped — see drop_column
        for ch in self.changes[:version]:
            if ch.change == "add_column":
                if ch.column in retired:
                    # a renamed-away name is RETIRED permanently: old data
                    # files still physically carry it holding the
                    # pre-rename column's data, so re-adding it would make
                    # promote-on-read surface stale values under the new
                    # column.  Pick a fresh name instead.
                    raise ValueError(
                        f"column name {ch.column!r} was retired by a "
                        "rename (old files still carry it physically); "
                        "re-adding it would alias pre-rename data — use "
                        "a new name")
                if ch.column in dropped:
                    # same hazard as retired names: a soft drop leaves the
                    # column physically present in older files, and
                    # promote-on-read prefers a physically-present name —
                    # re-adding would surface pre-drop data instead of the
                    # backfill default.
                    raise ValueError(
                        f"column name {ch.column!r} was previously dropped "
                        "(old files still carry it physically); re-adding "
                        "it would surface pre-drop data — use a new name")
                sch = sch.append(pa.field(ch.column, type_from_name(ch.type_name)))
            elif ch.change == "widen":
                i = sch.get_field_index(ch.column)
                src = sch.field(i).type
                dst = type_from_name(ch.type_name)
                if not is_widening(src, dst):
                    raise ValueError(f"non-widening change {src} -> {dst} for {ch.column}")
                sch = sch.set(i, pa.field(ch.column, dst))
            elif ch.change == "drop_column":
                # soft drop: data files written at older versions keep the
                # column; promote-on-read simply stops selecting it, and
                # time travel at a pre-drop version still shows it
                if ch.column in self.PROTECTED:
                    raise ValueError(f"cannot drop engine column {ch.column!r}")
                i = sch.get_field_index(ch.column)
                if i < 0:
                    raise ValueError(f"drop of unknown column {ch.column!r}")
                sch = sch.remove(i)
                dropped.add(ch.column)
            elif ch.change == "rename_column":
                # metadata-plane rename (the Iceberg model): data files
                # written earlier keep the OLD physical name; reads map it
                # via the alias history, and the next CoW rewrite /
                # compaction of a partition makes the new name physical
                if ch.column in self.PROTECTED:
                    raise ValueError(
                        f"cannot rename engine column {ch.column!r}")
                if not ch.new_name:
                    raise ValueError("rename_column requires new_name")
                if ch.new_name in sch.names:
                    raise ValueError(
                        f"rename target {ch.new_name!r} already exists")
                if ch.new_name in retired:
                    raise ValueError(
                        f"rename target {ch.new_name!r} was retired by an "
                        "earlier rename (old files still carry it "
                        "physically) — use a new name")
                if ch.new_name in dropped:
                    # drop d then rename c->d would make evolve_table's
                    # physically-present-name preference surface the stale
                    # dropped d data from old files instead of following
                    # the alias chain back to c.
                    raise ValueError(
                        f"rename target {ch.new_name!r} was previously "
                        "dropped (old files still carry it physically) — "
                        "use a new name")
                i = sch.get_field_index(ch.column)
                if i < 0:
                    raise ValueError(f"rename of unknown column {ch.column!r}")
                sch = sch.set(i, pa.field(ch.new_name, sch.field(i).type))
                retired.add(ch.column)
            else:
                raise ValueError(f"unknown change kind {ch.change!r}")
        return sch

    def version_at(self, epoch: int) -> int:
        v = 0
        for i, ch in enumerate(self.changes):
            if ch.epoch <= epoch:
                v = i + 1
        return v

    def defaults_for(self, version: int) -> dict:
        """Backfill defaults for columns added (and not later dropped)
        up to ``version``; the default follows a rename."""
        out = {}
        for ch in self.changes[:version]:
            if ch.change == "add_column":
                out[ch.column] = ch.default
            elif ch.change == "drop_column":
                out.pop(ch.column, None)
            elif ch.change == "rename_column" and ch.column in out:
                out[ch.new_name] = out.pop(ch.column)
        return out

    def alias_history(self, version: int | None = None) -> dict:
        """{current-name: [older names, newest first]} for every column
        renamed at least once up to ``version`` (default latest) —
        promote-on-read tries these in order when the current name is
        absent from an old data file."""
        if version is None:
            version = self.latest_version
        hist: dict = {}
        for ch in self.changes[:version]:
            if ch.change == "rename_column":
                hist[ch.new_name] = [ch.column] + hist.pop(ch.column, [])
            elif ch.change == "drop_column":
                hist.pop(ch.column, None)
        return hist

    def physical_names(self, version: int,
                       at_version: int | None = None) -> dict:
        """{name at ``at_version`` (default latest): name under which
        that column exists in a data file written at ``version``, or
        None when it did not exist yet} — the per-file column mapping a
        pruned read over a mixed-schema lake needs."""
        if at_version is None:
            at_version = self.latest_version
        mapping = {n: n for n in self.schema_for(version).names}
        for ch in self.changes[version:at_version]:
            if ch.change == "add_column":
                mapping[ch.column] = None
            elif ch.change == "drop_column":
                mapping.pop(ch.column, None)
            elif ch.change == "rename_column" and ch.column in mapping:
                mapping[ch.new_name] = mapping.pop(ch.column)
        return mapping

    def evolve_table(self, t: pa.Table, to_version: int) -> pa.Table:
        """Promote-on-read: add missing columns (backfill default) + widen
        casts.  Output has exactly the target schema's columns, in order;
        columns outside the target schema are dropped."""
        import pyarrow.compute as pc

        target = self.schema_for(to_version)
        defaults = self.defaults_for(to_version)
        aliases = self.alias_history(to_version)
        cols, names = [], []
        for f0 in target:
            names.append(f0.name)
            dv = defaults.get(f0.name)
            src = f0.name
            if src not in t.column_names:
                # renamed column: an old file carries a historical name
                src = next((a for a in aliases.get(f0.name, ())
                            if a in t.column_names), f0.name)
            if src in t.column_names:
                col = t.column(src)
                if col.type != f0.type:
                    col = col.cast(f0.type)
                # an evolved column that is present but null means "not
                # supplied" -> registered backfill default (matches the
                # reference's backfilled DDL defaults)
                if dv is not None and col.null_count > 0:
                    col = pc.fill_null(col, pa.scalar(dv, type=f0.type))
                cols.append(col)
            else:
                cols.append(pa.array([dv] * t.num_rows, type=f0.type))
        return pa.table(cols, names=names)

    def to_json(self) -> str:
        return json.dumps({"changes": [c.to_json() for c in self.changes]}, indent=1)

    @staticmethod
    def from_json(s: str) -> "SchemaRegistry":
        d = json.loads(s)
        return SchemaRegistry(changes=[SchemaChange.from_json(c) for c in d.get("changes", [])])
