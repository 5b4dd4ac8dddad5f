"""Time travel and changelog reads over the lake's manifest history.

Every commit writes an immutable, content-addressed manifest version and
never deletes data files, so any historical snapshot stays readable
(``LakeStore.load_manifest(version=...)``) — the same property Delta /
Iceberg time travel relies on.  This module turns that into two
first-class operators:

- ``read_snapshot``: the lake AS OF a manifest version, as a streaming
  Dataset (one merge task per partition — CoW bases and MOR deltas both
  work, since deltas are listed in the manifest).
- ``snapshot_diff``: the CHANGELOG between two versions keyed by
  (repo, path) — insert / update / delete rows.  Partitions whose
  manifest ``content_hash`` is identical in both versions are skipped
  without reading a byte, so the diff costs O(changed data), not O(lake)
  — the property that makes incremental downstream consumption viable at
  10^10-row scale.

Reference analog: the reference's expected-output CSV comparison harness
(``python_etl`` test strategy, SURVEY.md §5) diffs full table dumps; this
engine diffs manifests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..schema import SchemaRegistry
from ..state.manifest import LakeStore


def read_snapshot(
    lake_root: str, version: int | None = None, columns: list[str] | None = None
) -> "ray.data.Dataset":
    """Lake state AS OF manifest ``version`` (default: current).

    Schema: rows are promoted to the NEWEST schema version any partition
    of that snapshot had committed — the snapshot's own schema, not
    today's (a later ``add_column`` does not retroactively appear in a
    historical read).
    """
    store = LakeStore(lake_root)
    manifest = store.load_manifest(version=version)
    registry = store.load_registry()
    snap_v = max(
        (ps.schema_version for ps in manifest.partitions.values()
         if ps.file or ps.deltas),
        default=registry.latest_version,
    )
    parts = [
        {"file": ps.file, "deltas": list(ps.deltas)}
        for ps in manifest.partitions.values()
        if ps.file or ps.deltas
    ]
    schema = registry.schema_for(snap_v)
    if columns:
        schema = pa.schema([schema.field(c) for c in columns])
    if not parts:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], type=f.type) for f in schema})
        )
    reg_json = registry.to_json()

    def load_part(batch: pa.Table, cols=tuple(columns) if columns else None):
        from .ingest import load_partition_live

        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_ in zip(batch["file"].to_pylist(), batch["deltas"].to_pylist()):
            t = load_partition_live(lake_root, f0, list(ds_ or []), reg, snap_v)
            out.append(t.select(list(cols)) if cols else t)
        return pa.concat_tables(out)

    return ray.data.from_items(parts).map_batches(
        load_part, batch_format="pyarrow", batch_size=1
    )


def snapshot_diff(
    lake_root: str,
    from_version: int,
    to_version: int | None = None,
    keys: tuple = ("repo", "path"),
) -> "ray.data.Dataset":
    """Changelog between two manifest versions, keyed by ``keys``.

    Output: key columns + ``change`` ('insert' | 'update' | 'delete') +
    ``content_sha`` (the new row's, null on delete) + ``old_content_sha``
    (null on insert).  A row is an update only when content_sha actually
    changed — rewriting identical content is not a change.

    Cost: one task per partition whose manifest ``content_hash`` differs
    between the versions; unchanged partitions are skipped unread.
    """
    store = LakeStore(lake_root)
    m_old = store.load_manifest(version=from_version)
    m_new = store.load_manifest(version=to_version)
    registry = store.load_registry()
    target_v = registry.latest_version
    reg_json = registry.to_json()

    changed = []
    for pid in sorted(set(m_old.partitions) | set(m_new.partitions)):
        po = m_old.partitions.get(pid)
        pn = m_new.partitions.get(pid)
        ho = po.content_hash if po else ""
        hn = pn.content_hash if pn else ""
        if ho == hn and not (po and po.deltas) and not (pn and pn.deltas):
            continue  # bit-identical partition state: no reads, no rows
        if (po and pn and po.file == pn.file
                and list(po.deltas) == list(pn.deltas)):
            # MOR partition with identical base + delta file lists: files
            # are content-addressed (CLAUDE.md rule 7), so identical names
            # mean identical live state — skip without reading (keeps the
            # diff O(changed data) on delta-heavy lakes too)
            continue
        changed.append(
            {
                "old_file": po.file if po else None,
                "old_deltas": list(po.deltas) if po else [],
                "new_file": pn.file if pn else None,
                "new_deltas": list(pn.deltas) if pn else [],
            }
        )
    key_cols = list(keys)
    out_schema = pa.schema(
        [(k, pa.string()) for k in key_cols]
        + [("change", pa.string()), ("content_sha", pa.binary()),
           ("old_content_sha", pa.binary())]
    )
    if not changed:
        return ray.data.from_arrow(
            pa.table({f.name: pa.array([], type=f.type) for f in out_schema})
        )

    def diff_part(batch: pa.Table) -> pa.Table:
        from .ingest import load_partition_live

        reg = SchemaRegistry.from_json(reg_json)
        frames = []
        for i in range(batch.num_rows):
            row = {c: batch[c][i].as_py() for c in batch.column_names}
            old = load_partition_live(
                lake_root, row["old_file"], list(row["old_deltas"] or []),
                reg, target_v,
            )
            new = load_partition_live(
                lake_root, row["new_file"], list(row["new_deltas"] or []),
                reg, target_v,
            )
            od = old.select(key_cols + ["content_sha"]).to_pandas().rename(
                columns={"content_sha": "old_content_sha"}
            )
            nd = new.select(key_cols + ["content_sha"]).to_pandas()
            m = nd.merge(od, on=key_cols, how="outer", indicator=True)
            change = np.where(
                m["_merge"] == "left_only", "insert",
                np.where(m["_merge"] == "right_only", "delete", "update"),
            )
            m = m.assign(change=change).drop(columns=["_merge"])
            m = m[(m["change"] != "update")
                  | (m["content_sha"] != m["old_content_sha"])]
            frames.append(m[key_cols + ["change", "content_sha", "old_content_sha"]])
        out = pd.concat(frames) if frames else pd.DataFrame()
        if out.empty:
            return pa.table({f.name: pa.array([], type=f.type) for f in out_schema})
        # explicit per-column conversion: outer-merge NaNs in string columns
        # must become nulls, not floats (from_pandas=True maps NaN -> null)
        return pa.table(
            {f.name: pa.array(out[f.name], type=f.type, from_pandas=True)
             for f in out_schema}
        )

    return ray.data.from_items(changed).map_batches(
        diff_part, batch_format="pyarrow", batch_size=1
    )
