"""Event-stream sources.

Reference analogs (SURVEY.md §2.1): the year-union reader S2 (multiple
files unioned with a provenance column), the A+B union S3, CSV ingestion
S7, and the snapshot backfill.  All return ``ray.data.Dataset`` in the
canonical EVENTS_SCHEMA; casting is promote-on-read via the registry
pattern.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data as rd

from ..schema import EVENTS_SCHEMA


def _cast_events(t: pa.Table) -> pa.Table:
    """Cast a raw table to EVENTS_SCHEMA (missing optional columns get
    nulls; extra columns pass through untouched for evolution payloads)."""
    cols, names = [], []
    for f in EVENTS_SCHEMA:
        names.append(f.name)
        if f.name in t.column_names:
            cols.append(t.column(f.name).cast(f.type))
        else:
            cols.append(pa.nulls(t.num_rows, type=f.type))
    for name in t.column_names:  # evolution extras
        if name not in names:
            names.append(name)
            cols.append(t.column(name))
    return pa.table(cols, names=names)


def read_events_parquet(paths, columns=None, storage_options=None) -> "rd.Dataset":
    """Parquet change-event source with column pruning at the read.
    ``storage_options`` are forwarded to fsspec for URI schemes pyarrow
    doesn't resolve natively (S1: the reference acquires inputs from a
    remote object store, `scripts/get_synpuf_files.py:65-140`)."""
    from ..functions.rayutil import read_parquet_clean

    ds = read_parquet_clean(paths, columns=columns,
                            storage_options=storage_options)
    return ds.map_batches(_cast_events, batch_format="pyarrow", zero_copy_batch=True)


def read_events_csv(paths) -> "rd.Dataset":
    """CSV source (reference's native format, S7): strings in, typed out."""
    ds = rd.read_csv(paths)
    return ds.map_batches(_cast_events, batch_format="pyarrow")


def read_events_json(paths) -> "rd.Dataset":
    ds = rd.read_json(paths)
    return ds.map_batches(_cast_events, batch_format="pyarrow")


def union_event_sources(datasets: list, source_tags: list[str] | None = None) -> "rd.Dataset":
    """Union N event streams, optionally tagging provenance — the
    year-union reader analog (S2: three beneficiary years concatenated
    with a prepended year column, ``FileControl.py:9-48``)."""
    if source_tags is not None:
        if len(source_tags) != len(datasets):
            raise ValueError(
                f"{len(datasets)} datasets but {len(source_tags)} source_tags"
            )
        tagged = []
        for ds, tag in zip(datasets, source_tags):
            tagged.append(
                ds.map_batches(
                    lambda t, _tag=tag: t.append_column(
                        "source_tag", pa.array([_tag] * t.num_rows)
                    ),
                    batch_format="pyarrow",
                )
            )
        datasets = tagged
    out = datasets[0]
    for ds in datasets[1:]:
        out = out.union(ds)
    return out


def snapshot_to_event_stream(snapshot: "rd.Dataset", epoch: int = 0) -> "rd.Dataset":
    """Full-snapshot backfill: one insert event per row of a repos-shaped
    table (the initial binlog load).  seq is assigned per-batch from a
    content-stable hash so the assignment is deterministic under any
    block order (no global counter — SURVEY.md T3 anti-pattern)."""
    import zlib

    def to_events(t: pa.Table) -> pa.Table:
        n = t.num_rows
        crc = zlib.crc32
        seqs = [
            crc(f"{r}\x00{p}".encode()) & 0x7FFFFFFF
            for r, p in zip(t["repo"].to_pylist(), t["path"].to_pylist())
        ]
        return pa.table(
            {
                "repo": t["repo"],
                "path": t["path"],
                "op": pa.array(["insert"] * n),
                "commit": t["commit"],
                "epoch": pa.array([epoch] * n, type=pa.int64()),
                "seq": pa.array(seqs, type=pa.int64()),
                "lang": t["lang"],
                "content": t["content"].cast(pa.large_string()),
            }
        )

    return snapshot.map_batches(to_events, batch_format="pyarrow")
