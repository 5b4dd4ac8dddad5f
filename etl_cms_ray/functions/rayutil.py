"""Small shared Ray-pipeline utilities (single source of truth — these
were previously duplicated across queries.py and dedup.py and the copies
had already started to drift).
"""

from __future__ import annotations

import pyarrow as pa

import ray


def default_join_partitions(cap: int = 8) -> int:
    """num_partitions for native Dataset.join sized to the session: the
    Join operator reserves one aggregator actor per partition, so every
    extra partition is per-pipeline actor spin-up cost, and chained joins
    at num_partitions >> CPUs can starve a small local session (measured
    at sf0.1/32cpus: jp=4 beats jp=8/16 by 10-30%).  A cluster deployment
    sizes this to DATA volume instead — partitions ~ join-side bytes /
    target block size — via the cap argument."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        cpus = 8
    return max(2, min(cap, cpus // 8))


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Strip schema metadata (parquet writes a `pandas` dict that makes
    pyarrow schemas unhashable, defeating Ray's schema dedup inside
    hash-shuffle joins and spamming 'Failed to hash the schemas')."""
    return t.replace_schema_metadata(None)


def read_parquet_clean(paths, *, columns=None, storage_options=None,
                       **kwargs):
    """`ray.data.read_parquet` with a metadata-stripped explicit schema.

    Parquet written through pandas carries a ``pandas`` dict in schema
    metadata; this pyarrow's ``Schema.__hash__`` raises ``unhashable
    type: 'dict'`` on any schema with metadata, which defeats Ray's
    schema-dedup early exit in ``unify_schemas`` and logs 'Failed to
    hash the schemas' from every read/shuffle task that touches such a
    block.  Passing an explicit stripped schema makes every downstream
    block schema hashable (and skips per-task schema unification).

    Only for path sets that share one physical schema (the testdata
    tables, a fan-out sink's files) — lake reads handle schema
    evolution themselves in ``pipelines/ingest.read_lake``.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    plist = list(paths) if isinstance(paths, (list, tuple)) else [paths]
    if any(isinstance(p, str) and "://" in p for p in plist):
        # URI sources (file://, s3://, ...): resolve scheme -> filesystem
        # OURSELVES and hand Ray plain paths + an explicit filesystem.
        # Ray 2.49's path resolver locks onto the first path's filesystem
        # and then calls normalize_path on the RAW URI of every later
        # path, so a list of URIs fails without this.
        from pyarrow.fs import FileSystem

        def _resolve(p):
            try:
                return FileSystem.from_uri(p)
            except Exception:
                # scheme pyarrow doesn't know natively (memory://, a
                # registered fsspec implementation, cloud schemes routed
                # through fsspec): wrap the fsspec filesystem so Ray's
                # read tasks get a pyarrow-compatible handle.  The
                # filesystem object must survive pickling to worker
                # processes — true for path-backed fsspec filesystems,
                # NOT for the process-local memory:// store.
                import fsspec
                from pyarrow.fs import FSSpecHandler, PyFileSystem

                f, pth = fsspec.core.url_to_fs(p, **(storage_options or {}))
                return PyFileSystem(FSSpecHandler(f)), pth

        fs = None
        stripped = []
        for p in plist:
            f, pth = _resolve(p)
            if fs is not None and type(f) is not type(fs):
                raise ValueError("mixed URI schemes in one read")
            fs = f
            stripped.append(pth)
        paths = stripped if isinstance(paths, (list, tuple)) else stripped[0]
        kwargs = {**kwargs, "filesystem": fs}
    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    try:
        schema = pq.read_schema(
            first, filesystem=kwargs.get("filesystem")
        ).remove_metadata()
        if columns is not None:
            # subset to the projection (file order), else the scanner
            # compares pruned batches against the full schema and raises
            schema = pa.schema([schema.field(c) for c in columns])
    except Exception:
        return rd.read_parquet(paths, columns=columns, **kwargs)
    return rd.read_parquet(paths, columns=columns, schema=schema, **kwargs)
