"""Engine configuration.

The reference's config surface is a ``.env`` of directories
(``python_etl/CMS_SynPuf_ETL_CDM_v5.py:89-111``); ours is a typed
dataclass.  ``num_partitions`` is the analog of the reference's implicit
"one shard per sample" layout — pick ~2-4x total cluster cores so the
groupby shuffle and the merge-applier pool stay busy without tiny blocks.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class EngineConfig:
    lake_root: str
    #: hash partitions of the (repo, path) key space; stable across runs
    #: (checkpoints are per-partition, so this must not change for a lake).
    num_partitions: int = 32
    #: map_batches batch size for the stateless normalize stage.
    batch_size: int = 8192
    #: actor pool sizes for the OPTIONAL actor-mode stage classes
    #: (Normalizer / MergeApplier).  The default ingest hot path is
    #: task-based and ignores these (see pipelines/ingest.py rationale).
    normalize_concurrency: int = 4
    applier_concurrency: int = 4
    #: explicit skew treatment: when > 1, an extra salted reduce runs
    #: BEFORE the main partition shuffle — events are grouped by
    #: (part_id, seq % salt_factor) and LWW-reduced per salted group, so
    #: a pathologically hot partition's volume is cut by up to
    #: salt_factor before any single reducer sees it.  Safe because LWW
    #: is associative/commutative under the (epoch, seq) total order
    #: (SURVEY.md §7.4 #4).  Costs a second shuffle; enable for streams
    #: with extreme per-key duplication, leave at 1 otherwise (the
    #: per-batch combiner already collapses in-batch duplicates).
    salt_factor: int = 1
    #: drop content payloads larger than this to the dead-letter sink
    #: (guard analog: reference aborts at recs_in > 10000, FileControl.py:211).
    max_content_bytes: int = 8 * 1024 * 1024
    #: commit mode: "cow" rewrites each touched partition per commit
    #: (read-optimal); "mor" appends per-commit LWW delta files and merges
    #: on read, auto-compacting at max_deltas (write-optimal for small
    #: incremental commits against large partitions).
    commit_mode: str = "cow"
    max_deltas: int = 8
