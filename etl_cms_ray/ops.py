"""Public operator facade — one import surface for every reusable
Ray-Data operator the engine ships, grouped the way a pipeline author
reaches for them.  (The catalog in ``pipelines/queries.py`` shows each
one wired end-to-end with a DuckDB oracle.)

    from etl_cms_ray import ops
    joined = ops.hash_join(left, right, on="k")
"""

from __future__ import annotations

# joins
from .stages.asof import asof_join
from .stages.intervaljoin import interval_event_join
from .stages.join import hash_join
from .stages.rangejoin import interval_join
from .stages.dimjoin import BroadcastJoiner, put_dim

# dedup family
from .stages.dedup import (build_minhash_band_index, exact_dedup_groups,
                           incremental_exact_dedup, incremental_minhash_pairs,
                           minhash_lsh_pairs, ngram_jaccard_pairs,
                           simhash_pairs, substring_dup_stats)

# fuzzy string matching (entity resolution)
from .stages.fuzzy import (build_fuzzy_key_index, edit1_mask,
                           editk_mask, fuzzy_pairs, fuzzy_pairs_edit1,
                           incremental_fuzzy_pairs)

# similarity search
from .stages.ann import (brute_force_topk, build_ivf_index,
                         centroid_cosine_scores, cosine_pairs,
                         extend_ivf_index, group_centroids,
                         hard_negative_topk, ivf_index_topk, ivf_topk,
                         kmeans_assign, kmeans_diversity_sample, kmeans_fit,
                         lsh_topk, pq_encode, pq_topk, semdedup_pairs,
                         train_centroids, train_pq)

# embedding linear algebra
from .stages.pca import covariance_partials, fit_pca, project_batch

# graph centrality
from .stages.graph import bfs_hops, pagerank

# external-engine interop
from .pipelines.interop import export_duckdb_view

# storage-partitioned (shuffle-free) lake-lake join
from .pipelines.spj import copartitioned_join

# lexical retrieval
from .stages.retrieval import bm25_topk, rrf_fuse

# corpus hygiene
from .stages.decontam import contaminated_ids, decontaminate, shingle_rows

# exact distributed selection
from .stages.selection import exact_group_quantile

# structural
from .stages.closure import closure_roots
from .stages.fanout import Route, fanout_write, read_fanout_table
from .stages.redact import DEFAULT_RULES, RedactRule, redact_batch, redact_column
from .stages.unpivot import unpivot_list

# lake lifecycle
from .pipelines.history import (consume_changelog, consumer_cursor,
                                incremental_repo_stats, incremental_token_df,
                                keyed_join_view, keyed_join_view_refresh,
                                key_history,
                                keyed_join_view_snapshot, read_snapshot,
                                repo_stats_snapshot, snapshot_diff,
                                token_df_snapshot)
from .pipelines.branch import (branch_root, create_branch, delete_branch,
                               list_branches, merge_branch)
from .sources.debezium import (decode_debezium, export_changelog_debezium,
                               read_events_debezium)
from .pipelines.index import build_token_index, token_plan, token_search
from .pipelines.maintenance import requeue_dead_letter
from .pipelines.matview import (materialize_join_view, materialize_stats_view,
                                read_join_view, read_stats_view,
                                refresh_join_view, refresh_stats_view)
from .pipelines.projection import (build_projection, load_projection_meta,
                                   projection_scan)
from .pipelines.zorder import build_zorder, load_zorder_meta, zorder_scan
from .stages.bpe import bpe_encode_counts, bpe_train
from .pipelines.ingest import (eq_plan, eq_scan, ingest, ingest_with_retry,
                               lookup_plan, point_lookup, range_plan,
                               range_scan, read_dead_letter, read_lake,
                               read_lake_table)
from .stages.expectations import Expectation
from .pipelines.maintenance import (audit_lake, auto_maintain, compact_lake,
                                    delete_where, expire_snapshots,
                                    find_orphan_files, lake_freshness,
                                    purge_history, repartition_lake,
                                    update_where)
from .pipelines.meta import (
    fast_count,
    fast_minmax,
    lake_files,
    lake_partitions,
    lake_snapshots,
)
from .pipelines.replicate import lake_content_hash, sync_lake, verify_replica
from .state.manifest import LakeStore
from .pipelines.planner import scan_plans, smart_scan

# training-batch layout
from .stages.packing import pack_token_chunks, weighted_corpus_mix

# multimodal (real numpy codecs; video decode is the documented stub)
from .functions.codecs import (decode_bmp, decode_ppm, decode_wav, encode_bmp,
                               encode_ppm, encode_wav, resize_image, sniff_kind)
from .stages.multimodal import (DecodeStub, FrameSampler, MediaDecoder,
                                synth_media_table)

# remote-shaped sources: the stdlib-urllib HTTP filesystem (registers
# the stdhttp:// scheme on import; rides the same fsspec fallback as
# cloud schemes in functions/rayutil.read_parquet_clean)
from .functions.httpfs import StdlibHTTPFileSystem
from .functions.rayutil import read_parquet_clean

# sketches / metrics
from .functions.sketch import (HyperLogLog, KLL, MisraGries, approx_distinct,
                               approx_quantiles, heavy_hitters)
from .stages.bloom import BloomFilter, bloom_prune, build_bloom
from .stages.metrics import make_counter, read_counter

__all__ = [
    "asof_join", "hash_join", "interval_join", "interval_event_join",
    "BroadcastJoiner", "put_dim",
    "exact_dedup_groups", "minhash_lsh_pairs", "ngram_jaccard_pairs",
    "substring_dup_stats", "incremental_exact_dedup",
    "build_minhash_band_index", "incremental_minhash_pairs",
    "simhash_pairs",
    "fuzzy_pairs", "fuzzy_pairs_edit1", "build_fuzzy_key_index",
    "incremental_fuzzy_pairs", "edit1_mask", "editk_mask",
    "brute_force_topk", "cosine_pairs", "semdedup_pairs",
    "hard_negative_topk",
    "kmeans_fit", "kmeans_assign", "kmeans_diversity_sample",
    "ivf_topk", "lsh_topk",
    "build_ivf_index", "extend_ivf_index", "ivf_index_topk",
    "train_centroids", "train_pq", "pq_encode", "pq_topk",
    "group_centroids", "centroid_cosine_scores",
    "bm25_topk", "rrf_fuse",
    "covariance_partials", "fit_pca", "project_batch",
    "bfs_hops",
    "pagerank",
    "copartitioned_join",
    "closure_roots", "Route", "fanout_write", "read_fanout_table",
    "unpivot_list",
    "RedactRule", "DEFAULT_RULES", "redact_batch", "redact_column",
    "incremental_repo_stats", "incremental_token_df", "token_df_snapshot",
    "keyed_join_view_snapshot", "keyed_join_view_refresh", "keyed_join_view",
    "materialize_join_view", "refresh_join_view", "read_join_view",
    "materialize_stats_view", "refresh_stats_view", "read_stats_view",
    "key_history", "read_snapshot", "repo_stats_snapshot",
    "snapshot_diff", "consume_changelog", "consumer_cursor",
    "ingest", "ingest_with_retry", "read_lake",
    "read_lake_table", "read_parquet_clean", "StdlibHTTPFileSystem",
    "point_lookup", "lookup_plan", "range_plan", "range_scan",
    "eq_plan", "eq_scan",
    "build_token_index", "token_plan", "token_search",
    "build_projection", "projection_scan", "load_projection_meta",
    "build_zorder", "zorder_scan", "load_zorder_meta",
    "bpe_train", "bpe_encode_counts",
    "decontaminate", "contaminated_ids", "shingle_rows",
    "exact_group_quantile",
    "audit_lake", "compact_lake", "expire_snapshots", "repartition_lake",
    "find_orphan_files", "auto_maintain", "lake_freshness",
    "fast_count", "fast_minmax",
    "lake_files", "lake_partitions", "lake_snapshots",
    "export_duckdb_view",
    "sync_lake", "verify_replica", "lake_content_hash",
    "delete_where", "update_where", "purge_history",
    "LakeStore", "scan_plans", "smart_scan",
    "create_branch", "merge_branch", "delete_branch", "list_branches",
    "branch_root",
    "read_events_debezium", "decode_debezium", "export_changelog_debezium",
    "Expectation", "read_dead_letter", "requeue_dead_letter",
    "HyperLogLog", "MisraGries", "KLL", "approx_distinct", "heavy_hitters",
    "approx_quantiles",
    "BloomFilter", "build_bloom", "bloom_prune",
    "make_counter", "read_counter",
    "pack_token_chunks", "weighted_corpus_mix",
    "MediaDecoder", "DecodeStub", "FrameSampler", "synth_media_table",
    "decode_wav", "encode_wav", "decode_bmp", "encode_bmp",
    "decode_ppm", "encode_ppm", "resize_image", "sniff_kind",
]
