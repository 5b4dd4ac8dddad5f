"""etl_cms_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch engine with the data-processing capabilities of
OHDSI/ETL-CMS (see SURVEY.md), reframed as a binlog-style change-event
pipeline over a Parquet table of source-code repositories:

    events(repo, path, op, commit, epoch, seq, lang, content)
        -> normalize (content_sha, size, part_id)     [stateless map_batches]
        -> groupby(part_id)                           [the one hash shuffle]
        -> MergeApplier actor pool                    [LWW upsert vs lake state]
        -> epoch-fenced manifest commit               [exactly-once]

Everything flows as zero-copy Arrow batches through ``ray.data.Dataset``
pipelines; no module in this package calls ``ray.init``.
"""

__version__ = "0.1.0"
