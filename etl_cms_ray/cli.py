"""Command-line entry points — the unit submitted via ``ray job submit``.

    python -m etl_cms_ray.cli ingest  --events <parquet...> --lake <dir> [--salt N]
    python -m etl_cms_ray.cli replay  --events <parquet...> --lake <dir>
    python -m etl_cms_ray.cli audit   --lake <dir>
    python -m etl_cms_ray.cli repartition --lake <dir> --partitions N
    python -m etl_cms_ray.cli show    --lake <dir>

Owns its Ray session (guarded init, shutdown on exit); library code never
does.  On a cluster the same command runs unchanged under
``ray job submit --working-dir . -- python -m etl_cms_ray.cli ...`` —
``ray.init(address=...)`` picks up the cluster address from the job env.
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray_session(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if num_cpus is not None:
            kwargs.update(address="local", num_cpus=num_cpus)
        ray.init(**kwargs)
    return ray


def _parse_expectations(specs: list[str]):
    """``NAME:COL:OP[:VALUE[:VALUE2]]`` -> Expectation list.  VALUEs
    parse as int, then float, else string; in_set splits on commas."""
    from .stages.expectations import Expectation

    def _coerce(s: str):
        for cast in (int, float):
            try:
                return cast(s)
            except ValueError:
                continue
        return s

    out = []
    for spec in specs:
        parts = spec.split(":")
        if len(parts) < 3:
            raise SystemExit(f"bad --expect spec {spec!r} "
                             "(NAME:COL:OP[:VALUE[:VALUE2]])")
        name, col, op = parts[:3]
        value = value2 = None
        if len(parts) > 3:
            raw = parts[3]
            value = (tuple(v.strip() for v in raw.split(","))
                     if op == "in_set" else _coerce(raw))
        if len(parts) > 4:
            value2 = _coerce(parts[4])
        out.append(Expectation(name, col, op, value, value2))
    return out


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_cms_ray")
    p.add_argument("--num-cpus", type=int, default=None,
                   help="local session size (omit under ray job submit)")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="apply a change-event stream to the lake")
    pi.add_argument("--events", nargs="+", required=True)
    pi.add_argument("--lake", required=True)
    pi.add_argument("--partitions", type=int, default=64)
    pi.add_argument("--salt", type=int, default=1)
    pi.add_argument("--batch-size", type=int, default=16384)
    pi.add_argument("--mode", choices=["cow", "mor"], default="cow")
    pi.add_argument("--stage", action="store_true",
                    help="write-audit-publish: write everything but do not "
                         "move CURRENT (then: audit --version, publish/abort)")
    pi.add_argument("--expect", action="append", default=[],
                    metavar="NAME:COL:OP[:VALUE[:VALUE2]]",
                    help="ingest-time expectation (repeatable); OP one of "
                         "not_null/ge/le/gt/lt/between/in_set/matches/"
                         "min_bytes/max_bytes; in_set VALUE is "
                         "comma-separated; violating rows dead-letter "
                         "with this NAME as the reason")
    pi.add_argument("--schema-changes", default=None,
                    help="JSON file (or inline JSON array) of schema "
                         "evolution steps to register with this commit: "
                         '[{"epoch": N, "change": "add_column|widen|'
                         'drop_column|rename_column", "column": ..., '
                         '"type_name": ..., "default": ..., '
                         '"new_name": ...}]')

    pr = sub.add_parser("replay", help="re-apply a stream (fenced no-op when already applied)")
    pr.add_argument("--events", nargs="+", required=True)
    pr.add_argument("--lake", required=True)
    pr.add_argument("--partitions", type=int, default=64)

    pa_ = sub.add_parser("audit", help="integrity audit of the live lake "
                                       "(or any snapshot, incl. staged)")
    pa_.add_argument("--lake", required=True)
    pa_.add_argument("--version", type=int, default=None)

    pwp = sub.add_parser("publish", help="flip CURRENT to a staged manifest")
    pwp.add_argument("--lake", required=True)
    pwp.add_argument("--version", type=int, required=True)

    pwa = sub.add_parser("abort", help="discard a staged manifest")
    pwa.add_argument("--lake", required=True)
    pwa.add_argument("--version", type=int, required=True)

    pp = sub.add_parser("repartition", help="re-bucket the lake")
    pp.add_argument("--lake", required=True)
    pp.add_argument("--partitions", type=int, required=True)

    pcpt = sub.add_parser("compact", help="fold merge-on-read deltas into bases")
    pcpt.add_argument("--lake", required=True)

    pex = sub.add_parser("expire", help="delete snapshots older than the "
                                        "newest N and unreferenced data files")
    pex.add_argument("--lake", required=True)
    pex.add_argument("--keep-last", type=int, default=2, dest="keep_last")

    por = sub.add_parser("orphans", help="dry-run report of data files no "
                                         "manifest references (crashed-writer debris)")
    por.add_argument("--lake", required=True)
    por.add_argument("--grace-sec", type=float, default=0.0, dest="grace_sec")

    pam = sub.add_parser("maintain", help="one idempotent policy sweep: "
                                          "compact deep delta chains, refresh "
                                          "index/projection/z-order artifacts, "
                                          "optional expire, orphan report")
    pam.add_argument("--lake", required=True)
    pam.add_argument("--compact-delta-depth", type=int, default=1,
                     dest="compact_delta_depth")
    pam.add_argument("--expire-keep-last", type=int, default=None,
                     dest="expire_keep_last")
    pam.add_argument("--rebalance-skew", type=float, default=None,
                     dest="rebalance_skew",
                     help="repartition when max/median partition rows "
                          "reaches this ratio (the lake_freshness skew "
                          "signal, acted on)")
    pam.add_argument("--rebalance-max-partitions", type=int, default=None,
                     dest="rebalance_max", help="growth cap for --rebalance-skew")

    pdv = sub.add_parser("export-duckdb", help="print one SQL statement an "
                                              "external DuckDB session can run "
                                              "to query a snapshot in place")
    pdv.add_argument("--lake", required=True)
    pdv.add_argument("--version", default=None)
    pdv.add_argument("--table", default="lake")

    pfr = sub.add_parser("freshness", help="per-partition ingest-lag / SLA "
                                           "report from manifest metadata only")
    pfr.add_argument("--lake", required=True)
    pfr.add_argument("--source-max-epoch", type=int, default=None,
                     dest="source_max_epoch")

    ppg = sub.add_parser("purge", help="GDPR erasure of a subject key from "
                                       "EVERY retained snapshot, the dead-letter "
                                       "store and all branches (history rewrite; "
                                       "fences/versions preserved)")
    ppg.add_argument("--lake", required=True)
    ppg.add_argument("--repo", required=True)
    ppg.add_argument("--path", default=None)

    pdz = sub.add_parser("export-debezium",
                         help="publish a changelog between two manifest "
                              "versions as Debezium-envelope JSONL segments")
    pdz.add_argument("--lake", required=True)
    pdz.add_argument("--from-version", type=int, required=True,
                     dest="from_version")
    pdz.add_argument("--to-version", type=int, default=None,
                     dest="to_version")
    pdz.add_argument("--out", required=True)
    pdz.add_argument("--table", default="files")

    pt = sub.add_parser("tail", help="poll a binlog directory of "
                                     "epoch=N.parquet files and ingest new epochs")
    pt.add_argument("--events-dir", required=True, dest="events_dir")
    pt.add_argument("--lake", required=True)
    pt.add_argument("--partitions", type=int, default=64)
    pt.add_argument("--poll-seconds", type=float, default=1.0, dest="poll_seconds")
    pt.add_argument("--max-polls", type=int, default=None, dest="max_polls")
    pt.add_argument("--idle-stop", type=int, default=None, dest="idle_stop",
                    help="stop after N consecutive empty polls")
    pt.add_argument("--late-policy", choices=["ignore", "rescue", "strict"],
                    default="ignore", dest="late_policy")

    psy = sub.add_parser("sync", help="advance a replica lake to the "
                                      "primary's snapshot via the changelog")
    psy.add_argument("--primary", required=True)
    psy.add_argument("--replica", required=True)
    psy.add_argument("--partitions", type=int, default=None,
                     help="bucket count for a FRESH replica (default: primary's)")
    psy.add_argument("--verify", action="store_true",
                     help="also run the multiset-hash convergence check")

    ps = sub.add_parser("show", help="print manifest + lineage")
    ps.add_argument("--lake", required=True)

    prb = sub.add_parser("rollback", help="atomically point CURRENT at "
                         "an older manifest (restore-from-checkpoint; "
                         "later manifests stay on disk until their "
                         "version numbers are reused)")
    prb.add_argument("--lake", required=True)
    prb.add_argument("--to-version", type=int, required=True)

    psch = sub.add_parser("schema", help="registry change history + the "
                          "column set at each schema version")
    psch.add_argument("--lake", required=True)

    pkh = sub.add_parser("history", help="one key's state across "
                         "retained snapshots (per-version presence, "
                         "sha, changed flag); one pruned partition "
                         "read per version")
    pkh.add_argument("--lake", required=True)
    pkh.add_argument("--repo", required=True)
    pkh.add_argument("--path", required=True)

    pcnt = sub.add_parser("count", help="exact COUNT(*) of the live "
                          "relation, metadata-served (only live-delta "
                          "MOR partitions are folded)")
    pcnt.add_argument("--lake", required=True)
    pcnt.add_argument("--version", type=int, default=None,
                      help="snapshot version (default current)")

    pmm = sub.add_parser("minmax", help="exact MIN/MAX of a column, "
                         "zone-map-served (only live-delta MOR "
                         "partitions and stats-less columns fold)")
    pmm.add_argument("--lake", required=True)
    pmm.add_argument("--column", required=True)
    pmm.add_argument("--version", type=int, default=None)

    pmt = sub.add_parser("meta", help="queryable metadata tables: one "
                         "JSON line per row of files | partitions | "
                         "snapshots (manifest/lineage only, zero data "
                         "reads)")
    pmt.add_argument("table", choices=["files", "partitions", "snapshots"])
    pmt.add_argument("--lake", required=True)
    pmt.add_argument("--version", type=int, default=None,
                     help="snapshot version (files/partitions; "
                          "default current)")

    psn = sub.add_parser("snapshot", help="time-travel read at a manifest version")
    psn.add_argument("--lake", required=True)
    psn.add_argument("--version", default=None,
                     help="manifest version number or tag name")
    psn.add_argument("--as-of", type=float, default=None, dest="as_of",
                     help="epoch-seconds timestamp: read the version that "
                          "was CURRENT at that moment (exclusive with "
                          "--version)")
    psn.add_argument("--out", required=True, help="parquet output path")

    ptag = sub.add_parser("tag", help="pin/list/delete named snapshot refs "
                                      "(tagged versions survive expire)")
    ptag.add_argument("--lake", required=True)
    ptag.add_argument("--set", default=None, metavar="NAME")
    ptag.add_argument("--version", type=int, default=None,
                      help="version to tag (default: current)")
    ptag.add_argument("--delete", default=None, metavar="NAME")

    pd_ = sub.add_parser("diff", help="changelog between two manifest versions")
    pd_.add_argument("--lake", required=True)
    pd_.add_argument("--from-version", type=int, required=True, dest="from_v")
    pd_.add_argument("--to-version", type=int, default=None, dest="to_v")
    pd_.add_argument("--out", default=None, help="optional parquet output path")

    pidx = sub.add_parser("index", help="(re)build the inverted token index "
                          "over the live lake")
    pidx.add_argument("--lake", required=True)
    pidx.add_argument("--column", default="content")
    pidx.add_argument("--buckets", type=int, default=4096)

    psrch = sub.add_parser("search", help="token search via the inverted "
                           "index (prunes provably-absent partitions)")
    psrch.add_argument("--lake", required=True)
    psrch.add_argument("--token", required=True)
    psrch.add_argument("--out", default=None, help="optional parquet output path")

    pzo = sub.add_parser("zorder", help="build/refresh a z-order clustered "
                         "layout over the live lake")
    pzo.add_argument("--lake", required=True)
    pzo.add_argument("--name", required=True)
    pzo.add_argument("--by", required=True,
                     help="comma-separated clustering columns, e.g. lang,size")
    pzo.add_argument("--files", type=int, default=16)
    pzo.add_argument("--full", action="store_true",
                     help="force a full rebuild (re-derive code domains)")

    pzs = sub.add_parser("zscan", help="multi-predicate scan served from a "
                         "z-order layout (zone-map pruned)")
    pzs.add_argument("--lake", required=True)
    pzs.add_argument("--name", required=True)
    pzs.add_argument("--where", required=True, action="append",
                     help="col:lo:hi (repeatable; strings use lo==hi for "
                          "equality, e.g. --where lang:fr:fr)")
    pzs.add_argument("--out", default=None, help="optional parquet output path")

    pmv = sub.add_parser("matview", help="materialize or refresh a keyed "
                         "join view between two lakes, stored as a lake")
    pmv.add_argument("action", choices=["materialize", "refresh"])
    pmv.add_argument("--lake-a", required=True)
    pmv.add_argument("--lake-b", required=True)
    pmv.add_argument("--view", required=True, help="view lake root")
    pmv.add_argument("--partitions", type=int, default=16)
    pmv.add_argument("--from-version-a", type=int, default=None,
                     help="refresh: base-A version the view was last built at")
    pmv.add_argument("--from-version-b", type=int, default=None)

    pbr = sub.add_parser("branch", help="fork / list / merge / delete lake "
                         "branches (multi-commit isolated writes; "
                         "three-way merge at partition granularity)")
    pbr.add_argument("action", choices=["create", "list", "merge", "delete"])
    pbr.add_argument("--lake", required=True)
    pbr.add_argument("--name", help="branch name (all actions but list)")
    pbr.add_argument("--at", default=None,
                     help="create: fork at a version or tag (default: current)")
    pbr.add_argument("--strategy", default="fail",
                     choices=["fail", "ours", "theirs"],
                     help="merge: conflicting-partition resolution")

    args = p.parse_args(argv)
    ray = _ray_session(args.num_cpus)
    try:
        if args.cmd in ("ingest", "replay"):
            from .config import EngineConfig
            from .pipelines.ingest import ingest
            from .sources.events import read_events_parquet
            from .state.manifest import LakeStore

            # an existing lake's bucket count is authoritative
            manifest = LakeStore(args.lake).load_manifest()
            partitions = manifest.num_partitions if manifest.partitions else args.partitions

            cfg = EngineConfig(
                lake_root=args.lake,
                num_partitions=partitions,
                salt_factor=getattr(args, "salt", 1),
                batch_size=getattr(args, "batch_size", 16384),
                commit_mode=getattr(args, "mode", "cow"),
            )
            changes = None
            spec = getattr(args, "schema_changes", None)
            if spec:
                from .schema import SchemaChange

                raw = spec.strip()
                if not raw.startswith("["):
                    with open(spec) as f:
                        raw = f.read()
                changes = [SchemaChange.from_json(d) for d in json.loads(raw)]
            res = ingest(read_events_parquet(args.events), cfg,
                         stage=getattr(args, "stage", False),
                         schema_changes=changes,
                         expectations=_parse_expectations(
                             getattr(args, "expect", [])))
            print(json.dumps(res.__dict__))
        elif args.cmd == "audit":
            from .pipelines.maintenance import audit_lake

            report = audit_lake(args.lake, version=args.version)
            print(json.dumps(report))
            return 0 if report["healthy"] else 2
        elif args.cmd in ("publish", "abort"):
            from .state.manifest import LakeStore

            store = LakeStore(args.lake)
            if args.cmd == "publish":
                store.commit_staged(args.version)
            else:
                store.abort_staged(args.version)
            print(json.dumps({"cmd": args.cmd, "version": args.version,
                              "current": store.current_version()}))
        elif args.cmd == "compact":
            from .pipelines.maintenance import compact_lake

            m = compact_lake(args.lake)
            print(json.dumps({"manifest_version": m.version, **m.metrics}))
        elif args.cmd == "repartition":
            from .pipelines.maintenance import repartition_lake

            m = repartition_lake(args.lake, args.partitions)
            print(json.dumps({"manifest_version": m.version, **m.metrics}))
        elif args.cmd == "expire":
            from .pipelines.maintenance import expire_snapshots

            print(json.dumps(expire_snapshots(args.lake, args.keep_last)))
        elif args.cmd == "orphans":
            from .pipelines.maintenance import find_orphan_files

            rows = find_orphan_files(args.lake, grace_sec=args.grace_sec)
            print(json.dumps({"orphans": rows,
                              "total_bytes": sum(r["bytes"] for r in rows)}))
        elif args.cmd == "maintain":
            from .pipelines.maintenance import auto_maintain

            print(json.dumps(auto_maintain(
                args.lake, compact_delta_depth=args.compact_delta_depth,
                expire_keep_last=args.expire_keep_last,
                rebalance_skew_ratio=args.rebalance_skew,
                rebalance_max_partitions=args.rebalance_max)))
        elif args.cmd == "export-duckdb":
            from .pipelines.interop import export_duckdb_view

            print(export_duckdb_view(args.lake, version=args.version,
                                     table_name=args.table))
        elif args.cmd == "freshness":
            from .pipelines.maintenance import lake_freshness

            print(json.dumps(lake_freshness(
                args.lake, source_max_epoch=args.source_max_epoch)))
        elif args.cmd == "purge":
            from .pipelines.maintenance import purge_history

            print(json.dumps(purge_history(args.lake, args.repo,
                                           path=args.path)))
        elif args.cmd == "export-debezium":
            from .sources.debezium import export_changelog_debezium

            out = export_changelog_debezium(
                args.lake, args.from_version, args.to_version,
                out_dir=args.out, table=args.table)
            print(json.dumps({"segments_dir": out}))
        elif args.cmd == "snapshot":
            from .pipelines.history import read_snapshot

            ds = read_snapshot(args.lake, version=args.version,
                               as_of=args.as_of)
            ds.write_parquet(args.out)  # streams; no driver materialization
            import pyarrow.dataset as pds

            rows = sum(f.count_rows() for f in pds.dataset(args.out).get_fragments())
            print(json.dumps({"rows": int(rows), "out": args.out}))
        elif args.cmd == "tag":
            from .state.manifest import LakeStore

            store = LakeStore(args.lake)
            if args.set:
                entry = store.set_tag(args.set, version=args.version)
                print(json.dumps({"tag": args.set, **entry}))
            elif args.delete:
                store.delete_tag(args.delete)
                print(json.dumps({"deleted": args.delete}))
            else:
                print(json.dumps(store.tags()))
        elif args.cmd == "diff":
            from .pipelines.history import snapshot_diff

            ds = snapshot_diff(args.lake, args.from_v, args.to_v)
            if args.out:
                # write once, read counts back — to_pandas() on the same
                # lazy Dataset would re-execute every partition diff
                ds.write_parquet(args.out)
                import pyarrow.dataset as pds

                df = pds.dataset(args.out).to_table(columns=["change"]).to_pandas()
            else:
                df = ds.to_pandas()
            counts = (df["change"].value_counts().to_dict()
                      if "change" in df.columns else {})
            print(json.dumps({"rows": int(len(df)), "changes": counts}))
        elif args.cmd == "index":
            from .pipelines.index import build_token_index

            print(json.dumps(build_token_index(
                args.lake, column=args.column, num_buckets=args.buckets)))
        elif args.cmd == "search":
            from .pipelines.index import token_plan, token_search

            plan, info = token_plan(args.lake, args.token)
            ds = token_search(args.lake, args.token, plan=plan)
            if args.out:
                ds.write_parquet(args.out)
                import pyarrow.dataset as pds

                rows = sum(f.count_rows()
                           for f in pds.dataset(args.out).get_fragments())
            else:
                rows = ds.count()
            print(json.dumps({"rows": int(rows), **info}))
        elif args.cmd == "matview":
            from .config import EngineConfig
            from .pipelines.matview import (materialize_join_view,
                                            refresh_join_view)
            from .state.manifest import LakeStore as _LS

            manifest = _LS(args.view).load_manifest()
            partitions = (manifest.num_partitions if manifest.partitions
                          else args.partitions)
            vcfg = EngineConfig(lake_root=args.view,
                                num_partitions=partitions)
            if args.action == "materialize":
                res = materialize_join_view(args.lake_a, args.lake_b, vcfg)
            else:
                if args.from_version_a is None or args.from_version_b is None:
                    raise SystemExit("refresh requires --from-version-a/-b")
                res = refresh_join_view(
                    args.lake_a, args.lake_b, vcfg,
                    from_version_a=args.from_version_a,
                    from_version_b=args.from_version_b)
            print(json.dumps(res.__dict__))
        elif args.cmd == "branch":
            from .pipelines import branch as _br

            if args.action == "list":
                print(json.dumps(_br.list_branches(args.lake)))
            elif args.action == "create":
                print(json.dumps({k: v for k, v in _br.create_branch(
                    args.lake, args.name, at=args.at).items()
                    if k != "base_registry"}))
            elif args.action == "merge":
                print(json.dumps(_br.merge_branch(
                    args.lake, args.name, strategy=args.strategy)))
            else:
                _br.delete_branch(args.lake, args.name)
                print(json.dumps({"deleted": args.name}))
        elif args.cmd == "zorder":
            from .pipelines.zorder import build_zorder

            print(json.dumps(build_zorder(
                args.lake, args.name, args.by.split(","),
                num_files=args.files, incremental=not args.full)))
        elif args.cmd == "zscan":
            from .pipelines.zorder import zorder_scan

            preds = {}
            for w in args.where:
                col, lo, hi = w.split(":", 2)
                try:
                    preds[col] = (float(lo), float(hi))
                except ValueError:
                    preds[col] = (lo, hi)
            info: dict = {}
            ds = zorder_scan(args.lake, args.name, preds, info=info)
            if args.out:
                ds.write_parquet(args.out)
                import pyarrow.dataset as pds

                rows = sum(f.count_rows()
                           for f in pds.dataset(args.out).get_fragments())
            else:
                rows = ds.count()
            print(json.dumps({"rows": int(rows), **info}))
        elif args.cmd == "tail":
            from .config import EngineConfig
            from .pipelines.tail import tail_loop
            from .state.manifest import LakeStore

            manifest = LakeStore(args.lake).load_manifest()
            partitions = (manifest.num_partitions if manifest.partitions
                          else args.partitions)
            commits = tail_loop(
                args.events_dir,
                EngineConfig(lake_root=args.lake, num_partitions=partitions),
                poll_seconds=args.poll_seconds,
                max_polls=args.max_polls,
                idle_polls_to_stop=args.idle_stop,
                late_policy=args.late_policy,
            )
            print(json.dumps({"commits": commits}))
        elif args.cmd == "sync":
            from .pipelines.replicate import sync_lake, verify_replica

            res = sync_lake(args.primary, args.replica,
                            num_partitions=args.partitions)
            out = {"synced": res is not None}
            if res is not None:
                out.update(res.__dict__)
            if args.verify:
                chk = verify_replica(args.primary, args.replica)
                out.update(chk)
                print(json.dumps(out))
                return 0 if chk["converged"] else 2
            print(json.dumps(out))
        elif args.cmd == "meta":
            from .pipelines import meta as _meta

            fn = {"files": _meta.lake_files,
                  "partitions": _meta.lake_partitions,
                  "snapshots": _meta.lake_snapshots}[args.table]
            kw = {} if args.table == "snapshots" else \
                {"version": args.version}
            # take_all keeps Arrow nulls as JSON null and ints as ints
            # (pandas would surface null int64 as bare NaN — invalid JSON)
            for row in fn(args.lake, **kw).take_all():
                print(json.dumps(row, default=str))
        elif args.cmd == "rollback":
            from .state.manifest import LakeStore

            store = LakeStore(args.lake)
            before = store.current_version()
            store.rollback(args.to_version)
            print(json.dumps({"lake": args.lake, "was": before,
                              "current": store.current_version()}))
        elif args.cmd == "schema":
            from .state.manifest import LakeStore

            store = LakeStore(args.lake)
            reg = store.load_registry()
            for i, ch in enumerate(reg.changes):
                print(json.dumps({"version": i + 1, **ch.to_json()}))
            print(json.dumps({"latest_version": reg.latest_version,
                              "columns": reg.schema_for(
                                  reg.latest_version).names}))
        elif args.cmd == "history":
            from .pipelines.history import key_history

            for row in key_history(args.lake, args.repo,
                                   args.path).to_pylist():
                print(json.dumps(row, default=str))
        elif args.cmd == "minmax":
            from .pipelines.meta import fast_minmax

            lo, hi = fast_minmax(args.lake, args.column,
                                 version=args.version)
            print(json.dumps({"lake": args.lake, "column": args.column,
                              "version": args.version, "min": lo,
                              "max": hi}, default=str))
        elif args.cmd == "count":
            from .pipelines.meta import fast_count

            print(json.dumps({"lake": args.lake,
                              "version": args.version,
                              "n_rows": fast_count(args.lake,
                                                   version=args.version)}))
        elif args.cmd == "show":
            from .state.manifest import LakeStore

            store = LakeStore(args.lake)
            m = store.load_manifest()
            print(json.dumps({"version": m.version, "num_partitions": m.num_partitions,
                              "metrics": m.metrics,
                              "lineage": store.read_lineage()}, indent=1))
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
