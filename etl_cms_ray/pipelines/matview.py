"""Materialized join views: the keyed join view stored AS A LAKE.

``history.keyed_join_view_*`` maintains the join-view state as an
in-flight Dataset; this module persists that state into a normal engine
lake, which upgrades every scale property at once:

- **O(changed partitions) refresh.** The refresh reads ONLY the view
  partitions that touched keys hash to (a bounded set of partition ids,
  never the key list, crosses the driver) and the applier rewrites only
  partitions that receive events — the Dataset form had to stream the
  whole state through one exchange per refresh.
- **Exactly-once refresh.** View updates ride the engine's epoch fences
  (epoch = version_a + version_b, strictly increasing whenever either
  base advances), so a replayed refresh is a fenced no-op.
- **Time travel / audit / WAP for free.** The view is a lake: manifest
  history, content hashes, `audit_lake`, tags and snapshot reads all
  apply unchanged.

Presence encoding: the stored state is the FULL OUTER join (delta-join
IVM needs the unchanged side's values when the other side inserts), so
each state row carries ``a_live``/``b_live`` int8 flags plus the B-side
payload in an evolved ``b_content`` column.  The engine requires insert
events to carry non-null ``content``, so a dead A side stores ``""`` —
never observable: ``read_join_view`` filters to inner rows, where
``a_live == 1`` by definition.  A key dead on BOTH sides leaves the view
via a normal tombstone event.

Reference analog: the reference materializes joined claim+beneficiary
outputs as physical CDM tables rebuilt per run
(``CMS_SynPuf_ETL_CDM_v5.py`` main loop); this view rebuilds only what
changed, with commit semantics the reference lacks.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..config import EngineConfig
from ..schema import SchemaChange, SchemaRegistry
from ..state.manifest import LakeStore
from .history import read_snapshot, snapshot_diff

_KEYS = ["repo", "path"]


def _mapped_names(columns_a, columns_b) -> tuple:
    """Deterministic view-lake column names for the two payload sides:
    the A side's ``content`` rides the lake's protected content column,
    every other A column becomes ``a_<col>``, every B column becomes
    ``b_<col>``.  Unique by construction for distinct inputs; collisions
    with engine columns are rejected.  This naming is what lets views
    COMPOSE: a view lake's own (content, b_content) payloads can feed a
    second-level view as ordinary base columns."""
    from ..schema import LAKE_SCHEMA_V1

    if (len(set(columns_a)) != len(tuple(columns_a))
            or len(set(columns_b)) != len(tuple(columns_b))):
        raise ValueError(
            f"duplicate payload columns: {columns_a} / {columns_b}")
    a_map = {c: ("content" if c == "content" else f"a_{c}")
             for c in columns_a}
    b_map = {c: f"b_{c}" for c in columns_b}
    names = list(a_map.values()) + list(b_map.values())
    reserved = (set(LAKE_SCHEMA_V1.names) - {"content"}) | {"a_live", "b_live"}
    bad = sorted(set(n for n in names if n in reserved))
    if bad or len(set(names)) != len(names):
        raise ValueError(f"view payload name collision: {names} (bad={bad})")
    return a_map, b_map


def _payload_types(lake_root: str, cols) -> dict:
    reg = LakeStore(lake_root).load_registry()
    sch = reg.schema_for(reg.latest_version)
    return {c: sch.field(c).type for c in cols}


def _view_schema_changes(types_a: dict, types_b: dict,
                         a_map: dict, b_map: dict) -> list:
    from ..schema import _TYPES

    rev = {v: k for k, v in _TYPES.items()}
    changes = []
    for types, m in ((types_a, a_map), (types_b, b_map)):
        for c, t in types.items():
            name = m[c]
            if name == "content":
                continue
            if t not in rev:
                raise ValueError(f"unsupported view payload type {t} for {c}")
            changes.append(SchemaChange(epoch=0, change="add_column",
                                        column=name, type_name=rev[t],
                                        default=None))
    changes.append(SchemaChange(epoch=0, change="add_column",
                                column="a_live", type_name="int8", default=0))
    changes.append(SchemaChange(epoch=0, change="add_column",
                                column="b_live", type_name="int8", default=0))
    return changes


def _state_to_events(t: pa.Table, epoch: int, a_names, b_names) -> pa.Table:
    """State rows (keys + mapped payload columns + live flags) -> engine
    change events: upserts for rows live on either side, tombstones for
    rows dead on both.  Payload values are masked to null when their
    side is dead; the protected ``content`` column stores "" when the A
    side is dead or contributes no content payload (never observable —
    the inner read filters on the flags)."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    a_live = pc.cast(pc.fill_null(t["a_live"], False), pa.bool_())
    b_live = pc.cast(pc.fill_null(t["b_live"], False), pa.bool_())
    any_live = pc.or_(a_live, b_live)
    n = t.num_rows
    if "content" in a_names:
        content = pc.if_else(
            a_live, pc.fill_null(t["content"].cast(pa.large_string()), ""),
            pa.scalar("", pa.large_string()))
    else:
        content = pa.array([""] * n, type=pa.large_string())
    content = pc.if_else(any_live, content,
                         pa.nulls(n, type=pa.large_string()))
    out = {
        "repo": t["repo"],
        "path": t["path"],
        "op": pc.if_else(any_live, pa.scalar("insert"), pa.scalar("delete")),
        "commit": pa.array([f"mv-e{epoch}"] * n),
        "epoch": pa.array([epoch] * n, type=pa.int64()),
        "seq": pa.array([0] * n, type=pa.int64()),
        "lang": pa.array(["view"] * n),
        "content": content,
    }
    for names, live in ((a_names, a_live), (b_names, b_live)):
        for name in names:
            if name == "content":
                continue
            col = t[name]
            out[name] = pc.if_else(live, col,
                                   pa.nulls(n, type=col.type))
    out["a_live"] = pc.cast(a_live, pa.int8())
    out["b_live"] = pc.cast(b_live, pa.int8())
    return pa.table(out)


def _base_snapshot(lake_root: str, version, cols, inner: bool):
    """Base-side snapshot for a view build: a plain lake read, or — when
    the base is ITSELF a join-view lake (``inner=True``) — its INNER
    projection (rows live on both sides), which is the base's visible
    relation for composition."""
    if not inner:
        return read_snapshot(lake_root, version=version,
                             columns=_KEYS + list(cols))
    ds = read_snapshot(lake_root, version=version,
                       columns=_KEYS + list(cols) + ["a_live", "b_live"])

    def f(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        m = pc.and_(pc.equal(t["a_live"], pa.scalar(1, pa.int8())),
                    pc.equal(t["b_live"], pa.scalar(1, pa.int8())))
        return t.filter(m).select(_KEYS + list(cols))

    return ds.map_batches(f, batch_format="pyarrow")


def _base_diff(lake_root: str, from_version: int, to_version, cols,
               inner: bool):
    """Base-side changelog for a view refresh, as keys + ``change`` +
    new values (null on delete).  With ``inner=True`` the base is a
    join-view lake and the changelog is re-expressed against its INNER
    projection: a stored row whose presence flags flip away from
    (1, 1) becomes a DELETE of the visible relation, a flip toward it
    an INSERT — detected via ``snapshot_diff(any_value_change=True)``
    because flag/b-payload changes leave content_sha untouched."""
    if not inner:
        return snapshot_diff(lake_root, from_version, to_version,
                             value_cols=tuple(cols))
    d = snapshot_diff(lake_root, from_version, to_version,
                      value_cols=(*cols, "a_live", "b_live"),
                      any_value_change=True)

    def reexpress(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()

        def live(prefix: str):
            return pc.and_(
                pc.equal(pc.fill_null(t[f"{prefix}a_live"], 0),
                         pa.scalar(1, pa.int8())),
                pc.equal(pc.fill_null(t[f"{prefix}b_live"], 0),
                         pa.scalar(1, pa.int8())))

        new_p = pc.and_(pc.not_equal(t["change"], "delete"), live(""))
        old_p = pc.and_(pc.not_equal(t["change"], "insert"), live("old_"))
        change = pc.if_else(
            pc.and_(new_p, old_p), pa.scalar("update"),
            pc.if_else(new_p, pa.scalar("insert"), pa.scalar("delete")))
        out = {k: t[k] for k in _KEYS}
        out["change"] = change
        for c in cols:
            out[c] = pc.if_else(new_p, t[c],
                                pa.nulls(t.num_rows, type=t[c].type))
        res = pa.table(out)
        return res.filter(pc.or_(new_p, old_p))

    return d.map_batches(reexpress, batch_format="pyarrow")


def _view_epoch(store_a: LakeStore, store_b: LakeStore,
                version_a: int | None, version_b: int | None) -> tuple:
    va = store_a.current_version() if version_a is None else version_a
    vb = store_b.current_version() if version_b is None else version_b
    return va, vb, va + vb


def materialize_join_view(
    lake_a: str,
    lake_b: str,
    view_cfg: EngineConfig,
    version_a: int | None = None,
    version_b: int | None = None,
    columns_a=("content",),
    columns_b=("content",),
    inner_a: bool = False,
    inner_b: bool = False,
):
    """Initial build: full outer join of the two base snapshots, written
    as insert events at epoch = version_a + version_b.  ``columns_a`` /
    ``columns_b`` select each side's payload columns (see
    ``_mapped_names`` for the view-lake naming); ``inner_a``/``inner_b``
    mark a base that is itself a join-view lake, composing against its
    INNER projection.  Returns the IngestResult of the view commit."""
    from ..stages.join import hash_join
    from .ingest import ingest

    va, vb, epoch = _view_epoch(LakeStore(lake_a), LakeStore(lake_b),
                                version_a, version_b)
    a_map, b_map = _mapped_names(columns_a, columns_b)
    ta = _payload_types(lake_a, columns_a)
    tb = _payload_types(lake_b, columns_b)
    a = _base_snapshot(lake_a, va, columns_a, inner_a)
    b = _base_snapshot(lake_b, vb, columns_b, inner_b)

    def tag(m, flag):
        def _t(t: pa.Table) -> pa.Table:
            t = t.rename_columns(
                [m.get(c, c) for c in t.column_names])
            return t.append_column(flag, pa.array([True] * t.num_rows))
        return _t

    key_fields = [(k, pa.string()) for k in _KEYS]
    sa = pa.schema(key_fields + [(a_map[c], ta[c]) for c in columns_a]
                   + [("a_live", pa.bool_())])
    sb = pa.schema(key_fields + [(b_map[c], tb[c]) for c in columns_b]
                   + [("b_live", pa.bool_())])
    joined = hash_join(
        a.map_batches(tag(a_map, "a_live"), batch_format="pyarrow"),
        b.map_batches(tag(b_map, "b_live"), batch_format="pyarrow"),
        on=_KEYS, how="outer", left_schema=sa, right_schema=sb,
        num_partitions=view_cfg.num_partitions,
    )
    events = joined.map_batches(
        _state_to_events, batch_format="pyarrow",
        fn_kwargs={"epoch": epoch, "a_names": list(a_map.values()),
                   "b_names": list(b_map.values())})
    return ingest(events, view_cfg,
                  schema_changes=_view_schema_changes(ta, tb, a_map, b_map),
                  count_input=False)


def refresh_join_view(
    lake_a: str,
    lake_b: str,
    view_cfg: EngineConfig,
    from_version_a: int,
    from_version_b: int,
    to_version_a: int | None = None,
    to_version_b: int | None = None,
    columns_a=("content",),
    columns_b=("content",),
    inner_a: bool = False,
    inner_b: bool = False,
):
    """Incremental refresh from the two base changelogs.

    Topology (everything O(changed), never O(view)):

    1. two ``snapshot_diff`` changelogs — O(changed base partitions);
    2. one outer join of the changelogs — O(touched keys);
    3. touched VIEW partition ids (the engine partitioner over touched
       keys, deduped per batch; at most ``num_partitions`` ints reach
       the driver — a partition PLAN, not data);
    4. stored state read of ONLY those partitions, LEFT-joined under
       the touched keys (untouched keys in the same partitions drop out
       in the join);
    5. merge -> upsert/tombstone events at epoch va+vb -> ``ingest``,
       which rewrites only the partitions receiving events and fences a
       replay of the same refresh into a no-op.

    Because the view is itself a lake with its own changelog, view
    refreshes CASCADE: a second-level view over this view refreshes
    from THIS lake's snapshot_diff, so incremental maintenance
    propagates through arbitrarily deep view DAGs (test-pinned).
    """
    from ..functions.hashing import part_id_for
    from ..stages.join import hash_join
    from .ingest import ingest, load_partition_live

    va, vb, epoch = _view_epoch(LakeStore(lake_a), LakeStore(lake_b),
                                to_version_a, to_version_b)
    a_map, b_map = _mapped_names(columns_a, columns_b)
    ta = _payload_types(lake_a, columns_a)
    tb = _payload_types(lake_b, columns_b)
    da = _base_diff(lake_a, from_version_a, va, columns_a, inner_a)
    db = _base_diff(lake_b, from_version_b, vb, columns_b, inner_b)

    def proj(change_name: str, cols, m, pre: str):
        def _p(t: pa.Table) -> pa.Table:
            out = {k: t[k] for k in _KEYS}
            out[change_name] = t["change"]
            for c in cols:
                out[f"{pre}{m[c]}"] = t[c]  # new value; null on delete rows
            return pa.table(out)
        return _p

    key_fields = [(k, pa.string()) for k in _KEYS]
    da_s = pa.schema(key_fields + [("a_change", pa.string())]
                     + [(f"__n_{a_map[c]}", ta[c]) for c in columns_a])
    db_s = pa.schema(key_fields + [("b_change", pa.string())]
                     + [(f"__n_{b_map[c]}", tb[c]) for c in columns_b])
    delta = hash_join(
        da.map_batches(proj("a_change", columns_a, a_map, "__n_"),
                       batch_format="pyarrow"),
        db.map_batches(proj("b_change", columns_b, b_map, "__n_"),
                       batch_format="pyarrow"),
        on=_KEYS, how="outer", left_schema=da_s, right_schema=db_s,
        num_partitions=view_cfg.num_partitions,
    )

    # the delta feeds TWO consumers (the pid plan and the stored-state
    # join); Ray datasets are lazy and uncached, so without this the
    # whole diff+outer-join sub-plan executes twice.  The delta is
    # O(touched keys) — bounded, safe to pin.
    delta = delta.materialize()

    # --- touched view partitions: a bounded partition PLAN ---------------
    P = view_cfg.num_partitions

    def pids(t: pa.Table) -> pa.Table:
        ids = part_id_for(t["repo"], t["path"], P)
        return pa.table({"pid": pc.unique(ids)})

    touched = sorted({
        r["pid"] for r in delta.map_batches(
            pids, batch_format="pyarrow").take_all()
    })
    store = LakeStore(view_cfg.lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    latest = registry.latest_version
    reg_json = registry.to_json()
    payload = list(a_map.values()) + list(b_map.values())
    view_cols = _KEYS + payload + ["a_live", "b_live"]
    parts = [
        {"file": ps.file, "deltas": list(ps.deltas)}
        for pid, ps in manifest.partitions.items()
        if pid in set(touched) and (ps.file or ps.deltas)
    ]

    def load_part(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_ in zip(batch["file"].to_pylist(),
                           batch["deltas"].to_pylist()):
            t = load_partition_live(view_cfg.lake_root, f0,
                                    list(ds_ or []), reg, latest)
            out.append(t.select(view_cols))
        return pa.concat_tables(out)

    payload_types = {a_map[c]: ta[c] for c in columns_a}
    payload_types.update({b_map[c]: tb[c] for c in columns_b})
    stored_schema = pa.schema(
        key_fields + [(n, payload_types[n]) for n in payload]
        + [("a_live", pa.int8()), ("b_live", pa.int8())])
    if parts:
        stored = ray.data.from_items(parts).map_batches(
            load_part, batch_format="pyarrow", batch_size=1)
    else:
        stored = ray.data.from_arrow(pa.table(
            {f.name: pa.array([], type=f.type) for f in stored_schema}))
    merged = hash_join(
        delta, stored, on=_KEYS, how="left",
        left_schema=pa.schema(list(da_s) + [f for f in db_s
                                            if f.name not in _KEYS]),
        right_schema=stored_schema,
        num_partitions=max(8, len(touched) or 8),
    )
    a_names = list(a_map.values())
    b_names = list(b_map.values())

    def merge(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        touched_a = pc.is_valid(t["a_change"])
        touched_b = pc.is_valid(t["b_change"])
        stored_a = pc.equal(pc.fill_null(t["a_live"], 0),
                            pa.scalar(1, pa.int8()))
        stored_b = pc.equal(pc.fill_null(t["b_live"], 0),
                            pa.scalar(1, pa.int8()))
        a_live = pc.if_else(touched_a,
                            pc.not_equal(t["a_change"], "delete"), stored_a)
        b_live = pc.if_else(touched_b,
                            pc.not_equal(t["b_change"], "delete"), stored_b)
        out = {k: t[k] for k in _KEYS}
        for names, flag in ((a_names, touched_a), (b_names, touched_b)):
            for n in names:
                out[n] = pc.if_else(flag, t[f"__n_{n}"], t[n])
        out["a_live"] = a_live
        out["b_live"] = b_live
        return pa.table(out)

    events = merged.map_batches(merge, batch_format="pyarrow").map_batches(
        _state_to_events, batch_format="pyarrow",
        fn_kwargs={"epoch": epoch, "a_names": a_names, "b_names": b_names})
    return ingest(events, view_cfg, count_input=False)


def read_join_view(view_root: str,
                   columns_a=("content",),
                   columns_b=("content",)) -> "ray.data.Dataset":
    """INNER rows of the materialized view: keys + the mapped payload
    columns, filtered to keys live on both sides."""
    from .ingest import read_lake

    a_map, b_map = _mapped_names(columns_a, columns_b)
    payload = list(a_map.values()) + list(b_map.values())
    ds = read_lake(view_root, columns=_KEYS + payload + ["a_live", "b_live"])

    def inner(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        m = pc.and_(pc.equal(t["a_live"], pa.scalar(1, pa.int8())),
                    pc.equal(t["b_live"], pa.scalar(1, pa.int8())))
        return t.filter(m).select(_KEYS + payload)

    return ds.map_batches(inner, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Aggregate (per-repo stats) view materialized as a lake


#: the aggregate view's payload columns (count/sum are abelian, so the
#: refresh is stored + delta per touched key)
STATS_SCHEMA_CHANGES = [
    SchemaChange(epoch=0, change="add_column", column="n_files",
                 type_name="int64", default=0),
    SchemaChange(epoch=0, change="add_column", column="total_size",
                 type_name="int64", default=0),
]

_DELTA_PARTS = 64


def _stats_rows_to_events(t: pa.Table, epoch: int) -> pa.Table:
    """(repo, n_files, total_size) -> one upsert per live repo, one
    tombstone per repo whose file count dropped to zero."""
    from ..functions.threads import single_threaded_kernels

    single_threaded_kernels()
    live = pc.greater(t["n_files"], 0)
    n = t.num_rows
    return pa.table({
        "repo": t["repo"],
        "path": pa.array([""] * n),
        "op": pc.if_else(live, pa.scalar("insert"), pa.scalar("delete")),
        "commit": pa.array([f"sv-e{epoch}"] * n),
        "epoch": pa.array([epoch] * n, type=pa.int64()),
        "seq": pa.array([0] * n, type=pa.int64()),
        "lang": pa.array(["stats"] * n),
        "content": pc.if_else(live, pa.scalar("", pa.large_string()),
                              pa.nulls(n, type=pa.large_string())),
        "n_files": t["n_files"].cast(pa.int64()),
        "total_size": t["total_size"].cast(pa.int64()),
    })


def _coarse_repo_sum(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Sum (repo, n_files, total_size) rows per repo inside coarse
    repo-hash partitions, KEEPING net-zero-file rows (a size-only delta
    is still a delta — unlike history._stats_final, which drops
    fully-deleted repos from a final state)."""
    from ..functions.text import fingerprint_column

    def add_part(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        t = t.replace_schema_metadata(None)
        h = (fingerprint_column(t["repo"]).to_numpy(zero_copy_only=False)
             .view(np.uint64))
        return t.append_column(
            "sp", pa.array((h % np.uint64(_DELTA_PARTS)).astype(np.int64)))

    def final(df):
        out = df.groupby("repo", sort=False).agg(
            n_files=("n_files", "sum"), total_size=("total_size", "sum")
        ).reset_index()
        return out.astype({"n_files": "int64", "total_size": "int64"})

    return (ds.map_batches(add_part, batch_format="pyarrow",
                           batch_size=65536)
            .groupby("sp").map_groups(final, batch_format="pandas"))


def materialize_stats_view(
    base_lake: str,
    view_cfg: EngineConfig,
    version: int | None = None,
    key: str = "repo",
    size_col: str = "size",
):
    """Initial build of the per-repo aggregate view lake from a base
    snapshot.  Returns the IngestResult of the view commit."""
    from .history import repo_stats_snapshot
    from .ingest import ingest

    v = (LakeStore(base_lake).current_version()
         if version is None else version)
    stats = repo_stats_snapshot(base_lake, version=v, key=key,
                                size_col=size_col)
    events = stats.map_batches(
        lambda t: _stats_rows_to_events(
            t.replace_schema_metadata(None), epoch=v),
        batch_format="pyarrow")
    return ingest(events, view_cfg, schema_changes=STATS_SCHEMA_CHANGES,
                  count_input=False)


def refresh_stats_view(
    base_lake: str,
    view_cfg: EngineConfig,
    from_version: int,
    to_version: int | None = None,
    key: str = "repo",
    size_col: str = "size",
):
    """Incremental refresh of the aggregate view lake from the base
    changelog: per-repo abelian deltas (O(changed rows)) sum in coarse
    repo-hash partitions, the touched VIEW partitions resolve as a
    bounded partition plan, and stored + delta upserts (or tombstones at
    zero files) ingest at epoch = base version — fenced, so a replayed
    refresh is a no-op.  Never reads the base lake or untouched view
    partitions."""
    import pandas as pd

    from ..functions.hashing import part_id_for
    from ..stages.join import hash_join
    from .ingest import ingest, load_partition_live

    v = (LakeStore(base_lake).current_version()
         if to_version is None else to_version)
    diff = snapshot_diff(base_lake, from_version, v, value_cols=(size_col,))

    def deltas(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        df = t.to_pandas()
        ins = (df["change"] != "delete").astype("int64")
        rem = (df["change"] != "insert").astype("int64")
        d = pd.DataFrame({
            "repo": df[key],
            "n_files": ins - rem,
            "total_size": (df[size_col].fillna(0).astype("int64") * ins
                           - df[f"old_{size_col}"].fillna(0).astype("int64")
                           * rem),
        }).groupby("repo", sort=False).sum().reset_index()
        return pa.Table.from_pandas(d, preserve_index=False)

    # two consumers (pid plan + merge join) — pin the bounded delta so
    # the changelog sub-plan executes once (see refresh_join_view)
    delta = _coarse_repo_sum(
        diff.map_batches(deltas, batch_format="pyarrow")).materialize()

    P = view_cfg.num_partitions

    def pids(t: pa.Table) -> pa.Table:
        t = t.replace_schema_metadata(None)
        ids = part_id_for(t["repo"], pa.array([""] * t.num_rows), P)
        return pa.table({"pid": pc.unique(ids)})

    touched = sorted({
        r["pid"] for r in delta.map_batches(
            pids, batch_format="pyarrow").take_all()
    })
    store = LakeStore(view_cfg.lake_root)
    manifest = store.load_manifest()
    registry = store.load_registry()
    reg_json = registry.to_json()
    latest = registry.latest_version
    parts = [
        {"file": ps.file, "deltas": list(ps.deltas)}
        for pid, ps in manifest.partitions.items()
        if pid in set(touched) and (ps.file or ps.deltas)
    ]

    def load_part(batch: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        reg = SchemaRegistry.from_json(reg_json)
        out = []
        for f0, ds_ in zip(batch["file"].to_pylist(),
                           batch["deltas"].to_pylist()):
            t = load_partition_live(view_cfg.lake_root, f0,
                                    list(ds_ or []), reg, latest)
            out.append(pa.table({
                "repo": t["repo"],
                "__sn": t["n_files"].cast(pa.int64()),
                "__ss": t["total_size"].cast(pa.int64()),
            }))
        return pa.concat_tables(out)

    empty_stored = pa.table({"repo": pa.array([], pa.string()),
                             "__sn": pa.array([], pa.int64()),
                             "__ss": pa.array([], pa.int64())})
    stored = (ray.data.from_items(parts).map_batches(
        load_part, batch_format="pyarrow", batch_size=1)
        if parts else ray.data.from_arrow(empty_stored))
    merged = hash_join(
        delta, stored, on=["repo"], how="left",
        left_schema=pa.schema([("repo", pa.string()),
                               ("n_files", pa.int64()),
                               ("total_size", pa.int64())]),
        right_schema=empty_stored.schema,
        num_partitions=max(8, len(touched) or 8),
    )

    def merge(t: pa.Table) -> pa.Table:
        from ..functions.threads import single_threaded_kernels

        single_threaded_kernels()
        return pa.table({
            "repo": t["repo"],
            "n_files": pc.add(pc.fill_null(t["__sn"], 0),
                              t["n_files"].cast(pa.int64())),
            "total_size": pc.add(pc.fill_null(t["__ss"], 0),
                                 t["total_size"].cast(pa.int64())),
        })

    events = merged.map_batches(merge, batch_format="pyarrow").map_batches(
        _stats_rows_to_events, batch_format="pyarrow",
        fn_kwargs={"epoch": v})
    return ingest(events, view_cfg, count_input=False)


def read_stats_view(view_root: str) -> "ray.data.Dataset":
    """Live aggregate view rows: (repo, n_files, total_size)."""
    from .ingest import read_lake

    ds = read_lake(view_root, columns=["repo", "n_files", "total_size"])
    return ds.map_batches(
        lambda t: t.select(["repo", "n_files", "total_size"]),
        batch_format="pyarrow")
