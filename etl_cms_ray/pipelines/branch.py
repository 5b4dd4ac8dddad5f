"""Lake branches: fork / multi-commit isolated writes / three-way merge.

Write-audit-publish (``ingest(stage=True)``) isolates exactly ONE
commit.  A branch generalizes it to a whole line of development — the
Iceberg/Nessie branch workflow, and the lake analog of the reference's
run-in-a-scratch-schema-then-swap pattern (the ETL loads into a fresh
CDM schema and the operator repoints consumers only when validation
passes; ``SQL/create_CDMv5_constraints.sql`` runs before the swap):

- ``create_branch``  — fork the current (or any tagged/historical)
  snapshot into ``<lake>/_branches/<name>``, a fully standalone lake
  root: every engine operation (ingest, audit, time travel, WAP,
  expectations, index build, even nested branches) works on it
  unchanged, because it IS a normal lake.
- Writes on the branch are invisible to the main lake by construction
  (separate manifest chain), multi-commit, and individually fenced —
  replay/exactly-once semantics hold inside the branch.
- ``merge_branch`` — three-way merge at partition granularity against
  the recorded fork base: partitions changed on exactly one side take
  that side; identical changes coalesce; true divergence is a CONFLICT
  (fail / ours / theirs).  Registry (schema) changes merge by the same
  3-way rule.  The merge itself is one ordinary optimistic-concurrency
  manifest publish on the main lake — atomic, lineage-logged, and
  idempotent (re-merging with no new branch commits is a no-op).

Storage: data files are immutable and content-addressed, so the fork
COPIES NO DATA — every live file is hard-linked into the branch root
(O(live files) metadata ops; the POSIX expression of snapshot sharing).
Deleting either side later is safe: the filesystem's link count is the
reference count, so main's ``expire_snapshots`` never dangles a branch
read and ``delete_branch`` is a plain rmtree.  On an object store the
same design uses server-side copy (S3 CopyObject is metadata-only
within a bucket class) or shared absolute URIs plus a cross-ref vacuum
union; the manifest format is unchanged either way.

Scale: fork is O(live files) namespace ops and O(P) small JSON; merge
reads NO data files — it compares per-partition manifest states
(content hashes) and links the taken files, i.e. O(P) metadata plus
O(changed files) link ops, regardless of row volume.
"""

from __future__ import annotations

import json
import os
import shutil

from ..state.manifest import LakeStore, Manifest

#: branch namespace inside a lake root
_BRANCH_DIR = "_branches"
#: fork metadata file inside a branch root
_FORK_FILE = "FORK.json"
#: branch-side tag pinning the fork base against expire_snapshots
FORK_BASE_TAG = "__fork_base__"


def branch_root(lake_root: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid branch name {name!r}")
    return os.path.join(lake_root, _BRANCH_DIR, name)


def _link_file(src_root: str, dst_root: str, rel: str) -> None:
    """Hard-link one immutable content-addressed file across lake roots
    (copy fallback for filesystems without links).  An existing
    destination is the SAME content by the naming invariant — skip."""
    src = os.path.join(src_root, rel)
    dst = os.path.join(dst_root, rel)
    if os.path.exists(dst):
        return
    os.makedirs(os.path.dirname(dst), exist_ok=True)
    try:
        os.link(src, dst)
    except OSError:
        shutil.copy2(src, dst)


def _read_fork(broot: str) -> dict:
    with open(os.path.join(broot, _FORK_FILE)) as f:
        return json.loads(f.read())


def create_branch(lake_root: str, name: str, at: "int | str | None" = None) -> dict:
    """Fork snapshot ``at`` (default: current; accepts a version or tag)
    into a standalone branch lake under ``<lake>/_branches/<name>``.

    Returns the fork record.  The fork base version is tagged inside
    the branch (``__fork_base__``) so branch-side ``expire_snapshots``
    cannot reclaim the three-way merge base.
    """
    main = LakeStore(lake_root)
    v = main.resolve_ref(at) if at is not None else main.current_version()
    if v < 1:
        raise ValueError("cannot branch an empty lake (no committed snapshot)")
    broot = branch_root(lake_root, name)
    if os.path.exists(broot):
        raise ValueError(f"branch {name!r} already exists")
    manifest = main.load_manifest(version=v)
    bs = LakeStore(broot)
    try:
        for rel in manifest.live_files():
            _link_file(lake_root, broot, rel)
        # the branch manifest is byte-regenerated (not file-copied): same
        # version number, partitions and fences, its own shard files
        bs.publish(manifest)
        reg_json = None
        if os.path.exists(main.registry_path):
            from ..state.manifest import _atomic_write

            reg_json = open(main.registry_path).read()
            _atomic_write(bs.registry_path, reg_json)
        fork = {
            "branch": name,
            "base_version": v,
            "base_sha": main._manifest_sha(v),
            "base_registry": reg_json,
            "merged_into": None,
        }
        with open(os.path.join(broot, _FORK_FILE), "w") as f:
            f.write(json.dumps(fork, indent=1))
        bs.set_tag(FORK_BASE_TAG, v)
    except BaseException:
        shutil.rmtree(broot, ignore_errors=True)  # no half-forked branches
        raise
    bs.append_lineage({"op": "branch_fork", "from": lake_root,
                       "manifest_version": v})
    main.append_lineage({"op": "branch_create", "branch": name,
                         "manifest_version": v})
    return fork


def list_branches(lake_root: str) -> list[dict]:
    d = os.path.join(lake_root, _BRANCH_DIR)
    out = []
    if not os.path.isdir(d):
        return out
    for name in sorted(os.listdir(d)):
        broot = os.path.join(d, name)
        if not os.path.isfile(os.path.join(broot, _FORK_FILE)):
            continue
        fork = _read_fork(broot)
        out.append({
            "name": name,
            "base_version": fork["base_version"],
            "head_version": LakeStore(broot).current_version(),
            "merged_into": fork.get("merged_into"),
        })
    return out


def delete_branch(lake_root: str, name: str) -> None:
    """Remove a branch lake.  Always safe: shared files are hard links,
    so the main lake's copies (and other branches') survive."""
    broot = branch_root(lake_root, name)
    if not os.path.isfile(os.path.join(broot, _FORK_FILE)):
        raise KeyError(f"no branch {name!r} under {lake_root}")
    shutil.rmtree(broot)
    LakeStore(lake_root).append_lineage({"op": "branch_delete", "branch": name})


def merge_branch(lake_root: str, name: str, strategy: str = "fail") -> dict:
    """Three-way merge of branch ``name`` into the main lake.

    Per partition, against the fork-base state (compared as serialized
    ``PartitionState`` — content hashes, fences, deltas, stats):

    - changed on the branch only  → take the branch state,
    - changed on main only        → keep main,
    - changed identically on both → keep (coalesces),
    - diverged on both            → conflict: ``strategy`` decides —
      ``fail`` raises with the partition ids, ``ours`` keeps main,
      ``theirs`` takes the branch.

    The schema registry merges by the same rule (branch-changed adopts
    the branch registry; both-changed-differently fails regardless of
    ``strategy`` — schema is not partition-local, a silent pick would
    corrupt typed reads).

    Publishes ONE new manifest version on main under the optimistic
    claim (``expect_version``), links taken files in, and records the
    merge in both lineages.  Fast-forward (main never advanced) is the
    degenerate case with zero main-side changes.  Re-merging without
    new branch commits produces no partition changes and is skipped
    (idempotent).
    """
    if strategy not in ("fail", "ours", "theirs"):
        raise ValueError(f"unknown merge strategy {strategy!r}")
    main = LakeStore(lake_root)
    broot = branch_root(lake_root, name)
    if not os.path.isfile(os.path.join(broot, _FORK_FILE)):
        raise KeyError(f"no branch {name!r} under {lake_root}")
    bs = LakeStore(broot)
    fork = _read_fork(broot)
    base = bs.load_manifest(version=bs.resolve_ref(FORK_BASE_TAG))
    head_b = bs.load_manifest()
    cur_m = main.current_version()
    head_m = main.load_manifest()
    if (head_m.num_partitions, head_m.partitioner) != (
            head_b.num_partitions, head_b.partitioner):
        raise RuntimeError(
            "merge refused: partitioning diverged between main and branch "
            f"({head_m.num_partitions}/{head_m.partitioner} vs "
            f"{head_b.num_partitions}/{head_b.partitioner})")

    all_pids = set(base.partitions) | set(head_b.partitions) | set(head_m.partitions)
    taken: dict[int, object] = {}
    conflicts: list[int] = []
    for pid in sorted(all_pids):
        s0 = base.part(pid).to_json()
        sb = head_b.part(pid).to_json()
        sm = head_m.part(pid).to_json()
        changed_b, changed_m = sb != s0, sm != s0
        if not changed_b:
            continue  # keep main (changed there or not)
        if not changed_m or sb == sm:
            if sb != sm:
                taken[pid] = head_b.part(pid)
            continue
        conflicts.append(pid)
        if strategy == "theirs":
            taken[pid] = head_b.part(pid)
        # "ours": keep main's state; "fail" raises below
    if conflicts and strategy == "fail":
        raise RuntimeError(
            f"merge conflict: partitions {conflicts} changed on both main "
            f"and branch {name!r} since fork base v{fork['base_version']}; "
            "re-run with strategy='ours'/'theirs' or rebuild the branch")

    # schema registry: 3-way on the serialized form
    reg_0 = fork.get("base_registry")
    reg_m = open(main.registry_path).read() if os.path.exists(main.registry_path) else None
    reg_b = open(bs.registry_path).read() if os.path.exists(bs.registry_path) else None
    adopt_branch_registry = False
    if reg_b != reg_0:
        if reg_m == reg_0 or reg_m == reg_b:
            adopt_branch_registry = reg_m != reg_b
        else:
            raise RuntimeError(
                "merge conflict: schema registry changed on both sides "
                "since the fork; reconcile the registries explicitly")

    if not taken and not adopt_branch_registry:
        report = {"version": cur_m, "merged_partitions": 0,
                  "conflicts": conflicts, "strategy": strategy,
                  "fast_forward": False, "no_op": True}
        main.append_lineage({"op": "branch_merge", "branch": name, **report,
                             "manifest_version": cur_m})
        return report

    for pid, ps in taken.items():
        for rel in ps.all_files():
            _link_file(broot, lake_root, rel)
    merged = Manifest(version=cur_m + 1,
                      num_partitions=head_m.num_partitions,
                      partitioner=head_m.partitioner)
    merged.partitions = dict(head_m.partitions)
    merged.partitions.update(taken)
    merged.metrics = {
        "op": "branch_merge", "branch": name,
        "base_version": fork["base_version"],
        "branch_head_version": bs.current_version(),
        "merged_partitions": len(taken),
        "conflict_partitions": len(conflicts), "strategy": strategy,
    }
    # registry before publish (a crash between publish and registry
    # write would leave published data whose schema_version the registry
    # doesn't know); a FAILED publish restores the prior registry so an
    # abandoned merge cannot mutate main's schema (the linked-in data
    # files it leaves are content-addressed orphans — vacuum reclaims).
    if adopt_branch_registry:
        from ..state.manifest import _atomic_write

        _atomic_write(main.registry_path, reg_b)
    try:
        main.publish(merged, expect_version=cur_m, changed_parts=set(taken))
    except BaseException:
        if adopt_branch_registry:
            from ..state.manifest import _atomic_write

            if reg_m is None:
                try:
                    os.unlink(main.registry_path)
                except OSError:
                    pass
            else:
                _atomic_write(main.registry_path, reg_m)
        raise
    fork["merged_into"] = merged.version
    with open(os.path.join(broot, _FORK_FILE), "w") as f:
        f.write(json.dumps(fork, indent=1))
    report = {"version": merged.version, "merged_partitions": len(taken),
              "conflicts": conflicts, "strategy": strategy,
              "fast_forward": not any(
                  head_m.part(pid).to_json() != base.part(pid).to_json()
                  for pid in all_pids),
              "no_op": False}
    main.append_lineage({"op": "branch_merge", "branch": name,
                         "manifest_version": merged.version,
                         **{k: v for k, v in report.items() if k != "version"}})
    bs.append_lineage({"op": "branch_merged_out", "into_version": merged.version})
    return report
