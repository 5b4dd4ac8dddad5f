"""Epoch-fenced manifest commits — the exactly-once sink protocol.

The reference gets idempotence by truncate-before-run + control-file
resume (``FileControl.py:382-389``, ``utility_classes.py:26-100``); a
distributed engine cannot truncate, so commits are *manifest-as-commit*
(SURVEY.md §7.4 #1):

- data files are written under deterministic names
  ``data/part=<p>/e<applied_through>-<content_hash16>.parquet`` — a
  retried task rewrites byte-identical content to the same name, so
  at-least-once task execution is harmless;
- only files listed in the current manifest are live; the manifest is
  published by atomic rename of a CURRENT pointer;
- each partition records ``applied_through_epoch`` — its fence.  A
  replayed event with epoch <= fence is skipped by the applier, which is
  what makes replay from any checkpoint reconverge (LWW + fence =>
  idempotent).

Lake layout (local FS here; an object store / shared FS on a cluster —
the protocol only needs atomic rename on the small CURRENT file):

    lake_root/
      _manifests/CURRENT, manifest-<version>.json
      _schema/registry.json
      _lineage/log.jsonl          # append-only per-commit lineage+metrics
      data/part=<p>/e<..>-<hash>.parquet
      deadletter/<ingest_id>/...
"""

from __future__ import annotations

import json
import os
import tempfile
import time
from dataclasses import dataclass, field

from ..functions.hashing import PARTITIONER_ID
from ..schema import SchemaRegistry


@dataclass
class PartitionState:
    part_id: int
    file: str | None = None  # base file, relative to lake_root; None = empty
    rows: int = 0  # -1 = unknown (merge-on-read partition with live deltas)
    applied_through_epoch: int = -1
    content_hash: str = ""
    schema_version: int = 0
    #: merge-on-read delta files (epoch order); live state = LWW(base ∪ deltas)
    deltas: list = field(default_factory=list)
    #: pruning stats: column -> [min, max] zone map (int/float columns)
    #: or {"in": [...]} dictionary (low-cardinality string columns).
    #: CONSERVATIVE semantics: a
    #: missing column (or empty dict — e.g. manifests written before the
    #: field existed, or maintenance rewrites that skip stats) means
    #: "unknown, cannot prune", never "empty".  MOR deltas WIDEN the
    #: interval (tombstoned rows may leave it wider than the live data —
    #: still a valid over-approximation; the next CoW rewrite tightens).
    stats: dict = field(default_factory=dict)

    def all_files(self) -> list:
        return ([self.file] if self.file else []) + list(self.deltas)

    def to_json(self) -> dict:
        return {
            "part_id": self.part_id,
            "file": self.file,
            "rows": self.rows,
            "applied_through_epoch": self.applied_through_epoch,
            "content_hash": self.content_hash,
            "schema_version": self.schema_version,
            "deltas": list(self.deltas),
            # range stats are 2-lists, dictionary stats are {"in": [...]}
            "stats": {
                k: (dict(v) if isinstance(v, dict) else list(v))
                for k, v in sorted(self.stats.items())
            },
        }

    @staticmethod
    def from_json(d: dict) -> "PartitionState":
        return PartitionState(
            part_id=int(d["part_id"]),
            file=d.get("file"),
            rows=int(d.get("rows", 0)),
            applied_through_epoch=int(d.get("applied_through_epoch", -1)),
            content_hash=d.get("content_hash", ""),
            schema_version=int(d.get("schema_version", 0)),
            deltas=list(d.get("deltas", [])),
            stats=dict(d.get("stats", {})),
        )


@dataclass
class Manifest:
    version: int = 0
    num_partitions: int = 32
    partitions: dict = field(default_factory=dict)  # part_id -> PartitionState
    metrics: dict = field(default_factory=dict)
    #: key->partition function identity (engine ABI guard).  Manifests
    #: written before the field existed used crc32 — absent means that.
    partitioner: str = PARTITIONER_ID

    def part(self, part_id: int) -> PartitionState:
        return self.partitions.get(part_id, PartitionState(part_id=part_id))

    def live_files(self) -> list[str]:
        out = []
        for p in self.partitions.values():
            out.extend(p.all_files())
        return out

    def has_deltas(self) -> bool:
        return any(p.deltas for p in self.partitions.values())

    def applied_through(self, part_id: int) -> int:
        return self.part(part_id).applied_through_epoch

    def to_json(self) -> str:
        return json.dumps(
            {
                "version": self.version,
                "num_partitions": self.num_partitions,
                "partitioner": self.partitioner,
                "partitions": {str(k): v.to_json() for k, v in sorted(self.partitions.items())},
                "metrics": self.metrics,
            },
            indent=1,
        )

    @staticmethod
    def from_json(s: str) -> "Manifest":
        d = json.loads(s)
        m = Manifest(version=int(d["version"]), num_partitions=int(d.get("num_partitions", 32)),
                     partitioner=d.get("partitioner", "crc32"))
        m.partitions = {
            int(k): PartitionState.from_json(v) for k, v in d.get("partitions", {}).items()
        }
        m.metrics = d.get("metrics", {})
        return m


def _atomic_write(path: str, data: str) -> None:
    d = os.path.dirname(path)
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, prefix=".tmp-")
    with os.fdopen(fd, "w") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic on POSIX


class LakeStore:
    """Filesystem-level manifest/registry/lineage operations for one lake."""

    def __init__(self, lake_root: str):
        self.root = lake_root
        self.manifest_dir = os.path.join(lake_root, "_manifests")
        self.current_path = os.path.join(self.manifest_dir, "CURRENT")
        self.registry_path = os.path.join(lake_root, "_schema", "registry.json")
        self.lineage_path = os.path.join(lake_root, "_lineage", "log.jsonl")

    # -- manifest --------------------------------------------------------
    def current_version(self) -> int:
        try:
            with open(self.current_path) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def load_manifest(self, version: int | None = None) -> Manifest:
        """Current manifest, or a historical one (time travel: every
        manifest version is retained and data files are immutable +
        content-addressed, so any past snapshot remains readable).

        Transparently reads both formats: legacy single-file manifests
        (format 1, every partition inline) and sharded manifests
        (format 2: a small index referencing content-addressed shard
        files, each holding one partition range)."""
        v = self.current_version() if version is None else version
        if v == 0:
            return Manifest(version=0)
        with open(os.path.join(self.manifest_dir, f"manifest-{v:06d}.json")) as f:
            d = json.loads(f.read())
        if d.get("format", 1) < 2:
            return Manifest.from_json(json.dumps(d))
        m = Manifest(
            version=int(d["version"]), num_partitions=int(d.get("num_partitions", 32)),
            partitioner=d.get("partitioner", "crc32"),
        )
        m.metrics = d.get("metrics", {})
        for ref in d.get("shards", {}).values():
            with open(os.path.join(self.manifest_dir, ref["file"])) as f:
                shard = json.loads(f.read())
            for k, ps in shard.items():
                m.partitions[int(k)] = PartitionState.from_json(ps)
        return m

    def _load_index(self, version: int) -> dict | None:
        """Raw index dict of a sharded manifest version (None if legacy/empty)."""
        if version == 0:
            return None
        try:
            with open(os.path.join(self.manifest_dir, f"manifest-{version:06d}.json")) as f:
                d = json.loads(f.read())
        except FileNotFoundError:
            return None
        return d if d.get("format", 1) >= 2 else None

    def rollback(self, to_version: int) -> None:
        """Atomically point CURRENT at an older manifest — the
        restore-from-checkpoint operation.  Later manifests stay on disk
        (roll-forward possible until the next commit reuses their version
        numbers); subsequent ingests fence against the restored manifest
        and re-applying the missing epochs reconverges (LWW idempotence)."""
        if to_version > self.current_version():
            raise ValueError(f"cannot roll back forward to {to_version}")
        path = os.path.join(self.manifest_dir, f"manifest-{to_version:06d}.json")
        if to_version != 0 and not os.path.exists(path):
            raise FileNotFoundError(path)
        _atomic_write(self.current_path, str(to_version))
        # release version claims above the restored point: roll-forward
        # commits REUSE those version numbers (see publish's CAS claim)
        claims_dir = os.path.join(self.manifest_dir, "claims")
        if os.path.isdir(claims_dir):
            for f in os.listdir(claims_dir):
                if f.startswith("v") and int(f[1:]) > to_version:
                    os.unlink(os.path.join(claims_dir, f))
        self.append_lineage({"op": "rollback", "manifest_version": to_version})

    # -- tags: named snapshot refs ------------------------------------
    # A tag pins a manifest version under a stable name: time travel by
    # name, and `expire_snapshots` never reclaims a tagged version (the
    # Iceberg tag/retention analog).  Manifest version NUMBERS are
    # reused after rollback + roll-forward (see `rollback`), so a tag
    # also records the manifest file's content sha and `resolve_ref`
    # refuses a tag whose target was rewritten — the same
    # state-identity discipline the token index and projections use.
    # Tag writes are operator-level metadata ops (read-modify-write of
    # one small refs.json, atomic rename), not racing the data path.

    def _refs_path(self) -> str:
        return os.path.join(self.manifest_dir, "refs.json")

    def _manifest_sha(self, version: int) -> str:
        import hashlib

        path = os.path.join(self.manifest_dir, f"manifest-{version:06d}.json")
        with open(path, "rb") as f:
            return hashlib.sha256(f.read()).hexdigest()

    def tags(self) -> dict:
        """{name: {"version": int, "sha": str}} for every tag."""
        try:
            with open(self._refs_path()) as f:
                return json.loads(f.read())
        except FileNotFoundError:
            return {}

    def set_tag(self, name: str, version: int | None = None) -> dict:
        """Tag ``version`` (default: current) as ``name``.  Tags are
        immutable — re-tagging an existing name raises; delete first."""
        v = self.current_version() if version is None else int(version)
        if v < 1:
            raise ValueError("cannot tag the empty version 0")
        refs = self.tags()
        if name in refs:
            raise ValueError(f"tag {name!r} already exists (tags are "
                             "immutable; delete_tag first)")
        refs[name] = {"version": v, "sha": self._manifest_sha(v)}
        _atomic_write(self._refs_path(), json.dumps(refs, sort_keys=True))
        self.append_lineage({"op": "set_tag", "tag": name,
                             "manifest_version": v})
        return refs[name]

    def delete_tag(self, name: str) -> None:
        refs = self.tags()
        if name not in refs:
            raise KeyError(name)
        del refs[name]
        _atomic_write(self._refs_path(), json.dumps(refs, sort_keys=True))
        self.append_lineage({"op": "delete_tag", "tag": name})

    def resolve_ref(self, ref: "int | str") -> int:
        """Version number for a ref: an int / digit-string IS a version;
        anything else is a tag name.  A tag whose target manifest was
        rewritten (version reuse after rollback + roll-forward) raises
        instead of silently reading different data."""
        if isinstance(ref, int):
            return ref
        if isinstance(ref, str) and ref.isdigit():
            return int(ref)
        refs = self.tags()
        if ref not in refs:
            raise KeyError(f"unknown tag {ref!r}")
        entry = refs[ref]
        v = int(entry["version"])
        if self._manifest_sha(v) != entry["sha"]:
            raise RuntimeError(
                f"tag {ref!r} points at manifest v{v} whose content was "
                "rewritten (rollback + roll-forward reused the version); "
                "refusing to read a different snapshot under the old name"
            )
        return v

    def resolve_as_of(self, ts: float) -> int:
        """Manifest version that was CURRENT at wall-clock time ``ts``
        (Iceberg's snapshot-as-of-timestamp): the last lineage entry at
        or before ``ts`` that moved CURRENT — ingest/maintenance
        publishes AND rollbacks (so a rollback window resolves to the
        rolled-back-to version, exactly what a reader at that moment
        saw).  expire_snapshots entries don't move CURRENT and are
        skipped.  Raises if ``ts`` predates the first commit or if the
        resolved manifest has since been expired."""
        best_v, best_ts = None, None
        for rec in self.read_lineage():
            if rec.get("op") == "expire_snapshots":
                continue
            if "manifest_version" not in rec:
                continue
            rts = float(rec.get("ts", 0.0))
            if rts <= ts and (best_ts is None or rts >= best_ts):
                best_ts, best_v = rts, int(rec["manifest_version"])
        if best_v is None:
            raise KeyError(
                f"no snapshot existed at ts={ts} (first commit is later)")
        if not os.path.exists(os.path.join(
                self.manifest_dir, f"manifest-{best_v:06d}.json")):
            raise RuntimeError(
                f"snapshot v{best_v} (as of ts={ts}) has been expired")
        return best_v

    #: shard fan-out of the partition map: shard_size = ceil(P / SHARD_FAN);
    #: at the 64Ki-partition target that is 64 shards of 1024 entries, and a
    #: commit touching K partitions rewrites <= K shard files + one index
    #: instead of one O(P) blob (single-writer O(P)-rewrite was the round-1
    #: scale hazard).
    SHARD_FAN = 64

    def publish(
        self,
        manifest: Manifest,
        expect_version: int | None = None,
        changed_parts: "set[int] | None" = None,
        stage: bool = False,
    ) -> None:
        """Write the sharded manifest (index + changed shards), then flip
        CURRENT atomically.

        ``expect_version`` is an optimistic-concurrency fence: publishing
        fails if another committer advanced CURRENT since we read it
        (single-writer per lake is the normal mode; this guards mistakes).
        ``changed_parts``: part_ids modified since ``expect_version`` —
        only their shards are serialized and written, every other shard
        reuses the prior version's content-addressed file.  When omitted,
        all shards are serialized and deduplicated by content hash
        (correct, O(P) serialize, still O(changed) disk writes).

        ``stage=True`` (write-audit-publish): everything is written
        EXCEPT the CURRENT flip — readers keep seeing the old snapshot
        until ``commit_staged``; ``abort_staged`` discards.  A staged
        version is exclusive with direct commits (both would claim
        version CURRENT+1; single-writer discipline, same as rollback's
        roll-forward window).
        """
        if expect_version is not None and self.current_version() != expect_version:
            raise RuntimeError(
                f"manifest conflict: CURRENT={self.current_version()} != expected {expect_version}"
            )
        if expect_version is not None:
            # the version check above is check-then-act: two committers
            # inside the window both pass it and would clobber each
            # other's manifest-N.json.  The REAL CAS is an O_EXCL claim
            # file per version — exactly one committer creates it, the
            # loser gets the same 'manifest conflict' and retries against
            # the fresh manifest.  rollback releases claims above the
            # restored version (roll-forward reuses version numbers) and
            # abort_staged releases its own; a committer that CRASHED
            # between claim and CURRENT-flip leaves a stale claim —
            # rollback(current_version()) is the documented release.
            claim = os.path.join(self.manifest_dir, "claims",
                                 f"v{manifest.version:06d}")
            os.makedirs(os.path.dirname(claim), exist_ok=True)
            try:
                fd = os.open(claim, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.close(fd)
            except FileExistsError:
                raise RuntimeError(
                    f"manifest conflict: version {manifest.version} already "
                    f"claimed by another committer "
                    f"(CURRENT={self.current_version()}); a crashed claimant "
                    f"is released by rollback(current_version())"
                ) from None
        try:
            self._write_manifest(manifest, expect_version, changed_parts, stage)
        except BaseException:
            # a claim followed by a FAILED write would otherwise leave a
            # phantom claim: every retry of this version hits 'manifest
            # conflict' until a manual rollback.  Release it — the claim
            # protected nothing yet (CURRENT never flipped).  A committer
            # that CRASHES between claim and flip still leaves a stale
            # claim (documented: rollback(current_version()) releases).
            if expect_version is not None:
                try:
                    os.unlink(os.path.join(self.manifest_dir, "claims",
                                           f"v{manifest.version:06d}"))
                except OSError:
                    pass
            raise

    def _write_manifest(
        self,
        manifest: Manifest,
        expect_version: int | None,
        changed_parts: "set[int] | None",
        stage: bool,
    ) -> None:
        prior_index = (
            self._load_index(expect_version) if expect_version is not None else None
        )
        prior_shards: dict = (prior_index or {}).get("shards", {})
        shard_size = max(1, -(-manifest.num_partitions // self.SHARD_FAN))
        by_shard: dict[int, dict] = {}
        for pid, ps in manifest.partitions.items():
            by_shard.setdefault(pid // shard_size, {})[pid] = ps
        dirty = (
            None
            if changed_parts is None
            else {pid // shard_size for pid in changed_parts}
        )
        shards_out: dict[str, dict] = {}
        for sid in sorted(by_shard):
            prior = prior_shards.get(str(sid))
            if (
                dirty is not None
                and sid not in dirty
                and prior is not None
                and prior.get("shard_size") == shard_size
            ):
                shards_out[str(sid)] = prior  # untouched: reuse prior file
                continue
            body = json.dumps(
                {str(k): by_shard[sid][k].to_json() for k in sorted(by_shard[sid])},
                indent=1,
            )
            sha12 = __import__("hashlib").sha256(body.encode()).hexdigest()[:12]
            rel = os.path.join("shards", f"s{sid:05d}-{sha12}.json")
            ref = {"file": rel, "sha": sha12, "shard_size": shard_size}
            if not (prior is not None and prior.get("sha") == sha12):
                abspath = os.path.join(self.manifest_dir, rel)
                if not os.path.exists(abspath):  # content-addressed: reuse
                    _atomic_write(abspath, body)
            shards_out[str(sid)] = ref
        index = {
            "format": 2,
            "version": manifest.version,
            "num_partitions": manifest.num_partitions,
            "partitioner": manifest.partitioner,
            "metrics": manifest.metrics,
            "shards": shards_out,
        }
        path = os.path.join(self.manifest_dir, f"manifest-{manifest.version:06d}.json")
        _atomic_write(path, json.dumps(index, indent=1))
        if not stage:
            _atomic_write(self.current_path, str(manifest.version))

    def commit_staged(self, version: int) -> None:
        """Flip CURRENT to a previously staged manifest version (the
        'publish' of write-audit-publish).  Strictly linear: only
        CURRENT+1 may be committed, and the staged index must exist."""
        cur = self.current_version()
        if version != cur + 1:
            raise RuntimeError(
                f"cannot commit staged version {version}: CURRENT={cur} "
                "(only CURRENT+1 is committable)"
            )
        path = os.path.join(self.manifest_dir, f"manifest-{version:06d}.json")
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        _atomic_write(self.current_path, str(version))
        self.append_lineage({"op": "wap_publish", "manifest_version": version})

    def abort_staged(self, version: int) -> None:
        """Discard a staged manifest: unlink its index so no snapshot
        references it.  Data/shard files it introduced become
        unreferenced and are reclaimed by the next ``expire_snapshots``
        (content-addressed files may be shared with live snapshots, so
        referenced-set subtraction — not eager deletion — is the only
        safe rule)."""
        cur = self.current_version()
        if version <= cur:
            raise RuntimeError(
                f"version {version} is published (CURRENT={cur}); "
                "use rollback, not abort_staged"
            )
        path = os.path.join(self.manifest_dir, f"manifest-{version:06d}.json")
        if os.path.exists(path):
            os.unlink(path)
        claim = os.path.join(self.manifest_dir, "claims", f"v{version:06d}")
        if os.path.exists(claim):
            os.unlink(claim)  # the aborted version number is reusable
        self.append_lineage({"op": "wap_abort", "manifest_version": version})

    # -- schema registry -------------------------------------------------
    def load_registry(self) -> SchemaRegistry:
        try:
            with open(self.registry_path) as f:
                return SchemaRegistry.from_json(f.read())
        except FileNotFoundError:
            return SchemaRegistry()

    def save_registry(self, reg: SchemaRegistry) -> None:
        _atomic_write(self.registry_path, reg.to_json())

    # -- lineage ---------------------------------------------------------
    def append_lineage(self, record: dict) -> None:
        os.makedirs(os.path.dirname(self.lineage_path), exist_ok=True)
        record = dict(record, ts=time.time())
        with open(self.lineage_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def read_lineage(self) -> list[dict]:
        try:
            with open(self.lineage_path) as f:
                return [json.loads(line) for line in f if line.strip()]
        except FileNotFoundError:
            return []

    # -- paths -----------------------------------------------------------
    def abspath(self, rel: str) -> str:
        return os.path.join(self.root, rel)

    def data_file_rel(self, part_id: int, applied_through: int, content_hash: str) -> str:
        return os.path.join(
            "data", f"part={part_id:05d}", f"e{applied_through:010d}-{content_hash[:16]}.parquet"
        )
