"""JSON snapshot log: the engine-owned equivalent of Delta's ``_delta_log``.

The reference delegates its transaction log / snapshot isolation / time
travel to the Delta 1.2 JAR (``format("delta")`` at
/root/reference/etl/glue_stream.py:341, README.md:83,176,194).  This module
implements those capabilities natively on a plain filesystem:

- one JSON file per version under ``<table>/_log/<version:014d>.json``,
  holding ``add`` / ``remove`` file actions with per-file stats
  (partition, rows, bytes, min/max ``n_tok``, min/max ``doc_id``, token sum);
- **atomic, optimistic commit**: the version file is published with
  ``os.link`` (fails if the version already exists -> ``CommitConflict``),
  giving single-winner semantics for concurrent writers;
- **snapshot isolation**: readers resolve a version's complete file list by
  replaying actions from the latest *base* (consolidated) snapshot; writers
  never mutate committed data files (copy-on-write);
- **manifest rewrite**: any version can be consolidated in place into an
  equivalent base snapshot (same state, full file list) — used on its own
  (``Table.rewrite_manifests``) and by snapshot expiry so that the oldest
  retained version stays readable after older log files are deleted.

All of this is tiny driver-side metadata (file stats, not data); the data
plane stays in Ray Data pipelines.
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import asdict, dataclass
from pathlib import Path
from typing import Any, Iterable


class CommitConflict(RuntimeError):
    """Another writer committed this version first (optimistic-concurrency loss)."""


@dataclass
class FileEntry:
    """Stats for one committed data file (the engine's manifest row)."""

    path: str  # relative to the table root
    partition: str
    rows: int
    bytes: int
    min_n_tok: int | None = None
    max_n_tok: int | None = None
    min_key: str | None = None
    max_key: str | None = None
    sum_tok: int | None = None
    # merge-on-read deletion vector: path of a parquet sidecar holding the
    # file's tombstoned keys (Delta/Iceberg DV analog, key-addressed), and
    # how many keys it holds.  None = no deletes pending on this file.
    dv: str | None = None
    dv_rows: int = 0
    # clustering provenance: the signature (curve + dims) of the zorder job
    # that wrote this file, None for unclustered writers — what incremental
    # zorder uses to cluster only new data (liquid-clustering direction).
    clustered: str | None = None
    # optional generic per-column [min, max] stats (PHYSICAL column name ->
    # [lo, hi]) for the table's configured stats_cols — what scan(where=)
    # prunes arbitrary-column predicates with (Delta dataSkippingNumIndexed
    # analog).  None for tables that configure none (the common case).
    col_stats: dict | None = None
    # partition-spec id (Iceberg partition evolution): index into the
    # table's partition_specs history under which this file was written.
    # 0 = the creation spec, so pre-evolution manifests load unchanged.
    spec: int = 0
    # per-file key Bloom filter (bytes). NOT serialized into the JSON
    # snapshot — it rides a parquet sidecar (`_blooms/`, see Table) so the
    # manifest stays small at 10^12-row scale.
    bloom: bytes | None = None

    def to_action(self, op: str = "add") -> dict[str, Any]:
        d = asdict(self)
        d.pop("bloom", None)
        if d.get("dv") is None:  # keep the common-case action compact
            d.pop("dv", None)
            d.pop("dv_rows", None)
        if d.get("clustered") is None:
            d.pop("clustered", None)
        if d.get("col_stats") is None:
            d.pop("col_stats", None)
        if not d.get("spec"):  # spec 0 is the overwhelming common case
            d.pop("spec", None)
        d["op"] = op
        return d

    @staticmethod
    def from_action(a: dict[str, Any]) -> "FileEntry":
        return FileEntry(**{k: v for k, v in a.items() if k != "op"})


def atomic_write_new(path: Path, text: str) -> None:
    """Write ``text`` to ``path`` atomically, failing if ``path`` exists."""
    tmp = path.parent / f".tmp-{uuid.uuid4().hex}"
    tmp.write_text(text)
    try:
        os.link(tmp, path)  # atomic publish; raises FileExistsError on race
    finally:
        tmp.unlink(missing_ok=True)


def atomic_replace(path: Path, text: str) -> None:
    """Atomically replace ``path`` (used only for semantic no-op rewrites)."""
    tmp = path.parent / f".tmp-{uuid.uuid4().hex}"
    tmp.write_text(text)
    os.replace(tmp, path)


class SnapshotLog:
    def __init__(self, table_root: str | os.PathLike):
        self.root = Path(table_root)
        self.log_dir = self.root / "_log"

    # ---- read side -------------------------------------------------------

    def versions(self) -> list[int]:
        if not self.log_dir.is_dir():
            return []
        return sorted(
            int(p.stem) for p in self.log_dir.glob("*.json") if p.stem.isdigit()
        )

    def latest_version(self) -> int:
        vs = self.versions()
        return vs[-1] if vs else 0

    def _path(self, version: int) -> Path:
        return self.log_dir / f"{version:014d}.json"

    def read_version(self, version: int) -> dict[str, Any]:
        return json.loads(self._path(version).read_text())

    def snapshot(self, version: int | None = None) -> dict[str, Any]:
        """Resolve the full state at ``version``: replay from the latest base."""
        vs = self.versions()
        if version is None:
            version = vs[-1] if vs else 0
        if version == 0:
            return {"version": 0, "files": []}
        replay = [v for v in vs if v <= version]
        if not replay or replay[-1] != version:
            raise FileNotFoundError(
                f"version {version} not in log (retained: {replay or 'none'}); "
                "it may have been expired"
            )
        # find latest base <= version
        start = 0
        payloads: dict[int, dict] = {}
        for v in reversed(replay):
            payloads[v] = self.read_version(v)
            if payloads[v].get("base"):
                start = v
                break
        files: dict[str, dict] = {}
        for v in replay:
            if v < start:
                continue
            payload = payloads.get(v) or self.read_version(v)
            if payload.get("base"):
                files.clear()
            for a in payload["actions"]:
                if a["op"] == "add":
                    files[a["path"]] = a
                elif a["op"] == "remove":
                    files.pop(a["path"], None)
        return {"version": version, "files": list(files.values())}

    def files(self, version: int | None = None) -> list[FileEntry]:
        return [FileEntry.from_action(a) for a in self.snapshot(version)["files"]]

    def version_at(self, timestamp: float) -> int:
        """Timestamp time travel (Delta ``timestampAsOf``,
        /root/reference/README.md:176): the latest retained version whose
        commit timestamp is <= ``timestamp``.  Raises if the timestamp
        precedes every retained commit (matching Delta's behavior for a
        timestamp before table creation / outside retention)."""
        best: int | None = None
        for v in self.versions():
            ts = self.read_version(v).get("timestamp")
            if ts is not None and ts <= timestamp:
                best = v
        if best is None:
            raise FileNotFoundError(
                f"no retained commit at or before timestamp {timestamp}"
            )
        return best

    # ---- named refs (tags) -------------------------------------------------
    # Iceberg-style retention refs (the reference gets tags/branches from
    # Delta/Iceberg table metadata for free; README.md:176 claims PITR):
    # a tag pins a snapshot by name, and tagged snapshots survive
    # ``expire`` — the mechanism behind "keep the quarterly-audit snapshot
    # while retention rolls everything else off".

    def _refs_path(self) -> Path:
        return self.log_dir / "_refs.json"

    def refs(self) -> dict[str, int]:
        p = self._refs_path()
        if not p.is_file():
            return {}
        return {k: int(v) for k, v in json.loads(p.read_text()).items()}

    def set_ref(self, name: str, version: int) -> None:
        if not self._path(version).is_file():
            raise FileNotFoundError(f"cannot tag version {version}: not in log")
        refs = self.refs()
        refs[name] = int(version)
        atomic_replace(self._refs_path(), json.dumps(refs, sort_keys=True))

    def delete_ref(self, name: str) -> None:
        refs = self.refs()
        if name not in refs:
            raise KeyError(f"no such tag: {name!r}")
        del refs[name]
        atomic_replace(self._refs_path(), json.dumps(refs, sort_keys=True))

    def resolve_ref(self, name: str) -> int:
        refs = self.refs()
        if name not in refs:
            raise KeyError(f"no such tag: {name!r} (tags: {sorted(refs) or 'none'})")
        return refs[name]

    def find_commit_by_job(self, job_id: str) -> int | None:
        """Scan the retained log for a commit tagged with ``job_id`` (idempotence)."""
        for v in reversed(self.versions()):
            if self.read_version(v).get("job_id") == job_id:
                return v
        return None

    # ---- write side ------------------------------------------------------

    def commit(
        self,
        actions: Iterable[dict[str, Any]],
        operation: str,
        parent: int | None = None,
        job_id: str | None = None,
        base: bool = False,
        extra: dict[str, Any] | None = None,
        timestamp: float | None = None,
    ) -> int:
        """Publish the next version atomically; raise CommitConflict on race.

        ``parent`` (when given) enforces compare-and-swap semantics: the
        commit only succeeds as version ``parent + 1``, so a maintenance job
        planned against version P cannot clobber a concurrent commit.
        ``timestamp`` (driver-suppliable for deterministic tests, wall clock
        by default) is what ``version_at`` resolves timestamp time travel
        against.
        """
        import time as _time

        self.log_dir.mkdir(parents=True, exist_ok=True)
        latest = self.latest_version()
        if parent is None:
            parent = latest
        if parent != latest:
            raise CommitConflict(
                f"planned against version {parent} but log is at {latest}"
            )
        version = parent + 1
        payload = {
            "version": version,
            "parent": parent,
            "operation": operation,
            "job_id": job_id,
            "base": base,
            "timestamp": timestamp if timestamp is not None else _time.time(),
            "actions": list(actions),
        }
        if extra:
            payload.update(extra)
        try:
            atomic_write_new(self._path(version), json.dumps(payload))
        except FileExistsError as e:
            raise CommitConflict(f"version {version} was committed concurrently") from e
        return version

    def materialize_version(self, version: int) -> None:
        """Manifest rewrite: consolidate ``version`` in place into a base
        snapshot (identical state, full ``add`` list, no replay needed).

        The ingest bookmark (``source_files``, see ``pipelines/ingest.py``)
        is folded in as the union over every retained version up to
        ``version`` — snapshot expiry deletes those payloads, and without
        the fold a rerun would re-ingest their files (duplicate rows)."""
        snap = self.snapshot(version)
        old = self.read_version(version)
        src: set[str] = set()
        for v in self.versions():
            if v <= version:
                src.update(self.read_version(v).get("source_files", []))
        payload = {
            "version": version,
            "parent": old.get("parent", version - 1),
            "operation": old.get("operation"),
            "job_id": old.get("job_id"),
            "base": True,
            "consolidated": True,
            "timestamp": old.get("timestamp"),
            "actions": [dict(a, op="add") for a in snap["files"]],
        }
        if src:
            payload["source_files"] = sorted(src)
        atomic_replace(self._path(version), json.dumps(payload))

    def expire(
        self, keep_last: int | None = None, older_than: float | None = None
    ) -> list[int]:
        """Drop old log versions: keep the most recent ``keep_last``, or —
        Delta/Iceberg retention style — every version whose commit
        timestamp is >= ``older_than`` (UNIX seconds).  Both given =
        whichever retains MORE (the conservative intersection of the two
        expiry sets).  The latest version is always retained.

        The oldest retained version is first consolidated (manifest rewrite)
        so it stays readable without its expired ancestors.  TAGGED versions
        (named refs) are never expired: each tagged version below the cutoff
        is consolidated into a self-contained base snapshot first, so it
        stays readable as an island once its neighbors are deleted.  Returns
        the expired version numbers.  Data files referenced only by expired
        versions become orphans — ``Table.vacuum`` deletes them (it walks
        every retained version, so tagged islands keep their files pinned).
        """
        vs = self.versions()
        if keep_last is None and older_than is None:
            raise ValueError("pass keep_last= and/or older_than=")
        if keep_last is not None and keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cutoffs: list[int] = []
        if keep_last is not None:
            if len(vs) <= keep_last:
                return []
            cutoffs.append(vs[-keep_last])
        if older_than is not None:
            fresh = [
                v
                for v in vs
                if (self.read_version(v).get("timestamp") or 0.0) >= older_than
            ]
            cutoffs.append(min(fresh) if fresh else vs[-1])
        cutoff = min(cutoffs)
        if cutoff <= vs[0]:
            return []
        protected = {v for v in self.refs().values() if v in set(vs)}
        # consolidate ascending: each materialize replays from still-intact
        # ancestors, and earlier islands become bases for later replays
        for v in sorted(p for p in protected if p < cutoff):
            self.materialize_version(v)
        self.materialize_version(cutoff)
        expired = [v for v in vs if v < cutoff and v not in protected]
        for v in expired:
            self._path(v).unlink(missing_ok=True)
        return expired
