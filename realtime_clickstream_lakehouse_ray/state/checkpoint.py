"""Per-job checkpoint manifests with per-partition lineage records.

The reference's resumability is the Spark Structured Streaming checkpoint
directory + Glue job bookmark (/root/reference/etl/glue_stream.py:344,
infra/terraform/modules/glue/main.tf:90): work that was committed is never
reprocessed.  The engine's equivalent for batch maintenance jobs:

- a maintenance job has a **deterministic job id** (op name + parent
  version + params), so a rerun of an interrupted job resolves to the same
  checkpoint directory ``<table>/_checkpoints/<job_id>/``;
- each unit of work (a compaction bin, a merge file-rewrite, a z-order
  partition) writes a **lineage record** — input files, output files, rows,
  bytes, min/max ``n_tok``, token sum — to ``unit-<id>.json`` *from inside
  the Ray task/actor*, atomically, as soon as the unit's output file is
  durably written.  A resumed job skips units whose record exists and
  reuses their recorded outputs (the output files themselves are written
  to deterministic per-unit paths via temp + rename, so a half-written
  file from a crash is invisible);
- the final snapshot commit is tagged with the job id; if the commit
  already exists the whole job is a no-op (idempotent resume).
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path
from typing import Any


class JobCheckpoint:
    def __init__(self, table_root: str | os.PathLike, job_id: str):
        self.job_id = job_id
        self.dir = Path(table_root) / "_checkpoints" / job_id

    def unit_path(self, unit_id: str | int) -> Path:
        return self.dir / f"unit-{unit_id}.json"

    def read_unit(self, unit_id: str | int) -> dict[str, Any] | None:
        p = self.unit_path(unit_id)
        if not p.is_file():
            return None
        try:
            return json.loads(p.read_text())
        except (json.JSONDecodeError, OSError):
            return None  # torn write from a crash -> redo the unit

    def write_unit(self, unit_id: str | int, record: dict[str, Any]) -> None:
        """Atomically persist a unit's lineage record (idempotent overwrite)."""
        self.dir.mkdir(parents=True, exist_ok=True)
        tmp = self.dir / f".tmp-{uuid.uuid4().hex}"
        tmp.write_text(json.dumps(record))
        os.replace(tmp, self.unit_path(unit_id))

    def list_units(self) -> dict[str, dict[str, Any]]:
        if not self.dir.is_dir():
            return {}
        out = {}
        for p in sorted(self.dir.glob("unit-*.json")):
            try:
                out[p.stem.removeprefix("unit-")] = json.loads(p.read_text())
            except (json.JSONDecodeError, OSError):
                continue
        return out

    def mark_committed(self, version: int) -> None:
        self.dir.mkdir(parents=True, exist_ok=True)
        (self.dir / "COMMITTED").write_text(str(version))

    def committed_version(self) -> int | None:
        p = self.dir / "COMMITTED"
        if p.is_file():
            return int(p.read_text())
        return None
