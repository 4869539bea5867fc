"""Multi-table catalog: a name -> table-root registry, the engine's analog
of the reference's Glue Data Catalog registration
(/root/reference/infra/terraform/modules/glue/main.tf:130-182 registers the
Delta table under a database/table name so every consumer resolves it by
NAME, not path).

One JSON file (``catalog.json``) under the catalog root; writes go through
the same atomic temp+rename the snapshot log uses, so a reader never sees
a torn registry.  Tables created THROUGH the catalog live under
``<catalog_root>/<name>/`` and are recorded with a relative root (the
whole catalog directory stays relocatable — copy it anywhere and every
name still resolves); pre-existing tables register with their absolute
root.  The registry is deliberately last-write-wins for concurrent
REGISTRY edits (a deployment has one catalog administrator); per-TABLE
commit safety stays with each table's own optimistic snapshot log.
"""

from __future__ import annotations

import json
import re
from pathlib import Path
from typing import TYPE_CHECKING

from realtime_clickstream_lakehouse_ray.state.log import atomic_replace

if TYPE_CHECKING:  # pragma: no cover
    from realtime_clickstream_lakehouse_ray.pipelines.table import Table

_NAME = re.compile(r"^[A-Za-z_][A-Za-z0-9_\-]*$")


class Catalog:
    """Name -> Table resolution over a ``catalog.json`` registry."""

    def __init__(self, root: str):
        self.root = Path(root)
        self.path = self.root / "catalog.json"

    # -- registry I/O ------------------------------------------------------
    def _read(self) -> dict[str, str]:
        if not self.path.is_file():
            return {}
        return json.loads(self.path.read_text()).get("tables", {})

    def _write(self, tables: dict[str, str]) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        atomic_replace(self.path, json.dumps({"tables": dict(sorted(tables.items()))}))

    def _resolve(self, root: str) -> Path:
        p = Path(root)
        return p if p.is_absolute() else self.root / p

    # -- surface -----------------------------------------------------------
    def list_tables(self) -> list[str]:
        return sorted(self._read())

    def create_table(self, name: str, **kwargs) -> "Table":
        """Create a table under ``<catalog_root>/<name>/`` and register it
        (relative root -> the catalog stays relocatable).  ``kwargs`` pass
        through to ``Table.create`` (schema, stats_cols, ...)."""
        from realtime_clickstream_lakehouse_ray.pipelines.table import Table

        if not _NAME.match(name):
            raise ValueError(f"invalid table name {name!r}")
        tables = self._read()
        if name in tables:
            raise ValueError(f"table {name!r} already exists in the catalog")
        t = Table.create(str(self.root / name), **kwargs)
        tables[name] = name  # relative root
        self._write(tables)
        return t

    def register(self, name: str, table_root: str) -> None:
        """Register an EXISTING table (created elsewhere) under a name —
        the external-table form of the Glue registration."""
        from realtime_clickstream_lakehouse_ray.pipelines.table import Table

        if not _NAME.match(name):
            raise ValueError(f"invalid table name {name!r}")
        tables = self._read()
        if name in tables:
            raise ValueError(f"table {name!r} already exists in the catalog")
        Table.load(table_root)  # must be a real table, fail loudly here
        tables[name] = str(Path(table_root).resolve())
        self._write(tables)

    def table(self, name: str) -> "Table":
        from realtime_clickstream_lakehouse_ray.pipelines.table import Table

        tables = self._read()
        if name not in tables:
            raise KeyError(
                f"unknown table {name!r} (catalog has: {sorted(tables)})"
            )
        return Table.load(str(self._resolve(tables[name])))

    def sql(
        self,
        query: str,
        where: dict[str, str] | None = None,
        threads: int | None = None,
    ) -> "pa.Table":  # noqa: F821 - forward ref, pyarrow imported lazily
        """Multi-table ad-hoc SQL: every catalog table is a view under its
        registered name (snapshot-pruned, column-mapped, DV-filtered —
        pipelines/sqlread.py).  ``where`` gives per-table pushdown
        conjunctions, e.g. ``{"docs": "source = 'web'"}``."""
        from realtime_clickstream_lakehouse_ray.pipelines.sqlread import (
            catalog_sql,
        )

        return catalog_sql(self, query, where=where, threads=threads)

    def create_table_as(
        self,
        name: str,
        query: str,
        key_col: str,
        partition_col: str,
        where: dict[str, str] | None = None,
        threads: int | None = None,
        **table_kwargs,
    ) -> "Table":
        """CTAS (``CREATE TABLE name AS SELECT ...``): run multi-table SQL
        over the catalog and materialize the result as a NEW catalog table
        — the consumer-sized derived-table workflow (result flows through
        the driver; pipeline-scale derivations belong in Ray Data
        pipelines + ``Table.append``).  The result schema becomes the
        table schema; ``key_col`` / ``partition_col`` must name result
        columns (every engine table is key-addressed and partitioned)."""
        result = self.sql(query, where=where, threads=threads)
        for col, what in ((key_col, "key_col"), (partition_col, "partition_col")):
            if col not in result.column_names:
                raise ValueError(
                    f"{what} {col!r} is not a column of the CTAS result "
                    f"(has: {result.column_names})"
                )
        t = self.create_table(
            name,
            schema=result.schema,
            key_col=key_col,
            partition_col=partition_col,
            **table_kwargs,
        )
        if result.num_rows:
            t.append(result)
        return t

    def drop(self, name: str, delete_files: bool = False) -> None:
        """Unregister ``name``; with ``delete_files=True`` also remove the
        table directory (Glue DROP TABLE vs DROP TABLE PURGE)."""
        tables = self._read()
        if name not in tables:
            raise KeyError(f"unknown table {name!r}")
        root = self._resolve(tables.pop(name))
        self._write(tables)
        if delete_files:
            import shutil

            shutil.rmtree(root, ignore_errors=True)
