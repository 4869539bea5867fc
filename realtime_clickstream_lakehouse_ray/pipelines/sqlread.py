"""Ad-hoc SQL over a lakehouse table snapshot — the engine's analog of the
reference's primary CONSUMER path, arbitrary SQL via Athena over the Delta
table (reference README.md:113, docs/architecture.md ``Athena -->|Query|
S3``; filter pushdown for such readers enabled at etl/glue_stream.py:301).

Architecture (deliberately Athena-shaped): the ENGINE plans — snapshot
resolution (version / timestamp / tag time travel), manifest-level file
pruning (partition values, n_tok range, generic col_stats, key
range+Bloom) through the same ``_plan_snapshot_files`` planner ``scan``
uses, column-mapping translation, deletion-vector anti-join and
partition-evolution row filters — and a local DuckDB instance EXECUTES the
relational plan directly over the pruned Parquet file list (multithreaded,
with DuckDB's own row-group-statistics pushdown inside each file).  No
table bytes flow through Ray or the driver's Python heap; DuckDB streams
the files itself, so the read path scales with the pruned file count
exactly like the reference's Athena scans scale with partition pruning.

Pushdown is fed two ways, both optional and both correctness-neutral:

- an explicit ``where=`` conjunction (the engine's DML grammar,
  functions/predicate.py) is planner-authoritative: it prunes files AND is
  re-applied row-level inside the registered view, so the SQL text itself
  need not repeat it;
- otherwise the TOP-LEVEL ``WHERE`` clause of the query is auto-extracted
  and, when it parses under the conjunctive grammar, used for file pruning
  only (the query re-evaluates it anyway — a parse failure just means no
  manifest pruning, never a wrong answer).

This is the single-node consumer surface; the distributed read path for
pipeline-scale work remains ``Table.scan`` + Ray Data.
"""

from __future__ import annotations

import re
from typing import TYPE_CHECKING, Any

import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    from realtime_clickstream_lakehouse_ray.pipelines.table import Table

# top-level WHERE body: everything up to the next top-level clause keyword
_WHERE_RE = re.compile(
    r"\bWHERE\b(?P<body>.*?)(?=\bGROUP\s+BY\b|\bORDER\s+BY\b|\bLIMIT\b"
    r"|\bHAVING\b|\bWINDOW\b|\bQUALIFY\b|\bUNION\b|\bINTERSECT\b"
    r"|\bEXCEPT\b|$)",
    re.IGNORECASE | re.DOTALL,
)


def extract_pushdown_where(query: str) -> str | None:
    """Best-effort: the query's single top-level WHERE conjunction, IF it
    parses under the engine's conjunctive DML grammar.  Conservative by
    construction — more than one WHERE (subqueries), OR-groups, functions
    or arithmetic all return None, which only disables manifest pruning
    (DuckDB still evaluates the real predicate)."""
    from realtime_clickstream_lakehouse_ray.functions.predicate import (
        parse_predicate,
    )

    matches = list(_WHERE_RE.finditer(query))
    if len(matches) != 1:
        return None
    body = matches[0].group("body").strip().rstrip(";").strip()
    if not body:
        return None
    try:
        parse_predicate(body)
    except ValueError:
        return None
    return body


def _duck_type(t: pa.DataType) -> str:
    """Arrow type -> DuckDB type name, for typed-NULL projections of
    columns added by schema evolution after every planned file was
    written."""
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return _duck_type(t.value_type) + "[]"
    if pa.types.is_timestamp(t):
        return "TIMESTAMP"
    m = {
        "bool": "BOOLEAN",
        "int8": "TINYINT",
        "int16": "SMALLINT",
        "int32": "INTEGER",
        "int64": "BIGINT",
        "uint8": "UTINYINT",
        "uint16": "USMALLINT",
        "uint32": "UINTEGER",
        "uint64": "UBIGINT",
        "float": "FLOAT",
        "double": "DOUBLE",
        "string": "VARCHAR",
        "large_string": "VARCHAR",
        "binary": "BLOB",
        "large_binary": "BLOB",
        "date32[day]": "DATE",
    }
    s = str(t)
    if s in m:
        return m[s]
    raise ValueError(f"no DuckDB type mapping for arrow type {t}")


def _sql_literal(v: Any) -> str:
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def conds_to_sql(conds: list[dict]) -> str:
    """Parsed conjunction -> SQL text (logical column names) — the inverse
    of ``parse_predicate``, used to re-apply an explicit ``where=`` inside
    the registered view."""
    parts = []
    for c in conds:
        col, op, v = f'"{c["column"]}"', c["op"], c["value"]
        if op == "in":
            parts.append(f"{col} IN ({', '.join(_sql_literal(x) for x in v)})")
        elif op == "is_null":
            parts.append(f"{col} IS NULL")
        elif op == "is_not_null":
            parts.append(f"{col} IS NOT NULL")
        else:
            parts.append(f"{col} {op} {_sql_literal(v)}")
    return " AND ".join(parts)


def _paths_sql(paths: list[str]) -> str:
    return "[" + ", ".join(_sql_literal(p) for p in paths) + "]"


def plan_sql_view(
    table: "Table",
    query: str,
    version: int | None = None,
    as_of: float | None = None,
    tag: str | None = None,
    where: str | None = None,
) -> dict:
    """The ENGINE half of ``Table.sql``: resolve + prune the snapshot and
    emit the view DDL (or an empty typed relation).  Returned dict is the
    EXPLAIN surface: planned file list, total file count, parsed pushdown
    conds, DV sidecars, and the view SQL itself."""
    eff_where = where if where is not None else extract_pushdown_where(query)
    resolved = version
    if tag is not None:
        resolved = table.log.resolve_ref(tag)
    elif as_of is not None:
        resolved = table.log.version_at(as_of)
    total = len(table.files(resolved))
    try:
        files, conds, part_row_filter = table._plan_snapshot_files(
            version=version, as_of=as_of, tag=tag, where=eff_where
        )
    except ValueError:
        if where is not None:
            raise  # an explicit where= must be valid
        # auto-extracted text that parses but references non-table names
        # (e.g. a DuckDB SELECT-alias in WHERE): drop the pushdown
        eff_where = None
        files, conds, part_row_filter = table._plan_snapshot_files(
            version=version, as_of=as_of, tag=tag
        )
    mapping = table.column_mapping
    paths = [str(table.root / f.path) for f in files]
    dv_paths = sorted({str(table.root / f.dv) for f in files if f.dv})
    plan: dict = {
        "files": [f.path for f in files],
        "n_files": len(files),
        "n_files_snapshot": total,
        "conds": conds,
        "pushdown_where": eff_where,
        "dv_files": dv_paths,
    }
    if not paths:
        return plan

    scan = f"parquet_scan({_paths_sql(paths)}, union_by_name=true)"
    proj = []
    # union_by_name null-fills per-file gaps; a column no planned file has
    # at all needs an explicit typed NULL — probe the union schema lazily
    # in table_sql (DESCRIBE) via the placeholder below
    for f in table.schema:
        phys = mapping.get(f.name, f.name)
        proj.append((phys, f.name, _duck_type(f.type)))
    inner_where = ""
    if dv_paths:
        # merge-on-read tombstones: scan-identical semantics (scan drops
        # the UNION of the planned files' DV keys from every file)
        key = table.key_col
        inner_where = (
            f' WHERE "{key}" NOT IN '
            f'(SELECT "{key}" FROM parquet_scan({_paths_sql(dv_paths)}))'
        )
    outer = []
    if where is not None and conds:
        # explicit where= is planner-authoritative: re-apply row-level so
        # the SQL text need not repeat it (auto-extracted conds are already
        # in the query and are NOT re-applied)
        outer.append(conds_to_sql(conds))
    if part_row_filter is not None:
        vals = ", ".join(_sql_literal(v) for v in part_row_filter)
        outer.append(f'"{table.partition_col}" IN ({vals})')
    outer_where = f" WHERE {' AND '.join(outer)}" if outer else ""
    plan["view_scan"] = scan
    plan["view_projection"] = proj
    plan["view_inner_where"] = inner_where
    plan["view_outer_where"] = outer_where
    return plan


def register_snapshot_view(
    con,
    table: "Table",
    name: str,
    query: str = "",
    version: int | None = None,
    as_of: float | None = None,
    tag: str | None = None,
    where: str | None = None,
) -> dict:
    """Plan + register one table snapshot as DuckDB view ``name`` on an
    existing connection; returns the plan (``sql_explain`` shape).
    ``query`` is only consulted for best-effort WHERE auto-extraction —
    pass the empty string to skip it (multi-table callers must: an
    unqualified predicate of a join query binds per SQL scoping rules,
    not to every view)."""
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", name):
        raise ValueError(f"view name {name!r} must be a bare identifier")
    plan = plan_sql_view(
        table, query, version=version, as_of=as_of, tag=tag, where=where
    )
    if not plan["files"]:
        empty = table.schema.empty_table()
        con.register(f"__empty_snapshot_{name}", empty)
        con.execute(
            f'CREATE TEMP VIEW "{name}" AS '
            f'SELECT * FROM __empty_snapshot_{name}'
        )
        return plan
    cols = {
        r[0]
        for r in con.execute(
            f"DESCRIBE SELECT * FROM {plan['view_scan']}"
        ).fetchall()
    }
    proj = ", ".join(
        (
            f'"{phys}" AS "{logical}"'
            if phys in cols
            else f'CAST(NULL AS {dtype}) AS "{logical}"'
        )
        for phys, logical, dtype in plan["view_projection"]
    )
    con.execute(
        f'CREATE TEMP VIEW "{name}" AS SELECT * FROM ('
        f"SELECT {proj} FROM {plan['view_scan']}"
        f"{plan['view_inner_where']}){plan['view_outer_where']}"
    )
    return plan


def table_sql(
    table: "Table",
    query: str,
    name: str = "t",
    version: int | None = None,
    as_of: float | None = None,
    tag: str | None = None,
    where: str | None = None,
    threads: int | None = None,
) -> pa.Table:
    """Run ``query`` against the snapshot, exposed as view ``name``.
    Returns a pyarrow Table (ad-hoc results are consumer-sized; the
    distributed path for pipeline-scale reads stays ``Table.scan``)."""
    import os

    import duckdb

    con = duckdb.connect()
    try:
        con.execute(f"PRAGMA threads={int(threads or os.cpu_count() or 8)}")
        register_snapshot_view(
            con, table, name, query=query,
            version=version, as_of=as_of, tag=tag, where=where,
        )
        return con.execute(query).fetch_arrow_table()
    finally:
        con.close()


def catalog_sql(
    catalog,
    query: str,
    where: dict[str, str] | None = None,
    threads: int | None = None,
) -> pa.Table:
    """Multi-table ad-hoc SQL over a ``Catalog``: every registered table
    becomes a view under its catalog NAME (the Athena-over-Glue-Catalog
    consumer shape — README.md:113 + glue/main.tf:130-182 in the
    reference).  ``where`` maps table names to per-table conjunctive
    pushdown predicates (applied with full manifest pruning AND re-applied
    row-level); the query's own WHERE is never auto-extracted here — an
    unqualified predicate in a join query binds by SQL scoping rules, not
    to every view, so per-table pushdown must be explicit."""
    import os

    import duckdb

    where = where or {}
    unknown = set(where) - set(catalog.list_tables())
    if unknown:
        raise KeyError(f"where= names unknown table(s) {sorted(unknown)}")
    con = duckdb.connect()
    try:
        con.execute(f"PRAGMA threads={int(threads or os.cpu_count() or 8)}")
        for name in catalog.list_tables():
            register_snapshot_view(
                con, catalog.table(name), name, where=where.get(name)
            )
        return con.execute(query).fetch_arrow_table()
    finally:
        con.close()
