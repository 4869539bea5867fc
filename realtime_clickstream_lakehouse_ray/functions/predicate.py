"""Safe conjunctive predicate strings for DML (``DELETE FROM ... WHERE`` /
``UPDATE ... WHERE`` — the reference-adjacent Delta capability beyond
key/partition/range args).

Grammar (deliberately tiny, rejected loudly otherwise):

    predicate := condition ( AND condition )*
    condition := ident op literal
               | ident IN ( literal, ... )
               | ident IS NULL | ident IS NOT NULL
    op        := = | != | <> | <= | >= | < | >
    literal   := 'single-quoted string' ('' escapes a quote)
               | integer | float | TRUE | FALSE

No OR / NOT / parenthesized groups / functions / arithmetic: DML planning
needs conjunctions it can prune files with, and a conjunction of simple
comparisons is what Delta's own stats-based DML pruning reasons about.
The parse result is a list of ``{"column", "op", "value"}`` dicts —
JSON-serializable so it rides the rewrite-unit specs unchanged.
"""

from __future__ import annotations

import re
from typing import Any

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_TOKEN = re.compile(
    r"""\s*(?:
        (?P<str>'(?:[^']|'')*')            # 'string' with '' escape
      | (?P<num>-?\d+(?:\.\d+)?)           # int / float
      | (?P<op><=|>=|<>|!=|=|<|>)
      | (?P<lparen>\()
      | (?P<rparen>\))
      | (?P<comma>,)
      | (?P<word>[A-Za-z_][A-Za-z0-9_]*)   # ident / AND / IN / IS / NOT / NULL
    )""",
    re.VERBOSE,
)

_OPS = {"=", "!=", "<>", "<=", ">=", "<", ">"}


def _tokens(s: str) -> list[tuple[str, str]]:
    out, pos = [], 0
    while pos < len(s):
        m = _TOKEN.match(s, pos)
        if m is None or m.end() == pos:
            rest = s[pos:].strip()
            if not rest:
                break
            raise ValueError(f"unparseable predicate at: {rest[:40]!r}")
        pos = m.end()
        kind = m.lastgroup
        out.append((kind, m.group(kind)))
    return out


def _literal(kind: str, text: str) -> Any:
    if kind == "str":
        return text[1:-1].replace("''", "'")
    if kind == "num":
        return float(text) if "." in text else int(text)
    if kind == "word":
        up = text.upper()
        if up == "TRUE":
            return True
        if up == "FALSE":
            return False
    raise ValueError(f"expected a literal, got {text!r}")


def parse_predicate(where: str) -> list[dict]:
    """Parse a conjunctive WHERE string into condition dicts.  Raises
    ``ValueError`` on anything outside the documented grammar (OR, NOT
    groups, functions, arithmetic)."""
    toks = _tokens(where)
    conds: list[dict] = []
    i = 0

    def expect_word(up: str) -> None:
        nonlocal i
        if i >= len(toks) or toks[i][0] != "word" or toks[i][1].upper() != up:
            got = toks[i][1] if i < len(toks) else "<end>"
            raise ValueError(f"expected {up}, got {got!r} in predicate")
        i += 1

    while i < len(toks):
        kind, text = toks[i]
        if kind != "word" or text.upper() in ("AND", "IN", "IS", "NOT", "NULL", "OR"):
            raise ValueError(f"expected a column name, got {text!r}")
        col = text
        i += 1
        if i >= len(toks):
            raise ValueError(f"dangling column {col!r} in predicate")
        kind, text = toks[i]
        if kind == "op":
            i += 1
            if i >= len(toks):
                raise ValueError(f"missing literal after {col} {text}")
            lk, lt = toks[i]
            i += 1
            op = "!=" if text == "<>" else text
            conds.append({"column": col, "op": op, "value": _literal(lk, lt)})
        elif kind == "word" and text.upper() == "IN":
            i += 1
            if i >= len(toks) or toks[i][0] != "lparen":
                raise ValueError(f"expected ( after {col} IN")
            i += 1
            vals: list[Any] = []
            while True:
                if i >= len(toks):
                    raise ValueError(f"unterminated IN list for {col}")
                lk, lt = toks[i]
                if lk == "rparen":
                    i += 1
                    break
                if lk == "comma":
                    i += 1
                    continue
                vals.append(_literal(lk, lt))
                i += 1
            if not vals:
                raise ValueError(f"empty IN list for {col}")
            conds.append({"column": col, "op": "in", "value": vals})
        elif kind == "word" and text.upper() == "IS":
            i += 1
            neg = False
            if i < len(toks) and toks[i][0] == "word" and toks[i][1].upper() == "NOT":
                neg = True
                i += 1
            expect_word("NULL")
            conds.append(
                {"column": col, "op": "is_not_null" if neg else "is_null", "value": None}
            )
        else:
            raise ValueError(f"expected an operator after {col!r}, got {text!r}")
        if i < len(toks):
            kind, text = toks[i]
            if kind == "word" and text.upper() == "OR":
                raise ValueError(
                    "OR is not supported in DML predicates (conjunctions "
                    "only — stats pruning reasons about AND of comparisons)"
                )
            expect_word("AND")
            if i >= len(toks):
                raise ValueError("dangling AND at end of predicate")
    if not conds:
        raise ValueError("empty predicate")
    return conds


def predicate_mask(tbl: pa.Table, conds: list[dict]) -> pa.Array:
    """Vectorized boolean mask for a parsed conjunction over an Arrow
    batch; SQL WHERE semantics (a NULL comparison result keeps the row
    OUT of the match set)."""
    return pc.fill_null(predicate_mask_kleene(tbl, conds), False)


def predicate_mask_kleene(tbl: pa.Table, conds: list[dict]) -> pa.Array:
    """Three-valued (SQL Kleene) mask for a parsed conjunction: TRUE /
    FALSE / NULL per row, with NO null-filling.  CHECK-constraint
    enforcement needs the distinction (a NULL predicate result SATISFIES a
    CHECK, a strict FALSE violates it — so ``x IS NOT NULL`` correctly
    rejects null rows while ``x > 5`` passes them); WHERE filtering wraps
    this with ``fill_null(False)``."""
    mask = pa.array(np.ones(tbl.num_rows, dtype=bool))
    for c in conds:
        col = tbl[c["column"]]
        op, v = c["op"], c["value"]
        # temporal columns: Arrow has no (timestamp, string) kernels, so a
        # string literal is cast to the column type ('2023-09-15 16:00:00'
        # style — the same lexicographic form the col_stats planner uses)
        ctype = col.type if not isinstance(col, pa.ChunkedArray) else col.type
        if (
            pa.types.is_timestamp(ctype) or pa.types.is_date(ctype)
        ) and op not in ("is_null", "is_not_null"):
            if op == "in":
                v = [pa.scalar(x).cast(ctype).as_py() for x in v]
            else:
                v = pa.scalar(v).cast(ctype)
        if op == "=":
            m = pc.equal(col, v)
        elif op == "!=":
            m = pc.not_equal(col, v)
        elif op == "<":
            m = pc.less(col, v)
        elif op == "<=":
            m = pc.less_equal(col, v)
        elif op == ">":
            m = pc.greater(col, v)
        elif op == ">=":
            m = pc.greater_equal(col, v)
        elif op == "in":
            if pa.types.is_floating(ctype):
                # Arrow is_in uses BITWISE float identity (-0.0 not in
                # {0.0}), SQL IN uses arithmetic equality — OR of equals
                # matches SQL (found by the hypothesis-vs-DuckDB property)
                m = pc.equal(col, v[0])
                for x in v[1:]:
                    m = pc.or_kleene(m, pc.equal(col, x))
            else:
                m = pc.is_in(col, value_set=pa.array(v))
        elif op == "is_null":
            m = pc.is_null(col)
        elif op == "is_not_null":
            m = pc.is_valid(col)
        else:  # pragma: no cover - parser emits only the ops above
            raise ValueError(f"unknown predicate op {op!r}")
        mask = pc.and_kleene(mask, m)
    return mask


def translate_columns(conds: list[dict], mapping: dict[str, str]) -> list[dict]:
    """Rewrite condition column refs logical -> physical (identity when the
    table has no column mapping)."""
    if not mapping:
        return conds
    return [{**c, "column": mapping.get(c["column"], c["column"])} for c in conds]


def conds_to_dataset_filter(conds: list[dict], mapping: dict[str, str] | None = None):
    """Best-effort pyarrow.dataset expression for a parsed conjunction —
    what ``scan(where=)`` pushes into ``read_parquet(filter=...)`` so
    Parquet ROW-GROUP statistics prune inside files (file-level manifest
    stats already pruned whole files).

    Column refs translate to physical names via ``mapping``.  Conditions
    that cannot be pushed faithfully are skipped (the row-level
    ``predicate_mask`` stage remains the correctness authority):

    - float ``=`` / ``in``: dataset equality is bitwise (-0.0 vs 0.0);
    - string literals against temporal columns (the expression layer has
      no cast context here).

    Returns an expression or None when nothing is pushable."""
    import pyarrow.dataset as pads

    mapping = mapping or {}
    expr = None
    for c in conds:
        f = pads.field(mapping.get(c["column"], c["column"]))
        op, v = c["op"], c["value"]
        if isinstance(v, float) and op in ("=", "in"):
            continue
        if isinstance(v, list) and any(isinstance(x, float) for x in v):
            continue
        if op == "=":
            e = f == v
        elif op == "!=":
            e = f != v
        elif op == "<":
            e = f < v
        elif op == "<=":
            e = f <= v
        elif op == ">":
            e = f > v
        elif op == ">=":
            e = f >= v
        elif op == "in":
            e = f.isin(v)
        elif op == "is_null":
            e = f.is_null()
        elif op == "is_not_null":
            e = ~f.is_null()
        else:  # pragma: no cover
            continue
        expr = e if expr is None else (expr & e)
    return expr
