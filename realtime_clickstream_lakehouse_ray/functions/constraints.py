"""Table CHECK constraints, enforced vectorized at write time.

The reference enforces its event contract at ingest with a Glue
schema-registry check (reject path, /root/reference/etl/glue_stream.py:148-160)
and leaves relational invariants to Delta's CHECK constraints; this module
is the engine's equivalent for the tokens table: declarative row
predicates stored in ``_table.json`` and evaluated as one
``pyarrow.compute`` pass per batch inside every write pipeline (append and
MERGE source) — violations fail the job loudly BEFORE any file is
published, so a committed snapshot never contains a violating row.

Supported kinds (declarative dicts — JSON-serializable, no eval()):
- ``{"kind": "not_null", "column": c}``
- ``{"kind": "range", "column": c, "min": x?, "max": y?}`` (inclusive)
- ``{"kind": "allowed_values", "column": c, "values": [...]}``
- ``{"kind": "token_len"}`` — ``n_tok == len(tokens)``, the payload's
  structural invariant (input_hint: tokens array<int32> + n_tok int32)
"""

from __future__ import annotations

from typing import Any

import pyarrow as pa
import pyarrow.compute as pc

KINDS = ("not_null", "range", "allowed_values", "token_len", "predicate")


class ConstraintViolation(ValueError):
    pass


def validate_spec(c: dict[str, Any]) -> dict[str, Any]:
    kind = c.get("kind")
    if kind not in KINDS:
        raise ValueError(f"unknown constraint kind {kind!r} (supported: {KINDS})")
    if kind == "predicate":
        # CHECK (<conjunctive predicate>): parsed once here so a malformed
        # expression fails at ADD CONSTRAINT time, not inside a rewrite
        from realtime_clickstream_lakehouse_ray.functions.predicate import (
            parse_predicate,
        )

        if not c.get("where"):
            raise ValueError("predicate constraint needs a where string")
        parsed = parse_predicate(c["where"])
        name = c.get("name") or "check_" + "_".join(
            sorted({p["column"] for p in parsed})
        )
        return {**c, "name": name, "conds": parsed}
    if kind != "token_len" and not c.get("column"):
        raise ValueError(f"constraint kind {kind!r} requires a column")
    if kind == "range" and c.get("min") is None and c.get("max") is None:
        raise ValueError("range constraint needs min and/or max")
    if kind == "allowed_values" and not c.get("values"):
        raise ValueError("allowed_values constraint needs a non-empty values list")
    name = c.get("name") or f"{kind}_{c.get('column', 'tokens')}"
    return {**c, "name": name}


def _violations(t: pa.Table, c: dict[str, Any]) -> pa.Array:
    """Boolean mask of VIOLATING rows for one constraint."""
    kind = c["kind"]
    if kind == "predicate":
        # CHECK semantics (SQL/Delta): a row VIOLATES when the predicate
        # evaluates strictly FALSE; a NULL (indeterminate) result
        # SATISFIES.  The distinction matters for null rows: ``x > 5`` on a
        # null x is NULL -> satisfied, but ``x IS NOT NULL`` on a null x is
        # FALSE -> rejected — so the mask is computed under Kleene logic
        # and only genuinely-NULL slots are exempted (a blanket
        # any-referenced-column-is-null exemption would let IS NOT NULL
        # constraints pass null rows)
        from realtime_clickstream_lakehouse_ray.functions.predicate import (
            predicate_mask_kleene,
        )

        ok = predicate_mask_kleene(t, c["conds"])
        return pc.fill_null(pc.invert(ok), False)
    if kind == "token_len":
        n = pc.list_value_length(t["tokens"]).cast(pa.int64())
        return pc.or_kleene(
            pc.is_null(n), pc.not_equal(n, t["n_tok"].cast(pa.int64()))
        )
    col = t[c["column"]]
    if kind == "not_null":
        return pc.is_null(col)
    if kind == "range":
        ok = pa.array([True] * len(t)) if len(t) else pa.array([], pa.bool_())
        if c.get("min") is not None:
            ok = pc.and_kleene(ok, pc.greater_equal(col, pa.scalar(c["min"])))
        if c.get("max") is not None:
            ok = pc.and_kleene(ok, pc.less_equal(col, pa.scalar(c["max"])))
        return pc.or_kleene(pc.is_null(col), pc.invert(ok))
    # allowed_values
    return pc.or_kleene(
        pc.is_null(col), pc.invert(pc.is_in(col, value_set=pa.array(c["values"])))
    )


def check_batch(t: pa.Table, constraints: list[dict[str, Any]], key_col: str = "doc_id") -> pa.Table:
    """Raise ConstraintViolation (with a count and an example key) if any
    row of the batch violates any constraint; otherwise pass the batch
    through unchanged (usable directly as a map_batches stage)."""
    for c in constraints:
        bad = _violations(t, c)
        n_bad = pc.sum(bad.cast(pa.int8())).as_py() or 0
        if n_bad:
            example = ""
            if key_col in t.column_names:
                example = f"; e.g. {key_col}={t.filter(bad)[key_col][0].as_py()!r}"
            raise ConstraintViolation(
                f"CHECK constraint {c['name']!r} violated by {n_bad} row(s){example}"
            )
    return t
