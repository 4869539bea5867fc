"""Shared test helpers: golden-equality comparison per FIXTURES.md §4."""

from __future__ import annotations

import pyarrow as pa
import ray


def collect_sorted(ds: ray.data.Dataset, key: str = "doc_id") -> pa.Table:
    """Materialize a (small, test-sized) dataset to one Arrow table sorted by
    ``key`` — comparisons NEVER rely on execution order (SURVEY.md §2.10)."""
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tables:
        return pa.table({})
    tbl = pa.concat_tables(tables, promote_options="default")
    return tbl.sort_by(key).combine_chunks()


def assert_tokens_equal(a: pa.Table, b: pa.Table) -> None:
    """Per-row token-array equality (the BASELINE correctness invariant)."""
    assert a.num_rows == b.num_rows, f"row count {a.num_rows} != {b.num_rows}"
    assert a.column("doc_id").equals(b.column("doc_id")), "doc_id sets differ"
    ta = a.column("tokens").combine_chunks()
    tb = b.column("tokens").combine_chunks()
    assert ta.equals(tb), "token arrays differ"
    assert a.column("n_tok").equals(b.column("n_tok")), "n_tok differs"
