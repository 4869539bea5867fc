"""Small shared helpers."""

from __future__ import annotations

import pyarrow as pa
import ray


def to_arrow_table(ds, schema: pa.Schema | None = None) -> pa.Table:
    """Materialize a (small) Dataset to one Arrow table.

    Skips the zero-column empty blocks Ray emits for empty input blocks
    (their empty schema breaks ``pa.concat_tables``)."""
    tables = [
        t for t in ray.get(ds.to_arrow_refs()) if t.num_rows and t.num_columns
    ]
    if not tables:
        return schema.empty_table() if schema is not None else pa.table({})
    return pa.concat_tables(tables, promote_options="default").combine_chunks()
