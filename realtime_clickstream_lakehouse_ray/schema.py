"""Table schemas and batch conformance.

The engine's primary table is the pre-tokenized training-sequence table from
``BASELINE.json`` ``input_hint``.  ``conform_table`` is the Ray-native
equivalent of the reference's writer-side output normalizer
(``/root/reference/etl/glue_stream.py:309-334`` — select fixed column list,
cast each expected column, fill missing columns with typed nulls) so that
every file the engine writes has a byte-stable schema regardless of which
maintenance operation produced it.
"""

from __future__ import annotations

import pyarrow as pa

# BASELINE.json input_hint: (doc_id:string, tokens:array<int32>, n_tok:int32, source:string)
TOKENS_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
    ]
)

# Reference conformance event schema (six nullable strings), from the
# reference ETL input schema (/root/reference/etl/glue_stream.py:57-68) and
# Lambda enrichment (/root/reference/etl/handlers/click_handler.py:150-154).
CLICK_SCHEMA = pa.schema(
    [
        pa.field("element", pa.string()),
        pa.field("page", pa.string()),
        pa.field("userAgent", pa.string()),
        pa.field("timestamp", pa.string()),
        pa.field("ingest_ts", pa.string()),
        pa.field("request_id", pa.string()),
    ]
)


def conform_table(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    """Reorder / cast / null-fill ``tbl`` to exactly ``schema``.

    Mirrors the reference's output projection + null-fill normalizer
    (glue_stream.py:309-334): every expected column is selected and cast to
    the declared type; missing columns become typed all-null columns; extra
    columns (e.g. a transient ``zkey``) are dropped.  Never copies the
    ``tokens`` list values when the type already matches (Arrow cast on an
    equal type is zero-copy).
    """
    n = tbl.num_rows
    cols = []
    for field in schema:
        if field.name in tbl.column_names:
            col = tbl.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
        else:
            col = pa.nulls(n, field.type)
        cols.append(col)
    return pa.Table.from_arrays(cols, schema=schema)
