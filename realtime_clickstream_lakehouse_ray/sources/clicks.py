"""Click-event JSON ingest: the reference's Kinesis->bronze path on files.

Mirrors, operator for operator, the reference ingest chain over the exact
CLICK_SCHEMA payload (FIXTURES.md §3):

- S2/S3 registry-validated read with inference fallback
  (glue_stream.py:121-165): ``read_click_json`` reads JSON lines, casts to
  the declared six-string schema; rows that fail the JSON parse flow to
  the reject path instead of killing the job (M1, click_handler.py:139-147)
- M2 enrichment (ingest_ts, request_id; click_handler.py:150-154)
- M4 partition key default "unknown" (click_handler.py:164)
- M7 timestamp parse fallback chain (glue_stream.py:213-229):
  ``to_timestamp(timestamp)`` else arrival time else a constant "now"
  passed by the caller (never wall clock inside workers — determinism)
- M8/M9 derived ``event_date`` + conform to the output projection
  (glue_stream.py:239, :309-334)

The reject path is data, not an exception: ``status`` column marks
``valid`` / ``malformed``, the caller splits with a vectorized filter.
"""

from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.json as pj
import ray.data

from realtime_clickstream_lakehouse_ray.schema import CLICK_SCHEMA, conform_table

OUT_SCHEMA = pa.schema(
    list(CLICK_SCHEMA)
    + [pa.field("event_ts", pa.timestamp("us")), pa.field("event_date", pa.date32())]
)


def _parse_lines_vectorized(lines: list[str]) -> pa.Table | None:
    """Fast path: block-parse the whole batch's JSON lines with Arrow's C++
    JSON reader (one call, no per-row Python objects).  Returns the click
    columns as strings, or ``None`` when the batch needs the tolerant
    per-line path: any malformed line (the reader rejects the block), a
    row-count mismatch, or a click field that parsed as a non-string type
    (the slow path's ``json.dumps`` normalization and Arrow's cast disagree
    on float formatting, so only all-string/null payloads take this path)."""
    if not lines:
        return None
    try:
        parsed = pj.read_json(
            pa.BufferReader("\n".join(lines).encode("utf-8")),
            parse_options=pj.ParseOptions(
                newlines_in_values=False,
                # pin the click fields to string (the reader would
                # otherwise type-infer timestamp-shaped strings); a JSON
                # number/bool/object in a pinned field fails the read and
                # the batch takes the per-line path with its json.dumps
                # normalization
                explicit_schema=pa.schema(
                    [pa.field(f.name, pa.string()) for f in CLICK_SCHEMA]
                ),
                unexpected_field_behavior="infer",
            ),
        )
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return None
    if parsed.num_rows != len(lines):
        return None
    cols: dict[str, pa.Array] = {}
    null_col = pa.nulls(len(lines), pa.string())
    for f in CLICK_SCHEMA:
        if f.name not in parsed.column_names:
            cols[f.name] = null_col
            continue
        col = parsed.column(f.name).combine_chunks()
        if not (pa.types.is_string(col.type) or pa.types.is_null(col.type)):
            return None
        cols[f.name] = col.cast(pa.string())
    return pa.table(cols)


def parse_click_lines(
    batch: pa.Table,
    ingest_ts: str,
    fallback_now: str = "1970-01-01T00:00:00Z",
) -> pa.Table:
    """Raw JSON lines -> conformed click rows + reject marker.

    JSON parsing is vectorized (one Arrow C++ ``read_json`` call per
    batch); a batch containing any malformed line falls back to a
    tolerant per-line parse so rejects stay data, not exceptions.
    Everything after the parse — casts, null-fill, timestamp chain, date
    derivation — is vectorized Arrow.  ``ingest_ts``/``fallback_now`` are
    caller-supplied constants (the Lambda's ``time.strftime(gmtime())``
    equivalent, injected for determinism)."""
    lines = batch.column("text").to_pylist()
    n = len(lines)
    tbl = _parse_lines_vectorized(lines)
    if tbl is not None:
        status = ["valid"] * n
    else:
        rows, status = [], []
        for line in lines:
            try:
                obj = json.loads(line)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
                rows.append(obj)
                status.append("valid")
            except (json.JSONDecodeError, ValueError):
                rows.append({})
                status.append("malformed")

        # build column-wise (from_pylist of empty dicts would drop the rows)
        def as_str(v):  # writer-side CAST-to-string normalization (M9)
            return v if (v is None or isinstance(v, str)) else json.dumps(v)

        tbl = pa.table(
            {
                f.name: pa.array(
                    [as_str(r.get(f.name)) for r in rows], type=pa.string()
                )
                for f in CLICK_SCHEMA
            }
        )
    tbl = conform_table(tbl, CLICK_SCHEMA)
    # M2: enrichment columns (only where absent — Lambda always sets them)
    tbl = tbl.set_column(
        tbl.column_names.index("ingest_ts"),
        "ingest_ts",
        pc.fill_null(tbl["ingest_ts"], ingest_ts),
    )
    req = pc.binary_join_element_wise(
        "req-",
        pc.utf8_lpad(pa.array(np.arange(n)).cast(pa.string()), 8, padding="0"),
        "",
    )
    tbl = tbl.set_column(
        tbl.column_names.index("request_id"), "request_id",
        pc.fill_null(tbl["request_id"], req),
    )
    # M4: partition key default
    tbl = tbl.set_column(
        tbl.column_names.index("element"), "element",
        pc.fill_null(tbl["element"], "unknown"),
    )
    # M7: timestamp fallback chain — ISO parse, else ingest_ts, else constant
    def parse_iso(col: pa.ChunkedArray | pa.Array) -> pa.Array:
        # tolerant vectorized ISO-8601 parse: strip the UTC suffix, null out
        # anything not shaped like an ISO timestamp (so it feeds the
        # coalesce chain instead of failing the cast), then one Arrow
        # string->timestamp cast for the whole column.  A residual
        # shape-valid-but-impossible date ("2024-13-01") still raises, so
        # the per-row numpy parse stays as the rescue path for that batch.
        arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
        s = pc.replace_substring(arr.cast(pa.string()), "+00:00", "")
        s = pc.replace_substring(s, "Z", "")
        shaped = pc.match_substring_regex(
            s, r"^\d{4}-\d{2}-\d{2}(T\d{2}:\d{2}(:\d{2}(\.\d{1,6})?)?)?$"
        )
        masked = pc.if_else(pc.fill_null(shaped, False), s, None)
        try:
            return masked.cast(pa.timestamp("us"))
        except pa.ArrowInvalid:
            out = np.array(arr.to_pylist(), dtype=object)
            parsed = np.full(
                len(out), np.datetime64("NaT"), dtype="datetime64[us]"
            )
            for i, v in enumerate(out):
                if v is None:
                    continue
                try:
                    parsed[i] = np.datetime64(
                        v.replace("Z", "").replace("+00:00", ""), "us"
                    )
                except ValueError:
                    pass
            return pa.array(parsed)

    ts1 = parse_iso(tbl["timestamp"])
    ts2 = parse_iso(tbl["ingest_ts"])
    ts3 = pa.array(
        np.full(n, np.datetime64(fallback_now.replace("Z", ""), "us"))
    )
    event_ts = pc.coalesce(ts1, ts2, ts3)
    event_date = event_ts.cast(pa.date32())
    out = tbl.append_column("event_ts", event_ts).append_column("event_date", event_date)
    return out.append_column("status", pa.array(status))


def read_click_json(
    paths: str | list[str],
    ingest_ts: str = "1970-01-01T00:00:00Z",
) -> ray.data.Dataset:
    """S2: read JSON-lines click events with schema enforcement; malformed
    lines carry status='malformed' (reject path) rather than failing."""
    return ray.data.read_text(paths).map_batches(
        parse_click_lines,
        fn_kwargs=dict(ingest_ts=ingest_ts),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def split_rejects(ds: ray.data.Dataset) -> tuple[ray.data.Dataset, ray.data.Dataset]:
    """M1 reject path: (valid rows conformed to OUT_SCHEMA, reject rows)."""
    valid = ds.map_batches(
        lambda t: conform_table(t.filter(pc.equal(t["status"], "valid")), OUT_SCHEMA),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    rejects = ds.map_batches(
        lambda t: t.filter(pc.equal(t["status"], "malformed")),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    return valid, rejects


def sample_collector(ds: ray.data.Dataset, n: int = 5) -> list[dict]:
    """M10/S4 diagnostics: first-n sample without materializing the stream
    (reference: foreachBatch collector / get_records(Limit=10))."""
    return ds.limit(n).take(n)


# ---- S3: schema-inference fallback reader --------------------------------
def infer_click_keys(paths: str | list[str], sample_lines: int = 2_000) -> list[str]:
    """Distributed schema inference over a head sample: each task reports
    its batch's sorted key union (a tiny aggregate), the driver unions.
    The Ray-native form of the reference's ``inferSchema: "true"``
    fallback read (glue_stream.py:150-160)."""

    def keys_of(t: pa.Table) -> pa.Table:
        seen: set[str] = set()
        for line in t.column("text").to_pylist():
            try:
                obj = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(obj, dict):
                seen.update(obj)
        return pa.table({"key": pa.array(sorted(seen), pa.string())})

    parts = (
        ray.data.read_text(paths)
        .limit(sample_lines)
        .map_batches(keys_of, batch_format="pyarrow", zero_copy_batch=True)
    )
    out: set[str] = set()
    for t in ray.get(parts.to_arrow_refs()):
        if t.num_rows and "key" in t.column_names:
            out.update(t.column("key").to_pylist())
    return sorted(out)


def read_click_json_infer(
    paths: str | list[str],
    ingest_ts: str = "1970-01-01T00:00:00Z",
    keys: list[str] | None = None,
) -> ray.data.Dataset:
    """S3 fallback reader: accept well-formed JSON with an UNEXPECTED
    shape.  The schema is inferred (union of observed keys, all cast to
    string per the M9 writer normalization); known click fields still get
    the M2/M4/M7 enrichment + timestamp chain, unknown fields ride along
    as extra string columns (the reference's inferred ``raw_df`` keeps
    them until projection, glue_stream.py:156-160)."""
    inferred = keys if keys is not None else infer_click_keys(paths)
    extra = [k for k in inferred if k not in {f.name for f in CLICK_SCHEMA}]

    def parse(batch: pa.Table) -> pa.Table:
        base = parse_click_lines(batch, ingest_ts=ingest_ts)
        # re-parse only to pull the extra columns (payloads are tiny; the
        # strict path already paid the JSON parse — keep them in lockstep)
        rows = []
        for line in batch.column("text").to_pylist():
            try:
                obj = json.loads(line)
                rows.append(obj if isinstance(obj, dict) else {})
            except json.JSONDecodeError:
                rows.append({})
        for k in extra:
            vals = [
                (v if (v is None or isinstance(v, str)) else json.dumps(v))
                for v in (r.get(k) for r in rows)
            ]
            base = base.append_column(k, pa.array(vals, pa.string()))
        return base

    return ray.data.read_text(paths).map_batches(
        parse, batch_format="pyarrow", zero_copy_batch=True
    )


def read_click_json_auto(
    paths: str | list[str],
    ingest_ts: str = "1970-01-01T00:00:00Z",
    sample_lines: int = 500,
) -> tuple[ray.data.Dataset, str]:
    """S2-with-S3-fallback: probe a head sample against the registry
    schema; if the lines are well-formed JSON but miss every required
    click field (registry validation would fail), fall back to the
    inference reader — mirroring the reference's try/except around the
    registry-validated Kinesis read (glue_stream.py:141-160).  Returns
    (dataset, mode) with mode in {"registry", "inferred"}."""
    known = {f.name for f in CLICK_SCHEMA}
    keys = infer_click_keys(paths, sample_lines=sample_lines)
    if keys and not (set(keys) & known):
        return read_click_json_infer(paths, ingest_ts=ingest_ts, keys=keys), "inferred"
    return read_click_json(paths, ingest_ts=ingest_ts), "registry"
