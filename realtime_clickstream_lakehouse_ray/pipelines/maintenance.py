"""Maintenance-engine demo pipelines wired to the shared test data.

The engine's own table lives outside the test parquet dirs, so to put
compaction / Z-order / MERGE / time travel behind the driver's DuckDB
oracle gate we derive the tokens table *deterministically* from the
``documents`` table: ``doc_id`` formatted per FIXTURES.md, ``tokens`` =
stable hash of each whitespace token (mod vocab), ``n_tok`` = whitespace
token count (SQL-expressible: ``len(string_split_regex(trim(text),
'\\s+'))``), ``source`` carried through.  The oracle can then state the
exact expected (doc_id, n_tok, source) relation after each maintenance
op, while pytest separately checks full token-array equality.
"""

from __future__ import annotations

import shutil
from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from realtime_clickstream_lakehouse_ray.config import tune_context
from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

SCRATCH = Path("/tmp/rcl_maint")


def doc_to_tokens(batch: pa.Table) -> pa.Table:
    """documents row -> tokens-table row, fully vectorized:
    whitespace-split (arrow kernel) -> per-word stable hash (flattened
    values, ListArray offsets reused) -> n_tok = list length."""
    words = pc.utf8_split_whitespace(pc.utf8_trim_whitespace(batch["text"]))
    words = words.combine_chunks() if isinstance(words, pa.ChunkedArray) else words
    flat = words.flatten()
    tok_vals = (hash64(flat) % np.uint64(VOCAB)).astype(np.int32)
    tokens = pa.ListArray.from_arrays(words.offsets, pa.array(tok_vals, pa.int32()))
    n_tok = pc.list_value_length(words).cast(pa.int32())
    ids = pc.cast(batch["doc_id"], pa.string())
    doc_id = pc.binary_join_element_wise("doc-", pc.utf8_lpad(ids, 12, "0"), "")
    return pa.table(
        {"doc_id": doc_id, "tokens": tokens, "n_tok": n_tok, "source": batch["source"]}
    )


def build_from_documents(sf_dir: str, root: str, rows_per_file: int = 64) -> Table:
    """Ingest documents -> tokens table with deliberately small files."""
    table = Table.create(root)
    tune_context()
    ds = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(doc_to_tokens, batch_format="pyarrow", zero_copy_batch=True)
    table.append(ds, rows_per_file=rows_per_file)
    return table


def updates_from_documents(sf_dir: str) -> ray.data.Dataset:
    """Deterministic MERGE source derived from documents:
    - updates: every doc with doc_id % 20 == 0, with 7 extra tokens
      appended (so the oracle's n_tok is base + 7);
    - inserts: every doc with doc_id % 50 == 0 re-keyed to doc_id +
      1_000_000 (fresh keys past the existing range).

    Built as a STREAM (one vectorized ``map_batches`` over documents),
    never a driver-side collect of the corpus — ``merge()`` decides
    per its regime whether the derived source is small enough to
    broadcast."""
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(
        _updates_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _updates_batch(docs: pa.Table) -> pa.Table:
    base = doc_to_tokens(docs)
    raw_ids = docs["doc_id"].combine_chunks()
    ids_np = np.asarray(raw_ids)

    upd_mask = pa.array(ids_np % 20 == 0)
    upd = base.filter(upd_mask)
    # append seven `7` tokens per updated row — vectorized scatter:
    # destination starts shift by 7 per preceding row; fill with 7, then
    # scatter the old values into their shifted positions
    t_old = upd["tokens"].combine_chunks()
    vals_old = np.asarray(t_old.values)
    offs = np.asarray(t_old.offsets).astype(np.int64)
    n = offs[1:] - offs[:-1]
    new_offsets = np.zeros(upd.num_rows + 1, dtype=np.int64)
    np.cumsum(n + 7, out=new_offsets[1:])
    new_vals = np.full(int(new_offsets[-1]), 7, dtype=np.int32)
    old_dest = np.repeat(new_offsets[:-1] - offs[:-1], n) + np.arange(len(vals_old))
    new_vals[old_dest] = vals_old
    new_tokens = pa.LargeListArray.from_arrays(
        new_offsets, pa.array(new_vals, pa.int32())
    ).cast(pa.list_(pa.int32()))
    upd = pa.table(
        {
            "doc_id": upd["doc_id"],
            "tokens": new_tokens,
            "n_tok": pc.add(upd["n_tok"], 7).cast(pa.int32()),
            "source": upd["source"],
        }
    )

    ins_mask = pa.array(ids_np % 50 == 0)
    ins = base.filter(ins_mask)
    ins_ids = pc.add(raw_ids.filter(ins_mask), 1_000_000)
    ins_doc_id = pc.binary_join_element_wise(
        "doc-", pc.utf8_lpad(pc.cast(ins_ids, pa.string()), 12, "0"), ""
    )
    ins = ins.set_column(0, "doc_id", ins_doc_id)
    return pa.concat_tables([upd, ins])


def updates_from_documents_seq(sf_dir: str) -> ray.data.Dataset:
    """Out-of-order CDC source for the SEQUENCE BY merge demo
    (``n_tok`` doubles as the sequence column — a longer doc is a newer
    version):

    - STALE updates: doc_id % 40 == 0 → the doc with its last 3 tokens
      dropped (n_tok - 3, an older version) — must be suppressed;
    - FRESH updates: doc_id % 20 == 0 and % 40 != 0 → 7 tokens appended
      (n_tok + 7) — must be applied;
    - inserts: doc_id % 50 == 0 re-keyed +1_000_000 — new keys always
      insert."""
    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(
        _updates_seq_batch, batch_format="pyarrow", zero_copy_batch=True
    )


def _updates_seq_batch(docs: pa.Table) -> pa.Table:
    full = _updates_batch(docs)  # fresh updates (%20) + inserts (%50)
    raw_ids = np.asarray(docs["doc_id"].combine_chunks())
    base = doc_to_tokens(docs)
    # swap the %40 rows of the update half for STALE versions: last 3
    # tokens dropped, vectorized offsets-shrink + gather over the flat
    # values buffer
    stale_src = base.filter(pa.array(raw_ids % 40 == 0))
    t_old = stale_src["tokens"].combine_chunks()
    offs = np.asarray(t_old.offsets).astype(np.int64)
    n = offs[1:] - offs[:-1]
    keep = np.maximum(n - 3, 0)
    new_offsets = np.zeros(len(keep) + 1, dtype=np.int64)
    np.cumsum(keep, out=new_offsets[1:])
    idx = (
        np.arange(int(new_offsets[-1]), dtype=np.int64)
        - np.repeat(new_offsets[:-1], keep)
        + np.repeat(offs[:-1], keep)
    )
    stale = pa.table(
        {
            "doc_id": stale_src["doc_id"],
            "tokens": pa.ListArray.from_arrays(
                pa.array(new_offsets.astype(np.int32), pa.int32()),
                t_old.values.take(pa.array(idx)),
            ),
            "n_tok": pa.array(keep.astype(np.int32)),
            "source": stale_src["source"],
        }
    )
    # drop the fresh %40 rows from the generic update set, add stale ones
    upd_ids = np.asarray(
        pc.utf8_slice_codeunits(full["doc_id"].combine_chunks(), 4, 16)
    ).astype(np.int64)
    fresh_or_insert = (upd_ids % 40 != 0) | (upd_ids >= 1_000_000)
    return pa.concat_tables(
        [full.filter(pa.array(fresh_or_insert)), stale],
        promote_options="default",
    )


def maintenance_type_widening(sf_dir: str) -> pa.Table:
    """Ingest (int32 n_tok / list<int32> tokens) -> WIDEN both to 64-bit
    (Iceberg type promotion) -> append a second copy of the corpus
    re-keyed +2_000_000 under the wide schema -> compact (mixed-width
    bins conform) -> scan.  Old narrow files upcast at read time; the
    oracle states the doubled relation."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "widen"))
    t.evolve_schema(
        [pa.field("n_tok", pa.int64()), pa.field("tokens", pa.list_(pa.int64()))]
    )

    def rekey(batch: pa.Table) -> pa.Table:
        out = doc_to_tokens(batch)
        ids = pc.add(batch["doc_id"].combine_chunks(), 2_000_000)
        doc_id = pc.binary_join_element_wise(
            "doc-", pc.utf8_lpad(pc.cast(ids, pa.string()), 12, "0"), ""
        )
        return out.set_column(0, "doc_id", doc_id)

    extra = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    ).map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True)
    t.append(extra)
    t.compact(target_file_bytes=8 << 20)
    if t.schema.field("n_tok").type != pa.int64():
        raise AssertionError("widened schema did not persist")
    return _scan_projected(t)


def maintenance_merge_seq(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> MERGE ... SEQUENCE BY n_tok over an
    out-of-order CDC source -> scan.  Stale events (%40: an OLDER doc
    version) are suppressed — the target keeps its newer row — while
    fresh events (%20 \\ %40) apply and new keys insert; the oracle states
    the exact post-merge relation with the suppression folded in."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "mergeseq"))
    t.compact(target_file_bytes=8 << 20)
    t.merge(
        updates_from_documents_seq(sf_dir),
        strategy="broadcast",
        sequence_col="n_tok",
    )
    return _scan_projected(t)


def _scratch_root(sf_dir: str, tag: str) -> str:
    name = Path(sf_dir).name or "sf"
    root = SCRATCH / f"{name}-{tag}" / "tokens"
    shutil.rmtree(root.parent, ignore_errors=True)
    return str(root)


def _scan_projected(table: Table, version: int | None = None) -> pa.Table:
    got = pa.concat_tables(
        ray.get(table.scan(version=version, columns=["doc_id", "n_tok", "source"]).to_arrow_refs())
    )
    # n_tok -> int64 so the schema lines up with the DuckDB oracle's len()
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by("doc_id").combine_chunks()


def maintenance_compact(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> scan: contents must be unchanged (the oracle
    checks the (doc_id, n_tok, source) relation; pytest checks tokens)."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "compact"))
    t.compact(target_file_bytes=8 << 20)
    return _scan_projected(t)


def maintenance_zorder(sf_dir: str) -> pa.Table:
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "zorder"))
    t.zorder(target_file_bytes=1 << 20)
    return _scan_projected(t)


def maintenance_merge(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> MERGE INTO (updates + inserts) -> scan."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "merge"))
    t.compact(target_file_bytes=8 << 20)
    t.merge(updates_from_documents(sf_dir))
    return _scan_projected(t)


def maintenance_time_travel(sf_dir: str) -> pa.Table:
    """Full lifecycle, then scan the PRE-merge snapshot: time travel must
    reproduce the original ingest exactly."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "tt"))
    v_ingest = t.version()
    t.compact(target_file_bytes=8 << 20)
    t.merge(updates_from_documents(sf_dir))
    t.zorder(target_file_bytes=1 << 20)
    return _scan_projected(t, version=v_ingest)


def maintenance_time_travel_ts(sf_dir: str) -> pa.Table:
    """Timestamp time travel (Delta ``timestampAsOf``, reference
    README.md:176): capture a wall-clock instant after the ingest commit,
    run compact + merge, then ``scan(as_of=that_instant)`` — it must
    resolve to the ingest snapshot and reproduce the original relation."""
    import time

    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "ttts"))
    ts_after_ingest = time.time()
    time.sleep(0.02)  # commit timestamps are wall-clock; keep them distinct
    t.compact(target_file_bytes=8 << 20)
    t.merge(updates_from_documents(sf_dir))
    got = pa.concat_tables(
        ray.get(
            t.scan(as_of=ts_after_ingest, columns=["doc_id", "n_tok", "source"]).to_arrow_refs()
        )
    )
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by("doc_id").combine_chunks()


def maintenance_compact_partition(sf_dir: str) -> pa.Table:
    """Partition-scoped compaction (Delta ``OPTIMIZE ... WHERE``): compact
    ONLY the hot ``web`` partition, leave every other partition's small
    files untouched, and scan — the visible relation must be unchanged
    (docs oracle), while the file layout shows exactly one partition was
    rewritten (asserted here so the driver check carries the claim)."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "optwhere"))
    before = {f.path for f in t.files()}
    t.compact(target_file_bytes=8 << 20, partitions=["web"])
    after = t.files()
    touched = {f.partition for f in after if f.path not in before}
    if touched - {"web"}:  # defense in depth for the driver check
        raise AssertionError(f"scoped compact rewrote partitions {touched}")
    untouched_small = [
        f for f in after if f.partition != "web" and f.path in before
    ]
    if not untouched_small:
        raise AssertionError("scoped compact should leave other partitions alone")
    return _scan_projected(t)


def maintenance_tag_scan(sf_dir: str) -> pa.Table:
    """Named-ref retention (Iceberg tag analog): tag the ingest snapshot,
    run compact + merge + zorder, expire retention down to the last two
    versions and vacuum immediately — the tagged snapshot must survive
    both (consolidated into a self-contained island, files pinned) and
    ``scan(tag=...)`` must reproduce the original ingest relation."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "tagscan"))
    t.tag("audit")
    t.compact(target_file_bytes=8 << 20)
    t.merge(updates_from_documents(sf_dir))
    t.zorder(target_file_bytes=1 << 20)
    t.expire_snapshots(keep_last=2)
    t.vacuum(min_age_seconds=0.0)
    got = pa.concat_tables(
        ray.get(
            t.scan(tag="audit", columns=["doc_id", "n_tok", "source"]).to_arrow_refs()
        )
    )
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by("doc_id").combine_chunks()


def maintenance_full_lifecycle(sf_dir: str) -> pa.Table:
    """compact + zorder + merge + manifest rewrite + expire + vacuum, then
    scan latest — the flagship maintenance pipeline (bench headline)."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "full"))
    t.compact(target_file_bytes=8 << 20)
    t.zorder(target_file_bytes=1 << 20)
    t.merge(updates_from_documents(sf_dir))
    t.rewrite_manifests()
    t.expire_snapshots(keep_last=2)
    t.vacuum(min_age_seconds=0.0)  # scratch table: reclaim immediately
    return _scan_projected(t)


def maintenance_change_feed(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> MERGE, then read the change data feed across
    the merge: updates surface as pre/post-image pairs, re-keyed source
    rows as inserts, and every rewrite-only row (unmatched neighbors in
    the copy-on-write-rewritten files) must cancel to nothing.  The
    oracle states the exact expected feed from the merge recipe."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "cdf"))
    t.compact(target_file_bytes=8 << 20)
    v_pre = t.version()
    t.merge(updates_from_documents(sf_dir))
    ch = t.changes(v_pre)
    cols = ["doc_id", "n_tok", "source", "_change_type"]
    # empty groupby partitions yield zero-column blocks; drop them
    blocks = [
        b for b in ray.get(ch.to_arrow_refs()) if b.num_rows
    ]
    got = pa.concat_tables([b.select(cols) for b in blocks])
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by([("doc_id", "ascending"), ("_change_type", "ascending")]).combine_chunks()


def maintenance_update(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> predicate UPDATE (n_tok < 60: source gets a
    '-u' suffix) -> scan.  Rewrites the PARTITION column, so matched rows
    physically move between partitions in one copy-on-write commit; the
    oracle states the post-update relation with a CASE expression."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "update"))
    t.compact(target_file_bytes=8 << 20)
    t.update(
        [{"column": "source", "op": "suffix", "value": "-u"}], max_n_tok=59
    )
    return _scan_projected(t)


def maintenance_restore(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> MERGE -> RESTORE back to the ingest snapshot
    -> scan latest: the restored head must reproduce the original
    relation exactly (rollback as a new commit, history preserved)."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "restore"))
    v_ingest = t.version()
    t.compact(target_file_bytes=8 << 20)
    t.merge(updates_from_documents(sf_dir))
    t.restore(v_ingest)
    return _scan_projected(t)


def maintenance_replicate(sf_dir: str) -> pa.Table:
    """The CDC replication loop through the oracle gate: ingest ->
    compact -> shallow CLONE -> merge on the SOURCE -> sync the clone by
    applying ``source.changes(since)`` -> scan the CLONE.  The replica
    must equal the post-merge source relation (same oracle as
    ``maintenance_merge``) without ever re-copying the table."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "replsrc"))
    t.compact(target_file_bytes=8 << 20)
    rep_root = _scratch_root(sf_dir, "replica")
    rep = t.clone(rep_root)
    v_sync = t.version()
    t.merge(updates_from_documents(sf_dir))
    rep.apply_changes(t.changes(v_sync))
    return _scan_projected(rep)


def maintenance_delete(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> predicate DELETE (n_tok >= 60) -> scan: the
    remaining relation must equal the oracle's ``WHERE nt < 60``."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "delete"))
    t.compact(target_file_bytes=8 << 20)
    t.delete(min_n_tok=60)
    return _scan_projected(t)


def maintenance_delete_mor(sf_dir: str) -> pa.Table:
    """Ingest -> merge-on-read DELETE of every doc_id divisible by 7
    (deletion-vector tombstones, no data-file rewrite) -> scan (DV filter
    applied) -> materialize_deletes -> scan again: both scans must equal
    the oracle's ``WHERE id % 7 <> 0`` — the second proves materialization
    folds the DVs without changing the visible relation."""
    import pyarrow.parquet as pq

    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "delmor"))
    n_docs = pq.read_metadata(f"{sf_dir}/documents.parquet").num_rows
    dead = [f"doc-{i:012d}" for i in range(0, n_docs, 7)]
    t.delete(keys=dead, mode="mor")
    first = _scan_projected(t)
    t.materialize_deletes()
    second = _scan_projected(t)
    if not first.equals(second):  # defense in depth for the driver check
        raise AssertionError("DV materialization changed the visible relation")
    return second


def maintenance_pruned_scan(sf_dir: str, lo: int = 45, hi: int = 63) -> pa.Table:
    """Stats-based file skipping (the engine's answer to the reference's
    ``parquet.filterPushdown``, glue_stream.py:295-301, made useful by
    clustering): ingest -> cluster by (partition, n_tok) so files tile
    narrow n_tok ranges -> ``scan(min_n_tok=lo, max_n_tok=hi)`` plans
    ``read_parquet`` over ONLY the files whose manifest stats overlap the
    band -> the exact row predicate runs vectorized inside the read
    tasks.  Raises unless the stats prune actually skipped files, so the
    driver-checked row carries the file-skipping claim (the same
    defense-in-depth pattern as ``maintenance_compact_partition``)."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "prune"), rows_per_file=64)
    # 2-dim (partition, n_tok) degenerates to a partition-led n_tok sort —
    # exactly what min/max pruning wants; small targets force many files
    t.zorder(dims=("source", "n_tok"), target_file_bytes=16 << 10)
    n_all = len(t.files())
    n_planned = len(
        [
            f
            for f in t.files()
            if (f.max_n_tok is None or f.max_n_tok >= lo)
            and (f.min_n_tok is None or f.min_n_tok <= hi)
        ]
    )
    if not n_planned < n_all:
        raise AssertionError(
            f"stats prune skipped nothing ({n_planned}/{n_all} files planned)"
        )

    def row_filter(b: pa.Table) -> pa.Table:
        keep = pc.and_(pc.greater_equal(b["n_tok"], lo), pc.less_equal(b["n_tok"], hi))
        return b.filter(keep)

    ds = t.scan(
        min_n_tok=lo, max_n_tok=hi, columns=["doc_id", "n_tok", "source"]
    ).map_batches(row_filter, batch_format="pyarrow", zero_copy_batch=True)
    got = pa.concat_tables(ray.get(ds.to_arrow_refs()))
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by("doc_id").combine_chunks()


def maintenance_schema_evolution(sf_dir: str) -> pa.Table:
    """BACKWARD schema evolution through the oracle gate (the reference's
    Glue registry contract, glue/main.tf:38-66 + sink mergeSchema,
    glue_stream.py:345): ingest -> ADD nullable ``quality`` double ->
    append NEW rows (re-keyed +2_000_000) that carry the column -> scan.
    Old files are never rewritten; the scan null-fills ``quality`` for
    pre-evolution rows, and the oracle states the exact NULL/value split."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "evolve"))
    t.evolve_schema([pa.field("quality", pa.float64())])

    def new_rows(docs: pa.Table) -> pa.Table:
        base = doc_to_tokens(docs)
        ids = pc.add(docs["doc_id"].combine_chunks(), 2_000_000)
        doc_id = pc.binary_join_element_wise(
            "doc-", pc.utf8_lpad(pc.cast(ids, pa.string()), 12, "0"), ""
        )
        return pa.table(
            {
                "doc_id": doc_id,
                "tokens": base["tokens"],
                "n_tok": base["n_tok"],
                "source": base["source"],
                "quality": base["n_tok"].cast(pa.float64()),
            }
        )

    tune_context()
    t.append(
        ray.data.read_parquet(
            f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
        ).map_batches(new_rows, batch_format="pyarrow", zero_copy_batch=True)
    )
    got = pa.concat_tables(
        ray.get(
            t.scan(columns=["doc_id", "n_tok", "source", "quality"]).to_arrow_refs()
        )
    )
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by("doc_id").combine_chunks()


def maintenance_incremental_agg(sf_dir: str) -> pa.Table:
    """Incrementally-maintained materialized view (Delta DLT / Snowflake
    dynamic-table analog): a per-source ``(n_docs, sum_n_tok)`` aggregate
    is kept current by folding the change data feed of each commit into
    the previous MV state — the table itself is re-scanned only once, at
    bootstrap.

    Recipe: ingest -> bootstrap MV -> MERGE (fold its CDF) -> predicate
    DELETE (fold its CDF) -> return the MV.  The pipeline asserts the
    incremental state equals a from-scratch recompute of the final
    snapshot before returning, so the oracle checks both paths at once.

    Scale shape: each fold streams only the commit's changed rows
    (file-level diff prunes untouched files) through one vectorized
    ``map_batches`` of signed per-source partials + a tiny groupby — MV
    maintenance cost tracks the UPDATE size, not the table size."""
    from ray.data.aggregate import Sum

    def _agg_signed(ds: ray.data.Dataset, signed: bool) -> pd.DataFrame:
        def partial(t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or "source" not in t.column_names:
                return pa.table(
                    {
                        "source": pa.array([], pa.string()),
                        "d_docs": pa.array([], pa.int64()),
                        "d_tok": pa.array([], pa.int64()),
                    }
                )
            nt = np.asarray(t["n_tok"].cast(pa.int64()))
            ones = np.ones(t.num_rows, dtype=np.int64)
            if signed:
                ct = np.asarray(t["_change_type"]).astype(str)
                sign = np.where(
                    np.isin(ct, ("insert", "update_postimage")), 1, -1
                ).astype(np.int64)
            else:
                sign = ones
            part = pa.table(
                {"source": t["source"], "d_docs": sign, "d_tok": sign * nt}
            )
            return (
                part.group_by("source")
                .aggregate([("d_docs", "sum"), ("d_tok", "sum")])
                .rename_columns(["source", "d_docs", "d_tok"])
            )

        out = (
            ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("source")
            .aggregate(Sum("d_docs", alias_name="d_docs"), Sum("d_tok", alias_name="d_tok"))
            .to_pandas()
        )
        return out.set_index("source") if len(out) else pd.DataFrame(
            columns=["d_docs", "d_tok"]
        )

    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "mv"))
    v = t.version()
    mv = _agg_signed(t.scan(columns=["n_tok", "source"]), signed=False)

    for op in (
        lambda: t.merge(updates_from_documents(sf_dir)),
        lambda: t.delete(min_n_tok=60),
    ):
        op()
        delta = _agg_signed(t.changes(v), signed=True)
        v = t.version()
        mv = mv.add(delta, fill_value=0).astype(np.int64)
        mv = mv[(mv["d_docs"] != 0) | (mv["d_tok"] != 0)]

    check = _agg_signed(t.scan(columns=["n_tok", "source"]), signed=False)
    if not mv.sort_index().equals(check.sort_index()):
        raise AssertionError(
            f"incremental MV diverged from recompute:\n{mv}\nvs\n{check}"
        )
    out = mv.sort_index().reset_index()
    return pa.table(
        {
            "source": pa.array(out["source"].astype(str)),
            "n_docs": pa.array(out["d_docs"].to_numpy()),
            "sum_n_tok": pa.array(out["d_tok"].to_numpy()),
        }
    )


def maintenance_partitions(sf_dir: str) -> pa.Table:
    """Metadata-table surface (Delta DESCRIBE DETAIL / Iceberg
    ``.partitions``): ingest -> compact -> read the PARTITIONS metadata
    relation straight from the manifest (no data file opened).  The
    oracle restates the per-source rollup from the base relation, so the
    manifest's row/token accounting is checked against the data it
    claims to describe; the volatile columns (file counts, bytes) are
    covered by pytest invariants instead."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "meta"))
    t.compact(target_file_bytes=8 << 20)
    meta = t.metadata_table("partitions")
    return pa.table(
        {
            "source": meta["partition"],
            "n_rows": meta["rows"].cast(pa.int64()),
            "sum_tok": meta["sum_tok"].cast(pa.int64()),
        }
    )


def maintenance_rename_column(sf_dir: str) -> pa.Table:
    """Column rename/drop WITHOUT rewrite (Delta column-mapping name mode;
    reference registry compatibility=BACKWARD admits field removal on the
    read path, infra/terraform/modules/glue/main.tf:38-66): ingest ->
    rename ``n_tok`` -> ``length`` (metadata-only) -> compact (rewrites
    still carry the frozen PHYSICAL name) -> drop ``length`` -> re-add a
    fresh all-null ``length`` (fresh physical name; stale bytes must not
    resurface) -> scan.  The oracle states the surviving relation exactly:
    (doc_id, source, token n as n_tok via a projection of the pre-drop
    quantity recomputed from text, length all-NULL)."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "rename"))
    t.rename_column("n_tok", "length")
    t.compact(target_file_bytes=8 << 20)
    t.drop_column("length")
    t.evolve_schema([pa.field("length", pa.int64())])
    got = pa.concat_tables(
        ray.get(
            t.scan(columns=["doc_id", "source", "length"]).to_arrow_refs()
        )
    )
    return got.sort_by("doc_id").combine_chunks()


def maintenance_delete_where(sf_dir: str) -> pa.Table:
    """Ingest -> compact -> predicate-STRING DELETE mixing all three
    planner classes (partition equality -> file pruning; integer n_tok
    range -> stats pruning; key-range residual -> row-level evaluation in
    the rewrite actors) -> scan.  The oracle restates the surviving
    relation with the same conjunction negated."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "delwhere"))
    t.compact(target_file_bytes=8 << 20)
    t.delete(
        where="source = 'web' AND n_tok >= 40 AND doc_id < 'doc-000000000400'"
    )
    return _scan_projected(t)


def maintenance_history(sf_dir: str) -> pa.Table:
    """DESCRIBE HISTORY surface (Delta history / Iceberg snapshots analog):
    run a fixed op recipe (ingest -> compact -> MERGE -> RESTORE) and emit
    the deterministic slice of the operation log — (version, parent,
    operation).  Timestamps/job ids are projected away (wall-clock); the
    oracle states the expected commit sequence literally."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "history"))
    t.compact(target_file_bytes=8 << 20)
    t.merge(updates_from_documents(sf_dir))
    t.restore(2)
    rows = t.history()
    return pa.table(
        {
            "version": pa.array([r["version"] for r in rows], pa.int64()),
            "parent": pa.array(
                [r["parent"] if r["parent"] is not None else -1 for r in rows],
                pa.int64(),
            ),
            "operation": pa.array([r["operation"] for r in rows], pa.string()),
        }
    )


def maintenance_scan_where(sf_dir: str) -> pa.Table:
    """SELECT-side predicate pushdown through the oracle gate: ingest ->
    zorder (tight per-file n_tok ranges) -> ``scan(where=...)`` mixing a
    partition condition (file-pruned), an n_tok range (stats-pruned — the
    clustered layout makes the pruning real) and a key-range residual
    (row-filtered)."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "scanwhere"))
    t.zorder(target_file_bytes=1 << 20)
    blocks = ray.get(
        t.scan(
            columns=["doc_id", "n_tok", "source"],
            where="source = 'src3' AND n_tok >= 30 AND n_tok <= 80 "
            "AND doc_id >= 'doc-000000000010'",
        ).to_arrow_refs()
    )
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table(
            {"doc_id": pa.array([], pa.string()),
             "n_tok": pa.array([], pa.int64()),
             "source": pa.array([], pa.string())}
        )
    got = pa.concat_tables(blocks)
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by("doc_id").combine_chunks()


def maintenance_dedup_rows(sf_dir: str) -> pa.Table:
    """Exact dedup ON the lakehouse table (the training-data dedup family
    applied to the north-rule payload): ingest -> append a byte-identical
    copy of every row re-keyed +5_000_000 -> ``Table.dedup_rows()`` (xor
    token fingerprints -> distinct-fp groupby -> dup-proportional loser
    list -> key DELETE) -> scan.  Winners are the smallest key per
    duplicate group, so exactly the original rows survive — the oracle is
    the plain base relation."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "deduprows"))

    def rekey(tok: pa.Table) -> pa.Table:
        ids = pc.utf8_slice_codeunits(tok["doc_id"].combine_chunks(), 4, 16)
        ids = pc.add(pc.cast(ids, pa.int64()), 5_000_000)
        doc_id = pc.binary_join_element_wise(
            "doc-", pc.utf8_lpad(pc.cast(ids, pa.string()), 12, "0"), ""
        )
        return tok.set_column(0, "doc_id", doc_id)

    tune_context()
    t.append(t.scan().map_batches(rekey, batch_format="pyarrow", zero_copy_batch=True))
    assert t.stats()["rows"] > 0
    v = t.dedup_rows()
    assert v is not None
    return _scan_projected(t)


def maintenance_partition_evolution(sf_dir: str) -> pa.Table:
    """Partition evolution through the oracle gate (Iceberg spec
    evolution): ingest a tokens+region table partitioned by ``source``
    (spec 0) -> ``evolve_partitioning("region")`` (metadata-only) ->
    append a re-keyed +3_000_000 copy under the NEW layout (spec 1) ->
    ``compact`` (old-layout bins split per region value = the migration)
    -> scan.  Every surviving file must carry the new spec and the new
    hive layout; the oracle states the doubled relation with the exact
    region rule."""
    from realtime_clickstream_lakehouse_ray.schema import TOKENS_SCHEMA

    schema = TOKENS_SCHEMA.append(pa.field("region", pa.string()))
    root = _scratch_root(sf_dir, "partevo")
    t = Table.create(root, schema=schema)
    tune_context()

    def with_region(docs: pa.Table, offset: int = 0) -> pa.Table:
        base = doc_to_tokens(docs)
        ids = np.asarray(docs["doc_id"].combine_chunks()).astype(np.int64) + offset
        region = np.where(ids % 2 == 0, "even", "odd")
        out = base.append_column("region", pa.array(region.astype(object), pa.string()))
        if offset:
            doc_id = pc.binary_join_element_wise(
                "doc-",
                pc.utf8_lpad(pc.cast(pa.array(ids), pa.string()), 12, "0"),
                "",
            )
            out = out.set_column(0, "doc_id", doc_id)
        return out

    docs = ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text", "source"]
    )
    t.append(
        docs.map_batches(with_region, batch_format="pyarrow", zero_copy_batch=True),
        rows_per_file=64,
    )
    t.evolve_partitioning("region")
    t.append(
        docs.map_batches(
            lambda b: with_region(b, 3_000_000),
            batch_format="pyarrow",
            zero_copy_batch=True,
        ),
        rows_per_file=64,
    )
    t.compact(target_file_bytes=8 << 20)
    assert all((f.spec or 0) == 1 for f in t.files()), "migration incomplete"
    assert all(f.path.startswith("region=") for f in t.files())
    got = pa.concat_tables(
        ray.get(
            t.scan(columns=["doc_id", "n_tok", "source", "region"]).to_arrow_refs()
        )
    )
    got = got.set_column(
        got.column_names.index("n_tok"), "n_tok", got["n_tok"].cast(pa.int64())
    )
    return got.sort_by("doc_id").combine_chunks()


def sql_adhoc(sf_dir: str) -> pa.Table:
    """Ad-hoc SQL consumer surface (``Table.sql`` — the reference's Athena
    path, README.md:113): ingest -> compact -> run an analyst-style
    aggregate whose WHERE the engine auto-extracts for manifest file
    pruning (asserted here: the n_tok condition plus compacted layout must
    prune at least one file).  The oracle is the SAME aggregate stated
    over the raw documents-derived relation."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "sqladhoc"))
    t.zorder(target_file_bytes=1 << 20)
    q = (
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS total_tok, "
        "min(doc_id) AS first_doc, CAST(max(n_tok) AS BIGINT) AS max_tok "
        "FROM t WHERE source = 'src3' AND n_tok >= 30 "
        "GROUP BY source ORDER BY source"
    )
    ex = t.sql_explain(q)
    assert ex["pushdown_where"] == "source = 'src3' AND n_tok >= 30"
    # the partition condition must prune to src3's files alone
    assert 0 < ex["n_files"] < ex["n_files_snapshot"], (
        ex["n_files"], ex["n_files_snapshot"],
    )
    return t.sql(q)


def sql_time_travel(sf_dir: str) -> pa.Table:
    """SQL over time travel: delete a slice, then query the PRE-delete
    snapshot by version — the answer must be blind to the delete.  The
    oracle restates the full-corpus aggregate."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "sqltt"))
    t.compact(target_file_bytes=8 << 20)
    v0 = t.version()
    t.delete(where="n_tok >= 40")
    return t.sql(
        "SELECT source, count(*) AS n_docs, "
        "CAST(sum(n_tok) AS BIGINT) AS total_tok FROM t "
        "GROUP BY source ORDER BY source",
        version=v0,
    )


def maintenance_merge_when(sf_dir: str) -> pa.Table:
    """Conditioned MERGE through the oracle gate (Delta ``WHEN MATCHED AND
    <cond> THEN UPDATE``): ingest -> compact -> merge the deterministic
    update/insert source with ``matched_condition="n_tok >= 40"`` — a
    matched target row takes the update only when ITS n_tok satisfies the
    clause; clause-false matches keep the target row and consume the
    source row; unmatched source keys insert.  The oracle restates the
    conditional update arithmetic over the base relation."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "mergewhen"))
    t.compact(target_file_bytes=8 << 20)
    t.merge(updates_from_documents(sf_dir), matched_condition="n_tok >= 40")
    return _scan_projected(t)


def maintenance_merge_when_delete(sf_dir: str) -> pa.Table:
    """``WHEN MATCHED AND <cond> THEN DELETE``: matched target rows with
    n_tok < 40 are deleted; matched source rows never insert (a matched
    DELETE consumes them); unmatched source keys still insert."""
    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "mergewhendel"))
    t.compact(target_file_bytes=8 << 20)
    t.merge(
        updates_from_documents(sf_dir),
        matched_condition="n_tok < 40",
        matched_action="delete",
    )
    return _scan_projected(t)


def maintenance_snapshot_drift(sf_dir: str) -> pa.Table:
    """Distribution DRIFT between two snapshots, computed from the change
    data feed — the epoch-over-epoch signal a training-data pipeline
    watches (did the corpus grow, which sources churned, how many tokens
    moved): ingest -> compact (v0) -> merge -> ``changes(v0)`` ->
    per-source (n_inserts, n_updates, n_deletes, delta_tokens), where
    delta_tokens is the SIGNED token flow (insert + update_post -
    update_pre - delete).  One vectorized partial per feed batch, then a
    source-keyed groupby of constant-width partials — never the row feed
    on the driver.  The oracle restates the drift from the deterministic
    update/insert rules."""
    from ray.data.aggregate import Sum

    t = build_from_documents(sf_dir, _scratch_root(sf_dir, "drift"))
    t.compact(target_file_bytes=8 << 20)
    v0 = t.version()
    t.merge(updates_from_documents(sf_dir))
    feed = t.changes(v0)

    EMPTY = pa.schema(
        [
            ("source", pa.string()),
            ("n_inserts", pa.int64()),
            ("n_updates", pa.int64()),
            ("n_deletes", pa.int64()),
            ("delta_tokens", pa.int64()),
        ]
    )

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return EMPTY.empty_table()
        ct = b["_change_type"].combine_chunks()
        plus = pc.is_in(
            ct, value_set=pa.array(["insert", "update_postimage"])
        )
        sgn = pc.if_else(plus, 1, -1).cast(pa.int64())
        g = (
            pa.table(
                {
                    "source": b["source"],
                    "n_inserts": pc.equal(ct, "insert").cast(pa.int64()),
                    "n_updates": pc.equal(ct, "update_postimage").cast(pa.int64()),
                    "n_deletes": pc.equal(ct, "delete").cast(pa.int64()),
                    "delta_tokens": pc.multiply(
                        b["n_tok"].combine_chunks().cast(pa.int64()), sgn
                    ),
                }
            )
            .group_by("source")
            .aggregate(
                [
                    ("n_inserts", "sum"),
                    ("n_updates", "sum"),
                    ("n_deletes", "sum"),
                    ("delta_tokens", "sum"),
                ]
            )
        )
        return g.rename_columns(
            ["source", "n_inserts", "n_updates", "n_deletes", "delta_tokens"]
        )

    tune_context()
    agg = (
        feed.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_inserts", alias_name="n_inserts"),
            Sum("n_updates", alias_name="n_updates"),
            Sum("n_deletes", alias_name="n_deletes"),
            Sum("delta_tokens", alias_name="delta_tokens"),
        )
    )
    blocks = [b for b in ray.get(agg.to_arrow_refs()) if b.num_rows]
    out = (
        pa.concat_tables(blocks).sort_by("source")
        if blocks
        else EMPTY.empty_table()
    )
    return pa.table(
        {
            "source": out["source"],
            "n_inserts": out["n_inserts"].cast(pa.int64()),
            "n_updates": out["n_updates"].cast(pa.int64()),
            "n_deletes": out["n_deletes"].cast(pa.int64()),
            "delta_tokens": out["delta_tokens"].cast(pa.int64()),
        }
    )
