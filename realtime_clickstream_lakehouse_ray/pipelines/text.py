"""Text-analysis pipelines over the documents table (training-data prep).

Each pipeline is a single vectorized ``map_batches`` over
``read_parquet(columns=...)`` — stateless kernels from
``functions/textstats.py``; the BPE-ish tokenizer compiles its regex once
per actor (stateful stage)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from realtime_clickstream_lakehouse_ray.functions.textstats import (
    language_scores,
    md5_fingerprints,
    split_words,
    winnow_fingerprint_md5,
    stopword_counts,
    unique_word_counts,
    word_counts,
)

# GPT-2-style pre-tokenizer pattern (RE2-compatible subset; both pyarrow and
# DuckDB use RE2, so match counts agree exactly across engines)
BPE_PATTERN = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def _read_docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def text_stats(sf_dir: str) -> ray.data.Dataset:
    """Quality scoring: per-doc char/word/distinct-word counts, stopword
    ratio, and a quality flag (length + stopword-density gates) — the
    standard pre-training corpus filters."""

    def fn(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        n_words = word_counts(words)
        n_uniq = unique_word_counts(words)
        n_stop = stopword_counts(words)
        stop_ratio = n_stop.astype(np.float64) / n_words.astype(np.float64)
        n_chars = np.asarray(pc.utf8_length(t["text"])).astype(np.int64)
        quality_ok = (n_words >= 10) & (n_words <= 1000) & (stop_ratio < 0.5)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_chars": pa.array(n_chars),
                "n_words": pa.array(n_words),
                "n_uniq_words": pa.array(n_uniq),
                "stop_ratio": pa.array(stop_ratio),
                "quality_ok": pa.array(quality_ok),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def source_quality_report(sf_dir: str) -> ray.data.Dataset:
    """Per-source corpus health rollup — the dashboard a data curator
    checks after every ingest: doc counts, quality-gate pass counts and
    word totals per source (mean words derived with the same expression
    order on both engines, so the doubles are bit-identical).  Per-batch
    integer partials collapse before the ONE tiny groupby."""
    from ray.data.aggregate import Sum

    from realtime_clickstream_lakehouse_ray.functions.textstats import (
        quality_mask,
        word_counts,
    )

    def partial(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        n_words = word_counts(words)
        ok = quality_mask(t).astype(np.int64)
        g = (
            pa.table(
                {
                    "source": t["source"],
                    "one": pa.array(np.ones(len(t), dtype=np.int64)),
                    "ok": pa.array(ok),
                    "nw": pa.array(n_words),
                }
            )
            .group_by("source")
            .aggregate([("one", "sum"), ("ok", "sum"), ("nw", "sum")])
        )
        return pa.table(
            {
                "source": g["source"],
                "n_part": g["one_sum"].cast(pa.int64()),
                "ok_part": g["ok_sum"].cast(pa.int64()),
                "nw_part": g["nw_sum"].cast(pa.int64()),
            }
        )

    agg = (
        _read_docs(sf_dir, ["text", "source"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("source")
        .aggregate(
            Sum("n_part", alias_name="n_docs"),
            Sum("ok_part", alias_name="n_quality_ok"),
            Sum("nw_part", alias_name="sum_words"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        n = np.asarray(t["n_docs"], dtype=np.int64)
        sw = np.asarray(t["sum_words"], dtype=np.int64)
        return pa.table(
            {
                "source": t["source"],
                "n_docs": pa.array(n),
                "n_quality_ok": pa.array(
                    np.asarray(t["n_quality_ok"], dtype=np.int64)
                ),
                "sum_words": pa.array(sw),
                "mean_words": pa.array(
                    sw.astype(np.float64) / n.astype(np.float64)
                ),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


def _bpeish_token_counts(t: pa.Table) -> pa.Table:
    """Per batch: one vectorized RE2 scan (Arrow caches the compiled
    pattern per process, so this is a stateless task — no actor-pool cap
    on parallelism; round 1's fixed 4-actor pool starved this stage at
    32 CPUs)."""
    words = split_words(t["text"])
    n_ws = word_counts(words)
    n_bpe = np.asarray(
        pc.count_substring_regex(t["text"], BPE_PATTERN)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "n_tok_ws": pa.array(n_ws),
            "n_tok_bpe": pa.array(n_bpe),
        }
    )


def token_counts(sf_dir: str) -> ray.data.Dataset:
    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        _bpeish_token_counts, batch_format="pyarrow", zero_copy_batch=True
    )


def lang_id(sf_dir: str, threshold: float = 0.0) -> ray.data.Dataset:
    """Heuristic language id (hint-word ratio).  Output carries the exact
    integer numerator/denominator (en_hits, n_words) instead of a rounded
    float score, so the DuckDB oracle comparison is integer-exact (float
    rounding at the 6th decimal can tie-break differently across
    engines)."""

    def fn(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        n_words = word_counts(words)
        score = language_scores(words)
        en_hits = np.rint(score * np.maximum(n_words, 1)).astype(np.int64)
        pred = np.where(score > threshold, "en", "unknown")
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "lang_pred": pa.array(pred),
                "en_hits": pa.array(en_hits),
                "n_words": pa.array(n_words),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprints(sf_dir: str) -> ray.data.Dataset:
    """Content fingerprints: md5 of the whole text (oracle-exact vs
    DuckDB ``md5``) plus a winnowing-style shingle-min fingerprint —
    also oracle-exact now that the shingle hash is md5-derived
    (``winnow_fingerprint_md5``); the xxhash-fast variant
    (``rolling_fingerprint``) stays as the at-scale swap-in."""

    def fn(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "fp_md5": md5_fingerprints(t["text"]),
                "fp_winnow": pa.array(winnow_fingerprint_md5(words)),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )


def text_normalized(sf_dir: str) -> ray.data.Dataset:
    """Training-corpus text normalization: lowercase, collapse runs of
    whitespace to single spaces, strip the ends — all Arrow C++ string
    kernels (both regex engines are RE2, so the oracle's
    ``regexp_replace(..., 'g')`` matches byte-for-byte)."""

    def fn(t: pa.Table) -> pa.Table:
        s = pc.utf8_lower(t["text"])
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim_whitespace(s)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "text_norm": s,
                "n_chars_norm": pc.utf8_length(s).cast(pa.int64()),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
