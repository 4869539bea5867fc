"""Corpus-level statistics: global word frequencies and per-document
rarity scores — the explode/flat-map family over the ``documents`` table.

Scale shape: the explode NEVER ships raw word rows.  Each batch collapses
its words with an Arrow C++ hash-groupby first (zipf head words become
ONE row per batch), so the shuffle moves per-batch partials — the same
partial-then-finalize discipline as the numeric aggregates
(SURVEY.md §2.6; reference's latent Athena surface, README.md:113).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum

from realtime_clickstream_lakehouse_ray.config import tune_context
from realtime_clickstream_lakehouse_ray.functions.textstats import split_words
from realtime_clickstream_lakehouse_ray.pipelines.relational import topk


def _read_docs(sf_dir: str, columns: list[str]) -> ray.data.Dataset:
    tune_context()
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=columns)


def _word_partials(t: pa.Table) -> pa.Table:
    """Explode one batch's text into words and pre-combine counts
    (vectorized split + flatten + Arrow hash-groupby; no Python rows)."""
    flat = pc.list_flatten(split_words(t["text"]))
    agg = pa.table({"word": flat}).group_by("word").aggregate([("word", "count")])
    return pa.table(
        {"word": agg["word"], "n_part": agg["word_count"].cast(pa.int64())}
    )


def word_frequencies(sf_dir: str) -> ray.data.Dataset:
    """Global word -> total occurrence count (the full vocabulary)."""
    return (
        _read_docs(sf_dir, ["text"])
        .map_batches(_word_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("word")
        .aggregate(Sum("n_part", alias_name="n"))
    )


def word_freq_topk(sf_dir: str, k: int = 100) -> ray.data.Dataset:
    """Top-k corpus words (ties broken by word, so the set is exact)."""
    return topk(
        word_frequencies(sf_dir),
        keys=[("n", "descending"), ("word", "ascending")],
        k=k,
    )


def doc_rarity(sf_dir: str) -> ray.data.Dataset:
    """Per-document rarity: the global frequency of its rarest word
    (``min_df``) and its count of hapax legomena (``n_hapax``) — the
    corpus-novelty signals a data-quality filter keys on.

    Two stages: the vocabulary aggregate above, then one broadcast of the
    (word -> n) table into a second scan — per batch, words flatten and
    look up their counts via a C hash map, and per-doc min / hapax-count
    reduce over the list offsets with ``np.ufunc.reduceat``.  At 100-TB
    vocabulary (where the broadcast no longer fits) the same pipeline
    runs with the lookup replaced by the repo's bucketed hash join on
    ``word`` (relational.bucket_hash_join); the broadcast form is the
    documented small-side regime."""
    vocab = word_frequencies(sf_dir).to_pandas()
    freq_ref = ray.put(pd.Series(vocab["n"].to_numpy(), index=vocab["word"]))

    def fn(t: pa.Table) -> pa.Table:
        freq = ray.get(freq_ref)  # local zero-copy fetch per batch
        words = split_words(t["text"])
        offsets = np.asarray(words.offsets, dtype=np.int64)
        flat = words.flatten().to_pandas()
        n = flat.map(freq).to_numpy(dtype=np.int64)
        starts, lens = offsets[:-1], np.diff(offsets)
        keep = lens > 0
        min_df = np.minimum.reduceat(n, starts[keep])
        n_hapax = np.add.reduceat((n == 1).astype(np.int64), starts[keep])
        return pa.table(
            {
                "doc_id": t["doc_id"].combine_chunks().filter(pa.array(keep)),
                "min_df": pa.array(min_df),
                "n_hapax": pa.array(n_hapax),
            }
        )

    return _read_docs(sf_dir, ["doc_id", "text"]).map_batches(
        fn, batch_format="pyarrow", zero_copy_batch=True
    )
