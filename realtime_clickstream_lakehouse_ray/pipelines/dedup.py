"""Deduplication pipelines: exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (the patterns that survive 100 TB):
- **exact**: content-hash per batch (vectorized) -> hash-partitioned
  ``groupby(fp)`` -> keep min key per group.  The shuffle moves only
  (fp, doc_id) pairs, never the text.
- **MinHash-LSH / SimHash**: signatures per batch -> explode to
  (band_id, band_key, doc_id) rows -> ``groupby`` on the bucket ->
  candidate pairs only from co-bucketed docs -> exact verification of the
  candidates -> connected components.  All-pairs work happens only inside
  LSH buckets (expected O(1) sized); the candidate set is many orders of
  magnitude smaller than n² and is reduced driver-side like any aggregate.
- **embedding-cosine**: each batch computes sims against the broadcast
  (``ray.put``) normalized matrix — O(n²/p) distributed matmul; at real
  scale the same stage runs against an IVF-bucketed subset (see ann.py).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from realtime_clickstream_lakehouse_ray.functions.minhash import (
    band_keys,
    exact_jaccard,
    hamming64,
    minhash_signatures,
    shingle_hashes,
    simhash,
)
from realtime_clickstream_lakehouse_ray.functions.textstats import (
    md5_fingerprints,
    split_words,
)


# ---- exact dedup ---------------------------------------------------------
def exact_dedup(sf_dir: str) -> ray.data.Dataset:
    """Keep the min doc_id per distinct text (hash-partitioned)."""

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "fp": md5_fingerprints(t["text"])})

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, "doc_id")

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .map_groups(keep_first, batch_format="pandas")
    )


# ---- connected components (driver-side over the verified pair set) ------
def _union_find_groups(ids: np.ndarray, pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Map doc_id -> group representative (min member).  The pair set is
    the *verified* candidate output — tiny relative to the corpus — so a
    driver-side union-find is the right tool (same role as collecting an
    aggregate)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {int(i): find(int(i)) for i in ids}


# ---- MinHash + LSH -------------------------------------------------------
def _minhash_bands_stage(n_perm: int, n_bands: int, k: int):
    def fn(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        flat, n_sh = shingle_hashes(words, k=k)
        sigs = minhash_signatures(flat, n_sh, n_perm=n_perm)
        keys = band_keys(sigs, n_bands=n_bands)
        n_docs = len(t)
        doc_ids = np.repeat(np.asarray(t["doc_id"]), n_bands)
        band_id = np.tile(np.arange(n_bands, dtype=np.int32), n_docs)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "band_id": pa.array(band_id),
                "band_key": pa.array(keys.reshape(-1).astype(np.int64)),
            }
        )

    return fn


def _emit_pairs(g: pd.DataFrame) -> pd.DataFrame:
    ids = np.sort(g["doc_id"].to_numpy())
    if len(ids) < 2 or len(ids) > 200:  # skip degenerate mega-buckets
        return pd.DataFrame({"a": [], "b": []}, dtype=np.int64)
    a, b = np.triu_indices(len(ids), k=1)
    return pd.DataFrame({"a": ids[a], "b": ids[b]})


def minhash_lsh_dedup(
    sf_dir: str,
    threshold: float = 0.6,
    n_perm: int = 128,
    n_bands: int = 32,
    k: int = 3,
) -> pa.Table:
    """Near-dup dedup: shingle -> minhash -> LSH bucket groupby ->
    candidate pairs -> exact-Jaccard verify -> connected components.
    Returns (doc_id, group, keep) for every document."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bands = docs.map_batches(
        _minhash_bands_stage(n_perm, n_bands, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cand = (
        bands.groupby(["band_id", "band_key"])
        .map_groups(_emit_pairs, batch_format="pandas")
        .to_pandas()
    )
    cand_pairs = {(int(r.a), int(r.b)) for r in cand.itertuples()} if len(cand) else set()

    # exact verification of the candidate docs' shingle sets (broadcast the
    # candidate subset only — tiny)
    all_ids_tbl = pa.concat_tables(ray.get(docs.to_arrow_refs()))
    cand_ids = sorted({x for p in cand_pairs for x in p})
    verified: list[tuple[int, int]] = []
    if cand_ids:
        id_arr = np.asarray(all_ids_tbl["doc_id"])
        sel = np.isin(id_arr, np.asarray(cand_ids))
        sub = all_ids_tbl.filter(pa.array(sel))
        words = split_words(sub["text"])
        flat, n_sh = shingle_hashes(words, k=k)
        starts = np.zeros(len(n_sh), dtype=np.int64)
        np.cumsum(n_sh[:-1], out=starts[1:])
        sets = {
            int(d): flat[s : s + int(n)]
            for d, s, n in zip(np.asarray(sub["doc_id"]), starts, n_sh)
        }
        for a, b in sorted(cand_pairs):
            if exact_jaccard(sets[a], sets[b]) >= threshold:
                verified.append((a, b))

    ids = np.asarray(all_ids_tbl["doc_id"])
    groups = _union_find_groups(ids, verified)
    group_arr = np.array([groups[int(i)] for i in ids], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "group": pa.array(group_arr),
            "keep": pa.array(group_arr == ids),
        }
    ).sort_by("doc_id")


# ---- SimHash -------------------------------------------------------------
def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """SimHash near-dup: 64-bit signature, 4x16-bit LSH bands (pigeonhole:
    any pair within Hamming distance 3 shares a band), verify Hamming."""
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_stage(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        sig = simhash(words)
        n = len(t)
        doc_ids = np.repeat(np.asarray(t["doc_id"]), 4)
        band_id = np.tile(np.arange(4, dtype=np.int32), n)
        band_key = np.empty((n, 4), dtype=np.int64)
        for b in range(4):
            band_key[:, b] = ((sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)).astype(np.int64)
        sig_rep = np.repeat(sig.astype(np.int64), 4)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids),
                "band_id": pa.array(band_id),
                "band_key": pa.array(band_key.reshape(-1)),
                "sig": pa.array(sig_rep),
            }
        )

    bands = docs.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)

    def emit(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        if len(g) < 2 or len(g) > 200:
            return pd.DataFrame({"a": [], "b": [], "sa": [], "sb": []}, dtype=np.int64)
        ids = g["doc_id"].to_numpy()
        sigs = g["sig"].to_numpy()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"a": ids[ia], "b": ids[ib], "sa": sigs[ia], "sb": sigs[ib]})

    cand = bands.groupby(["band_id", "band_key"]).map_groups(emit, batch_format="pandas").to_pandas()
    verified = []
    if len(cand):
        cand = cand.drop_duplicates(["a", "b"])
        d = hamming64(
            cand["sa"].to_numpy().astype(np.uint64), cand["sb"].to_numpy().astype(np.uint64)
        )
        ok = cand[d <= max_hamming]
        verified = list(zip(ok["a"].astype(int), ok["b"].astype(int)))

    ids = np.asarray(
        pa.concat_tables(
            ray.get(
                ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"]).to_arrow_refs()
            )
        )["doc_id"]
    )
    groups = _union_find_groups(ids, verified)
    group_arr = np.array([groups[int(i)] for i in ids], dtype=np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "group": pa.array(group_arr),
            "keep": pa.array(group_arr == ids),
        }
    ).sort_by("doc_id")


# ---- embedding cosine near-dup ------------------------------------------
def embedding_dup_pairs(sf_dir: str, tau: float = 0.95) -> pa.Table:
    """All pairs with cosine >= tau: per-batch matmul against the broadcast
    L2-normalized matrix (distributed O(n²/p); IVF-bucketed at scale)."""
    emb_ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    full = pa.concat_tables(ray.get(emb_ds.to_arrow_refs()))
    ids = np.asarray(full["vec_id"])
    mat = np.vstack(
        [np.asarray(full["embedding"].combine_chunks().values).reshape(len(ids), -1)]
    ).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    class PairFinder:
        def __init__(self):
            self.ids, self.mat = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            bids = np.asarray(t["vec_id"])
            sub = np.asarray(t["embedding"].combine_chunks().values).reshape(len(bids), -1).astype(np.float64)
            sub /= np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
            sims = sub @ self.mat.T
            bi, gj = np.nonzero((sims >= tau) & (bids[:, None] < self.ids[None, :]))
            return pa.table(
                {"id_a": pa.array(bids[bi]), "id_b": pa.array(self.ids[gj])}
            )

    pairs = emb_ds.map_batches(
        PairFinder, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    )
    out = pa.concat_tables(ray.get(pairs.to_arrow_refs()))
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])
