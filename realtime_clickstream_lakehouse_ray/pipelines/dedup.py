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
import pyarrow.compute as pc
import ray
import ray.data

from realtime_clickstream_lakehouse_ray.config import tune_context
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
    """Keep the min doc_id per distinct text (hash-partitioned).

    The keep-first reduction is ``aggregate(Min(doc_id))`` — a fully
    vectorized grouped aggregate — NOT ``map_groups``, which would pay one
    Python call per distinct document (pathological when nearly every
    document is unique)."""
    from ray.data.aggregate import Min

    tune_context()

    def fp(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"], "fp": md5_fingerprints(t["text"])})

    return (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(fp, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("fp")
        .aggregate(Min("doc_id", alias_name="doc_id"))
    )


# ---- connected components (driver-side over the verified pair set) ------
def _union_find_groups(pairs: Iterable[tuple[int, int]]) -> dict[int, int]:
    """Map doc_id -> group representative (min member) for every id that
    appears in a verified pair.  The pair set is the *verified* candidate
    output — tiny relative to the corpus — so a driver-side union-find is
    the right tool (same role as collecting an aggregate); ids not in any
    pair are their own representative and never enter this dict."""
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
    return {x: find(x) for x in parent}


# ---- distributed pair machinery (shared by the LSH dedup family) ---------
_PACK_MASK = np.int64(0xFFFFFFFF)


def _check_pack_ids(ids: np.ndarray) -> None:
    """Pairs are packed as (id_a << 32) | id_b in int64; ids outside
    [0, 2^31) would silently corrupt the pack — reject them loudly
    (documented scale limit; re-key wider spaces with dense ids)."""
    if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= (1 << 31)):
        raise ValueError(
            "dedup pair packing requires doc_id in [0, 2^31); "
            "re-key the corpus with dense ids"
        )


def _bucket_candidate_pairs(bands: ray.data.Dataset, cap: int = 200) -> np.ndarray:
    """Candidate pairs from co-bucketed (doc_id, bkey) rows, DISTRIBUTED:
    rows are grouped by ``bkey % B`` (one shuffle, B vectorized Python
    calls — never one per bucket, and never a driver-side expansion loop);
    inside each group every multi-member bucket emits its pairs packed as
    int64.  Only the packed pair set — candidate-proportional, the size of
    any collected aggregate — returns to the driver, deduplicated.

    ``cap`` skips degenerate mega-buckets (an adversarial constant column
    would otherwise cost O(cap'²) per bucket)."""
    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_buckets = max(16, ncpu)

    def tag(t: pa.Table) -> pa.Table:
        gb = (np.asarray(t["bkey"]) % n_buckets).astype(np.int32)
        return t.append_column("__gb", pa.array(gb))

    def emit(g: pa.Table) -> pa.Table:
        g = g.sort_by([("bkey", "ascending"), ("doc_id", "ascending")])
        bk = np.asarray(g["bkey"])
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        _check_pack_ids(ids)
        change = np.nonzero(np.diff(bk))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(bk)]])
        out = []
        for s, e in zip(starts, ends):
            if not (2 <= e - s <= cap):
                continue
            grp = np.unique(ids[s:e])
            if len(grp) < 2:
                continue
            a, b = np.triu_indices(len(grp), k=1)
            out.append((grp[a] << np.int64(32)) | grp[b])
        pk = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        return pa.table({"pk": pa.array(np.unique(pk))})

    parts = (
        bands.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(emit, batch_format="pyarrow")
    )
    chunks = [
        np.asarray(t["pk"])
        for t in ray.get(parts.to_arrow_refs())
        if t.num_rows and "pk" in t.column_names
    ]
    return np.unique(np.concatenate(chunks)) if chunks else np.empty(0, dtype=np.int64)


def _filter_to_ids(ids_ref):
    """Batch filter keeping rows whose doc_id is in the broadcast sorted
    id array (fetched once per worker)."""
    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

    def fn(t: pa.Table) -> pa.Table:
        keys = get_broadcast(ids_ref)
        d = np.asarray(t["doc_id"])
        idx = np.searchsorted(keys, d)
        mask = np.zeros(len(t), dtype=bool)
        in_r = idx < len(keys)
        mask[in_r] = keys[idx[in_r]] == d[in_r]
        return t.filter(pa.array(mask))

    return fn


def _assign_groups(sf_dir: str, groups: dict[int, int]) -> ray.data.Dataset:
    """(doc_id, group, keep) for EVERY document, assigned distributed: the
    verified group map (candidate ids only) is broadcast as two sorted
    arrays; each batch resolves membership with one searchsorted — the
    corpus-sized output never exists on the driver."""
    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

    keys = np.fromiter(sorted(groups), dtype=np.int64, count=len(groups))
    reps = np.array([groups[int(k)] for k in keys], dtype=np.int64)
    ref = ray.put((keys, reps))

    def assign(t: pa.Table) -> pa.Table:
        k, r = get_broadcast(ref)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        grp = ids.copy()
        if len(k):
            idx = np.searchsorted(k, ids)
            in_r = idx < len(k)
            found = np.zeros(len(ids), dtype=bool)
            found[in_r] = k[idx[in_r]] == ids[in_r]
            grp[found] = r[idx[found]]
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "group": pa.array(grp),
                "keep": pa.array(grp == ids),
            }
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id"]
    ).map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)


# ---- MinHash + LSH -------------------------------------------------------
def _minhash_bands_stage(n_perm: int, n_bands: int, k: int):
    from realtime_clickstream_lakehouse_ray.functions.hashing import splitmix64

    def fn(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        flat, n_sh = shingle_hashes(words, k=k)
        sigs = minhash_signatures(flat, n_sh, n_perm=n_perm)
        keys = band_keys(sigs, n_bands=n_bands)
        n_docs = len(t)
        # fold (band_id, band_key) into ONE bucket key so downstream is a
        # single-column aggregate (cheaper shuffle key)
        band_id = np.tile(np.arange(n_bands, dtype=np.uint64), n_docs)
        bkey = splitmix64(keys.reshape(-1) ^ (band_id << np.uint64(56))) >> np.uint64(1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(np.asarray(t["doc_id"]), n_bands)),
                "bkey": pa.array(bkey.astype(np.int64)),
            }
        )

    return fn


def _distinct_shingles(t: pa.Table, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-doc DISTINCT shingle hashes for a batch: (flat sorted-unique
    hashes, doc positions).  Same shingle definition as the banding stage
    and the exact-Jaccard verifier."""
    words = split_words(t["text"])
    flat, n_sh = shingle_hashes(words, k=k)
    doc_idx = np.repeat(np.arange(len(n_sh), dtype=np.int64), n_sh)
    order = np.lexsort((flat, doc_idx))
    g, d = flat[order], doc_idx[order]
    if len(g):
        keep = np.ones(len(g), dtype=bool)
        keep[1:] = (d[1:] != d[:-1]) | (g[1:] != g[:-1])
        g, d = g[keep], d[keep]
    return g, d


def minhash_lsh_dedup(
    sf_dir: str,
    threshold: float = 0.6,
    n_perm: int = 128,
    n_bands: int = 32,
    k: int = 3,
) -> ray.data.Dataset:
    """Near-dup dedup: shingle -> minhash -> LSH banding -> DISTRIBUTED
    candidate pairs -> DISTRIBUTED exact-Jaccard verify (inverted-index
    intersection counts, the ``ngram_jaccard_dedup`` shape) -> driver
    union-find over the verified pairs only -> distributed group
    assignment.  Returns (doc_id, group, keep) for every document.

    Nothing corpus-proportional ever reaches the driver: the driver holds
    the candidate pair set, per-candidate gram counts, and the verified
    pairs — all aggregates of the (small by LSH design) candidate set."""
    tune_context()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bands = docs.map_batches(
        _minhash_bands_stage(n_perm, n_bands, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cand_pk = _bucket_candidate_pairs(bands)

    verified: list[tuple[int, int]] = []
    if len(cand_pk):
        ia = cand_pk >> np.int64(32)
        ib = cand_pk & _PACK_MASK
        cand_ids = np.unique(np.concatenate([ia, ib]))
        ids_ref = ray.put(cand_ids)
        pk_ref = ray.put(cand_pk)

        # candidate docs' distinct shingles, exploded to (g, doc_id) rows
        # in a distributed map_batches over the pruned read
        def explode(t: pa.Table) -> pa.Table:
            g, d = _distinct_shingles(t, k)
            ids = np.asarray(t["doc_id"]).astype(np.int64)
            return pa.table(
                {
                    "g": pa.array((g >> np.uint64(1)).astype(np.int64)),
                    "doc_id": pa.array(ids[d]),
                }
            )

        sub = docs.map_batches(
            _filter_to_ids(ids_ref), batch_format="pyarrow", zero_copy_batch=True
        )
        exploded = sub.map_batches(
            explode, batch_format="pyarrow", zero_copy_batch=True
        ).materialize()

        # per-candidate distinct-gram counts: per-batch partials (docs never
        # split across batches), tiny driver reduce
        def count_rows(t: pa.Table) -> pa.Table:
            ids = np.asarray(t["doc_id"]).astype(np.int64)
            u, c = np.unique(ids, return_counts=True)
            return pa.table(
                {"doc_id": pa.array(u, pa.int64()), "n": pa.array(c.astype(np.int64), pa.int64())}
            )

        cnt_parts = pa.concat_tables(
            [
                t
                for t in ray.get(
                    exploded.map_batches(
                        count_rows, batch_format="pyarrow", zero_copy_batch=True
                    ).to_arrow_refs()
                )
                if t.num_rows and "doc_id" in t.column_names
            ]
        )
        cids = np.asarray(cnt_parts["doc_id"])
        cns_raw = np.asarray(cnt_parts["n"])
        order = np.argsort(cids)
        cids, cns = cids[order], cns_raw[order]

        # intersection sizes via the pair-keyed shuffle: grams bucketed by
        # g % B, each bucket group emits packed pairs RESTRICTED to the
        # candidate pair set; |A ∩ B| = multiplicity of the pair
        ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
        n_gbuckets = max(16, ncpu)

        def add_gb(t: pa.Table) -> pa.Table:
            gb = (np.asarray(t["g"]) % n_gbuckets).astype(np.int32)
            return t.append_column("__gb", pa.array(gb))

        def emit_cand_pairs(g: pa.Table) -> pa.Table:
            from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

            pk_keys = get_broadcast(pk_ref)
            g = g.sort_by([("g", "ascending"), ("doc_id", "ascending")])
            gv = np.asarray(g["g"])
            ids = np.asarray(g["doc_id"]).astype(np.int64)
            change = np.nonzero(np.diff(gv))[0] + 1
            starts = np.concatenate([[0], change])
            ends = np.concatenate([change, [len(gv)]])
            out = []
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                grp = ids[s:e]  # distinct within a gram by construction
                a, b = np.triu_indices(len(grp), k=1)
                out.append((grp[a] << np.int64(32)) | grp[b])
            pk = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
            if len(pk):
                idx = np.searchsorted(pk_keys, pk)
                in_r = idx < len(pk_keys)
                keep = np.zeros(len(pk), dtype=bool)
                keep[in_r] = pk_keys[idx[in_r]] == pk[in_r]
                pk = pk[keep]
            return pa.table({"pk": pa.array(pk)})

        pair_parts = (
            exploded.map_batches(add_gb, batch_format="pyarrow", zero_copy_batch=True)
            .groupby("__gb")
            .map_groups(emit_cand_pairs, batch_format="pyarrow")
        )
        chunks = [
            np.asarray(t["pk"])
            for t in ray.get(pair_parts.to_arrow_refs())
            if t.num_rows and "pk" in t.column_names
        ]
        if chunks:
            pk_all = np.concatenate(chunks)
            pk_u, inter = np.unique(pk_all, return_counts=True)
            pa_ = pk_u >> np.int64(32)
            pb_ = pk_u & _PACK_MASK
            na = cns[np.searchsorted(cids, pa_)]
            nb = cns[np.searchsorted(cids, pb_)]
            union = na + nb - inter
            # same expression shape as functions.minhash.exact_jaccard
            ok = inter / np.maximum(union, 1) >= threshold
            verified = list(zip(pa_[ok].tolist(), pb_[ok].tolist()))

    return _assign_groups(sf_dir, _union_find_groups(verified))


# ---- SimHash -------------------------------------------------------------
def simhash_dedup(sf_dir: str, max_hamming: int = 3) -> ray.data.Dataset:
    """SimHash near-dup: 64-bit signature, 4x16-bit LSH bands (pigeonhole:
    any pair within Hamming distance 3 shares a band), DISTRIBUTED verify:
    the signature travels with each band row, so every bucket group checks
    Hamming in place and emits only CONFIRMED pairs — the driver receives
    the verified pair set alone (the union-find input, candidate-
    proportional), never signatures or corpus rows.  Group assignment is a
    distributed searchsorted over the broadcast group map."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import splitmix64

    tune_context()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_stage(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        sig = simhash(words)
        n = len(t)
        band_id = np.tile(np.arange(4, dtype=np.uint64), n)
        band_key = np.empty((n, 4), dtype=np.uint64)
        for b in range(4):
            band_key[:, b] = (sig >> np.uint64(16 * b)) & np.uint64(0xFFFF)
        bkey = splitmix64(band_key.reshape(-1) ^ (band_id << np.uint64(48))) >> np.uint64(1)
        # NOTE: sig column carries sig>>1 (Arrow int64-safe); Hamming on the
        # 63 kept bits — bit 0's loss is absorbed by the distance threshold
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(np.asarray(t["doc_id"]), 4)),
                "bkey": pa.array(bkey.astype(np.int64)),
                "sig": pa.array(np.repeat((sig >> np.uint64(1)).astype(np.int64), 4)),
            }
        )

    bands = docs.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)
    pk, _ = _bucket_verified_pairs_hamming(bands, max_hamming)
    verified = list(zip((pk >> np.int64(32)).tolist(), (pk & _PACK_MASK).tolist()))
    return _assign_groups(sf_dir, _union_find_groups(verified))


def simhash_signatures(sf_dir: str) -> ray.data.Dataset:
    """(doc_id, sig) — 48-bit md5-vote SimHash relation, ORACLE-EXACT:
    every arithmetic step (md5-derived word hash, per-bit ±1 votes,
    majority sign, bit reassembly) is integer arithmetic the DuckDB oracle
    replays — the SQL-replicable-hash pattern ``hll_user_registers``
    established for murmur3 fmix32, applied to simhash.  The xxhash-based
    :func:`simhash_dedup` stays the fast path; this relation certifies the
    signature math itself."""
    from realtime_clickstream_lakehouse_ray.functions.minhash import simhash_md5

    tune_context()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        sig = simhash_md5(split_words(t["text"]))
        return pa.table({"doc_id": t["doc_id"], "sig": pa.array(sig.astype(np.int64))})

    return docs.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


def minhash_signatures_md5(sf_dir: str, n_perm: int = 16) -> ray.data.Dataset:
    """(doc_id, perm, sig) — md5-based MinHash signature relation,
    ORACLE-EXACT: gram md5 hash, per-permutation HUGEINT affine mod 2^64,
    per-doc min, >>16 BIGINT projection — every step is integer
    arithmetic DuckDB replays with the SAME inlined (a_i, b_i) literal
    table (``minhash_perm_params``).  Completes the SQL-replicable-
    signature pattern for both LSH families (simhash got its twin in
    ``simhash_signatures``); the xxhash 128-perm production path stays
    ``minhash_lsh_dedup``."""
    from realtime_clickstream_lakehouse_ray.functions.minhash import (
        minhash_md5_signatures,
    )

    tune_context()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def stage(t: pa.Table) -> pa.Table:
        words = split_words(t["text"])
        _, sigs = minhash_md5_signatures(words, n_perm=n_perm)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        n = sigs.shape[1]
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(ids, n)),
                "perm": pa.array(np.tile(np.arange(n, dtype=np.int64), len(ids))),
                "sig": pa.array(sigs.reshape(-1)),
            }
        )

    return docs.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)


def simhash_md5_dedup(sf_dir: str, max_hamming: int = 3) -> pa.Table:
    """Hamming-verified near-dup pairs over the 48-bit md5-vote SimHash —
    the FULL banded simhash pipeline (4×12-bit LSH bands: pigeonhole-
    complete for Hamming<=3, distributed in-bucket verify) against a
    brute-force SQL oracle that recomputes every signature and checks
    ``bit_count(xor(sig_a, sig_b)) <= max_hamming`` over all pairs.
    Banding completeness + exact in-bucket verification make the Ray pair
    set EQUAL the SQL pair set, so simhash leaves the no-oracle column."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import splitmix64
    from realtime_clickstream_lakehouse_ray.functions.minhash import simhash_md5

    tune_context()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def sig_stage(t: pa.Table) -> pa.Table:
        sig = simhash_md5(split_words(t["text"]))
        n = len(t)
        band_id = np.tile(np.arange(4, dtype=np.uint64), n)
        band_key = np.empty((n, 4), dtype=np.uint64)
        for b in range(4):
            band_key[:, b] = (sig >> np.uint64(12 * b)) & np.uint64(0xFFF)
        bkey = splitmix64(band_key.reshape(-1) ^ (band_id << np.uint64(48))) >> np.uint64(1)
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(np.asarray(t["doc_id"]), 4)),
                "bkey": pa.array(bkey.astype(np.int64)),
                "sig": pa.array(np.repeat(sig.astype(np.int64), 4)),
            }
        )

    bands = docs.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)
    # cap=None: the oracle-equality claim requires exhaustive in-bucket
    # verification — no mega-bucket skip (see _bucket_verified_pairs_hamming)
    pk, ham = _bucket_verified_pairs_hamming(bands, max_hamming, cap=None)
    return pa.table(
        {
            "id_a": pa.array(pk >> np.int64(32)),
            "id_b": pa.array(pk & _PACK_MASK),
            "hamming": pa.array(ham.astype(np.int64)),
        }
    ).sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def _bucket_verified_pairs_hamming(
    bands: ray.data.Dataset, max_hamming: int, cap: int | None = 200
) -> tuple[np.ndarray, np.ndarray]:
    """Hamming-verified pairs from co-bucketed (doc_id, bkey, sig) rows,
    one shuffle: group by ``bkey % B``, and inside each bucket compute the
    pairwise Hamming distance on the co-located signatures — candidate
    generation and verification fused into the same distributed stage.
    Returns (packed (a<<32|b) pair array, per-pair Hamming distance),
    deduplicated by pair.

    ``cap`` bounds per-band-bucket verification work (O(cap²) pairs): the
    approximate production path keeps the default so an adversarial
    constant column cannot cost O(n²), at the price of dropping pairs
    inside mega-buckets.  ``cap=None`` verifies every bucket exhaustively —
    required by the oracle-EXACT ``simhash_md5_dedup`` pipeline, whose
    claimed equality with the brute-force SQL pair set would otherwise
    silently break on a skewed/low-entropy corpus (>cap co-located
    signatures in one 12-bit band)."""
    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_buckets = max(16, ncpu)

    def tag(t: pa.Table) -> pa.Table:
        gb = (np.asarray(t["bkey"]) % n_buckets).astype(np.int32)
        return t.append_column("__gb", pa.array(gb))

    def emit(g: pa.Table) -> pa.Table:
        g = g.sort_by([("bkey", "ascending"), ("doc_id", "ascending")])
        bk = np.asarray(g["bkey"])
        ids = np.asarray(g["doc_id"]).astype(np.int64)
        sig = np.asarray(g["sig"]).astype(np.uint64)
        _check_pack_ids(ids)
        change = np.nonzero(np.diff(bk))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(bk)]])
        out, hams = [], []
        for s, e in zip(starts, ends):
            if e - s < 2 or (cap is not None and e - s > cap):
                continue
            grp, first = np.unique(ids[s:e], return_index=True)
            if len(grp) < 2:
                continue
            gs = sig[s:e][first]
            a, b = np.triu_indices(len(grp), k=1)
            d = hamming64(gs[a], gs[b])
            ok = d <= max_hamming
            if ok.any():
                out.append((grp[a[ok]] << np.int64(32)) | grp[b[ok]])
                hams.append(d[ok].astype(np.int64))
        pk = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        hm = np.concatenate(hams) if hams else np.empty(0, dtype=np.int64)
        upk, first = np.unique(pk, return_index=True)
        return pa.table({"pk": pa.array(upk), "ham": pa.array(hm[first])})

    parts = (
        bands.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(emit, batch_format="pyarrow")
    )
    chunks = [
        (np.asarray(t["pk"]), np.asarray(t["ham"]))
        for t in ray.get(parts.to_arrow_refs())
        if t.num_rows and "pk" in t.column_names
    ]
    if not chunks:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
    pk_all = np.concatenate([c[0] for c in chunks])
    hm_all = np.concatenate([c[1] for c in chunks])
    upk, first = np.unique(pk_all, return_index=True)
    return upk, hm_all[first]


# ---- embedding cosine near-dup ------------------------------------------
# past this the broadcast matrix no longer fits comfortably in a worker
# heap and the IVF-bucketed regime wins (same planner shape as
# relational.auto_hash_join's broadcast-vs-shuffle decision)
EMBED_BROADCAST_BYTES = 128 << 20


def embedding_dup_pairs(sf_dir: str, tau: float = 0.95) -> pa.Table:
    """Regime-choosing front for embedding near-dup: parquet footer stats
    (``size_bytes()`` — no data I/O) pick

    - the BROADCAST O(n²/p) matmul when the whole embedding matrix fits in
      a worker heap (small corpora / test scale), else
    - the IVF-bucketed path (:func:`embedding_dup_pairs_ivf`) whose only
      shuffle is within-cluster — the 100-TB regime.

    Both regimes emit the identical exact-cosine-verified pair set (the
    IVF path multi-probe-assigns for full recall and verifies with exact
    cosine), so the dispatch is invisible to callers and to the oracle."""
    emb_ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    est = emb_ds.size_bytes()
    if est is not None and est > EMBED_BROADCAST_BYTES:
        return embedding_dup_pairs_ivf(sf_dir, tau=tau)
    return embedding_dup_pairs_broadcast(sf_dir, tau=tau)


def embedding_dup_pairs_broadcast(sf_dir: str, tau: float = 0.95) -> pa.Table:
    """All pairs with cosine >= tau: per-batch matmul against the broadcast
    L2-normalized matrix (distributed O(n²/p); small-regime twin of the
    IVF path — ``embedding_dup_pairs`` chooses between them by size)."""
    emb_ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    full = pa.concat_tables(ray.get(emb_ds.to_arrow_refs()))
    ids = np.asarray(full["vec_id"])
    mat = np.vstack(
        [np.asarray(full["embedding"].combine_chunks().values).reshape(len(ids), -1)]
    ).astype(np.float64)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    ref = ray.put((ids, mat))

    def pair_finder(t: pa.Table) -> pa.Table:
        # stateless task; the broadcast matrix is fetched once per worker
        from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

        ids_g, mat_g = get_broadcast(ref)
        bids = np.asarray(t["vec_id"])
        sub = np.asarray(t["embedding"].combine_chunks().values).reshape(len(bids), -1).astype(np.float64)
        sub /= np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
        sims = sub @ mat_g.T
        bi, gj = np.nonzero((sims >= tau) & (bids[:, None] < ids_g[None, :]))
        return pa.table({"id_a": pa.array(bids[bi]), "id_b": pa.array(ids_g[gj])})

    pairs = emb_ds.map_batches(
        pair_finder, batch_format="pyarrow", zero_copy_batch=True
    )
    out = pa.concat_tables(ray.get(pairs.to_arrow_refs()))
    return out.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


# ---- exact n-gram Jaccard (inverted-index set-similarity join) -----------
def ngram_jaccard_dedup(
    sf_dir: str,
    num: int = 4,
    den: int = 5,
    n: int = 3,
    max_df: int | None = None,
    prefilter=None,
) -> pa.Table:
    """Exact word-n-gram Jaccard near-dup pairs with Jaccard >= num/den,
    computed as a distributed inverted-index set-similarity join — no
    per-document gram set is ever materialized as state:

    1. ``map_batches``: per-doc DISTINCT gram hashes exploded to
       (gram, doc_id) rows (vectorized, boundary-exact).
    2. ``groupby(gram)`` count -> grams shared by >=2 docs; broadcast that
       (small) key set and filter the exploded rows to it.
    3. gram-bucket ``map_groups`` -> per-bucket DEDUPED partial pair counts
       (pk, c); a second pk-hash-bucket shuffle sums partials with one
       vectorized ``np.unique`` + ``add.reduceat`` per bucket = |A ∩ B|.
       Both reduces are distributed — no pair multiset ever hits the driver.
    4. Integer-exact threshold: inter*den >= num*(n_a + n_b - inter) with
       per-doc distinct-gram counts computed for CANDIDATE ids only (the
       pair-proportional set) and broadcast via ``ray.put`` — the same
       candidate-restricted regime ``minhash_lsh_dedup`` uses; the
       threshold itself applies distributed and only final near-dup pairs
       are collected.

    ``max_df`` (scale knob, default off = exact): drop grams appearing in
    more than ``max_df`` docs before pair expansion — classic
    prefix-filter-style pruning that bounds hot-bucket O(df^2) blowup at
    the cost of underestimating intersections of pairs that only share
    ultra-common grams (which cannot reach a high threshold anyway).

    Output: (id_a, id_b, inter_size, union_size), id_a < id_b, sorted —
    all-integer so the DuckDB oracle comparison is exact (no float
    rounding hazards).
    """
    from ray.data.aggregate import Count

    from realtime_clickstream_lakehouse_ray.functions.minhash import ngram_hashes_distinct

    tune_context()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def explode(t: pa.Table) -> pa.Table:
        if prefilter is not None:
            # composed-pipeline hook (e.g. the quality gate in
            # corpus_clean): a stateless row predicate applied before gram
            # explosion, so clustering happens over the SURVIVORS only
            t = t.filter(pa.array(prefilter(t)))
        words = split_words(t["text"])
        g, d, _ = ngram_hashes_distinct(words, n=n)
        ids = np.asarray(t["doc_id"])
        # candidate pairs are packed as (id_a << 32) | id_b in int64
        # downstream; ids outside [0, 2^31) would silently corrupt the
        # pack/unpack, so reject them loudly (documented scale limit — use
        # a surrogate dense id for wider key spaces)
        if len(ids) and (int(ids.min()) < 0 or int(ids.max()) >= (1 << 31)):
            raise ValueError(
                "ngram_jaccard_dedup requires doc_id in [0, 2^31) for "
                "int64 pair packing; re-key the corpus with dense ids"
            )
        return pa.table(
            {
                "g": pa.array((g >> np.uint64(1)).astype(np.int64)),
                "doc_id": pa.array(ids[d]),
            }
        )

    # materialized once: (int64, int64) rows, orders of magnitude smaller
    # than the text; reused by the count and bucket branches below
    exploded = docs.map_batches(
        explode, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    empty = pa.table(
        {
            "id_a": pa.array([], pa.int64()),
            "id_b": pa.array([], pa.int64()),
            "inter_size": pa.array([], pa.int64()),
            "union_size": pa.array([], pa.int64()),
        }
    )

    # grams shared by >=2 docs (and under the df cap, if any)
    df_counts = exploded.groupby("g").aggregate(Count(alias_name="df"))
    hi = np.int64(max_df) if max_df is not None else np.iinfo(np.int64).max

    def hot_only(t: pa.Table) -> pa.Table:
        dfv = np.asarray(t["df"])
        return t.filter(pa.array((dfv > 1) & (dfv <= hi)))

    hot = df_counts.map_batches(
        hot_only, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()
    if not len(hot):
        return empty
    hot_keys_ref = ray.put(np.sort(hot["g"].to_numpy().astype(np.int64)))

    def filter_hot(t: pa.Table) -> pa.Table:
        keys = ray.get(hot_keys_ref)
        b = np.asarray(t["g"])
        idx = np.searchsorted(keys, b)
        in_r = idx < len(keys)
        mask = np.zeros(len(t), dtype=bool)
        mask[in_r] = keys[idx[in_r]] == b[in_r]
        return t.filter(pa.array(mask))

    # grams are bucketed (g % B) before the shuffle so pair expansion costs
    # B vectorized group calls, not one Python call per multi-member gram —
    # the same no-per-bucket-Python rule the LSH candidate path follows
    n_gbuckets = 64

    def add_gbucket(t: pa.Table) -> pa.Table:
        gb = (np.asarray(t["g"]) % n_gbuckets).astype(np.int32)
        return t.append_column("__gb", pa.array(gb))

    def emit_pairs(gdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((gdf["doc_id"].to_numpy(), gdf["g"].to_numpy()))
        g = gdf["g"].to_numpy()[order]
        ids = gdf["doc_id"].to_numpy().astype(np.int64)[order]
        change = np.nonzero(np.diff(g))[0] + 1
        starts = np.concatenate([[0], change])
        ends = np.concatenate([change, [len(g)]])
        out = []
        for s, e in zip(starts, ends):
            if e - s < 2:
                continue
            grp = ids[s:e]  # distinct within a gram by construction
            a, b = np.triu_indices(len(grp), k=1)
            out.append((grp[a] << np.int64(32)) | grp[b])
        pk = np.concatenate(out) if out else np.empty(0, dtype=np.int64)
        # bucket-local partial counts: one (pk, c) row per distinct pair in
        # this gram bucket, so the second shuffle moves deduped partials
        upk, c = np.unique(pk, return_counts=True)
        return pd.DataFrame({"pk": upk, "c": c.astype(np.int64)})

    pairs_partial = (
        exploded.map_batches(filter_hot, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_gbucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(emit_pairs, batch_format="pandas")
    )

    # |A ∩ B| finalization stays DISTRIBUTED: a pair's partials land in one
    # pk-hash bucket, where a vectorized np.unique + add.reduceat sums them.
    # Nothing corpus-proportional ever reaches the driver on this operator.
    n_pbuckets = 64

    def add_pbucket(t: pa.Table) -> pa.Table:
        pb = (np.asarray(t["pk"]) % n_pbuckets).astype(np.int32)
        return t.append_column("__pb", pa.array(pb))

    def reduce_pk(gdf: pd.DataFrame) -> pd.DataFrame:
        pk = gdf["pk"].to_numpy()
        c = gdf["c"].to_numpy().astype(np.int64)
        order = np.argsort(pk, kind="mergesort")
        pk, c = pk[order], c[order]
        upk, idx = np.unique(pk, return_index=True)
        return pd.DataFrame({"pk": upk, "inter": np.add.reduceat(c, idx)})

    inter_ds = (
        pairs_partial.map_batches(add_pbucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__pb")
        .map_groups(reduce_pk, batch_format="pandas")
        .materialize()  # candidate-pair-proportional; reused twice below
    )

    # candidate doc-id set (pair-proportional) -> per-doc distinct-gram
    # counts for CANDIDATES ONLY, the same candidate-restricted broadcast
    # minhash_lsh_dedup uses — never an all-corpus count table
    id_parts = [
        np.unique(
            np.concatenate(
                [np.asarray(t["pk"]) >> np.int64(32), np.asarray(t["pk"]) & np.int64(0xFFFFFFFF)]
            )
        )
        for t in ray.get(inter_ds.to_arrow_refs())
        if t.num_rows and "pk" in t.column_names
    ]
    if not id_parts:
        return empty
    cand_ids = np.unique(np.concatenate(id_parts))
    cand_ref = ray.put(cand_ids)

    def filter_cand(t: pa.Table) -> pa.Table:
        from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

        ids = get_broadcast(cand_ref)
        b = np.asarray(t["doc_id"])
        idx = np.searchsorted(ids, b)
        in_r = idx < len(ids)
        mask = np.zeros(len(t), dtype=bool)
        mask[in_r] = ids[idx[in_r]] == b[in_r]
        return t.filter(pa.array(mask))

    cnt_df = (
        exploded.map_batches(filter_cand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("doc_id")
        .aggregate(Count(alias_name="n"))
        .to_pandas()  # candidate-proportional rows only
    )
    cids_arr = cnt_df["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(cids_arr)
    counts_ref = ray.put((cids_arr[order], cnt_df["n"].to_numpy().astype(np.int64)[order]))

    # integer-exact threshold applied distributed; only near-dup pairs
    # (the final result) are collected
    def finish(t: pa.Table) -> pa.Table:
        from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast

        cids, cns = get_broadcast(counts_ref)
        pk = np.asarray(t["pk"]).astype(np.int64)
        inter = np.asarray(t["inter"]).astype(np.int64)
        ia = pk >> np.int64(32)
        ib = pk & np.int64(0xFFFFFFFF)
        na = cns[np.searchsorted(cids, ia)]
        nb = cns[np.searchsorted(cids, ib)]
        union = na + nb - inter
        ok = inter * den >= num * union
        return pa.table(
            {
                "id_a": pa.array(ia[ok]),
                "id_b": pa.array(ib[ok]),
                "inter_size": pa.array(inter[ok]),
                "union_size": pa.array(union[ok]),
            }
        )

    out_parts = [
        t
        for t in ray.get(
            inter_ds.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True).to_arrow_refs()
        )
        if t.num_rows and "id_a" in t.column_names
    ]
    if not out_parts:
        return empty
    return pa.concat_tables(out_parts).sort_by(
        [("id_a", "ascending"), ("id_b", "ascending")]
    )


def embedding_dup_pairs_ivf(
    sf_dir: str, tau: float = 0.95, n_clusters: int = 16, n_assign: int = 2
) -> pa.Table:
    """Scale path for embedding near-dup: IVF-bucketed all-pairs.

    Instead of every batch scoring against the FULL broadcast matrix
    (O(n²/p) in ``embedding_dup_pairs``), vectors are MULTI-ASSIGNED to
    their ``n_assign`` nearest k-means centroids in one ``map_batches``
    pass and all-pairs cosine runs only WITHIN each cluster
    (``groupby(cluster)`` — one shuffle of (cluster, id, vec) rows,
    ``n_assign``× replicated).  Every emitted pair is verified with the
    exact cosine, so the output is a guaranteed SUBSET of
    ``embedding_dup_pairs``; multi-probe assignment catches near-dups that
    straddle a cluster boundary, so at tau>=0.95 the subset is the full
    set on this corpus — the exact-pairs SQL serves as a real oracle, with
    the planted-dup pytest covering recall in the approximate regime.
    """
    from realtime_clickstream_lakehouse_ray.pipelines.ann import kmeans_fit

    tune_context()
    centroids = kmeans_fit(sf_dir, n_clusters=n_clusters)
    c_ref = ray.put(centroids)
    n_probe = min(n_assign, n_clusters)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        ids = np.asarray(t["vec_id"])
        sub = np.asarray(t["embedding"].combine_chunks().values).reshape(
            len(ids), -1
        ).astype(np.float64)
        sub /= np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
        sims_c = sub @ c.T
        # top-n_probe centroids per vector, row replicated per assignment
        top = np.argpartition(-sims_c, n_probe - 1, axis=1)[:, :n_probe].astype(np.int32)
        rep = np.repeat(np.arange(len(ids)), n_probe)
        return pa.table(
            {
                "cluster": pa.array(top.reshape(-1)),
                "vec_id": pa.array(np.asarray(ids)[rep]),
                "embedding": pa.array(list(sub[rep]), type=pa.list_(pa.float64())),
            }
        )

    def pairs_in_cluster(g: pd.DataFrame) -> pd.DataFrame:
        ids = g["vec_id"].to_numpy()
        mat = np.vstack(g["embedding"].to_numpy())
        sims = mat @ mat.T
        ai, bj = np.nonzero((sims >= tau) & (ids[:, None] < ids[None, :]))
        return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bj]})

    pairs = (
        ray.data.read_parquet(
            f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
        )
        .map_batches(assign, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("cluster")
        .map_groups(pairs_in_cluster, batch_format="pandas")
    )
    df = pairs.to_pandas()
    if "id_a" not in df.columns:  # every cluster group came back empty
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())})
    # multi-assignment can surface the same pair in two shared clusters
    df = df.drop_duplicates().sort_values(["id_a", "id_b"], ignore_index=True)
    return pa.table(
        {
            "id_a": pa.array(df["id_a"].astype("int64")),
            "id_b": pa.array(df["id_b"].astype("int64")),
        }
    )


# ---- distributed connected components (dedup-cluster resolution) ----------
def connected_components(
    edges: pa.Table | ray.data.Dataset,
    col_a: str = "id_a",
    col_b: str = "id_b",
    max_iters: int = 64,
) -> ray.data.Dataset:
    """Connected components by distributed hash-min label propagation —
    the "pairs -> cluster id" resolution step every near-dup family needs
    (the driver-side union-find in ``minhash_lsh_dedup`` is the small-set
    regime; this is the scale path for when the pair set itself is big).

    Every node starts labelled with itself; each round, every edge pushes
    its endpoint's current label to the other endpoint and each node keeps
    the MINIMUM label seen (one bucketed hash join + one groupby-min per
    round, both over the candidate-proportional edge/label tables — the
    corpus never participates).  Labels are non-increasing and bounded
    below by the component minimum, so ``sum(label)`` is a strictly
    decreasing convergence witness: a round that leaves it unchanged is
    the fixpoint.  Rounds needed = graph diameter (dedup clusters are
    shallow; pointer-jumping would halve long chains if ever needed).

    Returns (node, cluster): every node that appears in an edge, labelled
    with its component's minimum node id."""
    from ray.data.aggregate import Min

    from realtime_clickstream_lakehouse_ray.pipelines.relational import bucket_hash_join

    if isinstance(edges, pa.Table):
        if edges.num_rows == 0:
            return ray.data.from_arrow(
                pa.table(
                    {"node": pa.array([], pa.int64()), "cluster": pa.array([], pa.int64())}
                )
            )
        edges = ray.data.from_arrow(edges.select([col_a, col_b]))

    def symmetrize(t: pa.Table) -> pa.Table:
        a = np.asarray(t[col_a]).astype(np.int64)
        b = np.asarray(t[col_b]).astype(np.int64)
        return pa.table(
            {
                "src": pa.array(np.concatenate([a, b])),
                "dst": pa.array(np.concatenate([b, a])),
            }
        )

    sym = edges.map_batches(
        symmetrize, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()

    def init_lbl(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["src"], "lab": t["src"]})

    lbl = (
        sym.map_batches(init_lbl, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("node")
        .aggregate(Min("lab", alias_name="lab"))
        .materialize()
    )
    total = lbl.sum("lab")

    def msg(t: pa.Table) -> pa.Table:
        return pa.table({"node": t["dst"], "lab": t["lab"]})

    for _ in range(max_iters):
        msgs = bucket_hash_join(sym, lbl, "src", "node").map_batches(
            msg, batch_format="pyarrow", zero_copy_batch=True
        )
        # materialize per round: the next round's lineage must not re-run
        # this one (iterative datasets otherwise recompute exponentially)
        lbl = (
            lbl.union(msgs)
            .groupby("node")
            .aggregate(Min("lab", alias_name="lab"))
            .materialize()
        )
        new_total = lbl.sum("lab")
        if new_total == total:  # fixpoint: no label decreased anywhere
            break
        total = new_total

    def pin_types(t: pa.Table) -> pa.Table:
        # empty groupby blocks type Min output as double — pin int64
        return pa.table(
            {"node": t["node"].cast(pa.int64()), "lab": t["lab"].cast(pa.int64())}
        )

    return lbl.map_batches(pin_types, batch_format="pyarrow", zero_copy_batch=True)


def dup_clusters(sf_dir: str) -> ray.data.Dataset:
    """Near-dup clusters over the exact n-gram Jaccard pair graph: every
    document that has at least one >=0.8-Jaccard partner, labelled with
    its connected component's minimum doc_id (``cluster``)."""
    pairs = ngram_jaccard_dedup(sf_dir)
    cc = connected_components(pairs)

    def rename(t: pa.Table) -> pa.Table:
        # empty groupby blocks type Min output as double — pin int64
        return pa.table(
            {
                "doc_id": t["node"].cast(pa.int64()),
                "cluster": t["lab"].cast(pa.int64()),
            }
        )

    return cc.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)


def corpus_clean(sf_dir: str) -> ray.data.Dataset:
    """Composed end-to-end cleaning pipeline — the 'make me a training
    corpus' user journey as ONE oracle-checked operator:

    1. quality gate (``functions.textstats.quality_mask`` — the
       text_stats rule) applied STATELESSLY per batch;
    2. exact + near-dup clustering over the survivors (>=0.8 word-3-gram
       Jaccard, the ``ngram_jaccard_dedup`` machinery with the gate as
       its prefilter; exact duplicates have Jaccard 1.0 so one pass
       covers both);
    3. keep ONE canonical document per cluster (the component-minimum
       doc_id from distributed connected components).

    Scale shape: the gate is a pure row predicate (recomputed per stage —
    no corpus-sized id broadcast anywhere); the only broadcast is the
    DUP-PROPORTIONAL non-canonical id list.  Output: (doc_id, source,
    n_chars) of the clean corpus."""
    from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast
    from realtime_clickstream_lakehouse_ray.functions.textstats import quality_mask

    tune_context()
    pairs = ngram_jaccard_dedup(sf_dir, prefilter=quality_mask)
    cc = connected_components(pairs)
    drop_parts = [
        np.asarray(t["node"])[np.asarray(t["lab"]) != np.asarray(t["node"])]
        for t in ray.get(cc.to_arrow_refs())
        if t.num_rows and "node" in t.column_names
    ]
    drop = (
        np.unique(np.concatenate(drop_parts).astype(np.int64))
        if drop_parts
        else np.empty(0, dtype=np.int64)
    )
    drop_ref = ray.put(drop)

    def keep_fn(t: pa.Table) -> pa.Table:
        m = quality_mask(t)
        ids = np.asarray(t["doc_id"]).astype(np.int64)
        d = get_broadcast(drop_ref)
        if len(d):
            idx = np.searchsorted(d, ids)
            in_r = idx < len(d)
            hit = np.zeros(len(ids), dtype=bool)
            hit[in_r] = d[idx[in_r]] == ids[in_r]
            m &= ~hit
        return t.filter(pa.array(m)).select(["doc_id", "source", "n_chars"])

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text", "source", "n_chars"],
    ).map_batches(keep_fn, batch_format="pyarrow", zero_copy_batch=True)


# ---- exact repeated-substring spans (suffix-array-style dedup) ------------
def substring_dup_spans(sf_dir: str, window: int = 32) -> ray.data.Dataset:
    """Exact repeated-substring detection (the "dedup repeated spans"
    operator of Lee et al., *Deduplicating Training Data Makes Language
    Models Better* — their suffix-array pass re-expressed as a window-hash
    exchange): every char position whose ``window``-byte substring occurs
    >= 2 times ANYWHERE in the corpus (other docs or the same doc) is
    marked, and marked positions are merged into per-document spans
    ``[span_start, span_end)`` with the number of marked windows per span.

    Shape (what survives 100 TB):
    - stage 1 (stateless ``map_batches``): one polynomial rolling hash per
      byte position, computed over the batch's concatenated string buffer
      in ``window`` vectorized passes — no per-row Python, no gather until
      the final per-doc slice selection.  Emits ``(h, doc_id, p)``.
    - stage 2 (one shuffle): rows co-locate by ``h % B``; each of the B
      groups finds multi-occurrence hashes with one argsort + run-length
      pass and emits only the marked ``(doc_id, p)`` rows — output is
      duplicate-proportional, like any aggregate.
    - stage 3 (one small shuffle over survivors): positions co-locate by
      ``doc_id % B``; one lexsort + diff merges touching/overlapping
      windows (gap <= window) into spans.

    Exactness: two *different* substrings colliding under the 64-bit hash
    would need ~2^32 windows (birthday bound) — negligible against random
    text and this fixture; a paranoid deployment carries the first window
    bytes for an in-bucket verify at ~window x the exchange volume.  At
    stride 1 the exchange is ~20 bytes/char; the winnowed fingerprint op
    (``text.fingerprints``) is the cheap prefilter that bounds which docs
    enter this exact pass at scale.
    """
    tune_context()
    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    n_buckets = max(16, ncpu)
    L = int(window)
    base = np.uint64(1000003)

    def window_hashes(t: pa.Table) -> pa.Table:
        col = t["text"].combine_chunks().cast(pa.large_string())
        offsets = np.frombuffer(
            col.buffers()[1], dtype=np.int64, count=len(col) + 1, offset=col.offset * 8
        )
        buf = np.frombuffer(col.buffers()[2], dtype=np.uint8)
        doc_start, n_bytes = offsets[:-1], np.diff(offsets)
        n_win = np.maximum(n_bytes - L + 1, 0)
        total = int(n_win.sum())
        empty = pa.table(
            {
                "h": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "p": pa.array([], pa.int64()),
            }
        )
        if total == 0:
            return empty
        # rolling hash over the whole concatenated buffer (contiguous
        # slices, no gather), then one fancy-indexed gather of the valid
        # (non-boundary-crossing) positions per document
        nb = len(buf)
        m = nb - L + 1
        hfull = np.zeros(m, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for j in range(L):
                hfull *= base
                hfull += buf[j : j + m]
        doc_rep = np.repeat(np.arange(len(col), dtype=np.int64), n_win)
        first = np.cumsum(n_win) - n_win
        local_p = np.arange(total, dtype=np.int64) - np.repeat(first, n_win)
        g = doc_start[doc_rep] + local_p
        return pa.table(
            {
                "h": pa.array(hfull[g].view(np.int64)),
                "doc_id": pc.take(t["doc_id"].combine_chunks(), pa.array(doc_rep)),
                "p": pa.array(local_p),
            }
        )

    def tag_h(t: pa.Table) -> pa.Table:
        gb = (np.asarray(t["h"]).view(np.uint64) % np.uint64(n_buckets)).astype(
            np.int32
        )
        return t.append_column("__gb", pa.array(gb))

    def mark(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "p": pa.array([], pa.int64())}
            )
        h = np.asarray(g["h"]).view(np.uint64)
        order = np.argsort(h, kind="stable")
        hs = h[order]
        brk = np.concatenate([[True], hs[1:] != hs[:-1]])
        run = np.cumsum(brk) - 1
        counts = np.bincount(run)
        keep = counts[run] >= 2
        idx = order[keep]
        return pa.table(
            {
                "doc_id": pc.take(g["doc_id"].combine_chunks(), pa.array(idx)),
                "p": pc.take(g["p"].combine_chunks(), pa.array(idx)),
            }
        )

    def tag_doc(t: pa.Table) -> pa.Table:
        db = (np.asarray(t["doc_id"]) % n_buckets).astype(np.int32)
        return t.append_column("__db", pa.array(db))

    def spans(g: pa.Table) -> pa.Table:
        if g.num_rows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "span_start": pa.array([], pa.int64()),
                    "span_end": pa.array([], pa.int64()),
                    "n_windows": pa.array([], pa.int64()),
                }
            )
        d = np.asarray(g["doc_id"]).astype(np.int64)
        p = np.asarray(g["p"]).astype(np.int64)
        order = np.lexsort((p, d))
        d, p = d[order], p[order]
        brk = np.concatenate(
            [[True], (d[1:] != d[:-1]) | (p[1:] - p[:-1] > L)]
        )
        starts = np.nonzero(brk)[0]
        last = np.concatenate([starts[1:] - 1, [len(p) - 1]])
        n_windows = np.diff(np.concatenate([starts, [len(p)]]))
        return pa.table(
            {
                "doc_id": pa.array(d[starts]),
                "span_start": pa.array(p[starts]),
                "span_end": pa.array(p[last] + L),
                "n_windows": pa.array(n_windows.astype(np.int64)),
            }
        )

    marked = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(window_hashes, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(tag_h, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(mark, batch_format="pyarrow")
    )
    return (
        marked.map_batches(tag_doc, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__db")
        .map_groups(spans, batch_format="pyarrow")
    )


# ---- content-defined chunking (CDC) --------------------------------------
_CDC_WINDOW = 16
_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _splitmix64_np(x: np.ndarray) -> np.ndarray:
    z = (x.astype(np.uint64) + np.uint64(0x9E3779B97F4A7C15)) & _M64
    z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M64
    z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M64
    return z ^ (z >> np.uint64(31))


_GEAR = _splitmix64_np(np.arange(256))


def cdc_chunk_table(
    payload: "pa.Array",
    doc_ids: np.ndarray,
    mask_bits: int = 6,
    window: int = _CDC_WINDOW,
    content_md5: bool = False,
) -> pa.Table:
    """Content-defined chunking of binary/utf8 payloads (the FastCDC/gear
    family used by storage dedup and long-document near-dup pipelines):
    cut wherever an XOR-gear rolling hash of the last ``window`` bytes has
    ``mask_bits`` low zero bits -> expected chunk ~2^mask_bits bytes, and
    boundaries move WITH content (insertions only perturb chunks that
    overlap the edit — the shift-resistance property exact fixed-size
    blocking lacks; pytest asserts it).

    Fully vectorized and batch-composition-invariant: the rolling hash is
    ``XOR_{k<W} GEAR[b[i-k]] << k`` computed over the batch's flat byte
    buffer in W shifted XOR passes; positions whose window would cross a
    document boundary are simply invalid cut sites (the hash there is
    polluted by the neighbor doc, but those positions are masked OUT, so a
    document chunks identically no matter which batch it rides in).
    Chunk fingerprints are position-mixed byte hashes XOR-reduced per
    chunk with ONE ``np.bitwise_xor.reduceat`` — no per-chunk Python.

    Returns (doc_id, chunk_idx, start, length, fp:int64) — one row per
    chunk; zero-length docs emit no rows."""
    big = (
        payload.combine_chunks().cast(pa.large_binary())
        if isinstance(payload, pa.ChunkedArray)
        else payload.cast(pa.large_binary())
    )
    offsets = np.frombuffer(
        big.buffers()[1], dtype=np.int64, count=len(big) + 1, offset=big.offset * 8
    )
    base = offsets[0]
    lengths = offsets[1:] - offsets[:-1]
    data = np.frombuffer(big.buffers()[2], dtype=np.uint8)[base: base + int(lengths.sum())]
    n = len(data)
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "length": pa.array([], pa.int64()),
            "fp": pa.array([], pa.int64()),
        }
    )
    if n == 0:
        return empty
    g = _GEAR[data]
    h = g.copy()
    for k in range(1, window):
        h[k:] ^= g[:-k] << np.uint64(k)
    # valid cut sites: window fully inside the doc, and never at a doc's
    # byte 0 (a cut there is the chunk start already)
    row_of = np.repeat(np.arange(len(lengths), dtype=np.int64), lengths)
    pos_in_doc = np.arange(n, dtype=np.int64) - np.repeat(offsets[:-1] - base, lengths)
    mask = np.uint64((1 << mask_bits) - 1)
    cuts = (h & mask == 0) & (pos_in_doc >= window - 1) & (pos_in_doc > 0)
    cut_idx = np.nonzero(cuts)[0]
    # chunk starts: every doc start + every cut position; reduceat segments
    doc_starts = (offsets[:-1] - base)[lengths > 0]
    starts = np.unique(np.concatenate([doc_starts, cut_idx]))
    seg_doc = row_of[starts]
    seg_end = np.append(starts[1:], n)
    # a doc's last segment ends at the doc end, not the next doc's start —
    # by construction seg boundaries include every doc start, so seg_end
    # never crosses a doc boundary
    seg_len = seg_end - starts
    pos_in_chunk = np.arange(n, dtype=np.int64) - np.repeat(starts, seg_len)
    mixed = _splitmix64_np(
        data.astype(np.uint64)
        ^ ((pos_in_chunk.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)) & _M64)
    )
    fp = np.bitwise_xor.reduceat(mixed, starts)
    # chunk_idx within each doc
    dstart_idx = np.searchsorted(starts, doc_starts)
    seg_per_doc = np.diff(np.append(dstart_idx, len(starts)))
    chunk_idx = np.arange(len(starts), dtype=np.int64) - np.repeat(dstart_idx, seg_per_doc)
    cols = {
        "doc_id": pa.array(doc_ids[seg_doc]),
        "chunk_idx": pa.array(chunk_idx),
        "start": pa.array(starts - (offsets[:-1] - base)[seg_doc]),
        "length": pa.array(seg_len),
        "fp": pa.array((fp >> np.uint64(1)).astype(np.int64)),
    }
    if content_md5:
        # chunk-content md5 (the SQL-replicable chunk identity, same
        # per-row-C-call pattern as textstats.md5_fingerprints); the XOR
        # fp above stays the fast non-oracle fingerprint
        import hashlib

        mv = memoryview(data)
        cols["chunk_md5"] = pa.array(
            [
                hashlib.md5(mv[int(s): int(e)]).hexdigest()
                for s, e in zip(starts, seg_end)
            ]
        )
    return pa.table(cols)


def cdc_chunks(sf_dir: str, mask_bits: int = 6) -> ray.data.Dataset:
    """CDC chunk relation over the documents corpus (text bytes as the
    payload): one stateless vectorized ``map_batches``, no shuffle."""
    tune_context()

    def fn(t: pa.Table) -> pa.Table:
        return cdc_chunk_table(
            t["text"].cast(pa.binary()), np.asarray(t["doc_id"]), mask_bits=mask_bits
        )

    return ray.data.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    ).map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def cdc_dup_chunks(sf_dir: str, mask_bits: int = 6) -> ray.data.Dataset:
    """Storage-dedup accounting: chunks whose CONTENT recurs across the
    corpus, with copy counts and reclaimable bytes — chunk rows are
    pre-collapsed per batch before the ONE key-keyed groupby.  Chunk
    identity is the content md5 (SQL-replicable: the DuckDB oracle
    re-chunks with the same gear arithmetic and groups by
    ``md5(substr(text, start+1, length))``), so this operator is
    oracle-checked end to end — boundaries AND contents."""
    from ray.data.aggregate import Sum as _Sum

    tune_context()

    def chunk_fn(t: pa.Table) -> pa.Table:
        return cdc_chunk_table(
            t["text"].cast(pa.binary()),
            np.asarray(t["doc_id"]),
            mask_bits=mask_bits,
            content_md5=True,
        )

    def partial(t: pa.Table) -> pa.Table:
        g = (
            pa.table({"chunk_md5": t["chunk_md5"], "length": t["length"]})
            .group_by("chunk_md5")
            .aggregate([("length", "sum"), ("length", "count")])
        )
        return pa.table(
            {
                "chunk_md5": g["chunk_md5"],
                "bytes_part": g["length_sum"].cast(pa.int64()),
                "n_part": g["length_count"].cast(pa.int64()),
            }
        )

    agg = (
        ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
        .map_batches(chunk_fn, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("chunk_md5")
        .aggregate(_Sum("n_part", alias_name="n_copies"), _Sum("bytes_part", alias_name="total_bytes"))
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_copies"], 2)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
