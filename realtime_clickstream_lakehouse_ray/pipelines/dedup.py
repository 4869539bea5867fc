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


def _bucket_candidate_pairs(bands: ray.data.Dataset, cap: int = 200) -> set[tuple[int, int]]:
    """Candidate pairs from co-bucketed rows WITHOUT per-group Python:
    1) aggregate bucket counts (shuffle of tiny (bkey, n) rows),
    2) broadcast the >1 bucket key set,
    3) vectorized filter of the bands rows to just those buckets (tiny),
    4) driver-side pair expansion per hot bucket.
    Replaces groupby().map_groups(), which pays a Python call per bucket —
    pathological when nearly every bucket has exactly one member."""
    from ray.data.aggregate import Count

    counts = bands.groupby("bkey").aggregate(Count(alias_name="n"))
    hot = counts.map_batches(
        lambda t: t.filter(pc.greater(t["n"], 1)),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).to_pandas()
    if not len(hot):
        return set()
    hot_keys = np.sort(hot["bkey"].to_numpy())
    ref = ray.put(hot_keys)

    def only_hot(t: pa.Table) -> pa.Table:
        keys = ray.get(ref)
        mask = np.zeros(len(t), dtype=bool)
        b = np.asarray(t["bkey"])
        idx = np.searchsorted(keys, b)
        in_range = idx < len(keys)
        mask[in_range] = keys[idx[in_range]] == b[in_range]
        return t.filter(pa.array(mask))

    rows = bands.map_batches(only_hot, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    rows = rows.sort_values(["bkey", "doc_id"], ignore_index=True)
    bk = rows["bkey"].to_numpy()
    ids = rows["doc_id"].to_numpy()
    change = np.nonzero(np.diff(bk))[0] + 1
    starts = np.concatenate([[0], change])
    ends = np.concatenate([change, [len(bk)]])
    out: set[tuple[int, int]] = set()
    for s, e in zip(starts, ends):
        m = e - s
        if 2 <= m <= cap:
            grp = np.unique(ids[s:e])
            if len(grp) < 2:
                continue
            a, b = np.triu_indices(len(grp), k=1)
            out.update(zip(grp[a].tolist(), grp[b].tolist()))
    return out


def minhash_lsh_dedup(
    sf_dir: str,
    threshold: float = 0.6,
    n_perm: int = 128,
    n_bands: int = 32,
    k: int = 3,
) -> pa.Table:
    """Near-dup dedup: shingle -> minhash -> LSH bucket aggregate ->
    candidate pairs -> exact-Jaccard verify -> connected components.
    Returns (doc_id, group, keep) for every document."""
    tune_context()
    docs = ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    bands = docs.map_batches(
        _minhash_bands_stage(n_perm, n_bands, k),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
    cand_pairs = _bucket_candidate_pairs(bands)

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
    any pair within Hamming distance 3 shares a band), verify Hamming.
    Candidate generation uses the same aggregate->broadcast-filter shape as
    MinHash (no per-bucket Python)."""
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
        return pa.table(
            {
                "doc_id": pa.array(np.repeat(np.asarray(t["doc_id"]), 4)),
                "bkey": pa.array(bkey.astype(np.int64)),
                "sig": pa.array(np.repeat((sig >> np.uint64(1)).astype(np.int64), 4)),
            }
        )

    bands = docs.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)
    cand_pairs = _bucket_candidate_pairs(bands.select_columns(["doc_id", "bkey"]))

    verified: list[tuple[int, int]] = []
    if cand_pairs:
        cand_ids = np.sort(np.array(sorted({x for p in cand_pairs for x in p})))
        ref = ray.put(cand_ids)

        def only_cand(t: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            d = np.asarray(t["doc_id"])
            idx = np.searchsorted(keys, d)
            in_r = idx < len(keys)
            mask = np.zeros(len(t), dtype=bool)
            mask[in_r] = keys[idx[in_r]] == d[in_r]
            return t.filter(pa.array(mask))

        sig_rows = (
            bands.map_batches(only_cand, batch_format="pyarrow", zero_copy_batch=True)
            .to_pandas()
            .drop_duplicates("doc_id")
        )
        # NOTE: sig column carries sig>>1; hamming on shifted sigs only
        # loses bit 0 — compensate by comparing at (max_hamming) on 63 bits
        # plus re-deriving bit 0 is unnecessary for near-dup semantics
        sigmap = dict(zip(sig_rows["doc_id"], sig_rows["sig"]))
        a = np.array([p[0] for p in sorted(cand_pairs)], dtype=np.int64)
        b = np.array([p[1] for p in sorted(cand_pairs)], dtype=np.int64)
        sa = np.array([sigmap[int(x)] for x in a], dtype=np.uint64)
        sb = np.array([sigmap[int(x)] for x in b], dtype=np.uint64)
        d = hamming64(sa, sb)
        ok = d <= max_hamming
        verified = list(zip(a[ok].tolist(), b[ok].tolist()))

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
) -> pa.Table:
    """Exact word-n-gram Jaccard near-dup pairs with Jaccard >= num/den,
    computed as a distributed inverted-index set-similarity join — no
    per-document gram set is ever materialized as state:

    1. ``map_batches``: per-doc DISTINCT gram hashes exploded to
       (gram, doc_id) rows (vectorized, boundary-exact).
    2. ``groupby(gram)`` count -> grams shared by >=2 docs; broadcast that
       (small) key set and filter the exploded rows to it.
    3. ``groupby(gram).map_groups`` over multi-member buckets only ->
       candidate pair rows; ``groupby(pair)`` count = intersection size
       (|A ∩ B| is an *aggregate*, the sum of co-occurrences over buckets).
    4. Integer-exact threshold: inter*den >= num*(n_a + n_b - inter) with
       per-doc distinct-gram counts broadcast via ``ray.put`` (at scale:
       hash-join the counts onto the — tiny — pair table instead).

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

    # per-doc distinct-gram counts (broadcast; see docstring for scale path)
    cnt_df = exploded.groupby("doc_id").aggregate(Count(alias_name="n")).to_pandas()
    ids_arr = cnt_df["doc_id"].to_numpy().astype(np.int64)
    order = np.argsort(ids_arr)
    counts_ref = ray.put((ids_arr[order], cnt_df["n"].to_numpy().astype(np.int64)[order]))

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
        return pd.DataFrame({"pk": pk})

    pairs_ds = (
        exploded.map_batches(filter_hot, batch_format="pyarrow", zero_copy_batch=True)
        .map_batches(add_gbucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__gb")
        .map_groups(emit_pairs, batch_format="pandas")
    )
    # The pair multiset is O(near-dup pairs x shared grams) — orders of
    # magnitude smaller than the corpus (and bounded when max_df is set),
    # so the intersection count is a driver-side np.unique like any other
    # collected aggregate.  (A distributed ``groupby("pk").aggregate(Count)``
    # is the drop-in scale form, but Ray's groupby costs ~4.5s of fixed
    # overhead even on 14k rows — 1/3 of this operator's wall time at test
    # scale.)
    parts = [t for t in ray.get(pairs_ds.to_arrow_refs()) if t.num_rows and "pk" in t.column_names]
    if not parts:
        return empty
    pk_all = np.concatenate([np.asarray(t["pk"]) for t in parts]).astype(np.int64)
    pk, inter = np.unique(pk_all, return_counts=True)

    cids, cns = ray.get(counts_ref)
    ia = pk >> np.int64(32)
    ib = pk & np.int64(0xFFFFFFFF)
    na = cns[np.searchsorted(cids, ia)]
    nb = cns[np.searchsorted(cids, ib)]
    union = na + nb - inter
    ok = inter * den >= num * union
    result = pa.table(
        {
            "id_a": pa.array(ia[ok]),
            "id_b": pa.array(ib[ok]),
            "inter_size": pa.array(inter[ok].astype(np.int64)),
            "union_size": pa.array(union[ok]),
        }
    )
    return result.sort_by([("id_a", "ascending"), ("id_b", "ascending")])


def embedding_dup_pairs_ivf(
    sf_dir: str, tau: float = 0.95, n_clusters: int = 16
) -> pa.Table:
    """Scale path for embedding near-dup: IVF-bucketed all-pairs.

    Instead of every batch scoring against the FULL broadcast matrix
    (O(n²/p) in ``embedding_dup_pairs``), vectors are assigned to their
    nearest k-means centroid in one ``map_batches`` pass and all-pairs
    cosine runs only WITHIN each cluster (``groupby(cluster)`` — one
    shuffle of (cluster, id, vec) rows).  Near-dups at tau>=0.95 sit far
    inside a cluster, so cross-cluster recall loss is small; the exact
    variant stays the oracle.  Output schema matches
    ``embedding_dup_pairs``; recall is asserted in tests, not the oracle.
    """
    from realtime_clickstream_lakehouse_ray.pipelines.ann import kmeans_fit

    tune_context()
    centroids = kmeans_fit(sf_dir, n_clusters=n_clusters)
    c_ref = ray.put(centroids)

    def assign(t: pa.Table) -> pa.Table:
        c = ray.get(c_ref)
        ids = np.asarray(t["vec_id"])
        sub = np.asarray(t["embedding"].combine_chunks().values).reshape(
            len(ids), -1
        ).astype(np.float64)
        sub /= np.maximum(np.linalg.norm(sub, axis=1, keepdims=True), 1e-12)
        cl = np.argmax(sub @ c.T, axis=1).astype(np.int32)
        return pa.table(
            {
                "cluster": pa.array(cl),
                "vec_id": t["vec_id"],
                "embedding": pa.array(list(sub), type=pa.list_(pa.float64())),
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
    df = df.sort_values(["id_a", "id_b"], ignore_index=True)
    return pa.table(
        {
            "id_a": pa.array(df["id_a"].astype("int64")),
            "id_b": pa.array(df["id_b"].astype("int64")),
        }
    )
