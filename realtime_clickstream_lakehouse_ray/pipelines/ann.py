"""Similarity search over the embeddings table.

- ``knn_bruteforce``: exact top-k cosine — each batch computes a partial
  top-k against the broadcast query matrix (numpy matmul in float64 for
  cross-engine determinism); partials (n_queries × k rows per batch) are
  merged like any small aggregate.  This is the baseline and the oracle
  target.
- ``knn_ivf``: the scale path — seeded mini-k-means (Lloyd iterations as
  ``map_batches`` partial sums, centroid update on the driver), then
  search only the ``nprobe`` closest clusters.  At ``nprobe ==
  n_clusters`` the probe is exhaustive and the result must equal the
  brute-force baseline — that configuration is the oracle-checked
  correctness mode; recall at ``nprobe < n_clusters`` is asserted in
  pytest.

Scale shape: the driver never loads the embedding matrix.  Query vectors
are selected with a predicate pushed into ``read_parquet`` (only the
matching row groups leave storage); k-means seeds come from a
distributed deterministic sample (per-batch smallest-hash partials, tiny
driver merge).  Scoring stages are stateless tasks — the broadcast query
matrix is fetched once per worker via ``functions/broadcast.py``, so
parallelism is bounded by blocks × cluster, not an actor-pool cap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.dataset as pads
import ray
import ray.data

from realtime_clickstream_lakehouse_ray.functions.broadcast import get_broadcast


def _emb_ds(sf_dir: str, **kwargs) -> ray.data.Dataset:
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"], **kwargs
    )


def _to_matrix(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = np.asarray(tbl["vec_id"])
    emb = tbl["embedding"].combine_chunks() if isinstance(
        tbl["embedding"], pa.ChunkedArray
    ) else tbl["embedding"]
    mat = np.asarray(emb.values).reshape(len(ids), -1).astype(np.float64)
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _load_query_matrix(sf_dir: str, n_queries: int) -> tuple[np.ndarray, np.ndarray]:
    """Query rows only, with the filter pushed into the parquet read —
    the driver holds n_queries vectors, never the corpus."""
    tbl = pa.concat_tables(
        ray.get(
            _emb_ds(sf_dir, filter=pads.field("vec_id") < n_queries).to_arrow_refs()
        )
    )
    ids, mat = _to_matrix(tbl)
    order = np.argsort(ids)
    return ids[order], _normalize(mat[order])


def _merge_partials(merged: pa.Table, k: int) -> pa.Table:
    """Final exact top-k over the (n_queries x k x n_blocks) partial rows."""
    q = np.asarray(merged["query_id"])
    n = np.asarray(merged["neighbor_id"])
    s = np.asarray(merged["sim"])
    keep = q != n  # drop self-matches
    q, n, s = q[keep], n[keep], s[keep]
    rows_q, rows_n = [], []
    for qi in np.unique(q):
        m = q == qi
        order = np.lexsort((n[m], -s[m]))[:k]
        rows_q.append(np.full(len(order), qi))
        rows_n.append(n[m][order])
    if not rows_q:
        return pa.table(
            {"query_id": pa.array([], pa.int64()), "neighbor_id": pa.array([], pa.int64())}
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(rows_q)),
            "neighbor_id": pa.array(np.concatenate(rows_n)),
        }
    ).sort_by([("query_id", "ascending"), ("neighbor_id", "ascending")])


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5) -> pa.Table:
    """Exact cosine top-k for the query vectors (vec_id < n_queries),
    excluding self-matches; ties broken by neighbor id (deterministic)."""
    q_ref = ray.put(_load_query_matrix(sf_dir, n_queries))

    def partial_topk(t: pa.Table) -> pa.Table:
        q_ids, q = get_broadcast(q_ref)
        ids, sub = _to_matrix(t)
        sub = _normalize(sub)
        sims = q @ sub.T  # (n_q, batch)
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, sims.shape[1])
        for qi in range(len(q_ids)):
            top = np.argpartition(-sims[qi], kk - 1)[:kk]
            out_q.append(np.full(len(top), q_ids[qi]))
            out_n.append(ids[top])
            out_s.append(sims[qi][top])
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = _emb_ds(sf_dir).map_batches(
        partial_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_partials(
        pa.concat_tables(ray.get(partials.to_arrow_refs())), k
    )


def embedding_cluster_assign(sf_dir: str, n_clusters: int = 8) -> ray.data.Dataset:
    """Semantic clustering assignment — the bucketing step of semantic
    dedup / diversity balancing: every vector goes to its nearest
    prototype by cosine.  Prototypes are the ``vec_id < n_clusters``
    rows (deterministic; a fitted codebook would be broadcast the same
    way), loaded with the id filter pushed into the parquet read, so the
    driver holds ``n_clusters`` vectors and never the corpus.  Scoring
    is one stateless vectorized ``map_batches`` (batch × k matmul) —
    streaming, no shuffle, no driver materialization.  Ties break to the
    smallest prototype id (argmax-first over id-sorted prototypes),
    matching the oracle's ``ORDER BY sim DESC, vec_id``."""
    ref = ray.put(_load_query_matrix(sf_dir, n_clusters))

    def assign(t: pa.Table) -> pa.Table:
        c_ids, c_mat = get_broadcast(ref)
        ids, sub = _to_matrix(t)
        sub = _normalize(sub)
        best = np.argmax(sub @ c_mat.T, axis=1)
        return pa.table(
            {"vec_id": pa.array(ids), "cluster_id": pa.array(c_ids[best])}
        )

    return _emb_ds(sf_dir).map_batches(
        assign, batch_format="pyarrow", zero_copy_batch=True
    )


def _sample_rows(
    emb_ds: ray.data.Dataset, n_sample: int, seed: int
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed deterministic sample: each batch keeps its ``n_sample``
    smallest ``splitmix64(vec_id ^ seed)`` rows; the driver merges the
    tiny per-block partials.  Equivalent to a seeded uniform draw (hash
    order is pseudo-random in vec_id) without ever collecting the
    corpus."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import splitmix64

    def local(t: pa.Table) -> pa.Table:
        ids = np.asarray(t["vec_id"])
        h = splitmix64(ids.astype(np.uint64) ^ np.uint64(seed))
        top = np.argsort(h)[:n_sample]
        return t.take(pa.array(np.sort(top))).append_column(
            "__h", pa.array(h[top].astype(np.int64))
        )

    parts = pa.concat_tables(
        ray.get(
            emb_ds.map_batches(
                local, batch_format="pyarrow", zero_copy_batch=True
            ).to_arrow_refs()
        )
    )
    order = np.argsort(np.asarray(parts["__h"]))[:n_sample]
    sel = parts.take(pa.array(np.sort(order)))
    return _to_matrix(sel.drop_columns(["__h"]))


def kmeans_fit(
    sf_dir: str,
    n_clusters: int = 16,
    n_iters: int = 5,
    seed: int = 11,
    fit: str = "sample",
    sample_size: int = 65536,
) -> np.ndarray:
    """Seeded Lloyd k-means with two fit regimes:

    - ``fit="sample"`` (default, the at-scale path): ONE distributed
      deterministic sample pass (``_sample_rows`` — bounded
      ``sample_size`` x dim driver memory), then Lloyd iterates LOCALLY on
      the sample — total corpus scans: one, instead of one per iteration.
      Standard practice for IVF coarse quantizers (faiss trains on a
      sample).  Seeds match the full regime (the n_clusters smallest-hash
      rows); the fitted centroids can differ from the full fit in float
      tie-breaks (Lloyd amplifies last-ulp summation-order differences),
      but every downstream IVF result is regime-insensitive — the
      exhaustive-probe knn_ivf and embedding_dup_pairs_ivf oracles stay
      exact under either fit, which the oracle-parity suite checks.
    - ``fit="full"``: per-iteration distributed partial-sum passes; the
      driver only ever reduces (n_clusters x dim) partials.  Scales, but
      costs ``n_iters`` full scans of the embedding table.
    """
    emb_ds = _emb_ds(sf_dir)
    if fit == "sample":
        from realtime_clickstream_lakehouse_ray.functions.hashing import splitmix64

        sids, smat = _sample_rows(emb_ds, max(sample_size, n_clusters), seed)
        smat = _normalize(smat)
        # same seed rows as the full regime: the n_clusters smallest-hash
        # rows (the sample contains them by construction — it IS the
        # smallest-hash prefix of the corpus)
        h = splitmix64(sids.astype(np.uint64) ^ np.uint64(seed))
        centroids = _normalize(smat[np.argsort(h)[:n_clusters]].copy())
        for _ in range(n_iters):
            assign = np.argmax(smat @ centroids.T, axis=1)
            sums = np.zeros_like(centroids)
            np.add.at(sums, assign, smat)
            cnts = np.bincount(assign, minlength=n_clusters).astype(np.float64)
            nonempty = cnts > 0
            centroids[nonempty] = _normalize(
                sums[nonempty] / cnts[nonempty, None]
            )
        return centroids
    _, seeds = _sample_rows(emb_ds, n_clusters, seed)
    centroids = _normalize(seeds)
    for _ in range(n_iters):
        c_ref = ray.put(centroids)

        def partial(t: pa.Table, _ref=c_ref) -> pa.Table:
            c = get_broadcast(_ref)
            _, sub = _to_matrix(t)
            sub = _normalize(sub)
            assign = np.argmax(sub @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, sub)
            counts = np.bincount(assign, minlength=len(c)).astype(np.float64)
            return pa.table(
                {
                    "cluster": pa.array(np.arange(len(c))),
                    "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                    "count": pa.array(counts),
                }
            )

        parts = pa.concat_tables(
            ray.get(
                emb_ds.map_batches(
                    partial, batch_format="pyarrow", zero_copy_batch=True
                ).to_arrow_refs()
            )
        )
        cl = np.asarray(parts["cluster"])
        sums = np.asarray(parts["sum"].combine_chunks().values).reshape(len(cl), -1)
        cnts = np.asarray(parts["count"])
        agg_s = np.zeros_like(centroids)
        agg_c = np.zeros(len(centroids))
        np.add.at(agg_s, cl, sums)
        np.add.at(agg_c, cl, cnts)
        nonempty = agg_c > 0
        centroids[nonempty] = _normalize(agg_s[nonempty] / agg_c[nonempty, None])
    return centroids


def knn_ivf(
    sf_dir: str,
    k: int = 10,
    n_queries: int = 5,
    n_clusters: int = 16,
    nprobe: int = 4,
) -> pa.Table:
    """IVF approximate top-k: search only the nprobe closest clusters.
    Assignment happens per batch against broadcast centroids; only batches'
    rows belonging to probed clusters are scored.  ``nprobe=n_clusters``
    is the exhaustive (exact, oracle-checked) configuration."""
    centroids = kmeans_fit(sf_dir, n_clusters=n_clusters)
    q_ids, q_mat = _load_query_matrix(sf_dir, n_queries)
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    ref = ray.put((q_ids, q_mat, centroids, probe))

    def probed_topk(t: pa.Table) -> pa.Table:
        q_ids_b, q, c, prb = get_broadcast(ref)
        ids_b, sub = _to_matrix(t)
        sub = _normalize(sub)
        assign = np.argmax(sub @ c.T, axis=1)
        out_q, out_n, out_s = [], [], []
        for qi in range(len(q_ids_b)):
            m = np.isin(assign, prb[qi])
            if not m.any():
                continue
            sims = q[qi] @ sub[m].T
            kk = min(k + 1, len(sims))
            top = np.argpartition(-sims, kk - 1)[:kk]
            out_q.append(np.full(len(top), q_ids_b[qi]))
            out_n.append(ids_b[m][top])
            out_s.append(sims[top])
        if not out_q:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "neighbor_id": pa.array([], pa.int64()),
                    "sim": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "sim": pa.array(np.concatenate(out_s)),
            }
        )

    partials = _emb_ds(sf_dir).map_batches(
        probed_topk, batch_format="pyarrow", zero_copy_batch=True
    )
    return _merge_partials(
        pa.concat_tables(ray.get(partials.to_arrow_refs())), k
    )


# ---- int8 quantization (embedding compression for storage/serving) -------
#
# Per-dimension affine min/max quantization to [0, 255].  min/max are
# order-independent, so the fitted scale is bit-exact across engines, and
# the quantized codes (one double expression per element, no accumulation)
# are oracle-checkable.  The quantized space also makes similarity search
# integer-exact: int products summed in int64 have no float-order issue.


def _dim_minmax(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Per-dimension global (min, max) via per-batch partials: each block
    emits ``dim`` tiny rows; the shuffle moves dims x blocks rows, never
    vectors.  The driver holds 2 x dim doubles."""
    from ray.data.aggregate import Max, Min

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {
                    "dim": pa.array([], pa.int64()),
                    "mn": pa.array([], pa.float64()),
                    "mx": pa.array([], pa.float64()),
                }
            )
        _, mat = _to_matrix(t)
        d = mat.shape[1]
        return pa.table(
            {
                "dim": pa.array(np.arange(d, dtype=np.int64)),
                "mn": pa.array(mat.min(axis=0)),
                "mx": pa.array(mat.max(axis=0)),
            }
        )

    agg = (
        _emb_ds(sf_dir)
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("dim")
        .aggregate(Min("mn", alias_name="mn"), Max("mx", alias_name="mx"))
        .to_pandas()
        .sort_values("dim")
    )
    return agg["mn"].to_numpy(), agg["mx"].to_numpy()


def _quantize(mat: np.ndarray, mn: np.ndarray, mx: np.ndarray) -> np.ndarray:
    """Affine per-dim codes in [0, 255] — the arithmetic is written as ONE
    double expression per element (sub, mul, div, add, floor) so DuckDB
    evaluating the identical formula produces identical bits; degenerate
    dims (mx == mn) code to 0."""
    span = mx - mn
    safe = np.where(span == 0.0, 1.0, span)
    q = np.floor(((mat - mn) * 255.0) / safe + 0.5)
    q = np.where(span == 0.0, 0.0, q)
    return np.clip(q, 0.0, 255.0).astype(np.int64)


def embedding_quantize(sf_dir: str) -> ray.data.Dataset:
    """Quantize every embedding to per-dim int8 codes, exploded to
    ``(vec_id, dim, q)`` rows (the storage layout a feature store or a
    PQ-style index builder consumes).  Two streaming passes: the tiny
    min/max aggregate above, then one stateless ``map_batches`` with the
    (2 x dim) scale broadcast — no shuffle of vector data, no driver
    materialization."""
    mn, mx = _dim_minmax(sf_dir)
    ref = ray.put((mn, mx))

    def encode(t: pa.Table) -> pa.Table:
        lo, hi = get_broadcast(ref)
        ids, mat = _to_matrix(t)
        q = _quantize(mat, lo, hi)
        n, d = q.shape
        return pa.table(
            {
                "vec_id": pa.array(np.repeat(ids, d)),
                "dim": pa.array(np.tile(np.arange(d, dtype=np.int64), n)),
                "q": pa.array(q.reshape(-1)),
            }
        )

    return _emb_ds(sf_dir).map_batches(
        encode, batch_format="pyarrow", zero_copy_batch=True
    )


def knn_quantized(sf_dir: str, k: int = 10, n_queries: int = 5) -> pa.Table:
    """Exact top-k by integer dot product in the quantized space — the
    similarity search an int8-compressed index serves.  Scores are sums
    of int products (< 2^53, so the float64 matmul is exact and
    order-independent) — unlike cosine over doubles, every engine agrees
    bit-for-bit, so the ranking itself is oracle-checked.  Same scale
    shape as ``knn_bruteforce``: broadcast quantized query matrix,
    per-batch partial top-k, tiny partial merge."""
    mn, mx = _dim_minmax(sf_dir)
    # query rows via the pushed-down id filter (raw doubles — the cosine
    # loader normalizes, which would corrupt the affine codes)
    tbl = pa.concat_tables(
        ray.get(
            _emb_ds(sf_dir, filter=pads.field("vec_id") < n_queries).to_arrow_refs()
        )
    )
    ids_raw, mat_raw = _to_matrix(tbl)
    order = np.argsort(ids_raw)
    q_ids = ids_raw[order]
    q_codes = _quantize(mat_raw[order], mn, mx).astype(np.float64)
    ref = ray.put((q_ids, q_codes, mn, mx))

    def partial_topk(t: pa.Table) -> pa.Table:
        qi, qc, lo, hi = get_broadcast(ref)
        ids, sub = _to_matrix(t)
        codes = _quantize(sub, lo, hi).astype(np.float64)
        scores = qc @ codes.T  # exact: int-valued doubles < 2^53
        out_q, out_n, out_s = [], [], []
        kk = min(k + 1, scores.shape[1])
        for row in range(len(qi)):
            top = np.argpartition(-scores[row], kk - 1)[:kk]
            out_q.append(np.full(len(top), qi[row]))
            out_n.append(ids[top])
            out_s.append(scores[row][top].astype(np.int64))
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "neighbor_id": pa.array(np.concatenate(out_n)),
                "score": pa.array(np.concatenate(out_s)),
            }
        )

    merged = pa.concat_tables(
        ray.get(
            _emb_ds(sf_dir)
            .map_batches(partial_topk, batch_format="pyarrow", zero_copy_batch=True)
            .to_arrow_refs()
        )
    )
    q = np.asarray(merged["query_id"])
    n = np.asarray(merged["neighbor_id"])
    s = np.asarray(merged["score"])
    keep = q != n
    q, n, s = q[keep], n[keep], s[keep]
    rows = []
    for qi in np.unique(q):
        m = q == qi
        order = np.lexsort((n[m], -s[m]))[:k]
        rows.append(
            pa.table(
                {
                    "query_id": pa.array(np.full(len(order), qi)),
                    "neighbor_id": pa.array(n[m][order]),
                    "score": pa.array(s[m][order]),
                }
            )
        )
    if not rows:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "neighbor_id": pa.array([], pa.int64()),
                "score": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(rows).sort_by(
        [("query_id", "ascending"), ("neighbor_id", "ascending")]
    )
