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
    sf_dir: str, n_clusters: int = 16, n_iters: int = 5, seed: int = 11
) -> np.ndarray:
    """Seeded Lloyd iterations, map_batches partial sums per iteration —
    the driver only ever reduces (n_clusters x dim) partials; centroid
    init comes from the distributed sample above, not a full-matrix
    load."""
    emb_ds = _emb_ds(sf_dir)
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
