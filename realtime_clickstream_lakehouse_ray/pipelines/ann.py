"""Similarity search over the embeddings table.

- ``knn_bruteforce``: exact top-k cosine — each batch computes a partial
  top-k against the broadcast query matrix (numpy matmul in float64 for
  cross-engine determinism); partials (n_queries × k rows per batch) are
  merged like any small aggregate.  This is the baseline and the oracle
  target.
- ``knn_ivf``: the scale path — seeded mini-k-means (Lloyd iterations as
  ``map_batches`` partial sums, centroid update on the driver), then
  search only the ``nprobe`` closest clusters.  Verified by recall vs the
  brute-force baseline in pytest (approximate => rows-only for the
  driver's oracle)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _load_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    tbl = pa.concat_tables(
        ray.get(
            ray.data.read_parquet(
                f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
            ).to_arrow_refs()
        )
    )
    ids = np.asarray(tbl["vec_id"])
    mat = (
        np.asarray(tbl["embedding"].combine_chunks().values)
        .reshape(len(ids), -1)
        .astype(np.float64)
    )
    return ids, mat


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def knn_bruteforce(sf_dir: str, k: int = 10, n_queries: int = 5) -> pa.Table:
    """Exact cosine top-k for the query vectors (vec_id < n_queries),
    excluding self-matches; ties broken by neighbor id (deterministic)."""
    emb_ds = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    q_ids, q_mat = _load_matrix(sf_dir)
    sel = q_ids < n_queries
    q_ids, q_mat = q_ids[sel], _normalize(q_mat[sel])
    q_ref = ray.put((q_ids, q_mat))

    class PartialTopK:
        def __init__(self):
            self.q_ids, self.q = ray.get(q_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids = np.asarray(t["vec_id"])
            sub = _normalize(
                np.asarray(t["embedding"].combine_chunks().values)
                .reshape(len(ids), -1)
                .astype(np.float64)
            )
            sims = self.q @ sub.T  # (n_q, batch)
            out_q, out_n, out_s = [], [], []
            kk = min(k + 1, sims.shape[1])
            for qi in range(len(self.q_ids)):
                top = np.argpartition(-sims[qi], kk - 1)[:kk]
                out_q.append(np.full(len(top), self.q_ids[qi]))
                out_n.append(ids[top])
                out_s.append(sims[qi][top])
            return pa.table(
                {
                    "query_id": pa.array(np.concatenate(out_q)),
                    "neighbor_id": pa.array(np.concatenate(out_n)),
                    "sim": pa.array(np.concatenate(out_s)),
                }
            )

    partials = emb_ds.map_batches(
        PartialTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4)
    )
    merged = pa.concat_tables(ray.get(partials.to_arrow_refs()))
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
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(rows_q)),
            "neighbor_id": pa.array(np.concatenate(rows_n)),
        }
    ).sort_by([("query_id", "ascending"), ("neighbor_id", "ascending")])


def kmeans_fit(
    sf_dir: str, n_clusters: int = 16, n_iters: int = 5, seed: int = 11
) -> np.ndarray:
    """Seeded Lloyd iterations, map_batches partial sums per iteration —
    the driver only ever reduces (n_clusters x dim) partials."""
    emb_ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
    ids, mat = _load_matrix(sf_dir)  # small at test scale; sample at real scale
    rng = np.random.default_rng(seed)
    centroids = _normalize(mat[rng.choice(len(mat), size=n_clusters, replace=False)])
    for _ in range(n_iters):
        c_ref = ray.put(centroids)

        def partial(t: pa.Table, _ref=c_ref) -> pa.Table:
            c = ray.get(_ref)
            sub = _normalize(
                np.asarray(t["embedding"].combine_chunks().values)
                .reshape(len(t), -1)
                .astype(np.float64)
            )
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
    rows belonging to probed clusters are scored."""
    centroids = kmeans_fit(sf_dir, n_clusters=n_clusters)
    ids, mat = _load_matrix(sf_dir)
    sel = ids < n_queries
    q_ids, q_mat = ids[sel], _normalize(mat[sel])
    probe = np.argsort(-(q_mat @ centroids.T), axis=1)[:, :nprobe]  # (n_q, nprobe)
    ref = ray.put((q_ids, q_mat, centroids, probe))

    class ProbedTopK:
        def __init__(self):
            self.q_ids, self.q, self.c, self.probe = ray.get(ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            ids_b = np.asarray(t["vec_id"])
            sub = _normalize(
                np.asarray(t["embedding"].combine_chunks().values)
                .reshape(len(ids_b), -1)
                .astype(np.float64)
            )
            assign = np.argmax(sub @ self.c.T, axis=1)
            out_q, out_n, out_s = [], [], []
            for qi in range(len(self.q_ids)):
                m = np.isin(assign, self.probe[qi])
                if not m.any():
                    continue
                sims = self.q[qi] @ sub[m].T
                kk = min(k + 1, len(sims))
                top = np.argpartition(-sims, kk - 1)[:kk]
                out_q.append(np.full(len(top), self.q_ids[qi]))
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

    partials = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).map_batches(ProbedTopK, batch_format="pyarrow", zero_copy_batch=True, concurrency=(1, 4))
    merged = pa.concat_tables(ray.get(partials.to_arrow_refs()))
    q = np.asarray(merged["query_id"])
    n = np.asarray(merged["neighbor_id"])
    s = np.asarray(merged["sim"])
    keep = q != n
    q, n, s = q[keep], n[keep], s[keep]
    rows_q, rows_n = [], []
    for qi in np.unique(q):
        m = q == qi
        order = np.lexsort((n[m], -s[m]))[:k]
        rows_q.append(np.full(len(order), qi))
        rows_n.append(n[m][order])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(rows_q)),
            "neighbor_id": pa.array(np.concatenate(rows_n)),
        }
    ).sort_by([("query_id", "ascending"), ("neighbor_id", "ascending")])
