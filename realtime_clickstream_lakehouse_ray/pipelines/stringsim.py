"""String-similarity join (edit distance <= k) as a Ray-Data pipeline.

The operator Ray Data lacks: ``A JOIN B ON levenshtein(a, b) <= k``.
Composition — distinct-first + SymSpell deletion-neighborhood blocking,
complete for Levenshtein (no missed pairs), all per-record work
vectorized:

0. **Distinct collapse** (shuffle 1, keyed ``hash(text) % B``): duplicate
   texts — the dominant mass in fuzzy-key corpora — fold to one
   representative row carrying the member-key list (a real Arrow
   ``list<int64>`` column, so every later shuffle stays plain-Arrow), so
   candidate generation and DP verification run over DISTINCT strings
   only (work tracks vocabulary, not row count); the full pair output is
   reconstructed at the end by vectorized member expansion.
1. **Variant emission** (`map_batches`): every distinct string emits u64
   hashes of all its <= k-deletion variants (``functions/editdist.py``).
   If ``lev(a, b) <= k`` the two variant sets share a member (SymSpell
   property), so hash-equal variants are a COMPLETE candidate generator;
   hash collisions only add candidates — the DP verify keeps it exact.
2. **Candidate expansion** (shuffle 2, keyed ``variant_hash % B``): pairs
   for ALL variant runs in a bucket are built at once with run-length
   arithmetic (no Python per variant); lexsorting runs by (hash, text)
   orients every pair as text_a < text_b for free; per-bucket pre-dedup
   shrinks shuffle 3.
3. **Verify** (shuffle 3, keyed by distinct-pair): cross-bucket duplicate
   candidates collapse, then the pair-vectorized Levenshtein DP (O(Lmax)
   numpy passes per chunk) keeps pairs with dist <= k.
4. **Member expansion** (`map_batches`, no shuffle): cross products of
   the two member lists (dist >= 1 pairs) plus all within-group pairs
   (dist = 0) — output-sized work, which is irreducible.

Scale notes: candidate volume tracks TRUE near-pair density over the
vocabulary (~1.2x true distinct pairs measured on random keys) instead
of the quadratic cross product of length- or prefix-blocking; variants
per record are O(L^k/k!) — this targets short keys (names, titles,
codes; L <~ 40, k <= 2).  For long-text near-dup use the MinHash/
SimHash family in ``dedup.py``.

Reference analog: fuzzy-match QA joins on the Athena surface
(/root/reference/README.md:113).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from realtime_clickstream_lakehouse_ray.config import tune_context
from realtime_clickstream_lakehouse_ray.functions.editdist import (
    deletion_variant_hashes,
    levenshtein_pairs,
    to_char_matrix,
)
from realtime_clickstream_lakehouse_ray.functions.hashing import hash64, splitmix64

_CHUNK = 1 << 18  # verified pairs per kernel call — bounds [P, L] scratch


def _num_buckets() -> int:
    ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
    return max(4, 2 * ncpu)


def _pairs_within_runs(run_sizes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(left, right) index pairs i<j inside consecutive runs of the given
    sizes, positions global over sum(run_sizes) — pure run-length math."""
    n = int(run_sizes.sum())
    run_start_first = np.cumsum(run_sizes) - run_sizes
    run_start = np.repeat(run_start_first, run_sizes)
    pos = np.arange(n) - run_start
    total = int(pos.sum())
    right = np.repeat(np.arange(n), pos)
    left = (
        np.arange(total) - np.repeat(np.cumsum(pos) - pos, pos) + np.repeat(run_start, pos)
    )
    return left, right


def _list_take(col, idx: np.ndarray) -> pa.Array:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.take(pa.array(idx, pa.int64()))


def _empty_pairs() -> pa.Table:
    return pa.table(
        {
            "key_a": pa.array([], pa.int64()),
            "key_b": pa.array([], pa.int64()),
            "dist": pa.array([], pa.int64()),
        }
    )


def similarity_self_join(
    ds: ray.data.Dataset,
    key_col: str,
    text_col: str,
    k: int = 2,
    num_buckets: int | None = None,
) -> ray.data.Dataset:
    """All pairs (key_a < key_b) with ``levenshtein(text_a, text_b) <= k``.

    Returns columns (key_a, key_b, dist)."""
    nb = num_buckets or _num_buckets()
    mem_type = pa.list_(pa.int64())

    # ---- stage 0: collapse duplicate texts, keep member-key lists ------
    def tag_text(t: pa.Table) -> pa.Table:
        tb = (hash64(t[text_col]) % np.uint64(nb)).astype(np.int32)
        return pa.table(
            {"key": t[key_col].cast(pa.int64()), "txt": t[text_col], "tb": pa.array(tb)}
        )

    def collapse(g: pa.Table) -> pa.Table:
        txt_np = g["txt"].to_numpy(zero_copy_only=False)
        keys = np.asarray(g["key"])
        order = np.lexsort((keys, txt_np))  # members sorted within run
        txt_np, keys = txt_np[order], keys[order]
        new = np.ones(len(txt_np), dtype=bool)
        new[1:] = txt_np[1:] != txt_np[:-1]
        starts = np.nonzero(new)[0]
        offsets = np.append(starts, len(txt_np)).astype(np.int64)
        members = pa.ListArray.from_arrays(
            pa.array(offsets), pa.array(keys, pa.int64())
        )
        return pa.table({"txt": pa.array(txt_np[starts]), "members": members})

    # materialized because it fans out to two consumers (variant join +
    # within-group expansion); it is vocabulary-sized — duplicate texts
    # are already collapsed — and streams back out of the object store
    distinct = (
        ds.map_batches(tag_text, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("tb")
        .map_groups(collapse, batch_format="pyarrow")
        .materialize()
    )

    # ---- stage 1: deletion-variant hashes over distinct texts ----------
    def variants(t: pa.Table) -> pa.Table:
        mat, lens = to_char_matrix(t["txt"])
        h, r = deletion_variant_hashes(mat, lens, k)
        return pa.table(
            {
                "h": pa.array(h.view(np.int64)),
                "vb": pa.array((h % np.uint64(nb)).astype(np.int32)),
                "txt": _list_take(t["txt"], r),
                "members": _list_take(t["members"], r),
            }
        )

    # ---- stage 2: run-length candidate expansion per variant bucket ----
    def expand(g: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "txt_a": pa.array([], pa.string()),
                "txt_b": pa.array([], pa.string()),
                "mem_a": pa.array([], mem_type),
                "mem_b": pa.array([], mem_type),
            }
        )
        n = len(g)
        if n < 2:
            return empty
        h = np.asarray(g["h"])
        txt_np = g["txt"].to_numpy(zero_copy_only=False)
        order = np.lexsort((txt_np, h))  # runs of h, text-ascending inside
        h, txt_np = h[order], txt_np[order]
        new = np.ones(n, dtype=bool)
        new[1:] = h[1:] != h[:-1]
        sizes = np.diff(np.append(np.nonzero(new)[0], n))
        left, right = _pairs_within_runs(sizes)
        if not len(left):
            return empty
        # text-ascending inside each run => txt[left] < txt[right] always
        # (texts are globally distinct), so pairs come out oriented
        dup = pd.DataFrame(
            {"a": txt_np[left], "b": txt_np[right]}
        ).duplicated().to_numpy()
        left, right = left[~dup], right[~dup]
        return pa.table(
            {
                "txt_a": pa.array(txt_np[left]),
                "txt_b": pa.array(txt_np[right]),
                "mem_a": _list_take(g["members"], order[left]),
                "mem_b": _list_take(g["members"], order[right]),
            }
        )

    def tag_pair(t: pa.Table) -> pa.Table:
        pb = (
            (hash64(t["txt_a"]) ^ splitmix64(hash64(t["txt_b"])))
            % np.uint64(nb)
        ).astype(np.int32)
        return t.append_column("pb", pa.array(pb))

    # ---- stage 3: cross-bucket dedup + vectorized DP verify -------------
    def verify(g: pa.Table) -> pa.Table:
        dup = pd.DataFrame(
            {
                "a": g["txt_a"].to_numpy(zero_copy_only=False),
                "b": g["txt_b"].to_numpy(zero_copy_only=False),
            }
        ).duplicated().to_numpy()
        keep = np.nonzero(~dup)[0]
        am, al = to_char_matrix(_list_take(g["txt_a"], keep))
        bm, bl = to_char_matrix(_list_take(g["txt_b"], keep))
        masks = []
        dists = []
        for s in range(0, len(keep), _CHUNK):
            e = s + _CHUNK
            d = levenshtein_pairs(am[s:e], al[s:e], bm[s:e], bl[s:e])
            masks.append(d <= k)
            dists.append(d)
        mask = np.concatenate(masks) if masks else np.zeros(0, bool)
        dist = np.concatenate(dists) if dists else np.zeros(0, np.int32)
        hit = keep[mask]
        return pa.table(
            {
                "mem_a": _list_take(g["mem_a"], hit),
                "mem_b": _list_take(g["mem_b"], hit),
                "dist": pa.array(dist[mask].astype(np.int64)),
            }
        )

    cross = (
        distinct.map_batches(variants, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("vb")
        .map_groups(expand, batch_format="pyarrow")
        .map_batches(tag_pair, batch_format="pyarrow")
        .groupby("pb")
        .map_groups(verify, batch_format="pyarrow")
    )

    # ---- stage 4: member expansion (output-sized, no shuffle) -----------
    def explode_cross(t: pa.Table) -> pa.Table:
        if not len(t):
            return _empty_pairs()
        ma = t["mem_a"].combine_chunks() if isinstance(t["mem_a"], pa.ChunkedArray) else t["mem_a"]
        mb = t["mem_b"].combine_chunks() if isinstance(t["mem_b"], pa.ChunkedArray) else t["mem_b"]
        la = pc.list_value_length(ma).to_numpy().astype(np.int64)
        lb = pc.list_value_length(mb).to_numpy().astype(np.int64)
        flat_a = ma.flatten().to_numpy()
        flat_b = mb.flatten().to_numpy()
        reps = la * lb
        total = int(reps.sum())
        j = np.arange(total) - np.repeat(np.cumsum(reps) - reps, reps)
        a_off = np.repeat(np.cumsum(la) - la, reps)
        b_off = np.repeat(np.cumsum(lb) - lb, reps)
        lb_rep = np.repeat(lb, reps)
        ka = flat_a[a_off + j // lb_rep]
        kb = flat_b[b_off + j % lb_rep]
        swap = ka > kb
        return pa.table(
            {
                "key_a": pa.array(np.where(swap, kb, ka)),
                "key_b": pa.array(np.where(swap, ka, kb)),
                "dist": pa.array(np.repeat(np.asarray(t["dist"]), reps)),
            }
        )

    def explode_within(t: pa.Table) -> pa.Table:
        m = t["members"].combine_chunks() if isinstance(t["members"], pa.ChunkedArray) else t["members"]
        sizes = pc.list_value_length(m).to_numpy().astype(np.int64)
        flat = m.flatten().to_numpy()
        left, right = _pairs_within_runs(sizes)
        if not len(left):
            return _empty_pairs()
        # members sorted per group => flat[left] < flat[right]
        return pa.table(
            {
                "key_a": pa.array(flat[left]),
                "key_b": pa.array(flat[right]),
                "dist": pa.array(np.zeros(len(left), dtype=np.int64)),
            }
        )

    exploded = cross.map_batches(explode_cross, batch_format="pyarrow")
    within = distinct.map_batches(explode_within, batch_format="pyarrow")
    return exploded.union(within)


def similar_part_names(sf_dir: str, k: int = 2) -> ray.data.Dataset:
    """Edit-distance self-join over ``part.p_name`` (distance <= 2):
    near-identical product names — the dedup-by-fuzzy-key workload."""
    tune_context()
    parts = ray.data.read_parquet(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    )
    return similarity_self_join(parts, "p_partkey", "p_name", k=k)
