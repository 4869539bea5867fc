"""Z-order key computation stage (stateless, zero-copy Arrow in/out).

Adds a transient ``zkey`` uint64 column: bit-interleave of
``(hash64(source), n_tok, hash64(doc_id))`` per the north star.  Hashed
dimensions are reduced to their top 21 bits; ``n_tok`` (bounded ≤ 4096 by
the data model) is used directly so the key preserves numeric locality on
the ordered dimension.  ``Dataset.sort("zkey")`` downstream is the engine's
single global range shuffle; the writer stage drops ``zkey`` when
conforming to the table schema.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
from realtime_clickstream_lakehouse_ray.functions.zorder import (
    hilbert3,
    morton2,
    morton3,
    top_bits,
)


def add_zkey(
    batch: pa.Table,
    dims: tuple[str, ...] = ("source", "n_tok", "doc_id"),
    bounds: dict[str, tuple[int, int]] | None = None,
    curve: str = "z",
    part_rank: dict[str, int] | None = None,
    partition_col: str = "source",
) -> pa.Table:
    """``bounds`` maps an integer dim to its global (min, max) — known for
    free from the snapshot's file stats — so the dim is scaled to the full
    21-bit range.  Without scaling, a narrow-range dim (n_tok ≤ 4096 uses
    12 of 21 bits) only occupies LOW interleaved bit positions and barely
    influences the sort order; with it, every dim contributes equally.

    ``part_rank`` (lexicographic rank of each partition value, known from
    snapshot stats) folds the leading partition into the HIGH bits of the
    single uint64 key: ``(rank << 21*len(dims)) | zkey``.  Sorting one
    numeric column instead of a composite ``[string, uint64]`` key gives
    the range shuffle's boundary sampler full resolution — with a leading
    low-cardinality string, sampled boundaries collide and reduce blocks
    skew badly (measured 5 MB–233 MB at 16 CPUs, a 5.3 s write straggler).
    """
    bounds = bounds or {}
    cols = []
    for name in dims:
        col = batch.column(name)
        if pa.types.is_integer(col.type):
            vals = np.asarray(col.cast(pa.int64()) if col.type != pa.int64() else col)
            vals = vals.astype(np.float64)
            if name in bounds:
                lo, hi = bounds[name]
            else:
                lo, hi = (vals.min(), vals.max()) if vals.size else (0, 0)
            span = max(float(hi) - float(lo), 1.0)
            scaled = np.clip((vals - float(lo)) / span, 0.0, 1.0) * float(0x1FFFFF)
            cols.append(scaled.astype(np.uint64))
        else:
            cols.append(top_bits(hash64(col), 21))
    if len(cols) == 0:
        # dims was just the partition column: ordering comes entirely from
        # the partition rank folded in below
        zkey = np.zeros(batch.num_rows, dtype=np.uint64)
        nbits = 0
    elif len(cols) == 1:
        # 1-D "z-order" degenerates to a plain sort on the scaled dim
        zkey = cols[0]
        nbits = 21
    elif len(cols) == 2:
        # 2-D variant: used when the partition column leads the sort
        # instead of being interleaved (Delta semantics: ZORDER clusters
        # WITHIN partitions)
        if curve == "hilbert":
            zkey = hilbert3(cols[0], cols[1], np.zeros_like(cols[0]))
            nbits = 63  # hilbert3 permutes the full 63-bit space even at z=0
        else:
            zkey = morton2(cols[0], cols[1])
            nbits = 42
    elif len(cols) == 3:
        if curve == "hilbert":
            zkey = hilbert3(cols[0], cols[1], cols[2])
        else:
            zkey = morton3(cols[0], cols[1], cols[2])
        nbits = 63
    else:
        raise ValueError(
            f"z-order supports at most 3 non-partition dims, got {len(cols)}: {dims}"
        )
    if part_rank is not None:
        # keep the top 42 curve bits (file-granularity locality) and put
        # the partition rank in the 22 bits above them — dropping sub-42-bit
        # curve resolution is invisible at output-file granularity
        keep = 42
        if nbits > keep:
            zkey = zkey >> np.uint64(nbits - keep)
        shift = np.uint64(keep)
        # low-cardinality column: map the dictionary, not the rows
        enc = pc.dictionary_encode(batch.column(partition_col)).combine_chunks()
        dict_ranks = np.array(
            [part_rank.get(v, len(part_rank)) for v in enc.dictionary.to_pylist()],
            dtype=np.uint64,
        )
        ranks = dict_ranks[np.asarray(enc.indices)]
        zkey = (ranks << shift) | zkey
    return batch.append_column("zkey", pa.array(zkey, type=pa.uint64()))
