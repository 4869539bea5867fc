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

from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
from realtime_clickstream_lakehouse_ray.functions.zorder import morton3, top_bits


def add_zkey(
    batch: pa.Table,
    dims: tuple[str, str, str] = ("source", "n_tok", "doc_id"),
) -> pa.Table:
    cols = []
    for name in dims:
        col = batch.column(name)
        if pa.types.is_integer(col.type):
            vals = np.asarray(col.cast(pa.int64()) if col.type != pa.int64() else col)
            vals = vals.astype(np.uint64)
            if vals.size and vals.max() > 0x1FFFFF:  # wide ints -> hash to 21 bits
                vals = top_bits(hash64(col), 21)
            cols.append(vals)
        else:
            cols.append(top_bits(hash64(col), 21))
    zkey = morton3(cols[0], cols[1], cols[2])
    return batch.append_column("zkey", pa.array(zkey, type=pa.uint64()))
