"""Vectorized kernels: stable hashing, Morton interleave, schema conformance."""

import numpy as np
import pyarrow as pa

from realtime_clickstream_lakehouse_ray.functions.hashing import hash64, splitmix64
from realtime_clickstream_lakehouse_ray.functions.zorder import morton2, morton3, top_bits
from realtime_clickstream_lakehouse_ray.schema import TOKENS_SCHEMA, conform_table


def test_hash64_stable_and_distinct():
    arr = pa.array(["doc-000000000001", "doc-000000000002", "doc-000000000001"])
    h1, h2 = hash64(arr), hash64(arr)
    assert np.array_equal(h1, h2)
    assert h1[0] == h1[2] and h1[0] != h1[1]
    assert h1.dtype == np.uint64


def test_hash64_ints_via_splitmix():
    arr = pa.array([1, 2, 3], type=pa.int32())
    h = hash64(arr)
    assert np.array_equal(h, splitmix64(np.array([1, 2, 3], dtype=np.uint64)))
    assert len(np.unique(h)) == 3


def test_morton3_bit_exact():
    # interleaving (1,0,0),(0,1,0),(0,0,1) -> bits 0,1,2
    a = np.array([1, 0, 0], dtype=np.uint64)
    b = np.array([0, 1, 0], dtype=np.uint64)
    c = np.array([0, 0, 1], dtype=np.uint64)
    assert morton3(a, b, c).tolist() == [1, 2, 4]
    # full 21-bit dims never collide across dims and stay within 63 bits
    m = morton3(np.array([0x1FFFFF], dtype=np.uint64), np.zeros(1, np.uint64), np.zeros(1, np.uint64))
    assert m[0] == 0x1249249249249249
    assert morton2(np.array([3], np.uint64), np.array([0], np.uint64))[0] == 0b101


def test_top_bits():
    x = np.array([0xFFFFFFFFFFFFFFFF], dtype=np.uint64)
    assert top_bits(x, 21)[0] == 0x1FFFFF


def test_conform_table_null_fill_cast_drop():
    tbl = pa.table(
        {
            "n_tok": pa.array([3, 4], type=pa.int64()),  # wrong type -> cast
            "doc_id": ["a", "b"],
            "zkey": [1, 2],  # extra -> dropped
        }
    )
    out = conform_table(tbl, TOKENS_SCHEMA)
    assert out.schema == TOKENS_SCHEMA
    assert out.column("n_tok").type == pa.int32()
    assert out.column("tokens").null_count == 2  # missing -> typed nulls
    assert "zkey" not in out.column_names


def test_conform_table_tokens_zero_copy_type():
    tokens = pa.array([[1, 2], [3]], type=pa.list_(pa.int32()))
    tbl = pa.table({"doc_id": ["a", "b"], "tokens": tokens, "n_tok": pa.array([2, 1], pa.int32()), "source": ["web", "web"]})
    out = conform_table(tbl, TOKENS_SCHEMA)
    assert out.column("tokens").combine_chunks().equals(tokens)
