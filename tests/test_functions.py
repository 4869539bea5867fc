"""Vectorized kernels: stable hashing, Morton interleave, schema conformance."""

import numpy as np
import pytest
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


def test_hilbert3_is_a_true_hilbert_curve():
    from realtime_clickstream_lakehouse_ray.functions.zorder import hilbert3

    # exhaustive over the 8x8x8 grid: indices must be a permutation of
    # 0..511 AND consecutive indices must be unit steps in ONE dimension —
    # the defining property of a Hilbert curve (Morton order fails this)
    g = np.arange(8, dtype=np.uint64)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    idx = hilbert3(x.ravel(), y.ravel(), z.ravel(), bits=3)
    assert sorted(idx.tolist()) == list(range(512))
    order = np.argsort(idx)
    coords = np.stack([x.ravel(), y.ravel(), z.ravel()], axis=1)[order].astype(np.int64)
    steps = np.abs(np.diff(coords, axis=0))
    assert (steps.sum(axis=1) == 1).all()


def test_hilbert_zkey_stage():
    import pyarrow as pa

    from realtime_clickstream_lakehouse_ray.stages.zkey import add_zkey

    t = pa.table(
        {
            "source": ["web", "web", "books"],
            "n_tok": pa.array([10, 2000, 500], pa.int32()),
            "doc_id": ["a", "b", "c"],
        }
    )
    out_z = add_zkey(t, bounds={"n_tok": (8, 4096)}, curve="z")
    out_h = add_zkey(t, bounds={"n_tok": (8, 4096)}, curve="hilbert")
    assert out_z.column("zkey").to_pylist() != out_h.column("zkey").to_pylist()
    assert out_h.column("zkey").null_count == 0


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


def test_salted_counts_match_plain_groupby():
    """Salted repartitioning must be a pure execution-plan change: counts
    identical to the naive hot-key groupby, key sharded across salts."""
    import numpy as np
    import pyarrow as pa
    import ray.data
    from ray.data.aggregate import Count

    from realtime_clickstream_lakehouse_ray.functions.skew import add_salt, salted_counts

    rng = np.random.default_rng(2)
    # Zipf-hot key distribution: one key holds most rows
    keys = np.where(rng.random(20_000) < 0.8, "hot", rng.choice(["a", "b", "c"], 20_000))
    ds = ray.data.from_arrow(pa.table({"k": pa.array(keys)}))
    got = dict(
        (r["k"], r["n"]) for r in salted_counts(ds, "k").to_pandas().to_dict("records")
    )
    exp = dict(
        (r["k"], r["count()"])
        for r in ds.groupby("k").aggregate(Count()).to_pandas().to_dict("records")
    )
    assert got == exp
    # the hot key's rows really are spread across many salts
    salted = add_salt(ds).to_pandas()
    hot_salts = salted[salted["k"] == "hot"]["__salt"].nunique()
    assert hot_salts >= 16


def test_bloom_fixed_geometry_partials_or_merge():
    """Partial blooms built with one fixed m OR-merge into a filter with
    no false negatives over the union of their key sets."""
    from realtime_clickstream_lakehouse_ray.functions.bloom import (
        bloom_might_contain,
        build_bloom,
    )

    m = 1 << 12
    keys_a = hash64(pa.array(np.arange(0, 200, dtype=np.int64)))
    keys_b = hash64(pa.array(np.arange(200, 400, dtype=np.int64)))
    merged = np.frombuffer(build_bloom(keys_a, m=m), dtype=np.uint64) | np.frombuffer(
        build_bloom(keys_b, m=m), dtype=np.uint64
    )
    both = np.concatenate([keys_a, keys_b])
    assert bloom_might_contain(merged.tobytes(), both).all()
    # a fixed m that is not a u64 multiple is rejected loudly
    import pytest

    with pytest.raises(ValueError):
        build_bloom(keys_a, m=100)


def test_hll_estimate_within_error_bound():
    """HLL(p=10) estimate from the register pipeline's kernel lands within
    the standard-error envelope (and the linear-counting regime is exact-ish
    for n << m)."""
    from realtime_clickstream_lakehouse_ray.pipelines.sketch import (
        HLL_M,
        _hll_partial,
        hll_estimate,
    )

    for n in (150, 5_000, 200_000):
        t = pa.table({"user_id": pa.array(np.arange(n, dtype=np.int64))})
        regs = _hll_partial(t)
        est = hll_estimate(regs)
        # 3 sigma at p=10: 3 * 1.04 / sqrt(1024) ~ 9.75%
        assert abs(est - n) / n < 0.10, (n, est)


def test_hll_partials_merge_to_global_registers():
    """max-merge of per-batch partials equals the single-pass registers —
    the mergeability contract the groupby(Max) finalize relies on."""
    from realtime_clickstream_lakehouse_ray.pipelines.sketch import HLL_M, _hll_partial

    ids = np.arange(10_000, dtype=np.int64)
    full = _hll_partial(pa.table({"user_id": pa.array(ids)}))

    def to_regs(t):
        r = np.zeros(HLL_M, dtype=np.int64)
        r[np.asarray(t["bucket"])] = np.asarray(t["max_rho"])
        return r

    merged = np.zeros(HLL_M, dtype=np.int64)
    for part in np.array_split(ids, 7):
        merged = np.maximum(merged, to_regs(_hll_partial(pa.table({"user_id": pa.array(part)}))))
    assert np.array_equal(merged, to_regs(full))


def test_zkey_one_dim_degenerates_to_sort_order():
    """dims=(partition, one_numeric) leaves a single interleave dim: the
    zkey must order identically to the dim itself (plain sort)."""
    from realtime_clickstream_lakehouse_ray.stages.zkey import add_zkey

    t = pa.table(
        {
            "source": ["web"] * 5,
            "n_tok": pa.array([500, 10, 2000, 47, 1024], pa.int32()),
            "doc_id": ["a", "b", "c", "d", "e"],
        }
    )
    out = add_zkey(t, dims=("n_tok",), bounds={"n_tok": (8, 4096)})
    zk = np.array(out.column("zkey").to_pylist())
    ntok = np.array(t.column("n_tok").to_pylist())
    assert (np.argsort(zk, kind="stable") == np.argsort(ntok, kind="stable")).all()
    # zero interleave dims: ordering comes from the partition rank alone
    out0 = add_zkey(
        pa.table({"source": ["web", "books"], "n_tok": pa.array([1, 2], pa.int32()),
                  "doc_id": ["a", "b"]}),
        dims=(),
        part_rank={"books": 0, "web": 1},
    )
    zk0 = out0.column("zkey").to_pylist()
    assert zk0[1] < zk0[0]


def test_zkey_too_many_dims_raises():
    from realtime_clickstream_lakehouse_ray.stages.zkey import add_zkey

    t = pa.table(
        {
            "a": pa.array([1], pa.int32()),
            "b": pa.array([1], pa.int32()),
            "c": pa.array([1], pa.int32()),
            "d": pa.array([1], pa.int32()),
        }
    )
    with pytest.raises(ValueError, match="at most 3"):
        add_zkey(t, dims=("a", "b", "c", "d"))


def test_simhash_md5_batch_composition_invariance():
    """A batch kernel must give each document the SAME signature no matter
    which batch it rides in (one big batch vs singleton batches)."""
    from realtime_clickstream_lakehouse_ray.functions.minhash import simhash_md5
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words

    texts = [
        "the quick brown fox jumps over the lazy dog",
        "a b",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "the the the a a a",
    ]
    whole = simhash_md5(split_words(pa.array(texts)))
    singles = np.concatenate(
        [simhash_md5(split_words(pa.array([t]))) for t in texts]
    )
    assert np.array_equal(whole, singles)
    # sliced (non-zero-offset) list arrays too
    arr = split_words(pa.array(texts))
    assert np.array_equal(
        simhash_md5(arr)[2:], simhash_md5(split_words(pa.array(texts[2:])))
    )


def test_minhash_md5_batch_composition_invariance():
    from realtime_clickstream_lakehouse_ray.functions.minhash import (
        minhash_md5_signatures,
    )
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words

    texts = [
        "w1 w2 w3 w4 w5 w6",
        "solo",
        "x y z x y z x y z",
        "the quick brown fox jumps over the lazy dog again and again",
    ]
    _, whole = minhash_md5_signatures(split_words(pa.array(texts)))
    for i, t in enumerate(texts):
        _, one = minhash_md5_signatures(split_words(pa.array([t])))
        assert np.array_equal(whole[i], one[0]), i


def test_minhash_md5_near_dup_signatures_agree_mostly():
    """Two near-identical docs must share most minhash slots; an unrelated
    doc must not."""
    from realtime_clickstream_lakehouse_ray.functions.minhash import (
        minhash_md5_signatures,
    )
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words

    base = " ".join(f"tok{i}" for i in range(60))
    near = base.replace("tok30", "tokX")  # perturbs 3 grams of 58
    other = " ".join(f"zz{i}" for i in range(60))
    _, sigs = minhash_md5_signatures(split_words(pa.array([base, near, other])))
    agree_near = (sigs[0] == sigs[1]).mean()
    agree_other = (sigs[0] == sigs[2]).mean()
    assert agree_near >= 0.75
    assert agree_other <= 0.25


def test_flat_kernels_on_genuinely_sliced_list_arrays():
    """A pyarrow ``ListArray.slice`` keeps ABSOLUTE offsets over the FULL
    child buffer; every flat kernel must normalize (re-slice values,
    rebase offsets) or it mis-attributes out-of-slice words — e.g.
    ``reduceat`` folding trailing words into the last doc's signature.
    This slices the INPUT arrow array (the earlier invariance test only
    sliced the output numpy array)."""
    from realtime_clickstream_lakehouse_ray.functions.minhash import (
        minhash_md5_signatures,
        ngram_hashes_distinct,
        shingle_hashes,
        simhash,
        simhash_md5,
    )
    from realtime_clickstream_lakehouse_ray.functions.textstats import (
        rolling_fingerprint,
        split_words,
        stopword_counts,
        top_word_counts,
        unique_word_counts,
        winnow_fingerprint_md5,
        word_char_totals,
    )

    texts = [
        "zero zero zero padding words here",
        "one more filler document",
        "the quick brown fox jumps over the lazy dog",
        "a b",
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do",
        "the the the a a a trailing words matter",
    ]
    arr = split_words(pa.array(texts))
    # a BOUNDED mid-slice: non-zero offset AND trailing out-of-slice words
    # remain in the child buffer (a suffix slice would not catch the
    # reduceat fold-in failure mode)
    sliced = arr.slice(1, len(texts) - 2)
    fresh = split_words(pa.array(texts[1 : len(texts) - 1]))

    assert np.array_equal(simhash_md5(sliced), simhash_md5(fresh))
    assert np.array_equal(simhash(sliced), simhash(fresh))
    _, sig_s = minhash_md5_signatures(sliced)
    _, sig_f = minhash_md5_signatures(fresh)
    assert np.array_equal(sig_s, sig_f)
    hs, ls = shingle_hashes(sliced)
    hf, lf = shingle_hashes(fresh)
    assert np.array_equal(ls, lf) and np.array_equal(hs, hf)
    gs, ds, cs = ngram_hashes_distinct(sliced)
    gf, df, cf = ngram_hashes_distinct(fresh)
    assert np.array_equal(cs, cf) and np.array_equal(gs, gf) and np.array_equal(ds, df)
    for kern in (
        unique_word_counts,
        stopword_counts,
        top_word_counts,
        word_char_totals,
        rolling_fingerprint,
        winnow_fingerprint_md5,
    ):
        assert np.array_equal(kern(sliced), kern(fresh)), kern.__name__


def test_empty_partition_schema_warning_filter():
    """tune_context installs a TARGETED filter for Ray's 'RefBundle with a
    different schema' warning (emitted for Ray-internal zero-column empty
    reduce partitions that no user-level transform can conform); every
    other record on that logger must still pass."""
    import logging

    from realtime_clickstream_lakehouse_ray.config import (
        _EmptyPartitionSchemaWarning,
        tune_context,
    )

    tune_context()
    logger = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    flt = [f for f in logger.filters if isinstance(f, _EmptyPartitionSchemaWarning)]
    assert len(flt) == 1  # installed, idempotently
    tune_context()
    assert (
        len([f for f in logger.filters if isinstance(f, _EmptyPartitionSchemaWarning)])
        == 1
    )

    def rec(msg):
        return logging.LogRecord("x", logging.WARNING, "f", 1, msg, None, None)

    assert not flt[0].filter(
        rec("Operator produced a RefBundle with a different schema than ...")
    )
    assert flt[0].filter(rec("some other warning"))
