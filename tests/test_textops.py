"""Text analysis, dedup family, ANN, multimodal stages — planted-duplicate
fixtures + recall checks (the oracle-parity suite covers the exact ops)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realtime_clickstream_lakehouse_ray.pipelines import ann, dedup, multimodal, text

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """documents.parquet with planted duplicates:
    0: base; 1: base with 2 words swapped (near-dup); 2: unrelated;
    3: exact copy of 0; 4: word-shuffled 0 (bag-equal, order-different)."""
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(50)]
    base = [vocab[i] for i in rng.integers(0, 50, 40)]
    near = list(base)
    near[5], near[25] = "zzz", "qqq"
    other = [vocab[i] for i in rng.integers(0, 50, 40)][::-1] + ["xx", "yy"]
    shuffled = list(base)
    rng.shuffle(shuffled)
    texts = [" ".join(t) for t in (base, near, other, base, shuffled)]
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(5), pa.int64()),
                "text": texts,
                "lang": ["en"] * 5,
                "source": ["s0"] * 5,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_exact_dedup_planted(planted_dir):
    out = dedup.exact_dedup(planted_dir).to_pandas()
    assert sorted(out["doc_id"]) == [0, 1, 2, 4]  # 3 deduped into 0


def test_minhash_lsh_planted(planted_dir):
    out = dedup.minhash_lsh_dedup(planted_dir, threshold=0.5).to_pandas()
    g = dict(zip(out["doc_id"], out["group"]))
    assert g[0] == g[1] == g[3] == 0  # near-dup + exact dup grouped
    assert g[2] == 2
    assert g[4] == 4  # shuffled words -> different shingles, NOT a dup
    assert set(out[out["keep"]]["doc_id"]) == {0, 2, 4}


def test_simhash_planted(planted_dir):
    out = dedup.simhash_dedup(planted_dir, max_hamming=3).to_pandas()
    g = dict(zip(out["doc_id"], out["group"]))
    # simhash is bag-of-words: the shuffled copy IS a dup here
    assert g[0] == g[3] == g[4] == 0
    assert g[2] == 2


def test_minhash_merges_on_corpus_are_genuine():
    """The test corpus contains planted near-dups; every merge the pipeline
    makes must be a true >= threshold Jaccard pair (verify independently)."""
    import duckdb
    import pyarrow as pa

    from realtime_clickstream_lakehouse_ray.functions.minhash import (
        exact_jaccard,
        shingle_hashes,
    )
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words

    thr = 0.8
    out = dedup.minhash_lsh_dedup(SF, threshold=thr).to_pandas()
    assert len(out) == 500
    merged = out[~out["keep"]]
    assert len(merged) > 0  # the corpus does contain near-dups
    con = duckdb.connect()
    txt = con.sql(f"SELECT doc_id, text FROM '{SF}/documents.parquet'").df()
    txt = dict(zip(txt["doc_id"], txt["text"]))
    for _, row in merged.head(5).iterrows():
        w = split_words(pa.array([txt[row["group"]], txt[row["doc_id"]]]))
        flat, n = shingle_hashes(w, k=3)
        assert exact_jaccard(flat[: n[0]], flat[n[0] :]) >= thr


def test_knn_ivf_recall():
    exact = ann.knn_bruteforce(SF, k=10, n_queries=5).to_pandas()
    approx = ann.knn_ivf(SF, k=10, n_queries=5, n_clusters=8, nprobe=4).to_pandas()
    recalls = []
    for q in exact["query_id"].unique():
        e = set(exact[exact["query_id"] == q]["neighbor_id"])
        a = set(approx[approx["query_id"] == q]["neighbor_id"])
        recalls.append(len(e & a) / len(e))
    # nprobe/n_clusters = 0.5 of the space scanned; recall must beat that
    assert np.mean(recalls) >= 0.5, recalls


def test_lang_id_scores():
    out = text.lang_id(SF).to_pandas()
    assert len(out) == 500
    assert (out["lang_pred"] == "en").mean() > 0.9  # hint words are common


def test_image_features_shapes():
    out = multimodal.image_features(SF).to_pandas()
    assert len(out) == 500
    assert (out["n_bytes"] > 0).all()
    feats = np.vstack(out["features"])
    assert feats.shape == (500, 8)
    np.testing.assert_allclose(feats.sum(axis=1), 1.0, rtol=1e-9)  # histogram


def test_frame_sampler_arithmetic():
    out = multimodal.frame_samples(SF).to_pandas()
    # every doc contributes ceil(ceil(bytes/1024)/4) frames, idx multiple of 4
    assert (out["frame_idx"] % 4 == 0).all()
    assert (out["frame_bytes"] > 0).all() and (out["frame_bytes"] <= 1024).all()
    meta = multimodal.image_metadata(SF).to_pandas().set_index("doc_id")
    counts = out.groupby("doc_id").size()
    expect = np.ceil(np.ceil(meta["n_bytes"] / 1024) / 4).astype(int)
    assert (counts.sort_index() == expect.sort_index()).all()


def test_ngram_hashes_boundary_invariance():
    """The gram set of a document must not depend on its neighbors in the
    batch (shingle_hashes' short-doc fallback rolls in the next doc;
    ngram_hashes_distinct must not)."""
    from realtime_clickstream_lakehouse_ray.functions.minhash import ngram_hashes_distinct
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words

    def gramset(texts, which):
        words = split_words(pa.array(texts))
        g, d, _ = ngram_hashes_distinct(words, n=3)
        return set(g[d == which].tolist())

    short = "alpha beta"          # < n words -> whole-doc gram
    assert gramset([short, "x y z w"], 0) == gramset([short, "p q r s t"], 0)
    assert gramset(["a b c d e", short], 1) == gramset([short], 0)
    # empty text splits to one empty token (matches DuckDB
    # string_split_regex) -> one whole-doc gram, same as any 1-word doc
    words = split_words(pa.array(["", "a b c d"]))
    g, d, counts = ngram_hashes_distinct(words, n=3)
    assert counts.tolist() == [1, 2] and len(g) == 3
    # distinct within doc: repeated grams collapse
    words = split_words(pa.array(["a b c a b c a b c"]))
    _, _, c2 = ngram_hashes_distinct(words, n=3)
    assert c2[0] < 7  # 7 positions, only 3 distinct grams


def test_ngram_jaccard_planted(planted_dir):
    out = dedup.ngram_jaccard_dedup(str(planted_dir), num=1, den=2)
    df = out.to_pandas()
    pairs = set(zip(df["id_a"], df["id_b"]))
    assert (0, 3) in pairs  # exact copy: jaccard 1.0
    row03 = df[(df["id_a"] == 0) & (df["id_b"] == 3)].iloc[0]
    assert row03["inter_size"] == row03["union_size"]
    assert (0, 1) in pairs  # 2 swapped words out of 40 -> high jaccard
    assert not any(2 in p for p in pairs)  # unrelated doc pairs with no one


def test_embedding_dup_pairs_ivf_recall(tmp_path_factory):
    """The shared test embeddings have no near-dups (max cosine ~0.48), so
    plant some: 30 base vectors each with a tiny-perturbation copy."""
    rng = np.random.default_rng(5)
    base = rng.normal(size=(30, 16))
    near = base + rng.normal(scale=0.02, size=base.shape)
    noise = rng.normal(size=(140, 16))
    mat = np.vstack([base, near, noise])
    d = tmp_path_factory.mktemp("emb")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            }
        ),
        d / "embeddings.parquet",
    )
    exact = dedup.embedding_dup_pairs(str(d)).to_pandas()
    approx = dedup.embedding_dup_pairs_ivf(str(d), n_clusters=8).to_pandas()
    e = set(zip(exact["id_a"], exact["id_b"]))
    a = set(zip(approx["id_a"], approx["id_b"]))
    assert len(e) >= 25  # the planted copies are found by the exact op
    assert a <= e  # no false pairs: within-cluster cosine is exact
    assert len(e & a) / len(e) >= 0.8, (len(e & a), len(e))


def test_embedding_dup_pairs_size_dispatch(tmp_path_factory, monkeypatch):
    """The regime front chooses broadcast vs IVF by footer stats; with the
    threshold forced to 0 the IVF regime runs and (exhaustive assignment
    keeps recall complete on this corpus) emits the same verified pairs as
    the broadcast regime."""
    rng = np.random.default_rng(11)
    base = rng.normal(size=(20, 16))
    near = base + rng.normal(scale=0.01, size=base.shape)
    mat = np.vstack([base, near, rng.normal(size=(60, 16))])
    d = tmp_path_factory.mktemp("embdisp")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(len(mat)), pa.int64()),
                "embedding": pa.array(list(mat), pa.list_(pa.float64())),
            }
        ),
        d / "embeddings.parquet",
    )
    small = dedup.embedding_dup_pairs(str(d)).to_pandas()  # broadcast regime
    monkeypatch.setattr(dedup, "EMBED_BROADCAST_BYTES", 0)  # force IVF regime
    big = dedup.embedding_dup_pairs(str(d)).to_pandas()
    s = set(zip(small["id_a"], small["id_b"]))
    b = set(zip(big["id_a"], big["id_b"]))
    assert len(s) >= 15
    assert b == s  # regime equality: the dispatch is invisible to callers


class TestConnectedComponents:
    def test_chain_star_and_singleton_pair(self):
        # chain 1-2-3-4 (diameter 3), star 10-(11,12,13), pair 20-21
        edges = pa.table(
            {
                "id_a": pa.array([1, 2, 3, 11, 12, 13, 20], pa.int64()),
                "id_b": pa.array([2, 3, 4, 10, 10, 10, 21], pa.int64()),
            }
        )
        got = (
            dedup.connected_components(edges)
            .to_pandas()
            .sort_values("node", ignore_index=True)
        )
        lab = dict(zip(got["node"], got["lab"]))
        assert {lab[n] for n in (1, 2, 3, 4)} == {1}
        assert {lab[n] for n in (10, 11, 12, 13)} == {10}
        assert {lab[n] for n in (20, 21)} == {20}
        assert len(got) == 10
        assert str(got["lab"].dtype) == "int64"

    def test_empty_edges(self):
        empty = pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
        )
        out = dedup.connected_components(empty).to_pandas()
        assert len(out) == 0


def test_audio_features_kernel_signed_pcm():
    """The s16le decode kernel on crafted binary payloads (negative
    samples + sign transitions — the regimes the ASCII oracle fixture
    can't reach) matches a per-row numpy reference."""
    from realtime_clickstream_lakehouse_ray.stages.multimodal import AudioFeatures

    rng = np.random.default_rng(7)
    payloads, expect = [], []
    for n in (0, 1, 2, 5, 64, 257):
        samples = rng.integers(-32768, 32768, size=n, dtype=np.int16)
        raw = samples.tobytes() + (b"x" if n % 2 else b"")  # odd tail ignored
        payloads.append(raw)
        s = samples.astype(np.int64)
        expect.append(
            (
                n,
                int(np.abs(s).sum()),
                int(np.abs(s).max()) if n else 0,
                int((np.abs(s) > 30000).sum()),
                int(((s[1:] >= 0) != (s[:-1] >= 0)).sum()) if n > 1 else 0,
            )
        )
    t = pa.table(
        {
            "doc_id": pa.array(range(len(payloads)), pa.int64()),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = AudioFeatures()(t).to_pydict()
    got = list(
        zip(out["n_samples"], out["sum_abs"], out["peak"], out["n_clip"], out["n_zero_cross"])
    )
    assert got == expect
    # sliced (non-zero offset) batches decode identically
    out2 = AudioFeatures()(t.slice(2)).to_pydict()
    assert out2["sum_abs"] == out["sum_abs"][2:]


class TestSubstringDupSpans:
    """Crafted-corpus edge cases for the exact repeated-substring operator
    (the fixture-wide oracle parity lives in test_oracle_parity.py)."""

    def _corpus(self, tmp_path, texts):
        import pyarrow.parquet as pq

        d = tmp_path / "sub"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string()),
                    "lang": ["en"] * len(texts),
                    "source": ["s0"] * len(texts),
                    "n_chars": pa.array([len(t) for t in texts], pa.int64()),
                }
            ),
            d / "documents.parquet",
        )
        return str(d)

    def test_self_repeat_cross_doc_and_short_docs(self, tmp_path):
        import numpy as np

        rng = np.random.default_rng(7)
        uniq = lambda n: "".join(rng.choice(list("abcdefghij"), n))
        shared = uniq(40)  # 9 duplicated windows when repeated verbatim
        texts = [
            "A" * 40,                    # self-repeating: every window identical
            shared + uniq(20),           # cross-doc head repeat
            uniq(20) + shared,           # cross-doc tail repeat
            uniq(31),                    # shorter than the window: no rows
            uniq(100),                   # unique: no rows
        ]
        out = (
            dedup.substring_dup_spans(self._corpus(tmp_path, texts))
            .to_pandas()
            .sort_values(["doc_id", "span_start"], ignore_index=True)
        )
        assert set(out["doc_id"]) == {0, 1, 2}
        d0 = out[out["doc_id"] == 0]
        # "A"*40: windows at p=0..8 all equal -> one merged span [0, 40)
        assert d0[["span_start", "span_end", "n_windows"]].values.tolist() == [[0, 40, 9]]
        d1 = out[out["doc_id"] == 1]
        assert d1[["span_start", "span_end", "n_windows"]].values.tolist() == [[0, 40, 9]]
        d2 = out[out["doc_id"] == 2]
        assert d2[["span_start", "span_end", "n_windows"]].values.tolist() == [[20, 60, 9]]

    def test_matches_duckdb_on_crafted_corpus(self, tmp_path):
        import duckdb
        import numpy as np
        import pandas as pd

        rng = np.random.default_rng(11)
        alpha = list("abcdefghijklmnop ")
        mk = lambda n: "".join(rng.choice(alpha, n))
        core = mk(64)
        texts = [
            mk(200),
            mk(50) + core + mk(50),      # repeat embedded mid-doc
            core,                        # whole doc is the repeat
            mk(80) + core[:35],          # partial overlap of the repeat
            mk(10),                      # short
            (mk(33) * 3),                # periodic self-repeat
        ]
        sfd = self._corpus(tmp_path, texts)
        got = (
            dedup.substring_dup_spans(sfd)
            .to_pandas()
            .sort_values(["doc_id", "span_start"], ignore_index=True)
        )
        import __ray_entry__ as entrymod

        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM '{sfd}/documents.parquet'"
        )
        exp = (
            con.execute(entrymod.oracle_sql()["substring_dup_spans"])
            .df()
            .sort_values(["doc_id", "span_start"], ignore_index=True)
        )
        pd.testing.assert_frame_equal(
            got.astype("int64"), exp.astype("int64"), check_dtype=False
        )


def test_quantize_codes_bounds_and_extremes():
    import numpy as np

    from realtime_clickstream_lakehouse_ray.pipelines.ann import _quantize

    mat = np.array([[0.0, 5.0, -1.0], [1.0, 5.0, 3.0]])
    mn, mx = mat.min(0), mat.max(0)
    q = _quantize(mat, mn, mx)
    # min -> 0, max -> 255, degenerate dim (constant) -> 0
    assert q[:, 0].tolist() == [0, 255]
    assert q[:, 1].tolist() == [0, 0]
    assert q[:, 2].tolist() == [0, 255]
    assert q.min() >= 0 and q.max() <= 255


def test_knn_quantized_ranks_against_bruteforce_int(ray_session):
    """Integer-dot ranking over quantized codes equals a brute-force
    numpy recompute on the same corpus."""
    import numpy as np
    import pyarrow.parquet as pq_

    from realtime_clickstream_lakehouse_ray.pipelines.ann import (
        _dim_minmax,
        _quantize,
        knn_quantized,
    )

    sf = "/root/testdata/sf0.001"
    got = knn_quantized(sf, k=5, n_queries=3).to_pandas()
    t = pq_.read_table(f"{sf}/embeddings.parquet")
    ids = np.asarray(t["vec_id"])
    mat = np.asarray(t["embedding"].combine_chunks().values).reshape(len(ids), -1)
    mn, mx = _dim_minmax(sf)
    codes = _quantize(mat.astype(np.float64), mn, mx)
    order = np.argsort(ids)
    ids, codes = ids[order], codes[order]
    for qi in range(3):
        scores = codes[qi] @ codes.T
        cand = [(int(-scores[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != qi]
        expect = sorted(cand)[:5]
        sub = got[got.query_id == qi]
        assert sorted(zip((-sub.score).astype(int), sub.neighbor_id.astype(int))) == expect


def test_rgb_downsample_matches_reshape_reference():
    """RgbDownsample's global-index pooling equals the obvious per-image
    reshape + 2x2 floor-mean, including odd trailing rows/cols and
    sub-image payloads."""
    import numpy as np
    import pyarrow as pa

    from realtime_clickstream_lakehouse_ray.stages.multimodal import RgbDownsample

    rng = np.random.default_rng(7)
    W = 16
    payloads, expected = [], []
    for npx in [0, 2, W * 2, W * 4, W * 5 + 3, W * 31 + 7]:
        raw = rng.integers(0, 256, size=npx * 3, dtype=np.uint8)
        payloads.append(raw.tobytes() + b"x" * int(rng.integers(0, 3)))
        H = npx // W
        Ho, Wo = H // 2, W // 2
        if Ho == 0:
            expected.append((Ho, Wo, b""))
            continue
        img = raw[: H * W * 3].reshape(H, W, 3).astype(np.int64)
        pooled = (
            img[0 : 2 * Ho : 2, 0 : 2 * Wo * 2 : 2][:, :Wo]
            + img[1 : 2 * Ho : 2, 0 : 2 * Wo * 2 : 2][:, :Wo]
            + img[0 : 2 * Ho : 2, 1 : 2 * Wo * 2 : 2][:, :Wo]
            + img[1 : 2 * Ho : 2, 1 : 2 * Wo * 2 : 2][:, :Wo]
        ) // 4
        expected.append((Ho, Wo, pooled.astype(np.uint8).tobytes()))

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(payloads), dtype=np.int64)),
            "payload": pa.array(payloads, pa.binary()),
        }
    )
    out = RgbDownsample(width=W)(t)
    got = {
        d: (h, w, p)
        for d, h, w, p in zip(
            out["doc_id"].to_pylist(),
            out["out_h"].to_pylist(),
            out["out_w"].to_pylist(),
            out["pooled"].to_pylist(),
        )
    }
    assert len(got) == len(payloads)
    for i, (ho, wo, pb) in enumerate(expected):
        gh, gw, gp = got[i]
        assert (gh, gw) == (ho, wo), f"doc {i}: dims {gh}x{gw} != {ho}x{wo}"
        assert gp == pb, f"doc {i}: pooled bytes differ"


def test_rgb_features_discard_partial_triples():
    import numpy as np
    import pyarrow as pa

    from realtime_clickstream_lakehouse_ray.stages.multimodal import RgbRawFeatures

    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "payload": pa.array(
                [bytes([10, 20, 30, 40, 50, 60, 99]), b"ab", b""], pa.binary()
            ),
        }
    )
    out = RgbRawFeatures()(t).to_pydict()
    rows = set(zip(out["doc_id"], out["channel"], out["n"], out["sum_v"],
                   out["min_v"], out["max_v"]))
    # doc 1: two full pixels, trailing 0x63 discarded; docs 2/3 emit nothing
    assert rows == {
        (1, 0, 2, 50, 10, 40),
        (1, 1, 2, 70, 20, 50),
        (1, 2, 2, 90, 30, 60),
    }


def test_simhash_md5_dedup_mega_bucket_exact(tmp_path):
    """Oracle-equality regression for the exhaustive (cap=None) verify path:
    a low-entropy corpus where one 12-bit band bucket co-locates >200
    signatures (the approximate path's mega-bucket skip threshold) must
    still yield the exact brute-force Hamming pair set."""
    import duckdb  # noqa: F401  (parity style: brute force in numpy below)
    import pyarrow.parquet as pq

    from realtime_clickstream_lakehouse_ray.functions.minhash import (
        hamming64,
        simhash_md5,
    )
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words

    n = 260  # > the production cap of 200 identical signatures per bucket
    texts = ["alpha beta gamma delta epsilon"] * n + [
        "alpha beta gamma delta zeta",  # near-dup of the clone block
        "completely different words here now",
    ]
    ids = list(range(len(texts)))
    d = tmp_path / "mega"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": ["s0"] * len(texts),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )

    got = dedup.simhash_md5_dedup(str(d), max_hamming=3).to_pandas()

    sig = simhash_md5(split_words(pa.array(texts))).astype(np.uint64)
    a, b = np.triu_indices(len(texts), k=1)
    dist = hamming64(sig[a], sig[b])
    ok = dist <= 3
    want = set(zip(a[ok].tolist(), b[ok].tolist()))
    assert want, "fixture must plant pairs"
    assert len(want) >= 200 * 201 // 2  # the clone block alone exceeds cap²/2
    assert set(zip(got["id_a"], got["id_b"])) == want


class TestImageCodec:
    """Dependency-free PPM/BMP/PNG codec (the round-5 closure of the image
    stub): byte-exact encode/decode roundtrips, PNG filter reconstruction,
    and container-sniffing dispatch inside ImageFeatures."""

    def _pixels(self, w, h, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        return rng.integers(0, 256, size=w * h * 3, dtype=np.uint8)

    def test_roundtrips_all_containers(self):
        import numpy as np

        from realtime_clickstream_lakehouse_ray.stages.multimodal import (
            decode_image,
            encode_bmp,
            encode_png,
            encode_ppm,
        )

        for w, h in [(16, 4), (3, 5), (1, 1), (5, 2)]:  # incl. odd BMP pad
            px = self._pixels(w, h, seed=w * 100 + h)
            for enc in (encode_ppm, encode_bmp, encode_png):
                got_w, got_h, got = decode_image(enc(w, h, px))
                assert (got_w, got_h) == (w, h), enc.__name__
                assert np.array_equal(got, px), enc.__name__

    def test_png_filters_1_to_4_reconstruct(self):
        """Hand-filter scanlines with Sub/Up/Average/Paeth and check the
        decoder reconstructs the original pixels (foreign-encoder PNGs)."""
        import struct
        import zlib

        import numpy as np

        from realtime_clickstream_lakehouse_ray.stages.multimodal import (
            PNG_SIG,
            decode_png,
        )

        rng = np.random.default_rng(3)
        w, h = 4, 4
        px = rng.integers(0, 256, size=(h, w * 3), dtype=np.uint8).astype(int)

        def paeth(a, b, c):
            p = a + b - c
            pa_, pb, pc_ = abs(p - a), abs(p - b), abs(p - c)
            return a if (pa_ <= pb and pa_ <= pc_) else (b if pb <= pc_ else c)

        raw = bytearray()
        for y, f in enumerate([1, 2, 3, 4]):  # one row per filter type
            raw.append(f)
            for i in range(w * 3):
                a = px[y][i - 3] if i >= 3 else 0
                b = px[y - 1][i] if y else 0
                c = (px[y - 1][i - 3] if i >= 3 else 0) if y else 0
                if f == 1:
                    v = px[y][i] - a
                elif f == 2:
                    v = px[y][i] - b
                elif f == 3:
                    v = px[y][i] - (a + b) // 2
                else:
                    v = px[y][i] - paeth(a, b, c)
                raw.append(v % 256)

        def chunk(typ, data):
            return (
                struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
            )

        payload = (
            PNG_SIG
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
        got_w, got_h, got = decode_png(payload)
        assert (got_w, got_h) == (w, h)
        assert np.array_equal(got.reshape(h, w * 3), px.astype(np.uint8))

    def test_image_features_dispatch_and_invariance(self):
        """ImageFeatures: encoded batches take the REAL decode (header
        dims, identical features across containers); unrecognized payloads
        keep the deterministic stub."""
        import numpy as np
        import pyarrow as pa

        from realtime_clickstream_lakehouse_ray.stages.multimodal import (
            ImageFeatures,
            encode_bmp,
            encode_png,
            encode_ppm,
        )

        w, h = 16, 3
        px = self._pixels(w, h, seed=11)
        stage = ImageFeatures()
        feats = []
        for enc in (encode_ppm, encode_bmp, encode_png):
            out = stage(
                pa.table(
                    {
                        "doc_id": pa.array([1], pa.int64()),
                        "payload": pa.array([enc(w, h, px)], pa.large_binary()),
                    }
                )
            )
            assert out["width"].to_pylist() == [w]
            assert out["height"].to_pylist() == [h]
            feats.append(out["features"].to_pylist()[0])
        assert feats[0] == feats[1] == feats[2]
        exp = (np.bincount(px >> 5, minlength=8) / px.size).tolist()
        assert feats[0] == exp
        # a non-container payload falls back to the md5-dims stub
        out = stage(
            pa.table(
                {
                    "doc_id": pa.array([2], pa.int64()),
                    "payload": pa.array([b"just some text"], pa.large_binary()),
                }
            )
        )
        assert out["width"].to_pylist()[0] != len(b"just some text")

    def test_image_encoder_stage_formats_and_short_rows(self):
        import pyarrow as pa

        from realtime_clickstream_lakehouse_ray.stages.multimodal import (
            ImageEncoder,
            sniff_container,
        )

        payloads = [bytes(range(96)), b"x" * 47, bytes(range(48))]
        t = pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "payload": pa.array(payloads, pa.large_binary()),
            }
        )
        out = ImageEncoder(width=16)(t)
        # row 1 (47 bytes < one 48-byte pixel row) is dropped
        assert out["doc_id"].to_pylist() == [0, 2]
        kinds = [sniff_container(p) for p in out["payload"].to_pylist()]
        assert kinds == ["ppm", "png"]  # doc_id 0 -> ppm, 2 -> png
