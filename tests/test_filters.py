"""Corpus filtering ops: quality gate, decontamination, chunking,
stratified sampling, anti/semi join, embedding outliers — planted-fixture
semantics checks (the oracle-parity suite covers exact SQL equivalence)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from realtime_clickstream_lakehouse_ray.pipelines import corpus, filters, mixture, relational

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def contamination_dir(tmp_path_factory):
    """documents.parquet with planted contamination (bench_mod=17):
    doc 0 (benchmark) has a known text; doc 1 copies words 2..8 of doc 0
    (three shared 5-grams); doc 2 is disjoint; doc 17 is also benchmark."""
    w = [f"tok{i}" for i in range(30)]
    bench_text = " ".join(w[:12])
    contaminated = " ".join(["aaa"] + w[2:9] + ["bbb", "ccc", "ddd", "eee"])
    clean = " ".join(f"z{i}" for i in range(15))
    bench2 = " ".join(f"y{i}" for i in range(10))
    d = tmp_path_factory.mktemp("contam")
    texts = {0: bench_text, 1: contaminated, 2: clean, 17: bench2}
    ids = sorted(texts)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "text": [texts[i] for i in ids],
                "lang": ["en"] * len(ids),
                "source": ["s0"] * len(ids),
                "n_chars": pa.array([len(texts[i]) for i in ids], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_decontaminate_planted(contamination_dir):
    out = filters.decontaminate(contamination_dir).to_pandas()
    # doc 1 shares exactly three 5-grams with bench doc 0 (words 2-6, 3-7, 4-8)
    assert dict(zip(out["doc_id"], out["n_hit"])) == {1: 3}


def test_decontaminate_excludes_benchmark_docs(contamination_dir):
    out = filters.decontaminate(contamination_dir).to_pandas()
    assert not set(out["doc_id"]) & {0, 17}


def test_quality_filter_boundaries(tmp_path):
    texts = [
        " ".join(f"w{i}" for i in range(19)),   # 19 words -> too short
        " ".join(f"w{i}" for i in range(20)),   # 20 words -> keep
        " ".join(["dup"] * 30),                 # top_word_ratio 1.0 -> drop
        " ".join("x" * 20 for _ in range(25)),  # mean word len 20 -> drop
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(4), pa.int64()),
                "text": texts,
                "lang": ["en"] * 4,
                "source": ["s0"] * 4,
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = filters.quality_filter(str(tmp_path)).to_pandas().set_index("doc_id")
    assert not out.loc[0, "keep"] and out.loc[1, "keep"]
    assert not out.loc[2, "keep"] and not out.loc[3, "keep"]
    assert out.loc[2, "top_word_ratio"] == 1.0
    assert out.loc[3, "mean_word_len"] == 20.0


@pytest.mark.parametrize("n_chars", [1, 47, 48, 49, 64, 65, 112, 200])
def test_chunk_documents_reconstructs(tmp_path, n_chars):
    text = "".join(chr(ord("a") + i % 26) for i in range(n_chars))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([7], pa.int64()),
                "text": [text],
                "lang": ["en"],
                "source": ["s0"],
                "n_chars": pa.array([n_chars], pa.int64()),
            }
        ),
        tmp_path / "documents.parquet",
    )
    out = (
        corpus.chunk_documents(str(tmp_path))
        .to_pandas()
        .sort_values("chunk_idx", ignore_index=True)
    )
    expected = [text[i : i + 64] for i in range(0, n_chars, 48)]
    assert list(out["chunk"]) == expected
    assert list(out["chunk_idx"]) == list(range(len(expected)))


def test_chunk_documents_sf(ray_session=None):
    out = corpus.chunk_documents(SF).to_pandas()
    assert out["chunk"].str.len().max() <= 64
    assert (out.groupby("doc_id")["chunk_idx"].min() == 0).all()


def test_stratified_sample_deterministic():
    a = mixture.stratified_sample(SF, k=5).to_pandas()
    b = mixture.stratified_sample(SF, k=5).to_pandas()
    key = lambda df: sorted(map(tuple, df[["source", "doc_id"]].to_numpy()))
    assert key(a) == key(b)
    assert (a.groupby("source").size() == 5).all()


def test_bucket_join_semi_anti_partition():
    """semi + anti of the same join partition the left side exactly
    (right side filtered so BOTH partitions are non-empty at sf0.001)."""
    import pyarrow.compute as pc

    left = ray.data.read_parquet(f"{SF}/customer.parquet", columns=["c_custkey", "c_name"])
    right = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 400000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    semi = relational.bucket_hash_join(
        left, right, "c_custkey", "o_custkey", how="semi"
    ).to_pandas()
    anti = relational.bucket_hash_join(
        left, right, "c_custkey", "o_custkey", how="anti"
    ).to_pandas()
    assert len(semi) > 0 and len(anti) > 0
    assert len(semi) + len(anti) == left.count()
    assert not set(semi["c_custkey"]) & set(anti["c_custkey"])


def test_embedding_outliers_planted(tmp_path):
    rng = np.random.default_rng(11)
    base = rng.normal(0, 0.05, size=(40, 8)).astype(np.float32) + 1.0
    base[13] = -5.0  # planted far outlier in label 'a'
    labels = ["a"] * 20 + ["b"] * 20
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(40), pa.int64()),
                "embedding": pa.array([list(map(float, r)) for r in base], pa.list_(pa.float32())),
                "label": labels,
            }
        ),
        tmp_path / "embeddings.parquet",
    )
    out = filters.embedding_outliers(str(tmp_path), k=3).to_pandas()
    assert (out.groupby("label").size() == 3).all()
    a_rows = out[out["label"] == "a"]
    assert 13 in set(a_rows["vec_id"])  # the planted outlier is flagged


class TestPiiRedact:
    @pytest.fixture(scope="class")
    def pii_dir(self, tmp_path_factory):
        d = tmp_path_factory.mktemp("pii")
        texts = [
            "contact bob.smith+x@example.co.uk for the report",
            "card 1234567890 expired and pin 123456 too",
            "the customer met a user and another customer",
            "nothing sensitive here",
            "short num 12345 is kept",  # <6 digits: not redacted
        ]
        pq.write_table(
            pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                      "text": pa.array(texts)}),
            str(d / "documents.parquet"),
        )
        return str(d)

    def test_redaction_and_counts(self, pii_dir):
        out = filters.pii_redact(pii_dir).to_pandas().sort_values(
            "doc_id", ignore_index=True
        )
        assert out.loc[0, "text_redacted"] == "contact <EMAIL> for the report"
        assert out.loc[0, "n_redactions"] == 1
        assert out.loc[1, "text_redacted"] == "card <NUM> expired and pin <NUM> too"
        assert out.loc[1, "n_redactions"] == 2
        assert (
            out.loc[2, "text_redacted"] == "the <ID> met a <ID> and another <ID>"
        )
        assert out.loc[2, "n_redactions"] == 3
        assert out.loc[3, "n_redactions"] == 0
        assert out.loc[4, "text_redacted"] == "short num 12345 is kept"


class TestLeftJoinAndArgmin:
    def test_bucket_hash_join_left_matches_pandas(self):
        left = ray.data.from_arrow(
            pa.table({"k": pa.array([1, 2, 3, 4], pa.int64()),
                      "a": pa.array(["w", "x", "y", "z"])})
        )
        right = ray.data.from_arrow(
            pa.table({"rk": pa.array([2, 2, 4], pa.int64()),
                      "b": pa.array([10.0, 20.0, 30.0])})
        )
        got = (
            relational.bucket_hash_join(left, right, "k", "rk", how="left")
            .to_pandas()
            .sort_values(["k", "b"], ignore_index=True)
        )
        assert len(got) == 5  # k=2 expands x2, k=1/3 survive unmatched
        assert got.loc[got["k"] == 1, "b"].isna().all()
        assert sorted(got.loc[got["k"] == 2, "b"]) == [10.0, 20.0]

    def test_cheapest_supplier_ties_break_by_suppkey(self, tmp_path):
        t = pa.table(
            {
                "l_partkey": pa.array([7, 7, 7, 8], pa.int64()),
                "l_suppkey": pa.array([5, 3, 9, 1], pa.int64()),
                "l_extendedprice": pa.array([10.0, 10.0, 9.5, 4.0]),
            }
        )
        pq.write_table(t, str(tmp_path / "lineitem.parquet"))
        out = (
            relational.cheapest_supplier_per_part(str(tmp_path))
            .to_pandas()
            .sort_values("l_partkey", ignore_index=True)
        )
        assert out["l_partkey"].tolist() == [7, 8]
        assert out["l_suppkey"].tolist() == [9, 1]  # 9.5 beats the 10.0 tie
        assert out["min_price"].tolist() == [9.5, 4.0]


class TestShardManifest:
    def test_positions_dense_and_deterministic(self):
        out = mixture.training_shard_manifest(SF).to_pandas()
        assert len(out) == out["doc_id"].nunique()
        for shard, g in out.groupby("shard"):
            pos = np.sort(g["pos"].to_numpy())
            assert (pos == np.arange(len(g))).all()  # dense 0..n-1
        again = mixture.training_shard_manifest(SF).to_pandas()
        a = out.sort_values("doc_id", ignore_index=True)
        b = again.sort_values("doc_id", ignore_index=True)
        assert a.equals(b)


def test_length_percentile_filter_planted(tmp_path):
    """Per-source p10 gate: source A's shortest-of-ten is dropped while an
    equal-length doc in short-profile source B survives (the reason the
    gate is per-source, not global)."""
    # source a: n_chars 10,20,...,100 -> p10 cut = 10 (rank ceil(0.1*10)=1)
    # but quantile_disc keeps values >= cut, so 10 survives; use 11 docs so
    # the cut lands above the minimum: 10..110, rank ceil(1.1)=2 -> cut=20
    rows_a = [(i, "a", 10 * (i + 1)) for i in range(11)]
    rows_b = [(100 + i, "b", 5 + i) for i in range(11)]  # 5..15, cut=6
    ids, srcs, ncs = zip(*(rows_a + rows_b))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "n_chars": pa.array(ncs, pa.int64()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        filters.length_percentile_filter(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    # source a: doc 0 (n_chars=10 < 20) dropped; source b: doc 100 (5 < 6)
    # dropped even though 5-15 are all far below source a's cut
    assert set(got["doc_id"]) == (set(range(1, 11)) | set(range(101, 111)))
