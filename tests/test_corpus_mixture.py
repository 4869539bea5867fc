"""Corpus/mixture/funnel semantics pinned on hand-crafted inputs
(oracle parity on the shared tables is covered by test_oracle_parity.py)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from realtime_clickstream_lakehouse_ray.pipelines import clickstream, corpus, mixture

SF = "/root/testdata/sf0.001"


@pytest.fixture
def events_dir(tmp_path):
    """Tiny events table with every funnel edge case."""
    ts = lambda s: np.datetime64(f"2024-01-01T00:00:{s:02d}", "us")
    rows = [
        # user 1: full ordered chain
        (1, ts(1), "view"), (1, ts(2), "click"), (1, ts(3), "purchase"),
        # user 2: click BEFORE first view only -> stops at view stage
        (2, ts(2), "view"), (2, ts(1), "click"),
        # user 3: no click at all -> purchase must NOT count
        (3, ts(1), "view"), (3, ts(2), "purchase"),
        # user 4: click at the SAME ts as view (not strictly after)
        (4, ts(1), "view"), (4, ts(1), "click"),
        # user 5: purchase before the qualifying click
        (5, ts(1), "view"), (5, ts(3), "click"), (5, ts(2), "purchase"),
        # user 6: never viewed
        (6, ts(1), "click"), (6, ts(2), "purchase"),
    ]
    t = pa.table(
        {
            "event_id": pa.array(range(len(rows)), type=pa.int64()),
            "ts": pa.array([r[1] for r in rows], type=pa.timestamp("us")),
            "user_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "event_type": pa.array([r[2] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(['{"k": 1}'] * len(rows)),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    return str(tmp_path)


def test_funnel_strict_ordering(ray_session, events_dir):
    got = (
        clickstream.events_funnel(events_dir)
        .to_pandas()
        .set_index("stage")["n_users"]
    )
    assert got["view"] == 5          # users 1-5
    assert got["click"] == 2         # users 1 and 5 (click strictly after view)
    assert got["purchase"] == 1      # user 1 only


def test_sample_by_hash_deterministic(ray_session):
    a = mixture.sample_by_hash(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    b = mixture.sample_by_hash(SF).to_pandas().sort_values("doc_id", ignore_index=True)
    pd.testing.assert_frame_equal(a, b)
    n_total = 500
    assert 0.03 * n_total < len(a) < 0.25 * n_total  # ~10% nominal


def test_source_budget_monotone(ray_session):
    small = mixture.source_char_budget(SF, budget=10_000).to_pandas()
    big = mixture.source_char_budget(SF, budget=50_000).to_pandas()
    assert set(small["doc_id"]) <= set(big["doc_id"])
    # within each source, kept docs are a doc_id prefix of the big set
    for src, sub in big.groupby("source"):
        s = small[small["source"] == src]
        if len(s):
            assert s["doc_id"].max() <= sub["doc_id"].max()


def test_pack_sequences_chunks_are_contiguous(ray_session):
    out = (
        mixture.pack_sequences_assign(SF, seq_len=4096)
        .to_pandas()
        .sort_values(["source", "doc_id"], ignore_index=True)
    )
    for _, sub in out.groupby("source"):
        seq = sub["seq_id"].to_numpy()
        assert (np.diff(seq) >= 0).all()  # nondecreasing along doc order
        assert seq[0] == 0


def test_doc_rarity_marker_word(ray_session, tmp_path):
    # a document containing a word that appears nowhere else must have
    # min_df == 1 and at least one hapax
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "alpha beta gamma uniqz9",
                    "alpha beta gamma",
                    "alpha beta gamma",
                ]
            ),
            "lang": pa.array(["en"] * 3),
            "source": pa.array(["t"] * 3),
            "n_chars": pa.array([10, 10, 10], type=pa.int64()),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = corpus.doc_rarity(str(tmp_path)).to_pandas().set_index("doc_id")
    assert got.loc[1, "min_df"] == 1 and got.loc[1, "n_hapax"] == 1
    assert got.loc[2, "min_df"] == 3 and got.loc[2, "n_hapax"] == 0


def test_tfidf_top_terms_planted(tmp_path):
    # doc 1: "rare" appears twice and only here -> top term (tf=2, df=1).
    # "common" is in every doc (df=3) so it scores lowest everywhere.
    t = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], type=pa.int64()),
            "text": pa.array(
                [
                    "rare rare common mid",
                    "common mid mid",
                    "common solo",
                ]
            ),
        }
    )
    pq.write_table(t, tmp_path / "documents.parquet")
    got = corpus.tfidf_top_terms(str(tmp_path), k=2).to_pandas()
    d1 = got[got["doc_id"] == 1].sort_values("tf", ascending=False)
    assert d1["word"].tolist()[0] == "rare"
    assert d1.iloc[0]["tf"] == 2 and d1.iloc[0]["df"] == 1
    # doc 3: solo (1/1=1.0) beats common (1/3)
    d3 = got[got["doc_id"] == 3]
    assert set(d3["word"]) == {"solo", "common"}
    assert len(got[got["doc_id"] == 2]) == 2


def test_cohort_retention_planted(tmp_path):
    # user 1 first active week of 2020-01-06 (Mon), returns following week;
    # user 2 joins the second week only.
    ts = pd.to_datetime(
        ["2020-01-07", "2020-01-08", "2020-01-14", "2020-01-15"]
    )
    t = pa.table(
        {
            "user_id": pa.array([1, 1, 1, 2], type=pa.int64()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    pq.write_table(t, tmp_path / "events.parquet")
    got = clickstream.cohort_retention(str(tmp_path)).to_pandas()
    got = got.sort_values(["cohort_week", "week"], ignore_index=True)
    w1, w2 = pd.Timestamp("2020-01-06"), pd.Timestamp("2020-01-13")
    rows = {
        (r.cohort_week, r.week): r.n_users for r in got.itertuples(index=False)
    }
    assert rows == {(w1, w1): 1, (w1, w2): 1, (w2, w2): 1}


def test_heavy_hitters_exact_under_aggressive_trim(ray_session):
    """The MG candidate pass must stay a superset even when every batch
    trims hard (cap at the guarantee's floor), so the recounted output
    equals a brute-force count."""
    sf = "/root/testdata/sf0.001"
    inv_phi = 16
    got = corpus.heavy_hitter_words(sf, inv_phi=inv_phi, cap=2 * inv_phi - 1)
    exact = corpus.word_frequencies(sf).to_pandas()
    total = int(exact["n"].sum())
    exp = exact[exact["n"] * inv_phi >= total].sort_values(
        ["n", "word"], ascending=[False, True], ignore_index=True
    )
    got_df = got.to_pandas()
    assert list(got_df["word"]) == list(exp["word"])
    assert list(got_df["n"]) == list(exp["n"].astype("int64"))


def test_heavy_hitters_rejects_bad_cap(ray_session):
    with pytest.raises(ValueError, match="cap"):
        corpus.heavy_hitter_words("/root/testdata/sf0.001", inv_phi=16, cap=8)


def test_pack_sequences_tokens_matches_bruteforce(ray_session):
    """Packed fixed-length token arrays equal a brute-force per-source
    concat-and-chunk, including docs straddling chunk boundaries (L=64
    forces many straddles on the fixture)."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words
    from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

    sf, L = "/root/testdata/sf0.001", 64
    got = (
        mixture.pack_sequences_tokens(sf, seq_len=L)
        .to_pandas()
        .sort_values(["source", "seq_id"], ignore_index=True)
    )
    docs = pq.read_table(
        f"{sf}/documents.parquet", columns=["doc_id", "source", "text"]
    ).sort_by("doc_id")
    words = split_words(docs["text"])
    vals = (hash64(words.flatten()) % np.uint64(VOCAB)).astype(np.int32)
    toks = pa.ListArray.from_arrays(words.offsets, pa.array(vals, pa.int32()))
    src = np.asarray(docs["source"]).astype(str)
    i = 0
    for s in np.unique(src):
        idx = np.nonzero(src == s)[0]
        stream = np.concatenate([np.asarray(toks[j].values) for j in idx])
        starts = np.concatenate([[0], np.cumsum([len(toks[j]) for j in idx])])
        for q in range(-(-len(stream) // L)):
            row = got.iloc[i]
            assert (row["source"], row["seq_id"]) == (s, q)
            assert np.array_equal(np.asarray(row["tokens"]), stream[q * L : (q + 1) * L])
            assert row["n_docs"] == int(
                np.sum((starts[:-1] < (q + 1) * L) & (starts[1:] > q * L))
            )
            i += 1
    assert i == len(got)


def _fixture_tokens():
    """Brute-force per-doc token arrays on the sf0.001 fixture, doc_id order."""
    from realtime_clickstream_lakehouse_ray.functions.hashing import hash64
    from realtime_clickstream_lakehouse_ray.functions.textstats import split_words
    from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source", "text"]
    ).sort_by("doc_id")
    words = split_words(docs["text"])
    vals = (hash64(words.flatten()) % np.uint64(VOCAB)).astype(np.int32)
    toks = pa.ListArray.from_arrays(words.offsets, pa.array(vals, pa.int32()))
    return docs, toks


def test_split_sequences_matches_bruteforce(ray_session):
    """Chunk token arrays equal per-doc numpy slicing at L=32 (short last
    chunks, multi-chunk docs), and chunks reassemble to the original doc."""
    L = 32
    got = (
        mixture.split_sequences(SF, max_len=L)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"], ignore_index=True)
    )
    docs, toks = _fixture_tokens()
    ids = np.asarray(docs["doc_id"])
    i = 0
    for j, d in enumerate(ids):
        arr = np.asarray(toks[j].values)
        for q in range(-(-len(arr) // L)):
            row = got.iloc[i]
            assert (row["doc_id"], row["chunk_id"]) == (d, q)
            chunk = np.asarray(row["tokens"])
            assert np.array_equal(chunk, arr[q * L : (q + 1) * L])
            assert row["n_tok"] == len(chunk)
            i += 1
    assert i == len(got)


def test_split_sequences_rejects_bad_len(ray_session):
    with pytest.raises(ValueError, match="max_len"):
        mixture.split_sequences(SF, max_len=0)


def test_split_sequences_overlap_matches_bruteforce(ray_session):
    """Overlapping chunks equal per-doc numpy striding at W=32/S=24: chunk
    k = arr[k*S : k*S+W]; consecutive chunks share W-S tokens."""
    W, S = 32, 24
    got = (
        mixture.split_sequences_overlap(SF, window=W, stride=S)
        .to_pandas()
        .sort_values(["doc_id", "chunk_id"], ignore_index=True)
    )
    docs, toks = _fixture_tokens()
    ids = np.asarray(docs["doc_id"])
    i = 0
    for j, d in enumerate(ids):
        arr = np.asarray(toks[j].values)
        for q in range(-(-len(arr) // S)):
            row = got.iloc[i]
            assert (row["doc_id"], row["chunk_id"]) == (d, q)
            chunk = np.asarray(row["tokens"])
            assert np.array_equal(chunk, arr[q * S : q * S + W])
            assert row["n_tok"] == len(chunk)
            i += 1
    assert i == len(got)


def test_split_sequences_overlap_rejects_bad_stride(ray_session):
    with pytest.raises(ValueError, match="stride"):
        mixture.split_sequences_overlap(SF, window=16, stride=32)


def test_vocab_remap_matches_bruteforce(ray_session):
    """Remapped values equal the affine map applied per element; offsets
    (doc structure) untouched; bijection check on the whole corpus."""
    from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

    mult, add = 31, 7
    got = (
        mixture.vocab_remap(SF, mult=mult, add=add)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    docs, toks = _fixture_tokens()
    assert np.array_equal(np.asarray(got["doc_id"]), np.asarray(docs["doc_id"]))
    for j in range(len(docs)):
        orig = np.asarray(toks[j].values).astype(np.int64)
        exp = ((mult * orig + add) % VOCAB).astype(np.int32)
        assert np.array_equal(np.asarray(got.iloc[j]["tokens"]), exp)
    # bijection: distinct token count is invariant under the remap
    all_orig = np.asarray(toks.values).astype(np.int64)
    all_new = (mult * all_orig + add) % VOCAB
    assert len(np.unique(all_orig)) == len(np.unique(all_new))


def test_vocab_remap_rejects_degenerate_mult(ray_session):
    from realtime_clickstream_lakehouse_ray.sources.synth import VOCAB

    with pytest.raises(ValueError, match="mult"):
        mixture.vocab_remap(SF, mult=VOCAB * 2)


def test_balanced_resample_uniform_and_deterministic(ray_session):
    """Every source keeps exactly min(per-source count) docs, and the kept
    set equals the brute-force smallest-hash-rank selection."""
    got = (
        mixture.balanced_resample(SF)
        .to_pandas()
        .sort_values(["source", "doc_id"], ignore_index=True)
    )
    docs = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "source"])
    df = docs.to_pandas()
    target = int(df.groupby("source").size().min())
    sizes = got.groupby("source").size()
    assert set(sizes.index) == set(df["source"].unique())
    assert (sizes == target).all()
    df["rk"] = ((df["doc_id"] % 100000007) * 2654435761) % 4294967296
    exp = (
        df.sort_values(["source", "rk", "doc_id"])
        .groupby("source")
        .head(target)[["doc_id", "source"]]
        .sort_values(["source", "doc_id"], ignore_index=True)
    )
    pd.testing.assert_frame_equal(got[["doc_id", "source"]], exp)


def test_proportional_quota_sample_exact_total(ray_session):
    """Quotas sum exactly to the requested total (largest remainder), are
    proportional to source sizes, and the kept set equals brute force."""
    total = 101
    got = (
        mixture.proportional_quota_sample(SF, total=total)
        .to_pandas()
        .sort_values(["source", "doc_id"], ignore_index=True)
    )
    assert len(got) == total
    df = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "source"]
    ).to_pandas()
    cnt = df.groupby("source").size().sort_index()
    n = int(cnt.sum())
    fl = (total * cnt) // n
    rem = (total * cnt) % n
    leftover = int(total - fl.sum())
    order = rem.rename("rem").reset_index().sort_values(
        ["rem", "source"], ascending=[False, True]
    )["source"]
    quota = fl.copy()
    quota.loc[order.iloc[:leftover]] += 1
    sizes = got.groupby("source").size()
    for s in cnt.index:
        assert sizes.get(s, 0) == quota[s]
    df["rk"] = ((df["doc_id"] % 100000007) * 2654435761) % 4294967296
    exp = pd.concat(
        [
            g.sort_values(["rk", "doc_id"]).head(int(quota[s]))
            for s, g in df.groupby("source")
        ]
    )[["doc_id", "source"]].sort_values(["source", "doc_id"], ignore_index=True)
    pd.testing.assert_frame_equal(got[["doc_id", "source"]], exp)


def test_ngram_novelty_planted(tmp_path, ray_session):
    """Trigram novelty vs a hand-computed reference: a doc assembled
    entirely from another doc's phrases scores 1.0; a fully novel doc
    scores 0.0; <3-word docs emit no row."""
    texts = {
        0: "the cat sat on the mat",        # trigrams: 4
        1: "the cat sat on the mat today",  # shares doc 0's 4, adds 2 novel
        2: "completely novel words here",   # 2 trigrams, none shared
        3: "too short",                     # no trigram -> no row
    }
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(texts), pa.int64()),
                "text": pa.array(list(texts.values()), pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = (
        corpus.ngram_novelty(str(tmp_path))
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    assert list(got["doc_id"]) == [0, 1, 2]
    assert list(got["n_grams"]) == [4, 5, 2]
    # doc 1's "on the mat"/"the mat today" tail: only the first 4 positions
    # ("the cat sat".."on the mat") also occur in doc 0
    assert list(got["n_shared"]) == [4, 4, 0]
    assert list(got["shared_ratio"]) == [1.0, 0.8, 0.0]


def test_ngram_novelty_brute_force(ray_session):
    """Exact match against a pure-Python reference on the sf0.001 corpus."""
    from collections import Counter

    got = (
        corpus.ngram_novelty(SF)
        .to_pandas()
        .sort_values("doc_id", ignore_index=True)
    )
    df = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]).to_pandas()
    doc_grams, dfreq = {}, Counter()
    for did, text in zip(df["doc_id"], df["text"]):
        w = text.split()
        grams = [" ".join(w[i : i + 3]) for i in range(len(w) - 2)]
        doc_grams[did] = grams
        dfreq.update(set(grams))
    rows = []
    for did in sorted(doc_grams):
        grams = doc_grams[did]
        if not grams:
            continue
        shared = sum(1 for g in grams if dfreq[g] >= 2)
        rows.append((did, len(grams), shared, shared / len(grams)))
    exp = pd.DataFrame(rows, columns=["doc_id", "n_grams", "n_shared", "shared_ratio"])
    pd.testing.assert_frame_equal(got, exp.astype({"doc_id": "int64", "n_grams": "int64", "n_shared": "int64"}))


def test_source_ngram_overlap_planted(tmp_path, ray_session):
    """Two sources with identical gram sets score jaccard 1.0; a disjoint
    source appears in no pair row (inner-join semantics)."""
    docs = [
        (0, "a", "one two three four"),      # grams: {one two three, two three four}
        (1, "b", "one two three four"),      # same set as a
        (2, "b", "one two three"),           # subset — adds nothing new to b
        (3, "c", "five six seven eight"),    # disjoint
    ]
    ids, srcs, txts = zip(*docs)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "source": pa.array(srcs, pa.string()),
                "text": pa.array(txts, pa.string()),
            }
        ),
        str(tmp_path / "documents.parquet"),
    )
    got = corpus.source_ngram_overlap(str(tmp_path)).to_pandas()
    assert len(got) == 1
    r = got.iloc[0]
    assert (r.source_a, r.source_b) == ("a", "b")
    assert r.n_inter == 2 and r.n_union == 2 and r.jaccard == 1.0


def test_bigram_partials_planted(ray_session, tmp_path):
    """Bigram extraction on crafted docs: empty docs and one-word docs
    emit nothing; pairs never cross document boundaries."""
    docs = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", "", "solo", "b c"]),
        }
    )
    out = corpus._bigram_partials(docs).to_pandas().set_index("bigram")["n_part"]
    # "c" (doc 0 end) never pairs with "solo" or "b" from later docs
    assert out.to_dict() == {"a b": 1, "b c": 2}


def test_bigram_topk_tiebreak(ray_session, tmp_path):
    import ray as _ray

    p = tmp_path / "documents.parquet"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["z y z y", "a b a b"]),
            }
        ),
        p,
    )
    got = corpus.bigram_topk(str(tmp_path), k=3).to_pandas()
    # counts: "z y" 2? no: doc0 bigrams = [z y, y z, z y] -> z y:2, y z:1
    # doc1 = [a b, b a, a b] -> a b:2, b a:1; top-3 by (n desc, bigram asc)
    assert list(map(tuple, got.to_numpy())) == [("a b", 2), ("z y", 2), ("b a", 1)]


def test_doc_rarity_bucketed_regime_equals_broadcast():
    """The 100-TB-vocabulary fallback (bucketed hash join on word) must
    produce exactly the broadcast regime's relation."""
    import pyarrow as pa
    import ray

    from realtime_clickstream_lakehouse_ray.pipelines.corpus import (
        doc_rarity,
        doc_rarity_bucketed,
    )

    sf = "/root/testdata/sf0.01"

    def norm(ds):
        parts = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
        t = pa.concat_tables(parts, promote_options="default")
        cols = sorted(t.column_names)
        t = t.select(cols)
        t = pa.table({c: t[c].cast(pa.int64()) for c in cols})
        return t.sort_by([(c, "ascending") for c in cols]).to_pydict()

    assert norm(doc_rarity(sf)) == norm(doc_rarity_bucketed(sf))
