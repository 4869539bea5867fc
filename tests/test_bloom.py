"""Per-file key Bloom filters: kernel properties + MERGE file-skipping.

After Z-order, per-file [min_key, max_key] ranges span the key space and
range pruning is useless; the Bloom sidecar must restore skipping for
small MERGE sources without ever producing a false negative (which would
silently drop an update)."""

import numpy as np
import pyarrow as pa
import pytest

from realtime_clickstream_lakehouse_ray.functions.bloom import (
    bloom_any_match,
    bloom_might_contain,
    build_bloom,
)
from realtime_clickstream_lakehouse_ray.functions.hashing import hash64


def test_bloom_no_false_negatives_and_low_fp():
    rng = np.random.default_rng(11)
    members = rng.integers(1, 2**63, 20_000).astype(np.uint64)
    others = rng.integers(1, 2**63, 20_000).astype(np.uint64)
    others = np.setdiff1d(others, members)
    b = build_bloom(members)
    assert bloom_might_contain(b, members).all()  # zero false negatives
    fp = bloom_might_contain(b, others).mean()
    assert fp < 0.03, fp  # ~1% design point at 10 bits/key, k=4

    assert bloom_any_match(b, members[:1])
    assert not bloom_any_match(b, np.array([], dtype=np.uint64))


def test_bloom_empty_and_single():
    b = build_bloom(np.array([], dtype=np.uint64))
    assert not bloom_any_match(b, np.array([123], dtype=np.uint64))
    one = np.array([42], dtype=np.uint64)
    assert bloom_might_contain(build_bloom(one), one).all()


@pytest.fixture(scope="module")
def zordered_table(tmp_path_factory):
    import ray

    from realtime_clickstream_lakehouse_ray.sources.synth import build_synthetic_table

    root = str(tmp_path_factory.mktemp("bloomtbl") / "tokens")
    t = build_synthetic_table(root, 20_000, rows_per_file=1_000)
    t.compact(target_file_bytes=1 << 20)
    t.zorder(target_file_bytes=1 << 20)
    return t


def test_merge_bloom_skips_unrelated_files(zordered_table):
    from realtime_clickstream_lakehouse_ray.util import to_arrow_table

    t = zordered_table
    files_before = {f.path for f in t.files()}
    assert t.blooms(), "zorder commit must produce a bloom sidecar"
    # source = 3 keys taken from ONE scanned file -> with blooms, merge must
    # rewrite only the file(s) that can contain them, not the whole table
    sample = to_arrow_table(t.scan(columns=["doc_id", "source"])).slice(0, 3)
    src = pa.table(
        {
            "doc_id": sample["doc_id"],
            "tokens": pa.array([[1, 2], [3], [4, 5, 6]], pa.list_(pa.int32())),
            "n_tok": pa.array([2, 1, 3], pa.int32()),
            "source": sample["source"],
        }
    )
    v = t.merge(src)
    commit = t.log.read_version(v)
    rewrites = [a for a in commit["actions"] if a["op"] == "remove"]
    n_files = len(files_before)
    assert len(rewrites) <= max(3, n_files // 4), (
        f"bloom prune ineffective: {len(rewrites)} of {n_files} files rewritten"
    )
    # correctness: the 3 docs now carry the new token arrays
    out = to_arrow_table(t.scan()).sort_by("doc_id")
    idx = {d: i for i, d in enumerate(out["doc_id"].to_pylist())}
    for row, d in enumerate(sample["doc_id"].to_pylist()):
        assert out["tokens"][idx[d]].as_py() == src["tokens"][row].as_py()


def test_merge_without_blooms_still_correct(zordered_table, tmp_path_factory):
    """Deleting the sidecar only disables skipping — results identical."""
    import shutil

    from realtime_clickstream_lakehouse_ray.pipelines.table import Table
    from realtime_clickstream_lakehouse_ray.util import to_arrow_table

    src_root = str(zordered_table.root)
    clone = str(tmp_path_factory.mktemp("bloomclone") / "tokens")
    shutil.copytree(src_root, clone)
    t2 = Table.load(clone)
    shutil.rmtree(t2.root / "_blooms")
    assert t2.blooms() == {}
    sample = to_arrow_table(t2.scan(columns=["doc_id", "source"])).slice(0, 2)
    src = pa.table(
        {
            "doc_id": sample["doc_id"],
            "tokens": pa.array([[9], [8, 7]], pa.list_(pa.int32())),
            "n_tok": pa.array([1, 2], pa.int32()),
            "source": sample["source"],
        }
    )
    t2.merge(src)
    out = to_arrow_table(t2.scan()).sort_by("doc_id")
    idx = {d: i for i, d in enumerate(out["doc_id"].to_pylist())}
    for row, d in enumerate(sample["doc_id"].to_pylist()):
        assert out["tokens"][idx[d]].as_py() == src["tokens"][row].as_py()


def test_rewrite_manifests_consolidates_sidecars(zordered_table, tmp_path_factory):
    import shutil

    from realtime_clickstream_lakehouse_ray.pipelines.table import Table

    clone = str(tmp_path_factory.mktemp("bloomrw") / "tokens")
    shutil.copytree(str(zordered_table.root), clone)
    t = Table.load(clone)
    t.compact(target_file_bytes=4 << 20)  # obsoletes the zorder files' blooms
    before = t.blooms()
    n_sidecars = len(list((t.root / "_blooms").glob("v*.parquet")))
    t.rewrite_manifests()
    after_files = list((t.root / "_blooms").glob("v*.parquet"))
    # one consolidated sidecar (or none if no live blooms), same mapping
    assert len(after_files) <= 1
    assert t.blooms() == before
