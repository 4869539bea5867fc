"""Shallow CLONE: manifest-level zero-copy clone referencing the source's
data files by absolute path, copy-on-write divergence, and vacuum safety
(the clone can never reclaim source files)."""

import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    gen_updates_chunk,
)
from tests.util import assert_tokens_equal, collect_sorted

N_ROWS = 1_000
ROWS_PER_FILE = 100


@pytest.fixture(scope="module")
def source(tmp_path_factory) -> Table:
    root = tmp_path_factory.mktemp("clone-src") / "tokens"
    return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)


class TestShallowClone:
    def test_clone_scan_equals_source_no_data_copied(self, source, tmp_path_factory):
        tgt = tmp_path_factory.mktemp("clone-a") / "tokens"
        c = source.clone(str(tgt))
        assert_tokens_equal(collect_sorted(c.scan()), collect_sorted(source.scan()))
        # zero data files under the clone's root
        assert not list(c.root.glob(f"{c.partition_col}=*/*.parquet"))

    def test_divergence_is_copy_on_write(self, source, tmp_path_factory):
        tgt = tmp_path_factory.mktemp("clone-b") / "tokens"
        c = source.clone(str(tgt))
        pre_src = collect_sorted(source.scan())
        c.merge(gen_updates_chunk(N_ROWS, n_updates=30, n_inserts=10))
        c.update(
            [{"column": "source", "op": "suffix", "value": "-c"}], max_n_tok=59
        )
        # the source never changes
        assert_tokens_equal(collect_sorted(source.scan()), pre_src)
        # the clone sees its own edits
        post = collect_sorted(c.scan())
        assert post.num_rows == N_ROWS + 10

    def test_clone_vacuum_never_touches_source(self, source, tmp_path_factory):
        tgt = tmp_path_factory.mktemp("clone-c") / "tokens"
        c = source.clone(str(tgt))
        c.compact(target_file_bytes=1 << 20)  # promote: all files now local
        c.expire_snapshots(keep_last=1)
        c.vacuum(min_age_seconds=0.0)
        # every source data file still exists and the source scans clean
        for f in source.files():
            assert (source.root / f.path).is_file()
        assert collect_sorted(source.scan()).num_rows == N_ROWS
        # and the clone is fully self-contained now (no absolute refs left)
        for f in c.files():
            assert not f.path.startswith("/")
            assert (c.root / f.path).is_file()

    def test_clone_carries_deletion_vectors(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("clone-dv") / "tokens"
        src = build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)
        live = collect_sorted(src.scan())
        dead = live["doc_id"].to_pylist()[::53]
        src.delete(keys=dead, mode="mor")
        c = src.clone(str(tmp_path_factory.mktemp("clone-dv-t") / "tokens"))
        got = collect_sorted(c.scan())
        assert got.num_rows == N_ROWS - len(dead)
        import pyarrow as pa

        hit = pc.any(
            pc.is_in(got["doc_id"], value_set=pa.array(dead))
        ).as_py()
        assert not hit
