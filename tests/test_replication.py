"""CDC replication loop: shallow-clone a table, keep mutating the source
(merge / update / delete), and incrementally sync the clone by applying
``source.changes(since)`` with ``apply_changes`` — the replica must equal
the source after every sync, without ever re-copying the table."""

import pyarrow as pa
import pytest
import ray

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    gen_updates_chunk,
)
from tests.util import assert_tokens_equal, collect_sorted

N_ROWS = 1_000
ROWS_PER_FILE = 100


def _feed(table: Table, v0: int) -> pa.Table:
    blocks = [b for b in ray.get(table.changes(v0).to_arrow_refs()) if b.num_rows]
    if not blocks:
        return table.schema.append(pa.field("_change_type", pa.string())).empty_table()
    return pa.concat_tables(blocks)


class TestCdcReplication:
    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("repl-src") / "tokens"
        src = build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)
        replica = src.clone(str(tmp_path_factory.mktemp("repl-dst") / "tokens"))
        return src, replica

    def test_incremental_sync_after_merge(self, pair):
        src, replica = pair
        v_synced = src.version()
        src.merge(gen_updates_chunk(N_ROWS, n_updates=50, n_inserts=20))
        replica.apply_changes(_feed(src, v_synced))
        assert_tokens_equal(collect_sorted(replica.scan()), collect_sorted(src.scan()))

    def test_incremental_sync_after_delete_and_update(self, pair):
        src, replica = pair
        v_synced = src.version()
        live = collect_sorted(src.scan())
        src.delete(keys=live["doc_id"].to_pylist()[::71])
        src.update(
            [{"column": "source", "op": "suffix", "value": "-r"}], max_n_tok=59
        )
        replica.apply_changes(_feed(src, v_synced))
        got, want = collect_sorted(replica.scan()), collect_sorted(src.scan())
        assert got["doc_id"].equals(want["doc_id"])
        assert got["tokens"].combine_chunks().equals(want["tokens"].combine_chunks())
        assert got["source"].combine_chunks().equals(want["source"].combine_chunks())

    def test_rewrite_only_commits_sync_to_noop(self, pair):
        src, replica = pair
        v_synced = src.version()
        src.compact(target_file_bytes=1 << 20)
        feed = _feed(src, v_synced)
        assert feed.num_rows == 0
        assert replica.apply_changes(feed) is None
