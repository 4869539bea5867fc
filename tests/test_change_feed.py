"""Change Data Feed (Table.changes): the net row-level diff between two
snapshots, derived from the snapshots alone (the reference's Delta JAR
writes CDC files at commit time; this engine reconstructs the feed after
the fact, so it works across any commit range with zero write overhead).

Invariants under test:
- rewrite-only commits (compact / zorder) produce an EMPTY feed — every
  row in the rewritten files cancels by (key, content-hash);
- a MERGE range yields exactly the update pre/post-image pairs and the
  inserts of the source, nothing else;
- a merge-on-read DELETE range yields exactly the tombstoned rows as
  deletes (a DV change flips the file's (path, dv) signature);
- an append range yields exactly the appended rows as inserts;
- the feed composes: replaying inserts/deletes over the FROM scan
  reproduces the TO scan (token arrays included).
"""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    gen_tokens_chunk,
    gen_updates_chunk,
)
from tests.util import collect_sorted

N_ROWS = 1_000
ROWS_PER_FILE = 50


def _collect_feed(table: Table, v0: int, v1: int | None = None) -> pa.Table:
    blocks = [
        b
        for b in __import__("ray").get(table.changes(v0, v1).to_arrow_refs())
        if b.num_rows
    ]
    if not blocks:
        return table.schema.append(pa.field("_change_type", pa.string())).empty_table()
    return (
        pa.concat_tables(blocks)
        .sort_by([("doc_id", "ascending"), ("_change_type", "ascending")])
        .combine_chunks()
    )


@pytest.fixture(scope="module")
def table(tmp_path_factory) -> Table:
    root = tmp_path_factory.mktemp("cdf") / "tokens"
    t = build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)
    t._test_v0 = t.version()
    return t


class TestChangeFeed:
    def test_rewrite_only_range_is_empty(self, table):
        v0 = table.version()
        table.compact(target_file_bytes=1 << 20)
        table.zorder(target_file_bytes=1 << 20)
        feed = _collect_feed(table, v0)
        assert feed.num_rows == 0

    def test_merge_range_is_exact_updates_and_inserts(self, table):
        v0 = table.version()
        src = gen_updates_chunk(N_ROWS, n_updates=40, n_inserts=15)
        pre = collect_sorted(table.scan(version=v0))
        table.merge(src)
        feed = _collect_feed(table, v0)
        by_type = {
            t: feed.filter(pc.equal(feed["_change_type"], t))
            for t in ("insert", "delete", "update_preimage", "update_postimage")
        }
        # keep-latest dedup of the source defines the expected image
        from realtime_clickstream_lakehouse_ray.pipelines.table import (
            _dedup_keep_latest,
        )

        src_d = _dedup_keep_latest(src, "doc_id")
        pre_keys = set(pre["doc_id"].to_pylist())
        src_keys = src_d["doc_id"].to_pylist()
        upd_keys = sorted(k for k in src_keys if k in pre_keys)
        ins_keys = sorted(k for k in src_keys if k not in pre_keys)
        assert by_type["delete"].num_rows == 0
        assert sorted(by_type["insert"]["doc_id"].to_pylist()) == ins_keys
        assert sorted(by_type["update_preimage"]["doc_id"].to_pylist()) == upd_keys
        assert sorted(by_type["update_postimage"]["doc_id"].to_pylist()) == upd_keys
        # post-images carry the SOURCE tokens, pre-images the OLD tokens
        post = by_type["update_postimage"].sort_by("doc_id")
        src_upd = src_d.filter(
            pc.is_in(src_d["doc_id"], value_set=pa.array(upd_keys))
        ).sort_by("doc_id")
        assert post["tokens"].combine_chunks().equals(
            src_upd["tokens"].combine_chunks()
        )
        pre_upd = pre.filter(pc.is_in(pre["doc_id"], value_set=pa.array(upd_keys)))
        assert (
            by_type["update_preimage"]
            .sort_by("doc_id")["tokens"]
            .combine_chunks()
            .equals(pre_upd["tokens"].combine_chunks())
        )

    def test_mor_delete_range_is_pure_deletes(self, table):
        v0 = table.version()
        live = collect_sorted(table.scan(version=v0))
        dead = live["doc_id"].to_pylist()[::97]
        table.delete(keys=dead, mode="mor")
        feed = _collect_feed(table, v0)
        assert set(feed["_change_type"].to_pylist()) == {"delete"}
        assert sorted(feed["doc_id"].to_pylist()) == sorted(dead)

    def test_append_range_is_pure_inserts(self, table):
        v0 = table.version()
        extra = gen_tokens_chunk(9_999, 50_000, 64)
        table.append(extra)
        feed = _collect_feed(table, v0)
        assert set(feed["_change_type"].to_pylist()) == {"insert"}
        assert feed.num_rows == extra.num_rows

    def test_feed_replay_reproduces_to_scan(self, table):
        """Applying the feed to the FROM scan yields the TO scan exactly."""
        v1 = table.version()
        feed = _collect_feed(table, table._test_v0, v1)
        base = collect_sorted(table.scan(version=table._test_v0))
        removed = feed.filter(
            pc.is_in(
                feed["_change_type"],
                value_set=pa.array(["delete", "update_preimage"]),
            )
        )
        added = feed.filter(
            pc.is_in(
                feed["_change_type"],
                value_set=pa.array(["insert", "update_postimage"]),
            )
        ).drop_columns(["_change_type"])
        kept = base.filter(
            pc.invert(pc.is_in(base["doc_id"], value_set=removed["doc_id"].combine_chunks()))
        )
        replayed = (
            pa.concat_tables([kept, added.cast(kept.schema)])
            .sort_by("doc_id")
            .combine_chunks()
        )
        now = collect_sorted(table.scan(version=v1))
        assert replayed["doc_id"].equals(now["doc_id"])
        assert replayed["tokens"].combine_chunks().equals(
            now["tokens"].combine_chunks()
        )


def test_changes_by_tag_and_timestamp(tmp_path):
    """table_changes between named refs / timestamps (the Delta
    table_changes('t', <ts1>, <ts2>) surface) resolves to the same feed as
    the version form."""
    import ray

    from realtime_clickstream_lakehouse_ray.pipelines.table import Table
    from realtime_clickstream_lakehouse_ray.sources.synth import gen_tokens_chunk

    t = Table.create(str(tmp_path / "cdftag"))
    t.append(gen_tokens_chunk(0, 0, 50))
    t.tag("base", 1)
    ts1 = t.log.read_version(1)["timestamp"]
    t.append(gen_tokens_chunk(1, 1000, 25))

    def rows(ds):
        return sorted(
            r
            for b in ray.get(ds.to_arrow_refs())
            if b.num_rows
            for r in b.column("doc_id").to_pylist()
        )

    by_version = rows(t.changes(1))
    assert len(by_version) == 25
    assert rows(t.changes(from_tag="base")) == by_version
    assert rows(t.changes(from_ts=ts1)) == by_version
    import pytest as _pytest

    with _pytest.raises(ValueError, match="from_version"):
        t.changes()
