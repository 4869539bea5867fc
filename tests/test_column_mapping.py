"""Column rename/drop WITHOUT file rewrite (Delta column-mapping name-mode
analog; reference registry compatibility=BACKWARD admits field removal on
the read path, infra/terraform/modules/glue/main.tf:38-66).

The invariant under test: physical parquet names freeze at first write;
rename/drop are metadata-only; every read path translates physical->logical
and every write path logical->physical, so token arrays survive
rename -> scan -> compact -> merge -> scan byte-for-byte."""

import numpy as np
import pyarrow as pa
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    expected_tokens_table,
)

N_ROWS = 1_200
ROWS_PER_FILE = 100


def _fresh(tmp_path_factory, name) -> Table:
    root = tmp_path_factory.mktemp(name) / "tokens"
    return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)


def _expected() -> pa.Table:
    return (
        expected_tokens_table(N_ROWS, ROWS_PER_FILE)
        .sort_by("doc_id")
        .combine_chunks()
    )


def _collect(ds) -> pa.Table:
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tbls).sort_by("doc_id").combine_chunks()


class TestRename:
    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "colmap_rename")
        t.rename_column("tokens", "token_ids")
        t.rename_column("n_tok", "length")
        return t

    def test_metadata_only_no_rewrite(self, table):
        # rename commits no snapshot and rewrites no file
        assert table.column_mapping == {"token_ids": "tokens", "length": "n_tok"}
        import pyarrow.parquet as pq

        f = table.files()[0]
        phys = pq.read_schema(table.root / f.path)
        assert "tokens" in phys.names and "token_ids" not in phys.names

    def test_scan_logical_names_token_equality(self, table):
        got = _collect(table.scan())
        assert got.column_names == ["doc_id", "token_ids", "length", "source"]
        exp = _expected()
        assert got["token_ids"].equals(exp["tokens"].cast(got["token_ids"].type))

    def test_scan_column_projection_logical(self, table):
        got = _collect(table.scan(columns=["doc_id", "length"]))
        assert got.column_names == ["doc_id", "length"]
        exp = _expected()
        assert got["length"].equals(exp["n_tok"].cast(got["length"].type))

    def test_compact_preserves_tokens_and_physical_names(self, table):
        import pyarrow.parquet as pq

        files_before = table.stats()["files"]
        table.compact(target_file_bytes=1 << 20)
        assert table.stats()["files"] < files_before
        got = _collect(table.scan())
        exp = _expected()
        assert got["token_ids"].equals(exp["tokens"].cast(got["token_ids"].type))
        # rewritten files STILL carry physical names (never logical leak)
        for f in table.files():
            phys = pq.read_schema(table.root / f.path)
            assert "tokens" in phys.names and "token_ids" not in phys.names

    def test_append_and_merge_accept_logical_names(self, table):
        new = pa.table(
            {
                "doc_id": ["zz-new-0001", "zz-new-0002"],
                "token_ids": pa.array(
                    [[1, 2, 3], [4, 5]], pa.list_(pa.int32())
                ),
                "length": pa.array([3, 2], pa.int32()),
                "source": ["web", "web"],
            }
        )
        table.append(new)
        got = _collect(table.scan())
        assert got.num_rows == N_ROWS + 2
        row = got.filter(
            pa.compute.equal(got["doc_id"], "zz-new-0001")
        )
        assert row["token_ids"].to_pylist() == [[1, 2, 3]]
        # MERGE with a logically-named source updates in place
        upd = pa.table(
            {
                "doc_id": ["zz-new-0001"],
                "token_ids": pa.array([[9, 9, 9, 9]], pa.list_(pa.int32())),
                "length": pa.array([4], pa.int32()),
                "source": ["web"],
            }
        )
        table.merge(upd)
        got = _collect(table.scan())
        row = got.filter(pa.compute.equal(got["doc_id"], "zz-new-0001"))
        assert row["token_ids"].to_pylist() == [[9, 9, 9, 9]]
        assert got.num_rows == N_ROWS + 2

    def test_time_travel_reads_old_files_with_current_names(self, table):
        got = _collect(table.scan(version=1))
        assert got.column_names == ["doc_id", "token_ids", "length", "source"]

    def test_load_round_trips_mapping(self, table):
        t2 = Table.load(str(table.root))
        assert t2.column_mapping == table.column_mapping
        got = _collect(t2.scan(columns=["doc_id", "token_ids"]))
        assert got.column_names == ["doc_id", "token_ids"]

    def test_identity_columns_rejected(self, table):
        with pytest.raises(ValueError, match="key column"):
            table.rename_column("doc_id", "id")
        with pytest.raises(ValueError, match="partition"):
            table.rename_column("source", "origin")
        with pytest.raises(ValueError, match="already exists"):
            table.rename_column("length", "source")


class TestDrop:
    def test_drop_then_readd_never_resurfaces_stale_bytes(
        self, tmp_path_factory
    ):
        t = _fresh(tmp_path_factory, "colmap_drop")
        t.drop_column("n_tok")
        got = _collect(t.scan())
        assert got.column_names == ["doc_id", "tokens", "source"]
        # re-add the same logical name: must be all-null (fresh physical
        # name), NOT the old files' stale n_tok bytes
        t.evolve_schema([pa.field("n_tok", pa.int64())])
        assert t.column_mapping["n_tok"].startswith("n_tok__p")
        got = _collect(t.scan())
        assert got["n_tok"].null_count == got.num_rows
        # a compact rewrite sheds the retired physical column
        import pyarrow.parquet as pq

        t.compact(target_file_bytes=1 << 20)
        f = t.files()[0]
        phys = pq.read_schema(t.root / f.path)
        assert t.column_mapping["n_tok"] in phys.names
        exp = _expected()
        got = _collect(t.scan())
        assert got["tokens"].equals(exp["tokens"].cast(got["tokens"].type))

    def test_drop_identity_rejected(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "colmap_drop_guard")
        with pytest.raises(ValueError, match="key column"):
            t.drop_column("doc_id")
        with pytest.raises(ValueError, match="partition"):
            t.drop_column("source")


def test_rename_then_zorder_with_logical_dims(tmp_path_factory):
    t = _fresh(tmp_path_factory, "colmap_zorder")
    t.rename_column("tokens", "token_ids")
    t.zorder(target_file_bytes=1 << 20)
    got = _collect(t.scan())
    exp = _expected()
    assert got["token_ids"].equals(exp["tokens"].cast(got["token_ids"].type))


class TestMappingInteractions:
    """Column mapping composed with the rest of the table surface: DV
    merge-on-read deletes, the change data feed, UPDATE set-rules, and
    clone-based replication all run over PHYSICAL files while users speak
    logical names — each interaction has a translation seam worth pinning."""

    def test_rename_then_mor_delete_and_update(self, tmp_path_factory):
        import pyarrow.compute as pc

        t = _fresh(tmp_path_factory, "colmap_mor")
        t.rename_column("n_tok", "length")
        dead = ["doc-000000000000", "doc-000000000007"]
        t.delete(keys=dead, mode="mor")  # DV sidecar, no rewrite
        got = _collect(t.scan())
        assert got.num_rows == N_ROWS - 2
        assert not set(dead) & set(got["doc_id"].to_pylist())
        # UPDATE with a set-rule on the RENAMED column (rule columns are
        # translated to physical names for the rewrite actors)
        t.update(
            set_rules=[{"column": "length", "op": "set", "value": -1}],
            min_n_tok=0,
        )
        got = _collect(t.scan())
        assert pc.min(got["length"]).as_py() == -1
        assert pc.max(got["length"]).as_py() == -1
        assert got.num_rows == N_ROWS - 2  # tombstones survive the rewrite

    def test_rename_then_change_feed_logical_names(self, tmp_path_factory):
        import ray

        t = _fresh(tmp_path_factory, "colmap_cdf")
        t.rename_column("n_tok", "length")
        v_pre = t.version()
        src = pa.table(
            {
                "doc_id": ["doc-000000000003"],
                "tokens": pa.array([[7, 7]], pa.list_(pa.int32())),
                "length": pa.array([2], pa.int32()),
                "source": ["web"],
            }
        ).rename_columns(["doc_id", "token_ids", "length", "source"])
        # merge source speaks LOGICAL names -- rename tokens too, to make
        # the seam unmistakable
        t.rename_column("tokens", "token_ids")
        t.merge(src)
        ch = t.changes(v_pre)
        blocks = [b for b in ray.get(ch.to_arrow_refs()) if b.num_rows]
        got = pa.concat_tables(blocks)
        assert {"token_ids", "length", "_change_type"} <= set(got.column_names)
        kinds = dict(
            zip(got["doc_id"].to_pylist(), got["_change_type"].to_pylist())
        )
        assert "doc-000000000003" in kinds
        post = got.filter(
            pa.compute.equal(got["_change_type"], "update_postimage")
        )
        assert post["token_ids"].to_pylist() == [[7, 7]]

    def test_rename_then_clone_replicates_mapping(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "colmap_clone")
        t.rename_column("tokens", "token_ids")
        target = str(tmp_path_factory.mktemp("colmap_clone_dst") / "tokens")
        replica = t.clone(target)
        assert replica.column_mapping == t.column_mapping
        got = _collect(replica.scan())
        exp = _expected()
        assert got["token_ids"].equals(exp["tokens"].cast(got["token_ids"].type))


def test_zorder_default_dims_follow_rename(tmp_path_factory):
    """The stock zorder dims name the canonical physical columns; after a
    rename the default must resolve to the current logical names instead
    of KeyErroring."""
    t = _fresh(tmp_path_factory, "colmap_zorder_dims")
    t.rename_column("n_tok", "length")
    v = t.zorder(target_file_bytes=1 << 20)  # default dims include n_tok
    assert v is not None
    got = _collect(t.scan())
    exp = _expected()
    assert got["tokens"].equals(exp["tokens"].cast(got["tokens"].type))
    assert all(f.clustered for f in t.files())


def test_stale_prerename_names_rejected(tmp_path_factory):
    """Writing with a renamed-away (physical) column name must fail loudly
    instead of silently dropping the column and null-filling the logical
    one (the exact silent-data-loss the model-based test tripped on)."""
    t = _fresh(tmp_path_factory, "colmap_stale")
    t.rename_column("n_tok", "length")
    bad = pa.table(
        {
            "doc_id": ["zz-1"],
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([1], pa.int32()),  # stale pre-rename name
            "source": ["web"],
        }
    )
    with pytest.raises(ValueError, match="pre-rename"):
        t.append(bad)
    with pytest.raises(ValueError, match="pre-rename"):
        t.merge(bad)
