"""Merge-on-read DELETE via deletion vectors: tombstoned keys disappear
from scans without rewriting data files; every rewrite op (compact /
zorder / merge / materialize_deletes) folds pending DVs in and clears
them; token-array equality holds throughout (BASELINE.md invariant)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    expected_tokens_table,
    gen_updates_chunk,
)
from tests.util import assert_tokens_equal, collect_sorted

N_ROWS = 2_000
ROWS_PER_FILE = 100
TARGET = 2 * 1024 * 1024


def _fresh(tmp_path_factory, name) -> Table:
    root = tmp_path_factory.mktemp(name) / "tokens"
    return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)


def _expected_minus(keys: set[str]) -> pa.Table:
    exp = expected_tokens_table(N_ROWS, ROWS_PER_FILE)
    mask = pc.invert(pc.is_in(exp["doc_id"], value_set=pa.array(sorted(keys))))
    return exp.filter(mask).sort_by("doc_id").combine_chunks()


def _keys(ids) -> list[str]:
    return [f"doc-{i:012d}" for i in ids]


class TestMorDelete:
    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        return _fresh(tmp_path_factory, "mor")

    def test_tombstones_hide_rows_without_rewriting_data(self, table):
        files_before = {f.path for f in table.files()}
        dead = _keys([3, 77, 1500])
        v = table.delete(keys=dead, mode="mor")
        assert v == 2
        # no data file added or removed — only DV sidecars + manifest
        assert {f.path for f in table.files()} == files_before
        dv_files = [f for f in table.files() if f.dv]
        assert dv_files and all(f.dv.startswith("_dv/") for f in dv_files)
        assert sum(f.dv_rows for f in dv_files) == 3
        assert_tokens_equal(collect_sorted(table.scan()), _expected_minus(set(dead)))
        st = table.stats()
        assert st["dv_rows"] == 3 and st["visible_rows"] == N_ROWS - 3

    def test_time_travel_sees_pre_delete_rows(self, table):
        full = expected_tokens_table(N_ROWS, ROWS_PER_FILE).sort_by("doc_id").combine_chunks()
        assert_tokens_equal(collect_sorted(table.scan(version=1)), full)

    def test_second_delete_unions_dvs(self, table):
        v = table.delete(keys=_keys([4, 77]), mode="mor")  # 77 already dead
        assert v == 3
        assert table.stats()["dv_rows"] == 4
        assert_tokens_equal(
            collect_sorted(table.scan()), _expected_minus(set(_keys([3, 4, 77, 1500])))
        )

    def test_rerun_same_job_is_idempotent(self, table):
        # same job id (the crash-resume contract) returns the committed
        # version instead of re-tombstoning
        v = table.version()
        job = table.log.read_version(v)["job_id"]
        assert table.delete(keys=_keys([4, 77]), mode="mor", job_id=job) == v

    def test_scan_with_projection_still_filters(self, table):
        got = collect_sorted(table.scan(columns=["doc_id", "n_tok"]))
        assert got.num_rows == N_ROWS - 4
        assert got.column_names == ["doc_id", "n_tok"]

    def test_append_of_tombstoned_key_is_rejected(self, table):
        bad = gen_updates_chunk(N_ROWS, 0, 1)  # fresh insert ids
        bad = bad.set_column(
            0, "doc_id", pa.array(["doc-000000000077"] * bad.num_rows)
        )
        with pytest.raises(Exception, match="tombstoned"):
            table.append(bad)
        # fresh keys still append fine, guard stays out of the way
        ok = gen_updates_chunk(N_ROWS, 0, 2)
        v = table.append(ok)
        assert v == table.version()

    def test_mode_validation(self, table):
        with pytest.raises(ValueError):
            table.delete(keys=_keys([1]), min_n_tok=10, mode="mor")
        with pytest.raises(ValueError):
            table.delete(keys=_keys([1]), mode="bogus")


class TestDvMaterialization:
    """Every rewrite path folds DVs in and clears them."""

    def _tombstoned(self, tmp_path_factory, name):
        t = _fresh(tmp_path_factory, name)
        dead = _keys([10, 11, 900])
        t.delete(keys=dead, mode="mor")
        return t, set(dead)

    def test_compact_materializes_dvs(self, tmp_path_factory):
        t, dead = self._tombstoned(tmp_path_factory, "mor-compact")
        t.compact(target_file_bytes=TARGET)
        assert all(f.dv is None for f in t.files())
        assert t.stats()["dv_rows"] == 0
        assert_tokens_equal(collect_sorted(t.scan()), _expected_minus(dead))

    def test_zorder_materializes_dvs(self, tmp_path_factory):
        t, dead = self._tombstoned(tmp_path_factory, "mor-zorder")
        t.zorder(target_file_bytes=TARGET)
        assert all(f.dv is None for f in t.files())
        assert_tokens_equal(collect_sorted(t.scan()), _expected_minus(dead))

    def test_materialize_deletes_touches_only_dv_files(self, tmp_path_factory):
        t, dead = self._tombstoned(tmp_path_factory, "mor-reorg")
        clean_before = {f.path for f in t.files() if not f.dv}
        v = t.materialize_deletes()
        assert v == t.version()
        assert all(f.dv is None for f in t.files())
        # clean files were not rewritten
        assert clean_before <= {f.path for f in t.files()}
        assert_tokens_equal(collect_sorted(t.scan()), _expected_minus(dead))
        # second run: nothing to do
        assert t.materialize_deletes() is None

    def test_merge_reintroduces_tombstoned_key(self, tmp_path_factory):
        t, dead = self._tombstoned(tmp_path_factory, "mor-merge")
        # upsert one tombstoned key with fresh tokens via MERGE
        src = gen_updates_chunk(N_ROWS, 0, 1)
        new_tokens = pa.array([list(range(7))], pa.list_(pa.int32()))
        src = pa.table(
            {
                "doc_id": pa.array(["doc-000000000010"]),
                "tokens": new_tokens,
                "n_tok": pa.array([7], pa.int32()),
                "source": src["source"][:1],
            }
        )
        t.merge(src, strategy="broadcast")
        got = collect_sorted(t.scan())
        ids = got["doc_id"].to_pylist()
        assert ids.count("doc-000000000010") == 1  # visible again, once
        row = got.filter(pc.equal(got["doc_id"], "doc-000000000010"))
        assert row["tokens"].to_pylist()[0] == list(range(7))
        # the other tombstoned keys stay hidden
        assert "doc-000000000011" not in ids and "doc-000000000900" not in ids

    def test_vacuum_reclaims_superseded_dvs(self, tmp_path_factory):
        t, dead = self._tombstoned(tmp_path_factory, "mor-vacuum")
        t.materialize_deletes()
        # expire the tombstoned snapshots so their DVs become garbage
        t.expire_snapshots(keep_last=1)
        removed = t.vacuum(min_age_seconds=0.0)
        assert any(p.startswith("_dv/") for p in removed)
        assert_tokens_equal(collect_sorted(t.scan()), _expected_minus(dead))


class TestIncrementalZorder:
    """Liquid-clustering direction: re-clustering after an append sorts
    only the new (unclustered) files."""

    def test_incremental_clusters_only_new_files(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "inc-zorder")
        t.zorder(target_file_bytes=TARGET)
        sig = "z:source,n_tok,doc_id"
        assert all(f.clustered == sig for f in t.files())
        # nothing new -> no-op
        assert t.zorder(target_file_bytes=TARGET, incremental=True) is None
        clustered_before = {f.path for f in t.files()}
        extra = gen_updates_chunk(N_ROWS, 0, 300)
        t.append(extra)
        v = t.zorder(target_file_bytes=TARGET, incremental=True)
        assert v == t.version()
        after = t.files()
        # the originally-clustered files were NOT rewritten
        assert clustered_before <= {f.path for f in after}
        assert all(f.clustered == sig for f in after)
        exp = pa.concat_tables(
            [expected_tokens_table(N_ROWS, ROWS_PER_FILE), extra]
        ).sort_by("doc_id").combine_chunks()
        assert_tokens_equal(collect_sorted(t.scan()), exp)

    def test_signature_change_reclusters_everything(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "inc-zorder-sig")
        t.zorder(target_file_bytes=TARGET)
        v = t.zorder(target_file_bytes=TARGET, curve="hilbert", incremental=True)
        assert v == t.version()
        assert all(f.clustered == "hilbert:source,n_tok,doc_id" for f in t.files())

    def test_incremental_folds_pending_dvs_of_new_files(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "inc-zorder-dv")
        t.zorder(target_file_bytes=TARGET)
        extra = gen_updates_chunk(N_ROWS, 0, 200)
        t.append(extra)
        dead_key = extra["doc_id"][0].as_py()
        t.delete(keys=[dead_key], mode="mor")
        t.zorder(target_file_bytes=TARGET, incremental=True)
        # the new files' DV was materialized by the incremental pass
        assert all(f.dv is None for f in t.files())
        got = collect_sorted(t.scan())
        assert dead_key not in got["doc_id"].to_pylist()
