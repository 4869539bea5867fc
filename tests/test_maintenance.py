"""Maintenance ops: compaction (+resume), Z-order, MERGE INTO, snapshot
expire / vacuum, snapshot isolation — golden token-array equality throughout
(BASELINE.md correctness target)."""

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table, _dedup_keep_latest
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    expected_tokens_table,
    gen_updates_chunk,
)
from realtime_clickstream_lakehouse_ray.stages.rewrite import BinRewriter
from realtime_clickstream_lakehouse_ray.state.checkpoint import JobCheckpoint
from tests.util import assert_tokens_equal, collect_sorted

N_ROWS = 3_000
ROWS_PER_FILE = 150
TARGET = 2 * 1024 * 1024


def _fresh(tmp_path_factory, name) -> Table:
    root = tmp_path_factory.mktemp(name) / "tokens"
    return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)


def _expected() -> pa.Table:
    return expected_tokens_table(N_ROWS, ROWS_PER_FILE).sort_by("doc_id").combine_chunks()


# ---- compaction ---------------------------------------------------------


class TestCompact:
    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        return _fresh(tmp_path_factory, "compact")

    def test_compact_reduces_files_preserves_tokens(self, table):
        files_before = table.stats()["files"]
        v = table.compact(target_file_bytes=TARGET)
        assert v == 2
        assert table.stats()["files"] < files_before
        assert_tokens_equal(collect_sorted(table.scan()), _expected())

    def test_lineage_recorded_per_partition(self, table):
        payload = table.log.read_version(2)
        lineage = payload["lineage"]
        assert lineage  # one record per partition with bins
        for part, rec in lineage.items():
            assert rec["input_files"] >= 2 * rec["units"]
            assert rec["rows"] > 0

    def test_rerun_same_job_is_noop(self, table):
        v = table.log.find_commit_by_job("compact-v1")
        assert v == 2
        assert table.compact(job_id="compact-v1") == 2  # idempotent

    def test_checkpoint_marked_committed(self, table):
        assert JobCheckpoint(table.root, "compact-v1").committed_version() == 2


class TestCompactResume:
    def test_partial_units_are_reused(self, tmp_path_factory):
        table = _fresh(tmp_path_factory, "resume")
        job_id = f"compact-v{table.version()}"
        bins = table.plan_compaction_bins(table.files(), TARGET, job_id)
        assert len(bins) >= 2
        # simulate a crashed job that finished exactly one unit
        rw = BinRewriter(str(table.root), table.schema, job_id, mode="compact")
        rw._process_unit(bins[0])
        ckpt = JobCheckpoint(table.root, job_id)
        rec_before = ckpt.read_unit(bins[0]["unit"])
        out_path = table.root / bins[0]["out"]
        mtime_before = out_path.stat().st_mtime_ns
        # resumed run: finished unit must be skipped, not rewritten
        v = table.compact(target_file_bytes=TARGET, job_id=job_id)
        assert v == 2
        assert out_path.stat().st_mtime_ns == mtime_before
        assert ckpt.read_unit(bins[0]["unit"]) == rec_before
        assert_tokens_equal(
            collect_sorted(table.scan()),
            expected_tokens_table(N_ROWS, ROWS_PER_FILE).sort_by("doc_id").combine_chunks(),
        )

    def test_torn_unit_record_is_redone(self, tmp_path_factory):
        table = _fresh(tmp_path_factory, "torn")
        job_id = f"compact-v{table.version()}"
        bins = table.plan_compaction_bins(table.files(), TARGET, job_id)
        ckpt = JobCheckpoint(table.root, job_id)
        ckpt.dir.mkdir(parents=True, exist_ok=True)
        ckpt.unit_path(bins[0]["unit"]).write_text('{"truncated')  # torn write
        v = table.compact(target_file_bytes=TARGET, job_id=job_id)
        assert v == 2
        assert_tokens_equal(
            collect_sorted(table.scan()),
            expected_tokens_table(N_ROWS, ROWS_PER_FILE).sort_by("doc_id").combine_chunks(),
        )


# ---- z-order ------------------------------------------------------------


class TestZorder:
    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        return _fresh(tmp_path_factory, "zorder")

    def test_zorder_preserves_tokens(self, table):
        pre_files = table.files()
        v = table.zorder(target_file_bytes=1 << 20)
        assert v == 2
        assert_tokens_equal(collect_sorted(table.scan()), _expected())
        assert {f.path for f in table.files()}.isdisjoint({f.path for f in pre_files})

    def test_zorder_tightens_file_stats(self, table):
        # clustering on (source, n_tok, doc_id) must shrink per-file n_tok
        # spans vs an unclustered layout at the SAME file size (that's what
        # makes stats pruning effective at scale)
        files2 = table.files(2)
        w = np.array([f.rows for f in files2], dtype=float)
        s = np.array([f.max_n_tok - f.min_n_tok for f in files2], dtype=float)
        zspan = float((w * s).sum() / w.sum())
        # baseline: contiguous 500-row chunks in doc_id order (random wrt n_tok)
        ntok = np.asarray(_expected().column("n_tok"))
        chunks = [ntok[i : i + 500] for i in range(0, len(ntok), 500)]
        base = float(
            np.average(
                [c.max() - c.min() for c in chunks], weights=[len(c) for c in chunks]
            )
        )
        assert zspan < 0.8 * base

    def test_zorder_lineage_per_partition(self, table):
        ckpt = JobCheckpoint(table.root, "zorder-v1")
        units = ckpt.list_units()
        parts = {r["partition"] for r in units.values()}
        assert parts == set(table.stats()["partitions"])
        assert ckpt.committed_version() == 2

    def test_zorder_rerun_is_noop(self, table):
        assert table.zorder(job_id="zorder-v1") == 2


# ---- MERGE INTO ---------------------------------------------------------


class TestMerge:
    @pytest.fixture(scope="class")
    def updates(self):
        return gen_updates_chunk(N_ROWS, n_updates=150, n_inserts=60)

    def _expected_after_merge(self, updates: pa.Table) -> pa.Table:
        base = expected_tokens_table(N_ROWS, ROWS_PER_FILE)
        upd = _dedup_keep_latest(updates, "doc_id")
        upd_keys = set(upd.column("doc_id").to_pylist())
        keep = base.filter(
            pc.invert(pc.is_in(base.column("doc_id"), value_set=pa.array(list(upd_keys))))
        )
        return pa.concat_tables([keep, upd]).sort_by("doc_id").combine_chunks()

    def test_broadcast_merge(self, tmp_path_factory, updates):
        table = _fresh(tmp_path_factory, "merge_bc")
        v = table.merge(updates, strategy="broadcast")
        assert v == 2
        got = collect_sorted(table.scan())
        assert_tokens_equal(got, self._expected_after_merge(updates))

    def test_keep_latest_dedup(self, tmp_path_factory, updates):
        # the generator duplicates the first update key with different
        # tokens; the LAST occurrence must win
        table = _fresh(tmp_path_factory, "merge_dup")
        table.merge(updates, strategy="broadcast")
        dup_key = updates.column("doc_id")[0].as_py()
        got = collect_sorted(table.scan())
        idx = got.column("doc_id").index(dup_key).as_py()
        last_tokens = updates.column("tokens")[-1]
        assert got.column("tokens")[idx] == last_tokens

    def test_shuffle_merge_matches_broadcast(self, tmp_path_factory, updates):
        table = _fresh(tmp_path_factory, "merge_sh")
        v = table.merge(updates, strategy="shuffle")
        assert v == 2
        got = collect_sorted(table.scan())
        assert_tokens_equal(got, self._expected_after_merge(updates))

    def test_merge_rerun_is_noop(self, tmp_path_factory, updates):
        table = _fresh(tmp_path_factory, "merge_rerun")
        v = table.merge(updates, strategy="broadcast", job_id="m1")
        assert table.merge(updates, strategy="broadcast", job_id="m1") == v

    def test_sequence_by_suppresses_stale(self, tmp_path_factory):
        """SEQUENCE BY (out-of-order CDC guard): a stale source row (lower
        sequence) must neither overwrite the newer target row nor insert;
        ties keep the target; duplicate source keys resolve to the highest
        sequence; genuinely-new keys insert."""
        table = _fresh(tmp_path_factory, "merge_seq")
        base = expected_tokens_table(N_ROWS, ROWS_PER_FILE)
        rows = base.slice(0, 3).to_pydict()

        def mk(doc_id, seq, src):
            return pa.table(
                {
                    "doc_id": pa.array([doc_id]),
                    "tokens": pa.array([[1, 2, 3]], pa.list_(pa.int32())),
                    "n_tok": pa.array([seq], pa.int32()),
                    "source": pa.array([src]),
                }
            )

        k_stale, k_tie, k_fresh = rows["doc_id"][:3]
        src = pa.concat_tables(
            [
                mk(k_stale, rows["n_tok"][0] - 1, rows["source"][0]),
                mk(k_tie, rows["n_tok"][1], rows["source"][1]),
                mk(k_fresh, rows["n_tok"][2] + 1, rows["source"][2]),
                mk(k_fresh, rows["n_tok"][2] + 5, rows["source"][2]),
                mk("doc-999999999999", 3, rows["source"][0]),
            ]
        )
        table.merge(src, strategy="broadcast", sequence_col="n_tok")
        got = collect_sorted(table.scan())
        d = {got["doc_id"][i].as_py(): i for i in range(got.num_rows)}
        for k, j in ((k_stale, 0), (k_tie, 1)):  # suppressed: unchanged
            i = d[k]
            assert got["n_tok"][i].as_py() == rows["n_tok"][j]
            assert got["tokens"][i].as_py() != [1, 2, 3]
        i = d[k_fresh]  # replaced by the HIGHEST-sequence source duplicate
        assert got["n_tok"][i].as_py() == rows["n_tok"][2] + 5
        assert got["tokens"][i].as_py() == [1, 2, 3]
        assert "doc-999999999999" in d  # new key inserted
        assert got.num_rows == base.num_rows + 1

    def test_sequence_by_crash_resume(self, tmp_path_factory, monkeypatch):
        """The suppressed-key feedback must survive a crash between the
        rewrites and the commit: the resumed job reuses the checkpointed
        unit records (suppressed lists included) and converges to the same
        table as a clean run."""
        table = _fresh(tmp_path_factory, "merge_seq_crash")
        base = expected_tokens_table(N_ROWS, ROWS_PER_FILE)
        rows = base.slice(0, 2).to_pydict()
        src = pa.table(
            {
                "doc_id": pa.array([rows["doc_id"][0], rows["doc_id"][1]]),
                "tokens": pa.array([[1], [1, 2]], pa.list_(pa.int32())),
                "n_tok": pa.array(
                    [rows["n_tok"][0] - 1, rows["n_tok"][1] + 1], pa.int32()
                ),
                "source": pa.array(rows["source"][:2]),
            }
        )

        def boom(self, *a, **k):
            raise RuntimeError("injected crash before commit")

        monkeypatch.setattr(Table, "_commit_with_rebase", boom)
        with pytest.raises(RuntimeError, match="injected crash"):
            table.merge(src, strategy="broadcast", sequence_col="n_tok", job_id="ms1")
        monkeypatch.undo()
        fresh = Table.load(str(table.root))
        fresh.merge(src, strategy="broadcast", sequence_col="n_tok", job_id="ms1")
        got = collect_sorted(fresh.scan())
        d = {got["doc_id"][i].as_py(): i for i in range(got.num_rows)}
        assert got["n_tok"][d[rows["doc_id"][0]]].as_py() == rows["n_tok"][0]  # stale
        assert got["n_tok"][d[rows["doc_id"][1]]].as_py() == rows["n_tok"][1] + 1
        assert got.num_rows == base.num_rows  # no spurious inserts

    def test_sequence_by_rejects_shuffle(self, tmp_path_factory, updates):
        table = _fresh(tmp_path_factory, "merge_seq_sh")
        with pytest.raises(ValueError, match="sequence_col"):
            table.merge(updates, strategy="shuffle", sequence_col="n_tok")

    def test_distributed_src_append_matches(self, tmp_path_factory, updates):
        # force MANY overlapped source-append slice tasks (tiny target file
        # size -> one slice per ~4 KB) and check the post-merge table is
        # identical to the single-slice path's
        table = _fresh(tmp_path_factory, "merge_dist_src")
        v = table.merge(updates, strategy="broadcast", target_file_bytes=1 << 12)
        assert v == 2
        # the source really was split across many slice-task files
        commit = table.log.read_version(v)
        src_files = [
            a["path"] for a in commit["actions"]
            if a["op"] == "add" and "-src-u" in a["path"]
        ]
        assert len(src_files) > 4
        assert len({p.rsplit("/", 1)[-1] for p in src_files}) == len(src_files)
        got = collect_sorted(table.scan())
        assert_tokens_equal(got, self._expected_after_merge(updates))


class TestClusteringPreservingCompact:
    def test_compact_after_zorder_keeps_signature(self, tmp_path_factory):
        """OPTIMIZE after Z-order must not silently degrade the layout:
        same-signature files re-key + zkey-sort inside their bins, outputs
        keep the clustering signature, incremental re-clustering stays a
        no-op, and tokens are untouched."""
        t = _fresh(tmp_path_factory, "compact_keep_cluster")
        t.zorder(target_file_bytes=64 << 10)  # many small clustered files
        sig = "z:source,n_tok,doc_id"
        assert all(f.clustered == sig for f in t.files())
        n_before = t.stats()["files"]
        v = t.compact(target_file_bytes=TARGET)
        assert v is not None
        after = t.files()
        assert len(after) < n_before
        assert all(f.clustered == sig for f in after)
        assert t.zorder(target_file_bytes=TARGET, incremental=True) is None
        assert_tokens_equal(collect_sorted(t.scan()), _expected())

    def test_bins_never_mix_clustered_and_unclustered(self, tmp_path_factory):
        """After an append on a clustered table, compaction packs the new
        (unclustered) files separately from the clustered ones — the
        clustered outputs keep the signature, the fresh ones don't claim
        one they never had."""
        from realtime_clickstream_lakehouse_ray.sources.synth import gen_tokens_chunk

        t = _fresh(tmp_path_factory, "compact_mixed_cluster")
        t.zorder(target_file_bytes=64 << 10)
        extra = gen_tokens_chunk(9_000, N_ROWS, 150, seed=3)
        t.append(extra, rows_per_file=100)  # small unclustered files
        t.compact(target_file_bytes=TARGET)
        sigs = {f.clustered for f in t.files()}
        assert "z:source,n_tok,doc_id" in sigs  # preserved side
        assert None in sigs or len(sigs) == 1  # fresh side never forged
        got = collect_sorted(t.scan())
        assert got.num_rows == N_ROWS + extra.num_rows


class TestAutoOptimize:
    def test_triggers_then_converges(self, tmp_path_factory):
        """auto_optimize compacts partitions that crossed the small-file
        threshold, preserves tokens, and reports None once nothing
        qualifies (the call-after-every-append loop converges)."""
        t = _fresh(tmp_path_factory, "auto_opt")
        v = t.auto_optimize(
            small_file_bytes=1 << 20, min_small_files=4, target_file_bytes=TARGET
        )
        assert v is not None
        assert (
            t.auto_optimize(small_file_bytes=1 << 20, min_small_files=4) is None
        )
        assert_tokens_equal(collect_sorted(t.scan()), _expected())

    def test_threshold_respected(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "auto_opt_thr")
        # absurd threshold: no partition has 10_000 small files -> no-op
        assert t.auto_optimize(min_small_files=10_000) is None

    def test_clustering_report_improves_after_zorder(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "clus_report")
        before = {r["partition"]: r for r in t.clustering_report().to_pylist()}
        assert all(r["n_clustered"] == 0 for r in before.values())
        t.zorder(target_file_bytes=1 << 20)
        after = {r["partition"]: r for r in t.clustering_report().to_pylist()}
        for p, r in after.items():
            assert r["n_clustered"] == r["n_files"]  # signature recorded
        # random writes overlap heavily; zorder tightens per-file ranges
        assert sum(r["avg_files_per_point"] for r in after.values()) < sum(
            r["avg_files_per_point"] for r in before.values()
        )


# ---- expire / vacuum / isolation ---------------------------------------


class TestRetention:
    def test_expire_and_vacuum(self, tmp_path_factory):
        table = _fresh(tmp_path_factory, "retention")
        table.compact(target_file_bytes=TARGET)  # v2
        table.zorder(target_file_bytes=1 << 20)  # v3
        n_disk_before = len(list(table.root.glob("source=*/*.parquet")))
        expired = table.expire_snapshots(keep_last=2)
        assert expired == [1]
        with pytest.raises(FileNotFoundError):
            table.scan(version=1)
        removed = table.vacuum(min_age_seconds=0.0)
        assert removed  # v1's small files are gone
        n_disk_after = len(list(table.root.glob("source=*/*.parquet")))
        assert n_disk_after == n_disk_before - len(removed)
        # retained versions still fully readable + correct
        assert_tokens_equal(collect_sorted(table.scan(version=2)), _expected())
        assert_tokens_equal(collect_sorted(table.scan()), _expected())
        # on-disk file set now == union of retained snapshots
        referenced = {f.path for v in table.log.versions() for f in table.files(v)}
        on_disk = {str(p.relative_to(table.root)) for p in table.root.glob("source=*/*.parquet")}
        assert on_disk == referenced

    def test_vacuum_default_age_guard_spares_young_files(self, tmp_path_factory):
        """Default vacuum must NOT delete just-written unreferenced files
        (an in-flight job's about-to-commit output looks exactly like
        this); only an explicit min_age_seconds=0.0 reclaims them."""
        table = _fresh(tmp_path_factory, "vacuum_guard")
        table.compact(target_file_bytes=TARGET)
        table.expire_snapshots(keep_last=1)
        # the pre-compaction files are now unreferenced but seconds old
        assert table.vacuum() == []  # default 24h guard: nothing deleted
        candidates = table.vacuum(dry_run=True, min_age_seconds=0.0)
        assert candidates  # they ARE reclaimable once the guard is waived
        assert table.vacuum(min_age_seconds=0.0) == candidates
        assert_tokens_equal(collect_sorted(table.scan()), _expected())

    def test_snapshot_isolation_reader_unaffected_by_commit(self, tmp_path_factory):
        table = _fresh(tmp_path_factory, "isolation")
        ds_v1 = table.scan(version=1)  # reader pins version 1
        table.compact(target_file_bytes=TARGET)  # concurrent commit v2
        table.merge(gen_updates_chunk(N_ROWS, 50, 20))  # v3 rewrites rows
        got = collect_sorted(ds_v1)  # consume AFTER the commits
        assert_tokens_equal(got, _expected())

    def test_dedup_keep_latest_unit(self):
        t = pa.table({"doc_id": ["a", "b", "a"], "v": [1, 2, 3]})
        out = _dedup_keep_latest(t, "doc_id")
        assert out.column("doc_id").to_pylist() == ["b", "a"] or out.column(
            "doc_id"
        ).to_pylist() == ["a", "b"]
        m = dict(zip(out.column("doc_id").to_pylist(), out.column("v").to_pylist()))
        assert m == {"a": 3, "b": 2}


class TestDelete:
    """Predicate DELETE (Delta `DELETE FROM` parity): metadata-only whole-
    file drops, stats/bloom-pruned rewrites, idempotent reruns."""

    @pytest.fixture()
    def table(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("del") / "tokens")
        t = build_synthetic_table(root, 20_000, rows_per_file=1_000)
        t.compact(target_file_bytes=1 << 20)
        return t

    def test_delete_whole_partition_is_metadata_only(self, table):
        part = table.files()[0].partition
        rows_before = table.stats()["rows"]
        part_rows = table.stats()["partitions"][part]["rows"]
        v = table.delete(partitions=[part])
        commit = table.log.read_version(v)
        assert commit["metadata_only_deletes"], "expected whole-file drops"
        assert not any(a["op"] == "add" for a in commit["actions"])  # no rewrite
        assert table.stats()["rows"] == rows_before - part_rows
        assert part not in table.stats()["partitions"]

    def test_delete_ntok_range_rewrites_partially(self, table):
        from realtime_clickstream_lakehouse_ray.util import to_arrow_table

        rows_before = table.stats()["rows"]
        scan = to_arrow_table(table.scan(columns=["n_tok"]))
        n_match = sum(1 for v in scan["n_tok"].to_pylist() if v >= 2000)
        assert 0 < n_match < rows_before
        v = table.delete(min_n_tok=2000)
        assert v is not None
        out = to_arrow_table(table.scan(columns=["n_tok"]))
        assert out.num_rows == rows_before - n_match
        assert all(x < 2000 for x in out["n_tok"].to_pylist())

    def test_delete_keys_bloom_pruned(self, table):
        from realtime_clickstream_lakehouse_ray.util import to_arrow_table

        table.zorder(target_file_bytes=1 << 20)
        sample = to_arrow_table(table.scan(columns=["doc_id"]))["doc_id"].to_pylist()[:4]
        n_files = len(table.files())
        v = table.delete(keys=sample)
        commit = table.log.read_version(v)
        removed = sum(1 for a in commit["actions"] if a["op"] == "remove")
        assert removed <= max(4, n_files // 4), (removed, n_files)
        out = to_arrow_table(table.scan(columns=["doc_id"]))
        left = set(out["doc_id"].to_pylist())
        assert not (left & set(sample))

    def test_delete_rerun_same_predicate_is_noop(self, table):
        part = table.files()[0].partition
        v1 = table.delete(partitions=[part])
        v2 = table.delete(partitions=[part], job_id=f"delete-rerun-{v1}")
        # nothing left to delete for the same predicate -> None
        assert v2 is None
        # and replaying the SAME job id returns the committed version
        job = table.log.read_version(v1)["job_id"]
        assert table.delete(partitions=[part], job_id=job) == v1

    def test_delete_nothing_matches(self, table):
        assert table.delete(min_n_tok=10**9) is None

    def test_delete_bare_string_keys_rejected(self, table):
        # delete("k1") / delete(partitions="web") are misuses that would
        # otherwise fail deep inside np.sort with an AxisError
        with pytest.raises(TypeError, match="sequences of strings"):
            table.delete(keys="doc-000000000001")
        with pytest.raises(TypeError, match="sequences of strings"):
            table.delete(partitions="web", min_n_tok=1)


class TestRestore:
    """RESTORE (Delta parity): roll back to an old snapshot as a new
    commit, manifest-only, history preserved."""

    def test_restore_round_trip(self, tmp_path_factory):
        from realtime_clickstream_lakehouse_ray.util import to_arrow_table

        root = str(tmp_path_factory.mktemp("restore") / "tokens")
        t = build_synthetic_table(root, 5_000, rows_per_file=500)
        v0 = t.version()
        before = to_arrow_table(t.scan()).sort_by("doc_id")
        part = t.files()[0].partition
        t.delete(partitions=[part])
        assert t.stats()["rows"] < before.num_rows
        v_restore = t.restore(v0)
        assert v_restore == t.version()
        after = to_arrow_table(t.scan()).sort_by("doc_id")
        assert after.equals(before)  # bit-exact token arrays included
        # history preserved: the deleted state is still time-travelable
        assert t.log.read_version(v_restore)["restored_version"] == v0

    def test_restore_vacuumed_version_fails(self, tmp_path_factory):
        root = str(tmp_path_factory.mktemp("restore2") / "tokens")
        t = build_synthetic_table(root, 2_000, rows_per_file=500)
        v0 = t.version()
        t.compact(target_file_bytes=1 << 20)
        t.expire_snapshots(keep_last=1)
        t.vacuum(min_age_seconds=0.0)
        with pytest.raises(FileNotFoundError):
            t.restore(v0)


class TestTimestampTimeTravel:
    """Delta ``timestampAsOf`` parity: commits carry wall-clock (or
    driver-supplied) timestamps; ``scan(as_of=ts)`` resolves the latest
    commit at or before ts (reference README.md:176)."""

    def test_version_at_resolution(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ttts") / "tokens"
        t = Table.create(str(root))
        # deterministic driver-supplied timestamps
        t.log.commit([], "a", timestamp=100.0)
        t.log.commit([], "b", timestamp=200.0)
        t.log.commit([], "c", timestamp=300.0)
        assert t.log.version_at(100.0) == 1
        assert t.log.version_at(250.0) == 2
        assert t.log.version_at(1e12) == 3  # after last -> latest
        with pytest.raises(FileNotFoundError):
            t.log.version_at(99.9)  # before table creation

    def test_scan_as_of_reproduces_old_snapshot(self, tmp_path_factory):
        import time

        root = tmp_path_factory.mktemp("ttts2") / "tokens"
        t = build_synthetic_table(str(root), 600, 100)
        ts_ingest = time.time()
        time.sleep(0.02)
        t.compact(target_file_bytes=TARGET)
        t.merge(gen_updates_chunk(600, n_updates=50, n_inserts=10, seed=9))
        expected = expected_tokens_table(600, 100).sort_by("doc_id").combine_chunks()
        got = collect_sorted(t.scan(as_of=ts_ingest))
        assert_tokens_equal(got, expected)
        # as_of and version are mutually exclusive
        with pytest.raises(ValueError):
            t.scan(version=1, as_of=ts_ingest)

    def test_timestamp_survives_consolidation(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("ttts3") / "tokens"
        t = Table.create(str(root))
        t.log.commit([], "a", timestamp=100.0)
        t.log.commit([], "b", timestamp=200.0)
        t.log.materialize_version(2)
        assert t.log.read_version(2)["timestamp"] == 200.0
        assert t.log.version_at(250.0) == 2


class TestMetrics:
    """Observability surface: per-op timing/throughput recorded on commit
    payloads, queryable via Table.metrics() (the engine-native form of the
    reference's CloudWatch job dashboards)."""

    def test_ops_record_metrics(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("metrics") / "tokens"
        t = build_synthetic_table(str(root), 600, 100)
        t.compact(target_file_bytes=TARGET)
        t.merge(gen_updates_chunk(600, n_updates=50, n_inserts=10, seed=5))
        m = t.metrics()
        by_op = {r["operation"]: r for r in m}
        assert {"append", "compact", "merge"} <= set(by_op)
        for op in ("compact", "merge"):
            r = by_op[op]
            assert r["duration_sec"] > 0
            assert r["rows_written"] > 0 and r["bytes_written"] > 0
            assert r["rows_per_sec"] > 0
            assert r["files_added"] >= 1
        # compact rewrites: it must remove what it packed, and the retired
        # bytes resolve from prior adds (write-amplification observable)
        assert by_op["compact"]["files_removed"] >= 2
        assert by_op["compact"]["bytes_removed"] > 0
        assert 0.1 < by_op["compact"]["write_amplification"] < 10
        # timestamps present and non-decreasing
        ts = [r["timestamp"] for r in m]
        assert all(a <= b for a, b in zip(ts, ts[1:]))

    def test_cli_surfaces_phase_timings(self, tmp_path_factory, capsys):
        """The maintain CLI must SHOW where a job spent its time: a
        [metrics] line per op on stderr with phase seconds (plan/scatter/
        gather for zorder), and the same rows in the status JSON."""
        import json as _json

        from realtime_clickstream_lakehouse_ray.maintain import main

        root = tmp_path_factory.mktemp("cli_metrics") / "tokens"
        build_synthetic_table(str(root), 600, 100)
        rc = main(
            ["--table", str(root), "--ops", "compact,zorder", "--target-file-mb", "1"]
        )
        assert rc == 0
        out, err = capsys.readouterr()
        status = _json.loads(out.strip().splitlines()[-1])
        ops = {r["operation"]: r for r in status["op_metrics"]}
        assert {"compact", "zorder"} <= set(ops)
        assert ops["zorder"]["duration_sec"] > 0
        assert {"plan", "scatter", "gather"} <= set(ops["zorder"]["phases"])
        assert "[metrics]" in err and "plan=" in err


class TestPrunedScan:
    def test_file_skipping_and_exact_band(self, ray_session):
        """The stats prune must skip a meaningful share of the clustered
        files, and the returned relation must equal a brute-force filter
        of the documents table."""
        import pyarrow.parquet as pq

        from realtime_clickstream_lakehouse_ray.pipelines import maintenance as M

        sf = "/root/testdata/sf0.001"
        got = M.maintenance_pruned_scan(sf)  # raises if nothing was skipped
        docs = pq.read_table(sf + "/documents.parquet", columns=["doc_id", "text", "source"])
        nt = np.array([len(s.split()) for s in docs["text"].to_pylist()], dtype=np.int64)
        keep = (nt >= 45) & (nt <= 63)
        ids = np.asarray(docs["doc_id"])[keep]
        exp_ids = sorted(f"doc-{i:012d}" for i in ids)
        assert got["doc_id"].to_pylist() == exp_ids
        got_nt = dict(zip(got["doc_id"].to_pylist(), np.asarray(got["n_tok"])))
        exp_nt = {f"doc-{i:012d}": int(v) for i, v in zip(ids, nt[keep])}
        assert got_nt == exp_nt


def test_clustering_report_degenerate_partitions(tmp_path_factory, monkeypatch):
    """Two edge cases from review: a partition whose files all share ONE
    n_tok value must report avg_files_per_point == n_files (not n/2), and a
    stat-less partition must emit a JSON-serializable null (not NaN, which
    json.dumps renders as a non-standard token)."""
    from realtime_clickstream_lakehouse_ray.state.log import FileEntry

    t = _fresh(tmp_path_factory, "clus_degenerate")
    entries = [
        FileEntry(path=f"single/{i}.parquet", partition="single", rows=10,
                  bytes=100, min_n_tok=7, max_n_tok=7)
        for i in range(4)
    ] + [
        FileEntry(path="nostats/0.parquet", partition="nostats", rows=10,
                  bytes=100, min_n_tok=None, max_n_tok=None),
    ]
    monkeypatch.setattr(t, "files", lambda: entries)
    rep = {r["partition"]: r for r in t.clustering_report().to_pylist()}
    assert rep["single"]["avg_files_per_point"] == 4.0
    assert rep["single"]["n_tok_span"] == 0
    assert rep["nostats"]["avg_files_per_point"] is None
    # strict-JSON round trip (what the CLI's status payload needs)
    payload = json.dumps({p: r for p, r in rep.items()})
    json.loads(payload)
    assert "NaN" not in payload


def test_auto_optimize_lifecycle_converges_via_cli(tmp_path):
    """Round-3 verdict ask #8: the trigger-based auto-optimize policy wired
    through the CLI op sequence converges — the first run compacts the
    degraded partitions, the second run (same policy, maintained table)
    commits NOTHING, and clustering-report rides the same invocation as
    the operator's observability surface."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "tokens")
    build_synthetic_table(root, N_ROWS, ROWS_PER_FILE)  # many small files

    def run_cli(ops):
        out = subprocess.run(
            [
                sys.executable, "-m",
                "realtime_clickstream_lakehouse_ray.maintain",
                "--table", root, "--ops", ops, "--target-file-mb", "2",
            ],
            cwd=repo, capture_output=True, text=True, check=True,
            env=dict(os.environ, RAY_ADDRESS="local"),
        )
        return out.stdout

    run_cli("auto-optimize,clustering-report")
    t = Table.load(root)
    v1 = t.version()
    assert v1 == 2  # build commit + one auto-optimize compact
    assert_tokens_equal(collect_sorted(t.scan()), _expected())

    # second run: policy finds no degraded partition -> commits nothing
    out = run_cli("auto-optimize,clustering-report")
    t = Table.load(root)
    assert t.version() == v1
    assert "clustering-report" in out


class TestDedupRows:
    def test_dedup_rows_keeps_min_key_and_tokens(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dedup_rows")
        base = collect_sorted(t.scan())
        # byte-identical duplicate of every row under fresh keys
        dup = base.set_column(
            base.column_names.index("doc_id"),
            "doc_id",
            pc.binary_join_element_wise("zz-", base["doc_id"].combine_chunks(), ""),
        )
        t.append(dup)
        assert t.stats()["rows"] == 2 * N_ROWS
        v = t.dedup_rows()
        assert v is not None
        got = collect_sorted(t.scan())
        # winners are the min keys = the originals; arrays byte-equal
        assert_tokens_equal(got, _expected())
        # idempotent: a second dedup finds nothing
        assert t.dedup_rows() is None

    def test_dedup_rows_mor_is_cheap(self, tmp_path_factory):
        t = _fresh(tmp_path_factory, "dedup_rows_mor")
        base = collect_sorted(t.scan())
        dup = base.set_column(
            base.column_names.index("doc_id"),
            "doc_id",
            pc.binary_join_element_wise("zz-", base["doc_id"].combine_chunks(), ""),
        )
        t.append(dup)
        files_before = t.stats()["files"]
        v = t.dedup_rows(mode="mor")
        assert v is not None
        # deletion vectors, not rewrites: file count unchanged
        assert t.stats()["files"] == files_before
        assert_tokens_equal(collect_sorted(t.scan()), _expected())


def test_compact_where_scopes_to_partition(tmp_path_factory):
    """OPTIMIZE ... WHERE as a predicate string: only the named partition
    compacts; conditions beyond partition equality/IN reject loudly."""
    t = _fresh(tmp_path_factory, "compact_where")
    before = {f.partition: 0 for f in t.files()}
    for f in t.files():
        before[f.partition] += 1
    target = sorted(before)[0]
    v = t.compact(target_file_bytes=2 << 20, where=f"source = '{target}'")
    assert v is not None
    after: dict[str, int] = {}
    for f in t.files():
        after[f.partition] = after.get(f.partition, 0) + 1
    assert after[target] < before[target]
    for p in before:
        if p != target:
            assert after[p] == before[p]  # untouched
    assert_tokens_equal(collect_sorted(t.scan()), _expected())
    with pytest.raises(ValueError, match="partition-column"):
        t.compact(where="n_tok > 5")


def test_dedup_group_losers_survives_fp_collision():
    """Regression (round-4 ADVICE): fingerprint equality alone must never
    delete a row — the group check compares token CONTENT, so two rows that
    collide on the 64-bit fold but differ in bytes both survive, while each
    content class still dedups to its min key."""
    import pyarrow as pa

    from realtime_clickstream_lakehouse_ray.pipelines.table import (
        _dedup_group_losers,
    )

    from realtime_clickstream_lakehouse_ray.pipelines.table import (
        _tokens_as_binary,
    )

    def grp(keys, toks):
        arr = pa.array(toks, pa.list_(pa.int32()))
        return pa.table(
            {
                "fp": pa.array([7] * len(keys), pa.int64()),
                "key": pa.array(keys),
                "tokens_bytes": _tokens_as_binary(arr),
            }
        )

    # one fp group holding TWO distinct contents (a simulated collision):
    # content A appears 3x, content B 2x
    out = _dedup_group_losers(
        grp(["a3", "a1", "b2", "a2", "b1"],
            [[1, 2], [1, 2], [9, 9, 9], [1, 2], [9, 9, 9]])
    )
    # min key per content survives: a1 and b1; losers are the rest
    assert sorted(out["key"].to_pylist()) == ["a2", "a3", "b2"]
    # a group that is ONLY a collision (no true dups) deletes nothing
    assert _dedup_group_losers(grp(["x", "y"], [[1], [2]])).num_rows == 0
    # the binary signature is the raw int32 buffer (length-sensitive):
    # [1] vs [1, 0]-prefix-sharing rows stay distinct
    assert _dedup_group_losers(grp(["x", "y"], [[1], [1, 0]])).num_rows == 0


def test_broadcast_merge_source_never_lands_on_driver():
    """Regression (round-5): broadcast-MERGE source preparation (conform +
    CHECK + keep-latest dedup) runs in a Ray task and the append slices
    read the prepared table by ref, so a Dataset source must not move the
    driver's peak RSS by anything near its own size — only KEY-proportional
    metadata comes back.  Subprocess for a clean RSS baseline."""
    import os
    import subprocess
    import sys
    import textwrap

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = textwrap.dedent(
        """
        import resource, sys
        sys.path.insert(0, "@REPO@")
        import ray
        ray.init(address="local", num_cpus=4, include_dashboard=False,
                 logging_level="ERROR")
        ray.data.DataContext.get_current().enable_progress_bars = False
        from realtime_clickstream_lakehouse_ray.sources.synth import (
            build_synthetic_table, gen_updates_chunk,
        )

        t = build_synthetic_table("@ROOT@/tokens", 100_000, 5_000)
        # ~90 MB source (600k rows), generated in a task, fed as refs
        gen = ray.remote(num_cpus=1)(gen_updates_chunk)
        src = ray.data.from_arrow_refs(
            [gen.remote(100_000, n_updates=50_000, n_inserts=550_000)]
        )
        before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss  # KiB
        v = t.merge(src)
        after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        assert v is not None
        assert t.stats()["rows"] == 100_000 + 550_000, t.stats()["rows"]
        print("RSS_DELTA_KB", after - before)
        ray.shutdown()
        """
    ).replace("@REPO@", repo)
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        out = subprocess.run(
            [sys.executable, "-c", script.replace("@ROOT@", d)],
            capture_output=True, text=True, check=True,
            env=dict(os.environ, RAY_ADDRESS="local"),
        )
    delta_kb = int(out.stdout.strip().splitlines()[-1].split()[-1])
    # source ~36 avg tokens x 600k rows x 4B ~ 86k KiB + keys; pre-fix the
    # driver concat held it all (plus dedup/conform copies)
    assert delta_kb < 45_000, delta_kb
