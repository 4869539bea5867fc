"""Named-ref snapshots (tags) and partition-scoped compaction.

Tags are the Iceberg retention-ref analog: a tagged snapshot survives
``expire_snapshots`` (consolidated into a self-contained base island) and
``vacuum`` never reclaims its files.  Scoped compaction is the Delta
``OPTIMIZE ... WHERE`` analog: only the named partitions are rewritten.
Golden token-array equality throughout (BASELINE.md correctness target).
"""

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


def _expected():
    return expected_tokens_table(N_ROWS, ROWS_PER_FILE).sort_by("doc_id").combine_chunks()


class TestTags:
    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory) -> Table:
        root = tmp_path_factory.mktemp("tags") / "tokens"
        return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)

    def test_tag_and_scan_roundtrip(self, table):
        v = table.tag("audit")
        assert v == table.version() == 1
        assert table.tags() == {"audit": 1}
        assert_tokens_equal(collect_sorted(table.scan(tag="audit")), _expected())

    def test_tag_unknown_version_raises(self, table):
        with pytest.raises(FileNotFoundError):
            table.tag("bad", version=99)

    def test_scan_selectors_mutually_exclusive(self, table):
        with pytest.raises(ValueError, match="at most one"):
            table.scan(version=1, tag="audit")

    def test_unknown_tag_raises(self, table):
        with pytest.raises(KeyError, match="no such tag"):
            table.scan(tag="nope")

    def test_tag_survives_expire_and_vacuum(self, table):
        # v1=ingest (tagged), v2=compact, v3=merge, v4=zorder
        table.compact(target_file_bytes=TARGET)
        table.merge(gen_updates_chunk(N_ROWS, n_updates=50, n_inserts=20))
        table.zorder(target_file_bytes=TARGET)
        expired = table.expire_snapshots(keep_last=2)
        assert expired == [2]  # v1 protected by the tag, v2 rolled off
        assert table.log.versions() == [1, 3, 4]
        removed = table.vacuum(min_age_seconds=0.0)
        # v2's compacted files (superseded by the zorder rewrite) are the
        # reclaimable garbage; the tagged ingest files must all survive
        assert removed
        assert_tokens_equal(collect_sorted(table.scan(tag="audit")), _expected())
        # the expired, untagged version is gone for good
        with pytest.raises(FileNotFoundError):
            table.scan(version=2)

    def test_drop_tag_releases_retention(self, table):
        table.drop_tag("audit")
        assert "audit" not in table.tags()
        expired = table.expire_snapshots(keep_last=2)
        assert expired == [1]
        with pytest.raises(KeyError):
            table.scan(tag="audit")

    def test_drop_unknown_tag_raises(self, table):
        with pytest.raises(KeyError):
            table.drop_tag("audit")


class TestScopedCompact:
    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory) -> Table:
        root = tmp_path_factory.mktemp("optwhere") / "tokens"
        return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)

    def test_compact_only_named_partition(self, table):
        before = {f.path: f.partition for f in table.files()}
        v = table.compact(target_file_bytes=TARGET, partitions=["web"])
        assert v == 2
        after = {f.path: f.partition for f in table.files()}
        new_files = {p: part for p, part in after.items() if p not in before}
        assert new_files and set(new_files.values()) == {"web"}
        gone = {p: part for p, part in before.items() if p not in after}
        assert set(gone.values()) == {"web"}
        # every other partition's file set is byte-identical
        other_before = {p for p, part in before.items() if part != "web"}
        other_after = {p for p, part in after.items() if part != "web"}
        assert other_before == other_after
        assert_tokens_equal(collect_sorted(table.scan()), _expected())

    def test_scoped_jobs_have_distinct_ids(self, table):
        # a second scope on the same parent is a NEW job, not the cached one
        v = table.compact(target_file_bytes=TARGET, partitions=["books"])
        assert v == 3
        assert_tokens_equal(collect_sorted(table.scan()), _expected())

    def test_empty_scope_is_noop(self, table):
        assert table.compact(target_file_bytes=TARGET, partitions=["nosuch"]) is None


class TestMaintainCLI:
    """tag / drop-tag / --compact-partitions through the ray-job CLI."""

    def test_cli_tag_scoped_compact_droptag(self, tmp_path):
        import json
        import os
        import subprocess
        import sys

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        root = str(tmp_path / "tokens")
        build_synthetic_table(root, 1_000, 100)
        out = subprocess.run(
            [
                sys.executable, "-m", "realtime_clickstream_lakehouse_ray.maintain",
                "--table", root, "--ops", "tag,compact,drop-tag",
                "--tag-name", "audit", "--target-file-mb", "2",
                "--compact-partitions", "web", "--num-cpus", "2",
            ],
            cwd=repo, capture_output=True, text=True,
            env=dict(os.environ, RAY_ADDRESS="local"),
        )
        assert out.returncode == 0, out.stderr[-2000:]
        status = json.loads(out.stdout.strip().splitlines()[-1])
        assert status["ops"]["tag"] == 1
        assert status["ops"]["compact"] in (2, None)
        assert status["ops"]["drop-tag"] == {}
        t = Table.load(root)
        assert {f.partition for f in t.files() if "bin" in f.path} <= {"web"}
