"""Predicate UPDATE (Table.update): copy-on-write set-rules over matched
rows, including the partition-changing case (rows physically move between
partitions in one commit), CHECK-constraint re-validation, stats-pruned
planning, and idempotent rerun via the deterministic job id."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    gen_tokens_chunk,
)
from realtime_clickstream_lakehouse_ray.stages.rewrite import apply_update_rules
from tests.util import collect_sorted

N_ROWS = 1_000
ROWS_PER_FILE = 100


@pytest.fixture()
def table(tmp_path_factory) -> Table:
    root = tmp_path_factory.mktemp("upd") / "tokens"
    return build_synthetic_table(str(root), N_ROWS, ROWS_PER_FILE)


class TestApplyUpdateRules:
    def test_ops(self):
        t = pa.table(
            {
                "a": pa.array([1, 2, 3], pa.int32()),
                "s": pa.array(["x", "y", "z"]),
            }
        )
        mask = pa.array([True, False, True])
        out = apply_update_rules(
            t,
            mask,
            [
                {"column": "a", "op": "add", "value": 10},
                {"column": "s", "op": "suffix", "value": "-u"},
            ],
        )
        assert out["a"].to_pylist() == [11, 2, 13]
        assert out["s"].to_pylist() == ["x-u", "y", "z-u"]
        assert out["a"].type == pa.int32()  # type pinned, no silent widen
        out2 = apply_update_rules(
            t, mask, [{"column": "s", "op": "set", "value": "K"}]
        )
        assert out2["s"].to_pylist() == ["K", "y", "K"]


class TestUpdate:
    def test_partition_changing_update(self, table):
        pre = collect_sorted(table.scan())
        v = table.update(
            [{"column": "source", "op": "suffix", "value": "-u"}], max_n_tok=59
        )
        assert v is not None
        post = collect_sorted(table.scan())
        # keys and token arrays untouched
        assert post["doc_id"].equals(pre["doc_id"])
        assert post["tokens"].combine_chunks().equals(
            pre["tokens"].combine_chunks()
        )
        m = pc.less_equal(pre["n_tok"], 59).combine_chunks()
        expect = pc.if_else(
            m,
            pc.binary_join_element_wise(
                pre["source"].combine_chunks(), pa.scalar("-u"), ""
            ),
            pre["source"].combine_chunks(),
        )
        assert post["source"].combine_chunks().equals(pc.cast(expect, post["source"].type).combine_chunks() if isinstance(expect, pa.ChunkedArray) else pc.cast(expect, post["source"].type))
        # partition metadata follows the moved rows: every file's recorded
        # partition equals its rows' source value
        for f in table.files():
            assert (f.partition.endswith("-u")) == all(
                s.endswith("-u")
                for s in set(
                    collect_sorted(
                        table._read_entries([f], columns=["doc_id", "source"])
                    )["source"].to_pylist()
                )
            )

    def test_rerun_same_job_is_noop(self, table):
        rules = [{"column": "n_tok", "op": "add", "value": 0}]
        v1 = table.update(rules, min_n_tok=100, job_id="upd-job-x")
        v2 = table.update(rules, min_n_tok=100, job_id="upd-job-x")
        assert v1 == v2

    def test_no_match_returns_none(self, table):
        assert (
            table.update(
                [{"column": "source", "op": "set", "value": "x"}],
                min_n_tok=10_000_000,
            )
            is None
        )

    def test_key_column_update_rejected(self, table):
        with pytest.raises(ValueError, match="key column"):
            table.update([{"column": "doc_id", "op": "suffix", "value": "!"}])

    def test_constraint_violation_blocks_commit(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("updc") / "tokens"
        t = Table.create(
            str(root),
            constraints=[{"kind": "token_len"}],
        )
        t.append(gen_tokens_chunk(0, 0, 200))
        v_pre = t.version()
        # breaking n_tok against the token arrays must fail loudly (Ray
        # wraps the actor's ConstraintViolation in RayTaskError)...
        with pytest.raises(Exception, match="token_len"):
            t.update([{"column": "n_tok", "op": "add", "value": 1}], min_n_tok=0)
        # ...and publish nothing
        assert t.version() == v_pre
