"""CHECK constraints: declarative row predicates persisted in table meta
and enforced vectorized inside every write pipeline (reference analog:
Glue schema-registry validation + Delta CHECK constraints)."""

import pyarrow as pa
import pytest

from realtime_clickstream_lakehouse_ray.functions.constraints import (
    ConstraintViolation,
    check_batch,
    validate_spec,
)
from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.sources.synth import (
    build_synthetic_table,
    gen_updates_chunk,
)

N = 1_000
RPF = 100


def _row(doc_id="doc-x", tokens=(1, 2, 3), n_tok=None, source="web") -> pa.Table:
    return pa.table(
        {
            "doc_id": pa.array([doc_id]),
            "tokens": pa.array([list(tokens)], pa.list_(pa.int32())),
            "n_tok": pa.array([n_tok if n_tok is not None else len(tokens)], pa.int32()),
            "source": pa.array([source]),
        }
    )


def test_spec_validation():
    assert validate_spec({"kind": "token_len"})["name"] == "token_len_tokens"
    with pytest.raises(ValueError):
        validate_spec({"kind": "regex"})
    with pytest.raises(ValueError):
        validate_spec({"kind": "range", "column": "n_tok"})
    with pytest.raises(ValueError):
        validate_spec({"kind": "not_null"})


def test_check_batch_kinds():
    good = _row()
    specs = [
        validate_spec({"kind": "token_len"}),
        validate_spec({"kind": "not_null", "column": "doc_id"}),
        validate_spec({"kind": "range", "column": "n_tok", "min": 1, "max": 10}),
        validate_spec({"kind": "allowed_values", "column": "source", "values": ["web"]}),
    ]
    assert check_batch(good, specs) is good
    with pytest.raises(ConstraintViolation, match="token_len"):
        check_batch(_row(n_tok=99), specs)
    with pytest.raises(ConstraintViolation, match="range_n_tok"):
        check_batch(_row(tokens=range(20), n_tok=20), specs)
    with pytest.raises(ConstraintViolation, match="allowed_values"):
        check_batch(_row(source="spam"), specs)
    bad_null = good.set_column(0, "doc_id", pa.array([None], pa.string()))
    with pytest.raises(ConstraintViolation, match="not_null"):
        check_batch(bad_null, specs)


class TestTableConstraints:
    @pytest.fixture(scope="class")
    def table(self, tmp_path_factory):
        root = tmp_path_factory.mktemp("constraints") / "tokens"
        t = build_synthetic_table(str(root), N, RPF)
        t.add_constraint({"kind": "token_len"})
        t.add_constraint({"kind": "range", "column": "n_tok", "min": 1})
        return t

    def test_constraints_survive_reload(self, table):
        names = {c["name"] for c in Table.load(str(table.root)).constraints}
        assert names == {"token_len_tokens", "range_n_tok"}

    def test_append_rejects_violations(self, table):
        v0 = table.version()
        with pytest.raises(Exception, match="token_len"):
            table.append(_row(doc_id="doc-bad", n_tok=99))
        assert table.version() == v0  # nothing committed
        table.append(_row(doc_id="doc-ok"))
        assert table.version() == v0 + 1

    def test_merge_source_is_checked(self, table):
        with pytest.raises(Exception, match="range_n_tok"):
            table.merge(_row(doc_id="doc-mrg", tokens=[], n_tok=0), strategy="broadcast")

    def test_add_constraint_verifies_existing_rows(self, table):
        # every synthetic row has n_tok >= 8, so max=5 must be rejected
        with pytest.raises(Exception, match="CHECK constraint"):
            table.add_constraint(
                {"kind": "range", "column": "n_tok", "max": 5, "name": "tiny_docs"}
            )
        assert all(c["name"] != "tiny_docs" for c in table.constraints)

    def test_duplicate_and_drop(self, table):
        with pytest.raises(ValueError, match="already exists"):
            table.add_constraint({"kind": "token_len"})
        table.add_constraint(
            {"kind": "allowed_values", "column": "source",
             "values": ["web", "wiki", "news", "social", "code"]},
            verify=False,
        )
        table.drop_constraint("allowed_values_source")
        with pytest.raises(KeyError):
            table.drop_constraint("allowed_values_source")


def test_predicate_check_constraint(tmp_path_factory):
    """CHECK (<conjunctive predicate>): Delta CHECK semantics — NULLs
    satisfy; a strictly-false row fails the append; existing-row
    verification gates ADD CONSTRAINT; renamed columns translate for the
    rewrite actors."""
    import pyarrow as pa
    import pytest as _pytest

    from realtime_clickstream_lakehouse_ray.functions.constraints import (
        ConstraintViolation,
    )
    from realtime_clickstream_lakehouse_ray.pipelines.table import Table
    from realtime_clickstream_lakehouse_ray.sources.synth import (
        build_synthetic_table,
    )

    root = str(tmp_path_factory.mktemp("pred_check") / "tokens")
    t = build_synthetic_table(root, 500, 100)
    t.add_constraint({"kind": "predicate", "where": "n_tok >= 0 AND n_tok < 100000"})

    bad = pa.table(
        {
            "doc_id": ["bad-1"],
            "tokens": pa.array([[1]], pa.list_(pa.int32())),
            "n_tok": pa.array([-5], pa.int32()),
            "source": ["web"],
        }
    )
    with _pytest.raises(ConstraintViolation):
        t.append(bad)
    # adding a constraint the CURRENT rows violate is rejected up front
    with _pytest.raises(ConstraintViolation):
        t.add_constraint(
            {"kind": "predicate", "name": "impossible", "where": "n_tok > 100000"}
        )
    # malformed predicates fail at ADD time, loudly
    with _pytest.raises(ValueError):
        t.add_constraint({"kind": "predicate", "where": "n_tok >= 0 OR 1 = 1"})
    # the named constraint guards rename/drop of its columns
    with _pytest.raises(ValueError, match="drop_constraint"):
        t.rename_column("n_tok", "length")
    t.drop_constraint("check_n_tok")
    t.rename_column("n_tok", "length")
    t.add_constraint({"kind": "predicate", "where": "length >= 0"})
    # compact runs the physical-translated constraint inside the actors
    assert t.compact(target_file_bytes=1 << 20) is not None


def test_predicate_check_kleene_null_semantics():
    """SQL/Delta CHECK three-valued semantics: a NULL predicate RESULT
    satisfies the constraint (``x > 5`` passes a null x), but a strict
    FALSE violates it — so ``x IS NOT NULL`` (alone or as a conjunct)
    must reject null rows rather than exempt them."""
    t = pa.table(
        {
            "doc_id": pa.array(["a", "b"]),
            "score": pa.array([None, 9.0], pa.float64()),
        }
    )
    passes_null = validate_spec({"kind": "predicate", "where": "score > 5"})
    check_batch(t, [passes_null])  # NULL result -> satisfied
    not_null = validate_spec(
        {"kind": "predicate", "where": "score IS NOT NULL"}
    )
    with pytest.raises(ConstraintViolation, match="1 row"):
        check_batch(t, [not_null])
    conjunct = validate_spec(
        {"kind": "predicate", "where": "score IS NOT NULL AND score > 5"}
    )
    with pytest.raises(ConstraintViolation, match="1 row"):
        check_batch(t, [conjunct])
    # all-null-free batch with a strict-false row still fails, and a
    # genuinely passing batch still passes
    ok = pa.table(
        {"doc_id": pa.array(["c"]), "score": pa.array([7.0], pa.float64())}
    )
    check_batch(ok, [not_null, conjunct, passes_null])
