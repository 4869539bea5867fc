"""MERGE matched-clause predicates (Delta ``WHEN MATCHED AND <cond> THEN
UPDATE/DELETE`` + optional WHEN-NOT-MATCHED omission): the clause predicate
is evaluated on the TARGET row inside the rewrite units; per-key verdicts
flow back so the source append inserts exactly the right rows."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.sources.synth import build_synthetic_table

N = 800
RPF = 100


def _collect(t) -> pa.Table:
    import ray

    return pa.concat_tables(
        [b for b in ray.get(t.scan().to_arrow_refs()) if b.num_rows]
    ).sort_by("doc_id")


def _fresh(tmp_path_factory, name):
    t = build_synthetic_table(str(tmp_path_factory.mktemp(name) / "tokens"), N, RPF)
    full = _collect(t)
    return t, full


def _source(full, n_upd=20, n_ins=5, sentinel=-1):
    upd = full.slice(0, n_upd)
    upd = upd.set_column(
        upd.column_names.index("n_tok"),
        "n_tok",
        pa.array([sentinel] * n_upd, pa.int32()),
    )
    ins = full.slice(n_upd, n_ins)
    ins = ins.set_column(
        0, "doc_id", pa.array([f"zz-new-{i}" for i in range(n_ins)])
    )
    return upd, ins, pa.concat_tables([upd, ins])


def test_matched_condition_update(tmp_path_factory):
    t, full = _fresh(tmp_path_factory, "when_upd")
    med = int(pc.approximate_median(full["n_tok"]).as_py())
    upd, ins, src = _source(full)
    v = t.merge(src, matched_condition=f"n_tok >= {med}")
    assert v is not None
    got = _collect(t)
    matched = full.slice(0, 20)
    exp_updated = pc.sum(pc.greater_equal(matched["n_tok"], med)).as_py()
    assert got.num_rows == N + 5
    assert pc.sum(pc.equal(got["n_tok"], -1)).as_py() == exp_updated > 0
    # clause-false matches keep the ORIGINAL row (not the source version)
    kept = got.filter(pc.is_in(got["doc_id"], value_set=matched["doc_id"].combine_chunks()))
    for i in range(20):
        orig = matched["n_tok"][i].as_py()
        now = kept["n_tok"][i].as_py()
        assert now == (-1 if orig >= med else orig)


def test_matched_condition_delete(tmp_path_factory):
    t, full = _fresh(tmp_path_factory, "when_del")
    med = int(pc.approximate_median(full["n_tok"]).as_py())
    upd, ins, src = _source(full)
    v = t.merge(src, matched_condition=f"n_tok < {med}", matched_action="delete")
    assert v is not None
    got = _collect(t)
    matched = full.slice(0, 20)
    n_del = pc.sum(pc.less(matched["n_tok"], med)).as_py()
    # deleted rows gone, matched source rows never inserted, inserts in
    assert got.num_rows == N - n_del + 5
    assert pc.sum(pc.equal(got["n_tok"], -1)).as_py() == 0
    assert pc.sum(pc.match_substring(got["doc_id"], "zz-new")).as_py() == 5


def test_insert_unmatched_false(tmp_path_factory):
    t, full = _fresh(tmp_path_factory, "when_noins")
    med = int(pc.approximate_median(full["n_tok"]).as_py())
    upd, ins, src = _source(full)
    v = t.merge(src, matched_condition=f"n_tok >= {med}", insert_unmatched=False)
    assert v is not None
    got = _collect(t)
    assert got.num_rows == N  # no WHEN NOT MATCHED clause: no inserts
    assert pc.sum(pc.match_substring(got["doc_id"], "zz-new")).as_py() == 0
    matched = full.slice(0, 20)
    assert (
        pc.sum(pc.equal(got["n_tok"], -1)).as_py()
        == pc.sum(pc.greater_equal(matched["n_tok"], med)).as_py()
    )


def test_unconditioned_delete_action(tmp_path_factory):
    """matched_action='delete' without a condition = anti-upsert: every
    matched target row deletes, matched source rows never insert."""
    t, full = _fresh(tmp_path_factory, "when_delall")
    upd, ins, src = _source(full)
    v = t.merge(src, matched_action="delete")
    assert v is not None
    got = _collect(t)
    assert got.num_rows == N - 20 + 5


def test_composes_with_deletion_vectors(tmp_path_factory):
    """A conditioned merge over files carrying DV tombstones folds the DVs
    in (every rewrite materializes pending MOR deletes) and the verdicts
    are computed on the LIVE rows only."""
    t, full = _fresh(tmp_path_factory, "when_dv")
    dead = full["doc_id"].to_pylist()[:5]
    t.delete(keys=dead, mode="mor")
    upd, ins, src = _source(full)  # first 20 keys incl. the 5 tombstoned
    v = t.merge(src, matched_condition="n_tok >= 0")  # matches all LIVE
    assert v is not None
    got = _collect(t)
    # tombstoned keys were NOT live -> unmatched -> their source rows
    # INSERT (same as Delta: a deleted key re-inserted via MERGE)
    assert got.num_rows == N + 5
    back = got.filter(pc.is_in(got["doc_id"], value_set=pa.array(dead)))
    assert back["n_tok"].to_pylist() == [-1] * 5
    assert not any(f.dv for f in t.files())


def test_column_mapping_translates_condition(tmp_path_factory):
    t, full = _fresh(tmp_path_factory, "when_map")
    t.rename_column("n_tok", "length")
    med = int(pc.approximate_median(full["n_tok"]).as_py())
    upd, ins, src = _source(full)
    src = src.rename_columns(
        ["doc_id", "tokens", "length", "source"]
    )
    v = t.merge(src, matched_condition=f"length >= {med}")
    assert v is not None
    got = _collect(t)
    assert got.num_rows == N + 5
    matched = full.slice(0, 20)
    assert (
        pc.sum(pc.equal(got["length"], -1)).as_py()
        == pc.sum(pc.greater_equal(matched["n_tok"], med)).as_py()
    )


def test_validation(tmp_path_factory):
    t, full = _fresh(tmp_path_factory, "when_valid")
    src = full.slice(0, 3)
    with pytest.raises(ValueError, match="matched_action"):
        t.merge(src, matched_action="upsert")
    with pytest.raises(ValueError, match="sequence_col"):
        t.merge(src, matched_condition="n_tok > 1", sequence_col="n_tok")
    with pytest.raises(ValueError, match="unknown column"):
        t.merge(src, matched_condition="nope > 1")
    with pytest.raises(ValueError, match="broadcast"):
        t.merge(src, matched_condition="n_tok > 1", strategy="shuffle")


def test_crash_resume_same_job_id(tmp_path_factory):
    t, full = _fresh(tmp_path_factory, "when_resume")
    med = int(pc.approximate_median(full["n_tok"]).as_py())
    upd, ins, src = _source(full)
    v1 = t.merge(src, matched_condition=f"n_tok >= {med}", job_id="when-job")
    v2 = t.merge(src, matched_condition=f"n_tok >= {med}", job_id="when-job")
    assert v1 == v2
