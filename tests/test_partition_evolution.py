"""Partition evolution (Iceberg spec evolution): future writes partition by
a new column without rewriting existing files; the planner prunes
current-spec files by value, row-filters old-layout files, and normal
maintenance (compact/zorder) migrates the layout."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table

SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("tokens", pa.list_(pa.int32())),
        pa.field("n_tok", pa.int32()),
        pa.field("source", pa.string()),
        pa.field("region", pa.string()),
    ]
)

REGIONS = ["r-east", "r-west"]
SOURCES = ["web", "chat"]


def _batch(start: int, n: int) -> pa.Table:
    rng = np.random.default_rng(start)
    toks = [rng.integers(0, 100, size=3 + i % 4).astype(np.int32) for i in range(n)]
    return pa.table(
        {
            "doc_id": [f"d-{start + i:06d}" for i in range(n)],
            "tokens": pa.array([t.tolist() for t in toks], pa.list_(pa.int32())),
            "n_tok": pa.array([len(t) for t in toks], pa.int32()),
            "source": [SOURCES[(start + i) % 2] for i in range(n)],
            "region": [REGIONS[(start + i) // 2 % 2] for i in range(n)],
        }
    )


def _collect(ds) -> pa.Table:
    import ray

    tbls = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return (
        pa.concat_tables(tbls).sort_by("doc_id").combine_chunks()
        if tbls
        else SCHEMA.empty_table()
    )


@pytest.fixture()
def evolved(tmp_path):
    t = Table.create(str(tmp_path / "evo"), schema=SCHEMA)
    t.append(_batch(0, 100))  # spec 0: source=...
    t.evolve_partitioning("region")
    t.append(_batch(100, 100))  # spec 1: region=...
    return t


def test_metadata_and_layout(evolved):
    t = evolved
    assert t.partition_specs == ["source", "region"]
    assert t.partition_col == "region"
    specs = {(f.spec or 0) for f in t.files()}
    assert specs == {0, 1}
    # new files under region=, old untouched under source=
    assert any(f.path.startswith("region=") for f in t.files())
    assert any(f.path.startswith("source=") for f in t.files())
    t2 = Table.load(str(t.root))
    assert t2.partition_specs == ["source", "region"]


def test_scan_partitions_spans_both_layouts(evolved):
    t = evolved
    got = _collect(t.scan(partitions=["r-east"]))
    exp = pa.concat_tables([_batch(0, 100), _batch(100, 100)])
    exp = exp.filter(pc.equal(exp["region"], "r-east")).sort_by("doc_id")
    assert got.num_rows == exp.num_rows
    assert got["doc_id"].combine_chunks().equals(exp["doc_id"].combine_chunks())
    # old-layout rows ARE present (they were never under region= dirs)
    assert got.num_rows > 50


def test_scan_projection_needs_partition_col_on_mixed_specs(evolved):
    with pytest.raises(ValueError, match="columns= projection"):
        evolved.scan(partitions=["r-east"], columns=["doc_id"])
    got = _collect(
        evolved.scan(partitions=["r-east"], columns=["doc_id", "region"])
    )
    assert set(got["region"].to_pylist()) == {"r-east"}


def test_compact_migrates_old_layout(evolved):
    t = evolved
    v = t.compact(target_file_bytes=1 << 30)
    assert v is not None
    files = t.files()
    assert all((f.spec or 0) == 1 for f in files)
    assert all(f.path.startswith("region=") for f in files)
    # token arrays survive the migration byte-for-byte
    got = _collect(t.scan())
    exp = pa.concat_tables([_batch(0, 100), _batch(100, 100)]).sort_by("doc_id")
    assert got["tokens"].combine_chunks().equals(
        exp["tokens"].combine_chunks().cast(got["tokens"].combine_chunks().type)
    )
    # post-migration the partition prune is value-exact again (no row filter)
    got = _collect(t.scan(partitions=["r-west"]))
    assert set(got["region"].to_pylist()) == {"r-west"}


def test_zorder_migrates_old_layout(tmp_path):
    t = Table.create(str(tmp_path / "evoz"), schema=SCHEMA)
    t.append(_batch(0, 100))
    t.evolve_partitioning("region")
    t.append(_batch(100, 100))
    v = t.zorder(dims=("region", "n_tok", "doc_id"), target_file_bytes=1 << 20)
    assert v is not None
    assert all((f.spec or 0) == 1 for f in t.files())
    assert all(f.path.startswith("region=") for f in t.files())
    got = _collect(t.scan(partitions=["r-east"]))
    assert set(got["region"].to_pylist()) == {"r-east"}


def test_delete_where_partition_predicate_row_filters_old_layout(evolved):
    t = evolved
    exp = pa.concat_tables([_batch(0, 100), _batch(100, 100)])
    keep = exp.filter(pc.not_equal(exp["region"], "r-east"))
    v = t.delete(partitions=["r-east"])
    assert v is not None
    got = _collect(t.scan())
    assert got.num_rows == keep.num_rows
    assert set(got["region"].to_pylist()) == {"r-west"}


def test_update_partition_predicate_on_old_layout(evolved):
    t = evolved
    v = t.update(
        set_rules=[{"column": "n_tok", "op": "set", "value": -1}],
        partitions=["r-west"],
    )
    assert v is not None
    got = _collect(t.scan())
    hit = got.filter(pc.equal(got["n_tok"], -1))
    assert set(hit["region"].to_pylist()) == {"r-west"}
    exp = pa.concat_tables([_batch(0, 100), _batch(100, 100)])
    assert hit.num_rows == pc.sum(
        pc.equal(exp["region"], "r-west").cast(pa.int64())
    ).as_py()


def test_guards(evolved):
    t = evolved
    with pytest.raises(ValueError, match="already partitioned"):
        t.evolve_partitioning("region")
    with pytest.raises(ValueError, match="degenerate"):
        t.evolve_partitioning("doc_id")
    with pytest.raises(ValueError, match="non-scalar"):
        t.evolve_partitioning("tokens")
    # BOTH the old and the new spec column are rename/drop-protected
    with pytest.raises(ValueError, match="partition"):
        t.rename_column("source", "origin")
    with pytest.raises(ValueError, match="partition"):
        t.drop_column("region")
    with pytest.raises(ValueError, match="mixed-partition-spec"):
        t.delete(keys=["d-000000"], partitions=["r-east"], mode="mor")


def test_evolve_partitioning_via_cli(tmp_path):
    """The evolve-partitioning CLI op composed with compact migrates the
    layout end to end through the operator surface."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = str(tmp_path / "evocli")
    t = Table.create(root, schema=SCHEMA)
    t.append(_batch(0, 80))
    out = subprocess.run(
        [
            sys.executable, "-m", "realtime_clickstream_lakehouse_ray.maintain",
            "--table", root, "--ops", "evolve-partitioning,compact",
            "--partition-by", "region", "--target-file-mb", "1",
        ],
        cwd=repo, capture_output=True, text=True, check=True,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    assert '"evolve-partitioning": "region"' in out.stdout
    t = Table.load(root)
    assert t.partition_col == "region"
    assert all(f.path.startswith("region=") for f in t.files())


def test_dml_rewrite_keeps_old_spec_claim(evolved):
    """Regression (round-4 ADVICE, high): a CoW DELETE that rewrites an
    old-layout file must re-add it under its OWN spec (old partition value
    + old hive dir), never claim the current spec — a mixed claim makes
    scan(partitions=) prune the file by value and silently drop rows."""
    t = evolved
    exp = pa.concat_tables([_batch(0, 100), _batch(100, 100)])
    v = t.delete(partitions=["r-east"])
    assert v is not None
    # every surviving pre-evolution file (rewritten or not) still claims
    # spec 0 and lives under source=; current-spec files claim spec 1
    for f in t.files():
        if f.path.startswith("source="):
            assert (f.spec or 0) == 0, f.path
        else:
            assert f.path.startswith("region=")
            assert (f.spec or 0) == 1, f.path
    # the exact reported repro: the OTHER partition keeps all 100 rows
    got = _collect(t.scan(partitions=["r-west"]))
    exp_west = exp.filter(pc.equal(exp["region"], "r-west"))
    assert got.num_rows == exp_west.num_rows == 100
    assert set(got["region"].to_pylist()) == {"r-west"}
    # and a scoped compact (current-spec only) does not eat old rows
    t.compact(target_file_bytes=1 << 30, partitions=["r-west"])
    assert _collect(t.scan(partitions=["r-west"])).num_rows == 100


def test_update_rewrite_keeps_old_spec_claim(evolved):
    """Same regression for UPDATE: a rewrite of an old-layout file stays in
    the old layout unless the update touches the partition column."""
    t = evolved
    v = t.update(
        set_rules=[{"column": "n_tok", "op": "set", "value": -7}],
        partitions=["r-east"],
    )
    assert v is not None
    for f in t.files():
        dir_col = f.path.split("=", 1)[0]
        assert dir_col == t.partition_specs[f.spec or 0], f.path
    got = _collect(t.scan(partitions=["r-west"]))
    assert got.num_rows == 100
    assert not any(v == -7 for v in got["n_tok"].to_pylist())


def test_partition_changing_update_migrates_to_current_spec(evolved):
    """An UPDATE that rewrites the CURRENT partition column splits its
    output per new value — those adds land in the current layout and must
    claim the current spec."""
    t = evolved
    v = t.update(
        set_rules=[{"column": "region", "op": "set", "value": "r-east"}],
        min_n_tok=0,
    )
    assert v is not None
    assert all((f.spec or 0) == 1 for f in t.files())
    assert all(f.path.startswith("region=") for f in t.files())
    got = _collect(t.scan(partitions=["r-east"]))
    assert got.num_rows == 200
    assert _collect(t.scan(partitions=["r-west"])).num_rows == 0


def test_merge_rewrite_keeps_old_spec_claim(evolved):
    """Broadcast MERGE bins never mix specs; rewrites of old-layout files
    keep their old-spec claim so partition scans stay exact."""
    t = evolved
    # source updates one old-layout key and one new-layout key
    src = pa.concat_tables([_batch(0, 2), _batch(100, 2)])
    src = src.set_column(
        src.column_names.index("n_tok"),
        "n_tok",
        pa.array([-9] * src.num_rows, pa.int32()),
    )
    v = t.merge(src)
    assert v is not None
    for f in t.files():
        dir_col = f.path.split("=", 1)[0]
        assert dir_col == t.partition_specs[f.spec or 0], f.path
    got = _collect(t.scan(partitions=["r-east", "r-west"]))
    assert got.num_rows == 200
    assert sum(1 for x in got["n_tok"].to_pylist() if x == -9) == 4
