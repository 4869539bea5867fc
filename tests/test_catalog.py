"""Multi-table catalog (state/catalog.py): name -> root registry, the
engine's Glue-Data-Catalog analog (reference
infra/terraform/modules/glue/main.tf:130-182)."""

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from realtime_clickstream_lakehouse_ray.pipelines.table import Table
from realtime_clickstream_lakehouse_ray.state.catalog import Catalog


def _rows(start, n, source="web"):
    return pa.table(
        {
            "doc_id": [f"d-{start + i:06d}" for i in range(n)],
            "tokens": pa.array([[i, i + 1] for i in range(n)], pa.list_(pa.int32())),
            "n_tok": pa.array([2] * n, pa.int32()),
            "source": [source] * n,
        }
    )


def _collect(ds) -> pa.Table:
    import ray

    return pa.concat_tables(
        [b for b in ray.get(ds.to_arrow_refs()) if b.num_rows]
    ).sort_by("doc_id")


def test_create_register_resolve_drop(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    assert cat.list_tables() == []
    t1 = cat.create_table("events_tokens")
    for s in (0, 20):  # two files so compact has a bin to pack
        t1.append(_rows(s, 20))
    # a table created elsewhere registers as an external table
    ext = Table.create(str(tmp_path / "elsewhere" / "tokens"))
    ext.append(_rows(100, 10, source="chat"))
    cat.register("external_tokens", str(ext.root))
    assert cat.list_tables() == ["events_tokens", "external_tokens"]

    # resolution survives a fresh Catalog instance (registry on disk)
    cat2 = Catalog(str(tmp_path / "cat"))
    assert _collect(cat2.table("events_tokens").scan()).num_rows == 40
    assert _collect(cat2.table("external_tokens").scan()).num_rows == 10

    # maintenance through the by-name handle commits to the same table
    v = cat2.table("events_tokens").compact(target_file_bytes=1 << 30)
    assert v is not None
    assert cat.table("events_tokens").version() == v

    cat.drop("external_tokens")
    assert cat.list_tables() == ["events_tokens"]
    assert (ext.root / "_table.json").is_file()  # drop without purge keeps files
    cat.drop("events_tokens", delete_files=True)
    assert cat.list_tables() == []
    assert not (tmp_path / "cat" / "events_tokens").exists()


def test_catalog_is_relocatable(tmp_path):
    import shutil

    cat = Catalog(str(tmp_path / "cat"))
    cat.create_table("t1").append(_rows(0, 12))
    shutil.move(str(tmp_path / "cat"), str(tmp_path / "moved"))
    got = _collect(Catalog(str(tmp_path / "moved")).table("t1").scan())
    assert got.num_rows == 12


def test_cross_table_query_by_name(tmp_path):
    """Two catalog tables joined by name resolution — the unit of a real
    deployment (ingest table x reference table)."""
    from realtime_clickstream_lakehouse_ray.pipelines.relational import (
        bucket_hash_join,
    )

    cat = Catalog(str(tmp_path / "cat"))
    cat.create_table("docs").append(_rows(0, 30, source="web"))
    cat.create_table("allow").append(_rows(0, 10, source="web"))
    joined = bucket_hash_join(
        cat.table("docs").scan(columns=["doc_id", "n_tok"]),
        cat.table("allow").scan(columns=["doc_id", "source"]),
        "doc_id",
        "doc_id",
        how="semi",
    )
    got = _collect(joined)
    assert got.num_rows == 10
    assert got.column_names == ["doc_id", "n_tok"]


def test_validation_and_errors(tmp_path):
    cat = Catalog(str(tmp_path / "cat"))
    with pytest.raises(ValueError, match="invalid table name"):
        cat.create_table("bad name")
    cat.create_table("t1")
    with pytest.raises(ValueError, match="already exists"):
        cat.create_table("t1")
    with pytest.raises(ValueError, match="already exists"):
        cat.register("t1", str(tmp_path / "cat" / "t1"))
    with pytest.raises(KeyError, match="unknown table"):
        cat.table("nope")
    with pytest.raises(KeyError):
        cat.drop("nope")
    with pytest.raises(FileNotFoundError):
        cat.register("ghost", str(tmp_path / "not_a_table"))


def test_cli_resolves_by_name(tmp_path):
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cat = Catalog(str(tmp_path / "cat"))
    cat.create_table("cli_tokens").append(_rows(0, 50))
    out = subprocess.run(
        [
            sys.executable, "-m", "realtime_clickstream_lakehouse_ray.maintain",
            "--catalog", str(tmp_path / "cat"),
            "--table", "cli_tokens",
            "--ops", "compact,metrics",
            "--target-file-mb", "1",
        ],
        cwd=repo, capture_output=True, text=True, check=True,
        env=dict(os.environ, RAY_ADDRESS="local"),
    )
    import json

    status = json.loads(out.stdout.splitlines()[-1])
    assert status["rows"] == 50
    assert status["table"].endswith("cli_tokens")


def test_catalog_sql_multi_table(tmp_path):
    """Multi-table ad-hoc SQL: catalog names are DuckDB views — the
    Athena-over-Glue-Catalog consumer shape, joined by name."""
    cat = Catalog(str(tmp_path / "cat"))
    cat.create_table("docs").append(_rows(0, 30, source="web"))
    allow = cat.create_table("allowlist")
    allow.append(_rows(0, 10, source="web"))
    got = cat.sql(
        "SELECT count(*) AS n, sum(d.n_tok) AS s FROM docs d "
        "JOIN allowlist a USING (doc_id)"
    )
    assert got["n"][0].as_py() == 10
    assert got["s"][0].as_py() == 20
    # per-table pushdown where= composes with the join
    got = cat.sql(
        "SELECT count(*) AS n FROM docs d JOIN allowlist a USING (doc_id)",
        where={"docs": "doc_id < 'd-000005'"},
    )
    assert got["n"][0].as_py() == 5
    with pytest.raises(KeyError, match="unknown table"):
        cat.sql("SELECT 1", where={"nope": "a = 1"})
    # snapshot semantics: a mor-delete is invisible through the view
    docs = cat.table("docs")
    docs.delete(keys=["d-000000"], mode="mor")
    assert cat.sql("SELECT count(*) AS n FROM docs")["n"][0].as_py() == 29


def test_create_table_as(tmp_path):
    """CTAS: multi-table SQL result materialized as a new catalog table,
    itself immediately queryable and maintainable by name."""
    cat = Catalog(str(tmp_path / "cat"))
    cat.create_table("docs").append(_rows(0, 30, source="web"))
    cat.create_table("allow").append(_rows(0, 12, source="chat"))
    t = cat.create_table_as(
        "joined",
        "SELECT d.doc_id, d.n_tok, a.source FROM docs d "
        "JOIN allow a USING (doc_id)",
        key_col="doc_id",
        partition_col="source",
    )
    assert "joined" in cat.list_tables()
    assert t.stats()["rows"] == 12
    got = cat.sql("SELECT count(*) AS n, min(doc_id) AS f FROM joined")
    assert got["n"][0].as_py() == 12
    assert got["f"][0].as_py() == "d-000000"
    # the derived table is a full table: maintenance + time travel work
    v0 = t.version()
    t.delete(keys=["d-000000"])
    assert cat.sql("SELECT count(*) AS n FROM joined")["n"][0].as_py() == 11
    assert t.sql("SELECT count(*) AS n FROM t", version=v0)["n"][0].as_py() == 12
    with pytest.raises(ValueError, match="key_col"):
        cat.create_table_as("bad", "SELECT 1 AS x", key_col="doc_id",
                            partition_col="x")
