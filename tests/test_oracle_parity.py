"""Driver-contract parity: every queries() entry with an oracle_sql() entry
must match DuckDB on the shared test tables (row count + column names +
order-insensitive values) — a local stand-in for CORRECTNESS_r{N}.json."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

import __ray_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.01"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _to_pandas(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object and df[c].map(lambda v: hasattr(v, "year")).all():
            df[c] = pd.to_datetime(df[c])
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c].astype("datetime64[us]"))
        elif str(df[c].dtype).startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


NAMES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, con):
    got = _normalize(_to_pandas(entrymod.queries()[name](SF_DIR)))
    exp = _normalize(con.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_all_queries_have_oracle_or_are_flagged():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)  # no orphan oracles
    assert NAMES, "no oracle-checked queries registered"
