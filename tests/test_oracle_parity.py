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


def _arrow_kind(t: pa.DataType) -> str:
    """Coarse dtype family used by the driver-prediction check.  The driver
    compares pandas-rendered values, where an int64 engine column vs a
    decimal128 oracle column hash-mismatches even when every value agrees
    (the r03 ``orders_rollup`` failure), while decimal-vs-double does NOT
    (pandas renders both as float64).  Model that exactly: all ints are one
    kind, decimal collapses into float, and int-vs-{float,decimal} must
    FAIL locally."""
    if pa.types.is_integer(t):
        return "int"
    if pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "float"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "datetime"
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return "list"
    return str(t)


def _to_arrow(res) -> pa.Table:
    if isinstance(res, pa.Table):
        return res
    if isinstance(res, pd.DataFrame):
        return pa.Table.from_pandas(res, preserve_index=False)
    # ray Dataset: native Arrow blocks, NOT via to_pandas (a pandas
    # round-trip degrades nullable int64 to float64 and would false-flag)
    import ray

    blocks = [
        pa.Table.from_pandas(b, preserve_index=False)
        if isinstance(b, pd.DataFrame)
        else b
        for b in ray.get(res.to_arrow_refs())
    ]
    tbls = [t for t in blocks if t.num_rows]
    if not tbls:
        return pa.Table.from_pandas(res.to_pandas(), preserve_index=False)
    return pa.concat_tables(tbls, promote_options="default")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


NAMES = sorted(set(entrymod.queries()) & set(entrymod.oracle_sql()))


_NUMERIC_KINDS = {"int", "float", "decimal"}


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, con):
    res = entrymod.queries()[name](SF_DIR)
    got_tbl = _to_arrow(res)
    exp_tbl = con.execute(entrymod.oracle_sql()[name]).arrow()
    # Driver-prediction dtype gate: the driver's value hash is dtype-aware
    # within the numeric family (int64 vs decimal128/float64 mismatch even
    # when values agree) — fail locally on any such divergence.
    exp_kinds = {f.name: _arrow_kind(f.type) for f in exp_tbl.schema}
    for f in got_tbl.schema:
        ek = exp_kinds.get(f.name)
        gk = _arrow_kind(f.type)
        if ek in _NUMERIC_KINDS or gk in _NUMERIC_KINDS:
            assert gk == ek, (
                f"{name}: column {f.name!r} numeric-kind mismatch "
                f"(engine {f.type} -> {gk}, oracle -> {ek}); the driver's "
                "value hash would fail on this even with equal values"
            )
    got = _normalize(_to_pandas(res))
    exp = _normalize(exp_tbl.to_pandas())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_all_queries_have_oracle_or_are_flagged():
    qs, os_ = entrymod.queries(), entrymod.oracle_sql()
    assert set(os_) <= set(qs)  # no orphan oracles
    assert NAMES, "no oracle-checked queries registered"
