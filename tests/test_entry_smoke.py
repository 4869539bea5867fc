"""Every queries() entry must execute end-to-end (rows-only entries have no
oracle, so this is their execution gate) and entry() must produce rows."""

import pandas as pd
import pyarrow as pa
import pytest
import ray

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"


def _nrows(res) -> int:
    if isinstance(res, pa.Table):
        return res.num_rows
    if isinstance(res, pd.DataFrame):
        return len(res)
    return res.count()  # ray Dataset


@pytest.mark.parametrize("name", sorted(entrymod.queries()))
def test_query_executes(name):
    res = entrymod.queries()[name](SF)
    assert _nrows(res) >= 0


def test_entry_returns_rows():
    res = entrymod.entry()
    assert _nrows(res) > 0
