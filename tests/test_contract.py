"""Contract smoke: every queries() entry runs and matches its DuckDB
oracle at sf0.001 (the fast tier; the driver gate runs sf0.01)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod
from tools.check_contract import TABLES, norm

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(entrymod.queries().keys()))
def test_query_matches_oracle(spark, con, name):
    fn = entrymod.queries()[name]
    sdf = fn(spark, SF_DIR).toPandas()
    oracles = entrymod.oracle_sql()
    if name not in oracles:
        assert isinstance(sdf, pd.DataFrame)
        return
    odf = con.execute(oracles[name]).fetchdf()
    a, b = norm(sdf.copy()), norm(odf.copy())
    assert list(a.columns) == list(b.columns)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b)
