"""Driver-style correctness gate, run locally: every queries() entry vs
its oracle_sql() via DuckDB on the same parquet (sf0.001 here; the real
driver runs sf0.01). Compare = row count + column names + order-
insensitive value equality, mirroring the driver's hash check."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


ORACLE_KEYS = sorted(entry_mod.oracle_sql().keys())


@pytest.mark.parametrize("name", ORACLE_KEYS)
def test_query_matches_oracle(spark, duck, name):
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _canon(q(spark, SF_DIR).toPandas())
    want = _canon(duck.execute(sql).fetchdf())
    assert list(got.columns) == list(want.columns), f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    for c in got.columns:
        g, w = got[c].to_numpy(), want[c].to_numpy()
        if g.dtype.kind == "f" or w.dtype.kind == "f":
            np.testing.assert_array_equal(g.astype(np.float64), w.astype(np.float64), err_msg=f"{name}.{c}")
        else:
            assert (g == w).all() if g.dtype != object else list(g) == list(w), f"{name}.{c} values differ"


def test_rows_only_queries_run(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    rows_only = [k for k in qs if k not in oracles]
    assert rows_only, "expected some rows-only entries"
    for name in rows_only:
        df = qs[name](spark, SF_DIR)
        n = df.count()
        assert n >= 0, name


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "caption" in df.columns
