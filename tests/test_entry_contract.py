"""Driver-contract validation: every queries() entry must match its
oracle_sql() twin on the sf0.01 tables (row count + columns + values),
mimicking the driver's order-insensitive comparison."""

import os

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    out = df[sorted(df.columns)].copy()
    for c in out.columns:
        if out[c].dtype == object:
            out[c] = out[c].astype(str)
        elif np.issubdtype(out[c].dtype, np.floating):
            out[c] = out[c].astype(np.float64).round(9)
        elif np.issubdtype(out[c].dtype, np.integer):
            out[c] = out[c].astype(np.int64)
    return out.sort_values(list(out.columns), kind="mergesort").reset_index(drop=True)


ENTRIES = sorted(entry_mod.queries().keys())


@pytest.mark.parametrize("name", ENTRIES)
def test_entry_matches_oracle(spark, ddb, name):
    qfn = entry_mod.queries()[name]
    oracles = entry_mod.oracle_sql()
    got = _canon(qfn(spark, SF_DIR).toPandas())
    if name not in oracles:
        assert len(got) >= 0  # rows-only check (non-SQL-expressible op)
        return
    exp = _canon(ddb.sql(oracles[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name}: columns {list(got.columns)} vs {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name}: rows {len(got)} vs {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                  check_exact=False, rtol=1e-9, atol=1e-9)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert {"qid", "rank", "doc_id", "score"} <= set(df.columns)
