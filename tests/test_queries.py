"""Local mirror of the driver's correctness gate: every queries() entry with
an oracle_sql() runs side-by-side against DuckDB at sf0.001 and must match
on row count, column names, and values (exact for ints/strings; floats must
match to 1e-9 after the query's own rounding — if that margin ever matters,
the rounding in the query is wrong)."""

from __future__ import annotations

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import os

import __spark_entry__ as entrymod

# default sf0.001 for speed; set SPARK_GRAFT_TEST_SF=/root/testdata/sf0.01
# to mirror the driver's exact comparison scale
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif df[c].dtype == object:
            # duckdb may return Decimal for some folds
            df[c] = df[c].map(lambda v: float(v) if hasattr(v, "as_tuple") else v)
    return df.sort_values(by=list(df.columns), na_position="last").reset_index(drop=True)


_ALL_Q = {**entrymod.queries(), **entrymod.spare_queries()}
_ALL_SQL = {**entrymod.oracle_sql(), **entrymod.spare_oracle_sql()}
ORACLED = sorted(_ALL_SQL)
ROWS_ONLY = sorted(set(_ALL_Q) - set(_ALL_SQL))


def test_registry_within_driver_cap():
    # the driver records at most 50 queries (CORRECTNESS_r02 truncated at
    # exactly 50); anything beyond the cap silently drops out of the gate
    assert len(entrymod.queries()) <= 50
    assert set(entrymod.oracle_sql()) <= set(entrymod.queries())


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    q = _ALL_Q[name]
    got = _normalize(q(spark, SF_DIR).toPandas())
    want = _normalize(ddb.execute(_ALL_SQL[name]).df())
    assert list(got.columns) == list(want.columns), f"{name}: column mismatch"
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            both_nan = g.isna() & w.isna()
            close = np.isclose(g.fillna(0), w.fillna(0), atol=1e-9, rtol=0) | both_nan
            assert close.all(), (
                f"{name}.{c}: max diff "
                f"{(g.fillna(0) - w.fillna(0)).abs().max()}"
            )
            exact = (g.fillna(0) == w.fillna(0)) | both_nan
            assert exact.all(), (
                f"{name}.{c}: values within 1e-9 but NOT bit-exact — the "
                f"driver's value-hash would flag this; tighten rounding"
            )
        else:
            eq = (g == w) | (g.isna() & w.isna())
            assert eq.all(), f"{name}.{c}: first diff at {list(got[~eq].index[:3])}"


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = _ALL_Q[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert "doc_id" in df.columns
