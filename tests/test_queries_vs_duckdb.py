"""Mirror of the driver's correctness gate: every queries() entry with an
oracle_sql() twin must match DuckDB on row count, schema (column names) and
values (order-insensitive)."""

from __future__ import annotations

import math

import pandas as pd
import pytest

from mannheimsearchjoinsengine_spark.driver_contract import build_contract
from tests.conftest import TEST_SF_DIR

QUERIES, ORACLES = build_contract(TEST_SF_DIR)
PAIRED = sorted(ORACLES.keys())
ROWS_ONLY = sorted(set(QUERIES) - set(ORACLES))


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", PAIRED)
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir).toPandas()
    odf = duck.execute(ORACLES[name]).df()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} vs oracle {len(odf)}"
    assert sorted(sdf.columns) == sorted(odf.columns), (
        f"{name}: cols {sorted(sdf.columns)} vs {sorted(odf.columns)}"
    )
    a, b = _canon(sdf), _canon(odf)
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]):
            mism = [
                (x, y)
                for x, y in zip(a[c], b[c])
                if not (
                    (math.isnan(x) and math.isnan(y)) or x == y
                )
            ]
            assert not mism, f"{name}.{c}: {len(mism)} float mismatches, first {mism[:3]}"
        else:
            mism = (a[c] != b[c])
            assert not mism.any(), (
                f"{name}.{c}: {int(mism.sum())} mismatches, first "
                f"{list(zip(a[c][mism][:3], b[c][mism][:3]))}"
            )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
