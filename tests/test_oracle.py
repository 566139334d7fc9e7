"""Differential correctness harness (SURVEY.md §5.1): runs every
registered query on Spark and its oracle on DuckDB over the same
parquet, then compares row count + column names + an order-insensitive
canonical multiset of rows — mirroring the driver's t2 gate.
"""

from __future__ import annotations

import datetime
import decimal
import math

import numpy as np
import pandas as pd
import pytest

from lsd_spark.registry import ORACLES, QUERIES, ROWS_ONLY, load_all
from tests.conftest import SF_DIR

load_all()


def canon_cell(v):
    if v is None:
        return None
    if isinstance(v, (np.floating, float)):
        f = float(v)
        if math.isnan(f):
            return "NaN"
        return repr(f)
    if isinstance(v, (np.bool_, bool)):
        return bool(v)
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    if v is pd.NaT:
        return None
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple, np.ndarray)):
        return tuple(canon_cell(x) for x in v)
    return v


def canon_rows(pdf: pd.DataFrame):
    cols = sorted(pdf.columns)
    rows = [tuple(canon_cell(r) for r in row) for row in pdf[cols].itertuples(index=False)]
    rows.sort(key=repr)
    return cols, rows


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    ddf = duck.sql(ORACLES[name]).df()
    scols, srows = canon_rows(sdf)
    dcols, drows = canon_rows(ddf)
    assert scols == dcols, f"{name}: column mismatch spark={scols} duck={dcols}"
    assert len(srows) == len(drows), f"{name}: rowcount spark={len(srows)} duck={len(drows)}"
    if srows != drows:
        diffs = [(s, d) for s, d in zip(srows, drows) if s != d][:5]
        raise AssertionError(f"{name}: value mismatch, first diffs: {diffs}")


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only(name, spark):
    df = QUERIES[name](spark, SF_DIR)
    n = df.count()
    assert n >= 0
    assert len(df.columns) > 0
