"""Shared test fixtures: one SparkSession, one DuckDB connection with the
fixture views registered, and the differential compare used by the oracle
tests (mirrors the driver: row count + schema names + order-insensitive
value comparison).
"""

from __future__ import annotations

import os

import duckdb
import pandas as pd
import pytest

from rag_pipelines_spark.io import TABLES
from rag_pipelines_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("rag-pipelines-spark-tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def oracle():
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{SF_DIR}/{name}.parquet'"
        )
    yield con
    con.close()


def canonical(pdf: pd.DataFrame) -> list[tuple]:
    """Canonical order-insensitive row representation.

    Columns sorted by name (driver behavior); every cell rendered to a
    canonical string: floats via repr (full precision — we engineer queries
    to be bitwise deterministic), timestamps via ISO, arrays recursively.
    """
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)

    def cell(v):
        import datetime
        import numpy as np

        if v is None:
            return "<null>"
        if isinstance(v, float):
            if pd.isna(v):
                return "<null>"
            return repr(float(v))
        if isinstance(v, (np.floating,)):
            return repr(float(v))
        if isinstance(v, (np.integer, int, bool)):
            return str(int(v))
        if isinstance(v, (pd.Timestamp, datetime.datetime)):
            return pd.Timestamp(v).isoformat()
        if isinstance(v, (list, tuple, np.ndarray)):
            return "[" + ",".join(cell(x) for x in v) + "]"
        if isinstance(v, bytes):
            return v.hex()
        if v is pd.NaT:
            return "<null>"
        try:
            if pd.isna(v):
                return "<null>"
        except (TypeError, ValueError):
            pass
        return str(v)

    rows = [tuple(cell(v) for v in row) for row in pdf.itertuples(index=False)]
    rows.sort()
    return rows


def assert_df_equal(spark_df, duck_rel, name: str = "?"):
    """Differential assert: schema column names + order-insensitive values."""
    sp = spark_df.toPandas()
    du = duck_rel.df()
    assert sorted(sp.columns) == sorted(du.columns), (
        f"{name}: column mismatch spark={sorted(sp.columns)} duck={sorted(du.columns)}"
    )
    assert len(sp) == len(du), f"{name}: row count spark={len(sp)} duck={len(du)}"
    rs, rd = canonical(sp), canonical(du)
    mismatches = [(a, b) for a, b in zip(rs, rd) if a != b]
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(rs)} rows differ; first 3: {mismatches[:3]}"
    )
