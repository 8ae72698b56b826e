"""Differential tests: every registered query vs its DuckDB oracle.

This mirrors the driver's t2 gate (row count + schema + order-insensitive
values) at sf0.01. Rows-only queries (oracle=None) are executed and must
return a stable schema and >= 0 rows without error.
"""

from __future__ import annotations

import pytest

from rag_pipelines_spark.registry import load_all
from tests.conftest import SF_DIR, assert_df_equal

REGISTRY = load_all()

HASH_CHECKED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in REGISTRY.items() if q.oracle is None)


@pytest.mark.parametrize("name", HASH_CHECKED)
def test_oracle_match(spark, oracle, name):
    q = REGISTRY[name]
    spark_df = q.fn(spark, SF_DIR)
    duck_rel = oracle.sql(q.oracle)
    assert_df_equal(spark_df, duck_rel, name)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_DIR)
    assert df.columns, f"{name}: empty schema"
    assert df.count() >= 0


def test_registry_names_are_wired():
    """Every query's registered name must match its oracle_sql key set."""
    assert REGISTRY, "registry is empty"
    for name, q in REGISTRY.items():
        assert name == q.name
