"""Shared helpers for oracle-checked queries.

Determinism contract: any float that reaches a query's output must be
bit-identical between Spark and DuckDB regardless of row/partition order.
The trick used throughout: aggregate through *exact decimals* (associative
and order-independent), cast the final value to double. Per-row scalar
double math (products, divisions of identical inputs) is IEEE-deterministic
already and needs no special handling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_pipelines_spark.io import table


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return table(spark, sf_dir, name)


def dec(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Cast to an exact decimal for order-independent aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent SUM of a double column, returned as double."""
    return F.sum(dec(col, scale, precision)).cast("double")


def davg(col: Column | str, scale: int = 2, precision: int = 18) -> Column:
    """Order-independent AVG: exact decimal sum / count, divided in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, scale, precision)).cast("double") / F.count(c)


# DuckDB-side fragments mirroring the helpers above.
def o_dsum(expr: str, scale: int = 2, precision: int = 18) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"


def o_davg(expr: str, scale: int = 2, precision: int = 18) -> str:
    return (
        f"(CAST(SUM(CAST({expr} AS DECIMAL({precision},{scale}))) AS DOUBLE)"
        f" / COUNT({expr}))"
    )
