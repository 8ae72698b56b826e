"""Central query registry — the driver contract behind __spark_entry__.py.

Every operator from SURVEY.md §2 registers here with:
  * ``fn(spark, sf_dir) -> DataFrame`` — the PySpark implementation,
  * ``oracle`` — an equivalent DuckDB SQL string over the pre-registered
    fixture views (``None`` for genuinely non-SQL-expressible operators →
    the driver records the weaker rows-only check).

Column names are aliased identically on both sides (the driver sorts
columns by name before value-hashing). Float outputs are made *bitwise*
deterministic by summing through exact decimals (order-independent) and
casting the final value to double — both engines then produce identical
IEEE-754 bits regardless of partition/row order.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None => rows-only check
    doc: str = ""  # reference citation / rationale


REGISTRY: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn

    return deco


def load_all() -> dict[str, Query]:
    """Import every query module (side effect: fills REGISTRY)."""
    from rag_pipelines_spark.queries import (  # noqa: F401
        aggregates,
        extensions,
        joins,
        relational,
        sources,
        streaming,
        text,
        tpch,
        windows,
    )

    return REGISTRY
