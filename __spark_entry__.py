"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship ingest-fingerprint-dedup-summarize query
at sf0.001; ``queries()``/``oracle_sql()`` expose the full registry from
``rag_pipelines_spark.queries`` (one entry per implemented operator from
SURVEY.md §2, with DuckDB oracle SQL where the semantics are
SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rag_pipelines_spark.registry import load_all

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's essential dataflow — ingest a document corpus, clean the
    text, fingerprint, dedup, summarize (SURVEY.md §7 phase 1) — as one lazy
    Catalyst plan: projection/filters push into the parquet scan, the dedup
    is a hash aggregate on the fingerprint, the summary is a partial+final
    group-count. No Python in the hot path, no collect.
    """
    from rag_pipelines_spark.functions import (
        collapse_ws,
        strip_md_images,
        unicode_normalize,
    )
    from rag_pipelines_spark.io import table

    docs = table(spark, SMOKE_SF_DIR, "documents")
    cleaned = docs.select(
        "doc_id",
        "source",
        "lang",
        collapse_ws(strip_md_images(unicode_normalize(F.col("text")))).alias("content"),
    ).withColumn("rag_id", F.md5("content"))
    deduped = (
        cleaned.filter(F.length("content") > 50)
        .groupBy("rag_id")
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.first("source").alias("source"),
            F.first("lang").alias("lang"),
            F.first(F.length("content")).alias("content_len"),
        )
    )
    return (
        deduped.groupBy("source", "lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("content_len").alias("total_chars"),
        )
        .orderBy("source", "lang")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every hash-checkable query."""
    return {name: q.oracle for name, q in load_all().items() if q.oracle is not None}
