"""§2.5 — window functions (declared capability; the reference's only
window-like computations are its batch partitioner and the F3 lookahead).

Deterministic ordering: every window orders by a unique key suffix so the
hash comparison is stable. Frame sums go through exact decimals.
"""

from __future__ import annotations

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from rag_pipelines_spark.registry import register
from rag_pipelines_spark.queries._util import dec, t


@register(
    "q_window_rank",
    oracle="""
    SELECT o_custkey, o_orderkey,
           ROW_NUMBER() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS rn,
           RANK() OVER (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice DESC, o_orderkey) AS drnk
    FROM orders
    """,
    doc="declared: row_number/rank/dense_rank per customer",
)
def q_window_rank(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


@register(
    "q_window_lead",
    oracle="""
    SELECT event_id, user_id,
           LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS next_type
    FROM events
    """,
    doc="declared: lag/lead per user over event time "
    "(the F3 lookahead is this shape — see queries/text.q_cutoff_sql)",
)
def q_window_lead(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id",
        "user_id",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "q_window_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS sum3
    FROM events
    """,
    doc="declared: sliding rows-frame aggregate (3-row sum, exact decimal)",
)
def q_window_frame(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("sum3"),
    )


@register(
    "q_window_running",
    oracle="""
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
             AS running_value
    FROM events
    """,
    doc="declared: running sum per user (exact decimal)",
)
def q_window_running(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return e.select(
        "event_id",
        "user_id",
        F.sum(dec("value")).over(w).cast("double").alias("running_value"),
    )


@register(
    "q_batch_assign",
    oracle="""
    SELECT doc_id,
           CAST((ROW_NUMBER() OVER (ORDER BY doc_id) - 1) // 10 AS BIGINT)
               AS batch_no
    FROM documents
    """,
    doc="the reference's batch partitioner: record index -> 10-row batch "
    "number (floor(row_number/N)). ref: fda_watcher.py:444-455. At scale "
    "the global row_number becomes a per-partition id + offset scan",
)
def q_batch_assign(spark, sf_dir):
    o = t(spark, sf_dir, "documents")
    w = W.orderBy("doc_id")
    return o.select(
        "doc_id",
        F.floor((F.row_number().over(w) - 1) / 10).alias("batch_no"),
    )
