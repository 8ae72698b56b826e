"""TPC-H-shaped headline queries over the synthetic fixture tables.

The reference has no analytical query surface (SURVEY.md §2.4 "not
present — declared"); these are the capability-parity OLAP headliners the
engine must run well at 100 TB: wide scan+agg (Q1), selective multi-way
join + top-k (Q3), and a six-table star join with co-located dimension
filters (Q5, adapted to the fixture schema — no shippriority/commitdate
columns, see FIXTURES.md).

Determinism: all money arithmetic runs in *exact decimals* end-to-end
(price, discount, tax are 2-decimal values, exactly representable as
decimal(18,2)), so Spark and DuckDB compute the identical rational sum and
cast it to the identical double — bitwise order-independent (see
queries/_util.py).

Scale notes (100 TB):
  * Q1 is a pure scan+partial-agg — no shuffle beyond the 6-group final
    agg; predicate and the 7-column projection push into the parquet scan.
  * Q3/Q5 join lineitem (the fact) to dimensions; nation/region are
    constant-size => explicit broadcast; customer/supplier/orders are left
    to AQE, which downgrades sort-merge to broadcast when the filtered
    side is small (the mktsegment/date filters cut them hard).
  * Top-k uses orderBy(...).limit(k) — Spark's TakeOrderedAndProject
    computes per-partition heaps, never a full sort.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from rag_pipelines_spark.queries._util import o_davg, t
from rag_pipelines_spark.registry import register


def _d(col: str) -> Column:
    return F.col(col).cast("decimal(18,2)")


def _one() -> Column:
    # built lazily: F.lit at import time requires an active SparkContext
    return F.lit(1).cast("decimal(3,2)")

# DuckDB fragments mirroring the exact-decimal arithmetic.
_O_DISC = (
    "CAST({p} AS DECIMAL(18,2)) * "
    "(CAST(1 AS DECIMAL(3,2)) - CAST({d} AS DECIMAL(3,2)))"
)
_O_CHARGE = _O_DISC + " * (CAST(1 AS DECIMAL(3,2)) + CAST({t} AS DECIMAL(3,2)))"


def disc_price() -> Column:
    """l_extendedprice * (1 - l_discount) in exact decimal."""
    return _d("l_extendedprice") * (_one() - _d("l_discount"))


def charge() -> Column:
    """l_extendedprice * (1 - l_discount) * (1 + l_tax) in exact decimal."""
    return disc_price() * (_one() + _d("l_tax"))


@register(
    "q_tpch_q1",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_base_price,
           CAST(SUM({_O_DISC.format(p='l_extendedprice', d='l_discount')})
               AS DOUBLE) AS sum_disc_price,
           CAST(SUM({_O_CHARGE.format(p='l_extendedprice', d='l_discount',
                                      t='l_tax')}) AS DOUBLE) AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary (scan + 6-group agg; the canonical "
    "wide-aggregate headliner). Declared extension per SURVEY.md §2.4",
)
def q_tpch_q1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(_d("l_quantity")).cast("double").alias("sum_qty"),
        F.sum(_d("l_extendedprice")).cast("double").alias("sum_base_price"),
        F.sum(disc_price()).cast("double").alias("sum_disc_price"),
        F.sum(charge()).cast("double").alias("sum_charge"),
        (F.sum(_d("l_quantity")).cast("double") / cnt).alias("avg_qty"),
        (F.sum(_d("l_extendedprice")).cast("double") / cnt).alias("avg_price"),
        (F.sum(_d("l_discount")).cast("double") / cnt).alias("avg_disc"),
        cnt.alias("count_order"),
    )


@register(
    "q_tpch_q3",
    oracle=f"""
    SELECT l.l_orderkey,
           o.o_orderdate,
           CAST(SUM({_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')})
               AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority (selective 3-way join + agg + "
    "deterministic top-k; adapted — fixture has no o_shippriority). "
    "Declared extension per SURVEY.md §2.3/2.6",
)
def q_tpch_q3(spark, sf_dir):
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp")
    )
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "q_tpch_q5",
    oracle=f"""
    SELECT n.n_name,
           CAST(SUM({_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')})
               AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1998-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 local-supplier volume (six-table star join; nation/region "
    "broadcast, fact-side joins left to AQE). Declared extension per "
    "SURVEY.md §2.3",
)
def q_tpch_q5(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT COALESCE(source, '<all>') AS source,
           COALESCE(lang, '<all>') AS lang,
           COUNT(*) AS n
    FROM documents
    GROUP BY GROUPING SETS ((source), (lang))
    """,
    doc="GROUPING SETS ((source),(lang)) — two independent group-bys in one "
    "scan (rollup/cube can't express this pair). Declared extension per "
    "SURVEY.md §2.4",
)
def q_grouping_sets(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .groupingSets([["source"], ["lang"]], "source", "lang")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"),
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "n",
        )
    )
