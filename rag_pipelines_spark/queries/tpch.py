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


# ---------------------------------------------------------------------------
# Wider TPC-H-shaped coverage (adapted to the fixture schema: no
# commitdate/receiptdate/shipmode/phone/partsupp — FIXTURES.md). Each keeps
# the canonical plan shape; money math stays in exact decimals.
# ---------------------------------------------------------------------------

_O_EP_X_DISC = (
    "CAST({p} AS DECIMAL(18,2)) * CAST({d} AS DECIMAL(3,2))"
)


@register(
    "q_tpch_q6",
    oracle=f"""
    SELECT CAST(SUM({_O_EP_X_DISC.format(p='l_extendedprice', d='l_discount')})
               AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      AND l_shipdate < TIMESTAMP '1997-01-01'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast-revenue change: the pure scan-and-sum headliner "
    "— every predicate pushes into the parquet scan, zero joins, one "
    "partial+final agg. The canonical 'is your scan path fast' probe",
)
def q_tpch_q6(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_d("l_extendedprice") * F.col("l_discount").cast("decimal(3,2)"))
        .cast("double")
        .alias("revenue"),
        F.count("*").alias("n_items"),
    )


@register(
    "q_tpch_q4",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-01-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 order-priority check (EXISTS -> left-semi join; adapted: "
    "the commitdate<receiptdate predicate becomes returnflag='R', same "
    "semi-join plan shape)",
)
def q_tpch_q4(spark, sf_dir):
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "q_tpch_q10",
    oracle=f"""
    SELECT c.c_custkey,
           c.c_name,
           n.n_name,
           CAST(SUM({_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')})
               AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-07-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned-item reporting: fact join + broadcast nation + "
    "deterministic top-20 (TakeOrderedAndProject)",
)
def q_tpch_q10(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@register(
    "q_tpch_q12",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 priority shipping split (adapted: shipmode -> "
    "returnflag); conditional-count pivot inside one agg pass",
)
def q_tpch_q12(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(is_high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~is_high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q_tpch_q14",
    oracle=f"""
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                    THEN {_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')}
                    ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
           / CAST(SUM({_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')})
                 AS DOUBLE) AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1997-04-01'
    """,
    doc="TPC-H Q14 promotion effect: conditional/total ratio in one agg; "
    "part side is broadcastable after pruning to (partkey, type)",
)
def q_tpch_q14(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = t(spark, sf_dir, "part").select("p_partkey", "p_type")
    zero = F.lit(0).cast("decimal(18,2)")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero)
    ).cast("double")
    total = F.sum(disc_price()).cast("double")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg((F.lit(100.0) * promo / total).alias("promo_revenue_pct"))
    )


@register(
    "q_tpch_q18",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
               AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, b.total_qty
    FROM big b
    JOIN orders o ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    ORDER BY b.total_qty DESC, o.o_orderkey
    LIMIT 25
    """,
    doc="TPC-H Q18 large-volume customers: agg-then-join (the HAVING "
    "pre-aggregation shrinks the fact side before any join) + top-25",
)
def q_tpch_q18(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(_d("l_quantity")).alias("_q"))
        .filter(F.col("_q") > 300)
        .select("l_orderkey", F.col("_q").cast("double").alias("total_qty"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "o_orderkey", "o_orderdate", "total_qty")
        .orderBy(F.col("total_qty").desc(), F.col("o_orderkey"))
        .limit(25)
    )


@register(
    "q_tpch_q19",
    oracle=f"""
    SELECT CAST(SUM({_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')})
               AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 5 AND 30)
    """,
    doc="TPC-H Q19 discounted revenue: disjunctive mixed-side predicate — "
    "Catalyst extracts the common equi-key (partkey) so it stays a hash "
    "join with a residual OR filter, never a cartesian",
)
def q_tpch_q19(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(5, 30)
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.sum(disc_price()).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q_tpch_q22",
    oracle="""
    WITH stats AS (
        SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DECIMAL(38,2))
                   AS total,
               COUNT(*) AS cnt
        FROM customer WHERE c_acctbal > 0.0
    ),
    urgent AS (
        SELECT DISTINCT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT c.c_nationkey,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c, stats s
    WHERE CAST(c.c_acctbal AS DECIMAL(18,2)) * s.cnt > s.total
      AND NOT EXISTS (SELECT 1 FROM urgent u WHERE u.o_custkey = c.c_custkey)
    GROUP BY c.c_nationkey
    """,
    doc="TPC-H Q22 global-sales opportunity (adapted: phone-prefix filter "
    "dropped, NOT EXISTS = no urgent orders). The above-average predicate "
    "is computed WITHOUT division: acctbal*count > sum compares exact "
    "decimals, so Spark and DuckDB agree bitwise and no scalar ever hits "
    "the driver (broadcast 1-row crossJoin, anti-join for NOT EXISTS)",
)
def q_tpch_q22(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    stats = F.broadcast(
        c.filter(F.col("c_acctbal") > 0.0).agg(
            F.sum(_d("c_acctbal")).cast("decimal(38,2)").alias("_total"),
            F.count("*").alias("_cnt"),
        )
    )
    urgent = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = (
        c.crossJoin(stats)
        .filter(_d("c_acctbal") * F.col("_cnt") > F.col("_total"))
        .join(urgent, c.c_custkey == urgent.o_custkey, "left_anti")
    )
    return rich.groupBy("c_nationkey").agg(
        F.count("*").alias("numcust"),
        F.sum(_d("c_acctbal")).cast("double").alias("totacctbal"),
    )
