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

from rag_pipelines_spark.queries._util import dec_to_dbl, o_davg, o_dec_to_dbl, t
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
           {o_dec_to_dbl("SUM(CAST(l_quantity AS DECIMAL(18,2)))")} AS sum_qty,
           {o_dec_to_dbl("SUM(CAST(l_extendedprice AS DECIMAL(18,2)))")}
               AS sum_base_price,
           {o_dec_to_dbl("SUM(" + _O_DISC.format(p='l_extendedprice', d='l_discount') + ")")}
               AS sum_disc_price,
           {o_dec_to_dbl("SUM(" + _O_CHARGE.format(p='l_extendedprice', d='l_discount', t='l_tax') + ")")}
               AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary (scan + 6-group agg; the canonical "
    "wide-aggregate headliner). Declared extension per SURVEY.md §2.4. "
    "Q1's whole-table groups are the repo's largest decimal sums (17 sig "
    "digits at sf1), so the double conversion uses the split int+frac "
    "form (_util.dec_to_dbl) — a plain decimal->double cast diverges "
    "from DuckDB by 1 ULP there",
)
def q_tpch_q1(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    cnt = F.count("*")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dec_to_dbl(F.sum(_d("l_quantity"))).alias("sum_qty"),
        dec_to_dbl(F.sum(_d("l_extendedprice"))).alias("sum_base_price"),
        dec_to_dbl(F.sum(disc_price())).alias("sum_disc_price"),
        dec_to_dbl(F.sum(charge())).alias("sum_charge"),
        (dec_to_dbl(F.sum(_d("l_quantity"))) / cnt).alias("avg_qty"),
        (dec_to_dbl(F.sum(_d("l_extendedprice"))) / cnt).alias("avg_price"),
        (dec_to_dbl(F.sum(_d("l_discount"))) / cnt).alias("avg_disc"),
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
    SELECT {o_dec_to_dbl("SUM(" + _O_EP_X_DISC.format(p='l_extendedprice', d='l_discount') + ")")}
               AS revenue,
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
        dec_to_dbl(
            F.sum(_d("l_extendedprice") * F.col("l_discount").cast("decimal(3,2)"))
        ).alias("revenue"),
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
    SELECT CAST(100.0 * {o_dec_to_dbl("SUM(CASE WHEN p.p_type = 'PROMO' THEN " + _O_DISC.format(p='l.l_extendedprice', d='l.l_discount') + " ELSE CAST(0 AS DECIMAL(18,2)) END)")}
           / {o_dec_to_dbl("SUM(" + _O_DISC.format(p='l.l_extendedprice', d='l.l_discount') + ")")}
           AS DOUBLE) AS promo_revenue_pct
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
    promo = dec_to_dbl(
        F.sum(F.when(F.col("p_type") == "PROMO", disc_price()).otherwise(zero))
    )
    total = dec_to_dbl(F.sum(disc_price()))
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


# ---------------------------------------------------------------------------
# Round 2: the remaining TPC-H shapes — the full 22-query surface, each
# adapted to the fixture star schema (no partsupp/commitdate/receiptdate/
# shipmode/container/phone/comment columns — FIXTURES.md). The "supply"
# relation (Q2/Q11/Q16/Q20) is derived from lineitem's distinct
# (l_partkey, l_suppkey) pairs; text-comment filters become acctbal or
# name-prefix filters with the same selectivity role. Plan shapes are the
# canonical ones: decorrelated min/avg subqueries (Q2/Q17), outer-join
# distribution (Q13), scalar-subquery having (Q11), view+max join-back
# (Q15), exists/not-exists chains (Q21), nested semi-joins (Q20).
# ---------------------------------------------------------------------------


@register(
    "q_tpch_q2",
    oracle=f"""
    WITH supply AS (
        SELECT l_partkey, l_suppkey,
               MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS offer
        FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eligible AS (
        SELECT sp.l_partkey, sp.l_suppkey, sp.offer
        FROM supply sp
        JOIN supplier s ON sp.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        WHERE r.r_name = 'EUROPE'
    ),
    best AS (
        SELECT l_partkey, MIN(offer) AS min_offer
        FROM eligible GROUP BY l_partkey
    )
    SELECT s.s_acctbal, s.s_name, n.n_name, p.p_partkey,
           CAST(e.offer AS DOUBLE) AS min_cost
    FROM part p
    JOIN best b ON p.p_partkey = b.l_partkey
    JOIN eligible e ON e.l_partkey = b.l_partkey AND e.offer = b.min_offer
    JOIN supplier s ON e.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size = 15 AND p.p_type = 'SMALL'
    """,
    doc="TPC-H Q2 minimum-cost supplier: the decorrelated correlated-MIN "
    "subquery — per-part min offer (exact decimal, so the join-back "
    "equality is safe), join back to recover the achieving suppliers. "
    "Supply relation derived from lineitem (fixture has no partsupp); "
    "region filter + part filters as canonical",
)
def q_tpch_q2(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    p = (
        t(spark, sf_dir, "part")
        .filter((F.col("p_size") == 15) & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    supply = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(_d("l_extendedprice")).alias("offer")
    )
    eligible = (
        supply.join(s, supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("l_partkey", "l_suppkey", "offer")
    )
    best = eligible.groupBy("l_partkey").agg(F.min("offer").alias("min_offer"))
    # second supplier/nation use: rename keys so the self-join is unambiguous
    s2 = s.select(
        F.col("s_suppkey").alias("s2_suppkey"), "s_name", "s_acctbal",
        F.col("s_nationkey").alias("s2_nationkey"),
    )
    n2 = n.select(F.col("n_nationkey").alias("n2_nationkey"), "n_name")
    e = eligible.alias("e")
    b = best.alias("b")
    return (
        e.join(b, (F.col("e.l_partkey") == F.col("b.l_partkey"))
               & (F.col("e.offer") == F.col("b.min_offer")))
        .join(F.broadcast(p), F.col("e.l_partkey") == p.p_partkey)
        .join(s2, F.col("e.l_suppkey") == F.col("s2_suppkey"))
        .join(F.broadcast(n2), F.col("s2_nationkey") == F.col("n2_nationkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey",
            F.col("e.offer").cast("double").alias("min_cost"),
        )
    )


@register(
    "q_tpch_q7",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(SUM({_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')})
               AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY sn.n_name, cn.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 volume shipping between two nations: double-role nation "
    "dim (supplier side + customer side, both broadcast), disjunctive "
    "nation-pair predicate, group by year",
)
def q_tpch_q7(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = t(spark, sf_dir, "orders")
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_name").alias("cust_nation"))
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | (
        (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation",
                 F.year("l_shipdate").cast("bigint").alias("l_year"))
        .agg(F.sum(disc_price()).cast("double").alias("revenue"))
    )


@register(
    "q_tpch_q8",
    oracle=f"""
    WITH vol AS (
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
               {_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')}
                   AS volume,
               sn.n_name AS supp_nation
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        JOIN region r ON cn.n_regionkey = r.r_regionkey
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation sn ON s.s_nationkey = sn.n_nationkey
        JOIN part p ON l.l_partkey = p.p_partkey
        WHERE r.r_name = 'AMERICA'
          AND p.p_type = 'ECONOMY'
          AND o.o_orderdate >= TIMESTAMP '1996-01-01'
          AND o.o_orderdate < TIMESTAMP '1998-01-01'
    )
    SELECT o_year,
           {o_dec_to_dbl("SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume ELSE CAST(0 AS DECIMAL(18,2)) END)")}
           / {o_dec_to_dbl("SUM(volume)")} AS mkt_share
    FROM vol
    GROUP BY o_year
    """,
    doc="TPC-H Q8 national market share: eight-relation join (nation twice), "
    "conditional-share division done in double AFTER exact decimal sums so "
    "both engines hit identical IEEE bits (split int+frac conversion — "
    "these are whole-market sums, the >15-digit class that diverged on Q1)",
)
def q_tpch_q8(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    cn = n.select(F.col("n_nationkey").alias("cn_key"),
                  F.col("n_regionkey").alias("cn_region"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"),
                  F.col("n_name").alias("supp_nation"))
    zero = F.lit(0).cast("decimal(18,2)")
    vol = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), c.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_region") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), s.s_nationkey == F.col("sn_key"))
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            disc_price().alias("volume"),
            "supp_nation",
        )
    )
    nat = dec_to_dbl(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_9", F.col("volume")).otherwise(
                zero
            )
        )
    )
    tot = dec_to_dbl(F.sum("volume"))
    return vol.groupBy("o_year").agg((nat / tot).alias("mkt_share"))


@register(
    "q_tpch_q9",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS o_year,
           CAST(CAST(SUM(
               100 * {_O_DISC.format(p='l.l_extendedprice', d='l.l_discount')}
               - CAST(p.p_retailprice AS DECIMAL(18,2))
                 * CAST(l.l_quantity AS DECIMAL(18,2))
           ) AS DOUBLE) / 100.0 AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q9 product-type profit: cost term adapted to "
    "p_retailprice*qty/100 (no ps_supplycost in fixture). The /100 happens "
    "in double AFTER the exact decimal sum (sum of 100*revenue - cost "
    "units), keeping the aggregate order-independent",
)
def q_tpch_q9(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%red%"))
        .select("p_partkey", "p_retailprice")
    )
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    amount100 = F.lit(100) * disc_price() - _d("p_retailprice") * _d("l_quantity")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("l_shipdate").cast("bigint").alias("o_year"),
        )
        .agg((F.sum(amount100).cast("double") / F.lit(100.0)).alias("profit"))
    )


@register(
    "q_tpch_q11",
    oracle="""
    WITH val AS (
        SELECT l.l_partkey,
               SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS value
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        WHERE s.s_acctbal > 0.0
        GROUP BY l.l_partkey
    ),
    tot AS (SELECT SUM(value) AS total FROM val)
    SELECT v.l_partkey, CAST(v.value AS DOUBLE) AS value
    FROM val v, tot
    WHERE v.value * 1400 > tot.total
    """,
    doc="TPC-H Q11 important stock: per-part value vs a global-total scalar "
    "subquery — the HAVING-against-aggregate shape. Threshold compare is "
    "value*1400 > total in exact decimals (no division, no driver scalar: "
    "the 1-row total rides a broadcast crossJoin). Supply value adapted to "
    "lineitem revenue through positive-balance suppliers (no partsupp)",
)
def q_tpch_q11(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0.0)
    val = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("l_partkey")
        .agg(F.sum(_d("l_extendedprice")).alias("_value"))
    )
    tot = F.broadcast(val.agg(F.sum("_value").alias("_total")))
    return (
        val.crossJoin(tot)
        .filter(F.col("_value") * 1400 > F.col("_total"))
        .select("l_partkey", F.col("_value").cast("double").alias("value"))
    )


@register(
    "q_tpch_q13",
    oracle="""
    WITH percust AS (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN (SELECT * FROM orders
                   WHERE o_orderpriority <> '1-URGENT') o
               ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM percust
    GROUP BY c_count
    """,
    doc="TPC-H Q13 customer order-count distribution: left-outer join that "
    "must KEEP no-order customers (count(o_orderkey) counts non-null only), "
    "then a second agg over the first — the two-level distribution shape. "
    "Comment-pattern filter adapted to an orderpriority exclusion",
)
def q_tpch_q13(spark, sf_dir):
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    percust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return percust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q_tpch_q15",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_O_DISC.format(p='l_extendedprice', d='l_discount')})
                   AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name,
           CAST(r.total_revenue AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    doc="TPC-H Q15 top supplier: revenue view + scalar-MAX join-back. The "
    "max equality is over the exact decimal sum, so join-back equality is "
    "safe (a double max would tie-break nondeterministically); the 1-row "
    "max is broadcast, never collected",
)
def q_tpch_q15(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    s = t(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(disc_price()).alias("_rev")
    )
    best = F.broadcast(revenue.agg(F.max("_rev").alias("_best")))
    return (
        revenue.crossJoin(best)
        .filter(F.col("_rev") == F.col("_best"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            "s_suppkey", "s_name", F.col("_rev").cast("double").alias("total_revenue")
        )
    )


@register(
    "q_tpch_q16",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT ps.l_suppkey) AS supplier_cnt
    FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) ps
    JOIN part p ON ps.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND ps.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 supplier-relationship count: distinct part-supplier "
    "pairs (lineitem-derived), NOT-IN anti-join against the excluded "
    "supplier set (acctbal<0 adapts the complaints-comment filter), "
    "count-distinct per part attribute group",
)
def q_tpch_q16(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey").distinct()
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0).select(
        "s_suppkey"
    )
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q_tpch_q17",
    oracle="""
    WITH stats AS (
        SELECT l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
               COUNT(*) AS cnt
        FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)))
               AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN stats st ON l.l_partkey = st.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'SMALL'
      AND CAST(l.l_quantity AS DECIMAL(18,2)) * st.cnt * 5 < st.sum_qty
    """,
    doc="TPC-H Q17 small-quantity revenue: the correlated AVG subquery, "
    "decorrelated to a per-part stats agg + join-back. The qty<0.2*avg "
    "predicate is cross-multiplied (qty*cnt*5 < sum) so the comparison "
    "stays in exact decimals — no division, no float tie ambiguity",
)
def q_tpch_q17(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    ).select("p_partkey")
    stats = li.groupBy(F.col("l_partkey").alias("st_partkey")).agg(
        F.sum(_d("l_quantity")).alias("sum_qty"), F.count("*").alias("cnt")
    )
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .join(stats, li.l_partkey == F.col("st_partkey"))
        .filter(_d("l_quantity") * F.col("cnt") * 5 < F.col("sum_qty"))
        .agg(
            (F.sum(_d("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly")
        )
    )


@register(
    "q_tpch_q20",
    oracle="""
    WITH qty96 AS (
        SELECT l_partkey, l_suppkey,
               SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_ps
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_partkey, l_suppkey
    ),
    part_tot AS (
        SELECT l_partkey, SUM(qty_ps) AS qty_p FROM qty96 GROUP BY l_partkey
    ),
    excess AS (
        SELECT q.l_suppkey
        FROM qty96 q
        JOIN part_tot pt ON q.l_partkey = pt.l_partkey
        WHERE q.qty_ps * 4 > pt.qty_p
          AND q.l_partkey IN
              (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_acctbal > 0.0
      AND s.s_suppkey IN (SELECT l_suppkey FROM excess)
    """,
    doc="TPC-H Q20 potential part promotion: nested semi-join chain — "
    "suppliers holding >25% of a part's 1996 volume (availqty adaptation; "
    "exact-decimal cross-multiplied threshold), parts filtered by name "
    "prefix, supplier filter on balance (nation-comment adaptation)",
)
def q_tpch_q20(spark, sf_dir):
    li96 = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    qty96 = li96.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(_d("l_quantity")).alias("qty_ps")
    )
    part_tot = qty96.groupBy(F.col("l_partkey").alias("pt_partkey")).agg(
        F.sum("qty_ps").alias("qty_p")
    )
    small = (
        t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("small%"))
        .select("p_partkey")
    )
    excess = (
        qty96.join(part_tot, qty96.l_partkey == F.col("pt_partkey"))
        .filter(F.col("qty_ps") * 4 > F.col("qty_p"))
        .join(F.broadcast(small), qty96.l_partkey == small.p_partkey, "left_semi")
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") > 0.0)
    return (
        s.join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
    )


@register(
    "q_tpch_q21",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s.s_name
    """,
    doc="TPC-H Q21 suppliers who kept orders waiting: the EXISTS + "
    "NOT-EXISTS pair over self-aliased lineitem (semi-join then anti-join, "
    "both equi on l_orderkey with a suppkey<> residual — never a "
    "cartesian). Late-delivery predicate adapted to returnflag='R'",
)
def q_tpch_q21(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey"
    )
    l1 = li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_suppkey"
    ).alias("l1")
    l2 = li.select(
        F.col("l_orderkey").alias("l2_orderkey"),
        F.col("l_suppkey").alias("l2_suppkey"),
    ).alias("l2")
    l3 = li.filter(F.col("l_returnflag") == "R").select(
        F.col("l_orderkey").alias("l3_orderkey"),
        F.col("l_suppkey").alias("l3_suppkey"),
    ).alias("l3")
    waiting = (
        l1.join(o, F.col("l1.l_orderkey") == o.o_orderkey, "left_semi")
        .join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3_suppkey")),
            "left_anti",
        )
    )
    return (
        waiting.join(s, F.col("l1.l_suppkey") == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
    )
