"""§2.4 — aggregations (A1-A7 + declared built-in extensions).

All Spark aggregations get map-side partial aggregation for free
(HashAggregate partial→final); float sums go through exact decimals so
results are order-independent (see _util).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_pipelines_spark.registry import register
from rag_pipelines_spark.queries._util import davg, dsum, o_davg, o_dsum, t

# ---------------------------------------------------------------------------
# A1 — count / conditional count / success-rate
# ref: fda_watcher.py:433-437,470-497,512,566
# ---------------------------------------------------------------------------


@register(
    "q_agg_rates",
    oracle="""
    SELECT COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_ok,
           CAST(SUM(CASE WHEN event_type <> 'error' THEN 1 ELSE 0 END) AS DOUBLE)
             * 100.0 / COUNT(*) AS success_rate_pct
    FROM events
    """,
    doc="A1 conditional counts + rate. ref: fda_watcher.py:433-437,512,566",
)
def q_agg_rates(spark, sf_dir):
    e = t(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    return e.agg(
        F.count("*").alias("n_total"),
        F.sum(is_err).alias("n_error"),
        F.sum(1 - is_err).alias("n_ok"),
        (F.sum(1 - is_err).cast("double") * 100.0 / F.count("*")).alias(
            "success_rate_pct"
        ),
    )


# ---------------------------------------------------------------------------
# A2 — group-count (objects per source)
# ref: fda…/combine_json_to_jsonl.py:229,265-266
# ---------------------------------------------------------------------------


@register(
    "q_group_count",
    oracle="SELECT source, COUNT(*) AS n FROM documents GROUP BY source",
    doc="A2 group-count. ref: fda…/combine_json_to_jsonl.py:229,265-266",
)
def q_group_count(spark, sf_dir):
    return t(spark, sf_dir, "documents").groupBy("source").agg(F.count("*").alias("n"))


# ---------------------------------------------------------------------------
# A3 — multi-stat single-pass summary
# ref: pdf_marker_extraction.py:351-378; pubmed_enrichment.py:335-355
# ---------------------------------------------------------------------------


@register(
    "q_agg_summary",
    oracle=f"""
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT l_orderkey) AS n_orders,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
    doc="A3 multi-stat summary. ref: pdf_marker_extraction.py:351-378. The "
    "distinct count runs as its OWN branch (distinct -> count, i.e. "
    "partial-dedup per partition then a key-distributed exchange of the "
    "key column only): folding countDistinct into the same agg makes "
    "Spark Expand every row x2 and shuffle the full-width expanded set — "
    "measured 33x (not ~10x) when sf10 bench data is 10x sf1. The two "
    "1-row branches recombine with a broadcast cross join",
)
def q_agg_summary(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    stats = li.agg(
        F.count("*").alias("n_rows"),
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )
    # count(col), not count(*): SQL COUNT(DISTINCT k) excludes NULLs, and
    # distinct() keeps one NULL row that count(*) would include
    n_orders = (
        li.select("l_orderkey")
        .distinct()
        .agg(F.count("l_orderkey").alias("n_orders"))
    )
    return stats.crossJoin(F.broadcast(n_orders)).select(
        "n_rows", "n_orders", "sum_qty", "sum_price", "min_ship", "max_ship"
    )


# ---------------------------------------------------------------------------
# A4 — rollup totals across groups
# ref: fda…/combine_json_to_jsonl.py:327-359 (accumulated all_stats)
# ---------------------------------------------------------------------------


@register(
    "q_rollup_source",
    oracle="""
    SELECT COALESCE(source, '<all>') AS source,
           COALESCE(lang, '<all>') AS lang,
           COUNT(*) AS n
    FROM documents
    GROUP BY ROLLUP (source, lang)
    """,
    doc="A4 rollup (subtotals + grand total). ref: fda…/combine_json_to_jsonl.py:327-359",
)
def q_rollup_source(spark, sf_dir):
    return (
        t(spark, sf_dir, "documents")
        .rollup("source", "lang")
        .agg(F.count("*").alias("n"))
        .select(
            F.coalesce("source", F.lit("<all>")).alias("source"),
            F.coalesce("lang", F.lit("<all>")).alias("lang"),
            "n",
        )
    )


# ---------------------------------------------------------------------------
# A5 — max-by / argmax
# ref: fda_watcher.py:179-182 (div with most <p>); json_split_and_clean.py:363-371
# ---------------------------------------------------------------------------


@register(
    "q_max_by",
    oracle="""
    SELECT source,
           MAX_BY(doc_id, n_chars * 1000000 + doc_id) AS biggest_doc,
           MAX(n_chars) AS max_chars
    FROM documents
    GROUP BY source
    """,
    doc="A5 max_by (tie-broken by doc_id for determinism). ref: fda_watcher.py:179-182",
)
def q_max_by(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    rank_key = F.col("n_chars") * 1000000 + F.col("doc_id")
    return d.groupBy("source").agg(
        F.max_by("doc_id", rank_key).alias("biggest_doc"),
        F.max("n_chars").alias("max_chars"),
    )


# ---------------------------------------------------------------------------
# A6 — distinct key-set
# ref: fda_watcher.py:399 (set(df_master['RAG_ID']))
# ---------------------------------------------------------------------------


@register(
    "q_distinct",
    oracle="SELECT DISTINCT lang, source FROM documents",
    doc="A6 distinct key-set. ref: fda_watcher.py:399",
)
def q_distinct(spark, sf_dir):
    return t(spark, sf_dir, "documents").select("lang", "source").distinct()


# ---------------------------------------------------------------------------
# A7 — exact dedup by fingerprint (deterministic representative = min doc_id)
# ref: fda_watcher.py:86-93,327-329 (md5 RAG_ID dedup)
# ---------------------------------------------------------------------------


@register(
    "q_dedup_exact",
    oracle="""
    SELECT md5(text) AS fingerprint,
           MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
    doc="A7 exact dedup via md5 fingerprint. ref: fda_watcher.py:86-93,327-329",
)
def q_dedup_exact(spark, sf_dir):
    d = t(spark, sf_dir, "documents")
    return (
        d.withColumn("fingerprint", F.md5("text"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
    )


# ---------------------------------------------------------------------------
# Declared built-ins (not in reference; capability parity per SURVEY §2.4)
# ---------------------------------------------------------------------------


@register(
    "q_agg_stats",
    oracle=f"""
    SELECT l_returnflag,
           COUNT(*) AS n,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_davg('l_quantity')} AS avg_qty,
           MIN(l_quantity) AS min_qty,
           MAX(l_quantity) AS max_qty,
           {o_davg('l_extendedprice')} AS avg_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="declared: avg/min/max grouped stats (TPC-H Q1 shape)",
)
def q_agg_stats(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_quantity").alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        davg("l_extendedprice").alias("avg_price"),
    )


@register(
    "q_count_distinct",
    oracle="""
    SELECT COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem
    """,
    doc="declared: exact distinct counts — one distributed distinct branch "
    "per key (each shuffles only its pre-deduped key column) instead of "
    "a multi-distinct Expand x3 of the full scan (see q_agg_summary)",
)
def q_count_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")

    def dcount(col, alias):
        # count(col) after distinct(): COUNT(DISTINCT k) semantics (NULL
        # excluded), which count(*) would break on a null key
        return li.select(col).distinct().agg(F.count(col).alias(alias))

    return (
        dcount("l_partkey", "n_parts")
        .crossJoin(F.broadcast(dcount("l_suppkey", "n_supps")))
        .crossJoin(F.broadcast(li.agg(F.count("*").alias("n_rows"))))
    )


@register(
    "q_approx_distinct",
    oracle=None,  # HLL sketches differ across engines → rows-only check
    doc="declared: approx_count_distinct (HLL++); engine-specific sketch",
)
def q_approx_distinct(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
    )


@register(
    "q_cube",
    oracle=f"""
    SELECT COALESCE(l_returnflag, '<all>') AS l_returnflag,
           COALESCE(l_linestatus, '<all>') AS l_linestatus,
           COUNT(*) AS n,
           {o_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    doc="declared: grouping sets / cube",
)
def q_cube(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("<all>")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("<all>")).alias("l_linestatus"),
            "n",
            "sum_qty",
        )
    )


@register(
    "q_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {o_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS qty_O,
           {o_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS qty_F
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="declared: pivot (groupBy.pivot == conditional aggregation)",
)
def q_pivot(spark, sf_dir):
    from rag_pipelines_spark.queries._util import dec

    li = t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )


@register(
    "q_selective_agg",
    oracle=f"""
    SELECT {o_dsum("l_extendedprice * CAST(l_discount AS DECIMAL(18,2))", 4, 25)}
               AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01'
      AND l_shipdate < TIMESTAMP '1995-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    doc="declared: TPC-H Q6 shape — selective range predicates + single agg; "
    "exercises predicate pushdown into the parquet scan",
)
def q_selective_agg(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    filtered = li.filter(
        (F.col("l_shipdate") >= "1994-01-01")
        & (F.col("l_shipdate") < "1995-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    revenue = (
        F.col("l_extendedprice") * F.col("l_discount").cast("decimal(18,2)")
    ).cast("decimal(25,4)")
    return filtered.agg(
        F.sum(revenue).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q_percentiles",
    oracle="""
    SELECT l_returnflag,
           quantile_cont(l_quantity, 0.5) AS median_qty,
           quantile_cont(l_quantity, 0.9) AS p90_qty,
           quantile_cont(l_extendedprice, 0.5) AS median_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="declared: exact percentiles (sort-based linear interpolation — "
    "identical order stats both engines; approx variant is engine-specific "
    "and lives in q_approx_distinct's rows-only tier)",
)
def q_percentiles(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.9).alias("p90_qty"),
        F.percentile("l_extendedprice", 0.5).alias("median_price"),
    )


@register(
    "q_heavy_hitters",
    oracle="""
    SELECT user_id, COUNT(*) AS n
    FROM events
    GROUP BY user_id
    HAVING COUNT(*) > 75
    """,
    doc="exact heavy-hitter audit (keys above a frequency threshold) — the "
    "pre-flight skew probe for choosing salting / AQE skew-join handling "
    "on a key (operators/skew.py); map-side partial agg keeps the shuffle "
    "at one row per key per partition",
)
def q_heavy_hitters(spark, sf_dir):
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > 75)
    )


@register(
    "q_salted_agg",
    oracle="""
    SELECT l_returnflag, COUNT(*) AS n
    FROM lineitem
    GROUP BY l_returnflag
    """,
    doc="two-stage salted aggregation == plain GROUP BY (the skew "
    "mitigation's correctness proof as an oracle check): stage 1 groups "
    "on (key, salt) spreading any hot key over salt_buckets reducers, "
    "stage 2 merges partials on the key alone — operators/skew.py",
)
def q_salted_agg(spark, sf_dir):
    from rag_pipelines_spark.operators.skew import salted_count

    li = t(spark, sf_dir, "lineitem")
    return salted_count(li, ["l_returnflag"], salt_buckets=16)
