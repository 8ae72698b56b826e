"""Warehouse-lifecycle extensions: SCD2 dimension versioning, cohort
retention, and schema-evolution reads.

The reference maintains exactly one "current" row per record id in its
master state (fda_watcher.py keeps the Excel master as latest-only and
re-derives deltas per run). At warehouse scale the standard upgrade is
type-2 history — keep every version with a validity interval — plus the
cohort rollups analysts run on the resulting timelines, plus tolerating
the schema drift that N years of appended batches always accumulate.
All three are pure DataFrame formulations:

* SCD2 builds versions with two windows that SHARE one (user) partition
  sort — one shuffle total, no self-join against history (the naive
  MERGE formulation rewrites the whole dimension per batch).
* Cohort retention is two hash aggregates and one equi-join on user_id.
* Schema evolution uses parquet mergeSchema for the demo read; the
  scale posture (see docstring) is an explicit unified schema, because
  mergeSchema footer-samples every file at planning time.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_pipelines_spark.registry import register
from rag_pipelines_spark.queries._util import md5_long_digest, t

# ---------------------------------------------------------------------------
# SCD2 — type-2 slowly-changing dimension from a change/event stream
# ref: fda_watcher.py:397-416 keeps latest-only master state; this is the
# history-preserving upgrade of that same dataflow.
# ---------------------------------------------------------------------------


@register(
    "q_scd2_versions",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_attr
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_attr IS NULL OR prev_attr <> event_type
    )
    SELECT user_id,
           event_type AS attr,
           ts AS valid_from,
           lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) AS valid_to,
           CAST(CASE WHEN lead(ts) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
           ) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
    FROM changes
    """,
    doc="SCD2 dimension versioning: collapse an event stream into type-2 "
    "version rows (attr, valid_from, valid_to, is_current) via "
    "lag-change-detect + lead-close — two windows sharing ONE (user_id) "
    "sort, no self-join. History-preserving upgrade of the reference's "
    "latest-only master state (fda_watcher.py:397-416)",
)
def q_scd2_versions(spark, sf_dir):
    from rag_pipelines_spark.operators.cdc import scd2_from_events

    # event_id tiebreak: ts collisions within a user must order identically
    # in both engines or lag/lead disagree on which row "changed".
    # Incremental form: operators/cdc.py scd2_merge (batch-sized replay).
    return scd2_from_events(t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Cohort retention — month-of-first-event cohorts x active-month offsets
# ---------------------------------------------------------------------------


@register(
    "q_cohort_retention",
    oracle="""
    WITH firsts AS (
        SELECT user_id, date_trunc('week', MIN(ts)) AS cohort
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS w
        FROM events
    )
    SELECT f.cohort,
           date_diff('day', f.cohort, a.w) // 7 AS week_offset,
           COUNT(*) AS n_users
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY f.cohort, week_offset
    """,
    doc="cohort retention matrix: cohort = ISO week of first event, cell = "
    "distinct users from that cohort active at each later week offset. Two "
    "hash aggregates + one user_id equi-join; offsets computed as exact "
    "day-diff/7 integers so both engines agree (weekly grain because the "
    "events fixture spans 30 days — swap 'week' for 'month' on real data)",
)
def q_cohort_retention(spark, sf_dir):
    e = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", "ts").alias("w")
    )
    # min(week(ts)) == week(min(ts)): date_trunc is monotonic, so the
    # cohort agg runs on the narrow (user, week) projection
    firsts = e.groupBy("user_id").agg(F.min("w").alias("cohort"))
    # DISTINCT collapses (user, week) BEFORE the join: at 100 TB the join
    # input shrinks from |events| to |users|x|active weeks|
    activity = e.distinct()
    return (
        activity.join(firsts, "user_id")
        .groupBy(
            "cohort",
            (F.datediff(F.col("w"), F.col("cohort")) / F.lit(7))
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


# ---------------------------------------------------------------------------
# Schema evolution — read heterogeneous parquet batches as one relation
# ---------------------------------------------------------------------------


@register(
    "q_schema_evolution",
    oracle="""
    SELECT doc_id, lang, n_chars, CAST(NULL AS BIGINT) AS n_tokens_est
    FROM documents WHERE doc_id % 2 = 0
    UNION ALL
    SELECT doc_id, lang, n_chars, n_chars // 5 AS n_tokens_est
    FROM documents WHERE doc_id % 2 = 1
    """,
    doc="schema-evolution read: two parquet batches written with drifted "
    "schemas (v2 adds n_tokens_est) scanned as ONE relation via "
    "mergeSchema; missing columns null-fill. Scale posture: mergeSchema "
    "footer-samples every file at planning time — on a 100 TB lake pin "
    "the unified schema explicitly (spark.read.schema(...)) and keep "
    "mergeSchema for ad-hoc discovery only",
)
def q_schema_evolution(spark, sf_dir):
    import os

    from rag_pipelines_spark.queries.sources import _scratch

    base = _scratch("schema-evo", sf_dir)
    d = t(spark, sf_dir, "documents")
    v1 = d.filter(F.col("doc_id") % 2 == 0).select("doc_id", "lang", "n_chars")
    v2 = (
        d.filter(F.col("doc_id") % 2 == 1)
        .select(
            "doc_id",
            "lang",
            "n_chars",
            (F.col("n_chars") / F.lit(5)).cast("long").alias("n_tokens_est"),
        )
    )
    p1, p2 = os.path.join(base, "batch1"), os.path.join(base, "batch2")
    v1.write.mode("overwrite").parquet(p1)
    v2.write.mode("overwrite").parquet(p2)
    return (
        spark.read.option("mergeSchema", "true")
        .parquet(p1, p2)
        .select("doc_id", "lang", "n_chars", "n_tokens_est")
    )


def _sql_zorder_terms(xu: str, xt: str, bits: int = 16) -> str:
    """DuckDB mirror of operators/layout.py::_interleave — bit b of dim d
    lands at position b*2+d (dim order: user, time)."""
    terms = []
    for b in range(bits):
        terms.append(f"((({xu} >> {b}) & 1) << {2 * b})")
        terms.append(f"((({xt} >> {b}) & 1) << {2 * b + 1})")
    return " | ".join(terms)


@register(
    "q_zorder_key",
    oracle=f"""
    WITH ev AS (
        SELECT event_id, user_id,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS tsec
        FROM events
    ),
    st AS (
        SELECT MIN(user_id) AS umin, MAX(user_id) AS umax,
               MIN(tsec) AS tmin, MAX(tsec) AS tmax
        FROM ev
    ),
    sc AS (
        SELECT event_id,
               CASE WHEN umax > umin THEN CAST(FLOOR(
                    CAST((user_id - umin) * 65535 AS DOUBLE) / (umax - umin)
               ) AS BIGINT) ELSE 0 END AS xu,
               CASE WHEN tmax > tmin THEN CAST(FLOOR(
                    CAST((tsec - tmin) * 65535 AS DOUBLE) / (tmax - tmin)
               ) AS BIGINT) ELSE 0 END AS xt
        FROM ev, st
    )
    SELECT event_id, ({_sql_zorder_terms("xu", "xt")}) AS zkey FROM sc
    """,
    doc="Morton/z-order clustering key over (user_id, event-time): "
    "min/max-rescaled 16-bit dimensions, bits interleaved with pure "
    "codegen shift/mask math (operators/layout.py) — sorting a 100 TB "
    "fact table by zkey makes parquet min/max stats tight on BOTH "
    "dimensions so AND-of-ranges predicates skip most row groups "
    "(measured in tests/test_layout.py)",
)
def q_zorder_key(spark, sf_dir):
    from rag_pipelines_spark.operators.layout import zorder_key

    # ts is TIMESTAMP_NTZ (io.table's nanos handling); NTZ has no direct
    # long cast — route through an epoch diff, which is timezone-free
    tsec = F.timestamp_diff(
        "SECOND", F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"), F.col("ts")
    )
    ev = t(spark, sf_dir, "events").select(
        "event_id", "user_id", tsec.alias("tsec")
    )
    return zorder_key(ev, ["user_id", "tsec"]).select("event_id", "zkey")


_QZQ_BOUNDS = [float(1000 * i // 16) for i in range(1, 16)]


def _sql_bucket_16(col: str) -> str:
    """DuckDB mirror of layout.py::_quantile_bucket for the fixed
    boundary list: count of boundaries <= col."""
    return " + ".join(
        f"(CASE WHEN {col} >= {int(b)} THEN 1 ELSE 0 END)"
        for b in _QZQ_BOUNDS
    )


@register(
    "q_zorder_quantile",
    oracle=f"""
    WITH b AS (
        SELECT event_id,
               ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT
                   % 1000 AS u,
               ('0x' || substring(md5(CAST(event_id AS VARCHAR) || 'z'), 1, 8))::BIGINT
                   % 1000 AS v
        FROM events
    ),
    sc AS (
        SELECT event_id,
               ({_sql_bucket_16("u")}) AS xu,
               ({_sql_bucket_16("v")}) AS xv
        FROM b
    )
    SELECT event_id,
           ({_sql_zorder_terms("xu", "xv", bits=4)}) AS zkey,
           ({_sql_zorder_terms("xu", "xv", bits=4)}) // 32 AS zfile
    FROM sc
    """,
    doc="round-6 quantile z-order mechanics, oracle-checked end to end: "
    "caller-supplied equal-population boundaries (the boundaries= reuse "
    "API — layout stability across incremental writes), bucket index = "
    "count of boundaries <= value (codegen array filter), Morton "
    "interleave, and the deterministic cell-aligned file id "
    "(zcell_file_id: zkey div cell — the assignment write_zordered "
    "routes through a murmur3 hash-bijection, replacing sampled range "
    "boundaries). Dims are md5-portable hashes of the ids so the check "
    "is scale-independent. ref layout: operators/layout.py",
)
def q_zorder_quantile(spark, sf_dir):
    from rag_pipelines_spark.operators.layout import zcell_file_id, zorder_key
    from rag_pipelines_spark.operators.sampling import hash_bucket

    ev = t(spark, sf_dir, "events").select(
        "event_id",
        hash_bucket("user_id", granularity=1000).alias("u"),
        hash_bucket(F.col("event_id"), salt="z", granularity=1000).alias("v"),
    )
    keyed = zorder_key(
        ev, ["u", "v"], bits=4, normalize="quantile",
        boundaries={"u": _QZQ_BOUNDS, "v": _QZQ_BOUNDS},
    )
    return keyed.select(
        "event_id", "zkey", zcell_file_id(4, 2, 8).alias("zfile")
    )


@register(
    "q_rollup_serve",
    oracle="""
    SELECT event_type,
           CAST(COUNT(value) AS BIGINT) AS count_value,
           (CAST(FLOOR(SUM(CAST(value AS DECIMAL(30,15)))) AS DOUBLE)
            + CAST(SUM(CAST(value AS DECIMAL(30,15)))
                   - FLOOR(SUM(CAST(value AS DECIMAL(30,15)))) AS DOUBLE))
               AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY event_type
    """,
    doc="incremental rollup maintenance served end-to-end: three "
    "time-sliced batches folded into manifest state via mergeable "
    "partials (operators/rollup.py), read back and compared against the "
    "one-shot aggregate the oracle computes — proving "
    "combine(partials) == aggregate(union) at the driver gate, not just "
    "in unit tests. State is |keys|-sized; merge cost tracks the batch",
)
def q_rollup_serve(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.rollup import merge_rollup, read_rollup
    from rag_pipelines_spark.queries._util import dec_to_dbl
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("rollup-serve", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    for r in range(3):
        merge_rollup(
            spark,
            ev.filter(F.col("event_id") % 3 == r),
            state,
            keys=["event_type"],
            measures={"value": ["count", "sum", "min", "max"]},
        )
    return read_rollup(spark, state).select(
        "event_type",
        "count_value",
        dec_to_dbl(F.col("sum_value")).alias("sum_value"),
        "min_value",
        "max_value",
    )


def _sql_hist_quantile(prob: float, width: float, alias: str) -> str:
    """DuckDB mirror of operators/histogram.py::histogram_quantile."""
    pw = repr(prob)
    ww = repr(width)
    return f"""
    SELECT event_type,
           round({ww} * (CAST(bin AS DOUBLE)
                 + ({pw} * CAST(total AS DOUBLE)
                    - CAST(cum - n AS DOUBLE)) / CAST(n AS DOUBLE)), 9)
               AS {alias}
    FROM (
        SELECT event_type, bin, n, cum, total,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY bin) AS rk
        FROM hcum
        WHERE CAST(cum AS DOUBLE) >= {pw} * CAST(total AS DOUBLE)
    ) WHERE rk = 1"""


@register(
    "q_histogram_quantiles",
    oracle=f"""
    WITH hbins AS (
        -- null values excluded, mirroring histogram_partial
        SELECT event_type, CAST(FLOOR(value / 1.0) AS BIGINT) AS bin,
               COUNT(*) AS n
        FROM events WHERE value IS NOT NULL GROUP BY event_type, bin
    ),
    hcum AS (
        SELECT event_type, bin, n,
               SUM(n) OVER (PARTITION BY event_type ORDER BY bin
                            ROWS UNBOUNDED PRECEDING) AS cum,
               SUM(n) OVER (PARTITION BY event_type) AS total
        FROM hbins
    ),
    p50 AS ({_sql_hist_quantile(0.5, 1.0, "p50")}),
    p95 AS ({_sql_hist_quantile(0.95, 1.0, "p95")})
    SELECT p50.event_type, p50.p50, p95.p95
    FROM p50 JOIN p95 USING (event_type)
    """,
    doc="mergeable-histogram quantiles: fixed-width bins (floor(value/w), "
    "counts add => exactly mergeable partials — the sketch answer to "
    "rollup.py refusing median), p50/p95 interpolated within the "
    "reaching bin, error <= width. State is one row per occupied "
    "(key, bin) at any corpus size (operators/histogram.py)",
)
def q_histogram_quantiles(spark, sf_dir):
    from rag_pipelines_spark.operators.histogram import (
        histogram_partial,
        histogram_quantile,
    )

    ev = t(spark, sf_dir, "events").select("event_type", "value")
    hist = histogram_partial(ev, ["event_type"], "value", 1.0)
    p50 = histogram_quantile(hist, ["event_type"], 1.0, 0.5)
    p95 = histogram_quantile(hist, ["event_type"], 1.0, 0.95)
    return p50.join(p95, "event_type").select("event_type", "q50", "q95") \
        .withColumnRenamed("q50", "p50").withColumnRenamed("q95", "p95")


@register(
    "q_freq_topk_serve",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS item
        FROM documents WHERE text IS NOT NULL
    ),
    cnt AS (SELECT lang, item, COUNT(*) AS est FROM tok GROUP BY lang, item),
    rk AS (
        SELECT lang, item, est,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY est DESC, item) AS rk
        FROM cnt
    )
    SELECT lang, item, CAST(est AS BIGINT) AS est,
           CAST(0 AS BIGINT) AS err_bound, rk
    FROM rk WHERE rk <= 10
    """,
    doc="mergeable frequent-items (Misra-Gries) sketch served end-to-end: "
    "three time-sliced batches folded into manifest state "
    "(operators/freqsketch.py — <= m counters + realized pruning offset "
    "per group), top-10 terms per lang read back from state. With m=64 "
    ">= the fixture vocab the realized err_bound is EXACTLY 0 and the "
    "served counts equal the oracle's exact GROUP BY — the driver gate "
    "itself proves the merge path exact in the no-prune regime; the "
    "m < distinct regime's error envelope is pinned in "
    "tests/test_freqsketch.py. The sketch answer to rollup.py refusing "
    "top-k-by-frequency; state is O(groups*m) at any corpus size",
)
def q_freq_topk_serve(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.concurrency import run_all
    from rag_pipelines_spark.operators.freqsketch import (
        freq_partial,
        freq_topk,
        merge_freq,
    )
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("freq-serve", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    # tokenize ONCE and materialize: the three "daily batches" below are
    # slices of the same fixture corpus, so without this each merge would
    # re-run the scan+explode (signatures-once discipline, SCALE.md; in
    # production the batches arrive as distinct inputs and this is moot)
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        .localCheckpoint(eager=True)
    )
    # three pending batches -> build the three partials CONCURRENTLY
    # (each is an independent batch-only job chain; guide §2.6), then
    # fold them into state strictly in order — identical state bytes,
    # the backfill/catch-up pipelining posture of a continuous ingest
    batches = [toks.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    partials = run_all(*[
        (lambda b=b: freq_partial(b, ["lang"], "term", 64))
        for b in batches
    ])
    for b, p in zip(batches, partials):
        merge_freq(
            spark,
            b,
            state,
            keys=["lang"],
            item_col="term",
            m=64,
            partial=p,
        )
    return freq_topk(spark, state, keys=["lang"], k=10)


@register(
    "q_distinct_sketch_serve",
    oracle=None,  # HLL estimate: DuckDB's approx sketch differs by design —
    # the error envelope vs the exact count is pinned in
    # tests/test_hllsketch.py instead (rows-only here)
    doc="mergeable distinct-count (HLL) sketch served end-to-end: three "
    "time-sliced batches folded into register state "
    "(operators/hllsketch.py, Spark-native hll_sketch_agg/hll_union_agg "
    "— one binary register array per group), per-event-type distinct "
    "users estimated from state without rescanning history. Register "
    "union is per-slot MAX (associative/idempotent), so N-batch "
    "accretion == one-shot sketch EXACTLY (pinned by test); the estimate "
    "vs truth is ~2.5% at lgK=12 (pinned by test). Rows-only by design: "
    "DuckDB's approx_count_distinct is a different sketch and can never "
    "hash-match. The sketch answer to rollup.py refusing count_distinct; "
    "state is O(groups) x 2^lgK bytes at any corpus size",
)
def q_distinct_sketch_serve(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.hllsketch import (
        hll_estimate,
        merge_hll,
        read_hll,
    )
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("hll-serve", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "user_id")
    # materialize the three batch sketch partials concurrently (guide
    # §2.6), fold sequentially — register union is per-slot MAX, so the
    # state is identical to the all-sequential path
    from rag_pipelines_spark.operators.concurrency import checkpoint_all
    from rag_pipelines_spark.operators.hllsketch import hll_partial

    batches = [ev.filter(F.col("event_id") % 3 == r) for r in range(3)]
    partials = checkpoint_all(*[
        hll_partial(b, ["event_type"], "user_id") for b in batches
    ])
    for b, p in zip(batches, partials):
        merge_hll(
            spark,
            b,
            state,
            keys=["event_type"],
            item_col="user_id",
            partial=p,
        )
    return hll_estimate(read_hll(spark, state), ["event_type"])


# ---------------------------------------------------------------------------
# KMV distinct sketch — the oracle-checkable twin of the HLL serve family
# ---------------------------------------------------------------------------

# (k-1) * 2^60 with both factors exactly representable: both engines fold
# the identical double before the single deterministic division.
_KMV_NUM = "(255.0 * 1152921504606846976.0)"

_KMV_HASHES = """
        SELECT DISTINCT l_returnflag,
               CAST(concat('0x', substr(md5(CAST(l_orderkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM lineitem WHERE l_orderkey IS NOT NULL
"""


@register(
    "q_kmv_distinct",
    oracle=f"""
    WITH h AS ({_KMV_HASHES}),
    rk AS (
        SELECT l_returnflag, h,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
        FROM h
    ),
    agg AS (
        SELECT l_returnflag, MAX(h) AS hk, COUNT(*) AS nk
        FROM rk WHERE rk <= 256 GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CASE WHEN nk < 256 THEN CAST(nk AS DOUBLE)
                ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END AS est_distinct
    FROM agg
    """,
    doc="KMV (k-minimum-values) distinct-count sketch, k=256: per return "
    "flag, the estimated distinct order keys (~11k true) from only the "
    "256 smallest md5-derived hashes (operators/kmv.py). The "
    "engine-portable hash makes the sketch AND the estimate bit-identical "
    "in DuckDB — the oracle-checkable twin of the rows-only HLL serve "
    "family; rel err ~1/sqrt(k-2) pinned in tests/test_kmv.py",
)
def q_kmv_distinct(spark, sf_dir):
    from rag_pipelines_spark.operators.kmv import kmv_estimate, kmv_sketch

    li = t(spark, sf_dir, "lineitem")
    sk = kmv_sketch(li, ["l_returnflag"], "l_orderkey", k=256)
    return kmv_estimate(sk, ["l_returnflag"], k=256)


@register(
    "q_kmv_intersect",
    oracle=f"""
    WITH ha AS (
        SELECT DISTINCT
               CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM lineitem WHERE l_partkey % 4 <> 0
    ),
    hb AS (
        SELECT DISTINCT
               CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
                    AS BIGINT) AS h
        FROM lineitem WHERE l_partkey % 6 <> 0
    ),
    a AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM ha)
          WHERE rk <= 256),
    b AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rk FROM hb)
          WHERE rk <= 256),
    uk AS (SELECT h, row_number() OVER (ORDER BY h) AS rk
           FROM (SELECT h FROM a UNION SELECT h FROM b)),
    k AS (SELECT h FROM uk WHERE rk <= 256),
    stats AS (
        SELECT (SELECT COUNT(*) FROM k) AS nk,
               (SELECT MAX(h) FROM k) AS hk,
               (SELECT COUNT(*) FROM k
                WHERE h IN (SELECT h FROM a) AND h IN (SELECT h FROM b)) AS nboth
    )
    SELECT CAST(nboth AS DOUBLE) / CAST(nk AS DOUBLE)
               * (CASE WHEN nk < 256 THEN CAST(nk AS DOUBLE)
                       ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END)
               AS est_intersection,
           CASE WHEN nk < 256 THEN CAST(nk AS DOUBLE)
                ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END AS est_union
    FROM stats
    """,
    doc="KMV set arithmetic HLL cannot do: estimated distinct-part-key "
    "overlap of two genuinely different sets (part keys on orders with "
    "partkey%4!=0 vs %6!=0: true |A|=1500, |B|=1666, |A∩B|=1333 at "
    "sf0.01) from the two 256-value sketches ALONE — k smallest of the "
    "union is a uniform hash-sample, the in-both fraction estimates the "
    "Jaccard, J x union_est the overlap. Hash-checked against DuckDB "
    "recomputing the identical sketch algebra; accuracy envelope in "
    "tests/test_kmv.py",
)
def q_kmv_intersect(spark, sf_dir):
    from rag_pipelines_spark.operators.kmv import kmv_intersect, kmv_sketch

    li = t(spark, sf_dir, "lineitem")
    a = kmv_sketch(
        li.filter(F.col("l_partkey") % 4 != 0), [], "l_partkey", k=256
    ).withColumn("g", F.lit(1))
    b = kmv_sketch(
        li.filter(F.col("l_partkey") % 6 != 0), [], "l_partkey", k=256
    ).withColumn("g", F.lit(1))
    return kmv_intersect(a, b, ["g"], k=256).drop("g")


@register(
    "q_kmv_serve",
    oracle=f"""
    WITH h AS ({_KMV_HASHES}),
    rk AS (
        SELECT l_returnflag, h,
               row_number() OVER (PARTITION BY l_returnflag ORDER BY h) AS rk
        FROM h
    ),
    agg AS (
        SELECT l_returnflag, MAX(h) AS hk, COUNT(*) AS nk
        FROM rk WHERE rk <= 256 GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CASE WHEN nk < 256 THEN CAST(nk AS DOUBLE)
                ELSE {_KMV_NUM} / CAST(hk AS DOUBLE) END AS est_distinct
    FROM agg
    """,
    doc="KMV state served END-TO-END: three l_orderkey%3 batches folded "
    "into <root>/kmv via merge_kmv (manifest/epoch/lease contract, "
    "operators/kmv.py), then the estimate served from state alone. The "
    "oracle is the SAME one-shot SQL as q_kmv_distinct because KMV "
    "accretion == one-shot EXACTLY (k-smallest of unions) — so the "
    "driver hash-gate certifies the merge/state path itself, incl. "
    "state I/O, not just the sketch math",
)
def q_kmv_serve(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.kmv import (
        kmv_estimate,
        merge_kmv,
        read_kmv,
    )
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("kmv-serve", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    li = t(spark, sf_dir, "lineitem").select("l_returnflag", "l_orderkey")
    for r in range(3):
        merge_kmv(
            spark,
            li.filter(F.col("l_orderkey") % 3 == r),
            state,
            keys=["l_returnflag"],
            item_col="l_orderkey",
            k=256,
            epoch=r,
        )
    return kmv_estimate(
        read_kmv(spark, state).drop("k"), ["l_returnflag"], k=256
    )


@register(
    "q_substring_from_state",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ),
    idx AS (
        SELECT doc_id, s, unnest(range(1, len(s) - 8 + 2)) AS i
        FROM toks WHERE len(s) >= 8
    ),
    g AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(s[i:i+7], ' ')) AS gh
        FROM idx
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
    hits AS (
        SELECT g.doc_id, g.pos AS st, g.pos + 7 AS en
        FROM g JOIN dup USING (gh)
        WHERE g.doc_id % 3 = 2
    ),
    flagged AS (
        SELECT doc_id, st, en,
               CASE WHEN MAX(en) OVER (
                        PARTITION BY doc_id ORDER BY st
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR st > MAX(en) OVER (
                        PARTITION BY doc_id ORDER BY st
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) + 1
               THEN 1 ELSE 0 END AS nw
        FROM hits
    ),
    isl AS (
        SELECT doc_id, st, en,
               SUM(nw) OVER (PARTITION BY doc_id ORDER BY st
                             ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT doc_id, MIN(st) AS span_start, MAX(en) AS span_end,
           MAX(en) - MIN(st) + 1 AS span_len
    FROM isl GROUP BY doc_id, island
    """,
    doc="incremental substring dedup served from accreted gram-count "
    "state: three time-sliced batches fold per-gram occurrence counts "
    "into the SAME manifest/epoch/lease rollup state the warehouse "
    "family uses (operators/rollup.py — count is mergeable, so N merges "
    "== one-shot corpus count, pinned by the rollup tests), then the "
    "latest batch's duplicated spans are computed against state WITHOUT "
    "re-reading any history text — history exists only as the keyed "
    "digest->count table. The oracle recomputes spans from the full "
    "corpus and restricts to the batch's docs: state-served == full "
    "recompute is exactly what the driver gate hash-checks. State is "
    "O(distinct grams) — the largest state family by construction "
    "(documented in SCALE.md); the md5-digest key keeps rows at 32 "
    "bytes + count regardless of n — operators/substrdedup.py. The "
    "serve probe runs behind the bloom front door (bloom_front_door): "
    "batch grams definitely not in the dup set skip the state join "
    "entirely (no false negatives -> hash-identical spans; measured "
    "shuffled-volume drop in SCALE.md)",
)
def q_substring_from_state(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.rollup import merge_rollup, read_rollup
    from rag_pipelines_spark.operators.substrdedup import (
        bloom_front_door,
        merge_covered_spans,
        ngram_occurrences,
    )
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("substr-serve", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    d = t(spark, sf_dir, "documents")
    # gram occurrences once (signatures-once discipline; in production the
    # batches arrive as distinct inputs and each is grammed on arrival)
    occ = ngram_occurrences(d, "doc_id", "text", 8).localCheckpoint(eager=True)
    for r in range(3):
        merge_rollup(
            spark,
            occ.filter(F.col("id") % 3 == r).select("gh", "pos"),
            state,
            keys=["gh"],
            measures={"pos": ["count"]},
            epoch=r,
        )
    dup = (
        read_rollup(spark, state)
        .filter(F.col("count_pos") >= 2)
        .select("gh")
    )
    batch = bloom_front_door(occ.filter(F.col("id") % 3 == 2), dup)
    hits = batch.join(dup, "gh")
    s = merge_covered_spans(hits, 8, "doc_id")
    return s.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_len").cast("long").alias("span_len"),
    )


@register(
    "q_substring_compacted",
    oracle="""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS s FROM documents
    ),
    idx AS (
        SELECT doc_id, s, unnest(range(1, len(s) - 8 + 2)) AS i
        FROM toks WHERE len(s) >= 8
    ),
    g AS (
        SELECT doc_id, i - 1 AS pos,
               md5(array_to_string(s[i:i+7], ' ')) AS gh
        FROM idx
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= 2),
    hits AS (
        SELECT g.doc_id, g.pos AS st, g.pos + 7 AS en
        FROM g JOIN dup USING (gh)
        WHERE g.doc_id % 3 = 2
    ),
    flagged AS (
        SELECT doc_id, st, en,
               CASE WHEN MAX(en) OVER (
                        PARTITION BY doc_id ORDER BY st
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) IS NULL
                    OR st > MAX(en) OVER (
                        PARTITION BY doc_id ORDER BY st
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                    ) + 1
               THEN 1 ELSE 0 END AS nw
        FROM hits
    ),
    isl AS (
        SELECT doc_id, st, en,
               SUM(nw) OVER (PARTITION BY doc_id ORDER BY st
                             ROWS UNBOUNDED PRECEDING) AS island
        FROM flagged
    )
    SELECT doc_id, MIN(st) AS span_start, MAX(en) AS span_end,
           MAX(en) - MIN(st) + 1 AS span_len
    FROM isl GROUP BY doc_id, island
    """,
    doc="q_substring_from_state's serve run against a PRUNED state: after "
    "the 3-batch accretion, compact_rollup_state(min_count=2) drops every "
    "singleton gram (the dominant row class) and hash-clusters the "
    "survivors on the digest key (operators/rollup.py). The oracle is the "
    "full-corpus recompute — byte-identical spans from a fraction of the "
    "state rows is the driver-gate proof that min_count pruning preserves "
    "every served verdict, the SCALE.md sizing knob for the largest state "
    "family made code (VERDICT r6 item 3). Below-threshold loss semantics "
    "pinned in tests/test_rollup.py",
)
def q_substring_compacted(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.rollup import (
        compact_rollup_state,
        merge_rollup,
        read_rollup,
    )
    from rag_pipelines_spark.operators.substrdedup import (
        merge_covered_spans,
        ngram_occurrences,
    )
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("substr-compact", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    d = t(spark, sf_dir, "documents")
    occ = ngram_occurrences(d, "doc_id", "text", 8).localCheckpoint(eager=True)
    for r in range(3):
        merge_rollup(
            spark,
            occ.filter(F.col("id") % 3 == r).select("gh", "pos"),
            state,
            keys=["gh"],
            measures={"pos": ["count"]},
            epoch=r,
        )
    compact_rollup_state(
        spark, state, min_count=2, count_col="count_pos", cluster_by=["gh"]
    )
    dup = read_rollup(spark, state).select("gh")  # all survivors are >= 2
    hits = occ.filter(F.col("id") % 3 == 2).join(dup, "gh")
    s = merge_covered_spans(hits, 8, "doc_id")
    return s.select(
        "doc_id",
        F.col("span_start").cast("long").alias("span_start"),
        F.col("span_end").cast("long").alias("span_end"),
        F.col("span_len").cast("long").alias("span_len"),
    )


@register(
    "q_ann_from_state",
    oracle="""
    WITH norms AS (
        SELECT vec_id, embedding,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS n2
        FROM (SELECT vec_id, embedding, unnest(embedding) AS x FROM embeddings)
        GROUP BY vec_id, embedding
    ),
    ranked AS (
        SELECT vec_id, embedding, n2,
               row_number() OVER (
                   ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id
               ) AS rh
        FROM norms WHERE vec_id % 3 = 0
    ),
    seeds AS (
        SELECT vec_id AS seed_id, embedding AS sv, n2 AS sn2
        FROM ranked WHERE rh <= 32
    ),
    cp AS (
        SELECT n.vec_id, n.embedding AS v, n.n2, s.seed_id, s.sv, s.sn2
        FROM norms n, seeds s
    ),
    cdots AS (
        SELECT vec_id, seed_id, n2, sn2,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS dot
        FROM (SELECT vec_id, seed_id, n2, sn2,
                     unnest(v) AS x, unnest(sv) AS y FROM cp)
        GROUP BY vec_id, seed_id, n2, sn2
    ),
    cassign AS (
        SELECT vec_id, seed_id AS cell,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY round(dot / (sqrt(n2) * sqrt(sn2)), 9)
                            DESC NULLS LAST,
                            seed_id
               ) AS rk
        FROM cdots
    ),
    cells AS (
        SELECT a.vec_id AS c_id, a.cell, n.embedding AS cv, n.n2 AS cn2
        FROM cassign a JOIN norms n USING (vec_id) WHERE a.rk = 1
    ),
    qassign AS (
        SELECT vec_id AS q_id, seed_id AS cell,
               row_number() OVER (
                   PARTITION BY vec_id
                   ORDER BY round(dot / (sqrt(n2) * sqrt(sn2)), 9)
                            DESC NULLS LAST,
                            seed_id
               ) AS rk
        FROM cdots WHERE vec_id < 10
    ),
    probes AS (
        SELECT p.q_id, p.cell, n.embedding AS qv, n.n2 AS qn2
        FROM qassign p JOIN norms n ON n.vec_id = p.q_id
        WHERE p.rk <= 2
    ),
    cand AS (
        SELECT DISTINCT p.q_id, c.c_id, p.qv, p.qn2, c.cv, c.cn2
        FROM probes p JOIN cells c USING (cell)
        WHERE p.q_id <> c.c_id
    ),
    pdots AS (
        SELECT q_id, c_id, qn2, cn2,
               CAST(SUM(CAST(CAST(x AS DOUBLE) * CAST(y AS DOUBLE)
                             AS DECIMAL(30,15))) AS DOUBLE) AS dot
        FROM (SELECT q_id, c_id, qn2, cn2,
                     unnest(qv) AS x, unnest(cv) AS y FROM cand)
        GROUP BY q_id, c_id, qn2, cn2
    ),
    scored AS (
        SELECT q_id, c_id,
               round(dot / (sqrt(qn2) * sqrt(cn2)), 9) AS cosine,
               row_number() OVER (
                   PARTITION BY q_id
                   ORDER BY round(dot / (sqrt(qn2) * sqrt(cn2)), 9) DESC,
                            c_id
               ) AS rk
        FROM pdots
    )
    SELECT q_id, c_id, cosine, rk FROM scored WHERE rk <= 5
    """,
    doc="incremental ANN (IVF) index maintenance served end-to-end "
    "(operators/annstate.py): three embedding batches accrete into "
    "frozen-centroid postings state (seeds = hash-min vectors of the "
    "FIRST batch, persisted; later batches assign against the STORED "
    "seeds — how real IVF deployments grow lists without re-training), "
    "appends marker-committed exactly-once under the shared "
    "manifest/lease contract; queries then probe nprobe=2 nearest "
    "stored cells with exact decimal re-rank. The oracle replays the "
    "whole index lifecycle (batch-1 seeds, full assignment, probe, "
    "top-5) in SQL — state-served ANN == declarative recompute is what "
    "the driver gate hash-checks; N-append == one-shot invariance and "
    "replay idempotence pinned in tests/test_annstate.py",
)
def q_ann_from_state(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.annstate import (
        ann_query_from_state,
        merge_ann_index,
    )
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("ann-serve", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    e = t(spark, sf_dir, "embeddings")
    for r in range(3):
        merge_ann_index(
            spark,
            e.filter(F.col("vec_id") % 3 == r),
            state,
            "vec_id",
            "embedding",
            k_seeds=32,
            epoch=r,
        )
    q = e.filter(F.col("vec_id") < 10)
    return ann_query_from_state(
        spark, state, q, "vec_id", "embedding", nprobe=2, k=5
    )


@register(
    "q_scd2_versions_checksum",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               lag(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS prev_attr
        FROM events
    ),
    changes AS (
        SELECT user_id, event_type, ts, event_id
        FROM ordered
        WHERE prev_attr IS NULL OR prev_attr <> event_type
    ),
    versions AS (
        SELECT user_id,
               event_type AS attr,
               ts AS valid_from,
               lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS valid_to,
               CAST(CASE WHEN lead(ts) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) IS NULL THEN 1 ELSE 0 END AS BIGINT) AS is_current
        FROM changes
    )
    SELECT user_id,
           COUNT(*) AS n_versions,
           CAST(SUM(is_current) AS BIGINT) AS n_open,
           bit_xor(CAST(concat('0x', substr(md5(
               attr || '|' ||
               strftime(valid_from, '%Y-%m-%d %H:%M:%S.%f') || '|' ||
               COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S.%f'),
                        'OPEN') || '|' ||
               CAST(is_current AS VARCHAR)), 1, 15)) AS BIGINT)) AS xor_sig
    FROM versions GROUP BY user_id
    """,
    doc="bounded differential form of q_scd2_versions for the sf10 "
    "scaling rung (SCALE.md): the version history reduced to one row per "
    "dimension key — version count, open-row count (the exactly-one "
    "invariant summed), and an XOR of md5 digests over each full version "
    "tuple. NULL valid_to (the open row) is COALESCEd to a sentinel "
    "BEFORE the digest on both sides — concat_ws silently skips nulls in "
    "Spark while || nulls out in DuckDB, so unhandled nulls would make "
    "the digests structurally different",
)
def q_scd2_versions_checksum(spark, sf_dir):
    from rag_pipelines_spark.operators.cdc import scd2_from_events

    v = scd2_from_events(t(spark, sf_dir, "events"))
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    digest = md5_long_digest(
        F.col("attr"),
        F.date_format("valid_from", fmt),
        F.coalesce(F.date_format("valid_to", fmt), F.lit("OPEN")),
        F.col("is_current").cast("string"),
    )
    return v.groupBy("user_id").agg(
        F.count("*").alias("n_versions"),
        F.sum("is_current").alias("n_open"),
        F.bit_xor(digest).alias("xor_sig"),
    )


from rag_pipelines_spark.registry import REGISTRY as _REG  # noqa: E402


@register(
    "q_zorder_key_checksum",
    oracle=f"""
    WITH base AS ({_REG["q_zorder_key"].oracle})
    SELECT event_id % 64 AS shard,
           COUNT(*) AS n,
           bit_xor(CAST(concat('0x', substr(md5(
               CAST(event_id AS VARCHAR) || '|' ||
               CAST(zkey AS VARCHAR)), 1, 15)) AS BIGINT)) AS xor_sig
    FROM base GROUP BY event_id % 64
    """,
    doc="bounded differential form of q_zorder_key for the sf10 scaling "
    "rung (SCALE.md): 10M Morton keys reduced to 64 hash shards — count "
    "plus an XOR of (event_id, zkey) md5 digests; one interleaved bit "
    "wrong anywhere flips a shard signature. Wraps the original query fn "
    "and oracle verbatim",
)
def q_zorder_key_checksum(spark, sf_dir):
    base = _REG["q_zorder_key"].fn(spark, sf_dir)
    digest = md5_long_digest(
        F.col("event_id").cast("string"), F.col("zkey").cast("string")
    )
    return base.groupBy((F.col("event_id") % 64).alias("shard")).agg(
        F.count("*").alias("n"), F.bit_xor(digest).alias("xor_sig")
    )


@register(
    "q_zorder_quantile_checksum",
    oracle=f"""
    WITH base AS ({_REG["q_zorder_quantile"].oracle})
    SELECT zfile,
           COUNT(*) AS n,
           bit_xor(CAST(concat('0x', substr(md5(
               CAST(event_id AS VARCHAR) || '|' ||
               CAST(zkey AS VARCHAR)), 1, 15)) AS BIGINT)) AS xor_sig
    FROM base GROUP BY zfile
    """,
    doc="bounded differential form of q_zorder_quantile for the sf10 "
    "scaling rung (SCALE.md): reduced to one row per deterministic "
    "z-cell FILE id (the layout the operator exists to produce), with "
    "count + (event_id, zkey) digest XOR per file. Wraps the original "
    "query fn and oracle verbatim",
)
def q_zorder_quantile_checksum(spark, sf_dir):
    base = _REG["q_zorder_quantile"].fn(spark, sf_dir)
    digest = md5_long_digest(
        F.col("event_id").cast("string"), F.col("zkey").cast("string")
    )
    return base.groupBy("zfile").agg(
        F.count("*").alias("n"), F.bit_xor(digest).alias("xor_sig")
    )


@register(
    "q_countmin_serve",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS item
        FROM documents WHERE text IS NOT NULL
    ),
    cnt AS (SELECT lang, item, COUNT(*) AS n FROM tok GROUP BY 1, 2),
    cm AS (
        SELECT lang, d.d AS d,
               CAST(concat('0x', substr(md5(CAST(d.d AS VARCHAR)
                    || '|' || item), 1, 15)) AS BIGINT) % 1024 AS bucket,
               SUM(n) AS cnt
        FROM cnt CROSS JOIN (VALUES (0), (1), (2), (3)) AS d(d)
        GROUP BY 1, 2, 3
    ),
    probe AS (
        SELECT l.lang, i.item, d.d,
               CAST(concat('0x', substr(md5(CAST(d.d AS VARCHAR)
                    || '|' || i.item), 1, 15)) AS BIGINT) % 1024 AS bucket
        FROM (SELECT DISTINCT lang FROM documents) l
        CROSS JOIN (VALUES ('spark'), ('join'), ('dup'), ('scan'),
                           ('window'), ('qqqzzz')) i(item)
        CROSS JOIN (VALUES (0), (1), (2), (3)) d(d)
    )
    SELECT p.lang, p.item, CAST(MIN(COALESCE(cm.cnt, 0)) AS BIGINT) AS est
    FROM probe p
    LEFT JOIN cm ON p.lang = cm.lang AND p.d = cm.d
                AND p.bucket = cm.bucket
    GROUP BY 1, 2
    """,
    doc="mergeable Count-Min sketch served end-to-end "
    "(operators/cmsketch.py): three time-sliced batches of per-lang "
    "document terms folded into 4x1024 counter state (element-wise "
    "counter ADD — exactly mergeable, any merge tree), then "
    "point-frequency estimates for a 6-term probe set (5 fixture terms "
    "+ one never-seen term) read from state without rescanning "
    "history. est >= true always; the oracle replicates every counter "
    "bitwise (md5-nibble bucketing, decimal counts) so the driver gate "
    "certifies the merge path EXACT, collisions included. The "
    "fixed-space answer to 'how often did THIS item occur' for items "
    "outside any top-k; state is O(groups*depth*width) at any corpus "
    "size",
)
def q_countmin_serve(spark, sf_dir):
    import shutil

    from rag_pipelines_spark.operators.cmsketch import cm_estimate, merge_cm
    from rag_pipelines_spark.queries.sources import _scratch

    state = _scratch("countmin-serve", sf_dir)
    shutil.rmtree(state, ignore_errors=True)  # additive state: fresh per run
    toks = (
        t(spark, sf_dir, "documents")
        .filter(F.col("text").isNotNull())
        .select(
            "doc_id", "lang", F.explode(F.split("text", " ")).alias("term")
        )
        .localCheckpoint(eager=True)  # signatures-once (q_freq_topk_serve)
    )
    # three pending batches: materialize the three counter partials
    # concurrently (guide §2.6), fold sequentially — counters add
    # element-wise, so the state is identical to the sequential path
    from rag_pipelines_spark.operators.cmsketch import cm_partial
    from rag_pipelines_spark.operators.concurrency import checkpoint_all

    batches = [toks.filter(F.col("doc_id") % 3 == r) for r in range(3)]
    partials = checkpoint_all(*[
        cm_partial(b, ["lang"], "term", depth=4, width=1024)
        for b in batches
    ])
    for b, p in zip(batches, partials):
        merge_cm(
            spark,
            b,
            state,
            keys=["lang"],
            item_col="term",
            depth=4,
            width=1024,
            partial=p,
        )
    langs = t(spark, sf_dir, "documents").select("lang").distinct()
    items = spark.createDataFrame(
        [("spark",), ("join",), ("dup",), ("scan",), ("window",),
         ("qqqzzz",)],
        "item STRING",
    )
    probes = langs.crossJoin(F.broadcast(items))
    return cm_estimate(spark, state, probes, keys=["lang"])


def _sql_cm_table(src: str, width: int) -> str:
    """Oracle fragment: the Count-Min counter table of `src` (a CTE with
    columns item, n), all four hash rows — bitwise the engine's."""
    return f"""
        SELECT d.d AS d,
               CAST(concat('0x', substr(md5(CAST(d.d AS VARCHAR) || '|'
                    || CAST(item AS VARCHAR)), 1, 15)) AS BIGINT)
                    % {width} AS bucket,
               SUM(n) AS cnt
        FROM {src} CROSS JOIN (VALUES (0), (1), (2), (3)) d(d)
        GROUP BY 1, 2"""


def _sql_cm_ip(a: str, b: str) -> str:
    """Oracle fragment: min-over-depth inner product of two counter
    CTEs — the join-size estimate."""
    return f"""
        SELECT CAST(MIN(ip) AS BIGINT) AS est FROM (
            SELECT a.d,
                   SUM(CAST(CAST(a.cnt AS DECIMAL(19,0))
                        * CAST(b.cnt AS DECIMAL(19,0))
                        AS DECIMAL(38,0))) AS ip
            FROM {a} a JOIN {b} b ON a.d = b.d AND a.bucket = b.bucket
            GROUP BY a.d
        )"""


@register(
    "q_cm_join_size",
    oracle=f"""
    WITH co AS (SELECT o_custkey AS item, COUNT(*) AS n
                FROM orders GROUP BY 1),
    cc AS (SELECT c_custkey AS item, COUNT(*) AS n
           FROM customer GROUP BY 1),
    lp AS (SELECT l_partkey AS item, COUNT(*) AS n
           FROM lineitem GROUP BY 1),
    cmo AS ({_sql_cm_table("co", 4096)}),
    cmc AS ({_sql_cm_table("cc", 4096)}),
    cml AS ({_sql_cm_table("lp", 4096)})
    SELECT 'orders_customer' AS pair,
           ({_sql_cm_ip("cmo", "cmc")}) AS est
    UNION ALL
    SELECT 'lineitem_self_partkey' AS pair,
           ({_sql_cm_ip("cml", "cml")}) AS est
    """,
    doc="sketch-based equi-join cardinality estimation "
    "(operators/cmsketch.py::cm_join_size — the AMS/CM inner-product "
    "estimator): |A join B on k| estimated as the min-over-depth "
    "bucketwise counter inner product, WITHOUT running the join. Two "
    "estimates: orders x customer on custkey (FK join) and the "
    "lineitem self-join on partkey (the skew-sensitive case planners "
    "care about: Σ cnt² blows up on hot keys). est >= true always; "
    "sizing cost is |counters| = depth x width rows per side — the "
    "100 TB planning primitive: a prospective shuffle is priced from "
    "KBs of sketch instead of scanning either input",
)
def q_cm_join_size(spark, sf_dir):
    from rag_pipelines_spark.operators.cmsketch import (
        cm_join_size,
        cm_partial,
    )

    from rag_pipelines_spark.operators.concurrency import checkpoint_all

    w = 4096
    # the orders and lineitem sketches are independent scans — overlap
    # their materialization jobs (guide §2.6) instead of running them
    # back to back; cmo feeds one product join, cml is consumed twice
    # (the self-join), cmc stays lazy (single consumer)
    cmo, cml = checkpoint_all(
        cm_partial(
            t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k")),
            [], "k", depth=4, width=w,
        ),
        cm_partial(
            t(spark, sf_dir, "lineitem").select(F.col("l_partkey").alias("k")),
            [], "k", depth=4, width=w,
        ),
    )
    cmc = cm_partial(
        t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")),
        [], "k", depth=4, width=w,
    )
    oc = cm_join_size(cmo, cmc).select(
        F.lit("orders_customer").alias("pair"), "est"
    )
    ls = cm_join_size(cml, cml).select(
        F.lit("lineitem_self_partkey").alias("pair"), "est"
    )
    return oc.unionByName(ls)


def _sql_profile_col(col: str, kind: str) -> str:
    """Oracle fragment: one profile row for `col` of orders. kind:
    'num' -> min/max as DOUBLE; 'str' -> min/max as VARCHAR;
    'ts' -> min/max formatted ISO (string order == time order)."""
    if kind == "num":
        mn, mx = f"CAST(MIN({col}) AS DOUBLE)", f"CAST(MAX({col}) AS DOUBLE)"
        sn = sx = "CAST(NULL AS VARCHAR)"
    elif kind == "ts":
        mn = mx = "CAST(NULL AS DOUBLE)"
        sn = f"strftime(MIN({col}), '%Y-%m-%d %H:%M:%S')"
        sx = f"strftime(MAX({col}), '%Y-%m-%d %H:%M:%S')"
    else:
        mn = mx = "CAST(NULL AS DOUBLE)"
        sn, sx = f"MIN({col})", f"MAX({col})"
    return f"""
        SELECT '{col}' AS col, COUNT(*) AS n,
               COUNT(*) - COUNT({col}) AS nulls,
               COUNT(DISTINCT {col}) AS ndv,
               {mn} AS min_d, {mx} AS max_d,
               {sn} AS min_s, {sx} AS max_s
        FROM orders"""


@register(
    "q_table_profile",
    oracle=" UNION ALL ".join(
        _sql_profile_col(c, k)
        for c, k in [
            ("o_orderkey", "num"), ("o_custkey", "num"),
            ("o_totalprice", "num"), ("o_orderstatus", "str"),
            ("o_orderpriority", "str"), ("o_orderdate", "ts"),
        ]
    ),
    doc="table profiling (the ANALYZE / data-quality primitive a 100 TB "
    "lake runs continuously): per-column row count, null count, EXACT "
    "distinct count, and min/max — numeric as double, strings native, "
    "timestamps ISO-formatted (string order == time order). One "
    "column-pruned scan per column (columnar parquet reads ONLY that "
    "column — deliberately NOT a single multi-distinct agg, whose "
    "Expand replicates the whole scan per distinct column: the "
    "q_agg_summary lesson), each reducing to one row map-side",
)
def q_table_profile(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    specs = [
        ("o_orderkey", "num"), ("o_custkey", "num"),
        ("o_totalprice", "num"), ("o_orderstatus", "str"),
        ("o_orderpriority", "str"), ("o_orderdate", "ts"),
    ]
    parts = []
    for c, kind in specs:
        base = o.select(c).agg(
            F.count(F.lit(1)).alias("n"),
            (F.count(F.lit(1)) - F.count(c)).alias("nulls"),
            F.countDistinct(c).alias("ndv"),
            F.min(c).alias("_mn"),
            F.max(c).alias("_mx"),
        )
        if kind == "num":
            mn = F.col("_mn").cast("double")
            mx = F.col("_mx").cast("double")
            sn = sx = F.lit(None).cast("string")
        elif kind == "ts":
            mn = mx = F.lit(None).cast("double")
            sn = F.date_format("_mn", "yyyy-MM-dd HH:mm:ss")
            sx = F.date_format("_mx", "yyyy-MM-dd HH:mm:ss")
        else:
            mn = mx = F.lit(None).cast("double")
            sn, sx = F.col("_mn"), F.col("_mx")
        parts.append(
            base.select(
                F.lit(c).alias("col"), "n", "nulls", "ndv",
                mn.alias("min_d"), mx.alias("max_d"),
                sn.alias("min_s"), sx.alias("max_s"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
