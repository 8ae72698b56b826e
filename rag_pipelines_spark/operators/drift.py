"""Distribution-drift monitoring: KL divergence between a batch's hashed
n-gram distribution and the full-corpus reference — the data-quality
alarm a continuously-ingesting 100 TB pipeline runs per arriving batch
(has the crawl mix shifted? did a scraper start emitting boilerplate?).

Reuses DSIR's feature space (operators/dsir.py::hashed_ngram_features —
word uni+bigram bag hashed into n_buckets md5 buckets), so the monitored
distribution is the same one importance weighting trains on: drift here
means the DSIR log-ratio table is stale too.

KL(batch ‖ corpus) with add-1 smoothing over the FULL bucket domain:

    p_i = (cp_i + 1) / (P + n_buckets)     (batch)
    q_i = (cq_i + 1) / (Q + n_buckets)     (reference)
    KL  = Σ_i p_i · (ln p_i − ln q_i)      over ALL n_buckets buckets

Buckets unseen by both sides share one constant term — computed once and
multiplied by the empty-bucket count instead of materializing them.

Scale posture: the corpus-sized work is the feature explode + two
bucket-count hash-aggs (map-side combinable, shuffle = n_buckets rows,
never the corpus — the DSIR plan); everything after is arithmetic on
<= n_batches × n_buckets rows with broadcast 1-row totals (no
unpartitioned windows).

Cross-engine exactness: per-bucket terms are pure IEEE double
arithmetic on identical inputs (ln bit-equal between JVM and DuckDB
libm on this platform — the BM25 precedent), then quantized to integer
"nano-units" via FLOOR(term·1e9 + 0.5) — NOT round(term, 9): Spark
rounds doubles through the shortest-string BigDecimal while DuckDB
rounds the exact binary expansion, and over 10k near-half-boundary
terms a handful disagree by 1e-9 (observed: 3e-8 drift on this exact
query before the switch). FLOOR/·/+ are IEEE-exact single-rounding ops
both engines evaluate identically, and the nano-term sums are exact
BIGINT adds. kl = CAST(total_nanos AS DOUBLE)/1e9 — one identical
division on both sides.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.dsir import hashed_ngram_features


def kl_batch_drift(df: DataFrame, id_col: str, text_col: str, *,
                   n_batches: int = 3, n_buckets: int = 10_000) -> DataFrame:
    """(batch, occupied, kl): KL(batch ‖ full corpus) per id-modulo
    batch over the hashed uni+bigram bucket distributions. `occupied`
    is the reference side's occupied-bucket count (the n_buckets −
    occupied empties contribute the shared constant term)."""
    feats = hashed_ngram_features(df, id_col, text_col, n_buckets)
    # one corpus featurization feeds both distributions
    feats = feats.localCheckpoint(eager=True)
    full = feats.groupBy("bucket").agg(F.count("*").alias("cq"))
    full = full.localCheckpoint(eager=True)  # grid + totals consume it
    per = (
        feats.withColumn(
            "b", F.pmod(F.col(id_col), F.lit(n_batches)).cast("int")
        )
        .groupBy("b", "bucket")
        .agg(F.count("*").alias("cp"))
    )
    qtot = full.agg(
        F.sum("cq").alias("qt"), F.count("*").alias("occ")
    )  # 1 row, broadcast
    ptots = per.groupBy("b").agg(F.sum("cp").alias("pt"))  # n_batches rows
    batches = (
        df.sparkSession.range(n_batches)
        .select(F.col("id").cast("int").alias("b"))
    )
    grid = full.crossJoin(F.broadcast(batches))
    j = (
        grid.join(per, ["b", "bucket"], "left")
        .withColumn("cp", F.coalesce(F.col("cp"), F.lit(0)))
        .join(F.broadcast(ptots), "b")
        .crossJoin(F.broadcast(qtot))
    )
    nb = F.lit(n_buckets)
    p_i = (F.col("cp") + 1).cast("double") / (F.col("pt") + nb).cast("double")
    q_i = (F.col("cq") + 1).cast("double") / (F.col("qt") + nb).cast("double")
    term_nanos = F.floor(
        p_i * (F.log(p_i) - F.log(q_i)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    sums = j.groupBy("b").agg(
        F.sum(term_nanos).alias("nsum"),
        F.first("occ").alias("occ"),
        F.first("pt").alias("pt"),
        F.first("qt").alias("qt"),
    )
    p0 = F.lit(1.0) / (F.col("pt") + nb).cast("double")
    q0 = F.lit(1.0) / (F.col("qt") + nb).cast("double")
    term0_nanos = F.floor(
        p0 * (F.log(p0) - F.log(q0)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    total_nanos = F.col("nsum") + term0_nanos * (nb - F.col("occ")).cast(
        "long"
    )
    return sums.select(
        F.col("b").alias("batch"),
        F.col("occ").cast("long").alias("occupied"),
        (total_nanos.cast("double") / F.lit(1e9)).alias("kl"),
    )


def kl_against(p_counts: DataFrame, q_counts: DataFrame, *,
               n_buckets: int = 10_000) -> DataFrame:
    """One-row (occupied, kl): KL(p ‖ q) with add-1 smoothing over the
    full bucket domain, between two (bucket, cnt) frames. The reference
    side may be EMPTY (a first epoch scoring against no history): all
    cq = 0 makes q the uniform distribution — well-defined, and the
    natural "everything is novel" baseline.

    Domain accounting: buckets occupied by EITHER side join full-outer;
    the remaining (n_buckets − occupied-union) empties share one
    constant term computed once. Same nano-int float contract as
    kl_batch_drift (see module docstring). BOTH sides empty (e.g. a
    drift-gated first epoch where every doc was rejected upstream) is
    defined too: totals coalesce to 0, making both distributions the
    add-1 uniform → (occupied=0, kl=0.0), never a NULL row.

    Both inputs are bucket-count frames (<= n_buckets rows) — every
    join/agg here is sketch-sized, never corpus-sized."""
    p = p_counts.select("bucket", F.col("cnt").cast("long").alias("cp"))
    q = q_counts.select("bucket", F.col("cnt").cast("long").alias("cq"))
    j = (
        p.join(q, "bucket", "full_outer")
        .withColumn("cp", F.coalesce(F.col("cp"), F.lit(0)))
        .withColumn("cq", F.coalesce(F.col("cq"), F.lit(0)))
    )
    j = j.localCheckpoint(eager=True)  # totals + terms both consume it
    # Totals agg over a possibly-EMPTY j still yields exactly 1 row —
    # coalesce the sums so both-inputs-empty gives (pt=0, qt=0, occ=0)
    # instead of NULLs that would otherwise poison the constant term.
    tot = j.agg(
        F.coalesce(F.sum("cp"), F.lit(0)).alias("pt"),
        F.coalesce(F.sum("cq"), F.lit(0)).alias("qt"),
        F.count("*").alias("occ"),
    )
    jt = j.crossJoin(F.broadcast(tot))
    nb = F.lit(n_buckets)
    p_i = (F.col("cp") + 1).cast("double") / (F.col("pt") + nb).cast("double")
    q_i = (F.col("cq") + 1).cast("double") / (F.col("qt") + nb).cast("double")
    term_nanos = F.floor(
        p_i * (F.log(p_i) - F.log(q_i)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    # Occupied-bucket nano-sum as its own 1-row agg (0 when j is empty),
    # re-joined to the always-1-row totals: the output row exists even
    # when no bucket was ever occupied.
    nsums = jt.agg(
        F.coalesce(F.sum(term_nanos), F.lit(0)).alias("nsum")
    )
    sums = nsums.crossJoin(F.broadcast(tot))
    p0 = F.lit(1.0) / (F.col("pt") + nb).cast("double")
    q0 = F.lit(1.0) / (F.col("qt") + nb).cast("double")
    term0_nanos = F.floor(
        p0 * (F.log(p0) - F.log(q0)) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    total = F.col("nsum") + term0_nanos * (nb - F.col("occ")).cast("long")
    return sums.select(
        F.col("occ").cast("long").alias("occupied"),
        (total.cast("double") / F.lit(1e9)).alias("kl"),
    )
