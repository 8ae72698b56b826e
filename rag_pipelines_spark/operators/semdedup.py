"""Semantic (embedding-space) near-deduplication — SemDeDup-style.

Cluster the corpus embeddings, then drop documents whose embedding is
near-identical (cosine >= threshold) to a lower-id document in the SAME
cluster — the within-cluster restriction is what makes the operation
scale: pairwise comparison happens only inside clusters of bounded size,
never corpus x corpus (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"). Complements the
lexical tiers (exact / MinHash / substring): embedding-space duplicates
need not share a single token. Beyond the reference surface (§2.11
north-star; the reference dedups exact records only).

Spark-first, oracle-checkable design:

  * **Deterministic hash-seeded centroids.** Seeds are the k corpus
    vectors with the smallest (md5(id), id) — layout-stable, engine-
    portable (DuckDB computes the identical seed set), and no float
    averaging, so the "centroids" are exact fp32 data vectors. Callers
    with real cluster structure can pass kmeans-refined centroids
    (operators/similarity.py::kmeans_refine) via `seeds` instead; the
    hash-seeded default is the oracle-checked tier.
  * **Assignment is the IVF pattern, two-phase**: one Arrow-batched
    float64 matmul pass over the corpus against the driver-collected
    seed matrix prunes each row's k seeds to a provably-sufficient
    margin set (~1 candidate), and only those pay the exact decimal
    fold — |N|·k FLOPs plus |N| exact dots, corpus never shuffles. k
    derives from a target cluster size, so cluster populations — and
    with them the within-cluster pair count — stay bounded as the
    corpus grows. (One-phase scored all |N|·k pairs through the
    interpreted decimal fold: |N|²/target interpreted BigDecimal ops,
    the scale bug the sf100 rung caught in r8.)
  * **Bitwise-deterministic scores.** Dot products are double products
    (exact for fp32 inputs) folded through decimal(30,15) — order-
    independent — and cosines are rounded to 9 decimals before ANY
    comparison, so assignment, tie-breaks, and the threshold test make
    identical decisions in Spark and DuckDB (same scheme as
    q_cosine_topk).
  * **Greedy min-id witness rule**: a document is dropped iff some
    SAME-CLUSTER document with a smaller id has cosine >= threshold to
    it — deterministic under any partitioning, one equi-join on the
    cluster id. (Connected-component keeper semantics are the separate
    q_dup_clusters operator; SemDeDup itself keeps one exemplar per
    near-duplicate neighborhood, which the witness rule reproduces for
    the tight-pair case.)

100 TB posture: the only corpus-sized shuffles are the assignment
window (partitioned by doc id — re-expressible as max_by if the window
ever shows up in a profile) and the within-cluster self-equi-join whose
volume is sum_c |c|^2 — bounded by target_cluster_size * N, tunable,
and the exact knob SemDeDup's k controls. Seeds broadcast is k·dim
floats; for k beyond broadcast limits, assignment switches to the LSH /
IVF machinery in operators/similarity.py.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

__all__ = ["semantic_dedup", "ivf_topk_exact"]

_DEC = "decimal(30,15)"


def _dot_dec(a, b):
    """Order-independent exact dot product (double products summed as
    decimals via a left fold) — the cross-engine-bitwise scheme shared
    with q_cosine_topk."""
    prods = F.zip_with(
        a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(_DEC)
    )
    return F.aggregate(
        prods, F.lit(0).cast(_DEC), lambda acc, x: (acc + x).cast(_DEC)
    )


def _cos9(dot, n2a, n2b):
    return F.round(dot / (F.sqrt(n2a) * F.sqrt(n2b)), 9)


# Margin between the float64-matmul cosine and the exact decimal-fold
# cos9: the decimal(30,15) per-element rounding perturbs a 64-dim dot by
# <= 3.2e-14, float64 accumulation by ~1e-14, and round-9 by 5e-10 —
# 1e-6 is ~1000x the worst stack-up, so the pruned candidate set
# provably contains the exact argmax.
_ASSIGN_MARGIN = 1e-6


def _margin_candidates_udf(seed_mat, margin=_ASSIGN_MARGIN):
    """array<int> of seed INDICES (positions in the caller's id-sorted
    seed list) whose float64 cosine is within `margin` of the row's max
    — the cheap Arrow-batched pre-pass that prunes the n x k assignment
    down to ~1 exact-scored candidate per row.

    Index-keyed on purpose: the caller maps indices back to seed ids
    through a broadcast (index, seed_id) frame, so the id type stays
    opaque — string / decimal ids work (the r8 form returned
    array<long> of ids and crashed on non-integer id columns).

    Null / zero-norm vectors return [0] (= the smallest seed_id, since
    the seed list is id-sorted): the exact path ranks their
    all-null/NaN scores by (nulls-last, seed_id asc), which always
    elects the smallest seed — the fallback reproduces that with one
    candidate instead of k. A vector whose length differs from the
    seed dimension fails fast with a clear message (np.asarray over a
    ragged batch would otherwise build an object array and surface an
    opaque executor-side matmul error).
    """
    mat_t = seed_mat.T  # (d, k)
    seed_norms = np.sqrt((seed_mat * seed_mat).sum(axis=1))
    dim = seed_mat.shape[1]

    @pandas_udf("array<int>")
    def f(v: pd.Series) -> pd.Series:
        vals = v.tolist()
        out = [[0]] * len(vals)  # index 0 = smallest seed_id
        live = [i for i, t in enumerate(vals) if t is not None]
        if live:
            bad = next((i for i in live if len(vals[i]) != dim), None)
            if bad is not None:
                raise ValueError(
                    f"semantic_dedup: embedding length {len(vals[bad])} "
                    f"!= seed dimension {dim} — ragged vector column"
                )
            x = np.asarray([vals[i] for i in live], dtype=np.float64)
            xn = np.sqrt((x * x).sum(axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                cos = (x @ mat_t) / (xn[:, None] * seed_norms[None, :])
            cos = np.where(np.isfinite(cos), cos, -np.inf)
            mx = cos.max(axis=1)
            for j, i in enumerate(live):
                if mx[j] != -np.inf:
                    sel = np.nonzero(cos[j] >= mx[j] - margin)[0]
                    out[i] = [int(s) for s in sel]
        return pd.Series(out, dtype=object)

    return f


def semantic_dedup(
    emb: DataFrame,
    id_col: str,
    vec_col: str,
    threshold: float = 0.3,
    target_cluster: int = 32,
    seeds: DataFrame | None = None,
) -> DataFrame:
    """(id_col, cluster_id, kept) for every input row; kept = 0 iff a
    smaller-id same-cluster row has cosine >= threshold.

    `seeds`: optional (seed_id, seed_vec) frame of centroid vectors (e.g.
    kmeans-refined). Default: k = ceil(n / target_cluster) hash-seeded
    corpus vectors (deterministic, oracle-portable).
    """
    norms = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _dot_dec(F.col(vec_col), F.col(vec_col)).cast("double").alias("n2"),
    )
    if seeds is None:
        n = emb.count()
        k = max(1, math.ceil(n / target_cluster))
        seed_frame = (
            norms.select(
                F.col("id").alias("seed_id"),
                F.col("v").alias("sv"),
                F.col("n2").alias("sn2"),
                F.md5(F.col("id").cast("string")).alias("h"),
            )
            .orderBy("h", "seed_id")  # distributed top-k, no global sort
            .limit(k)
            .drop("h")
        )
    else:
        seed_frame = seeds.select(
            F.col(seeds.columns[0]).alias("seed_id"),
            F.col(seeds.columns[1]).alias("sv"),
        ).withColumn("sn2", _dot_dec(F.col("sv"), F.col("sv")).cast("double"))

    # Assignment is two-phase (r8 — the sf100 rung exposed the one-phase
    # form): a float64 Arrow matmul against the driver-collected seed
    # matrix prunes each row's k seeds to the within-margin candidate
    # set (~1), and ONLY those pay the exact decimal-fold cos9 + rank.
    # One-phase scored every n x k pair through the INTERPRETED
    # BigDecimal fold — n^2/target_cluster interpreted decimal ops, 45+
    # min at sf100 (200k x 6250 seeds) vs seconds for the matmul. The
    # margin argument (above _ASSIGN_MARGIN) makes the pruned result
    # bitwise-identical to the full rank, so the DuckDB oracle is
    # unchanged. Seed collect is centroid-sized (k x dim doubles — same
    # driver-size tier as similarity.py::_collect_cents).
    seed_rows = sorted(
        seed_frame.select("seed_id", "sv").collect(), key=lambda r: r[0]
    )
    dims = {len(r[1]) for r in seed_rows if r[1] is not None}
    if len(dims) > 1:
        raise ValueError(
            f"semantic_dedup: seed vectors have mixed lengths {sorted(dims)}"
            " — ragged vector column"
        )
    dim = dims.pop() if dims else 0
    # null-vector seeds keep their index slot as a zero row: zero norm
    # -> -inf cosine in the margin pass, so they are never emitted as a
    # candidate — matching the exact path, where their null score sorts
    # nulls-last and can only be elected via the [index 0] tie fallback
    seed_mat = np.asarray(
        [r[1] if r[1] is not None else [0.0] * dim for r in seed_rows],
        dtype=np.float64,
    )
    cand_udf = _margin_candidates_udf(seed_mat)
    # index -> seed_id mapping as a broadcast k-row frame, typed from
    # the seed frame itself so ids of ANY orderable type survive the
    # round trip (ints, strings, decimals — not just int64)
    from pyspark.sql.types import IntegerType, StructField, StructType

    seed_idx = emb.sparkSession.createDataFrame(
        [(i, r[0]) for i, r in enumerate(seed_rows)],
        StructType(
            [
                StructField("_sidx", IntegerType(), False),
                StructField("seed_id", seed_frame.schema["seed_id"].dataType, True),
            ]
        ),
    )
    scored = (
        norms.withColumn("_sidx", F.explode(cand_udf(F.col("v"))))
        .join(F.broadcast(seed_idx), "_sidx")
        .drop("_sidx")
        .join(F.broadcast(seed_frame), "seed_id")
        .select(
            "id",
            "v",
            "n2",
            "seed_id",
            _cos9(
                _dot_dec(F.col("v"), F.col("sv")), F.col("n2"), F.col("sn2")
            ).alias("scos"),
        )
    )
    # nulls last on BOTH engines (DuckDB DESC defaults nulls-first)
    w = Window.partitionBy("id").orderBy(F.desc_nulls_last("scos"), F.asc("seed_id"))
    assigned = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("id", "v", "n2", F.col("seed_id").alias("cluster_id"))
    )
    a = assigned.select(
        F.col("id").alias("a_id"),
        F.col("v").alias("av"),
        F.col("n2").alias("an2"),
        "cluster_id",
    )
    b = assigned.select(
        F.col("id").alias("b_id"),
        F.col("v").alias("bv"),
        F.col("n2").alias("bn2"),
        "cluster_id",
    )
    dropped = (
        a.join(b, "cluster_id")
        .filter(F.col("a_id") < F.col("b_id"))
        .filter(
            _cos9(_dot_dec(F.col("av"), F.col("bv")), F.col("an2"), F.col("bn2"))
            >= F.lit(threshold)
        )
        .select("b_id")
        .distinct()
    )
    return (
        assigned.join(dropped, assigned["id"] == dropped["b_id"], "left")
        .select(
            F.col("id").alias(id_col),
            "cluster_id",
            F.when(F.col("b_id").isNull(), 1).otherwise(0).alias("kept"),
        )
    )


def ivf_topk_exact(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k_seeds: int = 32,
    nprobe: int = 2,
    k: int = 5,
) -> DataFrame:
    """IVF approximate top-k with FULLY deterministic, engine-portable
    semantics — the oracle-checked twin of the numpy IVF tier
    (operators/similarity.py::cosine_topk_ivf, rows-only by design).

    Same centroid scheme as semantic_dedup: the k_seeds corpus vectors
    with smallest (md5(id), id) are the cells — no float averaging, so
    DuckDB reproduces cells, assignments, probes, and scores
    bit-for-bit. Corpus rows assign to their nearest cell (decimal-fold
    cosine, round-9, tie-break min seed id); each query probes its
    `nprobe` nearest cells and exact-scores ONLY the vectors in them
    (the IVF contract: candidates come from an equi-join on the cell
    id, never query x corpus). Output (q_id, c_id, cosine, rk) matches
    the exact-baseline contract of q_cosine_topk, so recall against the
    exact answer is directly measurable.

    Scale: one N·k_seeds assignment pass against broadcast seeds (the
    corpus never shuffles for index build) + candidate scoring sized
    |queries|·nprobe·(N/k_seeds). k_seeds is fixed here for the
    verification tier; production sizing (k ~ sqrt(N), kmeans-refined
    centroids, multi-probe) lives in operators/similarity.py.
    """
    norms = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _dot_dec(F.col(vec_col), F.col(vec_col)).cast("double").alias("n2"),
    )
    seed_frame = (
        norms.select(
            F.col("id").alias("seed_id"),
            F.col("v").alias("sv"),
            F.col("n2").alias("sn2"),
            F.md5(F.col("id").cast("string")).alias("h"),
        )
        .orderBy("h", "seed_id")
        .limit(k_seeds)
        .drop("h")
    )

    def nearest(frame, n_cells):
        scored = frame.crossJoin(F.broadcast(seed_frame)).select(
            frame["id"],
            frame["v"],
            frame["n2"],
            "seed_id",
            _cos9(
                _dot_dec(frame["v"], F.col("sv")), frame["n2"], F.col("sn2")
            ).alias("scos"),
        )
        w = Window.partitionBy("id").orderBy(
            F.desc_nulls_last("scos"), F.asc("seed_id")
        )
        return (
            scored.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= n_cells)
            .select("id", "v", "n2", F.col("seed_id").alias("cell"))
        )

    cells = nearest(norms, 1)
    qnorms = queries.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        _dot_dec(F.col(vec_col), F.col(vec_col)).cast("double").alias("n2"),
    )
    probes = nearest(qnorms, nprobe).select(
        F.col("id").alias("q_id"),
        F.col("v").alias("qv"),
        F.col("n2").alias("qn2"),
        "cell",
    )
    cand = probes.join(
        cells.select(
            F.col("id").alias("c_id"),
            F.col("v").alias("cv"),
            F.col("n2").alias("cn2"),
            "cell",
        ),
        "cell",
    ).filter(F.col("q_id") != F.col("c_id"))
    scored = cand.select(
        "q_id",
        "c_id",
        _cos9(_dot_dec(F.col("qv"), F.col("cv")), F.col("qn2"), F.col("cn2")).alias(
            "cosine"
        ),
    ).distinct()  # a candidate reachable via two probed cells scores once
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("c_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("q_id", "c_id", "cosine", "rk")
    )
