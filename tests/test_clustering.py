"""Pins for operators/clustering.py (Lloyd k-means + balanced curation).

The oracle queries themselves are differential-checked in test_oracle /
driver_sim; these tests pin the operator-level contracts the oracle
can't see: two-phase-rank equivalence, monotone improvement, empty
cluster semantics, and the zero-shuffle assignment plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rag_pipelines_spark.io import table
from rag_pipelines_spark.operators.clustering import (
    assign_clusters,
    assign_clusters_join,
    cluster_balanced_topm,
    kmeans_fit,
    seed_centroids,
)
from tests.conftest import SF_DIR_SMOKE


def _emb(spark):
    return table(spark, SF_DIR_SMOKE, "embeddings")


def test_balanced_topm_equals_single_phase_rank(spark):
    """The salted two-phase top-m must be row-identical to the plain
    single-phase rank, for several salt widths (including 1 = degenerate
    single-phase and a width larger than any cluster)."""
    assigned, _ = kmeans_fit(_emb(spark), k=8, iters=1, d=64)
    assigned = assigned.cache()
    w = Window.partitionBy("cluster").orderBy("dist", "vec_id")
    expect = sorted(
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 20)
        .select("vec_id", "cluster", "rk")
        .collect()
    )
    for buckets in (1, 4, 1024):
        got = sorted(
            cluster_balanced_topm(assigned, m=20, salt_buckets=buckets).collect()
        )
        assert got == expect, f"salt_buckets={buckets} diverged"
    assigned.unpersist()


def test_lloyd_iterations_do_not_increase_cost(spark):
    """Total within-cluster squared distance is non-increasing in the
    iteration count (the Lloyd invariant — catches a wrong argmin or a
    mean computed over the wrong membership)."""
    emb = _emb(spark)
    costs = []
    for iters in (0, 1, 2):
        assigned, _ = kmeans_fit(emb, k=8, iters=iters, d=64)
        costs.append(
            assigned.agg(F.sum(F.col("dist").cast("double"))).collect()[0][0]
        )
    assert costs[1] <= costs[0] + 1e-9
    assert costs[2] <= costs[1] + 1e-9


def test_empty_clusters_drop_identically(spark):
    """k seeds on a frame with fewer distinct points than k: ties all
    break to the lowest cluster id, the rest go empty and are dropped by
    the update — the fit must survive and keep cluster ids stable."""
    rows = [(i, [1.0, 2.0]) for i in range(3)]  # 3 identical vectors
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    assigned, cents = kmeans_fit(df, k=3, iters=2, d=2)
    got = assigned.select("cluster").distinct().collect()
    assert [r["cluster"] for r in got] == [0]  # all tie to lowest id
    assert len(cents) == 1 and cents[0][0] == 0


def test_assignment_plan_is_zero_shuffle(spark):
    """The assignment stage must be pure column math: no Exchange, no
    join, no window in the physical plan (centroids are literals)."""
    cents = seed_centroids(_emb(spark), k=8)
    plan = assign_clusters(_emb(spark), cents)._jdf.queryExecution().executedPlan().toString()
    for mark in ("Exchange", "Join", "Window"):
        assert mark not in plan, f"assignment plan contains {mark}:\n{plan}"


def test_join_assignment_equals_literal_assignment(spark):
    """The broadcast-join assignment (large-k path, used by the kmeans
    state family) must be row-identical to the literal-expression path —
    same decimal distances, same (dist, cluster) tie-break."""
    emb = _emb(spark)
    cents = seed_centroids(emb, k=8)
    lit = sorted(
        (r["vec_id"], r["cluster"], r["dist"])
        for r in assign_clusters(emb, cents).collect()
    )
    jn = sorted(
        (r["vec_id"], r["cluster"], r["dist"])
        for r in assign_clusters_join(emb, cents).collect()
    )
    assert jn == lit


def test_seed_centroids_partitioning_invariant(spark):
    """Hash seeding must not depend on layout: a repartitioned input
    yields the same seeds in the same order."""
    emb = _emb(spark)
    a = seed_centroids(emb, k=8)
    b = seed_centroids(emb.repartition(13, "vec_id"), k=8)
    assert a == b


def test_guarded_argmin_equals_forced_decimal_argmin(spark):
    """The r10 guarded fast path (double argmin unless boundary-risky)
    must be row-identical — cluster AND exact decimal dist — to the
    all-decimal argmin (SPARK_GRAFT_KMEANS_GUARD=1e9 pushes every row
    down the decimal branch). Runs a full Lloyd fit so the pin covers
    the iterated assignment, not just one pass."""
    import os

    emb = _emb(spark)

    def rows():
        assigned, cents = kmeans_fit(emb, k=8, iters=2, d=64)
        return (
            sorted(
                (r["vec_id"], r["cluster"], r["dist"])
                for r in assigned.collect()
            ),
            cents,
        )

    fast = rows()
    os.environ["SPARK_GRAFT_KMEANS_GUARD"] = "1e9"
    try:
        slow = rows()
    finally:
        del os.environ["SPARK_GRAFT_KMEANS_GUARD"]
    assert fast == slow
