"""Pins for operators/pca.py (power-iteration PCA + quantization).

The oracle queries are differential-checked in test_oracle / driver_sim;
these pin operator-level contracts the oracle can't see: power-step
improvement, unit norm, quantization bounds, layout invariance, and the
zero-shuffle projection plan.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from rag_pipelines_spark.io import table
from rag_pipelines_spark.operators.pca import (
    column_means,
    pca_project,
    power_iterate,
    quantize_linear,
)
from tests.conftest import SF_DIR_SMOKE


def _emb(spark):
    return table(spark, SF_DIR_SMOKE, "embeddings")


def _rayleigh(spark, v):
    """v^T C v for the centered data, via the projection scores."""
    from rag_pipelines_spark.operators.pca import _centered, _dot_dec
    from rag_pipelines_spark.queries._util import dec_to_dbl

    emb = _emb(spark)
    means = column_means(emb, 64)
    sc = dec_to_dbl(_dot_dec(_centered(F.col("embedding"), means), v))
    return emb.select((sc * sc).alias("s2")).agg(F.sum("s2")).collect()[0][0]


def test_power_iteration_monotone_rayleigh(spark):
    """The captured variance v^T C v must be non-decreasing in the
    iteration count (the power-method invariant — catches a mis-centered
    score or a wrong per-dim re-aggregation)."""
    emb = _emb(spark)
    means = column_means(emb, 64)
    r = [
        _rayleigh(spark, power_iterate(emb, 64, iters, means))
        for iters in (1, 2, 3)
    ]
    assert r[0] <= r[1] + 1e-9 and r[1] <= r[2] + 1e-9
    # and it actually captures something
    assert r[2] > 0


def test_component_is_unit_norm(spark):
    v = power_iterate(_emb(spark), 64, 3)
    nrm = math.sqrt(math.fsum(c * c for c in v))
    assert abs(nrm - 1.0) < 1e-6  # round-9 components, 64 dims


def test_component_partitioning_invariant(spark):
    emb = _emb(spark)
    a = power_iterate(emb, 64, 2)
    b = power_iterate(emb.repartition(13, "vec_id"), 64, 2)
    assert a == b


def test_projection_plan_is_zero_shuffle(spark):
    """Projection folds literal (means, v) per row: no Exchange, no
    join, no window in the physical plan."""
    plan = (
        pca_project(_emb(spark), 64, 1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    for mark in ("Exchange", "Join", "Window"):
        assert mark not in plan, f"projection plan contains {mark}"


def test_pca_state_merge_invariance_and_replay(spark, tmp_path):
    """N merges == one-shot for the moment state (decimal sums are
    associative), replays are no-ops, and the state-served component
    agrees with the corpus-path fit up to the round-9 covariance
    quantization (cosine > 0.999 — they run DIFFERENT recurrences, so
    bit-equality is not the contract; the oracle pins the state path's
    own exactness)."""
    from rag_pipelines_spark.operators.pcastate import (
        merge_pca_moments,
        pca_component_from_state,
        pca_covariance_from_state,
    )

    emb = _emb(spark)
    split_root = str(tmp_path / "split")
    merge_pca_moments(spark, emb.filter(F.col("vec_id") % 2 == 0), split_root, epoch=0)
    merge_pca_moments(spark, emb.filter(F.col("vec_id") % 2 == 1), split_root, epoch=1)
    one_root = str(tmp_path / "one")
    merge_pca_moments(spark, emb, one_root, epoch=0)
    split_cov = sorted(
        map(tuple, pca_covariance_from_state(spark, split_root).collect())
    )
    one_cov = sorted(
        map(tuple, pca_covariance_from_state(spark, one_root).collect())
    )
    assert split_cov == one_cov
    # replayed micro-batch (same LATEST epoch): no-op — an OLDER epoch
    # would correctly raise the checkpoint-reset guard instead
    merge_pca_moments(spark, emb.filter(F.col("vec_id") % 2 == 1), split_root, epoch=1)
    assert (
        sorted(map(tuple, pca_covariance_from_state(spark, split_root).collect()))
        == split_cov
    )
    v_state, mu_state = pca_component_from_state(spark, split_root, 64, 3)
    v_corpus = power_iterate(emb, 64, 3)
    cos = abs(math.fsum(a * b for a, b in zip(v_state, v_corpus)))
    assert cos > 0.999, cos
    assert mu_state == column_means(emb, 64)


def test_quantize_bounds_and_reconstruction(spark):
    """Codes live in [0, 255]; reconstructing lo + code*scale
    under-estimates x by at most one scale step (floor quantization)."""
    emb = _emb(spark)
    q = quantize_linear(emb, 64)
    bad = q.filter((F.col("code") < 0) | (F.col("code") > 255)).count()
    assert bad == 0
    # reconstruction error bound, checked in one join-free pass per dim:
    # x - (lo + code*s) must lie in [0, s] (+1 ulp headroom) for every
    # non-constant dim
    pos = emb.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).withColumn("dim", F.col("pos") + 1)
    stats = pos.groupBy("dim").agg(
        F.min(F.col("x").cast("double")).alias("lo"),
        F.max(F.col("x").cast("double")).alias("hi"),
    )
    joined = (
        q.join(pos, ["vec_id", "dim"])
        .join(stats, "dim")
        .withColumn("s", (F.col("hi") - F.col("lo")) / 255)
        .withColumn(
            "err", F.col("x").cast("double") - (F.col("lo") + F.col("code") * F.col("s"))
        )
    )
    out = joined.agg(F.min("err"), F.max("err"), F.max("s")).collect()[0]
    assert out[0] >= -1e-9
    assert out[1] <= out[2] * (1 + 1e-6) + 1e-12
