"""Covariance-free top principal component (distributed power iteration)
and linear embedding quantization — bit-reproducible.

Why it exists: embedding post-processing is a standard stage of a
large-scale curation pipeline — top-component removal / whitening
("All-but-the-top", Mu & Viswanath 2018) before similarity search, and
int8-style linear quantization to cut the dominant storage/IO cost of a
100 TB embedding corpus by 4x. The reference has no embedding stage;
this extends the §2.11 north-star tier the same way clustering.py does.

Spark-first / 100 TB posture (power iteration):
  * NO covariance materialization: the d x d Gram product is replaced by
    the matrix-free identity  w = X_c^T (X_c v)  — per row one dot
    product against a LITERAL direction (zero shuffle) and one
    map-side-combinable long-form agg (shuffle = d rows). Even the
    d x d case never exists anywhere.
  * Centering is a literal-mean subtraction fused into the per-row
    expression (means collected once — d doubles, the centroid-sized
    collect precedent of operators/similarity.py:254).
  * Normalization is the broadcast 1-row-agg-join pattern
    (operators/sampling.py:76) over the d-row w frame — in-plan, so
    every published float is rounded BY THE ENGINE; the driver only
    ever collects already-rounded doubles (no Python float math to
    mirror cross-engine).
  * Each iteration costs one corpus pass; iterations are bounded.

Cross-engine determinism: per-row dots and per-dim sums fold through
DECIMAL(30,15) (order-independent); direction components are
round(w / sqrt(n2), 9) where n2 itself folds the d squared coordinates
through decimals. The DuckDB oracle (queries/pca.py) replays the same
bounded iterations as chained CTEs. Power iteration from the uniform
start v0 = 1/sqrt(d) (exact for d a power of 4) is sign-deterministic —
both engines run the identical recurrence, so no sign convention is
needed.

Quantization: per-dim min/max from ONE long-form hash agg (shuffle = d
rows), scale published round-9 and embedded as a literal, codes are
floor/clamp integer math — zero-shuffle assignment.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.vecexpr import (
    dbl_array_sql,
    dec_to_dbl_sql,
    hof_dot_dec_sql,
)
from rag_pipelines_spark.queries._util import dec_to_dbl

__all__ = [
    "column_means",
    "power_iterate",
    "pca_component_frame",
    "pca_project",
    "quantize_linear",
]

_DEC = "decimal(30,15)"


def _fold(arr: Column) -> Column:
    """Order-independent decimal sum of an array<decimal> column."""
    return F.aggregate(arr, F.lit(0).cast(_DEC), lambda a, x: (a + x).cast(_DEC))


def _lit_arr(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in vals])


def column_means(
    df: DataFrame, d: int, vec_col: str = "embedding"
) -> list[float]:
    """Round-9 per-dimension means: one map-side-combinable agg of d
    decimal sums plus a count. Rounding happens in-engine; the collect
    is d already-published doubles.

    r10: built as two selectExpr stages (agg row, then publish) instead
    of d py4j-assembled Columns — one parse, flat codegen-able
    expressions, identical arithmetic (vecexpr.py rationale)."""
    agg = df.selectExpr(
        "COUNT(*) AS n",
        *[
            f"SUM(CAST(CAST(`{vec_col}`[{i}] AS DOUBLE) AS {_DEC}))"
            f" AS _s{i}"
            for i in range(d)
        ],
    )
    row = agg.selectExpr(
        *[
            f"round({dec_to_dbl_sql(f'_s{i}')} / n, 9) AS m{i}"
            for i in range(d)
        ]
    ).collect()[0]
    return [row[f"m{i}"] for i in range(d)]


def _centered(vec_col: Column, means: list[float]) -> Column:
    return F.zip_with(vec_col, _lit_arr(means), lambda x, m: x.cast("double") - m)


def _dot_dec(arr: Column, lit_vals: list[float]) -> Column:
    prods = F.zip_with(arr, _lit_arr(lit_vals), lambda x, v: (x * v).cast(_DEC))
    return _fold(prods)


def _power_step_frame(
    df: DataFrame, means: list[float], v: list[float], vec_col: str = "embedding"
) -> DataFrame:
    """(dim, v) after one power step from literal direction `v`:
    w_j = sum_i (x_ci . v) * x_cij through decimals, normalized by n2,
    published round-9. dim is 1-based.

    r10 shape (guide §2.3/§2.4 + vecexpr.py rationale): ONE wide global
    agg of d decimal sums replaces the posexplode(d x corpus rows) +
    groupBy(dim) long-form agg — the per-row d-way explode and its
    d-row shuffle drop out entirely; the score pass and the update pass
    fuse into a single corpus scan. n2 and the round-9 normalization
    happen on the 1-row agg result (the same exact decimal terms the
    64-row SUM folded — both exact at these magnitudes), and the
    (dim, v) frame is a posexplode of that single row. Values are
    bit-identical to the r9 long-form shape (pinned in
    tests/test_vecexpr.py; oracle hashes unchanged)."""
    d = len(means)
    # centered array + score via the SAME zip_with/aggregate HOFs as r9
    # (JIT-friendly per-row runtime — see hof_fold_dec_sql rationale),
    # built as SQL text; the HOFs are non-cheap so the optimizer
    # materializes _xc/_scd here instead of inlining them 65x into the
    # wide agg.
    xc_sql = (
        f"zip_with(`{vec_col}`, {dbl_array_sql(means)},"
        f" (x, m) -> CAST(x AS DOUBLE) - m)"
    )
    scored = (
        df.selectExpr(f"{xc_sql} AS _xc")
        .selectExpr(
            f"{hof_dot_dec_sql('_xc', dbl_array_sql(v), cast_inputs=False)}"
            f" AS _scd",
            "_xc",
        )
        .selectExpr(f"{dec_to_dbl_sql('_scd')} AS _sc", "_xc")
    )
    w1 = scored.selectExpr(
        *[
            f"SUM(CAST((_sc * _xc[{j}]) AS {_DEC})) AS _ws{j}"
            for j in range(d)
        ]
    ).selectExpr(
        *[f"{dec_to_dbl_sql(f'_ws{j}')} AS _w{j}" for j in range(d)]
    )
    # (dim, w) from the single agg row; n2 is the SAME Sum-typed decimal
    # aggregate as r9 but expressed as an unpartitioned window over this
    # d-row frame (d = 64 BY CONTRACT — tiny-frame window precedent,
    # tests/test_plans.py TINY_FRAME_WINDOW_OK): consuming `w` once
    # instead of self-joining it against its own 1-row agg keeps exactly
    # ONE corpus pass per power step in the plan (the r9 shape evaluated
    # the corpus agg subtree twice) and keeps the optimizer off a
    # duplicated flat-expression subtree. Identical Sum buffer type ->
    # identical value -> identical round-9 publication.
    from pyspark.sql.window import Window

    w = w1.select(
        F.posexplode(
            F.expr("array(" + ", ".join(f"_w{j}" for j in range(d)) + ")")
        ).alias("pos", "w")
    ).selectExpr("CAST(pos + 1 AS INT) AS dim", "w")
    n2 = dec_to_dbl(
        F.sum((F.col("w") * F.col("w")).cast(_DEC)).over(
            Window.partitionBy().rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
    )
    return w.select(
        "dim", F.round(F.col("w") / F.sqrt(n2), 9).alias("v")
    )


def power_iterate(
    df: DataFrame,
    d: int,
    iters: int,
    means: list[float] | None = None,
    vec_col: str = "embedding",
) -> list[float]:
    """Top principal direction of the centered embedding matrix after
    `iters` bounded power steps from the uniform start v0 = 1/sqrt(d).
    Collects d rounded doubles per step (centroid-sized)."""
    if means is None:
        means = column_means(df, d, vec_col)
    v = [1.0 / math.sqrt(d)] * d
    if iters <= 0:
        return v
    # Persist the (narrow) vector column across steps: every step is a
    # full pass over the corpus, and without this each one re-reads the
    # parquet scan (iters× the I/O — r9 verdict). Value-neutral: caching
    # changes where bytes come from, never what they are; the published
    # doubles are bit-identical either way. MEMORY_AND_DISK so a corpus
    # larger than executor memory spills instead of evicting to re-read.
    from pyspark import StorageLevel

    base = df.select(vec_col).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        for _ in range(iters):
            rows = _power_step_frame(base, means, v, vec_col).collect()
            got = {int(r["dim"]): r["v"] for r in rows}
            v = [got[j + 1] for j in range(d)]
    finally:
        base.unpersist(blocking=False)
    return v


def pca_component_frame(
    df: DataFrame, d: int, iters: int, vec_col: str = "embedding"
) -> DataFrame:
    """(dim, v): the fitted direction with the LAST step left in-plan —
    the returned frame is a distributed computation, not driver data."""
    means = column_means(df, d, vec_col)
    v = power_iterate(df, d, iters - 1, means, vec_col) if iters > 1 else [
        1.0 / math.sqrt(d)
    ] * d
    return _power_step_frame(df, means, v, vec_col)


def pca_project(
    df: DataFrame,
    d: int,
    iters: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, score): round-9 projection of each centered embedding onto
    the fitted direction — a zero-shuffle map over literal (means, v)."""
    means = column_means(df, d, vec_col)
    v = power_iterate(df, d, iters, means, vec_col)
    xc_sql = (
        f"zip_with(`{vec_col}`, {dbl_array_sql(means)},"
        f" (x, m) -> CAST(x AS DOUBLE) - m)"
    )
    dot = hof_dot_dec_sql(xc_sql, dbl_array_sql(v), cast_inputs=False)
    return df.selectExpr(f"`{id_col}`", f"{dot} AS _sd").selectExpr(
        f"`{id_col}`", f"round({dec_to_dbl_sql('_sd')}, 9) AS score"
    )


def quantize_linear(
    df: DataFrame,
    d: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    levels: int = 255,
) -> DataFrame:
    """(id, dim, code): per-dimension linear quantization to
    [0, levels]. Per-dim min/max come from ONE long-form hash agg
    (shuffle = d rows); scale = round9((max-min)/levels) is embedded as
    a literal so code assignment is a zero-shuffle map:
    code = least(levels, floor((x - min) / scale)); constant dims
    (max == min) quantize to 0. dim is 1-based."""
    pos = df.select(F.posexplode(F.col(vec_col)).alias("pos", "x")).withColumn(
        "dim", F.col("pos") + 1
    )
    stats = (
        pos.groupBy("dim")
        .agg(
            F.min(F.col("x").cast("double")).alias("lo"),
            F.max(F.col("x").cast("double")).alias("hi"),
        )
        .select(
            "dim",
            "lo",
            F.when(
                F.col("hi") > F.col("lo"),
                F.round((F.col("hi") - F.col("lo")) / levels, 9),
            )
            .otherwise(F.lit(0.0))
            .alias("s"),
        )
        .collect()
    )
    lo = {int(r["dim"]): r["lo"] for r in stats}
    sc = {int(r["dim"]): r["s"] for r in stats}
    lo_arr = _lit_arr([lo[i + 1] for i in range(d)])
    sc_arr = _lit_arr([sc[i + 1] for i in range(d)])
    codes = F.zip_with(
        F.zip_with(F.col(vec_col), lo_arr, lambda x, m: x.cast("double") - m),
        sc_arr,
        lambda delta, s: F.when(s == F.lit(0.0), F.lit(0).cast("long")).otherwise(
            F.least(F.lit(levels).cast("long"), F.floor(delta / s))
        ),
    )
    return df.select(
        F.col(id_col), F.posexplode(codes).alias("pos", "code")
    ).select(F.col(id_col), (F.col("pos") + 1).alias("dim"), "code")
