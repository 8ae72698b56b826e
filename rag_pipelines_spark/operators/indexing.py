"""Scale-safe global row indexing.

The reference assigns each record a global sequence number and derives a
batch id from it (``fda_watcher.py:444-455`` — record index -> 10-row
batch). The naive Spark translation is ``row_number() OVER (ORDER BY k)``:
a global-sort window whose single ``Exchange SinglePartition`` moves the
entire table through one task — the classic 100 TB serialization point.

This module computes the identical index with only hashed exchanges:

1. bucket rows by an ORDER-PRESERVING block key
   ``_blk = floor(order_col / block_size)`` — floor-division is monotone,
   so every row in block k sorts before every row in block k+1;
2. count rows per block (one distributed hash aggregation);
3. turn counts into cumulative start offsets with a window over the TINY
   per-block frame (one row per block — the same "global window over a
   small aggregate" pattern used for grand totals elsewhere in this repo);
4. broadcast the offsets back and add a block-LOCAL ``row_number`` — a
   window partitioned on ``_blk``, i.e. a normal hashed exchange that
   scales out with the data.

Requirements: ``order_col`` is numeric and unique (ties inside a block
would make the index nondeterministic). Block-size choice only affects
balance, never correctness; pick it so ``count/block_size`` blocks are
each small enough for one task (id-range skew concentrates rows in few
blocks — if ids are very non-uniform, pre-map them through a quantile
bucketizer instead).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _quoted(name: str) -> str:
    """Backtick-quote an identifier for use inside ``F.expr`` (embedded
    backticks doubled, per Spark SQL quoting rules) so column names with
    dots/spaces/hyphens parse as one identifier instead of a nested-field
    path or a syntax error."""
    return "`" + name.replace("`", "``") + "`"


def global_row_index(
    df: DataFrame,
    order_col: str,
    block_size: int = 4096,
    out_col: str = "row_index",
) -> DataFrame:
    """Append a 0-based dense global index of rows ordered by ``order_col``
    without ever sorting globally."""
    # integer `div`, not floor(x/y): stays in long arithmetic (no double
    # cast that loses precision past 2^53) and still maps contiguous value
    # ranges to monotonically ordered block ids
    with_blk = df.withColumn(
        "_blk", F.expr(f"{_quoted(order_col)} div {int(block_size)}")
    )
    counts = with_blk.groupBy("_blk").agg(F.count("*").alias("_n"))
    # cumulative offsets over the per-block frame: |blocks| rows, driver-free.
    # Deliberately UNPARTITIONED: the frame is one row per block, bounded by
    # rows/block_size — WindowExec's "No Partition Defined" warning is the
    # documented-harmless case here (a constant partition key would be
    # folded away by EliminateWindowPartitions anyway); the tiny-frame
    # allowlist lint in tests/test_plans.py pins exactly which queries may
    # carry such a window.
    w_off = Window.orderBy("_blk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = counts.withColumn(
        "_off", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).cast("long")
    ).drop("_n")
    w_local = Window.partitionBy("_blk").orderBy(order_col)
    return (
        with_blk.join(F.broadcast(offsets), "_blk")
        .withColumn(
            out_col,
            (F.row_number().over(w_local) - 1 + F.col("_off")).cast("long"),
        )
        .drop("_blk", "_off")
    )


def global_ntile(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int,
    block_size: int = 64,
    out_col: str = "bucket",
) -> DataFrame:
    """Exact 1-based NTILE(k) OVER (ORDER BY value_col, id_col) without a
    global sort — curriculum/quality binning at corpus scale.

    Same block-offset scheme as global_row_index, with the block key
    derived from the VALUE range (``value_col div block_size``), so equal
    values always share a block and the (value, id) order is globally
    consistent across blocks. ``value_col`` must be a non-negative
    integral column (pre-bucketize floats, e.g. ``(score*1e6).cast(long)``);
    ``id_col`` breaks ties deterministically.

    The tiny per-block frame carries both the cumulative start offset and
    the grand total n (two windows over |blocks| rows); the NTILE bucket
    is then pure row-local arithmetic on the dense 0-based index idx:
    the first ``n % k`` buckets get ``n div k + 1`` rows, the rest
    ``n div k`` — exactly SQL NTILE semantics.
    """
    with_blk = df.withColumn(
        "_blk", F.expr(f"{_quoted(value_col)} div {int(block_size)}")
    )
    counts = with_blk.groupBy("_blk").agg(F.count("*").alias("_cn"))
    # same deliberately-unpartitioned tiny frame as global_row_index above
    w_off = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "_blk",
        F.coalesce(F.sum("_cn").over(w_off), F.lit(0)).cast("long").alias("_off"),
        F.sum("_cn").over(w_all).cast("long").alias("_tot"),
    )
    w_local = Window.partitionBy("_blk").orderBy(value_col, id_col)
    joined = (
        with_blk.join(F.broadcast(offsets), "_blk")
        .withColumn(
            "_idx",
            (F.row_number().over(w_local) - 1 + F.col("_off")).cast("long"),
        )
    )
    # NTILE: big = n % k buckets of (n div k + 1) rows, then (n div k)
    # rows. All integer `div` arithmetic (same >2^53 rationale as the
    # block key above). When n < k, small_sz = 0 and EVERY row satisfies
    # _idx < cut (cut = n), so the zero-divisor branch is provably
    # unreachable — the explicit small_sz > 0 guard still makes that
    # safe under ANSI without relying on CASE laziness.
    kk = int(k)
    bucket0 = F.when(
        F.col("_idx") < F.expr(f"(_tot % {kk}) * (_tot div {kk} + 1)"),
        F.expr(f"_idx div (_tot div {kk} + 1)"),
    ).when(
        F.expr(f"_tot div {kk}") > 0,
        F.expr(
            f"_tot % {kk} + (_idx - (_tot % {kk}) * (_tot div {kk} + 1))"
            f" div (_tot div {kk})"
        ),
    )
    return (
        joined.withColumn(out_col, (bucket0 + 1).cast("long"))
        .drop("_blk", "_off", "_tot", "_idx")
    )
