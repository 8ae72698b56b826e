"""Mergeable frequent-items (heavy-hitters) sketch state — the
Misra-Gries / mergeable-summaries answer to the rollup's refusal of
holistic "top-k by frequency" (operators/rollup.py raises on it; this
module is the sketch tier, exactly as operators/histogram.py is the
sketch tier for percentiles).

Sketch (per group): at most ``m`` (item, est) counters plus the group's
EXACT accumulated pruning offset ``err`` (the sum of the (m+1)-th-count
subtractions applied along this state's merge history), giving the
guarantee after ANY merge tree::

    est <= true_count <= est + err        and   err <= n_total/(m+1)

(the right inequality is the classic Agarwal et al. mergeable-summaries
telescoping bound; tracking the realized err instead of the worst case
is strictly tighter and — crucially — EXACTLY ZERO whenever m >= the
group's distinct item count, certifying the served counts exact).
Totals live in a side-table (keys, n_total, err), the same two-table
state shape as BM25 corpus stats.

State shape per group: <= m item rows + 1 totals row — O(|groups|·m)
regardless of corpus size, which is the whole point: a 100 TB stream's
per-language top terms are maintained by folding batch-sized partials
into a KB-sized state, never re-scanning history (same
incremental-view-maintenance shape as merge_rollup).

Exactness property used by the driver oracle: when m >= the group's
distinct item count, no pruning ever happens, d == 0 at every merge, and
est == true_count BITWISE — so the fixture query (vocab 31, m=64) is
hash-checked against DuckDB's exact GROUP BY counts, while the m <
distinct regime is pinned locally by the error-bound test
(tests/test_freqsketch.py).

Counts ride decimal(30,0): exact, associative — merge-order invariant
in the no-prune regime (a double sum would not be).

Manifest/versioned-prefix state + epoch guard + writer lease: identical
contract to operators/rollup.py (see operators/state.py).

ref: fda_watcher.py keeps no frequency state at all (the reference
recomputes pandas value_counts per run) — this is the engine-native
upgrade the 100 TB path needs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.state import (
    commit_version,
    epoch_already_applied,
    live_version_dir,
    writer_lease,
)

_CNT = "decimal(30,0)"


def _prune(items: DataFrame, keys: list[str], m: int):
    """Reduce a (keys..., item, est) frame to <= m rows per group, MG-style:
    subtract the (m+1)-th largest count from the survivors and drop the
    rest. Returns (pruned_items, d_frame) where d_frame is the per-group
    subtraction (keys..., _d) actually applied — the increment to the
    group's realized error bound (absent group => 0). Window partitions
    are per-GROUP (bounded at the merged summary size
    <= 2m + distinct(batch), never data-sized)."""
    w = W.partitionBy(*keys).orderBy(F.col("est").desc(), F.col("item"))
    ranked = items.withColumn("_rk", F.row_number().over(w))
    d = ranked.filter(F.col("_rk") == m + 1).select(
        *keys, F.col("est").cast(_CNT).alias("_d")
    )
    pruned = (
        ranked.filter(F.col("_rk") <= m)
        .join(d, keys, "left")
        .select(
            *keys,
            "item",
            (F.col("est") - F.coalesce(F.col("_d"), F.lit(0).cast(_CNT)))
            .cast(_CNT)
            .alias("est"),
        )
        .filter(F.col("est") > 0)
    )
    return pruned, d


def freq_partial(batch: DataFrame, keys: list[str], item_col: str,
                 m: int):
    """(items, totals) summary of ONE batch: exact per-item counts pruned
    to m per group (exact counts are a valid MG summary with zero error;
    pruning subtracts d from survivors and adds d to the group's realized
    err), plus exact group totals. ONE hash-agg shuffle over the batch —
    map-side combined; the counted frame is materialized
    (vocabulary-sized, not batch-sized) so items and totals both derive
    from it without re-scanning the batch (n_total == Σ est over the
    un-pruned counts, by construction)."""
    # NULL group keys are EXCLUDED, symmetric with the null-item filter:
    # every keys-join in this module (the prune's d-frame, the totals err
    # join, freq_topk's items⋈totals) is an equi-join that cannot match
    # NULL keys, so a null group would silently lose its pruning offset
    # (breaking est <= true <= est + err) and vanish from the served
    # top-k. Excluding it loudly-by-contract keeps the invariant exact;
    # callers wanting a null bucket coalesce the key to a sentinel first.
    nn = batch.filter(F.col(item_col).isNotNull())
    for kcol in keys:
        nn = nn.filter(F.col(kcol).isNotNull())
    counted = (
        nn.groupBy(*keys, F.col(item_col).alias("item"))
        .agg(F.count("*").cast(_CNT).alias("est"))
        .coalesce(1)  # vocabulary-sized: one task for the downstream
        # window/joins beats 32 near-empty ones
        .localCheckpoint(eager=True)
    )
    items, d = _prune(counted, keys, m)
    totals = (
        counted.groupBy(*keys)
        .agg(F.sum("est").cast(_CNT).alias("n_total"))
        .join(d, keys, "left")
        .select(
            *keys,
            "n_total",
            F.coalesce(F.col("_d"), F.lit(0).cast(_CNT)).alias("err"),
        )
    )
    return items, totals


def merge_freq(spark, batch: DataFrame, state_path: str, *,
               keys: list[str], item_col: str, m: int,
               epoch: int | None = None,
               state_partitions: int = 1) -> None:
    """Fold one batch into the frequent-items state.

    Merge rule (mergeable-summaries MG): per-item ests ADD across the two
    summaries (outer-union + sum), then the merged list re-prunes to m.
    totals add exactly. Additive state: pass `epoch` (foreachBatch's
    epoch_id) for exactly-once under replay (state.py::applied_epoch).

    `state_partitions` sizes the state files: the default 1 is right for
    the common case (state is O(|groups|·m) rows — KBs), avoiding a
    shuffle-partition-count spray of tiny files re-read every merge;
    raise it when |groups| is genuinely large (the same knob class as
    compact_neardup_state's num_partitions).
    """
    if epoch_already_applied(state_path, "freq-sketch state", epoch):
        return  # replayed micro-batch: already folded in
    b_items, b_totals = freq_partial(batch, keys, item_col, m)
    with writer_lease(state_path, what="freq-sketch state"):
        # authoritative re-check INSIDE the lease (see rollup.py: the
        # pre-lease check is a fast path; a concurrent holder may have
        # committed this epoch while we computed the partial)
        if epoch_already_applied(state_path, "freq-sketch state", epoch):
            return
        live = live_version_dir(state_path, what="freq-sketch state")
        if live is not None:
            o_items = spark.read.parquet(os.path.join(live, "items"))
            o_totals = spark.read.parquet(os.path.join(live, "totals"))
            # materialize the summed union once (state-sized, tiny): the
            # prune consumes it three times (ranked, d, totals-join) and
            # would otherwise re-run the read+union+shuffle per consumer
            summed = (
                o_items.unionByName(b_items)
                .groupBy(*keys, "item")
                .agg(F.sum("est").cast(_CNT).alias("est"))
                .coalesce(state_partitions)
                .localCheckpoint(eager=True)
            )
            items, d = _prune(summed, keys, m)
            totals = (
                o_totals.unionByName(b_totals)
                .groupBy(*keys)
                .agg(
                    F.sum("n_total").cast(_CNT).alias("n_total"),
                    F.sum("err").cast(_CNT).alias("err"),
                )
                .join(d, keys, "left")
                .select(
                    *keys,
                    "n_total",
                    (F.col("err") + F.coalesce(F.col("_d"), F.lit(0).cast(_CNT)))
                    .cast(_CNT)
                    .alias("err"),
                )
            )
        else:
            items, totals = b_items, b_totals
        def _write(vdir: str) -> None:
            items.coalesce(state_partitions).write.mode("overwrite").parquet(
                os.path.join(vdir, "items")
            )
            totals.coalesce(state_partitions).write.mode("overwrite").parquet(
                os.path.join(vdir, "totals")
            )

        commit_version(
            state_path,
            _write,
            epoch=epoch,
            prev=os.path.basename(live) if live else None,
        )


def read_freq(spark, state_path: str):
    """(items, totals) DataFrames of the live freq-sketch state."""
    live = live_version_dir(state_path, what="freq-sketch state")
    if live is None:
        raise FileNotFoundError(f"no freq-sketch state at {state_path}")
    return (
        spark.read.parquet(os.path.join(live, "items")),
        spark.read.parquet(os.path.join(live, "totals")),
    )


def freq_topk(spark, state_path: str, *, keys: list[str],
              k: int) -> DataFrame:
    """Serve top-k per group from state with the REALIZED error bound.

    Output: (keys..., item, est, err_bound, rk) where
    est <= true <= est + err_bound; err_bound is the group's accumulated
    pruning offset (<= n_total/(m+1), the classic bound — and exactly 0
    when the state never pruned, certifying the served counts and the
    ranking EXACT: the regime the fixture oracle hash-checks).
    Deterministic tie-break on item.
    """
    items, totals = read_freq(spark, state_path)
    w = W.partitionBy(*keys).orderBy(F.col("est").desc(), F.col("item"))
    return (
        items.join(totals, keys)
        .withColumn("err_bound", F.col("err").cast("long"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(*keys, "item", F.col("est").cast("long").alias("est"),
                "err_bound", "rk")
    )
