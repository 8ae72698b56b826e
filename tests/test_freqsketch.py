"""Mergeable frequent-items sketch (operators/freqsketch.py): exactness
in the no-prune regime, the MG error envelope under pruning, heavy-hitter
retention, and epoch idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.freqsketch import (
    freq_topk,
    merge_freq,
    read_freq,
)


def _batches(spark):
    """Three batches over a skewed item stream: item 'h' is a true heavy
    hitter (count 60 of 141 total); tail items t0..t39 have 2 each,
    u0..u? singletons fill in."""
    rows = []
    i = 0
    for b in range(3):
        for _ in range(20):
            rows.append((i, b, "h")); i += 1
    for j in range(40):
        for _ in range(2):
            rows.append((i, j % 3, f"t{j:02d}")); i += 1
    # singleton noise
    for j in range(1):
        rows.append((i, 0, "u0")); i += 1
    df = spark.createDataFrame(rows, "row_id INT, b INT, item STRING")
    return [df.filter(F.col("b") == b).select("row_id", "item",
                                              F.lit("g").alias("grp"))
            for b in range(3)], df.select(
                "row_id", "item", F.lit("g").alias("grp"))


def test_exact_regime_matches_direct_counts(spark, tmp_path):
    """m >= distinct: no pruning ever happens, err_bound == 0, and the
    served counts equal the exact GROUP BY bitwise — the property the
    driver oracle (q_freq_topk_serve) checks at the gate."""
    batches, union = _batches(spark)
    state = str(tmp_path / "fs_exact")
    for b in batches:
        merge_freq(spark, b, state, keys=["grp"], item_col="item", m=100)
    served = freq_topk(spark, state, keys=["grp"], k=5).collect()
    direct = (
        union.groupBy("grp", "item")
        .agg(F.count("*").alias("est"))
        .orderBy(F.col("est").desc(), "item")
        .limit(5)
        .collect()
    )
    assert [(r.item, r.est) for r in sorted(served, key=lambda r: r.rk)] == [
        (r.item, r.est) for r in direct
    ]
    assert all(r.err_bound == 0 for r in served)


def test_pruned_regime_error_envelope_and_heavy_hitter(spark, tmp_path):
    """m < distinct: every served est obeys est <= true <= est + err, the
    realized err stays within the classic n/(m+1) telescoped bound, and
    the true heavy hitter (count > n/(m+1)) is guaranteed present."""
    batches, union = _batches(spark)
    truth = {
        r.item: r.n
        for r in union.groupBy("item").agg(F.count("*").alias("n")).collect()
    }
    n_total = sum(truth.values())
    m = 8
    state = str(tmp_path / "fs_pruned")
    for b in batches:
        merge_freq(spark, b, state, keys=["grp"], item_col="item", m=m)
    items, totals = read_freq(spark, state)
    tot = totals.collect()[0]
    assert int(tot.n_total) == n_total
    # realized err within the telescoped worst case (one bound per merge
    # step is already folded into the stored err)
    assert 0 < int(tot.err) <= 3 * n_total // (m + 1)
    for r in items.collect():
        true = truth[r.item]
        assert int(r.est) <= true <= int(r.est) + int(tot.err), (
            r.item, r.est, true, tot.err,
        )
    # MG retention: a count-60 item in a 141-item stream cannot be pruned
    # away by any merge order at m=8 (60 > err)
    served = freq_topk(spark, state, keys=["grp"], k=1).collect()
    assert served[0].item == "h"


def test_epoch_replay_is_noop(spark, tmp_path):
    batches, _ = _batches(spark)
    state = str(tmp_path / "fs_epoch")
    merge_freq(spark, batches[0], state, keys=["grp"], item_col="item",
               m=100, epoch=0)
    before = sorted(
        map(tuple, read_freq(spark, state)[0].collect())
    ), sorted(map(tuple, read_freq(spark, state)[1].collect()))
    merge_freq(spark, batches[0], state, keys=["grp"], item_col="item",
               m=100, epoch=0)  # replay: must not double-count
    after = sorted(
        map(tuple, read_freq(spark, state)[0].collect())
    ), sorted(map(tuple, read_freq(spark, state)[1].collect()))
    assert after == before
    with pytest.raises(RuntimeError, match="checkpoint"):
        merge_freq(spark, batches[1], state, keys=["grp"], item_col="item",
                   m=100, epoch=-1)
