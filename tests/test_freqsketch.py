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


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=10, deadline=None)
@given(
    stream=st.lists(
        st.sampled_from("abcdefghij"), min_size=4, max_size=120
    ),
    cuts=st.lists(st.integers(min_value=1, max_value=119), max_size=3),
    m=st.integers(min_value=2, max_value=8),
)
def test_mg_envelope_property(spark, tmp_path_factory, stream, cuts, m):
    """For an ARBITRARY item stream, ARBITRARY batch boundaries (merge
    tree shape), and ARBITRARY capacity m: every surviving counter obeys
    est <= true <= est + err, err <= (#prunes) * n/(m+1), n_total is
    exact, and any item with true count > err survives (the MG retention
    guarantee). This is the m < distinct regime the driver oracle can't
    check (it runs no-prune); hypothesis owns it."""
    from rag_pipelines_spark.operators.freqsketch import merge_freq, read_freq

    state = str(tmp_path_factory.mktemp("mg_prop"))
    bounds = sorted({c for c in cuts if c < len(stream)})
    batches, prev = [], 0
    for b in [*bounds, len(stream)]:
        if b > prev:
            batches.append(stream[prev:b])
            prev = b
    for batch in batches:
        df = spark.createDataFrame(
            [("g", item) for item in batch], "grp STRING, item STRING"
        )
        merge_freq(spark, df, state, keys=["grp"], item_col="item", m=m)

    truth = {}
    for item in stream:
        truth[item] = truth.get(item, 0) + 1
    items, totals = read_freq(spark, state)
    tot = totals.collect()[0]
    err = int(tot.err)
    assert int(tot.n_total) == len(stream)
    # one prune opportunity per batch partial + one per merge step
    max_prunes = 2 * len(batches) - 1
    assert 0 <= err <= max_prunes * len(stream) // (m + 1)
    served = {r.item: int(r.est) for r in items.collect()}
    assert len(served) <= m
    for item, est in served.items():
        assert est <= truth[item] <= est + err, (stream, m, item, est, err)
    for item, true in truth.items():
        if true > err:
            assert item in served, (stream, m, item, true, err)


def test_merge_freq_empty_batch_preserves_state(spark, tmp_path):
    """An empty batch (quiet ingest window) must leave items/totals
    unchanged — not crash, not shrink, not bump err."""
    batches, _ = _batches(spark)
    state = str(tmp_path / "fs_empty")
    merge_freq(spark, batches[0], state, keys=["grp"], item_col="item", m=8)
    before = (
        sorted(map(tuple, read_freq(spark, state)[0].collect())),
        sorted(map(tuple, read_freq(spark, state)[1].collect())),
    )
    empty = spark.createDataFrame([], "row_id INT, item STRING, grp STRING")
    merge_freq(spark, empty, state, keys=["grp"], item_col="item", m=8)
    after = (
        sorted(map(tuple, read_freq(spark, state)[0].collect())),
        sorted(map(tuple, read_freq(spark, state)[1].collect())),
    )
    assert after == before


def test_null_group_key_is_a_real_group(spark, tmp_path):
    """r5 advice: NULL-group docs were dropped from the freq state while
    rollup/HLL kept them — a consumer comparing families read it as data
    loss. With NULL-safe key joins the NULL group carries exact counts,
    totals, and pruning offsets like any other group."""
    state = str(tmp_path / "fs_null")
    rows = [(1, None, "a"), (2, None, "a"), (3, None, "b"),
            (4, "en", "a"), (5, "en", "c")]
    df = spark.createDataFrame(rows, "row_id INT, lang STRING, item STRING")
    merge_freq(spark, df, state, keys=["lang"], item_col="item", m=10)
    # second batch extends the NULL group across a merge
    df2 = spark.createDataFrame(
        [(6, None, "a"), (7, None, "c")], "row_id INT, lang STRING, item STRING"
    )
    merge_freq(spark, df2, state, keys=["lang"], item_col="item", m=10)
    served = freq_topk(spark, state, keys=["lang"], k=10).collect()
    null_grp = {r.item: r.est for r in served if r.lang is None}
    assert null_grp == {"a": 3, "b": 1, "c": 1}
    assert all(r.err_bound == 0 for r in served)
    _, totals = read_freq(spark, state)
    tot = {r.lang: int(r.n_total) for r in totals.collect()}
    assert tot == {None: 5, "en": 2}
    # pruning also follows the NULL group: m=1 forces a subtraction there
    state2 = str(tmp_path / "fs_null_prune")
    merge_freq(spark, df, state2, keys=["lang"], item_col="item", m=1)
    _, totals2 = read_freq(spark, state2)
    errs = {r.lang: int(r.err) for r in totals2.collect()}
    assert errs[None] > 0  # the (m+1)-th count was subtracted and recorded


def test_state_partitions_derived_from_group_count(spark, tmp_path, monkeypatch):
    """r5 advice + verdict #8: the static coalesce(1) silently funneled
    high-cardinality group keys through one task. With the derived
    default, a state bigger than the per-partition target lands in
    multiple files and the served verdicts are unchanged."""
    import glob

    from rag_pipelines_spark.operators import freqsketch as fsq

    monkeypatch.setattr(fsq, "_ROWS_PER_STATE_PARTITION", 500)
    n_groups = 2_000
    df = spark.range(n_groups).select(
        F.concat(F.lit("g"), F.col("id")).alias("grp"),
        F.concat(F.lit("w"), (F.col("id") % 7)).alias("item"),
    )
    state = str(tmp_path / "fs_wide")
    merge_freq(spark, df, state, keys=["grp"], item_col="item", m=4)
    from rag_pipelines_spark.operators.state import live_version_dir

    live = live_version_dir(state)
    item_files = glob.glob(f"{live}/items/part-*")
    assert len(item_files) >= 3, item_files  # 2000 rows / 500-row target
    served = freq_topk(spark, state, keys=["grp"], k=1)
    assert served.count() == n_groups
    assert {r.est for r in served.collect()} == {1}
    # explicit override still wins
    state2 = str(tmp_path / "fs_pinned")
    merge_freq(spark, df, state2, keys=["grp"], item_col="item", m=4,
               state_partitions=1)
    live2 = live_version_dir(state2)
    assert len(glob.glob(f"{live2}/items/part-*")) == 1
