"""Overlapped independent materializations (operators/concurrency.py):
run_all ordering/exception semantics, and the r10 serve-path contract —
folding PRECOMPUTED (concurrently built) batch partials into sketch
state produces bit-identical state to the all-sequential merges.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.concurrency import checkpoint_all, run_all


def test_run_all_preserves_order_and_results():
    import time

    def slow():
        time.sleep(0.05)
        return "slow"

    assert run_all(lambda: 1, slow, lambda: [3]) == (1, "slow", [3])


def test_run_all_propagates_exceptions():
    def boom():
        raise ValueError("boom")

    with pytest.raises(ValueError, match="boom"):
        run_all(lambda: 1, boom)


def _term_batches(spark):
    rows = []
    i = 0
    for b in range(3):
        for j in range(30):
            rows.append((i, b, "g0" if j % 2 else "g1", f"w{j % 7}"))
            i += 1
    df = spark.createDataFrame(rows, "rid INT, b INT, grp STRING, item STRING")
    return [df.filter(F.col("b") == b).select("rid", "grp", "item")
            for b in range(3)]


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_freq_precomputed_partials_state_identical(spark, tmp_path):
    from rag_pipelines_spark.operators.freqsketch import (
        freq_partial,
        merge_freq,
        read_freq,
    )

    batches = _term_batches(spark)
    seq_state = str(tmp_path / "freq_seq")
    par_state = str(tmp_path / "freq_par")
    for b in batches:
        merge_freq(spark, b, seq_state, keys=["grp"], item_col="item", m=4)
    partials = run_all(*[
        (lambda b=b: freq_partial(b, ["grp"], "item", 4)) for b in batches
    ])
    for b, p in zip(batches, partials):
        merge_freq(spark, b, par_state, keys=["grp"], item_col="item", m=4,
                   partial=p)
    s_items, s_totals = read_freq(spark, seq_state)
    p_items, p_totals = read_freq(spark, par_state)
    assert _sorted_rows(s_items) == _sorted_rows(p_items)
    assert _sorted_rows(s_totals) == _sorted_rows(p_totals)


def test_cm_precomputed_partials_state_identical(spark, tmp_path):
    from rag_pipelines_spark.operators.cmsketch import (
        cm_partial,
        merge_cm,
        read_cm,
    )

    batches = _term_batches(spark)
    seq_state = str(tmp_path / "cm_seq")
    par_state = str(tmp_path / "cm_par")
    kw = dict(keys=["grp"], item_col="item", depth=4, width=32)
    for b in batches:
        merge_cm(spark, b, seq_state, **kw)
    partials = checkpoint_all(*[
        cm_partial(b, ["grp"], "item", depth=4, width=32) for b in batches
    ])
    for b, p in zip(batches, partials):
        merge_cm(spark, b, par_state, **kw, partial=p)
    s_counters, s_geom = read_cm(spark, seq_state)
    p_counters, p_geom = read_cm(spark, par_state)
    assert s_geom == p_geom
    assert _sorted_rows(s_counters) == _sorted_rows(p_counters)


def test_hll_precomputed_partials_state_identical(spark, tmp_path):
    from rag_pipelines_spark.operators.hllsketch import (
        hll_estimate,
        hll_partial,
        merge_hll,
        read_hll,
    )

    batches = _term_batches(spark)
    seq_state = str(tmp_path / "hll_seq")
    par_state = str(tmp_path / "hll_par")
    for b in batches:
        merge_hll(spark, b, seq_state, keys=["grp"], item_col="item")
    partials = checkpoint_all(*[
        hll_partial(b, ["grp"], "item") for b in batches
    ])
    for b, p in zip(batches, partials):
        merge_hll(spark, b, par_state, keys=["grp"], item_col="item",
                  partial=p)
    # register-level equality: identical sketch bytes, identical estimates
    s = {r.grp: bytes(r.sketch) for r in read_hll(spark, seq_state).collect()}
    p = {r.grp: bytes(r.sketch) for r in read_hll(spark, par_state).collect()}
    assert s == p
    assert _sorted_rows(hll_estimate(read_hll(spark, seq_state),
                                     ["grp"])) == _sorted_rows(
        hll_estimate(read_hll(spark, par_state), ["grp"])
    )
