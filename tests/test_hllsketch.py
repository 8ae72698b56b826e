"""Mergeable HLL distinct-count sketch (operators/hllsketch.py):
merge-tree invariance (N-batch accretion == one-shot EXACTLY, because
register union is per-slot max), the error envelope vs the exact count,
and epoch idempotence."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.hllsketch import (
    hll_estimate,
    hll_partial,
    merge_hll,
    read_hll,
)
from tests.conftest import SF_DIR


def _events(spark):
    from rag_pipelines_spark.io import table

    return table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "user_id"
    )


def test_accretion_equals_oneshot_exactly(spark, tmp_path):
    """Three time-sliced merges must serve the IDENTICAL estimate as one
    sketch over the union — register union is max-per-slot, so the merge
    tree cannot change the state, only the order of maxes."""
    ev = _events(spark)
    state = str(tmp_path / "hll_state")
    for r in range(3):
        merge_hll(
            spark,
            ev.filter(F.col("event_id") % 3 == r),
            state,
            keys=["event_type"],
            item_col="user_id",
        )
    served = {
        r.event_type: r.n_distinct_est
        for r in hll_estimate(read_hll(spark, state), ["event_type"]).collect()
    }
    oneshot = {
        r.event_type: r.n_distinct_est
        for r in hll_partial(ev, ["event_type"], "user_id")
        .select(
            "event_type",
            F.hll_sketch_estimate("sketch").alias("n_distinct_est"),
        )
        .collect()
    }
    assert served == oneshot


def test_estimate_error_envelope(spark, tmp_path):
    """lgK=12 => ~2.5% standard error; assert a 3-sigma-ish 8% envelope
    against the exact distinct count per group (deterministic: the
    sketch is a pure function of the input set)."""
    ev = _events(spark)
    state = str(tmp_path / "hll_state")
    merge_hll(spark, ev, state, keys=["event_type"], item_col="user_id")
    exact = {
        r.event_type: r.n
        for r in ev.groupBy("event_type")
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for r in hll_estimate(read_hll(spark, state), ["event_type"]).collect():
        rel = abs(r.n_distinct_est - exact[r.event_type]) / exact[r.event_type]
        assert rel <= 0.08, (r.event_type, r.n_distinct_est, exact[r.event_type])


def test_epoch_replay_is_noop_and_reset_raises(spark, tmp_path):
    ev = _events(spark)
    state = str(tmp_path / "hll_epoch")
    b0 = ev.filter(F.col("event_id") % 3 == 0)
    merge_hll(spark, b0, state, keys=["event_type"], item_col="user_id",
              epoch=0)
    before = sorted(
        map(tuple, hll_estimate(read_hll(spark, state), ["event_type"]).collect())
    )
    merge_hll(spark, b0, state, keys=["event_type"], item_col="user_id",
              epoch=0)  # replay
    after = sorted(
        map(tuple, hll_estimate(read_hll(spark, state), ["event_type"]).collect())
    )
    assert after == before
    with pytest.raises(RuntimeError, match="checkpoint"):
        merge_hll(spark, b0, state, keys=["event_type"], item_col="user_id",
                  epoch=-1)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=8, deadline=None)
@given(
    ids=st.lists(st.integers(min_value=0, max_value=500),
                 min_size=1, max_size=150),
    cuts=st.lists(st.integers(min_value=1, max_value=149), max_size=3),
)
def test_hll_merge_tree_invariance_property(spark, tmp_path_factory, ids, cuts):
    """For an ARBITRARY id stream and ARBITRARY batch boundaries: the
    state-served estimate equals the one-shot sketch over the whole
    stream EXACTLY (register union is per-slot max — associative,
    commutative, idempotent), and the estimate is sane for small true
    cardinalities (HLL is near-exact well below 2^lgK)."""
    from pyspark.sql import functions as F

    from rag_pipelines_spark.operators.hllsketch import (
        hll_estimate,
        hll_partial,
        merge_hll,
        read_hll,
    )

    state = str(tmp_path_factory.mktemp("hll_prop"))
    bounds = sorted({c for c in cuts if c < len(ids)})
    batches, prev = [], 0
    for b in [*bounds, len(ids)]:
        if b > prev:
            batches.append(ids[prev:b])
            prev = b
    for batch in batches:
        df = spark.createDataFrame(
            [("g", i) for i in batch], "grp STRING, uid INT"
        )
        merge_hll(spark, df, state, keys=["grp"], item_col="uid")
    served = hll_estimate(read_hll(spark, state), ["grp"]).collect()[0]
    oneshot = (
        hll_partial(
            spark.createDataFrame([("g", i) for i in ids], "grp STRING, uid INT"),
            ["grp"],
            "uid",
        )
        .select(F.hll_sketch_estimate("sketch").alias("e"))
        .collect()[0]
    )
    assert served.n_distinct_est == oneshot.e
    # tiny cardinalities sit in HLL's exact (sparse) regime
    assert served.n_distinct_est == len(set(ids)), (ids,)


def test_merge_hll_empty_batch_preserves_state(spark, tmp_path):
    ev = _events(spark)
    state = str(tmp_path / "hll_empty")
    merge_hll(spark, ev, state, keys=["event_type"], item_col="user_id")
    before = sorted(
        map(tuple, hll_estimate(read_hll(spark, state), ["event_type"]).collect())
    )
    empty = spark.createDataFrame([], "event_id INT, event_type STRING, user_id INT")
    merge_hll(spark, empty, state, keys=["event_type"], item_col="user_id")
    after = sorted(
        map(tuple, hll_estimate(read_hll(spark, state), ["event_type"]).collect())
    )
    assert after == before


def test_first_fold_partial_lgk_validated(spark, tmp_path):
    """r10 ADVICE: a caller-built partial with the wrong lgk must be
    rejected on the FIRST fold (later merges fail inside hll_union_agg)
    — otherwise the state's precision is silently rebased."""
    import pytest

    ev = _events(spark)
    wrong = hll_partial(ev, ["event_type"], "user_id", lgk=13).localCheckpoint()
    state = str(tmp_path / "hll_firstfold")
    with pytest.raises(Exception, match="(?i)lgconfigk|union"):
        merge_hll(spark, ev, state, keys=["event_type"],
                  item_col="user_id", partial=wrong)
    # correct-lgk caller partial accepted; serves same estimates as internal
    right = hll_partial(ev, ["event_type"], "user_id").localCheckpoint()
    merge_hll(spark, ev, state, keys=["event_type"], item_col="user_id",
              partial=right)
    a = sorted(
        (r.event_type, r.n_distinct_est)
        for r in hll_estimate(read_hll(spark, state), ["event_type"]).collect()
    )
    state2 = str(tmp_path / "hll_firstfold_internal")
    merge_hll(spark, ev, state2, keys=["event_type"], item_col="user_id")
    b = sorted(
        (r.event_type, r.n_distinct_est)
        for r in hll_estimate(read_hll(spark, state2), ["event_type"]).collect()
    )
    assert a == b
