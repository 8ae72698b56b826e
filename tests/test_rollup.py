"""Incremental rollup maintenance (operators/rollup.py): N batch merges
must equal the one-shot aggregate over the union, avg derives exactly,
non-mergeable aggregates are refused."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.rollup import (
    merge_rollup,
    read_rollup,
    rollup_batch,
)
from tests.conftest import SF_DIR

MEASURES = {"value": ["count", "sum", "min", "max"]}


def test_n_merges_equal_union_aggregate(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id", "event_type", "value"
    )
    state = str(tmp_path / "rollup")
    # three disjoint batches by event_id residue (a real ingest would
    # arrive time-sliced; any disjoint split exercises the same algebra)
    for r in range(3):
        merge_rollup(
            spark,
            ev.filter(F.col("event_id") % 3 == r),
            state,
            keys=["event_type"],
            measures=MEASURES,
        )
    got = {r.event_type: r.asDict() for r in read_rollup(spark, state).collect()}
    want = {
        r.event_type: r.asDict()
        for r in rollup_batch(ev, ["event_type"], MEASURES).collect()
    }
    # exact, incl. sums: decimal partials make the merge tree irrelevant
    assert got == want


def test_avg_derives_from_merged_partials(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_type", "value"
    )
    state = str(tmp_path / "rollup-avg")
    merge_rollup(spark, ev, state, keys=["event_type"], measures=MEASURES)
    derived = {
        r.event_type: r.avg_value
        for r in read_rollup(spark, state)
        .select(
            "event_type",
            (F.col("sum_value").cast("double") / F.col("count_value")).alias("avg_value"),
        )
        .collect()
    }
    direct = {
        r.event_type: r.avg_value
        for r in ev.groupBy("event_type")
        .agg(F.avg("value").alias("avg_value"))
        .collect()
    }
    for k in direct:
        assert derived[k] == pytest.approx(direct[k], rel=1e-12)


def test_non_mergeable_aggregate_refused(spark, tmp_path):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    with pytest.raises(ValueError, match="not mergeable"):
        merge_rollup(
            spark,
            ev,
            str(tmp_path / "x"),
            keys=["event_type"],
            measures={"value": ["median"]},
        )


def test_state_schema_stable_across_merges(spark, tmp_path):
    """The decimal sum column must stay decimal(30,15) after every merge
    (a bare decimal SUM widens precision each round, making version N's
    files schema-incompatible with version N+1's readers)."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "event_type", "value"
    )
    state = str(tmp_path / "rollup-schema")
    schemas = []
    for r in range(3):
        merge_rollup(
            spark,
            ev.filter(F.col("event_id") % 3 == r),
            state,
            keys=["event_type"],
            measures=MEASURES,
        )
        schemas.append(dict(read_rollup(spark, state).dtypes))
    assert all(s["sum_value"] == "decimal(30,15)" for s in schemas), schemas
    assert schemas[0] == schemas[1] == schemas[2]
