"""Physical-plan assertions (SURVEY §7 phase 7): the optimizations we rely
on at 100 TB must actually appear in the plan — column pruning into the
parquet scan, broadcast joins for dimension/state sides, partial+final
hash aggregation, no cartesian products where an equi-block exists.
"""

from __future__ import annotations

import pytest

from rag_pipelines_spark.registry import load_all

SF = "/root/testdata/sf0.01"
REG = load_all()


@pytest.fixture(scope="module")
def spark():
    from rag_pipelines_spark.session import get_spark

    return get_spark("plan-tests", shuffle_partitions=8)


def plan_of(spark, name: str) -> str:
    df = REG[name].fn(spark, SF)
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_join_inner_broadcasts_dims_and_prunes(spark):
    plan = plan_of(spark, "q_join_inner")
    assert "BroadcastHashJoin" in plan
    # fact-side scan reads only the join key + aggregated column
    assert "struct<l_orderkey:bigint,l_extendedprice:double>" in plan
    assert "CartesianProduct" not in plan


def test_delta_anti_join_is_broadcast(spark):
    plan = plan_of(spark, "q_delta_anti_join")
    assert "BroadcastHashJoin LeftAnti" in plan


def test_agg_partial_final_and_pruning(spark):
    plan = plan_of(spark, "q_agg_stats")
    # partial+final pairs
    assert plan.count("HashAggregate") >= 2
    # only the 3 referenced columns reach the scan
    assert "struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>" in plan


def test_filter_pushdown_reaches_scan(spark):
    plan = plan_of(spark, "q_filter_nullkey")
    assert "PushedFilters" in plan
    assert "IsNotNull" in plan


def test_fuzzy_join_is_equi_blocked_not_cartesian(spark):
    plan = plan_of(spark, "q_fuzzy_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ngram_jaccard_no_cartesian(spark):
    plan = plan_of(spark, "q_ngram_jaccard")
    assert "CartesianProduct" not in plan


def test_topk_uses_take_ordered(spark):
    plan = plan_of(spark, "q_topk")
    assert "TakeOrderedAndProject" in plan  # no global sort materialized


def test_partition_prune_uses_partition_filters(spark):
    """q_partition_prune's read side must prune directories at planning
    time (PartitionFilters on the hive-layout scan), not post-filter."""
    import uuid

    from pyspark.sql import functions as F

    from rag_pipelines_spark.io import table
    from rag_pipelines_spark.sources.files import (
        read_partitioned_parquet,
        write_partitioned_parquet,
    )

    path = f"/root/repo/.scratch/part-plan-{uuid.uuid4().hex[:8]}"
    src = table(spark, SF, "documents").select("doc_id", "source")
    write_partitioned_parquet(src, path, "source")
    df = read_partitioned_parquet(spark, path).filter(
        F.col("source").isin("src3", "src7")
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan and "IN (src3,src7)" in plan
    # pruning is real: the scan touches 2 of the 20 source= directories
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().head()
    assert scan.metrics().apply("numFiles").value() <= 4


def test_tpch_q1_scans_only_needed_columns(spark):
    plan = plan_of(spark, "q_tpch_q1")
    assert "PushedFilters" in plan and "LessThanOrEqual(l_shipdate" in plan
    # 7 referenced columns, not the full 11-column lineitem schema
    assert "l_partkey" not in plan and "l_orderkey" not in plan


def test_tpch_q5_broadcasts_constant_dims(spark):
    plan = plan_of(spark, "q_tpch_q5")
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastHashJoin") >= 2


def test_bucketed_join_has_no_join_key_exchange(spark):
    """Both sides bucketBy(8, custkey): the sort-merge join must read
    buckets directly — no Exchange hashpartitioning on either join key.
    (The single remaining exchange belongs to the mktsegment re-agg.)"""
    plan = plan_of(spark, "q_bucketed_join")
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning(o_custkey" not in plan
    assert "Exchange hashpartitioning(c_custkey" not in plan
    assert "Bucketed: true" in plan
