"""Test the applyInPandasWithState first-seen dedup across micro-batches:
state must persist between runs (same checkpoint) so a key seen in run 1
is suppressed in run 2. Parquet sink — the memory sink cannot recover
from a checkpoint."""

from __future__ import annotations

import os

import pytest


@pytest.fixture(scope="module")
def spark():
    from rag_pipelines_spark.session import get_spark

    return get_spark("stateful-tests", shuffle_partitions=4)


def test_seen_keys_dedup_across_batches(spark, tmp_path):
    from rag_pipelines_spark.streaming.stateful import seen_keys_dedup

    src = str(tmp_path / "src")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    schema = "rag_id string, source string, payload string"

    def write_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            seen_keys_dedup(stream.groupBy("source"))
            .writeStream.format("parquet")
            .option("path", out_dir)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out_dir)

    # run 1: a, b (plus an in-batch duplicate of a)
    write_batch([("a", "s1", "p1"), ("b", "s1", "p2"), ("a", "s1", "p1x")])
    first = run_once()
    assert {r["rag_id"] for r in first.collect()} == {"a", "b"}

    # run 2 resumes the same checkpoint: a suppressed by state, c is new
    write_batch([("a", "s1", "p-again"), ("c", "s1", "p3")])
    second = run_once()
    ids = sorted(r["rag_id"] for r in second.collect())
    assert ids == ["a", "b", "c"], f"state did not persist: {ids}"
    # and 'a' was emitted exactly once across both runs
    assert second.filter("rag_id = 'a'").count() == 1
