"""Unit tests for text-analytics column builders."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.textstats import (
    bpe_ish_token_count,
    char_chunks,
    punct_ratio,
    rolling_fingerprint,
    whitespace_token_count,
)


@pytest.fixture(scope="module")
def spark():
    from rag_pipelines_spark.session import get_spark

    return get_spark("textstats-tests", shuffle_partitions=4)


def _one(spark, col):
    return (
        spark.createDataFrame([("hello, world! x2 done",)], ["text"])
        .select(col.alias("v"))
        .collect()[0]["v"]
    )


def test_token_counts(spark):
    assert _one(spark, whitespace_token_count(F.col("text"))) == 4
    # hello , world ! x 2 done -> 7 BPE-ish tokens
    assert _one(spark, bpe_ish_token_count(F.col("text"))) == 7


def test_punct_ratio(spark):
    v = _one(spark, punct_ratio(F.col("text")))
    assert abs(v - 2 / 21) < 1e-12  # ',' and '!' over 21 chars


def test_rolling_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [("a b c",), ("c b a",), ("a b c",)], ["text"]
    ).select(rolling_fingerprint(F.col("text")).alias("fp"))
    a, b, c = [r["fp"] for r in df.collect()]
    assert a == c != b
    assert 0 <= a < (1 << 31) - 1


def test_char_chunks_cover_text_with_overlap(spark):
    text = "x" * 250
    df = spark.createDataFrame([(text,)], ["text"]).select(
        F.explode(char_chunks(F.col("text"), size=100, stride=80)).alias("c")
    )
    rows = [(r["c"]["chunk_idx"], r["c"]["chunk"]) for r in df.collect()]
    assert [i for i, _ in rows] == [0, 1, 2, 3]
    assert len(rows[0][1]) == 100
    assert rows[3][1] == "x" * 10  # tail chunk


def test_char_chunks_empty_and_null(spark):
    # empty non-null text: floor(-1/stride) = -1 would make sequence(0,-1)
    # emit [0,-1] (two bogus chunks) without the guard — must be zero chunks
    df = spark.createDataFrame(
        [("e", ""), ("n", None), ("s", "ab")], ["k", "text"]
    ).select("k", char_chunks(F.col("text"), size=100, stride=80).alias("c"))
    got = {r["k"]: r["c"] for r in df.collect()}
    assert got["e"] == []
    assert got["n"] is None
    assert [(c["chunk_idx"], c["chunk"]) for c in got["s"]] == [(0, "ab")]


def test_grouped_length_profile(spark):
    from rag_pipelines_spark.operators.textstats import grouped_length_profile

    df = spark.createDataFrame(
        [("s1", "ab"), ("s1", "abcd"), ("s1", "abcdef"), ("s2", "x")],
        ["source", "text"],
    )
    got = {
        r["source"]: r for r in grouped_length_profile(df, "source", "text").collect()
    }
    assert got["s1"]["n_docs"] == 3
    assert got["s1"]["min_len"] == 2 and got["s1"]["max_len"] == 6
    assert got["s1"]["median_len"] == 4.0
    assert got["s2"]["n_docs"] == 1 and got["s2"]["median_len"] == 1.0
