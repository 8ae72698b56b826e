"""Deterministic sampling/splitting (operators/sampling.py) + PII redaction."""

import pytest

from rag_pipelines_spark.functions.text import redact_pii
from rag_pipelines_spark.operators.sampling import hash_bucket, hash_sample, hash_split


@pytest.fixture()
def ids(spark):
    return spark.range(0, 2000).withColumnRenamed("id", "doc_id")


def test_split_proportions_and_coverage(ids):
    out = hash_split(ids, "doc_id", {"train": 0.8, "val": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in out.groupBy("split").count().withColumnRenamed("count", "n").collect()}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 2000
    assert 0.75 * 2000 < counts["train"] < 0.85 * 2000
    assert counts["val"] > 100 and counts["test"] > 100


def test_split_stable_under_repartitioning(ids):
    a = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id", {"a": 0.5, "b": 0.5}).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids.repartition(17, "doc_id"), "doc_id", {"a": 0.5, "b": 0.5}).collect()
    }
    assert a == b


def test_salt_redraws_assignment(ids):
    base = {r["doc_id"]: r["split"] for r in hash_split(ids, "doc_id", {"a": 0.5, "b": 0.5}).collect()}
    salted = {
        r["doc_id"]: r["split"]
        for r in hash_split(ids, "doc_id", {"a": 0.5, "b": 0.5}, salt="fold1").collect()
    }
    moved = sum(1 for k in base if base[k] != salted[k])
    assert 400 < moved < 1600  # ~half move on an independent re-draw


def test_hash_sample_fraction_and_determinism(ids):
    s1 = hash_sample(ids, "doc_id", 0.1)
    n = s1.count()
    assert 150 < n < 250  # ~10% of 2000
    assert s1.collect() == hash_sample(ids, "doc_id", 0.1).collect()
    # a sample is a subset of a larger sample with the same salt
    big = {r["doc_id"] for r in hash_sample(ids, "doc_id", 0.3).collect()}
    assert {r["doc_id"] for r in s1.collect()} <= big


def test_bad_weights_rejected(ids):
    with pytest.raises(ValueError):
        hash_split(ids, "doc_id", {"a": 0.5, "b": 0.3})


def test_redact_pii_cases(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.co then done"),
        (2, "see https://a.b/c?d=1&e=2 and http://plain.org/x"),
        (3, "call +1 (555) 010-1234 now"),
        (4, "clean text with no pii at all"),
        (5, "combo a@b.io https://x.io/u?q=a@b.io 555-010-9999 end"),
    ]
    df = spark.createDataFrame(rows, ["i", "t"]).select("i", redact_pii("t").alias("r"))
    got = {r["i"]: r["r"] for r in df.collect()}
    assert got[1] == "mail <EMAIL> then done"
    assert got[2] == "see <URL> and <URL>"
    assert got[3] == "call <PHONE> now"
    assert got[4] == "clean text with no pii at all"
    # emails redacted before URLs, phone runs last
    assert got[5] == "combo <EMAIL> <URL> <PHONE> end"
