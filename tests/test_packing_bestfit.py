"""Best-fit-decreasing packing invariants: budget respected, deterministic
under repartitioning, never more sequences than the prefix-sum layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from rag_pipelines_spark.session import get_spark

    return get_spark("packing-bfd-tests", shuffle_partitions=4)


@pytest.fixture()
def docs(spark):
    # two streams, lumpy sizes incl. one oversized doc (700 > budget)
    rows = []
    sizes = [700, 500, 400, 300, 300, 200, 128, 100, 64, 50, 30, 12, 5]
    for g in ("a", "b"):
        for i, s in enumerate(sizes):
            rows.append((g, i + (1000 if g == "b" else 0), s))
    return spark.createDataFrame(rows, "src string, doc_id long, n_tok long")


BUDGET = 512


def test_budget_respected_and_all_docs_packed(spark, docs):
    from rag_pipelines_spark.operators.packing import pack_sequences_bestfit

    out = pack_sequences_bestfit(docs, "src", "doc_id", "n_tok", BUDGET)
    assert out.count() == docs.count()  # nothing dropped
    per_bin = out.groupBy("src", "seq_id").agg(
        F.sum("n_tok").alias("fill"), F.count("*").alias("n")
    )
    for r in per_bin.collect():
        # a bin may exceed budget ONLY as a single oversized doc
        assert r.fill <= BUDGET or r.n == 1, r
    # seq_fill column agrees with the recomputed per-bin sum
    joined = out.join(per_bin, ["src", "seq_id"])
    assert joined.filter(F.col("seq_fill") != F.col("fill")).count() == 0


def test_deterministic_under_repartitioning(spark, docs):
    from rag_pipelines_spark.operators.packing import pack_sequences_bestfit

    a = pack_sequences_bestfit(docs, "src", "doc_id", "n_tok", BUDGET)
    b = pack_sequences_bestfit(
        docs.repartition(7, "doc_id"), "src", "doc_id", "n_tok", BUDGET
    )
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_no_more_bins_than_prefix_sum_layout(spark, docs):
    from rag_pipelines_spark.operators.packing import (
        pack_sequences,
        pack_sequences_bestfit,
    )

    bfd = pack_sequences_bestfit(docs, "src", "doc_id", "n_tok", BUDGET)
    ff = pack_sequences(docs, "src", "doc_id", "n_tok", BUDGET)
    n_bfd = {
        r.src: r.n
        for r in bfd.groupBy("src")
        .agg(F.countDistinct("seq_id").alias("n"))
        .collect()
    }
    n_ff = {
        r.src: r.n
        for r in ff.groupBy("src")
        .agg(F.countDistinct("seq_id").alias("n"))
        .collect()
    }
    for src in n_bfd:
        assert n_bfd[src] <= n_ff[src], (src, n_bfd[src], n_ff[src])
