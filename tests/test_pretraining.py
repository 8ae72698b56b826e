"""Golden test for the composed pretraining data-prep pipeline: every gate
drops exactly the planted offender and nothing else; packing respects the
token budget; attrition ledger is monotone."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spark():
    from rag_pipelines_spark.session import get_spark

    return get_spark("pretraining-tests", shuffle_partitions=4)


GOOD = (
    "the quick brown fox jumps over the lazy dog and runs along the river "
    "while the morning light settles on the quiet valley for a new day"
)
GOOD2 = (
    "distributed dataframes shuffle on the grouping key and the optimizer "
    "prunes every column the query does not touch in the scan for speed"
)
LEAKY = (
    "the secret benchmark sentence that must never leak into training at "
    "all plus the enough extra filler words for it to pass the quality gate"
)


def test_pretraining_prep_pipeline(spark):
    from pyspark.sql import functions as F

    from rag_pipelines_spark.plans.pretraining import pretraining_prep_pipeline

    docs = spark.createDataFrame(
        [
            (1, GOOD),
            (2, GOOD + " with a mutated tail marker"),  # near-dup of 1
            (3, GOOD2),
            (4, "too short"),  # quality gate
            (5, "!!! ??? *** !!! ??? *** !!! ??? *** !!! ??? ***"),  # punct gate
            (6, LEAKY),  # decontamination gate
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the secret benchmark sentence that must never leak")],
        "bench_id long, text string",
    )
    res = pretraining_prep_pipeline(docs, bench, token_budget=40)

    surviving = sorted(r.doc_id for r in res.packed.collect())
    assert surviving == [1, 3], surviving

    counts = {r.stage: r.n_docs for r in res.stage_counts.collect()}
    assert counts["0_input"] == 6
    assert counts["1_quality"] == 4  # 4 and 5 dropped
    assert counts["2_line_dedup"] == 4  # doc 2 keeps its mutated tail line
    assert counts["3_near_dedup"] == 3  # 2 collides with 1
    assert counts["4_decontaminated"] == 2  # 6 dropped
    vals = list(counts.values())
    assert vals == sorted(vals, reverse=True)  # monotone attrition

    # packing: within every shard, offsets are the prefix-sum of token
    # counts in doc_id order, and seq_id = seq_start div budget
    by_shard: dict[int, list] = {}
    for r in res.packed.collect():
        by_shard.setdefault(r.pack_shard, []).append(r)
    for shard_rows in by_shard.values():
        running = 0
        for r in sorted(shard_rows, key=lambda r: r.doc_id):
            assert r.seq_start == running
            assert r.seq_id == r.seq_start // 40
            running += r.n_tokens


def test_pretraining_packing_sharded(spark):
    """The packing window must partition on a real (non-constant) key: with
    enough docs, more than one pack_shard value appears, and the physical
    plan carries no 'No Partition Defined' global window."""
    from pyspark.sql import functions as F

    from rag_pipelines_spark.plans.pretraining import pretraining_prep_pipeline

    # distinct texts (id woven between every word) so near-dedup keeps all
    word = F.concat(F.lit("w"), F.col("id"))
    docs = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.lit("the"), word, F.lit("of"), word, F.lit("and"), word,
            F.lit("to"), word, F.lit("in"), word, F.lit("is"), word,
        ).alias("text"),
    )
    bench = spark.createDataFrame(
        [(1, "completely disjoint benchmark content nothing shared here")],
        "bench_id long, text string",
    )
    res = pretraining_prep_pipeline(docs, bench, pack_shards=8)
    shards = {r.pack_shard for r in res.packed.select("pack_shard").collect()}
    assert len(shards) > 1, shards
    plan = res.packed._jdf.queryExecution().executedPlan().toString()
    # the packing window's exchange hashes on the shard key — never a
    # constant-key (folded-away) global window
    assert "hashpartitioning(pack_shard" in plan
