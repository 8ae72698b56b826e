"""KL batch-drift monitor (operators/drift.py): zero-drift baseline,
sensitivity ordering, domain accounting, and the nano-quantization
bound."""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_pipelines_spark.operators.drift import kl_batch_drift


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_identical_batches_score_identically(spark):
    """Batches that are copies of the same text have IDENTICAL bucket
    counts, so their KLs are bit-equal (the add-1 smoothing bias from
    batch-vs-corpus size is shared). Note the baseline is NOT zero:
    with P ~ Q/3 the smoothing mass (1 per bucket) weighs differently
    on the two sides — the monitor's alarm threshold is relative to
    this same-mix baseline, which is exactly what equal batches pin."""
    text = "spark join order data table scan window agg"
    rows = [(i, text) for i in range(30)]
    out = {r.batch: r.kl for r in
           kl_batch_drift(_df(spark, rows), "doc_id", "text",
                          n_batches=3, n_buckets=1000).collect()}
    assert len(out) == 3
    assert len(set(out.values())) == 1, out


def test_drifted_batch_scores_higher(spark):
    """A batch from a different vocabulary scores a larger KL than
    batches matching the corpus mix, and every KL is >= the negated
    quantization slack (true KL >= 0 by Gibbs)."""
    base = "spark join order data table scan window agg"
    drifted = "zebra quagga okapi lemur fossa aye-aye sifaka indri"
    rows = [(i, drifted if i % 3 == 0 else base) for i in range(60)]
    out = {r.batch: r.kl for r in
           kl_batch_drift(_df(spark, rows), "doc_id", "text",
                          n_batches=3, n_buckets=1000).collect()}
    # batch 0 is the alien one; batches 1/2 also diverge from the MIXED
    # corpus (it is 1/3 alien), so the margin is a factor, not ~0 vs big
    assert out[0] > out[1] * 1.5
    assert out[0] > out[2] * 1.5
    assert out[1] != out[0] and out[2] != out[0]
    for kl in out.values():
        assert kl >= -1e-5


def test_occupied_counts_full_corpus_buckets(spark):
    """`occupied` is the reference (full corpus) occupied-bucket count —
    identical across batches by construction."""
    rows = [(i, "alpha beta gamma delta") for i in range(9)]
    occs = {r.occupied for r in
            kl_batch_drift(_df(spark, rows), "doc_id", "text",
                           n_batches=3, n_buckets=1000).collect()}
    assert len(occs) == 1
    # 4 unigrams + 3 bigrams = 7 grams -> <= 7 buckets
    assert occs.pop() <= 7


def test_kl_against_both_empty_is_zero(spark):
    """kl_against with BOTH inputs empty (a drift-gated first epoch where
    every doc was rejected upstream): both distributions collapse to the
    add-1 uniform, so the defined answer is (occupied=0, kl=0.0) — one
    concrete row, never (NULL, NULL)."""
    from rag_pipelines_spark.operators.drift import kl_against

    empty = spark.createDataFrame([], "bucket INT, cnt LONG")
    rows = kl_against(empty, empty, n_buckets=1000).collect()
    assert len(rows) == 1
    assert rows[0].occupied == 0
    assert rows[0].kl == 0.0


def test_kl_against_one_empty_side_still_defined(spark):
    """Empty reference (first epoch vs no history): q is the uniform —
    KL is finite and >= the quantization slack; occupied counts the
    union of occupied buckets."""
    from rag_pipelines_spark.operators.drift import kl_against

    p = spark.createDataFrame([(1, 10), (2, 5)], "bucket INT, cnt LONG")
    empty = spark.createDataFrame([], "bucket INT, cnt LONG")
    rows = kl_against(p, empty, n_buckets=1000).collect()
    assert len(rows) == 1
    assert rows[0].occupied == 2
    assert rows[0].kl is not None and rows[0].kl >= -1e-5
