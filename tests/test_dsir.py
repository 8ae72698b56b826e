"""DSIR importance weighting contracts (operators/dsir.py).

The cross-engine value equality is carried by q_dsir_weights' DuckDB
oracle (driver differential); these tests pin the operator-level
invariants the oracle can't express directly.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from rag_pipelines_spark.operators.dsir import (
    dsir_logweights,
    hashed_ngram_features,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_feature_bag_counts(spark):
    """A doc with n tokens emits exactly n unigram + (n-1) bigram
    occurrences — a BAG (multiplicity kept), not a set."""
    df = _docs(spark, [(1, "a b a"), (2, "x"), (3, "p q")])
    per_doc = (
        hashed_ngram_features(df, "doc_id", "text")
        .groupBy("doc_id")
        .count()
        .collect()
    )
    got = {r.doc_id: r["count"] for r in per_doc}
    assert got == {1: 3 + 2, 2: 1 + 0, 3: 2 + 1}


def test_per_feature_ratio_separates_domains(spark):
    """With enough target mass that add-1 smoothing stops dominating,
    the per-feature average log-ratio is strictly higher for docs
    drawn from the target vocabulary than for disjoint-vocabulary
    docs (the quantity DSIR thresholds on)."""
    in_text = "alpha beta gamma " * 20
    out_text = "zulu yankee xray " * 20
    corpus = _docs(spark, [(1, in_text), (2, out_text)])
    target = _docs(spark, [(9, in_text), (10, in_text)])
    rows = {
        r.doc_id: r
        for r in dsir_logweights(
            corpus, target, "doc_id", "text", n_buckets=256
        ).collect()
    }
    assert rows[1].logw / rows[1].n_feats > rows[2].logw / rows[2].n_feats
    assert rows[1].logw > rows[2].logw


def test_target_like_docs_rank_first(spark):
    """Selection contract: docs sharing the target's vocabulary get
    higher logw than docs with disjoint vocabulary — the top-k cut
    keeps the in-domain half of a mixed corpus."""
    in_domain = [(i, "the quick brown fox jumps over the lazy dog") for i in range(5)]
    out_domain = [
        (10 + i, "zzz qqq www eee rrr ttt yyy uuu iii ooo") for i in range(5)
    ]
    corpus = _docs(spark, in_domain + out_domain)
    target = _docs(spark, [(100, "quick brown fox dog jumps")])
    scored = dsir_logweights(corpus, target, "doc_id", "text").collect()
    ranked = sorted(scored, key=lambda r: (-r.logw, r.doc_id))
    top5 = {r.doc_id for r in ranked[:5]}
    assert top5 == {0, 1, 2, 3, 4}


def test_null_and_empty_text_rows_drop(spark):
    """Docs with no extractable features simply don't appear (inner
    semantics — matches the oracle's join)."""
    corpus = _docs(spark, [(1, "hello world"), (2, None)])
    target = _docs(spark, [(9, "hello")])
    ids = {
        r.doc_id
        for r in dsir_logweights(corpus, target, "doc_id", "text").collect()
    }
    assert ids == {1}
