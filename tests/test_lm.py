"""Brute-force differential for the bigram-LM quality tier
(operators/lm.py): an independent pure-Python reference computes the model
counts, familiarity, and add-one perplexity on the smoke fixture, and the
Spark results must agree — integer stats exactly, ln-based perplexity to
1e-9 relative (Python libm vs Java Math.log, both <=1ulp).

The hash-checked driver oracle for familiarity lives in queries/lm.py;
this file is what certifies the ln-based perplexity twin (rows-only by
design there).
"""

from __future__ import annotations

import hashlib
import math
from collections import Counter

import pytest

from rag_pipelines_spark.operators.lm import familiarity, perplexity, train_bigram_model
from tests.conftest import SF_DIR_SMOKE

MODEL_PCT = 30


def _bucket(doc_id) -> int:
    return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) % 100


def _toks(text: str) -> list[str]:
    return text.lower().split(" ")


def _brute_force(rows):
    """rows: list of (doc_id, text) -> (bigram_counts, unigram_counts, V)."""
    uni: Counter = Counter()
    bi: Counter = Counter()
    for doc_id, text in rows:
        if _bucket(doc_id) >= MODEL_PCT:
            continue
        ws = _toks(text)
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    return bi, uni, len(uni)


@pytest.fixture(scope="module")
def docs(spark):
    df = spark.read.parquet(f"{SF_DIR_SMOKE}/documents.parquet").select("doc_id", "text")
    rows = [(r.doc_id, r.text) for r in df.collect()]
    assert rows, "smoke fixture must not be empty"
    return df, rows


def test_model_counts_match_brute_force(spark, docs):
    df, rows = docs
    uni_df, bi_df = train_bigram_model(df, model_pct=MODEL_PCT)
    bi_exp, uni_exp, _ = _brute_force(rows)
    got_uni = {r.w: r.c1 for r in uni_df.collect()}
    got_bi = {(r.w1, r.w2): r.c12 for r in bi_df.collect()}
    assert got_uni == dict(uni_exp)
    assert got_bi == dict(bi_exp)


def test_familiarity_exact(spark, docs):
    df, rows = docs
    _, bi_df = train_bigram_model(df, model_pct=MODEL_PCT)
    got = {r.doc_id: r for r in familiarity(df, bi_df).collect()}
    bi_exp, _, _ = _brute_force(rows)
    assert set(got) == {doc_id for doc_id, _ in rows}, "every doc must be scored"
    for doc_id, text in rows:
        ws = _toks(text)
        pairs = list(zip(ws, ws[1:]))
        known = sum(1 for p in pairs if p in bi_exp)
        hits = sum(bi_exp.get(p, 0) for p in pairs)
        r = got[doc_id]
        assert r.n_bigrams == len(pairs)
        assert r.known_bigrams == known
        assert r.model_hits == hits
        if pairs:
            assert r.familiarity == known / len(pairs)  # one IEEE division: exact
        else:
            assert r.familiarity is None


def test_perplexity_matches_brute_force(spark, docs):
    df, rows = docs
    uni_df, bi_df = train_bigram_model(df, model_pct=MODEL_PCT)
    got = {r.doc_id: r for r in perplexity(df, uni_df, bi_df).collect()}
    bi_exp, uni_exp, v = _brute_force(rows)
    checked = 0
    for doc_id, text in rows:
        ws = _toks(text)
        pairs = list(zip(ws, ws[1:]))
        if not pairs:
            assert doc_id not in got  # <2-token docs have no defined ppl
            continue
        ll = [
            math.log((bi_exp.get(p, 0) + 1) / (uni_exp.get(p[0], 0) + v))
            for p in pairs
        ]
        avg_nll = -sum(ll) / len(ll)
        r = got[doc_id]
        assert r.n_bigrams == len(pairs)
        assert r.avg_nll == pytest.approx(avg_nll, rel=1e-9)
        assert r.perplexity == pytest.approx(math.exp(avg_nll), rel=1e-9)
        checked += 1
    assert checked > 0


def test_model_slice_is_partition_invariant(spark, docs):
    """The model must be a function of content, not of layout: repartition
    the corpus and the trained counts must be identical (this is the
    property df.sample() would violate)."""
    df, _ = docs
    _, bi_a = train_bigram_model(df, model_pct=MODEL_PCT)
    _, bi_b = train_bigram_model(df.repartition(7), model_pct=MODEL_PCT)
    a = {(r.w1, r.w2): r.c12 for r in bi_a.collect()}
    b = {(r.w1, r.w2): r.c12 for r in bi_b.collect()}
    assert a == b
