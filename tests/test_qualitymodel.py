"""Linear quality-model inference (operators/qualitymodel.py): equality
with an in-Python brute-force reference, decimal-exact class decisions,
bias handling, and zero-shuffle plan shape."""

from __future__ import annotations

import hashlib
import re
from decimal import Decimal

from hypothesis import given, settings
from hypothesis import strategies as st

from rag_pipelines_spark.operators.qualitymodel import (
    linear_quality_score,
    md5_weights,
)


def _brute(docs, weights, bias):
    out = []
    dim = len(weights)
    for i, text in docs:
        toks = [t for t in re.split("[^a-z0-9]+", text.lower()) if t != ""]
        total = bias
        for tok in toks:
            b = int(hashlib.md5(tok.encode()).hexdigest()[:8], 16) % dim
            total += weights[b]
        out.append((i, len(toks), float(total), 1 if total >= 0 else 0))
    return sorted(out)


def _run(spark, docs, weights, bias):
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    rows = linear_quality_score(
        df, "doc_id", "text", weights, bias=bias
    ).collect()
    return sorted((r.doc_id, r.n_tokens, r.logit, r.predicted) for r in rows)


DOCS = [
    (0, "Spark shuffles data! fast-path 42"),
    (1, "the quick brown fox"),
    (2, ""),
    (3, "UPPER lower   MiXeD"),
]


def test_matches_brute_force(spark):
    w = md5_weights(16)
    assert _run(spark, DOCS, w, Decimal("0")) == _brute(DOCS, w, Decimal("0"))


def test_bias_shifts_decision(spark):
    w = [Decimal("-0.5")] * 8  # every token contributes -0.5
    got = dict(
        (i, (n, logit, p)) for i, n, logit, p in _run(spark, DOCS, w, Decimal("10"))
    )
    # doc 1: 4 tokens -> 10 - 2.0 = 8.0, predicted 1
    assert got[1] == (4, 8.0, 1)
    # doc 2 (empty text): logit == bias
    assert got[2] == (0, 10.0, 1)
    assert _run(spark, DOCS, w, Decimal("10")) == _brute(DOCS, w, Decimal("10"))


def test_zero_logit_is_class_one(spark):
    """The >= 0 decision happens on the exact decimal — a logit of exactly
    0 classifies as 1 on both engines, no float wobble."""
    w = [Decimal("0.1"), Decimal("-0.1")] * 4
    docs = [(0, "x")]
    b = int(hashlib.md5(b"x").hexdigest()[:8], 16) % 8
    bias = -w[b]
    got = _run(spark, docs, w, bias)
    assert got == [(0, 1, 0.0, 1)]


def test_plan_is_map_only(spark):
    """No Exchange anywhere: inference is one projection over the scan."""
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    plan = linear_quality_score(
        df, "doc_id", "text", md5_weights(16)
    )._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


_word = st.text(alphabet="ab1 .!", min_size=0, max_size=24)
_docs = st.lists(_word, min_size=1, max_size=6).map(
    lambda ts: [(i, t) for i, t in enumerate(ts)]
)


@settings(max_examples=15, deadline=None)
@given(docs=_docs)
def test_property_matches_brute_force(spark, docs):
    w = md5_weights(8)
    assert _run(spark, docs, w, Decimal("0.05")) == _brute(
        docs, w, Decimal("0.05")
    )
