"""Model-based quality scoring: linear text-classifier INFERENCE as pure
column math (fastText-architecture: hashed token features -> linear layer).

The heuristic quality signals (operators/textstats.py — length, punct,
stopword ratios) are the cheap tier; production pipelines then apply a
TRAINED quality model (CCNet / GPT-3 / fastText-style) corpus-wide. That
inference step is what this module provides, Spark-first:

  * **Zero shuffle.** The logit is a per-row fold over the token array —
    ``aggregate(tokens, 0, acc + w[bucket(tok)])`` — so scoring is
    map-only: no explode, no groupBy, nothing moves. At 100 TB the cost
    is one pass over the text bytes, embarrassingly parallel.
  * **JVM-side weight lookup.** Weights live in a broadcast ARRAY literal
    indexed positionally (O(1) — unlike map element_at, which is a linear
    scan per the bloom-probe lesson), bucket = the same md5-prefix hash
    the hashed-BoW embedder uses (operators/embedding.py::token_bucket),
    so DuckDB computes identical features.
  * **Bitwise determinism.** Weights are exact 3-decimal literals; each
    token contribution is exact decimal, summed in an order-independent
    decimal fold; the >= 0 class decision happens ON THE DECIMAL, and
    only the reported logit is cast to double at the end — both engines
    agree bit-for-bit (same scheme as the BM25/cosine queries).

Weights come from an externally trained model (fastText & friends train
off-cluster); ``md5_weights`` generates a deterministic pseudo-random
weight vector for fixtures/tests. The operator is inference only — the
engine's job is applying the model at corpus scale.
"""

from __future__ import annotations

import hashlib
from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rag_pipelines_spark.operators.embedding import token_bucket, tokens

__all__ = ["md5_weights", "linear_quality_score"]

_DEC = "decimal(18,3)"


def md5_weights(dim: int, tag: str = "w") -> list[Decimal]:
    """Deterministic pseudo-random 3-decimal weights in [-1, 1]:
    w_j = ((md5("{tag}{j}") first-8-hex as int) % 2001 - 1000) / 1000."""
    return [
        Decimal(
            (int(hashlib.md5(f"{tag}{j}".encode()).hexdigest()[:8], 16) % 2001)
            - 1000
        )
        / Decimal(1000)
        for j in range(dim)
    ]


def linear_quality_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights: list[Decimal],
    bias: Decimal = Decimal("0"),
) -> DataFrame:
    """(id_col, n_tokens, logit, predicted) — logit = bias + sum over
    tokens of weights[bucket(tok)]; predicted = 1 iff the exact-decimal
    logit >= 0. Map-only: one fold per row, no shuffle anywhere."""
    dim = len(weights)
    warr = F.array(*[F.lit(str(w)).cast(_DEC) for w in weights])
    toks = tokens(F.col(text_col))
    total = F.aggregate(
        toks,
        F.lit(str(bias)).cast(_DEC),
        lambda acc, x: (
            acc
            + F.element_at(warr, (token_bucket(x, dim) + 1).cast("int"))
        ).cast(_DEC),
    )
    return df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        total.cast("double").alias("logit"),
        F.when(total >= 0, 1).otherwise(0).alias("predicted"),
    )
