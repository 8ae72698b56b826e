"""Bigram language-model quality filtering (CCNet-style perplexity tier).

A canonical LLM-training-data operator the reference pipeline lacks: score
every document against an n-gram language model trained on a trusted slice
of the corpus, and keep/bucket documents by how "familiar" the model finds
them (CCNet buckets by Wikipedia-LM perplexity; Gopher/RefinedWeb use the
same shape with different models).

Spark-first design, and why it holds at 100 TB:

* **Model slice** — a deterministic content-hash sample
  (`operators/sampling.py::hash_bucket`), NOT `df.sample`: the slice is
  stable under repartitioning/cluster resize, and the DuckDB oracle can
  reproduce it bit-for-bit from `md5(doc_id)`.
* **Bigram derivation is shuffle-free**: tokens come from one `split`,
  bigrams from `zip_with(slice(toks,1,n-1), slice(toks,2,n-1), struct)` —
  pure per-row array math inside whole-stage codegen. No posexplode +
  window-lag formulation (that would shuffle the full token stream by
  doc_id for no reason).
* **Model counts** are two `groupBy().count()` passes over exploded
  tokens/bigrams — map-side partial aggregation compresses each task's
  output to its local vocabulary, so the shuffle is vocabulary-sized
  (Zipf: ~10^6-10^8 keys at web scale), not token-stream-sized.
* **Scoring join** is an equi-join on the bigram key. At fixture scale
  Catalyst broadcasts the model; at web scale AQE picks shuffle-hash and
  splits the skewed stop-bigram keys (the model side is unique per key, so
  the skew is bounded to the probe side and AQE's split handles it).
* **Exactness contract**: the oracle-checked score is integer-exact —
  bigram counts, model-hit counts, and ONE final double division
  (IEEE-exact, order-independent), so the driver's value hash cannot drift.
  True add-one log-perplexity (irrational `ln`) is served by
  `perplexity()` and verified by a brute-force property test instead
  (`tests/test_lm.py`) — `ln` is not correctly-rounded-guaranteed across
  engines, so it is deliberately kept out of the hash-checked tier.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from rag_pipelines_spark.operators.sampling import hash_bucket

__all__ = ["tokens", "bigrams", "train_bigram_model", "familiarity", "perplexity"]


def tokens(text_col: str = "text") -> F.Column:
    """Whitespace tokens of the lowercased text (the repo-wide tokenizer
    contract shared with q_token_stats / q_lang_id so all text-tier
    operators agree on what a token is)."""
    return F.split(F.lower(text_col), " ")


def bigrams(text_col: str = "text") -> F.Column:
    """array<struct<w1,w2>> of adjacent token pairs — zero-shuffle array
    math (zip of the token array with itself shifted by one)."""
    toks = tokens(text_col)
    n = F.size(toks)
    return F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def train_bigram_model(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model_pct: int = 30,
) -> tuple[DataFrame, DataFrame]:
    """(unigram_counts, bigram_counts) from the deterministic model slice
    (hash_bucket(id) < model_pct of the corpus).

    Two aggregation passes, both vocabulary-sized after map-side combine.
    The returned frames are unique-per-key — safe build sides for the
    scoring joins at any corpus scale.
    """
    slice_df = docs.filter(hash_bucket(id_col) < model_pct)
    uni = (
        slice_df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("c1"))
    )
    bi = (
        slice_df.select(F.explode(bigrams(text_col)).alias("p"))
        .select("p.w1", "p.w2")
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("c12"))
    )
    return uni, bi


def familiarity(
    docs: DataFrame,
    bigram_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Integer-exact LM-familiarity score per document.

    Columns: n_bigrams, known_bigrams (pairs the model has seen),
    model_hits (sum of model counts over the doc's pairs), familiarity
    (known/n — one exact IEEE division; NULL for <2-token docs).

    Docs with no bigrams are kept (left join from the corpus) so the
    output is a total function of the input — a filter stage downstream
    must see every doc to make a keep/drop decision.
    """
    pairs = docs.select(F.col(id_col), F.explode(bigrams(text_col)).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )
    scored = (
        pairs.join(bigram_counts, ["w1", "w2"], "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_bigrams"),
            F.count("c12").alias("known_bigrams"),
            F.sum(F.coalesce("c12", F.lit(0))).alias("model_hits"),
        )
    )
    return (
        docs.select(id_col)
        .join(scored, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.coalesce("known_bigrams", F.lit(0)).alias("known_bigrams"),
            F.coalesce("model_hits", F.lit(0)).alias("model_hits"),
            F.when(
                F.col("n_bigrams") > 0,
                F.col("known_bigrams").cast("double") / F.col("n_bigrams"),
            ).alias("familiarity"),
        )
    )


def perplexity(
    docs: DataFrame,
    unigram_counts: DataFrame,
    bigram_counts: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Add-one-smoothed bigram perplexity per document (the true CCNet
    statistic): ppl = exp(-1/n * sum ln((c12+1)/(c1+V))).

    `ln` keeps this out of the hash-checked oracle tier (see module
    docstring); correctness is pinned by tests/test_lm.py's brute-force
    differential. Join shape matches familiarity(); the extra unigram
    join is vocabulary-keyed and AQE-managed the same way.
    """
    v = unigram_counts.select(F.count("*").alias("V"))
    pairs = docs.select(F.col(id_col), F.explode(bigrams(text_col)).alias("p")).select(
        id_col, "p.w1", "p.w2"
    )
    terms = (
        pairs.join(bigram_counts, ["w1", "w2"], "left")
        .join(unigram_counts.withColumnRenamed("w", "w1"), "w1", "left")
        .crossJoin(F.broadcast(v))
        .select(
            id_col,
            F.log(
                (F.coalesce("c12", F.lit(0)) + F.lit(1)).cast("double")
                / (F.coalesce("c1", F.lit(0)) + F.col("V")).cast("double")
            ).alias("ll"),
        )
    )
    scored = terms.groupBy(id_col).agg(
        F.count("*").alias("n_bigrams"),
        F.avg("ll").alias("avg_ll"),
    )
    return scored.select(
        id_col,
        "n_bigrams",
        (-F.col("avg_ll")).alias("avg_nll"),
        F.exp(-F.col("avg_ll")).alias("perplexity"),
    )
