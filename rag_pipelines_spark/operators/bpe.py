"""Distributed BPE merge learning (tokenizer training, Sennrich et al.
2016) — vocabulary-sized iterations, bit-reproducible.

Why it exists: the repo already COUNTS BPE-ish tokens
(`q_bpe_token_count`, a fixed regex); training data work also needs the
other direction — learning the merge table itself from the corpus
(custom-domain tokenizers, fertility studies, vocab-size sweeps). The
reference has no tokenizer stage; this extends the §2.11 north-star
text-analysis tier.

Spark-first / 100 TB posture (the Sennrich trick, distributed):
  * ONE corpus pass builds the (word, freq) vocabulary — a map-side
    combinable hash agg; the corpus is never touched again.
  * Every merge iteration runs on the VOCABULARY frame (|distinct
    words|, not |corpus|): pair counts explode <= len(word) pairs per
    word (bounded by max_word_len), the winner is an
    orderBy(count DESC, pair ASC).limit(1) — a 1-row
    TakeOrderedAndProject collect per iteration (the centroid-collect
    precedent) — and the merge applies as a zero-shuffle per-row array
    fold.
  * The vocab frame is localCheckpoint'ed per iteration so plan depth
    stays flat across iterations.

Cross-engine determinism: everything is exact integer counts and string
compares — ties break (count DESC, left ASC, right ASC). The greedy
left-to-right merge application is implemented as an array fold whose
invariant (merged token a||b never equals a, since b is non-empty)
makes it equivalent to the positional scan the DuckDB oracle runs as a
recursive CTE — pinned by hypothesis property tests against a
pure-Python reference (tests/test_bpe.py).

Contract bounds: words longer than `max_word_len` characters are
excluded from BOTH learning and encoding (the standard practical cap;
it also bounds the oracle's positional range scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "word_vocab",
    "apply_merge",
    "learn_bpe_merges",
    "bpe_encode_counts",
]


def word_vocab(
    docs: DataFrame,
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """(word, freq): whitespace word frequencies — the one corpus-sized
    pass. Case-sensitive; empty strings and words past the length cap
    are excluded (same filter on the oracle side)."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter((F.col("word") != "") & (F.length("word") <= max_word_len))
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def apply_merge(sym_col: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of merge (a, b) to a symbol
    array: fold that replaces [.., a] + b with [.., a||b]. Equivalent to
    the positional scan because a||b != a (b non-empty), so a token
    produced by THIS merge can never immediately re-merge."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(a + b))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """(a, b, cnt): adjacent-pair frequencies over the symbolized vocab,
    freq-weighted. Explode is bounded by max_word_len per word; the agg
    shuffle is |distinct pairs| rows."""
    # size(s) >= 2 pre-filter: Spark's sequence(1, 0) is DESCENDING
    # ([1, 0]), which would index element_at(s, 0) and error —
    # single-symbol words contribute no pairs by definition
    pairs = vocab_syms.filter(F.size("s") >= 2).select(
        "freq",
        F.explode(
            F.expr(
                "transform(sequence(1, size(s) - 1),"
                " j -> struct(element_at(s, j) AS a,"
                "             element_at(s, j + 1) AS b))"
            )
        ).alias("p"),
    )
    return (
        pairs.select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "freq")
        .groupBy("a", "b")
        .agg(F.sum("freq").alias("cnt"))
    )


def learn_bpe_merges(
    vocab: DataFrame, n_merges: int
) -> tuple[list[tuple[int, str, str, int]], DataFrame, list[DataFrame]]:
    """Learn `n_merges` BPE merges from a (word, freq) vocabulary.

    Returns (merge table [(rank, a, b, cnt)], final symbolized vocab
    DataFrame (word, freq, s), per-iteration 1-row argmax FRAMES — lazy
    plans over the checkpointed vocab states, so a caller can expose the
    merge table as a distributed result). Each iteration: one vocab-sized
    pair agg, one 1-row argmax collect (ties: cnt DESC, a ASC, b ASC),
    one zero-shuffle fold."""
    # localCheckpoint is LAZY throughout: each iteration's 1-row argmax
    # collect is a TakeOrderedAndProject over ALL partitions of the pair
    # agg, so it materializes the new vocab state's checkpoint as a side
    # effect — one job per merge instead of two (materialize + argmax).
    v = vocab.select(
        "word", "freq", F.split("word", "").alias("s")
    ).localCheckpoint(eager=False)
    merges: list[tuple[int, str, str, int]] = []
    tops: list[DataFrame] = []
    for rank in range(1, n_merges + 1):
        top_df = (
            _pair_counts(v)
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
        )
        top = top_df.collect()
        if not top:  # every word is a single symbol: nothing to merge
            break
        a, b, cnt = top[0]["a"], top[0]["b"], int(top[0]["cnt"])
        merges.append((rank, a, b, cnt))
        tops.append(top_df.select(F.lit(rank).alias("merge_rank"), "a", "b", "cnt"))
        v = v.select(
            "word", "freq", apply_merge(F.col("s"), a, b).alias("s")
        ).localCheckpoint(eager=False)
    return merges, v, tops


def bpe_encode_counts(
    docs: DataFrame,
    final_vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 32,
) -> DataFrame:
    """(id, n_words, n_tokens): per-document BPE token counts under the
    learned merges — the corpus joins the VOCAB-sized (word -> token
    count) table, never re-running merges per occurrence."""
    per_word = final_vocab.select("word", F.size("s").alias("n_sym"))
    words = docs.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), r"\s+")).alias("word"),
    ).filter((F.col("word") != "") & (F.length("word") <= max_word_len))
    return (
        words.join(per_word, "word")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_words"),
            F.sum("n_sym").alias("n_tokens"),
        )
    )
