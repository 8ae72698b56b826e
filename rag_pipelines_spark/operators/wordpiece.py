"""Distributed WordPiece-style tokenization (greedy longest-match-first
segmentation, Wu et al. 2016 / Song et al. 2021 "Fast WordPiece") — the
companion to operators/bpe.py: BPE learns a MERGE table and encodes by
replaying merges; WordPiece encodes by scanning each word left-to-right
and taking the LONGEST vocabulary piece at every position (single
characters are the implicit fallback, so segmentation is total).

Everything is exact integer counts and string compares — no float
contract needed, so the DuckDB oracle replays vocabulary selection,
match table, and the greedy scan bitwise (queries/bpe.py).

Vocabulary selection (deterministic): the top `vocab_size` multi-char
substrings (length 2..max_piece_len) of the corpus word vocabulary,
weighted by word frequency, tie-broken (count DESC, piece ASC). Single
characters are always implicitly in-vocab via the fallback step — the
standard WordPiece coverage guarantee without an UNK token.

Spark-first / 100 TB posture:
  * ONE corpus pass builds (word, freq) — reuse operators/bpe.py::
    word_vocab (map-side combinable hash agg); the corpus is never
    touched again.
  * Candidate pieces explode the VOCABULARY frame only:
    <= max_word_len × (max_piece_len-1) rows per distinct word.
  * The piece-count shuffle and the per-(word, start) longest-match agg
    are both map-side combinable; the vocab broadcasts into the match
    join.
  * The greedy scan itself is a ZERO-SHUFFLE per-row array fold
    (aggregate over positions with a per-word start->matchlen map) —
    no UDF, whole-stage codegen keeps it JVM-side.

Word-length contract: words longer than word_vocab's max_word_len (32)
are excluded from learning and encoding, bounding the oracle's
positional range scan exactly like the BPE family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = [
    "piece_candidates",
    "wordpiece_vocab",
    "wordpiece_segment",
    "wordpiece_encode_counts",
]


def piece_candidates(words: DataFrame, *, max_piece_len: int = 4) -> DataFrame:
    """(word, freq, s, l, piece): every multi-char substring occurrence
    position of every vocabulary word — length 2..max_piece_len, start
    1-based. Vocabulary-sized × a small constant, never corpus-sized."""
    lens = ", ".join(str(x) for x in range(2, max_piece_len + 1))
    return words.select(
        "word",
        "freq",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, length(word)), s ->
                    filter(transform(array({lens}), l ->
                        IF(s + l - 1 <= length(word),
                           named_struct('s', s, 'l', l,
                                        'piece', substring(word, s, l)),
                           CAST(NULL AS
                                STRUCT<s: INT, l: INT, piece: STRING>))),
                        x -> x IS NOT NULL)))"""
            )
        ).alias("c"),
    ).select("word", "freq", F.col("c.s").alias("s"),
             F.col("c.l").alias("l"), F.col("c.piece").alias("piece"))


def wordpiece_vocab(words: DataFrame, *, vocab_size: int = 200,
                    max_piece_len: int = 4) -> DataFrame:
    """(piece, cnt, rk): the top multi-char pieces by frequency-weighted
    occurrence count, tie-broken (cnt DESC, piece ASC) — a deterministic
    TakeOrderedAndProject over the vocabulary-sized candidate counts."""
    counts = (
        piece_candidates(words, max_piece_len=max_piece_len)
        .groupBy("piece")
        .agg(F.sum("freq").alias("cnt"))
    )
    # rank AFTER the limit: the window runs on vocab_size rows, not the
    # full candidate count frame (TakeOrderedAndProject does the top-V)
    return (
        counts.orderBy(F.col("cnt").desc(), "piece")
        .limit(vocab_size)
        .withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.col("cnt").desc(), "piece")),
        )
    )


def wordpiece_segment(words: DataFrame, vocab: DataFrame, *,
                      max_piece_len: int = 4) -> DataFrame:
    """(word, freq, pieces): greedy longest-match-first segmentation of
    each vocabulary word under `vocab` (a (piece) frame of multi-char
    pieces). At every position take the longest in-vocab piece starting
    there, else emit the single character — the WordPiece scan.

    Plan: candidate positions join the broadcast vocab; the per-(word,
    start) longest match reduces map-side; the scan is a zero-shuffle
    array fold over a per-word start->len map."""
    matches = (
        piece_candidates(words, max_piece_len=max_piece_len)
        .join(F.broadcast(vocab.select("piece")), "piece")
        .groupBy("word", "s")
        .agg(F.max("l").alias("ml"))
    )
    mmap = matches.groupBy("word").agg(
        F.map_from_entries(F.collect_list(F.struct("s", "ml"))).alias("m")
    )
    seg = words.join(mmap, "word", "left").withColumn(
        "mm", F.coalesce(F.col("m"), F.expr("CAST(map() AS MAP<INT, INT>)"))
    )
    pieces = F.expr(
        """aggregate(
            sequence(1, length(word)),
            named_struct('pos', 1, 'acc', CAST(array() AS ARRAY<STRING>)),
            (a, i) -> IF(i = a.pos,
                named_struct(
                    'pos', a.pos + coalesce(try_element_at(mm, a.pos), 1),
                    'acc', array_append(a.acc,
                        substring(word, a.pos,
                                  coalesce(try_element_at(mm, a.pos), 1)))),
                a),
            a -> a.acc)"""
    )
    return seg.select("word", "freq", pieces.alias("pieces"))


def wordpiece_encode_counts(words: DataFrame, vocab: DataFrame, *,
                            max_piece_len: int = 4) -> DataFrame:
    """(piece, n_words, cnt): corpus-level piece frequencies under the
    greedy segmentation — cnt is weighted by word frequency (how often
    the piece is emitted encoding the whole corpus), n_words counts
    distinct vocabulary words emitting it."""
    seg = wordpiece_segment(words, vocab, max_piece_len=max_piece_len)
    return (
        seg.select("word", "freq", F.explode("pieces").alias("piece"))
        .groupBy("piece")
        .agg(
            F.countDistinct("word").alias("n_words"),
            F.sum("freq").alias("cnt"),
        )
    )
