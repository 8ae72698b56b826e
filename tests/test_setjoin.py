"""Prefix-filtered Jaccard join (operators/setjoin.py): equality with the
all-pairs brute force (the property the prefix-filtering lemma promises),
exact threshold boundaries, and the candidate-pruning effect."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from rag_pipelines_spark.operators.setjoin import jaccard_prefix_join


def _brute_force(spark, docs, num, den):
    toks = (
        docs.select(
            F.col("doc_id").alias("id"),
            F.explode(F.array_distinct(F.split("text", " "))).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    sets = toks.groupBy("id").agg(
        F.collect_set("tok").alias("s"), F.count("*").alias("n")
    )
    a = sets.select(
        F.col("id").alias("a_id"), F.col("s").alias("sa"), F.col("n").alias("na")
    )
    b = sets.select(
        F.col("id").alias("b_id"), F.col("s").alias("sb"), F.col("n").alias("nb")
    )
    pairs = a.join(b, F.col("a_id") < F.col("b_id"))
    i = F.size(F.array_intersect("sa", "sb")).cast("long")
    u = F.col("na") + F.col("nb") - F.col("i")
    return (
        pairs.withColumn("i", i)
        .withColumn("u", u)
        .filter(F.col("i") * F.lit(den) >= F.lit(num) * F.col("u"))
        .select(
            "a_id",
            "b_id",
            (F.col("i").cast("double") / F.col("u").cast("double")).alias("jaccard"),
        )
    )


def _corpus(spark, n_docs=120, vocab=40, words=15):
    """Deterministic corpus with heavy overlap: doc i draws `words` tokens
    from a sliding window of the vocabulary, so neighbors are near-dups and
    distant docs are dissimilar. Token sizes hit every residue mod 5 (the
    ceiling-path diversity the integer-math claim needs)."""
    rows = []
    for i in range(n_docs):
        k = words + (i % 5)  # sizes 15..19 -> t*|s| crosses integers
        toks = [f"w{(i // 3 + j) % vocab}" for j in range(k)]
        rows.append((i, " ".join(toks)))
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.parametrize("num,den", [(3, 5), (4, 5), (1, 2), (9, 10)])
def test_matches_brute_force(spark, num, den):
    docs = _corpus(spark)
    got = sorted(map(tuple, jaccard_prefix_join(docs, "doc_id", "text", num, den).collect()))
    want = sorted(map(tuple, _brute_force(spark, docs, num, den).collect()))
    assert got == want and len(want) > 0


def test_exact_boundary_pair_included(spark):
    # |a| = |b| = 4, intersection 3 -> J = 3/5 EXACTLY: must be in a
    # t = 3/5 join (the integer cross-multiplication has no float fuzz)
    docs = spark.createDataFrame(
        [(1, "p q r s"), (2, "p q r z")], "doc_id long, text string"
    )
    got = jaccard_prefix_join(docs, "doc_id", "text", 3, 5).collect()
    assert [(r.a_id, r.b_id) for r in got] == [(1, 2)]
    assert got[0].jaccard == 0.6
    # ...and excluded one notch above
    assert jaccard_prefix_join(docs, "doc_id", "text", 61, 100).count() == 0


def test_duplicate_tokens_and_empties_ignored(spark):
    # repeated words collapse to the distinct set; double spaces yield
    # empty tokens which are dropped — identical sets -> J = 1.0
    docs = spark.createDataFrame(
        [(1, "a a  b b c"), (2, "c  b a")], "doc_id long, text string"
    )
    got = jaccard_prefix_join(docs, "doc_id", "text", 9, 10).collect()
    assert len(got) == 1 and got[0].jaccard == 1.0


def test_prefix_prunes_candidates(spark):
    """On a corpus of mostly-dissimilar docs the prefix equi-join must
    produce far fewer candidates than all-pairs (that's the scale claim)."""
    n = 200
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(10)) + " common") for i in range(n)],
        "doc_id long, text string",
    )
    # every doc shares only the frequent token 'common' -> it never enters a
    # prefix (rarest-first order), so NO candidate pair survives
    assert jaccard_prefix_join(docs, "doc_id", "text", 1, 2).count() == 0


# ---------------------------------------------------------------------------
# Bipartite (cross-corpus) form — fuzzy decontamination
# ---------------------------------------------------------------------------


def _brute_bipartite(left, right, num, den):
    """All-pairs reference in plain Python (distinct word sets)."""
    ls = {r.doc_id: set(t for t in r.text.split(" ") if t) for r in left.collect()}
    rs = {r.doc_id: set(t for t in r.text.split(" ") if t) for r in right.collect()}
    out = []
    for li, la in ls.items():
        for ri, rb in rs.items():
            i = len(la & rb)
            u = len(la | rb)
            if u and i * den >= num * u:
                out.append((li, ri, i / u))
    return sorted(out)


@pytest.mark.parametrize("num,den", [(3, 5), (4, 5), (9, 10)])
def test_bipartite_matches_brute_force(spark, num, den):
    from rag_pipelines_spark.operators.setjoin import jaccard_prefix_join_bipartite

    docs = _corpus(spark)
    left = docs.filter(F.col("doc_id") % 2 == 0)
    right = docs.filter(F.col("doc_id") % 3 == 0)
    got = sorted(
        (r.left_id, r.right_id, r.jaccard)
        for r in jaccard_prefix_join_bipartite(
            left, right, "doc_id", "text", num, den
        ).collect()
    )
    want = _brute_bipartite(left, right, num, den)
    assert got == want and len(want) > 0
    # overlap docs (id % 6 == 0) self-match at J = 1.0
    assert all((i, i, 1.0) in got for i in range(0, 120, 6))


def test_bipartite_disjoint_vocab_no_pairs(spark):
    from rag_pipelines_spark.operators.setjoin import jaccard_prefix_join_bipartite

    left = spark.createDataFrame(
        [(1, "a b c"), (2, "d e f")], "doc_id long, text string"
    )
    right = spark.createDataFrame(
        [(10, "x y z"), (11, "u v w")], "doc_id long, text string"
    )
    assert (
        jaccard_prefix_join_bipartite(left, right, "doc_id", "text", 1, 2).count()
        == 0
    )
