"""Pins for operators/bpe.py (distributed BPE merge learning).

The oracle queries are differential-checked in test_oracle / driver_sim;
these pin the operator against a PURE-PYTHON reference implementation of
Sennrich-style BPE (greedy left-to-right positional scan) under
hypothesis-random vocabularies — the fold-based merge application must
match the positional scan exactly — plus partition invariance.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from rag_pipelines_spark.io import table
from rag_pipelines_spark.operators.bpe import (
    bpe_encode_counts,
    learn_bpe_merges,
    word_vocab,
)
from tests.conftest import SF_DIR_SMOKE


# --- pure-Python reference (positional scan, the textbook algorithm) ---


def _ref_apply(s: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(s):
        if i < len(s) - 1 and s[i] == a and s[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _ref_learn(word_freqs: dict[str, int], n_merges: int):
    syms = {w: list(w) for w in word_freqs}
    merges = []
    for rank in range(1, n_merges + 1):
        counts: dict[tuple[str, str], int] = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (a, b), cnt = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, a, b, cnt))
        syms = {w: _ref_apply(s, a, b) for w, s in syms.items()}
    return merges, syms


_WORDS = st.lists(
    st.text(alphabet="abc", min_size=1, max_size=8),
    min_size=1,
    max_size=12,
    unique=True,
)


@settings(max_examples=12, deadline=None)
@given(words=_WORDS, freqs=st.data())
def test_learn_matches_python_reference(spark, words, freqs):
    """Merge sequence AND final symbolization equal the textbook
    positional-scan implementation on random small vocabularies — this
    is the proof that the zero-shuffle fold application is equivalent to
    the scan (and that the tie-break orders agree)."""
    wf = {w: freqs.draw(st.integers(1, 5), label=w) for w in words}
    vocab = spark.createDataFrame(list(wf.items()), "word string, freq long")
    got_merges, final_v, _ = learn_bpe_merges(vocab, 4)
    exp_merges, exp_syms = _ref_learn(wf, 4)
    assert got_merges == exp_merges
    got_syms = {
        r["word"]: list(r["s"]) for r in final_v.collect()
    }
    assert got_syms == exp_syms


def test_learning_is_partitioning_invariant(spark):
    docs = table(spark, SF_DIR_SMOKE, "documents")
    a, _, _ = learn_bpe_merges(word_vocab(docs), 4)
    b, _, _ = learn_bpe_merges(
        word_vocab(docs.repartition(13, "doc_id")), 4
    )
    assert a == b


def test_encode_counts_are_join_consistent(spark):
    """n_tokens sums the vocab-side symbol counts over the doc's words;
    n_words <= whitespace token count (cap-excluded words drop)."""
    docs = table(spark, SF_DIR_SMOKE, "documents")
    _, final_v, _ = learn_bpe_merges(word_vocab(docs), 3)
    enc = bpe_encode_counts(docs, final_v)
    row = enc.agg(
        F.sum("n_words").alias("w"), F.sum("n_tokens").alias("t")
    ).collect()[0]
    assert row["t"] >= row["w"]  # every word is >= 1 token
    # tokens never exceed characters
    chars = docs.select(
        F.sum(F.length(F.regexp_replace("text", r"\s+", ""))).alias("c")
    ).collect()[0]["c"]
    assert row["t"] <= chars
