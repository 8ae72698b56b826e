"""Deduplication operators — exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale contract: no all-pairs comparison ever materializes. Candidate pairs
always come from an equi-join on a *blocking key* (hash band / simhash
prefix / shingle bucket), so shuffle volume stays O(corpus), and the
expensive verification (exact Jaccard / edit distance) runs only on
candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, key_cols: list[str], order_col: str) -> DataFrame:
    """One row per key, deterministically keeping the min(order_col) row.

    Equivalent to the reference's md5-RAG_ID one-record-per-URL guarantee
    (ref: fda_watcher.py:86-93,327-329) but deterministic under parallelism
    (dropDuplicates keeps an arbitrary row; min-by keeps a stable one).
    Single hash-aggregate shuffle on the key.

    Ties on order_col are broken by a row-content hash folded into a
    composite (order_col, hash) struct ordering — min_by alone would keep
    whichever duplicate a partition merge encountered first, and each
    column's min_by could even come from *different* tied rows. The shared
    composite key makes every output column come from the same, stable
    winning row (rows identical in all non-key columns are interchangeable,
    so a 64-bit hash collision between them is harmless).
    """
    others = [c for c in df.columns if c not in key_cols]
    tie = F.xxhash64(*[F.col(c) for c in others]) if others else F.lit(0)
    ordk = F.struct(F.col(order_col).alias("o"), tie.alias("t"))
    return df.groupBy(*key_cols).agg(
        *[F.min_by(c, ordk).alias(c) for c in others]
    )


def word_shingles(ws, shingle_size: int = 3):
    """Distinct word n-gram shingles of a token-array column.

    Docs with fewer than `shingle_size` tokens yield an EMPTY array — a
    naive sequence(1, size-(n-1)) would clamp to 1 and emit one partial
    shingle, diverging from range-based (end-exclusive) oracle semantics
    for short docs. A null token array yields null (matching SQL oracles,
    where split(NULL) is NULL end-to-end).

    Formulation notes (both measured at sf0.1):
      * the guard is a slice-to-length clamp, NOT a CASE WHEN around the
        array — wrapping a generator input in when() drops the explode
        out of the fast path (~20x slower in Generate);
      * try_element_at, not element_at — the clamped-off partial shingle
        still evaluates under ANSI mode and element_at would throw on
        short docs before slice() can discard it.
    """
    n_sh = F.greatest(F.size(ws) - (shingle_size - 1), F.lit(0))
    raw = F.transform(
        F.sequence(F.lit(1), F.greatest(n_sh, F.lit(1))),
        lambda i: F.concat_ws(
            " ", *[F.try_element_at(ws, i + k) for k in range(shingle_size)]
        ),
    )
    return F.array_distinct(F.slice(raw, 1, n_sh))


# ---------------------------------------------------------------------------
# SimHash (64-bit, per-bit majority vote) — pure JVM expressions
# ---------------------------------------------------------------------------


def simhash64_df(
    df: DataFrame, id_col: str, text_col: str, bits: int = 64, hash_fn=None
) -> DataFrame:
    """bits-wide SimHash per document.

    Shape: explode distinct tokens -> token hash -> one aggregation computing
    per-bit majority votes -> bitwise assemble. One shuffle on the doc
    id; all math stays in whole-stage codegen (no Python, no UDF).

    hash_fn maps a token Column to a long Column; default xxhash64 (fastest,
    JVM-native). An md5-derived hash (same hex in any engine) makes the
    result portable for cross-engine verification at bits<=60.
    """
    if hash_fn is None:
        hash_fn = F.xxhash64
    # explode_outer + null-guarded hash: empty/whitespace-only docs keep
    # their row and land on simhash 0 (no token -> no vote -> all bits 0)
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.array_distinct(F.split(F.lower(F.col(text_col)), r"\s+")),
                lambda x: x != F.lit(""),
            )
        ).alias("tok"),
    ).withColumn("h", F.when(F.col("tok").isNotNull(), hash_fn(F.col("tok"))))

    votes = toks.groupBy(id_col).agg(
        *[
            F.sum(
                (F.shiftright("h", i).bitwiseAND(F.lit(1)) * 2 - 1).cast("long")
            ).alias(f"v{i}")
            for i in range(bits)
        ]
    )
    sim = F.lit(0).cast("long")
    for i in range(bits):
        bit = F.when(F.col(f"v{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sim = sim.bitwiseOR(F.shiftleft(bit, i))
    return votes.select(F.col(id_col), sim.alias("simhash"))


def simhash_candidates(
    df: DataFrame, id_col: str, text_col: str, prefix_bits: int = 16
) -> DataFrame:
    """Near-dup candidate pairs: block on the simhash high bits, verify by
    Hamming distance <= 3 (bit_count of xor). Equi-join on the prefix —
    no cartesian."""
    sh = simhash64_df(df, id_col, text_col).withColumn(
        "band", F.shiftrightunsigned("simhash", 64 - prefix_bits)
    )
    a = sh.select(
        F.col(id_col).alias("a_id"),
        F.col("simhash").alias("a_sh"),
        "band",
    )
    b = sh.select(
        F.col(id_col).alias("b_id"),
        F.col("simhash").alias("b_sh"),
        F.col("band").alias("b_band"),
    )
    pairs = a.join(b, (a.band == b.b_band) & (F.col("b_id") > F.col("a_id")))
    hamming = F.bit_count(F.col("a_sh").bitwiseXOR(F.col("b_sh")))
    return pairs.select("a_id", "b_id", hamming.alias("hamming")).filter(
        F.col("hamming") <= 3
    )


# ---------------------------------------------------------------------------
# MinHash + LSH (pyspark.ml) — banding via approxSimilarityJoin
# ---------------------------------------------------------------------------


def minhash_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float = 0.8,
    num_hash_tables: int = 5,
    shingle_size: int = 3,
    num_features: int = 1 << 18,
) -> DataFrame:
    """Near-dup candidate pairs via MinHashLSH over word shingles.

    shingle -> HashingTF sparse vector -> MinHashLSH(seed=42) ->
    approxSimilarityJoin at jaccard-distance <= 1-threshold. The LSH join
    is an equi-join on (hash table, band value) internally — O(n) shuffle.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    # token array materialized once per row — a raw split expression inside
    # the lambda would re-split per element (O(tokens^2))
    toks = df.select(
        F.col(id_col), F.split(F.lower(F.col(text_col)), r"\s+").alias("ws")
    )
    docs = toks.select(
        F.col(id_col), word_shingles(F.col("ws"), shingle_size).alias("shingles")
    ).filter(F.size("shingles") > 0)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features
    )
    feat = tf.transform(docs)
    lsh = MinHashLSH(
        inputCol="features", outputCol="bands", numHashTables=num_hash_tables, seed=42
    )
    model = lsh.fit(feat)
    joined = model.approxSimilarityJoin(
        feat, feat, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        joined.filter(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.col("jaccard_dist"),
        )
    )
