"""Spark-native Bloom-filter prefilter for large anti-joins.

The reference's delta detection is an in-memory pandas `isin` against the
master key set (fda_watcher.py:397-403) — exact, but it requires the whole
key set on one machine. The Spark-shaped scale path for "which of these
N new records have we seen before?" is an anti-join, and at 100 TB the
anti-join's shuffle (both sides repartitioned on the key) is the dominant
cost even though the vast majority of new rows match nothing.

This module builds a Bloom filter over the master keys AS A DATAFRAME
AGGREGATION — no driver collect, no JVM sketch objects, no Python in the
hot path — and uses it to split the new batch map-side:

  build:  master keys -> explode k=xxhash64(key, seed) bit positions
          -> groupBy(word = pos div 64) bit_or(mask)    [<= m/64 rows]
          -> one row holding map<word, bits>            [m/8 bytes]
  probe:  crossJoin(broadcast(1-row bloom)) + a forall() over the k
          positions — pure column expressions, zero shuffle, evaluated
          inside the scan stage
  verify: only the "maybe seen" rows (true dups + fpp of the rest) enter
          the exact anti-join; "definitely new" rows bypass it entirely.

The result is EXACTLY the plain anti-join (Bloom filters have no false
negatives), so the operator is oracle-checkable; the win is that the
shuffled volume drops from |new| to |dups| + fpp*|new|.

Scale notes (100 TB): the bloom state is m/8 bytes broadcast once —
size m for the expected master cardinality (m ≈ 10 bits/key gives
fpp ≈ 1%; 10^9 keys ≈ 1.2 GB, still broadcastable). Beyond that,
range-partition the master and build one bloom per range. An undersized
m degrades fpp (less pruning), never correctness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_build", "bloom_anti_join"]


def _positions(col, m_bits: int, k: int) -> list:
    """k bit positions in [0, m_bits) via independently seeded xxhash64."""
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]


def bloom_build(keys: DataFrame, key: str, m_bits: int, k: int) -> DataFrame:
    """Aggregate `keys[key]` into a 1-row DataFrame with a `_bf` column:
    map<long, long> of 64-bit words covering the m_bits bitmap.

    One shuffle of (word, mask) pairs with map-side partial bit_or — the
    post-shuffle size is <= m_bits/64 rows regardless of key count.
    """
    pos = keys.select(
        F.explode(F.array(*_positions(F.col(key), m_bits, k))).alias("pos")
    )
    words = (
        pos.select(
            F.shiftright("pos", 6).alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("m"),
        )
        .groupBy("w")
        .agg(F.expr("bit_or(m)").alias("bits"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("w", "bits"))).alias("_bf")
    )


# forall over the position array: every probed bit must be set for the key
# to be "maybe in master". element_at misses (word never written) read as 0.
_PROBE = (
    "forall(_bfpos, p -> (shiftright(coalesce(element_at(_bf, p div 64), "
    "CAST(0 AS BIGINT)), CAST(p % 64 AS INT)) & 1) = 1)"
)


def bloom_anti_join(
    new: DataFrame,
    master: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Rows of `new` whose `key` does not appear in `master` — exact
    anti-join semantics (NULL-keyed new rows are kept, as with left_anti),
    with a Bloom prefilter so only maybe-seen rows reach the join."""
    bloom = bloom_build(master.select(key), key, m_bits, k)
    probed = (
        new.crossJoin(F.broadcast(bloom))
        .withColumn("_bfpos", F.array(*_positions(F.col(key), m_bits, k)))
        .withColumn("_bfmaybe", F.expr(_PROBE))
    )
    definite_new = probed.filter(~F.col("_bfmaybe")).drop("_bf", "_bfpos", "_bfmaybe")
    candidates = probed.filter(F.col("_bfmaybe")).drop("_bf", "_bfpos", "_bfmaybe")
    verified_new = candidates.join(master.select(key), on=key, how="left_anti")
    # candidates.join reorders `key` first; align columns by name
    return definite_new.unionByName(verified_new.select(*definite_new.columns))
