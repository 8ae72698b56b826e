"""Skew mitigation (SCALE.md): salting for hot keys, bucketed state tables.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
session.py) handles most skew at runtime; these operators are the explicit
forms for the cases AQE can't fix — a skewed *aggregation* key, and a
broadcast-too-big dimension with hot keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count(df: DataFrame, key_cols: list[str], salt_buckets: int = 16) -> DataFrame:
    """Two-stage aggregation for skewed group keys.

    Stage 1 groups on (key, salt) — the hot key's rows spread over
    `salt_buckets` reducers; stage 2 merges the partials on the key alone
    (tiny input: one row per key per salt). Same result as a direct
    groupBy().count(), immune to a single reducer absorbing the hot key.
    """
    salted = df.withColumn(
        "_salt", (F.spark_partition_id() % salt_buckets).cast("int")
    )
    partial = salted.groupBy(*key_cols, "_salt").agg(F.count("*").alias("_partial"))
    return partial.groupBy(*key_cols).agg(F.sum("_partial").alias("n"))


def replicated_skew_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Salted equi-join: fact rows get a random salt in [0, B); the dim side
    is replicated B times with every salt value, and the join key becomes
    (key, salt). The hot key's fact rows land on B different reducers
    instead of one. Use when the dim is too big to broadcast but small
    enough to replicate B×.
    """
    salted_facts = facts.withColumn(
        "_salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    replicated_dim = dim.crossJoin(
        F.broadcast(
            facts.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = salted_facts.join(replicated_dim, on=[key, "_salt"])
    return out.drop("_salt")
