"""Data-quality expectation checking with quarantine routing.

The reference enforces quality three ways: pydantic schema validation at
write time (pubmed_enrichment.py:58-64,384), verification gates
(pubmed_enrichment.py:270-296), and a dead-letter directory for failures
(pubmed_enrichment.py:450-456). This module generalizes all three into
declarative row-level expectations over any DataFrame:

  * `check_expectations` — one summary row per rule (violations, rate):
    the batch-audit view, a single pass regardless of rule count (every
    rule compiles to a SUM(CASE) in one aggregate — no per-rule scan).
  * `split_on_expectations` — route rows passing ALL rules to the main
    sink and failures (with a reasons array) to quarantine, mirroring the
    dead-letter flow. Both outputs come off one cached/scanned plan; the
    filter is a pure map stage, no shuffle.

Scale: audits of 100 TB cost one scan; predicates are JVM column
expressions so they ride whole-stage codegen and push into parquet where
possible.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def check_expectations(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """One row per rule: (rule, n_rows, n_violations, violation_rate).

    A violation is a row where the rule predicate is NOT true (null
    predicate results count as violations — null-hostile like pydantic).
    """
    aggs = []
    for name, pred in rules.items():
        viol = F.sum(
            F.when(pred.isNull() | ~pred, 1).otherwise(0)
        ).alias(f"_v_{name}")
        aggs.append(viol)
    counted = df.agg(F.count("*").alias("_n"), *aggs)
    per_rule = [
        counted.select(
            F.lit(name).alias("rule"),
            F.col("_n").alias("n_rows"),
            F.col(f"_v_{name}").alias("n_violations"),
            (F.col(f"_v_{name}") / F.col("_n")).alias("violation_rate"),
        )
        for name in rules
    ]
    return reduce(lambda a, b: a.unionByName(b), per_rule)


def split_on_expectations(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """(passing, quarantined) — quarantined rows carry a `reasons` array.

    ref dead-letter flow: pubmed_enrichment.py:450-456.
    """
    reasons = F.array_compact(
        F.array(
            *[
                F.when(pred.isNull() | ~pred, F.lit(name))
                for name, pred in rules.items()
            ]
        )
    )
    tagged = df.withColumn("reasons", reasons)
    good = tagged.filter(F.size("reasons") == 0).drop("reasons")
    bad = tagged.filter(F.size("reasons") > 0)
    return good, bad
