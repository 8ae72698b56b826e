"""Enrichment & verification joins (J3/J4/J5) as reusable builders.

The reference verifies each doc against its PubMed lookup: exact
normalized-DOI equality first; on DOI absence, title similarity
(SequenceMatcher.ratio() >= 0.90); DOI conflict rejects outright
(pubmed_enrichment.py:270-296). Scale design: the similarity predicate
never runs on a cartesian — candidates come from an equi-join (on the doc
key or a blocking key); the ratio only scores already-matched pairs.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

from rag_pipelines_spark.functions.text import lev_sim, norm_doi, norm_text


@F.pandas_udf(DoubleType())
def seq_ratio_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact difflib.SequenceMatcher.ratio() parity (Arrow-batched).

    ref: pubmed_enrichment.py:291-293. Use only on pre-blocked candidate
    pairs — it is the slow path; `lev_sim` is the JVM-side proxy.
    """
    from difflib import SequenceMatcher

    return pd.Series(
        [
            SequenceMatcher(None, x or "", y or "").ratio()
            for x, y in zip(a, b)
        ]
    )


def verify_match(
    local_title: Column,
    local_doi: Column,
    pm_title: Column,
    pm_doi: Column,
    threshold: float = 0.90,
    exact_ratio: bool = False,
) -> Column:
    """Verification verdict column: 'doi' | 'title' | 'conflict' | 'unverified'.

    Mirrors DocumentVerifier.verify (pubmed_enrichment.py:270-296):
    both DOIs present -> equal (normalized) = 'doi' else 'conflict';
    else titles similar >= threshold -> 'title'; else 'unverified'.
    """
    sim_fn = seq_ratio_udf if exact_ratio else lev_sim
    both_doi = (
        F.nullif(local_doi, F.lit("")).isNotNull()
        & F.nullif(pm_doi, F.lit("")).isNotNull()
    )
    doi_eq = norm_doi(local_doi) == norm_doi(pm_doi)
    title_ok = (
        F.nullif(local_title, F.lit("")).isNotNull()
        & F.nullif(pm_title, F.lit("")).isNotNull()
        & (sim_fn(norm_text(local_title), norm_text(pm_title)) >= threshold)
    )
    return (
        F.when(both_doi & doi_eq, "doi")
        .when(both_doi & ~doi_eq, "conflict")
        .when(title_ok, "title")
        .otherwise("unverified")
    )


def enrich_left_join(
    docs: DataFrame,
    lookup: DataFrame,
    on: str,
    fallbacks: dict[str, Column],
    broadcast_lookup: bool = True,
) -> DataFrame:
    """J3: left-outer enrichment with per-column fallbacks for misses.

    ref: pubmed_enrichment.py:394-448 (fallback doc at 438-448). The lookup
    (distinct keys actually queried) is usually tiny vs the corpus ->
    broadcast by default; misses get `fallbacks[col]`.
    """
    right = F.broadcast(lookup) if broadcast_lookup else lookup
    joined = docs.join(right, on=on, how="left")
    out = joined
    for col_name, fallback in fallbacks.items():
        out = out.withColumn(col_name, F.coalesce(F.col(col_name), fallback))
    return out


def fallback_key_join(
    docs: DataFrame,
    lookup: DataFrame,
    key1: tuple[str, str],
    key2: tuple[str, str],
    payload_cols: list[str],
) -> DataFrame:
    """J5: join on key1; only the misses retry on key2; union tagged results.

    ref: pubmed_enrichment.py:394-420 (DOI esearch first, title esearch only
    on miss — the cheap exact key runs before the fuzzy one). Both stages
    are equi-joins; stage 2's input is only the stage-1 anti-join.
    """
    l1, r1 = key1
    l2, r2 = key2
    stage1 = docs.join(
        F.broadcast(lookup), docs[l1] == lookup[r1], "inner"
    ).select(*docs.columns, *payload_cols, F.lit("key1").alias("matched_by"))
    misses = docs.join(
        F.broadcast(lookup.select(r1).distinct()), docs[l1] == F.col(r1), "left_anti"
    )
    stage2 = misses.join(
        F.broadcast(lookup), misses[l2] == lookup[r2], "inner"
    ).select(*docs.columns, *payload_cols, F.lit("key2").alias("matched_by"))
    return stage1.unionByName(stage2)
