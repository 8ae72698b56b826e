"""Semantic invariants for the warehouse-lifecycle queries (warehouse.py)
beyond the oracle differential: SCD2 timeline algebra, cohort-matrix
accounting identities, schema-evolution null-fill placement.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from rag_pipelines_spark.io import table
from rag_pipelines_spark.queries.warehouse import (
    q_cohort_retention,
    q_scd2_versions,
    q_schema_evolution,
)
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def scd2(spark):
    return q_scd2_versions(spark, SF_DIR).cache()


def test_scd2_exactly_one_current_per_user(spark, scd2):
    n_users = table(spark, SF_DIR, "events").select("user_id").distinct().count()
    current = scd2.filter(F.col("is_current") == 1)
    assert current.count() == n_users
    assert current.select("user_id").distinct().count() == n_users


def test_scd2_timeline_contiguous_and_alternating(spark, scd2):
    # within a user, each version's valid_to == next version's valid_from
    # (no gaps, no overlaps) and consecutive versions change the attribute
    w = Window.partitionBy("user_id").orderBy("valid_from")
    checked = scd2.select(
        "user_id",
        "attr",
        "valid_from",
        "valid_to",
        F.lead("valid_from").over(w).alias("next_from"),
        F.lead("attr").over(w).alias("next_attr"),
    ).filter(F.col("next_from").isNotNull())
    gaps = checked.filter(F.col("valid_to") != F.col("next_from")).count()
    non_changes = checked.filter(F.col("attr") == F.col("next_attr")).count()
    assert gaps == 0
    assert non_changes == 0


def test_scd2_current_matches_last_event(spark, scd2):
    # replaying the versions to "now" reproduces each user's latest event
    e = table(spark, SF_DIR, "events")
    last = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("user_id").orderBy(
                    F.desc("ts"), F.desc("event_id")
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .select("user_id", F.col("event_type").alias("last_attr"))
    )
    cur = scd2.filter(F.col("is_current") == 1).select("user_id", "attr")
    mismatches = cur.join(last, "user_id").filter(
        F.col("attr") != F.col("last_attr")
    )
    assert mismatches.count() == 0


def test_cohort_offset_zero_covers_every_user(spark):
    # every user is active in their own cohort week, so the offset-0 cells
    # sum to the distinct-user count, and no offset is negative
    res = q_cohort_retention(spark, SF_DIR).cache()
    n_users = table(spark, SF_DIR, "events").select("user_id").distinct().count()
    offset0 = (
        res.filter(F.col("week_offset") == 0)
        .agg(F.sum("n_users").alias("s"))
        .collect()[0]["s"]
    )
    assert offset0 == n_users
    assert res.filter(F.col("week_offset") < 0).count() == 0
    # retention can only shrink or hold per cohort: cell <= cohort size
    size = res.filter(F.col("week_offset") == 0).select(
        "cohort", F.col("n_users").alias("cohort_size")
    )
    over = (
        res.join(size, "cohort")
        .filter(F.col("n_users") > F.col("cohort_size"))
        .count()
    )
    assert over == 0
    res.unpersist()


def _rows(df):
    return sorted(
        tuple(str(v) for v in r)
        for r in df.select(
            "user_id", "attr", "valid_from", "valid_to", "is_current"
        ).collect()
    )


def test_scd2_merge_equals_full_rebuild(spark):
    # split the stream at the median ts: merging the tail batch into the
    # head's dimension must reproduce the full rebuild exactly
    from rag_pipelines_spark.operators.cdc import scd2_from_events, scd2_merge

    e = table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    # cut on ts (not event_id — generation order, not time order) so the
    # batch is strictly later than every open row, the merge contract
    cut_ts = (
        e.orderBy("ts", "event_id")
        .limit(e.count() // 2)
        .agg(F.max("ts").alias("m"))
        .collect()[0]["m"]
    )
    head = e.filter(F.col("ts") <= cut_ts)
    tail = e.filter(F.col("ts") > cut_ts)
    assert head.count() > 0 and tail.count() > 0
    merged = scd2_merge(scd2_from_events(head), tail)
    full = scd2_from_events(e)
    assert _rows(merged) == _rows(full)


def test_scd2_merge_empty_batch_is_noop(spark):
    from rag_pipelines_spark.operators.cdc import scd2_from_events, scd2_merge

    e = table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    dim = scd2_from_events(e)
    merged = scd2_merge(dim, e.filter(F.lit(False)))
    assert _rows(merged) == _rows(dim)


def test_scd2_merge_late_batch_raises(spark):
    """An event older than its key's open interval belongs inside an
    already-closed row — merging it would produce silently wrong
    intervals, so scd2_merge must raise (r4 verdict item #2), naming
    the offending keys. An at-the-boundary event (ts == open
    valid_from) remains legal: the seed's -1 tiebreak wins the tie."""
    import pytest as _pytest

    from rag_pipelines_spark.operators.cdc import scd2_from_events, scd2_merge

    events = spark.createDataFrame(
        [
            (1, "a", 10, 100),
            (1, "b", 20, 101),  # closes [10,20), opens b@20
            (2, "x", 15, 102),
        ],
        "user_id INT, event_type STRING, ts INT, event_id INT",
    )
    dim = scd2_from_events(events)

    late = spark.createDataFrame(
        [(1, "c", 12, 200)],  # ts 12 < user 1's open valid_from 20
        "user_id INT, event_type STRING, ts INT, event_id INT",
    )
    with _pytest.raises(ValueError, match="late events"):
        scd2_merge(dim, late)
    # validate=False is the documented escape hatch (provably-ordered feed)
    scd2_merge(dim, late, validate=False).count()  # no raise

    boundary = spark.createDataFrame(
        [(1, "c", 20, 200)],  # exactly at the open valid_from: legal
        "user_id INT, event_type STRING, ts INT, event_id INT",
    )
    merged = scd2_merge(dim, boundary)
    cur = {
        r.user_id: r.attr
        for r in merged.filter(F.col("is_current") == 1).collect()
    }
    assert cur[1] == "c" and cur[2] == "x"


def test_schema_evolution_nulls_only_in_v1_rows(spark):
    res = q_schema_evolution(spark, SF_DIR).cache()
    assert res.filter(
        (F.col("doc_id") % 2 == 0) & F.col("n_tokens_est").isNotNull()
    ).count() == 0
    assert res.filter(
        (F.col("doc_id") % 2 == 1) & F.col("n_tokens_est").isNull()
    ).count() == 0
    # unified relation loses no rows
    assert res.count() == table(spark, SF_DIR, "documents").count()
    res.unpersist()
