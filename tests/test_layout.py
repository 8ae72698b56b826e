"""Z-order layout (operators/layout.py): Morton-key correctness and the
measured row-group-skipping claim — a z-ordered parquet layout must let a
2-D box predicate decode far fewer rows than the same data laid out
round-robin, using nothing but ordinary parquet min/max stats."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from rag_pipelines_spark.operators.layout import write_zordered, zorder_key
from tests.conftest import SF_DIR


def test_morton_interleave_known_values(spark):
    # bits=2, values already spanning [0,3]: scaling is identity, so the
    # key is the textbook interleave — x bits at even, y bits at odd slots
    df = spark.createDataFrame(
        [(3, 1), (0, 0), (3, 3), (1, 2)], "x INT, y INT"
    )
    got = {
        (r.x, r.y): r.zkey
        for r in zorder_key(df, ["x", "y"], bits=2).collect()
    }
    assert got[(0, 0)] == 0
    assert got[(3, 1)] == 0b0111  # x->bits 0,2 ; y->bits 1,3
    assert got[(3, 3)] == 0b1111
    assert got[(1, 2)] == 0b1001


def test_zorder_key_is_partition_invariant(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").select(
        "event_id", "user_id"
    )
    a = zorder_key(ev.repartition(1), ["user_id", "event_id"]).collect()
    b = zorder_key(ev.repartition(13), ["user_id", "event_id"]).collect()
    assert {(r.event_id, r.zkey) for r in a} == {(r.event_id, r.zkey) for r in b}


def _scan_rows_decoded(spark, path, pred):
    df = spark.read.parquet(path).filter(pred)
    # execute THROUGH the df so the metric belongs to this QueryExecution
    # (a write/count would plan its own) — box results are small
    df.collect()
    scan = df._jdf.queryExecution().executedPlan().collectLeaves().head()
    return scan.metrics().apply("numOutputRows").value()


def test_zordered_box_predicate_skips_row_groups(spark, tmp_path):
    """The measured claim: same rows, same predicate, same file count —
    the z-ordered layout decodes a small fraction of what the round-robin
    layout decodes, because every output file's min/max stats are tight
    on BOTH dimensions."""
    ev = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id", "ts")
        .withColumn(
            "tsec",
            F.timestamp_diff(
                "SECOND",
                F.lit("1970-01-01 00:00:00").cast("timestamp_ntz"),
                F.col("ts"),
            ),
        )
        .drop("ts")
    )
    total = ev.count()
    lo_u, hi_u, lo_t, hi_t = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("tsec"), F.max("tsec")
    ).first()
    # a ~10% x ~10% box placed INSIDE the [0.25, 0.5) quadrant of both
    # dims: its 2-bit z-prefix is then fixed, so the box maps to one
    # compact z-interval. (A box centered on 0.5 straddles the top-level
    # quadrant corner — Morton's worst case — and touches ~4x the files;
    # that is inherent to any space-filling curve, not a layout bug.)
    u0 = lo_u + (hi_u - lo_u) * 30 // 100
    u1 = lo_u + (hi_u - lo_u) * 40 // 100
    t0 = lo_t + (hi_t - lo_t) * 30 // 100
    t1 = lo_t + (hi_t - lo_t) * 40 // 100
    pred = (
        (F.col("user_id") >= u0)
        & (F.col("user_id") <= u1)
        & (F.col("tsec") >= t0)
        & (F.col("tsec") <= t1)
    )

    base = str(tmp_path / f"layout-{uuid.uuid4().hex[:6]}")
    zpath, rpath = f"{base}/z", f"{base}/rr"
    write_zordered(ev, zpath, ["user_id", "tsec"], n_files=16)
    ev.repartition(16).write.mode("overwrite").parquet(rpath)

    z_rows = _scan_rows_decoded(spark, zpath, pred)
    rr_rows = _scan_rows_decoded(spark, rpath, pred)

    # round-robin files all span the full 2-D range -> nothing skips
    assert rr_rows == total
    # z-ordered: the box touches only the files covering its z-interval
    assert z_rows < total * 0.35, (z_rows, total)
    # and both layouts return identical results
    assert (
        spark.read.parquet(zpath).filter(pred).count()
        == spark.read.parquet(rpath).filter(pred).count()
    )


def test_zorder_key_negative_dimensions(spark):
    """Negative coordinates rescale to [0, 2^bits) and interleave without
    sign leakage (col - min is non-negative by construction)."""
    df = spark.createDataFrame(
        [(-10, -10), (-10, 10), (10, -10), (10, 10), (0, 0)], "x INT, y INT"
    )
    rows = {(r.x, r.y): r.zkey for r in zorder_key(df, ["x", "y"], bits=4).collect()}
    assert rows[(-10, -10)] == 0  # both mins -> bin 0 -> zkey 0
    assert all(0 <= v < (1 << 8) for v in rows.values())
    # corner (max,max) maps to the all-ones key
    assert rows[(10, 10)] == (1 << 8) - 1


def test_zorder_fractional_column_stays_in_range_and_ordered(spark):
    """Review finding: separate long-casts of col and min let double
    columns exceed 2^bits-1 and invert order. Raw-double scaling must
    keep every dimension in [0, 2^bits) with order preserved."""
    df = spark.createDataFrame(
        [(1, 0.9, 0.0), (2, 1.9, 0.0), (3, 2.0, 0.0)], "id INT, p DOUBLE, q DOUBLE"
    )
    rows = {r.id: r.zkey for r in zorder_key(df, ["p", "q"], bits=16).collect()}
    assert all(0 <= v < (1 << 32) for v in rows.values())
    assert rows[1] < rows[2] < rows[3]  # q constant -> zkey ordered by p


def test_zorder_subunit_span_does_not_collapse(spark):
    """A fractional span under 1.0 must still spread the dimension
    (the old integer span truncated to 0 -> whole dimension ignored)."""
    df = spark.createDataFrame(
        [(1, 0.1, 0), (2, 0.5, 0), (3, 0.9, 0)], "id INT, p DOUBLE, q INT"
    )
    rows = {r.id: r.zkey for r in zorder_key(df, ["p", "q"], bits=8).collect()}
    assert len(set(rows.values())) == 3


def test_zorder_refuses_over_63_bits(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2, 3, 4, 5)], "a INT, b INT, c INT, d INT, e INT")
    with _pytest.raises(ValueError, match="exceeds 63"):
        zorder_key(df, ["a", "b", "c", "d", "e"], bits=16).collect()


def _exact_boundaries(values, n_buckets):
    """Equal-population bucket boundaries computed exactly and
    deterministically in Python (sorted-list indexing, no estimation)."""
    s = sorted(values)
    n = len(s)
    return [float(s[min(n - 1, (i * n) // n_buckets)])
            for i in range(1, n_buckets)]


def test_quantile_zorder_survives_planted_outlier(spark, tmp_path):
    """r4 verdict item #8: min/max rescaling is outlier-fragile — one
    extreme value collapses a dimension's effective bits (every normal
    value lands in bucket ~0, skipping on that dimension dies).
    Equal-population quantile buckets keep full resolution.

    Determinism (r5 verdict item #1): the old flake had two sources —
    approxQuantile boundary wander AND repartitionByRange's sampling,
    which seeds on the RDD id (different across sessions) and lands
    file cuts slightly off the z-cell corners, so files straddled two
    cells and decode fractions moved run to run (0.17-0.27 observed).
    quantile-mode writes now assign files by a deterministic
    hash-bijection on the cell id (operators/layout.py), which pins the
    ideal geometry exactly: box = 1 cell of 16 (measured 2,541/40,001 =
    6.35%, identical across ≥5 runs), x-only = 4 cells (10,008/40,001 =
    25.02%). The tight bound runs on EXACT caller-supplied boundaries;
    the approxQuantile path gets a margin for its estimation envelope
    (one cell-edge shift doubles the touched cells)."""
    import random

    rng = random.Random(7)
    n = 40_000
    rows = [(i, rng.randrange(0, 1000), rng.randrange(0, 1000))
            for i in range(n)]
    rows.append((n, 10**9, 500))  # the planted outlier in x
    df = spark.createDataFrame(rows, "id LONG, x LONG, y LONG").repartition(8)
    total = n + 1
    n_buckets = 1 << 8
    bounds = {
        "x": _exact_boundaries([r[1] for r in rows], n_buckets),
        "y": _exact_boundaries([r[2] for r in rows], n_buckets),
    }

    # ~10% x ~10% box inside the [0.25,0.5) quadrant of the REAL data
    pred = (
        (F.col("x") >= 300) & (F.col("x") <= 400)
        & (F.col("y") >= 300) & (F.col("y") <= 400)
    )
    # the skewed dimension ALONE: this is where min/max provably dies —
    # every real x lands in bucket ~0, so every file's x min/max stats
    # span the predicate range and nothing can prune (the box predicate
    # above still prunes on the healthy y dimension either way)
    pred_x = (F.col("x") >= 300) & (F.col("x") <= 400)

    base = str(tmp_path / f"skew-{uuid.uuid4().hex[:6]}")
    mpath, qpath = f"{base}/minmax", f"{base}/quantile"
    apath = f"{base}/approxq"
    write_zordered(df, mpath, ["x", "y"], n_files=16, bits=8)
    write_zordered(df, qpath, ["x", "y"], n_files=16, bits=8,
                   normalize="quantile", boundaries=bounds)
    write_zordered(df, apath, ["x", "y"], n_files=16, bits=8,
                   normalize="quantile")

    # same answers from all three layouts, both predicates
    for p in (pred, pred_x):
        counts = {
            spark.read.parquet(path).filter(p).count()
            for path in (mpath, qpath, apath)
        }
        assert len(counts) == 1, counts
    # exact boundaries (deterministic): the box maps to ONE z-cell of 16
    # (measured 6.35%, run-to-run identical); 0.10 keeps margin
    q_rows = _scan_rows_decoded(spark, qpath, pred)
    assert q_rows < total * 0.10, (q_rows, total)
    # approxQuantile path: margin for boundary estimation (a cell-edge
    # shift past a box corner doubles the touched cells: 2/16 + slack)
    a_rows = _scan_rows_decoded(spark, apath, pred)
    assert a_rows < total * 0.35, (a_rows, total)
    # x-only: minmax decodes essentially everything (collapsed buckets =>
    # useless per-file x stats); quantile touches the 4 cells of the
    # matching x-quad (measured 25.02%)
    m_rows_x = _scan_rows_decoded(spark, mpath, pred_x)
    q_rows_x = _scan_rows_decoded(spark, qpath, pred_x)
    assert m_rows_x > total * 0.9, (m_rows_x, total)
    assert q_rows_x < total * 0.35, (q_rows_x, total)


def test_murmur3_hash_long_matches_spark(spark):
    """The deterministic file-assignment remap replicates Spark's
    hashLong driver-side — drift in either implementation would silently
    mis-route cells, so pin them against each other on longs spanning
    sign/width edges."""
    from rag_pipelines_spark.operators.layout import (
        _bijective_fid_remap, murmur3_hash_long,
    )

    vals = [0, 1, 7, 16, 1023, -1, -2**35, 2**40, 123456789012345, -2**62]
    got = {
        r.v: r.h
        for r in spark.createDataFrame([(v,) for v in vals], "v LONG")
        .select("v", F.hash("v").alias("h"))
        .collect()
    }
    assert all(got[v] == murmur3_hash_long(v) for v in vals), got
    # and the remap really is a bijection for typical file counts
    for n in (2, 16, 17, 200):
        remap = _bijective_fid_remap(n)
        assert sorted(murmur3_hash_long(v) % n for v in remap) == list(range(n))


def test_quantile_boundaries_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], "x INT, y INT")
    with _pytest.raises(ValueError, match="missing columns"):
        zorder_key(df, ["x", "y"], bits=4, normalize="quantile",
                   boundaries={"x": [0.5]})
    with _pytest.raises(ValueError, match="only to normalize"):
        zorder_key(df, ["x", "y"], bits=4, boundaries={"x": [0.5], "y": [0.5]})


def test_quantile_zorder_caps_bits(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(1, 2)], "x INT, y INT")
    with _pytest.raises(ValueError, match="ceiling of 12"):
        zorder_key(df, ["x", "y"], bits=16, normalize="quantile")
    with _pytest.raises(ValueError, match="unknown normalize"):
        zorder_key(df, ["x", "y"], bits=8, normalize="rankish")
