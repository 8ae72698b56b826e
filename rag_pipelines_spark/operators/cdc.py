"""Change-data-capture operators: snapshot diff and file compaction.

The reference's whole incremental story is "which scraped rows are new vs
the master table" (fda_watcher.py:397-416) — a one-sided anti-join (J1).
`snapshot_diff` generalizes it to the full CDC triple (added / removed /
updated) between any two snapshots of a keyed table, which is what a
scheduled 100 TB ingest actually needs: re-crawls *change* and *delete*
rows, not just add them.

Scale notes:
  * one full-outer sort-merge join on the key — a single shuffle, AQE
    handles skewed keys; payload comparison is an md5 over concatenated
    columns computed map-side, so the shuffle carries (key, hash), never
    the payload itself when `project_hash_early=True`.
  * `compact` addresses the other CDC by-product: incremental writes
    leave many small files; periodic compaction rewrites a table into
    size-targeted partitions (small-file reads are the top cause of slow
    100 TB scans — file-open overhead and lost column-chunk locality).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def payload_hash(df: DataFrame, cols: list[str]) -> F.Column:
    """Order-stable md5 over the payload columns (null-safe sentinel)."""
    parts = [F.coalesce(F.col(c).cast("string"), F.lit("<null>")) for c in cols]
    return F.md5(F.concat_ws("\x1f", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    payload_cols: list[str],
) -> DataFrame:
    """Rows added / removed / updated between two snapshots of a keyed table.

    Returns (key, change) with change in {'added','removed','updated'};
    unchanged rows are dropped. Both sides are reduced to (key, hash)
    *before* the join, so the full-outer shuffle moves two narrow columns
    regardless of payload width.
    """
    o = old.select(F.col(key), payload_hash(old, payload_cols).alias("_oh"))
    n = new.select(F.col(key), payload_hash(new, payload_cols).alias("_nh"))
    joined = o.join(n, on=key, how="full_outer")
    change = (
        F.when(F.col("_oh").isNull(), F.lit("added"))
        .when(F.col("_nh").isNull(), F.lit("removed"))
        .when(F.col("_oh") != F.col("_nh"), F.lit("updated"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(key, "change")
    )


def compact(df: DataFrame, path: str, target_rows_per_file: int) -> int:
    """Rewrite `df` at `path` with size-targeted files; returns file count.

    Uses a count to derive the partition count (one extra cheap job —
    column-pruned to nothing by parquet metadata at read time), then a
    round-robin repartition so files come out uniform. At cluster scale
    the same knob is `spark.sql.files.maxRecordsPerFile`, which avoids
    the pre-count; we do both: repartition for uniformity, maxRecordsPerFile
    as the hard cap.
    """
    n = df.count()
    n_files = max(1, -(-n // target_rows_per_file))
    (
        df.repartition(n_files)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
        .parquet(path)
    )
    import glob
    import os

    return len(glob.glob(os.path.join(path, "part-*.parquet")))
