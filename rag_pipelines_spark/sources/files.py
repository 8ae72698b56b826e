"""Columnar / delimited file sources and sinks beyond JSONL.

The reference only ever touches Excel, JSON and JSONL
(fda_watcher.py:388,544-557; combine_json_to_jsonl.py:240-263); these
helpers declare the wider format surface a Spark-native engine gets for
free — CSV (delimited interchange), ORC (the second columnar format), and
hive-style *partitioned* parquet, the layout that makes 100 TB queries
cheap: a filter on the partition column prunes whole directories before
any I/O happens (PartitionFilters in the scan node, vs PushedFilters
which still opens footers).

Scale notes:
  * write paths are plain distributed `df.write` — one output file per
    task; no driver-side collect anywhere.
  * `partitionBy` keys must be low-cardinality (source, date, lang —
    bounded sets), never high-cardinality ids: each key creates a
    directory, and small-file explosion is the classic failure mode.
  * CSV is schema-on-read: always pass an explicit schema (inference
    costs a full extra pass over 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Options that make the CSV round-trip lossless for text columns that may
# embed quotes/newlines: RFC-4180 double-quote escaping on both sides.
_CSV_OPTS = {"header": "true", "escape": '"', "multiLine": "true"}


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").options(**_CSV_OPTS).csv(path)


def read_csv(spark: SparkSession, path: str, schema: str) -> DataFrame:
    return spark.read.options(**_CSV_OPTS).schema(schema).csv(path)


def write_orc(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)


def write_partitioned_parquet(df: DataFrame, path: str, *keys: str) -> None:
    """Hive-style layout: path/key1=v1/.../part-*.parquet."""
    df.write.mode("overwrite").partitionBy(*keys).parquet(path)


def read_partitioned_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Partition columns come back from directory names; equality/IN
    filters on them prune at planning time (no file listing I/O beyond
    the matching directories)."""
    return spark.read.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int,
    sort_col: str | None = None,
) -> None:
    """Catalog-backed parquet table hash-bucketed (and optionally sorted)
    on a join key.

    Bucketing is the layout that removes the join shuffle entirely: two
    tables bucketed on the same key with the same bucket count sort-merge
    join with ZERO Exchange nodes — each task reads bucket i of both
    sides. At 100 TB this turns every recurring fact⋈fact join on the
    bucketed key into a map-side merge; `partitionBy` can't do this (it
    needs low-cardinality keys), bucketing hashes high-cardinality keys
    into a fixed file count. Requires saveAsTable: bucket metadata lives
    in the catalog, not the files.
    """
    # A fresh session's in-memory catalog doesn't know about a table dir a
    # PREVIOUS session left in the warehouse, and saveAsTable then fails
    # with LOCATION_ALREADY_EXISTS — drop both the entry and the location.
    import os
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table_name}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    warehouse = warehouse.removeprefix("file:")
    shutil.rmtree(os.path.join(warehouse, table_name), ignore_errors=True)

    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
