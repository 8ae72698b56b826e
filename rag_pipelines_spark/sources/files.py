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
