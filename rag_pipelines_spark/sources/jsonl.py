"""JSONL source/sink (S5/S6/S9) + dead-letter split writer (S13).

JSON Lines is Spark's native JSON encoding: `df.write.json` emits one
compact object per line per partition file; `spark.read.json` with an
explicit schema skips inference (never infer in production — it's a full
extra pass). ref: fda…/combine_json_to_jsonl.py:240-263;
pdf…/combine_json_to_jsonl.py:143-150.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def write_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Distributed JSONL sink (one object per line, non-ASCII preserved —
    Spark writes UTF-8 unescaped, matching ensure_ascii=False)."""
    df.write.mode(mode).json(path)


def read_jsonl(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """JSONL scan with explicit schema; multiLine=False (true JSONL)."""
    return spark.read.schema(schema).json(path)


def read_json_batch(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    """Consolidated-JSON batch read (S6): a single JSON *array* document.

    Mirrors the reference's tolerant object-or-array load
    (fda…/combine_json_to_jsonl.py:26-58) via multiLine — Spark promotes a
    top-level array to rows and a single object to one row.
    """
    return spark.read.schema(schema).option("multiLine", True).json(path)


def deadletter_split(
    df: DataFrame, ok: Column, main_path: str, failed_path: str
) -> tuple[DataFrame, DataFrame]:
    """Split-write: rows passing `ok` to the main sink, the rest (tagged
    with a reason column upstream) to quarantine. Two filtered writes over
    one cached plan — the classic Spark replacement for the reference's
    move-to-failed-dir (ref: pubmed_enrichment.py:450-456).
    """
    tagged = df.withColumn("_ok", ok).cache()
    good = tagged.filter(F.col("_ok")).drop("_ok")
    bad = tagged.filter(~F.col("_ok")).drop("_ok")
    write_jsonl(good, main_path)
    write_jsonl(bad, failed_path)
    return good, bad


def write_per_record_json(df: DataFrame, path: str, key_col: str = "rag_id") -> None:
    """S7 parity: one directory per record key (the reference's one file per
    RAG_ID, json_split_and_clean.py:315-320). At 100 TB per-record files are
    an anti-pattern — partitionBy gives the same key-addressable layout with
    distributed writes; prefer plain JSONL + a key column for new designs.
    """
    df.write.mode("overwrite").partitionBy(key_col).json(path)


def read_jsonl_glob(
    spark: SparkSession,
    pattern: str,
    schema: StructType | str,
    with_provenance: bool = True,
) -> DataFrame:
    """S8: recursive glob scan with per-row file provenance.

    The reference globs sorted file lists (fda…/combine_json_to_jsonl.py:
    126-151); Spark's reader handles the glob and `input_file_name()`
    replaces the manual bookkeeping (deterministic content, not order —
    order is a sort key downstream, never an input property).
    """
    df = spark.read.schema(schema).json(pattern)
    if with_provenance:
        df = df.withColumn("source_file", F.input_file_name())
    return df
