"""T1 — scheduled trigger (the reference's daily 09:00 loop).

ref: fda_rag_extraction/scripts/scheduler.py:19,102-123 — a resident
python process sleeping 60 s between schedule checks, then launching the
watcher as a subprocess. Spark-native equivalents, in preference order:

1. **Cron + availableNow** (what `run_available_now` wraps): an external
   scheduler (cron/Airflow) starts the job; `trigger(availableNow=True)`
   processes everything new since the last checkpoint and exits. This is
   the reference's semantics — a daily incremental batch — with state in
   the checkpoint instead of a master Excel.
2. **Resident processing-time trigger** (`run_resident`): one long-lived
   streaming query with `trigger(processingTime=...)`; Spark owns the
   sleep-wake loop the reference hand-rolled.

Both paths resume from the checkpoint after a crash (T5) — the reference's
output-exists skip generalized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def run_available_now(
    df: DataFrame, sink_path: str, checkpoint: str, fmt: str = "parquet"
) -> StreamingQuery:
    """One scheduled incremental run: process all new input, then stop."""
    return (
        df.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def run_resident(
    df: DataFrame,
    sink_path: str,
    checkpoint: str,
    interval: str = "60 seconds",
    fmt: str = "parquet",
) -> StreamingQuery:
    """Resident query polling on `interval` (the reference's 60 s loop)."""
    return (
        df.writeStream.format(fmt)
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(processingTime=interval)
        .start()
    )
