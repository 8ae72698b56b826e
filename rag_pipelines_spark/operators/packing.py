"""Sequence packing — laying documents head-to-tail into fixed token-budget
training sequences (the "packing" step an LLM data pipeline runs after
cleaning/dedup, so short documents don't waste context-window slots).

Deterministic, shuffle-minimal formulation: within each stream (= group
column, e.g. source or shard), documents are concatenated in a stable
order and each document is assigned to the sequence its FIRST token lands
in: seq_id = (running_token_start) div budget. That is one window over
(group, order) — a single shuffle on the group key — and pure integer
arithmetic, so any engine agrees exactly. Oversized documents (> budget
tokens) simply span sequences, like they do in real packers that split on
sequence boundaries downstream.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    group_col: str,
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Append seq_start (token offset in the group's stream) and seq_id
    (= seq_start div budget). `order_col` must be unique per group for the
    layout to be well-defined."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum: Column = F.sum(token_col).over(w)
    start = (cum - F.col(token_col)).cast("long")
    return df.withColumn("seq_start", start).withColumn(
        "seq_id", F.expr(f"seq_start div {int(budget)}")
    )
