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

import pandas as pd

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


def pack_sequences_bestfit(
    df: DataFrame,
    group_col: str | list[str],
    order_col: str,
    token_col: str,
    budget: int,
) -> DataFrame:
    """Best-fit-decreasing packing: per stream, place each document (largest
    first) into the fullest open sequence it still fits.

    This is NON-SPANNING packing — no document ever crosses a sequence
    boundary, the property you want when boundary truncation would lose
    data. That makes it a different contract from pack_sequences, whose
    head-to-tail prefix-sum layout lets documents span and is therefore
    bin-count-optimal but cuts documents at boundaries. Among
    non-spanning layouts, BFD is the classic low-waste heuristic
    (FFD/BFD <= 11/9*OPT + O(1)); a provable per-instance guarantee it
    DOES satisfy: no two finished sequences could be merged (any two
    fills sum > budget), hence bins < 2*OPT(non-spanning) — pinned by
    test.

    Inherently an imperative loop (each placement depends on all previous
    placements), i.e. not expressible as window/join algebra — exactly
    the applyInPandas case: Arrow-batched per-group Python, one shuffle
    on the stream key. Cost is O(n*B) list maintenance per group (B =
    open bins), so bound group size with a sharded stream key (see
    q_pack_bestfit) rather than packing a whole corpus-sized source in
    one task. Documents larger than the budget get a sequence of their
    own (they span downstream, like pack_sequences); null token counts
    pack as 0. Deterministic: placement order is (tokens DESC, order_col
    ASC) and ties in bin choice resolve by the deterministic bin-list
    order, so any partitioning yields the same layout.

    Returns the input columns + seq_id (bin index within the group) +
    seq_fill (total tokens in that bin). No SQL oracle exists for the
    driver check (rows-only); tests pin budget-respect, determinism
    under repartitioning, and the pairwise-unmergeable bound.
    """
    from pyspark.sql.types import LongType, StructField, StructType

    out_schema = StructType(
        list(df.schema)
        + [
            StructField("seq_id", LongType(), False),
            StructField("seq_fill", LongType(), False),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        import bisect

        pdf = pdf.sort_values(
            [token_col, order_col], ascending=[False, True]
        ).reset_index(drop=True)
        fills: list[int] = []  # kept ascending for bisect
        fill_ids: list[int] = []
        assigned = []
        next_id = 0
        for tok in pdf[token_col].fillna(0).astype("int64"):
            # fullest bin with fill <= budget - tok: rightmost position
            pos = bisect.bisect_right(fills, budget - tok) - 1
            if pos >= 0:
                fill = fills.pop(pos)
                bin_id = fill_ids.pop(pos)
            else:
                fill = 0
                bin_id = next_id
                next_id += 1
            new_fill = fill + int(tok)
            ins = bisect.bisect_left(fills, new_fill)
            fills.insert(ins, new_fill)
            fill_ids.insert(ins, bin_id)
            assigned.append(bin_id)
        pdf["seq_id"] = pd.Series(assigned, dtype="int64")
        final_fill = dict(zip(fill_ids, fills))
        pdf["seq_fill"] = pdf["seq_id"].map(final_fill).astype("int64")
        return pdf

    group_cols = [group_col] if isinstance(group_col, str) else list(group_col)
    return df.groupBy(*group_cols).applyInPandas(pack, schema=out_schema)
