"""Stream-stream joins (T-series extension — declared in SURVEY.md §2.9).

The reference's enrichment joins are batch lookups (pubmed_enrichment.py
join shapes); their streaming analog — continuously correlating two live
feeds — is a Structured Streaming stream-stream join. Spark buffers both
sides in state keyed by the join key; the REQUIRED watermark + time-bound
condition let the engine evict state once no future match is possible, so
state stays O(key-rate × interval) instead of growing with the stream.

At 100 TB/day both inputs shuffle-partition on the join key (one exchange
per side, co-partitioned by definition); the interval predicate is
evaluated within partitions. Skewed keys split via AQE does NOT apply to
streaming state — pick the key (or salt it) so per-key event rates are
bounded, as with any stateful operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inner-join two streams on `key` where the right event lands within
    [left_ts, left_ts + max_delay].

    Both sides get the watermark (both are mandatory for state eviction in
    a stream-stream inner join: each side's buffer is cleared once its
    events age past watermark + interval). Works identically on batch
    DataFrames (the watermark is a no-op there), which is how the
    differential test pins the join semantics.
    """
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    cond = (
        (lw[key] == rw[key])
        & (rw[right_ts] >= lw[left_ts])
        & (rw[right_ts] <= lw[left_ts] + F.expr(f"INTERVAL {max_delay}"))
    )
    # Output names must be unique even when the two inputs share column
    # names (the common case: both timestamps called "ts", both carrying
    # "source"): any right-side name that collides with an already-emitted
    # one gets an r_ prefix, so downstream selects and sinks never hit
    # AMBIGUOUS_REFERENCE / duplicate-column write errors.
    cols = [lw[key].alias(key)]
    taken = {key}

    def emit(side, name):
        out = name
        while out in taken:
            out = f"r_{out}"
        taken.add(out)
        cols.append(side[name].alias(out))

    emit(lw, left_ts)
    for c in left.columns:
        if c not in (key, left_ts):
            emit(lw, c)
    emit(rw, right_ts)
    for c in right.columns:
        if c not in (key, right_ts):
            emit(rw, c)
    return lw.join(rw, cond, "inner").select(*cols)
