"""Overlap independent eager materializations (optimization guide §2.6).

Spark's scheduler happily runs several jobs at once inside one
application; eager `localCheckpoint` calls are only sequential because
driver code invokes them sequentially. When a query path materializes
two or more frames with NO dependency between them (e.g. the two
Count-Min partials of q_cm_join_size, or PageRank's node and edge
checkpoints), submitting those jobs from a small thread pool lets the
second job's tasks back-fill executors freed by the first job's tail —
pure wall-clock overlap, no plan or result change (each frame's rows
are exactly what the sequential call produced).

A plain thread pool is sufficient here (the guide notes
InheritableThread only matters for JVM thread-local properties like job
descriptions, which these short materialization jobs don't set).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import DataFrame

__all__ = ["checkpoint_all"]


def checkpoint_all(*dfs: DataFrame) -> tuple[DataFrame, ...]:
    """localCheckpoint(eager=True) every frame, overlapped.

    Returns the checkpointed frames in input order. With a single frame
    this degenerates to the plain sequential call (no pool spun up).
    Exceptions from any job propagate to the caller unchanged.
    """
    if len(dfs) == 1:
        return (dfs[0].localCheckpoint(eager=True),)
    with ThreadPoolExecutor(max_workers=min(4, len(dfs))) as pool:
        return tuple(pool.map(lambda d: d.localCheckpoint(eager=True), dfs))
