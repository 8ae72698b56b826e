"""Custom stateful streaming operators (SURVEY §2.10c) via
applyInPandasWithState — the escape hatch for semantics the built-in
stateful operators (dropDuplicates, window, session_window) can't express.

`seen_keys_dedup` reimplements the reference's master-ID membership set
(fda_watcher.py:399) as *streaming state*: per group, a persistent set of
seen fingerprints; only first-seen rows are emitted. Unlike global
dropDuplicates, the state here is inspectable/extensible — e.g. add
per-key counts, TTLs, or emit-update semantics — which is the point of the
custom operator.

Scale: state is partitioned by the group key across executors and
checkpointed; per-group state stays bounded by that group's distinct keys.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _dedup_fn(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Emit only rows whose `rag_id` was never seen by this group's state."""
    seen: list[str] = list(state.get[0]) if state.exists else []
    seen_set = set(seen)
    for pdf in pdfs:
        fresh_mask = ~pdf["rag_id"].isin(seen_set)
        fresh = pdf[fresh_mask]
        # first occurrence wins inside the batch too
        fresh = fresh[~fresh["rag_id"].duplicated()]
        new_ids = [i for i in fresh["rag_id"] if i not in seen_set]
        seen_set.update(new_ids)
        seen.extend(new_ids)
        if len(fresh):
            yield fresh.assign(source_group=key[0])
    state.update((seen,))


def seen_keys_dedup(
    grouped_stream,
    output_schema: str = (
        "rag_id string, source string, payload string, source_group string"
    ),
):
    """Apply the stateful first-seen dedup to a grouped streaming DataFrame.

    Usage:
        stream.groupBy("source").applyInPandasWithState(...) — wrapped here:
        seen_keys_dedup(stream.groupBy("source"))
    """
    return grouped_stream.applyInPandasWithState(
        _dedup_fn,
        outputStructType=output_schema,
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
