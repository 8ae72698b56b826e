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
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)


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


def seen_keys_dedup_tws(
    grouped_stream,
    output_schema: str = (
        "rag_id string, source string, payload string, source_group string"
    ),
):
    """`seen_keys_dedup` on the Spark-4 arbitrary-state API
    (transformWithStateInPandas + StatefulProcessor): same first-seen
    semantics, pinned row-identical to the applyInPandasWithState path
    by test. The newer API is where composable state (multiple typed
    state variables, timers, TTL per variable) lives, so the engine
    exposes the operator on both — callers on Spark 4 checkpoints
    should prefer this form.

    Requires the RocksDB state store provider
    (spark.sql.streaming.stateStore.providerClass =
    ...state.RocksDBStateStoreProvider) — transformWithState is
    implemented only there; the HDFS-backed default provider rejects it.
    Also requires the `protobuf` package on driver and executors: the
    transform_with_state Python<->JVM state server speaks protobuf
    (pyspark's own [connect]/[pandas_on_spark] extras pull it in). The
    parity test skips with a clear reason where protobuf is absent.
    """
    return grouped_stream.transformWithStateInPandas(
        statefulProcessor=FirstSeenProcessor(),
        outputStructType=output_schema,
        outputMode="append",
        timeMode="none",
    )


class FirstSeenProcessor(StatefulProcessor):
    """First-seen dedup as a Spark-4 StatefulProcessor — the same logic
    as `_dedup_fn`, pinned equal to it (via a fake ValueState) in
    tests/test_stateful.py even where the protobuf state server that
    transformWithState needs at runtime is unavailable."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._seen = handle.getValueState("seen", "seen array<string>")

    def handleInputRows(self, key, rows, timerValues):
        got = self._seen.get()
        seen: list[str] = list(got[0]) if got is not None else []
        seen_set = set(seen)
        for pdf in rows:
            fresh = pdf[~pdf["rag_id"].isin(seen_set)]
            fresh = fresh[~fresh["rag_id"].duplicated()]
            new_ids = [i for i in fresh["rag_id"] if i not in seen_set]
            seen_set.update(new_ids)
            seen.extend(new_ids)
            if len(fresh):
                yield fresh.assign(source_group=key[0])
        self._seen.update((seen,))

    def close(self) -> None:
        pass
