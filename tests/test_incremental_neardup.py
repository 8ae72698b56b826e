"""Incremental near-dedup: a batch is filtered against signature STATE
(never the old corpus text), survivors extend the state, and the filter is
stable across restarts — the continuous-ingest form of minhash dedup."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def spark():
    from rag_pipelines_spark.session import get_spark

    return get_spark("incr-neardup-tests", shuffle_partitions=4)


BASE = (
    "the quick brown fox jumps over the lazy dog near the riverbank today "
    "while birds sing in the morning light across the quiet green valley"
)


def _doc(i, text):
    return (i, text)


def test_incremental_neardup_across_batches(spark, tmp_path):
    from rag_pipelines_spark.operators.dedup import incremental_neardup

    state = str(tmp_path / "sig_state")
    schema = "doc_id long, text string"

    batch1 = spark.createDataFrame(
        [
            _doc(1, BASE),
            _doc(2, BASE + " with a tiny mutated tail"),  # near-dup of 1
            _doc(3, "completely different content about spark dataframes "
                    "and catalyst optimizer rules for distributed joins "
                    "at terabyte scale with adaptive execution enabled"),
        ],
        schema,
    )
    clean1 = incremental_neardup(spark, batch1, state, "doc_id", "text")
    ids1 = sorted(r.doc_id for r in clean1.collect())
    # 2 collides with 1 in-batch (smaller id wins); 3 survives
    assert ids1 == [1, 3], ids1

    batch2 = spark.createDataFrame(
        [
            _doc(10, BASE + " appended replica marker"),  # near-dup of state doc 1
            _doc(11, "entirely novel text describing minhash banding and "
                     "locality sensitive hashing for approximate joins "
                     "over massive shingled document collections"),
        ],
        schema,
    )
    clean2 = incremental_neardup(spark, batch2, state, "doc_id", "text")
    ids2 = sorted(r.doc_id for r in clean2.collect())
    assert ids2 == [11], ids2

    # replay of an already-accepted doc under a NEW id is caught by state
    batch3 = spark.createDataFrame([_doc(20, BASE)], schema)
    clean3 = incremental_neardup(spark, batch3, state, "doc_id", "text")
    assert clean3.count() == 0


def test_compaction_preserves_dedup_state(spark, tmp_path):
    """N appends then compaction: file count drops to the requested bound,
    the (id, band, bkey) row set is bit-identical, and every subsequent
    dedup verdict (replay caught / novel passes) is unchanged."""
    import glob

    from rag_pipelines_spark.operators.dedup import (
        compact_neardup_state,
        incremental_neardup,
        neardup_state_dir,
    )

    state = str(tmp_path / "sig_state")
    schema = "doc_id long, text string"

    def text(i):  # per-doc fully disjoint token set -> no near-dup pairs
        return " ".join(f"token{i}word{k}" for k in range(20))

    for b in range(3):  # 3 batches -> 3 appended file-sets
        batch = spark.createDataFrame(
            [(b * 10 + j, text(b * 10 + j)) for j in range(3)], schema
        )
        accepted = incremental_neardup(spark, batch, state, "doc_id", "text")
        assert accepted.count() == 3  # all novel -> all accepted

    live_before = neardup_state_dir(state)
    before = {
        (r.doc_id, r.band, r.bkey)
        for r in spark.read.parquet(live_before).collect()
    }
    files_before = len(glob.glob(f"{live_before}/part-*.parquet"))
    assert files_before >= 3  # one file-set per batch accreted

    n_rows = compact_neardup_state(spark, state, num_partitions=2)
    assert n_rows == len(before)

    live_after = neardup_state_dir(state)
    assert live_after != live_before  # pointer flipped to a new version
    after = {
        (r.doc_id, r.band, r.bkey)
        for r in spark.read.parquet(live_after).collect()
    }
    assert after == before
    files_after = len(glob.glob(f"{live_after}/part-*.parquet"))
    assert files_after <= 2 < files_before
    # superseded version GC'd: exactly one v-* dir remains
    import os

    versions = [n for n in os.listdir(state) if n.startswith("v-")]
    assert versions == [os.path.basename(live_after)]

    # verdicts survive compaction: replay of accepted content is caught,
    # novel content passes
    replay = spark.createDataFrame(
        [(100, text(0))], schema  # doc 0's exact text
    )
    assert incremental_neardup(spark, replay, state, "doc_id", "text").count() == 0
    fresh = spark.createDataFrame(
        [(101, "altogether new subject matter regarding range joins asof "
               "semantics interval trees and temporal alignment windows")],
        schema,
    )
    assert incremental_neardup(spark, fresh, state, "doc_id", "text").count() == 1


def test_compaction_crash_before_pointer_flip(spark, tmp_path):
    """Simulate a compactor dying AFTER the new version dir is fully
    written but BEFORE the MANIFEST flip: every dedup verdict must come
    from the old (still-pointered) state, and the next compaction must GC
    the orphaned dir."""
    import os

    from rag_pipelines_spark.operators.dedup import (
        compact_neardup_state,
        incremental_neardup,
        neardup_state_dir,
    )

    state = str(tmp_path / "sig_state")
    schema = "doc_id long, text string"

    def text(i):
        return " ".join(f"token{i}word{k}" for k in range(20))

    batch = spark.createDataFrame([(j, text(j)) for j in range(4)], schema)
    assert incremental_neardup(spark, batch, state, "doc_id", "text").count() == 4

    live = neardup_state_dir(state)
    # "crashed compaction": full compacted copy exists, pointer never moved
    orphan = os.path.join(state, "v-crashed0")
    spark.read.parquet(live).repartition(1, "bkey").write.parquet(orphan)
    assert neardup_state_dir(state) == live  # resolver ignores the orphan

    # verdicts preserved: replay caught, novel passes
    replay = spark.createDataFrame([(100, text(0))], schema)
    assert incremental_neardup(spark, replay, state, "doc_id", "text").count() == 0
    fresh = spark.createDataFrame(
        [(101, "wholly new material on watermark semantics and state stores")],
        schema,
    )
    assert incremental_neardup(spark, fresh, state, "doc_id", "text").count() == 1

    # next compaction sweeps the orphan and keeps exactly the live version
    compact_neardup_state(spark, state, num_partitions=2)
    versions = [n for n in os.listdir(state) if n.startswith("v-")]
    assert "v-crashed0" not in versions and len(versions) == 1
    # and the post-crash-recovery state still carries every verdict
    assert incremental_neardup(spark, replay, state, "doc_id", "text").count() == 0


def test_unresolvable_state_fails_loudly(spark, tmp_path):
    """A state root holding committed data that the pointer can't resolve
    must raise — never silently read as empty (which would re-admit all
    previously-seen content)."""
    import os

    import pytest as _pytest

    from rag_pipelines_spark.operators.dedup import (
        incremental_neardup,
        neardup_state_dir,
    )

    state = str(tmp_path / "sig_state")
    schema = "doc_id long, text string"
    batch = spark.createDataFrame(
        [(1, " ".join(f"tok{k}" for k in range(20)))], schema
    )
    incremental_neardup(spark, batch, state, "doc_id", "text")

    manifest = os.path.join(state, "MANIFEST")
    live = neardup_state_dir(state)

    # (a) deleted manifest, data-bearing version dir present -> raise
    with open(manifest) as f:
        saved = f.read()
    os.remove(manifest)
    with _pytest.raises(RuntimeError, match="no MANIFEST"):
        neardup_state_dir(state)
    with _pytest.raises(RuntimeError):
        incremental_neardup(spark, batch, state, "doc_id", "text")

    # (b) manifest pointing at a missing dir -> raise
    with open(manifest, "w") as f:
        f.write("v-gone\n")
    with _pytest.raises(RuntimeError, match="does not exist"):
        neardup_state_dir(state)

    # restore -> resolves again
    with open(manifest, "w") as f:
        f.write(saved)
    assert neardup_state_dir(state) == live

    # (c) fresh-but-crashed first init (data-less v-dir, no manifest) is
    # provably empty -> None, no raise
    state2 = str(tmp_path / "sig_state2")
    os.makedirs(os.path.join(state2, "v-empty00"))
    assert neardup_state_dir(state2) is None
