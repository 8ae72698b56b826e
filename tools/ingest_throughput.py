"""Continuous-ingest throughput rung (r5 verdict item #7): per-family
merge wall vs batch size, with growing history — the measured form of
the claim that merge cost tracks the BATCH, not the accumulated state.

Protocol: for each batch size B, a fresh state root ingests 3
consecutive disjoint batches of B documents from the sf10 fixture
through every state family (seen-keys front door, near-dup manifest
state, BM25 corpus stats, keyed rollup, MG freq sketch, HLL sketch),
timing each family's merge per batch. If merges scaled with history,
batch 3 (2B docs of state behind it) would be slower than batch 1;
if they track the batch, walls are flat across batches and grow ~
linearly in B.

Families are timed through their BATCH-side merge APIs — the same
functions continuous_ingest_pipeline calls inside foreachBatch — so the
numbers isolate merge cost from Structured Streaming trigger overhead
(which BENCH/SCALE already account elsewhere).

Usage:
    python tools/ingest_throughput.py [sf_dir] [batch_sizes_csv]
    # defaults: _testdata/sf10, 12500,50000,150000

Prints one JSON line per (batch_size, batch_idx) with per-family
seconds; paste the summary table into SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

N_BATCHES = 3


def run(spark, sf_dir: str, batch_sizes: list[int]) -> list[dict]:
    from rag_pipelines_spark.operators.dedup import incremental_neardup
    from rag_pipelines_spark.operators.freqsketch import merge_freq
    from rag_pipelines_spark.operators.hllsketch import merge_hll
    from rag_pipelines_spark.operators.retrieval import merge_corpus_stats
    from rag_pipelines_spark.operators.rollup import merge_rollup
    from rag_pipelines_spark.streaming.incremental import incremental_merge

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    results = []
    for bsize in batch_sizes:
        root = tempfile.mkdtemp(prefix=f"ingest-tp-{bsize}-")
        for bi in range(N_BATCHES):
            lo, hi = bi * bsize, (bi + 1) * bsize
            batch = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).localCheckpoint(eager=True)  # exclude the source scan from
            # every family's timing
            rec = {"batch_size": bsize, "batch_idx": bi}
            t0 = time.time()
            delta = incremental_merge(
                spark, batch, os.path.join(root, "seen"), key="doc_id"
            )
            rec["seen_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            clean = incremental_neardup(
                spark, delta, os.path.join(root, "neardup"),
                "doc_id", "text", epoch=bi,
            ).localCheckpoint(eager=True)
            rec["neardup_s"] = round(time.time() - t0, 2)
            rec["accepted"] = clean.count()
            t0 = time.time()
            merge_corpus_stats(
                spark, clean, os.path.join(root, "stats"),
                text_col="text", epoch=bi,
            )
            rec["stats_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            merge_rollup(
                spark, clean, os.path.join(root, "rollup"), keys=["lang"],
                measures={"n_chars": ["count", "sum"]}, epoch=bi,
            )
            rec["rollup_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            toks = clean.select(
                "lang", F.explode(F.split(F.col("text"), " ")).alias("term")
            )
            merge_freq(
                spark, toks, os.path.join(root, "freq"),
                keys=["lang"], item_col="term", m=100, epoch=bi,
            )
            rec["freq_s"] = round(time.time() - t0, 2)
            t0 = time.time()
            merge_hll(
                spark, clean, os.path.join(root, "hll"),
                keys=["lang"], item_col="doc_id", epoch=bi,
            )
            rec["hll_s"] = round(time.time() - t0, 2)
            rec["total_s"] = round(
                sum(v for k, v in rec.items() if k.endswith("_s")), 2
            )
            results.append(rec)
            print(json.dumps(rec))
        shutil.rmtree(root, ignore_errors=True)
    return results


def main() -> None:
    from rag_pipelines_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "_testdata/sf10"
    sizes = (
        [int(x) for x in sys.argv[2].split(",")]
        if len(sys.argv) > 2
        else [12_500, 50_000, 150_000]
    )
    spark = get_spark("ingest-throughput")
    run(spark, sf_dir, sizes)
    spark.stop()


if __name__ == "__main__":
    main()
