"""Per-phase profile of the sketch-serve queries at sf0.1 (guide §1).

Times each merge round and the final serve separately so the state-I/O
share (lease + parquet commit + fsync) is visible next to the compute
share. Noop-sink semantics for the serve frame.
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F

from rag_pipelines_spark.session import get_spark

spark = get_spark("profile-serve")

from rag_pipelines_spark.io import table as t
from rag_pipelines_spark.operators.cmsketch import cm_estimate, merge_cm
from rag_pipelines_spark.operators.freqsketch import freq_topk, merge_freq
from rag_pipelines_spark.queries.sources import _scratch


def phase(label, f):
    t0 = time.monotonic()
    out = f()
    print(f"{label}: {time.monotonic() - t0:.2f}s", flush=True)
    return out


for fam, merge, serve, kw in (
    (
        "countmin",
        merge_cm,
        lambda st: cm_estimate(
            spark,
            st,
            t(spark, SF, "documents")
            .select("lang")
            .distinct()
            .crossJoin(
                F.broadcast(
                    spark.createDataFrame(
                        [("spark",), ("join",), ("dup",), ("scan",),
                         ("window",), ("qqqzzz",)],
                        "item STRING",
                    )
                )
            ),
            keys=["lang"],
        ),
        dict(depth=4, width=1024),
    ),
    (
        "freq",
        merge_freq,
        lambda st: freq_topk(spark, st, keys=["lang"], k=10),
        dict(m=64),
    ),
):
    state = _scratch(f"profile-{fam}", SF)
    shutil.rmtree(state, ignore_errors=True)
    toks = phase(
        f"{fam} toks checkpoint",
        lambda: t(spark, SF, "documents")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "lang", F.explode(F.split("text", " ")).alias("term"))
        .localCheckpoint(eager=True),
    )
    for r in range(3):
        phase(
            f"{fam} merge {r}",
            lambda r=r: merge(
                spark,
                toks.filter(F.col("doc_id") % 3 == r),
                state,
                keys=["lang"],
                item_col="term",
                **kw,
            ),
        )
    phase(
        f"{fam} serve",
        lambda: serve(state)
        .write.format("noop")
        .mode("overwrite")
        .save(),
    )

spark.stop()
