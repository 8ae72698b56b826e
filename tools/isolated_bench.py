"""Isolated re-measure harness — the repo's bench noise protocol.

`bench.py` times every headline query once in one shared JVM, so a
sub-2 s entry carries +-0.5 s of GC/codegen/allocation-churn noise and a
round-over-round delta on such an entry is not evidence by itself
(SCALE.md "bench posture"). This tool is the arbiter: a FRESH session,
the same sf0.001 warm-up, then N runs of only the named queries, and the
min is the number a regression claim must reproduce on.

Usage:
    python tools/isolated_bench.py q_dup_clusters q_line_dedup [--runs 3]
Prints one JSON line: {"sf": ..., "runs": N, "min": {...}, "all": {...}}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM_DIR = "/root/testdata/sf0.001"


def main() -> None:
    args = [a for a in sys.argv[1:]]
    runs = 3
    if "--runs" in args:
        j = args.index("--runs")
        runs = int(args[j + 1])
        del args[j : j + 2]
    names = args
    if not names:
        raise SystemExit("usage: isolated_bench.py <query> [<query> ...] [--runs N]")

    from rag_pipelines_spark.registry import load_all
    from rag_pipelines_spark.session import get_spark

    registry = load_all()
    spark = get_spark("rag-pipelines-spark-isolated-bench")
    unknown = [n for n in names if n not in registry]
    if unknown:
        raise SystemExit(f"not registered: {unknown}")

    # identical warm-up discipline to bench.py: tiny-SF pass for JIT/codegen,
    # then a full noop read of the measured inputs (footers + page cache)
    for name in names:
        try:
            registry[name].fn(spark, WARM_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass
    from rag_pipelines_spark.io import TABLES, table

    for tname in TABLES:
        try:
            table(spark, SF_DIR, tname).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:
            pass

    all_runs: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(runs):
        for name in names:
            start = time.time()
            registry[name].fn(spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            all_runs[name].append(round(time.time() - start, 4))

    sf_tag = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "sf": sf_tag,
                "runs": runs,
                "min": {n: min(v) for n, v in all_runs.items()},
                "all": all_runs,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
