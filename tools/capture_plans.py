"""Capture .explain("formatted") for named queries into plans/r<N>/.

Usage:
    python tools/capture_plans.py before q_pca_project q_pagerank ...
    python tools/capture_plans.py after  q_pca_project ...

Writes plans/r<N>/<query>_<tag>.txt (the optimization-round evidence the
judge checks plan claims against; N from $SPARK_GRAFT_PLANS_ROUND,
default 11). Explain-only: plans are built at the bench SF but never
executed, so this is cheap and contention-free.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
_ROUND = os.environ.get("SPARK_GRAFT_PLANS_ROUND", "11")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    f"r{_ROUND}",
)


def main() -> int:
    tag = sys.argv[1]
    names = sys.argv[2:]
    if tag not in ("before", "after") or not names:
        raise SystemExit("usage: capture_plans.py before|after <query> ...")
    os.makedirs(OUT_DIR, exist_ok=True)

    from rag_pipelines_spark.registry import load_all
    from rag_pipelines_spark.session import get_spark

    reg = load_all()
    spark = get_spark("capture-plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    rc = 0
    for name in names:
        q = reg.get(name)
        if q is None:
            print(f"ERR {name}: not registered", file=sys.stderr)
            rc = 1
            continue
        try:
            df = q.fn(spark, SF_DIR)
            plan = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            print(f"ERR {name}: {exc}", file=sys.stderr)
            rc = 1
            continue
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(f"# {name} @ {SF_DIR} ({tag})\n")
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
