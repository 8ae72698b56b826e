"""S14 — log/metrics sink via df.observe (SURVEY §2.1).

The reference accumulates counter dicts while looping rows
(fda_watcher.py:433-437,504-541). Spark-native: `df.observe` attaches
aggregate metrics to a plan — they're computed DURING the action that
consumes the DataFrame (no extra pass, unlike a separate .agg().collect())
and delivered to a QueryExecutionListener / StreamingQueryListener.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F


def observed_scrape_metrics(
    df: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, Observation]:
    """Attach the watcher's success/failure counters to a plan.

    Returns (df, observation). After ANY action on df, `observation.get`
    yields {'n_total', 'n_ok', 'n_failed', 'success_rate_pct'} — computed
    in the same pass as the action.
    """
    obs = Observation("scrape_metrics")
    ok = (F.length(F.col(text_col)) > 0).cast("int")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_total"),
        F.sum(ok).alias("n_ok"),
        F.sum(1 - ok).alias("n_failed"),
        (F.sum(ok) * 100.0 / F.count(F.lit(1))).alias("success_rate_pct"),
    )
    return observed, obs
