"""Runnable example: product analytics + time-series smoothing over the
synthetic events table — funnels with a conversion window, retention
cohorts, session path mining, a Welch A/B readout, daily actives, and a
per-user EWMA.

    python examples/event_analytics.py [sf_dir]   # default /root/testdata/sf0.01
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from otit_swt_spark.pipelines.analytics import (  # noqa: E402
    ab_test_stats,
    distinct_daily,
    funnel_steps,
    retention_cohorts,
    session_paths,
)
from otit_swt_spark.session import get_spark  # noqa: E402
from otit_swt_spark.timeseries import ewma  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example_analytics", cpus=8)
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")

    fun = funnel_steps(ev, ["view", "click", "purchase"],
                       max_lag_seconds=7 * 24 * 3600)
    print("== funnel (view -> click -> purchase, 7-day window)")
    fun.agg(F.count("t1").alias("step1"), F.count("t2").alias("step2"),
            F.count("t3").alias("step3")).show()

    print("== retention triangle (first 5 offsets)")
    (retention_cohorts(ev).filter(F.col("day_offset") <= 4)
     .orderBy("cohort_day", "day_offset").show(10))

    print("== top 5 session paths (30-min sessions, first 8 steps)")
    (session_paths(ev, order_cols=["event_id"], max_len=8)
     .orderBy(F.col("n_sessions").desc()).show(5, truncate=False))

    print("== Welch A/B: view vs click values")
    ab_test_stats(ev, "event_type", "value", "view", "click").show()

    print("== daily actives by type (3 days)")
    (distinct_daily(ev).orderBy("day", "event_type").show(15))

    print("== per-user EWMA (alpha=0.2), one user's tail")
    sm = ewma(ev.select("user_id", "ts", "event_id", "value"),
              key="user_id", ts="ts", alpha=0.2, order_cols=["event_id"])
    sm.filter(F.col("user_id") == 1).orderBy(F.col("ts").desc()).show(5)


if __name__ == "__main__":
    main()
