"""Per-entry isolation profiler (optimization guide §1): for each named
registry entry, separately time
  - build_s: Python-side DataFrame construction (SPARQL parse/compile,
    expression-tree building, any driver-side probes the entry performs),
  - noop_s: execution through the noop sink (computes every column of
    every row, no sink cost — guide §1.4), median of N,
  - count_s: execution via .count() (the bench's historical action, kept
    for comparability),
and write the .explain("formatted") output to plans/<tag>/<name>.txt.

Usage:
  python scripts/profile_entry.py [--reps 3] [--tag r13/before] entry ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from otit_swt_spark.session import get_spark  # noqa: E402


def profile(spark, sf_dir: str, name: str, reps: int, tag: str) -> dict:
    fn = entry_mod._QUERIES[name]
    spark.sparkContext.setJobDescription(f"profile:{name}:warmup")
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()

    builds, noops, counts = [], [], []
    for i in range(reps):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        t1 = time.perf_counter()
        spark.sparkContext.setJobDescription(f"profile:{name}:noop{i}")
        df.write.format("noop").mode("overwrite").save()
        t2 = time.perf_counter()
        builds.append(t1 - t0)
        noops.append(t2 - t1)
    for i in range(reps):
        df = fn(spark, sf_dir)
        spark.sparkContext.setJobDescription(f"profile:{name}:count{i}")
        t0 = time.perf_counter()
        df.count()
        counts.append(time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)

    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(plan_dir, exist_ok=True)
    plan = fn(spark, sf_dir)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    with open(os.path.join(plan_dir, f"{name}.txt"), "w") as fh:
        fh.write(plan)

    builds.sort(), noops.sort(), counts.sort()
    med = lambda xs: xs[len(xs) // 2]  # noqa: E731
    return {"name": name, "build_s": round(med(builds), 3),
            "noop_s": round(med(noops), 3),
            "count_s": round(med(counts), 3),
            "noop_spread": round(noops[-1] - noops[0], 3)}


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    tag = "profile"
    if "--reps" in args:
        i = args.index("--reps")
        reps = int(args[i + 1])
        del args[i:i + 2]
    if "--tag" in args:
        i = args.index("--tag")
        tag = args[i + 1]
        del args[i:i + 2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("profile", cpus=cpus)
    for name in args:
        r = profile(spark, sf_dir, name, reps, tag)
        print(f"{r['name']}: build={r['build_s']}s noop={r['noop_s']}s "
              f"count={r['count_s']}s spread={r['noop_spread']}s",
              flush=True)


if __name__ == "__main__":
    main()
