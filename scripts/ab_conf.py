"""Interleaved A/B of a runtime SQL conf on named registry entries.

The r13 verdict flagged graph_kcore as elevated in all three r13 runs and
named the session-wide ``spark.sql.join.preferSortMergeJoin=false`` flip
as the prime suspect (it changed kcore's peel joins even though kcore's
code was untouched). This harness settles attribution the way the
interleave_bench does: A (conf=false, HEAD behavior) and B (conf=true,
the r12 default) alternate WITHIN one session, so host contention hits
both alike; a calibration probe runs before/between/after. Plans under
both settings are written to plans/<tag>/.

Usage:
    python scripts/ab_conf.py [--conf spark.sql.join.preferSortMergeJoin]
        [--a false --b true] [--reps 5] [--tag r14/ab_kcore] entry ...
Env:  SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import _calibrate  # noqa: E402
from otit_swt_spark.session import get_spark  # noqa: E402


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _plan(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--conf", default="spark.sql.join.preferSortMergeJoin")
    ap.add_argument("--a", default="false")
    ap.add_argument("--b", default="true")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tag", default="r14/ab")
    ap.add_argument("entries", nargs="+")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_conf")
    plan_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", args.tag)
    os.makedirs(plan_dir, exist_ok=True)

    out: dict = {"conf": args.conf, "a": args.a, "b": args.b,
                 "sf_dir": sf_dir, "reps": args.reps,
                 "calib": [_calibrate(spark)], "entries": {}}
    for name in args.entries:
        fn = entry_mod._QUERIES[name]
        samples: dict[str, list[float]] = {args.a: [], args.b: []}
        # warm both settings once (JIT/IO warmup hits neither arm)
        for setting in (args.a, args.b):
            spark.conf.set(args.conf, setting)
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        for setting in (args.a, args.b):
            spark.conf.set(args.conf, setting)
            with open(os.path.join(
                    plan_dir, f"{name}_{args.conf.split('.')[-1]}"
                    f"={setting}.txt"), "w") as fh:
                fh.write(_plan(fn(spark, sf_dir)))
        for i in range(args.reps):
            for setting in (args.a, args.b):
                spark.conf.set(args.conf, setting)
                df = fn(spark, sf_dir)
                spark.sparkContext.setJobDescription(
                    f"ab:{name}:{setting}:{i}")
                t0 = time.perf_counter()
                _noop(df)
                samples[setting].append(time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
        out["calib"].append(_calibrate(spark))
        med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
        out["entries"][name] = {
            s: {"median": round(med(v), 3), "min": round(min(v), 3),
                "max": round(max(v), 3),
                "samples": [round(x, 3) for x in v]}
            for s, v in samples.items()}
        print(name, json.dumps(out["entries"][name]))
    out["loadavg"] = os.getloadavg()
    print(json.dumps(out))
    with open(os.path.join(plan_dir, "ab_result.json"), "w") as fh:
        json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
