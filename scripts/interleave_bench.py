"""Interleaved A/B re-measurement for the bench production tier.

The r11 verdict graded graph_kcore and lsh_recall_eval WEAK: their r11
walls were >2x the r10 band while their plans and shuffle bytes were
byte-identical, and the per-entry spreads were as large as the means —
the signature of a load-contaminated session, not a regression. This
harness settles the question the way the verdict asked: the candidate
entries run INTERLEAVED in one session (A,B,A,B,...), so any host
contention hits both alike and the medians are comparable, with a
calibration probe before, between, and after the reps so the reader can
normalize against machine speed.

Usage:
    python scripts/interleave_bench.py [entry ...]   # default: the two
        r11-weak entries, graph_kcore + lsh_recall_eval
Env:  SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
      SPARK_GRAFT_CPUS, SPARK_GRAFT_REPS (default 7).

Prints one JSON object: per-entry {median, mean, min, max, spread,
samples} plus calib_sec probes and loadavg, and writes the same dict to
docs/INTERLEAVE_<n1>_<n2>.json for the round record.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import TIMED_OVERRIDES, _calibrate  # noqa: E402
from otit_swt_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:] or ["graph_kcore", "lsh_recall_eval"]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    reps = int(os.environ.get("SPARK_GRAFT_REPS", "7"))
    spark = get_spark("interleave_bench", cpus=cpus)

    qs = dict(entry_mod._QUERIES)
    qs.update(TIMED_OVERRIDES)
    fns = {n: qs[n] for n in names}

    calib = {"start": _calibrate(spark)}
    # one untimed warmup each (JIT/codegen/Python-worker startup)
    for n, fn in fns.items():
        fn(spark, sf_dir).count()

    samples: dict[str, list[float]] = {n: [] for n in names}
    for rep in range(reps):
        for n, fn in fns.items():
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            samples[n].append(round(time.perf_counter() - t0, 3))
        if rep == reps // 2:
            calib["mid"] = _calibrate(spark)
        print(f"# rep {rep + 1}/{reps}: "
              + ", ".join(f"{n}={samples[n][-1]}s" for n in names),
              file=sys.stderr)
    calib["end"] = _calibrate(spark)

    def stats(xs: list[float]) -> dict:
        ss = sorted(xs)
        return {"median": ss[len(ss) // 2],
                "mean": round(sum(ss) / len(ss), 3),
                "min": ss[0], "max": ss[-1],
                "spread": round(ss[-1] - ss[0], 3),
                "samples": xs}

    try:
        load1 = round(os.getloadavg()[0], 2)
    except OSError:
        load1 = None
    out = {"entries": {n: stats(samples[n]) for n in names},
           "calib_sec": calib, "loadavg_end": load1,
           "sf_dir": sf_dir, "cpus": cpus, "reps": reps,
           "interleaved": True}
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "docs",
        f"INTERLEAVE_{'_'.join(names[:2])}.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
