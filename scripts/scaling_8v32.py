"""High-SF scaling record for the top production entries (r13 verdict
item 3): run the named entries at BOTH sf0.1 and an amplified ~Nx input
under the CURRENT process's core count ($SPARK_GRAFT_CPUS), recording
noop-sink wall seconds and shuffle-write bytes. Invoke once with
SPARK_GRAFT_CPUS=8 and once with 32; merge_scaling.py (or a hand-built
table) combines the two JSONs into docs/SCALING_r14.md.

Everything at sf0.1 sits at the AQE stage-latency floor (~0.3-0.7 s per
sequential stage on this box), so 8c vs 32c ratios there measure nothing;
the amplified run is where a shuffle-bound plan must show time ratios
tracking the core ratio — and where the r13 structural changes (session
SHJ flip, chain pre-filter, Arrow gram UDFs) are actually exercised.

windpower_multi_sync is not sf-dir driven: it is scaled by building the
engine with amplification x REFERENCE_POINTS points per series (the
store-resident tall frame grows linearly, like a longer retention
window), cached once outside the timed reps exactly like bench.py's
warm-store regime.

Usage: SPARK_GRAFT_CPUS=8 python scripts/scaling_8v32.py [amp] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry_mod  # noqa: E402
from bench import TIMED_OVERRIDES  # noqa: E402
from otit_swt_spark.metrics import (  # noqa: E402
    shuffle_write_delta,
    stage_shuffle_writes,
)
from otit_swt_spark.session import get_spark  # noqa: E402
from scaling_curve import BASE, build_amplified  # noqa: E402

ENTRIES = [
    "graph_kcore",
    "lsh_recall_eval",
    "corpus_from_html",
    "ann_multitable_topk",
    "windpower_multi_sync",
]

_ENGINES: dict[int, object] = {}


def _wind_engine(spark, points: int):
    eng = _ENGINES.get(points)
    if eng is None:
        from otit_swt_spark.windpower import build_engine

        eng = build_engine(spark, points=points)
        eng.ts_tables[0].load(spark).cache().count()
        _ENGINES[points] = eng
    return eng


def _windpower_multi_sync(points: int):
    def fn(spark, sf_dir):
        from otit_swt_spark.windpower import query_multi_sync

        return _wind_engine(spark, points).query(query_multi_sync())

    return fn


def _time(spark, fn, sf_dir, reps: int = 3) -> dict:
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()  # warm
    samples = []
    for _ in range(reps):
        # time BUILD + exec like bench.py: lazy localCheckpoints execute
        # their query stages at build (AQE toRdd), so timing only the
        # final noop under-counts every checkpoint-bearing entry
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        samples.append(time.perf_counter() - t0)
    samples.sort()
    pre = stage_shuffle_writes(spark)
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return {"sec": round(samples[len(samples) // 2], 3),
            "min": round(samples[0], 3), "max": round(samples[-1], 3),
            "shuffle_mb": round(shuffle_write_delta(spark, pre) / 1e6, 2)}


def main() -> None:
    amp = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    out_path = sys.argv[2] if len(sys.argv) > 2 else None
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    spark = get_spark("scaling_8v32", cpus=cpus)
    amp_dir = build_amplified(spark, amp)

    from otit_swt_spark.windpower import REFERENCE_POINTS

    qs = dict(entry_mod._QUERIES)
    qs.update(TIMED_OVERRIDES)  # lsh_recall_eval at the bench's 0.5 sample

    out: dict = {"cpus": cpus, "amplification": amp, "entries": {}}
    for name in ENTRIES:
        rec = {}
        for scale, sf_dir in (("base", BASE), (f"x{amp}", amp_dir)):
            spark.sparkContext.setJobDescription(f"scale:{name}:{scale}")
            if name == "windpower_multi_sync":
                pts = REFERENCE_POINTS * (1 if scale == "base" else amp)
                fn = _windpower_multi_sync(pts)
            else:
                fn = qs[name]
            rec[scale] = _time(spark, fn, sf_dir)
            print(f"# {name} {scale} ({cpus}c): {rec[scale]}",
                  file=sys.stderr, flush=True)
        spark.sparkContext.setJobDescription(None)
        out["entries"][name] = rec
    out["loadavg"] = os.getloadavg()
    print(json.dumps(out))
    if out_path:
        with open(out_path, "w") as fh:
            json.dump(out, fh, indent=1)


if __name__ == "__main__":
    main()
