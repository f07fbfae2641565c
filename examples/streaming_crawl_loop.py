"""Runnable example: the CLOSED streaming crawl loop.

    discovery stream -> stream_frontier_unseen (Bloom ledger probe)
        -> stream_frontier_schedule (stateful per-domain politeness)
        -> [fetcher fleet]
        -> stream_bloom_seen (incrementally-maintained seen-set ledger)

Two availableNow passes simulate two crawl rounds: round 1 discovers
and fetches a first wave (its URLs enter the Bloom ledger); round 2's
discovery stream re-surfaces every URL plus new ones, and the probe
drops everything already in the ledger with NO false negatives (a
Bloom false positive only suppresses a fetch — the safe direction).
The scheduler assigns fetch_at slots min_delay apart per domain, with
the last slot carried across micro-batches in state, so politeness
holds across trigger boundaries.

    python examples/streaming_crawl_loop.py   # uses a temp dir
"""

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import pandas as pd  # noqa: E402

from otit_swt_spark.session import get_spark  # noqa: E402
from otit_swt_spark.streaming.crawl import (  # noqa: E402
    stream_frontier_schedule,
    stream_frontier_unseen,
)
from otit_swt_spark.streaming.ingest import stream_bloom_seen  # noqa: E402


def main() -> None:
    spark = get_spark("streaming_crawl_loop", cpus=8)
    work = tempfile.mkdtemp(prefix="crawl_loop_")
    ledger = f"{work}/ledger"
    try:
        t0 = pd.Timestamp("2026-01-01 00:00:00")
        wave1 = pd.DataFrame({
            "url": [f"http://site-a.com/p/{i}" for i in range(40)]
            + [f"http://site-b.com/p/{i}" for i in range(10)],
            "domain": ["site-a.com"] * 40 + ["site-b.com"] * 10,
            "priority": [(i * 7) % 100 / 100.0 for i in range(50)],
            "discovered_at": [t0] * 50,
        })

        # ROUND 1 — schedule wave 1 (empty ledger: everything is unseen)
        d1 = f"{work}/disc1"
        spark.createDataFrame(wave1).write.parquet(d1)
        sched = stream_frontier_schedule(
            spark.readStream.schema(
                "url string, domain string, priority double, "
                "discovered_at timestamp").parquet(d1),
            per_domain_cap=5, min_delay_s=2.0)
        q = (sched.writeStream.format("parquet")
             .option("path", f"{work}/batch1")
             .option("checkpointLocation", f"{work}/ck_sched1")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        fetched = spark.read.parquet(f"{work}/batch1")
        print(f"round 1 scheduled: {fetched.count()} fetches "
              f"(cap 5/domain)")
        fetched.orderBy("domain", "fetch_at").show(12, truncate=False)

        # fetched URLs enter the Bloom seen-set ledger (streaming sink)
        f1 = f"{work}/fetched1"
        fetched.select("url").write.parquet(f1)
        q = stream_bloom_seen(
            spark.readStream.schema("url string").parquet(f1),
            "url", ledger, f"{work}/ck_ledger", n_bits=4096, k=5)
        q.awaitTermination(120)
        print(f"ledger bits set: {spark.read.parquet(ledger).count()}")

        # ROUND 2 — wave 2 re-discovers EVERYTHING + 20 new URLs
        wave2 = pd.concat([wave1, pd.DataFrame({
            "url": [f"http://site-a.com/new/{i}" for i in range(20)],
            "domain": ["site-a.com"] * 20,
            "priority": [0.99] * 20,
            "discovered_at": [t0 + pd.Timedelta(minutes=5)] * 20,
        })], ignore_index=True)
        d2 = f"{work}/disc2"
        spark.createDataFrame(wave2).write.parquet(d2)
        unseen = stream_frontier_unseen(
            spark.readStream.schema(
                "url string, domain string, priority double, "
                "discovered_at timestamp").parquet(d2),
            spark.read.parquet(ledger), "url", n_bits=4096, k=5)
        q = (stream_frontier_schedule(unseen, per_domain_cap=5,
                                      min_delay_s=2.0)
             .writeStream.format("parquet")
             .option("path", f"{work}/batch2")
             .option("checkpointLocation", f"{work}/ck_sched2")
             .trigger(availableNow=True).start())
        q.awaitTermination(120)
        b2 = spark.read.parquet(f"{work}/batch2")
        fetched_urls = {r["url"] for r in fetched.select("url").collect()}
        refetches = b2.where(b2.url.isin(list(fetched_urls))).count()
        print(f"round 2 scheduled: {b2.count()} fetches; "
              f"re-fetches of round-1 URLs: {refetches} (must be 0)")
        b2.orderBy("domain", "fetch_at").show(12, truncate=False)
        assert refetches == 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
