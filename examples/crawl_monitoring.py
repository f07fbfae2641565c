"""Runnable example: crawl prep + live feed monitoring (round-9 surface).

Part 1 — crawl prep: wraps each synthetic document in a deterministic
HTML page (nav, body with outlinks, footer, script), then runs the raw
crawl chain: main-text extraction (boilerplate stripped by text
density) -> content-area outlink graph -> URL canonicalization ->
domain edge counts, and the html_col entry point of the full corpus
recipe.

Part 2 — feed monitoring: the three broadcast-light monitors a feature
pipeline runs next to its windowed aggregates: PSI drift vs a fixed
reference, bottom-k quantile sketch p50/p95/p99 (state <= k rows per
group forever), and the seasonal anomaly scorer ("is this spike real or
just Saturday") against a profile distilled from a batch decompose.

    python examples/crawl_monitoring.py [sf_dir]  # default /root/testdata/sf0.01
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from otit_swt_spark.pipelines.htmltext import html_extract, html_links  # noqa: E402
from otit_swt_spark.pipelines.urltools import (  # noqa: E402
    registered_domain,
    robots_filter,
)
from otit_swt_spark.pipelines.analytics import (  # noqa: E402
    quantile_estimate,
    quantile_sketch,
)
from otit_swt_spark.session import get_spark  # noqa: E402
from otit_swt_spark.streaming.ingest import stream_seasonal_score  # noqa: E402
from otit_swt_spark.timeseries import seasonal_profile  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("example_crawl_monitoring", cpus=8)

    # ---- Part 1: crawl prep -------------------------------------------
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    esc = F.regexp_replace(F.regexp_replace(F.regexp_replace(
        F.coalesce(F.col("text"), F.lit("")), "&", "&amp;"),
        "<", "&lt;"), ">", "&gt;")
    page = F.concat(
        F.lit('<html><head><title>Doc '), F.col("doc_id").cast("string"),
        F.lit('</title><script>t()</script></head><body>'
              '<nav><a href="/">Home</a></nav><h1>Doc '),
        F.col("doc_id").cast("string"),
        F.lit('</h1><p>'), esc,
        F.lit(' More at <a href="HTTP://WWW.News-'), F.col("lang"),
        F.lit('.ORG:80/item?utm_ref=x&k=1">the wire</a>.</p>'
              '<footer><a href="/terms">Terms</a></footer></body></html>'))
    pages = docs.select("doc_id", page.alias("html"))

    extracted = html_extract(pages)
    print("== extracted main text (boilerplate stripped) ==")
    extracted.select("doc_id", "title", "n_chars").show(5, truncate=False)

    links = html_links(pages)
    domains = (links
               .select(registered_domain(F.col("href")).alias("domain"))
               .where(F.col("domain") != "")
               .groupBy("domain").count().orderBy(F.desc("count")))
    print("== content-area outlink domains (nav/footer excluded) ==")
    domains.show(10, truncate=False)

    # crawl permissions: block the zh wire by robots before any fetch
    rules = spark.createDataFrame(
        [("news-zh.org", "disallow", "/")],
        "domain string, directive string, path_prefix string")
    outlinks = links.where(F.col("href") != "") \
        .withColumn("link_id", F.monotonically_increasing_id())
    allowed = robots_filter(outlinks, rules, url_col="href",
                            id_col="link_id")
    print("== outlinks allowed by robots (RFC 9309 longest match) ==")
    print(f"{links.count()} links -> {allowed.count()} fetchable")

    # ---- Part 2: feed monitoring --------------------------------------
    events = spark.read.parquet(f"{sf_dir}/events.parquet") \
        .withColumn("ts", F.col("ts").cast("timestamp"))

    sk = quantile_sketch(events, "value", "event_id", "event_type", k=256)
    print("== per-type value quantiles from the bottom-k sketch "
          "(state <= 256 rows/group forever) ==")
    quantile_estimate(sk, "event_type", probs=(0.5, 0.95, 0.99)) \
        .orderBy("event_type", "p").show(15)

    daily = (events.groupBy("user_id",
                            F.to_date("ts").alias("day"))
             .agg(F.sum("value").alias("v")))
    prof = seasonal_profile(daily, key="user_id", ts="day", value="v",
                            period=7)
    flags = stream_seasonal_score(daily, prof, key="user_id", ts="day",
                                  value="v", period=7, k=3.0)
    print("== seasonal anomalies (spike-vs-Saturday), same plan batch "
          "or stream ==")
    flags.orderBy(F.desc(F.abs(F.col("resid")))).show(5)

    spark.stop()


if __name__ == "__main__":
    main()
