"""Streaming twin of the batch crawl-prep chain: raw fetched pages ->
main-text extraction -> URL canonicalization -> RFC 9309 robots
permission filter, as ONE stateless streaming stage.

The batch chain (``pipelines.htmltext.html_extract`` ->
``pipelines.urltools.canonicalize_urls`` -> ``pipelines.urltools.
robots_filter``) is already map-side except robots resolution, which
uses a bounded per-URL aggregate — legal in batch, but a streaming
aggregate demands update/complete output mode and a state store for
what is logically a per-row decision. This module restructures that
one stage: the dimension-sized rules frame is pre-grouped into ONE
ARRAY OF RULES PER DOMAIN on the batch side, broadcast-joined to the
stream, and longest-match resolution becomes a per-row ``aggregate``
fold over the matched prefixes. Zero stateful operators, append-mode
legal, and the identical plan runs on a batch frame — the parity test
replays both and compares row sets against the BATCH operators.

At 100 TB of crawl this is also the better shape outright: the stream
side never shuffles (extraction rides the scan, canonicalization is
codegen'd column work, robots is a broadcast hash join + array fold),
so a 1000-executor crawl ingests at scan speed with per-domain rule
arrays bounded by robots-file size (RFC 9309 parsers cap bodies at
500 KiB, so the broadcast stays dimension-sized by construction).

Reference parity: the reference engine has no crawl stage; this is
part of the additive LLM-data-pipeline surface (SURVEY §2 additions),
the streaming twin demanded by the round-9 review brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from otit_swt_spark.pipelines.urltools import (
    canonical_url,
    registered_domain,
)


def robots_rules_by_domain(rules: DataFrame) -> DataFrame:
    """Collapse a ``(domain, directive, path_prefix)`` rules frame into
    one row per domain carrying an array of ``(l, a, p)`` structs
    (prefix length, allow flag, prefix) — the broadcastable form the
    streaming chain folds over. Empty DISALLOW prefixes are dropped
    here exactly like :func:`pipelines.urltools.robots_filter` drops
    them (RFC 9309: a bare ``Disallow:`` means allow-all, so an empty
    prefix must never match)."""
    r = (rules.select(
        F.col("domain"),
        F.when(F.lower(F.col("directive")) == "allow", F.lit(1))
        .otherwise(F.lit(0)).alias("__a"),
        F.coalesce(F.col("path_prefix"), F.lit("")).alias("__p"))
        .where((F.col("__a") == 1) | (F.col("__p") != "")))
    return (r.groupBy("domain")
            .agg(F.collect_list(
                F.struct(F.length("__p").alias("l"),
                         F.col("__a").alias("a"),
                         F.col("__p").alias("p"))).alias("rules")))


def stream_crawl_chain(pages: DataFrame, rules: DataFrame,
                       html_col: str = "html", url_col: str = "url",
                       id_col: str = "doc_id",
                       min_block_chars: int = 25,
                       max_link_density: float = 0.5,
                       keep_cols: tuple[str, ...] = ()) -> DataFrame:
    """``(id, url, html)`` fetched pages -> allowed, extracted,
    canonicalized rows ``(id, url, title, text, n_chars,
    canonical_url, domain, matched_prefix)``.

    Semantics are the batch chain's, stage for stage:

    - extraction: :func:`pipelines.htmltext.html_extract` (the same
      ``mapInPandas`` pass, with the URL riding through);
    - canonicalization: :func:`pipelines.urltools.canonical_url` /
      ``registered_domain`` on the raw fetch URL;
    - robots: RFC 9309 longest-match over the domain's rules, matched
      against PATH PLUS QUERY of the raw URL (fragment excluded),
      length ties resolve to allow, residual ties to the bytewise-max
      prefix (mirroring ``robots_filter``'s struct-max), no matching
      rule (or no rules for the domain) means allowed,
      ``matched_prefix`` NULL in that case.

    ``rules`` may be the raw ``(domain, directive, path_prefix)`` frame
    (grouped here via :func:`robots_rules_by_domain`) — it must be a
    BATCH frame; only ``pages`` may stream. ``keep_cols`` rider columns
    (e.g. the ingest timestamp a downstream watermarked dedup needs)
    pass through the whole chain untouched.
    """
    from otit_swt_spark.pipelines.htmltext import html_extract

    grouped = (rules if "rules" in rules.columns
               else robots_rules_by_domain(rules))

    riders = tuple(c for c in keep_cols if c not in (id_col, url_col))
    produced = {"title", "text", "n_chars", "canonical_url", "domain",
                "matched_prefix"}
    clash = sorted(produced & set(riders))
    if clash:
        # a colliding rider would be silently overwritten by the derived
        # column (or make the plan ambiguous) — fail loudly instead
        raise ValueError(
            f"keep_cols collide with chain output columns: {clash}")
    ext = html_extract(pages, html_col=html_col, id_col=id_col,
                       min_block_chars=min_block_chars,
                       max_link_density=max_link_density,
                       keep_cols=(url_col, *riders))

    u = F.trim(F.col(url_col))
    path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    # same RFC 9309 empty-path rule as robots_filter: a query-only URL
    # captures "?q=1" and must still match "/"-anchored rules
    path = (F.when(path == "", F.lit("/"))
            .when(~path.startswith("/"), F.concat(F.lit("/"), path))
            .otherwise(path))
    staged = (ext
              .withColumn("canonical_url", canonical_url(F.col(url_col)))
              .withColumn("domain", registered_domain(F.col(url_col)))
              .withColumn("__path", path))

    joined = staged.join(F.broadcast(grouped), "domain", "left")

    # fold for the longest-match rule: max by (prefix length, allow,
    # prefix) — identical ordering to robots_filter's struct max. The
    # init sentinel (l = -1) loses to every real rule before the NULL
    # prefix can reach a comparison.
    matched = F.filter(
        F.coalesce(F.col("rules"),
                   F.array().cast("array<struct<l:int,a:int,p:string>>")),
        lambda r: F.col("__path").startswith(r["p"]))
    init = F.struct(F.lit(-1).cast("int").alias("l"),
                    F.lit(1).cast("int").alias("a"),
                    F.lit(None).cast("string").alias("p"))
    best = F.aggregate(
        matched, init,
        lambda acc, r: F.when(
            (r["l"] > acc["l"])
            | ((r["l"] == acc["l"])
               & ((r["a"] > acc["a"])
                  | ((r["a"] == acc["a"]) & (r["p"] > acc["p"])))),
            r).otherwise(acc))
    resolved = joined.withColumn("__best", best)
    allowed = (F.col("__best.l") < 0) | (F.col("__best.a") == 1)
    return (resolved.where(allowed)
            .select(id_col, url_col, "title", "text", "n_chars",
                    "canonical_url", "domain",
                    F.col("__best.p").alias("matched_prefix"), *riders))


def stream_frontier_unseen(urls: DataFrame, bloom: DataFrame,
                           key_col: str = "url", n_bits: int = 4096,
                           k: int = 5) -> DataFrame:
    """Stream-static Bloom seen-set probe: keep only URLs whose key is
    DEFINITELY unseen in the crawled-URL ledger — the streaming
    counterpart of the batch ``frontier_unseen_batch`` stage, closing
    the crawl loop around the incrementally-maintained ledger
    (``streaming.ingest.stream_bloom_seen``).

    ``bloom`` is the stored bit frame (``spark.read.parquet(ledger)``).
    It is packed to ONE broadcast row on the static side
    (``analytics.bloom_word_map``) and membership becomes a per-row
    k-bit test (``analytics.bloom_unseen_flags``) — no aggregate, no
    state store, append-mode legal; the identical plan runs on a batch
    frame, which is what the parity test replays. Bloom has no false
    negatives, so no seen URL ever re-enters the frontier; a false
    positive only suppresses a fetch (re-discoverable later), the safe
    direction for a crawler.

    The static side is planned at query start: a long-running
    continuous probe re-reads the ledger per micro-batch's plan
    resolution, but for a strict read-your-own-writes loop run the
    sink and the probe as alternating availableNow passes (the batch
    cadence a polite crawler already operates on)."""
    from otit_swt_spark.pipelines.analytics import (bloom_unseen_flags,
                                                    bloom_word_map)

    flags = bloom_unseen_flags(urls, bloom_word_map(bloom, n_bits),
                               key_col, n_bits, k)
    return flags.where(~F.col("maybe_present")).drop("maybe_present")


_SCHED_OUT = "url string, domain string, priority double, fetch_at timestamp"


def stream_frontier_schedule(urls: DataFrame,
                             per_domain_cap: int = 5,
                             min_delay_s: float = 5.0,
                             event_time: str = "discovered_at",
                             watermark: str = "1 hour",
                             delay_col: str | None = None) -> DataFrame:
    """Stateful polite fetch scheduling — the streaming twin of
    ``pipelines.urltools.frontier_next_batch``, completing the
    streaming crawl loop (discovery -> ``stream_frontier_unseen`` ->
    THIS -> fetch -> ``stream_bloom_seen`` ledger). Per micro-batch and
    domain: the top ``per_domain_cap`` URLs by ``(priority DESC, url)``
    are emitted with assigned ``fetch_at`` slots spaced
    ``min_delay_s`` apart, and the domain's LAST ASSIGNED SLOT carries
    across batches in one state row per domain — so politeness holds
    ACROSS trigger boundaries, which a stateless per-batch window
    cannot guarantee (two adjacent micro-batches would both schedule at
    their local epoch).

    Deterministic and replay-safe: slots derive from event time (the
    batch's max ``event_time`` per domain) and carried state, never the
    wall clock — the frontier_next_batch discipline. Batch input runs
    the identical kernel per domain via ``applyInPandas`` from empty
    state (the session_gaps delegation pattern). State is one float per
    domain, evicted by the same keyed-state machinery as the other
    stateful ops; per-trigger load is bounded by
    ``per_domain_cap x #domains``.

    ``delay_col`` (optional): a per-row domain delay in seconds (e.g.
    robots.txt ``Crawl-delay`` attached via
    ``pipelines.urltools.robots_crawl_delays``); the group's max
    non-null value governs its slot spacing, NULL falls back to
    ``min_delay_s`` — the per-domain politeness a real crawler honors."""
    import pandas as pd

    from pyspark.sql import types as T

    state_schema = T.StructType([T.StructField("last", T.DoubleType())])

    def pick(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["priority", "url"],
                              ascending=[False, True],
                              kind="mergesort").head(per_domain_cap)
        return pdf

    def group_delay(pdf: pd.DataFrame) -> float:
        if delay_col is None or delay_col not in pdf.columns:
            return min_delay_s
        d = pdf[delay_col].dropna()
        return float(d.max()) if len(d) else min_delay_s

    def slots(pdf: pd.DataFrame, last: float | None):
        delay = group_delay(pdf)
        base = pdf[event_time].max().timestamp()
        start = base if last is None else max(last + delay, base)
        fetch = [start + k * delay for k in range(len(pdf))]
        return fetch, (fetch[-1] if fetch else last)

    if not urls.isStreaming:
        def batch_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
            sel = pick(pdf)
            fetch, _ = slots(sel, None)
            return pd.DataFrame({
                "url": sel["url"], "domain": sel["domain"],
                "priority": sel["priority"],
                "fetch_at": pd.to_datetime(fetch, unit="s")})

        return urls.groupBy("domain").applyInPandas(batch_kernel,
                                                    _SCHED_OUT)

    from pyspark.sql.streaming.state import GroupStateTimeout

    def fold(key, pdf_iter, state):
        last = state.get[0] if state.exists else None
        chunks = list(pdf_iter)
        if chunks:
            # concat BEFORE ranking: a domain split across Arrow batches
            # would otherwise emit per-chunk top-k (the session_gaps /
            # ewma chunk-boundary fix)
            sel = pick(pd.concat(chunks, ignore_index=True))
            fetch, last = slots(sel, last)
            state.update((last,))
            yield pd.DataFrame({
                "url": sel["url"], "domain": sel["domain"],
                "priority": sel["priority"],
                "fetch_at": pd.to_datetime(fetch, unit="s")})
        else:
            if last is not None:
                state.update((last,))
            yield pd.DataFrame({
                "url": pd.Series([], dtype="string"),
                "domain": pd.Series([], dtype="string"),
                "priority": pd.Series([], dtype="float64"),
                "fetch_at": pd.Series([], dtype="datetime64[ns]")})

    return (urls.withWatermark(event_time, watermark)
            .groupBy("domain")
            .applyInPandasWithState(
                fold, _SCHED_OUT, state_schema, "append",
                GroupStateTimeout.NoTimeout))
