"""URL canonicalization + registered-domain extraction — the crawl-prep
stage that runs BEFORE url-level dedup: the same page arrives as
``HTTP://WWW.Site.com:80/a?utm_source=x&b=2&a=1#frag`` and
``http://site.com/a?a=1&b=2``, and a corpus that treats those as two
documents double-counts its sources and defeats per-domain quotas.

Everything is built-in column expressions (regexp splits + higher-order
list ops) — no UDF, whole-stage-codegen friendly, replayable in any SQL
engine with the same regex semantics. The canonicalization contract
(documented, deliberately conservative — semantics-preserving transforms
only):

- scheme and host lowercase; path/query case preserved
- fragment stripped (never sent to the server)
- default ports stripped (``:80`` for http, ``:443`` for https)
- leading ``www.`` stripped from the host
- tracking parameters removed (``utm_*``, ``gclid``, ``fbclid``,
  ``ref``), remaining query params sorted bytewise for order
  independence; an emptied query drops its ``?``
- empty path becomes ``/``

``registered_domain`` is the last two host labels — a heuristic standing
in for the public-suffix list (out of scope: the PSL is a data file, not
an algorithm; the column is what per-domain caps group by)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_TRACKING = "^(utm_|gclid=|gclid$|fbclid=|fbclid$|ref=|ref$)"


def canonical_url(url: Column) -> Column:
    """Canonical form of a URL column per the module contract."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.\-]*)://",
                                      1))
    hostport = F.lower(F.regexp_extract(u, r"^[^:/?#]+://([^/?#]*)", 1))
    # each scheme strips only ITS OWN default port: https://x:80 is a
    # genuinely different endpoint and must not merge with https://x
    host = (F.when(scheme == "http",
                   F.regexp_replace(hostport, r":80$", ""))
            .when(scheme == "https",
                  F.regexp_replace(hostport, r":443$", ""))
            .otherwise(hostport))
    host = F.regexp_replace(host, r"^www\.", "")
    path = F.regexp_extract(u, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.regexp_extract(u, r"\?([^#]*)", 1)
    kept = F.array_sort(F.filter(
        F.split(q, "&"),
        lambda p: (p != "") & ~p.rlike(_TRACKING)))
    q2 = F.array_join(kept, "&")
    return F.concat(
        scheme, F.lit("://"), host, path,
        F.when(q2 == "", F.lit("")).otherwise(F.concat(F.lit("?"), q2)))


def registered_domain(url: Column) -> Column:
    """Last two labels of the (lowercased, www-stripped, port-stripped)
    host — the per-domain quota key."""
    hostport = F.lower(F.regexp_extract(F.trim(url),
                                        r"^[^:/?#]+://([^/?#]*)", 1))
    host = F.regexp_replace(F.regexp_replace(hostport, r":\d+$", ""),
                            r"^www\.", "")
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(two == "", host).otherwise(two)


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url",
                      domain_col: str = "domain") -> DataFrame:
    """Attach ``canonical_url`` and ``domain`` columns — the map-side
    stage before url-level exact dedup (group by canonical) or domain
    balancing (group by domain, cap per key)."""
    return (df.withColumn(out_col, canonical_url(F.col(url_col)))
            .withColumn(domain_col, registered_domain(F.col(url_col))))


def robots_filter(urls: DataFrame, rules: DataFrame,
                  url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """Crawl-permission filter with RFC 9309 longest-match semantics
    (the robots.txt resolution rule, public standard): for each URL,
    among the domain's rules whose ``path_prefix`` literally prefixes
    the URL path, the LONGEST prefix wins; a length tie resolves to
    allow (least-restrictive, RFC 9309 §2.2.2); no matching rule means
    allowed. Wildcard-free literal prefixes only — the documented
    subset; a '/' disallow blocks the whole host.

    Prefix matching operates on the PATH PLUS QUERY (``/search?q=``
    rules match), per RFC 9309 §2.2.2's match-on-path-and-query; only
    the fragment is excluded. An EMPTY disallow prefix matches nothing
    (RFC 9309: ``Disallow:`` with no value means allow-all, so an empty
    prefix must never block); an empty allow prefix is a harmless no-op
    (loses every longest-match tie except against no rule at all, where
    the default is already allow).

    ``rules``: ``(domain, directive, path_prefix)`` with directive in
    {'allow', 'disallow'} — robots files are dimension-sized, so the
    join broadcasts and the whole filter is map-side + one bounded
    per-URL aggregate. Returns the input rows that are ALLOWED, every
    input column preserved (``id_col`` must uniquely key rows — rider
    columns are constant within an id, so the post-join ``first()`` is
    deterministic; duplicate ids FAIL FAST via a distinct-count guard
    piggybacked on the same aggregate rather than silently picking an
    arbitrary row), with the deciding rule attached
    (``matched_prefix``, NULL when no rule matched)."""
    path = F.regexp_extract(F.trim(F.col(url_col)),
                            r"^[^:/?#]+://[^/?#]*([^#]*)", 1)
    # RFC 9309's match string for an empty path is "/" (plus the query
    # if present): a query-only URL like http://a.com?q=1 captures
    # "?q=1", which must match "/"-anchored rules — prepend the slash
    # or a whole-host "Disallow: /" silently lets such URLs through
    path = (F.when(path == "", F.lit("/"))
            .when(~path.startswith("/"), F.concat(F.lit("/"), path))
            .otherwise(path))
    u = (urls.withColumn("__dom", registered_domain(F.col(url_col)))
         .withColumn("__path", path)
         .withColumn("__rid", F.monotonically_increasing_id()))
    r = (rules.select(
        F.col("domain").alias("__rdom"),
        F.when(F.lower(F.col("directive")) == "allow", F.lit(1))
        .otherwise(F.lit(0)).alias("__allow"),
        F.coalesce(F.col("path_prefix"), F.lit("")).alias("__pfx"))
        # RFC 9309: an empty Disallow value is allow-all, i.e. NOT a
        # rule — without this drop the '' prefix would match (and with
        # longest-match, block) every path on the host: inverted
        # semantics for the very common "User-agent: *\nDisallow:" body
        .where((F.col("__allow") == 1) | (F.col("__pfx") != "")))
    joined = (u.join(F.broadcast(r),
                     (F.col("__dom") == F.col("__rdom"))
                     & F.col("__path").startswith(F.col("__pfx")),
                     "left"))
    # longest prefix wins; struct max breaks length ties toward allow=1
    best = F.max(F.when(F.col("__pfx").isNotNull(),
                        F.struct(F.length("__pfx").alias("l"),
                                 F.col("__allow").alias("a"),
                                 F.col("__pfx").alias("p"))))
    riders = [c for c in urls.columns if c != id_col]
    agg = (joined.groupBy(id_col)
           .agg(*[F.first(F.col(c)).alias(c) for c in riders],
                best.alias("__best"),
                # one input row == one __rid, so >1 distinct rids under
                # one id means the id-uniqueness contract is violated
                F.count_distinct("__rid").alias("__nid")))
    allowed = F.col("__best").isNull() | (F.col("__best.a") == 1)
    # the guard lives inside the filter so it fires for EVERY duplicate
    # id, including ones whose best rule is a disallow
    guarded = F.when(
        F.col("__nid") > 1,
        F.raise_error(F.concat(
            F.lit("robots_filter: duplicate id in '" + id_col + "': "),
            F.col(id_col).cast("string"))).cast("boolean")
    ).otherwise(allowed)
    return (agg.where(guarded)
            .select(id_col, *riders,
                    F.col("__best.p").alias("matched_prefix")))


def _robots_wildcard_groups(df: DataFrame, domain_col: str,
                            body_col: str, fields: str):
    """Shared RFC 9309 group machinery for the robots parsers: explode
    lines, strip comments, parse ``fields`` directives, assign group
    ids (a run of consecutive ``User-agent`` lines starts one group),
    and return ``(staged, wild)`` — the parsed directive rows and the
    (domain, group) pairs whose group names ``*``. Window frames are
    bounded by a single robots file's line count, so the parse
    distributes across domains and never builds a global window."""
    from pyspark.sql import Window as W

    lines = (df.select(
        F.col(domain_col).alias("domain"),
        F.posexplode(F.split(F.coalesce(F.col(body_col), F.lit("")),
                             "\n")).alias("pos", "__raw")))
    clean = F.trim(F.regexp_replace(F.col("__raw"), "#.*$", ""))
    # Group boundaries are computed over EVERY directive-shaped line,
    # not just the fields the caller asked for: ANY rule line ends a
    # run of User-agent lines (RFC 9309 §2.1), so 'User-agent: *\n
    # Disallow: /x\n\nUser-agent: Bot\nCrawl-delay: 50' is TWO groups
    # even when the caller only extracts user-agent|crawl-delay.
    # Filtering first merged such runs and leaked a bot-only group's
    # Crawl-delay onto the * group (round-12 fix).
    raw_field = F.lower(F.regexp_extract(
        clean, r"^([A-Za-z][A-Za-z0-9-]*)\s*:", 1))
    # A bare URL line ('http://example.com/x') also matches the
    # field regex (field 'http', value '//example.com/x'); RFC 9309
    # says crawlers should IGNORE such malformed lines, not let them
    # terminate a User-agent run and split the group (round-13 fix).
    # Scheme shape = colon immediately followed by '//'; a KNOWN
    # directive keeps its rule reading even then ('Disallow://foo'
    # is a rule with path '//foo', not a 'disallow:' URL scheme).
    known_directives = ("user-agent", "allow", "disallow", "crawl-delay",
                        "sitemap", "host", "clean-param", "request-rate",
                        "visit-time", "noindex")
    field = F.when(
        clean.rlike(r"^[A-Za-z][A-Za-z0-9-]*://")
        & ~raw_field.isin(*known_directives),
        F.lit("")).otherwise(raw_field)
    value = F.trim(F.regexp_extract(
        clean, r"^[A-Za-z][A-Za-z0-9-]*\s*:\s*(.*)$", 1))
    parsed = (lines.select("domain", "pos", field.alias("__f"),
                           value.alias("__v"))
              .where(F.col("__f") != ""))
    w = (W.partitionBy("domain").orderBy("pos")
         .rowsBetween(W.unboundedPreceding, 0))
    is_ua = (F.col("__f") == "user-agent").cast("int")
    prev_ua = F.coalesce(
        F.lag(is_ua).over(W.partitionBy("domain").orderBy("pos")),
        F.lit(0))
    grouped = (parsed
               .withColumn("__start",
                           ((is_ua == 1) & (prev_ua == 0)).cast("int"))
               .withColumn("__grp", F.sum("__start").over(w)))
    wild = (grouped.where((F.col("__f") == "user-agent")
                          & (F.col("__v") == "*"))
            .select("domain", F.col("__grp").alias("__wg")).distinct())
    staged = grouped.where(F.col("__f").isin(fields.split("|")))
    return staged, wild


def parse_robots(df: DataFrame, domain_col: str = "domain",
                 body_col: str = "robots_txt") -> DataFrame:
    """Distributed robots.txt parser: ``(domain, body)`` -> the
    ``(domain, directive, path_prefix)`` rules frame
    :func:`robots_filter` consumes, honoring RFC 9309 GROUP semantics —
    consecutive ``User-agent`` lines form one group, a group's rules
    apply to every agent named in it, and only groups naming ``*`` are
    kept (per-bot groups are ignored). Comments (``# ...``), blank
    lines, directive case, and surrounding whitespace are handled.

    Shape: posexplode the lines, then two windows PARTITIONED BY
    domain and ordered by line position — group ids via a running sum
    of group-start indicators (a ``User-agent`` line whose predecessor
    wasn't one), wildcard membership via a per-(domain, group) max."""
    staged, wild = _robots_wildcard_groups(
        df, domain_col, body_col, "user-agent|allow|disallow")
    return (staged.where(F.col("__f") != "user-agent")
            # RFC 9309: 'Disallow:' with an empty value is the allow-all
            # idiom, not a rule — emitting it would invert the semantics
            # downstream (empty prefix would longest-match-block every
            # path). Empty 'Allow:' stays: a harmless no-op.
            .where(~((F.col("__f") == "disallow") & (F.col("__v") == "")))
            .join(wild, (staged["domain"] == wild["domain"])
                  & (staged["__grp"] == wild["__wg"]), "left_semi")
            .select("domain", F.col("__f").alias("directive"),
                    F.col("__v").alias("path_prefix")))


def robots_sitemaps(df: DataFrame, domain_col: str = "domain",
                    body_col: str = "robots_txt") -> DataFrame:
    """``Sitemap:`` discovery from robots.txt bodies: ``(domain, body)``
    -> ``(domain, sitemap_url)``, one row per Sitemap line — how
    sitemaps are actually FOUND on the open web (sitemaps.org's
    robots.txt submission method). Unlike allow/disallow/crawl-delay,
    Sitemap is a STANDALONE record: it binds regardless of any
    User-agent group (RFC 9309 treats unknown lines as non-group
    records; sitemaps.org specifies file scope), so no group machinery
    applies — one map-side regexp pass, comments stripped, case
    handled, duplicates collapsed. Values must be absolute URLs per the
    protocol; non-URL values are dropped. Feed the result to
    :func:`parse_sitemap_index` / :func:`parse_sitemap` after
    fetching."""
    lines = (df.select(
        F.col(domain_col).alias("domain"),
        F.explode(F.split(F.coalesce(F.col(body_col), F.lit("")),
                          "\n")).alias("__raw")))
    clean = F.trim(F.regexp_replace(F.col("__raw"), "#.*$", ""))
    url = F.trim(F.regexp_extract(clean, r"^(?i)sitemap\s*:\s*(.*)$", 1))
    return (lines.select("domain", url.alias("sitemap_url"))
            .where(F.col("sitemap_url").rlike(r"^https?://"))
            .distinct())


def recrawl_candidates(frontier: DataFrame,
                       url_col: str = "url",
                       lastmod_col: str = "lastmod",
                       last_fetch_col: str = "last_fetch") -> DataFrame:
    """Freshness gate between discovery and scheduling: keep URLs that
    NEED (re)fetching — never fetched, or the publisher's declared
    ``lastmod`` (sitemaps.org) is newer than our last fetch. The
    complement (fetched and unchanged since) is the crawl traffic a
    lastmod-honoring crawler saves; a NULL lastmod on a fetched URL is
    conservative-skipped (no freshness claim -> recrawl is the
    frontier's periodic-revisit policy's job, not this gate's). Pure
    map-side filter with a ``reason`` column for auditability; compose
    with :func:`frontier_next_batch` for the polite schedule."""
    if "reason" in frontier.columns:
        # same rider-collision discipline as bloom_unseen_flags: silently
        # overwriting a caller's 'reason' would both lose their column
        # and filter on the wrong values
        raise ValueError(
            "recrawl_candidates: frontier already has a 'reason' column; "
            "rename or drop it first")
    reason = (F.when(F.col(last_fetch_col).isNull(), F.lit("never_fetched"))
              .when(F.col(lastmod_col).isNotNull()
                    & (F.col(lastmod_col) > F.col(last_fetch_col)),
                    F.lit("stale")))
    return (frontier.withColumn("reason", reason)
            .where(F.col("reason").isNotNull()))


def robots_crawl_delays(df: DataFrame, domain_col: str = "domain",
                        body_col: str = "robots_txt",
                        cap_s: float = 60.0) -> DataFrame:
    """Per-domain ``Crawl-delay`` extraction from robots.txt bodies:
    ``(domain, body)`` -> ``(domain, crawl_delay_s)``. Crawl-delay is
    not part of RFC 9309 but is honored by major crawlers (Bing,
    Yandex); the SAME group semantics apply — only a delay stated in a
    group naming ``*`` binds a generic crawler, per-bot groups are
    ignored (a separate parse from :func:`parse_robots` so the
    (directive, path_prefix) rules frame every existing consumer reads
    stays byte-identical). Multiple delays take the MAX (most
    conservative), non-numeric values are dropped, and values are
    capped at ``cap_s`` — a hostile ``Crawl-delay: 86400`` must not
    park a scheduler. Feed the result to ``frontier_next_batch`` /
    ``streaming.crawl.stream_frontier_schedule`` via their per-domain
    ``delay_col``."""
    staged, wild = _robots_wildcard_groups(
        df, domain_col, body_col, "user-agent|crawl-delay")
    delays = (staged.where(F.col("__f") == "crawl-delay")
              .join(wild, (staged["domain"] == wild["domain"])
                    & (staged["__grp"] == wild["__wg"]), "left_semi")
              .select("domain", F.col("__v").try_cast("double")
                      .alias("__d"))
              .where(F.col("__d").isNotNull() & (F.col("__d") >= 0)))
    return (delays.groupBy("domain")
            .agg(F.least(F.max("__d"), F.lit(float(cap_s)))
                 .alias("crawl_delay_s")))


def parse_sitemap(df: DataFrame, domain_col: str = "domain",
                  body_col: str = "sitemap_xml") -> DataFrame:
    """Distributed sitemap.xml parsing (sitemaps.org protocol, public
    standard): ``(domain, xml_body)`` -> one row per ``<url>`` entry
    with its ``<loc>``, optional ``<lastmod>`` and ``<priority>`` —
    the URL-discovery stage that feeds the crawl frontier alongside
    the content-area outlink graph.

    Entirely built-in regexp expressions (no XML library, no UDF): each
    ``<url>...</url>`` block is extracted with ``regexp_extract_all``
    and its child tags read positionally within the block, so the parse
    is one codegen'd projection + explode — map-side at any scale, and
    replayable in any SQL engine with the same regex semantics.
    Entity-unescapes the five predefined XML escapes that appear in
    ``<loc>`` values (numeric character references are out of the
    documented scope — sitemaps in the wild use the named five). Rows
    without a ``<loc>`` are dropped; ``lastmod`` / ``priority`` are
    NULL when absent (priority's protocol default of 0.5 is left to
    the caller — NULL preserves "not stated")."""
    blocks = F.regexp_extract_all(
        F.coalesce(F.col(body_col), F.lit("")),
        F.lit(r"(?s)<url\s*>(.*?)</url\s*>"), F.lit(1))
    b = (df.select(F.col(domain_col).alias("domain"),
                   F.explode(blocks).alias("__b")))
    loc = F.regexp_extract(F.col("__b"),
                           r"(?s)<loc\s*>\s*(.*?)\s*</loc\s*>", 1)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    lastmod = F.regexp_extract(
        F.col("__b"), r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>", 1)
    prio = F.regexp_extract(
        F.col("__b"), r"(?s)<priority\s*>\s*(.*?)\s*</priority\s*>", 1)
    return (b.select(
        "domain", loc.alias("loc"),
        F.when(lastmod == "", None).otherwise(
            F.try_to_timestamp(lastmod)).alias("lastmod"),
        F.when(prio == "", None).otherwise(
            prio.try_cast("double")).alias("priority"))
        .where(F.col("loc") != ""))


def frontier_next_batch(frontier: DataFrame, now,
                        url_col: str = "url", domain_col: str = "domain",
                        priority_col: str = "priority",
                        last_fetch_col: str = "last_fetch",
                        batch_size: int = 1000,
                        per_domain_cap: int = 4,
                        min_delay_s: float = 5.0,
                        delay_col: str | None = None) -> DataFrame:
    """Polite crawl-frontier scheduling: from ``(url, domain, priority,
    last_fetch)`` pick the next fetch batch — only domains whose last
    fetch is at least ``min_delay_s`` old (or never fetched), at most
    ``per_domain_cap`` URLs per domain (politeness), ranked per domain
    and then globally by ``(priority DESC, url)`` up to ``batch_size``.
    The scheduling stage between URL discovery (sitemaps + outlinks,
    deduped by canonical URL) and the fetcher fleet.

    Scale shape: one window PARTITIONED BY domain (frames bounded by a
    single domain's frontier) + one global TakeOrdered of
    ``batch_size`` rows — no global sort materializes. Deterministic:
    every tie breaks on the URL string, so the same frontier always
    yields the same batch (replayable, and two schedulers can't
    disagree). ``now`` is an explicit timestamp — scheduling must not
    read the wall clock inside the plan or replays diverge.

    ``delay_col`` (optional): a per-row domain delay in seconds (e.g.
    robots.txt ``Crawl-delay`` attached via
    :func:`robots_crawl_delays`); NULL falls back to ``min_delay_s``.
    The per-row cutoff is built with ``make_dt_interval`` on the
    column, keeping the whole predicate codegen'd and replayable."""
    import datetime

    from pyspark.sql import Window as W

    if delay_col is not None:
        delay = F.coalesce(F.col(delay_col),
                           F.lit(float(min_delay_s)))
        eligible = frontier.where(
            F.col(last_fetch_col).isNull()
            | (F.col(last_fetch_col)
               <= F.lit(now) - F.make_dt_interval(secs=delay)))
    else:
        # compute the cutoff driver-side: interpolating min_delay_s into
        # an INTERVAL literal breaks for floats that repr in scientific
        # notation (1e-05 is a ParseException), and a literal timestamp
        # is simpler than routing through F.expr anyway
        cutoff = now - datetime.timedelta(seconds=min_delay_s)
        eligible = frontier.where(
            F.col(last_fetch_col).isNull()
            | (F.col(last_fetch_col) <= F.lit(cutoff)))
    w = (W.partitionBy(domain_col)
         .orderBy(F.col(priority_col).desc_nulls_last(), url_col))
    return (eligible
            .withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= per_domain_cap)
            .drop("__r")
            .orderBy(F.col(priority_col).desc_nulls_last(), url_col)
            .limit(batch_size))


def parse_sitemap_index(df: DataFrame, domain_col: str = "domain",
                        body_col: str = "sitemap_xml") -> DataFrame:
    """Sitemap INDEX parsing (the ``<sitemapindex>`` form large sites
    serve: a list of child sitemap files): ``(domain, xml)`` -> one row
    per ``<sitemap>`` entry with its ``<loc>`` and optional
    ``<lastmod>``. Feed each loc back through a fetch +
    :func:`parse_sitemap` pass — the protocol's one level of nesting
    (index files must not reference other index files). Same
    regexp-only, map-side shape and entity handling as
    :func:`parse_sitemap`."""
    blocks = F.regexp_extract_all(
        F.coalesce(F.col(body_col), F.lit("")),
        F.lit(r"(?s)<sitemap\s*>(.*?)</sitemap\s*>"), F.lit(1))
    b = (df.select(F.col(domain_col).alias("domain"),
                   F.explode(blocks).alias("__b")))
    loc = F.regexp_extract(F.col("__b"),
                           r"(?s)<loc\s*>\s*(.*?)\s*</loc\s*>", 1)
    for ent, ch in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                    ("&apos;", "'"), ("&amp;", "&")):
        loc = F.replace(loc, F.lit(ent), F.lit(ch))
    lastmod = F.regexp_extract(
        F.col("__b"), r"(?s)<lastmod\s*>\s*(.*?)\s*</lastmod\s*>", 1)
    return (b.select(
        "domain", loc.alias("loc"),
        F.when(lastmod == "", None).otherwise(
            F.try_to_timestamp(lastmod)).alias("lastmod"))
        .where(F.col("loc") != ""))
