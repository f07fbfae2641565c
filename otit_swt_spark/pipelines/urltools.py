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
    host = F.regexp_replace(hostport, r":(80|443)$", "")
    host = F.when(
        (scheme == "http") | (scheme == "https"), host
    ).otherwise(hostport)
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
