"""PII detection and redaction for training corpora.

Large-scale text pipelines scrub personally identifiable information
before training: email addresses, phone-like number runs, IPv4 addresses,
and long digit sequences (account / credit-card shaped). This module does
it entirely with ``regexp_replace`` / ``regexp_extract_all`` built-ins —
whole-stage codegen, map-side only, no shuffle, no Python in the executor
path — so it costs one scan at any corpus size.

Pattern notes: the regexes deliberately use only syntax shared by Java's
regex engine (Spark) and RE2-ish engines (the DuckDB correctness oracle):
no backreferences, no lookbehind. They are intentionally high-recall /
moderate-precision — the standard trade for corpus scrubbing, where a
false positive costs one replaced token and a false negative leaks PII.

The reference engine has no PII operator; this is part of the additive
LLM-training-data suite.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Order matters: emails before generic digit runs (an email can contain
# digits); IPv4 before phone (dotted quads would otherwise partially match
# phone-ish patterns in engines that scan left-to-right after replacement).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+?[0-9][0-9()\[\] .-]{7,}[0-9]", "<PHONE>"),
    ("id_number", r"\b[0-9]{9,}\b", "<ID>"),
]


def pii_counts(text: Column) -> list[tuple[str, Column]]:
    """Per-category match counts (computed on the ORIGINAL text)."""
    return [
        (name, F.size(F.regexp_extract_all(text, F.lit(pat), F.lit(0))))
        for name, pat, _ in PII_PATTERNS
    ]


def scrub(text: Column) -> Column:
    """Replace every PII match with its category placeholder, applying the
    patterns in the fixed ``PII_PATTERNS`` order."""
    out = text
    for _, pat, repl in PII_PATTERNS:
        out = F.regexp_replace(out, pat, repl)
    return out


def scrub_pii(df: DataFrame, text_col: str = "text",
              out_col: str | None = None) -> DataFrame:
    """Add ``pii_n_<category>`` count columns and a scrubbed text column
    (default: replaces ``text_col`` in place; pass ``out_col`` to keep the
    original). One projection — no shuffle."""
    t = F.col(text_col)
    cols = [c for c in df.columns]
    proj = [F.col(c) for c in cols]
    for name, cnt in pii_counts(t):
        proj.append(cnt.cast("long").alias(f"pii_n_{name}"))
    scrubbed = scrub(t).alias(out_col or text_col)
    if out_col is None:
        proj[cols.index(text_col)] = scrubbed
    else:
        proj.append(scrubbed)
    return df.select(*proj)
