"""Tokenization parity of the Arrow gram UDFs with the oracle form.

The r13 advice flagged that the pandas gram UDFs tokenized with Python
``str.split()`` — which splits on *Unicode* whitespace — while the
expression form and every DuckDB oracle split on the ASCII ``\\s`` class
(RE2/Java semantics) and drop empty tokens. The divergence was invisible
on the pure-ASCII testdata but latent for any corpus containing U+00A0 /
U+2028-style spaces. These tests lock all three UDF tokenizers onto the
oracle's exact definition, with DuckDB itself as the arbiter.
"""

import duckdb
import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from otit_swt_spark.pipelines.dedup import (
    _ws_tokens,
    minhash_signature_udf,
    shingle_set_udf,
)

TRICKY = [
    "plain words here four tokens",
    "nbsp a\xa0b c d e",            # U+00A0 is NOT a separator
    "ls a b c d e",            # U+2028 line separator is NOT either
    "tab\tand\nnewline\rsplit ok",  # ASCII controls ARE separators
    "  leading and trailing  ",
    "multi   space    runs",
    "MiXeD Case TOKENS",
    "\tleading tab stays empty-free",
    "",
]


def _oracle_tokens(text: str) -> list[str]:
    """The oracle's token stream, computed by DuckDB itself:
    list_filter(string_split_regex(lower(trim(text)), '\\s+'), t <> '')."""
    con = duckdb.connect()
    (out,) = con.execute(
        "SELECT list_filter(string_split_regex(lower(trim(?)), '\\s+'),"
        "                   t -> t <> '')", [text]).fetchone()
    return list(out)


def test_ws_tokens_matches_duckdb_oracle_form():
    for text in TRICKY:
        assert _ws_tokens(text) == _oracle_tokens(text), repr(text)


def test_ws_tokens_unicode_whitespace_not_split():
    # the exact divergence the advice named: Python str.split() would
    # yield 5 tokens for the NBSP doc; the ASCII class keeps a\xa0b whole
    assert _ws_tokens("a\xa0b c d e") == ["a\xa0b", "c", "d", "e"]
    assert _ws_tokens("a b c") == ["a b", "c"]
    # None tokenizes like the empty string (UDF fallback -> the "" gram,
    # the oracle's coalesce(..., ''))
    assert _ws_tokens(None) == []
    assert _ws_tokens("") == []


def test_shingle_set_udf_tokenizes_like_oracle(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(TRICKY)])
    got = {r["doc_id"]: list(r["grams"]) for r in docs.select(
        "doc_id", shingle_set_udf(3)(F.col("text")).alias("grams")
    ).collect()}
    for i, t in enumerate(TRICKY):
        toks = _oracle_tokens(t)
        if len(toks) <= 3:
            want = sorted({" ".join(toks)})
        else:
            want = sorted({" ".join(toks[j:j + 3])
                           for j in range(len(toks) - 2)})
        assert got[i] == want, repr(t)
    # spot-check the NBSP doc's grams keep the joined a\xa0b token
    # ("nbsp a\xa0b c d e" -> 5 ASCII tokens -> 3 trigrams)
    nbsp = got[1]
    assert "a\xa0b c d" in nbsp and len(nbsp) == 3


def test_minhash_signature_udf_unicode_ws_consistency(spark):
    # same text modulo Unicode-whitespace placement must produce the
    # SAME signature only when the ASCII token streams agree
    docs = spark.createDataFrame([
        Row(doc_id=0, text="a\xa0b c d e"),   # tokens: a\xa0b c d e
        Row(doc_id=1, text="a b c d e"),      # tokens: a b c d e (differs)
        Row(doc_id=2, text="a\xa0b  c\td e"),  # same ASCII stream as 0
    ])
    sigs = {r["doc_id"]: tuple(r["sig"]) for r in docs.select(
        "doc_id", minhash_signature_udf(16)(F.col("text")).alias("sig")
    ).collect()}
    assert sigs[0] == sigs[2]
    assert sigs[0] != sigs[1]


if __name__ == "__main__":
    pytest.main([__file__, "-q"])
