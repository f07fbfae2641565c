"""User-defined table functions (SURVEY §2.10 surface, Spark-4-native):
row → multiple-rows transforms registered as UDTFs, usable from both the
DataFrame API and SQL LATERAL joins.

UDTFs run in the Python worker (Arrow-batched by Spark 4's UDTF
execution), so they are the escape hatch for one-to-many transforms whose
row logic cannot be expressed with explode + built-ins — the semantics
here ARE expressible relationally (and the oracle twin proves it), which
is exactly what makes the UDTF plumbing testable end to end.
"""

from __future__ import annotations

import re

from pyspark.sql import SparkSession
from pyspark.sql.functions import udtf

# one "sentence" = a run of non-terminators plus any trailing terminators;
# trimmed, empties dropped. Plain greedy matching, identical under Python
# re and RE2 (no lookbehind — RE2, hence DuckDB, has none).
_SENT_RE = re.compile(r"[^.!?]+[.!?]*")


@udtf(returnType="idx int, sentence string", useArrow=True)
class SplitSentences:
    """(idx, sentence) rows for one text value, sentence-split on
    ``.``/``!``/``?`` terminators; ``idx`` counts the surviving
    (non-empty after trim) sentences in order."""

    def eval(self, text: str):  # noqa: D102 — contract in class docstring
        i = 0
        for m in _SENT_RE.findall(text or ""):
            s = m.strip()
            if s:
                yield i, s
                i += 1


def register_udtfs(spark: SparkSession) -> None:
    """Register the UDTF surface for SQL use:
    ``SELECT d.doc_id, s.* FROM docs d, LATERAL split_sentences(d.text) s``."""
    spark.udtf.register("split_sentences", SplitSentences)
