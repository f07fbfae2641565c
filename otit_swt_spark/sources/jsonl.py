"""JSONL (newline-delimited JSON) corpus source/sink — the de-facto
interchange format for LLM training corpora (one document object per
line). Built on Spark's native JSON datasource, so schema enforcement,
predicate pushdown on the parsed columns, and parallel split reading all
come from the engine; a ``_corrupt`` column quarantines malformed lines
instead of failing the 100 TB job at line 73 billion.

Additive — the reference has no document-corpus formats (its sources are
SPARQL endpoints and time-series stores, SURVEY §2.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Canonical corpus schema (mirrors testdata documents.parquet); the
# corrupt-record column must be part of the read schema to be populated.
DOC_SCHEMA = ("doc_id long, text string, lang string, source string, "
              "n_chars long")


def read_jsonl(spark: SparkSession, path: str, schema: str = DOC_SCHEMA,
               keep_corrupt: bool = False) -> DataFrame:
    """Read a JSONL corpus with a fixed schema (never inferSchema at scale
    — inference is a full extra pass over the data). Malformed lines land
    in ``_corrupt`` (PERMISSIVE mode); by default they are dropped, with
    ``keep_corrupt=True`` they are returned for quarantine sinks."""
    df = (spark.read
          .schema(schema + ", _corrupt string")
          .option("mode", "PERMISSIVE")
          .option("columnNameOfCorruptRecord", "_corrupt")
          .json(path))
    if keep_corrupt:
        # Caveat: Spark refuses queries whose referenced columns are ONLY
        # the corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — quarantine
        # consumers must select at least one data column alongside it.
        return df
    return df.filter(df["_corrupt"].isNull()).drop("_corrupt")


def write_jsonl(df: DataFrame, path: str, compression: str | None = None,
                mode: str = "overwrite") -> None:
    """Write a corpus as JSONL part files (optionally gzip/zstd — splits
    stay parallel-readable with zstd frames via Spark's codec support)."""
    w = df.write.mode(mode)
    if compression:
        w = w.option("compression", compression)
    w.json(path)
