"""CSV time-series reader (reference: the test harness reader at
hybrid/tests/query_execution.rs:58-74 — header + schema inference + date
parsing)."""

from __future__ import annotations

from pyspark.sql import SparkSession, functions as F

from otit_swt_spark.timeseries import TimeSeriesTable


def csv_timeseries(
    spark: SparkSession,
    paths: dict[str, str],
    timestamp_column: str = "timestamp",
    value_column: str = "value",
    value_datatype: str | None = None,
) -> TimeSeriesTable:
    """Read ``{external_id: csv_path}`` into one tall TimeSeriesTable.
    Schema is inferred per file (the reference infers per-column dtypes);
    timestamps parse via Spark's CSV timestamp inference."""
    if not paths:
        raise ValueError("csv_timeseries: empty id->path mapping")
    parts = []
    for ext_id, path in paths.items():
        df = (spark.read.option("header", True).option("inferSchema", True)
              .csv(path)
              .select(
                  F.lit(ext_id).alias("id"),
                  F.col(timestamp_column).cast("timestamp").alias("timestamp"),
                  F.col(value_column).alias("value"),
              ))
        parts.append(df)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return TimeSeriesTable(out, value_datatype=value_datatype)
