"""JDBC-backed time-series table — the Spark analog of the reference's
Arrow Flight SQL connector (reference:
hybrid/src/timeseries_database/arrow_flight_sql_database.rs:121-301, which
renders each TimeSeriesQuery to PostgreSQL-dialect SQL and decodes Arrow
record batches).

In Spark none of that translation layer exists: ``spark.read.jdbc`` scans
participate in the one Catalyst plan, and the JDBC data source pushes
filters and column pruning into the remote database (the equivalent of the
reference's ``PushdownSetting::ValueConditions``). Parallel reads partition
on a numeric/timestamp column, which is the scan-scale lever at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from otit_swt_spark.timeseries import TimeSeriesTable


def jdbc_timeseries(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    identifier_column: str = "id",
    timestamp_column: str = "timestamp",
    value_column: str = "value",
    value_datatype: str | None = None,
    partition_column: str | None = None,
    lower_bound: str | int | None = None,
    upper_bound: str | int | None = None,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> TimeSeriesTable:
    """Register a remote SQL table as a TimeSeriesTable.

    ``partition_column``/bounds/``num_partitions`` map to Spark's parallel
    JDBC read — each executor issues a bounded range query, so the remote
    scan parallelizes like a file scan. Requires the JDBC driver jar on the
    Spark classpath; raises the underlying error otherwise."""
    reader = spark.read.format("jdbc") \
        .option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError("partitioned JDBC reads need lower_bound, "
                             "upper_bound and num_partitions")
        reader = (reader.option("partitionColumn", partition_column)
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound))
                  .option("numPartitions", str(num_partitions)))
    df = reader.load()
    return TimeSeriesTable(
        df,
        identifier_column=identifier_column,
        timestamp_column=timestamp_column,
        value_column=value_column,
        value_datatype=value_datatype,
    )
