"""OPC UA history-read source (reference:
hybrid/src/timeseries_database/opcua_history_read.rs:94-281 — translates a
TimeSeriesQuery into ReadProcessedDetails/ReadRawModifiedDetails so the OPC
UA server aggregates server-side; interval selection at :688-739).

The OPC UA client stack is not available in this environment, so the
session transport is stubbed (``NotImplementedError``), but the semantics
the connector adds — *processed* reads, i.e. per-interval server-side
aggregation — are implemented as a real batch operator so anything built on
top (tests, the engine) runs against local frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: OPC UA aggregate function node ids -> Spark aggregates
#: (opcua_history_read.rs maps Average/Count/Minimum/Maximum/Total)
_OPCUA_AGGREGATES = {
    "Average": F.avg,
    "Count": lambda c: F.count(c),
    "Minimum": F.min,
    "Maximum": F.max,
    "Total": F.sum,
}


def processed_interval_aggregation(
    df: DataFrame,
    interval_seconds: float,
    aggregate: str = "Average",
) -> DataFrame:
    """ReadProcessedDetails semantics: one aggregated value per
    ``interval_seconds`` bucket per series id, bucket boundaries aligned to
    the epoch (reference ``find_grouping_interval``,
    opcua_history_read.rs:688-739). Returns (id, timestamp, value)."""
    if aggregate not in _OPCUA_AGGREGATES:
        raise ValueError(f"unsupported OPC UA aggregate {aggregate!r}")
    fn = _OPCUA_AGGREGATES[aggregate]
    interval = f"{int(interval_seconds)} seconds" if float(interval_seconds).is_integer() \
        else f"{int(interval_seconds * 1000)} milliseconds"
    return (
        df.groupBy("id", F.window("timestamp", interval).alias("w"))
        .agg(fn(F.col("value")).alias("value"))
        .select("id", F.col("w.start").alias("timestamp"), "value")
    )


class OPCUAHistoryRead:
    """API-parity stub for the reference's ``OPCUAHistoryRead`` Python class
    (py_otit_swt_query/src/lib.rs). Constructing it records the endpoint
    configuration; ``execute`` requires an OPC UA client stack and raises
    ``NotImplementedError`` here. Use
    :func:`processed_interval_aggregation` on locally-landed frames for the
    processed-read semantics."""

    def __init__(self, namespace: int, endpoint: str):
        self.namespace = namespace
        self.endpoint = endpoint

    def execute(self, *_args, **_kwargs):
        raise NotImplementedError(
            "OPC UA session transport is not available in this build; land "
            "history data to parquet (e.g. via the streaming ingest sink) "
            "and register it as a TimeSeriesTable instead")
