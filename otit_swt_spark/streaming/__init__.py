"""Structured Streaming sensor ingest (SURVEY §2.9 — additive work).

The reference has no streaming operators; its closest analog is batch OPC UA
history reads with server-side interval aggregation
(reference hybrid/src/timeseries_database/opcua_history_read.rs:94-281).
This package supplies the streaming half the driver's north star asks for:
``readStream`` sources -> watermarked tumbling-window aggregation ->
date-partitioned parquet sinks that register directly as
:class:`otit_swt_spark.timeseries.TimeSeriesTable` for the batch SPARQL
engine, plus an ``applyInPandasWithState`` stateful gap-detection operator.
"""

from otit_swt_spark.streaming.dedup import (
    build_lsh_index,
    stream_exact_dedup,
    stream_near_dup_flags,
)
from otit_swt_spark.streaming.ingest import (
    ewma_stream,
    read_timeseries_stream,
    session_downsample,
    session_gaps,
    stream_incremental_agg,
    sliding_downsample,
    to_timeseries_sink,
    windowed_downsample,
)

__all__ = [
    "build_lsh_index",
    "ewma_stream",
    "read_timeseries_stream",
    "session_downsample",
    "stream_incremental_agg",
    "session_gaps",
    "sliding_downsample",
    "stream_exact_dedup",
    "stream_near_dup_flags",
    "to_timeseries_sink",
    "windowed_downsample",
]
