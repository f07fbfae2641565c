"""otit_swt_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of magbak/otit_swt.

Three products (mirroring the reference README at /root/reference/README.md):

- :class:`otit_swt_spark.engine.Engine` — hybrid SPARQL query engine over a
  columnar triples DataFrame, with external time-series contextualization
  (reference: hybrid/src/engine.rs).
- :class:`otit_swt_spark.mapper.Mapping` — stOTTR template expansion,
  DataFrame -> RDF triples (reference: mapper/src/mapping.rs).
- :func:`otit_swt_spark.dsl.translate` — path-based time-series DSL compiled
  to SPARQL (reference: dsl/src/translator.rs).

Unlike the reference, which splits each query between a SPARQL endpoint and a
time-series database and re-joins with Polars, this engine compiles the whole
query into a single Spark DataFrame plan and lets Catalyst do predicate
pushdown, column pruning, partition pruning and join selection.
"""

from otit_swt_spark.engine import Engine, InconsistentDatatype
from otit_swt_spark.graph import GraphStore
from otit_swt_spark.mapper import Mapping, MintingOptions, ResolveIRI
from otit_swt_spark.timeseries import (
    TimeSeriesTable,
    asof_join,
    ewma,
    in_memory_timeseries,
    interval_join,
    sessionize,
)

__all__ = [
    "Engine",
    "GraphStore",
    "InconsistentDatatype",
    "Mapping",
    "MintingOptions",
    "ResolveIRI",
    "TimeSeriesTable",
    "asof_join",
    "ewma",
    "in_memory_timeseries",
    "interval_join",
    "sessionize",
]
__version__ = "0.2.0"
