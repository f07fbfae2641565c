"""Runnable example: hybrid SPARQL + time-series query.

Builds a small knowledge graph (sensors attached to widgets), registers an
in-memory time-series table, and runs one query that joins KG structure
with sensor readings and aggregates per widget — the engine's flagship
shape (the reference's wind-power workload).

    python examples/hybrid_query.py
"""

import os
import sys

import pandas as pd

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from otit_swt_spark import Engine, GraphStore, in_memory_timeseries  # noqa: E402
from otit_swt_spark.session import get_spark  # noqa: E402

OTIT = "https://github.com/magbak/otit_swt#"

KG = f"""
PREFIX otit_swt: <{OTIT}>
PREFIX ex: <urn:ex:>
INSERT DATA {{
  ex:widget1 ex:hasSensor ex:sensor1 .
  ex:widget2 ex:hasSensor ex:sensor2 .
  ex:sensor1 otit_swt:hasTimeseries ex:ts1 .
  ex:sensor2 otit_swt:hasTimeseries ex:ts2 .
  ex:ts1 otit_swt:hasExternalId "ts1" .
  ex:ts2 otit_swt:hasExternalId "ts2" .
}}
"""

QUERY = f"""
PREFIX otit_swt: <{OTIT}>
PREFIX ex: <urn:ex:>
SELECT ?widget (AVG(?value) AS ?avg_value) (COUNT(?value) AS ?n) WHERE {{
    ?widget ex:hasSensor ?sensor .
    ?sensor otit_swt:hasTimeseries ?ts .
    ?ts otit_swt:hasDataPoint ?dp .
    ?dp otit_swt:hasValue ?value .
    ?dp otit_swt:hasTimestamp ?t .
    FILTER(?t >= "2024-01-01T00:00:00"^^<http://www.w3.org/2001/XMLSchema#dateTime>)
}} GROUP BY ?widget ORDER BY ?widget
"""


def main() -> None:
    spark = get_spark("example_hybrid", cpus=4)
    graph = GraphStore.from_sparql_insert(spark, KG)
    ts = pd.date_range("2024-01-01", periods=60, freq="1min")
    frames = {
        "ts1": pd.DataFrame({"timestamp": ts, "value": range(60)}),
        "ts2": pd.DataFrame({"timestamp": ts, "value": [v * 2 for v in range(60)]}),
    }
    engine = Engine(spark, graph).add_timeseries_table(
        in_memory_timeseries(spark, frames))
    df = engine.query(QUERY)
    df.show(truncate=False)
    df.explain()


if __name__ == "__main__":
    main()
