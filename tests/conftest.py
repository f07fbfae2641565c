import io

import pandas as pd
import pytest

from otit_swt_spark.engine import Engine
from otit_swt_spark.graph import GraphStore
from otit_swt_spark.session import get_spark
from otit_swt_spark.terms import XSD_UNSIGNED_INT
from otit_swt_spark.timeseries import in_memory_timeseries

# The reference test knowledge graph:
# hybrid/tests/query_execution_testdata/testdata.sparql
TESTDATA_SPARQL = """
PREFIX case: <http://example.org/case#>
PREFIX types: <http://example.org/types#>
PREFIX otit_swt: <https://github.com/magbak/otit_swt#>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
INSERT DATA {
    case:myWidget1 types:hasSensor case:mySensor1 .
    case:myWidget1 types:hasSomething case:mySomething1 .
    case:myWidget2 types:hasSensor case:mySensor2 .
    case:myWidget1 a types:BigWidget .
    case:myWidget2 a types:SmallWidget .
    case:mySensor1 otit_swt:hasTimeseries case:myTimeseries1 .
    case:myTimeseries1 otit_swt:hasDatatype xsd:unsignedInt .
    case:mySensor2 otit_swt:hasTimeseries case:myTimeseries2 .
    case:myTimeseries2 otit_swt:hasDatatype xsd:unsignedInt .
    case:myTimeseries1 otit_swt:hasExternalId "ts1" .
    case:myTimeseries2 otit_swt:hasExternalId "ts2" .
}
"""

# hybrid/tests/query_execution_testdata/ts1.csv / ts2.csv
TS1_CSV = """timestamp,value
2022-06-01T08:46:52,1
2022-06-01T08:46:53,10
2022-06-01T08:46:54,100
2022-06-01T08:46:55,301
2022-06-01T08:46:56,102
2022-06-01T08:46:57,303
2022-06-01T08:46:58,304
2022-06-01T08:46:59,105
"""

TS2_CSV = """timestamp,value
2022-06-01T08:46:52,2
2022-06-01T08:46:53,20
2022-06-01T08:46:54,200
2022-06-01T08:46:55,201
2022-06-01T08:46:56,202
2022-06-01T08:46:57,203
2022-06-01T08:46:58,204
2022-06-01T08:46:59,206
"""


@pytest.fixture(scope="session")
def spark():
    s = get_spark("otit_swt_spark_tests", cpus=4)
    yield s


@pytest.fixture(scope="session")
def engine(spark):
    graph = GraphStore.from_sparql_insert(spark, TESTDATA_SPARQL)
    graph.df = graph.df.cache()

    def read_ts(text):
        pdf = pd.read_csv(io.StringIO(text))
        pdf["timestamp"] = pd.to_datetime(pdf["timestamp"])
        pdf["value"] = pdf["value"].astype("int64")
        return pdf

    ts = in_memory_timeseries(
        spark, {"ts1": read_ts(TS1_CSV), "ts2": read_ts(TS2_CSV)},
        value_datatype=XSD_UNSIGNED_INT,
    )
    eng = Engine(spark, graph)
    eng.add_timeseries_table(ts)
    return eng


def rows(df, *cols):
    """Collect to a sorted list of tuples for order-insensitive comparison."""
    out = [tuple(r[c] for c in (cols or df.columns)) for r in df.collect()]
    return sorted(out, key=lambda t: tuple(str(x) for x in t))
