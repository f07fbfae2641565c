"""Basic parser + BGP + filter smoke tests (fast subset)."""

from datetime import datetime

from tests.conftest import rows

CASE = "http://example.org/case#"


def test_static_bgp(engine):
    df = engine.query(
        """
        PREFIX otit_swt:<https://github.com/magbak/otit_swt#>
        SELECT * WHERE {?a otit_swt:hasTimeseries ?b }
        """
    )
    assert rows(df) == [
        (CASE + "mySensor1", CASE + "myTimeseries1"),
        (CASE + "mySensor2", CASE + "myTimeseries2"),
    ]


def test_static_bgp_literal_object(engine):
    df = engine.query(
        """
        PREFIX otit_swt:<https://github.com/magbak/otit_swt#>
        SELECT ?ts WHERE {?ts otit_swt:hasExternalId "ts1" }
        """
    )
    assert rows(df) == [(CASE + "myTimeseries1",)]


def test_simple_hybrid(engine):
    df = engine.query(
        """
        PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>
        PREFIX otit_swt:<https://github.com/magbak/otit_swt#>
        PREFIX types:<http://example.org/types#>
        SELECT ?w ?s ?t ?v WHERE {
            ?w a types:BigWidget .
            ?w types:hasSensor ?s .
            ?s otit_swt:hasTimeseries ?ts .
            ?ts otit_swt:hasDataPoint ?dp .
            ?dp otit_swt:hasTimestamp ?t .
            ?dp otit_swt:hasValue ?v .
            FILTER(?t > "2022-06-01T08:46:53"^^xsd:dateTime && ?v < 200) .
        }
        """
    )
    # ts1 values after 08:46:53 that are < 200: 100@54, 102@56, 105@59
    assert rows(df, "t", "v") == [
        (datetime(2022, 6, 1, 8, 46, 54), 100),
        (datetime(2022, 6, 1, 8, 46, 56), 102),
        (datetime(2022, 6, 1, 8, 46, 59), 105),
    ]
    assert df.columns == ["w", "s", "t", "v"]
