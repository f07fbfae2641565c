"""Wind-power benchmark case, ported from the reference's flagship workload
(hybrid/tests/query_execution_benchmark_case.rs:82-274): an RDS/ISO-style
functional-aspect KG (site -> turbine -> generator system -> generator),
8 turbines x 3 signals at 10 s cadence, 10-minute AVG downsampling, with
and without multi-series synchronization. The deterministic generator and
the canonical reference-shape queries live in otit_swt_spark.windpower
(shared with the bench.py windpower tier)."""

import pytest
from pyspark.sql import functions as F

from otit_swt_spark import windpower as wpm
from otit_swt_spark.windpower import (build_engine, query_10min_avg,
                                      query_multi_sync, series_frame)

from conftest import rows

N_TURBINES = 8
POINTS = 2880  # 8 hours @ 10 s per series; 3 signals x 8 turbines = 69k rows


def _series_frame():
    return series_frame(POINTS, N_TURBINES)


@pytest.fixture(scope="module")
def wind_engine(spark):
    return build_engine(spark, points=POINTS, n_turbines=N_TURBINES)


BENCH_PREFIX = wpm.PREFIXES
CHAIN = wpm.ASPECT_CHAIN

def test_windpower_10min_avg_single_signal(wind_engine):
    """reference test_should_pushdown_query: one turbine's Production signal
    downsampled to 10-minute averages."""
    df = wind_engine.query(BENCH_PREFIX + "SELECT ?wtur_label ?hour ?minute_10 "
        "(AVG(?val) AS ?avg_val) WHERE {" + CHAIN + """
        ?generator otit:hasTimeseries ?ts .
        ?ts rdfs:label "Production" .
        ?ts otit:hasDataPoint ?dp .
        ?dp otit:hasValue ?val .
        ?dp otit:hasTimestamp ?t .
        BIND(10 * FLOOR(MINUTES(?t) / 10.0) AS ?minute_10)
        BIND(HOURS(?t) AS ?hour)
        FILTER(?site_label = "Wind Mountain" && ?wtur_label = "A1")
    } GROUP BY ?wtur_label ?hour ?minute_10""")
    got = rows(df)
    # 8 hours -> 48 ten-minute buckets for turbine A1
    assert len(got) == 48
    assert all(r[0] == "A1" for r in got)
    # oracle: recompute bucket averages from the generator directly
    pdf = _series_frame()
    ep1 = pdf[pdf["id"] == "ep1"].copy()
    expected = ep1.groupby([ep1["timestamp"].dt.hour,
                            10 * (ep1["timestamp"].dt.minute // 10)])["value"].mean()
    got_map = {(r[1], r[2]): r[3] for r in got}
    for (h, m10), v in expected.items():
        assert abs(got_map[(h, float(m10))] - v) < 1e-6


def test_windpower_multi_signal_sync(wind_engine):
    """reference multi-series variant: three signals synchronized on
    ?t, averaged per 10-minute bucket, all 8 turbines."""
    df = wind_engine.query(BENCH_PREFIX + "SELECT ?wtur_label ?hour ?minute_10 "
        "(AVG(?val_prod) AS ?prod) (AVG(?val_speed) AS ?speed) "
        "(AVG(?val_dir) AS ?dir) WHERE {" + CHAIN + """
        ?generator otit:hasTimeseries ?ts_prod .
        ?ts_prod rdfs:label "Production" .
        ?ts_prod otit:hasDataPoint ?dp_prod .
        ?dp_prod otit:hasValue ?val_prod .
        ?dp_prod otit:hasTimestamp ?t .
        ?generator otit:hasTimeseries ?ts_speed .
        ?ts_speed rdfs:label "WindSpeed" .
        ?ts_speed otit:hasDataPoint ?dp_speed .
        ?dp_speed otit:hasValue ?val_speed .
        ?dp_speed otit:hasTimestamp ?t .
        ?generator otit:hasTimeseries ?ts_dir .
        ?ts_dir rdfs:label "WindDirection" .
        ?ts_dir otit:hasDataPoint ?dp_dir .
        ?dp_dir otit:hasValue ?val_dir .
        ?dp_dir otit:hasTimestamp ?t .
        BIND(10 * FLOOR(MINUTES(?t) / 10.0) AS ?minute_10)
        BIND(HOURS(?t) AS ?hour)
    } GROUP BY ?wtur_label ?hour ?minute_10""")
    got = rows(df)
    # 8 turbines x 48 buckets
    assert len(got) == 8 * 48
    # spot-check: synchronized rows average the same buckets independently
    pdf = _series_frame()
    for sig, col_idx in (("ep3", 3), ("wsp3", 4), ("wdir3", 5)):
        s = pdf[pdf["id"] == sig]
        first_bucket = s[s["timestamp"] < "2022-08-01 00:10:00"]["value"].mean()
        row = next(r for r in got if r[0] == "A3" and r[1] == 0 and r[2] == 0.0)
        assert abs(row[col_idx] - first_bucket) < 1e-6


def test_windpower_reference_query_shapes(wind_engine):
    """The module's CANONICAL queries — the exact reference SELECT shape
    with full calendar keys and the time-window FILTER
    (query_execution_benchmark_case.rs:90-124) — against a pandas
    oracle: 2h window -> 12 buckets for A1, values match to 1e-6, and
    the multi-sync variant returns 8 x 48 keyed rows."""
    df = wind_engine.query(query_10min_avg(
        t_lo="2022-08-01T03:00:00", t_hi="2022-08-01T04:59:59"))
    got = rows(df)
    assert len(got) == 12
    assert all(r[0] == "Wind Mountain" and r[1] == "A1"
               and (r[2], r[3], r[4]) == (2022, 8, 1) for r in got)
    pdf = _series_frame()
    ep1 = pdf[(pdf["id"] == "ep1")
              & (pdf["timestamp"] >= "2022-08-01 03:00:00")
              & (pdf["timestamp"] <= "2022-08-01 04:59:59")].copy()
    expected = ep1.groupby([ep1["timestamp"].dt.hour,
                            10 * (ep1["timestamp"].dt.minute // 10)])[
        "value"].mean()
    got_map = {(r[5], r[6]): r[7] for r in got}
    for (h, m10), v in expected.items():
        assert abs(got_map[(h, float(m10))] - v) < 1e-6

    multi = wind_engine.query(query_multi_sync())
    assert multi.count() == 8 * 48
