"""Wind-power benchmark case, ported from the reference's flagship workload
(hybrid/tests/query_execution_benchmark_case.rs:82-274): an RDS/ISO-style
functional-aspect KG (site -> turbine -> generator system -> generator),
8 turbines x 3 signals at 10 s cadence, 10-minute AVG downsampling, with
and without multi-series synchronization. Data is synthesized
deterministically (the reference ships CSVs; we generate the same shape)."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from otit_swt_spark.engine import Engine
from otit_swt_spark.graph import GraphStore
from otit_swt_spark.terms import IRI, Literal, XSD_STRING
from otit_swt_spark.timeseries import TimeSeriesTable

from conftest import rows

RDS = "https://github.com/magbak/otit_swt/rds_power#"
WP = "https://github.com/magbak/otit_swt/windpower_example#"
OTIT = "https://github.com/magbak/otit_swt#"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

N_TURBINES = 8
POINTS = 2880  # 8 hours @ 10 s per series; 3 signals x 8 turbines = 69k rows

SIGNALS = {"Production": "ep", "WindSpeed": "wsp", "WindDirection": "wdir"}


def _kg_triples():
    t = []

    def iri(s, p, o):
        t.append((IRI(s), IRI(p), IRI(o)))

    def lab(s, text):
        t.append((IRI(s), IRI(RDFS_LABEL), Literal(text, IRI(XSD_STRING))))

    site = WP + "WindMountain"
    iri(site, RDF_TYPE, RDS + "Site")
    lab(site, "Wind Mountain")
    for i in range(1, N_TURBINES + 1):
        wtur_asp = WP + f"A{i}_asp"
        wtur = WP + f"A{i}"
        gensys_asp = WP + f"A{i}_RA_asp"
        gensys = WP + f"A{i}_RA"
        gen_asp = WP + f"A{i}_GAA_asp"
        gen = WP + f"A{i}_GAA"
        iri(site, RDS + "hasFunctionalAspect", wtur_asp)
        lab(wtur_asp, f"A{i}")
        iri(wtur, RDS + "hasFunctionalAspectNode", wtur_asp)
        iri(wtur, RDF_TYPE, RDS + "A")
        iri(wtur, RDS + "hasFunctionalAspect", gensys_asp)
        iri(gensys, RDS + "hasFunctionalAspectNode", gensys_asp)
        iri(gensys, RDF_TYPE, RDS + "RA")
        iri(gensys, RDS + "hasFunctionalAspect", gen_asp)
        iri(gen, RDS + "hasFunctionalAspectNode", gen_asp)
        iri(gen, RDF_TYPE, RDS + "GAA")
        for label, prefix in SIGNALS.items():
            ts = WP + f"ts_{prefix}{i}"
            iri(gen, OTIT + "hasTimeseries", ts)
            lab(ts, label)
            t.append((IRI(ts), IRI(OTIT + "hasExternalId"),
                      Literal(f"{prefix}{i}", IRI(XSD_STRING))))
    return t


def _series_frame():
    base = pd.Timestamp("2022-08-01 00:00:00")
    ts = base + pd.to_timedelta(np.arange(POINTS) * 10, unit="s")
    frames = []
    for i in range(1, N_TURBINES + 1):
        for label, prefix in SIGNALS.items():
            rng = np.random.default_rng(hash((prefix, i)) % (2**32))
            vals = rng.uniform(0, 100, POINTS).round(3)
            frames.append(pd.DataFrame({
                "id": f"{prefix}{i}", "timestamp": ts, "value": vals}))
    return pd.concat(frames, ignore_index=True)


@pytest.fixture(scope="module")
def wind_engine(spark):
    graph = GraphStore.from_triples(spark, _kg_triples())
    graph.df = graph.df.cache()
    tall = spark.createDataFrame(_series_frame())
    eng = Engine(spark, graph)
    eng.add_timeseries_table(TimeSeriesTable(tall))
    return eng


BENCH_PREFIX = """
PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>
PREFIX otit:<https://github.com/magbak/otit_swt#>
PREFIX rdfs:<http://www.w3.org/2000/01/rdf-schema#>
PREFIX rds:<https://github.com/magbak/otit_swt/rds_power#>
"""

CHAIN = """
    ?site a rds:Site .
    ?site rdfs:label ?site_label .
    ?site rds:hasFunctionalAspect ?wtur_asp .
    ?wtur_asp rdfs:label ?wtur_label .
    ?wtur rds:hasFunctionalAspectNode ?wtur_asp .
    ?wtur a rds:A .
    ?wtur rds:hasFunctionalAspect ?gensys_asp .
    ?gensys rds:hasFunctionalAspectNode ?gensys_asp .
    ?gensys a rds:RA .
    ?gensys rds:hasFunctionalAspect ?generator_asp .
    ?generator rds:hasFunctionalAspectNode ?generator_asp .
    ?generator a rds:GAA .
"""


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
