"""The reference's wind-power benchmark workload as a reusable fixture
(hybrid/tests/query_execution_benchmark_case.rs:82-274 + its
query_execution_benchmark_case/ data directory): an RDS/ISO-style
functional-aspect KG — Site -> turbine aspect -> generator system ->
generator — with 8 turbines x 3 signals (Production / WindSpeed /
WindDirection) at 10 s cadence, queried as 10-minute AVG downsamples.

The reference ships 24 CSVs (25 920 points per series = 3 days) plus a
testdata.sparql; this module synthesizes the same SHAPE deterministically
(crc32-seeded numpy streams — stable across processes, unlike built-in
``hash`` which is salted per interpreter), so the golden pytest
(tests/test_benchmark_case.py) and the bench tier (bench.py) share one
definition and need no data files.
"""

from __future__ import annotations

import zlib

from pyspark.sql import SparkSession

from otit_swt_spark.terms import IRI, Literal, XSD_STRING

RDS = "https://github.com/magbak/otit_swt/rds_power#"
WP = "https://github.com/magbak/otit_swt/windpower_example#"
OTIT = "https://github.com/magbak/otit_swt#"
RDFS_LABEL = "http://www.w3.org/2000/01/rdf-schema#label"
RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"

#: signal label -> external-id prefix (the reference's ep/wsp/wdir CSVs)
SIGNALS = {"Production": "ep", "WindSpeed": "wsp", "WindDirection": "wdir"}

#: the reference CSVs hold 3 days @ 10 s = 25 920 points per series
REFERENCE_POINTS = 25_920

BASE_TIMESTAMP = "2022-08-01 00:00:00"


def kg_triples(n_turbines: int = 8) -> list:
    """The functional-aspect KG of testdata.sparql: one Site labeled
    'Wind Mountain', per turbine the A -> RA -> GAA aspect chain, and
    per generator three labeled time series with external ids
    ``{ep,wsp,wdir}{i}``."""
    t = []

    def iri(s, p, o):
        t.append((IRI(s), IRI(p), IRI(o)))

    def lab(s, text):
        t.append((IRI(s), IRI(RDFS_LABEL), Literal(text, IRI(XSD_STRING))))

    site = WP + "WindMountain"
    iri(site, RDF_TYPE, RDS + "Site")
    lab(site, "Wind Mountain")
    for i in range(1, n_turbines + 1):
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


def series_frame(points: int = 2880, n_turbines: int = 8,
                 cadence_s: int = 10):
    """Tall (id, timestamp, value) pandas frame for all
    ``n_turbines x 3`` series: ``points`` samples at ``cadence_s``
    from BASE_TIMESTAMP, values uniform [0, 100) rounded to 3 decimals
    from a crc32(id)-seeded stream — byte-identical in every process."""
    import numpy as np
    import pandas as pd

    base = pd.Timestamp(BASE_TIMESTAMP)
    ts = base + pd.to_timedelta(np.arange(points) * cadence_s, unit="s")
    frames = []
    for i in range(1, n_turbines + 1):
        for label, prefix in SIGNALS.items():
            sid = f"{prefix}{i}"
            rng = np.random.default_rng(zlib.crc32(sid.encode()))
            vals = rng.uniform(0, 100, points).round(3)
            frames.append(pd.DataFrame(
                {"id": sid, "timestamp": ts, "value": vals}))
    return pd.concat(frames, ignore_index=True)


def build_engine(spark: SparkSession, points: int = 2880,
                 n_turbines: int = 8):
    """KG + in-memory tall TS table wired into an Engine — the Spark
    analog of the reference's Engine::new(all_pushdowns(),
    InMemoryTimeseriesDatabase) fixture."""
    from otit_swt_spark.engine import Engine
    from otit_swt_spark.graph import GraphStore
    from otit_swt_spark.timeseries import TimeSeriesTable

    graph = GraphStore.from_triples(spark, kg_triples(n_turbines))
    graph.df = graph.df.cache()
    tall = spark.createDataFrame(series_frame(points, n_turbines))
    eng = Engine(spark, graph)
    eng.add_timeseries_table(TimeSeriesTable(tall))
    return eng


PREFIXES = """
PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>
PREFIX otit:<https://github.com/magbak/otit_swt#>
PREFIX rdfs:<http://www.w3.org/2000/01/rdf-schema#>
PREFIX rds:<https://github.com/magbak/otit_swt/rds_power#>
"""

#: the site -> turbine -> generator functional-aspect walk shared by
#: both benchmark queries (query_execution_benchmark_case.rs:97-112)
ASPECT_CHAIN = """
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


def query_10min_avg(t_lo: str | None = None, t_hi: str | None = None,
                    turbine: str = "A1") -> str:
    """The reference's test_should_pushdown_query (benchmark_case.rs
    :90-124): one turbine's Production signal to 10-minute AVGs keyed
    by the full year/month/day/hour/minute_10 calendar tuple."""
    filt = [f'?site_label = "Wind Mountain"', f'?wtur_label = "{turbine}"']
    if t_lo:
        filt.append(f'?t >= "{t_lo}"^^xsd:dateTime')
    if t_hi:
        filt.append(f'?t <= "{t_hi}"^^xsd:dateTime')
    return (PREFIXES + """
    SELECT ?site_label ?wtur_label ?year ?month ?day ?hour ?minute_10
           (AVG(?val) AS ?avg_val) WHERE {""" + ASPECT_CHAIN + """
        ?generator otit:hasTimeseries ?ts .
        ?ts rdfs:label "Production" .
        ?ts otit:hasDataPoint ?dp .
        ?dp otit:hasValue ?val .
        ?dp otit:hasTimestamp ?t .
        BIND(10 * FLOOR(MINUTES(?t) / 10.0) AS ?minute_10)
        BIND(HOURS(?t) AS ?hour)
        BIND(DAY(?t) AS ?day)
        BIND(MONTH(?t) AS ?month)
        BIND(YEAR(?t) AS ?year)
        FILTER(""" + " && ".join(filt) + """)
    } GROUP BY ?site_label ?wtur_label ?year ?month ?day ?hour ?minute_10""")


def query_multi_sync() -> str:
    """The reference's test_multi_should_pushdown_query (benchmark_case
    .rs:180-235): Production/WindSpeed/WindDirection synchronized on
    ?t per generator, averaged per 10-minute bucket, all turbines."""
    return (PREFIXES + """
    SELECT ?wtur_label ?year ?month ?day ?hour ?minute_10
           (AVG(?val_prod) AS ?prod) (AVG(?val_speed) AS ?speed)
           (AVG(?val_dir) AS ?dir) WHERE {""" + ASPECT_CHAIN + """
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
        BIND(DAY(?t) AS ?day)
        BIND(MONTH(?t) AS ?month)
        BIND(YEAR(?t) AS ?year)
    } GROUP BY ?wtur_label ?year ?month ?day ?hour ?minute_10""")
