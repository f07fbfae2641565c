"""Build a knowledge graph + time-series registration from the driver's
synthetic TPC-H-ish tables, so the SPARQL engine can be oracle-checked
against plain SQL over the same parquet.

Graph model (all URNs deterministic from keys):
  urn:region:{r_regionkey}    urn:p:name -> r_name
  urn:nation:{n_nationkey}    urn:p:name -> n_name ; urn:p:inRegion -> region
  urn:cust:{c_custkey}        urn:p:name, urn:p:acctbal, urn:p:segment,
                              urn:p:inNation -> nation
  urn:supp:{s_suppkey}        urn:p:name, urn:p:acctbal, urn:p:inNation
  urn:user:{user_id}          rdf:type urn:t:User ;
                              otit_swt:hasTimeseries urn:ts:{user_id}
  urn:ts:{user_id}            otit_swt:hasExternalId "{user_id}" ;
                              otit_swt:hasDatatype xsd:double

The events table doubles as the external time-series store
(id=user_id, timestamp=ts, value=value), mirroring the reference's
TimeSeriesTable declaration (timeseries_sql_rewrite.rs:90-100).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from otit_swt_spark.engine import Engine
from otit_swt_spark.graph import GraphStore
from otit_swt_spark.terms import (
    HAS_DATATYPE,
    HAS_EXTERNAL_ID,
    HAS_TIMESERIES,
    RDF_TYPE,
    XSD_DOUBLE,
    XSD_STRING,
)
from otit_swt_spark.timeseries import TimeSeriesTable

P_NAME = "urn:p:name"


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet carries TIMESTAMP(NANOS), which Spark's vectorized
    parquet reader rejects; read nanos as long and convert to a proper
    timestamp (micro precision) — stays entirely JVM-side.

    The converted table is materialized once per scale factor into a local
    cache dir: comparing `timestamp_micros(floor(ts/1000))` to a literal
    defeats parquet predicate pushdown on every scan, whereas the normalized
    copy gets plain `ts >= literal` PushedFilters (and at cluster scale this
    is the land-raw -> normalize ETL step you would run anyway)."""
    import os
    import tempfile

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") != "bigint":
        return df
    tag = sf_dir.strip("/").replace("/", "_")
    cache = os.path.join(tempfile.gettempdir(), "otit_swt_spark_cache",
                         f"events_{tag}.parquet")
    if not os.path.exists(cache):
        conv = df.withColumn(
            "ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
        conv.write.mode("overwrite").parquet(cache)
    return spark.read.parquet(cache)
P_IN_REGION = "urn:p:inRegion"
P_IN_NATION = "urn:p:inNation"
P_ACCTBAL = "urn:p:acctbal"
P_SEGMENT = "urn:p:segment"
T_USER = "urn:t:User"


def _iri_triples(df: DataFrame, s: F.Column, p: str, o: F.Column) -> DataFrame:
    return df.select(
        s.alias("s"), F.lit(p).alias("p"), o.alias("o_iri"),
        F.lit(None).cast("string").alias("o_lex"),
        F.lit(None).cast("string").alias("o_dt"),
        F.lit(None).cast("string").alias("o_lang"),
    )


def _lit_triples(df: DataFrame, s: F.Column, p: str, o: F.Column, dt: str) -> DataFrame:
    return df.select(
        s.alias("s"), F.lit(p).alias("p"),
        F.lit(None).cast("string").alias("o_iri"),
        o.cast("string").alias("o_lex"),
        F.lit(dt).alias("o_dt"),
        F.lit(None).cast("string").alias("o_lang"),
    )


def region_iri(c):
    return F.concat(F.lit("urn:region:"), c.cast("string"))


def nation_iri(c):
    return F.concat(F.lit("urn:nation:"), c.cast("string"))


def cust_iri(c):
    return F.concat(F.lit("urn:cust:"), c.cast("string"))


def supp_iri(c):
    return F.concat(F.lit("urn:supp:"), c.cast("string"))


def user_iri(c):
    return F.concat(F.lit("urn:user:"), c.cast("string"))


P_BY_CUSTOMER = "urn:p:byCustomer"
P_TOTALPRICE = "urn:p:totalprice"
P_PRIORITY = "urn:p:priority"


def order_iri(c):
    return F.concat(F.lit("urn:order:"), c.cast("string"))


def build_graph_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    events = load_events(spark, sf_dir)
    # The user dimension is derived from the tall events table; persist it so
    # the four bridge-triple branches (rdf:type / hasTimeseries /
    # hasExternalId / hasDatatype) reuse one distinct scan instead of four
    # full passes over events. It is one row per sensor — tiny at any scale.
    users = events.select("user_id").distinct().persist()

    XSD_DEC = "http://www.w3.org/2001/XMLSchema#double"
    parts = [
        _lit_triples(region, region_iri(F.col("r_regionkey")), P_NAME, F.col("r_name"), XSD_STRING),
        _lit_triples(nation, nation_iri(F.col("n_nationkey")), P_NAME, F.col("n_name"), XSD_STRING),
        _iri_triples(nation, nation_iri(F.col("n_nationkey")), P_IN_REGION, region_iri(F.col("n_regionkey"))),
        _lit_triples(customer, cust_iri(F.col("c_custkey")), P_NAME, F.col("c_name"), XSD_STRING),
        _lit_triples(customer, cust_iri(F.col("c_custkey")), P_ACCTBAL, F.col("c_acctbal"), XSD_DEC),
        _lit_triples(customer, cust_iri(F.col("c_custkey")), P_SEGMENT, F.col("c_mktsegment"), XSD_STRING),
        _iri_triples(customer, cust_iri(F.col("c_custkey")), P_IN_NATION, nation_iri(F.col("c_nationkey"))),
        _lit_triples(supplier, supp_iri(F.col("s_suppkey")), P_NAME, F.col("s_name"), XSD_STRING),
        _lit_triples(supplier, supp_iri(F.col("s_suppkey")), P_ACCTBAL, F.col("s_acctbal"), XSD_DEC),
        _iri_triples(supplier, supp_iri(F.col("s_suppkey")), P_IN_NATION, nation_iri(F.col("s_nationkey"))),
        _iri_triples(users, user_iri(F.col("user_id")), RDF_TYPE, F.lit(T_USER)),
        _iri_triples(users, user_iri(F.col("user_id")), HAS_TIMESERIES,
                     F.concat(F.lit("urn:ts:"), F.col("user_id").cast("string"))),
        _lit_triples(users, F.concat(F.lit("urn:ts:"), F.col("user_id").cast("string")),
                     HAS_EXTERNAL_ID, F.col("user_id"), XSD_STRING),
        _iri_triples(users, F.concat(F.lit("urn:ts:"), F.col("user_id").cast("string")),
                     HAS_DATATYPE, F.lit(XSD_DOUBLE)),
        # fact-sized branch: orders (the graph's scale test — BGP joins over
        # hundreds of thousands of subjects, not just dimensions)
        _iri_triples(orders, order_iri(F.col("o_orderkey")), P_BY_CUSTOMER,
                     cust_iri(F.col("o_custkey"))),
        _lit_triples(orders, order_iri(F.col("o_orderkey")), P_TOTALPRICE,
                     F.col("o_totalprice"), XSD_DEC),
        _lit_triples(orders, order_iri(F.col("o_orderkey")), P_PRIORITY,
                     F.col("o_orderpriority"), XSD_STRING),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_ENGINE_CACHE: dict[tuple[str, str], Engine] = {}


def build_engine(spark: SparkSession, sf_dir: str) -> Engine:
    """Memoized per (application, sf_dir): the KG plan and the persisted
    user dimension are reusable across queries in one session."""
    key = (spark.sparkContext.applicationId, sf_dir)
    cached = _ENGINE_CACHE.get(key)
    if cached is not None:
        return cached
    engine = _build_engine_uncached(spark, sf_dir)
    _ENGINE_CACHE[key] = engine
    return engine


def _graph_store(spark: SparkSession, sf_dir: str) -> GraphStore:
    """Materialize the KG predicate-partitioned once per scale factor
    (vertical partitioning, S2RDF-style): each BGP triple pattern then
    scans exactly one predicate partition of pre-built term columns instead
    of re-deriving IRIs from the base tables on every pattern."""
    import os
    import tempfile

    tag = sf_dir.strip("/").replace("/", "_")
    cache = os.path.join(tempfile.gettempdir(), "otit_swt_spark_cache",
                         f"kg_{tag}.parquet")
    return GraphStore(spark, build_graph_df(spark, sf_dir)).materialized(cache)


def _build_engine_uncached(spark: SparkSession, sf_dir: str) -> Engine:
    engine = Engine(spark, _graph_store(spark, sf_dir))
    events = load_events(spark, sf_dir)
    engine.add_timeseries_table(
        TimeSeriesTable(
            events,
            identifier_column="user_id",
            timestamp_column="ts",
            value_column="value",
            value_datatype=XSD_DOUBLE,
        )
    )
    # A second, supplier-only graph registered as a SERVICE endpoint:
    # exercises in-process federation (SPARQL 1.1 SERVICE) with an oracle
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    svc = GraphStore(spark, _iri_triples(
        supplier, supp_iri(F.col("s_suppkey")), P_IN_NATION,
        nation_iri(F.col("s_nationkey"))))
    engine.register_service("urn:service:suppliers", svc)
    return engine
