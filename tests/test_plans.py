"""Plan-shape assertions — the Spark analog of the reference's
rewrite-assertion tests (hybrid/tests/rewrites.rs): instead of asserting a
rewritten SPARQL string, assert the physical/optimized plan has the shape
the operator mapping promises (semi/anti joins, pruned scans, partition
filters on the predicate-partitioned triple store)."""

import pytest
from pyspark.sql import functions as F

from otit_swt_spark.engine import Engine
from otit_swt_spark.graph import GraphStore

PREFIXES = """
PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>
PREFIX otit_swt:<https://github.com/magbak/otit_swt#>
PREFIX types:<http://example.org/types#>
"""


def optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def physical(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_compiles_to_semi_join(engine):
    df = engine.query(PREFIXES + """
    SELECT ?w WHERE {
        ?w types:hasSensor ?s .
        FILTER EXISTS { ?w a types:BigWidget }
    }""")
    assert "LeftSemi" in optimized(df)


def test_not_exists_compiles_to_anti_join(engine):
    df = engine.query(PREFIXES + """
    SELECT ?w WHERE {
        ?w types:hasSensor ?s .
        FILTER NOT EXISTS { ?w a types:BigWidget }
    }""")
    assert "LeftAnti" in optimized(df)


def test_minus_compiles_to_anti_join(engine):
    df = engine.query(PREFIXES + """
    SELECT ?w WHERE {
        ?w types:hasSensor ?s .
        MINUS { ?w a types:SmallWidget . }
    }""")
    assert "LeftAnti" in optimized(df)


def test_optional_simple_compiles_to_left_outer(engine):
    """A filter-free OPTIONAL takes the left_outer fast path: one join on
    the shared variables, left subtree evaluated once."""
    df = engine.query(PREFIXES + """
    SELECT ?w ?x WHERE {
        ?w types:hasSensor ?s .
        OPTIONAL { ?w types:hasSomething ?x }
    }""")
    assert "LeftOuter" in optimized(df)


def test_optional_with_filter_compiles_to_conditional_left_outer(spark):
    """OPTIONAL{.. FILTER(e)} folds the filter into the outer-join
    condition (LeftJoin(Ω1,Ω2,e) ≡ LEFT OUTER JOIN ON compat AND e): one
    join, left subtree evaluated once, no row-id window, no Union — the
    shape that survives a fact-scale left side. The general matched∪anti
    form remains only for correlated right sides / EXISTS filters."""
    from tests.conftest import TESTDATA_SPARQL

    eng = Engine(spark, GraphStore.from_sparql_insert(spark, TESTDATA_SPARQL))
    df = eng.query(PREFIXES + """
    SELECT ?w ?x WHERE {
        ?w types:hasSensor ?s .
        OPTIONAL { ?w types:hasSomething ?x
                   FILTER(STRSTARTS(STR(?x), "http")) }
    }""")
    plan = optimized(df)
    assert "LeftOuter" in plan
    assert "Union" not in plan
    assert "InMemoryRelation" not in plan
    assert "window" not in plan.lower()
    got = {tuple(r) for r in df.collect()}
    assert got == {("http://example.org/case#myWidget1",
                    "http://example.org/case#mySomething1"),
                   ("http://example.org/case#myWidget2", None)}


def test_predicate_partitioned_store_prunes(spark, engine, tmp_path):
    """Write the KG predicate-partitioned, reload, and check a BGP scan
    only reads the matching predicate partitions (PartitionFilters) —
    the triple-store scale path: per-predicate vertical partitioning."""
    path = str(tmp_path / "kg_by_p")
    engine.graph.write_parquet(path, partition_by_predicate=True)
    g2 = GraphStore.read_parquet(spark, path)
    eng2 = Engine(spark, g2)
    df = eng2.query(PREFIXES + "SELECT ?a ?b WHERE { ?a types:hasSensor ?b }")
    plan = physical(df)
    assert "PartitionFilters" in plan
    assert "hasSensor" in plan
    got = {tuple(r) for r in df.collect()}
    assert len(got) == 2


def test_filter_pushdown_reaches_scan(spark):
    """Timestamp predicates on a parquet-backed TS table reach the scan
    (PushedFilters), the Spark-native form of the reference's
    ValueConditions pushdown."""
    from otit_swt_spark.tpch_graph import build_engine

    eng = build_engine(spark, "/root/testdata/sf0.001")
    df = eng.query(PREFIXES + """
    SELECT ?v WHERE {
        ?u otit_swt:hasTimeseries ?ts .
        ?ts otit_swt:hasDataPoint ?dp .
        ?dp otit_swt:hasTimestamp ?t .
        ?dp otit_swt:hasValue ?v .
        FILTER(?v > 50.0)
    }""")
    plan = physical(df)
    assert "PushedFilters: [" in plan and "GreaterThan(value,50.0)" in plan


def test_streaming_sink_partition_pruning(spark, tmp_path):
    """Timestamp-derived predicates on the streaming sink's year/month/day
    layout become PartitionFilters — the streaming analog of the
    reference's partitioning_support rewrite."""
    import pandas as pd
    from otit_swt_spark.streaming import (
        read_timeseries_stream, to_timeseries_sink, windowed_downsample)

    src, sink, ckpt = (str(tmp_path / d) for d in ("src", "sink", "ckpt"))
    ts = pd.date_range("2024-01-01", periods=600, freq="10min")  # ~4 days
    spark.createDataFrame(pd.DataFrame({
        "id": ["s"] * 600, "timestamp": ts,
        "value": [1.0] * 600})).coalesce(1).write.parquet(src)
    q = to_timeseries_sink(
        windowed_downsample(read_timeseries_stream(spark, src),
                            interval="1 hour", watermark="1 minute"),
        sink, ckpt, available_now=True)
    q.awaitTermination(120)

    out = spark.read.parquet(sink).filter(
        (F.col("year") == 2024) & (F.col("month") == 1) & (F.col("day") == 2))
    plan = physical(out)
    assert "PartitionFilters" in plan and "day" in plan
    assert out.count() == 24  # one closed 1h window per hour of Jan 2


def test_optional_filter_fail_null_pads(spark):
    """A right match that fails the OPTIONAL filter null-pads rather than
    dropping the left row (Diff semantics, SPARQL 1.1 §15.3)."""
    from tests.conftest import TESTDATA_SPARQL

    eng = Engine(spark, GraphStore.from_sparql_insert(spark, TESTDATA_SPARQL))
    df = eng.query(PREFIXES + """
    SELECT ?w ?x WHERE {
        ?w types:hasSensor ?s .
        OPTIONAL { ?w types:hasSomething ?x
                   FILTER(STRSTARTS(STR(?x), "zzz")) }
    }""")
    got = {tuple(r) for r in df.collect()}
    assert got == {("http://example.org/case#myWidget1", None),
                   ("http://example.org/case#myWidget2", None)}


def test_optional_filter_on_left_variable(spark):
    """The OPTIONAL filter may reference left-side variables: the join
    condition spans both scopes (reference threads the left solution
    through, combiner.rs:106-127)."""
    from tests.conftest import TESTDATA_SPARQL

    eng = Engine(spark, GraphStore.from_sparql_insert(spark, TESTDATA_SPARQL))
    df = eng.query(PREFIXES + """
    SELECT ?w ?x WHERE {
        ?w types:hasSensor ?s .
        OPTIONAL { ?w types:hasSomething ?x
                   FILTER(?s = <http://example.org/case#mySensor1>) }
    }""")
    got = {tuple(r) for r in df.collect()}
    assert got == {("http://example.org/case#myWidget1",
                    "http://example.org/case#mySomething1"),
                   ("http://example.org/case#myWidget2", None)}


def test_sparql_timestamp_filter_prunes_date_partitions(spark, tmp_path):
    """A SPARQL FILTER on the data-point timestamp over a year/month/day-
    partitioned TS table derives hidden partition predicates
    (compiler._partition_prune_predicates — partitioning_support.rs parity)
    that Catalyst turns into PartitionFilters on the scan."""
    import pandas as pd
    from otit_swt_spark.timeseries import TimeSeriesTable
    from tests.conftest import TESTDATA_SPARQL

    ts = pd.date_range("2023-12-30", periods=8, freq="D")
    pdf = pd.DataFrame({
        "id": ["ts1"] * 8, "timestamp": ts, "value": [float(i) for i in range(8)],
        "year": ts.year, "month": ts.month, "day": ts.day,
    })
    path = str(tmp_path / "ts_part")
    (spark.createDataFrame(pdf).write.partitionBy("year", "month", "day")
     .parquet(path))
    table = TimeSeriesTable(path=path, year_column="year",
                            month_column="month", day_column="day")
    eng = Engine(spark, GraphStore.from_sparql_insert(spark, TESTDATA_SPARQL))
    eng.add_timeseries_table(table)
    df = eng.query(PREFIXES + """
    SELECT ?t ?v WHERE {
        ?ts otit_swt:hasExternalId "ts1" .
        ?ts otit_swt:hasDataPoint ?dp .
        ?dp otit_swt:hasTimestamp ?t .
        ?dp otit_swt:hasValue ?v .
        FILTER(?t >= "2024-01-02T00:00:00"^^xsd:dateTime &&
               ?t < "2024-01-05T00:00:00"^^xsd:dateTime)
    }""")
    plan = physical(df)
    seg = plan[plan.index("PartitionFilters"):][:600]
    assert "year" in seg  # derived bounds reached the partitioned scan
    got = sorted(r["v"] for r in df.collect())
    assert got == [3.0, 4.0, 5.0]  # Jan 2, 3, 4


def test_bucketed_store_joins_without_shuffle(spark, tmp_path):
    """A subject-bucketed GraphStore runs star-shaped BGP self-joins as
    shuffle-free sort-merge joins (bucket co-location) — the join-side
    scale lever complementing predicate partitioning's scan pruning."""
    import re
    from otit_swt_spark.tpch_graph import build_graph_df

    df = build_graph_df(spark, "/root/testdata/sf0.001")
    g = GraphStore(spark, df).bucketed(
        "kg_bucketed_plan_test", str(tmp_path / "kg_bucketed"), n_buckets=8,
        overwrite=True)
    eng = Engine(spark, g)
    q = eng.query("""
    SELECT ?nation_name ?region WHERE {
        ?n <urn:p:inRegion> ?region .
        ?n <urn:p:name> ?nation_name .
        FILTER(STRSTARTS(STR(?n), "urn:nation:"))
    }""")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q2 = eng.query("""
        SELECT ?nation_name ?r WHERE {
            ?n <urn:p:inRegion> ?r .
            ?n <urn:p:name> ?nation_name .
        }""")
        plan = physical(q2)
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 0
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert q.count() == 25


def test_bucketed_store_reregisters_existing_layout(spark, tmp_path):
    """A bucketed layout written once re-registers in a later session
    (CREATE TABLE over the existing path) — no rewrite, still
    shuffle-free."""
    import re
    from otit_swt_spark.tpch_graph import build_graph_df

    df = build_graph_df(spark, "/root/testdata/sf0.001")
    path = str(tmp_path / "kg_bucketed_reuse")
    GraphStore(spark, df).bucketed("kg_reuse_t1", path, n_buckets=8,
                                   overwrite=True)
    import os
    mtime = max(os.path.getmtime(os.path.join(path, f))
                for f in os.listdir(path))
    # simulate a fresh session: drop the catalog entry, keep the files
    spark.sql("DROP TABLE kg_reuse_t1")
    g2 = GraphStore(spark, df).bucketed("kg_reuse_t1", path, n_buckets=8)
    assert max(os.path.getmtime(os.path.join(path, f))
               for f in os.listdir(path)) == mtime  # not rewritten
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        q = Engine(spark, g2).query("""
        SELECT ?n ?r WHERE { ?n <urn:p:inRegion> ?r . ?n <urn:p:name> ?nm }""")
        assert len(re.findall(r"Exchange hashpartitioning", physical(q))) == 0
        assert q.count() == 25
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_timestamp_offset_literal_prunes_in_utc(spark, tmp_path):
    """A timestamp literal with a non-Z UTC offset must be normalized to
    UTC before its date feeds the partition bound: ?t >= 01:00+02:00 is
    23:00Z the PREVIOUS day, so the previous day's partition must survive
    pruning (the naive .date() used to drop it — silently missing rows)."""
    import pandas as pd
    from otit_swt_spark.timeseries import TimeSeriesTable
    from tests.conftest import TESTDATA_SPARQL

    ts = pd.to_datetime(["2024-01-01 12:00:00", "2024-01-01 23:30:00",
                         "2024-01-02 00:30:00", "2024-01-03 12:00:00"])
    pdf = pd.DataFrame({
        "id": ["ts1"] * 4, "timestamp": ts,
        "value": [1.0, 2.0, 3.0, 4.0],
        "year": ts.year, "month": ts.month, "day": ts.day,
    })
    path = str(tmp_path / "ts_part_tz")
    (spark.createDataFrame(pdf).write.partitionBy("year", "month", "day")
     .parquet(path))
    table = TimeSeriesTable(path=path, year_column="year",
                            month_column="month", day_column="day")
    eng = Engine(spark, GraphStore.from_sparql_insert(spark, TESTDATA_SPARQL))
    eng.add_timeseries_table(table)
    df = eng.query(PREFIXES + """
    SELECT ?t ?v WHERE {
        ?ts otit_swt:hasExternalId "ts1" .
        ?ts otit_swt:hasDataPoint ?dp .
        ?dp otit_swt:hasTimestamp ?t .
        ?dp otit_swt:hasValue ?v .
        FILTER(?t >= "2024-01-02T01:00:00+02:00"^^xsd:dateTime)
    }""")
    got = sorted(r["v"] for r in df.collect())
    # 23:00Z Jan 1 onward: the 23:30 row (day-1 partition) must be included
    assert got == [2.0, 3.0, 4.0]


def test_correlated_ts_optional_has_no_rowid(spark, engine):
    """OPTIONAL that re-binds timestamp/value of a data point chained on the
    left compiles to a projection + conditional null — the physical plan
    must contain NO xxhash row id (the general matched∪anti form) and no
    extra join for the OPTIONAL."""
    df = engine.query(PREFIXES + """
    SELECT ?ts_id ?t ?v ?v2 WHERE {
        ?ts otit_swt:hasExternalId ?ts_id .
        ?ts otit_swt:hasDataPoint ?dp .
        ?dp otit_swt:hasTimestamp ?t .
        ?dp otit_swt:hasValue ?v .
        OPTIONAL { ?dp otit_swt:hasValue ?v2 FILTER(?v2 > 102) }
    }""")
    plan = physical(df)
    assert "xxhash" not in plan
    got = {(r["ts_id"], r["t"], r["v"], r["v2"]) for r in df.collect()}
    # every (ts,t,v) row survives; v2 bound only where value > 102
    all_rows = engine.query(PREFIXES + """
    SELECT ?ts_id ?t ?v WHERE {
        ?ts otit_swt:hasExternalId ?ts_id .
        ?ts otit_swt:hasDataPoint ?dp .
        ?dp otit_swt:hasTimestamp ?t .
        ?dp otit_swt:hasValue ?v .
    }""").collect()
    expect = {(r["ts_id"], r["t"], r["v"], r["v"] if r["v"] > 102 else None)
              for r in all_rows}
    assert got == expect and len(got) == len(all_rows)


def test_decontaminate_broadcasts_benchmark(spark):
    """The benchmark gram set must reach the corpus as a broadcast-hash
    join (no corpus-side shuffle before the match)."""
    from otit_swt_spark.pipelines.decontam import decontaminate

    docs = spark.createDataFrame(
        [(i, f"some words number {i} repeated here") for i in range(50)],
        "doc_id long, text string")
    bench = docs.limit(3)
    plan = physical(decontaminate(docs, bench, n=3))
    # the gram-match join against the benchmark set must be broadcast;
    # (the final count join-back on the doc id may be sort-merge — that
    # side is |matches|-sized, not corpus-sized)
    assert "BroadcastHashJoin" in plan


def test_lm_scoring_joins_are_broadcast(spark):
    from otit_swt_spark.pipelines.lm_quality import score_docs, train_char_lm

    docs = spark.createDataFrame(
        [(i, "plain text content") for i in range(20)],
        "doc_id long, text string")
    model = train_char_lm(docs, n=3)
    plan = physical(score_docs(docs, model, n=3))
    assert plan.count("BroadcastHashJoin") >= 2     # gram + context models


def test_stateless_corpus_ops_add_no_exchange(spark):
    """PII scrub and repetition stats are single-projection map-side ops —
    zero exchanges in the plan."""
    from otit_swt_spark.pipelines.pii import scrub_pii
    from otit_swt_spark.pipelines.textstats import repetition_stats

    docs = spark.createDataFrame(
        [(1, "text with spam spam content")], "doc_id long, text string")
    assert "Exchange" not in physical(repetition_stats(scrub_pii(docs)))


def test_rolling_stats_single_exchange(spark):
    from datetime import datetime
    from otit_swt_spark.timeseries import rolling_stats

    df = spark.createDataFrame(
        [("a", datetime(2024, 1, 1), 1.0)],
        "id string, timestamp timestamp, value double")
    assert physical(rolling_stats(df)).count("Exchange") == 1


def test_bgp_selectivity_reorder(spark):
    """A huge-predicate pattern written first is reordered behind selective
    connected patterns; unknown counts keep the written order."""
    from otit_swt_spark.sparql import algebra as A
    from otit_swt_spark.sparql.compiler import Compiler
    from otit_swt_spark.sparql.algebra import IRI, Variable

    cat = {"urn:big": {"dt": None, "mixed": False, "n": 1_000_000},
           "urn:mid": {"dt": None, "mixed": False, "n": 10_000},
           "urn:tiny": {"dt": None, "mixed": False, "n": 5}}
    comp = Compiler(spark, spark.range(0).selectExpr("'x' s", "'y' p", "'z' o"),
                    pred_datatypes=lambda: cat)
    v = Variable
    pats = [
        A.TriplePattern(v("a"), IRI("urn:big"), v("b")),
        A.TriplePattern(v("b"), IRI("urn:mid"), v("c")),
        A.TriplePattern(v("c"), IRI("urn:tiny"), v("d")),
    ]
    got = [tp.p.value for tp in comp._order_patterns(pats)]
    # tiny first, then its connected mid, then big
    assert got == ["urn:tiny", "urn:mid", "urn:big"]

    # constant object boosts selectivity: big with a bound object wins
    pats2 = [
        A.TriplePattern(v("a"), IRI("urn:mid"), v("b")),
        A.TriplePattern(v("a"), IRI("urn:big"), IRI("urn:thing")),
    ]
    # len < 3 -> untouched (written order respected for short BGPs)
    assert comp._order_patterns(pats2) == pats2

    # unknown predicate count -> no reordering
    pats3 = pats + [A.TriplePattern(v("d"), IRI("urn:unknown"), v("e"))]
    cat_no_n = {k: {"dt": None, "mixed": False} for k in cat}
    comp2 = Compiler(spark, spark.range(0).selectExpr("'x' s", "'y' p", "'z' o"),
                     pred_datatypes=lambda: cat_no_n)
    assert comp2._order_patterns(pats) == pats
    assert [tp.p.value for tp in comp._order_patterns(pats3)][:1] != ["urn:unknown"]


def test_bgp_reorder_shapes_join_tree(spark):
    """End-to-end: a worst-order-written query compiles to a join tree that
    starts from the most selective predicate (its scan prints before the
    hot predicate's in the left-deep plan)."""
    from otit_swt_spark.engine import Engine
    from otit_swt_spark.graph import GraphStore

    lines = []
    for i in range(800):
        lines.append(f"<urn:x{i}> <urn:big> <urn:y{i % 40}> .")
    for i in range(40):
        lines.append(f"<urn:y{i}> <urn:mid> <urn:z{i % 10}> .")
    for i in range(2):
        lines.append(f"<urn:z{i}> <urn:tiny> <urn:w{i}> .")
    store = GraphStore.from_ntriples(spark, "\n".join(lines))
    eng = Engine(spark, store)
    df = eng.query("""
        SELECT ?a ?d WHERE {
            ?a <urn:big> ?b .
            ?b <urn:mid> ?c .
            ?c <urn:tiny> ?d .
        }""")
    plan = optimized(df)
    assert plan.index("urn:tiny") < plan.index("urn:big")
    assert df.count() == 160            # 2 z * 4 mid-y each * 20 big-x each
