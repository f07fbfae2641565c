"""DSL (path query language) tests — parser unit tests mirroring
dsl/tests/ts_queries.rs, plus end-to-end execution through the Engine
(the reference only golden-tests the generated SPARQL; we run it)."""

import io

import pandas as pd
import pytest

from otit_swt_spark.dsl import Translator, parse_ts_query
from otit_swt_spark.dsl.ast import Connective, LiteralValue, PathElement
from otit_swt_spark.engine import Engine
from otit_swt_spark.graph import GraphStore
from otit_swt_spark.terms import XSD_UNSIGNED_INT
from otit_swt_spark.timeseries import in_memory_timeseries

from conftest import TS1_CSV, TS2_CSV, rows

TYPES = "http://example.org/types#"

DSL_KG = """
PREFIX case: <http://example.org/case#>
PREFIX types: <http://example.org/types#>
PREFIX otit_swt: <https://github.com/magbak/otit_swt#>
PREFIX xsd: <http://www.w3.org/2001/XMLSchema#>
INSERT DATA {
    case:w1 a types:BigW .
    types:BigW types:hasName "ABC" .
    case:w1 types:hasName "ABC1" .
    case:w1 types:hasOneDashRelation case:valve1 .
    case:valve1 types:hasName "HLV" .
    case:valve1 types:hasOnePeriodRelation case:mvm1 .
    case:mvm1 types:hasName "Mvm" .
    case:mvm1 types:hasOnePeriodRelation case:stval1 .
    case:stval1 types:hasName "stVal" .
    case:stval1 otit_swt:hasTimeseries case:myTs1 .
    case:myTs1 otit_swt:hasExternalId "ts1" .
    case:myTs1 otit_swt:hasDatatype xsd:unsignedInt .
    case:valve1 types:hasOnePeriodRelation case:pos1 .
    case:pos1 types:hasName "PosPct" .
    case:pos1 types:hasOnePeriodRelation case:mag1 .
    case:mag1 types:hasName "mag" .
    case:mag1 otit_swt:hasTimeseries case:myTs2 .
    case:myTs2 otit_swt:hasExternalId "ts2" .
    case:myTs2 otit_swt:hasDatatype xsd:unsignedInt .
}
"""


@pytest.fixture(scope="module")
def dsl_engine(spark):
    graph = GraphStore.from_sparql_insert(spark, DSL_KG)
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
    return Engine(spark, graph).add_timeseries_table(ts)


@pytest.fixture(scope="module")
def translator():
    return Translator(
        name_template=[("?replace_variable", f"<{TYPES}hasName>", '"replace_str"')],
        type_name_template=[
            ("?replace_variable",
             "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>", "?tv"),
            ("?tv", f"<{TYPES}hasName>", '"replace_str"'),
        ],
        connective_mapping={
            "-": TYPES + "hasOneDashRelation",
            ".": TYPES + "hasOnePeriodRelation",
        },
    )


# -- parser ----------------------------------------------------------------

def test_parse_basic_query():
    q = parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal"
    [valve]."PosPct"."mag"
    from 2021-12-01T00:00:01+01:00
    to 2021-12-02T00:00:01+01:00
    group valve
    aggregate mean 10min
    """)
    assert len(q.paths) == 2
    p0 = q.paths[0].path.elements
    assert p0[0] == PathElement(glue=None, name=None, type_name="ABC")
    assert p0[1] == Connective("-", 1)
    assert p0[2] == PathElement(glue="valve", name="HLV", type_name=None)
    assert p0[3] == Connective(".", 1)
    assert q.group.var_names == ["valve"]
    assert q.aggregation.function_name == "mean"
    assert q.aggregation.duration_seconds == 600
    assert q.from_datetime.isoformat() == "2021-12-01T00:00:01+01:00"


def test_parse_conditions_and_optional():
    q = parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal" = true
    [valve]."PosPct"."mag" > 0.7
    [valve]."Extra"."sig" ?
    """)
    assert q.paths[0].op == "="
    assert q.paths[0].rhs == LiteralValue(True, "boolean")
    assert q.paths[1].op == ">"
    assert q.paths[1].rhs == LiteralValue(0.7, "real")
    assert q.paths[2].path.optional
    assert q.paths[2].op is None


def test_parse_connective_levels():
    q = parse_ts_query('ABC--"X"."y"')
    assert q.paths[0].path.elements[1] == Connective("-", 2)


# -- translation + execution ----------------------------------------------

def test_dsl_two_paths_sync_join(dsl_engine, translator):
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal"
    [valve]."PosPct"."mag"
    """))
    df = dsl_engine.query(sparql)
    got = rows(df)
    # 8 shared timestamps; both paths joined on ?timestamp
    assert len(got) == 8
    pn1 = "ABC1-HLV.Mvm.stVal"
    pn2 = "HLV.PosPct.mag"
    assert all(r[0] == pn1 and r[1] == pn2 for r in got)
    # ts1 + ts2 values co-occur per timestamp
    vals = {(int(r[2]), int(r[3])) for r in got}
    assert (1, 2) in vals and (301, 201) in vals


def test_dsl_from_to_filter(dsl_engine, translator):
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal"
    from 2022-06-01T08:46:55
    to 2022-06-01T08:46:57
    """))
    df = dsl_engine.query(sparql)
    got = rows(df)
    assert len(got) == 3
    assert {int(r[1]) for r in got} == {301, 102, 303}


def test_dsl_condition(dsl_engine, translator):
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal" > 150
    """))
    df = dsl_engine.query(sparql)
    assert {int(r[1]) for r in rows(df)} == {301, 303, 304}


def test_dsl_aggregate_mean(dsl_engine, translator):
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal"
    aggregate mean 4s
    """))
    df = dsl_engine.query(sparql)
    got = rows(df)
    # 8 points at 1s cadence -> two 4s buckets: avg(1,10,100,301)=103,
    # avg(102,303,304,105)=203.5
    assert len(got) == 2
    assert {float(r[1]) for r in got} == {103.0, 203.5}


def test_dsl_group(dsl_engine, translator):
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal"
    [valve]."PosPct"."mag"
    group valve
    """))
    df = dsl_engine.query(sparql)
    got = rows(df)
    # grouped on the valve glue path (one valve) x 8 timestamps
    assert len(got) == 8
    # nested values are collected lists
    r0 = got[0]
    assert isinstance(r0[-2], list) or hasattr(r0[-2], "__len__")


def test_dsl_optional_path(dsl_engine, translator):
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal"
    [valve]."NoSuch"."missing" ?
    """))
    df = dsl_engine.query(sparql)
    got = rows(df)
    assert len(got) == 8  # left side survives, optional side null


def test_dsl_like_condition(dsl_engine, translator):
    # 'like' translates to REGEX(STR(?value), pattern)
    sparql = translator.translate(parse_ts_query('''
    ABC-[valve]"HLV"."Mvm"."stVal" like "30."
    '''))
    df = dsl_engine.query(sparql)
    got = {int(r[1]) for r in rows(df)}
    assert got == {301, 303, 304}


def test_dsl_type_and_name_constraint():
    q = parse_ts_query('''
    "HLV":Valve."Mvm"
    ''')
    el = q.paths[0].path.elements[0]
    assert el.name == "HLV" and el.type_name == "Valve"


def test_parse_colon_connective():
    q = parse_ts_query('ABC:"X"."y"')
    assert q.paths[0].path.elements[1] == Connective(":", 1)
    assert q.paths[0].path.elements[1].name_part() == "Colon"


def test_dsl_multi_glue_group(dsl_engine, translator):
    """Grouping on TWO glue names: one per path level (reference group.rs
    handles arbitrarily many group variables)."""
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV".[mv]"Mvm"."stVal"
    [valve]."PosPct"."mag"
    group valve mv
    """))
    df = dsl_engine.query(sparql)
    got = rows(df)
    # one (valve, mv) combination x 8 timestamps
    assert len(got) == 8


def test_dsl_optional_path_with_condition(dsl_engine, translator):
    """A condition on an optional path filters inside the OPTIONAL block:
    left rows survive, optional values are restricted."""
    sparql = translator.translate(parse_ts_query("""
    ABC-[valve]"HLV"."Mvm"."stVal"
    [valve]."PosPct"."mag" > 203 ?
    """))
    assert "OPTIONAL" in sparql and "FILTER" in sparql
    df = dsl_engine.query(sparql)
    got = rows(df)
    # the join is on shared ?timestamp: all 8 left rows appear; mag values
    # beyond 203 bind, earlier timestamps null-pad
    assert len(got) == 8
    mag_idx = [i for i, c in enumerate(df.columns) if "mag" in c and "value" in c]
    assert mag_idx, df.columns
    vals = {r[mag_idx[0]] for r in got}
    assert None in vals
    assert {v for v in vals if v is not None} == {204.0, 206.0}


def test_engine_default_translator_parity(dsl_engine, translator):
    """Engine.name_predicate + connective_mapping build the reference's
    default templates (py_otit_swt_query lib.rs:122-159) — same results as
    an explicitly constructed Translator."""
    q = """
    [w]"widget1".sensor
    from 2022-01-01T00:00:00
    to 2022-01-01T01:00:00
    """
    explicit = dsl_engine.execute_dsl_query(q, translator)
    implicit = (dsl_engine
                .name_predicate(TYPES + "hasName")
                .connective_mapping({
                    "-": TYPES + "hasOneDashRelation",
                    ".": TYPES + "hasOnePeriodRelation"})
                .execute_dsl_query(q))
    assert sorted(explicit.columns) == sorted(implicit.columns)
    assert sorted(map(tuple, explicit.collect())) == \
        sorted(map(tuple, implicit.collect()))
