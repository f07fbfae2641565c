"""RDF term-identity and parser-strictness semantics (round-7 review
fixes): joins and DISTINCT respect datatype/language companions, EBV
follows SPARQL 17.2.2, COUNT(DISTINCT *) counts solutions, DATATYPE()
maps native hints, signed numeric literals parse in term positions,
unparsed trailing clauses fail loudly, and query()/update() guard each
other's forms."""

import pytest

from otit_swt_spark import Engine, GraphStore


@pytest.fixture(scope="module")
def eng(spark):
    g = GraphStore.from_sparql_insert(spark, """
        INSERT DATA {
            <urn:a> <urn:p> "urn:b" .
            <urn:b> <urn:q> <urn:c> .
            <urn:a2> <urn:p> <urn:b2> .
            <urn:b2> <urn:q> <urn:c2> .
            <urn:c> <urn:lbl> "x"@en .
            <urn:d> <urn:lbl> "x"@fr .
            <urn:e> <urn:name> "foo" .
            <urn:f> <urn:name> "" .
            <urn:g> <urn:val> 2.5 .
        }""")
    return Engine(spark, g)


def test_join_respects_term_identity(eng):
    # the literal "urn:b" must not join the IRI <urn:b>
    rows = eng.query(
        "SELECT ?x ?z WHERE { ?x <urn:p> ?y . ?y <urn:q> ?z }").collect()
    assert [(r["x"], r["z"]) for r in rows] == [("urn:a2", "urn:c2")]


def test_distinct_respects_language_tags(eng):
    rows = eng.query(
        "SELECT DISTINCT ?o WHERE { ?s <urn:lbl> ?o }").collect()
    assert len(rows) == 2                     # "x"@en and "x"@fr


def test_ebv_of_plain_strings(eng):
    # SPARQL 17.2.2: non-empty string EBV true, empty false — the old
    # try_cast('boolean') dropped BOTH rows
    rows = eng.query(
        "SELECT ?s WHERE { ?s <urn:name> ?n . FILTER(?n) }").collect()
    assert [r["s"] for r in rows] == ["urn:e"]
    rows = eng.query(
        "SELECT ?s WHERE { ?s <urn:name> ?n . FILTER(!?n) }").collect()
    assert [r["s"] for r in rows] == ["urn:f"]


def test_count_distinct_star(eng):
    n = eng.query("""
        SELECT (COUNT(DISTINCT *) AS ?n) WHERE {
            { <urn:e> <urn:name> ?x } UNION { <urn:e> <urn:name> ?x }
        }""").first()["n"]
    assert n == 1                              # duplicate solutions collapse


def test_datatype_of_native_value(eng):
    dt = eng.query("""
        SELECT (DATATYPE(?v) AS ?dt) WHERE { <urn:g> <urn:val> ?v }
        """).first()["dt"]
    assert dt == "http://www.w3.org/2001/XMLSchema#double"


def test_negative_literal_in_pattern_and_values(spark):
    g = GraphStore.from_sparql_insert(spark, """
        INSERT DATA { <urn:n> <urn:v> -5 . <urn:m> <urn:v> 3 . }""")
    e = Engine(spark, g)
    assert [r["s"] for r in
            e.query("SELECT ?s WHERE { ?s <urn:v> -5 }").collect()] \
        == ["urn:n"]
    rows = e.query(
        "SELECT ?s WHERE { ?s <urn:v> ?x . VALUES ?x { -5 } }").collect()
    assert [r["s"] for r in rows] == ["urn:n"]


def test_order_by_constraint_key_and_eof_guard(eng):
    rows = eng.query("""
        SELECT ?o WHERE { ?s <urn:lbl> ?o } ORDER BY lang(?o)
        """).collect()
    assert [r["o"] for r in rows] == ["x", "x"]
    with pytest.raises(SyntaxError, match="unparsed"):
        eng.query("SELECT ?s WHERE { ?s <urn:p> ?o } bogus trailing")


def test_query_rejects_update_forms(eng):
    with pytest.raises(ValueError, match="Update"):
        eng.query("DELETE WHERE { <urn:a> <urn:p> ?x }")


def test_construct_drops_native_literal_subject(spark):
    g = GraphStore.from_sparql_insert(spark, """
        INSERT DATA { <urn:g> <urn:val> 2.5 . }""")
    e = Engine(spark, g)
    out = e.query(
        "CONSTRUCT { ?v <urn:tag> <urn:o> } WHERE { ?s <urn:val> ?v }")
    assert out.count() == 0                    # 3.14-style subjects dropped
