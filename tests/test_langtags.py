"""Language-tagged literal support: parsing, term-identity matching,
LANG/LANGMATCHES/STRLANG/DATATYPE.

Reference stores tags alongside literals (mapper/src/mapping.rs:582-588
literal_struct struct carries language_tag); queries over tagged data follow
SPARQL 1.1 §17.4.2 semantics.
"""

import pytest

from otit_swt_spark.engine import Engine
from otit_swt_spark.graph import GraphStore
from otit_swt_spark.terms import RDF_LANGSTRING
from tests.conftest import rows

LANG_DATA = """
PREFIX ex: <http://example.org/>
PREFIX rdfs: <http://www.w3.org/2000/01/rdf-schema#>
INSERT DATA {
    ex:thing1 rdfs:label "color"@en .
    ex:thing1 rdfs:label "colour"@en-GB .
    ex:thing1 rdfs:label "couleur"@fr .
    ex:thing1 rdfs:label "plain" .
    ex:thing2 rdfs:label "color" .
}
"""

EX = "http://example.org/"
PFX = "PREFIX ex:<http://example.org/> PREFIX rdfs:<http://www.w3.org/2000/01/rdf-schema#>\n"


@pytest.fixture(scope="module")
def lang_engine(spark):
    return Engine(spark, GraphStore.from_sparql_insert(spark, LANG_DATA))


def test_tagged_literal_object_match(lang_engine):
    df = lang_engine.query(PFX + 'SELECT ?s WHERE { ?s rdfs:label "color"@en }')
    assert rows(df) == [(EX + "thing1",)]


def test_plain_literal_does_not_match_tagged(lang_engine):
    # "color" (xsd:string, no tag) must match only thing2's untagged label
    df = lang_engine.query(PFX + 'SELECT ?s WHERE { ?s rdfs:label "color" }')
    assert rows(df) == [(EX + "thing2",)]


def test_tag_match_is_case_insensitive(lang_engine):
    df = lang_engine.query(PFX + 'SELECT ?s WHERE { ?s rdfs:label "colour"@EN-gb }')
    assert rows(df) == [(EX + "thing1",)]


def test_lang_function(lang_engine):
    df = lang_engine.query(
        PFX + "SELECT ?l ?tag WHERE { ex:thing1 rdfs:label ?l BIND(LANG(?l) AS ?tag) }"
    )
    assert rows(df) == sorted(
        [("color", "en"), ("colour", "en-GB"), ("couleur", "fr"), ("plain", "")]
    )


def test_langmatches_primary_subtag(lang_engine):
    # langMatches(.., "en") accepts en and en-GB but not fr or untagged
    df = lang_engine.query(
        PFX
        + 'SELECT ?l WHERE { ex:thing1 rdfs:label ?l FILTER(LANGMATCHES(LANG(?l), "en")) }'
    )
    assert rows(df) == [("color",), ("colour",)]


def test_langmatches_wildcard(lang_engine):
    df = lang_engine.query(
        PFX
        + 'SELECT ?l WHERE { ex:thing1 rdfs:label ?l FILTER(LANGMATCHES(LANG(?l), "*")) }'
    )
    assert rows(df) == [("color",), ("colour",), ("couleur",)]


def test_strlang_builds_tagged_literal(lang_engine):
    df = lang_engine.query(
        PFX
        + """SELECT ?v ?tag ?dt WHERE {
            ex:thing2 rdfs:label ?l
            BIND(STRLANG(?l, "EN") AS ?v)
            BIND(LANG(?v) AS ?tag)
            BIND(DATATYPE(?v) AS ?dt)
        }"""
    )
    assert rows(df) == [("color", "en", RDF_LANGSTRING)]


def test_datatype_of_tagged_literal(lang_engine):
    df = lang_engine.query(
        PFX
        + 'SELECT ?dt WHERE { ?s rdfs:label "couleur"@fr . ex:thing1 rdfs:label ?l FILTER(LANG(?l) = "fr") BIND(DATATYPE(?l) AS ?dt) }'
    )
    assert rows(df) == [(RDF_LANGSTRING,)]
