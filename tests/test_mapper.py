"""Mapper (stOTTR expansion) tests, mirroring the reference suite
(reference: mapper/tests/test_mapper.rs — easy case, all-IRI, language
tags, const lists, nested templates, minting, path columns, derived
datatypes, list arguments)."""

import pytest
from pyspark.sql import types as T

from otit_swt_spark.mapper import ExpandOptions, Mapping, MintingOptions, ResolveIRI

EX = "http://example.net/ns#"
XSD = "http://www.w3.org/2001/XMLSchema#"


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def triple_set(mapping):
    return set(
        (s, p, o if isinstance(o, str) else (o[0], o[1], o[2]))
        for s, p, o in mapping.to_triples()
    )


def test_easy_case(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate [?myVar1 , ?myVar2]
      :: {{
        ottr:Triple(ex:anObject, ex:hasNumber, ?myVar1) ,
        ottr:Triple(ex:anObject, ex:hasOtherNumber, ?myVar2)
      }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("myVar1", T.IntegerType()),
        T.StructField("myVar2", T.IntegerType()),
    ])
    df = _df(spark, [("KeyOne", 1, 3), ("KeyTwo", 2, 4)], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "ExampleTemplate", df)
    assert triple_set(m) == {
        (EX + "anObject", EX + "hasNumber", ("1", XSD + "int", None)),
        (EX + "anObject", EX + "hasNumber", ("2", XSD + "int", None)),
        (EX + "anObject", EX + "hasOtherNumber", ("3", XSD + "int", None)),
        (EX + "anObject", EX + "hasOtherNumber", ("4", XSD + "int", None)),
    }


def test_all_iri_case(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate [xsd:anyURI ?myVar1]
      :: {{ ottr:Triple(ex:anObject, ex:relatesTo, ?myVar1) }} .
    """
    df = _df(spark, [("KeyOne", EX + "OneThing"), ("KeyTwo", EX + "AnotherThing")],
             "Key string, myVar1 string")
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "ExampleTemplate", df)
    assert triple_set(m) == {
        (EX + "anObject", EX + "relatesTo", EX + "OneThing"),
        (EX + "anObject", EX + "relatesTo", EX + "AnotherThing"),
    }


def test_language_tags(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate [?myString]
      :: {{
        ottr:Triple(ex:anObject, ex:hasString, ?myString) ,
        ottr:Triple(ex:anotherObject, ex:hasString, ""@ar-SA)
      }} .
    """
    df = _df(spark, [("KeyOne", "one"), ("KeyTwo", "two")], "Key string, myString string")
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "ExampleTemplate", df,
             ExpandOptions(language_tags={"myString": "bn-BD"}))
    got = triple_set(m)
    RDF_LS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
    assert got == {
        (EX + "anObject", EX + "hasString", ("one", RDF_LS, "bn-BD")),
        (EX + "anObject", EX + "hasString", ("two", RDF_LS, "bn-BD")),
        (EX + "anotherObject", EX + "hasString", ("", RDF_LS, "ar-SA")),
    }


def test_const_list_cross(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate [xsd:anyURI ?var1]
      :: {{ cross | ottr:Triple(?var1, ex:hasNumber, ++(1,2)) }} .
    """
    df = _df(spark, [("KeyOne", EX + "OneThing"), ("KeyTwo", EX + "AnotherThing")],
             "Key string, var1 string")
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "ExampleTemplate", df)
    assert triple_set(m) == {
        (EX + "OneThing", EX + "hasNumber", ("1", XSD + "integer", None)),
        (EX + "OneThing", EX + "hasNumber", ("2", XSD + "integer", None)),
        (EX + "AnotherThing", EX + "hasNumber", ("1", XSD + "integer", None)),
        (EX + "AnotherThing", EX + "hasNumber", ("2", XSD + "integer", None)),
    }


def test_nested_templates(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate [?myVar1 , ?myVar2] :: {{
        ex:Nested(?myVar1),
        ottr:Triple(ex:anObject, ex:hasOtherNumber, ?myVar2)
      }} .
    ex:Nested [?myVar] :: {{
        ottr:Triple(ex:anObject, ex:hasNumber, ?myVar)
    }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("myVar1", T.IntegerType()),
        T.StructField("myVar2", T.IntegerType()),
    ])
    df = _df(spark, [("KeyOne", 1, 3), ("KeyTwo", 2, 4)], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "ExampleTemplate", df)
    assert triple_set(m) == {
        (EX + "anObject", EX + "hasNumber", ("1", XSD + "int", None)),
        (EX + "anObject", EX + "hasNumber", ("2", XSD + "int", None)),
        (EX + "anObject", EX + "hasOtherNumber", ("3", XSD + "int", None)),
        (EX + "anObject", EX + "hasOtherNumber", ("4", XSD + "int", None)),
    }


def test_mint_iris(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate [?myIRI1, ?myIRI2] :: {{
      ottr:Triple(?myIRI1, ex:relatesTo, ?myIRI2)
    }} .
    """
    things = "http://example.net/things#"
    df = _df(spark, [("KeyOne", things + "subject1"), ("KeyTwo", things + "subject2")],
             "Key string, myIRI1 string")
    m = Mapping.from_str(doc, spark=spark)
    report = m.expand(
        EX + "ExampleTemplate", df,
        ExpandOptions(mint_iris={"myIRI2": MintingOptions(prefix=things,
                                                          suffix_generator=3)}))
    minted = {(r["Key"], r["myIRI2"]) for r in report.minted_iris.collect()}
    assert minted == {("KeyOne", things + "3"), ("KeyTwo", things + "4")}
    assert triple_set(m) == {
        (things + "subject1", EX + "relatesTo", things + "3"),
        (things + "subject2", EX + "relatesTo", things + "4"),
    }


def test_path_column_resolve(spark):
    things = "http://example.net/things#"
    doc1 = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate1 [?myIRI1, ?myIRI2] :: {{
      ottr:Triple(?myIRI1, ex:relatesTo, ?myIRI2)
    }} ."""
    doc2 = f"""
    @prefix ex:<{EX}>.
    ex:ExampleTemplate2 [?myIRI1, ?myIRI2] :: {{
      ottr:Triple(?myIRI1, ex:relatesDifferentlyTo, ?myIRI2)
    }} ."""
    m = Mapping.from_strs([doc1, doc2], spark=spark)
    df1 = _df(spark, [("KeyOne", things + "subject1"), ("KeyTwo", things + "subject2")],
              "Key string, myIRI1 string")
    m.expand(EX + "ExampleTemplate1", df1,
             ExpandOptions(mint_iris={"myIRI2": MintingOptions(prefix=things,
                                                               suffix_generator=3)}))
    df2 = _df(spark,
              [("KeyOne2", things + "otherSubject1", "KeyOne"),
               ("KeyTwo2", things + "otherSubject2", "KeyTwo")],
              "Key string, myIRI1 string, myIRI2ForeignKey string")
    m.expand(EX + "ExampleTemplate2", df2,
             ExpandOptions(resolve_iris={"myIRI2": ResolveIRI(
                 key_column="myIRI2ForeignKey",
                 template=EX + "ExampleTemplate1", argument="myIRI2")}))
    assert triple_set(m) == {
        (things + "subject1", EX + "relatesTo", things + "3"),
        (things + "subject2", EX + "relatesTo", things + "4"),
        (things + "otherSubject1", EX + "relatesDifferentlyTo", things + "3"),
        (things + "otherSubject2", EX + "relatesDifferentlyTo", things + "4"),
    }


def test_derived_datatypes(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [?b, ?i32, ?i64, ?f64, ?s] :: {{
        ottr:Triple(ex:o, ex:hasVal, ?b),
        ottr:Triple(ex:o, ex:hasVal, ?i32),
        ottr:Triple(ex:o, ex:hasVal, ?i64),
        ottr:Triple(ex:o, ex:hasVal, ?f64),
        ottr:Triple(ex:o, ex:hasVal, ?s)
    }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("b", T.BooleanType()),
        T.StructField("i32", T.IntegerType()),
        T.StructField("i64", T.LongType()),
        T.StructField("f64", T.DoubleType()),
        T.StructField("s", T.StringType()),
    ])
    df = _df(spark, [("K1", True, -13, -15, 21.22, "abcde")], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "T", df)
    assert triple_set(m) == {
        (EX + "o", EX + "hasVal", ("true", XSD + "boolean", None)),
        (EX + "o", EX + "hasVal", ("-13", XSD + "int", None)),
        (EX + "o", EX + "hasVal", ("-15", XSD + "long", None)),
        (EX + "o", EX + "hasVal", ("21.22", XSD + "double", None)),
        (EX + "o", EX + "hasVal", ("abcde", XSD + "string", None)),
    }


def test_list_arguments_cross(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [?object, ?predicate, ?myList] :: {{
        cross | ottr:Triple(?object, ?predicate, ++?myList)
    }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("object", T.StringType()),
        T.StructField("predicate", T.StringType()),
        T.StructField("myList", T.ArrayType(T.IntegerType())),
    ])
    df = _df(spark, [("KeyOne", EX + "obj1", EX + "hasNumberFromList1", [1, 2]),
                     ("KeyTwo", EX + "obj2", EX + "hasNumberFromList2", [3, 4])], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "T", df)
    assert triple_set(m) == {
        (EX + "obj1", EX + "hasNumberFromList1", ("1", XSD + "int", None)),
        (EX + "obj1", EX + "hasNumberFromList1", ("2", XSD + "int", None)),
        (EX + "obj2", EX + "hasNumberFromList2", ("3", XSD + "int", None)),
        (EX + "obj2", EX + "hasNumberFromList2", ("4", XSD + "int", None)),
    }


def test_two_list_arguments_cross_nested(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [?subject, ?myList1, ?myList2] :: {{
        cross | ex:Nested(?subject, ++?myList1, ++?myList2)
      }} .
    ex:Nested [?subject, ?myVar1, ?myVar2] :: {{
        ottr:Triple(?subject, ex:hasNumber, ?myVar1),
        ottr:Triple(?subject, ex:hasOtherNumber, ?myVar2)
    }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("myList1", T.ArrayType(T.IntegerType())),
        T.StructField("myList2", T.ArrayType(T.IntegerType())),
    ])
    df = _df(spark, [("KeyOne", EX + "obj1", [1, 2], [5, 6]),
                     ("KeyTwo", EX + "obj2", [3, 4, None], [7, 8, 9])], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "T", df)
    got = triple_set(m)
    expected = set()
    for v in (1, 2):
        expected.add((EX + "obj1", EX + "hasNumber", (str(v), XSD + "int", None)))
    for v in (5, 6):
        expected.add((EX + "obj1", EX + "hasOtherNumber", (str(v), XSD + "int", None)))
    for v in (3, 4):
        expected.add((EX + "obj2", EX + "hasNumber", (str(v), XSD + "int", None)))
    for v in (7, 8, 9):
        expected.add((EX + "obj2", EX + "hasOtherNumber", (str(v), XSD + "int", None)))
    assert got == expected


def test_zip_min_expander(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [?subject, ?l1, ?l2] :: {{
        zipMin | ex:Nested(?subject, ++?l1, ++?l2)
      }} .
    ex:Nested [?subject, ?a, ?b] :: {{
        ottr:Triple(?subject, ex:hasPair, ?a),
        ottr:Triple(?subject, ex:hasOther, ?b)
    }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("subject", T.StringType()),
        T.StructField("l1", T.ArrayType(T.IntegerType())),
        T.StructField("l2", T.ArrayType(T.IntegerType())),
    ])
    df = _df(spark, [("K1", EX + "s", [1, 2, 3], [10, 20])], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "T", df)
    got = triple_set(m)
    # zipMin stops at the shorter list: pairs (1,10), (2,20)
    assert (EX + "s", EX + "hasPair", ("1", XSD + "int", None)) in got
    assert (EX + "s", EX + "hasPair", ("2", XSD + "int", None)) in got
    assert (EX + "s", EX + "hasPair", ("3", XSD + "int", None)) not in got
    assert (EX + "s", EX + "hasOther", ("10", XSD + "int", None)) in got
    assert (EX + "s", EX + "hasOther", ("20", XSD + "int", None)) in got


def test_ntriples_roundtrip(spark, tmp_path):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [?v, xsd:anyURI ?u] :: {{
        ottr:Triple(ex:o, ex:hasVal, ?v),
        ottr:Triple(ex:o, ex:linksTo, ?u)
    }} .
    """
    df = _df(spark, [("K1", 'say "hi"\nplease', EX + "other")],
             "Key string, v string, u string")
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "T", df)
    out = tmp_path / "out.nt"
    m.write_ntriples(str(out))
    lines = sorted(out.read_text().strip().split("\n"))
    assert lines == sorted([
        f'<{EX}o> <{EX}hasVal> "say \\"hi\\"\\nplease" .',
        f"<{EX}o> <{EX}linksTo> <{EX}other> .",
    ])


def test_parameter_default_value(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [?subject, ?val = 42] :: {{
        ottr:Triple(ex:o, ex:hasVal, ?val)
    }} .
    """
    df = _df(spark, [("K1", EX + "s1")], "Key string, subject string")
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "T", df)
    assert triple_set(m) == {
        (EX + "o", EX + "hasVal", ("42", XSD + "integer", None)),
    }


def test_zip_max_expander(spark):
    from pyspark.sql import types as T

    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [?s, ?l1, ?l2] :: {{
        zipMax | ex:N(?s, ++?l1, ++?l2)
      }} .
    ex:N [?s, ?a, ?b] :: {{
        ottr:Triple(?s, ex:hasA, ?a),
        ottr:Triple(?s, ex:hasB, ?b)
    }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("s", T.StringType()),
        T.StructField("l1", T.ArrayType(T.IntegerType())),
        T.StructField("l2", T.ArrayType(T.IntegerType())),
    ])
    df = _df(spark, [("K1", EX + "x", [1], [7, 8])], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "T", df)
    got = triple_set(m)
    # zipMax keeps the longer list's tail; missing left values are null and
    # produce no triple for hasA
    assert (EX + "x", EX + "hasA", ("1", XSD + "int", None)) in got
    assert (EX + "x", EX + "hasB", ("7", XSD + "int", None)) in got
    assert (EX + "x", EX + "hasB", ("8", XSD + "int", None)) in got


def test_mapper_output_feeds_sparql_engine(spark):
    """End-to-end product integration: DataFrame -> stOTTR expansion ->
    triple store -> SPARQL query (mapper triples_df feeds GraphStore)."""
    from otit_swt_spark.engine import Engine
    from otit_swt_spark.graph import GraphStore

    doc = f"""
    @prefix ex:<{EX}>.
    ex:CityT [xsd:anyURI ?city, ?population, xsd:anyURI ?country] :: {{
        ottr:Triple(?city, ex:hasPopulation, ?population),
        ottr:Triple(?city, ex:inCountry, ?country)
    }} .
    """
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("population", T.LongType()),
        T.StructField("country", T.StringType()),
    ])
    df = _df(spark, [
        ("1", "urn:city:oslo", 700000, "urn:country:no"),
        ("2", "urn:city:bergen", 290000, "urn:country:no"),
        ("3", "urn:city:stockholm", 980000, "urn:country:se"),
    ], schema)
    m = Mapping.from_str(doc, spark=spark)
    m.expand(EX + "CityT", df)

    eng = Engine(spark, GraphStore(spark, m.triples_df()))
    out = eng.query(f"""
    SELECT ?city ?pop WHERE {{
        ?city <{EX}inCountry> <urn:country:no> .
        ?city <{EX}hasPopulation> ?pop .
        FILTER(?pop > 500000)
    }}""")
    got = [(r["city"], r["pop"]) for r in out.collect()]
    assert got == [("urn:city:oslo", 700000)]


def test_nelist_validation(spark):
    from pyspark.sql import types as T

    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [NEList<xsd:integer> ?l] :: {{
        cross | ottr:Triple(ex:o, ex:hasVal, ++?l)
    }} .
    """
    schema = T.StructType([
        T.StructField("Key", T.StringType()),
        T.StructField("l", T.ArrayType(T.IntegerType())),
    ])
    m = Mapping.from_str(doc, spark=spark)
    ok = _df(spark, [("K1", [1, 2])], schema)
    m.expand(EX + "T", ok)
    bad = _df(spark, [("K2", [])], schema)
    with pytest.raises(ValueError, match="empty lists"):
        m.expand(EX + "T", bad)


def test_non_blank_validation(spark):
    doc = f"""
    @prefix ex:<{EX}>.
    ex:T [! xsd:anyURI ?s] :: {{ ottr:Triple(?s, ex:p, ex:o) }} .
    """
    m = Mapping.from_str(doc, spark=spark)
    with pytest.raises(ValueError, match="non-blank"):
        m.expand(EX + "T", _df(spark, [("K1", "_:b0")], "Key string, s string"))


def test_annotation_instances_parse_and_store(spark):
    """@@ex:Meta(...) annotation lists on a signature parse and are carried
    on the Template (reference stores but never executes them:
    mapper/src/ast.rs:114, resolver.rs:120-138); expansion is unaffected."""
    doc = f"""
    @prefix ex:<{EX}>.
    ex:Annotated [?v]
      @@ex:CreatedBy(ex:someone), @@ex:Version("2")
      :: {{
        ottr:Triple(ex:thing, ex:hasValue, ?v)
      }} .
    """
    m = Mapping.from_str(doc, spark=spark)
    tmpl = m.templates[EX + "Annotated"]
    assert [a.template_iri for a in tmpl.annotations] == [
        EX + "CreatedBy", EX + "Version"]
    schema = T.StructType([T.StructField("Key", T.StringType()),
                           T.StructField("v", T.IntegerType())])
    m.expand(EX + "Annotated", _df(spark, [("k1", 7)], schema))
    assert triple_set(m) == {
        (EX + "thing", EX + "hasValue", ("7", XSD + "int", None))}


def test_nullable_triple_suppresses_none_rows(spark):
    """ottr:NullableTriple drops rows where any argument is none; plain
    ottr:Triple keeps its strict per-position behavior (OTTR base library
    semantics)."""
    doc = f"""
    @prefix ex:<{EX}>.
    ex:MaybeLink [xsd:anyURI ?a, ? xsd:anyURI ?b]
      :: {{
        ottr:NullableTriple(?b, ex:linksBack, ?a)
      }} .
    """
    m = Mapping.from_str(doc, spark=spark)
    schema = T.StructType([T.StructField("Key", T.StringType()),
                           T.StructField("a", T.StringType()),
                           T.StructField("b", T.StringType())])
    df = _df(spark, [("k1", EX + "x", EX + "y"), ("k2", EX + "z", None)], schema)
    m.expand(EX + "MaybeLink", df)
    # k2 has no ?b: with ?b as SUBJECT the whole triple is suppressed,
    # not emitted with a null subject
    assert triple_set(m) == {(EX + "y", EX + "linksBack", EX + "x")}
