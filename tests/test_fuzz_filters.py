"""Seeded mini-fuzzer: random FILTER/BIND expression combinations executed
through the SPARQL engine over the KG derived from the customer table,
compared against the equivalent SQL on DuckDB. Exercises the expression
compiler combinatorially beyond the hand-written oracle entries."""

import random

import duckdb
import pytest

from otit_swt_spark.tpch_graph import build_engine

SF_DIR = "/root/testdata/sf0.001"

PFX = """
PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>
"""

# (SPARQL expression over ?bal/?seg/?name, SQL twin over customer columns)
_PREDICATES = [
    ("?bal > {t}", "c_acctbal > {t}"),
    ("?bal <= {t}", "c_acctbal <= {t}"),
    ("?bal != {t}", "c_acctbal != {t}"),
    ('?seg = "BUILDING"', "c_mktsegment = 'BUILDING'"),
    ('?seg != "MACHINERY"', "c_mktsegment != 'MACHINERY'"),
    ('STRSTARTS(?name, "Customer#0000001")',
     "starts_with(c_name, 'Customer#0000001')"),
    ('CONTAINS(?name, "5")', "contains(c_name, '5')"),
    ("STRLEN(?name) > 17", "length(c_name) > 17"),
    ("ABS(?bal) < {t}", "abs(c_acctbal) < {t}"),
    ("FLOOR(?bal / 100.0) = {d}", "floor(c_acctbal / 100.0) = {d}"),
]


def _gen_case(rng: random.Random):
    n = rng.randint(1, 3)
    parts = rng.sample(_PREDICATES, n)
    ops = [rng.choice(["&&", "||"]) for _ in range(n - 1)]
    sparql_expr, sql_expr = [], []
    for i, (sp, sq) in enumerate(parts):
        t = round(rng.uniform(-500, 5000), 2)
        d = rng.randint(0, 30)
        sparql_expr.append("(" + sp.format(t=t, d=d) + ")")
        sql_expr.append("(" + sq.format(t=t, d=d) + ")")
        if i < len(ops):
            sparql_expr.append(ops[i])
            sql_expr.append("AND" if ops[i] == "&&" else "OR")
    return " ".join(sparql_expr), " ".join(sql_expr)


@pytest.fixture(scope="module")
def fuzz_engine(spark):
    return build_engine(spark, SF_DIR)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW customer AS SELECT * FROM '{SF_DIR}/customer.parquet'")
    return con


def test_fuzz_filter_combinations(fuzz_engine, duck):
    rng = random.Random(20260813)
    failures = []
    for i in range(25):
        sparql_expr, sql_expr = _gen_case(rng)
        df = fuzz_engine.query(PFX + f"""
        SELECT ?name WHERE {{
            ?c <urn:p:name> ?name .
            FILTER(STRSTARTS(STR(?c), "urn:cust:"))
            ?c <urn:p:acctbal> ?bal .
            ?c <urn:p:segment> ?seg .
            FILTER({sparql_expr})
        }}""")
        got = sorted(r["name"] for r in df.collect())
        want = sorted(r[0] for r in duck.execute(
            f"SELECT c_name FROM customer WHERE {sql_expr}").fetchall())
        if got != want:
            failures.append((i, sparql_expr, len(got), len(want)))
    assert not failures, f"{len(failures)} mismatches: {failures[:3]}"


def test_fuzz_grouped_aggregates(fuzz_engine, duck):
    rng = random.Random(42)
    aggs = [
        ("(COUNT(?bal) AS ?x)", "count(c_acctbal) AS x"),
        ("(ROUND(SUM(?bal)) AS ?x)", "round(sum(c_acctbal), 0) AS x"),
        ("(MIN(?bal) AS ?x)", "min(c_acctbal) AS x"),
        ("(MAX(?bal) AS ?x)", "max(c_acctbal) AS x"),
        ("(ROUND(AVG(?bal)) AS ?x)", "round(avg(c_acctbal), 0) AS x"),
    ]
    failures = []
    for i in range(10):
        sp_agg, sql_agg = rng.choice(aggs)
        t = round(rng.uniform(-500, 5000), 2)
        df = fuzz_engine.query(PFX + f"""
        SELECT ?seg {sp_agg} WHERE {{
            ?c <urn:p:segment> ?seg .
            ?c <urn:p:acctbal> ?bal .
            FILTER(?bal > {t})
        }} GROUP BY ?seg""")
        got = sorted((r["seg"], float(r["x"])) for r in df.collect())
        want = sorted((r[0], float(r[1])) for r in duck.execute(
            f"SELECT c_mktsegment, {sql_agg} FROM customer "
            f"WHERE c_acctbal > {t} GROUP BY c_mktsegment").fetchall())
        if got != want:
            failures.append((i, sp_agg, t, got[:2], want[:2]))
    assert not failures, f"{len(failures)} mismatches: {failures[:3]}"


def test_fuzz_order_limit_offset(fuzz_engine, duck):
    """Regression guard for term-column ordering: random ORDER BY direction,
    LIMIT and OFFSET windows compared against DuckDB (ordering must be
    numeric for numeric literals, with name as deterministic tiebreak)."""
    rng = random.Random(7)
    failures = []
    for i in range(12):
        desc = rng.choice([True, False])
        limit = rng.randint(1, 8)
        offset = rng.randint(0, 6)
        direction = "DESC(?bal)" if desc else "?bal"
        sql_dir = "c_acctbal DESC" if desc else "c_acctbal"
        df = fuzz_engine.query(PFX + f"""
        SELECT ?name ?bal WHERE {{
            ?c <urn:p:name> ?name .
            FILTER(STRSTARTS(STR(?c), "urn:cust:"))
            ?c <urn:p:acctbal> ?bal .
        }} ORDER BY {direction} ?name LIMIT {limit} OFFSET {offset}""")
        got = [(r["name"], float(r["bal"])) for r in df.collect()]
        want = [(r[0], float(r[1])) for r in duck.execute(
            f"SELECT c_name, c_acctbal FROM customer "
            f"ORDER BY {sql_dir}, c_name LIMIT {limit} OFFSET {offset}").fetchall()]
        if got != want:
            failures.append((i, desc, limit, offset, got[:2], want[:2]))
    assert not failures, f"{len(failures)} mismatches: {failures[:2]}"
