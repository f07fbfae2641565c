"""SPARQL algebra tree (IR #1 of the reference lifecycle, SURVEY §3.1).

Mirrors spargebra's ``GraphPattern`` / ``Expression`` shape the reference
consumes (hybrid/src/combiner.rs matches on these variants), re-expressed as
Python dataclasses. The Spark compiler walks this tree and emits a single
DataFrame plan.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from otit_swt_spark.terms import IRI, Literal, Variable

Term = IRI | Literal | Variable


# -- property paths ---------------------------------------------------------


@dataclass(frozen=True)
class PathPredicate:
    iri: IRI


@dataclass(frozen=True)
class PathInverse:
    inner: "Path"


@dataclass(frozen=True)
class PathSequence:
    parts: tuple["Path", ...]


@dataclass(frozen=True)
class PathAlternative:
    parts: tuple["Path", ...]


@dataclass(frozen=True)
class PathZeroOrMore:
    inner: "Path"


@dataclass(frozen=True)
class PathOneOrMore:
    inner: "Path"


@dataclass(frozen=True)
class PathZeroOrOne:
    inner: "Path"


@dataclass(frozen=True)
class PathNegatedPropertySet:
    """``!(:p1|:p2|^:q)`` (SPARQL 1.1 §9.1): a forward edge via any predicate
    NOT in ``forward``, unioned with a reversed edge via any predicate NOT in
    ``inverse``. A direction with no listed members contributes no arm.
    Exceeds reference parity — the reference only rewrites paths statically
    (hybrid/src/rewriting/graph_patterns/path_pattern.rs:11) and has no NPS
    execution."""

    forward: tuple[IRI, ...]
    inverse: tuple[IRI, ...]


Path = (
    PathPredicate
    | PathInverse
    | PathSequence
    | PathAlternative
    | PathZeroOrMore
    | PathOneOrMore
    | PathZeroOrOne
    | PathNegatedPropertySet
)


# -- expressions ------------------------------------------------------------


@dataclass(frozen=True)
class EVar:
    name: str


@dataclass(frozen=True)
class ELiteral:
    value: Literal


@dataclass(frozen=True)
class EIri:
    value: IRI


@dataclass(frozen=True)
class EOr:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class EAnd:
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class ENot:
    inner: "Expr"


@dataclass(frozen=True)
class ECmp:
    op: str  # = != < <= > >=
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class EArith:
    op: str  # + - * /
    left: "Expr"
    right: "Expr"


@dataclass(frozen=True)
class ENeg:
    inner: "Expr"


@dataclass(frozen=True)
class EIn:
    expr: "Expr"
    options: tuple["Expr", ...]
    negated: bool = False


@dataclass(frozen=True)
class EFunc:
    name: str  # upper-cased builtin name or full IRI for custom functions
    args: tuple["Expr", ...]


@dataclass(frozen=True)
class EExists:
    pattern: "GraphPattern"
    negated: bool = False


@dataclass(frozen=True)
class EAggregate:
    """An aggregate call; only valid under a Group. ``var`` is the synthetic
    output binding assigned during algebra translation."""

    name: str  # COUNT SUM AVG MIN MAX GROUP_CONCAT SAMPLE or custom IRI
    expr: "Expr | None"  # None = COUNT(*)
    distinct: bool = False
    separator: str | None = None
    var: str | None = None


Expr = (
    EVar
    | ELiteral
    | EIri
    | EOr
    | EAnd
    | ENot
    | ECmp
    | EArith
    | ENeg
    | EIn
    | EFunc
    | EExists
    | EAggregate
)


# -- graph patterns ----------------------------------------------------------


@dataclass(frozen=True)
class TriplePattern:
    s: Term
    p: Term | Path
    o: Term


@dataclass
class BGP:
    patterns: list[TriplePattern] = field(default_factory=list)


@dataclass
class Join:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass
class LeftJoin:
    left: "GraphPattern"
    right: "GraphPattern"
    expr: Expr | None = None


@dataclass
class Filter:
    expr: Expr
    inner: "GraphPattern"


@dataclass
class Union:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass
class Extend:
    inner: "GraphPattern"
    var: str
    expr: Expr


@dataclass
class Minus:
    left: "GraphPattern"
    right: "GraphPattern"


@dataclass
class Values:
    variables: list[str]
    rows: list[list[Term | None]]


@dataclass
class Group:
    inner: "GraphPattern"
    by: list[str]
    aggregates: list[EAggregate]


@dataclass
class OrderBy:
    inner: "GraphPattern"
    keys: list[tuple[Expr, bool]]  # (expr, ascending)


@dataclass
class Project:
    inner: "GraphPattern"
    variables: list[str]


@dataclass
class Distinct:
    inner: "GraphPattern"


@dataclass
class Reduced:
    inner: "GraphPattern"


@dataclass
class Slice:
    inner: "GraphPattern"
    offset: int = 0
    limit: int | None = None


@dataclass
class Service:
    """SERVICE [SILENT] <endpoint> { pattern }: evaluate the inner pattern
    against a second graph and join with the outer solutions (reference
    rewrites SERVICE patterns to the static side,
    hybrid/src/rewriting/graph_patterns/service_pattern.rs:1). Registered
    endpoints (Engine.register_service) run as in-process federation —
    one Catalyst plan spanning both graphs; unregistered http(s) endpoints
    execute the group remotely as a generated sub-SELECT and join the
    returned bindings in-plan."""

    endpoint: IRI
    inner: "GraphPattern"
    silent: bool = False
    #: verbatim source text of the braced group (set by the parser) — an
    #: unregistered http(s) endpoint executes it remotely as a sub-SELECT
    raw: str | None = None
    #: prefix declarations in scope at the SERVICE clause (the raw text may
    #: use pnames that must be re-declared in the remote query)
    prefixes: dict | None = None


@dataclass
class Graph:
    """GRAPH term { inner } — evaluate inner against a named graph (IRI) or
    every registered named graph with the name bound (variable). Additive:
    the reference rejects datasets (splitter.rs:41-48)."""

    term: "IRI | Variable"
    inner: "GraphPattern"


GraphPattern = (
    BGP
    | Join
    | LeftJoin
    | Filter
    | Union
    | Extend
    | Minus
    | Values
    | Group
    | OrderBy
    | Project
    | Distinct
    | Reduced
    | Slice
    | Service
    | Graph
)


@dataclass
class SelectQuery:
    pattern: GraphPattern
    variables: list[str]  # projection order
    #: FROM <iri> graphs merged into the default graph for this query, and
    #: FROM NAMED <iri> restriction of GRAPH-visible graphs (SPARQL 1.1
    #: §13.2; additive — the reference rejects datasets, splitter.rs:41-48)
    dataset_default: list[IRI] = field(default_factory=list)
    dataset_named: list[IRI] = field(default_factory=list)


@dataclass
class AskQuery:
    """ASK { ... } — does at least one solution exist? Exceeds the reference
    (SELECT-only, hybrid/src/splitter.rs:32-60); standard SPARQL surface."""

    pattern: GraphPattern


@dataclass
class ConstructQuery:
    """CONSTRUCT { template } WHERE { ... } — instantiate the template once
    per solution, drop incomplete triples, produce a graph (set semantics)."""

    template: list["TriplePattern"]
    pattern: GraphPattern


@dataclass
class UpdateQuery:
    """SPARQL 1.1 Update over the default graph: ``data_only`` marks
    INSERT/DELETE DATA (ground triples, no pattern); otherwise the delete/
    insert templates are instantiated once per WHERE solution."""

    delete: list["TriplePattern"] | None
    insert: list["TriplePattern"] | None
    pattern: GraphPattern | None
    data_only: bool = False


@dataclass
class DescribeQuery:
    """DESCRIBE <iri>... / DESCRIBE ?v WHERE { ... } — all triples whose
    subject is one of the described nodes (minimal CBD variant)."""

    terms: list[Term]  # IRIs and/or Variables
    pattern: GraphPattern | None


def walk_patterns(p: GraphPattern):
    yield p
    for attr in ("inner", "left", "right"):
        child = getattr(p, attr, None)
        if child is not None and not isinstance(child, (str, list, tuple)):
            yield from walk_patterns(child)


def pattern_variables(p: GraphPattern) -> set[str]:
    """Variables visible (bindable) in a pattern — used for join/minus key
    computation and EXISTS decorrelation."""
    if isinstance(p, BGP):
        out: set[str] = set()
        for t in p.patterns:
            for term in (t.s, t.p, t.o):
                if isinstance(term, Variable):
                    out.add(term.name)
        return out
    if isinstance(p, (Join, Union)):
        return pattern_variables(p.left) | pattern_variables(p.right)
    if isinstance(p, LeftJoin):
        return pattern_variables(p.left) | pattern_variables(p.right)
    if isinstance(p, Minus):
        return pattern_variables(p.left)
    if isinstance(p, Filter):
        return pattern_variables(p.inner)
    if isinstance(p, Extend):
        return pattern_variables(p.inner) | {p.var}
    if isinstance(p, Values):
        return set(p.variables)
    if isinstance(p, Group):
        return set(p.by) | {a.var for a in p.aggregates if a.var}
    if isinstance(p, Project):
        return set(p.variables)
    if isinstance(p, (OrderBy, Distinct, Reduced, Slice, Service)):
        return pattern_variables(p.inner)
    if isinstance(p, Graph):
        out = pattern_variables(p.inner)
        if isinstance(p.term, Variable):
            out |= {p.term.name}
        return out
    return set()


def expr_variables(e: Expr) -> set[str]:
    if isinstance(e, EVar):
        return {e.name}
    if isinstance(e, (ELiteral, EIri)):
        return set()
    if isinstance(e, (EOr, EAnd, ECmp, EArith)):
        return expr_variables(e.left) | expr_variables(e.right)
    if isinstance(e, (ENot, ENeg)):
        return expr_variables(e.inner)
    if isinstance(e, EIn):
        out = expr_variables(e.expr)
        for o in e.options:
            out |= expr_variables(o)
        return out
    if isinstance(e, EFunc):
        out = set()
        for a in e.args:
            out |= expr_variables(a)
        return out
    if isinstance(e, EExists):
        return set()
    if isinstance(e, EAggregate):
        return expr_variables(e.expr) if e.expr is not None else set()
    return set()
