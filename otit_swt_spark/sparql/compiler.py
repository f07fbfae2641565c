"""SPARQL algebra -> single Spark DataFrame plan.

This replaces the reference's whole split/rewrite/prepare/combine pipeline
(hybrid/src/{rewriting,preparing,combiner}*): because the knowledge graph
AND the time-series rows are both DataFrames in one Spark plan, the
static/dynamic query splitting, ChangeType relaxation, filter/group pushdown
and id-pruning machinery collapse into plan construction — Catalyst performs
predicate pushdown, column pruning, partition pruning and join selection on
the unified plan (SURVEY §4.1).

Semantics notes:
- The right-hand sides of LeftJoin/Minus and Extend/Filter are compiled with
  the left solution *threaded through*, exactly like the reference combiner
  (hybrid/src/combiner.rs:106-127 threads columns through sequential
  patterns). The row-id trick (combiner.rs:137-143 cumsum) becomes
  ``monotonically_increasing_id``.
- Union keeps duplicates (SPARQL multiset semantics). The reference appends
  a ``unique()`` (combiner.rs:233-287) — a set-semantics divergence from the
  SPARQL spec that we deliberately do NOT copy (SURVEY §2.6).
- BOUND is ``isNotNull`` — the reference implements it inverted
  (lazy_expressions.rs:362-364), a bug we do not copy.
- hasDataPoint/hasTimestamp/hasValue triple patterns are *virtual*: they are
  lowered onto joins against registered time-series tables
  (hybrid/src/combiner/lazy_triple.rs:9-47 + join_timeseries.rs:6-44).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field, replace

from pyspark.sql import Column, DataFrame, SparkSession, functions as F, types as T

from otit_swt_spark.sparql import algebra as A
from otit_swt_spark.sparql.expressions import (INTEGRAL, NUMERIC, Typed,
                                               _as_bool, compile_expr,
                                               literal_typed)
from otit_swt_spark.terms import (
    HAS_DATA_POINT,
    HAS_EXTERNAL_ID,
    HAS_TIMESTAMP,
    HAS_VALUE,
    IRI,
    Literal,
    NEST_AGGREGATION,
    Variable,
    XSD_BOOLEAN,
    XSD_DATETIME,
    XSD_STRING,
    spark_type_for_xsd,
    xsd_for_spark_type,
)

RID = "__rid"


def _pushdown_value_literal(lit):
    """A chain hasValue literal as a plain Python value safe to render
    into a remote SQL equality — numeric / boolean / plain-string only;
    anything else returns None (no value pushdown, Spark-side filter
    still applies)."""
    from otit_swt_spark.terms import XSD, XSD_BOOLEAN as XB, XSD_STRING as XS

    dt = lit.datatype
    if dt == XB:
        return lit.lexical in ("true", "1")
    if dt in (XSD + "integer", XSD + "long", XSD + "int",
              XSD + "short", XSD + "byte", XSD + "nonNegativeInteger",
              XSD + "unsignedInt", XSD + "unsignedLong"):
        try:
            return int(lit.lexical)
        except ValueError:
            return None
    if dt in (XSD + "double", XSD + "float", XSD + "decimal"):
        import math

        try:
            v = float(lit.lexical)
        except ValueError:
            return None
        # NaN/INF have no portable SQL literal (repr renders bare 'nan'
        # and binds as a column name) — leave them to the Spark-side
        # filter, where NaN = NaN even matches rows
        return v if math.isfinite(v) else None
    if dt in (XS, None):
        return lit.lexical
    return None


_TIME_UNITS = ("year", "month", "day", "hour", "minute", "second")

_COMPARABLE_NUM = {"long", "double", "int", "float"}


def _ts_literal_eq(col: "Column", col_hint: str | None, term) -> "Column":
    """Type-safe equality for a literal hasTimestamp/hasValue pattern.
    SPARQL `=` between literals of incomparable datatypes is a type
    error, which as a PATTERN restriction means 'matches nothing' — it
    must not become an ANSI cast error at constant folding (a string
    hasValue literal against a double value column crashed the whole
    plan with CAST_INVALID_INPUT; round-13 fix)."""
    t = literal_typed(term)
    if (col_hint is None or t.hint == col_hint
            or (t.hint in _COMPARABLE_NUM and col_hint in _COMPARABLE_NUM)):
        return col == t.col
    return F.lit(False)


def _expr_substitute(e: A.Expr, mapping: dict) -> A.Expr:
    """Replace ``EVar`` nodes named in ``mapping`` with their defining
    ASTs — BIND inlining, so the grouped-pushdown analysis sees e.g. a
    tumbling bucket built through an intermediate ``?secs`` variable as
    one closed expression over the timestamp variable."""
    if isinstance(e, A.EVar):
        return mapping.get(e.name, e)
    if isinstance(e, (A.EOr, A.EAnd)):
        return type(e)(_expr_substitute(e.left, mapping),
                       _expr_substitute(e.right, mapping))
    if isinstance(e, (A.ECmp, A.EArith)):
        return type(e)(e.op, _expr_substitute(e.left, mapping),
                       _expr_substitute(e.right, mapping))
    if isinstance(e, (A.ENot, A.ENeg)):
        return type(e)(_expr_substitute(e.inner, mapping))
    if isinstance(e, A.EIn):
        return A.EIn(_expr_substitute(e.expr, mapping),
                     tuple(_expr_substitute(o, mapping) for o in e.options),
                     e.negated)
    if isinstance(e, A.EFunc):
        return A.EFunc(e.name, tuple(_expr_substitute(a, mapping)
                                     for a in e.args))
    return e  # literals / IRIs / EExists (rejected upstream)


def _collect_time_accessors(e: A.Expr, tname: str, acc: set) -> bool:
    """True iff every reference to the timestamp variable ``tname``
    inside ``e`` goes through a GRANULE-RESPECTING accessor: a calendar
    extract (YEAR..SECONDS — all integer-valued in this engine), the
    whole-second epoch conversion, or a ``FLOOR(epoch / K)`` tumbling
    bucket with integer K. Such an expression is a pure function of
    (granule, other bindings), so evaluating it on a remote group's
    representative row yields exactly its value on every point of the
    group. Accessors are recorded in ``acc`` as ``("unit", u)`` /
    ``("bucket", K)`` for granule resolution."""
    from otit_swt_spark.terms import DATETIME_AS_SECONDS

    def is_epoch(x):
        return (isinstance(x, A.EFunc) and x.name == DATETIME_AS_SECONDS
                and len(x.args) == 1 and isinstance(x.args[0], A.EVar)
                and x.args[0].name == tname)

    if isinstance(e, A.EVar):
        return e.name != tname
    if isinstance(e, (A.ELiteral, A.EIri)):
        return True
    if isinstance(e, A.EFunc):
        unit = {"YEAR": "year", "MONTH": "month", "DAY": "day",
                "HOURS": "hour", "MINUTES": "minute",
                "SECONDS": "second"}.get(e.name)
        if unit and len(e.args) == 1 and isinstance(e.args[0], A.EVar) \
                and e.args[0].name == tname:
            acc.add(("unit", unit))
            return True
        if is_epoch(e):
            # DateTimeAsSeconds truncates to whole seconds — a function
            # of the 'second' granule
            acc.add(("unit", "second"))
            return True
        if e.name == "FLOOR" and len(e.args) == 1:
            a0 = e.args[0]
            if isinstance(a0, A.EArith) and a0.op == "/" \
                    and is_epoch(a0.left) and isinstance(a0.right, A.ELiteral):
                try:
                    k = float(a0.right.value.lexical)
                except (TypeError, ValueError):
                    k = 0.0
                if k > 0 and k == int(k):
                    acc.add(("bucket", int(k)))
                    return True
        return all(_collect_time_accessors(a, tname, acc) for a in e.args)
    if isinstance(e, (A.EOr, A.EAnd, A.ECmp, A.EArith)):
        return (_collect_time_accessors(e.left, tname, acc)
                and _collect_time_accessors(e.right, tname, acc))
    if isinstance(e, (A.ENot, A.ENeg)):
        return _collect_time_accessors(e.inner, tname, acc)
    if isinstance(e, A.EIn):
        return _collect_time_accessors(e.expr, tname, acc) and all(
            _collect_time_accessors(o, tname, acc) for o in e.options)
    return False  # EExists / aggregates / unknown nodes: refuse


def _resolve_granule(acc: set) -> tuple:
    """Fold collected accessors into ONE remote GROUP BY granule that
    REFINES every accessor — finer-or-equal grouping is always sound
    because the Spark side recomputes the exact keys from each group's
    representative timestamp and re-aggregates the partials. A single
    pure bucket width groups exactly (rows-served == buckets); mixed
    forms fall back to the finest calendar unit that still refines
    everything (a K-second bucket is a function of the minute/hour/day
    truncation whenever 60/3600/86400 divides K — epoch 0 is midnight,
    so epoch buckets align with calendar boundaries in the engine's
    naive-UTC convention)."""
    if not acc:
        return ("all",)
    buckets = {k for kind, k in acc if kind == "bucket"}
    units = {u for kind, u in acc if kind == "unit"}
    if buckets and not units and len(buckets) == 1:
        return ("bucket", next(iter(buckets)))
    for k in buckets:
        units.add("day" if k % 86400 == 0 else
                  "hour" if k % 3600 == 0 else
                  "minute" if k % 60 == 0 else "second")
    order = {u: i for i, u in enumerate(_TIME_UNITS)}
    return ("trunc", max(units, key=lambda u: order[u]))


def _pattern_free_expr_vars(p: A.GraphPattern) -> set[str]:
    """Variables referenced by expressions inside ``p`` (BIND/FILTER/
    ORDER BY/aggregate/nested-LeftJoin expressions) but not bound by ``p``
    itself — if any of these are bound on the left of an OPTIONAL, the right
    side is *correlated* and cannot be compiled standalone."""
    free: set[str] = set()
    for node in A.walk_patterns(p):
        if isinstance(node, A.Filter):
            free |= A.expr_variables(node.expr)
        elif isinstance(node, A.Extend):
            free |= A.expr_variables(node.expr)
        elif isinstance(node, A.OrderBy):
            for e, _ in node.keys:
                free |= A.expr_variables(e)
        elif isinstance(node, A.Group):
            for a in node.aggregates:
                if a.expr is not None:
                    free |= A.expr_variables(a.expr)
        elif isinstance(node, A.LeftJoin) and node.expr is not None:
            free |= A.expr_variables(node.expr)
    return free - A.pattern_variables(p)


def _contains_exists(e: A.Expr) -> bool:
    if isinstance(e, A.EExists):
        return True
    if isinstance(e, (A.EOr, A.EAnd, A.ECmp, A.EArith)):
        return _contains_exists(e.left) or _contains_exists(e.right)
    if isinstance(e, (A.ENot, A.ENeg)):
        return _contains_exists(e.inner)
    if isinstance(e, A.EIn):
        return _contains_exists(e.expr) or any(_contains_exists(o) for o in e.options)
    if isinstance(e, A.EFunc):
        return any(_contains_exists(a) for a in e.args)
    return False


def _with_deterministic_rid(df: DataFrame) -> DataFrame:
    """Append a deterministic row id: struct(xxhash64 over all columns,
    row_number within the hash group ordered by all columns).

    The matched∪anti OPTIONAL/MINUS forms evaluate the left subtree twice —
    once threaded through the right side, once for the anti branch — and the
    two evaluations must assign IDENTICAL ids. monotonically_increasing_id
    depends on partition layout, so round 1 pinned it with persist()+count(),
    an eager cache of a potentially fact-scale frame. This id is instead a
    pure function of row values plus a total order: duplicates of the same
    row get row_numbers 1..k (which duplicate gets which is arbitrary but
    harmless — they are identical); hash-colliding distinct rows are
    separated deterministically by the order-by over the actual values.
    Cost: one shuffle (the window), no materialization, scale-safe."""
    from pyspark.sql import Window

    cols = [F.col(c) for c in df.columns]
    h = F.xxhash64(*cols)
    w = Window.partitionBy(h).orderBy(*[c.asc_nulls_first() for c in cols])
    return df.withColumn(
        RID, F.struct(h.alias("h"), F.row_number().over(w).alias("r")))


@dataclass(frozen=True)
class VarMeta:
    kind: str  # 'term' (canonical string + optional __dt/__lang cols) | 'native'
    hint: str | None = None  # spark-ish type hint for native columns
    xsd: str | None = None  # statically-known datatype IRI, if any
    #: the variable is statically known to mix incompatible datatypes
    #: (reference raises InconsistentDatatype, hybrid/src/engine.rs:137-198)
    mixed: bool = False


@dataclass
class SolutionMapping:
    """A solution multiset: DataFrame + per-variable metadata.

    Mirrors the reference's Polars frame + column conventions
    (hybrid/src/combiner.rs), with datatype fidelity carried in ``<v>__dt``
    companion columns instead of struct-typed cells."""

    df: DataFrame
    vars: dict[str, VarMeta]
    dt_vars: set[str] = field(default_factory=set)
    lang_vars: set[str] = field(default_factory=set)
    ts_chains: dict[str, dict] = field(default_factory=dict)

    def meta(self, name: str) -> VarMeta | None:
        return self.vars.get(name)

    def dt_col(self, name: str) -> Column | None:
        return F.col(f"{name}__dt") if name in self.dt_vars else None

    def lang_col(self, name: str) -> Column | None:
        return F.col(f"{name}__lang") if name in self.lang_vars else None

    def aux_cols(self, name: str) -> list[str]:
        out = []
        if name in self.dt_vars:
            out.append(f"{name}__dt")
        if name in self.lang_vars:
            out.append(f"{name}__lang")
        return out


def _common_hint(a: str | None, b: str | None) -> str:
    if a == b and a is not None:
        return a
    if a in NUMERIC and b in NUMERIC:
        return "long" if (a in INTEGRAL and b in INTEGRAL) else "double"
    if "timestamp" in (a, b):
        return "timestamp"
    if a in NUMERIC or b in NUMERIC:
        return "double"
    return "string"


def _cast_var_to_native(sm: SolutionMapping, name: str, hint: str) -> SolutionMapping:
    df = sm.df.withColumn(name, F.col(name).try_cast(_spark_type(hint)))
    for aux in sm.aux_cols(name):
        df = df.drop(aux)
    vars2 = dict(sm.vars)
    vars2[name] = VarMeta("native", hint)
    return replace(sm, df=df, vars=vars2,
                   dt_vars=sm.dt_vars - {name}, lang_vars=sm.lang_vars - {name})


def _spark_type(hint: str) -> str:
    return {
        "long": "long", "int": "int", "double": "double", "float": "float",
        "bool": "boolean", "string": "string", "timestamp": "timestamp",
        "date": "date", "iri": "string",
    }.get(hint, "string")


class Compiler:
    def __init__(self, spark: SparkSession, graph_df: DataFrame, ts_tables: list | None = None,
                 pred_datatypes=None, services: dict | None = None,
                 named_graphs: dict | None = None, http_post=None):
        self.http_post = http_post
        self.spark = spark
        self.graph_df = graph_df
        self.ts_tables = ts_tables or []
        self._counter = itertools.count()
        self._ts_df: DataFrame | None = None
        self._ts_hint: str | None = None
        #: stack of FILTER-derived timestamp-bound hints (var -> (lower,
        #: upper) datetimes) consulted when a pushdown-capable TS backend
        #: is registered; ``None`` entries are scope BARRIERS (MINUS right
        #: sides, EXISTS inners, subselects) past which outer hints must
        #: not leak — see _ts_relation_for_join
        self._ts_bound_hints: list[dict | None] = []
        #: active grouped-pushdown specs (innermost last) — published by
        #: compile_group when its static analysis proves the GROUP BY can
        #: aggregate remotely, consumed by _ts_relation_for_join
        self._group_pushdown_stack: list[dict] = []
        #: endpoint IRI -> GraphStore for SERVICE patterns (in-process
        #: federation; reference rewrites SERVICE to its static side,
        #: rewriting/graph_patterns/service_pattern.rs:1)
        self.services = services or {}
        #: graph IRI -> GraphStore for GRAPH patterns (named graphs)
        self.named_graphs = named_graphs or {}
        #: optional callable returning GraphStore.predicate_datatypes() — the
        #: per-predicate datatype catalog that lets compile_triple type object
        #: variables statically (no per-query dtype probe job in Engine)
        self._pred_datatypes = pred_datatypes

    def _object_meta(self, pred_iri: str) -> VarMeta:
        """Static VarMeta for an object variable bound through a constant
        predicate, using the graph's predicate→datatype catalog when
        available. Unknown catalog (no provider) → xsd None → Engine falls
        back to its datatype probe."""
        if self._pred_datatypes is None:
            return VarMeta("term")
        info = self._pred_datatypes().get(pred_iri)
        if info is None:  # predicate absent from graph: column will be empty
            return VarMeta("term", xsd=XSD_STRING)
        if info["mixed"]:
            return VarMeta("term", mixed=True)
        # dt None = IRI-only objects; they render as strings, no cast needed
        return VarMeta("term", xsd=info["dt"] or XSD_STRING)

    # ------------------------------------------------------------------ util

    def fresh(self, hint: str) -> str:
        return f"__{hint}_{next(self._counter)}"

    def ts_relation(self) -> tuple[DataFrame, str]:
        """The tall (id, timestamp, value) relation = union of registered
        tables. One logical time-series store, like the reference's single
        TimeSeriesQueryable backend."""
        if self._ts_df is None:
            if not self.ts_tables:
                raise ValueError("query touches time-series data but no TimeSeriesTable registered")
            self._ts_df, self._ts_hint = self._harmonize_ts_union(
                [t.normalized(self.spark) for t in self.ts_tables])
        return self._ts_df, self._ts_hint

    @staticmethod
    def _harmonize_ts_union(dfs: list[DataFrame]) -> tuple[DataFrame, str]:
        hints = []
        for df in dfs:
            hints.append(
                {"long": "long", "bigint": "long", "int": "long", "smallint": "long",
                 "tinyint": "long", "double": "double", "float": "double",
                 "boolean": "bool", "string": "string"}.get(
                    df.schema["value"].dataType.simpleString(), "double")
            )
        hint = hints[0] if len(set(hints)) == 1 else "double"
        if len(set(hints)) != 1:
            dfs = [d.withColumn("value", F.col("value").cast("double")) for d in dfs]
        elif hint == "long":
            dfs = [d.withColumn("value", F.col("value").cast("long")) for d in dfs]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out, hint

    #: pushdown id-list cap (same bound-join discipline as
    #: SERVICE_BOUND_JOIN_MAX): above this many distinct external ids the
    #: IN-list is omitted from the remote query — an unconstrained fetch
    #: plus the Spark-side join stays correct, and the driver collect
    #: stays bounded
    TS_ID_PUSHDOWN_MAX = 1000

    def _extract_ts_bound_hints(self, expr: A.Expr) -> dict:
        """(var -> (lower, upper)) timestamp bounds from the top-level
        conjunction of a FILTER — the piece of the filter a pushdown-capable
        TS backend (sources/flight.py) can execute remotely. Strict bounds
        are relaxed to inclusive (the remote WHERE only needs to be IMPLIED
        by the filter, which re-applies exactly afterwards); xsd:date
        literals widen to the day's [00:00, 24:00) superset."""
        import datetime as _dt

        from otit_swt_spark.terms import XSD_DATE, XSD_DATETIME

        def conjuncts(e):
            if isinstance(e, A.EAnd):
                yield from conjuncts(e.left)
                yield from conjuncts(e.right)
            else:
                yield e

        hints: dict[str, tuple] = {}
        for c in conjuncts(expr):
            if not isinstance(c, A.ECmp):
                continue
            op = c.op
            if isinstance(c.left, A.EVar) and isinstance(c.right, A.ELiteral):
                var, lit = c.left.name, c.right.value
            elif isinstance(c.right, A.EVar) and isinstance(c.left, A.ELiteral):
                var, lit = c.right.name, c.left.value
                op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op, op)
            else:
                continue
            if lit.datatype not in (XSD_DATETIME, XSD_DATE):
                continue
            try:
                dtv = _dt.datetime.fromisoformat(
                    lit.lexical.replace("Z", "+00:00"))
            except ValueError:
                continue
            if dtv.tzinfo is not None:
                dtv = dtv.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            lo_v, hi_v = dtv, dtv
            if lit.datatype == XSD_DATE:
                hi_v = dtv + _dt.timedelta(days=1)
            lo, hi = hints.get(var, (None, None))
            if op in (">", ">=", "="):
                lo = lo_v if lo is None else max(lo, lo_v)
            if op in ("<", "<=", "="):
                hi = hi_v if hi is None else min(hi, hi_v)
            hints[var] = (lo, hi)
        return hints

    def _lookup_ts_bounds(self, var: str) -> tuple:
        """Intersect the bounds every enclosing FILTER scope has published
        for ``var``, stopping at the first scope barrier (None)."""
        lo = hi = None
        for entry in reversed(self._ts_bound_hints):
            if entry is None:
                break
            b = entry.get(var)
            if b is None:
                continue
            elo, ehi = b
            if elo is not None:
                lo = elo if lo is None else max(lo, elo)
            if ehi is not None:
                hi = ehi if hi is None else min(hi, ehi)
        return lo, hi

    def _ts_relation_for_join(self, sm: "SolutionMapping",
                              tj: dict) -> tuple[DataFrame, str]:
        """The (id, timestamp, value) relation for ONE ts join, with the
        composed restriction — bounded external-id IN-list from the static
        side, timestamp bounds from enclosing FILTERs, literal value/time
        equality from the chain itself — pushed into backends that can
        execute it remotely (reference timeseries_sql_rewrite.rs:115-205 /
        arrow_flight_sql_database.rs:121-230 parity). Every constraint is
        re-applied Spark-side afterwards, so the pushdown is a pure
        fetch-volume optimization. Tables without pushdown support load
        exactly as before; with none registered this is ts_relation()."""
        import datetime as _dt

        if not self.ts_tables:
            raise ValueError("query touches time-series data but no TimeSeriesTable registered")
        if "probed_ids" not in tj and "probe_overflow" not in tj \
                and not any(
                    getattr(t, "supports_pushdown", False)
                    for t in self.ts_tables):
            # no pre-probe ran (caller outside compile_bgp) and nothing
            # to push remotely: the plain union is already optimal
            return self.ts_relation()

        ts_lower = ts_upper = value_eq = None
        t_term, v_term = tj.get("t"), tj.get("v")
        if isinstance(t_term, Variable):
            ts_lower, ts_upper = self._lookup_ts_bounds(t_term.name)
        elif isinstance(t_term, Literal):
            try:
                dtv = _dt.datetime.fromisoformat(
                    t_term.lexical.replace("Z", "+00:00"))
                if dtv.tzinfo is not None:
                    dtv = dtv.astimezone(
                        _dt.timezone.utc).replace(tzinfo=None)
                ts_lower = ts_upper = dtv
            except ValueError:
                pass
        if isinstance(v_term, Literal):
            value_eq = _pushdown_value_literal(v_term)

        # the reference's bound join: distinct external ids from the static
        # side, rendered into the remote SQL — bounded by the cap.
        # compile_bgp pre-probes all chains in one job (_probe_chain_ids);
        # the per-chain probe below only remains for callers outside it.
        ids = None
        if "probed_ids" in tj:
            ids = tj["probed_ids"]
        else:
            eid = tj.get("eid")
            if eid and eid in sm.df.columns:
                cap = self.TS_ID_PUSHDOWN_MAX
                rows = (sm.df.select(eid).where(F.col(eid).isNotNull())
                        .distinct().limit(cap + 1).collect())
                if len(rows) <= cap:
                    ids = sorted({r[0] for r in rows})

        # grouped pushdown (reference GroupedTimeSeriesQuery,
        # preparing/graph_patterns/group_pattern.rs:18-105): when the
        # enclosing GROUP BY proved eligible, the store aggregates
        # partials per (id, granule) remotely — rows-served ~ groups
        spec = (self._group_pushdown_stack[-1]
                if self._group_pushdown_stack else None)
        if spec is not None and not spec["fired"] \
                and not spec.get("sync") \
                and isinstance(tj.get("t"), Variable) \
                and tj["t"].name == spec["t"]:
            v_ok = ((spec["v"] is None and tj.get("v") is None)
                    or (spec["v"] is not None
                        and isinstance(tj.get("v"), Variable)
                        and tj["v"].name == spec["v"]))
            if v_ok:
                grouped = self._grouped_ts_relation(spec, ids)
                if grouped is not None:
                    spec["fired"] = True
                    return grouped

        if ids is None and ts_lower is None and ts_upper is None \
                and value_eq is None:
            return self.ts_relation()
        dfs = []
        for t in self.ts_tables:
            if getattr(t, "supports_pushdown", False):
                v_eq = value_eq
                if isinstance(v_eq, str) and not isinstance(v_eq, bool):
                    # A string equality renders as value = 'lit'; against
                    # a numeric remote value column that HARD-ERRORS on
                    # PostgreSQL-dialect stores (invalid input syntax)
                    # where the Spark-side null-safe comparison would just
                    # return empty. Push string equality only when this
                    # table's value type is known to be string; otherwise
                    # leave it to the Spark-side filter.
                    from otit_swt_spark.terms import XSD_STRING
                    try:
                        if t.value_xsd(self.spark) != XSD_STRING:
                            v_eq = None
                    except Exception:
                        v_eq = None
                dfs.append(t.restricted_normalized(
                    self.spark, ids=ids, ts_lower=ts_lower,
                    ts_upper=ts_upper, value_eq=v_eq))
            else:
                # Spark-native table: apply the SAME restriction as a
                # plain filter over the normalized relation. The id set
                # comes from a join, so Catalyst cannot derive it — the
                # explicit IN-list prunes the chain before its exchange
                # and reaches PushedFilters on a parquet-backed scan;
                # the timestamp bounds push down the ordinary way. Both
                # are supersets of the join's own constraints, which are
                # still applied, so results are unchanged (guide §3.2).
                df = t.normalized(self.spark)
                if ids is not None:
                    df = df.where(F.col("id").isin(ids))
                if ts_lower is not None:
                    df = df.where(F.col("timestamp") >= F.lit(ts_lower))
                if ts_upper is not None:
                    df = df.where(F.col("timestamp") <= F.lit(ts_upper))
                dfs.append(df)
        return self._harmonize_ts_union(dfs)

    def _analyze_group_pushdown(self, p: A.Group,
                                input: SolutionMapping | None) -> dict | None:
        """Static eligibility proof for the reference's GROUP BY pushdown
        (preparing/graph_patterns/group_pattern.rs:18-105 — a Group whose
        inner resolves to exactly ONE time-series query is handed to the
        remote store; SQL parity target timeseries_sql_rewrite.rs:470-560
        create_grouped_query). Spark-first restructuring: instead of
        translating the SPARQL aggregate list into remote SQL verbatim,
        the store aggregates PARTIALS — COUNT/SUM/MIN/MAX per (series id,
        time granule) — and the ordinary Spark GROUP BY re-aggregates
        them (sum of sums, min of mins, sum/count for AVG). The granule
        is chosen to REFINE every timestamp-derived grouping key, so the
        result is exact regardless of remote expression semantics.
        (For float SUM/AVG, "exact" means the same multiset of addends —
        the fold ORDER differs, exactly as it already does between any
        two shuffle layouts of the plain Spark aggregation.)

        Conditions (each one guarantees partial rows behave exactly like
        point rows under the rest of the plan):
        - inner tree contains only BGP/Filter/Extend/Join nodes;
        - exactly one hasDataPoint chain, timestamp+value both variables,
          none of dp/t/v reused anywhere else or pre-bound by ``input``;
        - every BIND is EXISTS-free and value-free, and any reference to
          the timestamp goes through granule-respecting accessors
          (_collect_time_accessors);
        - every FILTER conjunct that touches the timestamp is either a
          direct t-vs-dateTime-literal bound (rendered into the remote
          WHERE with EXACT strictness) or granule-constant;
        - group keys never name t/v/dp directly;
        - every aggregate is non-DISTINCT COUNT(*) or
          COUNT/SUM/AVG/MIN/MAX over the bare value variable.

        Returns the mutable spec consumed by _ts_relation_for_join (which
        still decides per-backend and may decline), or None — in which
        case the compiled plan is identical to the non-pushdown one."""
        import datetime as _dt

        if not any(getattr(t, "supports_pushdown", False)
                   for t in self.ts_tables):
            return None

        triples: list[A.TriplePattern] = []
        extends: list[tuple[str, A.Expr]] = []
        filters: list[A.Expr] = []

        def walk(node) -> bool:
            if isinstance(node, A.BGP):
                triples.extend(node.patterns)
                return True
            if isinstance(node, A.Filter):
                filters.append(node.expr)
                return walk(node.inner)
            if isinstance(node, A.Extend):
                extends.append((node.var, node.expr))
                return walk(node.inner)
            if isinstance(node, A.Join):
                return walk(node.left) and walk(node.right)
            return False

        if not walk(p.inner):
            return None

        chains: dict[str, dict[str, list]] = {}
        rest: list[A.TriplePattern] = []
        for tp in triples:
            pv = tp.p.value if isinstance(tp.p, IRI) else None
            if pv == HAS_DATA_POINT and isinstance(tp.o, Variable):
                chains.setdefault(tp.o.name, {}).setdefault(
                    "ts_var", []).append(tp.s)
            elif pv == HAS_TIMESTAMP and isinstance(tp.s, Variable):
                chains.setdefault(tp.s.name, {}).setdefault(
                    "t", []).append(tp.o)
            elif pv == HAS_VALUE and isinstance(tp.s, Variable):
                chains.setdefault(tp.s.name, {}).setdefault(
                    "v", []).append(tp.o)
            else:
                rest.append(tp)
        if not chains:
            return None
        # per-chain validation (shared by the single- and multi-chain
        # forms): exactly one ts_var/t each, at most one v, all terms
        # variables; a value-less chain (hasDataPoint+hasTimestamp
        # only) is still groupable for COUNT(*)-shaped queries
        chain_list: list[tuple[str, str, str | None]] = []  # (dp, t, v)
        for dp, info in chains.items():
            if any(len(v) != 1 for v in info.values()) or not (
                    {"ts_var", "t"} <= set(info) <= {"ts_var", "t", "v"}):
                return None
            t_term = info["t"][0]
            v_term = info["v"][0] if "v" in info else None
            if not isinstance(t_term, Variable):
                return None
            if v_term is not None and not isinstance(v_term, Variable):
                return None
            chain_list.append((dp, t_term.name,
                               v_term.name if v_term is not None else None))

        sync = len(chain_list) > 1
        if sync:
            # multi-chain: groupable only as a SYNCHRONIZED join — every
            # chain must share ONE timestamp variable (the reference's
            # InnerSynchronized shape, preparing/synchronization.rs:5-55,
            # grouped remotely per timeseries_sql_rewrite.rs:356-428 +
            # 470-560)
            tnames = {t for _, t, _ in chain_list}
            if len(tnames) != 1:
                return None
        tname = chain_list[0][1]
        vnames = [v for _, _, v in chain_list if v is not None]
        dps = [dp for dp, _, _ in chain_list]
        special = set(dps) | {tname} | set(vnames)
        if len(special) != len(dps) + 1 + len(vnames):
            return None
        for dp, info in chains.items():
            ts_var = info["ts_var"][0]
            if isinstance(ts_var, Variable) and ts_var.name in special:
                return None
        if input is not None and (special & set(input.vars)
                                  or set(dps) & set(input.ts_chains)):
            return None
        vname_set = set(vnames)
        for tp in rest:
            terms = [tp.s, tp.o] + ([tp.p] if isinstance(tp.p, Variable)
                                    else [])
            if any(isinstance(x, Variable) and x.name in special
                   for x in terms):
                return None

        acc: set = set()
        derived: dict[str, A.Expr] = {}
        derived_acc: dict[str, set] = {}
        for var, expr in reversed(extends):  # innermost definition first
            if _contains_exists(expr) or var in special:
                return None
            sub = _expr_substitute(expr, derived)
            used = A.expr_variables(sub)
            if used & vname_set or used & set(dps):
                return None
            if tname in used:
                # validate now, but fold the accessors into the granule
                # only if the var is actually USED as a group key or in
                # a filter — an intermediate BIND (?secs feeding the
                # bucket) must not force a finer granule than its
                # consumers need
                var_acc: set = set()
                if not _collect_time_accessors(sub, tname, var_acc):
                    return None
                derived[var] = sub
                derived_acc[var] = var_acc

        ts_lo = ts_hi = None  # (datetime, strict)

        def tighten(lo: bool, val, strict: bool):
            nonlocal ts_lo, ts_hi
            cur = ts_lo if lo else ts_hi
            better = (cur is None
                      or (val > cur[0] if lo else val < cur[0])
                      or (val == cur[0] and strict and not cur[1]))
            if better:
                if lo:
                    ts_lo = (val, strict)
                else:
                    ts_hi = (val, strict)

        def parse_bound(c) -> bool:
            if not isinstance(c, A.ECmp):
                return False
            op, lhs, rhs = c.op, c.left, c.right
            if isinstance(rhs, A.EVar) and isinstance(lhs, A.ELiteral):
                lhs, rhs = rhs, lhs
                op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op, op)
            if not (isinstance(lhs, A.EVar) and lhs.name == tname
                    and isinstance(rhs, A.ELiteral)):
                return False
            lit = rhs.value
            if lit.datatype != XSD_DATETIME or op not in (
                    "<", "<=", ">", ">=", "="):
                return False
            try:
                dtv = _dt.datetime.fromisoformat(
                    lit.lexical.replace("Z", "+00:00"))
            except ValueError:
                return False
            if dtv.tzinfo is not None:
                dtv = dtv.astimezone(_dt.timezone.utc).replace(tzinfo=None)
            if op in (">", ">=", "="):
                tighten(True, dtv, op == ">")
            if op in ("<", "<=", "="):
                tighten(False, dtv, op == "<")
            return True

        def conjuncts(e):
            if isinstance(e, A.EAnd):
                yield from conjuncts(e.left)
                yield from conjuncts(e.right)
            else:
                yield e

        for fexpr in filters:
            if _contains_exists(fexpr):
                return None
            sub = _expr_substitute(fexpr, derived)
            used = A.expr_variables(sub)
            if used & vname_set or used & set(dps):
                return None
            if tname not in used:
                continue
            for c in conjuncts(sub):
                if tname not in A.expr_variables(c):
                    continue
                if parse_bound(c):
                    continue
                if not _collect_time_accessors(c, tname, acc):
                    return None

        if any(v in special for v in p.by):
            return None
        for v in p.by:
            acc |= derived_acc.get(v, set())
        agg_needs = {"COUNT": {"n"}, "SUM": {"sum"}, "AVG": {"sum", "n"},
                     "MIN": {"min"}, "MAX": {"max"}}
        chain_needs: dict[str, set] = {v: set() for v in vnames}
        count_star = False
        for a in p.aggregates:
            if a.distinct:
                return None
            if a.name == "COUNT" and a.expr is None:
                count_star = True
                continue
            if a.name in agg_needs and isinstance(a.expr, A.EVar) \
                    and a.expr.name in chain_needs:
                chain_needs[a.expr.name] |= agg_needs[a.name]
                continue
            return None

        granule = _resolve_granule(acc)
        if not sync:
            dp, _, vname = chain_list[0]
            needs = set(chain_needs.get(vname, set()))
            if count_star:
                needs.add("cnt")
            return {
                "t": tname, "v": vname, "dp": dp,
                "granule": granule,
                "ts_lower": ts_lo, "ts_upper": ts_hi,
                "needs": needs,
                "cols": {k: self.fresh(f"gp_{k}")
                         for k in ("cnt", "n", "sum", "min", "max")},
                "fired": False,
            }
        return {
            "sync": True, "t": tname,
            "granule": granule,
            "ts_lower": ts_lo, "ts_upper": ts_hi,
            "cnt_col": self.fresh("gp_cnt"),
            "chains": {dp: {
                "v": v,
                "needs": set(chain_needs.get(v, set())) if v else set(),
                "cols": {k: self.fresh(f"gp_{k}")
                         for k in ("n", "sum", "min", "max")},
            } for dp, _, v in chain_list},
            "fired": False,
        }

    def _grouped_ts_relation(self, spec: dict, ids) -> tuple | None:
        """The (id, representative timestamp, NULL value, partials)
        relation for a grouped pushdown. Capable backends execute
        COUNT/SUM/MIN/MAX per (id, granule) REMOTELY; non-capable tables
        contribute one partial row per point (cnt=1, sum=min=max=value),
        so the union re-aggregates uniformly and exactly. Returns None —
        and the caller falls back to the point fetch — when any table's
        value type is outside the exact-re-aggregation set (strings sort
        by store collation, decimals carry engine-specific precision
        rules) or no backend actually produced a grouped frame."""
        # value-typed partials (SUM/MIN/MAX) demand an exactly
        # re-aggregatable value type; a count-only spec (COUNT(*) /
        # COUNT(?v), incl. value-less chains) needs no such gate —
        # counting works for any remote value type
        value_aggs = bool({"sum", "min", "max"} & spec["needs"])
        hint = "double"
        if value_aggs:
            hint_map = {}
            from otit_swt_spark.terms import XSD
            for n in ("integer", "long", "int", "short", "byte",
                      "nonNegativeInteger", "unsignedInt", "unsignedLong"):
                hint_map[XSD + n] = "long"
            hint_map[XSD + "double"] = "double"
            hint_map[XSD + "float"] = "double"

            hints = []
            for t in self.ts_tables:
                try:
                    x = t.value_xsd(self.spark)
                except Exception:
                    return None
                h = hint_map.get(x)
                if h is None:
                    return None
                hints.append(h)
            hint = "long" if all(h == "long" for h in hints) else "double"

        any_grouped = False
        dfs = []
        for t in self.ts_tables:
            g = None
            if getattr(t, "supports_pushdown", False):
                g = t.grouped_restricted_normalized(
                    self.spark, granule=spec["granule"], ids=ids,
                    ts_lower=spec["ts_lower"], ts_upper=spec["ts_upper"],
                    agg_type=hint, value_aggs=value_aggs)
            if g is not None:
                any_grouped = True
                dfs.append(g)
            else:
                raw = F.col("value")
                v = raw.cast(hint) if value_aggs else F.lit(None).cast(hint)
                dfs.append(t.normalized(self.spark).select(
                    "id", "timestamp", v.alias("value"),
                    F.col("__part_year"), F.col("__part_month"),
                    F.col("__part_day"),
                    F.lit(1).cast("long").alias("__gp_cnt"),
                    F.when(raw.isNotNull(), F.lit(1)).otherwise(F.lit(0))
                    .cast("long").alias("__gp_n"),
                    v.alias("__gp_sum"), v.alias("__gp_min"),
                    v.alias("__gp_max")))
        if not any_grouped:
            return None
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out, hint

    def _partial_reagg(self, a: A.EAggregate, sm: SolutionMapping,
                       spec: dict) -> tuple[Column, VarMeta]:
        """Final aggregation over remote partials — the Spark half of the
        grouped pushdown. _analyze_group_pushdown guarantees only these
        shapes reach here; metas mirror _compile_aggregate's exactly so
        downstream projection/typing can't tell the paths apart."""
        if spec.get("sync"):
            if a.expr is None:  # COUNT(*)
                return F.sum(F.col(spec["cnt_col"])).cast("long"), \
                    VarMeta("native", "long")
            c = next(ch["cols"] for ch in spec["chains"].values()
                     if ch["v"] == a.expr.name)
        else:
            if a.expr is None:  # COUNT(*)
                return F.sum(F.col(spec["cols"]["cnt"])).cast("long"), \
                    VarMeta("native", "long")
            c = spec["cols"]
        val_hint = sm.vars[c["sum"]].hint
        if a.name == "COUNT":
            return F.sum(F.col(c["n"])).cast("long"), VarMeta("native", "long")
        if a.name == "SUM":
            return F.sum(F.col(c["sum"])), VarMeta("native", val_hint)
        if a.name == "AVG":
            n = F.sum(F.col(c["n"]))
            return F.when(n > 0, F.sum(F.col(c["sum"]).cast("double")) / n), \
                VarMeta("native", "double")
        if a.name == "MIN":
            return F.min(F.col(c["min"])), VarMeta("native", val_hint)
        if a.name == "MAX":
            return F.max(F.col(c["max"])), VarMeta("native", val_hint)
        raise AssertionError(f"unexpected pushdown aggregate {a.name}")

    # --------------------------------------------------------------- joining

    def _coerce_join_keys(self, left: SolutionMapping, right: SolutionMapping,
                          shared: list[str]) -> tuple[SolutionMapping, SolutionMapping]:
        for v in shared:
            lm, rm = left.vars[v], right.vars[v]
            if lm.kind == "native" and rm.kind == "term":
                right = _cast_var_to_native(right, v, lm.hint or "string")
            elif lm.kind == "term" and rm.kind == "native":
                left = _cast_var_to_native(left, v, rm.hint or "string")
            elif lm.kind == "native" and rm.kind == "native" and lm.hint != rm.hint:
                h = _common_hint(lm.hint, rm.hint)
                left = _cast_var_to_native(left, v, h)
                right = _cast_var_to_native(right, v, h)
        return left, right

    def join_solutions(self, left: SolutionMapping, right: SolutionMapping,
                       how: str = "inner") -> SolutionMapping:
        shared = [v for v in left.vars if v in right.vars]
        left, right = self._coerce_join_keys(left, right, shared)
        # TERM-identity join keys: where a shared term var carries a
        # __dt/__lang companion on either side (or the sides disagree on
        # a statically-known datatype), joining on the canonical string
        # alone would conflate distinct RDF terms with one lexical form
        # ("1"^^xsd:integer vs "1"^^xsd:string, "x"@en vs "x"@fr). Those
        # vars join on value + effective datatype + effective language
        # instead. Residual (documented) canonicalization trade: a plain
        # literal and an IRI with the same lexical and NO companions on
        # either side still conflate.
        ident = [v for v in shared
                 if left.vars[v].kind == "term"
                 and right.vars[v].kind == "term"
                 and (v in left.dt_vars or v in right.dt_vars
                      or v in left.lang_vars or v in right.lang_vars
                      or left.vars[v].xsd != right.vars[v].xsd)]
        sep = "\x01"

        def _tkey(sm_, v):
            dt = (F.col(f"{v}__dt") if v in sm_.dt_vars
                  else F.lit(sm_.vars[v].xsd))
            lg = (F.col(f"{v}__lang") if v in sm_.lang_vars
                  else F.lit(None).cast("string"))
            return F.concat(F.col(v).cast("string"), F.lit(sep),
                            F.coalesce(dt, F.lit("")), F.lit(sep),
                            F.coalesce(lg, F.lit("")))

        ldf = left.df
        rdf = right.df
        keys = list(shared)
        for v in ident:
            ldf = ldf.withColumn(f"__tk_{v}", _tkey(left, v))
            rdf = rdf.withColumn(f"__tk_{v}", _tkey(right, v))
            # right's value column is a function of the key — drop it so
            # the named join doesn't duplicate it (left's copy survives)
            rdf = rdf.drop(v)
            keys[keys.index(v)] = f"__tk_{v}"
        # drop right-side aux duplicates for shared term vars (values agree on
        # matched rows), and resolve any other duplicate non-var columns
        for v in shared:
            for aux in right.aux_cols(v):
                if aux in ldf.columns:
                    rdf = rdf.drop(aux)
        dup_extra = [c for c in rdf.columns
                     if c in ldf.columns and c not in keys]
        for c in dup_extra:
            rdf = rdf.drop(c)
        if shared:
            df = ldf.join(rdf, on=keys, how=how)
            for v in ident:
                df = df.drop(f"__tk_{v}")
        elif how == "inner":
            df = left.df.crossJoin(rdf)
        else:
            df = left.df.crossJoin(rdf)  # left join without keys = cross for our uses
        vars2 = dict(right.vars)
        vars2.update(left.vars)
        # right-only var meta wins for right-only vars; recompute aux sets
        for v, m in right.vars.items():
            if v not in left.vars:
                vars2[v] = m
        dt = set(left.dt_vars) | {v for v in right.dt_vars if f"{v}__dt" in df.columns}
        lang = set(left.lang_vars) | {v for v in right.lang_vars if f"{v}__lang" in df.columns}
        chains = dict(left.ts_chains)
        chains.update(right.ts_chains)
        return SolutionMapping(df, vars2, dt, lang, chains)

    def _join_values(self, left: SolutionMapping, vsm: SolutionMapping
                     ) -> SolutionMapping:
        """Join outer solutions with an inline VALUES relation under SPARQL
        COMPATIBILITY semantics: an UNDEF cell is compatible with any
        binding (SPARQL 1.1 §10.2), so rows with UNDEF cannot go through
        the plain equi-join (NULL = x filters them out). When no shared
        column contains UNDEF the plain equi-join is used; otherwise the
        (tiny, inline) VALUES side is broadcast into a theta join whose
        predicate is `undef OR equal` per shared var, and the result
        binding takes whichever side is bound."""
        shared = [v for v in left.vars if v in vsm.vars]
        if not shared:
            return self.join_solutions(left, vsm)
        # UNDEF probe: does ANY shared cell hold UNDEF? Answered with a
        # filter + limit(1) so the driver reads AT MOST ONE row however
        # large a programmatic VALUES frame is (round 12: replaced a
        # capped full collect — a bound of 1 needs no cap)
        undef_any = F.lit(False)
        for v in shared:
            undef_any = undef_any | F.col(v).isNull()
        if not vsm.df.where(undef_any).limit(1).collect():
            return self.join_solutions(left, vsm)
        # UNDEF markers must be captured on the ORIGINAL frame: after
        # _coerce_join_keys a try_cast failure ("abc" -> double) also yields
        # NULL, and treating that as a wildcard would make an incompatible
        # VALUES cell match every outer row.
        vsm = replace(vsm, df=vsm.df.select(
            "*", *[F.col(v).isNull().alias(f"__u_{v}") for v in shared]))
        left, vsm = self._coerce_join_keys(left, vsm, shared)
        rdf = vsm.df
        for v in shared:
            rdf = rdf.withColumnRenamed(v, f"__v_{v}")
        cond = F.lit(True)
        for v in shared:
            cond = cond & (F.col(f"__u_{v}") | F.col(v).isNull()
                           | (F.col(f"__v_{v}") == F.col(v)))
        df = left.df.join(F.broadcast(rdf), cond, "inner")
        for v in shared:
            df = df.withColumn(v, F.coalesce(F.col(v), F.col(f"__v_{v}"))) \
                   .drop(f"__v_{v}", f"__u_{v}")
        vars2 = dict(left.vars)
        for v, m in vsm.vars.items():
            if v not in vars2:
                vars2[v] = m
        return SolutionMapping(df, vars2, set(left.dt_vars),
                               set(left.lang_vars), dict(left.ts_chains))

    def harmonize_for_union(self, l: SolutionMapping, r: SolutionMapping
                            ) -> tuple[SolutionMapping, SolutionMapping]:
        for v in [v for v in l.vars if v in r.vars]:
            lm, rm = l.vars[v], r.vars[v]
            if lm.kind != rm.kind:
                if lm.kind == "term":
                    l = _cast_var_to_native(l, v, rm.hint or "string")
                else:
                    r = _cast_var_to_native(r, v, lm.hint or "string")
            elif lm.kind == "native" and lm.hint != rm.hint:
                h = _common_hint(lm.hint, rm.hint)
                l = _cast_var_to_native(l, v, h)
                r = _cast_var_to_native(r, v, h)
        return l, r

    # --------------------------------------------------------------- compile

    def compile_query(self, q: A.SelectQuery) -> SolutionMapping:
        return self.compile_pattern(q.pattern, None)

    def compile_pattern(self, p: A.GraphPattern, input: SolutionMapping | None) -> SolutionMapping:
        if isinstance(p, A.BGP):
            return self.compile_bgp(p, input)
        if isinstance(p, A.Join):
            left = self.compile_pattern(p.left, input)
            return self.compile_pattern(p.right, left)
        if isinstance(p, A.Filter):
            # Publish this FILTER's timestamp bounds to TS-chain lowering
            # inside `inner`: a pushdown-capable backend renders them into
            # its remote query. Sound because the filter re-applies every
            # constraint afterwards — rows the remote store withholds are
            # exactly rows the filter would drop (or, through OPTIONAL,
            # rows whose t-var arrives unbound and fails the comparison).
            self._ts_bound_hints.append(self._extract_ts_bound_hints(p.expr))
            try:
                sm = self.compile_pattern(p.inner, input)
            finally:
                self._ts_bound_hints.pop()
            return self.apply_filter(sm, p.expr)
        if isinstance(p, A.Extend):
            sm = self.compile_pattern(p.inner, input)
            return self.apply_extend(sm, p.var, p.expr)
        if isinstance(p, A.LeftJoin):
            return self.compile_leftjoin(p, input)
        if isinstance(p, A.Minus):
            return self.compile_minus(p, input)
        if isinstance(p, A.Union):
            lsm = self.compile_pattern(p.left, input)
            rsm = self.compile_pattern(p.right, input)
            lsm, rsm = self.harmonize_for_union(lsm, rsm)
            df = lsm.df.unionByName(rsm.df, allowMissingColumns=True)
            vars2 = dict(rsm.vars)
            vars2.update(lsm.vars)
            # rows come from BOTH branches: reconcile static datatype info for
            # shared term vars (differing branch datatypes = a mixed column)
            for v in lsm.vars:
                lm, rm = lsm.vars[v], rsm.vars.get(v)
                if rm is not None and lm.kind == "term" and rm.kind == "term":
                    if lm.mixed or rm.mixed or (
                            lm.xsd and rm.xsd and lm.xsd != rm.xsd):
                        vars2[v] = VarMeta("term", mixed=True)
                    elif lm.xsd != rm.xsd:  # one side unknown -> unknown
                        vars2[v] = VarMeta("term")
            return SolutionMapping(df, vars2, lsm.dt_vars | rsm.dt_vars,
                                   lsm.lang_vars | rsm.lang_vars,
                                   {**rsm.ts_chains, **lsm.ts_chains})
        if isinstance(p, A.Values):
            vsm = self.compile_values(p)
            if input is None:
                return vsm
            return self._join_values(input, vsm)
        if isinstance(p, A.Group):
            return self.compile_group(p, input)
        if isinstance(p, A.OrderBy):
            sm = self.compile_pattern(p.inner, input)
            return self.apply_order(sm, p.keys)
        if isinstance(p, A.Project):
            # barrier: a subselect's variables are a fresh scope — an outer
            # FILTER's bound on ?t must not restrict an inner chain whose
            # t-var merely shares the name
            self._ts_bound_hints.append(None)
            try:
                sm = self.compile_pattern(p.inner, None)
            finally:
                self._ts_bound_hints.pop()
            sm = self.apply_project(sm, p.variables)
            return self.join_solutions(input, sm) if input is not None else sm
        if isinstance(p, A.Distinct):
            sm = self.compile_pattern(p.inner, input)
            return replace(sm, df=sm.df.dropDuplicates(
                self._term_identity_cols(sm)))
        if isinstance(p, A.Reduced):
            sm = self.compile_pattern(p.inner, input)
            return replace(sm, df=sm.df.dropDuplicates(
                self._term_identity_cols(sm)))
        if isinstance(p, A.Slice):
            sm = self.compile_pattern(p.inner, input)
            df = sm.df
            if p.offset:
                df = df.offset(p.offset)
            if p.limit is not None:
                df = df.limit(p.limit)
            return replace(sm, df=df)
        if isinstance(p, A.Service):
            return self.compile_service(p, input)
        if isinstance(p, A.Graph):
            return self.compile_graph(p, input)
        raise NotImplementedError(f"pattern {type(p).__name__}")

    @staticmethod
    def _term_identity_cols(sm: SolutionMapping) -> list[str]:
        """Columns defining RDF TERM identity for DISTINCT/REDUCED: the
        canonical value plus any __dt/__lang companions — deduping on the
        value alone collapsed "1"^^xsd:integer with "1"^^xsd:string and
        "x"@en with "x"@fr (distinct terms, same lexical)."""
        cols = []
        for v in sm.vars:
            cols.append(v)
            if v in sm.dt_vars:
                cols.append(f"{v}__dt")
            if v in sm.lang_vars:
                cols.append(f"{v}__lang")
        return [c for c in cols if c in sm.df.columns]

    def compile_graph(self, p: A.Graph, input: SolutionMapping | None) -> SolutionMapping:
        """GRAPH <iri> {...}: evaluate against that registered named graph.
        GRAPH ?g {...}: union over every registered named graph, ?g bound to
        the graph name per branch — one Catalyst plan, per-graph scans
        pruned like any other union branch."""
        def against(store) -> SolutionMapping:
            saved = (self.graph_df, self._pred_datatypes)
            self.graph_df = store.df
            self._pred_datatypes = store.predicate_datatypes
            try:
                return self.compile_pattern(p.inner, None)
            finally:
                self.graph_df, self._pred_datatypes = saved

        if isinstance(p.term, IRI):
            store = self.named_graphs.get(p.term.value)
            if store is None:
                raise ValueError(
                    f"named graph <{p.term.value}> is not registered: attach "
                    "it with Engine.register_named_graph(iri, store)")
            sm = against(store)
        else:
            if not self.named_graphs:
                raise ValueError(
                    "GRAPH ?var requires registered named graphs "
                    "(Engine.register_named_graph)")
            sm = None
            gvar = p.term.name
            for iri, store in sorted(self.named_graphs.items()):
                branch = against(store)
                if gvar in branch.vars:
                    # GRAPH ?g { ... ?g ... }: the graph variable is also
                    # bound inside the pattern — constrain the inner binding
                    # to this graph's IRI instead of overwriting it.
                    m = branch.vars[gvar]
                    c = F.col(gvar)
                    if m.kind == "term":
                        cond = (c == iri) & ~c.startswith("_:")
                        dtc = branch.dt_col(gvar)
                        if dtc is not None:
                            cond = cond & dtc.isNull()
                        branch = replace(branch, df=branch.df.filter(cond))
                    elif m.hint == "iri":
                        branch = replace(
                            branch,
                            df=branch.df.filter(c.cast("string") == iri))
                    else:  # a non-IRI native value can never equal a graph IRI
                        branch = replace(branch,
                                         df=branch.df.filter(F.lit(False)))
                else:
                    branch = replace(
                        branch,
                        df=branch.df.withColumn(gvar, F.lit(iri)),
                        vars={**branch.vars, gvar: VarMeta("native", "iri")})
                if sm is None:
                    sm = branch
                else:
                    sm, branch = self.harmonize_for_union(sm, branch)
                    sm = replace(sm, df=sm.df.unionByName(
                        branch.df, allowMissingColumns=True),
                        vars={**branch.vars, **sm.vars},
                        dt_vars=sm.dt_vars | branch.dt_vars,
                        lang_vars=sm.lang_vars | branch.lang_vars)
        return self.join_solutions(input, sm) if input is not None else sm

    def compile_service(self, p: A.Service, input: SolutionMapping | None) -> SolutionMapping:
        """SERVICE <iri> {...}: compile the inner pattern against the
        registered GraphStore for that endpoint and join with the outer
        solutions — one unified Catalyst plan spanning both graphs, so
        cross-graph join ordering/broadcast is optimized like any other
        join. SILENT + unavailable endpoint degrades to the identity
        solution (SPARQL 1.1 Federated Query §2.3)."""
        store = self.services.get(p.endpoint.value)
        if store is None:
            url = p.endpoint.value
            if url.startswith(("http://", "https://")) and p.raw:
                try:
                    sm = self._remote_service_solutions(p, input)
                except Exception:
                    if not p.silent:
                        raise
                    return input if input is not None else SolutionMapping(
                        self.spark.range(1).select(), {})
                return (self.join_solutions(input, sm)
                        if input is not None else sm)
            if p.silent:
                return input if input is not None else SolutionMapping(
                    self.spark.range(1).select(), {})
            raise ValueError(
                f"SERVICE endpoint <{p.endpoint.value}> is not registered "
                "and is not an http(s) URL: attach a GraphStore via "
                "Engine.register_service(iri, store), or use an http(s) "
                "endpoint IRI for live dispatch.")
        saved = (self.graph_df, self._pred_datatypes)
        self.graph_df = store.df
        self._pred_datatypes = store.predicate_datatypes
        try:
            sm = self.compile_pattern(p.inner, None)
        finally:
            self.graph_df, self._pred_datatypes = saved
        return self.join_solutions(input, sm) if input is not None else sm

    #: bound-join cap: above this many distinct outer bindings the VALUES
    #: block is omitted (unconstrained pull + local join stays correct)
    SERVICE_BOUND_JOIN_MAX = 500

    def _service_values_block(self, p: "A.Service",
                              input: SolutionMapping | None) -> str:
        """FedX-style bound join: serialize the outer solutions' DISTINCT
        bindings for variables shared with the service pattern into a
        ``VALUES`` block, so the remote endpoint evaluates the group only
        for rows that can actually join — instead of shipping its full
        pattern extension. Sound as a PRE-filter: the local join afterwards
        re-checks every binding, so partial serialization (a subset of the
        shared vars, or skipping entirely past the cap) never changes
        results, only how much travels. Blank nodes are scoped per store
        and therefore unserializable — any bnode binding disables the
        optimization for that variable."""
        from otit_swt_spark.terms import XSD_STRING

        if input is None or not p.raw:
            return ""
        shared = [v for v in sorted(A.pattern_variables(p.inner))
                  if v in input.vars]
        if not shared:
            return ""

        def esc(s: str) -> str:
            return (s.replace("\\", "\\\\").replace('"', '\\"')
                    .replace("\n", "\\n").replace("\r", "\\r"))

        cols, kinds = [], []
        for v in shared:
            meta = input.vars[v]
            if meta.kind == "term":
                cols.append(F.col(v))
                cols.append(F.col(f"{v}__dt") if v in input.dt_vars
                            else F.lit(None).cast("string"))
                cols.append(F.col(f"{v}__lang") if v in input.lang_vars
                            else F.lit(None).cast("string"))
                kinds.append((v, "term"))
            elif meta.xsd:  # native column with a statically-known datatype
                # type-aware lexical forms: a bare cast("string") of a
                # timestamp yields "2024-01-01 00:00:00" (space separator),
                # which is NOT valid xsd:dateTime and would make the remote
                # endpoint reject the query or match nothing
                dtype = input.df.schema[v].dataType
                if isinstance(dtype, T.TimestampType):
                    cols.append(F.date_format(
                        F.col(v), "yyyy-MM-dd'T'HH:mm:ss.SSS"))
                elif isinstance(dtype, T.DateType):
                    cols.append(F.date_format(F.col(v), "yyyy-MM-dd"))
                else:
                    cols.append(F.col(v).cast("string"))
                cols.append(F.lit(meta.xsd))
                cols.append(F.lit(None).cast("string"))
                kinds.append((v, "native"))
        if not kinds:
            return ""
        cap = self.SERVICE_BOUND_JOIN_MAX
        rows = (input.df.select(*cols).distinct().limit(cap + 1).collect())
        if len(rows) > cap:
            return ""
        tuples = []
        for r in rows:
            terms = []
            for i, (v, kind) in enumerate(kinds):
                val, dt, lang = r[3 * i], r[3 * i + 1], r[3 * i + 2]
                if val is None:
                    terms.append("UNDEF")
                elif kind == "term" and val.startswith("_:"):
                    return ""  # bnodes cannot cross a service boundary
                elif dt is None and lang is None and kind == "term":
                    terms.append(f"<{val}>")
                elif lang:
                    terms.append(f'"{esc(val)}"@{lang}')
                elif dt is None or dt == XSD_STRING:
                    terms.append(f'"{esc(val)}"')
                else:
                    terms.append(f'"{esc(val)}"^^<{dt}>')
            tuples.append("(" + " ".join(terms) + ")")
        head = " ".join(f"?{v}" for v, _ in kinds)
        return f"VALUES ({head}) {{ {' '.join(tuples)} }}\n"

    def _remote_service_solutions(self, p: A.Service,
                                  input: SolutionMapping | None = None,
                                  ) -> SolutionMapping:
        """Execute SERVICE against a live http(s) endpoint: the braced group
        is pushed verbatim as a generated sub-SELECT (reference pushes the
        service pattern whole, rewriting/graph_patterns/service_pattern.rs:1)
        so filters/joins inside the group run remotely; only the resulting
        bindings travel. When outer solutions share variables with the
        group, their distinct bindings are pushed too as a VALUES block
        (bound join — see _service_values_block). The SPARQL-JSON solutions
        land as a term-kind SolutionMapping (value + __dt/__lang
        companions) and join in-plan with the outer solutions like any
        local pattern. Endpoint results are query answers (not graphs), so
        driver-side materialization is the right transport; graph-sized
        pulls belong to GraphStore.from_endpoint + register_service."""
        from pyspark.sql.types import StringType, StructField, StructType

        from otit_swt_spark.graph import _default_sparql_post
        from otit_swt_spark.terms import RDF_LANGSTRING, XSD_STRING

        poster = self.http_post or _default_sparql_post
        pfx = "".join(f"PREFIX {name}: <{iri}>\n"
                      for name, iri in (p.prefixes or {}).items())
        values = self._service_values_block(p, input)
        doc = poster(p.endpoint.value,
                     f"{pfx}SELECT * WHERE {{ {values}{p.raw} }}")
        vars_ = list(doc.get("head", {}).get("vars")
                     or sorted(A.pattern_variables(p.inner)))
        rows = []
        for b in doc.get("results", {}).get("bindings", []):
            row: list = []
            for v in vars_:
                t = b.get(v)
                if t is None:
                    row += [None, None, None]
                elif t.get("type") == "bnode":
                    row += [f"_:{t['value']}", None, None]
                elif t.get("type") in ("literal", "typed-literal"):
                    lang = t.get("xml:lang")
                    dt = (RDF_LANGSTRING if lang
                          else t.get("datatype") or XSD_STRING)
                    row += [t["value"], dt, lang.lower() if lang else None]
                else:  # uri
                    row += [t["value"], None, None]
            rows.append(tuple(row))
        fields = []
        for v in vars_:
            fields += [StructField(v, StringType()),
                       StructField(f"{v}__dt", StringType()),
                       StructField(f"{v}__lang", StringType())]
        df = self.spark.createDataFrame(rows, StructType(fields))
        return SolutionMapping(df, {v: VarMeta("term") for v in vars_},
                               dt_vars=set(vars_), lang_vars=set(vars_))

    # -- BGP + virtual time-series patterns ---------------------------------

    def compile_bgp(self, bgp: A.BGP, input: SolutionMapping | None) -> SolutionMapping:
        patterns = list(bgp.patterns)
        ts_joins, patterns = self._lower_ts_chains(patterns, input)
        patterns = self._order_patterns(patterns)

        sm: SolutionMapping | None = None
        for tp in patterns:
            tsm = self.compile_triple(tp)
            sm = tsm if sm is None else self.join_solutions(sm, tsm)

        if input is not None:
            sm = input if sm is None else self.join_solutions(input, sm)
        if sm is None:
            if not ts_joins:
                return SolutionMapping(self.spark.range(1).select(), {})
            sm = SolutionMapping(self.spark.range(1).select(), {})

        spec = (self._group_pushdown_stack[-1]
                if self._group_pushdown_stack else None)
        if (spec is not None and spec.get("sync") and not spec["fired"]
                and ts_joins):
            synced = self._apply_sync_grouped_joins(sm, ts_joins, spec)
            if synced is not None:
                return synced
        self._probe_chain_ids(sm, ts_joins)
        for tj in ts_joins:
            sm = self._apply_ts_join(sm, tj)
        return sm

    def _probe_chain_ids(self, sm: SolutionMapping,
                         ts_joins: list[dict]) -> None:
        """ONE bounded driver probe for the external-id sets of ALL the
        BGP's ts chains, taken from the static side BEFORE any chain is
        joined (every chain's eid column is bound by the BGP itself, so
        the pre-chain frame carries them all). Replaces the per-chain
        probe inside _ts_relation_for_join — one job instead of N, and
        the probed subtree is the cheap KG-only plan, not the partially
        chain-joined one. The per-chain sets feed (a) the remote IN-list
        pushdown exactly as before and (b) a NEW Spark-side semi-filter
        on non-pushdown tables (guide §3.2): the id restriction comes
        from a join, so Catalyst cannot derive it itself — filtering the
        chain relation before its exchange cuts the shuffled rows to the
        chain's matching series, and against a parquet-backed table the
        IN-list lands in PushedFilters at the scan. Sets are supersets
        of the per-call sets (later chains only restrict), and every
        constraint is re-applied by the join, so results are unchanged."""
        eligible = [tj for tj in ts_joins
                    if "rebind" not in tj and tj.get("eid")
                    and tj["eid"] in sm.df.columns]
        if not eligible:
            return
        cap = self.TS_ID_PUSHDOWN_MAX
        eids = [tj["eid"] for tj in eligible]
        rows = (sm.df.select(*eids).distinct().limit(cap + 1).collect())
        if len(rows) > cap:
            # Overflow of the TUPLE-distinct says nothing about the
            # per-chain sets (the tuple cardinality is a cross-product
            # and counts null-bearing rows) — leave probed_ids UNSET so
            # _ts_relation_for_join's bounded per-chain probe still
            # runs, instead of disabling pushdown for every chain
            # (r13-advice fix). probe_overflow keeps that path's early
            # plain-union return from swallowing the per-chain probe +
            # Spark-side bounds restriction on non-pushdown registries.
            for tj in eligible:
                tj["probe_overflow"] = True
            return
        for tj in eligible:
            tj["probed_ids"] = sorted(
                {r[tj["eid"]] for r in rows if r[tj["eid"]] is not None})

    def _apply_sync_grouped_joins(self, sm: SolutionMapping,
                                  ts_joins: list[dict],
                                  spec: dict) -> SolutionMapping | None:
        """Combined fetch for a SYNCHRONIZED grouped pushdown: the N
        chains sharing one timestamp variable become ONE remote query —
        the store inner-joins the base relation against itself on the
        timestamp, restricted to the (id_1..id_n) tuples the static side
        actually binds, and aggregates per-chain partials per (tuple,
        granule) — reference timeseries_sql_rewrite.rs:356-428
        (inner_join_selects) composed with :470-560
        (create_grouped_query). Fires only for the single-remote-store
        registry (an N-way remote join across DIFFERENT stores has no
        single executor); any mismatch returns None and the per-chain
        restricted point fetch runs instead — which is always correct,
        just fetches points rather than buckets."""
        if len(self.ts_tables) != 1:
            return None
        table = self.ts_tables[0]
        if not getattr(table, "supports_pushdown", False):
            return None
        chain_specs = spec["chains"]
        if {tj.get("dp") for tj in ts_joins} != set(chain_specs):
            return None
        for tj in ts_joins:
            if "rebind" in tj or not isinstance(tj.get("t"), Variable) \
                    or tj["t"].name != spec["t"]:
                return None
            ch = chain_specs[tj["dp"]]
            v_term = tj.get("v")
            if ch["v"] is None:
                if v_term is not None:
                    return None
            elif not (isinstance(v_term, Variable)
                      and v_term.name == ch["v"]):
                return None
            if tj.get("eid") not in sm.df.columns:
                return None

        ordered = list(ts_joins)
        eids = [tj["eid"] for tj in ordered]
        cap = self.TS_ID_PUSHDOWN_MAX
        cond = F.lit(True)
        for e in eids:
            cond = cond & F.col(e).isNotNull()
        rows = (sm.df.select(*eids).where(cond)
                .distinct().limit(cap + 1).collect())
        if len(rows) > cap:
            return None
        id_tuples = sorted({tuple(r) for r in rows})

        # value-typed partials demand an exactly re-aggregatable value
        # type (same gate as the single-chain path)
        value_aggs = [bool({"sum", "min", "max"}
                           & chain_specs[tj["dp"]]["needs"])
                      for tj in ordered]
        hint = "double"
        if any(value_aggs):
            from otit_swt_spark.terms import XSD
            hint_map = {XSD + "double": "double", XSD + "float": "double"}
            for n in ("integer", "long", "int", "short", "byte",
                      "nonNegativeInteger", "unsignedInt", "unsignedLong"):
                hint_map[XSD + n] = "long"
            try:
                hint = hint_map.get(table.value_xsd(self.spark))
            except Exception:
                return None
            if hint is None:
                return None

        fn = getattr(table, "sync_grouped_restricted_normalized", None)
        if fn is None:
            return None
        df = fn(self.spark, n_chains=len(ordered),
                value_aggs=value_aggs, granule=spec["granule"],
                id_tuples=id_tuples, ts_lower=spec["ts_lower"],
                ts_upper=spec["ts_upper"], agg_type=hint)
        if df is None:
            return None

        cols = []
        vars2: dict[str, VarMeta] = {}
        for i, tj in enumerate(ordered):
            cols.append(F.col(f"id_{i + 1}").alias(tj["eid"]))
            vars2[tj["eid"]] = VarMeta("native", "string")
        cols.append(F.col("timestamp").alias(spec["t"]))
        vars2[spec["t"]] = VarMeta("native", "timestamp")
        cols.append(F.col("__gp_cnt").alias(spec["cnt_col"]))
        vars2[spec["cnt_col"]] = VarMeta("native", "long")
        for i, tj in enumerate(ordered):
            ch = chain_specs[tj["dp"]]
            if ch["v"] is not None:
                # proven unread outside the rewritten aggregates
                cols.append(F.lit(None).cast(hint).alias(ch["v"]))
                vars2[ch["v"]] = VarMeta("native", hint)
            for key in ("n", "sum", "min", "max"):
                name = ch["cols"][key]
                cols.append(F.col(f"__gp_{key}_{i + 1}").alias(name))
                vars2[name] = VarMeta(
                    "native", "long" if key == "n" else hint)
        tsm = SolutionMapping(df.select(*cols), vars2)
        out = self.join_solutions(sm, tsm)
        out_vars = dict(out.vars)
        odf = out.df
        for e in eids:
            out_vars.pop(e, None)
            odf = odf.drop(e)
        out = replace(out, df=odf, vars=out_vars)
        for tj in ordered:
            ch = chain_specs[tj["dp"]]
            info = {"t": spec["t"]}
            if ch["v"] is not None:
                info["v"] = ch["v"]
            out.ts_chains[tj["dp"]] = info
        spec["fired"] = True
        return out

    def _order_patterns(self, patterns: list[A.TriplePattern]
                        ) -> list[A.TriplePattern]:
        """Greedy selectivity-ordered BGP join order from the per-predicate
        triple counts in the datatype catalog (free — same aggregate). The
        classic KG join heuristic Catalyst cannot apply itself (no stats on
        the triples relation): start from the most selective pattern, then
        repeatedly join the most selective pattern CONNECTED to the bound
        variables (avoiding accidental cross products). Constant subjects /
        objects scale the estimate down (point lookups). Inner joins
        commute, so this is a pure plan change; ties keep written order, and
        catalogs without counts (older persisted sidecars) keep the written
        order entirely."""
        if self._pred_datatypes is None or len(patterns) < 3:
            return patterns
        cat = self._pred_datatypes()
        total = sum((info.get("n") or 0) for info in cat.values()) or 1

        def est(tp: A.TriplePattern) -> float | None:
            pred = tp.p
            if isinstance(pred, A.PathPredicate):
                pred = pred.iri
            if isinstance(pred, IRI):
                n = cat.get(pred.value, {}).get("n")
                if n is None:
                    return None  # unknown predicate count -> don't reorder
                base = float(max(n, 1))
            else:
                base = float(total)  # variable or path predicate
            if not isinstance(tp.s, Variable):
                base = max(base * 0.01, 1.0)
            if not isinstance(tp.o, Variable):
                base = max(base * 0.01, 1.0)
            return base

        def vars_of(tp: A.TriplePattern) -> set[str]:
            out = set()
            for term in (tp.s, tp.p, tp.o):
                if isinstance(term, Variable):
                    out.add(term.name)
            return out

        ests = {}
        for i, tp in enumerate(patterns):
            e = est(tp)
            if e is None:
                return patterns
            ests[i] = e

        remaining = list(range(len(patterns)))
        ordered: list[int] = []
        bound: set[str] = set()
        while remaining:
            connected = [i for i in remaining if vars_of(patterns[i]) & bound]
            pool = connected or remaining
            pick = min(pool, key=lambda i: (ests[i], i))
            ordered.append(pick)
            remaining.remove(pick)
            bound |= vars_of(patterns[pick])
        return [patterns[i] for i in ordered]

    def _lower_ts_chains(self, patterns: list[A.TriplePattern],
                         input: SolutionMapping | None):
        """Detect hasDataPoint/hasTimestamp/hasValue chains and replace them
        with time-series joins (the Spark form of the reference's
        BasicTimeSeriesQuery wiring, hybrid/src/rewriting/graph_patterns/
        bgp_pattern.rs:157-260)."""
        def pred(tp):
            return tp.p.value if isinstance(tp.p, IRI) else None

        chains: dict[str, dict] = {}
        rest: list[A.TriplePattern] = []
        for tp in patterns:
            pv = pred(tp)
            if pv == HAS_DATA_POINT and isinstance(tp.o, Variable):
                chains.setdefault(tp.o.name, {})["ts_var"] = tp.s
            elif pv == HAS_TIMESTAMP and isinstance(tp.s, Variable):
                chains.setdefault(tp.s.name, {})["t"] = tp.o
            elif pv == HAS_VALUE and isinstance(tp.s, Variable):
                chains.setdefault(tp.s.name, {})["v"] = tp.o
            else:
                rest.append(tp)

        ts_joins = []
        for dp, info in chains.items():
            if "ts_var" not in info:
                pre = (input.ts_chains.get(dp) if input is not None else None)
                if pre is None:
                    raise ValueError(
                        f"data point variable ?{dp} has no hasDataPoint pattern "
                        "and no prior binding")
                # re-matching an already-bound data point: values/timestamps
                # are functionally determined -> bind or no-op
                ts_joins.append({"dp": dp, "rebind": pre,
                                 "t": info.get("t"), "v": info.get("v")})
                continue
            eid = Variable(self.fresh("eid"))
            rest.append(A.TriplePattern(info["ts_var"], IRI(HAS_EXTERNAL_ID), eid))
            ts_joins.append({"dp": dp, "eid": eid.name,
                             "t": info.get("t"), "v": info.get("v")})
        return ts_joins, rest

    def _apply_ts_join(self, sm: SolutionMapping, tj: dict) -> SolutionMapping:
        if "rebind" in tj:
            pre = tj["rebind"]
            for key in ("t", "v"):
                term = tj.get(key)
                if term is None:
                    continue
                if not isinstance(term, Variable):
                    src = pre.get(key)
                    hint = sm.vars[src].hint if src in sm.vars else None
                    sm = replace(sm, df=sm.df.filter(
                        _ts_literal_eq(F.col(src), hint, term)))
                    continue
                src = pre.get(key)
                if src is None:
                    raise ValueError(f"cannot rebind ?{term.name}: prior chain lacks {key}")
                if term.name == src:
                    continue
                m = sm.vars[src]
                vars2 = dict(sm.vars)
                vars2[term.name] = m
                sm = replace(sm, df=sm.df.withColumn(term.name, F.col(src)), vars=vars2)
            return sm

        spec = (self._group_pushdown_stack[-1]
                if self._group_pushdown_stack else None)
        pre_fired = spec["fired"] if spec is not None else True
        ts_df, value_hint = self._ts_relation_for_join(sm, tj)
        fired_now = spec is not None and spec["fired"] and not pre_fired
        eid = tj["eid"]
        cols = [F.col("id").alias(eid)]
        vars2: dict[str, VarMeta] = {eid: VarMeta("native", "string")}
        chain_info: dict = {}
        if fired_now:
            # carry the remote partial-aggregate columns as native vars
            # (fresh names — they ride through joins/filters untouched
            # until compile_group's re-aggregation consumes them)
            for key in ("cnt", "n", "sum", "min", "max"):
                name = spec["cols"][key]
                cols.append(F.col(f"__gp_{key}").alias(name))
                vars2[name] = VarMeta(
                    "native", "long" if key in ("cnt", "n") else value_hint)
        for key, hint, src in (("t", "timestamp", "timestamp"), ("v", value_hint, "value")):
            term = tj.get(key)
            if term is None:
                continue
            if isinstance(term, Variable):
                cols.append(F.col(src).alias(term.name))
                vars2[term.name] = VarMeta("native", hint)
                chain_info[key] = term.name
            else:
                ts_df = ts_df.filter(_ts_literal_eq(F.col(src), hint, term))
        # Date-partitioned tables: carry the hidden partition columns so
        # apply_filter can derive partition predicates from timestamp
        # filters (reference partitioning_support.rs parity — partition
        # pruning is THE scan lever on a date-laid-out 100 TB store)
        if "t" in chain_info and any(
                t.has_date_partitions() for t in self.ts_tables):
            parts: dict[str, str] = {}
            for part in ("year", "month", "day"):
                name = self.fresh(f"part_{part}")
                cols.append(F.col(f"__part_{part}").alias(name))
                parts[part] = name
            chain_info["parts"] = parts
        tsm = SolutionMapping(ts_df.select(*cols), vars2)
        out = self.join_solutions(sm, tsm)
        # project the synthetic external-id var away
        out_vars = dict(out.vars)
        del out_vars[eid]
        out = replace(out, df=out.df.drop(eid), vars=out_vars)
        out.ts_chains[tj["dp"]] = chain_info
        return out

    # -- triple patterns ------------------------------------------------------

    def compile_triple(self, tp: A.TriplePattern) -> SolutionMapping:
        if isinstance(tp.p, (A.PathAlternative, A.PathInverse, A.PathZeroOrMore,
                             A.PathOneOrMore, A.PathZeroOrOne, A.PathSequence,
                             A.PathNegatedPropertySet)):
            return self._compile_path_triple(tp)
        df = self.graph_df
        vars2: dict[str, VarMeta] = {}
        dt_vars: set[str] = set()
        lang_vars: set[str] = set()
        cols: list[Column] = []

        if isinstance(tp.s, Variable):
            cols.append(F.col("s").alias(tp.s.name))
            vars2[tp.s.name] = VarMeta("term")
        else:
            df = df.filter(F.col("s") == str(tp.s) if not isinstance(tp.s, IRI) else F.col("s") == tp.s.value)

        pred = tp.p
        if isinstance(pred, A.PathPredicate):
            pred = pred.iri
        if isinstance(pred, Variable):
            if pred.name in vars2:  # ?x ?x ?o
                df = df.filter(F.col("p") == F.col("s"))
            else:
                cols.append(F.col("p").alias(pred.name))
                vars2[pred.name] = VarMeta("term")
        else:
            df = df.filter(F.col("p") == pred.value)

        if isinstance(tp.o, Variable):
            name = tp.o.name
            if name in vars2:  # ?x p ?x
                df = df.filter(F.coalesce(F.col("o_iri"), F.col("o_lex")) == F.col("s"))
            else:
                cols.append(F.coalesce(F.col("o_iri"), F.col("o_lex")).alias(name))
                cols.append(F.col("o_dt").alias(f"{name}__dt"))
                cols.append(F.col("o_lang").alias(f"{name}__lang"))
                vars2[name] = (self._object_meta(pred.value)
                               if isinstance(pred, IRI) else VarMeta("term"))
                dt_vars.add(name)
                lang_vars.add(name)
        elif isinstance(tp.o, Literal):
            # RDF term-identity matching: lexical form + datatype + language
            # all must agree. A plain "foo" (xsd:string, no tag) does NOT
            # match "foo"@en and vice versa (RDF 1.1 §3.3).
            df = df.filter(F.col("o_lex") == tp.o.lexical)
            if tp.o.language:
                df = df.filter(F.lower(F.col("o_lang")) == tp.o.language.lower())
            else:
                df = df.filter(F.col("o_lang").isNull())
                if tp.o.datatype and tp.o.datatype != XSD_STRING:
                    df = df.filter(F.col("o_dt") == tp.o.datatype)
        else:
            df = df.filter(F.col("o_iri") == (tp.o.value if isinstance(tp.o, IRI) else str(tp.o)))

        return SolutionMapping(df.select(*cols) if cols else df.select().limit(1),
                               vars2, dt_vars, lang_vars)

    # -- property paths (beyond sequences, which the parser lowers) ----------

    def _path_pairs(self, path) -> DataFrame:
        g = self.graph_df
        if isinstance(path, A.PathPredicate):
            return (g.filter(F.col("p") == path.iri.value)
                     .select(F.col("s").alias("src"),
                             F.coalesce(F.col("o_iri"), F.col("o_lex")).alias("dst")))
        if isinstance(path, A.PathInverse):
            inner = self._path_pairs(path.inner)
            return inner.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        if isinstance(path, A.PathSequence):
            out = self._path_pairs(path.parts[0])
            for part in path.parts[1:]:
                nxt = self._path_pairs(part).withColumnRenamed("src", "mid_src")
                out = (out.join(nxt, out["dst"] == nxt["mid_src"])
                          .select(out["src"], nxt["dst"]))
            return out
        if isinstance(path, A.PathAlternative):
            out = self._path_pairs(path.parts[0])
            for part in path.parts[1:]:
                out = out.unionByName(self._path_pairs(part))
            return out
        if isinstance(path, A.PathNegatedPropertySet):
            # forward arm: any predicate NOT in the forward set; inverse arm:
            # reversed edges via any predicate NOT in the inverse set. A
            # direction with no listed members contributes no arm (SPARQL
            # 1.1 §9.1). Anti-predicate filter is a scan-level NOT IN —
            # pushed to the source, no join.
            out = None
            if path.forward:
                out = (g.filter(~F.col("p").isin([i.value for i in path.forward]))
                        .select(F.col("s").alias("src"),
                                F.coalesce(F.col("o_iri"), F.col("o_lex")).alias("dst")))
            if path.inverse:
                inv = (g.filter(~F.col("p").isin([i.value for i in path.inverse]))
                        .select(F.coalesce(F.col("o_iri"), F.col("o_lex")).alias("src"),
                                F.col("s").alias("dst")))
                out = inv if out is None else out.unionByName(inv)
            return out
        if isinstance(path, A.PathZeroOrOne):
            return self._path_pairs(path.inner).unionByName(self._graph_nodes()).distinct()
        if isinstance(path, A.PathOneOrMore):
            return self._kleene(self._path_pairs(path.inner))
        if isinstance(path, A.PathZeroOrMore):
            step = self._kleene(self._path_pairs(path.inner))
            return step.unionByName(self._graph_nodes()).distinct()
        raise NotImplementedError(f"path {type(path).__name__}")

    def _graph_nodes(self) -> DataFrame:
        g = self.graph_df
        nodes = (g.select(F.col("s").alias("n"))
                  .unionByName(g.filter(F.col("o_iri").isNotNull())
                                .select(F.col("o_iri").alias("n")))
                  .distinct())
        return nodes.select(F.col("n").alias("src"), F.col("n").alias("dst"))

    def _kleene(self, edges: DataFrame, max_iter: int = 20) -> DataFrame:
        """Transitive closure by pairwise path doubling: P ← P ∪ (P ⋈ P).
        P always holds paths of ALL lengths 1..L, so composing P with itself
        reaches every length up to 2L — convergence in ⌈log₂ diameter⌉
        rounds instead of diameter (a 1M-hop chain closes in 20 rounds).
        Each round is one equi-join + distinct + anti-join, all shuffling on
        node keys.

        localCheckpoint truncates the lineage each round — without it the
        final plan nests one full join tree per iteration and driver-side
        planning blows up on deep graphs. Convergence is read from the
        delta's count(), which doubles as the action materializing it into
        the cache — ONE driver job decides the round (the union checkpoint
        then reads the cached delta), instead of a separate
        checkpoint-then-isEmpty pair."""
        import logging

        paths = edges.distinct().localCheckpoint()
        rounds = 0
        for _ in range(max_iter):
            nxt = (paths.withColumnRenamed("dst", "mid")
                   .join(paths.withColumnRenamed("src", "mid"), "mid")
                   .select("src", "dst")
                   .distinct())
            new = nxt.join(paths, ["src", "dst"], "left_anti").persist()
            n_new = new.count()  # the materializing action IS the check
            if n_new == 0:
                new.unpersist()
                break
            rounds += 1
            paths = paths.unionByName(new).localCheckpoint()
            new.unpersist()
        else:  # a silent truncation would be a wrong answer, not a slow one
            raise RuntimeError(
                f"property-path closure did not converge in {max_iter} "
                f"doubling rounds (graph diameter > 2^{max_iter}); raise "
                "max_iter")
        logging.getLogger(__name__).info(
            "kleene closure converged in %d doubling rounds", rounds)
        return paths

    def _compile_path_triple(self, tp: A.TriplePattern) -> SolutionMapping:
        pairs = self._path_pairs(tp.p)
        vars2: dict[str, VarMeta] = {}
        df = pairs
        cols = []
        if isinstance(tp.s, Variable):
            cols.append(F.col("src").alias(tp.s.name))
            vars2[tp.s.name] = VarMeta("term")
        else:
            df = df.filter(F.col("src") == (tp.s.value if isinstance(tp.s, IRI) else str(tp.s)))
        if isinstance(tp.o, Variable):
            if tp.o.name in vars2:
                df = df.filter(F.col("dst") == F.col("src"))
            else:
                cols.append(F.col("dst").alias(tp.o.name))
                vars2[tp.o.name] = VarMeta("term")
        elif isinstance(tp.o, Literal):
            df = df.filter(F.col("dst") == tp.o.lexical)
        else:
            df = df.filter(F.col("dst") == tp.o.value)
        return SolutionMapping(df.select(*cols), vars2)

    # -- filter / extend -------------------------------------------------------

    def resolve_exists(self, sm: SolutionMapping, expr: A.Expr
                       ) -> tuple[SolutionMapping, dict[int, Column], list[str]]:
        exists_nodes: list[A.EExists] = []

        def walk(e):
            if isinstance(e, A.EExists):
                exists_nodes.append(e)
            elif isinstance(e, (A.EOr, A.EAnd, A.ECmp, A.EArith)):
                walk(e.left); walk(e.right)
            elif isinstance(e, (A.ENot, A.ENeg)):
                walk(e.inner)
            elif isinstance(e, A.EIn):
                walk(e.expr)
                for o in e.options:
                    walk(o)
            elif isinstance(e, A.EFunc):
                for a in e.args:
                    walk(a)

        walk(expr)
        exists_cols: dict[int, Column] = {}
        flags: list[str] = []
        for node in exists_nodes:
            # same barrier as the EExists fast path: membership tests must
            # see the UNRESTRICTED chain
            self._ts_bound_hints.append(None)
            try:
                inner = self.compile_pattern(node.pattern, None)
            finally:
                self._ts_bound_hints.pop()
            shared = [v for v in inner.vars if v in sm.vars and not v.startswith("__")]
            if not shared:
                nonempty = not inner.df.isEmpty()
                exists_cols[id(node)] = F.lit(nonempty)
                continue
            flag = self.fresh("exists")
            keys = replace(inner,
                           df=inner.df.select(*[c for v in shared
                                                for c in [v, *inner.aux_cols(v)]])
                                     .dropDuplicates(shared)
                                     .withColumn(flag, F.lit(True)),
                           vars={**{v: inner.vars[v] for v in shared},
                                 flag: VarMeta("native", "bool")},
                           dt_vars={v for v in inner.dt_vars if v in shared},
                           lang_vars={v for v in inner.lang_vars if v in shared},
                           ts_chains={})
            sm = self.join_solutions(sm, keys, how="left")
            exists_cols[id(node)] = F.coalesce(F.col(flag), F.lit(False))
            flags.append(flag)
        return sm, exists_cols, flags

    def apply_filter(self, sm: SolutionMapping, expr: A.Expr) -> SolutionMapping:
        # Fast path: a FILTER that is exactly EXISTS{...} / NOT EXISTS{...}
        # compiles to a semi/anti join (reference lazy_expressions.rs:329-361
        # does a row-id membership test; Spark's LeftSemi/LeftAnti avoid both
        # the row id and the dedup+outer-join of the general flag path).
        if isinstance(expr, A.EExists):
            # barrier: restricting a chain inside [NOT] EXISTS by an outer
            # bound would change membership, not just fetch volume
            self._ts_bound_hints.append(None)
            try:
                inner = self.compile_pattern(expr.pattern, None)
            finally:
                self._ts_bound_hints.pop()
            shared = [v for v in inner.vars
                      if v in sm.vars and not v.startswith("__")]
            if shared:
                how = "left_anti" if expr.negated else "left_semi"
                right = inner.df.select(*shared)
                return replace(sm, df=sm.df.join(right, on=shared, how=how))
            nonempty = not inner.df.isEmpty()
            keep = (not nonempty) if expr.negated else nonempty
            return sm if keep else replace(sm, df=sm.df.limit(0))
        sm2, exists_cols, flags = self.resolve_exists(sm, expr)
        cond = compile_expr(expr, sm2, exists_cols)
        df = sm2.df.filter(_as_bool(cond))   # SPARQL EBV, not a bare cast
        for p in self._partition_prune_predicates(sm2, expr):
            df = df.filter(p)
        for flag in flags:
            df = df.drop(flag)
        vars2 = {v: m for v, m in sm2.vars.items() if v not in flags}
        return replace(sm2, df=df, vars=vars2)

    def _partition_prune_predicates(self, sm: SolutionMapping,
                                    expr: A.Expr) -> list[Column]:
        """Derive date-partition predicates from timestamp comparisons in
        the filter's top-level conjunction — the Spark form of the
        reference's partitioning rewrite (timeseries_sql_rewrite/
        partitioning_support.rs): a predicate on the hidden
        ``__part_year/month/day`` columns is pushed by Catalyst through the
        joins into the partitioned scan where it becomes PartitionFilters.
        Null-guarded, so unpartitioned tables in the union are unaffected;
        semantically redundant with the timestamp filter, so always sound."""
        import datetime as _dt

        from otit_swt_spark.terms import XSD_DATE, XSD_DATETIME

        tvar_parts: dict[str, dict] = {}
        for info in sm.ts_chains.values():
            t, parts = info.get("t"), info.get("parts")
            if t and parts and all(c in sm.df.columns for c in parts.values()):
                tvar_parts[t] = parts
        if not tvar_parts:
            return []

        def conjuncts(e):
            if isinstance(e, A.EAnd):
                yield from conjuncts(e.left)
                yield from conjuncts(e.right)
            else:
                yield e

        def bound(parts, d: _dt.date, lower: bool) -> Column:
            y = F.col(parts["year"])
            m = F.col(parts["month"])
            dd = F.col(parts["day"])
            if lower:
                day_ok = dd.isNull() | (dd >= d.day)
                mon_ok = m.isNull() | (m > d.month) | ((m == d.month) & day_ok)
                return y.isNull() | (y > d.year) | ((y == d.year) & mon_ok)
            day_ok = dd.isNull() | (dd <= d.day)
            mon_ok = m.isNull() | (m < d.month) | ((m == d.month) & day_ok)
            return y.isNull() | (y < d.year) | ((y == d.year) & mon_ok)

        preds: list[Column] = []
        for c in conjuncts(expr):
            if not isinstance(c, A.ECmp):
                continue
            op = c.op
            if isinstance(c.left, A.EVar) and isinstance(c.right, A.ELiteral):
                var, lit = c.left.name, c.right.value
            elif isinstance(c.right, A.EVar) and isinstance(c.left, A.ELiteral):
                var, lit = c.right.name, c.left.value
                op = {"<": ">", "<=": ">=", ">": "<", ">=": "<="}.get(op, op)
            else:
                continue
            parts = tvar_parts.get(var)
            if parts is None or lit.datatype not in (XSD_DATETIME, XSD_DATE):
                continue
            try:
                dtv = _dt.datetime.fromisoformat(
                    lit.lexical.replace("Z", "+00:00"))
            except ValueError:
                continue
            if dtv.tzinfo is not None:
                # Partition columns are derived from UTC timestamps: an
                # offset literal must be normalized to UTC before its date
                # is used, or the bound could prune a day that still holds
                # matching rows (e.g. +02:00 times crossing midnight).
                dtv = dtv.astimezone(_dt.timezone.utc)
            d = dtv.date()
            if op in (">", ">=", "="):
                preds.append(bound(parts, d, lower=True))
            if op in ("<", "<=", "="):
                preds.append(bound(parts, d, lower=False))
        return preds

    def apply_extend(self, sm: SolutionMapping, var: str, expr: A.Expr) -> SolutionMapping:
        # STRLANG builds a language-tagged literal: the value lands in the
        # term column, the tag in the companion __lang column so LANG()/
        # LANGMATCHES and lang-aware matching see it downstream.
        if (isinstance(expr, A.EFunc) and expr.name == "STRLANG"
                and len(expr.args) == 2):
            from otit_swt_spark.terms import RDF_LANGSTRING

            val = compile_expr(expr.args[0], sm)
            tag = compile_expr(expr.args[1], sm)
            df = (sm.df.withColumn(var, val.col.cast("string"))
                  .withColumn(f"{var}__dt", F.lit(RDF_LANGSTRING))
                  .withColumn(f"{var}__lang", F.lower(tag.col.cast("string"))))
            vars2 = {**sm.vars, var: VarMeta("term", xsd=RDF_LANGSTRING)}
            return replace(sm, df=df, vars=vars2,
                           dt_vars=sm.dt_vars | {var},
                           lang_vars=sm.lang_vars | {var})
        if isinstance(expr, A.EVar) and expr.name in sm.vars:
            m = sm.vars[expr.name]
            df = sm.df.withColumn(var, F.col(expr.name))
            dt_vars, lang_vars = set(sm.dt_vars), set(sm.lang_vars)
            if expr.name in sm.dt_vars:
                df = df.withColumn(f"{var}__dt", F.col(f"{expr.name}__dt"))
                dt_vars.add(var)
            if expr.name in sm.lang_vars:
                df = df.withColumn(f"{var}__lang", F.col(f"{expr.name}__lang"))
                lang_vars.add(var)
            return replace(sm, df=df, vars={**sm.vars, var: m},
                           dt_vars=dt_vars, lang_vars=lang_vars)
        sm2, exists_cols, flags = self.resolve_exists(sm, expr)
        t = compile_expr(expr, sm2, exists_cols)
        df = sm2.df.withColumn(var, t.col)
        for flag in flags:
            df = df.drop(flag)
        vars2 = {v: m for v, m in sm2.vars.items() if v not in flags}
        vars2[var] = VarMeta("native", t.hint or "string")
        return replace(sm2, df=df, vars=vars2)

    # -- optional / minus -------------------------------------------------------

    def compile_leftjoin(self, p: A.LeftJoin, input: SolutionMapping | None) -> SolutionMapping:
        left = self.compile_pattern(p.left, input)
        # Fast path: an OPTIONAL whose right side compiles standalone is one
        # left outer join — with the SPARQL filter expression folded into the
        # join condition (SPARQL LeftJoin(Ω1,Ω2,expr) ≡ left outer join ON
        # shared-vars-equal AND expr: a left row joins the right rows that
        # are compatible AND satisfy expr, and null-pads when none do, which
        # is exactly Filter(expr, Join) ∪ Diff(Ω1, Ω2, expr)). No row id, no
        # union, left subtree evaluated ONCE — this is the form that
        # survives a fact-scale left side. EXISTS inside the filter needs
        # per-branch resolution, so it falls back to the general form.
        correlated = bool(_pattern_free_expr_vars(p.right) & set(left.vars))
        if not correlated and (p.expr is None or not _contains_exists(p.expr)):
            fast = self._leftjoin_rebind_fastpath(left, p)
            if fast is not None:
                return fast
            # the OPTIONAL's embedded condition constrains which right
            # rows can MATCH (LeftJoin(Ω1,Ω2,F) ≡ leftjoin over
            # Filter(F,Ω2) for the matched branch; rows it excludes only
            # ever null-pad) — so its timestamp bounds may restrict a
            # pushdown-capable chain fetch inside the right side
            self._ts_bound_hints.append(
                self._extract_ts_bound_hints(p.expr)
                if p.expr is not None else {})
            try:
                right = self.compile_pattern(p.right, None)
            except ValueError:
                right = None  # right side needs left-bound context
            finally:
                self._ts_bound_hints.pop()
            if right is not None:
                if p.expr is None:
                    return self.join_solutions(left, right, how="left")
                return self._leftjoin_with_condition(left, right, p.expr)
        # General (SPARQL-correct with filter expr) form: matched rows UNION
        # anti-join-null-padded left rows. The row id must be IDENTICAL in
        # the matched branch (which threads left2 through the right side)
        # and the anti branch — _with_deterministic_rid derives it from the
        # row values themselves, so no materialization is needed.
        left2_df = _with_deterministic_rid(left.df)
        left2 = replace(left, df=left2_df)
        # same embedded-condition bounds as the fast path: the general
        # form applies expr as a filter over the matched branch, so an
        # expr-implied restriction on the right-side chain fetch only
        # removes rows that filter would drop
        self._ts_bound_hints.append(
            self._extract_ts_bound_hints(p.expr)
            if p.expr is not None else {})
        try:
            right = self.compile_pattern(p.right, left2)
        finally:
            self._ts_bound_hints.pop()
        if p.expr is not None:
            right = self.apply_filter(right, p.expr)
        matched = right
        unmatched_df = left2.df.join(matched.df.select(RID).distinct(), RID, "left_anti")
        un_sm = replace(left2, df=unmatched_df)
        m_sm, un_sm = self.harmonize_for_union(matched, un_sm)
        df = m_sm.df.unionByName(un_sm.df, allowMissingColumns=True).drop(RID)
        vars2 = dict(m_sm.vars)
        vars2.update({k: v for k, v in un_sm.vars.items() if k not in vars2})
        return SolutionMapping(df, vars2, m_sm.dt_vars | un_sm.dt_vars,
                               m_sm.lang_vars | un_sm.lang_vars,
                               {**un_sm.ts_chains, **m_sm.ts_chains})

    def _leftjoin_rebind_fastpath(self, left: SolutionMapping,
                                  p: A.LeftJoin) -> SolutionMapping | None:
        """OPTIONAL whose right side only RE-BINDS timestamp/value of data
        points already chained on the left (a correlated TS continuation):
        the extension is functionally determined per left row, so the
        left-outer semantics collapse to a projection plus a conditional
        null — no join, no row id, no shuffle, left evaluated once. Returns
        None when the shape doesn't apply (falls back to the general
        matched∪anti form)."""
        if type(p.right) is not A.BGP:
            return None
        adds: dict[str, str] = {}  # new var -> source column on the left
        conds: list[Column] = []
        for tp in p.right.patterns:
            pv = tp.p.value if isinstance(tp.p, IRI) else None
            key = {HAS_TIMESTAMP: "t", HAS_VALUE: "v"}.get(pv)
            if key is None or not isinstance(tp.s, Variable):
                return None
            pre = left.ts_chains.get(tp.s.name)
            src = pre.get(key) if pre else None
            if src is None:
                return None
            if src not in left.vars:
                # a projection (e.g. a sub-SELECT) dropped the chain's
                # source column while ts_chains carried the mapping —
                # the rebind has nothing to copy; use the general path
                return None
            if isinstance(tp.o, Variable):
                if tp.o.name == src:
                    continue  # re-binding the same var is a no-op
                if tp.o.name in left.vars or tp.o.name in adds:
                    return None  # compatibility-join semantics: general form
                adds[tp.o.name] = src
            elif isinstance(tp.o, Literal):
                conds.append(F.col(src) == literal_typed(tp.o).col)
            else:
                return None
        df = left.df
        vars2 = dict(left.vars)
        for var, src in adds.items():
            df = df.withColumn(var, F.col(src))
            vars2[var] = left.vars[src]
        sm = replace(left, df=df, vars=vars2)
        if not conds and p.expr is None:
            return sm
        cond = conds[0] if conds else None
        for c in conds[1:]:
            cond = cond & c
        if p.expr is not None:
            e = _as_bool(compile_expr(p.expr, sm))   # SPARQL EBV
            cond = e if cond is None else cond & e
        if not adds:
            return left  # OPTIONAL binds nothing new: never removes rows
        # SPARQL LeftJoin: condition false/error -> the extension is
        # unbound, the left row survives
        out = sm.df
        for var in adds:
            out = out.withColumn(var, F.when(cond, F.col(var)))
        return replace(sm, df=out)

    def _leftjoin_with_condition(self, left: SolutionMapping,
                                 right: SolutionMapping,
                                 expr: A.Expr) -> SolutionMapping:
        """left OUTER join right ON (shared vars equal AND expr). The filter
        expression is compiled against the merged variable scope: shared
        variables resolve to the left columns (equal on matched rows),
        right-only variables to the right columns."""
        shared = [v for v in left.vars if v in right.vars]
        left, right = self._coerce_join_keys(left, right, shared)
        rdf = right.df
        # rename right shared-var columns out of the way; drop aux/extra dups
        for v in shared:
            rdf = rdf.withColumnRenamed(v, f"__rj_{v}")
            for aux in right.aux_cols(v):
                if aux in left.df.columns:
                    rdf = rdf.drop(aux)
        dup_extra = [c for c in rdf.columns
                     if c in left.df.columns and c not in shared]
        for c in dup_extra:
            rdf = rdf.drop(c)
        merged = SolutionMapping(
            left.df,  # unused by compile_expr (duck-typed metadata access)
            {**right.vars, **left.vars},
            left.dt_vars | {v for v in right.dt_vars if v not in shared},
            left.lang_vars | {v for v in right.lang_vars if v not in shared},
        )
        cond = _as_bool(compile_expr(expr, merged))   # SPARQL EBV
        for v in shared:
            cond = (F.col(v) == F.col(f"__rj_{v}")) & cond
        df = left.df.join(rdf, cond, "left")
        df = df.drop(*[f"__rj_{v}" for v in shared])
        vars2 = dict(right.vars)
        vars2.update(left.vars)
        dt = set(left.dt_vars) | {v for v in right.dt_vars if f"{v}__dt" in df.columns}
        lang = set(left.lang_vars) | {v for v in right.lang_vars
                                      if f"{v}__lang" in df.columns}
        return SolutionMapping(df, vars2, dt, lang,
                               {**right.ts_chains, **left.ts_chains})

    def compile_minus(self, p: A.Minus, input: SolutionMapping | None) -> SolutionMapping:
        left = self.compile_pattern(p.left, input)
        rvars = A.pattern_variables(p.right)
        if not (rvars & set(left.vars)):
            return left  # SPARQL: disjoint domains remove nothing
        # SPARQL MINUS = remove left rows compatible with some right row on
        # the shared variables. Preferred form: compile the right side
        # standalone and anti-join on the shared vars — needs no row id
        # (monotonically_increasing_id is not stable across the two plan
        # branches); null shared vars don't match, which coincides with the
        # unbound-variable compatibility rule here.
        # Barrier on the right side: an outer FILTER's timestamp bound must
        # not restrict a chain fetched INSIDE the removal set — dropping
        # out-of-bound right rows would stop them subtracting left rows,
        # changing the MINUS result.
        self._ts_bound_hints.append(None)
        try:
            right = self.compile_pattern(p.right, None)
        except ValueError:
            # right side references context only the left provides (e.g. a
            # time-series chain bound in the left pattern): thread the left
            # through and anti-join on a deterministic (value-derived) row id
            left2_df = _with_deterministic_rid(left.df)
            left2 = replace(left, df=left2_df)
            right = self.compile_pattern(p.right, left2)
            df = left2_df.join(right.df.select(RID).distinct(), RID,
                               "left_anti").drop(RID)
            return replace(left, df=df)
        finally:
            self._ts_bound_hints.pop()
        shared = [v for v in right.vars
                  if v in left.vars and not v.startswith("__")]
        if not shared:
            return left
        right2 = right
        for v in shared:
            lm, rm = left.vars[v], right2.vars[v]
            if lm.kind == "native" and rm.kind == "term":
                right2 = _cast_var_to_native(right2, v, lm.hint or "string")
            elif lm.kind == "term" and rm.kind == "native":
                left = _cast_var_to_native(left, v, rm.hint or "string")
        if len(shared) == 1:
            # single shared var: compatibility = equality, and a left-unbound
            # (null) var means empty domain intersection -> row kept. Plain
            # equi anti join (null keys never match) is exactly that, and
            # stays a hash join.
            df = left.df.join(right2.df.select(*shared), on=shared, how="left_anti")
            return replace(left, df=df)
        # Multiple shared vars: SPARQL MINUS removes a left row if some right
        # row is COMPATIBLE (agrees on commonly-bound vars; an unbound side
        # leaves the var unconstrained) with a non-empty domain intersection.
        # A plain equi anti join treats null keys as never-matching, wrongly
        # keeping left rows that have one unbound and one matching-bound var.
        lal = left.df.alias("__minus_l")
        ral = right2.df.select(*shared).alias("__minus_r")
        compat = None
        anybound = None
        for v in shared:
            lc, rc = F.col(f"__minus_l.{v}"), F.col(f"__minus_r.{v}")
            c = lc.isNull() | rc.isNull() | (lc == rc)
            b = lc.isNotNull() & rc.isNotNull()
            compat = c if compat is None else (compat & c)
            anybound = b if anybound is None else (anybound | b)
        df = lal.join(ral, compat & anybound, "left_anti")
        return replace(left, df=df)

    # -- values -------------------------------------------------------------------

    def compile_values(self, p: A.Values) -> SolutionMapping:
        from pyspark.sql import types as T

        n = len(p.variables)
        col_kind: list[VarMeta] = []
        for i in range(n):
            sample = next((row[i] for row in p.rows if row[i] is not None), None)
            if isinstance(sample, Literal):
                t = literal_typed(sample)
                col_kind.append(VarMeta("native", t.hint))
            else:
                col_kind.append(VarMeta("term"))
        fields = []
        for v, m in zip(p.variables, col_kind):
            fields.append(T.StructField(v, spark_type_for_xsd(
                {"long": "http://www.w3.org/2001/XMLSchema#long",
                 "double": "http://www.w3.org/2001/XMLSchema#double",
                 "bool": XSD_BOOLEAN,
                 "timestamp": XSD_DATETIME}.get(m.hint, XSD_STRING)), True))
        rows = []
        for row in p.rows:
            out = []
            for i, term in enumerate(row):
                if term is None:
                    out.append(None)
                elif isinstance(term, Literal):
                    h = col_kind[i].hint
                    if h == "long":
                        out.append(int(term.lexical))
                    elif h == "double":
                        out.append(float(term.lexical))
                    elif h == "bool":
                        out.append(term.lexical == "true")
                    else:
                        out.append(term.lexical)
                else:
                    out.append(term.value if isinstance(term, IRI) else str(term))
            rows.append(tuple(out))
        df = self.spark.createDataFrame(rows, T.StructType(fields))
        return SolutionMapping(df, dict(zip(p.variables, col_kind)))

    # -- group / aggregates ----------------------------------------------------

    def compile_group(self, p: A.Group, input: SolutionMapping | None) -> SolutionMapping:
        # grouped pushdown (reference group_pattern.rs:18-105): publish
        # the statically-proven spec for the duration of the inner
        # compile; if the TS fetch fired it, aggregate over the remote
        # partials instead of raw points
        spec = self._analyze_group_pushdown(p, input)
        if spec is not None:
            self._group_pushdown_stack.append(spec)
        try:
            sm = self.compile_pattern(p.inner, input)
        finally:
            if spec is not None:
                self._group_pushdown_stack.pop()
        fired = spec is not None and spec["fired"]
        group_cols = []
        for v in p.by:
            group_cols.append(v)
            group_cols.extend(sm.aux_cols(v))
        aggs = []
        vars2: dict[str, VarMeta] = {v: sm.vars[v] for v in p.by if v in sm.vars}
        dt_vars = {v for v in sm.dt_vars if v in p.by}
        lang_vars = {v for v in sm.lang_vars if v in p.by}
        for a in p.aggregates:
            if fired:
                col, meta = self._partial_reagg(a, sm, spec)
                aggs.append(col.alias(a.var))
                vars2[a.var] = meta
                continue
            col, meta, extras = self._compile_aggregate(a, sm)
            aggs.append(col.alias(a.var))
            vars2[a.var] = meta
            for extra_name, extra_col in extras:
                aggs.append(extra_col.alias(extra_name))
                if extra_name.endswith("__dt"):
                    dt_vars.add(a.var)
        if aggs:
            df = sm.df.groupBy(*group_cols).agg(*aggs)
        else:
            df = sm.df.select(*group_cols).distinct()
        return SolutionMapping(df, vars2, dt_vars, lang_vars, {})

    def _compile_aggregate(self, a: A.EAggregate, sm: SolutionMapping
                           ) -> tuple[Column, VarMeta, list[tuple[str, Column]]]:
        """SPARQL aggregate -> Spark aggregate (reference:
        hybrid/src/combiner/lazy_aggregate.rs). Returns (column, meta,
        extra aggregate columns — e.g. a carried datatype col)."""
        no_extra: list[tuple[str, Column]] = []
        if a.expr is None:  # COUNT(*) / COUNT(DISTINCT *)
            if a.distinct:
                # distinct SOLUTIONS: countDistinct over all current
                # columns via one struct (bare countDistinct(cols...)
                # would drop rows with any NULL binding)
                return (F.count_distinct(F.struct(*[
                    F.col(c) for c in sm.df.columns])),
                    VarMeta("native", "long"), no_extra)
            return F.count(F.lit(1)), VarMeta("native", "long"), no_extra
        t = compile_expr(a.expr, sm)
        name = a.name
        if name == "COUNT":
            col = F.count_distinct(t.col) if a.distinct else F.count(t.col)
            return col, VarMeta("native", "long"), no_extra
        if name == "SUM":
            c = t.col if t.hint in NUMERIC else t.col.try_cast("double")
            col = F.sum_distinct(c) if a.distinct else F.sum(c)
            return col, VarMeta("native", "long" if t.hint in INTEGRAL else "double"), no_extra
        if name == "AVG":
            c = t.col if t.hint in NUMERIC else t.col.try_cast("double")
            if a.distinct:
                return F.try_divide(F.sum_distinct(c), F.count_distinct(c)), \
                    VarMeta("native", "double"), no_extra
            return F.avg(c), VarMeta("native", "double"), no_extra
        if name in ("MIN", "MAX"):
            fn = F.min if name == "MIN" else F.max
            if t.hint is not None:
                return fn(t.col), VarMeta("native", t.hint), no_extra
            # term column: order numerically when values parse as numbers
            # (SPARQL natural ordering), fall back to string collation;
            # carry the datatype column so output typing survives
            key = F.struct(t.col.try_cast("double").alias("num"), t.col.alias("lex"))
            col = fn(key).getField("lex")
            extras = []
            src_meta = (sm.vars.get(a.expr.name) if isinstance(a.expr, A.EVar)
                        else None) or VarMeta("term")
            if isinstance(a.expr, A.EVar) and a.expr.name in sm.dt_vars:
                extras.append((f"{a.var}__dt",
                               F.first(F.col(f"{a.expr.name}__dt"), ignorenulls=True)))
            return col, VarMeta("term", xsd=src_meta.xsd, mixed=src_meta.mixed), extras
        if name == "SAMPLE":
            kind = "native" if t.hint is not None else "term"
            extras = []
            src_meta = (sm.vars.get(a.expr.name) if isinstance(a.expr, A.EVar)
                        else None) or VarMeta("term")
            if kind == "term" and isinstance(a.expr, A.EVar) and a.expr.name in sm.dt_vars:
                extras.append((f"{a.var}__dt",
                               F.first(F.col(f"{a.expr.name}__dt"), ignorenulls=True)))
            return F.first(t.col, ignorenulls=True), \
                VarMeta(kind, t.hint, xsd=src_meta.xsd if kind == "term" else None,
                        mixed=src_meta.mixed if kind == "term" else False), extras
        if name == "GROUP_CONCAT":
            c = t.col if t.hint in ("string", "iri") else t.col.cast("string")
            lst = F.collect_set(c) if a.distinct else F.collect_list(c)
            # SPARQL leaves concatenation order unspecified; sort for
            # determinism so results are stable across shuffles/partitions
            return F.array_join(F.sort_array(lst),
                                a.separator if a.separator is not None else " "), \
                VarMeta("native", "string"), no_extra
        if name == NEST_AGGREGATION:
            return F.collect_list(t.col), VarMeta("native", "array"), no_extra
        raise NotImplementedError(f"aggregate {name}")

    # -- order / project ---------------------------------------------------------

    def apply_order(self, sm: SolutionMapping, keys: list[tuple[A.Expr, bool]]) -> SolutionMapping:
        sort_cols = []
        helpers = []
        df = sm.df
        for i, (e, asc) in enumerate(keys):
            if isinstance(e, A.EVar) and e.name in sm.vars:
                c = F.col(e.name)
                if sm.vars[e.name].kind == "term":
                    # SPARQL orders numeric literals numerically; a term
                    # column holds lexical forms, so sort on (numeric value,
                    # lexical form): numbers order numerically, non-numeric
                    # strings tie on NULL and fall back to string collation
                    c = F.struct(c.try_cast("double").alias("num"),
                                 c.alias("lex"))
            else:
                h = f"__ord_{i}"
                t = compile_expr(e, sm)
                df = df.withColumn(h, t.col)
                helpers.append(h)
                c = F.col(h)
            sort_cols.append(c.asc() if asc else c.desc())
        df = df.orderBy(*sort_cols)
        for h in helpers:
            df = df.drop(h)
        return replace(sm, df=df)

    def apply_project(self, sm: SolutionMapping, variables: list[str]) -> SolutionMapping:
        cols = []
        vars2 = {}
        dt_vars, lang_vars = set(), set()
        df = sm.df
        for v in variables:
            if v not in sm.vars:
                df = df.withColumn(v, F.lit(None).cast("string"))
                vars2[v] = VarMeta("term")
                cols.append(v)
                continue
            cols.append(v)
            vars2[v] = sm.vars[v]
            for aux in sm.aux_cols(v):
                cols.append(aux)
            if v in sm.dt_vars:
                dt_vars.add(v)
            if v in sm.lang_vars:
                lang_vars.add(v)
        return SolutionMapping(df.select(*cols), vars2, dt_vars, lang_vars, dict(sm.ts_chains))
