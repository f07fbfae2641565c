"""Path-based time-series query DSL (entry point 3, SURVEY §3.3).

Fresh Python implementation of the reference DSL product (reference:
dsl/src/parser.rs, dsl/src/ast.rs, dsl/src/translator.rs): paths of
named/typed elements joined by punctuation connectives, optional glue
variables, per-path value conditions, from/to time bounds, tumbling-bucket
aggregation, and glue-grouping. Queries translate to SPARQL text that the
otit_swt_spark Engine executes as a single DataFrame plan.
"""

from otit_swt_spark.dsl.ast import (
    Aggregation,
    ConditionedPath,
    Connective,
    Group,
    Path,
    PathElement,
    TsQuery,
)
from otit_swt_spark.dsl.parser import parse_ts_query
from otit_swt_spark.dsl.translator import Translator

__all__ = [
    "Aggregation",
    "ConditionedPath",
    "Connective",
    "Group",
    "parse_ts_query",
    "Path",
    "PathElement",
    "Translator",
    "TsQuery",
]
