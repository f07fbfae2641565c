"""stOTTR template-expansion mapper (DataFrame -> RDF triples).

PySpark re-expression of the reference's mapper crate
(reference: mapper/src/mapping.rs, mapper/src/parsing/nom_parsing.rs).
Template expansion compiles to pure plan construction — per-leaf
``select``/``explode`` chains unioned together — so no data moves until the
triples are consumed, and the triple frames stay partition-aligned with the
source table at any scale.
"""

from otit_swt_spark.mapper.ast import (
    Argument,
    BlankNode,
    Instance,
    IRI,
    ListConstant,
    Literal,
    Parameter,
    PType,
    Template,
    Variable,
)
from otit_swt_spark.mapper.mapping import (
    ExpandOptions,
    Mapping,
    MintingOptions,
    ResolveIRI,
)
from otit_swt_spark.mapper.parser import parse_document

__all__ = [
    "Argument",
    "BlankNode",
    "ExpandOptions",
    "Instance",
    "IRI",
    "ListConstant",
    "Literal",
    "Mapping",
    "MintingOptions",
    "Parameter",
    "PType",
    "ResolveIRI",
    "Template",
    "Variable",
    "parse_document",
]
