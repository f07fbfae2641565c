"""Resolved stOTTR AST.

Mirrors the shapes of the reference's resolved AST (reference:
mapper/src/ast.rs) without copying its structure beyond what the stOTTR
spec itself dictates: templates have signatures of typed parameters and a
body of instances; instance arguments are variables or constant terms,
optionally marked for list expansion.
"""

from __future__ import annotations

from dataclasses import dataclass, field

OTTR_TRIPLE = "http://ns.ottr.xyz/0.4/Triple"
#: base template tolerating none-valued arguments: rows where any of
#: subject/verb/object is null produce NO triple (OTTR base library;
#: plain ottr:Triple keeps its strict behavior)
OTTR_NULLABLE_TRIPLE = "http://ns.ottr.xyz/0.4/NullableTriple"
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"

#: prefixes every stOTTR document understands implicitly (stOTTR spec §2)
DEFAULT_PREFIXES = {
    "ottr": "http://ns.ottr.xyz/0.4/",
    "rdf": RDF,
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "owl": "http://www.w3.org/2002/07/owl#",
    "xsd": XSD,
    "ex": "http://example.net/ns#",
}


@dataclass(frozen=True)
class IRI:
    iri: str


@dataclass(frozen=True)
class BlankNode:
    name: str


@dataclass(frozen=True)
class Literal:
    lexical: str
    datatype: str = XSD + "string"
    language: str | None = None


@dataclass(frozen=True)
class Variable:
    name: str


@dataclass(frozen=True)
class ListConstant:
    items: tuple


Term = "IRI | BlankNode | Literal | ListConstant"


@dataclass(frozen=True)
class PType:
    """Parameter type: a basic XSD/ottr IRI or a List/NEList/LUB wrapper
    (reference: mapper/src/ast.rs:45-50)."""

    kind: str  # "basic" | "list" | "nelist" | "lub"
    iri: str | None = None
    inner: "PType | None" = None

    @property
    def is_iri_type(self) -> bool:
        if self.kind == "basic":
            return self.iri in (XSD + "anyURI", "http://ns.ottr.xyz/0.4/IRI")
        return self.inner.is_iri_type if self.inner else False


@dataclass
class Parameter:
    name: str
    ptype: PType | None = None
    optional: bool = False
    non_blank: bool = False
    default: object | None = None


@dataclass
class Argument:
    term: object  # Variable | IRI | BlankNode | Literal | ListConstant
    list_expand: bool = False


@dataclass
class Instance:
    template_iri: str
    arguments: list[Argument]
    expander: str | None = None  # "cross" | "zipMin" | "zipMax"


@dataclass
class Template:
    iri: str
    parameters: list[Parameter]
    instances: list[Instance] = field(default_factory=list)
    #: ``@@ex:Meta(...)`` annotation instances on the signature — metadata
    #: carried through parsing/resolution (the reference stores but never
    #: executes them: mapper/src/ast.rs:114, resolver.rs:120-138)
    annotations: list[Instance] = field(default_factory=list)
