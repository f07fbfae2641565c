"""DSL AST (reference shapes: dsl/src/ast.rs)."""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime

CONNECTIVE_NAMES = {
    ".": "Period",
    ";": "Semicolon",
    "-": "Dash",
    "/": "Slash",
    "\\": "Backslash",
    ":": "Colon",
}


@dataclass(frozen=True)
class Connective:
    char: str
    count: int = 1

    def text(self) -> str:
        return self.char * self.count

    def name_part(self) -> str:
        return CONNECTIVE_NAMES[self.char] * self.count


@dataclass
class PathElement:
    """One path step: optional ``[glue]`` variable, optional constraint.
    ``type_name`` = bare identifier (matched through the type-name template);
    ``name`` = quoted string (matched through the name template)."""

    glue: str | None = None
    name: str | None = None
    type_name: str | None = None


@dataclass
class Path:
    elements: list  # alternating PathElement / Connective
    optional: bool = False


@dataclass(frozen=True)
class LiteralValue:
    value: object  # bool | int | float | str
    kind: str      # "boolean" | "integer" | "real" | "string"


@dataclass
class ConditionedPath:
    path: Path
    op: str | None = None          # = != > < >= <= like
    rhs: object | None = None      # Path | LiteralValue


@dataclass
class Group:
    var_names: list[str] = field(default_factory=list)


@dataclass
class Aggregation:
    function_name: str
    duration_seconds: float


@dataclass
class TsQuery:
    paths: list[ConditionedPath]
    group: Group | None = None
    from_datetime: datetime | None = None
    to_datetime: datetime | None = None
    aggregation: Aggregation | None = None
