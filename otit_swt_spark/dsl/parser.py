"""DSL parser (reference grammar: dsl/src/parser.rs, nom combinators).

Query shape::

    ABC-[valve]"HLV"."Mvm"."stVal" > 0.7
    [valve]."PosPct"."mag" ?
    from 2021-12-01T00:00:01+01:00
    to 2021-12-02T00:00:01+01:00
    group valve
    aggregate mean 10min

- path lines: elements joined by connectives (``. ; - / \\ :``, repeated
  for higher levels); element = bare TypeName | ``"Name"`` |
  ``"Name":Type`` | ``[glue]`` | ``[glue]"Name"``
- optional condition ``op literal-or-path`` (``= != > < >= <= like``)
- trailing ``?`` marks the path optional (left join)
- ``from`` / ``to`` RFC3339 bounds, ``group`` glue names,
  ``aggregate fn duration``
"""

from __future__ import annotations

import re
from datetime import datetime

from otit_swt_spark.dsl.ast import (
    Aggregation,
    ConditionedPath,
    Connective,
    Group,
    LiteralValue,
    Path,
    PathElement,
    TsQuery,
)

_KEYWORDS = {"from", "to", "group", "aggregate", "true", "false"}

_DUR_UNITS = {
    "ns": 1e-9, "us": 1e-6, "ms": 1e-3,
    "s": 1.0, "sec": 1.0, "secs": 1.0, "second": 1.0, "seconds": 1.0,
    "m": 60.0, "min": 60.0, "mins": 60.0, "minute": 60.0, "minutes": 60.0,
    "h": 3600.0, "hour": 3600.0, "hours": 3600.0,
    "d": 86400.0, "day": 86400.0, "days": 86400.0,
}

_ELEMENT_RE = re.compile(
    r"""(?:\[(?P<glue>[A-Za-z0-9]+)\])?
        (?:"(?P<name>[^"]+)"(?::(?P<ntype>[A-Za-z]+))?
          |(?P<tname>[A-Za-z][A-Za-z0-9]*))?""",
    re.VERBOSE,
)
_CONNECTIVE_RE = re.compile(r"(\.+|;+|-+|/+|\\+|:+)")
_OP_RE = re.compile(r"(>=|<=|!=|=|>|<|\blike\b)")


def _parse_duration(text: str) -> float:
    m = re.fullmatch(r"(\d+(?:\.\d+)?)\s*([A-Za-z]+)", text.strip())
    if not m:
        raise ValueError(f"bad duration {text!r}")
    qty, unit = float(m.group(1)), m.group(2).lower()
    if unit not in _DUR_UNITS:
        raise ValueError(f"unknown duration unit {unit!r}")
    return qty * _DUR_UNITS[unit]


def _parse_literal(text: str) -> LiteralValue:
    text = text.strip()
    if text == "true":
        return LiteralValue(True, "boolean")
    if text == "false":
        return LiteralValue(False, "boolean")
    if text.startswith('"') and text.endswith('"'):
        return LiteralValue(text[1:-1], "string")
    if re.fullmatch(r"[+-]?\d+", text):
        return LiteralValue(int(text), "integer")
    if re.fullmatch(r"[+-]?\d+\.\d+(?:[eE][+-]?\d+)?", text):
        return LiteralValue(float(text), "real")
    raise ValueError(f"bad literal {text!r}")


def _parse_path(text: str) -> Path:
    pos = 0
    elements: list = []
    text = text.strip()
    optional = False
    if text.endswith("?"):
        optional = True
        text = text[:-1].rstrip()
    expecting_element = True
    while pos < len(text):
        if expecting_element:
            m = _ELEMENT_RE.match(text, pos)
            if not m or m.end() == pos:
                raise ValueError(f"bad path element at {text[pos:]!r}")
            if m.group("tname") in _KEYWORDS:
                raise ValueError(f"keyword {m.group('tname')!r} in path")
            name = m.group("name")
            ntype = m.group("ntype")
            elements.append(PathElement(
                glue=m.group("glue"),
                name=name,
                type_name=ntype or (m.group("tname") or None),
            ))
            pos = m.end()
            expecting_element = False
        else:
            m = _CONNECTIVE_RE.match(text, pos)
            if not m:
                raise ValueError(f"expected connective at {text[pos:]!r}")
            c = m.group(0)
            elements.append(Connective(c[0], len(c)))
            pos = m.end()
            expecting_element = True
    if expecting_element:
        raise ValueError(f"path {text!r} ends with a connective")
    return Path(elements, optional=optional)


def _parse_path_line(line: str) -> ConditionedPath:
    # the trailing optional marker belongs to the LINE: "path > 203 ?"
    # marks the conditioned path optional, so strip it before the
    # condition split (otherwise it lands inside the rhs literal)
    line = line.strip()
    optional = False
    if line.endswith("?"):
        optional = True
        line = line[:-1].rstrip()
    m = _OP_RE.search(line)
    if m and not (line[:m.start()].count('"') % 2):  # op outside quotes
        lhs, op, rhs_text = line[:m.start()], m.group(0).strip(), line[m.end():]
        rhs_text = rhs_text.strip()
        try:
            rhs: object = _parse_literal(rhs_text)
        except ValueError:
            rhs = _parse_path(rhs_text)
        path = _parse_path(lhs)
        path.optional = path.optional or optional
        return ConditionedPath(path, op, rhs)
    path = _parse_path(line)
    path.optional = path.optional or optional
    return ConditionedPath(path)


def parse_ts_query(text: str) -> TsQuery:
    paths: list[ConditionedPath] = []
    group = None
    from_dt = to_dt = None
    aggregation = None
    for raw in text.strip().splitlines():
        line = raw.strip()
        if not line:
            continue
        word = line.split(None, 1)[0]
        rest = line[len(word):].strip()
        if word == "from":
            from_dt = datetime.fromisoformat(rest)
        elif word == "to":
            to_dt = datetime.fromisoformat(rest)
        elif word == "group":
            group = Group([v for v in re.split(r"[\s,]+", rest) if v])
        elif word == "aggregate":
            fn, dur = rest.split(None, 1)
            aggregation = Aggregation(fn, _parse_duration(dur))
        else:
            paths.append(_parse_path_line(line))
    if not paths:
        raise ValueError("ts query needs at least one path")
    return TsQuery(paths, group, from_dt, to_dt, aggregation)
