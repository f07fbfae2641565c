"""DSL -> SPARQL translation (reference: dsl/src/translator.rs and
dsl/src/translator/{path,graph_pattern,aggregation,group,
timestamp_conditions}.rs).

Output is SPARQL text executed by the otit_swt_spark Engine, so the whole
DSL query still compiles to one Catalyst plan. Structure mirrors the
reference's algebra:

- each path element gets a variable (glue name, type name, or a
  connective-derived compound name) with its constraint triples
  instantiated from the user-supplied name/type-name templates
- every terminal sprouts the hasTimeseries/hasDataPoint/hasValue/
  hasTimestamp quad sharing one ``?timestamp``
- per-path ``<var>_path_name`` BINDs concatenate the on-path names with
  the original connective punctuation
- ``aggregate fn dur`` wraps the pattern in a sub-SELECT grouping on
  ``FLOOR(DateTimeAsSeconds(?timestamp)/dur)*dur`` buckets
  (reference dsl/src/translator/aggregation.rs:12-116)
- ``group glue`` adds an outer sub-SELECT grouping on the glue's path
  name with ``nestAggregation``/``SAMPLE`` of the other projections
  (reference dsl/src/translator/group.rs:9-111)
- optional paths become OPTIONAL blocks (LeftJoin)
"""

from __future__ import annotations

from datetime import timezone

from otit_swt_spark.dsl.ast import (
    Connective,
    LiteralValue,
    Path,
    PathElement,
    TsQuery,
)

OTIT = "https://github.com/magbak/otit_swt#"
HAS_TIMESERIES = OTIT + "hasTimeseries"
HAS_DATA_POINT = OTIT + "hasDataPoint"
HAS_VALUE = OTIT + "hasValue"
HAS_TIMESTAMP = OTIT + "hasTimestamp"
DATETIME_AS_SECONDS = OTIT + "DateTimeAsSeconds"
SECONDS_AS_DATETIME = OTIT + "SecondsAsDateTime"
DATETIME_AS_NANOS = OTIT + "DateTimeAsNanos"
NANOS_AS_DATETIME = OTIT + "NanosAsDateTime"
NEST = OTIT + "nestAggregation"
TIMESTAMP_VARIABLE = "timestamp"

#: sentinels in user templates (reference dsl/src/costants.rs)
REPLACE_VARIABLE_NAME = "replace_variable"
REPLACE_STR_LITERAL = "replace_str"

_AGG_FN = {"mean": "AVG", "avg": "AVG", "max": "MAX", "maximum": "MAX",
           "min": "MIN", "minimum": "MIN", "sum": "SUM", "sample": "SAMPLE",
           "count": "COUNT"}


def _fmt_term(t: str) -> str:
    if t.startswith("?") or t.startswith('"') or t.startswith("<"):
        return t
    return f"<{t}>"


class Translator:
    """``name_template`` / ``type_name_template``: lists of (s, p, o)
    triples in SPARQL surface syntax where ``?replace_variable`` stands for
    the element variable and ``"replace_str"`` for the constraint string
    (reference Translator::new, dsl/src/translator.rs:49-74).
    ``connective_mapping``: connective text (e.g. ``"."``, ``"--"``) ->
    predicate IRI."""

    def __init__(self, name_template, type_name_template, connective_mapping):
        self.name_template = name_template
        self.type_name_template = type_name_template
        self.connective_mapping = connective_mapping
        self._reset()

    def _reset(self):
        self.triples: list[tuple[str, str, str]] = []
        self.optional_blocks: list[dict] = []
        self.conditions: list[str] = []
        self.binds: list[tuple[str, str]] = []          # (var, expr-text)
        self.glue_vars: dict[str, str] = {}
        self.var_counter = 0
        self.has_outgoing: set[str] = set()
        self.value_of: dict[str, str] = {}              # end var -> value var
        self.path_name_of: dict[str, str] = {}          # var -> path_name var
        self.path_info: list[dict] = []                 # per terminal path
        self.group_binds: list[tuple[str, str]] = []

    # -- template instantiation ---------------------------------------------
    def _fill(self, template, var: str, lit: str | None, name_obj_var: str | None,
              sink: list):
        for s, p, o in template:
            def sub(t: str) -> str:
                if t == "?" + REPLACE_VARIABLE_NAME:
                    return f"?{var}"
                if t.strip('"') == REPLACE_STR_LITERAL:
                    if name_obj_var is not None:
                        return f"?{name_obj_var}"
                    return '"' + (lit or "") + '"'
                return t
            sink.append((sub(s), sub(p), sub(o)))

    def _type_var(self) -> str:
        v = f"type_var_{self.var_counter}"
        self.var_counter += 1
        return v

    # -- path translation (reference dsl/src/translator/path.rs) ------------
    def _element_var(self, pe: PathElement, ident: list[str], sink: list) -> str:
        if pe.glue:
            ident.clear()
            ident.append(pe.glue)
            var = self.glue_vars.setdefault(pe.glue, pe.glue)
        else:
            if pe.type_name and not pe.name:
                ident.append(pe.type_name)
            if pe.name:
                ident.append(f"_{pe.name}_")
            var = "".join(ident)
        if pe.name:
            self._fill(self.name_template, var, pe.name, None, sink)
        if pe.type_name:
            tv = self._type_var()
            filled: list = []
            self._fill(self.type_name_template, var, pe.type_name, None, filled)
            # the reference's type template introduces its own fresh variable
            # per use; rename any non-replace variables to be unique
            renamed = []
            for s, p, o in filled:
                renamed.append(tuple(
                    f"?{tv}" if t.startswith("?") and t != f"?{var}" else t
                    for t in (s, p, o)))
            sink.extend(renamed)
        return var

    def _translate_path(self, path: Path, sink: list) -> tuple[list[str], list[Connective]]:
        vars_on_path: list[str] = []
        connectives: list[Connective] = []
        ident: list[str] = []
        prev = None
        pending: Connective | None = None
        for item in path.elements:
            if isinstance(item, Connective):
                pending = item
                ident.append(f"__{item.name_part()}__")
                continue
            var = self._element_var(item, ident, sink)
            if prev is not None:
                iri = self.connective_mapping.get(pending.text())
                if iri is None:
                    raise ValueError(f"connective {pending.text()!r} not mapped")
                sink.append((f"?{prev}", f"<{iri}>", f"?{var}"))
                self.has_outgoing.add(prev)
                connectives.append(pending)
            vars_on_path.append(var)
            prev = var
        return vars_on_path, connectives

    def _add_ts_quad(self, end_var: str, sink: list) -> str:
        ts = f"{end_var}_timeseries"
        dp = f"{ts}_datapoint"
        val = f"{dp}_value"
        sink.append((f"?{end_var}", f"<{HAS_TIMESERIES}>", f"?{ts}"))
        sink.append((f"?{ts}", f"<{HAS_DATA_POINT}>", f"?{dp}"))
        sink.append((f"?{dp}", f"<{HAS_VALUE}>", f"?{val}"))
        sink.append((f"?{dp}", f"<{HAS_TIMESTAMP}>", f"?{TIMESTAMP_VARIABLE}"))
        self.value_of[end_var] = val
        return val

    def _add_path_names(self, vars_on_path: list[str], connectives: list[Connective],
                        sink: list, binds: list, group_by: list[str]):
        """name-on-path vars + path_name BIND (reference
        graph_pattern.rs create_name_path_variable)."""
        name_vars = []
        for v in vars_on_path:
            nv = f"{v}_name_on_path"
            self._fill(self.name_template, v, None, nv, sink)
            name_vars.append(nv)
        parts = []
        for i, nv in enumerate(name_vars):
            parts.append(f"?{nv}")
            if i < len(connectives):
                parts.append(f'"{connectives[i].text()}"')
        end = vars_on_path[-1]
        pn = f"{end}_path_name"
        binds.append((pn, f"CONCAT({', '.join(parts)})" if len(parts) > 1 else parts[0]))
        self.path_name_of[end] = pn
        # grouped non-terminal glue vars concatenate entity IRIs instead
        # (reference group.rs + graph_pattern.rs glue_names_path)
        for i, v in enumerate(vars_on_path[:-1]):
            if v in self.glue_vars and v not in self.path_name_of and v in group_by:
                gparts = []
                for j, pv in enumerate(vars_on_path):
                    gparts.append(f"?{pv}")
                    if j < len(connectives):
                        gparts.append(f'"{connectives[j].text()}"')
                gpn = f"{v}_path_name"
                self.path_name_of[v] = gpn
                self.group_binds.append((gpn, f"CONCAT({', '.join(gparts)})"))

    # -- literals / conditions ----------------------------------------------
    def _lit_text(self, lv: LiteralValue) -> str:
        if lv.kind == "boolean":
            return "true" if lv.value else "false"
        if lv.kind == "string":
            return f'"{lv.value}"'
        return str(lv.value)

    # -- main ---------------------------------------------------------------
    def translate(self, q: TsQuery) -> str:
        self._reset()
        group_by = list(q.group.var_names) if q.group else []
        project_paths: list[str] = []
        project_values: list[str] = []
        opt_blocks: list[dict] = []

        for cp in q.paths:
            optional = cp.path.optional
            sink: list = [] if optional else self.triples
            binds: list = []
            vars_on_path, connectives = self._translate_path(cp.path, sink)
            end = vars_on_path[-1]
            val = self._add_ts_quad(end, sink)
            self._add_path_names(vars_on_path, connectives, sink,
                                 binds if optional else self.binds, group_by)
            cond = None
            if cp.op is not None:
                if isinstance(cp.rhs, Path):
                    rhs_sink = sink
                    rvars, _ = self._translate_path(cp.rhs, rhs_sink)
                    rval = self._add_ts_quad(rvars[-1], rhs_sink)
                    rhs_text = f"?{rval}"
                else:
                    rhs_text = self._lit_text(cp.rhs)
                if cp.op == "like":
                    cond = f'REGEX(STR(?{val}), {rhs_text})'
                else:
                    cond = f"?{val} {cp.op} {rhs_text}"
            if optional:
                opt_blocks.append({"triples": sink, "binds": binds, "cond": cond,
                                   "end": end, "value": val})
            else:
                if cond:
                    self.conditions.append(cond)
                if end not in self.has_outgoing:
                    project_paths.append(self.path_name_of[end])
                    project_values.append(val)

        # timestamp bounds (reference timestamp_conditions.rs)
        for dt, op in ((q.from_datetime, ">="), (q.to_datetime, "<=")):
            if dt is not None:
                if dt.tzinfo is not None:
                    dt = dt.astimezone(timezone.utc).replace(tzinfo=None)
                iso = dt.strftime("%Y-%m-%dT%H:%M:%S")
                self.conditions.append(
                    f'?{TIMESTAMP_VARIABLE} {op} "{iso}"^^'
                    "<http://www.w3.org/2001/XMLSchema#dateTime>")

        # assemble inner pattern text
        lines = []
        for s, p, o in self.triples:
            lines.append(f"  {_fmt_term(s)} {_fmt_term(p)} {_fmt_term(o)} .")
        for ob in opt_blocks:
            inner = [f"    {_fmt_term(s)} {_fmt_term(p)} {_fmt_term(o)} ."
                     for s, p, o in ob["triples"]]
            if ob["cond"]:
                inner.append(f"    FILTER({ob['cond']})")
            for v, e in ob["binds"]:
                inner.append(f"    BIND({e} AS ?{v})")
            lines.append("  OPTIONAL {\n" + "\n".join(inner) + "\n  }")
            if ob["end"] not in self.has_outgoing:
                project_paths.append(self.path_name_of[ob["end"]])
                project_values.append(ob["value"])
        if self.conditions:
            lines.append(f"  FILTER({' && '.join(self.conditions)})")
        for v, e in self.binds:
            lines.append(f"  BIND({e} AS ?{v})")
        inner_text = "\n".join(lines)

        # aggregation sub-select (reference aggregation.rs)
        if q.aggregation is not None:
            secs = q.aggregation.duration_seconds
            if float(secs).is_integer():
                to_f, from_f, mag = DATETIME_AS_SECONDS, SECONDS_AS_DATETIME, int(secs)
            else:
                to_f, from_f, mag = DATETIME_AS_NANOS, NANOS_AS_DATETIME, int(secs * 1e9)
            bucket = (f"FLOOR(<{to_f}>(?{TIMESTAMP_VARIABLE}) / {mag}) * {mag}")
            inner_text += f"\n  BIND({bucket} AS ?timestamp_grouping)"
            fn = _AGG_FN[q.aggregation.function_name]
            sel = [f"(({fn}(?{v})) AS ?{v})" for v in project_values]
            sel += [f"?{v}" for v in project_paths] + ["?timestamp_grouping"]
            by = project_paths + ["timestamp_grouping"]
            inner_text = (
                "  {SELECT " + " ".join(sel) + " WHERE {\n" + inner_text +
                "\n  } GROUP BY " + " ".join(f"?{v}" for v in by) + "}\n" +
                f"  BIND(<{from_f}>(?timestamp_grouping) AS ?{TIMESTAMP_VARIABLE})"
            )

        # glue grouping sub-select (reference group.rs)
        new_projections: list[str] = []
        if q.group is not None:
            grouping_paths, grouping_values = set(), set()
            by = []
            for g in q.group.var_names:
                if g not in self.glue_vars:
                    raise ValueError(f"group variable {g!r} is not a glue name")
                pn = self.path_name_of.get(g)
                if pn is None:
                    raise ValueError(f"no path name for group variable {g!r}")
                by.append(pn)
                if g in self.value_of:  # grouping on a terminal
                    grouping_paths.add(pn)
                    grouping_values.add(self.value_of[g])
            for v, e in self.group_binds:
                inner_text += f"\n  BIND({e} AS ?{v})"
                new_projections.append(v)
            sel = []
            for v in project_paths:
                agg = "SAMPLE" if v in grouping_paths else f"<{NEST}>"
                sel.append(f"({agg}(?{v}) AS ?{v})")
            for v in project_values:
                agg = "SAMPLE" if v in grouping_values else f"<{NEST}>"
                sel.append(f"({agg}(?{v}) AS ?{v})")
            sel += [f"?{v}" for v in by]
            group_keys = list(by)
            if project_values:
                group_keys.append(TIMESTAMP_VARIABLE)
                sel.append(f"?{TIMESTAMP_VARIABLE}")
            inner_text = (
                "  {SELECT " + " ".join(sel) + " WHERE {\n" + inner_text +
                "\n  } GROUP BY " + " ".join(f"?{v}" for v in group_keys) + "}"
            )

        projections = new_projections + project_paths + project_values
        if project_values:
            projections.append(TIMESTAMP_VARIABLE)
        query = (
            "PREFIX xsd:<http://www.w3.org/2001/XMLSchema#>\n"
            "SELECT " + " ".join(f"?{v}" for v in projections) + " WHERE {\n"
            + inner_text + "\n}"
        )
        return query
