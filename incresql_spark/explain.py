"""Reference-parity EXPLAIN: render a Catalyst logical plan as the
reference's 4-column tree table (planner/src/explain/mod.rs:38-83,
logical.rs:7-120).

The reference's EXPLAIN is itself a Values result set with columns
(tree, col_idx, datatype, expression); each operator renders its name, its
output expressions (name, 0-based index, result type, expression text with
``<OFFSET n>`` input references), table columns, predicates, group keys and
sort expressions, indenting children with `` |`` rails.  This module walks
Spark's ANALYZED logical plan (or the OPTIMIZED one for pure-literal
queries, so constant folding shows like the reference's
tests/optimize/constant_folding.rs goldens) and emits the same table.

Node-name mapping (logical.rs:8-28): Project→PROJECT, Sort→SORT,
Filter→FILTER, Join→JOIN, Aggregate→GROUP, GlobalLimit→LIMIT,
Union→UNION_ALL, OneRowRelation→SINGLE, LocalRelation→VALUES,
SubqueryAlias over a view→TABLE(alias) (the scan boundary — the engine's
freq-merge sub-plan below it is an implementation detail the reference
hides inside TABLE too).

Honest deviations: Catalyst's analyzed plan is pre-join-predicate-pushdown
(a comma join renders FILTER over JOIN where the reference pushes the
equi-predicate into JOIN and extracts key_0 projections), and decimal
arithmetic precision follows Spark's DecimalPrecision rules which differ
from rust_decimal's by at most the precision bound — both documented in
tests/test_golden_explain.py.
"""

from __future__ import annotations

import re

_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

#: Catalyst binary-expression class → reference operator spelling
_BINOPS = {
    "Add": "+",
    "Subtract": "-",
    "Multiply": "*",
    "Divide": "/",
    "IntegralDivide": "/",
    "EqualTo": "=",
    "Not": "!",
    "GreaterThan": ">",
    "GreaterThanOrEqual": ">=",
    "LessThan": "<",
    "LessThanOrEqual": "<=",
    "And": "and",
    "Or": "or",
}

#: Spark simpleString prefix → reference type name (datatype.rs:5-20)
_TYPES = {
    "int": "INTEGER",
    "bigint": "BIGINT",
    "string": "TEXT",
    "boolean": "BOOLEAN",
    "binary": "BYTEA",
    "date": "DATE",
    "timestamp_ntz": "TIMESTAMP",
    "timestamp": "TIMESTAMP",
    "double": "DOUBLE",
    "float": "DOUBLE",
    "void": "NULL",
    "null": "NULL",
}

_CAST_FN = {
    "INTEGER": "to_int",
    "BIGINT": "to_bigint",
    "TEXT": "to_text",
    "BOOLEAN": "to_bool",
    "DATE": "to_date",
    "TIMESTAMP": "to_timestamp",
    "DOUBLE": "to_double",
}


def _type_name(dt) -> str:
    s = dt.simpleString()
    if s.startswith("decimal"):
        return s.upper()
    return _TYPES.get(s, s.upper())


def _cast_fn(dt) -> str:
    name = _type_name(dt)
    if name.startswith("DECIMAL"):
        return "to_decimal"
    return _CAST_FN.get(name, f"to_{name.lower()}")


def _seq(jseq) -> list:
    return [jseq.apply(i) for i in range(jseq.size())]


def _cls(obj) -> str:
    return obj.getClass().getSimpleName().rstrip("$")


def _offsets(children) -> dict[int, int]:
    """exprId().id() → 0-based offset into the concatenated child outputs."""
    out: dict[int, int] = {}
    i = 0
    for ch in children:
        for attr in _seq(ch.output()):
            out[attr.exprId().id()] = i
            i += 1
    return out


def _lit_str(e) -> str:
    v = e.value()
    if v is None:
        return "NULL"
    return str(v)


def _expr_str(e, offsets: dict[int, int]) -> str:
    cls = _cls(e)
    if cls == "AttributeReference":
        off = offsets.get(e.exprId().id())
        return f"<OFFSET {off}>" if off is not None else e.name()
    if cls == "Alias":
        return _expr_str(e.child(), offsets)
    if cls == "Literal":
        return _lit_str(e)
    if cls == "Cast" or cls == "AnsiCast":
        return f"{_cast_fn(e.dataType())}({_expr_str(e.child(), offsets)})"
    kids = [_expr_str(c, offsets) for c in _seq(e.children())]
    if cls in _BINOPS and len(kids) == 2:
        return f"`{_BINOPS[cls]}`({kids[0]}, {kids[1]})"
    name = e.prettyName()
    return f"{name}({', '.join(kids)})"


def _expr_name(named, idx: int) -> str:
    cls = _cls(named)
    if cls == "AttributeReference":
        return named.name()
    name = named.name()
    if _IDENT.match(name):
        return name
    return f"_col{idx + 1}"


class _Renderer:
    def __init__(self):
        self.lines: list[tuple[str, str, str, str]] = []
        self.pads: list[str] = []

    def _pad(self) -> str:
        return "".join(self.pads)

    def tree(self, text: str) -> None:
        self.lines.append((self._pad() + text, "", "", ""))

    def full(self, name: str, idx: int, dt: str, expr: str) -> None:
        self.lines.append((self._pad() + name, str(idx), dt, expr))

    def expr_only(self, dt: str, expr: str) -> None:
        self.lines.append((self._pad(), "", dt, expr))

    # -- node rendering ------------------------------------------------------
    def render(self, plan) -> None:
        cls = _cls(plan)
        children = _seq(plan.children())

        # pass-through wrappers the reference has no node for
        if cls in ("LocalLimit", "View", "Distinct", "ResolvedHint", "Offset"):
            self.render(children[0])
            return

        if cls == "SubqueryAlias":
            self._render_table(plan)
            return
        if cls == "OneRowRelation":
            self.tree("SINGLE")
            return
        if cls == "LocalRelation":
            self.tree("VALUES")
            return

        name = {
            "Project": "PROJECT",
            "Sort": "SORT",
            "Filter": "FILTER",
            "Join": "JOIN",
            "Aggregate": "GROUP",
            "GlobalLimit": "LIMIT",
            "Union": "UNION_ALL",
        }.get(cls, cls.upper())
        self.tree(name)
        self.pads.append(" |")
        offs = _offsets(children)

        if cls in ("Project", "Aggregate"):
            exprs = _seq(
                plan.projectList() if cls == "Project" else plan.aggregateExpressions()
            )
            self.tree("output_exprs:")
            self.pads.append("  ")
            for i, ne in enumerate(exprs):
                self.full(
                    _expr_name(ne, i), i, _type_name(ne.dataType()), _expr_str(ne, offs)
                )
            self.pads.pop()

        if cls == "GlobalLimit":
            self.tree(f"limit: {plan.limitExpr().value()}")
            self.tree("offset: 0")

        if cls == "Filter":
            self.tree("predicate:")
            cond = plan.condition()
            self.expr_only(_type_name(cond.dataType()), _expr_str(cond, offs))

        if cls == "Join":
            cond = plan.condition()
            if cond.isDefined():
                self.tree("predicate:")
                c = cond.get()
                self.expr_only(_type_name(c.dataType()), _expr_str(c, offs))

        if cls == "Aggregate":
            keys = _seq(plan.groupingExpressions())
            if keys:
                self.tree("group_keys:")
                for k in keys:
                    self.expr_only(_type_name(k.dataType()), _expr_str(k, offs))

        if cls == "Sort":
            orders = _seq(plan.order())
            if orders:
                self.tree("sort_exprs:")
                self.pads.append("  ")
                for so in orders:
                    d = "ASC" if "Ascending" in str(so.direction()) else "DESC"
                    self.expr_only(
                        _type_name(so.child().dataType()),
                        f"{_expr_str(so.child(), offs)} ({d})",
                    )
                self.pads.pop()

        if cls == "Join":
            for label, ch in zip(("left", "right"), children):
                self.tree(f"{label}:")
                self.pads.append("  ")
                self.render(ch)
                self.pads.pop()
        elif cls == "Union":
            for i, ch in enumerate(children):
                self.tree(f"source_{i}:")
                self.pads.append("  ")
                self.render(ch)
                self.pads.pop()
        elif children:
            self.tree("source:")
            self.pads.append("  ")
            self.render(children[0])
            self.pads.pop()
        self.pads.pop()

    def _render_table(self, plan) -> None:
        # strip the engine's db__name mangling for display
        alias = plan.alias()
        alias = alias.split("__", 1)[1] if "__" in alias else alias
        self.tree(f"TABLE({alias})")
        self.pads.append(" |")
        self.tree("columns:")
        self.pads.append("  ")
        for i, attr in enumerate(_seq(plan.output())):
            self.full(attr.name(), i, _type_name(attr.dataType()), "")
        self.pads.pop()
        self.pads.pop()


def _has_relation_leaf(plan) -> bool:
    if _cls(plan) in ("SubqueryAlias", "LogicalRDD", "LocalRelation", "Relation"):
        return True
    return any(_has_relation_leaf(c) for c in _seq(plan.children()))


def reference_explain(df) -> list[tuple[str, str, str, str]]:
    """Rows (tree, col_idx, datatype, expression) for the reference's
    EXPLAIN rendering of this DataFrame's logical plan."""
    qe = df._jdf.queryExecution()
    analyzed = qe.analyzed()
    # pure-literal queries render the optimized plan so constant folding is
    # visible (the reference explains its post-optimization plan; for table
    # queries we keep the analyzed one — Catalyst's optimizer erases the
    # TABLE boundary the reference renders)
    plan = analyzed if _has_relation_leaf(analyzed) else qe.optimizedPlan()
    r = _Renderer()
    r.render(plan)
    return r.lines
