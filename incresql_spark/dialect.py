"""SQL dialect shim: the reference's MySQL-flavoured SQL → Spark SQL.

The reference parses its own small grammar (parser/src/*.rs, SURVEY §3.1).
We do NOT port that parser — Spark SQL parses everything; this module only
rewrites the handful of constructs Spark spells differently (SURVEY §7 M2):

- ``expr -> "$.path"`` / ``expr ->> "$.path"``  → variant/get_json_object
  calls (functions/json.py), with JSONPath dialect translation.
- ``FROM DIRECTORY "path" [WITH(DELIMITER="|")]`` → a registered temp view
  over sources/directory.read_directory.
- ``count()``        → ``count(*)``   (zero-arg count, count.rs:6-55)
- ``database()``     → ``current_database()`` shim (session db injected)
- ``type_of(x)``     → ``incre_type_name(typeof(x))`` — reference type
  spellings (INTEGER/BIGINT/TEXT/..., casts/type_of.rs:20)
- ``LIMIT o, n``     → ``LIMIT n OFFSET o`` (MySQL offset form,
  parser/src/select.rs:76-89)

Double-quoted string literals need no rewrite (Spark accepts them outside
ANSI-identifier mode), nor do the comparison/boolean/arith operators.

- integer-literal division ``5/2`` → ``CAST(5 DIV 2 AS INT)``: the
  reference's ``/`` on (int,int) is TRUNCATING integer division returning
  INTEGER (functions/src/scalar/maths/divide.rs:63-70 registers
  DivideInteger; parser/src/literals.rs:70-83 types small number literals
  as i32), where Spark's ``/`` always returns DOUBLE.  Literals wider than
  i32 use the (bigint,bigint)→BIGINT overload (``DIV`` natively).
- column-typed integer division ``i/2``, ``i/j`` → the same truncating
  rewrite, driven by the engine's declared CREATE TABLE schemas via the
  ``int_col_type`` resolver (unknown/ambiguous names stay on Spark's
  DOUBLE ``/``).
"""

from __future__ import annotations

import re
from collections.abc import Callable

from .functions.json import arrow_sql, double_arrow_sql

# lhs: function call with up to one nested paren level, qualified identifier,
# or backticked identifier.  rhs: single- or double-quoted path literal.
_ARROW = re.compile(
    r"""(?P<lhs>[\w.`]+\([^()]*(?:\([^()]*\)[^()]*)*\)   # fn call, 1 nested level
              |'(?:[^'\\]|\\.)*'                         # string literal
              |[\w.`]+)                                  # (qualified) identifier
        \s*(?P<op>->>|->)\s*
        (?P<q>['"])(?P<path>[^'"]*)(?P=q)""",
    re.VERBOSE,
)

_DIRECTORY = re.compile(
    r"""(?:FROM|JOIN)\s+DIRECTORY\s+(?P<q>['"])(?P<path>[^'"]+)(?P=q)
        (?:\s+WITH\s*\(\s*DELIMITER\s*=\s*(?P<q2>['"])(?P<delim>[^'"]+)(?P=q2)\s*\))?""",
    re.VERBOSE | re.IGNORECASE,
)

#: reference type names → Spark type names inside CAST(... AS <type>)
_CAST_TYPES = {"TEXT": "STRING", "BYTEA": "BINARY", "JSON": "STRING",
               "TIMESTAMP": "TIMESTAMP_NTZ"}
_CAST_AS = re.compile(
    rf"\bAS\s+({'|'.join(_CAST_TYPES)})\s*\)", re.IGNORECASE
)
_CAST_OPEN = re.compile(r"\bCAST\s*\(", re.IGNORECASE)


def _rewrite_cast_types(sql: str) -> str:
    """Map reference type names (TEXT/BYTEA/JSON/TIMESTAMP, datatype.rs:5-20)
    to Spark spellings, but only as the target of a CAST — a column alias
    that happens to be named ``text`` is left alone."""
    spans = []
    for m in _CAST_OPEN.finditer(sql):
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        spans.append((m.end(), i))

    def sub(m: re.Match) -> str:
        if any(a <= m.start() < b for a, b in spans):
            return f"AS {_CAST_TYPES[m.group(1).upper()]})"
        return m.group(0)

    return _CAST_AS.sub(sub, sql)


#: string literals ('..' with '' and \' escapes, ".." likewise) and
#: backtick-quoted identifiers — spans no structural rewrite may touch
_LITERAL = re.compile(
    r"""'(?:[^'\\]|\\.|'')*'|"(?:[^"\\]|\\.)*"|`[^`]*`"""
)
_PLACEHOLDER = re.compile(r"\x00(\d+)\x00")


def mask_literals(sql: str) -> tuple[str, list[str]]:
    """Replace every quoted literal/identifier with ``\\x00<i>\\x00`` so
    regex-based structural rewrites cannot corrupt literal text (e.g. the
    db.table mangling rewriting 'prefix default.foo suffix')."""
    stash: list[str] = []

    def repl(m: re.Match) -> str:
        stash.append(m.group(0))
        return f"\x00{len(stash) - 1}\x00"

    return _LITERAL.sub(repl, sql), stash


def unmask_literals(sql: str, stash: list[str]) -> str:
    return _PLACEHOLDER.sub(lambda m: stash[int(m.group(1))], sql)


_I32_MAX = 2**31 - 1

#: int-literal / int-literal (no leading/trailing ident, dot or placeholder
#: chars — so 1.5/2, x1/2 and masked-literal fragments never match).  The
#: divisor may carry a unary minus (unambiguous right after '/'); the
#: dividend may not (a leading '-' there could be binary subtraction).
_INT_DIV = re.compile(r"(?<![\w.\x00])(\d+)\s*/\s*(-?\s*\d+)(?![\w.\x00])")
#: chain step: an already-rewritten integer division divided again
_INT_DIV_CHAIN = re.compile(
    r"(CAST\(\d+ DIV \(?-?\d+\)? AS INT\)|\(\d+ DIV \(?-?\d+\)?\))"
    r"\s*/\s*(-?\s*\d+)(?![\w.\x00])"
)


def _rewrite_int_division(sql: str) -> str:
    """Reference ``/`` parity for integer literals (divide.rs:63-85):
    (int,int) → truncating INTEGER division, (bigint,bigint) → BIGINT.
    Spark's ``/`` is always DOUBLE; ``DIV`` is its truncating twin.
    Expects literal-masked input (``rewrite`` masks once for all the
    structural passes); the regex guards exclude placeholder bytes."""

    def sub(m: re.Match) -> str:
        a = m.group(1)
        b = int(m.group(2).replace(" ", ""))
        if b == 0:
            # reference DivideInteger errors on /0 (Rust integer division
            # panics → query error); Spark DIV would return NULL — fail at
            # rewrite time instead, like the reference's planner would
            raise ValueError("division by zero")
        rhs = f"({b})" if b < 0 else str(b)
        if int(a) <= _I32_MAX and abs(b) <= _I32_MAX:
            return f"CAST({a} DIV {rhs} AS INT)"
        return f"({a} DIV {rhs})"

    out = _INT_DIV.sub(sub, sql)
    # left-assoc chains: 1/2/3 → (CAST(1 DIV 2 AS INT)) DIV 3
    def sub_chain(m: re.Match) -> str:
        b = int(m.group(2).replace(" ", ""))
        if b == 0:
            raise ValueError("division by zero")
        rhs = f"({b})" if b < 0 else str(b)
        return f"CAST({m.group(1)} DIV {rhs} AS INT)"

    while True:
        new = _INT_DIV_CHAIN.sub(sub_chain, out)
        if new == out:
            break
        out = new
    return out


#: identifier (possibly alias-qualified) or bare integer literal operand
_DIV_OPERAND = r"[A-Za-z_][\w.]*|\d+"
_COL_DIV = re.compile(
    rf"(?<![\w.\x00])({_DIV_OPERAND})\s*/\s*({_DIV_OPERAND})(?!\s*\()(?![\w.\x00])"
)


def _operand_int_type(tok: str, type_of) -> str | None:
    if tok.isdigit():
        return "int" if int(tok) <= _I32_MAX else "bigint"
    return type_of(tok.rsplit(".", 1)[-1])


def _rewrite_col_int_division(sql: str, type_of) -> str:
    """Schema-aware ``/`` parity (divide.rs:63-85): when BOTH operands are
    integer-typed — a column whose declared CREATE TABLE type is
    INT/BIGINT, or an integer literal — the reference truncates:
    (int,int) → INTEGER, otherwise → BIGINT.  ``type_of(col)`` returns
    'int' / 'bigint' / None from the engine's declared schemas; any
    unresolvable or non-integer operand leaves the expression to Spark's
    DOUBLE ``/``.  Runs after the literal/literal pass, so remaining
    matches involve at least one identifier.  Single-step only — chained
    ``i/2/3`` rewrites the first division (literal chains are handled by
    the literal pass).  Expects literal-masked input like
    ``_rewrite_int_division``."""

    def sub(m: re.Match) -> str:
        a, b = m.group(1), m.group(2)
        ta = _operand_int_type(a, type_of)
        tb = _operand_int_type(b, type_of)
        if ta is None or tb is None:
            return m.group(0)
        target = "INT" if (ta, tb) == ("int", "int") else "BIGINT"
        return f"CAST({a} DIV {b} AS {target})"

    return _COL_DIV.sub(sub, sql)


#: MySQL @@magic variables the reference substitutes at validation time
#: (p1_validation/sub_in_special_vars.rs:7-32)
_SPECIAL_VARS = {"@@max_allowed_packet": "16777215", "@@socket": "''"}

_COUNT0 = re.compile(r"\bcount\s*\(\s*\)", re.IGNORECASE)
_JSONPATH_AS = re.compile(r"\bAS\s+JSONPATH\s*$", re.IGNORECASE)


def _rewrite_jsonpath_cast(sql: str) -> str:
    """``CAST(expr AS JSONPATH)`` → ``to_jsonpath(expr)``.

    JSONPATH is a first-class reference type (datatype.rs:19, SQL name at
    :56/:79) with no Spark spelling, so the cast becomes the constructor
    call — which also carries the reference's invalid-path → NULL semantics
    (casts/to_jsonpath.rs:17-26).  Balanced-paren scan: the expr may itself
    contain calls; only a depth-0 trailing AS JSONPATH is rewritten."""
    while True:
        replaced = False
        for m in list(_CAST_OPEN.finditer(sql)):
            depth, i = 1, m.end()
            while i < len(sql) and depth:
                if sql[i] == "(":
                    depth += 1
                elif sql[i] == ")":
                    depth -= 1
                i += 1
            inner = sql[m.end() : i - 1]
            tail = _JSONPATH_AS.search(inner)
            if tail:
                sql = (
                    sql[: m.start()]
                    + f"to_jsonpath({inner[: tail.start()].strip()})"
                    + sql[i:]
                )
                replaced = True
                break  # spans shifted — rescan
        if not replaced:
            return sql


_TYPE_OF = re.compile(r"\btype_of\s*\(", re.IGNORECASE)
_DATABASE_FN = re.compile(r"\bdatabase\s*\(\s*\)", re.IGNORECASE)
_LIMIT_COMMA = re.compile(r"\bLIMIT\s+(\d+)\s*,\s*(\d+)", re.IGNORECASE)


def _rewrite_type_of(sql: str) -> str:
    """``type_of(expr)`` → ``incre_type_name(typeof(expr))`` with balanced
    parens (the argument may itself contain calls)."""
    while True:
        m = _TYPE_OF.search(sql)
        if m is None:
            return sql
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        arg = sql[m.end() : i - 1]
        sql = sql[: m.start()] + f"incre_type_name(typeof({arg}))" + sql[i:]


def rewrite(
    sql: str,
    current_db: str = "default",
    register_directory: Callable[[str, str], str] | None = None,
    int_col_type: Callable[[str], str | None] | None = None,
) -> str:
    """Rewrite a reference-dialect statement into Spark SQL.

    ``register_directory(path, delimiter) -> view_name`` is called for each
    DIRECTORY source; the returned temp-view name is substituted.
    ``int_col_type(column) -> 'int' | 'bigint' | None`` (optional) supplies
    declared column types so ``intcol / intcol`` gets reference truncating
    semantics, not Spark's DOUBLE.
    """
    out = sql

    # arrow operators (innermost-first; loop handles chains like a->"$.b"->>"$.c").
    # These two rewrites must see the REAL quoted text (the arrow lhs may be a
    # string literal; DIRECTORY takes a quoted path), so they run pre-masking.
    while True:
        m = _ARROW.search(out)
        if m is None:
            break
        fn = double_arrow_sql if m.group("op") == "->>" else arrow_sql
        out = out[: m.start()] + fn(m.group("lhs"), m.group("path")) + out[m.end() :]

    # DIRECTORY sources
    if register_directory is not None:
        def _sub_dir(m: re.Match) -> str:
            view = register_directory(m.group("path"), m.group("delim") or ",")
            kw = m.group(0).lstrip().split(None, 1)[0]  # FROM or JOIN
            return f"{kw} {view}"

        out = _DIRECTORY.sub(_sub_dir, out)

    # every remaining rewrite is structural — mask string literals and
    # backticked identifiers ONCE so none of them can corrupt literal text
    # (e.g. a literal containing 'count()', 'CAST(x AS TEXT)' or '@@socket')
    out, stash = mask_literals(out)
    out = _rewrite_jsonpath_cast(out)
    out = _rewrite_cast_types(out)
    out = _rewrite_int_division(out)
    if int_col_type is not None:
        out = _rewrite_col_int_division(out, int_col_type)
    out = _COUNT0.sub("count(*)", out)
    out = _rewrite_type_of(out)
    out = _DATABASE_FN.sub(f"'{current_db}'", out)
    out = _LIMIT_COMMA.sub(r"LIMIT \2 OFFSET \1", out)
    for var, const in _SPECIAL_VARS.items():
        out = re.sub(re.escape(var) + r"\b", const, out, flags=re.IGNORECASE)
    return unmask_literals(out, stash)
