"""MySQL-flavoured JSON semantics (reference parity).

The reference's JSON trio (SURVEY §2.3):
- ``json_extract`` / ``->``  — returns JSON text: strings KEEP quotes, json
  null → ``null``, missing path → SQL NULL, wildcard paths wrap matches in an
  array (functions/src/scalar/json/json_extract.rs:11-47).
- ``json_unquote``           — unquotes strings, serializes others; SQL NULL
  in → SQL NULL out (json_unquote.rs:32, tests/json/mod.rs:22-55).
- ``->>``                    — json_unquote(json_extract(x, p))
  (json_extract_unquote.rs:10-23), the TPC-H CSV-load workhorse.

Spark mapping (all JVM-side, no Python UDFs):
- ``->``  = ``to_json(variant_get(parse_json(x), path))`` — verified to give
  quoted strings, ``null`` for json-null, NULL for missing: exact parity.
- ``->>`` = ``get_json_object(x, path)`` — Spark's fast path already
  unquotes strings and array-wraps wildcards; deviation: json-null returns
  SQL NULL instead of the text ``'null'`` (use ``json_unquote(json_extract)``
  when that nuance matters).

JSONPath dialect translation: the reference accepts ``$.1`` (numeric index
via dot) and ``.*`` on arrays (jsonpath_utils.rs:195-215); Spark wants
``$[1]`` / ``[*]``.  ``translate_path`` rewrites dot-number and dot-star
segments to bracket form.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_DOT_NUM = re.compile(r"\.(\d+)")
_DOT_STAR = re.compile(r"\.\*")


def translate_path(path: str) -> str:
    """Reference JSONPath → Spark JSONPath (``$.1`` → ``$[1]``, ``.*`` → ``[*]``)."""
    out = _DOT_NUM.sub(r"[\1]", path)
    out = _DOT_STAR.sub("[*]", out)
    return out


def json_extract(col: Column | str, path: str) -> Column:
    """``->``: JSON-typed extraction (strings stay quoted).

    Wildcard paths can't go through the variant reader (no ``[*]`` support);
    ``get_json_object`` array-wraps multi-matches with element quoting
    preserved — the reference's wildcard behaviour (json_extract.rs:11-47).
    """
    c = F.col(col) if isinstance(col, str) else col
    p = translate_path(path)
    if "*" in p:
        return F.get_json_object(c, p)
    return F.to_json(F.try_variant_get(F.parse_json(c), p, "variant"))


def json_unquote_extract(col: Column | str, path: str) -> Column:
    """``->>``: unquoted extraction via Spark's native fast path."""
    c = F.col(col) if isinstance(col, str) else col
    return F.get_json_object(c, translate_path(path))


def json_unquote(col: Column | str) -> Column:
    """``json_unquote``: strip quotes from a JSON string value, pass others
    through; SQL NULL → SQL NULL (typed TEXT)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        c.rlike('^".*"$'),
        # decode escapes by round-tripping through the JSON parser
        F.try_variant_get(F.parse_json(c), "$", "string"),
    ).otherwise(c)


# SQL fragments for the dialect rewriter (engine.execute path).
def arrow_sql(lhs: str, path: str) -> str:
    p = translate_path(path)
    if "*" in p:
        return f"get_json_object({lhs}, '{p}')"
    return f"to_json(try_variant_get(parse_json({lhs}), '{p}', 'variant'))"


def double_arrow_sql(lhs: str, path: str) -> str:
    return f"get_json_object({lhs}, '{translate_path(path)}')"
