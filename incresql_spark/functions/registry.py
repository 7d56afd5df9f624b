"""The engine function registry — SQL-defined scalar functions registered on
the session (the reference's compiled-in ``Registry``,
functions/src/registry.rs:11-13; listed by SHOW FUNCTIONS,
runtime/src/connection.rs:36-49).

All functions are Spark SQL scalar UDFs (``CREATE TEMPORARY FUNCTION ...
RETURN expr``) — Catalyst inlines the body into the calling plan (verified:
a constant call folds to a literal), so these cost nothing at runtime and
work at any scale.  No Python UDFs anywhere.

Coverage vs the reference's scalar library (SURVEY §2.3): and/or/not,
comparisons, between, is-ops, arithmetic are native Spark operators; the
``to_*`` cast family, json trio, and date_sub map below; ``database()`` and
``type_of`` are dialect rewrites (they need session/any-type context).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

# name → (args, return type, body) — reference file in the comment
_FUNCTIONS: list[tuple[str, str, str, str]] = [
    # casts/to_bool.rs — text/int accepted like MySQL
    ("incre_to_bool", "x STRING", "BOOLEAN", "CAST(x AS BOOLEAN)"),
    # casts/to_int.rs
    ("incre_to_int", "x STRING", "INT", "CAST(x AS INT)"),
    # casts/to_bigint.rs
    ("incre_to_bigint", "x STRING", "BIGINT", "CAST(x AS BIGINT)"),
    # casts/to_decimal.rs — DECIMAL_MAX_PRECISION=28, MAX_SCALE=14
    ("incre_to_decimal", "x STRING", "DECIMAL(28,14)", "CAST(x AS DECIMAL(28,14))"),
    # casts/to_text.rs
    ("incre_to_text", "x STRING", "STRING", "CAST(x AS STRING)"),
    # casts/to_date.rs — ISO YYYY-MM-DD
    ("incre_to_date", "x STRING", "DATE", "CAST(x AS DATE)"),
    # casts/to_timestamp.rs
    ("incre_to_timestamp", "x STRING", "TIMESTAMP_NTZ", "CAST(x AS TIMESTAMP_NTZ)"),
    # json/json_unquote.rs:32 — strings unquote, json-null → 'null' text,
    # SQL NULL → NULL
    (
        "json_unquote",
        "x STRING",
        "STRING",
        "CASE WHEN x RLIKE '^\".*\"$' "
        "THEN CAST(try_variant_get(parse_json(x), '$', 'string') AS STRING) "
        "ELSE x END",
    ),
    # json/json_extract.rs:11-47 — JSON-typed extraction (quotes kept)
    (
        "json_extract",
        "x STRING, p STRING",
        "STRING",
        "to_json(try_variant_get(parse_json(x), p, 'variant'))",
    ),
    # reference spellings of the cast family (casts/to_*.rs) — registered
    # under their real names where Spark has no builtin of that name
    # (to_date/to_timestamp/to_json are Spark builtins with compatible-enough
    # semantics for the reference corpus and are NOT shadowed)
    ("to_bool", "x STRING", "BOOLEAN", "CAST(x AS BOOLEAN)"),
    ("to_int", "x STRING", "INT", "CAST(x AS INT)"),
    ("to_bigint", "x STRING", "BIGINT", "CAST(x AS BIGINT)"),
    ("to_decimal", "x STRING", "DECIMAL(28,14)", "CAST(x AS DECIMAL(28,14))"),
    ("to_text", "x STRING", "STRING", "CAST(x AS STRING)"),
    # to_jsonpath compiles a path literal into a first-class JSONPATH datum
    # (datum.rs:31-32; casts/to_jsonpath.rs:17-26 — invalid paths → NULL).
    # Spark has no JSONPATH type, so the datum is a tagged single-field
    # struct: type_of() maps its typeof() spelling to JSONPATH, the engine
    # renders it as the reference's Display does ('<original>',
    # jsonpath_utils.rs:68-72), and struct ordering == the reference's
    # Ord-on-original-string (datum.rs:182-184).  The validity regex mirrors
    # the nom grammar (jsonpath_utils.rs:195-217): '$' then any of  .*  [*]
    # [int]  .int  ["key"]  .name(no-dot-no-bracket).  (Keys quote with
    # DOUBLE quotes only — jsonpath_utils.rs:233-241's alt has no
    # single-quote branch despite its comment.)  The
    # selector is an ATOMIC group ((?>...)) with a POSSESSIVE repetition
    # (*+) because nom's many0(alt(...)) COMMITS to the first alternative
    # that succeeds and never re-parses it: '$.*abc' and '$.5x' are parse
    # failures in the reference, but a backtracking regex would re-read
    # them as name selectors and falsely validate.  Property-tested against
    # a faithful Python model of the nom grammar
    # (tests/test_golden_building_blocks.py::test_jsonpath_grammar_model).
    (
        "to_jsonpath",
        "x STRING",
        "STRUCT<__jsonpath: STRING>",
        # \A/\z anchors, not ^/$: Java's '$' matches BEFORE a final line
        # terminator, so '$[0]\n' would falsely validate with '$'.
        r"CASE WHEN x RLIKE "
        r"'\\A\\$(?>\\.\\*|\\[\\*\\]|\\[-?[0-9]+\\]|\\.-?[0-9]+"
        r"|\\[\"(?:[^\"\\\\]|\\\\.)*\"\\]"
        r"|\\.[^.\\[]+)*+\\z' "
        r"THEN named_struct('__jsonpath', x) END",
    ),
    # casts/type_of.rs:20 — reference type spellings over Spark typeof names
    (
        "incre_type_name",
        "t STRING",
        "STRING",
        "CASE t WHEN 'int' THEN 'INTEGER' WHEN 'bigint' THEN 'BIGINT' "
        "WHEN 'string' THEN 'TEXT' WHEN 'boolean' THEN 'BOOLEAN' "
        "WHEN 'void' THEN 'NULL' WHEN 'binary' THEN 'BYTEA' "
        "WHEN 'date' THEN 'DATE' WHEN 'timestamp_ntz' THEN 'TIMESTAMP' "
        "WHEN 'struct<__jsonpath:string>' THEN 'JSONPATH' "
        "ELSE upper(t) END",
    ),
]


def register_all(spark: SparkSession) -> list[str]:
    """Install the function library on the session; returns the names."""
    names = []
    for name, args, ret, body in _FUNCTIONS:
        spark.sql(
            f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({args}) "
            f"RETURNS {ret} RETURN {body}"
        )
        names.append(name)
    return names
