"""Reference EXPLAIN goldens, ported verbatim where Catalyst's plan agrees
(tests/optimize/constant_folding.rs:4-43, tests/casts/mod.rs:25-45).

The renderer (incresql_spark/explain.py) emits the reference's 4-column
(tree, col_idx, datatype, expression) table from Catalyst's logical plan.
"""

from __future__ import annotations

import pytest

from incresql_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "warehouse"))


def q(e: Engine, sql: str) -> list[str]:
    return e.execute_statement(sql).pipes()


def test_explain_constant_folding_int(engine):
    """optimize/constant_folding.rs simple_math — VERBATIM."""
    assert q(engine, "EXPLAIN SELECT 1 + 2 * 3 - 4") == [
        "|PROJECT||||",
        "| |output_exprs:||||",
        "| |  _col1|0|INTEGER|3|",
        "| |source:||||",
        "| |  SINGLE||||",
    ]


def test_explain_constant_folding_decimal(engine):
    """optimize/constant_folding.rs test_types.  Reference says
    DECIMAL(6,2); Spark's DecimalPrecision derives DECIMAL(7,2) for the
    same fold (one extra integer digit on the subtract) — same value,
    documented type deviation."""
    assert q(engine, "EXPLAIN SELECT 1.0 + 2.0 * 3.0 - 4.0") == [
        "|PROJECT||||",
        "| |output_exprs:||||",
        "| |  _col1|0|DECIMAL(7,2)|3.00|",
        "| |source:||||",
        "| |  SINGLE||||",
    ]


def test_explain_auto_cast(engine):
    """casts/mod.rs test_auto_cast — VERBATIM (implicit widening casts
    render as to_bigint/to_decimal with input offsets, and Spark derives
    the same DECIMAL(13,2)/DECIMAL(23,2) result types as the reference)."""
    engine.execute_statement("create table t(i INTEGER, b BIGINT, d DECIMAL(10,2))")
    assert q(engine, "EXPLAIN SELECT i + b, i + d, b + d from t") == [
        "|PROJECT||||",
        "| |output_exprs:||||",
        "| |  _col1|0|BIGINT|`+`(to_bigint(<OFFSET 0>), <OFFSET 1>)|",
        "| |  _col2|1|DECIMAL(13,2)|`+`(to_decimal(<OFFSET 0>), <OFFSET 2>)|",
        "| |  _col3|2|DECIMAL(23,2)|`+`(to_decimal(<OFFSET 1>), <OFFSET 2>)|",
        "| |source:||||",
        "| |  TABLE(t)||||",
        "| |   |columns:||||",
        "| |   |  i|0|INTEGER||",
        "| |   |  b|1|BIGINT||",
        "| |   |  d|2|DECIMAL(10,2)||",
    ]


def test_explain_sort_and_table(engine):
    """tests/join/mod.rs:66-115 plan-shape analogue: the reference golden
    encodes ITS hash-join artifacts (key_0 extraction projections); the
    Catalyst analyzed plan renders the same logical content — SORT over the
    join of TABLE(t_left)/TABLE(t_right) with the equi-predicate — without
    them.  Assert the structural rows instead of a verbatim tree."""
    engine.execute_statement("CREATE TABLE t_left (l_id INT, l_text TEXT)")
    engine.execute_statement("CREATE TABLE t_right (r_id INT, r_text TEXT)")
    rows = q(
        engine,
        "EXPLAIN SELECT * FROM t_left JOIN t_right ON l_id = t_right.r_id "
        "ORDER BY l_id, r_id",
    )
    assert rows[0] == "|SORT||||"
    assert "| |  ||INTEGER|<OFFSET 0> (ASC)|" in rows
    assert "| |   |  l_id|0|INTEGER|<OFFSET 0>|" in rows  # projected output
    assert "| |   |  JOIN||||" in rows
    # the equi predicate on logical input offsets (the reference shows
    # <OFFSET 0>/<OFFSET 3> because its hash join prepends a key_0 column)
    assert "| |   |   |||BOOLEAN|`=`(<OFFSET 0>, <OFFSET 2>)|" in rows
    assert "| |   |   |  TABLE(t_left)||||" in rows
    assert "| |   |   |  TABLE(t_right)||||" in rows
    assert "| |   |   |   |  r_id|0|INTEGER||" in rows  # table columns


@pytest.fixture()
def join_tables(engine):
    engine.execute_statement("CREATE TABLE t_left (l_id INT, l_text TEXT)")
    engine.execute_statement("CREATE TABLE t_right (r_id INT, r_text TEXT)")
    return engine


def test_explain_join_explicit_verbatim(join_tables):
    """tests/join/mod.rs:66-110 EXPLAIN golden, full tree.

    Documented Catalyst deviations from the reference golden:
    - no ``key_0`` extraction PROJECTs above the table scans — the
      reference's hash join materializes join keys as leading columns
      (hash_join.rs); Catalyst keeps equi keys inside the join predicate
      and key extraction is a physical-planning detail, so the predicate
      offsets address the RAW concatenated child rows: ``<OFFSET 0>``
      (l_id) and ``<OFFSET 2>`` (r_id) instead of the reference's
      ``<OFFSET 0>`` / ``<OFFSET 3>`` over key-extended rows.
    - consequently the outer PROJECT is the identity mapping (offsets
      0..3), where the reference's re-projects around the key columns
      (offsets 1,2,4,5).
    Tree shape, operator names, types and sort exprs are VERBATIM."""
    rows = q(
        join_tables,
        "EXPLAIN SELECT * FROM t_left JOIN t_right ON l_id = t_right.r_id "
        "ORDER BY l_id, r_id",
    )
    assert rows == [
        "|SORT||||",
        "| |sort_exprs:||||",
        "| |  ||INTEGER|<OFFSET 0> (ASC)|",
        "| |  ||INTEGER|<OFFSET 2> (ASC)|",
        "| |source:||||",
        "| |  PROJECT||||",
        "| |   |output_exprs:||||",
        "| |   |  l_id|0|INTEGER|<OFFSET 0>|",
        "| |   |  l_text|1|TEXT|<OFFSET 1>|",
        "| |   |  r_id|2|INTEGER|<OFFSET 2>|",
        "| |   |  r_text|3|TEXT|<OFFSET 3>|",
        "| |   |source:||||",
        "| |   |  JOIN||||",
        "| |   |   |predicate:||||",
        "| |   |   |||BOOLEAN|`=`(<OFFSET 0>, <OFFSET 2>)|",
        "| |   |   |left:||||",
        "| |   |   |  TABLE(t_left)||||",
        "| |   |   |   |columns:||||",
        "| |   |   |   |  l_id|0|INTEGER||",
        "| |   |   |   |  l_text|1|TEXT||",
        "| |   |   |right:||||",
        "| |   |   |  TABLE(t_right)||||",
        "| |   |   |   |columns:||||",
        "| |   |   |   |  r_id|0|INTEGER||",
        "| |   |   |   |  r_text|1|TEXT||",
    ]


def test_explain_join_comma_form(join_tables):
    """The comma-FROM variant of the same reference golden.  Catalyst's
    analyzed plan is pre-predicate-pushdown, so the WHERE equi-predicate
    renders as FILTER over a predicate-less JOIN (the reference's planner
    pushes it into the JOIN before explaining; Catalyst does the same push
    only in the optimized plan, whose join artifacts we deliberately do
    not render — see module docstring)."""
    rows = q(
        join_tables,
        "EXPLAIN SELECT * FROM t_left, t_right WHERE l_id = t_right.r_id "
        "ORDER BY l_id, r_id",
    )
    assert rows == [
        "|SORT||||",
        "| |sort_exprs:||||",
        "| |  ||INTEGER|<OFFSET 0> (ASC)|",
        "| |  ||INTEGER|<OFFSET 2> (ASC)|",
        "| |source:||||",
        "| |  PROJECT||||",
        "| |   |output_exprs:||||",
        "| |   |  l_id|0|INTEGER|<OFFSET 0>|",
        "| |   |  l_text|1|TEXT|<OFFSET 1>|",
        "| |   |  r_id|2|INTEGER|<OFFSET 2>|",
        "| |   |  r_text|3|TEXT|<OFFSET 3>|",
        "| |   |source:||||",
        "| |   |  FILTER||||",
        "| |   |   |predicate:||||",
        "| |   |   |||BOOLEAN|`=`(<OFFSET 0>, <OFFSET 2>)|",
        "| |   |   |source:||||",
        "| |   |   |  JOIN||||",
        "| |   |   |   |left:||||",
        "| |   |   |   |  TABLE(t_left)||||",
        "| |   |   |   |   |columns:||||",
        "| |   |   |   |   |  l_id|0|INTEGER||",
        "| |   |   |   |   |  l_text|1|TEXT||",
        "| |   |   |   |right:||||",
        "| |   |   |   |  TABLE(t_right)||||",
        "| |   |   |   |   |columns:||||",
        "| |   |   |   |   |  r_id|0|INTEGER||",
        "| |   |   |   |   |  r_text|1|TEXT||",
    ]


def test_explain_spark_escape_hatch(engine):
    """EXPLAIN SPARK still exposes Catalyst's formatted physical plan."""
    rows = q(engine, "EXPLAIN SPARK SELECT 1 + 1")
    assert any("Physical Plan" in r for r in rows)
