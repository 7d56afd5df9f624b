"""Round-4 regression tests.

- schema-aware integer division (reference divide.rs:63-85): ``/`` on
  column-typed ints must TRUNCATE and return INTEGER/BIGINT, matching the
  reference's DivideInteger overloads, not Spark's DOUBLE ``/``.
"""

from __future__ import annotations

import pytest

from incresql_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "warehouse"))


def q(e: Engine, sql: str) -> list[str]:
    return e.execute_statement(sql).pipes()


@pytest.fixture()
def div_table(engine):
    engine.execute_statement("CREATE TABLE dt (i INTEGER, j BIGINT, d DECIMAL(10,2))")
    engine.execute_statement("INSERT INTO dt VALUES (7, 20, 7.0)")
    engine.execute_statement("INSERT INTO dt VALUES (-7, 3, 1.5)")
    return engine


def test_int_column_division_truncates_to_integer(div_table):
    res = div_table.execute_statement("SELECT i / 2 FROM dt ORDER BY i")
    assert [r[0] for r in res.rows] == [-3, 3]  # Rust: truncation toward zero
    assert res.df.schema.fields[0].dataType.simpleString() == "int"


def test_int_int_column_division(div_table):
    res = div_table.execute_statement("SELECT i / i FROM dt ORDER BY i")
    assert [r[0] for r in res.rows] == [1, 1]
    assert res.df.schema.fields[0].dataType.simpleString() == "int"


def test_mixed_int_bigint_division_is_bigint(div_table):
    res = div_table.execute_statement("SELECT j / i FROM dt ORDER BY i")
    # rows ordered by i: (i=-7, j=3) -> 3/-7 truncates to 0; (7, 20) -> 2
    assert [r[0] for r in res.rows] == [0, 2]
    assert res.df.schema.fields[0].dataType.simpleString() == "bigint"


def test_bigint_column_by_literal(div_table):
    res = div_table.execute_statement("SELECT j / 6 FROM dt ORDER BY j")
    assert [r[0] for r in res.rows] == [0, 3]
    assert res.df.schema.fields[0].dataType.simpleString() == "bigint"


def test_decimal_operand_stays_fractional(div_table):
    res = div_table.execute_statement("SELECT d / 2 FROM dt ORDER BY d")
    assert [float(r[0]) for r in res.rows] == [0.75, 3.5]
    assert "int" not in res.df.schema.fields[0].dataType.simpleString()


def test_unknown_identifier_untouched(div_table):
    # an aliased non-integer expression must not be force-truncated
    res = div_table.execute_statement(
        "SELECT x / 2 FROM (SELECT d AS x FROM dt) t ORDER BY x"
    )
    assert "int" not in res.df.schema.fields[0].dataType.simpleString()


def test_function_call_operands_untouched(div_table):
    res = div_table.execute_statement("SELECT count(*) / 2 FROM dt")
    # lhs is a call — stays Spark semantics (reference count() is BIGINT,
    # and bigint/int literal reference semantics would truncate; our rewrite
    # is schema-driven and conservatively skips call operands)
    assert len(res.rows) == 1
