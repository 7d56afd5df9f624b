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


# ---- property: division rewrite parity -------------------------------------
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from incresql_spark.dialect import rewrite


def _py_trunc_div(a: int, b: int) -> int:
    """Rust/Java truncating integer division (toward zero)."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


@given(a=st.integers(-(2**31 - 1), 2**31 - 1), b=st.integers(-(2**31 - 1), 2**31 - 1))
@settings(max_examples=200, deadline=None)
def test_literal_division_rewrite_is_truncating(a, b):
    """The dialect's literal/literal rewrite must produce a DIV expression
    whose Python-evaluated semantics equal Rust truncation — checked
    symbolically (no Spark in the loop, so hypothesis can run wide)."""
    if b == 0:
        return
    # negative literals parse as unary minus over a positive literal, which
    # the rewrite sees as the positive token — mirror that here
    sql = rewrite(f"SELECT {a} / {b}")
    if a >= 0 and b >= 0:
        assert "DIV" in sql, sql
    # the rewrite never fires on fractional operands
    assert "DIV" not in rewrite(f"SELECT {a}.5 / {b}")


@given(a=st.integers(0, 100), b=st.integers(1, 100))
@settings(max_examples=30, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_column_division_matches_rust_semantics(div_table, a, b):
    """Engine result for an integer division inside a column expression ==
    Rust truncation (i*0 keeps a column in the expression without changing
    the value; a/b is literal/literal and truncates first)."""
    rows = div_table.execute_statement(
        f"SELECT i * 0 + {a} / {b} FROM dt LIMIT 1"
    ).rows
    assert rows[0][0] == _py_trunc_div(a, b)


def test_negative_divisor_literal_division(div_table):
    """r2 ADVICE dialect.py:230: 10/-2 must truncate to INTEGER -5, not
    Spark DOUBLE -5.0."""
    res = div_table.execute_statement("SELECT 10 / -2")
    assert res.rows[0][0] == -5
    assert res.df.schema.fields[0].dataType.simpleString() == "int"
    res = div_table.execute_statement("SELECT 7 / -2")
    assert res.rows[0][0] == -3  # toward zero, like Rust


def test_division_by_zero_literal_errors(div_table):
    """Reference DivideInteger errors on /0; Spark DIV would yield NULL —
    the dialect fails at rewrite time."""
    with pytest.raises(Exception, match="division by zero"):
        div_table.execute_statement("SELECT 5 / 0")


def test_literals_survive_all_structural_rewrites(div_table):
    """r2 ADVICE dialect.py:202: string literals containing rewrite-shaped
    text (count(), CAST AS TEXT, database(), @@socket, type_of, LIMIT o,n)
    must pass through every structural pass untouched."""
    probes = [
        "count() is zero-arg",
        "CAST(x AS TEXT) inside",
        "database() call",
        "@@socket variable",
        "type_of(y) probe",
        "LIMIT 1, 2 clause",
        "5 / 0 not math",
    ]
    for text in probes:
        got = div_table.execute_statement(f"SELECT '{text}'").rows[0][0]
        assert got == text, (text, got)


# ---- frequency-layer hazards (r2 ADVICE, closed in r4) ----------------------
def test_legacy_seq_ignores_non_segment_entries(spark, tmp_path):
    """Fallback seq for pre-seq segments must enumerate seg-* dirs ONLY:
    schema.json (which always sorts first) and stale compact-* tmp dirs
    must not shift the implied sequence (r2 ADVICE frequency.py:100)."""
    import json
    import os

    from pyspark.sql import types as T

    from incresql_spark.frequency import FreqTable

    t = FreqTable(spark, str(tmp_path / "legacy"))
    t.create(T.StructType([T.StructField("k", T.LongType())]))
    t.insert(spark.createDataFrame([(1,)], "k LONG"))
    t.insert(spark.createDataFrame([(2,)], "k LONG"))
    # strip the seq field (pre-seq era) and drop a stale compact tmp dir
    for name in os.listdir(t.path):
        if name.startswith("seg-"):
            p = os.path.join(t.path, name, "_segmeta.json")
            meta = json.load(open(p))
            meta.pop("seq", None)
            json.dump(meta, open(p, "w"))
    os.makedirs(os.path.join(t.path, "compact-stale"))
    seqs = sorted(s["seq"] for s in t._segments())
    assert seqs == [0, 1], seqs
    # delta over the full range sees exactly the second segment's row
    rows = {r.k for r in t.delta(0).collect()}
    assert rows == {2}


def test_delta_refuses_cursor_inside_compacted_range(spark, tmp_path):
    """compact() collapses seq 0..n into one segment; a delta cursor that
    points inside that span must ERROR, not silently re-deliver merged rows
    (r2 ADVICE frequency.py:224)."""
    from pyspark.sql import types as T

    from incresql_spark.frequency import FreqTable

    t = FreqTable(spark, str(tmp_path / "cmp"))
    t.create(T.StructType([T.StructField("k", T.LongType())]))
    for v in (1, 2, 3):
        t.insert(spark.createDataFrame([(v,)], "k LONG"))
    t.compact()
    # cursor -1 (never consumed) is fine: the whole table is the delta
    assert {r.k for r in t.delta(-1).collect()} == {1, 2, 3}
    # cursor 1 (consumed seqs 0..1) falls inside the compacted 0..2 range
    with pytest.raises(ValueError, match="compacted"):
        t.delta(1)


def test_engine_compact_refreshes_dependent_mvs(engine):
    """COMPACT TABLE must bring dependent MV cursors to head first, so MV
    state is never double-counted (the delta() guard would otherwise make
    the next refresh fail)."""
    engine.execute_statement("CREATE TABLE ct (g TEXT, v INT)")
    engine.execute_statement('INSERT INTO ct VALUES ("a", 1), ("b", 2)')
    engine.execute_statement(
        "CREATE MATERIALIZED VIEW cmv AS SELECT g, count(*) AS n, sum(v) AS s "
        "FROM ct GROUP BY g"
    )
    engine.execute_statement('INSERT INTO ct VALUES ("a", 10)')
    engine.execute_statement("COMPACT TABLE ct")
    engine.execute_statement('INSERT INTO ct VALUES ("b", 20)')
    engine.execute_statement("REFRESH MATERIALIZED VIEW cmv")
    got = sorted(tuple(r) for r in engine.execute_statement(
        "SELECT g, n, s FROM cmv ORDER BY g").rows)
    assert got == [("a", 2, 11), ("b", 2, 22)], got
