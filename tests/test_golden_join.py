"""Full port of the reference join golden family
(/root/reference/tests/join/mod.rs:4-80 test_inner_joins + test_left_joins):
comma-joins, new-style equi joins, non-equi predicates, constant-FALSE
left joins, filters after joins, and the left-join-as-MINUS idiom — all
over tables holding duplicate (freq-merged) and NULL-keyed rows, asserted
against the reference's literal pipe rows.

One deliberate deviation: the reference's ORDER BY leaves ties (equal
l_id/r_id) to its single-threaded stable scan order; a distributed engine
has no such order, so the queries add the text columns as explicit
tie-breakers.  The reference goldens are already in that full lexical
order, so the expected rows are byte-identical to mod.rs.
"""

from __future__ import annotations

import pytest

from incresql_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    e = Engine(spark, str(tmp_path / "warehouse"))
    e.execute_statement("CREATE TABLE t_left (l_id INT, l_text TEXT)")
    e.execute_statement(
        """INSERT INTO t_left VALUES
        (1, "la"), (1, "lb"),
        (2, "lc"), (2, "ld"),
        (3, "le"), (3, "lf"),
        (null, "lg"), (null, "lh")"""
    )
    e.execute_statement("CREATE TABLE t_right (r_id INT, r_text TEXT)")
    e.execute_statement(
        """INSERT INTO t_right VALUES
        (1, "ra"), (1, "rb"),
        (2, "rc"), (2, "rd"),
        (4, "re"), (4, "rf"),
        (null, "rg"), (null, "rh")"""
    )
    return e


def q(e: Engine, sql: str) -> list[str]:
    return e.execute_statement(sql).pipes()


INNER_GOLDEN = [
    "|1|la|1|ra|",
    "|1|la|1|rb|",
    "|1|lb|1|ra|",
    "|1|lb|1|rb|",
    "|2|lc|2|rc|",
    "|2|lc|2|rd|",
    "|2|ld|2|rc|",
    "|2|ld|2|rd|",
]


def test_inner_join_old_style(engine):
    """mod.rs:31-46 — comma-FROM with WHERE equi predicate."""
    got = q(
        engine,
        "SELECT * FROM t_left, t_right WHERE l_id = t_right.r_id "
        "ORDER BY l_id, r_id, l_text, r_text",
    )
    assert got == INNER_GOLDEN


def test_inner_join_new_style(engine):
    """mod.rs:49-64 — JOIN ... ON."""
    got = q(
        engine,
        "SELECT * FROM t_left join t_right on l_id = t_right.r_id "
        "ORDER BY l_id, r_id, l_text, r_text",
    )
    assert got == INNER_GOLDEN


def test_inner_join_non_equi(engine):
    """mod.rs:118-133 — l_id + r_id = 3."""
    got = q(
        engine,
        "SELECT * FROM t_left join t_right on l_id + t_right.r_id = 3 "
        "ORDER BY l_id, r_id, l_text, r_text",
    )
    assert got == [
        "|1|la|2|rc|",
        "|1|la|2|rd|",
        "|1|lb|2|rc|",
        "|1|lb|2|rd|",
        "|2|lc|1|ra|",
        "|2|lc|1|rb|",
        "|2|ld|1|ra|",
        "|2|ld|1|rb|",
    ]


LEFT_GOLDEN = [
    "|1|la|1|ra|",
    "|1|la|1|rb|",
    "|1|lb|1|ra|",
    "|1|lb|1|rb|",
    "|2|lc|2|rc|",
    "|2|lc|2|rd|",
    "|2|ld|2|rc|",
    "|2|ld|2|rd|",
    "|3|le|NULL|NULL|",
    "|3|lf|NULL|NULL|",
    "|NULL|lg|NULL|NULL|",
    "|NULL|lh|NULL|NULL|",
]


def test_left_join_basic(engine):
    """mod.rs:165-190 — NULL padding, NULL keys never match."""
    got = q(
        engine,
        "SELECT * FROM t_left left outer join t_right on l_id = t_right.r_id "
        "ORDER BY l_text, r_id, r_text",
    )
    assert got == LEFT_GOLDEN


def test_left_join_non_equi(engine):
    """mod.rs:193-215."""
    got = q(
        engine,
        "SELECT * FROM t_left left outer join t_right "
        "on l_id + t_right.r_id = 3 ORDER BY l_text, r_id, r_text",
    )
    assert got == [
        "|1|la|2|rc|",
        "|1|la|2|rd|",
        "|1|lb|2|rc|",
        "|1|lb|2|rd|",
        "|2|lc|1|ra|",
        "|2|lc|1|rb|",
        "|2|ld|1|ra|",
        "|2|ld|1|rb|",
        "|3|le|NULL|NULL|",
        "|3|lf|NULL|NULL|",
        "|NULL|lg|NULL|NULL|",
        "|NULL|lh|NULL|NULL|",
    ]


def test_left_join_constant_false(engine):
    """mod.rs:218-236 — ON false pads every left row."""
    got = q(
        engine,
        "SELECT * FROM t_left left outer join t_right on false "
        "ORDER BY l_text, r_id",
    )
    assert got == [
        "|1|la|NULL|NULL|",
        "|1|lb|NULL|NULL|",
        "|2|lc|NULL|NULL|",
        "|2|ld|NULL|NULL|",
        "|3|le|NULL|NULL|",
        "|3|lf|NULL|NULL|",
        "|NULL|lg|NULL|NULL|",
        "|NULL|lh|NULL|NULL|",
    ]


def test_filter_after_left_join(engine):
    """mod.rs:239-269 — WHERE on either side post-join."""
    expected = [
        "|1|la|1|ra|",
        "|1|la|1|rb|",
        "|1|lb|1|ra|",
        "|1|lb|1|rb|",
    ]
    got = q(
        engine,
        "SELECT * FROM t_left left outer join t_right on l_id = t_right.r_id "
        "WHERE l_id = 1 ORDER BY l_text, r_id, r_text",
    )
    assert got == expected
    got = q(
        engine,
        "SELECT * FROM t_left left outer join t_right on l_id = t_right.r_id "
        "WHERE r_id = 1 ORDER BY l_text, r_id, r_text",
    )
    assert got == expected


def test_left_join_emulating_minus(engine):
    """mod.rs:272-287 — anti-join via r_id IS NULL."""
    got = q(
        engine,
        "SELECT t_left.* FROM t_left left outer join t_right "
        "on l_id = t_right.r_id WHERE r_id IS NULL ORDER BY l_text",
    )
    assert got == ["|3|le|", "|3|lf|", "|NULL|lg|", "|NULL|lh|"]


def test_join_over_freq_duplicated_rows(engine):
    """The multiset dimension of the family: a freq-2 tuple joins twice
    per match (the reference's frequency semantics flow through joins)."""
    engine.execute_statement("INSERT INTO t_left VALUES (1, 'la')")  # freq → 2
    got = q(
        engine,
        "SELECT * FROM t_left join t_right on l_id = t_right.r_id "
        "WHERE l_text = 'la' ORDER BY l_id, r_id, r_text",
    )
    assert got == [
        "|1|la|1|ra|",
        "|1|la|1|ra|",
        "|1|la|1|rb|",
        "|1|la|1|rb|",
    ]
