"""Engine golden tests — replicas of the reference's end-to-end SQL test
corpus (FIXTURES.md F1-F8; reference tests/ directory, SURVEY §5)."""

from __future__ import annotations

import pytest

from incresql_spark.engine import Engine


@pytest.fixture()
def engine(spark, tmp_path):
    return Engine(spark, str(tmp_path / "warehouse"))


def q(e: Engine, sql: str) -> list[str]:
    return e.execute_statement(sql).pipes()


# F2 — group-by fixture (tests/group/mod.rs:19-41)
def test_group_by_null_handling(engine):
    engine.execute_statement("CREATE TABLE test (c1 TEXT, c2 INT)")
    engine.execute_statement(
        "INSERT INTO test VALUES ('a',1),('a',2),('b',3),('b',NULL),('c',NULL)"
    )
    got = q(
        engine,
        "SELECT c1, count(*), count(c2), sum(c2) FROM test GROUP BY c1 ORDER BY c1",
    )
    assert got == ["|a|2|2|3|", "|b|2|1|3|", "|c|1|0|NULL|"]


def test_global_agg_zero_rows(engine):
    """tests/group/mod.rs:19-25: one row |0|NULL| on empty input."""
    engine.execute_statement("CREATE TABLE t0 (a INT)")
    got = q(engine, "SELECT count(*), sum(a) FROM t0 WHERE FALSE")
    assert got == ["|0|NULL|"]


# F3 — delete / multiset fixture (tests/delete/mod.rs:4-45)
def test_delete_and_freq_split_limit(engine):
    engine.execute_statement("CREATE TABLE t1 (a INT, b TEXT)")
    engine.execute_statement("INSERT INTO t1 VALUES (1,'abc')")
    engine.execute_statement("INSERT INTO t1 VALUES (1,'abc')")  # freq → 2
    engine.execute_statement("INSERT INTO t1 VALUES (2,'def'),(3,'ghi')")
    assert sorted(q(engine, "SELECT * FROM t1 ORDER BY a")) == [
        "|1|abc|",
        "|1|abc|",
        "|2|def|",
        "|3|ghi|",
    ]
    engine.execute_statement("DELETE FROM t1 WHERE t1.b = 'def'")
    assert sorted(q(engine, "SELECT * FROM t1")) == ["|1|abc|", "|1|abc|", "|3|ghi|"]
    # DELETE LIMIT 1 must split the freq-2 tuple, leaving ONE (1,'abc')
    engine.execute_statement("DELETE FROM t1 LIMIT 1")
    assert sorted(q(engine, "SELECT * FROM t1")) == ["|1|abc|", "|3|ghi|"]


# F1 — join fixture (tests/join/mod.rs:4-29): NULL keys never join
def test_joins_null_keys(engine):
    engine.execute_statement("CREATE TABLE t_left (l_id INT, l_text TEXT)")
    engine.execute_statement("CREATE TABLE t_right (r_id INT, r_text TEXT)")
    engine.execute_statement(
        "INSERT INTO t_left VALUES (1,'la'),(1,'lb'),(2,'lc'),(2,'ld'),"
        "(3,'le'),(3,'lf'),(NULL,'lg'),(NULL,'lh')"
    )
    engine.execute_statement(
        "INSERT INTO t_right VALUES (1,'ra'),(1,'rb'),(2,'rc'),(2,'rd'),"
        "(4,'re'),(4,'rf'),(NULL,'rg'),(NULL,'rh')"
    )
    inner = engine.execute_statement(
        "SELECT l_id, l_text, r_text FROM t_left JOIN t_right ON l_id = r_id "
        "ORDER BY l_id, l_text, r_text"
    )
    assert len(inner.rows) == 8  # 2×2 for key 1 + 2×2 for key 2; NULLs drop
    left = engine.execute_statement(
        "SELECT l_id, l_text, r_text FROM t_left LEFT JOIN t_right ON l_id = r_id "
        "ORDER BY l_text, r_text"
    )
    assert len(left.rows) == 12  # 8 matches + key-3 ×2 and NULL-keys ×2 padded
    padded = [r for r in left.rows if r[2] is None]
    assert len(padded) == 4


# F4 — casts / implicit widening (tests/casts/mod.rs:22-45)
def test_casts_widening(engine):
    engine.execute_statement("CREATE TABLE tc (i INTEGER, b BIGINT, d DECIMAL(10,2))")
    engine.execute_statement("INSERT INTO tc VALUES (1, 10, 2.50)")
    r = engine.execute_statement("SELECT i + b, i + d, b + d FROM tc")
    assert r.rows[0] == (11, pytest.approx(3.50), pytest.approx(12.50))
    r2 = engine.execute_statement('SELECT CAST("2010-10-23" AS DATE)')
    assert str(r2.rows[0][0]) == "2010-10-23"


# F5 — directory CSV source (tests/file_sources/mod.rs:4-14)
def test_directory_source(engine, tmp_path):
    csvdir = tmp_path / "csv"
    csvdir.mkdir()
    (csvdir / "simple.csv").write_text('123,abc,12.1\n"456","d,ef",13.2\n')
    r = engine.execute_statement(f'SELECT * FROM DIRECTORY "{csvdir}"')
    assert sorted(r.rows) == [
        ('["123","abc","12.1"]',),
        ('["456","d,ef","13.2"]',),
    ]
    # the TPC-H load shape: ->> field extraction + cast
    r2 = engine.execute_statement(
        f'SELECT CAST(data->>"$[0]" AS BIGINT), data->>"$[1]" FROM DIRECTORY "{csvdir}" '
        "ORDER BY 1"
    )
    assert r2.rows == [(123, "abc"), (456, "d,ef")]


# F6 — JSON quirks (tests/json/mod.rs:4-55)
def test_json_extract_quirks(engine):
    r = engine.execute_statement("""SELECT '[1,2,3,4]'->"$.1" """)
    assert r.rows[0][0] == "2"
    r = engine.execute_statement("""SELECT '[[1,2],[3,4],[5,6]]'->>"$.*.0" """)
    assert r.rows[0][0] == "[1,3,5]"
    r = engine.execute_statement("""SELECT '{"a": "txt"}'->"$.a" """)
    assert r.rows[0][0] == '"txt"'  # -> keeps quotes
    r = engine.execute_statement("""SELECT '{"a": "txt"}'->>"$.a" """)
    assert r.rows[0][0] == "txt"  # ->> unquotes
    r = engine.execute_statement("""SELECT '{"a": null}'->"$.a" """)
    assert r.rows[0][0] == "null"  # json null → text 'null'


# F7 — views fixture (tests/views/mod.rs:4-30): cross-db inlining
def test_views_cross_database(engine):
    engine.execute_statement("CREATE DATABASE other")
    engine.execute_statement("CREATE TABLE other.src (c TEXT)")
    engine.execute_statement("INSERT INTO other.src VALUES ('hello')")
    engine.execute_statement("USE other")
    engine.execute_statement("CREATE VIEW default.v AS SELECT c AS renamed FROM src")
    engine.execute_statement("USE default")
    r = engine.execute_statement("SELECT renamed FROM v")
    assert r.rows == [("hello",)]


# F8 — literals / constant folding (tests/optimize/constant_folding.rs)
def test_literal_folding(engine):
    assert q(engine, "SELECT 1 + 2 * 3 - 4") == ["|3|"]
    r = engine.execute_statement("SELECT 1.0 + 2.0 * 3.0 - 4.0")
    assert float(r.rows[0][0]) == 3.0


def test_show_and_catalog(engine):
    engine.execute_statement("CREATE TABLE t_show (a INT)")
    engine.execute_statement("CREATE VIEW v_show AS SELECT a FROM t_show")
    tables = dict(engine.execute_statement("SHOW TABLES").rows)
    assert tables["t_show"] == "table" and tables["v_show"] == "view"
    dbs = [r[0] for r in engine.execute_statement("SHOW DATABASES").rows]
    assert "default" in dbs


def test_compact_table(engine):
    engine.execute_statement("CREATE TABLE tcp (a INT)")
    for i in range(3):
        engine.execute_statement(f"INSERT INTO tcp VALUES ({i})")
    engine.execute_statement("DELETE FROM tcp WHERE a = 1")
    engine.execute_statement("COMPACT TABLE tcp")
    tbl = engine._table("default", "tcp")
    assert len(tbl._segments()) == 1
    assert sorted(q(engine, "SELECT * FROM tcp")) == ["|0|", "|2|"]


def test_insert_select(engine):
    engine.execute_statement("CREATE TABLE src2 (a INT)")
    engine.execute_statement("INSERT INTO src2 VALUES (1),(2),(3)")
    engine.execute_statement("CREATE TABLE dst2 (a INT)")
    engine.execute_statement("INSERT INTO dst2 SELECT a FROM src2 WHERE a > 1")
    assert sorted(q(engine, "SELECT * FROM dst2")) == ["|2|", "|3|"]


def test_statement_clears_job_group(spark, tmp_path):
    """execute_statement with a session_id must clear the thread-local job
    group when it returns (engine.py finally) — a stale group would let a
    late KILL cancel whatever this thread runs next."""
    from incresql_spark.engine import Engine

    e = Engine(spark, str(tmp_path / "wh_grp"))
    e.execute_statement("SELECT 1 + 1", session_id=99)
    sc = spark.sparkContext
    assert sc.getLocalProperty("spark.jobGroup.id") is None
    assert sc.getLocalProperty("spark.job.interruptOnCancel") is None
    # a KILL for that session after completion cancels nothing; the next
    # statement under the same session still runs
    e.execute_statement("KILL 99")
    r = e.execute_statement("SELECT sum(id) AS s FROM range(1000)", session_id=99)
    assert r.rows == [(499500,)]
    assert sc.getLocalProperty("spark.jobGroup.id") is None


# Round-14 (VERDICT r13 task 6): embedded collect fence
def test_embedded_collect_fence(engine, spark):
    """The embedded (non-streamed) path collects under a LIMIT fence:
    results past incresql.embedded.maxCollectRows raise
    EmbeddedResultTooLarge instead of materializing on the driver;
    stream=True and cap=0 both bypass; default cap leaves goldens
    untouched."""
    from incresql_spark.engine import (
        EMBEDDED_MAX_COLLECT_CONF,
        EmbeddedResultTooLarge,
    )

    engine.execute_statement("CREATE TABLE fence_t (a INT)")
    engine.execute_statement(
        "INSERT INTO fence_t VALUES " + ",".join(f"({i})" for i in range(10))
    )
    spark.conf.set(EMBEDDED_MAX_COLLECT_CONF, "5")
    try:
        with pytest.raises(EmbeddedResultTooLarge):
            engine.execute_statement("SELECT * FROM fence_t")
        # streaming is the documented escape hatch — O(partition) driver
        res = engine.execute_statement("SELECT * FROM fence_t", stream=True)
        assert sorted(v for (v,) in res.iter_rows()) == list(range(10))
        # 0 disables the fence for consumers that want full materialization
        spark.conf.set(EMBEDDED_MAX_COLLECT_CONF, "0")
        res = engine.execute_statement("SELECT * FROM fence_t")
        assert sorted(v for (v,) in res.rows) == list(range(10))
        # results at or under the cap are unaffected
        spark.conf.set(EMBEDDED_MAX_COLLECT_CONF, "10")
        res = engine.execute_statement("SELECT * FROM fence_t ORDER BY a")
        assert [v for (v,) in res.rows] == list(range(10))
    finally:
        spark.conf.unset(EMBEDDED_MAX_COLLECT_CONF)
