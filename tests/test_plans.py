"""Scale-engineering utilities: salted joins, bucketing, function registry,
and plan-shape assertions (the 100 TB design checks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from incresql_spark.catalog import load_table
from incresql_spark.plans import layout, skew

from .conftest import SF_SMALL


def test_salted_join_matches_plain_join(spark):
    """Salting must not change results (inner + left outer)."""
    orders = load_table(spark, SF_SMALL, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    customer = load_table(spark, SF_SMALL, "customer").select("c_custkey", "c_name")
    big = orders.withColumnRenamed("o_custkey", "c_custkey")

    plain = big.join(customer, "c_custkey").groupBy().agg(
        F.count(F.lit(1)), F.sum("o_totalprice")
    ).collect()[0]
    salted = skew.salted_join(big, customer, "c_custkey", salts=8).groupBy().agg(
        F.count(F.lit(1)), F.sum("o_totalprice")
    ).collect()[0]
    assert tuple(plain) == tuple(salted)

    plain_lo = big.join(customer, "c_custkey", "left").count()
    salted_lo = skew.salted_join(big, customer, "c_custkey", salts=8, how="left").count()
    assert plain_lo == salted_lo


def test_top_key_share(spark):
    e = load_table(spark, SF_SMALL, "events")
    share = skew.top_key_share(e, "event_type", sample_fraction=1.0)
    assert 0.15 < share < 0.35  # 5 roughly-uniform event types


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key must join without a shuffle."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, SF_SMALL, "orders")
        lineitem = load_table(spark, SF_SMALL, "lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        layout.write_bucketed(
            orders, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo")
        )
        layout.write_bucketed(
            lineitem, "b_lineitem", "l_orderkey", 8, path=str(tmp_path / "bl")
        )
        joined = spark.table("b_lineitem").join(
            spark.table("b_orders"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan[:800]
        assert joined.count() == lineitem.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_partition_sizing():
    assert layout.partitions_for_bytes(1) == 1
    assert layout.partitions_for_bytes(128 * 1024 * 1024) == 1
    assert layout.partitions_for_bytes(100 * 1024**3) == 800


def test_function_registry(spark):
    from incresql_spark.functions.registry import register_all

    names = register_all(spark)
    assert "json_unquote" in names
    got = spark.sql(
        """SELECT json_unquote('"abc"') AS a, json_unquote('null') AS b,
                  json_extract('{"k": "v"}', '$.k') AS c,
                  incre_to_decimal('3.5') AS d, incre_to_date('2020-05-06') AS e"""
    ).collect()[0]
    assert got.a == "abc" and got.b == "null" and got.c == '"v"'
    assert float(got.d) == 3.5 and str(got.e) == "2020-05-06"


def test_registry_functions_inline(spark):
    """SQL UDFs must inline (no BatchEvalPython / UDF nodes in the plan)."""
    from incresql_spark.functions.registry import register_all

    register_all(spark)
    plan = (
        spark.sql("SELECT json_unquote(props) FROM parquet.`"
                  + SF_SMALL + "/events.parquet`")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan and "PythonUDF" not in plan


def test_asof_join_single_shuffle(spark):
    """As-of join must be one window scan: exactly one shuffle (on user_id),
    no join node at all."""
    from incresql_spark.operators.relational import op_asof_join

    from .conftest import SF_SMALL

    plan = op_asof_join(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # union + window, never a join
    assert plan.count("Exchange hashpartitioning") == 1


def test_range_join_is_equi_join(spark):
    """Bucketed range join must plan as a hash/sort-merge equi join —
    never BroadcastNestedLoop/cartesian."""
    from incresql_spark.operators.relational import op_range_join

    from .conftest import SF_SMALL

    plan = op_range_join(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_pii_scrub_no_shuffle_before_sort(spark):
    """PII scrubbing is a narrow map; the only exchange is the output sort."""
    from incresql_spark.operators.text import text_pii_scrub

    from .conftest import SF_SMALL

    plan = text_pii_scrub(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
