"""TPC-H Q1/Q3/Q5/Q6/Q10 vs the DuckDB oracle at sf0.001 (fast) —
mirrors the driver's t2 gate (row count + columns + order-insensitive values).
"""

from __future__ import annotations

import pytest

from incresql_spark import tpch

from .conftest import SF_SMALL
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(tpch.QUERIES))
def test_tpch_matches_oracle(spark, duck, name):
    assert_matches_oracle(spark, duck, tpch.QUERIES[name], tpch.ORACLE[name], SF_SMALL)


def test_q1_plan_pushes_down(spark):
    """The scan must prune columns and push the shipdate filter."""
    plan = tpch.q1(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan or "Scan parquet" in plan


def test_q3_broadcasts_dimensions(spark):
    """customer (small side) should broadcast, not shuffle."""
    plan = tpch.q3(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q4_plans_semi_join(spark):
    """EXISTS must become a (left-)semi join — lineitem is probed, never
    widened into the output."""
    plan = tpch.q4(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in plan or "Semi" in plan


def test_q14_broadcasts_part(spark):
    plan = tpch.q14(spark, SF_SMALL)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
