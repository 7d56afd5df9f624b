"""Relational operator inventory vs the DuckDB oracle at sf0.001."""

from __future__ import annotations

import pytest

from incresql_spark.operators import relational

from .conftest import SF_SMALL
from .oracle import assert_matches_oracle


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_relational_matches_oracle(spark, duck, name):
    assert_matches_oracle(
        spark, duck, relational.QUERIES[name], relational.ORACLE[name], SF_SMALL
    )


def test_semi_join_plan_has_no_payload_shuffle(spark):
    """left_semi should not carry order payload columns through the join."""
    plan = (
        relational.op_semi_anti_join(spark, SF_SMALL)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan and "LeftAnti" in plan
