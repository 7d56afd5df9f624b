"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incresql_spark import tpch
from incresql_spark.operators import dedup, multimodal, relational, similarity, text
from incresql_spark.streaming import sessionize

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    return tpch.q1(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    out.update(tpch.QUERIES)
    out.update(relational.QUERIES)
    out.update(text.QUERIES)
    out.update(dedup.QUERIES)
    out.update(similarity.QUERIES)
    out.update(multimodal.QUERIES)
    out.update(sessionize.QUERIES)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    out.update(tpch.ORACLE)
    out.update(relational.ORACLE)
    out.update(text.ORACLE)
    out.update(dedup.ORACLE)
    out.update(similarity.ORACLE)
    out.update(multimodal.ORACLE)
    out.update(sessionize.ORACLE)
    return out
