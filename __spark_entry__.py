"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check at sf0.001.
``queries()`` — one entry per implemented operator from SURVEY.md §2.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query key.

Registration order matters: the driver's correctness gate records the FIRST
50 entries of ``queries()``.  The first 50 here are the substantive
operators — TPC-H (22), the custom relational operators (as-of join, range
join, funnel, window functions), the full dedup / similarity / multimodal
suite (including the round-4 additions: passage dedup, kNN graph, audio
chunking, image perceptual-hash dedup), sessionization, the composed
end-to-end curation dataflow (pipeline_curate), the round-6 incremental
aggregate-over-join MV driven end-to-end (mv_q3_incremental), and the head
of the text suite.  The tail of the text suite and the "free in Spark"
relational demos (op_distinct, op_rollup, op_pivot, ...) fall past the cap;
everything there is equally oracle-checked locally via
``tools/check_oracle.py`` and pytest
(95 queries total, all locally value-hash-matched; oracle output types are
additionally linted against a BIGINT-only integer allowlist — see
``tools/check_oracle.py --lint`` — after uncast DuckDB HUGEINT window sums
caused driver-only hash mismatches in rounds 2-4).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from incresql_spark import tpch
from incresql_spark.operators import (
    dedup,
    multimodal,
    pipeline,
    relational,
    similarity,
    text,
)
from incresql_spark.streaming import sessionize

SF0001 = "/root/testdata/sf0.001"

# Substantive relational operators that must sit inside the driver gate;
# everything else in relational.QUERIES is a demo of a built-in Spark op.
_RELATIONAL_CORE = (
    "op_asof_join",
    "op_range_join",
    "op_funnel",
    "op_window_functions",
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1) on /root/testdata/sf0.001."""
    return tpch.q1(spark, SF0001)


# Demoted below the gate cap: demos whose mechanism is already
# gate-covered by a richer sibling (sim_kmeans runs the label-centroid
# aggregation twice per iteration; dedup_url is dedup_exact's
# normalize+groupBy shape on a different key; mm_resize is mm_features'
# Arrow mapInPandas plumbing on different parameters — demoted in round 6
# to make room for mv_q3_incremental while keeping text_stats gated).
_GATE_DEMOTED = ("sim_label_centroids", "dedup_url", "mm_resize")


def _ordered(registries: list[dict]) -> dict:
    out: dict = {}
    # Gate-priority block: TPC-H, core relational ops, then the full
    # LLM-pipeline suite (dedup, similarity, multimodal, sessionize,
    # composed pipelines, head of text).
    (tpch_reg, rel_reg, text_reg, dedup_reg, sim_reg, mm_reg, sess_reg,
     pipe_reg) = registries
    out.update(tpch_reg)
    for k in _RELATIONAL_CORE:
        if k in rel_reg:
            out[k] = rel_reg[k]
    for reg in (dedup_reg, sim_reg, mm_reg, sess_reg, pipe_reg, text_reg):
        out.update({k: v for k, v in reg.items() if k not in _GATE_DEMOTED})
    # Tail block: built-in-operator demos and demoted entries (driver-gate
    # overflow is OK here; everything is still locally oracle-checked).
    for reg in (dedup_reg, sim_reg, mm_reg, rel_reg):
        for k, v in reg.items():
            if k not in out:
                out[k] = v
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(
        [
            tpch.QUERIES,
            relational.QUERIES,
            text.QUERIES,
            dedup.QUERIES,
            similarity.QUERIES,
            multimodal.QUERIES,
            sessionize.QUERIES,
            pipeline.QUERIES,
        ]
    )


def oracle_sql() -> dict[str, str]:
    return _ordered(
        [
            tpch.ORACLE,
            relational.ORACLE,
            text.ORACLE,
            dedup.ORACLE,
            similarity.ORACLE,
            multimodal.ORACLE,
            sessionize.ORACLE,
            pipeline.ORACLE,
        ]
    )
