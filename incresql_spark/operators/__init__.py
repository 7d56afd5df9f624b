"""Operator modules: relational inventory (SURVEY §2), training-data-pipeline
operators (dedup / similarity / text / multimodal), each exposing ``QUERIES``
(name → callable(spark, sf_dir) → DataFrame) and ``ORACLE`` (name → DuckDB
SQL) dicts that ``__spark_entry__`` aggregates."""

from __future__ import annotations


def bench_queries():
    """Headline pipeline-operator queries included in bench.py."""
    from . import dedup, pipeline, relational, similarity, text

    out = {}
    for mod in (dedup, pipeline, relational, similarity, text):
        out.update(getattr(mod, "BENCH_QUERIES", {}))
    return out
