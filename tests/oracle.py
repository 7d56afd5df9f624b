"""Shared pytest helper: compare a Spark query against DuckDB oracle SQL the
same way the driver's correctness gate does (row count + column names +
order-insensitive value hash)."""

from __future__ import annotations

import datetime
import math

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

_registered: set[tuple[int, str]] = set()


def register_views(duck, sf_dir: str) -> None:
    key = (id(duck), sf_dir)
    if key in _registered:
        return
    for t in TABLES:
        duck.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    _registered.add(key)


def norm_cell(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm_cell(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def normalize(cols, rows) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)


def assert_matches_oracle(spark, duck, query_fn, sql: str, sf_dir: str) -> None:
    register_views(duck, sf_dir)
    sdf = query_fn(spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(sql)
    orows = [tuple(r) for r in rel.fetchall()]
    assert sorted(sdf.columns) == sorted(rel.columns), (sdf.columns, rel.columns)
    a, b = normalize(sdf.columns, srows), normalize(rel.columns, orows)
    assert len(a) == len(b), f"row count {len(a)} != {len(b)}"
    for i, (x, y) in enumerate(zip(a, b)):
        assert x == y, f"row {i}:\n  spark: {x}\n  duck : {y}"
