"""Round-17 changes: the r16 advice fixes on the SQL sketch surface
(production default width for cms_grouped, NULL-safe grouped-count join
in quantile_grouped, clause keywords excluded from alias capture) plus
the round's new operators (CMS retraction waves, wire-surface
kmv_set_ops / bm25_search — tests added alongside their code).

Cross-engine value equality stays with the DuckDB oracle gate; these
tests pin the behavioral invariants the hash can't articulate.
"""

from __future__ import annotations

from incresql_spark import sketch_sql

from .conftest import SF_SMALL


def test_quantile_grouped_sql_keeps_null_groups(spark):
    """r16 advice #2: the SQL expansion's grouped-count join is
    NULL-safe, so a NULL group reports its quantiles exactly like the
    DataFrame operator's PARTITION BY / groupBy path does."""
    spark.sql(
        "SELECT * FROM VALUES "
        "(NULL, 10, 1), (NULL, 20, 2), (NULL, 30, 3), "
        "('a', 1, 4), ('a', 2, 5), ('a', 3, 6) AS t(g, v, k)"
    ).createOrReplaceTempView("qg_nulls")
    q = sketch_sql.expand_sketch_calls(
        "SELECT * FROM quantile_grouped('qg_nulls', 'g', 'v', 'k')"
    )
    rows = spark.sql(q).collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r)
    assert set(by_g) == {None, "a"}, by_g
    # the NULL group is a real group: full quantile fan-out, correct n
    assert len(by_g[None]) == len(by_g["a"])
    assert all(r.n == 3 and r.sample_n == 3 for r in by_g[None])
    assert {r.est_value for r in by_g[None]} <= {10, 20, 30}


def test_sketch_alias_capture_skips_clause_keywords(spark):
    """r16 advice #3: keywords that can legally follow a FROM item
    (OFFSET / LATERAL / TABLESAMPLE / SORT / DISTRIBUTE / CLUSTER /
    PIVOT / UNPIVOT / VALUES) must not be swallowed as the derived
    table's alias — the generated alias is attached and the keyword
    stays a keyword."""
    spark.read.parquet(f"{SF_SMALL}/orders.parquet") \
        .createOrReplaceTempView("orders")
    q = sketch_sql.expand_sketch_calls(
        "SELECT name, estimate FROM hll_distinct('orders', 'o_custkey') "
        "LIMIT 5 OFFSET 0"
    )
    # OFFSET survived as a keyword, and the expansion carries its own
    # generated alias (not "OFFSET")
    assert "OFFSET 0" in q and ") hll_distinct_t1" in q
    assert spark.sql(q).count() == 1
    q2 = sketch_sql.expand_sketch_calls(
        "SELECT * FROM quantile_sketch('orders', 'o_totalprice', "
        "'o_orderkey') SORT BY q_pct"
    )
    assert ") quantile_sketch_t1" in q2 and "SORT BY q_pct" in q2
    assert spark.sql(q2).count() == 5
    # a real alias still wins over the generated one
    q3 = sketch_sql.expand_sketch_calls(
        "SELECT zz.name FROM hll_distinct('orders', 'o_custkey') zz"
    )
    assert ") zz" in q3 and "hll_distinct_t" not in q3
    assert spark.sql(q3).count() == 1
