"""Round-17 changes: the r16 advice fixes on the SQL sketch surface
(production default width for cms_grouped, NULL-safe grouped-count join
in quantile_grouped, clause keywords excluded from alias capture) plus
the round's new operators (CMS retraction waves, wire-surface
kmv_set_ops / bm25_search — tests added alongside their code).

Cross-engine value equality stays with the DuckDB oracle gate; these
tests pin the behavioral invariants the hash can't articulate.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incresql_spark import sketch_sql

from .conftest import SF_SMALL


def test_cms_retraction_equals_batch_on_net_corpus(spark, tmp_path):
    """The reference's retractable-aggregate contract through the FLAT
    CMS maintainer: ingest three waves, retract one — the maintained
    STATE (not just the report) must be row-identical to cms_sketch
    over the net corpus, zero counters purged, and the report must
    equal the batch operator recomputed from scratch on the net
    corpus."""
    from incresql_spark.operators.pipeline import load_table
    from incresql_spark.operators.text import (
        CMS_D,
        CMS_W,
        cms_heavyhitter_report,
        cms_sketch,
        cms_tokens,
    )
    from incresql_spark.streaming.cms_incremental import IncrementalCms

    d = load_table(spark, SF_SMALL, "documents")
    cms = IncrementalCms(spark, str(tmp_path / "state"), width=CMS_W,
                         depth=CMS_D)
    for w in range(3):
        cms.add_batch(cms_tokens(d.filter(f"doc_id % 3 = {w}")))
    cms.retract_batch(cms_tokens(d.filter("doc_id % 3 = 2")))
    net = d.filter("doc_id % 3 != 2")
    want_state = {
        (r.i, r.b): r.c
        for r in cms_sketch(cms_tokens(net), CMS_W, CMS_D).collect()
    }
    got_state = {(r.i, r.b): r.c for r in cms.sketch().collect()}
    assert got_state == want_state  # purge included: no zero rows linger
    assert all(c > 0 for c in got_state.values())
    got = [tuple(r) for r in cms_heavyhitter_report(
        cms.sketch(), cms_tokens(net), CMS_W, CMS_D).collect()]
    want = [tuple(r) for r in cms_heavyhitter_report(
        cms_sketch(cms_tokens(net), CMS_W, CMS_D), cms_tokens(net),
        CMS_W, CMS_D).collect()]
    assert got == want


def test_cms_grouped_retraction_equals_batch_on_net_corpus(
    spark, tmp_path
):
    """Same contract through the GROUPED maintainer (keys=('g',)): the
    per-(g, i, b) counters after a retraction wave equal the batch
    grouped sketch of the net corpus, and the grouped report matches
    text_cms_grouped's shaping recomputed on it."""
    from incresql_spark.operators.pipeline import load_table
    from incresql_spark.operators.text import (
        CMS_D,
        CMS_W,
        cms_grouped_report,
        cms_grouped_sketch,
        cms_grouped_tokens,
    )
    from incresql_spark.streaming.cms_incremental import IncrementalCms

    d = load_table(spark, SF_SMALL, "documents")
    cms = IncrementalCms(spark, str(tmp_path / "state"), width=CMS_W,
                         depth=CMS_D, keys=("g",))
    for w in range(3):
        cms.add_batch_counters(cms_grouped_sketch(
            cms_grouped_tokens(d.filter(f"doc_id % 3 = {w}")),
            CMS_W, CMS_D,
        ))
    cms.retract_batch_counters(cms_grouped_sketch(
        cms_grouped_tokens(d.filter("doc_id % 3 = 2")), CMS_W, CMS_D,
    ))
    net = d.filter("doc_id % 3 != 2")
    want_state = {
        (r.g, r.i, r.b): r.c
        for r in cms_grouped_sketch(cms_grouped_tokens(net),
                                    CMS_W, CMS_D).collect()
    }
    got_state = {(r.g, r.i, r.b): r.c for r in cms.sketch().collect()}
    assert got_state == want_state
    got = [tuple(r) for r in cms_grouped_report(
        cms.sketch(), cms_grouped_tokens(net), CMS_W, CMS_D).collect()]
    want = [tuple(r) for r in cms_grouped_report(
        cms_grouped_sketch(cms_grouped_tokens(net), CMS_W, CMS_D),
        cms_grouped_tokens(net), CMS_W, CMS_D).collect()]
    assert got == want


def test_mv_q3_batched_refresh_equals_per_wave(spark):
    """One refresh consuming all three delta windows (two inserts + the
    retraction) must produce exactly the per-wave maintained state —
    the telescoping delta rule differentiates between seq cursors, so
    wave count is invisible to correctness (VERDICT r16 task 5)."""
    from incresql_spark.operators.pipeline import (
        mv_q3_incremental,
        mv_q3_incremental_batched,
    )

    got = [tuple(r) for r in
           mv_q3_incremental_batched(spark, SF_SMALL).collect()]
    want = [tuple(r) for r in mv_q3_incremental(spark, SF_SMALL).collect()]
    assert got == want and len(got) > 0


def test_cms_retract_everything_empties_the_state(spark, tmp_path):
    """Retracting every ingested wave drives EVERY counter to zero; the
    purge must leave an EMPTY state (AggState's convention for empty is
    read() -> None), never a zero-filled one."""
    from incresql_spark.operators.pipeline import load_table
    from incresql_spark.operators.text import CMS_D, CMS_W, cms_tokens
    from incresql_spark.streaming.cms_incremental import IncrementalCms

    d = load_table(spark, SF_SMALL, "documents").filter("doc_id < 20")
    cms = IncrementalCms(spark, str(tmp_path / "state"), width=CMS_W,
                         depth=CMS_D)
    cms.add_batch(cms_tokens(d))
    assert cms.sketch().count() > 0
    cms.retract_batch(cms_tokens(d))
    sk = cms.sketch()
    assert sk is None or sk.count() == 0


def test_kmv_set_ops_sql_matches_operator(spark):
    """kmv_set_ops(...) must reproduce op_kmv_set_ops' PRODUCTION
    columns (estimates + rse, no exact ride-alongs) byte-for-byte at
    the default k, and its plan must reuse the single name-tagged
    distinct exchange instead of rescanning the corpus per sample use."""
    from incresql_spark.operators.relational import op_kmv_set_ops

    spark.read.parquet(f"{SF_SMALL}/lineitem.parquet") \
        .createOrReplaceTempView("lineitem")
    q = sketch_sql.expand_sketch_calls(
        "SELECT * FROM kmv_set_ops('lineitem', 'l_partkey', 'l_suppkey')"
    )
    df = spark.sql(q)
    got = df.collect()
    want = op_kmv_set_ops(spark, SF_SMALL).select(
        "k", "a_est", "a_rse_ppm", "b_est", "b_rse_ppm",
        "union_est", "union_rse_ppm", "inter_est",
    ).collect()
    assert len(got) == 1
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # exchange reuse is an AQE runtime decision — read the FINAL plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert "ReusedExchange" in plan, plan[:3000]
    # the custom-k argument reaches the estimator literals
    q8 = sketch_sql.expand_sketch_calls(
        "SELECT * FROM kmv_set_ops('lineitem', 'l_partkey', "
        "'l_suppkey', 8)"
    )
    r8 = spark.sql(q8).collect()[0]
    assert r8.k == 8 and r8.a_rse_ppm == round(1_000_000 / 6 ** 0.5)


def test_bm25_search_sql_matches_operator(spark):
    """bm25_search(...) over a catalog query table must reproduce
    bm25_search_table (the production searcher) row-for-row, including
    the integer-ppb scores."""
    from incresql_spark.operators.text import (
        BM25_QUERIES,
        bm25_search_table,
    )

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    docs.createOrReplaceTempView("documents")
    workload = spark.createDataFrame(
        [(qid, t) for qid, terms in BM25_QUERIES for t in terms],
        "query_id INT, term STRING",
    )
    workload.createOrReplaceTempView("bm25_workload")
    q = sketch_sql.expand_sketch_calls(
        "SELECT * FROM bm25_search('documents', 'doc_id', 'text', "
        "'bm25_workload')"
    )
    got = [tuple(r) for r in spark.sql(q).collect()]
    want = [tuple(r) for r in bm25_search_table(docs, workload).collect()]
    assert got == want and len(got) > 0
    # exactly one explode in the matched plan (the operator's pin)
    plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
    assert plan.lower().count("explode") <= 2, plan[:3000]


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
