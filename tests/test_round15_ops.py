"""Round-15 operators: the grouped HLL sketch (op_hll_grouped), the
table-driven BM25 gate query (text_bm25_table), and the estimator-family
error-bound columns (rse_ppm).

Cross-engine value equality is covered by the DuckDB oracle gate
(tools/check_oracle.py); these tests pin the invariants the hash can't
articulate: the grouped production plan really avoids per-group
count(DISTINCT), both HLL regimes really are live per group, the
error-bound columns really track the estimator regime, and the gate BM25
query really runs the table-driven path.
"""

from __future__ import annotations

from incresql_spark.operators.relational import (
    HLL_GROUP_P,
    op_hll_grouped,
    op_kmv_set_ops,
)
from incresql_spark.operators.text import (
    TEXT_BM25_TABLE_SQL,
    text_bm25_table,
)

from .conftest import SF_SMALL

SF_001 = "/root/testdata/sf0.01"


def test_hll_grouped_production_plan_is_bounded(spark):
    """verify=False (the production path) must contain no distinct
    aggregate anywhere — the exact per-group count(DISTINCT) is the
    full-key-per-group shuffle the operator exists to avoid — and its
    register aggregate must have a map-side partial max, which is what
    bounds any task's forwarding at |groups| x |columns| x m rows."""
    plan = (
        op_hll_grouped(spark, SF_SMALL, verify=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "distinct" not in plan.lower(), plan
    assert "partial_max" in plan, plan
    assert plan.count("FileScan parquet") == 1, plan


def test_hll_grouped_both_regimes_live_per_group(spark):
    """The p=8 geometry puts o_custkey (~1.3k distinct per priority) in
    the raw harmonic branch and o_orderstatus (3 distinct) in the
    linear-counting branch at sf0.01 — every group emits one row of
    each, with the estimate inside 4 sigma of exact."""
    rows = op_hll_grouped(spark, SF_001).collect()
    m = 1 << HLL_GROUP_P
    groups = {r.g for r in rows}
    assert len(rows) == 2 * len(groups)
    rse = 1.04 / (m ** 0.5)
    for r in rows:
        assert r.m == m
        assert r.rse_ppm == round(rse * 1_000_000)
        if r.name == "o_orderstatus":
            assert r.used_lc and r.exact_count == 3
            # LC = m*ln(m/V): within ~1% this far below m
            assert abs(r.estimate - 3.0) < 0.05
        else:
            assert not r.used_lc and r.exact_count > 2.5 * m
        err = abs(r.estimate - r.exact_count) / max(1, r.exact_count)
        assert err <= 4 * rse, (r.g, r.name, err)


def test_kmv_rse_tracks_the_estimator_regime(spark):
    """rse_ppm is 0 exactly when the sample IS the distinct set (ns < k:
    the estimate equals the exact count), and the 1/sqrt(k-2) literal
    otherwise.  At sf0.001 l_suppkey rides the exact branch and
    l_partkey the estimator branch, so both cases are pinned."""
    r = op_kmv_set_ops(spark, SF_SMALL).collect()[0]
    ppm = round(1_000_000 / (r.k - 2) ** 0.5)
    for est, exact, rse in (
        (r.a_est, r.a_exact, r.a_rse_ppm),
        (r.b_est, r.b_exact, r.b_rse_ppm),
        (r.union_est, r.union_exact, r.union_rse_ppm),
    ):
        if rse == 0:
            assert est == float(exact) and exact < r.k
        else:
            assert rse == ppm and exact >= r.k
    assert {r.a_rse_ppm, r.b_rse_ppm} == {0, ppm}


def test_bm25_table_gate_query_runs_the_table_driven_path(spark, duck):
    """text_bm25_table must oracle-match AND actually exercise the
    production searcher: integer-ppb scores (the literal operator emits
    DOUBLE), a broadcast of the workload frame, and exactly one explode
    (the corpus never shuffles on raw tokens)."""
    from .oracle import assert_matches_oracle

    assert_matches_oracle(
        spark, duck, text_bm25_table, TEXT_BM25_TABLE_SQL, SF_SMALL
    )
    df = text_bm25_table(spark, SF_SMALL)
    assert "score_ppb" in df.columns
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate explode") == 1, plan
    assert "WindowGroupLimit" in plan, plan


def test_sketch_sql_surface_is_bit_equal_to_the_operator(spark):
    """The SQL table function (sketch_sql.py, the wire surface) must
    produce byte-identical rows to op_hll_distinct's production path at
    the same geometry — the fragments are shared, so any divergence
    means the expansion mangled them.  Also pins that the expansion is a
    no-op without a sketch call and rejects non-identifier arguments."""
    import pytest as _pytest

    from incresql_spark import sketch_sql
    from incresql_spark.operators.relational import (
        HLL_COLUMNS,
        op_hll_distinct,
    )

    for t in ("lineitem",):
        spark.read.parquet(f"{SF_SMALL}/{t}.parquet") \
            .createOrReplaceTempView(t)
    cols = ", ".join(f"'{c}'" for c in HLL_COLUMNS)
    expanded = sketch_sql.expand_sketch_calls(
        f"SELECT * FROM hll_distinct('lineitem', {cols}) ORDER BY name"
    )
    got = [tuple(r) for r in spark.sql(expanded).collect()]
    want = [
        tuple(r)
        for r in op_hll_distinct(spark, SF_SMALL, verify=False).collect()
    ]
    assert got == want
    plain = "SELECT 1 AS x"
    assert sketch_sql.expand_sketch_calls(plain) is plain
    with _pytest.raises(ValueError, match="identifier"):
        sketch_sql.expand_sketch_calls(
            "SELECT * FROM hll_distinct('lineitem; DROP', 'x')"
        )


def test_hll_grouped_incremental_equals_batch_and_replay_is_noop(
    spark, tmp_path
):
    """Three waves through the grouped IncrementalHll == the batch
    grouped sketch over the union (register max-merge is exact per
    (g, name) key); the state never exceeds |groups| x |columns| x m
    rows; and REPLAYING a wave changes nothing (max is idempotent)."""
    from incresql_spark.operators.relational import (
        HLL_GROUP_COLUMNS,
        HLL_GROUP_P,
        hll_exact,
        hll_grouped_values,
        load_table,
    )
    from incresql_spark.streaming.hll_incremental import IncrementalHll

    o = load_table(spark, SF_SMALL, "orders")
    hll = IncrementalHll(spark, str(tmp_path / "state"),
                         keys=("g", "name"), p=HLL_GROUP_P)
    for w in range(3):
        hll.add_batch_values(
            hll_grouped_values(o.filter(f"o_orderkey % 3 = {w}"))
        )
    exact = hll_exact(hll_grouped_values(o), ("g", "name"))
    got = hll.estimate(exact).collect()
    want = op_hll_grouped(spark, SF_SMALL).collect()
    assert got == want
    n_groups = o.select("o_orderpriority").distinct().count()
    assert hll.registers().count() <= (
        n_groups * len(HLL_GROUP_COLUMNS) * (1 << HLL_GROUP_P)
    )
    # replay wave 1: max-merge is idempotent, so nothing may change
    hll.add_batch_values(
        hll_grouped_values(o.filter("o_orderkey % 3 = 1"))
    )
    assert hll.estimate(exact).collect() == want


def test_cms_grouped_plan_and_invariants(spark):
    """Grouped CMS: candidate selection must go through WindowGroupLimit
    (bounded per-partition forwarding, the op_quantile_grouped shape),
    every group emits exactly CMS_GROUP_TOP rows, and CMS never
    underestimates (cms_est >= exact_cnt)."""
    from incresql_spark.operators.text import CMS_GROUP_TOP, text_cms_grouped

    df = text_cms_grouped(spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan, plan
    rows = df.collect()
    by_g = {}
    for r in rows:
        by_g.setdefault(r.g, []).append(r)
        assert r.cms_est >= r.exact_cnt, (r.g, r.tok)
        assert r.overestimate == r.cms_est - r.exact_cnt
    assert all(len(v) == CMS_GROUP_TOP for v in by_g.values()), {
        g: len(v) for g, v in by_g.items()
    }


def test_quantile_grouped_incremental_equals_batch_and_replay_is_noop(
    spark, tmp_path
):
    """Three waves through IncrementalQuantileGrouped == the batch
    grouped sketch over the union (per-group min-k-merge is exact); the
    state never exceeds k rows per group; and REPLAYING a wave changes
    nothing (min-k is idempotent)."""
    from incresql_spark.operators.relational import (
        QSK_GROUP_K,
        load_table,
        op_quantile_grouped,
        quantile_grouped_base,
    )
    from incresql_spark.streaming.quantile_incremental import (
        IncrementalQuantileGrouped,
    )

    o = load_table(spark, SF_SMALL, "orders")
    q = IncrementalQuantileGrouped(spark, str(tmp_path / "state"))
    for w in range(3):
        q.add_batch(quantile_grouped_base(o.filter(f"o_orderkey % 3 = {w}")))
    base = quantile_grouped_base(o)
    got = q.estimate(base).collect()
    want = op_quantile_grouped(spark, SF_SMALL).collect()
    assert got == want
    per_group = q.sample().groupBy("g").count().collect()
    assert all(r["count"] <= QSK_GROUP_K for r in per_group)
    q.add_batch(quantile_grouped_base(o.filter("o_orderkey % 3 = 1")))
    assert q.estimate(base).collect() == want


def test_sketch_sql_quantile_and_cms_expansions_run(spark):
    """quantile_sketch(...) and cms_topk(...) expansions execute and
    honor their semantic invariants (estimates at exact nearest-rank
    values when n <= k; CMS never underestimates at the collision-stress
    gate geometry)."""
    from incresql_spark import sketch_sql

    for t in ("lineitem", "documents"):
        spark.read.parquet(f"{SF_SMALL}/{t}.parquet") \
            .createOrReplaceTempView(t)
    q = sketch_sql.expand_sketch_calls(
        "SELECT * FROM quantile_sketch('lineitem', 'l_extendedprice', "
        "'l_orderkey') ORDER BY q_pct"
    )
    rows = spark.sql(q).collect()
    assert [r.q_pct for r in rows] == [1, 25, 50, 75, 99]
    assert all(r.sample_n == 1024 for r in rows)
    c = sketch_sql.expand_sketch_calls(
        "SELECT * FROM cms_topk('documents', 'text', 16, 4)"
    )
    crows = spark.sql(c).collect()
    assert len(crows) > 0
    assert all(r.cms_est >= r.exact_cnt for r in crows)


def test_bloom_contamination_no_false_negatives_and_bounded_bits(spark):
    """The Bloom screen may only OVERcount: every doc dedup_contamination
    reports must appear with n_exact_hits equal to its exact overlap and
    n_bloom_hits >= n_exact_hits (no false negatives — the Bloom
    guarantee); false positives are non-negative by construction.  The
    broadcast bit set stays bounded by min(k x |shingles|, m)."""
    from incresql_spark.operators.dedup import (
        BLOOM_M,
        dedup_contamination,
        dedup_contamination_bloom,
    )

    bloom = {r.train_doc_id: r
             for r in dedup_contamination_bloom(spark, SF_SMALL).collect()}
    exact = {r.train_doc_id: r.n_common_shingles
             for r in dedup_contamination(spark, SF_SMALL).collect()}
    for doc, n in exact.items():
        assert doc in bloom, f"false negative: doc {doc}"
        assert bloom[doc].n_exact_hits == n
    for r in bloom.values():
        assert r.n_bloom_hits >= r.n_exact_hits
        assert r.n_false_positives == r.n_bloom_hits - r.n_exact_hits >= 0
    # the broadcast state is a bit-index frame bounded by m
    assert len(bloom) < BLOOM_M


def test_sketch_sql_grouped_surface_is_bit_equal_to_the_operator(spark):
    """hll_grouped('orders', 'o_orderpriority', ...) must reproduce
    op_hll_grouped's production rows byte-for-byte at the same
    geometry."""
    from incresql_spark import sketch_sql
    from incresql_spark.operators.relational import (
        HLL_GROUP_COLUMNS,
        op_hll_grouped,
    )

    spark.read.parquet(f"{SF_SMALL}/orders.parquet") \
        .createOrReplaceTempView("orders")
    cols = ", ".join(f"'{c}'" for c in HLL_GROUP_COLUMNS)
    q = sketch_sql.expand_sketch_calls(
        "SELECT * FROM hll_grouped('orders', 'o_orderpriority', "
        f"{cols}) ORDER BY g, name"
    )
    got = [tuple(r) for r in spark.sql(q).collect()]
    want = [
        tuple(r)
        for r in op_hll_grouped(spark, SF_SMALL, verify=False).collect()
    ]
    assert got == want
