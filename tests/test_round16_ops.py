"""Round-16 operators: the OR-merge IncrementalBloom maintainer (the
last cell of the sketch-maintainer matrix), the production Bloom screen
bench row, the CMS error-bound columns, and the completed SQL sketch
surface (cms_grouped / quantile_grouped / bloom_screen table functions,
literal-masked expansion, per-substitution aliases, single-scan quantile
expansion, EXPLAIN composition over the wire).

Cross-engine value equality is covered by the DuckDB oracle gate
(tools/check_oracle.py); these tests pin the invariants the hash can't
articulate: the maintainer's merge really is exact AND idempotent, the
production screen really is the gate shape minus the exact ride-along,
the expansions really are byte-equal to their operators, and the
quantile expansion really stopped rescanning the table for its sample.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from incresql_spark import sketch_sql
from incresql_spark.operators.dedup import (
    BLOOM_M,
    EVAL_SET_MAX_DOC,
    _doc_shingles,
    dedup_contamination_bloom,
    dedup_contamination_bloom_only,
)

from .conftest import SF_SMALL


def test_incremental_bloom_equals_batch_and_replay_is_noop(spark, tmp_path):
    """Three eval waves through IncrementalBloom == the batch screen
    over the full eval set (bit-set OR-merge is exact per idx); the
    state never exceeds m rows; and REPLAYING a wave changes nothing
    (OR is idempotent)."""
    from incresql_spark.streaming.bloom_incremental import IncrementalBloom

    ev_docs = _doc_shingles(spark, SF_SMALL).filter(
        F.col("doc_id") < EVAL_SET_MAX_DOC
    )
    bloom = IncrementalBloom(spark, str(tmp_path / "state"))
    for w in range(3):
        bloom.add_eval_batch(
            ev_docs.filter(f"doc_id % 3 = {w}")
            .select(F.explode("shingles").alias("shingle"))
        )
    got = dedup_contamination_bloom(
        spark, SF_SMALL, verify=True, bits=bloom.bits()
    ).collect()
    want = dedup_contamination_bloom(spark, SF_SMALL).collect()
    assert got == want
    assert bloom.bits().count() <= BLOOM_M
    # replay wave 1: OR-merge is idempotent, so nothing may change
    bloom.add_eval_batch(
        ev_docs.filter("doc_id % 3 = 1")
        .select(F.explode("shingles").alias("shingle"))
    )
    got2 = dedup_contamination_bloom(
        spark, SF_SMALL, verify=True, bits=bloom.bits()
    ).collect()
    assert got2 == want


def test_incremental_bloom_screen_is_production_shape(spark, tmp_path):
    """IncrementalBloom.screen() over the training frame equals the
    production operator (dedup_contamination_bloom_only) — the
    maintained bits drive the exact same bloom_screen code path."""
    from incresql_spark.streaming.bloom_incremental import IncrementalBloom

    docsh = _doc_shingles(spark, SF_SMALL)
    bloom = IncrementalBloom(spark, str(tmp_path / "state"))
    bloom.add_eval_batch(
        docsh.filter(F.col("doc_id") < EVAL_SET_MAX_DOC)
        .select(F.explode("shingles").alias("shingle"))
    )
    tr = docsh.filter(F.col("doc_id") >= EVAL_SET_MAX_DOC).select(
        F.col("doc_id").alias("train_doc_id"),
        F.explode("shingles").alias("shingle"),
    )
    got = bloom.screen(tr).orderBy("train_doc_id").collect()
    want = dedup_contamination_bloom_only(spark, SF_SMALL).collect()
    assert got == want


def test_bloom_production_row_matches_gate_shape(spark):
    """The production bench row (verify=False) must be exactly the gate
    shape's (train_doc_id, n_bloom_hits) projection — same docs, same
    counts, no exact ride-along columns — and the bloom >= exact
    invariant holds on the gate shape it was cut from."""
    prod = {r.train_doc_id: r.n_bloom_hits
            for r in dedup_contamination_bloom_only(spark, SF_SMALL)
            .collect()}
    gate = dedup_contamination_bloom(spark, SF_SMALL).collect()
    assert prod == {r.train_doc_id: r.n_bloom_hits for r in gate}
    assert all(r.n_bloom_hits >= r.n_exact_hits for r in gate)
    cols = dedup_contamination_bloom_only(spark, SF_SMALL).columns
    assert cols == ["train_doc_id", "n_bloom_hits"]


def test_cms_error_bound_columns(spark):
    """Every CMS row carries the textbook guarantee as integer literals:
    eps_ppm = round(e/w * 1e6), delta_ppb = round(e^-d * 1e9) — the
    gate geometry (w=16) and the production geometry (w=2^20) must
    disagree accordingly (self-describing estimator surface)."""
    from incresql_spark.operators.text import (
        CMS_D,
        CMS_PROD_W,
        CMS_W,
        cms_bounds,
        text_cms_grouped,
        text_cms_heavyhitters,
        text_cms_sketch_only,
    )

    eps_gate, delta_gate = cms_bounds(CMS_W, CMS_D)
    eps_prod, delta_prod = cms_bounds(CMS_PROD_W, CMS_D)
    assert eps_gate > eps_prod and delta_gate == delta_prod
    flat = text_cms_heavyhitters(spark, SF_SMALL).collect()
    assert all(r.eps_ppm == eps_gate and r.delta_ppb == delta_gate
               for r in flat)
    grouped = text_cms_grouped(spark, SF_SMALL).collect()
    assert all(r.eps_ppm == eps_gate and r.delta_ppb == delta_gate
               for r in grouped)
    prod = text_cms_sketch_only(spark, SF_SMALL).collect()
    assert all(r.eps_ppm == eps_prod and r.delta_ppb == delta_prod
               for r in prod)


def test_cms_grouped_incremental_equals_batch_and_state_bounded(
    spark, tmp_path
):
    """Three waves through IncrementalCms(keys=("g",)) == the batch
    grouped sketch over the union (per-(g, i, b) counter sum-merge is
    exact over disjoint deltas); the state never exceeds
    |groups| x d x w counter rows."""
    from incresql_spark.operators.text import (
        CMS_D,
        CMS_W,
        cms_grouped_report,
        cms_grouped_sketch,
        cms_grouped_tokens,
        text_cms_grouped,
    )
    from incresql_spark.streaming.cms_incremental import IncrementalCms

    docs = spark.read.parquet(f"{SF_SMALL}/documents.parquet")
    cms = IncrementalCms(spark, str(tmp_path / "state"), width=CMS_W,
                         depth=CMS_D, keys=("g",))
    for w in range(3):
        cms.add_batch_counters(cms_grouped_sketch(
            cms_grouped_tokens(docs.filter(f"doc_id % 3 = {w}")),
            CMS_W, CMS_D,
        ))
    got = cms_grouped_report(cms.sketch(), cms_grouped_tokens(docs),
                             CMS_W, CMS_D).collect()
    want = text_cms_grouped(spark, SF_SMALL).collect()
    assert got == want
    n_groups = docs.select("lang").distinct().count()
    assert cms.sketch().count() <= n_groups * CMS_D * CMS_W


def test_sketch_sql_masked_literals_and_aliases(spark):
    """A sketch-call-shaped fragment inside a STRING LITERAL passes
    through untouched (expansion runs on literal-masked text); the same
    function twice in one FROM gets distinct generated aliases; a
    user-written alias is respected instead of stacking a second one."""
    lit = "SELECT 'x FROM hll_distinct(''a'', ''b'')' AS c"
    assert sketch_sql.expand_sketch_calls(lit) is lit
    spark.read.parquet(f"{SF_SMALL}/orders.parquet") \
        .createOrReplaceTempView("orders")
    q = sketch_sql.expand_sketch_calls(
        "SELECT a.name, a.estimate, b.estimate AS e2 "
        "FROM hll_distinct('orders', 'o_custkey') a "
        "JOIN hll_distinct('orders', 'o_custkey') AS b ON a.name = b.name"
    )
    rows = spark.sql(q).collect()
    assert len(rows) == 1 and rows[0].estimate == rows[0].e2
    q2 = sketch_sql.expand_sketch_calls(
        "SELECT name FROM hll_distinct('orders', 'o_custkey') "
        "WHERE name IS NOT NULL"
    )
    # no user alias -> generated alias, numbered; WHERE not swallowed
    assert "hll_distinct_t1 WHERE name IS NOT NULL" in q2
    assert spark.sql(q2).count() == 1


def test_sketch_sql_grouped_expansions_match_operators(spark):
    """cms_grouped(...) / quantile_grouped(...) / bloom_screen(...) must
    reproduce their operators' production rows byte-for-byte at the same
    geometry (the expansions embed the operators' own fragments)."""
    from incresql_spark.operators.relational import op_quantile_grouped
    from incresql_spark.operators.text import text_cms_grouped

    for t in ("orders", "documents"):
        spark.read.parquet(f"{SF_SMALL}/{t}.parquet") \
            .createOrReplaceTempView(t)
    # width 16 = the operator's gate geometry, passed explicitly — the
    # expansion's DEFAULT is the production width 2^20 (r16 advice #1)
    qc = sketch_sql.expand_sketch_calls(
        "SELECT * FROM cms_grouped('documents', 'lang', 'text', 16)"
    )
    from incresql_spark.operators.text import CMS_PROD_W
    assert f"% {CMS_PROD_W}" in sketch_sql.expand_sketch_calls(
        "SELECT * FROM cms_grouped('documents', 'lang', 'text')"
    )
    assert [tuple(r) for r in spark.sql(qc).collect()] == [
        tuple(r) for r in text_cms_grouped(spark, SF_SMALL).collect()
    ]
    qq = sketch_sql.expand_sketch_calls(
        "SELECT * FROM quantile_grouped('orders', 'o_orderpriority', "
        "'o_totalprice', 'o_orderkey')"
    )
    assert [tuple(r) for r in spark.sql(qq).collect()] == [
        tuple(r)
        for r in op_quantile_grouped(spark, SF_SMALL, verify=False)
        .collect()
    ]
    qb = sketch_sql.expand_sketch_calls(
        "SELECT * FROM bloom_screen('documents', 'doc_id', 'text', "
        f"{EVAL_SET_MAX_DOC})"
    )
    assert [tuple(r) for r in spark.sql(qb).collect()] == [
        tuple(r)
        for r in dedup_contamination_bloom_only(spark, SF_SMALL).collect()
    ]
    # the SQL-generated grouped row_number filters must keep the bounded
    # WindowGroupLimit rewrite the DataFrame operators are pinned to —
    # the wire surface may not silently regress to a full-group window
    for text in (qc, qq):
        plan = spark.sql(text)._jdf.queryExecution().executedPlan() \
            .toString()
        assert "WindowGroupLimit" in plan, plan[:2000]


def test_sketch_sql_quantile_expansion_is_single_sample_scan(spark):
    """The quantile expansion embeds the bottom-k sample subquery exactly
    ONCE (r15 verdict task 3), so the physical plan scans the source two
    times total (sample + exact count) instead of three."""
    spark.read.parquet(f"{SF_SMALL}/lineitem.parquet") \
        .createOrReplaceTempView("lineitem")
    q = sketch_sql.expand_sketch_calls(
        "SELECT * FROM quantile_sketch('lineitem', 'l_extendedprice', "
        "'l_orderkey') ORDER BY q_pct"
    )
    assert q.count("ORDER BY h ASC, v ASC LIMIT") == 1
    plan = spark.sql(q)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan parquet") == 2, plan
    rows = spark.sql(q).collect()
    assert [r.q_pct for r in rows] == [1, 25, 50, 75, 99]
    assert all(r.sample_n == 1024 for r in rows)


def test_mv_decimal_state_survives_repeated_refresh(spark, tmp_path):
    """Round-16 self-review regression: Spark widens decimal precision on
    every state re-aggregation (sum over already-summed decimals), so a
    pinned read schema wedges the MV on its third refresh with a parquet
    type mismatch.  Three refreshes over a low-precision decimal sum must
    keep working and keep matching the batch recompute."""
    from incresql_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute_statement("CREATE TABLE dml (k INT, v TEXT)")
    eng.execute_statement(
        "CREATE MATERIALIZED VIEW mv_dec AS "
        "SELECT k, sum(CAST(v AS DECIMAL(4,2))) AS s FROM dml GROUP BY k"
    )
    for wave in range(3):
        vals = ", ".join(
            f"({i % 2}, '{(wave * 3 + i) + 0.25}')" for i in range(3)
        )
        eng.execute_statement(f"INSERT INTO dml VALUES {vals}")
        eng.execute_statement("REFRESH MATERIALIZED VIEW mv_dec")
    got = eng.execute_statement(
        "SELECT k, CAST(s * 100 AS BIGINT) AS s_e2 FROM mv_dec ORDER BY k"
    ).rows
    want = eng.execute_statement(
        "SELECT k, CAST(sum(CAST(v AS DECIMAL(4,2))) * 100 AS BIGINT) "
        "AS s_e2 FROM dml GROUP BY k ORDER BY k"
    ).rows
    assert got == want


def test_grouped_cms_estimate_guard(spark, tmp_path):
    """A grouped IncrementalCms must refuse flat estimate() probes —
    cms_probe joins only (i, b), so probing a keyed state would blend
    every group's counters (round-16 self-review)."""
    import pytest as _pytest

    from incresql_spark.streaming.cms_incremental import IncrementalCms

    cms = IncrementalCms(spark, str(tmp_path / "state"), keys=("g",))
    with _pytest.raises(ValueError, match="grouped"):
        cms.estimate(spark.createDataFrame([("x",)], ["tok"]))


def test_decode_image_corrupt_ppm_stays_a_value_error():
    """Without Pillow, a corrupt P6 payload must surface the PPM
    decoder's precise ValueError, not a misattributed
    NotImplementedError about missing dependencies (round-16
    self-review)."""
    import pytest as _pytest

    from incresql_spark.operators.multimodal import decode_image

    try:
        import PIL  # noqa: F401

        _pytest.skip("Pillow present — the fallback path handles P6")
    except ImportError:
        pass
    with _pytest.raises(ValueError):
        decode_image(b"P6\n2 2\n255\n\x00\x01\x02", "ppm", fake=False)


def test_sketch_expansion_literal_safety_property():
    """PROPERTY (hypothesis): for any string literal payload — including
    payloads shaped exactly like sketch calls — a query whose only
    sketch-call-shaped text lives inside literals is returned UNCHANGED
    (same object), and a real call alongside such a literal expands
    without corrupting the literal (the r15 advice #1 failure class)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    payloads = st.text(
        alphabet=st.characters(
            whitelist_categories=("L", "N", "P", "Z"),
            blacklist_characters="'\\\x00",
        ),
        max_size=40,
    )

    @settings(max_examples=200, deadline=None)
    @given(payloads)
    def check(payload):
        lit = f"x FROM hll_distinct('{payload}', 'c') {payload}"
        sql = f"SELECT '{lit}' AS c FROM t"
        assert sketch_sql.expand_sketch_calls(sql) is sql
        combo = (f"SELECT * FROM quantile_sketch('t', 'v', 'k') "
                 f"WHERE c <> '{lit}'")
        out = sketch_sql.expand_sketch_calls(combo)
        assert out is not combo  # the real call expanded
        assert f"'{lit}'" in out  # the literal survived byte-for-byte
        assert "quantile_sketch(" not in out.replace(f"'{lit}'", "")

    check()


def test_explain_composes_with_sketch_expansion(spark, tmp_path):
    """EXPLAIN SELECT * FROM hll_distinct(...) renders the EXPANDED plan
    through the reference-style explain tree (planner/src/explain/
    mod.rs:38-83 analog) — proving the wire sketch surface composes with
    the statement layer, not just bare SELECT."""
    from incresql_spark.engine import Engine

    eng = Engine(spark, str(tmp_path / "wh"))
    eng.execute_statement("CREATE TABLE pts (k INT)")
    eng.execute_statement("INSERT INTO pts VALUES (1), (2), (2)")
    res = eng.execute_statement(
        "EXPLAIN SELECT name, estimate FROM hll_distinct('pts', 'k')"
    )
    assert res.columns == ["tree", "col_idx", "datatype", "expression"]
    txt = "\n".join(str(r) for r in res.rows)
    assert "estimate" in txt
    # and the SELECT itself runs through the engine end-to-end
    got = eng.execute_statement(
        "SELECT name, estimate FROM hll_distinct('pts', 'k')"
    )
    assert got.rows[0][0] == "k" and round(got.rows[0][1]) == 2


def test_bloom_test_word_packing_equals_naive(spark):
    """r19: _bloom_test packs the bit set via a BIT_OR aggregate and one
    list literal; the words must equal the naive per-idx driver loop over
    the distinct positions (two's-complement fold included — seed a high
    bit 63 word on purpose)."""
    from pyspark.sql import functions as F

    from incresql_spark.operators.dedup import BLOOM_M, _bloom_test

    idxs = [0, 1, 63, 64, 127, 4095, BLOOM_M - 1, BLOOM_M - 1, 63]  # dupes
    bits = spark.createDataFrame([(i,) for i in idxs], "idx BIGINT")
    arr, _pred = _bloom_test(bits)

    naive = [0] * (BLOOM_M // 64)
    for i in set(idxs):
        naive[i >> 6] |= 1 << (i & 63)
    naive = [w - (1 << 64) if w >= (1 << 63) else w for w in naive]

    got = spark.range(1).select(arr.alias("w")).collect()[0]["w"]
    assert list(got) == naive
