"""Round-13 operators: Gopher quality rules, BM25 search, SQ8 quantization.

Cross-engine value equality is covered by the DuckDB oracle gate
(tools/check_oracle.py — all three verified hash-green at sf0.001/0.01/0.1);
these tests pin the SEMANTIC invariants the hash can't articulate: the keep
verdict really is the conjunction of its published thresholds, BM25 ranks
really order by score, and SQ8 codes/reconstruction really stay inside the
quantization bounds.
"""

from __future__ import annotations

from incresql_spark.operators.similarity import sim_quantize_int8
from incresql_spark.operators.text import (
    BM25_QUERIES,
    BM25_TOP_K,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MEAN_LEN_HI,
    GOPHER_MEAN_LEN_LO,
    GOPHER_MIN_ALPHA_RATIO,
    GOPHER_MIN_REQUIRED_HITS,
    GOPHER_MIN_WORDS,
    text_bm25_search,
    text_gopher_quality,
)

from .conftest import SF_SMALL


def test_gopher_keep_is_exactly_the_rule_conjunction(spark):
    rows = text_gopher_quality(spark, SF_SMALL).collect()
    assert rows, "empty corpus"
    kept = 0
    for r in rows:
        expect = (
            GOPHER_MIN_WORDS <= r.n_words <= GOPHER_MAX_WORDS
            and GOPHER_MEAN_LEN_LO <= r.mean_word_len <= GOPHER_MEAN_LEN_HI
            and r.symbol_word_ratio <= GOPHER_MAX_SYMBOL_RATIO
            and r.alpha_word_ratio >= GOPHER_MIN_ALPHA_RATIO
            and r.required_hits >= GOPHER_MIN_REQUIRED_HITS
        )
        assert r.keep == expect, r
        kept += r.keep
    # the thresholds must actually discriminate on this corpus — a filter
    # that keeps everything (or nothing) is a silently broken rule
    assert 0 < kept < len(rows)


def test_gopher_repetition_fractions_match_python_recompute(spark):
    """Round-14 columns (Gopher's duplicate-line / duplicate-paragraph
    character fractions over the synthesized token-slice structure) pinned
    against an independent pure-Python recompute; the keep flag must stay
    the round-13 five-rule conjunction (repetition is informational)."""
    import collections
    import re

    from incresql_spark.operators.text import (
        GOPHER_LINE_TOKENS,
        GOPHER_PARA_LINES,
    )

    rows = text_gopher_quality(spark, SF_SMALL).collect()
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{SF_SMALL}/documents.parquet")
        .select("doc_id", "text").collect()
    }

    def frac(elems):
        c = collections.Counter(elems)
        tot = sum(len(e) for e in elems)
        dup = sum(len(e) for e in elems if c[e] >= 2)
        return dup / tot if tot else 0.0

    n_line_pos = n_para_pos = 0
    for r in rows:
        toks = re.findall(r"[a-z0-9]+", texts[r.doc_id].lower())
        lines = [
            " ".join(toks[i:i + GOPHER_LINE_TOKENS])
            for i in range(0, len(toks), GOPHER_LINE_TOKENS)
        ]
        paras = [
            "\n".join(lines[i:i + GOPHER_PARA_LINES])
            for i in range(0, len(lines), GOPHER_PARA_LINES)
        ]
        assert abs(r.dup_line_frac - frac(lines)) < 1e-12, r
        assert abs(r.dup_para_frac - frac(paras)) < 1e-12, r
        n_line_pos += r.dup_line_frac > 0
        n_para_pos += r.dup_para_frac > 0
    # the columns must discriminate: some docs repeat lines, not all
    assert 0 < n_line_pos < len(rows)
    assert n_para_pos >= 1


def test_gopher_plan_is_shuffle_free(spark):
    """The repetition columns are narrow array HOFs — the only exchange
    in the whole operator remains the deterministic ORDER BY's range
    partitioning (zero hash exchanges: scan -> project -> sort)."""
    plan = (
        text_gopher_quality(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Exchange hashpartitioning") == 0, plan
    assert plan.count("Exchange rangepartitioning") == 1


def test_bm25_ranks_order_by_score_and_respect_k(spark):
    rows = text_bm25_search(spark, SF_SMALL).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == {qid for qid, _ in BM25_QUERIES}
    for qid, rs in by_q.items():
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= BM25_TOP_K
        for a, b in zip(rs, rs[1:]):
            assert a.score > b.score or (
                a.score == b.score and a.doc_id < b.doc_id
            ), (qid, a, b)
        assert all(r.n_terms >= 1 for r in rs)


def test_quantize_int8_codes_and_error_bounded(spark):
    rows = sim_quantize_int8(spark, SF_SMALL).collect()
    assert rows, "empty corpus"
    nd = rows[0].n_dims
    for r in rows:
        assert r.n_dims == nd
        assert 0 <= r.code_min <= r.code_max <= 255
        assert 0 <= r.code_sum <= 255 * nd
        # nearest-code reconstruction error is at most half a step per
        # dimension; embeddings are unit-scale floats so the per-dim range
        # is < 4.0 → step < 4/255, half-step < 0.00785
        assert 0.0 <= r.l1_err <= nd * (4.0 / 255.0) / 2.0, r


def test_hll_estimates_within_theory_and_both_branches(spark):
    """HLL with m=4096 has relative standard error 1.04/sqrt(m) ~ 1.6%;
    allow 3 sigma.  The three columns must exercise BOTH regimes at
    sf0.001: linear counting for the tiny cardinalities and (from sf0.01,
    checked by the oracle gate) the raw harmonic branch for l_orderkey."""
    from incresql_spark.operators.relational import HLL_M, op_hll_distinct

    rows = op_hll_distinct(spark, SF_SMALL).collect()
    assert {r.name for r in rows} == {
        "l_linenumber", "l_orderkey", "l_partkey"}
    for r in rows:
        assert r.m == HLL_M
        assert r.occupied + r.v_zero == HLL_M
        rel = abs(r.estimate - r.exact_count) / max(r.exact_count, 1)
        assert rel < 3 * 1.04 / (HLL_M ** 0.5), (r.name, rel)
    assert any(r.used_lc for r in rows), "LC branch never exercised"


def test_hll_ln_series_matches_libm_over_lc_range():
    """The pinned 20-term atanh series (used because libm ln is not
    bit-identical across engines) must agree with math.log to ~1 ulp over
    every input the linear-counting branch can produce (V in [1, 2.5m],
    range-reduced to z in [1, 2))."""
    import math

    from incresql_spark.operators.relational import HLL_M

    worst = 0.0
    for v in range(1, int(2.5 * HLL_M) + 1):
        kv = v.bit_length()
        z = v / (1 << (kv - 1))
        t = (z - 1.0) / (z + 1.0)
        s = 1.0 / 39.0
        for k in range(18, -1, -1):
            s = s * (t * t) + 1.0 / (2 * k + 1)
        lnv = (kv - 1) * 0.6931471805599453 + 2.0 * t * s
        worst = max(worst, abs(lnv - math.log(v)))
    assert worst < 1e-14, worst


def test_hll_sketch_shuffle_is_bounded(spark):
    """The sketch path's only data-sized exchange is the (name, register)
    aggregate — at most |columns| x m groups survive the map-side partial
    max.  The plan carries 4 hash exchanges total ONLY because the
    verification-only exact count(DISTINCT) column adds its two; the
    3-row estimate/exact join is a broadcast."""
    import re

    from incresql_spark.operators.relational import op_hll_distinct

    plan = (
        op_hll_distinct(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert len(re.findall(r"Exchange hashpartitioning", plan)) <= 4
    assert len(re.findall(r"BroadcastExchange", plan)) == 1


def test_hll_incremental_equals_batch_and_state_stays_bounded(
        spark, tmp_path):
    """Three waves through IncrementalHll must produce byte-identical
    output to the batch operator over the full table (registers
    max-merge exactly), and the maintained state must stay bounded at
    columns x m rows no matter how many waves ingested."""
    from incresql_spark.catalog import load_table
    from incresql_spark.operators.relational import (
        HLL_COLUMNS,
        HLL_M,
        hll_exact,
        hll_values,
        op_hll_distinct,
    )
    from incresql_spark.streaming.hll_incremental import IncrementalHll

    li = load_table(spark, SF_SMALL, "lineitem")
    hll = IncrementalHll(spark, str(tmp_path / "hll_state"))
    for w in range(3):
        hll.add_batch(li.filter(f"l_orderkey % 3 = {w}"))
    got = hll.estimate(hll_exact(hll_values(li))).collect()
    want = op_hll_distinct(spark, SF_SMALL).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert hll.registers().count() <= len(HLL_COLUMNS) * HLL_M


def test_cms_never_underestimates_and_bounds_sketch(spark):
    """Count-Min invariants: the estimate is NEVER below the exact count
    (each counter sums a superset of the token's occurrences), the
    deliberately tiny width (w=16 vs a ~40-token vocabulary) must
    actually produce collisions somewhere (otherwise the min-over-rows
    logic is untested), and the candidate set is top-15 + bottom-5."""
    from incresql_spark.operators.text import (
        CMS_BOTTOM,
        CMS_TOP,
        text_cms_heavyhitters,
    )

    rows = text_cms_heavyhitters(spark, SF_SMALL).collect()
    assert 2 <= len(rows) <= CMS_TOP + CMS_BOTTOM
    assert all(r.overestimate >= 0 for r in rows)
    assert all(r.cms_est == r.exact_cnt + r.overestimate for r in rows)
    assert any(r.overestimate > 0 for r in rows), (
        "no collisions at w=16 — the min-over-rows path is untested")
    for a, b in zip(rows, rows[1:]):  # exact_cnt desc, tok asc
        assert (-a.exact_cnt, a.tok) <= (-b.exact_cnt, b.tok)


def test_cms_candidate_selection_is_take_ordered(spark):
    """Candidate selection must plan as TakeOrderedAndProject (per-task
    partial top-k), never a single-partition global-rank window — the
    shape that survives an arbitrarily large vocabulary."""
    from incresql_spark.operators.text import text_cms_heavyhitters

    plan = (
        text_cms_heavyhitters(spark, SF_SMALL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("TakeOrderedAndProject") == 2
    assert "Window [" not in plan


def test_cms_geometry_is_a_parameter(spark):
    """Round-14 (VERDICT r13 task 3): width/depth are call parameters, not
    hard-codes.  At the gate's collision-stress w=16 the corpus must
    produce overestimates; at a realistic w=4096 the same ~40-token
    vocabulary must probe collision-free (est == exact for every
    candidate, min over 4 independent rows).  Both geometries preserve
    the never-underestimate invariant."""
    from incresql_spark.operators.text import text_cms_heavyhitters

    tiny = text_cms_heavyhitters(spark, SF_SMALL, width=16).collect()
    wide = text_cms_heavyhitters(spark, SF_SMALL, width=4096).collect()
    assert all(r.overestimate >= 0 for r in tiny + wide)
    assert any(r.overestimate > 0 for r in tiny)
    assert all(r.overestimate == 0 for r in wide), [
        r for r in wide if r.overestimate
    ]


def test_cms_sketch_only_matches_exact_at_production_width(spark):
    """The production path (w=2^20 sketch + fixed-candidate probes, no
    exact ride-along) returns one row per candidate whose estimate equals
    the exact count at a width where this vocabulary cannot collide in
    all 4 rows."""
    from incresql_spark.operators.text import (
        _BM25_TERMS,
        TOKENS_SPARK,
        text_cms_sketch_only,
    )
    from incresql_spark.operators.relational import load_table
    from pyspark.sql import functions as F

    rows = text_cms_sketch_only(spark, SF_SMALL).collect()
    assert [r.tok for r in rows] == sorted(_BM25_TERMS)
    exact = {
        r.tok: r.cnt
        for r in load_table(spark, SF_SMALL, "documents")
        .select(F.explode(F.expr(TOKENS_SPARK)).alias("tok"))
        .groupBy("tok").agg(F.count("*").alias("cnt")).collect()
    }
    for r in rows:
        assert r.cms_est == exact.get(r.tok, 0), (r, exact.get(r.tok))


def test_hll_verify_flag_splits_sketch_from_verification(spark):
    """verify=False (the production path, bench row op_hll_sketch_only)
    drops the exact count(DISTINCT) ride-along; the sketch columns are
    byte-identical to the verify=True output."""
    from incresql_spark.operators.relational import op_hll_distinct

    full = op_hll_distinct(spark, SF_SMALL).collect()
    sk = op_hll_distinct(spark, SF_SMALL, verify=False)
    assert sk.columns == ["name", "m", "occupied", "v_zero", "s",
                          "raw_est", "used_lc", "estimate", "rse_ppm"]
    got = {tuple(r) for r in sk.collect()}
    want = {tuple(r)[:-1] for r in full}
    assert got == want


def test_wide_integer_to_double_routing_is_correctly_rounded(spark):
    """BM25's exact wide integers become DOUBLE via a decimal-string
    round-trip on BOTH engines because a string->double parse is
    guaranteed correctly rounded, while DuckDB's direct HUGEINT->DOUBLE
    (upper*2^64 + lower in double arithmetic) can double-round 1 ulp off
    past 2^53 (round-13 advice).  Feed known double-rounding boundary
    integers through both engines' routed casts and pin them to Python's
    int->float, which is correctly rounded by definition.

    2^64 + 3*2^12 + 2^11 - 1 is the canonical trap: the low 64 bits round
    first to exactly half an ulp of the final magnitude, then ties-even
    rounds AWAY from the true value."""
    import duckdb

    boundary = [
        (1 << 64) + 3 * (1 << 12) + (1 << 11) - 1,
        (1 << 64) + 5 * (1 << 12) + (1 << 11) - 1,
        (1 << 70) + 3 * (1 << 18) + (1 << 17) - 1,
        10**25 + 3,
        (1 << 53) + 1,
    ]
    con = duckdb.connect()
    for v in boundary:
        correct = float(v)  # CPython: correctly rounded int->float
        (duck,) = con.sql(
            f"SELECT CAST(CAST(CAST('{v}' AS HUGEINT) AS VARCHAR) AS DOUBLE)"
        ).fetchone()
        (spk,) = spark.sql(
            f"SELECT CAST(CAST(CAST('{v}' AS DECIMAL(38,0)) AS STRING) "
            "AS DOUBLE)"
        ).collect()[0]
        assert duck == correct and spk == correct, (v, duck, spk, correct)
