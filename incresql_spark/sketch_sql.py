"""SQL-callable sketch table functions for the engine's wire surface.

The sketch family (HLL cardinality, bottom-k quantiles, Count-Min heavy
hitters) exists as DataFrame operators in operators/relational.py and
operators/text.py; this module makes them reachable from PLAIN SQL — and
therefore from the MySQL wire front-end (server/mysql.py) — by expanding
a table-function call in a FROM clause into the equivalent Spark-SQL
subquery (round-15 verdict task 8).  The reference has no sketch surface
at all (its function registry is scalar-only, functions/src/registry.rs);
this is the north-star analog of its FileScan-style pluggable sources.

Supported forms (arguments are quoted strings; trailing integers are
optional geometry overrides):

    SELECT * FROM hll_distinct('lineitem', 'l_orderkey', 'l_partkey')
    SELECT * FROM hll_distinct('orders', 'o_custkey', 10)     -- p=10
    SELECT * FROM hll_grouped('orders', 'o_orderpriority',
                              'o_custkey')                    -- per-group
    SELECT * FROM quantile_sketch('lineitem', 'l_extendedprice',
                                  'l_orderkey')               -- k=1024
    SELECT * FROM quantile_grouped('orders', 'o_orderpriority',
                                   'o_totalprice', 'o_orderkey')
    SELECT * FROM cms_topk('documents', 'text')               -- w=2^20,d=4
    SELECT * FROM cms_grouped('documents', 'lang', 'text')    -- per-group,
                                                              -- w=2^20,d=4
    SELECT * FROM bloom_screen('documents', 'doc_id', 'text', 20)
    SELECT * FROM kmv_set_ops('lineitem', 'l_partkey', 'l_suppkey')
    SELECT * FROM bm25_search('documents', 'doc_id', 'text',
                              'queries_tbl')               -- k=10

Each expansion is the PRODUCTION sketch path — no exact ride-along
columns (the full-key shuffle the sketch exists to avoid never appears
in the generated plan); the arithmetic fragments are the operators' own
(_hll_sql / the bottom-k nearest-rank selection / the seeded CMS bucket
expression), so wire-served estimates are bit-identical to the
gate-checked operators at the same geometry.  Expansion happens inside
Engine._run_select BEFORE table qualification, so the generated
``FROM <table>`` resolves through the engine catalog like any other
query, and the result composes with ordinary SQL (WHERE / ORDER BY /
joins around the call site).
"""

from __future__ import annotations

import re

from .dialect import mask_literals, unmask_literals
from .functions.hashing import hash60_spark_sql
from .operators.dedup import (
    BLOOM_K,
    BLOOM_M,
    SHINGLES_SPARK,
    _bloom_idx_spark,
)
from .operators.relational import (
    HLL_GROUP_P,
    HLL_P,
    KMV_K,
    QSK_GROUP_K,
    QSK_GROUP_QS,
    QSK_K,
    QSK_QS,
    _d,
    _hll_spark,
    _KMV_SPACE,
)
from .operators.text import (
    BM25_TOP_K,
    CMS_BOTTOM,
    CMS_D,
    CMS_GROUP_TOP,
    CMS_PROD_W,
    CMS_TOP,
    TOKENS_SPARK,
    _cms_bucket_spark,
    _cms_seeds,
    cms_bounds,
)

_SKETCH_FNS = (
    "hll_distinct", "hll_grouped", "quantile_sketch", "cms_topk",
    "cms_grouped", "quantile_grouped", "bloom_screen",
    "kmv_set_ops", "bm25_search",
)
#: cheap pre-check so the hot statement path pays one scan, no masking
_SKETCH_NAME = re.compile(
    r"\b(" + "|".join(_SKETCH_FNS) + r")\s*\(", re.IGNORECASE
)
#: words that may follow a derived table WITHOUT being its alias — the
#: optional alias capture below must not swallow them
_NOT_ALIAS = (
    "WHERE|GROUP|ORDER|LIMIT|HAVING|UNION|JOIN|LEFT|RIGHT|FULL|INNER|"
    "CROSS|ON|USING|NATURAL|SEMI|ANTI|EXCEPT|INTERSECT|WINDOW|QUALIFY|"
    # clause keywords that can legally follow a FROM item (r16 advice #3)
    "OFFSET|LATERAL|TABLESAMPLE|SORT|DISTRIBUTE|CLUSTER|PIVOT|UNPIVOT|"
    "VALUES"
)
#: matched against literal-MASKED text (dialect.mask_literals), so a
#: sketch-call-shaped fragment inside a string literal can never match —
#: the same false-positive class _qualify masks against (r15 advice #1).
#: Group 4 captures a user-written alias (``FROM hll_distinct(...) a``,
#: possibly a masked backtick identifier) so the expansion reuses it
#: instead of stacking a second generated alias after it.
_SKETCH_CALL = re.compile(
    r"\b(FROM|JOIN)\s+(" + "|".join(_SKETCH_FNS) + r")\s*\(([^()]*)\)"
    r"(?:\s+(?:AS\s+)?(?!(?:" + _NOT_ALIAS + r")\b)"
    r"(\x00\d+\x00|[A-Za-z_][A-Za-z0-9_]*))?",
    re.IGNORECASE,
)


def _parse_args(raw: str) -> list[str | int]:
    """'\\'lineitem\\', \\'l_orderkey\\', 10' -> ['lineitem',
    'l_orderkey', 10].  Strings are single-quoted identifiers (table /
    column names — validated to be identifier-shaped so the expansion
    cannot smuggle SQL), bare integers are geometry overrides."""
    args: list[str | int] = []
    for tok in raw.split(","):
        tok = tok.strip()
        if not tok:
            continue
        if tok.startswith("'") and tok.endswith("'") and len(tok) >= 2:
            ident = tok[1:-1]
            if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", ident):
                raise ValueError(
                    f"sketch table-function argument {tok} is not an "
                    "identifier"
                )
            args.append(ident)
        elif re.fullmatch(r"\d+", tok):
            args.append(int(tok))
        else:
            raise ValueError(
                f"sketch table-function argument {tok!r} must be a quoted "
                "identifier or an integer"
            )
    return args


def hll_distinct_sql(table: str, columns: list[str], p: int = HLL_P,
                     group_col: str | None = None) -> str:
    """Production HLL (op_hll_distinct / op_hll_grouped verify=False) as
    one Spark-SQL subquery: nested selects instead of CTEs so the text
    embeds anywhere a derived table can.  Columns: [g,] name, m,
    occupied, v_zero, s, raw_est, used_lc, estimate, rse_ppm — the
    operators' own production schema.  ``group_col`` turns the sketch
    key into (group, column), the op_hll_grouped shape."""
    x = _hll_spark(p)
    m, r = x["m"], 61 - p
    gsel = f"{group_col} AS g, " if group_col else ""
    keys = "g, name" if group_col else "name"
    unions = " UNION ALL ".join(
        f"SELECT {gsel}'{c}' AS name, CAST({c} AS STRING) AS val "
        f"FROM {table}"
        for c in columns
    )
    rse = round(1.04 / m ** 0.5 * 1_000_000)
    q = f"SELECT {keys}, val FROM ({unions}) WHERE val IS NOT NULL"
    q = (f"SELECT {keys}, (h % {m}) AS j, "
         f"CASE WHEN (h DIV {m}) = 0 THEN {r} "
         f"ELSE CAST({r} - length(bin(h DIV {m})) AS INT) END AS rho "
         f"FROM (SELECT {keys}, {hash60_spark_sql('val')} AS h "
         f"FROM ({q}))")
    q = (f"SELECT {keys}, j, MAX(rho) AS mj FROM ({q}) "
         f"GROUP BY {keys}, j")
    q = (f"SELECT {keys}, CAST(COUNT(*) AS INT) AS occupied, "
         f"SUM({x['term']}) AS s_occ FROM ({q}) GROUP BY {keys}")
    q = (f"SELECT {keys}, occupied, {m} - occupied AS v_zero, "
         f"CAST(s_occ + CAST({m} - occupied AS BIGINT) * {x['empty_term']} "
         f"AS BIGINT) AS s FROM ({q})")
    q = (f"SELECT {keys}, occupied, v_zero, s, {x['raw']} AS raw_est, "
         f"{x['kv']} AS kv FROM ({q})")
    for col in ("z", "t", "ln_v", "used_lc"):
        q = f"SELECT *, {x[col]} AS {col} FROM ({q})"
    return (
        f"SELECT {keys}, {m} AS m, occupied, v_zero, s, raw_est, used_lc, "
        f"CASE WHEN used_lc THEN {x['lc']} ELSE raw_est END AS estimate, "
        f"CAST({rse} AS BIGINT) AS rse_ppm FROM ({q})"
    )


def quantile_sketch_sql(table: str, value_col: str, key_col: str,
                        k: int = QSK_K) -> str:
    """Production bottom-k quantile sketch (op_quantile_sketch
    verify=False) as one Spark-SQL subquery.  Columns: q_pct, n,
    sample_n, est_value (raw data values — the operator's no-arithmetic
    estimate).  The sample subquery appears exactly ONCE (r15 verdict
    task 3: the old expansion embedded it twice and rescanned the table):
    sample_n and the selection rank both come from windows over the
    already-limited <=k-row sample, so the generated plan scans the
    table twice total — once for the sample's TakeOrderedAndProject,
    once for the exact row count (which no sample can supply)."""
    base = (f"SELECT {value_col} AS v, "
            f"{hash60_spark_sql(f'CAST({key_col} AS STRING)')} AS h "
            f"FROM {table} WHERE {value_col} IS NOT NULL")
    samp = f"SELECT v, h FROM ({base}) ORDER BY h ASC, v ASC LIMIT {k}"
    ranked = (
        "SELECT v, ROW_NUMBER() OVER (ORDER BY v ASC, h ASC) AS rs, "
        f"CAST(COUNT(*) OVER () AS BIGINT) AS sample_n FROM ({samp})"
    )
    qs = ", ".join(str(q) for q in QSK_QS)
    return (
        "SELECT q.q_pct, t.n, sr.sample_n, sr.v AS est_value "
        f"FROM ({ranked}) sr "
        f"JOIN (SELECT explode(array({qs})) AS q_pct) q "
        "ON sr.rs = (q.q_pct * sr.sample_n + 99) DIV 100 "
        f"CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ({base})) t "
        "ORDER BY q.q_pct"
    )


def quantile_grouped_sql(table: str, group_col: str, value_col: str,
                         key_col: str, k: int = QSK_GROUP_K) -> str:
    """Production GROUPED bottom-k quantile sketch (op_quantile_grouped
    verify=False, relational.py:1988) as one Spark-SQL subquery.
    Columns: g, q_pct, n, sample_n, est_value.  The per-group sample is
    a row_number-over-(g; h) filter — Spark rewrites it through
    WindowGroupLimit, the operator's own bounded-forwarding shape — and
    appears ONCE; per-group n comes from a separate grouped count (the
    one thing the sample cannot supply).  The count join is NULL-safe
    (``<=>``) so a NULL group reports like every other group, matching
    the DataFrame operator's PARTITION BY / groupBy semantics (r16
    advice #2; the window partitions are NULL-safe by construction)."""
    base = (f"SELECT {group_col} AS g, {value_col} AS v, "
            f"{hash60_spark_sql(f'CAST({key_col} AS STRING)')} AS h "
            f"FROM {table} WHERE {value_col} IS NOT NULL")
    samp = (
        "SELECT g, v, h FROM (SELECT g, v, h, ROW_NUMBER() OVER "
        "(PARTITION BY g ORDER BY h ASC, v ASC) AS rh "
        f"FROM ({base})) WHERE rh <= {k}"
    )
    ranked = (
        "SELECT g, v, ROW_NUMBER() OVER "
        "(PARTITION BY g ORDER BY v ASC, h ASC) AS rs, "
        "CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS sample_n "
        f"FROM ({samp})"
    )
    qs = ", ".join(str(q) for q in QSK_GROUP_QS)
    return (
        "SELECT sr.g, q.q_pct, t.n, sr.sample_n, sr.v AS est_value "
        f"FROM ({ranked}) sr "
        f"JOIN (SELECT explode(array({qs})) AS q_pct) q "
        "ON sr.rs = (q.q_pct * sr.sample_n + 99) DIV 100 "
        f"JOIN (SELECT g, CAST(COUNT(*) AS BIGINT) AS n FROM ({base}) "
        "GROUP BY g) t ON t.g <=> sr.g "
        "ORDER BY sr.g, q.q_pct"
    )


def cms_grouped_sql(table: str, group_col: str, text_col: str,
                    width: int = CMS_PROD_W, depth: int = CMS_D) -> str:
    """Per-group CMS heavy-hitter report (text_cms_grouped's shape,
    text.py:2344) as one Spark-SQL subquery.  Columns: g, tok,
    exact_cnt, cms_est, overestimate.  Candidate selection is a
    row_number window per group (WindowGroupLimit — at most
    {CMS_GROUP_TOP} x |groups| rows forwarded per partition), probed
    against the per-group d x w counter sketch.  Defaults to the
    PRODUCTION width w=2^20 like cms_topk (r16 advice #1 — CMS_W=16 is
    the deliberate collision-stress gate geometry, reachable only by
    passing the width explicitly)."""
    toks_expr = TOKENS_SPARK.replace("(text)", f"({text_col})") \
        if text_col != "text" else TOKENS_SPARK
    toks = (f"SELECT {group_col} AS g, explode({toks_expr}) AS tok "
            f"FROM {table}")
    seeds = _cms_seeds(depth)
    bucket = _cms_bucket_spark(width)
    sketch = (
        f"SELECT g, i, b, CAST(COUNT(*) AS BIGINT) AS c FROM ("
        f"SELECT g, i, {bucket} AS b FROM ("
        f"SELECT g, tok, explode(array({seeds})) AS i FROM ({toks})"
        f")) GROUP BY g, i, b"
    )
    exact = (f"SELECT g, tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt "
             f"FROM ({toks}) GROUP BY g, tok")
    cands = (
        "SELECT g, tok, exact_cnt FROM (SELECT g, tok, exact_cnt, "
        "ROW_NUMBER() OVER (PARTITION BY g "
        "ORDER BY exact_cnt DESC, tok ASC) AS rk "
        f"FROM ({exact})) WHERE rk <= {CMS_GROUP_TOP}"
    )
    probes = (
        f"SELECT g, tok, exact_cnt, i, {bucket} AS b FROM ("
        f"SELECT g, tok, exact_cnt, explode(array({seeds})) AS i "
        f"FROM ({cands}))"
    )
    eps_ppm, delta_ppb = cms_bounds(width, depth)
    return (
        "SELECT g, tok, exact_cnt, cms_est, "
        "cms_est - exact_cnt AS overestimate, "
        f"CAST({eps_ppm} AS BIGINT) AS eps_ppm, "
        f"CAST({delta_ppb} AS BIGINT) AS delta_ppb FROM ("
        "SELECT p.g, p.tok, p.exact_cnt, MIN(s.c) AS cms_est "
        f"FROM ({probes}) p JOIN ({sketch}) s "
        "ON p.g = s.g AND p.i = s.i AND p.b = s.b "
        "GROUP BY p.g, p.tok, p.exact_cnt"
        ") ORDER BY g, exact_cnt DESC, tok ASC"
    )


cms_grouped_sql.__doc__ = cms_grouped_sql.__doc__.replace(
    "{CMS_GROUP_TOP}", str(CMS_GROUP_TOP)
)


def bloom_screen_sql(table: str, id_col: str, text_col: str,
                     split: int) -> str:
    """Production Bloom contamination screen (dedup_contamination_bloom's
    verify=False path, dedup.py:883) as one Spark-SQL subquery.
    Columns: train_doc_id, n_bloom_hits.  Docs with ``id < split`` play
    the eval set; their shingles fold into the m={BLOOM_M}-bit / k=
    {BLOOM_K}-probe bit set (<= m distinct idx rows — AQE broadcasts
    it); the training corpus streams past in one narrow pass.  No exact
    ride-along — the O(|eval shingles|) broadcast the screen exists to
    avoid never appears in the generated plan."""
    toks_expr = TOKENS_SPARK.replace("(text)", f"({text_col})") \
        if text_col != "text" else TOKENS_SPARK
    shingles = SHINGLES_SPARK
    docsh = (
        f"SELECT doc_id, shingles FROM ("
        f"SELECT doc_id, array_distinct({shingles}) AS shingles FROM ("
        f"SELECT {id_col} AS doc_id, {toks_expr} AS tokens FROM {table} "
        f"WHERE size({toks_expr}) >= 3))"
    )
    seeds = ", ".join(str(j) for j in range(BLOOM_K))
    idx = _bloom_idx_spark()  # the operator's own probe expression
    ev = (f"SELECT DISTINCT shingle FROM (SELECT explode(shingles) AS "
          f"shingle FROM ({docsh}) WHERE doc_id < {split})")
    bits = (f"SELECT DISTINCT {idx} AS idx FROM ("
            f"SELECT shingle, explode(array({seeds})) AS j FROM ({ev}))")
    tr = (f"SELECT doc_id AS train_doc_id, explode(shingles) AS shingle "
          f"FROM ({docsh}) WHERE doc_id >= {split}")
    probes = (f"SELECT train_doc_id, shingle, {idx} AS idx FROM ("
              f"SELECT train_doc_id, shingle, "
              f"explode(array({seeds})) AS j FROM ({tr}))")
    return (
        "SELECT train_doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_hits "
        "FROM ("
        "SELECT train_doc_id, shingle "
        f"FROM ({probes}) p JOIN ({bits}) b ON p.idx = b.idx "
        f"GROUP BY train_doc_id, shingle HAVING COUNT(*) = {BLOOM_K}"
        ") GROUP BY train_doc_id ORDER BY train_doc_id"
    )


bloom_screen_sql.__doc__ = bloom_screen_sql.__doc__ \
    .replace("{BLOOM_M}", str(BLOOM_M)).replace("{BLOOM_K}", str(BLOOM_K))


def cms_topk_sql(table: str, text_col: str, width: int = CMS_PROD_W,
                 depth: int = CMS_D) -> str:
    """CMS heavy-hitter report (text_cms_heavyhitters' shape at the
    PRODUCTION geometry) as one Spark-SQL subquery.  Columns: tok,
    exact_cnt, cms_est, overestimate.  Candidate selection is two
    ORDER BY ... LIMIT subqueries (TakeOrderedAndProject — no global
    window), probed against the d x w counter sketch."""
    toks_expr = TOKENS_SPARK.replace("(text)", f"({text_col})") \
        if text_col != "text" else TOKENS_SPARK
    toks = f"SELECT explode({toks_expr}) AS tok FROM {table}"
    seeds = _cms_seeds(depth)
    bucket = _cms_bucket_spark(width)
    sketch = (
        f"SELECT i, b, CAST(COUNT(*) AS BIGINT) AS c FROM ("
        f"SELECT i, {bucket} AS b FROM ("
        f"SELECT tok, explode(array({seeds})) AS i FROM ({toks})"
        f")) GROUP BY i, b"
    )
    exact = (f"SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_cnt "
             f"FROM ({toks}) GROUP BY tok")
    cands = (
        f"SELECT tok, exact_cnt FROM (SELECT tok, exact_cnt FROM ({exact}) "
        f"ORDER BY exact_cnt DESC, tok ASC LIMIT {CMS_TOP}) "
        f"UNION "
        f"SELECT tok, exact_cnt FROM (SELECT tok, exact_cnt FROM ({exact}) "
        f"ORDER BY exact_cnt ASC, tok ASC LIMIT {CMS_BOTTOM})"
    )
    probes = (
        f"SELECT tok, exact_cnt, i, {bucket} AS b FROM ({cands}) "
        f"CROSS JOIN (SELECT explode(array({seeds})) AS i)"
    )
    eps_ppm, delta_ppb = cms_bounds(width, depth)
    return (
        f"SELECT tok, exact_cnt, cms_est, cms_est - exact_cnt AS "
        f"overestimate, CAST({eps_ppm} AS BIGINT) AS eps_ppm, "
        f"CAST({delta_ppb} AS BIGINT) AS delta_ppb FROM ("
        f"SELECT p.tok, p.exact_cnt, MIN(COALESCE(s.c, 0)) AS cms_est "
        f"FROM ({probes}) p LEFT JOIN ({sketch}) s "
        f"ON p.i = s.i AND p.b = s.b GROUP BY p.tok, p.exact_cnt"
        f") ORDER BY exact_cnt DESC, tok ASC"
    )


def kmv_set_ops_sql(table: str, col_a: str, col_b: str,
                    k: int = KMV_K) -> str:
    """KMV set-cardinality algebra (op_kmv_set_ops' PRODUCTION columns,
    relational.py:1838 — estimates + rse bounds, NO exact ride-alongs:
    the full-outer distinct-value verification join is the gate query's
    job, not the wire's) as one Spark-SQL subquery.  ONE output row:
    k, a_est, a_rse_ppm, b_est, b_rse_ppm, union_est, union_rse_ppm,
    inter_est.

    Plan shape: BOTH bottom-k samples come from a single name-tagged
    distinct — ``(name, h)`` pairs through one map-side-partial DISTINCT
    exchange, then per-name bottom-k via a row_number window Spark
    rewrites to WindowGroupLimit (the grouped-quantile expansion's
    bounded-forwarding shape).  The sample subquery recurs textually
    downstream, but every recurrence re-reads the SAME canonical
    distinct exchange (ReusedExchange — plan-pinned in tests), so the
    corpus is not rescanned per use; all set algebra then runs on
    <= 2k-row frames.  The estimator/rse texts mirror relational._kmv_est
    / _kmv_rse with ``k`` substituted, so at the default k the wire
    serves bit-identical estimates to the gate operator."""
    base = (
        f"SELECT 'a' AS name, CAST({col_a} AS STRING) AS val "
        f"FROM {table} WHERE {col_a} IS NOT NULL "
        f"UNION ALL "
        f"SELECT 'b' AS name, CAST({col_b} AS STRING) AS val "
        f"FROM {table} WHERE {col_b} IS NOT NULL"
    )
    dist = (f"SELECT DISTINCT name, {hash60_spark_sql('val')} AS h "
            f"FROM ({base})")
    samples = (
        "SELECT name, h FROM (SELECT name, h, ROW_NUMBER() OVER "
        "(PARTITION BY name ORDER BY h ASC) AS rk "
        f"FROM ({dist})) WHERE rk <= {k}"
    )
    u_s = (f"SELECT h FROM (SELECT DISTINCT h FROM ({samples})) "
           f"ORDER BY h ASC LIMIT {k}")

    def est(ns: str, hk: str) -> str:
        # relational._kmv_est's exact text with k parameterized
        return (f"CASE WHEN {ns} < {k} THEN CAST({ns} AS DOUBLE) "
                f"ELSE {_d(float(k - 1))} * {_d(_KMV_SPACE)} "
                f"/ CAST({hk} AS DOUBLE) END")

    def rse(ns: str) -> str:
        ppm = round(1_000_000 / (k - 2) ** 0.5)
        return (f"CAST(CASE WHEN {ns} < {k} THEN 0 "
                f"ELSE {ppm} END AS BIGINT)")

    ab = (
        "SELECT "
        "CAST(SUM(CASE WHEN name = 'a' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS ns_a, MAX(CASE WHEN name = 'a' THEN h END) AS hk_a, "
        "CAST(SUM(CASE WHEN name = 'b' THEN 1 ELSE 0 END) AS BIGINT) "
        "AS ns_b, MAX(CASE WHEN name = 'b' THEN h END) AS hk_b "
        f"FROM ({samples})"
    )
    u = (f"SELECT CAST(COUNT(*) AS BIGINT) AS ns_u, MAX(h) AS hk_u "
         f"FROM ({u_s})")
    rho = (
        f"SELECT CAST(COUNT(*) AS BIGINT) AS rho FROM ({u_s}) u "
        f"WHERE h IN (SELECT h FROM ({samples}) WHERE name = 'a') "
        f"AND h IN (SELECT h FROM ({samples}) WHERE name = 'b')"
    )
    return (
        f"SELECT {k} AS k, "
        f"{est('ns_a', 'hk_a')} AS a_est, {rse('ns_a')} AS a_rse_ppm, "
        f"{est('ns_b', 'hk_b')} AS b_est, {rse('ns_b')} AS b_rse_ppm, "
        f"{est('ns_u', 'hk_u')} AS union_est, "
        f"{rse('ns_u')} AS union_rse_ppm, "
        f"CAST(rho AS DOUBLE) * ({est('ns_u', 'hk_u')}) "
        f"/ CAST(ns_u AS DOUBLE) AS inter_est "
        f"FROM ({ab}) CROSS JOIN ({u}) CROSS JOIN ({rho})"
    )


def bm25_search_sql(docs: str, id_col: str, text_col: str,
                    queries: str, top_k: int = BM25_TOP_K) -> str:
    """Table-driven BM25 top-k (bm25_search_table's shape, text.py:1932)
    as one Spark-SQL subquery.  ``queries`` is any catalog table with
    (query_id, term) rows — the workload as DATA, the production search
    path.  Columns: query_id, rank, doc_id, score_ppb, n_terms.

    Plan shape mirrors the operator: tokenize -> explode -> broadcast
    the distinct query terms onto the token stream (hinted — non-query
    tokens die at the filter, the corpus never shuffles on raw tokens),
    ONE (doc, dl, term) aggregate, per-term document frequency as an
    unordered window over the matched-pairs frame, broadcast query join,
    integer-ppb contributions (order-independent exact DECIMAL(38,0)
    arithmetic), ONE (query, doc) sum, and the per-query top-k window
    (WindowGroupLimit).  Corpus stats ride a separate narrow scan."""
    toks_expr = TOKENS_SPARK.replace("(text)", f"({text_col})") \
        if text_col != "text" else TOKENS_SPARK
    toks = (
        "SELECT doc_id, CAST(size(tokens) AS BIGINT) AS dl, "
        "explode(tokens) AS term FROM ("
        f"SELECT {id_col} AS doc_id, {toks_expr} AS tokens FROM {docs})"
    )
    tf = (
        "SELECT /*+ BROADCAST(qt) */ doc_id, dl, t.term AS term, "
        "CAST(COUNT(*) AS BIGINT) AS tf FROM "
        f"({toks}) t JOIN (SELECT DISTINCT term FROM {queries}) qt "
        "ON t.term = qt.term GROUP BY doc_id, dl, t.term"
    )
    tfdf = (f"SELECT *, CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) "
            f"AS df FROM ({tf})")
    stats = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
        "CAST(SUM(dl) AS BIGINT) AS t FROM ("
        f"SELECT CAST(size({toks_expr}) AS BIGINT) AS dl FROM {docs})"
    )
    scored = (
        "SELECT /*+ BROADCAST(q) */ q.query_id, f.doc_id, "
        "CAST((CAST((2*(n - df) + 1) AS DECIMAL(38,0)) * 22 * tf"
        " * t * 1000000000)"
        " DIV (CAST((2*df + 1) AS DECIMAL(38,0))"
        " * (10*tf*t + 3*t + 9*dl*n)) AS BIGINT) AS contrib_ppb "
        f"FROM ({tfdf}) f JOIN {queries} q ON f.term = q.term "
        f"CROSS JOIN ({stats})"
    )
    agg = (
        "SELECT query_id, doc_id, SUM(contrib_ppb) AS score_ppb, "
        f"CAST(COUNT(*) AS INT) AS n_terms FROM ({scored}) "
        "GROUP BY query_id, doc_id"
    )
    ranked = (
        "SELECT query_id, doc_id, score_ppb, n_terms, ROW_NUMBER() OVER "
        "(PARTITION BY query_id ORDER BY score_ppb DESC, doc_id ASC) "
        f"AS rank FROM ({agg})"
    )
    return (
        "SELECT query_id, rank, doc_id, score_ppb, n_terms "
        f"FROM ({ranked}) WHERE rank <= {top_k} "
        "ORDER BY query_id, rank"
    )


def _expand_one(fn: str, args: list[str | int]) -> str:
    strs = [a for a in args if isinstance(a, str)]
    ints = [a for a in args if isinstance(a, int)]
    if fn == "hll_distinct":
        if len(strs) < 2:
            raise ValueError("hll_distinct('table', 'col'[, 'col'...][, p])")
        return hll_distinct_sql(strs[0], strs[1:],
                                ints[0] if ints else HLL_P)
    if fn == "hll_grouped":
        if len(strs) < 3:
            raise ValueError(
                "hll_grouped('table', 'group_col', 'col'[, 'col'...][, p])"
            )
        return hll_distinct_sql(strs[0], strs[2:],
                                ints[0] if ints else HLL_GROUP_P,
                                group_col=strs[1])
    if fn == "quantile_sketch":
        if len(strs) != 3:
            raise ValueError(
                "quantile_sketch('table', 'value_col', 'key_col'[, k])"
            )
        return quantile_sketch_sql(*strs, ints[0] if ints else QSK_K)
    if fn == "cms_topk":
        if len(strs) != 2:
            raise ValueError("cms_topk('table', 'text_col'[, w[, d]])")
        w = ints[0] if ints else CMS_PROD_W
        d = ints[1] if len(ints) > 1 else CMS_D
        return cms_topk_sql(strs[0], strs[1], w, d)
    if fn == "cms_grouped":
        if len(strs) != 3:
            raise ValueError(
                "cms_grouped('table', 'group_col', 'text_col'[, w[, d]])"
            )
        w = ints[0] if ints else CMS_PROD_W
        d = ints[1] if len(ints) > 1 else CMS_D
        return cms_grouped_sql(strs[0], strs[1], strs[2], w, d)
    if fn == "quantile_grouped":
        if len(strs) != 4:
            raise ValueError(
                "quantile_grouped('table', 'group_col', 'value_col', "
                "'key_col'[, k])"
            )
        return quantile_grouped_sql(*strs,
                                    ints[0] if ints else QSK_GROUP_K)
    if fn == "bloom_screen":
        if len(strs) != 3 or not ints:
            raise ValueError(
                "bloom_screen('table', 'id_col', 'text_col', split)"
            )
        return bloom_screen_sql(strs[0], strs[1], strs[2], ints[0])
    if fn == "kmv_set_ops":
        if len(strs) != 3:
            raise ValueError(
                "kmv_set_ops('table', 'col_a', 'col_b'[, k])"
            )
        k = ints[0] if ints else KMV_K
        if k < 3:
            raise ValueError("kmv_set_ops: k must be >= 3")
        return kmv_set_ops_sql(strs[0], strs[1], strs[2], k)
    if fn == "bm25_search":
        if len(strs) != 4:
            raise ValueError(
                "bm25_search('docs_table', 'id_col', 'text_col', "
                "'queries_table'[, top_k])"
            )
        return bm25_search_sql(strs[0], strs[1], strs[2], strs[3],
                               ints[0] if ints else BM25_TOP_K)
    raise ValueError(f"unknown sketch table function {fn!r}")


def expand_sketch_calls(sql: str) -> str:
    """Replace every ``FROM/JOIN <sketch_fn>(...)`` with the generated
    derived table.  Runs before the engine qualifies table names, so the
    emitted ``FROM <table>`` resolves through the catalog normally.  A
    no-op (same object) when no sketch call is present, which keeps the
    hot statement path regex-cheap.

    Matching runs on literal-MASKED text (the _qualify discipline), so a
    sketch-call-shaped fragment inside a string literal — e.g. ``WHERE c
    = '... FROM hll_distinct(''a'')'`` — passes through untouched, and
    each substitution gets a unique derived-table alias (``hll_distinct_t1``,
    ``hll_distinct_t2``...) so the same function can appear twice in one
    FROM clause (r15 advice #1/#2)."""
    if not _SKETCH_NAME.search(sql):
        return sql
    masked, stash = mask_literals(sql)
    n_subs = 0

    def sub(m: re.Match) -> str:
        nonlocal n_subs
        fn = m.group(2).lower()
        body = _expand_one(fn, _parse_args(unmask_literals(m.group(3),
                                                           stash)))
        n_subs += 1
        alias = m.group(4) or f"{fn}_t{n_subs}"
        return f"{m.group(1)} ({body}) {alias}"

    out = _SKETCH_CALL.sub(sub, masked)
    if not n_subs:
        return sql
    return unmask_literals(out, stash)
