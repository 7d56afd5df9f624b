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
    SELECT * FROM cms_topk('documents', 'text')               -- w=2^20,d=4

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

from .functions.hashing import hash60_spark_sql
from .operators.relational import (
    HLL_GROUP_P,
    HLL_P,
    QSK_K,
    QSK_QS,
    _hll_spark,
)
from .operators.text import (
    CMS_BOTTOM,
    CMS_D,
    CMS_PROD_W,
    CMS_TOP,
    TOKENS_SPARK,
    _cms_bucket_spark,
    _cms_seeds,
)

_SKETCH_CALL = re.compile(
    r"\b(FROM|JOIN)\s+(hll_distinct|hll_grouped|quantile_sketch|cms_topk)"
    r"\s*\(([^()]*)\)",
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
    estimate).  The sample subquery appears twice, so the generated plan
    scans the table three times (sample x2 + count) — the DataFrame
    operator remains the single-pass production path; this surface
    trades a rescan for pure-SQL embeddability."""
    base = (f"SELECT {value_col} AS v, "
            f"{hash60_spark_sql(f'CAST({key_col} AS STRING)')} AS h "
            f"FROM {table} WHERE {value_col} IS NOT NULL")
    samp = f"SELECT v, h FROM ({base}) ORDER BY h ASC, v ASC LIMIT {k}"
    qs = ", ".join(str(q) for q in QSK_QS)
    return (
        "SELECT qf.q_pct, qf.n, qf.sample_n, sr.v AS est_value FROM ("
        "SELECT t.n, s.sample_n, q.q_pct, "
        "(q.q_pct * s.sample_n + 99) DIV 100 AS r_s "
        f"FROM (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ({base})) t "
        f"CROSS JOIN (SELECT CAST(COUNT(*) AS BIGINT) AS sample_n "
        f"FROM ({samp})) s "
        f"CROSS JOIN (SELECT explode(array({qs})) AS q_pct) q"
        ") qf JOIN ("
        "SELECT v, ROW_NUMBER() OVER (ORDER BY v ASC, h ASC) AS rs "
        f"FROM ({samp})"
        ") sr ON sr.rs = qf.r_s ORDER BY qf.q_pct"
    )


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
    return (
        f"SELECT tok, exact_cnt, cms_est, cms_est - exact_cnt AS "
        f"overestimate FROM ("
        f"SELECT p.tok, p.exact_cnt, MIN(COALESCE(s.c, 0)) AS cms_est "
        f"FROM ({probes}) p LEFT JOIN ({sketch}) s "
        f"ON p.i = s.i AND p.b = s.b GROUP BY p.tok, p.exact_cnt"
        f") ORDER BY exact_cnt DESC, tok ASC"
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
    raise ValueError(f"unknown sketch table function {fn!r}")


def expand_sketch_calls(sql: str) -> str:
    """Replace every ``FROM/JOIN <sketch_fn>(...)`` with the generated
    derived table.  Runs before the engine qualifies table names, so the
    emitted ``FROM <table>`` resolves through the catalog normally.  A
    no-op (same object) when no sketch call is present, which keeps the
    hot statement path regex-cheap."""

    def sub(m: re.Match) -> str:
        fn = m.group(2).lower()
        body = _expand_one(fn, _parse_args(m.group(3)))
        return f"{m.group(1)} ({body}) {fn}_t"

    return _SKETCH_CALL.sub(sub, sql)
