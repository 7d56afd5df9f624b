"""TPC-H benchmark queries Q1/Q3/Q5/Q6/Q10 — the reference's benchmark set
(/root/reference/benchmarking/_tpch/incresql_runner.rs:355-497), adapted to the
driver's TESTDATA schema (no partsupp; narrower column set; DATE columns stored
as timestamps; money stored as DOUBLE).

Correctness strategy (oracle hash-match): every aggregated money expression is
cast to DECIMAL before summation in BOTH the Spark plan and the DuckDB oracle
SQL.  Decimal addition is exact and associative, so distributed (any-order)
summation produces the identical value the oracle computes single-threaded;
the final result is cast to DOUBLE for a stable, engine-neutral schema.
Averages are computed as exact-decimal sum ÷ bigint count, both cast to DOUBLE
first so the division is a single deterministic IEEE-754 op in both engines.

Every decimal sum is ROUND(·, 2)-ed (both engines round ties half-away-from-
zero — verified) before the DOUBLE cast: high-scale products (e.g. Q1's
charge expression at scale 6) can push a global sum's unscaled value past
2^53, where Spark's correctly-rounded BigDecimal→double and DuckDB's
int128/10^scale conversion can disagree by one ulp (observed at a tiled sf1:
27864155010.941593 vs ...93).  Rounding to scale 2 keeps the unscaled value
exact in a double up to ~9e13 money units per group, so both conversions are
a single exact division.  Per-key aggregates (Q3/Q10/Q15/Q18/Q20) have
SF-constant group magnitudes under key-shifted tiling and stay safe.

Scale notes (the plans Catalyst produces, verified via .explain in tests):
- Q1/Q6: pure scan→partial-agg→final-agg; filter + column pruning reach the
  parquet reader (PushedFilters / ReadSchema).
- Q3/Q5/Q10: the dimension sides (region/nation/customer/supplier) are tiny
  relative to lineitem at every scale factor, and fall under the broadcast
  threshold → broadcast hash joins, no shuffle of the fact table until the
  final group-by.  orders↔lineitem is the only big-big join and shuffles on
  the join key, which is also the natural partitioning for the downstream
  group-by (no second shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .catalog import load_table

# Exact-decimal casts (money fits DECIMAL(12,2) at every TPC-H scale factor;
# rates (discount/tax) fit DECIMAL(4,2)).
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_ONE_MINUS_DISC = "CAST(1.0 - l_discount AS DECIMAL(4,2))"
_ONE_PLUS_TAX = "CAST(1.0 + l_tax AS DECIMAL(4,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"

# sum(l_extendedprice * (1 - l_discount)) — the workhorse "revenue" expression.
REVENUE_EXPR = f"{_PRICE} * {_ONE_MINUS_DISC}"

# ---------------------------------------------------------------------------
# Integer money layer (Spark side only — the oracle SQL keeps the decimal
# spec above; both produce bit-identical doubles because each computes
# round(exact_sum, 2)).
#
# Why: Spark's Decimal switches from a long to a BigDecimal backing beyond
# 18 digits of precision, and SUM over decimal inputs always lands there
# (sum precision = input + 10), so every revenue aggregation allocates and
# adds BigDecimals per row — measured 2.8× slower than long math on Q1.
# All money values in the corpus are exact at ≤ 2 decimals, so a row
# converts exactly to integer units (cents; 1e-4 $ after × (100-disc);
# 1e-6 $ after × (100+tax)) and every product/sum below is exact int64.
#
# Overflow strategy (the part that must survive 100 TB): a per-row product
# can reach ~1e11 units, so a single int64 SUM would overflow at ~1e8 rows
# per group.  Instead each product is split into (hi, lo) = (v div 1e6,
# v % 1e6) and the two parts are summed separately — bounds: |sum(hi)| <
# 9.2e18 needs ~1e13 rows per group (≈ exabytes), |sum(lo)| < 9.2e18 needs
# ~9e12 rows.  The parts recombine per GROUP (a handful of rows) in
# DECIMAL(38,0), are rounded to cents with the sign-aware +/- half `div`
# (Spark's div truncates toward zero, so this is exactly ROUND's
# half-away-from-zero), and emitted as an exact double.  Plain-cent sums
# (qty, price, disc) skip the split: their per-row magnitude ≤ 1e7 keeps a
# single int64 safe past sf100k.
_SPLIT = 1_000_000

_PRICE_C = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"  # cents
_QTY_C = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
_DISC_C = "CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"  # hundredths
_TAX_C = "CAST(floor(l_tax * 100 + 0.5) AS BIGINT)"
#: revenue per row in 1e-4 $ units
REV4_INT = f"{_PRICE_C} * (100 - {_DISC_C})"
#: charge per row in 1e-6 $ units
CHARGE6_INT = f"{REV4_INT} * (100 + {_TAX_C})"


def money_split_aggs(name: str, row_expr: str) -> list:
    """Split-accumulator SUM of an integer-unit row expression: two int64
    aggregate columns that recombine exactly via :func:`money_out`."""
    return [
        F.sum(F.expr(f"({row_expr}) div {_SPLIT}")).alias(f"_{name}_hi"),
        F.sum(F.expr(f"({row_expr}) % {_SPLIT}")).alias(f"_{name}_lo"),
    ]


def money_out(name: str, unit_scale: int):
    """Exact total from the split pair, rounded half-away to cents, as
    dollars in a double (exact: cents < 2^53 up to ~$9e13 per group)."""
    s = f"(CAST(_{name}_hi AS DECIMAL(38,0)) * {_SPLIT} + _{name}_lo)"
    if unit_scale == 2:
        cents = s
    else:
        denom = 10 ** (unit_scale - 2)
        half = denom // 2
        cents = (
            f"(({s}) + (CASE WHEN {s} >= 0 THEN {half} ELSE -{half} END)) "
            f"div {denom}"
        )
    return F.expr(f"CAST({cents} AS DOUBLE) / 100.0")


def cents_out(sum_col: str):
    """Plain-cent int64 sum → exact dollars as double."""
    return F.expr(f"CAST({sum_col} AS DOUBLE) / 100.0")


def plain4_out(sum_col: str):
    """Unsplit 1e-4-unit int64 sum → round-half-away to cents → exact double
    dollars.  For PER-KEY aggregates only (order/customer/supplier keys):
    key-shifted tiling keeps those group magnitudes SF-constant, so a single
    int64 (overflow at ~9e9 rows per group) never splits."""
    return F.expr(
        f"CAST(({sum_col} + (CASE WHEN {sum_col} >= 0 THEN 50 ELSE -50 END)) "
        f"div 100 AS DOUBLE) / 100.0"
    )


def q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (incresql_runner.rs:355-380).

    All sums run on the integer money layer (exact int64 per row, split
    accumulators for the scale-4/6 products — see the layer comment above);
    the emitted doubles equal the oracle's round(decimal_sum, 2) exactly."""
    l = load_table(spark, sf_dir, "lineitem")
    cnt = F.col("count_order").cast("double")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.expr(_QTY_C)).alias("_qty_c"),
            F.sum(F.expr(_PRICE_C)).alias("_price_c"),
            F.sum(F.expr(_DISC_C)).alias("_disc_c"),
            *money_split_aggs("rev", REV4_INT),
            *money_split_aggs("chg", CHARGE6_INT),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            cents_out("_qty_c").alias("sum_qty"),
            cents_out("_price_c").alias("sum_base_price"),
            money_out("rev", 4).alias("sum_disc_price"),
            money_out("chg", 6).alias("sum_charge"),
            (cents_out("_qty_c") / cnt).alias("avg_qty"),
            (cents_out("_price_c") / cnt).alias("avg_price"),
            (cents_out("_disc_c") / cnt).alias("avg_disc"),
            "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


Q1_SQL = f"""
SELECT l_returnflag,
       l_linestatus,
       CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE)                                        AS sum_qty,
       CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE)                                      AS sum_base_price,
       CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE)                                AS sum_disc_price,
       CAST(ROUND(SUM({_PRICE} * {_ONE_MINUS_DISC} * {_ONE_PLUS_TAX}), 2) AS DOUBLE) AS sum_charge,
       CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)             AS avg_qty,
       CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)           AS avg_price,
       CAST(ROUND(SUM({_DISC}), 2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)            AS avg_disc,
       COUNT(*)                                                           AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping priority: top-10 unshipped orders by revenue
    (incresql_runner.rs:382-407; o_shippriority not in TESTDATA → omitted)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    cutoff = F.lit("1998-03-15").cast("timestamp")
    # Aggregate lineitem revenue per orderkey BEFORE any join: map-side
    # partials collapse an order's line items before the shuffle, and the
    # join sees one row per unshipped order instead of raw line items
    # (orderkey is unique in orders, so agg-then-join is exact).  The
    # customer side is a pure filter — a semi-join carries no payload.
    rev = (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .groupBy("l_orderkey")
        .agg(F.sum(F.expr(REV4_INT)).alias("_rev4"))
    )
    return (
        rev.join(
            orders.filter(F.col("o_orderdate") < cutoff),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            customer.filter(F.col("c_mktsegment") == "BUILDING"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_semi",
        )
        .select("l_orderkey", "o_orderdate", plain4_out("_rev4").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("o_orderdate").asc(), F.col("l_orderkey").asc())
        .limit(10)
    )


Q3_SQL = f"""
SELECT l_orderkey,
       o_orderdate,
       CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, o_orderdate ASC, l_orderkey ASC
LIMIT 10
"""


def q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local supplier volume: revenue by nation within one region/year
    (incresql_runner.rs:409-437)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    return (
        region.filter(F.col("r_name") == "ASIA")
        .join(nation, F.col("n_regionkey") == F.col("r_regionkey"))
        .join(supplier, F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            lineitem,
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
            ),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .join(
            load_table(spark, sf_dir, "customer"),
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .groupBy("n_name")
        .agg(*money_split_aggs("rev", REV4_INT))
        .select("n_name", money_out("rev", 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


Q5_SQL = f"""
SELECT n_name,
       CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE) AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN lineitem ON l_suppkey = s_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
"""


def q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting revenue change: scan + filter + global agg
    (incresql_runner.rs:439-452)."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        ).agg(*money_split_aggs("rev", f"{_PRICE_C} * {_DISC_C}")).select(
            money_out("rev", 4).alias("revenue")
        )
    )


Q6_SQL = f"""
SELECT CAST(ROUND(SUM({_PRICE} * {_DISC}), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""


def q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned item reporting: top-20 customers by lost revenue
    (incresql_runner.rs:454-497; address/phone/comment not in TESTDATA)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    nation = load_table(spark, sf_dir, "nation")
    # Pre-aggregate revenue per custkey from the two FILTERED facts before
    # customer is touched: c_custkey is unique, so agg-then-join equals
    # join-then-agg exactly, but the customer payload columns never ride
    # through the lineitem shuffle and the final join's left side is one
    # row per buying customer (AQE typically broadcasts it).  Catalyst does
    # not push aggregates below joins itself — this ordering is the
    # manual version of that rewrite.
    rev = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("o_custkey")
        .agg(F.sum(F.expr(REV4_INT)).alias("_rev4"))
    )
    return (
        rev.join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(nation, F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            "c_acctbal",
            "n_name",
            plain4_out("_rev4").alias("revenue"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


Q10_SQL = f"""
SELECT c_custkey,
       c_name,
       c_acctbal,
       n_name,
       CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE) AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON n_nationkey = c_nationkey
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND l_returnflag = 'R'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""


def q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 adapted: the commitdate/receiptdate
    pair isn't in TESTDATA, so the EXISTS predicate is "some line shipped
    after the order date").  Exercises a correlated EXISTS → left-semi join;
    Catalyst plans a broadcast/shuffled semi join with the extra non-equi
    condition inside, so lineitem is never widened — at 100 TB the probe
    stays one pass."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    o_f = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01").cast("timestamp"))
    )
    semi = o_f.join(
        l,
        (o_f.o_orderkey == l.l_orderkey) & (l.l_shipdate > o_f.o_orderdate),
        "left_semi",
    )
    return (
        semi.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
        .orderBy("o_orderpriority")
    )


Q4_SQL = """
SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


def q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority classes (TPC-H Q12 adapted: no l_shipmode column,
    so lines group by l_linestatus).  Conditional aggregation — the CASE
    folds into the partial aggregate, one shuffle total."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
ORDER BY l_linestatus
"""


def q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14: % of revenue from PROMO parts).  No
    forced broadcast — part grows with SF, so AQE picks broadcast vs
    shuffle from runtime sizes; revenue sums are exact decimal, the final
    ratio one double division (oracle-stable)."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    promo_rev4 = f"CASE WHEN p_type = 'PROMO' THEN {REV4_INT} ELSE 0L END"
    return (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01").cast("timestamp"))
        )
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .agg(
            *money_split_aggs("promo", promo_rev4),
            *money_split_aggs("rev", REV4_INT),
        )
        .select(
            # oracle numerator is CAST(100 * ROUND(sum, 2) AS DOUBLE), i.e.
            # exactly double(promo_cents); build that directly rather than
            # 100 * (cents / 100.0), which double-rounds
            (
                F.expr(
                    "CAST((CAST(_promo_hi AS DECIMAL(38,0)) * 1000000 "
                    "+ _promo_lo + 50) div 100 AS DOUBLE)"
                )
                / money_out("rev", 4)
            ).alias("promo_revenue")
        )
    )


Q14_SQL = f"""
SELECT CAST(100 * ROUND(SUM(CASE WHEN p_type = 'PROMO' THEN {REVENUE_EXPR}
                           ELSE 0 END), 2) AS DOUBLE)
       / CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE) AS promo_revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


def q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 adapted: supplier-nation ↔ customer-nation
    trade flows by ship year, between two fixed nations).  Both nation dims
    broadcast twice under different aliases; the only big-big join is
    lineitem⋈orders on the key both sides already shuffle for."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(*money_split_aggs("rev", REV4_INT))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            money_out("rev", 4).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


Q7_SQL = f"""
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
       CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
   OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
GROUP BY n1.n_name, n2.n_name, EXTRACT(year FROM l_shipdate)
ORDER BY supp_nation, cust_nation, l_year
"""


Q18_QTY_THRESHOLD = 120


def q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18): orders whose total quantity
    exceeds a threshold, joined back to customer detail.  The HAVING-style
    aggregate produces a tiny key set that Catalyst/AQE broadcasts for the
    join back — the fact table is scanned twice but shuffled once."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(F.expr(_QTY_C)).alias("_qty_c"))
        # integer-exact threshold: cents > dollars × 100
        .filter(F.col("_qty_c") > Q18_QTY_THRESHOLD * 100)
    )
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate").cast("date").alias("o_date"),
            "o_totalprice",
            cents_out("_qty_c").alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


Q18_SQL = f"""
SELECT c_custkey, c_name, o_orderkey,
       CAST(o_orderdate AS DATE) AS o_date,
       o_totalprice,
       CAST(total_qty AS DOUBLE) AS total_qty
FROM (
  SELECT l_orderkey, SUM({_QTY}) AS total_qty
  FROM lineitem GROUP BY l_orderkey
  HAVING SUM({_QTY}) > {Q18_QTY_THRESHOLD}
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
"""


def q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier(s) (TPC-H Q15: suppliers whose quarterly revenue equals
    the maximum — the reference would need a view + subquery; here a window
    max over the aggregate avoids a second scan entirely)."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    rev = (
        l.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(F.expr(REV4_INT)).alias("_rev4"))
    )
    # a global window would single-partition the aggregate; the scalar max
    # broadcast back in keeps every stage distributed
    mx = rev.agg(F.max("_rev4").alias("_max4"))
    top = rev.join(F.broadcast(mx), F.col("_rev4") == F.col("_max4"))
    return (
        top.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            # oracle emits the UNROUNDED scale-4 total: double(s4)/1e4 is
            # the same correctly-rounded double as decimal(·,4) → double
            F.expr("CAST(_rev4 AS DOUBLE) / 10000.0").alias("total_rev"),
        )
        .orderBy("s_suppkey")
    )


Q15_SQL = f"""
WITH rev AS (
  SELECT l_suppkey, SUM({REVENUE_EXPR}) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_rev = (SELECT max(total_rev) FROM rev)
ORDER BY s_suppkey
"""


def q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 adapted: OR-of-ANDs over brand, size
    and quantity bands).  The disjunction references both join sides, so
    only the common `p_partkey = l_partkey` key extracts; the residual OR
    evaluates inside the equi join (AQE broadcasts part when it fits) — no
    fact-table blowup."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    band = (
        (
            (F.col("p_brand") == "Brand#1")
            & (F.col("p_size").between(1, 15))
            & (F.col("l_quantity").between(1, 11))
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & (F.col("p_size").between(1, 25))
            & (F.col("l_quantity").between(10, 20))
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & (F.col("p_size").between(1, 35))
            & (F.col("l_quantity").between(20, 30))
        )
    )
    return (
        l.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(band)
        .agg(*money_split_aggs("rev", REV4_INT))
        .select(money_out("rev", 4).alias("revenue"))
    )


Q19_SQL = f"""
SELECT CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35
       AND l_quantity BETWEEN 20 AND 30)
"""


def q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 adapted to TESTDATA: p_type is a
    single word, nations are NATION_k).  Share of NATION_1 suppliers in
    AMERICA-region customer revenue for ECONOMY parts, by order year.

    Plan shape: nation×2/region force-broadcast (fixed size); part,
    supplier and customer grow with SF so AQE decides their join strategy
    at runtime; lineitem⋈orders is the only guaranteed shuffle.  The share
    division happens on two exact-decimal sums per year-group, cast to
    double for one deterministic IEEE division — same fold as the oracle."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    vol4 = f"CASE WHEN supp_nation = 'NATION_1' THEN {REV4_INT} ELSE 0L END"
    return (
        l.join(
            o.filter(
                F.col("o_orderdate").between(
                    F.lit("1995-01-01").cast("timestamp"),
                    F.lit("1996-12-31").cast("timestamp"),
                )
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nkey"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            *money_split_aggs("nat", vol4),
            *money_split_aggs("rev", REV4_INT),
        )
        .select(
            "o_year",
            (money_out("nat", 4) / money_out("rev", 4)).alias("mkt_share"),
        )
        .orderBy("o_year")
    )


Q8_SQL = f"""
SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM(CASE WHEN n2.n_name = 'NATION_1' THEN {REVENUE_EXPR}
                     ELSE CAST(0 AS DECIMAL(17,4)) END), 2) AS DOUBLE)
         / CAST(ROUND(SUM({REVENUE_EXPR}), 2) AS DOUBLE) AS mkt_share
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
  AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                      AND TIMESTAMP '1996-12-31 00:00:00'
GROUP BY EXTRACT(year FROM o_orderdate)
ORDER BY o_year
"""


# TESTDATA has no partsupp → no ps_supplycost; Q9's cost model is adapted to
# half the part's list price (decimal-exact, same expression both engines).
_COST = "CAST(p_retailprice AS DECIMAL(12,2)) * CAST(0.5 AS DECIMAL(2,1))"


def q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 adapted: supply cost proxied as
    p_retailprice/2 since TESTDATA has no partsupp; part filter on a name
    substring).  Profit aggregates per supplier nation × order year.

    nation force-broadcasts; part/supplier are SF-scaled so AQE chooses
    their strategy; lineitem⋈orders shuffles once on the order key; the
    final group-by is a second small shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").contains("red"))
    # profit per row in 1e-5 $ units: rev (1e-4 → ×10) minus cost×qty
    # ((retail_c/200)·(qty_c/100) $ → ×1e5 = 5·retail_c·qty_c); can be
    # negative per row, which money_out's sign-aware rounding handles
    retail_c = "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)"
    amount5 = f"10 * ({REV4_INT}) - 5 * {retail_c} * {_QTY_C}"
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(*money_split_aggs("amt", amount5))
        .select("nation", "o_year", money_out("amt", 5).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


Q9_SQL = f"""
SELECT n_name AS nation,
       CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
       CAST(ROUND(SUM({REVENUE_EXPR} - {_COST} * {_QTY}), 2) AS DOUBLE) AS sum_profit
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN part     ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, EXTRACT(year FROM o_orderdate)
ORDER BY nation ASC, o_year DESC
"""


def q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (TPC-H Q13 adapted: the o_comment
    NOT LIKE exclusion becomes an o_orderpriority exclusion — TESTDATA has
    no comment column).  LEFT OUTER join with the exclusion INSIDE the join
    condition (so excluded-order customers still appear with count 0),
    then a two-level aggregation: per-customer count → histogram.

    Scale: customer⋈orders shuffles on custkey, which is also the first
    group-by key (no extra shuffle); the histogram aggregate is tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(
            o,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


Q13_SQL = """
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c_custkey, COUNT(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) per_cust
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""


def q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 adapted: the p_container
    filter becomes p_brand + p_size — TESTDATA has no container column).
    The correlated subquery `l_quantity < 0.2 * avg(l_quantity per part)`
    decorrelates with semi-join pushdown: the selective part filter joins
    the fact table FIRST, so the per-part average aggregates only the
    qualifying parts' lineitems (identical values — the filter is a pure
    part-key predicate).  At 100 TB this keeps the aggregate bounded by the
    filtered part count instead of every distinct partkey; no explicit
    broadcast of the fact-derived aggregate — the probe join shuffles on
    l_partkey (reusing the aggregate's own partitioning) and AQE demotes it
    to broadcast when the runtime size allows.

    The avg is exact-decimal sum ÷ bigint count, both cast to double, then
    one double multiply by 0.2 — bit-identical to the oracle's fold."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#1") & (F.col("p_size") < 10)
    )
    lq = l.join(p, F.col("l_partkey") == F.col("p_partkey"))
    per_part = lq.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.expr("CAST(sum(" + _QTY_C + ") AS DOUBLE) / 100.0")
            / F.count(F.lit(1)).cast("double")
        ).alias("avg_qty")
    )
    return (
        lq.join(per_part, F.col("l_partkey") == F.col("a_partkey"))
        .filter(F.col("l_quantity").cast("double") < 0.2 * F.col("avg_qty"))
        .agg(F.sum(F.expr(_PRICE_C)).alias("_price_c"))
        .select((cents_out("_price_c") / F.lit(7.0)).alias("avg_yearly"))
    )


Q17_SQL = f"""
SELECT CAST(ROUND(SUM({_PRICE}), 2) AS DOUBLE) / 7.0 AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN (
  SELECT l_partkey AS a_partkey,
         CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avg_qty
  FROM lineitem GROUP BY l_partkey
) a ON a_partkey = l_partkey
WHERE p_brand = 'Brand#1' AND p_size < 10
  AND CAST(l_quantity AS DOUBLE) < 0.2 * avg_qty
"""


# TESTDATA has no l_commitdate/l_receiptdate; "late" is adapted to shipping
# more than 60 days after the order date.
_LATE_DAYS = 60


def q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 adapted: lateness =
    shipped >60 days after order date; no nation filter — TESTDATA has only
    100 suppliers).  The EXISTS / NOT-EXISTS pair decorrelates into one
    per-(order, supplier) aggregate and one per-order rollup: a supplier
    qualifies in an order iff it was late, the order has ≥2 suppliers, and
    it is the ONLY late supplier.

    Scale: ONE fact-side shuffle — the explicit repartition on l_orderkey
    satisfies the (l_orderkey, l_suppkey) grouping (hash partitioning on a
    key subset clusters the superset) AND the per-order window, so the
    exchange is planned once and reused (A/B at sf0.1: 5 → 4 exchanges,
    1.26s → 1.10s min-of-5).  Supplier joins without a forced hint
    (AQE-sized); no correlated re-scan of the fact table — the classic
    Spark decorrelation of double-EXISTS."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr(
        f"INTERVAL {_LATE_DAYS} DAYS"
    )
    supp_ord = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("is_late", late)
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max("is_late").alias("supp_late"),
            F.sum(F.when(F.col("is_late"), 1).otherwise(0)).alias("n_late_rows"),
        )
    )
    # per-order rollup as a window over the supplier aggregate (one shuffle,
    # no join-back; order groups are a handful of suppliers at any SF)
    w = Window.partitionBy("l_orderkey")
    enriched = supp_ord.withColumn(
        "n_supp", F.count(F.lit(1)).over(w)
    ).withColumn("n_late_supp", F.sum(F.col("supp_late").cast("int")).over(w))
    return (
        enriched
        .filter(F.col("supp_late") & (F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("n_late_rows").alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


Q21_SQL = f"""
SELECT s_name, COUNT(*) AS numwait
FROM lineitem l1
JOIN orders   ON o_orderkey = l1.l_orderkey
JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE o_orderstatus = 'F'
  AND l1.l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o_orderdate + INTERVAL {_LATE_DAYS} DAY
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 100
"""


# TESTDATA has no c_phone; Q22's country code is adapted to c_nationkey,
# and "no orders in 7 years" to "no orders since 1998-01-01" (every
# customer has *some* order in the synthetic data).
_Q22_CODES = (0, 2, 4, 11, 13, 16, 22)
_Q22_CUTOFF = "1998-01-01"
_BAL = "CAST(c_acctbal AS DECIMAL(12,2))"


def q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sales opportunity (TPC-H Q22 adapted: country code =
    c_nationkey, phone substring gone).  Rich customers (balance above the
    positive-balance average of their code group) who never placed an
    recent order, counted per country code.

    The scalar average broadcasts (literal cross join); customers-without-
    recent-orders is a LEFT ANTI join on o_custkey — at scale that anti
    join shuffles both sides once on the key; everything else is tiny."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit(_Q22_CUTOFF).cast("timestamp")
    )
    eligible = c.filter(
        F.col("c_nationkey").isin(*_Q22_CODES) & (F.col("c_acctbal") > 0.0)
    ).select(
        "c_custkey",
        F.col("c_nationkey").alias("cntrycode"),
        F.expr(_BAL).alias("bal"),
    )
    avg_bal = eligible.agg(
        (F.round(F.sum("bal"), 2).cast("double") / F.count(F.lit(1)).cast("double")).alias(
            "avg_bal"
        )
    )
    return (
        eligible.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("bal").cast("double") > F.col("avg_bal"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.round(F.sum("bal"), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("cntrycode")
    )


Q22_SQL = f"""
WITH eligible AS (
  SELECT c_custkey, c_nationkey AS cntrycode, {_BAL} AS bal
  FROM customer
  WHERE c_nationkey IN {_Q22_CODES} AND c_acctbal > 0.0
)
SELECT cntrycode, COUNT(*) AS numcust, CAST(ROUND(SUM(bal), 2) AS DOUBLE) AS totacctbal
FROM eligible
WHERE CAST(bal AS DOUBLE) > (
    SELECT CAST(ROUND(SUM(bal), 2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) FROM eligible
  )
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '{_Q22_CUTOFF} 00:00:00'
  )
GROUP BY cntrycode
ORDER BY cntrycode
"""


# TESTDATA has no partsupp table.  Q2/Q11/Q16/Q20 adapt by deriving the
# part↔supplier relation from observed lineitem shipments (DISTINCT
# (l_partkey, l_suppkey)) — at scale one shuffle on the pair key, after
# which each query's dimensions broadcast.
_PAIRS_SQL = "SELECT DISTINCT l_partkey, l_suppkey FROM lineitem"


def q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 adapted: supplier cost proxied by
    s_acctbal, part filter on size, EUROPE region; partsupp derived from
    lineitem).  The correlated MIN decorrelates into a per-part aggregate
    joined back on (partkey, balance) equality.

    Shape notes (measured 1.8s → 1.0s at sf0.1):
    - the part filter applies BEFORE the pair-distinct, so the distinct
      shuffles ~2% of the pairs instead of all of them (equivalent: p_partkey
      is unique, so join-then-distinct == distinct-then-join, and the p
      attributes are functionally dependent on the key);
    - the correlated MIN is a window over p_partkey instead of an aggregate
      joined back — one shuffle, and the cand subtree is computed once
      rather than twice.  Per-part groups are a handful of suppliers at any
      SF, so the window sort is trivial and never skews.
    - no forced broadcast of p/s (both SF-scaled); AQE picks the strategy."""
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15)
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    l = load_table(spark, sf_dir, "lineitem")
    cand = (
        l.select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", "p_partkey", "p_brand")
        .distinct()
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("p_partkey", "p_brand", "s_acctbal", "s_name", "n_name")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_bal", F.min("s_acctbal").over(w))
        .filter(F.col("s_acctbal") == F.col("min_bal"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_brand")
        .orderBy(
            F.col("s_acctbal").desc(),
            F.col("n_name").asc(),
            F.col("s_name").asc(),
            F.col("p_partkey").asc(),
        )
        .limit(100)
    )


Q2_SQL = f"""
WITH pairs AS ({_PAIRS_SQL}),
cand AS (
  SELECT p_partkey, p_brand, s_acctbal, s_name, n_name
  FROM pairs
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE' AND p_size = 15
),
mins AS (SELECT p_partkey AS m_partkey, MIN(s_acctbal) AS min_bal
         FROM cand GROUP BY p_partkey)
SELECT s_acctbal, s_name, n_name, p_partkey, p_brand
FROM cand JOIN mins ON p_partkey = m_partkey AND s_acctbal = min_bal
ORDER BY s_acctbal DESC, n_name ASC, s_name ASC, p_partkey ASC
LIMIT 100
"""


_Q11_NATIONS = ("NATION_1", "NATION_6")
_Q11_FRACTION = 0.001


def q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock identification (TPC-H Q11 adapted: per-part "value"
    is shipped extended price from a nation group's suppliers; the HAVING
    threshold is a fraction of the grand total).  The scalar total comes
    back as a broadcast cross join — both aggregations share the single
    lineitem shuffle; no global single-partition stage."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name").isin(*_Q11_NATIONS))
    val = (
        l.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.sum(F.expr(_PRICE_C)).alias("_val_c"))
    )
    total = val.agg(
        (F.expr("CAST(sum(_val_c) AS DOUBLE) / 100.0") * _Q11_FRACTION).alias(
            "threshold"
        )
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(cents_out("_val_c") > F.col("threshold"))
        .select("partkey", cents_out("_val_c").alias("value"))
        .orderBy(F.col("value").desc(), F.col("partkey").asc())
    )


Q11_SQL = f"""
WITH val AS (
  SELECT l_partkey AS partkey, SUM({_PRICE}) AS val
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name IN {_Q11_NATIONS}
  GROUP BY l_partkey
)
SELECT partkey, CAST(val AS DOUBLE) AS value
FROM val
WHERE CAST(val AS DOUBLE) >
      (SELECT CAST(ROUND(SUM(val), 2) AS DOUBLE) * {_Q11_FRACTION} FROM val)
ORDER BY value DESC, partkey ASC
"""


_Q16_SIZES = (1, 4, 9, 14, 19, 24, 29)


def q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts/supplier relationship (TPC-H Q16 adapted: the complaint-
    comment supplier exclusion becomes negative account balance; partsupp
    derived from lineitem).  The NOT IN subquery is a broadcast LEFT ANTI
    join; COUNT(DISTINCT) rides the same (brand, type, size) shuffle."""
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(*_Q16_SIZES)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0.0)
    # No pre-distinct on the (partkey, suppkey) pairs: COUNT(DISTINCT)
    # already dedups via its partial (brand,type,size,suppkey) aggregate,
    # so a distinct beforehand is a second full shuffle of the same volume
    # for nothing (measured 0.90s -> 0.58s at sf0.1; at scale it saves an
    # entire pair-keyed exchange).
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey")
        .join(p, F.col("l_partkey") == F.col("p_partkey"))
        .join(
            bad,
            F.col("l_suppkey") == F.col("s_suppkey"),
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
            F.col("p_size").asc(),
        )
    )


Q16_SQL = f"""
WITH pairs AS ({_PAIRS_SQL})
SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
FROM pairs
JOIN part ON p_partkey = l_partkey
WHERE p_brand <> 'Brand#5'
  AND p_size IN {_Q16_SIZES}
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC, p_size ASC
"""


def q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Potential part promotion (TPC-H Q20 adapted: "excess stock" becomes
    shipment concentration — a (supplier, part) pair qualifies when more
    than half its lifetime quantity of a red* part shipped during 1996;
    suppliers are restricted to the ASIA region).  The correlated
    subquery-of-sums decorrelates into one conditional aggregation; the
    supplier EXISTS is a LEFT SEMI join.

    Scale: one shuffle on (partkey, suppkey) for the aggregate;
    nation/region force-broadcast, part and supplier are AQE-sized."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").startswith("red"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    in_1996 = F.col("l_shipdate").between(
        F.lit("1996-01-01").cast("timestamp"), F.lit("1996-12-31").cast("timestamp")
    )
    zero = F.lit(0).cast("decimal(12,2)")
    qual = (
        l.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.sum(F.when(in_1996, F.expr(_QTY)).otherwise(zero)).alias("qty_1996"),
            F.sum(F.expr(_QTY)).alias("qty_total"),
        )
        .filter(
            F.col("qty_1996").cast("double") > 0.5 * F.col("qty_total").cast("double")
        )
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(qual, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_suppkey", "s_name", "s_acctbal")
        .orderBy("s_suppkey")
    )


Q20_SQL = f"""
SELECT s_suppkey, s_name, s_acctbal
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND EXISTS (
    SELECT 1
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE l_suppkey = s_suppkey AND p_name LIKE 'red%'
    GROUP BY l_partkey, l_suppkey
    HAVING CAST(ROUND(SUM(CASE WHEN l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                                             AND TIMESTAMP '1996-12-31 00:00:00'
                         THEN {_QTY} ELSE CAST(0 AS DECIMAL(12,2)) END), 2) AS DOUBLE)
           > 0.5 * CAST(ROUND(SUM({_QTY}), 2) AS DOUBLE)
  )
ORDER BY s_suppkey
"""


QUERIES = {
    "tpch_q1": q1,
    "tpch_q2": q2,
    "tpch_q3": q3,
    "tpch_q4": q4,
    "tpch_q5": q5,
    "tpch_q6": q6,
    "tpch_q7": q7,
    "tpch_q8": q8,
    "tpch_q9": q9,
    "tpch_q10": q10,
    "tpch_q11": q11,
    "tpch_q13": q13,
    "tpch_q12": q12,
    "tpch_q14": q14,
    "tpch_q15": q15,
    "tpch_q16": q16,
    "tpch_q17": q17,
    "tpch_q18": q18,
    "tpch_q19": q19,
    "tpch_q20": q20,
    "tpch_q21": q21,
    "tpch_q22": q22,
}

ORACLE = {
    "tpch_q1": Q1_SQL,
    "tpch_q2": Q2_SQL,
    "tpch_q3": Q3_SQL,
    "tpch_q4": Q4_SQL,
    "tpch_q5": Q5_SQL,
    "tpch_q6": Q6_SQL,
    "tpch_q7": Q7_SQL,
    "tpch_q8": Q8_SQL,
    "tpch_q9": Q9_SQL,
    "tpch_q10": Q10_SQL,
    "tpch_q11": Q11_SQL,
    "tpch_q13": Q13_SQL,
    "tpch_q12": Q12_SQL,
    "tpch_q14": Q14_SQL,
    "tpch_q15": Q15_SQL,
    "tpch_q16": Q16_SQL,
    "tpch_q17": Q17_SQL,
    "tpch_q18": Q18_SQL,
    "tpch_q19": Q19_SQL,
    "tpch_q20": Q20_SQL,
    "tpch_q21": Q21_SQL,
    "tpch_q22": Q22_SQL,
}
