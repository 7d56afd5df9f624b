"""TPC-H Q3 maintained incrementally — an aggregate over a THREE-table
join (customer ⋈ orders ⋈ lineitem) refreshed from signed-frequency
deltas on any base table, including DELETE retractions on lineitem AND
orders.  This is the reference's unrealized differential goal
(storage/src/storage.rs:26-65) one step past the single-table Q1 MV:
the N-way bilinear join delta composed with the retractable aggregate
merge.  Every refresh is verified against a from-scratch recompute over
the rows currently live."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from incresql_spark.frequency import FreqTable
from incresql_spark.materialize import AggregateJoinMaterializedView

from .conftest import SF_SMALL

_DATE = "1995-03-15"


def _expected(cust, orders, li):
    rows = (
        cust.filter("c_mktsegment = 'BUILDING'")
        .join(orders, F.expr("c_custkey = o_custkey"))
        .join(li, F.expr("l_orderkey = o_orderkey"))
        .filter(f"o_orderdate < DATE '{_DATE}' AND l_shipdate > DATE '{_DATE}'")
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(
            F.sum(F.expr("l_extendedprice * (1 - l_discount)")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .collect()
    )
    return {
        (r.l_orderkey, str(r.o_orderdate), r.o_orderpriority): (
            float(r.revenue),
            r.n_items,
        )
        for r in rows
    }


def _mv_state(mv):
    return {
        (r.l_orderkey, str(r.o_orderdate), r.o_orderpriority): (
            float(r.revenue),
            r.n_items,
        )
        for r in mv.read().collect()
    }


def _assert_close(got, want):
    assert set(got) == set(want)
    for k, (gr, gn) in got.items():
        wr, wn = want[k]
        assert gn == wn
        assert gr == pytest.approx(wr, rel=1e-9)


def test_q3_incremental_with_retraction(spark, tmp_path):
    cust_src = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    ord_src = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    li_src = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")

    cust = FreqTable(spark, str(tmp_path / "customer_live"))
    orders = FreqTable(spark, str(tmp_path / "orders_live"))
    li = FreqTable(spark, str(tmp_path / "lineitem_live"))
    for t, src in ((cust, cust_src), (orders, ord_src), (li, li_src)):
        t.create(src.schema)

    mv = AggregateJoinMaterializedView(
        spark,
        "q3_mv",
        [cust, orders, li],
        ["c_custkey = o_custkey", "l_orderkey = o_orderkey"],
        "l_orderkey, o_orderdate, o_orderpriority, "
        "sum(l_extendedprice * (1 - l_discount)) AS revenue, "
        "count(*) AS n_items",
        None,
        "l_orderkey, o_orderdate, o_orderpriority",
        str(tmp_path / "mv_state"),
        table_filters=[
            "c_mktsegment = 'BUILDING'",
            f"o_orderdate < DATE '{_DATE}'",
            f"l_shipdate > DATE '{_DATE}'",
        ],
    )

    # batch 1: full customer dim + even orderkeys; batch 2: odd orderkeys —
    # deltas arrive on DIFFERENT tables across refreshes.
    cust.insert(cust_src)
    orders.insert(ord_src.filter("o_orderkey % 2 = 0"))
    li.insert(li_src.filter("l_orderkey % 2 = 0"))
    mv.refresh()
    _assert_close(
        _mv_state(mv),
        _expected(
            cust_src,
            ord_src.filter("o_orderkey % 2 = 0"),
            li_src.filter("l_orderkey % 2 = 0"),
        ),
    )

    orders.insert(ord_src.filter("o_orderkey % 2 = 1"))
    li.insert(li_src.filter("l_orderkey % 2 = 1"))
    mv.refresh()
    _assert_close(_mv_state(mv), _expected(cust_src, ord_src, li_src))

    # retraction on the FACT table: delete one return-flag class
    li.delete_where("l_returnflag = 'R'")
    mv.refresh()
    live_li = li_src.filter("l_returnflag <> 'R'")
    _assert_close(_mv_state(mv), _expected(cust_src, ord_src, live_li))

    # retraction on a MIDDLE table: delete an order-priority class — groups
    # fed only by those orders must vanish from the maintained state
    orders.delete_where("o_orderpriority = '1-URGENT'")
    mv.refresh()
    live_ord = ord_src.filter("o_orderpriority <> '1-URGENT'")
    _assert_close(_mv_state(mv), _expected(cust_src, live_ord, live_li))

    # no-op refresh consumes nothing
    assert mv.refresh() == 0
