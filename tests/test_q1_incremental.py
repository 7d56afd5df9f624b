"""TPC-H Q1 maintained incrementally — the reference's unrealized
continuous-MV goal (SURVEY §2.5) realized on its flagship benchmark query:
lineitem arrives in batches (and retracts via DELETE), and the Q1 aggregate
is refreshed from signed-frequency deltas only, never recomputed from
scratch.  Each refresh is verified against a from-scratch recompute over
the rows currently live."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from incresql_spark.frequency import FreqTable
from incresql_spark.materialize import MaterializedView

from .conftest import SF_SMALL

_CUTOFF = "1998-09-02"


def _expected(df):
    out = (
        df.filter(F.col("l_shipdate") <= F.lit(_CUTOFF).cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum(F.expr("l_extendedprice * (1 - l_discount)")).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .collect()
    )
    return {
        (r.l_returnflag, r.l_linestatus): (
            float(r.sum_qty),
            float(r.sum_disc_price),
            r.count_order,
        )
        for r in out
    }


def _mv_state(mv):
    return {
        (r.l_returnflag, r.l_linestatus): (
            float(r.sum_qty),
            float(r.sum_disc_price),
            r.count_order,
        )
        for r in mv.read().collect()
    }


def _assert_close(got, want):
    assert set(got) == set(want)
    for k, (gq, gd, gc) in got.items():
        wq, wd, wc = want[k]
        assert gc == wc
        assert gq == pytest.approx(wq, rel=1e-9)
        assert gd == pytest.approx(wd, rel=1e-9)


def test_q1_incremental_with_retraction(spark, tmp_path):
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    table = FreqTable(spark, str(tmp_path / "lineitem_live"))
    table.create(li.schema)
    mv = MaterializedView(
        spark,
        "q1_mv",
        table,
        "l_returnflag, l_linestatus, "
        "sum(l_quantity) AS sum_qty, "
        "sum(l_extendedprice * (1 - l_discount)) AS sum_disc_price, "
        "count(*) AS count_order",
        f"l_shipdate <= DATE '{_CUTOFF}'",
        "l_returnflag, l_linestatus",
        str(tmp_path / "mv_state"),
    )

    # batch 1: even orderkeys; batch 2: odd — two incremental refreshes
    live = None
    for part in (0, 1):
        batch = li.filter(F.col("l_orderkey") % 2 == part)
        table.insert(batch)
        mv.refresh()
        live = batch if live is None else live.union(batch)
        _assert_close(_mv_state(mv), _expected(live))

    # retraction: DELETE one return-flag class entirely; the aggregate MV
    # must absorb the negative-frequency delta, not recompute
    table.delete_where("l_returnflag = 'R'")
    mv.refresh()
    _assert_close(_mv_state(mv), _expected(li.filter(F.col("l_returnflag") != "R")))
