"""Bucketed aggregate-MV merge vs full recompute at real state size.

The round-8 AggState layout claims refresh cost O(delta + touched buckets)
instead of O(|state|) (materialize.py:74-240).  This measures the claim at
sf1 (6M lineitem rows, ~473k groups in the Q3-shaped MV): build the MV over
a seeded prefix, apply a ~1% lineitem delta, and time

  - ``refresh``: one incremental refresh (telescoping join delta feeding
    the bucketed state merge), and
  - ``recompute``: the same aggregate recomputed from scratch over the
    post-delta live rows (what a non-incremental engine or a full-refresh
    MV would run), measured in the SAME warm session.

Also reports the manifest's touched-bucket count for the delta refresh, so
bucket sizing (incresql.mv.state.buckets) is visible next to the numbers.

Usage::

    python tools/bench_mv_merge.py [sf_dir] [delta_pct]
    # defaults: /root/repo/.scaled/sf1  1

Prints one JSON line: {"sf_dir":…, "delta_rows":…, "refresh_sec":…,
"recompute_sec":…, "touched_buckets":…, "num_buckets":…, "state_groups":…}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaled/sf1"
DELTA_PCT = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
MV_DATE = "1995-03-15"
#: SPARK_GRAFT_MV_FILTERS=0 drops the Q3 dimension/date filters so the MV
#: keeps one group per (orderkey, date, priority) — ~1.5M groups at sf1 —
#: measuring the bucketed merge at real state size, not just Q3's survivors
USE_FILTERS = os.environ.get("SPARK_GRAFT_MV_FILTERS", "1") != "0"
#: SPARK_GRAFT_MV_BUCKETS overrides the state bucket count (default conf 64)
MV_BUCKETS = os.environ.get("SPARK_GRAFT_MV_BUCKETS")
#: SPARK_GRAFT_MV_DELTA=recency makes the delta the TOP delta_pct% of the
#: orderkey range (the realistic ingest shape: new orders arrive at the
#: head) instead of an every-Nth-key uniform spread (the worst case for
#: any bucketed merge: every bucket is touched)
DELTA_SHAPE = os.environ.get("SPARK_GRAFT_MV_DELTA", "uniform")
#: SPARK_GRAFT_MV_RANGE_WIDTH > 0 switches the state to the RANGE layout
#: (incresql.mv.state.range_width): key-local deltas then touch only the
#: buckets their key span maps into
MV_RANGE_WIDTH = int(os.environ.get("SPARK_GRAFT_MV_RANGE_WIDTH", "0"))
#: SPARK_GRAFT_MV_SHAPE=q13 switches to the LEFT OUTER shape (customer ⟕
#: orders per-customer counts, the mv_q13_incremental gate shape) and
#: measures BOTH an insert wave and a pad-flipping delete wave — the pad
#: anti-join terms are the left-outer-specific cost the inner-join rows
#: above never exercise
MV_SHAPE = os.environ.get("SPARK_GRAFT_MV_SHAPE", "q3")


def main_q13() -> None:
    """Left-outer MV economics: insert wave + pad-flipping delete wave vs
    full recompute, at real state size (one group per customer)."""
    from pyspark.sql import functions as F

    from incresql_spark.catalog import load_table
    from incresql_spark.frequency import FreqTable
    from incresql_spark.materialize import AggregateJoinMaterializedView
    from incresql_spark.session import get_spark

    spark = get_spark(
        "bench_mv_q13", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    )
    if MV_BUCKETS:
        spark.conf.set("incresql.mv.state.buckets", MV_BUCKETS)
    root = tempfile.mkdtemp(prefix="bench_mv_q13_")
    try:
        cust_src = load_table(spark, SF_DIR, "customer").select("c_custkey")
        ord_src = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority"
        )
        cust = FreqTable(spark, f"{root}/customer")
        cust.create(cust_src.schema)
        ords = FreqTable(spark, f"{root}/orders")
        ords.create(ord_src.schema)
        mv = AggregateJoinMaterializedView(
            spark,
            "bench_mv_q13",
            [cust, ords],
            ["c_custkey = o_custkey"],
            "c_custkey, count(o_orderkey) AS c_count",
            None,
            "c_custkey",
            f"{root}/mv_state",
            table_filters=[None, "o_orderpriority <> '1-URGENT'"],
            hows=["left_outer"],
        )
        mod = int(round(100 / DELTA_PCT))
        cust.insert(cust_src)
        ords.insert(ord_src.filter(f"o_orderkey % {mod} <> 0"))
        t0 = time.time()
        mv.refresh()
        build_sec = time.time() - t0
        state_groups = mv.read().count()

        # insert wave: ~delta_pct% new orders (some retract pads)
        delta_ins = ord_src.filter(f"o_orderkey % {mod} = 0")
        delta_rows = delta_ins.count()
        ords.insert(delta_ins)
        t0 = time.time()
        mv.refresh()
        refresh_insert_sec = time.time() - t0

        # delete wave: one customer class loses ALL its orders — their
        # groups flip back to pads (c_count 0); sized to ~delta_pct% of
        # customers so the wave is delta-scale, not a tenth of the corpus
        del_mod = int(round(100 / DELTA_PCT))
        deleted = ords.delete_where(f"o_custkey % {del_mod} = 3")
        t0 = time.time()
        mv.refresh()
        refresh_delete_sec = time.time() - t0
        final_groups = mv.read().count()

        # comparator: the same left-outer aggregate recomputed from the
        # post-delete live rows in the same warm session
        cs = cust.scan(expand=False).drop("__freq")
        od = ords.scan(expand=False).drop("__freq").filter(
            "o_orderpriority <> '1-URGENT'"
        )
        t0 = time.time()
        n = (
            cs.join(od, F.expr("c_custkey = o_custkey"), "left_outer")
            .groupBy("c_custkey")
            .agg(F.count("o_orderkey").alias("c_count"))
            .count()
        )
        recompute_sec = time.time() - t0
        assert n == final_groups, (n, final_groups)

        print(
            json.dumps(
                {
                    "shape": "q13_left_outer",
                    "sf_dir": SF_DIR,
                    "delta_pct": DELTA_PCT,
                    "delta_rows": delta_rows,
                    "deleted_rows": deleted,
                    "build_sec": round(build_sec, 2),
                    "refresh_insert_sec": round(refresh_insert_sec, 2),
                    "refresh_delete_sec": round(refresh_delete_sec, 2),
                    "recompute_sec": round(recompute_sec, 2),
                    "state_groups": final_groups,
                    "seed_groups": state_groups,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    from pyspark.sql import functions as F

    from incresql_spark.catalog import load_table
    from incresql_spark.frequency import FreqTable
    from incresql_spark.materialize import AggregateJoinMaterializedView
    from incresql_spark.session import get_spark

    spark = get_spark("bench_mv_merge", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    if MV_BUCKETS:
        spark.conf.set("incresql.mv.state.buckets", MV_BUCKETS)
    if MV_RANGE_WIDTH:
        spark.conf.set("incresql.mv.state.range_width", str(MV_RANGE_WIDTH))
    root = tempfile.mkdtemp(prefix="bench_mv_merge_")
    try:
        srcs = {
            name: load_table(spark, SF_DIR, name)
            for name in ("customer", "orders", "lineitem")
        }
        tbls = {}
        for name, src in srcs.items():
            t = FreqTable(spark, f"{root}/{name}")
            t.create(src.schema)
            tbls[name] = t
        mv = AggregateJoinMaterializedView(
            spark,
            "bench_mv",
            [tbls["customer"], tbls["orders"], tbls["lineitem"]],
            ["c_custkey = o_custkey", "l_orderkey = o_orderkey"],
            "l_orderkey, o_orderdate, o_orderpriority, "
            "sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))"
            " AS revenue, count(*) AS n_items",
            None,
            "l_orderkey, o_orderdate, o_orderpriority",
            f"{root}/mv_state",
            table_filters=[
                "c_mktsegment = 'BUILDING'" if USE_FILTERS else None,
                f"o_orderdate < DATE '{MV_DATE}'" if USE_FILTERS else None,
                f"l_shipdate > DATE '{MV_DATE}'" if USE_FILTERS else None,
            ],
        )
        # seed: all dims + (100 - delta)% of lineitem, then build the state
        tbls["customer"].insert(srcs["customer"])
        tbls["orders"].insert(srcs["orders"])
        if DELTA_SHAPE == "recency":
            # quantile, not max-range: tiled key spaces are non-uniform
            cut = int(
                srcs["lineitem"].approxQuantile(
                    "l_orderkey", [1 - DELTA_PCT / 100], 0.0001
                )[0]
            )
            seed = srcs["lineitem"].filter(f"l_orderkey <= {cut}")
            delta_src = srcs["lineitem"].filter(f"l_orderkey > {cut}")
        else:
            mod = int(round(100 / DELTA_PCT))
            seed = srcs["lineitem"].filter(f"l_orderkey % {mod} <> 0")
            delta_src = srcs["lineitem"].filter(f"l_orderkey % {mod} = 0")
        tbls["lineitem"].insert(seed)
        t0 = time.time()
        mv.refresh()
        build_sec = time.time() - t0
        state_groups = mv.read().count()

        # the measured event: one ~delta_pct% lineitem delta
        delta_rows = delta_src.count()
        tbls["lineitem"].insert(delta_src)
        t0 = time.time()
        mv.refresh()
        refresh_sec = time.time() - t0
        final_groups = mv.read().count()

        # manifest introspection: how many buckets did the delta touch?
        agg_path = f"{root}/mv_state/agg"
        manifests = sorted(
            int(f.split("-")[1].split(".")[0])
            for f in os.listdir(agg_path)
            if f.startswith("manifest-") and f.endswith(".json")
        )
        with open(os.path.join(agg_path, f"manifest-{manifests[-1]}.json")) as fh:
            m_new = json.load(fh)
        with open(os.path.join(agg_path, f"manifest-{manifests[-2]}.json")) as fh:
            m_old = json.load(fh)
        touched = sum(
            1
            for b in set(m_new["buckets"]) | set(m_old["buckets"])
            if m_new["buckets"].get(b) != m_old["buckets"].get(b)
        )

        # comparator: full recompute over the post-delta live rows — same
        # session, same warm JVM, same data volumes
        li = tbls["lineitem"].scan(expand=False)
        od = tbls["orders"].scan(expand=False)
        cs = tbls["customer"].scan(expand=False)
        if USE_FILTERS:
            cs = cs.filter("c_mktsegment = 'BUILDING'")
            od = od.filter(f"o_orderdate < DATE '{MV_DATE}'")
            li = li.filter(f"l_shipdate > DATE '{MV_DATE}'")
        t0 = time.time()
        n = (
            cs.drop("__freq")
            .join(od.drop("__freq"), F.expr("c_custkey = o_custkey"))
            .join(li.drop("__freq"), F.expr("l_orderkey = o_orderkey"))
            .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
            .agg(
                F.sum(
                    F.expr(
                        "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))"
                    )
                ).alias("revenue"),
                F.count("*").alias("n_items"),
            )
            .count()
        )
        recompute_sec = time.time() - t0
        assert n == final_groups, (n, final_groups)

        print(
            json.dumps(
                {
                    "sf_dir": SF_DIR,
                    "filters": USE_FILTERS,
                    "delta_shape": DELTA_SHAPE,
                    "range_width": MV_RANGE_WIDTH,
                    "delta_pct": DELTA_PCT,
                    "delta_rows": delta_rows,
                    "build_sec": round(build_sec, 2),
                    "refresh_sec": round(refresh_sec, 2),
                    "recompute_sec": round(recompute_sec, 2),
                    "touched_buckets": touched,
                    "num_buckets": m_new["num_buckets"],
                    "state_groups": final_groups,
                    "seed_groups": state_groups,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main_q13() if MV_SHAPE == "q13" else main()
