"""Capture .explain("formatted") output for the round-18 optimization
plan-diff deliverable (plans/r18/<query>_{before,after}.txt).

Usage:  python tools/dump_plans_r18.py <suffix> [query ...]

Runs from whatever tree is on sys.path[0] (run it from a worktree of the
pre-optimization commit to produce the *_before.txt files, from the
current tree for *_after.txt).  For plain queries the plan is the
returned DataFrame's; the MV cycle rows additionally dump the internal
wave-2 refresh delta plan (the expensive job the optimization targets —
the returned frame of a cycle is just a pinned LogicalRDD scan, which
would show nothing)."""
from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = os.environ.get("PLANS_OUT", "/root/repo/plans/r18")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

PLAIN = [
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q7", "tpch_q8", "tpch_q9",
    "tpch_q16", "tpch_q18", "tpch_q20", "tpch_q21",
    "op_hll_distinct", "op_hll_grouped", "op_quantile_sketch",
    "op_hll_sketch_only", "op_quantile_sketch_only",
    "text_cms_heavyhitters", "text_cms_grouped", "text_cms_sketch_only",
    "text_dsir_select", "text_bm25_table",
    "dedup_contamination_bloom_only", "dedup_minhash_lsh",
    "pipeline_curate",
]


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def dump_plain(spark, name: str, suffix: str) -> None:
    import __spark_entry__ as entry

    reg = entry.queries()
    if name not in reg:  # bench-only rows (sketch-only production paths)
        from incresql_spark.operators import bench_queries

        reg = bench_queries()
    fn = reg[name]
    df = fn(spark, SF_DIR)
    with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(_explain_str(df))


def dump_mv_q3_refresh(spark, suffix: str) -> None:
    """The wave-2 refresh delta plan of mv_q3_incremental — the join-delta
    job the r18 shuffle work targets."""
    from incresql_spark.operators.pipeline import _q3_tables_and_view
    from incresql_spark.frequency import FREQ

    root = tempfile.mkdtemp(prefix="plans_mv_q3_")
    try:
        tables, mv = _q3_tables_and_view(spark, SF_DIR, root)
        tables["customer"][0].insert(tables["customer"][1],
                                     assume_distinct=True)
        tables["orders"][0].insert(
            tables["orders"][1].filter("o_orderkey % 2 = 0"),
            assume_distinct=True)
        tables["lineitem"][0].insert(
            tables["lineitem"][1].filter("l_orderkey % 2 = 0"),
            assume_distinct=True)
        mv.refresh()
        tables["orders"][0].insert(
            tables["orders"][1].filter("o_orderkey % 2 = 1"),
            assume_distinct=True)
        tables["lineitem"][0].insert(
            tables["lineitem"][1].filter("l_orderkey % 2 = 1"),
            assume_distinct=True)
        meta = mv._load_meta()
        olds = meta.get("seqs", [-1] * len(mv.tables))
        m = mv.state._load_manifest()
        if (m or {}).get("cursor"):
            olds = [max(o, s) for o, s in zip(olds, m["cursor"])]
        news = [t.last_seq() for t in mv.tables]
        delta, pinned = mv._delta_plan(olds, news)
        delta_state = mv._delta_agg(
            delta.withColumnRenamed("__f", FREQ), with_rows=True
        )
        with open(os.path.join(OUT_DIR,
                               f"mv_q3_incremental_{suffix}.txt"), "w") as fh:
            fh.write("wave-2 refresh delta_state plan "
                     "(the per-refresh join-delta job)\n")
            fh.write(_explain_str(delta_state))
        for p in pinned:
            p.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def dump_mv_q13_refresh(spark, suffix: str) -> None:
    """The wave-3 (post-delete) refresh delta plan of mv_q13_incremental —
    the left-outer pad machinery."""
    from incresql_spark.catalog import load_table
    from incresql_spark.frequency import FREQ, FreqTable
    from incresql_spark.materialize import AggregateJoinMaterializedView

    root = tempfile.mkdtemp(prefix="plans_mv_q13_")
    try:
        cust_src = load_table(spark, SF_DIR, "customer").select("c_custkey")
        ord_src = load_table(spark, SF_DIR, "orders").select(
            "o_orderkey", "o_custkey", "o_orderpriority")
        cust = FreqTable(spark, f"{root}/customer")
        cust.create(cust_src.schema)
        ords = FreqTable(spark, f"{root}/orders")
        ords.create(ord_src.schema)
        mv = AggregateJoinMaterializedView(
            spark, "mv_q13", [cust, ords], ["c_custkey = o_custkey"],
            "c_custkey, count(o_orderkey) AS c_count", None, "c_custkey",
            f"{root}/mv_state",
            table_filters=[None, "o_orderpriority <> '1-URGENT'"],
            hows=["left_outer"],
        )
        cust.insert(cust_src, assume_distinct=True)
        ords.insert(ord_src.filter("o_orderkey % 2 = 0"),
                    assume_distinct=True)
        mv.refresh()
        ords.insert(ord_src.filter("o_orderkey % 2 = 1"),
                    assume_distinct=True)
        mv.refresh()
        ords.delete_where("o_custkey % 10 = 3")
        meta = mv._load_meta()
        olds = meta.get("seqs", [-1] * len(mv.tables))
        m = mv.state._load_manifest()
        if (m or {}).get("cursor"):
            olds = [max(o, s) for o, s in zip(olds, m["cursor"])]
        news = [t.last_seq() for t in mv.tables]
        delta, pinned = mv._delta_plan(olds, news)
        delta_state = mv._delta_agg(
            delta.withColumnRenamed("__f", FREQ), with_rows=True
        )
        with open(os.path.join(OUT_DIR,
                               f"mv_q13_incremental_{suffix}.txt"), "w") as fh:
            fh.write("wave-3 (post-delete) refresh delta_state plan "
                     "(left-outer pad machinery)\n")
            fh.write(_explain_str(delta_state))
        for p in pinned:
            p.unpersist()
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    from incresql_spark.session import get_spark

    spark = get_spark("dump_plans_r18")
    for name in PLAIN:
        if only and name not in only:
            continue
        try:
            dump_plain(spark, name, suffix)
            print(f"dumped {name}_{suffix}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"FAILED {name}: {exc}")
    if not only or "mv_q3_incremental" in only:
        dump_mv_q3_refresh(spark, suffix)
        print(f"dumped mv_q3_incremental_{suffix}")
    if not only or "mv_q13_incremental" in only:
        dump_mv_q13_refresh(spark, suffix)
        print(f"dumped mv_q13_incremental_{suffix}")


if __name__ == "__main__":
    main()
