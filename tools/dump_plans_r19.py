"""Capture .explain("formatted") output for the round-19 optimization
plan-diff deliverable (plans/r19/<query>_{before,after}.txt).

Usage:  python tools/dump_plans_r19.py <suffix> [query ...]

Same protocol as tools/dump_plans_r18.py: run from a worktree of the
pre-round commit for *_before.txt, from the current tree for *_after.txt.
Covers the round-19 touch list: the grouped-HLL verify path, the Bloom
contamination screen, the minhash maintainer's per-wave pair plan (cycle
rows return a pinned LogicalRDD, so the INTERNAL plan is what shows the
shape), the mv_q13 refresh-window plan, and — for the TPC-H q20/q21
second look — the AQE-FINAL (post-execution) plans at the tiled sf1,
which the static explain cannot show.
"""
from __future__ import annotations

import contextlib
import io
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
OUT_DIR = os.environ.get("PLANS_OUT", "/root/repo/plans/r19")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/root/repo/.scaled/sf1")

PLAIN = [
    "op_hll_grouped", "op_hll_distinct", "op_hll_sketch_only",
    "dedup_contamination_bloom_only", "dedup_contamination_bloom",
]
#: AQE-final runtime plans at sf1 (verdict item 7): executed first, then
#: explained — the same DataFrame's explain shows isFinalPlan=true with
#: the runtime join strategies and any skew-split AQEShuffleRead nodes.
SF1_FINAL = ["tpch_q20", "tpch_q21"]


def _explain_str(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _registry():
    import __spark_entry__ as entry
    from incresql_spark.operators import bench_queries

    reg = dict(entry.queries())
    for k, v in bench_queries().items():
        reg.setdefault(k, v)
    return reg


def dump_plain(spark, name: str, suffix: str) -> None:
    df = _registry()[name](spark, SF_DIR)
    with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w") as fh:
        fh.write(_explain_str(df))


def dump_sf1_final(spark, name: str, suffix: str) -> None:
    if not os.path.isdir(SF1_DIR):
        print(f"skip {name}: no sf1 dir {SF1_DIR}")
        return
    df = _registry()[name](spark, SF1_DIR)
    df.collect()  # AQE finalizes the plan during execution
    with open(os.path.join(OUT_DIR, f"{name}_sf1_aqe_{suffix}.txt"),
              "w") as fh:
        fh.write("AQE-final plan at sf1 (explain AFTER execution)\n")
        fh.write(_explain_str(df))


def dump_minhash_wave(spark, suffix: str) -> None:
    """The wave-2 pair plan of dedup_minhash_incremental — candidates ⋈
    verify against one-wave state (the per-wave compute the §2.6 overlap
    targets; scheduling changes keep this plan identical)."""
    from incresql_spark.catalog import load_table
    from incresql_spark.frequency import FREQ
    from incresql_spark.streaming.minhash_incremental import (
        IncrementalMinHashDedup,
    )
    from incresql_spark.operators.dedup import (
        doc_shingles_df, minhash_bands_long, verify_jaccard_pairs,
    )
    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="plans_minhash_")
    try:
        docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
        dd = IncrementalMinHashDedup(spark, f"{root}/state")
        dd.add_batch(docs.filter("doc_id % 3 = 0"))
        # wave-2 internals, lazily (plan only — no action)
        delta_sh = doc_shingles_df(docs.filter("doc_id % 3 = 1"))
        delta_bands = minhash_bands_long(delta_sh)
        hist = dd.bands.scan(expand=False, merged=False)
        da = delta_bands.select(F.col("doc_id").alias("d_id"), "band_id", "bk")
        db = delta_bands.select(F.col("doc_id").alias("doc_b"), "band_id", "bk")
        cand_dd = (
            da.withColumnRenamed("d_id", "doc_a")
            .join(db, ["band_id", "bk"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b")
        )
        hb = hist.select(F.col("doc_id").alias("h_id"), "band_id", "bk")
        cand_dh = (
            da.join(hb, ["band_id", "bk"])
            .filter(F.col("d_id") != F.col("h_id"))
            .select(F.least("d_id", "h_id").alias("doc_a"),
                    F.greatest("d_id", "h_id").alias("doc_b"))
        )
        candidates = cand_dd.unionByName(cand_dh).distinct()
        all_sh = delta_sh.unionByName(
            dd.shingles.scan(expand=False, merged=False).drop(FREQ)
        )
        pairs = verify_jaccard_pairs(candidates, all_sh, all_sh)
        with open(os.path.join(
                OUT_DIR, f"dedup_minhash_incremental_{suffix}.txt"),
                "w") as fh:
            fh.write("wave-2 pair plan (candidates + exact-Jaccard verify "
                     "against one-wave state)\n")
            fh.write(_explain_str(pairs))
    finally:
        shutil.rmtree(root, ignore_errors=True)


def dump_mv_q13_refresh(spark, suffix: str) -> None:
    from tools.dump_plans_r18 import dump_mv_q13_refresh as r18_q13

    old = os.environ.get("PLANS_OUT")
    os.environ["PLANS_OUT"] = OUT_DIR
    try:
        # r18 helper writes mv_q13_incremental_<suffix>.txt into its own
        # OUT_DIR constant — re-exec its body against ours via monkeypatch
        import tools.dump_plans_r18 as r18

        saved = r18.OUT_DIR
        r18.OUT_DIR = OUT_DIR
        try:
            r18_q13(spark, suffix)
        finally:
            r18.OUT_DIR = saved
    finally:
        if old is None:
            os.environ.pop("PLANS_OUT", None)
        else:
            os.environ["PLANS_OUT"] = old


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "after"
    only = set(sys.argv[2:])
    os.makedirs(OUT_DIR, exist_ok=True)
    from incresql_spark.session import get_spark

    spark = get_spark("dump_plans_r19")
    for name in PLAIN:
        if only and name not in only:
            continue
        try:
            dump_plain(spark, name, suffix)
            print(f"dumped {name}_{suffix}")
        except Exception as exc:  # noqa: BLE001 — report and continue
            print(f"FAILED {name}: {exc}")
    if not only or "dedup_minhash_incremental" in only:
        dump_minhash_wave(spark, suffix)
        print(f"dumped dedup_minhash_incremental_{suffix}")
    if not only or "mv_q13_incremental" in only:
        dump_mv_q13_refresh(spark, suffix)
        print(f"dumped mv_q13_incremental_{suffix}")
    for name in SF1_FINAL:
        if only and name not in only:
            continue
        try:
            dump_sf1_final(spark, name, suffix)
            print(f"dumped {name}_sf1_aqe_{suffix}")
        except Exception as exc:  # noqa: BLE001
            print(f"FAILED {name}: {exc}")


if __name__ == "__main__":
    main()
