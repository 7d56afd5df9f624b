"""Engine-vs-DuckDB amortization curve across scale factors.

BASELINE.md's core claim — Spark's ~12× sf0.1 gap is fixed per-job cost
that amortizes with data volume while the plan shapes stay scale-correct —
has to be *measured*, not asserted.  This runs the BASELINE.md headline set
(TPC-H Q1/Q3/Q5/Q6/Q10 + the pipeline five) at each given sf dir on both
engines and prints one JSON line per scale factor; `--md` renders the
comparison table for BASELINE.md.

Usage::

    python tools/scale_testdata.py            # build .scaled/sf1 first
    python tools/bench_scaling.py /root/testdata/sf0.1 /root/repo/.scaled/sf1
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEADLINE = [
    "tpch_q1",
    "tpch_q3",
    "tpch_q5",
    "tpch_q6",
    "tpch_q10",
    "dedup_minhash_lsh",
    "dedup_exact",
    "sim_topk_cosine",
    "text_stats",
    "op_asof_join",
]

# Override for subset runs, e.g. the sf10 point where DuckDB's single-
# process minhash would take tens of minutes per sample:
#   SPARK_GRAFT_HEADLINE=tpch_q1,tpch_q5,text_stats python tools/bench_scaling.py ...
if os.environ.get("SPARK_GRAFT_HEADLINE"):
    HEADLINE = os.environ["SPARK_GRAFT_HEADLINE"].split(",")

# Queries to time on Spark only (no DuckDB sample): oracles that are frozen
# to the gate SF (sim_knn_graph / sim_dedup_semantic embed a corpus-width
# guard) or whose DuckDB form is impractically slow at the measured SF.
SPARK_ONLY = set(
    os.environ.get("SPARK_GRAFT_SPARK_ONLY", "").split(",")
) - {""}

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()

RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def bench_sf(spark, queries, oracles, sf_dir: str) -> dict:
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # warm parquet footers / JVM codegen: one untimed Spark pass over the
    # whole set (AQE re-planning + whole-stage codegen compile on first
    # execution would otherwise pollute pass 1).
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    for name in HEADLINE:
        spark.catalog.clearCache()
        queries[name](spark, sf_dir).collect()

    # Interleaved passes + per-query MINIMUM, same protocol as bench.py:
    # the VM exhibits multi-second transient stalls, and consecutive
    # samples of one query can all land inside a stall — interleaving
    # spreads each query's samples minutes apart so the min dodges it.
    # Both engines get the same treatment.
    s_samples: dict[str, list] = {n: [] for n in HEADLINE}
    d_samples: dict[str, list] = {n: [] for n in HEADLINE}
    for _ in range(RUNS):
        for name in HEADLINE:
            # the dedup queries .cache() intermediates; leaked cached blocks
            # contaminate later queries' timings (q1 measured 15s vs 1-3s
            # fresh), so each timed sample re-pays its own persists
            spark.catalog.clearCache()
            t0 = time.time()
            queries[name](spark, sf_dir).collect()
            s_samples[name].append(time.time() - t0)
            if name in SPARK_ONLY:
                continue
            t0 = time.time()
            con.execute(oracles[name]).fetchall()
            d_samples[name].append(time.time() - t0)

    out = {}
    for name in HEADLINE:
        s = min(s_samples[name])
        d = min(d_samples[name]) if d_samples[name] else None
        out[name] = {
            "spark_s": round(s, 3),
            "duckdb_s": round(d, 3) if d is not None else None,
            "ratio": round(s / d, 2) if d else None,
        }
        dtxt = f"{d:7.3f}s ratio={s/d:6.2f}x" if d else "   (spark-only)"
        print(f"  {name:20s} spark={s:7.3f}s duck={dtxt}", file=sys.stderr)
    return out


def main() -> None:
    import __spark_entry__ as entry

    from incresql_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.1", "/root/repo/.scaled/sf1"]
    queries, oracles = entry.queries(), entry.oracle_sql()
    spark = get_spark("bench_scaling")

    results = {}
    for sf_dir in sf_dirs:
        label = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
        print(f"[sf{label}] {sf_dir}", file=sys.stderr)
        per = bench_sf(spark, queries, oracles, sf_dir)
        ratios = [v["ratio"] for v in per.values() if v["ratio"]]
        geo = statistics.geometric_mean(ratios) if ratios else None
        results[label] = {
            "sf_dir": sf_dir,
            "queries": per,
            "total_spark_s": round(sum(v["spark_s"] for v in per.values()), 3),
            "total_duckdb_s": round(
                sum(v["duckdb_s"] for v in per.values() if v["duckdb_s"]), 3
            ),
            "geomean_ratio": round(geo, 2) if geo is not None else None,
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
