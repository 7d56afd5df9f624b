"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Protocol: warm SparkSession, one untimed warm-up execution per query (AQE
re-planning + whole-stage codegen compile happen there), then per-query
median of 3 timed runs, result consumed via collect (BASELINE.md documents
the protocol and the warm-up change).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    from incresql_spark.session import get_spark
    from incresql_spark import tpch

    bench_queries = dict(tpch.QUERIES)
    try:
        from incresql_spark.operators import bench_queries as pipeline_bench

        bench_queries.update(pipeline_bench())
    except ImportError:
        pass

    spark = get_spark("incresql_spark_bench")
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    for name in ("lineitem", "orders", "customer"):
        spark.read.parquet(f"{SF_DIR}/{name}.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in bench_queries.items():
        # steady-state protocol: the first execution of a query pays AQE
        # re-planning and codegen compilation (measured: q2 3.9s cold vs
        # 1.5s steady) — run it once untimed so the medians measure the
        # query, not the JIT.
        fn(spark, SF_DIR).collect()
        samples = []
        for _ in range(RUNS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            # collect() (results are all small aggregates / top-k) forces the
            # full plan; count() would let Catalyst prune sorts and aggregates.
            df.collect()
            samples.append(time.time() - t0)
        timings[name] = round(statistics.median(samples), 4)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "tpch_subset_total_wall",
                "value": round(sum(timings.values()), 4),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
