"""Isolated per-query timing for optimization work (guide §1): same warm-up
+ interleaved-min protocol as bench.py, but over a caller-chosen subset so
a lever can be measured without paying the full 50-row run.

Usage:  python tools/micro_bench.py <query> [query ...]
Env:    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
        MICRO_RUNS (default 3), MICRO_NOOP=1 to time via the noop sink
        (guide §1.4) instead of collect() — use noop for big-result
        queries; the bench rows are all small aggregates so collect()
        matches bench.py's timed action.
"""
from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
RUNS = int(os.environ.get("MICRO_RUNS", "3"))
NOOP = os.environ.get("MICRO_NOOP", "0") == "1"


def main() -> None:
    from incresql_spark.session import get_spark
    from incresql_spark import tpch
    from incresql_spark.operators import bench_queries

    reg = dict(tpch.QUERIES)
    reg.update(bench_queries())
    names = sys.argv[1:]
    missing = [n for n in names if n not in reg]
    if missing:
        raise SystemExit(f"unknown queries: {missing}")

    spark = get_spark("micro_bench")
    for t in ("lineitem", "orders", "customer"):
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            spark.read.parquet(p).count()

    def run(fn):
        df = fn(spark, SF_DIR)
        if NOOP:
            df.write.format("noop").mode("overwrite").save()
        else:
            df.collect()

    for n in names:  # untimed warm-up pass (AQE + codegen)
        run(reg[n])
    samples: dict[str, list[float]] = {n: [] for n in names}
    for _ in range(RUNS):
        for n in names:
            spark.sparkContext.setJobDescription(f"micro:{n}")
            t0 = time.time()
            run(reg[n])
            samples[n].append(round(time.time() - t0, 4))
            spark.sparkContext.setJobDescription(None)
    out = {n: {"min": min(s), "all": s} for n, s in samples.items()}
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
