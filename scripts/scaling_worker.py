"""One simulated executor for scaling_bench: a local[cores] JVM that runs
the flagship parse→classify→enrich→aggregate chain over a shard of the
transcript table and prints one JSON line {rows, warm_sec}.

warm_sec is steady-state (min of --reps runs after one warmup) — cluster
executors are long-running, so JVM/JIT startup is amortized and excluded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", required=True,
                    help="comma-separated parquet file paths (the shard)")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--memory", default="8g")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.master(f"local[{args.cores}]")
        .appName("scaling-worker")
        .config("spark.sql.shuffle.partitions", str(args.cores))
        .config("spark.driver.memory", args.memory)
        # a real cluster executor is cgroup-capped to its core count; without
        # this every co-located JVM sizes GC/JIT pools for all 32 host CPUs
        # and they trample each other
        .config("spark.driver.extraJavaOptions",
                f"-XX:ActiveProcessorCount={args.cores}")
        .config("spark.sql.files.maxPartitionBytes", "4m")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from buildlogparser_spark.operators.classify import classify
    from buildlogparser_spark.operators.enrich import enrich

    tr = spark.read.parquet(*args.files.split(","))
    rows = tr.count()

    def flagship() -> None:
        (enrich(classify(tr))
         .groupBy("diag_class", "severity", "tool_family")
         .agg(F.count("*").alias("n")).collect())

    flagship()  # warm: codegen + JIT
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.time()
        flagship()
        best = min(best, time.time() - t0)
    print(json.dumps({"rows": rows, "warm_sec": round(best, 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
