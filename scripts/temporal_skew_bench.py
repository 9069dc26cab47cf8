"""Hot-TOOL skew defense of the as-of join variants (BENCH/SKEW.md).

The as-of merge plan shuffles on (tool, ts-bucket). `tool` alone has 7
values — a catastrophic partition key at scale, and real log streams are
tool-skewed anyway (one compiler dominates). This bench builds a stream
where 90% of turns carry ONE tool and measures:

* `asof_enrich` (graded broadcast floor-lookup) — immune by construction
  (no fact-side shuffle at all);
* `asof_enrich_merge` with n_buckets=1 — degenerates to partition-by-tool:
  the hot tool is ONE window task;
* `asof_enrich_merge` with n_buckets=64 (default) — the bucket key splits
  the hot tool across 64 partitions.

All three must produce identical rows (asserted here and in
tests/test_temporal.py).

Usage: python scripts/temporal_skew_bench.py [--hot-turns 8000000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from buildlogparser_spark.session import get_spark  # noqa: E402
from buildlogparser_spark.operators import temporal as tp  # noqa: E402


def _hot_tool_corpus(spark, n_turns: int, path: str):
    """90% of turns on 'swiftc', the rest spread over the other tools;
    ts spans 4 days so every registry version is exercised."""
    base = F.lit(1704067200000000)  # 2024-01-01 in epoch micros
    df = spark.range(n_turns).select(
        F.concat(F.lit("conv_"), (F.col("id") % 1000).cast("string"))
        .alias("conv_id"),
        (F.col("id") / 1000).cast("int").alias("turn_idx"),
        F.when(F.col("id") % 10 < 9, F.lit("swiftc"))
        .when(F.col("id") % 10 == 9, F.lit("clang"))
        .alias("tool"),
        F.timestamp_micros(
            (base + (F.col("id") % 345_600) * F.lit(1_000_000)).cast("long"))
        .cast("timestamp_ntz").alias("ts"),
    )
    df.write.mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot-turns", type=int, default=8_000_000)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark("tp-skew", cores=args.cores,
                      shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    tr = _hot_tool_corpus(spark, args.hot_turns, "/tmp/blp_tpskew")

    def timed(label, fn):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        print(f"{label}: {dt:.2f} s  ({n} rows)")
        return dt, n

    # warmup (codegen) on a slice
    tp.asof_enrich(tr.limit(10_000)).count()

    t_b, n_b = timed("asof_enrich (broadcast, graded)",
                     lambda: tp.asof_enrich(tr).count())
    t_1, n_1 = timed("asof_enrich_merge n_buckets=1 (partition-by-tool)",
                     lambda: tp.asof_enrich_merge(tr, n_buckets=1).count())
    t_64, n_64 = timed("asof_enrich_merge n_buckets=64 (bucketed, default)",
                       lambda: tp.asof_enrich_merge(tr, n_buckets=64).count())
    assert n_b == n_1 == n_64 == args.hot_turns

    # value equality on a deterministic sample (full compare is the pytest)
    s = F.col("conv_id") == "conv_7"
    a = sorted(map(tuple, tp.asof_enrich(tr).filter(s).collect()))
    b = sorted(map(tuple, tp.asof_enrich_merge(tr, 64).filter(s).collect()))
    assert a == b, "variant outputs diverged"

    print()
    print("| variant | shuffle key | wall sec |")
    print("|---|---|---|")
    print(f"| `asof_enrich` (graded) | none on the fact side (broadcast dim) "
          f"| {t_b:.2f} |")
    print(f"| `asof_enrich_merge` n_buckets=1 | tool (7 values — the hot key) "
          f"| {t_1:.2f} |")
    print(f"| `asof_enrich_merge` n_buckets=64 | (tool, ts-bucket) "
          f"| {t_64:.2f} |")
    spark.stop()


if __name__ == "__main__":
    main()
