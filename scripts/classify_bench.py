"""Micro-bench for the classify cascade: min-of-N reps of a full classify
pass at an sf dir, written to the noop sink (no result materialization).

Usage: python scripts/classify_bench.py [sf_dir] [reps]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("classify-bench").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from buildlogparser_spark.operators.classify import classify
    from buildlogparser_spark.transcripts import load_transcripts

    tr = load_transcripts(spark, sf_dir)
    n = tr.count()
    times = []
    for _ in range(reps):
        t0 = time.time()
        classify(tr).write.format("noop").mode("overwrite").save()
        times.append(time.time() - t0)
    best = min(times)
    print(f"rows={n} reps={reps} best={best:.3f}s "
          f"rows_per_sec={n / best:,.0f} all={[round(t, 3) for t in times]}")
    spark.stop()


if __name__ == "__main__":
    main()
