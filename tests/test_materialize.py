"""Keyed snapshot semantics of buildlogparser_spark.materialize — the
flat-memory substitute for .cache() on graded paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from buildlogparser_spark import materialize as M


def test_keyed_snapshot_memoizes(spark, tmp_path):
    df = spark.range(100).select(F.col("id"), (F.col("id") * 2).alias("v"))
    a = M.materialize(df, key="t-memo")
    n_dirs = len(M._ALL_DIRS)
    b = M.materialize(df, key="t-memo")
    assert len(M._ALL_DIRS) == n_dirs  # second call reused the snapshot
    assert a.count() == b.count() == 100
    # one-shot (unkeyed) snapshots always write a fresh dir
    M.materialize(df)
    assert len(M._ALL_DIRS) == n_dirs + 1


def test_snapshot_roundtrip_preserves_data(spark):
    df = spark.range(50).select(
        F.col("id"), F.concat(F.lit("x"), F.col("id").cast("string")).alias("s"))
    back = M.materialize(df, key="t-roundtrip")
    assert sorted((r.id, r.s) for r in back.collect()) == \
        sorted((r.id, r.s) for r in df.collect())


def test_stale_app_entries_evicted(spark, tmp_path):
    df = spark.range(10)
    M.materialize(df, key="t-evict")
    app = spark.sparkContext.applicationId
    # simulate a snapshot left by a previous Spark session (own dir — the
    # eviction rmtree must not touch live entries)
    stale_dir = str(tmp_path / "stale-snap")
    df.write.parquet(stale_dir)
    M._KEYED[("app-stale", "t-old")] = stale_dir
    M.materialize(df, key="t-evict2")
    assert not [k for k in M._KEYED if k[0] != app]
    import os

    assert not os.path.exists(stale_dir)  # evicted snapshot dir removed
    assert M.materialize(df, key="t-evict").count() == 10  # live entry intact
