"""Checkpoint/resume + observe-metrics tests (M6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from buildlogparser_spark.checkpoint import Manifest, route_writes_resumable
from buildlogparser_spark.metrics import StageMetrics
from buildlogparser_spark.operators.classify import classify
from buildlogparser_spark.operators.enrich import enrich
from buildlogparser_spark.transcripts import load_transcripts


@pytest.fixture()
def diags(spark):
    return classify(load_transcripts(spark, SF_SMOKE))


def test_stage_metrics_row_counts(spark, diags):
    mx = StageMetrics()
    d = mx.observe(diags, "classify")
    e = mx.observe(enrich(d), "enrich")
    n = e.count()
    rep = mx.report()
    assert rep["classify"]["rows"] == n
    assert rep["enrich"]["rows"] == n


def test_route_resumable_full_and_skip(spark, diags, tmp_path):
    root = str(tmp_path / "sinks")
    res1 = route_writes_resumable(diags, root, n_salt=4, ts_granularity="month")
    assert not any(r["skipped"] for r in res1.values())
    total = diags.count()
    assert res1["diagnostics"]["rows"] == total
    sev_sum = sum(res1[f"severity={s}"]["rows"]
                  for s in ("error", "warning", "info", "note"))
    assert sev_sum == total
    # routed-row equality: re-read the diagnostics sink, same rows
    back = spark.read.parquet(res1["diagnostics"]["path"])
    assert back.count() == total
    key = ["conv_id", "turn_idx", "severity", "category"]
    assert diags.select(*key).exceptAll(back.select(*key)).count() == 0

    # second run: everything skipped, nothing rewritten
    res2 = route_writes_resumable(diags, root, n_salt=4, ts_granularity="month")
    assert all(r["skipped"] for r in res2.values())
    assert res2["diagnostics"]["rows"] == total


def test_route_resume_after_partial_failure(spark, diags, tmp_path):
    """Simulate a mid-job crash: pre-mark 3 sinks done, run, verify only the
    remaining units execute and the manifest converges to all-done."""
    root = str(tmp_path / "sinks")
    m = Manifest(root)
    for unit in ("diagnostics", "severity=error", "class=warning"):
        m.mark_done("route", unit, rows=-42, secs=0.0)
    res = route_writes_resumable(diags, root, n_salt=4, ts_granularity="month")
    assert res["diagnostics"]["skipped"] and res["diagnostics"]["rows"] == -42
    assert res["severity=error"]["skipped"]
    assert not res["severity=warning"]["skipped"]
    m2 = Manifest(root)
    assert len(m2.records()) == len(res)


def test_decode_text_invalid_utf8_dead_letters(spark):
    """The reference raises invalidEncoding on bad bytes
    (BuildLogParser.swift:65-67); our pipeline routes the row aside."""
    from buildlogparser_spark.operators.route import decode_text, split_dead_letter

    rows = [
        (1, bytearray("plain ascii".encode())),
        (2, bytearray("snowman ☃ utf8".encode())),
        (3, bytearray(b"\xff\xfe broken")),        # invalid UTF-8
        (4, bytearray(b"trunc \xe2\x98")),          # truncated multibyte
    ]
    df = spark.createDataFrame(rows, "id int, text_bytes binary")
    decoded = decode_text(df)
    good, dead = split_dead_letter(decoded)
    assert {r.id for r in good.collect()} == {1, 2}
    assert {r.id for r in dead.collect()} == {3, 4}
    assert good.filter(F.col("id") == 2).collect()[0].text == "snowman ☃ utf8"


def test_dead_letter_routing(spark):
    from buildlogparser_spark.operators.route import split_dead_letter

    tr = load_transcripts(spark, SF_SMOKE)
    corrupted = tr.withColumn(
        "text", F.when(F.col("turn_idx") % 97 == 3, F.lit(None)).otherwise(F.col("text")))
    good, dead = split_dead_letter(corrupted)
    assert good.count() + dead.count() == tr.count()
    assert dead.filter(F.col("text").isNotNull()).count() == 0
    assert dead.count() > 0


def test_route_writes_iceberg_plan_construction(spark, diags):
    """No Iceberg catalog in this sandbox: the V2 writer with native
    days/bucket partition transforms must build, and executing must fail
    with the missing-catalog analysis error — not an API error in our
    wiring (the construct path is what a cluster run exercises before
    Iceberg takes over)."""
    import pytest

    from buildlogparser_spark.operators.route import route_writes_iceberg

    with pytest.raises(Exception) as ei:
        route_writes_iceberg(diags.limit(10), "blp_test")
    msg = str(ei.value)
    assert "catalog" in msg.lower() or "iceberg" in msg.lower() or \
        "TABLE_OR_VIEW_NOT_FOUND" in msg


def test_sessionize_gap_semantics(spark):
    """New session exactly when idle gap exceeds the threshold; bounds and
    duration from min/max epoch within the session."""
    from buildlogparser_spark.operators.aggregate import session_stats

    rows = [
        ("c1", 0, 0), ("c1", 1, 60), ("c1", 2, 120),       # session 0
        ("c1", 3, 120 + 31 * 60),                           # 31 min gap → 1
        ("c1", 4, 120 + 31 * 60 + 10),
        ("c2", 0, 50),                                      # own conv
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, sec long") \
        .withColumn("ts", F.timestamp_seconds(F.col("sec"))).drop("sec")
    got = {(r.conv_id, r.session_id): (r.n_turns, r.duration_s)
           for r in session_stats(df, gap_minutes=30).collect()}
    assert got == {("c1", 0): (3, 120), ("c1", 1): (2, 10), ("c2", 0): (1, 0)}


def test_files_affected_approx_within_rsd(spark, diags):
    from buildlogparser_spark.operators.aggregate import (
        files_affected, files_affected_approx)

    exact = files_affected(diags).collect()[0].files_affected
    approx = files_affected_approx(diags, rsd=0.05).collect()[0] \
        .files_affected_approx
    assert abs(approx - exact) <= max(3, 0.15 * exact)


def test_duration_percentiles_approx_accuracy(spark):
    """The approx sibling must land within 5% relative error of the exact
    interpolated percentiles on the sf0.001 stream (p50/p90; p99 of a
    discrete distribution may snap to a neighboring observed value, so it
    gets a looser 10% bound)."""
    from buildlogparser_spark.operators.aggregate import (
        step_duration_percentiles, step_duration_percentiles_approx)
    from buildlogparser_spark.transcripts import load_transcripts

    tr = load_transcripts(spark, "/root/testdata/sf0.001")
    exact = {r.tool: r for r in step_duration_percentiles(tr).collect()}
    approx = {r.tool: r for r in step_duration_percentiles_approx(tr).collect()}
    assert set(exact) == set(approx) and len(exact) >= 5
    for tool, e in exact.items():
        a = approx[tool]
        assert a.n == e.n and a.max_us == e.max_us
        for fld, tol in (("p50_us", 0.05), ("p90_us", 0.05), ("p99_us", 0.10)):
            ev, av = getattr(e, fld), getattr(a, fld)
            assert abs(av - ev) <= tol * max(ev, 1), (tool, fld, ev, av)
