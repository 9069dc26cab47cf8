"""Verbose text render + JSON document contract tests.

Reference contracts: TextOutput verbose mode appends relatedMessages with
caret-alignment preservation (OutputFormatters.swift:53-64); JSONOutput
writes one {diagnostics, metadata} document with DiagnosticJSON wire fields
(OutputFormatters.swift:113-131, 451-477).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from buildlogparser_spark.operators import render as rnd
from buildlogparser_spark.operators.assemble import STATEFUL_SCHEMA


def _blocks(spark):
    rows = [
        ("c1", 0, "/a/File.swift", 12, 3, "error", "cannot find 'x' in scope",
         ["    let x = y", "        ^", "note: did you mean 'z'?"],
         "compiler", "error", "/a/File.swift:12:3: error: cannot find 'x' in scope", None),
        ("c1", 7, None, None, None, "warning", "BUILD FAILED",
         [], "xcodebuild", "build_failed", "** BUILD FAILED **", None),
    ]
    return spark.createDataFrame(rows, STATEFUL_SCHEMA)


def test_render_text_verbose_formats(spark):
    out = {r.start_turn_idx: r.rendered
           for r in rnd.render_text_verbose(_blocks(spark)).collect()}
    lines = out[0].split("\n")
    assert lines[0] == "❌ /a/File.swift:12: error - cannot find 'x' in scope"
    # ordinary related line: standard "📎 " spacing
    assert lines[1] == "    📎     let x = y"
    # caret line: NO space after 📎 — original spacing preserved
    # (OutputFormatters.swift:56-58)
    assert lines[2] == "    📎        ^"
    assert lines[3] == "    📎 note: did you mean 'z'?"
    # no file/line → short header; no related → single line
    assert out[7] == "⚠️ warning - BUILD FAILED"


def test_render_text_verbose_errors_only(spark):
    out = rnd.render_text_verbose(_blocks(spark), errors_only=True).collect()
    assert len(out) == 1 and out[0].rendered.startswith("❌")


def test_json_document_contract(spark):
    diags = _blocks(spark).select(
        "conv_id", F.col("start_turn_idx").alias("turn_idx"), "file", "line",
        "column", "severity", "message", "related_messages")
    doc = json.loads(rnd.json_document(
        diags, verbose=True, timestamp="2024-01-01T00:00:00Z").collect()[0].doc)
    assert set(doc) == {"diagnostics", "metadata"}
    md = doc["metadata"]
    assert md["totalCount"] == 2
    assert md["errorCount"] == 1 and md["warningCount"] == 1
    assert md["infoCount"] == 0 and md["noteCount"] == 0
    assert md["verbose"] is True and md["timestamp"] == "2024-01-01T00:00:00Z"
    # DiagnosticJSON wire fields exactly (drops source/category/raw/target);
    # nulls are omitted by to_json (JSONEncoder drops nil optionals too)
    first = doc["diagnostics"][0]
    assert first["message"] == "cannot find 'x' in scope"
    assert first["relatedMessages"][1] == "        ^"
    assert "source" not in first and "category" not in first and "raw" not in first
    # ordered by (conv_id, turn_idx)
    assert [d["severity"] for d in doc["diagnostics"]] == ["error", "warning"]


def test_json_metadata_counts(spark):
    diags = _blocks(spark)
    row = rnd.json_metadata(diags).collect()[0]
    assert (row.total_count, row.error_count, row.warning_count,
            row.info_count, row.note_count, row.verbose) == (2, 1, 1, 0, 0, False)


def test_summary_text_verbose(spark):
    out = rnd.summary_text(_blocks(spark), verbose=True).collect()[0].summary
    expected = (
        "📊 Build Log Analysis Summary\n" + "═" * 63 + "\n\n"
        "Total Issues Found: 2\n"
        "❌ Errors: 1\n"
        "⚠️  Warnings: 1\n"
        # generateFileBreakdown's section header (OutputFormatters.swift:345)
        "\n📋 Issue Breakdown by File:\n"
        "\n📄 /a/File.swift:\n   ❌ 1 error(s)\n"
        "\n📄 Unknown:\n   ⚠️  1 warning(s)\n"
        "\n✅ Analysis completed\n"
    )
    assert out == expected


def test_json_metadata_empty_input_counts_zero(spark):
    # empty input: sum() is NULL in Spark — the reference emits 0 counts
    empty = _blocks(spark).filter(F.col("severity") == "nope")
    row = rnd.json_metadata(empty).collect()[0]
    assert (row.total_count, row.error_count, row.warning_count,
            row.info_count, row.note_count) == (0, 0, 0, 0, 0)


def test_render_text_verbose_unicode_whitespace_caret(spark):
    # NBSP-indented caret: the reference trims the Unicode .whitespaces set,
    # so the line still counts as a caret (no space after 📎)
    rows = [("c1", 0, "/a/F.swift", 1, 1, "error", "m",
             ["  ^"], "compiler", "error", "raw", None)]
    from buildlogparser_spark.operators.assemble import STATEFUL_SCHEMA
    df = spark.createDataFrame(rows, STATEFUL_SCHEMA)
    out = rnd.render_text_verbose(df).collect()[0].rendered
    assert out.split("\n")[1] == "    📎  ^"


def test_summary_text_happy_path(spark):
    empty = _blocks(spark).filter(F.col("severity") == "nope")
    out = rnd.summary_text(empty).collect()[0].summary
    assert "Total Issues Found: 0" in out
    assert "🎉 No issues found! Build log looks clean." in out
    assert "❌" not in out


def test_summary_text_errors_only(spark):
    out = rnd.summary_text(_blocks(spark), errors_only=True).collect()[0].summary
    assert "Total Issues Found: 1" in out and "⚠️" not in out


def test_stats_text_report(spark):
    out = rnd.stats_text(_blocks(spark)).collect()[0].stats
    assert "Total diagnostics processed: 2" in out
    assert "❌ Errors: 1\n" in out and "⚠️  Warnings: 1\n" in out
    assert "ℹ️  Information: 0\n" in out and "📝 Notes: 0\n" in out
    assert "📁 Files affected: 2" in out
    assert "🔥 Most issues by file:" in out
    # tie on count (1 vs 1) breaks by file name asc
    top = out.split("🔥 Most issues by file:\n")[1].split("\n📊")[0]
    assert top.splitlines() == ["   /a/File.swift: 1 issue(s)",
                                "   Unknown: 1 issue(s)"]
    assert "   ❌ Errors: 50.0%" in out and "   ⚠️  Warnings: 50.0%" in out
    assert "   ℹ️" not in out.split("📊")[1]  # zero severities omitted from %


def test_stats_text_single_file_no_top5(spark):
    one = _blocks(spark).filter(F.col("severity") == "error")
    out = rnd.stats_text(one).collect()[0].stats
    assert "📁 Files affected: 1" in out and "🔥" not in out


def test_json_document_sharded_partition_of_unsharded(spark):
    """Sharded documents are a partition of the unsharded one: every
    diagnostic lands in exactly one shard (whole conversations together),
    per-shard metadata counts its own diagnostics, and the field-wise sum
    over shards equals json_metadata."""
    from buildlogparser_spark.datagen import conversations_df
    from buildlogparser_spark.operators.classify import classify

    diags = classify(conversations_df(spark, 77, 12)).select(
        "conv_id", "turn_idx", "file", "line", "column", "severity",
        "message", "related_messages")
    whole = json.loads(rnd.json_document(diags).collect()[0].doc)
    shards = {r.shard: json.loads(r.doc)
              for r in rnd.json_document_sharded(diags, n_shards=8).collect()}
    assert 1 < len(shards) <= 8  # genuinely parallel output
    # wire payloads carry no conv_id — compare the diagnostic multiset
    key = lambda d: json.dumps(d, sort_keys=True)  # noqa: E731
    all_sharded = [d for doc in shards.values() for d in doc["diagnostics"]]
    assert sorted(map(key, all_sharded)) == sorted(
        map(key, whole["diagnostics"]))
    for doc in shards.values():
        assert doc["metadata"]["totalCount"] == len(doc["diagnostics"])
    for fld in ("totalCount", "errorCount", "warningCount", "infoCount",
                "noteCount"):
        assert sum(doc["metadata"][fld] for doc in shards.values()) \
            == whole["metadata"][fld]
    # (conversations never split across shards by construction: the shard
    # key is a deterministic function of conv_id alone)
