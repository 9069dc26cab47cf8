"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship parse→classify→aggregate pipeline on
sf0.001. ``queries()``/``oracle_sql()`` expose each implemented operator
(SURVEY.md §2) side-by-side with its DuckDB-equivalent SQL; the transcript
input itself is derived deterministically from the provided ``events`` table
(see buildlogparser_spark/transcripts.py) so both engines compute over
identical data.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from buildlogparser_spark.transcripts import TRANSCRIPT_SQL, load_transcripts
from buildlogparser_spark.operators.classify import classified_sql, classify
from buildlogparser_spark.operators import aggregate as agg
from buildlogparser_spark.operators.enrich import enrich, enriched_sql

# Diagnostics projection shared by Spark and DuckDB (no ts/related_messages:
# timestamps hash differently across engines and related_messages is always
# [] on the stateless path).
_DIAG_COLS = [
    "conv_id", "turn_idx", "role", "tool", "rule_id", "file", "line", "column",
    "severity", "message", "source", "category", "raw", "build_target", "diag_class",
]

_DIAG_SQL = "(" + classified_sql(TRANSCRIPT_SQL) + ")"
_DIAG_SELECT = (
    "SELECT conv_id, turn_idx, role, tool, rule_id, file, line, \"column\", severity, "
    "message, source, category, raw, build_target, diag_class FROM " + _DIAG_SQL + " d"
)


def _diags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return classify(load_transcripts(spark, sf_dir))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: parse → classify → enrich → per-sink aggregate on sf0.001."""
    diags = enrich(_diags(spark, "/root/testdata/sf0.001"))
    return (
        diags.groupBy("diag_class", "severity", "tool_family")
        .agg(F.count("*").alias("n"))
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "transcript_view": lambda spark, sf: load_transcripts(spark, sf).select(
            "conv_id", "turn_idx", "role", "text", "tool"),
        "classify_diagnostics": lambda spark, sf: _diags(spark, sf).select(*_DIAG_COLS),
        "severity_counts": lambda spark, sf: agg.severity_counts(_diags(spark, sf)),
        "category_counts": lambda spark, sf: agg.category_counts(_diags(spark, sf)),
        "errors_only": lambda spark, sf: _diags(spark, sf)
            .filter(F.col("severity") == "error")
            .select("conv_id", "turn_idx", "message", "severity", "file", "line", "column"),
        "errors_per_tool": lambda spark, sf: agg.errors_per_tool(_diags(spark, sf)),
        "warnings_per_conversation": lambda spark, sf: agg.warnings_per_conversation(
            _diags(spark, sf)),
        "per_file_counts": lambda spark, sf: agg.per_file_counts(_diags(spark, sf)),
        "top_files": lambda spark, sf: agg.top_files(_diags(spark, sf)),
        "severity_pct": lambda spark, sf: agg.severity_pct(_diags(spark, sf)),
        "files_affected": lambda spark, sf: agg.files_affected(_diags(spark, sf)),
        "line_byte_counts": lambda spark, sf: agg.line_byte_counts(
            load_transcripts(spark, sf)),
        "duration_histogram": lambda spark, sf: agg.duration_histogram(
            load_transcripts(spark, sf)),
        "enriched_class_counts": lambda spark, sf: enrich(_diags(spark, sf))
            .groupBy("diag_class", "tool_family", "default_severity")
            .agg(F.count("*").alias("n")),
    }


def oracle_sql() -> dict[str, str]:
    d = _DIAG_SQL
    return {
        "transcript_view": (
            "SELECT conv_id, turn_idx, role, text, tool FROM (" + TRANSCRIPT_SQL + ") t"),
        "classify_diagnostics": _DIAG_SELECT,
        "severity_counts": f"""
            SELECT count(*) AS total_count,
                   CAST(coalesce(sum(CASE WHEN severity='error' THEN 1 ELSE 0 END), 0) AS BIGINT) AS error_count,
                   CAST(coalesce(sum(CASE WHEN severity='warning' THEN 1 ELSE 0 END), 0) AS BIGINT) AS warning_count,
                   CAST(coalesce(sum(CASE WHEN severity='info' THEN 1 ELSE 0 END), 0) AS BIGINT) AS info_count,
                   CAST(coalesce(sum(CASE WHEN severity='note' THEN 1 ELSE 0 END), 0) AS BIGINT) AS note_count
            FROM {d} dg""",
        "category_counts": f"SELECT category, count(*) AS n FROM {d} dg GROUP BY category",
        "errors_only": f"""
            SELECT conv_id, turn_idx, message, severity, file, line, "column"
            FROM {d} dg WHERE severity = 'error'""",
        "errors_per_tool": f"""
            SELECT tool, count(*) AS n_errors FROM {d} dg
            WHERE severity = 'error' GROUP BY tool""",
        "warnings_per_conversation": f"""
            SELECT conv_id, count(*) AS n_warnings FROM {d} dg
            WHERE severity = 'warning' GROUP BY conv_id""",
        "per_file_counts": f"""
            SELECT coalesce(file, 'Unknown') AS file, count(*) AS n,
                   CAST(sum(CASE WHEN severity='error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
                   CAST(sum(CASE WHEN severity='warning' THEN 1 ELSE 0 END) AS BIGINT) AS n_warnings
            FROM {d} dg GROUP BY 1""",
        "top_files": f"""
            SELECT coalesce(file, 'Unknown') AS file, count(*) AS n
            FROM {d} dg GROUP BY 1 ORDER BY n DESC, file ASC LIMIT 5""",
        "severity_pct": f"""
            SELECT severity, n, round(n * 100.0 / sum(n) OVER (), 2) AS pct
            FROM (SELECT severity, count(*) AS n FROM {d} dg GROUP BY severity) c""",
        "files_affected": f"""
            SELECT count(DISTINCT coalesce(file, 'Unknown')) AS files_affected FROM {d} dg""",
        "line_byte_counts": (
            "SELECT count(*) AS total_lines, CAST(sum(strlen(text) + 1) AS BIGINT) AS total_bytes "
            "FROM (" + TRANSCRIPT_SQL + ") t"),
        "duration_histogram": (
            """
            SELECT CAST(floor(log2(step_duration_us)) AS BIGINT) AS bucket, count(*) AS n
            FROM (
              SELECT epoch_us(ts) - lag(epoch_us(ts)) OVER
                     (PARTITION BY conv_id ORDER BY turn_idx) AS step_duration_us
              FROM (""" + TRANSCRIPT_SQL + """) t
            ) dd WHERE step_duration_us > 0 GROUP BY 1"""),
        "enriched_class_counts": (
            "SELECT diag_class, tool_family, default_severity, count(*) AS n FROM ("
            + enriched_sql(_DIAG_SELECT)
            + ") e GROUP BY diag_class, tool_family, default_severity"),
    }
