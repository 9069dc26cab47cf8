"""Sink-side row rendering — the reference's TextOutput / JSONOutput
projections as column expressions (SURVEY.md §2.6).

* :func:`render_text` — TextOutput's emoji line format
  (OutputFormatters.swift:38-51): ``{icon} {file}:{line}: {severity} -
  {message}`` when file+line are present, else ``{icon} {severity} -
  {message}``. ``errors_only`` mirrors the sink flag
  (OutputFormatters.swift:33-35).
* :func:`json_projection` — JSONOutput's wire schema
  (DiagnosticJSON — OutputFormatters.swift:451-467): exactly
  message/severity/file/line/column/relatedMessages; drops
  source/category/raw/buildTarget. On the stateless default stack
  related_messages is always [] so the oracled projection carries the five
  scalar fields.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_ICON = {"error": "❌", "warning": "⚠️", "info": "ℹ️", "note": "📝"}


def _icon_col() -> Column:
    c = F.lit(_ICON["note"])
    for sev in ("info", "warning", "error"):
        c = F.when(F.col("severity") == sev, F.lit(_ICON[sev])).otherwise(c)
    return c


def render_text(diags: DataFrame, errors_only: bool = False) -> DataFrame:
    if errors_only:
        diags = diags.filter(F.col("severity") == "error")
    with_loc = F.concat(
        _icon_col(), F.lit(" "), F.col("file"), F.lit(":"),
        F.col("line").cast("string"), F.lit(": "), F.col("severity"),
        F.lit(" - "), F.col("message"))
    without = F.concat(
        _icon_col(), F.lit(" "), F.col("severity"), F.lit(" - "), F.col("message"))
    return diags.select(
        "conv_id", "turn_idx",
        F.when(F.col("file").isNotNull() & F.col("line").isNotNull(), with_loc)
        .otherwise(without).alias("rendered"),
    )


def render_text_sql(diagnostics_select: str, errors_only: bool = False) -> str:
    where = "WHERE severity = 'error'" if errors_only else ""
    icon = ("CASE severity WHEN 'error' THEN '❌' WHEN 'warning' THEN '⚠️' "
            "WHEN 'info' THEN 'ℹ️' ELSE '📝' END")
    return f"""
SELECT conv_id, turn_idx,
  CASE WHEN file IS NOT NULL AND line IS NOT NULL
       THEN {icon} || ' ' || file || ':' || CAST(line AS STRING) || ': '
            || severity || ' - ' || message
       ELSE {icon} || ' ' || severity || ' - ' || message
  END AS rendered
FROM ({diagnostics_select}) d {where}
"""


def json_projection(diags: DataFrame) -> DataFrame:
    return diags.select("conv_id", "turn_idx", "message", "severity",
                        "file", "line", "column")


def json_projection_sql(diagnostics_select: str) -> str:
    return (f'SELECT conv_id, turn_idx, message, severity, file, line, "column" '
            f"FROM ({diagnostics_select}) d")
