"""Broadcast-join enrichment (the graft's lookup stage).

The reference has no joins (SURVEY.md §2.5) — the graft adds small-dimension
enrichment per BASELINE.json: ``tool`` → tool_registry, ``role`` →
role_severity. Both dims are tiny (≤100 rows) so we always hint
``F.broadcast``: the 10^12-row fact side is never shuffled for these joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..transcripts import role_severity, tool_registry, role_severity_sql, tool_registry_sql


def enrich(diags: DataFrame) -> DataFrame:
    """Left-join tool_family/vendor and the role's default severity onto the
    diagnostics; no shuffle of the fact table (broadcast hash joins)."""
    spark = diags.sparkSession
    tools = tool_registry(spark)
    roles = role_severity(spark)
    return (
        diags
        .join(F.broadcast(tools), "tool", "left")
        .join(F.broadcast(roles), "role", "left")
    )


def enriched_sql(diagnostics_select: str) -> str:
    """DuckDB twin: the same left joins over a diagnostics SELECT body."""
    return f"""
SELECT d.*, tr.tool_family, tr.vendor, rs.default_severity
FROM ({diagnostics_select}) d
LEFT JOIN {tool_registry_sql()} tr ON d.tool = tr.tool
LEFT JOIN {role_severity_sql()} rs ON d.role = rs.role
"""
