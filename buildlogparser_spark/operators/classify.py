"""Stateless per-line classify: the default CLI stack as a column cascade.

With the reference's default rule stack (BuildLogParserCommand.swift:92-98 —
``[CompileErrorRule("compiler"), XcodeBuildRule(nocommon),
SwiftBuildRule(nocommon)]``) the ``consumeLine`` state machine
(BuildLogParser.swift:325-364) degenerates to a *stateless* per-line
classifier, because ``SwiftBuildRule.isEnd`` falls through to ``return true``
(SwiftBuildRule.swift:52): every line takes the end-branch, flushes the
in-flight diagnostic and re-scans ``matchStart``. Consequently the default
pipeline is: per line, first-match-wins over the flattened rule order

    R1 CompileErrorRule(compiler)
    R2 BuildFailedRule … R7 XCTestRule        (XcodeBuildRule sub-order)
    R8* SwiftBuildCompileErrorRule (shadowed by R1 — same regex)
    R9 SwiftBuildModuleFailedRule, R10 SwiftBuildProgressRule

and ``related_messages`` is always empty. This file implements that cascade
twice from the same regex constants (rules/table.py):

* :func:`classify` — Spark DataFrame ops. Pure JVM-side expressions
  (``rlike``/``regexp_extract``/``when``): whole-stage codegen, no Python in
  the hot path, embarrassingly parallel (no shuffle, no ordering needed),
  filter/column pruning pushes to the scan. This is the 100 TB path.
* :func:`classified_sql` — the equivalent DuckDB SQL (CTE) used as the
  driver's correctness oracle.

Differential-tested against the pure-Python oracle in tests/.

Fidelity notes:
  * fastFail pre-filters (CompileErrorRule.swift:31-35 etc.) are semantically
    redundant (they never reject a line its matchStart would accept) — we keep
    a cheap ``contains`` guard ahead of the expensive regex for the same
    reason the reference does: skip regex work on the ~90% of lines that
    cannot match.
  * Swift ``Int(...)`` overflow rejects a whole R1 match
    (CompileErrorRule.swift:57-63): guarded via digit-run length ≤ 18.
  * XCTest file/line extraction does NOT reject on overflow — the field just
    goes null (XCTestRule.swift:262-270).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..rules.table import (
    BUILD_COMMAND_RE,
    COMPILE_ERROR_RE,
    FILE_INFO_RE,
    MODULE_FAILED_RE,
    PROGRESS_RE,
    SUITE_NAME_RE,
    SWIFT_COMPILE_TASK_RE,
    TEST_NAME_RE,
)

def _T():
    """Lazy text column ref (F.col needs an active session in classic mode)."""
    return F.col("text")


DIAG_COLUMNS = [
    "rule_id", "file", "line", "column", "severity", "message",
    "source", "category", "build_target",
]

_STEP_BOUNDARY_CATS = (
    "progress", "test_start", "test_success", "test_info",
    "test_suite_start", "test_suite_success", "test_suite_info", "build_failed",
)
_TOOL_INVOCATION_CATS = ("swift_compilation_task_failed", "build_command_failed")


def _ext(pat: str, group: int) -> Column:
    return F.regexp_extract(_T(), pat, group)


def _int_guard(pat: str, group: int) -> Column:
    """Extract a \\d+ group as bigint, null (without erroring under ANSI) if
    the digit run cannot fit in 64 bits."""
    g = _ext(pat, group)
    return F.when(F.length(g) <= 18, g.cast("long")).otherwise(F.lit(None).cast("long"))


_SEP = "\x01"


def _packed(pat: str, groups: list[int]) -> Column:
    """ONE regex execution extracting several capture groups at once: rewrite
    the (anchored, full-line) pattern's match into the groups joined by an
    \\x01 separator, then split. The naive cascade re-executes the same
    pattern per extracted group (~6-9× per matching row for R1 — measured as
    the dominant classify cost, ROADMAP r01 #2); this brings it to one
    ``rlike`` (the predicate) + one ``regexp_replace``. Only valid for
    ^…$-anchored patterns (an unanchored search would keep the surrounding
    text around the replacement). Reads with ``F.get`` (0-based), which is
    null-on-missing — safe under ANSI on rows where the pattern did not
    match and the array has one element."""
    repl = _SEP.join(f"${g}" for g in groups)
    return F.split(F.regexp_replace(_T(), pat, repl), _SEP)


def _grp(arr: Column, pat: str, group: int, idx: int, n: int) -> Column:
    """Read packed group ``idx`` (0-based) from an n-group packed array —
    falling back to exact per-group extraction when the split is not clean
    (``size != n``: adversarial text containing the \\x01 separator inside
    a capture group would otherwise shift fields and diverge from the
    reference). The fallback branch is regex-per-group but only executes on
    separator-containing matches, which real logs do not produce."""
    return F.when(F.size(arr) == n, F.get(arr, idx)).otherwise(_ext(pat, group))


def _int_guard_el(arr: Column, pat: str, group: int, idx: int, n: int) -> Column:
    g = _grp(arr, pat, group, idx, n)
    return F.when(F.length(g) <= 18, g.cast("long")).otherwise(F.lit(None).cast("long"))


def _searched(pat: str) -> Column:
    """Unanchored search success (Java regex find)."""
    return _T().rlike(pat)


def classify(transcripts: DataFrame) -> DataFrame:
    """transcripts(conv_id, turn_idx, role, text, tool, ts) → diagnostics.

    Output: input columns + rule_id/file/line/column/severity/message/
    related_messages/source/category/raw/build_target/diag_class; rows whose
    text matches no rule are dropped (they emit no diagnostic).
    """
    T = _T()
    # packed one-shot extractions for the anchored rules (see _packed)
    ce = _packed(COMPILE_ERROR_RE, [1, 3, 4, 5, 6])
    sct = _packed(SWIFT_COMPILE_TASK_RE, [1, 2, 3, 4])
    bc = _packed(BUILD_COMMAND_RE, [1, 2, 3])
    mf = _packed(MODULE_FAILED_RE, [1, 2])
    pg = _packed(PROGRESS_RE, [1, 2, 3, 4])
    # --- first-match-wins rule dispatch -----------------------------------
    r1 = (
        (T.contains("error:") | T.contains("warning:"))  # fastFail gate
        & T.rlike(COMPILE_ERROR_RE)
        & (F.length(_grp(ce, COMPILE_ERROR_RE, 3, 1, 5)) <= 18)
        & (F.length(_grp(ce, COMPILE_ERROR_RE, 4, 2, 5)) <= 18)
    )
    r2 = T == "** BUILD FAILED **"  # regex is an exact literal (BuildFailedRule.swift:9)
    r3 = T.rlike(r"^--- xcodebuild: WARNING: (.+)$")
    r4 = T.contains("SwiftCompile normal ") & T.rlike(SWIFT_COMPILE_TASK_RE)
    r5 = (
        T.contains("(in target '") & T.rlike(BUILD_COMMAND_RE)
        & ~_grp(bc, BUILD_COMMAND_RE, 1, 0, 3).contains("SwiftCompile")
    )
    r6 = T.startswith("Undefined symbols for architecture")
    r7a = T.startswith("Test Case")
    r7b = T.startswith("Test Suite")
    r7c = T.contains("XCTAssert") & T.contains("failed")
    r7d = T.contains("error:") & T.contains("test")
    r9 = T.startswith("error: emit-module command failed") & T.rlike(MODULE_FAILED_RE)
    r10 = T.startswith("[") & T.rlike(PROGRESS_RE)

    rule_id = (
        F.when(r1, "r1_compile")
        .when(r2, "r2_build_failed")
        .when(r3, "r3_xcb_warning")
        .when(r4, "r4_swiftcompile_task")
        .when(r5, "r5_build_command")
        .when(r6, "r6_linker")
        .when(r7a, "r7a_test_case")
        .when(r7b, "r7b_test_suite")
        .when(r7c, "r7c_assertion")
        .when(r7d, "r7d_test_error")
        .when(r9, "r9_module_failed")
        .when(r10, "r10_progress")
    )

    df = transcripts.withColumn("rule_id", rule_id).filter(F.col("rule_id").isNotNull())

    R = F.col("rule_id")
    null_s = F.lit(None).cast("string")
    null_l = F.lit(None).cast("long")

    # --- shared XCTest helpers -------------------------------------------
    test_name_hit = _searched(TEST_NAME_RE)
    test_name = _ext(TEST_NAME_RE, 1)
    test_target = F.when(test_name_hit, F.substring_index(test_name, " ", 1)).otherwise(null_s)
    suite_hit = _searched(SUITE_NAME_RE)
    suite_name = F.when(suite_hit, _ext(SUITE_NAME_RE, 1)).otherwise(F.lit("Unknown Suite"))
    status = (
        F.when(T.contains("failed"), "Failed")
        .when(T.contains("passed"), "Passed")
        .when(T.contains("started"), "Started")
        .otherwise("Info")
    )
    fi_hit = _searched(FILE_INFO_RE)
    fi_file = F.when(fi_hit, _ext(FILE_INFO_RE, 1)).otherwise(null_s)
    fi_line = F.when(fi_hit, _int_guard(FILE_INFO_RE, 2)).otherwise(null_l)
    # substring from the first "XCTAssert" (XCTestRule.swift:234-240)
    assert_msg = F.trim(F.substring(T, F.locate("XCTAssert", T), F.lit(2 ** 30)))
    # substring one char past "error:" (XCTestRule.swift:242-249)
    err_msg = F.trim(F.substring(T, F.locate("error:", T) + F.lit(7), F.lit(2 ** 30)))

    file_c = (
        F.when(R == "r1_compile", _grp(ce, COMPILE_ERROR_RE, 1, 0, 5))
        .when(R.isin("r7c_assertion", "r7d_test_error"), fi_file)
        .otherwise(null_s)
    )
    line_c = (
        F.when(R == "r1_compile", _int_guard_el(ce, COMPILE_ERROR_RE, 3, 1, 5))
        .when(R.isin("r7c_assertion", "r7d_test_error"), fi_line)
        .otherwise(null_l)
    )
    column_c = F.when(R == "r1_compile", _int_guard_el(ce, COMPILE_ERROR_RE, 4, 2, 5)).otherwise(null_l)

    r1_sev = _grp(ce, COMPILE_ERROR_RE, 5, 3, 5)
    severity_c = (
        F.when(R == "r1_compile", r1_sev)
        .when(R == "r3_xcb_warning", "warning")
        .when(R == "r10_progress", "info")
        .when(
            R.isin("r7a_test_case", "r7b_test_suite"),
            F.when(T.contains("failed"), "error").otherwise("info"),
        )
        .otherwise("error")
    )

    message_c = (
        F.when(R == "r1_compile", _grp(ce, COMPILE_ERROR_RE, 6, 4, 5))
        .when(R == "r2_build_failed", "BUILD FAILED")
        .when(R == "r3_xcb_warning", _ext(r"^--- xcodebuild: WARNING: (.+)$", 1))
        .when(R == "r4_swiftcompile_task", F.concat(
            F.lit("Swift compilation task failed for "), _grp(sct, SWIFT_COMPILE_TASK_RE, 1, 0, 4),
            F.lit(": "), _grp(sct, SWIFT_COMPILE_TASK_RE, 2, 1, 4)))
        .when(R == "r5_build_command", F.concat(
            F.lit("Build command failed: "), _grp(bc, BUILD_COMMAND_RE, 1, 0, 3)))
        .when(R == "r6_linker", T)
        .when(R == "r7a_test_case", F.concat(
            F.lit("Test: "),
            F.when(test_name_hit, test_name).otherwise(F.lit("Unknown Test")),
            F.lit(" - "), status))
        .when(R == "r7b_test_suite", F.concat(F.lit("Test Suite: "), suite_name,
                                              F.lit(" - "), status))
        .when(R == "r7c_assertion", assert_msg)
        .when(R == "r7d_test_error", err_msg)
        .when(R == "r9_module_failed", F.concat(
            F.lit("Module compilation failed with exit code "),
            _grp(mf, MODULE_FAILED_RE, 1, 0, 2), _grp(mf, MODULE_FAILED_RE, 2, 1, 2)))
        .when(R == "r10_progress", F.concat(
            _grp(pg, PROGRESS_RE, 3, 2, 4), F.lit(" "), _grp(pg, PROGRESS_RE, 4, 3, 4), F.lit(" ("),
            _grp(pg, PROGRESS_RE, 1, 0, 4), F.lit("/"), _grp(pg, PROGRESS_RE, 2, 1, 4), F.lit(")")))
    )

    source_c = (
        F.when(R == "r1_compile", "compiler")
        .when(R == "r6_linker", "linker")
        .when(R.startswith("r7"), "xctest")
        .when(R.isin("r9_module_failed", "r10_progress"), "swift-build")
        .otherwise("xcodebuild")
    )

    category_c = (
        F.when(R == "r1_compile", r1_sev)  # category == severity string (empty prefix)
        .when(R == "r2_build_failed", "build_failed")
        .when(R == "r3_xcb_warning", "warning")
        .when(R == "r4_swiftcompile_task", "swift_compilation_task_failed")
        .when(R == "r5_build_command", "build_command_failed")
        .when(R == "r6_linker", "undefined_symbols")
        .when(R == "r7a_test_case",
              F.when(T.contains("failed"), "test_failure")
              .when(T.contains("passed"), "test_success")
              .when(T.contains("started"), "test_start")
              .otherwise("test_info"))
        .when(R == "r7b_test_suite",
              F.when(T.contains("failed"), "test_suite_failure")
              .when(T.contains("passed"), "test_suite_success")
              .when(T.contains("started"), "test_suite_start")
              .otherwise("test_suite_info"))
        .when(R == "r7c_assertion", "assertion_failure")
        .when(R == "r7d_test_error", "test_error")
        .when(R == "r9_module_failed", "module_failed")
        .when(R == "r10_progress", "progress")
    )

    target_c = (
        F.when(R == "r4_swiftcompile_task", F.concat(
            _grp(sct, SWIFT_COMPILE_TASK_RE, 3, 2, 4), F.lit(" ("), _grp(sct, SWIFT_COMPILE_TASK_RE, 4, 3, 4), F.lit(")")))
        .when(R == "r5_build_command", F.concat(
            _grp(bc, BUILD_COMMAND_RE, 2, 1, 3), F.lit(" ("), _grp(bc, BUILD_COMMAND_RE, 3, 2, 3), F.lit(")")))
        .when(R.isin("r7a_test_case", "r7c_assertion"), test_target)
        .when(R == "r7b_test_suite", suite_name)
        .when(R == "r10_progress", _grp(pg, PROGRESS_RE, 4, 3, 4))
        .otherwise(null_s)
    )

    diag_class = (
        F.when(F.col("category").isin(*_STEP_BOUNDARY_CATS), "step-boundary")
        .when(F.col("category").isin(*_TOOL_INVOCATION_CATS), "tool-invocation")
        .when(F.col("severity") == "error", "error")
        .when(F.col("severity") == "warning", "warning")
        .otherwise("note")
    )

    return (
        df.withColumn("file", file_c)
        .withColumn("line", line_c)
        .withColumn("column", column_c)
        .withColumn("severity", severity_c)
        .withColumn("message", message_c)
        .withColumn("related_messages", F.array().cast("array<string>"))
        .withColumn("source", source_c)
        .withColumn("category", category_c)
        .withColumn("raw", T)
        .withColumn("build_target", target_c)
        .withColumn("diag_class", diag_class)
    )


# ---------------------------------------------------------------------------
# DuckDB twin (oracle SQL). Same cascade, rendered as SQL. The '' escaping is
# DuckDB-style; regexes are RE2-compatible (verified by tests).
# ---------------------------------------------------------------------------

def _sq(pat: str) -> str:
    """SQL-quote a regex/string literal."""
    return "'" + pat.replace("'", "''") + "'"


#: passthrough columns available without computation (from the transcript)
_SQL_PASSTHROUGH = ("conv_id", "turn_idx", "role", "text", "tool", "ts", "rule_id")
#: computed column order of the full (cols=None) projection
_SQL_COMPUTED = ("file", "line", "column", "severity", "message", "source",
                 "category", "raw", "build_target")


def classified_sql(transcripts_cte: str, cols: list[str] | None = None) -> str:
    """Return SQL text of the classified diagnostics over a transcripts CTE
    body (a SELECT producing conv_id, turn_idx, role, text, tool, ts).

    ``cols`` restricts the output projection (default: everything). Most
    oracle queries aggregate over one or two diagnostic fields; emitting
    only those lets DuckDB skip the regex-extract work and string
    materialization for the other ~12 columns — a deliberately slim oracle,
    since the driver runs it co-resident with the Spark JVM under memory
    pressure (CORRECTNESS_r02: 19 driver-side DuckDB OOMs). ``diag_class``
    pulls in its ``severity``/``category`` dependencies internally without
    emitting them unless requested."""
    exprs = _classified_sql_exprs()
    all_cols = list(_SQL_PASSTHROUGH) + list(_SQL_COMPUTED) + ["diag_class"]
    if cols is None:
        cols = all_cols
    unknown = [c for c in cols if c not in all_cols]
    if unknown:
        raise ValueError(f"unknown diagnostic columns: {unknown}")
    # diags0 computes requested computed cols + diag_class's dependencies
    inner = [c for c in cols if c != "diag_class"]
    if "diag_class" in cols:
        for dep in ("severity", "category"):
            if dep not in inner:
                inner.append(dep)
    sel = []
    for c in inner:
        if c in _SQL_PASSTHROUGH:
            sel.append(c)
        else:
            alias = f'"{c}"' if c == "column" else c
            sel.append(f"{exprs[c]} AS {alias}")
    out = ", ".join(
        exprs["diag_class"] + " AS diag_class" if c == "diag_class"
        else (f'"{c}"' if c == "column" else c)
        for c in cols)
    # MATERIALIZED: DuckDB inlines plain CTEs into every reference, so the
    # template-CASE transcript derivation and the regex-cascade rule_id would
    # re-evaluate once per downstream predicate/aggregate reference — measured
    # 6.1 s for a 2-column roll-up vs 0.06 s materialized at sf0.01 (the exact
    # DuckDB analog of the Spark-side snapshot in transcripts.load_transcripts)
    return f"""
WITH transcripts AS MATERIALIZED (
{transcripts_cte}
), tagged AS MATERIALIZED (
  SELECT *, {exprs["rule_id"]} AS rule_id
  FROM transcripts
), diags0 AS (
  SELECT {", ".join(sel)}
  FROM tagged WHERE rule_id IS NOT NULL
)
SELECT {out}
FROM diags0
"""


def _classified_sql_exprs() -> dict[str, str]:
    """Per-column SQL expression bodies of the classify cascade (DuckDB
    dialect), keyed by output column. ``rule_id`` runs over ``transcripts``;
    the rest run over ``tagged``; ``diag_class`` runs over ``diags0``."""
    ce = _sq(COMPILE_ERROR_RE)
    sct = _sq(SWIFT_COMPILE_TASK_RE)
    bc = _sq(BUILD_COMMAND_RE)
    mf = _sq(MODULE_FAILED_RE)
    pg = _sq(PROGRESS_RE)
    tn = _sq(TEST_NAME_RE)
    sn = _sq(SUITE_NAME_RE)
    fi = _sq(FILE_INFO_RE)
    xw = _sq(r"^--- xcodebuild: WARNING: (.+)$")

    return {
        "rule_id": f"""CASE
      WHEN (contains(text, 'error:') OR contains(text, 'warning:'))
           AND regexp_matches(text, {ce})
           AND length(regexp_extract(text, {ce}, 3)) <= 18
           AND length(regexp_extract(text, {ce}, 4)) <= 18 THEN 'r1_compile'
      WHEN text = '** BUILD FAILED **' THEN 'r2_build_failed'
      WHEN regexp_matches(text, {xw}) THEN 'r3_xcb_warning'
      WHEN contains(text, 'SwiftCompile normal ') AND regexp_matches(text, {sct})
           THEN 'r4_swiftcompile_task'
      WHEN contains(text, '(in target ''') AND regexp_matches(text, {bc})
           AND NOT contains(regexp_extract(text, {bc}, 1), 'SwiftCompile')
           THEN 'r5_build_command'
      WHEN starts_with(text, 'Undefined symbols for architecture') THEN 'r6_linker'
      WHEN starts_with(text, 'Test Case') THEN 'r7a_test_case'
      WHEN starts_with(text, 'Test Suite') THEN 'r7b_test_suite'
      WHEN contains(text, 'XCTAssert') AND contains(text, 'failed') THEN 'r7c_assertion'
      WHEN contains(text, 'error:') AND contains(text, 'test') THEN 'r7d_test_error'
      WHEN starts_with(text, 'error: emit-module command failed')
           AND regexp_matches(text, {mf}) THEN 'r9_module_failed'
      WHEN starts_with(text, '[') AND regexp_matches(text, {pg}) THEN 'r10_progress'
    END""",
        "file": f"""CASE
      WHEN rule_id = 'r1_compile' THEN regexp_extract(text, {ce}, 1)
      WHEN rule_id IN ('r7c_assertion', 'r7d_test_error') AND regexp_matches(text, {fi})
           THEN regexp_extract(text, {fi}, 1)
    END""",
        "line": f"""CASE
      WHEN rule_id = 'r1_compile' THEN CAST(regexp_extract(text, {ce}, 3) AS BIGINT)
      WHEN rule_id IN ('r7c_assertion', 'r7d_test_error') AND regexp_matches(text, {fi})
           AND length(regexp_extract(text, {fi}, 2)) <= 18
           THEN CAST(regexp_extract(text, {fi}, 2) AS BIGINT)
    END""",
        "column": f"""CASE WHEN rule_id = 'r1_compile'
         THEN CAST(regexp_extract(text, {ce}, 4) AS BIGINT) END""",
        "severity": f"""CASE
      WHEN rule_id = 'r1_compile' THEN regexp_extract(text, {ce}, 5)
      WHEN rule_id = 'r3_xcb_warning' THEN 'warning'
      WHEN rule_id = 'r10_progress' THEN 'info'
      WHEN rule_id IN ('r7a_test_case', 'r7b_test_suite')
           THEN CASE WHEN contains(text, 'failed') THEN 'error' ELSE 'info' END
      ELSE 'error'
    END""",
        "message": f"""CASE
      WHEN rule_id = 'r1_compile' THEN regexp_extract(text, {ce}, 6)
      WHEN rule_id = 'r2_build_failed' THEN 'BUILD FAILED'
      WHEN rule_id = 'r3_xcb_warning' THEN regexp_extract(text, {xw}, 1)
      WHEN rule_id = 'r4_swiftcompile_task'
           THEN 'Swift compilation task failed for ' || regexp_extract(text, {sct}, 1)
                || ': ' || regexp_extract(text, {sct}, 2)
      WHEN rule_id = 'r5_build_command'
           THEN 'Build command failed: ' || regexp_extract(text, {bc}, 1)
      WHEN rule_id = 'r6_linker' THEN text
      WHEN rule_id = 'r7a_test_case'
           THEN 'Test: '
                || (CASE WHEN regexp_matches(text, {tn})
                         THEN regexp_extract(text, {tn}, 1) ELSE 'Unknown Test' END)
                || ' - '
                || (CASE WHEN contains(text, 'failed') THEN 'Failed'
                         WHEN contains(text, 'passed') THEN 'Passed'
                         WHEN contains(text, 'started') THEN 'Started' ELSE 'Info' END)
      WHEN rule_id = 'r7b_test_suite'
           THEN 'Test Suite: '
                || (CASE WHEN regexp_matches(text, {sn})
                         THEN regexp_extract(text, {sn}, 1) ELSE 'Unknown Suite' END)
                || ' - '
                || (CASE WHEN contains(text, 'failed') THEN 'Failed'
                         WHEN contains(text, 'passed') THEN 'Passed'
                         WHEN contains(text, 'started') THEN 'Started' ELSE 'Info' END)
      WHEN rule_id = 'r7c_assertion'
           THEN trim(substr(text, strpos(text, 'XCTAssert')))
      WHEN rule_id = 'r7d_test_error'
           THEN trim(substr(text, strpos(text, 'error:') + 7))
      WHEN rule_id = 'r9_module_failed'
           THEN 'Module compilation failed with exit code '
                || regexp_extract(text, {mf}, 1) || regexp_extract(text, {mf}, 2)
      WHEN rule_id = 'r10_progress'
           THEN regexp_extract(text, {pg}, 3) || ' ' || regexp_extract(text, {pg}, 4)
                || ' (' || regexp_extract(text, {pg}, 1) || '/'
                || regexp_extract(text, {pg}, 2) || ')'
    END""",
        "source": """CASE
      WHEN rule_id = 'r1_compile' THEN 'compiler'
      WHEN rule_id = 'r6_linker' THEN 'linker'
      WHEN rule_id LIKE 'r7%' THEN 'xctest'
      WHEN rule_id IN ('r9_module_failed', 'r10_progress') THEN 'swift-build'
      ELSE 'xcodebuild'
    END""",
        "category": f"""CASE
      WHEN rule_id = 'r1_compile' THEN regexp_extract(text, {ce}, 5)
      WHEN rule_id = 'r2_build_failed' THEN 'build_failed'
      WHEN rule_id = 'r3_xcb_warning' THEN 'warning'
      WHEN rule_id = 'r4_swiftcompile_task' THEN 'swift_compilation_task_failed'
      WHEN rule_id = 'r5_build_command' THEN 'build_command_failed'
      WHEN rule_id = 'r6_linker' THEN 'undefined_symbols'
      WHEN rule_id = 'r7a_test_case'
           THEN CASE WHEN contains(text, 'failed') THEN 'test_failure'
                     WHEN contains(text, 'passed') THEN 'test_success'
                     WHEN contains(text, 'started') THEN 'test_start'
                     ELSE 'test_info' END
      WHEN rule_id = 'r7b_test_suite'
           THEN CASE WHEN contains(text, 'failed') THEN 'test_suite_failure'
                     WHEN contains(text, 'passed') THEN 'test_suite_success'
                     WHEN contains(text, 'started') THEN 'test_suite_start'
                     ELSE 'test_suite_info' END
      WHEN rule_id = 'r7c_assertion' THEN 'assertion_failure'
      WHEN rule_id = 'r7d_test_error' THEN 'test_error'
      WHEN rule_id = 'r9_module_failed' THEN 'module_failed'
      WHEN rule_id = 'r10_progress' THEN 'progress'
    END""",
        "raw": "text",
        "build_target": f"""CASE
      WHEN rule_id = 'r4_swiftcompile_task'
           THEN regexp_extract(text, {sct}, 3) || ' (' || regexp_extract(text, {sct}, 4) || ')'
      WHEN rule_id = 'r5_build_command'
           THEN regexp_extract(text, {bc}, 2) || ' (' || regexp_extract(text, {bc}, 3) || ')'
      WHEN rule_id IN ('r7a_test_case', 'r7c_assertion') AND regexp_matches(text, {tn})
           THEN split_part(regexp_extract(text, {tn}, 1), ' ', 1)
      WHEN rule_id = 'r7b_test_suite'
           THEN CASE WHEN regexp_matches(text, {sn})
                     THEN regexp_extract(text, {sn}, 1) ELSE 'Unknown Suite' END
      WHEN rule_id = 'r10_progress' THEN regexp_extract(text, {pg}, 4)
    END""",
        "diag_class": """CASE
    WHEN category IN ('progress', 'test_start', 'test_success', 'test_info',
                      'test_suite_start', 'test_suite_success', 'test_suite_info',
                      'build_failed') THEN 'step-boundary'
    WHEN category IN ('swift_compilation_task_failed', 'build_command_failed')
         THEN 'tool-invocation'
    WHEN severity = 'error' THEN 'error'
    WHEN severity = 'warning' THEN 'warning'
    ELSE 'note'
  END""",
    }
