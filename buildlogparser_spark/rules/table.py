"""Rule table: the reference's DiagnosticRule protocol re-expressed as data.

Each rule is a small Python object with the four protocol functions of the
reference (``fastFail``/``matchStart``/``matchContinuation``/``isEnd`` —
/root/reference/Sources/BuildLogParser/BuildLogParser.swift:264-273). These
objects are used by:

  * the pure-Python oracle (``buildlogparser_spark.oracle``) that replays the
    reference's ``consumeLine`` state machine verbatim-in-semantics
    (BuildLogParser.swift:325-364), and
  * the vectorized pandas state machine in ``operators.assemble`` (compiled
    once per executor Python worker).

The stateless hot path does NOT use these objects — ``operators.classify``
builds the equivalent first-match-wins cascade out of JVM-side column
expressions and a DuckDB SQL CASE from the same regex constants below, so
there is one source of truth for every pattern.

Behavioral quirks reproduced deliberately (each cited to the reference):

  * ``CompileErrorRule.isEnd`` returns True when there is no in-flight
    diagnostic (CompileErrorRule.swift:114 ``guard current != nil else
    { return true }``) — so when idle, the end-branch of ``consumeLine``
    handles every line.
  * ``LinkerErrorRule.isEnd`` does NOT guard on ``current`` — it fires
    unconditionally on the linker-failed line (LinkerErrorRule.swift:39).
  * The composite ``SwiftBuildRule.isEnd`` falls through to ``return true``
    (SwiftBuildRule.swift:52), while ``XcodeBuildRule.isEnd`` falls through
    to ``return false`` (XcodeBuildRule.swift:61). With the default CLI
    stack (BuildLogParserCommand.swift:92-98) this makes the whole engine a
    stateless per-line classifier: every line flushes the in-flight
    diagnostic, so ``related_messages`` stays empty. That is what makes the
    pure-column-expression fast path in ``operators.classify`` exact.
  * ``BuildCommandFailedRule`` rejects commands containing ``SwiftCompile``
    (BuildCommandFailedRule.swift:31-33) so it never shadows
    ``SwiftCompileTaskFailedRule``.
  * Integer capture groups reject the whole match when the number does not
    fit a 64-bit int (Swift ``Int(...)`` returning nil —
    CompileErrorRule.swift:57-63).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


# ---------------------------------------------------------------------------
# Diagnostic row (reference: Sources/BuildLogParser/Diagnostic.swift:10-28)
# ---------------------------------------------------------------------------

SEVERITIES = ("error", "warning", "note", "info")


@dataclass
class Diagnostic:
    file: str | None = None
    line: int | None = None
    column: int | None = None
    severity: str = "error"
    message: str = ""
    related_messages: list[str] = field(default_factory=list)
    source: str | None = None
    category: str | None = None
    raw: str = ""
    build_target: str | None = None


# ---------------------------------------------------------------------------
# Regex constants — the single source of truth, shared with operators.classify
# (Java regex / RE2 / Python `re` compatible subset: no lookarounds, no
# backrefs, anchored where the reference anchors.)
# ---------------------------------------------------------------------------

# CompileErrorRule.swift:24 (same pattern reused by SwiftBuildCompileErrorRule.swift:13)
COMPILE_ERROR_RE = r"^(.*\.(swift|m|mm|c|cpp|h|hpp)):(\d+):(\d+): (error|warning): (.*)$"
# BuildFailedRule.swift:9
BUILD_FAILED_RE = r"^\*\* BUILD FAILED \*\*$"
# XcodebuildWarningRule.swift:12
XCODEBUILD_WARNING_RE = r"^--- xcodebuild: WARNING: (.+)$"
# SwiftCompileTaskFailedRule.swift:12
SWIFT_COMPILE_TASK_RE = r"^\s*SwiftCompile normal (\w+) (.+) \(in target '(.+)' from project '(.+)'\)$"
# BuildCommandFailedRule.swift:9
BUILD_COMMAND_RE = r"^\s*(.+) \(in target '(.+)' from project '(.+)'\)$"
# SwiftBuildModuleFailedRule.swift:12
MODULE_FAILED_RE = r"^error: emit-module command failed with exit code (\d+)(.*)$"
# SwiftBuildProgressRule.swift:12
PROGRESS_RE = r"^\[(\d+)/(\d+)\] (Compiling|Linking|Building) (.+)$"
# XCTestRule.swift:187 / :193 / :215
TEST_NAME_RE = r"-\[([^\]]+)\]"
SUITE_NAME_RE = r"Test Suite '([^']+)'"
FILE_INFO_RE = r"([^:]+):(\d+):"
# SwiftBuildCompileErrorRule.swift:24 / :35 (continuation patterns)
CONTEXT_LINE_RE = r"^\s*(\d+)\s*\|\s*(.*)$"
ERROR_POINTER_RE = r"^\s*\|\s*`-\s*(error|warning):\s*(.*)$"

_INT64_MAX = 2**63 - 1


def _to_i64(s: str) -> int | None:
    """Swift Int(...) semantics: reject on 64-bit overflow."""
    v = int(s)
    return v if -(2**63) <= v <= _INT64_MAX else None


def _trim(s: str) -> str:
    # Swift .whitespaces ≈ space + tab (+ unicode spaces); ASCII is enough here
    return s.strip(" \t")


# ---------------------------------------------------------------------------
# Rules
# ---------------------------------------------------------------------------


class Rule:
    """Base: reference protocol defaults (BuildLogParser.swift:275-280)."""

    def fast_fail(self, line: str) -> bool:
        return True

    def match_start(self, line: str) -> Diagnostic | None:
        return None

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        return False

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        return False


class CompileErrorRule(Rule):
    """Generic compiler error (reference: DiagnosticRule/CompileErrorRule.swift)."""

    _start = re.compile(COMPILE_ERROR_RE)

    def __init__(self, source: str = "compiler", category_prefix: str = ""):
        self.source = source
        self.category_prefix = category_prefix

    def fast_fail(self, line: str) -> bool:  # CompileErrorRule.swift:31-35
        return ":" in line and ("error:" in line or "warning:" in line)

    def match_start(self, line: str) -> Diagnostic | None:
        m = self._start.match(line)
        if not m:
            return None
        lineno = _to_i64(m.group(3))
        colno = _to_i64(m.group(4))
        if lineno is None or colno is None:  # reject whole match (.swift:57-63)
            return None
        sev = m.group(5)
        category = sev if not self.category_prefix else f"{self.category_prefix}_{sev}"
        return Diagnostic(
            file=m.group(1), line=lineno, column=colno,
            severity="error" if sev == "error" else "warning",
            message=m.group(6), source=self.source, category=category, raw=line,
        )

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        # CompileErrorRule.swift:83-111
        if current is None:
            return False
        t = _trim(line)
        if t.startswith("note:") or t.startswith("^"):
            return True
        if (t.startswith("SwiftCompile") or t.startswith("cd ")
                or t.startswith("** BUILD") or t.startswith("---")):
            return False
        if self.fast_fail(line):
            return False
        return bool(t)

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        # CompileErrorRule.swift:113-127 — True when idle (quirk, load-bearing)
        if current is None:
            return True
        t = _trim(line)
        return (not t or t.startswith("SwiftCompile") or t.startswith("cd ")
                or t.startswith("** BUILD") or t.startswith("---"))


class BuildFailedRule(Rule):
    """`** BUILD FAILED **` block (reference: xcodebuild/BuildFailedRule.swift)."""

    _start = re.compile(BUILD_FAILED_RE)

    def match_start(self, line: str) -> Diagnostic | None:
        if not self._start.match(line):
            return None
        return Diagnostic(severity="error", message="BUILD FAILED",
                          source="xcodebuild", category="build_failed", raw=line)

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "build_failed":
            return False
        return (line.startswith("The following build commands failed:")
                or line.startswith("\t") or "failures)" in line)

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "build_failed":
            return False
        return "failures)" in line


class XcodeBuildWarningRule(Rule):
    """`--- xcodebuild: WARNING:` (reference: xcodebuild/XcodebuildWarningRule.swift)."""

    _start = re.compile(XCODEBUILD_WARNING_RE)

    def match_start(self, line: str) -> Diagnostic | None:
        m = self._start.match(line)
        if not m:
            return None
        return Diagnostic(severity="warning", message=m.group(1),
                          source="xcodebuild", category="warning", raw=line)

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "warning":
            return False
        return line.startswith("{ platform:") or line.startswith("}")

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "warning":
            return False
        return not _trim(line) or line.startswith("** BUILD FAILED **")


class SwiftCompileTaskFailedRule(Rule):
    """SwiftCompile task header (reference: xcodebuild/SwiftCompileTaskFailedRule.swift)."""

    _start = re.compile(SWIFT_COMPILE_TASK_RE)

    def match_start(self, line: str) -> Diagnostic | None:
        m = self._start.match(line)
        if not m:
            return None
        arch, files, target, project = m.group(1), m.group(2), m.group(3), m.group(4)
        return Diagnostic(
            severity="error",
            message=f"Swift compilation task failed for {arch}: {files}",
            source="xcodebuild", category="swift_compilation_task_failed",
            raw=line, build_target=f"{target} ({project})",
        )

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "swift_compilation_task_failed":
            return False
        return (not _trim(line) or line.startswith("** BUILD FAILED **")
                or line.startswith("---"))


class BuildCommandFailedRule(Rule):
    """Generic `(in target ...)` command (reference: xcodebuild/BuildCommandFailedRule.swift)."""

    _start = re.compile(BUILD_COMMAND_RE)

    def match_start(self, line: str) -> Diagnostic | None:
        m = self._start.match(line)
        if not m:
            return None
        command, target, project = m.group(1), m.group(2), m.group(3)
        if "SwiftCompile" in command:  # avoid shadowing R4 (.swift:31-33)
            return None
        return Diagnostic(
            severity="error", message=f"Build command failed: {command}",
            source="xcodebuild", category="build_command_failed",
            raw=line, build_target=f"{target} ({project})",
        )

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "build_command_failed":
            return False
        return (not _trim(line) or line.startswith("** BUILD FAILED **")
                or line.startswith("---"))


class LinkerErrorRule(Rule):
    """Undefined-symbols block (reference: xcodebuild/LinkerErrorRule.swift)."""

    def fast_fail(self, line: str) -> bool:
        return "Undefined symbols" in line or "linker" in line or "ld:" in line

    def match_start(self, line: str) -> Diagnostic | None:
        if not line.startswith("Undefined symbols for architecture"):
            return None
        return Diagnostic(severity="error", message=line, source="linker",
                          category="undefined_symbols", raw=line)

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        return current is not None and (
            line.startswith("  ") or line.startswith("ld:") or line.startswith("clang:"))

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        # deliberately unguarded on `current` (LinkerErrorRule.swift:39)
        return line.startswith("clang: error: linker command failed")


class XCTestRule(Rule):
    """XCTest output, 4 sub-patterns (reference: xcodebuild/XCTestRule.swift)."""

    _test_name = re.compile(TEST_NAME_RE)
    _suite_name = re.compile(SUITE_NAME_RE)
    _file_info = re.compile(FILE_INFO_RE)

    def fast_fail(self, line: str) -> bool:  # XCTestRule.swift:13-20
        return (line.startswith("Test Case") or line.startswith("Test Suite")
                or "failed" in line or "passed" in line or "XCTAssert" in line
                or ("error:" in line and "test" in line))

    @staticmethod
    def _status(line: str) -> str:
        if "failed" in line:
            return "Failed"
        if "passed" in line:
            return "Passed"
        if "started" in line:
            return "Started"
        return "Info"

    def _test_target(self, line: str) -> str | None:
        m = self._test_name.search(line)
        if not m:
            return None
        return m.group(1).split(" ")[0]

    def match_start(self, line: str) -> Diagnostic | None:
        if line.startswith("Test Case"):
            if "failed" in line:
                sev, cat = "error", "test_failure"
            elif "passed" in line:
                sev, cat = "info", "test_success"
            elif "started" in line:
                sev, cat = "info", "test_start"
            else:
                sev, cat = "info", "test_info"
            m = self._test_name.search(line)
            name = m.group(1) if m else "Unknown Test"
            return Diagnostic(
                severity=sev, message=f"Test: {name} - {self._status(line)}",
                source="xctest", category=cat, raw=line,
                build_target=self._test_target(line),
            )
        if line.startswith("Test Suite"):
            if "failed" in line:
                sev, cat = "error", "test_suite_failure"
            elif "passed" in line:
                sev, cat = "info", "test_suite_success"
            elif "started" in line:
                sev, cat = "info", "test_suite_start"
            else:
                sev, cat = "info", "test_suite_info"
            m = self._suite_name.search(line)
            name = m.group(1) if m else "Unknown Suite"
            return Diagnostic(
                severity=sev, message=f"Test Suite: {name} - {self._status(line)}",
                source="xctest", category=cat, raw=line, build_target=name,
            )
        if "XCTAssert" in line and "failed" in line:
            f, ln = self._file_info_of(line)
            idx = line.find("XCTAssert")
            msg = _trim(line[idx:]) if idx >= 0 else line
            return Diagnostic(
                file=f, line=ln, severity="error", message=msg, source="xctest",
                category="assertion_failure", raw=line,
                build_target=self._test_target(line),
            )
        if "error:" in line and "test" in line:
            f, ln = self._file_info_of(line)
            idx = line.find("error:")
            # reference skips one char after "error:" then trims (XCTestRule.swift:242-249)
            msg = _trim(line[idx + len("error:") + 1:]) if idx >= 0 else line
            return Diagnostic(
                file=f, line=ln, severity="error", message=msg, source="xctest",
                category="test_error", raw=line,
            )
        return None

    def _file_info_of(self, line: str) -> tuple[str | None, int | None]:
        m = self._file_info.search(line)
        if not m:
            return None, None
        return m.group(1), _to_i64(m.group(2))

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        if current is None:
            return False
        return bool(current.category and "test" in current.category) and (
            line.startswith("    ") or "XCTAssert" in line or "Expected:" in line
            or "Actual:" in line or "Difference:" in line)

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if current is None:
            return False
        return bool(current.category and "test" in current.category) and (
            line.startswith("Test Case") or line.startswith("Test Suite"))


class SwiftBuildCompileErrorRule(Rule):
    """swift-build 5.9-style compile block (reference: swiftbuild/SwiftBuildCompileErrorRule.swift)."""

    _start = re.compile(COMPILE_ERROR_RE)
    _context = re.compile(CONTEXT_LINE_RE)
    _pointer = re.compile(ERROR_POINTER_RE)

    def match_start(self, line: str) -> Diagnostic | None:
        m = self._start.match(line)
        if not m:
            return None
        lineno = _to_i64(m.group(3))
        colno = _to_i64(m.group(4))
        if lineno is None or colno is None:
            return None
        sev = m.group(5)
        return Diagnostic(
            file=m.group(1), line=lineno, column=colno,
            severity="error" if sev == "error" else "warning",
            message=m.group(6), source="swift-build", category=f"compile_{sev}",
            raw=line,
        )

    def _guard(self, current: Diagnostic | None) -> bool:
        return (current is not None and current.source == "swift-build"
                and bool(current.category) and current.category.startswith("compile_"))

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        if not self._guard(current):
            return False
        return (self._context.match(line) is not None
                or self._pointer.match(line) is not None
                or not _trim(line))

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if not self._guard(current):
            return False
        if self._start.match(line):
            return True
        if line.startswith("error: ") and "command failed" in line:
            return True
        return line.startswith("[") and "]" in line and "Compiling" in line


class SwiftBuildModuleFailedRule(Rule):
    """emit-module failure (reference: swiftbuild/SwiftBuildModuleFailedRule.swift)."""

    _start = re.compile(MODULE_FAILED_RE)

    def fast_fail(self, line: str) -> bool:
        return line.startswith("error: emit-module command failed")

    def match_start(self, line: str) -> Diagnostic | None:
        m = self._start.match(line)
        if not m:
            return None
        return Diagnostic(
            severity="error",
            message=f"Module compilation failed with exit code {m.group(1)}{m.group(2)}",
            source="swift-build", category="module_failed", raw=line,
        )

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "module_failed":
            return False
        return line.startswith(" ") and "use -v to see invocation" in line

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "module_failed":
            return False
        if ":" in line and (": error:" in line or ": warning:" in line):
            return True
        return not _trim(line)


class SwiftBuildProgressRule(Rule):
    """[N/M] progress (reference: swiftbuild/SwiftBuildProgressRule.swift)."""

    _start = re.compile(PROGRESS_RE)

    def match_start(self, line: str) -> Diagnostic | None:
        m = self._start.match(line)
        if not m:
            return None
        cur, total, action, target = m.group(1), m.group(2), m.group(3), m.group(4)
        return Diagnostic(
            severity="info", message=f"{action} {target} ({cur}/{total})",
            source="swift-build", category="progress", raw=line, build_target=target,
        )

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if current is None or current.category != "progress":
            return False
        return True  # progress is always single-line (.swift:68)


class CompositeRule(Rule):
    """Ordered union of sub-rules (reference: XcodeBuildRule.swift / SwiftBuildRule.swift).

    ``is_end_default`` reproduces the asymmetric fallthrough:
    XcodeBuildRule → False (.swift:61), SwiftBuildRule → True (.swift:52).
    Note the composite's ``match_start`` does NOT re-check each sub-rule's
    ``fast_fail`` — only the composite-level one gates, as in the reference.
    """

    def __init__(self, sub_rules: list[Rule], is_end_default: bool):
        self.sub_rules = sub_rules
        self.is_end_default = is_end_default

    def fast_fail(self, line: str) -> bool:
        return any(r.fast_fail(line) for r in self.sub_rules)

    def match_start(self, line: str) -> Diagnostic | None:
        for r in self.sub_rules:
            d = r.match_start(line)
            if d is not None:
                return d
        return None

    def match_continuation(self, line: str, current: Diagnostic | None) -> bool:
        return any(r.match_continuation(line, current) for r in self.sub_rules)

    def is_end(self, line: str, current: Diagnostic | None) -> bool:
        if any(r.is_end(line, current) for r in self.sub_rules):
            return True
        return self.is_end_default


def xcodebuild_rule(include_common_rules: bool = True) -> CompositeRule:
    """Reference: XcodeBuildRule.swift:15-33."""
    rules: list[Rule] = []
    if include_common_rules:
        rules.append(CompileErrorRule(source="xcodebuild"))
    rules += [
        BuildFailedRule(), XcodeBuildWarningRule(), SwiftCompileTaskFailedRule(),
        BuildCommandFailedRule(), LinkerErrorRule(), XCTestRule(),
    ]
    return CompositeRule(rules, is_end_default=False)


def swiftbuild_rule(include_common_rules: bool = True) -> CompositeRule:
    """Reference: SwiftBuildRule.swift:10-26."""
    rules: list[Rule] = []
    if include_common_rules:
        rules.append(CompileErrorRule(source="swift", category_prefix="compile"))
    rules += [
        SwiftBuildCompileErrorRule(), SwiftBuildModuleFailedRule(),
        SwiftBuildProgressRule(),
    ]
    return CompositeRule(rules, is_end_default=True)


def default_stack() -> list[Rule]:
    """The CLI's default rule stack (BuildLogParserCommand.swift:92-98)."""
    return [
        CompileErrorRule(source="compiler"),
        xcodebuild_rule(include_common_rules=False),
        swiftbuild_rule(include_common_rules=False),
    ]


def test_stack() -> list[Rule]:
    """The stack the reference's unit tests use (BuildLogParserTests.swift:8-12)."""
    return [CompileErrorRule(), LinkerErrorRule(), XCTestRule()]
