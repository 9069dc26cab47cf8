"""The pure-Python oracle replays the reference's own end-to-end tests
(Tests/BuildLogParserTests/BuildLogParserTests.swift) and must reproduce
their asserted counts exactly."""

from __future__ import annotations

from collections import Counter

from buildlogparser_spark.oracle import parse_lines
from buildlogparser_spark.rules.table import default_stack, swiftbuild_rule
from buildlogparser_spark.rules.table import test_stack as _reference_test_stack


def test_batch_processing():  # BuildLogParserTests.swift:6-31
    lines = [
        "main.swift:10:5: error: use of unresolved identifier 'foo'",
        "Undefined symbols for architecture x86_64:",
        '  "_foo", referenced from:',
        "clang: error: linker command failed",
    ]
    diags = parse_lines(lines, _reference_test_stack())
    assert len(diags) >= 1
    # the compile error absorbs the linker block as related context
    assert diags[0].category == "error"
    assert diags[0].related_messages == [
        "Undefined symbols for architecture x86_64:",
        '  "_foo", referenced from:',
    ]


def test_filtered_errors():  # BuildLogParserTests.swift:84-129
    lines = [
        "main.swift:10:5: error: use of unresolved identifier 'foo'",
        "main.swift:15:3: warning: variable 'bar' was never used",
        "Undefined symbols for architecture x86_64:",
        '  "_foo", referenced from:',
        "clang: error: linker command failed",
    ]
    diags = parse_lines(lines, _reference_test_stack())
    errors = [d for d in diags if d.severity == "error"]
    assert len(errors) >= 1
    assert len(diags) >= 2  # error + warning


def test_swift_build_golden_counts():  # BuildLogParserTests.swift:219-292
    log = """[1/1] Planning build
Building for debugging...
error: emit-module command failed with exit code 1 (use -v to see invocation)
/Users/test/TestError.swift:5:1: error: expressions are not allowed at the top level
3 | // Intentionally create compilation error
4 | let test = undefinedVariable
5 | print("Hello")
  | `- error: expressions are not allowed at the top level

/Users/test/TestError.swift:4:12: error: cannot find 'undefinedVariable' in scope
2 |
3 | // Intentionally create compilation error
4 | let test = undefinedVariable
  |            `- error: cannot find 'undefinedVariable' in scope
5 | print("Hello")

[4/4] Compiling TestProject TestError.swift"""
    diags = parse_lines(log.split("\n"), [swiftbuild_rule(include_common_rules=True)])
    by_cat = Counter(d.category for d in diags)
    assert len(diags) >= 3
    assert sum(1 for d in diags if d.source == "swift-build") >= 2
    assert by_cat["module_failed"] == 1
    assert sum(n for c, n in by_cat.items() if c and c.startswith("compile_")) == 2
    assert by_cat["progress"] >= 1


def test_default_stack_is_stateless():
    """With the default CLI stack, SwiftBuildRule.isEnd always returns True
    (SwiftBuildRule.swift:52) → every line flushes; related_messages stays
    empty. This property is what licenses the pure-column classify path."""
    lines = [
        "main.swift:10:5: error: boom",
        "    some context line",
        "        ^",
        "Undefined symbols for architecture x86_64:",
        '  "_foo", referenced from:',
        "clang: error: linker command failed",
        "** BUILD FAILED **",
        "\tCompileSwift normal arm64",
        "(2 failures)",
    ]
    diags = parse_lines(lines, default_stack())
    assert all(d.related_messages == [] for d in diags)
    cats = [d.category for d in diags]
    assert cats == ["error", "undefined_symbols", "build_failed"]
