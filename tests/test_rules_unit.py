"""Per-rule unit tests (mirrors the reference's rule tests, e.g.
Tests/BuildLogParserTests/XCTestRuleTests.swift — one line in, asserted
fields out). Pure Python: exercises rules/table.py, which is also the ground
truth for the Spark cascade."""

from __future__ import annotations

from buildlogparser_spark.rules.table import (
    BuildCommandFailedRule,
    BuildFailedRule,
    CompileErrorRule,
    LinkerErrorRule,
    SwiftBuildModuleFailedRule,
    SwiftBuildProgressRule,
    SwiftCompileTaskFailedRule,
    XCTestRule,
    XcodeBuildWarningRule,
)


def test_compile_error_start():
    r = CompileErrorRule()
    d = r.match_start("main.swift:10:5: error: use of unresolved identifier 'foo'")
    assert d is not None
    assert d.file == "main.swift" and d.line == 10 and d.column == 5
    assert d.severity == "error" and d.category == "error" and d.source == "compiler"
    assert d.message == "use of unresolved identifier 'foo'"


def test_compile_error_warning_and_prefix():
    r = CompileErrorRule(source="swift", category_prefix="compile")
    d = r.match_start("/a/b.m:3:1: warning: unused variable")
    assert d is not None and d.severity == "warning" and d.category == "compile_warning"
    assert d.source == "swift"


def test_compile_error_rejects():
    r = CompileErrorRule()
    assert r.match_start("main.txt:10:5: error: nope") is None
    assert r.match_start("main.swift:10: error: missing column") is None
    assert r.match_start("prose without colons") is None
    # 64-bit overflow rejects the whole match (CompileErrorRule.swift:57-63)
    assert r.match_start("a.swift:99999999999999999999:1: error: x") is None


def test_compile_error_fastfail():
    r = CompileErrorRule()
    assert r.fast_fail("x.swift:1:2: error: boom")
    assert not r.fast_fail("no colon-words here")
    assert not r.fast_fail("contains : but not the keywords")


def test_build_failed():
    r = BuildFailedRule()
    d = r.match_start("** BUILD FAILED **")
    assert d is not None and d.category == "build_failed" and d.message == "BUILD FAILED"
    assert r.match_start("** BUILD FAILED ** ") is None  # anchored exact
    cur = d
    assert r.match_continuation("\tCompileSwift normal arm64", cur)
    assert r.match_continuation("The following build commands failed:", cur)
    assert r.is_end("(13 failures)", cur)


def test_xcodebuild_warning():
    r = XcodeBuildWarningRule()
    d = r.match_start("--- xcodebuild: WARNING: Using legacy build system")
    assert d is not None and d.severity == "warning" and d.source == "xcodebuild"
    assert d.message == "Using legacy build system"
    assert r.match_start("--- xcodebuild: WARNING:") is None  # (.+) needs content


def test_swift_compile_task():
    r = SwiftCompileTaskFailedRule()
    d = r.match_start("SwiftCompile normal arm64 /p/A.swift (in target 'App' from project 'Proj')")
    assert d is not None
    assert d.message == "Swift compilation task failed for arm64: /p/A.swift"
    assert d.build_target == "App (Proj)" and d.category == "swift_compilation_task_failed"


def test_build_command_skips_swiftcompile():
    r = BuildCommandFailedRule()
    assert r.match_start("SwiftCompile normal arm64 x (in target 'A' from project 'P')") is None
    d = r.match_start("Ld /p/App.o normal (in target 'A' from project 'P')")
    assert d is not None and d.message == "Build command failed: Ld /p/App.o normal"
    assert d.build_target == "A (P)"


def test_linker():
    r = LinkerErrorRule()
    d = r.match_start("Undefined symbols for architecture x86_64:")
    assert d is not None and d.category == "undefined_symbols" and d.source == "linker"
    assert r.match_continuation('  "_foo", referenced from:', d)
    # isEnd unguarded on current (LinkerErrorRule.swift:39)
    assert r.is_end("clang: error: linker command failed", None)


def test_xctest_case():
    r = XCTestRule()
    d = r.match_start("Test Case '-[MyTests testFoo]' failed (0.1 seconds).")
    assert d is not None and d.category == "test_failure" and d.severity == "error"
    assert d.message == "Test: MyTests testFoo - Failed"
    assert d.build_target == "MyTests"
    d2 = r.match_start("Test Case '-[MyTests testFoo]' passed (0.1 seconds).")
    assert d2 is not None and d2.category == "test_success" and d2.severity == "info"
    d3 = r.match_start("Test Case '-[MyTests testFoo]' started.")
    assert d3 is not None and d3.category == "test_start"


def test_xctest_suite():
    r = XCTestRule()
    d = r.match_start("Test Suite 'MyTests' failed at 2024-01-01 12:00:00.000.")
    assert d is not None and d.category == "test_suite_failure" and d.build_target == "MyTests"
    assert d.message == "Test Suite: MyTests - Failed"


def test_xctest_assertion():
    r = XCTestRule()
    line = '/p/T.swift:25: error: -[T testX] : XCTAssertEqual failed: ("a") is not equal to ("b")'
    d = r.match_start(line)
    assert d is not None and d.category == "assertion_failure"
    assert d.file == "/p/T.swift" and d.line == 25
    assert d.message.startswith("XCTAssertEqual failed")
    assert d.build_target == "T"


def test_xctest_test_error():
    r = XCTestRule()
    d = r.match_start("/p/T.swift:33: error: test crashed badly")
    assert d is not None and d.category == "test_error"
    assert d.message == "test crashed badly"
    assert d.file == "/p/T.swift" and d.line == 33


def test_module_failed():
    r = SwiftBuildModuleFailedRule()
    d = r.match_start("error: emit-module command failed with exit code 1 (use -v to see invocation)")
    assert d is not None
    assert d.message == "Module compilation failed with exit code 1 (use -v to see invocation)"
    assert d.category == "module_failed" and d.source == "swift-build"


def test_progress():
    r = SwiftBuildProgressRule()
    d = r.match_start("[3/20] Compiling Mod file.swift")
    assert d is not None and d.category == "progress" and d.severity == "info"
    assert d.message == "Compiling Mod file.swift (3/20)"
    assert d.build_target == "Mod file.swift"
    assert r.match_start("[3/20] Planning build") is None
