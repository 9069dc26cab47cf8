"""Deterministic synthetic transcript generation (SURVEY.md §7 M0).

Two generators:

* :func:`gen_conversations` — pure-Python, seeded, small-scale. Emits
  adversarial multi-line log shapes (compile blocks with context/caret/note
  continuations, linker blocks, BUILD FAILED blocks, XCTest runs,
  swift-build gutter blocks, noise, blank lines) for differential-testing
  the stateful operators against the oracle. Shapes mirror FIXTURES.md §3
  (synthesized, never copied from the reference fixtures).

* :func:`gen_events_spark` — Spark-native scale generator: ``spark.range``
  → deterministic column arithmetic, no Python in the loop, no data skew
  unless requested. Feed through ``transcripts.derive_transcripts`` for
  benchmark-scale transcript tables of arbitrary size (used by bench.py's
  scaling runs). Timestamps are a fixed epoch base + integer arithmetic —
  fully reproducible, no wall-clock dependence.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, functions as F

ROLES = ["user", "assistant", "tool", "system"]
TOOLS = ["swiftc", "xcodebuild", "swift-build", "ld", "xctest", "clang", "none"]
BASE_TS = 1704067200  # 2024-01-01T00:00:00Z


def _compile_block(rng: random.Random) -> list[str]:
    sev = rng.choice(["error", "warning"])
    ext = rng.choice(["swift", "m", "c", "cpp"])
    lines = [f"/app/src/File{rng.randrange(50)}.{ext}:{rng.randrange(1, 300)}:"
             f"{rng.randrange(1, 80)}: {sev}: cannot find 'x{rng.randrange(99)}' in scope"]
    for _ in range(rng.randrange(0, 4)):
        kind = rng.randrange(3)
        if kind == 0:
            lines.append(f"    let v{rng.randrange(9)} = compute()")
        elif kind == 1:
            lines.append("        ^" + "~" * rng.randrange(0, 5))
        else:
            lines.append(f"note: did you mean 'y{rng.randrange(9)}'?")
    lines.append(rng.choice(["", f"    cd /app/build/{rng.randrange(9)}"]))
    return lines


def _linker_block(rng: random.Random) -> list[str]:
    lines = [f"Undefined symbols for architecture {rng.choice(['x86_64', 'arm64'])}:"]
    for _ in range(rng.randrange(1, 3)):
        lines.append(f'  "_sym{rng.randrange(30)}", referenced from:')
        lines.append(f"      _caller{rng.randrange(9)} in main.o")
    lines.append("ld: symbol(s) not found")
    lines.append("clang: error: linker command failed with exit code 1 (use -v to see invocation)")
    return lines


def _build_failed_block(rng: random.Random) -> list[str]:
    n = rng.randrange(1, 5)
    lines = ["** BUILD FAILED **", "", "The following build commands failed:"]
    for _ in range(n):
        lines.append(f"\tCompileSwift normal arm64 /app/src/File{rng.randrange(50)}.swift")
    lines.append(f"({n} failures)")
    return lines


def _test_block(rng: random.Random) -> list[str]:
    suite = f"Suite{rng.randrange(10)}Tests"
    lines = [f"Test Suite '{suite}' started at 2024-01-01 12:00:00.000"]
    for _ in range(rng.randrange(1, 3)):
        t = f"test{rng.randrange(20)}"
        if rng.random() < 0.4:
            lines.append(f"Test Case '-[{suite} {t}]' started.")
            lines.append(
                f"/app/tests/{suite}.swift:{rng.randrange(1, 99)}: error: -[{suite} {t}] : "
                f'XCTAssertEqual failed: ("{rng.randrange(9)}") is not equal to ("{rng.randrange(9, 20)}")')
            lines.append(f"    Expected: {rng.randrange(9)}")
            lines.append(f"    Actual: {rng.randrange(9, 20)}")
            lines.append(f"Test Case '-[{suite} {t}]' failed (0.{rng.randrange(100):03d} seconds).")
        else:
            lines.append(f"Test Case '-[{suite} {t}]' passed (0.{rng.randrange(100):03d} seconds).")
    lines.append(f"Test Suite '{suite}' {rng.choice(['passed', 'failed'])} at 2024-01-01 12:00:01.000.")
    return lines


def _swiftbuild_block(rng: random.Random) -> list[str]:
    n = rng.randrange(1, 30)
    lines = [f"[{n}/30] Compiling Module{rng.randrange(9)} file{rng.randrange(99)}.swift"]
    if rng.random() < 0.5:
        lines.append(f"error: emit-module command failed with exit code {rng.randrange(1, 4)}"
                     " (use -v to see invocation)")
        if rng.random() < 0.6:
            lines.append(f"  hint {rng.randrange(9)}: use -v to see invocation"
                         " of the failed command")
    if rng.random() < 0.7:
        ln = rng.randrange(1, 60)
        lines.append(f"/app/src/Mod{rng.randrange(9)}.swift:{ln}:{rng.randrange(1, 30)}:"
                     f" error: cannot find 'q{rng.randrange(9)}' in scope")
        lines.append(f"{ln} | let q = broken()")
        lines.append("  |     `- error: cannot find 'q' in scope")
        lines.append("")
    return lines


def _warning_block(rng: random.Random) -> list[str]:
    lines = [f"--- xcodebuild: WARNING: legacy setting id {rng.randrange(30)}"]
    for _ in range(rng.randrange(0, 3)):
        lines.append(f"{{ platform:iOS Simulator, OS:17.{rng.randrange(10)},"
                     f" name:iPhone {rng.randrange(8, 16)} }}")
    if rng.random() < 0.5:
        lines.append("}")
    lines.append(rng.choice(["", "** BUILD FAILED **"]))
    return lines


def _noise(rng: random.Random) -> list[str]:
    return [rng.choice([
        "Building for debugging...",
        "Planning build",
        f"Compiling step {rng.randrange(999)} of module graph",
        "",
        f"    cd /app/build/{rng.randrange(9)}",
        f"SwiftCompile normal arm64 /app/src/File{rng.randrange(50)}.swift"
        f" (in target 'App{rng.randrange(5)}' from project 'Proj')",
        f"Ld /app/build/App{rng.randrange(9)}.o normal"
        f" (in target 'App{rng.randrange(5)}' from project 'Proj')",
        "--- xcodebuild: WARNING: using legacy build system",
    ])]


_BLOCKS = [_compile_block, _linker_block, _build_failed_block, _test_block,
           _swiftbuild_block, _warning_block, _noise, _noise]


def gen_conversations(seed: int, n_convs: int, approx_turns: int = 40):
    """Yield rows (conv_id, turn_idx, role, text, tool, ts_epoch_sec)."""
    rng = random.Random(seed)
    for c in range(n_convs):
        conv_id = f"gen_{c:05d}"
        lines: list[str] = []
        while len(lines) < approx_turns:
            lines.extend(rng.choice(_BLOCKS)(rng))
        ts = BASE_TS + c
        for i, text in enumerate(lines):
            ts += rng.randrange(1, 120)
            yield (conv_id, i, rng.choice(ROLES), text, rng.choice(TOOLS), ts)


def conversations_df(spark: SparkSession, seed: int, n_convs: int,
                     approx_turns: int = 40) -> DataFrame:
    rows = [(c, t, r, x, tl, ts) for c, t, r, x, tl, ts in
            gen_conversations(seed, n_convs, approx_turns)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_sec long")
    return df.withColumn("ts", F.timestamp_seconds(F.col("ts_sec"))).drop("ts_sec")


def gen_events_spark(spark: SparkSession, n_rows: int, n_users: int = 1000,
                     partitions: int | None = None) -> DataFrame:
    """Deterministic events table of arbitrary size, generated distributed
    (no driver-side data). Matches the /root/testdata events schema."""
    rng = spark.range(0, n_rows, numPartitions=partitions or spark.sparkContext.defaultParallelism)
    i = F.col("id")
    return rng.select(
        i.alias("event_id"),
        F.timestamp_seconds(F.lit(BASE_TS) + (i * 7 % 86_400_000)).alias("ts"),
        (i * 2654435761 % n_users).alias("user_id"),
        F.element_at(
            F.array(*[F.lit(x) for x in ["signup", "click", "view", "purchase", "error"]]),
            (i % 5 + 1).cast("int")).alias("event_type"),
        ((i * 37 % 10_000) / 100.0).alias("value"),
        F.concat(F.lit('{"k": '), (i % 100).cast("string"), F.lit("}")).alias("props"),
    )
