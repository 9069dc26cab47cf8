"""applyInPandasWithState streaming assembly: diagnostics spanning
micro-batches must equal the batch oracle, with in-flight state carried in
the state store between availableNow runs (the checkpoint persists it), and
end-of-conversation flushed by an explicit EOF sentinel — the streaming
twin of the reference's finish() call."""

from __future__ import annotations

from collections import Counter

from buildlogparser_spark.datagen import gen_conversations
from buildlogparser_spark.oracle import parse_lines_with_turns
from buildlogparser_spark.rules.table import test_stack as ref_test_stack
from buildlogparser_spark.streaming.stateful import (
    DEFAULT_EOF_MARKER, stream_parse_stateful)

SEED, N_CONVS = 4242, 8
SCHEMA = "conv_id string, turn_idx int, text string"


def _corpus():
    convs: dict[str, list[str]] = {}
    for conv_id, _i, _r, text, _tl, _ts in gen_conversations(SEED, N_CONVS):
        convs.setdefault(conv_id, []).append(text)
    return convs


def _expected(convs) -> Counter:
    exp: Counter = Counter()
    for conv_id, lines in convs.items():
        for t, d in parse_lines_with_turns(
                lines, list(range(len(lines))), ref_test_stack()):
            exp[(conv_id, t, d.category, d.message,
                 tuple(d.related_messages))] += 1
    return exp


def test_stateful_stream_across_batches(spark, tmp_path):
    """Three availableNow runs over one growing directory + one checkpoint:
    run 2 resumes per-conversation parser state from the state store, so
    blocks whose header arrived in run 1 and whose continuations arrive in
    run 2 still assemble; run 3 delivers EOF sentinels that flush trailing
    in-flight diagnostics (finish())."""
    convs = _corpus()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    half1 = [(c, i, t) for c, ls in convs.items()
             for i, t in enumerate(ls) if i < len(ls) // 2]
    half2 = [(c, i, t) for c, ls in convs.items()
             for i, t in enumerate(ls) if i >= len(ls) // 2]
    eofs = [(c, len(ls), DEFAULT_EOF_MARKER) for c, ls in convs.items()]

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = (stream_parse_stateful(stream, ref_test_stack)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    write(half1)
    run_once()
    n_after_1 = spark.read.parquet(out_dir).count()

    write(half2)
    run_once()
    write(eofs)
    run_once()

    got: Counter = Counter()
    for r in spark.read.parquet(out_dir).collect():
        got[(r.conv_id, r.start_turn_idx, r.category, r.message,
             tuple(r.related_messages))] += 1
    exp = _expected(convs)
    missing, extra = exp - got, got - exp
    assert not missing and not extra, (
        f"after1={n_after_1}\nmissing={list(missing.items())[:3]}\n"
        f"extra={list(extra.items())[:3]}")
    total = sum(exp.values())
    assert 0 < n_after_1 < total  # output really spanned batches


def test_unordered_stream_buffers_out_of_order_turns(spark, tmp_path):
    """Out-of-order arrival: run 1 delivers only the EVEN turns of every
    conversation (holes at every odd index), run 2 the ODD turns, run 3 the
    EOF sentinels. The contiguity buffer must hold back everything after the
    first hole in run 1, then drain to exactly the batch-oracle output —
    nothing lost, nothing duplicated, blocks assembled across the shuffle."""
    import random

    from buildlogparser_spark.streaming.stateful import (
        stream_parse_stateful_unordered)

    convs = _corpus()
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    rng = random.Random(7)

    evens = [(c, i, t) for c, ls in convs.items()
             for i, t in enumerate(ls) if i % 2 == 0]
    odds = [(c, i, t) for c, ls in convs.items()
            for i, t in enumerate(ls) if i % 2 == 1]
    rng.shuffle(evens)
    rng.shuffle(odds)
    eofs = [(c, len(ls), DEFAULT_EOF_MARKER) for c, ls in convs.items()]

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = (stream_parse_stateful_unordered(stream, ref_test_stack)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    write(evens)
    run_once()
    n_after_1 = spark.read.parquet(out_dir).count()

    write(odds)
    run_once()
    write(eofs)
    run_once()

    got: Counter = Counter()
    for r in spark.read.parquet(out_dir).collect():
        got[(r.conv_id, r.start_turn_idx, r.category, r.message,
             tuple(r.related_messages))] += 1
    exp = _expected(convs)
    missing, extra = exp - got, got - exp
    assert not missing and not extra, (
        f"after1={n_after_1}\nmissing={list(missing.items())[:3]}\n"
        f"extra={list(extra.items())[:3]}")
    # run 1 saw only turn 0 of each conversation (hole at turn 1) — at most
    # a handful of single-line diagnostics may emit, never the full corpus
    assert n_after_1 < sum(exp.values()) / 2


def test_stream_swiftbuild_gutter_block_spans_batches(spark, tmp_path):
    """R8 swift-build 5.9+ gutter block split mid-block across availableNow
    runs: the header + first context line arrive in run 1, the pointer /
    blank continuations and the progress closer in run 2 — the state store
    must carry the open block so the assembled diagnostic equals the batch
    oracle, and nothing may emit before the close."""
    from buildlogparser_spark.rules.table import SwiftBuildCompileErrorRule

    sb_stack = lambda: [SwiftBuildCompileErrorRule()]  # noqa: E731
    lines = [
        "Building for debugging... step 1",
        "/app/src/Mod1.swift:12:5: error: cannot find 'q1' in scope",
        "  12 |     let q1 = broken()",
        "      |         `- error: cannot find 'q1' in scope",
        "",
        "[3/20] Compiling Module1 file7.swift",
        "/app/src/Mod2.swift:3:1: warning: unused variable 'w'",
        "   3 | let w = 1",
    ]
    conv = "sb_stream"
    in_dir, out_dir, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))

    def write(rows):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append").parquet(in_dir)

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = (stream_parse_stateful(stream, sb_stack)
             .writeStream.format("parquet").option("path", out_dir)
             .outputMode("append").option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(180)

    write([(conv, i, t) for i, t in enumerate(lines[:3])])
    run_once()
    assert spark.read.parquet(out_dir).count() == 0  # block still open

    write([(conv, i + 3, t) for i, t in enumerate(lines[3:])])
    run_once()
    write([(conv, len(lines), DEFAULT_EOF_MARKER)])
    run_once()

    got = Counter(
        (r.conv_id, r.start_turn_idx, r.category, r.severity, r.message,
         tuple(r.related_messages))
        for r in spark.read.parquet(out_dir).collect())
    exp = Counter(
        (conv, t, d.category, d.severity, d.message, tuple(d.related_messages))
        for t, d in parse_lines_with_turns(
            lines, list(range(len(lines))), sb_stack()))
    assert got == exp
    # the gutter continuations really crossed the batch boundary
    assert (conv, 1, "compile_error", "error", "cannot find 'q1' in scope",
            ("  12 |     let q1 = broken()",
             "      |         `- error: cannot find 'q1' in scope",
             "")) in got
