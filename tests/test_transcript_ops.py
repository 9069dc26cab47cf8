"""Hand-computed fixtures for the transcript-native analytics ops added in
round 5's closing sessions: stuck-agent loop detection
(aggregate.tool_call_loops) and SFT context-window assembly
(sft.context_windows) — pinned on BOTH engines over shapes the derived
corpus cannot produce (the corpus rotates role/tool per turn, so a bare
loop run is vacuous; the graded entries therefore run over inject_loops).
"""

from __future__ import annotations

import datetime

import duckdb
import pandas as pd
import pytest

from pyspark.sql import functions as F

from conftest import SF_SMOKE
from buildlogparser_spark.operators import aggregate as agg, sft
from buildlogparser_spark.transcripts import load_transcripts

TS = datetime.datetime(2024, 1, 1, 12, 0, 0)

# conv A: run of 3 identical tool turns (flag), interrupted, then a run of
# 2 (below min_run); conv B: run of 3 NULL-text turns (md5('') fingerprint
# must still group); conv C: no runs; a run at turn 0 (window edge).
TURNS = [
    # conv, idx, role, text, tool
    ("A", 0, "user", "build please", "none"),
    ("A", 1, "tool", "retrying step", "xcodebuild"),
    ("A", 2, "tool", "retrying step", "xcodebuild"),
    ("A", 3, "tool", "retrying step", "xcodebuild"),
    ("A", 4, "assistant", "done", "none"),
    ("A", 5, "tool", "retrying step", "xcodebuild"),
    ("A", 6, "tool", "retrying step", "xcodebuild"),
    ("B", 0, "tool", None, "swiftc"),
    ("B", 1, "tool", None, "swiftc"),
    ("B", 2, "tool", None, "swiftc"),
    ("B", 3, "user", "ok", "none"),
    ("C", 0, "user", "hi", "none"),
    ("C", 1, "assistant", "hello", "none"),
]


@pytest.fixture(scope="module")
def fixture_transcripts(spark):
    return spark.createDataFrame(
        [(c, i, r, t, tl, TS) for c, i, r, t, tl in TURNS],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")


def _fixture_pd() -> pd.DataFrame:
    return pd.DataFrame(
        [(c, i, r, t, tl, TS) for c, i, r, t, tl in TURNS],
        columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"])


LOOPS_EXPECTED = pd.DataFrame(
    [("A", "tool", "xcodebuild", 1, 3, 3),
     ("B", "tool", "swiftc", 0, 2, 3)],
    columns=["conv_id", "role", "tool",
             "first_turn_idx", "last_turn_idx", "run_len"])


def test_tool_call_loops_expected(spark, fixture_transcripts):
    got = (agg.tool_call_loops(fixture_transcripts, min_run=3)
           .orderBy("conv_id").toPandas())
    pd.testing.assert_frame_equal(got, LOOPS_EXPECTED, check_dtype=False)


def test_tool_call_loops_sql_twin_on_fixture():
    con = duckdb.connect()
    con.register("fx", _fixture_pd())
    got = (con.sql(agg.tool_call_loops_sql("SELECT * FROM fx", min_run=3))
           .df().sort_values("conv_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, LOOPS_EXPECTED, check_dtype=False)


def test_min_run_2_picks_up_the_interrupted_run(spark, fixture_transcripts):
    got = agg.tool_call_loops(fixture_transcripts, min_run=2).collect()
    assert {(r.conv_id, r.first_turn_idx, r.run_len) for r in got} == {
        ("A", 1, 3), ("A", 5, 2), ("B", 0, 3)}


def test_bare_corpus_is_loop_free_hence_injection(spark):
    """Documents WHY the graded entry injects: the derived transcript
    rotates role/tool per turn, so detection over the bare corpus is
    vacuous — and injection makes it non-vacuous with a known count."""
    t = load_transcripts(spark, SF_SMOKE)
    assert agg.tool_call_loops(t).count() == 0
    injected = agg.tool_call_loops(agg.inject_loops(t))
    rows = injected.collect()
    n_convs = t.select("conv_id").distinct().count()
    expected = len([c for c in range(n_convs) if c % 5 == 0])
    assert len(rows) == expected
    assert all(3 <= r.run_len <= 5 for r in rows)
    # the injected length-2 run (conv % 5 == 3) must NOT be flagged
    assert all(
        int(r.conv_id[5:]) % 5 == 0 for r in rows)


def test_context_windows_expected(spark, fixture_transcripts):
    got = (sft.context_windows(fixture_transcripts, k=4)
           .orderBy("conv_id", "turn_idx").toPandas())
    exp = pd.DataFrame(
        [("A", 4, 4,
          "user: build please\ntool: retrying step\ntool: retrying step"
          "\ntool: retrying step", "done"),
         ("C", 1, 1, "user: hi", "hello")],
        columns=["conv_id", "turn_idx", "n_context_turns",
                 "context", "target"])
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)


def test_context_windows_sql_twin_on_fixture():
    con = duckdb.connect()
    con.register("fx", _fixture_pd())
    spark_exp = con.sql(
        sft.context_windows_sql("SELECT * FROM fx", k=4)).df()
    assert len(spark_exp) == 2
    a4 = spark_exp[(spark_exp.conv_id == "A")].iloc[0]
    assert a4.n_context_turns == 4
    assert a4.context.startswith("user: build please\ntool: retrying step")


def test_context_windows_null_text_and_frame_edge(spark):
    rows = [("D", 0, "assistant", None, "none", TS),
            ("D", 1, "tool", None, "swiftc", TS),
            ("D", 2, "assistant", "ok", "none", TS)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    got = {r.turn_idx: r for r in sft.context_windows(df, k=4).collect()}
    # opening assistant turn: empty frame → '' context, 0 turns, '' target
    assert (got[0].context, got[0].n_context_turns, got[0].target) == ("", 0, "")
    # NULL context text renders as 'role: '
    assert got[2].context == "assistant: \ntool: "
    assert got[2].target == "ok"
