"""Fixture-pinned semantics for the two round-5 late ops: chat→SFT pair
extraction (same-role run collapse, interjection adjacency break) and
tf-idf keyword extraction (smoothed-idf values, tie-break). The SQL-oracle
parity over real data is covered by test_spark_duckdb_parity; these tests
pin the CONTRACT on hand-built conversations/corpora where the expected
output is computable by eye."""

from __future__ import annotations

import math

from pyspark.sql import Row

from buildlogparser_spark.operators import sft
from buildlogparser_spark.operators.textstats import tfidf_top_terms


def _conv(spark, rows):
    return spark.createDataFrame(
        [Row(conv_id=c, turn_idx=i, role=r, text=t) for c, i, r, t in rows])


def test_sft_collapses_same_role_runs(spark):
    """Two consecutive user turns become ONE prompt; two consecutive
    assistant turns become ONE response; texts join with newline in turn
    order."""
    t = _conv(spark, [
        ("c1", 0, "user", "hi"),
        ("c1", 1, "user", "are you there?"),
        ("c1", 2, "assistant", "yes"),
        ("c1", 3, "assistant", "how can I help"),
    ])
    out = sft.sft_pairs(t).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.prompt_turn_idx, r.response_turn_idx) == (0, 2)
    assert r.prompt == "hi\nare you there?"
    assert r.response == "yes\nhow can I help"
    assert r.n_prompt_bpe > 0 and r.n_response_bpe > 0


def test_sft_all_null_segment_is_empty_string_in_both_engines(spark):
    """A segment whose turn texts are ALL NULL must read '' in BOTH
    engines (review finding: Spark's array_join skips null elements while
    bare string_agg returned NULL — the SQL twin now coalesces).
    Unreachable from the derived transcript corpus; reachable for the
    public operator."""
    import duckdb

    rows = [
        ("c1", 0, "user", None),
        ("c1", 1, "assistant", "ok here you go"),
        ("c2", 0, "user", "real question"),
        ("c2", 1, "assistant", None),
    ]
    t = _conv(spark, rows)
    out = {r.conv_id: r for r in sft.sft_pairs(t).collect()}
    assert out["c1"].prompt == "" and out["c1"].n_prompt_bpe == 0
    assert out["c2"].response == "" and out["c2"].n_response_bpe == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE turns (conv_id VARCHAR, turn_idx BIGINT, "
                "role VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO turns VALUES (?, ?, ?, ?)", rows)
    duck = {r[0]: r for r in con.execute(
        sft.sft_pairs_sql("SELECT * FROM turns")).fetchall()}
    assert duck["c1"][3] == "" and duck["c2"][4] == ""


def test_sft_interjection_breaks_adjacency(spark):
    """A tool (or system) segment between a user and the assistant reply
    means NO pair is emitted for that user segment — the interjection
    would silently vanish from the training example."""
    t = _conv(spark, [
        ("c1", 0, "user", "run the tests"),
        ("c1", 1, "tool", "exit 0"),
        ("c1", 2, "assistant", "they pass"),
        ("c2", 0, "system", "be helpful"),
        ("c2", 1, "user", "hello"),
        ("c2", 2, "assistant", "hi"),
    ])
    out = {r.conv_id: r for r in sft.sft_pairs(t).collect()}
    assert "c1" not in out          # tool interjection broke the pair
    assert out["c2"].prompt == "hello"   # system prefix does not
    assert out["c2"].response == "hi"


def test_sft_assistant_first_and_trailing_user(spark):
    """An assistant segment with no preceding user segment, and a user
    segment with no following assistant segment, both emit nothing."""
    t = _conv(spark, [
        ("c1", 0, "assistant", "welcome"),
        ("c1", 1, "user", "thanks"),
    ])
    assert sft.sft_pairs(t).count() == 0


def test_sft_multiple_pairs_per_conversation(spark):
    t = _conv(spark, [
        ("c1", 0, "user", "q1"),
        ("c1", 1, "assistant", "a1"),
        ("c1", 2, "user", "q2"),
        ("c1", 3, "assistant", "a2"),
    ])
    out = sorted(sft.sft_pairs(t).collect(), key=lambda r: r.prompt_turn_idx)
    assert [(r.prompt, r.response) for r in out] == [("q1", "a1"), ("q2", "a2")]


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)])


def test_tfidf_values_by_hand(spark):
    """3 docs; 'rare' appears twice in doc 0 only, 'common' in all three.
    smooth idf = ln((N+1)/(df+1)) + 1: rare idf = ln(4/2)+1, common idf =
    ln(4/4)+1 = 1."""
    docs = _docs_df(spark, [
        "rare rare common", "common other", "common third",
    ])
    out = {(r.doc_id, r.term): r for r in tfidf_top_terms(docs, k=5).collect()}
    rare = out[(0, "rare")]
    assert (rare.tf, rare.doc_freq) == (2, 1)
    assert abs(rare.score - 2 * (math.log(2.0) + 1)) < 1e-6
    common = out[(0, "common")]
    assert (common.tf, common.doc_freq, common.score) == (1, 3, 1.0)
    # the doubly-occurring distinctive term outranks the ubiquitous one
    assert rare.rank < common.rank


def test_tfidf_topk_and_tiebreak(spark):
    """k bounds per-doc rows; equal scores rank alphabetically by term."""
    docs = _docs_df(spark, ["b a d c", "x y"])
    out = [r for r in tfidf_top_terms(docs, k=3).collect() if r.doc_id == 0]
    assert len(out) == 3
    ranked = sorted(out, key=lambda r: r.rank)
    # all four terms of doc 0 tie (tf=1, df=1) → alphabetical keeps a,b,c
    assert [r.term for r in ranked] == ["a", "b", "c"]


def test_tfidf_null_and_empty_text(spark):
    """NULL/empty docs emit no keyword rows but still count toward N (the
    disclosed denominator contract)."""
    docs = spark.createDataFrame(
        [Row(doc_id=0, text="solo"), Row(doc_id=1, text=None),
         Row(doc_id=2, text="")])
    out = tfidf_top_terms(docs, k=3).collect()
    assert {r.doc_id for r in out} == {0}
    # df=1, N=3 → idf = ln(4/2)+1, NOT ln(2/2)+1
    assert abs(out[0].score - (math.log(2.0) + 1)) < 1e-6
