"""Fixture tests for the C4-style cleaner (operators/c4.py): each rule
pinned on hand-built pages, the cross-page first-occurrence dedup, the
structure-injection helper, NULL robustness, and smoke-scale DuckDB
parity. The graded sf0.01 hash check lives in the driver sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import Row

from buildlogparser_spark.operators import c4
from conftest import SF_SMOKE, assert_frames_match, duck_df


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="s0",
             n_chars=len(t) if t is not None else 0)
         for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")


GOOD = "this line has plenty of words and ends properly."


def test_line_gates(spark):
    page = "\n".join([
        GOOD,                                           # kept
        "this line has no terminal punctuation at all",  # dropped: punct
        "too short.",                                    # dropped: < 5 words
        "please enable javascript to view this page.",   # dropped: javascript
        "another perfectly fine sentence stays right here!",  # kept (!)
        'a quoted ending also counts as terminal here"',      # kept (")
    ])
    out = c4.c4_clean(_docs(spark, [page]), min_lines=1).collect()[0]
    assert out.n_lines_total == 6
    assert out.n_lines_kept == 3
    assert out.page_kept
    assert out.clean_text.split("\n") == [
        GOOD,
        "another perfectly fine sentence stays right here!",
        'a quoted ending also counts as terminal here"',
    ]


def test_page_gates(spark):
    # every line unique across pages — the cross-page dedup must not be
    # what drops anything here
    def good(i: int) -> str:
        return f"page number {i} has plenty of words and ends properly."

    rows = [
        good(0) + "\n" + good(10),                          # kept (min_lines=2)
        good(1) + "\nconfig { width: 100 } follows here.",  # curly → page drop
        good(2) + "\nlorem ipsum dolor sit amet consectetur adipiscing.",
        good(3) + "\nthis page mentions unsafecontent right here today.",
        good(4),                                            # < min_lines=2
    ]
    out = {r.doc_id: r for r in
           c4.c4_clean(_docs(spark, rows), min_lines=2).collect()}
    assert out[0].page_kept
    assert not out[1].page_kept and not out[2].page_kept
    assert not out[3].page_kept
    assert not out[4].page_kept and out[4].n_lines_kept == 1
    # page gates flag the page; line stats still compute
    assert out[1].n_lines_kept == 2


def test_cross_page_dedup_first_occurrence_wins(spark):
    dup = "all rights reserved by the site administrator today."
    rows = [
        GOOD + "\n" + dup,            # doc 0: keeps the dup (first)
        dup + "\n" + GOOD.replace("this", "that"),  # doc 1: dup removed
        dup,                          # doc 2: nothing left
    ]
    out = {r.doc_id: r for r in
           c4.c4_clean(_docs(spark, rows), min_lines=1).collect()}
    assert out[0].n_lines_kept == 2 and dup in out[0].clean_text
    assert out[1].n_lines_kept == 1 and dup not in out[1].clean_text
    assert out[2].n_lines_kept == 0 and out[2].clean_text == ""
    assert not out[2].page_kept


def test_within_page_dup_also_collapses(spark):
    page = GOOD + "\n" + GOOD + "\n" + GOOD
    out = c4.c4_clean(_docs(spark, [page]), min_lines=1).collect()[0]
    assert out.n_lines_total == 3
    assert out.n_lines_kept == 1


def test_null_and_empty_pages(spark):
    out = {r.doc_id: r for r in
           c4.c4_clean(_docs(spark, [None, ""])).collect()}
    assert (out[0].page_kept, out[0].n_lines_total,
            out[0].n_lines_kept, out[0].clean_text) == (False, 0, 0, "")
    # '' splits into one empty line; it fails every line gate
    assert (out[1].page_kept, out[1].n_lines_total,
            out[1].n_lines_kept, out[1].clean_text) == (False, 1, 0, "")


def test_inject_structure_shapes(spark):
    # 20 tokens → ceil(20/8) = 3 base lines, every one '.'-terminated;
    # residue-keyed extra lines appended in order
    text = " ".join(f"w{i}" for i in range(20))
    docs = spark.createDataFrame(
        [Row(doc_id=2, text=text, lang="en", source="s0", n_chars=len(text)),
         Row(doc_id=30, text=None, lang="en", source="s0", n_chars=0)],
        "doc_id long, text string, lang string, source string, n_chars long")
    out = {r.doc_id: r.text for r in c4.inject_structure(docs).collect()}
    lines = out[2].split("\n")
    # doc_id 2: 2%2=0 (dup line), 2%3=2 no, 2%5=2 (javascript), 2%7=2 no...
    assert lines[:3] == [
        " ".join(f"w{i}" for i in range(8)) + ".",
        " ".join(f"w{i}" for i in range(8, 16)) + ".",
        " ".join(f"w{i}" for i in range(16, 20)) + ".",
    ]
    assert "all rights reserved contact the site administrator." in lines
    assert "please enable javascript to view this page." in lines
    assert out[30] is None  # NULL stays NULL


def test_c4_duckdb_parity_smoke(spark, duck_smoke):
    assert_frames_match(
        c4.c4_clean(c4.inject_structure(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet"))),
        duck_df(duck_smoke, c4.c4_clean_sql(
            table="(" + c4.inject_structure_sql() + ")")),
        "c4_clean")
