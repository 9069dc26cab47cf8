"""Winnowing fingerprints (operators/winnow.py): Spark vs a brute-force
Python reference implementation of Schleimer et al. 2003's robust
winnowing (min hash per window, rightmost tie-break), the every-window-
covered guarantee, the tie path exercised non-vacuously, match-pair
semantics, the max_df boilerplate guard, and the DuckDB twins on the same
fixtures (the registry parity test covers the real corpus; this pins the
algorithm on shapes the corpus may not contain).
"""

from __future__ import annotations

import hashlib
import re

import duckdb
import pandas as pd
import pytest

from buildlogparser_spark.operators import winnow as wn

K, W = 3, 4

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    # near-clone of doc 1 (one word changed at the end) — must pair with it
    (2, "the quick brown fox jumps over the lazy dog near the river edge"),
    # unrelated
    (3, "entirely different content about spark catalyst query planning"),
    # within-doc repetition: the same k-gram recurs inside one w-window,
    # forcing the rightmost-position tie-break (asserted non-vacuous below)
    (4, "ab cd ef ab cd ef ab cd ef gh"),
    (5, "one two three"),     # exactly k tokens → single fingerprint, pos 1
    (6, "one two"),           # fewer than k tokens → no fingerprints
    (7, None),                # NULL text → no fingerprints
]


def _tokens(text: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", (text or "").lower()) if t]


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def brute_winnow(text: str, k: int = K, w: int = W) -> set[tuple[int, int]]:
    """Reference implementation: returns {(pos, fp)} with 1-based pos."""
    toks = _tokens(text)
    hs = [_h(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
    out: set[tuple[int, int]] = set()
    n = len(hs)
    if n == 0:
        return out
    for end in range(min(w, n) - 1, n):
        window = hs[max(0, end - w + 1):end + 1]
        m = min(window)
        # rightmost occurrence of the min within the window
        off = max(i for i, v in enumerate(window) if v == m)
        out.add((max(0, end - w + 1) + off + 1, m))
    return out


@pytest.fixture(scope="module")
def fixture_docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _fixture_pd() -> pd.DataFrame:
    return pd.DataFrame(DOCS, columns=["doc_id", "text"])


def test_matches_brute_force(spark, fixture_docs):
    got = wn.winnow_fingerprints(fixture_docs, k=K, w=W).collect()
    by_doc: dict[int, set[tuple[int, int]]] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for doc_id, text in DOCS:
        assert by_doc.get(doc_id, set()) == brute_winnow(text), f"doc {doc_id}"


def test_tie_break_exercised_and_rightmost():
    # non-vacuity: doc 4 must actually contain a window whose min hash
    # occurs at two positions, so the rightmost rule is what produces the
    # brute-force (and therefore the Spark/DuckDB) answer
    toks = _tokens(DOCS[3][1])
    hs = [_h(" ".join(toks[i:i + K])) for i in range(len(toks) - K + 1)]
    tied = False
    for end in range(W - 1, len(hs)):
        window = hs[end - W + 1:end + 1]
        tied = tied or window.count(min(window)) >= 2
    assert tied, "fixture no longer exercises the tie-break path"


def test_every_window_covered(spark, fixture_docs):
    """The winnowing guarantee: every window of w consecutive k-gram
    positions contains at least one selected fingerprint position."""
    got = wn.winnow_fingerprints(fixture_docs, k=K, w=W).collect()
    sel = {}
    for r in got:
        sel.setdefault(r.doc_id, set()).add(r.pos)
    for doc_id, text in DOCS:
        n = max(len(_tokens(text)) - K + 1, 0)
        for start in range(1, n - W + 2):
            assert any(start <= p < start + W for p in sel[doc_id]), (
                f"doc {doc_id}: window at {start} uncovered")


def test_edge_docs(spark, fixture_docs):
    got = wn.winnow_fingerprints(fixture_docs, k=K, w=W).collect()
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc[5]) == 1 and by_doc[5][0].pos == 1  # single k-gram
    assert 6 not in by_doc and 7 not in by_doc            # sub-k / NULL


def test_match_pairs_near_clone(spark, fixture_docs):
    pairs = {(r.doc_a, r.doc_b): r.n_shared
             for r in wn.winnow_match_pairs(
                 fixture_docs, k=K, w=W, min_shared=2).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
    assert not any(3 in p for p in pairs)  # unrelated doc never pairs


def test_max_df_guard_drops_boilerplate(spark):
    # 12 docs all sharing one boilerplate sentence: with max_df >= 12 every
    # pair matches; with max_df < 12 the shared fingerprints are dropped
    # and no pairs survive — the hot-key guard is real, not decorative
    docs = spark.createDataFrame(
        [(i, f"unique{i} token{i} list{i} all rights reserved contact the site owner")
         for i in range(12)], "doc_id long, text string")
    loose = wn.winnow_match_pairs(docs, k=K, w=W, min_shared=1, max_df=50)
    tight = wn.winnow_match_pairs(docs, k=K, w=W, min_shared=1, max_df=5)
    assert loose.count() == 12 * 11 // 2
    assert tight.count() == 0


def test_duckdb_twins_on_fixture():
    con = duckdb.connect()
    con.register("fx", _fixture_pd())
    fps = con.sql(wn.winnow_fingerprints_sql(table="fx", k=K, w=W)).fetchall()
    by_doc: dict[int, set[tuple[int, int]]] = {}
    for doc_id, pos, fp in fps:
        by_doc.setdefault(doc_id, set()).add((pos, fp))
    for doc_id, text in DOCS:
        assert by_doc.get(doc_id, set()) == brute_winnow(text), f"doc {doc_id}"
    pairs = {(a, b): n for a, b, n in con.sql(
        wn.winnow_match_pairs_sql(table="fx", k=K, w=W, min_shared=2)).fetchall()}
    assert (1, 2) in pairs and pairs[(1, 2)] >= 2
