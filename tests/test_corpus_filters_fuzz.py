"""Seeded randomized Spark-vs-DuckDB parity for the corpus filters over
adversarial ASCII text (the corpora these operators target are
ASCII-normalized upstream; the regex/tokenizer semantics are written to
the Java-regex ∩ RE2 common subset, which is ASCII by construction).

One batched DataFrame per operator — not one job per example — so the
whole fuzz is three Spark jobs."""

from __future__ import annotations

import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import Row

from buildlogparser_spark.operators import corpus_filters as cf
from conftest import assert_frames_match

ALPHABET = (
    list("abcdefghijklmnopqrstuvwxyz") + list("ABCDEFXYZ") + list("0123456789")
    + list(" " * 12) + list(".,;:!?@-_%+<>()[]/\\'\"\n\t") + ["  ", "..", "@@"]
)
SNIPPETS = [
    "a@b.co", "1.2.3.4", "999.999.999.999", "12345678", "x@y", "@", "1.2.3",
    "user.name+tag@sub.domain.org", "tok tok tok", "..@..", "0.0.0.0:8080",
    "email@example.com.", "12.34.56.78.90", "a1b2c3d4e5f6g7", "",
]


def _fuzz_rows(n: int, seed: int) -> list[tuple[int, str]]:
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        parts = []
        for _ in range(rng.randint(0, 30)):
            parts.append(rng.choice(SNIPPETS) if rng.random() < 0.25
                         else "".join(rng.choice(ALPHABET)
                                      for _ in range(rng.randint(1, 10))))
        rows.append((i, " ".join(parts)))
    return rows


@pytest.fixture(scope="module")
def fuzz_docs(spark):
    rows = _fuzz_rows(300, seed=20260818)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source="fz", n_chars=len(t))
         for i, t in rows])
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(
        {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows],
         "lang": "en", "source": "fz",
         "n_chars": [len(t) for _, t in rows]}))
    return df, con


def test_pii_redact_fuzz_parity(fuzz_docs):
    df, con = fuzz_docs
    assert_frames_match(
        cf.pii_redact(df), con.execute(cf.pii_redact_sql()).fetchdf(),
        "pii_redact_fuzz")


def test_repetition_stats_fuzz_parity(fuzz_docs):
    df, con = fuzz_docs
    assert_frames_match(
        cf.repetition_stats(df),
        con.execute(cf.repetition_stats_sql()).fetchdf(),
        "repetition_stats_fuzz")


def test_decontaminate_fuzz_parity(fuzz_docs):
    df, con = fuzz_docs
    # k=3 so the random soup actually produces benchmark hits
    assert_frames_match(
        cf.decontaminate(df, k=3),
        con.execute(cf.decontaminate_sql(k=3)).fetchdf(),
        "decontaminate_fuzz")


def test_boilerplate_fuzz_parity(fuzz_docs):
    df, con = fuzz_docs
    # min_docs=2: the snippet pool repeats, so flagged trigrams exist
    assert_frames_match(
        cf.boilerplate_ngrams(df, min_docs=2),
        con.execute(cf.boilerplate_ngrams_sql(min_docs=2)).fetchdf(),
        "boilerplate_ngrams_fuzz")
    assert_frames_match(
        cf.boilerplate_stats(df, min_docs=2),
        con.execute(cf.boilerplate_stats_sql(min_docs=2)).fetchdf(),
        "boilerplate_stats_fuzz")


def test_sequence_pack_fuzz_parity(fuzz_docs):
    df, con = fuzz_docs
    assert_frames_match(
        cf.sequence_pack_plan(df, seq_len=16, n_shards=4),
        con.execute(cf.sequence_pack_plan_sql(seq_len=16, n_shards=4)).fetchdf(),
        "sequence_pack_fuzz")


def test_source_mix_fuzz_parity(spark, fuzz_docs):
    # re-shard the fuzz docs over 5 sources (the shared fixture pins one
    # source, which would make the weights vacuously 1.0)
    _, con = fuzz_docs
    rows = _fuzz_rows(300, seed=20260818)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang="en", source=f"s{i % 5}", n_chars=len(t))
         for i, t in rows])
    con.register("documents_mix", pd.DataFrame(
        {"doc_id": [i for i, _ in rows], "text": [t for _, t in rows],
         "lang": "en", "source": [f"s{i % 5}" for i, _ in rows],
         "n_chars": [len(t) for _, t in rows]}))
    assert_frames_match(
        cf.source_mix_weights(df),
        con.execute(cf.source_mix_weights_sql(table="documents_mix")).fetchdf(),
        "source_mix_fuzz")
