"""Differential test: the Spark stateless classify cascade must equal the
pure-Python oracle running the reference's consumeLine state machine with the
default CLI rule stack, over the derived transcript table at sf0.001."""

from __future__ import annotations

from collections import Counter

from buildlogparser_spark.oracle import parse_lines
from buildlogparser_spark.rules.table import default_stack
from buildlogparser_spark.transcripts import TRANSCRIPT_SQL, load_transcripts
from buildlogparser_spark.operators.classify import classify

from conftest import SF_SMOKE


def _key(d: dict) -> tuple:
    return (d["conv_id"], d["raw"], d["category"], d["severity"], d["message"],
            d["file"], d["line"], d["column"], d["source"], d["build_target"])


def test_classify_matches_oracle(spark, duck_smoke):
    # expected: oracle over per-conversation ordered line streams
    from conftest import duck_df

    rows = duck_df(
        duck_smoke,
        f"SELECT conv_id, turn_idx, text FROM ({TRANSCRIPT_SQL}) t "
        "ORDER BY conv_id, turn_idx",
    ).itertuples(index=False)
    convs: dict[str, list[str]] = {}
    for conv_id, _, text in rows:
        convs.setdefault(conv_id, []).append(text)
    expected: Counter = Counter()
    for conv_id, lines in convs.items():
        for d in parse_lines(lines, default_stack()):
            assert d.related_messages == []  # stateless property holds
            expected[(conv_id, d.raw, d.category, d.severity, d.message,
                      d.file, d.line, d.column, d.source, d.build_target)] += 1

    got: Counter = Counter()
    out = classify(load_transcripts(spark, SF_SMOKE)).collect()
    for r in out:
        d = r.asDict()
        got[_key(d)] += 1

    missing = expected - got
    extra = got - expected
    assert not missing and not extra, (
        f"missing={list(missing.items())[:5]}\nextra={list(extra.items())[:5]}")
    assert sum(expected.values()) > 0
