"""Multi-input consistency — the Spark analog of the reference's test that
the same text through StringInput/StringArrayInput/DataInput yields
identical results (BuildLogParserTests.swift:136-183): the same transcript
rows via (a) the derived view, (b) a parquet round-trip, (c) driver-side
createDataFrame, at different partition counts, must classify identically."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from buildlogparser_spark.operators.classify import classify
from buildlogparser_spark.transcripts import load_transcripts

KEY = ["conv_id", "turn_idx", "rule_id", "severity", "category", "message"]


def _counts(df):
    return {tuple(r) for r in df.groupBy("category").count().collect()}


def test_three_inputs_identical(spark, tmp_path):
    derived = load_transcripts(spark, SF_SMOKE)

    pq = str(tmp_path / "tr")
    derived.write.parquet(pq)
    roundtrip = spark.read.parquet(pq)

    local_rows = derived.collect()
    recreated = spark.createDataFrame(local_rows, derived.schema)

    a = classify(derived).select(*KEY)
    b = classify(roundtrip).select(*KEY)
    c = classify(recreated.repartition(13)).select(*KEY)

    assert _counts(a) == _counts(b) == _counts(c)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.exceptAll(c).count() == 0 and c.exceptAll(a).count() == 0


def test_shuffle_partition_invariance(spark):
    tr = load_transcripts(spark, SF_SMOKE)
    base = {tuple(r) for r in classify(tr).groupBy("severity").count().collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        two = {tuple(r) for r in classify(tr).groupBy("severity").count().collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == two


def test_pack_explode_roundtrip_edge_cases(spark):
    """StringInput semantics round-trip on adversarial shapes: blank lines
    (also consecutive and page-final), pages shorter than page_size,
    conversations of 1 turn, unicode, leading/trailing whitespace."""
    from buildlogparser_spark.operators.lines import explode_lines, pack_pages

    convs = {
        "one": ["solo line"],
        "blanks": ["", "", "x", "", ""],
        "long": [f"line {i}" if i % 3 else "" for i in range(17)],
        "uni": ["  ⚠️ caret ^  ", "\ttab lead", "ünïcode"],
    }
    rows = [(c, i, t) for c, ls in convs.items() for i, t in enumerate(ls)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    for k in (1, 2, 16):
        back = explode_lines(pack_pages(df, page_size=k), page_size=k)
        got = {(r.conv_id, r.turn_idx): r.text for r in back.collect()}
        assert got == {(c, i): t for c, i, t in rows}, f"page_size={k}"
