"""Streaming drift monitor (streaming/drift.py): per-micro-batch PSI
against a fixed reference histogram must equal the independent pure-Python
computation on the same rows, a distribution-matching batch must read ~0,
and a skewed batch must alert. Batch order is pinned structurally: each
availableNow run terminates before the next file is written (the ADVICE
r04 test_streaming.py lesson)."""

from __future__ import annotations

import math

from buildlogparser_spark.operators.drift import psi_value
from buildlogparser_spark.streaming.drift import (
    reference_histogram, stream_drift_monitor)

SCHEMA = "doc_id long, text string, lang string, source string"


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, "t", lang, src) for i, (lang, src) in enumerate(rows)], SCHEMA)


def _write(spark, rows, path, start_id=0):
    spark.createDataFrame(
        [(start_id + i, "t", lang, src)
         for i, (lang, src) in enumerate(rows)],
        SCHEMA).coalesce(1).write.mode("append").parquet(path)


REF_ROWS = [("en", "web")] * 6 + [("de", "web")] * 2 + [("en", "code")] * 2


def test_stream_psi_per_batch_matches_reference_impl(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    ref = reference_histogram(_docs(spark, REF_ROWS))
    assert ref == {"lang": {"en": 8, "de": 2},
                   "source": {"web": 8, "code": 2}}

    results: list[tuple[int, str, float, bool]] = []

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(in_dir)
        q = stream_drift_monitor(
            stream, ref, lambda *t: results.append(t),
            threshold=0.25, checkpoint_dir=ckpt)
        assert q.awaitTermination(180), "stream run did not finish"

    # batch 0: same mix as the reference -> tiny PSI, no alert
    batch0 = [("en", "web")] * 3 + [("de", "web")] + [("en", "code")]
    # batch 1: all-zh from a new source -> large PSI, alert on both dims
    batch1 = [("zh", "crawl9")] * 5
    _write(spark, batch0, in_dir, start_id=100)
    run_once()
    _write(spark, batch1, in_dir, start_id=200)
    run_once()

    by_key = {(b, d): (psi, alert) for b, d, psi, alert in results}
    assert set(by_key) == {(0, "lang"), (0, "source"), (1, "lang"),
                           (1, "source")}

    # independent recomputation with the shared reference implementation
    def hist(rows):
        h: dict[str, dict[str, int]] = {"lang": {}, "source": {}}
        for lang, src in rows:
            h["lang"][lang] = h["lang"].get(lang, 0) + 1
            h["source"][src] = h["source"].get(src, 0) + 1
        return h

    for b, rows in ((0, batch0), (1, batch1)):
        for dim in ("lang", "source"):
            expect = psi_value(ref[dim], hist(rows)[dim])
            got, alert = by_key[(b, dim)]
            assert got == expect
            assert alert == (expect >= 0.25)

    # the semantic pins: matching mix stays quiet, the shifted batch alerts
    assert not by_key[(0, "lang")][1] and not by_key[(0, "source")][1]
    assert by_key[(1, "lang")][1] and by_key[(1, "source")][1]


def test_psi_value_zero_on_identical_histograms():
    h = {"en": 10, "de": 5}
    assert psi_value(h, h) == 0.0
    # scaled histogram: identical PROPORTIONS but different totals ->
    # smoothing makes it near-zero, far under any alert threshold
    assert abs(psi_value(h, {"en": 20, "de": 10})) < 0.01


def test_psi_value_disjoint_histograms_is_large():
    v = psi_value({"en": 10}, {"zh": 10})
    assert v >= 0.25 and math.isfinite(v)
