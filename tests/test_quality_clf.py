"""Trained-quality-classifier tests (operators/quality_clf.py): learning
actually happens (separable fixture), the degenerate non-discriminative
case converges to the base rate instead of oscillating (the bug the L2
normalization fixed), cross-engine training parity including a
subsampled trainer, and NULL/empty robustness. The graded sf0.01 hash
check lives in the driver sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from buildlogparser_spark.operators import quality_clf as qc
from conftest import SF_SMOKE, assert_frames_match, duck_df


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang, source="s0",
             n_chars=len(t) if t is not None else 0)
         for i, (t, lang) in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long")


def _sep_fixture(spark, n_per_class=40):
    """Two classes with DISJOINT vocabularies (the graded synthetic corpus
    shares one vocabulary across langs, so separation must be proven
    here)."""
    rows = (
        [(" ".join(f"enword{j}" for j in range(i % 7, i % 7 + 30)), "en")
         for i in range(n_per_class)]
        + [(" ".join(f"deword{j}" for j in range(i % 7, i % 7 + 30)), "de")
           for i in range(n_per_class)])
    return _docs(spark, rows)


def test_classifier_separates_disjoint_vocab(spark):
    out = qc.quality_classifier(_sep_fixture(spark), n_buckets=256).toPandas()
    en = out[out.doc_id < 40].quality_prob
    de = out[out.doc_id >= 40].quality_prob
    assert en.min() > de.max(), "classes must be fully separated"
    assert en.mean() > 0.6 and de.mean() < 0.4


def test_nondiscriminative_converges_to_base_rate(spark):
    # identical text everywhere, 30% target: no feature can separate, so
    # the only consistent answer is p ~= the base rate for every doc.
    # Raw-presence features oscillated to p ~= 0.04 here (150x lr per-doc
    # margin steps); unit-L2 features must land near 0.3, not explode.
    text = "the same words in every single document here today"
    rows = [(text, "en" if i < 3 else "de") for i in range(10)]
    out = qc.quality_classifier(_docs(spark, rows), n_buckets=64).toPandas()
    assert out.quality_prob.nunique() == 1  # identical docs, identical score
    assert abs(out.quality_prob.iloc[0] - 0.3) < 0.15


def test_null_and_empty_docs_score_bias_only(spark):
    rows = [("alpha beta gamma delta", "en"), ("alpha beta gamma", "de"),
            (None, "en"), ("", "de")]
    out = {r.doc_id: r for r in
           qc.quality_classifier(_docs(spark, rows), n_buckets=64).collect()}
    assert out[2].n_buckets_hit == 0 and out[3].n_buckets_hit == 0
    assert out[2].quality_prob == out[3].quality_prob  # both = sigmoid(bias)
    assert 0.0 < out[2].quality_prob < 1.0


def test_duckdb_training_parity_smoke(spark, duck_smoke):
    assert_frames_match(
        qc.quality_classifier(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet")),
        duck_df(duck_smoke, qc.quality_classifier_sql()),
        "quality_classifier")


def test_duckdb_parity_with_subsampled_trainer(spark, duck_smoke):
    # the 10^12-doc contract: training on the md5(doc_id)%3==0 subset,
    # scoring the full corpus — still a full value oracle
    assert_frames_match(
        qc.quality_classifier(
            spark.read.parquet(f"{SF_SMOKE}/documents.parquet"),
            sample_mod=3),
        duck_df(duck_smoke, qc.quality_classifier_sql(sample_mod=3)),
        "quality_classifier_sample3")


def test_empty_training_sample_keeps_every_doc(spark, duck_smoke):
    # a sample_mod that hashes out EVERY doc (review finding: the inner
    # bias join silently emptied the whole result in Spark while DuckDB
    # returned NULL probs) — the zero-gradient reading must keep the
    # untrained model: every doc present, p = sigmoid(0) = 0.5, both
    # engines agreeing
    import hashlib

    import duckdb as _duck

    doc_ids = [r[0] for r in _duck.connect().execute(
        f"SELECT doc_id FROM read_parquet('{SF_SMOKE}/documents.parquet')"
    ).fetchall()]

    def h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)

    mod = next(k for k in range(3, 10_000)
               if all(h(i) % k != 0 for i in doc_ids))
    sdf = qc.quality_classifier(
        spark.read.parquet(f"{SF_SMOKE}/documents.parquet"), sample_mod=mod)
    pdf = sdf.toPandas()
    assert len(pdf) == len(doc_ids)
    assert (pdf.quality_prob == 0.5).all()
    assert_frames_match(
        sdf, duck_df(duck_smoke, qc.quality_classifier_sql(sample_mod=mod)),
        "quality_classifier_empty_sample")


def test_custom_target_flips_scores(spark):
    fx = _sep_fixture(spark, n_per_class=20)
    out_de = qc.quality_classifier(
        fx, n_buckets=256, target=F.col("lang") == "de").toPandas()
    de = out_de[out_de.doc_id >= 20].quality_prob
    en = out_de[out_de.doc_id < 20].quality_prob
    assert de.min() > en.max()
