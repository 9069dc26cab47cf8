"""Tests for the training-data ops not fully covered by the SQL-oracle
parity gate: approximate paths (LSH recall), Python-side plumbing
(mapInPandas decode stub), and cross-operator invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from conftest import SF_SMOKE

from buildlogparser_spark.operators import dedup, multimodal as mm, similarity as sim
from buildlogparser_spark.operators.assemble import parse_stateful
from buildlogparser_spark.operators.classify import classify
from buildlogparser_spark.rules.table import default_stack
from buildlogparser_spark.transcripts import load_transcripts


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_SMOKE}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_SMOKE}/embeddings.parquet")


def test_lsh_topk_recall(spark, emb):
    """The approximate ANN path must recover a meaningful fraction of the
    exact top-k on near-uniform random vectors (the hardest case for LSH —
    real embedding clusters only improve this)."""
    qids = [1, 2, 3, 4, 5]
    exact = {(r.query_id, r.neighbor_id)
             for r in sim.cosine_topk(emb, qids, 5).collect()}
    approx = {(r.query_id, r.neighbor_id)
              for r in sim.lsh_topk(emb, qids, 5, n_planes=4, n_tables=16).collect()}
    assert len(exact) == 25
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.4, f"LSH recall {recall} too low"
    # every approximate hit must be a real corpus vector, never the query
    assert all(q != n for q, n in approx)


def test_media_feature_plumbing(spark):
    media = mm.synthetic_media(spark, n=64)
    feats = mm.extract_features(media).collect()
    assert len(feats) == 64
    assert all(len(r.feature) == 8 for r in feats)
    # deterministic: same blob → same feature
    again = {r.asset_id: r.feature for r in mm.extract_features(media).collect()}
    assert all(again[r.asset_id] == r.feature for r in feats)


def test_media_strict_stub_raises(spark):
    media = mm.synthetic_media(spark, n=4)
    with pytest.raises(Exception, match="NotImplementedError|decode"):
        mm.extract_features(media, strict=True).collect()


def test_frame_sample_counts(spark):
    media = mm.synthetic_media(spark, n=64)
    out = mm.frame_sample_plan(media, every_ms=1000).groupBy("asset_id").count()
    rows = {r.asset_id: r["count"] for r in out.collect()}
    meta = {r.asset_id: r.duration_ms
            for r in media.filter(F.col("media_type") == "video/mp4").collect()}
    assert set(rows) == set(meta)
    for aid, dur in meta.items():
        assert rows[aid] == max(dur - 1, 0) // 1000 + 1


def test_stateful_equals_stateless_on_default_stack(spark):
    """With the default CLI stack the consumeLine machine degenerates to a
    stateless per-line classifier (SwiftBuildRule.isEnd defaults true —
    SwiftBuildRule.swift:52), so the applyInPandas general path must emit
    exactly the classify cascade's rows."""
    tr = load_transcripts(spark, SF_SMOKE)
    key_cols = ["conv_id", "turn_idx", "severity", "category", "message"]
    stateless = classify(tr).select(*key_cols)
    stateful = parse_stateful(tr, default_stack).select(
        "conv_id", F.col("start_turn_idx").alias("turn_idx"),
        "severity", "category", "message")
    assert stateless.exceptAll(stateful).count() == 0
    assert stateful.exceptAll(stateless).count() == 0


def test_dedup_exact_partition_invariance(spark, docs):
    total = docs.count()
    groups = dedup.dedup_exact(docs)
    assert groups.agg(F.sum("n_docs")).collect()[0][0] == total
    # identical result at different parallelism (the Spark analog of the
    # reference's multi-input consistency test)
    re32 = dedup.dedup_exact(docs.repartition(32))
    assert groups.exceptAll(re32).count() == 0


def test_embedding_near_dup_lsh_recall(spark, emb):
    """The LSH-blocked near-dup path must recover most true pairs at the
    0.4-cosine threshold (high-similarity pairs collide with high
    probability by construction)."""
    exact = {(r.vec_a, r.vec_b)
             for r in sim.embedding_near_dup(emb, 0.4).collect()}
    approx = {(r.vec_a, r.vec_b)
              for r in sim.embedding_near_dup_lsh(emb, 0.4).collect()}
    assert exact, "threshold too high — no true pairs at this sf"
    assert approx <= exact          # verification never admits false pairs
    recall = len(approx) / len(exact)
    assert recall >= 0.5, f"near-dup LSH recall {recall} too low"


def test_duplicate_docs_have_jaccard_one(spark, docs):
    """Appending an exact copy of a doc must produce a candidate pair with
    jaccard 1.0 through the full MinHash→LSH→verify pipeline."""
    base = docs.limit(1).select("doc_id", "text")
    clone = base.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    both = base.unionByName(clone)
    pairs = dedup.ngram_jaccard_pairs(both, threshold=0.5).collect()
    assert len(pairs) == 1
    assert pairs[0].jaccard == 1.0


def test_near_dup_components_chain_and_singleton(spark):
    """Chain 1-2-3 collapses to component 1 transitively (1 and 3 share no
    pair), 4-5 is its own component, 6 is a singleton."""
    from buildlogparser_spark.operators.dedup import near_dup_components

    docs = spark.createDataFrame([(i,) for i in range(1, 7)], "doc_id long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5)], "doc_a long, doc_b long")
    got = {r.doc_id: r.component_id
           for r in near_dup_components(docs, pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 6}


def test_near_dup_components_raises_on_unconverged(spark):
    """A chain longer than max_iter must fail loudly, not return partially
    propagated (wrong) labels (ADVICE r02)."""
    import pytest
    from buildlogparser_spark.operators.dedup import near_dup_components

    n = 12
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        near_dup_components(docs, pairs, max_iter=3)


def test_near_dup_components_star_long_chain(spark):
    """large-star/small-star collapses a diameter-40 path in O(log n)
    rounds — min-propagation would need ~40; differential equality against
    the min-propagation result (high max_iter) on the same graph."""
    from buildlogparser_spark.operators.dedup import (
        near_dup_components, near_dup_components_star)

    n = 41
    docs = spark.createDataFrame([(i,) for i in range(n)], "doc_id long")
    # path 0-1-…-40 plus a separate triangle and a singleton-rich tail
    edges = [(i, i + 1) for i in range(n - 1)]
    docs2 = spark.createDataFrame(
        [(i,) for i in range(n + 5)], "doc_id long")
    pairs = spark.createDataFrame(
        edges + [(n + 1, n + 2), (n + 2, n + 3), (n + 1, n + 3)],
        "doc_a long, doc_b long")
    star = {r.doc_id: r.component_id
            for r in near_dup_components_star(docs2, pairs, max_iter=12).collect()}
    prop = {r.doc_id: r.component_id
            for r in near_dup_components(docs2, pairs, max_iter=100).collect()}
    assert star == prop
    assert star[n - 1] == 0 and star[n + 3] == n + 1 and star[n] == n
    # docs ref kept for symmetry with the sibling test
    assert docs.count() == n


def test_near_dup_components_star_no_pairs(spark):
    from buildlogparser_spark.operators.dedup import near_dup_components_star

    docs = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    pairs = spark.createDataFrame([], "doc_a long, doc_b long")
    got = {r.doc_id: r.component_id
           for r in near_dup_components_star(docs, pairs).collect()}
    assert got == {i: i for i in range(5)}


def test_conversation_near_dups_semantics(spark):
    """Conversation-granular near-dup: non-empty on the derived stream,
    ordered pairs, every returned pair at/above the threshold, and every
    pair's conversations really exist."""
    from buildlogparser_spark.operators import dedup as dd
    from buildlogparser_spark.transcripts import load_transcripts

    tr = load_transcripts(spark, "/root/testdata/sf0.001")
    pairs = dd.conversation_near_dups(tr, snapshot_key="t:conv").collect()
    assert len(pairs) > 0
    convs = {r.conv_id for r in tr.select("conv_id").distinct().collect()}
    for p in pairs:
        assert p.doc_a < p.doc_b
        assert p.jaccard >= 0.2
        assert p.doc_a in convs and p.doc_b in convs
