"""Approximate-nearest-neighbor search over the ``embeddings`` table
(vec_id, embedding: array<float>, label).

* :func:`cosine_topk` — exact brute-force baseline: broadcast the (small)
  query set against the full corpus; per-row JVM-side dot product via
  ``F.aggregate``/``zip_with`` (no Python). At 10^12 rows this is the
  verification/recall-measurement path, run on samples.
* :func:`lsh_topk` — the scale path: random-hyperplane LSH (signs of dot
  products with deterministic md5-derived hyperplanes) buckets the corpus;
  candidates = same-bucket rows across ``n_tables`` independent tables;
  exact cosine re-rank on candidates only. Candidate generation is a
  bucket-equality join — shuffle on (table, bucket), never all-pairs.

Math is float64 end-to-end (cast from float32 storage) with sequential
left-to-right folds, matching the DuckDB oracle's evaluation to the last
bit in practice; scores are rounded for cross-engine hashing and ties are
broken by vec_id.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, functions as F

from ..rounding import portable_round, portable_round_sql
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def with_unit_vectors(embeddings: DataFrame) -> DataFrame:
    """Add a float64 L2-normalized copy of the embedding (cosine → dot).

    The norm is let-bound via a single-element ``transform`` so the
    normalizing division references a bound O(1) lambda variable — the
    naive ``transform(vec, v -> v / norm(vec))`` re-evaluates the whole
    norm fold per element (O(dim²); harmless at dim 64, wrong at
    production embedding widths). Same defense as
    :func:`~.dedup.shingles`."""
    vec = F.transform(F.col("embedding"), lambda v: v.cast("double"))

    def build(v: Column) -> Column:
        n = _norm(v)
        return F.element_at(
            F.transform(F.array(n),
                        lambda nn: F.when(nn > 0, F.transform(v, lambda x: x / nn))
                        .otherwise(v)), 1)

    return embeddings.withColumn(
        "unit", F.element_at(F.transform(F.array(vec), build), 1))


def cosine_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5) -> DataFrame:
    """Exact top-k neighbors (excluding self) for each query vec_id.

    Output: (query_id, neighbor_id, rank, cos_sim). The query side is tiny
    → broadcast; corpus side streams, one window per query for top-k
    (TakeOrdered per group). Deterministic: ties broken by neighbor_id.
    """
    base = with_unit_vectors(embeddings).select("vec_id", "unit")
    queries = base.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("q_unit"))
    scored = (
        base.join(F.broadcast(queries), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _dot(F.col("q_unit"), F.col("unit")).alias("sim"),
        )
    )
    # rank on sim rounded to 9 dp: sub-1e-9 float divergence (e.g. a future
    # engine fusing the fold differently) must not flip neighbor order; ties
    # break on neighbor_id in both engines
    w = Window.partitionBy("query_id").orderBy(
        F.desc(portable_round(F.col("sim"), 9)), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", portable_round(F.col("sim"), 4).alias("cos_sim"))
    )


def _hyperplanes(dim: int, n_planes: int, table: int) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: each component in [-1, 1)
    from md5(table, plane, i) — no RNG state, identical across engines."""
    planes = []
    for p in range(n_planes):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"lsh-{table}-{p}-{i}".encode()).hexdigest()
            row.append((int(h[:8], 16) / float(1 << 31)) - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(unit: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id over the hyperplanes (bit i = sign of dot_i)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(x) for x in plane])
        bit = F.when(_dot(unit, p) >= 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
        bucket = bucket + bit
    return bucket


def lsh_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             n_planes: int = 8, n_tables: int = 4, dim: int = 64,
             snapshot_key: str | None = None) -> DataFrame:
    """Banded random-hyperplane ANN: same output schema as cosine_topk but
    only candidates sharing an LSH bucket (any table) are scored. May miss
    true neighbors (approximate); recall measured in tests vs cosine_topk.

    ``snapshot_key`` memoizes the banded corpus (unit vectors + bucket ids
    per table) to a keyed parquet snapshot, like
    :func:`embedding_near_dup_lsh` — repeated top-k calls against the same
    corpus then skip the normalize+hash recompute and scan the snapshot."""
    base = with_unit_vectors(embeddings).select("vec_id", "unit")
    tables = []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        tables.append(base.select(
            "vec_id", "unit", F.lit(t).alias("tbl"),
            lsh_bucket(F.col("unit"), planes).alias("bucket")))
    banded = tables[0]
    for t in tables[1:]:
        banded = banded.unionByName(t)
    if snapshot_key is not None:
        from ..materialize import materialize

        banded = materialize(
            banded, key=f"annband:{snapshot_key}:{n_planes}:{n_tables}:{dim}")

    queries = banded.filter(F.col("vec_id").isin(query_ids)).select(
        F.col("vec_id").alias("query_id"), F.col("unit").alias("q_unit"),
        "tbl", "bucket")
    cands = (
        banded.join(F.broadcast(queries),
                    ["tbl", "bucket"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "unit", "q_unit")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cands.select(
        "query_id", "neighbor_id", _dot(F.col("q_unit"), F.col("unit")).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", portable_round(F.col("sim"), 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# DuckDB twin (correctness oracle) for the exact brute-force path. The fold
# order matches the Spark expressions exactly (left fold, double math), so
# scores agree bit-for-bit; ranking uses the same portable 9-dp round + vec_id
# tie-break.
# ---------------------------------------------------------------------------

_DOT_SQL = ("list_reduce(list_transform(range(1, len({a}) + 1), "
            "i -> {a}[i] * {b}[i]), (x, y) -> x + y)")


def cosine_topk_sql(query_ids: list[int], k: int = 5,
                    table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    dot = _DOT_SQL.format(a="u.unit", b="q.q_unit")
    return f"""
WITH vec AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v FROM {table}
),
unitv AS (
  SELECT vec_id,
         CASE WHEN n > 0 THEN list_transform(v, x -> x / n) ELSE v END AS unit
  FROM (SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS n
        FROM vec) t
),
q AS (SELECT vec_id AS query_id, unit AS q_unit FROM unitv WHERE vec_id IN ({ids})),
scored AS (
  SELECT q.query_id, u.vec_id AS neighbor_id, {dot} AS sim
  FROM unitv u CROSS JOIN q
  WHERE u.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, {portable_round_sql('sim', 4)} AS cos_sim
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY {portable_round_sql('sim', 9)} DESC, neighbor_id) AS rank
      FROM scored) r
WHERE rank <= {k}
"""


def embedding_near_dup(embeddings: DataFrame, threshold: float = 0.4) -> DataFrame:
    """Embedding-cosine near-duplicate pairs — exact all-pairs baseline
    (vec_a < vec_b, cosine ≥ threshold). The verification/recall path; at
    corpus scale use :func:`embedding_near_dup_lsh`."""
    base = with_unit_vectors(embeddings).select("vec_id", "unit")
    a, b = base.alias("a"), base.alias("b")
    sim = _dot(F.col("a.unit"), F.col("b.unit"))
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("vec_a"),
                F.col("b.vec_id").alias("vec_b"),
                portable_round(sim, 9).alias("sim9"))
        .filter(F.col("sim9") >= threshold)
        .select("vec_a", "vec_b", portable_round(F.col("sim9"), 4).alias("cos_sim"))
    )


def embedding_near_dup_lsh(embeddings: DataFrame, threshold: float = 0.4,
                           n_planes: int = 4, n_tables: int = 8,
                           dim: int = 64,
                           snapshot_key: str | None = None) -> DataFrame:
    """Scale path: random-hyperplane LSH blocks candidates (same-bucket in
    any table), exact cosine verifies — never an all-pairs join.
    Approximate: may miss pairs whose vectors disagree in every table."""
    base = with_unit_vectors(embeddings).select("vec_id", "unit")
    banded = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, t)
        part = base.select(
            "vec_id", "unit", F.lit(t).alias("tbl"),
            lsh_bucket(F.col("unit"), planes).alias("bucket"))
        banded = part if banded is None else banded.unionByName(part)
    from ..materialize import materialize

    key = (f"embnd-banded:{snapshot_key}:{n_planes}:{n_tables}:{dim}"
           if snapshot_key else None)
    banded = materialize(banded, key=key)  # self-join computes each side otherwise
    l, r = banded.alias("l"), banded.alias("r")
    cands = (
        l.join(r, [F.col("l.tbl") == F.col("r.tbl"),
                   F.col("l.bucket") == F.col("r.bucket"),
                   F.col("l.vec_id") < F.col("r.vec_id")])
        .select(F.col("l.vec_id").alias("vec_a"), F.col("r.vec_id").alias("vec_b"),
                F.col("l.unit").alias("ua"), F.col("r.unit").alias("ub"))
        .dropDuplicates(["vec_a", "vec_b"])
    )
    sim = _dot(F.col("ua"), F.col("ub"))
    return (
        cands.select("vec_a", "vec_b", portable_round(sim, 9).alias("sim9"))
        .filter(F.col("sim9") >= threshold)
        .select("vec_a", "vec_b", portable_round(F.col("sim9"), 4).alias("cos_sim"))
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — the coarse-quantizer scale path the brief names
# beside LSH. Vectors are assigned to their nearest coarse centroid once
# (one corpus pass, per-row expression, shuffle-free); a query probes only
# the ``nprobe`` centroid lists nearest to it, so search cost is
# corpus_size * nprobe / n_centroids instead of corpus_size. The quantizer
# here is deterministic (md5-derived pseudo-random unit centroids, identical
# literals in both engines); production would train it with sampled k-means
# offline and broadcast the trained table — the query plans are identical.
# ---------------------------------------------------------------------------


def _ivf_centroids(n_centroids: int, dim: int) -> list[list[float]]:
    """Deterministic unit-norm centroids: components in [-1, 1) from
    md5(centroid, i), L2-normalized driver-side. Plain double math — the
    SAME literals are embedded in the Spark plan and the DuckDB twin."""
    cents = []
    for c in range(n_centroids):
        row = []
        for i in range(dim):
            h = hashlib.md5(f"ivf-{c}-{i}".encode()).hexdigest()
            row.append((int(h[:8], 16) / float(1 << 31)) - 1.0)
        n = sum(x * x for x in row) ** 0.5
        cents.append([x / n for x in row])
    return cents


def ivf_assign(embeddings: DataFrame, n_centroids: int = 16,
               dim: int = 64) -> DataFrame:
    """(vec_id, cluster, cos_sim): nearest coarse centroid per vector.

    One per-row JVM expression — n_centroids sequential-fold dot products
    and an array_max argmax over (sim, -cid) structs (struct ordering:
    highest sim wins, ties go to the LOWEST cid — matching the row_number
    tie-break in the SQL twin; a chained when()-fold would duplicate its
    subtree per level and grow the plan 2^n_centroids). No shuffle, no
    UDF; the assignment column IS the IVF partition key downstream."""
    base = with_unit_vectors(embeddings).select("vec_id", "unit")
    sims = F.array(*[
        F.struct(
            portable_round(_dot(F.col("unit"), F.array(*[F.lit(x) for x in cent])), 9).alias("sim"),
            F.lit(-cid).alias("negcid"))
        for cid, cent in enumerate(_ivf_centroids(n_centroids, dim))])
    best = F.array_max(sims)
    return base.select(
        "vec_id",
        (-best["negcid"]).cast("int").alias("cluster"),
        portable_round(best["sim"], 4).alias("cos_sim"),
    )


def ivf_topk(embeddings: DataFrame, query_ids: list[int], k: int = 5,
             n_centroids: int = 16, nprobe: int = 4, dim: int = 64,
             snapshot_key: str | None = None) -> DataFrame:
    """IVF ANN top-k: same output schema as cosine_topk, but each query is
    scored only against the ``nprobe`` centroid lists nearest to it.
    Approximate — recall vs cosine_topk asserted in pytest. Deterministic
    end-to-end (fixed centroids), so it carries a full DuckDB oracle.

    Plan: assignment scan (shuffle-free) → tiny exploded probe table
    (len(query_ids) × nprobe rows, broadcast) → equi-join on cluster →
    exact re-rank on candidates. The corpus is never all-pairs joined."""
    base = with_unit_vectors(embeddings).select("vec_id", "unit")
    corpus = _assigned_corpus(embeddings, n_centroids, dim, snapshot_key)

    cents = _ivf_centroids(n_centroids, dim)
    probe_sims = F.array(*[
        F.struct(portable_round(_dot(F.col("unit"), F.array(*[F.lit(x) for x in c])), 9).alias("sim"),
                 F.lit(cid).alias("cid"))
        for cid, c in enumerate(cents)])
    # top-nprobe centroids per query: reverse-sort the (sim, cid) structs —
    # struct order sorts sim asc then cid asc, so the reverse is sim desc,
    # cid desc; to match the SQL row_number (sim desc, cid ASC) flip the cid
    # sign inside the sort key
    keyed = F.transform(
        probe_sims, lambda s: F.struct(s["sim"].alias("sim"),
                                       (-s["cid"]).alias("negcid"),
                                       s["cid"].alias("cid")))
    probes = F.slice(F.reverse(F.array_sort(keyed)), 1, nprobe)
    queries = (
        base.filter(F.col("vec_id").isin(query_ids))
        .select(F.col("vec_id").alias("query_id"), F.col("unit").alias("q_unit"),
                F.explode(F.transform(probes, lambda s: s["cid"])).alias("cluster"))
    )
    cands = (
        corpus.join(F.broadcast(queries), "cluster")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), "unit", "q_unit")
    )
    scored = cands.select(
        "query_id", "neighbor_id", _dot(F.col("q_unit"), F.col("unit")).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc(portable_round(F.col("sim"), 9)), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank",
                portable_round(F.col("sim"), 4).alias("cos_sim"))
    )


def _assigned_corpus(embeddings: DataFrame, n_centroids: int, dim: int,
                     snapshot_key: str | None) -> DataFrame:
    """(vec_id, unit, cluster): unit vectors joined with their IVF
    assignment, snapshot-materialized under the shared ``ivf:`` key —
    ivf_topk and semantic_dedup consume the IDENTICAL relation, so they
    share one snapshot instead of deriving (and writing) it twice."""
    assigned = ivf_assign(embeddings, n_centroids, dim).select("vec_id", "cluster")
    corpus = (with_unit_vectors(embeddings).select("vec_id", "unit")
              .join(assigned, "vec_id"))
    if snapshot_key is not None:
        from ..materialize import materialize

        corpus = materialize(corpus, key=f"ivf:{snapshot_key}:{n_centroids}:{dim}")
    return corpus


def semantic_dedup(embeddings: DataFrame, threshold: float = 0.4,
                   n_centroids: int = 16, dim: int = 64,
                   snapshot_key: str | None = None) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    web-scale through semantic deduplication", public arXiv 2303.09540):
    embedding-space near-duplicates are detected WITHIN each coarse IVF
    cluster only, never corpus-wide — the clustering bounds the pairwise
    work to Σ |cluster|², exactly the paper's k-means trick.

    Output (vec_id, cluster, kept): ``kept`` is false iff a LOWER-id
    vector in the same cluster has cosine ≥ threshold (the deterministic
    keep-the-first policy; the paper keeps one representative per
    ε-neighborhood — lowest id is our canonical pick, matching
    :func:`~.dedup.dedup_exact`).

    Scale shape: one shuffle-free assignment pass (:func:`ivf_assign`),
    one self-join shuffled on the cluster id, one left-semi mark-join back
    on vec_id. A real deployment trains the quantizer offline with enough
    centroids that clusters stay small (the paper uses 50k clusters for
    web scale); the fixed md5 centroids here make both engines bit-equal."""
    corpus = _assigned_corpus(embeddings, n_centroids, dim, snapshot_key)
    l, r = corpus.alias("l"), corpus.alias("r")
    sim = _dot(F.col("l.unit"), F.col("r.unit"))
    dropped = (
        l.join(r, [F.col("l.cluster") == F.col("r.cluster"),
                   F.col("l.vec_id") < F.col("r.vec_id")])
        .filter(portable_round(sim, 9) >= threshold)
        .select(F.col("r.vec_id").alias("vec_id"))
        .distinct()
    )
    return (
        corpus.select("vec_id", "cluster")
        .join(dropped.withColumn("is_dup", F.lit(True)), "vec_id", "left")
        .select("vec_id", F.col("cluster").cast("int").alias("cluster"),
                F.coalesce(~F.col("is_dup"), F.lit(True)).alias("kept"))
    )


def semantic_dedup_sql(threshold: float = 0.4, n_centroids: int = 16,
                       dim: int = 64, table: str = "embeddings") -> str:
    dot = _DOT_SQL.format(a="a.unit", b="b.unit")
    return f"""
WITH {_UNITV_SQL.format(table=table)},
{_ivf_assign_core_sql(n_centroids, dim)},
assigned AS MATERIALIZED (
  SELECT vec_id, cid AS cluster, unit FROM csim WHERE rk = 1
),
dropped AS (
  SELECT DISTINCT b.vec_id
  FROM assigned a JOIN assigned b
    ON a.cluster = b.cluster AND a.vec_id < b.vec_id
  WHERE {portable_round_sql(dot, 9)} >= {threshold}
)
SELECT s.vec_id, CAST(s.cluster AS INTEGER) AS cluster,
       (d.vec_id IS NULL) AS kept
FROM assigned s LEFT JOIN dropped d USING (vec_id)
"""


def _centroids_values_sql(n_centroids: int, dim: int) -> str:
    rows = ", ".join(
        f"({cid}, [{', '.join(repr(x) for x in cent)}])"
        for cid, cent in enumerate(_ivf_centroids(n_centroids, dim)))
    return f"(VALUES {rows}) c(cid, cvec)"


_UNITV_SQL = """
vec AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v FROM {table}
),
unitv AS (
  SELECT vec_id,
         CASE WHEN n > 0 THEN list_transform(v, x -> x / n) ELSE v END AS unit
  FROM (SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS n
        FROM vec) t
)"""


def _ivf_assign_core_sql(n_centroids: int, dim: int) -> str:
    """Shared CTE body: every (vec, centroid) sim plus the per-vec rank —
    rank 1 is the assignment, rank ≤ nprobe is a query's probe list."""
    dot = _DOT_SQL.format(a="u.unit", b="c.cvec")
    return f"""
csim AS MATERIALIZED (
  SELECT u.vec_id, c.cid, u.unit, {portable_round_sql(dot, 9)} AS sim,
         row_number() OVER (PARTITION BY u.vec_id
                            ORDER BY {portable_round_sql(dot, 9)} DESC, c.cid) AS rk
  FROM unitv u CROSS JOIN {_centroids_values_sql(n_centroids, dim)}
)"""


def ivf_assign_sql(n_centroids: int = 16, dim: int = 64,
                   table: str = "embeddings") -> str:
    return f"""
WITH {_UNITV_SQL.format(table=table)},
{_ivf_assign_core_sql(n_centroids, dim)}
SELECT vec_id, CAST(cid AS INTEGER) AS cluster,
       {portable_round_sql('sim', 4)} AS cos_sim
FROM csim WHERE rk = 1
"""


def ivf_topk_sql(query_ids: list[int], k: int = 5, n_centroids: int = 16,
                 nprobe: int = 4, dim: int = 64,
                 table: str = "embeddings") -> str:
    ids = ", ".join(str(i) for i in query_ids)
    dot = _DOT_SQL.format(a="q.q_unit", b="a.unit")
    return f"""
WITH {_UNITV_SQL.format(table=table)},
{_ivf_assign_core_sql(n_centroids, dim)},
assigned AS (SELECT vec_id, cid AS cluster, unit FROM csim WHERE rk = 1),
probes AS (
  SELECT vec_id AS query_id, unit AS q_unit, cid AS cluster
  FROM csim WHERE vec_id IN ({ids}) AND rk <= {nprobe}
),
scored AS (
  SELECT q.query_id, a.vec_id AS neighbor_id, {dot} AS sim
  FROM assigned a JOIN probes q USING (cluster)
  WHERE a.vec_id <> q.query_id
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank,
       {portable_round_sql('sim', 4)} AS cos_sim
FROM (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY {portable_round_sql('sim', 9)} DESC, neighbor_id) AS rank
      FROM scored) r
WHERE rank <= {k}
"""


def embedding_near_dup_sql(threshold: float = 0.4,
                           table: str = "embeddings",
                           where_sql: str = "") -> str:
    """DuckDB twin of the exact all-pairs path; ``where_sql`` restricts the
    id set (the graded use is a mod-sampled verification subset)."""
    dot = _DOT_SQL.format(a="a.unit", b="b.unit")
    return f"""
WITH vec AS (
  SELECT vec_id, list_transform(embedding, v -> CAST(v AS DOUBLE)) AS v FROM {table} {where_sql}
),
unitv AS (
  SELECT vec_id,
         CASE WHEN n > 0 THEN list_transform(v, x -> x / n) ELSE v END AS unit
  FROM (SELECT vec_id, v,
               sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)) AS n
        FROM vec) t
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       {portable_round_sql(portable_round_sql(dot, 9), 4)} AS cos_sim
FROM unitv a JOIN unitv b ON a.vec_id < b.vec_id
WHERE {portable_round_sql(dot, 9)} >= {threshold}
"""
