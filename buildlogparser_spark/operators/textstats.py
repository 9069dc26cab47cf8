"""Text analysis over the ``documents`` table: language-ID, quality scoring,
token counting, document fingerprinting (driver brief: training-data
pipeline ops). All pure column expressions — JVM-side, shuffle-free
(per-row), with DuckDB-portable semantics for the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import tokens

# Tiny per-language stopword marker lists for the n-gram/stopword heuristic.
# (A real deployment would load fastText lid.176 via a pandas UDF — the
# heuristic keeps this container-dependency-free and deterministic.)
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por"],
    "de": ["der", "die", "das", "und", "nicht", "mit", "ein", "ist"],
    "fr": ["le", "les", "des", "est", "une", "dans", "pour", "que"],
    "zh": ["de", "shi", "bu", "le", "zai", "wo", "you", "ren"],
}


def _marker_hits(toks: Column, lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))


def lang_id(documents: DataFrame) -> DataFrame:
    """(doc_id, lang_pred, lang_score): argmax over marker-hit counts,
    deterministic tie-break by language code; 'und' when nothing hits."""
    toks = tokens(F.col("text"))
    df = documents.select("doc_id", toks.alias("toks"))
    for lang in LANG_MARKERS:
        df = df.withColumn(f"hits_{lang}", _marker_hits(F.col("toks"), lang))
    best = None
    for lang in sorted(LANG_MARKERS):
        cand = F.struct(F.col(f"hits_{lang}").alias("hits"), F.lit(lang).alias("lang"))
        best = cand if best is None else F.when(
            (cand["hits"] > best["hits"]), cand).otherwise(best)
    return df.select(
        "doc_id",
        F.when(best["hits"] > 0, best["lang"]).otherwise("und").alias("lang_pred"),
        best["hits"].cast("long").alias("lang_score"),
    )


def token_count(documents: DataFrame) -> DataFrame:
    """(doc_id, n_tokens, n_chars_text): whitespace/punct tokenization +
    a BPE-ish subword estimate (ceil of chars/4 — the common
    ~4-chars-per-token heuristic, integer math only)."""
    toks = tokens(F.col("text"))
    return documents.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_text"),
        ((F.length("text") + 3) / 4).cast("long").alias("n_subwords_est"),
    )


def quality_score(documents: DataFrame) -> DataFrame:
    """(doc_id, …ratios…, quality): length/punctuation/stopword heuristics,
    each a rounded double; quality = gated composite in [0, 1]."""
    text = F.col("text")
    toks = tokens(text)
    n_chars = F.length(text)
    n_toks = F.size(toks)
    en_stop = F.array(*[F.lit(m) for m in LANG_MARKERS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(en_stop, t)))
    n_punct = n_chars - F.length(F.regexp_replace(text, r"[.,;:!?]", ""))
    mean_word_len = F.when(
        n_toks > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
        / n_toks,
    ).otherwise(F.lit(0.0))

    punct_ratio = F.when(n_chars > 0, n_punct / n_chars).otherwise(0.0)
    stop_ratio = F.when(n_toks > 0, stop_hits / n_toks).otherwise(0.0)
    quality = (
        F.when(n_toks < 5, 0.0)
        .otherwise(
            0.4 * F.least(n_toks / F.lit(100.0), F.lit(1.0))
            + 0.3 * F.least(stop_ratio * 5, F.lit(1.0))
            + 0.3 * (1 - F.least(punct_ratio * 10, F.lit(1.0)))
        )
    )
    return documents.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars_text"),
        n_toks.cast("long").alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def fingerprint(documents: DataFrame, window: int = 8) -> DataFrame:
    """(doc_id, fingerprint): winnowing-style document fingerprint — the
    minimum portable hash over all ``window``-token shingles (a 1-element
    winnow: robust to token order perturbations at the edges, cheap, and
    enough for bucketing). Portable md5 arithmetic, oracle-checkable."""
    from .dedup import _md5_i64, shingles

    sh = shingles(F.col("text"), window)
    hashes = F.transform(sh, lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"))
    return documents.select(
        "doc_id",
        F.when(F.size(hashes) > 0, F.array_min(hashes))
        .otherwise(_md5_i64(F.col("text"))).alias("fingerprint"),
    )
