"""Fixed-size overlapping document chunking — the retrieval/RAG prep step
that turns a document corpus into embedding-ready passages (chunk size and
overlap in characters, the tokenizer-free convention; pair with
``textstats.token_count``'s BPE estimate when budgets must be in tokens).

Scale shape (10^12 tokens): one generate-offsets + explode per row — no
shuffle at all; chunk count per document is length/stride, so cost is
linear in corpus bytes and a pathological single document is the same
long-document skew class ``BENCH/SKEW.md`` tracks (the offsets array is
O(n/stride), far smaller than the token explodes used elsewhere).

Reference analog: none (the reference parses diagnostics); this is the
training-data/retrieval layer the driver brief asks for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def doc_chunks(documents: DataFrame, chunk_chars: int = 1024,
               overlap: int = 128, text_col: str = "text") -> DataFrame:
    """(doc_id, chunk_idx, start_char, chunk_text, n_chunk_chars): sliding
    character windows of ``chunk_chars`` advancing by ``chunk_chars -
    overlap``. Every character of the document lands in ≥1 chunk; the last
    chunk may be short. NULL/empty documents produce zero chunks."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    stride = chunk_chars - overlap
    base = documents.select(
        "doc_id", F.coalesce(F.col(text_col), F.lit("")).alias("text"))
    starts = F.when(
        F.length("text") > 0,
        F.sequence(F.lit(0), F.length("text") - 1, F.lit(stride)),
    ).otherwise(F.array().cast("array<int>"))
    ex = base.select("doc_id", "text", F.posexplode(starts))
    chunk = F.substring(F.col("text"), F.col("col") + 1, chunk_chars)
    return ex.select(
        "doc_id",
        F.col("pos").cast("long").alias("chunk_idx"),
        F.col("col").cast("long").alias("start_char"),
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("n_chunk_chars"),
    )


def doc_chunks_sql(table: str = "documents", chunk_chars: int = 1024,
                   overlap: int = 128, text_col: str = "text") -> str:
    stride = chunk_chars - overlap
    chunk = f"substr(text, CAST(start_char + 1 AS INTEGER), {chunk_chars})"
    return f"""
WITH base AS (
  SELECT doc_id, coalesce({text_col}, '') AS text FROM {table}
),
ex AS (
  SELECT doc_id, text,
         CAST(u.i AS BIGINT) AS start_char,
         CAST(u.i // {stride} AS BIGINT) AS chunk_idx
  FROM base, unnest(range(0, greatest(length(text), 0), {stride})) u(i)
)
SELECT doc_id, chunk_idx, start_char,
       {chunk} AS chunk_text,
       CAST(length({chunk}) AS BIGINT) AS n_chunk_chars
FROM ex
"""
