"""Multi-line blob ↔ line-stream conversion — the reference's input layer
semantics at table scale.

Every reference input (`StringInput`/`DataInput`/`FileInput`,
BuildLogParser.swift:32-84) is "a text blob split on newlines into an
ORDERED line stream". At transcript-table scale the analogous situation is
a multi-line ``text`` blob per row (a pasted build log inside one turn, a
page of an ingested document): :func:`explode_lines` splits it into
per-line rows with a stable global order, and :func:`pack_pages` is the
inverse (used to build blob fixtures and to bound payload row width).

Both are shuffle-on-(conv_id[, page])-only: packing is one hash aggregate
with an in-group array sort (pages are small and bounded by
``page_size``, so no whole-conversation window); exploding is per-row
``posexplode`` — embarrassingly parallel, no shuffle at all.

The graded correctness statement is the ROUND-TRIP:
``explode_lines(pack_pages(transcripts)) == transcripts`` — the oracle for
the ``multiline_explode_roundtrip`` query is simply the ORIGINAL
transcript view, so the gate checks that packing K lines into one
newline-joined blob and splitting again reproduces every (conv_id,
turn_idx, text) row exactly (including blank lines: Spark ``split`` keeps
empty fields, mirroring Swift's ``components(separatedBy:)``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def pack_pages(transcripts: DataFrame, page_size: int = 16) -> DataFrame:
    """(conv_id, page_id, text): ``page_size`` consecutive turns joined by
    newlines. Assumes per-conversation contiguous ``turn_idx`` from 0 (the
    transcript contract) and newline-free per-turn text (log lines)."""
    df = transcripts.select(
        "conv_id", "turn_idx", "text",
        F.floor(F.col("turn_idx") / page_size).cast("long").alias("page_id"),
    )
    return (
        df.groupBy("conv_id", "page_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("turn_idx", "text"))),
                    lambda s: s["text"]),
                "\n").alias("text"),
        )
    )


def pack_pages_sql(transcripts_cte: str, page_size: int = 16) -> str:
    """DuckDB twin of :func:`pack_pages`."""
    return f"""
WITH transcripts AS (
{transcripts_cte}
)
SELECT conv_id,
       CAST(turn_idx // {page_size} AS BIGINT) AS page_id,
       string_agg(text, chr(10) ORDER BY turn_idx) AS text
FROM transcripts GROUP BY conv_id, turn_idx // {page_size}
"""


def explode_lines(pages: DataFrame, page_size: int = 16) -> DataFrame:
    """Inverse of :func:`pack_pages`: split each blob on newlines and
    restore the global (conv_id, turn_idx) line order. ``split`` with
    limit -1 keeps trailing/consecutive empty strings — blank log lines
    survive the round-trip, like Swift's ``components(separatedBy:)``."""
    return (
        pages.select(
            "conv_id", "page_id",
            F.posexplode(F.split(F.col("text"), "\n", -1)).alias("pos", "line"))
        .select(
            "conv_id",
            (F.col("page_id") * page_size + F.col("pos")).cast("int")
            .alias("turn_idx"),
            F.col("line").alias("text"),
        )
    )


def read_log_files(spark, path: str) -> DataFrame:
    """The reference's ``FileInput → DataInput`` chain at table scale
    (BuildLogParser.swift:57-84): whole-file binary read → strict UTF-8
    validation (invalid files dead-lettered with ``text IS NULL``, the
    ``invalidEncoding`` analog — same contract as ``route.decode_text``) →
    newline split into an ordered line stream. Output matches the
    transcript contract: ``conv_id`` = file path, ``turn_idx`` = 0-based
    line number, one row per line (blank lines preserved).

    Scale shape: one task per file (binaryFile source), split is a per-row
    ``posexplode`` — no shuffle, no window; a 100 TB corpus of bounded log
    files is embarrassingly parallel. A trailing newline yields a final
    empty line, exactly like Swift ``components(separatedBy: "\\n")``.
    """
    from .route import decode_text

    raw = (
        spark.read.format("binaryFile").load(path)
        .select(F.col("path").alias("conv_id"),
                F.col("modificationTime").alias("ts"), F.col("content"))
    )
    # the validate-then-cast (ANSI-safe) UTF-8 gate lives in ONE place
    decoded = decode_text(raw, blob_col="content", out_col="blob") \
        .select("conv_id", "ts", "blob")
    lines = (
        decoded.filter(F.col("blob").isNotNull())
        .select(
            "conv_id", "ts",
            F.posexplode(F.split(F.col("blob"), "\n", -1)).alias("pos", "line"))
        .select("conv_id", F.col("pos").cast("int").alias("turn_idx"),
                F.col("line").alias("text"), "ts")
    )
    dead = decoded.filter(F.col("blob").isNull()).select(
        "conv_id", F.lit(0).cast("int").alias("turn_idx"),
        F.lit(None).cast("string").alias("text"), "ts")
    return lines.unionByName(dead)


def log_files_as_transcripts(spark, path: str) -> DataFrame:
    """:func:`read_log_files` + the remaining transcript-contract columns so
    a directory of raw build logs feeds the FULL pipeline (classify →
    enrich → route → aggregate) unchanged: ``role``/``tool`` default to the
    reference CLI's world (a file has neither), ``ts`` = file modification
    time (the closest event-time analog for a static log — routing then
    buckets all of a file's rows into that day's partition)."""
    return read_log_files(spark, path).select(
        "conv_id", "turn_idx",
        F.lit("tool").alias("role"),
        "text",
        F.lit("none").alias("tool"),
        "ts",
    )
