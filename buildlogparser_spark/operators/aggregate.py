"""Aggregations — the reference's sink-side metadata re-expressed relationally.

Each function mirrors a reference aggregate (SURVEY.md §2.5, cited per
function) and is a plain hash aggregate / window that Catalyst executes as
partial+final with map-side combine. All computed columns are aliased to
stable names so the driver's Spark↔DuckDB value-hash compare lines up.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..rounding import portable_round, portable_round_sql
from pyspark.sql.window import Window


def severity_counts(diags: DataFrame) -> DataFrame:
    """total/error/warning/info/note counts (OutputFormatters.swift:117-128,
    319-325, 377-382) as one row."""
    return diags.agg(
        F.count("*").alias("total_count"),
        F.sum(F.when(F.col("severity") == "error", 1).otherwise(0)).alias("error_count"),
        F.sum(F.when(F.col("severity") == "warning", 1).otherwise(0)).alias("warning_count"),
        F.sum(F.when(F.col("severity") == "info", 1).otherwise(0)).alias("info_count"),
        F.sum(F.when(F.col("severity") == "note", 1).otherwise(0)).alias("note_count"),
    )


def category_counts(diags: DataFrame) -> DataFrame:
    """Per-category histogram (the reference test's oracle —
    BuildLogParserTests.swift:259-262)."""
    return diags.groupBy("category").agg(F.count("*").alias("n"))


def per_file_counts(diags: DataFrame) -> DataFrame:
    """Group by file with 'Unknown' for null (OutputFormatters.swift:346-359)."""
    return (
        diags.groupBy(F.coalesce(F.col("file"), F.lit("Unknown")).alias("file"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("severity") == "error", 1).otherwise(0)).alias("n_errors"),
            F.sum(F.when(F.col("severity") == "warning", 1).otherwise(0)).alias("n_warnings"),
        )
    )


def files_affected(diags: DataFrame) -> DataFrame:
    """Distinct-file count (OutputFormatters.swift:392-393)."""
    return diags.agg(
        F.count_distinct(F.coalesce(F.col("file"), F.lit("Unknown"))).alias("files_affected"))


def files_affected_approx(diags: DataFrame, rsd: float = 0.05) -> DataFrame:
    """HyperLogLog++ distinct-file count — the 10^12-row path (SURVEY §2.5:
    exact count_distinct shuffles every distinct value; HLL ships a fixed
    sketch per partition). Sketch internals are engine-specific, so this is
    rows-only at the gate; pytest bounds it against the exact count."""
    return diags.agg(
        F.approx_count_distinct(
            F.coalesce(F.col("file"), F.lit("Unknown")), rsd=rsd)
        .alias("files_affected_approx"))


def top_files(diags: DataFrame, k: int = 5) -> DataFrame:
    """Top-K most problematic files (OutputFormatters.swift:396-402).
    Executes as TakeOrderedAndProject — no global sort. Tie-break on file
    name for determinism."""
    return (
        per_file_counts(diags)
        .select("file", "n")
        .orderBy(F.desc("n"), F.asc("file"))
        .limit(k)
    )


def severity_pct(diags: DataFrame) -> DataFrame:
    """Severity % distribution (OutputFormatters.swift:404-424); percentage
    rounded to 2 decimals for stable cross-engine hashing."""
    counts = diags.groupBy("severity").agg(F.count("*").alias("n"))
    total = Window.partitionBy()
    return counts.select(
        "severity", "n",
        portable_round(F.col("n") * 100.0 / F.sum("n").over(total), 2).alias("pct"),
    )


def errors_per_tool(diags: DataFrame) -> DataFrame:
    """Graft aggregate (BASELINE.json north_star): errors per emitting tool."""
    return (
        diags.filter(F.col("severity") == "error")
        .groupBy("tool").agg(F.count("*").alias("n_errors"))
    )


def warnings_per_conversation(diags: DataFrame) -> DataFrame:
    """Graft aggregate: warnings per conversation."""
    return (
        diags.filter(F.col("severity") == "warning")
        .groupBy("conv_id").agg(F.count("*").alias("n_warnings"))
    )


def line_byte_counts(transcripts: DataFrame) -> DataFrame:
    """Validation totals: line count + UTF-8 bytes (+1 newline per line)
    (BuildLogParserCommand.swift:144-151)."""
    return transcripts.agg(
        F.count("*").alias("total_lines"),
        F.sum(F.octet_length("text") + 1).alias("total_bytes"),
    )


def step_durations(transcripts: DataFrame,
                   extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Per-turn step duration = ts delta to previous turn in the conversation
    (SURVEY.md §2.5 graft aggregates), in microseconds (exact integers —
    stable to hash across engines). ``extra_cols`` carries grouping columns
    (e.g. ``tool``) through for downstream roll-ups."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    # parquet timestamps load as TIMESTAMP_NTZ; session TZ is UTC so the
    # cast is value-preserving and unix_micros applies
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    return transcripts.select(
        "conv_id", "turn_idx", *extra_cols,
        (us - F.lag(us).over(w)).alias("step_duration_us"),
    )


def sessionize(transcripts: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessionization: a new session starts when a conversation is
    idle longer than ``gap_minutes`` (the classic telemetry session window).
    session_id = running count of gap-breaks per conversation — a single
    window over (conv_id, turn_idx), same cumsum formulation as segment
    assembly, so it shuffles once on the natural key. Spark's built-in
    ``session_window`` gives the same assignment for streaming; this
    formulation is used on the batch path because it is expressible
    identically in the DuckDB oracle (and salting/chunking applies to it
    the same way as to segment assembly if a conversation is hot)."""
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gap_us = gap_minutes * 60 * 1_000_000
    is_break = (us - F.lag(us).over(w) > gap_us).cast("int")
    return transcripts.select(
        "conv_id", "turn_idx", us.alias("ts_us"),
        F.sum(F.coalesce(is_break, F.lit(0)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("long").alias("session_id"),
    )


def session_stats(transcripts: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-session roll-up: turns, span, bounds (epoch seconds — integer
    math, stable to hash across engines)."""
    s = sessionize(transcripts, gap_minutes)
    return (
        s.groupBy("conv_id", "session_id")
        .agg(
            F.count("*").alias("n_turns"),
            (F.min("ts_us") / 1_000_000).cast("long").alias("start_epoch_s"),
            (F.max("ts_us") / 1_000_000).cast("long").alias("end_epoch_s"),
            ((F.max("ts_us") - F.min("ts_us")) / 1_000_000).cast("long")
            .alias("duration_s"),
        )
    )


def session_stats_sql(transcripts_cte: str, gap_minutes: int = 30) -> str:
    """DuckDB twin of session_stats over a transcripts CTE body."""
    gap_us = gap_minutes * 60 * 1_000_000
    # MATERIALIZED: see classify.classified_sql — derive the transcript
    # template CASE once, not once per window/aggregate reference
    return f"""
WITH transcripts AS MATERIALIZED (
{transcripts_cte}
), ticked AS (
  SELECT conv_id, turn_idx, epoch_us(ts) AS ts_us,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts))
                   OVER (PARTITION BY conv_id ORDER BY turn_idx) > {gap_us}
              THEN 1 ELSE 0 END AS is_break
  FROM transcripts
), sess AS (
  SELECT conv_id, turn_idx, ts_us,
         CAST(sum(is_break) OVER (PARTITION BY conv_id ORDER BY turn_idx
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
  FROM ticked
)
SELECT conv_id, session_id, count(*) AS n_turns,
       CAST(min(ts_us) // 1000000 AS BIGINT) AS start_epoch_s,
       CAST(max(ts_us) // 1000000 AS BIGINT) AS end_epoch_s,
       CAST((max(ts_us) - min(ts_us)) // 1000000 AS BIGINT) AS duration_s
FROM sess GROUP BY conv_id, session_id
"""


def duration_histogram(transcripts: DataFrame) -> DataFrame:
    """log2-bucketed histogram of step durations (floor(log2(us)) buckets —
    deterministic integer math, no float binning ambiguity)."""
    d = step_durations(transcripts).filter(F.col("step_duration_us") > 0)
    bucket = F.floor(F.log2(F.col("step_duration_us"))).cast("long").alias("bucket")
    return d.select(bucket).groupBy("bucket").agg(F.count("*").alias("n"))


def step_duration_percentiles(transcripts: DataFrame) -> DataFrame:
    """p50/p90/p99/max of positive step durations per tool — the latency
    roll-up beside the log2 histogram (SURVEY §2.5 graft aggregates).
    Exact interpolated percentiles: Spark ``percentile`` and DuckDB
    ``quantile_cont`` implement the same (n-1)·p linear interpolation, so
    the oracle matches value-for-value. At 10^12 rows swap ``percentile``
    → ``percentile_approx`` (t-digest, partial-aggregable, no per-group
    sort); the oracle keeps the exact form because approx sketches are
    engine-specific. Percentiles are rounded to 6 places in BOTH engines
    (repo float convention, severity_pct) so a ULP-level difference in
    either engine's interpolation expression cannot flip the value hash."""
    d = (
        step_durations(transcripts, extra_cols=("tool",))
        .filter(F.col("step_duration_us") > 0)
    )
    dur = F.col("step_duration_us")
    return d.groupBy("tool").agg(
        portable_round(F.percentile(dur, 0.5), 6).alias("p50_us"),
        portable_round(F.percentile(dur, 0.9), 6).alias("p90_us"),
        portable_round(F.percentile(dur, 0.99), 6).alias("p99_us"),
        F.max(dur).alias("max_us"),
        F.count("*").alias("n"),
    )


def step_duration_percentiles_sql(transcripts_cte: str) -> str:
    return f"""
WITH transcripts AS MATERIALIZED (
{transcripts_cte}
), durs AS (
  SELECT tool, epoch_us(ts) - lag(epoch_us(ts))
           OVER (PARTITION BY conv_id ORDER BY turn_idx) AS dur
  FROM transcripts
)
SELECT tool,
       {portable_round_sql(f'quantile_cont(dur, 0.5)', 6)} AS p50_us,
       {portable_round_sql(f'quantile_cont(dur, 0.9)', 6)} AS p90_us,
       {portable_round_sql(f'quantile_cont(dur, 0.99)', 6)} AS p99_us,
       max(dur) AS max_us, count(*) AS n
FROM durs WHERE dur > 0 GROUP BY tool
"""


def step_duration_percentiles_approx(transcripts: DataFrame,
                                     accuracy: int = 10_000) -> DataFrame:
    """The 10^12-row sibling of :func:`step_duration_percentiles`:
    ``percentile_approx`` (t-digest-style sketch — partial-aggregable, no
    per-group sort, bounded memory per group). Sketch internals are
    engine-specific → rows-only at the gate; accuracy vs the exact
    percentiles is bounded in pytest."""
    d = (
        step_durations(transcripts, extra_cols=("tool",))
        .filter(F.col("step_duration_us") > 0)
    )
    dur = F.col("step_duration_us")
    return d.groupBy("tool").agg(
        F.percentile_approx(dur, 0.5, accuracy).alias("p50_us"),
        F.percentile_approx(dur, 0.9, accuracy).alias("p90_us"),
        F.percentile_approx(dur, 0.99, accuracy).alias("p99_us"),
        F.max(dur).alias("max_us"),
        F.count("*").alias("n"),
    )


def message_templates(diags: DataFrame, k: int = 20) -> DataFrame:
    """Log-template mining (lite): collapse run-of-digits to ``N`` in the
    diagnostic message and count per (template, severity) — the classic
    first step of log clustering (Drain-style parsers refine this; the
    digit-mask alone already folds line/column/id variance). Top-k by
    count with name tie-break → TakeOrderedAndProject, no global sort."""
    tpl = F.regexp_replace(F.col("message"), r"\d+", "N").alias("template")
    return (
        diags.groupBy(tpl, "severity")
        .agg(F.count("*").alias("n"),
             F.countDistinct("conv_id").alias("n_convs"))
        .orderBy(F.desc("n"), F.asc("template"), F.asc("severity"))
        .limit(k)
    )


def message_templates_sql(diagnostics_select: str, k: int = 20) -> str:
    return f"""
SELECT regexp_replace(message, '\\d+', 'N', 'g') AS template, severity,
       count(*) AS n, count(DISTINCT conv_id) AS n_convs
FROM ({diagnostics_select}) d
GROUP BY 1, 2 ORDER BY n DESC, template ASC, severity ASC LIMIT {k}
"""


def error_burst_windows(diags: DataFrame, z: float = 2.0) -> DataFrame:
    """Per-tool hourly error counts flagged against the tool's own
    distribution (burst ⇔ n > mean + z·stddev_pop) — the standard
    telemetry anomaly roll-up. Two hash aggregates + a broadcast-size join
    on tool; hour buckets are integer epoch-hours (no float binning)."""
    hour = (F.unix_micros(F.col("ts").cast("timestamp"))
            / F.lit(3_600_000_000)).cast("long").alias("hour_bucket")
    per = (
        diags.filter(F.col("severity") == "error")
        .groupBy("tool", hour).agg(F.count("*").alias("n"))
    )
    # coalesce: population stddev of a 1-window tool is 0 in Spark but the
    # DuckDB twin coalesces explicitly — keep both engines at 0, never NULL
    stats = per.groupBy("tool").agg(
        F.avg("n").alias("mean_n"),
        F.coalesce(F.stddev_pop("n"), F.lit(0.0)).alias("sd_n"))
    # the burst flag is derived from the ALREADY-ROUNDED output columns —
    # is_burst = n > round6(mean) + z·round6(sd) — in both engines: the
    # rounded mean/sd are what the gate value-hashes (so they must agree
    # anyway), and float64 arithmetic on identical rounded doubles is
    # bit-deterministic, unlike rounding the combined threshold, where a
    # ULP-level difference in either engine's stddev accumulation landing
    # on a 6th-decimal boundary could still flip the boolean (ADVICE r03)
    mean_r = portable_round(F.col("mean_n"), 6)
    sd_r = portable_round(F.col("sd_n"), 6)
    return (
        per.join(F.broadcast(stats), "tool")
        .select(
            "tool", "hour_bucket", "n",
            mean_r.alias("mean_n"),
            sd_r.alias("sd_n"),
            (F.col("n") > mean_r + z * sd_r).alias("is_burst"),
        )
    )


def error_burst_windows_sql(diagnostics_select: str, z: float = 2.0) -> str:
    return f"""
WITH per AS (
  SELECT tool, CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS hour_bucket,
         count(*) AS n
  FROM ({diagnostics_select}) d WHERE severity = 'error'
  GROUP BY 1, 2
), stats AS (
  SELECT tool, avg(n) AS mean_n, coalesce(stddev_pop(n), 0) AS sd_n
  FROM per GROUP BY tool
)
SELECT p.tool, p.hour_bucket, p.n,
       {portable_round_sql('s.mean_n', 6)} AS mean_n, {portable_round_sql('s.sd_n', 6)} AS sd_n,
       p.n > {portable_round_sql('s.mean_n', 6)} + {z} * {portable_round_sql('s.sd_n', 6)} AS is_burst
FROM per p JOIN stats s ON p.tool = s.tool
"""


def time_to_first_error(transcripts: DataFrame, diags: DataFrame) -> DataFrame:
    """Seconds from conversation start to its first error (NULL-free: only
    conversations that errored emit a row) — session-quality diagnostics.
    Two hash aggregates + one join on conv_id; integer epoch math."""
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    start = transcripts.groupBy("conv_id").agg(F.min(us).alias("start_us"))
    first = (
        diags.filter(F.col("severity") == "error")
        .groupBy("conv_id").agg(F.min(us).alias("first_err_us"))
    )
    return start.join(first, "conv_id").select(
        "conv_id",
        ((F.col("first_err_us") - F.col("start_us")) / 1_000_000)
        .cast("long").alias("secs_to_first_error"),
    )


def time_to_first_error_sql(transcripts_cte: str, diagnostics_select: str) -> str:
    return f"""
WITH starts AS (
  SELECT conv_id, min(epoch_us(ts)) AS start_us
  FROM ({transcripts_cte}) t GROUP BY conv_id
), firsts AS (
  SELECT conv_id, min(epoch_us(ts)) AS first_err_us
  FROM ({diagnostics_select}) d WHERE severity = 'error' GROUP BY conv_id
)
SELECT s.conv_id,
       CAST((f.first_err_us - s.start_us) // 1000000 AS BIGINT)
         AS secs_to_first_error
FROM starts s JOIN firsts f ON s.conv_id = f.conv_id
"""


# ---------------------------------------------------------------------------
# agent-loop detection (transcript-native log analytics)
# ---------------------------------------------------------------------------


def inject_loops(transcripts: DataFrame) -> DataFrame:
    """Deterministically overwrite a consecutive turn range in every 5th
    conversation with an identical stuck-retry turn (run length 3-5 keyed
    on the conversation number), plus a length-2 run in every (5k+3)rd
    conversation that a min_run=3 detector must NOT flag. Test/bench helper
    only: the synthetic transcript rotates role/tool per turn, so a bare
    tool_call_loops run is vacuous parity (the inject_pii lesson,
    ADVICE r03 #4). Pure per-row CASE on (conv_id, turn_idx) — identical
    in the SQL twin, shuffle-free."""
    conv_no = F.substring(F.col("conv_id"), 6, 24).cast("long")
    run_len = (conv_no % 3) + 3          # 3, 4 or 5 identical turns
    in_loop = (
        (conv_no % 5 == 0)
        & (F.col("turn_idx") >= 6) & (F.col("turn_idx") < 6 + run_len))
    in_short = (
        (conv_no % 5 == 3)
        & (F.col("turn_idx") >= 20) & (F.col("turn_idx") < 22))
    stuck = in_loop | in_short
    return transcripts.select(
        "conv_id", "turn_idx",
        F.when(stuck, F.lit("assistant")).otherwise(F.col("role")).alias("role"),
        F.when(stuck, F.lit("retry: build step timed out, retrying"))
        .otherwise(F.col("text")).alias("text"),
        F.when(stuck, F.lit("xcodebuild")).otherwise(F.col("tool")).alias("tool"),
        "ts",
    )


def inject_loops_sql(transcripts_cte: str) -> str:
    return f"""
SELECT conv_id, turn_idx,
       CASE WHEN stuck THEN 'assistant' ELSE role END AS role,
       CASE WHEN stuck THEN 'retry: build step timed out, retrying'
            ELSE text END AS text,
       CASE WHEN stuck THEN 'xcodebuild' ELSE tool END AS tool,
       ts
FROM (
  SELECT *,
         (conv_no % 5 = 0 AND turn_idx >= 6
          AND turn_idx < 6 + (conv_no % 3) + 3)
         OR (conv_no % 5 = 3 AND turn_idx >= 20 AND turn_idx < 22) AS stuck
  FROM (SELECT *, CAST(substr(conv_id, 6, 24) AS BIGINT) AS conv_no
        FROM ({transcripts_cte}) t)
)
"""


def tool_call_loops(transcripts: DataFrame, min_run: int = 3) -> DataFrame:
    """(conv_id, role, tool, first_turn_idx, last_turn_idx, run_len):
    maximal runs of >= min_run consecutive turns whose (role, tool,
    md5(text)) fingerprint is identical — the classic stuck-agent /
    retry-storm signature in agent-transcript telemetry.

    Scale shape (10^12 turns): two row_number windows partitioned by
    conversation (the gaps-and-islands run id — robust to turn_idx gaps)
    + one hash-agg over (conv, key, run). Everything is
    conversation-partitioned: no corpus-global order, and a hot
    conversation is the same documented skew the assembly chunking
    machinery handles upstream. Fingerprint is md5 (portable), so the
    DuckDB twin is exact.

    Reference analog: none; public pattern (run-length encoding via
    gaps-and-islands) over the driver brief's transcript payload.
    """
    fp = F.md5(F.coalesce(F.col("text"), F.lit("")))
    seq_w = Window.partitionBy("conv_id").orderBy("turn_idx")
    key_w = Window.partitionBy("conv_id", "role", "tool", "fp").orderBy("turn_idx")
    runs = transcripts.select(
        "conv_id", "turn_idx", "role", "tool", fp.alias("fp"),
    ).withColumn(
        "grp", F.row_number().over(seq_w) - F.row_number().over(key_w))
    return (
        runs.groupBy("conv_id", "role", "tool", "fp", "grp")
        .agg(F.min("turn_idx").alias("first_turn_idx"),
             F.max("turn_idx").alias("last_turn_idx"),
             F.count("*").alias("run_len"))
        .filter(F.col("run_len") >= min_run)
        .select("conv_id", "role", "tool",
                "first_turn_idx", "last_turn_idx", "run_len")
    )


def tool_call_loops_sql(transcripts_cte: str, min_run: int = 3) -> str:
    return f"""
WITH r AS (
  SELECT conv_id, turn_idx, role, tool,
         md5(coalesce(text, '')) AS fp,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx)
         - row_number() OVER (PARTITION BY conv_id, role, tool,
                              md5(coalesce(text, ''))
                              ORDER BY turn_idx) AS grp
  FROM ({transcripts_cte}) t
)
SELECT conv_id, role, tool,
       min(turn_idx) AS first_turn_idx,
       max(turn_idx) AS last_turn_idx,
       count(*) AS run_len
FROM r
GROUP BY conv_id, role, tool, fp, grp
HAVING count(*) >= {min_run}
"""
