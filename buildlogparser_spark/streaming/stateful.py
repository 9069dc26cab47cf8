"""Custom stateful streaming operator: the consumeLine state machine over an
unbounded transcript stream via ``applyInPandasWithState``.

This is the true streaming twin of the reference's async parse path
(``parse(input: AsyncDiagnosticInput)`` — BuildLogParser.swift:314-323): a
diagnostic can span micro-batches, so the in-flight ``current`` diagnostic
(the parser's single piece of state — BuildLogParser.swift:284) lives in
Spark's per-group state store, keyed by ``conv_id``, surviving across
batches AND across query restarts (state-store checkpointing).

Contract: within one conversation, turns must arrive batch-over-batch in
``turn_idx`` order (each batch's rows are sorted internally; cross-batch
reordering would need a watermark-buffered sort upstream — out of scope,
matching the reference's strictly-ordered line stream).

End-of-conversation: the reference flushes the trailing in-flight
diagnostic on an EXPLICIT ``finish()`` call (BuildLogParser.swift:366-373),
not on a timer — so the streaming twin does the same: a sentinel row whose
``text`` equals ``eof_marker`` flushes and clears the conversation's state.
An optional ProcessingTimeTimeout flush (``idle_timeout_ms``) exists for
continuous deployments where producers may die without an EOF; note that
under ``Trigger.AvailableNow`` Spark fires processing-time timeouts in the
run's final batch regardless of the configured duration (observed on Spark
4.1), which would flush mid-block state between runs — with an EOF-marker
protocol leave it off.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import IntegerType, StringType, StructField, StructType

from ..operators.assemble import STATEFUL_SCHEMA
from ..rules.table import Diagnostic

#: default end-of-conversation sentinel (ASCII EOT) — never a real log line
DEFAULT_EOF_MARKER = "\x04"

# state: one row — the serialized in-flight diagnostic (or null) + its turn
STATE_SCHEMA = StructType([
    StructField("current_json", StringType()),
    StructField("current_turn", IntegerType()),
])

_COLS = [f.name for f in STATEFUL_SCHEMA.fields]


def _diag_to_row(conv: str, turn: int | None, d: Diagnostic) -> dict:
    return {
        "conv_id": conv, "start_turn_idx": turn,
        "file": d.file, "line": d.line, "column": d.column,
        "severity": d.severity, "message": d.message,
        "related_messages": d.related_messages, "source": d.source,
        "category": d.category, "raw": d.raw, "build_target": d.build_target,
    }


def stream_parse_stateful(transcripts: DataFrame, rules_factory,
                          eof_marker: str = DEFAULT_EOF_MARKER,
                          idle_timeout_ms: int | None = None) -> DataFrame:
    """transcripts must be a STREAMING DataFrame with at least
    (conv_id, turn_idx, text). Returns the diagnostics stream
    (STATEFUL_SCHEMA)."""
    from ..shipping import ensure_shipped

    ensure_shipped(transcripts.sparkSession)

    def fn(key: Tuple[Any, ...], pdfs: Iterator[pd.DataFrame],
           state: GroupState) -> Iterator[pd.DataFrame]:
        from buildlogparser_spark.oracle import ParserOracle
        from buildlogparser_spark.rules.table import Diagnostic as D

        conv = key[0]
        if state.hasTimedOut:
            # idle-producer flush (only reachable with idle_timeout_ms set)
            (cur_json, cur_turn) = state.get if state.exists else (None, None)
            state.remove()
            if cur_json:
                d = D(**json.loads(cur_json))
                yield pd.DataFrame([_diag_to_row(conv, cur_turn, d)],
                                   columns=_COLS)
            return

        oracle = ParserOracle(rules_factory())
        if state.exists:
            (cur_json, cur_turn) = state.get
            if cur_json:
                oracle.current = D(**json.loads(cur_json))
                oracle.current_line_no = cur_turn

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("turn_idx")
        finished = False
        for turn, text in zip(rows["turn_idx"], rows["text"]):
            if text == eof_marker:
                oracle.finish()   # flush trailing in-flight (finish())
                finished = True
            else:
                oracle.consume_line(text, int(turn))

        out = [_diag_to_row(conv, t, d)
               for t, d in zip(oracle.out_line_nos, oracle.out)]
        if finished and oracle.current is None:
            state.remove()
        else:
            state.update((
                json.dumps(oracle.current.__dict__) if oracle.current else None,
                oracle.current_line_no))
            if idle_timeout_ms is not None:
                state.setTimeoutDuration(idle_timeout_ms)
        yield pd.DataFrame(out, columns=_COLS)

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if idle_timeout_ms is not None
                    else GroupStateTimeout.NoTimeout)
    return (
        transcripts.select("conv_id", "turn_idx", "text")
        .groupBy("conv_id")
        .applyInPandasWithState(fn, STATEFUL_SCHEMA, STATE_SCHEMA, "append",
                                timeout_conf)
    )
