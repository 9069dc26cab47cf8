"""Per-unit checkpoint/resume manifest (SURVEY.md §4 custom-work item 3;
BASELINE.json: "resumable from per-partition checkpoints with lineage +
row-count metrics emitted per task").

The resumable unit is one idempotent sink write (overwrite mode): a killed
job restarts, consults the manifest, skips completed units and re-runs only
the rest. The manifest is a JSON-lines file updated with atomic
write-then-rename from the driver — the same pattern works against object
storage via a _manifest prefix (one object per unit) on a real cluster.

Row counts per unit come from ``observe`` (computed inside the write job,
no second pass).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, functions as F

from .metrics import Observation
from .operators.route import DEFAULT_N_SALT, with_sink_partitions


class Manifest:
    """Driver-side JSON-lines manifest of completed (stage, unit) pairs."""

    def __init__(self, root: str) -> None:
        self.path = os.path.join(root, "_manifest.jsonl")
        self._done: dict[tuple[str, str], dict] = {}
        if os.path.exists(self.path):
            with open(self.path) as f:
                for line in f:
                    if line.strip():
                        rec = json.loads(line)
                        self._done[(rec["stage"], rec["unit"])] = rec

    def is_done(self, stage: str, unit: str) -> bool:
        return (stage, unit) in self._done

    def mark_done(self, stage: str, unit: str, **meta) -> None:
        rec = {"stage": stage, "unit": unit, "ts": time.time(), **meta}
        self._done[(stage, unit)] = rec
        os.makedirs(os.path.dirname(self.path), exist_ok=True)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            for r in self._done.values():
                f.write(json.dumps(r) + "\n")
        os.replace(tmp, self.path)

    def records(self) -> list[dict]:
        return list(self._done.values())


def route_writes_resumable(
    diags: DataFrame, root: str, n_salt: int = DEFAULT_N_SALT,
    fmt: str = "parquet", ts_granularity: str = "day",
) -> dict[str, dict]:
    """The fan-out of route_writes, resumable per sink.

    Returns {sink_name: {"path", "rows", "secs", "skipped"}}. A sink already
    in the manifest is skipped (its prior record is returned); each write
    observes its own row count — per-unit lineage lands in the manifest.
    """
    manifest = Manifest(root)
    diags = (
        with_sink_partitions(diags, n_salt, ts_granularity)
        .repartition("ts_bucket", "conv_bucket")
        .cache()
    )
    results: dict[str, dict] = {}
    try:
        targets: list[tuple[str, DataFrame]] = [("diagnostics", diags)]
        for sev in ("error", "warning", "info", "note"):
            targets.append((f"severity={sev}", diags.filter(F.col("severity") == sev)))
        for cls in ("error", "warning", "note", "tool-invocation", "step-boundary"):
            targets.append((f"class={cls}", diags.filter(F.col("diag_class") == cls)))
        for name, df in targets:
            path = os.path.join(root, name)
            if manifest.is_done("route", name):
                rec = dict(next(r for r in manifest.records()
                                if r["stage"] == "route" and r["unit"] == name))
                rec.update(path=path, skipped=True)
                results[name] = rec
                continue
            t0 = time.time()
            if Observation is not None:
                obs = Observation(f"route:{name}")
                df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            (df.write.mode("overwrite").format(fmt)
               .partitionBy("ts_bucket", "conv_bucket").save(path))
            rows = int(obs.get["rows"]) if Observation is not None else -1
            secs = round(time.time() - t0, 3)
            manifest.mark_done("route", name, rows=rows, secs=secs)
            results[name] = {"path": path, "rows": rows, "secs": secs,
                             "skipped": False}
    finally:
        diags.unpersist()
    return results
