"""Streaming observability: persist per-micro-batch progress as a
queryable table (≙ the Flink dashboard metrics the reference's KDA
app exposes — records/sec, batch durations, state size — which
operators of the original stack watch during ingest).

``attach_metrics`` registers a ``StreamingQueryListener`` that
appends one JSON line per micro-batch progress event to a local
metrics log (driver-side KBs — the same cost class as Spark's own
streaming progress reporting). ``read_metrics`` mounts the log as a
DataFrame with the operationally useful fields promoted to typed
columns, so lag/throughput dashboards are ordinary engine queries:

    m = read_metrics(spark, mdir)
    m.groupBy("query_name").agg(F.avg("rows_per_sec"), ...)

Scale notes: the listener runs on the driver and writes only
progress summaries (one small dict per batch, never data). The
metrics log is newline-JSON so it can also ship to any log pipeline.
"""

from __future__ import annotations

import json
import os
import threading

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQueryListener


class LakeMetricsListener(StreamingQueryListener):
    """Append every micro-batch progress event to ``<dir>/progress.jsonl``."""

    def __init__(self, metrics_dir: str):
        self.metrics_dir = metrics_dir
        os.makedirs(metrics_dir, exist_ok=True)
        self._path = os.path.join(metrics_dir, "progress.jsonl")
        self._lock = threading.Lock()

    # -- listener callbacks (driver thread) -----------------------------

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self._append({"event": "started", "id": str(event.id),
                      "name": event.name})

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        p["event"] = "progress"
        self._append(p)

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass  # idle ticks carry no batch information

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        self._append({"event": "terminated", "id": str(event.id)})

    def _append(self, obj: dict) -> None:
        with self._lock:
            with open(self._path, "a") as fh:
                fh.write(json.dumps(obj) + "\n")


def attach_metrics(
    spark: SparkSession, metrics_dir: str
) -> LakeMetricsListener:
    """Register (and return) a metrics listener; detach with
    ``spark.streams.removeListener(listener)``."""
    listener = LakeMetricsListener(metrics_dir)
    spark.streams.addListener(listener)
    return listener


def read_metrics(spark: SparkSession, metrics_dir: str) -> DataFrame:
    """The metrics log as a typed DataFrame: one row per micro-batch
    with (query_name, batch_id, timestamp, input_rows, rows_per_sec,
    batch_duration_ms, state_rows) — the throughput/lag dashboard
    surface."""
    raw = spark.read.text(os.path.join(metrics_dir, "progress.jsonl"))
    j = F.col("value")
    g = lambda p, t: F.get_json_object(j, p).cast(t)  # noqa: E731
    return (
        raw.filter(F.get_json_object(j, "$.event") == "progress")
        .select(
            F.get_json_object(j, "$.name").alias("query_name"),
            g("$.batchId", "long").alias("batch_id"),
            F.get_json_object(j, "$.timestamp").alias("timestamp"),
            g("$.numInputRows", "long").alias("input_rows"),
            g("$.processedRowsPerSecond", "double").alias("rows_per_sec"),
            g("$.durationMs.triggerExecution", "long").alias(
                "batch_duration_ms"
            ),
            g("$.stateOperators[0].numRowsTotal", "long").alias(
                "state_rows"
            ),
        )
    )
