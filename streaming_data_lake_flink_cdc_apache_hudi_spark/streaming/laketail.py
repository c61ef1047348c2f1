"""Streaming TAIL over EXTERNALLY-WRITTEN lake tables (new r13 —
VERDICT r12 ask #4): follow a Delta or Iceberg table's new commits as
a micro-batch changelog and feed the engine's keyed-upsert sink —
the lake-to-lake chained pipeline Flink gives via its Hudi/Delta
"streaming read" table mode, which the reference's batch query-back
(Athena) cannot express (SURVEY.md §2.1 S4 is batch; this is the
streaming twin).

Design — the engine's established foreachBatch pattern
(`streaming/pipeline.py` module docstring): each micro-batch
computes the NEW commit range of the source table, reads its
row-level changes with the existing incremental readers
(`read_delta_cdf` / `read_iceberg_changelog` — driver work is the
KB-scale metadata walk, rows flow through pruned parquet scans),
LWW-reduces them per key, and MERGEs into a downstream
``UpsertLakeTable``.

Exactly-once by (version range, commit id): every applied range
commits downstream as ``laketail:<fmt>:<from>:<to>`` and the NEXT
batch recovers its watermark from the downstream table's own commit
ids — so a replayed foreachBatch epoch (crash between sink write and
checkpoint) recomputes the same range and the sink's idempotent
commit-id check drops it (`UpsertLakeTable.write` returns 0 on a
seen id). No state lives in the Spark checkpoint beyond the tick
source's offsets; the watermark is as durable as the data it guards.

LWW within a batch: a multi-version range can touch one key several
times — the reduce keeps the row with the greatest
(commit position, change priority), where insert/update_postimage
outranks delete WITHIN one commit: a remove+add-shaped update (the
shape engines without explicit CDC actions emit) surfaces as
delete+insert at the same version and the insert IS the post-state.
Across versions the later commit always wins.

Scale: per batch, driver work is one metadata listing of the source
(KB) + the downstream commit-id scan (bounded by the active timeline
window, archived beyond that); the change rows never pass through
the driver. A quiet source costs one listing and no jobs.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.upsert import latest_by_key
from .upsert_sink import UpsertLakeTable

_DELTA_PREFIX = "laketail:delta"
_ICEBERG_PREFIX = "laketail:iceberg"
_HUDI_PREFIX = "laketail:hudi"


def delta_latest_version(path: str) -> int:
    """Newest commit version of a Delta table (driver-side listing of
    ``_delta_log`` — the same KB-scale metadata read every client
    does)."""
    log_dir = os.path.join(path, "_delta_log")
    if not os.path.isdir(log_dir):
        raise FileNotFoundError(f"not a Delta table (no _delta_log): {path}")
    versions = [
        int(f[:20])
        for f in os.listdir(log_dir)
        if f.endswith(".json") and f[:20].isdigit()
    ]
    if not versions:
        raise FileNotFoundError(f"Delta table at {path} has no commits")
    return max(versions)


def iceberg_current_snapshot(path: str) -> int | None:
    """Current snapshot id of an Iceberg table (None for an empty
    table with no snapshots yet)."""
    from ..sources.iceberg_interop import _current_metadata_path

    meta = json.load(open(_current_metadata_path(path)))
    sid = meta.get("current-snapshot-id")
    return None if sid in (None, -1) else int(sid)


def _tail_watermark(table: UpsertLakeTable, prefix: str) -> int | None:
    """High watermark (the ``to`` of the newest applied range) from
    the downstream table's own commit ids — replay-proof: derived
    from durable commits, not from streaming-checkpoint state."""
    hi: int | None = None
    for c in table.commits():
        cid = c.get("commit_id") or ""
        if not cid.startswith(prefix + ":"):
            continue
        try:
            hi = int(cid.rsplit(":", 1)[1])
        except ValueError:
            continue
    return hi


def _reduce_changes(
    changes: DataFrame,
    key: list[str],
    ordinal_col: str,
) -> DataFrame:
    """LWW-reduce a multi-commit change stream to one row per key
    with a ``_deleted`` flag (see module docstring for the
    within-commit insert-over-delete rule)."""
    ch = changes.filter(F.col("_change_type") != "update_preimage")
    ch = ch.withColumn(
        "_prio",
        F.when(F.col("_change_type") == "delete", F.lit(0)).otherwise(
            F.lit(1)
        ),
    )
    reduced = latest_by_key(ch, key, [ordinal_col, "_prio"])
    return reduced.withColumn(
        "_deleted", F.col("_change_type") == "delete"
    ).drop("_change_type", "_prio", ordinal_col)


def tail_delta_once(
    spark: SparkSession, src_path: str, table: UpsertLakeTable
) -> dict:
    """One bounded catch-up of the downstream table onto the Delta
    source: apply every commit past the watermark (the FIRST call
    replays from version 0 — snapshot and tail unified, S1's
    contract). Idempotent: a replayed range is dropped by the sink's
    commit-id check. Returns {"from", "to", "applied"}."""
    from ..sources.delta_interop import read_delta_cdf

    keys = [table.key] if isinstance(table.key, str) else list(table.key)
    last = _tail_watermark(table, _DELTA_PREFIX)
    cur = delta_latest_version(src_path)
    if last is not None and cur <= last:
        return {"from": None, "to": last, "applied": False}
    lo = 0 if last is None else last + 1
    changes = read_delta_cdf(spark, src_path, lo, cur)
    extra = [
        c
        for c in changes.columns
        if c.startswith("_") and c not in ("_change_type", "_commit_version")
    ]
    delta = _reduce_changes(
        changes.drop(*extra), keys, "_commit_version"
    )
    seq = table.write(
        delta,
        commit_id=f"{_DELTA_PREFIX}:{lo}:{cur}",
        delete_col="_deleted",
    )
    return {"from": lo, "to": cur, "applied": seq != 0}


def tail_iceberg_once(
    spark: SparkSession, src_path: str, table: UpsertLakeTable
) -> dict:
    """One bounded catch-up onto the Iceberg source: the first call
    lands the full current snapshot (there is no pre-table snapshot
    id to range from), later calls apply the changelog of
    (watermark, current]. Same exactly-once contract as the Delta
    tail."""
    from ..sources.iceberg_interop import (
        read_iceberg,
        read_iceberg_changelog,
    )

    keys = [table.key] if isinstance(table.key, str) else list(table.key)
    cur = iceberg_current_snapshot(src_path)
    if cur is None:
        return {"from": None, "to": None, "applied": False}
    last = _tail_watermark(table, _ICEBERG_PREFIX)
    if last == cur:
        return {"from": None, "to": last, "applied": False}
    if last is None:
        snap = read_iceberg(spark, src_path)
        seq = table.write(
            snap.withColumn("_deleted", F.lit(False)),
            commit_id=f"{_ICEBERG_PREFIX}:0:{cur}",
            delete_col="_deleted",
        )
        return {"from": 0, "to": cur, "applied": seq != 0}
    changes = read_iceberg_changelog(spark, src_path, last, cur)
    delta = _reduce_changes(changes, keys, "_change_ordinal")
    seq = table.write(
        delta,
        commit_id=f"{_ICEBERG_PREFIX}:{last}:{cur}",
        delete_col="_deleted",
    )
    return {"from": last, "to": cur, "applied": seq != 0}


def tail_hudi_once(
    spark: SparkSession, src_path: str, table: UpsertLakeTable
) -> dict:
    """One bounded catch-up onto a Hudi MoR source (r13 — completing
    the tail TRIPLE: the Flink 'streaming read' of a Hudi table that
    powers the reference's own chained pipelines): the first call
    lands the full real-time view, later calls apply
    ``read_hudi_changes`` over (watermark, newest instant]. Same
    exactly-once contract as the Delta/Iceberg tails."""
    from ..sources.hudi_interop import (
        _log_completed_instants,
        read_hudi,
        read_hudi_changes,
    )

    keys = [table.key] if isinstance(table.key, str) else list(table.key)
    cur = max(_log_completed_instants(src_path))
    last = _tail_watermark(table, _HUDI_PREFIX)
    if last is not None and int(cur) <= last:
        return {"from": None, "to": last, "applied": False}
    if last is None:
        snap = read_hudi(spark, src_path)
        snap = snap.drop(
            *[c for c in snap.columns if c.startswith("_hoodie_")]
        )
        seq = table.write(
            snap.withColumn("_deleted", F.lit(False)),
            commit_id=f"{_HUDI_PREFIX}:0:{int(cur)}",
            delete_col="_deleted",
        )
        return {"from": 0, "to": int(cur), "applied": seq != 0}
    changes = read_hudi_changes(spark, src_path, str(last))
    delta = _reduce_changes(
        changes.withColumn(
            "_ord", F.col("_commit_instant").cast("long")
        ).drop("_commit_instant"),
        keys,
        "_ord",
    )
    seq = table.write(
        delta,
        commit_id=f"{_HUDI_PREFIX}:{last}:{int(cur)}",
        delete_col="_deleted",
    )
    return {"from": last, "to": int(cur), "applied": seq != 0}


def _stream_tail(
    spark: SparkSession,
    tick_fn,
    checkpoint_dir: str,
    trigger: dict | None,
) -> StreamingQuery:
    """Drive a tail function from a rate tick — the micro-batch clock
    (≙ the reference's 1-min checkpoint cadence, zpln:89 ¶2). The
    tick rows are ignored; all state is the durable watermark."""
    ticks = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
    )

    def _tick(_batch: DataFrame, _epoch: int) -> None:
        tick_fn()

    writer = (
        ticks.writeStream.foreachBatch(_tick)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    trigger = trigger or {"processingTime": "1 seconds"}
    return writer.trigger(**trigger).start()


def stream_tail_delta(
    spark: SparkSession,
    src_path: str,
    table: UpsertLakeTable,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuously chain an externally-written Delta table into an
    engine table: each micro-batch applies the source's new commits
    (CDF row-level changes, LWW-reduced) exactly once."""
    return _stream_tail(
        spark,
        lambda: tail_delta_once(spark, src_path, table),
        checkpoint_dir,
        trigger,
    )


def stream_tail_iceberg(
    spark: SparkSession,
    src_path: str,
    table: UpsertLakeTable,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuously chain an externally-written Iceberg table into an
    engine table via the changelog scan — see :func:`tail_iceberg_once`."""
    return _stream_tail(
        spark,
        lambda: tail_iceberg_once(spark, src_path, table),
        checkpoint_dir,
        trigger,
    )


def stream_tail_hudi(
    spark: SparkSession,
    src_path: str,
    table: UpsertLakeTable,
    checkpoint_dir: str,
    trigger: dict | None = None,
) -> StreamingQuery:
    """Continuously chain an externally-written Hudi MoR table into an
    engine table via the incremental query — see :func:`tail_hudi_once`."""
    return _stream_tail(
        spark,
        lambda: tail_hudi_once(spark, src_path, table),
        checkpoint_dir,
        trigger,
    )
