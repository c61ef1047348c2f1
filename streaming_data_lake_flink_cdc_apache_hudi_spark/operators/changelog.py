"""Changelog normalization: CDC envelope → current table state.

The reference's Flink planner does this implicitly ("Flink will
retract the first message and replace it with the newer one",
CDC-Hudi-Notebook.zpln:1870 ¶42). Spark has no retract-stream
planner, so this is the engine's one genuinely custom operator
(SURVEY.md §4): reduce a stream of +I/-U/+U/-D envelope rows
(FIXTURES.md F6) to the live row set.

Semantics: for each key, take the event with the greatest (ts, seq);
if that event is a delete, the key is gone; else its ``after`` image
is the live row. Out-of-order delivery is handled by the total
(ts, seq) order — SURVEY.md §7 correctness trap #1.

Scale: one hash shuffle on the key (the minimum possible), fully
partition-parallel, no driver state. The same function serves batch
backfill and each foreachBatch micro-batch delta.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .upsert import latest_by_key


def current_state(
    changelog: DataFrame,
    key: str | Sequence[str],
) -> DataFrame:
    """Reduce envelope rows to the current live rows (one per key).

    ``key`` names column(s) of the ``after``/``before`` struct. The
    result schema is the source-row schema (envelope stripped).
    """
    keys = [key] if isinstance(key, str) else list(key)
    # key must come from after for I/U, before for D (after is null)
    keyed = changelog.select(
        "op",
        "ts",
        "seq",
        "before",
        "after",
        *[
            F.coalesce(F.col(f"after.{k}"), F.col(f"before.{k}")).alias(f"__k_{k}")
            for k in keys
        ],
    )
    latest = latest_by_key(keyed, [f"__k_{k}" for k in keys], ["ts", "seq"])
    live = latest.filter(F.col("op") != "D")
    return live.select("after.*")


def changelog_stats(changelog: DataFrame) -> DataFrame:
    """Operational view: event counts + bounds per op type (used by
    monitoring and tests; ≙ eyeballing the Zeppelin update sink S5)."""
    return (
        changelog.groupBy("op")
        .agg(
            F.count("*").alias("n_events"),
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
        )
        .orderBy("op")
    )
