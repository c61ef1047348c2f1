"""Complex-event pattern matching — Flink SQL's MATCH_RECOGNIZE
reduced to its relational core: detect a fixed sequence of event
types occurring on STRICTLY CONSECUTIVE rows of a key's timeline
(`PATTERN (A B C)` with no quantifiers), optionally bounded by a
`WITHIN` duration, enumerating every match position (the
`AFTER MATCH SKIP TO NEXT ROW` option, which keeps the operator a
pure window expression — no iterative state).

Why this shape scales: strict contiguity over a per-key ordered
timeline is exactly ``lead(type, i)`` equality checks — one
key-partitioned window sort (the same shuffle sessionization pays),
then map-side comparisons. No joins, no state, no quantifier
backtracking. Greedy/reluctant quantifiers and SKIP PAST LAST ROW
need sequential per-key state — that flavor belongs to the
`applyInPandasWithState` family (cf. streaming/stateful.py) and is
deliberately out of scope here; the fixed-sequence core covers the
funnel/escalation/fraud probes MATCH_RECOGNIZE is typically used
for, with an exact cross-engine oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pattern_match(
    df: DataFrame,
    key_col: str,
    time_col: str,
    order_tiebreak: str,
    type_col: str,
    pattern: Sequence[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Rows where ``pattern`` (a list of event types) starts, one
    output row per match: (key, start_<tiebreak>, start/end second
    strings). ``within_seconds`` bounds last-minus-first event time,
    like MATCH_RECOGNIZE's WITHIN clause."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col), F.col(order_tiebreak)
    )
    cond: Column = F.col(type_col) == pattern[0]
    for i, t in enumerate(pattern[1:], start=1):
        cond = cond & (F.lead(type_col, i).over(w) == F.lit(t))
    end_ts = F.lead(time_col, len(pattern) - 1).over(w)
    if within_seconds is not None:
        # wall-time microsecond difference (TIMESTAMP_NTZ arithmetic,
        # session-zone independent — cf. timeseries._epoch_us_ntz):
        # a DST-straddling pair must not move the WITHIN boundary
        us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" CAST(`{time_col}` AS TIMESTAMP_NTZ))"
        )
        end_us = F.lead(us, len(pattern) - 1).over(w)
        cond = cond & (
            end_us - us <= F.lit(int(within_seconds) * 1_000_000).cast("long")
        )
    return (
        df.select(
            F.col(key_col),
            F.col(time_col),
            F.col(order_tiebreak),
            F.col(type_col),
        )
        .withColumn("_m", cond)
        .withColumn("_end", end_ts)
        .filter(F.col("_m"))
        .select(
            F.col(key_col),
            F.col(order_tiebreak).alias("start_" + order_tiebreak),
            F.date_format(time_col, "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
            F.date_format("_end", "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        )
    )
