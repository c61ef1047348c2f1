"""Debezium JSON change-event parser → engine CDC envelope.

The reference's `postgres-cdc` Flink connector is Debezium underneath
(SURVEY.md §2.1 S1/S2; CDC-Hudi-Notebook.zpln:1060 ¶24 registers the
connector that emits Debezium change records). This module accepts the
wire format users actually have on a Kafka/landing topic — Debezium's
JSON envelope::

    {"op": "c|r|u|d", "ts_ms": 1700000000000,
     "before": {...}|null, "after": {...}|null,
     "source": {"lsn": 123, ...}}

optionally wrapped in ``{"schema": ..., "payload": {...}}`` — and maps
it onto the engine envelope (``op/ts/seq/before/after``,
sources/cdc_feed.py): ``c``/``r`` (create / snapshot read) → ``I``,
``u`` → ``U``, ``d`` → ``D``; ``ts_ms`` → commit timestamp; the WAL
``source.lsn`` → ``seq`` (total order for equal timestamps).

Scale: pure ``from_json`` + column ops — JVM-side, map-only, no
shuffle; drops straight into ``read_feed_stream``-shaped pipelines
(parse the Kafka `value`, then everything downstream is identical).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Debezium op → engine envelope op ('r' = snapshot-phase read, an insert)
_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def debezium_value_schema(row_schema: T.StructType) -> T.StructType:
    """The Debezium payload schema for a given source-row schema."""
    return T.StructType(
        [
            T.StructField("op", T.StringType(), True),
            T.StructField("ts_ms", T.LongType(), True),
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
            T.StructField(
                "source",
                T.StructType([T.StructField("lsn", T.LongType(), True)]),
                True,
            ),
        ]
    )


def _op_col(op: Column) -> Column:
    expr = F.lit(None).cast("string")
    for dbz, eng in _OP_MAP.items():
        expr = F.when(op == dbz, F.lit(eng)).otherwise(expr)
    return expr


def parse_debezium_json(
    df: DataFrame,
    value_col: str,
    row_schema: T.StructType,
    wrapped: bool = False,
) -> DataFrame:
    """Parse a column of Debezium JSON strings into engine envelope
    rows (``op/ts/seq/before/after``). ``wrapped=True`` unwraps the
    schemas.enable ``{"schema":..., "payload":{...}}`` framing.
    Unknown ops parse to NULL op (filter or fail downstream, caller's
    policy — malformed rows are data, not exceptions, at 100 TB)."""
    payload_schema = debezium_value_schema(row_schema)
    if wrapped:
        outer = T.StructType([T.StructField("payload", payload_schema, True)])
        payload = F.from_json(F.col(value_col), outer)["payload"]
    else:
        payload = F.from_json(F.col(value_col), payload_schema)
    p = df.withColumn("_p", payload)
    return p.select(
        _op_col(p["_p"]["op"]).alias("op"),
        F.timestamp_millis(p["_p"]["ts_ms"]).alias("ts"),
        p["_p"]["source"]["lsn"].alias("seq"),
        p["_p"]["before"].alias("before"),
        p["_p"]["after"].alias("after"),
    )
