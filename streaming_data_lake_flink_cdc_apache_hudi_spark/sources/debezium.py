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


# -- outbound: lake changes -> Debezium wire format -------------------------

_OUT_OP_MAP = {"insert": "c", "update": "u", "delete": "d"}


def to_debezium_json(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    ts_ms: Column | None = None,
    lsn: Column | None = None,
) -> DataFrame:
    """The OUTBOUND half of the Debezium bridge: rows in the shape
    ``UpsertLakeTable.changes()`` emits (key cols + after-image value
    cols + ``_change_type`` + ``_before`` struct) serialized as
    Debezium JSON change events — what a downstream Kafka topic /
    another CDC consumer expects, and exactly what
    :func:`parse_debezium_json` parses back (round-trip pinned in
    tests). One ``to_json`` per row: map-only, JVM-side.

    ``ts_ms`` / ``lsn`` override the event timestamp / log sequence
    expressions (defaults: current wall clock, per-partition
    monotonic ids — pass real columns when the caller tracks them).
    Returns a single-column (``value`` string) DataFrame.
    """
    ts_ms = (
        ts_ms
        if ts_ms is not None
        else (F.unix_timestamp(F.current_timestamp()) * 1000)
    )
    lsn = lsn if lsn is not None else F.monotonically_increasing_id()
    op = F.lit(None).cast("string")
    for eng, dbz in _OUT_OP_MAP.items():
        op = F.when(F.col("_change_type") == eng, F.lit(dbz)).otherwise(op)
    after_img = F.when(
        F.col("_change_type") == "delete", F.lit(None)
    ).otherwise(
        F.struct(*[F.col(c) for c in [*key_cols, *value_cols]])
    )
    before_img = F.when(F.col("_before").isNull(), F.lit(None)).otherwise(
        F.struct(
            *[F.col(k) for k in key_cols],
            *[F.col("_before")[c].alias(c) for c in value_cols],
        )
    )
    payload = F.struct(
        op.alias("op"),
        ts_ms.cast("long").alias("ts_ms"),
        before_img.alias("before"),
        after_img.alias("after"),
        F.struct(lsn.cast("long").alias("lsn")).alias("source"),
    )
    return changes.select(F.to_json(payload).alias("value"))
