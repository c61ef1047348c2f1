"""upsert-kafka-style keyed-changelog decode → engine CDC envelope.

Flink's ``upsert-kafka`` connector (public format/connector docs)
interprets a keyed topic as a changelog: a record with a non-null
value UPSERTS that key, a record with a NULL value (a Kafka
tombstone) DELETES it. No before-images, no op field — the key and
value-nullness carry all the semantics. This is the fourth changelog
spelling the engine accepts (after debezium-json, canal-json,
maxwell-json) and the one Kafka-compacted topics naturally produce.

Mapping onto the engine envelope (``op/ts/seq/before/after``,
sources/cdc_feed.py): null value → ``D`` with the KEY fields as the
before-image (all the tombstone knows); non-null → ``U`` (an upsert —
downstream LWW treats I/U identically, operators/upsert.py). The
Kafka record timestamp/offset columns become ts/seq: offsets are the
per-partition total order, exactly the role ``seq`` plays for
equal-timestamp events.

Scale: two ``from_json`` calls + column ops — JVM-side, map-only,
no shuffle; partition-ordering semantics are the topic's own.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def parse_upsert_kafka(
    df: DataFrame,
    key_col: str,
    value_col: str,
    key_schema: T.StructType,
    value_schema: T.StructType,
    ts: Column | None = None,
    seq: Column | None = None,
) -> DataFrame:
    """Decode (key JSON, value JSON-or-null) columns into engine
    envelope rows. ``value_schema`` must contain the key fields (the
    upsert-kafka contract: the value embeds the full row). ``ts`` /
    ``seq`` default to ``timestamp`` / ``offset`` columns when
    present (the Kafka source's metadata columns)."""
    ts = ts if ts is not None else F.col("timestamp")
    seq = seq if seq is not None else F.col("offset")
    key = F.from_json(F.col(key_col), key_schema)
    val = F.from_json(F.col(value_col), value_schema)
    is_del = F.col(value_col).isNull()
    # tombstones know only the key: before-image = key fields widened
    # to the value schema (non-key columns NULL)
    key_names = {f.name for f in key_schema.fields}
    before = F.when(
        is_del,
        F.struct(*[
            (
                key[f.name] if f.name in key_names else F.lit(None)
            ).cast(f.dataType).alias(f.name)
            for f in value_schema.fields
        ]),
    ).otherwise(F.lit(None).cast(value_schema))
    return df.select(
        F.when(is_del, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        ts.cast("timestamp").alias("ts"),
        seq.cast("long").alias("seq"),
        before.alias("before"),
        F.when(is_del, F.lit(None)).otherwise(val).alias("after"),
    )
