"""Debezium AVRO change events in the Confluent wire format → engine
CDC envelope — Flink SQL's ``debezium-avro-confluent`` format
(flink.apache.org docs, Formats), the binary sibling of this repo's
``debezium-json`` parser (``sources/debezium.py``). The reference's
postgres-cdc connector emits Debezium records; production Kafka
deployments overwhelmingly serialize them with the Confluent schema
registry framing rather than JSON::

    byte 0        magic 0x00
    bytes 1-4     schema id (big-endian int, registry reference)
    bytes 5..     ONE raw Avro datum of the Debezium envelope record
                  {before, after, op, ts_ms, source{lsn}}

The decoder is this repo's stdlib Avro codec (``avro_codec`` —
written for the Iceberg metadata tree) reused at datum level; the
writer schema is supplied by the caller (fetched once from the
registry in a real deployment — the engine does not speak the
registry protocol, the schema is KB-scale configuration). Events
map onto the engine envelope exactly like the JSON flavor: ``c``/
``r`` → I, ``u`` → U, ``d`` → D, ``ts_ms`` → commit ts, WAL
``source.lsn`` → seq.

Scale: Arrow-batched ``mapInPandas`` — the per-record byte walk is
unavoidable Python (the frame + raw-datum format has no JVM parser
here), batched so decode runs where the Kafka payload partition
lives; map-only, no shuffle; malformed frames surface as NULL-op
rows (data, not exceptions, at 100 TB).
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_OP_MAP = {"c": "I", "r": "I", "u": "U", "d": "D"}


def debezium_avro_value_schema(row_fields: list[tuple[str, str]]) -> dict:
    """The Debezium envelope's Avro writer schema for a source row of
    ``(name, avro primitive type)`` fields — what a schema registry
    would serve for the value subject."""
    row = {
        "type": "record",
        "name": "Value",
        "fields": [
            {"name": n, "type": ["null", t], "default": None}
            for n, t in row_fields
        ],
    }
    return {
        "type": "record",
        "name": "Envelope",
        "fields": [
            {"name": "before", "type": ["null", row], "default": None},
            {"name": "after", "type": ["null", "Value"], "default": None},
            {"name": "op", "type": "string"},
            {"name": "ts_ms", "type": ["null", "long"], "default": None},
            {
                "name": "source",
                "type": {
                    "type": "record",
                    "name": "Source",
                    "fields": [
                        {
                            "name": "lsn",
                            "type": ["null", "long"],
                            "default": None,
                        }
                    ],
                },
            },
        ],
    }


def to_confluent_frame(schema: dict, value: dict, schema_id: int) -> bytes:
    """Encode ONE change event as a Confluent-framed Avro record —
    the fixture/test writer (a real pipeline's frames come off
    Kafka)."""
    import struct

    from .avro_codec import encode_datum

    return b"\x00" + struct.pack(">i", schema_id) + encode_datum(
        schema, value
    )


def parse_debezium_avro_confluent(
    df: DataFrame,
    value_col: str,
    row_schema: T.StructType,
    writer_schema: dict,
) -> DataFrame:
    """Parse a BINARY column of Confluent-framed Debezium Avro events
    into engine envelope rows ``(op, ts, seq, before, after,
    schema_id)``. Frames with a wrong magic byte or a truncated/
    undecodable body parse to NULL-op rows (caller's policy, matching
    the JSON parser). ``row_schema`` is the Spark shape of the
    before/after images; ``writer_schema`` the registry's Avro
    envelope schema."""
    out_schema = T.StructType(
        [
            T.StructField("op", T.StringType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("seq", T.LongType()),
            T.StructField("before", row_schema),
            T.StructField("after", row_schema),
            T.StructField("schema_id", T.IntegerType()),
        ]
    )
    row_names = [f.name for f in row_schema.fields]

    def fn(it: Iterator) -> Iterator:
        import pandas as pd

        from .avro_codec import AvroError, decode_datum

        def image(rec):
            if rec is None:
                return None
            return {n: rec.get(n) for n in row_names}

        for pdf in it:
            rows = []
            for raw in pdf[value_col]:
                b = bytes(raw) if raw is not None else b""
                out = {
                    "op": None,
                    "ts": None,
                    "seq": None,
                    "before": None,
                    "after": None,
                    "schema_id": None,
                }
                if len(b) >= 5 and b[0] == 0:
                    out["schema_id"] = int.from_bytes(
                        b[1:5], "big", signed=True
                    )
                    try:
                        v = decode_datum(writer_schema, b[5:])
                    except (AvroError, EOFError, ValueError):
                        v = None
                    if isinstance(v, dict):
                        out["op"] = _OP_MAP.get(v.get("op"))
                        ts_ms = v.get("ts_ms")
                        if ts_ms is not None:
                            out["ts"] = pd.Timestamp(
                                int(ts_ms), unit="ms"
                            )
                        src = v.get("source") or {}
                        out["seq"] = src.get("lsn")
                        out["before"] = image(v.get("before"))
                        out["after"] = image(v.get("after"))
                rows.append(out)
            yield pd.DataFrame(rows, columns=list(out_schema.names))

    return df.mapInPandas(fn, out_schema)
