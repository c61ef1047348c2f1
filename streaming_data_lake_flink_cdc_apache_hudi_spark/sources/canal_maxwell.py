"""Canal-JSON and Maxwell-JSON change-event parsers → engine CDC
envelope.

Flink ships three JSON CDC wire formats — ``debezium-json``,
``canal-json``, ``maxwell-json`` — and the reference's platform (a
Flink CDC pipeline, SURVEY.md §2.1) can be fed by any of them. The
Debezium envelope lives in ``sources/debezium.py``; this module adds
the other two, mapping both onto the same engine envelope
(``op/ts/seq/before/after``, sources/cdc_feed.py) so everything
downstream — feed replay, LWW upsert, IVM — is format-agnostic.

Wire shapes (public format docs: Alibaba Canal, Zendesk Maxwell, and
Flink's format pages):

- **Canal**: one message carries a BATCH of rows::

      {"id": 7, "type": "INSERT|UPDATE|DELETE",
       "es": 1589373515000, "ts": 1589373515477,
       "data": [{...row...}, ...], "old": [{changed cols only}, ...]}

  ``data`` holds after-images (for DELETE: the deleted rows);
  ``old`` aligns with ``data`` by position and holds ONLY the
  changed columns' before values (UPDATE). Canal serializes every
  value as a JSON string, so rows parse as ``map<string,string>``
  and cast per target column — the same per-column cast Flink's
  canal-json format applies.

- **Maxwell**: one message per row, typed values::

      {"type": "insert|update|delete", "ts": 1477053217,
       "xid": 23396, "data": {...row...}, "old": {changed cols}}

  ``ts`` is SECONDS; ``old`` again holds only changed columns'
  before values.

Envelope mapping: INSERT→I, UPDATE→U, DELETE→D; Canal ``es`` (source
event time, ms) / Maxwell ``ts`` (s) → commit ts; Canal batch ``id``
/ Maxwell ``xid`` → seq. Before-images are reconstructed by overlaying
``old`` on the after-image per column (unchanged columns keep their
after value — exactly the Flink format semantics); DELETE rows carry
their full before-image in ``data``.

Scale: pure ``from_json`` + (for Canal) one generator-free
``posexplode`` of an in-row array — JVM-side, map-only, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CANAL_OPS = {"INSERT": "I", "UPDATE": "U", "DELETE": "D"}
_MAXWELL_OPS = {"insert": "I", "update": "U", "delete": "D"}


def _op_expr(op_col, mapping):
    expr = F.lit(None).cast("string")
    for wire, eng in mapping.items():
        expr = F.when(op_col == wire, F.lit(eng)).otherwise(expr)
    return expr


def parse_canal_json(
    df: DataFrame, value_col: str, row_schema: T.StructType
) -> DataFrame:
    """Parse a column of Canal-JSON strings into engine envelope rows
    (one per element of each message's ``data`` batch). Values arrive
    as JSON strings (Canal's wire convention) and are cast to
    ``row_schema``'s column types; unknown ``type`` values parse to
    NULL op (malformed rows are data, not exceptions, at 100 TB)."""
    outer = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField("type", T.StringType(), True),
            T.StructField("es", T.LongType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField(
                "data",
                T.ArrayType(T.MapType(T.StringType(), T.StringType())),
                True,
            ),
            T.StructField(
                "old",
                T.ArrayType(T.MapType(T.StringType(), T.StringType())),
                True,
            ),
        ]
    )
    p = df.select(F.from_json(F.col(value_col), outer).alias("_m")).select(
        "_m.*", F.posexplode_outer("_m.data").alias("_i", "_row")
    )
    is_del = F.col("type") == "DELETE"
    old_i = F.col("old")[F.col("_i")]

    def cast(c, field):
        return c.cast(field.dataType).alias(field.name)

    after = F.when(is_del, F.lit(None)).otherwise(
        F.struct(
            *[cast(F.col("_row")[f.name], f) for f in row_schema.fields]
        )
    )
    # UPDATE: old holds only changed columns -> overlay on the after
    # image; DELETE: data IS the before image; INSERT: no before.
    # KEY PRESENCE (map_contains_key), not coalesce, decides the
    # overlay: an `old` entry with an explicit JSON null means the
    # column changed FROM NULL, which a coalesce would wrongly
    # replace with the after value
    def before_col(f):
        return cast(
            F.when(
                F.map_contains_key(old_i, f.name), old_i[f.name]
            ).otherwise(F.col("_row")[f.name]),
            f,
        )

    before = (
        F.when(is_del, F.struct(*[
            cast(F.col("_row")[f.name], f) for f in row_schema.fields
        ]))
        .when(
            F.col("type") == "UPDATE",
            F.struct(*[before_col(f) for f in row_schema.fields]),
        )
        .otherwise(F.lit(None))
    )
    return p.select(
        _op_expr(F.col("type"), _CANAL_OPS).alias("op"),
        F.timestamp_millis(F.col("es")).alias("ts"),
        F.col("id").alias("seq"),
        before.alias("before"),
        after.alias("after"),
    )


def to_canal_json(
    changes: DataFrame,
    key_cols: list[str],
    value_cols: list[str],
    es_ms=None,
    batch_id=None,
) -> DataFrame:
    """The OUTBOUND half of the Canal bridge (mirror of
    ``debezium.to_debezium_json``): rows in the shape
    ``UpsertLakeTable.changes()`` emits (key cols + after-image value
    cols + ``_change_type`` + ``_before`` struct) serialized as
    one-row-per-message Canal-JSON — values stringified per Canal's
    wire convention, UPDATE ``old`` carrying ONLY the changed
    columns. Exactly what :func:`parse_canal_json` parses back
    (round-trip pinned in tests). Map-only ``to_json``."""
    es_ms = (
        es_ms
        if es_ms is not None
        else (F.unix_timestamp(F.current_timestamp()) * 1000)
    )
    batch_id = (
        batch_id if batch_id is not None else F.monotonically_increasing_id()
    )
    cols = [*key_cols, *value_cols]
    ctype = F.col("_change_type")
    wire_type = (
        F.when(ctype == "insert", F.lit("INSERT"))
        .when(ctype == "update", F.lit("UPDATE"))
        .when(ctype == "delete", F.lit("DELETE"))
        .otherwise(F.lit(None).cast("string"))
    )
    # DELETE messages carry the deleted row in data[] — its value
    # columns come from the before image, keys from the key columns
    def _data_val(c):
        if c in key_cols:
            return F.col(c)
        return F.when(
            ctype == "delete", F.col("_before")[c]
        ).otherwise(F.col(c))

    row_map = F.map_from_arrays(
        F.array(*[F.lit(c) for c in cols]),
        F.array(*[_data_val(c).cast("string") for c in cols]),
    )
    # old: only columns whose before value differs from the after
    # image (Canal's changed-columns-only convention). Changed-ness
    # is decided on a separate flag, NOT on the before value being
    # non-null, so a NULL -> value update keeps its column in `old`
    # as an explicit JSON null (Canal carries nulls on the wire;
    # to_json always serializes null MAP values) — dropping it would
    # make the parse-side overlay reconstruct the before image with
    # the after value
    old_map = F.map_from_entries(
        F.transform(
            F.filter(
                F.array(*[
                    F.struct(
                        F.lit(c).alias("key"),
                        F.col("_before")[c].cast("string").alias("value"),
                        (~F.col("_before")[c].eqNullSafe(F.col(c))).alias(
                            "chg"
                        ),
                    )
                    for c in value_cols
                ]),
                lambda e: e["chg"],
            ),
            lambda e: F.struct(e["key"], e["value"]),
        )
    )
    payload = F.struct(
        batch_id.cast("long").alias("id"),
        wire_type.alias("type"),
        es_ms.cast("long").alias("es"),
        es_ms.cast("long").alias("ts"),
        F.array(row_map).alias("data"),
        F.when(
            (ctype == "update") & F.col("_before").isNotNull(),
            F.array(old_map),
        ).alias("old"),
    )
    return changes.select(F.to_json(payload).alias("value"))


def parse_maxwell_json(
    df: DataFrame, value_col: str, row_schema: T.StructType
) -> DataFrame:
    """Parse a column of Maxwell-JSON strings into engine envelope
    rows. Maxwell emits typed JSON values, so ``data``/``old`` parse
    directly against ``row_schema`` (``old`` columns all nullable —
    it carries only the changed subset)."""
    old_schema = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in row_schema.fields]
    )
    outer = T.StructType(
        [
            T.StructField("type", T.StringType(), True),
            T.StructField("ts", T.LongType(), True),
            T.StructField("xid", T.LongType(), True),
            T.StructField("data", row_schema, True),
            T.StructField("old", old_schema, True),
        ]
    )
    p = df.select(F.from_json(F.col(value_col), outer).alias("_m")).select(
        "_m.*"
    )
    is_del = F.col("type") == "delete"
    after = F.when(is_del, F.lit(None)).otherwise(F.col("data"))
    before = (
        F.when(is_del, F.col("data"))
        .when(
            F.col("type") == "update",
            F.struct(*[
                F.coalesce(
                    F.col("old")[f.name], F.col("data")[f.name]
                ).alias(f.name)
                for f in row_schema.fields
            ]),
        )
        .otherwise(F.lit(None).cast(old_schema))
    )
    return p.select(
        _op_expr(F.col("type"), _MAXWELL_OPS).alias("op"),
        F.timestamp_seconds(F.col("ts")).alias("ts"),
        F.col("xid").alias("seq"),
        before.alias("before"),
        after.alias("after"),
    )
