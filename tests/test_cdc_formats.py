"""Canal-JSON / Maxwell-JSON wire-format parsers
(sources/canal_maxwell.py): batch explode + old[] positional overlay,
typed Maxwell overlay, unknown ops parsing to NULL op."""

from __future__ import annotations

from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.canal_maxwell import (
    parse_canal_json,
    parse_maxwell_json,
)

_ROW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("qty", T.IntegerType()),
    ]
)


def test_canal_batch_update_aligns_old_by_position(spark):
    raw = (
        '{"id":5,"type":"UPDATE","es":1686830400000,"ts":1,'
        '"data":[{"id":"1","name":"a2","qty":"10"},'
        '{"id":"2","name":"b2","qty":"20"}],'
        '"old":[{"name":"a1"},{"qty":"19"}]}'
    )
    df = spark.createDataFrame([(raw,)], "value string")
    got = sorted(
        (
            r["op"], r["seq"],
            (r["before"]["id"], r["before"]["name"], r["before"]["qty"]),
            (r["after"]["id"], r["after"]["name"], r["after"]["qty"]),
        )
        for r in parse_canal_json(df, "value", _ROW).collect()
    )
    # row 0 changed name (before name a1, qty keeps after value);
    # row 1 changed qty (before qty 19, name keeps after value)
    assert got == [
        ("U", 5, (1, "a1", 10), (1, "a2", 10)),
        ("U", 5, (2, "b2", 19), (2, "b2", 20)),
    ]


def test_canal_delete_and_unknown_type(spark):
    rows = [
        '{"id":6,"type":"DELETE","es":1686830400000,"ts":1,'
        '"data":[{"id":"3","name":"c","qty":"7"}],"old":null}',
        '{"id":7,"type":"TRUNCATE","es":1686830400000,"ts":1,'
        '"data":[{"id":"9","name":"x","qty":"1"}],"old":null}',
    ]
    df = spark.createDataFrame([(s,) for s in rows], "value string")
    out = {
        r["seq"]: r for r in parse_canal_json(df, "value", _ROW).collect()
    }
    d = out[6]
    assert d["op"] == "D" and d["after"] is None
    assert (d["before"]["id"], d["before"]["qty"]) == (3, 7)
    assert out[7]["op"] is None  # unknown type = data, not exception


def test_maxwell_update_overlay_and_delete(spark):
    rows = [
        '{"type":"update","ts":1686830401,"xid":11,'
        '"data":{"id":1,"name":"a2","qty":10},"old":{"qty":3}}',
        '{"type":"delete","ts":1686830402,"xid":12,'
        '"data":{"id":2,"name":"b","qty":5}}',
        '{"type":"bootstrap-start","ts":1686830403,"xid":13,"data":{}}',
    ]
    df = spark.createDataFrame([(s,) for s in rows], "value string")
    out = {
        r["seq"]: r
        for r in parse_maxwell_json(df, "value", _ROW).collect()
    }
    u = out[11]
    assert u["op"] == "U"
    assert (u["before"]["id"], u["before"]["name"], u["before"]["qty"]) == (
        1, "a2", 3,
    )
    assert u["after"]["qty"] == 10
    d = out[12]
    assert d["op"] == "D" and d["after"] is None and d["before"]["id"] == 2
    assert out[13]["op"] is None
    # ts is seconds precision
    assert str(u["ts"]).startswith("2023-06-15 12:00:01")


def test_upsert_kafka_tombstone_and_upsert(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.upsert_kafka import (
        parse_upsert_kafka,
    )

    key_s = T.StructType([T.StructField("id", T.LongType())])
    rows = [
        ('{"id":1}', '{"id":1,"name":"a","qty":5}', 1686830400000, 10),
        ('{"id":1}', None, 1686830401000, 11),
    ]
    df = spark.createDataFrame(
        rows, "key string, value string, ts_ms long, offset long"
    )
    from pyspark.sql import functions as F

    out = {
        r["seq"]: r
        for r in parse_upsert_kafka(
            df, "key", "value", key_s, _ROW,
            ts=F.timestamp_millis(F.col("ts_ms")), seq=F.col("offset"),
        ).collect()
    }
    u = out[10]
    assert u["op"] == "U" and u["before"] is None
    assert (u["after"]["id"], u["after"]["name"], u["after"]["qty"]) == (
        1, "a", 5,
    )
    d = out[11]
    assert d["op"] == "D" and d["after"] is None
    # tombstone before-image: key fields present, value columns NULL
    assert (d["before"]["id"], d["before"]["name"], d["before"]["qty"]) == (
        1, None, None,
    )


def test_canal_round_trip_null_transitions(spark):
    """ADVICE r6: an UPDATE changing a column FROM NULL must keep
    that column in `old` as an explicit JSON null, and the parser
    must overlay on key PRESENCE, reconstructing before = NULL — a
    coalesce overlay would silently substitute the after value.
    Both null->value and value->null transitions round-trip."""
    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.canal_maxwell import (
        to_canal_json,
    )

    changes = spark.createDataFrame(
        [
            # name: NULL -> 'n1' ; qty: 5 -> NULL
            (1, "n1", None, "update", (1, None, 5)),
            (2, "same", 7, "update", (2, "same", 3)),
        ],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField("name", T.StringType()),
                T.StructField("qty", T.IntegerType()),
                T.StructField("_change_type", T.StringType()),
                T.StructField("_before", _ROW),
            ]
        ),
    )
    wire = to_canal_json(
        changes, key_cols=["id"], value_cols=["name", "qty"],
        es_ms=F.lit(1000), batch_id=F.lit(1),
    )
    raw = {r.value for r in wire.collect()}
    # the null->value transition is on the wire as an explicit null
    assert any('"old":[{"name":null,"qty":"5"}]' in v for v in raw), raw
    parsed = parse_canal_json(wire, "value", _ROW).collect()
    by_id = {r.after.id: r for r in parsed}
    assert by_id[1].before.name is None  # changed FROM NULL
    assert by_id[1].before.qty == 5
    assert by_id[1].after.name == "n1" and by_id[1].after.qty is None
    assert by_id[2].before.qty == 3 and by_id[2].before.name == "same"


def test_debezium_avro_confluent_parse(spark):
    """r12: Confluent-framed Debezium AVRO events (Flink's
    debezium-avro-confluent format) parse to the engine envelope —
    op mapping, ts_ms->ts, lsn->seq, before/after images, schema id
    surfaced; bad magic / truncated bodies become NULL-op rows."""
    from pyspark.sql import types as T

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.debezium_avro import (
        debezium_avro_value_schema,
        parse_debezium_avro_confluent,
        to_confluent_frame,
    )

    schema = debezium_avro_value_schema(
        [("uuid", "string"), ("name", "string"), ("age", "int")]
    )
    row_schema = T.StructType(
        [
            T.StructField("uuid", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.IntegerType()),
        ]
    )
    evts = [
        {"op": "c", "ts_ms": 1686830400000, "before": None,
         "after": {"uuid": "id1", "name": "Danny", "age": 23},
         "source": {"lsn": 101}},
        {"op": "u", "ts_ms": 1686830401000,
         "before": {"uuid": "id1", "name": "Danny", "age": 23},
         "after": {"uuid": "id1", "name": "Dan", "age": 24},
         "source": {"lsn": 102}},
        {"op": "d", "ts_ms": 1686830402000,
         "before": {"uuid": "id2", "name": "Stephen", "age": 33},
         "after": None, "source": {"lsn": 103}},
        {"op": "r", "ts_ms": 1686830403000, "before": None,
         "after": {"uuid": "id3", "name": "Julian", "age": 53},
         "source": {"lsn": 104}},
    ]
    frames = [
        (to_confluent_frame(schema, e, 42),) for e in evts
    ] + [(b"\x01junk",), (b"\x00\x00\x00\x00\x2a\xff",)]
    df = spark.createDataFrame(frames, "value binary")
    got = parse_debezium_avro_confluent(
        df, "value", row_schema, schema
    ).collect()
    good = sorted(
        (r.op, r.seq, r.schema_id,
         r.after.name if r.after else None,
         r.before.name if r.before else None)
        for r in got if r.op is not None
    )
    assert good == [
        ("D", 103, 42, None, "Stephen"),
        ("I", 101, 42, "Danny", None),
        ("I", 104, 42, "Julian", None),
        ("U", 102, 42, "Dan", "Danny"),
    ]
    bad = [r for r in got if r.op is None]
    assert len(bad) == 2
    # the truncated-body frame still surfaces its schema id
    assert sorted(
        (r.schema_id is not None) for r in bad
    ) == [False, True]
    # timestamps are exact epoch-millis instants
    ts = {r.seq: r.ts for r in got if r.op is not None}
    import datetime as _dt

    assert ts[101].astimezone(_dt.timezone.utc).timestamp() == 1686830400.0
