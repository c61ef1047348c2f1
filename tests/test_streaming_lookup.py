"""Processing-time lookup join (Flink LOOKUP JOIN parity): each
micro-batch enriches against the dim lake table's snapshot AS OF
batch time — dim updates between batches are visible to later
batches only; already-written rows keep the version they saw."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema,
    write_feed_events,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    read_feed_stream,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
    stream_lookup_join,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
    UpsertLakeTable,
)

ORDER = T.StructType(
    [
        T.StructField("order_id", T.LongType()),
        T.StructField("cust_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
    ]
)


def _env(spark, events):
    rows = [
        Row(
            op=op,
            ts=dt.datetime.fromisoformat(ts),
            seq=seq,
            before=None if b is None else Row(**b),
            after=None if a is None else Row(**a),
        )
        for (op, ts, seq, b, a) in events
    ]
    return spark.createDataFrame(rows, envelope_schema(ORDER))


def _order(oid, cust, amount):
    return {"order_id": oid, "cust_id": cust, "amount": amount}


@pytest.fixture
def dim(spark, tmp_path):
    t = UpsertLakeTable(spark, str(tmp_path / "cust_dim"), key="cust_id")
    t.write(
        spark.createDataFrame(
            [(1, "alice v1"), (2, "bob v1")], "cust_id long, cust_name string"
        ),
        commit_id="dim-1",
    )
    return t


def _run(spark, feed_dir, dim, sink, ckpt):
    stream = read_feed_stream(spark, feed_dir, ORDER, max_files_per_trigger=10)
    q = stream_lookup_join(
        stream, dim, "cust_id", sink, ckpt, trigger={"availableNow": True}
    )
    q.awaitTermination(120)


def test_lookup_join_sees_dim_as_of_batch_time(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    import os

    os.makedirs(feed_dir)
    dim_t = UpsertLakeTable(spark, str(tmp_path / "cust_dim"), key="cust_id")
    dim_t.write(
        spark.createDataFrame(
            [(1, "alice v1"), (2, "bob v1")], "cust_id long, cust_name string"
        ),
        commit_id="dim-1",
    )
    sink = UpsertLakeTable(spark, str(tmp_path / "enriched"), key="order_id")
    ckpt = str(tmp_path / "ckpt")

    write_feed_events(
        spark,
        feed_dir,
        _env(
            spark,
            [
                ("I", "2024-01-01T00:00:01", 1, None, _order(100, 1, 9.5)),
                ("I", "2024-01-01T00:00:02", 2, None, _order(101, 2, 3.0)),
            ],
        ),
    )
    _run(spark, feed_dir, dim_t, sink, ckpt)
    got = {r["order_id"]: r["cust_name"] for r in sink.snapshot().collect()}
    assert got == {100: "alice v1", 101: "bob v1"}

    # dim updates BETWEEN batches; a new order sees v2, old rows keep v1
    dim_t.write(
        spark.createDataFrame([(1, "alice v2")], "cust_id long, cust_name string"),
        commit_id="dim-2",
    )
    write_feed_events(
        spark,
        feed_dir,
        _env(
            spark,
            [("I", "2024-01-01T00:01:00", 3, None, _order(102, 1, 7.0))],
        ),
    )
    _run(spark, feed_dir, dim_t, sink, ckpt)
    got = {r["order_id"]: r["cust_name"] for r in sink.snapshot().collect()}
    assert got == {100: "alice v1", 101: "bob v1", 102: "alice v2"}


def test_lookup_join_left_keeps_unmatched_and_deletes(spark, tmp_path):
    feed_dir = str(tmp_path / "feed")
    import os

    os.makedirs(feed_dir)
    dim_t = UpsertLakeTable(spark, str(tmp_path / "cust_dim"), key="cust_id")
    dim_t.write(
        spark.createDataFrame([(1, "alice")], "cust_id long, cust_name string"),
        commit_id="dim-1",
    )
    sink = UpsertLakeTable(spark, str(tmp_path / "enriched"), key="order_id")
    ckpt = str(tmp_path / "ckpt")

    write_feed_events(
        spark,
        feed_dir,
        _env(
            spark,
            [
                ("I", "2024-01-01T00:00:01", 1, None, _order(200, 1, 1.0)),
                ("I", "2024-01-01T00:00:02", 2, None, _order(201, 99, 2.0)),
            ],
        ),
    )
    _run(spark, feed_dir, dim_t, sink, ckpt)
    got = {r["order_id"]: r["cust_name"] for r in sink.snapshot().collect()}
    assert got == {200: "alice", 201: None}  # left join keeps orphans

    # a source DELETE flows through as a tombstone on the sink key
    write_feed_events(
        spark,
        feed_dir,
        _env(
            spark,
            [("D", "2024-01-01T00:02:00", 3, _order(200, 1, 1.0), None)],
        ),
    )
    _run(spark, feed_dir, dim_t, sink, ckpt)
    assert {r["order_id"] for r in sink.snapshot().collect()} == {201}


def test_temporal_join_batch_semantics(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.joins import (
        temporal_join,
    )

    versions = spark.createDataFrame(
        [(1, 10, "v1"), (1, 20, "v2"), (2, 15, "w1")],
        "k long, vts long, name string",
    )
    events = spark.createDataFrame(
        [(1, 5, 100), (1, 10, 101), (1, 25, 102), (2, 14, 103)],
        "k long, ets long, eid long",
    )
    out = temporal_join(
        events, versions, ["k"], "ets", "vts", ["name"], how="left"
    )
    got = {r["eid"]: r["name"] for r in out.collect()}
    # event at 5 predates all versions; at 10 the version EFFECTIVE AT
    # the same instant is visible; at 25 the latest (v2) prevails
    assert got == {100: None, 101: "v1", 102: "v2", 103: None}
    inner = temporal_join(
        events, versions, ["k"], "ets", "vts", ["name"], how="inner"
    )
    assert {r["eid"] for r in inner.collect()} == {101, 102}


def test_stream_temporal_enrich_uses_event_time(spark, tmp_path):
    """The discriminating case vs the processing-time lookup join: a
    LATE event (older event time than the current dim version) must
    pick the OLD version even though the new one is current."""
    import os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
        stream_temporal_enrich,
    )

    ORDER_T = T.StructType(
        [
            T.StructField("order_id", T.LongType()),
            T.StructField("cust_id", T.LongType()),
            T.StructField("evt", T.LongType()),  # the order's event time
        ]
    )

    def env_t(events):
        rows = [
            Row(
                op=op,
                ts=dt.datetime.fromisoformat(ts),
                seq=seq,
                before=None,
                after=Row(order_id=oid, cust_id=c, evt=evt),
            )
            for (op, ts, seq, oid, c, evt) in events
        ]
        return spark.createDataFrame(rows, envelope_schema(ORDER_T))

    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    versions = UpsertLakeTable(
        spark, str(tmp_path / "versions"), key=["cust_id", "vts"]
    )
    versions.write(
        spark.createDataFrame(
            [(1, 10, "tier-bronze"), (1, 100, "tier-gold")],
            "cust_id long, vts long, tier string",
        ),
        commit_id="v1",
    )
    sink = UpsertLakeTable(spark, str(tmp_path / "enriched"), key="order_id")

    # order 7 is LATE (event time 50 < gold's 100); order 8 is fresh
    write_feed_events(
        spark,
        feed,
        env_t(
            [
                ("I", "2024-01-01T00:00:01", 1, 7, 1, 50),
                ("I", "2024-01-01T00:00:02", 2, 8, 1, 120),
            ]
        ),
    )
    stream = read_feed_stream(spark, feed, ORDER_T, max_files_per_trigger=10)
    q = stream_temporal_enrich(
        stream,
        versions,
        ["cust_id"],
        event_ts="evt",
        version_ts="vts",
        value_cols=["tier"],
        sink=sink,
        checkpoint_dir=str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    got = {r["order_id"]: r["tier"] for r in sink.snapshot().collect()}
    assert got == {7: "tier-bronze", 8: "tier-gold"}
