"""Spark 4 Python DataSource for the CDC feed: format("cdcfeed")
batch + streaming reads, snapshot-then-tail offsets, parity with the
read_feed_* helpers."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema,
    read_feed_batch,
    write_feed_events,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.datasource import (
    register_cdcfeed_source,
)

ROW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("v", T.DoubleType()),
    ]
)


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            Row(
                op=op,
                ts=dt.datetime(2024, 1, 1, 0, 0, s),
                seq=seq,
                before=None,
                after=Row(id=i, v=v),
            )
            for (op, s, seq, i, v) in rows
        ],
        envelope_schema(ROW),
    )


@pytest.fixture
def feed(spark, tmp_path):
    d = str(tmp_path / "feed")
    os.makedirs(d)
    write_feed_events(spark, d, _ev(spark, [("I", 1, 1, 1, 2.0)]), "c1")
    write_feed_events(spark, d, _ev(spark, [("I", 2, 2, 2, 3.0)]), "c2")
    register_cdcfeed_source(spark)
    return d


def test_batch_read_matches_helper(spark, feed):
    via_format = spark.read.format("cdcfeed").option("path", feed).load()
    via_helper = read_feed_batch(spark, feed, ROW)
    a = {(r["op"], r["seq"], r["after"]["id"]) for r in via_format.collect()}
    b = {(r["op"], r["seq"], r["after"]["id"]) for r in via_helper.collect()}
    assert a == b == {("I", 1, 1), ("I", 2, 2)}
    assert via_format.schema["ts"].dataType.typeName().startswith("timestamp")


def test_stream_snapshot_then_tail(spark, feed, tmp_path):
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    def drain():
        q = (
            spark.readStream.format("cdcfeed")
            .option("path", feed)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    drain()  # snapshot phase: both initial commits
    assert spark.read.parquet(out).count() == 2
    # binlog phase: a new commit lands, a resumed stream reads ONLY it
    write_feed_events(spark, feed, _ev(spark, [("I", 3, 3, 3, 4.0)]), "c3")
    drain()
    got = spark.read.parquet(out)
    assert got.count() == 3
    assert {r["seq"] for r in got.collect()} == {1, 2, 3}


def test_empty_feed_schema_inference_raises(spark, tmp_path):
    register_cdcfeed_source(spark)
    d = str(tmp_path / "nothing")
    os.makedirs(d)
    with pytest.raises(Exception, match="cdcfeed"):
        spark.read.format("cdcfeed").option("path", d).load().collect()


def test_engine_session_auto_registers_format(spark, tmp_path, feed):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    n = spark.read.format("cdcfeed").option("path", feed).load().count()
    assert n == 2
