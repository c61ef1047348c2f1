"""JDBC → CDC-feed poll bridge (≙ the reference's live WAL tail,
zpln:1060 ¶24): a real JDBC round trip against embedded Derby —
insert/update/delete rows in the database, poll, and the upsert-lake
table follows."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    read_feed_stream,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.jdbc_bridge import (
    JdbcFeedBridge,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
    stream_upsert,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
    UpsertLakeTable,
)

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

ROW_SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("id", T.IntegerType(), True),
        T.StructField("holder", T.StringType(), True),
        T.StructField("price", T.DoubleType(), True),
    ]
)


def _outbox_rows(spark, rows):
    # (seq, op, ts, id, holder, price) — an outbox/audit changelog table
    return spark.createDataFrame(
        rows, "seq long, op string, ts string, id int, holder string, price double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


def _append_jdbc(df, url, table):
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", DRIVER)
        .mode("append")
        .save()
    )


def test_outbox_bridge_end_to_end(spark, tmp_path):
    url = "jdbc:derby:memory:bridge1;create=true"
    _append_jdbc(
        _outbox_rows(
            spark,
            [
                (1, "I", "2024-01-01 10:00:00", 1, "alice", 10.0),
                (2, "I", "2024-01-01 10:00:01", 2, "bob", 20.0),
                (3, "I", "2024-01-01 10:00:02", 3, "carol", 30.0),
            ],
        ),
        url,
        "outbox",
    )
    feed = str(tmp_path / "feed")
    bridge = JdbcFeedBridge(
        spark, url, "outbox", cursor_col="seq", feed_dir=feed,
        driver=DRIVER, op_col="op", ts_col="ts",
    )
    assert bridge.poll_once() == 3
    assert bridge.poll_once() == 0  # caught up; no empty feed batch
    assert bridge.last_cursor() == 3

    table = UpsertLakeTable(spark, str(tmp_path / "t"), key="id", num_buckets=4)
    q = stream_upsert(
        read_feed_stream(spark, feed, ROW_SCHEMA),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    snap = {r["id"]: (r["holder"], r["price"]) for r in table.snapshot().collect()}
    assert snap == {1: ("alice", 10.0), 2: ("bob", 20.0), 3: ("carol", 30.0)}

    # live tail: UPDATE id=2, DELETE id=3 land in the outbox after the
    # first poll — the next poll + restart-from-checkpoint follows them
    _append_jdbc(
        _outbox_rows(
            spark,
            [
                (4, "U", "2024-01-01 10:05:00", 2, "bob2", 25.0),
                (5, "D", "2024-01-01 10:06:00", 3, "carol", 30.0),
            ],
        ),
        url,
        "outbox",
    )
    assert bridge.poll_once() == 2
    q = stream_upsert(
        read_feed_stream(spark, feed, ROW_SCHEMA),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    snap = {r["id"]: (r["holder"], r["price"]) for r in table.snapshot().collect()}
    assert snap == {1: ("alice", 10.0), 2: ("bob2", 25.0)}


def test_table_mode_upserts_without_op_column(spark, tmp_path):
    # plain OLTP table with a monotonic version column: inserts and
    # updates surface as 'U' upserts (query-based CDC; no deletes)
    url = "jdbc:derby:memory:bridge2;create=true"
    rows = spark.createDataFrame(
        [
            (1, 10, "alice", "2024-01-01 10:00:00"),
            (2, 11, "bob", "2024-01-01 10:00:01"),
        ],
        "id int, ver long, holder string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    _append_jdbc(rows, url, "person")
    feed = str(tmp_path / "feed")
    bridge = JdbcFeedBridge(
        spark, url, "person", cursor_col="ver", feed_dir=feed,
        driver=DRIVER, ts_col="updated_at",
    )
    assert bridge.poll_once() == 2
    row_schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("holder", T.StringType(), True),
            T.StructField("updated_at", T.TimestampType(), True),
        ]
    )
    table = UpsertLakeTable(spark, str(tmp_path / "t"), key="id", num_buckets=4)
    q = stream_upsert(
        read_feed_stream(spark, feed, row_schema),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert {r["holder"] for r in table.snapshot().collect()} == {"alice", "bob"}

    # an UPDATE bumps ver; the poll sees exactly the delta
    upd = spark.createDataFrame(
        [(1, 12, "alice2", "2024-01-01 11:00:00")],
        "id int, ver long, holder string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    _append_jdbc(upd, url, "person")  # outbox-style append of the new version
    assert bridge.poll_once() == 1
    q = stream_upsert(
        read_feed_stream(spark, feed, row_schema),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    snap = {r["id"]: r["holder"] for r in table.snapshot().collect()}
    assert snap == {1: "alice2", 2: "bob"}


def test_run_stop_when_idle_drains_backlog(spark, tmp_path):
    url = "jdbc:derby:memory:bridge3;create=true"
    _append_jdbc(
        _outbox_rows(
            spark,
            [(i, "I", "2024-01-01 10:00:00", i, f"h{i}", float(i)) for i in range(1, 8)],
        ),
        url,
        "outbox",
    )
    feed = str(tmp_path / "feed")
    bridge = JdbcFeedBridge(
        spark, url, "outbox", cursor_col="seq", feed_dir=feed,
        driver=DRIVER, op_col="op", ts_col="ts", max_rows_per_poll=3,
    )
    # bounded pulls: 3+3+1 rows, then an empty poll ends the loop
    assert bridge.run(poll_interval_secs=0.0, stop_when_idle=True) == 7
    assert bridge.last_cursor() == 7

def _exec_sql(spark, url, sql):
    """Raw JDBC statement (Spark's writer can't DELETE)."""
    conn = spark._jvm.java.sql.DriverManager.getConnection(url)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def test_keys_diff_captures_hard_deletes(spark, tmp_path):
    """VERDICT r4 #3 done-condition: a hard DELETE in the source table
    (invisible to the cursor poll) surfaces as a 'D' envelope via the
    keys-diff cycle, and the downstream lake view drops the key."""
    url = "jdbc:derby:memory:bridge_del;create=true"
    rows = spark.createDataFrame(
        [
            (1, 10, "alice", "2024-01-01 10:00:00"),
            (2, 11, "bob", "2024-01-01 10:00:01"),
            (3, 12, "carol", "2024-01-01 10:00:02"),
        ],
        "id int, ver long, holder string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    _append_jdbc(rows, url, "person_d")
    feed = str(tmp_path / "feed")
    bridge = JdbcFeedBridge(
        spark, url, "person_d", cursor_col="ver", feed_dir=feed,
        driver=DRIVER, ts_col="updated_at", key_cols=["id"],
    )
    assert bridge.poll_once() == 3
    assert bridge.poll_deletes() == 0  # first diff only baselines

    row_schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("holder", T.StringType(), True),
            T.StructField("updated_at", T.TimestampType(), True),
        ]
    )
    table = UpsertLakeTable(spark, str(tmp_path / "t"), key="id", num_buckets=4)
    q = stream_upsert(
        read_feed_stream(spark, feed, row_schema),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert {r["id"] for r in table.snapshot().collect()} == {1, 2, 3}

    # hard delete, invisible to the cursor poll...
    _exec_sql(spark, url, 'DELETE FROM person_d WHERE "id" = 2')
    assert bridge.poll_once() == 0
    # ...but the keys-diff cycle captures it
    assert bridge.poll_deletes() == 1
    q = stream_upsert(
        read_feed_stream(spark, feed, row_schema),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    assert {r["id"] for r in table.snapshot().collect()} == {1, 3}
    # steady state: no further deletes, snapshot advanced
    assert bridge.poll_deletes() == 0

    # a re-insert after the delete wins back via its later event time
    upd = spark.createDataFrame(
        [(2, 13, "bob-back", "2024-01-01 12:00:00")],
        "id int, ver long, holder string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    _append_jdbc(upd, url, "person_d")
    assert bridge.poll_once() == 1
    q = stream_upsert(
        read_feed_stream(spark, feed, row_schema),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    snap = {r["id"]: r["holder"] for r in table.snapshot().collect()}
    assert snap == {1: "alice", 2: "bob-back", 3: "carol"}


def test_keys_diff_update_then_delete_not_resurrected(spark, tmp_path):
    """ADVICE r5 (medium): a row UPDATED after the last key snapshot
    (the update already emitted with a later ts) and then hard-deleted
    must stay deleted — the 'D' stamp must clear the emitted
    watermark, not just the stale snapshot ts."""
    url = "jdbc:derby:memory:bridge_udel;create=true"
    rows = spark.createDataFrame(
        [
            (1, 10, "alice", "2024-01-01 10:00:00"),
            (2, 11, "bob", "2024-01-01 10:00:01"),
        ],
        "id int, ver long, holder string, updated_at string",
    ).withColumn("updated_at", F.col("updated_at").cast("timestamp"))
    _append_jdbc(rows, url, "person_ud")
    feed = str(tmp_path / "feed")
    bridge = JdbcFeedBridge(
        spark, url, "person_ud", cursor_col="ver", feed_dir=feed,
        driver=DRIVER, ts_col="updated_at", key_cols=["id"],
    )
    assert bridge.poll_once() == 2
    assert bridge.poll_deletes() == 0  # baseline key snapshot

    # update AFTER the snapshot (cursor-visible, much later event time)
    _exec_sql(
        spark, url,
        "UPDATE person_ud SET \"ver\" = 20, \"holder\" = 'bob2', "
        "\"updated_at\" = TIMESTAMP('2024-01-01 12:00:00') "
        'WHERE "id" = 2',
    )
    assert bridge.poll_once() == 1  # update emitted with ts 12:00
    # then the hard delete, before any new key snapshot
    _exec_sql(spark, url, 'DELETE FROM person_ud WHERE "id" = 2')
    assert bridge.poll_once() == 0
    assert bridge.poll_deletes() == 1

    row_schema = T.StructType(
        [
            T.StructField("id", T.IntegerType(), True),
            T.StructField("holder", T.StringType(), True),
            T.StructField("updated_at", T.TimestampType(), True),
        ]
    )
    table = UpsertLakeTable(
        spark, str(tmp_path / "t"), key="id", num_buckets=4
    )
    q = stream_upsert(
        read_feed_stream(spark, feed, row_schema),
        table,
        str(tmp_path / "ck"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    # without the emitted-watermark stamp the 12:00 update outranks the
    # delete (stamped 10:00:01+1us from the stale snapshot) and bob is
    # permanently resurrected
    assert {r["id"] for r in table.snapshot().collect()} == {1}
