"""Streaming windowed aggregation parity: the streaming flavor of the
tumbling-window agg (watermark + window groupBy, SURVEY.md guide
patterns) must produce exactly the batch/oracle result once the
bounded stream drains. Plus a custom stateful operator via
applyInPandasWithState (the reference platform's Python escape hatch,
§2.5 → our engine's stateful-op surface).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
    load_table,
    read_events_stream,
)

from .conftest import SF_SMOKE


def test_streaming_windowed_agg_matches_batch(spark):
    batch = {
        tuple(r)
        for r in QUERIES["tumbling_window_agg"].fn(spark, SF_SMOKE).collect()
    }

    stream = read_events_stream(spark, SF_SMOKE)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("win_agg")
        .start()
    )
    q.processAllAvailable()
    got = {tuple(r) for r in spark.sql("SELECT * FROM win_agg").collect()}
    q.stop()
    assert got == batch


def test_streaming_session_window_matches_batch_sessionize(spark):
    """Native streaming session windows (F.session_window, 30-min gap)
    must carve the same sessions as the batch sessionize query — the
    per-user multiset of session sizes is identical once the bounded
    stream drains."""
    batch = QUERIES["sessionize"].fn(spark, SF_SMOKE)
    want = {
        (r["user_id"], r["n_events"]): r["cnt"]
        for r in batch.groupBy("user_id", "n_events")
        .agg(F.count("*").alias("cnt"))
        .collect()
    }

    stream = read_events_stream(spark, SF_SMOKE)
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.session_window("ts", "30 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_win")
        .start()
    )
    q.processAllAvailable()
    got = {
        (r["user_id"], r["n_events"]): r["cnt"]
        for r in spark.sql(
            "SELECT user_id, n_events, count(*) AS cnt FROM sess_win "
            "GROUP BY user_id, n_events"
        ).collect()
    }
    q.stop()
    assert got == want


def test_stateful_running_max_applyinpandaswithstate(spark, tmp_path):
    """Custom stateful streaming op: per-user running max of `value`
    emitted per micro-batch (applyInPandasWithState)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    ev = load_table(spark, SF_SMOKE, "events")
    # bounded replay: copy events to a stream dir in two chunks
    d = tmp_path / "feed"
    d.mkdir()
    half = ev.count() // 2
    ev.limit(half).write.mode("overwrite").parquet(str(d / "a.parquet"))
    ev.subtract(ev.limit(half)).write.mode("overwrite").parquet(
        str(d / "b.parquet")
    )

    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )

    out_schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("run_max", T.DoubleType()),
        ]
    )
    state_schema = T.StructType([T.StructField("mx", T.DoubleType())])

    def fn(key, pdfs, state: GroupState):
        mx = state.get[0] if state.exists else float("-inf")
        for pdf in pdfs:
            if len(pdf):
                mx = max(mx, float(pdf["value"].max()))
        state.update((mx,))
        yield pd.DataFrame({"user_id": [key[0]], "run_max": [mx]})

    res = stream.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout
    )
    q = (
        res.writeStream.outputMode("update")
        .format("memory")
        .queryName("runmax")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    got = {
        r["user_id"]: r["run_max"]
        for r in spark.sql(
            "SELECT user_id, max(run_max) AS run_max FROM runmax GROUP BY user_id"
        ).collect()
    }
    q.stop()
    want = {
        r["user_id"]: r["mx"]
        for r in ev.groupBy("user_id").agg(F.max("value").alias("mx")).collect()
    }
    assert got == want


def test_streaming_agg_materialized_to_lake(spark, tmp_path):
    """R8 -> S3: a streaming grouped aggregation materialized into the
    keyed lake table via foreachBatch (update-mode agg deltas MERGEd
    by group key) must converge to the batch aggregate."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        read_events_stream,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    table = UpsertLakeTable(spark, str(tmp_path / "agg_lake"), key="event_type")
    stream = read_events_stream(spark, SF_SMOKE)
    agg = stream.groupBy("event_type").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total")
    )

    def merge(batch, epoch_id):
        table.write(batch, commit_id=f"agg-{epoch_id}")

    q = (
        agg.writeStream.foreachBatch(merge)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["event_type"]: (r["n"], r["total"])
        for r in table.snapshot().collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    want = {
        r["event_type"]: (r["n"], r["total"])
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    }
    assert got == want


def test_native_stream_stream_join_append_only(spark, tmp_path):
    """Where Spark's native stream-stream join DOES apply — both sides
    append-only with watermarks — the engine uses it directly (no IVM
    needed): purchases joined to the same user's clicks within a
    10-minute window."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        read_events_stream,
    )

    clicks = (
        read_events_stream(spark, SF_SMOKE)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("click_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        read_events_stream(spark, SF_SMOKE)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")),
        "inner",
    ).select("purchase_id", "click_id")
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql("SELECT * FROM ss_join").collect()
    }

    ev = load_table(spark, SF_SMOKE, "events")
    c = ev.filter("event_type = 'click'").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"),
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in p.join(
            c,
            (F.col("p_user") == F.col("c_user"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")),
        ).select("purchase_id", "click_id").collect()
    }
    assert got == want and len(got) > 0


def _feed_batch(spark, feed_dir, rows):
    """Append one parquet file to the feed dir = one micro-batch."""
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "append"
    ).parquet(feed_dir)


def test_tumbling_window_late_data_dropped_in_horizon_merged(spark, tmp_path):
    """Watermark semantics on tumbling windows (SURVEY.md §2.5's
    late-data trap): an event older than the watermark is DROPPED (its
    already-tracked window is not reopened), while a late-but-in-horizon
    event is MERGED into its still-open window."""
    from datetime import datetime as dt

    feed = str(tmp_path / "feed")
    _feed_batch(
        spark,
        feed,
        [
            (dt(2024, 1, 1, 10, 0, 0), 1, 1.0),
            (dt(2024, 1, 1, 10, 30, 0), 1, 2.0),  # advances watermark to 10:20
        ],
    )
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        .select(
            F.date_format("w.start", "HH:mm").alias("w_start"), "n", "total"
        )
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_tumbling")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()  # watermark now 10:20; window 10:00 closed
    _feed_batch(
        spark,
        feed,
        [
            (dt(2024, 1, 1, 10, 1, 0), 1, 100.0),  # < 10:20 watermark: DROP
            (dt(2024, 1, 1, 10, 25, 0), 1, 3.0),  # in horizon: open new window
            (dt(2024, 1, 1, 10, 28, 0), 1, 4.0),  # in horizon: MERGE into it
        ],
    )
    q.processAllAvailable()
    # push the watermark far forward so every touched window finalizes
    _feed_batch(spark, feed, [(dt(2024, 1, 1, 12, 0, 0), 2, 5.0)])
    q.processAllAvailable()
    got = {
        r["w_start"]: (r["n"], r["total"])
        for r in spark.sql("SELECT * FROM late_tumbling").collect()
    }
    q.stop()
    assert got["10:00"] == (1, 1.0)  # late 100.0 NOT re-opened into it
    assert got["10:25"] == (2, 7.0)  # both in-horizon events merged
    assert got["10:30"] == (1, 2.0)
    assert "12:00" not in got  # watermark has not passed its end


def test_session_window_late_data_dropped_in_horizon_merged(spark, tmp_path):
    """Same watermark contract for session windows: a late event cannot
    re-open a finalized session; an in-horizon event extends the still
    open session of its key."""
    from datetime import datetime as dt

    feed = str(tmp_path / "feed")
    _feed_batch(
        spark,
        feed,
        [
            (dt(2024, 1, 1, 10, 0, 0), 1, 1.0),
            (dt(2024, 1, 1, 10, 5, 0), 1, 1.0),  # u1 session [10:00,10:20)
            (dt(2024, 1, 1, 10, 40, 0), 2, 1.0),  # watermark -> 10:30
        ],
    )
    schema = T.StructType(
        [
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("value", T.DoubleType()),
        ]
    )
    agg = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(feed)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "15 minutes"), F.col("user_id"))
        .agg(F.count("*").alias("n_events"))
        .select("user_id", "n_events")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("late_session")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()  # u1 session end 10:20 < wm 10:30: finalized
    _feed_batch(
        spark,
        feed,
        [
            (dt(2024, 1, 1, 10, 2, 0), 1, 1.0),  # late beyond wm: DROP
            (dt(2024, 1, 1, 10, 44, 0), 2, 1.0),  # in horizon: extend u2
        ],
    )
    q.processAllAvailable()
    _feed_batch(spark, feed, [(dt(2024, 1, 1, 12, 0, 0), 3, 1.0)])
    q.processAllAvailable()
    got = {
        (r["user_id"], r["n_events"])
        for r in spark.sql("SELECT * FROM late_session").collect()
    }
    q.stop()
    assert (1, 2) in got  # u1 session kept its 2 events; late one dropped
    assert (1, 1) not in got and (1, 3) not in got
    assert (2, 2) in got  # u2 session merged the in-horizon event
    assert not any(u == 3 for u, _ in got)  # u3 session still open


def test_streaming_dedup_within_watermark(spark):
    """Streaming exact-once event dedup (dropDuplicatesWithinWatermark):
    redelivered event_ids inside the watermark horizon are dropped —
    the stream-level complement of the sink's commit-id replay guard.
    State is bounded by the watermark (old ids age out), so this holds
    at any stream length — unlike an unbounded dropDuplicates."""
    events = read_events_stream(spark, SF_SMOKE)
    # simulate at-least-once delivery: every event arrives twice
    redelivered = events.union(events)
    deduped = redelivered.withWatermark(
        "ts", "10 minutes"
    ).dropDuplicatesWithinWatermark(["event_id"])
    q = (
        deduped.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .start()
    )
    q.processAllAvailable()
    got = spark.sql(
        "SELECT count(*) AS n, count(DISTINCT event_id) AS d FROM dedup_stream"
    ).collect()[0]
    q.stop()
    expected = load_table(spark, SF_SMOKE, "events").count()
    assert got["d"] == expected  # every event survives exactly once
    assert got["n"] == expected  # and no duplicate made it through


def _two_chunk_stream(spark, tmp_path, ev):
    d = tmp_path / "feed2"
    d.mkdir()
    half = ev.count() // 2
    ev.limit(half).write.mode("overwrite").parquet(str(d / "a.parquet"))
    ev.subtract(ev.limit(half)).write.mode("overwrite").parquet(
        str(d / "b.parquet")
    )
    return (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )


def test_stateful_running_stats_matches_batch(spark, tmp_path):
    """streaming/stateful.py running_stats: the LAST emitted row per
    key (Welford state across micro-batches) must equal the batch
    count/mean/population-variance/min/max exactly."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import running_stats

    ev = load_table(spark, SF_SMOKE, "events")
    res = running_stats(_two_chunk_stream(spark, tmp_path, ev), "user_id", "value")
    q = (
        res.writeStream.outputMode("update")
        .format("memory")
        .queryName("runstats")
        .option("checkpointLocation", str(tmp_path / "ck_rs"))
        .start()
    )
    q.processAllAvailable()
    # last emission per key = the one with the largest n
    got = {
        r["key"]: (r["n"], round(r["mean"], 6), round(r["variance"], 6),
                   r["min"], r["max"])
        for r in spark.sql(
            "SELECT * FROM (SELECT *, row_number() OVER "
            "(PARTITION BY key ORDER BY n DESC) rn FROM runstats) WHERE rn=1"
        ).collect()
    }
    q.stop()
    want = {
        str(r["user_id"]): (r["n"], round(r["mean"], 6), round(r["var"], 6),
                            r["mn"], r["mx"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count("value").alias("n"),
            F.avg("value").alias("mean"),
            F.var_pop("value").alias("var"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    assert got == want


def test_stateful_first_seen_dedup_across_batches(spark, tmp_path):
    """streaming/stateful.py first_seen_keys: every key emits exactly
    once even when it recurs in later micro-batches."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import first_seen_keys

    ev = load_table(spark, SF_SMOKE, "events")
    res = first_seen_keys(_two_chunk_stream(spark, tmp_path, ev), "user_id")
    q = (
        res.writeStream.outputMode("update")
        .format("memory")
        .queryName("firstseen")
        .option("checkpointLocation", str(tmp_path / "ck_fs"))
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql("SELECT key, count(*) c FROM firstseen GROUP BY key").collect()
    q.stop()
    assert rows, "no keys emitted"
    assert all(r["c"] == 1 for r in rows), "a key emitted more than once"
    n_keys = ev.select("user_id").distinct().count()
    assert len(rows) == n_keys


def test_stateful_first_seen_ttl_evicts_and_reemits(spark, tmp_path):
    """Event-time TTL: a key silent longer than the TTL behind the
    watermark is evicted, so its return after the quiet period emits
    again — and state stays bounded by the event-time horizon."""
    import os
    import time as _time

    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import first_seen_keys

    d = tmp_path / "ttlfeed"
    d.mkdir()
    base = "2024-01-01 00:00:00"
    t = lambda h: f"2024-01-01 {h:02d}:00:00"  # noqa: E731
    chunks = [
        [(1, t(0)), (2, t(0))],   # first sight of 1 and 2
        [(4, t(2))],              # advances watermark past 1's TTL
        [(4, t(4))],              # batch where 1's timeout fires -> evict
        [(1, t(5))],              # 1 returns after eviction -> re-emits
    ]
    for i, rows in enumerate(chunks):
        df = spark.createDataFrame(rows, "user_id long, ts_s string").selectExpr(
            "user_id", "CAST(ts_s AS TIMESTAMP) AS ts"
        )
        path = str(d / f"c{i}.parquet")
        df.coalesce(1).write.parquet(path)
        _time.sleep(0.05)
        stamp = _time.time() + i  # strictly increasing mtimes => batch order
        for root, _, files in os.walk(path):
            for f in files:
                os.utime(os.path.join(root, f), (stamp, stamp))
    schema = "user_id long, ts timestamp"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("latestFirst", "false")
        .parquet(str(d / "*"))
    )
    res = first_seen_keys(stream, "user_id", event_time_col="ts", ttl_minutes=60)
    q = (
        res.writeStream.outputMode("update")
        .format("memory")
        .queryName("ttlseen")
        .option("checkpointLocation", str(tmp_path / "ck_ttl"))
        .start()
    )
    q.processAllAvailable()
    emits = {}
    for r in spark.sql("SELECT key, count(*) c FROM ttlseen GROUP BY key").collect():
        emits[r["key"]] = r["c"]
    q.stop()
    assert emits["1"] == 2, emits   # evicted then re-emitted
    assert emits["2"] == 1, emits   # never returned -> emitted once
    assert emits["4"] == 1, emits   # continuously live -> suppressed


def test_streaming_paragraph_dedup_composition(spark, tmp_path):
    """Composition: paragraph chunking (batch operator) applied inside
    a stream + first_seen_keys = STREAMING corpus dedup — each distinct
    paragraph hash emits exactly once across micro-batches, matching
    the batch distinct count."""
    from pyspark.sql import functions as F2

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.curation import (
        paragraph_chunks,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        first_seen_keys,
    )

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = tmp_path / "docfeed"
    d.mkdir()
    half = docs.count() // 2
    docs.limit(half).write.parquet(str(d / "a.parquet"))
    docs.subtract(docs.limit(half)).write.parquet(str(d / "b.parquet"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    paras = paragraph_chunks(stream, "text", "doc_id").withColumn(
        "para_hash", F2.md5("para")
    )
    res = first_seen_keys(paras, "para_hash")
    q = (
        res.writeStream.outputMode("update")
        .format("memory")
        .queryName("streamdedup")
        .option("checkpointLocation", str(tmp_path / "ck_sd"))
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT key, count(*) c FROM streamdedup GROUP BY key"
    ).collect()
    q.stop()
    assert all(r["c"] == 1 for r in rows)
    want = (
        paragraph_chunks(docs, "text", "doc_id")
        .select(F2.md5("para"))
        .distinct()
        .count()
    )
    assert len(rows) == want


def test_streaming_sliding_window_matches_batch(spark):
    """Sliding windows (10-min size, 5-min slide) in streaming mode
    must produce the batch sliding_window_agg result exactly once the
    bounded stream drains — same F.window call on both sides."""
    batch = {
        tuple(r)
        for r in QUERIES["sliding_window_agg"].fn(spark, SF_SMOKE).collect()
    }
    stream = read_events_stream(spark, SF_SMOKE)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )
    q = (
        agg.writeStream.outputMode("complete")
        .format("memory")
        .queryName("slide_agg")
        .start()
    )
    q.processAllAvailable()
    got = {tuple(r) for r in spark.sql("SELECT * FROM slide_agg").collect()}
    q.stop()
    assert got == batch


def test_native_stream_stream_left_outer_join(spark, tmp_path):
    """LEFT OUTER stream-stream join (watermarks + time-bound on both
    sides, the shape Spark requires to emit null-extended rows once
    the watermark passes): every purchase appears exactly once, with
    its click when one exists in the 10-minute window and NULL when
    not — verified against the equivalent batch outer join."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
        read_events_stream,
    )

    def sides(reader):
        clicks = (
            reader.filter(F.col("event_type") == "click")
            .select(
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("click_ts"),
                F.col("event_id").alias("click_id"),
            )
        )
        purchases = (
            reader.filter(F.col("event_type") == "purchase")
            .select(
                F.col("user_id").alias("p_user"),
                F.col("ts").alias("purchase_ts"),
                F.col("event_id").alias("purchase_id"),
            )
        )
        return clicks, purchases

    cond = (
        (F.col("p_user") == F.col("c_user"))
        & (F.col("click_ts") <= F.col("purchase_ts"))
        & (
            F.col("click_ts")
            >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")
        )
    )

    bc, bp = sides(load_table(spark, SF_SMOKE, "events"))
    # rows still inside the watermark horizon when the bounded stream
    # ends are (correctly) never outer-emitted — compare only
    # purchases the final global watermark has passed
    import datetime as _dt

    wm_delay = _dt.timedelta(seconds=10)
    cut = (
        min(
            bc.agg(F.max("click_ts")).collect()[0][0],
            bp.agg(F.max("purchase_ts")).collect()[0][0],
        )
        - wm_delay
    )
    want = {
        (r["purchase_id"], r["click_id"])
        for r in bp.join(bc, cond, "left_outer")
        .filter(F.col("purchase_ts") < F.lit(cut))
        .select("purchase_id", "click_id")
        .collect()
    }

    sc_, sp = sides(read_events_stream(spark, SF_SMOKE))
    joined = (
        sp.withWatermark("purchase_ts", "10 seconds")
        .join(
            sc_.withWatermark("click_ts", "10 seconds"),
            cond,
            "left_outer",
        )
        .select("purchase_id", "click_id", "purchase_ts")
    )
    q = (
        joined.writeStream.outputMode("append")
        .format("memory")
        .queryName("ss_loj")
        .option("checkpointLocation", str(tmp_path / "ck_loj"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["purchase_id"], r["click_id"])
        for r in spark.sql(
            "SELECT * FROM ss_loj"
        ).collect()
        if r["purchase_ts"] < cut
    }
    q.stop()
    assert got == want
    assert any(c is None for _, c in got)  # outer rows really present


def test_streaming_drop_duplicates_within_watermark(spark, tmp_path):
    """Native streaming dedup (dropDuplicatesWithinWatermark, the
    at-least-once-ingest guard): a feed that delivers every event
    TWICE (in-batch and cross-batch duplicates) must come out exactly
    once per event_id; state for old ids is evictable past the
    watermark (unlike plain dropDuplicates, whose state only grows)."""
    import shutil

    src_dir = tmp_path / "dup_src"
    src_dir.mkdir()
    ev = load_table(spark, SF_SMOKE, "events").limit(400)
    ev.write.mode("overwrite").parquet(str(tmp_path / "stage"))
    # same file content delivered twice = cross-batch duplicates
    for i, f in enumerate(
        sorted(p for p in (tmp_path / "stage").iterdir() if p.suffix == ".parquet")
    ):
        shutil.copy(f, src_dir / f"a{i}.parquet")
        shutil.copy(f, src_dir / f"b{i}.parquet")
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir))
        .withColumn("ts", F.col("ts").cast("timestamp"))  # NTZ -> TZ
        .withWatermark("ts", "1 hour")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("dedup_stream")
        .option("checkpointLocation", str(tmp_path / "ck_dd"))
        .start()
    )
    q.processAllAvailable()
    got = [r["event_id"] for r in spark.sql("SELECT event_id FROM dedup_stream").collect()]
    q.stop()
    assert len(got) == len(set(got)) == ev.count()


def test_streaming_paragraph_dedup_native_tws_or_gated(spark, tmp_path):
    """VERDICT r4 #8: the transformWithState spelling of streaming
    paragraph dedup. When the runtime can run TWS (Spark 4 API +
    python protobuf), the native path must match first_seen_keys
    exactly; when it can't, the gate must report the precise
    dependency boundary and first_seen_keys_native must refuse with
    that reason (version/dependency-gated skip, boundary asserted)."""
    import pytest as _pytest
    from pyspark.sql import functions as F2

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.curation import (
        paragraph_chunks,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        first_seen_keys_native,
        tws_available,
    )

    ok, why = tws_available()
    if not ok:
        with _pytest.raises(RuntimeError, match="transformWithState unavailable"):
            first_seen_keys_native(
                load_table(spark, SF_SMOKE, "documents"), "doc_id"
            )
        _pytest.skip(f"native TWS path gated: {why}")

    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    d = tmp_path / "docfeed_tws"
    d.mkdir()
    half = docs.count() // 2
    docs.limit(half).write.parquet(str(d / "a.parquet"))
    docs.subtract(docs.limit(half)).write.parquet(str(d / "b.parquet"))
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    paras = paragraph_chunks(stream, "text", "doc_id").withColumn(
        "para_hash", F2.md5("para")
    )
    res = first_seen_keys_native(paras, "para_hash")
    q = (
        res.writeStream.outputMode("update")
        .format("memory")
        .queryName("streamdedup_tws")
        .option("checkpointLocation", str(tmp_path / "ck_tws"))
        .start()
    )
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT key, count(*) c FROM streamdedup_tws GROUP BY key"
    ).collect()
    q.stop()
    assert all(r["c"] == 1 for r in rows)
    want = (
        paragraph_chunks(docs, "text", "doc_id")
        .select(F2.md5("para"))
        .distinct()
        .count()
    )
    assert len(rows) == want


def test_stream_pattern_match_parity_with_batch(spark, tmp_path):
    """streaming/stateful.py pattern_match_stream: greedy-quantified
    CEP across time-split micro-batches emits exactly the batch
    operator's finalized matches — including a greedy a+ run that
    STRADDLES the batch boundary (provisional tail carried in
    state)."""
    import datetime as dt
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_quantified,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        pattern_match_stream,
    )

    rng = random.Random(7)
    rows, rid = [], 0
    for user in range(6):
        t = 0
        for _ in range(40):
            rid += 1
            t += rng.choice([1, 2, 5])
            rows.append(
                (
                    rid,
                    user,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                    rng.choice(["a", "a", "b", "x"]),
                )
            )
    # close every tail run so the streaming flavor finalizes everything
    for user in range(6):
        rid += 1
        rows.append(
            (rid, user, dt.datetime(2024, 1, 1, 1), "x")
        )
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    # time-ordered split (the operator's arrival contract): first half
    # by ts into file a, rest into b
    d = tmp_path / "cepfeed"
    d.mkdir()
    ordered = ev.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    for name, chunk in [("a", ordered[:half]), ("b", ordered[half:])]:
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    res = pattern_match_stream(
        stream, "user_id", "ts", "event_id", "event_type", ["a+", "b"]
    )
    q = (
        res.writeStream.outputMode("append")
        .format("memory")
        .queryName("cepstream")
        .option("checkpointLocation", str(tmp_path / "ck_cep"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        (int(r["key"]), r["start_id"], r["start_ts"], r["end_ts"], r["n_rows"])
        for r in spark.sql("SELECT * FROM cepstream").collect()
    )
    q.stop()
    want = sorted(
        (r["user_id"], r["start_event_id"], r["start_ts"], r["end_ts"],
         r["n_rows"])
        for r in pattern_match_quantified(
            ev, "user_id", "ts", "event_id", "event_type", ["a+", "b"]
        ).collect()
    )
    assert got == want
    assert len(got) > 20


def test_stream_pattern_match_reluctant_and_skip_to_parity(spark, tmp_path):
    """The streaming CEP flavor carries the batch operator's full
    AFTER MATCH surface: reluctant quantifiers (a+? a = pair-chopping
    runs) and SKIP TO FIRST <var> (overlapping chains) both match the
    batch operator across a micro-batch split."""
    import datetime as dt
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_quantified,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        pattern_match_stream,
    )

    rng = random.Random(21)
    rows, rid = [], 0
    for user in range(5):
        t = 0
        for _ in range(40):
            rid += 1
            t += rng.choice([1, 2])
            rows.append(
                (
                    rid,
                    user,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                    rng.choice(["a", "a", "b", "x"]),
                )
            )
    for user in range(5):  # close tail runs -> everything finalizes
        rid += 1
        rows.append((rid, user, dt.datetime(2024, 1, 1, 1), "x"))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    d = tmp_path / "cepfeed2"
    d.mkdir()
    ordered = ev.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    for name, chunk in [("a", ordered[:half]), ("b", ordered[half:])]:
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    for i, (pattern, after) in enumerate(
        [
            (["a+?", "a"], "past_last_row"),
            (["a", "b", "a"], ("to_first", [1])),
        ]
    ):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d / "*"))
        )
        res = pattern_match_stream(
            stream, "user_id", "ts", "event_id", "event_type", pattern,
            after_match=after,
        )
        q = (
            res.writeStream.outputMode("append")
            .format("memory")
            .queryName(f"cepstream2_{i}")
            .option("checkpointLocation", str(tmp_path / f"ck2_{i}"))
            .start()
        )
        q.processAllAvailable()
        got = sorted(
            (int(r["key"]), r["start_id"], r["n_rows"])
            for r in spark.sql(f"SELECT * FROM cepstream2_{i}").collect()
        )
        q.stop()
        want = sorted(
            (r["user_id"], r["start_event_id"], r["n_rows"])
            for r in pattern_match_quantified(
                ev, "user_id", "ts", "event_id", "event_type", pattern,
                after_match=after,
            ).collect()
        )
        assert got == want, (pattern, after)
        assert len(got) > 5, (pattern, after)


def test_window_tvf_sql_over_streaming_view(spark, tmp_path):
    """The Flink window-TVF spellings run on STREAMING inputs too
    (Flink's TVFs are streaming-first): TUMBLE and CUMULATE rewrite
    to projection/explode + groupBy, which Structured Streaming
    accepts; results match the batch run of the same statement."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        rewrite_window_tvf,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    d = tmp_path / "tvffeed"
    d.mkdir()
    half = ev.count() // 2
    ev.limit(half).write.parquet(str(d / "a.parquet"))
    ev.subtract(ev.limit(half)).write.parquet(str(d / "b.parquet"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    stream.createOrReplaceTempView("events_stream_tvf")
    ev.createOrReplaceTempView("events_batch_tvf")
    for tvf in [
        "TUMBLE(TABLE {t}, DESCRIPTOR(ts), INTERVAL '10' MINUTES)",
        "CUMULATE(TABLE {t}, DESCRIPTOR(ts), INTERVAL '5' MINUTES, "
        "INTERVAL '10' MINUTES)",
        "HOP(TABLE {t}, DESCRIPTOR(ts), INTERVAL '5' MINUTES, "
        "INTERVAL '10' MINUTES)",
        "SESSION(TABLE {t} PARTITION BY user_id, DESCRIPTOR(ts), "
        "INTERVAL '5' MINUTES)",
    ]:
        is_session = "SESSION" in tvf
        sql = (
            "SELECT window_start, window_end, COUNT(*) AS n, "
            "ROUND(SUM(value), 2) AS total FROM TABLE({tvf}) "
            "GROUP BY window_start, window_end"
        ).replace("{tvf}", tvf)
        if is_session:
            # the streaming SESSION route (r9) supports the aggregate
            # shape; per-key sessions, keys in GROUP BY
            sql = sql.replace(
                "SELECT window_start",
                "SELECT user_id, window_start",
            ).replace(
                "GROUP BY window_start, window_end",
                "GROUP BY user_id, window_start, window_end",
            )
        sdf = spark.sql(
            rewrite_window_tvf(
                sql.format(t="events_stream_tvf"), spark=spark
            )
        )
        assert sdf.isStreaming
        qname = "tvfstream" + tvf[:4].lower().strip("(")
        q = (
            sdf.writeStream.outputMode("complete")
            .format("memory")
            .queryName(qname)
            .option("checkpointLocation", str(tmp_path / ("ck_" + qname)))
            .start()
        )
        q.processAllAvailable()
        got = sorted(
            map(tuple, spark.sql(f"SELECT * FROM {qname}").collect())
        )
        q.stop()
        want = sorted(
            map(
                tuple,
                spark.sql(
                    rewrite_window_tvf(sql.format(t="events_batch_tvf"))
                ).collect(),
            )
        )
        assert got == want and len(got) > 0, tvf


def test_streaming_session_tvf_composite_exprs(spark, tmp_path):
    """r10 (ADVICE r9 fix): the streaming SESSION rewrite handles (a)
    window_start/window_end INSIDE composite select expressions (the
    blind alias injection used to emit 'session_window.end AS
    window_end - window_start' — invalid SQL) and (b) GROUP BY items
    containing function calls with commas (the naive ',' split
    miscounted them). Batch parity over the same statement."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        rewrite_window_tvf,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    d = tmp_path / "sessfeed"
    d.mkdir()
    half = ev.count() // 2
    ev.limit(half).write.parquet(str(d / "a.parquet"))
    ev.subtract(ev.limit(half)).write.parquet(str(d / "b.parquet"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    stream.createOrReplaceTempView("events_stream_sess2")
    ev.createOrReplaceTempView("events_batch_sess2")
    sql = (
        "SELECT coalesce(user_id, -1) AS uid, window_start, "
        "to_unix_timestamp(window_end) - to_unix_timestamp(window_start) "
        "AS dur_s, COUNT(*) AS n "
        "FROM TABLE(SESSION(TABLE {t} PARTITION BY user_id, "
        "DESCRIPTOR(ts), INTERVAL '5' MINUTES)) "
        "GROUP BY coalesce(user_id, -1), window_start, window_end"
    )
    sdf = spark.sql(
        rewrite_window_tvf(sql.format(t="events_stream_sess2"), spark=spark)
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName("sess_composite")
        .option("checkpointLocation", str(tmp_path / "ck_sc"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM sess_composite").collect())
    )
    q.stop()
    want = sorted(
        map(
            tuple,
            spark.sql(
                rewrite_window_tvf(sql.format(t="events_batch_sess2"))
            ).collect(),
        )
    )
    assert got == want and len(got) > 0
    assert all(r[2] >= 300 for r in got)  # every session spans >= gap


def test_streaming_session_tvf_row_tagging_shape(spark, tmp_path):
    """r10 (VERDICT r9 stretch): the MEASURES-less per-row SESSION
    shape runs on STREAMS — native session_window grouping +
    collect_list(struct(*)) + explode tags every row with its merged
    session's FINAL bounds. Batch parity with the gaps-and-islands
    row-tagging rewrite across a micro-batch boundary; outer filters
    over the derived table keep working."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        rewrite_window_tvf,
    )

    ev = load_table(spark, SF_SMOKE, "events")
    d = tmp_path / "sessrow"
    d.mkdir()
    half = ev.count() // 2
    ev.limit(half).write.parquet(str(d / "a.parquet"))
    ev.subtract(ev.limit(half)).write.parquet(str(d / "b.parquet"))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    stream.createOrReplaceTempView("events_stream_rowsess")
    ev.createOrReplaceTempView("events_batch_rowsess")
    sql = (
        "SELECT user_id, event_id, window_start, window_end "
        "FROM TABLE(SESSION(TABLE {t} PARTITION BY user_id, "
        "DESCRIPTOR(ts), INTERVAL '5' MINUTES)) "
        "WHERE user_id < 40"
    )
    sdf = spark.sql(
        rewrite_window_tvf(sql.format(t="events_stream_rowsess"),
                           spark=spark)
    )
    assert sdf.isStreaming
    q = (
        sdf.writeStream.outputMode("complete")
        .format("memory")
        .queryName("rowsess_q")
        .option("checkpointLocation", str(tmp_path / "ck_rs"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM rowsess_q").collect())
    )
    q.stop()
    want = sorted(
        map(
            tuple,
            spark.sql(
                rewrite_window_tvf(sql.format(t="events_batch_rowsess"))
            ).collect(),
        )
    )
    assert got == want and len(got) > 50


def test_stream_define_cep_parity_with_batch(spark, tmp_path):
    """streaming/stateful.py pattern_match_define_stream: the DEFINE
    V-shape across time-split micro-batches emits exactly the batch
    operator's finalized matches — including a valley STRADDLING the
    batch boundary, where the first kept row's PREV(value) must see
    its true predecessor from the finalized prefix (context rows in
    state)."""
    import datetime as dt
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_define,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        pattern_match_define_stream,
    )

    rng = random.Random(13)
    rows, rid = [], 0
    for user in range(6):
        t = 0
        for _ in range(50):
            rid += 1
            t += rng.choice([1, 2, 5])
            rows.append(
                (
                    rid,
                    user,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                    float(rng.randrange(0, 8)),
                )
            )
        # close any tail run: a long flat plateau finalizes everything
        for k in range(3):
            rid += 1
            rows.append(
                (rid, user, dt.datetime(2024, 1, 1, 1, k), 4.0)
            )
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    define = {"DOWN": "value < PREV(value)", "UP": "value > PREV(value)"}
    d = tmp_path / "definefeed"
    d.mkdir()
    ordered = ev.orderBy("ts", "event_id").collect()
    third = len(ordered) // 3
    for name, chunk in [
        ("a", ordered[:third]),
        ("b", ordered[third : 2 * third]),
        ("c", ordered[2 * third :]),
    ]:
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    res = pattern_match_define_stream(
        stream, "user_id", "ts", "event_id", ["DOWN+", "UP+"], define
    )
    q = (
        res.writeStream.outputMode("append")
        .format("memory")
        .queryName("definestream")
        .option("checkpointLocation", str(tmp_path / "ck_def"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        (int(r["key"]), r["start_id"], r["start_ts"], r["end_ts"], r["n_rows"])
        for r in spark.sql("SELECT * FROM definestream").collect()
    )
    q.stop()
    want = sorted(
        (r["user_id"], r["start_event_id"], r["start_ts"], r["end_ts"],
         r["n_rows"])
        for r in pattern_match_define(
            ev, "user_id", "ts", "event_id", ["DOWN+", "UP+"], define
        ).collect()
    )
    assert got == want and len(want) > 10


def test_stream_all_rows_running_measures_parity(spark, tmp_path):
    """r9 (VERDICT ask #2): ALL ROWS PER MATCH on a stream — every
    consumed row of each finalized match emits with its original
    columns, match_no, classifier, and TRUE per-row RUNNING measures
    (FINAL alongside), equal to the batch operator's ALL ROWS output
    even for valleys STRADDLING micro-batch boundaries (rows held in
    state across batches must reproduce their value columns and the
    running prefix sums exactly)."""
    import datetime as dt
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_define,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        pattern_match_define_stream,
    )

    rng = random.Random(29)
    rows, rid = [], 0
    for user in range(5):
        t = 0
        for _ in range(40):
            rid += 1
            t += rng.choice([1, 2, 5])
            rows.append(
                (
                    rid,
                    user,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                    float(rng.randrange(0, 8)),
                )
            )
        for k in range(3):  # flat plateau closes any tail run
            rid += 1
            rows.append((rid, user, dt.datetime(2024, 1, 1, 1, k), 4.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    define = {"DOWN": "value < PREV(value)", "UP": "value > PREV(value)"}
    measures = [
        ("run_sum", "sum", [0, 1], "value", "running"),
        ("fin_sum", "sum", [0, 1], "value", "final"),
        ("run_n", "count", [0], None, "running"),
        ("mno", "match_number", [], None, "final"),
    ]
    d = tmp_path / "allrowsfeed"
    d.mkdir()
    ordered = ev.orderBy("ts", "event_id").collect()
    third = len(ordered) // 3
    for name, chunk in [
        ("a", ordered[:third]),
        ("b", ordered[third : 2 * third]),
        ("c", ordered[2 * third :]),
    ]:
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    res = pattern_match_define_stream(
        stream, "user_id", "ts", "event_id", ["DOWN+", "UP+"], define,
        measures=measures, rows_per_match="all",
    )
    q = (
        res.writeStream.outputMode("append")
        .format("memory")
        .queryName("allrowsstream")
        .option("checkpointLocation", str(tmp_path / "ck_ar"))
        .start()
    )
    q.processAllAvailable()
    cols = (
        "user_id", "event_id", "ts", "value", "match_no", "classifier",
        "run_sum", "fin_sum", "run_n", "mno",
    )
    got = sorted(
        tuple(r[c] for c in cols)
        for r in spark.sql("SELECT * FROM allrowsstream").collect()
    )
    q.stop()
    want = sorted(
        tuple(r[c] for c in cols)
        for r in pattern_match_define(
            ev, "user_id", "ts", "event_id", ["DOWN+", "UP+"], define,
            measures=measures, rows_per_match="all",
        ).collect()
    )
    assert got == want and len(want) > 30
    # straddling actually exercised: matches span more rows than one
    # micro-batch boundary chunk alone in at least one key
    assert len({r[4] for r in got}) > 5  # several matches per run


def test_stream_define_next_lookahead_parity(spark, tmp_path):
    """r8 (VERDICT ask #8): NEXT(col) streams via a one-row hold-back
    instead of refusing — the last row of each key's held timeline
    stays unfinalized until its successor arrives, so a NEXT-using
    DEFINE matches across micro-batch boundaries with exactly the
    batch operator's results. The trailing equal-value plateau keeps
    the final row out of every batch match, so everything
    finalizes."""
    import datetime as dt
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_define,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        pattern_match_define_stream,
    )

    rng = random.Random(29)
    rows, rid = [], 0
    for user in range(5):
        t = 0
        for _ in range(40):
            rid += 1
            t += rng.choice([1, 2, 5])
            rows.append(
                (
                    rid,
                    user,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                    float(rng.randrange(0, 8)),
                )
            )
        for k in range(3):  # equal plateau: no match touches the tail
            rid += 1
            rows.append((rid, user, dt.datetime(2024, 1, 1, 1, k), 4.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    # A = rows whose SUCCESSOR rises; B (undefined) = the riser itself
    define = {"A": "NEXT(value) > value"}
    pattern = ["A+", "B"]
    d = tmp_path / "nextfeed"
    d.mkdir()
    ordered = ev.orderBy("ts", "event_id").collect()
    third = len(ordered) // 3
    for name, chunk in [
        ("a", ordered[:third]),
        ("b", ordered[third : 2 * third]),
        ("c", ordered[2 * third :]),
    ]:
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    res = pattern_match_define_stream(
        stream, "user_id", "ts", "event_id", pattern, define
    )
    q = (
        res.writeStream.outputMode("append")
        .format("memory")
        .queryName("nextstream")
        .option("checkpointLocation", str(tmp_path / "ck_next"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        (int(r["key"]), r["start_id"], r["start_ts"], r["end_ts"], r["n_rows"])
        for r in spark.sql("SELECT * FROM nextstream").collect()
    )
    q.stop()
    want = sorted(
        (r["user_id"], r["start_event_id"], r["start_ts"], r["end_ts"],
         r["n_rows"])
        for r in pattern_match_define(
            ev, "user_id", "ts", "event_id", pattern, define
        ).collect()
    )
    assert got == want and len(want) > 10


def test_stream_define_aggregate_and_subset_parity(spark, tmp_path):
    """r8: aggregate DEFINEs (ctx path) and SUBSET unions stream with
    batch parity — the aggregate sees only rows the match has bound
    (all held), so emit-once decisions are stable across batches."""
    import datetime as dt
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_define,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
        pattern_match_define_stream,
    )

    rng = random.Random(61)
    rows, rid = [], 0
    for user in range(5):
        t = 0
        for _ in range(40):
            rid += 1
            t += rng.choice([1, 2, 5])
            rows.append(
                (
                    rid,
                    user,
                    dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t),
                    float(rng.randrange(0, 8)),
                )
            )
        for k in range(3):  # plateau closes tail runs
            rid += 1
            rows.append((rid, user, dt.datetime(2024, 1, 1, 1, k), 4.0))
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )
    pattern = ["DOWN+", "UP"]
    define = {
        "DOWN": "value < PREV(value)",
        # aggregate over the union: rebound must beat the match MIN
        # and the descent MEAN
        "UP": "value * COUNT(DOWN.value) > SUM(DOWN.value) "
        "AND value > MIN(V.value)",
    }
    subset = {"V": ["DOWN", "UP"]}
    d = tmp_path / "aggfeed"
    d.mkdir()
    ordered = ev.orderBy("ts", "event_id").collect()
    third = len(ordered) // 3
    for name, chunk in [
        ("a", ordered[:third]),
        ("b", ordered[third : 2 * third]),
        ("c", ordered[2 * third :]),
    ]:
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
    )
    res = pattern_match_define_stream(
        stream, "user_id", "ts", "event_id", pattern, define,
        subset=subset,
    )
    q = (
        res.writeStream.outputMode("append")
        .format("memory")
        .queryName("aggstream")
        .option("checkpointLocation", str(tmp_path / "ck_agg"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        (int(r["key"]), r["start_id"], r["n_rows"])
        for r in spark.sql("SELECT * FROM aggstream").collect()
    )
    q.stop()
    want = sorted(
        (r["user_id"], r["start_event_id"], r["n_rows"])
        for r in pattern_match_define(
            ev, "user_id", "ts", "event_id", pattern, define,
            subset=subset,
        ).collect()
    )
    assert got == want and len(want) > 5
