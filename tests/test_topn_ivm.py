"""TopNIVM — Flink retract-top-N parity: deleting the current #1
promotes the runner-up, group-moving updates rerank both groups, and
a randomized retract history always matches the batch recompute."""

from __future__ import annotations

import random

from pyspark.sql import Window
from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.ivm import TopNIVM

ENV = (
    "op STRING, ts LONG, seq LONG, "
    "before STRUCT<id: LONG, cat: STRING, amt: DOUBLE>, "
    "after STRUCT<id: LONG, cat: STRING, amt: DOUBLE>"
)


def _view_map(ivm):
    return {
        (r["cat"], r["rank"]): (r["id"], r["amt"])
        for r in ivm.view().collect()
    }


def test_topn_delete_promotes_runner_up(spark, tmp_path):
    ivm = TopNIVM(
        spark, str(tmp_path / "t"), ["cat"], "id", "amt", n=2, num_buckets=2
    )
    ivm.apply(
        spark.createDataFrame(
            [
                ("I", 0, 1, None, (1, "x", 5.0)),
                ("I", 0, 2, None, (2, "x", 9.0)),
                ("I", 0, 3, None, (3, "x", 7.0)),
                ("I", 0, 4, None, (4, "y", 2.0)),
            ],
            ENV,
        ),
        epoch_id=0,
    )
    assert _view_map(ivm) == {
        ("x", 1): (2, 9.0),
        ("x", 2): (3, 7.0),
        ("y", 1): (4, 2.0),
    }
    # delete the current #1 of x: 7.0 promotes, 5.0 enters at rank 2
    ivm.apply(
        spark.createDataFrame([("D", 1, 5, (2, "x", 9.0), None)], ENV),
        epoch_id=1,
    )
    assert _view_map(ivm) == {
        ("x", 1): (3, 7.0),
        ("x", 2): (1, 5.0),
        ("y", 1): (4, 2.0),
    }
    # delete again: group shrinks below N -> rank 2 slot tombstoned
    ivm.apply(
        spark.createDataFrame([("D", 2, 6, (3, "x", 7.0), None)], ENV),
        epoch_id=2,
    )
    assert _view_map(ivm) == {("x", 1): (1, 5.0), ("y", 1): (4, 2.0)}


def test_topn_group_move_reranks_both_groups(spark, tmp_path):
    ivm = TopNIVM(
        spark, str(tmp_path / "t"), ["cat"], "id", "amt", n=2, num_buckets=2
    )
    ivm.apply(
        spark.createDataFrame(
            [
                ("I", 0, 1, None, (1, "x", 9.0)),
                ("I", 0, 2, None, (2, "x", 5.0)),
                ("I", 0, 3, None, (3, "y", 4.0)),
            ],
            ENV,
        ),
        epoch_id=0,
    )
    # move the x leader into y with a new amount
    ivm.apply(
        spark.createDataFrame(
            [("U", 1, 4, (1, "x", 9.0), (1, "y", 6.0))], ENV
        ),
        epoch_id=1,
    )
    assert _view_map(ivm) == {
        ("x", 1): (2, 5.0),
        ("y", 1): (1, 6.0),
        ("y", 2): (3, 4.0),
    }


def test_topn_randomized_matches_batch_recompute(spark, tmp_path):
    rng = random.Random(7)
    ivm = TopNIVM(
        spark, str(tmp_path / "t"), ["cat"], "id", "amt", n=3, num_buckets=4
    )
    state: dict[int, tuple[str, float]] = {}
    seq = 0
    ts = 0
    for epoch in range(4):
        events = []
        for _ in range(25):
            seq += 1
            ts += 1
            roll = rng.random()
            if state and roll < 0.25:
                rid = rng.choice(list(state))
                cat, amt = state.pop(rid)
                events.append(("D", ts, seq, (rid, cat, amt), None))
            elif state and roll < 0.55:
                rid = rng.choice(list(state))
                old = state[rid]
                new = (rng.choice("abc"), round(rng.uniform(0, 10), 1))
                state[rid] = new
                events.append(("U", ts, seq, (rid, *old), (rid, *new)))
            else:
                rid = rng.randrange(1000)
                if rid in state:
                    continue
                new = (rng.choice("abc"), round(rng.uniform(0, 10), 1))
                state[rid] = new
                events.append(("I", ts, seq, None, (rid, *new)))
        ivm.apply(spark.createDataFrame(events, ENV), epoch_id=epoch)

        expected_df = spark.createDataFrame(
            [(rid, c, a) for rid, (c, a) in state.items()],
            "id long, cat string, amt double",
        )
        w = Window.partitionBy("cat").orderBy(
            F.col("amt").desc_nulls_last(), F.col("id")
        )
        expected = {
            (r["cat"], r["rank"]): (r["id"], r["amt"])
            for r in expected_df.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 3)
            .collect()
        }
        assert _view_map(ivm) == expected, f"epoch {epoch}"


def test_topn_replayed_epoch_is_idempotent(spark, tmp_path):
    ivm = TopNIVM(
        spark, str(tmp_path / "t"), ["cat"], "id", "amt", n=2, num_buckets=2
    )
    batch = spark.createDataFrame(
        [("I", 0, 1, None, (1, "x", 5.0)), ("I", 0, 2, None, (2, "x", 9.0))],
        ENV,
    )
    ivm.apply(batch, epoch_id=0)
    before = _view_map(ivm)
    ivm.apply(batch, epoch_id=0)  # crash-replay of the same epoch
    assert _view_map(ivm) == before


def test_stream_topn_end_to_end_feed(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import Row
    from pyspark.sql import types as T

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
        envelope_schema,
        write_feed_events,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.ivm import stream_topn

    ROW = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("cat", T.StringType()),
            T.StructField("amt", T.DoubleType()),
        ]
    )
    feed = str(tmp_path / "feed")
    import os

    os.makedirs(feed)
    ev = spark.createDataFrame(
        [
            Row(op="I", ts=dt.datetime(2024, 1, 1), seq=1, before=None,
                after=Row(id=1, cat="x", amt=5.0)),
            Row(op="I", ts=dt.datetime(2024, 1, 1), seq=2, before=None,
                after=Row(id=2, cat="x", amt=9.0)),
            Row(op="I", ts=dt.datetime(2024, 1, 1), seq=3, before=None,
                after=Row(id=3, cat="x", amt=7.0)),
        ],
        envelope_schema(ROW),
    )
    write_feed_events(spark, feed, ev)
    ivm, q = stream_topn(
        spark, feed, ROW, str(tmp_path / "topn"), ["cat"], "id", "amt",
        n=2, checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True}, num_buckets=2,
    )
    q.awaitTermination(120)
    got = {(r["cat"], r["rank"]): r["id"] for r in ivm.view().collect()}
    assert got == {("x", 1): 2, ("x", 2): 3}
