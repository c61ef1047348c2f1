"""End-to-end streaming flagship pipeline: the reference's ¶53 job —
three CDC sources (person snapshot + ticket transfers + hist inserts)
multiplexed through one feed, maintained incrementally into
ticket_view — must equal a from-scratch batch recompute after every
commit replay. Workload = sources.workload.TicketWorkload (≙
generateticketactivity).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.upsert import (
    latest_by_key,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema,
    write_feed_events,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.workload import (
    TicketWorkload,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.ivm import (
    FlagshipStreamRunner,
    mux_envelope,
)

PERSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.DoubleType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("first_name", T.StringType()),
    ]
)


def _person_snapshot_env(spark, n):
    rows = [
        Row(
            op="I",
            ts=dt.datetime(2024, 1, 1),
            seq=i,
            before=None,
            after=Row(
                id=float(i),
                full_name=f"Person Num{i}",
                last_name=f"Num{i}",
                first_name="Person",
            ),
        )
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, envelope_schema(PERSON_SCHEMA))


def _recompute(runner):
    ivm = runner.ivm
    p, t, h = ivm.person.snapshot(), ivm.ticket.snapshot(), ivm.hist.snapshot()
    joined = (
        p.join(t, p["id"] == t["ticketholder_id"])
        .join(h, h["sporting_event_ticket_id"] == t["id"])
        .select(
            p["full_name"],
            t["id"].cast("string").alias("tid_str"),
            t["ticket_price"],
            h["transaction_date_time"],
            h["purchase_by_id"],
        )
    )
    return latest_by_key(
        joined, "full_name", ["transaction_date_time", "tid_str", "purchase_by_id"]
    ).select(
        "full_name",
        F.col("tid_str").alias("id"),
        "ticket_price",
        F.col("transaction_date_time").cast("string").alias(
            "transaction_date_time"
        ),
    )


def test_streaming_flagship_end_to_end(spark, tmp_path):
    feed = str(tmp_path / "mux_feed")
    runner = FlagshipStreamRunner(spark, str(tmp_path / "job"), feed)
    wl = TicketWorkload(spark, n_persons=15, n_tickets=40, seed=3)

    # commit 1: person snapshot + ticket snapshot (S1 snapshot phase)
    write_feed_events(
        spark,
        feed,
        mux_envelope("person", _person_snapshot_env(spark, 15)),
        commit_id="c1-person",
    )
    write_feed_events(
        spark, feed, mux_envelope("ticket", wl.snapshot_tickets()),
        commit_id="c2-ticket",
    )
    q = runner.start()
    q.awaitTermination(300)
    assert runner.ivm.view.snapshot().count() == 0  # no hist yet

    # commits 3..4: two minutes of ticket transfers (binlog phase)
    for i in range(2):
        t_env, h_env = wl.transfer_batch(8)
        write_feed_events(
            spark, feed,
            mux_envelope("ticket", t_env).unionByName(
                mux_envelope("hist", h_env)
            ),
            commit_id=f"m{i}",
        )
        q = runner.start()  # same checkpoint: only new files replay
        q.awaitTermination(300)
        got = sorted(map(tuple, runner.ivm.view.snapshot().collect()))
        want = sorted(map(tuple, _recompute(runner).collect()))
        assert got == want, f"stream IVM drifted at minute {i}"

    # the ¶61 invariant on the streamed view
    dups = (
        runner.ivm.view.snapshot()
        .groupBy("full_name")
        .agg(F.count("*").alias("cnt"))
        .filter("cnt > 1")
        .count()
    )
    assert dups == 0
