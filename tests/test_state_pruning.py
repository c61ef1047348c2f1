"""Delta-proportional state reads: bucket-filter partition pruning,
secondary-partition (by-holder) move tombstones, and cross-commit
event-time precombine ordering — the properties that keep per-batch
IVM cost O(delta) instead of O(state) at 100 TB.
"""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
    UpsertLakeTable,
)


def _explain(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


SCHEMA = "uuid string, name string, age int"
ROWS = [(f"id{i}", f"n{i}", 20 + i) for i in range(12)]


def test_snapshot_bucket_filter_prunes_partition_dirs(spark, tmp_path):
    t = UpsertLakeTable(spark, str(tmp_path / "t"), key="uuid", num_buckets=8)
    t.write(spark.createDataFrame(ROWS, SCHEMA), commit_id="seed")
    want = spark.createDataFrame([("id3",)], "uuid string")
    buckets = t.bucket_filter_for(want)
    assert len(buckets) == 1
    snap = t.snapshot(bucket_filter=buckets)
    # the filter is a PARTITION filter at the scan (dir pruning), not a
    # post-scan predicate — the read touches only the matching bucket= dirs
    plan = _explain(snap)
    assert "PartitionFilters" in plan and "bucket" in plan.split(
        "PartitionFilters", 1
    )[1].split("\n", 1)[0]
    got = {r["uuid"] for r in snap.collect()}
    assert "id3" in got
    # superset-by-collision only: every returned key hashes to the buckets
    all_with_bucket = t._with_bucket(spark.createDataFrame(ROWS, SCHEMA))
    in_bucket = {
        r["uuid"]
        for r in all_with_bucket.filter(F.col("bucket").isin(buckets)).collect()
    }
    assert got == in_bucket


def test_empty_bucket_filter_returns_no_rows(spark, tmp_path):
    t = UpsertLakeTable(spark, str(tmp_path / "t"), key="uuid", num_buckets=4)
    t.write(spark.createDataFrame(ROWS, SCHEMA), commit_id="seed")
    assert t.snapshot(bucket_filter=[]).count() == 0


TKT = "id double, holder double, price float"


def _tkt(i, holder, price=10.0, deleted=False):
    return (float(i), float(holder), price, deleted)


def test_secondary_partition_move_tombstone(spark, tmp_path):
    """A table bucketed on a MUTABLE column (tickets-by-holder): moving
    a key between partition values writes a tombstone into the old
    bucket, so a pruned read of the old bucket cannot resurrect the
    stale row, and reading both buckets dedups to the live row."""
    t = UpsertLakeTable(
        spark,
        str(tmp_path / "tbh"),
        key="id",
        num_buckets=16,
        partition_cols="holder",
    )
    sch = TKT + ", _deleted boolean"
    t.write(
        spark.createDataFrame([_tkt(1, 7), _tkt(2, 9)], sch),
        commit_id="c1",
        delete_col="_deleted",
    )
    # move ticket 1: holder 7 -> 8 (live row to bucket(8), tombstone to bucket(7))
    t.write(
        spark.createDataFrame([_tkt(1, 8), _tkt(1, 7, deleted=True)], sch),
        commit_id="c2",
        delete_col="_deleted",
    )
    b_old = t.bucket_filter_for(spark.createDataFrame([(7.0,)], "holder double"))
    b_new = t.bucket_filter_for(spark.createDataFrame([(8.0,)], "holder double"))
    old_rows = t.snapshot(bucket_filter=b_old).filter("id = 1").collect()
    assert old_rows == [], "stale row resurrected from the old bucket"
    new_rows = t.snapshot(bucket_filter=b_new).filter("id = 1").collect()
    assert len(new_rows) == 1 and new_rows[0]["holder"] == 8.0
    # union of both buckets: the same-commit U beats its D twin (op tiebreak)
    both = t.snapshot(bucket_filter=sorted(set(b_old + b_new))).filter("id = 1")
    rows = both.collect()
    assert len(rows) == 1 and rows[0]["holder"] == 8.0
    # full snapshot agrees
    assert [r["holder"] for r in t.snapshot().filter("id = 1").collect()] == [8.0]


def test_cross_commit_event_time_precombine(spark, tmp_path):
    """A late event (older _cdc_ts/_cdc_seq) arriving in a NEWER commit
    must not overwrite newer state — the sink orders by the stored
    event-time precombine fields ahead of commit order (≙ Hudi's
    ordering-field compare across commits)."""
    t = UpsertLakeTable(spark, str(tmp_path / "t"), key="uuid")
    sch = "uuid string, name string, _cdc_ts timestamp, _cdc_seq long"
    newer = spark.createDataFrame(
        [("k", "NEW", "2024-01-02 00:00:00", 10)],
        "uuid string, name string, _cdc_ts string, _cdc_seq long",
    ).withColumn("_cdc_ts", F.col("_cdc_ts").cast("timestamp"))
    late = spark.createDataFrame(
        [("k", "STALE", "2024-01-01 00:00:00", 5)],
        "uuid string, name string, _cdc_ts string, _cdc_seq long",
    ).withColumn("_cdc_ts", F.col("_cdc_ts").cast("timestamp"))
    t.write(newer, commit_id="c1")
    t.write(late, commit_id="c2")  # out-of-order across micro-batches
    rows = t.snapshot().collect()
    assert len(rows) == 1 and rows[0]["name"] == "NEW"
    # precombine fields are meta: hidden from the plain snapshot
    assert "_cdc_ts" not in t.snapshot().columns


def test_ivm_per_batch_reads_are_bucket_pruned(spark, tmp_path):
    """A 1-ticket delta must read only the few buckets its keys hash
    to — every state table's per-batch read carries a small bucket
    filter (the VERDICT r1 scale-killer: full-state re-scan per batch)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.ivm import (
        FlagshipViewIVM,
    )

    from .test_ivm import H_SCHEMA, P_SCHEMA, T_SCHEMA, _hist, _person, _ticket

    ivm = FlagshipViewIVM(spark, str(tmp_path / "ivm"))
    persons = [_person(i, f"Person Num{i}") for i in range(1, 9)]
    tickets = [_ticket(t, (t % 8) + 1, 10.0) for t in range(1, 17)]
    ivm.apply(
        person_delta=spark.createDataFrame(persons, P_SCHEMA),
        ticket_delta=spark.createDataFrame(tickets, T_SCHEMA),
        commit_id="b0",
    )
    # one transfer: ticket 3 moves from holder 4 to holder 1
    ivm.apply(
        ticket_delta=spark.createDataFrame(
            [_ticket(3, 1, 10.0, before_holder=4)], T_SCHEMA
        ),
        hist_delta=spark.createDataFrame(
            [_hist(3, 1, "2024-01-01T12:00:00", 4, 10.0)], H_SCHEMA
        ),
        commit_id="b1",
    )
    rb = ivm.last_read_buckets
    for name in ("person", "ticket_by_holder", "hist", "ticket"):
        assert rb[name] is not None, f"{name} read was not pruned"
        assert len(rb[name]) <= 4, f"{name} read {len(rb[name])} buckets"
    # and the view is still exactly right
    from .test_ivm import _assert_view_matches

    _assert_view_matches(ivm)
