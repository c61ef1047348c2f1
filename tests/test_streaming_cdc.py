"""End-to-end streaming CDC: feed dir → readStream → foreachBatch
MERGE → lake snapshot (golden scenario 3: a source UPDATE propagates
to the queryable view; zpln:1793 ¶40 → :1527 ¶34), plus the flagship
stream-static join flavor (R7).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema,
    read_feed_stream,
    write_feed_events,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
    stream_static_join,
    stream_upsert,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
    UpsertLakeTable,
)

PERSON = T.StructType(
    [
        T.StructField("id", T.DoubleType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("first_name", T.StringType()),
    ]
)


def _env_rows(events):
    # events: list of (op, ts_str, seq, before_dict|None, after_dict|None)
    def mk(d):
        return None if d is None else Row(**d)

    return [
        Row(op=op, ts=ts, seq=seq, before=mk(b), after=mk(a))
        for (op, ts, seq, b, a) in events
    ]


def _feed_df(spark, events):
    import datetime as dt

    rows = _env_rows(
        [
            (op, dt.datetime.fromisoformat(ts), seq, b, a)
            for (op, ts, seq, b, a) in events
        ]
    )
    return spark.createDataFrame(rows, envelope_schema(PERSON))


def _p(i, name):
    first, last = name.split(" ", 1)
    return {"id": float(i), "full_name": name, "last_name": last, "first_name": first}


@pytest.fixture
def feed_dir(tmp_path):
    d = tmp_path / "feed"
    d.mkdir()
    return str(d)


def _run_pipeline(spark, feed_dir, table, ckpt):
    stream = read_feed_stream(spark, feed_dir, PERSON, max_files_per_trigger=1)
    q = stream_upsert(stream, table, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)


def test_cdc_update_propagates_golden3(spark, tmp_path, feed_dir):
    table = UpsertLakeTable(spark, str(tmp_path / "person_view"), key="id")
    ckpt = str(tmp_path / "ckpt")

    # commit 1: snapshot-phase inserts (≙ S1 snapshot)
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("I", "2024-01-01T00:00:01", 1, None, _p(1, "Abby Aboushi")),
                ("I", "2024-01-01T00:00:02", 2, None, _p(2, "Bob Burger")),
            ],
        ),
        commit_id="c1",
    )
    _run_pipeline(spark, feed_dir, table, ckpt)
    assert table.snapshot().count() == 2

    # commit 2: the ¶40 UPDATE — rename person 1; and a delete of 2
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                (
                    "U",
                    "2024-01-01T00:01:00",
                    3,
                    _p(1, "Abby Aboushi"),
                    _p(1, "Abby Renamed"),
                ),
                ("D", "2024-01-01T00:01:01", 4, _p(2, "Bob Burger"), None),
            ],
        ),
        commit_id="c2",
    )
    _run_pipeline(spark, feed_dir, table, ckpt)  # same checkpoint → tail only
    snap = table.snapshot()
    rows = {r["id"]: r["full_name"] for r in snap.collect()}
    assert rows == {1.0: "Abby Renamed"}


def test_out_of_order_events_resolve_by_ts_seq(spark, tmp_path, feed_dir):
    # SURVEY.md §7 trap 1: a late-arriving older update must not win
    table = UpsertLakeTable(spark, str(tmp_path / "v"), key="id")
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("U", "2024-01-01T00:05:00", 10, None, _p(1, "Newer Name")),
                ("U", "2024-01-01T00:01:00", 2, None, _p(1, "Older Name")),
            ],
        ),
        commit_id="c1",
    )
    _run_pipeline(spark, feed_dir, table, str(tmp_path / "ck"))
    assert table.snapshot().collect()[0]["full_name"] == "Newer Name"


def test_stream_static_join_flagship(spark, tmp_path, feed_dir):
    # R7 stream-static flavor: ticket changes joined to person dim
    # inside the per-batch transform, materialized keyed on ticket id
    TICKET = T.StructType(
        [
            T.StructField("id", T.DoubleType()),
            T.StructField("ticketholder_id", T.DoubleType()),
            T.StructField("ticket_price", T.FloatType()),
        ]
    )
    person_dim = spark.createDataFrame(
        [(1.0, "Abby Aboushi"), (2.0, "Bob Burger")], "pid double, full_name string"
    )

    def _t(i, holder, price):
        return {"id": float(i), "ticketholder_id": float(holder), "ticket_price": price}

    feed = spark.createDataFrame(
        _env_rows(
            [
                ("I", __import__("datetime").datetime(2024, 1, 1), 1, None, _t(10, 1, 43.97)),
                ("I", __import__("datetime").datetime(2024, 1, 1, 0, 1), 2, None, _t(11, 2, 9.5)),
            ]
        ),
        envelope_schema(TICKET),
    )
    write_feed_events(spark, feed_dir, feed, commit_id="c1")
    table = UpsertLakeTable(spark, str(tmp_path / "tv"), key="id")

    def joined(delta):
        return stream_static_join(
            delta, F.broadcast(person_dim), delta["ticketholder_id"] == person_dim["pid"]
        ).select("id", "full_name", "ticket_price", "_deleted")

    stream = read_feed_stream(spark, feed_dir, TICKET)
    q = stream_upsert(
        stream, table, str(tmp_path / "ck"), transform=joined,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    got = {r["id"]: (r["full_name"], r["ticket_price"]) for r in table.snapshot().collect()}
    assert got[10.0][0] == "Abby Aboushi" and abs(got[10.0][1] - 43.97) < 1e-5
    assert got[11.0][0] == "Bob Burger"


def test_continuous_trigger_live_appends(spark, tmp_path, feed_dir):
    """processingTime trigger (≙ the reference's 1-min checkpoint
    cadence, scaled down): commits appended WHILE the query runs are
    picked up and merged within a few intervals."""
    import time

    table = UpsertLakeTable(spark, str(tmp_path / "live"), key="id")
    write_feed_events(
        spark, feed_dir,
        _feed_df(spark, [("I", "2024-01-01T00:00:01", 1, None, _p(1, "Ann A"))]),
        commit_id="c1",
    )
    stream = read_feed_stream(spark, feed_dir, PERSON, max_files_per_trigger=10)
    q = stream_upsert(
        stream, table, str(tmp_path / "ck_live"),
        trigger={"processingTime": "1 seconds"},
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            try:
                if table.snapshot().count() >= 1:
                    break
            except FileNotFoundError:
                pass
            time.sleep(1)
        # live append while the query is running
        write_feed_events(
            spark, feed_dir,
            _feed_df(
                spark,
                [
                    ("U", "2024-01-01T00:01:00", 2,
                     _p(1, "Ann A"), _p(1, "Ann B")),
                    ("I", "2024-01-01T00:01:01", 3, None, _p(2, "Bob B")),
                ],
            ),
            commit_id="c2",
        )
        deadline = time.time() + 60
        got = {}
        while time.time() < deadline:
            got = {r["id"]: r["full_name"] for r in table.snapshot().collect()}
            if got == {1.0: "Ann B", 2.0: "Bob B"}:
                break
            time.sleep(1)
        assert got == {1.0: "Ann B", 2.0: "Bob B"}
    finally:
        q.stop()


def test_debezium_parse_wrapped_and_chained_to_state(spark):
    """Debezium schemas.enable framing unwraps; unknown ops parse to
    NULL op; the parsed envelope chains straight into current_state."""
    from pyspark.sql import types as T

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.changelog import (
        current_state,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.debezium import (
        parse_debezium_json,
    )

    row_schema = T.StructType(
        [
            T.StructField("uuid", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("age", T.IntegerType()),
        ]
    )
    wrapped = [
        '{"schema":{"type":"struct"},"payload":{"op":"c","ts_ms":1000,'
        '"before":null,"after":{"uuid":"a","name":"A","age":1},'
        '"source":{"lsn":1}}}',
        '{"schema":{"type":"struct"},"payload":{"op":"u","ts_ms":2000,'
        '"before":{"uuid":"a","name":"A","age":1},'
        '"after":{"uuid":"a","name":"A2","age":2},"source":{"lsn":2}}}',
        '{"schema":{"type":"struct"},"payload":{"op":"c","ts_ms":3000,'
        '"before":null,"after":{"uuid":"b","name":"B","age":3},'
        '"source":{"lsn":3}}}',
        '{"schema":{"type":"struct"},"payload":{"op":"d","ts_ms":4000,'
        '"before":{"uuid":"b","name":"B","age":3},"after":null,'
        '"source":{"lsn":4}}}',
        # tombstone-ish unknown op -> NULL op row (policy: caller filters)
        '{"schema":{"type":"struct"},"payload":{"op":"x","ts_ms":5000,'
        '"before":null,"after":null,"source":{"lsn":5}}}',
    ]
    df = spark.createDataFrame([(s,) for s in wrapped], "value string")
    env = parse_debezium_json(df, "value", row_schema, wrapped=True)
    assert env.filter(F.col("op").isNull()).count() == 1
    live = current_state(env.filter(F.col("op").isNotNull()), key="uuid")
    assert [tuple(r) for r in live.collect()] == [("a", "A2", 2)]


def test_lake_changes_round_trip_through_debezium_wire(spark, tmp_path):
    """Outbound CDC: UpsertLakeTable.changes() -> to_debezium_json ->
    parse_debezium_json reconstructs the same inserts/updates/deletes
    with before/after images — the lake can FEED a Debezium-shaped
    topic, not just consume one."""
    from pyspark.sql import functions as F2
    from pyspark.sql import types as T2

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.debezium import (
        parse_debezium_json,
        to_debezium_json,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    t = UpsertLakeTable(
        spark, str(tmp_path / "cdcout"), key="id", num_buckets=2,
        compact_every=100,
    )
    t.write(
        spark.createDataFrame(
            [(1, "alice", 10.0), (2, "bob", 20.0)],
            "id INT, holder STRING, price DOUBLE",
        ),
        commit_id="c1",
    )
    s1 = t.last_commit_seq()
    upd = spark.createDataFrame(
        [(2, "bob2", 25.0), (3, "carol", 30.0)],
        "id INT, holder STRING, price DOUBLE",
    )
    t.write(upd, commit_id="c2")
    dele = spark.createDataFrame(
        [(1, "alice", 10.0, True)],
        "id INT, holder STRING, price DOUBLE, _d BOOLEAN",
    )
    t.write(dele, commit_id="c3", delete_col="_d")

    ch = t.changes(since_seq=s1)
    wire = to_debezium_json(
        ch, key_cols=["id"], value_cols=["holder", "price"],
        ts_ms=F2.lit(1700000000000), lsn=F2.col("id").cast("long"),
    )
    row_schema = T2.StructType(
        [
            T2.StructField("id", T2.IntegerType()),
            T2.StructField("holder", T2.StringType()),
            T2.StructField("price", T2.DoubleType()),
        ]
    )
    env = parse_debezium_json(wire, "value", row_schema)
    got = {
        (r["op"],
         r["after"]["id"] if r["after"] else r["before"]["id"]):
        (r["after"]["holder"] if r["after"] else None,
         r["before"]["holder"] if r["before"] else None)
        for r in env.collect()
    }
    assert got == {
        ("I", 3): ("carol", None),
        ("U", 2): ("bob2", "bob"),
        ("D", 1): (None, "alice"),
    }

def test_stream_upsert_iceberg_sink(spark, tmp_path, feed_dir):
    """r11: CDC stream -> per-micro-batch Iceberg v2 upsert commits
    (the Flink Iceberg sink's UPSERT mode): inserts, updates,
    deletes and out-of-order WITHIN-batch events land as equality-
    delete + data-file snapshots, and the final Iceberg view equals
    the batch LWW expectation; one snapshot per non-empty batch."""
    import json
    import os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        export_iceberg,
        read_iceberg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
        stream_upsert_iceberg,
    )

    path = str(tmp_path / "ice_sink")
    # seed the table (schema + first snapshot) with one pre-CDC row
    export_iceberg(
        spark.createDataFrame(
            [(0.0, "Seed Row", "Row", "Seed")], PERSON
        ),
        path,
        format_version=2,
    )
    # batch 1 (one feed file): insert 1+2, update 1 — out of order
    # within the batch (seq decides)
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("U", "2024-01-01T00:00:02", 3, _p(1, "Ann Lee"),
                 _p(1, "Ann Smith")),
                ("I", "2024-01-01T00:00:00", 1, None, _p(1, "Ann Lee")),
                ("I", "2024-01-01T00:00:01", 2, None, _p(2, "Bob Ray")),
            ],
        ),
        commit_id="batch1",
    )
    # batch 2: delete 2, insert 3
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("D", "2024-01-01T00:01:00", 4, _p(2, "Bob Ray"), None),
                ("I", "2024-01-01T00:01:01", 5, None, _p(3, "Cat Fox")),
            ],
        ),
        commit_id="batch2",
    )
    stream = read_feed_stream(
        spark, feed_dir, PERSON, max_files_per_trigger=1
    )
    q = stream_upsert_iceberg(
        stream, path, "id", str(tmp_path / "ckpt_ice"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    got = sorted(
        (r.id, r.full_name)
        for r in read_iceberg(spark, path).collect()
    )
    assert got == [(0.0, "Seed Row"), (1.0, "Ann Smith"),
                   (3.0, "Cat Fox")]
    # one snapshot per non-empty micro-batch on top of the seed
    meta = json.load(open(_current_metadata_path(path)))
    ops = [
        (s.get("summary") or {}).get("operation")
        for s in meta["snapshots"]
    ]
    assert ops[0] == "append" and len(ops) == 3
    assert all(op in ("overwrite", "delete") for op in ops[1:])


def test_stream_upsert_delta_sink(spark, tmp_path, feed_dir):
    """r12: CDC stream -> per-micro-batch Delta MERGE commits (the
    foreachBatch+MERGE deployment shape): inserts, updates, deletes
    and out-of-order WITHIN-batch events land as DV-re-add + add
    versions, and the final Delta view equals the batch LWW
    expectation; one version per non-empty batch."""
    import os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        read_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
        stream_upsert_delta,
    )

    path = str(tmp_path / "delta_sink")
    export_delta(
        spark.createDataFrame(
            [(0.0, "Seed Row", "Row", "Seed")], PERSON
        ).coalesce(1),
        path,
    )
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("U", "2024-01-01T00:00:02", 3, _p(1, "Ann Lee"),
                 _p(1, "Ann Smith")),
                ("I", "2024-01-01T00:00:00", 1, None, _p(1, "Ann Lee")),
                ("I", "2024-01-01T00:00:01", 2, None, _p(2, "Bob Ray")),
            ],
        ),
        commit_id="batch1",
    )
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("D", "2024-01-01T00:01:00", 4, _p(2, "Bob Ray"), None),
                ("I", "2024-01-01T00:01:01", 5, None, _p(3, "Cat Fox")),
            ],
        ),
        commit_id="batch2",
    )
    stream = read_feed_stream(
        spark, feed_dir, PERSON, max_files_per_trigger=1
    )
    q = stream_upsert_delta(
        stream, path, "id", str(tmp_path / "ckpt_delta"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    got = sorted(
        (r.id, r.full_name) for r in read_delta(spark, path).collect()
    )
    assert got == [(0.0, "Seed Row"), (1.0, "Ann Smith"),
                   (3.0, "Cat Fox")]
    # one commit JSON per non-empty micro-batch on top of version 0
    n_commits = len(
        [
            f
            for f in os.listdir(os.path.join(path, "_delta_log"))
            if f.endswith(".json")
        ]
    )
    assert n_commits == 3


def test_stream_upsert_hudi_sink(spark, tmp_path, feed_dir):
    """r12: CDC stream -> per-micro-batch Hudi MoR delta commits on
    an exported layout — the reference's exact deployment shape
    (Flink CDC -> Hudi MoR): data + delete blocks per batch, final
    real-time view equals the batch LWW expectation, one deltacommit
    per non-empty batch, and compaction afterwards converges the
    read-optimized view."""
    import os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        export_hudi_cow,
        read_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
        stream_upsert_hudi,
    )

    path = str(tmp_path / "hudi_sink")
    seed = spark.createDataFrame(
        [(0.0, "Seed Row", "Row", "Seed")], PERSON
    )
    export_hudi_cow(seed, path, record_key="id", num_files=2)
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("U", "2024-01-01T00:00:02", 3, _p(1, "Ann Lee"),
                 _p(1, "Ann Smith")),
                ("I", "2024-01-01T00:00:00", 1, None, _p(1, "Ann Lee")),
                ("I", "2024-01-01T00:00:01", 2, None, _p(2, "Bob Ray")),
            ],
        ),
        commit_id="batch1",
    )
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("D", "2024-01-01T00:01:00", 4, _p(2, "Bob Ray"), None),
                ("I", "2024-01-01T00:01:01", 5, None, _p(3, "Cat Fox")),
            ],
        ),
        commit_id="batch2",
    )
    stream = read_feed_stream(
        spark, feed_dir, PERSON, max_files_per_trigger=1
    )
    q = stream_upsert_hudi(
        stream, path, str(tmp_path / "ckpt_hudi"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    want = [(0.0, "Seed Row"), (1.0, "Ann Smith"), (3.0, "Cat Fox")]
    got = sorted(
        (r.id, r.full_name)
        for r in read_hudi(spark, path).select("id", "full_name").collect()
    )
    assert got == want
    # one deltacommit per non-empty batch
    n_dc = len(
        [
            f
            for f in os.listdir(os.path.join(path, ".hoodie"))
            if f.endswith(".deltacommit")
        ]
    )
    assert n_dc == 2
    # compaction converges the read-optimized view
    compact_hudi(spark, path)
    ro = sorted(
        (r.id, r.full_name)
        for r in read_hudi(spark, path, read_optimized=True)
        .select("id", "full_name")
        .collect()
    )
    assert ro == want


def test_stream_upsert_uniform_sink(spark, tmp_path, feed_dir):
    """r12: CDC stream -> per-micro-batch dual-format commits; a
    Delta client and an Iceberg client both follow the stream and
    agree on the final state."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        read_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        export_uniform,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
        stream_upsert_uniform,
    )

    path = str(tmp_path / "uni_sink")
    export_uniform(
        spark.createDataFrame(
            [(0.0, "Seed Row", "Row", "Seed")], PERSON
        ).coalesce(1),
        path,
        format_version=2,
    )
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("I", "2024-01-01T00:00:00", 1, None, _p(1, "Ann Lee")),
                ("I", "2024-01-01T00:00:01", 2, None, _p(2, "Bob Ray")),
            ],
        ),
        commit_id="batch1",
    )
    write_feed_events(
        spark,
        feed_dir,
        _feed_df(
            spark,
            [
                ("D", "2024-01-01T00:01:00", 3, _p(2, "Bob Ray"), None),
                ("U", "2024-01-01T00:01:01", 4, _p(1, "Ann Lee"),
                 _p(1, "Ann Smith")),
            ],
        ),
        commit_id="batch2",
    )
    stream = read_feed_stream(
        spark, feed_dir, PERSON, max_files_per_trigger=1
    )
    q = stream_upsert_uniform(
        stream, path, "id", str(tmp_path / "ckpt_uni"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)
    want = [(0.0, "Seed Row"), (1.0, "Ann Smith")]
    got_d = sorted(
        (r.id, r.full_name)
        for r in read_delta(spark, path).select("id", "full_name").collect()
    )
    got_i = sorted(
        (r.id, r.full_name)
        for r in read_iceberg(spark, path)
        .select("id", "full_name")
        .collect()
    )
    assert got_d == want and got_i == want


def test_stream_upsert_hudi_compaction_cadence(spark, tmp_path, feed_dir):
    """r13 (VERDICT r12 stretch): the reference's num_or_time
    compaction trigger (compaction.delta_commits=N,
    CDC-Hudi-Notebook.zpln:292 ¶7) wired into the exported-Hudi
    streaming sink — compaction fires via the post-commit hook once N
    deltacommits accumulate, the instant is CLAIMED inline so the
    next batch's deltacommit lands past it, and the read-optimized
    view converges with the real-time one."""
    import os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
        read_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
        stream_upsert_hudi,
    )

    path = str(tmp_path / "hudi_cadence")
    seed = spark.createDataFrame(
        [(0.0, "Seed Row", "Row", "Seed")], PERSON
    )
    export_hudi_cow(seed, path, record_key="id", num_files=2)
    for b in range(3):
        write_feed_events(
            spark,
            feed_dir,
            _feed_df(
                spark,
                [
                    (
                        "I",
                        f"2024-01-01T00:0{b}:00",
                        b + 1,
                        None,
                        _p(10 + b, f"Person {b}"),
                    )
                ],
            ),
            commit_id=f"b{b}",
        )
    stream = read_feed_stream(
        spark, feed_dir, PERSON, max_files_per_trigger=1
    )
    q = stream_upsert_hudi(
        stream,
        path,
        str(tmp_path / "ckpt_cad"),
        trigger={"availableNow": True},
        compact_delta_commits=2,
        compact_async=True,
    )
    q.awaitTermination(120)
    th = q._hudi_compactor["thread"]
    if th is not None:
        th.join(120)
    tl = os.listdir(os.path.join(path, ".hoodie"))
    import json as _json

    compacted = [
        f
        for f in tl
        if f.endswith(".commit")
        and (raw := open(os.path.join(path, ".hoodie", f)).read().strip())
        and _json.loads(raw).get("compacted")
    ]
    # 3 deltacommits at cadence 2 -> the hook fired at least once
    assert compacted, f"no compaction commit on timeline: {sorted(tl)}"
    want = sorted(
        [(0.0, "Seed Row")]
        + [(10.0 + b, f"Person {b}") for b in range(3)]
    )
    rt = sorted(
        (r.id, r.full_name)
        for r in read_hudi(spark, path).select("id", "full_name").collect()
    )
    assert rt == want
    # every pending fence is completed (no stuck .commit.requested)
    names = set(tl) | set(os.listdir(os.path.join(path, ".hoodie")))
    pend = [
        f
        for f in names
        if f.endswith(".commit.requested")
        and f[: -len(".commit.requested")].isdigit()
        and f[: -len(".commit.requested")] + ".commit" not in names
    ]
    assert not pend
    # sync flavor: inline compaction on the commit path works too
    ro = sorted(
        (r.id, r.full_name)
        for r in read_hudi(spark, path, read_optimized=True)
        .select("id", "full_name")
        .collect()
    )
    # groups compacted by the fired run serve base-only rows; the
    # real-time view stays authoritative for any later deltas
    assert set(ro) <= set(want)
