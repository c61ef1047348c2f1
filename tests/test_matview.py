"""CREATE/REFRESH MATERIALIZED VIEW over a CDC feed: the Flink
dynamic-table workflow as registry DDL — initial full refresh,
delta-proportional incremental refresh past the watermark, retract
correctness for SUM/COUNT/MIN/MAX, idempotent re-refresh."""

from __future__ import annotations

import datetime as dt
import os

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema,
    write_feed_events,
)

ROW = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("cat", T.StringType()),
        T.StructField("amt", T.DoubleType()),
    ]
)


def _env(spark, events):
    rows = [
        Row(
            op=op,
            ts=dt.datetime(2024, 1, 1, 0, 0, sec),
            seq=seq,
            before=None if b is None else Row(**b),
            after=None if a is None else Row(**a),
        )
        for (op, sec, seq, b, a) in events
    ]
    return spark.createDataFrame(rows, envelope_schema(ROW))


def _r(id, cat, amt):
    return {"id": id, "cat": cat, "amt": amt}


@pytest.fixture
def eng(spark, tmp_path):
    return EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )


def test_create_refresh_and_retract(spark, tmp_path, eng):
    feed = str(tmp_path / "feed")
    os.makedirs(feed)
    write_feed_events(
        spark,
        feed,
        _env(
            spark,
            [
                ("I", 1, 1, None, _r(1, "x", 5.0)),
                ("I", 2, 2, None, _r(2, "x", 9.0)),
                ("I", 3, 3, None, _r(3, "y", 2.0)),
            ],
        ),
    )
    eng.registry.create_table("ev_feed", "feed", feed)
    res = eng.sql(
        "CREATE MATERIALIZED VIEW mv AS SELECT cat, SUM(amt) AS total, "
        "COUNT(*) AS n, MAX(amt) AS hi FROM ev_feed GROUP BY cat"
    ).collect()
    assert res[0]["rows_applied"] == 3
    got = {r["cat"]: (r["total"], r["n"], r["hi"]) for r in eng.table("mv").collect()}
    assert got == {"x": (14.0, 2, 9.0), "y": (2.0, 1, 2.0)}

    # incremental refresh: delete the current MAX of x, update y
    write_feed_events(
        spark,
        feed,
        _env(
            spark,
            [
                ("D", 4, 4, _r(2, "x", 9.0), None),
                ("U", 5, 5, _r(3, "y", 2.0), _r(3, "y", 7.5)),
            ],
        ),
    )
    res = eng.sql("REFRESH MATERIALIZED VIEW mv").collect()
    assert res[0]["rows_applied"] == 2
    got = {r["cat"]: (r["total"], r["n"], r["hi"]) for r in eng.table("mv").collect()}
    assert got == {"x": (5.0, 1, 5.0), "y": (7.5, 1, 7.5)}

    # no new events: refresh is a cheap no-op
    assert eng.sql("REFRESH MATERIALIZED VIEW mv").collect()[0]["rows_applied"] == 0

    # SQL access via the bound temp view too
    assert {
        r["cat"]: r["total"]
        for r in eng.sql("SELECT cat, total FROM mv").collect()
    } == {"x": 5.0, "y": 7.5}


def test_mv_rejects_non_feed_source_and_expressions(spark, tmp_path, eng):
    feed = str(tmp_path / "feed2")
    os.makedirs(feed)
    eng.registry.create_table("f2", "feed", feed)
    eng.sql(
        "CREATE TABLE plain (id BIGINT, PRIMARY KEY (id) NOT ENFORCED) "
        f"WITH ('path' = '{tmp_path / 'plain'}')"
    )
    with pytest.raises(ValueError, match="feed"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad AS SELECT id, COUNT(*) AS n "
            "FROM plain GROUP BY id"
        )
    with pytest.raises(ValueError, match="SUM/COUNT/MIN/MAX"):
        eng.sql(
            "CREATE MATERIALIZED VIEW bad2 AS SELECT cat, AVG(amt) AS a "
            "FROM f2 GROUP BY cat"
        )


def test_postgres_cdc_connector_ddl_registers_feed(spark, tmp_path, eng):
    """The notebook's ¶24 source DDL spelling (connector=postgres-cdc)
    registers a FEED table that feeds a materialized view end to end."""
    feed = str(tmp_path / "pgfeed")
    os.makedirs(feed)
    write_feed_events(
        spark, feed, _env(spark, [("I", 1, 1, None, _r(1, "x", 4.0))])
    )
    eng.sql(
        "CREATE TABLE pg_src (id BIGINT, cat STRING, amt DOUBLE, "
        "PRIMARY KEY (id) NOT ENFORCED) WITH ("
        "'connector' = 'postgres-cdc', "
        f"'path' = '{feed}')"
    )
    assert eng.registry._tables["pg_src"].kind == "feed"
    # feed table is queryable (envelope rows) and drives an MV
    assert eng.sql("SELECT COUNT(*) n FROM pg_src").collect()[0]["n"] == 1
    eng.sql(
        "CREATE MATERIALIZED VIEW pg_mv AS SELECT cat, SUM(amt) AS s "
        "FROM pg_src GROUP BY cat"
    )
    assert eng.sql("SELECT * FROM pg_mv").collect()[0]["s"] == 4.0


def test_mv_group_move_debits_and_credits(spark, tmp_path, eng):
    feed = str(tmp_path / "feed3")
    os.makedirs(feed)
    write_feed_events(
        spark,
        feed,
        _env(
            spark,
            [
                ("I", 1, 1, None, _r(1, "x", 5.0)),
                ("I", 2, 2, None, _r(2, "y", 2.0)),
            ],
        ),
    )
    eng.registry.create_table("f3", "feed", feed)
    eng.sql(
        "CREATE MATERIALIZED VIEW mv3 AS SELECT cat, SUM(amt) AS s, "
        "COUNT(*) AS n FROM f3 GROUP BY cat"
    )
    # the row MOVES group x -> y with a new amount
    write_feed_events(
        spark,
        feed,
        _env(spark, [("U", 3, 3, _r(1, "x", 5.0), _r(1, "y", 8.0))]),
    )
    eng.sql("REFRESH MATERIALIZED VIEW mv3")
    got = {r["cat"]: (r["s"], r["n"]) for r in eng.table("mv3").collect()}
    # group x emptied -> tombstoned out of the view entirely
    assert got == {"y": (10.0, 2)}
