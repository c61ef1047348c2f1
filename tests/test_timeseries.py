"""Gap-filled time-series rollup (operators/timeseries.py)."""

from __future__ import annotations


def test_gap_filled_rollup_fills_planted_gap(spark):
    """A series with observations at buckets 0 and 3 must emit dense
    buckets 0,1,2,3 with zero-fill in the middle; series bounds are
    per-series (no global spine)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.timeseries import (
        gap_filled_rollup,
    )

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def at(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    df = spark.createDataFrame(
        [
            ("a", at(0), 1.0),
            ("a", at(16), 2.0),   # bucket 3 for width 5m
            ("b", at(5), 3.0),    # b spans exactly one bucket
        ],
        ["series", "ts", "value"],
    )
    out = gap_filled_rollup(
        df,
        "ts",
        ["series"],
        "5 minutes",
        aggs={"n": F.count(F.lit(1)), "total": F.sum("value")},
        fills={"n": 0, "total": 0.0},
    ).orderBy("series", "bucket")
    rows = [
        (r["series"], r["bucket"].minute, r["n"], r["total"])
        for r in out.collect()
    ]
    assert rows == [
        ("a", 0, 1, 1.0),
        ("a", 5, 0, 0.0),
        ("a", 10, 0, 0.0),
        ("a", 15, 1, 2.0),
        ("b", 5, 1, 3.0),
    ]
