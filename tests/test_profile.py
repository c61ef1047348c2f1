"""Table profiling operator (operators/profile.py): planted values,
approx-vs-exact distinct, and the one-scan plan contract."""

from __future__ import annotations

import contextlib
import io

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.profile import profile


def test_profile_planted_values(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "b")],
        ["x", "y"],
    )
    rows = {
        r["column"]: r
        for r in profile(df, exact_distinct=True).collect()
    }
    assert rows["x"]["n_rows"] == 4
    assert rows["x"]["n_nulls"] == 1
    assert rows["x"]["n_distinct"] == 2
    assert (rows["x"]["min_val"], rows["x"]["max_val"]) == ("1", "2")
    assert rows["y"]["n_nulls"] == 1
    assert rows["y"]["n_distinct"] == 2
    assert (rows["y"]["min_val"], rows["y"]["max_val"]) == ("a", "b")


def test_profile_is_single_scan(spark):
    """All columns' metrics come from ONE aggregation pass — the plan
    must contain exactly one parquet scan and no join/union of
    per-column subplans."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )
    from .conftest import SF_ORACLE

    li = load_table(spark, SF_ORACLE, "lineitem")
    out = profile(li, ["l_extendedprice", "l_returnflag", "l_quantity"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        out.explain("formatted")
    tree = buf.getvalue().split("\n\n(")[0]
    assert tree.count("Scan parquet") == 1
    assert "Union" not in tree and "Join" not in tree
    # HLL sketch by default (the 100 TB path)
    assert out.count() == 3


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
