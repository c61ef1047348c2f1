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


def test_interpolate_linear_known_values_and_edges(spark):
    """Hand-checkable lerp: interior points interpolate linearly,
    grid points on samples return the sample, nothing extrapolates
    past either end, exact-ts duplicates average first."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.timeseries import (
        interpolate_linear,
    )

    rows = [
        ("a", "2024-01-01 00:00:03", 10.0),
        ("a", "2024-01-01 00:00:13", 30.0),
        ("a", "2024-01-01 00:00:23", 10.0),
        ("b", "2024-01-01 00:00:00", 4.0),
        ("b", "2024-01-01 00:00:00", 6.0),   # exact-ts collision -> avg 5
        ("b", "2024-01-01 00:00:10", 15.0),
    ]
    df = spark.createDataFrame(rows, "s STRING, ts STRING, v DOUBLE")
    got = {
        (r["s"], r["grid_ts"]): r["value"]
        for r in interpolate_linear(df, "s", "ts", "v", every_secs=5).collect()
    }
    assert got == {
        ("a", "2024-01-01 00:00:05"): 14.0,
        ("a", "2024-01-01 00:00:10"): 24.0,
        ("a", "2024-01-01 00:00:15"): 26.0,
        ("a", "2024-01-01 00:00:20"): 16.0,
        ("b", "2024-01-01 00:00:00"): 5.0,   # on-sample grid point
        ("b", "2024-01-01 00:00:05"): 10.0,
        ("b", "2024-01-01 00:00:10"): 15.0,  # last sample kept
    }


def test_m4_downsample_keeps_extremes_and_bounds_output(spark):
    """M4 contract: the global min/max/first/last of every series
    survive downsampling; output size <= 4 points per bucket."""
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.timeseries import (
        m4_downsample,
    )

    rng = random.Random(3)
    rows = []
    base = 1_700_000_000
    for s in ("x", "y"):
        for i in range(500):
            rows.append(
                (s, f"2024-01-01 {i // 3600:02d}:{(i // 60) % 60:02d}:{i % 60:02d}",
                 rng.uniform(-100, 100))
            )
    df = spark.createDataFrame(rows, "s STRING, ts STRING, v DOUBLE")
    out = m4_downsample(df, "s", "ts", "v", n_buckets=16)
    pts = out.collect()
    assert len(pts) <= 2 * 16 * 4
    per_series = {}
    for r in pts:
        per_series.setdefault(r["s"], []).append(r["value"])
    raw = {}
    for s, ts, v in rows:
        raw.setdefault(s, []).append(v)
    for s in raw:
        assert max(raw[s]) in per_series[s]  # global max survives
        assert min(raw[s]) in per_series[s]  # global min survives
