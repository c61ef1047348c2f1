"""Session-timezone robustness: every registry query that touches
timestamps must produce IDENTICAL output under any session zone —
the driver's vanilla SparkSession makes no timezone promise, and the
DuckDB oracles are zone-agnostic. Epoch math must run over
TIMESTAMP_NTZ (timestampdiff/timestampadd), never through a
session-zone cast."""

from __future__ import annotations

from collections import Counter

from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES

from .conftest import SF_SMOKE

_TIME_QUERIES = [
    "debezium_parse",
    "interpolated_series",
    "m4_downsample",
    "tumbling_window_agg",
    "sliding_window_agg",
    "sessionize",
]


def test_time_queries_are_session_zone_independent(spark):
    tz_conf = "spark.sql.session.timeZone"
    original = spark.conf.get(tz_conf)
    baseline = {}
    try:
        spark.conf.set(tz_conf, "UTC")
        for name in _TIME_QUERIES:
            df = QUERIES[name].fn(spark, SF_SMOKE)
            baseline[name] = Counter(
                tuple(r) for r in df.select(*sorted(df.columns)).collect()
            )
        # +05:30 (non-integral hour) is the adversarial zone
        spark.conf.set(tz_conf, "Asia/Kolkata")
        for name in _TIME_QUERIES:
            df = QUERIES[name].fn(spark, SF_SMOKE)
            got = Counter(
                tuple(r) for r in df.select(*sorted(df.columns)).collect()
            )
            assert got == baseline[name], f"{name} shifted with session zone"
    finally:
        spark.conf.set(tz_conf, original)
