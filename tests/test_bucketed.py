"""Bucketed co-located join result parity (the exchange-free PLAN is
pinned in test_plans.py::test_cobucketed_join_has_no_exchange; this
file checks the answers match the plain join)."""

from __future__ import annotations

from collections import Counter

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.bucketed import (
    cobucketed_join,
    write_bucketed_table,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed_table(o, "bp_orders", "o_orderkey", num_buckets=8)
    write_bucketed_table(li, "bp_lineitem", "o_orderkey", num_buckets=8)
    yield "bp_orders", "bp_lineitem"
    spark.sql("DROP TABLE IF EXISTS bp_orders")
    spark.sql("DROP TABLE IF EXISTS bp_lineitem")


def test_cobucketed_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = Counter(
        tuple(r)
        for r in cobucketed_join(spark, lt, rt, "o_orderkey")
        .select("o_orderkey", "o_totalprice", "l_quantity")
        .collect()
    )
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    want = Counter(
        tuple(r)
        for r in o.join(li, "o_orderkey")
        .select("o_orderkey", "o_totalprice", "l_quantity")
        .collect()
    )
    assert got == want
