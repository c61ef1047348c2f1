"""Bucketed co-located join: writing both sides bucketed by the join
key must remove EVERY Exchange from the join plan (the pre-shuffled
layout is the whole point), and results must match the plain join.
"""

from __future__ import annotations

from collections import Counter

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.bucketed import (
    colocated_join,
    write_bucketed,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    o = load_table(spark, SF_SMOKE, "orders")
    li = load_table(spark, SF_SMOKE, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(o, "b_orders", "o_orderkey", 8, path=str(tmp_path / "bo"))
    write_bucketed(li, "b_lineitem", "o_orderkey", 8, path=str(tmp_path / "bl"))
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = colocated_join(spark, lt, rt, "o_orderkey").select(
        "o_orderkey", "o_totalprice", "l_quantity"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan
    assert "Exchange" not in plan, plan


def test_colocated_join_matches_plain_join(spark, bucketed_tables):
    lt, rt = bucketed_tables
    got = Counter(
        tuple(r)
        for r in colocated_join(spark, lt, rt, "o_orderkey")
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
