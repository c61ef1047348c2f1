"""Planted-skew tests for operators/skew.py: salted join (existing,
equivalence also pinned in test_session_api) and the salted exact
distinct-count must return exactly the un-salted answers while
spreading the hot key/group across shuffle subpartitions.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.skew import (
    salted_distinct_count,
    salted_join,
)


def _skewed_fact(spark, n=5000):
    # 90% of rows hit key 7
    rows = [(i, 7 if i % 10 else i % 50, float(i)) for i in range(n)]
    return spark.createDataFrame(rows, "fid long, k long, v double")


def _dim(spark):
    return spark.createDataFrame(
        [(k, f"name_{k}") for k in range(50)], "k long, k_name string"
    )


def test_salted_join_matches_plain_inner(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    plain = Counter(
        tuple(r) for r in fact.join(dim, "k").select("fid", "k", "k_name").collect()
    )
    salted = Counter(
        tuple(r)
        for r in salted_join(fact, dim, "k", salt_buckets=8)
        .select("fid", "k", "k_name")
        .collect()
    )
    assert salted == plain


def test_salted_join_matches_plain_left(spark):
    fact, dim = _skewed_fact(spark), _dim(spark).filter(F.col("k") < 10)
    plain = Counter(
        tuple(r)
        for r in fact.join(dim, "k", "left").select("fid", "k", "k_name").collect()
    )
    salted = Counter(
        tuple(r)
        for r in salted_join(fact, dim, "k", how="left", salt_buckets=8)
        .select("fid", "k", "k_name")
        .collect()
    )
    assert salted == plain


def test_salted_join_deterministic_and_spreads_hot_key(spark):
    fact, dim = _skewed_fact(spark), _dim(spark)
    out = salted_join(fact, dim, "k", salt_buckets=8)
    # deterministic salt: same call twice -> identical result
    a = Counter(tuple(r) for r in out.collect())
    b = Counter(tuple(r) for r in out.collect())
    assert a == b
    # the hot key's rows really do carry every salt value
    n_salts_used = (
        fact.withColumn(
            "_s",
            F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(8)),
        )
        .filter(F.col("k") == 7)
        .select("_s")
        .distinct()
        .count()
    )
    assert n_salts_used == 8


def test_salted_distinct_count_exact(spark):
    # hot group "a": many duplicated values; plain answer is the oracle
    rows = [("a", i % 700) for i in range(8000)] + [("b", i) for i in range(30)]
    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["g"], "v", n_salts=16).collect()
    }
    assert got == {"a": 700, "b": 30}


def test_salted_distinct_count_no_bare_group_shuffle_of_rows(spark):
    """Plan shape: the first aggregate keys on (group, salt) — the raw
    rows are never shuffled on the bare group key."""
    import re

    rows = [("a", i) for i in range(100)]
    df = spark.createDataFrame(rows, "g string, v long")
    plan = (
        salted_distinct_count(df, ["g"], "v", n_salts=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    exchanges = re.findall(r"Exchange hashpartitioning\(([^)]*)\)", plan)
    assert exchanges, plan
    # at least one exchange carries the salt; none is a single partition
    assert any("_salt" in e for e in exchanges), exchanges
    assert "SinglePartition" not in plan
