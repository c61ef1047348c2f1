"""r14 (VERDICT r13 item 6): the compute-once pins are parameterized —
``spark.cdc_lake.pin.reliableDir`` swaps executor-pinned
``localCheckpoint`` for a reliable ``checkpoint`` directory, and past
the broadcast threshold the banded self-join reverts to sort-merge
while still computing the banded table exactly once (the pin's
durable win)."""
from __future__ import annotations

import io
import contextlib
from collections import Counter

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.materialize import (
    _DIR_KEY,
)


def _corpus(spark):
    rows = []
    for i in range(60):
        base = f"the quick brown fox {i} jumps over the lazy dog again and again"
        rows.append((i, base))
        if i % 3 == 0:
            rows.append((1000 + i, base + " tail"))
    return spark.createDataFrame(rows, "id long, body string")


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_pin_reliable_mode_same_results(spark, tmp_path):
    import os

    df = _corpus(spark)
    want = Counter(
        map(tuple, minhash_lsh_pairs(df, "body", "id").collect())
    )
    assert want  # the fixture must produce pairs
    rdir = str(tmp_path / "ckpt")
    spark.conf.set(_DIR_KEY, rdir)
    try:
        got = Counter(
            map(tuple, minhash_lsh_pairs(df, "body", "id").collect())
        )
    finally:
        spark.conf.unset(_DIR_KEY)
    assert got == want
    # the reliable checkpoint actually landed in the directory
    ckpt_dir = spark.sparkContext.getCheckpointDir()
    assert ckpt_dir and os.listdir(rdir)


def test_pin_smj_shape_still_computes_banding_once(spark):
    """Above the broadcast threshold (forced with threshold=-1) the
    self-join sort-merges, but both sides scan the SAME pinned RDD:
    the banding/hashing subtree is absent from the join plan."""
    df = _corpus(spark)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        pairs = minhash_lsh_pairs(df, "body", "id")
        plan = _plan(pairs)
        rows = Counter(map(tuple, pairs.collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "SortMergeJoin" in plan
    # the pinned table feeds both sides as an existing RDD; the
    # banding subtree (shingling + hashing) computed pre-pin and is
    # not in the plan
    assert plan.count("Scan ExistingRDD") >= 2
    assert "xxhash64" not in plan and "array_min" not in plan.lower()
    # and the SMJ path returns the same pairs as the default plan
    assert rows == Counter(
        map(tuple, minhash_lsh_pairs(df, "body", "id").collect())
    )
