"""HLL sketch sidecar: distributed per-file build, metadata-only
distinct estimates, file-subset and cross-dir union composition."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.sketchindex import (
    build_hll_sidecar,
    distinct_estimate,
    distinct_estimate_union,
    sidecar_path,
)


def _mk(spark, path, n_files, rows_per, offset=0, dup_every=3):
    for i in range(n_files):
        vals = [
            (offset + (i * rows_per + j) // dup_every, f"u{i}_{j}")
            for j in range(rows_per)
        ]
        spark.createDataFrame(vals, "uid LONG, who STRING").coalesce(
            1
        ).write.mode("append").parquet(path)


def test_estimate_within_hll_error_of_exact(spark, tmp_path):
    path = str(tmp_path / "d1")
    _mk(spark, path, n_files=6, rows_per=400)
    n = build_hll_sidecar(spark, path, "uid")
    assert n >= 6
    assert os.path.isdir(sidecar_path(path, "uid"))
    exact = spark.read.parquet(path).select("uid").distinct().count()
    est = distinct_estimate(spark, path, "uid")
    assert abs(est - exact) <= max(0.05 * exact, 2), (est, exact)
    # sidecar is hidden from data reads
    assert spark.read.parquet(path).columns == ["uid", "who"]


def test_file_subset_estimate(spark, tmp_path):
    path = str(tmp_path / "d2")
    _mk(spark, path, n_files=4, rows_per=300)
    build_hll_sidecar(spark, path, "uid")
    # restrict to one physical file and compare against its exact count
    sk = spark.read.parquet(sidecar_path(path, "uid"))
    one = sk.select("file").limit(1).collect()[0]["file"]
    est = distinct_estimate(spark, path, "uid", file_filter=F.col("file") == one)
    exact = (
        spark.read.parquet(one.removeprefix("file://"))
        .select("uid")
        .distinct()
        .count()
    )
    assert abs(est - exact) <= max(0.05 * exact, 2)


def test_union_across_dirs_matches_set_union(spark, tmp_path):
    a, b = str(tmp_path / "da"), str(tmp_path / "db")
    _mk(spark, a, n_files=3, rows_per=300, offset=0)
    _mk(spark, b, n_files=3, rows_per=300, offset=150)  # overlapping ids
    build_hll_sidecar(spark, a, "uid")
    build_hll_sidecar(spark, b, "uid")
    exact = (
        spark.read.parquet(a)
        .select("uid")
        .union(spark.read.parquet(b).select("uid"))
        .distinct()
        .count()
    )
    est = distinct_estimate_union(spark, [a, b], "uid")
    assert abs(est - exact) <= max(0.05 * exact, 2), (est, exact)


def test_build_is_distributed_no_driver_rows(spark, tmp_path):
    """The sidecar build plan must be scan -> partial agg -> exchange
    keyed by file -> final agg -> write: sketch rows never collect()
    to the driver (the write is the sink)."""
    path = str(tmp_path / "d3")
    _mk(spark, path, n_files=3, rows_per=200)
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(path)
        .select(F.input_file_name().alias("file"), F.col("uid").alias("_v"))
        .groupBy("file")
        .agg(F.hll_sketch_agg("_v", F.lit(12)).alias("sketch"))
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ObjectHashAggregate" in plan or "SortAggregate" in plan
    assert plan.count("partial_hll_sketch_agg") >= 1  # map-side partial
