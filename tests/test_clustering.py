"""Sort-based re-layout ops (r13): Iceberg ``rewrite_data_files``
SORT strategy and Hudi CLUSTERING (``replacecommit``) — the
materialization ops that turn hash/append-scattered layouts into
range-disjoint files the bounds pruners can actually skip."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def scattered(spark):
    """1000 rows whose ids are deliberately scattered across files
    (md5 order), so pre-rewrite bounds are vacuously wide."""
    return (
        spark.range(1000)
        .select(
            F.col("id"), F.concat(F.lit("s"), F.col("id")).alias("s")
        )
        .orderBy(F.md5(F.col("id").cast("string")))
        .repartition(4)
    )


def test_iceberg_sort_rewrite_enables_pruning(spark, scattered, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
        read_iceberg,
        read_iceberg_pruned,
        rewrite_data_files,
    )

    d = str(tmp_path / "i")
    export_iceberg(scattered, d, format_version=2, stats=True)
    # scattered ids: every file's bounds cover the probe -> no pruning
    assert (
        len(
            read_iceberg_pruned(spark, d, [("id", "==", 500)]).inputFiles()
        )
        == 4
    )
    out = rewrite_data_files(
        spark, d, sort_by=["id"], target_files=8, stats=True
    )
    assert out["files_after"] == 8
    pr = read_iceberg_pruned(spark, d, [("id", "==", 500)])
    assert len(pr.inputFiles()) == 1 and pr.count() == 1
    rng = read_iceberg_pruned(
        spark, d, [("id", ">=", 100), ("id", "<", 200)]
    )
    assert rng.count() == 100 and len(rng.inputFiles()) <= 2
    assert read_iceberg(spark, d).count() == 1000
    # guards
    with pytest.raises(ValueError, match="unknown columns"):
        rewrite_data_files(spark, d, sort_by=["zz"])
    with pytest.raises(ValueError, match="data_files"):
        rewrite_data_files(spark, d, sort_by=["id"], data_files=["x"])


def test_iceberg_sort_rewrite_refuses_partitioned(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        UnsupportedIcebergFeature,
        export_iceberg,
        rewrite_data_files,
    )

    d = str(tmp_path / "p")
    df = spark.range(50).select(
        F.col("id"), (F.col("id") % 3).alias("g")
    )
    export_iceberg(df, d, partition_by=["g"], format_version=2)
    with pytest.raises(UnsupportedIcebergFeature, match="partitioned"):
        rewrite_data_files(spark, d, sort_by=["id"])


def test_hudi_clustering(spark, scattered, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        UnsupportedHudiFeature,
        cluster_hudi,
        delete_hudi,
        export_hudi_cow,
        read_hudi,
        read_hudi_pruned,
        upsert_hudi,
    )

    h = str(tmp_path / "h")
    export_hudi_cow(
        scattered, h, record_key="id", num_files=8, col_stats=True
    )
    # a logged group (upsert) and hash-scattered keys: range preds
    # can't prune the pre-cluster layout
    upsert_hudi(
        spark,
        h,
        spark.createDataFrame([(5, "UP5")], "id long, s string"),
    )
    pre = read_hudi_pruned(spark, h, [("id", ">=", 100), ("id", "<", 150)])
    assert (
        len([f for f in pre.inputFiles() if f.endswith(".parquet")]) == 8
    )
    res = cluster_hudi(spark, h, sort_by="id")
    assert res["new_groups"] == 8 and res["replaced_groups"] >= 8
    rt = read_hudi(spark, h)
    got = {(r.id, r.s) for r in rt.select("id", "s").collect()}
    assert got == {
        (i, "UP5" if i == 5 else f"s{i}") for i in range(1000)
    }
    # the upserted LOG value survived the rewrite (real-time view
    # clustered, not the read-optimized one)
    post = read_hudi_pruned(
        spark, h, [("id", ">=", 100), ("id", "<", 150)]
    )
    nb = len([f for f in post.inputFiles() if f.endswith(".parquet")])
    assert post.count() == 50 and nb < 8
    # time travel to the pre-cluster instant serves the OLD layout
    pre_tt = read_hudi(spark, h, as_of=str(int(res["instant"]) - 1))
    assert pre_tt.count() == 1000
    # keyed DML refuses the clustered layout (UUID fids break the
    # exporters' hash routing — Hudi's bucket-index restriction)
    with pytest.raises(UnsupportedHudiFeature):
        upsert_hudi(
            spark,
            h,
            spark.createDataFrame([(5, "x")], "id long, s string"),
        )
    with pytest.raises(UnsupportedHudiFeature):
        delete_hudi(spark, h, "id = 5")
    # the bucket-index fast path disarmed itself: a full-key point
    # lookup still answers exactly through the clustered layout
    point = read_hudi_pruned(spark, h, [("id", "==", 5)])
    assert [(r.id, r.s) for r in point.select("id", "s").collect()] == [
        (5, "UP5")
    ]
    assert (
        len([f for f in point.inputFiles() if f.endswith(".parquet")])
        == 1  # now via col_stats bounds, not bucket routing
    )


def test_hudi_clustering_guards(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        cluster_hudi,
        export_hudi_cow,
    )

    h = str(tmp_path / "h")
    df = spark.range(10).select(
        F.col("id"), F.col("id").cast("string").alias("s")
    )
    export_hudi_cow(df, h, record_key="id", num_files=2)
    with pytest.raises(ValueError, match="unknown columns"):
        cluster_hudi(spark, h, sort_by="zz")
    with pytest.raises(ValueError, match="at least one"):
        cluster_hudi(spark, h, sort_by=[])
