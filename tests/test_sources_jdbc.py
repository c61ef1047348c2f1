"""JDBC source entry point (≙ the reference's psycopg2 source-preview
paragraphs ¶18/¶20), exercised against Spark's bundled embedded Derby
— a real JDBC round trip, no external database needed."""

from __future__ import annotations

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.jdbc import (
    preview_source,
    read_jdbc_table,
)

URL = "jdbc:derby:memory:jdbctest;create=true"
DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _seed(spark):
    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], "id int, full_name string"
    )
    (
        df.write.format("jdbc")
        .option("url", URL)
        .option("dbtable", "person")
        .option("driver", DRIVER)
        .mode("overwrite")
        .save()
    )


def test_preview_pushes_limit_into_source(spark):
    _seed(spark)
    prev = preview_source(spark, URL, "person", n=5, driver=DRIVER)
    assert prev.count() == 5
    assert {c.lower() for c in prev.columns} == {"id", "full_name"}


def test_partitioned_snapshot_read(spark):
    _seed(spark)
    full = read_jdbc_table(
        spark,
        URL,
        "person",
        partition_column="id",
        lower_bound=0,
        upper_bound=100,
        num_partitions=4,
        driver=DRIVER,
    )
    assert full.count() == 100
    # the scan is split into 4 range predicates -> 4 parallel tasks
    assert full.rdd.getNumPartitions() == 4


def test_partitioned_read_requires_full_bounds(spark):
    import pytest

    with pytest.raises(ValueError, match="together"):
        read_jdbc_table(spark, URL, "person", partition_column="id")
