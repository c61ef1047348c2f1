"""Streaming metrics listener: per-micro-batch progress persists and
reads back as a typed dashboard table."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.metrics import (
    attach_metrics,
    read_metrics,
)


def test_progress_events_become_queryable_metrics(spark, tmp_path):
    mdir = str(tmp_path / "metrics")
    listener = attach_metrics(spark, mdir)
    try:
        feed = tmp_path / "feed"
        feed.mkdir()
        for i in range(3):
            spark.createDataFrame(
                [(i * 10 + j, f"v{j}") for j in range(10)], "id LONG, v STRING"
            ).coalesce(1).write.parquet(str(feed / f"b{i}.parquet"))
        stream = (
            spark.readStream.schema("id LONG, v STRING")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(feed / "*"))
        )
        q = (
            stream.groupBy().count()
            .writeStream.outputMode("complete")
            .format("memory")
            .queryName("metrics_probe")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        # listener callbacks are async: wait for the progress lines
        for _ in range(50):
            try:
                if read_metrics(spark, mdir).count() >= 3:
                    break
            except Exception:
                pass
            time.sleep(0.2)
        m = read_metrics(spark, mdir)
        rows = m.filter(F.col("query_name") == "metrics_probe").collect()
        assert len(rows) >= 3
        assert sum(r["input_rows"] or 0 for r in rows) == 30
        assert all(r["batch_id"] is not None for r in rows)
        assert any((r["state_rows"] or 0) > 0 for r in rows)  # the agg state
    finally:
        spark.streams.removeListener(listener)
