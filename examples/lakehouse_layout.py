"""Runnable walkthrough of the lakehouse LAYOUT surface — where the
engine spends one write-time pass so every later read/join gets
cheaper (the levers that matter most at 100 TB):

  1. z-order compaction            (Morton layout: point/range filters
                                    on EITHER clustered column skip
                                    most files)
  2. file sizing                   (target_file_rows ≙ Hudi's parquet
                                    max file size: pruning granularity)
  3. co-bucketed tables            (bucketBy both join sides once ->
                                    every later join has NO exchange)
  4. salted distinct-count         (exact COUNT(DISTINCT) that stays
                                    parallel under one hot group)
  5. stateful stream monitor       (per-key Welford running stats over
                                    the CDC feed, Arrow-batched state)

Run:  python examples/lakehouse_layout.py   (finishes in ~1 min)
"""

from __future__ import annotations

import glob
import os
import random
import shutil
import tempfile

from pyspark.sql import functions as F

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import EngineConfig
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.bucketed import (
    cobucketed_join,
    write_bucketed_table,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.skew import (
    salted_distinct_count,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.stateful import (
    running_stats,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
    UpsertLakeTable,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    spark = EngineConfig(
        master="local[8]", shuffle_partitions=8, driver_memory="8g",
        app_name="lakehouse-layout-example",
    ).session()
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="layout_")

    # -- 1+2: z-order compaction with file sizing --------------------
    rng = random.Random(5)
    facts = spark.createDataFrame(
        [(i, rng.randrange(1000), rng.randrange(1000)) for i in range(4000)],
        "id long, x long, y long",
    )
    t = UpsertLakeTable(spark, os.path.join(work, "zt"), key="id",
                        num_buckets=1, compact_every=10**9)
    t.write(facts, commit_id="seed")
    t.compact(cluster_by=["x", "y"], target_file_rows=500)
    files = glob.glob(os.path.join(work, "zt", "base", "**", "*.parquet"),
                      recursive=True)
    print(f"[zorder] compacted into {len(files)} files; "
          "min/max stats now tight on BOTH x and y "
          "(see tests/test_upsert_lake.py for the pruning assertion)")

    # -- 3: co-bucketed zero-shuffle join ----------------------------
    o = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed_table(o, "ex_orders", "o_orderkey", num_buckets=8)
    write_bucketed_table(li, "ex_lineitem", "o_orderkey", num_buckets=8)
    joined = cobucketed_join(spark, "ex_orders", "ex_lineitem", "o_orderkey")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    print(f"[bucketed] join rows={joined.count()}; shuffle exchanges in "
          f"plan: {plan.count('Exchange hashpartitioning')} (bucket-local)")

    # -- 4: salted exact distinct-count ------------------------------
    ev = load_table(spark, SF_DIR, "events")
    out = salted_distinct_count(ev, ["event_type"], "user_id")
    print("[salted] distinct users per event type:",
          {r["event_type"]: r["n_distinct"] for r in out.collect()})

    # -- 5: stateful streaming monitor over a replayed feed ----------
    feed = os.path.join(work, "feed")
    os.makedirs(feed)
    ev.limit(2000).write.parquet(os.path.join(feed, "a.parquet"))
    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", 1).parquet(feed + "/*"))
    q = (running_stats(stream, "event_type", "value")
         .writeStream.outputMode("update").format("memory")
         .queryName("monitor")
         .option("checkpointLocation", os.path.join(work, "ck"))
         .start())
    q.processAllAvailable()
    rows = spark.sql(
        "SELECT key, max(n) n, round(max(mean),2) mean FROM monitor GROUP BY key"
    ).collect()
    q.stop()
    print("[stateful] per-type running stats after drain:",
          {r["key"]: (r["n"], r["mean"]) for r in rows})

    spark.sql("DROP TABLE IF EXISTS ex_orders")
    spark.sql("DROP TABLE IF EXISTS ex_lineitem")
    shutil.rmtree(work, ignore_errors=True)
    print("done")


if __name__ == "__main__":
    main()
