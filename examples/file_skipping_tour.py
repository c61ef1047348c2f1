"""Runnable walkthrough of the r13 metadata file-skipping surface —
how a point/range query at 100 TB decides whether it opens 3 files
or 30,000, on all three lakehouse formats:

  1. Delta add.stats at write            (export_delta(stats=True),
                                          read_delta_pruned opens 1
                                          of 8 range-laid files)
  2. stats backfill on an old table      (backfill_delta_stats /
                                          rewrite_manifests(stats) —
                                          no data rewritten)
  3. Iceberg manifest bounds             (export stats=True + the
                                          bounds_filter scan)
  4. sort re-layout                      (rewrite_data_files sort
                                          strategy / cluster_hudi:
                                          scattered layouts become
                                          skippable)
  5. Hudi bucket-index point lookup      (full-key equality routes
                                          to ONE file group) +
                                          col_stats sidecar bounds
  6. the SQL spellings                   (SELECT over fmt.`/p` with
                                          automatic pruning;
                                          OPTIMIZE ... ZORDER BY;
                                          ANALYZE TABLE ... COMPUTE
                                          STATISTICS)

Run:  python examples/file_skipping_tour.py   (finishes in ~2 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import EngineConfig
from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
    backfill_delta_stats,
    export_delta,
    read_delta,
    read_delta_pruned,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
    cluster_hudi,
    export_hudi_cow,
    hudi_bucket_for_key,
    read_hudi_pruned,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
    export_iceberg,
    read_iceberg_pruned,
    rewrite_data_files,
)


def main() -> None:
    spark = EngineConfig(app_name="file_skipping_tour").session()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="skiptour_")
    eng = EngineSession(
        spark=spark, registry_path=os.path.join(root, "reg.json")
    )
    rows = (
        spark.range(100_000)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("bucket"),
            F.concat(F.lit("payload-"), F.col("id")).alias("body"),
        )
    )

    # 1. Delta: stats at write + pruned point lookup ------------------
    d = os.path.join(root, "delta")
    export_delta(rows.repartitionByRange(8, "id"), d, stats=True)
    pr = read_delta_pruned(spark, d, [("id", "==", 54_321)])
    print(
        f"[1] delta point lookup: {len(pr.inputFiles())} of "
        f"{len(read_delta(spark, d).inputFiles())} files opened, "
        f"row = {pr.collect()[0]['body']}"
    )

    # 2. backfill an old (stats-less) table ---------------------------
    d2 = os.path.join(root, "delta_old")
    export_delta(rows.repartitionByRange(8, "id"), d2)  # no stats
    n = backfill_delta_stats(spark, d2)
    pr2 = read_delta_pruned(spark, d2, [("id", "<=", 1000)])
    print(
        f"[2] backfilled {n} adds; range scan now opens "
        f"{len(pr2.inputFiles())} file(s), {pr2.count()} rows"
    )

    # 3+4. Iceberg: scattered -> sort rewrite -> skippable ------------
    i = os.path.join(root, "ice")
    export_iceberg(
        rows.orderBy(F.md5(F.col("id").cast("string"))).repartition(8),
        i,
        format_version=2,
        stats=True,
    )
    before = len(
        read_iceberg_pruned(spark, i, [("id", "==", 777)]).inputFiles()
    )
    rewrite_data_files(spark, i, sort_by=["id"], target_files=8, stats=True)
    after = len(
        read_iceberg_pruned(spark, i, [("id", "==", 777)]).inputFiles()
    )
    print(
        f"[3/4] iceberg point lookup: scattered layout opened "
        f"{before} files, sort-rewritten layout opens {after}"
    )

    # 5. Hudi: bucket-index lookup + clustering -----------------------
    h = os.path.join(root, "hudi")
    export_hudi_cow(
        rows, h, record_key="id", num_files=8, col_stats=True
    )
    pid = hudi_bucket_for_key(spark, h, {"id": 99})
    pt = read_hudi_pruned(spark, h, [("id", "==", 99)])
    bases = [f for f in pt.inputFiles() if f.endswith(".parquet")]
    print(
        f"[5] hudi bucket lookup: key 99 routes to group {pid}, "
        f"{len(bases)} base file scanned"
    )
    cluster_hudi(spark, h, sort_by="id")
    rng = read_hudi_pruned(
        spark, h, [("id", ">=", 10_000), ("id", "<", 12_000)]
    )
    bases = [f for f in rng.inputFiles() if f.endswith(".parquet")]
    print(
        f"    after clustering, a 2k-id range opens {len(bases)} of 8 "
        f"bases ({rng.count()} rows)"
    )

    # 6. the SQL spellings -------------------------------------------
    got = eng.sql(
        f"SELECT count(*) AS n FROM delta.`{d}` WHERE id <= 500"
    ).collect()[0]["n"]
    print(f"[6] SELECT over delta.`path` WHERE id <= 500 -> {got} rows")
    print(
        "    "
        + str(
            eng.sql(
                f"ANALYZE TABLE iceberg.`{i}` COMPUTE STATISTICS"
            ).collect()[0]
        )
    )
    print(
        "    "
        + str(
            eng.sql(f"OPTIMIZE delta.`{d}` ZORDER BY (id, bucket)")
            .collect()[0]
        )
    )

    shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
