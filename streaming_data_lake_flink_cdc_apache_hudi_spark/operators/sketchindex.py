"""HLL sketch sidecar: distinct-count-at-rest for lake directories
(≙ the data-sketch columns lakehouse metadata layers keep — Hudi
col_stats / Iceberg puffin "apache-datasketches-theta-v1" blobs —
re-expressed with Spark's built-in Datasketches HLL functions).

The companion of :mod:`skipindex` (bloom = membership pruning): one
scan builds a PER-FILE HyperLogLog sketch of a column, written as a
parquet sidecar DISTRIBUTED (masks never pass through the driver).
Because HLL sketches are MERGEABLE, the sidecar answers, without
touching a data file:

- ``distinct count of column over the whole dir`` — union all file
  sketches, estimate;
- ``distinct count over any file subset`` — union the subset (e.g.
  after bloom/min-max pruning picked candidate files);
- ``distinct count across MULTIPLE dirs/tables`` — sketches from
  separately-built sidecars merge exactly (the algebra is
  set-union), which is what makes per-source corpus cardinality
  dashboards O(metadata).

Scale shape: the build is one scan + one file-keyed shuffle whose
rows are (file, ~2^lg_k bytes); estimation reads only the sidecar
(bytes per file, not rows) and reduces with ``hll_union_agg`` — a
partial-aggregable JVM-side sketch merge. Relative error ~1.04/√2^lg_k
(default lg_k=12 → ~1.6%).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_LG_K = 12


def sidecar_path(dir_path: str, column: str) -> str:
    # "_"-prefixed so Spark's hidden-file filter keeps it out of data
    # reads of dir_path
    return os.path.join(dir_path, f"_hll_index_{column}_pq")


def build_hll_sidecar(
    spark: SparkSession,
    dir_path: str,
    column: str,
    lg_k: int = DEFAULT_LG_K,
) -> int:
    """One scan of (column, input_file_name) -> one HLL sketch row per
    file, written distributed. Returns the number of files indexed."""
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(dir_path)
        .select(
            F.input_file_name().alias("file"), F.col(column).alias("_v")
        )
    )
    agg = df.groupBy("file").agg(
        F.hll_sketch_agg("_v", F.lit(lg_k)).alias("sketch")
    )
    agg.write.mode("overwrite").parquet(sidecar_path(dir_path, column))
    return spark.read.parquet(sidecar_path(dir_path, column)).count()


def _estimate(sketches: DataFrame) -> int:
    row = sketches.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("est")
    ).collect()[0]
    return int(row["est"] or 0)


def distinct_estimate(
    spark: SparkSession,
    dir_path: str,
    column: str,
    file_filter=None,
) -> int:
    """Distinct-count estimate for ``column`` over the dir — from the
    sidecar alone, no data file opened. ``file_filter`` (a Column
    predicate over the ``file`` path string) restricts the estimate
    to a file subset, e.g. the survivors of bloom/min-max pruning."""
    sk = spark.read.parquet(sidecar_path(dir_path, column))
    if file_filter is not None:
        sk = sk.filter(file_filter)
    return _estimate(sk)


def distinct_estimate_union(
    spark: SparkSession, dir_paths: list[str], column: str
) -> int:
    """Distinct-count estimate of ``column`` across SEVERAL dirs'
    sidecars — sketch union is exact set-union algebra, so separately
    built indexes compose without rescanning either dataset."""
    parts = [
        spark.read.parquet(sidecar_path(d, column)) for d in dir_paths
    ]
    allsk = parts[0]
    for p in parts[1:]:
        allsk = allsk.unionByName(p)
    return _estimate(allsk)
