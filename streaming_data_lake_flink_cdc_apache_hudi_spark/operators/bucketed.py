"""Bucketed-table co-located joins: pre-shuffle once at write time,
join shuffle-free forever after.

The lake's upsert tables already hash rows into ``bucket=N`` dirs for
keyed pruning (streaming/upsert_sink.py); this module exposes SPARK's
catalog bucketing (``bucketBy`` + ``saveAsTable``) for the analytic
tables AROUND the lake — the fact/dim parquet a user repeatedly joins
on the same key. Writing both sides bucketed (and sorted) by the join
key records the hash-partitioning in the catalog, so Catalyst plans
the join with NO Exchange on either side: at 100 TB that deletes the
two largest shuffles of every recurring join at the cost of one
shuffle at write time. Bucket counts must match (or divide evenly);
keep them a power of two so tables written at different scales still
align.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | Sequence[str],
    num_buckets: int,
    path: str | None = None,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (+ bucket-sorted) catalog table.
    ``path`` makes it external (data at ``path``, metadata in the
    catalog) — pass it in tests and anywhere the warehouse dir isn't
    the right home. Sorting by the bucket columns lets the join skip
    its Sort as well, and keeps parquet min/max tight for point reads
    (same motivation as the lake's key-sorted compaction)."""
    cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    w = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(num_buckets, *cols)
    )
    if sort:
        w = w.sortBy(*cols)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table_name)


def colocated_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. The
    ``merge`` hint keeps the plan on the sort-merge path (a broadcast
    would hide the co-location at test scale); with matching bucket
    layouts the executed plan contains no Exchange at all."""
    cols = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).hint("merge").join(
        spark.table(right_table), cols, how
    )
