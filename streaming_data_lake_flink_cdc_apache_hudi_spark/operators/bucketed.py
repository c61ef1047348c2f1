"""Bucketed (co-located) joins — the zero-shuffle path for repeated
big⋈big joins at 100 TB.

A shuffle join moves BOTH sides over the network every time it runs.
When two fact tables are joined on the same key repeatedly (the
flagship's ticket⋈hist shape, or any fact⋈fact pipeline), writing
them bucketed on the join key — `bucketBy(n, key)` + `sortBy` —
persists the hash partitioning in the table layout: every later join
reads matching buckets pairwise and merge-joins them in place. One
write-time shuffle amortized over every subsequent join; the plan
shows a SortMergeJoin with NO Exchange on either side
(`tests/test_plans.py::test_cobucketed_join_has_no_exchange`).

Spark-first notes:
- `bucketBy` requires a catalog table (`saveAsTable`); Spark's
  in-memory session catalog + a warehouse dir is enough locally, a
  Hive/Glue metastore serves the same role on a cluster.
- Both sides must agree on bucket COUNT and KEY for exchange
  elision; `spark.sql.sources.bucketing.enabled` is on by default.
- `UpsertLakeTable` applies the same idea to its own layout (hash
  buckets on the key); this module is the vanilla-Spark flavor for
  plain analytic tables.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | Sequence[str],
    num_buckets: int = 16,
    sort_cols: str | Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed catalog table: one shuffle now,
    none on any future join/aggregation keyed on ``bucket_cols``."""
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else list(bucket_cols)
    sort_cols = (
        bucket_cols
        if sort_cols is None
        else ([sort_cols] if isinstance(sort_cols, str) else list(sort_cols))
    )
    (
        df.write.mode(mode)
        .format("parquet")
        .bucketBy(num_buckets, *bucket_cols)
        .sortBy(*sort_cols)
        .saveAsTable(table_name)
    )


def cobucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str | Sequence[str],
    how: str = "inner",
) -> DataFrame:
    """Join two co-bucketed catalog tables on (a prefix of) their
    bucket key. With matching bucket layouts Catalyst elides both
    exchanges — the join is bucket-local."""
    return spark.table(left_table).join(
        spark.table(right_table), on=[on] if isinstance(on, str) else list(on), how=how
    )
