"""Keyed-upsert / last-write-wins semantics (SURVEY.md §2.2 R11).

This is the core semantic of the reference's Hudi tables: a PRIMARY
KEY declared NOT ENFORCED (CDC-Hudi-Notebook.zpln:292 ¶7, :2234 ¶51)
means writes with an existing key REPLACE the prior row — verified by
the notebook's upsert demo (¶13 re-insert of key id1 → ¶15 shows only
the new row) and the no-duplicates check (¶61, zero rows with
count>1).

Spark-first implementation: a window ranked by the precedence
columns, keep rank 1. At scale this is a single hash shuffle on the
key — the same shuffle an aggregation would need, no extra pass.
Ties must be impossible: callers pass enough ``order_by`` columns to
make precedence total (FIXTURES.md F6 ``seq`` exists for exactly
this).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cols(cols: str | Sequence[str]) -> list[str]:
    return [cols] if isinstance(cols, str) else list(cols)


def latest_by_key(
    df: DataFrame,
    key: str | Sequence[str],
    order_by: str | Sequence[str],
) -> DataFrame:
    """One row per key: the row with the greatest ``order_by`` tuple.

    ≙ Hudi's precombine semantics (latest ts wins). ``order_by``
    must be a total order within each key for determinism.
    """
    keys = _cols(key)
    order = [F.col(c).desc_nulls_last() for c in _cols(order_by)]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def upsert_batch(
    current: DataFrame | None,
    delta: DataFrame,
    key: str | Sequence[str],
    order_by: str | Sequence[str],
) -> DataFrame:
    """MERGE a delta into the current table state, latest write wins.

    Batch equivalent of the Hudi sink's keyed upsert (S3). With
    ``current=None`` this is just dedup of the delta. The union
    keeps column order of ``current``; both sides must share schema.
    """
    merged = delta if current is None else current.unionByName(delta)
    return latest_by_key(merged, key, order_by)
