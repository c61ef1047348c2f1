"""Table profiling: per-column stats (count / nulls / distinct /
min / max) in ONE scan — the engine-side equivalent of the Glue/Hive
``ANALYZE TABLE ... COMPUTE STATISTICS FOR COLUMNS`` surface the
reference gets from its catalog (SURVEY.md §2.1 S9 maps the Glue
table to DDL; stats are the half Glue computes crawler-side).

Scale shape: all metrics for all columns are partial-aggregated in a
single pass (one map + one tiny all-to-one agg of a fixed-width row —
bytes, not data); the per-column rows are unpivoted from that single
aggregated row with ``stack``, driver-free. ``exact_distinct=False``
(default) uses HyperLogLog++ ``approx_count_distinct`` — the only
choice at 100 TB; exact mode exists for oracle parity at test scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(
    df: DataFrame,
    cols: list[str] | None = None,
    exact_distinct: bool = False,
) -> DataFrame:
    """One row per profiled column: ``(column, n_rows, n_nulls,
    n_distinct, min_val, max_val)`` with min/max rendered as strings
    so mixed-type columns share one schema."""
    cols = cols or df.columns
    aggs = []
    for c in cols:
        col = F.col(c)
        distinct = (
            F.count_distinct(col)
            if exact_distinct
            else F.approx_count_distinct(col)
        )
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(col.isNull().cast("long")).alias(f"{c}__nulls"),
            distinct.alias(f"{c}__distinct"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__rows`, `{c}__nulls`, `{c}__distinct`, "
        f"`{c}__min`, `{c}__max`"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_nulls, n_distinct, min_val, max_val)"
    )
