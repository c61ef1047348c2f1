"""Gap-filled time-series rollup (dense "hypertable" rollup): bucket
events into fixed windows per series, then fill EVERY bucket between
each series' first and last observation — absent buckets appear with
fill values instead of silently missing (the property dashboards and
downstream ML featurizers need).

Scale shape (100 TB):
- the rollup is one partial-aggregated groupBy over the raw events
  (the only scan of the data);
- the per-series bounds table is one tiny agg over the rollup
  (rows = number of series);
- the dense spine is ``sequence(lo, hi, step)`` + ``explode`` over
  the bounds table — generated in-plan on executors, never a driver
  loop. Each series materializes range/step bucket entries (e.g. a
  year of 5-minute buckets is ~105k — one array per series row;
  document/bound the step accordingly);
- the final left join keys on (series, bucket): shuffle volume is
  the rollup + spine cardinality, never the raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.column import Column


def gap_filled_rollup(
    df: DataFrame,
    ts_col: str,
    series_cols: list[str],
    bucket_width: str,
    aggs: dict[str, Column],
    fills: dict[str, object],
) -> DataFrame:
    """Dense per-series rollup: ``aggs`` computed per
    (series, bucket); every bucket in [min, max] per series present,
    missing ones taking ``fills``.

    ``bucket_width`` is a Spark interval string ("5 minutes"); bucket
    boundaries come from ``F.window`` so they match
    ``time_bucket``-style truncation.
    """
    bucket = F.window(F.col(ts_col), bucket_width).getField("start")
    rollup = (
        df.groupBy(*series_cols, bucket.alias("bucket"))
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )
    bounds = rollup.groupBy(*series_cols).agg(
        F.min("bucket").alias("_lo"), F.max("bucket").alias("_hi")
    )
    spine = bounds.select(
        *series_cols,
        F.explode(
            F.sequence(
                F.col("_lo"), F.col("_hi"), F.expr(f"interval {bucket_width}")
            )
        ).alias("bucket"),
    )
    filled = spine.join(rollup, [*series_cols, "bucket"], "left")
    for n in aggs:
        filled = filled.withColumn(n, F.coalesce(F.col(n), F.lit(fills[n])))
    return filled
