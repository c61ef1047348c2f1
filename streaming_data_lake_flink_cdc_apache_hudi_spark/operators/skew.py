"""Skew-mitigation operators: salted join and salted distinct-count.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`,
on by default in the engine config) is the first line of defense and
needs no code. These operators cover the two cases AQE does NOT fix:

- ``salted_join``: a sort-merge join where ONE probe key is so hot
  that even a split partition is dominated by it, and the build side
  is too big to broadcast. Salting replicates each build row
  ``n_salts`` times and spreads the probe side's hot key over
  ``n_salts`` subpartitions — turning one straggler task into
  ``n_salts`` parallel ones at the cost of an ``n_salts``-times
  larger build shuffle. Use ONLY for diagnosed skew; the default
  engine path stays the plain equi-join.
- ``salted_distinct_count``: an exact COUNT(DISTINCT v) GROUP BY k
  where one group's distinct set is too large for a single task's
  aggregation hash table. Values are pre-bucketed by hash(v), so each
  task deduplicates a DISJOINT slice of the hot group and the final
  per-key merge only sums ``n_salts`` partial counts. (Plain
  count_distinct is fine for non-skewed data — Spark expands it to a
  two-phase plan itself; this version fixes the single-hot-group
  case. The approximate alternative is approx_count_distinct/HLL —
  plans/queries.py approx_sketches.)

Both are deterministic: the salt comes from a hash of data columns
(never ``rand()``), so retried tasks and resumed runs reproduce the
same partitioning.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _salt_col(cols: Sequence[str], n_salts: int):
    h = F.xxhash64(*[F.col(c) for c in cols])
    return F.pmod(h, F.lit(n_salts)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    salt_source: Sequence[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact`` (skewed side) to ``dim`` (replicated side)
    on ``on``, spreading each fact key over ``n_salts`` shuffle
    subpartitions.

    ``salt_source`` names the fact columns the salt is hashed from
    (default: all non-join columns is wrong — it must be columns that
    VARY within the hot key, e.g. the fact's unique id / timestamp;
    required). Supports ``inner`` and ``left`` (each fact row carries
    exactly one salt, so multiplicity is preserved; right/full would
    double-count unmatched dim rows across replicas and are rejected).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left'")
    if not salt_source:
        raise ValueError("salt_source: fact columns to derive the salt from")
    f2 = fact.withColumn("_salt", _salt_col(salt_source, n_salts))
    d2 = dim.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return f2.join(d2, [*on, "_salt"], how).drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group_cols: Sequence[str],
    distinct_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-group distinct count that stays parallel under a hot
    group: values are bucketed by hash(value) %% n_salts, each
    (group, bucket) deduplicates its disjoint value slice, and the
    final merge sums the ``n_salts`` partial counts per group. Output:
    group_cols + ``n_distinct``. Three linear shuffles, none keyed on
    the bare hot group until the last (n_salts-row-per-group) merge.
    """
    g = list(group_cols)
    per_bucket = (
        df.select(*g, F.col(distinct_col).alias("_v"))
        .withColumn("_salt", _salt_col(["_v"], n_salts))
        .groupBy(*g, "_salt")
        .agg(F.count_distinct("_v").alias("_part"))
    )
    return per_bucket.groupBy(*g).agg(
        F.sum("_part").alias("n_distinct")
    )
