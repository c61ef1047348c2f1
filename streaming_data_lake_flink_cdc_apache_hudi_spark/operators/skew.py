"""Skew-handling join helpers (100 TB concern; SURVEY.md build brief).

AQE's skew-join splitting (enabled in EngineConfig) handles most
skew at runtime. ``salted_join`` is the explicit fallback for the
pathological case AQE can't fix: a single hot key on BOTH sides of a
shuffle join (AQE can split a skewed partition of one side, but the
matching build side still concentrates).

Mechanics: the skewed (large) side gets a random salt in [0, S); the
small side is exploded S× with every salt value; the join key becomes
(key, salt). Each hot key now spreads across S reducers at the cost
of replicating the other side S times — the classic trade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    skewed: DataFrame,
    other: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
) -> DataFrame:
    """Equi-join ``skewed`` ⋈ ``other`` on column ``on`` with salting.

    ``other`` is replicated ``salt_buckets`` times — keep it the
    smaller input. Deterministic salt (hash of all columns) so
    retries/replays place rows identically.

    ``how`` is restricted to joins whose output is row-preserving for
    the replicated side: with right/full outer, every unmatched
    ``other`` row would be emitted once per salt (duplicates).
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        raise ValueError(
            f"salted_join supports inner/left_outer/left_semi, got how={how!r}: "
            "right/full outer would duplicate unmatched replicated rows "
            "salt_buckets times"
        )
    skew_salted = skewed.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in skewed.columns]),
            F.lit(salt_buckets),
        ).cast("int"),
    )
    other_rep = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)]))
    )
    out = skew_salted.join(other_rep, [on, "_salt"], how)
    return out.drop("_salt")


def salted_distinct_count(
    df: DataFrame,
    group_cols,
    distinct_col: str,
    n_salts: int = 16,
) -> DataFrame:
    """Exact per-group COUNT(DISTINCT v) that stays parallel under a
    hot group — the aggregation-side sibling of ``salted_join``.

    Plain count_distinct is fine for balanced data (Spark expands it
    to a two-phase plan itself), but ONE group whose distinct set
    exceeds a task's aggregation hash table still serializes on that
    task. Here values are pre-bucketed by hash(value) % n_salts, so
    each (group, bucket) task deduplicates a DISJOINT slice of the hot
    group's values and the final merge per group only sums
    ``n_salts`` bounded partial counts. Deterministic (salt is a hash
    of the value, never rand()), exact by construction — the
    approximate alternative at 100 TB is approx_count_distinct/HLL
    (plans/queries.py approx_sketches). Output: group_cols +
    ``n_distinct``.
    """
    g = [group_cols] if isinstance(group_cols, str) else list(group_cols)
    per_bucket = (
        df.select(*g, F.col(distinct_col).alias("_v"))
        .withColumn(
            "_salt", F.pmod(F.xxhash64("_v"), F.lit(n_salts)).cast("int")
        )
        .groupBy(*g, "_salt")
        .agg(F.count_distinct("_v").alias("_part"))
    )
    return per_bucket.groupBy(*g).agg(F.sum("_part").alias("n_distinct"))
