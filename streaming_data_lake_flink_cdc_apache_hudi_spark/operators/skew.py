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
