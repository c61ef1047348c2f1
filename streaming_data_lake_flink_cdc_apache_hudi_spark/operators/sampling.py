"""Deterministic sampling and sequence packing for training-data
pipelines (extension surface — the reference exposes nothing like
this; mandated by the build brief's LLM-pipeline operator set).

Why hash-based sampling (not ``df.sample``): training-data curation
needs samples that are REPRODUCIBLE across engines, runs, and
partitionings — ``rand()``-based sampling changes membership whenever
the partition layout changes. Keying the keep-decision off
``md5(id)`` gives every row a stable coin flip: the same row is
always in or out at a given rate, rates compose monotonically
(a 10% sample is a subset of the 50% sample), and the exact same
predicate runs in any SQL engine (md5 is everywhere) — so the DuckDB
oracle checks membership bit-for-bit.

Scale notes:
- sampling is a map-only filter (no shuffle, no state); it pushes
  into the scan like any other predicate.
- ``concat_chunk_pack`` is the GPT-style concat-and-chunk packing:
  lay all documents end-to-end in a deterministic order, cut every
  ``capacity`` tokens. One windowed pass — a per-group sort, no
  joins, no iteration. Partition by shard/stratum (``partition_col``)
  so each group packs independently in its own task; a global pack
  order (partition_col=None) funnels the sort through one task and
  is only for small inputs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

HEX_SPACE = 16**8  # keep-threshold resolution: first 8 md5 hex chars


def hash_keep(id_col: Column, rate: float) -> Column:
    """Deterministic per-row keep predicate at the given rate: the
    row's md5 prefix (uniform over the hex space) is compared against
    the rate threshold. Same literal threshold string works in any
    engine with md5 — lexicographic compare of fixed-width lowercase
    hex == numeric compare."""
    if rate >= 1.0:
        return F.lit(True)
    if rate <= 0.0:
        return F.lit(False)
    thr = format(int(rate * HEX_SPACE), "08x")
    return F.substring(F.md5(id_col.cast("string")), 1, 8) < F.lit(thr)


def hash_keep_threshold(rate: float) -> str:
    """The 8-hex-char threshold for ``rate`` — exported so oracle SQL
    is generated from the identical constant."""
    return format(int(rate * HEX_SPACE), "08x")


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling: each stratum (language,
    source, quality band, ...) keeps its own fraction — the data-mixing
    primitive for training corpora (e.g. upsample low-resource
    languages, downsample boilerplate-heavy sources)."""
    pred = hash_keep(F.col(id_col), default_rate)
    for stratum, rate in rates.items():
        pred = F.when(
            F.col(stratum_col) == stratum, hash_keep(F.col(id_col), rate)
        ).otherwise(pred)
    return df.filter(pred)


def concat_chunk_pack(
    df: DataFrame,
    token_count_col: str,
    order_col: str,
    capacity: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid end to
    end in ``order_col`` order (within each ``partition_col`` group)
    and cut into fixed ``capacity``-token chunks. Adds:

    - ``start_off``: the document's first token's offset in the
      concatenated stream (exclusive running sum);
    - ``first_chunk`` / ``n_chunks``: which chunk the document starts
      in and how many chunks it spans (a document may straddle a
      boundary — that is the point of concat-and-chunk packing; use
      the offsets to slice).

    All bigint, all one window — the oracle is the same three
    expressions in ANSI SQL."""
    w = (
        Window.partitionBy(partition_col) if partition_col else Window
    ).orderBy(order_col)
    start = F.coalesce(
        F.sum(F.col(token_count_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0).cast("long"),
    )
    out = df.withColumn("start_off", start)
    first = F.floor(F.col("start_off") / capacity)
    last = F.floor(
        (F.col("start_off") + F.col(token_count_col).cast("long") - 1)
        / capacity
    )
    return out.withColumn("first_chunk", first).withColumn(
        "n_chunks", last - first + F.lit(1).cast("long")
    )


def mixture_resample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    budget: int,
    temperature: float = 0.5,
) -> DataFrame:
    """Temperature-based corpus mixing: resample strata toward the
    flattened distribution w_s ∝ n_s^τ (τ<1 upweights low-resource
    strata — the standard multilingual-corpus rebalancing), keeping
    an expected ``budget`` documents total, never replicating
    (per-stratum rate capped at 1).

    Everything stays in the plan — per-stratum counts and rates are
    computed as a tiny aggregate joined back by broadcast, and the
    keep-decision is the same md5-threshold coin as ``hash_keep``,
    so membership is deterministic, layout-independent, and exactly
    reproducible in the DuckDB oracle. Shape at 100 TB: one partial
    agg over the corpus (counts), a broadcast join of |strata| rows,
    then a map-only filter.

    Rates are rounded to 6 decimals before thresholding so the
    engine's and the oracle's floating sums agree bit-for-bit.
    """
    counts = df.groupBy(stratum_col).agg(F.count("*").alias("_n"))
    tot = counts.agg(
        F.sum(F.pow(F.col("_n").cast("double"), temperature)).alias("_tw")
    )
    rates = counts.crossJoin(F.broadcast(tot)).select(
        stratum_col,
        F.least(
            F.lit(1.0),
            F.round(
                F.pow(F.col("_n").cast("double"), temperature)
                / F.col("_tw")
                * budget
                / F.col("_n"),
                6,
            ),
        ).alias("_rate"),
    )
    thr = F.format_string(
        "%08x", F.floor(F.col("_rate") * F.lit(float(HEX_SPACE))).cast("long")
    )
    keyed = df.join(F.broadcast(rates), stratum_col)
    keep = (F.col("_rate") >= 1.0) | (
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 8) < thr
    )
    return keyed.filter(keep).drop("_rate")


def weighted_sample(
    df: DataFrame, id_col: str, weight_col, n: int, seed: str = ""
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis
    & Spirakis, IPL 2006 A-ES): each row draws u in (0,1] from its
    id's md5 hash and ranks by ln(u)/w — the top-n ranks are a
    weighted sample, rows with double the weight twice as likely.

    Deterministic like every sampler in this module (the hash, not
    the partition layout, decides), so the draw is reproducible
    across engines and re-runs, composes with re-partitioning, and
    carries an exact oracle. Scale: map-only scoring + a top-n
    (TakeOrderedAndProject) — no shuffle beyond the bounded top-n
    merge, never a global sort.
    """
    prefix = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))), 1, 8
        ),
        16,
        10,
    ).cast("double")
    u = (prefix + 1.0) / F.lit(float(2**32))
    w = weight_col if not isinstance(weight_col, str) else F.col(weight_col)
    score = F.log(u) / w  # in (-inf, 0]; larger (closer to 0) wins
    return (
        df.withColumn("_es_key", F.round(score, 10))
        .orderBy(F.col("_es_key").desc(), F.col(id_col))
        .limit(n)
        .drop("_es_key")
    )
