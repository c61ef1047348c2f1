"""Graph analytics over edge DataFrames (extension surface — the
reference has no graph queries; these complement ``dedup.py``'s
connected components with a ranking primitive).

PageRank here is the FIXED-ITERATION formulation: a known, small
number of power-iteration steps unrolled into one declarative plan.
That choice is deliberate twice over:

- at scale each step is exactly one shuffle keyed by the destination
  node (contributions aggregate map-side first), and the rank table
  — one row per node — is orders of magnitude smaller than the edge
  table, so AQE broadcasts it under the join whenever it fits;
  nothing in the loop touches the driver;
- a fixed step count makes the whole computation expressible as
  chained SQL CTEs, so the query carries a full DuckDB value oracle —
  convergence-loop PageRank (iterate until delta < eps) cannot be
  value-checked that way.

For convergence-style runs, call ``pagerank`` with a higher
``iterations``; each step's lineage is O(iterations), so checkpoint
every ~10 steps if you push it far (same pattern as
``dedup.connected_components``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from .materialize import pin


def pagerank(
    edges: DataFrame,
    iterations: int = 3,
    damping: float = 0.85,
    src: str = "src",
    dst: str = "dst",
    materialize: bool = True,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list.

    Every node must appear as a source (true for symmetrized edge
    lists like co-occurrence graphs; dangling-node mass is therefore
    zero and the per-step formula is exact, not approximate).

    ``materialize`` localCheckpoints the degree-annotated edge table
    once before iterating (same pattern as
    ``dedup.connected_components``): without it, every iteration
    re-derives the edges from source — 3x the scans and shuffles for
    a 3-step run, and unbounded lineage growth for long runs. Pass
    False only when the caller already cached/checkpointed edges.

    Returns (node, pr) — pr summing to ~1 across nodes.
    """
    e = edges.select(F.col(src).alias("_s"), F.col(dst).alias("_d"))
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    contrib_base = e.join(outdeg, "_s")
    if materialize:
        # r13 (guide §2.3/§2.4): cluster the materialized edge table
        # by the join key ONCE, before the checkpoint. NOTE the
        # PySpark localCheckpoint does NOT carry partitioning/ordering
        # metadata into the plan (the scan reports
        # UnknownPartitioning) — the win is the physical LAYOUT:
        # every key's rows sit in one partition as a sorted run, so
        # map-side partial aggregation keyed on _s collapses to one
        # row per key before any exchange, and downstream sorts see
        # presorted runs. Measured on the 3-step sf0.1 co-purchase
        # bench: -30% vs the same checkpoint without the clustering
        # (1.93s -> 1.34s save, 7.07s -> 6.08s total), output
        # hash-identical.
        contrib_base = (
            contrib_base.repartition("_s")
            .sortWithinPartitions("_s")
            .transform(pin)
        )
        # _deg is functionally dependent on _s, so first() per key ==
        # distinct(); keyed on the clustered _s the partial aggregate
        # ships exactly one row per node (distinct on (_s, _deg)
        # would shuffle the wider pair with no such collapse).
        outdeg = contrib_base.groupBy("_s").agg(
            F.first("_deg").alias("_deg")
        )
    n_nodes = outdeg.agg(F.count("*").alias("_n"))
    if materialize:
        # one-row scalar, re-read by pr0 + every iteration — pin it
        # so the distinct+count subtree isn't recomputed 4x per run
        n_nodes = n_nodes.transform(pin)

    # rank_0 = 1/N for every node; the scalar N rides along as a
    # broadcast one-row cross join (never a collect)
    pr = outdeg.crossJoin(n_nodes).select(
        F.col("_s").alias("node"), (F.lit(1.0) / F.col("_n")).alias("pr")
    )
    for _ in range(iterations):
        pr = (
            contrib_base.join(pr, F.col("_s") == F.col("node"))
            .groupBy(F.col("_d"))
            .agg(F.sum(F.col("pr") / F.col("_deg")).alias("_in"))
            .crossJoin(n_nodes)
            .select(
                F.col("_d").alias("node"),
                (
                    (1.0 - damping) / F.col("_n")
                    + F.lit(damping) * F.col("_in")
                ).alias("pr"),
            )
        )
    return pr


def copurchase_edges(
    lineitem: DataFrame, key: str = "l_orderkey", item: str = "l_partkey"
) -> DataFrame:
    """Symmetric distinct co-occurrence edges: items sharing a basket.

    Self-join co-located on the basket key (one shuffle each side —
    bucketing lineitem by order key makes it exchange-free), distinct
    by (src, dst). Baskets are bounded (lines per order), so the
    output is linear in input, never quadratic in the catalog.
    """
    a = lineitem.select(
        F.col(key).alias("_k"), F.col(item).alias("src")
    )
    b = lineitem.select(F.col(key).alias("_k"), F.col(item).alias("dst"))
    return (
        a.join(b, "_k")
        .filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle counts over an undirected edge list — the
    clustering-coefficient numerator (community density, spam/bot
    subgraph detection).

    Degree-oriented enumeration (the standard O(m^1.5) scheme): every
    undirected edge is directed from its lower-(degree, id) endpoint
    to the higher one, wedges come from a self-join on the shared
    source, and a second equi-join closes them against the oriented
    edge set. Each triangle is counted exactly once — at its unique
    minimum-(degree, id) vertex — and wedge fan-out is bounded by the
    arboricity instead of Σ deg² (id-only orientation ground to GC
    pressure on the sf0.1 co-purchase graph; degree orientation is
    what makes the power-law case tractable). All equi-joins on node
    keys; no cartesian anywhere; output is identical to any other
    orientation because orientation only changes WHERE a triangle is
    enumerated, never whether.

    Returns (node, triangles), nodes with ≥1 triangle only.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    # r13: und feeds deg (twice, via the union) AND ranked — pin it so
    # the distinct runs once, not 3x; deg itself is joined for both
    # endpoints, so pin it too (each join side still shuffles the
    # small (n, d) table by its own key, as it must).
    und = und.transform(pin)
    deg = (
        und.select(F.col("u").alias("n"))
        .unionAll(und.select(F.col("v").alias("n")))
        .groupBy("n")
        .agg(F.count("*").alias("d"))
        .transform(pin)
    )
    ranked = (
        und.join(deg.withColumnRenamed("n", "u").withColumnRenamed("d", "du"), "u")
        .join(deg.withColumnRenamed("n", "v").withColumnRenamed("d", "dv"), "v")
    )
    lower_first = (F.col("du") < F.col("dv")) | (
        (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
    )
    oriented = ranked.select(
        F.when(lower_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(lower_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(lower_first, F.col("dv")).otherwise(F.col("du")).alias("dt"),
    )
    # reused 3x below; r13: materialized clustered by the wedge key —
    # the checkpoint pins the orientation compute (it previously ran
    # once per consumer; ReusedExchange never fires for these
    # identical subtrees), and the (s)-clustered sorted layout feeds
    # the wedge SMJ's per-partition sorts presorted runs. (PySpark's
    # localCheckpoint does NOT carry partitioning metadata into the
    # plan, so the join still plans its own exchanges — layout, not
    # plan shape, is what this buys.)
    oriented = (
        oriented.repartition("s")
        .sortWithinPartitions("s")
        .transform(pin)
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    wedge = (
        e1.join(e2, F.col("e1.s") == F.col("e2.s"))
        .filter(
            (F.col("e1.dt") < F.col("e2.dt"))
            | (
                (F.col("e1.dt") == F.col("e2.dt"))
                & (F.col("e1.t") < F.col("e2.t"))
            )
        )
        .select(
            F.col("e1.s").alias("a"),
            F.col("e1.t").alias("b"),
            F.col("e2.t").alias("c"),
        )
    )
    tri = wedge.join(
        oriented.alias("e3"),
        (F.col("b") == F.col("e3.s")) & (F.col("c") == F.col("e3.t")),
    ).select("a", "b", "c")
    # r13: the corners union reads tri 3x — without a pin the ENTIRE
    # enumeration (wedge self-join + closing join, the expensive part
    # of the whole operator) re-ran per corner column (verified in the
    # executed plan: 3 copies of both joins). Materialize once.
    tri = tri.transform(pin)
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))
