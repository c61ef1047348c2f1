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
        contrib_base = contrib_base.localCheckpoint(eager=True)
        outdeg = contrib_base.select("_s", "_deg").distinct()
    n_nodes = outdeg.agg(F.count("*").alias("_n"))

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

    Shape: canonicalize each edge to (u < v) and dedup, enumerate
    wedges by self-joining on the shared lower endpoint (u; v < w
    keeps each candidate once), close them against the edge set with
    a second equi-join, then one explode-free union-all rollup
    crediting all three corners. Every join is an equi-join on node
    keys — 3 linear shuffles total, no cartesian anywhere; each
    triangle is enumerated exactly once (a < b < c). Wedge fan-out is
    Σ deg(u)² on the canonical orientation; for power-law graphs at
    real scale, pre-orient edges from lower- to higher-DEGREE
    endpoints instead of lower id (same plan, bounds the quadratic
    term by the arboricity) — id order keeps this oracle-exact here.

    Returns (node, triangles), nodes with ≥1 triangle only.
    """
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("u"),
            F.greatest(F.col(src), F.col(dst)).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    e = e.localCheckpoint(eager=True)  # reused three times below
    wedge = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .filter(F.col("e1.v") < F.col("e2.v"))
        .select(
            F.col("e1.u").alias("a"),
            F.col("e1.v").alias("b"),
            F.col("e2.v").alias("c"),
        )
    )
    tri = wedge.join(
        e.alias("e3"),
        (F.col("b") == F.col("e3.u")) & (F.col("c") == F.col("e3.v")),
    ).select("a", "b", "c")
    corners = (
        tri.select(F.col("a").alias("node"))
        .unionAll(tri.select(F.col("b").alias("node")))
        .unionAll(tri.select(F.col("c").alias("node")))
    )
    return corners.groupBy("node").agg(F.count("*").alias("triangles"))
