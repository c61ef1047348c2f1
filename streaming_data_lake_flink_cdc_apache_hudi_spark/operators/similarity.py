"""Similarity search over embedding columns (SURVEY.md §7 Phase 4):
brute-force cosine top-k as the exact baseline, and a sign-LSH
bucketed approximate variant as the scale path.

Scale notes:
- brute-force: one broadcast of the query vector(s), a map-only
  cosine computation, then TakeOrderedAndProject (per-partition
  top-k, driver merges k·p rows — never a full sort).
- multi-query: broadcast the query set, per-partition partial top-k
  per query via window rank after a broadcast cross join — shuffle
  is k·|queries| rows only.
- LSH variant: probe only matching (or neighboring) buckets —
  candidates shrink by ~2^planes; recall is tunable via
  multi-probe (hamming-1 bucket expansion).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V


def cosine_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Exact top-k by cosine against a single query vector.

    ``query_vec``: one-row DataFrame with column ``qv`` (array).
    Returns (id, cos_sim) with deterministic (rounded sim desc, id)
    ordering.
    """
    joined = df.crossJoin(F.broadcast(query_vec))
    cos = V.cosine(
        V.as_double(F.col(vec_col)), V.as_double(F.col("qv"))
    )
    return (
        joined.select(
            F.col(id_col), F.round(cos, 4).alias("cos_sim")
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_multi(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    k: int = 10,
) -> DataFrame:
    """Exact top-k per query vector (broadcast cross join + window
    rank). Output: (query_id, id, cos_sim, rank)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            V.as_double(F.col(query_vec_col)).alias("_qv"),
        )
    )
    joined = df.select(
        F.col(id_col).alias("_id"), V.as_double(F.col(vec_col)).alias("_v")
    ).crossJoin(q)
    scored = joined.select(
        "_qid",
        "_id",
        F.round(V.cosine(F.col("_v"), F.col("_qv")), 4).alias("cos_sim"),
    )
    w = Window.partitionBy("_qid").orderBy(
        F.col("cos_sim").desc(), F.col("_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col("_qid").alias(query_id_col),
            F.col("_id").alias(id_col),
            "cos_sim",
            "rank",
        )
    )


def lsh_ann_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: DataFrame,
    k: int = 10,
    n_planes: int = 8,
    dim: int = 64,
    seed: int = 42,
    multi_probe: bool = True,
) -> DataFrame:
    """Approximate top-k: probe the query's sign-LSH bucket (plus all
    hamming-1 neighbor buckets when ``multi_probe``) and rank only
    those candidates. At scale the bucket column is precomputed and
    the table is partitioned by it → the probe reads a few partitions
    instead of the corpus."""
    planes = V.random_hyperplanes(dim, n_planes, seed)
    base = df.select(
        F.col(id_col),
        F.col(vec_col),
        V.lsh_bucket(F.col(vec_col), planes).alias("_bkt"),
    )
    q = query_vec.select(
        "qv", V.lsh_bucket(F.col("qv"), planes).alias("_qbkt")
    )
    if multi_probe:
        probes = F.array(
            F.col("_qbkt"),
            *[F.col("_qbkt").bitwiseXOR(F.lit(1 << i)) for i in range(n_planes)],
        )
        q = q.select("qv", F.explode(probes).alias("_qbkt"))
    cand = base.join(F.broadcast(q), base["_bkt"] == q["_qbkt"])
    cos = V.cosine(V.as_double(F.col(vec_col)), V.as_double(F.col("qv")))
    return (
        cand.select(F.col(id_col), F.round(cos, 4).alias("cos_sim"))
        .dropDuplicates([id_col])
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroid_sample_seed: int = 42,
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize vectors to their
    nearest centroid (inverted lists), then rank only the lists the
    query probes.

    Centroids are a deterministic sample of the corpus (hash-ranked —
    cheap and stable; a k-means refinement would slot in here without
    changing the query shape). Assignment = argmax of centroid dot
    products via ``max_by`` over a posexploded dot array — all
    JVM-side. At scale the corpus is written partitioned by
    ``_list_id`` so a probe reads n_probe/n_centroids of the data.
    """
    # deterministic centroid sample: top-n_centroids by hashed id.
    # orderBy().limit() plans as TakeOrderedAndProject — each partition
    # keeps its local top-n and the driver merges n·p rows. (A global
    # Window.orderBy + row_number here would funnel the WHOLE corpus
    # through one task — fatal at scale.)
    cents = (
        df.select(F.col(id_col).alias("_cid"), V.as_double(F.col(vec_col)).alias("_cv"))
        .orderBy(F.xxhash64(F.col("_cid"), F.lit(centroid_sample_seed)))
        .limit(n_centroids)
    )
    cents = F.broadcast(cents.groupBy().agg(
        F.collect_list(F.struct("_cid", "_cv")).alias("_cents")
    ))

    def nearest_lists(vec, n: int):
        # dots: array of (list_id, dot) structs over the centroid set
        dots = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                c["_cid"].alias("list_id"),
                V.dot(vec, c["_cv"]).alias("dot"),
            ),
        )
        ranked = F.reverse(F.array_sort(
            F.transform(dots, lambda d: F.struct(d["dot"].alias("dot"),
                                                 d["list_id"].alias("list_id")))
        ))
        return F.slice(ranked, 1, n)

    base = (
        df.crossJoin(cents)
        .select(
            F.col(id_col),
            F.col(vec_col),
            nearest_lists(V.as_double(F.col(vec_col)), 1)[0]["list_id"].alias(
                "_list_id"
            ),
        )
    )
    q = (
        query_vec.crossJoin(cents)
        .select(
            "qv",
            F.explode(
                F.transform(
                    nearest_lists(V.as_double(F.col("qv")), n_probe),
                    lambda s: s["list_id"],
                )
            ).alias("_list_id"),
        )
    )
    cand = base.join(F.broadcast(q), "_list_id")
    cos = V.cosine(V.as_double(F.col(vec_col)), V.as_double(F.col("qv")))
    return (
        cand.select(F.col(id_col), F.round(cos, 4).alias("cos_sim"))
        .dropDuplicates([id_col])
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )
