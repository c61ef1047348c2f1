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

import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V
from .materialize import pin


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


def hard_negative_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    label_col: str,
    queries: DataFrame,
    query_id_col: str,
    query_vec_col: str,
    query_label_col: str,
    k: int = 5,
) -> DataFrame:
    """Hard-negative mining for contrastive training: per query, the
    top-k most-similar corpus vectors whose label DIFFERS from the
    query's — the highest-cosine wrong-class examples are exactly the
    negatives that carry gradient signal (in-batch easy negatives
    don't). Same scale shape as :func:`cosine_topk_multi`: the query
    batch broadcasts, the corpus streams map-side through the scoring
    crossJoin, and the per-query window ranks k·|queries| survivors —
    never a corpus-sized sort. Output: (query_id, id, label, cos_sim,
    rank)."""
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("_qid"),
            F.col(query_label_col).alias("_qlabel"),
            V.as_double(F.col(query_vec_col)).alias("_qv"),
        )
    )
    scored = (
        df.select(
            F.col(id_col).alias("_id"),
            F.col(label_col).alias("_label"),
            V.as_double(F.col(vec_col)).alias("_v"),
        )
        .crossJoin(q)
        .filter(F.col("_label") != F.col("_qlabel"))
        .select(
            "_qid",
            "_id",
            "_label",
            F.round(V.cosine(F.col("_v"), F.col("_qv")), 4).alias("cos_sim"),
        )
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
            F.col("_label").alias(label_col),
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


def _normalize(v: list[float]) -> list[float]:
    import math

    n = math.sqrt(sum(x * x for x in v)) or 1.0
    return [x / n for x in v]


def kmeans_centroids(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    n_centroids: int = 16,
    n_iters: int = 2,
    seed: int = 42,
    train_limit: int | None = 65536,
) -> list[list[float]]:
    """Spherical k-means (Lloyd) centroid training for IVF, pure
    DataFrame ops — the refinement slot named in :func:`ivf_topk`.

    Scale shape (100 TB-safe by construction):
    - the training set is a deterministic hash-ranked sample of at
      most ``train_limit`` vectors (TakeOrderedAndProject — bounded
      driver merge, never a global sort), materialized once with
      ``localCheckpoint`` so iterations don't rescan the corpus (the
      local analog of writing a sample table);
    - assignment is map-only: centroids ride into the plan as broadcast
      literals, argmax over the dot products via ``array_max`` on a
      (dot, cid) struct array (deterministic tiebreak);
    - the recompute is posexplode → groupBy(cid, pos) with map-side
      partial aggregation, so each iteration's shuffle carries at most
      k·dim partials per task — never the vectors themselves;
    - the only driver-side state is the k×dim centroid matrix
      (bounded metadata, like ``bucket_filter_for``).

    Returns the k centroid vectors (unit-normalized — spherical
    k-means makes dot == cosine for assignment). Empty clusters keep
    their previous centroid."""
    vecs = df.select(
        F.col(id_col).alias("_id"), V.as_double(F.col(vec_col)).alias("_v")
    )
    if train_limit is not None:
        vecs = vecs.orderBy(F.xxhash64(F.col("_id"), F.lit(seed))).limit(
            train_limit
        )
    sample = vecs.transform(pin)
    # k-means++-style init: from a bounded hash-ranked pool, greedily
    # pick the vector farthest (min max-cosine) from those chosen so
    # far — random init can seed two centroids in one cluster and
    # leave another cluster uncovered, which Lloyd cannot repair.
    # Pool is O(k) rows collected to the driver — bounded metadata.
    pool_rows = (
        sample.orderBy(F.xxhash64(F.col("_id"), F.lit(seed + 1)))
        .limit(max(8 * n_centroids, 64))
        .collect()
    )
    pool = [_normalize(list(r["_v"])) for r in pool_rows]
    cents = pool[:1]
    while len(cents) < n_centroids and len(cents) < len(pool):
        best, best_score = None, None
        for v in pool:
            closeness = max(sum(a * b for a, b in zip(v, c)) for c in cents)
            if best_score is None or closeness < best_score:
                best, best_score = v, closeness
        cents.append(best)
    cents = cents[:n_centroids] or [[0.0]]
    for _ in range(max(0, n_iters)):
        cent_lit = F.array(
            *[
                F.struct(
                    F.array(*[F.lit(float(x)) for x in c]).alias("cv"),
                    F.lit(i).alias("cid"),
                )
                for i, c in enumerate(cents)
            ]
        )
        dots = F.transform(
            cent_lit,
            lambda c: F.struct(
                V.dot(F.col("_v"), c["cv"]).alias("dot"),
                c["cid"].alias("cid"),
            ),
        )
        assigned = sample.select(
            F.col("_v"), F.array_max(dots)["cid"].alias("_cid")
        )
        new_rows = (
            assigned.select("_cid", F.posexplode("_v"))
            .groupBy("_cid", "pos")
            .agg(F.sum("col").alias("s"), F.count("*").alias("n"))
            .withColumn("m", F.col("s") / F.col("n"))
            .groupBy("_cid")
            .agg(
                F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm")
            )
            .select(
                "_cid", F.transform("pm", lambda x: x["m"]).alias("_cv")
            )
            .collect()
        )
        by_cid = {r["_cid"]: _normalize(list(r["_cv"])) for r in new_rows}
        cents = [by_cid.get(i, cents[i]) for i in range(n_centroids)]
    return cents


def ivf_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    n_probe: int = 4,
    centroid_sample_seed: int = 42,
    refine_iters: int = 0,
    train_limit: int | None = 65536,
    hash_family: str = "fast",
) -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize vectors to their
    nearest centroid (inverted lists), then rank only the lists the
    query probes.

    Centroids are a deterministic sample of the corpus (hash-ranked —
    cheap and stable), optionally refined with ``refine_iters`` rounds
    of spherical k-means (:func:`kmeans_centroids` — tighter lists,
    better recall per probe, identical query shape). Assignment =
    argmax of centroid dot products via ``max_by`` over a posexploded
    dot array — all JVM-side. At scale the corpus is written
    partitioned by ``_list_id`` so a probe reads n_probe/n_centroids
    of the data.

    ``hash_family``: "fast" ranks the centroid sample by xxhash64;
    "portable" ranks by md5 of ``id || '-' || seed`` and rounds
    centroid dot products to 6 decimals before ranking lists, making
    centroid choice, list assignment, and probe selection — hence the
    whole pruned-probe result — reproducible in any SQL engine (the
    DuckDB oracle for ``ivf_ann_topk`` replays all three). Same plan
    shape either way.
    """
    if refine_iters > 0:
        trained = kmeans_centroids(
            df,
            vec_col,
            id_col,
            n_centroids=n_centroids,
            n_iters=refine_iters,
            seed=centroid_sample_seed,
            train_limit=train_limit,
        )
        cent_lit = F.array(
            *[
                F.struct(
                    F.lit(f"k{i}").alias("_cid"),
                    F.array(*[F.lit(float(x)) for x in c]).alias("_cv"),
                )
                for i, c in enumerate(trained)
            ]
        )
        cents = F.broadcast(
            df.sparkSession.range(1).select(cent_lit.alias("_cents"))
        )
    else:
        # deterministic centroid sample: top-n_centroids by hashed id.
        # orderBy().limit() plans as TakeOrderedAndProject — each
        # partition keeps its local top-n and the driver merges n·p
        # rows. (A global Window.orderBy + row_number here would funnel
        # the WHOLE corpus through one task — fatal at scale.)
        if hash_family == "portable":
            rank = F.md5(
                F.concat(F.col("_cid"), F.lit(f"-{centroid_sample_seed}"))
            )
        else:
            rank = F.xxhash64(F.col("_cid"), F.lit(centroid_sample_seed))
        sampled = (
            df.select(
                F.col(id_col).cast("string").alias("_cid"),
                V.as_double(F.col(vec_col)).alias("_cv"),
            )
            .orderBy(rank)
            .limit(n_centroids)
        )
        cents = F.broadcast(sampled.groupBy().agg(
            F.collect_list(F.struct("_cid", "_cv")).alias("_cents")
        ))

    def nearest_lists(vec, n: int):
        # dots: array of (list_id, dot) structs over the centroid set.
        # Portable family rounds to 6 decimals so cross-engine float
        # accumulation noise cannot flip a list ranking.
        def _dot(v, cv):
            d = V.dot(v, cv)
            return F.round(d, 6) if hash_family == "portable" else d

        dots = F.transform(
            F.col("_cents"),
            lambda c: F.struct(
                c["_cid"].alias("list_id"),
                _dot(vec, c["_cv"]).alias("dot"),
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


# ---------------------------------------------------------------------------
# IVF index at rest: corpus partitioned by inverted list
# ---------------------------------------------------------------------------


def write_ivf_index(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    path: str,
    n_centroids: int = 16,
    refine_iters: int = 2,
    train_limit: int | None = 65536,
    seed: int = 42,
    quantize: bool = False,
) -> list[list[float]]:
    """Materialize the IVF layout :func:`ivf_topk` only simulates:
    train centroids (spherical k-means), assign every vector to its
    inverted list, and write the corpus parquet-partitioned by
    ``_list_id`` with the centroid matrix stored alongside
    (``_centroids.json`` — underscore-prefixed, invisible to Spark
    file listings). A probe then reads n_probe/n_centroids of the
    data as a PARTITION-DIR filter — no scan of unprobed lists, the
    property that makes IVF pay at 100 TB. Returns the centroids.

    ``quantize=True`` stores int8 codes + per-vector scale in place of
    the raw floats (IVF-SQ8): 4x narrower logical element width (the
    on-disk ratio depends on parquet encoding — int8 is INT32-physical
    with bit-packing, so the win shows at real row counts, not toy
    files); probe reads self-describe and dequantize. The recall cost
    is bounded (int8 keeps >=8/10 of true top-10 — pinned in
    tests/test_curation.py and tests/test_dedup_similarity.py)."""
    import json
    import os

    cents = kmeans_centroids(
        df, vec_col, id_col,
        n_centroids=n_centroids, n_iters=refine_iters,
        seed=seed, train_limit=train_limit,
    )
    cent_lit = F.array(
        *[
            F.struct(
                F.array(*[F.lit(float(x)) for x in c]).alias("cv"),
                F.lit(i).alias("cid"),
            )
            for i, c in enumerate(cents)
        ]
    )
    dots = F.transform(
        cent_lit,
        lambda c: F.struct(
            V.dot(V.as_double(F.col(vec_col)), c["cv"]).alias("dot"),
            c["cid"].alias("cid"),
        ),
    )
    if quantize:
        # IVF-SQ8: store per-vector int8 codes + scale instead of the
        # raw floats — 4x smaller lists at rest (the standard IVF+SQ
        # recipe); the probe dequantizes on read. tinyint storage is
        # the honest 1-byte layout (codes are in [-127, 127]).
        scale = V.quantize_scale(F.col(vec_col))
        assigned = df.select(
            F.col(id_col),
            F.transform(
                V.quantize_int8(F.col(vec_col), scale),
                lambda x: x.cast("tinyint"),
            ).alias("_code"),
            scale.alias("_scale"),
            F.array_max(dots)["cid"].alias("_list_id"),
        )
    else:
        assigned = df.select(
            F.col(id_col),
            F.col(vec_col),
            F.array_max(dots)["cid"].alias("_list_id"),
        )
    assigned.write.mode("overwrite").partitionBy("_list_id").parquet(path)
    with open(os.path.join(path, "_centroids.json"), "w") as fh:
        json.dump(cents, fh)
    return cents


def ivf_probe_index(
    spark,
    path: str,
    query_vec: list[float],
    vec_col: str,
    id_col: str,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Query a :func:`write_ivf_index` layout: rank centroids against
    the query DRIVER-side (k×dim floats — metadata), then read only
    the probed ``_list_id=`` partition dirs (`isin` partition filter →
    dir pruning at the scan) and brute-force the survivors. Output
    matches :func:`ivf_topk`: (id, cos_sim) deterministic order."""
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as fh:
        cents = json.load(fh)
    scored = sorted(
        (
            (sum(a * b for a, b in zip(query_vec, c)), i)
            for i, c in enumerate(cents)
        ),
        reverse=True,
    )
    probes = [i for _, i in scored[:n_probe]]
    corpus = spark.read.option("basePath", path).parquet(path).filter(
        F.col("_list_id").isin(probes)
    )
    qv = F.array(*[F.lit(float(x)) for x in query_vec])
    if "_code" in corpus.columns:  # IVF-SQ8 layout: self-describing
        vec = V.dequantize(F.col("_code"), F.col("_scale"))
    else:
        vec = V.as_double(F.col(vec_col))
    cos = V.cosine(vec, V.as_double(qv))
    return (
        corpus.select(F.col(id_col), F.round(cos, 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


# --- product quantization (Jégou et al. TPAMI'11; FAISS IndexPQ shape) --
#
# Codebooks are a committed deterministic artifact from
# scripts/train_pq_codebooks.py (m=16 subspaces x k=16 codes over the
# 64-dim embeddings, trained on unit-normalized vectors so ADC L2
# ranking is cosine-equivalent) — the artifact-as-literal pattern
# (JL signs, classifier weights) that makes encode + asymmetric-
# distance scoring PURE column math with a full cross-engine oracle:
# no UDF, no join, no shuffle until the final top-k.
#
# Scale shape: encoding is map-only (16 candidate distances x 4
# subspaces inside whole-stage codegen per row); codes are m bytes a
# vector (16x compression of the float payload at m=16/k=16, the point of PQ at
# 100 TB); query scoring decodes NOTHING — it reads only the code
# column and folds m element_at lookups per row; top-k is
# TakeOrderedAndProject, never a global sort.

PQ_M, PQ_K = 16, 16
PQ_CODEBOOKS = [
  [
    [0.018217, 0.1588, -0.100844, -0.149068],
    [-0.003344, -0.148727, 0.100426, 0.100414],
    [0.034732, 0.040994, -0.185434, 0.087694],
    [0.014389, 0.008986, -0.009446, 0.174525],
    [-0.049854, -0.031558, 0.229417, -0.086352],
    [-0.179641, 0.076186, 0.048601, 0.038578],
    [0.022804, 0.076546, 0.153738, 0.040166],
    [-0.110313, -0.169283, 0.037266, -0.066783],
    [0.099812, -0.129457, -0.085168, -0.00398],
    [0.08445, 0.047881, -0.007577, -0.068206],
    [0.247148, -0.010599, 0.048929, 0.067754],
    [-0.072811, 0.021518, 0.03283, -0.137786],
    [-0.177908, -0.033847, -0.115864, 0.027502],
    [0.170545, -0.056639, 0.053988, -0.130858],
    [-0.076311, -0.067961, -0.150922, -0.135787],
    [0.005661, 0.244536, 0.030036, 0.013781],
  ],
  [
    [0.196038, -0.032051, -0.12483, 0.017761],
    [-0.007432, -0.124308, -0.12009, 0.016447],
    [0.042104, -0.03053, 0.091639, -0.15278],
    [0.137115, -0.091796, 0.070003, 0.046283],
    [0.094884, -0.20604, -0.05636, 0.160958],
    [-0.145172, 0.091752, -0.149865, -0.013911],
    [-0.151459, 0.134764, 0.074311, -0.017746],
    [-0.164936, -0.13861, 0.020278, 0.00115],
    [0.028827, -0.010433, -0.124629, 0.169389],
    [-0.08101, -0.019946, 0.075242, 0.141417],
    [-0.007769, -0.059671, 0.26042, 0.051648],
    [-0.00453, 0.049164, -0.023892, -0.039747],
    [0.087269, 0.152456, -0.212879, -0.053346],
    [0.000691, -0.087634, -0.098384, -0.225605],
    [0.134189, 0.153899, 0.103196, -0.087312],
    [0.048264, 0.146335, -0.005362, 0.160319],
  ],
  [
    [0.206703, 0.082796, 0.029644, 0.035013],
    [0.04509, -0.120141, 0.19424, 0.096773],
    [0.080748, -0.089536, -0.120186, -0.031289],
    [-0.026449, 0.224411, -0.01789, -0.020527],
    [0.046527, 0.1337, -0.11764, 0.136289],
    [-0.074335, 0.043258, -0.314995, 0.219172],
    [-0.187619, 0.249938, -0.086334, -0.204464],
    [-0.046084, 0.005366, -0.051758, -0.203172],
    [0.021561, 0.051173, 0.183926, -0.08892],
    [0.041561, -0.055997, 0.034273, 0.023252],
    [-0.11721, 0.129684, 0.075948, 0.154078],
    [-0.038708, -0.213892, 0.009753, -0.074293],
    [-0.14336, -0.02956, 0.102436, -0.051719],
    [0.137706, 0.026287, 0.000702, -0.140054],
    [-0.008652, -0.058294, -0.048663, 0.173665],
    [-0.150556, -0.044015, -0.133462, 0.008724],
  ],
  [
    [-0.186574, -0.064383, -0.042069, -0.003576],
    [-0.100269, 0.04456, -0.126219, 0.127498],
    [-0.135709, 0.023658, 0.156792, -0.033899],
    [-0.041895, 0.215869, 0.02398, -0.048128],
    [0.034833, 0.033439, 0.007764, 0.030114],
    [0.178882, 0.173682, -0.000864, 0.098937],
    [0.085409, -0.161928, 0.08383, -0.010709],
    [0.06297, -0.115089, -0.0827, 0.122055],
    [0.095362, 0.062813, 0.191141, 0.039509],
    [-0.092053, -0.277158, 0.106075, -0.043315],
    [0.076654, -0.01959, 0.076369, -0.168361],
    [-0.042576, 0.015123, -0.14252, -0.127225],
    [-0.117333, -0.108921, -0.038185, -0.165135],
    [0.281763, 0.034455, -0.074142, -0.188164],
    [-0.03516, 0.038125, 0.097886, 0.175235],
    [0.079783, 0.106724, -0.204094, 0.047969],
  ],
  [
    [0.046196, 0.108448, -0.066927, 0.124157],
    [0.026509, -0.194918, -0.114735, 0.115788],
    [-0.033855, -0.033429, 0.239294, 0.056249],
    [-0.104961, 0.007058, 0.021001, 0.150073],
    [-0.140185, 0.028834, 0.068735, -0.106601],
    [0.177261, 0.064971, -0.027745, -0.088766],
    [0.058174, 0.039667, 0.117442, -0.093844],
    [-0.007679, 0.113523, -0.057681, -0.205702],
    [-0.055367, -0.145446, 0.060017, 0.000893],
    [-0.136375, 0.162965, -0.051344, 0.040072],
    [-0.168419, -0.114853, -0.142261, -0.019324],
    [0.236705, -0.096976, -0.001148, 0.024279],
    [0.046743, -0.03631, -0.147867, 0.03457],
    [0.128169, 0.009325, 0.124725, 0.136981],
    [-0.002485, 0.221579, 0.039755, -0.047524],
    [0.072494, -0.1374, -0.050976, -0.149849],
  ],
  [
    [-0.109356, -0.020583, 0.095762, -0.001855],
    [0.02997, -0.053614, -0.155783, 0.012373],
    [0.117965, 0.098585, 0.141478, -0.002664],
    [-0.023737, 0.174701, -0.024277, 0.09584],
    [0.097491, -0.035153, 0.036595, -0.048779],
    [-0.180984, 0.044703, -0.13245, -0.068143],
    [-0.103389, -0.013779, -0.064962, 0.230114],
    [-0.066327, 0.148436, 0.066673, -0.163193],
    [-0.009173, -0.175193, 0.132494, -0.093453],
    [0.132103, 0.079055, -0.10876, 0.030063],
    [-0.095882, 0.085988, 0.122866, 0.175509],
    [-0.265356, -0.220853, -0.001963, 0.215876],
    [-0.09616, -0.131868, -0.060166, 0.002385],
    [0.100923, -0.038279, 0.093332, -0.278696],
    [0.069977, -0.125512, 0.023063, 0.102756],
    [-0.040107, -0.034203, -0.055992, -0.163601],
  ],
  [
    [-0.027007, 0.23215, 0.105288, -0.060864],
    [-0.035726, 0.017015, -0.169326, 0.099704],
    [0.079478, -0.108475, 0.060835, 0.148008],
    [-0.124578, -0.0356, -0.030315, -0.179663],
    [0.163096, -0.04718, -0.152109, 0.130474],
    [-0.053374, 0.020645, 0.031564, 0.022617],
    [0.155084, 0.104068, 0.114554, -0.04129],
    [0.100711, 0.140949, -0.035131, 0.08299],
    [0.057713, 0.02876, -0.106436, -0.090846],
    [-0.0809, 0.025352, 0.073867, 0.228303],
    [0.193873, -0.119471, 0.03916, -0.068107],
    [-0.159907, 0.021723, 0.194954, 0.000356],
    [0.028991, -0.183398, -0.034187, -0.018224],
    [-0.014156, -0.116771, 0.171047, -0.068214],
    [-0.136586, -0.13877, -0.069517, 0.067962],
    [-0.152519, 0.168824, -0.118474, 0.019386],
  ],
  [
    [0.045293, 0.130457, 0.030978, 0.227444],
    [0.090704, 0.082939, -0.060097, -0.008509],
    [0.153483, -0.004043, 0.068326, -0.136622],
    [-0.025938, -0.067004, 0.109122, 0.099922],
    [-0.202067, 0.007419, 0.143266, -0.070742],
    [-0.004839, -0.016352, -0.065801, -0.257272],
    [0.100666, -0.202098, -0.09533, -0.018371],
    [0.037545, 0.003584, -0.223509, 0.017174],
    [-0.065484, 0.176364, -0.071201, 0.068699],
    [-0.17773, 0.012663, -0.144549, -0.039643],
    [0.174934, -0.004052, 0.02102, 0.117509],
    [0.027128, 0.079469, 0.202687, -0.006795],
    [-0.058664, -0.083338, -0.084775, 0.155527],
    [-0.048492, -0.055486, 0.005782, -0.052413],
    [-0.029261, 0.193517, 0.031912, -0.12043],
    [-0.016666, -0.194024, 0.118163, -0.115575],
  ],
  [
    [-0.25396, -0.113964, 0.020497, 0.059748],
    [-0.020732, -0.196648, -0.0786, 0.029304],
    [-0.24431, 0.130356, 0.023118, -0.074879],
    [-0.076261, 0.075352, -0.102185, -0.038945],
    [0.070365, 0.104234, 0.147, 0.141412],
    [0.017945, 0.262503, -0.0271, 0.036594],
    [-0.071208, 0.016582, -0.050534, 0.161123],
    [-0.015777, -0.003431, 0.226776, -0.100401],
    [0.047985, -0.007794, -0.067573, -0.262334],
    [0.119884, 0.003803, -0.083629, 0.153255],
    [-0.00807, -0.088402, 0.099631, 0.101874],
    [-0.12586, -0.00879, 0.041909, -0.135044],
    [-0.006415, -0.10956, 0.000361, -0.084254],
    [0.161422, -0.093961, 0.069384, -0.065133],
    [0.097979, -0.101491, -0.171701, -0.056324],
    [0.121511, 0.12911, 0.014537, -0.049949],
  ],
  [
    [-0.004413, 0.002637, 0.110491, 0.020734],
    [-0.106638, 0.164302, 0.000231, 0.063432],
    [0.096944, -0.147186, -0.215375, 0.063863],
    [0.100596, 0.186109, 0.065115, -0.04175],
    [-0.050598, 0.018913, -0.112393, 0.165285],
    [-0.041486, -0.13415, -0.009744, -0.103432],
    [-0.104414, -0.189247, 0.033947, 0.119584],
    [0.044141, 0.177561, -0.184998, -0.050467],
    [0.026471, 0.074945, 0.141873, 0.222316],
    [0.047343, -0.016816, 0.17481, -0.186214],
    [-0.213936, -0.046595, 0.191171, -0.003442],
    [-0.157837, 0.071872, -0.008391, -0.176073],
    [-0.095984, 0.031836, -0.12713, -0.03626],
    [0.091817, -0.042667, -0.008831, 0.101033],
    [0.088329, -0.022886, -0.102803, -0.119274],
    [0.195528, -0.049922, 0.046881, -0.011352],
  ],
  [
    [0.013726, -0.07765, -0.189415, -0.045898],
    [-0.154052, -0.056175, 0.075082, 0.109241],
    [0.100387, 0.14576, 0.133988, 0.032963],
    [-0.047992, 0.134021, -0.123958, -0.141226],
    [0.2166, -0.103769, 0.016142, -0.031857],
    [-0.057576, 0.021125, 0.19372, -0.080613],
    [0.11251, -0.003384, -0.035132, 0.225397],
    [-0.030945, -0.16225, -0.105739, 0.128712],
    [-0.051487, 0.055061, -0.087969, 0.06174],
    [0.045702, -0.043466, 0.011627, -0.188556],
    [0.141155, 0.108709, -0.085141, -0.063626],
    [-0.085647, 0.19417, 0.042744, -0.029373],
    [-0.024047, -0.192624, 0.034417, -0.039358],
    [-0.198782, -0.026018, -0.065756, -0.051061],
    [0.037356, -0.078846, 0.274001, 0.04125],
    [0.06606, -0.030327, 0.041377, 0.089854],
  ],
  [
    [0.033784, 0.113303, 0.092058, -0.154517],
    [0.08405, 0.190797, 0.00892, 0.075073],
    [0.149814, -0.000964, 0.123002, 0.075949],
    [-0.235058, 0.111672, 0.133832, -0.068814],
    [0.086652, -0.083982, -0.012987, -0.172848],
    [0.000632, -0.115359, -0.198166, -0.025483],
    [0.041773, -0.134257, 0.106936, -0.055079],
    [-0.044479, 0.124561, 0.153277, 0.079771],
    [-0.149088, -0.023188, 0.071388, 0.088252],
    [-0.014542, 0.012728, -0.085335, 0.261626],
    [0.141942, 0.060773, -0.127843, 0.007286],
    [-0.109737, 0.058528, -0.126746, 0.018228],
    [-0.111724, 0.140404, -0.088754, -0.151813],
    [-0.134167, -0.090401, 0.00504, -0.11511],
    [-0.043997, -0.23405, -0.035064, 0.079975],
    [0.027061, -0.012113, -0.011835, 0.073924],
  ],
  [
    [0.074368, -0.210035, -0.021259, 0.119674],
    [0.052676, 0.196826, 0.109288, -0.040779],
    [-0.183974, 0.044152, 0.034732, -0.010527],
    [0.039181, -0.013098, 0.133079, -0.031461],
    [0.000584, -0.090552, 0.1617, 0.116341],
    [-0.100067, -0.131509, -0.076657, 0.011742],
    [-0.070781, 0.085256, -0.139654, -0.001561],
    [-0.000941, 0.101384, 0.072156, 0.112065],
    [0.070994, 0.009534, -0.118878, 0.178686],
    [0.007099, 0.06349, 0.076845, -0.229951],
    [-0.162513, -0.021644, -0.01815, 0.198827],
    [0.148571, 0.071559, -0.034595, -0.060595],
    [0.135261, -0.063346, -0.199834, -0.027757],
    [-0.035665, -0.042332, -0.098962, -0.137418],
    [0.173559, -0.163604, 0.058539, -0.068118],
    [-0.112415, -0.175507, 0.108801, -0.046966],
  ],
  [
    [0.051578, -0.111937, 0.030062, -0.011838],
    [-0.042032, 0.064083, -0.182158, -0.1034],
    [-0.039996, 0.096449, -0.045678, -0.204785],
    [0.222543, -0.109551, -0.126862, 0.121928],
    [0.032391, 0.153297, 0.054604, -0.02698],
    [0.157584, -0.033401, 0.106875, 0.104553],
    [0.043082, -0.131806, -0.128737, -0.051322],
    [-0.132175, -0.13666, -0.118765, 0.059942],
    [0.04384, 0.065826, -0.097456, 0.09216],
    [-0.108882, 0.092807, -0.004706, 0.165982],
    [-0.183221, 0.005116, 0.08287, -0.035302],
    [0.038114, -0.04588, 0.198762, -0.052286],
    [-0.011793, -0.079242, 0.081816, 0.171106],
    [-0.021032, -0.114985, 0.020599, -0.192499],
    [-0.08621, 0.119915, 0.184029, 0.058577],
    [0.182388, 0.021894, 0.009996, -0.065669],
  ],
  [
    [0.107221, -0.016654, -0.218695, -0.053499],
    [-0.140888, 0.078684, 0.065609, 0.001344],
    [0.054265, 0.038632, 0.204347, 0.02772],
    [-0.072219, -0.143165, -0.104159, -0.08645],
    [0.034852, -0.039595, -0.12452, 0.160783],
    [0.165747, -0.06001, 0.006269, 0.076517],
    [0.076222, 0.166205, 0.004667, 0.018337],
    [-0.091546, 0.054399, -0.03358, -0.133731],
    [-0.034926, 0.040767, 0.08813, 0.18334],
    [0.032159, -0.181533, 0.050751, -0.025084],
    [-0.076473, 0.211145, -0.169296, -0.07143],
    [0.134026, 0.071388, 0.079851, -0.123499],
    [0.047763, -0.008856, -0.063846, -0.22854],
    [-0.110858, -0.030033, -0.043041, 0.084122],
    [-0.075295, -0.011657, -0.236878, 0.047703],
    [-0.101739, -0.033741, 0.147576, -0.120881],
  ],
  [
    [0.058174, -0.076643, 0.043733, -0.240221],
    [0.106788, 0.022886, -0.191163, 0.050572],
    [-0.187199, 0.003275, 0.044878, -0.118782],
    [0.023286, 0.076034, -0.133375, -0.156647],
    [0.054431, -0.145296, -0.06921, 0.075463],
    [-0.147015, 0.086485, -0.124404, 0.015295],
    [-0.122543, -0.129748, -0.115895, -0.057841],
    [0.036643, 0.159736, -0.061491, 0.039126],
    [0.196077, -0.020008, -0.008459, -0.03792],
    [0.01039, 0.223662, 0.087562, -0.049452],
    [-0.119711, 0.031328, 0.045554, 0.127304],
    [-0.00591, -0.119312, 0.171926, -0.037741],
    [0.08788, 0.10111, 0.159483, 0.06673],
    [-0.0213, 0.005472, 0.029217, -0.038366],
    [0.11044, -0.010221, 0.001759, 0.195225],
    [-0.075621, -0.141405, 0.09807, 0.190656],
  ],
]

PQ_DSUB = 64 // PQ_M


def _pq_cb_lit(s: int):
    return F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for c in PQ_CODEBOOKS[s]
        ]
    )


def unit_normalize(vec) -> "F.Column":
    """array<float> -> unit-norm array<double> (cosine-equivalent L2)."""
    dv = F.transform(vec, lambda x: x.cast("double"))
    nrm = F.sqrt(F.aggregate(dv, F.lit(0.0), lambda a, x: a + x * x))
    return F.transform(dv, lambda x: x / nrm)


def _sq_l2(a, b) -> "F.Column":
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pq_codes(vec_norm) -> "F.Column":
    """Per-subspace nearest-codeword ids (1-based, array<int> of m).

    Distances are rounded to 6 decimals BEFORE the argmin in both
    this plan and the oracle SQL, so sub-ulp float-summation
    differences between engines can never flip a code assignment;
    ties break to the lowest code id in both (first-match argmin ==
    ORDER BY dist, code)."""
    codes = []
    for s in range(PQ_M):
        sub = F.slice(vec_norm, s * PQ_DSUB + 1, PQ_DSUB)
        dists = F.transform(
            _pq_cb_lit(s), lambda c: F.round(_sq_l2(sub, c), 6)
        )
        codes.append(
            F.array_position(dists, F.array_min(dists)).cast("int")
        )
    return F.array(*codes)


def pq_adc_score(codes, query_norm) -> "F.Column":
    """Asymmetric distance: sum over subspaces of L2^2 between the
    query's subvector and the row's selected codeword. Reads only the
    16-byte code column — the compressed-domain scan that makes PQ
    worth it at corpus scale."""
    total = F.lit(0.0)
    for s in range(PQ_M):
        qsub = F.slice(query_norm, s * PQ_DSUB + 1, PQ_DSUB)
        centroid = F.element_at(_pq_cb_lit(s), F.element_at(codes, s + 1))
        total = total + _sq_l2(qsub, centroid)
    return total


def pq_rerank_topk(
    df, vec_col: str, id_col: str, query_vec, k: int = 10, shortlist: int = 50
):
    """The production PQ pattern (FAISS IndexPQ + refine): ADC over
    the compressed codes shortlists ``shortlist`` candidates, exact
    cosine re-ranks only those to the final ``k``. At corpus scale
    the exact pass touches ``shortlist`` rows' float vectors instead
    of the corpus — the scan stays in the compressed domain.

    ``query_vec``: python list/array (driver-held; normalized
    DRIVER-SIDE and embedded as plain float literals — queries are
    tiny; the corpus never moves).

    Expression hygiene matters here: the normalized corpus vector is
    bound as a NAMED COLUMN before the per-subspace slices reference
    it. Inlining ``unit_normalize`` under all m slices duplicates its
    aggregate subtree m x k times and drives Catalyst analysis into
    minutes — attribute references keep the plan linear in m.
    """
    import math

    nrm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    qn_vals = [float(x) / nrm for x in query_vec]
    qn = F.array(*[F.lit(x) for x in qn_vals])
    base = df.select(
        F.col(id_col),
        F.col(vec_col),
        unit_normalize(F.col(vec_col)).alias("_vn"),
    )
    adc = pq_adc_score(pq_codes(F.col("_vn")), qn)
    short = (
        base.select(
            F.col(id_col), F.col("_vn"), adc.alias("_adc")
        )
        .orderBy("_adc", id_col)
        .limit(shortlist)
    )
    cos = F.aggregate(
        F.zip_with(F.col("_vn"), qn, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        short.select(F.col(id_col), F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), id_col)
        .limit(k)
    )


def pq_encode_table(
    df, vec_col: str, id_col: str, dest: str
) -> int:
    """Materialize the PQ index at rest: (id, codes array<int> of m)
    parquet — encode ONCE at ingest, query forever from 16 bytes a
    vector. At 100 TB this table is ~1/16th the embedding payload
    and is the only thing ANN queries scan. Returns row count written.
    """
    base = df.select(
        F.col(id_col), unit_normalize(F.col(vec_col)).alias("_vn")
    )
    enc = base.select(F.col(id_col), pq_codes(F.col("_vn")).alias("codes"))
    enc.write.mode("overwrite").parquet(dest)
    import pyarrow.parquet as pq  # bounded: footer metadata only

    return sum(
        pq.ParquetFile(os.path.join(dest, f)).metadata.num_rows
        for f in os.listdir(dest)
        if f.endswith(".parquet")
    )


def pq_query_codes(
    spark, dest: str, query_vec, k: int = 10
):
    """ADC top-k directly over the at-rest code table — no float
    vectors read at all (fully compressed-domain query; re-rank
    against the source table when exactness of the final order
    matters, cf. pq_rerank_topk)."""
    import math

    nrm = math.sqrt(sum(float(x) * float(x) for x in query_vec))
    qn = F.array(*[F.lit(float(x) / nrm) for x in query_vec])
    codes = spark.read.parquet(dest)
    id_col = [c for c in codes.columns if c != "codes"][0]
    return (
        codes.select(
            F.col(id_col),
            F.round(pq_adc_score(F.col("codes"), qn), 5).alias("adc_dist"),
        )
        .orderBy("adc_dist", id_col)
        .limit(k)
    )


# ---------------------------------------------------------------------------
# per-group centroid outliers (embedding-space curation)
# ---------------------------------------------------------------------------


def centroid_outliers(
    df: DataFrame,
    group_col: str,
    vec_col: str,
    id_col: str,
    k: int = 5,
) -> DataFrame:
    """The ``k`` vectors LEAST similar to their own group's centroid,
    per group — the embedding-space curation primitive behind
    mislabel/contamination detection (a doc whose embedding sits far
    from its source/label centroid is a labeling or crawl anomaly)
    and cluster pruning (SemDeDup-style: drop the fringe).

    Scale shape: one ``posexplode`` of the vectors (linear, n x dim
    rows), one grouped partial-aggregated shuffle for the per-(group,
    dim) means, one dim-keyed join back to the exploded rows with a
    per-(id) re-aggregation for the dot/norms, then a per-GROUP
    bottom-k window (WindowGroupLimit — never a global sort). The
    centroid table is groups x dim rows — broadcastable under the
    join at any realistic group count.

    Returns (group, id, cos_centroid) — ``cos_centroid`` rounded to 4
    so the score is hash-comparable cross-engine.
    """
    from pyspark.sql import Window

    x = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col)).alias("dim", "val"),
    )
    cent = x.groupBy("grp", "dim").agg(F.avg("val").alias("cv"))
    dots = (
        x.join(cent, ["grp", "dim"])
        .groupBy("grp", "_id")
        .agg(
            F.sum(F.col("val") * F.col("cv")).alias("dp"),
            F.sum(F.col("val") * F.col("val")).alias("na"),
            F.sum(F.col("cv") * F.col("cv")).alias("nc"),
        )
    )
    scored = dots.select(
        "grp",
        "_id",
        F.round(
            F.col("dp") / (F.sqrt("na") * F.sqrt("nc")), 4
        ).alias("cos_centroid"),
    )
    w = Window.partitionBy("grp").orderBy("cos_centroid", "_id")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("grp", "_id", "cos_centroid")
    )
