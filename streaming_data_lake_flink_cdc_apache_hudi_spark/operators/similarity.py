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
    sample = vecs.localCheckpoint(eager=True)
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
