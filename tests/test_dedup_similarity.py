"""Extension-operator correctness: planted-duplicate oracles for the
approximate dedup family (MinHash-LSH, SimHash, embedding near-dup)
and exactness checks for similarity search (LSH-ANN vs brute force).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import dedup as DD
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
    similarity as SIM,
)

WORDS = (
    "the quick brown fox jumps over lazy dog spark query join filter "
    "table row batch stream data key value sort merge window group"
).split()


def _doc(rng, n=80):
    return " ".join(rng.choice(WORDS) for _ in range(n))


def _mutate(rng, text, n_edits=3):
    toks = text.split()
    for _ in range(n_edits):
        toks[rng.randrange(len(toks))] = rng.choice(WORDS)
    return " ".join(toks)


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(7)
    rows = []
    # 40 distinct docs
    for i in range(40):
        rows.append((i, _doc(rng)))
    # planted near-dups: 100<->original pairs (small edits)
    for i in range(5):
        rows.append((100 + i, _mutate(rng, rows[i][1])))
    # planted exact dup of doc 10
    rows.append((200, rows[10][1]))
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_dedup_finds_planted_dup(spark, docs):
    res = DD.exact_dedup(docs, "text", "doc_id")
    assert res.count() == docs.count() - 1  # one exact dup collapses
    dup = res.filter(F.col("dup_count") > 1).collect()
    assert len(dup) == 1 and dup[0]["doc_id"] == 10


def test_minhash_finds_planted_neardups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.3
        ).collect()
    }
    for i in range(5):
        assert (i, 100 + i) in pairs, f"planted pair {(i, 100+i)} missed"
    assert (10, 200) in pairs  # exact dup trivially found
    # sanity: no flood of false pairs among distinct docs
    false_pairs = [p for p in pairs if p[0] < 40 and p[1] < 40]
    assert len(false_pairs) <= 2


def test_jaccard_exact_agrees_with_minhash_estimate(spark, docs):
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in DD.jaccard_pairs(docs, "text", "doc_id", threshold=0.3).collect()
    }
    est = {
        (r["id_a"], r["id_b"]): r["est_jaccard"]
        for r in DD.minhash_lsh_pairs(
            docs, "text", "doc_id", jaccard_threshold=0.3
        ).collect()
    }
    common = set(exact) & set(est)
    assert len(common) >= 5
    for p in common:
        assert abs(exact[p] - est[p]) < 0.35  # 32-hash estimator tolerance


def test_jaccard_length_blocking_is_lossless(spark):
    """The size-containment blocking must return EXACTLY the pairs the
    unblocked quadratic join finds — the bound is a guarantee, not a
    heuristic (round-1 linear token bands dropped 2 of 25 true pairs
    at sf0.01)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_ORACLE

    d = load_table(spark, SF_ORACLE, "documents")
    blocked = {
        (r["id_a"], r["id_b"])
        for r in DD.jaccard_pairs(
            d, "text", "doc_id", threshold=0.5, length_blocking=True
        ).collect()
    }
    full = {
        (r["id_a"], r["id_b"])
        for r in DD.jaccard_pairs(d, "text", "doc_id", threshold=0.5).collect()
    }
    assert blocked == full
    assert len(full) > 0  # sf0.01 plants near-dups; 25 at current seed

def test_minhash_portable_family_finds_planted_neardups(spark, docs):
    # the md5-derived portable family (exact-DuckDB-oracle path) must
    # have the same planted-pair recall as the xxhash64 default
    pairs = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(
            docs, "text", "doc_id",
            jaccard_threshold=0.3, hash_family="portable",
        ).collect()
    }
    for i in range(5):
        assert (i, 100 + i) in pairs, f"planted pair {(i, 100+i)} missed"
    assert (10, 200) in pairs


def test_minhash_recall_vs_exact_jaccard(spark):
    """Quantified quality gate for the approximate family: exact
    blocked Jaccard at sf0.01 is the ground truth; MinHash-LSH at
    est>=0.5 must recover >=80% of pairs with true Jaccard >= 0.6
    (margin above the estimator's banding threshold)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_ORACLE

    d = load_table(spark, SF_ORACLE, "documents")
    truth = {
        (r["id_a"], r["id_b"])
        for r in DD.jaccard_pairs(
            d, "text", "doc_id", threshold=0.6, length_blocking=True
        ).collect()
    }
    assert truth, "testdata must plant near-dup docs"
    est = {
        (r["id_a"], r["id_b"])
        for r in DD.minhash_lsh_pairs(
            d, "text", "doc_id", jaccard_threshold=0.5
        ).collect()
    }
    recall = len(est & truth) / len(truth)
    assert recall >= 0.8, f"minhash recall {recall:.2f} < 0.8 ({len(truth)} truth pairs)"


def test_simhash_finds_planted_neardups(spark, docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_pairs(
            docs, "text", "doc_id", max_hamming=12
        ).collect()
    }
    found = sum((i, 100 + i) in pairs for i in range(5))
    assert found >= 3  # simhash is coarser; most planted pairs surface
    assert (10, 200) in pairs


def test_simhash_portable_family_finds_planted_neardups(spark, docs):
    """The JVM-side portable (md5-derived, 60-bit) SimHash family must
    surface the same planted near-dups as the blake2b pandas-UDF
    default — and its signatures must be deterministic across runs
    (they feed a cross-engine oracle)."""
    pairs = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_pairs(
            docs, "text", "doc_id", max_hamming=12, hash_family="portable"
        ).collect()
    }
    found = sum((i, 100 + i) in pairs for i in range(5))
    assert found >= 3
    assert (10, 200) in pairs
    again = {
        (r["id_a"], r["id_b"])
        for r in DD.simhash_pairs(
            docs, "text", "doc_id", max_hamming=12, hash_family="portable"
        ).collect()
    }
    assert again == pairs


@pytest.fixture(scope="module")
def vecs(spark):
    rng = random.Random(11)
    rows = []
    for i in range(60):
        rows.append((i, [rng.gauss(0, 1) for _ in range(64)]))
    # planted near-dup: 100 = tiny perturbation of vec 3
    rows.append(
        (100, [x + rng.gauss(0, 0.01) for x in rows[3][1]])
    )
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>").cache()


def test_embedding_near_dup_multiprobe_crosses_plane_boundary(spark):
    """A near-identical pair whose tiny perturbation flips exactly one
    plane sign lands in hamming-1 buckets: single-bucket equality
    misses it, the hamming-1 multi-probe must find it."""
    import pyspark.sql.functions as SF

    from streaming_data_lake_flink_cdc_apache_hudi_spark.functions import (
        vectors as V,
    )

    rng = random.Random(5)
    planes = V.random_hyperplanes(64, 12, 42)

    def bucket_of(vec):
        df = spark.createDataFrame([(vec,)], "embedding array<float>")
        return df.select(
            V.lsh_bucket(SF.col("embedding"), planes).alias("b")
        ).collect()[0]["b"]

    # search deterministically for a perturbation that flips exactly 1 bit
    found = None
    for attempt in range(200):
        u = [rng.gauss(0, 1) for _ in range(64)]
        v = [x + rng.gauss(0, 0.02) for x in u]
        bu, bv = bucket_of(u), bucket_of(v)
        if bin(bu ^ bv).count("1") == 1:
            found = (u, v)
            break
    assert found is not None, "no 1-bit-flip perturbation found in 200 tries"
    rows = [(1, found[0]), (2, found[1])] + [
        (10 + i, [rng.gauss(0, 1) for _ in range(64)]) for i in range(20)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    single = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_near_dup_pairs(
            df, "embedding", "vec_id", threshold=0.95, multi_probe=False
        ).collect()
    }
    multi = {
        (r["id_a"], r["id_b"])
        for r in DD.embedding_near_dup_pairs(
            df, "embedding", "vec_id", threshold=0.95, multi_probe=True
        ).collect()
    }
    assert (1, 2) not in single  # the boundary pair is invisible to equality
    assert (1, 2) in multi  # hamming-1 probing recovers it


def test_embedding_near_dup_finds_planted(spark, vecs):
    pairs = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in DD.embedding_near_dup_pairs(
            vecs, "embedding", "vec_id", threshold=0.9
        ).collect()
    }
    assert (3, 100) in pairs and pairs[(3, 100)] > 0.99


def test_embedding_near_dup_portable_family(spark, vecs):
    """The portable family finds the planted pair too, its quantized
    dot products are exact integers (the cross-engine-parity
    invariant), and its cos_sim agrees with the fast family to the
    quantization tolerance."""
    fast = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in DD.embedding_near_dup_pairs(
            vecs, "embedding", "vec_id", threshold=0.9
        ).collect()
    }
    port = {
        (r["id_a"], r["id_b"]): r["cos_sim"]
        for r in DD.embedding_near_dup_pairs(
            vecs, "embedding", "vec_id", threshold=0.9,
            hash_family="portable",
        ).collect()
    }
    assert (3, 100) in port and port[(3, 100)] > 0.99
    for pair in set(fast) & set(port):
        assert abs(fast[pair] - port[pair]) < 5e-4
    # quantized plane dots are integer-valued (sum-order independent)
    from streaming_data_lake_flink_cdc_apache_hudi_spark.functions import (
        vectors as V,
    )

    planes = V.portable_hyperplanes(64, 2, 42)
    q = vecs.select(
        F.transform(
            V.as_double(F.col("embedding")),
            lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("double"),
        ).alias("qv")
    )
    d = q.select(
        V.dot(
            F.col("qv"), F.array(*[F.lit(w) for w in planes[0]])
        ).alias("d")
    )
    for r in d.collect():
        assert r["d"] == int(r["d"])


def test_lsh_ann_recall_vs_bruteforce(spark, vecs):
    qv = vecs.filter(F.col("vec_id") == 3).select(
        F.col("embedding").alias("qv")
    )
    exact = [r["vec_id"] for r in SIM.cosine_topk(vecs, "embedding", "vec_id", qv, k=5).collect()]
    assert exact[0] == 3 and 100 in exact[:2]  # self + planted neighbor on top
    approx = [
        r["vec_id"]
        for r in SIM.lsh_ann_topk(
            vecs, "embedding", "vec_id", qv, k=5, n_planes=6
        ).collect()
    ]
    # the planted near-identical vector must be found by LSH probing
    assert 3 in approx and 100 in approx


def test_multi_query_knn_rank_contract(spark, vecs):
    q = vecs.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    res = SIM.cosine_topk_multi(
        vecs, "embedding", "vec_id", q, "query_id", "embedding", k=4
    )
    rows = res.collect()
    assert {r["query_id"] for r in rows} == {0, 1}
    for qid in (0, 1):
        ranked = sorted(
            (r for r in rows if r["query_id"] == qid), key=lambda r: r["rank"]
        )
        assert [r["rank"] for r in ranked] == [1, 2, 3, 4]
        assert ranked[0]["vec_id"] == qid  # self is the nearest


def test_ivf_topk_finds_planted_neighbor(spark, vecs):
    qv = vecs.filter(F.col("vec_id") == 3).select(
        F.col("embedding").alias("qv")
    )
    exact = [
        r["vec_id"]
        for r in SIM.cosine_topk(vecs, "embedding", "vec_id", qv, k=5).collect()
    ]
    approx = [
        r["vec_id"]
        for r in SIM.ivf_topk(
            vecs, "embedding", "vec_id", qv, k=5, n_centroids=8, n_probe=4
        ).collect()
    ]
    # the planted near-identical vector quantizes to the same list as
    # its twin -> IVF must find both
    assert 3 in approx and 100 in approx
    # decent recall vs exact top-5 with half the lists probed
    assert len(set(exact) & set(approx)) >= 3


def test_kmeans_centroids_separate_planted_clusters(spark):
    """3 well-separated clusters -> spherical k-means with k=3 puts one
    centroid per cluster: every member's nearest centroid is the same
    as its cluster-mates' and differs across clusters."""
    rng = random.Random(17)
    means = [[8.0 if d == c * 20 else 0.0 for d in range(64)] for c in range(3)]
    rows = []
    for i in range(120):
        c = i % 3
        rows.append(
            (i, [m + rng.gauss(0, 0.3) for m in means[c]])
        )
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = SIM.kmeans_centroids(
        df, "embedding", "vec_id", n_centroids=3, n_iters=3, seed=1
    )
    assert len(cents) == 3
    import math

    def nearest(v):
        return max(
            range(3), key=lambda i: sum(a * b for a, b in zip(v, cents[i]))
        )

    assignment = {}
    for i, v in rows:
        assignment.setdefault(i % 3, set()).add(nearest(v))
    # each cluster maps to exactly one centroid, all three distinct
    assert all(len(s) == 1 for s in assignment.values())
    assert len(set.union(*assignment.values())) == 3
    # centroids are unit-normalized (spherical k-means invariant)
    for c in cents:
        assert math.isclose(sum(x * x for x in c), 1.0, rel_tol=1e-9)


def test_ivf_refined_exhaustive_probe_equals_brute_force(spark, vecs):
    # k-means-refined centroids change the lists, not the math:
    # exhaustive probe must still equal brute force exactly
    qv = vecs.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    exact = [
        (r["vec_id"], r["cos_sim"])
        for r in SIM.cosine_topk(vecs, "embedding", "vec_id", qv, k=5).collect()
    ]
    refined = [
        (r["vec_id"], r["cos_sim"])
        for r in SIM.ivf_topk(
            vecs, "embedding", "vec_id", qv, k=5, n_centroids=8, n_probe=8,
            refine_iters=2,
        ).collect()
    ]
    assert exact == refined


def test_ivf_probe_prunes_corpus(spark, vecs):
    # with n_probe == n_centroids the probe is exhaustive -> must equal
    # brute force exactly (sanity for the quantization plumbing)
    qv = vecs.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qv")
    )
    exact = [
        (r["vec_id"], r["cos_sim"])
        for r in SIM.cosine_topk(vecs, "embedding", "vec_id", qv, k=5).collect()
    ]
    full_probe = [
        (r["vec_id"], r["cos_sim"])
        for r in SIM.ivf_topk(
            vecs, "embedding", "vec_id", qv, k=5, n_centroids=8, n_probe=8
        ).collect()
    ]
    assert exact == full_probe


def test_connected_components_matches_union_find(spark):
    """Random graph: the distributed min-label propagation must equal
    a driver-side union-find ground truth exactly."""
    rng = random.Random(23)
    n = 200
    edges = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(150)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    in_graph = {x for e in edges for x in e}
    # canonical truth: min node id per component
    min_of = {}
    for x in in_graph:
        r = find(x)
        min_of[r] = min(min_of.get(r, x), x)
    truth = {x: min_of[find(x)] for x in in_graph}

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["comp"]
        for r in DD.connected_components(df).collect()
    }
    assert got == truth


def test_transitive_cluster_vs_greedy_keep(spark):
    """A chain a~b, b~c (a!~c) clusters transitively: connected
    components put all three in one cluster even though the greedy
    pair pass only sees the two edges."""
    edges = spark.createDataFrame([(7, 8), (8, 9)], "id_a long, id_b long")
    got = {
        (r["node"], r["comp"])
        for r in DD.connected_components(edges).collect()
    }
    assert got == {(7, 7), (8, 7), (9, 7)}


def test_ivf_index_at_rest_prunes_partitions(spark, vecs, tmp_path):
    """write_ivf_index + ivf_probe_index: the probe must (a) return
    exactly what the in-memory ivf_topk returns for the same
    centroids/probe budget, and (b) physically read ONLY the probed
    _list_id= partition dirs."""
    path = str(tmp_path / "ivf")
    SIM.write_ivf_index(
        vecs, "embedding", "vec_id", path, n_centroids=8, refine_iters=2
    )
    q = [
        r["embedding"]
        for r in vecs.filter(F.col("vec_id") == 0).collect()
    ][0]
    got = SIM.ivf_probe_index(
        spark, path, list(q), "embedding", "vec_id", k=5, n_probe=3
    )
    mem = SIM.ivf_topk(
        vecs,
        "embedding",
        "vec_id",
        vecs.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("qv")),
        k=5,
        n_centroids=8,
        n_probe=3,
        refine_iters=2,
    )
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in mem.collect()]
    # partition pruning: every file actually read lives in a probed dir
    corpus = spark.read.option("basePath", path).parquet(path)
    import json
    import os

    with open(os.path.join(path, "_centroids.json")) as fh:
        cents = json.load(fh)
    probes = [
        i
        for _, i in sorted(
            ((sum(a * b for a, b in zip(q, c)), i) for i, c in enumerate(cents)),
            reverse=True,
        )[:3]
    ]
    files = [
        r[0]
        for r in corpus.filter(F.col("_list_id").isin(probes))
        .select(F.input_file_name())
        .distinct()
        .collect()
    ]
    assert files
    for f in files:
        assert any(f"_list_id={p}/" in f for p in probes), f


def test_ivf_sq8_quantized_index(spark, vecs, tmp_path):
    """IVF-SQ8 (quantize=True): the at-rest layout stores int8 codes +
    scale instead of raw floats, probes self-describe and dequantize,
    and quantized top-10 keeps >=8 of the exact index's top-10.
    (On-disk ratio is not asserted: at toy scale parquet footers and
    INT32-physical int8 encoding dominate; the 4x is the logical
    element width.)"""

    raw_path = str(tmp_path / "ivf_raw")
    q8_path = str(tmp_path / "ivf_q8")
    SIM.write_ivf_index(
        vecs, "embedding", "vec_id", raw_path, n_centroids=8, refine_iters=2
    )
    SIM.write_ivf_index(
        vecs, "embedding", "vec_id", q8_path, n_centroids=8,
        refine_iters=2, quantize=True,
    )

    # the SQ8 layout stores 1-byte codes + scale and NO raw floats
    q8 = spark.read.option("basePath", q8_path).parquet(q8_path)
    assert "embedding" not in q8.columns
    assert dict(q8.dtypes)["_code"] == "array<tinyint>"
    assert dict(q8.dtypes)["_scale"] == "double"

    q = [r["embedding"] for r in vecs.filter(F.col("vec_id") == 0).collect()][0]
    exact = [
        r["vec_id"]
        for r in SIM.ivf_probe_index(
            spark, raw_path, list(q), "embedding", "vec_id", k=10, n_probe=8
        ).collect()
    ]
    approx = [
        r["vec_id"]
        for r in SIM.ivf_probe_index(
            spark, q8_path, list(q), "embedding", "vec_id", k=10, n_probe=8
        ).collect()
    ]
    assert len(set(exact) & set(approx)) >= 8


def test_random_projection_preserves_distances(spark):
    # JL property: with 16 output dims, pairwise L2 distances of random
    # 64-dim unit-ish vectors survive within a loose distortion band
    from streaming_data_lake_flink_cdc_apache_hudi_spark.functions import vectors as VEC

    rng = random.Random(11)
    vecs = [
        (i, [rng.gauss(0.0, 1.0) for _ in range(64)]) for i in range(20)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    signs = VEC.projection_signs(64, 16)
    out = {
        r.vec_id: r.p
        for r in df.select(
            "vec_id", VEC.random_project(F.col("embedding"), signs).alias("p")
        ).collect()
    }
    raw = dict(vecs)

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    ratios = []
    for i in range(20):
        for j in range(i + 1, 20):
            ratios.append(d2(out[i], out[j]) / d2(raw[i], raw[j]))
    mean = sum(ratios) / len(ratios)
    assert 0.7 < mean < 1.3, mean          # unbiased on average
    assert all(0.2 < r < 2.5 for r in ratios), (min(ratios), max(ratios))


def test_pq_rerank_recall_against_exact(spark):
    """PQ shortlist-50 + exact re-rank must recover >=0.8 of the true
    cosine top-10 averaged over 5 probe vectors (m=16/k=16 codebooks;
    pure codegen column math end to end — no UDF)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import similarity as SIM
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )
    from .conftest import SF_ORACLE

    e = load_table(spark, SF_ORACLE, "embeddings")
    vecs = {
        r["vec_id"]: r["embedding"]
        for r in e.filter(F.col("vec_id") < 5).collect()
    }
    total = 0.0
    for qid, qv in vecs.items():
        qdf = e.filter(F.col("vec_id") == qid).select(
            F.col("embedding").alias("qv")
        )
        exact = SIM.cosine_topk(e, "embedding", "vec_id", qdf, k=11)
        want = [r["vec_id"] for r in exact.collect() if r["vec_id"] != qid][:10]
        got_df = SIM.pq_rerank_topk(e, "embedding", "vec_id", qv, k=11)
        got = [r["vec_id"] for r in got_df.collect() if r["vec_id"] != qid][:10]
        total += len(set(want) & set(got)) / 10
    assert total / len(vecs) >= 0.8, f"mean recall {total / len(vecs):.2f}"


def test_pq_codes_plan_is_udf_free_map_only(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import similarity as SIM
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )
    from .conftest import SF_ORACLE

    e = load_table(spark, SF_ORACLE, "embeddings")
    enc = e.select(
        "vec_id",
        SIM.pq_codes(SIM.unit_normalize(F.col("embedding"))).alias("codes"),
    )
    plan = enc._jdf.queryExecution().executedPlan().treeString()
    assert "Exchange" not in plan and "Python" not in plan
    # every code within [1, k]
    row = enc.selectExpr(
        "min(array_min(codes)) AS lo", "max(array_max(codes)) AS hi"
    ).collect()[0]
    assert row["lo"] >= 1 and row["hi"] <= SIM.PQ_K


def test_pq_index_at_rest_round_trip(spark, tmp_path):
    """Encode once to a codes table, query from codes only: the ADC
    top-k from the at-rest index must equal the in-plan ADC top-k,
    and the code table must be read WITHOUT the embedding column."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import similarity as SIM
    from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )
    from .conftest import SF_ORACLE

    e = load_table(spark, SF_ORACLE, "embeddings")
    dest = str(tmp_path / "pq_codes")
    n = SIM.pq_encode_table(e, "embedding", "vec_id", dest)
    assert n == e.count()
    qv = e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = [
        tuple(r)
        for r in SIM.pq_query_codes(spark, dest, qv, k=10).collect()
    ]
    want = [
        tuple(r)
        for r in QUERIES["pq_ann_topk"].fn(spark, SF_ORACLE).collect()
    ]
    assert got == want
    plan = (
        SIM.pq_query_codes(spark, dest, qv, k=10)
        ._jdf.queryExecution()
        .executedPlan()
        .treeString()
    )
    assert "embedding" not in plan  # compressed-domain only


def test_edit_distance_pairs_planted_and_lossless(spark):
    """SymSpell deletion blocking: planted typo pairs (substitute /
    insert / delete, and a d=2 double-edit) must come back exactly —
    equal to the brute-force levenshtein join — and the plan must
    contain no cartesian product."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.dedup import (
        edit_distance_pairs,
    )

    rows = [
        (1, "jonathan smith"),
        (2, "jonathon smith"),   # substitution  (d=1 of 1)
        (3, "jonathan smiths"),  # insertion     (d=1 of 1)
        (4, "jonathan smit"),    # deletion      (d=1 of 1)
        (5, "jonathon smiths"),  # d=2 of 1, d=1 of 2 and 3
        (6, "completely different name"),
    ]
    df = spark.createDataFrame(rows, "id LONG, name STRING")
    for d in (1, 2):
        got = {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_pairs(df, "name", "id", max_dist=d).collect()
        }
        # brute force ground truth
        import itertools

        want = set()
        for (ia, ta), (ib, tb) in itertools.combinations(rows, 2):
            lv = spark.createDataFrame(
                [(ta, tb)], "a STRING, b STRING"
            ).select(F.levenshtein("a", "b").alias("d")).collect()[0]["d"]
            if lv <= d:
                want.add((ia, ib, lv))
        assert got == want, d
    plan = (
        edit_distance_pairs(df, "name", "id", max_dist=1)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_centroid_outliers_planted(spark):
    """A vector pointing away from its group's centroid must rank as
    the group's worst; in-cluster vectors must not."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.similarity import (
        centroid_outliers,
    )

    import random

    rng = random.Random(13)
    rows = []
    for g in ("a", "b"):
        base = [1.0, 0.0, 0.0, 0.0] if g == "a" else [0.0, 1.0, 0.0, 0.0]
        for i in range(10):
            v = [x + rng.uniform(-0.05, 0.05) for x in base]
            rows.append((g, g + str(i), v))
    rows.append(("a", "a_outlier", [-1.0, 0.05, 0.0, 0.0]))  # anti-centroid
    df = spark.createDataFrame(rows, "grp STRING, id STRING, vec ARRAY<DOUBLE>")
    out = centroid_outliers(df, "grp", "vec", "id", k=1)
    worst = {r["grp"]: r["_id"] for r in out.collect()}
    assert worst["a"] == "a_outlier"
    assert worst["b"].startswith("b")
