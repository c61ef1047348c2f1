"""Hybrid retrieval (BM25 + RRF) and SemDeDup semantic dedup:
planted-scenario semantics plus plan-shape pins (bounded pools,
no cartesian pair space)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.dedup import semantic_dedup
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.retrieval import (
    bm25_scores,
    hybrid_rrf_topk,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_bm25_ranks_term_density(spark):
    docs = _docs(
        spark,
        [
            (0, "cat cat cat dog"),
            (1, "cat dog bird fish"),
            (2, "bird fish moose elk"),
            (3, "cat " + "pad " * 60),  # long doc: length-normalized down
        ],
    )
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_scores(docs, "text", "doc_id", ["cat"]).collect()
    }
    # doc 2 has no query term at all -> absent from the scored list
    assert set(got) == {0, 1, 3}
    # tf saturation still ranks the 3x-cat doc first; the padded doc
    # is penalized below the short single-hit doc by length norm
    assert got[0] > got[1] > got[3] > 0


def test_bm25_matches_closed_form(spark):
    # 2 docs, term in one of them: every quantity is hand-computable
    docs = _docs(spark, [(0, "a b"), (1, "c d")])
    [row] = bm25_scores(docs, "text", "doc_id", ["a"]).collect()
    idf = math.log(1 + (2 - 1 + 0.5) / (1 + 0.5))
    tf_term = 1 * 2.2 / (1 + 1.2 * (1 - 0.75 + 0.75 * 2 / 2.0))
    assert row["doc_id"] == 0
    assert abs(row["bm25"] - round(idf * tf_term, 4)) < 1e-9


def test_rrf_fuses_both_lists(spark):
    # doc 0: rank 1 lexical, rank 4 dense; doc 1: rank 1 dense only;
    # doc 2: rank 2 in BOTH (1/62+1/62 > 1/61+1/64) -> doc 2 first
    docs = _docs(
        spark,
        [
            (0, "cat cat cat cat"),
            (1, "dog dog dog dog"),
            (2, "cat cat dog dog"),
            (3, "bird bird bird bird"),
        ],
    )
    emb = spark.createDataFrame(
        [
            (0, [0.0, 1.0]),
            (1, [1.0, 0.0]),
            (2, [0.9, 0.45]),
            (3, [0.5, 0.5]),
        ],
        "vec_id long, embedding array<double>",
    )
    qv = spark.createDataFrame([([1.0, 0.0],)], "qv array<double>")
    out = hybrid_rrf_topk(
        docs, emb, ["cat"], query_vec=qv, k=4, pool=10
    ).collect()
    assert out[0]["doc_id"] == 2
    assert out[0]["rrf_score"] == round(1 / 62 + 1 / 62, 6)
    # doc 1 never matches a query term: null bm25 rank, dense-only score
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["bm25_rank"] is None
    assert by_id[1]["rrf_score"] == round(1 / 61, 6)


def test_hybrid_pool_is_bounded_in_plan(spark):
    import contextlib
    import io

    from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES

    df = QUERIES["hybrid_search_rrf"].fn(spark, "/root/testdata/sf0.01")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # both candidate lists cut by TakeOrderedAndProject (per-partition
    # top-pool), never a corpus-wide global sort feeding the window
    assert plan.count("TakeOrderedAndProject") >= 2
    assert "CartesianProduct" not in plan


def test_semantic_dedup_drops_planted_duplicate(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(40)]
    # plant: vec 39 duplicates vec 5 exactly -> same cluster, cos=1
    rows[39] = (39, rows[5][1])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, "embedding", "vec_id", n_clusters=4, tau=0.99)
    got = {r["vec_id"]: r for r in out.collect()}
    assert len(got) == 40
    assert got[5]["kept"] is True  # smaller id is the representative
    assert got[39]["kept"] is False
    assert got[39]["cluster"] == got[5]["cluster"]
    # at tau above every non-planted cosine, everyone else survives
    assert sum(not r["kept"] for r in got.values()) == 1


def test_semantic_dedup_is_cluster_local(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    rows = [(i, [float(x) for x in rng.normal(size=8)]) for i in range(30)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = semantic_dedup(emb, "embedding", "vec_id", n_clusters=5, tau=-1.1)
    got = out.collect()
    # tau below -1: every pair qualifies, so exactly the per-cluster
    # minimum id survives -> kept count == number of non-empty clusters
    clusters = {r["cluster"] for r in got}
    assert sum(r["kept"] for r in got) == len(clusters)
    for c in clusters:
        members = [r for r in got if r["cluster"] == c]
        keeper = min(m["vec_id"] for m in members)
        for m in members:
            assert m["kept"] is (m["vec_id"] == keeper)


def test_hard_negatives_exclude_same_label(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.similarity import (
        hard_negative_topk,
    )

    emb = spark.createDataFrame(
        [
            (0, "A", [1.0, 0.0]),
            (1, "A", [0.99, 0.1]),   # nearest overall but same label
            (2, "B", [0.9, 0.4]),    # nearest wrong-label -> rank 1
            (3, "B", [0.0, 1.0]),
            (4, "C", [0.5, 0.5]),
        ],
        "vec_id long, label string, embedding array<double>",
    )
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("qlabel"),
        "embedding",
    )
    out = hard_negative_topk(
        emb, "embedding", "vec_id", "label", q, "query_id", "embedding",
        "qlabel", k=3,
    ).collect()
    ids = [r["vec_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert 1 not in ids and 0 not in ids  # label A never appears
    assert ids[0] == 2                    # closest wrong-label first
    assert all(r["label"] != "A" for r in out)
