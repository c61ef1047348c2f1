"""Hybrid retrieval: BM25 lexical scoring fused with embedding
cosine ranking via reciprocal-rank fusion (the standard RAG
first-stage retriever shape — sparse + dense lists merged by rank,
Cormack et al.'s RRF).

Scale design:
- The query-term set is a tiny literal list — token explosion is
  filtered to it BEFORE any shuffle, so only matching-term
  occurrences ever leave the scan stage. Document length comes from
  ``size(split(...))`` map-side; no full-token shuffle anywhere.
- Corpus-wide scalars (N, avgdl) and the per-term df table are
  broadcast one-row/`len(terms)`-row frames.
- Both candidate lists are cut to a bounded pool with
  ``orderBy().limit(pool)`` — planned as TakeOrderedAndProject
  (per-partition top-pool, driver merges pool·p rows; never a
  global sort). The rank window then runs over ≤pool rows, so the
  single-partition window is bounded by the pool size, not the
  corpus — the same contract as every published RRF deployment
  (fusion happens over retrieved lists, not the collection).
- All float comparisons are made on ROUNDed values (4 decimals)
  with id tie-breaks, so ranking is reproducible cross-engine (the
  DuckDB oracle replays the identical arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import vectors as V

BM25_K1 = 1.2
BM25_B = 0.75
RRF_K = 60


def bm25_scores(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    terms: list[str],
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Okapi BM25 score of every document that matches at least one
    query term. idf = ln(1 + (N - df + .5)/(df + .5)) (the standard
    non-negative variant); tf saturates with k1 and is normalized by
    document length against the corpus average (b).

    Plan shape: one map-side explode filtered to the term list, a
    (doc, term) count shuffle over only matching occurrences, a
    broadcast of the tiny df/N/avgdl aggregates back on, one
    per-doc sum. Linear in matching occurrences — never corpus².
    """
    toks = F.split(F.col(text_col), " ")
    base = docs.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_dl")
    )
    # corpus scalars: one row, broadcast via crossJoin (house pattern)
    stats = F.broadcast(
        base.agg(
            F.count("*").alias("_n"), F.avg("_dl").alias("_avgdl")
        )
    )
    occ = base.select(
        id_col, "_dl", F.explode("_toks").alias("_t")
    ).filter(F.col("_t").isin(terms))
    tf = occ.groupBy(id_col, "_t").agg(
        F.count("*").alias("_tf"), F.first("_dl").alias("_dl")
    )
    df_tbl = F.broadcast(
        tf.groupBy("_t").agg(F.count("*").alias("_df"))
    )
    scored = (
        tf.join(df_tbl, "_t")
        .crossJoin(stats)
        .select(
            F.col(id_col),
            (
                F.log(
                    1.0
                    + (F.col("_n") - F.col("_df") + 0.5)
                    / (F.col("_df") + 0.5)
                )
                * F.col("_tf")
                * (k1 + 1.0)
                / (
                    F.col("_tf")
                    + k1
                    * (1.0 - b + b * F.col("_dl") / F.col("_avgdl"))
                )
            ).alias("_contrib"),
        )
        .groupBy(id_col)
        .agg(F.round(F.sum("_contrib"), 4).alias("bm25"))
    )
    return scored


def hybrid_rrf_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    query_vec: DataFrame | None = None,
    k: int = 10,
    pool: int = 100,
    rrf_k: int = RRF_K,
) -> DataFrame:
    """Top-k hybrid retrieval: BM25 list ⊕ cosine list, fused with
    reciprocal-rank fusion ``Σ 1/(rrf_k + rank)`` over the union of
    the two top-``pool`` candidate lists (a doc absent from one list
    contributes 0 from that side — the published RRF convention).

    ``query_vec`` is a 1-row frame with column ``qv``; defaults to
    the embedding of vec_id 0 (the corpus's standing test query).
    Output: (doc_id, bm25_rank, vec_rank, rrf_score), ranks null
    when the doc is outside that list's pool.
    """
    if query_vec is None:
        query_vec = embeddings.filter(F.col(vec_id_col) == 0).select(
            V.as_double(F.col(vec_col)).alias("qv")
        )

    bm_pool = (
        bm25_scores(docs, text_col, doc_id_col, terms)
        .orderBy(F.col("bm25").desc(), F.col(doc_id_col))
        .limit(pool)
    )
    w_bm = Window.orderBy(F.col("bm25").desc(), F.col(doc_id_col))
    bm_ranked = bm_pool.select(
        F.col(doc_id_col), F.row_number().over(w_bm).alias("bm25_rank")
    )

    cos = V.cosine(V.as_double(F.col(vec_col)), F.col("qv"))
    vec_pool = (
        embeddings.crossJoin(F.broadcast(query_vec))
        .select(
            F.col(vec_id_col).alias(doc_id_col),
            F.round(cos, 4).alias("_cos"),
        )
        .orderBy(F.col("_cos").desc(), F.col(doc_id_col))
        .limit(pool)
    )
    w_v = Window.orderBy(F.col("_cos").desc(), F.col(doc_id_col))
    vec_ranked = vec_pool.select(
        F.col(doc_id_col), F.row_number().over(w_v).alias("vec_rank")
    )

    fused = bm_ranked.join(vec_ranked, doc_id_col, "full_outer").select(
        F.col(doc_id_col),
        "bm25_rank",
        "vec_rank",
        F.round(
            F.coalesce(1.0 / (rrf_k + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(1.0 / (rrf_k + F.col("vec_rank")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(
        F.col("rrf_score").desc(), F.col(doc_id_col)
    ).limit(k)
