"""Corpus-curation operators for training-data pipelines: eval-set
decontamination, repetition metrics, PII masking, and deterministic
shard assignment (extension surface — the reference exposes nothing
like this; mandated by the build brief's LLM-pipeline operator set).

All four are built from JVM-side ``pyspark.sql.functions`` (no Python
in the hot path) and have exact DuckDB oracles.

Scale shapes (the 100 TB contract for each):
- ``decontaminate``: eval sets are small (a benchmark is thousands of
  documents, the training corpus is billions) — the distinct eval
  n-gram set is broadcast, so the training side is a map + broadcast
  semi-join; the only shuffles are the distinct over the (small) eval
  n-grams and the distinct over contaminated doc ids (bounded by the
  contamination rate, not the corpus).
- ``repetition_metrics``: map-only per-document column math; the
  top-token scan is O(tokens x distinct tokens) per doc inside
  whole-stage codegen — no shuffle, no state.
- ``mask_digits``/PII helpers (functions/text.py): map-only regexes.
- ``shard_assign``: map-only md5-bucket assignment — reproducible
  across engines/partitionings for the same reason as
  ``sampling.hash_keep`` (the hash, not the layout, decides). The
  within-shard ``pack_position`` window partitions BY SHARD, so at
  scale each shard sorts independently in its own task set — there is
  deliberately no global window (single-partition sort) anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import text as TX


def eval_ngram_set(
    eval_df: DataFrame, text_col: str, shingle_n: int = 3
) -> DataFrame:
    """Distinct word n-grams of the eval/benchmark set — the
    contamination dictionary. One distinct over the (small) eval
    side; the result is the broadcast side of ``decontaminate``."""
    return (
        eval_df.select(
            F.explode(
                F.array_distinct(TX.shingles(F.col(text_col), shingle_n))
            ).alias("_ng")
        )
        .distinct()
    )


def contaminated_ids(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Training doc ids sharing at least one word n-gram with the eval
    set (the classic benchmark-decontamination test, n-gram overlap).

    Shape: explode train shingles (map-only) -> broadcast hash
    semi-join against the eval n-gram set -> distinct ids. The join
    never shuffles the corpus; only the matching ids are shuffled for
    the distinct.
    """
    ngrams = eval_ngram_set(eval_df, text_col, shingle_n)
    exploded = train_df.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(TX.shingles(F.col(text_col), shingle_n))
        ).alias("_ng"),
    )
    return (
        exploded.join(F.broadcast(ngrams), "_ng", "left_semi")
        .select(id_col)
        .distinct()
    )


def decontaminate(
    train_df: DataFrame,
    eval_df: DataFrame,
    text_col: str,
    id_col: str,
    shingle_n: int = 3,
) -> DataFrame:
    """Training rows with every eval-overlapping document removed."""
    bad = contaminated_ids(train_df, eval_df, text_col, id_col, shingle_n)
    return train_df.join(bad, id_col, "left_anti")


def repetition_metrics(
    df: DataFrame, text_col: str, round_to: int = 4
) -> DataFrame:
    """Gopher-style within-document repetition signals, appended as
    columns:

    - ``dup_bigram_frac``: fraction of word-bigram occurrences that
      are repeats (1 - distinct/total) — high for boilerplate and
      looped generations;
    - ``top_token_frac``: share of the document taken by its single
      most frequent token — high for keyword-stuffed spam.

    Pure column math over token arrays (whole-stage codegen); the
    top-token count is O(tokens x distinct) per document, which is
    the right trade at corpus scale versus an explode + groupBy
    (which would shuffle every token of every document).
    """
    toks = TX.tokens(F.col(text_col))
    bg = TX.shingles(F.col(text_col), 2)
    dup_frac = F.lit(1.0) - F.size(F.array_distinct(bg)) / F.size(bg)
    top = F.array_max(
        F.transform(
            F.array_distinct(toks),
            lambda t: F.size(F.filter(toks, lambda x: x == t)),
        )
    )
    return df.withColumn(
        "dup_bigram_frac", F.round(dup_frac, round_to)
    ).withColumn(
        "top_token_frac", F.round(top / F.size(toks), round_to)
    )


def source_cap(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    seed: str = "",
    prefilter_factor: float | None = None,
) -> DataFrame:
    """Per-source/domain document cap: keep at most ``cap`` rows per
    ``group_col`` value, chosen deterministically by md5 rank of the id
    (layout- and engine-independent, like ``sampling.hash_keep``) — the
    standard crawl-curation guard against a handful of giant domains
    dominating a pretraining mix.

    Scale shape: the rank window partitions BY GROUP, so each domain
    sorts independently — and Catalyst compiles the ``rank <= cap``
    filter to a map-side ``WindowGroupLimit`` BELOW the exchange
    (pinned in tests/test_plans.py): every map task keeps at most
    ``cap`` rows per group before shuffling, so the post-shuffle sort
    for any group is bounded by cap x map-partitions, not the domain
    size. For extreme heavy hitters (when even cap x map-partitions
    shuffle volume matters), pass
    ``prefilter_factor`` (e.g. 4.0): a first pass counts each group
    (map-side partial agg; the counts table is tiny relative to the
    corpus), then a map-only md5-prefix threshold keeps
    ~``cap * factor`` random candidates per group BEFORE the window —
    bounding the per-group sort to O(cap * factor) regardless of
    domain size. The threshold keeps every row whose 32-bit hash
    prefix falls below ``cap * factor / n``; the exact top-``cap``
    ranks are preserved whenever the cap-th smallest hash lies under
    the threshold (overwhelmingly likely for factor >= 4; the planted
    test pins prefiltered == exact on the testdata corpus).
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    out = df
    if prefilter_factor is not None:
        counts = df.groupBy(group_col).agg(F.count("*").alias("_grp_n"))
        prefix = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
        keep_p = F.least(
            F.lit(1.0), F.lit(float(cap) * prefilter_factor) / F.col("_grp_n")
        )
        # Unhinted join: AQE broadcasts the counts side when the domain
        # dim is small; with a huge domain dim it becomes a shuffle on
        # group_col — the same partitioning the window needs anyway.
        out = (
            out.join(counts, group_col)
            .where(prefix < keep_p * F.lit(float(2**32)))
            .drop("_grp_n")
        )
    w = Window.partitionBy(group_col).orderBy(h, F.col(id_col))
    return (
        out.withColumn("_cap_rank", F.row_number().over(w))
        .where(F.col("_cap_rank") <= cap)
        .drop("_cap_rank")
    )


def shard_assign(
    df: DataFrame,
    id_col: str,
    n_shards: int,
    seed: str = "",
    with_position: bool = True,
) -> DataFrame:
    """Deterministic shard + within-shard order for training-shard
    writes: shard = md5-bucket of the id (stable under any partition
    layout, reproducible in any engine), ``pack_position`` = rank of
    the id's md5 within its shard — a pseudo-random but fully
    deterministic global shuffle of the corpus, materialized as
    (shard, position) instead of an actual global sort.

    The position window partitions by shard: at 100 TB this is
    n_shards independent sorts, each the size of one output shard —
    never a single-partition global window. Downstream,
    ``df.repartition(n_shards, "shard")`` + sortWithinPartitions
    writes each shard as one sorted file set.
    """
    h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed)))
    prefix = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    out = df.withColumn("shard", (prefix % n_shards).cast("int"))
    if with_position:
        w = Window.partitionBy("shard").orderBy(h, F.col(id_col))
        out = out.withColumn("pack_position", F.row_number().over(w))
    return out


def paragraph_chunks(
    df: DataFrame,
    text_col: str,
    id_col: str,
    words_per_para: int = 10,
) -> DataFrame:
    """Explode each document into fixed-width word chunks — the
    "paragraph" unit for paragraph-level dedup. Real corpora split on
    blank lines; the synthetic testdata has no newlines, so the unit
    is ``words_per_para`` consecutive whitespace tokens, which keeps
    the operator's semantics (sub-document dedup granularity) and the
    oracle exact in both engines.

    Map-only: split + in-array chunking (``F.transform`` over a
    ``sequence`` of chunk indexes, ``F.slice`` per chunk) then one
    ``posexplode`` — no shuffle, no UDF. Output: (id, para_idx, para).
    """
    words = F.when(
        F.trim(F.col(text_col)) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(F.col(text_col)), r"\s+"))
    n_chunks = F.when(
        F.size(words) > 0,
        F.floor((F.size(words) - F.lit(1)) / words_per_para).cast("int")
        + F.lit(1),
    ).otherwise(F.lit(0))
    paras = F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.concat_ws(
            " ", F.slice(words, (i - 1) * words_per_para + 1, words_per_para)
        ),
    )
    return df.select(
        F.col(id_col),
        F.posexplode(F.when(n_chunks > 0, paras).otherwise(F.array())).alias(
            "para_idx", "para"
        ),
    )


def paragraph_dup_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    words_per_para: int = 10,
    round_to: int = 4,
) -> DataFrame:
    """Per-document duplicated-paragraph statistics: how much of each
    document is made of paragraphs that occur more than once ANYWHERE
    in the corpus — the metric behind boilerplate stripping (headers,
    footers, licence blocks) in crawl curation.

    Scale shape: chunking is map-only; corpus-wide paragraph counts
    are one groupBy on the md5 of the paragraph (map-side partial
    count, then a shuffle of DISTINCT paragraphs — far smaller than
    the corpus); the count joins back on the same hash key (AQE picks
    broadcast when the distinct-paragraph side is small); the final
    per-document rollup is one shuffle on the id. Never O(n²), no
    driver state.
    """
    paras = paragraph_chunks(df, text_col, id_col, words_per_para)
    # hashed feeds both the corpus counts and the join back; checkpoint
    # so the chunk explode over the corpus runs once (cluster analog: a
    # paragraph-hash table write)
    hashed = paras.select(
        F.col(id_col), F.md5(F.col("para")).alias("para_hash")
    ).localCheckpoint(eager=False)
    counts = hashed.groupBy("para_hash").agg(
        F.count("*").alias("corpus_occurrences")
    )
    return (
        hashed.join(counts, "para_hash")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_paras"),
            F.sum((F.col("corpus_occurrences") > 1).cast("int"))
            .cast("int")
            .alias("n_dup_paras"),
            F.round(
                F.avg((F.col("corpus_occurrences") > 1).cast("double")),
                round_to,
            ).alias("dup_para_frac"),
        )
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    words_per_para: int = 10,
) -> DataFrame:
    """Paragraph-level corpus dedup: every paragraph keeps exactly ONE
    occurrence corpus-wide — the first in (id, para_idx) order — and
    each document is rebuilt from its surviving paragraphs (the
    C4/RefinedWeb-style sub-document dedup that removes boilerplate
    without dropping whole documents).

    Output: (id, clean_text, n_kept, n_removed); documents whose
    every paragraph was seen earlier come back with empty
    ``clean_text`` (and are trivially filterable), so the row count is
    exactly the input row count.

    Scale shape: the keep/drop decision is a row_number window keyed
    on the paragraph hash — one shuffle whose partitions are
    per-paragraph occurrence lists (bounded by the duplication rate,
    not the corpus); document rebuild is one groupBy(id) with an
    in-array sort (``array_sort`` of (idx, para) structs), never a
    global sort.
    """
    paras = paragraph_chunks(df, text_col, id_col, words_per_para)
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy(
        F.col(id_col), F.col("para_idx")
    )
    marked = paras.withColumn("_rn", F.row_number().over(w))
    kept_sorted = F.filter(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("para_idx"),
                    (F.col("_rn") == 1).alias("_keep"),
                    F.col("para"),
                )
            )
        ),
        lambda s: s["_keep"],
    )
    return marked.groupBy(id_col).agg(
        F.concat_ws(
            " ", F.transform(kept_sorted, lambda s: s["para"])
        ).alias("clean_text"),
        F.sum((F.col("_rn") == 1).cast("int")).cast("int").alias("n_kept"),
        F.sum((F.col("_rn") != 1).cast("int")).cast("int").alias("n_removed"),
    )


def unigram_logprob(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document mean log-probability under the corpus's own MLE
    unigram language model — the classic cheap fluency/quality signal
    (a KenLM-style perplexity filter reduced to its unigram core,
    expressible with an exact cross-engine oracle).

    Shape: one explode (map-only) -> vocab-sized count aggregation
    (the only corpus-keyed shuffle; the key is the token) -> the
    log-prob table joins back onto the token stream. The join is left
    to AQE: at test scale the vocab broadcasts automatically; at
    100 TB a natural-language vocab (~1e7 rows) exceeds broadcast and
    AQE picks a linear shuffle join on the token key. The final
    per-doc average shuffles one row per document.
    """
    tok = df.select(
        F.col(id_col), F.explode(TX.tokens(F.col(text_col))).alias("_t")
    ).filter(F.col("_t") != "")
    counts = tok.groupBy("_t").agg(F.count("*").alias("_c"))
    total = counts.agg(F.sum("_c").alias("_n"))
    lp = counts.crossJoin(F.broadcast(total)).select(
        "_t", F.log(F.col("_c") / F.col("_n")).alias("_lp")
    )
    return (
        tok.join(lp, "_t")
        .groupBy(id_col)
        .agg(
            F.round(F.avg("_lp"), 4).alias("avg_logprob"),
            F.count("*").alias("n_tokens"),
        )
    )


def dup_span_stats(
    df: DataFrame, text_col: str, id_col: str, n: int = 5
) -> DataFrame:
    """Per-document duplicated-substring exposure: the fraction of a
    document's word n-gram occurrences that also appear in at least
    one OTHER document (the span-level dedup signal of Lee et al.,
    "Deduplicating Training Data Makes Language Models Better" —
    suffix-array substring dedup reduced to fixed-width n-gram spans,
    which keeps it a linear Spark plan with an exact oracle).

    Shape: explode n-gram occurrences (map-only), md5 the gram so the
    shuffle key is fixed-width bytes rather than arbitrary-length
    text, count distinct docs per gram (one linear shuffle on the
    gram hash), left-join the multi-doc gram set back onto the
    occurrence stream (same key, ReusedExchange-friendly), then one
    row per document out. No pairwise comparison anywhere — cost is
    O(total grams), never O(docs^2).
    """
    g = df.select(
        F.col(id_col),
        F.explode(TX.shingles(F.col(text_col), n)).alias("_g"),
    ).select(F.col(id_col), F.md5("_g").alias("_h"))
    multi = (
        g.distinct()
        .groupBy("_h")
        .agg(F.count("*").alias("_nd"))
        .filter(F.col("_nd") > 1)
        .select("_h", F.lit(1).alias("_dup"))
    )
    return (
        g.join(multi, "_h", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_grams"),
            F.round(F.count("_dup") / F.count("*"), 4).alias("dup_frac"),
        )
    )


# --- model-based quality filter (FineWeb-Edu/DCLM deployment shape) ----
#
# An expensive labeler (there an LLM, here the C4/Gopher heuristic in
# functions/text.py:quality_score) labels a bounded sample; a cheap
# linear model distills it; the cheap model scores the corpus MAP-ONLY.
# Weights are a committed artifact produced by the deterministic
# trainer in scripts/train_lang_classifier.py (97% agreement with the
# teacher heuristic on the fixture corpus) — the same
# artifact-as-literal pattern as the JL projection sign matrix, which
# keeps scoring fully value-checkable cross-engine.
#
# Features: 64 md5-hashed unigram buckets (mean-pooled — the fasttext
# architecture's linear core; the PORTABLE hash so Spark and the
# DuckDB oracle agree bit-for-bit), log token count, mean token length.

CLS_DIM = 64
CLS_BIAS = -11.319737
CLS_W_LOGLEN = 36.278332
CLS_W_TOKLEN = -5.188139
CLS_WEIGHTS = [
    -0.578216, 0.808586, 0.0, 0.0,
    0.0, -0.494504, 0.0, 0.0,
    0.0, 0.0, -0.083554, 0.0,
    -0.270279, 2.497085, -0.86512, 0.0,
    0.0, 0.0, 0.0, -1.211967,
    0.0, 0.0, -0.571401, -2.244009,
    0.0, -1.226253, 0.0, -0.546392,
    0.0, 0.0, -0.154874, -2.209194,
    0.650939, 0.0, 0.0, 0.0,
    1.035842, 0.0, 0.0, -2.030271,
    0.0, -1.221813, 0.0, 0.0,
    0.0, 1.769358, 0.0, 0.0,
    -0.100418, -0.683397, 0.0, 0.0,
    0.0, 0.0, 0.0, -1.237832,
    -2.188605, 0.453877, -0.28607, 0.0,
    0.0, -0.331253, 0.0, 0.0,
]


def classifier_quality_prob(col) -> "F.Column":
    """P(doc passes the quality bar) under the distilled linear model.

    Pure column math inside whole-stage codegen: the weight vector is
    an array literal, the token fold is ``F.aggregate`` over the
    in-row token array — no join, no shuffle, no UDF. At 100 TB this
    scores as part of whatever scan already reads the text column.
    """
    toks = TX.tokens(F.col(col) if isinstance(col, str) else col)
    c = F.col(col) if isinstance(col, str) else col
    n = F.size(toks)
    warr = F.array(*[F.lit(float(w)) for w in CLS_WEIGHTS])
    bucket_w = lambda t: F.element_at(  # noqa: E731
        warr,
        (
            F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
            % CLS_DIM
            + 1
        ).cast("int"),
    )
    hashed_mean = (
        F.aggregate(toks, F.lit(0.0), lambda a, t: a + bucket_w(t)) / n
    )
    loglen = F.log1p(n.cast("double")) / 10.0
    toklen = (F.length(c) - n + 1) / n / 10.0
    z = (
        F.lit(CLS_BIAS)
        + hashed_mean
        + F.lit(CLS_W_LOGLEN) * loglen
        + F.lit(CLS_W_TOKLEN) * toklen
    )
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def gopher_rules(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Gopher rule-based quality filter (Rae et al. 2021, App. A):
    each published rule surfaced as its OWN stat + flag column, with
    ``passes`` = AND of flags — the triage table a curation run keeps
    for auditability (you filter on ``passes`` but debug per rule).

    Rules (thresholds per the paper): word count in [50, 100k]; mean
    word length in [3, 10]; symbol-to-word ratio (# / ellipsis)
    <= 0.1; >= 80% of words contain an alphabetic char; >= 2 distinct
    required stopwords present. The line-level rules (bullet /
    ellipsis line fractions) degenerate on the newline-free synthetic
    corpus and are intentionally omitted rather than vacuously
    claimed.

    All JVM array/lambda math over one split — map-only, no shuffle,
    no UDF; every ratio ROUNDed so the DuckDB oracle replays the
    flags exactly.
    """
    ws = F.filter(F.split(F.col(text_col), " "), lambda w: w != "")
    n = F.size(ws)
    total_chars = F.aggregate(
        ws, F.lit(0), lambda acc, w: acc + F.length(w)
    )
    mean_wl = F.round(total_chars / n, 4)
    n_sym = F.size(
        F.filter(
            ws,
            lambda w: w.contains("#")
            | w.contains("...")
            | w.contains("…"),
        )
    )
    sym_ratio = F.round(n_sym / n, 4)
    n_alpha = F.size(F.filter(ws, lambda w: w.rlike("[A-Za-z]")))
    alpha_frac = F.round(n_alpha / n, 4)
    n_stop = F.size(
        F.array_distinct(
            F.filter(ws, lambda w: w.isin(*TX.STOPWORDS))
        )
    )
    out = df.select(
        F.col(id_col),
        n.alias("n_words"),
        mean_wl.alias("mean_word_len"),
        sym_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        n_stop.alias("n_req_stopwords"),
    )
    flags = {
        "ok_word_count": (F.col("n_words") >= 50)
        & (F.col("n_words") <= 100000),
        "ok_mean_word_len": (F.col("mean_word_len") >= 3.0)
        & (F.col("mean_word_len") <= 10.0),
        "ok_symbol_ratio": F.col("symbol_ratio") <= 0.1,
        "ok_alpha_words": F.col("alpha_word_frac") >= 0.8,
        "ok_stopwords": F.col("n_req_stopwords") >= 2,
    }
    for name, c in flags.items():
        out = out.withColumn(name, c)
    passes = None
    for name in flags:
        passes = F.col(name) if passes is None else passes & F.col(name)
    return out.withColumn("passes", passes)
