"""Distributed BPE merge learning — the tokenizer-training half of a
training-data pipeline (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units"; the counting loop every
BPE/WordPiece trainer runs before a model ever sees data).

Why this shape scales (the part that matters at 100 TB of text):

- The corpus is touched ONCE: one scan + one shuffle aggregates it to
  the (word, frequency) table — classic BPE operates on word SHAPES,
  so everything after that runs on the distinct-word table, which is
  orders of magnitude smaller than the corpus and independent of
  corpus growth once vocabulary saturates (Heaps' law).
- Each merge iteration is pure DataFrame algebra, JVM-side: adjacent
  pairs come from ``zip_with`` over two ``slice``s of the symbol
  array (no explode of characters, no Python), the weighted count is
  one partial-aggregated groupBy over the word table, and the winning
  merge applies via ``F.aggregate``'s lambda fold — a sequential
  left-to-right rebuild of each symbol array inside whole-stage
  codegen, which is exactly the merge step's semantics (left-most
  application, no overlapping re-merge of a just-built symbol).
- The only driver traffic per iteration is the argmax row (one pair +
  count); the word table is cached and localCheckpointed every few
  iterations so the lineage stays flat (the PageRank discipline).

Determinism: ties on count break lexicographically on the pair
string, so the learned merge list is engine-independent (pinned by a
differential test against a pure-Python reference implementation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# localCheckpoint cadence: deep enough to amortize, shallow enough to
# keep the aggregate-fold expression trees from nesting
_CHECKPOINT_EVERY = 8


def word_frequencies(
    docs: DataFrame, text_col: str, lowercase: bool = True
) -> DataFrame:
    """(word, freq) over whitespace-split text — the ONE corpus-sized
    aggregation; everything downstream runs on this table."""
    txt = F.lower(F.col(text_col)) if lowercase else F.col(text_col)
    return (
        docs.select(F.explode(F.split(txt, r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
    )


def _pair_counts(symbols: DataFrame) -> DataFrame:
    """(pair, cnt) of ADJACENT symbol pairs weighted by word freq —
    pair key is the two symbols space-joined (symbols never contain
    whitespace: words were split on it)."""
    n = F.size("syms")
    pairs = F.zip_with(
        F.slice("syms", 1, n - 1),
        F.expr("slice(syms, 2, size(syms) - 1)"),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        symbols.filter(n >= 2)
        .select(F.explode(pairs).alias("pair"), "freq")
        .groupBy("pair")
        .agg(F.sum("freq").alias("cnt"))
    )


def _apply_merge(symbols: DataFrame, left: str, right: str) -> DataFrame:
    """Rebuild each symbol array with every left-adjacent (left,
    right) occurrence fused — ``F.aggregate``'s lambda fold gives the
    sequential left-to-right semantics (a fused symbol is never
    re-fused with the element that followed it in the SAME pass),
    entirely JVM-side."""
    merged = F.concat_ws("", F.lit(left), F.lit(right))
    fold = F.aggregate(
        "syms",
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            # try_element_at: NULL (-> no fuse) on the empty initial acc
            (F.try_element_at(acc, F.lit(-1)) == F.lit(left))
            & (x == F.lit(right)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )
    return symbols.withColumn("syms", fold)


def learn_bpe_merges(
    docs: DataFrame,
    text_col: str,
    num_merges: int,
    lowercase: bool = True,
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` BPE merges: [(left, right, count)], most
    frequent first, ties lexicographic. Stops early when no pair
    reaches ``min_pair_count`` (merging hapax pairs only memorizes
    noise). Driver traffic: ONE row per iteration."""
    wf = word_frequencies(docs, text_col, lowercase=lowercase)
    symbols = wf.select(
        F.split("word", "").alias("syms"), "freq"
    ).localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for i in range(num_merges):
        top = (
            _pair_counts(symbols)
            .orderBy(F.col("cnt").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_pair_count:
            break
        left, right = top[0]["pair"].split(" ", 1)
        merges.append((left, right, int(top[0]["cnt"])))
        symbols = _apply_merge(symbols, left, right)
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            symbols = symbols.localCheckpoint()
    return merges


def segment_words(
    docs: DataFrame,
    text_col: str,
    merges: list[tuple[str, str, int]] | list[tuple[str, str]],
    lowercase: bool = True,
) -> DataFrame:
    """Apply a learned merge list to the corpus vocabulary:
    (word, freq, pieces array) — the tokenizer's segmentation of
    every distinct word, merges applied in learned order (BPE's
    apply-time rule). Same JVM fold as learning; corpus scanned
    once."""
    wf = word_frequencies(docs, text_col, lowercase=lowercase)
    symbols = wf.select(
        "word", "freq", F.split("word", "").alias("syms")
    )
    for i, m in enumerate(merges):
        symbols = _apply_merge(symbols, m[0], m[1])
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            symbols = symbols.localCheckpoint()
    return symbols.withColumnRenamed("syms", "pieces")
