"""Distributed BPE merge learning (operators/bpe.py) vs a pure-Python
reference implementation of Sennrich-style merge learning — identical
merge lists (count + lexicographic tie-break) and segmentations."""

from __future__ import annotations

import random
from collections import Counter

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.bpe import (
    learn_bpe_merges,
    segment_words,
)


def _ref_bpe(word_freq: dict[str, int], num_merges: int, min_count: int = 2):
    """Reference BPE (Sennrich alg. 1): dict-of-tuples vocab,
    recount + argmax per iteration, left-to-right merge
    application."""
    vocab = {tuple(w): c for w, c in word_freq.items()}
    merges = []
    for _ in range(num_merges):
        counts: Counter = Counter()
        for syms, c in vocab.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += c
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), cnt = best
        if cnt < min_count:
            break
        merges.append((a, b, cnt))
        new_vocab = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges, vocab


def test_sennrich_textbook_example(spark):
    docs = spark.createDataFrame(
        [(" ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6
                   + ["widest"] * 3),)],
        "text string",
    )
    merges = learn_bpe_merges(docs, "text", 6)
    # the classic progression: es, est, then the low/new stems
    assert merges[0][:2] == ("e", "s") and merges[1][:2] == ("es", "t")
    assert ("l", "o") in [(a, b) for a, b, _ in merges]
    seg = {r.word: list(r.pieces)
           for r in segment_words(docs, "text", merges).collect()}
    assert seg["low"] == ["low"]
    assert seg["newest"][-1].endswith("est")


def test_randomized_differential_vs_reference(spark):
    rng = random.Random(7)
    vocab = ["ab", "abc", "bcd", "abab", "cab", "dab", "bc", "aabb",
             "deed", "dead", "bead", "cede"]
    words = [rng.choice(vocab) for _ in range(400)]
    text = " ".join(words)
    docs = spark.createDataFrame([(t,) for t in [text[: len(text) // 2],
                                                 text[len(text) // 2 :]]],
                                 "text string")
    # reference word freq must match the operator's whitespace split
    wf = Counter(w for t in [text[: len(text) // 2],
                             text[len(text) // 2 :]]
                 for w in t.lower().split() if w)
    want, _ = _ref_bpe(dict(wf), 10)
    got = learn_bpe_merges(docs, "text", 10)
    assert got == want and len(got) == 10
    # segmentation parity on the learned merges
    _, ref_vocab = _ref_bpe(dict(wf), 10)
    got_seg = {r.word: tuple(r.pieces)
               for r in segment_words(docs, "text", got).collect()}
    ref_seg = {}
    for syms in ref_vocab:
        ref_seg["".join(syms)] = syms
    assert got_seg == ref_seg


def test_min_pair_count_stops_early(spark):
    docs = spark.createDataFrame([("xy zq mn",)], "text string")
    # every pair is a hapax -> nothing to learn
    assert learn_bpe_merges(docs, "text", 5) == []
