"""One-off trainer for the hashed-feature linear quality/language
classifier (fasttext-architecture reduced to its linear core).

Reads the sf0.01 documents fixture, hashes unigrams into 64 buckets
with the engine's PORTABLE md5 hash (identical expression exists in
Spark and DuckDB) plus two engineered features (log token count,
mean token length), and fits binary logistic regression by
full-batch gradient descent — zero init, fixed iteration count,
float64 — so the run is reproducible bit-for-bit.

The label distilled is the C4/Gopher-style ``quality_score >= 0.7``
heuristic — the FineWeb-Edu/DCLM deployment shape: an expensive
labeler (there an LLM, here the heuristic) labels a bounded sample,
a cheap linear model is fit to it, and the CHEAP model scores the
full corpus map-only.

The resulting weights are committed as literals in
``operators/curation.py`` (CLS_* constants), the same
artifact-as-literal pattern as the JL projection sign matrix: the
engine SCORES distributedly (map-only column math); training is an
offline, bounded, driver-side step — which is exactly how production
model-based corpus filters (fasttext lang-ID, DCLM/FineWeb-style
quality models) are deployed.

Run: python scripts/train_lang_classifier.py
"""

from __future__ import annotations

import hashlib

import duckdb
import numpy as np

DIM = 64
SF_DIR = "/root/testdata/sf0.01"


def bucket(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:8], 16) % DIM


def main() -> None:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT text FROM read_parquet('{SF_DIR}/documents.parquet')"
        " ORDER BY doc_id"
    ).fetchall()
    stop = {"the", "a", "of", "and", "is"}
    X = np.zeros((len(rows), DIM + 2))
    y = np.zeros(len(rows))
    for i, (text,) in enumerate(rows):
        toks = text.split(" ")  # documents are single-spaced
        for t in toks:
            X[i, bucket(t)] += 1.0
        X[i, :DIM] /= len(toks)
        X[i, DIM] = np.log1p(len(toks)) / 10.0
        X[i, DIM + 1] = (len(text) - len(toks) + 1) / len(toks) / 10.0
        n_stop = sum(1 for t in toks if t in stop)
        q = (
            (0.4 if 50 <= len(toks) <= 100000 else 0.0)
            + (0.3 if n_stop / len(toks) > 0.01 else 0.0)
            + (0.3 if 2.5 <= X[i, DIM + 1] * 10 <= 12.0 else 0.0)
        )
        y[i] = 1.0 if q >= 0.7 else 0.0

    w = np.zeros(DIM + 2)
    b = 0.0
    lr = 2.0
    for _ in range(2000):
        z = X @ w + b
        p = 1.0 / (1.0 + np.exp(-z))
        g = p - y
        w -= lr * (X.T @ g) / len(y)
        b -= lr * g.mean()

    p = 1.0 / (1.0 + np.exp(-(X @ w + b)))
    acc = ((p >= 0.5) == (y == 1.0)).mean()
    print(f"train accuracy: {acc:.4f}")
    print(f"CLS_BIAS = {round(b, 6)}")
    print(f"CLS_W_LOGLEN = {round(w[DIM], 6)}")
    print(f"CLS_W_TOKLEN = {round(w[DIM + 1], 6)}")
    print(
        "CLS_WEIGHTS = [\n    "
        + ",\n    ".join(
            ", ".join(str(round(x, 6)) for x in w[i : i + 4])
            for i in range(0, DIM, 4)
        )
        + ",\n]"
    )


if __name__ == "__main__":
    main()
