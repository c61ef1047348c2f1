"""One-off trainer for the product-quantization codebooks (Jégou et
al., "Product Quantization for Nearest Neighbor Search", TPAMI'11 —
the FAISS IndexPQ shape at small scale: m=16 subspaces x k=16 codes
over the 64-dim embeddings, L2 on unit-normalized vectors so ADC
ranking is cosine-equivalent).

Deterministic on purpose (fixed init = evenly spaced vectors in
vec_id order, 15 Lloyd iterations, float64): the codebooks are a
committed artifact (PQ_CODEBOOKS in operators/similarity.py), the
same artifact-as-literal pattern as the JL sign matrix and the
quality-classifier weights — which is what makes PQ encode + ADC
scoring fully value-checkable against a DuckDB oracle.

Run: python scripts/train_pq_codebooks.py
"""

from __future__ import annotations

import duckdb
import numpy as np

M, K = 16, 16  # subspaces x codes; 64-dim -> 4 dims per subspace
SF_DIR = "/root/testdata/sf0.01"


def main() -> None:
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT embedding FROM read_parquet('{SF_DIR}/embeddings.parquet')"
        " ORDER BY vec_id"
    ).fetchall()
    X = np.array([r[0] for r in rows], dtype=np.float64)
    X /= np.linalg.norm(X, axis=1, keepdims=True)
    d_sub = X.shape[1] // M
    books = []
    for s in range(M):
        sub = X[:, s * d_sub : (s + 1) * d_sub]
        # deterministic init: evenly spaced rows in vec_id order
        idx = np.linspace(0, len(sub) - 1, K).astype(int)
        C = sub[idx].copy()
        for _ in range(15):
            d2 = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            for j in range(K):
                pts = sub[a == j]
                if len(pts):
                    C[j] = pts.mean(0)
        q = ((sub - C[d2.argmin(1)]) ** 2).sum(-1).mean()
        print(f"# subspace {s}: mean residual {q:.5f}")
        books.append(C)

    print("PQ_M, PQ_K = %d, %d" % (M, K))
    print("PQ_CODEBOOKS = [")
    for C in books:
        print("  [")
        for c in C:
            print(
                "    [" + ", ".join(str(round(x, 6)) for x in c) + "],"
            )
        print("  ],")
    print("]")


if __name__ == "__main__":
    main()
