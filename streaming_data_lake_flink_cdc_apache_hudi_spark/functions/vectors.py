"""Vector column functions (embedding similarity, SURVEY.md §7
Phase 4).

Built on ``F.zip_with`` / ``F.aggregate`` — JVM-side, codegen-able,
no Python or UDF in the path. Embeddings are stored ``array<float>``;
math is done in double (cast first) so results are reproducible and
comparable with the DuckDB oracle (both accumulate sequentially in
double → bitwise-identical sums).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec) -> Column:
    return F.transform(vec, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes for sign-LSH (driver-
    side constants, broadcast into the plan as literals)."""
    import random

    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)
    ]


def lsh_bucket(vec, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: one bit per hyperplane (sign of the dot
    product), packed into a long. Vectors close in cosine land in the
    same bucket with high probability; used to prune candidate pairs
    in near-dup dedup and ANN search."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        p = F.array(*[F.lit(v) for v in plane])
        bit = (dot(as_double(vec), p) >= 0).cast("long")
        bucket = bucket + (bit * F.lit(1 << i)).cast("long")
    return bucket


# --- int8 scalar quantization (the 100 TB embedding-storage path:
# 4x smaller vectors, cosine served from int8 with a per-vector
# scale; exact DuckDB parity via the floor(x+0.5) rounding formula —
# both engines' IEEE doubles agree, unlike engine-native round()) ---


def quantize_scale(vec) -> Column:
    """Per-vector symmetric scale: max|x| / 127 (guarded for the
    all-zero vector)."""
    return F.greatest(
        F.array_max(F.transform(as_double(vec), lambda x: F.abs(x))) / 127.0,
        F.lit(1e-30),
    )


def quantize_int8(vec, scale) -> Column:
    """int8 codes: floor(x/scale + 0.5) — round-half-toward-+inf,
    deterministic and identical in any engine with floor."""
    return F.transform(
        as_double(vec), lambda x: F.floor(x / scale + F.lit(0.5)).cast("int")
    )


def dequantize(q, scale) -> Column:
    return F.transform(q, lambda x: x.cast("double") * scale)
