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


def portable_hyperplanes(
    dim: int, n_planes: int, seed: int = 42
) -> list[list[float]]:
    """``random_hyperplanes`` quantized to integer-valued doubles
    (floor(w*1000 + 0.5)). Against vectors that are themselves
    integer-valued (the portable near-dup family), every plane dot
    product is an exact integer below 2^53 — its double sum is
    identical in ANY engine and ANY summation order, so sign-LSH
    bucket ids replay exactly in an external oracle."""
    import math

    return [
        [float(math.floor(w * 1000 + 0.5)) for w in plane]
        for plane in random_hyperplanes(dim, n_planes, seed)
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


def projection_signs(dim: int, n_out: int, seed: int = 7) -> list[list[int]]:
    """Deterministic ±1 sign matrix for sparse random projection
    (Achlioptas, JL-lemma family). Driver-side constants — like
    ``random_hyperplanes`` they are baked into the plan as literals
    and into the generated DuckDB oracle, so the reduction is exactly
    reproducible in any engine with no RNG at query time."""
    import random

    rng = random.Random(seed)
    return [[rng.choice((-1, 1)) for _ in range(dim)] for _ in range(n_out)]


def random_project(vec, signs: list[list[int]]) -> Column:
    """Project ``vec`` (array<double>) to ``len(signs)`` dimensions:
    out[i] = (1/sqrt(n_out)) * sum_j vec[j] * signs[i][j].

    Pure column math (one zip_with + sequential aggregate fold per
    output dim) — map-only, codegen-side, no UDF and no shuffle; the
    standard cheap dimensionality reduction before ANN indexing or
    clustering at corpus scale."""
    import math

    scale = 1.0 / math.sqrt(len(signs))
    outs = []
    for row in signs:
        lits = F.array(*[F.lit(float(s)) for s in row])
        outs.append(
            F.lit(scale)
            * F.aggregate(
                F.zip_with(vec, lits, lambda x, s: x * s),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
        )
    return F.array(*outs)
