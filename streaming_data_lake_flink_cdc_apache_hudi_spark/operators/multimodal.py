"""Multimodal (image/audio/video) column plumbing (SURVEY.md §7
Phase 4).

Media are opaque ``binary`` columns with a typed metadata struct —
the lakehouse-idiomatic layout (cf. Spark's built-in ``image`` and
``binaryFile`` sources). All Spark-side plumbing here is real and
tested: schemas, Arrow batch shapes, ``mapInPandas`` operator
signatures, partition-parallel execution. The codec step itself is
STUBBED deterministically — the container has no image/audio
libraries — behind ``_decode_bytes``; swapping in a real decoder
(PIL/ffmpeg) changes only that function.

Scale: mapInPandas streams Arrow batches, so per-executor memory is
bounded by batch size × blob size, not partition size; decode is
map-only (no shuffle). Repartition upstream by blob-size band if
blobs are skewed.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

DECODED_SCHEMA = (
    "media_id long, kind string, n_bytes long, checksum long, "
    "width int, height int, feature array<float>"
)


def _decode_bytes(payload: bytes) -> dict:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg.

    Reads our fake 8-byte header (2×uint16 dims + 4 ignored bytes)
    and derives a stable checksum + 8-dim feature from the payload.
    Replace with a real codec in production; the operator contract
    (dict of scalars + feature vector) is unchanged.
    """
    if payload is None or len(payload) < 8:
        raise NotImplementedError(
            "real media decoding unavailable in this environment; "
            "payload must carry the 8-byte stub header"
        )
    width = int.from_bytes(payload[0:2], "big")
    height = int.from_bytes(payload[2:4], "big")
    checksum = sum(payload) % (1 << 31)
    feature = [
        float(sum(payload[i::8]) % 256) / 255.0 for i in range(8)
    ]
    return {
        "n_bytes": len(payload),
        "checksum": checksum,
        "width": width,
        "height": height,
        "feature": feature,
    }


def decode_media(df: DataFrame) -> DataFrame:
    """payload binary → decoded scalars + feature vector, streamed
    per Arrow batch via mapInPandas."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dec = [_decode_bytes(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [d["n_bytes"] for d in dec],
                    "checksum": [d["checksum"] for d in dec],
                    "width": [d["width"] for d in dec],
                    "height": [d["height"] for d in dec],
                    "feature": [d["feature"] for d in dec],
                }
            )

    return df.mapInPandas(_op, DECODED_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """'Resize': rewrites the stub header dims (real impl: PIL resize
    inside the same mapInPandas shape)."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        header = target_w.to_bytes(2, "big") + target_h.to_bytes(2, "big")
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                None if p is None else header + bytes(p)[4:] for p in pdf["payload"]
            ]
            yield pdf

    return df.mapInPandas(_op, df.schema)


def frame_sample(df: DataFrame, every_n_bytes: int = 64) -> DataFrame:
    """'Frame sampling' for video-kind rows: explode the payload into
    fixed-stride chunks (real impl: ffmpeg keyframe extraction). One
    output row per sampled frame — the fan-out shape a real video
    pipeline has."""

    def _op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                b = bytes(payload)
                for i in range(0, len(b), every_n_bytes):
                    ids.append(mid)
                    idxs.append(i // every_n_bytes)
                    frames.append(b[i : i + every_n_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(
        _op, "media_id long, frame_idx int, frame binary"
    )


def make_fake_media(spark, n: int = 32, seed: int = 7) -> DataFrame:
    """Deterministic fixture generator for the media table (tests)."""
    import random

    rng = random.Random(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        w, h = rng.randrange(8, 512), rng.randrange(8, 512)
        body = bytes(rng.randrange(256) for _ in range(rng.randrange(64, 256)))
        payload = w.to_bytes(2, "big") + h.to_bytes(2, "big") + body
        rows.append(
            (
                i,
                kind,
                bytearray(payload),
                {
                    "mime": f"{kind}/x-stub",
                    "n_bytes": len(payload),
                    "width": w,
                    "height": h,
                    "duration_ms": len(body),
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
