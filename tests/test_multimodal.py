"""Multimodal plumbing: binary payload columns through mapInPandas
(decode / resize / frame-sample), per SURVEY.md §7 Phase 4. Decode is
a deterministic stub; the Spark-side schema/batch plumbing is real.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.make_fake_media(spark, n=30).cache()


def test_decode_schema_and_determinism(spark, media):
    dec = MM.decode_media(media)
    assert dec.columns == [
        "media_id", "kind", "n_bytes", "checksum", "width", "height", "feature"
    ]
    rows = {r["media_id"]: r for r in dec.collect()}
    assert len(rows) == 30
    # dims round-trip from the stub header
    meta = {r["media_id"]: r["meta"] for r in media.collect()}
    for mid, r in rows.items():
        assert r["width"] == meta[mid]["width"]
        assert r["height"] == meta[mid]["height"]
        assert len(r["feature"]) == 8
    # deterministic across runs
    rows2 = {r["media_id"]: r for r in MM.decode_media(media).collect()}
    assert all(rows[m]["checksum"] == rows2[m]["checksum"] for m in rows)


def test_resize_rewrites_dims(spark, media):
    resized = MM.resize_stub(media, 64, 48)
    dec = {r["media_id"]: r for r in MM.decode_media(resized).collect()}
    assert all(r["width"] == 64 and r["height"] == 48 for r in dec.values())


def test_frame_sample_fanout(spark, media):
    frames = MM.frame_sample(media, every_n_bytes=32)
    n_videos = media.filter(F.col("kind") == "video").count()
    assert frames.select("media_id").distinct().count() == n_videos
    # stride contract: ceil(len/32) frames per video
    sizes = {
        r["media_id"]: r["meta"]["n_bytes"]
        for r in media.filter(F.col("kind") == "video").collect()
    }
    counts = {
        r["media_id"]: r["n"]
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    for mid, nb in sizes.items():
        assert counts[mid] == -(-nb // 32)


def test_decode_rejects_headerless_payload(spark):
    bad = spark.createDataFrame(
        [(1, "image", bytearray(b"abc"), None)], MM.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="stub header|NotImplementedError"):
        MM.decode_media(bad).collect()
