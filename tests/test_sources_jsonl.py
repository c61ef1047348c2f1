"""JSONL corpus source: schema-declared read, corrupt-line
quarantine, shard write round-trip (sources/jsonl.py)."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources import jsonl as J
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table

from .conftest import SF_ORACLE


def test_jsonl_read_quarantines_corrupt_lines(spark, tmp_path):
    p = tmp_path / "corpus.jsonl"
    lines = [
        json.dumps(
            {"doc_id": 1, "text": "hello world", "lang": "en",
             "source": "s1", "n_chars": 11}
        ),
        "{this is not json",
        json.dumps(
            {"doc_id": 2, "text": "bonjour", "lang": "fr",
             "source": "s2", "n_chars": 7}
        ),
        "[1,2,3",
    ]
    p.write_text("\n".join(lines) + "\n")

    good, bad = J.read_jsonl(spark, str(p), J.DOCUMENT_SCHEMA)
    assert [f.name for f in good.schema.fields] == [
        "doc_id", "text", "lang", "source", "n_chars",
    ]
    rows = sorted(tuple(r) for r in good.collect())
    assert rows == [
        (1, "hello world", "en", "s1", 11),
        (2, "bonjour", "fr", "s2", 7),
    ]
    quarantined = sorted(r["raw_line"] for r in bad.collect())
    assert quarantined == ["[1,2,3", "{this is not json"]


def test_jsonl_roundtrip_documents(spark, tmp_path):
    """documents.parquet -> sharded JSONL -> read back identical; no
    corrupt lines; shard count honored (no single-writer funnel)."""
    d = load_table(spark, SF_ORACLE, "documents")
    out = str(tmp_path / "shards")
    J.write_jsonl(d, out, num_files=4)
    parts = [
        f for f in os.listdir(out) if f.startswith("part-") and f.endswith(".json")
    ]
    assert len(parts) == 4

    good, bad = J.read_jsonl(spark, out, J.DOCUMENT_SCHEMA)
    assert bad.count() == 0
    orig = sorted(tuple(r) for r in d.select(*sorted(d.columns)).collect())
    back = sorted(tuple(r) for r in good.select(*sorted(good.columns)).collect())
    assert back == orig


def test_jsonl_stream_ingests_incrementally(spark, tmp_path):
    """Files dropped into the corpus dir arrive as micro-batches;
    clean rows and corrupt lines split downstream of one scan."""
    import json as _json

    d = tmp_path / "drop"
    d.mkdir()
    (d / "a.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "one", "lang": "en",
                     "source": "s", "n_chars": 3}) + "\n"
    )
    stream = J.read_jsonl_stream(spark, str(d), J.DOCUMENT_SCHEMA)
    assert stream.isStreaming
    q = (
        stream.writeStream.format("memory")
        .queryName("jsonl_feed")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        (d / "b.jsonl").write_text(
            "not json at all\n"
            + _json.dumps({"doc_id": 2, "text": "two", "lang": "fr",
                           "source": "s", "n_chars": 3}) + "\n"
        )
        q.processAllAvailable()
        tbl = spark.table("jsonl_feed")
        good = tbl.where(F.col("_corrupt_line").isNull())
        bad = tbl.where(F.col("_corrupt_line").isNotNull())
        assert sorted(r["doc_id"] for r in good.collect()) == [1, 2]
        assert [r["_corrupt_line"] for r in bad.collect()] == [
            "not json at all"
        ]
    finally:
        q.stop()
