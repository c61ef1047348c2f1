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


def test_jsonl_stream_to_lake_with_incremental_pickup(spark, tmp_path):
    """Full corpus-landing loop: JSONL shards drop -> streaming parse
    -> clean rows MERGE into the lake keyed by doc_id -> a downstream
    consumer reads ONLY the new docs via incremental(); corrupt lines
    go to a quarantine parquet sink. Exercises the composition a real
    continuous-curation pipeline runs."""
    import json as _json

    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    d = tmp_path / "drop"
    d.mkdir()
    quarantine = str(tmp_path / "quarantine")
    table = UpsertLakeTable(
        spark, str(tmp_path / "corpus_lake"), key="doc_id"
    )

    def land(batch, epoch_id):
        good = batch.where(F.col("_corrupt_line").isNull()).drop(
            "_corrupt_line"
        )
        bad = batch.where(F.col("_corrupt_line").isNotNull()).select(
            F.col("_corrupt_line").alias("raw_line")
        )
        table.write(good, commit_id=f"jsonl-{epoch_id}")
        bad.write.mode("append").parquet(quarantine)

    (d / "a.jsonl").write_text(
        _json.dumps({"doc_id": 1, "text": "one", "lang": "en",
                     "source": "s", "n_chars": 3}) + "\n"
    )
    stream = J.read_jsonl_stream(spark, str(d), J.DOCUMENT_SCHEMA)
    q = (
        stream.writeStream.foreachBatch(land)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
        seq_after_first = max(
            (c["seq"] for c in table.commits()), default=0
        )
        assert sorted(
            r["doc_id"] for r in table.snapshot().collect()
        ) == [1]

        (d / "b.jsonl").write_text(
            "corrupt!\n"
            + _json.dumps({"doc_id": 2, "text": "two", "lang": "fr",
                           "source": "s", "n_chars": 3}) + "\n"
            + _json.dumps({"doc_id": 1, "text": "one-v2", "lang": "en",
                           "source": "s", "n_chars": 6}) + "\n"
        )
        q.processAllAvailable()
    finally:
        q.stop()

    # lake converged: doc 1 updated in place, doc 2 appended
    snap = {r["doc_id"]: r["text"] for r in table.snapshot().collect()}
    assert snap == {1: "one-v2", 2: "two"}
    # incremental consumer sees exactly the second batch's changes
    inc = sorted(
        r["doc_id"]
        for r in table.incremental(since_seq=seq_after_first).collect()
    )
    assert inc == [1, 2]
    # corrupt line quarantined for audit
    qrows = [r["raw_line"] for r in spark.read.parquet(quarantine).collect()]
    assert qrows == ["corrupt!"]
