"""Streaming incremental near-dup: batches checked against the
at-rest LSH index must find exactly the pairs the batch operator
finds on the full corpus; replayed epochs are no-ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.neardup import (
    StreamingNearDupIndex,
    stream_near_dup,
)

from .conftest import SF_SMOKE


def _corpus(spark):
    """sf0.001 documents plus planted near-copies across batch
    boundaries: b2 contains a light edit of a b1 doc, b3 an exact
    copy of a b1 doc and a near-copy of a b2 doc."""
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text")
        .filter(F.col("doc_id") <= 30)
    )
    rows = {r["doc_id"]: r["text"] for r in docs.collect()}
    ids = sorted(rows)
    b1 = [(i, rows[i]) for i in ids[:10]]
    b2 = [(i, rows[i]) for i in ids[10:20]]
    b2.append((9001, rows[ids[0]] + " extra tail words appended here"))
    b3 = [(i, rows[i]) for i in ids[20:]]
    b3.append((9002, rows[ids[3]]))  # exact copy of a b1 doc
    b3.append((9003, rows[ids[11]] + " tiny edit"))  # near-copy of b2 doc
    mk = lambda rows_: spark.createDataFrame(rows_, "doc_id LONG, text STRING")
    return mk(b1), mk(b2), mk(b3), mk(b1 + b2 + b3)


def _norm(df):
    return {
        (min(r["doc_id"], r["dup_of"]), max(r["doc_id"], r["dup_of"]))
        for r in df.collect()
    }


def test_incremental_matches_equal_batch_pairs(spark, tmp_path):
    b1, b2, b3, full = _corpus(spark)
    idx = StreamingNearDupIndex(
        spark, str(tmp_path / "nd"), num_buckets=4, jaccard_threshold=0.5
    )
    m1 = idx.apply(b1, epoch_id=0)
    m2 = idx.apply(b2, epoch_id=1)
    m3 = idx.apply(b3, epoch_id=2)
    # every incremental match names the NEW doc first
    for m, newest in [(m2, {9001}), (m3, {9002, 9003})]:
        got_new = {r["doc_id"] for r in m.collect() if r["doc_id"] >= 9000}
        assert newest <= got_new
    got = _norm(idx.duplicates())
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            full, "text", "doc_id", jaccard_threshold=0.5
        ).collect()
    }
    assert got == want and want  # parity, and the fixture isn't vacuous
    # replaying an epoch must not duplicate matches or index rows
    n_sigs = idx.sigs.snapshot().count()
    idx.apply(b3, epoch_id=2)
    assert _norm(idx.duplicates()) == want
    assert idx.sigs.snapshot().count() == n_sigs


def test_stream_near_dup_end_to_end(spark, tmp_path):
    b1, b2, b3, full = _corpus(spark)
    feed = tmp_path / "docs"
    feed.mkdir()
    for i, b in enumerate([b1, b2, b3]):
        b.coalesce(1).write.parquet(str(feed / f"b{i}.parquet"))
    stream = (
        spark.readStream.schema(b1.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(feed / "*"))
    )
    idx, q = stream_near_dup(
        spark,
        stream,
        str(tmp_path / "ndx"),
        checkpoint_dir=str(tmp_path / "ck"),
        trigger={"availableNow": True},
        num_buckets=4,
        jaccard_threshold=0.5,
    )
    q.awaitTermination(300)
    got = _norm(idx.duplicates())
    want = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            full, "text", "doc_id", jaccard_threshold=0.5
        ).collect()
    }
    assert got == want and want


def test_empty_and_single_doc_batches(spark, tmp_path):
    """No-data micro-batches are no-ops; a single-doc batch indexes
    cleanly; an exact copy in a later batch is detected."""
    idx = StreamingNearDupIndex(spark, str(tmp_path / "nd2"), num_buckets=2)
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert idx.apply(empty, epoch_id=0).count() == 0
    one = spark.createDataFrame(
        [(1, "hello world this is a doc")], "doc_id LONG, text STRING"
    )
    assert idx.apply(one, epoch_id=1).count() == 0
    two = spark.createDataFrame(
        [(2, "hello world this is a doc")], "doc_id LONG, text STRING"
    )
    got = [(r["doc_id"], r["dup_of"]) for r in idx.apply(two, epoch_id=2).collect()]
    assert got == [(2, 1)]


def test_reingested_doc_does_not_match_itself(spark, tmp_path):
    """A doc_id arriving again (source replay / re-crawl) collides
    with its own indexed band keys — that must NOT surface as a
    duplicate pair."""
    idx = StreamingNearDupIndex(spark, str(tmp_path / "nd3"), num_buckets=2)
    doc = spark.createDataFrame(
        [(7, "the same document text arriving twice over time")],
        "doc_id LONG, text STRING",
    )
    assert idx.apply(doc, epoch_id=0).count() == 0
    again = idx.apply(doc, epoch_id=1)
    assert again.count() == 0  # self-match filtered
