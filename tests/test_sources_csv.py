"""CSV ingestion: declared-schema read, malformed-row quarantine
(never dropped), per-shard header handling, streaming parity."""

from __future__ import annotations

import os

from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.csv import (
    read_csv,
    read_csv_stream,
)

SCHEMA = StructType(
    [
        StructField("id", LongType()),
        StructField("name", StringType()),
        StructField("score", DoubleType()),
    ]
)

GOOD = ["1,alpha,0.5", "2,beta,1.25", "3,gamma,9.0"]
BAD = ["4,delta,notanumber", "5,epsilon,1.0,extra,fields"]


def _write(path, lines, header=True):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as fh:
        if header:
            fh.write("id,name,score\n")
        fh.write("\n".join(lines) + "\n")


def test_clean_and_quarantine_split(spark, tmp_path):
    _write(str(tmp_path / "in" / "part1.csv"), GOOD + BAD)
    good, bad = read_csv(spark, str(tmp_path / "in"), SCHEMA)
    assert sorted(r["id"] for r in good.collect()) == [1, 2, 3]
    assert good.columns == ["id", "name", "score"]
    raw = sorted(r["raw_line"] for r in bad.collect())
    assert raw == sorted(BAD)


def test_values_and_multi_shard_headers(spark, tmp_path):
    """Every shard carries its own header; all must be dropped."""
    _write(str(tmp_path / "in2" / "a.csv"), GOOD[:2])
    _write(str(tmp_path / "in2" / "b.csv"), GOOD[2:])
    good, bad = read_csv(spark, str(tmp_path / "in2"), SCHEMA)
    assert bad.count() == 0
    rows = {r["id"]: (r["name"], r["score"]) for r in good.collect()}
    assert rows == {1: ("alpha", 0.5), 2: ("beta", 1.25), 3: ("gamma", 9.0)}


def test_tsv_separator(spark, tmp_path):
    p = str(tmp_path / "in3" / "a.tsv")
    os.makedirs(os.path.dirname(p))
    with open(p, "w") as fh:
        fh.write("id\tname\tscore\n1\talpha\t0.5\n")
    good, bad = read_csv(spark, str(tmp_path / "in3"), SCHEMA, sep="\t")
    assert bad.count() == 0
    assert [tuple(r) for r in good.collect()] == [(1, "alpha", 0.5)]


def test_streaming_file_drop(spark, tmp_path):
    src = tmp_path / "stream_in"
    os.makedirs(src)
    _write(str(src / "f1.csv"), GOOD[:2])
    stream = read_csv_stream(spark, str(src), SCHEMA)
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("csv_stream")
        .start()
    )
    q.processAllAvailable()
    _write(str(src / "f2.csv"), GOOD[2:] + BAD[:1])
    q.processAllAvailable()
    rows = spark.sql("SELECT * FROM csv_stream").collect()
    q.stop()
    ids = sorted(r["id"] for r in rows if r["_corrupt_line"] is None)
    n_bad = sum(1 for r in rows if r["_corrupt_line"] is not None)
    assert ids == [1, 2, 3]
    assert n_bad == 1
