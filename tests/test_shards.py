"""Training-shard materialization: deterministic layout, sorted
within-shard order, manifest write + distributed verification."""

from __future__ import annotations

import json
import os

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.curation import shard_assign
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.shards import (
    MANIFEST_NAME,
    verify_shards,
    write_training_shards,
)

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text", "source"
    )


def test_write_then_verify_green(spark, tmp_path):
    out = str(tmp_path / "shards")
    m = write_training_shards(_docs(spark), "doc_id", out, n_shards=4)
    assert m["total_rows"] == _docs(spark).count()
    assert set(m["shards"]) <= {"0", "1", "2", "3"}
    assert all(s["dense_order"] for s in m["shards"].values())
    assert verify_shards(spark, out)["ok"]


def test_rewrite_is_bit_identical_manifest(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ma = write_training_shards(_docs(spark), "doc_id", a, n_shards=3, seed="s1")
    # different partition layout in, same corpus -> identical manifest
    mb = write_training_shards(
        _docs(spark).repartition(7), "doc_id", b, n_shards=3, seed="s1"
    )
    assert ma == mb


def test_within_shard_order_matches_assignment(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(_docs(spark), "doc_id", out, n_shards=2, seed="x")
    expected = {
        (r["shard"], r["pack_position"]): r["doc_id"]
        for r in shard_assign(_docs(spark), "doc_id", 2, seed="x").collect()
    }
    got = spark.read.parquet(out).collect()
    assert len(got) == len(expected)
    for r in got:
        assert expected[(r["shard"], r["pack_position"])] == r["doc_id"]


def test_verify_flags_tampered_manifest(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(_docs(spark), "doc_id", out, n_shards=2)
    p = os.path.join(out, MANIFEST_NAME)
    with open(p) as fh:
        m = json.load(fh)
    m["shards"]["0"]["rows"] += 1
    m["shards"]["1"]["id_checksum"] ^= 0xFF
    with open(p, "w") as fh:
        json.dump(m, fh)
    res = verify_shards(spark, out)
    assert not res["ok"]
    broken = {(x["shard"], x.get("invariant")) for x in res["mismatches"]}
    assert (0, "rows") in broken and (1, "id_checksum") in broken
