"""Deterministic sampling + sequence packing invariants (the oracle
query pins exact membership; these pin the algebraic properties that
make the operators USEFUL in a curation pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
    sampling as SAMP,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
    load_table,
)

from .conftest import SF_ORACLE


def test_hash_sample_monotone_and_partition_invariant(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    small = set(
        r[0]
        for r in docs.filter(SAMP.hash_keep(F.col("doc_id"), 0.1))
        .select("doc_id")
        .collect()
    )
    big = set(
        r[0]
        for r in docs.filter(SAMP.hash_keep(F.col("doc_id"), 0.5))
        .select("doc_id")
        .collect()
    )
    assert small < big  # rates compose: 10% sample ⊂ 50% sample
    n = docs.count()
    assert 0.03 * n < len(small) < 0.2 * n  # roughly calibrated
    assert 0.4 * n < len(big) < 0.6 * n
    # membership survives a repartition (rand()-sampling would not)
    re = set(
        r[0]
        for r in docs.repartition(13)
        .filter(SAMP.hash_keep(F.col("doc_id"), 0.1))
        .select("doc_id")
        .collect()
    )
    assert re == small


def test_concat_chunk_pack_offsets_are_gapless(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select(
        "doc_id",
        "lang",
        F.size(F.split("text", " ")).cast("long").alias("n_tokens"),
    )
    packed = SAMP.concat_chunk_pack(
        docs, "n_tokens", "doc_id", capacity=512, partition_col="lang"
    ).collect()
    by_lang: dict[str, list] = {}
    for r in packed:
        by_lang.setdefault(r["lang"], []).append(r)
    for rows in by_lang.values():
        rows.sort(key=lambda r: r["doc_id"])
        off = 0
        for r in rows:  # documents tile the stream with no gaps/overlap
            assert r["start_off"] == off
            assert r["first_chunk"] == off // 512
            end = off + r["n_tokens"] - 1
            assert r["n_chunks"] == end // 512 - off // 512 + 1
            off += r["n_tokens"]
