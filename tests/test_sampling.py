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


def test_approx_sketches_error_bounds(spark):
    """HLL++ distinct and approx percentiles must land within tight
    relative error of the exact answers (the sketches are the scale
    path; exactness within rsd is their contract)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import (
        QUERIES,
    )

    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["approx_sketches"].fn(spark, SF_ORACLE).collect()
    }
    li = load_table(spark, SF_ORACLE, "lineitem")
    exact = {
        r["l_returnflag"]: r["supps"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("supps"))
        .collect()
    }
    assert set(rows) == set(exact)
    # the query now carries its own error-bound gates as columns (the
    # oracle-checkable surface): exact side must match, flags all TRUE
    for flag, supps in exact.items():
        r = rows[flag]
        assert r["exact_supps"] == supps
        assert r["cd_ok"] and r["p50_ok"] and r["p99_ok"]


def test_mixture_resample_flattens_distribution(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.sampling import (
        mixture_resample,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_ORACLE

    d = load_table(spark, SF_ORACLE, "documents")
    before = {r["lang"]: r["n"] for r in
              d.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    out = mixture_resample(d, "lang", "doc_id", budget=300, temperature=0.5)
    after = {r["lang"]: r["n"] for r in
             out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # head stratum (en) is downsampled; tail strata keep most docs
    assert after["en"] < before["en"]
    for lang in before:
        assert after[lang] <= before[lang]  # never replicates
    # flattening: en's share of the corpus strictly drops
    sb = before["en"] / sum(before.values())
    sa = after["en"] / sum(after.values())
    assert sa < sb
    # deterministic: same membership on a different partitioning
    out2 = mixture_resample(
        d.repartition(13), "lang", "doc_id", budget=300, temperature=0.5
    )
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == \
           sorted(r["doc_id"] for r in out2.select("doc_id").collect())


def test_weighted_sample_biases_toward_heavy_rows_and_is_layout_free(spark):
    """A-ES sample must (a) over-represent heavy rows (sample mean
    weight above corpus mean), (b) be identical under repartitioning
    (the hash decides, not the layout), (c) be top-n planned, not a
    global sort."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.sampling import (
        weighted_sample,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )
    from .conftest import SF_ORACLE

    d = load_table(spark, SF_ORACLE, "documents").select("doc_id", "n_chars")
    samp = weighted_sample(d, "doc_id", "n_chars", 100, seed="t")
    corpus_mean = d.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = samp.agg(F.avg("n_chars")).collect()[0][0]
    assert sample_mean > corpus_mean

    again = weighted_sample(
        d.repartition(13, "n_chars"), "doc_id", "n_chars", 100, seed="t"
    )
    assert sorted(r["doc_id"] for r in samp.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )
    plan = samp._jdf.queryExecution().executedPlan().treeString()
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan
