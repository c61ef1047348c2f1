"""Round-13 experiment: minhash_pairs self-join exchange variants.

  A  current (hint("merge") self-join; observed: NO ReusedExchange,
     banding subtree computed + shuffled twice)
  B  current minus the merge hint (does reuse fire then?)
  C  banded table repartition(band,bhash)+sortWithinPartitions+
     localCheckpoint before the self-join: both sides scan ONE
     materialized RDD with preserved partitioning/ordering ->
     0 exchanges, 0 sorts under the join

Usage: python scripts/exp_minhash.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pyspark.sql import Column, DataFrame, functions as F  # noqa: E402

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (  # noqa: E402
    DEFAULT_CPUS,
    EngineConfig,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import (  # noqa: E402
    QUERIES,
    load_table,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import dedup  # noqa: E402
from streaming_data_lake_flink_cdc_apache_hudi_spark.functions import text as TX  # noqa: E402


def pairs_variant(df, text_col, id_col, mode, num_hashes=32, bands=8,
                  shingle_n=3, jaccard_threshold=0.5, hash_family="portable"):
    df = dedup._spread(df)
    r = num_hashes // bands
    base_fn = (
        dedup._portable_base if hash_family == "portable" else F.xxhash64
    )
    rehash = (
        dedup._portable_rehash if hash_family == "portable" else dedup._rehash
    )
    base_df = df.select(
        F.col(id_col).alias("_id"),
        F.transform(
            TX.shingles(F.col(text_col), shingle_n), lambda s: base_fn(s)
        ).alias("_mh_base"),
    )
    sigs = base_df.select(
        "_id",
        F.array(
            *[
                F.array_min(F.transform("_mh_base", rehash(i)))
                for i in range(num_hashes)
            ]
        ).alias("_sig"),
    )
    sigs = sigs.localCheckpoint(eager=True)

    def _band_key(b: int) -> Column:
        slots = [F.element_at("_sig", b * r + j + 1) for j in range(r)]
        if hash_family == "portable":
            return F.md5(F.concat_ws(",", *[s.cast("string") for s in slots]))
        return F.xxhash64(*slots)

    banded = sigs.select(
        "_id",
        "_sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"), _band_key(b).alias("bhash")
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("_id", "_sig", "bk.band", "bk.bhash")

    if mode == "B":
        a, b = banded.alias("a"), banded.alias("b")
    elif mode == "C":
        banded = (
            banded.repartition("band", "bhash")
            .sortWithinPartitions("band", "bhash")
            .localCheckpoint(eager=True)
        )
        a, b = banded.alias("a"), banded.alias("b")
    else:
        raise ValueError(mode)

    matches = F.aggregate(
        F.zip_with(
            F.col("a._sig"), F.col("b._sig"),
            lambda x, y: (x == y).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            (matches / F.lit(num_hashes)).alias("est_jaccard"),
        )
        .filter(F.col("est_jaccard") >= jaccard_threshold)
        .dropDuplicates(["id_a", "id_b"])
        .select("id_a", "id_b", F.round("est_jaccard", 4).alias("est_jaccard"))
    )


def build(spark, sf, variant):
    if variant == "A":
        return QUERIES["minhash_pairs"].fn(spark, sf)
    docs = load_table(spark, sf, "documents")
    return pairs_variant(docs, "text", "doc_id", variant)


def rhash(df):
    cols = sorted(df.columns)
    row = (
        df.select(
            F.sha2(
                F.concat_ws(
                    "\x01", *[F.col(c).cast("string") for c in cols]
                ),
                256,
            ).alias("h")
        )
        .agg(
            F.sum(
                F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")
            ).alias("s"),
            F.count("*").alias("c"),
        )
        .first()
    )
    return (str(row["s"]), row["c"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=7)
    ap.add_argument("--variants", default="A,B,C")
    args = ap.parse_args()
    spark = EngineConfig(
        app_name="exp_minhash",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    variants = args.variants.split(",")
    hashes = {}
    for v in variants:
        hashes[v] = rhash(build(spark, args.sf, v))
        print(f"HASH {v}: {hashes[v]}", flush=True)
    assert len(set(hashes.values())) == 1, f"MISMATCH {hashes}"
    print("HASHES identical", flush=True)

    dfs = {v: build(spark, args.sf, v) for v in variants}
    for v in variants:
        dfs[v].write.format("noop").mode("overwrite").save()
    times = {v: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            spark.sparkContext.setJobDescription(f"mh:{v}:rep{rep}")
            spark.sparkContext._jvm.System.gc()
            gc.collect()
            t0 = time.perf_counter()
            dfs[v].write.format("noop").mode("overwrite").save()
            times[v].append(time.perf_counter() - t0)
    for v in variants:
        ts = sorted(times[v])
        print(
            f"RES {v}: min={ts[0]:.3f} all="
            + ",".join(f"{t:.3f}" for t in times[v]),
            flush=True,
        )


if __name__ == "__main__":
    main()
