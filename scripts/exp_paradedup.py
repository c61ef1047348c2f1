"""Round-13 experiment: paragraph_dedup shuffle-payload variants.

  V0 current: window(md5(para)) over full paras + groupBy(doc) rebuild
     — paragraph TEXT crosses both shuffles
  V1 meta-only decision: winners = min(struct(id, idx)) per hash (hash
     AGG with map-side partials, no text, no sort), semi-join the meta
     back, rebuild clean_text by re-chunking the original docs and
     filtering kept indexes — text crosses ONE shuffle (the doc join)
  V2 half-step: window decision unchanged, but the window input drops
     the para text (meta only) and the rebuild re-chunks docs

Usage: python scripts/exp_paradedup.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pyspark.sql import Window, functions as F  # noqa: E402

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (  # noqa: E402
    DEFAULT_CPUS,
    EngineConfig,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import (  # noqa: E402
    QUERIES,
    load_table,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import curation as CUR  # noqa: E402


def chunks_arr(text_col, words_per_para=10):
    words = F.when(
        F.trim(text_col) == "", F.array().cast("array<string>")
    ).otherwise(F.split(F.trim(text_col), r"\s+"))
    n_chunks = F.when(
        F.size(words) > 0,
        F.floor((F.size(words) - F.lit(1)) / words_per_para).cast("int")
        + F.lit(1),
    ).otherwise(F.lit(0))
    return F.transform(
        F.sequence(F.lit(1), n_chunks),
        lambda i: F.concat_ws(
            " ", F.slice(words, (i - 1) * words_per_para + 1, words_per_para)
        ),
    )


def v1(docs, text_col="text", id_col="doc_id"):
    paras = CUR.paragraph_chunks(docs, text_col, id_col)
    meta = paras.select(
        F.col(id_col), "para_idx", F.md5(F.col("para")).alias("_h")
    )
    winners = meta.groupBy("_h").agg(
        F.min(F.struct(F.col(id_col), F.col("para_idx"))).alias("_w")
    )
    kept = (
        meta.join(
            winners,
            (meta["_h"] == winners["_h"])
            & (meta[id_col] == winners["_w"][id_col])
            & (meta["para_idx"] == winners["_w"]["para_idx"]),
            "left_semi",
        )
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("para_idx")).alias("_kidx"),
            F.count("*").cast("int").alias("n_kept"),
        )
    )
    arr = chunks_arr(F.col(text_col))
    out = (
        docs.select(id_col, text_col)
        .join(kept, id_col, "left")
        .select(
            F.col(id_col),
            arr.alias("_arr"),
            F.coalesce(F.col("_kidx"), F.array().cast("array<int>")).alias(
                "_kidx"
            ),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
        .select(
            id_col,
            F.concat_ws(
                " ",
                F.transform(
                    F.col("_kidx"), lambda i: F.element_at("_arr", i + 1)
                ),
            ).alias("clean_text"),
            "n_kept",
            (F.size("_arr") - F.col("n_kept")).cast("int").alias("n_removed"),
        )
    )
    return out


def v2(docs, text_col="text", id_col="doc_id"):
    paras = CUR.paragraph_chunks(docs, text_col, id_col)
    meta = paras.select(
        F.col(id_col), "para_idx", F.md5(F.col("para")).alias("_h")
    )
    w = Window.partitionBy("_h").orderBy(F.col(id_col), F.col("para_idx"))
    kept = (
        meta.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .groupBy(id_col)
        .agg(
            F.sort_array(F.collect_list("para_idx")).alias("_kidx"),
            F.count("*").cast("int").alias("n_kept"),
        )
    )
    arr = chunks_arr(F.col(text_col))
    return (
        docs.select(id_col, text_col)
        .join(kept, id_col, "left")
        .select(
            F.col(id_col),
            arr.alias("_arr"),
            F.coalesce(F.col("_kidx"), F.array().cast("array<int>")).alias(
                "_kidx"
            ),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
        )
        .select(
            id_col,
            F.concat_ws(
                " ",
                F.transform(
                    F.col("_kidx"), lambda i: F.element_at("_arr", i + 1)
                ),
            ).alias("clean_text"),
            "n_kept",
            (F.size("_arr") - F.col("n_kept")).cast("int").alias("n_removed"),
        )
    )


def build(spark, sf, variant):
    docs = load_table(spark, sf, "documents")
    if variant == "V0":
        return QUERIES["paragraph_dedup"].fn(spark, sf)
    if variant == "V1":
        return v1(docs)
    if variant == "V2":
        return v2(docs)
    raise ValueError(variant)


def rhash(df):
    cols = sorted(df.columns)
    row = (
        df.select(
            F.sha2(
                F.concat_ws("\x01", *[F.col(c).cast("string") for c in cols]),
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
    ap.add_argument("--variants", default="V0,V1,V2")
    args = ap.parse_args()
    spark = EngineConfig(
        app_name="exp_paradedup",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    variants = args.variants.split(",")
    hashes = {v: rhash(build(spark, args.sf, v)) for v in variants}
    for v in variants:
        print(f"HASH {v}: {hashes[v]}", flush=True)
    assert len(set(hashes.values())) == 1, f"MISMATCH {hashes}"
    print("HASHES identical", flush=True)
    dfs = {v: build(spark, args.sf, v) for v in variants}
    for v in variants:
        dfs[v].write.format("noop").mode("overwrite").save()
    times = {v: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            spark.sparkContext.setJobDescription(f"pd:{v}:rep{rep}")
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
