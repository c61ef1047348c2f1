"""Round-13 experiment: part_pagerank variants (same-session A/B).

Variants (all must be hash-identical to v0/current):
  v0  current pagerank()
  v1  n_nodes localCheckpointed once (kills 4x distinct+count subtree)
  v2  v1 + edges pre-partitioned+sorted on _s before checkpoint
      (iteration joins reuse partitioning: only rank side shuffles)
  v3  v2 + copurchase edges via per-basket collect_set+explode
      (one groupBy shuffle instead of co-partitioned self-join)

Usage: python scripts/exp_pagerank.py [--sf DIR] [--reps N]
"""

from __future__ import annotations

import argparse
import gc
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (  # noqa: E402
    DEFAULT_CPUS,
    EngineConfig,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import (  # noqa: E402
    QUERIES,
    load_table,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.graph import (  # noqa: E402
    copurchase_edges,
)


def _finish(pr: DataFrame) -> DataFrame:
    return pr.select(
        "node", F.round(F.col("pr") * 1000, 5).alias("pr_permille")
    )


def pagerank_v1(edges, iterations=3, damping=0.85, presort=False):
    e = edges.select(F.col("src").alias("_s"), F.col("dst").alias("_d"))
    outdeg = e.groupBy("_s").agg(F.count("*").alias("_deg"))
    contrib_base = e.join(outdeg, "_s")
    if presort:
        contrib_base = contrib_base.repartition("_s").sortWithinPartitions("_s")
    contrib_base = contrib_base.localCheckpoint(eager=True)
    outdeg = contrib_base.select("_s", "_deg").distinct()
    n_nodes = outdeg.agg(F.count("*").alias("_n")).localCheckpoint(eager=True)
    pr = outdeg.crossJoin(n_nodes).select(
        F.col("_s").alias("node"), (F.lit(1.0) / F.col("_n")).alias("pr")
    )
    for _ in range(iterations):
        pr = (
            contrib_base.join(pr, F.col("_s") == F.col("node"))
            .groupBy(F.col("_d"))
            .agg(F.sum(F.col("pr") / F.col("_deg")).alias("_in"))
            .crossJoin(n_nodes)
            .select(
                F.col("_d").alias("node"),
                (
                    (1.0 - 0.85) / F.col("_n")
                    + F.lit(0.85) * F.col("_in")
                ).alias("pr"),
            )
        )
    return pr


def edges_explode(li):
    baskets = (
        li.select(
            F.col("l_orderkey").alias("_k"), F.col("l_partkey").alias("_p")
        )
        .groupBy("_k")
        .agg(F.collect_set("_p").alias("_ps"))
    )
    pairs = baskets.select(
        F.explode("_ps").alias("src"), F.col("_ps").alias("_ps")
    ).select("src", F.explode("_ps").alias("dst"))
    return (
        pairs.filter(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
    )


def build(spark, sf, variant):
    li = load_table(spark, sf, "lineitem")
    if variant == "v0":
        return QUERIES["part_pagerank"].fn(spark, sf)
    if variant == "v1":
        return _finish(pagerank_v1(copurchase_edges(li)))
    if variant == "v2":
        return _finish(pagerank_v1(copurchase_edges(li), presort=True))
    if variant == "v3":
        return _finish(pagerank_v1(edges_explode(li), presort=True))
    raise ValueError(variant)


def rhash(df):
    cols = sorted(df.columns)
    row = df.select(
        F.sha2(
            F.concat_ws(
                "\x01", *[F.col(c).cast("string") for c in cols]
            ),
            256,
        ).alias("h")
    ).agg(
        F.sum(F.conv(F.substring("h", 1, 8), 16, 10).cast("decimal(38,0)")).alias("s"),
        F.count("*").alias("c"),
    ).first()
    return (str(row["s"]), row["c"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--variants", default="v0,v1,v2,v3")
    args = ap.parse_args()
    spark = EngineConfig(
        app_name="exp_pagerank",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    variants = args.variants.split(",")

    hashes = {}
    for v in variants:
        hashes[v] = rhash(build(spark, args.sf, v))
        print(f"hash {v}: {hashes[v]}", flush=True)
    base = hashes[variants[0]]
    for v in variants:
        assert hashes[v] == base, f"{v} differs from {variants[0]}!"
    print("all hashes identical", flush=True)

    # two views per variant: bench-style (save only; build w/ eager
    # checkpoints is untimed, matching bench.py's headline loop) and
    # total (build+save — proves total work decreased, not just moved)
    times = {v: [] for v in variants}
    totals = {v: [] for v in variants}
    for rep in range(args.reps):
        for v in variants:
            spark.sparkContext.setJobDescription(f"pr:{v}:rep{rep}")
            spark.sparkContext._jvm.System.gc()
            gc.collect()
            tb = time.perf_counter()
            df = build(spark, args.sf, v)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t1 = time.perf_counter()
            times[v].append(t1 - t0)
            totals[v].append(t1 - tb)
    for v in variants:
        ts = sorted(times[v])
        tt = sorted(totals[v])
        print(
            f"{v}: save_min={ts[0]:.3f} total_min={tt[0]:.3f} save_all="
            + ",".join(f"{t:.3f}" for t in times[v]),
            flush=True,
        )


if __name__ == "__main__":
    main()
