"""Core-count scaling probe at sf1-equivalent volume (r14 — VERDICT
r13 item 5: the sf0.1 8-vs-32-core block is all fixed overhead, every
ratio ~1; this measures which headline operators actually parallelize
once per-task data is real).

Synthesizes an sf1-equivalent directory from sf0.1 (10x copies with
ALL join keys shifted per copy, so every query's join/graph structure
duplicates linearly instead of densifying: l_partkey/l_suppkey shift
with part/supplier — the co-purchase graph becomes 10 disjoint
copies; customer names are suffixed so the ticket LWW key count
grows; documents rotate per copy as in scaling_probe.py), then times
the 11 headline queries with the bench protocol (warmup + min-of-3
noop saves, gc-drained) at the core count given by SPARK_GRAFT_CPUS.

Run twice and compare:
    SPARK_GRAFT_CPUS=32 python scripts/core_probe.py --synth /dev/shm/sf1eq
    SPARK_GRAFT_CPUS=8  python scripts/core_probe.py --synth /dev/shm/sf1eq
(the synth dir is built once and reused — content is deterministic).
Writes one JSON line; paste the ratio table into SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (  # noqa: E402
    DEFAULT_CPUS,
    EngineConfig,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import (  # noqa: E402
    QUERIES,
)

SF01 = "/root/testdata/sf0.1"
COPIES = 10
HEADLINE = [
    "ticket_view", "group_agg", "text_stats", "dedup_exact",
    "embedding_topk", "revenue_by_nation", "minhash_pairs",
    "simhash_pairs", "paragraph_dedup", "part_pagerank",
    "pricing_summary",
]
# per-copy key shifts, table -> {column: stride}
SHIFTS = {
    "customer": {"c_custkey": 10_000_000},
    "orders": {"o_orderkey": 100_000_000, "o_custkey": 10_000_000},
    "lineitem": {
        "l_orderkey": 100_000_000,
        "l_partkey": 1_000_000,
        "l_suppkey": 1_000_000,
    },
    "part": {"p_partkey": 1_000_000},
    "supplier": {"s_suppkey": 1_000_000},
    "events": {"user_id": 1_000_000, "event_id": 100_000_000},
    "embeddings": {"vec_id": 10_000_000},
}


def build(spark, out: str) -> None:
    os.makedirs(out, exist_ok=True)
    for t, shifts in SHIFTS.items():
        src = spark.read.parquet(os.path.join(SF01, f"{t}.parquet"))
        u = None
        for i in range(COPIES):
            c = src
            for col, stride in shifts.items():
                c = c.withColumn(col, F.col(col) + F.lit(i * stride))
            if t == "customer" and i:
                # unique LWW keys per copy (scaling_probe.py rationale)
                c = c.withColumn(
                    "c_name", F.concat(F.col("c_name"), F.lit(f"#{i}"))
                )
            u = c if u is None else u.unionByName(c)
        u.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{t}.parquet")
        )
    # documents: shifted ids + per-copy word rotation (scaling_probe.py)
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    d = None
    for i in range(COPIES):
        p = f"(1 + ({7 * i} % greatest(size(split(text, ' ')) - 1, 1)))"
        rotated = F.expr(
            f"array_join(concat("
            f"slice(split(text, ' '), {p} + 1, size(split(text, ' '))),"
            f"slice(split(text, ' '), 1, {p})), ' ')"
        )
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        ).withColumn("text", rotated if i else F.col("text"))
        d = c if d is None else d.unionByName(c)
    d.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    for t in ("region", "nation"):
        src = os.path.join(SF01, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--synth", default="/dev/shm/sf1eq")
    ap.add_argument("--names", default=",".join(HEADLINE))
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    spark = EngineConfig(
        app_name=f"core_probe_c{DEFAULT_CPUS}",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    if not os.path.exists(os.path.join(args.synth, "_READY")):
        build(spark, args.synth)
        open(os.path.join(args.synth, "_READY"), "w").write("ok")
    timings = {}
    for name in args.names.split(","):
        spark.sparkContext.setJobDescription(f"core_probe:{name}")
        df = QUERIES[name].fn(spark, args.synth)
        df.write.format("noop").mode("overwrite").save()  # warmup
        best = float("inf")
        for _ in range(args.reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        spark.sparkContext.setJobDescription(None)
    print(json.dumps({
        "cpus": DEFAULT_CPUS,
        "copies": COPIES,
        "synth": args.synth,
        "timings": timings,
        "total": round(sum(timings.values()), 3),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
