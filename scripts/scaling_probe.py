"""Off-testdata scaling probe (VERDICT r7 ask #7): synthesize an
sf1-EQUIVALENT input from sf0.1 (10x the keys/documents, per-key and
per-document work held constant — the axis a real corpus grows on)
and time the CEP suite and the dedup stack at both scales, reporting
the observed scaling exponent log10(t_sf1 / t_sf0.1).

The synthetic tables deliberately avoid changing the WORKLOAD SHAPE:

- events: 10 copies with shifted user_id/event_id — per-user
  timelines identical, so the matcher's per-key cost is constant and
  only the key count grows (what 100 TB of CEP input looks like).
- documents: 10 copies with shifted doc_id and the word order
  ROTATED per copy (rotation step 7*i words) — within-copy near-dup
  structure is preserved (both members of a pair rotate identically),
  while cross-copy shingles diverge so the pair count grows ~10x
  linearly instead of quadratically exploding on artificial
  cross-copy duplicates.

Run: python scripts/scaling_probe.py   (writes one JSON line; paste
the table into SCALING.md). Not part of bench.py — this is a
methodology artifact, re-run when the CEP/dedup cost model changes.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import DEFAULT_CPUS, EngineConfig  # noqa: E402
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES  # noqa: E402

SF01 = "/root/testdata/sf0.1"
COPIES = 10
CEP = ["cep_define_predicate", "cep_quantified_match", "cep_define_agg"]
DEDUP = ["dedup_exact", "minhash_pairs", "simhash_pairs", "paragraph_dedup"]


def build_sfx(spark, out: str) -> None:
    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    u = None
    for i in range(COPIES):
        c = ev.withColumn(
            "user_id", F.col("user_id") + F.lit(i * 1_000_000)
        ).withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)
        )
        u = c if u is None else u.unionByName(c)
    u.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    d = None
    for i in range(COPIES):
        # rotation offset 1 + (7*i mod (size-1)) lies in [1, size-1]
        # for size >= 2, so a copy is NEVER byte-identical to the
        # original (7*i mod size could be 0 for short documents,
        # silently creating exact cross-copy duplicates and biasing
        # the very exponent this probe measures); 1-word docs cannot
        # rotate and stay identical — negligible and unavoidable
        p = f"(1 + ({7 * i} % greatest(size(split(text, ' ')) - 1, 1)))"
        rotated = F.expr(
            f"array_join(concat("
            f"slice(split(text, ' '), {p} + 1,"
            f" size(split(text, ' '))),"
            f"slice(split(text, ' '), 1, {p})"
            f"), ' ')"
        )
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        ).withColumn("text", rotated if i else F.col("text"))
        d = c if d is None else d.unionByName(c)
    d.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    # remaining tables: same content (none of the probed queries read
    # them, but load_table must find the files)
    for t in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        src = os.path.join(SF01, f"{t}.parquet")
        if os.path.exists(src):
            dst = os.path.join(out, f"{t}.parquet")
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)


def timed(spark, name: str, sf_dir: str) -> float:
    df = QUERIES[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warmup
    best = float("inf")
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def main() -> None:
    spark = EngineConfig(
        app_name="scaling_probe",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    out = tempfile.mkdtemp(prefix="sfx1_")
    try:
        build_sfx(spark, out)
        res = {}
        for name in CEP + DEDUP:
            t_small = timed(spark, name, SF01)
            t_big = timed(spark, name, out)
            res[name] = {
                "sf0.1_sec": t_small,
                "sf1_sec": t_big,
                "exponent": round(
                    math.log(t_big / t_small) / math.log(COPIES), 2
                ),
            }
        print(json.dumps(res))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
