"""Runnable walkthrough of the training-data curation surface — the
extension operators the engine adds beyond the reference (build-brief
mandate), chained the way a real 100 TB pipeline would run them:

  1. quality + language scoring        (map-only column functions)
  2. deterministic stratified sampling (md5-hash data mixing)
  3. near-dup removal, transitively    (MinHash-LSH pairs →
                                        connected components)
  4. sequence packing                  (concat-and-chunk per stratum)
  5. ANN index at rest                 (k-means IVF, partition-pruned
                                        probes over embeddings)

Every step is a DataFrame op (no driver loops over data); the same
code pointed at an object store + a real cluster is the production
pipeline.

Run:  python examples/curation_pipeline.py   (finishes in ~1 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark import EngineConfig
from streaming_data_lake_flink_cdc_apache_hudi_spark.functions import text as TX
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import dedup as DD
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
    sampling as SAMP,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
    similarity as SIM,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
root = tempfile.mkdtemp(prefix="curation_demo_")
spark = EngineConfig(app_name="curation-demo").session()
spark.sparkContext.setLogLevel("ERROR")

print(f"== 1. score quality + language ({SF_DIR}) ==")
docs = load_table(spark, SF_DIR, "documents")
scored = docs.select(
    "doc_id",
    "lang",
    "text",
    TX.quality_score(F.col("text")).alias("quality"),
    TX.lang_id(F.col("text")).alias("predicted_lang"),
    TX.token_count(F.col("text")).cast("long").alias("n_tokens"),
)
kept = scored.filter(F.col("quality") >= 0.7)
print(f"   {docs.count()} docs -> {kept.count()} past the quality gate")

print("== 2. deterministic stratified sample (data mixing) ==")
mixed = SAMP.stratified_sample(
    kept, "lang", "doc_id", {"en": 0.9, "es": 0.6}, default_rate=0.3
)
mixed.groupBy("lang").count().orderBy("lang").show()

print("== 3. transitive near-dup removal (LSH pairs -> components) ==")
pairs = DD.minhash_lsh_pairs(mixed, "text", "doc_id", jaccard_threshold=0.5)
comps = DD.connected_components(pairs)
# keep one representative (the min doc_id) per duplicate cluster
losers = comps.filter(F.col("node") != F.col("comp")).select(
    F.col("node").alias("doc_id")
)
deduped = mixed.join(losers, "doc_id", "left_anti")
print(f"   {mixed.count()} sampled -> {deduped.count()} after dedup")

print("== 4. sequence packing (concat-and-chunk, 512 tokens) ==")
packed = SAMP.concat_chunk_pack(
    deduped.select("doc_id", "lang", "n_tokens"),
    "n_tokens",
    "doc_id",
    capacity=512,
    partition_col="lang",
)
packed.groupBy("lang").agg(
    F.max("start_off").alias("stream_tokens"),
    F.max("first_chunk").alias("chunks"),
).orderBy("lang").show()

print("== 5. ANN index at rest (k-means IVF, partition-pruned probes) ==")
emb = load_table(spark, SF_DIR, "embeddings")
idx = os.path.join(root, "ivf")
SIM.write_ivf_index(emb, "embedding", "vec_id", idx, n_centroids=8)
q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
SIM.ivf_probe_index(
    spark, idx, list(q), "embedding", "vec_id", k=5, n_probe=2
).show()

shutil.rmtree(root, ignore_errors=True)
print("curation pipeline complete.")
