"""Runnable walkthrough of the training-data curation surface — the
extension operators the engine adds beyond the reference (build-brief
mandate), chained the way a real 100 TB pipeline would run them:

  0. JSONL ingestion + quarantine      (schema-declared text scan;
                                        malformed lines audited, not
                                        dropped)
  1. quality + language scoring        (map-only column functions)
  1b. per-source/domain cap            (md5-rank keep-set per source)
  2. repetition + PII scrub            (Gopher-style boilerplate
                                        signals; digit masking)
  3. temperature mixture resampling    (w ∝ n^τ, md5-hash mixing)
  4. near-dup removal, transitively    (MinHash-LSH pairs →
                                        connected components)
  5. eval-set decontamination          (broadcast n-gram anti-join)
  6. shard assignment + packing        (md5 shards; concat-and-chunk)
  7. ANN index at rest + int8 codes    (k-means IVF probes; 4×
                                        quantized embedding storage)

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

print(f"== 0. ingest JSONL shards with quarantine ({SF_DIR}) ==")
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources import jsonl as J

corpus_dir = os.path.join(root, "jsonl_corpus")
J.write_jsonl(load_table(spark, SF_DIR, "documents"), corpus_dir, num_files=4)
with open(os.path.join(corpus_dir, "part-bad.json"), "w") as fh:
    fh.write('{"doc_id": broken line\n')
docs, quarantined = J.read_jsonl(spark, corpus_dir, J.DOCUMENT_SCHEMA)
print(f"   {docs.count()} documents ingested, "
      f"{quarantined.count()} malformed line(s) quarantined")

print("== 1. score quality + language ==")
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

print("== 1b. per-source cap (<= 10 docs per domain) ==")
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
    curation as CUR,
)

docs_src = load_table(spark, SF_DIR, "documents").select("doc_id", "source")
capped = CUR.source_cap(
    kept.join(docs_src, "doc_id"), "doc_id", "source", cap=10,
    prefilter_factor=4.0,
)
print(f"   {kept.count()} -> {capped.count()} after the domain cap")
kept = capped.drop("source")

print("== 2. repetition + PII scrub ==")
rep = CUR.repetition_metrics(kept, "text")
clean = rep.filter(
    (F.col("dup_bigram_frac") <= 0.4) & (F.col("top_token_frac") <= 0.3)
).withColumn("text", TX.mask_digits(F.col("text")))
print(f"   {kept.count()} -> {clean.count()} past the repetition gate")

print("== 3. temperature mixture resample (w ~ n^tau, tau=0.5) ==")
mixed = SAMP.mixture_resample(
    clean, "lang", "doc_id", budget=400, temperature=0.5
)
mixed.groupBy("lang").count().orderBy("lang").show()

print("== 4. transitive near-dup removal (LSH pairs -> components) ==")
pairs = DD.minhash_lsh_pairs(mixed, "text", "doc_id", jaccard_threshold=0.5)
comps = DD.connected_components(pairs)
# keep one representative (the min doc_id) per duplicate cluster
losers = comps.filter(F.col("node") != F.col("comp")).select(
    F.col("node").alias("doc_id")
)
deduped = mixed.join(losers, "doc_id", "left_anti")
print(f"   {mixed.count()} sampled -> {deduped.count()} after dedup")

print("== 5. eval-set decontamination (broadcast n-gram anti-join) ==")
eval_set = docs.filter(F.col("doc_id") % 97 == 0)
final = CUR.decontaminate(deduped, eval_set, "text", "doc_id")
print(f"   {deduped.count()} -> {final.count()} after decontamination")

print("== 6. shard assignment + sequence packing (512 tokens) ==")
sharded = CUR.shard_assign(final, "doc_id", n_shards=4)
sharded.groupBy("shard").count().orderBy("shard").show()
packed = SAMP.concat_chunk_pack(
    final.select("doc_id", "lang", "n_tokens"),
    "n_tokens",
    "doc_id",
    capacity=512,
    partition_col="lang",
)
packed.groupBy("lang").agg(
    F.max("start_off").alias("stream_tokens"),
    F.max("first_chunk").alias("chunks"),
).orderBy("lang").show()

print("== 7. ANN index at rest + int8 quantized codes ==")
from streaming_data_lake_flink_cdc_apache_hudi_spark.functions import (
    vectors as VEC,
)

emb = load_table(spark, SF_DIR, "embeddings")
qz = emb.select(
    "vec_id", VEC.quantize_scale(F.col("embedding")).alias("scale")
)
qz.agg(
    F.round(F.avg("scale"), 5).alias("avg_scale"),
    F.count("*").alias("vectors"),
).show()
idx = os.path.join(root, "ivf")
SIM.write_ivf_index(emb, "embedding", "vec_id", idx, n_centroids=8)
q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
SIM.ivf_probe_index(
    spark, idx, list(q), "embedding", "vec_id", k=5, n_probe=2
).show()

print("== 8. SemDeDup semantic dedup (cluster -> prune eps-balls) ==")
sem = DD.semantic_dedup(emb, "embedding", "vec_id", n_clusters=8, tau=0.33)
sem.groupBy("kept").count().orderBy("kept").show()

print("== 9. hybrid retrieval (BM25 + dense cosine, RRF fusion) ==")
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
    retrieval as RET,
)

RET.hybrid_rrf_topk(
    docs.select("doc_id", "text"), emb, ["vector", "scan", "merge"], k=5
).show()

print("== 10. hard negatives for contrastive training ==")
qv = emb.filter(F.col("vec_id") < 2).select(
    F.col("vec_id").alias("query_id"),
    F.col("label").alias("qlabel"),
    "embedding",
)
SIM.hard_negative_topk(
    emb, "embedding", "vec_id", "label", qv, "query_id", "embedding",
    "qlabel", k=3,
).show()

print("== 11. materialize training shards (manifest + verify) ==")
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import (
    shards as SH,
)

shard_dir = os.path.join(root, "shards")
manifest = SH.write_training_shards(final, "doc_id", shard_dir, n_shards=4)
print(f"   {manifest['total_rows']} rows in {manifest['n_shards']} shards; "
      f"verify: {SH.verify_shards(spark, shard_dir)['ok']}")

shutil.rmtree(root, ignore_errors=True)
print("curation pipeline complete.")
