"""Runnable walkthrough of the format-interop and index surface —
what connects the engine's lake to the rest of a data platform, plus
the model-based curation and compressed-vector features:

  1. CTAS through the SQL front door     (CREATE TABLE ... AS SELECT
                                          materializes a keyed lake
                                          table in one statement)
  2. bloom file-skip index               (equality probes on a
                                          non-key column open only
                                          candidate files)
  3. Delta / Hudi / Iceberg export       (any external reader of the
                                          three lakehouse formats can
                                          mount the snapshot)
  4. Delta + Hudi + Iceberg read         (tables written by OTHER
                                          engines mount here)
  5. model-based quality filter          (distilled linear classifier
                                          scores map-only)
  6. product-quantization ANN            (16-byte codes; ADC
                                          shortlist + exact re-rank)

Run:  python examples/interop_and_indexes.py   (finishes in ~2 min)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import EngineConfig
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.curation import (
    classifier_quality_prob,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.similarity import (
    pq_rerank_topk,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import read_delta
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    work = tempfile.mkdtemp(prefix="interop_demo_")
    spark = EngineConfig(app_name="interop-demo").session()
    spark.sparkContext.setLogLevel("ERROR")
    eng = EngineSession(
        spark=spark, registry_path=os.path.join(work, "registry.json")
    )
    try:
        # -- 1. CTAS: materialize a keyed customer summary ------------
        load_table(spark, SF_DIR, "customer").createOrReplaceTempView(
            "customer_src"
        )
        eng.sql(
            f"""
            CREATE TABLE cust_summary USING upsert OPTIONS(
              'path' = '{work}/cust_summary', 'key' = 'c_custkey',
              'num_buckets' = '4'
            ) AS SELECT c_custkey, c_name, c_mktsegment, c_acctbal
                 FROM customer_src
            """
        )
        n = eng.sql("SELECT count(*) AS n FROM cust_summary").collect()[0]["n"]
        print(f"1. CTAS lake table: {n} rows")

        # -- 2. bloom index on the non-key mktsegment column ----------
        t = eng.registry.upsert_handle("cust_summary")
        t.compact()
        t.build_bloom("c_mktsegment")
        probed = t.equality_scan("c_mktsegment", "AUTOMOBILE").count()
        print(f"2. bloom-pruned equality scan: {probed} AUTOMOBILE rows")

        # -- 3. export the snapshot as a Delta table ------------------
        delta_dir = os.path.join(work, "cust_delta")
        n_files = t.export_delta(delta_dir)
        log0 = os.path.join(delta_dir, "_delta_log", "%020d.json" % 0)
        kinds = [next(iter(json.loads(l))) for l in open(log0) if l.strip()]
        print(f"3. Delta export: {n_files} data files, log actions {kinds}")

        # -- 4. mount it back through the Delta reader ----------------
        back = read_delta(spark, delta_dir)
        assert back.count() == n
        print(f"4. Delta read-back: {back.count()} rows, schema OK")

        # -- 4b. the same snapshot as Hudi CoW and Iceberg v1 ---------
        from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import read_hudi
        from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import read_iceberg

        hudi_dir = os.path.join(work, "cust_hudi")
        t.export_hudi(hudi_dir)
        assert read_hudi(spark, hudi_dir).count() == n
        ice_dir = os.path.join(work, "cust_iceberg")
        t.export_iceberg(ice_dir)
        assert read_iceberg(spark, ice_dir).count() == n
        print("4b. Hudi CoW + Iceberg v1 exports mount back: "
              f"{n} rows each (full lakehouse-format trio)")

        # -- 4c. HLL sketch sidecar: distinct counts from metadata ----
        from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.sketchindex import (
            build_hll_sidecar,
            distinct_estimate,
        )

        data_dir = os.path.join(ice_dir, "data")
        build_hll_sidecar(spark, data_dir, "c_mktsegment")
        est = distinct_estimate(spark, data_dir, "c_mktsegment")
        print(f"4c. HLL sidecar distinct(c_mktsegment) ~= {est} "
              "(no data file opened)")

        # -- 5. model-based quality filter over documents -------------
        docs = load_table(spark, SF_DIR, "documents")
        kept = docs.filter(classifier_quality_prob("text") >= 0.5)
        print(
            f"5. quality model keeps {kept.count()}/{docs.count()} docs "
            "(map-only scoring, no shuffle)"
        )

        # -- 6. PQ ANN: compressed shortlist + exact re-rank ----------
        emb = load_table(spark, SF_DIR, "embeddings")
        qv = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
        top = pq_rerank_topk(emb, "embedding", "vec_id", qv, k=6)
        ids = [r["vec_id"] for r in top.collect()]
        print(f"6. PQ rerank top-6 for vec 0: {ids}")
    finally:
        spark.stop()
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
