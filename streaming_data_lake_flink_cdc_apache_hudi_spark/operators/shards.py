"""Training-shard materialization: the end product of the curation
pipeline — a corpus written as N deterministic, individually-sorted
parquet shards with a verifiable manifest.

Every layout decision is content-derived (md5 of the document id), so
re-running the pipeline on any cluster size, partition layout, or
engine produces byte-identical shard membership and within-shard
order — the property training jobs need for reproducible data order
and resumable epochs.

Scale shape: shard assignment is map-only hashing; the write is one
``repartition(n_shards, shard)`` shuffle with per-shard
``sortWithinPartitions`` (n_shards independent sorts, never a global
sort); the manifest is an n_shards-row aggregate (bit_xor of id
hashes — order-independent and overflow-free, unlike a sum) collected
as bounded metadata. Verification re-aggregates the written files
distributed and compares — the driver only ever sees n_shards rows.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .curation import shard_assign

MANIFEST_NAME = "_shard_manifest.json"


def _shard_stats(df: DataFrame, id_col: str, seed: str) -> DataFrame:
    """Per-shard (rows, id_checksum, max_position): the checksum is a
    bit_xor over a 60-bit md5 prefix of each id — insensitive to row
    order, exact in any engine."""
    h60 = F.conv(
        F.substring(
            F.md5(F.concat(F.col(id_col).cast("string"), F.lit(seed))),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    return df.groupBy("shard").agg(
        F.count("*").alias("rows"),
        F.bit_xor(h60).alias("id_checksum"),
        F.max("pack_position").alias("max_position"),
    )


def write_training_shards(
    df: DataFrame,
    id_col: str,
    out_dir: str,
    n_shards: int,
    seed: str = "",
) -> dict:
    """Materialize ``df`` as ``n_shards`` hash-sharded parquet
    directories (``shard=<k>/``), each sorted by the deterministic
    ``pack_position`` order, plus an atomic ``_shard_manifest.json``
    recording per-shard row counts, id checksums, and the position
    invariant (max_position == rows — a dense 1..n order). Returns
    the manifest dict."""
    assigned = shard_assign(df, id_col, n_shards, seed=seed)
    (
        assigned.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "pack_position")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(out_dir)
    )
    spark = df.sparkSession
    written = spark.read.parquet(out_dir)
    stats = {
        int(r["shard"]): {
            "rows": int(r["rows"]),
            "id_checksum": int(r["id_checksum"]),
            "dense_order": int(r["max_position"]) == int(r["rows"]),
        }
        for r in _shard_stats(written, id_col, seed).collect()
    }
    manifest = {
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "total_rows": sum(s["rows"] for s in stats.values()),
        "shards": {str(k): v for k, v in sorted(stats.items())},
    }
    tmp = os.path.join(out_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as fh:
        json.dump(manifest, fh, indent=1)
    os.replace(tmp, os.path.join(out_dir, MANIFEST_NAME))
    return manifest


def verify_shards(spark: SparkSession, out_dir: str) -> dict:
    """Re-aggregate the written shards distributed and diff against
    the stored manifest. Returns {"ok": bool, "mismatches": [...]}
    — a mismatch names the shard and which invariant broke (row
    count, id checksum, or dense position order)."""
    with open(os.path.join(out_dir, MANIFEST_NAME)) as fh:
        manifest = json.load(fh)
    written = spark.read.parquet(out_dir)
    actual = {
        int(r["shard"]): r
        for r in _shard_stats(
            written, manifest["id_col"], manifest["seed"]
        ).collect()
    }
    mismatches = []
    for k, exp in manifest["shards"].items():
        got = actual.get(int(k))
        if got is None:
            mismatches.append({"shard": int(k), "missing": True})
            continue
        if int(got["rows"]) != exp["rows"]:
            mismatches.append(
                {"shard": int(k), "invariant": "rows",
                 "expected": exp["rows"], "actual": int(got["rows"])}
            )
        if int(got["id_checksum"]) != exp["id_checksum"]:
            mismatches.append(
                {"shard": int(k), "invariant": "id_checksum"}
            )
        if (int(got["max_position"]) == int(got["rows"])) != exp[
            "dense_order"
        ]:
            mismatches.append(
                {"shard": int(k), "invariant": "dense_order"}
            )
    extra = set(actual) - {int(k) for k in manifest["shards"]}
    for k in sorted(extra):
        mismatches.append({"shard": k, "unexpected": True})
    return {"ok": not mismatches, "mismatches": mismatches}
