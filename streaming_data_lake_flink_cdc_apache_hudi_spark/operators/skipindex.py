"""Bloom-filter file-skipping index for non-key columns (≙ Hudi's
bloom index / metadata-table bloom filters, and the data-skipping
sidecars every lakehouse format grew: Delta stats, Iceberg puffin).

The engine's lake already prunes by record key (hash buckets) and by
min/max (key-sorted / z-ordered compaction tightens parquet footer
stats). This adds the third classic pruning axis: EQUALITY lookups on
an arbitrary column whose values don't cluster — where min/max ranges
overlap everywhere and row-group stats can't help.

Design, 100 TB first:

- the index is built by Spark itself: one scan of (column,
  input_file_name), then ``bit_or`` aggregation of per-row bitmasks
  grouped by file — partial aggregation makes each map task emit one
  ``words``-long mask per file it touched, so the shuffle carries
  O(files x words x 8 bytes), never rows. No driver-side hashing, no
  collect of data.
- the stored artifact is tiny (default 1024 bits = 16 longs per
  file) and lives in ONE json sidecar per indexed column — reading
  it is a driver-side metadata fetch, the same cost class as reading
  a commit log.
- lookups hash the probe value with the engine's PORTABLE md5 family
  (k=3 probes), intersect with each file's mask, and hand Spark the
  surviving file list: the query plan is then an ordinary pruned
  parquet scan — pushdown and codegen untouched. Bloom semantics:
  no false negatives ever; false positives only cost extra files
  scanned, correctness is preserved by the normal filter on top.
"""

from __future__ import annotations

import hashlib
import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BITS = 1024
WORDS = BITS // 64
K = 3


def _positions_col(col, k: int = K, bits: int = BITS):
    """The k bloom bit positions of a column value (portable md5)."""
    return [
        F.conv(
            F.substring(
                F.md5(F.concat(col.cast("string"), F.lit(f"|bloom{i}"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % bits
        for i in range(k)
    ]


def _positions_py(value, k: int = K, bits: int = BITS) -> list[int]:
    return [
        int(
            hashlib.md5(f"{value}|bloom{i}".encode()).hexdigest()[:8], 16
        )
        % bits
        for i in range(k)
    ]


def index_path(dir_path: str, column: str) -> str:
    return os.path.join(dir_path, f"_bloom_index_{column}.json")


def build_bloom_index(
    spark: SparkSession, dir_path: str, column: str
) -> dict[str, list[int]]:
    """Scan the parquet files under ``dir_path`` once and write the
    per-file bloom sidecar for ``column``. Returns {file: masks}."""
    df = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(dir_path)
        .select(
            F.input_file_name().alias("_file"), F.col(column).alias("_v")
        )
    )
    # per-row mask per 64-bit word, bit_or'd per file (map-side partial)
    pos = _positions_col(F.col("_v"))
    word_exprs = []
    for w in range(WORDS):
        m = F.lit(0).cast("long")
        for p in pos:
            m = m.bitwiseOR(F.when(
                (p / 64).cast("int") == w,
                F.call_function(
                    "shiftleft", F.lit(1).cast("long"), (p % 64).cast("int")
                ),
            ).otherwise(F.lit(0).cast("long")))
        word_exprs.append(F.bit_or(m).alias(f"w{w}"))
    rows = df.groupBy("_file").agg(*word_exprs).collect()  # one row/file
    index = {
        os.path.relpath(
            r["_file"].removeprefix("file://"), os.path.abspath(dir_path)
        ): [r[f"w{w}"] for w in range(WORDS)]
        for r in rows
    }
    with open(index_path(dir_path, column), "w") as fh:
        json.dump({"bits": BITS, "k": K, "files": index}, fh)
    return index


def candidate_files(
    dir_path: str, column: str, value
) -> tuple[list[str], int]:
    """Files that MAY contain value (bloom intersect); (files, total)."""
    with open(index_path(dir_path, column)) as fh:
        idx = json.load(fh)
    pos = _positions_py(value, idx["k"], idx["bits"])
    out = []
    for rel, words in idx["files"].items():
        if all(words[p // 64] & (1 << (p % 64)) for p in pos):
            out.append(os.path.join(dir_path, rel))
    return sorted(out), len(idx["files"])


def read_with_bloom(
    spark: SparkSession, dir_path: str, column: str, value
) -> DataFrame:
    """Equality scan pruned by the bloom sidecar: only candidate files
    are opened; the residual filter keeps exactness (false positives
    are filtered, false negatives cannot occur)."""
    files, total = candidate_files(dir_path, column, value)
    if not files:
        schema = (
            spark.read.option("recursiveFileLookup", "true")
            .parquet(dir_path)
            .schema
        )
        return spark.createDataFrame([], schema)
    return spark.read.parquet(*files).filter(F.col(column) == value)
