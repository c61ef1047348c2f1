"""Newline-delimited JSON (JSONL) corpus source — the de-facto
interchange format for training-data corpora (one document object per
line). Extension surface: the reference has no file-corpus ingestion
at all (its only sources are CDC streams); the build brief's
training-pipeline mandate needs one.

Design for 100 TB:
- **Schema is required.** ``spark.read.json`` without a schema runs a
  full inference pass over the data — two reads of the corpus. Callers
  declare the schema once; the scan then streams each file exactly
  once, line-splittable (uncompressed / bzip2 JSONL splits across
  tasks; gzip does not — document shards should be many files, not one
  big one).
- **Malformed lines are quarantined, not dropped.** PERMISSIVE mode
  routes any unparseable line into a corrupt-record column; callers
  get (good, bad) DataFrames and can write the bad side to a
  quarantine path for audit. DROPMALFORMED silently changes corpus
  statistics — never the default here.
- Both paths are map-only scans: no shuffle, no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Schema of the testdata ``documents`` table — the corpus interchange
#: schema used by the curation operators.
DOCUMENT_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

_CORRUPT = "_corrupt_line"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read a JSONL corpus with an explicit schema; quarantine
    malformed lines.

    Returns ``(good, bad)``: ``good`` has exactly the declared schema;
    ``bad`` is a single-column DataFrame of the raw unparseable lines
    (empty when the corpus is clean).

    One line-splittable text scan feeds both sides via ``from_json``
    with a corrupt-record field — Spark's native JSON reader forbids
    queries that reference only its internal corrupt column
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless the
    parse is cached, and caching a corpus-sized scan is not a 100 TB
    option. An empty object ``{}`` parses as a valid all-null row, not
    a corrupt line.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    parsed = spark.read.text(path).select(
        F.from_json(F.col("value"), full, opts).alias("_r")
    )
    good = parsed.where(F.col(f"_r.{_CORRUPT}").isNull()).select(
        *[F.col(f"_r.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.where(F.col(f"_r.{_CORRUPT}").isNotNull()).select(
        F.col(f"_r.{_CORRUPT}").alias("raw_line")
    )
    return good, bad


def read_jsonl_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming variant: continuously ingest JSONL shards as they
    land (the corpus-drop pattern — crawlers/exports append files; the
    pipeline picks them up per micro-batch).

    Returns one streaming DataFrame with the declared columns plus the
    ``_corrupt_line`` audit column (NULL for clean rows) — a streaming
    query can't be forked driver-side, so the caller splits: filter
    ``_corrupt_line IS NULL`` into the curation pipeline / lake upsert,
    and the remainder into a quarantine sink. Same single text scan +
    ``from_json`` shape as :func:`read_jsonl`; file-source checkpoints
    give exactly-once per shard.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    opts = {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": _CORRUPT}
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.text(path).select(
        F.from_json(F.col("value"), full, opts).alias("_r")
    ).select("_r.*")


def write_jsonl(df: DataFrame, path: str, num_files: int | None = None) -> None:
    """Write a corpus as JSONL shards (one JSON object per line, one
    file per partition). ``num_files`` repartitions first — at scale,
    pick it so each shard is 100 MB–1 GB; never 1 (a single writer
    task serializes the whole corpus)."""
    out = df.repartition(num_files) if num_files else df
    out.write.mode("overwrite").json(path)
