"""CSV/TSV corpus ingestion with malformed-row quarantine — the
delimited-text sibling of ``jsonl.py`` (same contract: schema
declared up front, bad rows routed to a quarantine side, never
silently dropped; splittable text scans so 100 TB of CSV
parallelizes by byte range).

Shape: ONE line-splittable ``spark.read.text`` scan feeds both sides
via ``from_csv`` with a corrupt-record field. The native CSV reader
is avoided for the same reason ``jsonl.py`` avoids the native JSON
reader: it forbids queries referencing only its internal corrupt
column (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) unless
the parse is cached, and caching a corpus-sized scan is not a 100 TB
option.

Conventions pinned:

- schema is REQUIRED (inference double-scans and drifts);
- header rows are recognized BY CONTENT (the exact header line),
  which works per-file in a directory of shards — each shard's
  header is dropped wherever it appears in the byte-range split;
- multiLine/quoted-newline records are out of scope: they make files
  unsplittable (one task per file at scale). Corpora needing
  embedded newlines belong in JSONL/parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_CORRUPT = "_corrupt_line"


def _header_line(schema: T.StructType, sep: str) -> str:
    return sep.join(f.name for f in schema.fields)


def _parse(
    lines: DataFrame, schema: T.StructType, sep: str, header: bool
) -> DataFrame:
    full = T.StructType(
        list(schema.fields) + [T.StructField(_CORRUPT, T.StringType())]
    )
    opts = {
        "mode": "PERMISSIVE",
        "columnNameOfCorruptRecord": _CORRUPT,
        "sep": sep,
    }
    if header:
        lines = lines.where(
            F.col("value") != F.lit(_header_line(schema, sep))
        )
    return lines.select(
        F.col("value"),
        F.from_csv(F.col("value"), full.simpleString(), opts).alias("_r"),
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame]:
    """Read a CSV corpus with an explicit schema; quarantine malformed
    lines.

    Returns ``(good, bad)``: ``good`` has exactly the declared
    schema; ``bad`` is a single-column DataFrame of raw unparseable
    lines. A row whose FIELD fails its declared type (e.g. text in a
    double column) is quarantined whole — partial rows don't leak
    nulls into the clean side.
    """
    parsed = _parse(spark.read.text(path), schema, sep, header)
    good = parsed.where(F.col(f"_r.{_CORRUPT}").isNull()).select(
        *[F.col(f"_r.{f.name}").alias(f.name) for f in schema.fields]
    )
    bad = parsed.where(F.col(f"_r.{_CORRUPT}").isNotNull()).select(
        F.col("value").alias("raw_line")
    )
    return good, bad


def read_csv_stream(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    header: bool = True,
    sep: str = ",",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming file-drop flavor: new CSV shards under ``path``
    become micro-batches; declared columns plus the ``_corrupt_line``
    audit column (NULL for clean rows) — the caller splits, as a
    streaming query can't be forked driver-side."""
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    parsed = _parse(reader.text(path), schema, sep, header)
    return parsed.select(
        *[F.col(f"_r.{f.name}").alias(f.name) for f in schema.fields],
        F.when(
            F.col(f"_r.{_CORRUPT}").isNotNull(), F.col("value")
        ).alias(_CORRUPT),
    )
