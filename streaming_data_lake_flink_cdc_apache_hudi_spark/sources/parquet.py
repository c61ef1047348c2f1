"""Parquet snapshot source (≙ the snapshot phase of the reference's
`postgres-cdc` connector, SURVEY.md §2.1 S1, and the Hudi snapshot
read S4).

The driver's testdata tables (TESTDATA.md) are one parquet file per
table. ``spark.read.parquet`` gives predicate pushdown + column
pruning for free; callers should select/filter before any action so
Catalyst prunes the scan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TPCH_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def local_path_expr(col: F.Column) -> F.Column:
    """``file:///abs/p``, ``file:/abs/p``, ``hdfs://nn/abs/p`` (all
    URI-percent-encoded, the form ``_metadata.file_path`` yields) ->
    the local filesystem path matching ``os.path.abspath``: strip the
    scheme/authority, then percent-decode (r14 — a table path with a
    space previously never matched the interop readers' abspath-keyed
    maps). ``url_decode`` is form decoding ('+' means space), so a
    literal '+' is pre-escaped to %2B first — the combination is
    exact percent-decoding, and the escape sequences are always
    well-formed because the writer encodes a literal '%' as %25."""
    stripped = F.regexp_replace(col, r"^[A-Za-z0-9+.-]+:(//[^/]*)?", "")
    return F.url_decode(F.regexp_replace(stripped, r"\+", "%2B"))


def _parquet_ts_unit(path: str, column: str = "ts") -> str | None:
    """Time unit ('ns', 'us', 'ms', 's') a parquet timestamp column is
    stored in, read from the file footer — never assume the unit; the
    driver's testdata is timestamp[us] but other feeds may be ns."""
    try:
        import pyarrow.parquet as pq

        typ = pq.read_schema(path).field(column).type
        return getattr(typ, "unit", None)
    except Exception:
        return None


def parquet_row_count(sf_dir: str, name: str) -> int | None:
    """Exact row count of a testdata table from parquet FOOTER
    metadata — no Spark job, no data pages read. Returns None when the
    footer can't be read (caller falls back to ``df.count()``). Used by
    queries that size an algorithm parameter from the corpus size
    (e.g. ``q_semantic_dedup``'s cluster count) so the sizing costs a
    metadata read instead of a driver job on the query path."""
    try:
        import pyarrow.parquet as pq

        return pq.read_metadata(
            os.path.join(sf_dir, f"{name}.parquet")
        ).num_rows
    except Exception:
        return None


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (snapshot read).

    ``events.parquet`` may store TIMESTAMP(NANOS), which Spark's
    parquet reader rejects by default; when the footer says ns, read it
    via the nanosAsLong legacy mode and convert back to a (microsecond)
    timestamp. Micro/milli/second timestamps read natively.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events" and _parquet_ts_unit(path) == "ns":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn(
                "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
            )
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    names = names or TPCH_TABLES
    return {n: load_table(spark, sf_dir, n) for n in names}


def read_events_stream(spark: SparkSession, sf_dir: str):
    """events table as an unbounded stream (micro-batched file source).

    The ``ts`` unit is detected from the parquet footer, same as
    ``load_table``: nanosecond files are declared long and converted to
    a microsecond timestamp; microsecond files (the driver's testdata)
    are declared ``TIMESTAMP`` and read natively. Watermarks reject
    TIMESTAMP_NTZ, so the stream uses TIMESTAMP — with the session
    timezone pinned UTC (config.py) its wall clock is identical to the
    batch side's TIMESTAMP_NTZ read, preserving streaming/batch parity.
    """
    from pyspark.sql import types as T

    path = os.path.join(sf_dir, "events.parquet")
    is_ns = _parquet_ts_unit(path) == "ns"
    ts_type = T.LongType() if is_ns else T.TimestampType()
    if is_ns:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", ts_type),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    )
    # the table is a single FILE; the file-stream source requires a
    # directory or glob, so match it with a glob pattern
    raw = (
        spark.readStream.schema(schema)
        .parquet(os.path.join(sf_dir, "events.parque*"))
    )
    if is_ns:
        raw = raw.withColumn(
            "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
    return raw


def write_time_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    granularity: str = "day",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` date-partitioned on ``ts_col`` (``dt=YYYY-MM-DD``
    dirs for "day", ``dt=YYYY-MM`` for "month") — the canonical lake
    layout for event/time-series tables: a time-range query prunes
    whole partition DIRECTORIES before any file is opened, so a
    one-day probe of a years-deep 100 TB table lists one directory.
    The partition column is redundant with ``ts_col`` (derived, kept
    string-typed so dir names are stable across engines); readers get
    pruning automatically because Spark rewrites ``ts_col`` range
    predicates onto ``dt`` only if the query filters on ``dt`` — so
    ``read_time_partitioned`` derives the ``dt`` bounds from the
    requested time range for the caller.
    """
    from pyspark.sql import functions as F

    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM"}[granularity]
    (
        df.withColumn("dt", F.date_format(F.col(ts_col), fmt))
        .write.mode(mode)
        .partitionBy("dt")
        .parquet(path)
    )


def read_time_partitioned(
    spark: SparkSession,
    path: str,
    ts_col: str,
    start: str | None = None,
    end: str | None = None,
    granularity: str = "day",
) -> DataFrame:
    """Read a ``write_time_partitioned`` table with an optional
    [start, end) time range. The range is applied BOTH as a ``dt``
    partition filter (string compare on the dir value — prunes
    directories in the scan's PartitionFilters) and as the exact
    ``ts_col`` predicate (row-level correctness inside the boundary
    partitions)."""
    from pyspark.sql import functions as F

    fmt_len = {"day": 10, "month": 7}[granularity]
    df = spark.read.parquet(path)
    if start is not None:
        df = df.filter(
            (F.col("dt") >= start[:fmt_len])
            & (F.col(ts_col) >= F.lit(start).cast("timestamp"))
        )
    if end is not None:
        df = df.filter(
            (F.col("dt") <= end[:fmt_len])
            & (F.col(ts_col) < F.lit(end).cast("timestamp"))
        )
    return df
