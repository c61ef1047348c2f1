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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table as a DataFrame (snapshot read).

    ``events.parquet`` stores TIMESTAMP(NANOS), which Spark's parquet
    reader rejects by default; read it via the nanosAsLong legacy mode
    and convert back to a (microsecond) timestamp. Works regardless of
    which session the driver hands us.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
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

    Same ns-timestamp handling as ``load_table``: the stream schema
    declares ts as long (ns) and converts to a microsecond timestamp.
    """
    from pyspark.sql import types as T

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
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
    return raw.withColumn(
        "ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
