"""CDC changelog feed source (≙ the reference's `postgres-cdc`
connector, SURVEY.md §2.1 S1/S2; envelope per FIXTURES.md F6).

The reference tails a Postgres WAL via Debezium, emitting
+I / -U / +U / -D changelog rows (CDC-Hudi-Notebook.zpln:1060 ¶24,
:1372 ¶30). Spark has no retract streams, so the engine models the
changelog explicitly as rows with a CDC envelope:

    op      string     'I' | 'U' | 'D'  ('U' carries before+after,
                       standing for Flink's -U/+U retract pair,
                       zpln:1870 ¶42)
    ts      timestamp  commit time — drives last-write-wins
    seq     long       total order within equal ts (≙ WAL LSN);
                       makes out-of-order delivery resolvable
    before  struct     pre-image (null for I)
    after   struct     post-image (null for D)

Feed layout = a directory of parquet files; one file ≙ one WAL
segment / commit batch. Batch readers see the whole feed;
``readStream`` + ``maxFilesPerTrigger`` replays it as micro-batches
(snapshot-then-tail: files already present = snapshot phase, files
appearing later = binlog phase — SURVEY.md §7 "snapshot→stream
handoff").

Scale: the feed is append-only and partition-parallel; nothing here
touches the driver. At 100 TB the same code points at a Kafka/object
-store landing zone instead of a local dir.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_FIELDS = ("op", "ts", "seq", "before", "after")


def envelope_schema(row_schema: T.StructType) -> T.StructType:
    """Build the full envelope StructType for a given source-row schema."""
    return T.StructType(
        [
            T.StructField("op", T.StringType(), False),
            T.StructField("ts", T.TimestampType(), False),
            T.StructField("seq", T.LongType(), False),
            T.StructField("before", row_schema, True),
            T.StructField("after", row_schema, True),
        ]
    )


def write_feed_events(
    spark: SparkSession,
    feed_dir: str,
    events: DataFrame,
    commit_id: str | None = None,
) -> str:
    """Append one commit batch (a DataFrame in envelope shape) to the feed.

    Used by tests/workload generators (≙ generateticketactivity,
    scripts/cdclambda/index.js:4). Writes a single parquet file per
    commit so `maxFilesPerTrigger=1` replays commit-by-commit.
    """
    commit_id = commit_id or uuid.uuid4().hex[:12]
    out = os.path.join(feed_dir, f"commit-{commit_id}.parquet")
    events.coalesce(1).write.mode("append").parquet(out)
    return out


def read_feed_batch(
    spark: SparkSession, feed_dir: str, row_schema: T.StructType
) -> DataFrame:
    """Bounded read of the whole feed (backfill / testing)."""
    return spark.read.schema(envelope_schema(row_schema)).parquet(
        os.path.join(feed_dir, "*")
    )


def read_feed_stream(
    spark: SparkSession,
    feed_dir: str,
    row_schema: T.StructType,
    max_files_per_trigger: int = 1,
) -> DataFrame:
    """Unbounded tail of the feed (≙ S1/S2 binlog phase)."""
    return (
        spark.readStream.schema(envelope_schema(row_schema))
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(os.path.join(feed_dir, "*"))
    )


def snapshot_to_feed(
    snapshot: DataFrame, ts_col: str | None = None
) -> DataFrame:
    """Wrap a plain table snapshot as 'I' envelope rows (≙ the
    snapshot phase of S1, where the connector emits the initial table
    scan as inserts before tailing the WAL)."""
    ts = F.col(ts_col) if ts_col else F.timestamp_seconds(F.lit(0))
    return snapshot.select(
        F.lit("I").alias("op"),
        ts.cast("timestamp").alias("ts"),
        F.monotonically_increasing_id().alias("seq"),
        F.lit(None).cast(
            T.StructType.fromJson(snapshot.schema.jsonValue())
        ).alias("before"),
        F.struct(*[F.col(c) for c in snapshot.columns]).alias("after"),
    )
