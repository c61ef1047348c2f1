"""Spark 4 Python DataSource for the CDC envelope feed: mounts a
feed directory as ``spark.read.format("cdcfeed")`` and
``spark.readStream.format("cdcfeed")`` — the engine's connector
surface exposed through Spark's native extension point instead of
helper functions (≙ the reference registering its `postgres-cdc`
connector with the Flink catalog).

Why a Python DataSource (vs the read_feed_* helpers, which remain):
the format string plugs into ANY Spark SQL surface — `CREATE TABLE
… USING cdcfeed`, third-party tools that take a format name, the
options-driven reader config path — with no engine import on the
call site.

Read path is Arrow: each partition is one parquet part-file and
``read`` yields pyarrow RecordBatches straight off the file, so rows
never materialize in Python. Batch = all part files, one partition
each (Spark schedules them across executors). Streaming offsets
carry the consumed part-file list (the same bookkeeping Spark's own
file stream source persists in its log); each micro-batch is exactly
the files that appeared since the last offset — the snapshot-then-
tail handoff (files present at start = snapshot, later files =
binlog) falls out unchanged. At object-store scale swap the listing
for a manifest/notification feed; offsets would compact to a
high-watermark.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)


def _part_files(root: str) -> list[str]:
    """All parquet part files under the feed dir, stable total order
    (commit dir name, then part name) — append-only feeds only ever
    grow this list."""
    out: list[str] = []
    if not os.path.isdir(root):
        return out
    for entry in sorted(os.listdir(root)):
        p = os.path.join(root, entry)
        if os.path.isfile(p) and entry.endswith(".parquet"):
            out.append(p)
        elif os.path.isdir(p):
            out.extend(
                os.path.join(p, f)
                for f in sorted(os.listdir(p))
                if f.endswith(".parquet") and not f.startswith("_")
            )
    return out


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _us_type(t):
    """Arrow type with any ns-precision timestamps coerced to µs
    (Spark's timestamp precision), recursively through structs/lists
    — pyarrow surfaces some parquet footers as ns, which Spark's
    Arrow bridge rejects."""
    import pyarrow as pa

    if pa.types.is_timestamp(t) and t.unit == "ns":
        return pa.timestamp("us", tz=t.tz)
    if pa.types.is_struct(t):
        return pa.struct(
            [pa.field(f.name, _us_type(f.type), f.nullable) for f in t]
        )
    if pa.types.is_list(t):
        return pa.list_(_us_type(t.value_type))
    return t


def _us_schema(schema):
    import pyarrow as pa

    return pa.schema(
        [pa.field(f.name, _us_type(f.type), f.nullable) for f in schema]
    )


def _read_file(path: str) -> Iterator:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    target = _us_schema(pf.schema_arrow)
    for batch in pf.iter_batches():
        yield batch.cast(target) if batch.schema != target else batch


class CdcFeedBatchReader(DataSourceReader):
    def __init__(self, options):
        self.root = options.get("path")

    def partitions(self) -> Sequence[InputPartition]:
        return [_FilePartition(p) for p in _part_files(self.root)]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.path)


class CdcFeedStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.root = options.get("path")

    def initialOffset(self) -> dict:
        return {"files": []}

    def latestOffset(self) -> dict:
        return {"files": _part_files(self.root)}

    def partitions(self, start: dict, end: dict):
        seen = set(start.get("files", []))
        new = [p for p in end.get("files", []) if p not in seen]
        return [_FilePartition(p) for p in new]

    def read(self, partition: _FilePartition):
        yield from _read_file(partition.path)

    def commit(self, end: dict) -> None:
        pass  # offsets fully describe progress; nothing to clean up


class CdcFeedDataSource(DataSource):
    """format("cdcfeed"): option `path` points at a feed directory."""

    @classmethod
    def name(cls) -> str:
        return "cdcfeed"

    def schema(self) -> str:
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        files = _part_files(self.options.get("path"))
        if not files:
            raise ValueError(
                "cdcfeed: empty feed dir and no explicit .schema(); "
                "point `path` at a feed with at least one commit"
            )
        return from_arrow_schema(
            _us_schema(pq.ParquetFile(files[0]).schema_arrow)
        )

    def reader(self, schema) -> CdcFeedBatchReader:
        return CdcFeedBatchReader(self.options)

    def streamReader(self, schema) -> CdcFeedStreamReader:
        return CdcFeedStreamReader(self.options)


def register_cdcfeed_source(spark) -> None:
    """Register format("cdcfeed") on this session (idempotent)."""
    spark.dataSource.register(CdcFeedDataSource)
