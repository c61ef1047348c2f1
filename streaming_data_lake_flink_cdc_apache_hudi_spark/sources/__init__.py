from .parquet import load_table, load_tables, TPCH_TABLES
from .cdc_feed import (
    ENVELOPE_FIELDS,
    envelope_schema,
    read_feed_batch,
    read_feed_stream,
    write_feed_events,
)

__all__ = [
    "load_table",
    "load_tables",
    "TPCH_TABLES",
    "ENVELOPE_FIELDS",
    "envelope_schema",
    "read_feed_batch",
    "read_feed_stream",
    "write_feed_events",
]
