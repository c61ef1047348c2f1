"""Engine-wide error types shared across the lake and the interop
writers (split out of ``streaming.upsert_sink`` in r13 so the interop
format writers can raise the same put-if-absent loss without import
cycles)."""

from __future__ import annotations


class ConcurrentWriterError(RuntimeError):
    """Another writer holds the table's write lease, or won the
    put-if-absent commit race (Delta's N.json / Iceberg's metadata
    version / Hudi's instant file landed first). The losing commit
    wrote NO table-visible state; staged data files it may have
    left behind are uncommitted orphans that VACUUM-class reclaimers
    remove — the same contract delta-spark's optimistic concurrency
    documents."""
