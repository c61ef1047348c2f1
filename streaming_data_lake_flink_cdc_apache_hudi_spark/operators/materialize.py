"""Compute-once pins for heavy intermediates (r14 — guide §5, VERDICT
r13 item 6: the 100 TB-safe materialization story for the pinned
banded/edge tables).

``localCheckpoint`` pins blocks on executors with NO lineage
fallback: an executor loss fails the job mid-query. That is the right
trade for the KB-MB intermediates at local/bench scale (zero write
latency, no directory to manage). At cluster scale, set

    spark.cdc_lake.pin.reliableDir = <durable checkpoint directory>

and every pin goes through reliable ``Dataset.checkpoint`` instead
(replicated storage, lineage-free recovery) — the local analog of the
warehouse "write the banded signature table" pass the LSH operators
document.

EAGERNESS IS PART OF THE CONTRACT: the pin materializes at
construction so downstream join planning sees the REAL size of the
pinned table. Below the broadcast threshold the banded self-joins
then run as a BroadcastHashJoin over two scans of ONE RDD (zero
exchanges under the join); above it they revert to sort-merge — the
exchange elimination is lost, but the pinned subtree (banding,
hashing, clustering) still computes exactly once, which is the
durable win. Plan-only flows (explain sweeps) therefore execute the
pinned subtree as a side effect of building the plan; that is the
price of honest join sizing (ADVICE r13, adjudicated r14).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_DIR_KEY = "spark.cdc_lake.pin.reliableDir"


def pin(df: DataFrame) -> DataFrame:
    """Materialize ``df`` once and truncate its lineage.

    Default: ``localCheckpoint(eager=True)``. With ``_DIR_KEY`` set
    on the session, a reliable ``checkpoint(eager=True)`` into that
    directory (set as the context's checkpoint dir on first use).
    """
    spark = df.sparkSession
    rdir = spark.conf.get(_DIR_KEY, None)
    if rdir:
        sc = spark.sparkContext
        if sc.getCheckpointDir() is None:
            sc.setCheckpointDir(rdir)
        return df.checkpoint(eager=True)
    return df.localCheckpoint(eager=True)
