"""Incremental view maintenance for the flagship changelog join
(SURVEY.md §2.2 R7 streaming, §7 hard-part #1).

The reference's flagship query (CDC-Hudi-Notebook.zpln:2317 ¶53)
joins three CDC streams — person (snapshot+binlog), sporting_event_
ticket (binlog, receives UPDATEs of ticketholder_id on every ticket
transfer), ticket_purchase_hist (binlog, append-only) — into a Hudi
view keyed on full_name. Flink handles updates on every side via
retract streams. Spark's stream-stream join rejects update inputs,
so the engine maintains the view incrementally:

per micro-batch:
1. MERGE each source delta into its per-source state table
   (UpsertLakeTable; ≙ Flink's join state, but queryable).
2. Compute the AFFECTED person ids — the only view keys whose rows
   can change: ids in the person delta, before+after holders of
   changed tickets, and holders of tickets referenced by new hist
   rows (before-images matter: a transfer retracts the old holder's
   row, ¶42 zpln:1870).
3. Recompute the join restricted to affected ids (semi-join pruned
   slices of state) → fresh rows per affected full_name.
4. Diff against the sink: upsert fresh rows, delete view keys that
   no longer produce a row (including old full_names on rename —
   the view PK itself can change).

Scale: every step is a join keyed on person/ticket id — the affected
set is O(delta), state access is semi-join-pruned, nothing touches
the driver. At 100 TB the state tables are the big objects; they are
bucketed on their keys, so step-3 slices read only matching buckets.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pyspark.sql import types as T

from .upsert_sink import UpsertLakeTable

_HIST_SCHEMA = T.StructType(
    [
        T.StructField("sporting_event_ticket_id", T.DoubleType()),
        T.StructField("purchase_by_id", T.DoubleType()),
        T.StructField("transaction_date_time", T.TimestampType()),
        T.StructField("transferred_from_id", T.DoubleType()),
        T.StructField("purchase_price", T.FloatType()),
    ]
)

_PERSON_SCHEMA = T.StructType(
    [
        T.StructField("id", T.DoubleType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("first_name", T.StringType()),
    ]
)

_TICKET_SCHEMA = T.StructType(
    [
        T.StructField("id", T.DoubleType()),
        T.StructField("sporting_event_id", T.DoubleType()),
        T.StructField("sport_location_id", T.DoubleType()),
        T.StructField("seat_level", T.IntegerType()),
        T.StructField("seat_section", T.StringType()),
        T.StructField("seat_row", T.StringType()),
        T.StructField("seat", T.StringType()),
        T.StructField("ticketholder_id", T.DoubleType()),
        T.StructField("ticket_price", T.FloatType()),
    ]
)


class FlagshipViewIVM:
    """Maintains ticket_view (¶51/¶53) from three changelog deltas.

    Source schemas = FIXTURES.md F1-F3 (person, sporting_event_ticket,
    ticket_purchase_hist); view schema = F5.
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.person = UpsertLakeTable(
            spark, f"{root}/state/person", key="id", schema=_PERSON_SCHEMA
        )
        self.ticket = UpsertLakeTable(
            spark, f"{root}/state/ticket", key="id", schema=_TICKET_SCHEMA
        )
        self.hist = UpsertLakeTable(
            spark,
            f"{root}/state/hist",
            key=["sporting_event_ticket_id", "purchase_by_id", "transaction_date_time"],
            schema=_HIST_SCHEMA,
        )
        self.view = UpsertLakeTable(spark, f"{root}/view", key="full_name")

    # delta inputs: reduced-changelog shape (post-image cols +
    # _deleted + _cdc_ts/_cdc_seq), as produced by
    # pipeline.reduce_changelog_batch, PLUS _before_<col> columns for
    # the pre-image attributes the diff needs (holder / full_name)

    def _affected_person_ids(
        self,
        person_delta: DataFrame | None,
        ticket_delta: DataFrame | None,
        hist_delta: DataFrame | None,
        ticket_state: DataFrame,
    ) -> DataFrame:
        parts = []
        if person_delta is not None:
            parts.append(person_delta.select(F.col("id").alias("pid")))
        if ticket_delta is not None:
            parts.append(
                ticket_delta.select(F.col("ticketholder_id").alias("pid"))
            )
            parts.append(
                ticket_delta.select(F.col("_before_ticketholder_id").alias("pid"))
            )
        if hist_delta is not None:
            # holders of the tickets the new hist rows reference —
            # resolved against ticket state (post-merge)
            parts.append(
                hist_delta.select(
                    F.col("sporting_event_ticket_id").alias("tid")
                )
                .join(
                    ticket_state.select(
                        F.col("id").alias("tid"),
                        F.col("ticketholder_id").alias("pid"),
                    ),
                    "tid",
                )
                .select("pid")
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out.filter(F.col("pid").isNotNull()).distinct()

    def apply(
        self,
        person_delta: DataFrame | None = None,
        ticket_delta: DataFrame | None = None,
        hist_delta: DataFrame | None = None,
        commit_id: str | None = None,
    ) -> None:
        """Apply one micro-batch of source deltas to state + view."""
        cid = commit_id or "batch"
        # 1. merge deltas into per-source state
        if person_delta is not None:
            self.person.write(
                person_delta.drop(
                    *[c for c in person_delta.columns if c.startswith("_before_")]
                ),
                commit_id=f"{cid}-person",
                delete_col="_deleted",
            )
        if ticket_delta is not None:
            self.ticket.write(
                ticket_delta.drop(
                    *[c for c in ticket_delta.columns if c.startswith("_before_")]
                ),
                commit_id=f"{cid}-ticket",
                delete_col="_deleted",
            )
        if hist_delta is not None:
            self.hist.write(
                hist_delta.drop(
                    *[c for c in hist_delta.columns if c.startswith("_before_")]
                ),
                commit_id=f"{cid}-hist",
                delete_col="_deleted",
            )

        # prefix every side's columns so the 3-way join + affected-set
        # semi-joins never share attribute lineage (Spark's ambiguous
        # self-join check trips otherwise: deltas, state snapshots and
        # the affected set all descend from the same scans)
        p_state = self.person.snapshot().select(
            F.col("id").alias("p_id"), F.col("full_name").alias("p_full_name")
        )
        t_state = self.ticket.snapshot().select(
            F.col("id").alias("t_id"),
            F.col("ticketholder_id").alias("t_holder"),
            F.col("ticket_price").alias("t_price"),
        )
        h_state = self.hist.snapshot().select(
            F.col("sporting_event_ticket_id").alias("h_tid"),
            F.col("transaction_date_time").alias("h_ts"),
            F.col("purchase_by_id").alias("h_buyer"),
        )

        # 2. affected view slice — built from an INDEPENDENT snapshot
        # read of ticket state so the later p⋈t join doesn't see the
        # same lineage twice (ambiguous-self-join check)
        affected = self._affected_person_ids(
            person_delta, ticket_delta, hist_delta,
            self.ticket.snapshot().select("id", "ticketholder_id"),
        ).select(F.col("pid").alias("a_pid"))

        # 3. recompute the flagship join for affected persons only
        p = p_state.join(affected, p_state["p_id"] == affected["a_pid"], "left_semi")
        joined = (
            p.join(t_state, p["p_id"] == t_state["t_holder"])
            .join(h_state, h_state["h_tid"] == t_state["t_id"])
            .select(
                F.col("p_full_name").alias("full_name"),
                F.col("t_id").cast("string").alias("tid_str"),
                F.col("t_price").alias("ticket_price"),
                F.col("h_ts").alias("transaction_date_time"),
                F.col("h_buyer").alias("purchase_by_id"),
            )
        )
        from ..operators.upsert import latest_by_key

        fresh = (
            latest_by_key(
                joined,
                "full_name",
                ["transaction_date_time", "tid_str", "purchase_by_id"],
            )
            .select(
                "full_name",
                F.col("tid_str").alias("id"),
                "ticket_price",
                F.col("transaction_date_time").cast("string").alias(
                    "transaction_date_time"
                ),
            )
        )

        # 4. diff: upserts = fresh; deletes = previously-live keys of
        # affected persons (current OR pre-image names) with no fresh row
        candidate_names = p_state.join(
            affected, p_state["p_id"] == affected["a_pid"], "left_semi"
        ).select(F.col("p_full_name").alias("full_name"))
        if person_delta is not None:
            candidate_names = candidate_names.unionByName(
                person_delta.select(
                    F.col("_before_full_name").alias("full_name")
                ).filter(F.col("full_name").isNotNull())
            )
        dead = (
            candidate_names.distinct()
            .join(fresh.select("full_name"), "full_name", "left_anti")
            .select(
                "full_name",
                F.lit(None).cast("string").alias("id"),
                F.lit(None).cast(fresh.schema["ticket_price"].dataType).alias(
                    "ticket_price"
                ),
                F.lit(None).cast("string").alias("transaction_date_time"),
            )
        )
        delta = fresh.withColumn("_deleted", F.lit(False)).unionByName(
            dead.withColumn("_deleted", F.lit(True))
        )
        self.view.write(delta, commit_id=f"{cid}-view", delete_col="_deleted")


# ---------------------------------------------------------------------------
# Streaming wiring: one multiplexed CDC feed -> synchronized foreachBatch
# over all three sources (≙ the Flink job consuming 3 connectors in one
# graph, CDC-Hudi-Notebook.zpln:2317 ¶53)
# ---------------------------------------------------------------------------

_PERSON_FIELDS = ["id", "full_name", "last_name", "first_name"]
_TICKET_FIELDS = [
    "id", "sporting_event_id", "sport_location_id", "seat_level",
    "seat_section", "seat_row", "seat", "ticketholder_id", "ticket_price",
]
_HIST_FIELDS = [
    "sporting_event_ticket_id", "purchase_by_id", "transaction_date_time",
    "transferred_from_id", "purchase_price",
]

# union-of-schemas payload struct: one changelog stream carries all three
# sources (sparse nulls), tagged by `src` — lets a single streaming query
# see every source's events in the same micro-batch, which is what keeps
# the three state tables and the view transactionally in step
MUX_ROW_SCHEMA = T.StructType(
    [
        T.StructField("id", T.DoubleType()),
        T.StructField("full_name", T.StringType()),
        T.StructField("last_name", T.StringType()),
        T.StructField("first_name", T.StringType()),
        T.StructField("sporting_event_id", T.DoubleType()),
        T.StructField("sport_location_id", T.DoubleType()),
        T.StructField("seat_level", T.IntegerType()),
        T.StructField("seat_section", T.StringType()),
        T.StructField("seat_row", T.StringType()),
        T.StructField("seat", T.StringType()),
        T.StructField("ticketholder_id", T.DoubleType()),
        T.StructField("ticket_price", T.FloatType()),
        T.StructField("sporting_event_ticket_id", T.DoubleType()),
        T.StructField("purchase_by_id", T.DoubleType()),
        T.StructField("transaction_date_time", T.TimestampType()),
        T.StructField("transferred_from_id", T.DoubleType()),
        T.StructField("purchase_price", T.FloatType()),
    ]
)


def mux_envelope(src: str, env: DataFrame) -> DataFrame:
    """Lift a single-source envelope DataFrame into the multiplexed
    shape: (src, op, ts, seq, before, after) with union-struct
    payloads (missing fields null)."""

    def widen(col):
        present = {f.name for f in env.schema[col].dataType.fields}
        return F.when(
            F.col(col).isNull(), F.lit(None).cast(MUX_ROW_SCHEMA)
        ).otherwise(
            F.struct(
                *[
                    (
                        F.col(f"{col}.{f.name}").cast(f.dataType)
                        if f.name in present
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in MUX_ROW_SCHEMA.fields
                ]
            )
        )

    return env.select(
        F.lit(src).alias("src"),
        "op",
        "ts",
        "seq",
        widen("before").alias("before"),
        widen("after").alias("after"),
    )


def mux_feed_schema() -> T.StructType:
    from ..sources.cdc_feed import envelope_schema

    base = envelope_schema(MUX_ROW_SCHEMA)
    return T.StructType([T.StructField("src", T.StringType(), False)] + base.fields)


class FlagshipStreamRunner:
    """End-to-end streaming flagship: multiplexed feed dir →
    FlagshipViewIVM, one IVM transaction per micro-batch."""

    def __init__(self, spark: SparkSession, root: str, feed_dir: str):
        self.spark = spark
        self.ivm = FlagshipViewIVM(spark, root)
        self.feed_dir = feed_dir
        self.checkpoint = f"{root}/_checkpoint"

    def start(self, trigger: dict | None = None):
        import os

        from ..sources.cdc_feed import envelope_schema  # noqa: F401
        from .pipeline import reduce_changelog_batch

        stream = (
            self.spark.readStream.schema(mux_feed_schema())
            .option("maxFilesPerTrigger", 1)
            .parquet(os.path.join(self.feed_dir, "*"))
        )

        def _apply(batch: DataFrame, epoch_id: int) -> None:
            def delta(src, fields, key, before_cols):
                sub = batch.filter(F.col("src") == src).drop("src")
                if sub.isEmpty():
                    return None
                red = reduce_changelog_batch(sub, key)
                cols = [c for c in fields] + ["_deleted"]
                out = red.select(*cols)
                if not before_cols:
                    return out
                # carry pre-image columns for the IVM diff
                pre = (
                    sub.select(
                        *[
                            F.col(f"before.{c}").alias(f"_before_{c}")
                            for c in before_cols
                        ],
                        *[
                            F.coalesce(
                                F.col(f"after.{key0}"), F.col(f"before.{key0}")
                            ).alias(key0)
                            for key0 in ([key] if isinstance(key, str) else key)
                        ],
                    )
                    .groupBy(*([key] if isinstance(key, str) else key))
                    .agg(
                        *[
                            F.first(f"_before_{c}", ignorenulls=True).alias(
                                f"_before_{c}"
                            )
                            for c in before_cols
                        ]
                    )
                )
                return out.join(pre, [key] if isinstance(key, str) else key, "left")

            self.ivm.apply(
                person_delta=delta(
                    "person", _PERSON_FIELDS, "id", ["full_name"]
                ),
                ticket_delta=delta(
                    "ticket", _TICKET_FIELDS, "id", ["ticketholder_id"]
                ),
                hist_delta=delta(
                    "hist",
                    _HIST_FIELDS,
                    ["sporting_event_ticket_id", "purchase_by_id",
                     "transaction_date_time"],
                    [],
                ),
                commit_id=f"epoch-{epoch_id}",
            )

        writer = (
            stream.writeStream.foreachBatch(_apply)
            .option("checkpointLocation", self.checkpoint)
            .outputMode("update")
        )
        return writer.trigger(**(trigger or {"availableNow": True})).start()
