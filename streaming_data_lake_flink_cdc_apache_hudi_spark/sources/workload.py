"""Synthetic CDC workload generator (FIXTURES.md §W).

Emulates the reference's change generator: a Lambda calls
``dms_sample.generateticketactivity(500)`` once per minute
(scripts/cdclambda/index.js:4; schedule
lib/rds-cdc-flink-hudi-stack.ts:521-528). Each transfer is one UPDATE
of ``sporting_event_ticket.ticketholder_id`` plus one INSERT into
``ticket_purchase_hist`` — with occasional person INSERT/UPDATE
(CDC-Hudi-Notebook.zpln:1674 ¶37, :1793 ¶40).

Deterministic (seeded); emits CDC-envelope DataFrames compatible with
``sources.cdc_feed`` and the streaming pipeline.
"""

from __future__ import annotations

import datetime as dt
import random

from pyspark.sql import DataFrame, Row, SparkSession
from pyspark.sql import types as T

from .cdc_feed import envelope_schema

TICKET_SCHEMA = T.StructType(
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

HIST_SCHEMA = T.StructType(
    [
        T.StructField("sporting_event_ticket_id", T.DoubleType()),
        T.StructField("purchase_by_id", T.DoubleType()),
        T.StructField("transaction_date_time", T.TimestampType()),
        T.StructField("transferred_from_id", T.DoubleType()),
        T.StructField("purchase_price", T.FloatType()),
    ]
)


class TicketWorkload:
    """Stateful generator of ticket-transfer change batches."""

    def __init__(
        self,
        spark: SparkSession,
        n_persons: int = 1000,
        n_tickets: int = 5000,
        seed: int = 42,
        start: dt.datetime | None = None,
    ):
        self.spark = spark
        self.rng = random.Random(seed)
        self.n_persons = n_persons
        self.holders = {
            t: self.rng.randrange(1, n_persons + 1) for t in range(1, n_tickets + 1)
        }
        self.clock = start or dt.datetime(2024, 1, 1)
        self.seq = 0

    def _ticket_row(self, tid: int, holder: int) -> dict:
        return {
            "id": float(tid),
            "sporting_event_id": float(tid % 97),
            "sport_location_id": float(tid % 13),
            "seat_level": tid % 5,
            "seat_section": f"S{tid % 40}",
            "seat_row": f"R{tid % 25}",
            "seat": str(tid),
            "ticketholder_id": float(holder),
            "ticket_price": round(10.0 + (tid % 500) * 0.5, 2),
        }

    def snapshot_tickets(self) -> DataFrame:
        """Initial full-table snapshot as 'I' envelope rows (S1)."""
        rows = []
        for tid, holder in self.holders.items():
            self.seq += 1
            rows.append(
                Row(
                    op="I",
                    ts=self.clock,
                    seq=self.seq,
                    before=None,
                    after=Row(**self._ticket_row(tid, holder)),
                )
            )
        return self.spark.createDataFrame(rows, envelope_schema(TICKET_SCHEMA))

    def transfer_batch(self, n_transfers: int = 500) -> tuple[DataFrame, DataFrame]:
        """One tick: ≤n_transfers ticket transfers → (ticket_updates,
        hist_inserts) envelope DataFrames (the ¶W UPDATE+INSERT pair)."""
        t_rows, h_rows = [], []
        for _ in range(n_transfers):
            tid = self.rng.randrange(1, len(self.holders) + 1)
            old = self.holders[tid]
            new = self.rng.randrange(1, self.n_persons + 1)
            self.holders[tid] = new
            self.clock += dt.timedelta(milliseconds=self.rng.randrange(50, 150))
            self.seq += 1
            t_rows.append(
                Row(
                    op="U",
                    ts=self.clock,
                    seq=self.seq,
                    before=Row(**self._ticket_row(tid, old)),
                    after=Row(**self._ticket_row(tid, new)),
                )
            )
            self.seq += 1
            price = self._ticket_row(tid, new)["ticket_price"]
            h_rows.append(
                Row(
                    op="I",
                    ts=self.clock,
                    seq=self.seq,
                    before=None,
                    after=Row(
                        sporting_event_ticket_id=float(tid),
                        purchase_by_id=float(new),
                        transaction_date_time=self.clock,
                        transferred_from_id=float(old),
                        purchase_price=price,
                    ),
                )
            )
        return (
            self.spark.createDataFrame(t_rows, envelope_schema(TICKET_SCHEMA)),
            self.spark.createDataFrame(h_rows, envelope_schema(HIST_SCHEMA)),
        )
