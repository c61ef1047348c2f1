"""JDBC → CDC-feed poll bridge (≙ the reference's LIVE WAL tail,
CDC-Hudi-Notebook.zpln:1060 ¶24: `'connector'='postgres-cdc'` with a
replication slot + pgoutput plugin, feeding the streaming pipeline
continuously).

A pure-PySpark engine cannot open a replication slot, but the same
capability — "point the engine at a live JDBC database and the lake
table follows it" — is the standard query-based CDC pattern (what
Kafka's JDBC source connector does): periodic INCREMENTAL pulls by a
monotonic cursor column, each pull appended to the engine's CDC feed
as one envelope commit batch, which ``read_feed_stream`` +
``stream_upsert`` then consume exactly like the file-feed emulation.

Two source shapes:

- **outbox mode** (``op_col`` set): the polled table IS a changelog
  (an outbox/audit table with op + monotonic seq + commit ts — the
  WAL-shaped case). Every op including deletes flows through; the
  cursor is the outbox seq (≙ LSN).
- **table mode** (no ``op_col``): the polled table is the live OLTP
  table with a monotonic last-modified column. Inserts and updates
  surface as 'U' upserts (LWW downstream makes that exact); hard
  deletes are invisible to the cursor poll — the documented limit of
  query-based CDC everywhere, and why the reference uses a
  replication slot. Two ways to capture them here: outbox mode (or
  soft-delete flags mapped to ``op_col``), or **keys-diff mode**
  (``key_cols`` set): :meth:`poll_deletes` pulls the source's key
  set (key columns only cross the wire), anti-joins it against the
  previous key snapshot kept next to the feed, and emits a 'D'
  envelope per vanished key. The snapshot swap is versioned +
  pointer-atomic and the delete batch's commit id is derived from
  the snapshot version, so crash-retry replays dedup downstream.
  Keys-diff deletes are eventually-consistent at the diff cadence
  (a delete+reinsert between diffs is correctly invisible).

Delivery is at-least-once: the cursor file advances AFTER the feed
batch lands, so a crash between the two replays rows — harmless,
because the downstream sink reduces by (ts, seq) LWW and commit
replay is idempotent (SURVEY.md §7 hard-part #2).

Scale: each pull is pushed down as a WHERE cursor > last subquery
(only new rows cross the wire) and can be range-partitioned like any
:func:`read_jdbc_table`; the bridge itself holds only the cursor —
O(1) state, no row buffering.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .cdc_feed import write_feed_events


class JdbcFeedBridge:
    """Incremental JDBC puller writing CDC envelope batches to a feed.

    ``cursor_col`` must be monotonic non-repeating per change (an
    outbox seq / auto-increment id / change LSN). ``ts_col`` names the
    commit-time column for the envelope's event-time LWW ordering
    (defaults to the cursor being the only order). ``op_col`` (outbox
    mode) holds 'I'/'U'/'D' per row.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        table: str,
        cursor_col: str,
        feed_dir: str,
        driver: str | None = None,
        op_col: str | None = None,
        ts_col: str | None = None,
        max_rows_per_poll: int = 100_000,
        jdbc_options: dict[str, str] | None = None,
        key_cols: list[str] | None = None,
    ):
        self.spark = spark
        self.url = url
        self.table = table
        self.cursor_col = cursor_col
        self.feed_dir = feed_dir
        self.driver = driver
        self.op_col = op_col
        self.ts_col = ts_col
        self.max_rows = int(max_rows_per_poll)
        self.jdbc_options = dict(jdbc_options or {})
        self.key_cols = [k.lower() for k in (key_cols or [])]
        os.makedirs(feed_dir, exist_ok=True)
        self._cursor_path = os.path.join(feed_dir, "_jdbc_cursor.json")
        # key snapshots are PARQUET DIRS: they must live OUTSIDE the
        # feed dir or the feed's glob read would pick their files up
        self._state_dir = feed_dir.rstrip("/") + ".bridge-state"
        os.makedirs(self._state_dir, exist_ok=True)
        self._keys_ptr_path = os.path.join(self._state_dir, "keys_ptr.json")
        # high-water mark of (ts, seq) already EMITTED to the feed by
        # poll_once — keys-diff deletes must be stamped after it, not
        # just after the key snapshot (see poll_deletes)
        self._wm_path = os.path.join(self._state_dir, "emit_watermark.json")

    # -- cursor state (O(1), crash-safe via atomic replace) -----------------

    def last_cursor(self) -> int:
        if not os.path.exists(self._cursor_path):
            return -1
        with open(self._cursor_path) as fh:
            return int(json.load(fh)["cursor"])

    def _save_cursor(self, value: int) -> None:
        tmp = self._cursor_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"cursor": int(value), "table": self.table}, fh)
        os.replace(tmp, self._cursor_path)

    # -- one pull -----------------------------------------------------------

    def _pull(self, after: int) -> DataFrame:
        # WHERE cursor > last is evaluated SOURCE-side (dbtable
        # subquery): only new rows cross the wire. FETCH FIRST bounds a
        # backlog catch-up pull; the next poll continues from there.
        # ANSI-quoted cursor identifier: tables created by Spark's JDBC
        # writer have case-sensitive (quoted) column names.
        qc = f'"{self.cursor_col}"'
        sub = (
            f"(SELECT * FROM {self.table} WHERE {qc} > {int(after)} "
            f"ORDER BY {qc} "
            f"FETCH FIRST {self.max_rows} ROWS ONLY) poll_sub"
        )
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", sub)
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        for k, v in self.jdbc_options.items():
            reader = reader.option(k, v)
        return reader.load()

    def _to_envelope(self, batch: DataFrame) -> DataFrame:
        # normalize identifiers: JDBC dialects fold case (Derby/Oracle
        # uppercase) — the feed contract is lowercase row fields
        batch = batch.toDF(*[c.lower() for c in batch.columns])
        cursor = self.cursor_col.lower()
        drop = {cursor}
        op = F.lit("U")
        if self.op_col:
            op = F.upper(F.col(self.op_col.lower())).substr(1, 1)
            drop.add(self.op_col.lower())
        ts = (
            F.col(self.ts_col.lower()).cast("timestamp")
            if self.ts_col
            else F.timestamp_seconds(F.col(cursor).cast("long"))
        )
        row_cols = [c for c in batch.columns if c not in drop]
        image = F.struct(*[F.col(c) for c in row_cols])
        null_image = F.lit(None).cast(
            "struct<" + ",".join(
                f"{c}:{batch.schema[c].dataType.simpleString()}" for c in row_cols
            ) + ">"
        )
        # D rows carry their last image as the PRE-image (the post-image
        # of a delete is nothing) — reduce_changelog_batch keys off
        # coalesce(after, before), so tombstones resolve their key.
        return batch.select(
            op.alias("op"),
            ts.alias("ts"),
            F.col(cursor).cast("long").alias("seq"),
            F.when(op == "D", image).otherwise(null_image).alias("before"),
            F.when(op != "D", image).otherwise(null_image).alias("after"),
        )

    def poll_once(self) -> int:
        """One incremental pull → at most one feed commit batch.
        Returns the number of change events appended (0 = caught up)."""
        after = self.last_cursor()
        batch = self._pull(after).persist()
        try:
            n = batch.count()
            if n == 0:
                return 0
            ts_expr = (
                F.col(self.ts_col).cast("timestamp")
                if self.ts_col
                else F.timestamp_seconds(
                    F.col(self.cursor_col).cast("long")
                )
            )
            hi, wm_ts = batch.agg(
                F.max(F.col(self.cursor_col).cast("long")),
                F.max(ts_expr),
            ).collect()[0]
            write_feed_events(
                self.spark,
                self.feed_dir,
                self._to_envelope(batch),
                commit_id=f"jdbc-{after + 1}-{hi}",
            )
            self._save_cursor(hi)
            self._save_watermark(wm_ts, hi)
            return n
        finally:
            batch.unpersist()

    def _save_watermark(self, wm_ts, wm_seq: int) -> None:
        """Advance the emitted (ts, seq) high-water mark — monotonic,
        crash-safe via atomic replace; written AFTER the feed batch
        lands (replays only re-raise it to the same value)."""
        prev_ts, prev_seq = self._load_watermark()
        new_iso = wm_ts.isoformat(sep=" ") if wm_ts is not None else None
        if new_iso is None or (prev_ts is not None and new_iso <= prev_ts):
            wm_iso = prev_ts
        else:
            wm_iso = new_iso
        tmp = self._wm_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {"ts": wm_iso, "seq": max(int(wm_seq), prev_seq or 0)}, fh
            )
        os.replace(tmp, self._wm_path)

    def _load_watermark(self) -> tuple[str | None, int | None]:
        if not os.path.exists(self._wm_path):
            return None, None
        with open(self._wm_path) as fh:
            wm = json.load(fh)
        return wm.get("ts"), wm.get("seq")

    # -- keys-diff delete capture (table mode) ------------------------------

    def _jdbc_read(self, select_sql: str) -> DataFrame:
        reader = (
            self.spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", f"({select_sql}) diff_sub")
        )
        if self.driver:
            reader = reader.option("driver", self.driver)
        for k, v in self.jdbc_options.items():
            reader = reader.option(k, v)
        return reader.load()

    def _row_fields(self) -> list[tuple[str, str]]:
        """(name, spark-type) of the envelope row fields, in source
        column order — from a zero-row schema probe (WHERE 1=0)."""
        probe = self._jdbc_read(f"SELECT * FROM {self.table} WHERE 1=0")
        probe = probe.toDF(*[c.lower() for c in probe.columns])
        drop = {self.cursor_col.lower()}
        if self.op_col:
            drop.add(self.op_col.lower())
        return [
            (f.name, f.dataType.simpleString())
            for f in probe.schema.fields
            if f.name not in drop
        ]

    def _keys_version(self) -> tuple[int, str | None]:
        if not os.path.exists(self._keys_ptr_path):
            return 0, None
        with open(self._keys_ptr_path) as fh:
            ptr = json.load(fh)
        return int(ptr["version"]), os.path.join(self._state_dir, ptr["dir"])

    def poll_deletes(self) -> int:
        """One keys-diff cycle: pull the source's current key set (key
        + ordering columns ONLY cross the wire), anti-join the previous
        snapshot against it, and emit one 'D' envelope batch for the
        vanished keys. Returns the number of delete events appended.

        The 'D' pre-image carries the key fields (nulls elsewhere) —
        exactly what keyed LWW / tombstone reduction needs. Ordering
        stays in SOURCE EVENT TIME: the delete is stamped 1µs after
        the LATER of (a) the key's last-known (ts, seq) in the key
        snapshot and (b) the bridge's emitted high-water mark — the
        max (ts, seq) poll_once has already written to the feed.
        (b) closes the update-then-delete anomaly: a row updated
        AFTER the last key snapshot (update already emitted with a
        later ts) and then deleted would otherwise get a delete
        stamped before the update, and downstream LWW would
        resurrect the row permanently. Stamping past the global
        emitted watermark is safe for other keys — the delete only
        competes in ITS key's LWW group. A later re-insert still
        wins: its source event time postdates everything emitted
        before this diff (the same source-clock monotonicity the
        cursor poll already relies on). Wall clock is never used.
        The snapshot advances via versioned dirs + an atomic pointer
        swap, and the delete commit id embeds the new version, so a
        crash between feed write and pointer swap replays an
        identical batch that downstream commit-dedup drops.
        """
        if not self.key_cols:
            raise ValueError("poll_deletes requires key_cols")
        if self.op_col:
            raise ValueError(
                "outbox mode already carries deletes; keys-diff is for "
                "table mode"
            )
        cursor = self.cursor_col.lower()
        pull_cols = list(self.key_cols) + [cursor]
        if self.ts_col:
            pull_cols.append(self.ts_col.lower())
        qcols = ", ".join(f'"{c}"' for c in dict.fromkeys(pull_cols))
        cur = self._jdbc_read(f"SELECT {qcols} FROM {self.table}")
        cur = cur.toDF(*[c.lower() for c in cur.columns])
        # normalized snapshot: key cols + the key's LWW position
        ts_expr = (
            F.col(self.ts_col.lower()).cast("timestamp")
            if self.ts_col
            else F.timestamp_seconds(F.col(cursor).cast("long"))
        )
        cur = cur.select(
            *self.key_cols,
            ts_expr.alias("_ts"),
            F.col(cursor).cast("long").alias("_seq"),
        )
        version, prev_dir = self._keys_version()
        new_version = version + 1
        new_dir = f"keys_v{new_version}"
        n_deleted = 0
        if prev_dir is not None:
            prev = self.spark.read.parquet(prev_dir)
            deleted = prev.join(
                cur.select(*self.key_cols), self.key_cols, "left_anti"
            )
            fields = self._row_fields()
            image = F.struct(
                *[
                    (
                        F.col(name)
                        if name in self.key_cols
                        else F.lit(None).cast(typ)
                    ).alias(name)
                    for name, typ in fields
                ]
            )
            null_image = F.lit(None).cast(
                "struct<"
                + ",".join(f"{n}:{t}" for n, t in fields)
                + ">"
            )
            wm_ts, wm_seq = self._load_watermark()
            stamp_ts = F.col("_ts")
            stamp_seq = F.col("_seq")
            if wm_ts is not None:
                stamp_ts = F.greatest(
                    stamp_ts, F.lit(wm_ts).cast("timestamp")
                )
            if wm_seq is not None:
                stamp_seq = F.greatest(stamp_seq, F.lit(int(wm_seq)))
            events = deleted.select(
                F.lit("D").alias("op"),
                (stamp_ts + F.expr("INTERVAL 1 MICROSECOND")).alias("ts"),
                stamp_seq.alias("seq"),
                image.alias("before"),
                null_image.alias("after"),
            )
            n_deleted = events.count()
            if n_deleted:
                write_feed_events(
                    self.spark,
                    self.feed_dir,
                    events,
                    commit_id=f"jdbc-del-v{new_version}",
                )
        # advance the snapshot: versioned dir, then atomic pointer swap
        cur.write.mode("overwrite").parquet(
            os.path.join(self._state_dir, new_dir)
        )
        tmp = self._keys_ptr_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"version": new_version, "dir": new_dir}, fh)
        os.replace(tmp, self._keys_ptr_path)
        if prev_dir is not None:
            import shutil

            shutil.rmtree(prev_dir, ignore_errors=True)
        return n_deleted

    def run(
        self,
        poll_interval_secs: float = 5.0,
        max_polls: int | None = None,
        stop_when_idle: bool = False,
        deletes_every: int | None = None,
    ) -> int:
        """Poll loop (≙ the connector's continuous tail). Returns total
        events bridged. ``stop_when_idle`` ends the loop on the first
        empty poll (backfill-to-caught-up runs); otherwise it keeps
        tailing until ``max_polls``. ``deletes_every=N`` interleaves a
        keys-diff delete capture every N polls (requires key_cols)."""
        total, polls = 0, 0
        while max_polls is None or polls < max_polls:
            n = self.poll_once()
            total += n
            polls += 1
            if deletes_every and polls % deletes_every == 0:
                total += self.poll_deletes()
            if n == 0 and stop_when_idle:
                break
            if max_polls is None or polls < max_polls:
                time.sleep(poll_interval_secs if n == 0 else 0.0)
        return total
