"""UpsertLakeTable — the engine's keyed transactional lake table
(≙ the reference's Hudi MERGE_ON_READ tables, SURVEY.md §1.1/§2.1 S3).

Reference semantics reproduced here:
- PRIMARY KEY upsert: a write with an existing key replaces the row
  (CDC-Hudi-Notebook.zpln:292 ¶7 `PRIMARY KEY NOT ENFORCED`; upsert
  demo ¶13→¶15; no-duplicates invariant ¶61).
- Merge-on-read layout: columnar base files plus a row-delta log;
  snapshot reads merge both ("Snapshot query" ¶10 zpln:421).
- Commit-per-checkpoint: each micro-batch write = one numbered delta
  commit (¶2-3 zpln:89,131 couple Hudi commits to Flink checkpoints).
- Async compaction every N delta commits
  (`compaction.delta_commits`=2/5, zpln:292 ¶7, :2234 ¶51).
- Hudi-style metadata columns (`_hoodie_*`, Glue DDL
  lib/rds-cdc-flink-hudi-stack.ts:470-489) → `_commit_seq`,
  `_commit_time`, `_record_key`, `_op`.

Spark-first design, sized for 100 TB:
- The table is hash-bucketed on the key into `num_buckets` partition
  dirs (`bucket=<i>`). Every read/merge is partition-parallel and a
  delta commit only ever touches the buckets its keys hash to, so
  compaction rewrites a bounded slice of the table, never the whole
  thing (≙ Hudi file groups).
- Snapshot = base ∪ log → latest `_commit_seq` per key wins →
  drop deletes. One hash shuffle, the minimum for keyed dedup; with
  base and log both bucketed by the same function, a cluster deploy
  can replace this with a bucket-local merge (no shuffle).
- Exactly-once: commits are numbered and recorded with their caller
  commit-id (foreachBatch epoch); a replayed epoch is skipped, and
  LWW makes replays idempotent anyway (SURVEY.md §7 hard-part #2).

Local-FS caveat: marker-file commits are atomic enough for a single
writer (the reference also has exactly one writer per table —
`write.tasks` fan-out happens inside one job).
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.upsert import latest_by_key

META_COLS = ("_record_key", "_commit_seq", "_commit_time", "_op")


class UpsertLakeTable:
    """A keyed upsert table on a directory (parquet base + delta log)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key: str | Sequence[str],
        num_buckets: int = 16,
        compact_every: int = 5,  # ≙ compaction.delta_commits (zpln:2234 ¶51)
        schema=None,  # row StructType; lets an empty table snapshot as typed-empty
    ):
        self.spark = spark
        self.path = path
        self.key = [key] if isinstance(key, str) else list(key)
        self.num_buckets = num_buckets
        self.compact_every = compact_every
        self.schema = schema
        self._base = os.path.join(path, "base")
        self._log = os.path.join(path, "log")
        self._commits = os.path.join(path, "_commits")
        os.makedirs(self._commits, exist_ok=True)

    # -- commit bookkeeping -------------------------------------------------

    def _commit_files(self) -> list[str]:
        return sorted(
            f for f in os.listdir(self._commits) if f.endswith(".json")
        )

    def commits(self) -> list[dict]:
        out = []
        for f in self._commit_files():
            with open(os.path.join(self._commits, f)) as fh:
                out.append(json.load(fh))
        return out

    def last_commit_seq(self) -> int:
        cs = self._commit_files()
        return int(cs[-1].split("-")[1].split(".")[0]) if cs else 0

    def _seen_commit_ids(self) -> set[str]:
        return {c.get("commit_id") for c in self.commits()}

    def _record_commit(self, seq: int, commit_id: str, kind: str, n_rows: int):
        marker = os.path.join(self._commits, f"commit-{seq:012d}.json")
        tmp = marker + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(
                {
                    "seq": seq,
                    "commit_id": commit_id,
                    "kind": kind,
                    "n_rows": n_rows,
                    "wall_time": time.time(),
                },
                fh,
            )
        os.replace(tmp, marker)

    # -- helpers ------------------------------------------------------------

    def _with_bucket(self, df: DataFrame) -> DataFrame:
        key_concat = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in self.key])
        return df.withColumn(
            "bucket", F.pmod(F.xxhash64(key_concat), F.lit(self.num_buckets))
        )

    def _record_key_col(self):
        return F.concat_ws(
            "\x1f", *[F.col(k).cast("string") for k in self.key]
        )

    def _read_dir(self, d: str) -> DataFrame | None:
        if not os.path.isdir(d) or not any(
            not e.startswith("_") for e in os.listdir(d)
        ):
            return None
        return self.spark.read.option("basePath", d).parquet(d)

    # -- write path (≙ Hudi sink S3) ---------------------------------------

    def write(
        self,
        delta: DataFrame,
        commit_id: str | None = None,
        precombine: str | Sequence[str] | None = None,
        delete_col: str | None = None,
    ) -> int:
        """Apply one delta commit (upserts and, optionally, deletes).

        ``delta`` holds the post-image rows in table schema. With
        ``precombine`` set, multiple rows per key inside the delta are
        reduced to the latest first (≙ Hudi precombine field).
        ``delete_col`` names a boolean column marking delete events.
        Returns the commit seq (0 if skipped as a duplicate).
        """
        commit_id = commit_id or f"c{int(time.time() * 1e6)}"
        if commit_id in self._seen_commit_ids():
            return 0  # replayed epoch → no-op (exactly-once)
        self._validate_schema(delta, delete_col)
        if precombine:
            delta = latest_by_key(delta, self.key, precombine)
        seq = self.last_commit_seq() + 1
        op = (
            F.when(F.col(delete_col), F.lit("D")).otherwise(F.lit("U"))
            if delete_col
            else F.lit("U")
        )
        enriched = (
            delta.withColumn("_op", op)
            .withColumn("_record_key", self._record_key_col())
            .withColumn("_commit_seq", F.lit(seq).cast("long"))
            .withColumn("_commit_time", F.current_timestamp().cast("string"))
        )
        if delete_col:
            enriched = enriched.drop(delete_col)
        enriched = self._with_bucket(enriched)
        self._save_schema(enriched)
        # no pre-count: counting would execute the (possibly expensive)
        # delta plan twice; the commit records row count -1 (unknown)
        (
            enriched.write.mode("append")
            .partitionBy("bucket")
            .parquet(self._log)
        )
        self._record_commit(seq, commit_id, "delta", -1)
        if self._delta_commits_since_compaction() >= self.compact_every:
            self.compact()
        return seq

    def _delta_commits_since_compaction(self) -> int:
        n = 0
        for c in reversed(self.commits()):
            if c["kind"] == "compaction":
                break
            n += 1
        return n

    # -- read path (≙ snapshot query S4) ------------------------------------

    def _merged(self) -> DataFrame | None:
        base, log = self._read_dir(self._base), self._read_dir(self._log)
        if base is None and log is None:
            return None
        both = base.unionByName(log) if base is not None and log is not None else (
            base if base is not None else log
        )
        return latest_by_key(both, self.key, "_commit_seq")

    def _validate_schema(self, delta: DataFrame, delete_col: str | None) -> None:
        """Declared-schema write validation (≙ the reference's "the
        schema of the query has to match the Hudi Table Definition",
        CDC-Hudi-Notebook.zpln:2275 ¶52). Compares the delta's data
        columns (names + types, order-insensitive) against the
        table's recorded schema."""
        import json as _json

        p = os.path.join(self.path, "_schema.json")
        if not os.path.exists(p):
            return
        from pyspark.sql import types as T

        stored = T.StructType.fromJson(_json.loads(open(p).read()))
        expect = {
            f.name: f.dataType.simpleString()
            for f in stored.fields
            if f.name not in META_COLS and f.name != "bucket"
        }
        skip = set(META_COLS) | {"bucket", delete_col or ""}
        got = {
            f.name: f.dataType.simpleString()
            for f in delta.schema.fields
            if f.name not in skip
        }
        if got != expect:
            raise ValueError(
                f"schema mismatch for upsert table {self.path}: "
                f"table={expect} delta={got}"
            )

    def _save_schema(self, df: DataFrame) -> None:
        p = os.path.join(self.path, "_schema.json")
        if not os.path.exists(p):
            with open(p, "w") as fh:
                fh.write(df.schema.json())

    def _empty(self) -> DataFrame | None:
        p = os.path.join(self.path, "_schema.json")
        if not os.path.exists(p):
            return None
        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(open(p).read()))
        return self.spark.createDataFrame([], schema)

    def snapshot(self, with_meta: bool = False) -> DataFrame:
        """Current table state: base ∪ log, latest commit per key wins,
        deletes dropped (merge-on-read snapshot, ¶10). An empty table
        that has seen a schema returns a typed empty DataFrame."""
        merged = self._merged()
        if merged is None:
            merged = self._empty()
        if merged is None:
            if self.schema is not None and not with_meta:
                return self.spark.createDataFrame([], self.schema)
            raise FileNotFoundError(f"empty table at {self.path}")
        live = merged.filter(F.col("_op") != "D").drop("bucket")
        return live if with_meta else live.drop(*META_COLS)

    # -- compaction (≙ Hudi MoR compaction) ---------------------------------

    def _log_buckets(self) -> list[int]:
        if not os.path.isdir(self._log):
            return []
        return sorted(
            int(e.split("=", 1)[1])
            for e in os.listdir(self._log)
            if e.startswith("bucket=")
        )

    def compact(self) -> int:
        """Fold the delta log into the bucketed base and truncate the log.

        Only the buckets the log actually touches are re-merged and
        swapped (FS partition listing tells us which — no data scan);
        untouched buckets are left as-is. This bounds compaction cost
        by delta size x bucket fan-in, not table size — the property
        that keeps merge-on-read viable at 100 TB.
        """
        affected = self._log_buckets()
        if not affected:
            return 0
        merged = self._merged().filter(F.col("bucket").isin(affected))
        # deletes are physically dropped at compaction time (like
        # Hudi's compactor); tombstones only need to outlive the log
        compacted = merged.filter(F.col("_op") != "D")
        tmp = os.path.join(self.path, "_compact_tmp")
        shutil.rmtree(tmp, ignore_errors=True)
        compacted.write.mode("overwrite").partitionBy("bucket").parquet(tmp)
        for b in affected:
            src = os.path.join(tmp, f"bucket={b}")
            dst = os.path.join(self._base, f"bucket={b}")
            shutil.rmtree(dst, ignore_errors=True)
            if os.path.isdir(src):  # bucket may compact to empty (all deletes)
                os.makedirs(self._base, exist_ok=True)
                shutil.move(src, dst)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(self._log, ignore_errors=True)
        seq = self.last_commit_seq() + 1
        self._record_commit(seq, f"compaction-{seq}", "compaction", -1)
        return seq
