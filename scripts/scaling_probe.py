"""Off-testdata scaling probe (VERDICT r7 ask #7): synthesize an
sf1-EQUIVALENT input from sf0.1 (10x the keys/documents, per-key and
per-document work held constant — the axis a real corpus grows on)
and time the CEP suite and the dedup stack at both scales, reporting
the observed scaling exponent log10(t_sf1 / t_sf0.1).

The synthetic tables deliberately avoid changing the WORKLOAD SHAPE:

- events: 10 copies with shifted user_id/event_id — per-user
  timelines identical, so the matcher's per-key cost is constant and
  only the key count grows (what 100 TB of CEP input looks like).
- documents: 10 copies with shifted doc_id and the word order
  ROTATED per copy (rotation step 7*i words) — within-copy near-dup
  structure is preserved (both members of a pair rotate identically),
  while cross-copy shingles diverge so the pair count grows ~10x
  linearly instead of quadratically exploding on artificial
  cross-copy duplicates.

Run: python scripts/scaling_probe.py   (writes one JSON line; paste
the table into SCALING.md). Not part of bench.py — this is a
methodology artifact, re-run when the CEP/dedup cost model changes.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import DEFAULT_CPUS, EngineConfig  # noqa: E402
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES  # noqa: E402

SF01 = "/root/testdata/sf0.1"
COPIES = 10
CEP = ["cep_define_predicate", "cep_quantified_match", "cep_define_agg"]
DEDUP = ["dedup_exact", "minhash_pairs", "simhash_pairs", "paragraph_dedup"]


def build_sfx(spark, out: str) -> None:
    ev = spark.read.parquet(os.path.join(SF01, "events.parquet"))
    u = None
    for i in range(COPIES):
        c = ev.withColumn(
            "user_id", F.col("user_id") + F.lit(i * 1_000_000)
        ).withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000_000)
        )
        u = c if u is None else u.unionByName(c)
    u.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "events.parquet")
    )
    docs = spark.read.parquet(os.path.join(SF01, "documents.parquet"))
    d = None
    for i in range(COPIES):
        # rotation offset 1 + (7*i mod (size-1)) lies in [1, size-1]
        # for size >= 2, so a copy is NEVER byte-identical to the
        # original (7*i mod size could be 0 for short documents,
        # silently creating exact cross-copy duplicates and biasing
        # the very exponent this probe measures); 1-word docs cannot
        # rotate and stay identical — negligible and unavoidable
        p = f"(1 + ({7 * i} % greatest(size(split(text, ' ')) - 1, 1)))"
        rotated = F.expr(
            f"array_join(concat("
            f"slice(split(text, ' '), {p} + 1,"
            f" size(split(text, ' '))),"
            f"slice(split(text, ' '), 1, {p})"
            f"), ' ')"
        )
        c = docs.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 10_000_000)
        ).withColumn("text", rotated if i else F.col("text"))
        d = c if d is None else d.unionByName(c)
    d.repartition(32).write.mode("overwrite").parquet(
        os.path.join(out, "documents.parquet")
    )
    # flagship inputs (r9 streaming/backfill probe): 10x the KEYS with
    # per-key work constant — keys shifted per copy, and customer
    # names suffixed so the view's PRIMARY KEY full_name stays unique
    # per copy (identical names would LWW-collapse the copies and
    # silently hold the materialized key count flat)
    cust = spark.read.parquet(os.path.join(SF01, "customer.parquet"))
    ordr = spark.read.parquet(os.path.join(SF01, "orders.parquet"))
    li = spark.read.parquet(os.path.join(SF01, "lineitem.parquet"))
    uc = uo = ul = None
    for i in range(COPIES):
        cc = cust.withColumn(
            "c_custkey", F.col("c_custkey") + F.lit(i * 10_000_000)
        ).withColumn(
            "c_name",
            F.col("c_name") if i == 0 else F.concat(
                F.col("c_name"), F.lit(f"#{i}")
            ),
        )
        oo = ordr.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * 100_000_000)
        ).withColumn(
            "o_custkey", F.col("o_custkey") + F.lit(i * 10_000_000)
        )
        ll = li.withColumn(
            "l_orderkey", F.col("l_orderkey") + F.lit(i * 100_000_000)
        )
        uc = cc if uc is None else uc.unionByName(cc)
        uo = oo if uo is None else uo.unionByName(oo)
        ul = ll if ul is None else ul.unionByName(ll)
    for name, frame in (("customer", uc), ("orders", uo), ("lineitem", ul)):
        frame.repartition(32).write.mode("overwrite").parquet(
            os.path.join(out, f"{name}.parquet")
        )
    # remaining tables: same content (none of the probed queries read
    # them, but load_table must find the files)
    for t in "region nation supplier part embeddings".split():
        src = os.path.join(SF01, f"{t}.parquet")
        if os.path.exists(src):
            dst = os.path.join(out, f"{t}.parquet")
            (shutil.copytree if os.path.isdir(src) else shutil.copy)(src, dst)


def timed(spark, name: str, sf_dir: str) -> float:
    df = QUERIES[name].fn(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()  # warmup
    best = float("inf")
    for _ in range(3):
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    return round(best, 3)


def _exp(t_small: float, t_big: float) -> float:
    return round(math.log(t_big / t_small) / math.log(COPIES), 2)


def streaming_ingest_probe(spark) -> dict:
    """r9 (VERDICT r8 ask #7): measured scaling point for the CDC
    ingest path — the same workload bench.py times (snapshot + one
    reference-minute of transfers through feed -> stream_upsert ->
    keyed lake table), at 1x and 10x KEYS (persons/tickets/transfers
    all x10, per-event work constant). The capacity claim
    (events/min) gets an observed exponent instead of a single
    point."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
        read_feed_stream,
        write_feed_events,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.workload import (
        TICKET_SCHEMA,
        TicketWorkload,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.pipeline import (
        stream_upsert,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    def run(scale: int) -> tuple[float, int]:
        root = tempfile.mkdtemp(prefix=f"probe_stream_x{scale}_")
        try:
            wl = TicketWorkload(
                spark, n_persons=1000 * scale, n_tickets=5000 * scale
            )
            feed = f"{root}/feed"
            write_feed_events(
                spark, feed, wl.snapshot_tickets(), commit_id="snap"
            )
            t_env, _ = wl.transfer_batch(500 * scale)
            write_feed_events(spark, feed, t_env, commit_id="m1")
            table = UpsertLakeTable(spark, f"{root}/table", key="id")
            t0 = time.perf_counter()
            q = stream_upsert(
                read_feed_stream(
                    spark, feed, TICKET_SCHEMA, max_files_per_trigger=1
                ),
                table,
                f"{root}/ck",
                trigger={"availableNow": True},
            )
            q.awaitTermination(600)
            sec = round(time.perf_counter() - t0, 3)
            return sec, table.snapshot().count()
        finally:
            shutil.rmtree(root, ignore_errors=True)

    t1, n1 = run(1)
    t10, n10 = run(10)
    assert n10 >= 9 * n1  # the key count genuinely grew ~10x
    return {
        "x1_sec": t1,
        "x10_sec": t10,
        "x1_events": 5500,
        "x10_events": 55000,
        "exponent": _exp(t1, t10),
        "x10_events_per_min_capacity": round(55000 / t10 * 60, 0),
    }


def flagship_backfill_probe(spark, sfx_dir: str) -> dict:
    """Flagship ticket_view materialization (3-way join + LWW keyed
    upsert write) at sf0.1 vs the synthesized 10x-keys tables — the
    BASELINE.md '<6 min to first data' bound gets an exponent."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    def run(sf_dir: str) -> float:
        root = tempfile.mkdtemp(prefix="probe_backfill_")
        try:
            view = UpsertLakeTable(
                spark, f"{root}/view", key="full_name"
            )
            t0 = time.perf_counter()
            view.write(
                QUERIES["ticket_view"].fn(spark, sf_dir),
                commit_id="backfill",
            )
            view.snapshot().count()
            return round(time.perf_counter() - t0, 3)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    t1 = run(SF01)
    t10 = run(sfx_dir)
    return {"sf0.1_sec": t1, "sf1_sec": t10, "exponent": _exp(t1, t10)}


def media_decode_probe(spark) -> dict:
    """Multimodal decode + frame sampling at N vs 10N images (new r9):
    the codec stack is mapInPandas map-only, so the exponent should
    sit at ~1.0 — this pins that claim with a measurement the same
    way the CEP/dedup stacks are pinned."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.avi import (
        encode_avi_mjpeg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.jpeg import (
        encode_jpeg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        encode_ppm,
        sample_video_frames,
    )

    def build(n: int):
        rows = []
        for i in range(n):
            c = [(i * 37) % 256, (i * 57) % 256, (i * 77) % 256]
            if i % 3 == 0:
                p = encode_jpeg(16, 16, bytes(c * 256), quality=85)
                kind = "image"
            elif i % 3 == 1:
                p = encode_ppm(16, 16, bytes(c * 256))
                kind = "image"
            else:
                p = encode_avi_mjpeg(16, 8, [bytes(c * 128)] * 3, fps=10)
                kind = "video"
            rows.append(
                (i, kind, bytearray(p),
                 {"mime": "x", "n_bytes": len(p), "width": 16,
                  "height": 16, "duration_ms": None})
            )
        return spark.createDataFrame(rows, MEDIA_SCHEMA).repartition(
            DEFAULT_CPUS
        )

    def run(n: int) -> float:
        df = build(n).cache()
        df.count()
        # warm the Python workers + Arrow path before timing — the
        # first mapInPandas pass pays one-time interpreter startup
        decode_media(df).agg(F.sum("checksum")).collect()
        sample_video_frames(df, num_frames=2).count()
        t0 = time.perf_counter()
        decode_media(df).agg(F.sum("checksum")).collect()
        sample_video_frames(df, num_frames=2).count()
        dt = round(time.perf_counter() - t0, 3)
        df.unpersist()
        return dt

    t1, t10 = run(400), run(4000)
    return {
        "n400_sec": t1,
        "n4000_sec": t10,
        "exponent": _exp(t1, t10),
    }


def delta_maintenance_probe(spark) -> dict:
    """Delta maintenance at N vs 4N commits (new r10): pins the
    O(history)-vs-O(live) claim with a measurement — the un-
    checkpointed mount replays every JSON commit (cost grows with
    history), while checkpoint+cleanup makes the mount O(live files),
    and OPTIMIZE+VACUUM collapse the scan/disk back to O(1)/O(live).
    Commits are single-row appends, so data size is constant and the
    timings isolate the METADATA path."""
    import tempfile as _tf

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        cleanup_log,
        optimize_delta,
        read_delta,
        vacuum_delta,
        write_checkpoint,
    )

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
    )

    def run(n_commits: int) -> dict:
        path = _tf.mkdtemp(prefix="dmaint_") + "/t"
        mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
        export_delta(mk([(0, "v0")]), path)
        for i in range(1, n_commits):
            export_delta(mk([(i, f"v{i}")]), path, mode="append")

        def timed_read(expect_files=None) -> float:
            read_delta(spark, path).count()  # warm scan + JVM
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                d = read_delta(spark, path)
                assert d.count() == n_commits
                best = min(best, time.perf_counter() - t0)
            if expect_files is not None:
                assert len(read_delta(spark, path).inputFiles()) == (
                    expect_files
                )
            return round(best, 3)

        t_replay_full = timed_read(expect_files=None)
        t0 = time.perf_counter()
        write_checkpoint(spark, path)
        cleanup_log(path)
        t_maint_meta = round(time.perf_counter() - t0, 3)
        t_replay_cp = timed_read()
        t0 = time.perf_counter()
        optimize_delta(spark, path)
        vacuum_delta(spark, path)
        t_compact = round(time.perf_counter() - t0, 3)
        t_replay_compacted = timed_read(expect_files=1)
        return {
            "replay_full_sec": t_replay_full,
            "checkpoint_cleanup_sec": t_maint_meta,
            "replay_checkpointed_sec": t_replay_cp,
            "optimize_vacuum_sec": t_compact,
            "replay_compacted_sec": t_replay_compacted,
        }

    a, b = run(50), run(200)
    return {
        "n50": a,
        "n200": b,
        "replay_full_exponent": _exp(
            a["replay_full_sec"], b["replay_full_sec"]
        ),
        "replay_checkpointed_exponent": _exp(
            a["replay_checkpointed_sec"], b["replay_checkpointed_sec"]
        ),
    }


def row_delete_probe(spark) -> dict:
    """Row-level delete scaling (new r11): reads after D accumulated
    delete commits, D=8 vs D=32, on a constant 20k-row / 8-file
    table — isolating the DELETE-ARTIFACT path. The claims under
    measurement: Delta reads stay ~flat in delete-commit count
    (re-deletes MERGE into at most one DV sidecar per data file, so
    the anti-join size is bounded by the file count), Iceberg reads
    grow with it (position-delete files accumulate one per touched
    file PER COMMIT until rewrite), and materialization
    (OPTIMIZE / rewrite_data_files) returns both to the no-delete
    baseline — the reason the maintenance ops exist."""
    import tempfile as _tf

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        delete_delta,
        export_delta,
        optimize_delta,
        read_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        delete_iceberg,
        export_iceberg,
        read_iceberg,
        rewrite_data_files,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        delete_hudi,
        export_hudi_cow,
        read_hudi,
    )

    NROWS = 20000

    def mk_df():
        from pyspark.sql import functions as F

        return (
            spark.range(NROWS)
            .select(
                F.col("id"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            .repartition(8)
        )

    def timed_read(reader, expect_rows: int) -> float:
        reader().count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            assert reader().count() == expect_rows
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def run(fmt: str, n_dels: int) -> dict:
        path = _tf.mkdtemp(prefix=f"rowdel_{fmt}_") + "/t"
        if fmt == "delta":
            export_delta(mk_df(), path)
            reader = lambda: read_delta(spark, path)
            delete = lambda pred: delete_delta(spark, path, pred)
            compact = lambda: optimize_delta(spark, path)
        elif fmt == "hudi":
            # r12: the third format — delete commits append one log
            # block per commit to the touched group's log, so the
            # real-time merge grows with commit count until
            # compact_hudi folds the logs into new base files
            export_hudi_cow(mk_df(), path, record_key="id", num_files=8)
            reader = lambda: read_hudi(spark, path)
            delete = lambda pred: delete_hudi(spark, path, pred)
            compact = lambda: compact_hudi(spark, path)
        else:
            export_iceberg(mk_df(), path, format_version=2)
            reader = lambda: read_iceberg(spark, path)
            delete = lambda pred: delete_iceberg(spark, path, pred)
            compact = lambda: rewrite_data_files(spark, path)
        t0 = time.perf_counter()
        for i in range(n_dels):
            delete(f"id = {i}")
        t_deletes = round(time.perf_counter() - t0, 3)
        t_read = timed_read(reader, NROWS - n_dels)
        compact()
        t_read_compacted = timed_read(reader, NROWS - n_dels)
        return {
            "deletes_total_sec": t_deletes,
            "read_after_deletes_sec": t_read,
            "read_after_materialize_sec": t_read_compacted,
        }

    out = {}
    for fmt in ("delta", "iceberg", "hudi"):
        a, b = run(fmt, 8), run(fmt, 32)
        out[fmt] = {
            "d8": a,
            "d32": b,
            "read_exponent_in_delete_commits": _exp(
                a["read_after_deletes_sec"], b["read_after_deletes_sec"]
            ),
            "per_delete_sec": round(b["deletes_total_sec"] / 32, 3),
        }
    return out


def keyed_upsert_probe(spark) -> dict:
    """Keyed-upsert scaling (new r12, the write-side twin of
    row_delete_probe): reads after U accumulated single-key upsert
    commits, U=8 vs U=32, on a constant 20k-row / 8-file table — the
    claims under measurement: Delta upserts accumulate one DV re-add
    + one small add per commit (reads ~flat: the anti-join stays
    bounded by file count, the extra files are tiny); Iceberg
    equality-delete upserts accumulate one delete file per commit
    whose key set every read must anti-join (reads grow until
    rewrite); Hudi MoR upserts append one data block per commit to
    the touched group's log (reads ~flat at this scale, the merge
    window's file count is bounded by group count); and each
    format's materialization op returns reads to baseline."""
    import tempfile as _tf

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        optimize_delta,
        read_delta,
        upsert_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        export_hudi_cow,
        read_hudi,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
        read_iceberg,
        rewrite_data_files,
        upsert_iceberg,
    )

    NROWS = 20000

    def mk_df():
        from pyspark.sql import functions as F

        return (
            spark.range(NROWS)
            .select(
                F.col("id"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            .repartition(8)
        )

    def one(spark_, i):
        return spark_.createDataFrame([(i, f"u{i}")], "id long, v string")

    def timed_read(reader, expect_rows: int) -> float:
        reader().count()  # warm
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            assert reader().count() == expect_rows
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    def run(fmt: str, n_ups: int) -> dict:
        path = _tf.mkdtemp(prefix=f"rowups_{fmt}_") + "/t"
        if fmt == "delta":
            export_delta(mk_df(), path)
            reader = lambda: read_delta(spark, path)
            ups = lambda i: upsert_delta(spark, path, one(spark, i), ["id"])
            compact = lambda: optimize_delta(spark, path)
        elif fmt == "hudi":
            export_hudi_cow(mk_df(), path, record_key="id", num_files=8)
            reader = lambda: read_hudi(spark, path)
            ups = lambda i: upsert_hudi(spark, path, one(spark, i))
            compact = lambda: compact_hudi(spark, path)
        else:
            export_iceberg(mk_df(), path, format_version=2)
            reader = lambda: read_iceberg(spark, path)
            ups = lambda i: upsert_iceberg(
                spark, path, one(spark, i), ["id"]
            )
            compact = lambda: rewrite_data_files(spark, path)
        t0 = time.perf_counter()
        for i in range(n_ups):
            ups(i)  # every commit UPDATES an existing key: count flat
        t_ups = round(time.perf_counter() - t0, 3)
        t_read = timed_read(reader, NROWS)
        compact()
        t_read_c = timed_read(reader, NROWS)
        return {
            "upserts_total_sec": t_ups,
            "read_after_upserts_sec": t_read,
            "read_after_materialize_sec": t_read_c,
        }

    out = {}
    for fmt in ("delta", "iceberg", "hudi"):
        a, b = run(fmt, 8), run(fmt, 32)
        out[fmt] = {
            "u8": a,
            "u32": b,
            "read_exponent_in_upsert_commits": _exp(
                a["read_after_upserts_sec"], b["read_after_upserts_sec"]
            ),
            "per_upsert_sec": round(b["upserts_total_sec"] / 32, 3),
        }
    return out



def laketail_catchup_probe(spark) -> dict:
    """Lake-to-lake tail catch-up scaling (new r13): ONE
    tail_*_once catch-up into a fresh engine table after C
    accumulated external upsert commits, C=8 vs C=32, per format —
    the restart/downtime cost of a chained pipeline. The claims
    under measurement: the catch-up reads each commit's row-level
    changes (CDF action walk / changelog snapshot chain / log-block
    walk), so its cost grows with the RANGE's change volume, not
    with table size; the LWW reduce collapses everything to one
    downstream MERGE."""
    import tempfile as _tf

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        upsert_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
        upsert_iceberg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.laketail import (
        tail_delta_once,
        tail_hudi_once,
        tail_iceberg_once,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    NROWS = 20000

    def mk_df():
        from pyspark.sql import functions as F

        return (
            spark.range(NROWS)
            .select(
                F.col("id"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            .repartition(8)
        )

    def batch(i):
        # 100 updated keys per external commit
        from pyspark.sql import functions as F

        return spark.range(i * 100, i * 100 + 100).select(
            F.col("id"),
            F.concat(F.lit(f"u{i}-"), F.col("id")).alias("v"),
        )

    def run(fmt: str, n_commits: int) -> dict:
        root = _tf.mkdtemp(prefix=f"tailprobe_{fmt}_")
        src = f"{root}/src"
        if fmt == "delta":
            export_delta(mk_df(), src)
            ups = lambda i: upsert_delta(spark, src, batch(i), ["id"])
            tail = tail_delta_once
        elif fmt == "hudi":
            export_hudi_cow(mk_df(), src, record_key="id", num_files=8)
            ups = lambda i: upsert_hudi(spark, src, batch(i))
            tail = tail_hudi_once
        else:
            export_iceberg(mk_df(), src, format_version=2)
            ups = lambda i: upsert_iceberg(
                spark, src, batch(i), ["id"]
            )
            tail = tail_iceberg_once
        for i in range(n_commits):
            ups(i)
        down = UpsertLakeTable(spark, f"{root}/down", key="id")
        tail(spark, src, down)  # snapshot catch-up (measured apart)
        # ... then the INCREMENTAL catch-up over the range: rebuild a
        # second downstream that already holds the snapshot watermark
        down2 = UpsertLakeTable(spark, f"{root}/down2", key="id")
        t0 = time.perf_counter()
        tail(spark, src, down2)  # full catch-up incl. snapshot
        t_full = round(time.perf_counter() - t0, 3)
        # steady state: one more external commit, one more tail
        ups(n_commits)
        t0 = time.perf_counter()
        tail(spark, src, down2)
        t_one = round(time.perf_counter() - t0, 3)
        assert down2.snapshot().count() == NROWS
        return {
            "catchup_full_sec": t_full,
            "tail_one_commit_sec": t_one,
        }

    out = {}
    for fmt in ("delta", "iceberg", "hudi"):
        a, b = run(fmt, 8), run(fmt, 32)
        out[fmt] = {
            "catchup_8_sec": a["catchup_full_sec"],
            "catchup_32_sec": b["catchup_full_sec"],
            # base log(32/8): exponent IN THE COMMIT COUNT (1.0 =
            # linear in the range's change volume, the expected
            # shape for a row-level change walk; _exp's base-10 is
            # for the 10x-COPIES probes, not this one)
            "catchup_exponent_in_commits": round(
                math.log(
                    b["catchup_full_sec"] / a["catchup_full_sec"]
                )
                / math.log(4),
                2,
            ),
            "tail_one_commit_sec": b["tail_one_commit_sec"],
        }
    return out


def stats_prune_probe(spark) -> dict:
    """File-skipping scaling (new r13): a POINT LOOKUP on a Delta /
    Iceberg table at 16 vs 64 range-partitioned files, pruned
    (add.stats / manifest bounds) vs full-scan+filter. The claim
    under measurement: the pruned read's cost is ~flat in file count
    (1 footer opened either way — exponent ≈ 0) while the full scan
    grows with it; the gap IS the data-skipping win, and at 30,000
    files it decides whether a point query is interactive."""
    import tempfile as _tf

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        read_delta,
        read_delta_pruned,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
        read_iceberg,
        read_iceberg_pruned,
    )

    NROWS = 400_000

    def mk(nfiles):
        return (
            spark.range(NROWS)
            .select(
                F.col("id"),
                F.concat(F.lit("v"), F.col("id")).alias("v"),
            )
            .repartitionByRange(nfiles, "id")
        )

    def t_point(read_fn):
        t0 = time.perf_counter()
        assert read_fn().count() == 1
        return round(time.perf_counter() - t0, 3)

    out = {}
    for fmt, exp_fn, full_fn, pruned_fn in (
        (
            "delta",
            lambda df, p: export_delta(df, p, stats=True),
            read_delta,
            read_delta_pruned,
        ),
        (
            "iceberg",
            lambda df, p: export_iceberg(
                df, p, format_version=2, stats=True
            ),
            read_iceberg,
            read_iceberg_pruned,
        ),
    ):
        res = {}
        for nf in (16, 64):
            p = _tf.mkdtemp(prefix=f"prune_{fmt}_{nf}_") + "/t"
            exp_fn(mk(nf), p)
            key = NROWS // 2
            # warm the metadata caches out of the timing
            pruned_fn(spark, p, [("id", "==", key)]).count()
            res[nf] = {
                "full_sec": t_point(
                    lambda: full_fn(spark, p).filter(F.col("id") == key)
                ),
                "pruned_sec": t_point(
                    lambda: pruned_fn(spark, p, [("id", "==", key)])
                ),
            }
        out[fmt] = {
            "full_16_sec": res[16]["full_sec"],
            "full_64_sec": res[64]["full_sec"],
            "pruned_16_sec": res[16]["pruned_sec"],
            "pruned_64_sec": res[64]["pruned_sec"],
            "pruned_exponent_in_files": round(
                math.log(
                    max(res[64]["pruned_sec"], 1e-3)
                    / max(res[16]["pruned_sec"], 1e-3)
                )
                / math.log(4),
                2,
            ),
        }
    return out


def main() -> None:
    import sys as _sys

    only = set(_sys.argv[1:])
    spark = EngineConfig(
        app_name="scaling_probe",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    if only:
        # run only the named probes (e.g. `laketail_catchup`)
        fns = {
            "streaming_ingest": streaming_ingest_probe,
            "media_decode": media_decode_probe,
            "delta_maintenance": delta_maintenance_probe,
            "row_deletes": row_delete_probe,
            "keyed_upserts": keyed_upsert_probe,
            "laketail_catchup": laketail_catchup_probe,
            "stats_prune": stats_prune_probe,
        }
        print(json.dumps({n: fns[n](spark) for n in only}))
        spark.stop()
        return
    out = tempfile.mkdtemp(prefix="sfx1_")
    try:
        build_sfx(spark, out)
        res = {}
        for name in CEP + DEDUP:
            t_small = timed(spark, name, SF01)
            t_big = timed(spark, name, out)
            res[name] = {
                "sf0.1_sec": t_small,
                "sf1_sec": t_big,
                "exponent": _exp(t_small, t_big),
            }
        res["streaming_ingest"] = streaming_ingest_probe(spark)
        res["flagship_backfill"] = flagship_backfill_probe(spark, out)
        res["media_decode"] = media_decode_probe(spark)
        res["delta_maintenance"] = delta_maintenance_probe(spark)
        res["row_deletes"] = row_delete_probe(spark)
        res["keyed_upserts"] = keyed_upsert_probe(spark)
        res["laketail_catchup"] = laketail_catchup_probe(spark)
        res["stats_prune"] = stats_prune_probe(spark)
        print(json.dumps(res))
    finally:
        shutil.rmtree(out, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
