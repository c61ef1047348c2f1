"""Streaming tail over externally-written lake tables (r13 — VERDICT
r12 ask #4): 3+ external Delta/Iceberg commits appear incrementally
in a downstream engine table with LWW semantics, exactly-once by
(version range, commit id) — the lake-to-lake chained pipeline the
reference's Flink streaming-read table mode provides and its batch
Athena query-back cannot (SURVEY.md §2.1 S4's streaming twin).
"""

from __future__ import annotations

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.laketail import (
    stream_tail_delta,
    tail_delta_once,
    tail_iceberg_once,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
    UpsertLakeTable,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, "id long, v string")


def _state(table):
    try:
        return {
            (r.id, r.v)
            for r in table.snapshot().select("id", "v").collect()
        }
    except FileNotFoundError:  # no commit landed yet
        return set()


def test_tail_delta_incremental_lww(spark, tmp_path):
    """Three external Delta commits (snapshot, upsert, DV delete)
    land incrementally; a quiet poll is a no-op; a replayed range is
    dropped by the sink's commit-id check."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        delete_delta,
        export_delta,
        upsert_delta,
    )

    src = str(tmp_path / "src")
    export_delta(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]), src)

    t = UpsertLakeTable(spark, str(tmp_path / "down"), key="id")
    r0 = tail_delta_once(spark, src, t)
    assert r0["applied"] and r0["from"] == 0
    assert _state(t) == {(1, "a"), (2, "b"), (3, "c")}

    # quiet source → no-op, no new downstream commit
    n_commits = len(t.commits())
    r1 = tail_delta_once(spark, src, t)
    assert not r1["applied"] and len(t.commits()) == n_commits

    # external commit 2: keyed upsert (update id=2, insert id=4)
    upsert_delta(spark, src, _mk(spark, [(2, "B2"), (4, "d")]), ["id"])
    r2 = tail_delta_once(spark, src, t)
    assert r2["applied"] and r2["from"] == 1
    assert _state(t) == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}

    # external commit 3: row-level delete (deletion vector)
    delete_delta(spark, src, "id = 1")
    # external commit 4 in the same catch-up window: another upsert —
    # one tail batch spans BOTH versions and must LWW across them
    upsert_delta(spark, src, _mk(spark, [(3, "C3")]), ["id"])
    r3 = tail_delta_once(spark, src, t)
    assert r3["applied"] and r3["from"] == 2
    assert _state(t) == {(2, "B2"), (3, "C3"), (4, "d")}

    # exactly-once: the applied ranges are recorded as commit ids and
    # a poll with no new versions never re-applies
    ids = [c.get("commit_id") for c in t.commits()]
    assert ids.count("laketail:delta:0:0") == 1
    assert not tail_delta_once(spark, src, t)["applied"]


def test_tail_delta_update_shape_remove_add(spark, tmp_path):
    """A remove+add-shaped update (no explicit cdc actions) surfaces
    in CDF as delete+insert at ONE version — the insert must win the
    within-version reduce (it IS the post-state)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        update_delta,
    )

    src = str(tmp_path / "src")
    export_delta(_mk(spark, [(1, "a"), (2, "b")]), src)
    t = UpsertLakeTable(spark, str(tmp_path / "down"), key="id")
    tail_delta_once(spark, src, t)
    update_delta(spark, src, "id = 1", {"v": "'A1'"})
    tail_delta_once(spark, src, t)
    assert _state(t) == {(1, "A1"), (2, "b")}


def test_tail_iceberg_incremental_lww(spark, tmp_path):
    """Iceberg: initial snapshot, then 3 external commits (append,
    equality-delete upsert, delete) applied via the changelog scan."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        delete_iceberg,
        export_iceberg,
        upsert_iceberg,
    )

    src = str(tmp_path / "src")
    export_iceberg(
        _mk(spark, [(1, "a"), (2, "b")]), src, format_version=2
    )
    t = UpsertLakeTable(spark, str(tmp_path / "down"), key="id")
    r0 = tail_iceberg_once(spark, src, t)
    assert r0["applied"]
    assert _state(t) == {(1, "a"), (2, "b")}

    export_iceberg(_mk(spark, [(3, "c")]), src, mode="append")
    r1 = tail_iceberg_once(spark, src, t)
    assert r1["applied"]
    assert _state(t) == {(1, "a"), (2, "b"), (3, "c")}

    upsert_iceberg(spark, src, _mk(spark, [(2, "B2"), (4, "d")]), ["id"])
    delete_iceberg(spark, src, "id = 1")
    r2 = tail_iceberg_once(spark, src, t)
    assert r2["applied"]
    assert _state(t) == {(2, "B2"), (3, "c"), (4, "d")}

    # quiet source → no-op
    assert not tail_iceberg_once(spark, src, t)["applied"]


def test_stream_tail_delta_query(spark, tmp_path):
    """The readStream-driven wrapper: a rate tick drives the tail as
    a real StreamingQuery; commits written while the query runs
    appear downstream without restarts."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        upsert_delta,
    )

    src = str(tmp_path / "src")
    export_delta(_mk(spark, [(1, "a")]), src)
    t = UpsertLakeTable(spark, str(tmp_path / "down"), key="id")
    q = stream_tail_delta(
        spark,
        src,
        t,
        str(tmp_path / "ckpt"),
        trigger={"processingTime": "0 seconds"},
    )
    try:
        import time

        deadline = time.time() + 60
        while time.time() < deadline and _state(t) != {(1, "a")}:
            time.sleep(0.5)
        assert _state(t) == {(1, "a")}
        upsert_delta(spark, src, _mk(spark, [(2, "b")]), ["id"])
        while time.time() < deadline and _state(t) != {
            (1, "a"), (2, "b"),
        }:
            time.sleep(0.5)
        assert _state(t) == {(1, "a"), (2, "b")}
    finally:
        q.stop()


def test_tail_hudi_incremental_lww(spark, tmp_path):
    """Hudi (r13 — the tail TRIPLE): initial real-time snapshot, then
    3 external instants (upsert, delete, another upsert) applied via
    read_hudi_changes; one catch-up spans multiple instants and LWW
    orders across them; compaction inside a range contributes no
    rows."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        delete_hudi,
        export_hudi_mor,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.laketail import (
        tail_hudi_once,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    eng = UpsertLakeTable(spark, str(tmp_path / "src_eng"), key="id")
    eng.write(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]),
              commit_id="c1")
    src = str(tmp_path / "src")
    export_hudi_mor(eng, src, num_files=2)

    t = UpsertLakeTable(spark, str(tmp_path / "down"), key="id")
    r0 = tail_hudi_once(spark, src, t)
    assert r0["applied"]
    assert _state(t) == {(1, "a"), (2, "b"), (3, "c")}
    # quiet source → no-op
    assert not tail_hudi_once(spark, src, t)["applied"]

    # three external instants in ONE catch-up window: upsert, delete,
    # upsert again on the deleted key (LWW must net to the re-insert)
    upsert_hudi(spark, src, _mk(spark, [(2, "B2"), (4, "d")]))
    delete_hudi(spark, src, "id = 1 OR id = 4")
    upsert_hudi(spark, src, _mk(spark, [(4, "D2")]))
    r1 = tail_hudi_once(spark, src, t)
    assert r1["applied"]
    assert _state(t) == {(2, "B2"), (3, "c"), (4, "D2")}

    # compaction moves no rows: a range holding only a compaction
    # commit applies nothing new
    compact_hudi(spark, src)
    r2 = tail_hudi_once(spark, src, t)
    assert _state(t) == {(2, "B2"), (3, "c"), (4, "D2")}
    # post-compaction DML still tails (old logs detached from the
    # live slice, blocks found by the full walk)
    upsert_hudi(spark, src, _mk(spark, [(5, "e")]))
    tail_hudi_once(spark, src, t)
    assert _state(t) == {(2, "B2"), (3, "c"), (4, "D2"), (5, "e")}
