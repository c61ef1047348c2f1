"""Put-if-absent concurrency on the interop commit paths (r13 —
VERDICT r12 ask #6): of two writers that both derived state from the
same table version, exactly one lands its commit file (Delta N.json /
Iceberg metadata version / Hudi instant); the loser raises
``ConcurrentWriterError`` — the engine lake's own lease error — and
the table stays spec-valid. Non-conflicting Delta appends retry once
instead of failing.
"""

from __future__ import annotations

import json
import os

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.errors import (
    ConcurrentWriterError,
)


def _mk(spark, rows, sch="id long, v string"):
    return spark.createDataFrame(rows, sch)


def test_delta_commit_put_if_absent(spark, tmp_path):
    """Interleaved two-writer race: the second DML commit targeting
    the version the first just took raises; the table serves the
    winner's state."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        _log_path,
        delete_delta,
        export_delta,
        read_delta,
        upsert_delta,
    )

    import streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop as D

    src = str(tmp_path / "t")
    export_delta(_mk(spark, [(1, "a"), (2, "b"), (3, "c")]), src)
    upsert_delta(spark, src, _mk(spark, [(4, "d")]), ["id"])
    # interleaving winner lands version 2 while writer B's delete is
    # mid-flight: B's READ happened before the winner's commit, so its
    # pinned commit slot collides (simulated by a stale _next_version)
    open(_log_path(src, 2), "w").write(
        json.dumps({"commitInfo": {"winner": "A"}}) + "\n"
    )
    real_next = D._next_version
    D._next_version = lambda p: real_next(p) - 1  # pre-winner read
    try:
        with pytest.raises(ConcurrentWriterError, match="put-if-absent"):
            delete_delta(spark, src, "id = 1")
    finally:
        D._next_version = real_next
    # table stayed spec-valid and serves the winner's state
    got = {(r.id, r.v) for r in read_delta(spark, src).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c"), (4, "d")}
    # and the retried delete (fresh read) now lands
    delete_delta(spark, src, "id = 1")
    got = {(r.id, r.v) for r in read_delta(spark, src).collect()}
    assert got == {(2, "b"), (3, "c"), (4, "d")}


def test_delta_append_retries_once(spark, tmp_path):
    """A non-conflicting add-only append that loses the race lands at
    the NEW head instead of raising; a lost race across a metaData
    change refuses."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        _log_path,
        _replay_log,
        export_delta,
        read_delta,
    )

    import streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop as D

    src = str(tmp_path / "t")
    export_delta(_mk(spark, [(1, "a")]), src)

    def _racy_put(winner_actions):
        """First put loses to an interleaving winner that lands the
        same slot an instant earlier; subsequent puts run clean."""
        real_put = D._put_if_absent_commit
        state = {"raced": False}

        def put(path, version, actions):
            if not state["raced"]:
                state["raced"] = True
                open(_log_path(path, version), "w").write(
                    "\n".join(json.dumps(a) for a in winner_actions)
                    + "\n"
                )
            return real_put(path, version, actions)

        return real_put, put

    # non-conflicting winner (add-only commitInfo): the append retries
    # once and lands at the NEW head
    real_put, racy = _racy_put([{"commitInfo": {"winner": "other"}}])
    D._put_if_absent_commit = racy
    try:
        export_delta(_mk(spark, [(2, "b")]), src, mode="append")
    finally:
        D._put_if_absent_commit = real_put
    assert os.path.exists(_log_path(src, 2))
    got = {(r.id, r.v) for r in read_delta(spark, src).collect()}
    assert got == {(1, "a"), (2, "b")}
    # a lost race across a SCHEMA change refuses outright
    _, meta, _ = _replay_log(spark, src)
    real_put, racy = _racy_put([{"metaData": meta}])
    D._put_if_absent_commit = racy
    try:
        with pytest.raises(ConcurrentWriterError, match="metadata"):
            export_delta(_mk(spark, [(3, "c")]), src, mode="append")
    finally:
        D._put_if_absent_commit = real_put


def test_iceberg_metadata_put_if_absent(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        delete_iceberg,
        export_iceberg,
        read_iceberg,
        upsert_iceberg,
    )

    src = str(tmp_path / "t")
    export_iceberg(_mk(spark, [(1, "a"), (2, "b")]), src,
                   format_version=2)
    md = os.path.join(src, "metadata")
    next_v = 1 + max(
        int(f[1:].split(".")[0])
        for f in os.listdir(md)
        if f.startswith("v") and f.endswith(".metadata.json")
    )
    # an interleaving writer lands the next metadata version first
    open(os.path.join(md, f"v{next_v}.metadata.json"), "w").write("{}")
    with pytest.raises(ConcurrentWriterError, match="put-if-absent"):
        upsert_iceberg(spark, src, _mk(spark, [(2, "B2")]), ["id"])
    os.remove(os.path.join(md, f"v{next_v}.metadata.json"))
    # fresh attempt lands; table spec-valid throughout
    upsert_iceberg(spark, src, _mk(spark, [(2, "B2")]), ["id"])
    delete_iceberg(spark, src, "id = 1")
    got = {(r.id, r.v) for r in read_iceberg(spark, src).collect()}
    assert got == {(2, "B2")}


def test_hudi_instant_put_if_absent(spark, tmp_path):
    """The instant is claimed O_EXCL BEFORE any log block moves, so
    the loser leaves no partial append; an empty batch releases its
    claim."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_mor,
        read_hudi,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    import streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop as H

    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key="id")
    t.write(_mk(spark, [(i, f"v{i}") for i in range(4)]),
            commit_id="c1")
    mor = str(tmp_path / "mor")
    export_hudi_mor(t, mor, num_files=2)
    # an interleaving writer claims the next instant an instant after
    # writer B computed it (simulated by a stale _next_instant)
    nxt = H._next_instant(mor)
    open(os.path.join(mor, ".hoodie", f"{nxt}.inflight"), "w").close()
    open(os.path.join(mor, ".hoodie",
                      f"{nxt}.deltacommit.requested"), "w").close()
    before_logs = {
        f for f in os.listdir(mor) if ".log." in f
    }
    real_next = H._next_instant
    H._next_instant = lambda p: nxt  # B's pre-winner computation
    try:
        with pytest.raises(ConcurrentWriterError, match="claimed"):
            upsert_hudi(spark, mor, _mk(spark, [(1, "V1")]))
    finally:
        H._next_instant = real_next
    # the loser wrote NO log bytes
    assert {f for f in os.listdir(mor) if ".log." in f} == before_logs
    # the winner's claim (never completed) does not block a fresh
    # writer: the next instant computation lands PAST it
    os.remove(os.path.join(mor, ".hoodie", f"{nxt}.inflight"))
    os.remove(os.path.join(mor, ".hoodie",
                           f"{nxt}.deltacommit.requested"))
    upsert_hudi(spark, mor, _mk(spark, [(1, "V1")]))
    assert {r.v for r in read_hudi(spark, mor)
            .filter("id = 1").collect()} == {"V1"}
    # an empty delete batch releases its claim: the next real write
    # reuses the slot without a false conflict
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        delete_hudi,
    )

    r = delete_hudi(spark, mor, "id = 99999")
    assert r["instant"] is None
    upsert_hudi(spark, mor, _mk(spark, [(2, "V2")]))
    assert {r.v for r in read_hudi(spark, mor)
            .filter("id = 2").collect()} == {"V2"}


def test_uniform_two_writer_race_no_divergence(spark, tmp_path):
    """UniForm dual-commit under a race: both legs commit DELTA FIRST,
    so two concurrent upsert_uniform calls collide on the Delta
    N.json put-if-absent — the loser raises BEFORE touching the
    Iceberg leg and the two format views never diverge."""
    import streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop as D
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        read_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        export_uniform,
        upsert_uniform,
    )

    path = str(tmp_path / "u")
    export_uniform(
        _mk(spark, [(1, "a"), (2, "b")]), path, format_version=2
    )
    upsert_uniform(spark, path, _mk(spark, [(3, "c")]), ["id"])

    # writer B read before winner A landed: stale delta commit slot
    real_next = D._next_version
    D._next_version = lambda p: real_next(p) - 1
    try:
        with pytest.raises(ConcurrentWriterError, match="put-if-absent"):
            upsert_uniform(spark, path, _mk(spark, [(2, "B2")]), ["id"])
    finally:
        D._next_version = real_next
    # both views agree (the loser committed NEITHER leg)
    d = {(r.id, r.v) for r in read_delta(spark, path).collect()}
    i = {(r.id, r.v) for r in read_iceberg(spark, path).collect()}
    assert d == i == {(1, "a"), (2, "b"), (3, "c")}
    # a fresh attempt lands on both
    upsert_uniform(spark, path, _mk(spark, [(2, "B2")]), ["id"])
    d = {(r.id, r.v) for r in read_delta(spark, path).collect()}
    i = {(r.id, r.v) for r in read_iceberg(spark, path).collect()}
    assert d == i == {(1, "a"), (2, "B2"), (3, "c")}
