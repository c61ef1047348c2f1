"""Hudi copy-on-write layout reader: file-slice selection against a
hand-built table conforming to the public Hudi storage spec —
standing in for a table written by Flink's Hudi sink (the reference's
actual lake format, lib/rds-cdc-flink-hudi-stack.ts:470-519).
"""

from __future__ import annotations

import os

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
    UnsupportedHudiFeature,
    live_file_slices,
    read_hudi,
)

FG1 = "0d5c3d1a-1111-2222-3333-444455556666-0"
FG2 = "0d5c3d1a-aaaa-bbbb-cccc-ddddeeeeffff-0"


def _write_one(spark, rows, schema, dest):
    stage = dest + ".stage"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, part), dest)


def _mk_table(spark, root):
    """Two commits + one inflight:

    - instant 001: file group 1 v1 (keys 1,2) and file group 2 (key 3)
    - instant 002: REWRITES file group 1 (upsert: key 2 updated) —
      same fileId, newer instant
    - instant 003: inflight only — its file must be invisible
    """
    os.makedirs(os.path.join(root, ".hoodie"))
    sch = "key LONG, val STRING"
    t1, t2, t3 = "20240101000000001", "20240101000000002", "20240101000000003"
    _write_one(
        spark,
        [(1, "a"), (2, "b")],
        sch,
        os.path.join(root, f"{FG1}_0-1-0_{t1}.parquet"),
    )
    _write_one(
        spark,
        [(3, "c")],
        sch,
        os.path.join(root, f"{FG2}_0-1-0_{t1}.parquet"),
    )
    _write_one(
        spark,
        [(1, "a"), (2, "B2")],
        sch,
        os.path.join(root, f"{FG1}_0-2-0_{t2}.parquet"),
    )
    _write_one(
        spark,
        [(9, "ghost")],
        sch,
        os.path.join(root, f"{FG2}_0-3-0_{t3}.parquet"),
    )
    for inst, state in [(t1, "commit"), (t2, "commit")]:
        open(os.path.join(root, ".hoodie", f"{inst}.{state}"), "w").close()
    # instant 3 never completed: only inflight/requested markers
    open(
        os.path.join(root, ".hoodie", f"{t3}.commit.inflight"), "w"
    ).close()
    open(
        os.path.join(root, ".hoodie", f"{t3}.commit.requested"), "w"
    ).close()
    return t1, t2, t3


def test_latest_committed_slice_per_file_group(spark, tmp_path):
    root = str(tmp_path / "hudi_cow")
    _mk_table(spark, root)
    got = sorted(map(tuple, read_hudi(spark, root).collect()))
    # group 1 serves the t2 rewrite, group 2 its t1 file; the t3
    # inflight file is invisible
    assert got == [(1, "a"), (2, "B2"), (3, "c")]


def test_time_travel_to_first_instant(spark, tmp_path):
    root = str(tmp_path / "hudi_tt")
    t1, _, _ = _mk_table(spark, root)
    got = sorted(map(tuple, read_hudi(spark, root, as_of=t1).collect()))
    assert got == [(1, "a"), (2, "b"), (3, "c")]


def test_slices_are_filename_arithmetic_only(spark, tmp_path):
    root = str(tmp_path / "hudi_slices")
    t1, t2, _ = _mk_table(spark, root)
    slices = live_file_slices(root)
    assert len(slices) == 2
    by_inst = {inst for _, inst in slices}
    assert by_inst == {t1, t2}


def test_mor_log_files_gate(spark, tmp_path):
    root = str(tmp_path / "hudi_mor")
    _mk_table(spark, root)
    # an unmerged MoR log file: snapshot read must refuse,
    # read-optimized must serve base files
    open(
        os.path.join(root, f".{FG1}_20240101000000002.log.1_0-1-0"), "w"
    ).close()
    with pytest.raises(UnsupportedHudiFeature):
        read_hudi(spark, root)
    got = sorted(map(tuple, read_hudi(spark, root, read_optimized=True).collect()))
    assert got == [(1, "a"), (2, "B2"), (3, "c")]


def test_hive_partitioned_table(spark, tmp_path):
    root = str(tmp_path / "hudi_part")
    os.makedirs(os.path.join(root, ".hoodie"))
    t1 = "20240101000000001"
    _write_one(
        spark,
        [(1, "x")],
        "key LONG, val STRING",
        os.path.join(root, "dt=2024-01-01", f"{FG1}_0-1-0_{t1}.parquet"),
    )
    _write_one(
        spark,
        [(2, "y")],
        "key LONG, val STRING",
        os.path.join(root, "dt=2024-01-02", f"{FG2}_0-1-0_{t1}.parquet"),
    )
    open(os.path.join(root, ".hoodie", f"{t1}.commit"), "w").close()
    df = read_hudi(spark, root)
    assert "dt" in df.columns
    got = sorted((r["key"], str(r["dt"])) for r in df.collect())
    assert got == [(1, "2024-01-01"), (2, "2024-01-02")]


def test_replacecommit_excludes_replaced_file_groups(spark, tmp_path):
    """Clustering / insert_overwrite: a completed .replacecommit lists
    the file groups it obsoleted in partitionToReplaceFileIds — they
    must vanish from the live set even though their instants are still
    completed (serving both would duplicate rows)."""
    import json

    root = str(tmp_path / "hudi_repl")
    t1, t2, _ = _mk_table(spark, root)
    # instant 004: clustering rewrites BOTH groups into one new group
    t4 = "20240101000000004"
    fg3 = "0d5c3d1a-9999-8888-7777-666655554444-0"
    _write_one(
        spark,
        [(1, "a"), (2, "B2"), (3, "c")],
        "key LONG, val STRING",
        os.path.join(root, f"{fg3}_0-4-0_{t4}.parquet"),
    )
    with open(os.path.join(root, ".hoodie", f"{t4}.replacecommit"), "w") as fh:
        json.dump({"partitionToReplaceFileIds": {"": [FG1, FG2]}}, fh)
    got = sorted(map(tuple, read_hudi(spark, root).collect()))
    assert got == [(1, "a"), (2, "B2"), (3, "c")]  # no duplicates
    slices = live_file_slices(root)
    assert len(slices) == 1 and slices[0][1] == t4
    # time travel BEFORE the clustering still serves the old groups
    got_t2 = sorted(map(tuple, read_hudi(spark, root, as_of=t2).collect()))
    assert got_t2 == [(1, "a"), (2, "B2"), (3, "c")]
    slices_t2 = live_file_slices(root, as_of=t2)
    assert len(slices_t2) == 2


def test_unparseable_replacecommit_raises(spark, tmp_path):
    root = str(tmp_path / "hudi_badrepl")
    _mk_table(spark, root)
    t4 = "20240101000000004"
    with open(
        os.path.join(root, ".hoodie", f"{t4}.replacecommit"), "wb"
    ) as fh:
        fh.write(b"\x00\x01avro-ish-binary\xff")
    with pytest.raises(UnsupportedHudiFeature):
        read_hudi(spark, root)
