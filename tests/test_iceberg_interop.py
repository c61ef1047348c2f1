"""Iceberg format interop: stdlib Avro codec, export round-trip,
hand-built external-writer fixtures (two snapshots, DELETED entries,
time travel), delete-file gating — all from the public spec.

Like the Delta/Hudi fixtures, the hand-authored tables stand in for
tables written by Spark/Flink/Trino: the reader must reconstruct the
live file set from the metadata tree alone.
"""

from __future__ import annotations

import json
import os

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.avro_codec import (
    read_avro,
    write_avro,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
    _MANIFEST_ENTRY_SCHEMA,
    _MANIFEST_LIST_SCHEMA,
    UnsupportedIcebergFeature,
    export_iceberg,
    read_iceberg,
    snapshots,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table

from .conftest import SF_SMOKE


def test_avro_codec_reads_what_it_writes_and_honors_spec_layout(tmp_path):
    """Container layout per the Avro spec: magic, metadata map with
    embedded schema, sync-framed deflate blocks."""
    schema = {
        "type": "record",
        "name": "T",
        "fields": [
            {"name": "a", "type": "long"},
            {"name": "b", "type": ["null", "string"]},
        ],
    }
    p = str(tmp_path / "t.avro")
    recs = [{"a": i, "b": None if i % 2 else f"s{i}"} for i in range(100)]
    write_avro(p, schema, recs)
    raw = open(p, "rb").read()
    assert raw[:4] == b"Obj\x01"
    sch, back = read_avro(p)
    assert back == recs
    assert sch["name"] == "T"


def test_export_round_trip(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "nation_iceberg")
    n = export_iceberg(src, path, table_name="nation")
    assert n >= 1
    # spec layout: metadata tree with version hint + snapshot log
    assert os.path.exists(os.path.join(path, "metadata", "version-hint.text"))
    meta = json.load(open(os.path.join(path, "metadata", "v1.metadata.json")))
    assert meta["format-version"] == 1
    assert meta["current-snapshot-id"] == meta["snapshots"][0]["snapshot-id"]
    snaps = snapshots(path)
    assert len(snaps) == 1 and snaps[0]["summary"]["operation"] == "append"
    back = read_iceberg(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )


def _stage_parquet(spark, rows, schema, dest):
    stage = dest + ".stage"
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(stage)
    part = [f for f in os.listdir(stage) if f.endswith(".parquet")][0]
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    os.replace(os.path.join(stage, part), dest)


def _manifest(path, name, entries):
    p = os.path.join(path, "metadata", name)
    write_avro(p, _MANIFEST_ENTRY_SCHEMA, entries)
    return p


def _mlist(path, name, manifest_paths, snap_id):
    p = os.path.join(path, "metadata", name)
    write_avro(
        p,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": mp,
                "manifest_length": os.path.getsize(mp),
                "partition_spec_id": 0,
                "added_snapshot_id": snap_id,
            }
            for mp in manifest_paths
        ],
    )
    return p


def _entry(fp, status=1, snap=1):
    return {
        "status": status,
        "snapshot_id": snap,
        "data_file": {
            "file_path": fp,
            "file_format": "PARQUET",
            "partition": {},
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(fp),
        },
    }


def test_hand_built_two_snapshots_time_travel_and_deletes(spark, tmp_path):
    """External-writer shape: snapshot 1 adds files a+b; snapshot 2
    DELETES b and adds c. Current read serves a+c; time travel to
    snapshot 1 serves a+b."""
    path = str(tmp_path / "ext_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    fb = os.path.join(path, "data", "b.parquet")
    fc = os.path.join(path, "data", "c.parquet")
    _stage_parquet(spark, [(1, "one")], sch, fa)
    _stage_parquet(spark, [(2, "two")], sch, fb)
    _stage_parquet(spark, [(3, "three")], sch, fc)

    m1 = _manifest(path, "m1.avro", [_entry(fa), _entry(fb)])
    l1 = _mlist(path, "snap-1.avro", [m1], 1)
    # snapshot 2: one manifest carrying the delete + the new add
    m2 = _manifest(
        path,
        "m2.avro",
        [_entry(fa, status=0), _entry(fb, status=2, snap=2), _entry(fc, snap=2)],
    )
    l2 = _mlist(path, "snap-2.avro", [m2], 2)
    meta = {
        "format-version": 1,
        "table-uuid": "u",
        "location": path,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": {"type": "struct", "fields": []},
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": 2,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1},
            {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": l2},
        ],
    }
    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)

    cur = sorted(map(tuple, read_iceberg(spark, path).collect()))
    assert cur == [(1, "one"), (3, "three")]
    old = sorted(
        map(tuple, read_iceberg(spark, path, snapshot_id=1).collect())
    )
    assert old == [(1, "one"), (2, "two")]


def _entry_v2(fp, content, status=1, snap=2, seq=None, eq_ids=None):
    """Manifest entry whose data_file carries the v2 ``content`` field
    (0 data / 1 position deletes / 2 equality deletes), an optional
    entry-level sequence_number, and equality_ids."""
    e = _entry(fp, status=status, snap=snap)
    e["sequence_number"] = seq
    e["data_file"]["content"] = content
    e["data_file"]["equality_ids"] = eq_ids
    return e


_V2_DF_FIELDS = [
    {"name": "content", "type": "int", "field-id": 134},
    {
        "name": "equality_ids",
        "type": ["null", {"type": "array", "items": "int"}],
        "field-id": 135,
    },
] + _MANIFEST_ENTRY_SCHEMA["fields"][2]["type"]["fields"]

_MANIFEST_ENTRY_V2_SCHEMA = {
    "type": "record",
    "name": "manifest_entry",
    "fields": [
        _MANIFEST_ENTRY_SCHEMA["fields"][0],
        _MANIFEST_ENTRY_SCHEMA["fields"][1],
        {"name": "sequence_number", "type": ["null", "long"], "field-id": 3},
        {
            "name": "data_file",
            "field-id": 2,
            "type": {"type": "record", "name": "r2", "fields": _V2_DF_FIELDS},
        },
    ],
}


def _manifest_v2(path, name, entries):
    p = os.path.join(path, "metadata", name)
    write_avro(p, _MANIFEST_ENTRY_V2_SCHEMA, entries)
    return p


def _v2_meta(path, snapshots_list, current, schema=None):
    meta = {
        "format-version": 2,
        "table-uuid": "u",
        "location": path,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": schema or {"type": "struct", "fields": []},
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": current,
        "snapshots": snapshots_list,
    }
    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)


def test_v2_position_deletes_applied_with_time_travel(spark, tmp_path):
    """VERDICT r5 #6: v2 position-delete files are APPLIED at read
    time (anti-join on (file, pos) via the hidden parquet _metadata
    columns); time travel to the pre-delete snapshot still serves
    every row."""
    path = str(tmp_path / "v2_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    fb = os.path.join(path, "data", "b.parquet")
    _stage_parquet(
        spark,
        [(1, "one"), (2, "two"), (3, "three"), (4, "four"), (5, "five")],
        sch, fa,
    )
    _stage_parquet(spark, [(6, "six"), (7, "seven")], sch, fb)
    # position-delete file: rows 1 and 3 of a.parquet (ids 2 and 4),
    # referencing the data file by its RECORDED path
    fd = os.path.join(path, "data", "del-1.parquet")
    _stage_parquet(
        spark, [(fa, 1), (fa, 3)], "file_path STRING, pos LONG", fd
    )
    m1 = _manifest(path, "m1.avro", [_entry(fa), _entry(fb)])
    md = _manifest_v2(path, "m2-del.avro", [_entry_v2(fd, content=1)])
    l1 = _mlist(path, "snap-1.avro", [m1], 1)
    l2 = _mlist(path, "snap-2.avro", [m1, md], 2)
    _v2_meta(
        path,
        [
            {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1},
            {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": l2},
        ],
        current=2,
    )
    cur = sorted(map(tuple, read_iceberg(spark, path).collect()))
    assert cur == [(1, "one"), (3, "three"), (5, "five"),
                   (6, "six"), (7, "seven")]
    old = sorted(
        map(tuple, read_iceberg(spark, path, snapshot_id=1).collect())
    )
    assert old == [(1, "one"), (2, "two"), (3, "three"), (4, "four"),
                   (5, "five"), (6, "six"), (7, "seven")]


def test_v2_equality_deletes_applied_with_seq_scoping(spark, tmp_path):
    """Equality deletes (content=2) are applied null-safely on the
    equality_ids columns and scoped by sequence numbers: a row
    re-inserted AFTER the delete (higher seq) survives; unresolvable
    equality_ids still gate."""
    path = str(tmp_path / "v2_eq_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    fb = os.path.join(path, "data", "b.parquet")
    _stage_parquet(
        spark,
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")],
        sch, fa,
    )
    # re-insert of id=3 AFTER the delete (data seq 3 > delete seq 2)
    _stage_parquet(spark, [(3, "three-new")], sch, fb)
    fd = os.path.join(path, "data", "eqdel.parquet")
    _stage_parquet(spark, [(2,), (3,)], "id LONG", fd)
    table_schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ],
    }
    m = _manifest_v2(
        path,
        "m.avro",
        [
            _entry_v2(fa, content=0, seq=1),
            _entry_v2(fd, content=2, seq=2, eq_ids=[1]),
            _entry_v2(fb, content=0, seq=3),
        ],
    )
    l1 = _mlist(path, "snap-1.avro", [m], 1)
    _v2_meta(
        path,
        [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1}],
        current=1,
        schema=table_schema,
    )
    got = sorted(map(tuple, read_iceberg(spark, path).collect()))
    # id 2 deleted; id 3's seq-1 row deleted but the seq-3 re-insert
    # survives the seq-2 delete
    assert got == [(1, "one"), (3, "three-new"), (4, "four")]

    # unresolvable equality_ids must gate, never resurrect
    path2 = str(tmp_path / "v2_eq_bad")
    fa2 = os.path.join(path2, "data", "a.parquet")
    _stage_parquet(spark, [(1, "one")], sch, fa2)
    fd2 = os.path.join(path2, "data", "eqdel.parquet")
    _stage_parquet(spark, [(1,)], "id LONG", fd2)
    m2 = _manifest_v2(
        path2,
        "m.avro",
        [
            _entry_v2(fa2, content=0, seq=1),
            _entry_v2(fd2, content=2, seq=2, eq_ids=[99]),
        ],
    )
    l2 = _mlist(path2, "snap-1.avro", [m2], 1)
    _v2_meta(
        path2,
        [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l2}],
        current=1,
        schema=table_schema,
    )
    with pytest.raises(UnsupportedIcebergFeature):
        read_iceberg(spark, path2)


def test_lake_table_export_iceberg_round_trip(spark, tmp_path):
    """The lake's keyed-upsert table hands its snapshot to any
    Iceberg reader: upserts applied, metadata tree on disk."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    t = UpsertLakeTable(spark, str(tmp_path / "tkt"), key="k", num_buckets=4)
    rows = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], "k LONG, v STRING, ts LONG"
    )
    t.write(rows, commit_id="c1")
    upd = spark.createDataFrame([(2, "B", 2)], "k LONG, v STRING, ts LONG")
    t.write(upd, commit_id="c2")
    dest = str(tmp_path / "tkt_iceberg")
    n = t.export_iceberg(dest)
    assert n >= 1
    got = sorted(
        (r["k"], r["v"])
        for r in read_iceberg(spark, dest).select("k", "v").collect()
    )
    assert got == [(1, "a"), (2, "B")]


def test_relative_paths_in_metadata_resolve_against_table(spark, tmp_path):
    """Some writers record table-relative manifest/data paths; they
    must resolve against the table root."""
    path = str(tmp_path / "rel_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    _stage_parquet(spark, [(1, "one")], sch, fa)
    rel_entry = {
        "status": 1,
        "snapshot_id": 1,
        "data_file": {
            "file_path": "data/a.parquet",  # table-relative
            "file_format": "PARQUET",
            "partition": {},
            "record_count": 1,
            "file_size_in_bytes": os.path.getsize(fa),
        },
    }
    m1 = _manifest(path, "m1.avro", [rel_entry])
    lp = os.path.join(path, "metadata", "snap-1.avro")
    write_avro(
        lp,
        _MANIFEST_LIST_SCHEMA,
        [
            {
                "manifest_path": "metadata/m1.avro",  # table-relative
                "manifest_length": os.path.getsize(m1),
                "partition_spec_id": 0,
                "added_snapshot_id": 1,
            }
        ],
    )
    meta = {
        "format-version": 1, "table-uuid": "u", "location": path,
        "last-updated-ms": 0, "last-column-id": 2,
        "schema": {"type": "struct", "fields": []},
        "partition-spec": [], "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0, "properties": {},
        "current-snapshot-id": 1,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1,
             "manifest-list": "metadata/snap-1.avro"}
        ],
    }
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    got = sorted(map(tuple, read_iceberg(spark, path).collect()))
    assert got == [(1, "one")]


def test_avro_union_accepts_int_for_float_double_branch(tmp_path):
    """ADVICE r5: Avro permits whole-number values against
    float/double (union) branches — coerce, don't raise."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.avro_codec import (
        read_avro,
        write_avro,
    )

    schema = {
        "type": "record",
        "name": "U",
        "fields": [
            {"name": "x", "type": ["null", "double"]},
            {"name": "y", "type": "float"},
            {"name": "z", "type": ["null", "long"]},
        ],
    }
    p = str(tmp_path / "u.avro")
    recs = [{"x": 3, "y": 2, "z": 4}, {"x": None, "y": 7.5, "z": None}]
    write_avro(p, schema, recs)
    _, back = read_avro(p)
    # ints against float/double encode as floats; the long branch
    # still wins for z (first matching branch)
    assert back == [
        {"x": 3.0, "y": 2.0, "z": 4},
        {"x": None, "y": 7.5, "z": None},
    ]


def test_v2_position_deletes_seq_scoped_rewrite_survives(spark, tmp_path):
    """Spec scoping for position deletes: the delete applies only to
    data files with data seq <= delete seq. A data file REWRITTEN at
    the same recorded path after the delete (higher seq) serves every
    row; a sibling file at the delete's own seq still loses its
    deleted positions."""
    path = str(tmp_path / "v2_pos_seq")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    fb = os.path.join(path, "data", "b.parquet")
    # a.parquet as REWRITTEN at seq 3 (rows must all survive)
    _stage_parquet(spark, [(1, "one-new"), (2, "two-new")], sch, fa)
    # b.parquet at seq 1 (delete still applies: seq 1 <= 2)
    _stage_parquet(spark, [(5, "five"), (6, "six")], sch, fb)
    fd = os.path.join(path, "data", "del.parquet")
    _stage_parquet(
        spark,
        [(fa, 0), (fa, 1), (fb, 1)],
        "file_path STRING, pos LONG",
        fd,
    )
    table_schema = {
        "type": "struct",
        "schema-id": 0,
        "fields": [
            {"id": 1, "name": "id", "required": False, "type": "long"},
            {"id": 2, "name": "v", "required": False, "type": "string"},
        ],
    }
    m = _manifest_v2(
        path,
        "m.avro",
        [
            _entry_v2(fb, content=0, seq=1),
            _entry_v2(fd, content=1, seq=2),
            _entry_v2(fa, content=0, seq=3),
        ],
    )
    l1 = _mlist(path, "snap-1.avro", [m], 1)
    _v2_meta(
        path,
        [{"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1}],
        current=1,
        schema=table_schema,
    )
    got = sorted(map(tuple, read_iceberg(spark, path).collect()))
    # b.parquet pos 1 (id 6) dropped; rewritten a.parquet untouched
    assert got == [(1, "one-new"), (2, "two-new"), (5, "five")]


def test_incremental_append_scan_between_snapshots(spark, tmp_path):
    """read_iceberg_incremental serves exactly the files appended in
    (from, to]: append chains work, a non-append snapshot in the
    range raises like Iceberg's own incremental scan."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg_incremental,
    )

    path = str(tmp_path / "inc_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    fb = os.path.join(path, "data", "b.parquet")
    fc = os.path.join(path, "data", "c.parquet")
    _stage_parquet(spark, [(1, "one")], sch, fa)
    _stage_parquet(spark, [(2, "two")], sch, fb)
    _stage_parquet(spark, [(3, "three")], sch, fc)
    m1 = _manifest(path, "m1.avro", [_entry(fa, snap=1)])
    m2 = _manifest(path, "m2.avro", [_entry(fb, snap=2)])
    m3 = _manifest(path, "m3.avro", [_entry(fc, snap=3)])
    l1 = _mlist(path, "s1.avro", [m1], 1)
    l2 = _mlist(path, "s2.avro", [m1, m2], 2)
    l3 = _mlist(path, "s3.avro", [m1, m2, m3], 3)
    snapshots_list = [
        {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1,
         "summary": {"operation": "append"}},
        {"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": l2,
         "summary": {"operation": "append"}},
        {"snapshot-id": 3, "timestamp-ms": 3, "manifest-list": l3,
         "summary": {"operation": "append"}},
    ]
    _v2_meta(path, snapshots_list, current=3)
    got = sorted(
        map(
            tuple,
            read_iceberg_incremental(spark, path, 1).collect(),
        )
    )
    assert got == [(2, "two"), (3, "three")]
    got = sorted(
        map(
            tuple,
            read_iceberg_incremental(
                spark, path, 1, to_snapshot_id=2
            ).collect(),
        )
    )
    assert got == [(2, "two")]
    # empty range -> empty frame with the table schema
    empty = read_iceberg_incremental(spark, path, 3)
    assert empty.count() == 0 and empty.columns == ["id", "v"]

    # replace snapshot inside the range -> raise
    snapshots_list[2]["summary"] = {"operation": "replace"}
    _v2_meta(path, snapshots_list, current=3)
    with pytest.raises(UnsupportedIcebergFeature, match="non-append"):
        read_iceberg_incremental(spark, path, 1)
    # but the range BEFORE the replace still serves
    assert read_iceberg_incremental(spark, path, 1, 2).count() == 1


# -- round-7 ADVICE hardening ------------------------------------------------


def test_incremental_lineage_walk_beats_same_millisecond_timestamps(
    spark, tmp_path
):
    """Snapshots committed in the same millisecond: the parent-id
    lineage walk orders the range correctly where a timestamp sort
    could flip it; a reversed range raises."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg_incremental,
    )

    path = str(tmp_path / "lineage_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    fb = os.path.join(path, "data", "b.parquet")
    fc = os.path.join(path, "data", "c.parquet")
    _stage_parquet(spark, [(1, "one")], sch, fa)
    _stage_parquet(spark, [(2, "two")], sch, fb)
    _stage_parquet(spark, [(3, "three")], sch, fc)
    m1 = _manifest(path, "m1.avro", [_entry(fa, snap=1)])
    m2 = _manifest(path, "m2.avro", [_entry(fb, snap=2)])
    m3 = _manifest(path, "m3.avro", [_entry(fc, snap=3)])
    l1 = _mlist(path, "s1.avro", [m1], 1)
    l2 = _mlist(path, "s2.avro", [m1, m2], 2)
    l3 = _mlist(path, "s3.avro", [m1, m2, m3], 3)
    # identical timestamps; listed out of commit order on purpose —
    # only parent-snapshot-id carries the true lineage 1 -> 2 -> 3
    snaps = [
        {"snapshot-id": 3, "timestamp-ms": 7, "manifest-list": l3,
         "parent-snapshot-id": 2, "summary": {"operation": "append"}},
        {"snapshot-id": 1, "timestamp-ms": 7, "manifest-list": l1,
         "parent-snapshot-id": None, "summary": {"operation": "append"}},
        {"snapshot-id": 2, "timestamp-ms": 7, "manifest-list": l2,
         "parent-snapshot-id": 1, "summary": {"operation": "append"}},
    ]
    _v2_meta(path, snaps, current=3)
    got = sorted(
        map(tuple, read_iceberg_incremental(spark, path, 1).collect())
    )
    assert got == [(2, "two"), (3, "three")]
    assert read_iceberg_incremental(spark, path, 2, 3).count() == 1
    with pytest.raises(ValueError, match="not an ancestor"):
        read_iceberg_incremental(spark, path, 3, to_snapshot_id=1)


def test_v2_existing_entry_null_seq_raises(spark, tmp_path):
    """Spec: sequence-number inheritance is for ADDED entries only —
    an EXISTING (status=0) entry with a null seq in a v2 manifest
    must raise, not inherit an inflated number that dodges equality
    deletes."""
    path = str(tmp_path / "seq_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    _stage_parquet(spark, [(1, "one")], sch, fa)
    m = _manifest_v2(
        path, "mseq.avro", [_entry_v2(fa, content=0, status=0, seq=None)]
    )
    lp = _mlist(path, "lseq.avro", [m], 2)
    _v2_meta(
        path,
        [{"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": lp,
          "summary": {"operation": "append"}}],
        current=2,
    )
    with pytest.raises(UnsupportedIcebergFeature, match="EXISTING"):
        read_iceberg(spark, path)


def test_unmatched_scan_file_raises_instead_of_dropping_rows(
    spark, tmp_path
):
    """ADVICE r6 (medium): when the recorded data-file path fails to
    normalize to the scanned path (here: a doubled slash the
    filesystem resolves but Hadoop normalizes away), the delete-
    application join must RAISE — the old inner join silently
    dropped every row of the unmatched file."""
    path = str(tmp_path / "mismatch_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    _stage_parquet(spark, [(1, "one"), (2, "two")], sch, fa)
    fd = os.path.join(path, "data", "del.parquet")
    _stage_parquet(spark, [(fa, 0)], "file_path STRING, pos LONG", fd)
    fa_doubled = os.path.join(path, "data") + "//a.parquet"
    m1 = _manifest(path, "m1.avro", [_entry(fa_doubled)])
    md = _manifest_v2(path, "m2.avro", [_entry_v2(fd, content=1)])
    l2 = _mlist(path, "s2.avro", [m1, md], 2)
    _v2_meta(
        path,
        [{"snapshot-id": 2, "timestamp-ms": 2, "manifest-list": l2}],
        current=2,
    )
    with pytest.raises(Exception, match="file mapping"):
        read_iceberg(spark, path).collect()


def test_partitioned_export_prunes_and_round_trips(spark, tmp_path):
    """VERDICT r7 #6: identity-partitioned export. The manifests carry
    real per-file partition structs (one manifest per partition) and
    the manifest list carries bound summaries, so engines prune from
    metadata alone: a one-partition read plans a scan over ONLY that
    partition's files (asserted via inputFiles), and the source
    columns stay in the data files."""
    path = str(tmp_path / "part_iceberg")
    df = spark.createDataFrame(
        [(i, i % 3, f"g{i % 2}", float(i)) for i in range(30)],
        "id long, bucket long, grp string, v double",
    ).repartition(4)
    n = export_iceberg(df, path, partition_by=["bucket", "grp"])
    assert n >= 6  # at least one file per (bucket, grp) combo
    meta = json.load(open(os.path.join(path, "metadata", "v1.metadata.json")))
    assert meta["partition-spec"] == [
        {"name": "bucket", "transform": "identity", "source-id": 2,
         "field-id": 1000},
        {"name": "grp", "transform": "identity", "source-id": 3,
         "field-id": 1001},
    ]
    # full read returns everything with partition columns intact
    back = read_iceberg(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, df.collect())
    )
    # manifest-level facts: one manifest per partition tuple, entries
    # carry the partition struct
    mlist = [
        f
        for f in os.listdir(os.path.join(path, "metadata"))
        if f.startswith("snap-")
    ][0]
    _, manifests = read_avro(os.path.join(path, "metadata", mlist))
    assert len(manifests) == 6
    assert all(m["partitions"] is not None for m in manifests)
    some_manifest = manifests[0]["manifest_path"].replace("file://", "")
    _, entries = read_avro(some_manifest)
    assert all(
        set(e["data_file"]["partition"]) == {"bucket", "grp"}
        for e in entries
    )
    # metadata-level pruning: the planned scan lists ONLY the matching
    # partition's files
    pruned = read_iceberg(
        spark, path, partition_filter={"bucket": 1, "grp": "g1"}
    )
    want_rows = [(i, i % 3, f"g{i % 2}", float(i))
                 for i in range(30) if i % 3 == 1 and i % 2 == 1]
    assert sorted(map(tuple, pruned.collect())) == sorted(want_rows)
    all_files = set(read_iceberg(spark, path).inputFiles())
    pruned_files = set(pruned.inputFiles())
    assert 0 < len(pruned_files) < len(all_files)
    # every planned file genuinely belongs to the filtered partition
    assert all(
        "_p_bucket=1" in f and "_p_grp=g1" in f for f in pruned_files
    )
    # filter matching nothing: metadata answers without scanning
    assert (
        read_iceberg(spark, path, partition_filter={"bucket": 99}).count()
        == 0
    )
    with pytest.raises(ValueError, match="not partition fields"):
        read_iceberg(spark, path, partition_filter={"nope": 1})
    # unsupported partition type gated
    with pytest.raises(UnsupportedIcebergFeature, match="int/long/string"):
        export_iceberg(
            df, str(tmp_path / "bad"), partition_by=["v"]
        )


def test_partitioned_export_null_partition_value(spark, tmp_path):
    path = str(tmp_path / "nullpart_iceberg")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a")], "id long, k string"
    )
    export_iceberg(df, path, partition_by=["k"])
    back = read_iceberg(spark, path)
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        [(1, "a"), (2, None), (3, "a")], key=str
    )
    got = read_iceberg(spark, path, partition_filter={"k": "a"})
    assert sorted(r.id for r in got.collect()) == [1, 3]


def test_bucket_transform_export_and_prune(spark, tmp_path):
    """Spec bucket transform (murmur3, Appendix B): export with
    bucket(4, id) writes a col_bucket partition field whose values
    the spec's hash defines; partition_filter on the bucket number
    prunes to exactly that bucket's files, and every row's id hashes
    to the filtered bucket."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        iceberg_bucket,
    )

    path = str(tmp_path / "bkt_iceberg")
    df = spark.createDataFrame(
        [(i, f"n{i}") for i in range(50)], "id long, name string"
    ).repartition(3)
    export_iceberg(df, path, partition_by=["bucket(4, id)"])
    meta = json.load(open(os.path.join(path, "metadata", "v1.metadata.json")))
    assert meta["partition-spec"] == [
        {"name": "id_bucket", "transform": "bucket[4]", "source-id": 1,
         "field-id": 1000}
    ]
    back = read_iceberg(spark, path)
    assert sorted(r.id for r in back.collect()) == list(range(50))
    pruned = read_iceberg(spark, path, partition_filter={"id_bucket": 2})
    got = sorted(r.id for r in pruned.collect())
    want = sorted(i for i in range(50) if iceberg_bucket(i, "long", 4) == 2)
    assert got == want and 0 < len(want) < 50
    all_files = set(read_iceberg(spark, path).inputFiles())
    assert 0 < len(set(pruned.inputFiles())) < len(all_files)


def test_export_format_version_2_round_trip(spark, tmp_path):
    """v2 export: last-sequence-number/snapshot sequence-number in the
    metadata, content + sequence_number/min_sequence_number in the
    manifest list, manifest entries inheriting the sequence number —
    readable by the module's own v2 reader (which resolves seqs for
    delete scoping) and carrying the v2-required metadata fields."""
    path = str(tmp_path / "v2_iceberg")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(20)], "id long, k long"
    )
    export_iceberg(df, path, partition_by=["k"], format_version=2)
    meta = json.load(open(os.path.join(path, "metadata", "v1.metadata.json")))
    assert meta["format-version"] == 2
    assert meta["last-sequence-number"] == 1
    assert meta["snapshots"][0]["sequence-number"] == 1
    assert meta["current-schema-id"] == 0 and meta["schemas"]
    assert meta["default-sort-order-id"] == 0
    mlist = [
        f
        for f in os.listdir(os.path.join(path, "metadata"))
        if f.startswith("snap-")
    ][0]
    _, manifests = read_avro(os.path.join(path, "metadata", mlist))
    assert all(
        m["content"] == 0
        and m["sequence_number"] == 1
        and m["min_sequence_number"] == 1
        for m in manifests
    )
    # v2-REQUIRED manifest-list count fields (spec "Manifest Lists")
    # and the v2-required data_file.content=0 in every manifest entry
    for m in manifests:
        assert m["existing_files_count"] == 0
        assert m["deleted_files_count"] == 0
        assert m["existing_rows_count"] == 0
        assert m["deleted_rows_count"] == 0
        mpath = m["manifest_path"].replace("file://", "")
        _, entries = read_avro(mpath)
        assert m["added_files_count"] == len(entries)
        assert m["added_rows_count"] == sum(
            e["data_file"]["record_count"] for e in entries
        )
        assert all(e["data_file"]["content"] == 0 for e in entries)
    assert sum(m["added_rows_count"] for m in manifests) == 20
    back = read_iceberg(spark, path)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))
    # the reader resolves inherited data sequence numbers to 1
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import _live_files

    mapping, _, _ = _live_files(path)
    assert {seq for _, seq, _ in mapping.values()} == {1}
    got = read_iceberg(spark, path, partition_filter={"k": 1})
    assert sorted(r.id for r in got.collect()) == [
        i for i in range(20) if i % 3 == 1
    ]
    with pytest.raises(ValueError, match="format_version"):
        export_iceberg(df, str(tmp_path / "v9"), format_version=9)


def test_hive_layout_partition_column_from_directories(spark, tmp_path):
    """Hive-migrated shape: data files under k=<v>/ directories with
    the partition column ABSENT from the parquet — Spark's basePath
    inference supplies it, and the schema projection keeps it because
    the table schema declares it (while shadow/export dirs that are
    NOT schema columns are dropped)."""
    path = str(tmp_path / "hive_iceberg")
    os.makedirs(os.path.join(path, "metadata"))
    for v in (1, 2):
        _stage_parquet(
            spark,
            [(10 * v,), (10 * v + 1,)],
            "id LONG",
            os.path.join(path, "data", f"k={v}", "f.parquet"),
        )
    entries = [
        {
            "status": 1,
            "snapshot_id": 5,
            "data_file": {
                "file_path": f"data/k={v}/f.parquet",
                "file_format": "PARQUET",
                "partition": {},
                "record_count": 2,
                "file_size_in_bytes": 1,
            },
        }
        for v in (1, 2)
    ]
    mp = _manifest(path, "m0.avro", entries)
    _mlist(path, "snap-5.avro", [mp], 5)
    meta = {
        "format-version": 1,
        "table-uuid": "u",
        "location": path,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": {
            "type": "struct",
            "schema-id": 0,
            "fields": [
                {"id": 1, "name": "id", "required": False, "type": "long"},
                {"id": 2, "name": "k", "required": False, "type": "int"},
            ],
        },
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": 5,
        "snapshots": [
            {
                "snapshot-id": 5,
                "timestamp-ms": 0,
                "manifest-list": "file://"
                + os.path.join(path, "metadata", "snap-5.avro"),
                "summary": {"operation": "append"},
            }
        ],
    }
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)
    with open(os.path.join(path, "metadata", "version-hint.text"), "w") as fh:
        fh.write("1")
    got = sorted(map(tuple, read_iceberg(spark, path).collect()))
    assert got == [(10, 1), (11, 1), (20, 2), (21, 2)]


def test_bucket_transform_null_values_and_empty_prune_schema(spark, tmp_path):
    """Code-review r8 fixes: (a) NULLs in a bucket-partition source
    column survive export (Arrow hands nullable ints as float64+NaN —
    pd.isna, not `is None`); (b) a partition_filter matching nothing
    returns an empty frame with the SAME schema as a non-empty read
    (no shadow _p_* leak)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        iceberg_bucket,
    )

    path = str(tmp_path / "bktnull_iceberg")
    df = spark.createDataFrame(
        [(1, 10), (2, None), (3, 30)], "id long, k long"
    )
    export_iceberg(df, path, partition_by=["bucket(4, k)"])
    back = read_iceberg(spark, path)
    assert sorted(map(tuple, back.collect()), key=str) == sorted(
        [(1, 10), (2, None), (3, 30)], key=str
    )
    b10 = iceberg_bucket(10, "long", 4)
    got = read_iceberg(spark, path, partition_filter={"k_bucket": b10})
    assert (1, 10) in {tuple(r) for r in got.collect()}
    # empty prune: same columns as the full read, zero rows
    other = next(b for b in range(4) if b not in
                 {iceberg_bucket(v, "long", 4) for v in (10, 30)})
    empty = read_iceberg(spark, path, partition_filter={"k_bucket": other})
    assert empty.columns == back.columns
    assert empty.count() == 0


def test_empty_prune_never_opens_data_file_footers(spark, tmp_path):
    """Advice r8 fix: a partition_filter the metadata proves empty
    must build its zero-row frame from the TABLE SCHEMA, not from a
    parquet(*all_files).limit(0) scan — at 100 TB that scan lists and
    opens every non-matching footer. Proof: truncate every data file
    after export; the pruned-empty read still succeeds (it never
    touches them), while a full read would fail."""
    path = str(tmp_path / "noscan_iceberg")
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, "b", 2.5)], "id long, k string, v double"
    )
    export_iceberg(df, path, partition_by=["k"])
    for root, _, files in os.walk(os.path.join(path, "data")):
        for f in files:
            if f.endswith(".parquet"):
                with open(os.path.join(root, f), "wb") as fh:
                    fh.write(b"not parquet")
    empty = read_iceberg(spark, path, partition_filter={"k": "zzz"})
    assert empty.columns == ["id", "k", "v"]
    assert [f.dataType.simpleString() for f in empty.schema.fields] == [
        "bigint", "string", "double",
    ]
    assert empty.count() == 0


def test_expire_snapshots_keeps_last_k_and_cleans_unreachable(
    spark, tmp_path
):
    """VERDICT r8 ask #6: expire_snapshots retains the last k
    snapshots on the current lineage in one metadata-only commit
    (new vN.metadata.json + hint bump) and deletes manifest lists /
    manifests / data files reachable ONLY from expired snapshots —
    shared files survive, and reads + remaining time travel stay
    green."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        expire_snapshots,
        snapshots,
    )

    path = str(tmp_path / "expire_iceberg")
    sch = "id LONG, v STRING"
    fa = os.path.join(path, "data", "a.parquet")
    fb = os.path.join(path, "data", "b.parquet")
    fc = os.path.join(path, "data", "c.parquet")
    _stage_parquet(spark, [(1, "one")], sch, fa)
    _stage_parquet(spark, [(2, "two")], sch, fb)
    _stage_parquet(spark, [(3, "three")], sch, fc)
    # snap1 adds a+b (m1); snap2 REPLACES: drops b, keeps a, adds c
    # (m2 only) -> b and m1 are reachable ONLY from snapshot 1;
    # snap3 appends nothing new (m2 carried forward)
    m1 = _manifest(path, "m1.avro", [_entry(fa), _entry(fb)])
    m2 = _manifest(
        path, "m2.avro", [_entry(fa, status=0), _entry(fc, snap=2)]
    )
    l1 = _mlist(path, "snap-1.avro", [m1], 1)
    l2 = _mlist(path, "snap-2.avro", [m2], 2)
    l3 = _mlist(path, "snap-3.avro", [m2], 3)
    meta = {
        "format-version": 1,
        "table-uuid": "u",
        "location": path,
        "last-updated-ms": 0,
        "last-column-id": 2,
        "schema": {"type": "struct", "fields": []},
        "partition-spec": [],
        "partition-specs": [{"spec-id": 0, "fields": []}],
        "default-spec-id": 0,
        "properties": {},
        "current-snapshot-id": 3,
        "snapshots": [
            {"snapshot-id": 1, "timestamp-ms": 1, "manifest-list": l1},
            {
                "snapshot-id": 2,
                "timestamp-ms": 2,
                "parent-snapshot-id": 1,
                "manifest-list": l2,
            },
            {
                "snapshot-id": 3,
                "timestamp-ms": 3,
                "parent-snapshot-id": 2,
                "manifest-list": l3,
            },
        ],
    }
    os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
    with open(os.path.join(path, "metadata", "v1.metadata.json"), "w") as fh:
        json.dump(meta, fh)

    removed = expire_snapshots(path, keep_last=2)
    assert removed["expired_snapshots"] == 1
    assert removed["manifest_lists"] == 1  # l1
    assert removed["manifests"] == 1  # m1 (m2 shared with kept snaps)
    assert removed["data_files"] == 1  # b only reachable from snap 1
    assert not os.path.exists(fb) and not os.path.exists(l1)
    assert not os.path.exists(m1)
    assert os.path.exists(fa) and os.path.exists(fc) and os.path.exists(m2)
    # the commit is a NEW metadata version, hint bumped
    hint = open(os.path.join(path, "metadata", "version-hint.text")).read()
    assert hint.strip() == "2"
    assert [s["snapshot_id"] for s in snapshots(path)] == [2, 3]
    cur = sorted(map(tuple, read_iceberg(spark, path).collect()))
    assert cur == [(1, "one"), (3, "three")]
    old = sorted(
        map(tuple, read_iceberg(spark, path, snapshot_id=2).collect())
    )
    assert old == [(1, "one"), (3, "three")]
    with pytest.raises(ValueError, match="not in table metadata"):
        read_iceberg(spark, path, snapshot_id=1)
    # keep_last below 1 refuses; a second expiry is a no-op
    with pytest.raises(ValueError, match="keep_last"):
        expire_snapshots(path, keep_last=0)
    again = expire_snapshots(path, keep_last=2)
    assert again["expired_snapshots"] == 0


def test_rewrite_data_files_partitioned_identity(spark, tmp_path):
    """r10: rewrite_data_files compacts identity-PARTITIONED tables
    to one file per partition, re-emitting per-partition manifests
    whose partition structs and bound summaries keep manifest-level
    pruning alive; appends after compaction stay consistent."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        rewrite_data_files,
    )

    mk = lambda rows: spark.createDataFrame(rows, "id long, k string")
    for fv in (1, 2):
        path = str(tmp_path / f"rdf_part_v{fv}")
        export_iceberg(
            mk([(1, "a"), (2, "b"), (3, "a")]), path,
            partition_by=["k"], format_version=fv,
        )
        export_iceberg(mk([(4, "b"), (5, "c")]), path,
                       partition_by=["k"], mode="append")
        export_iceberg(mk([(6, "a")]), path,
                       partition_by=["k"], mode="append")
        want = [(1, "a"), (2, "b"), (3, "a"), (4, "b"), (5, "c"),
                (6, "a")]
        res = rewrite_data_files(spark, path)
        assert res["files_after"] == 3  # one per partition value
        d = read_iceberg(spark, path)
        assert sorted(map(tuple, d.collect())) == want
        assert len(d.inputFiles()) == 3
        pr = read_iceberg(spark, path, partition_filter={"k": "a"})
        assert sorted(r[0] for r in pr.select("id").collect()) == [1, 3, 6]
        assert len(pr.inputFiles()) == 1  # pruning survives compaction
        export_iceberg(mk([(7, "c")]), path,
                       partition_by=["k"], mode="append")
        assert sorted(
            map(tuple, read_iceberg(spark, path).collect())
        ) == want + [(7, "c")]


def test_rewrite_data_files_bucket_transform(spark, tmp_path):
    """r11: rewrite_data_files compacts BUCKET-partitioned tables by
    re-deriving bucket values with the golden-tested iceberg_bucket
    transform — one file per non-empty bucket, pruning survives with
    a pinned scan count, and appends after compaction stay
    consistent."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        iceberg_bucket,
        rewrite_data_files,
    )

    mk = lambda rows: spark.createDataFrame(rows, "id long, name string")
    path = str(tmp_path / "rdf_bucket")
    export_iceberg(
        mk([(i, f"n{i}") for i in range(30)]).repartition(3),
        path,
        partition_by=["bucket(4, id)"],
    )
    export_iceberg(
        mk([(i, f"n{i}") for i in range(30, 50)]).repartition(2),
        path,
        partition_by=["bucket(4, id)"],
        mode="append",
    )
    buckets = {iceberg_bucket(i, "long", 4) for i in range(50)}
    assert len(read_iceberg(spark, path).inputFiles()) > len(buckets)
    res = rewrite_data_files(spark, path)
    assert res["files_after"] == len(buckets)  # one per live bucket
    assert res["rewritten_rows"] == 50
    d = read_iceberg(spark, path)
    assert sorted(r.id for r in d.collect()) == list(range(50))
    assert len(d.inputFiles()) == len(buckets)
    pr = read_iceberg(spark, path, partition_filter={"id_bucket": 2})
    want = sorted(i for i in range(50) if iceberg_bucket(i, "long", 4) == 2)
    assert sorted(r.id for r in pr.collect()) == want and want
    assert len(pr.inputFiles()) == 1  # pinned: pruning survives
    export_iceberg(
        mk([(50, "n50")]), path,
        partition_by=["bucket(4, id)"], mode="append",
    )
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == list(range(51))


def test_rewrite_manifests_compacts_current_snapshot(spark, tmp_path):
    """VERDICT r8 ask #6: rewrite_manifests compacts the current
    snapshot's per-partition manifests into ONE manifest of EXISTING
    entries, committed as a new `replace` snapshot over the SAME data
    files — reads, partition pruning, and v2 sequence numbers all
    survive; a second call is a no-op."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _live_files,
        rewrite_manifests,
        snapshots,
    )

    for fv in (1, 2):
        path = str(tmp_path / f"rw_iceberg_v{fv}")
        df = spark.createDataFrame(
            [(i, i % 4) for i in range(40)], "id long, k long"
        )
        export_iceberg(df, path, partition_by=["k"], format_version=fv)
        mlists = lambda: [  # noqa: E731
            f
            for f in os.listdir(os.path.join(path, "metadata"))
            if f.startswith("manifest-")
        ]
        assert len(mlists()) == 4  # one per partition
        before_files = set(read_iceberg(spark, path).inputFiles())
        out = rewrite_manifests(path)
        assert out["data_manifests_before"] == 4
        assert out["rewritten"] == len(before_files)
        snaps = snapshots(path)
        assert len(snaps) == 2
        assert snaps[-1]["summary"]["operation"] == "replace"
        back = read_iceberg(spark, path)
        assert set(back.inputFiles()) == before_files  # same data files
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, df.collect())
        )
        # partition pruning still works off the compacted entries
        pruned = read_iceberg(spark, path, partition_filter={"k": 1})
        assert sorted(r.id for r in pruned.collect()) == [
            i for i in range(40) if i % 4 == 1
        ]
        assert 0 < len(set(pruned.inputFiles())) < len(before_files)
        if fv == 2:
            mapping, _, _ = _live_files(path)
            assert {seq for _, seq, _ in mapping.values()} == {1}
        # idempotent: one data manifest left, nothing to do
        out2 = rewrite_manifests(path)
        assert out2["rewritten"] == 0
        # expire the pre-compaction snapshot: the old per-partition
        # manifests become unreachable and are cleaned; reads green
        from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
            expire_snapshots,
        )

        removed = expire_snapshots(path, keep_last=1)
        assert removed["expired_snapshots"] == 1
        assert removed["manifests"] == 4 and removed["data_files"] == 0
        assert sorted(map(tuple, read_iceberg(spark, path).collect())) == sorted(
            map(tuple, df.collect())
        )


def test_export_iceberg_append_multi_snapshot(spark, tmp_path):
    """r9: mode='append' commits a second snapshot carrying the prior
    manifests forward — full read serves the union, time travel the
    base, incremental read exactly the appended rows; v2 sequence
    numbers advance; schema/spec drift refuses; expire_snapshots then
    prunes the lineage this append created."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        UnsupportedIcebergFeature,
        _live_files,
        expire_snapshots,
        read_iceberg_incremental,
    )

    for fv in (1, 2):
        path = str(tmp_path / f"ice_append_v{fv}")
        base = spark.createDataFrame(
            [(1, "a"), (2, "b")], "id long, v string"
        )
        extra = spark.createDataFrame([(3, "c")], "id long, v string")
        export_iceberg(base, path, format_version=fv)
        s1 = snapshots(path)[-1]["snapshot_id"]
        export_iceberg(extra, path, mode="append")
        snaps = snapshots(path)
        assert len(snaps) == 2
        got = sorted(map(tuple, read_iceberg(spark, path).collect()))
        assert got == [(1, "a"), (2, "b"), (3, "c")]
        old = read_iceberg(spark, path, snapshot_id=s1)
        assert sorted(map(tuple, old.collect())) == [(1, "a"), (2, "b")]
        inc = read_iceberg_incremental(spark, path, s1)
        assert sorted(map(tuple, inc.collect())) == [(3, "c")]
        if fv == 2:
            mapping, _, _ = _live_files(path)
            # appended file(s) at the NEXT sequence number; each
            # export may land several part files
            assert sorted(
                {seq for _, seq, _ in mapping.values()}
            ) == [1, 2]
        with pytest.raises(UnsupportedIcebergFeature, match="schema"):
            export_iceberg(
                spark.createDataFrame([(4,)], "id long"),
                path,
                mode="append",
            )
        with pytest.raises(UnsupportedIcebergFeature, match="spec"):
            export_iceberg(
                extra, path, partition_by=["v"], mode="append"
            )
        removed = expire_snapshots(path, keep_last=1)
        assert removed["expired_snapshots"] == 1
        # the base files are shared with the current snapshot: nothing
        # but the old manifest list may go
        assert removed["data_files"] == 0
        assert sorted(map(tuple, read_iceberg(spark, path).collect())) == got
    # partitioned walk-mode append: new files only, spec preserved
    path = str(tmp_path / "ice_append_part")
    base = spark.createDataFrame(
        [(i, i % 2) for i in range(10)], "id long, k long"
    )
    extra = spark.createDataFrame(
        [(100 + i, i % 2) for i in range(4)], "id long, k long"
    )
    export_iceberg(base, path, partition_by=["k"])
    export_iceberg(extra, path, partition_by=["k"], mode="append")
    got = sorted(r.id for r in read_iceberg(spark, path).collect())
    assert got == sorted(
        [r.id for r in base.collect()] + [r.id for r in extra.collect()]
    )
    pruned = read_iceberg(spark, path, partition_filter={"k": 1})
    assert sorted(r.id for r in pruned.collect()) == sorted(
        i for i in range(10) if i % 2
    ) + [101, 103]

def test_delete_iceberg_position_deletes_round_trip(spark, tmp_path):
    """r11: delete_iceberg writes v2 position-delete files + a delete
    manifest the reader applies; time travel to the pre-delete
    snapshot serves every row; a second delete stacks; rewrite
    materializes them; v1 and empty-match behave; partitioned tables
    keep pruning after a partition-scoped delete."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        delete_iceberg,
        rewrite_data_files,
    )

    mk = lambda n: spark.createDataFrame(
        [(i, f"n{i}") for i in range(n)], "id long, name string"
    )
    path = str(tmp_path / "del_v2")
    export_iceberg(mk(20).repartition(3), path, format_version=2)
    res = delete_iceberg(spark, path, "id IN (3, 7, 11)")
    assert res["deleted_rows"] == 3 and res["files_touched"] >= 1
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == \
        sorted(set(range(20)) - {3, 7, 11})
    meta = json.load(open(_current_metadata_path(path)))
    first = meta["snapshots"][0]["snapshot-id"]
    assert sorted(
        r.id for r in read_iceberg(spark, path, snapshot_id=first).collect()
    ) == list(range(20))
    assert delete_iceberg(spark, path, "id = 0")["deleted_rows"] == 1
    want = sorted(set(range(20)) - {0, 3, 7, 11})
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == want
    # no matches -> no commit
    assert delete_iceberg(spark, path, "id = 999")["snapshot_id"] is None
    # rewrite materializes the deletes and drops the delete files
    r3 = rewrite_data_files(spark, path)
    assert r3["rewritten_rows"] == 16 and r3["files_after"] == 1
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == want

    p1 = str(tmp_path / "del_v1")
    export_iceberg(mk(5), p1, format_version=1)
    with pytest.raises(UnsupportedIcebergFeature, match="format-version 2"):
        delete_iceberg(spark, p1, "id = 1")

    p2 = str(tmp_path / "del_part")
    df2 = spark.createDataFrame(
        [(i, "abc"[i % 3]) for i in range(30)], "id long, k string"
    )
    export_iceberg(df2, p2, partition_by=["k"], format_version=2)
    delete_iceberg(spark, p2, "id < 10")
    assert sorted(
        r.id for r in read_iceberg(spark, p2).collect()
    ) == list(range(10, 30))
    pr = read_iceberg(spark, p2, partition_filter={"k": "a"})
    assert sorted(r.id for r in pr.collect()) == [
        i for i in range(10, 30) if i % 3 == 0
    ]

def test_upsert_iceberg_equality_delete_lww(spark, tmp_path):
    """r11: upsert_iceberg commits the Flink-sink UPSERT shape — one
    overwrite snapshot with a data manifest + an equality-delete
    manifest over the key field ids. Strict seq scoping retires old
    rows while the batch's own data (same seq) survives; composite
    and NULL keys work (null-safe anti-join); time travel serves the
    pre-upsert state; incremental ranges refuse; rewrite
    materializes; key-dup batches refuse with a clean abort; v1 and
    partitioned tables refuse."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        rewrite_data_files,
        upsert_iceberg,
    )

    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    path = str(tmp_path / "ups")
    export_iceberg(
        mk([(i, f"v{i}") for i in range(10)]).coalesce(2),
        path, format_version=2,
    )
    res = upsert_iceberg(
        spark, path, mk([(3, "V3"), (4, "V4"), (10, "v10")]), ["id"]
    )
    assert res["rows"] == 3
    want = sorted(
        [(i, f"v{i}") for i in range(10) if i not in (3, 4)]
        + [(3, "V3"), (4, "V4"), (10, "v10")]
    )
    assert sorted(map(tuple, read_iceberg(spark, path).collect())) == want
    upsert_iceberg(spark, path, mk([(3, "W3")]), ["id"])
    want = sorted([t for t in want if t[0] != 3] + [(3, "W3")])
    assert sorted(map(tuple, read_iceberg(spark, path).collect())) == want
    meta = json.load(open(_current_metadata_path(path)))
    s0 = meta["snapshots"][0]["snapshot-id"]
    assert sorted(
        map(tuple, read_iceberg(spark, path, snapshot_id=s0).collect())
    ) == sorted((i, f"v{i}") for i in range(10))
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg_incremental,
    )

    with pytest.raises(UnsupportedIcebergFeature, match="non-append"):
        read_iceberg_incremental(spark, path, s0)
    rr = rewrite_data_files(spark, path)
    assert rr["files_after"] == 1
    assert sorted(map(tuple, read_iceberg(spark, path).collect())) == want
    # key-dup batch refuses and leaves the table intact
    with pytest.raises(ValueError, match="distinct keys"):
        upsert_iceberg(spark, path, mk([(1, "a"), (1, "b")]), ["id"])
    assert sorted(map(tuple, read_iceberg(spark, path).collect())) == want

    # composite + NULL keys: null-safe equality retires the (null, x)
    # row on re-upsert
    p2 = str(tmp_path / "ups_nulls")
    mk2 = lambda rows: spark.createDataFrame(
        rows, "k1 long, k2 string, v long"
    )
    export_iceberg(
        mk2([(1, "a", 10), (None, "b", 20), (2, None, 30)]),
        p2, format_version=2,
    )
    upsert_iceberg(
        spark, p2, mk2([(None, "b", 21), (2, None, 31)]), ["k1", "k2"]
    )
    got = sorted(
        map(tuple, read_iceberg(spark, p2).collect()),
        key=lambda t: (t[0] is None, t),
    )
    assert got == [
        (1, "a", 10), (2, None, 31), (None, "b", 21),
    ]

    p3 = str(tmp_path / "ups_v1")
    export_iceberg(mk([(1, "a")]), p3)
    with pytest.raises(UnsupportedIcebergFeature, match="format-version"):
        upsert_iceberg(spark, p3, mk([(1, "b")]), ["id"])


def test_upsert_iceberg_partitioned_global_deletes(spark, tmp_path):
    """r11: upserts on PARTITIONED tables — data written per
    partition (identity and bucket), equality deletes GLOBAL under
    an unpartitioned spec minted into partition-specs, so a key
    MOVING partitions retires its old row in the old partition;
    pruning survives; the deletes-only leg works; rewrite
    materializes."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        rewrite_data_files,
        upsert_iceberg,
    )

    mk = lambda rows: spark.createDataFrame(
        rows, "id long, k string, v long"
    )
    p = str(tmp_path / "ups_part")
    export_iceberg(
        mk([(i, "abc"[i % 3], i * 10) for i in range(12)]),
        p, partition_by=["k"], format_version=2,
    )
    upsert_iceberg(spark, p, mk([(1, "b", 999), (20, "c", 200)]), ["id"])
    got = sorted(
        (r.id, r.k, r.v) for r in read_iceberg(spark, p).collect()
    )
    want = sorted(
        [(i, "abc"[i % 3], i * 10) for i in range(12) if i != 1]
        + [(1, "b", 999), (20, "c", 200)]
    )
    assert got == want
    pr = read_iceberg(spark, p, partition_filter={"k": "c"})
    assert sorted(r.id for r in pr.collect()) == sorted(
        [i for i in range(12) if i % 3 == 2 and i != 1] + [20]
    )
    # cross-partition key move: the GLOBAL delete retires the old row
    upsert_iceberg(spark, p, mk([(2, "a", 22)]), ["id"])
    got = sorted((r.id, r.k) for r in read_iceberg(spark, p).collect())
    assert (2, "a") in got and (2, "c") not in got
    # deletes-only leg
    upsert_iceberg(
        spark, p, None, ["id"],
        deletes=spark.createDataFrame([(20,)], "id long"),
    )
    assert 20 not in [r.id for r in read_iceberg(spark, p).collect()]
    meta = json.load(open(_current_metadata_path(p)))
    assert any(not s.get("fields") for s in meta["partition-specs"])
    rewrite_data_files(spark, p)
    assert len(read_iceberg(spark, p).collect()) == 12
    # bucket-partitioned upsert re-derives the bucket value
    pb = str(tmp_path / "ups_bkt")
    export_iceberg(
        mk([(i, "x", i) for i in range(10)]),
        pb, partition_by=["bucket(4, id)"], format_version=2,
    )
    upsert_iceberg(spark, pb, mk([(3, "y", 33)]), ["id"])
    got = sorted(
        (r.id, r.k, r.v) for r in read_iceberg(spark, pb).collect()
    )
    assert (3, "y", 33) in got and len(got) == 10

def test_read_iceberg_changelog(spark, tmp_path):
    """r11: the changelog scan — appends emit inserts from ONE scan
    of the new files, position-delete and equality-upsert snapshots
    emit the parent state diff (net deletes, delete+insert per
    upserted key), replace snapshots are silent, and an expired
    parent of a row-level snapshot raises."""
    from collections import Counter

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        delete_iceberg,
        read_iceberg_changelog,
        rewrite_data_files,
        upsert_iceberg,
    )

    path = str(tmp_path / "chlog")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(
        mk([(i, f"v{i}") for i in range(6)]).coalesce(1),
        path, format_version=2,
    )
    export_iceberg(
        mk([(6, "v6"), (7, "v7")]).coalesce(1), path, mode="append"
    )
    delete_iceberg(spark, path, "id IN (1, 6)")
    upsert_iceberg(spark, path, mk([(2, "V2"), (8, "v8")]), ["id"])
    rewrite_data_files(spark, path)
    meta = json.load(open(_current_metadata_path(path)))
    sids = [s["snapshot-id"] for s in meta["snapshots"]]

    C = lambda df: Counter(map(tuple, df.collect()))
    want = Counter()
    for i in (6, 7):
        want[(i, f"v{i}", "insert", 0)] += 1
    for i in (1, 6):
        want[(i, f"v{i}", "delete", 1)] += 1
    want[(2, "v2", "delete", 2)] += 1
    want[(2, "V2", "insert", 2)] += 1
    want[(8, "v8", "insert", 2)] += 1
    assert C(read_iceberg_changelog(spark, path, sids[0])) == want
    assert (
        read_iceberg_changelog(spark, path, sids[3], sids[4]).count()
        == 0
    )  # replace only
    # unknown endpoints / non-ancestor ranges raise
    with pytest.raises(ValueError, match="not in table metadata"):
        read_iceberg_changelog(spark, path, 123456)

def test_as_of_timestamp_time_travel(spark, tmp_path):
    """r11: read_iceberg(as_of_timestamp_ms=...) resolves the
    snapshot current at the instant via the snapshot-log;
    pre-history and combined args raise."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
    )

    path = str(tmp_path / "ice_ts")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(mk([(1, "a")]), path, format_version=2)
    export_iceberg(mk([(2, "b")]), path, mode="append")
    meta = json.load(open(_current_metadata_path(path)))
    log = sorted(
        meta["snapshot-log"], key=lambda e: e["timestamp-ms"]
    )
    assert len(log) == 2
    # pin distinct log timestamps so the boundary is deterministic
    log[0]["timestamp-ms"], log[1]["timestamp-ms"] = 1000, 2000
    meta["snapshot-log"] = log
    with open(_current_metadata_path(path), "w") as fh:
        json.dump(meta, fh)
    assert sorted(
        map(
            tuple,
            read_iceberg(spark, path, as_of_timestamp_ms=1500).collect(),
        )
    ) == [(1, "a")]
    assert sorted(
        map(
            tuple,
            read_iceberg(spark, path, as_of_timestamp_ms=2500).collect(),
        )
    ) == [(1, "a"), (2, "b")]
    with pytest.raises(ValueError, match="precedes"):
        read_iceberg(spark, path, as_of_timestamp_ms=500)
    with pytest.raises(ValueError, match="exclusive"):
        read_iceberg(
            spark, path,
            snapshot_id=log[0]["snapshot-id"], as_of_timestamp_ms=1500,
        )

def test_rollback_iceberg_ancestor_only(spark, tmp_path):
    """r11: rollback points current-snapshot-id back at an ancestor
    (metadata-only); abandoned descendants stay time-travelable; the
    next append chains from the rolled-back snapshot; non-ancestors
    refuse; rolling back to the current snapshot is a no-op."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        rollback_iceberg,
    )

    path = str(tmp_path / "rb")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(mk([(1, "a")]), path, format_version=2)
    export_iceberg(mk([(2, "b")]), path, mode="append")
    export_iceberg(mk([(3, "c")]), path, mode="append")
    meta = json.load(open(_current_metadata_path(path)))
    sids = [s["snapshot-id"] for s in meta["snapshots"]]

    res = rollback_iceberg(path, sids[1])
    assert res["rolled_back"] and res["current_snapshot_id"] == sids[1]
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == [1, 2]
    # the abandoned tip still time-travels
    assert sorted(
        r.id
        for r in read_iceberg(spark, path, snapshot_id=sids[2]).collect()
    ) == [1, 2, 3]
    # a new append branches from the rolled-back snapshot
    export_iceberg(mk([(4, "d")]), path, mode="append")
    assert sorted(r.id for r in read_iceberg(spark, path).collect()) == [
        1, 2, 4,
    ]
    meta = json.load(open(_current_metadata_path(path)))
    tip = next(
        s for s in meta["snapshots"]
        if s["snapshot-id"] == meta["current-snapshot-id"]
    )
    assert tip["parent-snapshot-id"] == sids[1]
    # the OLD tip is now a divergent branch: not an ancestor
    with pytest.raises(ValueError, match="not an ancestor"):
        rollback_iceberg(path, sids[2])
    # no-op on the current snapshot
    assert rollback_iceberg(
        path, meta["current-snapshot-id"]
    )["rolled_back"] is False

def test_iceberg_tags_pin_snapshots(spark, tmp_path):
    """r11: named tag refs (the v2 refs map) — read_iceberg(ref=...)
    resolves them, expire_snapshots RETAINS tagged snapshots until
    drop_ref_iceberg, and dropped refs make them expirable again."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        drop_ref_iceberg,
        expire_snapshots,
        tag_iceberg,
    )

    path = str(tmp_path / "tags")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(mk([(1, "a")]), path, format_version=2)
    meta = json.load(open(_current_metadata_path(path)))
    s0 = meta["snapshots"][0]["snapshot-id"]
    tag_iceberg(path, "v1.0")  # pins s0 (current)
    export_iceberg(mk([(2, "b")]), path, mode="append")
    export_iceberg(mk([(3, "c")]), path, mode="append")
    # the tag resolves to the old state
    assert sorted(
        r.id for r in read_iceberg(spark, path, ref="v1.0").collect()
    ) == [1]
    with pytest.raises(ValueError, match="not in table metadata"):
        read_iceberg(spark, path, ref="nope")
    # expire keeps the tagged ancestor even with keep_last=1
    res = expire_snapshots(path, keep_last=1)
    meta = json.load(open(_current_metadata_path(path)))
    live = {s["snapshot-id"] for s in meta["snapshots"]}
    assert s0 in live and len(live) == 2
    assert sorted(
        r.id for r in read_iceberg(spark, path, ref="v1.0").collect()
    ) == [1]
    # drop the tag: the snapshot becomes expirable
    drop_ref_iceberg(path, "v1.0")
    expire_snapshots(path, keep_last=1)
    meta = json.load(open(_current_metadata_path(path)))
    assert {s["snapshot-id"] for s in meta["snapshots"]} == {
        meta["current-snapshot-id"]
    }
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == [1, 2, 3]


def test_merge_entry_schemas_optionality_is_order_independent():
    """r12 (r11 ADVICE): a non-optional field present in only ONE of
    the two manifest-entry schemas must refuse cleanly in BOTH
    argument orders — previously a non-optional extra in the FIRST
    schema slipped through and died later in write_avro."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        UnsupportedIcebergFeature,
        _merge_entry_schemas,
    )

    base = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [{"name": "status", "type": "int"}],
    }
    extra_required = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {"name": "snapshot_id", "type": "long"},  # NOT optional
        ],
    }
    for a, b in ((extra_required, base), (base, extra_required)):
        with _pytest.raises(
            UnsupportedIcebergFeature, match="non-optional"
        ):
            _merge_entry_schemas(a, b)
    # optional extras still merge fine in both orders
    extra_optional = {
        "type": "record",
        "name": "manifest_entry",
        "fields": [
            {"name": "status", "type": "int"},
            {
                "name": "snapshot_id",
                "type": ["null", "long"],
                "default": None,
            },
        ],
    }
    for a, b in ((extra_optional, base), (base, extra_optional)):
        merged = _merge_entry_schemas(a, b)
        assert {f["name"] for f in merged["fields"]} == {
            "status",
            "snapshot_id",
        }


def test_as_of_timestamp_fallback_skips_untimestamped_snapshots(
    spark, tmp_path
):
    """r12 (r11 ADVICE): when metadata has no snapshot-log, the
    fallback over ``snapshots`` must SKIP snapshots lacking
    timestamp-ms instead of treating them as epoch-0 (which made
    them eligible for any as-of instant)."""
    import json as _json

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
    )

    path = str(tmp_path / "ice_nots")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(mk([(1, "a")]), path, format_version=2)
    export_iceberg(mk([(2, "b")]), path, mode="append")
    mp = _current_metadata_path(path)
    meta = _json.load(open(mp))
    meta.pop("snapshot-log", None)
    snaps = sorted(meta["snapshots"], key=lambda s: s["timestamp-ms"])
    del snaps[0]["timestamp-ms"]  # first snapshot: no timestamp
    snaps[1]["timestamp-ms"] = 2000
    meta["snapshots"] = snaps
    with open(mp, "w") as fh:
        _json.dump(meta, fh)
    # an instant before the only TIMESTAMPED snapshot must raise, not
    # silently resolve to the untimestamped one
    with pytest.raises(ValueError, match="precedes"):
        read_iceberg(spark, path, as_of_timestamp_ms=1500)
    assert sorted(
        map(
            tuple,
            read_iceberg(spark, path, as_of_timestamp_ms=2500).collect(),
        )
    ) == [(1, "a"), (2, "b")]


def test_update_iceberg_rowdelta_commit(spark, tmp_path):
    """r12: update_iceberg commits ONE overwrite snapshot carrying
    position deletes for the matched rows + a data file of rewritten
    rows (Java's RowDelta shape); reads serve the post-update state;
    pre-update time travel still serves the old rows; SET exprs bind
    the OLD row; updates stack and compose with delete_iceberg;
    guards refuse v1 / partitioned / unknown columns."""
    from collections import Counter

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        delete_iceberg,
        rewrite_data_files,
        update_iceberg,
    )

    path = str(tmp_path / "ice_upd")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string, n long")
    export_iceberg(
        mk([(i, f"v{i}", i * 10) for i in range(6)]), path,
        format_version=2,
    )
    pre_sid = json.load(
        open(tmp_path / "ice_upd" / "metadata" / "v1.metadata.json")
    )["current-snapshot-id"]

    res = update_iceberg(
        spark, path, "id >= 4", {"v": "concat('U-', v)", "n": "n + 1"}
    )
    assert res["updated_rows"] == 2 and res["new_files"] >= 1
    C = lambda df: Counter(map(tuple, df.collect()))
    want = Counter(
        {(i, f"v{i}", i * 10): 1 for i in range(4)}
        | {(4, "U-v4", 41): 1, (5, "U-v5", 51): 1}
    )
    assert C(read_iceberg(spark, path)) == want
    # pre-update snapshot still serves the old rows
    assert C(read_iceberg(spark, path, snapshot_id=pre_sid)) == Counter(
        {(i, f"v{i}", i * 10): 1 for i in range(6)}
    )
    # SET expressions all bind the OLD row (swap test)
    update_iceberg(
        spark, path, "id = 0",
        {"v": "cast(n as string)", "n": "length(v)"},
    )
    row = read_iceberg(spark, path).filter("id = 0").collect()[0]
    assert (row.v, row.n) == ("0", 2)
    # composes with delete_iceberg, and rewrite folds it all in
    delete_iceberg(spark, path, "id = 4")
    want2 = Counter(
        {(0, "0", 2): 1, (1, "v1", 10): 1, (2, "v2", 20): 1,
         (3, "v3", 30): 1, (5, "U-v5", 51): 1}
    )
    assert C(read_iceberg(spark, path)) == want2
    rewrite_data_files(spark, path)
    assert C(read_iceberg(spark, path)) == want2
    # guards
    with pytest.raises(ValueError, match="unknown SET"):
        update_iceberg(spark, path, "id = 1", {"zz": "'x'"})
    p1 = str(tmp_path / "ice_v1")
    export_iceberg(mk([(1, "a", 1)]), p1, format_version=1)
    with pytest.raises(UnsupportedIcebergFeature, match="format-version 2"):
        update_iceberg(spark, p1, "id = 1", {"v": "'x'"})
    # partitioned tables (r12): rewritten rows land per partition and
    # both manifests carry real partition structs; partition pruning
    # still works after the update
    pp = str(tmp_path / "ice_part")
    export_iceberg(
        mk([(1, "a", 1), (2, "b", 2), (3, "a", 3)]), pp,
        format_version=2, partition_by=["v"],
    )
    rp = update_iceberg(spark, pp, "v = 'a'", {"n": "n + 10"})
    assert rp["updated_rows"] == 2
    assert C(read_iceberg(spark, pp)) == Counter(
        {(1, "a", 11): 1, (2, "b", 2): 1, (3, "a", 13): 1}
    )
    assert C(
        read_iceberg(spark, pp, partition_filter={"v": "a"})
    ) == Counter({(1, "a", 11): 1, (3, "a", 13): 1})
    # no-match update commits nothing
    assert update_iceberg(spark, path, "id = 999", {"n": "0"})[
        "snapshot_id"
    ] is None


def test_iceberg_branch_refs_round_trip(spark, tmp_path):
    """r12: writable BRANCH refs — branch_iceberg creates the ref;
    export append and delete_iceberg advance it via branch= without
    moving the main lineage; read_iceberg(ref=) resolves the head;
    read_iceberg_changelog(ref=) scopes to the branch; expire
    retains the branch's ancestors until the ref drops; guards
    refuse unknown branches and branch= on overwrite."""
    from collections import Counter

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        branch_iceberg,
        delete_iceberg,
        drop_ref_iceberg,
        expire_snapshots,
        read_iceberg_changelog,
        snapshots,
    )

    path = str(tmp_path / "ice_branch")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(mk([(1, "a"), (2, "b")]), path, format_version=2)
    main0 = snapshots(path)[-1]["snapshot_id"]
    res = branch_iceberg(path, "audit")
    assert res["snapshot_id"] == main0

    # commits on the branch do not move main
    export_iceberg(mk([(3, "c")]), path, mode="append", branch="audit")
    delete_iceberg(spark, path, "id = 1", branch="audit")
    C = lambda df: Counter(map(tuple, df.collect()))
    assert C(read_iceberg(spark, path)) == Counter(
        {(1, "a"): 1, (2, "b"): 1}
    )
    assert C(read_iceberg(spark, path, ref="audit")) == Counter(
        {(2, "b"): 1, (3, "c"): 1}
    )
    # main keeps its own lineage: a main append is invisible to the
    # branch
    export_iceberg(mk([(9, "z")]), path, mode="append")
    assert C(read_iceberg(spark, path, ref="audit")) == Counter(
        {(2, "b"): 1, (3, "c"): 1}
    )
    assert C(read_iceberg(spark, path)) == Counter(
        {(1, "a"): 1, (2, "b"): 1, (9, "z"): 1}
    )
    # changelog scoped to the branch: insert(3) then delete(1)
    got = C(read_iceberg_changelog(spark, path, main0, ref="audit"))
    assert got == Counter(
        {(3, "c", "insert", 0): 1, (1, "a", "delete", 1): 1}
    )
    # expire keeps the branch's ancestors; after dropping the ref
    # they become expirable
    expire_snapshots(path, keep_last=1)
    assert C(read_iceberg(spark, path, ref="audit")) == Counter(
        {(2, "b"): 1, (3, "c"): 1}
    )
    drop_ref_iceberg(path, "audit")
    expire_snapshots(path, keep_last=1)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="ref"):
        read_iceberg(spark, path, ref="audit")
    # guards
    with _pytest.raises(ValueError, match="branch"):
        export_iceberg(mk([(7, "q")]), path, mode="append", branch="nope")
    with _pytest.raises(ValueError, match="append"):
        export_iceberg(mk([(7, "q")]), path, branch="audit")
    with _pytest.raises(ValueError, match="branch"):
        delete_iceberg(spark, path, "id = 9", branch="nope")


def test_dml_predicates_see_only_live_rows(spark, tmp_path):
    """r12: delete_iceberg and update_iceberg scan LIVE rows (prior
    deletes applied) — an overlapping delete records nothing twice
    (deleted_rows exact) and an UPDATE whose predicate matches a
    retired row does NOT resurrect it."""
    from collections import Counter

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        delete_iceberg,
        update_iceberg,
        upsert_iceberg,
    )

    path = str(tmp_path / "ice_live")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(mk([(i, f"v{i}") for i in range(6)]), path, format_version=2)
    r1 = delete_iceberg(spark, path, "id < 3")
    assert r1["deleted_rows"] == 3
    # overlapping delete: only the NEWLY retired row counts
    r2 = delete_iceberg(spark, path, "id < 4")
    assert r2["deleted_rows"] == 1
    # update matching retired rows must not resurrect them
    r3 = update_iceberg(spark, path, "id <= 4", {"v": "'U'"})
    assert r3["updated_rows"] == 1  # only id=4 is live
    C = lambda df: Counter(map(tuple, df.collect()))
    assert C(read_iceberg(spark, path)) == Counter(
        {(4, "U"): 1, (5, "v5"): 1}
    )
    # rows retired by EQUALITY deletes (upsert) are invisible too
    upsert_iceberg(
        spark, path, None, ["id"],
        deletes=spark.createDataFrame([(5,)], "id long"),
    )
    assert delete_iceberg(spark, path, "id = 5")["deleted_rows"] == 0
    assert update_iceberg(spark, path, "id = 5", {"v": "'X'"})[
        "updated_rows"
    ] == 0
    assert C(read_iceberg(spark, path)) == Counter({(4, "U"): 1})


def test_iceberg_branch_full_dml_surface(spark, tmp_path):
    """r12: upsert_iceberg and update_iceberg also take branch= —
    the whole DML surface advances a branch without moving main."""
    from collections import Counter

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        branch_iceberg,
        update_iceberg,
        upsert_iceberg,
    )

    path = str(tmp_path / "ice_branch_dml")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_iceberg(mk([(1, "a"), (2, "b")]), path, format_version=2)
    branch_iceberg(path, "dev")
    upsert_iceberg(spark, path, mk([(2, "B2"), (3, "c")]), ["id"],
                   branch="dev")
    update_iceberg(spark, path, "id = 1", {"v": "'A'"}, branch="dev")
    C = lambda df: Counter(map(tuple, df.collect()))
    assert C(read_iceberg(spark, path)) == Counter(
        {(1, "a"): 1, (2, "b"): 1}
    )  # main untouched
    assert C(read_iceberg(spark, path, ref="dev")) == Counter(
        {(1, "A"): 1, (2, "B2"): 1, (3, "c"): 1}
    )
    import pytest as _pytest

    with _pytest.raises(ValueError, match="branch"):
        upsert_iceberg(spark, path, mk([(9, "z")]), ["id"], branch="nope")
