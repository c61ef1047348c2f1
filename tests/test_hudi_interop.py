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


def test_mor_log_without_meta_fields_gates(spark, tmp_path):
    """MoR log merging needs _hoodie_record_key in the base files;
    this table's bases carry no meta fields, so the real-time view
    gates rather than mis-merging, while read-optimized serves the
    base-only view. (Full real-time merging over meta-field bases:
    tests/test_hudi_log.py.)"""
    root = str(tmp_path / "hudi_mor")
    _mk_table(spark, root)
    open(
        os.path.join(root, f".{FG1}_20240101000000002.log.1_0-1-0"), "w"
    ).close()
    with pytest.raises(UnsupportedHudiFeature, match="record_key"):
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


def test_export_hudi_cow_round_trip_and_layout(spark, tmp_path):
    """export_hudi_cow writes a spec-conformant CoW layout: base-file
    naming, .hoodie timeline with HoodieCommitMetadata, materialized
    _hoodie_* meta columns, record keys co-located per file group —
    and read_hudi round-trips the data."""
    import json as _json

    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        _BASE_FILE_RE,
        completed_instants,
        export_hudi_cow,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )

    src = load_table(spark, "/root/testdata/sf0.001", "customer").select(
        "c_custkey", "c_name", "c_acctbal"
    )
    path = str(tmp_path / "hudi_export")
    n = export_hudi_cow(
        src, path, record_key="c_custkey", instant="20240601120000000",
        num_files=3,
    )
    assert 1 <= n <= 3
    # spec naming + timeline
    data_files = [f for f in os.listdir(path) if f.endswith(".parquet")]
    assert len(data_files) == n
    assert all(_BASE_FILE_RE.match(f) for f in data_files)
    assert completed_instants(path) == ["20240601120000000"]
    tl = os.listdir(os.path.join(path, ".hoodie"))
    assert "hoodie.properties" in tl
    assert "20240601120000000.commit.requested" in tl
    assert "20240601120000000.inflight" in tl
    meta = _json.load(
        open(os.path.join(path, ".hoodie", "20240601120000000.commit"))
    )
    stats = meta["partitionToWriteStats"][""]
    assert sum(s["numWrites"] for s in stats) == src.count()
    assert all(s["fileSizeInBytes"] > 0 for s in stats)
    assert {s["path"] for s in stats} == set(data_files)

    # the five meta columns are IN the parquet, file names self-consistent
    raw = spark.read.parquet(os.path.join(path, data_files[0]))
    assert raw.columns[:5] == [
        "_hoodie_commit_time",
        "_hoodie_commit_seqno",
        "_hoodie_record_key",
        "_hoodie_partition_path",
        "_hoodie_file_name",
    ]
    one = raw.select("_hoodie_file_name").distinct().collect()
    assert len(one) == 1 and one[0][0] == data_files[0]

    # read_hudi round-trips the payload
    back = read_hudi(spark, path).select("c_custkey", "c_name", "c_acctbal")
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, src.collect())
    )
    # record keys are co-located: each key appears in exactly one file
    per_key = (
        read_hudi(spark, path)
        .groupBy("_hoodie_record_key")
        .agg(F.count_distinct("_hoodie_file_name").alias("nf"))
        .agg(F.max("nf").alias("mx"))
        .collect()[0]["mx"]
    )
    assert per_key == 1


def test_lake_table_export_hudi_round_trip(spark, tmp_path):
    """The lake's keyed-upsert table hands its snapshot to any Hudi
    reader: upserts applied, spec layout on disk."""
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
    dest = str(tmp_path / "tkt_hudi")
    n = t.export_hudi(dest, instant="20240601130000000")
    assert n >= 1
    got = sorted(
        (r["k"], r["v"]) for r in read_hudi(spark, dest).select("k", "v").collect()
    )
    assert got == [(1, "a"), (2, "B")]


def test_export_hudi_glue_ddl_conformance(spark, tmp_path):
    """VERDICT r5 #8 done-condition: EXPORT TABLE ... AS HUDI produces
    a directory the reference's Athena/Glue table definition
    (lib/rds-cdc-flink-hudi-stack.ts:458-519) could mount — the Glue
    DDL's EXACT column surface (five _hoodie_* strings first, then
    full_name string, id string, ticket_price float,
    transaction_date_time string), plain-parquet readability at the
    location root (what ParquetHiveSerDe does), and the timeline
    layout HoodieParquetInputFormat walks (hoodie.properties +
    requested/inflight/completed instant triplet with
    HoodieCommitMetadata JSON)."""
    import json as _json

    from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    from pyspark.sql import functions as F

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    # declared at the Glue DDL's types (the notebook's sink table
    # declares ticket_price FLOAT; the view's double narrows on insert)
    view = QUERIES["ticket_view"].fn(
        spark, "/root/testdata/sf0.001"
    ).withColumn("ticket_price", F.col("ticket_price").cast("float"))
    eng.create_upsert_table(
        "ticket_view", str(tmp_path / "tv"), key=["full_name"]
    )
    eng.insert_into("ticket_view", view, commit_id="backfill")
    dest = str(tmp_path / "tv_hudi")
    res = eng.sql(f"EXPORT TABLE ticket_view AS HUDI LOCATION '{dest}'")
    assert res.collect()[0]["data_files"] >= 1

    # 1. column surface == the Glue DDL's storageDescriptor.columns,
    #    in order (ts:458-519's five meta strings + payload types)
    raw = spark.read.parquet(dest)
    glue_columns = [
        ("_hoodie_commit_time", "string"),
        ("_hoodie_commit_seqno", "string"),
        ("_hoodie_record_key", "string"),
        ("_hoodie_partition_path", "string"),
        ("_hoodie_file_name", "string"),
        ("full_name", "string"),
        ("id", "string"),
        ("ticket_price", "float"),
        ("transaction_date_time", "string"),
    ]
    assert [(f.name, f.dataType.simpleString()) for f in raw.schema.fields] \
        == glue_columns

    # 2. plain parquet at the location root (the ParquetHiveSerDe
    #    view) serves exactly the table rows — no stage leftovers, no
    #    stray files a Hive mount would double-read
    want = sorted(map(tuple, view.collect()))
    got = sorted(
        map(tuple, raw.select("full_name", "id", "ticket_price",
                              "transaction_date_time").collect())
    )
    assert got == want
    stray = [
        f for f in os.listdir(dest)
        if not f.endswith(".parquet") and f != ".hoodie"
    ]
    assert stray == []

    # 3. timeline layout: hoodie.properties keys + instant triplet +
    #    commit metadata accounting for every base file
    hoodie = os.path.join(dest, ".hoodie")
    props = dict(
        line.split("=", 1)
        for line in open(os.path.join(hoodie, "hoodie.properties"))
        .read().strip().splitlines()
    )
    assert props["hoodie.table.type"] == "COPY_ON_WRITE"
    assert props["hoodie.table.recordkey.fields"] == "full_name"
    assert props["hoodie.table.name"]
    instants = [
        f[: -len(".commit")] for f in os.listdir(hoodie)
        if f.endswith(".commit")
    ]
    assert len(instants) == 1
    inst = instants[0]
    assert f"{inst}.commit.requested" in os.listdir(hoodie)
    assert f"{inst}.inflight" in os.listdir(hoodie)
    meta = _json.load(open(os.path.join(hoodie, f"{inst}.commit")))
    stats = meta["partitionToWriteStats"][""]
    base_files = [f for f in os.listdir(dest) if f.endswith(".parquet")]
    assert {s["path"] for s in stats} == set(base_files)
    assert all(
        f.split("_")[-1] == f"{inst}.parquet" for f in base_files
    ), "base-file instant suffix must match the commit instant"
