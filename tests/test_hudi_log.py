"""Hudi MoR log-file codec (sources/hudi_log.py) and the real-time
read view it enables (read_hudi merging base parquet with log
blocks) — spec-layout fixtures, cf.
https://hudi.apache.org/tech-specs/#log-file-format and the
reference's MERGE_ON_READ tables (CDC-Hudi-Notebook.zpln:292 ¶7)."""

from __future__ import annotations

import os

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources import hudi_log as HL
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
    export_hudi_cow,
    read_hudi,
)

_SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "_hoodie_record_key", "type": "string"},
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "string"]},
    ],
}


def test_log_codec_round_trip_rollback_and_corrupt_tail():
    b1 = HL.encode_block(
        "avro",
        {HL.INSTANT_TIME: "001"},
        records=[
            {"_hoodie_record_key": "1", "k": 1, "v": "a"},
            {"_hoodie_record_key": "2", "k": 2, "v": "b"},
        ],
        schema=_SCHEMA,
    )
    b2 = HL.encode_block(
        "delete",
        {HL.INSTANT_TIME: "002"},
        records=[{"recordKey": "2", "partitionPath": "", "orderingVal": 5}],
    )
    b3 = HL.encode_block(
        "avro",
        {HL.INSTANT_TIME: "003"},
        records=[{"_hoodie_record_key": "1", "k": 1, "v": "a2"}],
        schema=_SCHEMA,
    )
    rb = HL.encode_block(
        "command",
        {HL.TARGET_INSTANT_TIME: "003", HL.COMMAND_BLOCK_TYPE: "0"},
    )
    blocks = HL.decode_blocks(b1 + b2 + b3 + rb)
    assert [b["type"] for b in blocks] == ["avro", "delete", "avro", "command"]
    assert blocks[0]["records"][1] == {
        "_hoodie_record_key": "2", "k": 2, "v": "b",
    }
    assert blocks[1]["records"][0]["recordKey"] == "2"
    # rollback drops the 003 data block AND the command block itself
    after = HL.apply_rollbacks(blocks)
    assert [
        (b["type"], b["header"].get(HL.INSTANT_TIME)) for b in after
    ] == [("avro", "001"), ("delete", "002")]
    # a truncated trailing block surfaces as corrupt and ends the scan
    broken = HL.decode_blocks(b1 + HL.MAGIC + b"\x00\x01")
    assert [b["type"] for b in broken] == ["avro", "corrupt"]


def _mor_fixture(spark, tmp_path):
    """CoW base (2 keys per file group) + a spec-named log file with
    an upsert, an insert, a delete, and a rolled-back block; every
    visible instant committed on the timeline as a deltacommit."""
    path = str(tmp_path / "mor")
    src = spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")],
        "k long, v string",
    )
    export_hudi_cow(
        src, path, record_key="k", instant="20240601000000000", num_files=1
    )
    base = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
    file_id = base.split("_")[0]
    blocks = [
        HL.encode_block(  # upsert k=2, insert k=9
            "avro",
            {HL.INSTANT_TIME: "20240601000001000"},
            records=[
                {"_hoodie_record_key": "2", "k": 2, "v": "two-v2"},
                {"_hoodie_record_key": "9", "k": 9, "v": "nine"},
            ],
            schema=_SCHEMA,
        ),
        HL.encode_block(  # delete k=3
            "delete",
            {HL.INSTANT_TIME: "20240601000002000"},
            records=[
                {"recordKey": "3", "partitionPath": "", "orderingVal": 0}
            ],
        ),
        HL.encode_block(  # later upsert of k=2 again, then ROLLED BACK
            "avro",
            {HL.INSTANT_TIME: "20240601000003000"},
            records=[
                {"_hoodie_record_key": "2", "k": 2, "v": "two-v3-rolled"}
            ],
            schema=_SCHEMA,
        ),
        HL.encode_block(
            "command",
            {
                HL.TARGET_INSTANT_TIME: "20240601000003000",
                HL.COMMAND_BLOCK_TYPE: "0",
            },
        ),
    ]
    HL.write_log_file(
        os.path.join(
            path, HL.log_file_name(file_id, "20240601000000000")
        ),
        blocks,
    )
    for inst in ("20240601000001000", "20240601000002000"):
        open(os.path.join(path, ".hoodie", f"{inst}.deltacommit"), "w").close()
    return path


def test_read_hudi_merges_log_blocks_real_time_view(spark, tmp_path):
    path = _mor_fixture(spark, tmp_path)
    got = sorted(
        map(tuple, read_hudi(spark, path).select("k", "v").collect())
    )
    # upsert applied, insert visible, delete dropped, rolled-back
    # block invisible
    assert got == [(1, "one"), (2, "two-v2"), (4, "four"), (9, "nine")]
    # read-optimized still serves the base-only columnar view
    ro = sorted(
        map(
            tuple,
            read_hudi(spark, path, read_optimized=True)
            .select("k", "v")
            .collect(),
        )
    )
    assert ro == [(1, "one"), (2, "two"), (3, "three"), (4, "four")]


def test_read_hudi_log_uncommitted_instants_invisible(spark, tmp_path):
    """Blocks whose instant has no completed deltacommit on the
    timeline are in-flight and must not be served (crash
    consistency)."""
    path = _mor_fixture(spark, tmp_path)
    os.remove(
        os.path.join(path, ".hoodie", "20240601000002000.deltacommit")
    )
    got = sorted(
        map(tuple, read_hudi(spark, path).select("k", "v").collect())
    )
    # the delete of k=3 is now in-flight -> row stays visible
    assert got == [
        (1, "one"), (2, "two-v2"), (3, "three"), (4, "four"), (9, "nine"),
    ]


def test_read_hudi_log_time_travel(spark, tmp_path):
    path = _mor_fixture(spark, tmp_path)
    got = sorted(
        map(
            tuple,
            read_hudi(spark, path, as_of="20240601000001000")
            .select("k", "v")
            .collect(),
        )
    )
    # as-of before the delete: k=3 still present, upsert+insert visible
    assert got == [
        (1, "one"), (2, "two-v2"), (3, "three"), (4, "four"), (9, "nine"),
    ]


def test_read_hudi_log_without_record_key_gates(spark, tmp_path):
    """Log merging needs _hoodie_record_key in the base files; a base
    without it still gates rather than mis-merging."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        UnsupportedHudiFeature,
    )

    path = str(tmp_path / "plain")
    os.makedirs(os.path.join(path, ".hoodie"))
    spark.createDataFrame([(1, "x")], "k long, v string").coalesce(
        1
    ).write.parquet(str(tmp_path / "stage"))
    part = [
        f for f in os.listdir(str(tmp_path / "stage")) if f.endswith(".parquet")
    ][0]
    fid = "00000000-0000-0000-0000-000000000000-0"
    os.replace(
        os.path.join(str(tmp_path / "stage"), part),
        os.path.join(path, f"{fid}_0-0-0_20240601000000000.parquet"),
    )
    open(
        os.path.join(path, ".hoodie", "20240601000000000.commit"), "w"
    ).write("{}")
    HL.write_log_file(
        os.path.join(path, HL.log_file_name(fid, "20240601000000000")),
        [
            HL.encode_block(
                "avro",
                {HL.INSTANT_TIME: "20240601000001000"},
                records=[{"_hoodie_record_key": "1", "k": 1, "v": "y"}],
                schema=_SCHEMA,
            )
        ],
    )
    open(
        os.path.join(path, ".hoodie", "20240601000001000.deltacommit"), "w"
    ).close()
    with pytest.raises(UnsupportedHudiFeature, match="record_key"):
        read_hudi(spark, path).collect()


def test_export_hudi_mor_round_trips_uncompacted_state(spark, tmp_path):
    """export_hudi_mor: base at the engine table's first commit + one
    log block per later delta commit (upserts AND deletes), written
    per file group by executors; read_hudi's real-time view
    reproduces the live snapshot, read_optimized the base state."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_mor,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )
    from pyspark.sql import functions as F

    t = UpsertLakeTable(
        spark, str(tmp_path / "src"), key="k", num_buckets=2,
        compact_every=100,
    )
    t.write(
        spark.createDataFrame(
            [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)],
            "k long, v string, x double",
        ),
        commit_id="c1",
    )
    t.write(
        spark.createDataFrame([(2, "B2", 9.0), (4, "d", 4.5)],
                              "k long, v string, x double"),
        commit_id="c2",
    )
    t.write(
        spark.createDataFrame([(3, "c", 0.0)], "k long, v string, x double")
        .withColumn("_del", F.lit(True)),
        commit_id="c3",
        delete_col="_del",
    )
    dest = str(tmp_path / "mor_out")
    res = export_hudi_mor(t, dest, num_files=2)
    assert res["data_files"] >= 1 and res["delta_commits"] == 2
    assert res["log_files"] >= 1

    rt = sorted(
        map(tuple, read_hudi(spark, dest).select("k", "v", "x").collect())
    )
    want = sorted(
        map(tuple, t.snapshot().select("k", "v", "x").collect())
    )
    assert rt == want == [(1, "a", 1.5), (2, "B2", 9.0), (4, "d", 4.5)]
    ro = sorted(
        map(
            tuple,
            read_hudi(spark, dest, read_optimized=True)
            .select("k", "v", "x")
            .collect(),
        )
    )
    # base = state at commit 1
    assert ro == [(1, "a", 1.5), (2, "b", 2.5), (3, "c", 3.5)]


_NOMETA_SCHEMA = {
    "type": "record",
    "name": "rec",
    "fields": [
        {"name": "k", "type": "long"},
        {"name": "v", "type": ["null", "string"]},
    ],
}


def test_read_hudi_mor_base_without_meta_columns(spark, tmp_path):
    """Bases written with hoodie.populate.meta.fields=false carry no
    _hoodie_* columns; the real-time view derives the record key from
    hoodie.table.recordkey.fields and the commit instant from the
    base file NAME — merge, delete, and insert all still apply, and
    the derived key does not leak into the result schema."""
    path = str(tmp_path / "mor_nometa")
    os.makedirs(os.path.join(path, ".hoodie"))
    with open(os.path.join(path, ".hoodie", "hoodie.properties"), "w") as fh:
        fh.write(
            "hoodie.table.name=mor_nometa\n"
            "hoodie.table.type=MERGE_ON_READ\n"
            "hoodie.table.recordkey.fields=k\n"
        )
    inst = "20240601000000000"
    file_id = "00000000-0000-0000-0000-000000000001-0"
    base_name = f"{file_id}_0-0-0_{inst}.parquet"
    spark.createDataFrame(
        [(1, "one"), (2, "two"), (3, "three"), (4, "four")],
        "k long, v string",
    ).toPandas().to_parquet(os.path.join(path, base_name), index=False)
    with open(os.path.join(path, ".hoodie", f"{inst}.commit"), "w") as fh:
        fh.write("{}")
    blocks = [
        HL.encode_block(  # upsert k=2, insert k=9 — NO meta field
            "avro",
            {HL.INSTANT_TIME: "20240601000001000"},
            records=[{"k": 2, "v": "two-v2"}, {"k": 9, "v": "nine"}],
            schema=_NOMETA_SCHEMA,
        ),
        HL.encode_block(  # delete k=3 by its generated key string
            "delete",
            {HL.INSTANT_TIME: "20240601000002000"},
            records=[
                {"recordKey": "3", "partitionPath": "", "orderingVal": 0}
            ],
        ),
    ]
    HL.write_log_file(
        os.path.join(path, HL.log_file_name(file_id, inst)), blocks
    )
    for d in ("20240601000001000", "20240601000002000"):
        open(os.path.join(path, ".hoodie", f"{d}.deltacommit"), "w").close()
    df = read_hudi(spark, path)
    assert "_hoodie_record_key" not in df.columns
    got = sorted(map(tuple, df.select("k", "v").collect()))
    assert got == [(1, "one"), (2, "two-v2"), (4, "four"), (9, "nine")]

    # no recordkey declaration -> pointed gate, base-only still works
    os.rename(
        os.path.join(path, ".hoodie", "hoodie.properties"),
        os.path.join(path, ".hoodie", "hoodie.properties.bak"),
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        UnsupportedHudiFeature,
    )

    with pytest.raises(UnsupportedHudiFeature, match="recordkey"):
        read_hudi(spark, path).collect()
    assert read_hudi(spark, path, read_optimized=True).count() == 4


def test_mor_same_key_across_partition_paths_not_collapsed(
    spark, tmp_path
):
    """ADVICE r6: a non-global Hudi index can hold the SAME record
    key in different partition paths. The real-time merge must scope
    its LWW window and delete matching by partition path — a delete
    logged in one partition must not tombstone (or collapse) the
    key's row in another."""
    path = str(tmp_path / "mor_parts")
    os.makedirs(os.path.join(path, ".hoodie"))
    sch = (
        "_hoodie_record_key string, _hoodie_commit_time string, "
        "k long, v string"
    )
    t1 = "20240601000000000"

    def stage(rows, dest):
        s = dest + ".stage"
        spark.createDataFrame(rows, sch).coalesce(1).write.mode(
            "overwrite"
        ).parquet(s)
        part = [f for f in os.listdir(s) if f.endswith(".parquet")][0]
        os.makedirs(os.path.dirname(dest), exist_ok=True)
        os.replace(os.path.join(s, part), dest)

    fga, fgb = "aaaa1111-0000-0000-0000-000000000000-0", \
               "bbbb2222-0000-0000-0000-000000000000-0"
    stage(
        [("k1", t1, 1, "a-part")],
        os.path.join(path, "p=a", f"{fga}_0-1-0_{t1}.parquet"),
    )
    stage(
        [("k1", t1, 1, "b-part")],
        os.path.join(path, "p=b", f"{fgb}_0-1-0_{t1}.parquet"),
    )
    open(os.path.join(path, ".hoodie", f"{t1}.commit"), "w").close()
    # delete k1 — logged against partition p=a's file group only
    t2 = "20240601000001000"
    HL.write_log_file(
        os.path.join(path, "p=a", HL.log_file_name(fga, t1)),
        [
            HL.encode_block(
                "delete",
                {HL.INSTANT_TIME: t2},
                records=[
                    {"recordKey": "k1", "partitionPath": "p=a",
                     "orderingVal": 1}
                ],
            )
        ],
    )
    open(os.path.join(path, ".hoodie", f"{t2}.deltacommit"), "w").close()
    got = sorted(
        (str(r["p"]), r["v"])
        for r in read_hudi(spark, path).select("p", "v").collect()
    )
    # p=a's k1 tombstoned; p=b's k1 SURVIVES
    assert got == [("b", "b-part")]

def test_delete_hudi_appends_delete_blocks(spark, tmp_path):
    """r11: delete_hudi tombstones matched rows by appending one
    spec-framed delete block per touched file group (creating the
    group's log at its base instant when none exists), completed as
    a .deltacommit; the real-time merge drops the rows, pre-delete
    time travel still serves them, deletes stack, and non-exporter
    layouts refuse."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        UnsupportedHudiFeature,
        delete_hudi,
        export_hudi_mor,
        read_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key="id")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    t.write(mk([(i, f"v{i}") for i in range(10)]), commit_id="c1")
    t.write(mk([(10, "v10"), (3, "V3")]), commit_id="c2")
    path = str(tmp_path / "mor")
    export_hudi_mor(t, path, num_files=3)

    res = delete_hudi(spark, path, "id IN (2, 3, 10)")
    assert res["deleted_keys"] == 3 and res["groups_touched"] >= 1
    got = sorted(r.id for r in read_hudi(spark, path).collect())
    assert got == [i for i in range(10) if i not in (2, 3)]
    # pre-delete instant still serves everything (history preserved)
    pre = read_hudi(
        spark, path, as_of=str(int(res["instant"]) - 1)
    )
    assert sorted(r.id for r in pre.collect()) == sorted(
        list(range(10)) + [10]
    )
    # a broad second delete touches EVERY group, including ones whose
    # log the first delete had to create
    res2 = delete_hudi(spark, path, "id >= 0")
    assert res2["groups_touched"] == 3
    assert read_hudi(spark, path).count() == 0
    # no-match delete is a no-op (no instant committed)
    assert delete_hudi(spark, path, "id = 999")["instant"] is None
    # a foreign layout (base file ids not from this exporter) refuses
    import os
    import shutil

    p2 = str(tmp_path / "foreign")
    shutil.copytree(path, p2)
    for root, _d, fs in os.walk(p2):
        for f in fs:
            if f.endswith(".parquet") and "_" in f:
                os.rename(
                    os.path.join(root, f),
                    os.path.join(root, "deadbeef" + f[8:]),
                )
    with pytest.raises(UnsupportedHudiFeature, match="exporter"):
        delete_hudi(spark, p2, "id = 1")


def test_delete_hudi_routing_with_empty_trailing_group(spark, tmp_path):
    """r12 (r11 ADVICE): the key→file-group modulus comes from the
    exporter's persisted ``hoodie.bucket.index.num.buckets``, not
    from the count of base files on disk — when the exporter's
    trailing hash partition was empty (no base file written),
    ``len(slices) < num_files`` would silently mis-route every key."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        _export_num_buckets,
        delete_hudi,
        export_hudi_cow,
        live_file_slices,
        read_hudi,
    )
    from pyspark.sql import functions as F

    # find a num_files where a small key set leaves the TRAILING
    # hash partition empty (pmod(hash(id), n) never hits n-1)
    keys = list(range(1, 8))
    kdf = spark.createDataFrame([(k,) for k in keys], "id long")
    n = None
    for cand in range(4, 33):
        pids = {
            r[0]
            for r in kdf.select(
                F.pmod(F.hash("id"), F.lit(cand))
            ).collect()
        }
        if cand - 1 not in pids:
            n = cand
            break
    assert n is not None, "no candidate modulus with empty tail found"

    path = str(tmp_path / "cow_gap")
    df = spark.createDataFrame([(k, f"v{k}") for k in keys], "id long, v string")
    export_hudi_cow(df, path, record_key="id", num_files=n)
    assert _export_num_buckets(path) == n  # persisted at export
    assert len(live_file_slices(path)) < n  # the gap this guards

    res = delete_hudi(spark, path, "id IN (1, 5, 7)")
    assert res["deleted_keys"] == 3
    assert sorted(r.id for r in read_hudi(spark, path).collect()) == [
        2, 3, 4, 6,
    ]

    # legacy export without the persisted property: contiguous pids
    # fall back to max(pid)+1; the table still mutates correctly when
    # no trailing group was empty
    path2 = str(tmp_path / "cow_legacy")
    export_hudi_cow(df, path2, record_key="id", num_files=2)
    props = open(f"{path2}/.hoodie/hoodie.properties").read()
    with open(f"{path2}/.hoodie/hoodie.properties", "w") as fh:
        fh.write(
            "\n".join(
                ln
                for ln in props.splitlines()
                if not ln.startswith("hoodie.bucket.index.num.buckets")
            )
            + "\n"
        )
    assert _export_num_buckets(path2) is None
    res2 = delete_hudi(spark, path2, "id = 2")
    assert res2["deleted_keys"] == 1
    assert sorted(r.id for r in read_hudi(spark, path2).collect()) == [
        1, 3, 4, 5, 6, 7,
    ]


def test_upsert_hudi_appends_data_blocks(spark, tmp_path):
    """r12: upsert_hudi appends one spec-framed Avro DATA block per
    touched file group's log, completed as a .deltacommit; the
    real-time merge serves updates LWW and new keys as inserts
    (including keys routed to a base-less group → log-only file
    slice); pre-upsert time travel still serves the old rows;
    read-optimized ignores the logs; duplicate keys in one batch
    raise; schema mismatches refuse."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        UnsupportedHudiFeature,
        delete_hudi,
        export_hudi_mor,
        read_hudi,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key="id")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    t.write(mk([(i, f"v{i}") for i in range(8)]), commit_id="c1")
    path = str(tmp_path / "mor")
    export_hudi_mor(t, path, num_files=3)

    # update 2 existing keys + insert 2 new ones
    res = upsert_hudi(
        spark, path, mk([(1, "V1"), (3, "V3"), (100, "v100"), (101, "v101")])
    )
    assert res["upserted_rows"] == 4 and res["groups_touched"] >= 1
    got = {(r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()}
    want = {(i, f"v{i}") for i in range(8) if i not in (1, 3)}
    want |= {(1, "V1"), (3, "V3"), (100, "v100"), (101, "v101")}
    assert got == want
    # pre-upsert instant serves the original rows
    pre = read_hudi(spark, path, as_of=str(int(res["instant"]) - 1))
    assert {(r.id, r.v) for r in pre.select("id", "v").collect()} == {
        (i, f"v{i}") for i in range(8)
    }
    # read-optimized view ignores the log blocks
    ro = read_hudi(spark, path, read_optimized=True)
    assert {(r.id, r.v) for r in ro.select("id", "v").collect()} == {
        (i, f"v{i}") for i in range(8)
    }
    # upserts stack LWW, and delete_hudi tombstones upserted keys
    upsert_hudi(spark, path, mk([(1, "V1b")]))
    assert {
        r.v for r in read_hudi(spark, path).filter("id = 1").collect()
    } == {"V1b"}
    delete_hudi(spark, path, "id IN (100, 1)")
    got2 = sorted(r.id for r in read_hudi(spark, path).collect())
    assert got2 == [0, 2, 3, 4, 5, 6, 7, 101]
    # duplicate keys in one batch raise
    with _pytest.raises(Exception, match="key-unique"):
        upsert_hudi(spark, path, mk([(5, "a"), (5, "b")]))
    # payload schema mismatch refuses
    bad = spark.createDataFrame([(1, "x", 2.0)], "id long, v string, z double")
    with _pytest.raises(UnsupportedHudiFeature, match="payload"):
        upsert_hudi(spark, path, bad)


def test_upsert_hudi_new_key_in_empty_group_is_log_only_slice(
    spark, tmp_path
):
    """r12: a new key hashing to a file group whose base hash
    partition was empty at export starts a LOG-ONLY file slice —
    served by the real-time view, invisible to read-optimized."""
    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
        read_hudi,
        upsert_hudi,
    )

    # modulus with an EMPTY trailing partition for the seed keys, and
    # a probe key that hashes INTO that empty partition
    seed = list(range(1, 8))
    n, probe = None, None
    for cand in range(4, 33):
        pids = {
            r[0]
            for r in spark.createDataFrame([(k,) for k in seed], "id long")
            .select(F.pmod(F.hash("id"), F.lit(cand)))
            .collect()
        }
        if cand - 1 in pids:
            continue
        for c in range(1000, 1200):
            pid = spark.createDataFrame([(c,)], "id long").select(
                F.pmod(F.hash("id"), F.lit(cand))
            ).collect()[0][0]
            if pid == cand - 1:
                n, probe = cand, c
                break
        if n:
            break
    assert n is not None and probe is not None

    path = str(tmp_path / "cow_gap_upsert")
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in seed], "id long, v string"
    )
    export_hudi_cow(df, path, record_key="id", num_files=n)
    res = upsert_hudi(
        spark,
        path,
        spark.createDataFrame([(probe, "vp")], "id long, v string"),
    )
    assert res["upserted_rows"] == 1
    got = {(r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()}
    assert got == {(k, f"v{k}") for k in seed} | {(probe, "vp")}
    ro = read_hudi(spark, path, read_optimized=True)
    assert ro.count() == len(seed)


def test_compact_hudi_materializes_logs(spark, tmp_path):
    """r12: compact_hudi rewrites every LOGGED file group's real-time
    view as a new base file at a fresh .commit instant — after it the
    read-optimized view equals the real-time one, pre-compaction time
    travel still merges the old base + logs, later DML attaches logs
    at the new base instant, and a log-free table no-ops."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        delete_hudi,
        export_hudi_cow,
        read_hudi,
        upsert_hudi,
    )

    path = str(tmp_path / "mor_compact")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_hudi_cow(
        mk([(i, f"v{i}") for i in range(8)]), path, record_key="id",
        num_files=3,
    )
    # log-free: no-op, no instant
    assert compact_hudi(spark, path)["instant"] is None

    upsert_hudi(spark, path, mk([(1, "U1"), (100, "v100")]))
    res_del = delete_hudi(spark, path, "id IN (2, 100)")
    want = {(i, f"v{i}") for i in range(8) if i not in (1, 2)} | {(1, "U1")}
    res = compact_hudi(spark, path)
    assert res["compacted_groups"] >= 1 and res["rows"] >= 1
    rt = {(r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()}
    ro = {
        (r.id, r.v)
        for r in read_hudi(spark, path, read_optimized=True)
        .select("id", "v")
        .collect()
    }
    assert rt == want and ro == want
    # pre-compaction instant still merges old base + logs
    pre = read_hudi(spark, path, as_of=res_del["instant"])
    assert {(r.id, r.v) for r in pre.select("id", "v").collect()} == want
    # pre-DML instant serves the original rows
    pre0 = read_hudi(spark, path, as_of=str(int(res_del["instant"]) - 2))
    assert {(r.id, r.v) for r in pre0.select("id", "v").collect()} == {
        (i, f"v{i}") for i in range(8)
    }
    # later DML attaches logs at the NEW base instant and merges
    upsert_hudi(spark, path, mk([(3, "U3")]))
    delete_hudi(spark, path, "id = 0")
    want2 = (want - {(3, "v3"), (0, "v0")}) | {(3, "U3")}
    assert {
        (r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()
    } == want2
    # and compaction of the new logs converges again
    compact_hudi(spark, path)
    assert {
        (r.id, r.v)
        for r in read_hudi(spark, path, read_optimized=True)
        .select("id", "v")
        .collect()
    } == want2


def test_clean_hudi_reclaims_old_slices(spark, tmp_path):
    """r12: clean_hudi deletes file slices older than the retained
    commit window (base files + their attached logs); reads and time
    travel inside the window are unaffected; travel before it raises
    the reader's clear error; disk shrinks."""
    import os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        clean_hudi,
        compact_hudi,
        export_hudi_cow,
        read_hudi,
        upsert_hudi,
    )

    path = str(tmp_path / "mor_clean")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_hudi_cow(
        mk([(i, f"v{i}") for i in range(6)]), path, record_key="id",
        num_files=2,
    )
    # two upsert+compact cycles -> three slice generations per group
    upsert_hudi(spark, path, mk([(1, "U1")]))
    c1 = compact_hudi(spark, path)
    upsert_hudi(spark, path, mk([(2, "U2")]))
    c2 = compact_hudi(spark, path)

    def n_files():
        return sum(
            1
            for f in os.listdir(path)
            if f.endswith(".parquet") or ".log." in f
        )

    before = n_files()
    want = {(0, "v0"), (1, "U1"), (2, "U2"), (3, "v3"), (4, "v4"), (5, "v5")}
    res = clean_hudi(path, retain_commits=2)
    assert res["base_files"] >= 1 and n_files() < before
    got = {(r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()}
    assert got == want
    # the newest retained instants still time-travel
    pre = read_hudi(spark, path, as_of=c2["instant"])
    assert {(r.id, r.v) for r in pre.select("id", "v").collect()} == want
    # travel before the retained window raises clearly
    with pytest.raises(FileNotFoundError, match="no committed base"):
        first = sorted(
            f.split(".")[0]
            for f in os.listdir(os.path.join(path, ".hoodie"))
            if f.endswith(".commit")
        )[0]
        read_hudi(spark, path, as_of=str(int(first) - 1)).collect()
    # idempotent: a second clean removes nothing more
    res2 = clean_hudi(path, retain_commits=2)
    assert res2["base_files"] == 0 and res2["log_files"] == 0


def test_rollback_hudi_point_in_time_recovery(spark, tmp_path):
    """r12: rollback_hudi undoes every instant after the target —
    base files of rolled commits deleted, their log blocks killed by
    appended rollback command blocks, timeline markers removed; the
    table serves exactly the target-instant state; earlier time
    travel untouched; rolled instants gone; unknown targets raise."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        delete_hudi,
        export_hudi_cow,
        read_hudi,
        rollback_hudi,
        upsert_hudi,
        completed_instants,
        _log_completed_instants,
    )

    path = str(tmp_path / "mor_rb")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_hudi_cow(
        mk([(i, f"v{i}") for i in range(6)]), path, record_key="id",
        num_files=2,
    )
    r_ups = upsert_hudi(spark, path, mk([(1, "U1"), (50, "v50")]))
    r_del = delete_hudi(spark, path, "id = 2")
    compact_hudi(spark, path)
    post_all = {(r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()}
    want_all = {(i, f"v{i}") for i in range(6) if i not in (1, 2)} | {
        (1, "U1"), (50, "v50"),
    }
    assert post_all == want_all

    # roll back to the upsert instant: delete + compaction undone
    res = rollback_hudi(path, r_ups["instant"])
    assert len(res["rolled_back"]) == 2 and res["base_files"] >= 1
    got = {(r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()}
    assert got == {(i, f"v{i}") for i in range(6) if i != 1} | {
        (1, "U1"), (50, "v50"),
    }
    assert r_del["instant"] not in _log_completed_instants(path)
    # earlier time travel untouched
    pre = read_hudi(spark, path, as_of=str(int(r_ups["instant"]) - 1))
    assert {(r.id, r.v) for r in pre.select("id", "v").collect()} == {
        (i, f"v{i}") for i in range(6)
    }
    # rolling back the upsert too returns to the export state
    rollback_hudi(path, completed_instants(path)[0])
    assert {
        (r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()
    } == {(i, f"v{i}") for i in range(6)}
    # further writes after a rollback work (fresh instants)
    upsert_hudi(spark, path, mk([(0, "Z")]))
    assert {
        r.v for r in read_hudi(spark, path).filter("id = 0").collect()
    } == {"Z"}
    with pytest.raises(ValueError, match="not a completed instant"):
        rollback_hudi(path, "19990101000000000")


def test_hudi_composite_record_key_dml(spark, tmp_path):
    """r13 (VERDICT ask #2): COMPOSITE (multi-field) record keys on
    exported-Hudi DML — export with a two-field key, then upsert
    (update + insert + delete leg), delete_hudi, and compact_hudi.
    The materialized ``_hoodie_record_key`` and the delete blocks
    must carry the Complex key generator's ``f1:v1,f2:v2`` encoding
    (hudi.apache.org/tech-specs record-key encoding), and LWW /
    tombstone matching must scope per composite key."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources import hudi_log as HL
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        delete_hudi,
        export_hudi_mor,
        read_hudi,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    sch = "k1 long, k2 string, v string"
    mk = lambda rows: spark.createDataFrame(rows, sch)
    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key=["k1", "k2"])
    # two rows share k1=1 — only the composite key separates them
    seed = [(1, "a", "v1a"), (1, "b", "v1b"), (2, "a", "v2a"),
            (3, "c", "v3c")]
    t.write(mk(seed), commit_id="c1")
    path = str(tmp_path / "mor")
    export_hudi_mor(t, path, num_files=3)

    # golden: the meta column carries the Complex spec encoding
    keys = {
        r._hoodie_record_key
        for r in read_hudi(spark, path)
        .select("_hoodie_record_key")
        .collect()
    }
    assert keys == {"k1:1,k2:a", "k1:1,k2:b", "k1:2,k2:a", "k1:3,k2:c"}

    # upsert: update (1,a), insert (9,z); delete leg tombstones (1,b)
    res = upsert_hudi(
        spark,
        path,
        mk([(1, "a", "V1A"), (9, "z", "v9z")]),
        deletes=spark.createDataFrame(
            [(1, "b")], "k1 long, k2 string"
        ),
    )
    assert res["upserted_rows"] == 2 and res["deleted_keys"] == 1
    got = {
        (r.k1, r.k2, r.v)
        for r in read_hudi(spark, path).select("k1", "k2", "v").collect()
    }
    assert got == {
        (1, "a", "V1A"), (2, "a", "v2a"), (3, "c", "v3c"),
        (9, "z", "v9z"),
    }

    # golden: delete blocks on disk carry the Complex recordKey string
    del_keys = set()
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != ".hoodie"]
        for f in files:
            if ".log." not in f:
                continue
            blocks = HL.decode_blocks(
                open(os.path.join(root, f), "rb").read()
            )
            for b in blocks:
                if b["type"] == "delete":
                    del_keys |= {r["recordKey"] for r in b["records"]}
    assert del_keys == {"k1:1,k2:b"}

    # predicate delete + compaction converge read-optimized == real-time
    delete_hudi(spark, path, "k1 = 2")
    compact_hudi(spark, path)
    ro = {
        (r.k1, r.k2, r.v)
        for r in read_hudi(spark, path, read_optimized=True)
        .select("k1", "k2", "v")
        .collect()
    }
    rt = {
        (r.k1, r.k2, r.v)
        for r in read_hudi(spark, path).select("k1", "k2", "v").collect()
    }
    assert ro == rt == {(1, "a", "V1A"), (3, "c", "v3c"), (9, "z", "v9z")}
    # duplicate COMPOSITE keys in one batch still raise
    with pytest.raises(Exception, match="key-unique"):
        upsert_hudi(spark, path, mk([(5, "x", "p"), (5, "x", "q")]))


def test_hudi_partitioned_export_and_dml(spark, tmp_path):
    """r13 (VERDICT ask #3): hive-partitioned MoR export + partition-
    aware DML. Base files live under col=val dirs with per-partition
    file groups; upsert_hudi routes each row to ITS partition's group
    (non-global index), deletes carry partition columns, and with
    update_partition_path=True a key whose partition value changed
    MOVES (old partition tombstoned in the same instant — Hudi's
    GLOBAL index with bloom.index.update.partition.path=true).
    compact_hudi folds per-partition logs; partition pruning reaches
    the parquet scan."""
    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        delete_hudi,
        export_hudi_mor,
        read_hudi,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    sch = "id long, region string, v string"
    mk = lambda rows: spark.createDataFrame(rows, sch)
    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key="id")
    seed = [(i, "EU" if i % 2 else "US", f"v{i}") for i in range(10)]
    t.write(mk(seed), commit_id="c1")
    # a delta commit rides as log blocks in the partition dirs
    t.write(mk([(0, "US", "v0b"), (20, "EU", "v20")]), commit_id="c2")
    path = str(tmp_path / "mor")
    export_hudi_mor(t, path, num_files=2, partition_by="region")

    # hive layout on disk: region=EU / region=US dirs, no root bases
    assert os.path.isdir(os.path.join(path, "region=EU"))
    assert os.path.isdir(os.path.join(path, "region=US"))
    assert not any(
        f.endswith(".parquet") for f in os.listdir(path)
    )
    want = {(i, "EU" if i % 2 else "US", f"v{i}") for i in range(1, 10)}
    want |= {(0, "US", "v0b"), (20, "EU", "v20")}
    got = {
        (r.id, r.region, r.v)
        for r in read_hudi(spark, path).select("id", "region", "v").collect()
    }
    assert got == want

    # partition pruning: the filtered scan plans only the EU dir's files
    pruned = read_hudi(spark, path, read_optimized=True).filter(
        "region = 'EU'"
    )
    scanned = pruned.select(
        F.input_file_name().alias("f")
    ).distinct().collect()
    assert scanned and all("region=EU" in r.f for r in scanned)
    assert {r.region for r in pruned.collect()} == {"EU"}

    # non-global upsert: row lands in its own partition's file group
    res = upsert_hudi(spark, path, mk([(1, "EU", "V1"), (30, "US", "v30")]))
    assert res["groups_touched"] >= 1
    got = {
        (r.id, r.region, r.v)
        for r in read_hudi(spark, path).select("id", "region", "v").collect()
    }
    assert (1, "EU", "V1") in got and (30, "US", "v30") in got

    # deletes on a partitioned table must carry the partition columns
    with pytest.raises(ValueError, match="partition"):
        upsert_hudi(
            spark, path, None,
            deletes=spark.createDataFrame([(3,)], "id long"),
        )
    upsert_hudi(
        spark, path, None,
        deletes=spark.createDataFrame([(3, "EU")], "id long, region string"),
    )
    assert 3 not in {
        r.id for r in read_hudi(spark, path).select("id").collect()
    }

    # WITHOUT update_partition_path a changed partition value DUPES
    # the key across partitions (non-global index semantics) …
    upsert_hudi(spark, path, mk([(5, "US", "v5-moved")]))
    rows5 = {
        (r.region, r.v)
        for r in read_hudi(spark, path).filter("id = 5").collect()
    }
    assert rows5 == {("EU", "v5"), ("US", "v5-moved")}
    # … and WITH it the key MOVES: old partition copy tombstoned
    upsert_hudi(
        spark, path, mk([(7, "US", "v7-moved")]),
        update_partition_path=True,
    )
    rows7 = {
        (r.region, r.v)
        for r in read_hudi(spark, path).filter("id = 7").collect()
    }
    assert rows7 == {("US", "v7-moved")}

    # predicate delete routes per partition; compaction converges views
    delete_hudi(spark, path, "id >= 20")
    compact_hudi(spark, path)
    ro = {
        (r.id, r.region, r.v)
        for r in read_hudi(spark, path, read_optimized=True)
        .select("id", "region", "v").collect()
    }
    rt = {
        (r.id, r.region, r.v)
        for r in read_hudi(spark, path).select("id", "region", "v").collect()
    }
    assert ro == rt
    assert (5, "EU", "v5") in ro and (5, "US", "v5-moved") in ro
    assert (7, "US", "v7-moved") in ro
    assert not any(i >= 20 for i, _r, _v in ro)
    assert 3 not in {i for i, _r, _v in ro}


def test_update_hudi_standalone(spark, tmp_path):
    """r13: update_hudi — the standalone API twin of
    update_delta/update_iceberg (the shape that previously existed
    only behind UPDATE hudi.`path` SQL routing) — evaluates the
    predicate over the real-time view and commits ONE keyed-upsert
    delta commit of the rewritten rows; record-key SETs and unknown
    columns refuse."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_mor,
        read_hudi,
        update_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key="id")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    t.write(mk([(i, f"v{i}") for i in range(8)]), commit_id="c1")
    path = str(tmp_path / "mor")
    export_hudi_mor(t, path, num_files=3)

    res = update_hudi(spark, path, "id >= 5", {"v": "upper(v)"})
    assert res["updated_rows"] == 3 and res["instant"]
    got = {(r.id, r.v) for r in read_hudi(spark, path).select("id", "v").collect()}
    assert got == {(i, f"v{i}") for i in range(5)} | {
        (i, f"V{i}") for i in range(5, 8)
    }
    # no-match predicate: no instant, zero rows
    res0 = update_hudi(spark, path, "id > 999", {"v": "'x'"})
    assert res0["updated_rows"] == 0
    with _pytest.raises(ValueError, match="record-key"):
        update_hudi(spark, path, "true", {"id": "id + 1"})
    with _pytest.raises(ValueError, match="unknown columns"):
        update_hudi(spark, path, "true", {"zz": "1"})


def test_export_file_count_immune_to_prepartitioned_input(spark, tmp_path):
    """r13 fix: Catalyst elides repartition(N, keys) when the input
    is already hashpartitioned(keys, N) (an engine snapshot under
    shuffle_partitions == num_files) and AQE then coalesces the
    surviving exchange — with physical-partition-id file numbering
    the export wrote ONE base while persisting num.buckets = N. The
    _pid DATA column keys file groups by VALUE, so the layout is
    immune to plan-level partition elision/coalescing; compaction
    uses the same assignment."""
    import os

    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        compact_hudi,
        export_hudi_mor,
        read_hudi,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    # num_files == the session's shuffle_partitions reproduces the
    # elided-repartition shape exactly (derived from the live conf so
    # the shape stays exercised whatever the test session runs at)
    nf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key="id")
    df = spark.range(200).select(
        F.col("id"), F.concat(F.lit("v"), F.col("id")).alias("v")
    )
    t.write(df, commit_id="c1")
    path = str(tmp_path / "mor")
    res = export_hudi_mor(t, path, num_files=nf)
    assert res["data_files"] == nf
    bases = [
        f
        for _r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    assert len(bases) == nf
    assert read_hudi(spark, path).count() == 200
    # compaction keeps the nf-group layout (same _pid assignment)
    upsert_hudi(
        spark,
        path,
        spark.createDataFrame(
            [(i, f"U{i}") for i in range(0, 200, 10)], "id long, v string"
        ),
    )
    out = compact_hudi(spark, path)
    assert out["compacted_groups"] >= 1
    rt = read_hudi(spark, path)
    assert rt.count() == 200
    assert len(rt.inputFiles()) == nf
    got = {(r.id, r.v) for r in rt.select("id", "v").collect()}
    want = {
        (i, f"U{i}" if i % 10 == 0 else f"v{i}") for i in range(200)
    }
    assert got == want
