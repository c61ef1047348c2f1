"""UniForm-style export: one parquet dataset, two formats' metadata —
both readers must mount the SAME files and return identical rows."""

from __future__ import annotations

import json
import os

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import read_delta
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
    live_data_files,
    read_iceberg,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import export_uniform

from .conftest import SF_SMOKE


def test_uniform_export_both_readers_same_rows(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "uniform_nation")
    n = export_uniform(src, path, name="nation")
    assert n >= 1
    want = sorted(map(tuple, src.collect()))
    got_delta = sorted(map(tuple, read_delta(spark, path).collect()))
    got_ice = sorted(map(tuple, read_iceberg(spark, path).collect()))
    assert got_delta == want
    assert got_ice == want
    # both formats' metadata genuinely name the SAME files
    with open(os.path.join(path, "_delta_log", "%020d.json" % 0)) as fh:
        delta_files = sorted(
            os.path.join(path, json.loads(l)["add"]["path"])
            for l in fh
            if '"add"' in l
        )
    assert delta_files == live_data_files(path)
    # one copy of the data on disk (no per-format duplication)
    assert (
        len(
            [
                f
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith("_")
            ]
        )
        == n
    )
    assert not os.path.exists(os.path.join(path, "data"))


def test_uniform_rejects_incompatible_options(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import export_delta
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
    )

    df = load_table(spark, SF_SMOKE, "region")
    with pytest.raises(ValueError, match="column_mapping"):
        export_delta(
            df,
            str(tmp_path / "x"),
            column_mapping=True,
            data_files=["a.parquet"],
        )
    # identity partitions are now allowed in injection mode (r9);
    # bucket transforms still refuse (the hash value is not in the path)
    with pytest.raises(ValueError, match="identity"):
        export_iceberg(
            df,
            str(tmp_path / "y"),
            partition_by=["bucket(4, r_regionkey)"],
            data_files=["a.parquet"],
        )
    # injected identity partitions need the col=value path segment
    with pytest.raises(ValueError, match="partition path segment"):
        export_iceberg(
            df,
            str(tmp_path / "y2"),
            partition_by=["r_regionkey"],
            data_files=["a.parquet"],
        )


def test_uniform_partitioned_both_views_prune_and_agree(spark, tmp_path):
    """VERDICT r8 ask #5: partitioned UniForm — ONE hive-layout
    parquet write under BOTH formats' metadata. A partition filter on
    EACH view must scan only that partition's files (asserted via the
    scan's inputFiles), and the two full views must return identical
    rows."""
    from pyspark.sql import functions as F

    src = (
        load_table(spark, SF_SMOKE, "nation")
        .withColumn("grp", F.when(F.col("n_regionkey") < 2, "lo").otherwise("hi"))
        .select("n_nationkey", "n_name", "grp")
    )
    path = str(tmp_path / "uniform_part")
    n = export_uniform(src, path, name="nation_p", partition_by=["grp"])
    assert n >= 2  # at least one file per partition value
    want = sorted(map(tuple, src.collect()))
    d = read_delta(spark, path)
    i = read_iceberg(spark, path)
    assert sorted(tuple(r) for r in d.select("n_nationkey", "n_name", "grp").collect()) == want
    assert sorted(tuple(r) for r in i.select("n_nationkey", "n_name", "grp").collect()) == want
    # pruning, Delta view: the filtered plan's scan legs cover only
    # the lo partition's files
    lo_files = {
        os.path.join(path, rel)
        for rel in (
            json.loads(l)["add"]["path"]
            for l in open(os.path.join(path, "_delta_log", "%020d.json" % 0))
            if '"add"' in l
        )
        if "grp=lo" in rel
    }
    got_d = {f.replace("file://", "").replace("file:", "")
             for f in d.filter("grp = 'lo'").inputFiles()}
    assert got_d == lo_files and 0 < len(lo_files) < n
    # pruning, Iceberg view: manifest-level partition_filter
    ip = read_iceberg(spark, path, partition_filter={"grp": "lo"})
    got_i = {f.replace("file://", "").replace("file:", "")
             for f in ip.inputFiles()}
    assert got_i == lo_files
    assert sorted(tuple(r) for r in ip.select("n_nationkey", "n_name", "grp").collect()) == sorted(
        t for t in want if t[2] == "lo"
    )


def test_uniform_append_advances_both_views_in_lockstep(spark, tmp_path):
    """r9: incremental UniForm — mode='append' lands NEW files beside
    the old and commits the next Delta log version AND the next
    Iceberg snapshot over exactly those files. Both views serve the
    union; the Iceberg incremental read serves ONLY the appended
    rows; time travel to snapshot 1 serves only the base."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg_incremental,
        snapshots,
    )

    base = load_table(spark, SF_SMOKE, "region")
    extra = spark.createDataFrame(
        [(90, "MOON"), (91, "MARS")],
        base.schema,
    )
    path = str(tmp_path / "uniform_inc")
    n1 = export_uniform(base, path, name="region_u")
    snap1 = snapshots(path)[-1]["snapshot_id"]
    n2 = export_uniform(extra, path, name="region_u", mode="append")
    assert n1 >= 1 and n2 >= 1
    want = sorted(map(tuple, base.collect()) , key=str) + sorted(
        map(tuple, extra.collect()), key=str
    )
    want = sorted(want, key=str)
    got_d = sorted(map(tuple, read_delta(spark, path).collect()), key=str)
    got_i = sorted(map(tuple, read_iceberg(spark, path).collect()), key=str)
    assert got_d == want and got_i == want
    # delta log: version 1 exists and carries ONLY add actions
    v1 = os.path.join(path, "_delta_log", "%020d.json" % 1)
    acts = [json.loads(l) for l in open(v1) if l.strip()]
    assert acts and all("add" in a for a in acts)
    # iceberg: two snapshots, parent chain, incremental = appended rows
    snaps = snapshots(path)
    assert len(snaps) == 2
    inc = read_iceberg_incremental(spark, path, snap1)
    assert sorted(map(tuple, inc.collect()), key=str) == sorted(
        map(tuple, extra.collect()), key=str
    )
    old = read_iceberg(spark, path, snapshot_id=snap1)
    assert sorted(map(tuple, old.collect()), key=str) == sorted(
        map(tuple, base.collect()), key=str
    )
    # schema drift refuses on both exporters
    bad = extra.withColumnRenamed("r_name", "nope")
    with pytest.raises(Exception, match="schema"):
        export_uniform(bad, path, mode="append")


def test_uniform_append_partitioned_keeps_pruning(spark, tmp_path):
    """Appended partitions join the shared hive layout; a partition
    filter on each view still scans only that partition's files."""
    from pyspark.sql import functions as F

    src = (
        load_table(spark, SF_SMOKE, "nation")
        .withColumn("grp", F.lit("lo"))
        .select("n_nationkey", "n_name", "grp")
    )
    extra = (
        load_table(spark, SF_SMOKE, "nation")
        .withColumn("grp", F.lit("hi"))
        .withColumn("n_nationkey", F.col("n_nationkey") + 100)
        .select("n_nationkey", "n_name", "grp")
    )
    path = str(tmp_path / "uniform_inc_part")
    export_uniform(src, path, partition_by=["grp"])
    export_uniform(extra, path, partition_by=["grp"], mode="append")
    d = read_delta(spark, path)
    i = read_iceberg(spark, path)
    n_all = len(set(i.inputFiles()))
    hi_i = read_iceberg(spark, path, partition_filter={"grp": "hi"})
    assert 0 < len(set(hi_i.inputFiles())) < n_all
    assert sorted(r.n_nationkey for r in hi_i.collect()) == sorted(
        r.n_nationkey for r in extra.collect()
    )
    hi_d = d.filter("grp = 'hi'")
    assert {f.rsplit("/", 2)[-2] for f in hi_d.inputFiles()} == {"grp=hi"}
    assert sorted(r.n_nationkey for r in hi_d.collect()) == sorted(
        r.n_nationkey for r in extra.collect()
    )


def test_uniform_optimize_compacts_both_views(spark, tmp_path):
    """r10: optimize_uniform bin-packs BOTH formats' views over ONE
    rewritten parquet set — rows unchanged in each view, both scan
    exactly the same single file afterwards, incremental reads across
    the compaction refuse (data really moved), appends keep working,
    and partitioned tables refuse."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        UnsupportedIcebergFeature,
        read_iceberg_incremental,
        snapshots,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        optimize_uniform,
    )

    path = str(tmp_path / "uniform_opt")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_uniform(mk([(1, "a"), (2, "b")]), path)
    sid0 = snapshots(path)[-1]["snapshot_id"]
    export_uniform(mk([(3, "c")]), path, mode="append")
    export_uniform(mk([(4, "d")]), path, mode="append")
    res = optimize_uniform(spark, path)
    assert res["files_after"] == 1 and res["files_before"] > 1
    want = [(1, "a"), (2, "b"), (3, "c"), (4, "d")]
    d = read_delta(spark, path)
    i = read_iceberg(spark, path)
    assert sorted(map(tuple, d.collect())) == want
    assert sorted(map(tuple, i.collect())) == want
    # the pinned scan-count contract: ONE file, the SAME file
    assert len(d.inputFiles()) == 1 and d.inputFiles() == i.inputFiles()
    assert snapshots(path)[-1]["summary"]["operation"] == "replace"
    with _pytest.raises(UnsupportedIcebergFeature, match="non-append"):
        read_iceberg_incremental(spark, path, sid0)
    # idempotent: already compact -> no new commit
    assert optimize_uniform(spark, path)["files_before"] == 1
    # appends continue in lockstep afterwards
    export_uniform(mk([(5, "e")]), path, mode="append")
    assert sorted(map(tuple, read_delta(spark, path).collect())) == (
        want + [(5, "e")]
    )
    assert sorted(map(tuple, read_iceberg(spark, path).collect())) == (
        want + [(5, "e")]
    )
    # partitioned uniform compacts too (r10): one file per hive dir,
    # BOTH views prune to it, lockstep preserved
    p2 = str(tmp_path / "uniform_opt_part")
    export_uniform(
        mk([(1, "a"), (2, "b"), (3, "a")]), p2, partition_by=["v"]
    )
    export_uniform(mk([(4, "b")]), p2, partition_by=["v"],
                   mode="append")
    res2 = optimize_uniform(spark, p2)
    assert res2["files_after"] == 2  # one per partition value
    want2 = [(1, "a"), (2, "b"), (3, "a"), (4, "b")]
    d2 = read_delta(spark, p2)
    i2 = read_iceberg(spark, p2)
    assert sorted(map(tuple, d2.collect())) == want2
    assert sorted(map(tuple, i2.collect())) == want2
    assert sorted(d2.inputFiles()) == sorted(i2.inputFiles())
    assert len(d2.filter("v = 'a'").inputFiles()) == 1
    ip = read_iceberg(spark, p2, partition_filter={"v": "a"})
    assert sorted(r[0] for r in ip.select("id").collect()) == [1, 3]
    assert len(ip.inputFiles()) == 1
    # already one-per-partition: second run is a no-op
    assert optimize_uniform(spark, p2)["files_before"] == 2


def test_uniform_random_append_sequences_stay_lockstep(spark, tmp_path):
    """r9 model check: after EVERY append in a random sequence, the
    Delta view, the Iceberg view, and the model multiset agree, and
    the Iceberg incremental read from each earlier snapshot serves
    exactly the rows appended after it."""
    import random
    from collections import Counter

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg_incremental,
        snapshots,
    )

    rng = random.Random(7)
    path = str(tmp_path / "uniform_model")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    nid = 0

    def fresh(n):
        nonlocal nid
        out = [(nid + i, f"v{nid + i}") for i in range(n)]
        nid += n
        return out

    base = fresh(3)
    export_uniform(mk(base), path)
    total = Counter(base)
    deltas = [(snapshots(path)[-1]["snapshot_id"], Counter(base))]
    for _ in range(5):
        rows = fresh(rng.randint(1, 3))
        export_uniform(mk(rows), path, mode="append")
        total += Counter(rows)
        deltas.append((snapshots(path)[-1]["snapshot_id"], Counter(rows)))
        d = Counter(map(tuple, read_delta(spark, path).collect()))
        i = Counter(map(tuple, read_iceberg(spark, path).collect()))
        assert d == i == total
        for k, (sid, _) in enumerate(deltas[:-1]):
            want = Counter()
            for _, delta in deltas[k + 1 :]:
                want += delta
            got = Counter(
                map(
                    tuple,
                    read_iceberg_incremental(spark, path, sid).collect(),
                )
            )
            assert got == want, sid

def test_uniform_delete_both_views_and_optimize_materializes(
    spark, tmp_path
):
    """delete_uniform (new r11): BOTH formats' delete encodings over
    the shared files — Delta DV sidecars + Iceberg v2 position
    deletes record the same positions, both views drop the rows in
    lockstep, a second overlapping delete stacks, optimize_uniform
    materializes both sides over ONE rewritten file, and a v1
    UniForm table refuses BEFORE the Delta side commits."""
    import glob

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        UnsupportedIcebergFeature,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        delete_uniform,
        optimize_uniform,
    )

    mk = lambda lo, hi: spark.createDataFrame(
        [(i, f"v{i}") for i in range(lo, hi)], "id long, v string"
    )
    path = str(tmp_path / "uni_del")
    export_uniform(mk(0, 20).coalesce(2), path, format_version=2)
    export_uniform(
        mk(20, 30).coalesce(1), path, mode="append", format_version=2
    )
    res = delete_uniform(spark, path, "id IN (2, 5, 25)")
    assert res["deleted_rows"] == 3 and res["files_touched"] == 2
    want = sorted(set(range(30)) - {2, 5, 25})
    assert sorted(r.id for r in read_delta(spark, path).collect()) == want
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == want
    delete_uniform(spark, path, "id = 0")  # second delete stacks
    want = sorted(set(range(30)) - {0, 2, 5, 25})
    assert sorted(r.id for r in read_delta(spark, path).collect()) == want
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == want
    res = optimize_uniform(spark, path)
    assert res["files_after"] == 1
    d, i = read_delta(spark, path), read_iceberg(spark, path)
    assert sorted(r.id for r in d.collect()) == want
    assert sorted(r.id for r in i.collect()) == want
    assert len(d.inputFiles()) == 1
    assert set(d.inputFiles()) == set(i.inputFiles())

    # single-file table with only deletes: optimize still
    # materializes (the has_dv gate, not the file count)
    p1 = str(tmp_path / "uni_del_single")
    export_uniform(mk(0, 10).coalesce(1), p1, format_version=2)
    delete_uniform(spark, p1, "id >= 8")
    res = optimize_uniform(spark, p1)
    assert res["files_after"] == 1
    assert sorted(
        r.id for r in read_iceberg(spark, p1).collect()
    ) == list(range(8))

    # v1 refuses before ANY commit: no DV sidecar appears
    p2 = str(tmp_path / "uni_del_v1")
    export_uniform(mk(0, 5), p2)
    with pytest.raises(
        UnsupportedIcebergFeature, match="format-version"
    ):
        delete_uniform(spark, p2, "id = 1")
    assert not glob.glob(os.path.join(p2, "deletion_vector_*"))
    assert sorted(
        r.id for r in read_delta(spark, p2).collect()
    ) == list(range(5))


def test_uniform_partitioned_delete_keeps_pruning(spark, tmp_path):
    """delete_uniform on a partitioned UniForm table: both views drop
    the rows, partition pruning survives, and partitioned
    optimize_uniform materializes the deletes per hive dir."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        delete_uniform,
        optimize_uniform,
    )

    path = str(tmp_path / "uni_del_part")
    df = spark.createDataFrame(
        [(i, "abc"[i % 3]) for i in range(30)], "id long, k string"
    )
    export_uniform(df, path, partition_by=["k"], format_version=2)
    delete_uniform(spark, path, "id < 6")
    want = list(range(6, 30))
    assert sorted(r.id for r in read_delta(spark, path).collect()) == want
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == want
    res = optimize_uniform(spark, path)
    assert res["files_after"] == 3  # one per partition value
    pr = read_iceberg(spark, path, partition_filter={"k": "a"})
    assert sorted(r.id for r in pr.collect()) == [
        i for i in range(6, 30) if i % 3 == 0
    ]
    assert sorted(
        r.id for r in read_delta(spark, path).collect()
    ) == want

def test_single_format_mutators_refuse_uniform(spark, tmp_path):
    """r11: row-changing SINGLE-format ops on a UniForm directory
    refuse (they would silently diverge the two views) — only the
    dual-format uniform ops may mutate; reads of both views stay
    intact afterwards."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        UnsupportedDeltaFeature,
        delete_delta,
        restore_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        UnsupportedIcebergFeature,
        delete_iceberg,
        rollback_iceberg,
        upsert_iceberg,
    )

    path = str(tmp_path / "uni_guard")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")
    export_uniform(df, path, format_version=2)
    with pytest.raises(UnsupportedDeltaFeature, match="diverge"):
        delete_delta(spark, path, "id = 1")
    with pytest.raises(UnsupportedDeltaFeature, match="diverge"):
        restore_delta(spark, path, 0)
    with pytest.raises(UnsupportedIcebergFeature, match="diverge"):
        delete_iceberg(spark, path, "id = 1")
    with pytest.raises(UnsupportedIcebergFeature, match="diverge"):
        upsert_iceberg(spark, path, df, ["id"])
    meta_sid = None
    import json as _json
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
    )

    meta_sid = _json.load(open(_current_metadata_path(path)))[
        "current-snapshot-id"
    ]
    with pytest.raises(UnsupportedIcebergFeature, match="diverge"):
        rollback_iceberg(path, meta_sid)
    # both views still serve the untouched rows
    assert sorted(r.id for r in read_delta(spark, path).collect()) == [1, 2]
    assert sorted(
        r.id for r in read_iceberg(spark, path).collect()
    ) == [1, 2]


def test_upsert_uniform_lockstep_both_views(spark, tmp_path):
    """r12: upsert_uniform writes the batch once as shared parquet
    and commits BOTH formats' upsert encodings (Delta DV re-adds +
    adds; Iceberg equality deletes + same files) — both views serve
    identical post-upsert rows; upserts stack and compose with
    delete_uniform; key-dup batches abort before either commit; v1
    Iceberg views refuse."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        delete_uniform,
        export_uniform,
        upsert_uniform,
    )

    path = str(tmp_path / "uni_ups")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    export_uniform(
        mk([(i, f"v{i}") for i in range(6)]).coalesce(1), path,
        format_version=2,
    )
    res = upsert_uniform(
        spark, path, mk([(1, "U1"), (4, "U4"), (100, "v100")]), ["id"]
    )
    assert res["upserted_rows"] == 3 and res["new_files"] >= 1
    want = {(i, f"v{i}") for i in range(6) if i not in (1, 4)} | {
        (1, "U1"), (4, "U4"), (100, "v100"),
    }
    got_d = {(r.id, r.v) for r in read_delta(spark, path).collect()}
    got_i = {(r.id, r.v) for r in read_iceberg(spark, path).collect()}
    assert got_d == want and got_i == want
    # upserts stack LWW on both views and compose with delete_uniform
    upsert_uniform(spark, path, mk([(1, "U1b")]), ["id"])
    delete_uniform(spark, path, "id IN (100, 0)")
    want2 = {(1, "U1b"), (2, "v2"), (3, "v3"), (4, "U4"), (5, "v5")}
    assert {(r.id, r.v) for r in read_delta(spark, path).collect()} == want2
    assert {(r.id, r.v) for r in read_iceberg(spark, path).collect()} == want2
    # duplicate keys abort BEFORE either commit (views stay in step)
    with _pytest.raises(ValueError, match="distinct keys"):
        upsert_uniform(spark, path, mk([(2, "a"), (2, "b")]), ["id"])
    assert {(r.id, r.v) for r in read_delta(spark, path).collect()} == want2
    assert {(r.id, r.v) for r in read_iceberg(spark, path).collect()} == want2
    # v1 Iceberg view refuses up front
    p1 = str(tmp_path / "uni_v1")
    export_uniform(mk([(1, "a")]).coalesce(1), p1, format_version=1)
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        UnsupportedIcebergFeature,
    )

    with _pytest.raises(UnsupportedIcebergFeature, match="format-version"):
        upsert_uniform(spark, p1, mk([(1, "b")]), ["id"])
