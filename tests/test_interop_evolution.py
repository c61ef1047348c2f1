"""ADD-COLUMN schema evolution on the interop upsert writers (r13 —
VERDICT r12 ask #5): upsert_delta / upsert_iceberg / upsert_hudi with
``evolve_schema=True`` widen the table schema atomically with the
batch; old rows null-backfill; pre-evolution time travel never sees
the column; a second upsert carrying the evolved column needs no
flag; without the flag a new column refuses with an actionable hint.
"""

from __future__ import annotations

import json
import os

import pytest


def _mk(spark, rows, sch="id long, v string"):
    return spark.createDataFrame(rows, sch)


def test_delta_evolve_schema(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        read_delta,
        read_delta_cdf,
        upsert_delta,
    )

    src = str(tmp_path / "t")
    export_delta(_mk(spark, [(1, "a"), (2, "b")]), src)
    up = _mk(spark, [(2, "B2", 7.5), (3, "c", 1.0)],
             "id long, v string, w double")
    with pytest.raises(ValueError, match="evolve_schema=True"):
        upsert_delta(spark, src, up, ["id"])
    r = upsert_delta(spark, src, up, ["id"], evolve_schema=True)
    assert r["version"] == 1
    got = {(x.id, x.v, x.w) for x in read_delta(spark, src).collect()}
    assert got == {(1, "a", None), (2, "B2", 7.5), (3, "c", 1.0)}
    # the widened metaData action landed IN the batch's commit
    log = open(os.path.join(src, "_delta_log",
                            f"{1:020d}.json")).read()
    metas = [json.loads(ln)["metaData"] for ln in log.splitlines()
             if "metaData" in ln]
    assert metas and any(
        f["name"] == "w"
        for f in json.loads(metas[0]["schemaString"])["fields"]
    )
    # version 0 time travel: original schema, no w column
    pre = read_delta(spark, src, version_as_of=0)
    assert "w" not in pre.columns
    # CDF across the evolved commit works
    ch = read_delta_cdf(spark, src, 1, 1)
    assert "w" in ch.columns
    # second upsert with the evolved column needs no flag; a MISSING
    # table column still refuses
    upsert_delta(spark, src,
                 _mk(spark, [(1, "A1", 2.0)],
                     "id long, v string, w double"), ["id"])
    assert {x.w for x in read_delta(spark, src)
            .filter("id = 1").collect()} == {2.0}
    with pytest.raises(ValueError):
        upsert_delta(spark, src, _mk(spark, [(9, "z")]), ["id"],
                     evolve_schema=True)


def test_iceberg_evolve_schema(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        _current_metadata_path,
        export_iceberg,
        read_iceberg,
        snapshots,
        upsert_iceberg,
    )

    src = str(tmp_path / "t")
    export_iceberg(_mk(spark, [(1, "a"), (2, "b")]), src,
                   format_version=2)
    snap0 = snapshots(src)[0]["snapshot_id"]
    up = _mk(spark, [(2, "B2", 7), (3, "c", 1)],
             "id long, v string, w int")
    with pytest.raises(ValueError, match="evolve_schema=True"):
        upsert_iceberg(spark, src, up, ["id"])
    upsert_iceberg(spark, src, up, ["id"], evolve_schema=True)
    got = {(x.id, x.v, x.w) for x in read_iceberg(spark, src).collect()}
    assert got == {(1, "a", None), (2, "B2", 7), (3, "c", 1)}
    # spec shape: fresh field id past last-column-id, new schema-id,
    # current-schema-id bumped
    meta = json.load(open(_current_metadata_path(src)))
    cur = next(s for s in meta["schemas"]
               if s["schema-id"] == meta["current-schema-id"])
    wf = next(f for f in cur["fields"] if f["name"] == "w")
    assert wf["id"] == meta["last-column-id"] and not wf["required"]
    assert len(meta["schemas"]) >= 2
    # pre-evolution snapshot: original columns only
    pre = read_iceberg(spark, src, snapshot_id=snap0)
    assert "w" not in pre.columns
    # second upsert with the evolved column needs no flag
    upsert_iceberg(spark, src,
                   _mk(spark, [(1, "A1", 5)],
                       "id long, v string, w int"), ["id"])
    assert {x.w for x in read_iceberg(spark, src)
            .filter("id = 1").collect()} == {5}


def test_hudi_evolve_schema(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        UnsupportedHudiFeature,
        compact_hudi,
        export_hudi_mor,
        read_hudi,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    t = UpsertLakeTable(spark, str(tmp_path / "eng"), key="id")
    t.write(_mk(spark, [(i, f"v{i}") for i in range(6)]),
            commit_id="c1")
    mor = str(tmp_path / "mor")
    export_hudi_mor(t, mor, num_files=3)
    up = _mk(spark, [(1, "V1", 9.5), (10, "v10", 1.5)],
             "id long, v string, w double")
    with pytest.raises(UnsupportedHudiFeature,
                       match="evolve_schema=True"):
        upsert_hudi(spark, mor, up)
    r = upsert_hudi(spark, mor, up, evolve_schema=True)
    got = {(x.id, x.v, x.w) for x in read_hudi(spark, mor)
           .select("id", "v", "w").collect()}
    want = {(i, f"v{i}", None) for i in range(6) if i != 1}
    want |= {(1, "V1", 9.5), (10, "v10", 1.5)}
    assert got == want
    # pre-evolution time travel never sees the column
    pre = read_hudi(spark, mor, as_of=str(int(r["instant"]) - 1))
    assert "w" not in pre.columns
    # second upsert carrying the evolved column needs no flag
    upsert_hudi(spark, mor,
                _mk(spark, [(2, "V2", 3.25)],
                    "id long, v string, w double"))
    # compaction folds the column into bases; views converge (the
    # mergeSchema read handles the mixed-base window before that)
    compact_hudi(spark, mor)
    ro = {(x.id, x.v, x.w)
          for x in read_hudi(spark, mor, read_optimized=True)
          .select("id", "v", "w").collect()}
    rt = {(x.id, x.v, x.w) for x in read_hudi(spark, mor)
          .select("id", "v", "w").collect()}
    assert ro == rt
    assert (2, "V2", 3.25) in rt and (1, "V1", 9.5) in rt
