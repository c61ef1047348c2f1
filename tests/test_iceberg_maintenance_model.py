"""Model-based randomized differential for the Iceberg maintenance
surface (r9; rewrite_data_files added r10): random append /
expire_snapshots / rewrite_manifests / rewrite_data_files sequences
run against BOTH the real exporter/reader and a trivial Python model
(per-snapshot row multisets + the appended delta). After every step
the current read, every retained snapshot's time-travel read, and the
incremental read from every retained ancestor must equal the model —
and an incremental range crossing a DATA rewrite must refuse (Java's
IncrementalAppendScan contract), while metadata-only manifest
rewrites pass through. Expired snapshot ids must be gone from
``snapshots`` and raise on time travel. Maintenance may change only
HOW the data is stored, never what any retained snapshot contains.
"""

from __future__ import annotations

import random
from collections import Counter

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
    UnsupportedIcebergFeature,
    delete_iceberg,
    expire_snapshots,
    export_iceberg,
    read_iceberg,
    read_iceberg_incremental,
    rewrite_data_files,
    rewrite_manifests,
    snapshots,
    update_iceberg,
    upsert_iceberg,
)


def _rows_of(df):
    return Counter(map(tuple, df.collect()))


@pytest.mark.parametrize("seed,fv", [(5, 1), (13, 2)])
def test_random_iceberg_maintenance_matches_model(
    spark, tmp_path, seed, fv
):
    rng = random.Random(seed)
    path = str(tmp_path / f"ice_model_{seed}")
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    next_id = 0

    def fresh_rows(n):
        nonlocal next_id
        out = [(next_id + i, f"v{next_id + i}") for i in range(n)]
        next_id += n
        return out

    base = fresh_rows(3)
    export_iceberg(mk(base), path, format_version=fv)
    sid0 = snapshots(path)[-1]["snapshot_id"]
    # model: snapshot_id -> (cumulative rows, delta rows of the commit)
    model: dict[int, tuple[Counter, Counter]] = {
        sid0: (Counter(base), Counter(base))
    }
    lineage: list[int] = [sid0]  # retained, oldest -> newest
    data_rewrites: set[int] = set()  # replace snapshots that MOVED data

    for step in range(12):
        op = rng.choice(
            ["append", "append", "expire", "rewrite", "rewrite_data",
             "delete", "upsert", "update"]
        )
        if op == "upsert":
            # equality-delete upsert commit (new r11): per batch key,
            # the old row retires and the new one lands at the same
            # seq; non-append, so incremental ranges refuse. v1
            # refuses outright.
            live_ids = sorted({k[0] for k in model[lineage[-1]][0]})
            upd = rng.sample(
                live_ids, rng.randint(0, min(2, len(live_ids)))
            )
            ins = fresh_rows(rng.randint(0, 2))
            batch = [(i, f"u{i}_{step}") for i in upd] + ins
            if not batch:
                continue
            bdf = mk(batch)
            if fv == 1:
                with pytest.raises(
                    UnsupportedIcebergFeature, match="format-version 2"
                ):
                    upsert_iceberg(spark, path, bdf, ["id"])
                continue
            res = upsert_iceberg(spark, path, bdf, ["id"])
            assert res["rows"] == len(batch)
            sid = snapshots(path)[-1]["snapshot_id"]
            gone = {i for i, _v in batch}
            model[sid] = (
                Counter(
                    {k: c for k, c in model[lineage[-1]][0].items()
                     if k[0] not in gone}
                )
                + Counter(batch),
                Counter(),
            )
            lineage.append(sid)
            data_rewrites.add(sid)  # gates the incremental refusal
        elif op == "update":
            # RowDelta UPDATE commit (new r12): position deletes for
            # the matched rows + a rewritten data file in ONE
            # snapshot; non-append, so incremental ranges crossing it
            # refuse. v1 refuses outright.
            live_ids = sorted({k[0] for k in model[lineage[-1]][0]})
            if not live_ids:
                continue
            victims = rng.sample(
                live_ids, rng.randint(1, min(3, len(live_ids)))
            )
            pred = f"id IN ({', '.join(map(str, victims))})"
            set_exprs = {"v": f"concat('U{step}_', v)"}
            if fv == 1:
                with pytest.raises(
                    UnsupportedIcebergFeature, match="format-version 2"
                ):
                    update_iceberg(spark, path, pred, set_exprs)
                continue
            res = update_iceberg(spark, path, pred, set_exprs)
            assert res["updated_rows"] == len(victims)
            sid = snapshots(path)[-1]["snapshot_id"]
            gone = set(victims)
            cur_rows = model[lineage[-1]][0]
            new_rows = Counter(
                {k: c for k, c in cur_rows.items() if k[0] not in gone}
            )
            for k, c in cur_rows.items():
                if k[0] in gone:
                    new_rows[(k[0], f"U{step}_{k[1]}")] += c
            model[sid] = (new_rows, Counter())
            lineage.append(sid)
            data_rewrites.add(sid)  # gates the incremental refusal
        elif op == "delete":
            # position-delete commit (new r11): rows vanish, data
            # files stay; incremental ranges crossing it refuse like
            # any non-append. v1 refuses outright.
            live_ids = sorted({k[0] for k in model[lineage[-1]][0]})
            if not live_ids:
                continue
            victims = rng.sample(
                live_ids, rng.randint(1, min(3, len(live_ids)))
            )
            pred = f"id IN ({', '.join(map(str, victims))})"
            if fv == 1:
                with pytest.raises(
                    UnsupportedIcebergFeature, match="format-version 2"
                ):
                    delete_iceberg(spark, path, pred)
                continue
            res = delete_iceberg(spark, path, pred)
            assert res["deleted_rows"] == len(victims)
            sid = snapshots(path)[-1]["snapshot_id"]
            gone = set(victims)
            model[sid] = (
                Counter(
                    {k: c for k, c in model[lineage[-1]][0].items()
                     if k[0] not in gone}
                ),
                Counter(),
            )
            lineage.append(sid)
            data_rewrites.add(sid)  # gates the incremental refusal
        elif op == "append":
            rows = fresh_rows(rng.randint(1, 3))
            export_iceberg(mk(rows), path, mode="append")
            sid = snapshots(path)[-1]["snapshot_id"]
            model[sid] = (
                model[lineage[-1]][0] + Counter(rows),
                Counter(rows),
            )
            lineage.append(sid)
        elif op == "expire":
            keep = rng.randint(1, 3)
            expire_snapshots(path, keep_last=keep)
            lineage = lineage[-keep:]
        elif op == "rewrite":
            rewrite_manifests(path)
            # compaction commits a REAL replace snapshot: same rows,
            # empty delta (incremental reads skip it, like Java's
            # IncrementalAppendScan ignores metadata-only REPLACE).
            # With <=1 data manifest it is a NO-OP committing nothing
            # — appending the unchanged sid would duplicate lineage
            # (latent bug exposed by the r12 op mix)
            sid = snapshots(path)[-1]["snapshot_id"]
            if sid != lineage[-1]:
                model[sid] = (Counter(model[lineage[-1]][0]), Counter())
                lineage.append(sid)
        else:  # rewrite_data (bin-pack compaction, new r10)
            res = rewrite_data_files(spark, path)
            # a commit happens when >1 live file OR live deletes need
            # materializing (new r11) — detect it from the snapshot
            # list, the authoritative signal either way
            sid = snapshots(path)[-1]["snapshot_id"]
            if sid != lineage[-1]:
                model[sid] = (Counter(model[lineage[-1]][0]), Counter())
                lineage.append(sid)
                data_rewrites.add(sid)
                # the pinned scan-count contract: one file afterwards
                assert len(read_iceberg(spark, path).inputFiles()) == 1
            else:
                # already compact: a no-op commits NO snapshot
                assert res["files_before"] <= 1
        live = {s["snapshot_id"] for s in snapshots(path)}
        assert live == set(lineage), (seed, step, op)
        cur = _rows_of(read_iceberg(spark, path))
        assert cur == model[lineage[-1]][0], (seed, step, op)
        for sid in lineage:
            got = _rows_of(read_iceberg(spark, path, snapshot_id=sid))
            assert got == model[sid][0], (seed, step, op, sid)
        # incremental from every retained ancestor = the union of the
        # deltas after it — unless a DATA rewrite sits in the range,
        # which must refuse
        for i, sid in enumerate(lineage[:-1]):
            if any(s in data_rewrites for s in lineage[i + 1 :]):
                with pytest.raises(
                    UnsupportedIcebergFeature, match="non-append"
                ):
                    read_iceberg_incremental(spark, path, sid)
                continue
            want = Counter()
            for later in lineage[i + 1 :]:
                want += model[later][1]
            got = _rows_of(read_iceberg_incremental(spark, path, sid))
            assert got == want, (seed, step, op, sid)
        # an expired id must raise on time travel
        dead = set(model) - set(lineage)
        if dead:
            with pytest.raises(Exception, match="snapshot"):
                read_iceberg(
                    spark, path, snapshot_id=sorted(dead)[0]
                )
