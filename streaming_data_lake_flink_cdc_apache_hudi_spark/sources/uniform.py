"""UniForm-style multi-format export: ONE parquet dataset exposed
under BOTH table formats' metadata — a Delta ``_delta_log`` and an
Iceberg ``metadata/`` tree naming the SAME data files.

This is the publicly-documented "universal format" pattern
(Delta UniForm / Iceberg metadata over Delta data): the expensive
artifact — the data — is written once through the distributed parquet
writer, and each format's commit is a metadata-only pass over the
file list (KB-scale, driver-side, the same footprint either format's
native writer pays). A Delta client mounts the table through the log;
an Iceberg client mounts it through the manifest tree; both read the
identical bytes, so the two views can never diverge on content.

Layout::

    table/
      part-*.parquet      <- the single data set (Delta-style root)
      _delta_log/         <- Delta commit naming the parts (relative)
      metadata/           <- Iceberg tree; manifests carry absolute
                             file:// URIs to the SAME parts

Scale: identical to the single-format exporters — data distributed,
metadata per-file records only.

``partition_by`` (new r9): ONE hive-layout ``col=value/`` partitioned
write serves both views. The layout is each format's native
convention for identity partitions — Delta records the values in the
adds' ``partitionValues`` (files drop the partition columns, the
standard Delta layout) and the Iceberg manifests carry real partition
structs parsed from the same path segments, so BOTH views prune a
partition filter down to that partition's files before any scan.

Boundary: single snapshot, identity partition transforms only (a
shared bucket layout would need both formats to agree on the hash);
column mapping stays a Delta-only option and is excluded here because
the physical rename would change the parquet schema the Iceberg view
reads.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

from pyspark.sql import SparkSession

from .delta_interop import export_delta
from .iceberg_interop import export_iceberg


def export_uniform(
    df: DataFrame,
    path: str,
    name: str | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
    format_version: int = 1,
    stats: bool = False,
) -> int:
    """Write ``df`` once and commit Delta AND Iceberg metadata over
    the same files. ``mode="append"`` (new r9) lands NEW files beside
    the old and commits the next Delta log version AND the next
    Iceberg snapshot over exactly those files — incremental UniForm:
    both views advance in lockstep, ``read_iceberg_incremental``
    serves the appended rows, and the shared data is still written
    once. ``format_version=2`` (new r11) writes the v2 Iceberg
    metadata shape — required for ``delete_uniform`` (position
    deletes need sequence numbers). Returns the number of data files
    in this commit."""
    if mode not in ("overwrite", "append"):
        raise ValueError(f"mode must be overwrite|append, got {mode!r}")

    def _list_parts() -> set[str]:
        if partition_by:
            return {
                os.path.relpath(os.path.join(root, f), path)
                for root, _dirs, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
                and not f.startswith("_")
                and "_delta_log" not in root
                and os.sep + "metadata" not in root
            }
        return {
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith("_")
        }

    before = _list_parts() if mode == "append" else set()
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)
    parts = sorted(_list_parts() - before)
    export_delta(
        df,
        path,
        name=name,
        data_files=parts,
        partition_by=partition_by,
        mode=mode,
        stats=stats,
    )
    export_iceberg(
        df,
        path,
        table_name=name,
        data_files=[os.path.join(path, f) for f in parts],
        partition_by=partition_by,
        mode=mode,
        format_version=format_version,
        stats=stats,
    )
    return len(parts)


def delete_uniform(spark: SparkSession, path: str, predicate: str) -> dict:
    """Row-level DELETE on a UniForm table (new r11): BOTH formats'
    delete encodings committed over the shared data files, so a Delta
    client and an Iceberg client each stop serving the matched rows.

    The encodings are inherently format-specific — Delta deletion-
    vector bitmap sidecars (``delete_delta``) vs Iceberg v2
    position-delete parquets (``delete_iceberg``) — so unlike
    ``optimize_uniform`` (where ONE rewritten parquet set serves both
    commits) each side writes its own sidecar artifacts. Both sides
    evaluate the SAME predicate over the SAME shared raw files with
    the same hidden ``_metadata`` position columns, so the recorded
    position sets are identical and the views cannot diverge; the
    lockstep is pinned by tests reading both views after every
    delete. Requires the Iceberg view at format-version 2 (export
    with ``export_uniform(format_version=2)``) — v1 has no sequence
    numbers to scope position deletes.

    ``optimize_uniform`` afterwards materializes the deletes in both
    formats at once over one rewritten parquet set.

    Failure atomicity: the format-version gate runs BEFORE either
    commit, but the two metadata commits themselves are sequential
    (Delta then Iceberg) — a crash between them leaves the Delta
    view ahead. Re-running the same delete converges both sides:
    the Delta re-delete merges the identical positions (no new
    rows), and the Iceberg side records them for the first time.

    Scale: two raw scans of the live files (one per format's writer)
    with executor-side sidecar writes; positions never pass through
    the driver on either side. Sharing one scan would need a
    cross-format position-injection API — the scan is the cheap part
    (the sidecar writes and metadata commits dominate at 100 TB
    commit rates)."""
    import json

    from .delta_interop import delete_delta
    from .iceberg_interop import (
        UnsupportedIcebergFeature,
        _current_metadata_path,
        delete_iceberg,
    )

    # validate the Iceberg side FIRST: refusing after the Delta DV
    # commit would leave the two views serving different rows
    meta = json.load(open(_current_metadata_path(path)))
    if int(meta.get("format-version", 1)) < 2:
        raise UnsupportedIcebergFeature(
            "delete_uniform needs the Iceberg view at format-version "
            "2 (export with export_uniform(format_version=2)) — v1 "
            "has no sequence numbers to scope position deletes"
        )
    d = delete_delta(spark, path, predicate, _allow_uniform=True)
    i = delete_iceberg(spark, path, predicate, _allow_uniform=True)
    return {
        "delta_version": d["version"],
        "iceberg_snapshot_id": i["snapshot_id"],
        "deleted_rows": i["deleted_rows"],
        "files_touched": i["files_touched"],
    }


def upsert_uniform(
    spark: SparkSession,
    path: str,
    df: DataFrame | None,
    key_cols: list[str],
    deletes: DataFrame | None = None,
) -> dict:
    """Keyed UPSERT on a UniForm table (new r12 — the dual-format
    twin of ``upsert_iceberg``/the Delta MERGE shape, completing the
    UniForm DML surface next to ``delete_uniform``): the batch's rows
    are written ONCE as shared parquet beside the old parts, then

    - the DELTA leg commits one version carrying deletion-vector
      re-adds retiring the OLD rows of the batch's keys plus ``add``
      actions for the new files (``_dv_delete_actions`` — the MERGE
      commit shape), and
    - the ICEBERG leg commits one ``overwrite`` snapshot with
      EQUALITY DELETES on the key columns plus a data manifest over
      the SAME injected files (``upsert_iceberg(data_files=...)``).

    Both legs name identical bytes, so a Delta client and an Iceberg
    client serve the same post-upsert rows: new keys insert, existing
    keys update last-writer-wins. The batch must be KEY-UNIQUE
    (checked against the WRITTEN rows before either commit — both
    formats' same-sequence scoping would keep duplicate keys alive).

    ``deletes`` (new r12, the CDC ``D`` leg): a keys-only frame whose
    keys are retired on BOTH sides in the same pair of commits —
    Delta deletion vectors, Iceberg equality deletes. A key in both
    ``df`` and ``deletes`` raises before either commit; ``df=None``
    commits a dual delete-only pair.

    Requires the Iceberg view at format-version 2 (equality deletes
    need sequence numbers); partitioned UniForm tables refuse for
    now. Failure atomicity mirrors ``delete_uniform``: every gate
    runs before either commit; a crash between the two commits
    leaves Delta ahead, and re-running the same batch converges both
    sides (the DV re-delete merges identical positions, the new
    parquet lands again under a fresh name but the old one is no
    longer referenced by either head — ``optimize_uniform`` collects
    it).

    Scale: one distributed shared-data write, one scan for the Delta
    DV positions (executor-side bitmap writes), one metadata commit
    per format — the data is never written twice."""
    import json as _json

    from .delta_interop import _replay_log, upsert_delta
    from .iceberg_interop import (
        UnsupportedIcebergFeature,
        _current_metadata_path,
        upsert_iceberg,
    )

    # every gate BEFORE either commit (lockstep atomicity)
    meta_i = _json.load(open(_current_metadata_path(path)))
    if int(meta_i.get("format-version", 1)) < 2:
        raise UnsupportedIcebergFeature(
            "upsert_uniform needs the Iceberg view at format-version "
            "2 (export with export_uniform(format_version=2)) — v1 "
            "has no sequence numbers to scope equality deletes"
        )
    from pyspark.sql import functions as F

    adds, meta_d, _proto = _replay_log(spark, path)
    if meta_d is None:
        raise ValueError(f"no Delta metaData at {path}")
    if meta_d.get("partitionColumns"):
        raise ValueError(
            "upsert_uniform on a PARTITIONED UniForm table is not "
            "supported yet"
        )
    tbl_cols = [
        f["name"]
        for f in _json.loads(meta_d["schemaString"])["fields"]
    ]
    if df is None and deletes is None:
        raise ValueError("upsert_uniform: need df and/or deletes")
    if df is not None and set(df.columns) != set(tbl_cols):
        raise ValueError(
            f"upsert_uniform: frame columns {sorted(df.columns)} != "
            f"table columns {sorted(tbl_cols)}"
        )
    if deletes is not None and set(deletes.columns) != set(key_cols):
        raise ValueError(
            f"upsert_uniform: deletes columns {sorted(deletes.columns)}"
            f" != key columns {sorted(key_cols)}"
        )
    bad = sorted(set(key_cols) - set(tbl_cols))
    if not key_cols or bad:
        raise ValueError(
            f"upsert_uniform: key columns {bad or key_cols} not in "
            f"table schema {tbl_cols}"
        )

    # shared data written ONCE at the table root (the UniForm layout)
    def _parts() -> set[str]:
        return {
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith("_")
        }

    parts: list[str] = []
    abs_parts: list[str] = []
    n_rows = 0
    keys = None
    if df is not None:
        before = _parts()
        df.select(*tbl_cols).write.mode("append").parquet(path)
        parts = sorted(_parts() - before)
        abs_parts = [os.path.join(path, f) for f in parts]

        # key uniqueness from the WRITTEN rows, before either commit.
        # r14 (§2.6): rows + distinct keys in ONE aggregate job
        # (groupBy-then-count keeps dropDuplicates' null-key
        # semantics, which countDistinct would not).
        # schema already known from the batch: skip the footer
        # schema-inference job (r14 §2.6)
        written = (
            spark.read.schema(df.select(*tbl_cols).schema)
            .parquet(*abs_parts)
        )
        n_rows, n_keys = (
            written.groupBy(*key_cols)
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(
                F.coalesce(F.sum("_c"), F.lit(0)),
                F.count(F.lit(1)),
            )
            .first()
        )
        keys = written.select(*key_cols).dropDuplicates()
        if n_keys != n_rows:
            for f in abs_parts:
                os.remove(f)  # abort cleanly: nothing committed yet
            raise ValueError(
                f"upsert_uniform: batch has {n_rows} rows but {n_keys} "
                f"distinct keys over {key_cols} — dedup to one row per "
                "key first"
            )
    ddf = None
    if deletes is not None:
        ddf = deletes.select(*key_cols).dropDuplicates()
        if keys is not None:
            overlap = keys.join(ddf, key_cols, "semi").count()
            if overlap:
                for f in abs_parts:
                    os.remove(f)
                raise ValueError(
                    f"upsert_uniform: {overlap} key(s) appear in BOTH "
                    "df and deletes — upsert-or-delete per key is "
                    "ambiguous"
                )

    # Delta leg: DV-retire the old rows of the batch's keys + add the
    # new files, ONE commit (upsert_delta over the pre-written shared
    # parts — it never removes injected files on abort)
    res_d = upsert_delta(
        spark, path, None, key_cols, deletes=ddf, data_files=parts,
        _allow_uniform=True,
    )
    version = res_d["version"]

    # Iceberg leg: equality deletes + the SAME injected files
    res_i = upsert_iceberg(
        spark,
        path,
        None,
        key_cols,
        deletes=ddf,
        data_files=abs_parts if abs_parts else None,
        _allow_uniform=True,
    )
    return {
        "delta_version": version,
        "iceberg_snapshot_id": res_i["snapshot_id"],
        "upserted_rows": n_rows,
        "new_files": len(parts),
    }


def optimize_uniform(
    spark: SparkSession, path: str, stats: bool = False
) -> dict:
    """Bin-pack BOTH views over ONE rewritten parquet set (new r10):
    read the Delta view's live rows, write them once as a single
    compacted file beside the old parts, then commit (a) the Delta
    OPTIMIZE action set (``optimize_delta(data_files=...)`` —
    remove+add, ``dataChange: false``) and (b) the Iceberg
    ``replace`` snapshot (``rewrite_data_files(data_files=...)``)
    over exactly that file — so after N UniForm appends both formats'
    scan counts drop back to O(1) without the data ever being written
    twice or the views diverging.

    Identity-PARTITIONED UniForm tables compact too (new r10): the
    rewrite regroups on the partition tuple — one compacted file per
    hive dir, partition columns dropped from file contents per the
    shared layout convention — and both formats' partition pruning
    survives (Delta re-reads partitionValues from the new paths, the
    Iceberg replace snapshot re-emits per-partition manifests with
    bound summaries). UniForm has no delete files, so the injected
    set always holds the full live row set.

    Scale: one distributed read + one distributed write + two
    KB-scale metadata commits — half the write cost of compacting
    each format separately."""
    from .delta_interop import optimize_delta, read_delta
    from .iceberg_interop import rewrite_data_files

    from .delta_interop import _replay_log

    adds, meta, _ = _replay_log(spark, path)
    part_cols = (meta or {}).get("partitionColumns") or []
    # files carrying deletion vectors (delete_uniform, new r11) must
    # materialize even when the file count is already minimal —
    # compaction is what purges BOTH formats' delete artifacts
    has_dv = any(
        isinstance(a, dict) and a.get("deletionVector")
        for a in adds.values()
    )

    def _parts() -> set[str]:
        if part_cols:
            return {
                os.path.relpath(os.path.join(root, f), path)
                for root, _dirs, fs in os.walk(path)
                for f in fs
                if f.endswith(".parquet")
                and not f.startswith("_")
                and "_delta_log" not in root
                and os.sep + "metadata" not in root
            }
        return {
            f
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith("_")
        }

    live = read_delta(spark, path)
    files = live.inputFiles()  # LIVE adds, not disk files — earlier
    # compactions leave tombstoned parts on disk
    n_live = len(files)
    n_groups = (
        len({f.rsplit("/", 1)[0] for f in files}) if part_cols else 1
    )
    if n_live <= n_groups and not has_dv:
        # already one file per partition (or one) and no deletes to
        # materialize
        return {"files_before": n_live, "files_after": n_live}
    before = _parts()
    # one write serves both commits; evaluated fully before either
    # format's metadata changes. Partitioned tables (new r10) regroup
    # on the partition tuple — one compacted file per hive dir, the
    # partition columns dropped from file contents per both formats'
    # shared layout convention
    if part_cols:
        from pyspark.sql import functions as F

        live.repartition(*[F.col(c) for c in part_cols]).write.partitionBy(
            *part_cols
        ).mode("append").parquet(path)
    else:
        live.coalesce(1).write.mode("append").parquet(path)
    new_parts = sorted(_parts() - before)
    # stats=True (r13): the SAME footer pass effectively serves both
    # formats — Delta add.stats and Iceberg manifest bounds land over
    # the shared compacted files in their respective commits
    optimize_delta(spark, path, data_files=new_parts, stats=stats)
    # deletes_applied: the injected set came from read_delta, which
    # applies the deletion vectors delete_uniform mirrors as the
    # Iceberg side's position deletes — so this replace snapshot
    # materializes BOTH formats' deletes at once (new r11)
    rewrite_data_files(
        spark,
        path,
        data_files=[os.path.join(path, f) for f in new_parts],
        deletes_applied=True,
        stats=stats,
    )
    # n_live, not len(before): the on-disk walk counts tombstoned
    # parquet parts left by earlier compactions, which the early
    # return above already excludes (ADVICE r11)
    return {"files_before": n_live, "files_after": len(new_parts)}
