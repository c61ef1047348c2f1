"""Apache Hudi copy-on-write on-disk format reader.

The reference writes its lake through Flink's Hudi sink and mounts it
in Athena (lib/rds-cdc-flink-hudi-stack.ts:458-519, table type
MERGE_ON_READ with compacted read-optimized views). This module lets
the engine MOUNT such a table's copy-on-write / read-optimized layout
directly from disk, using only the public Hudi storage spec
(https://hudi.apache.org/tech-specs/):

- ``.hoodie/`` holds the timeline: one ``<instant>.commit`` (or
  ``.replacecommit``) file per completed write, with ``.inflight`` /
  ``.requested`` markers for in-progress ones;
- data files are named ``<fileId>_<writeToken>_<instantTime>.parquet``;
  all files sharing a ``fileId`` form a file group, and the reader
  must serve, per group, the newest file slice whose instant is a
  COMPLETED commit — never an inflight write's file;
- partitions are hive-style directories; partition values re-attach
  as columns the usual way.

Scale notes: timeline parsing reads only the tiny ``.hoodie`` dir;
slice selection is pure filename arithmetic (no data-file IO); the
result is one parquet scan over exactly the live files, so pushdown,
pruning, and partition discovery are Spark-native.

Boundary (enforced): merge-on-read log files (``.log.*``) require the
Hudi runtime's record merger; if the table has any, this reader
serves the read-optimized view (base files only) — the same contract
as Hudi's own read-optimized query type — and a snapshot read raises
``UnsupportedHudiFeature`` instead of silently dropping updates.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession


class UnsupportedHudiFeature(RuntimeError):
    """Table needs Hudi-runtime features (e.g. MoR log merging)."""


_HOODIE = ".hoodie"
# <fileId>_<writeToken>_<instantTime>[_<other>].parquet ; fileId is a
# uuid-with-dashes plus an ordinal, writeToken like "0-1-2"
_BASE_FILE_RE = re.compile(
    r"^(?P<file_id>[A-Za-z0-9-]+)_(?P<token>[0-9-]+)_"
    r"(?P<instant>[0-9]+)(_[0-9-]+)?\.parquet$"
)
_COMPLETED_SUFFIXES = (".commit", ".replacecommit")


def completed_instants(path: str) -> list[str]:
    """Sorted instant times with a COMPLETED commit on the timeline."""
    tl = os.path.join(path, _HOODIE)
    if not os.path.isdir(tl):
        raise FileNotFoundError(f"not a Hudi table (no {_HOODIE}): {path}")
    out = []
    for f in os.listdir(tl):
        for suf in _COMPLETED_SUFFIXES:
            if f.endswith(suf):
                stem = f[: -len(suf)]
                if stem.isdigit():
                    out.append(stem)
    return sorted(out)


def _walk_base_files(path: str):
    """Yield (rel_partition_dir, filename, match) for every base file."""
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != _HOODIE]
        rel = os.path.relpath(root, path)
        for f in files:
            m = _BASE_FILE_RE.match(f)
            if m:
                yield ("" if rel == "." else rel, f, m)


def _replaced_file_groups(
    path: str, done: set[str]
) -> set[tuple[str, str]]:
    """(partition, fileId) groups killed by completed replacecommits
    (Hudi clustering / insert_overwrite record the groups they
    obsolete in ``partitionToReplaceFileIds``); serving them alongside
    their replacements would duplicate rows."""
    tl = os.path.join(path, _HOODIE)
    out: set[tuple[str, str]] = set()
    for f in os.listdir(tl):
        if not f.endswith(".replacecommit"):
            continue
        stem = f[: -len(".replacecommit")]
        if stem not in done:
            continue
        full = os.path.join(tl, f)
        raw = open(full, "rb").read()
        if not raw.strip():
            continue  # empty marker: nothing replaced
        try:
            meta = json.loads(raw)
        except (UnicodeDecodeError, json.JSONDecodeError) as exc:
            raise UnsupportedHudiFeature(
                f"replacecommit {f} is not JSON (avro-encoded timeline "
                "metadata needs the Hudi runtime); cannot determine "
                "replaced file groups safely"
            ) from exc
        for part, ids in (
            meta.get("partitionToReplaceFileIds") or {}
        ).items():
            norm = "" if part in ("", ".") else part
            for fid in ids:
                out.add((norm, fid))
    return out


def live_file_slices(
    path: str, as_of: str | None = None
) -> list[tuple[str, str]]:
    """(relative path, instant) of the newest committed base file per
    file group, optionally time-traveled to ``as_of`` (inclusive).
    File groups replaced by a completed replacecommit (clustering /
    insert_overwrite) are excluded."""
    done = set(completed_instants(path))
    if as_of is not None:
        done = {i for i in done if i <= as_of}
    replaced = _replaced_file_groups(path, done)
    latest: dict[tuple[str, str], tuple[str, str]] = {}
    for part, fname, m in _walk_base_files(path):
        inst = m.group("instant")
        if inst not in done:
            continue  # inflight or newer-than-as_of write
        key = (part, m.group("file_id"))
        if key in replaced:
            continue  # obsoleted by clustering/insert_overwrite
        rel = os.path.join(part, fname) if part else fname
        if key not in latest or inst > latest[key][1]:
            latest[key] = (rel, inst)
    return sorted(latest.values())


def _has_log_files(path: str) -> bool:
    for root, dirs, files in os.walk(path):
        dirs[:] = [d for d in dirs if d != _HOODIE]
        if any(".log." in f for f in files):
            return True
    return False


def read_hudi(
    spark: SparkSession,
    path: str,
    as_of: str | None = None,
    read_optimized: bool = False,
) -> DataFrame:
    """Mount a Hudi table's base files as a DataFrame.

    ``as_of``: optional instant-time upper bound (time travel over the
    timeline, Hudi's point-in-time query). ``read_optimized=True``
    explicitly requests base-files-only over a MoR table; without it
    a table holding unmerged log files raises rather than serving a
    stale snapshot as if it were current.
    """
    if not read_optimized and _has_log_files(path):
        raise UnsupportedHudiFeature(
            "merge-on-read log files present; pass read_optimized=True "
            "for the base-file view or compact the table with Hudi"
        )
    slices = live_file_slices(path, as_of)
    if not slices:
        raise FileNotFoundError(
            f"Hudi table at {path} has no committed base files"
            + (f" at instant <= {as_of}" if as_of else "")
        )
    files = [os.path.join(path, rel) for rel, _ in slices]
    # basePath keeps hive-style partition dirs resolving to columns
    return spark.read.option("basePath", path).parquet(*files)
