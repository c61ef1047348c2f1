"""Distributed parquet-footer statistics + min/max file skipping.

Every lakehouse format carries per-data-file column statistics in its
commit metadata so planners can drop files WITHOUT opening them:
Delta's ``add.stats`` JSON (PROTOCOL.md "Per-file Statistics"),
Iceberg's manifest-entry ``lower_bounds``/``upper_bounds``/
``value_counts``/``null_value_counts`` maps (spec "Manifests" +
Appendix D single-value serialization), Hudi's col_stats metadata
partition. This module is the shared engine for both interop formats:

- ``parquet_footer_stats`` reads ONLY the parquet footers — on
  EXECUTORS, one footer per task row via ``mapInPandas`` — and
  returns one small stats record per file to the driver. At 100 TB
  that is the same metadata-scale cost every real writer pays at
  commit time (delta-rs backfills stats exactly this way); row data
  never moves.
- ``file_survives`` evaluates a conjunction of simple predicates
  against one file's stats with BLOOM-style semantics: no false
  drops ever — a file is eliminated only when its stats PROVE no row
  can match; missing/partial stats keep the file. Correctness never
  depends on pruning because callers re-apply the predicate as a
  normal Spark filter on the surviving scan (``predicate_column``).

Predicates are explicit ``(column, op, value)`` tuples (ANDed), the
same no-SQL-parser house shape as ``operators/skipindex.py``'s bloom
probes: ops ``== != < <= > >=`` plus ``is_null``/``not_null``
(value ignored). Strings compare lexicographically by code point
(UTF-8 byte order for BMP text — Spark's UTF8String order), numbers
numerically, dates/timestamps chronologically.

Row-group min/max in parquet footers may be writer-TRUNCATED for long
strings (parquet-mr truncates min down / max up), so they are valid
BOUNDS rather than tight extremes — exactly what interval pruning
needs. Columns whose chunks lack min/max (e.g. NaN-poisoned doubles)
are recorded as boundless and never prune.
"""

from __future__ import annotations

import datetime
import json
import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_OPS = ("==", "!=", "<", "<=", ">", ">=", "is_null", "not_null")


def _json_scalar(v):
    """Footer value -> JSON-encodable tagged scalar (type survives
    the round trip: timestamps/dates re-parse on the pruning side)."""
    if isinstance(v, bool) or v is None:
        return v
    if isinstance(v, (int, float, str)):
        return v
    if isinstance(v, datetime.datetime):
        # full microsecond precision — truncation would need the
        # delta-spark +1ms max adjustment to stay a valid upper bound
        return {"$ts": v.replace(tzinfo=None).isoformat()}
    if isinstance(v, datetime.date):
        return {"$d": v.isoformat()}
    if isinstance(v, bytes):
        # binary bounds don't serialize to JSON usefully; treat as
        # boundless rather than lie
        return None
    try:
        import decimal

        if isinstance(v, decimal.Decimal):
            return {"$dec": str(v)}
    except ImportError:  # pragma: no cover
        pass
    return None


def _revive(v):
    """Inverse of ``_json_scalar`` for the tagged forms."""
    if isinstance(v, dict):
        if "$ts" in v:
            return datetime.datetime.fromisoformat(v["$ts"])
        if "$d" in v:
            return datetime.date.fromisoformat(v["$d"])
        if "$dec" in v:
            import decimal

            return decimal.Decimal(v["$dec"])
    return v


def parquet_footer_stats(
    spark: SparkSession,
    files: list[str],
    columns: list[str] | None = None,
) -> dict[str, dict]:
    """Per-file column statistics from parquet FOOTERS, distributed.

    Returns ``{abs_path: {"numRecords": n, "min": {col: v},
    "max": {col: v}, "nulls": {col: n}}}`` covering top-level
    primitive columns (nested paths are skipped). A column appears in
    ``min``/``max`` only when EVERY row group of the file carries
    usable min/max for it; ``nulls`` only when every row group
    carries a null count. ``columns`` restricts collection.

    Scale shape: the file list is a KB-scale frame, each task opens
    only footers (no row groups are decoded), and one stats row per
    file returns to the driver — the commit-metadata cost class.
    """
    if not files:
        return {}
    frame = spark.createDataFrame(
        [(f,) for f in sorted(files)], "path string"
    ).repartition(min(len(files), 32))
    want = list(columns) if columns is not None else None

    def walk(it):
        import pandas as pd
        import pyarrow.parquet as pq

        for pdf in it:
            out = []
            for p in pdf["path"]:
                md = pq.ParquetFile(p).metadata
                names = [
                    md.row_group(0).column(j).path_in_schema
                    for j in range(md.num_columns)
                ] if md.num_row_groups else []
                mins: dict = {}
                maxs: dict = {}
                nulls: dict = {}
                dead: set = set()
                nulldead: set = set()
                for i in range(md.num_row_groups):
                    rg = md.row_group(i)
                    for j, name in enumerate(names):
                        if "." in name:  # nested leaf — skip
                            continue
                        if want is not None and name not in want:
                            continue
                        st = rg.column(j).statistics
                        if (
                            st is None
                            or not st.has_min_max
                            or st.min is None
                            or st.max is None
                        ):
                            dead.add(name)
                        elif name not in dead:
                            mn, mx = st.min, st.max
                            if isinstance(mn, float) and (
                                math.isnan(mn) or math.isnan(mx)
                            ):
                                dead.add(name)
                            else:
                                if name not in mins or mn < mins[name]:
                                    mins[name] = mn
                                if name not in maxs or mx > maxs[name]:
                                    maxs[name] = mx
                        if st is None or not st.has_null_count:
                            nulldead.add(name)
                        elif name not in nulldead:
                            nulls[name] = nulls.get(name, 0) + st.null_count
                for name in dead:
                    mins.pop(name, None)
                    maxs.pop(name, None)
                for name in nulldead:
                    nulls.pop(name, None)
                enc_min = {
                    k: _json_scalar(v) for k, v in mins.items()
                }
                enc_max = {
                    k: _json_scalar(v) for k, v in maxs.items()
                }
                # a value the tagger refused (binary) poisons the pair
                bad = {
                    k
                    for k in enc_min
                    if enc_min[k] is None or enc_max.get(k) is None
                }
                out.append(
                    (
                        p,
                        json.dumps(
                            {
                                "numRecords": md.num_rows,
                                "min": {
                                    k: v
                                    for k, v in enc_min.items()
                                    if k not in bad
                                },
                                "max": {
                                    k: v
                                    for k, v in enc_max.items()
                                    if k not in bad
                                },
                                "nulls": nulls,
                            }
                        ),
                    )
                )
            yield pd.DataFrame(out, columns=["path", "stats"])

    rows = frame.mapInPandas(walk, "path string, stats string").collect()
    return {
        r["path"]: {
            "numRecords": (s := json.loads(r["stats"]))["numRecords"],
            "min": {k: _revive(v) for k, v in s["min"].items()},
            "max": {k: _revive(v) for k, v in s["max"].items()},
            "nulls": s["nulls"],
        }
        for r in rows
    }


def stats_to_json(st: dict) -> dict:
    """One stats record -> a JSON-encodable dict (tagged scalars for
    timestamps/dates/decimals) — the persisted-sidecar form
    (``hudi_interop.build_hudi_col_stats``)."""
    enc_min = {k: _json_scalar(v) for k, v in st["min"].items()}
    enc_max = {k: _json_scalar(v) for k, v in st["max"].items()}
    bad = {
        k
        for k in enc_min
        if enc_min[k] is None or enc_max.get(k) is None
    }
    return {
        "numRecords": st["numRecords"],
        "min": {k: v for k, v in enc_min.items() if k not in bad},
        "max": {k: v for k, v in enc_max.items() if k not in bad},
        "nulls": dict(st["nulls"]),
    }


def stats_from_json(d: dict) -> dict:
    """Inverse of ``stats_to_json``."""
    return {
        "numRecords": d.get("numRecords"),
        "min": {k: _revive(v) for k, v in (d.get("min") or {}).items()},
        "max": {k: _revive(v) for k, v in (d.get("max") or {}).items()},
        "nulls": dict(d.get("nulls") or {}),
    }


def _comparable(a, b) -> bool:
    """Only compare like with like — a type mismatch between the
    probe value and the stored bound keeps the file (and usually
    means a caller bug, but a false DROP would be a wrong answer)."""
    if isinstance(a, bool) != isinstance(b, bool):
        return False
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return True
    if isinstance(a, datetime.datetime) != isinstance(
        b, datetime.datetime
    ):
        return False
    return type(a) is type(b) or (
        isinstance(a, datetime.date) and isinstance(b, datetime.date)
    )


def file_survives(predicates, st: dict) -> bool:
    """True unless ``st`` PROVES no row of the file can satisfy the
    AND of ``predicates``. ``st`` is one ``parquet_footer_stats``
    value (optionally with extra exact columns merged in by the
    caller — e.g. partition values as min==max)."""
    nrec = st.get("numRecords")
    mins, maxs, nulls = st.get("min", {}), st.get("max", {}), st.get(
        "nulls", {}
    )
    for col, op, val in _norm_predicates(predicates):
        nl = nulls.get(col)
        if op == "is_null":
            if nl == 0:
                return False
            continue
        if op == "not_null":
            if nl is not None and nrec is not None and nl >= nrec:
                return False
            continue
        # value comparisons never match an all-null column
        if nl is not None and nrec is not None and nl >= nrec:
            return False
        if isinstance(val, float) and math.isnan(val):
            continue  # NaN probes never prune
        mn, mx = mins.get(col), maxs.get(col)
        if mn is None or mx is None:
            continue
        if not (_comparable(val, mn) and _comparable(val, mx)):
            continue
        if op == "==":
            if val < mn or val > mx:
                return False
        elif op == "!=":
            if mn == mx == val and not nl:
                return False
        elif op == "<":
            if mn >= val:
                return False
        elif op == "<=":
            if mn > val:
                return False
        elif op == ">":
            if mx <= val:
                return False
        elif op == ">=":
            if mx < val:
                return False
    return True


def _norm_predicates(predicates):
    out = []
    for p in predicates:
        if len(p) == 2:
            col, op = p
            val = None
        else:
            col, op, val = p
        if op == "=":
            op = "=="
        if op not in _OPS:
            raise ValueError(
                f"unsupported predicate op {op!r} (have {_OPS})"
            )
        out.append((col, op, val))
    if not out:
        raise ValueError("empty predicate list prunes nothing — pass "
                         "at least one (column, op, value)")
    return out


def predicate_column(predicates) -> Column:
    """The same conjunction as a Spark ``Column`` — callers re-apply
    it on the pruned scan so correctness never rests on the stats."""
    c: Column | None = None
    for col, op, val in _norm_predicates(predicates):
        x = F.col(col)
        if op == "is_null":
            term = x.isNull()
        elif op == "not_null":
            term = x.isNotNull()
        elif op == "==":
            term = x == F.lit(val)
        elif op == "!=":
            term = x != F.lit(val)
        elif op == "<":
            term = x < F.lit(val)
        elif op == "<=":
            term = x <= F.lit(val)
        elif op == ">":
            term = x > F.lit(val)
        else:
            term = x >= F.lit(val)
        c = term if c is None else (c & term)
    return c


def apply_residual(df: DataFrame, predicates) -> DataFrame:
    return df.filter(predicate_column(predicates))
