"""Same-session A/B of warm interop writer commits vs a git rev
(r14 — VERDICT item 3: the ~2.3 s warm ``upsert_delta`` commit was
~5 sequential py4j round-trips; the fused validation aggregate should
cut one to two jobs per commit). Two identical source tables are
built per format, then rev-side and worktree-side commits interleave
(commit k on the rev table, commit k on the worktree table), so host
drift cancels. Reports mean/min per-commit wall seconds per side.

Usage: python scripts/exp_commit_ab.py [--rev HEAD] [--n 8]
"""

from __future__ import annotations

import argparse
import importlib
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

_PKG = "streaming_data_lake_flink_cdc_apache_hudi_spark"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rev", default="HEAD")
    ap.add_argument("--n", type=int, default=8)
    args = ap.parse_args()

    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (
        DEFAULT_CPUS,
        EngineConfig,
    )

    spark = EngineConfig(
        app_name="commit_ab",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()

    tmp = tempfile.mkdtemp(prefix="commit_ab_rev_")
    root = tempfile.mkdtemp(prefix="commit_ab_")
    saved = {k: v for k, v in sys.modules.items() if k.split(".")[0] == _PKG}

    def _load(side):
        """Import the side's interop modules (purge-first, opt_ab rule)."""
        for k in [k for k in sys.modules if k.split(".")[0] == _PKG]:
            del sys.modules[k]
        if side == "rev":
            sys.path.insert(0, tmp)
        di = importlib.import_module(f"{_PKG}.sources.delta_interop")
        ii = importlib.import_module(f"{_PKG}.sources.iceberg_interop")
        if side == "rev":
            sys.path.remove(tmp)
        return di, ii

    try:
        ar = subprocess.run(
            ["git", "archive", args.rev, _PKG],
            capture_output=True, cwd=ROOT, timeout=60, check=True,
        )
        subprocess.run(
            ["tar", "-x", "-C", tmp], input=ar.stdout, check=True, timeout=60
        )
        base = spark.range(0, 5000).selectExpr("id", "concat('v', id) AS v")
        tables = {}
        for side in ("rev", "now"):
            di, ii = _load(side)
            dpath = f"{root}/delta_{side}"
            ipath = f"{root}/ice_{side}"
            di.export_delta(base, dpath)
            ii.export_iceberg(base, ipath, format_version=2)
            tables[side] = (dpath, ipath)
        res = {
            f"{fmt}_{side}": []
            for fmt in ("delta", "iceberg")
            for side in ("rev", "now")
        }
        for k in range(args.n):
            upd = spark.range(k * 400, k * 400 + 500).selectExpr(
                "id", f"concat('u{k}-', id) AS v"
            )
            for side in ("rev", "now"):
                di, ii = _load(side)
                dpath, ipath = tables[side]
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                di.upsert_delta(spark, dpath, upd, ["id"])
                res[f"delta_{side}"].append(time.perf_counter() - t0)
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                ii.upsert_iceberg(spark, ipath, upd, ["id"])
                res[f"iceberg_{side}"].append(time.perf_counter() - t0)
        out = {"rev": args.rev, "n": args.n}
        for fmt in ("delta", "iceberg"):
            # drop the first (cold) commit; report warm mean + min
            r = res[f"{fmt}_rev"][1:]
            n = res[f"{fmt}_now"][1:]
            out[fmt] = {
                "rev_mean": round(sum(r) / len(r), 3),
                "now_mean": round(sum(n) / len(n), 3),
                "rev_min": round(min(r), 3),
                "now_min": round(min(n), 3),
                "delta_pct_mean": round(
                    (sum(n) - sum(r)) / sum(r) * 100, 1
                ),
            }
        print(json.dumps(out))
    finally:
        for k in list(sys.modules):
            if k.split(".")[0] == _PKG and k not in saved:
                del sys.modules[k]
        sys.modules.update(saved)
        if tmp in sys.path:
            sys.path.remove(tmp)
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
