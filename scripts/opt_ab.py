"""Same-session A/B: working tree vs a git rev (default HEAD).

Adjudicates each round-13 optimization the way bench.py's
_prev_round_ab adjudicates rounds: both variants' plans are built in
ONE SparkSession (the committed rev's package imported from a `git
archive` under a swapped module namespace), then timed interleaved
(gc, rev, gc, worktree, xN — min of each). Cross-session totals on
this host swing +/-30%; interleaved min-of-N cancels that.

Usage:
    python scripts/opt_ab.py --names a,b,c [--rev HEAD] [--reps 5]
        [--sf DIR] [--conf k=v,...]        # conf applied to BOTH sides

delta_pct > 0 means the WORKING TREE is slower than the rev.
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
    ap.add_argument("--names", required=True)
    ap.add_argument("--rev", default="HEAD")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    ap.add_argument("--conf", default="")
    args = ap.parse_args()

    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (
        DEFAULT_CPUS,
        EngineConfig,
    )

    extra = {"spark.sql.files.maxPartitionBytes": "4m"}
    for kv in args.conf.split(","):
        if kv.strip():
            k, v = kv.split("=", 1)
            extra[k] = v
    spark = EngineConfig(
        app_name="opt_ab", master=f"local[{DEFAULT_CPUS}]", extra=extra
    ).session()

    from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES

    tmp = tempfile.mkdtemp(prefix="opt_ab_")
    saved = {k: v for k, v in sys.modules.items() if k.split(".")[0] == _PKG}
    try:
        ar = subprocess.run(
            ["git", "archive", args.rev, _PKG],
            capture_output=True,
            cwd=ROOT,
            timeout=60,
            check=True,
        )
        subprocess.run(
            ["tar", "-x", "-C", tmp], input=ar.stdout, check=True, timeout=60
        )
        for k in saved:
            del sys.modules[k]
        sys.path.insert(0, tmp)
        prev_q = importlib.import_module(f"{_PKG}.plans.queries").QUERIES
        out: dict[str, dict] = {}
        for name in [n for n in args.names.split(",") if n]:
            if tmp not in sys.path:
                sys.path.insert(0, tmp)
            df_prev = prev_q[name].fn(spark, args.sf)
            # r13 fix: a query fn that lazily imports its operator
            # module (e.g. `from ..operators.graph import ...` inside
            # the fn) resolves via sys.modules AT BUILD TIME. The rev
            # build may have imported pkg submodules that the worktree
            # snapshot `saved` never loaded — update(saved) would
            # leave those REV modules live and the "now" side would
            # silently run rev code (observed: graph-query A/Bs
            # measuring rev-vs-rev). Purge ALL pkg modules and the
            # tmp path, then restore the worktree snapshot, so any
            # lazy import on the now side loads worktree code.
            for k in [
                k for k in sys.modules if k.split(".")[0] == _PKG
            ]:
                del sys.modules[k]
            if tmp in sys.path:
                sys.path.remove(tmp)
            sys.modules.update(saved)
            df_now = QUERIES[name].fn(spark, args.sf)
            for k in [
                k for k in sys.modules if k.split(".")[0] == _PKG
            ]:
                del sys.modules[k]
            best = {"rev": float("inf"), "now": float("inf")}
            for df, _tag in ((df_prev, "rev"), (df_now, "now")):
                df.write.format("noop").mode("overwrite").save()  # warmup
            for _ in range(args.reps):
                for df, tag in ((df_prev, "rev"), (df_now, "now")):
                    spark.sparkContext._jvm.System.gc()
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    best[tag] = min(best[tag], time.perf_counter() - t0)
            out[name] = {
                "rev": round(best["rev"], 3),
                "now": round(best["now"], 3),
                "delta_pct": round(
                    (best["now"] - best["rev"]) / best["rev"] * 100, 1
                ),
            }
            print(f"{name}: rev={best['rev']:.3f}s now={best['now']:.3f}s "
                  f"({out[name]['delta_pct']:+.1f}%)")
        print(json.dumps({"rev": args.rev, "queries": out}))
    finally:
        for k in list(sys.modules):
            if k.split(".")[0] == _PKG and k not in saved:
                del sys.modules[k]
        sys.modules.update(saved)
        if tmp in sys.path:
            sys.path.remove(tmp)
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
