"""Same-session A/B of the laketail catch-up (bench fixture) vs a
git rev: the Delta source fixture (1 snapshot + 4 keyed upserts,
bench.py's _laketail_catchup_bench shape) is built ONCE, then each
side's read_delta_cdf(0..4) -> LWW reduce runs under the noop sink,
interleaved min-of-N (gc-drained). The downstream table write is
identical on both sides and excluded, so the delta isolates the CDF
computation — the part the cross-version batching targets.

Usage: python scripts/exp_laketail_ab.py [--rev HEAD] [--reps 5]
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
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (
        DEFAULT_CPUS,
        EngineConfig,
    )

    spark = EngineConfig(
        app_name="laketail_ab",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (  # noqa: E501
        export_delta,
        upsert_delta,
    )

    root = tempfile.mkdtemp(prefix="laketail_ab_")
    src = f"{root}/tail_src"
    base = spark.range(0, 5000).selectExpr("id", "concat('v', id) AS v")
    export_delta(base, src)
    for i in range(4):
        upd = spark.range(i * 500, i * 500 + 500).selectExpr(
            "id", f"concat('u{i}-', id) AS v"
        )
        upsert_delta(spark, src, upd, ["id"])

    def tail_df(pkg_root):
        """CDF read + LWW reduce of the whole range, as tail_delta_once
        builds it (minus the sink write)."""
        di = importlib.import_module(f"{_PKG}.sources.delta_interop")
        lt = importlib.import_module(f"{_PKG}.streaming.laketail")
        changes = di.read_delta_cdf(spark, src, 0, 4)
        extra = [
            c
            for c in changes.columns
            if c.startswith("_")
            and c not in ("_change_type", "_commit_version")
        ]
        return lt._reduce_changes(
            changes.drop(*extra), ["id"], "_commit_version"
        )

    tmp = tempfile.mkdtemp(prefix="laketail_ab_rev_")
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
        for k in list(saved):
            del sys.modules[k]
        sys.path.insert(0, tmp)
        df_prev = tail_df(tmp)
        # purge rev modules + path, restore worktree (opt_ab r13 rule)
        for k in [k for k in sys.modules if k.split(".")[0] == _PKG]:
            del sys.modules[k]
        sys.path.remove(tmp)
        sys.modules.update(saved)
        df_now = tail_df(ROOT)
        prev_rows = df_prev.count()
        now_rows = df_now.count()
        best = {"rev": float("inf"), "now": float("inf")}
        for df in (df_prev, df_now):
            df.write.format("noop").mode("overwrite").save()  # warmup
        for _ in range(args.reps):
            for df, tag in ((df_prev, "rev"), (df_now, "now")):
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best[tag] = min(best[tag], time.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "rev": args.rev,
                    "rows": {"rev": prev_rows, "now": now_rows},
                    "tail_cdf_reduce_sec": {
                        "rev": round(best["rev"], 3),
                        "now": round(best["now"], 3),
                        "delta_pct": round(
                            (best["now"] - best["rev"]) / best["rev"] * 100,
                            1,
                        ),
                    },
                }
            )
        )
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
