"""Round-13 optimization measurement harness (guide §1).

Times a set of registry queries with the bench protocol (warmup save,
then min-of-N noop saves with a System.gc() before each) and dumps
``explain("formatted")`` per query, so before/after comparisons use
the exact methodology the driver's bench uses.

Usage:
    python scripts/opt_measure.py [--names a,b,c] [--sf DIR] [--reps N]
        [--plans-dir plans/r13] [--tag before|after]

Writes <plans-dir>/<query>_<tag>.txt and prints one timing line per
query plus a JSON summary to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (  # noqa: E402
    DEFAULT_CPUS,
    DEFAULT_SF_DIR,
    EngineConfig,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import (  # noqa: E402
    QUERIES,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", default="")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR))
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--plans-dir", default="")
    ap.add_argument("--tag", default="before")
    ap.add_argument("--no-time", action="store_true", help="plans only")
    args = ap.parse_args()

    spark = EngineConfig(
        app_name="opt_measure",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()

    if args.names:
        names = [n for n in args.names.split(",") if n]
    else:
        names = [n for n, s in QUERIES.items() if s.headline]

    out: dict[str, float] = {}
    for name in names:
        if name not in QUERIES:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        spark.sparkContext.setJobDescription(f"opt:{name}")
        t_build0 = time.perf_counter()
        df = QUERIES[name].fn(spark, args.sf)
        build_s = time.perf_counter() - t_build0
        if args.plans_dir:
            os.makedirs(args.plans_dir, exist_ok=True)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(
                os.path.join(args.plans_dir, f"{name}_{args.tag}.txt"), "w"
            ) as fh:
                fh.write(plan)
        if args.no_time:
            print(f"{name}: plan dumped (build {build_s:.3f}s)")
            continue
        df.write.format("noop").mode("overwrite").save()  # warmup
        best = float("inf")
        for _ in range(args.reps):
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        out[name] = round(best, 3)
        print(f"{name}: {best:.3f}s  (build {build_s:.3f}s)")
    print(json.dumps({"sf": args.sf, "timings": out, "total": round(sum(out.values()), 3)}))
    spark.stop()


if __name__ == "__main__":
    main()
