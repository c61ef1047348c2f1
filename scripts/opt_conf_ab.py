"""Same-session config A/B: one code tree, two SQL-conf sets.

Runtime-settable SQL confs (split sizing, join preferences, AQE
knobs) are flipped between interleaved timed runs in ONE session, so
the comparison carries no cross-session noise and no code diff.
Plans are rebuilt under each conf set (fresh fn() call per run —
conf is read at planning/execution time).

Usage:
    python scripts/opt_conf_ab.py --names a,b --confb k=v[,k=v...]
        [--confa k=v,...] [--reps 5] [--sf DIR]

delta_pct > 0 means conf B is slower than conf A (baseline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(HERE))


def _parse(s: str) -> dict[str, str]:
    out = {}
    for kv in s.split(","):
        if kv.strip():
            k, v = kv.split("=", 1)
            out[k] = v
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--confa", default="")
    ap.add_argument("--confb", required=True)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    )
    args = ap.parse_args()

    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (
        DEFAULT_CPUS,
        EngineConfig,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES

    spark = EngineConfig(
        app_name="opt_conf_ab",
        master=f"local[{DEFAULT_CPUS}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()

    base = {
        k: spark.conf.get(k, None)
        for k in set(_parse(args.confa)) | set(_parse(args.confb))
    }
    confa = {**base, **_parse(args.confa)}
    confb = {**base, **_parse(args.confb)}

    def apply(conf: dict) -> None:
        for k, v in conf.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    out: dict[str, dict] = {}
    for name in [n for n in args.names.split(",") if n]:
        best = {"a": float("inf"), "b": float("inf")}
        for tag, conf in (("a", confa), ("b", confb)):  # warmups
            apply(conf)
            QUERIES[name].fn(spark, args.sf).write.format("noop").mode(
                "overwrite"
            ).save()
        for _ in range(args.reps):
            for tag, conf in (("a", confa), ("b", confb)):
                apply(conf)
                df = QUERIES[name].fn(spark, args.sf)
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                df.write.format("noop").mode("overwrite").save()
                best[tag] = min(best[tag], time.perf_counter() - t0)
        out[name] = {
            "a": round(best["a"], 3),
            "b": round(best["b"], 3),
            "delta_pct": round((best["b"] - best["a"]) / best["a"] * 100, 1),
        }
        print(f"{name}: a={best['a']:.3f}s b={best['b']:.3f}s "
              f"({out[name]['delta_pct']:+.1f}%)")
    print(json.dumps({"confb": _parse(args.confb), "queries": out}))
    spark.stop()


if __name__ == "__main__":
    main()
