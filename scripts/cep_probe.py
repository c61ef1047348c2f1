"""CEP drift re-adjudication (r13 — VERDICT r12 ask #7).

``cep_pattern_match`` was the sole out-of-band same-session A/B name
two rounds running (+9.3% r11, +16.5% r12) on byte-identical
``operators/cep.py``. This probe settles real-vs-noise the same way
the r12 drift probe settled the cross-session totals: build the CEP
plans from the PINNED r10 tree and HEAD inside ONE SparkSession and
time them interleaved (gc-separated) for N repeat rounds, recording
min / median / max per (rev, query) — a real regression shows HEAD
slower than r10 beyond the spread; noise shows overlapping spreads.

Usage::

    python scripts/cep_probe.py [repeats] > CEP_PROBE.json
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)
sys.path.insert(0, os.path.join(HERE, "scripts"))

from bench_drift_probe import _PKG, _load_queries  # noqa: E402

R10_REV = "0ca3b8c"
NAMES = [
    "cep_pattern_match",
    "cep_measures_match",
    "cep_quantified_match",
    "cep_all_rows_match",
]


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (
        EngineConfig,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = EngineConfig(
        app_name="cep_probe",
        master=f"local[{cpus}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    spark.sparkContext.setLogLevel("ERROR")

    loaded = {
        "r10": _load_queries(R10_REV),
        "head": _load_queries(None),
    }
    names = [
        n
        for n in NAMES
        if all(n in loaded[t]["queries"] for t in loaded)
    ]
    plans: dict[str, dict] = {t: {} for t in loaded}
    for tag, bundle in loaded.items():
        cur = {
            k: v
            for k, v in sys.modules.items()
            if k.split(".")[0] == _PKG
        }
        for k in cur:
            del sys.modules[k]
        sys.modules.update(bundle["mods"])
        for n in names:
            plans[tag][n] = bundle["queries"][n].fn(spark, sf_dir)
        for k in bundle["mods"]:
            sys.modules.pop(k, None)
        sys.modules.update(cur)

    order = list(plans)
    times: dict[str, dict[str, list[float]]] = {
        t: {n: [] for n in names} for t in order
    }
    for n in names:  # warmup
        for t in order:
            plans[t][n].write.format("noop").mode("overwrite").save()
    for _ in range(repeats):
        for n in names:
            for t in order:
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                plans[t][n].write.format("noop").mode("overwrite").save()
                times[t][n].append(time.perf_counter() - t0)

    out: dict = {"repeats": repeats, "r10_rev": R10_REV, "queries": {}}
    for n in names:
        row = {}
        for t in order:
            xs = sorted(times[t][n])
            row[t] = {
                "min": round(xs[0], 4),
                "median": round(statistics.median(xs), 4),
                "max": round(xs[-1], 4),
            }
        row["head_vs_r10_min_pct"] = round(
            100.0 * (row["head"]["min"] / row["r10"]["min"] - 1), 1
        )
        row["head_vs_r10_median_pct"] = round(
            100.0 * (row["head"]["median"] / row["r10"]["median"] - 1), 1
        )
        out["queries"][n] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
