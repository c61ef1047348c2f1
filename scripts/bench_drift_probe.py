"""Pinned-rev drift probe (r12 — VERDICT r11 ask #2).

Cross-session sf0.1 headline totals inflated 5.665 s (r9) -> 7.114 s
(r10) -> 8.796 s (r11) while every same-session A/B said code was
flat. This probe settles it: build the headline plans from THREE
pinned package trees — the r9 snapshot, the r10 snapshot, and HEAD —
inside ONE SparkSession, then time them INTERLEAVED (gc, r9, gc, r10,
gc, head; N repeat rounds; min per rev/query). If the old revisions
reproduce their old totals today, the inflation is accumulated code
cost; if all three land at the same (current) level, it is the host
environment / JVM state, exactly as the A/B numbers have implied.

Usage::

    python scripts/bench_drift_probe.py [r9_rev r10_rev] > DRIFT.json

Revs default to the round-9/round-10 artifact commits (the code trees
those rounds' BENCH numbers were measured on). Prints one JSON doc.
"""
from __future__ import annotations

import importlib
import json
import os
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

_PKG = "streaming_data_lake_flink_cdc_apache_hudi_spark"
DEFAULT_REVS = {
    "r9": "dd884d8",   # round 9: verdict/advice/correctness/bench
    "r10": "0ca3b8c",  # round 10 (also BENCH_r11's ab_prev_rev)
}
REPEATS = 3


def _load_queries(rev: str | None) -> dict:
    """QUERIES registry from a pinned package tree (None = HEAD
    working tree). Same git-archive + module-swap mechanism as
    bench.py's _prev_round_ab."""
    saved = {
        k: v for k, v in sys.modules.items() if k.split(".")[0] == _PKG
    }
    for k in saved:
        del sys.modules[k]
    if rev is None:
        q = importlib.import_module(f"{_PKG}.plans.queries").QUERIES
        mods = {
            k: v for k, v in sys.modules.items()
            if k.split(".")[0] == _PKG
        }
        return {"queries": q, "mods": mods, "saved": saved}
    tmp = tempfile.mkdtemp(prefix=f"drift_{rev}_")
    ar = subprocess.run(
        ["git", "archive", rev, _PKG],
        capture_output=True, cwd=HERE, timeout=60, check=True,
    )
    subprocess.run(
        ["tar", "-x", "-C", tmp], input=ar.stdout, check=True, timeout=60
    )
    sys.path.insert(0, tmp)
    q = importlib.import_module(f"{_PKG}.plans.queries").QUERIES
    mods = {
        k: v for k, v in sys.modules.items() if k.split(".")[0] == _PKG
    }
    for k in mods:
        del sys.modules[k]
    sys.path.remove(tmp)
    sys.modules.update(saved)
    return {"queries": q, "mods": mods, "saved": saved}


def main() -> None:
    revs = dict(DEFAULT_REVS)
    if len(sys.argv) == 3:
        revs = {"r9": sys.argv[1], "r10": sys.argv[2]}

    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import EngineConfig

    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = EngineConfig(
        app_name="drift_probe",
        master=f"local[{cpus}]",
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()
    spark.sparkContext.setLogLevel("ERROR")

    loaded: dict[str, dict] = {}
    for tag, rev in list(revs.items()) + [("head", None)]:
        loaded[tag] = _load_queries(rev)

    # headline names common to all three registries
    head_q = loaded["head"]["queries"]
    names = [
        n for n, s in head_q.items()
        if s.headline
        and all(n in loaded[t]["queries"] for t in loaded)
    ]

    # build every plan under its OWN module namespace (query fns
    # resolve module globals at call time)
    plans: dict[str, dict] = {t: {} for t in loaded}
    for tag, bundle in loaded.items():
        cur = {
            k: v for k, v in sys.modules.items()
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

    order = list(plans)  # r9, r10, head
    best: dict[str, dict[str, float]] = {
        t: {n: float("inf") for n in names} for t in order
    }
    for n in names:  # warmup all revs' plans
        for t in order:
            plans[t][n].write.format("noop").mode("overwrite").save()
    for _ in range(REPEATS):
        for n in names:
            for t in order:  # interleave revs per query per round
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                plans[t][n].write.format("noop").mode("overwrite").save()
                best[t][n] = min(
                    best[t][n], time.perf_counter() - t0
                )
    out = {
        "sf_dir": sf_dir,
        "repeats": REPEATS,
        "revs": {**revs, "head": "HEAD"},
        "totals": {
            t: round(sum(best[t].values()), 3) for t in order
        },
        "queries": {
            n: {t: round(best[t][n], 3) for t in order} for n in names
        },
    }
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
