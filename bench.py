"""Benchmark runner (driver contract): run the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with the noop sink (full execution, no driver
collect). Each query gets one warmup run (JVM/codegen/broadcast
warmup) and the second run is reported — steady-state latency, which
is what a resident engine serves.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import (  # noqa: E402
    DEFAULT_CPUS,
    DEFAULT_SF_DIR,
    EngineConfig,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES  # noqa: E402


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)
    spark = EngineConfig(
        app_name="bench",
        master=f"local[{DEFAULT_CPUS}]",
        # testdata is one smallish parquet file per table; split finer
        # so scans parallelize across local cores (cluster deployments
        # keep the 128m default — many files there)
        extra={"spark.sql.files.maxPartitionBytes": "4m"},
    ).session()

    names = [n for n, s in QUERIES.items() if s.headline] or list(QUERIES)
    timings: dict[str, float] = {}
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()  # warmup
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
