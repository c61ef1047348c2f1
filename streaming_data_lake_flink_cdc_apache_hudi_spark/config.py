"""Engine configuration and SparkSession factory.

Mirrors the reference's environment-config entry point (SURVEY.md §3 B):
the notebook mutates a shared StreamExecutionEnvironment
(``senv.enableCheckpointing(9000)``, CDC-Hudi-Notebook.zpln:131 ¶3;
checkpoint tolerance, zpln:214 ¶5). Here that role is played by an
``EngineConfig`` dataclass that builds / configures the SparkSession.

Scale notes (100 TB target):
- AQE on: runtime coalescing, skew-join splitting, join re-planning.
- shuffle.partitions defaults to the local core count; on a real
  cluster set it to 2-3x total executor cores (or rely on AQE
  coalescing from a high initial value).
- Arrow enabled: every Pandas-UDF extension operator ships batches,
  not rows.
- Session timezone pinned UTC so timestamp semantics are stable
  across engines (and vs. the DuckDB oracle).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


@dataclass
class EngineConfig:
    """Session-level knobs (≙ reference's checkpoint/parallelism config).

    ``checkpoint_interval_secs`` maps the reference's 1-min Flink
    checkpoint (= Hudi commit) interval onto Structured Streaming's
    micro-batch trigger (SURVEY.md §2.3 E1).
    """

    app_name: str = "streaming_data_lake_flink_cdc_apache_hudi_spark"
    master: str = f"local[{DEFAULT_CPUS}]"
    shuffle_partitions: int = DEFAULT_CPUS
    checkpoint_interval_secs: int = 60  # ≙ execution.checkpointing.interval=1min
    driver_memory: str = "48g"
    session_timezone: str = "UTC"
    extra: dict = field(default_factory=dict)

    def session(self) -> SparkSession:
        b = (
            SparkSession.builder.master(self.master)
            .appName(self.app_name)
            .config("spark.sql.shuffle.partitions", str(self.shuffle_partitions))
            .config("spark.sql.adaptive.enabled", "true")
            .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
            .config("spark.sql.adaptive.skewJoin.enabled", "true")
            .config("spark.sql.session.timeZone", self.session_timezone)
            .config("spark.sql.execution.arrow.pyspark.enabled", "true")
            .config("spark.driver.memory", self.driver_memory)
            .config("spark.ui.enabled", "false")
            .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        )
        for k, v in self.extra.items():
            b = b.config(k, str(v))
        spark = b.getOrCreate()
        spark.sparkContext.setLogLevel("WARN")
        return spark


def get_spark(**overrides) -> SparkSession:
    """Build (or reuse) the engine SparkSession with default config."""
    return EngineConfig(**overrides).session()
