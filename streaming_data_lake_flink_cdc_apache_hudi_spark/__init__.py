"""PySpark-native analytics engine with the query & data-processing
capabilities of aws-samples/streaming-data-lake-flink-cdc-apache-hudi.

The reference is a CDC → streaming-SQL → keyed-upsert-lake pipeline
(Flink SQL + Hudi; see SURVEY.md). This package re-expresses those
semantics Spark-first:

- ``config``     — EngineConfig / SparkSession factory (≙ ¶3/¶5 env setup)
- ``catalog``    — table registry (≙ Glue catalog role)
- ``sources``    — parquet snapshot + CDC changelog feed (≙ postgres-cdc)
- ``operators``  — upsert/LWW, changelog normalize, flagship join,
                   dedup / similarity / text extensions
- ``streaming``  — micro-batch pipeline + bucketed upsert sink (≙ Hudi MoR)
- ``plans``      — query registry backing __spark_entry__.py
"""

__version__ = "0.1.0"

from .config import EngineConfig, get_spark  # noqa: E402,F401
from .session import EngineSession  # noqa: E402,F401
