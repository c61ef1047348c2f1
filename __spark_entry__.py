"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All real logic lives in the ``streaming_data_lake_flink_cdc_apache_hudi_spark``
package; this file just adapts its query registry
(``plans/queries.py``) to the driver's interface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import (  # noqa: E402
    QUERIES,
    oracle_sqls,
    query_fns,
)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (ticket_view, zpln:2317 ¶53) on sf0.001."""
    return QUERIES["ticket_view"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return query_fns()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracle SQL per query (omitted -> rows-only check)."""
    return oracle_sqls()
