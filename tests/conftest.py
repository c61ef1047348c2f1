from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_lake_flink_cdc_apache_hudi_spark.config import EngineConfig

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.01"


@pytest.fixture(scope="session")
def spark():
    cfg = EngineConfig(
        master="local[8]",
        shuffle_partitions=8,
        driver_memory="8g",
        app_name="engine-tests",
    )
    s = cfg.session()
    yield s
    s.stop()
