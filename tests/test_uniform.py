"""UniForm-style export: one parquet dataset, two formats' metadata —
both readers must mount the SAME files and return identical rows."""

from __future__ import annotations

import json
import os

import pytest

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import read_delta
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
    live_data_files,
    read_iceberg,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import load_table
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import export_uniform

from .conftest import SF_SMOKE


def test_uniform_export_both_readers_same_rows(spark, tmp_path):
    src = load_table(spark, SF_SMOKE, "nation")
    path = str(tmp_path / "uniform_nation")
    n = export_uniform(src, path, name="nation")
    assert n >= 1
    want = sorted(map(tuple, src.collect()))
    got_delta = sorted(map(tuple, read_delta(spark, path).collect()))
    got_ice = sorted(map(tuple, read_iceberg(spark, path).collect()))
    assert got_delta == want
    assert got_ice == want
    # both formats' metadata genuinely name the SAME files
    with open(os.path.join(path, "_delta_log", "%020d.json" % 0)) as fh:
        delta_files = sorted(
            os.path.join(path, json.loads(l)["add"]["path"])
            for l in fh
            if '"add"' in l
        )
    assert delta_files == live_data_files(path)
    # one copy of the data on disk (no per-format duplication)
    assert (
        len(
            [
                f
                for f in os.listdir(path)
                if f.endswith(".parquet") and not f.startswith("_")
            ]
        )
        == n
    )
    assert not os.path.exists(os.path.join(path, "data"))


def test_uniform_rejects_incompatible_options(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import export_delta
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
    )

    df = load_table(spark, SF_SMOKE, "region")
    with pytest.raises(ValueError, match="column_mapping"):
        export_delta(
            df,
            str(tmp_path / "x"),
            column_mapping=True,
            data_files=["a.parquet"],
        )
    with pytest.raises(ValueError, match="unpartitioned"):
        export_iceberg(
            df,
            str(tmp_path / "y"),
            partition_by=["r_regionkey"],
            data_files=["a.parquet"],
        )
