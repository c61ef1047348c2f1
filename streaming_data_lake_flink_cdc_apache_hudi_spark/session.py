"""EngineSession — the user-facing facade (≙ the Zeppelin notebook
role in the reference: one handle that configures the environment,
resolves tables, and runs SQL / named queries; SURVEY.md §3).

A user of the reference works through notebook paragraphs: env config
(¶3/¶5), CREATE TABLE registrations (¶7, ¶24, ...), %flink.ssql
queries (¶49/¶53), and Athena query-back. Here the same workflow is:

    eng = EngineSession()                      # env config (E1-E4)
    eng.register_testdata("/root/testdata/sf0.01")
    eng.sql("SELECT ... FROM customer JOIN orders ...")   # ssql ≙ sql
    eng.query("ticket_view")                   # named flagship query
    t = eng.create_upsert_table("view1", path, key=["k"])  # ≙ Hudi DDL
    t.write(delta); t.snapshot()               # sink + query-back
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .catalog import TableRegistry
from .config import EngineConfig
from .plans.queries import QUERIES
from .sources.parquet import TPCH_TABLES, load_table
from .streaming.upsert_sink import UpsertLakeTable


class EngineSession:
    def __init__(
        self,
        config: EngineConfig | None = None,
        spark: SparkSession | None = None,
        registry_path: str | None = None,
    ):
        self.config = config or EngineConfig()
        self.spark = spark or self.config.session()
        self.registry = TableRegistry(
            self.spark,
            registry_path
            or os.path.join(os.getcwd(), ".engine", "tables.json"),
        )

    # -- table management (≙ S6-S8) -----------------------------------------

    def register_testdata(self, sf_dir: str) -> list[str]:
        """Register the driver's parquet tables as queryable views."""
        for name in TPCH_TABLES:
            load_table(self.spark, sf_dir, name).createOrReplaceTempView(name)
        return list(TPCH_TABLES)

    def create_upsert_table(
        self, name: str, path: str, key: list[str], **options
    ) -> UpsertLakeTable:
        self.registry.create_table(
            name, "upsert", path, key=key, if_not_exists=True, **options
        )
        return self.registry.upsert_handle(name)

    def table(self, name: str) -> DataFrame:
        return self.registry.resolve(name)

    def drop_table(self, name: str) -> None:
        self.registry.drop_table(name)

    # -- query entry points (≙ A: %flink.ssql, D: Athena) -------------------

    def sql(self, statement: str) -> DataFrame:
        """SQL entry point (≙ %flink.ssql). Engine-table DDL strings —
        CREATE TABLE ... WITH ('connector' = ...) / USING upsert
        OPTIONS(...) and DROP TABLE — are routed into the registry so
        the notebook's paste-DDL workflow (¶7/¶24) works verbatim;
        everything else goes to spark.sql."""
        handled = self.registry.execute_ddl(statement)
        return handled if handled is not None else self.spark.sql(statement)

    def query(self, name: str, sf_dir: str = "/root/testdata/sf0.01") -> DataFrame:
        """Run a named query from the engine's registry (SURVEY.md §2
        inventory; see plans/queries.py)."""
        return QUERIES[name].fn(self.spark, sf_dir)

    def queries(self) -> dict[str, str]:
        return {n: s.doc for n, s in QUERIES.items()}

    # -- write path (≙ R1/R2: INSERT INTO sink SELECT ...) ------------------

    def insert_into(self, name: str, df: DataFrame, commit_id: str | None = None) -> int:
        """INSERT INTO a registered upsert table (batch flavor of the
        flagship R2 pipeline; literal-rows R1 when df is literals)."""
        return self.registry.upsert_handle(name).write(df, commit_id=commit_id)
