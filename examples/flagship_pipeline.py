"""Runnable walkthrough of the engine — the same journey the
reference's Zeppelin notebook takes (CDC-Hudi-Notebook.zpln), on
Spark:

  1. env config                      (≙ ¶3/¶5 checkpoint setup)
  2. upsert-table demo t1            (≙ ¶7-¶15: create/insert/upsert)
  3. CDC feeds + streaming flagship  (≙ ¶24-¶53: sources + join → view)
  4. query-back + invariant checks   (≙ ¶57-¶61: snapshot + dup check)

Run:  python examples/flagship_pipeline.py   (finishes in ~1 min)
"""

from __future__ import annotations

import datetime as dt
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark import EngineConfig, EngineSession
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema,
    write_feed_events,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.workload import (
    TicketWorkload,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.ivm import (
    FlagshipStreamRunner,
    mux_envelope,
)

root = tempfile.mkdtemp(prefix="flagship_demo_")
eng = EngineSession(
    config=EngineConfig(app_name="flagship-demo", master="local[8]",
                        shuffle_partitions=8, driver_memory="8g"),
    registry_path=f"{root}/tables.json",
)
spark = eng.spark

# -- 2. the t1 upsert-table demo (¶7-¶15) ----------------------------------
t1 = eng.create_upsert_table("t1", f"{root}/t1", key=["uuid"])
seed = spark.createDataFrame(
    [("id1", "Danny", 23), ("id2", "Stephen", 33), ("id3", "Julian", 53)],
    "uuid string, name string, age int",
)
eng.insert_into("t1", seed, commit_id="seed")
eng.insert_into(
    "t1",
    spark.createDataFrame([("id1", "Francisco Morillo", 29)],
                          "uuid string, name string, age int"),
    commit_id="upsert-id1",
)
print("\n== t1 after upsert of id1 (¶15: one live row per key) ==")
eng.table("t1").orderBy("uuid").show()

# -- 3. CDC feeds → streaming flagship (¶24-¶53) ---------------------------
PERSON = T.StructType(
    [T.StructField("id", T.DoubleType()), T.StructField("full_name", T.StringType()),
     T.StructField("last_name", T.StringType()), T.StructField("first_name", T.StringType())]
)
persons = spark.createDataFrame(
    [Row(op="I", ts=dt.datetime(2024, 1, 1), seq=i, before=None,
         after=Row(id=float(i), full_name=f"Person Num{i}",
                   last_name=f"Num{i}", first_name="Person"))
     for i in range(1, 26)],
    envelope_schema(PERSON),
)
feed = f"{root}/feed"
runner = FlagshipStreamRunner(spark, f"{root}/flagship", feed)
wl = TicketWorkload(spark, n_persons=25, n_tickets=60, seed=7)

write_feed_events(spark, feed, mux_envelope("person", persons), commit_id="p0")
write_feed_events(spark, feed, mux_envelope("ticket", wl.snapshot_tickets()),
                  commit_id="t0")
for minute in range(3):  # three "minutes" of generateticketactivity
    t_env, h_env = wl.transfer_batch(10)
    write_feed_events(
        spark, feed,
        mux_envelope("ticket", t_env).unionByName(mux_envelope("hist", h_env)),
        commit_id=f"m{minute}",
    )
q = runner.start()
q.awaitTermination(300)

# -- 4. query-back (¶57) + no-duplicates invariant (¶61) -------------------
view = runner.ivm.view.snapshot()
print("== ticket_view sample (¶57 shape: full_name, id, price, tx time) ==")
view.orderBy("full_name").show(8, truncate=False)
dups = (view.groupBy("full_name").agg(F.count("*").alias("cnt"))
        .filter("cnt > 1").count())
print(f"duplicate keys in view (must be 0): {dups}")
assert dups == 0

meta = runner.ivm.view.snapshot(with_meta=True).select(
    "full_name", "_record_key", "_commit_seq", "_op"
)
print("== audit columns (≙ _hoodie_*) ==")
meta.show(4, truncate=False)

# -- 5. the round-5 SQL surface on the same session ------------------------
import os as _os

from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

eng = EngineSession(
    spark=spark, registry_path=_os.path.join(root, "reg", "tables.json")
)
eng.register_testdata("/root/testdata/sf0.001")
print("== Flink window TVF spelling through eng.sql ==")
eng.sql(
    "SELECT window_start, COUNT(*) AS n FROM TABLE(TUMBLE(TABLE events, "
    "DESCRIPTOR(ts), INTERVAL '6' HOURS)) GROUP BY window_start "
    "ORDER BY window_start"
).show(4)

print("== materialized view over a CDC feed (retract-correct aggs) ==")
import datetime as _dt

from pyspark.sql import Row as _Row
from pyspark.sql import types as _T

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema as _envs,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    write_feed_events as _wfe,
)

_ROW = _T.StructType(
    [
        _T.StructField("id", _T.LongType()),
        _T.StructField("cat", _T.StringType()),
        _T.StructField("amt", _T.DoubleType()),
    ]
)
mv_feed = _os.path.join(root, "mv_feed")
_os.makedirs(mv_feed)
_wfe(spark, mv_feed, spark.createDataFrame(
    [
        _Row(op="I", ts=_dt.datetime(2024, 1, 1), seq=1, before=None,
             after=_Row(id=1, cat="a", amt=5.0)),
        _Row(op="I", ts=_dt.datetime(2024, 1, 1), seq=2, before=None,
             after=_Row(id=2, cat="a", amt=9.0)),
    ],
    _envs(_ROW),
))
eng.registry.create_table("demo_feed", "feed", mv_feed)
eng.sql(
    "CREATE MATERIALIZED VIEW mv_cats AS SELECT cat, SUM(amt) AS total, "
    "COUNT(*) AS n, MAX(amt) AS hi FROM demo_feed GROUP BY cat"
)
eng.sql("SELECT * FROM mv_cats").show()
# a DELETE retracts the current MAX; REFRESH applies just the delta
_wfe(spark, mv_feed, spark.createDataFrame(
    [_Row(op="D", ts=_dt.datetime(2024, 1, 2), seq=3,
          before=_Row(id=2, cat="a", amt=9.0), after=None)],
    _envs(_ROW),
))
eng.sql("REFRESH MATERIALIZED VIEW mv_cats")
eng.sql("SELECT * FROM mv_cats").show()

print("== table services DDL: history + catalog ==")
eng.registry.create_table("view_tbl", "upsert", _os.path.join(root, "flagship", "view"), key=["full_name"])
eng.sql("DESCRIBE HISTORY view_tbl").orderBy("seq").show(5)
eng.sql("SHOW ENGINE TABLES").show(truncate=False)

spark.stop()
shutil.rmtree(root, ignore_errors=True)
print("demo complete")
