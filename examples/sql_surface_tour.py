"""Runnable tour of the engine's SQL surface beyond the reference's
own paragraphs — the statements a Flink/lakehouse user would paste
next (SURVEY.md §2.5 extension surface):

  1. Flink window TVFs: TUMBLE / HOP / SESSION / CUMULATE
  2. MATCH_RECOGNIZE with greedy quantifiers + MEASURES — plus
     reluctant quantifiers (B+?), AFTER MATCH SKIP TO LAST <var>,
     MATCH_NUMBER() and whole-match (unqualified) aggregates
  2c. the three CDC wire formats (canal-json, maxwell-json,
     upsert-kafka tombstones) decoding to ONE engine envelope
  3. Lakehouse DML: MERGE, DELETE FROM, UPDATE, INSERT OVERWRITE,
     TRUNCATE, and VERSION / TIMESTAMP AS OF time travel

Run:  python examples/sql_surface_tour.py   (finishes in ~1 min)
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from streaming_data_lake_flink_cdc_apache_hudi_spark import EngineConfig, EngineSession

root = tempfile.mkdtemp(prefix="sql_tour_")
spark = EngineConfig(app_name="sql_tour", master="local[4]").session()
spark.sparkContext.setLogLevel("ERROR")
eng = EngineSession(spark=spark, registry_path=f"{root}/reg/tables.json")
eng.register_testdata("/root/testdata/sf0.001")

print("== 1. Flink window TVFs ======================================")
for label, tvf in [
    ("TUMBLE 10m", "TUMBLE(TABLE events, DESCRIPTOR(ts), INTERVAL '10' MINUTES)"),
    ("HOP 5m/10m", "HOP(TABLE events, DESCRIPTOR(ts), INTERVAL '5' MINUTES, "
                   "INTERVAL '10' MINUTES)"),
    ("CUMULATE 2m/10m", "CUMULATE(TABLE events, DESCRIPTOR(ts), "
                        "INTERVAL '2' MINUTES, INTERVAL '10' MINUTES)"),
]:
    n = eng.sql(
        f"SELECT window_start, window_end, COUNT(*) AS n FROM TABLE({tvf}) "
        "GROUP BY window_start, window_end"
    ).count()
    print(f"  {label}: {n} windows")
n = eng.sql(
    "SELECT user_id, window_start, window_end, COUNT(*) AS n "
    "FROM TABLE(SESSION(TABLE events PARTITION BY user_id, "
    "DESCRIPTOR(ts), INTERVAL '30' MINUTES)) "
    "GROUP BY user_id, window_start, window_end"
).count()
print(f"  SESSION 30m gap: {n} per-user sessions")

print("== 2. MATCH_RECOGNIZE (greedy quantifiers + MEASURES) ========")
eng.sql(
    """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES SUM(A.value) AS click_value, COUNT(A.*) AS n_clicks,
               B.value AS purchase_value
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (A+ B)
      WITHIN INTERVAL '1' DAYS
      DEFINE A AS A.event_type = 'click',
             B AS B.event_type = 'purchase'
    )
    """
).orderBy("user_id", "start_event_id").show(5, truncate=False)

print("== 2b. reluctant quantifiers, SKIP TO, MATCH_NUMBER() ========")
eng.sql(
    """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES MATCH_NUMBER() AS mn, COUNT(*) AS span_rows,
               SUM(value) AS span_value
      ONE ROW PER MATCH
      AFTER MATCH SKIP TO LAST B
      PATTERN (A B+? C)
      DEFINE A AS event_type = 'view', B AS event_type = 'click',
             C AS event_type = 'purchase'
    )
    """
).orderBy("user_id", "mn").show(5, truncate=False)

print("== 2d. DEFINE predicates (Flink's V-shape), ALL ROWS, PERMUTE =")
# arbitrary boolean DEFINEs with PREV navigation — the canonical
# price-valley; plus SQL:2016 forms Flink itself rejects:
# alternation, PERMUTE, ALL ROWS PER MATCH
eng.sql(
    """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES LAST(DOWN.value) AS bottom, COUNT(DOWN.*) AS n_down
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (DOWN+ UP+)
      DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
             UP AS UP.value > PREV(UP.value)
    )
    """
).orderBy("user_id", "start_event_id").show(3, truncate=False)
eng.sql(
    """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      ALL ROWS PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (V (C|E)+ P)
      DEFINE V AS event_type = 'view', C AS event_type = 'click',
             E AS event_type = 'error', P AS event_type = 'purchase'
    )
    """
).orderBy("user_id", "match_no", "event_id").select(
    "user_id", "match_no", "classifier", "event_type", "event_id"
).show(6, truncate=False)

# round 8: running aggregates in DEFINE, SUBSET unions, and
# RUNNING/FINAL MEASURES under ALL ROWS PER MATCH (SQL:2016 forms
# beyond Flink's surface)
eng.sql(
    """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES MIN(V.value) AS valley_min, AVG(V.value) AS valley_avg
      ONE ROW PER MATCH
      AFTER MATCH SKIP PAST LAST ROW
      PATTERN (DOWN+ UP)
      SUBSET V = (DOWN, UP)
      DEFINE DOWN AS value < PREV(value),
             UP AS value > AVG(DOWN.value)
    )
    """
).orderBy("user_id", "start_event_id").show(3, truncate=False)
eng.sql(
    """
    SELECT * FROM events MATCH_RECOGNIZE (
      PARTITION BY user_id
      ORDER BY ts, event_id
      MEASURES RUNNING COUNT(*) AS rows_so_far,
               FINAL SUM(value) AS match_value
      ALL ROWS PER MATCH
      PATTERN (A B)
      DEFINE A AS event_type = 'view', B AS event_type = 'click'
    )
    """
).orderBy("user_id", "match_no", "event_id").select(
    "user_id", "match_no", "classifier", "rows_so_far", "match_value"
).show(4, truncate=False)

print("== 2c. CDC wire formats -> one engine envelope ===============")
from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.canal_maxwell import (  # noqa: E402
    parse_canal_json,
    parse_maxwell_json,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.upsert_kafka import (  # noqa: E402
    parse_upsert_kafka,
)

row_s = T.StructType(
    [T.StructField("id", T.LongType()), T.StructField("v", T.StringType())]
)
canal = spark.createDataFrame(
    [('{"id":1,"type":"UPDATE","es":1686830400000,"ts":1,'
      '"data":[{"id":"1","v":"new"}],"old":[{"v":"old"}]}',)],
    "value string",
)
maxw = spark.createDataFrame(
    [('{"type":"delete","ts":1686830401,"xid":2,"data":{"id":1,"v":"x"}}',)],
    "value string",
)
upk = spark.createDataFrame(
    [('{"id":1}', None, 1686830402000, 3)],
    "key string, value string, ts_ms long, offset long",
)
env = (
    parse_canal_json(canal, "value", row_s)
    .unionByName(parse_maxwell_json(maxw, "value", row_s))
    .unionByName(
        parse_upsert_kafka(
            upk, "key", "value",
            T.StructType([T.StructField("id", T.LongType())]), row_s,
            ts=F.timestamp_millis(F.col("ts_ms")), seq=F.col("offset"),
        )
    )
)
env.show(truncate=False)

print("== 3. Lakehouse DML + time travel ============================")
eng.sql(
    f"""
    CREATE TABLE acct (
      id BIGINT, name STRING, bal DOUBLE,
      PRIMARY KEY (id) NOT ENFORCED
    ) WITH ('connector' = 'hudi', 'path' = '{root}/acct',
            'num_buckets' = '2', 'compact_every' = '100')
    """
)
eng.sql("INSERT INTO acct VALUES (1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0)")
spark.createDataFrame(
    [(1, "a2", 11.0), (3, "c", -1.0), (4, "d", 40.0)],
    "id long, name string, bal double",
).createOrReplaceTempView("acct_changes")
eng.sql(
    """
    MERGE INTO acct AS t USING acct_changes AS s
    ON t.id = s.id
    WHEN MATCHED AND s.bal < 0 THEN DELETE
    WHEN MATCHED THEN UPDATE SET *
    WHEN NOT MATCHED THEN INSERT *
    """
)
print("  after MERGE:", sorted(map(tuple, eng.sql("SELECT * FROM acct").collect())))
pre = eng.registry.upsert_handle("acct").last_commit_seq()
eng.sql("UPDATE acct SET bal = bal * 2 WHERE bal < 20")
eng.sql("DELETE FROM acct WHERE id = 2")
eng.sql("INSERT OVERWRITE acct VALUES (9, 'z', 99.0)")
print("  after UPDATE/DELETE/OVERWRITE:",
      sorted(map(tuple, eng.sql("SELECT * FROM acct").collect())))
print(f"  VERSION AS OF {pre}:",
      sorted(map(tuple, eng.sql(f"SELECT * FROM acct VERSION AS OF {pre}").collect())))
print("  SHOW CREATE TABLE:")
print(eng.sql("SHOW CREATE TABLE acct").collect()[0]["create_statement"])

spark.stop()
shutil.rmtree(root, ignore_errors=True)
print("done")
