"""Runnable tour of the engine's SQL surface beyond the reference's
own paragraphs — the statements a Flink/lakehouse user would paste
next (SURVEY.md §2.5 extension surface):

  1. Flink window TVFs: TUMBLE / HOP / SESSION / CUMULATE
  2. MATCH_RECOGNIZE with greedy quantifiers + MEASURES
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
