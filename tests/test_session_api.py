"""EngineSession / catalog API surface: insert_into (R1/R2), DDL
export (S9), near-dedup corpus pass, and salted-join equivalence."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from streaming_data_lake_flink_cdc_apache_hudi_spark.catalog import (
    TableDef,
    export_external_ddl,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import dedup as DD
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.skew import (
    salted_join,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession


def test_insert_into_and_queryback(spark, tmp_path):
    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg.json")
    )
    eng.create_upsert_table("t1", str(tmp_path / "t1"), key=["uuid"])
    rows = spark.createDataFrame(
        [("id1", "Danny", 23), ("id2", "Stephen", 33)],
        "uuid string, name string, age int",
    )
    assert eng.insert_into("t1", rows, commit_id="c1") == 1
    # R1 upsert of an existing key through the same path
    eng.insert_into(
        "t1",
        spark.createDataFrame(
            [("id1", "Francisco", 29)], "uuid string, name string, age int"
        ),
        commit_id="c2",
    )
    got = {r["uuid"]: r["age"] for r in eng.table("t1").collect()}
    assert got == {"id1": 29, "id2": 33}
    # S7: drop removes from registry + view
    eng.drop_table("t1")
    assert "t1" not in eng.registry.tables()


def test_export_external_ddl():
    ddl = export_external_ddl(
        TableDef("ticket_view", "upsert", "/lake/ticket_view", ["full_name"]),
        [("full_name", "string"), ("id", "string"),
         ("ticket_price", "float"), ("transaction_date_time", "string")],
    )
    assert "CREATE EXTERNAL TABLE `ticket_view`" in ddl
    assert "`_record_key` string" in ddl  # ≙ _hoodie_* columns
    assert "LOCATION '/lake/ticket_view/base'" in ddl
    assert "PARTITIONED BY (`bucket` int)" in ddl


def test_sql_ddl_create_write_query_drop(spark, tmp_path):
    """The notebook's paste-DDL workflow (zpln:292 ¶7 / :1060 ¶24):
    declare an upsert table purely via a SQL string (Flink-style WITH
    connector options), write through the registry, query it back via
    SQL, drop via SQL."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE person_sql (
          id DOUBLE,
          full_name STRING,
          age INT,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH (
          'connector' = 'hudi',
          'path' = '{tmp_path / "person_sql"}',
          'num_buckets' = '4'
        )
        """
    )
    assert "person_sql" in eng.registry.tables()
    # queryable (typed-empty) before the first write, like declared Hudi tables
    assert eng.sql("SELECT * FROM person_sql").count() == 0
    eng.insert_into(
        "person_sql",
        spark.createDataFrame(
            [(1.0, "A B", 30), (2.0, "C D", 40)],
            "id double, full_name string, age int",
        ),
        commit_id="c1",
    )
    eng.table("person_sql")  # rebind view over current snapshot
    got = {r["id"]: r["age"] for r in eng.sql(
        "SELECT id, age FROM person_sql"
    ).collect()}
    assert got == {1.0: 30, 2.0: 40}
    # upsert key declared via PRIMARY KEY ... NOT ENFORCED is honored
    eng.insert_into(
        "person_sql",
        spark.createDataFrame([(1.0, "A B", 31)], "id double, full_name string, age int"),
        commit_id="c2",
    )
    assert eng.table("person_sql").count() == 2
    eng.sql("DROP TABLE IF EXISTS person_sql")
    assert "person_sql" not in eng.registry.tables()
    # spark-style OPTIONS spelling also parses
    eng.sql(
        f"CREATE TABLE t2 (k STRING, v INT, PRIMARY KEY (k) NOT ENFORCED) "
        f"USING upsert OPTIONS (path '{tmp_path / 't2'}')"
    )
    assert "t2" in eng.registry.tables()
    # non-DDL statements still pass through to spark.sql
    assert eng.sql("SELECT 1 AS one").collect()[0]["one"] == 1


def test_near_dedup_corpus_removes_planted(spark):
    words = "alpha beta gamma delta epsilon zeta eta theta".split()
    rng = random.Random(3)
    docs = [(i, " ".join(rng.choice(words) for _ in range(60))) for i in range(20)]
    docs.append((100, docs[4][1]))  # exact dup of 4
    toks = docs[7][1].split(); toks[3] = "zeta"
    docs.append((101, " ".join(toks)))  # near dup of 7
    df = spark.createDataFrame(docs, "doc_id long, text string")
    kept = {
        r["doc_id"]
        for r in DD.near_dedup_corpus(df, "text", "doc_id", jaccard_threshold=0.4)
        .select("doc_id")
        .collect()
    }
    assert 100 not in kept and 101 not in kept  # dups dropped
    assert 4 in kept and 7 in kept  # originals kept


def test_salted_join_equals_plain_join(spark):
    # heavily skewed left side: 90% of rows share key 0
    left = spark.createDataFrame(
        [(0 if i % 10 else i % 7, f"v{i}") for i in range(2000)], "k int, v string"
    )
    right = spark.createDataFrame([(i, f"r{i}") for i in range(7)], "k int, r string")
    plain = salted_join(left, right, "k")
    want = left.join(right, "k")
    assert plain.count() == want.count()
    assert (
        plain.groupBy("k").count().subtract(want.groupBy("k").count()).count() == 0
    )


def test_query_types_and_version_as_of_sql(spark, tmp_path):
    """The full Hudi query-type surface through the session facade:
    table(query_type=...) and the `VERSION AS OF` SQL spelling."""
    from pyspark.sql import functions as F

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    t = eng.create_upsert_table(
        "qt", str(tmp_path / "qt"), key=["id"], compact_every=10
    )
    t.write(
        spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"),
        commit_id="c1",
    )
    t.write(
        spark.createDataFrame([(1, "a2")], "id int, v string"), commit_id="c2"
    )
    # snapshot vs time travel (python + SQL spellings agree)
    assert {tuple(r) for r in eng.table("qt").collect()} == {(1, "a2"), (2, "b")}
    assert {
        tuple(r) for r in eng.table("qt", as_of_seq=1).collect()
    } == {(1, "a"), (2, "b")}
    sql_tt = eng.sql("SELECT id, v FROM qt VERSION AS OF 1 ORDER BY id")
    assert [tuple(r) for r in sql_tt.collect()] == [(1, "a"), (2, "b")]
    # incremental + cdc + read_optimized flavors
    inc = eng.table("qt", query_type="incremental", since_seq=1)
    assert [r["id"] for r in inc.collect()] == [1]
    cdc = eng.table("qt", query_type="cdc", since_seq=1)
    assert [
        (r["id"], r["_change_type"]) for r in cdc.collect()
    ] == [(1, "update")]
    assert eng.table("qt", query_type="read_optimized").count() == 0  # no base yet
    # timeline (Hudi CLI `commits show` parity)
    tl = t.timeline().orderBy("seq").collect()
    assert [(r["seq"], r["kind"]) for r in tl] == [(1, "delta"), (2, "delta")]
    assert {r["commit_id"] for r in tl} == {"c1", "c2"}


def test_sql_insert_into_values_and_select(spark, tmp_path):
    """The notebook's ¶9 INSERT INTO ... VALUES and ¶53 INSERT INTO
    sink SELECT statements run VERBATIM through eng.sql against a
    DDL-declared upsert table (positional columns, implicit casts)."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE t1_sql (
          uuid STRING, name STRING, age INT, ts TIMESTAMP,
          PRIMARY KEY (uuid) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "t1_sql"}')
        """
    )
    eng.sql(
        "INSERT INTO t1_sql VALUES "
        "('id1', 'Danny', 23, TIMESTAMP '1970-01-01 00:00:01'), "
        "('id2', 'Stephen', 33, TIMESTAMP '1970-01-01 00:00:02')"
    )
    # upsert of an existing key, notebook ¶13 style
    eng.sql(
        "INSERT INTO t1_sql VALUES "
        "('id1', 'Francisco Morillo', 29, TIMESTAMP '2023-06-15 12:00:00')"
    )
    got = {
        r["uuid"]: (r["name"], r["age"])
        for r in eng.sql("SELECT * FROM t1_sql").collect()
    }
    assert got == {
        "id1": ("Francisco Morillo", 29),
        "id2": ("Stephen", 33),
    }
    # INSERT INTO sink SELECT ... (flagship ¶53 shape) with implicit cast
    eng.sql(
        f"""
        CREATE TABLE ages_sql (
          uuid STRING, age DOUBLE,
          PRIMARY KEY (uuid) NOT ENFORCED
        ) WITH ('connector' = 'upsert', 'path' = '{tmp_path / "ages_sql"}')
        """
    )
    eng.sql("INSERT INTO ages_sql SELECT uuid, age FROM t1_sql")
    ages = {
        r["uuid"]: r["age"] for r in eng.sql("SELECT * FROM ages_sql").collect()
    }
    assert ages == {"id1": 29.0, "id2": 33.0}  # INT -> DOUBLE implicit cast


def test_verbatim_flagship_sql_through_engine(spark, tmp_path):
    """The reference notebook's ¶53 INSERT INTO statement — its actual
    SQL text, table names and all — runs through eng.sql against
    renamed fixture views, with the sink's DDL-declared precombine
    resolving multi-row keys exactly like the Hudi sink."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )

    from .conftest import SF_SMOKE

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    # fixture tables under their reference names/columns (FIXTURES.md §Mapping)
    load_table(spark, SF_SMOKE, "customer").selectExpr(
        "c_custkey AS id", "c_name AS full_name"
    ).createOrReplaceTempView("person")
    load_table(spark, SF_SMOKE, "orders").selectExpr(
        "o_orderkey AS id",
        "o_custkey AS ticketholder_id",
        "o_totalprice AS ticket_price",
    ).createOrReplaceTempView("sporting_event_ticket")
    load_table(spark, SF_SMOKE, "lineitem").selectExpr(
        "l_orderkey AS sporting_event_ticket_id",
        "l_shipdate AS transaction_date_time",
    ).createOrReplaceTempView("ticket_purchase_hist")
    eng.sql(
        f"""
        CREATE TABLE ticketview (
          full_name STRING, id STRING, ticket_price DOUBLE,
          transaction_date_time STRING,
          PRIMARY KEY (full_name) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "ticketview"}',
                'precombine.field' = 'transaction_date_time,id')
        """
    )
    # CDC-Hudi-Notebook.zpln:2317 ¶53, verbatim
    eng.sql(
        """
        INSERT INTO ticketview
        SELECT person.full_name,
               CAST(sporting_event_ticket.id AS string) AS id,
               sporting_event_ticket.ticket_price,
               CAST(ticket_purchase_hist.transaction_date_time AS string)
                   AS transaction_date_time
        FROM person
        JOIN sporting_event_ticket
          ON person.id = sporting_event_ticket.ticketholder_id
        JOIN ticket_purchase_hist
          ON ticket_purchase_hist.sporting_event_ticket_id
           = sporting_event_ticket.id
        """
    )
    got = {
        r["full_name"]: (r["id"], r["transaction_date_time"])
        for r in eng.sql("SELECT * FROM ticketview").collect()
    }
    # independent ground truth: same join, window LWW on the declared
    # precombine order (transaction_date_time DESC, id DESC)
    want = {
        r["full_name"]: (r["id"], r["transaction_date_time"])
        for r in spark.sql(
            """
            SELECT full_name, id, transaction_date_time FROM (
              SELECT person.full_name,
                     CAST(t.id AS string) AS id,
                     CAST(h.transaction_date_time AS string)
                         AS transaction_date_time,
                     row_number() OVER (
                       PARTITION BY person.full_name
                       ORDER BY CAST(h.transaction_date_time AS string) DESC,
                                CAST(t.id AS string) DESC) AS rn
              FROM person
              JOIN sporting_event_ticket t ON person.id = t.ticketholder_id
              JOIN ticket_purchase_hist h
                ON h.sporting_event_ticket_id = t.id
            ) WHERE rn = 1
            """
        ).collect()
    }
    assert got == want
    assert len(got) > 0
    # no-duplicates invariant (¶61)
    dup = eng.sql(
        "SELECT full_name FROM ticketview GROUP BY full_name HAVING count(*) > 1"
    )
    assert dup.count() == 0


def test_sql_merge_into_update_delete_insert(spark, tmp_path):
    """Spark-SQL/Hudi MERGE INTO spelling of the keyed upsert: one
    statement compiles to ONE lake commit carrying updates, deletes,
    and inserts; clause order is first-match-wins."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE acct (
          id BIGINT, name STRING, bal DOUBLE,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "acct"}',
                'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO acct VALUES (1, 'a', 10.0), (2, 'b', 20.0), (3, 'c', 30.0)")
    spark.createDataFrame(
        [(1, "a2", 11.0), (3, "c", -1.0), (4, "d", 40.0)],
        "id long, name string, bal double",
    ).createOrReplaceTempView("acct_changes")
    before_seq = eng.registry.upsert_handle("acct").last_commit_seq()
    eng.sql(
        """
        MERGE INTO acct AS t USING acct_changes AS s
        ON t.id = s.id
        WHEN MATCHED AND s.bal < 0 THEN DELETE
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        """
    )
    h = eng.registry.upsert_handle("acct")
    # exactly one commit for the whole MERGE
    assert h.last_commit_seq() == before_seq + 1
    got = {r["id"]: (r["name"], r["bal"]) for r in h.snapshot().collect()}
    assert got == {1: ("a2", 11.0), 2: ("b", 20.0), 4: ("d", 40.0)}


def test_sql_merge_assignments_subquery_source_and_conditional_insert(spark, tmp_path):
    """SET col = expr assignments evaluate in the joined scope;
    USING (subquery) sources work; NOT MATCHED AND <cond> filters
    inserts."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE inv (
          sku STRING, qty INT, updated BIGINT,
          PRIMARY KEY (sku) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "inv"}',
                'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO inv VALUES ('x', 5, 1), ('y', 7, 1)")
    spark.createDataFrame(
        [("x", 3, 2), ("z", 9, 2), ("w", 0, 2)],
        "sku string, delta int, ts long",
    ).createOrReplaceTempView("inv_feed")
    eng.sql(
        """
        MERGE INTO inv AS t
        USING (SELECT sku, delta, ts FROM inv_feed) AS s
        ON t.sku = s.sku
        WHEN MATCHED THEN UPDATE SET qty = t.qty + s.delta, updated = s.ts
        WHEN NOT MATCHED AND s.delta > 0
          THEN INSERT (sku, qty, updated) VALUES (s.sku, s.delta, s.ts)
        """
    )
    got = {r["sku"]: (r["qty"], r["updated"])
           for r in eng.registry.upsert_handle("inv").snapshot().collect()}
    assert got == {"x": (8, 2), "y": (7, 1), "z": (9, 2)}  # 'w' filtered out


def test_ctas_upsert_and_parquet(spark, tmp_path):
    """CREATE TABLE ... AS SELECT — both spellings: USING upsert
    OPTIONS(key ...) materializes a keyed lake table (upserts apply
    afterwards), USING parquet writes a plain table. Schema comes
    from the SELECT."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 7.0), (2, "b", 7.0)],
        "id LONG, name STRING, score DOUBLE",
    ).createOrReplaceTempView("ctas_src")

    eng.sql(
        f"""
        CREATE TABLE ctas_t USING upsert OPTIONS(
          'path' = '{tmp_path / "ctas_t"}', 'key' = 'id',
          'num_buckets' = '2'
        ) AS SELECT DISTINCT id, name, score FROM ctas_src
        """
    )
    got = sorted(map(tuple, eng.sql("SELECT * FROM ctas_t").collect()))
    assert got == [(1, "a", 5.0), (2, "b", 7.0)]
    # it is a real upsert table: a later keyed write replaces the row
    eng.insert_into(
        "ctas_t",
        spark.createDataFrame([(2, "B2", 9.0)], "id LONG, name STRING, score DOUBLE"),
        commit_id="c2",
    )
    got = sorted(map(tuple, eng.sql("SELECT * FROM ctas_t").collect()))
    assert got == [(1, "a", 5.0), (2, "B2", 9.0)]

    eng.sql(
        f"""
        CREATE TABLE ctas_p USING parquet OPTIONS(
          'path' = '{tmp_path / "ctas_p"}'
        ) AS SELECT id, score * 2 AS dbl FROM ctas_src WHERE id = 1
        """
    )
    assert [tuple(r) for r in eng.sql("SELECT * FROM ctas_p").collect()] == [
        (1, 10.0)
    ]


def test_ddl_check_constraint_option_gates_inserts(spark, tmp_path):
    """'check.<name>' WITH-options become enforced CHECK constraints:
    the SQL front door refuses violating INSERTs atomically."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        CheckConstraintViolation,
    )

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg.json")
    )
    eng.sql(
        f"""
        CREATE TABLE gated (
          id INT, price DOUBLE, PRIMARY KEY (id) NOT ENFORCED
        ) WITH (
          'connector' = 'upsert', 'path' = '{tmp_path}/gated',
          'num_buckets' = '2', 'check.positive_price' = 'price > 0'
        )
        """
    )
    eng.sql("INSERT INTO gated VALUES (1, 5.0)")
    with _pytest.raises(CheckConstraintViolation):
        eng.sql("INSERT INTO gated VALUES (2, -1.0)")
    rows = eng.sql("SELECT id, price FROM gated").collect()
    assert [(r["id"], r["price"]) for r in rows] == [(1, 5.0)]


def test_export_table_ddl_all_three_formats(spark, tmp_path):
    """EXPORT TABLE ... AS DELTA|HUDI|ICEBERG LOCATION '...' routes
    the lakehouse exporters through the SQL front door; every export
    mounts back with its own reader."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        read_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        read_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        read_iceberg,
    )

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE exp_src (id INT, v STRING, PRIMARY KEY (id) NOT ENFORCED)
        WITH ('connector' = 'upsert', 'path' = '{tmp_path}/exp_src',
              'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO exp_src VALUES (1, 'a'), (2, 'b')")
    for fmt, reader in [
        ("DELTA", read_delta),
        ("HUDI", read_hudi),
        ("ICEBERG", read_iceberg),
    ]:
        dest = str(tmp_path / f"out_{fmt.lower()}")
        res = eng.sql(
            f"EXPORT TABLE exp_src AS {fmt} LOCATION '{dest}'"
        ).collect()[0]
        assert res["format"] == fmt and res["data_files"] >= 1
        got = sorted(
            (r["id"], r["v"]) for r in reader(spark, dest).select("id", "v").collect()
        )
        assert got == [(1, "a"), (2, "b")], fmt
    # UNIFORM: one parquet set, BOTH Delta and Iceberg metadata (r8)
    dest = str(tmp_path / "out_uniform")
    res = eng.sql(
        f"EXPORT TABLE exp_src AS UNIFORM LOCATION '{dest}'"
    ).collect()[0]
    assert res["format"] == "UNIFORM" and res["data_files"] >= 1
    for reader in (read_delta, read_iceberg):
        got = sorted(
            (r["id"], r["v"])
            for r in reader(spark, dest).select("id", "v").collect()
        )
        assert got == [(1, "a"), (2, "b")], reader.__name__


def test_flink_window_tvf_tumble_spelling(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.register_testdata("/root/testdata/sf0.001")
    got = eng.sql(
        "SELECT window_start, window_end, COUNT(*) AS n "
        "FROM TABLE(TUMBLE(TABLE events, DESCRIPTOR(ts), "
        "INTERVAL '10' MINUTES)) "
        "GROUP BY window_start, window_end ORDER BY window_start"
    ).collect()
    import pyspark.sql.functions as F

    want = (
        spark.table("events")
        .groupBy(F.window("ts", "10 minutes"))
        .count()
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            F.col("count").alias("n"),
        )
        .orderBy("window_start")
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_flink_window_tvf_hop_expands_rows(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.register_testdata("/root/testdata/sf0.001")
    # HOP(slide 5m, size 10m): every event lands in exactly 2 windows
    rows = eng.sql(
        "SELECT COUNT(*) AS n FROM TABLE(HOP(TABLE events, "
        "DESCRIPTOR(ts), INTERVAL '5' MINUTES, INTERVAL '10' MINUTES))"
    ).collect()
    base = spark.table("events").count()
    assert rows[0]["n"] == 2 * base


def test_flink_window_tvf_session_matches_session_window(spark, tmp_path):
    """SESSION TVF rewrite agrees with F.session_window (Flink's
    half-open gap semantics) on per-session event counts."""
    import pyspark.sql.functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.register_testdata("/root/testdata/sf0.001")
    got = sorted(
        tuple(r)
        for r in eng.sql(
            "SELECT user_id, window_start, window_end, COUNT(*) AS n "
            "FROM TABLE(SESSION(TABLE events PARTITION BY user_id, "
            "DESCRIPTOR(ts), INTERVAL '30' MINUTES)) "
            "GROUP BY user_id, window_start, window_end"
        ).collect()
    )
    want = sorted(
        tuple(r)
        for r in spark.table("events")
        .groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count("*").alias("n"))
        .select(
            "user_id",
            F.col("session_window.start").alias("window_start"),
            F.col("session_window.end").alias("window_end"),
            "n",
        )
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_flink_window_tvf_session_keyless_and_boundary(spark, tmp_path):
    """Keyless SESSION TVF; an event at exactly last_ts + gap starts
    a NEW session (half-open windows, Flink/session_window parity)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        rewrite_window_tvf,
    )

    spark.createDataFrame(
        [("2024-01-01 00:00:00",), ("2024-01-01 00:05:00",),
         ("2024-01-01 00:10:00",), ("2024-01-01 00:30:00",)],
        "t string",
    ).selectExpr("CAST(t AS TIMESTAMP) AS ts").createOrReplaceTempView(
        "sess_edge"
    )
    rows = spark.sql(
        rewrite_window_tvf(
            "SELECT window_start, window_end, COUNT(*) AS n "
            "FROM TABLE(SESSION(TABLE sess_edge, DESCRIPTOR(ts), "
            "INTERVAL '5' MINUTES)) "
            "GROUP BY window_start, window_end ORDER BY window_start"
        )
    ).collect()
    # 00:00,00:05,00:10 chain (each gap exactly 5m starts a NEW
    # session under half-open semantics) -> 3 singleton sessions,
    # then 00:30 alone
    assert [(str(r["window_start"]), str(r["window_end"]), r["n"]) for r in rows] == [
        ("2024-01-01 00:00:00", "2024-01-01 00:05:00", 1),
        ("2024-01-01 00:05:00", "2024-01-01 00:10:00", 1),
        ("2024-01-01 00:10:00", "2024-01-01 00:15:00", 1),
        ("2024-01-01 00:30:00", "2024-01-01 00:35:00", 1),
    ]


def test_alter_table_add_column_ddl(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.sql(
        "CREATE TABLE acc (id BIGINT, v DOUBLE, PRIMARY KEY (id) NOT "
        f"ENFORCED) WITH ('path' = '{tmp_path / 'acc'}')"
    )
    eng.insert_into(
        "acc", spark.createDataFrame([(1, 1.5), (2, 2.5)], "id long, v double")
    )
    eng.sql("ALTER TABLE acc ADD COLUMNS (tag STRING, score DOUBLE)")
    snap = eng.sql("SELECT id, v, tag, score FROM acc ORDER BY id")
    rows = snap.collect()
    # pre-ALTER rows surface the new columns as typed NULLs, no rewrite
    assert [(r["id"], r["tag"], r["score"]) for r in rows] == [
        (1, None, None),
        (2, None, None),
    ]
    assert dict(snap.dtypes)["tag"] == "string"
    assert dict(snap.dtypes)["score"] == "double"
    # a later write fills the evolved column; old rows keep NULL
    eng.insert_into(
        "acc",
        spark.createDataFrame(
            [(3, 3.5, "new", 0.9)], "id long, v double, tag string, score double"
        ),
        commit_id="c2",
        evolve_schema=True,
    )
    got = {
        r["id"]: (r["tag"], r["score"])
        for r in eng.sql("SELECT * FROM acc").collect()
    }
    assert got == {1: (None, None), 2: (None, None), 3: ("new", 0.9)}


def test_alter_table_rejects_existing_and_unwritten(spark, tmp_path):
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.sql(
        "CREATE TABLE acc2 (id BIGINT, v DOUBLE, PRIMARY KEY (id) NOT "
        f"ENFORCED) WITH ('path' = '{tmp_path / 'acc2'}')"
    )
    eng.insert_into(
        "acc2", spark.createDataFrame([(1, 1.0)], "id long, v double")
    )
    with _pytest.raises(ValueError, match="already exist"):
        eng.sql("ALTER TABLE acc2 ADD COLUMN v DOUBLE")


def test_optimize_zorder_ddl_compacts_and_clusters(spark, tmp_path):
    import os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.sql(
        "CREATE TABLE zt (id BIGINT, x BIGINT, y BIGINT, PRIMARY KEY (id) "
        f"NOT ENFORCED) WITH ('path' = '{tmp_path / 'zt'}')"
    )
    rows = [(i, i % 37, (i * 7) % 41) for i in range(500)]
    eng.insert_into(
        "zt", spark.createDataFrame(rows, "id long, x long, y long")
    )
    before = eng.sql("SELECT * FROM zt ORDER BY id").collect()
    res = eng.sql("OPTIMIZE zt ZORDER BY (x, y)").collect()
    assert res[0]["zorder_by"] == "x, y"
    # log folded into base, snapshot identical
    assert not os.path.isdir(str(tmp_path / "zt" / "log")) or not os.listdir(
        str(tmp_path / "zt" / "log")
    )
    after = eng.sql("SELECT * FROM zt ORDER BY id").collect()
    assert after == before
    # plain OPTIMIZE (no zorder) also parses and runs
    eng.insert_into(
        "zt", spark.createDataFrame([(999, 1, 1)], "id long, x long, y long")
    )
    res2 = eng.sql("OPTIMIZE zt").collect()
    assert res2[0]["zorder_by"] is None
    assert eng.sql("SELECT COUNT(*) n FROM zt").collect()[0]["n"] == 501


def test_describe_history_ddl(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.sql(
        "CREATE TABLE ht (id BIGINT, v DOUBLE, PRIMARY KEY (id) NOT "
        f"ENFORCED) WITH ('path' = '{tmp_path / 'ht'}')"
    )
    eng.insert_into(
        "ht", spark.createDataFrame([(1, 1.0)], "id long, v double"),
        commit_id="first",
    )
    eng.insert_into(
        "ht", spark.createDataFrame([(2, 2.0)], "id long, v double"),
        commit_id="second",
    )
    hist = eng.sql("DESCRIBE HISTORY ht").orderBy("seq").collect()
    assert [(r["seq"], r["commit_id"], r["kind"]) for r in hist] == [
        (1, "first", "delta"),
        (2, "second", "delta"),
    ]
    assert all(r["n_rows"] == 1 for r in hist)  # footer-recovered counts
    assert all(r["wall_time"] > 0 for r in hist)


def test_show_engine_tables_ddl(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "tables.json")
    )
    eng.sql(
        "CREATE TABLE st1 (id BIGINT, PRIMARY KEY (id) NOT ENFORCED) "
        f"WITH ('path' = '{tmp_path / 'st1'}')"
    )
    eng.sql(
        "CREATE TABLE st2 (id BIGINT, PRIMARY KEY (id) NOT ENFORCED) "
        f"WITH ('path' = '{tmp_path / 'st2'}')"
    )
    got = {
        r["name"]: (r["kind"], r["key"])
        for r in eng.sql("SHOW ENGINE TABLES").collect()
    }
    assert got == {"st1": ("upsert", "id"), "st2": ("upsert", "id")}


def test_sql_merge_multi_insert_clauses_first_match_wins(spark, tmp_path):
    """ADVICE r5: a source row satisfying TWO NOT MATCHED clauses must
    insert once (first clause wins), and two source rows matching one
    target row must raise (standard MERGE cardinality error), not be
    silently LWW-resolved."""
    import pytest as _pytest

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE m2 (
          id BIGINT, tag STRING, v DOUBLE,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "m2"}',
                'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO m2 VALUES (1, 'seed', 1.0)")
    spark.createDataFrame(
        [(2, 5.0), (3, -5.0)], "id long, v double"
    ).createOrReplaceTempView("m2_src")
    eng.sql(
        """
        MERGE INTO m2 AS t USING m2_src AS s
        ON t.id = s.id
        WHEN NOT MATCHED AND s.v > 0
          THEN INSERT (id, tag, v) VALUES (s.id, 'pos', s.v)
        WHEN NOT MATCHED
          THEN INSERT (id, tag, v) VALUES (s.id, 'other', s.v)
        """
    )
    got = {r["id"]: (r["tag"], r["v"])
           for r in eng.registry.upsert_handle("m2").snapshot().collect()}
    # id=2 matches BOTH insert clauses -> exactly one row, first clause
    assert got == {1: ("seed", 1.0), 2: ("pos", 5.0), 3: ("other", -5.0)}

    spark.createDataFrame(
        [(1, 9.0), (1, 8.0)], "id long, v double"
    ).createOrReplaceTempView("m2_dup")
    with _pytest.raises(ValueError, match="multiple source rows"):
        eng.sql(
            """
            MERGE INTO m2 AS t USING m2_dup AS s
            ON t.id = s.id
            WHEN MATCHED THEN UPDATE SET v = s.v
            """
        )


def test_sql_delete_from_and_update_dml(spark, tmp_path):
    """DELETE FROM ... WHERE and UPDATE ... SET ... WHERE — the
    Delta/Hudi Spark-SQL DML spellings — each compile to ONE lake
    commit (tombstones / keyed upsert), visible to CDC-changes reads
    like any other write."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE dml (
          id BIGINT, grp STRING, qty INT,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "dml"}',
                'num_buckets' = '2')
        """
    )
    eng.sql(
        "INSERT INTO dml VALUES (1, 'a', 10), (2, 'a', 20), "
        "(3, 'b', 30), (4, 'b', 40)"
    )
    h = eng.registry.upsert_handle("dml")
    before = h.last_commit_seq()

    res = eng.sql("UPDATE dml SET qty = qty + 5 WHERE grp = 'a'")
    assert res.collect()[0]["updated_rows"] == 2
    assert h.last_commit_seq() == before + 1  # one commit
    got = {r["id"]: r["qty"] for r in eng.sql("SELECT * FROM dml").collect()}
    assert got == {1: 15, 2: 25, 3: 30, 4: 40}

    res = eng.sql("DELETE FROM dml WHERE qty > 28")
    assert res.collect()[0]["deleted_rows"] == 2
    assert h.last_commit_seq() == before + 2
    got = {r["id"]: r["qty"] for r in eng.sql("SELECT * FROM dml").collect()}
    assert got == {1: 15, 2: 25}

    # the delete surfaces in the CDC-changes read like any write
    ch = h.changes(since_seq=before + 1)
    assert {(r["id"], r["_change_type"]) for r in ch.collect()} == {
        (3, "delete"), (4, "delete"),
    }

    # key columns are immutable through UPDATE (that's a MERGE job)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="record-key"):
        eng.sql("UPDATE dml SET id = id + 1")

    # no-match DML: zero rows, NO empty commit
    seq = h.last_commit_seq()
    assert eng.sql("DELETE FROM dml WHERE qty > 999").collect()[0][
        "deleted_rows"
    ] == 0
    assert h.last_commit_seq() == seq


def test_flink_window_tvf_cumulate_expansion(spark, tmp_path):
    """CUMULATE TVF: an event at offset o in its 10-min window lands
    in every cumulative [start, start + k*2min) window with
    k*2min > o — 5 windows at offset 0, 1 window at offset 9min."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        rewrite_window_tvf,
    )

    spark.createDataFrame(
        [("2024-01-01 00:00:30",), ("2024-01-01 00:09:00",)], "t string"
    ).selectExpr("CAST(t AS TIMESTAMP) AS ts").createOrReplaceTempView(
        "cum_edge"
    )
    rows = spark.sql(
        rewrite_window_tvf(
            "SELECT CAST(ts AS STRING) AS ts, window_end "
            "FROM TABLE(CUMULATE(TABLE cum_edge, DESCRIPTOR(ts), "
            "INTERVAL '2' MINUTES, INTERVAL '10' MINUTES))"
        )
    ).collect()
    per_event = {}
    for r in rows:
        per_event.setdefault(r["ts"], []).append(str(r["window_end"]))
    # offset 30s -> all 5 cumulative windows; offset 9min -> only the
    # full-size one
    assert len(per_event["2024-01-01 00:00:30"]) == 5
    assert per_event["2024-01-01 00:09:00"] == ["2024-01-01 00:10:00"]
    # size not a multiple of step is rejected
    import pytest as _pytest

    with _pytest.raises(ValueError, match="multiple"):
        rewrite_window_tvf(
            "SELECT * FROM TABLE(CUMULATE(TABLE cum_edge, "
            "DESCRIPTOR(ts), INTERVAL '3' MINUTES, INTERVAL '10' MINUTES))"
        )


def test_sql_timestamp_as_of_time_travel(spark, tmp_path):
    """`t TIMESTAMP AS OF '<wall time>'` (Delta/Hudi parity) resolves
    to the last commit at or before the bound via timeline wall
    times — metadata-only lookup."""
    import datetime as dt
    import time

    import pytest as _pytest

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    t = eng.create_upsert_table("tt", str(tmp_path / "tt"), key=["id"])
    t.write(
        spark.createDataFrame([(1, "a")], "id int, v string"), commit_id="c1"
    )
    time.sleep(0.05)
    mid = dt.datetime.now().isoformat()
    time.sleep(0.05)
    t.write(
        spark.createDataFrame([(1, "a2")], "id int, v string"), commit_id="c2"
    )
    got = eng.sql(f"SELECT v FROM tt TIMESTAMP AS OF '{mid}'").collect()
    assert [r["v"] for r in got] == ["a"]
    now = dt.datetime.now().isoformat()
    got = eng.sql(f"SELECT v FROM tt TIMESTAMP AS OF '{now}'").collect()
    assert [r["v"] for r in got] == ["a2"]
    with _pytest.raises(ValueError, match="no commit"):
        eng.sql("SELECT v FROM tt TIMESTAMP AS OF '2000-01-01 00:00:00'")


def test_sql_truncate_and_show_create_table(spark, tmp_path):
    """TRUNCATE TABLE = one tombstone commit (time travel to the
    pre-truncate state still works); SHOW CREATE TABLE reconstructs
    the engine DDL."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE trunc_t (
          id BIGINT, v STRING,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "trunc_t"}',
                'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO trunc_t VALUES (1, 'a'), (2, 'b')")
    h = eng.registry.upsert_handle("trunc_t")
    pre = h.last_commit_seq()
    res = eng.sql("TRUNCATE TABLE trunc_t")
    assert res.collect()[0]["deleted_rows"] == 2
    assert eng.sql("SELECT * FROM trunc_t").count() == 0
    # pre-truncate state is still reachable
    assert eng.sql(
        f"SELECT * FROM trunc_t VERSION AS OF {pre}"
    ).count() == 2

    ddl = eng.sql("SHOW CREATE TABLE trunc_t").collect()[0][
        "create_statement"
    ]
    assert "CREATE TABLE trunc_t" in ddl
    assert "`id` BIGINT" in ddl and "`v` STRING" in ddl
    assert "PRIMARY KEY (id) NOT ENFORCED" in ddl
    assert "'connector' = 'hudi'" in ddl


def test_sql_insert_overwrite_single_commit(spark, tmp_path):
    """INSERT OVERWRITE replaces the table contents in ONE commit
    (new rows + tombstones for vanished keys); the pre-overwrite
    state stays time-travelable."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    eng.sql(
        f"""
        CREATE TABLE ow (
          id BIGINT, v STRING,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "ow"}',
                'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO ow VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    h = eng.registry.upsert_handle("ow")
    pre = h.last_commit_seq()
    eng.sql("INSERT OVERWRITE ow VALUES (2, 'B'), (4, 'd')")
    assert h.last_commit_seq() == pre + 1  # exactly one commit
    got = {r["id"]: r["v"] for r in eng.sql("SELECT * FROM ow").collect()}
    assert got == {2: "B", 4: "d"}
    old = {
        r["id"]: r["v"]
        for r in eng.sql(f"SELECT * FROM ow VERSION AS OF {pre}").collect()
    }
    assert old == {1: "a", 2: "b", 3: "c"}


def test_keyed_dml_prunes_base_files_via_bloom_sidecar(spark, tmp_path):
    """VERDICT r6 #5: a single-column equality WHERE on DELETE/UPDATE
    routes through the bloom skip-index — only candidate base files
    open (asserted by spying on equality_scan and counting candidate
    files), and results are identical to the unpruned path."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators import skipindex as SI
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "r.json"))
    eng.sql(
        f"""
        CREATE TABLE kdml (
          id BIGINT, grp STRING, qty INT,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "kdml"}',
                'num_buckets' = '4')
        """
    )
    eng.sql(
        "INSERT INTO kdml VALUES "
        + ", ".join(f"({i}, 'g{i % 3}', {i * 10})" for i in range(1, 41))
    )
    h = eng.registry.upsert_handle("kdml")
    h.compact()
    assert h.build_bloom("id") >= 2  # several base files indexed
    cand, total = SI.candidate_files(h._base, "id", 7)
    assert 0 < len(cand) < total  # the index actually prunes
    calls = []
    orig = UpsertLakeTable.equality_scan

    def spy(self, column, value):
        calls.append((column, value))
        return orig(self, column, value)

    UpsertLakeTable.equality_scan = spy
    try:
        res = eng.sql("DELETE FROM kdml WHERE id = 7")
        assert res.collect()[0]["deleted_rows"] == 1
        assert calls == [("id", 7)]
        res = eng.sql("UPDATE kdml SET qty = 999 WHERE id = 8")
        assert res.collect()[0]["updated_rows"] == 1
        assert calls == [("id", 7), ("id", 8)]
        # compound predicate: falls back to the full-snapshot filter
        res = eng.sql("DELETE FROM kdml WHERE id = 9 AND qty > 0")
        assert res.collect()[0]["deleted_rows"] == 1
        assert len(calls) == 2
    finally:
        UpsertLakeTable.equality_scan = orig
    ids = {r["id"] for r in eng.sql("SELECT * FROM kdml").collect()}
    assert 7 not in ids and 9 not in ids and 8 in ids
    got = {r["id"]: r["qty"] for r in eng.sql("SELECT * FROM kdml").collect()}
    assert got[8] == 999


def test_call_procedures_hudi_spellings(spark, tmp_path):
    """Hudi 0.11+ CALL table-service procedures through eng.sql:
    show_commits / run_compaction / rollback_to_instant / run_clean
    plus the bloom-index extensions; unknown procedures raise instead
    of falling through to spark.sql."""
    import pytest as _pytest

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "c.json"))
    eng.sql(
        f"""
        CREATE TABLE callt (
          id BIGINT, v INT, PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "callt"}',
                'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO callt VALUES (1, 10), (2, 20)")
    eng.sql("INSERT INTO callt VALUES (2, 21), (3, 30)")
    tl = eng.sql("CALL show_commits(table => 'callt')").collect()
    assert len(tl) == 2
    assert eng.sql("CALL show_commits('callt', limit => 1)").count() == 1

    # rollback BEFORE compaction (restore past a compaction horizon
    # rightly refuses — folded deltas cannot be unfolded)
    eng.sql(
        "CALL rollback_to_instant(table => 'callt', instant_time => 1)"
    )
    got = {r["id"]: r["v"] for r in eng.sql("SELECT * FROM callt").collect()}
    assert got == {1: 10, 2: 20}  # commit 2 rolled back
    eng.sql("INSERT INTO callt VALUES (4, 40)")

    res = eng.sql("CALL run_compaction(table => 'callt')").collect()[0]
    assert res["table"] == "callt" and res["compacted_rows"] >= 3

    res = eng.sql(
        "CALL create_bloom_index(table => 'callt', column => 'id')"
    ).collect()[0]
    assert res["indexed_files"] >= 1
    assert eng.sql(
        "CALL show_bloom_index(table => 'callt', column => 'id')"
    ).count() == res["indexed_files"]

    res = eng.sql("CALL run_clean(table => 'callt')").collect()[0]
    assert res["removed"] == 0  # healthy table: nothing to reap

    with _pytest.raises(ValueError, match="unknown procedure"):
        eng.sql("CALL do_magic(table => 'callt')")
    with _pytest.raises(ValueError, match="unknown table"):
        eng.sql("CALL show_commits(table => 'nope')")


def test_describe_detail_ddl(spark, tmp_path):
    """Delta's DESCRIBE DETAIL spelling: one metadata row (format,
    location, key, file count/bytes, commit count) from a directory
    walk — no data scan."""
    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "d.json"))
    eng.sql(
        f"""
        CREATE TABLE ddet (
          id BIGINT, v INT, PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "ddet"}',
                'num_buckets' = '2')
        """
    )
    eng.sql("INSERT INTO ddet VALUES (1, 10), (2, 20)")
    row = eng.sql("DESCRIBE DETAIL ddet").collect()[0]
    assert row["format"] == "upsert-lake"
    assert row["primary_key"] == "id"
    assert row["num_files"] >= 1 and row["size_in_bytes"] > 0
    assert row["num_commits"] == 1


def test_dml_bloom_prune_dtype_aware_probe(spark, tmp_path):
    """ADVICE r7: the bloom probe must render exactly as the index was
    built (Spark CAST-to-STRING). A decimal column probed with a float
    ('5.5' vs stored '5.50') or an int column probed with a dotted
    literal ('5.0' vs stored '5') would be a silent bloom FALSE
    NEGATIVE — DML missing rows. The fix makes literal coercion
    dtype-aware: decimals probe at the declared scale, mismatched
    shapes fall back to the exact unpruned scan. DML results must be
    correct in every case."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "d.json"))
    eng.sql(
        f"""
        CREATE TABLE ddml (
          id BIGINT, price DECIMAL(10,2), qty INT,
          PRIMARY KEY (id) NOT ENFORCED
        ) WITH ('connector' = 'hudi', 'path' = '{tmp_path / "ddml"}',
                'num_buckets' = '4')
        """
    )
    eng.sql(
        "INSERT INTO ddml VALUES "
        + ", ".join(
            f"({i}, CAST({i} + 0.5 AS DECIMAL(10,2)), {i * 10})"
            for i in range(1, 21)
        )
    )
    h = eng.registry.upsert_handle("ddml")
    h.compact()
    assert h.build_bloom("price") >= 1
    assert h.build_bloom("id") >= 1
    assert h.build_bloom("qty") >= 1
    calls = []
    orig = UpsertLakeTable.equality_scan

    def spy(self, column, value):
        calls.append((column, value))
        return orig(self, column, value)

    UpsertLakeTable.equality_scan = spy
    try:
        # decimal probed with a coarser literal: pruned path taken,
        # probe carries the declared scale (Decimal('5.50'), which
        # renders exactly as the index stored it)
        res = eng.sql("DELETE FROM ddml WHERE price = 5.5")
        assert res.collect()[0]["deleted_rows"] == 1
        import decimal as _dec

        assert calls == [("price", _dec.Decimal("5.50"))]
        # literal finer than the declared scale: refuse pruning,
        # exact scan still returns the true (empty) answer
        res = eng.sql("DELETE FROM ddml WHERE price = 6.505")
        assert res.collect()[0]["deleted_rows"] == 0
        assert len(calls) == 1
        # dotted literal on a BIGINT column: '7.0' renders unlike the
        # stored '7' — must fall back, and the row must still delete
        res = eng.sql("DELETE FROM ddml WHERE id = 7.0")
        assert res.collect()[0]["deleted_rows"] == 1
        assert len(calls) == 1
        # quoted literal on an INT column: cross-type coercion -> no
        # pruning, row still updates
        res = eng.sql("UPDATE ddml SET qty = 999 WHERE qty = '80'")
        assert res.collect()[0]["updated_rows"] == 1
        assert len(calls) == 1
        # clean int probe still prunes
        res = eng.sql("DELETE FROM ddml WHERE id = 9")
        assert res.collect()[0]["deleted_rows"] == 1
        assert calls[-1] == ("id", 9)
    finally:
        UpsertLakeTable.equality_scan = orig
    got = {r["id"]: r for r in eng.sql("SELECT * FROM ddml").collect()}
    assert 5 not in got and 7 not in got and 9 not in got
    assert got[8]["qty"] == 999


def test_sql_path_dml_routes_to_interop_mutators(spark, tmp_path):
    """r12 (VERDICT r11 ask #6): DELETE FROM / UPDATE against
    format.`path` tables dispatch to the interop mutators for all
    three single formats plus UniForm; single-format statements
    against a UniForm directory keep their refusal; uniform UPDATE
    refuses (no dual-format write side yet)."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        UnsupportedDeltaFeature,
        export_delta,
        read_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
        read_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
        read_iceberg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        export_uniform,
    )

    eng = EngineSession(spark=spark)
    mk = lambda: spark.createDataFrame(
        [(i, f"v{i}") for i in range(8)], "id long, v string"
    )

    # Delta
    d = str(tmp_path / "d")
    export_delta(mk().coalesce(1), d)
    res = eng.sql(f"DELETE FROM delta.`{d}` WHERE id < 2").collect()[0]
    assert res.deleted_rows == 2
    res = eng.sql(
        f"UPDATE delta.`{d}` SET v = concat('U-', v) WHERE id = 7"
    ).collect()[0]
    assert res.updated_rows == 1
    got = {(r.id, r.v) for r in read_delta(spark, d).collect()}
    assert got == {(i, f"v{i}") for i in range(2, 7)} | {(7, "U-v7")}

    # Iceberg (v2)
    i = str(tmp_path / "i")
    export_iceberg(mk(), i, format_version=2)
    assert eng.sql(f"DELETE FROM iceberg.`{i}` WHERE id >= 6").collect()[
        0
    ].deleted_rows == 2
    assert eng.sql(
        f"UPDATE iceberg.`{i}` SET v = 'X' WHERE id = 0"
    ).collect()[0].updated_rows == 1
    got = {(r.id, r.v) for r in read_iceberg(spark, i).collect()}
    assert got == {(0, "X")} | {(i_, f"v{i_}") for i_ in range(1, 6)}

    # Hudi (UPDATE = keyed upsert of rewritten rows; key SET refuses)
    h = str(tmp_path / "h")
    export_hudi_cow(mk(), h, record_key="id", num_files=2)
    assert eng.sql(f"DELETE FROM hudi.`{h}` WHERE id IN (1, 2)").collect()[
        0
    ].deleted_rows == 2
    assert eng.sql(
        f"UPDATE hudi.`{h}` SET v = upper(v) WHERE id > 5"
    ).collect()[0].updated_rows == 2
    got = {(r.id, r.v) for r in read_hudi(spark, h).select("id", "v").collect()}
    assert got == {(0, "v0"), (3, "v3"), (4, "v4"), (5, "v5"),
                   (6, "V6"), (7, "V7")}
    with _pytest.raises(ValueError, match="record-key"):
        eng.sql(f"UPDATE hudi.`{h}` SET id = id + 1")

    # UniForm: dual-format delete; single-format statements refuse
    u = str(tmp_path / "u")
    export_uniform(mk().coalesce(1), u, format_version=2)
    with _pytest.raises(UnsupportedDeltaFeature, match="[Uu]ni[Ff]orm"):
        eng.sql(f"DELETE FROM delta.`{u}` WHERE id = 0")
    assert eng.sql(f"DELETE FROM uniform.`{u}` WHERE id % 2 = 0").collect()[
        0
    ].deleted_rows == 4
    want = {(i_, f"v{i_}") for i_ in range(8) if i_ % 2 == 1}
    assert {(r.id, r.v) for r in read_delta(spark, u).collect()} == want
    assert {(r.id, r.v) for r in read_iceberg(spark, u).collect()} == want
    with _pytest.raises(ValueError, match="dual-format"):
        eng.sql(f"UPDATE uniform.`{u}` SET v = 'x'")


def test_sql_path_merge_routes_to_upsert_writers(spark, tmp_path):
    """r12: upsert-shaped MERGE INTO format.`path` dispatches to the
    format's keyed upsert writer for all four formats; a DELETE-only
    MERGE routes to Iceberg's equality-delete leg; unsupported shapes
    and non-key ON conditions refuse."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        read_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
        read_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
        read_iceberg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        export_uniform,
    )

    eng = EngineSession(spark=spark)
    mk = lambda rows: spark.createDataFrame(rows, "id long, v string")
    base = [(i, f"v{i}") for i in range(5)]
    batch = [(1, "U1"), (9, "v9")]
    mk(batch).createOrReplaceTempView("merge_src")
    want = {(0, "v0"), (1, "U1"), (2, "v2"), (3, "v3"), (4, "v4"), (9, "v9")}

    d = str(tmp_path / "md")
    export_delta(mk(base).coalesce(1), d)
    res = eng.sql(
        f"MERGE INTO delta.`{d}` AS t USING merge_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert res.merged_rows == 2
    assert {(r.id, r.v) for r in read_delta(spark, d).collect()} == want

    i = str(tmp_path / "mi")
    export_iceberg(mk(base), i, format_version=2)
    eng.sql(
        f"MERGE INTO iceberg.`{i}` AS t USING merge_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert {(r.id, r.v) for r in read_iceberg(spark, i).collect()} == want
    # DELETE-only MERGE: iceberg equality-delete leg
    mk([(9, "x"), (0, "x")]).createOrReplaceTempView("del_src")
    eng.sql(
        f"MERGE INTO iceberg.`{i}` AS t USING del_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN DELETE"
    )
    assert {(r.id, r.v) for r in read_iceberg(spark, i).collect()} == (
        want - {(9, "v9"), (0, "v0")}
    )

    h = str(tmp_path / "mh")
    export_hudi_cow(mk(base), h, record_key="id", num_files=2)
    eng.sql(
        f"MERGE INTO hudi.`{h}` AS t USING merge_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert {
        (r.id, r.v) for r in read_hudi(spark, h).select("id", "v").collect()
    } == want

    u = str(tmp_path / "mu")
    export_uniform(mk(base).coalesce(1), u, format_version=2)
    eng.sql(
        f"MERGE INTO uniform.`{u}` AS t USING merge_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert {(r.id, r.v) for r in read_delta(spark, u).collect()} == want
    assert {(r.id, r.v) for r in read_iceberg(spark, u).collect()} == want

    # guards
    with _pytest.raises(ValueError, match="conjunction"):
        eng.sql(
            f"MERGE INTO delta.`{d}` AS t USING merge_src AS s "
            "ON t.id > s.id WHEN MATCHED THEN UPDATE SET *"
        )
    # DELETE-only MERGE on delta: DV-retire the matched keys
    eng.sql(
        f"MERGE INTO delta.`{d}` AS t USING del_src AS s "
        "ON t.id = s.id WHEN MATCHED THEN DELETE"
    )
    assert {(r.id, r.v) for r in read_delta(spark, d).collect()} == (
        want - {(9, "v9"), (0, "v0")}
    )
    with _pytest.raises(ValueError, match="keyed-delete"):
        eng.sql(
            f"MERGE INTO hudi.`{h}` AS t USING merge_src AS s "
            "ON t.id = s.id WHEN MATCHED THEN DELETE"
        )
    with _pytest.raises(ValueError, match="could not parse"):
        eng.sql(
            f"MERGE INTO delta.`{d}` AS t USING merge_src AS s "
            "ON t.id = s.id WHEN MATCHED THEN UPDATE SET v = 'x'"
        )


def test_sql_describe_history_path_tables(spark, tmp_path):
    """r12: DESCRIBE HISTORY fmt.`path` lists commits/snapshots/
    instants for all four path-table spellings, metadata-only."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        delete_delta,
        export_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
        upsert_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.uniform import (
        export_uniform,
    )

    eng = EngineSession(spark=spark)
    mk = lambda: spark.createDataFrame([(1, "a"), (2, "b")], "id long, v string")

    d = str(tmp_path / "hd")
    export_delta(mk().coalesce(1), d)
    delete_delta(spark, d, "id = 1")
    h = eng.sql(f"DESCRIBE HISTORY delta.`{d}`").collect()
    assert [r.id for r in h] == ["0", "1"]
    assert "add" in h[1].detail and h[0].kind == "delta_commit"

    i = str(tmp_path / "hi")
    export_iceberg(mk(), i, format_version=2)
    export_iceberg(mk(), i, mode="append")
    hi = eng.sql(f"DESCRIBE HISTORY iceberg.`{i}`").collect()
    assert len(hi) == 2 and all(r.kind == "iceberg_snapshot" for r in hi)

    hu = str(tmp_path / "hh")
    export_hudi_cow(mk(), hu, record_key="id", num_files=1)
    upsert_hudi(spark, hu, mk())
    hh = eng.sql(f"DESCRIBE HISTORY hudi.`{hu}`").collect()
    assert [r.detail for r in hh] == ["commit", "deltacommit"]

    u = str(tmp_path / "hu")
    export_uniform(mk().coalesce(1), u, format_version=2)
    huf = eng.sql(f"DESCRIBE HISTORY uniform.`{u}`").collect()
    kinds = {r.kind for r in huf}
    assert kinds == {"delta_commit", "iceberg_snapshot"}


def test_select_format_path_tables(spark, tmp_path):
    """r13: SELECT over delta./iceberg./hudi./uniform. path tables —
    the query-side twin of the DML routing — mounts through the
    interop readers, joins across formats, and auto-prunes
    single-table simple-WHERE statements via the stats metadata."""
    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
    )

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    df = (
        spark.range(100)
        .select(
            F.col("id"),
            F.concat(F.lit("n"), F.col("id")).alias("name"),
        )
        .repartitionByRange(4, "id")
    )
    d = str(tmp_path / "d")
    i = str(tmp_path / "i")
    export_delta(df, d, stats=True)
    export_iceberg(df, i, format_version=2, stats=True)

    got = eng.sql(
        f"SELECT count(*) AS n FROM delta.`{d}` WHERE id <= 10"
    ).collect()
    assert got[0]["n"] == 11
    got = eng.sql(
        f"SELECT name FROM iceberg.`{i}` WHERE id = 42 AND name IS NOT NULL"
    ).collect()
    assert [r["name"] for r in got] == ["n42"]
    # cross-format join
    got = eng.sql(
        f"SELECT count(*) AS n FROM delta.`{d}` a "
        f"JOIN iceberg.`{i}` b ON a.id = b.id WHERE a.id < 5"
    ).collect()
    assert got[0]["n"] == 5
    # the auto-prune actually dropped files on the simple point query
    pruned = eng._mount_format_path("delta", d, [("id", "==", 42)])
    full = eng._mount_format_path("delta", d, None)
    assert len(pruned.inputFiles()) < len(full.inputFiles())


def test_select_hudi_path_with_bucket_pruning(spark, tmp_path):
    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
    )

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "reg.json"))
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("n"), F.col("id")).alias("name")
    )
    h = str(tmp_path / "h")
    export_hudi_cow(df, h, record_key="id", num_files=6, col_stats=True)
    got = eng.sql(
        f"SELECT id, name FROM hudi.`{h}` WHERE id = 7"
    ).collect()
    assert [(r.id, r.name) for r in got] == [(7, "n7")]
    # the mounted point lookup scanned one file group
    m = eng._mount_format_path("hudi", h, [("id", "==", 7)])
    assert len([f for f in m.inputFiles() if f.endswith(".parquet")]) == 1


def test_format_path_maintenance_sql(spark, tmp_path):
    """r13: OPTIMIZE / VACUUM / ANALYZE TABLE ... COMPUTE STATISTICS
    on format-path tables route to the interop services (always
    stats-writing — a real OPTIMIZE never drops skipping metadata)."""
    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.delta_interop import (
        export_delta,
        read_delta_pruned,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.hudi_interop import (
        export_hudi_cow,
        read_hudi,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.iceberg_interop import (
        export_iceberg,
        read_iceberg_pruned,
    )

    eng = EngineSession(spark=spark, registry_path=str(tmp_path / "r.json"))
    df = (
        spark.range(400)
        .select(
            F.col("id"),
            (F.col("id") % 10).alias("g"),
            F.concat(F.lit("s"), F.col("id")).alias("s"),
        )
        .repartition(4)
    )

    d = str(tmp_path / "d")
    export_delta(df, d)
    row = eng.sql(f"OPTIMIZE delta.`{d}` ZORDER BY (id, g)").collect()[0]
    assert row["optimized"].startswith("v1:")
    # the optimize wrote stats -> ANALYZE finds nothing left to do
    assert (
        eng.sql(f"ANALYZE TABLE delta.`{d}` COMPUTE STATISTICS")
        .collect()[0]["stats_files"]
        == 0
    )

    i = str(tmp_path / "i")
    export_iceberg(df, i, format_version=2)
    assert (
        eng.sql(f"ANALYZE TABLE iceberg.`{i}` COMPUTE STATISTICS")
        .collect()[0]["stats_files"]
        == 4
    )
    eng.sql(f"OPTIMIZE iceberg.`{i}` ZORDER BY (id)")
    pr = read_iceberg_pruned(spark, i, [("id", "==", 5)])
    assert pr.count() == 1 and len(pr.inputFiles()) == 1

    h = str(tmp_path / "h")
    export_hudi_cow(df, h, record_key="id", num_files=4)
    assert (
        eng.sql(f"ANALYZE TABLE hudi.`{h}` COMPUTE STATISTICS")
        .collect()[0]["stats_files"]
        == 4
    )
    out = eng.sql(f"OPTIMIZE hudi.`{h}` ZORDER BY (id)").collect()[0]
    assert "clustered" in out["optimized"]
    assert read_hudi(spark, h).count() == 400

    assert eng.sql(f"VACUUM delta.`{d}`").collect()[0]["removed"] == 4
    assert eng.sql(f"VACUUM iceberg.`{i}`").collect()[0]["removed"] > 0
    # uniform refusals
    import pytest as _pytest

    with _pytest.raises(ValueError, match="VACUUM uniform"):
        eng.sql(f"VACUUM uniform.`{d}`")
    with _pytest.raises(ValueError, match="ZORDER"):
        eng.sql(f"OPTIMIZE uniform.`{d}` ZORDER BY (id)")
    # engine-table OPTIMIZE spelling still routes to the lake
    eng.create_upsert_table("t9", str(tmp_path / "t9"), key=["id"])
    eng.insert_into(
        "t9", spark.range(5).select("id"), commit_id="c1"
    )
    assert eng.sql("OPTIMIZE t9").collect()[0]["table"] == "t9"
    # a delta-pruned read after SQL optimize still returns exact rows
    assert read_delta_pruned(spark, d, [("id", "==", 5)]).count() == 1
