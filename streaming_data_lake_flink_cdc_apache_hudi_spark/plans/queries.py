"""Query registry: every operator from SURVEY.md §2 as a
(spark, sf_dir) -> DataFrame callable plus, where SQL-expressible,
the equivalent DuckDB oracle SQL.

Conventions (driver contract, __spark_entry__.py):
- every computed column is aliased IDENTICALLY in Spark and SQL;
- timestamps in outputs are formatted to second precision strings
  (events.ts is ns in parquet — Spark truncates to us, DuckDB keeps
  ns, so raw timestamps would hash-mismatch);
- floating aggregates are rounded (accumulation order differs between
  engines);
- every ordering used for top-k / LWW is total (unique tiebreak
  column) so results are deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from ..operators.joins import ticket_view as _ticket_view_op, flagship_join
from ..operators.upsert import latest_by_key, upsert_batch


@dataclass
class QuerySpec:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # DuckDB SQL, or None -> rows-only check
    headline: bool = False  # include in bench.py
    doc: str = ""


QUERIES: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, headline: bool = False, doc: str = ""):
    def deco(fn):
        QUERIES[name] = QuerySpec(fn=fn, oracle=oracle, headline=headline, doc=doc)
        return fn

    return deco


def query_fns() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in QUERIES.items()}


def oracle_sqls() -> dict[str, str]:
    return {n: s.oracle for n, s in QUERIES.items() if s.oracle is not None}


# ---------------------------------------------------------------------------
# §2.2 R7+R11 — flagship: 3-way join -> keyed upsert view (zpln:2317 ¶53)
# ---------------------------------------------------------------------------

_TICKET_VIEW_ORACLE = """
WITH raw AS (
  SELECT c_name AS full_name,
         CAST(o_orderkey AS VARCHAR) AS id,
         o_totalprice AS ticket_price,
         CAST(l_shipdate AS VARCHAR) AS transaction_date_time,
         o_orderkey AS _oid, l_linenumber AS _lno
  FROM customer
  JOIN orders ON c_custkey = o_custkey
  JOIN lineitem ON l_orderkey = o_orderkey
)
SELECT full_name, id, ticket_price, transaction_date_time
FROM (
  SELECT *, row_number() OVER (
      PARTITION BY full_name
      ORDER BY transaction_date_time DESC, _oid DESC, _lno DESC) AS rn
  FROM raw
)
WHERE rn = 1
"""


@register(
    "ticket_view",
    _TICKET_VIEW_ORACLE,
    headline=True,
    doc="Flagship: person x ticket x hist join -> LWW upsert by full_name "
    "(CDC-Hudi-Notebook.zpln:2317 ¶53, sink DDL :2234 ¶51).",
)
def q_ticket_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ticket_view_op(
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# §2.2 R6+R8+R9 — duplicate check over the upsert view (zpln:2757 ¶61)
# ---------------------------------------------------------------------------


@register(
    "ticket_view_dup_check",
    f"""
SELECT full_name, cnt FROM (
  SELECT full_name, count(*) AS cnt
  FROM ({_TICKET_VIEW_ORACLE}) GROUP BY full_name
) WHERE cnt > 1
""",
    doc="No-duplicates invariant: GROUP BY over the upsert view, HAVING "
    "cnt>1 -> must be empty (zpln:2757 ¶61; golden scenario 4).",
)
def q_dup_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    view = q_ticket_view(spark, sf_dir)
    return (
        view.groupBy("full_name")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") > 1)
        .select("full_name", "cnt")
    )


# ---------------------------------------------------------------------------
# §2.2 R5 — keyed equality filter on a snapshot read (zpln:665 ¶15)
# ---------------------------------------------------------------------------


@register(
    "keyed_filter",
    "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey = 42",
    doc="WHERE pk = const on a snapshot read (zpln:665 ¶15); predicate "
    "pushed to the parquet scan.",
)
def q_keyed_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") == 42)
        .select("c_custkey", "c_name", "c_acctbal")
    )


# ---------------------------------------------------------------------------
# §2.2 R10 — full scan (zpln:463 ¶11 etc.)
# ---------------------------------------------------------------------------


@register(
    "full_scan",
    "SELECT n_nationkey, n_name, n_regionkey FROM nation",
    doc="SELECT * snapshot scan (zpln:463 ¶11).",
)
def q_full_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )


# ---------------------------------------------------------------------------
# §2.2 R3+R4 — projection with CAST (zpln:2161 ¶49)
# ---------------------------------------------------------------------------


@register(
    "projection_cast",
    """
SELECT CAST(o_orderkey AS VARCHAR) AS id,
       o_totalprice AS ticket_price,
       CAST(o_orderdate AS VARCHAR) AS order_date_str
FROM orders
""",
    doc="Project + CAST(double->string, timestamp->string) (zpln:2161 ¶49).",
)
def q_projection_cast(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        F.col("o_orderkey").cast("string").alias("id"),
        F.col("o_totalprice").alias("ticket_price"),
        F.col("o_orderdate").cast("string").alias("order_date_str"),
    )


# ---------------------------------------------------------------------------
# §2.4 — ORDER BY ... LIMIT top-k (zpln:895 ¶20: ORDER BY id DESC LIMIT 2)
# ---------------------------------------------------------------------------


@register(
    "orderby_limit",
    "SELECT c_custkey, c_name FROM customer ORDER BY c_custkey DESC LIMIT 2",
    doc="Top-k by unique key (zpln:895 ¶20). TakeOrderedAndProject: no "
    "full sort, per-partition top-k then driver merge.",
)
def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .orderBy(F.col("c_custkey").desc())
        .limit(2)
    )


# ---------------------------------------------------------------------------
# §2.2 R8 — unbounded grouped aggregation (zpln:2757 ¶61 inner query),
# widened to a TPC-H Q1-style multi-agg to exercise partial aggregation
# ---------------------------------------------------------------------------


@register(
    "group_agg",
    """
SELECT l_returnflag, l_linestatus,
       count(*) AS cnt,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(AVG(l_quantity), 4) AS avg_qty
FROM lineitem
GROUP BY l_returnflag, l_linestatus
""",
    headline=True,
    doc="Grouped agg with map-side partial aggregation (R8; Q1-style).",
)
def q_group_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.count("*").alias("cnt"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
    )


# ---------------------------------------------------------------------------
# §2.2 R1 + R11 — literal INSERT + upsert demo (zpln:375 ¶9, :577 ¶13):
# the t1 golden scenario — 8 rows, then key id1 upserted -> 8 live rows
# with id1 replaced (golden scenarios 1-2, FIXTURES.md F4)
# ---------------------------------------------------------------------------

_T1_ROWS = [
    ("id1", "Danny", 23, "1970-01-01 00:00:01"),
    ("id2", "Stephen", 33, "1970-01-01 00:00:02"),
    ("id3", "Julian", 53, "1970-01-01 00:00:03"),
    ("id4", "Fabian", 31, "1970-01-01 00:00:04"),
    ("id5", "Sophia", 18, "1970-01-01 00:00:05"),
    ("id6", "Emma", 20, "1970-01-01 00:00:06"),
    ("id7", "Grace", 19, "1970-01-01 00:00:07"),
    ("id8", "Han", 56, "1970-01-01 00:00:08"),
]
_T1_UPSERT = ("id1", "Francisco Morillo", 29, "2023-06-15 12:00:00")


def _t1_values_sql(rows) -> str:
    vals = ",".join(
        f"('{u}','{n}',{a},TIMESTAMP '{ts}')" for (u, n, a, ts) in rows
    )
    return f"(VALUES {vals}) AS t(uuid, name, age, ts)"


@register(
    "upsert_literals",
    f"""
SELECT uuid, name, age, CAST(ts AS VARCHAR) AS ts_str FROM (
  SELECT *, row_number() OVER (PARTITION BY uuid ORDER BY ts DESC) AS rn
  FROM {_t1_values_sql(_T1_ROWS + [_T1_UPSERT])}
) WHERE rn = 1
""",
    doc="t1 upsert demo: 8 literal rows + upsert of key id1; live state "
    "has id1 -> (Francisco Morillo, 29) (zpln:375 ¶9, :577 ¶13, :665 ¶15).",
)
def q_upsert_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    schema = "uuid string, name string, age int, ts string"
    seed = spark.createDataFrame(_T1_ROWS, schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    delta = spark.createDataFrame([_T1_UPSERT], schema).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    live = upsert_batch(seed, delta, "uuid", "ts")
    return live.select(
        "uuid", "name", "age", F.col("ts").cast("string").alias("ts_str")
    )


# ---------------------------------------------------------------------------
# §2.1 S1/S2 + changelog normalize — CDC current-state over the events
# table interpreted as a changelog (op derived deterministically;
# 'error' events ≙ deletes). Exercises the engine's retract semantics
# (zpln:1870 ¶42) with a SQL oracle.
# ---------------------------------------------------------------------------


@register(
    "cdc_current_state",
    """
SELECT user_id, last_event_type, last_value, last_ts FROM (
  SELECT user_id,
         event_type AS last_event_type,
         value AS last_value,
         strftime(ts, '%Y-%m-%d %H:%M:%S') AS last_ts,
         row_number() OVER (
             PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) WHERE rn = 1 AND last_event_type <> 'error'
""",
    doc="Changelog normalization (¶42 retract semantics): last event per "
    "key wins; a terminal 'error' event deletes the key.",
)
def q_cdc_current_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    latest = latest_by_key(ev, "user_id", ["ts", "event_id"])
    return latest.filter(F.col("event_type") != "error").select(
        "user_id",
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("last_ts"),
    )
