"""Classic warehouse analytics pack (TPC-H-shaped) over the star
schema, adapted to the columns the synthetic testdata carries.

The reference's query surface is the flagship CDC join plus simple
scans/aggs (SURVEY.md §2.2); a user replacing it with this engine
also gets the standard interactive-analytics idioms a lakehouse is
queried with — scan-heavy summary aggs, EXISTS semi-joins, scalar
subqueries, two-level market-share aggregation, anti-join cohort
selection. Every query here has a full DuckDB oracle (identical
aliases, rounded float aggs, timestamps stringified) and a
scale-conscious plan: selective filters sit below the joins so they
push into the parquet scans, dimension tables (nation/region/
supplier at test scale) broadcast, and global scalars (max revenue,
avg balance) are computed as one-row aggregates joined back via
broadcast — never via a single-partition global window.

Registered into the same ``QUERIES`` registry as
``plans/queries.py`` (imported from there at module end).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .queries import register

_R2 = lambda c: F.round(c, 2)  # noqa: E731


def _disc():
    # built lazily: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@register(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       ROUND(AVG(l_quantity), 2) AS avg_qty,
       ROUND(AVG(l_extendedprice), 2) AS avg_price,
       ROUND(AVG(l_discount), 4) AS avg_disc,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    headline=True,
    doc="TPC-H Q1 shape: full-scan pricing summary. One shuffle of "
    "4-ish grouped rows after map-side partial aggregation; the "
    "shipdate filter and 7-column projection push into the scan.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        _R2(F.sum("l_quantity")).alias("sum_qty"),
        _R2(F.sum("l_extendedprice")).alias("sum_base_price"),
        _R2(F.sum(_disc())).alias("sum_disc_price"),
        _R2(F.sum(_disc() * (1 + F.col("l_tax")))).alias("sum_charge"),
        _R2(F.avg("l_quantity")).alias("avg_qty"),
        _R2(F.avg("l_extendedprice")).alias("avg_price"),
        F.round(F.avg("l_discount"), 4).alias("avg_disc"),
        F.count("*").alias("count_order"),
    )


@register(
    "order_priority",
    """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape: EXISTS(l_shipdate > o_orderdate) is "
    "algebraically MAX(l_shipdate) > o_orderdate per order, so the "
    "fact side pre-aggregates to one (orderkey, max_ship) row per "
    "order BEFORE the join — the hash build shrinks from every "
    "lineitem row to one row per order and is a reduced relation, "
    "never a raw fact scan. The quarter filter pushes into the "
    "orders scan.",
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    last_ship = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("_max_ship"))
    )
    return (
        o.join(last_ship, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("_max_ship") > F.col("o_orderdate"))
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@register(
    "volume_shipping",
    """
SELECT supp_nation, cust_nation, l_year,
       ROUND(SUM(volume), 2) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         CAST(EXTRACT(year FROM l_shipdate) AS INT) AS l_year,
         l_extendedprice * (1 - l_discount) AS volume
  FROM supplier
  JOIN lineitem ON s_suppkey = l_suppkey
  JOIN orders ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_10')
      OR (n1.n_name = 'NATION_10' AND n2.n_name = 'NATION_12'))
    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
    doc="TPC-H Q7 shape: bi-directional trade volume between two "
    "nations by year. Both nation dims and supplier broadcast; the "
    "shipdate range pushes into the lineitem scan; the OR'd nation "
    "pair filter prunes before the final rollup.",
)
def q_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n1 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
        )
    )
    n2 = F.broadcast(
        load_table(spark, sf_dir, "nation").select(
            F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")
        )
    )
    pair = (
        ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_10"))
        | ((F.col("supp_nation") == "NATION_10") & (F.col("cust_nation") == "NATION_12"))
    )
    return (
        F.broadcast(s)
        .join(li, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n1, F.col("s_nationkey") == F.col("s_nk"))
        .join(n2, F.col("c_nationkey") == F.col("c_nk"))
        .filter(pair)
        .select(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("l_year"),
            _disc().alias("volume"),
        )
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(_R2(F.sum("volume")).alias("revenue"))
    )


@register(
    "market_share",
    """
SELECT o_year,
       ROUND(SUM(CASE WHEN supp_nation = 'NATION_10' THEN volume ELSE 0 END)
             / SUM(volume), 4) AS mkt_share
FROM (
  SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n1.n_name AS supp_nation
  FROM part
  JOIN lineitem ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8 shape: one nation's share of PROMO-part revenue "
    "into ASIA customers, per order year. The conditional-sum "
    "ratio computes both tiers in ONE aggregation (no second "
    "shuffle); part/supplier/nation/region all broadcast.",
)
def q_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
    )
    c = load_table(spark, sf_dir, "customer")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")
    )
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = F.col("volume")
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"), "left_semi")
        .select(
            F.year("o_orderdate").alias("o_year"),
            _disc().alias("volume"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_10", vol).otherwise(0.0))
                / F.sum(vol),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "returned_items",
    """
SELECT c_custkey, c_name,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       ROUND(c_acctbal, 2) AS acctbal, n_name
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    doc="TPC-H Q10 shape: top-20 customers by returned-item revenue. "
    "Both filters push into their scans; the final top-k is "
    "TakeOrderedAndProject (total order via the c_custkey "
    "tiebreak), never a global sort.",
)
def q_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    # fact-first: the returned-lineitem scan probes; the date-filtered
    # orders and customer sides build (never the fact)
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(n, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(_R2(F.sum(_disc())).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            _R2(F.col("c_acctbal")).alias("acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


@register(
    "promo_revenue",
    """
SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount)
                              ELSE 0 END)
             / SUM(l_extendedprice * (1 - l_discount)), 2) AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-09-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-10-01 00:00:00'
""",
    doc="TPC-H Q14 shape: promo share of one month's revenue. Part "
    "broadcasts (it must NOT be filtered to PROMO — the denominator "
    "needs every matched part); single global agg of one row.",
)
def q_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    p = F.broadcast(load_table(spark, sf_dir, "part").select("p_partkey", "p_type"))
    return (
        li.join(p, F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", _disc()).otherwise(0.0))
                / F.sum(_disc()),
                2,
            ).alias("promo_revenue")
        )
    )


@register(
    "top_supplier",
    """
WITH revenue0 AS (
  SELECT l_suppkey AS supplier_no,
         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue0 ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
""",
    doc="TPC-H Q15 shape: supplier(s) with the quarter's max revenue. "
    "The scalar max is a one-row aggregate broadcast-joined back "
    "onto the per-supplier rollup — no single-partition global "
    "window; revenue rounded BEFORE the equality so both engines "
    "compare identical doubles.",
)
def q_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        _R2(F.sum(_disc())).alias("total_revenue")
    )
    mx = F.broadcast(rev.agg(F.max("total_revenue").alias("_mx")))
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    return (
        rev.join(mx, F.col("total_revenue") == F.col("_mx"))
        .join(s, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "large_orders",
    """
SELECT c_name, c_custkey, o_orderkey,
       CAST(o_orderdate AS VARCHAR) AS order_date_str,
       o_totalprice,
       ROUND(SUM(l_quantity), 2) AS sum_qty
FROM customer
JOIN orders ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
HAVING SUM(l_quantity) > 250
""",
    doc="TPC-H Q18 shape: orders whose total quantity exceeds 250, "
    "with their customer. The quantity sum is keyed on the ORDER, so "
    "it pre-aggregates on the fact table alone and the HAVING "
    "applies BEFORE any join — only qualifying orders (a tiny "
    "fraction) ever join orders/customer, and no raw fact scan is "
    "ever a hash build. Timestamps stringified for cross-engine "
    "hashing.",
)
def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    big = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > 250)  # HAVING, pushed before the joins
    )
    return (
        o.join(big, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c, F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("string").alias("order_date_str"),
            "o_totalprice",
            _R2(F.col("_sq")).alias("sum_qty"),
        )
    )


@register(
    "dormant_customers",
    """
SELECT c_mktsegment, COUNT(*) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c_custkey
                    AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
GROUP BY c_mktsegment
""",
    doc="TPC-H Q22 shape: high-balance customers with no recent "
    "orders, per segment. The global average is a one-row "
    "broadcast; NOT EXISTS is a left-anti join against the "
    "date-filtered orders scan (filter pushed down).",
)
def q_dormant_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    avg_bal = F.broadcast(
        c.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("_avg"))
    )
    # the anti join needs only the KEY SET of recent orderers: distinct
    # first so the hash build is one row per recent customer, not one
    # per recent order
    recent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
        .distinct()
    )
    return (
        c.join(avg_bal)
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("numcust"),
            _R2(F.sum("c_acctbal")).alias("totacctbal"),
        )
    )


@register(
    "customer_distribution",
    """
SELECT c_count, CAST(count(*) AS BIGINT) AS custdist
FROM (
  SELECT c_custkey, CAST(count(o_orderkey) AS INT) AS c_count
  FROM customer LEFT OUTER JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
)
GROUP BY c_count
""",
    doc="TPC-H Q13 shape: distribution of per-customer order counts "
    "(customers with zero orders included). The per-customer count "
    "is computed on the ORDERS side ALONE first (one grouped pass "
    "over the fact, map-side partials), then LEFT-joined onto "
    "customer — the outer join's build side is one row per ordering "
    "customer instead of one per order, and zero-order customers "
    "surface as COALESCE 0 (the original predicate-in-join-condition "
    "semantics, aggregated early). The second groupBy shuffles one "
    "row per distinct count value.",
)
def q_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    ocnt = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count("*").cast("int").alias("_n"))
    )
    per_cust = c.join(
        ocnt, F.col("c_custkey") == F.col("o_custkey"), "left_outer"
    ).select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "disjunctive_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 30)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25
       AND l_quantity BETWEEN 10 AND 40)
   OR (p_type = 'PROMO' AND l_quantity >= 25)
""",
    doc="TPC-H Q19 shape: revenue under an OR of brand/size/quantity "
    "conjunctions. The part-only disjuncts (brand+size, type) are "
    "derivable prefilters Catalyst pushes below the broadcast join; "
    "the mixed predicate applies post-join. One single-row global "
    "aggregate — no grouped shuffle at all.",
)
def q_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = F.broadcast(load_table(spark, sf_dir, "part"))
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 40)
        )
        | ((F.col("p_type") == "PROMO") & (F.col("l_quantity") >= 25))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(cond)
        .agg(
            _R2(F.sum(_disc())).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "forecast_revenue",
    """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
       CAST(count(*) AS BIGINT) AS n_items
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.04 AND 0.06
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape: forecast revenue change. Pure scan-aggregate "
    "— all three predicates and the 4-column projection push into the "
    "parquet scan (min/max rowgroup stats prune by shipdate at 100 TB "
    "when the lake is date-laid-out); a single-row global aggregate, "
    "zero join, zero grouped shuffle.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.04, 0.06)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            _R2(F.sum(F.col("l_extendedprice") * F.col("l_discount"))).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "small_quantity_revenue",
    """
WITH pf AS (
  SELECT p_partkey FROM part WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
),
lf AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN pf ON p_partkey = l_partkey
),
thr AS (
  SELECT l_partkey AS t_partkey, 0.5 * AVG(l_quantity) AS lim
  FROM lf GROUP BY 1
)
SELECT ROUND(SUM(l_extendedprice) / 7.0, 2) AS avg_yearly,
       CAST(count(*) AS BIGINT) AS n_items
FROM lf JOIN thr ON l_partkey = t_partkey
WHERE l_quantity < lim
""",
    doc="TPC-H Q17 shape: revenue from small-quantity orders of a "
    "brand/type slice, vs a per-part correlated AVG subquery. Scale "
    "plan: the part filter broadcasts FIRST, so lineitem is pruned to "
    "the slice before the per-part average is computed — the grouped "
    "shuffle and the join-back both run over slice-sized data, never "
    "the full fact table; the per-part threshold table (<= filtered "
    "part count rows) broadcasts back. The naive plan (global per-part "
    "AVG over all of lineitem) would shuffle 100 TB to use 0.1%% of it.",
)
def q_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    pf = (
        load_table(spark, sf_dir, "part")
        .filter((F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL"))
        .select("p_partkey")
    )
    lf = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(F.broadcast(pf), F.col("p_partkey") == F.col("l_partkey"))
        .drop("p_partkey")
    )
    thr = lf.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.5 * F.avg("l_quantity")).alias("lim")
    )
    return (
        lf.join(F.broadcast(thr), F.col("l_partkey") == F.col("t_partkey"))
        .filter(F.col("l_quantity") < F.col("lim"))
        .agg(
            _R2(F.sum("l_extendedprice") / 7.0).alias("avg_yearly"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "set_ops_customers",
    """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""",
    doc="Set operations (SURVEY.md 2.5 extension surface: UNION/"
    "INTERSECT/EXCEPT are absent from the reference): high-balance "
    "customers who placed an urgent order but never a finished one. "
    "INTERSECT/EXCEPT compile to hash-aggregated left-semi/left-anti "
    "joins on the single projected column; each input is pruned to "
    "one column at the scan and the distinct aggregation is partial "
    "before the shuffle.",
)
def q_set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 5000)
        .select("c_custkey")
    )
    o = load_table(spark, sf_dir, "orders")
    urgent = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("c_custkey")
    )
    finished = o.filter(F.col("o_orderstatus") == "F").select(
        F.col("o_custkey").alias("c_custkey")
    )
    # SQL-standard precedence: INTERSECT binds tighter than EXCEPT.
    return c.intersect(urgent).exceptAll(finished.distinct())


@register(
    "grouping_sets_agg",
    """
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
           AS gid,
       ROUND(SUM(l_extendedprice), 2) AS sum_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
""",
    doc="Arbitrary GROUPING SETS (beyond rollup/cube, which are "
    "separate entries): detail, per-flag, and grand-total levels in "
    "one pass. Expressed through the engine's SQL route (the "
    "DataFrame API exposes only rollup/cube); Expand + two-tier "
    "HashAggregate, partial before the shuffle, 3x row expansion "
    "bounded by the grouping-set count.",
)
def q_grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gs"
    )
    return spark.sql(
        """
        SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
               COALESCE(l_linestatus, 'ALL') AS linestatus,
               CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
                    AS BIGINT) AS gid,
               ROUND(SUM(l_extendedprice), 2) AS sum_price,
               count(*) AS n
        FROM lineitem_gs
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
                                (l_returnflag), ())
        """
    )


@register(
    "sliding_window_agg",
    """
WITH offs AS (SELECT * FROM (VALUES (0), (1)) AS t(i))
SELECT strftime(time_bucket(INTERVAL 5 MINUTE, ts) - i * INTERVAL 5 MINUTE,
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       ROUND(SUM(value), 2) AS total_value
FROM events CROSS JOIN offs
GROUP BY 1, 2
""",
    doc="Sliding event-time windows, 10-min size / 5-min slide "
    "(completes the window-type triad with tumbling_window_agg and "
    "sessionize; streaming flavor shares the same F.window call). "
    "Each event lands in size/slide = 2 windows; Spark's window() "
    "expands in-map (Expand node) before the grouped shuffle, so "
    "shuffle volume is 2x the aggregated rows, not 2x the events.",
)
def q_sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "10 minutes", "5 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
            "n",
            "total_value",
        )
    )


@register(
    "product_profit",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS o_year,
       ROUND(SUM(l_extendedprice * (1 - l_discount)) / 1000, 1)
           AS profit_k
FROM lineitem
JOIN orders   ON o_orderkey = l_orderkey
JOIN ps       ON ps.l_partkey = lineitem.l_partkey
             AND ps.l_suppkey = lineitem.l_suppkey
JOIN supplier ON s_suppkey = lineitem.l_suppkey
JOIN nation   ON n_nationkey = s_nationkey
JOIN part     ON p_partkey = lineitem.l_partkey
WHERE p_name LIKE '%a%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape (product-type profit by nation and year), "
    "with the partsupp bridge DERIVED as the distinct (part, "
    "supplier) pairs actually traded — the testdata carries no "
    "partsupp table, and deriving it exercises a 6-way join with a "
    "self-derived dimension. Scale: part/supplier/nation broadcast; "
    "the derived ps is supplier-catalog-sized (distinct pairs), far "
    "smaller than the fact table; one grouped shuffle of "
    "(nation x year) rows after map-side partials. Profit reported "
    "in thousands at 1 decimal: group sums reach ~1e7 where double "
    "summation-order noise (~1e-2 absolute) flips a cents-level "
    "ROUND across engines; thousand-scale rounding leaves 4 orders "
    "of margin.",
)
def q_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%a%"))
    ps = li.select("l_partkey", "l_suppkey").distinct().select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
    )
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(
            ps,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
        )
        .agg(F.round(F.sum(_disc()) / 1000, 1).alias("profit_k"))
    )


@register(
    "parts_supplier_stats",
    """
WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p_brand, p_type,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM ps JOIN part ON p_partkey = l_partkey
WHERE p_size >= 20
  AND l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type
""",
    doc="TPC-H Q16 shape (supplier count per part brand/type, "
    "excluding a supplier blacklist) over the derived partsupp "
    "bridge. The NOT IN compiles to a broadcast anti-join (the "
    "blacklist is supplier-sized); count(DISTINCT) expands via "
    "Spark's two-tier distinct aggregation, partial before the "
    "shuffle.",
)
def q_parts_supplier_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") >= 20)
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select(F.col("s_suppkey").alias("l_suppkey"))
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), "l_suppkey", "left_anti")
        .join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "supplier_rank_stats",
    """
WITH rev AS (
  SELECT l_suppkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS r
  FROM lineitem GROUP BY l_suppkey
)
SELECT l_suppkey,
       r AS revenue,
       CAST(ntile(10) OVER (ORDER BY r, l_suppkey) AS INT) AS decile,
       ROUND(percent_rank() OVER (ORDER BY r, l_suppkey), 4) AS pct_rank,
       ROUND(cume_dist() OVER (ORDER BY r, l_suppkey), 4) AS cume
FROM rev
""",
    doc="Ranking-function triple (ntile / percent_rank / cume_dist) "
    "over per-supplier revenue — completes the window-function "
    "inventory beyond rank/row_number/lag. The global ORDER BY "
    "window runs over the AGGREGATED supplier table (catalog-sized, "
    "one row per supplier), never the fact table — the pre-aggregate "
    "is what makes a global ranking window acceptable at scale.",
)
def q_supplier_rank_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(_R2(F.sum(_disc())).alias("r"))
    w = Window.orderBy("r", "l_suppkey")
    return rev.select(
        "l_suppkey",
        F.col("r").alias("revenue"),
        F.ntile(10).over(w).cast("int").alias("decile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


@register(
    "big_spenders",
    """
WITH spend AS (
  SELECT c_custkey, c_name, c_nationkey,
         ROUND(SUM(o_totalprice), 2) AS total
  FROM customer JOIN orders ON o_custkey = c_custkey
  GROUP BY c_custkey, c_name, c_nationkey
),
nat AS (
  SELECT c_nationkey AS nk, AVG(total) AS nat_avg FROM spend GROUP BY 1
)
SELECT n_name, c_name, total,
       ROUND(total / nat_avg, 2) AS x_nation_avg
FROM spend
JOIN nat ON nk = c_nationkey
JOIN nation ON n_nationkey = c_nationkey
WHERE total > 2 * nat_avg
""",
    doc="Correlated aggregate comparison (customers spending >2x "
    "their nation's average): the correlated scalar subquery "
    "decorrelates into a per-nation aggregate over the ALREADY "
    "customer-sized spend rollup (nation-count rows), broadcast back "
    "— two grouped shuffles of shrinking size, the fact table "
    "touched once.",
)
def q_big_spenders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    spend = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name", "c_nationkey")
        .agg(_R2(F.sum("o_totalprice")).alias("total"))
    )
    nat = spend.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.avg("total").alias("nat_avg")
    )
    return (
        spend.join(F.broadcast(nat), F.col("nk") == F.col("c_nationkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .filter(F.col("total") > 2 * F.col("nat_avg"))
        .select(
            "n_name",
            "c_name",
            "total",
            F.round(F.col("total") / F.col("nat_avg"), 2).alias(
                "x_nation_avg"
            ),
        )
    )


@register(
    "min_cost_supplier",
    """
WITH unit AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_price
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
regional AS (
  SELECT u.l_partkey, u.l_suppkey, u.unit_price, s_name
  FROM unit u
  JOIN supplier ON s_suppkey = u.l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  JOIN region ON r_regionkey = n_regionkey
  WHERE r_name = 'ASIA'
)
SELECT p_partkey, s_name,
       FLOOR(unit_price * 100 + 0.5) / 100 AS best_price
FROM (
  SELECT r.*, p_partkey,
         row_number() OVER (
           PARTITION BY r.l_partkey
           ORDER BY r.unit_price, r.l_suppkey) AS rn
  FROM regional r JOIN part ON p_partkey = r.l_partkey
  WHERE p_size >= 30
)
WHERE rn = 1
""",
    doc="TPC-H Q2 shape (min-cost supplier per part within a region), "
    "with supply cost DERIVED as the minimum traded unit price per "
    "(part, supplier) — the testdata carries no partsupp. The "
    "correlated MIN subquery decorrelates to a per-part window over "
    "the ALREADY-AGGREGATED bridge (one grouped pass over the fact, "
    "then part-keyed WindowGroupLimit); supplier/nation/region "
    "broadcast; the p_size filter prunes parts before the window.",
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W2

    li = load_table(spark, sf_dir, "lineitem")
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    r = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    p = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") >= 30)
        .select("p_partkey")
    )
    unit = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias(
            "unit_price"
        )
    )
    regional = (
        unit.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(n, F.col("n_nationkey") == F.col("s_nationkey"))
        .join(r, F.col("r_regionkey") == F.col("n_regionkey"), "left_semi")
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
    )
    w = W2.partitionBy("l_partkey").orderBy("unit_price", "l_suppkey")
    return (
        regional.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "p_partkey",
            "s_name",
            # half-up on the BINARY double (floor(x*100+0.5)/100):
            # Spark's ROUND goes through Double.toString decimals and
            # DuckDB's rounds the binary value, so they disagree on
            # exact .5 boundaries; this form is bit-identical in both
            (F.floor(F.col("unit_price") * 100 + 0.5) / 100).alias(
                "best_price"
            ),
        )
    )


@register(
    "linestatus_priority_counts",
    """
SELECT l_linestatus,
       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_count,
       CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS low_count
FROM lineitem JOIN orders ON o_orderkey = l_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY l_linestatus
""",
    doc="TPC-H Q12 shape (priority split per ship category; the "
    "testdata has no l_shipmode, so l_linestatus is the category): "
    "conditional-sum pivot in ONE aggregation, shipdate year pushed "
    "into the fact scan, fact-first join with orders as the build "
    "side (2 columns).",
)
def q_linestatus_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    is_high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(is_high.cast("long")).alias("high_count"),
            F.sum((~is_high).cast("long")).alias("low_count"),
        )
    )


@register(
    "last_shipper",
    """
WITH per_order AS (
  SELECT l_orderkey,
         MAX(l_shipdate) AS max_ship,
         COUNT(DISTINCT l_suppkey) AS n_supp
  FROM lineitem GROUP BY l_orderkey
),
last_suppliers AS (
  SELECT li.l_orderkey, li.l_suppkey
  FROM lineitem li
  JOIN per_order p ON p.l_orderkey = li.l_orderkey
                  AND li.l_shipdate = p.max_ship
  WHERE p.n_supp >= 2
  GROUP BY li.l_orderkey, li.l_suppkey
),
sole AS (
  SELECT l_orderkey, MIN(l_suppkey) AS l_suppkey
  FROM last_suppliers
  GROUP BY l_orderkey
  HAVING COUNT(*) = 1
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM sole JOIN supplier ON s_suppkey = l_suppkey
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
""",
    doc="TPC-H Q21 shape (suppliers solely responsible for an order's "
    "final shipment, multi-supplier orders only; the testdata has no "
    "receipt/commit dates, so 'kept waiting' = sole latest shipper). "
    "Both EXISTS/NOT-EXISTS decorrelate into per-order aggregates: "
    "one grouped pass for (max_ship, n_supp), a self-join on the "
    "order key filtered to the max-ship rows, a sole-supplier HAVING "
    "— every step an order-keyed hash shuffle, top-10 via "
    "TakeOrderedAndProject.",
)
def q_last_shipper(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    s = F.broadcast(load_table(spark, sf_dir, "supplier"))
    per_order = li.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("max_ship"),
        F.count_distinct("l_suppkey").alias("n_supp"),
    )
    last_sup = (
        li.join(
            per_order.filter(F.col("n_supp") >= 2),
            ["l_orderkey"],
        )
        .filter(F.col("l_shipdate") == F.col("max_ship"))
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    sole = (
        last_sup.groupBy("l_orderkey")
        .agg(
            F.min("l_suppkey").alias("l_suppkey"),
            F.count("*").alias("_n"),
        )
        .filter(F.col("_n") == 1)
    )
    return (
        sole.join(s, F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count("*").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


@register(
    "stock_concentration",
    """
WITH supplier_nation AS (
  SELECT s_suppkey FROM supplier JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_12'
),
part_value AS (
  SELECT l_partkey, SUM(l_extendedprice * l_quantity) AS value
  FROM lineitem JOIN supplier_nation ON s_suppkey = l_suppkey
  GROUP BY l_partkey
)
SELECT l_partkey, ROUND(value, 2) AS value
FROM part_value,
     (SELECT SUM(value) AS total FROM part_value) t
WHERE value > 0.002 * total
ORDER BY value DESC, l_partkey
""",
    doc="TPC-H Q11 shape (inventory-value concentration): per-part "
    "traded value restricted to one nation's suppliers, keeping "
    "parts above a FRACTION OF THE GLOBAL TOTAL — the "
    "scalar-subquery-in-HAVING pattern. The nation's supplier keys "
    "broadcast as a semi-join; the global total is a one-row "
    "aggregate REUSED from the same grouped result (no second scan) "
    "and broadcast under the filter; top-k order via "
    "TakeOrderedAndProject... actually a full ORDER BY of the "
    "surviving concentrated parts (a tiny fraction by construction).",
)
def q_stock_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    sn = (
        load_table(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                load_table(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_12"
                )
            ),
            F.col("n_nationkey") == F.col("s_nationkey"),
            "left_semi",
        )
        .select("s_suppkey")
    )
    pv = (
        li.join(
            F.broadcast(sn), F.col("s_suppkey") == F.col("l_suppkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity")).alias(
                "value"
            )
        )
    )
    total = pv.agg(F.sum("value").alias("total"))
    return (
        pv.join(F.broadcast(total))
        .filter(F.col("value") > 0.002 * F.col("total"))
        .select("l_partkey", _R2(F.col("value")).alias("value"))
        .orderBy(F.desc("value"), "l_partkey")
    )


@register(
    "excess_stock_suppliers",
    """
WITH apart AS (SELECT p_partkey FROM part WHERE p_name LIKE '%gear%'),
shipped AS (
  SELECT l_suppkey, l_partkey, SUM(l_quantity) AS qty
  FROM lineitem JOIN apart ON p_partkey = l_partkey
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l_suppkey, l_partkey
),
qualifying AS (
  SELECT DISTINCT l_suppkey FROM shipped WHERE qty > 60
)
SELECT s_name, s_suppkey
FROM supplier JOIN qualifying ON supplier.s_suppkey = qualifying.l_suppkey
ORDER BY s_suppkey
""",
    doc="TPC-H Q20 shape (suppliers with excess movement of a part "
    "family in a year; the testdata has no partsupp availqty, so the "
    "threshold applies to shipped quantity of gear parts): the nested "
    "IN(part-family) / correlated-quantity chain decorrelates into a "
    "broadcast semi-join on the part family + ONE grouped pass per "
    "(supplier, part) + a distinct key set — each step strictly "
    "shrinking, no correlated re-scans.",
)
def q_excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    apart = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%gear%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    shipped = (
        li.join(
            F.broadcast(apart), F.col("p_partkey") == F.col("l_partkey"),
            "left_semi",
        )
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
    )
    qualifying = (
        shipped.filter(F.col("qty") > 60).select("l_suppkey").distinct()
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        s.join(qualifying, F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_name", "s_suppkey")
        .orderBy("s_suppkey")
    )
