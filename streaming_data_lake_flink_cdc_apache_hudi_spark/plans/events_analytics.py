"""Product/event-analytics pack over the events stream table: trailing
moving averages, funnel conversion, and cohort retention — the query
shapes an events lake is interrogated with once the CDC pipeline has
landed the data (extension surface; the reference's notebook stops at
the flagship join).

Scale notes: every query here shuffles per-user or per-gram rollups,
never raw-event global sorts; window frames are bounded RANGE frames
(state is the 30-minute tail, not the partition); funnel stages scan
the events table once per stage with the stage's type filter pushed
into the parquet scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.parquet import load_table
from .queries import register


@register(
    "moving_average",
    """
SELECT event_id, user_id,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
       ROUND(avg(value) OVER (
         PARTITION BY user_id ORDER BY date_trunc('second', ts)
         RANGE BETWEEN INTERVAL 30 MINUTES PRECEDING AND CURRENT ROW
       ), 4) AS mavg
FROM events
""",
    doc="Per-user 30-minute trailing average of the event value — the "
    "time-series smoothing/anomaly baseline. RANGE frame on the "
    "SECOND-truncated event time (identical peer semantics in both "
    "engines); per-user partitions, frame state bounded by the "
    "30-minute tail — never the whole partition.",
)
def q_moving_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # NTZ -> TZ (session is UTC) -> epoch seconds (truncates micros)
    sec = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy(sec)
        .rangeBetween(-30 * 60, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        F.round(F.avg("value").over(w), 4).alias("mavg"),
    )


@register(
    "funnel_conversion",
    """
WITH v AS (
  SELECT user_id, min(ts) AS tv FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, min(e.ts) AS tc
  FROM events e JOIN v ON e.user_id = v.user_id
  WHERE e.event_type = 'click' AND e.ts > v.tv
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, min(e.ts) AS tp
  FROM events e JOIN c ON e.user_id = c.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.tc
  GROUP BY e.user_id
)
SELECT (SELECT count(*) FROM v) AS n_view,
       (SELECT count(*) FROM c) AS n_click,
       (SELECT count(*) FROM p) AS n_purchase
""",
    doc="Ordered funnel: users who viewed, then clicked AFTER their "
    "first view, then purchased AFTER that first qualifying click. "
    "Each stage is one type-filtered scan (filter pushed into "
    "parquet) joined to the previous stage's per-user firsts — "
    "stage tables shrink monotonically, and nothing ever sorts raw "
    "events.",
)
def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def first_after(etype: str, prev: DataFrame | None, prev_ts: str, out_ts: str):
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            e = e.join(prev, "user_id").filter(F.col("ts") > F.col(prev_ts))
        return e.groupBy("user_id").agg(F.min("ts").alias(out_ts))

    v = first_after("view", None, "", "tv")
    c = first_after("click", v, "tv", "tc")
    p = first_after("purchase", c, "tc", "tp")
    return (
        v.agg(F.count("*").alias("n_view"))
        .join(c.agg(F.count("*").alias("n_click")))
        .join(p.agg(F.count("*").alias("n_purchase")))
    )


@register(
    "cohort_retention",
    """
WITH first AS (
  SELECT user_id, date_trunc('week', min(ts)) AS cw
  FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS aw FROM events
)
SELECT strftime(cw, '%Y-%m-%d') AS cohort_week,
       CAST(date_diff('day', cw, aw) // 7 AS INT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM act JOIN first USING (user_id)
GROUP BY cw, date_diff('day', cw, aw) // 7
""",
    doc="Cohort retention matrix: users grouped by first-seen ISO "
    "week, counted in each later activity week. Two per-user "
    "rollups (first-seen, distinct active weeks) joined user-to-user "
    "— the classic retention triangle; both engines truncate weeks "
    "to ISO Monday, so the matrix is engine-exact.",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cw")
    )
    act = ev.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("aw")
    ).distinct()
    return (
        act.join(first, "user_id")
        .groupBy(
            F.date_format("cw", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("aw"), F.col("cw")) / 7)
            .cast("int")
            .alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@register(
    "value_anomalies",
    """
WITH st AS (
  SELECT event_id, user_id, event_type, value,
         avg(value) OVER (
           PARTITION BY event_type ORDER BY date_trunc('second', ts)
           RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                     AND INTERVAL 1 SECOND PRECEDING) AS mu,
         stddev_pop(value) OVER (
           PARTITION BY event_type ORDER BY date_trunc('second', ts)
           RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                     AND INTERVAL 1 SECOND PRECEDING) AS sd,
         count(*) OVER (
           PARTITION BY event_type ORDER BY date_trunc('second', ts)
           RANGE BETWEEN INTERVAL 24 HOURS PRECEDING
                     AND INTERVAL 1 SECOND PRECEDING) AS n_base
  FROM events
)
SELECT event_id, user_id, event_type,
       ROUND((value - mu) / sd, 2) AS zscore
FROM st
WHERE n_base >= 10 AND sd > 0
ORDER BY ROUND(abs((value - mu) / sd), 2) DESC, event_id
LIMIT 50
""",
    doc="Rolling z-score anomaly ranking per event type: each event "
    "scored against the trailing 24-hour baseline EXCLUDING itself "
    "and its same-second peers (the 1-second-preceding upper bound — "
    "identical peer semantics cross-engine); the 50 most anomalous "
    "surface (top-N, not a fixed sigma cut — robust to how heavy the "
    "tail actually is). RANGE window per event_type: state bounded "
    "by the 24-hour tail; the top-N is TakeOrderedAndProject, "
    "never a global sort.",
)
def q_value_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("timestamp").cast("long")
    w = (
        Window.partitionBy("event_type")
        .orderBy(sec)
        .rangeBetween(-24 * 60 * 60, -1)
    )
    mu = F.avg("value").over(w)
    sd = F.stddev_pop("value").over(w)
    n = F.count("*").over(w)
    z = (F.col("value") - mu) / sd
    return (
        ev.select(
            "event_id",
            "user_id",
            "event_type",
            F.round(z, 2).alias("zscore"),
            n.alias("_n"),
            sd.alias("_sd"),
            F.round(F.abs(z), 2).alias("_az"),
        )
        .filter((F.col("_n") >= 10) & (F.col("_sd") > 0))
        .orderBy(F.col("_az").desc(), "event_id")
        .limit(50)
        .drop("_n", "_sd", "_az")
    )


@register(
    "cep_pattern_match",
    """
WITH o AS (
  SELECT user_id, event_id, ts, event_type,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(ts, 2) OVER w AS end_ts
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS start_event_id,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(date_trunc('second', end_ts), '%Y-%m-%d %H:%M:%S') AS end_ts
FROM o
WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND epoch_us(end_ts) - epoch_us(ts) <= 86400000000::BIGINT
""",
    doc="MATCH_RECOGNIZE reduced to its relational core (Flink CEP "
    "parity): PATTERN (view click purchase) on STRICTLY CONSECUTIVE "
    "rows of each user's timeline, WITHIN 24h, AFTER MATCH SKIP TO "
    "NEXT ROW (every match position enumerated). Strict contiguity = "
    "lead(type, i) equality over ONE key-partitioned window sort — "
    "the sessionization shuffle, no joins, no state, no "
    "backtracking; the WITHIN bound is wall-time microsecond "
    "arithmetic (TIMESTAMP_NTZ), session-zone independent. "
    "Quantified/skip-past-last patterns need sequential per-key "
    "state (the applyInPandasWithState family) — documented "
    "boundary in operators/cep.py.",
)
def q_cep_pattern_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match

    ev = load_table(spark, sf_dir, "events")
    return pattern_match(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["view", "click", "purchase"],
        within_seconds=86400,
    )


@register(
    "cep_quantified_match",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), isl AS (
  SELECT *, rn - row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY rn) AS grp
  FROM ordered
), runs AS (
  SELECT user_id, grp, max(rn) AS ern,
         arg_min(event_id, rn) AS start_event_id,
         strftime(date_trunc('second', min(ts)),
                  '%Y-%m-%d %H:%M:%S') AS start_ts,
         count(*) AS n_clicks
  FROM isl WHERE event_type = 'click'
  GROUP BY user_id, grp
)
SELECT r.user_id, r.start_event_id, r.start_ts,
       strftime(date_trunc('second', o.ts), '%Y-%m-%d %H:%M:%S') AS end_ts,
       r.n_clicks + 1 AS n_rows
FROM runs r JOIN ordered o
  ON o.user_id = r.user_id AND o.rn = r.ern + 1
     AND o.event_type = 'purchase'
""",
    doc="MATCH_RECOGNIZE with a GREEDY quantifier: PATTERN (click+ "
    "purchase), AFTER MATCH SKIP PAST LAST ROW, ONE ROW PER MATCH — "
    "a maximal run of consecutive clicks ending in a purchase, with "
    "the run length surfaced (operators/cep.py "
    "pattern_match_quantified: one key shuffle + Arrow-batched "
    "greedy backtracking scan per key, run-length bounded, never "
    "regex-exponential; streaming flavor in streaming/stateful.py). "
    "The oracle replays greedy+skip-past semantics relationally: "
    "gaps-and-islands maximal click runs joined to the immediately "
    "following row being a purchase.",
)
def q_cep_quantified_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events")
    return pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["click+", "purchase"],
    )


@register(
    "cep_measures_match",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events
), isl AS (
  SELECT *, rn - row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY rn) AS grp
  FROM ordered
), runs AS (
  SELECT user_id, grp, max(rn) AS ern,
         arg_min(event_id, rn) AS start_event_id,
         count(*) AS n_clicks,
         ROUND(SUM(value), 2) AS click_value_sum,
         arg_max(event_id, rn) AS last_click_id
  FROM isl WHERE event_type = 'click'
  GROUP BY user_id, grp
)
SELECT r.user_id, r.start_event_id, r.n_clicks, r.click_value_sum,
       r.last_click_id, ROUND(o.value, 2) AS purchase_value
FROM runs r JOIN ordered o
  ON o.user_id = r.user_id AND o.rn = r.ern + 1
     AND o.event_type = 'purchase'
""",
    doc="MATCH_RECOGNIZE MEASURES surface, value-oracled: PATTERN "
    "(click+ purchase) with SUM/COUNT over the greedy click run, "
    "LAST over its ids, and the purchase row's value — the oracle "
    "replays each measure relationally over gaps-and-islands maximal "
    "runs (arg_min/arg_max/SUM per island). Measures are pandas "
    "slice aggregations inside the same Arrow batch pass as the "
    "match scan; no extra shuffle.",
)
def q_cep_measures_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events")
    out = pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["click+", "purchase"],
        measures=[
            ("click_value_sum", "sum", [0], "value"),
            ("n_clicks", "count", [0], None),
            ("last_click_id", "last", [0], "event_id"),
            ("purchase_value", "last", [1], "value"),
        ],
    )
    return out.select(
        "user_id",
        "start_event_id",
        "n_clicks",
        F.round("click_value_sum", 2).alias("click_value_sum"),
        "last_click_id",
        F.round("purchase_value", 2).alias("purchase_value"),
    )


@register(
    "cep_skip_to_chain",
    """
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         row_number() OVER w AS rn,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(ts, 2) OVER w AS ets,
         lead(value, 1) OVER w AS v1,
         lead(value, 2) OVER w AS v2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), m AS (
  SELECT user_id, event_id AS start_event_id, ts, ets,
         ROUND(value + v1 + v2, 2) AS total_value,
         row_number() OVER (PARTITION BY user_id ORDER BY rn) AS mn
  FROM o
  WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'view'
)
SELECT user_id, start_event_id,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(date_trunc('second', ets), '%Y-%m-%d %H:%M:%S') AS end_ts,
       3::BIGINT AS n_rows, mn, total_value
FROM m
""",
    doc="MATCH_RECOGNIZE AFTER MATCH SKIP TO LAST V2: PATTERN "
    "(V1 C V2) with the scan resuming AT each match's final view row "
    "— chained view-click-view triples SHARE their boundary view, so "
    "every consecutive (view, click, view) triple is a match "
    "(SKIP PAST LAST ROW would drop every other link of a chain). "
    "MEASURES carry MATCH_NUMBER() (per-key scan index) and the "
    "whole-match (unqualified) SUM(value). The oracle replays the "
    "triple enumeration with two leads and numbers matches in rn "
    "order; the engine path is the same one-key-shuffle Arrow scan "
    "as every quantified CEP query (operators/cep.py scan_matches "
    "skip_to).",
)
def q_cep_skip_to_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events")
    out = pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["view", "click", "view"],
        after_match=("to_last", [2]),
        measures=[
            ("mn", "match_number", [], None),
            ("total_value", "sum", [0, 1, 2], "value"),
        ],
    )
    return out.select(
        "user_id",
        "start_event_id",
        "start_ts",
        "end_ts",
        "n_rows",
        "mn",
        F.round("total_value", 2).alias("total_value"),
    )


@register(
    "cep_reluctant_pairs",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER w AS rn,
         lead(ts, 1) OVER w AS ets
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), isl AS (
  SELECT *, rn - row_number() OVER (
             PARTITION BY user_id, event_type ORDER BY rn) AS grp
  FROM ordered
), runs AS (
  SELECT user_id, grp, min(rn) AS srn, max(rn) AS ern
  FROM isl WHERE event_type = 'click'
  GROUP BY user_id, grp
)
SELECT i.user_id, i.event_id AS start_event_id,
       strftime(date_trunc('second', i.ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(date_trunc('second', i.ets), '%Y-%m-%d %H:%M:%S') AS end_ts,
       2::BIGINT AS n_rows
FROM isl i JOIN runs r ON i.user_id = r.user_id AND i.grp = r.grp
WHERE i.event_type = 'click'
  AND (i.rn - r.srn) % 2 = 0 AND i.rn + 1 <= r.ern
""",
    doc="RELUCTANT quantifier semantics, value-oracled: PATTERN "
    "(C+? C) with AFTER MATCH SKIP PAST LAST ROW chops each maximal "
    "consecutive click run into non-overlapping PAIRS (reluctant C+? "
    "takes exactly one click before the closing C), where the greedy "
    "spelling would consume the whole run as one match — the two "
    "quantifier modes differ exactly when adjacent pattern tokens "
    "share a type. Oracle: gaps-and-islands click runs emit rows at "
    "even offsets with a successor inside the run (floor(len/2) "
    "pairs per run).",
)
def q_cep_reluctant_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events")
    return pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["click+?", "click"],
    )


@register(
    "cep_define_predicate",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         row_number() OVER w AS rn,
         lag(value) OVER w AS pv
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), dirs AS (
  SELECT *, CASE WHEN pv IS NULL THEN 'F'
                 WHEN value < pv THEN 'D'
                 WHEN value > pv THEN 'U' ELSE 'F' END AS d
  FROM ordered
), isl AS (
  SELECT *, rn - row_number() OVER (
             PARTITION BY user_id, d ORDER BY rn) AS grp
  FROM dirs
), druns AS (
  SELECT user_id, min(rn) AS ds, max(rn) AS de,
         CAST(count(*) AS BIGINT) AS nd,
         arg_min(event_id, rn) AS start_event_id,
         strftime(date_trunc('second', min(ts)),
                  '%Y-%m-%d %H:%M:%S') AS start_ts,
         arg_max(value, rn) AS bottom_value
  FROM isl WHERE d = 'D' GROUP BY user_id, grp
), uruns AS (
  SELECT user_id, min(rn) AS us, CAST(count(*) AS BIGINT) AS nu,
         strftime(date_trunc('second', max(ts)),
                  '%Y-%m-%d %H:%M:%S') AS end_ts
  FROM isl WHERE d = 'U' GROUP BY user_id, grp
)
SELECT d.user_id, d.start_event_id, d.start_ts, u.end_ts,
       CAST(d.nd + u.nu AS BIGINT) AS n_rows,
       d.bottom_value, d.nd AS n_down
FROM druns d JOIN uruns u
  ON u.user_id = d.user_id AND u.us = d.de + 1
""",
    doc="MATCH_RECOGNIZE with DEFINE predicates (Flink 1.15's "
    "canonical V-shape): PATTERN (DOWN+ UP+) where DOWN AS value < "
    "PREV(value) and UP AS value > PREV(value) over each user's "
    "timeline, AFTER MATCH SKIP PAST LAST ROW, surfacing the valley "
    "bottom (LAST(DOWN.value)) and descent length. The predicates "
    "are row-local, so operators/cep.py compiles them to ONE "
    "vectorized boolean mask per key group (pandas shift + "
    "comparison — numpy inner loop) feeding the same one-shuffle "
    "applyInPandas scan as the literal matcher. Oracle: classify "
    "each row's direction vs lag(value), gaps-and-islands the "
    "maximal D/U runs, and join D-runs to the U-run starting "
    "immediately after — exactly the greedy skip-past match set "
    "(equal neighbors break both runs; backtracking cannot produce "
    "alternate matches because a D-classified row always fails the "
    "UP predicate).",
)
def q_cep_define_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_define

    ev = load_table(spark, sf_dir, "events")
    return pattern_match_define(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP+"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        measures=[
            ("bottom_value", "last", [0], "value"),
            ("n_down", "count", [0], None),
        ],
    )


@register(
    "cep_alternation_match",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events
), isl AS (
  SELECT *, rn - row_number() OVER (
             PARTITION BY user_id ORDER BY rn) AS grp
  FROM ordered WHERE event_type IN ('click', 'error')
), cruns AS (
  SELECT user_id, grp, min(rn) AS s, max(rn) AS e,
         CAST(count(*) AS BIGINT) AS n_mid
  FROM isl GROUP BY user_id, grp
)
SELECT o1.user_id, o1.event_id AS start_event_id,
       strftime(date_trunc('second', o1.ts),
                '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(date_trunc('second', o2.ts),
                '%Y-%m-%d %H:%M:%S') AS end_ts,
       CAST(c.n_mid + 2 AS BIGINT) AS n_rows,
       c.n_mid
FROM cruns c
JOIN ordered o1 ON o1.user_id = c.user_id AND o1.rn = c.s - 1
               AND o1.event_type = 'view'
JOIN ordered o2 ON o2.user_id = c.user_id AND o2.rn = c.e + 1
               AND o2.event_type = 'purchase'
""",
    doc="SQL:2016 pattern ALTERNATION (a form Flink's own "
    "MATCH_RECOGNIZE rejects): PATTERN (view (click|error)+ "
    "purchase), AFTER MATCH SKIP PAST LAST ROW — a view, then a "
    "maximal run of clicks-or-errors in any mix, closed by a "
    "purchase. The alternation compiles to a frozenset row test in "
    "the same backtracking scan (operators/cep.py parse_pattern). "
    "Oracle: gaps-and-islands over class membership (type IN "
    "(click,error)), then require the row before the run to be a "
    "view and the row after it a purchase; greedy+skip-past can "
    "produce no other match set because class runs are maximal and "
    "the closing literal is outside the class.",
)
def q_cep_alternation_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events")
    return pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["view", "(click|error)+", "purchase"],
        measures=[("n_mid", "count", [1], None)],
    )


@register(
    "cep_permute_match",
    """
WITH o AS (
  SELECT user_id, event_id, ts, event_type, value,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2,
         lead(event_type, 3) OVER w AS t3,
         lead(value, 1) OVER w AS v1,
         lead(value, 2) OVER w AS v2,
         lead(ts, 3) OVER w AS ets
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT user_id, event_id AS start_event_id,
       strftime(date_trunc('second', ts),
                '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(date_trunc('second', ets),
                '%Y-%m-%d %H:%M:%S') AS end_ts,
       CAST(4 AS BIGINT) AS n_rows,
       CASE WHEN t1 = 'view' THEN v1 ELSE v2 END AS view_value,
       CASE WHEN t1 = 'click' THEN v1 ELSE v2 END AS click_value
FROM o
WHERE event_type = 'signup' AND t3 = 'purchase'
  AND ((t1 = 'view' AND t2 = 'click')
       OR (t1 = 'click' AND t2 = 'view'))
""",
    doc="SQL:2016 PERMUTE pattern (also absent from Flink): PATTERN "
    "(signup PERMUTE(view, click) purchase) — signup, then view and "
    "click in EITHER order on consecutive rows, then purchase. Each "
    "PERMUTE member expands to one token tested as set-membership "
    "minus already-claimed types, and after a match the member "
    "tokens are remapped to the row bearing their declared type, so "
    "the view_value/click_value MEASURES bind by name regardless of "
    "arrival order (operators/cep.py _remap_perm). Matches are 4 "
    "fixed rows with no interior signup, so overlapping starts are "
    "impossible and the lead()-enumeration oracle equals the "
    "skip-past-last-row match set.",
)
def q_cep_permute_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events")
    return pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["signup", "permute(view,click)", "purchase"],
        measures=[
            ("view_value", "first", [1], "value"),
            ("click_value", "first", [2], "value"),
        ],
    )


@register(
    "cep_all_rows_match",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type, value, props,
         row_number() OVER w AS rn,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), starts AS (
  SELECT user_id, rn AS srn,
         row_number() OVER (PARTITION BY user_id ORDER BY rn)
           AS match_no
  FROM ordered
  WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
)
SELECT o.user_id, o.event_id,
       strftime(date_trunc('second', o.ts),
                '%Y-%m-%d %H:%M:%S') AS ts_s,
       o.event_type, o.value, o.props,
       CAST(s.match_no AS BIGINT) AS match_no,
       o.event_type AS classifier
FROM starts s JOIN ordered o
  ON o.user_id = s.user_id AND o.rn BETWEEN s.srn AND s.srn + 2
""",
    doc="SQL:2016 ALL ROWS PER MATCH (Flink supports ONE ROW only): "
    "PATTERN (view click purchase) per user emits every CONSUMED row "
    "with its original columns plus MATCH_NUMBER() and CLASSIFIER() "
    "— the per-row spelling funnels/debuggers need. Distinct literal "
    "types make overlap impossible, so the lead()-enumeration oracle "
    "(3 rows per start, match_no = per-user start order) equals the "
    "skip-past match set; classifier equals the matched type for "
    "literal tokens by construction, pinning the token-name plumbing.",
)
def q_cep_all_rows_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events")
    out = pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["view", "click", "purchase"],
        rows_per_match="all",
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
        "value",
        "props",
        "match_no",
        "classifier",
    )


# --- round 8: aggregates in DEFINE, SUBSET unions, RUNNING MEASURES -------
#
# Exactness contract shared by the three queries below: event values
# are 2-decimal doubles, so any aggregate COMPARISON on raw doubles
# could flip on summation order between engines. Each query therefore
# quantizes to integer cents (CAST(round(value*100) AS BIGINT)) and
# phrases every aggregate decision in integers (cents * n > sum is
# exact; avg emitted as exact-int division) — the same portable-math
# discipline as the embedding near-dup family.


@register(
    "cep_define_agg",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER w AS rn,
         lag(CAST(round(value * 100) AS BIGINT)) OVER w AS pc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), isl AS (
  SELECT *, rn - row_number() OVER (PARTITION BY user_id ORDER BY rn)
            AS grp
  FROM ordered WHERE pc IS NOT NULL AND cents < pc
), runs AS (
  SELECT user_id, grp, rn, event_id, ts, cents,
         max(rn) OVER (PARTITION BY user_id, grp) AS de,
         CAST(sum(cents) OVER (PARTITION BY user_id, grp
                               ORDER BY rn DESC) AS BIGINT) AS sfx_sum,
         CAST(count(*) OVER (PARTITION BY user_id, grp
                             ORDER BY rn DESC) AS BIGINT) AS sfx_n
  FROM isl
), cand AS (
  -- the row after the run, joined per suffix start; the DEFINE
  -- decision cents_r * n > sum is integer-exact in both engines
  SELECT r.*, o.ts AS rts
  FROM runs r JOIN ordered o
    ON o.user_id = r.user_id AND o.rn = r.de + 1
  WHERE o.cents * r.sfx_n > r.sfx_sum
), best AS (
  SELECT *, row_number() OVER (PARTITION BY user_id, de ORDER BY rn) AS k
  FROM cand
)
SELECT user_id, event_id AS start_event_id,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS start_ts,
       strftime(date_trunc('second', rts), '%Y-%m-%d %H:%M:%S') AS end_ts,
       CAST(de - rn + 2 AS BIGINT) AS n_rows,
       CAST(sfx_sum AS DOUBLE) / sfx_n AS down_avg_cents,
       CAST(de - rn + 1 AS BIGINT) AS n_down
FROM best WHERE k = 1
""",
    doc="Aggregates in DEFINE (Flink 1.15 surface, new r8): PATTERN "
    "(DOWN+ UP) where UP AS cents * COUNT(DOWN.cents) > "
    "SUM(DOWN.cents) — the rebound row must beat the MEAN of the "
    "descent it follows, phrased in integer cents so the decision is "
    "exact in both engines. Greedy backtracking cannot shorten DOWN "
    "from a fixed start (a shorter take's UP candidate is a descent "
    "row, below every prefix mean), and the suffix mean falls as the "
    "start advances, so the scan's first match is the EARLIEST "
    "descent suffix whose mean the rebound beats — which is what the "
    "oracle computes via reverse-cumulative window sums over "
    "gaps-and-islands descent runs. Run-skip is disabled for ctx "
    "patterns (a later start sees a different bound span — the r8 "
    "soundness fix this query exercises).",
)
def q_cep_define_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_define

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    return pattern_match_define(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP"],
        define={
            "DOWN": "cents < PREV(cents)",
            "UP": "cents * COUNT(DOWN.cents) > SUM(DOWN.cents)",
        },
        measures=[
            ("down_avg_cents", "avg", [0], "cents"),
            ("n_down", "count", [0], None),
        ],
    )


@register(
    "cep_subset_union",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, value,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER w AS rn,
         lag(CAST(round(value * 100) AS BIGINT)) OVER w AS pc
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), dirs AS (
  SELECT *, CASE WHEN pc IS NULL THEN 'F'
                 WHEN cents < pc THEN 'D'
                 WHEN cents > pc THEN 'U' ELSE 'F' END AS d
  FROM ordered
), isl AS (
  SELECT *, rn - row_number() OVER (
             PARTITION BY user_id, d ORDER BY rn) AS grp
  FROM dirs
), druns AS (
  SELECT user_id, min(rn) AS ds, max(rn) AS de,
         arg_min(event_id, rn) AS start_event_id,
         strftime(date_trunc('second', min(ts)),
                  '%Y-%m-%d %H:%M:%S') AS start_ts,
         arg_min(cents, rn) AS fc,
         arg_min(value, rn) AS v_first,
         arg_max(value, rn) AS v_min
  FROM isl WHERE d = 'D' GROUP BY user_id, grp
), uruns AS (
  SELECT user_id, min(rn) AS us, max(rn) AS ue
  FROM isl WHERE d = 'U' GROUP BY user_id, grp
), matched AS (
  -- UP run = the ascent prefix where every row stays under 2.5x the
  -- descent start (the SUBSET bound FIRST(V.cents)); the first
  -- violator truncates it
  SELECT d.user_id, d.start_event_id, d.start_ts, d.ds, d.de,
         d.v_first, d.v_min,
         coalesce(
           (SELECT min(o.rn) - 1 FROM isl o
            WHERE o.user_id = d.user_id AND o.d = 'U'
              AND o.rn BETWEEN u.us AND u.ue
              AND o.cents * 10 >= d.fc * 25),
           u.ue) AS te
  FROM druns d JOIN uruns u
    ON u.user_id = d.user_id AND u.us = d.de + 1
)
SELECT m.user_id, m.start_event_id, m.start_ts,
       strftime(date_trunc('second', o.ts),
                '%Y-%m-%d %H:%M:%S') AS end_ts,
       CAST(m.te - m.ds + 1 AS BIGINT) AS n_rows,
       m.v_first, m.v_min
FROM matched m JOIN ordered o
  ON o.user_id = m.user_id AND o.rn = m.te
WHERE m.te > m.de
""",
    doc="SQL:2016 SUBSET union variables (Flink rejects the clause, "
    "new r8): PATTERN (DOWN+ UP+) with SUBSET V = (DOWN, UP); UP's "
    "DEFINE bounds the recovery at 2.5x the descent start via "
    "FIRST(V.cents) (the union's first row = the first DOWN row — "
    "resolved against the members' merged rows-so-far), and MEASURES "
    "FIRST/MIN over V aggregate across both variables' rows. The "
    "bound is integer-exact (cents*10 < fc*25). Oracle: V-shape "
    "gaps-and-islands, with each ascent run truncated at its first "
    "bound violator; a match needs >=1 surviving UP row.",
)
def q_cep_subset_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_define

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    return pattern_match_define(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP+"],
        define={
            "DOWN": "cents < PREV(cents)",
            "UP": "cents > PREV(cents) AND cents * 10 < FIRST(V.cents) * 25",
        },
        subset={"V": ["DOWN", "UP"]},
        measures=[
            ("v_first", "first", [0, 1], "value"),
            ("v_min", "min", [0, 1], "value"),
        ],
    )


@register(
    "cep_running_measures",
    """
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(round(value * 100) AS BIGINT) AS cents,
         row_number() OVER w AS rn,
         lead(event_type, 1) OVER w AS t1,
         lead(event_type, 2) OVER w AS t2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), starts AS (
  SELECT user_id, rn AS srn,
         row_number() OVER (PARTITION BY user_id ORDER BY rn) AS match_no
  FROM ordered
  WHERE event_type = 'view' AND t1 = 'click' AND t2 = 'purchase'
), joined AS (
  SELECT o.user_id, o.event_id, o.ts, o.event_type, o.cents, o.rn,
         s.srn, CAST(s.match_no AS BIGINT) AS match_no
  FROM starts s JOIN ordered o
    ON o.user_id = s.user_id AND o.rn BETWEEN s.srn AND s.srn + 2
)
SELECT user_id, event_id,
       strftime(date_trunc('second', ts), '%Y-%m-%d %H:%M:%S') AS ts_s,
       event_type, cents, match_no,
       event_type AS classifier,
       CAST(rn - srn + 1 AS BIGINT) AS rows_so_far,
       CAST(sum(cents) OVER (PARTITION BY user_id, srn
                             ORDER BY rn) AS BIGINT) AS cum_cents,
       CAST(sum(cents) OVER (PARTITION BY user_id, srn)
            AS BIGINT) AS match_cents
FROM joined
""",
    doc="ALL ROWS PER MATCH with RUNNING and FINAL MEASURES (SQL:2016 "
    "semantics the r7 matcher refused, new r8): PATTERN (view click "
    "purchase) emits every consumed row with RUNNING COUNT(*) / "
    "RUNNING SUM(cents) (the aggregate over the match's rows up to "
    "and including the emitted row) and FINAL SUM(cents) (the "
    "whole-match value on every row). Distinct literal types make "
    "overlap impossible, so the lead()-enumeration oracle with "
    "within-match cumulative window sums equals the skip-past match "
    "set; sums are integer cents, exact in both engines.",
)
def q_cep_running_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.cep import pattern_match_quantified

    ev = load_table(spark, sf_dir, "events").withColumn(
        "cents", F.round(F.col("value") * 100).cast("long")
    )
    out = pattern_match_quantified(
        ev,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        type_col="event_type",
        pattern=["view", "click", "purchase"],
        rows_per_match="all",
        measures=[
            ("rows_so_far", "count", [0, 1, 2], None, "running"),
            ("cum_cents", "sum", [0, 1, 2], "cents", "running"),
            ("match_cents", "sum", [0, 1, 2], "cents", "final"),
        ],
    )
    return out.select(
        "user_id",
        "event_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts_s"),
        "event_type",
        "cents",
        "match_no",
        "classifier",
        "rows_so_far",
        "cum_cents",
        "match_cents",
    )
