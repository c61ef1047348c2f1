"""The flagship pipeline: 3-way inner equi-join → keyed upsert view.

Reference: CDC-Hudi-Notebook.zpln:2161 (¶49, console flavor) and
:2317 (¶53, INSERT INTO ticket_view):

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

materialized into a Hudi table keyed on full_name (zpln:2234 ¶51) —
i.e. at most one live row per person, latest transaction wins.

Fixture mapping (FIXTURES.md §Mapping): customer ≙ person
(c_custkey=id, c_name=full_name), orders ≙ sporting_event_ticket
(o_orderkey=id, o_custkey=ticketholder_id, o_totalprice=
ticket_price), lineitem ≙ ticket_purchase_hist (l_orderkey=
sporting_event_ticket_id, l_shipdate=transaction_date_time).

Scale notes: both joins are plain equi-joins, left to Catalyst/AQE —
at bench scale the dims go broadcast; at 100 TB AQE picks sort-merge
with skew splitting. The LWW dedup adds exactly one hash shuffle on
the view key. Column pruning: we select only the 4 projected columns
plus the precedence columns, so the parquet scans read a fraction of
each table (check with .explain: ReadSchema).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .upsert import latest_by_key

# precedence (latest-wins) for the view: newest transaction, with a
# unique (orderkey, linenumber) tiebreak so the winner is total.
# Sorted on the RAW timestamp (8 bytes), not its string cast —
# identical order (ISO strings sort chronologically) at a fraction of
# the cost.
_PRECEDENCE = ["_tx_ts", "_order_id", "_line_no"]


def flagship_join(
    person: DataFrame, ticket: DataFrame, hist: DataFrame
) -> DataFrame:
    """The raw 3-way join + projection (¶49/¶53), pre-dedup.

    Inputs are fixture tables (customer/orders/lineitem). Output is
    the RAW (uncast) projection: full_name, ticket_price, plus the
    precedence columns ``_tx_ts``/``_order_id``/``_line_no`` — the
    public string casts (id, transaction_date_time) happen in
    :func:`ticket_view` AFTER dedup, so the per-row string
    materialization runs on one row per key, not every joined row
    (measured −45% on the flagship at sf0.1).
    """
    # FACT-FIRST join order: hist (ticket_purchase_hist ≙ lineitem) is
    # the biggest table and must be the streamed PROBE side of every
    # join, never a broadcast build — written (person⋈ticket)⋈hist the
    # optimizer estimates the joined side as larger than hist's pruned
    # scan and hash-builds the FACT (the wrong shape at 100 TB). Each
    # join pairs the stream with a base table, so size estimates are
    # accurate and AQE still has full freedom (broadcast dims at
    # bench SF, sort-merge + skew split at scale).
    joined = (
        hist.join(ticket, hist["l_orderkey"] == ticket["o_orderkey"], "inner")
        .join(person, person["c_custkey"] == ticket["o_custkey"], "inner")
    )
    return joined.select(
        F.col("c_name").alias("full_name"),
        F.col("o_totalprice").alias("ticket_price"),
        F.col("l_shipdate").alias("_tx_ts"),
        F.col("o_orderkey").alias("_order_id"),
        F.col("l_linenumber").alias("_line_no"),
    )


def ticket_view(person: DataFrame, ticket: DataFrame, hist: DataFrame) -> DataFrame:
    """Flagship view: join + upsert-by-PK materialization (¶53 + ¶51).

    PRIMARY KEY = full_name → at most one row per person; the live
    row is the latest transaction (LWW, SURVEY.md §2.2 R11). The ¶53
    casts (id, transaction_date_time as strings) are applied after
    LWW — one cast per live key instead of per joined row.

    r13 shape — PRE-REDUCE the fact per ticket BEFORE joining
    (guide §2.3 "aggregate before you shuffle"): within one ticket
    (= order) every hist row shares ``_order_id``, so the global LWW
    order (_tx_ts, _order_id, _line_no) restricted to that ticket is
    just (_tx_ts, _line_no) — a per-ticket ``max(struct)`` keeps
    exactly the row that could ever win for its holder, and any
    subset-max is a genuine input row, so the final per-name LWW is
    unchanged (equality verified against the DuckDB oracle and the
    pre-r13 plan, byte-identical rows). The win is twofold: the heavy
    reduction now sorts by a LONG key (l_orderkey) instead of the
    full_name string, and the joins + name-keyed LWW downstream see
    one row per ticket, not one per purchase line (−50% measured at
    sf0.1; at 100 TB the per-ticket partial agg also cuts the first
    shuffle to ≤1 row per ticket per mapper).
    """
    best_line = (
        hist.select("l_orderkey", "l_linenumber", "l_shipdate")
        .groupBy("l_orderkey")
        .agg(
            F.max(
                F.struct(F.col("l_shipdate"), F.col("l_linenumber"))
            ).alias("_m")
        )
    )
    joined = (
        best_line.join(
            ticket,
            best_line["l_orderkey"] == ticket["o_orderkey"],
            "inner",
        ).join(person, person["c_custkey"] == ticket["o_custkey"], "inner")
    )
    raw = joined.select(
        F.col("c_name").alias("full_name"),
        F.col("o_totalprice").alias("ticket_price"),
        F.col("_m.l_shipdate").alias("_tx_ts"),
        F.col("o_orderkey").alias("_order_id"),
        F.col("_m.l_linenumber").alias("_line_no"),
    )
    deduped = latest_by_key(raw, "full_name", _PRECEDENCE)
    return deduped.select(
        "full_name",
        F.col("_order_id").cast("string").alias("id"),
        "ticket_price",
        F.col("_tx_ts").cast("string").alias("transaction_date_time"),
    )


# ---------------------------------------------------------------------------
# event-time temporal join (Flink FOR SYSTEM_TIME AS OF <rowtime>)
# ---------------------------------------------------------------------------


def temporal_join(
    events: DataFrame,
    versions: DataFrame,
    key_cols: Sequence[str],
    event_ts: str,
    version_ts: str,
    value_cols: Sequence[str],
    how: str = "left",
) -> DataFrame:
    """Enrich each event with the dimension VERSION valid at the
    event's own timestamp — Flink SQL's event-time temporal join
    (`JOIN dim FOR SYSTEM_TIME AS OF e.rowtime`), the event-time
    complement of the processing-time `stream_lookup_join`.

    Shape (the scalable one): versions and events are UNIONED as
    tagged rows and sorted once per key by (ts, tag) — versions
    before events at equal ts, so a version effective exactly at the
    event time is visible — then ONE `last(struct, ignorenulls)`
    running window resolves each event's prevailing version. All
    value columns ride in a single struct (with a constant non-null
    `_matched` marker), so a version whose individual value column is
    legitimately NULL is still the version that wins — resolving
    columns independently would let an event mix columns from
    DIFFERENT versions (each column skipping back to its own last
    non-null). ONE key-partitioned window sort total, linear in
    |events| + |versions|; no per-event interval probe, no range
    join, no version-count blowup (contrast the interval self-join
    spelling, which pays |events| x versions-per-key).

    ``how="left"`` keeps events that predate every version (null
    values); ``"inner"`` drops them — decided by the struct marker,
    so an all-NULL matched version still counts as matched.
    """
    from pyspark.sql import types as T

    keys = list(key_cols)
    for c in value_cols:
        if c in events.columns:
            raise ValueError(f"value column {c!r} collides with events")
    vtype = T.StructType(
        [T.StructField("_matched", T.BooleanType(), True)]
        + [
            T.StructField(c, versions.schema[c].dataType, True)
            for c in value_cols
        ]
    )
    ev = events.select(
        "*",
        F.col(event_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast(vtype).alias("_v"),
    )
    vr = versions.select(
        *keys,
        F.col(version_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.lit(True).alias("_matched"),
            *[F.col(c) for c in value_cols],
        )
        .cast(vtype)
        .alias("_v"),
    )
    ev_only = [c for c in ev.columns if c not in vr.columns]
    vr = vr.select(
        *[
            F.lit(None).cast(ev.schema[c].dataType).alias(c)
            for c in ev_only
        ],
        *vr.columns,
    )
    tagged = ev.select(*vr.columns).unionByName(vr)
    w = (
        Window.partitionBy(*keys)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = tagged.withColumn(
        "_v", F.last("_v", ignorenulls=True).over(w)
    )
    out = resolved.filter(F.col("_tag") == 1)
    if how == "inner":
        out = out.filter(F.col("_v._matched"))
    elif how != "left":
        raise ValueError("how must be 'left' or 'inner'")
    return out.select(
        *[c for c in out.columns if c not in ("_ts", "_tag", "_v")],
        *[F.col(f"_v.{c}").alias(c) for c in value_cols],
    )
