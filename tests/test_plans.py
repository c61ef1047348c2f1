"""Physical-plan regression tests: the optimizations the engine
relies on at 100 TB must be visible in .explain output — predicate
pushdown into parquet scans, column pruning, broadcast joins for
dims, partial aggregation, and windowed top-k group limits. A change
that silently loses one of these passes correctness tests but
regresses at scale; these tests pin the plan shape.
"""

from __future__ import annotations

from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES

from .conftest import SF_ORACLE


def _plan(spark, name: str) -> str:
    import contextlib
    import io

    df = QUERIES[name].fn(spark, SF_ORACLE)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _tree(plan: str) -> str:
    # formatted explain = operator tree, then per-operator details;
    # count operators in the tree only (details repeat every name)
    return plan.split("\n\n(")[0]


def test_keyed_filter_pushes_predicate(spark):
    plan = _plan(spark, "keyed_filter")
    assert "PushedFilters: [IsNotNull(c_custkey), EqualTo(c_custkey,42)]" in plan
    # column pruning: only the 3 projected columns are read
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_acctbal:double>" in plan


def test_flagship_joins_broadcast_and_prune(spark):
    plan = _plan(spark, "ticket_view")
    assert _tree(plan).count("BroadcastHashJoin") == 2  # both joins shuffle-free
    assert "SortMergeJoin" not in plan
    # LWW dedup is a max(struct) aggregation: partial (map-side) tier
    # below the exchange, final above — each mapper ships one row per key
    assert "partial_max" in plan
    # r13 shape: exactly 2 hash shuffles — the per-ticket pre-reduction
    # (keyed on the LONG l_orderkey, ≤1 row per ticket per mapper) and
    # the per-name LWW over the already-reduced rows
    assert _tree(plan).count("- Exchange (") == 2
    # lineitem scan reads only the 3 needed columns of 11
    assert (
        "ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_shipdate:timestamp_ntz>"
        in plan
    )


def test_group_agg_partial_aggregation(spark):
    plan = _plan(spark, "group_agg")
    # map-side partial agg before the exchange (two HashAggregate tiers)
    assert _tree(plan).count("HashAggregate") == 2
    assert _tree(plan).count("- Exchange (") == 1


def test_orderby_limit_is_topk_not_full_sort(spark):
    plan = _plan(spark, "orderby_limit")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan  # no global sort


def test_window_rank_group_limit(spark):
    plan = _plan(spark, "window_rank")
    assert "WindowGroupLimit" in plan


def test_embedding_topk_broadcasts_query_vector(spark):
    plan = _plan(spark, "embedding_topk")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "TakeOrderedAndProject" in plan


def test_ivf_centroid_sample_is_topk_not_global_window(spark):
    # centroid selection must be per-partition top-k (TakeOrderedAndProject),
    # never a single-partition global sort/window over the whole corpus
    plan = _plan(spark, "ivf_ann_topk")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in _tree(plan)
    assert "Window" not in _tree(plan)


def test_minhash_no_cartesian_product(spark):
    plan = _plan(spark, "minhash_pairs")
    # candidates come from the band equi-join, never a cross product
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cube_agg_partial_before_exchange(spark):
    plan = _plan(spark, "cube_agg")
    tree = _tree(plan)
    assert "Expand" in tree  # grouping sets expanded map-side
    assert tree.count("HashAggregate") == 2  # partial + final
    assert tree.count("- Exchange (") == 1


def test_topk_ngrams_is_topk_not_full_sort(spark):
    plan = _plan(spark, "topk_ngrams")
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan
    assert _tree(plan).count("HashAggregate") == 2  # map-side combine


def test_cobucketed_join_has_no_exchange(spark, tmp_path):
    """Two tables bucketed on the join key merge-join bucket-locally:
    the plan must contain NO Exchange on either side — the write-time
    shuffle is amortized over every later join (the 100 TB pattern for
    repeated fact⋈fact joins)."""
    import contextlib
    import io

    from pyspark.sql.functions import col as F_col

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.bucketed import (
        cobucketed_join,
        write_bucketed_table,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
    )

    orders = load_table(spark, SF_ORACLE, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    li = load_table(spark, SF_ORACLE, "lineitem").select(
        F_col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    write_bucketed_table(orders, "b_orders", "o_orderkey", num_buckets=8)
    write_bucketed_table(li, "b_lineitem", "o_orderkey", num_buckets=8)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = cobucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        tree = buf.getvalue().split("\n\n(")[0]
        assert "SortMergeJoin" in tree
        assert "- Exchange (" not in tree, f"shuffle in co-bucketed join:\n{tree}"
        assert joined.count() == load_table(spark, SF_ORACLE, "lineitem").count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_attribution_range_join_is_equi_keyed(spark):
    # the time-range predicate must ride on the user_id equi join —
    # never a cartesian/nested-loop over all (purchase, click) pairs
    plan = _plan(spark, "purchase_click_attribution")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sequence_packing_window_is_stratum_parallel(spark):
    # packing partitions by lang: the window must hash-distribute by
    # the stratum, never collapse to a single-partition global sort
    plan = _plan(spark, "sequence_packing")
    tree = _tree(plan)
    assert "Exchange SinglePartition" not in tree
    assert "hashpartitioning(lang" in plan


def test_stratified_sample_is_scan_level_filter(spark):
    # the keep-predicate is a map-only filter on the scan: no shuffle,
    # no join, no aggregation anywhere in the plan
    plan = _plan(spark, "stratified_sample")
    tree = _tree(plan)
    assert "- Exchange (" not in tree
    assert "Join" not in tree
    assert "Aggregate" not in tree


def test_source_cap_has_map_side_group_limit(spark):
    """source_cap's rank<=cap must compile to WindowGroupLimit BELOW
    the exchange (each map task keeps <=cap rows per source before
    shuffling — the property that bounds heavy-hitter domains) and
    never a single-partition global window."""
    plan = _plan(spark, "source_cap")
    tree = _tree(plan)
    assert "Exchange SinglePartition" not in plan
    # two WindowGroupLimit nodes: partial (map-side) + final
    assert tree.count("WindowGroupLimit") == 2
    first_wgl = tree.index("WindowGroupLimit")
    last_wgl = tree.rindex("WindowGroupLimit")
    exch = tree.index("Exchange")
    assert first_wgl > exch > last_wgl or last_wgl > exch > first_wgl


# --- analytics pack (plans/analytics.py) ---------------------------------


def test_pricing_summary_partial_agg_and_pushdown(spark):
    """Q1 shape: the shipdate filter must reach the parquet scan and
    the 8 aggregates must partial-aggregate map-side (one tiny
    shuffle of grouped rows, never raw lineitem)."""
    plan = _plan(spark, "pricing_summary")
    tree = _tree(plan)
    assert tree.count("HashAggregate") == 2
    assert tree.count("- Exchange (") == 1
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan


def test_order_priority_exists_is_preaggregated_join(spark):
    """Q4 shape: EXISTS(l_shipdate > o_orderdate) is computed as
    MAX(l_shipdate) per order BEFORE the join (the build side is the
    reduced per-order aggregate, never the raw fact), with the
    quarter filter pushed into orders and no cartesian probe."""
    plan = _plan(spark, "order_priority")
    tree = _tree(plan)
    # the fact side pre-aggregates: partial+final tiers over lineitem
    assert "HashAggregate" in tree
    assert "partial_max" in plan
    assert "CartesianProduct" not in plan
    assert "GreaterThanOrEqual(o_orderdate" in plan  # pushed quarter bound


def test_returned_items_topk_and_broadcast(spark):
    """Q10 shape: final top-20 is TakeOrderedAndProject (no global
    sort) and every join is broadcast at this dim/filter selectivity."""
    plan = _plan(spark, "returned_items")
    tree = _tree(plan)
    assert "TakeOrderedAndProject" in tree
    assert "Exchange rangepartitioning" not in plan
    assert "SortMergeJoin" not in tree


def test_market_share_single_agg_no_second_shuffle(spark):
    """Q8 shape: the share ratio folds numerator+denominator into ONE
    grouped aggregation — exactly one exchange above the join tree,
    all dims broadcast."""
    plan = _plan(spark, "market_share")
    tree = _tree(plan)
    assert tree.count("- Exchange (") == 1
    assert "SortMergeJoin" not in tree
    assert tree.count("BroadcastHashJoin") >= 6


def test_top_supplier_scalar_max_is_broadcast_not_window(spark):
    """Q15 shape: the global max joins back via broadcast — never a
    single-partition global window over the per-supplier rollup."""
    plan = _plan(spark, "top_supplier")
    tree = _tree(plan)
    assert "Window" not in tree
    assert "BroadcastHashJoin" in tree


def test_dormant_customers_anti_join_and_scalar_broadcast(spark):
    """Q22 shape: NOT EXISTS compiles to a left-anti join with the
    date filter pushed into the orders scan; the average balance is a
    broadcast one-row aggregate, not a window."""
    plan = _plan(spark, "dormant_customers")
    tree = _tree(plan)
    assert "LeftAnti" in tree
    assert "Window" not in tree
    assert "GreaterThanOrEqual(o_orderdate" in plan


def test_time_partitioned_read_prunes_directories(spark, tmp_path):
    """write_time_partitioned + read_time_partitioned: a one-day probe
    must carry the dt bound in the scan's PartitionFilters (directory
    pruning — at 100 TB the listing is one dir, not the table) AND
    return exactly the rows a plain ts filter would."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.parquet import (
        load_table,
        read_time_partitioned,
        write_time_partitioned,
    )

    ev = load_table(spark, SF_ORACLE, "events")
    path = str(tmp_path / "events_by_day")
    write_time_partitioned(ev, path, "ts", granularity="day")

    out = read_time_partitioned(
        spark, path, "ts", start="2024-01-05 00:00:00", end="2024-01-06 00:00:00"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the dt bounds must appear in the partition filters, not (only)
    # as a post-scan row filter
    pf = plan[plan.index("PartitionFilters"):]
    pf = pf[: pf.index("]") + 1]
    assert "dt" in pf, pf

    from pyspark.sql import functions as F

    want = ev.filter(
        (F.col("ts") >= F.lit("2024-01-05 00:00:00").cast("timestamp"))
        & (F.col("ts") < F.lit("2024-01-06 00:00:00").cast("timestamp"))
    ).count()
    assert out.count() == want and want > 0


def test_no_query_broadcasts_raw_fact_scan(spark):
    """Sweep the whole registry: no BroadcastExchange may hash-build
    an UNREDUCED lineitem scan — the fact table must always be the
    streamed probe side of its joins (smaller sides building under it
    is the intended orientation; AQE swaps those to sort-merge at
    scale). Mirrors the FACT-BROADCAST flag in scripts/gen_plans.py."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
        ),
    )
    from gen_plans import _broadcasts_raw_fact

    # r14 (guide §2.6): 183 independent plan builds are driver/py4j
    # round-trips; a small thread pool overlaps them (same pattern as
    # the oracle smoke test — the three fixed-name temp-view queries
    # stay serial). Assertions unchanged.
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    uses_temp_views = {
        "session_window_tvf", "cumulate_window_tvf", "grouping_sets_agg",
    }

    def sweep(item):
        name, spec = item
        try:
            df = spec.fn(spark, SF_ORACLE)
            exec_plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception:
            return name, False
        return name, _broadcasts_raw_fact(exec_plan)

    results = []
    pooled = [i for i in QUERIES.items() if i[0] not in uses_temp_views]
    with ThreadPoolExecutor(max_workers=4) as pool:
        results += list(pool.map(inheritable_thread_target(sweep), pooled))
    results += [
        sweep((n, QUERIES[n]))
        for n in uses_temp_views
        if n in QUERIES
    ]
    offenders = sorted(n for n, bad in results if bad)
    assert offenders == []


def test_r8_cep_queries_single_exchange(spark):
    """The round-8 MATCH_RECOGNIZE queries pay exactly ONE exchange
    (the pinned-width key shuffle into mapInPandas) and prune their
    scans to the referenced columns — the same contract as the r7
    matcher queries, and the shape Flink's keyed MATCH_RECOGNIZE
    pays."""
    for name in ("cep_define_agg", "cep_subset_union",
                 "cep_running_measures"):
        tree = _tree(_plan(spark, name))
        assert tree.count("Exchange") == 1, (name, tree)
        assert "CartesianProduct" not in tree, name
