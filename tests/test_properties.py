"""Property-based tests (hypothesis): the changelog-normalize and
upsert operators must agree with a naive single-threaded replay for
ARBITRARY event sequences — including duplicate keys in one batch,
out-of-order timestamps, deletes of absent keys, and re-inserts
after delete. This is the §5 test-strategy complement to the fixed
golden scenarios.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import Row
from pyspark.sql import types as T

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.changelog import (
    current_state,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.upsert import (
    latest_by_key,
)
from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.cdc_feed import (
    envelope_schema,
)

ROW = T.StructType(
    [T.StructField("k", T.IntegerType()), T.StructField("v", T.IntegerType())]
)

# event: (op_idx 0=I 1=U 2=D, key 0..4, value, ts_offset_secs)
events_strategy = st.lists(
    st.tuples(
        st.integers(0, 2),
        st.integers(0, 4),
        st.integers(-100, 100),
        st.integers(0, 50),
    ),
    min_size=0,
    max_size=30,
)


def _naive_replay(events):
    """Ground truth: sort by (ts, seq) and replay into a dict."""
    state = {}
    ordered = sorted(
        ((ts, seq, op, k, v) for seq, (op, k, v, ts) in enumerate(events)),
    )
    for ts, seq, op, k, v in ordered:
        if op == 2:
            state.pop(k, None)
        else:
            state[k] = v
    return state


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(events_strategy)
def test_current_state_equals_naive_replay(spark, events):
    ops = "IUD"
    rows = [
        Row(
            op=ops[op],
            ts=dt.datetime(2024, 1, 1) + dt.timedelta(seconds=ts),
            seq=seq,
            before=Row(k=k, v=None) if op == 2 else None,
            after=None if op == 2 else Row(k=k, v=v),
        )
        for seq, (op, k, v, ts) in enumerate(events)
    ]
    if not rows:
        return
    changelog = spark.createDataFrame(rows, envelope_schema(ROW))
    got = {r["k"]: r["v"] for r in current_state(changelog, "k").collect()}
    assert got == _naive_replay(events)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    st.lists(
        st.tuples(st.integers(0, 4), st.integers(-100, 100), st.integers(0, 50)),
        min_size=1,
        max_size=30,
    )
)
def test_latest_by_key_is_argmax(spark, rows):
    # (k, v, ord) -> keep the row with max (ord, idx) per k
    df = spark.createDataFrame(
        [(k, v, o, i) for i, (k, v, o) in enumerate(rows)],
        "k int, v int, o int, idx int",
    )
    got = {
        r["k"]: (r["o"], r["idx"])
        for r in latest_by_key(df, "k", ["o", "idx"]).collect()
    }
    want = {}
    for i, (k, v, o) in enumerate(rows):
        if k not in want or (o, i) > want[k]:
            want[k] = (o, i)
    assert got == want


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(
    st.lists(  # commits: list of batches; each batch: list of (k, v, is_del)
        st.lists(
            st.tuples(
                st.integers(0, 3), st.integers(0, 99), st.booleans()
            ),
            min_size=1,
            max_size=5,
        ),
        min_size=1,
        max_size=4,
    )
)
def test_lake_table_equals_dict_replay(spark, tmp_path_factory, commits):
    """UpsertLakeTable under arbitrary commit sequences (upserts +
    deletes, multiple rows per key per commit resolved by precombine)
    must equal a dict replay. Covers compaction boundaries too
    (compact_every=2)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.streaming.upsert_sink import (
        UpsertLakeTable,
    )

    path = str(tmp_path_factory.mktemp("lake_prop") / "t")
    table = UpsertLakeTable(spark, path, key="k", num_buckets=2, compact_every=2)
    state: dict[int, int] = {}
    for ci, batch in enumerate(commits):
        # precombine order: later index in batch wins
        df = spark.createDataFrame(
            [(k, v, d, i) for i, (k, v, d) in enumerate(batch)],
            "k int, v int, _del boolean, _ord int",
        )
        table.write(
            df, commit_id=f"c{ci}", precombine="_ord", delete_col="_del"
        )
        resolved = {}
        for k, v, d in batch:  # last occurrence of k wins
            resolved[k] = (v, d)
        for k, (v, d) in resolved.items():
            if d:
                state.pop(k, None)
            else:
                state[k] = v
    got = {r["k"]: r["v"] for r in table.snapshot().select("k", "v").collect()}
    assert got == state
