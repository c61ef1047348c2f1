"""MATCH_RECOGNIZE core (operators/cep.py): strict contiguity,
WITHIN bound, and SKIP TO NEXT ROW match enumeration."""

from __future__ import annotations

import datetime as dt

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, dt.datetime(2024, 1, 1, 0, 0, s), t)
            for (i, u, s, t) in rows
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )


def _match(df, pattern, within=None):
    return pattern_match(
        df, "user_id", "ts", "event_id", "event_type", pattern,
        within_seconds=within,
    )


def test_strict_contiguity_broken_by_interleaved_event(spark):
    df = _ev(
        spark,
        [
            (1, 7, 1, "a"),
            (2, 7, 2, "b"),   # a,b adjacent -> match at event 1
            (3, 7, 3, "a"),
            (4, 7, 4, "x"),   # interleaved x breaks a..b here
            (5, 7, 5, "b"),
        ],
    )
    got = [r["start_event_id"] for r in _match(df, ["a", "b"]).collect()]
    assert got == [1]


def test_within_bound_excludes_slow_sequences(spark):
    df = _ev(
        spark,
        [
            (1, 7, 0, "a"),
            (2, 7, 50, "b"),   # 50s gap
            (3, 8, 0, "a"),
            (4, 8, 5, "b"),    # 5s gap
        ],
    )
    got = {r["start_event_id"] for r in _match(df, ["a", "b"], within=10).collect()}
    assert got == {3}
    # without the bound both match
    got = {r["start_event_id"] for r in _match(df, ["a", "b"]).collect()}
    assert got == {1, 3}


def test_skip_to_next_row_enumerates_overlaps(spark):
    # a a b : positions 1 (a,a? no) — pattern (a b) matches only at 2;
    # pattern (a a) overlapping: a a a -> starts at 1 AND 2
    df = _ev(spark, [(1, 7, 1, "a"), (2, 7, 2, "a"), (3, 7, 3, "a")])
    got = sorted(r["start_event_id"] for r in _match(df, ["a", "a"]).collect())
    assert got == [1, 2]


def test_partitioned_by_key_and_tiebreak_same_second(spark):
    # two users interleaved in time; same-ts events ordered by event_id
    df = _ev(
        spark,
        [
            (1, 1, 1, "a"),
            (10, 2, 1, "a"),
            (2, 1, 1, "b"),    # same second as event 1, id orders it after
            (11, 2, 2, "x"),
        ],
    )
    got = {(r["user_id"], r["start_event_id"]) for r in _match(df, ["a", "b"]).collect()}
    assert got == {(1, 1)}


def test_triangle_count_planted_graph(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.graph import (
        triangle_count,
    )

    # K4 on {1,2,3,4} (4 triangles, each node in 3) plus a pendant
    # edge 4-5 (no triangle) and a duplicate/reversed edge noise
    edges = spark.createDataFrame(
        [
            (1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
            (4, 5), (2, 1), (3, 1),   # reversed duplicates collapse
        ],
        "src long, dst long",
    )
    got = {r["node"]: r["triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pattern_match_randomized_vs_bruteforce(spark):
    import random

    rng = random.Random(13)
    rows = []
    eid = 0
    for u in range(6):
        for s in range(40):
            eid += 1
            rows.append((eid, u, s, rng.choice("abc")))
    df = _ev(spark, rows)
    pattern = ["a", "b"]
    got = {
        (r["user_id"], r["start_event_id"])
        for r in _match(df, pattern, within=30).collect()
    }
    # brute force: per-user ordered scan
    want = set()
    by_user: dict[int, list] = {}
    for (i, u, s, t) in rows:
        by_user.setdefault(u, []).append((s, i, t))
    for u, evs in by_user.items():
        evs.sort()
        for j in range(len(evs) - len(pattern) + 1):
            win = evs[j : j + len(pattern)]
            if [t for (_, _, t) in win] == pattern and (
                win[-1][0] - win[0][0] <= 30
            ):
                want.add((u, win[0][1]))
    assert got == want
