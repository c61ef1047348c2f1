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


# -- greedy quantifiers (pattern_match_quantified) ---------------------------

import random
import re

from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
    pattern_match_quantified,
)


def _brute(rows, pattern, within=None, skip_past=True):
    """Independent per-key brute force: encode the type sequence as a
    string and drive Python's regex engine (greedy AND reluctant
    backtracking) over it — WITHIN handled by truncating the
    searchable prefix at each start (rows beyond start_ts + within
    are unconsumable). rows: [(id, ts_seconds, type)] sorted by
    (ts, id)."""
    base = sorted({t for _, _, t in rows} | {p.rstrip("+*?") for p in pattern})
    enc = {t: chr(97 + i) for i, t in enumerate(base)}
    s = "".join(enc[t] for _, _, t in rows)
    rx = re.compile(
        "".join(
            re.escape(enc[p.rstrip("+*?")]) + p[len(p.rstrip("+*?")):]
            for p in pattern
        )
    )
    out, p, n = [], 0, len(s)
    while p < n:
        if within is None:
            m = rx.match(s, p)
        else:
            limit = rows[p][1] + within
            q = p
            while q < n and rows[q][1] <= limit:
                q += 1
            m = rx.match(s[:q], p)
        if m and m.end() > p:
            out.append((p, m.end() - 1))
            p = m.end() if skip_past else p + 1
        else:
            p += 1
    return out


def _qmatch(df, pattern, within=None, after="past_last_row"):
    return pattern_match_quantified(
        df, "user_id", "ts", "event_id", "event_type", pattern,
        within_seconds=within, after_match=after,
    )


def test_quantified_greedy_consumes_maximal_run(spark):
    df = _ev(
        spark,
        [(1, 7, 1, "a"), (2, 7, 2, "a"), (3, 7, 3, "a"), (4, 7, 4, "b"),
         (5, 7, 5, "a"), (6, 7, 6, "b")],
    )
    got = sorted(
        (r["start_event_id"], r["n_rows"])
        for r in _qmatch(df, ["a+", "b"]).collect()
    )
    # greedy a+ eats the whole run 1-3 then b at 4; SKIP PAST LAST ROW
    # resumes at 5
    assert got == [(1, 4), (5, 2)]


def test_quantified_optional_and_star(spark):
    df = _ev(
        spark,
        [(1, 7, 1, "a"), (2, 7, 2, "x"), (3, 7, 3, "x"), (4, 7, 4, "b"),
         (5, 8, 1, "a"), (6, 8, 2, "b"), (7, 9, 1, "a"), (8, 9, 2, "c")],
    )
    got = sorted(
        (r["user_id"], r["start_event_id"], r["n_rows"])
        for r in _qmatch(df, ["a", "x*", "b"]).collect()
    )
    assert got == [(7, 1, 4), (8, 5, 2)]
    got = sorted(
        (r["user_id"], r["start_event_id"], r["n_rows"])
        for r in _qmatch(df, ["a", "c?"]).collect()
    )
    # greedy c? takes c when present
    assert got == [(7, 1, 1), (8, 5, 1), (9, 7, 2)]


def test_quantified_randomized_differential_vs_bruteforce(spark):
    """Randomized sequences x random quantified patterns x both skip
    modes x with/without WITHIN, engine vs independent regex-driven
    brute force."""
    patterns = [
        ["a+", "b"],
        ["a+", "b+"],
        ["a", "b*", "c"],
        ["a+", "x?", "b"],
        ["a", "a+"],
        ["c?", "a+", "b*", "c"],
    ]
    rng = random.Random(42)
    cases = []
    per_key = {}
    key = 0
    for _ in range(12):
        n = rng.randint(10, 60)
        seq = rng.choices("abcx", weights=[4, 3, 2, 2], k=n)
        ts = []
        t = 0
        for _ in range(n):
            t += rng.choice([0, 1, 1, 2, 5, 30])
            ts.append(t)
        rows = [(i + 1, ts[i], seq[i]) for i in range(n)]
        per_key[key] = rows
        key += 1
    data = [
        (rid, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), ty)
        for k, rows in per_key.items()
        for (rid, s, ty) in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    for pattern in patterns:
        for after, skip_past in [("past_last_row", True), ("next_row", False)]:
            for within in [None, 10]:
                got = sorted(
                    (r["user_id"], r["start_event_id"], r["n_rows"])
                    for r in _qmatch(
                        df, pattern, within=within, after=after
                    ).collect()
                )
                want = sorted(
                    (k, rows[s][0], e - s + 1)
                    for k, rows in per_key.items()
                    for s, e in _brute(
                        rows, pattern, within=within, skip_past=skip_past
                    )
                )
                assert got == want, (pattern, after, within)
                cases.append(len(want))
    assert sum(cases) > 100, "differential corpus too thin to mean much"


def test_quantified_within_bounds_greedy_expansion(spark):
    # a's 30s apart: within=40 lets a+ take only 2 before b is out of
    # reach at 1..; starting at the 2nd a, a+b fits
    df = spark.createDataFrame(
        [
            (i, 7, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), t)
            for (i, s, t) in [(1, 0, "a"), (2, 30, "a"), (3, 60, "b")]
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    got = sorted(
        (r["start_event_id"], r["n_rows"])
        for r in _qmatch(df, ["a+", "b"], within=40).collect()
    )
    assert got == [(2, 2)]
    got = sorted(
        (r["start_event_id"], r["n_rows"])
        for r in _qmatch(df, ["a+", "b"], within=60).collect()
    )
    assert got == [(1, 3)]


def test_match_recognize_sql_spelling(spark, tmp_path):
    """The Flink SQL MATCH_RECOGNIZE spelling routes to the greedy
    matcher: result identical to calling pattern_match_quantified,
    WITHIN and AFTER MATCH honored; restricted-surface violations
    raise with guidance."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        EngineSession,
    )

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "t.json")
    )
    eng.register_testdata("/root/testdata/sf0.001")
    got = sorted(
        map(
            tuple,
            eng.sql(
                """
                SELECT * FROM events MATCH_RECOGNIZE (
                  PARTITION BY user_id
                  ORDER BY ts, event_id
                  ONE ROW PER MATCH
                  AFTER MATCH SKIP PAST LAST ROW
                  PATTERN (A+ B)
                  WITHIN INTERVAL '1' DAYS
                  DEFINE A AS A.event_type = 'click',
                         B AS event_type = 'purchase'
                )
                """
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            pattern_match_quantified(
                spark.table("events"),
                "user_id", "ts", "event_id", "event_type",
                ["click+", "purchase"],
                within_seconds=86400,
            ).collect(),
        )
    )
    assert got == want and len(got) > 0

    # ORDER BY a single column: no start_<tiebreak> duplicate column
    one = eng.sql(
        """
        SELECT * FROM events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts
          ONE ROW PER MATCH
          PATTERN (A B)
          DEFINE A AS event_type = 'view', B AS event_type = 'click'
        )
        """
    )
    assert one.columns == ["user_id", "start_ts", "end_ts", "n_rows"]
    assert one.count() > 0

    with _pytest.raises(ValueError, match="no.*DEFINE|DEFINE"):
        eng.sql(
            """
            SELECT * FROM events MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY ts
              ONE ROW PER MATCH
              PATTERN (A X+) DEFINE A AS event_type = 'view'
            )
            """
        )


def test_match_recognize_measures_values(spark, tmp_path):
    """MEASURES aggregates evaluate over exactly the rows each
    pattern variable consumed: SUM/COUNT/AVG over the greedy a-run,
    FIRST/LAST picking the run's endpoints, skipped optional
    variables yielding NULL (count 0)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        EngineSession,
    )

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "t.json")
    )
    spark.createDataFrame(
        [
            (1, 7, dt.datetime(2024, 1, 1, 0, 0, 1), "a", 10.0),
            (2, 7, dt.datetime(2024, 1, 1, 0, 0, 2), "a", 20.0),
            (3, 7, dt.datetime(2024, 1, 1, 0, 0, 3), "a", 30.0),
            (4, 7, dt.datetime(2024, 1, 1, 0, 0, 4), "b", 99.0),
            (5, 8, dt.datetime(2024, 1, 1, 0, 0, 1), "a", 5.0),
            (6, 8, dt.datetime(2024, 1, 1, 0, 0, 2), "b", 7.0),
            (7, 8, dt.datetime(2024, 1, 1, 0, 0, 3), "x", 1.0),
            (8, 8, dt.datetime(2024, 1, 1, 0, 0, 4), "b", 8.0),
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    ).createOrReplaceTempView("mr_events")
    rows = {
        r["user_id"]: r
        for r in eng.sql(
            """
            SELECT * FROM mr_events MATCH_RECOGNIZE (
              PARTITION BY user_id
              ORDER BY ts, event_id
              MEASURES SUM(A.value) AS a_sum, COUNT(A.*) AS a_n,
                       AVG(A.value) AS a_avg, FIRST(A.event_id) AS a_first,
                       LAST(A.event_id) AS a_last, B.value AS b_val,
                       COUNT(X.*) AS x_n
              ONE ROW PER MATCH
              AFTER MATCH SKIP PAST LAST ROW
              PATTERN (A+ X? B)
              DEFINE A AS event_type = 'a', X AS event_type = 'x',
                     B AS event_type = 'b'
            )
            """
        ).collect()
    }
    # user 7: a-run 10+20+30, no x
    r7 = rows[7]
    assert (r7["a_sum"], r7["a_n"], r7["a_avg"]) == (60.0, 3, 20.0)
    assert (r7["a_first"], r7["a_last"], r7["b_val"]) == (1, 3, 99.0)
    assert r7["x_n"] == 0
    # user 8: greedy takes a(5), then x? ... first match is a,b at 5-6
    # (x at 7 not adjacent to the a-run); SKIP PAST LAST ROW
    r8 = rows[8]
    assert (r8["a_sum"], r8["a_n"], r8["b_val"], r8["x_n"]) == (
        5.0, 1, 7.0, 0,
    )


def test_quantified_run_skip_linear_on_pathological_run(spark):
    """A never-matching unbounded first variable over one long run is
    linear (run-skip), and the skip never changes results — verified
    against brute force on run-heavy random data in both skip modes."""
    import time as _time

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        parse_pattern,
        scan_matches,
    )

    toks = parse_pattern(["a+", "b"])
    n = 200_000
    types = ["a"] * n
    times = list(range(n))
    t0 = _time.perf_counter()
    assert scan_matches(types, times, toks, None, True) == []
    assert _time.perf_counter() - t0 < 1.0  # O(n^2) would take minutes

    # equivalence on run-heavy data (long same-type stretches)
    rng = random.Random(99)
    seq, ts = [], []
    t = 0
    while len(seq) < 400:
        ty = rng.choice("aab")
        run = rng.randint(1, 25)
        for _ in range(run):
            t += 1
            seq.append(ty)
            ts.append(t)
    rows = [(i + 1, ts[i], seq[i]) for i in range(len(seq))]
    for pattern in [["a+", "b"], ["a*", "b", "a?"], ["b", "a+"]]:
        toks = parse_pattern(pattern)
        for skip_past in (True, False):
            got = [
                (s, e)
                for s, e, _ in scan_matches(
                    seq, ts, toks, None, skip_past
                )
            ]
            assert got == _brute(rows, pattern, None, skip_past), (
                pattern, skip_past,
            )


# -- reluctant quantifiers, SKIP TO FIRST/LAST, extended MEASURES ------------


def test_reluctant_takes_shortest_span(spark):
    # a b b : greedy (a b*) eats both b's; reluctant (a b*?) takes none
    df = _ev(spark, [(1, 7, 1, "a"), (2, 7, 2, "b"), (3, 7, 3, "b")])
    got = sorted(
        (r["start_event_id"], r["n_rows"])
        for r in _qmatch(df, ["a", "b*"]).collect()
    )
    assert got == [(1, 3)]
    got = sorted(
        (r["start_event_id"], r["n_rows"])
        for r in _qmatch(df, ["a", "b*?"]).collect()
    )
    assert got == [(1, 1)]
    # a+? b: shortest a-run still reaching b — span is forced, but
    # SKIP PAST LAST ROW resume equals greedy here (same match span)
    df2 = _ev(
        spark,
        [(1, 7, 1, "a"), (2, 7, 2, "a"), (3, 7, 3, "b"), (4, 7, 4, "b")],
    )
    got = sorted(
        (r["start_event_id"], r["n_rows"])
        for r in _qmatch(df2, ["a", "b+?"]).collect()
    )
    # b+? takes ONE b; scan resumes at 4 (no a) — vs greedy's (1..4)
    assert got == [(2, 2)]


def test_reluctant_randomized_differential_vs_bruteforce(spark):
    """Reluctant quantifier surface vs the regex brute force (regex
    +?/*?/?? are the spec), both skip modes, with/without WITHIN."""
    patterns = [
        ["a+?", "b"],
        ["a", "b*?", "c"],
        ["a+?", "b+"],
        ["c??", "a+", "b"],
        ["a", "x*?", "b?"],
    ]
    rng = random.Random(7)
    per_key = {}
    for key in range(10):
        n = rng.randint(10, 60)
        seq = rng.choices("abcx", weights=[4, 3, 2, 2], k=n)
        ts, t = [], 0
        for _ in range(n):
            t += rng.choice([0, 1, 1, 2, 5, 30])
            ts.append(t)
        per_key[key] = [(i + 1, ts[i], seq[i]) for i in range(n)]
    data = [
        (rid, k, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), ty)
        for k, rows in per_key.items()
        for (rid, s, ty) in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    total = 0
    for pattern in patterns:
        for after, skip_past in [("past_last_row", True), ("next_row", False)]:
            for within in [None, 10]:
                got = sorted(
                    (r["user_id"], r["start_event_id"], r["n_rows"])
                    for r in _qmatch(
                        df, pattern, within=within, after=after
                    ).collect()
                )
                want = sorted(
                    (k, rows[s][0], e - s + 1)
                    for k, rows in per_key.items()
                    for s, e in _brute(
                        rows, pattern, within=within, skip_past=skip_past
                    )
                )
                assert got == want, (pattern, after, within)
                total += len(want)
    assert total > 60


def test_skip_to_last_variable_resumes_inside_match(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        parse_pattern,
        scan_matches,
    )

    # a a b b c a b b c : SKIP TO LAST B re-examines the final b
    types = list("aabbcabbc")
    ts = list(range(9))
    toks = parse_pattern(["a+", "b+", "c"])
    got = [
        (s, e)
        for s, e, _ in scan_matches(types, ts, toks, None, True, ("last", [1]))
    ]
    assert got == [(0, 4), (5, 8)]
    # a b a b a : pattern (A B A), SKIP TO FIRST B re-examines the
    # shared 'a' — finds the overlapping second match that
    # SKIP PAST LAST ROW misses
    types = list("ababa")
    toks = parse_pattern(["a", "b", "a"])
    got = [
        (s, e)
        for s, e, _ in scan_matches(
            types, list(range(5)), toks, None, True, ("first", [1])
        )
    ]
    assert got == [(0, 2), (2, 4)]
    got = [
        (s, e)
        for s, e, _ in scan_matches(
            types, list(range(5)), toks, None, True, None
        )
    ]
    assert got == [(0, 2)]


def test_skip_to_nonadvancing_raises_like_flink(spark):
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        parse_pattern,
        scan_matches,
    )

    toks = parse_pattern(["a+", "b+"])
    # match [a:0, b:1]; SKIP TO FIRST A -> row 0 == start -> raise
    with _pytest.raises(ValueError, match="SKIP TO FIRST"):
        scan_matches(list("ab"), [0, 1], toks, None, True, ("first", [0]))
    # optional variable consumed no rows -> raise
    toks = parse_pattern(["a", "x?", "b"])
    with _pytest.raises(ValueError, match="consumed no rows"):
        scan_matches(list("ab"), [0, 1], toks, None, True, ("last", [1]))


def test_match_recognize_sql_skip_to_and_reluctant(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_quantified,
    )
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        EngineSession,
    )

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "t.json")
    )
    spark.createDataFrame(
        [
            (i, 7, dt.datetime(2024, 1, 1, 0, 0, s), t)
            for i, (s, t) in enumerate(
                [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "c"),
                 (6, "a"), (7, "b"), (8, "b"), (9, "c")],
                start=1,
            )
        ],
        "event_id long, user_id long, ts timestamp, event_type string",
    ).createOrReplaceTempView("sk_events")
    got = sorted(
        map(
            tuple,
            eng.sql(
                """
                SELECT * FROM sk_events MATCH_RECOGNIZE (
                  PARTITION BY user_id ORDER BY ts, event_id
                  ONE ROW PER MATCH
                  AFTER MATCH SKIP TO LAST B
                  PATTERN (A+ B+ C)
                  DEFINE A AS event_type = 'a', B AS event_type = 'b',
                         C AS event_type = 'c'
                )
                """
            ).collect(),
        )
    )
    want = sorted(
        map(
            tuple,
            pattern_match_quantified(
                spark.table("sk_events"),
                "user_id", "ts", "event_id", "event_type",
                ["a+", "b+", "c"],
                after_match=("to_last", [1]),
            ).collect(),
        )
    )
    assert got == want and len(got) == 2

    # reluctant spelling in PATTERN: B*? consumes zero b's
    one = eng.sql(
        """
        SELECT * FROM sk_events MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          ONE ROW PER MATCH
          PATTERN (A B*?)
          DEFINE A AS event_type = 'a', B AS event_type = 'b'
        )
        """
    )
    assert {(r["start_event_id"], r["n_rows"]) for r in one.collect()} == {
        (1, 1), (2, 1), (6, 1),
    }


def test_match_recognize_sql_whole_match_measures(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import (
        EngineSession,
    )

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "t.json")
    )
    spark.createDataFrame(
        [
            (1, 7, dt.datetime(2024, 1, 1, 0, 0, 1), "a", 10.0),
            (2, 7, dt.datetime(2024, 1, 1, 0, 0, 2), "b", 20.0),
            (3, 7, dt.datetime(2024, 1, 1, 0, 0, 3), "a", 30.0),
            (4, 7, dt.datetime(2024, 1, 1, 0, 0, 4), "b", 40.0),
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    ).createOrReplaceTempView("wm_events")
    rows = sorted(
        eng.sql(
            """
            SELECT * FROM wm_events MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY ts, event_id
              MEASURES SUM(value) AS total, COUNT(*) AS n,
                       MATCH_NUMBER() AS mn, LAST(value) AS last_v
              ONE ROW PER MATCH
              AFTER MATCH SKIP PAST LAST ROW
              PATTERN (A B)
              DEFINE A AS event_type = 'a', B AS event_type = 'b'
            )
            """
        ).collect(),
        key=lambda r: r["mn"],
    )
    assert [(r["total"], r["n"], r["mn"], r["last_v"]) for r in rows] == [
        (30.0, 2, 1, 20.0),
        (70.0, 2, 2, 40.0),
    ]


# -- DEFINE predicates / alternation / PERMUTE (round 7) --------------------


def _priced(spark, vals, user=1):
    return spark.createDataFrame(
        [
            (i, user, dt.datetime(2024, 1, 1, 0, 0, i), "t", float(v))
            for i, v in enumerate(vals)
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )


def test_define_vshape_masks(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    df = _priced(spark, [10, 9, 8, 7, 9, 11, 12, 5, 4, 6])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP+"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        measures=[("bottom", "last", [0], "value")],
    ).collect()
    got = sorted((r.start_event_id, r.n_rows, r.bottom) for r in out)
    # valley 1: rows 1-3 down (9,8,7) + rows 4-6 up (9,11,12)
    # valley 2: rows 7-8 down (5,4) + row 9 up (6)
    assert got == [(1, 6, 7.0), (7, 3, 4.0)]


def test_measures_agg_over_all_null_column_is_null(spark):
    """Advice r8 fix: SUM/AVG/MIN/MAX over a match whose referenced
    values are ALL NULL must return NULL (SQL semantics, and what the
    streaming matcher's mval already does) — not pandas' skipna
    sum()==0.0 / mean()==NaN. COUNT(col-less) still counts rows."""
    import math

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_quantified

    df = spark.createDataFrame(
        [
            (0, 1, dt.datetime(2024, 1, 1, 0, 0, 0), "a", None),
            (1, 1, dt.datetime(2024, 1, 1, 0, 0, 1), "b", None),
            (2, 1, dt.datetime(2024, 1, 1, 0, 0, 2), "b", None),
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = pattern_match_quantified(
        df, "user_id", "ts", "event_id", "event_type",
        pattern=["a", "b+"],
        measures=[
            ("s", "sum", [1], "value"),
            ("a_", "avg", [1], "value"),
            ("mn", "min", [1], "value"),
            ("mx", "max", [1], "value"),
            ("c", "count", [1], None),
        ],
    ).collect()
    assert len(out) == 1
    r = out[0]
    for v in (r.s, r.a_, r.mn, r.mx):
        assert v is None or (isinstance(v, float) and math.isnan(v)) is False
        assert v is None
    assert r.c == 2


def test_define_undefined_var_matches_any_row(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    df = _priced(spark, [10, 9, 8, 11])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["STRT", "DOWN+", "UP"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
    ).collect()
    # STRT binds the row BEFORE the descent (Flink's undefined=TRUE)
    assert [(r.start_event_id, r.n_rows) for r in out] == [(0, 4)]


def test_define_first_reference_ctx_path(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    df = _priced(spark, [10, 9, 8, 7, 9, 11, 12, 5, 4, 6])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP+"],
        define={
            "DOWN": "value < PREV(value)",
            # full recovery: every UP row must beat the descent start
            "UP": "value > PREV(value) AND value > FIRST(DOWN.value)",
        },
    ).collect()
    # attempt at row 1 fails (FIRST(DOWN.value)=9, first up row 9 is
    # not > 9), so the scan resumes at row 2 — where DOWN=[8,7] gives
    # FIRST=8 and the ascent 9,11,12 clears it: match rows 2..6.
    # (The r7 matcher run-skipped the whole descent after the row-1
    # failure and missed this match — the r8 soundness fix disables
    # run-skip for match-relative patterns.) Valley 2: FIRST=5,
    # up row 6 > 5 -> matches.
    assert [(r.start_event_id, r.n_rows) for r in out] == [(2, 5), (7, 3)]


def test_define_in_list_and_literals(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    df = spark.createDataFrame(
        [
            (i, 1, dt.datetime(2024, 1, 1, 0, 0, i), t, float(i))
            for i, t in enumerate(["view", "click", "error", "purchase"])
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["V", "MID+", "P"],
        define={
            "V": "event_type = 'view'",
            "MID": "event_type IN ('click', 'error')",
            "P": "event_type = 'purchase'",
        },
    ).collect()
    assert [(r.start_event_id, r.n_rows) for r in out] == [(0, 4)]


def test_alternation_set_test(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_quantified

    df = _ev(
        spark,
        [
            (0, 1, 0, "view"), (1, 1, 1, "click"), (2, 1, 2, "error"),
            (3, 1, 3, "click"), (4, 1, 4, "purchase"),
            (5, 1, 5, "view"), (6, 1, 6, "signup"), (7, 1, 7, "purchase"),
        ],
    )
    out = pattern_match_quantified(
        df, "user_id", "ts", "event_id", "event_type",
        pattern=["view", "(click|error)+", "purchase"],
    ).collect()
    # second view fails: signup is not in the alternation set
    assert [(r.start_event_id, r.n_rows) for r in out] == [(0, 5)]


def test_permute_matches_both_orders_and_remaps_measures(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_quantified

    df = spark.createDataFrame(
        [
            (i, 1, dt.datetime(2024, 1, 1, 0, 0, i), t, float(10 + i))
            for i, t in enumerate(
                ["s", "v", "c", "p", "s", "c", "v", "p", "s", "v", "v", "p"]
            )
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = pattern_match_quantified(
        df, "user_id", "ts", "event_id", "event_type",
        pattern=["s", "permute(v,c)", "p"],
        measures=[
            ("v_val", "first", [1], "value"),
            ("c_val", "first", [2], "value"),
        ],
    ).collect()
    got = sorted((r.start_event_id, r.v_val, r.c_val) for r in out)
    # v,v at rows 9-10 is NOT a permutation of {v,c} -> no third match;
    # measures bind by member NAME in both arrival orders
    assert got == [(0, 11.0, 12.0), (4, 16.0, 15.0)]


def test_permute_rejects_quantifier_and_dupes(spark):
    import pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import parse_pattern

    with pytest.raises(ValueError, match="quantifier"):
        parse_pattern(["permute(a,b)+"])
    with pytest.raises(ValueError, match="distinct"):
        parse_pattern(["permute(a,a)"])


def test_match_recognize_sql_define_predicates(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import EngineConfig
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        EngineConfig(shuffle_partitions=4),
        spark=spark,
        registry_path=str(tmp_path / "tables.json"),
    )
    _priced(spark, [10, 9, 8, 7, 9, 11, 12, 5, 4, 6]).createOrReplaceTempView(
        "ticker_r7"
    )
    out = eng.sql(
        """
        SELECT * FROM ticker_r7 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES LAST(DOWN.value) AS bottom, COUNT(DOWN.*) AS n_down
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (STRT DOWN+ UP+)
          DEFINE DOWN AS DOWN.value < PREV(DOWN.value),
                 UP AS UP.value > PREV(UP.value) )
        """
    ).collect()
    got = sorted((r.start_event_id, r.n_rows, r.bottom, r.n_down) for r in out)
    assert got == [(0, 7, 7.0, 3), (7, 3, 4.0, 1)]


def test_match_recognize_sql_permute_and_alternation(spark, tmp_path):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.config import EngineConfig
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        EngineConfig(shuffle_partitions=4),
        spark=spark,
        registry_path=str(tmp_path / "tables2.json"),
    )
    _ev(
        spark,
        [
            (0, 1, 0, "s"), (1, 1, 1, "v"), (2, 1, 2, "c"), (3, 1, 3, "p"),
            (4, 1, 4, "s"), (5, 1, 5, "c"), (6, 1, 6, "v"), (7, 1, 7, "p"),
        ],
    ).createOrReplaceTempView("ev_r7")
    perm = eng.sql(
        """
        SELECT * FROM ev_r7 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A PERMUTE(B, C) D)
          DEFINE A AS event_type = 's', B AS event_type = 'v',
                 C AS event_type = 'c', D AS event_type = 'p' )
        """
    ).collect()
    assert sorted(r.start_event_id for r in perm) == [0, 4]
    alt = eng.sql(
        """
        SELECT * FROM ev_r7 MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          ONE ROW PER MATCH AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A (B|C)+ D)
          DEFINE A AS event_type = 's', B AS event_type = 'v',
                 C AS event_type = 'c', D AS event_type = 'p' )
        """
    ).collect()
    assert sorted((r.start_event_id, r.n_rows) for r in alt) == [
        (0, 4), (4, 4),
    ]


def test_define_randomized_differential_vs_bruteforce(spark):
    """Mask-path DEFINE matching vs a brute-force reference over
    random walks: classify directions in plain Python, enumerate
    greedy skip-past D+U+ matches by hand, compare."""
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    rng = random.Random(77)
    rows = []
    expected = []
    for user in range(12):
        n = rng.randrange(4, 40)
        vals = [rng.randrange(0, 6) for _ in range(n)]
        for i, v in enumerate(vals):
            rows.append((user * 1000 + i, user, i, float(v)))
        dirs = ["F"] + [
            "D" if b < a else ("U" if b > a else "F")
            for a, b in zip(vals, vals[1:])
        ]
        p = 0
        while p < n:
            if dirs[p] == "D":
                e = p
                while e + 1 < n and dirs[e + 1] == "D":
                    e += 1
                if e + 1 < n and dirs[e + 1] == "U":
                    u = e + 1
                    while u + 1 < n and dirs[u + 1] == "U":
                        u += 1
                    expected.append((user, user * 1000 + p, u - p + 1))
                    p = u + 1
                    continue
                p = e + 1
            else:
                p += 1
    df = spark.createDataFrame(
        [
            (eid, u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v)
            for eid, u, s, v in rows
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP+"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
    ).collect()
    got = sorted((r.user_id, r.start_event_id, r.n_rows) for r in out)
    assert got == sorted(expected)


def test_all_rows_per_match_define_and_measures_refusal(spark):
    import pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_define,
        pattern_match_quantified,
    )

    df = _priced(spark, [10, 9, 8, 11, 5, 7])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        rows_per_match="all",
    ).collect()
    got = sorted((r.match_no, r.event_id, r.classifier) for r in out)
    # match 1: rows 1,2 DOWN + row 3 UP; match 2: row 4 DOWN + row 5 UP
    assert got == [
        (1, 1, "DOWN"), (1, 2, "DOWN"), (1, 3, "UP"),
        (2, 4, "DOWN"), (2, 5, "UP"),
    ]
    # original columns survive untouched
    assert {r.event_id: r.value for r in out}[4] == 5.0
    # r8: the DEFINE matcher's ALL ROWS path takes MEASURES too —
    # RUNNING count per emitted row, FINAL min repeated on every row
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > PREV(value)",
        },
        rows_per_match="all",
        measures=[
            ("k", "count", [0, 1], None, "running"),
            ("bottom", "min", [0, 1], "value", "final"),
        ],
    ).collect()
    got = {(r.match_no, r.event_id): (r.k, r.bottom) for r in out}
    assert got[(1, 1)] == (1, 8.0) and got[(1, 3)] == (3, 8.0)
    assert got[(2, 4)] == (1, 5.0) and got[(2, 5)] == (2, 5.0)
    # bad measure mode still raises
    with pytest.raises(ValueError, match="running|final"):
        pattern_match_quantified(
            df, "user_id", "ts", "event_id", "event_type", ["t+"],
            measures=[("c", "count", [0], None, "sideways")],
            rows_per_match="all",
        )


def test_alternation_equals_relabeled_literal_fuzz(spark):
    """Equivalence differential: (a|b) over random timelines must
    match EXACTLY what a single literal matches after relabeling
    a,b -> c — alternation is set membership, nothing more."""
    import random

    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_quantified,
    )

    rng = random.Random(99)
    rows = []
    rid = 0
    for user in range(8):
        for s in range(60):
            rid += 1
            rows.append(
                (rid, user, s, rng.choice(["a", "b", "p", "x"]))
            )
    df = _ev(spark, rows)
    alt = pattern_match_quantified(
        df, "user_id", "ts", "event_id", "event_type",
        ["(a|b)+", "p"], after_match="next_row",
    )
    relabeled = df.withColumn(
        "event_type",
        F.when(F.col("event_type").isin("a", "b"), "c").otherwise(
            F.col("event_type")
        ),
    )
    lit = pattern_match_quantified(
        relabeled, "user_id", "ts", "event_id", "event_type",
        ["c+", "p"], after_match="next_row",
    )
    a = sorted(map(tuple, alt.collect()))
    l = sorted(map(tuple, lit.collect()))
    assert a == l and len(a) > 20


def test_permute_equals_union_of_orders_fuzz(spark):
    """Equivalence differential: PERMUTE(v,c) between anchors equals
    the UNION of the two fixed orders — under SKIP TO NEXT ROW both
    sides enumerate every occurrence, so the sets must be equal."""
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_quantified,
    )

    rng = random.Random(41)
    rows = []
    rid = 0
    for user in range(8):
        for _ in range(120):
            rid += 1
            # constant ts: the event_id tiebreak orders the timeline
            rows.append(
                (rid, user, 0, rng.choice(["s", "v", "c", "p"]))
            )
    df = _ev(spark, rows)
    perm = pattern_match_quantified(
        df, "user_id", "ts", "event_id", "event_type",
        ["s", "permute(v,c)", "p"], after_match="next_row",
    )
    got = sorted(
        (r.user_id, r.start_event_id, r.n_rows) for r in perm.collect()
    )
    want = sorted(
        (r.user_id, r.start_event_id, r.n_rows)
        for order in (["s", "v", "c", "p"], ["s", "c", "v", "p"])
        for r in pattern_match_quantified(
            df, "user_id", "ts", "event_id", "event_type",
            order, after_match="next_row",
        ).collect()
    )
    assert got == want and len(got) >= 3


def test_define_like_and_between(spark):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        pattern_match_define,
    )

    rows = [
        (i, 1, dt.datetime(2024, 1, 1, 0, i), t, float(v))
        for i, (t, v) in enumerate(
            [("view_home", 1), ("click_buy", 2), ("click_ad", 9),
             ("purchase", 3), ("view_cart", 12), ("click_buy", 4),
             ("purchase", 5), ("view_x", 1), ("click_big", 99),
             ("purchase", 1)]
        )
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["V", "C+", "P"],
        define={
            "V": "event_type LIKE 'view%'",
            "C": "event_type LIKE 'click%' AND value BETWEEN 1 AND 10",
            "P": "event_type = 'purchase'",
        },
    ).collect()
    # third funnel fails: click_big's value 99 is outside BETWEEN
    assert sorted((r.start_event_id, r.n_rows) for r in out) == [
        (0, 4), (4, 3),
    ]
    neg = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["NC+", "P"],
        define={
            "NC": "event_type NOT LIKE 'view%' AND "
                  "event_type NOT LIKE 'purchase%'",
            "P": "event_type = 'purchase'",
        },
    ).collect()
    assert sorted((r.start_event_id, r.n_rows) for r in neg) == [
        (1, 3), (5, 2), (8, 2),
    ]


def test_define_vec_vs_ctx_evaluator_consistency_fuzz():
    """The DEFINE compiler has two evaluation engines — vectorized
    masks (row-local) and per-row closures (match-relative). Pin them
    against each other: random row-local expressions over random
    frames (with nulls) must produce identical truth vectors whether
    evaluated as a mask or row-by-row through the ctx interpreter.
    No Spark needed — this is the pure compiler."""
    import random

    import pandas as pd

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        _ctx_eval,
        _sql_predicate_ast,
        _vec_eval,
    )

    rng = random.Random(2024)
    atoms = [
        "v < PREV(v)",
        "v > PREV(v, 2)",
        "v >= 3",
        "v + 1 < PREV(v)",
        "t = 'a'",
        "t <> 'b'",
        "t IN ('a', 'c')",
        "ABS(v - 5) <= 2",
        "t LIKE 'a%'",
        "v BETWEEN 2 AND 7",
        "NOT v < 4",
    ]
    for case in range(60):
        parts = rng.sample(atoms, rng.randint(1, 3))
        expr = (" " + rng.choice(["AND", "OR"]) + " ").join(parts)
        n = rng.randint(1, 20)
        vals = [
            None if rng.random() < 0.15 else float(rng.randint(0, 9))
            for _ in range(n)
        ]
        ts = [
            None if rng.random() < 0.1 else rng.choice(["a", "b", "c", "ax"])
            for _ in range(n)
        ]
        pdf = pd.DataFrame({"v": vals, "t": ts})
        tree, lits = _sql_predicate_ast(expr)
        v = _vec_eval(tree, pdf, lits)
        if hasattr(v, "to_numpy"):
            if v.dtype != bool:
                v = v.fillna(False).astype(bool)
            mask = list(v.to_numpy())
        else:
            mask = [bool(v)] * n
        rowwise = []
        for i in range(n):
            r = _ctx_eval(tree, i, pdf, {}, "X", lits)
            rowwise.append(bool(r) if r is not None else False)
        assert mask == rowwise, (case, expr, vals, ts, mask, rowwise)


def test_define_repeated_variable_unions_spans(spark):
    """ADVICE r7: PATTERN (A B A C) binds A via TWO tokens —
    FIRST(A.col)/LAST(A.col) must resolve against the union of all
    rows mapped to A (Flink semantics), not just the latest token's
    span."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    def run(vals):
        df = spark.createDataFrame(
            [
                (i, 1, dt.datetime(2024, 1, 1, 0, 0, i), t, float(v))
                for i, (t, v) in enumerate(vals)
            ],
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double",
        )
        return pattern_match_define(
            df,
            key_col="user_id",
            time_col="ts",
            order_tiebreak="event_id",
            pattern=["A", "B", "A", "C"],
            define={
                "A": "event_type = 'a'",
                "B": "event_type = 'b'",
                "C": "event_type = 'c' AND value > FIRST(A.value)",
            },
        ).collect()

    # union-first = 3 (row 0), so C's 7 > 3 matches; the buggy
    # latest-token span would use FIRST = 10 and reject
    rows = run([("a", 3), ("b", 5), ("a", 10), ("c", 7)])
    assert [(r.start_event_id, r.n_rows) for r in rows] == [(0, 4)]
    # union-first = 10, so C's 7 fails; the buggy span (FIRST = 3)
    # would wrongly match
    assert run([("a", 10), ("b", 5), ("a", 3), ("c", 7)]) == []

    # LAST over the union = the latest row bound to A in either case;
    # FIRST(A.value, 1) steps through A's OWN row list (skipping the
    # interleaved B row)
    def run2(vals, cdef):
        df = spark.createDataFrame(
            [
                (i, 1, dt.datetime(2024, 1, 1, 0, 0, i), t, float(v))
                for i, (t, v) in enumerate(vals)
            ],
            "event_id long, user_id long, ts timestamp, "
            "event_type string, value double",
        )
        return pattern_match_define(
            df,
            key_col="user_id",
            time_col="ts",
            order_tiebreak="event_id",
            pattern=["A", "B", "A", "C"],
            define={
                "A": "event_type = 'a'",
                "B": "event_type = 'b'",
                "C": cdef,
            },
        ).collect()

    vals = [("a", 3), ("b", 5), ("a", 10), ("c", 7)]
    assert len(run2(vals, "event_type = 'c' AND LAST(A.value) = 10")) == 1
    # offset 1 from FIRST skips to A's second bound row (10), NOT the
    # next timeline row (the B at 5)
    assert len(run2(vals, "event_type = 'c' AND FIRST(A.value, 1) = 10")) == 1
    assert run2(vals, "event_type = 'c' AND FIRST(A.value, 1) = 5") == []
    # offset beyond the variable's bound rows is NULL -> predicate false
    assert run2(vals, "event_type = 'c' AND FIRST(A.value, 2) = 10") == []


def test_parse_pattern_rejects_malformed_quantifiers(spark):
    """ADVICE r7: 'A++' / 'A*+' must raise, not silently become a
    never-matching variable named 'A+'."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import parse_pattern

    for bad in ("A++", "A*+", "A?*", "A+*"):
        with _pytest.raises(ValueError, match="bad pattern element"):
            parse_pattern([bad])
    # the legal set still parses
    assert len(parse_pattern(["A+", "B*", "C?", "D+?", "E*?", "F??", "G"])) == 7


def test_match_recognize_sql_rejects_malformed_quantifier(spark, tmp_path):
    """session.py PATTERN parser: 'A++' raises instead of matching
    nothing."""
    import pytest as _pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "q.json")
    )
    eng.register_testdata("/root/testdata/sf0.001")
    with _pytest.raises(ValueError, match="invalid quantifier"):
        eng.sql(
            """
            SELECT * FROM events MATCH_RECOGNIZE (
              PARTITION BY user_id ORDER BY ts
              ONE ROW PER MATCH
              PATTERN (A++ B)
              DEFINE A AS event_type = 'click',
                     B AS event_type = 'purchase'
            )
            """
        )


# --- round 8: aggregates in DEFINE, SUBSET, RUNNING MEASURES ---------------


def test_define_agg_running_segmentation(spark):
    """Own-variable running aggregate: PATTERN (A+) with A AS
    SUM(A.value) <= 10 greedily packs each key's timeline into
    consecutive segments whose cumulative sum (candidate row
    included) stays under the cap."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    df = _priced(spark, [4, 5, 3, 9, 2, 8])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["A+"],
        define={"A": "SUM(A.value) <= 10"},
    ).collect()
    got = sorted((r.start_event_id, r.n_rows) for r in out)
    # [4,5]=9 | [3]=3 (+9 would be 12) | [9]=9 | [2,8]=10
    assert got == [(0, 2), (2, 1), (3, 1), (4, 2)]


def test_define_foreign_agg_and_count(spark):
    """Foreign-variable aggregate: UP must beat the MEAN of the
    descent it follows; a shorter-descent suffix qualifies when the
    full run's mean is too high (the attempt at the run start fails,
    the scan then matches from the suffix)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    df = _priced(spark, [10, 9, 1, 8])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value > AVG(DOWN.value)",
        },
        measures=[("n_down", "count", [0], None)],
    ).collect()
    # avg(9,1)=5 < 8 -> whole descent matches from its start
    assert [(r.start_event_id, r.n_rows, r.n_down) for r in out] == [
        (1, 3, 2)
    ]


def test_run_skip_disabled_for_ctx_patterns(spark):
    """r8 soundness fix: with a mask-first + ctx-later pattern, a
    failed attempt at a run's start does NOT imply failure at later
    positions of the run (the aggregate's bound span shrinks) — the
    old run-skip would have skipped the matching suffix start."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    # descent 9,1 after 10, then 2: attempt at row1 fails
    # (2*2=4 <= 9+1), backtrack to DOWN=[9] fails (1*1 <= 9);
    # attempt at row2 matches (2*1 > 1)
    df = _priced(spark, [10, 9, 1, 2])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value * COUNT(DOWN.value) > SUM(DOWN.value)",
        },
    ).collect()
    assert [(r.start_event_id, r.n_rows) for r in out] == [(2, 2)]


def test_define_agg_differential_vs_bruteforce(spark):
    """Aggregate-DEFINE matching vs an independent spec-level brute
    force over random integer walks: attempts at every position in
    scan order, greedy take enumeration, UP tested against the bound
    descent span, skip past last row."""
    import random

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    rng = random.Random(88)
    rows = []
    expected = []
    for user in range(14):
        n = rng.randrange(4, 36)
        vals = [float(rng.randrange(0, 8)) for _ in range(n)]
        for i, v in enumerate(vals):
            rows.append((user * 1000 + i, user, i, v))
        p = 0
        while p < n:
            matched = None
            # greedy DOWN+ from p: maximal k with each row < its prev
            k = 0
            while (
                p + k < n
                and p + k >= 1
                and vals[p + k] < vals[p + k - 1]
            ):
                k += 1
            for take in range(k, 0, -1):
                r = p + take
                if r < n and vals[r] * take > sum(vals[p : p + take]):
                    matched = (p, r)
                    break
            if matched:
                expected.append((user, user * 1000 + p, r - p + 1))
                p = r + 1
            else:
                p += 1
    df = spark.createDataFrame(
        [
            (eid, u, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), v)
            for eid, u, s, v in rows
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP"],
        define={
            "DOWN": "value < PREV(value)",
            "UP": "value * COUNT(DOWN.value) > SUM(DOWN.value)",
        },
    ).collect()
    got = sorted((r.user_id, r.start_event_id, r.n_rows) for r in out)
    assert got == sorted(expected)


def test_subset_union_define_and_measures(spark):
    """SUBSET V = (DOWN, UP): DEFINE resolves FIRST(V.col) against
    the union's first row; MEASURES aggregate across both members'
    rows; validation rejects unknown members and name collisions."""
    import pytest

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_define

    df = _priced(spark, [10, 9, 1, 8, 30])
    out = pattern_match_define(
        df,
        key_col="user_id",
        time_col="ts",
        order_tiebreak="event_id",
        pattern=["DOWN+", "UP+"],
        define={
            "DOWN": "value < PREV(value)",
            # recovery capped at 2.5x the descent start (= FIRST of
            # the union): 8 < 22.5 passes, 30 >= 22.5 truncates
            "UP": "value > PREV(value) AND value * 10 < FIRST(V.value) * 25",
        },
        subset={"V": ["DOWN", "UP"]},
        measures=[
            ("v_first", "first", [0, 1], "value"),
            ("v_min", "min", [0, 1], "value"),
        ],
    ).collect()
    assert [
        (r.start_event_id, r.n_rows, r.v_first, r.v_min) for r in out
    ] == [(1, 3, 9.0, 1.0)]
    with pytest.raises(ValueError, match="members must be pattern"):
        pattern_match_define(
            df, "user_id", "ts", "event_id", ["A+"],
            define={"A": "value > 0"}, subset={"U": ["NOPE"]},
        )
    with pytest.raises(ValueError, match="collides"):
        pattern_match_define(
            df, "user_id", "ts", "event_id", ["A+"],
            define={"A": "value > 0"}, subset={"A": ["A"]},
        )


def test_running_and_final_measures_all_rows(spark):
    """SQL:2016 RUNNING vs FINAL MEASURES under ALL ROWS PER MATCH:
    running aggregates cover the match's rows up to and including the
    emitted row (NULL before the measured variable binds), final
    values repeat on every row."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import pattern_match_quantified

    ev = spark.createDataFrame(
        [
            (i, 1, dt.datetime(2024, 1, 1, 0, 0, i), t, float(i + 1))
            for i, t in enumerate(["view", "click", "purchase", "view"])
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    out = pattern_match_quantified(
        ev, "user_id", "ts", "event_id", "event_type",
        ["view", "click", "purchase"],
        rows_per_match="all",
        measures=[
            ("cum_v", "sum", [0, 1, 2], "value", "running"),
            ("tot_v", "sum", [0, 1, 2], "value", "final"),
            ("n_so_far", "count", [0, 1, 2], None, "running"),
            # measured variable is the LAST token: running value is
            # NULL until the purchase row arrives
            ("p_v", "last", [2], "value", "running"),
            ("mno", "match_number", [], None),
        ],
    ).collect()
    rows = {r.event_id: r for r in out}
    assert [rows[i].cum_v for i in (0, 1, 2)] == [1.0, 3.0, 6.0]
    assert [rows[i].tot_v for i in (0, 1, 2)] == [6.0, 6.0, 6.0]
    assert [rows[i].n_so_far for i in (0, 1, 2)] == [1, 2, 3]
    assert [rows[i].p_v for i in (0, 1, 2)] == [None, None, 3.0]
    assert all(rows[i].mno == 1 for i in (0, 1, 2))


def test_match_recognize_sql_subset_and_running_measures(spark, tmp_path):
    """SQL spellings: SUBSET clause, RUNNING/FINAL MEASURES prefixes,
    MEASURES under ALL ROWS PER MATCH."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "s.json")
    )
    spark.createDataFrame(
        [
            (i, 1, dt.datetime(2024, 1, 1, 0, 0, i), t, float(i + 1))
            for i, t in enumerate(["view", "click", "purchase", "view"])
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    ).createOrReplaceTempView("mr8_ev")
    out = eng.sql(
        """
        SELECT * FROM mr8_ev MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES RUNNING SUM(value) AS cum_v,
                   FINAL SUM(value) AS tot_v
          ALL ROWS PER MATCH
          PATTERN (A B C)
          DEFINE A AS event_type = 'view', B AS event_type = 'click',
                 C AS event_type = 'purchase'
        )
        """
    ).collect()
    rows = {r.event_id: r for r in out}
    assert [rows[i].cum_v for i in (0, 1, 2)] == [1.0, 3.0, 6.0]
    assert [rows[i].tot_v for i in (0, 1, 2)] == [6.0, 6.0, 6.0]

    spark.createDataFrame(
        [
            (i, 1, dt.datetime(2024, 1, 1, 0, 0, i), "t", float(v))
            for i, v in enumerate([10, 9, 1, 8])
        ],
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    ).createOrReplaceTempView("mr8_pr")
    out = eng.sql(
        """
        SELECT * FROM mr8_pr MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES MIN(V.value) AS vmin, AVG(V.value) AS vavg
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN+ UP)
          SUBSET V = (DOWN, UP)
          DEFINE DOWN AS value < PREV(value),
                 UP AS value > AVG(DOWN.value)
        )
        """
    ).collect()
    assert [
        (r.start_event_id, r.n_rows, r.vmin, r.vavg) for r in out
    ] == [(1, 3, 1.0, 6.0)]


def test_define_aggregate_evaluator_vs_naive_fuzz():
    """r8: pin the ctx interpreter's aggregate + FIRST/LAST-over-row-
    list semantics against a naive Python reference over random
    frames, random variable row lists (with nulls), and random
    expressions — no Spark, pure compiler."""
    import random

    import pandas as pd

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.cep import (
        _ctx_eval,
        _sql_predicate_ast,
    )

    rng = random.Random(4096)

    def naive_agg(vals, agg):
        vs = [v for v in vals if v is not None]
        if agg == "count":
            return len(vs)
        if not vs:
            return None
        if agg == "sum":
            return sum(vs)
        if agg == "avg":
            return sum(vs) / len(vs)
        return min(vs) if agg == "min" else max(vs)

    for case in range(80):
        n = rng.randint(2, 16)
        vals = [
            None if rng.random() < 0.2 else float(rng.randint(0, 9))
            for _ in range(n)
        ]
        pdf = pd.DataFrame({"v": vals})
        pos = sorted(rng.sample(range(n), rng.randint(1, n)))
        pos_b = sorted(rng.sample(range(n), rng.randint(1, n)))
        spans = {"A": pos, "B": pos_b}
        agg = rng.choice(["sum", "avg", "min", "max", "count"])
        kind = rng.choice(["const", "own", "cross", "nav"])
        if kind == "const":
            expr = f"{agg.upper()}(A.v) > 10"
        elif kind == "own":
            expr = f"v * COUNT(A.v) <= SUM(A.v)"
        elif kind == "cross":
            expr = f"AVG(B.v) < {agg.upper()}(A.v)"
        else:
            off = rng.randint(0, 3)
            f = rng.choice(["FIRST", "LAST"])
            expr = f"{f}(A.v, {off}) >= 4"
        tree, lits = _sql_predicate_ast(expr)
        a_vals = [vals[p] for p in pos]
        b_vals = [vals[p] for p in pos_b]
        for i in range(n):

            def cmp(l, r, op):
                if l is None or r is None:
                    return False
                return op(l, r)

            if kind == "const":
                want = cmp(naive_agg(a_vals, agg), 10, lambda a, b: a > b)
            elif kind == "own":
                want = cmp(
                    None if vals[i] is None else vals[i] * naive_agg(a_vals, "count"),
                    naive_agg(a_vals, "sum"),
                    lambda a, b: a <= b,
                )
            elif kind == "cross":
                want = cmp(
                    naive_agg(b_vals, "avg"),
                    naive_agg(a_vals, agg),
                    lambda a, b: a < b,
                )
            else:
                nn = [v for v in a_vals]  # FIRST/LAST step raw rows
                if off >= len(nn):
                    pick = None
                else:
                    pick = nn[off] if f == "FIRST" else nn[len(nn) - 1 - off]
                want = cmp(pick, 4, lambda a, b: a >= b)
            got = _ctx_eval(tree, i, pdf, spans, "X", lits)
            got = bool(got) if got is not None else False
            assert got == want, (case, expr, i, vals, pos, pos_b, got, want)


def test_match_recognize_sql_on_stream_routes_to_stateful(spark, tmp_path):
    """r8: the SQL MATCH_RECOGNIZE spelling over a STREAMING view
    routes to the cross-micro-batch matchers (Flink's MATCH_RECOGNIZE
    is streaming SQL) — literal DEFINEs to pattern_match_stream,
    predicate DEFINEs to pattern_match_define_stream — and the
    finalized matches equal the batch spelling's on the drained
    stream. MEASURES and ALL ROWS PER MATCH (r9) run through the
    DEFINE matcher; PERMUTE-with-MEASURES refuses with guidance."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.session import EngineSession

    eng = EngineSession(
        spark=spark, registry_path=str(tmp_path / "reg" / "st.json")
    )
    seq = ["view", "click", "purchase", "view", "click", "click",
           "purchase", "view"] * 2
    rows = [
        (u * 1000 + i, u, dt.datetime(2024, 1, 1, 0, 0, i), t, float(i))
        for u in (1, 2)
        for i, t in enumerate(seq)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id long, user_id long, ts timestamp, "
        "event_type string, value double",
    )
    d = tmp_path / "sqlfeed"
    d.mkdir()
    ordered = ev.orderBy("ts", "event_id").collect()
    half = len(ordered) // 2
    for name, chunk in [("a", ordered[:half]), ("b", ordered[half:])]:
        spark.createDataFrame(chunk, ev.schema).coalesce(1).write.parquet(
            str(d / f"{name}.parquet")
        )
    (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d / "*"))
        .createOrReplaceTempView("mr_stream")
    )
    ev.createOrReplaceTempView("mr_batch")
    sql = """
        SELECT * FROM {src} MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+ C)
          DEFINE A AS event_type = 'view', B AS event_type = 'click',
                 C AS event_type = 'purchase'
        )
    """
    res = eng.sql(sql.format(src="mr_stream"))
    assert res.isStreaming
    q = (
        res.writeStream.outputMode("append")
        .format("memory")
        .queryName("mrsql")
        .option("checkpointLocation", str(tmp_path / "ck_mrsql"))
        .start()
    )
    q.processAllAvailable()
    got = sorted(
        (int(r["key"]), r["start_id"], r["n_rows"])
        for r in spark.sql("SELECT * FROM mrsql").collect()
    )
    q.stop()
    want = sorted(
        (r["user_id"], r["start_event_id"], r["n_rows"])
        for r in eng.sql(sql.format(src="mr_batch")).collect()
    )
    assert got == want and len(want) > 3

    # MEASURES on a stream route through the DEFINE matcher (r8):
    # values must equal the batch spelling's, keyed by start row
    msql = """
        SELECT * FROM {src} MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES SUM(value) AS total_v, LAST(B.value) AS last_b,
                   COUNT(B.*) AS n_b, MATCH_NUMBER() AS mno
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+ C)
          DEFINE A AS event_type = 'view', B AS event_type = 'click',
                 C AS event_type = 'purchase'
        )
    """
    mres = eng.sql(msql.format(src="mr_stream"))
    assert mres.isStreaming
    q = (
        mres.writeStream.outputMode("append")
        .format("memory")
        .queryName("mrsqlm")
        .option("checkpointLocation", str(tmp_path / "ck_mrsqlm"))
        .start()
    )
    q.processAllAvailable()
    gotm = {
        (int(r["key"]), r["start_id"]): (
            r["total_v"], r["last_b"], r["n_b"], r["mno"]
        )
        for r in spark.sql("SELECT * FROM mrsqlm").collect()
    }
    q.stop()
    wantm = {
        (r["user_id"], r["start_event_id"]): (
            r["total_v"], r["last_b"], r["n_b"], r["mno"]
        )
        for r in eng.sql(msql.format(src="mr_batch")).collect()
    }
    assert gotm == wantm and len(wantm) > 3
    # ALL ROWS PER MATCH on a stream (r9, replacing the refusal):
    # per-consumed-row emission with RUNNING measures equals the
    # batch spelling's output — SQL:2016 default mode under ALL ROWS
    # is RUNNING, so SUM(value) here is a running sum
    asql = """
        SELECT * FROM {src} MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES SUM(value) AS run_v, FINAL SUM(value) AS fin_v,
                   MATCH_NUMBER() AS mno
          ALL ROWS PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (A B+ C)
          DEFINE A AS event_type = 'view', B AS event_type = 'click',
                 C AS event_type = 'purchase'
        )
    """
    ares = eng.sql(asql.format(src="mr_stream"))
    assert ares.isStreaming
    q = (
        ares.writeStream.outputMode("append")
        .format("memory")
        .queryName("mrsqla")
        .option("checkpointLocation", str(tmp_path / "ck_mrsqla"))
        .start()
    )
    q.processAllAvailable()
    # the streaming route's CLASSIFIER() is the SQL variable name
    # (SQL:2016); the batch literal route emits the resolved type —
    # map one onto the other for the comparison
    var_ty = {"A": "view", "B": "click", "C": "purchase"}
    gota = sorted(
        (r["user_id"], r["event_id"], r["match_no"],
         var_ty[r["classifier"]], r["run_v"], r["fin_v"], r["mno"])
        for r in spark.sql("SELECT * FROM mrsqla").collect()
    )
    q.stop()
    wanta = sorted(
        (r["user_id"], r["event_id"], r["match_no"], r["classifier"],
         r["run_v"], r["fin_v"], r["mno"])
        for r in eng.sql(asql.format(src="mr_batch")).collect()
    )
    assert gota == wanta and len(wanta) > 10
    # PERMUTE with MEASURES streams (r9 stretch): members are resolved
    # types tested against the type column; match_at's perm remap
    # binds each member's MEASURES to the row bearing its type
    # regardless of arrival order — parity with the batch spelling
    psql = """
        SELECT * FROM {src} MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          MEASURES FIRST(A.value) AS a_v, FIRST(B.value) AS b_v,
                   MATCH_NUMBER() AS mno
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (PERMUTE(A, B) C)
          DEFINE A AS event_type = 'view', B AS event_type = 'click',
                 C AS event_type = 'purchase'
        )
    """
    pres = eng.sql(psql.format(src="mr_stream"))
    assert pres.isStreaming
    q = (
        pres.writeStream.outputMode("append")
        .format("memory")
        .queryName("mrsqlp")
        .option("checkpointLocation", str(tmp_path / "ck_mrsqlp"))
        .start()
    )
    q.processAllAvailable()
    gotp = sorted(
        (int(r["key"]), r["start_id"], r["a_v"], r["b_v"], r["mno"])
        for r in spark.sql("SELECT * FROM mrsqlp").collect()
    )
    q.stop()
    wantp = sorted(
        (r["user_id"], r["start_event_id"], r["a_v"], r["b_v"], r["mno"])
        for r in eng.sql(psql.format(src="mr_batch")).collect()
    )
    assert gotp == wantp and len(wantp) > 3
    # predicate DEFINE shape routes to the streaming DEFINE matcher
    res2 = eng.sql(
        """
        SELECT * FROM mr_stream MATCH_RECOGNIZE (
          PARTITION BY user_id ORDER BY ts, event_id
          ONE ROW PER MATCH
          AFTER MATCH SKIP PAST LAST ROW
          PATTERN (DOWN+ UP)
          DEFINE DOWN AS value < PREV(value),
                 UP AS value > AVG(DOWN.value)
        )
        """
    )
    assert res2.isStreaming
