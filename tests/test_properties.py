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


# --- paragraph dedup properties (round-4 curation ops) -----------------

words_strategy = st.lists(
    st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"]),
    min_size=0,
    max_size=35,
)
docs_strategy = st.lists(words_strategy, min_size=1, max_size=6)


def _naive_paragraphs(text: str, w: int = 10):
    toks = [t for t in text.strip().split() if t]
    return [" ".join(toks[i : i + w]) for i in range(0, len(toks), w)]


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(docs_strategy)
def test_paragraph_dedup_matches_naive_replay(spark, docs):
    """dedup_paragraphs == a single-threaded first-occurrence replay in
    (doc_id, para_idx) order, for arbitrary small corpora (including
    empty docs and repeated chunks within one doc)."""
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.curation import (
        dedup_paragraphs,
    )

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.clean_text, r.n_kept, r.n_removed)
        for r in dedup_paragraphs(df, "text", "doc_id").collect()
    }

    seen: set[str] = set()
    want = {}
    for i, ws in enumerate(docs):
        paras = _naive_paragraphs(" ".join(ws))
        kept = []
        removed = 0
        for p in paras:
            if p in seen:
                removed += 1
            else:
                seen.add(p)
                kept.append(p)
        if paras:
            want[i] = (" ".join(kept), len(kept), removed)
    assert got == want


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(st.sampled_from("abc"), st.integers(0, 9)),
        min_size=1,
        max_size=60,
    ),
    st.integers(2, 8),
)
def test_salted_distinct_count_matches_naive(spark, rows, n_salts):
    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.skew import (
        salted_distinct_count,
    )

    df = spark.createDataFrame(rows, "g string, v long")
    got = {
        r["g"]: r["n_distinct"]
        for r in salted_distinct_count(df, ["g"], "v", n_salts=n_salts).collect()
    }
    want: dict[str, set] = {}
    for g, v in rows:
        want.setdefault(g, set()).add(v)
    assert got == {g: len(s) for g, s in want.items()}


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.sampled_from("pqr"),          # key
            st.integers(0, 5),               # ts (ties likely)
            st.integers(0, 10_000),          # seq (tie-break)
            st.sampled_from(["x", "y", "z", None]),  # payload w/ nulls
        ),
        min_size=1,
        max_size=50,
        unique_by=lambda t: (t[0], t[1], t[2]),  # total order per key
    )
)
def test_latest_by_key_agg_matches_window_reference(spark, rows):
    """The max_by hash-aggregation LWW must pick exactly the rows the
    original window/row_number formulation picked, including null
    payloads and tie-breaking through the secondary seq column —
    latest_by_key is the engine-wide upsert primitive, so this pins
    the rewrite against the reference semantics on arbitrary data."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.upsert import (
        latest_by_key,
    )

    df = spark.createDataFrame(
        rows, "k STRING, ts INT, seq INT, payload STRING"
    )
    got = {
        tuple(r) for r in latest_by_key(df, "k", ["ts", "seq"]).collect()
    }
    w = Window.partitionBy("k").orderBy(
        F.col("ts").desc_nulls_last(), F.col("seq").desc_nulls_last()
    )
    want = {
        tuple(r)
        for r in df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .collect()
    }
    assert got == want


# -- Avro codec: arbitrary values round-trip --------------------------------

_AVRO_VALUE_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "i", "type": "long"},
        {"name": "s", "type": "string"},
        {"name": "o", "type": ["null", "double", "string"]},
        {"name": "arr", "type": {"type": "array", "items": "long"}},
        {"name": "m", "type": {"type": "map", "values": "long"}},
        {"name": "by", "type": "bytes"},
        {"name": "b", "type": "boolean"},
    ],
}

_avro_records = st.lists(
    st.fixed_dictionaries(
        {
            "i": st.integers(min_value=-(2**62), max_value=2**62),
            "s": st.text(max_size=40),
            "o": st.one_of(
                st.none(),
                st.floats(allow_nan=False, allow_infinity=False, width=64),
                st.text(max_size=10),
            ),
            "arr": st.lists(st.integers(-(2**31), 2**31), max_size=8),
            "m": st.dictionaries(
                st.text(min_size=1, max_size=8), st.integers(-100, 100),
                max_size=5,
            ),
            "by": st.binary(max_size=20),
            "b": st.booleans(),
        }
    ),
    max_size=25,
)


@settings(max_examples=40, suppress_health_check=[HealthCheck.too_slow])
@given(records=_avro_records, codec=st.sampled_from(["null", "deflate"]))
def test_avro_codec_round_trips_arbitrary_values(tmp_path_factory, records, codec):
    """Spec conformance under fuzzing: any record set the schema
    admits (unicode, negative varints, NaN-free doubles, empty
    arrays/maps, union branch flips) must survive write->read
    byte-exactly."""
    import os as _os

    from streaming_data_lake_flink_cdc_apache_hudi_spark.sources.avro_codec import (
        read_avro,
        write_avro,
    )

    d = tmp_path_factory.mktemp("avro_prop")
    p = _os.path.join(str(d), "t.avro")
    write_avro(p, _AVRO_VALUE_SCHEMA, records, codec=codec)
    _, back = read_avro(p)
    assert back == records


# -- SymSpell deletion blocking is lossless for levenshtein <= d -------------

_words = st.text(alphabet="abcde", min_size=0, max_size=7)


@settings(max_examples=10, suppress_health_check=[HealthCheck.too_slow],
          deadline=None)
@given(
    texts=st.lists(_words, min_size=2, max_size=8, unique=True),
    d=st.integers(1, 2),
)
def test_edit_distance_pairs_equals_bruteforce(spark, texts, d):
    """For ANY string set, the deletion-neighborhood join must return
    exactly the brute-force levenshtein<=d pairs (lossless blocking +
    exact verification)."""
    import itertools

    from pyspark.sql import functions as F2

    from streaming_data_lake_flink_cdc_apache_hudi_spark.operators.dedup import (
        edit_distance_pairs,
    )

    rows = list(enumerate(texts))
    df = spark.createDataFrame(rows, "id INT, t STRING")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_pairs(df, "t", "id", max_dist=d).collect()
    }
    lev_rows = [
        (a, b, ta, tb) for (a, ta), (b, tb) in itertools.combinations(rows, 2)
    ]
    brute = spark.createDataFrame(
        lev_rows, "id_a INT, id_b INT, ta STRING, tb STRING"
    ).select("id_a", "id_b", F2.levenshtein("ta", "tb").alias("dist"))
    want = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in brute.collect()
        if r["dist"] <= d
    }
    assert got == want
