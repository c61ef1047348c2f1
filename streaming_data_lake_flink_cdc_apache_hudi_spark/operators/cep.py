"""Complex-event pattern matching — Flink SQL's MATCH_RECOGNIZE
reduced to its relational core: detect a fixed sequence of event
types occurring on STRICTLY CONSECUTIVE rows of a key's timeline
(`PATTERN (A B C)` with no quantifiers), optionally bounded by a
`WITHIN` duration, enumerating every match position (the
`AFTER MATCH SKIP TO NEXT ROW` option, which keeps the operator a
pure window expression — no iterative state).

Why this shape scales: strict contiguity over a per-key ordered
timeline is exactly ``lead(type, i)`` equality checks — one
key-partitioned window sort (the same shuffle sessionization pays),
then map-side comparisons. No joins, no state, no quantifier
backtracking. :func:`pattern_match` stays the windowed fast path for
fixed sequences.

Greedy quantifiers (``A+ B* C?``) and ``AFTER MATCH SKIP PAST LAST
ROW`` genuinely need sequential per-key matching, so
:func:`pattern_match_quantified` runs the Arrow-batched grouped path
(``applyInPandas``): ONE shuffle on the key — the identical exchange
the window version pays — then a per-key greedy backtracking scan in
numpy-backed pandas. Per-task memory is one key-group's timeline,
the same keyed-state contract Flink's MATCH_RECOGNIZE operator has;
the streaming flavor (``streaming/stateful.py:pattern_match_stream``)
holds only the unfinalized tail per key. Backtracking is benign
here: every pattern variable is a single literal type, so each
attempt is run-length bounded (never regex-exponential), and the
scan run-skips a failed unbounded first variable's whole run — the
all-'a' never-matching worst case is O(rows); with a WITHIN bound
the skip is disabled (a later start has a looser window) and the
worst case is O(rows · within-span).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pattern_match(
    df: DataFrame,
    key_col: str,
    time_col: str,
    order_tiebreak: str,
    type_col: str,
    pattern: Sequence[str],
    within_seconds: int | None = None,
) -> DataFrame:
    """Rows where ``pattern`` (a list of event types) starts, one
    output row per match: (key, start_<tiebreak>, start/end second
    strings). ``within_seconds`` bounds last-minus-first event time,
    like MATCH_RECOGNIZE's WITHIN clause."""
    w = Window.partitionBy(key_col).orderBy(
        F.col(time_col), F.col(order_tiebreak)
    )
    cond: Column = F.col(type_col) == pattern[0]
    for i, t in enumerate(pattern[1:], start=1):
        cond = cond & (F.lead(type_col, i).over(w) == F.lit(t))
    end_ts = F.lead(time_col, len(pattern) - 1).over(w)
    if within_seconds is not None:
        # wall-time microsecond difference (TIMESTAMP_NTZ arithmetic,
        # session-zone independent — cf. timeseries._epoch_us_ntz):
        # a DST-straddling pair must not move the WITHIN boundary
        us = F.expr(
            "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
            f" CAST(`{time_col}` AS TIMESTAMP_NTZ))"
        )
        end_us = F.lead(us, len(pattern) - 1).over(w)
        cond = cond & (
            end_us - us <= F.lit(int(within_seconds) * 1_000_000).cast("long")
        )
    return (
        df.select(
            F.col(key_col),
            F.col(time_col),
            F.col(order_tiebreak),
            F.col(type_col),
        )
        .withColumn("_m", cond)
        .withColumn("_end", end_ts)
        .filter(F.col("_m"))
        .select(
            F.col(key_col),
            F.col(order_tiebreak).alias("start_" + order_tiebreak),
            F.date_format(time_col, "yyyy-MM-dd HH:mm:ss").alias("start_ts"),
            F.date_format("_end", "yyyy-MM-dd HH:mm:ss").alias("end_ts"),
        )
    )

# -- greedy-quantifier matcher core (shared with the streaming flavor) ------


def parse_pattern(pattern: Sequence[str]) -> list[tuple[str, int, int | None]]:
    """``["a+", "b*", "c?", "d"]`` → ``[(type, min_rep, max_rep)]``
    with ``max_rep=None`` meaning unbounded. Flink MATCH_RECOGNIZE's
    greedy quantifier surface (reluctant variants are out of scope —
    with single-literal variables and ONE ROW PER MATCH they only
    change which of several overlapping matches is reported)."""
    toks: list[tuple[str, int, int | None]] = []
    for p in pattern:
        if p.endswith("+"):
            toks.append((p[:-1], 1, None))
        elif p.endswith("*"):
            toks.append((p[:-1], 0, None))
        elif p.endswith("?"):
            toks.append((p[:-1], 0, 1))
        else:
            toks.append((p, 1, 1))
    if not any(lo > 0 for _, lo, _ in toks):
        raise ValueError(
            "pattern must contain at least one non-optional variable"
        )
    return toks


def match_at(
    types,
    times_us,
    start: int,
    toks: list[tuple[str, int, int | None]],
    within_us: int | None,
) -> tuple[int | None, bool, list[tuple[int, int, int]]]:
    """Greedy-with-backtracking match attempt at row ``start`` over a
    per-key timeline sorted by (time, tiebreak). Returns
    ``(end_index_inclusive | None, hit_buffer_end, assignments)`` —
    the flag is True when any quantifier expansion was truncated by
    the END of the buffer (rather than a mismatching row or the
    WITHIN bound), i.e. the outcome could still change if later rows
    were appended; the streaming flavor defers those. WITHIN
    truncation is final because timelines are time-sorted: once a row
    exceeds start_ts + within, every later row does too.
    ``assignments`` is one ``(token_index, row_pos, n_rows)`` per
    pattern variable on the successful path (n_rows may be 0 for
    skipped optional variables) — the MEASURES surface."""
    n = len(types)
    limit = (
        times_us[start] + within_us if within_us is not None else None
    )
    hit_end = False

    def rec(
        pos: int, ti: int
    ) -> tuple[int, list[tuple[int, int, int]]] | None:
        nonlocal hit_end
        if ti == len(toks):
            return (pos - 1, []) if pos > start else None
        et, lo, hi = toks[ti]
        k = 0
        while (
            pos + k < n
            and types[pos + k] == et
            and (limit is None or times_us[pos + k] <= limit)
            and (hi is None or k < hi)
        ):
            k += 1
        if pos + k >= n and (hi is None or k < hi):
            hit_end = True
        for take in range(k, lo - 1, -1):
            r = rec(pos + take, ti + 1)
            if r is not None:
                end, tail = r
                return end, [(ti, pos, take)] + tail
        return None

    r = rec(start, 0)
    if r is None:
        return None, hit_end, []
    return r[0], hit_end, r[1]


def scan_matches(
    types,
    times_us,
    toks: list[tuple[str, int, int | None]],
    within_us: int | None,
    skip_past_last_row: bool,
) -> list[tuple[int, int, list[tuple[int, int, int]]]]:
    """Left-to-right scan emitting every match as (start, end,
    assignments) triples. ``skip_past_last_row`` resumes after a
    match's last row (AFTER MATCH SKIP PAST LAST ROW — matches never
    overlap); otherwise at start+1 (SKIP TO NEXT ROW — overlaps
    enumerated, the fixed-sequence operator's convention)."""
    out: list[tuple[int, int, list[tuple[int, int, int]]]] = []
    p, n = 0, len(types)
    first_et, _, first_hi = toks[0]
    # run-skip: with an UNBOUNDED first variable and no WITHIN, a
    # failed attempt at p implies failure at every later position of
    # the same-type run (each continuation checkpoint from p+1 was
    # already tried as a longer take from p) — turns the all-'a'
    # never-matching worst case from O(n²) into O(n). Invalid under
    # WITHIN: a later start has a LOOSER remaining window.
    can_skip = first_hi is None and within_us is None
    while p < n:
        end, _, assigns = match_at(types, times_us, p, toks, within_us)
        if end is not None:
            out.append((p, end, assigns))
            p = end + 1 if skip_past_last_row else p + 1
        elif can_skip and types[p] == first_et:
            p += 1
            while p < n and types[p] == first_et:
                p += 1
        else:
            p += 1
    return out


def pattern_match_quantified(
    df: DataFrame,
    key_col: str,
    time_col: str,
    order_tiebreak: str,
    type_col: str,
    pattern: Sequence[str],
    within_seconds: int | None = None,
    after_match: str = "past_last_row",
    measures: Sequence[tuple[str, str, Sequence[int], str | None]] | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE with greedy quantifiers, ONE ROW PER MATCH:
    one output row per match — (key, start_<tiebreak>, start/end
    second strings, n_rows[, measures...]). ``after_match``:
    ``"past_last_row"`` (Flink's default — non-overlapping, scan
    resumes after the match) or ``"next_row"`` (overlap enumeration).

    ``measures``: MEASURES clauses as ``(out_name, agg,
    token_indices, col)`` — agg in first/last/count/sum/min/max/avg
    evaluated over the rows the named pattern variable(s) consumed in
    each match (count ignores col). A variable that consumed zero
    rows (skipped optional) yields NULL (count 0).

    Scale: groupBy(key).applyInPandas — one key shuffle, Arrow
    batches, per-task memory = one key's timeline (Flink keyed-state
    contract); measures are pandas slice aggregations per match, no
    extra pass. Cf. reference CDC-Hudi-Notebook.zpln's Flink SQL
    surface, where MATCH_RECOGNIZE is the platform's CEP spelling
    (SURVEY.md §2.5 extension)."""
    import pandas as pd

    toks = parse_pattern(pattern)
    if after_match not in ("past_last_row", "next_row"):
        raise ValueError(f"unknown after_match {after_match!r}")
    skip_past = after_match == "past_last_row"
    within_us = (
        int(within_seconds) * 1_000_000 if within_seconds is not None else None
    )
    measures = list(measures or [])
    dtypes = dict(df.dtypes)

    def mtype(agg: str, col: str | None) -> str:
        if agg == "count":
            return "bigint"
        if agg == "avg":
            return "double"
        if agg == "sum":
            return "double" if dtypes[col] in ("float", "double") else "bigint"
        return dtypes[col]

    for name, agg, tis, col in measures:
        if agg not in ("first", "last", "count", "sum", "min", "max", "avg"):
            raise ValueError(f"unsupported MEASURES aggregate {agg!r}")
        if agg != "count" and col is None:
            raise ValueError(f"MEASURES {name}: {agg} needs a column")
        if any(ti < 0 or ti >= len(toks) for ti in tis):
            raise ValueError(f"MEASURES {name}: token index out of range")
    # a start_<tiebreak> column only when the tiebreak is a real extra
    # column (ORDER BY ts alone would duplicate start_ts)
    has_tb = order_tiebreak != time_col
    out_cols = (
        [key_col]
        + (["start_" + order_tiebreak] if has_tb else [])
        + ["start_ts", "end_ts", "n_rows"]
        + [name for name, _, _, _ in measures]
    )
    schema = (
        f"`{key_col}` {dtypes[key_col]}, "
        + (
            f"`start_{order_tiebreak}` {dtypes[order_tiebreak]}, "
            if has_tb
            else ""
        )
        + "start_ts string, end_ts string, n_rows long"
        + "".join(
            f", `{name}` {mtype(agg, col)}"
            for name, agg, _, col in measures
        )
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [time_col, order_tiebreak], kind="mergesort"
        ).reset_index(drop=True)
        types = pdf[type_col].to_numpy()
        times_us = (
            pdf[time_col].astype("datetime64[us]").astype("int64").to_numpy()
        )
        fmt = pdf[time_col].dt.strftime("%Y-%m-%d %H:%M:%S")

        def mval(assigns, agg, tis, col):
            idxs = [
                i
                for ti, pos, take in assigns
                if ti in tis
                for i in range(pos, pos + take)
            ]
            if agg == "count":
                return len(idxs)
            if not idxs:
                return None
            vals = pdf[col].iloc[idxs]
            if agg == "first":
                return vals.iloc[0]
            if agg == "last":
                return vals.iloc[-1]
            if agg == "avg":
                return float(vals.mean())
            return getattr(vals, agg)()  # sum / min / max

        rows = [
            (pdf[key_col].iat[0],)
            + ((pdf[order_tiebreak].iat[s],) if has_tb else ())
            + (fmt.iat[s], fmt.iat[e], e - s + 1)
            + tuple(
                mval(assigns, agg, tis, col)
                for _, agg, tis, col in measures
            )
            for s, e, assigns in scan_matches(
                types, times_us, toks, within_us, skip_past
            )
        ]
        return pd.DataFrame(rows, columns=out_cols)

    # dedupe: ORDER BY may name the time column as its own tiebreak;
    # measures may reference already-selected columns
    sel = list(
        dict.fromkeys(
            [key_col, time_col, order_tiebreak, type_col]
            + [col for _, _, _, col in measures if col is not None]
        )
    )
    return df.select(*sel).groupBy(key_col).applyInPandas(fn, schema)
