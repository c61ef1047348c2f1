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

Quantifiers — greedy (``A+ B* C?``) and reluctant (``A+? B*? C??``)
— and the ``AFTER MATCH SKIP`` family (``PAST LAST ROW``,
``TO FIRST|LAST <var>``) genuinely need sequential per-key matching,
so
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


def parse_pattern(
    pattern: Sequence[str],
) -> list[tuple[str, int, int | None, bool]]:
    """``["a+", "b*?", "c?", "d"]`` → ``[(type, min_rep, max_rep,
    greedy)]`` with ``max_rep=None`` meaning unbounded. Covers Flink
    MATCH_RECOGNIZE's greedy (``+ * ?``) AND reluctant (``+? *? ??``)
    quantifier surface: with single-literal variables both yield the
    same match SET under SKIP TO NEXT ROW, but under SKIP PAST LAST
    ROW / SKIP TO FIRST|LAST the consumed span decides where the scan
    resumes, so greediness changes the result — e.g. ``a+? b`` takes
    the shortest a-run reaching a b."""
    toks: list[tuple[str, int, int | None, bool]] = []
    for p in pattern:
        greedy = not p.endswith("??") and not (
            len(p) > 1 and p[-1] == "?" and p[-2] in "+*"
        )
        core = p[:-1] if not greedy else p
        if core.endswith("+"):
            toks.append((core[:-1], 1, None, greedy))
        elif core.endswith("*"):
            toks.append((core[:-1], 0, None, greedy))
        elif core.endswith("?"):
            toks.append((core[:-1], 0, 1, greedy))
        else:
            toks.append((core, 1, 1, True))
    if not any(lo > 0 for _, lo, _, _ in toks):
        raise ValueError(
            "pattern must contain at least one non-optional variable"
        )
    return toks


def match_at(
    types,
    times_us,
    start: int,
    toks: list[tuple[str, int, int | None, bool]],
    within_us: int | None,
) -> tuple[int | None, bool, list[tuple[int, int, int]]]:
    """Backtracking match attempt at row ``start`` over a per-key
    timeline sorted by (time, tiebreak) — greedy tokens expand
    longest-first, reluctant tokens shortest-first. Returns
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
        et, lo, hi, greedy = toks[ti]
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
        takes = (
            range(k, lo - 1, -1) if greedy else range(lo, k + 1)
        )
        for take in takes:
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
    toks: list[tuple[str, int, int | None, bool]],
    within_us: int | None,
    skip_past_last_row: bool,
    skip_to: tuple[str, Sequence[int]] | None = None,
) -> list[tuple[int, int, list[tuple[int, int, int]]]]:
    """Left-to-right scan emitting every match as (start, end,
    assignments) triples. ``skip_past_last_row`` resumes after a
    match's last row (AFTER MATCH SKIP PAST LAST ROW — matches never
    overlap); otherwise at start+1 (SKIP TO NEXT ROW — overlaps
    enumerated, the fixed-sequence operator's convention).

    ``skip_to`` overrides both: ``("first"|"last", token_indices)``
    resumes AT the first/last row the named variable's tokens
    consumed (AFTER MATCH SKIP TO FIRST|LAST <var> — that row is
    re-examined as a potential next start). Like Flink, a resume
    point equal to the match's own start row (or a variable that
    consumed no rows) raises — it cannot make progress."""
    out: list[tuple[int, int, list[tuple[int, int, int]]]] = []
    p, n = 0, len(types)
    first_et, _, first_hi, _ = toks[0]
    # run-skip: with an UNBOUNDED first variable and no WITHIN, a
    # failed attempt at p implies failure at every later position of
    # the same-type run (each continuation checkpoint from p+1 was
    # already tried as a longer take from p; reluctant order tries the
    # same take set) — turns the all-'a' never-matching worst case
    # from O(n²) into O(n). Invalid under WITHIN: a later start has a
    # LOOSER remaining window.
    can_skip = first_hi is None and within_us is None
    while p < n:
        end, _, assigns = match_at(types, times_us, p, toks, within_us)
        if end is not None:
            out.append((p, end, assigns))
            if skip_to is not None:
                mode, tis = skip_to
                rows = [
                    (pos, pos + take - 1)
                    for ti, pos, take in assigns
                    if ti in tis and take > 0
                ]
                if not rows:
                    raise ValueError(
                        "AFTER MATCH SKIP TO: variable consumed no "
                        "rows in a match — cannot resume (Flink "
                        "raises here too)"
                    )
                nxt = (
                    min(r[0] for r in rows)
                    if mode == "first"
                    else max(r[1] for r in rows)
                )
                if nxt <= p:
                    raise ValueError(
                        f"AFTER MATCH SKIP TO {mode.upper()}: resume "
                        "point is the match's own start row — "
                        "infinite loop (Flink raises here too)"
                    )
                p = nxt
            else:
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
    after_match: str | tuple[str, Sequence[int]] = "past_last_row",
    measures: Sequence[tuple[str, str, Sequence[int], str | None]] | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE with greedy AND reluctant quantifiers
    (``a+ b*? c??``), ONE ROW PER MATCH: one output row per match —
    (key, start_<tiebreak>, start/end second strings, n_rows[,
    measures...]). ``after_match``: ``"past_last_row"`` (Flink's
    default — non-overlapping, scan resumes after the match),
    ``"next_row"`` (overlap enumeration), or ``("to_first"|"to_last",
    token_indices)`` (AFTER MATCH SKIP TO FIRST|LAST <var> — resume
    AT the first/last row that variable consumed; raises like Flink
    when the resume point cannot advance).

    ``measures``: MEASURES clauses as ``(out_name, agg,
    token_indices, col)`` — agg in first/last/count/sum/min/max/avg
    evaluated over the rows the named pattern variable(s) consumed in
    each match (count ignores col; token_indices spanning EVERY token
    is the unqualified whole-match aggregate, e.g. ``COUNT(*)``), or
    ``match_number`` (Flink's MATCH_NUMBER() — 1-based sequential
    match index within the key, scan order; ignores col and tokens).
    A variable that consumed zero rows (skipped optional) yields NULL
    (count 0).

    Scale: groupBy(key).applyInPandas — one key shuffle, Arrow
    batches, per-task memory = one key's timeline (Flink keyed-state
    contract); measures are pandas slice aggregations per match, no
    extra pass. Cf. reference CDC-Hudi-Notebook.zpln's Flink SQL
    surface, where MATCH_RECOGNIZE is the platform's CEP spelling
    (SURVEY.md §2.5 extension)."""
    import pandas as pd

    toks = parse_pattern(pattern)
    skip_to: tuple[str, Sequence[int]] | None = None
    if isinstance(after_match, tuple):
        mode, tis = after_match
        if mode not in ("to_first", "to_last"):
            raise ValueError(f"unknown after_match {after_match!r}")
        if any(ti < 0 or ti >= len(toks) for ti in tis):
            raise ValueError("after_match: token index out of range")
        skip_to = (mode.removeprefix("to_"), list(tis))
        skip_past = True  # unused when skip_to is set
    elif after_match in ("past_last_row", "next_row"):
        skip_past = after_match == "past_last_row"
    else:
        raise ValueError(f"unknown after_match {after_match!r}")
    within_us = (
        int(within_seconds) * 1_000_000 if within_seconds is not None else None
    )
    measures = list(measures or [])
    dtypes = dict(df.dtypes)

    def mtype(agg: str, col: str | None) -> str:
        if agg in ("count", "match_number"):
            return "bigint"
        if agg == "avg":
            return "double"
        if agg == "sum":
            return "double" if dtypes[col] in ("float", "double") else "bigint"
        return dtypes[col]

    for name, agg, tis, col in measures:
        if agg not in (
            "first", "last", "count", "sum", "min", "max", "avg",
            "match_number",
        ):
            raise ValueError(f"unsupported MEASURES aggregate {agg!r}")
        if agg not in ("count", "match_number") and col is None:
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

        def mval(assigns, agg, tis, col, mi):
            if agg == "match_number":
                return mi
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
                mval(assigns, agg, tis, col, mi)
                for _, agg, tis, col in measures
            )
            for mi, (s, e, assigns) in enumerate(
                scan_matches(
                    types, times_us, toks, within_us, skip_past, skip_to
                ),
                start=1,
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
