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
:func:`pattern_match_quantified` runs the Arrow-batched keyed path:
ONE pinned-width shuffle on the key — the identical exchange the
window version pays, explicitly sized because AQE's byte-based
coalescing would collapse a Python-heavy-but-byte-light exchange to
one task — then ``mapInPandas`` with an in-pandas groupby (one
Python call and one Arrow batch per PARTITION, not per key) running
a per-key greedy backtracking scan in numpy-backed pandas. Per-task
memory is the shuffle partition (the sessionization contract); the
streaming flavor
(``streaming/stateful.py:pattern_match_stream``) holds only the
unfinalized tail per key. Backtracking is benign
here: every pattern variable is a single row test (type literal,
alternation set, or DEFINE mask), so each attempt is run-length
bounded (never regex-exponential), and the scan run-skips a failed
unbounded first variable's whole run — the all-'a' never-matching
worst case is O(rows); with a WITHIN bound the skip is disabled (a
later start has a looser window) and the worst case is
O(rows · within-span).

Round 7 widens the surface to Flink 1.15's DEFINE clause —
arbitrary boolean predicates over row values with PREV/NEXT
navigation and FIRST/LAST match-relative references
(:func:`pattern_match_define`, streaming flavor
``pattern_match_define_stream``) — plus three SQL:2016 forms Flink
itself rejects: alternation ``(a|b)``, ``PERMUTE(a,b)``, and ALL
ROWS PER MATCH with MATCH_NUMBER()/CLASSIFIER() output.
"""

from __future__ import annotations

import ast as _ast
import operator as _op
import re
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
) -> list[tuple[object, int, int | None, bool]]:
    """``["a+", "b*?", "c?", "d"]`` → ``[(test, min_rep, max_rep,
    greedy)]`` with ``max_rep=None`` meaning unbounded. Covers Flink
    MATCH_RECOGNIZE's greedy (``+ * ?``) AND reluctant (``+? *? ??``)
    quantifier surface: with single-literal variables both yield the
    same match SET under SKIP TO NEXT ROW, but under SKIP PAST LAST
    ROW / SKIP TO FIRST|LAST the consumed span decides where the scan
    resumes, so greediness changes the result — e.g. ``a+? b`` takes
    the shortest a-run reaching a b.

    ``test`` is a plain string for a single type literal, plus two
    SQL:2016 pattern forms Flink's own MATCH_RECOGNIZE lacks:

    - ``"(a|b)"`` (alternation, quantifiable) → a ``frozenset`` test —
      the row's type may be any member;
    - ``"permute(a,b,c)"`` (unquantified, distinct members) → one
      ``("perm", members, j)`` token per member: ``len(members)``
      consecutive rows whose types are exactly the member set in ANY
      order (lexicographic preference is moot — with distinct
      single-row members every valid assignment consumes the same
      rows). Member token ``j`` is remapped after a match to the row
      whose type equals ``members[j]``, so MEASURES bind by NAME, not
      by the order the rows arrived in.
    """
    toks: list[tuple[object, int, int | None, bool]] = []
    for p in pattern:
        greedy = not p.endswith("??") and not (
            len(p) > 1 and p[-1] == "?" and p[-2] in "+*"
        )
        core = p[:-1] if not greedy else p
        if core.endswith("+"):
            lo, hi, core = 1, None, core[:-1]
        elif core.endswith("*"):
            lo, hi, core = 0, None, core[:-1]
        elif core.endswith("?"):
            lo, hi, core = 0, 1, core[:-1]
        else:
            lo, hi = 1, 1
        pm = re.match(r"^permute\(\s*(.*?)\s*\)$", core, re.IGNORECASE)
        if pm:
            if (lo, hi) != (1, 1) or not greedy:
                raise ValueError(
                    f"PERMUTE element {p!r} cannot carry a quantifier"
                )
            members = tuple(v.strip() for v in pm.group(1).split(","))
            if len(members) < 2 or len(set(members)) != len(members) or not all(
                members
            ):
                raise ValueError(
                    f"PERMUTE needs >=2 distinct non-empty members: {p!r}"
                )
            toks.extend(
                (("perm", members, j), 1, 1, True)
                for j in range(len(members))
            )
            continue
        if core.startswith("(") and core.endswith(")"):
            alts = frozenset(v.strip() for v in core[1:-1].split("|"))
            if len(alts) < 2 or not all(alts) or any(
                a[-1] in "+*?" for a in alts
            ):
                raise ValueError(f"bad alternation element {p!r}")
            toks.append((alts, lo, hi, greedy))
            continue
        # a literal type may contain any characters ('add-to-cart',
        # 'page.view'), but a TRAILING quantifier character means a
        # malformed quantifier ('A++' strips one '+' and would
        # otherwise become a never-matching literal 'A+')
        if not core or core[-1] in "+*?":
            raise ValueError(f"bad pattern element {p!r}")
        toks.append((core, lo, hi, greedy))
    if not any(lo > 0 for _, lo, _, _ in toks):
        raise ValueError(
            "pattern must contain at least one non-optional variable"
        )
    return toks


def _row_ok(et, types, i: int) -> bool:
    """Row-local token test: type literal, alternation set, PERMUTE
    member (membership minus the types the group's earlier members
    already claimed — members are distinct single-row tokens at
    consecutive positions, so member ``j``'s row is ``i`` with the
    group occupying ``i-j..i``), or a precomputed DEFINE mask."""
    if isinstance(et, str):
        return types[i] == et
    if isinstance(et, frozenset):
        return types[i] in et
    if et[0] == "mask":
        return bool(et[1][i])
    if et[0] == "perm":
        j = et[2]
        return types[i] in et[1] and (
            j == 0 or types[i] not in types[i - j : i]
        )
    raise TypeError(f"token test {et!r} needs match context")


def _remap_perm(assigns, toks, types):
    """After a successful match, point each PERMUTE member token at
    the row whose type equals that member's declared name (the scan
    assigned rows positionally), so MEASURES/SKIP TO resolve by
    variable name regardless of arrival order."""
    if not any(
        isinstance(t[0], tuple) and t[0][0] == "perm" for t in toks
    ):
        return assigns
    out = list(assigns)
    i = 0
    while i < len(out):
        ti = out[i][0]
        et = toks[ti][0]
        if isinstance(et, tuple) and et[0] == "perm" and et[2] == 0:
            k = len(et[1])
            grp = out[i : i + k]
            row_of = {types[pos]: pos for _, pos, _ in grp}
            for j, member in enumerate(et[1]):
                out[i + j] = (grp[j][0], row_of[member], 1)
            i += k
        else:
            i += 1
    return out


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
    skipped optional variables) — the MEASURES surface.

    Token tests beyond the type literal (see :func:`parse_pattern`
    and :func:`pattern_match_define`): alternation ``frozenset``s,
    PERMUTE members, precomputed ``("mask", ndarray)`` DEFINE
    predicates, and ``("ctx", fn)`` match-relative predicates — the
    last receive ``(row, bindings_so_far, run_start)`` so FIRST/LAST
    references can see the rows earlier variables consumed (and the
    current variable's partial run, candidate row included).
    Bindings are threaded forward for exactly that reason; predicate
    checks are prefix-closed, so a backtracked shorter take never
    invalidates rows already accepted."""
    n = len(times_us)
    limit = (
        times_us[start] + within_us if within_us is not None else None
    )
    hit_end = False

    def ok(et, i: int, bound, pos: int) -> bool:
        if isinstance(et, tuple) and et[0] == "ctx":
            return et[1](i, bound, pos)
        return _row_ok(et, types, i)

    def rec(
        pos: int, ti: int, bound: list[tuple[int, int, int]]
    ) -> tuple[int, list[tuple[int, int, int]]] | None:
        nonlocal hit_end
        if ti == len(toks):
            return (pos - 1, bound) if pos > start else None
        et, lo, hi, greedy = toks[ti]
        k = 0
        while (
            pos + k < n
            and ok(et, pos + k, bound, pos)
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
            r = rec(pos + take, ti + 1, bound + [(ti, pos, take)])
            if r is not None:
                return r
        return None

    r = rec(start, 0, [])
    if r is None:
        return None, hit_end, []
    return r[0], hit_end, _remap_perm(r[1], toks, types)


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
    p, n = 0, len(times_us)
    first_et, _, first_hi, _ = toks[0]
    # run-skip: with an UNBOUNDED first variable and no WITHIN, a
    # failed attempt at p implies failure at every later position of
    # the same-test run (each continuation checkpoint from p+1 was
    # already tried as a longer take from p; reluctant order tries the
    # same take set) — turns the all-'a' never-matching worst case
    # from O(n²) into O(n). Invalid under WITHIN (a later start has a
    # LOOSER remaining window) and for match-relative ("ctx")
    # predicates, whose row test is not a pure function of the row.
    # ... and invalid when ANY token is match-relative ("ctx"), not
    # just the first: a later ctx predicate (e.g. UP AS value >
    # AVG(DOWN.value)) sees a DIFFERENT bound span from a later start
    # (the run suffix shrinks, the aggregate moves), so a failed
    # attempt at p does NOT imply failure at p+1.
    can_skip = (
        first_hi is None
        and within_us is None
        and not any(
            isinstance(et, tuple) and et[0] == "ctx"
            for et, _, _, _ in toks
        )
    )
    # vectorized start prefilter: a match can only begin where the
    # FIRST token's row test holds (its min_rep is >= 1, or the scan
    # must try every row anyway), so compute the candidate positions
    # in one numpy pass and walk only those — for a selective first
    # variable this removes the per-row Python match_at call on the
    # (1 - selectivity) majority of the timeline
    starts = None
    if toks[0][1] > 0:
        import numpy as _np

        if isinstance(first_et, str):
            starts = _np.flatnonzero(_np.asarray(types) == first_et)
        elif isinstance(first_et, frozenset):
            t_arr = _np.asarray(types)
            hit = _np.zeros(len(t_arr), dtype=bool)
            for m in first_et:
                hit |= t_arr == m
            starts = _np.flatnonzero(hit)
        elif isinstance(first_et, tuple) and first_et[0] == "mask":
            starts = _np.flatnonzero(first_et[1])
        elif isinstance(first_et, tuple) and first_et[0] == "perm":
            # group member 0's test is plain membership
            t_arr = _np.asarray(types)
            hit = _np.zeros(len(t_arr), dtype=bool)
            for m in first_et[1]:
                hit |= t_arr == m
            starts = _np.flatnonzero(hit)
    si = 0
    while p < n:
        if starts is not None:
            # jump to the next candidate start >= p
            si = int(_np.searchsorted(starts, p))
            if si >= len(starts):
                break
            p = int(starts[si])
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
        elif can_skip and _row_ok(first_et, types, p):
            p += 1
            while p < n and _row_ok(first_et, types, p):
                p += 1
        else:
            p += 1
    return out


def _grouped_match(
    df: DataFrame,
    key_col: str,
    time_col: str,
    order_tiebreak: str,
    extra_cols: Sequence[str],
    toks: list,
    bind_toks,
    within_seconds: int | None,
    after_match: str | tuple[str, Sequence[int]],
    measures: Sequence[tuple[str, str, Sequence[int], str | None]] | None,
    rows_per_match: str = "one",
    tok_names: Sequence[str] | None = None,
    prepare=None,
) -> DataFrame:
    """Shared applyInPandas core behind the quantified (type-literal)
    and DEFINE-predicate matchers: ONE key shuffle, per-key Arrow
    batch, scan_matches over tokens produced by ``bind_toks(pdf) ->
    (types_or_None, bound_toks)``. Validation of after_match /
    MEASURES happens here against the template ``toks``.

    ``rows_per_match="all"`` is SQL:2016's ALL ROWS PER MATCH (a form
    Flink rejects): every consumed input row is emitted carrying its
    original columns plus ``match_no`` (MATCH_NUMBER(), 1-based scan
    order within the key) and ``classifier`` (CLASSIFIER() — the
    pattern variable the row bound to, from ``tok_names``).

    ``measures`` entries are ``(name, agg, token_indices, col)`` or
    ``(name, agg, token_indices, col, mode)`` with mode ``"running"``
    (SQL:2016's default under ALL ROWS PER MATCH: aggregate over the
    match's rows up to AND including the emitted row, restricted to
    the named tokens) or ``"final"`` (the whole-match value repeated
    on every row). Under ONE ROW PER MATCH the two coincide (the only
    emitted row is the final one), so the mode is accepted and
    ignored there."""
    import pandas as pd

    if rows_per_match not in ("one", "all"):
        raise ValueError(f"unknown rows_per_match {rows_per_match!r}")

    def by_key_map(frame: DataFrame, per_key_fn, schema: str) -> DataFrame:
        """ONE hash exchange on the key, then per-key matching via
        mapInPandas with an in-pandas groupby — NOT groupBy().
        applyInPandas: that API pays a Python call + Arrow batch per
        GROUP, and CEP keys are many and small (1500 keys at sf0.1
        made the identity applyInPandas alone cost 2.4 s). Each task
        concatenates its partition, sorts ONCE by (key, time,
        tiebreak) — which leaves every group time-ordered — and
        precomputes the microsecond timeline once, so the per-key fn
        does no sorting/casting of its own. Per-task memory is the
        shuffle partition (the sessionization contract); match
        results are identical because every key's rows land in
        exactly one partition."""

        def part_fn(it):
            chunks = [c for c in it if len(c)]
            if not chunks:
                return
            whole = pd.concat(chunks, ignore_index=True)
            whole = whole.sort_values(
                [key_col, time_col, order_tiebreak],
                kind="mergesort",
                ignore_index=True,
            )
            whole["_cep_us"] = (
                whole[time_col].astype("datetime64[us]").astype("int64")
            )
            if prepare is not None:
                # whole-partition precompute (e.g. DEFINE masks via
                # group-aware shifts) — one vectorized pass for every
                # key in the partition instead of per-key pandas calls
                whole = prepare(whole)
            # dropna=False: Spark's groupBy treats a null key as a
            # group; pandas would silently drop it. Outputs buffer
            # into ONE concat + ONE Arrow batch per partition — a
            # yield per key would pay per-batch serialization 1500×
            outs = []
            for _, g in whole.groupby(key_col, sort=False, dropna=False):
                out = per_key_fn(g)
                if len(out):
                    outs.append(out)
            if outs:
                yield pd.concat(outs, ignore_index=True)

        # EXPLICIT partition count: a bare repartition(col) lets AQE
        # coalesce the exchange by byte size, and a CEP input is tiny
        # in bytes but heavy in per-row Python work — at sf0.1 AQE
        # folded it to ONE task and serialized the whole matcher.
        # Pinning numPartitions keeps the Python work spread across
        # the cluster; the shuffle itself is unchanged.
        try:
            n_parts = int(
                frame.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        except (TypeError, ValueError):
            n_parts = frame.sparkSession.sparkContext.defaultParallelism
        return frame.repartition(n_parts, F.col(key_col)).mapInPandas(
            part_fn, schema
        )

    def fmt_us(times_us, idx) -> list:
        """Vectorized second-precision strings for the MATCHED rows
        only — strftime over every input row was the second-largest
        cost in the profile."""
        if not idx:
            return []
        return list(
            pd.to_datetime(times_us[idx], unit="us").strftime(
                "%Y-%m-%d %H:%M:%S"
            )
        )

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
    # SQL:2016 default mode: RUNNING under ALL ROWS PER MATCH, FINAL
    # under ONE ROW PER MATCH (where the two coincide) — matching the
    # SQL front door's default, so 4-tuple callers get spec semantics
    default_mode = "running" if rows_per_match == "all" else "final"
    measures = [
        (m[0], m[1], list(m[2]), m[3], m[4] if len(m) > 4 else default_mode)
        for m in (measures or [])
    ]
    dtypes = dict(df.dtypes)

    def mtype(agg: str, col: str | None) -> str:
        if agg in ("count", "match_number"):
            return "bigint"
        if agg == "avg":
            return "double"
        if agg == "sum":
            return "double" if dtypes[col] in ("float", "double") else "bigint"
        return dtypes[col]

    for name, agg, tis, col, mode in measures:
        if agg not in (
            "first", "last", "count", "sum", "min", "max", "avg",
            "match_number",
        ):
            raise ValueError(f"unsupported MEASURES aggregate {agg!r}")
        if agg not in ("count", "match_number") and col is None:
            raise ValueError(f"MEASURES {name}: {agg} needs a column")
        if any(ti < 0 or ti >= len(toks) for ti in tis):
            raise ValueError(f"MEASURES {name}: token index out of range")
        if mode not in ("running", "final"):
            raise ValueError(
                f"MEASURES {name}: mode must be running|final, "
                f"got {mode!r}"
            )

    def measure_val(pdf, idxs, agg, col, mi, arrs=None):
        """One aggregate over the given row positions (SQL semantics:
        empty -> NULL, COUNT -> row count, sum/avg skip nulls).

        ``arrs`` is a per-GROUP numpy column cache: per-match pandas
        ``.iloc[list]`` + ``dropna`` were the profiled hot path after
        the r10 matcher speedups. int/uint/float columns take the
        numpy path (identical results — NaN is float's only null);
        every other dtype keeps the exact pandas semantics and return
        types (Timestamps, strings, objects)."""
        if agg == "match_number":
            return mi
        if agg == "count":
            return len(idxs)
        if not idxs:
            return None
        arr = None
        if arrs is not None:
            arr = arrs.get(col)
            if arr is None:
                a = pdf[col].to_numpy()
                # False marks "not numeric: use the pandas path"
                arr = arrs[col] = a if a.dtype.kind in "iuf" else False
            if arr is False:
                arr = None
        if arr is not None:
            if agg == "first":
                return arr[idxs[0]]
            if agg == "last":
                return arr[idxs[-1]]
            vals = arr[idxs]
            if arr.dtype.kind == "f":
                vals = vals[vals == vals]  # drop NaN (float's null)
            if len(vals) == 0:
                return None
            if agg == "avg":
                return float(vals.mean())
            return (
                vals.sum()
                if agg == "sum"
                else (vals.min() if agg == "min" else vals.max())
            )
        vals = pdf[col].iloc[idxs]
        if agg == "first":
            return vals.iloc[0]
        if agg == "last":
            return vals.iloc[-1]
        # SQL aggregates skip NULLs but return NULL when NOTHING remains;
        # pandas skipna would instead give sum()==0.0 / mean()==NaN over
        # an all-null window.  Mirror the streaming matcher's
        # `if not vs: return None` so batch and stream agree.
        vals = vals.dropna()
        if len(vals) == 0:
            return None
        if agg == "avg":
            return float(vals.mean())
        return getattr(vals, agg)()  # sum / min / max

    if rows_per_match == "all":
        names = list(tok_names or [])
        if len(names) != len(toks):
            raise ValueError(
                "ALL ROWS PER MATCH needs one tok_names entry per "
                "token (CLASSIFIER() output)"
            )
        all_schema = (
            ", ".join(f"`{c}` {t}" for c, t in df.dtypes)
            + ", match_no long, classifier string"
            + "".join(
                f", `{name}` {mtype(agg, col)}"
                for name, agg, _, col, _ in measures
            )
        )

        def all_fn(pdf: pd.DataFrame) -> pd.DataFrame:
            types, btoks = bind_toks(pdf)
            times_us = pdf["_cep_us"].to_numpy()
            arrs: dict = {}  # per-group numpy cache for measure_val
            idxs: list[int] = []
            mnos: list[int] = []
            cls: list[str] = []
            mvals: list[list] = [[] for _ in measures]
            for mi, (s, e, assigns) in enumerate(
                scan_matches(
                    types, times_us, btoks, within_us, skip_past, skip_to
                ),
                start=1,
            ):
                rows = [
                    (ti, i)
                    for ti, pos, take in assigns
                    for i in range(pos, pos + take)
                ]
                for ti, i in rows:
                    idxs.append(i)
                    mnos.append(mi)
                    cls.append(names[ti])
                for j, (_, agg, tis, col, mode) in enumerate(measures):
                    midx = [i for ti, i in rows if ti in tis]
                    if mode == "final" or agg == "match_number":
                        v = measure_val(pdf, midx, agg, col, mi, arrs)
                        mvals[j].extend([v] * len(rows))
                    else:
                        # RUNNING: rows bound so far, emitted row incl.
                        for _, i in rows:
                            mvals[j].append(
                                measure_val(
                                    pdf,
                                    [x for x in midx if x <= i],
                                    agg,
                                    col,
                                    mi,
                                    arrs,
                                )
                            )
            out = pdf.take(idxs).reset_index(drop=True)
            out = out.drop(
                columns=[c for c in out.columns if c.startswith("_cep_")]
            )
            out["match_no"] = pd.Series(mnos, dtype="int64")
            out["classifier"] = cls if cls else pd.Series(dtype=object)
            for j, (name, _, _, _, _) in enumerate(measures):
                out[name] = pd.Series(mvals[j], dtype=object)
            return out

        return by_key_map(df, all_fn, all_schema)

    # a start_<tiebreak> column only when the tiebreak is a real extra
    # column (ORDER BY ts alone would duplicate start_ts)
    has_tb = order_tiebreak != time_col
    out_cols = (
        [key_col]
        + (["start_" + order_tiebreak] if has_tb else [])
        + ["start_ts", "end_ts", "n_rows"]
        + [name for name, _, _, _, _ in measures]
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
            for name, agg, _, col, _ in measures
        )
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        types, btoks = bind_toks(pdf)
        times_us = pdf["_cep_us"].to_numpy()
        arrs: dict = {}  # per-group numpy cache for measure_val

        def mval(assigns, agg, tis, col, mi):
            idxs = [
                i
                for ti, pos, take in assigns
                if ti in tis
                for i in range(pos, pos + take)
            ]
            return measure_val(pdf, idxs, agg, col, mi, arrs)

        ms = scan_matches(
            types, times_us, btoks, within_us, skip_past, skip_to
        )
        f_s = fmt_us(times_us, [s for s, _, _ in ms])
        f_e = fmt_us(times_us, [e for _, e, _ in ms])
        rows = [
            (pdf[key_col].iat[0],)
            + ((pdf[order_tiebreak].iat[s],) if has_tb else ())
            + (f_s[j], f_e[j], e - s + 1)
            + tuple(
                mval(assigns, agg, tis, col, j + 1)
                for _, agg, tis, col, _ in measures
            )
            for j, (s, e, assigns) in enumerate(ms)
        ]
        return pd.DataFrame(rows, columns=out_cols)

    # dedupe: ORDER BY may name the time column as its own tiebreak;
    # measures may reference already-selected columns
    sel = list(
        dict.fromkeys(
            [key_col, time_col, order_tiebreak]
            + list(extra_cols)
            + [col for _, _, _, col, _ in measures if col is not None]
        )
    )
    return by_key_map(df.select(*sel), fn, schema)


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
    rows_per_match: str = "one",
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
    (SURVEY.md §2.5 extension).

    Pattern elements may also be alternations (``"(a|b)+"``) or an
    unquantified ``"permute(a,b,c)"`` — SQL:2016 row-pattern forms
    Flink itself rejects; see :func:`parse_pattern`. NOTE a PERMUTE
    element expands to one token per member, so ``token_indices`` in
    ``after_match``/``measures`` index the EXPANDED token list.

    ``rows_per_match="all"`` switches to SQL:2016's ALL ROWS PER
    MATCH output (every consumed row + match_no + classifier; see
    :func:`_grouped_match`) — the classifier for a type-literal
    token is the type itself, for an alternation the ``(a|b)``
    spelling, for a PERMUTE member its declared type (remapped to
    the row actually bearing it)."""
    toks = parse_pattern(pattern)
    return _grouped_match(
        df,
        key_col,
        time_col,
        order_tiebreak,
        [type_col],
        toks,
        lambda pdf: (pdf[type_col].to_numpy(), toks),
        within_seconds,
        after_match,
        measures,
        rows_per_match=rows_per_match,
        tok_names=[_tok_name(et) for et, _, _, _ in toks],
    )


def _tok_name(et) -> str:
    """CLASSIFIER() spelling of a token test."""
    if isinstance(et, str):
        return et
    if isinstance(et, frozenset):
        return "(" + "|".join(sorted(et)) + ")"
    if et[0] == "perm":
        return et[1][et[2]]
    raise ValueError(f"no classifier name for token {et!r}")


# -- DEFINE predicate compiler (Flink MATCH_RECOGNIZE DEFINE clause) --------
#
# Flink 1.15's MATCH_RECOGNIZE (the reference platform's Flink SQL — cf.
# CDC-Hudi-Notebook.zpln's runtime) lets DEFINE bind a pattern variable to
# an arbitrary boolean expression over row values with navigation
# functions — the canonical V-shape `PRICE_DOWN AS PRICE_DOWN.price <
# PREV(PRICE_DOWN.price)`. Two evaluation strategies, chosen per clause:
#
# - ROW-LOCAL (no FIRST/LAST, no foreign-variable references): the
#   predicate is a pure function of the row and fixed-offset PREV/NEXT
#   neighbors in the key's timeline, so it compiles to ONE vectorized
#   pandas evaluation per key group — a boolean mask the scanner indexes,
#   with SQL null semantics (a comparison against a shifted-in null is
#   False). This covers the documented Flink examples and keeps the
#   matcher's inner loop numpy-cheap.
# - MATCH-RELATIVE (FIRST/LAST(V.col[, off]) or references to OTHER
#   pattern variables — Flink resolves a bare foreign `A.col` as the LAST
#   row mapped to A): compiles to a per-row closure the scanner calls with
#   the bindings accumulated so far; the current variable's own span
#   includes the candidate row, matching Flink's running semantics.
#
# The expression grammar is the SQL boolean subset: comparisons
# (= <> < <= > >=), AND/OR/NOT, + - * / %, IN (...), literals, column
# refs (bare or VAR.col), PREV/NEXT(expr[, n]), FIRST/LAST(VAR.col[, n]),
# ABS(x). Parsed by rewriting the SQL spellings to Python syntax
# (precedence of AND/OR/NOT matches SQL) and walking the ast — the tree
# is evaluated by OUR interpreter, never executed as Python code.

_CMP_OPS = {
    _ast.Lt: _op.lt,
    _ast.LtE: _op.le,
    _ast.Gt: _op.gt,
    _ast.GtE: _op.ge,
    _ast.Eq: _op.eq,
    _ast.NotEq: _op.ne,
}
_BIN_OPS = {
    _ast.Add: _op.add,
    _ast.Sub: _op.sub,
    _ast.Mult: _op.mul,
    _ast.Div: _op.truediv,
    _ast.Mod: _op.mod,
}
_NAV_FUNCS = frozenset(
    {"prev", "next", "first", "last", "abs", "like"}
)
# Running aggregates over a pattern variable's bound rows (Flink 1.15
# DEFINE surface: ``B AS AVG(B.price) <= 15``). Evaluated over the
# variable's row-position list — for the variable being defined that
# list includes the candidate row (SQL RUNNING semantics), for foreign
# variables it is their completed span union.
_AGG_FUNCS = frozenset({"avg", "sum", "min", "max", "count"})


def _like_regex(pat: str) -> str:
    """SQL LIKE pattern -> anchored regex (% = any run, _ = one)."""
    out = []
    for ch in pat:
        if ch == "%":
            out.append(".*")
        elif ch == "_":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def _sql_predicate_ast(expr: str):
    """SQL boolean expression → (python ast, stashed string literals).
    String literals are stashed before keyword rewriting so a column
    value like ``'and'`` cannot corrupt the expression."""
    lits: list[str] = []

    def stash(m: re.Match) -> str:
        lits.append(m.group(1).replace("''", "'"))
        return f" __lit{len(lits) - 1}__ "

    s = re.sub(r"'((?:[^']|'')*)'", stash, expr)
    s = s.replace("<>", "!=")
    s = re.sub(r"(?<![<>!=])=(?!=)", "==", s)
    # infix sugar rewritten to calls BEFORE the AND/OR pass (BETWEEN
    # carries its own AND). Operands are simple refs/literals — the
    # common DEFINE shapes; anything fancier parenthesizes itself.
    s = re.sub(
        r"(\w+(?:\.\w+)?|__lit\d+__)\s+NOT\s+LIKE\s+(__lit\d+__)",
        r" not LIKE(\1, \2) ",
        s,
        flags=re.IGNORECASE,
    )
    s = re.sub(
        r"(\w+(?:\.\w+)?|__lit\d+__)\s+LIKE\s+(__lit\d+__)",
        r" LIKE(\1, \2) ",
        s,
        flags=re.IGNORECASE,
    )
    s = re.sub(
        r"(\w+(?:\.\w+)?)\s+BETWEEN\s+(\w+(?:\.\w+)?|__lit\d+__|-?[\d.]+)"
        r"\s+AND\s+(\w+(?:\.\w+)?|__lit\d+__|-?[\d.]+)",
        r" ((\1 >= \2) and (\1 <= \3)) ",
        s,
        flags=re.IGNORECASE,
    )
    s = re.sub(r"\bAND\b", " and ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bOR\b", " or ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNOT\b", " not ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bIN\b", " in ", s, flags=re.IGNORECASE)
    s = re.sub(r"\bTRUE\b", "True", s, flags=re.IGNORECASE)
    s = re.sub(r"\bFALSE\b", "False", s, flags=re.IGNORECASE)
    try:
        tree = _ast.parse(s.strip(), mode="eval").body
    except SyntaxError as exc:
        raise ValueError(f"DEFINE: cannot parse {expr!r}: {exc}") from None
    return tree, lits


def _analyze_define(tree, var: str, all_vars: frozenset, expr: str):
    """Validate the node surface and decide the evaluation mode.
    Returns (needs_ctx, referenced_columns)."""
    needs_ctx = False
    cols: set[str] = set()
    varset = {v.upper() for v in all_vars}

    def walk(node):
        nonlocal needs_ctx
        if isinstance(node, _ast.Constant):
            if not isinstance(node.value, (int, float, str, bool)):
                raise ValueError(f"DEFINE {expr!r}: bad literal")
            return
        if isinstance(node, _ast.Name):
            if not re.fullmatch(r"__lit\d+__", node.id):
                cols.add(node.id)
            return
        if isinstance(node, _ast.Attribute):
            if not isinstance(node.value, _ast.Name):
                raise ValueError(f"DEFINE {expr!r}: bad qualifier")
            q = node.value.id.upper()
            if q not in varset:
                raise ValueError(
                    f"DEFINE {expr!r}: {node.value.id}.{node.attr} does "
                    "not qualify a pattern variable"
                )
            if q != var.upper():
                needs_ctx = True  # foreign-var ref resolves to its LAST row
            cols.add(node.attr)
            return
        if isinstance(node, _ast.BoolOp):
            for v in node.values:
                walk(v)
            return
        if isinstance(node, _ast.UnaryOp):
            if not isinstance(node.op, (_ast.Not, _ast.USub)):
                raise ValueError(f"DEFINE {expr!r}: unsupported operator")
            walk(node.operand)
            return
        if isinstance(node, _ast.BinOp):
            if type(node.op) not in _BIN_OPS:
                raise ValueError(f"DEFINE {expr!r}: unsupported operator")
            walk(node.left)
            walk(node.right)
            return
        if isinstance(node, _ast.Compare):
            walk(node.left)
            for cop, comp in zip(node.ops, node.comparators):
                if isinstance(cop, (_ast.In, _ast.NotIn)):
                    if not isinstance(comp, _ast.Tuple):
                        raise ValueError(
                            f"DEFINE {expr!r}: IN needs a literal list"
                        )
                    for e in comp.elts:
                        walk(e)
                elif type(cop) not in _CMP_OPS:
                    raise ValueError(f"DEFINE {expr!r}: unsupported comparison")
                else:
                    walk(comp)
            return
        if isinstance(node, _ast.Call):
            if not isinstance(node.func, _ast.Name):
                raise ValueError(f"DEFINE {expr!r}: unsupported call")
            f = node.func.id.lower()
            if f not in _NAV_FUNCS and f not in _AGG_FUNCS:
                raise ValueError(f"DEFINE {expr!r}: unknown function {f}()")
            if f in _AGG_FUNCS:
                needs_ctx = True  # aggregates see the match's bound rows
                if (
                    len(node.args) != 1
                    or node.keywords
                    or not isinstance(node.args[0], _ast.Attribute)
                ):
                    raise ValueError(
                        f"DEFINE {expr!r}: {f.upper()} needs VAR.col"
                    )
                walk(node.args[0])
                return
            if f in ("first", "last"):
                needs_ctx = True
                if not (
                    node.args and isinstance(node.args[0], _ast.Attribute)
                ):
                    raise ValueError(
                        f"DEFINE {expr!r}: {f.upper()} needs VAR.col"
                    )
            if f == "like":
                if len(node.args) != 2 or not (
                    isinstance(node.args[1], _ast.Name)
                    and re.fullmatch(r"__lit\d+__", node.args[1].id)
                ):
                    raise ValueError(
                        f"DEFINE {expr!r}: LIKE needs a string-literal "
                        "pattern"
                    )
                walk(node.args[0])
                return
            if len(node.args) > 1 and not (
                isinstance(node.args[1], _ast.Constant)
                and isinstance(node.args[1].value, int)
            ):
                raise ValueError(
                    f"DEFINE {expr!r}: {f.upper()} offset must be an "
                    "integer literal"
                )
            if node.keywords or len(node.args) not in (1, 2):
                raise ValueError(f"DEFINE {expr!r}: bad {f.upper()} call")
            walk(node.args[0])
            return
        if isinstance(node, _ast.Tuple):
            for e in node.elts:
                walk(e)
            return
        raise ValueError(
            f"DEFINE {expr!r}: unsupported syntax "
            f"({type(node).__name__})"
        )

    walk(tree)
    return needs_ctx, cols


def _vec_eval(node, pdf, lits, gkey=None):
    """Vectorized (row-local) evaluation over the whole key timeline.
    Returns a pandas Series / scalar; comparisons with shifted-in
    nulls are False, matching SQL's unknown-is-not-matched.

    ``gkey`` (a Series aligned with ``pdf``) switches PREV/NEXT to
    GROUP-AWARE shifts (``v.groupby(gkey).shift(n)`` — one C pass
    over every key at once, nulls at each key's boundary), so a
    caller holding a whole multi-key partition can evaluate the mask
    ONCE instead of per key — per-key pandas evaluation was the
    dominant cost for many-small-keys CEP."""
    import numpy as np
    import pandas as pd

    def as_bool(v):
        if isinstance(v, pd.Series):
            if v.dtype != bool:
                v = v.fillna(False).astype(bool)
            return v
        return bool(v)

    def ev(node):
        if isinstance(node, _ast.Constant):
            return node.value
        if isinstance(node, _ast.Name):
            m = re.fullmatch(r"__lit(\d+)__", node.id)
            if m:
                return lits[int(m.group(1))]
            if node.id not in pdf.columns:
                raise ValueError(f"DEFINE: unknown column {node.id!r}")
            return pdf[node.id]
        if isinstance(node, _ast.Attribute):
            # row-local mode only ever sees the variable being defined
            if node.attr not in pdf.columns:
                raise ValueError(f"DEFINE: unknown column {node.attr!r}")
            return pdf[node.attr]
        if isinstance(node, _ast.BoolOp):
            vals = [as_bool(ev(v)) for v in node.values]
            out = vals[0]
            for v in vals[1:]:
                out = out & v if isinstance(node.op, _ast.And) else out | v
            return out
        if isinstance(node, _ast.UnaryOp):
            if isinstance(node.op, _ast.Not):
                return ~as_bool(ev(node.operand))
            return -ev(node.operand)
        if isinstance(node, _ast.BinOp):
            return _BIN_OPS[type(node.op)](ev(node.left), ev(node.right))
        def not_null(x):
            if isinstance(x, pd.Series):
                return x.notna()
            return x is not None and x == x

        if isinstance(node, _ast.Compare):
            out, left = None, ev(node.left)
            for cop, comp in zip(node.ops, node.comparators):
                if isinstance(cop, (_ast.In, _ast.NotIn)):
                    vals = [ev(e) for e in comp.elts]
                    part = (
                        left.isin(vals)
                        if isinstance(left, pd.Series)
                        else left in vals
                    )
                    if isinstance(cop, _ast.NotIn):
                        part = ~part if isinstance(part, pd.Series) else not part
                    right = left
                else:
                    right = ev(comp)
                    with np.errstate(invalid="ignore"):
                        part = _CMP_OPS[type(cop)](left, right)
                # SQL null semantics: ANY comparison against NULL is
                # unknown -> False. pandas != / NOT IN would say True
                # for a null operand (the one place the engines'
                # natural semantics differ — the ctx evaluator and
                # the consistency fuzz pin this)
                part = as_bool(part) & not_null(left) & not_null(right)
                out = part if out is None else out & part
                left = right
            return out
        if isinstance(node, _ast.Call):
            f = node.func.id.lower()
            if f == "abs":
                return abs(ev(node.args[0]))
            if f == "like":
                target = ev(node.args[0])
                rx = _like_regex(ev(node.args[1]))
                if isinstance(target, pd.Series):
                    return target.astype("string").str.match(rx, na=False)
                return bool(re.match(rx, str(target)))
            v = ev(node.args[0])  # prev / next
            n = node.args[1].value if len(node.args) > 1 else 1
            if not isinstance(v, pd.Series):
                raise ValueError(
                    f"DEFINE: {f.upper()}() of a constant is meaningless"
                )
            step = n if f == "prev" else -n
            if gkey is not None:
                return v.groupby(gkey, sort=False).shift(step)
            return v.shift(step)
        raise AssertionError(f"unvalidated node {node!r}")

    return ev(node)


def _ctx_eval(node, i, pdf, spans, var, lits, arrs=None):
    """Per-row (match-relative) evaluation at row ``i`` given the
    variable spans bound so far. Null/None/NaN operands make
    comparisons False and arithmetic None (SQL unknown).

    ``arrs`` is an optional per-GROUP numpy column cache (dict the
    caller keeps across rows): pandas ``.iat`` scalar access was the
    profiled hot path (r10 — frame.__getitem__ chains dominated the
    SUBSET-union query), one ``to_numpy()`` per referenced column
    amortizes it away."""
    n = len(pdf)

    def isnull(v):
        return v is None or (isinstance(v, float) and v != v)

    if arrs is None:
        arrs = {}

    def colval(col, at):
        if at is None or at < 0 or at >= n:
            return None
        arr = arrs.get(col)
        if arr is None:
            arr = arrs[col] = pdf[col].to_numpy()
        v = arr[at]
        return None if isnull(v) else v

    def ev(node, at):
        if isinstance(node, _ast.Constant):
            return node.value
        if isinstance(node, _ast.Name):
            m = re.fullmatch(r"__lit(\d+)__", node.id)
            if m:
                return lits[int(m.group(1))]
            if node.id not in pdf.columns:
                raise ValueError(f"DEFINE: unknown column {node.id!r}")
            return colval(node.id, at)
        if isinstance(node, _ast.Attribute):
            q = node.value.id.upper()
            if node.attr not in pdf.columns:
                raise ValueError(f"DEFINE: unknown column {node.attr!r}")
            if q == var.upper():
                return colval(node.attr, at)
            span = spans.get(q)
            # Flink: a bare foreign-variable reference = its LAST row
            return colval(node.attr, span[-1]) if span else None
        if isinstance(node, _ast.BoolOp):
            if isinstance(node.op, _ast.And):
                return all(bool(ev(v, at)) for v in node.values)
            return any(bool(ev(v, at)) for v in node.values)
        if isinstance(node, _ast.UnaryOp):
            v = ev(node.operand, at)
            if isinstance(node.op, _ast.Not):
                return not bool(v)
            return None if isnull(v) else -v
        if isinstance(node, _ast.BinOp):
            l, r = ev(node.left, at), ev(node.right, at)
            if isnull(l) or isnull(r):
                return None
            return _BIN_OPS[type(node.op)](l, r)
        if isinstance(node, _ast.Compare):
            left = ev(node.left, at)
            for cop, comp in zip(node.ops, node.comparators):
                if isinstance(cop, (_ast.In, _ast.NotIn)):
                    vals = [ev(e, at) for e in comp.elts]
                    if isnull(left):
                        return False  # NULL [NOT] IN (...) is unknown
                    hit = left in vals
                    ok = (not hit) if isinstance(cop, _ast.NotIn) else hit
                    right = left
                else:
                    right = ev(comp, at)
                    if isnull(left) or isnull(right):
                        return False
                    ok = _CMP_OPS[type(cop)](left, right)
                if not ok:
                    return False
                left = right
            return True
        if isinstance(node, _ast.Call):
            f = node.func.id.lower()
            if f == "abs":
                v = ev(node.args[0], at)
                return None if isnull(v) else abs(v)
            if f == "like":
                v = ev(node.args[0], at)
                if isnull(v):
                    return False
                return bool(re.match(_like_regex(ev(node.args[1], at)), str(v)))
            if f in _AGG_FUNCS:
                # running aggregate over the variable's bound rows (the
                # defining variable's list includes the candidate row);
                # SQL semantics: nulls ignored, COUNT counts non-null,
                # empty -> NULL (COUNT -> 0)
                attr = node.args[0]
                q = attr.value.id.upper()
                vals = [
                    v
                    for p in spans.get(q, ())
                    if (v := colval(attr.attr, p)) is not None
                ]
                if f == "count":
                    return len(vals)
                if not vals:
                    return None
                if f == "sum":
                    return sum(vals)
                if f == "avg":
                    return sum(vals) / len(vals)
                return min(vals) if f == "min" else max(vals)
            # prev/next/first/last: optional integer-literal offset
            off = node.args[1].value if len(node.args) > 1 else None
            if f in ("prev", "next"):
                step = off if off is not None else 1
                if at is None:
                    return None
                return ev(
                    node.args[0], at - step if f == "prev" else at + step
                )
            # FIRST/LAST(V.col[, off]) over the variable's bound rows
            # (the union across all pattern tokens sharing the name —
            # offsets step through THAT row list, not the raw timeline)
            attr = node.args[0]
            q = attr.value.id.upper()
            span = spans.get(q)
            if span is None:
                return None
            o = off or 0
            if o >= len(span):
                return None
            idx = span[o] if f == "first" else span[len(span) - 1 - o]
            return colval(attr.attr, idx)
        raise AssertionError(f"unvalidated node {node!r}")

    return ev(node, i)


def compile_define(
    expr: str,
    var: str,
    all_vars: Sequence[str],
    subset: dict[str, Sequence[str]] | None = None,
) -> tuple[str, object, frozenset]:
    """Compile one DEFINE clause. Returns ``(kind, compiled, cols)``:
    ``("mask", fn)`` with ``fn(pdf) -> np.bool_[n]`` for row-local
    predicates, or ``("ctx", maker)`` with ``maker(pdf, tok_var) ->
    fn(i, bound, run_start) -> bool`` for match-relative ones.

    ``subset`` maps SQL:2016 SUBSET union names to their member
    variables: a reference to the union name (``FIRST(U.col)``,
    ``AVG(U.price)``) resolves against the merged row list of every
    member bound so far. Union names participate in ``all_vars`` for
    qualifier validation.

    Null semantics: a comparison whose operand is NULL/NaN (e.g.
    ``PREV(value)`` before the first row) is FALSE, matching SQL's
    unknown-is-not-matched at the predicate level. The collapse to
    two-valued logic happens AT THE COMPARISON, so ``NOT (a < b)``
    over a null operand evaluates TRUE here where strict tri-valued
    SQL keeps it unknown→false — the one documented divergence;
    write the positive comparison (``a >= b``) when nulls matter.
    ``IS [NOT] NULL`` is not part of the grammar."""
    import numpy as np

    tree, lits = _sql_predicate_ast(expr)
    needs_ctx, cols = _analyze_define(
        tree, var, frozenset(all_vars), expr
    )
    if not needs_ctx:

        def mask_fn(pdf, gkey=None):
            v = _vec_eval(tree, pdf, lits, gkey=gkey)
            if hasattr(v, "to_numpy"):
                if v.dtype != bool:
                    v = v.fillna(False).astype(bool)
                return v.to_numpy()
            return np.full(len(pdf), bool(v))

        return "mask", mask_fn, frozenset(cols)

    # r10 perf (the cep_subset_union A/B watch item): split a
    # top-level AND into row-local conjuncts — vectorized ONCE per
    # group, exactly like a pure mask DEFINE — and the genuinely
    # match-relative rest. In descent/ascent shapes most candidate
    # rows fail the cheap local conjunct (e.g. ``cents >
    # PREV(cents)``), and rejecting them BEFORE building spans and
    # walking the ctx tree removes the profiled per-row cost. AND is
    # commutative here: every conjunct collapses null to False at
    # the comparison, so evaluation order cannot change the result.
    local_tree = ctx_tree = None
    if isinstance(tree, _ast.BoolOp) and isinstance(tree.op, _ast.And):
        local_parts, ctx_parts = [], []
        for sub in tree.values:
            sub_ctx, _ = _analyze_define(
                sub, var, frozenset(all_vars), expr
            )
            (ctx_parts if sub_ctx else local_parts).append(sub)
        if local_parts and ctx_parts:
            local_tree = (
                local_parts[0]
                if len(local_parts) == 1
                else _ast.BoolOp(op=_ast.And(), values=local_parts)
            )
            ctx_tree = (
                ctx_parts[0]
                if len(ctx_parts) == 1
                else _ast.BoolOp(op=_ast.And(), values=ctx_parts)
            )
    if ctx_tree is None:
        ctx_tree = tree

    def maker(pdf, tok_var):
        lmask = None
        if local_tree is not None:
            lv = _vec_eval(local_tree, pdf, lits)
            lmask = (
                lv.fillna(False).astype(bool).to_numpy()
                if hasattr(lv, "to_numpy")
                else np.full(len(pdf), bool(lv))
            )
        arrs: dict = {}  # per-group numpy column cache for _ctx_eval

        def fn(i, bound, run_start):
            if lmask is not None and not lmask[i]:
                return False
            # positions are UNIONED per variable name, not overwritten:
            # PATTERN (A B A) binds A via two tokens, and Flink resolves
            # FIRST(A.col)/LAST(A.col) against all rows mapped to A.
            # ``bound`` is in token order with ascending row positions
            # and excludes the current token's run, so extending keeps
            # each list sorted.
            spans: dict[str, list[int]] = {}
            for bti, bpos, btake in bound:
                if btake > 0 and tok_var.get(bti):
                    spans.setdefault(tok_var[bti].upper(), []).extend(
                        range(bpos, bpos + btake)
                    )
            spans.setdefault(var.upper(), []).extend(
                range(run_start, i + 1)
            )
            for u, members in (subset or {}).items():
                pos = sorted(
                    p
                    for mvar in members
                    for p in spans.get(mvar.upper(), ())
                )
                if pos:
                    spans[u.upper()] = pos
            v = _ctx_eval(ctx_tree, i, pdf, spans, var, lits, arrs)
            return bool(v) if v is not None else False

        return fn

    return "ctx", maker, frozenset(cols)


def pattern_match_define(
    df: DataFrame,
    key_col: str,
    time_col: str,
    order_tiebreak: str,
    pattern: Sequence[str],
    define: dict[str, str],
    within_seconds: int | None = None,
    after_match: str | tuple[str, Sequence[int]] = "past_last_row",
    measures: Sequence[tuple] | None = None,
    rows_per_match: str = "one",
    subset: dict[str, Sequence[str]] | None = None,
) -> DataFrame:
    """MATCH_RECOGNIZE whose pattern variables are DEFINEd by boolean
    expressions over row values (Flink 1.15's DEFINE surface) instead
    of type literals — ``pattern`` lists VARIABLE names with
    quantifiers (``["STRT", "DOWN+", "UP+"]``, alternation
    ``"(A|B)+"`` allowed), ``define`` maps variables to SQL
    predicates, e.g. the canonical V-shape::

        define={"DOWN": "value < PREV(value)",
                "UP":   "value > PREV(value)"}

    Variables without a DEFINE entry match any row (Flink's undefined
    = TRUE). PREV/NEXT navigate the key's input timeline (not the
    variable's rows — Flink semantics); FIRST/LAST(V.col[, off]) and
    foreign ``V.col`` references resolve against the rows the match
    has bound so far (own span includes the candidate row). Output
    schema and after_match/measures semantics are identical to
    :func:`pattern_match_quantified`; PERMUTE elements are not
    supported here (their bijection test needs literal types).

    Scale: identical to the quantified matcher — ONE key shuffle into
    applyInPandas; row-local predicates become one vectorized mask
    per key group (numpy inner loop), only genuinely match-relative
    clauses fall back to per-row closures."""
    toks = parse_pattern(pattern)
    var_names: list[str] = []
    for et, _, _, _ in toks:
        if isinstance(et, tuple) and et[0] == "perm":
            raise ValueError(
                "pattern_match_define: PERMUTE needs literal type "
                "DEFINEs — use pattern_match_quantified"
            )
        var_names.extend([et] if isinstance(et, str) else sorted(et))
    unknown = set(define) - set(var_names)
    if unknown:
        raise ValueError(
            f"DEFINE names absent from the pattern: {sorted(unknown)}"
        )
    subset = {u.upper(): list(ms) for u, ms in (subset or {}).items()}
    vset = {v.upper() for v in var_names}
    for u, members in subset.items():
        if u in vset:
            raise ValueError(
                f"SUBSET name {u} collides with a pattern variable"
            )
        bad = [m for m in members if m.upper() not in vset]
        if bad or not members:
            raise ValueError(
                f"SUBSET {u}: members must be pattern variables "
                f"(bad: {bad})"
            )
    all_scope = var_names + sorted(subset)
    compiled = {
        v: compile_define(e, v, all_scope, subset=subset)
        for v, e in define.items()
    }
    extra_cols = sorted(
        set().union(*(c for _, _, c in compiled.values())) if compiled else ()
    )
    missing = set(extra_cols) - set(df.columns)
    if missing:
        raise ValueError(f"DEFINE references unknown columns {sorted(missing)}")
    # token index -> variable name (None for alternations, whose rows
    # belong to the group, not a single variable)
    tok_var = {
        ti: et if isinstance(et, str) else None
        for ti, (et, _, _, _) in enumerate(toks)
    }

    def prepare(whole):
        # DEFINE masks for the WHOLE partition in one vectorized pass:
        # PREV/NEXT become group-aware shifts keyed on the partition
        # column, so key boundaries still read as nulls — identical
        # semantics to per-key evaluation at a fraction of the pandas
        # overhead when keys are many and small
        gk = whole[key_col]
        for v, (kind, f, _) in compiled.items():
            if kind == "mask":
                whole[f"_cep_m_{v}"] = f(whole, gkey=gk)
        return whole

    def bind_toks(pdf):
        import numpy as np

        masks: dict[str, object] = {}
        ctx: dict[str, object] = {}
        for v in var_names:
            if v not in compiled:
                masks[v] = np.ones(len(pdf), dtype=bool)
                continue
            kind, f, _ = compiled[v]
            if kind == "mask":
                col = f"_cep_m_{v}"
                masks[v] = (
                    pdf[col].to_numpy()
                    if col in pdf.columns
                    else f(pdf)  # unprepared caller (direct use)
                )
            else:
                ctx[v] = f(pdf, tok_var)
        bound = []
        for et, lo, hi, greedy in toks:
            if isinstance(et, frozenset):
                members = sorted(et)
                if any(m in ctx for m in members):
                    raise ValueError(
                        "alternation members must be row-local "
                        "predicates (no FIRST/LAST/foreign refs)"
                    )
                m = masks[members[0]].copy()
                for v in members[1:]:
                    m |= masks[v]
                bound.append((("mask", m), lo, hi, greedy))
            elif et in ctx:
                bound.append((("ctx", ctx[et]), lo, hi, greedy))
            else:
                bound.append((("mask", masks[et]), lo, hi, greedy))
        return None, bound

    return _grouped_match(
        df,
        key_col,
        time_col,
        order_tiebreak,
        extra_cols,
        toks,
        bind_toks,
        within_seconds,
        after_match,
        measures,
        rows_per_match=rows_per_match,
        tok_names=[_tok_name(et) for et, _, _, _ in toks],
        prepare=prepare,
    )


def analyze_navigation(expr: str) -> tuple[int, int]:
    """(max PREV offset, max NEXT offset) for one DEFINE expression —
    the streaming flavor keeps ``max_prev`` context rows ahead of the
    provisional tail so a kept row's PREV still sees its true
    predecessor, and holds back the last ``max_next`` rows from
    finalization (a tail row's NEXT is unknowable until more data
    arrives; deciding on it would break emit-once)."""
    tree, _ = _sql_predicate_ast(expr)
    max_prev, max_next = 0, 0

    def walk(node):
        nonlocal max_prev, max_next
        if isinstance(node, _ast.Call) and isinstance(node.func, _ast.Name):
            f = node.func.id.lower()
            if f in ("prev", "next"):
                off = (
                    node.args[1].value
                    if len(node.args) > 1
                    and isinstance(node.args[1], _ast.Constant)
                    else 1
                )
                if f == "prev":
                    max_prev = max(max_prev, int(off))
                else:
                    max_next = max(max_next, int(off))
        for child in _ast.iter_child_nodes(node):
            walk(child)

    walk(tree)
    return max_prev, max_next
