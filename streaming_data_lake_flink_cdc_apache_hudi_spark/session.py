"""EngineSession — the user-facing facade (≙ the Zeppelin notebook
role in the reference: one handle that configures the environment,
resolves tables, and runs SQL / named queries; SURVEY.md §3).

A user of the reference works through notebook paragraphs: env config
(¶3/¶5), CREATE TABLE registrations (¶7, ¶24, ...), %flink.ssql
queries (¶49/¶53), and Athena query-back. Here the same workflow is:

    eng = EngineSession()                      # env config (E1-E4)
    eng.register_testdata("/root/testdata/sf0.01")
    eng.sql("SELECT ... FROM customer JOIN orders ...")   # ssql ≙ sql
    eng.query("ticket_view")                   # named flagship query
    t = eng.create_upsert_table("view1", path, key=["k"])  # ≙ Hudi DDL
    t.write(delta); t.snapshot()               # sink + query-back
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from .catalog import TableRegistry
from .config import EngineConfig
from .plans.queries import QUERIES
from .sources.parquet import TPCH_TABLES, load_table
from .streaming.upsert_sink import UpsertLakeTable


def _extract_simple_conjuncts(where: str) -> list[tuple]:
    """Top-level AND conjuncts of a WHERE text in the simple shapes
    ``col <op> literal`` (number / 'string' / TRUE / FALSE) and
    ``col IS [NOT] NULL``, as ``filestats`` predicate tuples. The
    split is quote- and paren-aware; anything that doesn't parse is
    skipped — pruning on a SUBSET of conjuncts is always sound."""
    import re

    parts: list[str] = []
    depth, buf, i, in_q = 0, [], 0, False
    up = where.upper()
    while i < len(where):
        ch = where[i]
        if in_q:
            buf.append(ch)
            if ch == "'":
                if i + 1 < len(where) and where[i + 1] == "'":
                    buf.append("'")
                    i += 1
                else:
                    in_q = False
        elif ch == "'":
            in_q = True
            buf.append(ch)
        elif ch == "(":
            depth += 1
            buf.append(ch)
        elif ch == ")":
            depth -= 1
            buf.append(ch)
        elif (
            depth == 0
            and up.startswith("AND", i)
            and (
                i == 0
                or not (where[i - 1].isalnum() or where[i - 1] == "_")
            )
            and (
                i + 3 >= len(where)
                or not (
                    where[i + 3].isalnum() or where[i + 3] == "_"
                )
            )
        ):
            parts.append("".join(buf))
            buf = []
            i += 2
        else:
            buf.append(ch)
        i += 1
    parts.append("".join(buf))
    out: list[tuple] = []
    for p in parts:
        p = p.strip()
        m = re.fullmatch(
            r"`?(\w+)`?\s*(=|!=|<>|<=|>=|<|>)\s*"
            r"(-?\d+\.\d+|-?\d+|'(?:[^']|'')*'|TRUE|FALSE)",
            p,
            re.IGNORECASE,
        )
        if m:
            col, op, lit = m.group(1), m.group(2), m.group(3)
            op = {"=": "==", "<>": "!="}.get(op, op)
            if lit.upper() in ("TRUE", "FALSE"):
                val: object = lit.upper() == "TRUE"
            elif lit.startswith("'"):
                val = lit[1:-1].replace("''", "'")
            elif "." in lit:
                val = float(lit)
            else:
                val = int(lit)
            out.append((col, op, val))
            continue
        m = re.fullmatch(
            r"`?(\w+)`?\s+IS\s+(NOT\s+)?NULL", p, re.IGNORECASE
        )
        if m:
            out.append(
                (m.group(1), "not_null" if m.group(2) else "is_null", None)
            )
    return out


class EngineSession:
    def __init__(
        self,
        config: EngineConfig | None = None,
        spark: SparkSession | None = None,
        registry_path: str | None = None,
    ):
        self.config = config or EngineConfig()
        self.spark = spark or self.config.session()
        self.registry = TableRegistry(
            self.spark,
            registry_path
            or os.path.join(os.getcwd(), ".engine", "tables.json"),
        )
        try:
            # format("cdcfeed") available on every engine session
            from .sources.datasource import register_cdcfeed_source

            register_cdcfeed_source(self.spark)
        except Exception:
            pass  # Python DataSource API absent (older Spark) — helpers remain

    # -- table management (≙ S6-S8) -----------------------------------------

    def register_testdata(self, sf_dir: str) -> list[str]:
        """Register the driver's parquet tables as queryable views."""
        for name in TPCH_TABLES:
            load_table(self.spark, sf_dir, name).createOrReplaceTempView(name)
        return list(TPCH_TABLES)

    def create_upsert_table(
        self, name: str, path: str, key: list[str], **options
    ) -> UpsertLakeTable:
        self.registry.create_table(
            name, "upsert", path, key=key, if_not_exists=True, **options
        )
        return self.registry.upsert_handle(name)

    def table(
        self,
        name: str,
        query_type: str = "snapshot",
        as_of_seq: int | None = None,
        since_seq: int | None = None,
    ) -> DataFrame:
        """Read a registered table. For upsert (lake) tables the full
        Hudi query-type surface applies: ``snapshot`` (default,
        optionally ``as_of_seq`` = time travel), ``incremental`` /
        ``cdc`` (require ``since_seq``), ``read_optimized``."""
        if query_type == "snapshot" and as_of_seq is None and since_seq is None:
            return self.registry.resolve(name)
        h = self.registry.upsert_handle(name)
        if query_type == "snapshot":
            return h.snapshot(as_of_seq=as_of_seq)
        if query_type == "incremental":
            return h.incremental(since_seq=since_seq)
        if query_type == "cdc":
            return h.changes(since_seq=since_seq)
        if query_type == "read_optimized":
            return h.read_optimized()
        raise ValueError(f"unknown query_type {query_type!r}")

    def drop_table(self, name: str) -> None:
        self.registry.drop_table(name)

    # -- query entry points (≙ A: %flink.ssql, D: Athena) -------------------

    def sql(self, statement: str) -> DataFrame:
        """SQL entry point (≙ %flink.ssql). Engine-table DDL strings —
        CREATE TABLE ... WITH ('connector' = ...) / USING upsert
        OPTIONS(...) and DROP TABLE — are routed into the registry so
        the notebook's paste-DDL workflow (¶7/¶24) works verbatim;
        ``<upsert-table> VERSION AS OF n`` (Spark's time-travel
        spelling) binds the point-in-time snapshot; ``SELECT``s
        referencing ``delta.`/p```/``iceberg.`/p```/``hudi.`/p```/
        ``uniform.`/p``` path tables mount through the interop
        readers with automatic metadata file skipping (new r13 —
        see :meth:`_execute_format_select`); everything else goes to
        spark.sql."""
        handled = self.registry.execute_ddl(statement)
        if handled is not None:
            return handled
        fs = self._execute_format_select(statement)
        if fs is not None:
            return fs
        mr = self._execute_match_recognize(statement)
        if mr is not None:
            return mr
        statement = self._rewrite_window_tvf(statement)
        return self.spark.sql(self._rewrite_time_travel(statement))

    def _execute_format_select(self, statement: str) -> DataFrame | None:
        """SELECT over format-path tables (new r13) — the query-side
        twin of the DML routing: ``SELECT ... FROM
        delta.`/p`|iceberg.`/p`|hudi.`/p`|uniform.`/p`` mounts each
        referenced table through the interop readers (UniForm via its
        Delta leg) and runs the statement unchanged, so joins between
        lake formats and engine tables just work — Spark-SQL's own
        path-table spelling.

        Single-table statements get AUTOMATIC metadata file skipping:
        the WHERE clause's top-level AND conjuncts of the simple
        shapes ``col <op> literal`` / ``col IS [NOT] NULL`` are
        extracted and passed to the reader's stats pruning
        (``add.stats`` / manifest bounds / Hudi bucket+col_stats).
        Extraction is SOUND by construction: pruning on a SUBSET of
        conjuncts only keeps more files, and the full WHERE still
        evaluates on the mounted scan — unparseable conjuncts, ORs,
        and subqueries simply contribute no pruning. Returns None
        for statements without a format-path reference."""
        import re

        if not re.match(r"^\s*(SELECT|WITH)\b", statement, re.IGNORECASE):
            return None
        pat = re.compile(
            r"\b(delta|iceberg|hudi|uniform)\s*\.\s*`([^`]+)`",
            re.IGNORECASE,
        )
        refs = list(pat.finditer(statement))
        if not refs:
            return None
        distinct = sorted(
            {(m.group(1).lower(), m.group(2)) for m in refs}
        )
        preds = None
        if len(distinct) == 1 and statement.upper().count("SELECT") == 1:
            wm = re.search(
                r"\bWHERE\b(.*?)(?:\bGROUP\s+BY\b|\bORDER\s+BY\b"
                r"|\bLIMIT\b|\bHAVING\b|;|$)",
                statement,
                re.IGNORECASE | re.DOTALL,
            )
            if wm:
                preds = _extract_simple_conjuncts(wm.group(1)) or None
        views: dict[tuple[str, str], str] = {}
        for i, (fmt, path) in enumerate(distinct):
            df = self._mount_format_path(fmt, path, preds)
            name = f"_fmt_path_{i}"
            df.createOrReplaceTempView(name)
            views[(fmt, path)] = name
        rewritten = pat.sub(
            lambda m: views[(m.group(1).lower(), m.group(2))], statement
        )
        return self.spark.sql(self._rewrite_time_travel(rewritten))

    def _mount_format_path(
        self, fmt: str, path: str, preds
    ) -> DataFrame:
        if fmt == "delta" or fmt == "uniform":
            from .sources.delta_interop import (
                read_delta,
                read_delta_pruned,
            )

            if preds:
                return read_delta_pruned(self.spark, path, preds)
            return read_delta(self.spark, path)
        if fmt == "iceberg":
            from .sources.iceberg_interop import read_iceberg

            return read_iceberg(self.spark, path, bounds_filter=preds)
        from .sources.hudi_interop import read_hudi

        return read_hudi(self.spark, path, bounds_filter=preds)

    def _execute_match_recognize(self, statement: str) -> DataFrame | None:
        """Flink SQL's MATCH_RECOGNIZE spelling, routed to the greedy
        CEP matcher (``operators/cep.py``) — restricted to its
        relational core:

          SELECT * FROM t MATCH_RECOGNIZE (
            PARTITION BY k  ORDER BY ts [, tiebreak]
            ONE ROW PER MATCH | ALL ROWS PER MATCH
            AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
                             | SKIP TO FIRST v | SKIP TO LAST v
            PATTERN (A B+ (C|D)? PERMUTE(E, F) G*?)
                                   [WITHIN INTERVAL 'n' MINUTES]
            DEFINE A AS [A.]type_col = 'lit', B AS ... )

        ALL ROWS PER MATCH (SQL:2016; Flink rejects it) emits every
        consumed input row with its original columns plus
        ``match_no`` (MATCH_NUMBER()) and ``classifier``
        (CLASSIFIER()), then any MEASURES columns — RUNNING
        semantics by default (the aggregate over the match's rows up
        to and including the emitted row), ``FINAL agg(...)`` for
        the whole-match value on every row. Under ONE ROW PER MATCH
        the two coincide and both prefixes are accepted.

        Quantifiers may be greedy (``+ * ?``) or reluctant
        (``+? *? ??``). MEASURES are supported as per-variable
        aggregates — ``FIRST(V.col)`` / ``LAST(V.col)`` /
        ``COUNT(V.*)`` / ``SUM|MIN|MAX|AVG(V.col)`` / bare ``V.col``
        (= FIRST) — plus the whole-match (unqualified) forms
        ``COUNT(*)`` / ``SUM|MIN|MAX|AVG|FIRST|LAST(col)`` and
        ``MATCH_NUMBER()``, each ``AS name`` — appended after the
        operator's canonical output (key, start_<tiebreak>,
        start_ts, end_ts, n_rows). ``SUBSET U = (A, B)`` (SQL:2016;
        Flink rejects it) declares union variables usable in
        MEASURES (``AVG(U.col)`` aggregates over every row bound to
        any member) and in DEFINE (``FIRST(U.col)``/``AVG(U.col)``
        resolve against the members' merged rows-so-far).

        Over a STREAMING temp view the same spelling routes to the
        cross-micro-batch matchers (``streaming/stateful.py`` —
        emit-once finalized matches; ONE ROW and ALL ROWS PER MATCH
        with true RUNNING/FINAL measures, and PERMUTE with MEASURES,
        all route there too with batch parity across micro-batch
        boundaries), matching Flink, whose MATCH_RECOGNIZE is a
        streaming operator.

        DEFINE takes two shapes. When EVERY clause is an equality of
        the SAME column against a string literal (the
        funnel/escalation shape), the literal matcher runs and the
        full pattern surface above applies. Otherwise each clause may
        be an arbitrary boolean predicate over row values — Flink
        1.15's DEFINE surface: comparisons, AND/OR/NOT, arithmetic,
        ``IN (...)``, ``PREV/NEXT(col[, n])`` over the key's
        timeline, ``FIRST/LAST(V.col[, off])`` over a bound
        variable's rows, e.g. the canonical V-shape ``PRICE_DOWN AS
        PRICE_DOWN.price < PREV(PRICE_DOWN.price)`` — routed to
        ``pattern_match_define``; pattern variables WITHOUT a DEFINE
        match any row (Flink's undefined-is-TRUE), and PERMUTE
        elements are literal-shape only. Returns None when the
        statement has no MATCH_RECOGNIZE."""
        import re

        if not re.search(r"\bMATCH_RECOGNIZE\b", statement, re.IGNORECASE):
            return None
        m = re.match(
            r"^\s*SELECT\s+(.*?)\s+FROM\s+`?(\w+)`?\s+MATCH_RECOGNIZE\s*"
            r"\(\s*(.*)\)\s*;?\s*$",
            statement.strip(),
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(
                "MATCH_RECOGNIZE: only `SELECT * FROM <table> "
                "MATCH_RECOGNIZE (...)` is supported"
            )
        if m.group(1).strip() != "*":
            raise ValueError(
                "MATCH_RECOGNIZE: use SELECT * — the operator emits "
                "(key, start_<tiebreak>, start_ts, end_ts, n_rows) "
                "plus each MEASURES ... AS name column (or the input "
                "columns + match_no/classifier under ALL ROWS PER "
                "MATCH); project with an outer SELECT if needed"
            )
        tbl, body = m.group(2), m.group(3)
        measures_m = re.search(
            r"\bMEASURES\s+(.*?)\s+"
            r"(?=ONE\s+ROW|ALL\s+ROWS|AFTER\s+MATCH|PATTERN\s*\()",
            body,
            re.IGNORECASE | re.DOTALL,
        )

        def grab(pattern, required=True, flags=0):
            g = re.search(pattern, body, re.IGNORECASE | flags)
            if g is None and required:
                raise ValueError(
                    f"MATCH_RECOGNIZE: missing clause {pattern!r}"
                )
            return g

        part = grab(r"PARTITION\s+BY\s+`?(\w+)`?").group(1)
        order = grab(
            r"ORDER\s+BY\s+`?(\w+)`?(?:\s*,\s*`?(\w+)`?)?"
        )
        ts_col, tiebreak = order.group(1), order.group(2) or order.group(1)
        rpm = grab(r"(ONE\s+ROW|ALL\s+ROWS)\s+PER\s+MATCH", required=False)
        if rpm is None:
            raise ValueError(
                "MATCH_RECOGNIZE: specify ONE ROW PER MATCH or ALL "
                "ROWS PER MATCH"
            )
        rows_per_match = (
            "all" if rpm.group(1).upper().startswith("ALL") else "one"
        )
        skip = grab(
            r"AFTER\s+MATCH\s+SKIP\s+(PAST\s+LAST\s+ROW|TO\s+NEXT\s+ROW"
            r"|TO\s+(FIRST|LAST)\s+(?!ROW\b)(\w+))",
            required=False,
        )
        skip_to_var: tuple[str, str] | None = None
        if skip and skip.group(2):
            skip_to_var = (skip.group(2).lower(), skip.group(3).upper())
            after: str | tuple = "past_last_row"  # rebound below
        else:
            after = (
                "next_row"
                if skip and skip.group(1).upper().startswith("TO")
                else "past_last_row"
            )
        # one nesting level for (A|B) / PERMUTE(A, B) elements
        pat = grab(
            r"PATTERN\s*\(\s*((?:[^()]|\([^()]*\))*)\)"
        ).group(1)
        within = grab(
            r"WITHIN\s+INTERVAL\s+'(\d+)'\s+(\w+)", required=False
        )
        within_seconds = None
        if within:
            unit = within.group(2).lower().rstrip("s")
            mult = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}
            if unit not in mult:
                raise ValueError(f"WITHIN: unsupported unit {within.group(2)!r}")
            within_seconds = int(within.group(1)) * mult[unit]
        subset_m = re.search(
            r"\bSUBSET\s+(.*?)\s+(?=DEFINE\b)", body, re.IGNORECASE | re.DOTALL
        )
        subset: dict[str, list[str]] = {}
        if subset_m:
            for clause in re.split(r",\s*(?=\w+\s*=)", subset_m.group(1)):
                sm = re.match(
                    r"^\s*(\w+)\s*=\s*\(\s*(\w+(?:\s*,\s*\w+)*)\s*\)\s*$",
                    clause.strip(),
                )
                if not sm:
                    raise ValueError(
                        f"MATCH_RECOGNIZE SUBSET: cannot parse "
                        f"{clause.strip()!r} — expected U = (A, B)"
                    )
                subset[sm.group(1).upper()] = [
                    v.strip().upper() for v in sm.group(2).split(",")
                ]
        define = grab(r"DEFINE\s+(.*)$", flags=re.DOTALL).group(1)
        raw_defs: dict[str, str] = {}
        for clause in re.split(
            r",\s*(?=\w+\s+AS\s)", define, flags=re.IGNORECASE
        ):
            cm = re.match(
                r"^\s*(\w+)\s+AS\s+(.+?)\s*$", clause.strip(), re.DOTALL
            )
            if not cm:
                raise ValueError(
                    f"MATCH_RECOGNIZE DEFINE: cannot parse "
                    f"{clause.strip()!r}"
                )
            raw_defs[cm.group(1).upper()] = cm.group(2)
        # literal shape: EVERY clause is `[VAR.]col = 'literal'` on one
        # shared column; anything else routes to the predicate matcher
        type_col = None
        var_types: dict[str, str] = {}
        for var, rhs in raw_defs.items():
            dm = re.match(r"^(?:\w+\.)?`?(\w+)`?\s*=\s*'([^']*)'$", rhs)
            if not dm or (type_col is not None and dm.group(1) != type_col):
                var_types = {}
                break
            type_col = dm.group(1)
            var_types[var] = dm.group(2)
        literal_mode = bool(var_types) and len(var_types) == len(raw_defs)
        # pattern elements: VAR, (A|B), or PERMUTE(A, B) — each with an
        # optional greedy/reluctant quantifier. PERMUTE expands to one
        # token per member, so var_tokens indexes the EXPANDED list.
        elem_re = re.compile(
            r"(PERMUTE\s*\([^)]*\)|\(\s*\w+(?:\s*\|\s*\w+)*\s*\)|\w+)"
            r"\s*([+*?]{0,2})\s*",
            re.IGNORECASE,
        )
        covered, elems = 0, []
        for em in elem_re.finditer(pat):
            if pat[covered : em.start()].strip():
                break
            q = em.group(2)
            if q not in ("", "+", "*", "?", "+?", "*?", "??"):
                # [+*?]{0,2} also matches '++'/'*+'/'?*' — without this
                # guard an invalid quantifier would be stripped and the
                # remainder ('A+') treated as a never-matching VARIABLE
                raise ValueError(
                    f"MATCH_RECOGNIZE: invalid quantifier {q!r} on "
                    f"pattern element {em.group(1)!r}"
                )
            covered = em.end()
            elems.append((em.group(1), q))
        if pat[covered:].strip() or not elems:
            raise ValueError(f"MATCH_RECOGNIZE: cannot parse PATTERN ({pat})")
        pattern = []
        var_tokens: dict[str, list[int]] = {}
        ti = 0

        def resolve(var: str) -> str:
            if literal_mode:
                if var not in var_types:
                    raise ValueError(
                        f"MATCH_RECOGNIZE: pattern variable {var} has "
                        "no DEFINE clause (wildcards need the "
                        "predicate DEFINE shape)"
                    )
                return var_types[var]
            return var

        pattern_vars: list[str] = []  # variable-name spelling (for
        # the streaming MEASURES route, which runs DEFINE predicates)
        for core, quant in elems:
            pm = re.match(r"^PERMUTE\s*\(\s*(.*?)\s*\)$", core, re.IGNORECASE)
            if pm:
                if not literal_mode:
                    raise ValueError(
                        "MATCH_RECOGNIZE: PERMUTE requires the literal "
                        "`col = 'lit'` DEFINE shape"
                    )
                members = [v.strip().upper() for v in pm.group(1).split(",")]
                for v in members:
                    var_tokens.setdefault(v, []).append(ti)
                    ti += 1
                pattern.append(
                    "permute(" + ",".join(resolve(v) for v in members) + ")"
                    + quant
                )
                # the variable-name spelling keeps the RESOLVED types:
                # perm members match the type column directly (the
                # streaming DEFINE matcher tests them against
                # type_col, not against DEFINE masks)
                pattern_vars.append(pattern[-1])
                continue
            am = re.match(r"^\(\s*(.*?)\s*\)$", core)
            if am:
                members = [
                    v.strip().upper() for v in am.group(1).split("|")
                ]
                for v in members:
                    var_tokens.setdefault(v, []).append(ti)
                ti += 1
                pattern.append(
                    "(" + "|".join(resolve(v) for v in members) + ")" + quant
                )
                pattern_vars.append("(" + "|".join(members) + ")" + quant)
                continue
            var = core.upper()
            var_tokens.setdefault(var, []).append(ti)
            ti += 1
            pattern.append(resolve(var) + quant)
            pattern_vars.append(var + quant)
        if skip_to_var is not None:
            mode, svar = skip_to_var
            if svar not in var_tokens:
                raise ValueError(
                    f"AFTER MATCH SKIP TO {mode.upper()}: unknown "
                    f"pattern variable {svar}"
                )
            after = (f"to_{mode}", var_tokens[svar])
        measures = []
        # SQL:2016 default: RUNNING under ALL ROWS PER MATCH, FINAL
        # under ONE ROW PER MATCH (where the two coincide anyway)
        default_mode = "running" if rows_per_match == "all" else "final"
        if measures_m:
            for clause in re.split(
                r",\s*(?=(?:(?:RUNNING|FINAL)\s+)?\w+\s*\()"
                r"|,\s*(?=(?:(?:RUNNING|FINAL)\s+)?\w+\.\w+\s+AS\s)",
                measures_m.group(1).strip(),
                flags=re.IGNORECASE,
            ):
                mm = re.match(
                    r"^\s*(?:(RUNNING|FINAL)\s+)?"
                    r"(?:(MATCH_NUMBER)\s*\(\s*\)"
                    r"|(FIRST|LAST|COUNT|SUM|MIN|MAX|AVG)\s*\(\s*"
                    r"(?:(\w+)\s*\.\s*)?(\w+|\*)\s*\)"
                    r"|(\w+)\s*\.\s*(\w+))"
                    r"\s+AS\s+`?(\w+)`?\s*$",
                    clause.strip(),
                    re.IGNORECASE,
                )
                if not mm:
                    raise ValueError(
                        f"MATCH_RECOGNIZE MEASURES: {clause.strip()!r} — "
                        "supported: [RUNNING|FINAL] FIRST/LAST/COUNT/"
                        "SUM/MIN/MAX/AVG([VAR.]col|[VAR.]*) AS name, "
                        "VAR.col AS name, or MATCH_NUMBER() AS name"
                    )
                mode = (mm.group(1) or default_mode).lower()
                name = mm.group(8)
                all_tis = list(range(len(pattern)))
                if mm.group(2):
                    measures.append((name, "match_number", [], None, mode))
                    continue
                if mm.group(3):
                    agg = mm.group(3).lower()
                    var = mm.group(4).upper() if mm.group(4) else None
                    col = mm.group(5)
                else:
                    agg, var, col = "first", mm.group(6).upper(), mm.group(7)
                if var is not None and var not in var_tokens:
                    if var in subset:
                        # SUBSET union: every member's token indices
                        tis_u = sorted(
                            {
                                ti
                                for mvar in subset[var]
                                for ti in var_tokens.get(mvar, ())
                            }
                        )
                        if not tis_u:
                            raise ValueError(
                                f"MATCH_RECOGNIZE SUBSET {var}: no member "
                                "appears in the pattern"
                            )
                        var_tokens[var] = tis_u
                    else:
                        raise ValueError(
                            f"MATCH_RECOGNIZE MEASURES: unknown pattern "
                            f"variable {var}"
                        )
                if col == "*":
                    if agg != "count":
                        raise ValueError(
                            "MATCH_RECOGNIZE MEASURES: [VAR.]* is only "
                            "valid under COUNT"
                        )
                    col = None
                tis = var_tokens[var] if var is not None else all_tis
                measures.append((name, agg, tis, col, mode))
        src = self.spark.table(tbl)
        if src.isStreaming:
            # Flink's MATCH_RECOGNIZE is a streaming SQL operator —
            # route the same spelling to the cross-micro-batch
            # matchers (streaming/stateful.py: emit-once finalized
            # matches, per-key unfinalized-tail state, NEXT via
            # lookahead hold-back; ALL ROWS PER MATCH emits every
            # consumed row at finalization with RUNNING/FINAL
            # measures — new r9).
            if literal_mode and not measures and rows_per_match == "one":
                from .streaming.stateful import pattern_match_stream

                return pattern_match_stream(
                    src, part, ts_col, tiebreak, type_col, pattern,
                    within_seconds=within_seconds, after_match=after,
                )
            # MEASURES / ALL ROWS on a stream run through the DEFINE
            # matcher (literal equalities are valid predicates), whose
            # state already carries the referenced value columns —
            # under ALL ROWS the variable-name spelling keeps
            # CLASSIFIER() returning the SQL variable, not its
            # resolved type literal. PERMUTE (r9) rides the same
            # matcher: members are resolved types tested against
            # type_col, with match_at's perm remap binding MEASURES.
            from .streaming.stateful import pattern_match_define_stream

            return pattern_match_define_stream(
                src,
                part,
                ts_col,
                tiebreak,
                pattern_vars
                if (measures or rows_per_match == "all")
                else pattern,
                raw_defs,
                within_seconds=within_seconds,
                after_match=after,
                subset=subset or None,
                measures=measures,
                rows_per_match=rows_per_match,
                type_col=type_col if literal_mode else None,
            )
        if literal_mode:
            from .operators.cep import pattern_match_quantified

            return pattern_match_quantified(
                src,
                key_col=part,
                time_col=ts_col,
                order_tiebreak=tiebreak,
                type_col=type_col,
                pattern=pattern,
                within_seconds=within_seconds,
                after_match=after,
                measures=measures,
                rows_per_match=rows_per_match,
            )
        from .operators.cep import pattern_match_define

        return pattern_match_define(
            src,
            key_col=part,
            time_col=ts_col,
            order_tiebreak=tiebreak,
            pattern=pattern,
            define=raw_defs,
            within_seconds=within_seconds,
            after_match=after,
            measures=measures,
            rows_per_match=rows_per_match,
            subset=subset or None,
        )

    def _rewrite_window_tvf(self, statement: str) -> str:
        return rewrite_window_tvf(statement, spark=self.spark)

    def _rewrite_time_travel(self, statement: str) -> str:
        """Bind `t VERSION AS OF n` / `t TIMESTAMP AS OF '<wall
        time>'` references to registered upsert tables as
        point-in-time temp views (plain temp views cannot carry v2
        time-travel syntax, so the snapshot is materialized as a view
        named t__v<n> and the reference rewritten). The TIMESTAMP
        spelling (Delta/Hudi parity) resolves to the LAST commit
        whose wall time is <= the bound — commit wall times are in
        the timeline, so the lookup is metadata-only."""
        import datetime as _dt
        import re

        def bind(name: str, seq: int) -> str:
            h = self.registry.upsert_handle(name)
            view = f"{name}__v{seq}"
            h.snapshot(as_of_seq=seq).createOrReplaceTempView(view)
            return view

        def sub_version(m: re.Match) -> str:
            try:
                return bind(m.group(1), int(m.group(2)))
            except Exception:
                return m.group(0)  # not an engine upsert table

        def sub_timestamp(m: re.Match) -> str:
            name, lit = m.group(1), m.group(2)
            try:
                h = self.registry.upsert_handle(name)
            except Exception:
                return m.group(0)
            bound = _dt.datetime.fromisoformat(lit).timestamp()
            seqs = [
                int(c["seq"])
                for c in h.commits()
                if float(c.get("wall_time", 0.0)) <= bound
            ]
            if not seqs:
                raise ValueError(
                    f"TIMESTAMP AS OF '{lit}': no commit of {name} at "
                    "or before that time"
                )
            return bind(name, max(seqs))

        statement = re.sub(
            r"`?(\w+)`?\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'",
            sub_timestamp,
            statement,
            flags=re.IGNORECASE,
        )
        return re.sub(
            r"`?(\w+)`?\s+VERSION\s+AS\s+OF\s+(\d+)", sub_version, statement,
            flags=re.IGNORECASE,
        )

    def query(self, name: str, sf_dir: str = "/root/testdata/sf0.01") -> DataFrame:
        """Run a named query from the engine's registry (SURVEY.md §2
        inventory; see plans/queries.py)."""
        return QUERIES[name].fn(self.spark, sf_dir)

    def queries(self) -> dict[str, str]:
        return {n: s.doc for n, s in QUERIES.items()}

    # -- write path (≙ R1/R2: INSERT INTO sink SELECT ...) ------------------

    def insert_into(
        self,
        name: str,
        df: DataFrame,
        commit_id: str | None = None,
        **write_kwargs,
    ) -> int:
        """INSERT INTO a registered upsert table (batch flavor of the
        flagship R2 pipeline; literal-rows R1 when df is literals).
        Rebinds the table's temp view afterwards, like the SQL-string
        INSERT route does, so a following ``sql()`` sees the commit.
        Extra kwargs pass through to ``UpsertLakeTable.write`` (e.g.
        ``evolve_schema=True``, ``delete_col=...``)."""
        n = self.registry.upsert_handle(name).write(
            df, commit_id=commit_id, **write_kwargs
        )
        self.registry.resolve(name)
        return n


# ---------------------------------------------------------------------------
# Flink windowing-TVF dialect → Spark SQL rewrite (module-level so the
# registry queries and tests can use it without an EngineSession).
# ---------------------------------------------------------------------------

_TVF_RE = None  # compiled lazily


def rewrite_window_tvf(statement: str, spark=None) -> str:
    """Flink SQL windowing-TVF spellings → Spark SQL, so the notebook
    dialect's windowed queries run verbatim:

      TABLE(TUMBLE(TABLE t, DESCRIPTOR(ts), INTERVAL '10' MINUTES))
      TABLE(HOP(TABLE t, DESCRIPTOR(ts), INTERVAL '5' MINUTES,
                INTERVAL '10' MINUTES))            -- slide, size
      TABLE(SESSION(TABLE t PARTITION BY k, DESCRIPTOR(ts),
                    INTERVAL '5' MINUTES))         -- gap
      TABLE(CUMULATE(TABLE t, DESCRIPTOR(ts), INTERVAL '2' MINUTES,
                     INTERVAL '10' MINUTES))       -- step, size

    CUMULATE becomes tumbling size-windows exploded over the step
    index: an event at offset o in its size-window lands in every
    cumulative window [ws, ws + k*step) with k*step > o — exactly
    Flink's expanding-window fan-out (early results every step, one
    full-size total at window close). The explode happens map-side
    (Generate node) before any aggregation shuffle, mirroring HOP's
    in-map Expand.

    TUMBLE/HOP become derived tables over Spark's ``window()``
    function exposing Flink's ``window_start`` / ``window_end``
    columns (window() in a projection expands one row per containing
    window — for HOP that is the size/slide fan-out, exactly the
    TVF's row multiplication).

    SESSION becomes the gaps-and-islands rewrite: a lag() new-session
    flag, a running-sum session number, then min/max over the session
    — every input row tagged with its merged session's
    [window_start, window_end). Boundary semantics match Flink and
    ``F.session_window``: windows are half-open, so an event at
    exactly last_ts + gap starts a NEW session (`>=` in the flag).
    With PARTITION BY the three window functions all shuffle ONCE on
    the same key (Catalyst reuses the exchange; sessions are per-key
    sorts). Without it the session spec is a single global sort —
    Flink's semantics for the keyless spelling; partition when the
    data is big.

    STREAMING SESSION (new r9): when ``spark`` is passed and the
    SESSION TVF's table is a STREAMING view, the gaps-and-islands
    rewrite (lag() — unsupported on streams) is replaced by Spark's
    native ``session_window`` grouping: the canonical aggregate shape
    ``SELECT ... FROM TABLE(SESSION(...)) GROUP BY window_start,
    window_end[, keys]`` becomes ``GROUP BY session_window(ts, gap)
    [, keys]`` with ``window_start``/``window_end`` resolved to the
    session struct's bounds — identical half-open merge semantics,
    state-backed across micro-batches. The MEASURES-less per-row
    (row-tagging) shape works on streams too (new r10): Spark
    assigns MERGED sessions only during aggregation, so it routes
    through the same ``session_window`` grouping with
    ``collect_list(struct(*))`` per session, exploded back to rows
    tagged with their session's final bounds. Aggregate shapes whose
    GROUP BY omits window_start/window_end still raise.
    """
    import re

    global _TVF_RE
    if _TVF_RE is None:
        iv = r"INTERVAL\s+'([^']+)'\s+(\w+)"
        _TVF_RE = re.compile(
            r"TABLE\s*\(\s*(TUMBLE|HOP|SESSION|CUMULATE)\s*\(\s*(?:TABLE\s+)?"
            r"`?(\w+)`?"
            r"(?:\s+PARTITION\s+BY\s+((?:`?\w+`?\s*,\s*)*`?\w+`?))?"
            r"\s*,\s*DESCRIPTOR\s*\(\s*`?(\w+)`?\s*\)\s*,\s*"
            + iv
            + r"(?:\s*,\s*"
            + iv
            + r")?\s*\)\s*\)",
            re.IGNORECASE,
        )

    def canon(amount: str, unit: str) -> str:
        u = unit.lower().rstrip("s")
        if u not in {"second", "minute", "hour", "day"}:
            raise ValueError(f"unsupported window interval unit {unit!r}")
        return f"{amount} {u}s"

    _SECS = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}

    def secs(canonical: str) -> int:
        amount, unit = canonical.split()
        return int(amount) * _SECS[unit.rstrip("s")]

    def _is_streaming_view(tbl: str) -> bool:
        if spark is None:
            return False
        try:
            return spark.table(tbl).isStreaming
        except Exception:
            return False

    for m in _TVF_RE.finditer(statement):
        if m.group(1).upper() == "SESSION" and _is_streaming_view(
            m.group(2)
        ):
            return _streaming_session_stmt(
                statement, m, m.group(4), canon(m.group(5), m.group(6))
            )

    def sub(m: re.Match) -> str:
        kind, tbl, part, ts = (
            m.group(1).upper(),
            m.group(2),
            m.group(3),
            m.group(4),
        )
        first = canon(m.group(5), m.group(6))
        second = canon(m.group(7), m.group(8)) if m.group(7) else None
        if part and kind != "SESSION":
            raise ValueError("PARTITION BY is only valid in SESSION TVFs")
        if kind == "SESSION":
            keys = [k.strip().strip("`") for k in part.split(",")] if part else []
            pb = (
                "PARTITION BY " + ", ".join(f"`{k}`" for k in keys)
                if keys
                else ""
            )
            ivl = f"INTERVAL {first}"
            over_ord = f"OVER ({pb} ORDER BY `{ts}`)".replace("( ", "(")
            flag = (
                f"CASE WHEN lag(`{ts}`) {over_ord} IS NULL "
                f"OR `{ts}` >= lag(`{ts}`) {over_ord} + {ivl} "
                "THEN 1 ELSE 0 END AS _new_sess"
            )
            over_run = (
                f"OVER ({pb} ORDER BY `{ts}` ROWS BETWEEN UNBOUNDED "
                "PRECEDING AND CURRENT ROW)"
            ).replace("( ", "(")
            sess_part = "PARTITION BY " + ", ".join(
                [f"`{k}`" for k in keys] + ["_sess_no"]
            )
            return (
                "(SELECT * EXCEPT (_sess_no), "
                f"min(`{ts}`) OVER ({sess_part}) AS window_start, "
                f"max(`{ts}`) OVER ({sess_part}) + {ivl} AS window_end "
                "FROM (SELECT * EXCEPT (_new_sess), "
                f"SUM(_new_sess) {over_run} AS _sess_no "
                f"FROM (SELECT *, {flag} FROM {tbl})))"
            )
        if kind == "CUMULATE":  # (step, size)
            if second is None:
                raise ValueError("CUMULATE needs step AND size intervals")
            step_s, size_s = secs(first), secs(second)
            if size_s % step_s:
                raise ValueError(
                    f"CUMULATE size ({second}) must be a multiple of "
                    f"step ({first})"
                )
            n = size_s // step_s
            end = f"_ws + make_interval(0,0,0,0,0,0, _k * {step_s})"
            return (
                "(SELECT * EXCEPT (_ws, _k), _ws AS window_start, "
                f"{end} AS window_end "
                f"FROM (SELECT *, window(`{ts}`, '{second}').start AS _ws "
                f"FROM {tbl}) "
                f"LATERAL VIEW explode(sequence(1, {n})) _e AS _k "
                f"WHERE `{ts}` < {end})"
            )
        if kind == "TUMBLE":
            win = f"window(`{ts}`, '{first}')"
        else:  # HOP(slide, size) -> window(ts, size, slide)
            if second is None:
                raise ValueError("HOP needs slide AND size intervals")
            win = f"window(`{ts}`, '{second}', '{first}')"
        return (
            "(SELECT * EXCEPT (_w), _w.start AS window_start, "
            f"_w.end AS window_end FROM (SELECT *, {win} AS _w "
            f"FROM {tbl}))"
        )

    return _TVF_RE.sub(sub, statement)


def _split_top_level(s: str) -> list[str]:
    """Split a SQL item list on commas OUTSIDE parens/quotes — a
    grouping expression like ``coalesce(a, b)`` stays one item
    (ADVICE r9: the naive ``split(',')`` miscounted such items)."""
    items, depth, start = [], 0, 0
    quote = None
    i = 0
    while i < len(s):
        c = s[i]
        if quote:
            if c == quote:
                quote = None
        elif c in ("'", '"', "`"):
            quote = c
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            items.append(s[start:i])
            start = i + 1
        i += 1
    items.append(s[start:])
    return [x.strip() for x in items if x.strip()]


def _streaming_session_stmt(statement, m, ts, gap):
    """Rewrite the whole statement for a SESSION TVF over a STREAMING
    view: the canonical aggregate shape routes to Spark's native
    ``session_window`` grouping (see ``rewrite_window_tvf``)."""
    import re

    stmt = statement.replace(m.group(0), f"`{m.group(2)}`")
    gb = re.search(r"\bGROUP\s+BY\b", stmt, re.IGNORECASE)
    if gb is None:
        # MEASURES-less per-row shape (new r10): Spark assigns merged
        # sessions only during aggregation, so the row-tagging form
        # routes through the SAME native session_window grouping —
        # collect_list(struct(*)) per session, exploded back to rows
        # tagged with their session's bounds. State per key is the
        # open session's row list (the row-tagging contract: every
        # row of a session is emitted with its FINAL bounds, which
        # are unknowable until the session closes). Drop-in derived
        # table, so arbitrary outer selects/filters keep working.
        keys = [
            k.strip().strip("`")
            for k in (m.group(3) or "").split(",")
            if k.strip()
        ]
        sw = f"session_window(`{ts}`, '{gap}')"
        gb_keys = "".join(f", `{k}`" for k in keys)
        inner = (
            "(SELECT r.*, _sw.start AS window_start, "
            "_sw.end AS window_end "
            f"FROM (SELECT {sw} AS _sw, "
            "collect_list(struct(*)) AS _rows "
            f"FROM `{m.group(2)}` GROUP BY {sw}{gb_keys}) "
            "LATERAL VIEW explode(_rows) _e AS r)"
        )
        return statement.replace(m.group(0), inner)
    tail_m = re.search(
        r"\b(HAVING|ORDER\s+BY|LIMIT)\b", stmt[gb.end():], re.IGNORECASE
    )
    gb_end = gb.end() + (tail_m.start() if tail_m else len(stmt) - gb.end())
    items = _split_top_level(stmt[gb.end():gb_end])
    names = {i.strip("`").lower() for i in items}
    if not {"window_start", "window_end"} <= names:
        raise ValueError(
            "streaming SESSION: GROUP BY must include window_start "
            "and window_end (the session bounds ARE the group)"
        )
    keep = [
        i
        for i in items
        if i.strip("`").lower() not in ("window_start", "window_end")
    ]
    new_gb = ", ".join([f"session_window(`{ts}`, '{gap}')"] + keep)
    stmt = stmt[:gb.end()] + " " + new_gb + (
        " " + stmt[gb_end:] if tail_m else ""
    )
    # resolve window_start/window_end references: a select-list item
    # that is EXACTLY the bare column gets re-aliased to keep the
    # TVF's output name; inside composite expressions (and in
    # HAVING/ORDER BY) only the bare substitution applies — ADVICE
    # r9: the old blind word-boundary alias injection produced
    # 'session_window.end AS window_end - window_start' inside
    # composites
    sel = re.search(r"\bSELECT\b", stmt, re.IGNORECASE)
    frm = re.search(r"\bFROM\b", stmt, re.IGNORECASE)
    head, rest = stmt[sel.end():frm.start()], stmt[frm.start():]
    fields = {"window_start": "start", "window_end": "end"}

    def bare_sub(seg: str) -> str:
        for which, field in fields.items():
            seg = re.sub(
                rf"\b{which}\b",
                f"session_window.{field}",
                seg,
                flags=re.IGNORECASE,
            )
        return seg

    out_items = []
    for item in _split_top_level(head):
        key = item.strip().strip("`").lower()
        if key in fields:
            out_items.append(
                f"session_window.{fields[key]} AS {key}"
            )
        else:
            out_items.append(bare_sub(item))
    return (
        stmt[: sel.end()]
        + " "
        + ", ".join(out_items)
        + " "
        + bare_sub(rest)
    )
