"""Table registry (≙ the Glue Data Catalog role, SURVEY.md §1.1/§2.1
S6-S8).

The reference registers every table — schema + connector + options —
in Glue via `CREATE TABLE ... WITH (...)` (CDC-Hudi-Notebook.zpln:292
¶7 etc.) so definitions survive sessions, and drops them with
`DROP TABLE IF EXISTS` (S7). The PRIMARY KEY NOT ENFORCED clause (S8)
is metadata that drives upsert behavior, not a constraint.

Here: a JSON-file registry mapping name → {kind, path, key, options}.
``resolve`` returns a DataFrame (parquet/feed tables) or an
UpsertLakeTable handle (upsert tables). Spark temp views are also
registered so `spark.sql` can reference tables by name — the same
dual role Glue plays for Flink SQL and Athena (§3 entry point D
collapses to "sink tables are queryable DataFrames").
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame, SparkSession

from .sources.parquet import load_table
from .streaming.upsert_sink import UpsertLakeTable


@dataclass
class TableDef:
    name: str
    kind: str  # 'parquet' | 'upsert' | 'feed'
    path: str
    key: list[str] = field(default_factory=list)  # ≙ PRIMARY KEY NOT ENFORCED
    options: dict = field(default_factory=dict)


def _split_assignments(text: str) -> list[str]:
    """Split `a = f(x, y), b = 2` on top-level commas only (parens and
    single-quoted strings nest)."""
    out, depth, in_str, start = [], 0, False, 0
    for i, ch in enumerate(text):
        if in_str:
            in_str = ch != "'"
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(text[start:i])
            start = i + 1
    out.append(text[start:])
    return [p for p in (x.strip() for x in out) if p]


class TableRegistry:
    def __init__(self, spark: SparkSession, registry_path: str):
        self.spark = spark
        self.registry_path = registry_path
        self._tables: dict[str, TableDef] = {}
        if os.path.exists(registry_path):
            with open(registry_path) as fh:
                for d in json.load(fh):
                    self._tables[d["name"]] = TableDef(**d)

    def _persist(self):
        os.makedirs(os.path.dirname(self.registry_path) or ".", exist_ok=True)
        tmp = self.registry_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump([asdict(t) for t in self._tables.values()], fh, indent=1)
        os.replace(tmp, self.registry_path)

    def create_table(
        self,
        name: str,
        kind: str,
        path: str,
        key: list[str] | None = None,
        if_not_exists: bool = False,
        **options,
    ) -> TableDef:
        """≙ CREATE TABLE ... WITH (connector=..., ...) (S6)."""
        if name in self._tables:
            if if_not_exists:
                return self._tables[name]
            raise ValueError(f"table {name} already exists")
        t = TableDef(name, kind, path, key or [], options)
        self._tables[name] = t
        self._persist()
        return t

    def drop_table(self, name: str, if_exists: bool = True) -> None:
        """≙ DROP TABLE IF EXISTS (S7)."""
        if name not in self._tables:
            if if_exists:
                return
            raise KeyError(name)
        del self._tables[name]
        self.spark.catalog.dropTempView(name)
        self._persist()

    def tables(self) -> list[str]:
        return sorted(self._tables)

    def upsert_handle(self, name: str) -> UpsertLakeTable:
        t = self._tables[name]
        if t.kind != "upsert":
            raise TypeError(f"{name} is kind={t.kind}, not upsert")
        from pyspark.sql import types as T

        schema_json = t.options.get("schema_json")
        # DDL spelling of CHECK constraints (≙ Delta's ALTER TABLE ADD
        # CONSTRAINT / Hudi pre-commit validators): any option key
        # 'check.<name>' = '<sql predicate>' is enforced on every write
        checks = {
            k[len("check."):]: v
            for k, v in t.options.items()
            if k.startswith("check.")
        }
        return UpsertLakeTable(
            self.spark,
            t.path,
            key=t.key,
            num_buckets=int(t.options.get("num_buckets", 16)),
            compact_every=int(t.options.get("compact_every", 5)),
            # ≙ 'compaction.async.enabled' in the reference's WITH options
            compaction_mode=t.options.get("compaction_mode", "inline"),
            schema=(
                T.StructType.fromJson(json.loads(schema_json))
                if schema_json
                else None
            ),
            check_constraints=checks or None,
        )

    def _insert_schema(self, name: str):
        """Data-column StructType for INSERT alignment: the declared
        DDL schema if the table was DDL-created, else the on-disk
        written schema (meta/bucket columns stripped)."""
        from pyspark.sql import types as T

        t = self._tables[name]
        sj = t.options.get("schema_json")
        if sj:
            return T.StructType.fromJson(json.loads(sj))
        h = self.upsert_handle(name)
        from .streaming.upsert_sink import META_COLS

        stored = h._stored_schema()
        if stored is None:
            return None
        return T.StructType(
            [
                f
                for f in stored.fields
                if f.name not in META_COLS and f.name != "bucket"
            ]
        )

    def _execute_insert(self, statement: str) -> DataFrame | None:
        """`INSERT INTO <upsert-table> SELECT ... | VALUES ...` — the
        notebook's ¶9 (literal rows) and ¶53 (flagship SELECT)
        statements, verbatim. Column matching is positional with
        implicit casts to the table types (SQL INSERT semantics).
        Returns a one-row status frame, or None when the target is not
        a registered upsert table (falls through to spark.sql)."""
        import re

        from pyspark.sql import functions as F

        m = re.match(
            r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?`?(\w+)`?\s+(.+)$",
            statement.strip().rstrip(";"),
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            return None
        overwrite = m.group(1).upper() == "OVERWRITE"
        name, body = m.group(2), m.group(3).strip()
        if name not in self._tables or self._tables[name].kind != "upsert":
            return None
        schema = self._insert_schema(name)
        if re.match(r"^VALUES", body, re.IGNORECASE):
            if schema is None:
                raise ValueError(
                    f"INSERT INTO {name} VALUES needs a declared schema"
                )
            cols = ", ".join(f.name for f in schema.fields)
            body = f"SELECT * FROM ({body}) AS _ins({cols})"
        df = self.spark.sql(body)
        if schema is not None:
            if len(df.columns) != len(schema.fields):
                raise ValueError(
                    f"INSERT INTO {name}: {len(schema.fields)} columns "
                    f"expected, query produced {len(df.columns)}"
                )
            df = df.select(
                *[
                    F.col(df.columns[i]).cast(f.dataType).alias(f.name)
                    for i, f in enumerate(schema.fields)
                ]
            )
        # ≙ Hudi's precombine field declared in the table DDL (the
        # reference sets 'precombine.field' in its WITH options): a
        # multi-row-per-key INSERT resolves to the latest row first
        pre = self._tables[name].options.get(
            "precombine"
        ) or self._tables[name].options.get("precombine.field")
        h = self.upsert_handle(name)
        if overwrite:
            # Hudi's insert_overwrite: replace the table contents in
            # ONE commit — the new rows plus tombstones for existing
            # keys absent from them (keyed anti-join, never a wipe;
            # time travel to the pre-overwrite state keeps working)
            doomed = (
                h.snapshot()
                .join(df.select(*h.key), h.key, "left_anti")
                .withColumn("_ins_del", F.lit(True))
            )
            delta = df.withColumn("_ins_del", F.lit(False)).unionByName(
                doomed
            )
            seq = h.write(
                delta,
                delete_col="_ins_del",
                precombine=(
                    [c.strip() for c in pre.split(",")] if pre else None
                ),
            )
        else:
            seq = h.write(
                df,
                precombine=(
                    [c.strip() for c in pre.split(",")] if pre else None
                ),
            )
        self.resolve(name)  # refresh the bound temp view
        return self.spark.createDataFrame([(str(seq),)], "result string")

    def _execute_merge(self, statement: str) -> DataFrame | None:
        """`MERGE INTO <upsert-table> [AS t] USING <src>|(<subquery>)
        [AS s] ON <cond> WHEN ...` — the Spark-SQL/Hudi spelling of the
        keyed upsert the reference drives through Hudi's PRIMARY KEY.
        Supported clauses, applied in declared order (first match
        wins, standard MERGE semantics):

          WHEN MATCHED [AND <cond>] THEN UPDATE SET * | SET c = expr, ...
          WHEN MATCHED [AND <cond>] THEN DELETE
          WHEN NOT MATCHED [AND <cond>] THEN INSERT * | (cols) VALUES (exprs)

        Compiles to ONE delta DataFrame (updates + delete-flagged rows
        + inserts) written through ``UpsertLakeTable.write`` with
        ``delete_col`` — a single commit, so crash atomicity and the
        writer lease apply exactly as for any other write. Returns
        None when the target is not a registered upsert table."""
        import re

        from pyspark.sql import functions as F

        m = re.match(
            r"^\s*MERGE\s+INTO\s+`?(\w+)`?(?:\s+AS\s+(\w+))?\s+"
            r"USING\s+(\((?:[^()]|\([^()]*\))*\)|`?\w+`?)(?:\s+AS\s+(\w+))?\s+"
            r"ON\s+(.*?)\s+(WHEN\s+.*)$",
            statement.strip().rstrip(";"),
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            return None
        name = m.group(1)
        if name not in self._tables or self._tables[name].kind != "upsert":
            return None
        ta = m.group(2) or name
        src_ref, sa, on_cond, when_text = (
            m.group(3), m.group(4), m.group(5), m.group(6)
        )
        if src_ref.startswith("("):
            src_df = self.spark.sql(src_ref[1:-1])
            sa = sa or "src"
        else:
            src_name = src_ref.strip("`")
            if src_name in self._tables:
                src_df = self.resolve(src_name)
            else:
                src_df = self.spark.table(src_name)
            sa = sa or src_name

        clause_re = re.compile(
            r"WHEN\s+(NOT\s+)?MATCHED\s*(?:AND\s+(.*?))?\s*THEN\s+"
            r"(UPDATE\s+SET\s+(?:.(?!WHEN\s))*.|DELETE|INSERT\s+(?:.(?!WHEN\s))*.)",
            re.IGNORECASE | re.DOTALL,
        )
        clauses = [
            (bool(c.group(1)), c.group(2), c.group(3).strip())
            for c in clause_re.finditer(when_text)
        ]
        if not clauses:
            raise ValueError("MERGE needs at least one WHEN clause")

        handle = self.upsert_handle(name)
        tgt_df = handle.snapshot()
        cols = [c for c in tgt_df.columns]
        t, s = tgt_df.alias(ta), src_df.alias(sa)

        def _tcol(c):
            return F.col(f"{ta}.{c}")

        def _set_star():
            # by-name assignment (Delta/Hudi SET * semantics)
            return {
                c: F.col(f"{sa}.{c}") if c in src_df.columns else _tcol(c)
                for c in cols
            }

        def _assignments(text):
            out = {c: _tcol(c) for c in cols}
            for part in _split_assignments(text):
                lhs, rhs = part.split("=", 1)
                lhs = lhs.strip().split(".")[-1].strip("`")
                if lhs not in out:
                    raise ValueError(f"MERGE SET: unknown column {lhs!r}")
                out[lhs] = F.expr(rhs.strip())
            return out

        matched = s.join(t, F.expr(on_cond), "inner")
        has_matched_action = any(not nm for nm, _, _ in clauses)
        if has_matched_action:
            # standard MERGE cardinality check (Spark/Delta raise the
            # same way): two source rows hitting one target row would
            # make the update/delete outcome order-dependent
            dup = (
                matched.groupBy(*[_tcol(k) for k in handle.key])
                .count()
                .filter(F.col("count") > 1)
                .limit(1)
                .count()
            )
            if dup:
                raise ValueError(
                    "MERGE: multiple source rows matched the same "
                    "target row; aggregate the source first"
                )
        parts = []
        prior = F.lit(False)
        for is_not_matched, extra, action in clauses:
            if is_not_matched:
                continue
            cond = F.expr(extra) if extra else F.lit(True)
            take = cond & ~prior
            prior = prior | cond
            act = action.strip()
            if re.match(r"^DELETE$", act, re.IGNORECASE):
                sel = {c: _tcol(c) for c in cols}
                flag = F.lit(True)
            else:
                am = re.match(r"^UPDATE\s+SET\s+(.*)$", act, re.IGNORECASE | re.DOTALL)
                if not am:
                    raise ValueError(f"unsupported MERGE action: {act!r}")
                body = am.group(1).strip()
                sel = _set_star() if body == "*" else _assignments(body)
                flag = F.lit(False)
            parts.append(
                matched.filter(take).select(
                    *[sel[c].alias(c) for c in cols],
                    flag.alias("_merge_delete"),
                )
            )
        unmatched_all = s.join(t, F.expr(on_cond), "left_anti")
        nm_prior = F.lit(False)
        for is_not_matched, extra, action in clauses:
            if not is_not_matched:
                continue
            # same first-match-wins exclusion as the matched path: a
            # source row satisfying two INSERT clauses inserts once
            cond = F.expr(extra) if extra else F.lit(True)
            unmatched = unmatched_all.filter(cond & ~nm_prior)
            nm_prior = nm_prior | cond
            act = action.strip()
            im = re.match(
                r"^INSERT\s*(?:\*|\(([^)]*)\)\s*VALUES\s*\((.*)\))$",
                act,
                re.IGNORECASE | re.DOTALL,
            )
            if not im:
                raise ValueError(f"unsupported MERGE insert: {act!r}")
            if im.group(1) is None:  # INSERT *
                sel = {
                    c: (F.col(f"{sa}.{c}") if c in src_df.columns else F.lit(None))
                    for c in cols
                }
            else:
                names = [x.strip().strip("`") for x in im.group(1).split(",")]
                exprs = _split_assignments(im.group(2))
                if len(names) != len(exprs):
                    raise ValueError("MERGE INSERT: column/value count mismatch")
                given = dict(zip(names, (F.expr(x.strip()) for x in exprs)))
                sel = {c: given.get(c, F.lit(None)) for c in cols}
            parts.append(
                unmatched.select(
                    *[sel[c].cast(tgt_df.schema[c].dataType).alias(c) for c in cols],
                    F.lit(False).alias("_merge_delete"),
                )
            )
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        seq = handle.write(delta, delete_col="_merge_delete")
        self.resolve(name)  # refresh the bound temp view
        return self.spark.createDataFrame([(str(seq),)], "result string")

    def _execute_ctas(self, statement: str) -> DataFrame | None:
        """CREATE TABLE ... AS SELECT: evaluate the SELECT through the
        session (registered views resolve), create the table with the
        result's schema, and make the initial write as commit
        ``ctas`` (one upsert-lake commit for upsert kind; a parquet
        dir for parquet kind). The standard lakehouse materialization
        spelling the reference's DDL surface lacks."""
        from .ddl import parse_ctas

        parsed = parse_ctas(statement)
        if parsed is None:
            return None
        stmt, select_sql = parsed
        df = self.spark.sql(select_sql)
        opts = dict(stmt.options)
        path = opts.pop("path", None) or os.path.join(
            os.path.dirname(self.registry_path), "tables", stmt.name
        )
        opts["schema_json"] = df.schema.json()
        self.create_table(
            stmt.name,
            stmt.kind,
            path,
            key=stmt.key,
            if_not_exists=stmt.if_not_exists,
            **opts,
        )
        if stmt.kind == "upsert":
            self.upsert_handle(stmt.name).write(df, commit_id="ctas")
            self.resolve(stmt.name)
        else:
            df.write.mode("overwrite").parquet(path)
            self.resolve(stmt.name)
        return self.spark.createDataFrame([], "result string")

    _EXPORT_RE = None  # compiled lazily below

    def _execute_export(self, statement: str) -> DataFrame | None:
        """EXPORT TABLE <name> AS DELTA|HUDI|ICEBERG|UNIFORM LOCATION
        '<path>' — the SQL spelling of the lakehouse-format exporters,
        so the interop trio (plus the UniForm dual-metadata flavor:
        one parquet set under BOTH Delta and Iceberg metadata) is
        reachable from the paste-SQL front door."""
        import re as _re

        m = _re.match(
            r"^\s*EXPORT\s+TABLE\s+`?(\w+)`?\s+AS\s+"
            r"(DELTA|HUDI|ICEBERG|UNIFORM)\s+LOCATION\s+'([^']+)'\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if not m:
            return None
        name, fmt, dest = m.group(1), m.group(2).upper(), m.group(3)
        h = self.upsert_handle(name)
        if fmt == "DELTA":
            n = h.export_delta(dest)
        elif fmt == "HUDI":
            n = h.export_hudi(dest)
        elif fmt == "UNIFORM":
            from .sources.uniform import export_uniform

            n = export_uniform(h.snapshot(), dest, name=name)
        else:
            n = h.export_iceberg(dest)
        return self.spark.createDataFrame(
            [(name, fmt, dest, n)],
            "table STRING, format STRING, location STRING, data_files INT",
        )

    def _execute_alter(self, statement: str) -> DataFrame | None:
        """ALTER TABLE <name> ADD COLUMN[S] (col TYPE [, ...]) — the
        DDL spelling of metadata-only schema evolution (files
        predating the column read as typed NULLs; no rewrite). Both
        the parenthesized multi-column and bare single-column forms
        parse."""
        import re as _re

        m = _re.match(
            r"^\s*ALTER\s+TABLE\s+`?(\w+)`?\s+ADD\s+COLUMNS?\s+"
            r"(\((?:[^()]|\([^()]*\))*\)|.+?)\s*;?\s*$",
            statement,
            _re.IGNORECASE | _re.DOTALL,
        )
        if not m:
            return None
        from .ddl import _split_top_level

        name, body = m.group(1), m.group(2).strip()
        if body.startswith("("):
            body = body[1:-1]
        cols: dict[str, str] = {}
        for item in _split_top_level(body):
            cm = _re.match(r"`?(\w+)`?\s+(.+)$", item.strip(), _re.DOTALL)
            if not cm:
                raise ValueError(f"bad ADD COLUMN item: {item!r}")
            cols[cm.group(1)] = cm.group(2).strip()
        h = self.upsert_handle(name)
        h.alter_add_columns(cols)
        self.resolve(name)  # rebind the view with the evolved schema
        return self.spark.createDataFrame(
            [(name, ", ".join(cols))], "table STRING, added STRING"
        )

    # -- materialized views over CDC feeds (Flink dynamic-table parity) ----

    _MV_AGG_RE = r"(SUM|COUNT|MIN|MAX)\s*\(\s*(\*|\w+)\s*\)\s+AS\s+`?(\w+)`?"

    def _execute_create_mv(self, statement: str) -> DataFrame | None:
        """CREATE MATERIALIZED VIEW mv AS SELECT g…, AGG(col) AS a…
        FROM <feed-table> GROUP BY g… — Flink's defining feature
        (a continuously maintained aggregate over a changelog) as
        registry DDL. The view is a :class:`GroupAggIVM` lake table:
        SUM/COUNT telescope from signed contributions, MIN/MAX ride
        the refcounted value-multiset tables, so DELETEs and UPDATEs
        in the feed retract correctly. The CREATE runs an initial
        refresh over the whole feed; `REFRESH MATERIALIZED VIEW mv`
        applies only envelope rows with seq beyond the stored
        watermark (delta-proportional), exactly-once via a
        watermark-derived commit id."""
        import re as _re

        m = _re.match(
            r"^\s*CREATE\s+MATERIALIZED\s+VIEW\s+`?(\w+)`?\s+AS\s+"
            r"SELECT\s+(.*?)\s+FROM\s+`?(\w+)`?\s+GROUP\s+BY\s+(.*?)\s*;?\s*$",
            statement,
            _re.IGNORECASE | _re.DOTALL,
        )
        if not m:
            return None
        from .ddl import _split_top_level

        name, items, src, group_txt = m.groups()
        group_cols = [g.strip(" `") for g in group_txt.split(",")]
        sums: dict[str, str] = {}
        minmax: dict[str, tuple[str, str]] = {}  # alias -> (fn, col)
        count_alias = None
        for item in _split_top_level(items):
            item = item.strip()
            if item.strip(" `") in group_cols:
                continue
            am = _re.match(self._MV_AGG_RE + r"$", item, _re.IGNORECASE)
            if not am:
                raise ValueError(
                    f"materialized views support group columns and "
                    f"SUM/COUNT/MIN/MAX aggregates with aliases; got "
                    f"{item!r}"
                )
            fn, col, alias = am.group(1).upper(), am.group(2), am.group(3)
            if fn == "COUNT":
                if col != "*":
                    raise ValueError("only COUNT(*) is maintained")
                count_alias = alias
            elif fn == "SUM":
                sums[alias] = col
            else:
                minmax[alias] = (fn, col)
        src_def = self._tables.get(src)
        if src_def is None or src_def.kind != "feed":
            raise ValueError(
                f"materialized view source must be a registered feed "
                f"table; {src!r} is "
                f"{'missing' if src_def is None else src_def.kind}"
            )
        path = os.path.join(
            os.path.dirname(self.registry_path), "matviews", name
        )
        self.create_table(
            name,
            "matview",
            path,
            key=group_cols,
            mv_source=src,
            mv_sums=json.dumps(sums),
            mv_minmax=json.dumps(minmax),
            mv_count_alias=count_alias or "",
        )
        n = self._refresh_mv(name)
        return self.spark.createDataFrame(
            [(name, src, n)], "view STRING, source STRING, rows_applied BIGINT"
        )

    def _mv_ivm(self, name: str):
        from .streaming.ivm import GroupAggIVM

        t = self._tables[name]
        sums = json.loads(t.options["mv_sums"])
        minmax = json.loads(t.options["mv_minmax"])
        ivm = GroupAggIVM(
            self.spark,
            t.path,
            group_cols=t.key,
            sum_cols=sorted(set(sums.values())),
            minmax_cols=sorted({c for _fn, c in minmax.values()}),
        )
        return ivm, t, sums, minmax

    def _refresh_mv(self, name: str) -> int:
        from pyspark.sql import functions as F

        ivm, t, _sums, _minmax = self._mv_ivm(name)
        src = self._tables[t.options["mv_source"]]
        wm_path = os.path.join(t.path, "_mv_watermark.json")
        since = -1
        if os.path.exists(wm_path):
            with open(wm_path) as fh:
                since = int(json.load(fh)["seq"])
        feed = self.spark.read.parquet(os.path.join(src.path, "*")).filter(
            F.col("seq") > since
        )
        hi_row = feed.agg(
            F.max("seq").alias("hi"), F.count("*").alias("n")
        ).collect()[0]
        if hi_row["n"] == 0:
            return 0
        # watermark-range commit id: a crash between commit and
        # watermark replays the identical range and dedups in the lake
        ivm.apply(feed, epoch_id=f"mv-{since}-{hi_row['hi']}")
        tmp = wm_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"seq": int(hi_row["hi"])}, fh)
        os.replace(tmp, wm_path)
        self.resolve(name)
        return int(hi_row["n"])

    def _execute_refresh_mv(self, statement: str) -> DataFrame | None:
        import re as _re

        m = _re.match(
            r"^\s*REFRESH\s+MATERIALIZED\s+VIEW\s+`?(\w+)`?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if not m:
            return None
        n = self._refresh_mv(m.group(1))
        return self.spark.createDataFrame(
            [(m.group(1), n)], "view STRING, rows_applied BIGINT"
        )

    def _mv_view_df(self, name: str) -> DataFrame:
        from pyspark.sql import functions as F

        ivm, t, sums, minmax = self._mv_ivm(name)
        df = ivm.view()
        cols = [F.col(g) for g in t.key]
        for alias, col in sums.items():
            cols.append(F.col(f"sum_{col}").alias(alias))
        ca = t.options.get("mv_count_alias")
        if ca:
            cols.append(F.col("n_rows").alias(ca))
        for alias, (fn, col) in minmax.items():
            cols.append(F.col(f"{fn.lower()}_{col}").alias(alias))
        return df.select(*cols)

    def _execute_optimize(self, statement: str) -> DataFrame | None:
        """OPTIMIZE <name> [ZORDER BY (col [, ...])] — Delta's layout
        DDL mapped onto the lake's compaction: folds the delta log
        into the base (rewriting only touched buckets) and, with
        ZORDER BY, Morton-clusters the rewritten files on the given
        columns so min/max footer stats stay tight on every listed
        column."""
        import re as _re

        m = _re.match(
            r"^\s*OPTIMIZE\s+`?(\w+)`?"
            r"(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if not m:
            return None
        name = m.group(1)
        cluster = (
            [c.strip(" `") for c in m.group(2).split(",")]
            if m.group(2)
            else None
        )
        h = self.upsert_handle(name)
        seq = h.compact(cluster_by=cluster)
        self.resolve(name)
        return self.spark.createDataFrame(
            [(name, seq, ", ".join(cluster) if cluster else None)],
            "table STRING, commit_seq BIGINT, zorder_by STRING",
        )

    def _execute_format_maintenance(
        self, statement: str
    ) -> DataFrame | None:
        """Maintenance SQL on FORMAT-PATH tables (new r13 — the
        spellings Spark users type, routed to the interop services):

          OPTIMIZE fmt.`/path` [ZORDER BY (c [, ...])]
              delta -> optimize_delta (Z-order + fresh stats);
              iceberg -> rewrite_data_files (ZORDER = sort strategy);
              hudi -> compact_hudi (ZORDER = cluster_hudi);
              uniform -> optimize_uniform (ZORDER refuses — one
              shared file set serves both formats' commits).
          VACUUM fmt.`/path` [RETAIN n VERSIONS]
              delta -> vacuum_delta; iceberg -> expire_snapshots;
              hudi -> clean_hudi; uniform refuses (each leg's
              retention must be driven explicitly).
          ANALYZE TABLE fmt.`/path` COMPUTE STATISTICS
              the stats BACKFILL: delta -> backfill_delta_stats;
              iceberg -> rewrite_manifests(stats=True); hudi ->
              build_hudi_col_stats; uniform -> both legs over the
              shared files.

        The SQL spellings always write stats where the op supports
        them — a real OPTIMIZE never drops data-skipping metadata."""
        import re as _re

        om = _re.match(
            r"^\s*OPTIMIZE\s+(delta|iceberg|hudi|uniform)\s*\.\s*"
            r"`([^`]+)`(?:\s+ZORDER\s+BY\s+\(([^)]+)\))?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if om:
            fmt, path = om.group(1).lower(), om.group(2)
            cols = (
                [c.strip(" `") for c in om.group(3).split(",")]
                if om.group(3)
                else None
            )
            if fmt == "delta":
                from .sources.delta_interop import optimize_delta

                r = optimize_delta(
                    self.spark, path, zorder_by=cols, stats=True
                )
                detail = f"v{r['version']}: {r['added_files']} file(s)"
            elif fmt == "iceberg":
                from .sources.iceberg_interop import rewrite_data_files

                r = rewrite_data_files(
                    self.spark, path, sort_by=cols, stats=True
                )
                detail = (
                    f"{r.get('files_before')} -> "
                    f"{r.get('files_after')} file(s)"
                )
            elif fmt == "hudi":
                if cols:
                    from .sources.hudi_interop import cluster_hudi

                    r = cluster_hudi(self.spark, path, sort_by=cols)
                    detail = (
                        f"clustered {r['replaced_groups']} -> "
                        f"{r['new_groups']} group(s) @ {r['instant']}"
                    )
                else:
                    from .sources.hudi_interop import compact_hudi

                    r = compact_hudi(self.spark, path)
                    detail = (
                        f"compacted {r['compacted_groups']} group(s) "
                        f"@ {r['instant']}"
                    )
            else:
                if cols:
                    raise ValueError(
                        "OPTIMIZE uniform.`..` ZORDER BY: the dual-"
                        "format compaction shares ONE rewritten file "
                        "set; use OPTIMIZE delta.`..` ZORDER BY on "
                        "the Delta leg if a z-layout is wanted"
                    )
                from .sources.uniform import optimize_uniform

                r = optimize_uniform(self.spark, path, stats=True)
                detail = (
                    f"{r.get('files_before')} -> "
                    f"{r.get('files_after')} file(s), both formats"
                )
            return self.spark.createDataFrame(
                [(f"{fmt}.`{path}`", detail)],
                "table STRING, optimized STRING",
            )
        vm = _re.match(
            r"^\s*VACUUM\s+(delta|iceberg|hudi|uniform)\s*\.\s*"
            r"`([^`]+)`(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if vm:
            fmt, path = vm.group(1).lower(), vm.group(2)
            keep = int(vm.group(3)) if vm.group(3) else None
            if fmt == "delta":
                from .sources.delta_interop import vacuum_delta

                r = vacuum_delta(self.spark, path, keep or 0)
                n = r["deleted_files"] + r["deleted_dv_files"]
            elif fmt == "iceberg":
                from .sources.iceberg_interop import expire_snapshots

                r = expire_snapshots(path, keep_last=keep or 1)
                n = r.get("data_files", 0) + r.get(
                    "expired_snapshots", 0
                )
            elif fmt == "hudi":
                from .sources.hudi_interop import clean_hudi

                r = clean_hudi(path, retain_commits=keep or 2)
                n = r["base_files"] + r["log_files"]
            else:
                raise ValueError(
                    "VACUUM uniform.`..` cannot route: Delta VACUUM "
                    "and Iceberg expire_snapshots have different "
                    "retention semantics over the SHARED files — "
                    "drive each leg explicitly"
                )
            return self.spark.createDataFrame(
                [(f"{fmt}.`{path}`", int(n))],
                "table STRING, removed BIGINT",
            )
        am = _re.match(
            r"^\s*ANALYZE\s+TABLE\s+(delta|iceberg|hudi|uniform)\s*"
            r"\.\s*`([^`]+)`\s+COMPUTE\s+STATISTICS\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if am:
            fmt, path = am.group(1).lower(), am.group(2)
            if fmt == "delta":
                from .sources.delta_interop import backfill_delta_stats

                n = backfill_delta_stats(self.spark, path)
            elif fmt == "iceberg":
                from .sources.iceberg_interop import rewrite_manifests

                n = rewrite_manifests(
                    path, spark=self.spark, stats=True
                ).get("stats_backfilled", 0)
            elif fmt == "hudi":
                from .sources.hudi_interop import build_hudi_col_stats

                n = build_hudi_col_stats(self.spark, path)
            else:
                from .sources.delta_interop import backfill_delta_stats
                from .sources.iceberg_interop import rewrite_manifests

                n = backfill_delta_stats(self.spark, path)
                n += rewrite_manifests(
                    path, spark=self.spark, stats=True
                ).get("stats_backfilled", 0)
            return self.spark.createDataFrame(
                [(f"{fmt}.`{path}`", int(n))],
                "table STRING, stats_files BIGINT",
            )
        return None

    def _execute_call(self, statement: str) -> DataFrame | None:
        """Hudi Spark-SQL CALL procedures (the 0.11+ table-service
        spellings) against registered upsert tables:

          CALL show_commits(table => 't' [, limit => n])
          CALL run_compaction(table => 't')
          CALL rollback_to_instant(table => 't', instant_time => n)
          CALL run_clean(table => 't')
          CALL show_bloom_index(table => 't', column => 'c')  [ext]
          CALL create_bloom_index(table => 't', column => 'c') [ext]

        Arguments parse in Hudi's ``name => value`` form (a single
        positional argument is taken as the table). show_commits is
        the timeline; run_compaction folds the delta log (touched
        buckets only); rollback_to_instant is ``restore(seq)``
        (compaction-horizon-guarded); run_clean is the fsck repair
        pass (orphan commit dirs + compaction scratch — old file
        slices fold at compaction in this engine, so there is no
        separate slice-retention cleaner); the bloom procedures are
        engine extensions over the skip-index sidecar. Unknown
        procedures raise (a typo must not fall through to
        spark.sql's parser and produce a confusing error)."""
        import re as _re

        from pyspark.sql import functions as F  # noqa: F401

        cm = _re.match(
            r"^\s*CALL\s+(\w+)\s*\(\s*(.*?)\s*\)\s*;?\s*$",
            statement,
            _re.IGNORECASE | _re.DOTALL,
        )
        if not cm:
            return None
        proc = cm.group(1).lower()
        args: dict[str, str] = {}
        if cm.group(2).strip():
            for i, part in enumerate(cm.group(2).split(",")):
                am = _re.match(
                    r"^\s*(?:(\w+)\s*=>\s*)?('([^']*)'|[\w.-]+)\s*$",
                    part,
                )
                if not am:
                    raise ValueError(f"CALL: cannot parse argument {part!r}")
                key = (am.group(1) or ("table" if i == 0 else "")).lower()
                if not key:
                    raise ValueError(
                        "CALL: only the first argument may be positional"
                    )
                args[key] = (
                    am.group(3) if am.group(3) is not None else am.group(2)
                )
        known = {
            "show_commits", "run_compaction", "rollback_to_instant",
            "run_clean", "show_bloom_index", "create_bloom_index",
        }
        if proc not in known:
            raise ValueError(
                f"CALL: unknown procedure {proc!r} (supported: "
                f"{', '.join(sorted(known))})"
            )
        name = args.get("table")
        if not name or name not in self._tables:
            raise ValueError(f"CALL {proc}: unknown table {name!r}")
        h = self.upsert_handle(name)
        if proc == "show_commits":
            tl = h.timeline()
            lim = args.get("limit")
            return tl.limit(int(lim)) if lim else tl
        if proc == "run_compaction":
            n = h.compact()
            return self.spark.createDataFrame(
                [(name, n)], "table STRING, compacted_rows BIGINT"
            )
        if proc == "rollback_to_instant":
            seq = args.get("instant_time", args.get("instant"))
            if seq is None:
                raise ValueError(
                    "CALL rollback_to_instant needs instant_time => <seq>"
                )
            h.restore(int(seq))
            self.resolve(name)
            return self.spark.createDataFrame(
                [(name, int(seq))], "table STRING, restored_to BIGINT"
            )
        if proc == "run_clean":
            res = h.fsck(repair=True)
            return self.spark.createDataFrame(
                [
                    (
                        name,
                        len(res.get("orphan_commit_dirs", [])),
                        len(res.get("scratch_dirs", [])),
                        int(res.get("removed", 0)),
                    )
                ],
                "table STRING, orphan_commit_dirs BIGINT, "
                "scratch_dirs BIGINT, removed BIGINT",
            )
        col = args.get("column")
        if not col:
            raise ValueError(f"CALL {proc} needs column => '<col>'")
        if proc == "create_bloom_index":
            n = h.build_bloom(col)
            return self.spark.createDataFrame(
                [(name, col, n)],
                "table STRING, column STRING, indexed_files BIGINT",
            )
        # show_bloom_index: the sidecar's per-file coverage
        import json as _json

        from .operators.skipindex import index_path

        p = index_path(h._base, col)
        if not os.path.exists(p):
            raise ValueError(
                f"CALL show_bloom_index: no index on {name}.{col} — "
                "run CALL create_bloom_index first"
            )
        idx = _json.load(open(p))
        rows = sorted((f, len(w)) for f, w in idx["files"].items())
        return self.spark.createDataFrame(
            rows or [("", 0)],
            "file STRING, mask_words BIGINT",
        ).filter(F.col("file") != "")

    def _pruned_where(self, h, cond: str | None) -> DataFrame | None:
        """Route a simple single-column equality WHERE (the keyed
        DELETE/UPDATE shape) through the table's bloom skip-index:
        ``equality_scan`` opens only candidate BASE files instead of
        the full merged snapshot — at 100 TB a keyed DML touches a
        handful of files, not the table. Returns None (caller falls
        back to the full-snapshot filter) for compound predicates,
        unknown columns, or when no sidecar exists; ``equality_scan``
        itself degrades to the exact unpruned scan on a stale
        sidecar, so pruning is never a correctness dependency.

        The probe value must render EXACTLY as the index was built
        (Spark ``CAST(col AS STRING)``), so literal coercion is
        dtype-aware and refuses any shape whose rendering could
        diverge: a dotted literal on an integer column ('5.0' vs
        stored '5'), a quoted literal on a non-string column (Spark
        coerces the comparison, the rendering doesn't follow), a
        decimal column probed with a float ('5.5' vs stored '5.50' —
        decimals render at declared scale, so the probe carries it
        via ``Decimal.quantize``), and float columns outright
        (``Float.toString`` shortest-digits diverge from the
        ``Double.toString`` probe rendering). Refusal = return None
        = exact full-snapshot filter, never a missed row."""
        import re as _re

        if not cond:
            return None
        m = _re.match(
            r"^\s*`?(\w+)`?\s*=\s*('(?:[^']|'')*'|-?\d+(?:\.\d+)?)\s*$",
            cond.strip(),
        )
        if not m:
            return None
        col, lit = m.group(1), m.group(2)
        snap_schema = {f.name: f.dataType for f in h.snapshot().schema.fields}
        if col not in snap_schema:
            return None
        from .operators.skipindex import index_path

        if not os.path.exists(index_path(h._base, col)):
            return None
        dts = snap_schema[col].simpleString()
        int_like = dts in ("tinyint", "smallint", "int", "bigint")
        if lit.startswith("'"):
            if dts != "string":
                return None  # cross-type coercion: rendering diverges
            value = lit[1:-1].replace("''", "'")
        elif int_like:
            if "." in lit:
                return None  # '5.0' probe vs stored '5'
            value = int(lit)
        elif dts == "double":
            value = float(lit)
        elif dts.startswith("decimal("):
            import decimal as _dec

            scale = int(dts[len("decimal(") : -1].split(",")[1])
            d = _dec.Decimal(lit)
            q = d.quantize(
                _dec.Decimal(1).scaleb(-scale), rounding=_dec.ROUND_HALF_UP
            )
            if q != d:
                return None  # literal finer than the declared scale
            value = q
        else:
            # float (Float.toString divergence), date/timestamp/bool:
            # exact unpruned scan
            return None
        return h.equality_scan(col, value)

    def _execute_delete_from(self, statement: str) -> DataFrame | None:
        """`DELETE FROM <upsert-table> [WHERE <cond>]` — the Delta/
        Hudi Spark-SQL row-deletion spelling. Compiles to ONE commit
        of delete-flagged rows through ``UpsertLakeTable.write``
        (``delete_col``), so crash atomicity, the writer lease, and
        CDC-changes visibility apply exactly as for any other write.
        Only matching rows are rewritten as tombstones — never a
        table rewrite. Returns None when the target is not a
        registered upsert table."""
        import re as _re

        from pyspark.sql import functions as F

        m = _re.match(
            r"^\s*DELETE\s+FROM\s+`?(\w+)`?(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
            statement.strip(),
            _re.IGNORECASE | _re.DOTALL,
        )
        if not m:
            return None
        name, cond = m.group(1), m.group(2)
        if name not in self._tables or self._tables[name].kind != "upsert":
            return None
        h = self.upsert_handle(name)
        doomed = self._pruned_where(h, cond)
        if doomed is None:
            snap = h.snapshot()
            doomed = snap.filter(F.expr(cond)) if cond else snap
        # persist: the affected-row count AND the commit write share
        # one scan of the filtered snapshot
        delta = doomed.withColumn("_dml_delete", F.lit(True)).persist()
        try:
            n = delta.count()
            if n:
                h.write(delta, delete_col="_dml_delete")
                self.resolve(name)
        finally:
            delta.unpersist()
        return self.spark.createDataFrame(
            [(name, n)], "table STRING, deleted_rows BIGINT"
        )

    def _execute_update(self, statement: str) -> DataFrame | None:
        """`UPDATE <upsert-table> SET c = expr[, ...] [WHERE <cond>]`
        — the Delta/Hudi Spark-SQL row-update spelling. One keyed
        upsert commit carrying ONLY the matching rows with the
        assignments applied; expressions evaluate in the row's scope
        (``SET qty = qty + 1`` works). Returns None when the target
        is not a registered upsert table."""
        import re as _re

        from pyspark.sql import functions as F

        m = _re.match(
            r"^\s*UPDATE\s+`?(\w+)`?\s+SET\s+(.+?)"
            r"(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
            statement.strip(),
            _re.IGNORECASE | _re.DOTALL,
        )
        if not m:
            return None
        name, set_text, cond = m.group(1), m.group(2), m.group(3)
        if name not in self._tables or self._tables[name].kind != "upsert":
            return None
        h = self.upsert_handle(name)
        snap = h.snapshot()
        assigns = {}
        for part in _split_assignments(set_text):
            lhs, rhs = part.split("=", 1)
            lhs = lhs.strip().strip("`")
            if lhs not in snap.columns:
                raise ValueError(f"UPDATE SET: unknown column {lhs!r}")
            if lhs in h.key:
                raise ValueError(
                    f"UPDATE SET: {lhs!r} is a record-key column; "
                    "key changes are a delete + insert, use MERGE"
                )
            assigns[lhs] = F.expr(rhs.strip())
        touched = self._pruned_where(h, cond)
        if touched is None:
            touched = snap.filter(F.expr(cond)) if cond else snap
        delta = touched.select(
            *[
                assigns.get(c, F.col(c)).cast(snap.schema[c].dataType).alias(c)
                for c in snap.columns
            ]
        ).persist()  # count + commit write share one scan
        try:
            n = delta.count()
            if n:
                h.write(delta)
                self.resolve(name)
        finally:
            delta.unpersist()
        return self.spark.createDataFrame(
            [(name, n)], "table STRING, updated_rows BIGINT"
        )

    def _execute_path_dml(self, statement: str) -> DataFrame | None:
        """Interop DML through SQL (new r12 — VERDICT r11 ask #6):
        Spark SQL's path-table spelling dispatched to the interop
        mutators, so exported lake tables take the same statements
        engine tables do:

          DELETE FROM delta.`/path` [WHERE <cond>]   -> delete_delta
          DELETE FROM iceberg.`/path` [WHERE <cond>] -> delete_iceberg
          DELETE FROM hudi.`/path` [WHERE <cond>]    -> delete_hudi
          DELETE FROM uniform.`/path` [WHERE <cond>] -> delete_uniform
          UPDATE delta.`/path` SET c = expr[, ...] [WHERE <cond>]
                                                     -> update_delta
          UPDATE iceberg.`/path` SET ...             -> update_iceberg
          UPDATE hudi.`/path` SET ...                -> keyed upsert of
                       the rewritten matched rows (upsert_hudi; SET
                       on the record key refuses — key changes are a
                       delete + insert)

        Single-format mutators keep their UniForm refusal (a
        ``delta.``/``iceberg.`` statement against a UniForm directory
        raises; spell it ``uniform.`` to commit BOTH formats'
        encodings). UPDATE on ``uniform.`` refuses until a
        dual-format update write side exists. MERGE stays Python-API
        (``upsert_iceberg`` / ``upsert_hudi``). Returns None when the
        statement is not path-table DML."""
        import re as _re

        dm = _re.match(
            r"^\s*DELETE\s+FROM\s+(delta|iceberg|hudi|uniform)\s*\.\s*"
            r"`([^`]+)`(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
            statement.strip(),
            _re.IGNORECASE | _re.DOTALL,
        )
        if dm:
            fmt, path, cond = (
                dm.group(1).lower(),
                dm.group(2),
                dm.group(3) or "true",
            )
            if fmt == "delta":
                from .sources.delta_interop import delete_delta

                n = delete_delta(self.spark, path, cond)["deleted_rows"]
            elif fmt == "iceberg":
                from .sources.iceberg_interop import delete_iceberg

                n = delete_iceberg(self.spark, path, cond)["deleted_rows"]
            elif fmt == "hudi":
                from .sources.hudi_interop import delete_hudi

                n = delete_hudi(self.spark, path, cond)["deleted_keys"]
            else:
                from .sources.uniform import delete_uniform

                n = delete_uniform(self.spark, path, cond)["deleted_rows"]
            return self.spark.createDataFrame(
                [(f"{fmt}.`{path}`", int(n))],
                "table STRING, deleted_rows BIGINT",
            )
        um = _re.match(
            r"^\s*UPDATE\s+(delta|iceberg|hudi|uniform)\s*\.\s*"
            r"`([^`]+)`\s+SET\s+(.+?)(?:\s+WHERE\s+(.+?))?\s*;?\s*$",
            statement.strip(),
            _re.IGNORECASE | _re.DOTALL,
        )
        if not um:
            return None
        fmt, path, set_text, cond = (
            um.group(1).lower(),
            um.group(2),
            um.group(3),
            um.group(4) or "true",
        )
        set_exprs: dict[str, str] = {}
        for part in _split_assignments(set_text):
            lhs, _, rhs = part.partition("=")
            if not rhs:
                raise ValueError(f"UPDATE SET: malformed assignment {part!r}")
            set_exprs[lhs.strip().strip("`")] = rhs.strip()
        if fmt == "delta":
            from .sources.delta_interop import update_delta

            n = update_delta(self.spark, path, cond, set_exprs)[
                "updated_rows"
            ]
        elif fmt == "iceberg":
            from .sources.iceberg_interop import update_iceberg

            n = update_iceberg(self.spark, path, cond, set_exprs)[
                "updated_rows"
            ]
        elif fmt == "hudi":
            from .sources.hudi_interop import update_hudi

            n = update_hudi(self.spark, path, cond, set_exprs)[
                "updated_rows"
            ]
        else:
            raise ValueError(
                "UPDATE uniform.`...` cannot route: a dual-format "
                "update is a keyed upsert (upsert_uniform) and the "
                "statement carries no record key — use "
                "upsert_uniform(path, df, key_cols) directly"
            )
        return self.spark.createDataFrame(
            [(f"{fmt}.`{path}`", int(n))],
            "table STRING, updated_rows BIGINT",
        )

    def _execute_path_history(self, statement: str) -> DataFrame | None:
        """``DESCRIBE HISTORY <fmt>.`/path``` for format-path tables
        (new r12 — the read-side sibling of the DML routing): one row
        per commit/snapshot/instant with its kind and ordering key —
        Delta log versions, Iceberg snapshots (operation from the
        summary), Hudi timeline instants (action from the marker
        suffix). Metadata-only: a directory/JSON walk, no data
        scan."""
        import re as _re

        m = _re.match(
            r"^\s*DESCRIBE\s+HISTORY\s+(delta|iceberg|hudi|uniform)"
            r"\s*\.\s*`([^`]+)`\s*;?\s*$",
            statement.strip(),
            _re.IGNORECASE,
        )
        if not m:
            return None
        fmt, path = m.group(1).lower(), m.group(2)
        rows: list[tuple[str, str, str]] = []
        if fmt in ("delta", "uniform"):
            log_dir = os.path.join(path, "_delta_log")
            if not os.path.isdir(log_dir):
                raise FileNotFoundError(f"no _delta_log at {path}")
            import json as _json

            for f in sorted(os.listdir(log_dir)):
                if not (f.endswith(".json") and f[:20].isdigit()):
                    continue
                ops = set()
                for line in open(os.path.join(log_dir, f)):
                    if not line.strip():
                        continue
                    a = _json.loads(line)
                    for k in ("add", "remove", "cdc", "metaData",
                              "protocol"):
                        if k in a:
                            ops.add(k)
                rows.append(
                    (str(int(f[:20])), "delta_commit",
                     "+".join(sorted(ops)))
                )
        if fmt in ("iceberg", "uniform"):
            from .sources.iceberg_interop import snapshots as _snaps

            for s in _snaps(path):
                rows.append(
                    (
                        str(s["snapshot_id"]),
                        "iceberg_snapshot",
                        s.get("operation") or "",
                    )
                )
        if fmt == "hudi":
            tl = os.path.join(path, ".hoodie")
            if not os.path.isdir(tl):
                raise FileNotFoundError(f"no .hoodie timeline at {path}")
            for f in sorted(os.listdir(tl)):
                stem, _, suf = f.partition(".")
                if stem.isdigit() and suf in (
                    "commit", "deltacommit", "replacecommit",
                ):
                    rows.append((stem, "hudi_instant", suf))
        return self.spark.createDataFrame(
            rows or [("", "", "")],
            "id STRING, kind STRING, detail STRING",
        ).filter("id != ''")

    def _execute_path_merge(self, statement: str) -> DataFrame | None:
        """Upsert-shaped ``MERGE INTO`` on a format-path table (new
        r12, completing the SQL DML routing):

          MERGE INTO <fmt>.`/path` [AS t] USING <view>|(<subquery>)
          [AS s] ON t.k = s.k [AND ...]
          WHEN MATCHED THEN UPDATE SET *
          WHEN NOT MATCHED THEN INSERT *

        — the pure keyed-upsert MERGE every Spark/Delta/Hudi tutorial
        writes — dispatches to the format's upsert writer
        (``upsert_delta`` / ``upsert_iceberg`` / ``upsert_hudi`` /
        ``upsert_uniform``). A DELETE-only MERGE (``WHEN MATCHED THEN
        DELETE``, no insert clause) routes to Iceberg's
        equality-delete leg (``upsert_iceberg(deletes=...)``); other
        formats refuse it (no keyed-delete write side). Conditional
        clauses, partial SET lists, and extra WHEN arms are NOT this
        spelling — use the Python writers or the engine-table MERGE.
        ``ON`` must be a conjunction of ``t.col = s.col`` equalities.
        Returns None when the statement is not path-table MERGE."""
        import re as _re

        m = _re.match(
            r"^\s*MERGE\s+INTO\s+(delta|iceberg|hudi|uniform)\s*\.\s*"
            r"`([^`]+)`(?:\s+AS\s+(\w+))?\s+"
            r"USING\s+(\((?:[^()]|\([^()]*\))*\)|`?\w+`?)"
            r"(?:\s+AS\s+(\w+))?\s+ON\s+(.*?)\s+(WHEN\s+.*)$",
            statement.strip().rstrip(";"),
            _re.IGNORECASE | _re.DOTALL,
        )
        if not m:
            return None
        fmt, path, ta = m.group(1).lower(), m.group(2), m.group(3) or "t"
        src_ref, sa, on_cond, when_text = (
            m.group(4), m.group(5), m.group(6), m.group(7),
        )
        if src_ref.startswith("("):
            src_df = self.spark.sql(src_ref[1:-1])
            sa = sa or "src"
        else:
            src_name = src_ref.strip("`")
            if src_name in self._tables:
                src_df = self.resolve(src_name)
            else:
                src_df = self.spark.table(src_name)
            sa = sa or src_name
        key_cols: list[str] = []
        for part in _re.split(r"\bAND\b", on_cond, flags=_re.IGNORECASE):
            em = _re.match(
                r"^\s*`?(\w+)`?\s*\.\s*`?(\w+)`?\s*=\s*"
                r"`?(\w+)`?\s*\.\s*`?(\w+)`?\s*$",
                part,
            )
            if not em:
                raise ValueError(
                    "path-table MERGE: ON must be a conjunction of "
                    f"t.col = s.col equalities, got {part.strip()!r}"
                )
            la, lc, ra, rc = em.groups()
            if {la, ra} != {ta, sa} or lc != rc:
                raise ValueError(
                    "path-table MERGE: ON must equate the SAME column "
                    f"of {ta!r} and {sa!r}, got {part.strip()!r}"
                )
            key_cols.append(lc)
        clause_re = _re.compile(
            r"WHEN\s+(NOT\s+)?MATCHED\s+THEN\s+"
            r"(UPDATE\s+SET\s+\*|DELETE|INSERT\s+\*)",
            _re.IGNORECASE,
        )
        clauses = {
            ("not_matched" if c.group(1) else "matched",
             c.group(2).upper().split()[0])
            for c in clause_re.finditer(when_text)
        }
        covered = clause_re.sub("", when_text).strip()
        if covered:
            raise ValueError(
                "path-table MERGE supports only WHEN MATCHED THEN "
                "UPDATE SET * / DELETE and WHEN NOT MATCHED THEN "
                f"INSERT * — could not parse {covered!r}"
            )
        upsert_shape = clauses == {
            ("matched", "UPDATE"), ("not_matched", "INSERT"),
        }
        delete_shape = clauses == {("matched", "DELETE")}
        if not (upsert_shape or delete_shape):
            raise ValueError(
                "path-table MERGE needs either the upsert shape "
                "(MATCHED UPDATE SET * + NOT MATCHED INSERT *) or the "
                "delete-only shape (MATCHED DELETE)"
            )
        if delete_shape:
            if fmt == "iceberg":
                from .sources.iceberg_interop import upsert_iceberg

                res = upsert_iceberg(
                    self.spark, path, None, key_cols,
                    deletes=src_df.select(*key_cols),
                )
                n = res["rows"]
            elif fmt == "delta":
                from .sources.delta_interop import upsert_delta

                res = upsert_delta(
                    self.spark, path, None, key_cols,
                    deletes=src_df.select(*key_cols),
                )
                n = res["upserted_rows"]
            else:
                raise ValueError(
                    f"DELETE-only MERGE on {fmt}.`...` has no keyed-"
                    "delete write side — use DELETE FROM with a "
                    "predicate, or Delta/Iceberg"
                )
        elif fmt == "delta":
            from .sources.delta_interop import upsert_delta

            n = upsert_delta(self.spark, path, src_df, key_cols)[
                "upserted_rows"
            ]
        elif fmt == "iceberg":
            from .sources.iceberg_interop import upsert_iceberg

            n = upsert_iceberg(self.spark, path, src_df, key_cols)["rows"]
        elif fmt == "hudi":
            from .sources.hudi_interop import (
                UnsupportedHudiFeature,
                _record_key_fields,
                upsert_hudi,
            )

            declared = _record_key_fields(path)
            if key_cols != declared:
                raise UnsupportedHudiFeature(
                    f"hudi MERGE: ON keys {key_cols} must equal the "
                    f"table's declared record key {declared}"
                )
            n = upsert_hudi(self.spark, path, src_df)["upserted_rows"]
        else:
            from .sources.uniform import upsert_uniform

            n = upsert_uniform(self.spark, path, src_df, key_cols)[
                "upserted_rows"
            ]
        return self.spark.createDataFrame(
            [(f"{fmt}.`{path}`", int(n))],
            "table STRING, merged_rows BIGINT",
        )

    def execute_ddl(self, statement: str) -> DataFrame | None:
        """Route a CREATE/DROP TABLE connector-DDL string — or an
        INSERT INTO / MERGE INTO an upsert table — into the registry
        (≙ pasting the notebook's ¶7/¶24 DDL and ¶9/¶53 INSERT
        paragraphs). Returns a status DataFrame when handled, None
        when the statement is not engine SQL (caller falls through to
        spark.sql)."""
        from .ddl import parse_ddl

        exp = self._execute_export(statement)
        if exp is not None:
            return exp
        callp = self._execute_call(statement)
        if callp is not None:
            return callp
        alt = self._execute_alter(statement)
        if alt is not None:
            return alt
        opt = self._execute_optimize(statement)
        if opt is not None:
            return opt
        fmnt = self._execute_format_maintenance(statement)
        if fmnt is not None:
            return fmnt
        mv = self._execute_create_mv(statement)
        if mv is not None:
            return mv
        rmv = self._execute_refresh_mv(statement)
        if rmv is not None:
            return rmv
        import re as _re

        hm = _re.match(
            r"^\s*DESCRIBE\s+HISTORY\s+`?(\w+)`?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if hm:
            # Delta's DESCRIBE HISTORY spelling -> the commit timeline
            # (≙ Hudi CLI `commits show`); metadata-only
            return self.upsert_handle(hm.group(1)).timeline()
        dm = _re.match(
            r"^\s*DESCRIBE\s+DETAIL\s+`?(\w+)`?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if dm and dm.group(1) in self._tables:
            # Delta's DESCRIBE DETAIL: one metadata row — a directory
            # walk (file counts/bytes), never a data scan
            t = self._tables[dm.group(1)]
            n_files = size_b = 0
            if os.path.isdir(t.path):
                for root, _dirs, fs in os.walk(t.path):
                    for f in fs:
                        if f.endswith(".parquet"):
                            n_files += 1
                            size_b += os.path.getsize(
                                os.path.join(root, f)
                            )
            commits = 0
            if t.kind == "upsert":
                try:
                    commits = len(self.upsert_handle(t.name).commits())
                except Exception:
                    pass
            return self.spark.createDataFrame(
                [
                    (
                        "upsert-lake" if t.kind == "upsert" else t.kind,
                        t.name,
                        t.path,
                        ",".join(t.key or []),
                        n_files,
                        size_b,
                        commits,
                    )
                ],
                "format STRING, name STRING, location STRING, "
                "primary_key STRING, num_files BIGINT, "
                "size_in_bytes BIGINT, num_commits BIGINT",
            )
        if _re.match(
            r"^\s*SHOW\s+ENGINE\s+TABLES\s*;?\s*$", statement, _re.IGNORECASE
        ):
            # the registry's own catalog listing (`SHOW TABLES` without
            # ENGINE falls through to spark.sql's temp-view listing)
            from pyspark.sql import functions as F

            rows = [
                (n, t.kind, t.path, ",".join(t.key or []))
                for n, t in sorted(self._tables.items())
            ]
            return self.spark.createDataFrame(
                rows or [("", "", "", "")],
                "name STRING, kind STRING, path STRING, key STRING",
            ).filter(F.col("name") != "")
        pdml = self._execute_path_dml(statement)
        if pdml is not None:
            return pdml
        ph = self._execute_path_history(statement)
        if ph is not None:
            return ph
        pmrg = self._execute_path_merge(statement)
        if pmrg is not None:
            return pmrg
        ins = self._execute_insert(statement)
        if ins is not None:
            return ins
        mrg = self._execute_merge(statement)
        if mrg is not None:
            return mrg
        dml = self._execute_delete_from(statement)
        if dml is not None:
            return dml
        dml = self._execute_update(statement)
        if dml is not None:
            return dml
        tm = _re.match(
            r"^\s*TRUNCATE\s+TABLE\s+`?(\w+)`?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if tm and tm.group(1) in self._tables:
            # one tombstone commit for every live row — time travel to
            # the pre-truncate state still works, unlike a data wipe
            return self._execute_delete_from(
                f"DELETE FROM {tm.group(1)}"
            )
        sm = _re.match(
            r"^\s*SHOW\s+CREATE\s+TABLE\s+`?(\w+)`?\s*;?\s*$",
            statement,
            _re.IGNORECASE,
        )
        if sm and sm.group(1) in self._tables:
            t = self._tables[sm.group(1)]
            schema = self._insert_schema(t.name)
            cols = (
                ",\n".join(
                    f"  `{f.name}` {f.dataType.simpleString().upper()}"
                    for f in schema.fields
                )
                if schema is not None
                else "  -- schema inferred from data"
            )
            pk = (
                f",\n  PRIMARY KEY ({', '.join(t.key)}) NOT ENFORCED"
                if t.key
                else ""
            )
            opts = {"connector": "hudi" if t.kind == "upsert" else t.kind,
                    "path": t.path, **t.options}
            with_opts = ",\n".join(
                f"  '{k}' = '{v}'" for k, v in opts.items()
                if k != "schema_json"
            )
            ddl = (
                f"CREATE TABLE {t.name} (\n{cols}{pk}\n) WITH (\n"
                f"{with_opts}\n)"
            )
            return self.spark.createDataFrame(
                [(t.name, ddl)], "table STRING, create_statement STRING"
            )
        ctas = self._execute_ctas(statement)
        if ctas is not None:
            return ctas
        stmt = parse_ddl(statement)
        if stmt is None:
            return None
        if stmt.action == "drop":
            self.drop_table(stmt.name, if_exists=stmt.if_exists)
        else:
            opts = dict(stmt.options)
            path = opts.pop("path", None) or os.path.join(
                os.path.dirname(self.registry_path), "tables", stmt.name
            )
            if stmt.schema is not None:
                opts["schema_json"] = stmt.schema.json()
            self.create_table(
                stmt.name,
                stmt.kind,
                path,
                key=stmt.key,
                if_not_exists=stmt.if_not_exists,
                **opts,
            )
            if stmt.kind == "upsert":
                # bind a typed view immediately — queryable before the
                # first write, exactly like a freshly-declared Hudi table
                self.resolve(stmt.name)
            elif stmt.kind == "feed":
                # bind the envelope view if the feed already has
                # commits (an empty dir binds on first resolve)
                try:
                    self.resolve(stmt.name)
                except Exception:
                    pass
        return self.spark.createDataFrame([], "result string")

    def resolve(self, name: str) -> DataFrame:
        """Current-state DataFrame for any registered table; also
        (re-)binds it as a temp view for spark.sql access."""
        t = self._tables[name]
        if t.kind == "parquet":
            df = (
                load_table(self.spark, os.path.dirname(t.path), name)
                if t.path.endswith(".parquet")
                else self.spark.read.parquet(t.path)
            )
        elif t.kind == "upsert":
            df = self.upsert_handle(name).snapshot()
        elif t.kind == "feed":
            # bounded read of a CDC envelope feed dir (schema embedded
            # in the parquet commit files)
            df = self.spark.read.parquet(os.path.join(t.path, "*"))
        elif t.kind == "matview":
            df = self._mv_view_df(name)
        else:
            raise TypeError(f"unknown table kind {t.kind}")
        df.createOrReplaceTempView(name)
        return df


def export_external_ddl(
    table: TableDef, columns: list[tuple[str, str]]
) -> str:
    """Glue/Athena-style external-table DDL for a lake table (≙ the
    reference's Glue table so Athena can query the Hudi output,
    lib/rds-cdc-flink-hudi-stack.ts:458-519 — including the metadata
    columns it surfaces alongside data columns).

    ``columns``: (name, sql_type) pairs for the data columns; the
    engine's audit columns (≙ _hoodie_*) are prepended like the
    reference's Glue DDL does.
    """
    # 5-column parity with Hudi's _hoodie_* set (commit time, seqno,
    # record key, partition path, file name) plus the CDC op flag;
    # _partition_path/_file_name are read-time columns in snapshots,
    # surfaced here so the external schema matches with_meta reads
    meta = [
        ("_record_key", "string"),
        ("_commit_seq", "bigint"),
        ("_commit_seqno", "string"),
        ("_commit_time", "string"),
        ("_op", "string"),
        ("_partition_path", "string"),
        ("_file_name", "string"),
    ]
    cols = ",\n  ".join(f"`{n}` {t}" for n, t in meta + list(columns))
    return (
        f"CREATE EXTERNAL TABLE `{table.name}` (\n  {cols}\n)\n"
        f"PARTITIONED BY (`bucket` int)\n"
        f"STORED AS PARQUET\n"
        f"LOCATION '{table.path}/base'"
    )
