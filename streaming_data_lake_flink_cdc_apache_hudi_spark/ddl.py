"""SQL-string DDL surface (SURVEY.md §2.1 S6-S8 via SQL text).

The reference registers tables by PASTING DDL into notebook
paragraphs — `CREATE TABLE ... WITH ('connector' = 'hudi', 'path' =
..., ...)` (CDC-Hudi-Notebook.zpln:292 ¶7, :1060 ¶24) and `DROP TABLE
IF EXISTS` — so the engine accepts the same workflow through
``EngineSession.sql``: a CREATE/DROP TABLE statement with a
connector-style options clause is routed into the TableRegistry; any
other statement passes through to ``spark.sql`` untouched.

Both option spellings are accepted:
- Flink style:  ``WITH ('connector' = 'upsert', 'path' = '/p', ...)``
- Spark style:  ``USING upsert OPTIONS (path '/p', num_buckets '8')``

`PRIMARY KEY (...) NOT ENFORCED` maps to the registry key (S8).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import types as T

_CREATE_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?`?(\w+)`?\s*\(",
    re.IGNORECASE | re.DOTALL,
)
_DROP_RE = re.compile(
    r"^\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?`?(\w+)`?\s*;?\s*$",
    re.IGNORECASE,
)


@dataclass
class DDLStatement:
    action: str  # 'create' | 'drop'
    name: str
    if_not_exists: bool = False
    if_exists: bool = False
    schema: T.StructType | None = None
    key: list[str] = field(default_factory=list)
    kind: str = "upsert"
    options: dict = field(default_factory=dict)


def _parse_sql_type(s: str) -> T.DataType:
    """Flink/Spark SQL type name → Spark type (lossy where Flink is
    finer: TIMESTAMP(3) → timestamp, VARCHAR(n) → string)."""
    s = s.strip().lower()
    base = re.match(r"(\w+)", s).group(1)
    if base == "decimal" or base == "numeric":
        m = re.search(r"\(\s*(\d+)\s*,\s*(\d+)\s*\)", s)
        return T.DecimalType(int(m.group(1)), int(m.group(2))) if m else T.DecimalType(10, 0)
    if base.startswith("timestamp"):
        return T.TimestampType()
    simple = {
        "string": T.StringType(), "varchar": T.StringType(), "char": T.StringType(),
        "text": T.StringType(), "double": T.DoubleType(), "float": T.FloatType(),
        "real": T.FloatType(), "int": T.IntegerType(), "integer": T.IntegerType(),
        "bigint": T.LongType(), "long": T.LongType(), "smallint": T.ShortType(),
        "tinyint": T.ByteType(), "boolean": T.BooleanType(), "bool": T.BooleanType(),
        "date": T.DateType(), "binary": T.BinaryType(), "bytes": T.BinaryType(),
        "varbinary": T.BinaryType(),
    }
    if base not in simple:
        raise ValueError(f"unsupported column type in DDL: {s!r}")
    return simple[base]


def _balanced(text: str, open_idx: int) -> int:
    """Index just past the ')' matching the '(' at open_idx."""
    depth = 0
    in_str = False
    for i in range(open_idx, len(text)):
        c = text[i]
        if in_str:
            in_str = c != "'"
            continue
        if c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parentheses in DDL")


def _split_top_level(body: str) -> list[str]:
    parts, depth, cur, in_str = [], 0, [], False
    for c in body:
        if in_str:
            cur.append(c)
            in_str = c != "'"
            continue
        if c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
            continue
        cur.append(c)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


_PK_RE = re.compile(
    r"^PRIMARY\s+KEY\s*\(([^)]*)\)(\s+NOT\s+ENFORCED)?$", re.IGNORECASE
)
# 'k' = 'v' (Flink WITH) | k 'v' | k = 'v' (Spark OPTIONS)
_OPT_RE = re.compile(r"(?:'([^']+)'|(\w+))\s*=?\s*'([^']*)'")


def parse_ddl(statement: str) -> DDLStatement | None:
    """Parse a CREATE/DROP TABLE statement with a connector options
    clause. Returns None when the statement is not engine DDL (plain
    SELECTs, and CREATEs without WITH/USING, fall through to Spark)."""
    stmt = statement.strip().rstrip(";")
    m = _DROP_RE.match(stmt)
    if m:
        return DDLStatement(
            action="drop", name=m.group(2), if_exists=bool(m.group(1))
        )
    m = _CREATE_RE.match(stmt)
    if not m:
        return None
    tail_probe = stmt.upper()
    if " WITH " not in tail_probe.replace("\n", " ") and " USING " not in tail_probe.replace("\n", " "):
        return None  # not connector DDL — let spark.sql handle it
    name = m.group(1)
    open_idx = stmt.index("(", m.end() - 1)
    close = _balanced(stmt, open_idx)
    body = stmt[open_idx + 1 : close - 1]
    fields: list[T.StructField] = []
    key: list[str] = []
    for item in _split_top_level(body):
        pk = _PK_RE.match(item)
        if pk:
            key = [c.strip().strip("`") for c in pk.group(1).split(",")]
            continue
        cm = re.match(r"`?(\w+)`?\s+(.+)$", item, re.DOTALL)
        if not cm:
            raise ValueError(f"cannot parse column definition: {item!r}")
        fields.append(T.StructField(cm.group(1), _parse_sql_type(cm.group(2))))
    tail = stmt[close:]
    options: dict = {}
    kind = "upsert"
    um = re.search(r"\bUSING\s+`?(\w+)`?", tail, re.IGNORECASE)
    if um:
        kind = um.group(1).lower()
    om = re.search(r"\b(?:WITH|OPTIONS)\s*\(", tail, re.IGNORECASE)
    if om:
        oend = _balanced(tail, om.end() - 1)
        for g1, g2, val in _OPT_RE.findall(tail[om.end() : oend - 1]):
            options[(g1 or g2).lower()] = val
    connector = options.pop("connector", None)
    if connector:
        kind = {"hudi": "upsert", "upsert": "upsert", "filesystem": "parquet",
                "parquet": "parquet",
                # the reference's source connector (zpln:1060 ¶24) and
                # the engine's own format both register a feed dir
                "postgres-cdc": "feed", "cdcfeed": "feed",
                }.get(connector.lower(), connector.lower())
    return DDLStatement(
        action="create",
        name=name,
        if_not_exists="IF NOT EXISTS" in stmt.upper()[: m.end()],
        schema=T.StructType(fields),
        key=key,
        kind=kind,
        options=options,
    )


_CTAS_RE = re.compile(
    r"^\s*CREATE\s+TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?`?(?P<name>\w+)`?"
    r"\s*(?P<clauses>(?:USING\s+`?\w+`?\s*|(?:WITH|OPTIONS)\s*\(.*?\)\s*)*)"
    r"\bAS\s+(?P<select>SELECT\b.*)$",
    re.IGNORECASE | re.DOTALL,
)


def parse_ctas(statement: str) -> tuple[DDLStatement, str] | None:
    """Parse CREATE TABLE ... [USING kind] [OPTIONS/WITH (...)] AS
    SELECT — the CTAS spelling (no column list; the schema comes from
    the SELECT). Returns (ddl, select_sql) or None when the statement
    is not CTAS. The record key comes from a ``key`` option
    (comma-separated) since CTAS has no PRIMARY KEY clause."""
    stmt = statement.strip().rstrip(";")
    m = _CTAS_RE.match(stmt)
    if m is None:
        return None
    clauses = m.group("clauses") or ""
    kind = "upsert"
    um = re.search(r"\bUSING\s+`?(\w+)`?", clauses, re.IGNORECASE)
    if um:
        kind = um.group(1).lower()
    options: dict = {}
    om = re.search(r"\b(?:WITH|OPTIONS)\s*\(", clauses, re.IGNORECASE)
    if om:
        oend = _balanced(clauses, om.end() - 1)
        for g1, g2, val in _OPT_RE.findall(clauses[om.end() : oend - 1]):
            options[(g1 or g2).lower()] = val
    connector = options.pop("connector", None)
    if connector:
        kind = {"hudi": "upsert", "upsert": "upsert",
                "filesystem": "parquet", "parquet": "parquet"}.get(
            connector.lower(), connector.lower()
        )
    key = [
        c.strip() for c in options.pop("key", "").split(",") if c.strip()
    ]
    ddl = DDLStatement(
        action="create",
        name=m.group("name"),
        if_not_exists=bool(m.group("ine")),
        schema=None,
        key=key,
        kind=kind,
        options=options,
    )
    return ddl, m.group("select")
