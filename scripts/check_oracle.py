"""Local stand-in for the driver's correctness gate: run registry
queries at sf0.01 in Spark AND their DuckDB oracle SQL, compare
row count, column names, and order-insensitive values.

Run:  python scripts/check_oracle.py [query ...]   (default: all with oracles)
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def norm_cell(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    if v is None:
        return ""
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )


def main(argv: list[str]) -> int:
    from pyspark.sql import SparkSession

    from streaming_data_lake_flink_cdc_apache_hudi_spark.plans.queries import QUERIES

    names = argv or [n for n, s in QUERIES.items() if s.oracle is not None]
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("check_oracle")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )
    failed = []
    for name in names:
        spec = QUERIES[name]
        if spec.oracle is None:
            print(f"{name}: SKIP (no oracle)")
            continue
        try:
            df = spec.fn(spark, SF_DIR)
            s_cols = df.columns
            s_rows = [tuple(r) for r in df.collect()]
            rel = con.execute(spec.oracle)
            o_cols = [d[0] for d in rel.description]
            o_rows = rel.fetchall()
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ERROR {type(e).__name__}: {e}")
            failed.append(name)
            continue
        ok_rows = len(s_rows) == len(o_rows)
        ok_schema = sorted(s_cols) == sorted(o_cols)
        ok_vals = ok_schema and norm_rows(s_cols, s_rows) == norm_rows(
            o_cols, o_rows
        )
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        print(
            f"{name}: {status} rows={len(s_rows)}/{len(o_rows)} "
            f"schema={ok_schema} values={ok_vals}"
        )
        if status == "FAIL":
            failed.append(name)
    spark.stop()
    if failed:
        print("FAILED:", ", ".join(failed))
        return 1
    print("all green")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
