"""JDBC source access (SURVEY.md §3 entry point C).

The reference pokes the OLTP source database directly from notebook
paragraphs — psycopg2 `SELECT ... LIMIT` previews and row mutations
(CDC-Hudi-Notebook.zpln:821 ¶18, :895 ¶20) — to inspect what the CDC
pipeline will see. The Spark-first equivalent is `spark.read.jdbc`:
the preview stays declarative (LIMIT pushes down as a subquery), and
the full-table snapshot read partitions on a numeric column so a
1000-executor cluster splits the source scan instead of funneling it
through one connection.

No database driver is bundled beyond what Spark ships; pass
``driver`` for e.g. PostgreSQL (`org.postgresql.Driver`) with the jar
on the executor classpath.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound=None,
    upper_bound=None,
    num_partitions: int | None = None,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """Read a source table over JDBC.

    With ``partition_column`` (+ bounds + num_partitions) the scan is
    split into range predicates executed by parallel tasks — the only
    way a big snapshot phase (S1) scales; an unpartitioned JDBC read
    is a single connection no matter the cluster size.
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None or num_partitions is None:
            raise ValueError(
                "partitioned JDBC read needs partition_column, lower_bound, "
                "upper_bound AND num_partitions together"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def preview_source(
    spark: SparkSession,
    url: str,
    table: str,
    n: int = 5,
    driver: str | None = None,
    **options: str,
) -> DataFrame:
    """`SELECT * FROM table LIMIT n` pushed into the database (≙ the
    reference's psycopg2 preview paragraphs, ¶18/¶20): the LIMIT runs
    source-side via a dbtable subquery, so previewing a billion-row
    table moves n rows, not the table."""
    sub = f"(SELECT * FROM {table} FETCH FIRST {int(n)} ROWS ONLY) preview_sub"
    reader = (
        spark.read.format("jdbc").option("url", url).option("dbtable", sub)
    )
    if driver:
        reader = reader.option("driver", driver)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
