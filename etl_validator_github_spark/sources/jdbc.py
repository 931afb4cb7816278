"""JDBC source (SURVEY.md §2.1 S11).

The reference reads its DB side over a pyodbc connection to SQL Server
(DM_bankfile_validate_pipeline.py:730-929: JOB_CONTROL batch lookup,
PAYEE_ERROR_STG error rows). The Spark-native equivalent is
``spark.read.jdbc`` — the driver-side cursor loop disappears and the read
distributes across executors when a partition column is supplied.

This module is a thin, config-only wrapper: it builds the option dict
(unit-testable without a live database — there is none in this
environment) and hands it to ``spark.read.format("jdbc")``. At 100 TB
scale the load-bearing options are the partitioned-read quartet
(``partitionColumn``/``lowerBound``/``upperBound``/``numPartitions``) —
without them a JDBC read is a single-task bottleneck — plus
``fetchsize`` (default JDBC fetch sizes are tuned for OLTP cursors, not
bulk extraction) and ``pushDownPredicate`` (on by default; filters reach
the database as WHERE clauses).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Spark's bundled driver class for SQL Server (public Microsoft JDBC
#: driver); callers targeting other databases pass ``driver`` explicitly.
SQLSERVER_DRIVER = "com.microsoft.sqlserver.jdbc.SQLServerDriver"


def sqlserver_url(server: str, database: str, *,
                  trust_server_certificate: bool = True) -> str:
    """jdbc:sqlserver URL mirroring the reference's ODBC conn string
    (PIPE:739-746, including TrustServerCertificate=yes)."""
    opts = f";databaseName={database}"
    if trust_server_certificate:
        opts += ";trustServerCertificate=true"
    return f"jdbc:sqlserver://{server}{opts}"


def jdbc_options(
    url: str,
    *,
    table: str | None = None,
    query: str | None = None,
    user: str | None = None,
    password: str | None = None,
    driver: str | None = None,
    fetchsize: int = 10_000,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int | None = None,
) -> dict[str, str]:
    """Build the option dict for a JDBC read (pure function — the
    unit-testable surface).

    Exactly one of ``table``/``query``; the partitioned-read quartet must
    be supplied together (Spark requires all four), and splits
    ``partition_column`` into ``num_partitions`` stride ranges.
    """
    if (table is None) == (query is None):
        raise ValueError("exactly one of table= or query= is required")
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetchsize)}
    if table is not None:
        opts["dbtable"] = table
    else:
        opts["query"] = query  # type: ignore[assignment]
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    if driver is not None:
        opts["driver"] = driver
    quartet = (partition_column, lower_bound, upper_bound, num_partitions)
    if any(v is not None for v in quartet):
        if any(v is None for v in quartet):
            raise ValueError(
                "partitioned read needs all of partition_column, "
                "lower_bound, upper_bound, num_partitions"
            )
        if query is not None:
            raise ValueError(
                "partitioned read requires table= (Spark disallows "
                "partitionColumn with query=)"
            )
        opts.update(
            partitionColumn=str(partition_column),
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    return opts


def read_jdbc(spark: SparkSession, url: str, **kwargs) -> DataFrame:
    """S11: ``spark.read`` over JDBC with the options from
    :func:`jdbc_options`. Lazy — no connection until an action runs."""
    return spark.read.format("jdbc").options(**jdbc_options(url, **kwargs)).load()


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str | None = None,
    user: str | None = None,
    password: str | None = None,
    batchsize: int = 10_000,
    num_partitions: int | None = None,
    create_table_column_types: str | None = None,
) -> None:
    """S11 write side: the reference's Glue job loads error rows into
    ``[MTFDM_STG].[PAYEE_ERROR_STG]`` (PIPE:853-929 reads them back);
    Spark-native that load is ``df.write.jdbc``.

    Scale knobs: ``batchsize`` batches INSERTs per round-trip (JDBC
    defaults are OLTP-sized), ``num_partitions`` caps concurrent
    connections — every task opens one, so an uncapped 2000-partition
    error frame would open 2000 sessions against the database.
    ``create_table_column_types`` overrides Spark's default DDL mapping
    (e.g. string→CLOB on some dialects, which breaks predicate pushdown
    on the read-back; VARCHAR widths keep the table queryable).
    """
    out = df
    if num_partitions is not None:
        out = out.coalesce(num_partitions)
    writer = (
        out.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
    )
    if driver is not None:
        writer = writer.option("driver", driver)
    if user is not None:
        writer = writer.option("user", user)
    if password is not None:
        writer = writer.option("password", password)
    if create_table_column_types is not None:
        writer = writer.option(
            "createTableColumnTypes", create_table_column_types
        )
    writer.mode(mode).save()
