"""S11 JDBC wrapper: option-plumbing tests only (no live database in
this environment; the reference's DB is SQL Server over ODBC,
PIPE:730-929)."""

from __future__ import annotations

import pytest

from etl_validator_github_spark.sources.jdbc import (
    SQLSERVER_DRIVER,
    jdbc_options,
    sqlserver_url,
)


def test_sqlserver_url_mirrors_reference_conn_string():
    url = sqlserver_url("dbhost:1433", "MTFDM_STG")
    assert url == (
        "jdbc:sqlserver://dbhost:1433;databaseName=MTFDM_STG"
        ";trustServerCertificate=true"
    )
    assert "trustServerCertificate" not in sqlserver_url(
        "h", "d", trust_server_certificate=False
    )


def test_jdbc_options_table_read():
    opts = jdbc_options(
        "jdbc:sqlserver://h;databaseName=d",
        table="[MTFDM_STG].[PAYEE_ERROR_STG]",
        user="u", password="p", driver=SQLSERVER_DRIVER,
    )
    assert opts["dbtable"] == "[MTFDM_STG].[PAYEE_ERROR_STG]"
    assert opts["user"] == "u" and opts["password"] == "p"
    assert opts["driver"] == SQLSERVER_DRIVER
    assert opts["fetchsize"] == "10000"
    assert "query" not in opts


def test_jdbc_options_query_read():
    opts = jdbc_options("jdbc:x", query="SELECT 1 AS one")
    assert opts["query"] == "SELECT 1 AS one"
    assert "dbtable" not in opts


def test_jdbc_options_partitioned_read_quartet():
    opts = jdbc_options(
        "jdbc:x", table="t", partition_column="id",
        lower_bound=0, upper_bound=1_000_000, num_partitions=32,
    )
    assert opts["partitionColumn"] == "id"
    assert opts["lowerBound"] == "0"
    assert opts["upperBound"] == "1000000"
    assert opts["numPartitions"] == "32"


def test_jdbc_options_rejects_bad_combinations():
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_options("jdbc:x")
    with pytest.raises(ValueError, match="exactly one"):
        jdbc_options("jdbc:x", table="t", query="q")
    with pytest.raises(ValueError, match="all of"):
        jdbc_options("jdbc:x", table="t", partition_column="id")
    with pytest.raises(ValueError, match="requires table"):
        jdbc_options(
            "jdbc:x", query="q", partition_column="id",
            lower_bound=0, upper_bound=10, num_partitions=2,
        )


# ---------------------------------------------------------------------------
# LIVE end-to-end: Spark ships an embedded Derby (for the Hive
# metastore), which is a real JDBC database in the same JVM — so the
# S11 read path can be exercised for real: create a table over JDBC,
# read it back through read_jdbc with the partitioned-read quartet,
# and verify filter pushdown reaches the JDBC scan.
# ---------------------------------------------------------------------------


def _derby_seed(spark, db: str, n: int = 100) -> None:
    jvm = spark._jvm
    conn = jvm.java.sql.DriverManager.getConnection(
        f"jdbc:derby:memory:{db};create=true"
    )
    try:
        st = conn.createStatement()
        st.execute(
            "CREATE TABLE payees "
            "(payee_id INT NOT NULL, name VARCHAR(40), bal DOUBLE)"
        )
        ps = conn.prepareStatement("INSERT INTO payees VALUES (?, ?, ?)")
        for i in range(n):
            ps.setInt(1, i)
            ps.setString(2, f"payee{i}")
            ps.setDouble(3, i * 1.5)
            ps.addBatch()
        ps.executeBatch()
        conn.commit()
    finally:
        conn.close()


def test_jdbc_partitioned_read_against_live_derby(spark):
    from etl_validator_github_spark.sources.jdbc import read_jdbc

    _derby_seed(spark, "live1")
    df = read_jdbc(
        spark, "jdbc:derby:memory:live1",
        table="payees",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        partition_column="payee_id",
        lower_bound=0, upper_bound=100, num_partitions=4,
        fetchsize=50,
    )
    # The partitioned-read quartet yields real parallel partitions.
    assert df.rdd.getNumPartitions() == 4
    rows = df.collect()
    assert len(rows) == 100
    assert {r["PAYEE_ID"] for r in rows} == set(range(100))

    # Predicate + projection push down INTO the JDBC source: the scan
    # must carry the BAL filter and read only PAYEE_ID.
    flt = df.filter(df["BAL"] > 120.0).select("PAYEE_ID")
    got = sorted(r["PAYEE_ID"] for r in flt.collect())
    assert got == list(range(81, 100))
    p = flt._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThan(BAL,120.0)" in p, p
    assert "ReadSchema: struct<PAYEE_ID:int>" in p, p


def test_jdbc_error_table_roundtrip_closes_reconciliation(spark, tmp_path):
    """The reference's E3 loop with a REAL database side: rule engine →
    error CSV sink AND error rows written to a live Derby table over
    JDBC (the Glue→PAYEE_ERROR_STG load) → both sides read back and
    reconciled. 'Row counts MATCH' against an actual DB round-trip, not
    an in-memory re-derivation."""
    from pyspark.sql import functions as F

    from etl_validator_github_spark.generator import generate_bankdata
    from etl_validator_github_spark.operators import mutate
    from etl_validator_github_spark.operators.errors import to_error_records
    from etl_validator_github_spark.operators.reconcile import reconcile_errors
    from etl_validator_github_spark.operators.validate import failing_records
    from etl_validator_github_spark.sources.io import (
        read_error_csv,
        write_single_csv,
    )
    from etl_validator_github_spark.sources.jdbc import read_jdbc, write_jdbc

    df = mutate.overwrite_column(
        generate_bankdata(spark, 20, seed=246), "RoutingTransitNumber", "BAD1"
    )
    errors = to_error_records(failing_records(df), filename="f.parquet")

    csv_path = write_single_csv(errors, str(tmp_path), "errs.csv")
    url = "jdbc:derby:memory:errdb;create=true"
    write_jdbc(
        errors.select(
            F.col("PayeeId").alias("PAYEE_ID"), "ERROR_DESC"
        ),
        url, "PAYEE_ERROR_STG",
        mode="overwrite",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
        num_partitions=2,
        # Without the override Spark maps string→CLOB on Derby, which
        # is unfilterable; VARCHAR keeps the staging table queryable.
        create_table_column_types=(
            "PAYEE_ID VARCHAR(40), ERROR_DESC VARCHAR(1000)"
        ),
    )

    csv_side = read_error_csv(spark, csv_path)
    db_side = read_jdbc(
        spark, url, table="PAYEE_ERROR_STG",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    rec = reconcile_errors(csv_side, db_side)
    assert rec.counts_match and rec.passed
    assert rec.csv_count == rec.db_count > 0
    # And the DB side is genuinely queryable (pushdown works post-VARCHAR).
    assert db_side.filter(F.col("PAYEE_ID").isNotNull()).count() == rec.db_count


def test_jdbc_query_read_against_live_derby(spark):
    from etl_validator_github_spark.sources.jdbc import read_jdbc

    _derby_seed(spark, "live2", n=10)
    df = read_jdbc(
        spark, "jdbc:derby:memory:live2",
        query="SELECT payee_id, bal FROM payees WHERE payee_id < 5",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert sorted(r["PAYEE_ID"] for r in df.collect()) == [0, 1, 2, 3, 4]
