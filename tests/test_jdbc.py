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
