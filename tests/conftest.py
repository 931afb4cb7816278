import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_validator_github_spark.contract import TABLES  # noqa: E402
from etl_validator_github_spark.plans.session import get_spark  # noqa: E402
from etl_validator_github_spark.queries import CATALOG  # noqa: E402

#: Parquet dir the oracle-parity/dtype tests run against.
SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

#: Every catalog query that carries a DuckDB oracle.
ORACLE_NAMES = sorted(n for n, q in CATALOG.items() if q.oracle is not None)


@pytest.fixture(scope="session")
def spark():
    session = get_spark(
        app_name="etl-validator-tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "4g"},
    )
    yield session


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the testdata tables registered as views —
    the same setup the driver uses to run oracle SQL."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    yield con
    con.close()
