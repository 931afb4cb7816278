"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship query (the validation engine's error summary
over the customer table at sf0.001). ``queries``/``oracle_sql`` expose
the full operator catalog from ``etl_validator_github_spark.queries``:
every SURVEY.md §2 operator family plus the scale extensions (dedup,
similarity search, text analysis, multimodal plumbing), each with a
DuckDB oracle where SQL-expressible. Determinism engineering notes live
in ``etl_validator_github_spark/contract.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_validator_github_spark.queries import (
    CATALOG,
    catalog_to_oracles,
    catalog_to_queries,
)

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return queries()["validate_customer_rules"](spark, _SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 + extensions."""
    return catalog_to_queries(CATALOG)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query (omitted only for engine-side
    generation, e.g. bankdata_validate)."""
    return catalog_to_oracles(CATALOG)
