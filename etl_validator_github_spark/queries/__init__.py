"""Driver-contract query catalog: every implemented operator from
SURVEY.md §2 plus the scale extensions, each paired with a DuckDB oracle
where SQL-expressible."""

from __future__ import annotations

from etl_validator_github_spark.contract import (
    Query,
    catalog_to_oracles,
    catalog_to_queries,
)
from etl_validator_github_spark.queries.relational import RELATIONAL_QUERIES
from etl_validator_github_spark.queries.validation import VALIDATION_QUERIES
from etl_validator_github_spark.scale.dedup import DEDUP_QUERIES
from etl_validator_github_spark.scale.multimodal import MULTIMODAL_QUERIES
from etl_validator_github_spark.scale.similarity import SIMILARITY_QUERIES
from etl_validator_github_spark.scale.text import TEXT_QUERIES

CATALOG: dict[str, Query] = {
    **RELATIONAL_QUERIES,
    **VALIDATION_QUERIES,
    **TEXT_QUERIES,
    **DEDUP_QUERIES,
    **SIMILARITY_QUERIES,
    **MULTIMODAL_QUERIES,
}

__all__ = ["CATALOG", "Query", "catalog_to_oracles", "catalog_to_queries"]
