"""Session construction and plan-inspection helpers."""

from etl_validator_github_spark.plans.session import get_spark, explain_str

__all__ = ["get_spark", "explain_str"]
