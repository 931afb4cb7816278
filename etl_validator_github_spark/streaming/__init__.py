"""Structured Streaming equivalents of the reference's file-watch loop."""

from etl_validator_github_spark.streaming.pipeline import stream_validate

__all__ = ["stream_validate"]
