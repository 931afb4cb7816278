"""Readers and writers for every format the reference touches
(SURVEY.md §2.1 S1-S13)."""

from etl_validator_github_spark.sources.io import (
    read_bankdata,
    read_error_csv,
    read_pipe_csv,
    raw_data_row_count,
    write_bankdata,
    write_single_csv,
)

__all__ = [
    "read_bankdata",
    "read_error_csv",
    "read_pipe_csv",
    "raw_data_row_count",
    "write_bankdata",
    "write_single_csv",
]
