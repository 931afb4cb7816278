"""Shared column-expression helpers (all JVM-side, codegen-friendly)."""

from etl_validator_github_spark.functions.core import (
    is_blank,
    not_blank,
    charset_ok,
    quantize,
    norm_token,
)

__all__ = ["is_blank", "not_blank", "charset_ok", "quantize", "norm_token"]
