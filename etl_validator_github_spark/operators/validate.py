"""Single-pass validation: DataFrame -> DataFrame + errors column.

The physical design choice from SURVEY.md §4: evaluate the ENTIRE rule
catalog in one projection producing an ``array<string>`` column — one scan,
no per-rule shuffles, whole-stage codegen applies. At 100 TB this is a
map-only stage; the only shuffle in the pipeline is the final per-payee
aggregation in operators/errors.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from etl_validator_github_spark.operators.rules import (
    Rule,
    compile_any_violation,
    compile_rules,
    compiled_bankdata_errors,
    compiled_bankdata_violations,
)
from etl_validator_github_spark.schema import schema_diff

ERRORS_COL = "__errors"


def with_errors(
    df: DataFrame,
    rules: list[Rule] | None = None,
    errors_col: str = ERRORS_COL,
) -> DataFrame:
    """Append an ``array<string>`` column of rule-violation messages."""
    if rules is None:
        # Memoized expression handles for the default catalog: building
        # the tree costs ~20k py4j round trips (~2.5 s/call, r13) while
        # the Columns are static — see rules.compiled_bankdata_errors.
        return df.withColumn(errors_col, compiled_bankdata_errors())
    return df.withColumn(errors_col, compile_rules(rules))


def failing_records(
    df: DataFrame,
    rules: list[Rule] | None = None,
    errors_col: str = ERRORS_COL,
) -> DataFrame:
    """Rows violating at least one rule, with their error list.

    Physical-shape note (measured at 1M rows, 32 threads): a two-phase
    variant — filter on ``compile_any_violation`` (pure boolean, stays
    in whole-stage codegen) then build the array only for survivors —
    executes at the same speed as this single-expression form, because
    per-row cost is dominated by the rlike/translate primitives that
    cost the same compiled or interpreted; but it DOUBLES Catalyst
    planning time (two 50-expression trees instead of one). So the
    simple form wins end-to-end. Revisit only if the violation-rate ×
    rule-count product grows enough that skipping array construction on
    clean rows matters.
    """
    return with_errors(df, rules, errors_col).filter(F.size(errors_col) > 0)


def summarize_rule_violations(
    df: DataFrame,
    rules: list[Rule] | None = None,
) -> DataFrame:
    """Error frequency by rule message, one codegen pass — equivalent to
    ``summarize_errors(with_errors(df))`` but structurally cheaper.

    The array+explode form pays three ways (measured at n=200k, r13):
    the optimizer's InferFiltersFromGenerate re-evaluates the whole rule
    array in an inferred ``size()>0`` filter below the explode (the
    guide §4.4 duplication class, for expressions); ``array_compact``
    lowers to a higher-order lambda that kicks the entire per-row stage
    out of whole-stage codegen; and every violation materializes an
    exploded row. Here each rule compiles to ONE ``sum(violation)``
    counter in a single map-side aggregation — no array, no Generate,
    codegen end to end, and the shuffle carries one partial row per
    task. Messages shared by several rules are re-merged by the final
    (≤ |rules| rows) groupBy; zero-count messages are dropped, matching
    the explode form exactly.
    """
    if rules is None:
        aggs, pairs = _default_summary_exprs()  # memoized handles (r13)
    else:
        if not rules:
            # df.agg() with zero aggregates raises; the pre-r13
            # explode form returned an empty frame here (ADVICE r13).
            return df.sparkSession.createDataFrame(
                [], "error_desc string, error_count bigint"
            )
        comp = [(r.message, r.violation_expr()) for r in rules]
        aggs, pairs = _summary_exprs(comp)
    counts = df.agg(*aggs)
    return (
        counts.select(F.explode(pairs).alias("p"))
        .select("p.error_desc", "p.error_count")
        .groupBy("error_desc")
        .agg(F.sum("error_count").alias("error_count"))
        .filter(F.col("error_count") > 0)
        .orderBy("error_desc")
    )


def _summary_exprs(
    comp: list[tuple[str, Column]],
) -> tuple[list[Column], Column]:
    """(per-rule sum aggregates, message/count unpivot array) for
    ``summarize_rule_violations``."""
    aggs = [
        F.sum(v.cast("long")).alias(f"_r{i}")
        for i, (_, v) in enumerate(comp)
    ]
    pairs = F.array(*[
        F.struct(F.lit(m).alias("error_desc"),
                 F.col(f"_r{i}").alias("error_count"))
        for i, (m, _) in enumerate(comp)
    ])
    return aggs, pairs


#: Default-catalog summary expressions, memoized like the violation
#: handles they wrap (expression-only memo; ~110 Column builds saved
#: per call). Keyed on the py4j gateway identity so a gateway relaunch
#: rebuilds the handles (ADVICE r13).
_DEFAULT_SUMMARY: dict[int, tuple[list[Column], Column]] = {}


def _default_summary_exprs() -> tuple[list[Column], Column]:
    from etl_validator_github_spark.plans.session import gateway_token

    tok = gateway_token()
    got = _DEFAULT_SUMMARY.get(tok)
    if got is None:
        got = _DEFAULT_SUMMARY[tok] = _summary_exprs(
            compiled_bankdata_violations())
    return got


def validate_schema(df: DataFrame) -> dict[str, list[str]]:
    """File-level validation (R24): missing / extra columns vs canonical.

    The reference detects missing (PIPE:2279-2328), renamed (PIPE:2330-2408)
    and extra (PIPE:3289-3323) columns before row rules run; a rename shows
    up as one missing + one extra entry.
    """
    return schema_diff(df.columns)


def summarize_errors(errors_df: DataFrame, errors_col: str = ERRORS_COL) -> DataFrame:
    """Error frequency by rule message — map-side partial agg then a tiny
    shuffle on the (small-cardinality) message key; safe at any scale."""
    return (
        errors_df.select(F.explode(errors_col).alias("error_desc"))
        .groupBy("error_desc")
        .agg(F.count(F.lit(1)).alias("error_count"))
        .orderBy("error_desc")
    )
