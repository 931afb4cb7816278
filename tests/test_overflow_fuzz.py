"""Adversarial-magnitude pins for the 128-bit accumulator lane.

The r12 int64-overflow audit (commit 537f419) moved the product-sum
accumulators of `events_hourly_anomalies`, `events_hourly_trend`,
`lineitem_discount_elasticity` and `orders_mann_whitney` into
DECIMAL(38,0) on Spark / HUGEINT on DuckDB. The proof was analytical;
these tests make it empirical WITHOUT big data: each property drives
the exact expression strings from queries/relational.py over one-row
frames whose inputs are drawn so that the intermediates provably leave
int64 (> 2⁶³) while staying inside both 128-bit lanes (< 10³⁸ decimal
digits / HUGEINT range), and pins Spark == DuckDB == pure-Python big
ints digit-for-digit.

Safe envelopes per family (why the draws look the way they do):
- anomalies dev²/var4 (relational.py:2459): |dev| < 2⁶³ keeps dev²
  < 8.6e37; var4 is pinned through a drawn delta so |var4| ≲ 4e36.
- anomalies mean_milli (the r12 ADVICE fix, relational.py:2476):
  1000·S leaves int64 whenever S > 9.2e15; n_hours ≥ 1000 keeps the
  BIGINT output cast in range.
- trend/elasticity moments (relational.py:2617-2623, 5601-5618): sxy
  is already a >int64 DECIMAL aggregate; n·sxy − sx·sy stays < 10³⁸
  for n ≤ 10⁴, sx ≤ 10¹⁰.
- mann-whitney u1_x2 / tie_cubes (relational.py:6474, oracle
  :6509-6511): r1_x2 ~ N² rows leaves int64 past N ≈ 3e9; t³ leaves
  int64 past t ≈ 2.1e6 and stays in-lane below t ≈ 2e12.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_slow = settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_I63 = 2 ** 63


def _pin(spark, bigints, hugeints, spark_exprs, duck_exprs, expect):
    """Evaluate the named expressions over a one-row literal frame on
    BOTH engines and require digit-for-digit agreement with ``expect``
    (pure-Python big-int ground truth, stringified)."""
    assert set(spark_exprs) == set(duck_exprs) == set(expect)
    s_lits = [f"CAST({v} AS BIGINT) AS {k}" for k, v in bigints.items()]
    s_lits += [f"CAST('{v}' AS DECIMAL(38,0)) AS {k}"
               for k, v in hugeints.items()]
    s_sel = ", ".join(f"CAST(({e}) AS STRING) AS {k}"
                      for k, e in spark_exprs.items())
    srow = spark.sql(
        f"SELECT {s_sel} FROM (SELECT {', '.join(s_lits)})"
    ).collect()[0].asDict()

    d_lits = [f"CAST({v} AS BIGINT) AS {k}" for k, v in bigints.items()]
    d_lits += [f"CAST('{v}' AS HUGEINT) AS {k}"
               for k, v in hugeints.items()]
    d_sel = ", ".join(f"CAST(({e}) AS VARCHAR) AS {k}"
                      for k, e in duck_exprs.items())
    con = duckdb.connect()
    drow = dict(zip(
        list(duck_exprs),
        con.execute(
            f"SELECT {d_sel} FROM (SELECT {', '.join(d_lits)})"
        ).fetchone(),
    ))

    want = {k: str(v) for k, v in expect.items()}
    assert srow == want, (srow, want)
    assert drow == want, (drow, want)


@_slow
@given(
    nh=st.integers(1, 3),
    n_base=st.integers(2 ** 61, 2 ** 62),
    dev_mag=st.integers(2 ** 32, 2 ** 61),
    dev_neg=st.booleans(),
    delta_mag=st.integers(2 ** 62, 10 ** 36),
    delta_neg=st.booleans(),
)
def test_anomalies_dev_var4_flag_beyond_int64(spark, nh, n_base, dev_mag,
                                              dev_neg, delta_mag, delta_neg):
    """The 2σ comparison (N·n − S)² > 4(N·Q − S²) with dev² and var4
    both far past 2⁶³ — exactly where the pre-537f419 int64 plan
    wrapped silently. dev and the var4 delta are drawn directly (with
    |dev| ≥ 2³², |delta| ≥ 2⁶²) so the >int64 guarantee holds by
    construction for every example."""
    n = n_base // nh                       # nh·n ∈ [~2⁶¹, 2⁶²]
    dev = -dev_mag if dev_neg else dev_mag
    s = nh * n - dev                       # stays within ±2⁶³ BIGINT
    assert 0 <= s < _I63
    delta = -delta_mag if delta_neg else delta_mag
    q = (s * s + delta) // nh              # keeps |var4| ≲ 4·10³⁶
    var4 = 4 * (nh * q - s * s)
    assert dev * dev > _I63 and abs(var4) > _I63  # genuinely >int64
    dev_e = "CAST(nh AS {T}) * n - s"
    var4_e = "4 * (CAST(nh AS {T}) * q - CAST(s AS {T}) * s)"
    exprs = {
        "dev_sq": f"({dev_e}) * ({dev_e})",
        "var4": var4_e,
        "flag": f"({dev_e}) * ({dev_e}) > {var4_e}",
    }
    _pin(
        spark,
        bigints={"nh": nh, "n": n, "s": s},
        hugeints={"q": q},
        spark_exprs={k: e.replace("{T}", "DECIMAL(38,0)")
                     for k, e in exprs.items()},
        duck_exprs={k: e.replace("{T}", "HUGEINT")
                    for k, e in exprs.items()},
        expect={
            "dev_sq": dev * dev,
            "var4": var4,
            "flag": "true" if dev * dev > var4 else "false",
        },
    )


@_slow
@given(
    s=st.integers(10 ** 16, _I63 - 1),
    nh=st.integers(1000, 10 ** 6),
)
def test_anomalies_mean_milli_beyond_int64(spark, s, nh):
    """The r12 ADVICE expression: 1000·S must ride the 128-bit lane
    (S > 9.2e15 wraps int64) while the floored quotient re-enters
    BIGINT losslessly."""
    assert 1000 * s > _I63
    _pin(
        spark,
        bigints={"s": s, "nh": nh},
        hugeints={},
        spark_exprs={"mean_milli":
                     "CAST((1000 * CAST(s AS DECIMAL(38,0))) div nh"
                     "     AS BIGINT)"},
        duck_exprs={"mean_milli":
                    "CAST((1000 * CAST(s AS HUGEINT)) // nh AS BIGINT)"},
        expect={"mean_milli": (1000 * s) // nh},
    )


@_slow
@given(
    nb=st.integers(2, 10 ** 4),
    sx=st.integers(0, 10 ** 10),
    sy=st.integers(2 ** 32, _I63 - 1),
    sxy=st.integers(2 ** 63, 10 ** 25),
    sxx=st.integers(2 ** 63, 10 ** 25),
)
def test_trend_elasticity_moments_beyond_int64(spark, nb, sx, sy, sxy, sxx):
    """The shared slope algebra of events_hourly_trend and
    lineitem_discount_elasticity: num = n·Σxy − Σx·Σy and
    den = n·Σx² − (Σx)² with the Σxy/Σx² aggregates already past 2⁶³
    (they arrive as DECIMAL(38,0)/HUGEINT columns, as in the plans)."""
    num = nb * sxy - sx * sy
    den = nb * sxx - sx * sx
    assert abs(num) < 10 ** 38 and abs(den) < 10 ** 38
    exprs = {
        "num": "CAST(nb AS {T}) * sxy - CAST(sx AS {T}) * sy",
        "den": "CAST(nb AS {T}) * sxx - CAST(sx AS {T}) * sx",
    }
    _pin(
        spark,
        bigints={"nb": nb, "sx": sx, "sy": sy},
        hugeints={"sxy": sxy, "sxx": sxx},
        spark_exprs={k: e.replace("{T}", "DECIMAL(38,0)")
                     for k, e in exprs.items()},
        duck_exprs={k: e.replace("{T}", "HUGEINT")
                    for k, e in exprs.items()},
        expect={"num": num, "den": den},
    )


@_slow
@given(
    n1=st.integers(1, 3 * 10 ** 9),
    n2=st.integers(1, 3 * 10 ** 9),
    r1_x2=st.integers(2 ** 63, 10 ** 30),
    t=st.integers(3 * 10 ** 6, 2 * 10 ** 12),
)
def test_mann_whitney_ranksum_beyond_int64(spark, n1, n2, r1_x2, t):
    """u1_x2 = R1·2 − n1(n1+1) with the doubled rank-sum past 2⁶³
    (≈ N² at 3e9 rows), and the per-group tie term t³ − t past 2⁶³
    (t > 2.1e6)."""
    assert t ** 3 - t > _I63
    exprs = {
        "u1_x2": "r1_x2 - CAST(n1 AS {T}) * (n1 + 1)",
        "tie_term": "CAST(t AS {T}) * t * t - t",
    }
    _pin(
        spark,
        bigints={"n1": n1, "n2": n2, "t": t},
        hugeints={"r1_x2": r1_x2},
        spark_exprs={k: e.replace("{T}", "DECIMAL(38,0)")
                     for k, e in exprs.items()},
        duck_exprs={k: e.replace("{T}", "HUGEINT")
                    for k, e in exprs.items()},
        expect={
            "u1_x2": r1_x2 - n1 * (n1 + 1),
            "tie_term": t ** 3 - t,
        },
    )
