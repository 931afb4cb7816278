"""Events analytics semantics: the ordered funnel
(queries/relational.py::_events_funnel — stage timestamps must be
strictly increasing AND inside the conversion window, users stall at
the stage where either condition fails) and the exact-integer hourly
anomaly flag (hourly_anomalies)."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from etl_validator_github_spark.queries.relational import (
    FUNNEL_WINDOW_US,
    _events_funnel,
)

_HOUR_US = 3600 * 1_000_000


def _events(spark, tmp_path, rows):
    # (user_id, event_type, hours_offset)
    base = 1_700_000_000_000_000  # µs epoch, arbitrary
    pdf = pd.DataFrame({
        "event_id": range(len(rows)),
        "ts": pd.to_datetime(
            [base + h * _HOUR_US for _, _, h in rows], unit="us"
        ),
        "user_id": [u for u, _, _ in rows],
        "event_type": [t for _, t, _ in rows],
        "value": [1.0] * len(rows),
        "props": ['{"k": 1}'] * len(rows),
    })
    path = str(tmp_path / "events.parquet")
    pdf.to_parquet(path)
    return str(tmp_path)


def test_funnel_window_and_order(spark, tmp_path):
    window_h = FUNNEL_WINDOW_US // _HOUR_US
    rows = [
        # user 1: full conversion inside the window at every step.
        (1, "view", 0), (1, "click", 1), (1, "purchase", 2),
        # user 2: clicks BEFORE viewing → stalls at stage 1.
        (2, "click", 0), (2, "view", 1),
        # user 3: click arrives after the window → stage 1 only.
        (3, "view", 0), (3, "click", window_h + 1),
        # user 4: converts to click; purchase outside ITS window.
        (4, "view", 0), (4, "click", 2), (4, "purchase", 2 + window_h + 1),
        # user 5: never views → not in the funnel at all.
        (5, "purchase", 0),
    ]
    sf_dir = _events(spark, tmp_path, rows)
    got = {r.user_id: r for r in _events_funnel(spark, sf_dir).collect()}
    assert set(got) == {1, 2, 3, 4}
    assert got[1].stage == 3
    assert (got[1].t2_us - got[1].t1_us) == _HOUR_US
    assert got[2].stage == 1 and got[2].t2_us is None
    assert got[3].stage == 1
    assert got[4].stage == 2 and got[4].t3_us is None


def test_hourly_anomalies_exact_two_sigma(spark):
    """Hand-computed 2σ flag: nine quiet hours of 10 events and one
    spike hour of 60. N=10, S=150, Q=4500: spike dev = 10·60−150 = 450,
    450² = 202500 > 4·(10·4500−150²) = 90000 → flagged; quiet hours
    dev = −50, 2500 < 90000 → not flagged. A perfectly uniform type
    produces no rows (variance 0 with a strict > comparison)."""
    from pyspark.sql import functions as F

    from etl_validator_github_spark.queries.relational import (
        hourly_anomalies,
    )

    _H = 3600 * 1_000_000
    rows = []
    for h in range(9):
        rows += [("spiky", h)] * 10
    rows += [("spiky", 9)] * 60
    for h in range(10):
        rows += [("flat", h)] * 7
    ev = spark.createDataFrame(
        [(t, h * _H) for t, h in rows], "event_type: string, ts_us: long"
    )
    out = hourly_anomalies(ev).collect()
    assert [(r.event_type, r.hour_epoch // 3600, r.dev_sign, r.n_events)
            for r in out] == [("spiky", 9, 1, 60)]
    r = out[0]
    assert r.n_hours == 10
    assert r.mean_milli == (1000 * 150) // 10   # 15000


def test_hourly_anomalies_property_matches_pure_python(spark):
    """Property fuzz: for random small hourly tables, the Spark flags
    equal an exact pure-Python recomputation of
    (N·n−S)² > 4·(N·Q−S²)."""
    import random

    from etl_validator_github_spark.queries.relational import (
        hourly_anomalies,
    )

    _H = 3600 * 1_000_000
    rng = random.Random(11)
    for trial in range(6):
        cells = {}
        for t in ("a", "b", "c")[: rng.randint(1, 3)]:
            for h in range(rng.randint(1, 8)):
                cells[(t, h)] = rng.randint(1, 9)
        rows = [(t, h * _H) for (t, h), n in cells.items()
                for _ in range(n)]
        ev = spark.createDataFrame(
            rows, "event_type: string, ts_us: long"
        )
        got = {(r.event_type, r.hour_epoch // 3600): r.dev_sign
               for r in hourly_anomalies(ev).collect()}

        expect = {}
        for t in {t for t, _ in cells}:
            ns = [n for (tt, _), n in cells.items() if tt == t]
            N, S, Q = len(ns), sum(ns), sum(n * n for n in ns)
            for (tt, h), n in cells.items():
                if tt != t:
                    continue
                dev = N * n - S
                if dev * dev > 4 * (N * Q - S * S):
                    expect[(t, h)] = 1 if dev > 0 else -1
        assert got == expect, f"trial {trial}: {got} != {expect}"


def test_gapfill_hand_computed(spark, tmp_path):
    """Gap-fill/forward-fill semantics on a constructed series: hours
    {0, 3} present for type A (gaps 1-2 carry hour 0's sum), a
    single-hour type B has a 1-row dense grid with no gaps."""
    from etl_validator_github_spark.queries import CATALOG

    rows = [
        (1, "A", 0), (2, "A", 0),      # hour 0: n=2, sum=200 cents
        (3, "A", 3),                   # hour 3: n=1, sum=100 cents
        (4, "B", 5),
    ]
    sf = _events(spark, tmp_path, rows)
    got = {
        (r.event_type, r.bucket_hour % 100): r
        for r in CATALOG["events_hourly_gapfill"].build(spark, sf).collect()
    }
    base_h = 1_700_000_000_000_000 // _HOUR_US
    a = {h: got[("A", (base_h + h) % 100)] for h in range(4)}
    assert [(r.n_events, r.is_gap, r.filled_sum_cents)
            for r in a.values()] == [
        (2, 0, 200), (0, 1, 200), (0, 1, 200), (1, 0, 100),
    ]
    b = got[("B", (base_h + 5) % 100)]
    assert (b.n_events, b.is_gap, b.filled_sum_cents) == (1, 0, 100)
    assert len(got) == 5


def test_winsorized_stats_hand_computed(spark, tmp_path):
    """Winsorize vs a pure-Python mirror on a known series: ceil-rank
    cutoffs, clamp counts, and the exact clamped sum."""
    from etl_validator_github_spark.queries import CATALOG

    vals = list(range(1, 21))                    # type A: $1..$20
    rows = [(i, "A", 0) for i in range(20)]
    sf = _events(spark, tmp_path, rows)
    # _events writes value=1.0 for all rows; rewrite with the series.
    pdf = pd.read_parquet(f"{sf}/events.parquet")
    pdf["value"] = [float(v) for v in vals]
    pdf.to_parquet(f"{sf}/events.parquet")

    row = CATALOG["events_winsorized_stats"].build(spark, sf).collect()[0]
    cents = sorted(v * 100 for v in vals)
    n = len(cents)
    lo = cents[(5 * n + 99) // 100 - 1]
    hi = cents[(95 * n + 99) // 100 - 1]
    w = [min(max(c, lo), hi) for c in cents]
    assert (row.n, row.lo_cents, row.hi_cents) == (n, lo, hi)
    assert row.n_clamped_low == sum(1 for c in cents if c < lo) == 0
    assert row.n_clamped_high == sum(1 for c in cents if c > hi) == 1
    assert row.sum_winsor_cents == sum(w)
    assert row.winsor_mean_milli == (10 * sum(w)) // n


def test_hourly_trend_hand_computed(spark, tmp_path):
    """OLS slope vs a pure-Python regression on a constructed series:
    type A rises 1,2,3,4 events over hours 0-3; type B is a single
    bucket (zero denominator → NULL milli-slope, exact num/den = 0)."""
    from etl_validator_github_spark.queries import CATALOG

    rows = []
    eid = 0
    for h, n in enumerate([1, 2, 3, 4]):
        for _ in range(n):
            rows.append((eid, "A", h)); eid += 1
    rows.append((eid, "B", 0))
    sf = _events(spark, tmp_path, rows)
    got = {r.event_type: r
           for r in CATALOG["events_hourly_trend"].build(spark, sf).collect()}

    xs, ys = [0, 1, 2, 3], [1, 2, 3, 4]
    n = len(xs)
    num = n * sum(x * y for x, y in zip(xs, ys)) - sum(xs) * sum(ys)
    den = n * sum(x * x for x in xs) - sum(xs) ** 2
    a = got["A"]
    # num/den go out as STRING since r12 (exact digits; the pair can
    # exceed int64 at 100 TB hourly counts).
    assert (a.n_buckets, a.slope_num, a.slope_den) == (n, str(num), str(den))
    assert a.slope_milli_per_hour == (1000 * num) // den == 1000
    b = got["B"]
    assert (b.n_buckets, b.slope_num, b.slope_den) == (1, "0", "0")
    assert b.slope_milli_per_hour is None


def test_lag_features_respect_dense_grid(spark, tmp_path):
    """On the gap-filled grid the row frames ARE calendar frames: the
    filled gap hour contributes 0 to the rolling sum, lag_1h of the
    hour AFTER a gap is 0 (not the pre-gap value), and series heads
    stay NULL."""
    from etl_validator_github_spark.queries import CATALOG

    rows = [(1, "A", 0), (2, "A", 0), (3, "A", 2)]   # gap at hour 1
    sf = _events(spark, tmp_path, rows)
    base_h = 1_700_000_000_000_000 // _HOUR_US
    got = {r.bucket_hour - base_h: r
           for r in CATALOG["events_lag_features"].build(spark, sf).collect()}
    assert [got[h].n_events for h in (0, 1, 2)] == [2, 0, 1]
    assert got[0].lag_1h is None and got[0].sum_3h == 2
    assert got[1].lag_1h == 2 and got[1].sum_3h == 2
    assert got[2].lag_1h == 0 and got[2].sum_3h == 3   # 2 + 0 + 1
    assert all(got[h].lag_24h is None for h in (0, 1, 2))


def test_session_window_boundary_semantics(spark, tmp_path):
    """Native session_window treats the per-event window as CLOSED
    [t, t+gap]: events exactly gap apart MERGE, one microsecond past
    splits. End = last event + gap."""
    from etl_validator_github_spark.queries import CATALOG
    from etl_validator_github_spark.queries.relational import (
        SESSION_GAP_US,
    )

    base = 1_700_000_000_000_000
    rows = pd.DataFrame({
        "event_id": [0, 1, 2, 3],
        "ts": pd.to_datetime(
            [base, base + SESSION_GAP_US,                    # user 1: == gap
             base + 10 * SESSION_GAP_US,
             base + 11 * SESSION_GAP_US + 1],                # user 2: gap + 1µs
            unit="us"),
        "user_id": [1, 1, 2, 2],
        "event_type": ["view"] * 4,
        "value": [1.0] * 4,
        "props": ['{"k": 1}'] * 4,
    })
    rows.to_parquet(str(tmp_path / "events.parquet"))
    got = {}
    for r in (CATALOG["events_session_windows"]
              .build(spark, str(tmp_path)).collect()):
        got.setdefault(r.user_id, []).append(r)
    assert len(got[1]) == 1                      # exactly gap → merged
    s1 = got[1][0]
    assert s1.n_events == 2
    assert s1.end_us == base + 2 * SESSION_GAP_US
    assert len(got[2]) == 2                      # gap + 1µs → split


def test_sliding_windows_double_count_conservation(spark, tmp_path):
    """2h/1h sliding windows: every event appears in exactly two
    windows, and a known event's two window starts bracket it."""
    from etl_validator_github_spark.queries import CATALOG

    rows = [(1, "A", 0), (2, "A", 1), (3, "B", 5)]
    sf = _events(spark, tmp_path, rows)
    got = CATALOG["events_sliding_windows"].build(spark, sf).collect()
    assert sum(r.n_events for r in got) == 2 * len(rows)
    base_us = 1_700_000_000_000_000
    hour_us = 3600 * 1_000_000
    b_starts = sorted(r.start_us for r in got if r.event_type == "B")
    t3 = base_us + 5 * hour_us
    aligned = (t3 // hour_us) * hour_us     # base is NOT hour-aligned
    assert b_starts == [aligned - hour_us, aligned]
    assert all(s <= t3 < s + 2 * hour_us for s in b_starts)


def test_user_lis_matches_pure_python(spark, tmp_path):
    """Grouped-map applyInPandas LIS vs a from-scratch O(n²) DP — hand
    case plus the sf0.001 fixture users."""
    from etl_validator_github_spark.functions.grouped import (
        lis_length,
        user_lis_report,
    )
    from etl_validator_github_spark.queries.relational import load_events

    def brute(vals):
        best = {}
        for i, v in enumerate(vals):
            best[i] = 1 + max(
                (best[j] for j in range(i) if vals[j] < v), default=0)
        return max(best.values(), default=0)

    # Hand case: values 3,1,4,1,5,9,2,6 → LIS 1,4,5,9 or 1,4,5,6 = 4.
    vals = [3, 1, 4, 1, 5, 9, 2, 6]
    assert lis_length(vals) == brute(vals) == 4

    ev = load_events(spark, "/root/testdata/sf0.001")
    got = {r.user_id: (r.n_events, r.lis_len)
           for r in user_lis_report(ev).collect()}
    rows = ev.select("user_id", "ts_us", "event_id",
                     (F.round(F.col("value") * 100)).cast("long")
                     .alias("c")).collect()
    series: dict = {}
    for r in sorted(rows, key=lambda r: (r.ts_us, r.event_id)):
        series.setdefault(r.user_id, []).append(r.c)
    for u, vals in series.items():
        assert got[u] == (len(vals), brute(vals)), u
    assert any(l > 1 for _, l in got.values())
