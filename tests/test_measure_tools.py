"""Pins for the measurement harness's commitment/verdict logic
(tools/measure_1m.py) — no Spark session needed.

The fixtures are the RECORDED r12 passes (MEASURE_1M_r12.jsonl): the
bloom pairs must agree at committed 25.9 s and the spans pairs must
disagree (pass C stabilized inside a throttle plateau) — a regression
in the midpoint/agree/committed arithmetic would silently change which
measurements the project trusts.
"""

from __future__ import annotations

import importlib.util
import os

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                      "tools", "measure_1m.py")
_spec = importlib.util.spec_from_file_location("measure_1m", _TOOLS)
m1m = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(m1m)


def test_stable_pair_warm_only_rule():
    # run 1 (cold) can never be half of the pair; first warm pair wins.
    assert m1m._stable_pair([151.4, 66.2, 59.4]) == (66.2, 59.4)
    assert m1m._stable_pair([111.3, 53.7, 41.7, 31.6, 27.5]) == (31.6, 27.5)
    # a cold-adjacent qualifying pair (r1, r2) must NOT be taken.
    assert m1m._stable_pair([10.0, 10.1, 99.0, 98.0]) == (99.0, 98.0)
    # r11 pass B hit the cap pairless.
    assert m1m._stable_pair([88.3, 45.0, 80.7, 61.1, 24.2, 37.5]) is None
    # scalars / short lists / error strings never pair.
    assert m1m._stable_pair(4.4) is None
    assert m1m._stable_pair([4.4, 4.5]) is None
    assert m1m._stable_pair("err: boom") is None


def test_cross_pass_on_recorded_r12_passes():
    cp = m1m._cross_pass([
        {"spans": [151.4, 66.2, 59.4], "bloom": [43.4, 52.9, 32.1, 31.8]},
        {"spans": [111.3, 53.7, 41.7, 31.6, 27.5],
         "bloom": [32.0, 58.1, 45.1, 23.0, 27.8, 25.9]},
    ])
    # bloom: midpoints 31.95 vs 26.85 = 1.19x -> agree, committed 25.9.
    assert cp["bloom"]["agree"] is True
    assert cp["bloom"]["committed"] == 25.9
    assert cp["bloom"]["basis"] == ["pair", "pair"]
    # spans: 62.8 vs 29.55 = 2.1x -> the throttle plateau is flagged.
    assert cp["spans"]["agree"] is False
    assert cp["spans"]["committed"] is None


def test_cross_pass_warm_and_cold_bases():
    # --repeat 2 lists (no pair possible) compare on the warm run and
    # CAN commit; a false box-flag here was a review finding.
    cp = m1m._cross_pass([{"minhash": [14.1, 12.9]},
                          {"minhash": [15.0, 13.0]}])
    assert cp["minhash"]["agree"] is True
    assert cp["minhash"]["basis"] == ["warm", "warm"]
    assert cp["minhash"]["committed"] == 12.9
    # single cold runs may agree but are never committed.
    cp = m1m._cross_pass([{"rrf": 4.4}, {"rrf": 4.4}])
    assert cp["rrf"]["agree"] is True
    assert cp["rrf"]["basis"] == ["cold", "cold"]
    assert cp["rrf"]["committed"] is None
    # error strings surface as no-rep, never agree.
    cp = m1m._cross_pass([{"x": "err: boom"}, {"x": [5.0, 5.1, 5.2]}])
    assert cp["x"]["agree"] is False and cp["x"]["committed"] is None
    # keys missing from a pass (once-only gen) get no verdict row.
    cp = m1m._cross_pass([{"gen": 9.2, "spans": [30.0, 26.0, 25.0]},
                          {"spans": [29.0, 26.5, 25.5]}])
    assert "gen" not in cp and cp["spans"]["agree"] is True


def test_cross_pass_wall_cpu_verdict():
    """r13: the per-run CPU attribution turns cross-pass disagreement
    into a typed verdict — same instructions on slower cycles is
    'throttle-suspect', wall-only divergence is 'external-wait'."""
    walls = [
        {"agree_op": [30.0, 20.0, 21.0], "hot": [90.0, 60.0, 62.0],
         "waity": [90.0, 60.0, 62.0]},
        {"agree_op": [31.0, 20.5, 20.0], "hot": [40.0, 30.0, 31.0],
         "waity": [40.0, 30.0, 31.0]},
    ]
    cpus = [
        {"agree_op": [900.0, 600.0, 610.0], "hot": [2800.0, 1900.0, 1950.0],
         "waity": [950.0, 620.0, 610.0]},
        {"agree_op": [905.0, 610.0, 605.0], "hot": [1300.0, 950.0, 960.0],
         "waity": [940.0, 600.0, 615.0]},
    ]
    cp = m1m._cross_pass(walls, cpus)
    # wall agrees → no verdict needed.
    assert cp["agree_op"]["agree"] and cp["agree_op"]["wall_cpu_verdict"] is None
    # wall disagrees 2x AND warm cpu minima disagree 2x → throttle.
    assert not cp["hot"]["agree"]
    assert cp["hot"]["wall_cpu_verdict"] == "throttle-suspect"
    # wall disagrees 2x but cpu agrees → the box waited, cycles fine.
    assert not cp["waity"]["agree"]
    assert cp["waity"]["wall_cpu_verdict"] == "external-wait"
    assert cp["hot"]["cpu"] == [cpus[0]["hot"], cpus[1]["hot"]]
    # Without cpu data the verdict fields stay absent (r12 artifacts).
    cp_legacy = m1m._cross_pass(walls)
    assert "cpu" not in cp_legacy["hot"]


def test_telemetry_cpu_ratio_and_throttle_flag():
    from etl_validator_github_spark.plans.telemetry import (
        cpu_ratio,
        throttle_suspect,
    )

    # run 1 is excluded (cold); warm ratio over the rest.
    assert cpu_ratio([9.0, 2.0, 2.2, 4.0]) == 2.0
    assert cpu_ratio([9.0, 2.0]) is None          # one warm run only
    assert cpu_ratio([None, 2.0, None]) is None
    # substantive work + big warm swing → flagged.
    assert throttle_suspect([10.0, 3.0, 6.0])
    # sub-CPU_FLOOR_S noise never flags, whatever the ratio.
    assert not throttle_suspect([0.3, 0.05, 0.3])
    # agreeing warm runs never flag.
    assert not throttle_suspect([10.0, 5.0, 5.3])
