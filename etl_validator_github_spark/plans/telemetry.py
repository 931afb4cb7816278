"""Per-run CPU attribution over the Spark REST stage API.

The r12 spans-burst root-cause (tools/spans_bisect.py, SCALE.md) showed
byte-identical work swinging 4.4x in executorCpuTime under host-level
CPU throttling — wall time alone cannot distinguish "box slow" from
"operator regressed". This meter folds that capture into every timed
run: snapshot the completed-stage totals before a run, diff after, and
the run carries its own ``cpu_s``/``gc_s``/spill attribution. Because
repeated runs do identical work, a run whose cpu_s is far above the
op's session minimum executed the same instructions on slower cycles —
a throttle verdict computable per-run, no multi-pass archaeology.

Requires ``spark.ui.enabled=true`` on the session (the bench/measure
entry points opt in; the test default keeps the UI off and the meter
degrades to returning None rather than failing the measurement).
"""

from __future__ import annotations

import json
import urllib.request

#: A run whose cpu_s exceeds the op's session-minimum cpu_s by this
#: factor on identical work is flagged as throttle-suspect (the r12
#: bisect saw clean runs agree within ~10% and throttled runs at
#: 1.9-4.4x).
CPU_THROTTLE_RATIO = 1.5

#: Below this many CPU-seconds per run the ratio is scheduler noise,
#: not throttle evidence (a 50 ms task set can swing 3x between runs
#: without any host story) — the flag stays unset.
CPU_FLOOR_S = 1.0


class StageCpuMeter:
    """Delta-meter over ``/api/v1/applications/<id>/stages``.

    Totals are summed over COMPLETE stages only; a run's delta is taken
    after its action returns, when its stages have completed. Stage-UI
    eviction (spark.ui.retainedStages) would make totals non-monotonic
    on very long sessions — a negative delta is returned as None rather
    than a bogus number.
    """

    def __init__(self, spark) -> None:
        try:
            self._ui = spark.sparkContext.uiWebUrl
            self._app = self._rest("applications")[0]["id"] \
                if self._ui else None
        except Exception:
            self._ui = None
            self._app = None

    def _rest(self, path: str):
        with urllib.request.urlopen(f"{self._ui}/api/v1/{path}",
                                    timeout=10) as r:
            return json.load(r)

    def snapshot(self) -> "dict[str, float] | None":
        if not self._ui or not self._app:
            return None
        try:
            tot = {"cpu_s": 0.0, "gc_s": 0.0, "run_s": 0.0,
                   "spill_bytes": 0.0, "shuffle_write": 0.0}
            path = f"applications/{self._app}/stages?status=complete"
            for s in self._rest(path):
                tot["cpu_s"] += s.get("executorCpuTime", 0) / 1e9
                tot["gc_s"] += s.get("jvmGcTime", 0) / 1e3
                tot["run_s"] += s.get("executorRunTime", 0) / 1e3
                tot["spill_bytes"] += (s.get("memoryBytesSpilled", 0)
                                       + s.get("diskBytesSpilled", 0))
                tot["shuffle_write"] += s.get("shuffleWriteBytes", 0)
            return tot
        except Exception:
            return None

    def delta(self, before: "dict[str, float] | None") \
            -> "dict[str, float] | None":
        after = self.snapshot()
        if before is None or after is None:
            return None
        d = {k: round(after[k] - before[k], 3) for k in after}
        if d["cpu_s"] < 0:        # stage eviction rolled the totals back
            return None
        return d


def cpu_ratio(cpu_runs: "list[float | None]") -> "float | None":
    """max/min cpu_s over a query's WARM runs (run 1 pays one-off
    footer/codegen work and is excluded, mirroring the stable-pair
    rule; None entries skipped) — the per-op throttle indicator:
    identical work, ratio > CPU_THROTTLE_RATIO means some runs
    executed on materially slower cycles."""
    vals = [c for c in cpu_runs[1:]
            if isinstance(c, (int, float)) and c > 0]
    if len(vals) < 2:
        return None
    return round(max(vals) / min(vals), 2)


def throttle_suspect(cpu_runs: "list[float | None]") -> bool:
    """True when the warm-run CPU ratio exceeds CPU_THROTTLE_RATIO on
    substantive work (min warm cpu >= CPU_FLOOR_S)."""
    vals = [c for c in cpu_runs[1:]
            if isinstance(c, (int, float)) and c > 0]
    ratio = cpu_ratio(cpu_runs)
    return (ratio is not None and ratio > CPU_THROTTLE_RATIO
            and min(vals) >= CPU_FLOOR_S)
