"""Per-run resource telemetry for the spans burst bisect (r12): wall
time vs executor CPU time vs spill vs CPU MHz, via the Spark REST
stage API. Same entry point and force convention as measure_1m.py.

Finding (MEASURE_1M_r12.jsonl): identical work every run (7.93 GB
shuffle write, zero spill, GC < 4%) while executorCpuTime swings up to
4.4x and wall tracks CPU exactly -> the bursting resource is host CPU
throughput, not anything a Spark config reaches.

Usage: python tools/spans_bisect.py [n_runs] [shuffle_partitions]
"""
import json, os, sys, threading, time, urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from etl_validator_github_spark.plans.session import get_spark
from etl_validator_github_spark.scale.dedup import substring_span_stats

N_RUNS = int(sys.argv[1]) if len(sys.argv) > 1 else 8
SHUF = int(sys.argv[2]) if len(sys.argv) > 2 else 64

spark = get_spark(app_name="spans-bisect", master="local[32]",
                  shuffle_partitions=SHUF,
                  extra_conf={"spark.driver.memory": "48g",
                              "spark.ui.enabled": "true"})
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl


def rest(path):
    with urllib.request.urlopen(f"{ui}/api/v1/{path}", timeout=10) as r:
        return json.load(r)


app_id = rest("applications")[0]["id"]


def stage_rollup():
    out = {}
    for s in rest(f"applications/{app_id}/stages?status=complete"):
        out[(s["stageId"], s["attemptId"])] = {
            "run_ms": s["executorRunTime"],
            "cpu_ms": s.get("executorCpuTime", 0) / 1e6,
            "spill_mem": s["memoryBytesSpilled"],
            "spill_disk": s["diskBytesSpilled"],
            "gc_ms": s.get("jvmGcTime", 0),
            "sh_write": s.get("shuffleWriteBytes", 0),
            "input": s.get("inputBytes", 0),
        }
    return out


def cpu_mhz():
    vals = []
    with open("/proc/cpuinfo") as f:
        for line in f:
            if line.startswith("cpu MHz"):
                vals.append(float(line.split(":")[1]))
    return sum(vals) / max(len(vals), 1)


docs = spark.read.parquet("/tmp/spark_graft_1m/docs_1000000.parquet")
results = []
for i in range(N_RUNS):
    before = stage_rollup()
    mhz_samples = []
    stop = threading.Event()

    def sampler():
        while not stop.is_set():
            mhz_samples.append(cpu_mhz())
            stop.wait(3.0)

    th = threading.Thread(target=sampler, daemon=True); th.start()
    t0 = time.perf_counter()
    substring_span_stats(docs).write.format("noop").mode("overwrite").save()
    wall = time.perf_counter() - t0
    stop.set(); th.join(timeout=1)
    after = stage_rollup()
    new = {k: v for k, v in after.items() if k not in before}
    agg = {m: sum(v[m] for v in new.values())
           for m in ("run_ms", "cpu_ms", "spill_mem", "spill_disk",
                     "gc_ms", "sh_write", "input")}
    rec = {
        "run": i, "wall_s": round(wall, 1), "shuffle_partitions": SHUF,
        "exec_run_s": round(agg["run_ms"] / 1000, 1),
        "exec_cpu_s": round(agg["cpu_ms"] / 1000, 1),
        "gc_s": round(agg["gc_ms"] / 1000, 1),
        "spill_mem_gb": round(agg["spill_mem"] / 2**30, 2),
        "spill_disk_gb": round(agg["spill_disk"] / 2**30, 2),
        "sh_write_gb": round(agg["sh_write"] / 2**30, 2),
        "input_gb": round(agg["input"] / 2**30, 2),
        "mhz_mean": round(sum(mhz_samples) / max(len(mhz_samples), 1)),
        "mhz_min": round(min(mhz_samples) if mhz_samples else 0),
        "load_1m": round(os.getloadavg()[0], 1),
    }
    results.append(rec)
    print(json.dumps(rec), flush=True)
print(json.dumps({"all": results}))
