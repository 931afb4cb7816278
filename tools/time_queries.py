"""Warm-timing helper for ad-hoc query subsets (r14 measurement tool).

Usage: python tools/time_queries.py <query> [<query> ...] [--sf DIR]
       [--runs N]

Times each named catalog query with the bench's count() action: run 1
is cold (plan compile + page cache), the reported number is the min of
the warm runs. Prints one JSON line per query and a total.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_validator_github_spark.plans.session import get_spark  # noqa: E402
from etl_validator_github_spark.queries import CATALOG  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    unknown = [q for q in args.queries if q not in CATALOG]
    if unknown:
        ap.error(f"unknown queries: {unknown}")

    spark = get_spark(app_name="time-queries")
    spark.sparkContext.setLogLevel("ERROR")
    totals = {}
    for name in args.queries:
        spark.sparkContext.setJobDescription(f"time: {name}")
        runs = []
        for _ in range(args.runs):
            t0 = time.perf_counter()
            CATALOG[name].build(spark, args.sf).count()
            runs.append(round(time.perf_counter() - t0, 3))
        warm = min(runs[1:]) if len(runs) > 1 else runs[0]
        totals[name] = warm
        print(json.dumps({"query": name, "runs": runs, "warm_min": warm,
                          "load_1m": round(os.getloadavg()[0], 2)}),
              flush=True)
    print(json.dumps({"total_warm": round(sum(totals.values()), 3)}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
