#!/usr/bin/env python
"""c8/c32 scaling pair at sf1, back-to-back in ONE host window
(VERDICT r17 Next #7): the r17 driver's 8-core run landed in a ~2x
quieter window than its 32-core run, so the ≈1 low/high ratios
measured weather, not parallelism. This runs the bench suite against
testdata_sf1 in fresh processes c32 -> c8 -> c32 (the repeated c32
brackets within-window drift), records the three calibration probes
around each side, and writes docs/scaling_sf1_r18.json.

sf1 is the scale where per-query walls (1-20 s) are compute-dominated
rather than planning-dominated, so core-count ratios are meaningful.

Usage: python tools/scaling_sf1.py [runs]
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys
repo = sys.argv[1]
runs = int(sys.argv[2])
sys.path.insert(0, repo)
import bench
from firebolt_spark import get_spark
from firebolt_spark.catalog import load_table

spark = get_spark("scaling-sf1")
spark.sparkContext.setLogLevel("ERROR")
sf1 = os.path.join(repo, "testdata_sf1")
load_table(spark, sf1, "lineitem").count()  # warm footers
cal0 = bench._calibrate(spark)
timings, _med, errors, _sh = bench._run_suite(
    spark, sf1, bench.HEADLINE + bench.EXTRA, runs
)
cal1 = bench._calibrate(spark)
print("SCALING " + json.dumps({
    "cpus": os.environ.get("SPARK_GRAFT_CPUS"),
    "suite_s": round(sum(timings.values()), 3),
    "queries": timings,
    "errors": errors,
    "cal_before": cal0,
    "cal_after": cal1,
    "loadavg": [round(x, 2) for x in os.getloadavg()],
}))
"""


def _run_side(cpus: str, runs: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = cpus
    env["PYTHONPATH"] = REPO
    out = subprocess.run(
        [sys.executable, "-c", CHILD, REPO, str(runs)],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    for line in out.stdout.splitlines():
        if line.startswith("SCALING "):
            return json.loads(line[len("SCALING "):])
    raise RuntimeError(
        f"child c{cpus} failed:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sides = []
    for cpus in ("32", "8", "32"):
        r = _run_side(cpus, runs)
        r["side"] = f"c{cpus}"
        sides.append(r)
        print(json.dumps({k: r[k] for k in
                          ("side", "suite_s", "loadavg", "cal_after")}))
    c32 = {k: min(sides[0]["queries"].get(k, 9e9),
                  sides[2]["queries"].get(k, 9e9))
           for k in sides[0]["queries"]}
    c8 = sides[1]["queries"]
    ratios = {k: round(c8[k] / c32[k], 2)
              for k in c32 if k in c8 and c32[k] > 0}
    summary = {
        "metric": "sf1-scaling-c8-vs-c32",
        "c32_suite_s": min(sides[0]["suite_s"], sides[2]["suite_s"]),
        "c8_suite_s": sides[1]["suite_s"],
        "c32_drift": round(sides[2]["suite_s"] / sides[0]["suite_s"], 3),
        "ratio_c8_over_c32": ratios,
        "sides": sides,
    }
    path = os.path.join(REPO, "docs", "scaling_sf1_r18.json")
    with open(path, "w") as f:
        json.dump(summary, f)
    print(json.dumps({k: summary[k] for k in
                      ("c32_suite_s", "c8_suite_s", "c32_drift")}))
    print(f"written: {path}")


if __name__ == "__main__":
    main()
