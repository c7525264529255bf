#!/usr/bin/env python
"""Paired A/B of one registered query between two checkouts — the
measurement discipline PERF.md applies to any cross-round wall-time
claim (both sides in ONE host window, warm-JVM min-of-N, interleaved
B A B A — ref side first, so the first-process cold penalty lands on
the REFERENCE, never inflating HEAD — and a drifting host shows up as
within-side spread instead of a phantom regression).

Usage:
    python tools/ab_query_bench.py <query> <ref_commit> [sf_dir] [runs]

Creates a temporary git worktree for <ref_commit> inside the repo
(removed afterwards), runs the query against BOTH trees' code in
alternating fresh processes, and prints one JSON line per process plus
a paired summary. The fixture dir defaults to testdata_sf1 (the 10x
scale step, where the flagged regressions live).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import gc, json, os, sys, time
tree = sys.argv[1]
query = sys.argv[2]
sf_dir = sys.argv[3]
runs = int(sys.argv[4])
sys.path.insert(0, tree)
from firebolt_spark import get_spark
from firebolt_spark.queries import all_queries
spark = get_spark("ab-bench")
fn = all_queries()[query]
samples = []
for _ in range(runs):
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
    samples.append(round(time.perf_counter() - t0, 3))
    spark.catalog.clearCache()
    gc.collect()
print("AB_RESULT " + json.dumps({
    "tree": tree, "samples": samples, "min": min(samples),
    "loadavg": round(os.getloadavg()[0], 2),
}))
"""


def _run_side(tree: str, query: str, sf_dir: str, runs: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = tree
    out = subprocess.run(
        [sys.executable, "-c", CHILD, tree, query, sf_dir, str(runs)],
        capture_output=True, text=True, env=env, cwd=tree,
    )
    for line in out.stdout.splitlines():
        if line.startswith("AB_RESULT "):
            return json.loads(line[len("AB_RESULT "):])
    raise RuntimeError(
        f"child failed for {tree}:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}"
    )


def main() -> None:
    query = sys.argv[1]
    ref = sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else f"{REPO}/testdata_sf1"
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    wt = os.path.join(REPO, f".ab_{ref[:10]}")
    # a killed prior run (finally never fires on SIGKILL) leaves the
    # worktree registered and would fail the add — clear it first
    subprocess.run(
        ["git", "worktree", "remove", "--force", wt],
        cwd=REPO, capture_output=True,
    )
    subprocess.run(["git", "worktree", "prune"], cwd=REPO, capture_output=True)
    add = subprocess.run(
        ["git", "worktree", "add", "--detach", wt, ref],
        cwd=REPO, capture_output=True, text=True,
    )
    if add.returncode != 0:
        raise RuntimeError(f"git worktree add failed:\n{add.stderr[-2000:]}")
    try:
        results = []
        for side, tree in [("B", wt), ("A", REPO), ("B", wt), ("A", REPO)]:
            r = _run_side(tree, query, sf_dir, runs)
            r["side"] = side
            results.append(r)
            print(json.dumps(r))
        mins = {
            s: min(r["min"] for r in results if r["side"] == s)
            for s in ("A", "B")
        }
        print(json.dumps({
            "query": query, "sf_dir": sf_dir, "ref": ref,
            "head_min_s": mins["A"], "ref_min_s": mins["B"],
            "ratio_head_vs_ref": round(mins["A"] / mins["B"], 3),
        }))
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt],
            cwd=REPO, capture_output=True,
        )


if __name__ == "__main__":
    main()
