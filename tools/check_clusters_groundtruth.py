"""Verify q_dedup_clusters against a driver-side union-find.

The declared oracle for ``q_dedup_clusters`` is a recursive-CTE
transitive closure — exact, but DuckDB 1.0 materializes the full
reachability set, which exhausts its temp disk on the sf10 pair graph
(see ``docs/sf10_full_sweep_r11.json``).  This tool is the
scale-independent check: it collects the SAME candidate pairs the
query clusters (tens of thousands of rows even at sf10 — the pair
graph, not the corpus), runs a plain union-find with min-id labels on
the driver, and compares the exact row set.

Usage:  python tools/check_clusters_groundtruth.py [SF_DIR]
        (default /root/repo/testdata_sf10_flat)

Prints MATCH plus the row/pair counts, exits non-zero on mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# the ONE corpus-dependent collect in the verification path: the pair
# graph is tens of thousands of rows at sf10, but nothing in the API
# bounds it, so a pathological corpus (every doc near-duplicating every
# other) could OOM the driver here. Count first, refuse past the cap.
MAX_PAIRS = 5_000_000


def collect_pairs_bounded(pair_df, max_pairs: int = MAX_PAIRS):
    """Collect the candidate-pair frame after asserting it is
    driver-sized. The count is a cheap aggregate next to the collect it
    guards; on overflow we fail with the sampled alternative spelled
    out instead of letting the driver OOM mid-collect."""
    n = pair_df.count()
    if n > max_pairs:
        raise SystemExit(
            f"pair graph has {n} rows > cap {max_pairs}: too large for a "
            f"driver-side union-find. Re-run on a key-range slice "
            f"(filter doc_a/doc_b) or verify a deterministic sample via "
            f"functions.hash_split and compare per-slice cluster rows."
        )
    return pair_df.collect()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/testdata_sf10_flat"

    from firebolt_spark import get_spark
    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import dedup
    from firebolt_spark.queries import llm

    spark = get_spark("clusters-groundtruth")
    spark.sparkContext.setLogLevel("ERROR")

    out = {(r[0], r[1]) for r in llm.q_dedup_clusters(spark, sf_dir).collect()}
    pair_df = dedup.minhash_candidate_pairs(
        load_table(spark, sf_dir, "documents"),
        max_bucket=llm._MAX_BUCKET_BANDS,
    ).select("doc_a", "doc_b")
    pairs = collect_pairs_bounded(pair_df)

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        ra, rb = find(r["doc_a"]), find(r["doc_b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    comp: dict[int, set[int]] = {}
    for n in list(parent):
        comp.setdefault(find(n), set()).add(n)
    truth = {
        (n, min(members | {root}))
        for root, members in comp.items()
        for n in members | {root}
    }

    print(f"pairs={len(pairs)} operator_rows={len(out)} truth_rows={len(truth)}")
    if truth == out:
        print("MATCH")
        return 0
    print(
        f"MISMATCH: only_operator={len(out - truth)} only_truth={len(truth - out)}"
    )
    return 1


if __name__ == "__main__":
    sys.exit(main())
