"""Iterative DuckDB oracle replay for q_dedup_clusters at scale.

The registered oracle (queries/llm._make_clusters_sql) is a recursive
CTE computing full transitive closure: for a component of k nodes it
materializes O(k^2) (node, reachable) rows per iteration, and DuckDB
1.0's recursive UNION dedups the whole frontier each round — at sf10
(500k docs) that exhausts temp disk (the standing DNF first hit in the
r12 sweep, ROADMAP "q_dedup_clusters sf10 oracle").  The driver-scale
(sf0.01) oracle is unaffected and stays as-is.

This tool replays the SAME semantics with bounded memory: it runs the
registered minhash-pairs SQL once into a temp table, then iterates
min-label propagation — each round one edge join + group-min, O(|E|)
rows, converging in component-diameter rounds — and hands the result
to tests.oracle_utils.compare exactly like every other oracle.  The
replay is still DuckDB executing SQL over the same parquet views; only
the fixpoint loop moved from a recursive CTE to explicit rounds
(VERDICT r15 Next #4: "restructure the replay so the full-sweep
artifact has no asterisk").

Usage: python tools/oracle_clusters_replay.py [sf_dir]
Prints one JSON line: {"query": "q_dedup_clusters", "sf_dir": ...,
"rounds": N, "match": bool, ...compare diagnostics}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebolt_spark import get_spark  # noqa: E402
from firebolt_spark.queries.llm import Q_DEDUP_MINHASH_SQL  # noqa: E402
from tests.oracle_utils import compare, open_oracle  # noqa: E402


def build_clusters_oracle(con, max_rounds: int = 10_000) -> int:
    """Materialize temp table clusters_oracle(doc_id, cluster_id) =
    min-doc_id connected-component labels over the minhash pair graph.
    Returns the number of propagation rounds run (diameter + 1)."""
    # DuckDB 1.0 spills hash joins/aggregates to temp_directory; point
    # it at the repo partition (78 GB free) instead of the default so
    # even a pathological fixture cannot exhaust a small /tmp.
    tmp = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".duckdb_tmp",
    )
    os.makedirs(tmp, exist_ok=True)
    con.execute(f"PRAGMA temp_directory='{tmp}'")
    con.execute(f"CREATE TEMP TABLE pairs AS ({Q_DEDUP_MINHASH_SQL})")
    con.execute(
        "CREATE TEMP TABLE e2 AS "
        "SELECT doc_a AS src, doc_b AS dst FROM pairs "
        "UNION SELECT doc_b, doc_a FROM pairs"
    )
    con.execute(
        "CREATE TEMP TABLE lbl AS "
        "SELECT src AS node, least(src, min(dst)) AS lbl "
        "FROM e2 GROUP BY src"
    )
    rounds = 1
    while rounds < max_rounds:
        # one propagation round: each node takes the min of its own
        # label and its neighbors' labels — O(|E|) join rows, no
        # closure materialization
        con.execute(
            "CREATE TEMP TABLE lbl_next AS "
            "SELECT e2.src AS node, "
            "       least(min(l_self.lbl), min(l_nb.lbl)) AS lbl "
            "FROM e2 "
            "JOIN lbl l_self ON l_self.node = e2.src "
            "JOIN lbl l_nb ON l_nb.node = e2.dst "
            "GROUP BY e2.src"
        )
        changed = con.execute(
            "SELECT count(*) FROM lbl_next n JOIN lbl o ON o.node = n.node "
            "WHERE n.lbl <> o.lbl"
        ).fetchone()[0]
        con.execute("DROP TABLE lbl")
        con.execute("ALTER TABLE lbl_next RENAME TO lbl")
        rounds += 1
        if changed == 0:
            break
    con.execute(
        "CREATE TEMP TABLE clusters_oracle AS "
        "SELECT node AS doc_id, lbl AS cluster_id FROM lbl"
    )
    return rounds


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod

    fn = entry_mod.queries()["q_dedup_clusters"]
    spark = get_spark("clusters-replay", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = open_oracle(sf_dir)
    t0 = time.perf_counter()
    rounds = build_clusters_oracle(con)
    oracle_s = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    res = compare(fn(spark, sf_dir), con, "SELECT * FROM clusters_oracle")
    compare_s = round(time.perf_counter() - t0, 1)
    ok = (
        res["rows_match"]
        and res["cols_match"]
        and res["types_match"]
        and res["values_match"]
    )
    print(json.dumps({
        "query": "q_dedup_clusters",
        "sf_dir": sf_dir,
        "rounds": rounds,
        "oracle_s": oracle_s,
        "compare_s": compare_s,
        "match": ok,
        "rows": res["spark_rows"],
        "oracle_rows": res["duck_rows"],
        "type_diffs": res["type_diffs"],
        "first_diff": res["first_diff"],
    }))
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
