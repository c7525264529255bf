"""Targeted sf10 oracle sweep for new/changed queries (standing close
policy: operator-bearing queries earn an sf10 row when they land or
when their operator changes).  Compares engine vs DuckDB at the 100x
fixture and records per-query walls.

Usage:
  python tools/run_sf10_targeted.py OUT.json [--round N] [--note TEXT] \
      query [query ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from firebolt_spark import get_spark  # noqa: E402
from tests.oracle_utils import compare, open_oracle  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("--round", type=int, default=0)
    ap.add_argument("--note", default="")
    ap.add_argument(
        "--sf-dir", default="/root/repo/testdata_sf10_flat"
    )
    ap.add_argument("queries", nargs="+")
    args = ap.parse_args()

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracle = entry_mod.oracle_sql()
    spark = get_spark("sf10-targeted")
    spark.sparkContext.setLogLevel("ERROR")
    con = open_oracle(args.sf_dir)

    walls: dict[str, float] = {}
    ok: list[str] = []
    failures: list[dict] = []
    for name in args.queries:
        spark.catalog.clearCache()
        import gc

        gc.collect()
        t0 = time.perf_counter()
        try:
            # wall = the ENGINE side only (noop sink), matching the
            # r14/r15 artifacts; the oracle replay runs after and is
            # not billed to the query
            df = queries[name](spark, args.sf_dir)
            df.write.mode("overwrite").format("noop").save()
            walls[name] = round(time.perf_counter() - t0, 1)
            res = compare(queries[name](spark, args.sf_dir), con, oracle[name])
            good = (
                res["rows_match"]
                and res["cols_match"]
                and res["types_match"]
                and res["values_match"]
            )
            if good:
                ok.append(name)
                print(f"{name}: OK wall={walls[name]}s rows={res['spark_rows']}")
            else:
                failures.append({
                    "query": name,
                    "rows": [res["spark_rows"], res["duck_rows"]],
                    "type_diffs": res["type_diffs"],
                    "first_diff": res["first_diff"],
                })
                print(f"{name}: FAIL {res['first_diff']}")
        except Exception as exc:  # noqa: BLE001
            failures.append({"query": name, "error": str(exc)[:300]})
            print(f"{name}: ERROR {exc}")
    out = {
        "round": args.round,
        "sf_dir": args.sf_dir,
        "note": args.note,
        "ok": len(ok),
        "total": len(args.queries),
        "failures": failures,
        "queries_ok": ok,
        "walls_s": walls,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"ok": len(ok), "total": len(args.queries)}))
    spark.stop()
    return 0 if len(ok) == len(args.queries) else 1


if __name__ == "__main__":
    raise SystemExit(main())
