"""Ad-hoc runner: verify declared queries against DuckDB at a given SF.

Usage: python tests/run_oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from firebolt_spark import get_spark  # noqa: E402
from tests.oracle_utils import compare, open_oracle  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--vanilla"]
    vanilla = "--vanilla" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.001"
    only = set(args[1:])

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()
    oracle = entry_mod.oracle_sql()

    if vanilla:
        # simulate the driver: a plain SparkSession with no engine confs
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.appName("oracle-check-vanilla")
            .master("local[8]")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = open_oracle(sf_dir)

    failures = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        # operator-persisted intermediates (minhash signatures etc.)
        # would otherwise accumulate across the 81-query sweep;
        # gc.collect() additionally lets the ContextCleaner free
        # localCheckpoint blocks (global_row_number/global_cumsum) that
        # clearCache does not cover (ADVICE r3)
        spark.catalog.clearCache()
        import gc

        gc.collect()
        if name not in oracle:
            n = fn(spark, sf_dir).count()
            print(f"{name:28s} rows-only: {n}")
            continue
        try:
            res = compare(fn(spark, sf_dir), con, oracle[name])
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR: {exc}")
            failures.append(name)
            continue
        ok = (
            res["rows_match"]
            and res["cols_match"]
            and res["values_match"]
            and res["types_match"]
        )
        status = "OK " if ok else "FAIL"
        print(
            f"{name:28s} {status} rows={res['spark_rows']}/{res['duck_rows']}"
            + (
                ""
                if ok
                else f" cols={res['cols_match']} types={res['type_diffs']} "
                f"diff={res['first_diff']}"
            )
        )
        if not ok:
            failures.append(name)
    spark.stop()
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
