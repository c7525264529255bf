"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side-by-side, compares row count,
column-name set, and an order-insensitive canonicalized value multiset
(columns sorted by name — matching the driver's contract in
``__spark_entry__.py``). Used by the test suite so every declared query
is verified locally before the driver ever sees it.
"""

from __future__ import annotations

import math

import duckdb

from firebolt_spark.catalog import TABLES


def open_oracle(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def _canon_value(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly; both engines hand back the
        # same IEEE754 bits for identical results
        return repr(v)
    return str(v)


def canonicalize(columns: list[str], rows) -> list[str]:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [
        "\x01".join(_canon_value(row[i]) for i in order)
        for row in rows
    ]
    out.sort()
    return out


# DuckDB type name → Spark simpleString, for width-strict schema compare
_DUCK_TO_SPARK_TYPE = {
    "INTEGER": "int",
    "BIGINT": "bigint",
    "HUGEINT": "hugeint",  # deliberately unmapped-to-spark: flags a mismatch
    "SMALLINT": "smallint",
    "TINYINT": "tinyint",
    "DOUBLE": "double",
    "FLOAT": "float",
    "VARCHAR": "string",
    "BOOLEAN": "boolean",
    "TIMESTAMP": "timestamp",
    "TIMESTAMP_NS": "timestamp",
    "DATE": "date",
    "BLOB": "binary",
}


def _normalize_duck_type(t: str) -> str:
    if t.endswith("[]"):
        return f"array<{_normalize_duck_type(t[:-2])}>"
    return _DUCK_TO_SPARK_TYPE.get(t, t.lower())


def _duck_types(con, sql: str) -> dict[str, str]:
    rel = con.sql(sql)
    return {
        c: _normalize_duck_type(str(t)) for c, t in zip(rel.columns, rel.types)
    }


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> dict:
    """Returns dict with match booleans and diagnostics."""
    spark_rows = spark_df.collect()
    spark_cols = list(spark_df.columns)
    spark_types = {
        f.name: f.dataType.simpleString() for f in spark_df.schema.fields
    }
    res = con.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()
    duck_types = _duck_types(con, sql)

    type_diffs = {
        c: (spark_types.get(c), duck_types.get(c))
        for c in set(spark_cols) & set(duck_cols)
        if spark_types.get(c) != duck_types.get(c)
        # decimal payload queries deliberately cast at the edges; any
        # remaining decimal-vs-decimal spelling difference is benign
        and not (
            str(spark_types.get(c, "")).startswith("decimal")
            and str(duck_types.get(c, "")).startswith("decimal")
        )
    }

    result = {
        "spark_rows": len(spark_rows),
        "duck_rows": len(duck_rows),
        "rows_match": len(spark_rows) == len(duck_rows),
        "spark_cols": sorted(spark_cols),
        "duck_cols": sorted(duck_cols),
        "cols_match": sorted(spark_cols) == sorted(duck_cols),
        "type_diffs": type_diffs,
        "types_match": not type_diffs,
        "values_match": False,
        "first_diff": None,
    }
    if not (result["rows_match"] and result["cols_match"]):
        return result
    s = canonicalize(spark_cols, spark_rows)
    d = canonicalize(duck_cols, duck_rows)
    result["values_match"] = s == d
    if not result["values_match"]:
        for i, (a, b) in enumerate(zip(s, d)):
            if a != b:
                result["first_diff"] = {"idx": i, "spark": a, "duck": b}
                break
        else:
            result["first_diff"] = {"idx": min(len(s), len(d)), "spark": "<end>", "duck": "<end>"}
    return result
