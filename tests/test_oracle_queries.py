"""Every declared query must match the DuckDB oracle (the driver's t2
gate, run locally at sf0.001 for speed — the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod
from tests.conftest import SF_DIR
from tests.oracle_utils import compare, open_oracle

QUERIES = entry_mod.queries()
ORACLE = entry_mod.oracle_sql()


@pytest.fixture(scope="module")
def oracle_con():
    con = open_oracle(SF_DIR)
    yield con
    con.close()


def test_every_oracle_key_has_a_query():
    assert set(ORACLE) <= set(QUERIES)


def test_query_names_unique_across_modules():
    """A name collision between query modules would silently overwrite
    an entry in the aggregated dicts — fail loudly instead."""
    from firebolt_spark.queries import llm, reference, relational

    mods = [reference.QUERIES, relational.QUERIES, llm.QUERIES]
    names = [n for m in mods for n in m]
    assert len(names) == len(set(names)), sorted(
        n for n in set(names) if names.count(n) > 1
    )


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_oracle_match(name, spark, oracle_con):
    res = compare(QUERIES[name](spark, SF_DIR), oracle_con, ORACLE[name])
    assert res["rows_match"], f"row count: {res['spark_rows']} vs {res['duck_rows']}"
    assert res["cols_match"], f"cols: {res['spark_cols']} vs {res['duck_cols']}"
    assert res["types_match"], f"type diffs: {res['type_diffs']}"
    assert res["values_match"], f"first diff: {res['first_diff']}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLE)))
def test_rows_only_queries_run(name, spark):
    assert QUERIES[name](spark, SF_DIR).count() >= 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_declared_query_returns_complex_columns(name, spark):
    """The driver's canonicalizer sorts a pandas frame over all columns;
    list/dict cells are unhashable and crash it (the r1 ERR on
    q_array_functions/q_grouped_collect, repeated in r2 on
    q_embedding_quantize/q_multimodal_features). Declared queries must
    therefore emit only scalar top-level columns — arrays go out as
    deterministic strings (to_json / array_join). Schema-only: no job
    is run."""
    from pyspark.sql import types as T

    schema = QUERIES[name](spark, SF_DIR).schema
    offenders = [
        f"{f.name}:{f.dataType.simpleString()}"
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not offenders, (
        f"{name} emits complex-typed top-level columns {offenders}; "
        "stringify them in the declared query (the operator may keep "
        "the typed column)"
    )


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert set(df.columns) == {"event_id", "user_id", "event_type", "value", "k"}
