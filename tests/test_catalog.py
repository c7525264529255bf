"""Catalog: view registration exposes the full SQL surface over the
fixture corpus (SURVEY §7.0 (4))."""

from __future__ import annotations

from firebolt_spark.catalog import TABLES, load_table, register_views
from tests.conftest import SF_DIR


def test_register_views_enables_plain_sql(spark):
    register_views(spark, SF_DIR)
    row = spark.sql(
        """
        SELECT n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n DESC, n_name LIMIT 1
        """
    ).first()
    assert row["n"] > 0 and row["n_name"].startswith("NATION_")


def test_all_tables_load_with_normalized_timestamps(spark):
    for t in TABLES:
        df = load_table(spark, SF_DIR, t)
        assert df.count() > 0
        for f in df.schema.fields:
            # no raw nanos-longs or NTZ leak out of the catalog
            assert "timestamp_ntz" not in f.dataType.simpleString()
