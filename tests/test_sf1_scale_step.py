"""Scale-step smoke: a few representative queries must EXECUTE at sf1.

Runs only when the gitignored sf1 fixture exists (regenerate with
`python tools/gen_scaled_fixture.py`). This is not a benchmark — it
pins the class of failure only visible above sf0.1: round 6 found
tpch3's AQE broadcast OOMing the driver heap, tpch1's decimal→double
diverging past 2^53, and tpch21's top-25 tie instability, none of which
any sf<=0.1 run could catch. One query per failure class, plus the
heaviest dedup path, each forced end-to-end with a noop sink."""

from __future__ import annotations

import os

import pytest

from firebolt_spark.queries import all_queries

SF1_DIR = os.path.join(os.path.dirname(os.path.dirname(__file__)), "testdata_sf1")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF1_DIR),
    reason="sf1 fixture not generated (python tools/gen_scaled_fixture.py)",
)


@pytest.mark.parametrize(
    "name",
    [
        "q_tpch3_shipping_priority",  # r6: broadcast-build OOM class
        "q_tpch1_pricing_summary",    # r6: >2^53 decimal→double class
        "q_tpch21_waiting_suppliers", # r6: duplicate-name tie class
        "q_dedup_minhash",            # heaviest corpus-index build
    ],
)
def test_query_executes_at_sf1(spark, name):
    df = all_queries()[name](spark, SF1_DIR)
    df.write.mode("overwrite").format("noop").save()
