"""The declared, oracle-checked query surface of the engine.

Ordering matters: the driver's correctness check walks ``queries()`` in
declaration order under a bounded budget (round 1 covered exactly the
first 50 keys).  ``_PRIORITY`` therefore front-loads one-of-every-family
— all LLM-pipeline queries (unchecked in round 1), all reference-parity
queries, and the headline relational queries (TPC-H, event-time windows,
the two array queries that ERRed in round 1) — so every capability
family lands inside the budget.  The tail queries are relational
variants that already have green rows in CORRECTNESS_r01.json.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Round-7 first-50 rotation (standing VERDICT discipline: least-
# recently-driver-checked first).  CORRECTNESS_r06 covered 50 of the 91
# declared queries; the other 41 were last checked in round 5.  Those 41
# lead this round (slots 1-41, in module order) so that r7 ∪ r6 covers
# all 91 with max staleness one round.
#   * slots 42-50: queries whose implementation or oracle round 7
#     touches — the recall-aware ANN default change and the
#     decimal→double >2^53 oracle audit (VERDICT r6 Next #3/#7).
# Names absent from this list keep their module order after it.
_PRIORITY = [
    # last driver-checked in round 5 — re-green on r7 code
    "q_s2_scan",
    "q_s3_lag_cap",
    "q_s4_recovery_scan",
    "q_s5_interval_merge",
    "q_p2_parse",
    "q_p4_json_build",
    "q_p5_conditional",
    "q_f1_filter",
    "q_e1_error_split",
    "q_e2_error_json",
    "q_x1_fanout",
    "q_x2_tree_fanout",
    "q_k1_produce_request",
    "q_asof_join",
    "q_range_join",
    "q_tpch2_min_cost_supplier",
    "q_tpch8_market_share",
    "q_tpch9_product_profit",
    "q_tpch11_important_parts",
    "q_tpch12_late_priority",
    "q_tpch16_supplier_variety",
    "q_tpch20_promo_suppliers",
    "q_tpch21_waiting_suppliers",
    "q_tpch13_order_distribution",
    "q_tpch22_idle_balance",
    "q_tpch3_shipping_priority",
    "q_array_functions",
    "q_grouped_collect",
    "q_dedup_exact",
    "q_dedup_simhash",
    "q_dedup_simhash_pairs",
    "q_text_normalize",
    "q_text_stats",
    "q_text_langid",
    "q_text_token_counts",
    "q_text_fingerprint",
    "q_text_chunks",
    "q_profile_events",
    "q_anomaly_scores",
    "q_multimodal_features",
    "q_multimodal_frame_sample",
    # NEW in round 7 (never driver-checked): training-mix construction,
    # span-level dedup, unigram-LM quality
    "q_temperature_mix",
    "q_hash_split",
    "q_dedup_spans",
    "q_lm_quality",
    "q_topic_clusters",
    # NEW in round 7 (second batch): SemDeDup semantic near-dup
    "q_dedup_semantic",
    # code or oracle touched in round 7 (ANN defaults + probe clamp;
    # decimal-audit oracles — tpch8 sits in the stale cohort above,
    # tpch14 was audit-changed but re-verified green at sf0.01 AND sf1
    # this round, so it cedes its slot to the never-checked query;
    # tpch5/6/10/15/17 were audit-green with no code change)
    "q_similarity_ann_lsh",
    "q_tpch19_bracket_revenue",
    "q_tpch1_pricing_summary",
]


def _ordered(merged: dict) -> dict:
    out = {name: merged[name] for name in _PRIORITY if name in merged}
    out.update({k: v for k, v in merged.items() if k not in out})
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return _ordered(out)


def all_oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLE)
    return _ordered(out)


def _modules():
    # Import failures must be LOUD: a broken module would otherwise
    # silently shrink the declared surface (round-1 judge finding).
    from firebolt_spark.queries import llm, reference, relational

    return [reference, relational, llm]
