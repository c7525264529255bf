"""The declared, oracle-checked query surface of the engine.

Ordering matters: the driver's correctness check walks ``queries()`` in
declaration order under a 50-query budget.  ``_PRIORITY`` front-loads
the rotation each round per the standing VERDICT discipline: stalest
rows lead, then the round's new and changed-operator queries.

REGISTRY CAPACITY POLICY (round 14 — VERDICT r13 Next #2).  The
arithmetic: the driver checks the first 50 keys per round and the
standing discipline caps staleness at 2 rounds, so every registered
query must land in a 50-slot window at least once every 3 rounds —
hard cap 50 * 3 = 150 registered queries.  The policy, in order:

1. CONSOLIDATE FIRST.  When the registry approaches 140, fold
   redundant relational variants into multi-shape queries whose arms
   stay individually hash-pinned (a shape/tag column keys each arm's
   rows).  Round 14 applied this: q_agg_cube + q_agg_rollup +
   q_agg_grouping_sets + q_agg_distinct -> q_agg_shapes (4 -> 1);
   q_window_leadlag + q_window_running_total -> q_window_multi
   (2 -> 1, one Window node, one shuffle); q_scalar_functions +
   q_regexp_functions -> q_function_parade (2 -> 1, same table and
   key).  Registry: 132 (r13) + 2 new - 5 = 129.
2. NEW-QUERY BUDGET.  Net-new queries per round stay within the
   rotation slack: 50 - (stale backlog + changed-operator re-checks).
   r14 slack after the 39-query stale backlog and 6 changed: 5;
   r14 added exactly 5 new queries (GIF compositing, baseline JPEG,
   and the 3 consolidations).
3. IF 1-2 EVER FAIL to hold the registry under 150, the relational
   tail (TPC-H shapes + function parades) drops to a 3-round ceiling,
   compensated by the full-registry sf0.01 local sweep that ROADMAP
   already logs every round; parity/LLM/streaming queries keep the
   2-round ceiling.  Not yet needed.

Round-17 first-50 rotation:
slots 1-37: the THIRTY-SEVEN queries whose latest driver row is r14
— two rounds stale, the staleness ceiling; VERDICT r16 Next #1 names
them (written ahead in r16's prep block) and orders them to LEAD.
None changed code in r17.
slots 38-40: the sequence-packing family re-earning its rows —
q_sequence_pack and q_sequence_texts changed operator code in r17
(pack_sequences/pack_sequence_texts grew an optional precomputed
token-count/token-array column and a min_doc_id ingest guard —
VERDICT r16 Next #6 and ADVICE r16 #2; whitespace default
bit-unchanged, proven by pinned tests) — plus the round-17 NEW
query q_sequence_materialize (watermark-cut incremental sequence
materialization, VERDICT r16 Next #3: the batch-expressible readout
of the streaming materializer, oracle-compared on the stitched
text).
slots 41-50: TEN queries pre-rotated from the r15-latest cohort
(q_tpch1_pricing_summary, q_tpch18_large_orders, q_dedup_exact,
q_dedup_minhash, q_dedup_simhash, q_hash_split, q_text_stats,
q_text_langid, q_text_normalize, q_text_token_counts — none changed
code since r15; pre-rotating trims the r18 backlog from 47 to 37,
the same move r15/r16 made).  New/changed budget used: 1 new + 2
changed = 3 of the 13 slack slots.  Names absent from this list
keep their module order after it.

R18 ROTATION PREP (write-ahead, the standing discipline): after this
round's driver check, the queries whose latest row is r15 — two
rounds stale at r18 — are the THIRTY-SEVEN (the 47 CORRECTNESS_r15
keys not re-checked in r16, minus the 10 pre-rotated into r17 slots
41-50): q_c4_line_filter, q_c4_pipeline, q_corpus_curation,
q_decontaminate, q_dedup_clusters, q_dedup_embedding,
q_dedup_incremental, q_dedup_simhash_pairs, q_dedup_spans,
q_dedup_spans_overlap, q_embedding_quantize, q_frequent_items,
q_grouped_collect, q_k2_index_request, q_lm_quality,
q_media_curation, q_multimodal_frame_sample, q_multimodal_frames,
q_multimodal_gif, q_multimodal_gif_anim, q_multimodal_png,
q_multimodal_wav, q_multimodal_wav8, q_p7_docid, q_pii_redact,
q_profile_events, q_s6_compaction, q_session_window,
q_shard_packing, q_similarity_ann_lsh, q_skew_salted_join,
q_temperature_mix, q_text_chunks, q_text_fingerprint,
q_text_repetition, q_topic_clusters, q_winnow_fingerprints.
They MUST lead _PRIORITY slots 1-37 in r18, leaving 13 slots for
r18's new/changed queries (the budget rule above).  The 50
r16-checked rows rotate in r19.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_PRIORITY = [
    # r14-latest (two rounds stale) — VERDICT r16 Next #1 leads;
    # written ahead in r16's prep block, order preserved
    "q_tpch21_waiting_suppliers",
    "q_tpch22_idle_balance",
    "q_agg_shapes",
    "q_anomaly_scores",
    "q_array_functions",
    "q_asof_join",
    "q_classifier_score",
    "q_dedup_lines",
    "q_dedup_ngram_jaccard",
    "q_dedup_semantic",
    "q_dedup_spans_candidates",
    "q_dedup_spans_candidates_indexed",
    "q_e1_error_split",
    "q_e2_error_json",
    "q_f1_filter",
    "q_function_parade",
    "q_gopher_quality",
    "q_importance_weights",
    "q_k1_produce_request",
    "q_multimodal_features",
    "q_multimodal_resize",
    "q_p2_parse",
    "q_p4_json_build",
    "q_p5_conditional",
    "q_quality_selection",
    "q_range_join",
    "q_s2_scan",
    "q_s3_lag_cap",
    "q_s4_recovery_scan",
    "q_s5_interval_merge",
    "q_tpch3_shipping_priority",
    "q_tpch8_market_share",
    "q_tpch9_product_profit",
    "q_weighted_sample",
    "q_window_multi",
    "q_x1_fanout",
    "q_x2_tree_fanout",
    # operator code changed in round 17 (precomputed token-count /
    # token-array columns + min_doc_id ingest guard in
    # pack_sequences/pack_sequence_texts — VERDICT r16 Next #6,
    # ADVICE r16 #2): the packing pair re-earns its rows
    "q_sequence_pack",
    "q_sequence_texts",
    # NEW in round 17 (VERDICT r16 Next #3): watermark-cut
    # incremental sequence materialization readout
    "q_sequence_materialize",
    # pre-rotated from the r15-latest cohort (no code change since
    # r15; trims the r18 backlog from 47 to 37)
    "q_tpch1_pricing_summary",
    "q_tpch18_large_orders",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_hash_split",
    "q_text_stats",
    "q_text_langid",
    "q_text_normalize",
    "q_text_token_counts",
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
