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

Round-15 first-50 rotation:
slots 1-41: the FORTY-ONE queries whose latest driver row is r12 —
two rounds stale, the staleness ceiling; VERDICT r14 Next #1 names
them (they were written ahead in r14's prep block) and orders them
to LEAD.  None changed code in r15.
slot 42: the round-15 NEW query q_multimodal_jpeg_420 (4:2:0
chroma-subsampled baseline JPEG decode — VERDICT r14 Next #2).
slots 43-48: queries whose OPERATOR CODE changed in r15 (the JPEG
decoder's sampling-factor generalization + fill-byte marker walk ->
q_multimodal_jpeg, q_multimodal_transcode; the extract_features /
gif_frames decoder_backend injection seam (Next #3) + the gif_frames
NaN-meta guard -> q_multimodal_gif, q_multimodal_frames,
q_multimodal_gif_anim, q_media_curation).
slots 49-50: q_multimodal_wav, q_multimodal_wav8 pre-rotated from the
r13-latest cohort (extract_features carries the WAV dispatch, so the
seam change brushes them too; pre-rotating trims the r16 backlog to
36).  New/changed budget used: 1 new + 6 changed = 7 of the 9 slots.
Names absent from this list keep their module order after it.

R16 ROTATION PREP (write-ahead, the standing discipline): after this
round's driver check, the queries whose latest row is r13 — two
rounds stale at r16 — are the THIRTY-SIX of q_corpus_profile,
q_corpus_quantiles, q_date_functions, q_dedup_incremental_indexed,
q_dedup_lines_incremental, q_dedup_ngram_jaccard_indexed,
q_distinct_sketch, q_having, q_interleave_strata, q_join_anti,
q_join_left_counts, q_join_semi, q_multimodal_resample,
q_percentiles, q_pivot, q_priority_sketch, q_quantile_sketch,
q_sample_by_source, q_setops, q_similarity_ann_ivf,
q_similarity_bruteforce, q_snapshot_diff, q_stratified_sample,
q_subquery_above_avg, q_token_budget_mix, q_topk_orders,
q_tpch10_returned_items, q_tpch14_promo_share, q_tpch15_top_supplier,
q_tpch17_small_qty_revenue, q_tpch4_order_priority,
q_tpch5_local_supplier, q_tpch6_revenue_forecast,
q_tpch7_nation_volume, q_window_rank, q_window_tumbling
(q_multimodal_wav and q_multimodal_wav8 were pre-rotated into r15
slots 49-50).  They MUST lead _PRIORITY slots 1-36 in r16, leaving 14
slots for r16's new/changed queries (the budget rule above).  The 50
r14-latest rows rotate in r17.

R16 REGISTRATION DEBT (round-15 write-ahead): q_multimodal_jpeg_prog
(progressive JPEG decode) and q_multimodal_video (AVI demux +
per-frame decode over video_frames) are IMPLEMENTED and
sf0.01-verified in queries/llm.py but deliberately NOT registered —
round 15's nine-slot new/changed budget was already committed when
they landed.  Round 16 must add both to llm.QUERIES/ORACLE and give
them two of the 14 slack slots (making the r16 budget 36 stale + 2
new + changed).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_PRIORITY = [
    # r12-latest (two rounds stale) — VERDICT r14 Next #1 leads
    "q_c4_line_filter",
    "q_c4_pipeline",
    "q_corpus_curation",
    "q_decontaminate",
    "q_dedup_clusters",
    "q_dedup_embedding",
    "q_dedup_exact",
    "q_dedup_incremental",
    "q_dedup_minhash",
    "q_dedup_simhash",
    "q_dedup_simhash_pairs",
    "q_dedup_spans",
    "q_dedup_spans_overlap",
    "q_embedding_quantize",
    "q_frequent_items",
    "q_grouped_collect",
    "q_hash_split",
    "q_k2_index_request",
    "q_lm_quality",
    "q_multimodal_frame_sample",
    "q_multimodal_png",
    "q_p7_docid",
    "q_pii_redact",
    "q_profile_events",
    "q_s6_compaction",
    "q_session_window",
    "q_shard_packing",
    "q_similarity_ann_lsh",
    "q_skew_salted_join",
    "q_temperature_mix",
    "q_text_chunks",
    "q_text_fingerprint",
    "q_text_langid",
    "q_text_normalize",
    "q_text_repetition",
    "q_text_stats",
    "q_text_token_counts",
    "q_topic_clusters",
    "q_tpch18_large_orders",
    "q_tpch1_pricing_summary",
    "q_winnow_fingerprints",
    # NEW in round 15 — 4:2:0 chroma-subsampled baseline JPEG decode
    "q_multimodal_jpeg_420",
    # operator code changed in round 15 (JPEG sampling-factor
    # generalization + fill-byte marker walk; decoder_backend seam +
    # gif_frames NaN-meta guard)
    "q_multimodal_jpeg",
    "q_multimodal_transcode",
    "q_multimodal_gif",
    "q_multimodal_frames",
    "q_multimodal_gif_anim",
    "q_media_curation",
    # pre-rotated from the r13-latest cohort (extract_features carries
    # the WAV dispatch; trims the r16 backlog to 36)
    "q_multimodal_wav",
    "q_multimodal_wav8",
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
