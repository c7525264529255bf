"""Benchmark harness — runs the engine's headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec",
 "queries": {name: sec}, "sf": ...}

Queries are forced with the noop sink (full computation, no driver
materialization or disk cost) after one warm-up scan so JVM/codegen
startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from firebolt_spark import get_spark  # noqa: E402
from firebolt_spark.catalog import load_table  # noqa: E402
from firebolt_spark.queries import all_queries  # noqa: E402

HEADLINE = [
    # reference-parity pipeline shapes
    "q_s2_scan",
    "q_s3_lag_cap",
    "q_s6_compaction",
    "q_e1_error_split",
    "q_x1_fanout",
    # relational capability
    "q_tpch1_pricing_summary",
    "q_tpch3_shipping_priority",
    "q_tpch5_local_supplier",
    "q_tpch6_revenue_forecast",
    "q_window_rank",
    "q_window_tumbling",
    "q_topk_orders",
    # LLM-data-pipeline operators
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_text_stats",
    "q_similarity_bruteforce",
]

# round-2/3 additions (kept out of HEADLINE so the 16-query subtotal
# stays comparable round-over-round; the reported value covers the full
# suite)
EXTRA = [
    "q_dedup_simhash_pairs",
    "q_dedup_embedding",
    "q_asof_join",
    "q_corpus_curation",
    # round 3: operators whose scale shape this round changed
    # (q_dedup_clusters stays out: iterative CC's per-round driver
    # actions make it a multi-second fixed cost that would drown the
    # per-query signal in a 3x min-of-runs bench)
    "q_dedup_incremental",
    "q_shard_packing",
    # round 4: benchmark decontamination (broadcast bench shingles)
    "q_decontaminate",
    # round 6: skew-resistant join (wall-clock skew story is the
    # skew_demo artifact; this row tracks the oracle-checked query)
    "q_skew_salted_join",
    # round 7: span-level dedup (narrow digest shuffle + in-row text
    # rebuild) and unigram-LM scoring (broadcast vocab join) — the two
    # new operators with non-trivial runtime cost; temperature_mix and
    # hash_split are filtered scans with metadata-sized aggs, nothing
    # to track
    "q_dedup_spans",
    "q_lm_quality",
    # round 8: offset-robust span dedup (~span_words x the digest
    # volume of tiling — the cost of offset invariance, worth tracking)
    # and the winnowed fingerprint index (in-row min-select, one
    # distinct shuffle)
    "q_dedup_spans_overlap",
    "q_winnow_fingerprints",
    # round 9: the winnow->exact composition — the production-shaped
    # offset-robust pass (exact digests only for candidate docs)
    "q_dedup_spans_candidates",
    # round 11: line-level exact dedup (the C4 move — narrow digest
    # keep-first at line granularity, in-row rebuild; the index-path
    # queries are tracked by the *_index_demo rows instead, and the
    # BMP resize is a fixture-bounded mapInPandas with nothing to
    # track at scale)
    "q_dedup_lines",
    # round 11 data-selection trio: hashed-feature classifier inference
    # (broadcast model join + decimal dot product) and DSIR importance
    # weights (single corpus scan, persisted feature table feeding both
    # the raw model and the per-doc sum) carry real aggregate cost;
    # weighted_sample is a TakeOrdered scan with nothing to track
    "q_classifier_score",
    "q_importance_weights",
    # the composed selection stage (gate -> classifier -> DSIR ->
    # A-Res sample) — tracked like corpus_curation: the composition's
    # cost is the product story, not any one operator's
    "q_quality_selection",
    # round 11 sampling/mixing/sketch family: the token-budget fill
    # (two-phase grouped cumsum — the one with a real shuffle story)
    # and the KMV sketch (distinct shuffle + two-phase min-k);
    # stratified_sample shares weighted_sample's TakeOrdered shape at
    # fixture scale and its plan is pytest-pinned, so no bench row
    "q_token_budget_mix",
    "q_distinct_sketch",
    # the corpus-profile composition (three aggregate families over
    # one corpus, broadcast-joined) — tracked like corpus_curation
    "q_corpus_profile",
    # round 12: exact per-group quantiles (histogram + range-
    # partitioned global cumsum + broadcast rank select) — the
    # distribution readout with a real two-shuffle story
    "q_corpus_quantiles",
    # round 12: the composed C4 stage (scan-only line/page filter
    # feeding line dedup's narrow digest shuffle) — tracked like
    # corpus_curation; the PNG/WAV codec queries are fixture-bounded
    # mapInPandas with nothing to track at scale (the codecs' scale
    # lever is balance_media_bytes) and q_c4_line_filter/q_pii_redact
    # are zero-shuffle scans
    "q_c4_pipeline",
    # round 13: the incremental line-dedup path (corpus-ledger
    # anti-join — the narrow-digest shuffle story at ingest time) and
    # the bottom-k quantile sketch (one (group, h) distinct shuffle +
    # two-phase min-k, readout map-only)
    "q_dedup_lines_incremental",
    "q_quantile_sketch",
    # round 13: the priority-sampling subset-sum sketch (one (group,
    # ticket) shuffle + two-phase top-k, sharded build -> merge ->
    # broadcast-joined readout — the weighted-profile story)
    "q_priority_sketch",
    # round 16: GPT-style concat-and-split sequence packing (two-phase
    # global cumsum + map-side boundary explode — the exact-training-
    # example twin of q_shard_packing, with a real shuffle story)
    "q_sequence_pack",
]


def _ann_recall(spark, sf_dir: str) -> dict[str, float]:
    """recall@10 of each ANN path vs exact brute-force cosine, reported
    per bench run (VERDICT r3 "Next #4" — quality as a bench artifact,
    not just the pytest floor)."""
    from firebolt_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    out = {}
    # grid variants pin planes=4 AND the off-axis lever (tables=1 for
    # the probe rows, probes=1 for the table rows) so each lever's rows
    # stay comparable with the r5/r6 artifacts; "lsh@10" is the true
    # default call (round 7: auto planes via recommended_planes,
    # tables=8, probes=2)
    variants = {
        "lsh@10": similarity.ann_lsh_topk(emb, qids, k=10),
        "lsh_t1@10": similarity.ann_lsh_topk(
            emb, qids, k=10, planes=4, tables=1, probes=1
        ),
        "lsh_probes3@10": similarity.ann_lsh_topk(
            emb, qids, k=10, planes=4, tables=1, probes=3
        ),
        "lsh_probes5@10": similarity.ann_lsh_topk(
            emb, qids, k=10, planes=4, tables=1, probes=5
        ),
        "lsh_tables4@10": similarity.ann_lsh_topk(
            emb, qids, k=10, planes=4, tables=4, probes=1
        ),
        "lsh_tables8@10": similarity.ann_lsh_topk(
            emb, qids, k=10, planes=4, tables=8, probes=1
        ),
        # round 16 (VERDICT r15 Next #7): the two levers COMBINED at
        # the same planes=4 — the documented high-recall multi-table
        # config that the tables-only (0.74) and probes-only (0.52)
        # rows bracket. Cost model: candidates ~= tables x probes x
        # bucket-size, so this row pays 8x2 bucket probes for its
        # recall — the knob a 100 TB deployment tunes against the
        # ann_compact_demo probe walls.
        "lsh_tables8_probes2@10": similarity.ann_lsh_topk(
            emb, qids, k=10, planes=4, tables=8, probes=2
        ),
        "ivf_probe4@10": similarity.ann_ivf_topk(emb, qids, k=10, n_probe=4),
    }
    for label, df in variants.items():
        got = {(r["query_id"], r["vec_id"]) for r in df.collect()}
        out[label] = round(len(exact & got) / len(exact), 3)
        spark.catalog.clearCache()
    return out


def _winnow_demo(spark, sf_dir: str) -> dict[str, float]:
    """Winnow→exact vs unrestricted offset-robust dedup on a
    SPARSE-duplicate corpus (VERDICT r8 "Next #3"): every word salted
    with its (doc_id, position), so no passage repeats anywhere — the
    ideal shape of a 100 TB corpus AFTER upstream exact dedup. The
    unrestricted pass still shuffles EVERY doc's full digest stream
    through the keep-first aggregate; the composition pays the in-row
    winnow (~2/(window+1) of the digest volume shuffled) and its exact
    pass runs over zero candidates. min-of-2 each, noop sink."""
    from firebolt_spark.operators.dedup import (
        dedup_spans_candidates, dedup_spans_overlap,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.expr(
            "array_join(transform(split(coalesce(text, ''), ' '), "
            "(w, i) -> concat(w, '_', doc_id, '_', i)), ' ')"
        ).alias("text"),
    ).persist()
    n_docs = docs.count()

    from firebolt_spark.functions import release

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        # free only the operators' tracked persists — clearCache would
        # also drop the salted input corpus this demo deliberately
        # caches, billing source re-read + salting to runs 2..4
        release(df)
        return time.perf_counter() - t0

    out = {
        "overlap_s": round(
            min(run(dedup_spans_overlap(docs, span_words=3))
                for _ in range(2)), 3),
        "candidates_s": round(
            min(run(dedup_spans_candidates(docs, span_words=3, window=4))
                for _ in range(2)), 3),
        "n_docs": n_docs,
    }
    # round 11: the on-disk winnow index (VERDICT r10 Next #1) — build
    # once (the one-time corpus winnow, billed to index_build_s), then
    # every later run probes the artifact: candidates_indexed_s is the
    # repeated-job / batch-N cost, which EXCLUDES the corpus winnow.
    import tempfile

    from firebolt_spark.operators.dedup import build_winnow_index

    with tempfile.TemporaryDirectory() as tmp:
        idx = tmp + "/winnow_idx"
        t0 = time.perf_counter()
        build_winnow_index(docs, idx, span_words=3, window=4)
        out["index_build_s"] = round(time.perf_counter() - t0, 3)
        out["candidates_indexed_s"] = round(
            min(run(dedup_spans_candidates(
                    docs, span_words=3, window=4, index_path=idx))
                for _ in range(2)), 3)
    docs.unpersist()
    return out


def _ngram_demo(spark, sf_dir: str) -> dict[str, float]:
    """Pre-bucketed shingle artifact vs in-session persist for
    ngram_jaccard_pairs (VERDICT r10 'Next #3'): build_shingle_index
    pays the shingling + one bucket shuffle ONCE (index_build_s); every
    later dedup run reads the bucketed table and self-joins
    exchange-free on sh (indexed_s) instead of re-shingling and
    persisting in-session (in_session_s). min-of-2 each, noop sink.

    Round 12 adds the compaction story: an append sets
    firebolt.appended, making every probe pay the defensive dedup
    (appended_s — the +31% the r11 sf10 measurement flagged);
    compact_shingle_index (compact_s) rewrites duplicate-free and
    clears the flag, and the next probe (compacted_s) is back on the
    build-only fast path."""
    from firebolt_spark.functions import release
    from firebolt_spark.operators.dedup import (
        append_shingle_index, build_shingle_index, compact_shingle_index,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        release(df)
        return time.perf_counter() - t0

    out: dict[str, float] = {
        "in_session_s": round(
            min(run(ngram_jaccard_pairs(docs, max_df=0.5))
                for _ in range(2)), 3),
    }
    try:
        t0 = time.perf_counter()
        build_shingle_index(docs, "bench_shingle_idx")
        out["index_build_s"] = round(time.perf_counter() - t0, 3)
        out["indexed_s"] = round(
            min(run(ngram_jaccard_pairs(
                    docs, max_df=0.5, shingle_index="bench_shingle_idx"))
                for _ in range(2)), 3)
        # a replayed append flags the table; probes pay the defensive
        # dedup until compaction reclaims the build-only path
        batch = docs.filter(F.col("doc_id") % 100 == 0).withColumn(
            "doc_id", F.col("doc_id") + 20_000_000
        )
        append_shingle_index(batch, "bench_shingle_idx")
        append_shingle_index(batch, "bench_shingle_idx")
        all_docs = docs.unionByName(batch)
        out["appended_s"] = round(
            min(run(ngram_jaccard_pairs(
                    all_docs, max_df=0.5,
                    shingle_index="bench_shingle_idx"))
                for _ in range(2)), 3)
        t0 = time.perf_counter()
        compact_shingle_index(spark, "bench_shingle_idx")
        out["compact_s"] = round(time.perf_counter() - t0, 3)
        out["compacted_s"] = round(
            min(run(ngram_jaccard_pairs(
                    all_docs, max_df=0.5,
                    shingle_index="bench_shingle_idx"))
                for _ in range(2)), 3)
    finally:
        for t in ("bench_shingle_idx", "bench_shingle_idx_cstage",
                  "bench_shingle_idx_cold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    return out


def _minhash_demo(spark, sf_dir: str) -> dict[str, float]:
    """Durable MinHash index vs in-memory signature accretion for
    incremental_near_dups (round 11): the in-memory path re-signs and
    re-bands the whole corpus per ingest batch (in_memory_s);
    build_minhash_index pays that once (index_build_s), after which a
    batch probe shuffles only itself against the two bucketed tables
    (indexed_s). Batch = 1% of the corpus, relabeled. min-of-2 each,
    noop sink."""
    from firebolt_spark.functions import release
    from firebolt_spark.operators.dedup import (
        build_minhash_index, incremental_near_dups, minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    batch = docs.filter(F.col("doc_id") % 100 == 0).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )

    def run(df) -> float:
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        release(df)
        return time.perf_counter() - t0

    def in_memory() -> float:
        m, sigs = incremental_near_dups(batch, minhash_signatures(docs))
        t = run(m)
        sigs.unpersist()
        return t

    out: dict[str, float] = {
        "in_memory_s": round(min(in_memory() for _ in range(2)), 3),
    }
    try:
        t0 = time.perf_counter()
        build_minhash_index(docs, "bench_minhash_idx")
        out["index_build_s"] = round(time.perf_counter() - t0, 3)

        def indexed() -> float:
            m, sigs = incremental_near_dups(
                batch, index_table="bench_minhash_idx"
            )
            t = run(m)
            sigs.unpersist()
            return t

        out["indexed_s"] = round(min(indexed() for _ in range(2)), 3)
    finally:
        spark.sql("DROP TABLE IF EXISTS bench_minhash_idx_sig")
        spark.sql("DROP TABLE IF EXISTS bench_minhash_idx_bands")
    return out


def _ann_compact_demo(spark, sf_dir: str) -> dict[str, float]:
    """ANN-index compaction lifecycle (round 13 — VERDICT r12 Next #4,
    the on-disk-index twin of the shingle compaction row): build an IVF
    index, land 6 staged ingest batches (each leaving >= 1 small file
    per touched cluster dir + an _ids file), measure the probe before
    and after compact_ann_index, and record the file-count reclaim.
    Probe = 8 query ids, warm min-of-2."""
    import shutil

    from firebolt_spark.operators.similarity import (
        ann_ivf_topk_from_index, append_ivf_index, build_ivf_index,
        compact_ann_index, count_index_files,
    )

    here = os.path.dirname(os.path.abspath(__file__))
    path = os.path.join(here, "spark-warehouse", "_bench_ann_idx")
    shutil.rmtree(path, ignore_errors=True)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = emb.count()
    base = emb.filter(F.col("vec_id") < int(n * 0.7))
    out: dict[str, float] = {}
    try:
        t0 = time.perf_counter()
        build_ivf_index(base, path, n_centroids=16)
        out["index_build_s"] = round(time.perf_counter() - t0, 3)
        vec_t = spark.read.parquet(path).schema["embedding"].dataType
        lo = int(n * 0.7)
        step = max(1, (n - lo) // 6)
        for k in range(6):
            batch = emb.filter(
                (F.col("vec_id") >= lo + k * step)
                & (F.col("vec_id") < lo + (k + 1) * step)
            ).select(
                "vec_id", F.col("embedding").cast(vec_t).alias("embedding")
            )
            append_ivf_index(batch, path, batch_id=k + 1)
        qids = [int(n * f) for f in (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.75, 0.9)]

        def probe() -> float:
            t0 = time.perf_counter()
            ann_ivf_topk_from_index(
                spark, path, query_ids=qids, k=10, n_probe=4
            ).write.mode("overwrite").format("noop").save()
            return time.perf_counter() - t0

        out["files_before"] = count_index_files(spark, path)
        out["probe_appended_s"] = round(min(probe() for _ in range(2)), 3)
        t0 = time.perf_counter()
        compact_ann_index(spark, path)
        out["compact_s"] = round(time.perf_counter() - t0, 3)
        out["files_after"] = count_index_files(spark, path)
        out["probe_compacted_s"] = round(min(probe() for _ in range(2)), 3)
    finally:
        shutil.rmtree(path, ignore_errors=True)
        shutil.rmtree(path + "_cstage", ignore_errors=True)
        shutil.rmtree(path + "_cold", ignore_errors=True)
    return out


def _priority_merge_demo(spark, sf_dir: str) -> dict:
    """Priority-sketch shard-merge cost vs shard count (VERDICT r13
    Next #6): the merge's input is the per-shard sketch STATE —
    (k+1) x shards x groups rows — never the corpus, so re-merging an
    ingest loop's shards must cost the same whether the corpus behind
    them was 1 GB or 100 TB. Build per-shard sketches once (persisted;
    build cost excluded — it's the per-batch ingest cost the
    q_priority_sketch row already tracks), then time the merge at 3
    and at 32 shards (min-of-2, noop sink). state_rows reports the
    actual merged input sizes; the flat(ish) walls are the claim."""
    from firebolt_spark.functions import priority_sketch, priority_sketch_merge

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.length("text").cast("double").alias("w")
    )
    out: dict = {}
    for shards in (3, 32):
        sk = priority_sketch(
            # hash-shard: scaled fixtures stride doc_id, so a modulo
            # would leave most of the 32 shards empty
            docs.withColumn(
                "_shard", F.pmod(F.xxhash64("doc_id"), F.lit(shards))
            ),
            "w", "doc_id", k=256,
            group_cols=["source", "_shard"], salt="pmd",
        ).drop("_shard").persist()
        state_rows = sk.count()  # force the build outside the timing
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            priority_sketch_merge(
                sk, k=256, group_cols=["source"]
            ).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
        sk.unpersist()
        out[f"shards_{shards}"] = {
            "state_rows": state_rows,
            "merge_s": round(min(walls), 3),
        }
    return out


def _media_throughput(spark, budget_mb: int | None = None) -> dict:
    """Per-core codec byte throughput (VERDICT r13 Next #5): the
    multimodal QUERY rows are fixture-bounded (~300-byte payloads), so
    no bench row showed the number that IS the 100 TB multimodal cost —
    the Arrow-batched decoders' MB/s/core. This generates a fixed byte
    budget of REALISTIC-size payloads per format on the executors
    (deterministic md5 noise; BMP/PNG 128x128 RGB ~49 KB, GIF 4x96x96
    index frames through real LZW, WAV 24k-sample 16-bit PCM, JPEG
    128x128 4:2:0 q=8 photo-like content through the forward-DCT
    encoder — round 15), routes
    them through balance_media_bytes exactly like a production decode
    stage, persists the balanced frame, and times
    extract_features(decode_stub=False) alone (noop sink, min-of-2).
    mb_per_s_core divides by local[N]'s N — the per-executor-core
    number a 1000-core cluster multiplies."""
    import hashlib

    from firebolt_spark.operators import multimodal

    budget = (budget_mb or int(
        os.environ.get("SPARK_GRAFT_MEDIA_MB", "32")
    )) * 1024 * 1024
    cores = spark.sparkContext.defaultParallelism
    out: dict = {"cores": cores, "budget_mb_per_format": budget // 2**20}

    def noise(tag: str, i: int, nbytes: int) -> bytes:
        blocks = []
        for j in range((nbytes + 15) // 16):
            blocks.append(
                hashlib.md5(f"{tag}#{i}#{j}".encode()).digest()
            )
        return b"".join(blocks)[:nbytes]

    def build(fmt: str, i: int) -> bytes:
        if fmt == "jpeg":
            # photo-like content for an HONEST entropy-decode cost,
            # 4:2:0 q=8 like real encoders; the recipe is shared with
            # the roundtrip test via _jpeg_photo_like_py
            img = multimodal._jpeg_photo_like_py(f"jpg#{i}")
            return multimodal._jpeg_encode_dct_py(
                img.tobytes(), 128, 128, q=8, subsampling="420"
            )
        if fmt == "bmp":
            return multimodal._encode_bmp_py(
                noise("bmp", i, 3 * 128 * 128), 128, 128
            )
        if fmt == "png":
            return multimodal._png_encode_py(
                noise("png", i, 3 * 128 * 128), 128, 128,
                filters=[j % 5 for j in range(128)],
            )
        if fmt == "gif":
            return multimodal._gif_encode_py(
                [noise(f"gif{f}", i, 96 * 96) for f in range(4)], 96, 96
            )
        if fmt == "wav":
            import numpy as np

            samples = np.frombuffer(
                noise("wav", i, 48_000), "<i2"
            ).tolist()
            return multimodal._wav_encode_py(samples, 1, 16_000)
        raise ValueError(fmt)

    schema = (
        "doc_id BIGINT, media BINARY, "
        "media_meta STRUCT<kind: STRING, mime: STRING, n_bytes: BIGINT, "
        "sha: STRING>"
    )
    decoders = {
        "bmp": multimodal._bmp_decode_py,
        "png": multimodal._png_decode_py,
        "gif": multimodal._gif_decode_py,
        "wav": multimodal._wav_decode_py,
        "jpeg": multimodal._jpeg_decode_py,
    }
    for fmt in ("bmp", "png", "gif", "wav", "jpeg"):
        # raw single-core codec rate, no Spark plumbing: the number a
        # 1000-core cluster multiplies. The Spark-path wall below adds
        # Arrow transfer + task scheduling, which fixed-overhead-
        # dominates at small budgets — report both, compare honestly.
        sample = build(fmt, 0)
        reps = max(1, 4 * 2**20 // len(sample))
        raw_walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _r in range(reps):
                decoders[fmt](sample)
            raw_walls.append(time.perf_counter() - t0)
        raw_rate = reps * len(sample) / min(raw_walls) / 2**20
        # size payload count from the REAL sample size so the byte
        # budget holds per format (a hardcoded estimate drifted 21%
        # for GIF — caught by review r14)
        n_payloads = max(cores, budget // len(sample))

        def gen(batches, fmt=fmt):
            import pandas as pd

            for pdf in batches:
                rows = []
                for rec in pdf.itertuples(index=False):
                    payload = build(fmt, int(rec.doc_id))
                    rows.append(
                        {
                            "doc_id": int(rec.doc_id),
                            "media": payload,
                            "media_meta": {
                                "kind": "audio" if fmt == "wav" else "image",
                                "mime": f"x/{fmt}",
                                "n_bytes": len(payload),
                                "sha": hashlib.sha256(payload).hexdigest(),
                            },
                        }
                    )
                yield pd.DataFrame(
                    rows, columns=["doc_id", "media", "media_meta"]
                )

        media = multimodal.balance_media_bytes(
            spark.range(n_payloads)
            .select(F.col("id").alias("doc_id"))
            .repartition(cores)
            .mapInPandas(gen, schema=schema),
            cores,
        ).persist()
        total_bytes = media.agg(
            F.sum("media_meta.n_bytes").alias("b")
        ).collect()[0]["b"]
        walls = []
        for _ in range(2):
            t0 = time.perf_counter()
            multimodal.extract_features(
                media, decode_stub=False
            ).write.mode("overwrite").format("noop").save()
            walls.append(time.perf_counter() - t0)
        media.unpersist()
        wall = min(walls)
        mb = total_bytes / 2**20
        out[fmt] = {
            "n_payloads": n_payloads,
            "payload_mb": round(mb, 1),
            "wall_s": round(wall, 3),
            "mb_per_s": round(mb / wall, 2),
            "mb_per_s_core": round(mb / wall / cores, 3),
            "raw_single_core_mb_per_s": round(raw_rate, 2),
        }
    return out


def _spark_probe(spark) -> float:
    """Fixed-work SPARK-shaped calibration probe (round 13 — VERDICT
    r12 Next #3): a tiny synthetic groupBy shuffle at the suite's own
    parallelism. The r12 window showed why the two process-local
    probes aren't enough: matmul (BLAS, contention-sensitive even
    pinned to one thread via cache pressure) ran 3.8x slower while
    pyloop (single-core Python) was flat — neither resembles what the
    suite actually does (JVM codegen + 32-way scheduling + shuffle),
    so neither raw nor matmul-normalized cross-round totals were
    meaningful. This probe drifts WITH the suite under the confounds
    that matter (JVM/CPU contention, scheduler), making "suite moved,
    spark probe didn't -> it's ours" a usable attribution. min-of-3,
    warm JVM (runs after the suite)."""

    def once() -> float:
        t0 = time.perf_counter()
        (
            spark.range(0, 2_000_000, 1, 32)
            .select(
                (F.col("id") % 997).alias("k"),
                (F.col("id") * 31 % 101).alias("v"),
            )
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .write.mode("overwrite")
            .format("noop")
            .save()
        )
        return time.perf_counter() - t0

    return round(min(once() for _ in range(3)), 3)


def _calibrate(spark=None) -> dict[str, float]:
    """Fixed-work host-speed probes, reported with every bench run.

    Round 5's suite drifted +37% with zero code changes on any benched
    plan; a controlled r6 re-run at loadavg 0.9 reproduced it, so the
    cause is host-level (CPU frequency / neighbor / scheduler), not
    load or code. These two fixed workloads (single-thread numpy matmul
    and a pure-Python loop) make that attribution *measurable*: if
    calibration moves with the suite, the drift is the host's; if the
    suite moves and calibration doesn't, it's ours. (PERF.md round 6.)
    Round 13 adds the third, Spark-shaped probe (:func:`_spark_probe`)
    after the two diverged 3.8x vs 1.04x in the r12 window.
    """
    import contextlib

    import numpy as np

    # pin BLAS to one thread when possible: a multi-threaded matmul
    # inflates with CPU contention, which is exactly the confound the
    # probe must separate from host-frequency drift (ADVICE r6). The
    # pure-Python loop below is single-thread by nature either way.
    try:
        from threadpoolctl import threadpool_limits

        limiter = threadpool_limits(limits=1)
    except ImportError:  # pragma: no cover - threadpoolctl absent
        limiter = contextlib.nullcontext()
    rng = np.random.default_rng(0)
    a = rng.random((1200, 1200))
    with limiter:
        t0 = time.perf_counter()
        for _ in range(6):
            a @ a
        matmul = time.perf_counter() - t0
    t0 = time.perf_counter()
    s = 0
    for i in range(4_000_000):
        s += i * i
    pyloop = time.perf_counter() - t0
    out = {
        "matmul6x1200_s": round(matmul, 3),
        "pyloop4m_s": round(pyloop, 3),
    }
    if spark is not None:
        try:
            out["spark_shuffle_s"] = _spark_probe(spark)
        except Exception:  # pragma: no cover - never kill the bench
            pass
    return out


def _skew_demo(spark, sf_dir: str) -> dict[str, float]:
    """Skewed-join wall-clock comparison (VERDICT r4 #4 / r5 #7): one
    hot key owns ~30% of an amplified events-derived left side; the
    same shuffle join runs (a) naive with AQE skew handling off — the
    100 TB footgun where one reducer owns 30% of the shuffle, (b)
    through functions.salted_join, (c) naive with AQE skew handling on
    (Spark's own runtime mitigation). Broadcast is disabled throughout:
    at bench scale the dim side would broadcast and no skew would exist
    to demonstrate. min-of-2 each, confs restored."""
    from firebolt_spark.functions import salted_join

    ev = load_table(spark, sf_dir, "events")
    rep = max(1, 4_000_000 // max(ev.count(), 1))
    left = (
        ev.select(
            F.explode(F.sequence(F.lit(1), F.lit(rep))).alias("_rep"),
            F.when((F.col("event_id") % 10) < 3, F.lit(0))
            .otherwise(F.col("event_id") % 1000)
            .alias("k"),
            "value",
            F.repeat(F.coalesce(F.col("props"), F.lit("x")), 20).alias("blob"),
        )
        .drop("_rep")
        .persist()
    )
    left.count()
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )

    def run(df) -> float:
        t0 = time.perf_counter()
        df.groupBy().agg(
            F.count(F.lit(1)), F.sum("w"), F.sum(F.length("blob"))
        ).collect()
        return time.perf_counter() - t0

    out: dict[str, float] = {}
    prev_broadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_skew = spark.conf.get("spark.sql.adaptive.skewJoin.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
        out["naive_skew_off_s"] = round(
            min(run(left.join(right, "k")) for _ in range(2)), 3
        )
        out["salted_s"] = round(
            min(run(salted_join(left, right, "k", 16)) for _ in range(2)), 3
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        out["naive_aqe_skew_s"] = round(
            min(run(left.join(right, "k")) for _ in range(2)), 3
        )
        out["rows"] = left.count()
    finally:
        # restore the values saved above, not re-stated constants
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_broadcast)
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", prev_skew)
        left.unpersist()
    return out


# host-speed reference for the normalized suite number: the round-6
# controlled ship-bench window (docs/bench_sf01_r06_controlled.json,
# loadavg 0.2, matmul probe 0.142 s) — the quietest window measured on
# this host. normalized = wall / (matmul_s / MATMUL_REF_S): "what the
# suite would have taken in the reference window" (PERF.md round 7).
MATMUL_REF_S = 0.142
# per-probe reference values for the three-probe normalization (round
# 13): matmul/pyloop from the round-6 controlled window above;
# spark_shuffle from the round-13 paired-measurement window (loadavg
# 0.7, warm-JVM min-of-3 = 0.472 s — the window that also re-measured
# q_dedup_incremental, PERF.md round 13). When the probes disagree
# (r12: matmul 3.8x vs pyloop 1.04x), cite the spark probe — it is
# the only one shaped like the suite.
PROBE_REFS = {
    "matmul6x1200_s": MATMUL_REF_S,
    "pyloop4m_s": 0.224,
    "spark_shuffle_s": 0.472,
}


def _shuffle_write_bytes(spark) -> int | None:
    """Cumulative shuffle-write bytes, read from the local UI's REST
    API — deltas around a query give its measured shuffle volume,
    turning the plan-shape claims ("this operator shuffles digests,
    not text") into recorded numbers. Summed from ``/allexecutors``
    ``totalShuffleWrite`` (lifetime executor counters), NOT from the
    stage list: stages are evicted past ``spark.ui.retainedStages``,
    so a stage-sum counter can go BACKWARDS mid-suite and record
    negative per-query deltas (BENCH_r11's q_dedup_incremental
    −14.8 MB). Executor totals are monotone for the life of the app.
    Returns None (and the bench omits the section) when the UI is
    disabled or unreachable; never fails the bench."""
    try:
        import json as _json
        import urllib.request

        base = spark.sparkContext.uiWebUrl
        if not base:
            return None
        app = spark.sparkContext.applicationId
        url = f"{base}/api/v1/applications/{app}/allexecutors"
        with urllib.request.urlopen(url, timeout=5) as r:
            execs = _json.load(r)
        return sum(e.get("totalShuffleWrite", 0) or 0 for e in execs)
    except Exception:
        return None


def _run_suite(
    spark, sf_dir: str, names: list[str], runs: int
) -> tuple[dict[str, float], dict[str, float], dict[str, str], dict[str, int]]:
    """min/median-of-N noop-sink timings for the named queries, plus
    each query's first-run shuffle-write bytes (when the UI is up)."""
    queries = all_queries()
    timings: dict[str, float] = {}
    medians: dict[str, float] = {}
    errors: dict[str, str] = {}
    shuffle: dict[str, int] = {}
    for name in names:
        fn = queries[name]
        samples: list[float] = []
        for run_i in range(runs):  # min-of-N: JIT/cache noise doesn't skew
            sh0 = _shuffle_write_bytes(spark) if run_i == 0 else None
            t0 = time.perf_counter()
            try:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            except Exception as exc:  # one broken query must not kill the bench
                errors[name] = str(exc)[:200]
                break
            samples.append(time.perf_counter() - t0)
            if sh0 is not None:
                sh1 = _shuffle_write_bytes(spark)
                if sh1 is not None:
                    shuffle[name] = sh1 - sh0
            # free operator-persisted intermediates (minhash signatures,
            # simhash fingerprints, signed corpora) between runs: Spark's
            # CacheManager matches cached plan fragments, so without this
            # runs 2..N of the dedup queries partially reuse run 1's
            # cached tables and min-of-N reports warm-cache times instead
            # of the query's real cost (see PERF.md round-3 note);
            # gc.collect() lets the ContextCleaner free localCheckpoint
            # blocks clearCache doesn't cover (ADVICE r3)
            spark.catalog.clearCache()
            import gc

            gc.collect()
        if samples:
            timings[name] = round(min(samples), 3)
            medians[name] = round(sorted(samples)[len(samples) // 2], 3)
    return timings, medians, errors, shuffle


def _sf1_section(spark, suite_names: list[str]) -> dict:
    """The standing sf1 scale step (VERDICT r6 "Next #1"): re-run the
    bench suite against the 10× fixture and report the wall ratio. The
    fixture (testdata_sf1/, gitignored, ~167 MB) is regenerated on
    demand by tools/gen_scaled_fixture.py — 10 disjoint key-shards of
    sf0.1 with preserved per-shard distributions, so ~linear cost is
    the null hypothesis and a sublinear ratio is meaningful. Budget:
    runs=1 (≈1 min); the round-6 one-off used min-of-3, so compare
    LIKE WITH LIKE via ratio_vs_sf01 (computed against this same run's
    sf0.1 numbers) rather than across artifacts."""
    here = os.path.dirname(os.path.abspath(__file__))
    sf1_dir = os.environ.get(
        "SPARK_GRAFT_SF1_DIR", os.path.join(here, "testdata_sf1")
    )
    if not os.path.isdir(sf1_dir):
        import subprocess

        t0 = time.perf_counter()
        subprocess.run(
            [sys.executable, os.path.join(here, "tools", "gen_scaled_fixture.py")],
            check=True,
            capture_output=True,
        )
        gen_s = round(time.perf_counter() - t0, 1)
    else:
        gen_s = 0.0
    runs = int(os.environ.get("SPARK_GRAFT_SF1_RUNS", "1"))
    load_table(spark, sf1_dir, "lineitem").count()  # warm footers
    timings, _medians, errors, shuffle = _run_suite(
        spark, sf1_dir, suite_names, runs
    )
    out: dict = {
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,
        "sf": 1.0,
        "fixture_gen_s": gen_s,
    }
    if shuffle:
        out["shuffle_write_bytes"] = shuffle
    if errors:
        out["errors"] = errors
    return out


def _compact_summary(payload: dict) -> dict:
    """The machine-readable LAST stdout line (VERDICT r15 Next #3):
    suite totals, normalized values, per-query walls (2-dp), total
    shuffle bytes — everything a round-over-round comparison needs,
    in well under the driver's ~2 KB stdout-tail window.  Per-query
    shuffle bytes and the demo sections stay in the full payload
    (stdout line 1 and docs/bench_last_full.json)."""
    out: dict = {
        "metric": "bench-summary",
        "value": payload["value"],
        "unit": "sec",
        "sf": payload["sf"],
        "runs": payload["runs"],
        "subtotal_r1_suite": payload["subtotal_r1_suite"],
        "loadavg_start": payload.get("loadavg_start"),
        "queries": {
            n: round(t, 2) for n, t in payload["queries"].items()
        },
    }
    norm = payload.get("normalized")
    if norm:
        out["normalized_suite_s"] = norm["suite_s"]
        spark_probe = norm.get("by_probe", {}).get("spark_shuffle_s")
        if spark_probe:
            out["spark_probe_norm_s"] = spark_probe["suite_s"]
            out["spark_probe_factor"] = spark_probe["host_speed_factor"]
    sh = payload.get("shuffle_write_bytes")
    if sh:
        out["shuffle_total_bytes"] = sum(sh.values())
    sf1 = payload.get("sf1")
    if sf1:
        out["sf1_value"] = sf1["value"]
        out["sf1_ratio_vs_sf01"] = sf1.get("ratio_vs_sf01")
        if "normalized_value" in sf1:
            out["sf1_normalized_value"] = sf1["normalized_value"]
        # per-query sf1 walls (VERDICT r17 Next #5): the signal that
        # resolves real change when sf0.1 walls are weather-bound.
        # Emitted as an ARRAY aligned with this summary's "queries"
        # key order (a second name->value dict would not fit the
        # driver's ~2 KB stdout-tail window; nulls mark queries the
        # sf1 step skipped/failed). Additions-only: every existing
        # key above is untouched.
        sf1_q = sf1.get("queries", {})
        out["sf1_walls"] = [
            round(sf1_q[n], 1) if n in sf1_q else None
            for n in out["queries"]
        ]
    if payload.get("errors"):
        out["n_errors"] = len(payload["errors"])
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("firebolt-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        loadavg_start = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-POSIX
        loadavg_start = None

    # warm-up: JVM, codegen, parquet footers
    load_table(spark, sf_dir, "lineitem").count()
    load_table(spark, sf_dir, "events").count()

    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    timings, medians, errors, shuffle = _run_suite(
        spark, sf_dir, HEADLINE + EXTRA, runs
    )

    total = round(sum(timings.values()), 3)
    # shared-host attribution (VERDICT r3 "Next #7"): 1/5/15-min load
    # averages bracketing the run make driver-vs-builder discrepancies
    # explainable — r3's 4.08 s vs 2.67 s simhash_pairs gap was load.
    try:
        loadavg_end = [round(x, 2) for x in os.getloadavg()]
    except OSError:  # pragma: no cover - non-POSIX
        loadavg_end = None
    payload = {
        "metric": "headline-suite wall time (noop-sink forced, min of runs)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "queries_median": medians,
        "runs": runs,
        "loadavg_start": loadavg_start,
        "loadavg_end": loadavg_end,
        "calibration": _calibrate(spark),
        # same 16 queries as round 1 — the round-over-round anchor
        "subtotal_r1_suite": round(
            sum(t for n, t in timings.items() if n in HEADLINE), 3
        ),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if shuffle:
        # first-run shuffle-write bytes per query (UI REST deltas) —
        # the measured counterpart of the plan-shape pins: a dedup
        # query shuffling digests, not text, shows up as bytes here
        payload["shuffle_write_bytes"] = shuffle
    # host-speed-normalized walls (VERDICT r6 "Next #4"): divide by the
    # calibration probe's slowdown vs the reference window so
    # round-over-round comparisons stop being hostage to host drift
    cal = payload["calibration"]["matmul6x1200_s"]
    if cal > 0:
        factor = cal / MATMUL_REF_S
        payload["normalized"] = {
            "host_speed_factor": round(factor, 3),
            "matmul_ref_s": MATMUL_REF_S,
            "suite_s": round(total / factor, 3),
            "subtotal_r1_suite_s": round(
                payload["subtotal_r1_suite"] / factor, 3
            ),
        }
        # three-probe normalization (round 13): the matmul-only factor
        # overcorrected 3x in the r12 window (BLAS contention without
        # host slowdown). Report the suite normalized by EACH probe;
        # cross-round claims should cite by_probe.spark_shuffle_s and
        # treat probe disagreement as "raw totals unusable this window"
        payload["normalized"]["by_probe"] = {
            probe: {
                "ref_s": ref,
                "host_speed_factor": round(v / ref, 3),
                "suite_s": round(total / (v / ref), 3),
            }
            for probe, ref in PROBE_REFS.items()
            if (v := payload["calibration"].get(probe, 0)) > 0
        }
    try:
        payload["ann_recall"] = _ann_recall(spark, sf_dir)
    except Exception as exc:  # pragma: no cover - never kill the bench
        payload["ann_recall_error"] = str(exc)[:200]
    try:
        payload["skew_demo"] = _skew_demo(spark, sf_dir)
    except Exception as exc:  # pragma: no cover - never kill the bench
        payload["skew_demo_error"] = str(exc)[:200]
    try:
        payload["winnow_demo"] = _winnow_demo(spark, sf_dir)
    except Exception as exc:  # pragma: no cover - never kill the bench
        payload["winnow_demo_error"] = str(exc)[:200]
    try:
        payload["media_throughput"] = _media_throughput(spark)
    except Exception as exc:  # pragma: no cover - never kill the bench
        payload["media_throughput_error"] = str(exc)[:200]
    # the standing sf1 scale step: on by default for the driver's plain
    # sf0.1 run; SPARK_GRAFT_SF1=0 skips (fast local iteration)
    if os.environ.get("SPARK_GRAFT_SF1", "1") != "0" and sf == "0.1":
        try:
            sf1 = _sf1_section(spark, HEADLINE + EXTRA)
            sf1["ratio_vs_sf01"] = round(sf1["value"] / total, 2)
            try:
                # round 11: the shingle-artifact claim is an sf1 claim
                # (at sf0.1 the index read's fixed cost hides the win)
                here = os.path.dirname(os.path.abspath(__file__))
                sf1_dir = os.environ.get(
                    "SPARK_GRAFT_SF1_DIR", os.path.join(here, "testdata_sf1")
                )
                sf1["ngram_index_demo"] = _ngram_demo(spark, sf1_dir)
            except Exception as exc:  # pragma: no cover
                sf1["ngram_index_demo_error"] = str(exc)[:200]
            try:
                sf1["minhash_index_demo"] = _minhash_demo(spark, sf1_dir)
            except Exception as exc:  # pragma: no cover
                sf1["minhash_index_demo_error"] = str(exc)[:200]
            try:
                sf1["ann_compact_demo"] = _ann_compact_demo(spark, sf1_dir)
            except Exception as exc:  # pragma: no cover
                sf1["ann_compact_demo_error"] = str(exc)[:200]
            try:
                sf1["priority_merge_demo"] = _priority_merge_demo(
                    spark, sf1_dir
                )
            except Exception as exc:  # pragma: no cover
                sf1["priority_merge_demo_error"] = str(exc)[:200]
            if "normalized" in payload:
                sf1["normalized_value"] = round(
                    sf1["value"] / payload["normalized"]["host_speed_factor"], 3
                )
            payload["sf1"] = sf1
        except Exception as exc:  # pragma: no cover - never kill the bench
            payload["sf1_error"] = str(exc)[:300]
    if errors:
        payload["errors"] = errors
    print(json.dumps(payload))
    # The driver stores only a ~2 KB stdout TAIL; the full payload
    # above front-truncates there, which is why BENCH_r14/r15.json
    # carry "parsed": null and every round-over-round comparison
    # needed forensic reconstruction (VERDICT r15 Next #3).  Emit a
    # compact, self-contained summary as the LAST stdout line — small
    # enough to survive the tail intact — and persist the full payload
    # to docs/bench_last_full.json for the close artifacts.
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(here, "docs", "bench_last_full.json"), "w") as f:
            json.dump(payload, f)
    except OSError as exc:
        # stdout must stay clean for the driver's tail parser, but a
        # lost close artifact must not be silent (ADVICE r16 #3 —
        # the same failure class as the "parsed": null stdout loss).
        print(f"WARN: bench_last_full.json persist failed: {exc}", file=sys.stderr)
    print(json.dumps(_compact_summary(payload), separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
