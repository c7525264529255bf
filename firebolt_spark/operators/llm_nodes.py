"""LLM-pipeline operators as registry node types — so training-data
pipelines compose them from YAML exactly like core nodes.

Each node wraps the corresponding function in operators/{dedup,
similarity,text,multimodal}.py; see those modules for semantics and
scale notes.
"""

from __future__ import annotations

import logging
from typing import Any

from pyspark.sql import DataFrame

from firebolt_spark.operators import dedup, mixture, multimodal, similarity, text

_log = logging.getLogger("firebolt_spark.llm_nodes")


def _warn_unset_cap(node: str, param: str) -> None:
    """The degenerate-bucket caps (max_bucket / max_cluster / max_df)
    default to None so the ORACLE path stays exact, but an uncapped
    candidate join on a real corpus is the one-hot-bucket quadratic
    footgun every docstring warns about. A YAML author gets one
    logged warning per node instance instead of silently inheriting
    the exact-but-unbounded behavior (VERDICT r8 residual nit)."""
    _log.warning(
        "%s: %s is unset — candidate joins are UNBOUNDED per bucket. "
        "Always set it on real corpora (see the operator docstring).",
        node,
        param,
    )


class ExactDedupNode:
    """Params: text_col (default 'text')."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.exact_duplicates(df, self.text_col)


class MinhashDedupNode:
    """Params: text_col, threshold (0.5), k (8), bands (4), max_bucket
    (None — the degenerate-bucket cap; ALWAYS set on real corpora)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.threshold = float(params.get("threshold", 0.5))
        self.k = int(params.get("k", dedup.N_MINHASH))
        self.bands = int(params.get("bands", dedup.N_BANDS))
        mb = params.get("max_bucket")
        self.max_bucket = int(mb) if mb is not None else None
        if self.max_bucket is None:
            _warn_unset_cap("dedup_minhash", "max_bucket")

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.minhash_candidate_pairs(
            df,
            self.text_col,
            self.k,
            self.bands,
            self.threshold,
            max_bucket=self.max_bucket,
        )


class SimhashNode:
    """Params: text_col; pairs (default False) → emit near-dup pairs
    instead of per-doc fingerprints; max_hamming (3); max_bucket (None
    — degenerate-bucket cap for the pairs join)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.pairs = bool(params.get("pairs", False))
        self.max_hamming = int(params.get("max_hamming", 3))
        mb = params.get("max_bucket")
        self.max_bucket = int(mb) if mb is not None else None
        if self.pairs and self.max_bucket is None:
            _warn_unset_cap("simhash(pairs)", "max_bucket")

    def transform(self, df: DataFrame) -> DataFrame:
        if self.pairs:
            return dedup.simhash_pairs(
                df, self.text_col, self.max_hamming, max_bucket=self.max_bucket
            )
        return dedup.simhash(df, self.text_col)


class NgramJaccardNode:
    """Params: text_col, n (3), threshold (0.3), max_df (None — the
    hot-shingle document-frequency cap; ALWAYS set on real corpora)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.n = int(params.get("n", 3))
        self.threshold = float(params.get("threshold", 0.3))
        md = params.get("max_df")
        self.max_df = float(md) if md is not None else None
        mdc = params.get("max_df_count")
        self.max_df_count = int(mdc) if mdc is not None else None
        if self.max_df is None and self.max_df_count is None:
            _warn_unset_cap("ngram_jaccard", "max_df")
        # round 11: broadcast_hot tri-state and the pre-bucketed
        # shingle-index table flow through YAML like the Python API
        self.broadcast_hot = params.get("broadcast_hot")
        self.shingle_index = params.get("shingle_index")

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.ngram_jaccard_pairs(
            df, self.text_col, self.n, self.threshold, max_df=self.max_df,
            broadcast_hot=self.broadcast_hot,
            shingle_index=self.shingle_index,
            max_df_count=self.max_df_count,
        )


class SimilaritySearchNode:
    """Params: query_ids (list of in-corpus ids) and/or query_vectors
    (list of [id, [floats...]] external queries — use ids not in the
    corpus, e.g. negative; at least one of the two is required), k
    (10), method ('bruteforce' | 'lsh' | 'ivf'), id_col, vec_col.
    LSH extras: planes (default: auto via
    similarity.recommended_planes on the corpus count), probes (2,
    Hamming-1 multiprobe), tables (8, independent plane sets — the
    recall lever; measured grid in similarity.ann_lsh_topk).
    IVF extras: n_centroids (16), n_probe (4)."""

    def __init__(self, params: dict[str, Any]):
        self.query_ids = list(params.get("query_ids") or [])
        qv = params.get("query_vectors") or []
        self.query_vectors = [(int(i), list(v)) for i, v in qv]
        if not self.query_ids and not self.query_vectors:
            raise ValueError(
                "similarity_search needs query_ids and/or query_vectors"
            )
        self.k = int(params.get("k", 10))
        self.method = params.get("method", "bruteforce")
        if self.method not in ("bruteforce", "lsh", "ivf"):
            raise ValueError(f"unknown similarity method '{self.method}'")
        self.id_col = params.get("id_col", "vec_id")
        self.vec_col = params.get("vec_col", "embedding")
        p = params.get("planes")
        self.planes = int(p) if p is not None else None
        self.probes = int(params.get("probes", similarity.DEFAULT_LSH_PROBES))
        self.tables = int(params.get("tables", similarity.DEFAULT_LSH_TABLES))
        self.n_centroids = int(params.get("n_centroids", 16))
        self.n_probe = int(params.get("n_probe", 4))

    def transform(self, df: DataFrame) -> DataFrame:
        common = dict(
            id_col=self.id_col,
            vec_col=self.vec_col,
            query_vectors=self.query_vectors or None,
        )
        if self.method == "lsh":
            return similarity.ann_lsh_topk(
                df,
                self.query_ids,
                self.k,
                planes=self.planes,
                probes=self.probes,
                tables=self.tables,
                **common,
            )
        if self.method == "ivf":
            return similarity.ann_ivf_topk(
                df,
                self.query_ids,
                self.k,
                n_centroids=self.n_centroids,
                n_probe=self.n_probe,
                **common,
            )
        return similarity.cosine_topk(df, self.query_ids, self.k, **common)


class TextStatsNode:
    """Params: text_col."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")

    def transform(self, df: DataFrame) -> DataFrame:
        return text.text_stats(df, self.text_col)


class RepetitionStatsNode:
    """Gopher-style repetition gates (dup-word / top-bigram fractions).
    Params: text_col."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")

    def transform(self, df: DataFrame) -> DataFrame:
        return text.repetition_stats(df, self.text_col)


class LanguageIdNode:
    """Params: text_col."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")

    def transform(self, df: DataFrame) -> DataFrame:
        return text.language_id(df, self.text_col)


class TokenCountNode:
    """Params: text_col."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")

    def transform(self, df: DataFrame) -> DataFrame:
        return text.token_counts(df, self.text_col)


class FingerprintNode:
    """Params: text_col, n (3)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.n = int(params.get("n", 3))

    def transform(self, df: DataFrame) -> DataFrame:
        return text.fingerprints(df, self.text_col, self.n)


class ChunkNode:
    """Params: text_col (default 'text'), chunk_tokens (64), overlap (16)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.chunk_tokens = int(params.get("chunk_tokens", 64))
        self.overlap = int(params.get("overlap", 16))

    def transform(self, df: DataFrame) -> DataFrame:
        return text.chunk(df, self.text_col, self.chunk_tokens, self.overlap)


class RedactNode:
    """Params: text_col (default 'text'); out_col; patterns — mapping
    tag → regex (default text.PII_PATTERNS)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.out_col = params.get("out_col")
        self.patterns = params.get("patterns")

    def transform(self, df: DataFrame) -> DataFrame:
        return text.redact(df, self.text_col, self.patterns, self.out_col)


class ShardPackNode:
    """Params: budget_tokens (4096), text_col. Assigns each document a
    ``shard_id`` by greedy token-budget packing in doc_id order (see
    operators/text.py:pack_shards — two-phase cumsum, scale-safe)."""

    def __init__(self, params: dict[str, Any]):
        self.budget = int(params.get("budget_tokens", 4096))
        self.text_col = params.get("text_col", "text")

    def transform(self, df: DataFrame) -> DataFrame:
        return text.pack_shards(df, self.budget, self.text_col)


class EmbeddingNearDupNode:
    """Params: threshold (0.9), planes (8), id_col, vec_col, max_bucket
    (None — degenerate-bucket cap). Emits (vec_a, vec_b, cos_sim)
    near-dup pairs from same-LSH-bucket candidates
    (operators/similarity.py:embedding_near_dups)."""

    def __init__(self, params: dict[str, Any]):
        self.threshold = float(params.get("threshold", 0.9))
        self.planes = int(params.get("planes", similarity.NEAR_DUP_PLANES))
        self.id_col = params.get("id_col", "vec_id")
        self.vec_col = params.get("vec_col", "embedding")
        mb = params.get("max_bucket")
        self.max_bucket = int(mb) if mb is not None else None
        if self.max_bucket is None:
            _warn_unset_cap("embedding_near_dup", "max_bucket")

    def transform(self, df: DataFrame) -> DataFrame:
        return similarity.embedding_near_dups(
            df,
            self.threshold,
            self.planes,
            self.id_col,
            self.vec_col,
            max_bucket=self.max_bucket,
        )


class MediaFeaturesNode:
    """Params: decode_stub (default True) — see operators/multimodal.py."""

    def __init__(self, params: dict[str, Any]):
        self.decode_stub = bool(params.get("decode_stub", True))

    def transform(self, df: DataFrame) -> DataFrame:
        return multimodal.extract_features(df, decode_stub=self.decode_stub)


class MediaResizeNode:
    """Resize media to a fixed target (multimodal.resize_media, round
    11): emits the (media, media_meta) convention back out with
    refreshed n_bytes/sha, so resizes compose with media_features /
    downstream nodes. Params: width (REQUIRED), height (REQUIRED),
    decode_stub (default True — the real path handles BMP only)."""

    def __init__(self, params: dict[str, Any]):
        if "width" not in params or "height" not in params:
            raise ValueError(
                "media_resize node requires width and height params"
            )
        self.width = int(params["width"])
        self.height = int(params["height"])
        self.decode_stub = bool(params.get("decode_stub", True))

    def transform(self, df: DataFrame) -> DataFrame:
        return multimodal.resize_media(
            df, self.width, self.height, decode_stub=self.decode_stub
        )


class SemanticNearDupNode:
    """Params: threshold (0.9), n_centroids (16), max_cluster (None —
    ALWAYS set on real corpora), id_col, vec_col, n_assign (1 — top-m
    cluster multi-assignment; m>1 recovers boundary pairs at ~m²
    candidate volume, measured grid in PERF.md round 8)."""

    def __init__(self, params: dict[str, Any]):
        self.threshold = float(params.get("threshold", 0.9))
        self.n_centroids = int(params.get("n_centroids", 16))
        mc = params.get("max_cluster")
        self.max_cluster = int(mc) if mc is not None else None
        if self.max_cluster is None:
            _warn_unset_cap("semantic_near_dup", "max_cluster")
        self.id_col = params.get("id_col", "vec_id")
        self.vec_col = params.get("vec_col", "embedding")
        self.n_assign = int(params.get("n_assign", 1))

    def transform(self, df: DataFrame) -> DataFrame:
        return similarity.semantic_near_dups(
            df,
            self.threshold,
            self.n_centroids,
            self.id_col,
            self.vec_col,
            max_cluster=self.max_cluster,
            n_assign=self.n_assign,
        )


class TemperatureMixNode:
    """Params: strata_col (required), key_col (required), alpha (0.5),
    salt (''), plan_path (None — path to a FROZEN mix_plan written as
    parquet; when set the node applies that plan via apply_mix_plan
    instead of aggregating its input, which is what a STREAM must do:
    mix_plan aggregates, illegal mid-stream), unseen_fraction (0.0 —
    admit strata absent from the frozen plan at this hash fraction;
    only meaningful with plan_path)."""

    def __init__(self, params: dict[str, Any]):
        self.strata_col = params["strata_col"]
        self.key_col = params["key_col"]
        self.alpha = float(params.get("alpha", 0.5))
        self.salt = str(params.get("salt", ""))
        pp = params.get("plan_path")
        self.plan_path = str(pp) if pp is not None else None
        self.unseen_fraction = float(params.get("unseen_fraction", 0.0))
        if self.plan_path is None and self.unseen_fraction:
            raise ValueError(
                "unseen_fraction requires plan_path: a plan aggregated "
                "from the input itself has no unseen strata"
            )

    def transform(self, df: DataFrame) -> DataFrame:
        if self.plan_path is not None:
            plan = df.sparkSession.read.parquet(self.plan_path)
            return mixture.apply_mix_plan(
                df, plan, self.strata_col, self.key_col, self.salt,
                unseen_fraction=self.unseen_fraction,
            )
        return mixture.temperature_mix(
            df, self.strata_col, self.key_col, self.alpha, self.salt
        )


class HashSplitNode:
    """Params: key_col (required), weights (dict name->weight, default
    train/val/test 0.9/0.05/0.05), salt (''), split_col ('split')."""

    def __init__(self, params: dict[str, Any]):
        self.key_col = params["key_col"]
        self.weights = params.get("weights")
        self.salt = str(params.get("salt", ""))
        self.split_col = str(params.get("split_col", "split"))

    def transform(self, df: DataFrame) -> DataFrame:
        return mixture.hash_split(
            df, self.key_col, self.weights, self.salt, self.split_col
        )


class SpanDedupNode:
    """Params: span_words (16), text_col ('text'), id_col ('doc_id')."""

    def __init__(self, params: dict[str, Any]):
        self.span_words = int(params.get("span_words", 16))
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.dedup_spans(
            df, self.span_words, self.text_col, self.id_col
        )


class SpanDedupOverlapNode:
    """Offset-robust span dedup (dedup.dedup_spans_overlap): every
    overlapping window hashed — duplicates caught at any word offset,
    ~span_words× the digest volume of span_dedup's tiles. Params:
    span_words (16), text_col ('text'), id_col ('doc_id')."""

    def __init__(self, params: dict[str, Any]):
        self.span_words = int(params.get("span_words", 16))
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.dedup_spans_overlap(
            df, self.span_words, self.text_col, self.id_col
        )


class SpanDedupCandidatesNode:
    """The winnow→exact composition (dedup.dedup_spans_candidates):
    the exact overlapping pass restricted to winnow-flagged candidate
    docs — the production shape at 100 TB; duplicates shorter than
    window + span_words - 1 words may survive. Params: span_words
    (16), window (8), text_col ('text'), id_col ('doc_id'),
    index_path (optional — a build_winnow_index artifact; candidate
    discovery reads it instead of re-winnowing the corpus, bit-
    identical result)."""

    def __init__(self, params: dict[str, Any]):
        self.span_words = int(params.get("span_words", 16))
        self.window = int(params.get("window", 8))
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")
        self.index_path = params.get("index_path")

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.dedup_spans_candidates(
            df, self.span_words, self.window, self.text_col, self.id_col,
            index_path=self.index_path,
        )


class LineDedupNode:
    """Line-level exact dedup across the corpus (dedup.dedup_lines —
    the C4 move, round 11): repeated lines keep their first (id, pos)
    occurrence; sub-min_chars lines (structure) always survive. Emits
    (id, n_lines, n_kept, text_dedup). Params: text_col ('text'),
    id_col ('doc_id'), min_chars (1)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")
        self.min_chars = int(params.get("min_chars", 1))

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.dedup_lines(
            df, self.text_col, self.id_col, self.min_chars
        )


class C4LineFilterNode:
    """C4-style line + page cleaning (text.c4_line_filter, round 12):
    keep only lines ending in terminal punctuation with >= min_words
    words and no 'javascript'; drop pages containing '{' or with fewer
    than min_kept_lines survivors. Emits (doc_id, n_lines, n_kept,
    text_clean, keep). Params: text_col ('text'), min_words (5),
    min_kept_lines (3)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.min_words = int(params.get("min_words", 5))
        self.min_kept_lines = int(params.get("min_kept_lines", 3))

    def transform(self, df: DataFrame) -> DataFrame:
        return text.c4_line_filter(
            df, self.text_col, self.min_words, self.min_kept_lines
        )


class IncrementalDedupNode:
    """Incremental ingest dedup against a DURABLE MinHash index
    (dedup.incremental_near_dups(index_table=...), round 11): the
    input batch is scored against a build_minhash_index artifact —
    cost tracks the batch, both index-side joins stay on the bucket
    layout. Emits (new_doc_id, index_doc_id, est_jaccard) match rows.
    Params: index_table (REQUIRED — the build_minhash_index table-name
    prefix; k/bands come from its table properties), text_col
    ('text'), threshold (0.5). The node only PROBES: append the
    batch's signatures with dedup.append_minhash_index in the ingest
    job itself (e.g. inside foreachBatch) — a transform may be
    re-planned and re-run, so it must stay side-effect-free."""

    def __init__(self, params: dict[str, Any]):
        if not params.get("index_table"):
            raise ValueError(
                "dedup_incremental node requires index_table (a "
                "build_minhash_index artifact table-name prefix)"
            )
        self.index_table = params["index_table"]
        self.text_col = params.get("text_col", "text")
        self.threshold = float(params.get("threshold", 0.5))

    def transform(self, df: DataFrame) -> DataFrame:
        matches, _new_sigs = dedup.incremental_near_dups(
            df, text_col=self.text_col, threshold=self.threshold,
            index_table=self.index_table,
        )
        return matches


class WinnowFingerprintNode:
    """Winnowed fingerprints (dedup.winnow_fingerprints, Schleimer et
    al. 2003): distinct (id, fingerprint) rows — the offset-robust
    candidate index. Params: span_words (16), window (8), text_col
    ('text'), id_col ('doc_id')."""

    def __init__(self, params: dict[str, Any]):
        self.span_words = int(params.get("span_words", 16))
        self.window = int(params.get("window", 8))
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")

    def transform(self, df: DataFrame) -> DataFrame:
        return dedup.winnow_fingerprints(
            df, self.span_words, self.window, self.text_col, self.id_col
        )


class LmQualityNode:
    """Params: text_col ('text'), id_col ('doc_id'). Self-scores
    against the input corpus's own unigram model."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")

    def transform(self, df: DataFrame) -> DataFrame:
        return text.lm_cross_entropy(df, self.text_col, self.id_col)


class GopherQualityNode:
    """Gopher composite quality gate (text.gopher_quality, Rae et al.
    2021 §A1.1): six heuristic rules in one zero-shuffle scan,
    emitting the signal columns plus keep (0/1). Params: text_col
    ('text'), id_col ('doc_id'), min_words (50), max_words (100000),
    min_mean_word_len (3.0), max_mean_word_len (10.0),
    min_alpha_word_frac (0.8), min_stopword_hits (2),
    max_dup_word_frac (0.3), max_top_bigram_frac (0.2); include
    (list of input columns carried through unchanged — e.g.
    [text, lang] so a downstream filter keep=1 continues the pipeline
    without a corpus re-join)."""

    def __init__(self, params: dict[str, Any]):
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")
        self.include = tuple(params.get("include", ()))
        self.kw = {
            k: t(params[k])
            for k, t in (
                ("min_words", int),
                ("max_words", int),
                ("min_mean_word_len", float),
                ("max_mean_word_len", float),
                ("min_alpha_word_frac", float),
                ("min_stopword_hits", int),
                ("max_dup_word_frac", float),
                ("max_top_bigram_frac", float),
            )
            if k in params
        }

    def transform(self, df: DataFrame) -> DataFrame:
        return text.gopher_quality(
            df, self.text_col, self.id_col, include=self.include, **self.kw
        )


class ClassifierScoreNode:
    """Linear quality-classifier inference over hashed n-gram features
    (text.classifier_score — fastText-style filtering, round 11).
    Params: weights_path (REQUIRED — parquet with (bucket, weight)
    rows, e.g. exported trained weights), text_col ('text'), id_col
    ('doc_id'), n_buckets (4096), bigrams (true), salt ('feat'), bias
    (0.0). The model table is bounded by n_buckets, so the join is
    broadcast. Emits (id, n_features, logit, score)."""

    def __init__(self, params: dict[str, Any]):
        if not params.get("weights_path"):
            raise ValueError(
                "classifier_score node requires weights_path (parquet "
                "with (bucket, weight) rows)"
            )
        self.weights_path = params["weights_path"]
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")
        self.n_buckets = int(params.get("n_buckets", 4096))
        self.bigrams = bool(params.get("bigrams", True))
        self.salt = params.get("salt", "feat")
        self.bias = float(params.get("bias", 0.0))

    def transform(self, df: DataFrame) -> DataFrame:
        weights = df.sparkSession.read.parquet(self.weights_path)
        return text.classifier_score(
            df,
            weights,
            text_col=self.text_col,
            id_col=self.id_col,
            n_buckets=self.n_buckets,
            bigrams=self.bigrams,
            salt=self.salt,
            bias=self.bias,
        )


class ImportanceWeightsNode:
    """DSIR importance weights (text.importance_weights, round 11):
    log-likelihood ratio of each document's hashed-ngram features
    under a target vs the raw corpus model. Params: exactly one of
    target_filter (SQL boolean expr selecting the target slice of the
    INPUT, e.g. "lang = 'en'") or target_model_path (parquet with a
    stored hashed_bucket_model — (bucket, cnt, total) rows); plus
    text_col ('text'), id_col ('doc_id'), n_buckets (4096), bigrams
    (true), salt ('feat'). The raw model is built from the input
    corpus itself (the standard DSIR setup). Emits (id, n_features,
    log_weight)."""

    def __init__(self, params: dict[str, Any]):
        self.target_filter = params.get("target_filter")
        self.target_model_path = params.get("target_model_path")
        if bool(self.target_filter) == bool(self.target_model_path):
            raise ValueError(
                "importance_weights node requires exactly one of "
                "target_filter or target_model_path"
            )
        self.text_col = params.get("text_col", "text")
        self.id_col = params.get("id_col", "doc_id")
        self.n_buckets = int(params.get("n_buckets", 4096))
        self.bigrams = bool(params.get("bigrams", True))
        self.salt = params.get("salt", "feat")

    def transform(self, df: DataFrame) -> DataFrame:
        from pyspark.sql import functions as F

        if self.target_model_path:
            target_model = df.sparkSession.read.parquet(self.target_model_path)
        else:
            target_model = text.hashed_bucket_model(
                df.filter(F.expr(self.target_filter)),
                text_col=self.text_col,
                n_buckets=self.n_buckets,
                bigrams=self.bigrams,
                salt=self.salt,
            )
        return text.importance_weights(
            df,
            target_model,
            text_col=self.text_col,
            id_col=self.id_col,
            n_buckets=self.n_buckets,
            bigrams=self.bigrams,
            salt=self.salt,
        )


class WeightedSampleNode:
    """Deterministic weighted sampling without replacement
    (functions.weighted_sample — A-Res with content-hash uniforms,
    round 11): keep k rows with probability ∝ weight_col; the selected
    set is a pure function of (data, salt). Params: weight_col
    (REQUIRED), k (REQUIRED), key_col ('doc_id'), salt ('')."""

    def __init__(self, params: dict[str, Any]):
        if not params.get("weight_col") or "k" not in params:
            raise ValueError(
                "weighted_sample node requires weight_col and k"
            )
        self.weight_col = params["weight_col"]
        self.k = int(params["k"])
        self.key_col = params.get("key_col", "doc_id")
        self.salt = params.get("salt", "")

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.functions import weighted_sample

        return weighted_sample(
            df, self.weight_col, self.k, self.key_col, self.salt
        )


class StratifiedSampleNode:
    """Per-stratum deterministic weighted sampling
    (functions.stratified_sample): keep k rows per strata_col value
    with probability ∝ weight_col — the quota operator of a training
    mix (e.g. k docs per language). Params: strata_col (REQUIRED),
    weight_col (REQUIRED), k (REQUIRED), key_col ('doc_id'),
    salt (''), fan_in (32 — phase-1 top-k fan-out)."""

    def __init__(self, params: dict[str, Any]):
        if (
            not params.get("strata_col")
            or not params.get("weight_col")
            or "k" not in params
        ):
            raise ValueError(
                "stratified_sample node requires strata_col, weight_col and k"
            )
        self.strata_col = params["strata_col"]
        self.weight_col = params["weight_col"]
        self.k = int(params["k"])
        self.key_col = params.get("key_col", "doc_id")
        self.salt = params.get("salt", "")
        self.fan_in = int(params.get("fan_in", 32))

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.functions import stratified_sample

        return stratified_sample(
            df,
            self.strata_col,
            self.weight_col,
            self.k,
            self.key_col,
            self.salt,
            fan_in=self.fan_in,
        )


class TokenBudgetMixNode:
    """Per-stratum token-budget mixture fill
    (mixture.token_budget_mix): keep each stratum's rows in
    deterministic hash order until its TOKEN budget fills — quotas in
    tokens, the way a pretraining mix is specified. Params: strata_col
    (REQUIRED), budgets (REQUIRED dict stratum→budget), token_col
    (REQUIRED), key_col ('doc_id'), salt (''), default_budget (0 —
    strata absent from budgets are excluded), fan_in (32)."""

    def __init__(self, params: dict[str, Any]):
        if (
            not params.get("strata_col")
            or not isinstance(params.get("budgets"), dict)
            or not params.get("token_col")
        ):
            raise ValueError(
                "token_budget_mix node requires strata_col, budgets "
                "(a mapping) and token_col"
            )
        self.strata_col = params["strata_col"]
        self.budgets = {str(k): int(v) for k, v in params["budgets"].items()}
        self.token_col = params["token_col"]
        self.key_col = params.get("key_col", "doc_id")
        self.salt = params.get("salt", "")
        self.default_budget = int(params.get("default_budget", 0))
        self.fan_in = int(params.get("fan_in", 32))

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.operators.mixture import token_budget_mix

        return token_budget_mix(
            df,
            self.strata_col,
            self.budgets,
            self.token_col,
            self.key_col,
            salt=self.salt,
            default_budget=self.default_budget,
            fan_in=self.fan_in,
        )


class SnapshotDiffNode:
    """Diff the flowing snapshot against a stored one
    (functions.snapshot_diff): emit (keys, status) rows for every
    added / removed / changed key — the ingest-loop audit step, and
    the touch-only-the-delta input to reindex decisions. Params:
    old_path (REQUIRED — parquet of the previous snapshot),
    payload_cols (REQUIRED — columns whose digest defines 'changed'),
    key_cols (['doc_id']), include_unchanged (false)."""

    def __init__(self, params: dict[str, Any]):
        if not params.get("old_path") or not params.get("payload_cols"):
            raise ValueError(
                "snapshot_diff node requires old_path and payload_cols"
            )
        self.old_path = params["old_path"]
        self.payload_cols = list(params["payload_cols"])
        self.key_cols = list(params.get("key_cols", ["doc_id"]))
        self.include_unchanged = bool(params.get("include_unchanged", False))

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.functions import snapshot_diff

        old = df.sparkSession.read.parquet(self.old_path)
        return snapshot_diff(
            old,
            df,
            self.key_cols,
            self.payload_cols,
            include_unchanged=self.include_unchanged,
        )


class InterleaveStrataNode:
    """Domain-interleaved training order (mixture.interleave_strata):
    add each row's 1-based position within its stratum along the
    deterministic hash order — sort shards by (out_col, strata_col)
    to spread domains evenly through the epoch. Params: strata_col
    (REQUIRED), key_col ('doc_id'), salt (''), out_col
    ('interleave_rank'), fan_in (32)."""

    def __init__(self, params: dict[str, Any]):
        if not params.get("strata_col"):
            raise ValueError("interleave_strata node requires strata_col")
        self.strata_col = params["strata_col"]
        self.key_col = params.get("key_col", "doc_id")
        self.salt = params.get("salt", "")
        self.out_col = params.get("out_col", "interleave_rank")
        self.fan_in = int(params.get("fan_in", 32))

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.operators.mixture import interleave_strata

        return interleave_strata(
            df,
            self.strata_col,
            self.key_col,
            salt=self.salt,
            out_col=self.out_col,
            fan_in=self.fan_in,
        )


class _SketchParams:
    """Shared param scaffolding for the sketch-family nodes: one
    REQUIRED column plus the common (k, group_cols, salt, out_col,
    fan_in) block — one copy, so a validation change (e.g. a fan_in
    bound) lands in every sketch node."""

    K_DEFAULT = 256

    def __init__(self, params: dict[str, Any], required: str, out: str):
        if not params.get(required):
            raise ValueError(f"{self.NAME} node requires {required}")
        self.required_col = params[required]
        self.k = int(params.get("k", self.K_DEFAULT))
        self.group_cols = list(params.get("group_cols", []) or [])
        self.salt = params.get("salt", "")
        self.out_col = params.get("out_col", out)
        self.fan_in = int(params.get("fan_in", 32))
        if self.fan_in < 1:
            raise ValueError(
                f"{self.NAME} fan_in must be >= 1, got {self.fan_in}"
            )


class KmvSketchNode(_SketchParams):
    """KMV distinct-count sketch table (functions.kmv_sketch): the k
    smallest content hashes of ``col`` per group — the mergeable
    cardinality primitive an ingest loop appends per batch. Params:
    col (REQUIRED), k (256), group_cols ([]), salt (''), out_col
    ('kmv'), fan_in (32)."""

    NAME = "kmv_sketch"

    def __init__(self, params: dict[str, Any]):
        super().__init__(params, "col", "kmv")

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.functions import kmv_sketch

        return kmv_sketch(
            df, self.required_col, k=self.k, group_cols=self.group_cols,
            salt=self.salt, out_col=self.out_col, fan_in=self.fan_in,
        )


class QuantileSketchNode(_SketchParams):
    """Bottom-k rank sketch table (functions.quantile_sketch): the
    mergeable bounded-state quantile sample an ingest loop appends per
    batch. Params: value_col (REQUIRED), id_col ('doc_id'), k (256),
    group_cols ([]), salt (''), out_col ('qsk'), fan_in (32)."""

    NAME = "quantile_sketch"

    def __init__(self, params: dict[str, Any]):
        super().__init__(params, "value_col", "qsk")
        self.id_col = params.get("id_col", "doc_id")

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.functions import quantile_sketch

        return quantile_sketch(
            df, self.required_col, self.id_col, k=self.k,
            group_cols=self.group_cols, salt=self.salt,
            out_col=self.out_col, fan_in=self.fan_in,
        )


class PrioritySketchNode(_SketchParams):
    """Priority-sampling sketch table (functions.priority_sketch): the
    mergeable weighted sample + subset-sum estimator an ingest loop
    appends per batch. Params: weight_col (REQUIRED), id_col
    ('doc_id'), k (256), group_cols ([]), salt (''), out_col ('psk'),
    fan_in (32)."""

    NAME = "priority_sketch"

    def __init__(self, params: dict[str, Any]):
        super().__init__(params, "weight_col", "psk")
        self.id_col = params.get("id_col", "doc_id")

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.functions import priority_sketch

        return priority_sketch(
            df, self.required_col, self.id_col, k=self.k,
            group_cols=self.group_cols, salt=self.salt,
            out_col=self.out_col, fan_in=self.fan_in,
        )


class FrequentItemsNode(_SketchParams):
    """Exact per-group top-k heavy hitters (functions.frequent_items).
    Params: col (REQUIRED), k (20), group_cols ([]), count_col
    ('cnt'), fan_in (32), pre_counted (false — set true when the
    input is already a (group, value, count) table, e.g. a rolling
    ledger)."""

    NAME = "frequent_items"
    K_DEFAULT = 20

    def __init__(self, params: dict[str, Any]):
        # frequent_items is an EXACT count, not a salted hash sketch:
        # it takes neither 'salt' nor 'out_col' (the output column is
        # count_col).  Accepting-and-ignoring them would let a spec
        # set out_col and silently get a column named by count_col.
        for bogus in ("out_col", "salt"):
            if bogus in params:
                raise ValueError(
                    f"{self.NAME} node does not take {bogus!r} "
                    f"(use count_col to name the count column)"
                )
        super().__init__(params, "col", "cnt")
        self.count_col = params.get("count_col", "cnt")
        self.pre_counted = bool(params.get("pre_counted", False))

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.functions import frequent_items

        return frequent_items(
            df, self.required_col, k=self.k, group_cols=self.group_cols,
            count_col=self.count_col, fan_in=self.fan_in,
            pre_counted=self.pre_counted,
        )


class TranscodeMediaNode:
    """Cross-codec still-image transcode (multimodal.transcode_media):
    BMP / PNG / GIF-frame-0 in, 'png' or 'bmp' out, channel-faithful.
    Params: to (REQUIRED — 'png' | 'bmp'; 'gif' is refused: palette
    quantization is a modeling choice, not a container rewrite)."""

    def __init__(self, params: dict[str, Any]):
        if not params.get("to"):
            raise ValueError("transcode_media node requires to")
        self.to = str(params["to"]).lower()
        from firebolt_spark.operators.multimodal import _TRANSCODE_MIMES

        if self.to not in _TRANSCODE_MIMES:
            raise ValueError(
                f"transcode_media to must be one of "
                f"{sorted(_TRANSCODE_MIMES)}, got {self.to!r}"
            )

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.operators.multimodal import transcode_media

        return transcode_media(df, to=self.to)


class GifFramesNode:
    """Real frame extraction over the GIF codec
    (multimodal.gif_frames): one row per kept frame with its own
    channel means, strided at parse time. Params: every_nth (1)."""

    def __init__(self, params: dict[str, Any]):
        self.every_nth = int(params.get("every_nth", 1))
        if self.every_nth < 1:
            raise ValueError(
                f"gif_frames every_nth must be >= 1, got {self.every_nth}"
            )

    def transform(self, df: DataFrame) -> DataFrame:
        from firebolt_spark.operators.multimodal import gif_frames

        return gif_frames(df, every_nth=self.every_nth)


def register_llm_node_types(registry) -> None:
    registry.register_node_type("dedup_exact", ExactDedupNode, None, None)
    registry.register_node_type("dedup_minhash", MinhashDedupNode, None, None)
    registry.register_node_type("simhash", SimhashNode, None, None)
    registry.register_node_type("ngram_jaccard", NgramJaccardNode, None, None)
    registry.register_node_type("similarity_search", SimilaritySearchNode, None, None)
    registry.register_node_type("text_stats", TextStatsNode, None, None)
    registry.register_node_type("repetition", RepetitionStatsNode, None, None)
    registry.register_node_type("language_id", LanguageIdNode, None, None)
    registry.register_node_type("token_count", TokenCountNode, None, None)
    registry.register_node_type("fingerprint", FingerprintNode, None, None)
    registry.register_node_type("redact", RedactNode, None, None)
    registry.register_node_type("chunk", ChunkNode, None, None)
    registry.register_node_type("media_features", MediaFeaturesNode, None, None)
    registry.register_node_type("media_resize", MediaResizeNode, None, None)
    registry.register_node_type("shard_pack", ShardPackNode, None, None)
    registry.register_node_type("embedding_near_dup", EmbeddingNearDupNode, None, None)
    registry.register_node_type("temperature_mix", TemperatureMixNode, None, None)
    registry.register_node_type("hash_split", HashSplitNode, None, None)
    registry.register_node_type("span_dedup", SpanDedupNode, None, None)
    registry.register_node_type("line_dedup", LineDedupNode, None, None)
    registry.register_node_type("c4_line_filter", C4LineFilterNode, None, None)
    registry.register_node_type("span_dedup_overlap", SpanDedupOverlapNode, None, None)
    registry.register_node_type("span_dedup_candidates", SpanDedupCandidatesNode, None, None)
    registry.register_node_type("winnow_fingerprint", WinnowFingerprintNode, None, None)
    registry.register_node_type("dedup_incremental", IncrementalDedupNode, None, None)
    registry.register_node_type("lm_quality", LmQualityNode, None, None)
    registry.register_node_type("gopher_quality", GopherQualityNode, None, None)
    registry.register_node_type("classifier_score", ClassifierScoreNode, None, None)
    registry.register_node_type("importance_weights", ImportanceWeightsNode, None, None)
    registry.register_node_type("weighted_sample", WeightedSampleNode, None, None)
    registry.register_node_type(
        "stratified_sample", StratifiedSampleNode, None, None
    )
    registry.register_node_type(
        "token_budget_mix", TokenBudgetMixNode, None, None
    )
    registry.register_node_type("snapshot_diff", SnapshotDiffNode, None, None)
    registry.register_node_type(
        "interleave_strata", InterleaveStrataNode, None, None
    )
    registry.register_node_type("semantic_near_dup", SemanticNearDupNode, None, None)
    registry.register_node_type("kmv_sketch", KmvSketchNode, None, None)
    registry.register_node_type(
        "quantile_sketch", QuantileSketchNode, None, None
    )
    registry.register_node_type(
        "priority_sketch", PrioritySketchNode, None, None
    )
    registry.register_node_type(
        "frequent_items", FrequentItemsNode, None, None
    )
    registry.register_node_type("gif_frames", GifFramesNode, None, None)
    registry.register_node_type(
        "transcode_media", TranscodeMediaNode, None, None
    )
