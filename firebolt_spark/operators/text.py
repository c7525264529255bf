"""Text-analysis operators for training-data pipelines.

Language-ID (stopword-profile heuristic), quality scoring
(length/punctuation/stopword ratios), token counting (whitespace and a
BPE-ish regex segmentation), and document fingerprinting (min-hash of
shingles — a winnowing-style content fingerprint). All pure column
expressions; each scales as a single scan with no shuffle except where
an aggregation is requested.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from firebolt_spark.operators.dedup import word_shingles

# tiny per-language stopword profiles for the n-gram/stopword heuristic
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and"],
    "es": ["el", "la", "de", "que"],
    "fr": ["le", "la", "et", "les"],
    "de": ["der", "die", "und", "das"],
    "zh": ["的", "是", "了", "在"],
}

_PUNCT = ".,;:!?'\"()-"


def _count_occurrences(padded: Column, needle: str) -> Column:
    """Occurrences of a space-delimited word via length arithmetic —
    identical semantics in any SQL engine (no regex dialect drift)."""
    token = f" {needle} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(token), F.lit(""))))
        / F.lit(len(token))
    ).cast("int")


def lang_scores(text_col: str = "text") -> dict[str, Column]:
    """Per-language stopword hit counts (with multiplicity)."""
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    return {
        lang: reduce(
            Column.__add__, [_count_occurrences(padded, w) for w in words]
        )
        for lang, words in LANG_PROFILES.items()
    }


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic language ID: argmax of stopword-profile scores, ties
    broken by language code order (deterministic)."""
    scores = lang_scores(text_col)
    out = docs.select(
        "doc_id",
        F.col("lang").alias("lang_actual"),
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
    )
    langs = sorted(LANG_PROFILES)
    best = F.greatest(*[F.col(f"score_{lang}") for lang in langs])
    pred = None
    for lang in reversed(langs):
        cond = F.when(F.col(f"score_{lang}") == best, F.lit(lang))
        pred = cond.otherwise(pred) if pred is not None else cond
    return out.withColumn("lang_pred", pred)


def text_stats(
    docs: DataFrame,
    text_col: str = "text",
    *,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Quality-scoring features: char/token counts, average token
    length, punctuation ratio, stopword ratio, uppercase ratio.

    ``carry_cols`` names extra input columns appended unchanged (e.g.
    ``text`` itself, so a composition can chain further per-row
    operators onto ONE corpus scan instead of re-scanning per
    consumer — the r17 ``hashed_ngram_counts`` pattern). The stats
    columns are identical either way."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    n_chars = F.length(F.col(text_col))
    stripped_punct = F.translate(F.col(text_col), _PUNCT, "")
    n_punct = n_chars - F.length(stripped_punct)
    padded = F.concat(F.lit(" "), F.col(text_col), F.lit(" "))
    stop_hits = reduce(
        Column.__add__,
        [_count_occurrences(padded, w) for w in LANG_PROFILES["en"]],
    )
    return docs.select(
        "doc_id",
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.round(n_chars.cast("double") / n_tokens, 4).alias("avg_token_len"),
        F.round(n_punct.cast("double") / n_chars, 4).alias("punct_ratio"),
        F.round(stop_hits.cast("double") / n_tokens, 4).alias("stopword_ratio"),
        *carry_cols,
    )


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    §A1.1 uses duplicate-line/-paragraph and top-n-gram fractions as
    quality gates; the fixtures' documents are single-line word soup, so
    the word-level analogues apply):

    - ``dup_word_frac``  — 1 − distinct words / words: bulk repetition.
    - ``top_bigram_frac`` — occurrences of the most frequent word
      bigram / total bigrams: looping/boilerplate detection.

    Zero shuffle: both metrics are per-row higher-order expressions —
    the bigram multiplicity comes from a fold over the SORTED bigram
    array (longest run of equal adjacent elements == max multiplicity),
    not an explode + groupBy. A 100 TB corpus pays one scan.
    """
    words = F.expr(f"split(trim({text_col}), ' ')")
    d = docs.select("doc_id", words.alias("_w"))
    n_words = F.size("_w")
    n_distinct = F.size(F.array_distinct("_w"))
    # adjacent-pair bigrams: zip the array against itself shifted by one
    bigrams = (
        "zip_with(slice(_w, 1, greatest(size(_w) - 1, 0)), "
        "slice(_w, 2, greatest(size(_w) - 1, 0)), "
        "(x, y) -> concat(x, ' ', y))"
    )
    top_run = F.expr(
        f"aggregate(array_sort({bigrams}), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', CASE WHEN acc.prev IS NOT NULL AND x = acc.prev "
        "              THEN acc.run + 1 ELSE 1 END, "
        "  'best', greatest(acc.best, "
        "     CASE WHEN acc.prev IS NOT NULL AND x = acc.prev "
        "          THEN acc.run + 1 ELSE 1 END)), "
        "acc -> acc.best)"
    )
    return d.select(
        "doc_id",
        n_words.alias("n_words"),
        F.round(
            F.when(n_words > 0, (n_words - n_distinct).cast("double") / n_words)
            .otherwise(F.lit(0.0)),
            4,
        ).alias("dup_word_frac"),
        F.round(
            F.when(
                n_words >= 2, top_run.cast("double") / (n_words - F.lit(1))
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("top_bigram_frac"),
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting: whitespace tokens and a BPE-ish segmentation
    proxy — alphanumeric runs plus non-space punctuation marks each
    count as a token (≈ what a byte-pair tokenizer's pre-tokenizer
    does), plus a chars/4 heuristic (the classic LLM budget rule)."""
    ws = F.size(F.split(F.col(text_col), " "))
    alnum_runs = F.size(
        F.filter(
            F.split(F.col(text_col), "[^0-9A-Za-z]+"),
            lambda x: x != F.lit(""),
        )
    )
    punct_marks = F.length(F.col(text_col)) - F.length(
        F.translate(F.col(text_col), _PUNCT, "")
    )
    return docs.select(
        "doc_id",
        ws.alias("ws_tokens"),
        (alnum_runs + punct_marks).alias("bpe_ish_tokens"),
        F.ceil(F.length(F.col(text_col)) / F.lit(4)).cast("bigint").alias(
            "chars_div4_tokens"
        ),
    )


def chunk(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    standard LLM training/RAG prep step. One explode per doc; chunk
    boundaries are token offsets (stride = chunk_tokens - overlap).

    Output: doc_id, chunk_idx (0-based), chunk_text, n_chunk_tokens.
    Built from higher-order array functions (no UDF); at scale the
    explode fan-out is bounded by tokens/stride per doc.
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = f"split({text_col}, ' ')"
    starts = (
        f"sequence(1, greatest(size({toks}) - {overlap}, 1), {stride})"
    )
    chunks = (
        f"transform(array({toks}), t -> transform({starts}, "
        f"s -> slice(t, s, {chunk_tokens})))[0]"
    )
    exploded = docs.select(
        "doc_id",
        F.posexplode(F.expr(chunks)).alias("chunk_idx", "_chunk_toks"),
    )
    return exploded.select(
        "doc_id",
        "chunk_idx",
        F.concat_ws(" ", F.col("_chunk_toks")).alias("chunk_text"),
        F.size("_chunk_toks").alias("n_chunk_tokens"),
    )


# common PII shapes for corpus scrubbing; each replacement is a typed tag
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+?\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def redact(
    docs: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """PII scrubbing: replace each pattern class with ``<TAG>`` and
    count the redactions per class. Pure regexp_replace column chain —
    single scan, no shuffle, whole-stage codegen."""
    pats = patterns or PII_PATTERNS
    col = F.col(text_col)
    counts = []
    for tag, pattern in pats.items():
        n_before = F.size(F.split(col, pattern)) - 1
        counts.append(n_before.alias(f"n_{tag}"))
        col = F.regexp_replace(col, pattern, f"<{tag.upper()}>")
    return docs.select(
        "*",
        col.alias(out_col or f"{text_col}_redacted"),
        *counts,
    )


def normalize_text(
    docs: DataFrame,
    text_col: str = "text",
    out_col: str | None = None,
    lowercase: bool = True,
) -> DataFrame:
    """Corpus text normalization: collapse whitespace runs, trim, and
    (optionally) lowercase — the canonical pre-dedup normalization so
    near-identical docs differing only in casing/spacing hash together.
    Pure column expressions, single scan; emits a change flag so the
    pipeline can count affected docs without a second pass."""
    col = F.regexp_replace(F.col(text_col), r"\s+", " ")
    col = F.trim(col)
    if lowercase:
        col = F.lower(col)
    out = out_col or f"{text_col}_norm"
    return docs.select(
        "*",
        col.alias(out),
        (col != F.col(text_col)).alias("changed"),
    )


def c4_line_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    min_kept_lines: int = 3,
) -> DataFrame:
    """C4-style line-and-page cleaning (Raffel et al. 2020 §2.2, round
    12) — the rule-based boilerplate pass that precedes
    :func:`firebolt_spark.operators.dedup.dedup_lines` in the C4
    pipeline. Line rules (each line must pass ALL):

    - ends in a terminal punctuation mark (``.``, ``!``, ``?``, or a
      closing quote ``"``);
    - contains at least ``min_words`` whitespace words;
    - does not contain the word "javascript" (case-insensitive) —
      the browser-requirement boilerplate marker.

    Page rules: a document is kept (``keep = 1``) only if it contains
    no curly brace ``{`` (code, not prose — the paper drops the page
    outright) and at least ``min_kept_lines`` lines survive.

    Emits ``text_clean`` (surviving lines re-joined), ``n_lines``,
    ``n_kept``, ``keep``. Entirely higher-order array functions over
    one scan — no UDF, no shuffle, no explode (the line arrays never
    leave their row) — so the whole pass is whole-stage codegen and a
    SQL oracle replays it with list_filter. NULL text behaves as the
    empty page: 1 raw line, 0 kept, dropped."""
    col = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(col, "\n")

    def line_ok(x):
        t = F.trim(x)
        return (
            t.rlike('[.!?"]$')
            & (F.size(F.split(t, " +")) >= F.lit(int(min_words)))
            & ~F.lower(x).contains("javascript")
        )

    kept = F.filter(lines, line_ok)
    return docs.select(
        "doc_id",
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("text_clean"),
        (
            (~col.contains("{"))
            & (F.size(kept) >= F.lit(int(min_kept_lines)))
        )
        .cast("int")
        .alias("keep"),
    )


def pack_shards(
    docs: DataFrame,
    budget_tokens: int = 4096,
    text_col: str = "text",
) -> DataFrame:
    """Assign documents to training shards by token budget: documents
    are taken in doc_id order and shard ``k`` holds the docs whose
    exclusive running token total lies in ``[k·budget, (k+1)·budget)``
    — the standard greedy pack (a shard may overrun by at most one
    document). Deterministic and order-defined, so it's exactly
    SQL-expressible.

    The running total uses ``global_cumsum`` (two-phase: range
    partition + broadcast prefix totals) — NOT a single-partition
    global window, so packing a 100 TB corpus parallelizes.
    """
    from firebolt_spark.functions import global_cumsum

    toks = docs.select(
        "doc_id", F.size(F.split(F.col(text_col), " ")).alias("n_tokens")
    )
    with_cum = global_cumsum(toks, "n_tokens", ["doc_id"], out_col="_cum")
    return with_cum.select(
        "doc_id",
        "n_tokens",
        F.floor(
            (F.col("_cum") - F.col("n_tokens")) / F.lit(float(budget_tokens))
        )
        .cast("int")
        .alias("shard_id"),
    )


def token_count(text_col: str):
    """The packing family's token-count expression — whitespace split,
    NULL/empty counts ZERO (no phantom tokens for contentless docs).
    ONE definition shared by :func:`pack_sequences` and every caller
    that must agree with its running total (the streaming ledger
    drill carries offsets computed with this same expression); the
    oracle SQLs mirror it as a CASE (round-16 review: three inline
    copies of this rule were one refactor away from silent offset
    drift)."""
    col = F.col(text_col)
    return (
        F.when(col.isNull() | (col == ""), F.lit(0))
        .otherwise(F.size(F.split(col, " ")))
        .cast("bigint")
    )


def pack_sequences(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    stream_offset: int = 0,
    min_doc_id: int | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence packing: concatenate the corpus token stream
    in doc_id order and SPLIT it at fixed ``seq_len`` boundaries,
    emitting one row per (document, training sequence) span — the op
    that turns a cleaned corpus into the exact training examples an
    autoregressive run consumes (GPT-2/3 pack-and-split; T5's "pack
    to max_seq_len"). Unlike :func:`pack_shards` (whole-document
    shard assignment, may overrun), every sequence here is exactly
    full: a document crossing a boundary is cut, and the row carries
    where each cut lands.

    Output: doc_id, n_tokens (whole doc), seq_id (training example
    index), off_in_seq (the span's start offset inside the
    sequence), off_in_doc (the span's start offset inside the
    DOCUMENT — what a materializer slices the doc's token array
    with), n_toks (tokens of this doc in this sequence). A doc spans
    sequences floor(start/L) .. floor((end-1)/L) of the global
    stream; offsets/lengths are pure integer arithmetic off the
    global running total — deterministic, so the whole table is
    SQL-replayable (oracle q_sequence_pack).

    Scale shape: token counting is in-row; the ONLY shuffle is
    :func:`~firebolt_spark.functions.global_cumsum`'s range
    partition (+ its small driver totals job); the boundary explode
    is map-side with ~(n_tokens/L + 1) rows per doc. Integer
    division uses SQL ``div`` on BIGINT throughout — no double
    rounding at 100 TB token-stream offsets. Token = whitespace
    split (as in :func:`pack_shards`), except that NULL/empty
    documents contribute ZERO tokens and emit NO span — a packed
    training stream must not carry phantom tokens for contentless
    docs (round-16 review).

    ``stream_offset`` makes packing INCREMENTAL at ingest time: new
    documents append at the stream tail, so a batch packed at the
    previous batch's final token total continues the same global
    stream — batch-by-batch packing with a carried offset equals the
    one-shot packing of the concatenation, row for row (drilled with
    crash restarts in tests/test_streaming_e2e.py). Earlier examples
    never move; only the boundary sequence gains spans.  That holds
    ONLY under the append-at-tail invariant: every doc in the batch
    must sort after every doc already packed.  ``min_doc_id`` (the
    ledger's high-water doc_id) ENFORCES it (ADVICE r16 #2): any row
    with ``doc_id <= min_doc_id`` raises at execution time — a
    late/out-of-order arrival would otherwise silently corrupt the
    global stream (the per-batch cumsum would place it after the
    carried offset while one-shot packing places it earlier).  The
    guard lives inside the count expression's data path (JVM-side
    ``raise_error``, no extra action, can't be pruned); callers
    persist MAX(doc_id) alongside the token total in their ledger.

    ``count_col`` (VERDICT r16 Next #6) substitutes a PRECOMPUTED
    per-document token count — :func:`token_counts`' BPE-ish counts,
    or a real tokenizer's — for the whitespace default; the span
    arithmetic is identical (the operator never looks at the text
    when counts are supplied).  NULL counts pack as zero (no span);
    negative counts raise at execution time.
    """
    from firebolt_spark.functions import global_cumsum

    ln = int(seq_len)
    if ln < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    off = int(stream_offset)
    if off < 0:
        raise ValueError(f"stream_offset must be >= 0, got {stream_offset}")
    if count_col is not None:
        n_raw = F.coalesce(F.col(count_col).cast("bigint"), F.lit(0))
        count_expr = F.when(
            n_raw < 0,
            F.raise_error(
                F.concat(
                    F.lit(f"pack_sequences: negative {count_col}="),
                    n_raw.cast("string"),
                    F.lit(" at doc_id="),
                    F.col("doc_id").cast("string"),
                )
            ).cast("bigint"),
        ).otherwise(n_raw)
    else:
        count_expr = token_count(text_col)
    if min_doc_id is not None:
        # Guard INSIDE the value expression so Catalyst cannot prune
        # it: the count is only produced for rows that satisfy the
        # append-at-tail invariant.
        count_expr = F.when(
            F.col("doc_id") <= F.lit(int(min_doc_id)),
            F.raise_error(
                F.concat(
                    F.lit(
                        "pack_sequences: append-at-tail violated — doc_id="
                    ),
                    F.col("doc_id").cast("string"),
                    F.lit(f" <= min_doc_id={int(min_doc_id)}"),
                )
            ).cast("bigint"),
        ).otherwise(count_expr)
    toks = docs.select(
        "doc_id", count_expr.alias("n_tokens")
    ).filter(F.col("n_tokens") > 0)
    cum = global_cumsum(toks, "n_tokens", ["doc_id"], out_col="_cend")
    if off:
        cum = cum.withColumn("_cend", F.col("_cend") + F.lit(off))
    spans = cum.select(
        "doc_id",
        "n_tokens",
        (F.col("_cend") - F.col("n_tokens")).alias("_cstart"),
        "_cend",
        F.explode(
            F.sequence(
                F.expr(f"(_cend - n_tokens) div {ln}"),
                F.expr(f"(_cend - 1) div {ln}"),
            )
        ).alias("seq_id"),
    )
    seq_start = F.col("seq_id") * F.lit(ln)
    span_start = F.greatest(F.col("_cstart"), seq_start)
    return spans.select(
        "doc_id",
        "n_tokens",
        "seq_id",
        (span_start - seq_start).cast("bigint").alias("off_in_seq"),
        (span_start - F.col("_cstart")).cast("bigint").alias("off_in_doc"),
        (
            F.least(F.col("_cend"), seq_start + F.lit(ln)) - span_start
        ).cast("bigint").alias("n_toks"),
    )


def _stitch_spans(
    spans: DataFrame,
    docs: DataFrame,
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Compose a :func:`pack_sequences` span table back onto the
    documents: slice each doc's token array by ``off_in_doc`` /
    ``n_toks`` and stitch the pieces per sequence in ``off_in_seq``
    order.  The ONE stitch shared by the batch materializer
    (:func:`pack_sequence_texts`) and the incremental one
    (:func:`materialize_sequences`) — two copies of the slice
    arithmetic would be one edit away from emitting different
    training examples for the same span table.

    ``tokens_col`` names a precomputed token-array column (a real
    tokenizer's output); default is the whitespace split of
    ``text_col`` — the same rule as :func:`token_count`, so spans
    and slices agree.  Output text is the space-join of the packed
    tokens in either case."""
    if tokens_col is not None:
        toks = F.col(tokens_col)
        doc_cols = docs.select("doc_id", tokens_col)
    else:
        toks = F.split(F.col(text_col), " ")
        doc_cols = docs.select("doc_id", text_col)
    piece = F.concat_ws(
        " ",
        F.slice(
            toks,
            (F.col("off_in_doc") + 1).cast("int"),
            F.col("n_toks").cast("int"),
        ),
    )
    joined = spans.join(doc_cols, "doc_id").select(
        "seq_id", "off_in_seq", "n_toks", piece.alias("_piece")
    )
    return (
        joined.groupBy("seq_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("off_in_seq", "_piece"))
                    ),
                    lambda x: x["_piece"],
                ),
                " ",
            ).alias("text"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("n_toks"),
        )
    )


def pack_sequence_texts(
    docs: DataFrame,
    seq_len: int = 2048,
    text_col: str = "text",
    count_col: str | None = None,
    tokens_col: str | None = None,
) -> DataFrame:
    """Materialize the packed training examples: compose
    :func:`pack_sequences`' span table back onto the documents and
    emit one row per training sequence with its ACTUAL text — each
    document's contribution sliced by ``off_in_doc``/``n_toks`` and
    stitched in ``off_in_seq`` order. This is the table a shard
    writer persists; every sequence except the last carries exactly
    ``seq_len`` tokens.

    Deliberately a BATCH materializer (no ``stream_offset``): a
    sequence straddling an ingest-batch boundary would be emitted as
    two partial rows under the same seq_id, and appending those to a
    shard table would persist corrupt short examples at every seam
    (round-16 review). Incremental ingest should accumulate
    :func:`pack_sequences` spans with a carried offset and
    materialize a sequence only once the stream has moved past it.

    Output: seq_id, text (space-joined packed tokens), n_docs
    (documents contributing), n_toks (token fill — == seq_len except
    the final sequence).

    Scale shape: the span table is narrow; the doc join ships each
    document's text once per span it appears in (bounded by
    ``n_tokens/seq_len + 1`` copies — the honest materialization
    cost), the slice is in-row (``slice`` over the token array), and
    the stitch is one groupBy(seq_id) whose in-group order comes from
    ``array_sort`` over (off_in_seq, piece) structs — deterministic,
    no Window, SQL-replayable (oracle q_sequence_texts).

    ``tokens_col`` (VERDICT r16 Next #6) supplies a precomputed
    token-array column (a real tokenizer's output) to slice instead
    of the whitespace split; the span arithmetic then runs on the
    array's sizes (or ``count_col`` when given) so counts and slices
    cannot disagree."""
    if tokens_col is not None and count_col is None:
        docs = docs.withColumn(
            "_fb_tok_n", F.coalesce(F.size(tokens_col), F.lit(0)).cast("bigint")
        )
        count_col = "_fb_tok_n"
    spans = pack_sequences(docs, seq_len, text_col, count_col=count_col)
    return _stitch_spans(spans, docs, text_col, tokens_col)


def materialize_sequences(
    spans: DataFrame,
    docs: DataFrame,
    seq_len: int,
    below_total: int | None = None,
    min_seq_id: int = 0,
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Incremental sequence materialization (VERDICT r16 Next #3):
    stitch training-example texts from an ACCUMULATED span table —
    the one an ingest loop builds batch-by-batch with
    :func:`pack_sequences(stream_offset=...)` — emitting only the
    sequences the stream has moved PAST.  This is the streaming
    complement of :func:`pack_sequence_texts`, which must see the
    whole corpus at once; here the span table may keep growing while
    completed sequences ship.

    The watermark cut: a sequence is COMPLETE once the packed-token
    total reaches its end, i.e. ``(seq_id + 1) * seq_len <=
    below_total`` — equivalently ``seq_id < below_total div
    seq_len``.  ``below_total`` is the ingest ledger's high-water
    token total; the boundary sequence (partially filled at the
    watermark) is NOT emitted, because later batches will append
    spans under the same seq_id and an early emission would persist
    a corrupt short example (the round-16 batch-boundary hazard).
    ``below_total=None`` is FINALIZATION: the stream is closed, so
    the tail sequence (the only legitimately short one) is stitched
    too.  ``min_seq_id`` excludes sequences already materialized by
    prior runs; successive calls with ``[prev_cut, new_cut)`` emit
    every sequence exactly once (drilled with a mid-batch crash in
    tests/test_streaming_e2e.py).

    Scale shape: both cuts are narrow filters on the span table
    applied BEFORE the doc join — a run materializes only the new
    window's spans, not the history; the stitch itself is
    :func:`_stitch_spans` (slice in-row, one groupBy(seq_id)).
    Deterministic given (spans, docs, cut), so the whole readout is
    SQL-replayable (oracle q_sequence_materialize)."""
    ln = int(seq_len)
    if ln < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    window = spans
    if min_seq_id:
        window = window.filter(F.col("seq_id") >= F.lit(int(min_seq_id)))
    if below_total is not None:
        cut = int(below_total) // ln
        window = window.filter(F.col("seq_id") < F.lit(cut))
    return _stitch_spans(window, docs, text_col, tokens_col)


def fingerprints(docs: DataFrame, text_col: str = "text", n: int = 3) -> DataFrame:
    """Content fingerprint: the minimum md5 over word n-gram shingles
    (a 1-permutation minhash — winnowing-style document signature).
    Identical content → identical fingerprint, robust to document
    ordering within the corpus; engine-portable via md5."""
    sh = docs.select(
        "doc_id", F.explode(word_shingles(text_col, n)).alias("sh")
    )
    return sh.groupBy("doc_id").agg(
        F.min(F.md5(F.col("sh"))).alias("fingerprint")
    )


def unigram_model(
    docs: DataFrame, text_col: str = "text", min_count: int = 1
) -> DataFrame:
    """Corpus unigram LM: one row per whitespace token with its count,
    plus the corpus total and vocabulary size (constant columns) — the
    model table ``lm_cross_entropy`` scores against with Laplace
    smoothing. Built with one map-side-combined shuffle.

    ``min_count`` prunes the vocabulary's heavy tail BEFORE the
    total/vsize constants are computed, so a pruned model is a
    self-consistent smaller LM (tokens dropped here score as OOV).
    Whitespace vocabularies of dirty web corpora are heavy-tailed
    (URLs, hashes, typos each appear once) and can reach billions of
    entries — far past what any single executor should hold; with
    ``min_count >= 2`` the vocabulary collapses to roughly the token
    types that actually repeat, which is what makes the model table
    broadcastable at 100 TB (see ``lm_cross_entropy.broadcast_model``).
    """
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    tok = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("token")
    )
    counts = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    if min_count > 1:
        counts = counts.filter(F.col("cnt") >= min_count)
    # deliberately NOT persisted (unlike the bounded bucket models,
    # r17): the two references to counts (vocabulary rows + broadcast
    # total) share their map-side scan via ReuseExchange, only the
    # vocab-sized reduce runs twice — while pinning a dirty-web
    # vocabulary (billions of types pre-pruning) would cache the one
    # table this operator is designed not to hold. Measured: the pin
    # cost +0.2 s at sf0.1 (cache barrier) for no plan improvement.
    total = counts.agg(
        F.sum("cnt").alias("total"), F.count(F.lit(1)).alias("vsize")
    )
    return counts.crossJoin(F.broadcast(total))


def lm_cross_entropy(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    model: DataFrame | None = None,
    broadcast_model: bool | None = None,
) -> DataFrame:
    """Per-document unigram cross-entropy (bits/token) — the cheap,
    fully-distributed stand-in for perplexity-based quality filtering
    (CCNet/KenLM-style): documents whose token distribution is far
    from the corpus LM score HIGH and are filter candidates; dull
    high-frequency boilerplate scores LOW.

    ``model`` defaults to the corpus's own :func:`unigram_model`
    (self-scoring); pass a model built from a held-out reference
    corpus for true quality filtering. Probabilities are Laplace-
    smoothed — ``p(w) = (cnt + 1) / (total + vocab)`` with cnt = 0 for
    OOV — so an unseen token always scores strictly rarer than any
    in-vocabulary token.

    Returns ``(id, n_tokens int, bits_per_token double)`` with the
    score rounded to 4 decimals. NULL-text documents produce no token
    rows and are OMITTED from the output (the oracle's unnest drops
    them identically) — left-join the result back to the corpus if a
    row per document is required.

    Scale shape: token stream → model join → one narrow groupBy on
    the doc key. Document bodies are scanned once and never shuffled;
    both aggregations are map-side combined.

    ``broadcast_model`` controls the vocabulary join strategy:

    - ``None`` (default) — broadcast-hint only the model the function
      built ITSELF (the self-scoring path, whose vocabulary is the
      corpus's own — caller opted into a corpus-sized model table and
      at 100 TB must pair it with ``unigram_model(min_count=...)``
      pruning); a caller-supplied ``model`` gets NO hint, so Catalyst
      broadcasts only if its size estimate clears
      ``autoBroadcastJoinThreshold`` and otherwise plans a shuffled
      hash join. Web-scale whitespace vocabularies are heavy-tailed
      (every URL/hash/typo is a type) and can exceed the 8 GB
      broadcast hard limit — forcing the hint there fails the job
      outright.
    - ``True`` — always hint (the vocabulary is known-small).
    - ``False`` — never hint: the token stream shuffles on ``token``
      against the model; correct at any vocabulary size.

    The 1-row total/vsize constants are always broadcast.
    """
    if model is None:
        model = unigram_model(docs, text_col)
        if broadcast_model is None:
            broadcast_model = True
    tok = docs.select(
        F.col(id_col),
        F.explode(F.split(F.trim(F.col(text_col)), " ")).alias("token"),
    )
    # aggregate token OCCURRENCES per (doc, type) before the model
    # join: every downstream per-row cost — the vocab join probe and
    # especially the decimal arithmetic below — then scales with
    # distinct types per doc, not raw token count (round 9: the
    # decimal-sum aggregation was the measured 1.9× q_lm_quality
    # regression; grouping cut sf1 3.0 s → 1.8 s with bit-identical
    # output). The (id, token) pre-aggregation is map-side combined.
    per_type = tok.groupBy(id_col, "token").agg(
        F.count(F.lit(1)).alias("occ")
    )
    # total/vsize are properties of the MODEL, not of the joined row —
    # carried as a 1-row broadcast so OOV tokens (NULL cnt after the
    # left join) still see the real denominator
    consts = F.broadcast(model.select("total", "vsize").limit(1))
    vocab = model.select("token", "cnt")
    if broadcast_model:
        vocab = F.broadcast(vocab)
    scored = (
        per_type.join(vocab, "token", "left")
        .crossJoin(consts)
        .withColumn(
            "_bits",
            -F.log2(
                (F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1)).cast("double")
                / (F.col("total") + F.col("vsize")).cast("double")
            ),
        )
    )
    # decimal-sum mean, not F.avg: double summation order follows
    # shuffle arrival, so avg() drifts in the last ulps across runs and
    # engines — the exact non-determinism ivf_assign's decimal comment
    # documents. Decimal addition AND the decimal(20,15) × occurrence
    # product are exact ((20,15)·(10,0) → (31,15), summed at (38,15) —
    # no precision cap is ever hit for |_bits| < 64 and corpora under
    # 10²³ summed bits), and the scale-15 quantization of _bits is the
    # SAME as the previous per-instance decimal(30,15) cast, so
    # bits_per_token is bit-identical to both the r8 implementation
    # and the oracle's per-token-row DECIMAL(30,15) sum (ADVICE r7):
    # grouping identical terms cannot change an exact associative sum.
    return (
        scored.groupBy(id_col)
        .agg(
            F.sum("occ").cast("int").alias("n_tokens"),
            F.round(
                F.sum(
                    F.col("_bits").cast("decimal(20,15)")
                    * F.col("occ").cast("decimal(10,0)")
                ).cast("double")
                / F.sum("occ"),
                4,
            ).alias("bits_per_token"),
        )
    )


# ---- hashed-feature models: classifier scoring and DSIR selection --------

def _ngram_features(text_col: str, bigrams: bool) -> Column:
    """Unigram (+ optional bigram) feature stream of a text column,
    WITH multiplicity (array<string>) — the raw material for hashed
    bag-of-ngram features.  Same bound-tokenization trick as
    ``word_shingles`` (the token array is materialized once per row via
    a lambda argument, not re-split per position), but deliberately NOT
    distinct: feature COUNTS are the model inputs.  Bigrams are emitted
    only for texts of >= 2 tokens — ``sequence(1, 0)`` would count DOWN
    in Spark, so the guard is an explicit IF, and the oracle mirrors it
    with a WHERE len >= 2."""
    big = (
        "IF(size(t) >= 2, zip_with(slice(t, 1, size(t) - 1), "
        "slice(t, 2, size(t) - 1), (a, b) -> concat(a, ' ', b)), "
        "CAST(array() AS ARRAY<STRING>))"
        if bigrams
        else "CAST(array() AS ARRAY<STRING>)"
    )
    return F.expr(
        f"flatten(transform(array(split(trim({text_col}), ' ')), "
        f"t -> concat(t, {big})))"
    )


def _feature_bucket(feature: Column, n_buckets: int, salt: str) -> Column:
    """Engine-portable feature hashing: first 8 md5 hex digits of
    ``feature#salt`` as a non-negative BIGINT, mod ``n_buckets`` — the
    same md5 spelling every sampling/bucketing primitive in this repo
    uses (``functions._hash_bucket``), so the DuckDB oracle reproduces
    the bucket assignment digit-for-digit."""
    h = F.conv(
        F.substring(F.md5(F.concat(feature, F.lit("#" + salt))), 1, 8), 16, 10
    ).cast("bigint")
    return (h % F.lit(n_buckets)).cast("int")


def hashed_ngram_counts(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    bigrams: bool = True,
    salt: str = "feat",
    *,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Hashed bag-of-ngrams: ``(id, bucket int, cnt bigint)`` — the
    fixed-width feature representation linear quality classifiers
    (fastText-style) and DSIR-style importance models consume.  The
    feature space is unigrams plus adjacent-word bigrams, hashed into
    ``n_buckets`` buckets (the "hashing trick"), so the downstream
    model table is bounded by a CONSTRUCTOR CONSTANT regardless of
    corpus size — that bound is what makes every model join below
    broadcast-safe at 100 TB.

    NULL-text documents produce no feature rows and are OMITTED (same
    contract as ``lm_cross_entropy``).  Scale shape: one scan, one
    map-side-combined groupBy on (id, bucket); document bodies are
    never shuffled.

    ``carry_cols`` names extra per-document columns (functionally
    dependent on the id — e.g. ``lang``) carried through the groupBy
    unchanged.  The (id, bucket, cnt) rows are identical either way;
    carrying the column lets ONE persisted feature table serve
    consumers that slice by it (e.g. a DSIR target model over the
    English slice) instead of re-scanning and re-hashing the corpus
    per consumer."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    carry = [F.col(c) for c in carry_cols]
    feats = docs.select(
        F.col(id_col),
        *carry,
        F.explode(_ngram_features(text_col, bigrams)).alias("_f"),
    )
    return (
        feats.select(
            id_col,
            *carry_cols,
            _feature_bucket(F.col("_f"), n_buckets, salt).alias("bucket"),
        )
        .groupBy(id_col, *carry_cols, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def classifier_score(
    docs: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    bigrams: bool = True,
    salt: str = "feat",
    bias: float = 0.0,
    broadcast_weights: bool = True,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Linear classifier inference over hashed n-gram features — the
    distributed form of fastText-style quality-classifier scoring
    (the CCNet / LLaMA-pipeline "keep what looks like reference text"
    filter).  ``weights`` is the trained model: ``(bucket, weight)``
    rows, at most ``n_buckets`` of them; buckets absent from the model
    score zero.

    Returns ``(id, n_features int, logit double, score double)``, both
    floats rounded to 4 decimals; ``score = sigmoid(bias + w·x)``.

    Exactness: weights are quantized to ``decimal(20,15)`` and the dot
    product is an exact decimal sum (weight × integer count), so the
    logit is ORDER-INDEPENDENT — bit-identical across partitionings,
    retries, and engines (the ``lm_cross_entropy`` decimal-sum
    technique; the only non-exact steps are the final one-shot
    sigmoid/round on an identical double).

    Scale shape: corpus scanned once, feature counts aggregated
    map-side, then one broadcast join against the model (bounded by
    ``n_buckets`` — a constructor constant, hence ``broadcast_weights``
    defaults True; pass False to force a shuffled join for a
    pathologically large bucket count) and one narrow groupBy on the
    doc key.  No per-row Python; whole-stage codegen throughout.

    ``feats`` short-circuits the feature pass with a precomputed
    :func:`hashed_ngram_counts` table (columns ``(id_col, bucket,
    cnt)``; MUST have been built with this call's ``n_buckets`` /
    ``bigrams`` / ``salt``): a composed pipeline that also feeds a
    DSIR model from the same features (``q_quality_selection``) then
    hashes the corpus ONCE instead of once per consumer.  ``docs`` is
    not touched when ``feats`` is given.  The decimal dot product is
    order-independent, so the scores are bit-identical either way."""
    if feats is None:
        feats = hashed_ngram_counts(
            docs, text_col, id_col, n_buckets, bigrams, salt
        )
    w = weights.select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("weight").cast("double").cast("decimal(20,15)").alias("_w"),
    )
    if broadcast_weights:
        w = F.broadcast(w)
    zero = F.lit(0).cast("decimal(20,15)")
    per_doc = (
        feats.join(w, "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("int").alias("n_features"),
            F.sum(
                F.coalesce(F.col("_w"), zero)
                * F.col("cnt").cast("decimal(10,0)")
            ).alias("_dot"),
        )
    )
    logit = F.lit(float(bias)) + F.col("_dot").cast("double")
    # + 0.0 normalizes IEEE negative zero: Spark's round() returns +0.0
    # for tiny negatives but DuckDB keeps -0.0, and the two hash apart
    return per_doc.select(
        id_col,
        "n_features",
        (F.round(logit, 4) + F.lit(0.0)).alias("logit"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 4).alias("score"),
    )


def hashed_bucket_model(
    docs: DataFrame,
    *,
    text_col: str = "text",
    n_buckets: int = 4096,
    bigrams: bool = True,
    salt: str = "feat",
) -> DataFrame:
    """Hashed-ngram occurrence model of a corpus: ``(bucket, cnt,
    total)`` with the corpus-wide total carried as a constant column
    (same layout trick as ``unigram_model``).  At most ``n_buckets``
    rows no matter the corpus size — the table a DSIR importance
    scorer broadcasts."""
    from firebolt_spark.functions import track_persisted

    feats = docs.select(F.explode(_ngram_features(text_col, bigrams)).alias("_f"))
    # counts PERSISTED (r17): the model plan references it twice — the
    # rows leg and the broadcast total — and without the pin each
    # reference re-runs the whole upstream feature scan (at 100 TB:
    # a full extra corpus pass just to compute the total). The cache is
    # bounded by n_buckets rows; release() frees it via the attached
    # handle.
    counts = (
        feats.select(_feature_bucket(F.col("_f"), n_buckets, salt).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .persist()
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return track_persisted(counts.crossJoin(F.broadcast(total)), counts)


def bucket_model_from_counts(feats: DataFrame) -> DataFrame:
    """:func:`hashed_bucket_model` built from an ALREADY-COMPUTED
    per-document feature table (:func:`hashed_ngram_counts` output —
    any slice of it) instead of re-scanning and re-hashing the corpus:
    summing the per-doc ``cnt`` per bucket IS the corpus occurrence
    count, so the ``(bucket, cnt, total)`` rows are identical by
    integer-sum associativity.  This is how a composed pipeline derives
    e.g. its DSIR target model from the English slice of the ONE
    persisted feature table it already pays for (the same derivation
    :func:`importance_weights` uses internally for its default raw
    model). ``counts`` is persisted (bounded by the bucket count) so
    the rows leg and the broadcast total share one evaluation instead
    of re-scanning the feature table twice — see
    :func:`hashed_bucket_model`; freed via the attached handle."""
    from firebolt_spark.functions import track_persisted

    counts = (
        feats.groupBy("bucket").agg(F.sum("cnt").alias("cnt")).persist()
    )
    total = counts.agg(F.sum("cnt").alias("total"))
    return track_persisted(counts.crossJoin(F.broadcast(total)), counts)


def dsir_llr_tables(
    target_model: DataFrame, raw_model: DataFrame, n_buckets: int
) -> tuple[DataFrame, DataFrame]:
    """The per-bucket Laplace-smoothed log-likelihood-ratio table and
    the out-of-model constant of :func:`importance_weights` — factored
    out (r17) so a fused composition (``q_quality_selection``) can
    attach the same decimal-quantized llr values to ONE per-doc
    aggregate instead of running a second feature pass. Returns
    ``(llr_tbl, oov)``: ``(bucket, _llr decimal(20,15))`` rows and a
    one-row ``(_oov_llr)`` constant. Pass PERSISTED models (each is
    referenced twice: its count leg and its totals aggregate)."""

    def llr(t_cnt: Column, r_cnt: Column) -> Column:
        # one expression shape for joined rows AND the zero-count OOV
        # constant, so quantization is identical on both paths
        return F.log(
            (t_cnt + F.lit(1)).cast("double")
            / (F.col("t_total") + F.lit(n_buckets)).cast("double")
        ) - F.log(
            (r_cnt + F.lit(1)).cast("double")
            / (F.col("r_total") + F.lit(n_buckets)).cast("double")
        )

    t = target_model.select("bucket", F.col("cnt").alias("t_cnt"))
    r = raw_model.select("bucket", F.col("cnt").alias("r_cnt"))
    # totals via an aggregate, NOT select(total).limit(1): an EMPTY
    # model (e.g. a target_filter matching zero rows) has no rows to
    # select, and a 0-row broadcast crossJoin would silently annihilate
    # the whole result. agg() always returns one row; max(total) is the
    # constant itself on a populated model and NULL→0 on an empty one —
    # which is exactly the Laplace limit: every feature scores
    # (cnt+1)/(0+n_buckets), so an empty target degrades to a uniform
    # model instead of an empty DataFrame.
    # ONE two-column totals row instead of separate t/r broadcasts
    # (r17): llr_tbl and oov both consume the identical broadcast
    # subtree, so the exchange is built once and reused at runtime,
    # and construction pays two fewer plan analyses
    tots = F.broadcast(
        target_model.agg(
            F.coalesce(F.max("total"), F.lit(0)).alias("t_total")
        ).crossJoin(
            raw_model.agg(F.coalesce(F.max("total"), F.lit(0)).alias("r_total"))
        )
    )
    llr_tbl = (
        t.join(r, "bucket", "full")
        .crossJoin(tots)
        .select(
            "bucket",
            llr(
                F.coalesce(F.col("t_cnt"), F.lit(0)),
                F.coalesce(F.col("r_cnt"), F.lit(0)),
            ).cast("decimal(20,15)").alias("_llr"),
        )
    )
    oov = tots.select(
        llr(F.lit(0), F.lit(0)).cast("decimal(20,15)").alias("_oov_llr")
    )
    return llr_tbl, oov


def importance_weights(
    docs: DataFrame,
    target_model: DataFrame,
    raw_model: DataFrame | None = None,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 4096,
    bigrams: bool = True,
    salt: str = "feat",
    feats: DataFrame | None = None,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely its hashed-ngram features are
    under a TARGET distribution (e.g. curated reference text) than
    under the RAW corpus distribution —
    ``log w(doc) = Σ_f cnt_f · (log p_target(f) − log p_raw(f))``
    with Laplace-smoothed bucket probabilities
    ``p(b) = (cnt_b + 1) / (total + n_buckets)``.  Documents that look
    like the target score high; selection is then a threshold, top-k,
    or :func:`firebolt_spark.functions.weighted_sample` over
    ``exp(log_weight)``.

    ``target_model`` / ``raw_model`` are :func:`hashed_bucket_model`
    outputs (raw defaults to a model of ``docs`` itself — the standard
    DSIR setup).  They MUST share this call's ``n_buckets`` /
    ``bigrams`` / ``salt`` so the feature spaces line up.

    Returns ``(id, n_features int, log_weight double)`` (rounded to 4
    decimals; natural log).  NULL-text documents are omitted (no
    feature rows).

    Exactness: the per-bucket log-ratio is computed ONCE on the joined
    model table, quantized to ``decimal(20,15)``, and the per-document
    sum is an exact decimal sum — order-independent across engines
    (the ``lm_cross_entropy`` technique).  Buckets present in the
    corpus but in NEITHER model get the same formula with zero counts
    (a 1-row broadcast constant), so out-of-model features still
    contribute their true smoothed log-ratio.

    Scale shape: THE CORPUS IS SCANNED ONCE — the per-doc feature table
    is persisted (a multi-consumer intermediate, released via
    ``functions.release``) and the default raw model is DERIVED from it
    rather than re-reading the corpus; both model tables (≤
    ``n_buckets`` rows, constant) are persisted too, so their totals
    re-read a bounded cache instead of re-executing a possibly
    corpus-sized upstream.  The corpus-side llr/oov joins are
    broadcast; the only shuffles a 100 TB run pays are the map-side
    (id, bucket) feature agg and the narrow doc-key agg.

    ``feats`` short-circuits the feature pass with a precomputed
    :func:`hashed_ngram_counts` table over ``docs`` (columns
    ``(id_col, bucket, cnt)``; same ``n_buckets``/``bigrams``/``salt``
    contract as :func:`classifier_score`'s seam).  The caller owns its
    lifecycle: pass a PERSISTED frame (it feeds the doc-key aggregate
    and, when ``raw_model`` is None, the raw-model derivation) and
    release it after materialization; it is not added to this result's
    release handles.  ``docs`` is not touched when ``feats`` is given.
    Decimal sums make the weights bit-identical either way."""
    own_feats = feats is None
    if own_feats:
        feats = hashed_ngram_counts(
            docs, text_col, id_col, n_buckets, bigrams, salt
        ).persist()
    if raw_model is None:
        # derive from the persisted per-doc feature table: summing the
        # per-doc counts per bucket IS the corpus model — no second
        # corpus scan (and the builder's persisted counts share one
        # evaluation between the rows leg and the broadcast total)
        raw_model = bucket_model_from_counts(feats)
    # bounded tables, referenced 2-3 times each (counts, total, llr):
    # persisting pins one execution of whatever subtree produced them
    target_model = target_model.persist()
    raw_model = raw_model.persist()
    llr_tbl, oov = dsir_llr_tables(target_model, raw_model, n_buckets)
    from firebolt_spark.functions import track_persisted

    result = (
        feats.join(F.broadcast(llr_tbl), "bucket", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy(id_col)
        .agg(
            F.sum("cnt").cast("int").alias("n_features"),
            # + 0.0 → canonical zero (see classifier_score: DuckDB's
            # round keeps -0.0 for tiny negatives, Spark's does not)
            (
                F.round(
                    F.sum(
                        F.coalesce(F.col("_llr"), F.col("_oov_llr"))
                        * F.col("cnt").cast("decimal(10,0)")
                    ).cast("double"),
                    4,
                )
                + F.lit(0.0)
            ).alias("log_weight"),
        )
    )
    if own_feats:
        return track_persisted(result, feats, target_model, raw_model)
    return track_persisted(result, target_model, raw_model)


def gopher_quality(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_word_frac: float = 0.8,
    min_stopword_hits: int = 2,
    max_dup_word_frac: float = 0.3,
    max_top_bigram_frac: float = 0.2,
    include: tuple[str, ...] = (),
) -> DataFrame:
    """Gopher-style composite quality gate (Rae et al. 2021 §A1.1):
    the six heuristic rules evaluated in ONE scan with zero shuffle —
    every signal is a per-row higher-order expression (the bigram
    multiplicity reuses ``repetition_stats``'s sorted-run fold).

    Signals and rules (defaults are the published Gopher thresholds,
    word-level where the paper uses lines/paragraphs):

    - ``n_words`` within [min_words, max_words]
    - ``mean_word_len`` (non-space chars / words) within [3, 10]
    - ``alpha_word_frac`` (words containing an ASCII letter) ≥ 0.8
    - ``stopword_hits`` (DISTINCT English stopwords present) ≥ 2
    - ``dup_word_frac`` ≤ 0.3 (bulk repetition)
    - ``top_bigram_frac`` ≤ 0.2 (looping/boilerplate)

    Returns the signal columns (ratios rounded to 4 decimals) plus
    ``keep`` (int 0/1).  Rules are evaluated against the ROUNDED
    values, so the decision is bit-identical across engines.  NULL
    text yields NULL signals and ``keep = 0``.

    ``include`` names extra input columns carried through to the
    output unchanged (e.g. the text itself) — the gate stays a single
    map-only scan, so a downstream ``filter(keep = 1)`` continues the
    pipeline WITHOUT re-joining the corpus on the doc key (the
    composition shape ``q_quality_selection`` relies on)."""
    words = F.expr(f"split(trim({text_col}), ' ')")
    extra = [F.col(c) for c in include]
    d = docs.select(
        F.col(id_col), F.col(text_col).alias("_t"), words.alias("_w"), *extra
    )
    n_words = F.size("_w")
    n_distinct = F.size(F.array_distinct("_w"))
    bigrams = (
        "zip_with(slice(_w, 1, greatest(size(_w) - 1, 0)), "
        "slice(_w, 2, greatest(size(_w) - 1, 0)), "
        "(x, y) -> concat(x, ' ', y))"
    )
    top_run = F.expr(
        f"aggregate(array_sort({bigrams}), "
        "named_struct('prev', CAST(NULL AS STRING), 'run', 0, 'best', 0), "
        "(acc, x) -> named_struct("
        "  'prev', x, "
        "  'run', CASE WHEN acc.prev IS NOT NULL AND x = acc.prev "
        "              THEN acc.run + 1 ELSE 1 END, "
        "  'best', greatest(acc.best, "
        "     CASE WHEN acc.prev IS NOT NULL AND x = acc.prev "
        "          THEN acc.run + 1 ELSE 1 END)), "
        "acc -> acc.best)"
    )
    padded = F.concat(F.lit(" "), F.col("_t"), F.lit(" "))
    stop_hits = reduce(
        lambda a, b: a + b,
        [
            F.when(padded.contains(f" {w} "), 1).otherwise(0)
            for w in LANG_PROFILES["en"]
        ],
    )
    def nn(col: Column) -> Column:
        # NULL text must yield NULL signals — without the guard,
        # Spark's size(NULL) = -1 leaks through the ratio arithmetic
        # (e.g. -1 / -1 = 1.0) while the SQL oracle's len(NULL) stays
        # NULL
        return F.when(F.col("_t").isNotNull(), col)

    sig = d.select(
        id_col,
        "_t",
        *[F.col(c) for c in include],
        nn(n_words.cast("int")).alias("n_words"),
        nn(
            F.round(
                F.length(F.expr("replace(trim(_t), ' ', '')")).cast("double")
                / n_words,
                4,
            )
        ).alias("mean_word_len"),
        nn(
            F.round(
                F.size(
                    F.expr("filter(_w, x -> x rlike '[A-Za-z]')")
                ).cast("double")
                / n_words,
                4,
            )
        ).alias("alpha_word_frac"),
        nn(stop_hits.cast("int")).alias("stopword_hits"),
        nn(
            F.round(
                F.when(
                    n_words > 0, (n_words - n_distinct).cast("double") / n_words
                ).otherwise(F.lit(0.0)),
                4,
            )
        ).alias("dup_word_frac"),
        nn(
            F.round(
                F.when(
                    n_words >= 2, top_run.cast("double") / (n_words - F.lit(1))
                ).otherwise(F.lit(0.0)),
                4,
            )
        ).alias("top_bigram_frac"),
    )
    rules = (
        F.col("n_words").between(min_words, max_words)
        & F.col("mean_word_len").between(min_mean_word_len, max_mean_word_len)
        & (F.col("alpha_word_frac") >= min_alpha_word_frac)
        & (F.col("stopword_hits") >= min_stopword_hits)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_bigram_frac") <= max_top_bigram_frac)
    )
    return sig.select(
        id_col,
        *[F.col(c) for c in include],
        "n_words",
        "mean_word_len",
        "alpha_word_frac",
        "stopword_hits",
        "dup_word_frac",
        "top_bigram_frac",
        F.when(F.col("_t").isNull(), F.lit(0))
        .otherwise(rules.cast("int"))
        .alias("keep"),
    )
