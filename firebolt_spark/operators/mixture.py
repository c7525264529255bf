"""Training-mix construction operators: temperature-weighted domain
resampling and deterministic held-out splits.

A 100 TB pretraining corpus is never trained on as-is: domains are
re-weighted (rare-but-valuable sources up-weighted relative to bulk
crawl — the ``p_s ∝ c_s^alpha`` temperature mix of multilingual-LM
training) and a held-out slice is carved off for eval. Both operations
must be DETERMINISTIC — reproducible row-for-row across reruns,
repartitions, task retries, and engines — or the training mix itself
becomes an unversionable artifact. Everything here therefore keys on
the same content-hash bucket as ``functions.hash_sample`` (first 8 md5
hex digits of ``key#salt`` as a 32-bit int) rather than any RNG.

Scale shape: one count-aggregation over the strata column (tiny
result, broadcast back) plus a single filtered scan — the corpus
itself never shuffles. The reference has no sampling surface (it is a
streaming ETL engine — SURVEY §2.10); these operators are part of the
LLM-pipeline extension the north-star brief requires.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from firebolt_spark.functions import _hash_bucket

_BUCKET_SPACE = float(1 << 32)


def mix_plan(
    df: DataFrame,
    strata_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Per-stratum keep-fraction plan for a temperature-``alpha`` mix.

    Target sampled counts follow ``n_s ∝ c_s^alpha`` (alpha=1 keeps
    the natural mix, alpha=0 flattens to uniform), scaled as large as
    possible without upsampling — the smallest stratum is kept whole.
    Closed form: ``keep_fraction(s) = (c_min / c_s)^(1-alpha)``.

    Returns one row per stratum: ``(stratum, n_rows, threshold)``
    where ``threshold`` is the 32-bit hash cutoff implementing the
    fraction. The threshold is computed with correctly-rounded IEEE
    ops only when alpha=0.5 (``sqrt`` + ``/`` + ``*`` + ``floor`` are
    all exactly specified by IEEE 754, so ANY engine derives the
    identical integer cutoff from the same counts — the DuckDB oracle
    does); other alphas go through ``pow``, which libms round
    differently in the last ulp — fine in practice, but the declared
    cross-engine query pins alpha=0.5.
    """
    if not 0.0 <= alpha <= 1.0:
        raise ValueError(f"alpha must be in [0, 1], got {alpha}")
    # counts deliberately NOT persisted (r17): its two references (rows
    # leg + broadcast min) share the map-side corpus scan via
    # ReuseExchange, and only the stratum-sized reduce runs twice; a
    # pin measurably cost +0.19x at sf0.1 (cache barrier) for no plan
    # improvement.
    counts = df.groupBy(F.col(strata_col).alias("stratum")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    cmin = counts.agg(F.min("n_rows").alias("_cmin"))
    ratio = F.col("_cmin").cast("double") / F.col("n_rows").cast("double")
    if alpha == 0.5:
        frac = F.sqrt(ratio)
    elif alpha == 1.0:
        frac = F.lit(1.0)
    else:
        frac = F.pow(ratio, F.lit(1.0 - alpha))
    return (
        counts.crossJoin(F.broadcast(cmin))
        .withColumn(
            "threshold",
            F.floor(frac * F.lit(_BUCKET_SPACE)).cast("bigint"),
        )
        .drop("_cmin")
    )


def temperature_mix(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    alpha: float = 0.5,
    salt: str = "",
) -> DataFrame:
    """Deterministic temperature-``alpha`` resample of a corpus.

    Keeps each stratum's ``(c_min/c_s)^(1-alpha)`` fraction (see
    :func:`mix_plan`), selected by the content hash of ``key_col`` —
    so the sampled ROW SET is a pure function of the data, stable
    under repartitioning, retries, incremental reruns, and engines.

    Plan shape: groupBy(strata) count (tiny), broadcast the per-
    stratum thresholds back, filter. The corpus is scanned once and
    never shuffled — at 100 TB this is a map-only job after one
    metadata-sized aggregation.
    """
    return apply_mix_plan(df, mix_plan(df, strata_col, alpha),
                          strata_col, key_col, salt)


def apply_mix_plan(
    df: DataFrame,
    plan: DataFrame,
    strata_col: str,
    key_col: str,
    salt: str = "",
    unseen_fraction: float = 0.0,
) -> DataFrame:
    """Filter ``df`` by a :func:`mix_plan` threshold table — the apply
    half of :func:`temperature_mix`, exposed separately so a STREAM can
    reuse a FROZEN plan: ``mix_plan`` aggregates its input (illegal
    mid-stream), so streaming ingest snapshots a plan from a batch view
    of the corpus once, then applies it to every micro-batch (inside
    ``foreachBatch`` or directly on the stream — this is a stateless
    broadcast-join + filter, streaming-safe as-is).

    Same determinism contract as ``temperature_mix``: the admitted row
    set is a pure function of (row content, plan, salt).

    The plan's columns are re-aliased to ``_mix_*`` internal names
    before the join, so an input that itself carries ``stratum`` /
    ``n_rows`` / ``threshold`` columns neither collides (ambiguous-
    column AnalysisException) nor gets silently dropped (ADVICE r7);
    the input schema passes through unchanged.

    **Strata ABSENT from the plan are dropped by default** — a frozen
    plan knows no threshold for them, and the safe default for a
    training mix is to admit nothing unplanned. In streaming this
    means a new language/domain appearing mid-stream contributes zero
    rows until the plan is refreshed (snapshot a new ``mix_plan`` and
    restart the sink, or monitor stratum counts per micro-batch).
    ``unseen_fraction`` overrides the default: unplanned strata are
    admitted at that fraction (same content-hash cutoff, so the
    admitted subset stays deterministic and becomes a superset/subset
    of the eventual refreshed plan's) — set e.g. 1.0 to pass unseen
    strata through whole (ADVICE r8).
    """
    if not 0.0 <= unseen_fraction <= 1.0:
        raise ValueError(
            f"unseen_fraction must be in [0, 1], got {unseen_fraction}"
        )
    internal = plan.select(
        F.col("stratum").alias("_mix_stratum"),
        F.col("threshold").alias("_mix_threshold"),
    )
    bucket = _hash_bucket(key_col, salt)
    unseen_thr = min(int(math.floor(unseen_fraction * _BUCKET_SPACE)), 1 << 32)
    return (
        df.join(
            F.broadcast(internal),
            # null-safe: a NULL stratum is a stratum like any other and
            # must get its planned fraction, not be silently dropped by
            # an equality miss (the hash_sample_by NULL contract)
            df[strata_col].eqNullSafe(internal["_mix_stratum"]),
            "left",
        )
        .filter(
            bucket < F.coalesce(F.col("_mix_threshold"), F.lit(unseen_thr))
        )
        .drop("_mix_stratum", "_mix_threshold")
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    weights: dict[str, float] | None = None,
    salt: str = "",
    split_col: str = "split",
) -> DataFrame:
    """Assign every row to a named split (train/val/test by default)
    by partitioning the 32-bit content-hash space into contiguous
    ranges proportional to ``weights``.

    Content-keyed, so a document keeps ONE split assignment forever —
    across reruns, engine changes, and incremental ingests (a doc
    re-ingested next month cannot leak from test into train). The
    thresholds are exact integers fixed at plan time; no floating
    point is evaluated per row. One scan, no shuffle — and because the
    expression is a stateless projection it applies to a STREAM
    unmodified (an incrementally-ingested corpus accretes its splits
    consistently; pinned by ``test_hash_split_is_streaming_safe``).
    ``temperature_mix``, by contrast, aggregates the corpus for its
    thresholds — in streaming, freeze a ``mix_plan`` from a batch
    snapshot and apply its thresholds inside ``foreachBatch``.

    ``weights`` need not sum to 1 — they are normalized. Order of
    ranges follows the dict's iteration order; the final split absorbs
    the remainder of the space so every row is assigned.
    """
    if weights is None:
        weights = {"train": 0.9, "val": 0.05, "test": 0.05}
    if len(weights) < 2:
        raise ValueError("need at least two splits")
    if any(w < 0 for w in weights.values()) or sum(weights.values()) <= 0:
        raise ValueError("weights must be non-negative with a positive sum")
    bucket = _hash_bucket(key_col, salt)
    cuts = split_thresholds(weights)
    expr = None
    for name, thr in cuts[:-1]:
        cond = bucket < F.lit(thr)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    expr = expr.otherwise(F.lit(cuts[-1][0]))
    return df.withColumn(split_col, expr)


def split_thresholds(weights: dict[str, float]) -> list[tuple[str, int]]:
    """The exact (name, upper-threshold) cutoffs ``hash_split`` uses —
    exposed so oracle SQL (and index builders) can mirror them
    verbatim. The last split has threshold 2^32 (absorbs remainder)."""
    total = float(sum(weights.values()))
    names = list(weights)
    out: list[tuple[str, int]] = []
    cum = 0.0
    for name in names[:-1]:
        cum += weights[name] / total
        out.append((name, min(int(math.floor(cum * _BUCKET_SPACE)), 1 << 32)))
    out.append((names[-1], 1 << 32))
    return out


def token_budget_mix(
    df: DataFrame,
    strata_col: str,
    budgets: dict[str, int],
    token_col: str,
    key_col: str,
    salt: str = "",
    default_budget: int = 0,
    fan_in: int = 32,
) -> DataFrame:
    """Fill each stratum to a TOKEN budget instead of a row quota: walk
    the stratum's rows in deterministic content-hash order and keep a
    row iff the running token total BEFORE it is still under the
    stratum's budget — so the row that crosses the boundary is the
    last one in, and a budget > 0 always admits at least one row. This
    is how an actual pretraining mix is specified ("300 B tokens of
    web, 50 B of code, all of wikipedia"): quotas are in tokens, and a
    row-count quota (``stratified_sample``) over variable-length
    documents cannot express them. Strata absent from ``budgets`` get
    ``default_budget`` (0 = excluded); rows with NULL or negative
    token counts are excluded (they cannot be budgeted).

    Deterministic like every sampler here: the visit order is
    ``(md5-hash(key#salt), key)``, a pure row property, so the
    selected set survives repartitioning, retries, incremental reruns,
    and re-executes identically on any engine with md5 — and varying
    ``salt`` draws an independent mix.

    Scale shape: the running sum is a per-stratum ORDERED window, and
    unlike a rank top-k Spark cannot partially prune it — a naive
    ``SUM() OVER (PARTITION BY stratum ORDER BY hash)`` funnels each
    stratum (a terabyte-scale language, say) through ONE reduce task.
    The cumsum therefore runs the two-phase grouped form, fully
    declaratively: the 32-bit hash space splits into ``fan_in``
    CONTIGUOUS ranges (so range order == hash order and a row's range
    is a function of its own hash); phase 1 cumsums within (stratum,
    range) on ``fan_in`` × more tasks; per-(stratum, range) totals —
    a ``strata × fan_in``-row aggregate — get prefix offsets from a
    window over that TINY table and broadcast-join back. No driver
    collect, no single-partition exchange, exact by construction.
    """
    if default_budget < 0 or any(b < 0 for b in budgets.values()):
        raise ValueError("budgets must be non-negative")
    tok = F.col(token_col).cast("bigint")
    cum = _hash_ordered_grouped_cumsum(
        df.filter(tok.isNotNull() & (tok >= 0)),
        strata_col,
        tok,
        key_col,
        salt,
        fan_in,
    )
    budget = F.lit(int(default_budget))
    for s, b in sorted(budgets.items()):
        budget = F.when(F.col(strata_col) == s, F.lit(int(b))).otherwise(
            budget
        )
    return cum.filter(F.col("_cum") - tok < budget).drop("_cum")


def _hash_ordered_grouped_cumsum(
    df: DataFrame,
    strata_col: str,
    value: "F.Column",
    key_col: str,
    salt: str,
    fan_in: int,
) -> DataFrame:
    """The shared two-phase core of ``token_budget_mix`` and
    ``interleave_strata``: per-stratum running sum of ``value`` over
    the deterministic content-hash visit order ``(md5(key#salt),
    key)``, returned as ``_cum`` (including the current row).  The
    32-bit hash space splits into ``fan_in`` CONTIGUOUS ranges (so
    range order == hash order and a row's range is a function of its
    own hash); phase 1 cumsums within (stratum, range); the
    per-(stratum, range) totals — a ``strata × fan_in``-row aggregate
    — get prefix offsets from a window over that TINY table and
    broadcast-join back.  Fully declarative: no driver collect, no
    single-partition exchange, exact by construction."""
    if fan_in < 1:
        raise ValueError(f"fan_in must be >= 1, got {fan_in}")
    from pyspark.sql import Window

    u = _hash_bucket(key_col, salt)
    # contiguous hash ranges: ordering by (_b, _u) == ordering by _u
    width = ((1 << 32) + fan_in - 1) // fan_in
    # NULL strata form one ordinary stratum; the internal sentinel key
    # exists because a plain equi-join would silently DROP them
    sk = F.coalesce(F.col(strata_col).cast("string"), F.lit("\x00"))
    base = (
        df.withColumn("_u", u)
        .withColumn("_b", F.floor(F.col("_u") / F.lit(width)))
        .withColumn("_sk", sk)
    )
    w_local = (
        Window.partitionBy("_sk", "_b")
        .orderBy("_u", key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = base.withColumn("_lcum", F.sum(value).over(w_local))
    totals = base.groupBy("_sk", "_b").agg(F.sum(value).alias("_tot"))
    w_off = (
        Window.partitionBy("_sk")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.withColumn(
        "_off", F.coalesce(F.sum("_tot").over(w_off), F.lit(0))
    ).select("_sk", "_b", "_off")
    return (
        cum.join(F.broadcast(offsets), ["_sk", "_b"])
        .withColumn("_cum", F.col("_off") + F.col("_lcum"))
        .drop("_u", "_b", "_sk", "_lcum", "_off")
    )


def interleave_strata(
    df: DataFrame,
    strata_col: str,
    key_col: str,
    salt: str = "",
    out_col: str = "interleave_rank",
    fan_in: int = 32,
) -> DataFrame:
    """Assign every row its 1-based position WITHIN its stratum along
    the deterministic content-hash order — the sort key that
    round-robin-interleaves domains in a training corpus: writing
    shards ordered by ``(interleave_rank, strata_col)`` spreads every
    domain evenly through the epoch instead of concatenating
    domain-sized clumps (which correlates consecutive gradient steps).
    Deterministic like every mix operator here: the rank is a pure
    function of (data, salt), so the training order is versionable
    and reproducible across reruns and engines.

    Scale shape: a per-stratum ``row_number`` over an ordered window
    — the cumsum-of-ones special case of ``token_budget_mix``'s
    two-phase grouped cumsum, and it reuses exactly that core (no
    stratum-only corpus window, broadcast prefix offsets, no driver
    collect).  The final global sort by ``(rank, stratum)`` is the
    WRITE's range partition — Spark's sort-before-write — not a
    single-task funnel."""
    cum = _hash_ordered_grouped_cumsum(
        df, strata_col, F.lit(1).cast("bigint"), key_col, salt, fan_in
    )
    return cum.withColumnRenamed("_cum", out_col)
