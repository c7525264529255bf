"""Reusable engine functions — DataFrame-level utilities shared by
operators, queries, and user pipelines.

These capture the reference's recurring dataflow idioms as composable
Spark functions (each one shuffle-conscious and AQE-friendly):

- ``compact_lww``     — last-write-wins compaction (the control-topic
  replay semantics, reference message/kakfamessagereceiver.go:195-236);
- ``newest_per_key``  — keep the newest N rows per key (the
  maxpartitionlag catch-up shape, kafkaconsumer.go:336-384);
- ``dead_letter_split`` — the error-split protocol re-exported;
- ``canonical_json``  — deterministic JSON for envelope payloads.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from firebolt_spark.errors import split_errors as dead_letter_split  # noqa: F401


def track_persisted(result: DataFrame, *handles: DataFrame) -> DataFrame:
    """Attach the persisted inputs that back ``result`` so callers can
    free them once the result is materialized (the operator-function
    analogue of ``PipelineResult.persisted``).

    Operators that persist an intermediate (minhash signatures, simhash
    fingerprints, signed embedding corpora) return a lazy DataFrame that
    still references the cached blocks, so they cannot unpersist before
    returning; without a release path the blocks accumulate — one leak
    per bench run or per micro-batch. Handles ride on the returned
    DataFrame object; derived DataFrames don't inherit them, so release
    at the point the operator output is consumed.
    """
    held = list(getattr(result, "_persisted_inputs", []))
    result._persisted_inputs = held + list(handles)
    return result


def release(*dfs: DataFrame) -> None:
    """Unpersist every cached input attached via ``track_persisted``,
    recursively — a handle may itself carry handles (r17: the bucket
    model builders persist their internal counts aggregate and attach
    it to the model frame). The list is cleared BEFORE recursing, so a
    handle cycle cannot loop and double-release is a no-op. Call after
    materializing an operator's result (collect/write)."""
    for df in dfs:
        handles = list(getattr(df, "_persisted_inputs", ()))
        if hasattr(df, "_persisted_inputs"):
            df._persisted_inputs = []
        for h in handles:
            release(h)
            h.unpersist()


def newest_per_key(
    df: DataFrame,
    keys: list[str],
    order_col: str,
    n: int = 1,
    keep_rank: bool = False,
) -> DataFrame:
    """Keep the newest ``n`` rows per key group, ordered by ``order_col``
    descending. One shuffle on the key; rank computed within partitions.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    out = df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= n)
    return out.withColumnRenamed("_rn", "rn") if keep_rank else out.drop("_rn")


def compact_lww(
    df: DataFrame,
    keys: list[str],
    order_col: str = "offset",
    ack_col: str | None = "ack",
) -> DataFrame:
    """Last-write-wins compaction: latest row per key by ``order_col``,
    optionally dropping acknowledged rows — exactly the reference's
    startup replay of the compacted message topic (keep only latest per
    ``messagetype-key``, drop acknowledged)."""
    latest = newest_per_key(df, keys, order_col, n=1)
    if ack_col is not None and ack_col in df.columns:
        latest = latest.filter(~F.col(ack_col))
    return latest


def canonical_json(*cols: Column | str) -> Column:
    """Deterministic JSON of the given columns (field order = call
    order; Spark's to_json is stable for a fixed struct)."""
    return F.to_json(F.struct(*[F.col(c) if isinstance(c, str) else c for c in cols]))


def profile(
    df: DataFrame, columns: list[str] | None = None, approx: bool = False
) -> DataFrame:
    """Data-quality profile: one row per column with row/null/distinct
    counts. A single wide aggregation job (count + count(col) +
    count(distinct col) per column) unpivoted to long form — no per-
    column scans.

    ``approx=True`` swaps exact distincts for HyperLogLog
    ``approx_count_distinct`` (default rsd 5%) — the trillion-row
    setting: exact multi-column distincts EXPAND each row per distinct
    aggregate, while the HLL sketch keeps the aggregation single-pass
    with constant per-column state. The oracle-checked query uses the
    exact form.
    """
    cols = columns or df.columns
    distinct = F.approx_count_distinct if approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(distinct(F.col(c)).alias(f"_nd_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', _nn_{c}, _nd_{c}" for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS (column_name, n_non_null, n_distinct)",
        "_n_rows AS n_rows",
    ).select(
        "column_name",
        "n_rows",
        "n_non_null",
        (F.col("n_rows") - F.col("n_non_null")).alias("n_nulls"),
        "n_distinct",
    )


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable global 1-based row numbering by ``order_cols``.

    A bare ``row_number() OVER (ORDER BY …)`` funnels every row through
    ONE task — correct, but a single-node bottleneck at scale. This is
    the two-phase form: range-partition on the order keys (so partition
    p's keys all precede partition p+1's), number within partitions,
    then add broadcast per-partition offsets. Output numbering is
    identical to the global window when the order keys are unique.

    Triggers one small job to collect per-partition counts (a few
    numbers per partition).

    The range partitioning MUST be pinned before that job:
    ``repartitionByRange`` picks its boundaries by sampling with a
    per-execution seed, so the counts job and the final join would
    otherwise each sample their own boundaries and could place rows in
    DIFFERENT partitions — offsets from one partitioning applied to
    another silently corrupts the numbering (invisible on small
    fixtures, where sampling degenerates to a full scan).
    ``localCheckpoint`` materializes the partitioning once and cuts the
    lineage, so every downstream job reads the same frozen blocks; a
    lost executor then fails the query loudly instead of recomputing a
    differently-sampled partitioning silently. Blocks are freed by the
    ContextCleaner once the result is garbage-collected.
    """
    parts = (
        (
            df.repartitionByRange(num_partitions, *order_cols)
            if num_partitions
            else df.repartitionByRange(*order_cols)
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in parts.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    offsets_df = spark.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _offset BIGINT"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    return (
        parts.join(F.broadcast(offsets_df), "_pid")
        .withColumn(out_col, (F.row_number().over(w) + F.col("_offset")).cast("int"))
        .drop("_pid", "_offset")
    )


def global_cumsum(
    df: DataFrame,
    value_col: str,
    order_cols: list[str],
    out_col: str = "cumsum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Scalable global running sum of ``value_col`` by ``order_cols``.

    Same two-phase shape as ``global_row_number``: a bare
    ``SUM() OVER (ORDER BY …)`` is a single-task funnel; instead,
    range-partition on the order keys, cumsum within partitions, and
    add broadcast per-partition prefix totals. Identical to the global
    window when the order keys are unique. One small driver job for
    the per-partition totals (a few numbers per partition).

    As in ``global_row_number``, the sampled range partitioning is
    pinned with an eager ``localCheckpoint`` so the totals job and the
    final join see ONE fixed row→partition assignment (two independent
    executions of ``repartitionByRange`` may sample different
    boundaries, silently corrupting every downstream running sum).
    """
    parts = (
        (
            df.repartitionByRange(num_partitions, *order_cols)
            if num_partitions
            else df.repartitionByRange(*order_cols)
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    totals = {
        r["_pid"]: r["s"]
        for r in parts.groupBy("_pid")
        .agg(F.sum(value_col).alias("s"))
        .collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid] or 0
    offsets_df = df.sparkSession.createDataFrame(
        [(pid, off) for pid, off in offsets.items()], "_pid INT, _offset BIGINT"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        parts.join(F.broadcast(offsets_df), "_pid")
        .withColumn(
            out_col, (F.sum(value_col).over(w) + F.col("_offset")).cast("bigint")
        )
        .drop("_pid", "_offset")
    )


def _hash_bucket(key_col: str, salt: str) -> Column:
    """32-bit content bucket: first 8 md5 hex digits of ``key#salt`` as
    a BIGINT. The single definition both sampling functions (and the
    DuckDB oracle mirror) key on — and built from Column functions, not
    an interpolated SQL string, so a salt containing quotes is data,
    never expression text."""
    # NULL keys hash as the sentinel string "\x00" rather than
    # propagating NULL (md5(NULL) -> NULL would silently DROP the row
    # from every sample, even at fraction=1.0 — ADVICE r6). A NULL key
    # therefore gets one deterministic fate like any other value.
    key = F.coalesce(F.col(key_col).cast("string"), F.lit("\x00"))
    return F.conv(
        F.substring(
            F.md5(F.concat(key, F.lit("#" + salt))),
            1,
            8,
        ),
        16,
        10,
    ).cast("bigint")


def hash_sample(
    df: DataFrame,
    key_col: str,
    fraction: float,
    salt: str = "",
) -> DataFrame:
    """Deterministic content-keyed sampling: keep a row iff
    ``md5(key || '#' || salt)``'s first 8 hex digits, read as an int,
    fall under ``fraction`` of the 32-bit space.

    Why not ``df.sample()``/``sampleBy()``: Spark's Bernoulli sampling
    draws from a per-partition RNG stream, so the selected ROWS change
    with partitioning, task retries, and engine — unusable for
    reproducible training mixes or cross-engine checks. Hashing the key
    makes the decision a pure row property: stable under repartition,
    retry, incremental re-runs (a doc keeps one fate across ingests),
    and portable to any engine with md5. ``salt`` decorrelates
    independent samples over the same corpus (held-out splits, ablation
    mixes). One scan, no shuffle, no RNG state.

    NULL keys are hashed as a sentinel (see ``_hash_bucket``), so
    NULL-keyed rows get a deterministic sample fate like any other
    value — in particular fraction=1.0 keeps EVERY row. (Prefer a
    genuinely unique key column; all NULL-keyed rows share one fate.)
    """
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {fraction}")
    threshold = int(fraction * float(1 << 32))
    return df.filter(_hash_bucket(key_col, salt) < F.lit(threshold))


def hash_sample_by(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    salt: str = "",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the ``sampleBy`` analogue a
    training-data mix needs): each stratum keeps its own fraction of
    rows, decided by the same content hash as ``hash_sample`` — e.g.
    downsample boilerplate-heavy sources while keeping rare ones whole.
    Strata absent from ``fractions`` keep ``default_fraction``. Still
    one scan, no shuffle; the mix is reproducible row-for-row."""
    for s, frac in fractions.items():
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for stratum '{s}' must be in [0, 1]")
    if not 0.0 <= default_fraction <= 1.0:
        raise ValueError("default_fraction must be in [0, 1]")
    bucket = _hash_bucket(key_col, salt)
    threshold = F.lit(int(default_fraction * float(1 << 32)))
    for s, frac in sorted(fractions.items()):
        threshold = F.when(
            F.col(strata_col) == s, F.lit(int(frac * float(1 << 32)))
        ).otherwise(threshold)
    return df.filter(bucket < threshold)


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: keep ``k``
    rows with inclusion probability proportional to ``weight_col`` —
    the A-Res reservoir scheme of Efraimidis & Spirakis (2006), ranked
    by ``u^(1/w)`` with the uniform ``u`` drawn from the row's CONTENT
    HASH instead of an RNG stream.  The selected row SET is therefore a
    pure function of (data, salt): stable under repartitioning, task
    retries, incremental re-runs, and portable to any engine with md5
    — the property ``hash_sample`` gives Bernoulli sampling, extended
    to weighted selection (e.g. sample training documents ∝ a quality
    or DSIR importance weight; vary ``salt`` for independent draws).

    Rows with NULL or non-positive weight are EXCLUDED (they have zero
    inclusion probability; u^(1/w) is undefined at w <= 0).

    Ranking uses the order-equivalent key ``ln(u)/w`` (monotone in
    ``u^(1/w)``; avoids pow underflow at tiny weights), with ``u =
    (h32 + 0.5) / 2^32`` strictly inside (0, 1).  Ties are broken by
    the key column, so the result is total-ordered and reproducible.

    Scale shape: one scan; the global top-k is Spark's TakeOrdered
    (per-partition heaps merged at the driver — k rows cross the wire,
    never the corpus).  The returned frame preserves the input columns
    (the rank key is internal)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = (_hash_bucket(key_col, salt).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 32)
    )
    w = F.col(weight_col).cast("double")
    rank = F.log(u) / w
    # NaN must be excluded explicitly: Spark orders NaN ABOVE every
    # double (so NaN > 0 passes the positivity filter and a NaN rank
    # would always win the descending top-k), which would grant NaN-
    # weighted rows certain inclusion instead of zero probability
    return (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("_ares_rank", rank)
        .orderBy(F.col("_ares_rank").desc(), F.col(key_col))
        .limit(k)
        .drop("_ares_rank")
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "",
    fan_in: int = 32,
) -> DataFrame:
    """Deterministic weighted sampling without replacement PER STRATUM:
    within each distinct ``strata_col`` value, keep the ``k`` rows with
    inclusion probability proportional to ``weight_col`` — the
    per-group form of :func:`weighted_sample` (same A-Res ranking
    ``ln(u)/w`` with the uniform drawn from the row's content hash, so
    the selected set is a pure function of (data, salt)).  This is the
    quota operator a training mix needs: "the best / a representative
    k documents per language (or per domain)" rather than a single
    global top-k that lets one giant stratum crowd out the rest.

    Rows with NULL, NaN or non-positive weight are excluded (zero
    inclusion probability — same contract as :func:`weighted_sample`);
    a NULL stratum is one ordinary stratum.  Ties are broken by
    ``key_col``, so the result is total-ordered and reproducible.

    Scale shape: the naive plan — ``row_number() OVER (PARTITION BY
    stratum ORDER BY rank)`` — hash-partitions the CORPUS by stratum
    alone, and a training corpus has few strata (tens of languages /
    domains), so at 100 TB each reducer would sort terabytes.  Instead
    the top-k runs in two phases: phase 1 partitions by (stratum,
    internal bucket of the key into ``fan_in`` buckets) and keeps each
    bucket's local top-k — at most ``k * fan_in`` survivors per
    stratum, with the corpus-sized sort spread over ``fan_in`` × more
    tasks; phase 2 re-ranks the tiny survivor set per stratum.  Exact
    by construction: every stratum-wide top-k row is its own bucket's
    top-k (the rank order is total), so phase 1 keeps a superset.
    (Spark 4's ``WindowGroupLimit`` already prunes each MAP task to its
    local top-k before either shuffle; the bucketing addresses what
    that cannot — the reduce side, where a stratum-only partitioning
    still lands ``map_tasks × k`` survivor rows on ONE task per
    stratum, ``fan_in`` × more than necessary.)  ``fan_in=1``
    degenerates to the single-phase window.  The bucket column is
    internal (never affects WHICH rows win), so it uses the cheap JVM
    hash, not the portable md5.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if fan_in < 1:
        raise ValueError(f"fan_in must be >= 1, got {fan_in}")
    u = (_hash_bucket(key_col, salt).cast("double") + F.lit(0.5)) / F.lit(
        float(1 << 32)
    )
    w = F.col(weight_col).cast("double")
    ranked = (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .withColumn("_ares_rank", F.log(u) / w)
        .withColumn(
            "_ares_b", F.pmod(F.xxhash64(F.col(key_col)), F.lit(fan_in))
        )
    )
    local = Window.partitionBy(strata_col, "_ares_b").orderBy(
        F.col("_ares_rank").desc(), F.col(key_col)
    )
    survivors = (
        ranked.withColumn("_ares_rn", F.row_number().over(local))
        .filter(F.col("_ares_rn") <= k)
        .drop("_ares_rn", "_ares_b")
    )
    final = Window.partitionBy(strata_col).orderBy(
        F.col("_ares_rank").desc(), F.col(key_col)
    )
    return (
        survivors.withColumn("_ares_rn", F.row_number().over(final))
        .filter(F.col("_ares_rn") <= k)
        .drop("_ares_rn", "_ares_rank")
    )


_KMV_SPACE = float(1 << 48)


def _hash48(col: str, salt: str) -> Column:
    """48-bit content hash (first 12 md5 hex digits of ``value#salt``
    as a BIGINT) — the KMV sketch keys on 48 bits rather than
    ``_hash_bucket``'s 32 because the estimator's bias grows with hash
    collisions, and 32 bits start colliding at ~65 k distinct values
    (far below a corpus vocabulary).  Same engine-portable md5 recipe,
    so a DuckDB oracle replays it exactly; NULL hashes as the sentinel
    (one deterministic fate, like every sampler here)."""
    v = F.coalesce(F.col(col).cast("string"), F.lit("\x00"))
    return F.conv(
        F.substring(F.md5(F.concat(v, F.lit("#" + salt))), 1, 12), 16, 10
    ).cast("bigint")


def _min_k_survivors(
    df: DataFrame, groups: list[str], k: int, fan_in: int,
    order_col: str = "_h",
    order: list[Column] | None = None,
) -> DataFrame:
    """Two-phase bottom-k: phase 1 keeps each of ``fan_in`` hash
    buckets' local min-k (rank-limit pushdown applies), so phase 2's
    per-group collect sees <= k x fan_in survivors instead of a
    group's whole distinct set on one task. The rank-limit discipline
    SHARED by :func:`kmv_sketch`, :func:`quantile_sketch`, and
    :func:`priority_sketch` — one copy, so a fix to the shape lands in
    every sketch. ``order_col`` is the integer bucketing column;
    ``order`` overrides the window order (default: ``order_col``
    ascending — :func:`priority_sketch` passes its descending
    (priority, ticket) order instead)."""
    local = Window.partitionBy(
        *groups, F.pmod(F.col(order_col), F.lit(fan_in))
    ).orderBy(*(order if order is not None else [F.col(order_col)]))
    return (
        df.withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def _sketch_merge_check(kcol: str, scol: str, k: int, opname: str):
    """The (salt, k) merge-compatibility assertion SHARED by
    :func:`kmv_merge` and :func:`quantile_sketch_merge`: all rows must
    carry one salt and a build k >= the merge k. An aggregate
    expression — ride it INSIDE the kept column (assert_true is NULL
    on success); a dropped sidecar column would be optimizer-pruned
    and never evaluated."""
    return F.assert_true(
        (F.count_distinct(F.col(scol)) == 1) & (F.min(kcol) >= F.lit(k)),
        F.concat(
            F.lit(
                f"{opname}: incompatible sketch rows — expected one "
                f"shared salt and every build k >= "
            ),
            F.lit(str(k)),
            F.lit(", got salts="),
            F.count_distinct(F.col(scol)).cast("string"),
            F.lit(" min_k="),
            F.min(kcol).cast("string"),
        ),
    )


def kmv_sketch(
    df: DataFrame,
    col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    salt: str = "",
    out_col: str = "kmv",
    fan_in: int = 32,
) -> DataFrame:
    """Build a K-Minimum-Values distinct-count sketch of ``col`` per
    group: the ``k`` smallest distinct 48-bit content hashes, as a
    sorted array.  The sketch is the corpus-stats primitive a 100 TB
    pipeline profiles with — O(k) per group instead of a
    count-distinct's unbounded state, and MERGEABLE: the sketch of a
    union is :func:`kmv_merge` of the parts, so per-shard (or
    per-ingest-batch) sketch tables roll up to corpus totals without
    re-touching the data.  Deterministic (content-hashed, no RNG), so
    shard-then-merge equals one-shot exactly and a SQL oracle can
    replay it.

    Estimate with :func:`kmv_estimate`: exact below ``k`` distinct
    values (the sketch simply holds them all), the standard
    ``(k-1) * space / h_k`` KMV estimator above (Bar-Yossef et al.
    2002), with relative error ~``1/sqrt(k-2)``.

    Scale shape: one distinct-shuffle on (group, hash) — partial
    aggregation halves it map-side — then the min-k per group runs the
    same two-phase form as :func:`stratified_sample` (a running
    row_number has rank-limit pushdown, but the reduce side of a
    group-only partitioning would still swallow a group's whole
    distinct set on one task): phase 1 keeps each of ``fan_in`` hash
    buckets' local min-k, phase 2 collects the ≤ ``k * fan_in``
    survivors per group into the final sorted array.  No unbounded
    ``collect_set``."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if fan_in < 1:
        raise ValueError(f"fan_in must be >= 1, got {fan_in}")
    groups = list(group_cols or [])
    h = df.select(*groups, _hash48(col, salt).alias("_h")).distinct()
    survivors = _min_k_survivors(h, groups, k, fan_in)
    agg = survivors.groupBy(*groups).agg(
        F.slice(F.array_sort(F.collect_list("_h")), 1, k).alias(out_col),
        # build parameters travel WITH the sketch rows (not column
        # metadata, which a union silently takes from its first side):
        # kmv_merge refuses incompatible rows instead of silently
        # mis-estimating — the _meta-validation contract of the ANN
        # and text indexes, restated for sketch tables (ADVICE r11)
        F.lit(k).alias(f"{out_col}_k"),
        F.lit(salt).alias(f"{out_col}_salt"),
    )
    return agg


def kmv_estimate(
    sketch_col: str, k: int = 256, k_col: str | None = None
) -> Column:
    """Distinct-count estimate from a :func:`kmv_sketch` array: the
    exact size while the sketch is not full (< ``k`` distinct values
    seen), else ``(k-1) * 2^48 / h_k`` with ``h_k`` the k-th smallest
    hash.  A pure column expression — usable on a sketch TABLE without
    touching the corpus.

    Pass ``k_col`` (the ``{out_col}_k`` column :func:`kmv_sketch`
    emits) to make the expression self-validating: estimating at a
    ``k`` LARGER than the build k reads past the stored horizon
    (``element_at`` returns NULL → a silent NULL estimate), so the
    check raises instead."""
    size = F.size(F.col(sketch_col))
    est = F.when(size < k, size.cast("double")).otherwise(
        F.lit(float(k - 1) * _KMV_SPACE)
        / F.element_at(F.col(sketch_col), k).cast("double")
    )
    if k_col is not None:
        chk = F.assert_true(
            F.col(k_col) >= F.lit(k),
            F.concat(
                F.lit(f"kmv_estimate: k={k} exceeds the build k ("),
                F.col(k_col).cast("string"),
                F.lit(") — the sketch has no k-th smallest hash"),
            ),
        )
        est = F.when(chk.isNull(), est)
    return est


def kmv_merge(
    df: DataFrame,
    sketch_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge :func:`kmv_sketch` rows (one per shard / ingest batch)
    into one sketch per group: union the arrays, de-duplicate, keep
    the k smallest.  Exactly the sketch a one-shot build over the
    union would produce — the property that lets per-shard sketch
    tables stand in for the corpus.  Per-group state is bounded by
    ``k × shards-per-group`` (each input row contributes ≤ k values),
    so the collect stays small by construction.

    All merged rows must come from builds with the SAME ``salt`` and
    a build ``k`` ≥ this ``k`` (hashes from different salts never
    agree, and a smaller-k part truncates below this sketch's
    horizon).  When the input carries the ``{sketch_col}_k`` /
    ``{sketch_col}_salt`` columns :func:`kmv_sketch` emits, the
    contract is ENFORCED: a per-group ``assert_true`` inside the merge
    aggregate fails the job on mixed salts or a build k below this
    ``k`` — no extra Spark job, and the wrong estimate is never
    produced.  Rows from a pre-r12 sketch (no parameter columns) merge
    unvalidated, as before."""
    groups = list(group_cols or [])
    kcol, scol = f"{sketch_col}_k", f"{sketch_col}_salt"
    has_meta = kcol in df.columns and scol in df.columns
    meta = [F.col(kcol), F.col(scol)] if has_meta else []
    exploded = df.select(
        *groups, *meta, F.explode(sketch_col).alias("_h")
    ).distinct()
    # collect_set, NOT collect_list: the distinct above includes the
    # meta columns, so the same hash arriving from builds with
    # DIFFERENT k values (allowed: min(k) >= merge k) survives once
    # per distinct build k — a collect_list would keep the duplicates
    # and inflate the estimate (ADVICE r12, high).  The set dedupes
    # on the hash alone; per-group state stays <= k x shards.
    sketch = F.slice(F.array_sort(F.collect_set("_h")), 1, k)
    aggs = []
    if has_meta:
        chk = _sketch_merge_check(kcol, scol, k, "kmv_merge")
        sketch = F.when(chk.isNull(), sketch)
        # the merged row is itself a valid sketch at THIS k and the
        # shared salt — re-stamp so merge outputs stay re-mergeable
        aggs = [F.lit(k).alias(kcol), F.first(scol).alias(scol)]
    return exploded.groupBy(*groups).agg(sketch.alias(sketch_col), *aggs)


def quantile_sketch(
    df: DataFrame,
    value_col: str,
    id_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    salt: str = "",
    out_col: str = "qsk",
    fan_in: int = 32,
) -> DataFrame:
    """Mergeable bounded-state RANK sketch of ``value_col`` per group
    (round 13 — VERDICT r12 Next #6): the values of the ``k`` rows
    whose content-hashed ``id_col`` is smallest, as a sorted
    ``array<struct<h, v>>`` — a deterministic bottom-k sample (Cohen &
    Kaplan 2007: a bottom-k sketch under a uniform hash IS a uniform
    sample without replacement), which makes it the quantile
    counterpart of :func:`kmv_sketch` with the SAME machinery: O(k)
    state per group, per-shard sketch rows roll up through
    :func:`quantile_sketch_merge` to EXACTLY the one-shot sketch
    (min-k of a union is the min-k of the parts), (k, salt) parameter
    columns travel with the rows and are enforced at merge, and a SQL
    oracle replays every bit (md5-prefix hashes, no RNG).

    Why not KLL / t-digest: their compactions are randomized and
    insertion-order-sensitive, so shard-then-merge is NOT bit-equal to
    one-shot, no SQL engine can replay them, and a streaming replay
    changes the sketch. The bottom-k sketch trades a larger ``k`` for
    determinism: rank error follows the uniform-sampling (DKW) bound
    ``eps ~ sqrt(ln(2/delta) / (2k))`` — at k=1024 that is ±3.3 points
    of rank at 99% confidence, ample for corpus profiles; exactness
    stays :func:`group_quantiles`' job.

    ``id_col`` must be row-unique (the document key): the hash is the
    sampling lottery ticket, so replayed rows re-draw the same ticket
    (at-least-once appends are mathematical no-ops) and re-sharding
    never changes the sample. Values ride as doubles; NULL values are
    ignored per SQL. A 48-bit hash collision (different ids, one
    ticket) resolves deterministically to the smaller value.

    Scale shape: one (group, h) distinct-shuffle with map-side
    partials, then the same two-phase ``fan_in``-bucketed min-k as
    :func:`kmv_sketch` — no group's sample ever funnels through one
    task. Read quantiles off the sketch with
    :func:`quantile_sketch_quantiles` (map-only column expressions)."""
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    if fan_in < 1:
        raise ValueError(f"fan_in must be >= 1, got {fan_in}")
    groups = list(group_cols or [])
    h = (
        df.filter(F.col(value_col).isNotNull())
        .select(
            *groups,
            _hash48(id_col, salt).alias("_h"),
            F.col(value_col).cast("double").alias("_v"),
        )
        .groupBy(*groups, "_h")
        .agg(F.min("_v").alias("_v"))
    )
    survivors = _min_k_survivors(h, groups, k, fan_in)
    return survivors.groupBy(*groups).agg(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(F.col("_h").alias("h"), F.col("_v").alias("v"))
                )
            ),
            1,
            k,
        ).alias(out_col),
        F.lit(k).alias(f"{out_col}_k"),
        F.lit(salt).alias(f"{out_col}_salt"),
    )


def quantile_sketch_merge(
    df: DataFrame,
    sketch_col: str = "qsk",
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge :func:`quantile_sketch` rows (one per shard / ingest
    batch) into one sketch per group — union the samples, keep the k
    smallest tickets. Exactly the one-shot sketch of the union, so
    per-batch sketch tables stand in for the corpus. State is bounded
    by ``k x shards-per-group``.

    Same contract enforcement as :func:`kmv_merge` (and the same
    collect_SET discipline — dedup must ignore the meta columns): all
    rows must share one salt and carry a build ``k`` >= this ``k``,
    asserted inside the merge aggregate when the parameter columns are
    present. A 48-bit ticket collision across shards resolves to the
    smaller value, matching the build."""
    groups = list(group_cols or [])
    kcol, scol = f"{sketch_col}_k", f"{sketch_col}_salt"
    has_meta = kcol in df.columns and scol in df.columns
    meta = [F.col(kcol), F.col(scol)] if has_meta else []
    exploded = df.select(
        *groups, *meta, F.explode(sketch_col).alias("_s")
    ).distinct()
    raw = F.array_sort(F.collect_set("_s"))
    aggs = []
    if has_meta:
        chk = _sketch_merge_check(kcol, scol, k, "quantile_sketch_merge")
        raw = F.when(chk.isNull(), raw)
        aggs = [F.lit(k).alias(kcol), F.first(scol).alias(scol)]
    merged = exploded.groupBy(*groups).agg(raw.alias("_raw"), *aggs)
    arr = F.col("_raw")
    # collapse ticket collisions to the smaller value (the sort puts it
    # first): keep element i iff its h differs from element i-1's
    # (F.get at -1 is NULL -> the predicate is TRUE for element 0)
    deduped = F.filter(
        arr, lambda x, i: (i == F.lit(0)) | (F.get(arr, i - 1)["h"] != x["h"])
    )
    return merged.select(
        *groups,
        F.slice(deduped, 1, k).alias(sketch_col),
        *([kcol, scol] if has_meta else []),
    )


def quantile_sketch_quantiles(
    df: DataFrame,
    qs: list[float],
    sketch_col: str = "qsk",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Quantile readout of a :func:`quantile_sketch` table: the sample's
    own order statistics, in DuckDB/SQL-standard semantics so the
    oracle replays them exactly — ``est_cont`` interpolates at
    ``h = (n-1) * q`` (PERCENTILE_CONT / quantile_cont, rounded to 6),
    ``est_disc`` is the order statistic at rank ``max(1, ceil(q*n))``
    (quantile_disc). Pure column expressions over the sketch rows — a
    corpus profile reads current quantiles without touching the corpus
    (zero shuffle, zero scan beyond the sketch table).

    Returns group columns + ``q`` + ``n_sampled`` + ``est_cont`` +
    ``est_disc``. The estimates carry the sample's DKW rank-error band
    (see :func:`quantile_sketch`), NOT :func:`group_quantiles`'
    exactness — use the sketch for rolling profiles, the exact operator
    for gates."""
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantiles must be in [0, 1], got {q}")
    groups = list(group_cols or [])
    vals = F.array_sort(F.transform(F.col(sketch_col), lambda s: s["v"]))
    base = df.select(
        *groups,
        vals.alias("_vals"),
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    ).withColumn("_n", F.size("_vals"))
    hh = (F.col("_n") - 1) * F.col("q")
    frac = hh - F.floor(hh)
    v_lo = F.element_at("_vals", (F.floor(hh) + 1).cast("int"))
    v_hi = F.element_at("_vals", (F.ceil(hh) + 1).cast("int"))
    cont = F.when(frac == 0, v_lo).otherwise(v_lo + frac * (v_hi - v_lo))
    disc_rank = F.greatest(
        F.lit(1), F.ceil(F.col("q") * F.col("_n")).cast("int")
    )
    return base.select(
        *groups,
        "q",
        F.col("_n").cast("bigint").alias("n_sampled"),
        F.round(cont, 6).alias("est_cont"),
        F.element_at("_vals", disc_rank).alias("est_disc"),
    )


def priority_sketch(
    df: DataFrame,
    weight_col: str,
    id_col: str,
    k: int = 256,
    group_cols: list[str] | None = None,
    salt: str = "",
    out_col: str = "psk",
    fan_in: int = 32,
) -> DataFrame:
    """Mergeable bounded-state WEIGHTED sample + subset-sum estimator
    per group — priority sampling (Duffield, Lund & Thorup 2007, JACM
    54(6): near-optimal variance for arbitrary subset sums).  Each row
    draws a deterministic uniform ``u = (h+1)/2^48`` from its 48-bit
    content hash and a priority ``p = w/u``; the sketch keeps the ``k``
    highest-priority entries as ``array<struct<p, h, w>>`` (descending)
    plus the threshold ``tau`` = the (k+1)-th priority (0 while the
    group has <= k rows).  Estimate any group's total weight with
    :func:`priority_sketch_totals`: ``sum(max(w, tau))`` over the
    entries is UNBIASED for ``sum(w)`` — exact while tau is 0 — and
    sums over any UNION of groups estimate that subset's total, so
    group-level sketch tables answer arbitrary group-subset sums
    without re-touching the corpus.

    This is :func:`weighted_sample`'s mergeable sibling: A-Res picks a
    weighted k-sample but cannot merge (its rank keys carry no
    threshold), while per-shard priority sketches roll up through
    :func:`priority_sketch_merge` to EXACTLY the one-shot sketch —
    sample AND tau — because every globally-top-(k+1) priority is
    either in some shard's sample or IS some shard's tau (an item
    ranked k+1 within its shard).  Content-hashed (no RNG), so
    replayed rows re-draw the same ticket, and a SQL oracle replays
    the lottery bit-for-bit.

    Contract: an id's weight must be stable across shards/replays
    (the lottery prices the TICKET; a 48-bit ticket collision — or an
    out-of-contract duplicate id — resolves deterministically to the
    larger weight).  Rows with NULL, NaN or non-positive weight are
    excluded (zero inclusion probability — :func:`weighted_sample`'s
    contract).  ``(k, salt)`` travel with the rows and are enforced at
    merge, like every sketch here.

    Scale shape: one (group, ticket) shuffle with map-side partials,
    then the same two-phase ``fan_in``-bucketed top-k as
    :func:`kmv_sketch` (keeping k+1 locally so tau survives) — no
    group's candidate set ever funnels through one task."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if fan_in < 1:
        raise ValueError(f"fan_in must be >= 1, got {fan_in}")
    groups = list(group_cols or [])
    w = F.col(weight_col).cast("double")
    base = (
        df.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .select(*groups, _hash48(id_col, salt).alias("_h"), w.alias("_w"))
        .groupBy(*groups, "_h")
        .agg(F.max("_w").alias("_w"))
        # left-to-right (w * 2^48) / (h + 1): the oracle replays the
        # exact IEEE operation order, so priorities are bit-identical
        .withColumn(
            "_p",
            F.col("_w") * F.lit(_KMV_SPACE)
            / (F.col("_h").cast("double") + F.lit(1.0)),
        )
    )
    # phase 1: each of fan_in hash buckets keeps its local top-(k+1) by
    # the canonical total order (p DESC, h DESC — reverse(array_sort)
    # order below); the global top-(k+1) is a subset of the union
    survivors = _min_k_survivors(
        base, groups, k + 1, fan_in,
        order=[F.col("_p").desc(), F.col("_h").desc()],
    )
    agg = survivors.groupBy(*groups).agg(
        F.reverse(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("_p").alias("p"),
                        F.col("_h").alias("h"),
                        F.col("_w").alias("w"),
                    )
                )
            )
        ).alias("_full")
    )
    return agg.select(
        *groups,
        F.slice("_full", 1, k).alias(out_col),
        F.coalesce(F.element_at("_full", k + 1)["p"], F.lit(0.0)).alias(
            f"{out_col}_tau"
        ),
        F.lit(k).alias(f"{out_col}_k"),
        F.lit(salt).alias(f"{out_col}_salt"),
    )


def priority_sketch_merge(
    df: DataFrame,
    sketch_col: str = "psk",
    k: int = 256,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Merge :func:`priority_sketch` rows (one per shard / ingest
    batch) into one sketch per group — EXACTLY the one-shot sketch of
    the union, tau included.  The merged sample is the top-k of the
    union of samples (a global top-k item ranks <= k in its own
    shard).  The merged tau is the (k+1)-th highest of the CANDIDATE
    priorities — union of sample priorities plus every shard's
    positive tau: the global (k+1)-th item either made some shard's
    sample or was some shard's own (k+1)-th, i.e. its tau; candidate
    values above the true tau are exactly the global top-k (an item
    can only BE a shard tau if >= k shard rows outrank it, so its
    global rank is >= k+1), hence the (k+1)-th candidate is the true
    tau even when overlapping/replayed shards duplicate sub-threshold
    candidates.  Per-group state is bounded by ``(k+1) x shards``.

    Same contract as :func:`kmv_merge`: one salt, every build k >=
    this ``k`` (a smaller-k shard truncates below this sketch's
    horizon), enforced when the parameter columns are present — here
    via a separate one-row aggregate broadcast back over the result
    (the candidate union makes an in-aggregate assert awkward; ADVICE
    r12's suggested form).  Cross-shard ticket collisions resolve to
    the larger weight, matching the build."""
    groups = list(group_cols or [])
    kcol, scol = f"{sketch_col}_k", f"{sketch_col}_salt"
    tcol = f"{sketch_col}_tau"
    has_meta = kcol in df.columns and scol in df.columns
    ent = (
        df.select(*groups, F.explode(sketch_col).alias("_s"))
        .groupBy(*groups, F.col("_s.h").alias("_h"))
        # max struct = max (p, h, w) = max p (h equal): the larger-
        # weight resolution rule for cross-shard ticket collisions
        .agg(F.max("_s").alias("_s"))
        .select(*groups, "_s")
    )
    taus = df.filter(F.col(tcol) > 0).select(
        *groups,
        F.struct(
            F.col(tcol).alias("p"),
            F.lit(None).cast("bigint").alias("h"),
            F.lit(None).cast("double").alias("w"),
        ).alias("_s"),
    )
    merged = (
        ent.unionByName(taus)
        .groupBy(*groups)
        .agg(F.reverse(F.array_sort(F.collect_list("_s"))).alias("_full"))
    )
    # the first k candidates are always genuine entries: if any tau
    # candidate exists, its shard contributed k entries, and every tau
    # item ranks > k globally (see docstring) — so the slice below
    # never captures a tau placeholder
    out = merged.select(
        *groups,
        F.slice("_full", 1, k).alias(sketch_col),
        F.coalesce(F.element_at("_full", k + 1)["p"], F.lit(0.0)).alias(
            tcol
        ),
    )
    if not has_meta:
        return out
    # per-GROUP check, like kmv_merge's in-aggregate form (the
    # candidate union above cannot carry the meta columns through the
    # per-ticket dedup); the tiny per-group result broadcasts back
    chk = df.groupBy(*groups).agg(
        _sketch_merge_check(kcol, scol, k, "priority_sketch_merge").alias(
            "_chk"
        ),
        F.first(scol).alias("_scol"),
    )
    joined = (
        out.join(F.broadcast(chk), groups)
        if groups
        else out.crossJoin(F.broadcast(chk))
    )
    # ride the assert inside the kept sketch column (a dropped sidecar
    # would be optimizer-pruned and never evaluated); re-stamp (k,
    # salt) so merge outputs stay re-mergeable
    return joined.select(
        *groups,
        F.when(F.col("_chk").isNull(), F.col(sketch_col)).alias(sketch_col),
        tcol,
        F.lit(k).alias(kcol),
        F.col("_scol").alias(scol),
    )


def priority_sketch_totals(
    df: DataFrame,
    sketch_col: str = "psk",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Total-weight readout of a :func:`priority_sketch` table: the
    Duffield-Lund-Thorup estimator ``sum(max(w, tau))`` over the
    sample — unbiased for the group's true ``sum(w)``, EXACT while the
    sketch is not full (tau = 0 makes every term its own weight).
    Pure column expressions over the sketch rows: a corpus profile
    reads current totals with zero shuffle and zero corpus scan, and
    sums over any union of groups estimate that subset's total.

    Returns group columns + ``n_sampled`` + ``tau`` +
    ``est_total_weight`` (both rounded to 6 — the readout is an
    estimate; full-precision arithmetic stays in the sketch)."""
    groups = list(group_cols or [])
    tcol = f"{sketch_col}_tau"
    est = F.aggregate(
        F.col(sketch_col),
        F.lit(0.0),
        lambda acc, s: acc + F.greatest(s["w"], F.col(tcol)),
    )
    return df.select(
        *groups,
        F.size(sketch_col).cast("bigint").alias("n_sampled"),
        F.round(F.col(tcol), 6).alias("tau"),
        F.round(est, 6).alias("est_total_weight"),
    )


def _payload_digest(payload_cols: list[str]) -> Column:
    """Engine-portable digest of the payload columns: md5 over the
    values joined with ``\\x01``, NULLs as the ``\\x00`` sentinel (a
    plain concat would make (NULL, 'a') collide with ('a', NULL), and
    md5(NULL) would void the whole row).  The separator is in-band if
    a value CONTAINS ``\\x01`` — vanishingly unlikely in real columns
    and an accepted trade for a digest any SQL engine can replay."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit("\x00"))
        for c in payload_cols
    ]
    return F.md5(F.concat_ws("\x01", *parts))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
    payload_cols: list[str],
    include_unchanged: bool = False,
    status_col: str = "status",
) -> DataFrame:
    """Diff two corpus snapshots by key: which rows were ``added``,
    ``removed``, or ``changed`` (payload digest differs) between
    ``old`` and ``new`` — the audit step of an ingest loop ("what did
    this batch actually do?") and the input to every
    refresh-the-derived-artifact decision (reindex, re-dedup,
    re-embed: touch only the changed keys).  ``include_unchanged``
    adds the ``unchanged`` rows for a full ledger.

    Returns the key columns + ``status_col``.  Keys are compared
    null-safely (a NULL key is one ordinary key); payloads compare by
    :func:`_payload_digest`, so text-sized columns never cross the
    shuffle — at 100 TB each side reduces to (key, 16-byte digest)
    before the join.

    Scale shape: one digest projection per side (map-only over the
    snapshot scans) and ONE full-outer equi-join on the keys — the
    minimal shuffle a snapshot comparison can do; no corpus-sized
    collect, no window.  Both sides pre-aggregate nothing: a snapshot
    is assumed key-unique (enforce upstream with dedup_exact if not).
    """
    if not key_cols or not payload_cols:
        raise ValueError("key_cols and payload_cols must be non-empty")
    # the key columns are RENAMED per side (not qualified by lineage):
    # old and new are routinely two filters of the SAME frame (a
    # versioned snapshot read), where df[col] references are ambiguous
    o = old.select(
        *[F.col(k).alias(f"_o_{k}") for k in key_cols],
        _payload_digest(payload_cols).alias("_old_sig"),
    )
    n = new.select(
        *[F.col(k).alias(f"_n_{k}") for k in key_cols],
        _payload_digest(payload_cols).alias("_new_sig"),
    )
    cond = None
    for k in key_cols:
        c = F.col(f"_o_{k}").eqNullSafe(F.col(f"_n_{k}"))
        cond = c if cond is None else cond & c
    joined = o.join(n, cond, "full_outer")
    keys = [
        F.coalesce(F.col(f"_o_{k}"), F.col(f"_n_{k}")).alias(k)
        for k in key_cols
    ]
    status = (
        F.when(F.col("_old_sig").isNull(), F.lit("added"))
        .when(F.col("_new_sig").isNull(), F.lit("removed"))
        .when(F.col("_old_sig") != F.col("_new_sig"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = joined.select(*keys, status.alias(status_col))
    if not include_unchanged:
        out = out.filter(F.col(status_col) != "unchanged")
    return out


def frequent_items(
    df: DataFrame,
    col: str,
    k: int = 20,
    group_cols: list[str] | None = None,
    count_col: str = "cnt",
    fan_in: int = 32,
    pre_counted: bool = False,
) -> DataFrame:
    """EXACT top-``k`` most frequent values of ``col`` per group —
    "top domains per language", "most repeated lines", "dominant
    sources per shard": the heavy-hitters readout that pairs with
    :func:`kmv_sketch`'s cardinalities in a corpus profile.  Exact
    rather than sketched: counting is a plain (group, value)
    aggregation Spark already partial-aggregates map-side, so unlike
    count-distinct there is no unbounded state to dodge — the only
    scale hazard is the top-k, handled the same two-phase way as
    :func:`stratified_sample` (bucketed local top-k, tiny survivor
    re-rank) so the reduce side never funnels a group's whole value
    histogram through one task.

    Ties order by value ascending (total order, reproducible, SQL-
    replayable).  NULL values count as one ordinary value; a NULL
    group is one ordinary group.  (Caveat for SQL mirrors: a NULL
    value tying AT the k boundary sorts NULLS FIRST here — Spark's
    ascending default — while e.g. DuckDB defaults NULLS LAST; add an
    explicit NULLS FIRST when replaying over nullable columns.)
    Returns group columns + ``col`` + ``count_col``, top-k rows per
    group.

    ``pre_counted=True`` takes ``df`` as an ALREADY-AGGREGATED
    (group, value, count) table — the rolling-maintenance shape: a
    streaming ingest loop keeps a persisted count table current by
    summing each batch's counts into it (cheap, batch-sized), and the
    heavy-hitter readout is just the two-phase top-k over that table,
    never re-reading history.  The count column must be named
    ``count_col``."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if fan_in < 1:
        raise ValueError(f"fan_in must be >= 1, got {fan_in}")
    groups = list(group_cols or [])
    if pre_counted:
        if count_col not in df.columns:
            raise ValueError(
                f"pre_counted=True requires a '{count_col}' column, "
                f"got {df.columns}"
            )
        counts = df
    else:
        counts = df.groupBy(*groups, col).agg(
            F.count(F.lit(1)).alias(count_col)
        )
    bucket = F.pmod(F.xxhash64(F.col(col)), F.lit(fan_in))
    local = Window.partitionBy(*groups, bucket).orderBy(
        F.col(count_col).desc(), F.col(col)
    )
    survivors = (
        counts.withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )
    final = Window.partitionBy(*groups).orderBy(
        F.col(count_col).desc(), F.col(col)
    )
    return (
        survivors.withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def group_quantiles(
    df: DataFrame,
    value_col: str,
    qs: list[float],
    group_cols: list[str] | None = None,
    count_col: str | None = None,
) -> DataFrame:
    """EXACT per-group quantiles of ``value_col`` — the length/score
    distribution readout a corpus profile needs beside
    :func:`kmv_sketch` cardinalities and :func:`frequent_items` heavy
    hitters (round 12 — VERDICT r11 Next #5).  Exact, not
    ``percentile_approx``: approx quantiles are nondeterministic across
    partitionings, so no SQL oracle can replay them; and not Spark's
    exact ``percentile`` aggregate, which buffers every group value in
    one task's memory — the unbounded state this module's two-phase
    patterns exist to avoid.

    Algorithm (all shuffles narrow, no SinglePartition window):

    1. value histogram: ``groupBy(group, value).count()`` — state is
       DISTINCT values per group, partial-aggregated map-side;
    2. per-group cumulative counts ordered by value, via ONE
       :func:`global_cumsum` over (group, value) minus each group's
       broadcast start offset (the global running sum is range-
       partitioned two-phase; subtracting the offset where the group
       begins turns it into a per-group running sum without a
       per-group window);
    3. the two bracketing order statistics per (group, q) — rank
       ``floor(h)+1`` / ``ceil(h)+1`` with ``h = (n-1)*q``, plus the
       discrete rank ``max(1, ceil(q*n))`` — selected by joining the
       tiny broadcast target table (|groups| x |qs| rows) against the
       histogram's rank intervals.

    Returns group columns + ``q`` + ``n`` (non-NULL count) +
    ``quantile_cont`` (linear interpolation, the SQL-standard
    PERCENTILE_CONT / DuckDB quantile_cont definition, rounded to 6) +
    ``quantile_disc`` (the DuckDB quantile_disc order statistic, in the
    value's own type).  NULL values are ignored, per SQL; an all-NULL
    group disappears.  Group cardinality is assumed driver-small (it
    is the PROFILE's row count); distinct-value cardinality per group
    is unbounded and never funnels through one task.

    ``count_col`` takes ``df`` as an ALREADY-AGGREGATED
    (group, value, count) histogram — the rolling-maintenance shape
    (the quantile twin of ``frequent_items(pre_counted=True)``): a
    streaming loop keeps a persisted histogram current by summing each
    batch's value counts into it, and the quantile readout runs over
    that table without re-reading history.  The histogram must be
    (group, value)-unique with positive counts."""
    if not qs:
        raise ValueError("qs must be non-empty")
    for q in qs:
        if not 0.0 <= q <= 1.0:
            raise ValueError(f"quantiles must be in [0, 1], got {q}")
    groups = list(group_cols or [])
    if count_col is not None:
        if count_col not in df.columns:
            raise ValueError(
                f"count_col requires a '{count_col}' column, got "
                f"{df.columns}"
            )
        hist = df.filter(F.col(value_col).isNotNull()).select(
            *groups, value_col, F.col(count_col).cast("bigint").alias("_c")
        )
    else:
        hist = (
            df.filter(F.col(value_col).isNotNull())
            .groupBy(*groups, value_col)
            .agg(F.count(F.lit(1)).alias("_c"))
        )
    g = global_cumsum(hist, "_c", groups + [value_col], out_col="_g")
    starts = g.groupBy(*groups).agg(
        F.min(F.col("_g") - F.col("_c")).alias("_start"),
        F.sum("_c").alias("n"),
    )
    # ungrouped: the "offsets" table is ONE row — an explicit broadcast
    # crossJoin, not join(on=None) (which only happens to cross-join
    # via empty-using-columns resolution; ADVICE r12)
    if groups:
        cum = g.join(F.broadcast(starts.drop("n")), groups, "inner")
    else:
        cum = g.crossJoin(F.broadcast(starts.drop("n")))
    cum = cum.select(
        *groups,
        F.col(value_col).alias("_v"),
        (F.col("_g") - F.col("_start") - F.col("_c")).alias("_pre"),
        (F.col("_g") - F.col("_start")).alias("_cum"),
    )
    h = (F.col("n") - 1) * F.col("q")
    targets = (
        starts.select(
            *groups,
            "n",
            F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
        )
        .withColumn("_lo", (F.floor(h) + 1).cast("bigint"))
        .withColumn("_hi", (F.ceil(h) + 1).cast("bigint"))
        .withColumn("_frac", h - F.floor(h))
        .withColumn(
            "_dr",
            F.greatest(
                F.lit(1).cast("bigint"),
                F.ceil(F.col("q") * F.col("n")).cast("bigint"),
            ),
        )
    )
    in_range = lambda r: (F.col(r) > F.col("_pre")) & (  # noqa: E731
        F.col(r) <= F.col("_cum")
    )
    if groups:
        joined = cum.join(F.broadcast(targets), groups, "inner")
    else:
        joined = cum.crossJoin(F.broadcast(targets))
    joined = joined.filter(
        in_range("_lo") | in_range("_hi") | in_range("_dr")
    )
    picked = joined.groupBy(*groups, "q").agg(
        F.first("n").alias("n"),
        F.first("_frac").alias("_frac"),
        F.max(F.when(in_range("_lo"), F.col("_v"))).alias("_vlo"),
        F.max(F.when(in_range("_hi"), F.col("_v"))).alias("_vhi"),
        F.max(F.when(in_range("_dr"), F.col("_v"))).alias("_vd"),
    )
    # frac == 0 (h integral, e.g. q = 0, 1, or an exact rank): the
    # answer is v_lo alone — the interpolation form would multiply 0 by
    # a possibly-NULL v_hi (rank n+1 has no histogram row at q = 1) and
    # NULL the result instead
    cont = F.when(F.col("_frac") == 0, F.col("_vlo").cast("double")).otherwise(
        F.col("_vlo").cast("double")
        + F.col("_frac")
        * (F.col("_vhi").cast("double") - F.col("_vlo").cast("double"))
    )
    return picked.select(
        *groups,
        "q",
        "n",
        F.round(cont, 6).alias("quantile_cont"),
        F.col("_vd").alias("quantile_disc"),
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side into
    ``salt_buckets`` sub-keys and explode the right side across all
    buckets, so one hot key spreads over ``salt_buckets`` tasks instead
    of melting a single reducer.

    Use when a key's row count dwarfs the rest and AQE's skew-join
    splitting isn't available/enough (e.g. skew on the build side of a
    shuffle join). The right side is replicated ×salt_buckets — meant
    for moderate-size right tables; for tiny ones just broadcast.
    Only inner/left joins: replication breaks right/full-outer
    semantics (unmatched right rows would appear once per bucket).
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError("salted_join supports inner/left joins only")
    salted_left = left.withColumn(
        "_salt", (F.spark_partition_id() + F.monotonically_increasing_id()) % salt_buckets
    )
    salted_right = right.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = salted_left.join(salted_right, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: str | list[str],
    num_buckets: int = 32,
    sort_cols: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist a table bucketed (and optionally sorted) by its join/agg
    keys — the co-location lever for repeated 100 TB joins.

    Two tables bucketed by the same keys into the same bucket count
    sort-merge join with ZERO Exchange (bucket files match one-to-one;
    pinned by tests/test_scale_plans.py), and a groupBy on the bucket
    keys skips its exchange too. The write pays one shuffle once; every
    later join/agg amortizes it — the trade a partitioned Kafka topic
    gives the reference for free (consumer partition affinity), restated
    as table layout. Bucket metadata only survives ``saveAsTable``;
    plain ``.parquet(path)`` writes drop it.
    """
    bucket_cols = [bucket_cols] if isinstance(bucket_cols, str) else bucket_cols
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        sort_cols = [sort_cols] if isinstance(sort_cols, str) else sort_cols
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: str | list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Persist a fact table hive-partitioned by its pruning keys — the
    second table-layout lever beside bucketing (``write_bucketed``).

    A read filtered on a partition column scans ONLY the matching
    directories: the scan's ``PartitionFilters`` prunes at planning
    time, so a day-filtered query over a 100 TB multi-year table reads
    one day's files (pinned by tests/test_scale_plans.py). Choose
    low-cardinality keys (date, tenant, event_type) — thousands of
    partitions, not millions; ``max_records_per_file`` bounds file size
    under skewed partitions so one hot day still splits into parallel
    tasks.
    """
    partition_cols = (
        [partition_cols] if isinstance(partition_cols, str) else partition_cols
    )
    writer = df.write.mode(mode)
    if max_records_per_file:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.partitionBy(*partition_cols).parquet(path)


def bucketed_join_ready(
    spark: SparkSession, left: str, right: str, keys: list[str]
) -> bool:
    """True when both saved tables are bucketed on ``keys`` with equal
    bucket counts — i.e. a join on ``keys`` will be exchange-free."""

    def spec(table: str) -> tuple[tuple[str, ...], int] | None:
        try:
            rows = spark.sql(f"DESCRIBE EXTENDED {table}").collect()
        except Exception:
            return None
        info = {r["col_name"]: r["data_type"] for r in rows}
        if "Num Buckets" not in info:
            return None
        cols = tuple(
            c.strip(" `")
            for c in info.get("Bucket Columns", "").strip("[]").split(",")
        )
        return cols, int(info["Num Buckets"])

    ls, rs = spec(left), spec(right)
    return ls is not None and ls == rs and ls[0] == tuple(keys)
