"""Property-based tests (hypothesis) for the pure algorithmic cores:
interval merge, offset planning, and minhash estimation quality."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from firebolt_spark.streaming.offsets import (
    RecoveryRange,
    merge_ranges,
    plan_assignment,
)

ranges_strategy = st.lists(
    st.tuples(
        st.integers(0, 3),          # partition
        st.integers(0, 200),        # from
        st.integers(1, 100),        # length
    ),
    min_size=0,
    max_size=30,
)


@given(ranges_strategy)
@settings(max_examples=200, deadline=None)
def test_merge_ranges_covers_exactly_the_union(raw):
    ranges = [RecoveryRange(p, f, f + ln) for p, f, ln in raw]
    merged = merge_ranges(ranges)

    def covered(rs):
        out = set()
        for r in rs:
            out.update((r.partition_id, o) for o in range(r.from_offset, r.to_offset))
        return out

    # same offsets covered, no more, no less
    assert covered(merged) == covered(ranges)
    # disjoint and sorted per partition, with gaps between islands
    by_part: dict[int, list[RecoveryRange]] = {}
    for r in merged:
        by_part.setdefault(r.partition_id, []).append(r)
    for rs in by_part.values():
        for a, b in zip(rs, rs[1:]):
            assert a.to_offset < b.from_offset  # strict gap → maximal merge


@given(
    st.dictionaries(st.integers(0, 7), st.integers(0, 10_000), max_size=8),
    st.dictionaries(st.integers(0, 7), st.integers(0, 10_000), max_size=8),
    st.integers(1, 5_000),
)
@settings(max_examples=200, deadline=None)
def test_plan_assignment_invariants(committed, highs, maxlag):
    starting, ranges = plan_assignment(committed, highs, maxlag)
    for pid, high in highs.items():
        cur = committed.get(pid, 0)
        start = starting[pid]
        # never start beyond the watermark, never before committed... unless capped
        assert start <= max(high, cur)
        lag = high - cur
        if lag > maxlag:
            assert start == high - maxlag
        else:
            assert start == cur
    for r in ranges:
        # every recovery range is exactly a skipped gap
        assert r.from_offset == committed.get(r.partition_id, 0)
        assert r.to_offset == starting[r.partition_id]
        assert r.from_offset < r.to_offset


@given(
    st.lists(st.integers(0, 10_000), min_size=0, max_size=60),
    st.integers(1, 50),
)
@settings(max_examples=300, deadline=None)
def test_fold_session_invariants(raw_ts, gap):
    """Session fold (streaming/stateful.fold_session) invariants over
    arbitrary event streams:
    - every in-horizon event is counted exactly once (conservation);
    - closed sessions are disjoint, ordered, and internally gap-free;
    - consecutive closed sessions are separated by more than gap;
    - boundaries never move backwards (no rewind)."""
    from firebolt_spark.streaming.stateful import fold_session

    ts = sorted(raw_ts)
    if not ts:
        return
    start0 = ts[0]
    closed, (start, last, n) = fold_session(ts, start0, None, 0, gap)

    sessions = closed + [(start, last, n)]
    # conservation: sorted input has no out-of-horizon drops
    assert sum(s[2] for s in sessions) == len(ts)
    for s, e, cnt in sessions:
        assert s <= e and cnt >= 1
    # ordering + separation: next session starts more than gap after
    # the previous one ended
    for (s1, e1, _), (s2, e2, _) in zip(sessions, sessions[1:]):
        assert s2 - e1 > gap
    # every closed session's span contains no gap larger than `gap`
    # (check against the raw events that fall inside it)
    for s, e, _ in closed:
        inside = [t for t in ts if s <= t <= e]
        for a, b in zip(inside, inside[1:]):
            assert b - a <= gap


@given(
    st.lists(st.integers(0, 10_000), min_size=1, max_size=40),
    st.lists(st.integers(0, 10_000), min_size=0, max_size=20),
    st.integers(1, 50),
)
@settings(max_examples=200, deadline=None)
def test_fold_session_late_events_never_rewind(batch1, late, gap):
    """Feeding a second batch of arbitrary (possibly late) events never
    rewinds the open session's boundaries, and genuinely-too-late
    events (t < start - gap) are dropped rather than merged."""
    from firebolt_spark.streaming.stateful import fold_session

    b1 = sorted(batch1)
    _, (start, last, n) = fold_session(b1, b1[0], None, 0, gap)
    closed2, (s2, l2, n2) = fold_session(sorted(late), start, last, n, gap)
    if not closed2:
        assert s2 == start  # start never rewinds while the session is open
        assert l2 >= last  # end never rewinds
    counted = [t for t in late if t >= start - gap]
    dropped = len(late) - len(counted)
    total_after = sum(c[2] for c in closed2) + n2
    assert total_after == n + len(late) - dropped


def test_minhash_operational_precision_and_recall(spark, sf_dir):
    """Operational quality of minhash-LSH against exact n-gram Jaccard.

    Candidates are conditioned on agreeing bands, so raw estimates are
    biased upward near zero — the meaningful properties are at the
    operating point: (precision) pairs passing the est≥0.5 threshold are
    genuinely similar (true j ≥ 0.3); (recall) every truly-near-dup pair
    (j ≥ 0.6) is surfaced by some band bucket."""
    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators.dedup import (
        minhash_candidate_pairs,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    flagged = minhash_candidate_pairs(docs, threshold=0.5)
    truth = ngram_jaccard_pairs(docs, threshold=0.0)

    joined = flagged.join(truth, ["doc_a", "doc_b"]).collect()
    assert joined, "LSH flagged nothing at the 0.5 threshold"
    for r in joined:
        assert r["jaccard"] >= 0.3, ("false positive", r)

    near_dups = {
        (r["doc_a"], r["doc_b"])
        for r in truth.filter("jaccard >= 0.6").collect()
    }
    candidates = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_candidate_pairs(docs, threshold=0.0).collect()
    }
    assert near_dups, "fixture has no true near-dups to recall"
    missed = near_dups - candidates
    assert not missed, f"LSH missed true near-dups: {missed}"


def test_lsh_bands_one_pass_matches_per_band_reference(spark, sf_dir):
    """The round-6 one-pass explode emission of lsh_bands must produce
    exactly the row set of the naive one-projection-per-band form (the
    shape the DuckDB oracle still mirrors as UNION ALL)."""
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators.dedup import (
        N_BANDS,
        N_MINHASH,
        lsh_bands,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").limit(200)
    sig = minhash_signatures(docs).persist()
    one_pass = lsh_bands(sig)

    rows_per_band = N_MINHASH // N_BANDS
    parts = []
    for b in range(N_BANDS):
        cols = [F.col(f"h{b * rows_per_band + r}") for r in range(rows_per_band)]
        parts.append(
            sig.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("#", *cols)).alias("band_hash"),
            )
        )
    reference = reduce(DataFrame.unionAll, parts)

    assert one_pass.count() == reference.count()
    assert one_pass.exceptAll(reference).count() == 0
    assert reference.exceptAll(one_pass).count() == 0
    sig.unpersist()


weights_strategy = st.dictionaries(
    st.text(alphabet="abcdef", min_size=1, max_size=4),
    st.integers(0, 100),
    min_size=2,
    max_size=6,
).filter(lambda w: sum(w.values()) > 0)


@given(weights_strategy)
@settings(max_examples=200, deadline=None)
def test_split_thresholds_partition_hash_space_proportionally(weights):
    """hash_split's cutoffs tile the 32-bit space exactly: monotone
    non-decreasing, final cutoff = 2^32 (every bucket is assigned), and
    each split's range width matches its normalized weight to within
    one unit of floor rounding."""
    from firebolt_spark.operators.mixture import split_thresholds

    cuts = split_thresholds(weights)
    assert [n for n, _ in cuts] == list(weights)
    assert cuts[-1][1] == 1 << 32
    total = sum(weights.values())
    prev = 0
    for name, thr in cuts:
        assert thr >= prev
        width = thr - prev
        if name != cuts[-1][0]:
            assert abs(width - weights[name] / total * (1 << 32)) <= 1
        prev = thr


# ---- deterministic sampling family invariants (round 11) -------------------

_docs = st.lists(
    st.tuples(
        st.integers(0, 9999),               # doc_id (unique via key below)
        st.sampled_from(["en", "fr", None]),  # stratum incl. NULL
        st.integers(1, 50),                  # weight / token count
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda t: t[0],
)


@given(_docs, st.integers(1, 30), st.integers(31, 60))
@settings(max_examples=10, deadline=None)
def test_hash_sample_is_monotone_in_fraction(spark, rows, p1, p2):
    """hash_sample's kept set can only GROW as the fraction grows (the
    hash threshold is the only discriminator), with exact endpoints:
    fraction 0 keeps nothing, fraction 1 keeps everything — including
    NULL-keyed rows (sentinel-hashed, ADVICE r6)."""
    from firebolt_spark.functions import hash_sample

    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, w INT")
    f1, f2 = p1 / 60.0, p2 / 60.0
    s1 = {r["doc_id"] for r in hash_sample(df, "doc_id", f1, "s").collect()}
    s2 = {r["doc_id"] for r in hash_sample(df, "doc_id", f2, "s").collect()}
    assert s1 <= s2
    assert hash_sample(df, "doc_id", 0.0, "s").count() == 0
    assert hash_sample(df, "doc_id", 1.0, "s").count() == len(rows)


@given(_docs, st.integers(1, 5))
@settings(max_examples=10, deadline=None)
def test_stratified_sample_restricts_to_per_stratum_weighted_sample(
    spark, rows, k
):
    """stratified_sample(k) per stratum must select EXACTLY what
    weighted_sample(k) selects when run on that stratum alone — the
    defining restriction property of quota sampling (no cross-stratum
    interference, whatever the strata sizes or weights)."""
    from pyspark.sql import functions as F

    from firebolt_spark.functions import stratified_sample, weighted_sample

    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, w INT")
    got = {}
    for r in stratified_sample(
        df, "lang", "w", k, "doc_id", salt="p", fan_in=3
    ).collect():
        got.setdefault(r["lang"], set()).add(r["doc_id"])
    for lang in {t[1] for t in rows}:
        sub = df.filter(
            F.col("lang").eqNullSafe(F.lit(lang))
        )
        expect = {
            r["doc_id"]
            for r in weighted_sample(sub, "w", k, "doc_id", salt="p").collect()
        }
        assert got.get(lang, set()) == expect, f"stratum {lang}"


@given(_docs, st.integers(0, 120), st.integers(0, 120))
@settings(max_examples=10, deadline=None)
def test_token_budget_mix_is_monotone_prefix_of_hash_order(
    spark, rows, b_small, b_extra
):
    """Two defining invariants of the budget fill: (1) raising a
    budget only ADDS rows (the kept set is monotone in the budget);
    (2) within each stratum the kept set is a PREFIX of the
    deterministic hash visit order — no row is skipped while a later
    one is kept."""
    import hashlib

    from firebolt_spark.operators.mixture import token_budget_mix

    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING, toks INT")
    lo = {
        r["doc_id"]
        for r in token_budget_mix(
            df, "lang", {}, "toks", "doc_id", salt="p",
            default_budget=b_small, fan_in=3,
        ).collect()
    }
    hi = {
        r["doc_id"]
        for r in token_budget_mix(
            df, "lang", {}, "toks", "doc_id", salt="p",
            default_budget=b_small + b_extra, fan_in=3,
        ).collect()
    }
    assert lo <= hi

    def h(doc_id):
        return int(hashlib.md5(f"{doc_id}#p".encode()).hexdigest()[:8], 16)

    for lang in {t[1] for t in rows}:
        order = [
            t[0]
            for t in sorted(
                (t for t in rows if t[1] == lang),
                key=lambda t: (h(t[0]), t[0]),
            )
        ]
        kept = [d for d in order if d in hi]
        assert kept == order[: len(kept)], f"stratum {lang} not a prefix"


# ---- quantile sketch merge-exactness (round 13) -----------------------------

_sketch_rows = st.lists(
    st.tuples(
        st.integers(0, 9999),                       # row id (unique)
        st.integers(-1000, 1000),                   # value
        st.integers(0, 2),                          # shard assignment
        st.sampled_from(["en", "fr"]),              # group
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(_sketch_rows, st.integers(2, 12))
@settings(max_examples=10, deadline=None)
def test_quantile_sketch_merge_exactness_any_sharding(spark, rows, k):
    """The sketch's central contract holds for ANY input and ANY
    sharding, not just the fixture: merging per-shard sketches equals
    the one-shot sketch BIT-IDENTICALLY (the hash lottery depends only
    on row ids, so shard boundaries cannot change the winning set).
    Unlike the DKW accuracy test this is exact for every draw — the
    property that makes per-batch sketch tables a safe stand-in for
    the corpus."""
    from pyspark.sql import functions as F

    from firebolt_spark.functions import quantile_sketch, quantile_sketch_merge

    df = spark.createDataFrame(
        [(i, float(v), s, g) for i, v, s, g in rows],
        "doc_id BIGINT, v DOUBLE, shard INT, lang STRING",
    )
    one_shot = {
        r["lang"]: r["qsk"]
        for r in quantile_sketch(
            df, "v", "doc_id", k=k, group_cols=["lang"], salt="p"
        ).collect()
    }
    shards = [
        quantile_sketch(
            df.filter(F.col("shard") == s), "v", "doc_id",
            k=k, group_cols=["lang"], salt="p",
        )
        for s in range(3)
    ]
    stacked = shards[0].unionByName(shards[1]).unionByName(shards[2])
    merged = {
        r["lang"]: r["qsk"]
        for r in quantile_sketch_merge(
            stacked, "qsk", k=k, group_cols=["lang"]
        ).collect()
    }
    assert merged == one_shot


# ---- priority sketch merge-exactness (round 13) -----------------------------

_priority_rows = st.lists(
    st.tuples(
        st.integers(0, 9999),                       # row id (unique)
        st.integers(1, 1000),                       # positive weight
        st.integers(0, 2),                          # shard assignment
        st.sampled_from(["en", "fr"]),              # group
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda t: t[0],
)


@given(_priority_rows, st.integers(1, 12))
@settings(max_examples=10, deadline=None)
def test_priority_sketch_merge_exactness_any_sharding(spark, rows, k):
    """Priority sampling's central contract holds for ANY input and
    ANY sharding: merging per-shard sketches equals the one-shot
    sketch BIT-IDENTICALLY — the sample (top-k priorities) and the
    threshold tau (the one-shot (k+1)-th priority, recoverable even
    when no shard sampled that item because it was then some shard's
    own tau). The property that makes per-batch sketch tables answer
    subset sums for the whole corpus."""
    from pyspark.sql import functions as F

    from firebolt_spark.functions import priority_sketch, priority_sketch_merge

    df = spark.createDataFrame(
        [(i, float(w), s, g) for i, w, s, g in rows],
        "doc_id BIGINT, w DOUBLE, shard INT, lang STRING",
    )
    one_shot = {
        r["lang"]: (r["psk"], r["psk_tau"])
        for r in priority_sketch(
            df, "w", "doc_id", k=k, group_cols=["lang"], salt="p"
        ).collect()
    }
    shards = [
        priority_sketch(
            df.filter(F.col("shard") == s), "w", "doc_id",
            k=k, group_cols=["lang"], salt="p",
        )
        for s in range(3)
    ]
    stacked = shards[0].unionByName(shards[1]).unionByName(shards[2])
    merged = {
        r["lang"]: (r["psk"], r["psk_tau"])
        for r in priority_sketch_merge(
            stacked, "psk", k=k, group_cols=["lang"]
        ).collect()
    }
    assert merged == one_shot
