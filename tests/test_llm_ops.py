"""LLM-pipeline operators: properties the oracle can't express —
ANN recall vs the brute-force baseline, multimodal stub determinism,
ES-style sink behavior under failures."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from firebolt_spark.catalog import load_table
from firebolt_spark.operators import multimodal, similarity
from firebolt_spark.sinks.elasticsearch import (
    ElasticsearchSink,
    FileBackedBulkClient,
)


def test_ann_results_are_subset_of_bruteforce_corpus(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2]
    exact = similarity.cosine_topk(emb, qids, k=10)
    ann = similarity.ann_lsh_topk(emb, qids, k=10)
    # every ANN hit must carry the same score the exact path assigns
    joined = ann.alias("a").join(
        exact.alias("e"),
        (F.col("a.query_id") == F.col("e.query_id"))
        & (F.col("a.vec_id") == F.col("e.vec_id")),
        "left",
    )
    mismatch = joined.filter(
        F.col("e.cos_sim").isNotNull()
        & (F.col("a.cos_sim") != F.col("e.cos_sim"))
    ).count()
    assert mismatch == 0
    # sanity: buckets returned something for at least one query
    assert ann.count() > 0


def test_lsh_multiprobe_lifts_recall_and_stays_subset(spark, sf_dir):
    """probes>1 must (a) never duplicate or invent a candidate — every
    hit still carries the exact-path score — and (b) retrieve a
    superset of the single-probe candidate pool, so recall@k can only
    go up."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["vec_id"], r["cos_sim"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    exact_pairs = {(q, v) for q, v, _ in exact}

    def recall(probes):
        # planes pinned: auto-planes resolves to 1 on the tiny fixture,
        # which caps probes at 2 — the lever under test needs headroom
        rows = similarity.ann_lsh_topk(
            emb, qids, k=10, planes=4, probes=probes
        ).collect()
        # no duplicates across probed buckets
        pairs = [(r["query_id"], r["vec_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))
        # scores match the exact path wherever both retrieved the pair
        for r in rows:
            key = (r["query_id"], r["vec_id"], r["cos_sim"])
            if (r["query_id"], r["vec_id"]) in exact_pairs:
                assert key in exact
        return len(exact_pairs & set(pairs)) / len(exact_pairs)

    r1, r3 = recall(1), recall(3)
    assert r3 >= r1
    import pytest as _pytest

    # explicit planes keeps strict validation; auto-planes (planes=None)
    # clamps instead — a caller who never chose planes cannot be blamed
    # for exceeding planes+1 (round-7 fix for the recall-aware defaults)
    with _pytest.raises(ValueError):
        similarity.ann_lsh_topk(emb, qids, planes=4, probes=99)
    assert (
        similarity.ann_lsh_topk(emb, qids, k=3, probes=99, tables=1).count() >= 0
    )
    # ...but a genuinely invalid lower bound still raises under auto-planes
    with _pytest.raises(ValueError):
        similarity.ann_lsh_topk(emb, qids, probes=0)


def test_lsh_multitable_lifts_recall_and_stays_subset(spark, sf_dir):
    """tables>1 (round 6, multi-table LSH): independent plane sets
    union their candidate buckets. Must (a) never duplicate a
    (query, candidate) pair even when several tables find it, (b) score
    every hit identically to the exact path, (c) retrieve a superset of
    table 0's candidate pool — table 0's planes are the single-table
    planes, so recall can only go up."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["vec_id"], r["cos_sim"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    exact_pairs = {(q, v) for q, v, _ in exact}

    def run(tables):
        rows = similarity.ann_lsh_topk(emb, qids, k=10, tables=tables).collect()
        pairs = [(r["query_id"], r["vec_id"]) for r in rows]
        assert len(pairs) == len(set(pairs))  # deduped across tables
        for r in rows:
            if (r["query_id"], r["vec_id"]) in exact_pairs:
                assert (r["query_id"], r["vec_id"], r["cos_sim"]) in exact
        return len(exact_pairs & set(pairs)) / len(exact_pairs)

    r1, r4 = run(1), run(4)
    assert r4 >= r1
    import pytest as _pytest

    with _pytest.raises(ValueError):
        similarity.ann_lsh_topk(emb, qids, tables=0)


def test_ann_lsh_default_recall_gate(spark):
    """Round-7 gate (VERDICT r6 "Next #3"): the DEFAULT tables/probes
    knobs must keep recall@10 ≥ 0.7 vs brute force at sf0.01 on the
    planes=4 grid point the defaults were chosen from (measured 0.94 —
    tables=8 × probes=2; tables=1/probes=1 gave 0.08–0.16). Lowering
    DEFAULT_LSH_TABLES / DEFAULT_LSH_PROBES or breaking multi-table or
    multiprobe candidate generation fails this test."""
    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    ann = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_lsh_topk(emb, qids, k=10, planes=4).collect()
    }
    recall = len(exact & ann) / len(exact)
    assert recall >= 0.7, f"default-knob recall@10 regressed: {recall}"


def test_ann_lsh_auto_planes_follows_corpus_size(spark, sf_dir):
    """planes=None resolves via recommended_planes(corpus count): tiny
    corpora get 1 plane (buckets ≈ corpus — exactness limit), and the
    formula tracks log2(n/target) as n grows."""
    assert similarity.recommended_planes(500) == 1
    assert similarity.recommended_planes(5000) == 3
    assert similarity.recommended_planes(1_000_000_000) == 20
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1]
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, qids, k=5).collect()
    }
    got = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_lsh_topk(emb, qids, k=5).collect()
    }
    # auto-planes on a tiny corpus degenerates to near-exact retrieval
    assert len(exact & got) / len(exact) >= 0.8


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """IVF with n_probe=4/16 must recover most of the exact top-10 —
    and every hit it returns carries the exact score."""
    emb = load_table(spark, sf_dir, "embeddings")
    qids = [0, 1, 2, 3, 4]
    exact = {
        (r["query_id"], r["vec_id"])
        for r in similarity.cosine_topk(emb, qids, k=10).collect()
    }
    ivf_rows = similarity.ann_ivf_topk(emb, qids, k=10, n_probe=4).collect()
    ivf = {(r["query_id"], r["vec_id"]) for r in ivf_rows}
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.7, f"IVF recall too low: {recall}"
    # Lloyd refinement must tighten the quantizer: mean within-cluster
    # cosine strictly above the first-N-seeded assignment's
    from firebolt_spark.operators.similarity import dot_fold

    def mean_within(iters):
        assigned, cents = similarity.ivf_assign(emb, 16, kmeans_iters=iters)
        j = assigned.join(F.broadcast(cents), "cluster")
        sim = dot_fold("embedding", "c_vec") / (F.col("_norm") * F.col("c_norm"))
        return j.agg(F.avg(sim)).first()[0]

    assert mean_within(2) > mean_within(0) + 0.02
    # probing every cluster must reproduce brute force exactly
    full = {
        (r["query_id"], r["vec_id"])
        for r in similarity.ann_ivf_topk(
            emb, qids, k=10, n_centroids=16, n_probe=16
        ).collect()
    }
    assert full == exact


def test_incremental_near_dups(spark, sf_dir):
    """Delta-vs-index dedup: a new batch containing one exact copy of an
    indexed doc and one novel doc — the copy matches its original at
    est=1.0, the novel doc passes clean, and the returned delta
    signatures extend the index."""
    from pyspark.sql import functions as F

    from firebolt_spark.operators.dedup import (
        incremental_near_dups,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    index = minhash_signatures(docs.filter("doc_id < 400")).persist()
    novel_text = " ".join(f"novelword{i}" for i in range(40))
    new_batch = (
        docs.filter("doc_id = 7")
        .withColumn("doc_id", F.lit(900000))  # duplicate of indexed doc 7
        .unionAll(
            docs.filter("doc_id = 450")
            .withColumn("doc_id", F.lit(900001))
            .withColumn("text", F.lit(novel_text))  # shares no shingle
        )
    )
    matches, new_sig = incremental_near_dups(new_batch, index, threshold=0.5)
    got = {(r["new_doc_id"], r["index_doc_id"], r["est_jaccard"]) for r in matches.collect()}
    assert (900000, 7, 1.0) in got
    assert not any(m[0] == 900001 for m in got)
    assert new_sig.count() == 2


def test_ngram_jaccard_max_df_collapses_hot_shingle_pairs(spark):
    """Hot-shingle document-frequency cap (VERDICT r1 #4): a shingle
    present in every document makes the uncapped inverted-index join
    all-pairs; with max_df it is pruned and only real near-dups pair."""
    from firebolt_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved by the"  # 6 tokens → ubiquitous shingles
    rows = [(i, f"{boiler} unique{i} body{i} tail{i}") for i in range(40)]
    rows += [(100, f"{boiler} same same same"), (101, f"{boiler} same same same")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    uncapped = ngram_jaccard_pairs(docs, threshold=0.01).count()
    capped = ngram_jaccard_pairs(docs, threshold=0.01, max_df=0.5)
    capped_rows = capped.collect()
    # uncapped: every pair shares the boilerplate shingles → ~all-pairs
    assert uncapped > 600
    # capped: only the genuine duplicate pair survives
    assert {(r["doc_a"], r["doc_b"]) for r in capped_rows} == {(100, 101)}


def test_ngram_max_df_count_absolute_cap(spark):
    """Round 11: the ABSOLUTE hot-shingle cap. The fractional max_df
    stops firing as the corpus grows (threshold = fraction x corpus),
    so boilerplate with a fixed document count eventually slips through
    and makes one join key quadratic; max_df_count bounds the group
    unconditionally. At a matched threshold the two caps are
    row-identical, and setting BOTH drops a shingle when it exceeds
    either (one compare against the lower threshold)."""
    from firebolt_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved by the"
    rows = [(i, f"{boiler} unique{i} body{i} tail{i}") for i in range(40)]
    rows += [(100, f"{boiler} same same same"), (101, f"{boiler} same same same")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    n_docs = 42

    key = lambda df: {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
                      for r in df.collect()}
    frac = key(ngram_jaccard_pairs(docs, threshold=0.01, max_df=0.5))
    # matched threshold: floor(0.5 * 42) = 21 — identical result rows
    absolute = key(ngram_jaccard_pairs(docs, threshold=0.01, max_df_count=21))
    assert absolute == frac
    assert {(a, b) for a, b, _ in absolute} == {(100, 101)}
    # the 100 TB scenario the fractional cap misses: boilerplate in a
    # MINORITY of a large corpus (here 42 of 142 docs) sails under
    # max_df=0.5 (threshold 71), still making its join key quadratic;
    # the absolute count collapses it regardless of corpus size
    rows2 = rows + [(200 + i, f"clean{i} text{i} nothing{i} shared{i} here{i}")
                    for i in range(100)]
    big = spark.createDataFrame(rows2, "doc_id BIGINT, text STRING")
    loose = ngram_jaccard_pairs(big, threshold=0.01, max_df=0.5).count()
    tight = key(ngram_jaccard_pairs(
        big, threshold=0.01, max_df=0.5, max_df_count=21
    ))
    assert loose > 600  # fractional cap alone: boilerplate all-pairs
    assert {(a, b) for a, b, _ in tight} == {(100, 101)}


def test_ngram_hot_broadcast_tristate_forced_off(spark):
    """r10 VERDICT residual: the hot-shingle exclusion list's broadcast
    is tri-stated like unigram_lm_quality's broadcast_model. Forced off,
    the anti-join carries NO hint (AQE/size-stats decide — the
    boilerplate-pathological-corpus escape hatch) and the pair set is
    unchanged; the default still hints (the list is max_df-bounded)."""
    from firebolt_spark.operators.dedup import ngram_jaccard_pairs

    boiler = "all rights reserved by the"
    rows = [(i, f"{boiler} unique{i} body{i} tail{i}") for i in range(40)]
    rows += [(100, f"{boiler} same same same"), (101, f"{boiler} same same same")]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")

    analyzed = lambda df: df._jdf.queryExecution().analyzed().toString()
    hinted = ngram_jaccard_pairs(docs, threshold=0.01, max_df=0.5)
    unhinted = ngram_jaccard_pairs(
        docs, threshold=0.01, max_df=0.5, broadcast_hot=False
    )
    # default: the 1-row n_docs scalar AND the hot list are hinted;
    # forced off: only the scalar remains (counts are doubled because
    # the inverted-index self-join repeats the anti-join subtree on
    # both sides)
    assert analyzed(hinted).count("ResolvedHint") == 4
    assert analyzed(unhinted).count("ResolvedHint") == 2
    assert {(r["doc_a"], r["doc_b"]) for r in unhinted.collect()} == {(100, 101)}


def test_ngram_max_df_cap_resolves_in_plan_not_driver(spark):
    """VERDICT r2 #6: the max_df cap used to run a separate
    docs.count() DRIVER action at plan-construction time — one extra
    scan per invocation. It is now a 1-row in-plan aggregate, so merely
    building the DataFrame launches zero Spark jobs."""
    from firebolt_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(i, f"alpha beta gamma delta{i}") for i in range(20)],
        "doc_id BIGINT, text STRING",
    )
    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = ngram_jaccard_pairs(docs, max_df=0.5)  # construction only
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "plan construction must not launch jobs"
    assert df.count() >= 0  # and the capped query still executes


def test_hot_bucket_cap_kills_degenerate_band_joins(spark):
    """Degenerate-bucket guard (VERDICT r2 #3): 1k identical docs land
    in ONE (band, bucket) key, so the uncapped self-join materializes
    ~500k pairs on a single reducer. With max_bucket the bucket is
    dropped before the join: zero candidate pairs from the clone set,
    while distinct docs keep pairing normally."""
    from firebolt_spark.operators import dedup

    clones = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.lit("the same boilerplate license header text forever").alias("text"),
    )
    assert dedup.minhash_candidate_pairs(clones, max_bucket=100).count() == 0
    assert dedup.simhash_pairs(clones, max_bucket=100).count() == 0

    # uncapped control on a small clone slice: the quadratic blow-up is
    # real (n=60 → 1770 pairs per mechanism)
    small = clones.filter(F.col("doc_id") < 60)
    assert dedup.minhash_candidate_pairs(small).count() == 60 * 59 // 2
    assert dedup.simhash_pairs(small).count() == 60 * 59 // 2

    # embedding analogue: identical vectors share the full signature
    clone_vecs = spark.range(1000).select(
        F.col("id").alias("vec_id"),
        F.array(*[F.lit(float(d % 7) - 3.0) for d in range(64)])
        .cast("array<float>")
        .alias("embedding"),
    )
    assert (
        similarity.embedding_near_dups(
            clone_vecs, threshold=0.9, max_bucket=100
        ).count()
        == 0
    )
    small_vecs = clone_vecs.filter(F.col("vec_id") < 60)
    assert (
        similarity.embedding_near_dups(small_vecs, threshold=0.9).count()
        == 60 * 59 // 2
    )


def test_bucket_cap_noop_preserves_exact_results(spark, sf_dir):
    """The declared-query caps must be no-ops at test scale: capped and
    uncapped minhash pairs agree exactly on the fixture corpus (the
    oracle run then checks the capped SQL against the capped Spark)."""
    from firebolt_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    capped = set(
        map(tuple, dedup.minhash_candidate_pairs(docs, max_bucket=1000).collect())
    )
    uncapped = set(map(tuple, dedup.minhash_candidate_pairs(docs).collect()))
    assert capped == uncapped


def test_release_frees_operator_caches(spark, sf_dir):
    """track_persisted/release (ADVICE r2): the persisted intermediates
    backing simhash_pairs / embedding_near_dups are freed on release —
    no cached-block accumulation across bench runs or micro-batches."""
    from firebolt_spark.functions import release

    from firebolt_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents").limit(100)
    pairs = dedup.simhash_pairs(docs)
    pairs.count()
    handles = pairs._persisted_inputs
    assert handles and all(h.storageLevel.useMemory for h in handles)
    release(pairs)
    assert all(not h.storageLevel.useMemory for h in handles)
    assert pairs._persisted_inputs == []


def test_multimodal_features_deterministic(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = multimodal.attach_media(docs)
    a = multimodal.extract_features(media).collect()
    b = multimodal.extract_features(media).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))
    row = a[0]
    assert 16 <= row["width"] <= 255 and 16 <= row["height"] <= 255
    assert len(row["feature"]) == multimodal.FEATURE_DIM
    assert all(0.0 <= v <= 1.0 for v in row["feature"])


def test_multimodal_real_decode_rejects_non_bmp(spark, sf_dir):
    """decode_stub=False is a REAL decoder now (round 4) — it must
    still refuse payloads it can't actually parse (raw text bytes)."""
    import pytest

    docs = load_table(spark, sf_dir, "documents").limit(2)
    media = multimodal.attach_media(docs)  # raw UTF-8 bytes, not BMP
    with pytest.raises(Exception):  # ValueError inside the task
        multimodal.extract_features(media, decode_stub=False).collect()


def test_bmp_builtin_decode_matches_pandas_decode(spark, sf_dir):
    """The two real decode paths — built-in hex-nibble expressions and
    the Arrow/pandas struct.unpack path — agree field-for-field."""
    docs = load_table(spark, sf_dir, "documents").limit(40)
    media = multimodal.bmp_encode(docs)
    builtin = {
        r["doc_id"]: r for r in multimodal.bmp_decode(media).collect()
    }
    pandas_path = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            media, decode_stub=False
        ).collect()
    }
    assert builtin.keys() == pandas_path.keys()
    for doc_id, b in builtin.items():
        p = pandas_path[doc_id]
        assert (b["width"], b["height"]) == (p["width"], p["height"])
        assert p["n_frames"] == b["height"]
        assert p["feature"] == [
            b["mean_b"], b["mean_g"], b["mean_r"], b["mean_all"]
        ]


def test_bmp_decode_known_image(spark):
    """Hand-built 4×1 BMP with known pixel bytes — catches byte-offset,
    endianness, and channel-phase bugs in BOTH decoders."""
    import struct as st

    pixels = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120])
    header = (
        b"BM"
        + st.pack("<I", 54 + len(pixels))
        + b"\x00\x00\x00\x00"
        + st.pack("<I", 54)
        + st.pack("<I", 40)
        + st.pack("<ii", 4, 1)
        + st.pack("<HH", 1, 24)
        + st.pack("<I", 0)
        + st.pack("<I", len(pixels))
        + st.pack("<ii", 2835, 2835)
        + st.pack("<II", 0, 0)
    )
    payload = header + pixels
    expected = {
        "width": 4,
        "height": 1,
        "bpp": 24,
        "n_pixel_bytes": 12,
        "mean_b": round((10 + 40 + 70 + 100) / 4, 6),
        "mean_g": round((20 + 50 + 80 + 110) / 4, 6),
        "mean_r": round((30 + 60 + 90 + 120) / 4, 6),
        "mean_all": round(sum(pixels) / 12, 6),
    }
    assert multimodal._bmp_decode_py(payload) == expected
    df = spark.createDataFrame([(1, payload)], "doc_id BIGINT, media BINARY")
    row = multimodal.bmp_decode(df).collect()[0]
    for k, v in expected.items():
        assert row[k] == v, (k, row[k], v)


def test_bmp_decode_non_bmp_yields_nulls(spark):
    df = spark.createDataFrame(
        [(1, b"definitely not a bitmap, but long enough to parse....")],
        "doc_id BIGINT, media BINARY",
    )
    row = multimodal.bmp_decode(df).collect()[0]
    assert row["width"] is None and row["mean_all"] is None


def test_bmp_decode_malformed_payloads_null_in_both_decoders(spark):
    """Magic-only / truncated / header-only / out-of-range data_off
    payloads must be rejected IDENTICALLY by the SQL and pandas
    decoders (ADVICE r4: 'BM' magic alone let garbage through the SQL
    path while the Python path returned None)."""
    import struct as st

    def hdr(data_off, total_extra=0):
        return (
            b"BM"
            + st.pack("<I", 54 + total_extra)
            + b"\x00\x00\x00\x00"
            + st.pack("<I", data_off)
            + st.pack("<I", 40)
            + st.pack("<ii", 1, 1)
            + st.pack("<HH", 1, 24)
            + st.pack("<I", 0) * 6
        )

    cases = [
        b"BM",  # magic only
        b"BM" + b"\x00" * 20,  # truncated header (<54 bytes)
        hdr(54),  # header-only: data_off == n_total, no pixels
        hdr(9999) + b"\x01\x02\x03",  # data_off beyond payload
        hdr(10) + b"\x01\x02\x03",  # data_off inside the header
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p in enumerate(cases)], "doc_id BIGINT, media BINARY"
    )
    rows = {r["doc_id"]: r for r in multimodal.bmp_decode(df).collect()}
    for i, payload in enumerate(cases):
        assert multimodal._bmp_decode_py(payload) is None, i
        r = rows[i]
        assert r["width"] is None and r["n_pixel_bytes"] is None, (i, r)
        assert r["mean_all"] is None, (i, r)


def test_frame_sample_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    feats = multimodal.extract_features(
        multimodal.attach_media(docs, kind="video")
    )
    frames = multimodal.frame_sample(feats, every_nth=2)
    bad = frames.join(feats, "doc_id").filter(
        (F.col("frame_idx") < 0) | (F.col("frame_idx") >= F.col("n_frames"))
    )
    assert bad.count() == 0


def test_decontaminate_flags_overlap_and_only_overlap(spark):
    """A doc quoting a benchmark passage verbatim is flagged with the
    right distinct-shingle count; clean docs score 0; NULL text is
    clean, not an error."""
    from firebolt_spark.operators.dedup import decontaminate

    corpus = spark.createDataFrame(
        [
            # contains the benchmark's "the quick brown fox jumps over" run
            (1, "prefix words then the quick brown fox jumps over the lazy dog"),
            (2, "entirely unrelated text about distributed query engines here"),
            (3, None),
        ],
        "doc_id BIGINT, text STRING",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over a fence")],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r["n_hits"] for r in decontaminate(corpus, bench, n=5).collect()}
    # doc 1 shares exactly two distinct 5-grams with the benchmark:
    # "the quick brown fox jumps" and "quick brown fox jumps over"
    assert out == {1: 2, 2: 0, 3: 0}


def test_decontaminate_benchmark_side_broadcasts(spark, sf_dir):
    """The benchmark shingle table must broadcast — the corpus side
    joins without shuffling its shingles (the 100 TB contract: eval
    sets are tiny, corpora are not)."""
    from firebolt_spark.operators.dedup import decontaminate

    docs = load_table(spark, sf_dir, "documents")
    df = decontaminate(
        docs.filter(F.col("doc_id") % 2 == 0),
        docs.filter(F.col("doc_id") % 2 == 1).limit(20),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_redact_pii(spark):
    from firebolt_spark.operators.text import redact

    docs = spark.createDataFrame(
        [
            (1, "contact bob@example.com or +1 555-123-4567 now"),
            (2, "server at 10.0.0.1 ssn 123-45-6789"),
            (3, "nothing sensitive here"),
        ],
        "doc_id BIGINT, text STRING",
    )
    out = {r["doc_id"]: r for r in redact(docs).collect()}
    assert "<EMAIL>" in out[1]["text_redacted"]
    assert "<PHONE>" in out[1]["text_redacted"]
    assert "bob@example.com" not in out[1]["text_redacted"]
    assert out[1]["n_email"] == 1 and out[1]["n_phone"] == 1
    assert "<IPV4>" in out[2]["text_redacted"] and "<SSN>" in out[2]["text_redacted"]
    assert out[3]["text_redacted"] == "nothing sensitive here"
    assert out[3]["n_email"] == out[3]["n_phone"] == 0


def _docs_df(spark, n=10):
    return spark.createDataFrame(
        [("idx", "", f"d{i}", "payload") for i in range(n)],
        "index STRING, mapping_type STRING, doc_id STRING, doc STRING",
    ).coalesce(1)


def test_es_sink_mapping_error_never_retried(spark, tmp_path):
    client = FileBackedBulkClient(spool_dir=str(tmp_path), fail_ids={"d3"})
    sink = ElasticsearchSink({"client_factory": lambda: client, "batch_size": 4})
    dlq = sink.transform(_docs_df(spark)).collect()
    assert [r["doc_id"] for r in dlq] == ["d3"]
    assert dlq[0]["error_type"] == "mapper_parsing_exception"
    assert len(client.indexed_ids()) == 9


def test_es_sink_transient_doc_failure_retries_then_dlqs(spark, tmp_path):
    client = FileBackedBulkClient(
        spool_dir=str(tmp_path), fail_ids={"d1"}, fail_type="es_rejected"
    )
    sink = ElasticsearchSink(
        {
            "client_factory": lambda: client,
            "batch_size": 100,
            "bulk_index_max_retries": 3,
        }
    )
    dlq = sink.transform(_docs_df(spark, 4)).collect()
    # retried 3 times (elastic_index_client.go:239-255) then dead-lettered
    assert [r["doc_id"] for r in dlq] == ["d1"]
    assert client.call_count() == 4  # 1 initial + 3 retries
    assert len(client.indexed_ids()) == 3


def test_es_sink_whole_batch_retry_with_backoff(spark, tmp_path):
    client = FileBackedBulkClient(spool_dir=str(tmp_path), transient_failures=2)
    sink = ElasticsearchSink(
        {
            "client_factory": lambda: client,
            "batch_size": 100,
            "initial_backoff_s": 0.0,
        }
    )
    dlq = sink.transform(_docs_df(spark, 4)).collect()
    assert dlq == []
    assert len(client.indexed_ids()) == 4
    assert client.call_count() == 3  # 2 transport failures + 1 success


def test_es_sink_periodic_reconnect(spark, tmp_path):
    """reconnect_batch_count=2: the 2nd and 4th bulk batch each get a
    fresh client (reference connectionfactory.go:55-69 cadence), counted
    in the accumulator-backed counters."""
    import os

    spool = str(tmp_path / "spool")
    conn_dir = tmp_path / "conns"
    conn_dir.mkdir()

    def factory(spool=spool, conn_dir=str(conn_dir)):
        import os as _os
        import uuid as _uuid

        open(_os.path.join(conn_dir, _uuid.uuid4().hex), "w").close()
        return FileBackedBulkClient(spool_dir=spool)

    sink = ElasticsearchSink(
        {
            "client_factory": factory,
            "batch_size": 2,  # 10 docs -> 5 bulk batches
            "reconnect_batch_count": 2,
        }
    )
    dlq = sink.transform(_docs_df(spark)).collect()
    assert dlq == []
    # 1 initial connection + reconnects on batches 2 and 4
    assert len(os.listdir(conn_dir)) == 3
    assert sink.counters()["es_reconnects_total"] == 2


def test_es_sink_counters_reach_metrics_exposition(spark, tmp_path):
    from firebolt_spark.streaming.metrics import prometheus_exposition
    from firebolt_spark.streaming.runner import StreamingMetrics

    client = FileBackedBulkClient(
        spool_dir=str(tmp_path), fail_ids={"d1"}, fail_type="es_rejected"
    )
    sink = ElasticsearchSink(
        {
            "client_factory": lambda: client,
            "batch_size": 100,
            "bulk_index_max_retries": 3,
        }
    )
    sink.transform(_docs_df(spark, 4)).collect()
    c = sink.counters()
    assert c["es_doc_retries_total"] == 3
    assert c["es_docs_dead_lettered_total"] == 1
    assert c["es_reconnects_total"] == 0
    text = prometheus_exposition(StreamingMetrics(), extra_counters=c)
    assert "firebolt_es_docs_dead_lettered_total 1" in text
    assert "# HELP firebolt_es_doc_retries_total" in text
    assert "firebolt_es_doc_retries_total 3" in text


def test_es_sink_whole_batch_retries_bounded(spark, tmp_path):
    client = FileBackedBulkClient(spool_dir=str(tmp_path), transient_failures=100)
    sink = ElasticsearchSink(
        {
            "client_factory": lambda: client,
            "batch_size": 100,
            "initial_backoff_s": 0.0,
            "max_batch_retries": 2,
        }
    )
    import pytest

    with pytest.raises(Exception):  # BulkIndexError surfaces, not a hang
        sink.transform(_docs_df(spark, 4)).collect()


def test_star_cc_matches_propagation(spark, sf_dir):
    """dedup_clusters_star has the identical output contract as the
    min-label propagation version: (doc_id, cluster_id = min id in
    component)."""
    from firebolt_spark.operators import dedup

    docs = load_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_candidate_pairs(docs)
    prop = sorted(map(tuple, dedup.dedup_clusters(pairs).collect()))
    star = sorted(map(tuple, dedup.dedup_clusters_star(pairs).collect()))
    assert prop == star
    assert len(star) > 0


def test_star_cc_bounds_rounds_on_deep_chain(spark):
    """The scale property the star algorithm exists for: a 300-node
    near-dup CHAIN converges within O(log n) rounds (max_iter=12 is
    ample), where min-label propagation needs O(diameter)=300 rounds
    and, capped at 12, provably returns wrong labels."""
    from firebolt_spark.operators import dedup

    n = 300
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a int, doc_b int"
    )
    star = dedup.dedup_clusters_star(pairs, max_iter=12)
    assert star.filter(F.col("cluster_id") != 0).count() == 0
    assert star.count() == n
    prop = dedup.dedup_clusters(pairs, max_iter=12)
    assert prop.filter(F.col("cluster_id") != 0).count() > 0


def test_star_cc_one_driver_action_per_round(spark):
    """VERDICT r4 #6: convergence detection must cost ONE driver action
    per round (the stats aggregate that also materializes the lazy
    checkpoint), not count()+exceptAll() — plus one initial stats and
    exactly one deterministic exceptAll confirm at the detected
    fixpoint: driver_actions == rounds + 2 (the old loop cost
    2*rounds + 1)."""
    from firebolt_spark.operators import dedup

    # star-shaped already: converges after round 1
    two_edges = spark.createDataFrame(
        [(1, 2), (10, 20)], "doc_a int, doc_b int"
    )
    t = {}
    labels = dedup.dedup_clusters_star(two_edges, max_iter=12, telemetry=t)
    got = sorted(map(tuple, labels.collect()))
    assert got == [(1, 1), (2, 1), (10, 10), (20, 10)]
    assert t["rounds"] == 1
    assert t["driver_actions"] == t["rounds"] + 2, t

    # deep chain: several rounds, still rounds + 2 actions total
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a int, doc_b int"
    )
    t = {}
    labels = dedup.dedup_clusters_star(chain, max_iter=12, telemetry=t)
    assert labels.filter(F.col("cluster_id") != 0).count() == 0
    assert 1 < t["rounds"] <= 12
    assert t["driver_actions"] == t["rounds"] + 2, t


import pytest


@pytest.mark.parametrize("seed,n_nodes,n_edges", [(11, 400, 280), (42, 300, 500)])
def test_star_cc_matches_union_find_ground_truth(spark, seed, n_nodes, n_edges):
    """Independent correctness oracle for the distributed star CC: a
    plain union-find over the same random graph. (The propagation-
    equality test shares no code with this one, so the two distributed
    variants and the sequential ground truth must all agree.)"""
    import random

    from firebolt_spark.operators import dedup

    rng = random.Random(seed)
    edges = [
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    ]
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    touched = {v for e in edges for v in e}
    # cluster id = min node id in component (the operator's contract)
    min_of_root: dict[int, int] = {}
    for v in sorted(touched):
        min_of_root.setdefault(find(v), v)
    expect = sorted((v, min_of_root[find(v)]) for v in touched)

    pairs = spark.createDataFrame(edges, "doc_a int, doc_b int")
    got = sorted(map(tuple, dedup.dedup_clusters_star(pairs).collect()))
    assert got == expect


def test_recommended_planes_tracks_corpus_size():
    from firebolt_spark.operators.similarity import recommended_planes

    assert recommended_planes(500) == 1            # under target: 1 plane
    assert recommended_planes(2_000) == 1          # 2 buckets of ~1000
    assert recommended_planes(1_000_000) == 10     # ~1k buckets
    assert recommended_planes(1_000_000_000) == 20 # 1M buckets
    # monotone non-decreasing in corpus size
    sizes = [10**e for e in range(2, 10)]
    planes = [recommended_planes(n) for n in sizes]
    assert planes == sorted(planes)


def test_repetition_stats_known_values(spark):
    """Hand-computed repetition fractions: the fold's
    longest-sorted-run must equal true max bigram multiplicity."""
    from firebolt_spark.operators.text import repetition_stats

    rows = [
        (1, "a b a b a b"),      # 6 words, 2 distinct; bigrams: a-b x3, b-a x2
        (2, "u v w x y"),        # all unique; every bigram unique
        (3, "z z z z"),          # one word repeated; z-z x3
        (4, "solo"),             # 1 word: no bigrams
        (5, ""),                 # empty text -> [''] after split
    ]
    docs = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r for r in repetition_stats(docs).collect()}

    assert got[1]["n_words"] == 6
    assert got[1]["dup_word_frac"] == round(4 / 6, 4)
    assert got[1]["top_bigram_frac"] == round(3 / 5, 4)
    assert got[2]["dup_word_frac"] == 0.0
    assert got[2]["top_bigram_frac"] == 0.25  # 4 distinct bigrams of 4
    assert got[3]["dup_word_frac"] == 0.75
    assert got[3]["top_bigram_frac"] == 1.0
    assert got[4]["n_words"] == 1
    assert got[4]["top_bigram_frac"] == 0.0
    assert got[5]["top_bigram_frac"] == 0.0


def test_hash_sample_deterministic_and_calibrated(spark):
    """hash_sample: (a) the selected row SET is identical under any
    partitioning (the property Bernoulli sample() lacks), (b) the kept
    fraction concentrates near the target, (c) different salts give
    (near-)independent samples, (d) bad fractions rejected."""
    import pytest as _pytest

    from firebolt_spark.functions import hash_sample, hash_sample_by

    df = spark.range(0, 20_000).withColumnRenamed("id", "k")
    a = {r["k"] for r in hash_sample(df, "k", 0.3, salt="s").collect()}
    b = {
        r["k"]
        for r in hash_sample(df.repartition(17), "k", 0.3, salt="s").collect()
    }
    assert a == b  # partitioning-independent
    assert abs(len(a) / 20_000 - 0.3) < 0.02  # calibrated
    c = {r["k"] for r in hash_sample(df, "k", 0.3, salt="t").collect()}
    overlap = len(a & c) / 20_000
    assert abs(overlap - 0.09) < 0.02  # independent salts: ~0.3*0.3
    with _pytest.raises(ValueError):
        hash_sample(df, "k", 1.5)

    # stratified: each stratum honors its own rate, absent strata get
    # the default
    strat = df.withColumn(
        "grp", (F.col("k") % 4).cast("string")
    )
    out = hash_sample_by(
        strat, "grp", {"0": 1.0, "1": 0.5, "2": 0.0}, key_col="k",
        default_fraction=0.25,
    )
    rates = {
        r["grp"]: r["n"] / 5000
        for r in out.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert rates["0"] == 1.0
    assert abs(rates["1"] - 0.5) < 0.05
    assert "2" not in rates
    assert abs(rates["3"] - 0.25) < 0.05

    # NULL keys get a deterministic fate via the sentinel hash (ADVICE
    # r6: md5(NULL) used to silently drop them even at fraction=1.0)
    with_null = df.withColumn(
        "k2", F.when(F.col("k") < 5, None).otherwise(F.col("k"))
    )
    assert hash_sample(with_null, "k2", 1.0).count() == 20_000
    kept = {
        r["k"]
        for r in hash_sample(with_null, "k2", 0.3, salt="s")
        .filter(F.col("k2").isNull())
        .collect()
    }
    # all NULL-keyed rows share one fate: all in or all out
    assert len(kept) in (0, 5)


# ---------------------------------------------------------------------------
# round 7: training-mix construction, span dedup, LM quality


def test_temperature_mix_endpoints_and_determinism(spark, sf_dir):
    """alpha=1 keeps the natural mix untouched; alpha=0 flattens toward
    uniform (every stratum within binomial noise of the smallest);
    the sampled ROW SET is invariant under repartitioning."""
    from firebolt_spark.operators import mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    natural = {r["lang"]: r["n"] for r in
               docs.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    cmin = min(natural.values())

    kept1 = mixture.temperature_mix(docs, "lang", "doc_id", alpha=1.0)
    assert kept1.count() == sum(natural.values())  # identity

    kept0 = mixture.temperature_mix(docs, "lang", "doc_id", alpha=0.0, salt="t0")
    counts0 = {r["lang"]: r["n"] for r in
               kept0.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    for lang, n in counts0.items():
        assert n <= natural[lang]
        # threshold targets cmin rows; allow 4-sigma binomial noise
        sigma = (cmin * max(0.0, 1 - cmin / natural[lang])) ** 0.5
        assert abs(n - cmin) <= 4 * sigma + 1, (lang, n, cmin)
    # smallest stratum is kept whole at every alpha
    smallest = min(natural, key=natural.get)
    assert counts0[smallest] == natural[smallest]

    a = sorted(r["doc_id"] for r in
               mixture.temperature_mix(docs, "lang", "doc_id", salt="s").collect())
    b = sorted(r["doc_id"] for r in
               mixture.temperature_mix(docs.repartition(13), "lang", "doc_id",
                                       salt="s").collect())
    assert a == b


def test_temperature_mix_is_broadcast_no_corpus_shuffle(spark, sf_dir):
    """The corpus side must reach the plan's single join un-shuffled:
    thresholds come back as a broadcast, never a SortMergeJoin."""
    from firebolt_spark.operators import mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    plan = mixture.temperature_mix(docs, "lang", "doc_id")._jdf.queryExecution(
    ).executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_hash_split_partitions_disjoint_exhaustive_stable(spark, sf_dir):
    from firebolt_spark.operators import mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    out = mixture.hash_split(docs, "doc_id", salt="sp")
    n = docs.count()
    assert out.count() == n  # exhaustive: every row gets a split
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == n
    # rough proportions (4-sigma binomial)
    for name, frac in (("train", 0.9), ("val", 0.05), ("test", 0.05)):
        sigma = (n * frac * (1 - frac)) ** 0.5
        assert abs(counts.get(name, 0) - frac * n) <= 4 * sigma + 1, name
    # same doc -> same split under any partitioning
    again = {r["doc_id"]: r["split"]
             for r in mixture.hash_split(docs.repartition(7), "doc_id",
                                         salt="sp").collect()}
    for r in out.collect():
        assert again[r["doc_id"]] == r["split"]
    # pure map job: no Exchange anywhere in the plan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_hash_split_validates_weights(spark, sf_dir):
    import pytest as _pytest

    from firebolt_spark.operators import mixture

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    with _pytest.raises(ValueError):
        mixture.hash_split(docs, "doc_id", {"only": 1.0})
    with _pytest.raises(ValueError):
        mixture.hash_split(docs, "doc_id", {"a": -0.1, "b": 0.5})
    with _pytest.raises(ValueError):
        mixture.hash_split(docs, "doc_id", {"a": 0.0, "b": 0.0})


def test_dedup_spans_known_case(spark):
    """First occurrence survives, later repeats vanish, remainder tile
    is kept, a fully-duplicated doc comes back empty."""
    from firebolt_spark.operators.dedup import dedup_spans

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g"),          # tiles: 'a b c' 'd e f' 'g'
            (2, "a b c x y z"),            # 'a b c' dups doc1 pos0
            (3, "a b c d e f"),            # both tiles dup'd -> empty
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in dedup_spans(docs, span_words=3).collect()}
    assert (out[1]["n_spans"], out[1]["n_kept"]) == (3, 3)
    assert out[1]["text_dedup"] == "a b c d e f g"
    assert (out[2]["n_spans"], out[2]["n_kept"]) == (2, 1)
    assert out[2]["text_dedup"] == "x y z"
    assert (out[3]["n_spans"], out[3]["n_kept"]) == (2, 0)
    assert out[3]["text_dedup"] == ""


def test_dedup_spans_conserves_distinct_spans(spark, sf_dir):
    """sum(n_kept) == corpus-wide distinct span count, and every doc's
    surviving text is a subsequence rebuild (n_kept <= n_spans)."""
    from firebolt_spark.operators.dedup import dedup_spans, doc_spans

    docs = load_table(spark, sf_dir, "documents")
    out = dedup_spans(docs, span_words=3)
    agg = out.agg(F.sum("n_kept").alias("k"), F.sum("n_spans").alias("s")
                  ).collect()[0]
    distinct_spans = doc_spans(docs, 3).select("span").distinct().count()
    assert agg["k"] == distinct_spans
    assert agg["k"] < agg["s"]  # the fixture really has duplicate spans
    assert out.filter(F.col("n_kept") > F.col("n_spans")).count() == 0


def test_lm_cross_entropy_uniform_and_oov(spark):
    """Uniform corpus scores exactly log2(vocab) bits/token; an
    external model scores OOV tokens with the add-one floor (highest
    rarity), so rare-token docs rank above boilerplate."""
    from firebolt_spark.operators import text as text_ops

    uniform = spark.createDataFrame(
        [(1, "a b"), (2, "c d")], ["doc_id", "text"]
    )
    rows = text_ops.lm_cross_entropy(uniform).collect()
    for r in rows:
        assert r["bits_per_token"] == 2.0  # log2(4)

    model = text_ops.unigram_model(uniform)
    scored = {r["doc_id"]: r["bits_per_token"]
              for r in text_ops.lm_cross_entropy(
                  spark.createDataFrame(
                      [(10, "a a a"), (11, "zzz zzz zzz")],
                      ["doc_id", "text"]),
                  model=model).collect()}
    assert scored[11] > scored[10]  # OOV floor outranks in-vocab


def test_topic_clusters_partition_properties(spark, sf_dir):
    """Every vector lands in exactly one cluster; cluster_size is the
    true population; the operator inherits ivf_assign's determinism
    (two runs agree)."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = similarity.topic_clusters(emb, n_centroids=16)
    n = emb.count()
    rows = out.collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n
    by_cluster: dict[int, int] = {}
    for r in rows:
        by_cluster[r["cluster"]] = by_cluster.get(r["cluster"], 0) + 1
    for r in rows:
        assert r["cluster_size"] == by_cluster[r["cluster"]]
    assert len(by_cluster) <= 16
    again = {(r["vec_id"], r["cluster"])
             for r in similarity.topic_clusters(emb, n_centroids=16).collect()}
    assert again == {(r["vec_id"], r["cluster"]) for r in rows}


def test_temperature_mix_null_stratum_is_a_stratum(spark):
    """A NULL stratum keeps its planned fraction like any other value
    (null-safe join — an equality join would silently drop every
    NULL-stratum row regardless of alpha)."""
    from firebolt_spark.operators import mixture

    df = spark.createDataFrame(
        [(i, None if i % 2 else "a") for i in range(40)],
        "doc_id BIGINT, src STRING",
    )
    kept = mixture.temperature_mix(df, "src", "doc_id", alpha=1.0)
    assert kept.count() == 40  # alpha=1 keeps EVERYTHING, NULLs included
    plan = {r["stratum"]: r["threshold"]
            for r in mixture.mix_plan(df, "src", 0.5).collect()}
    assert None in plan and plan[None] == plan["a"]  # 20/20 balanced


def test_apply_mix_plan_unseen_fraction(spark):
    """Strata absent from a frozen plan drop by default (documented —
    a new domain appearing mid-stream contributes nothing until the
    plan refreshes); unseen_fraction admits them at a deterministic
    hash fraction instead (ADVICE r8)."""
    from firebolt_spark.operators import mixture

    seen = spark.createDataFrame(
        [(i, "a") for i in range(40)], "doc_id BIGINT, src STRING"
    )
    plan = mixture.mix_plan(seen, "src", alpha=1.0)
    mixed = spark.createDataFrame(
        [(i, "a" if i < 40 else "new") for i in range(80)],
        "doc_id BIGINT, src STRING",
    )
    dropped = mixture.apply_mix_plan(mixed, plan, "src", "doc_id")
    assert {r["src"] for r in dropped.collect()} == {"a"}  # default: drop
    whole = mixture.apply_mix_plan(
        mixed, plan, "src", "doc_id", unseen_fraction=1.0
    )
    assert whole.count() == 80  # pass unseen strata through whole
    partial = mixture.apply_mix_plan(
        mixed, plan, "src", "doc_id", unseen_fraction=0.5
    )
    n_new = partial.filter("src = 'new'").count()
    assert 0 < n_new < 40  # deterministic hash subset, not all-or-none
    assert partial.filter("src = 'a'").count() == 40  # planned untouched
    import pytest

    with pytest.raises(ValueError, match="unseen_fraction"):
        mixture.apply_mix_plan(mixed, plan, "src", "doc_id",
                               unseen_fraction=1.5)


def test_dedup_spans_identity_when_all_spans_unique(spark):
    """On a corpus with no repeated window anywhere, dedup_spans is the
    identity transform: every span kept, text rebuilt byte-for-byte."""
    from firebolt_spark.operators.dedup import dedup_spans

    docs = spark.createDataFrame(
        [(i, " ".join(f"w{i}_{j}" for j in range(10 + i))) for i in range(20)],
        ["doc_id", "text"],
    )
    out = dedup_spans(docs, span_words=4).collect()
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in out:
        assert r["n_kept"] == r["n_spans"]
        assert r["text_dedup"] == orig[r["doc_id"]]


def test_semantic_near_dups_properties(spark, sf_dir):
    """Every SemDeDup pair carries the exact fold-cosine score, pairs
    are unique and ordered (a < b), both members share the reported
    cluster, and raising the threshold only shrinks the pair set."""
    from firebolt_spark.operators.similarity import (
        dot_fold, ivf_assign, semantic_near_dups,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    lo = semantic_near_dups(emb, threshold=0.3)
    hi = semantic_near_dups(emb, threshold=0.4)
    lo_rows = lo.collect()
    assert lo_rows, "fixture should yield pairs at 0.3"
    keys = [(r["vec_a"], r["vec_b"]) for r in lo_rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)
    hi_keys = {(r["vec_a"], r["vec_b"]) for r in hi.collect()}
    assert hi_keys <= set(keys)
    # cluster co-membership + exact score check: recompute the cosine
    # in plain Python with the fold's left-to-right summation order
    assigned, _ = ivf_assign(emb, 16)
    cl = {r["vec_id"]: r["cluster"] for r in assigned.collect()}
    need = {v for r in lo_rows[:10] for v in (r["vec_a"], r["vec_b"])}
    vecs = {r["vec_id"]: r["embedding"]
            for r in emb.filter(emb.vec_id.isin(list(need))).collect()}

    def fold_cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += float(x) * float(y)
        na = nb = 0.0
        for x in a:
            na += float(x) * float(x)
        for y in b:
            nb += float(y) * float(y)
        return round(dot / (na ** 0.5 * nb ** 0.5), 4)

    for r in lo_rows[:10]:
        assert cl[r["vec_a"]] == cl[r["vec_b"]] == r["cluster"]
        assert r["cos_sim"] == fold_cos(vecs[r["vec_a"]], vecs[r["vec_b"]])
    from firebolt_spark.functions import release

    release(lo, hi)


def test_dedup_spans_null_text_behaves_as_empty(spark):
    """NULL text tiles exactly like the empty string (one '' span that
    participates in dedup normally) — never the size(NULL)=-1 /
    descending-sequence junk path."""
    from firebolt_spark.operators.dedup import dedup_spans

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, "")], "doc_id BIGINT, text STRING"
    )
    out = {r["doc_id"]: r for r in dedup_spans(docs, span_words=2).collect()}
    assert (out[1]["n_spans"], out[1]["n_kept"]) == (2, 2)
    # doc 2 (NULL) and doc 3 ('') both tile to the single '' span;
    # keep-first gives it to doc 2, doc 3's copy is a duplicate
    assert (out[2]["n_spans"], out[2]["n_kept"]) == (1, 1)
    assert out[2]["text_dedup"] == ""
    assert (out[3]["n_spans"], out[3]["n_kept"]) == (1, 0)
    assert out[3]["text_dedup"] == ""


def test_incremental_dedup_spans_across_batches(spark):
    """Three ingest batches through a growing span index: a span
    admitted in batch N never survives in batch N+k, within-batch
    keep-first still applies, the index grows monotonically, and the
    union of survivors equals a one-shot dedup_spans over the
    concatenated corpus (same keep-first order by doc_id)."""
    from firebolt_spark.operators.dedup import (
        dedup_spans, incremental_dedup_spans,
    )

    batches = [
        [(1, "a b c d e f"), (2, "a b c x y z")],
        [(3, "x y z d e f"), (4, "p q r")],
        [(5, "p q r a b c"), (6, "n o w")],
    ]
    index = None
    survivors = {}
    index_sizes = []
    for rows in batches:
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        deduped, new_digests = incremental_dedup_spans(
            df, index, span_words=3
        )
        for r in deduped.collect():
            survivors[r["doc_id"]] = (r["n_kept"], r["text_dedup"])
        index = (
            new_digests if index is None
            else index.union(new_digests).distinct()
        ).persist()
        index_sizes.append(index.count())
    assert index_sizes == sorted(index_sizes)  # monotone growth
    # equivalent one-shot run over the whole corpus
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], ["doc_id", "text"]
    )
    oneshot = {r["doc_id"]: (r["n_kept"], r["text_dedup"])
               for r in dedup_spans(all_docs, span_words=3).collect()}
    assert survivors == oneshot
    # spot semantics: both of doc 5's tiles were admitted in earlier
    # batches ('p q r' by doc 4, 'a b c' by doc 1) -> fully scrubbed
    assert survivors[5] == (0, "")
    assert survivors[6] == (1, "n o w")


def test_lm_cross_entropy_shuffle_join_path_matches_broadcast(spark):
    """broadcast_model=False (the billion-type dirty-web vocabulary
    path — past the 8 GB broadcast limit) plans a shuffled vocab join
    yet scores bit-identically to the broadcast path; min_count pruning
    shrinks the model self-consistently (pruned tokens become OOV
    against the SMALLER totals). ADVICE r7."""
    from firebolt_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(i, f"common common rare{i}") for i in range(30)],
        ["doc_id", "text"],
    )
    model = text_ops.unigram_model(docs)
    bc = {r["doc_id"]: r["bits_per_token"]
          for r in text_ops.lm_cross_entropy(
              docs, model=model, broadcast_model=True).collect()}
    # simulate the too-big-to-broadcast vocabulary: since r17 the
    # model's counts are persisted, so Catalyst sees an ACCURATE tiny
    # size and auto-broadcasts this toy model even without the hint —
    # correct planning, but this pin is about the shuffle path, so
    # force the large-model condition by disabling auto-broadcast
    prev_thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        sh_df = text_ops.lm_cross_entropy(docs, model=model,
                                          broadcast_model=False)
        plan = sh_df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan.split("LocalTableScan")[0] or \
            "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        assert bc == {r["doc_id"]: r["bits_per_token"]
                      for r in sh_df.collect()}
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_thr)
    # default with a CALLER-supplied model: no forced hint (Catalyst
    # decides) — must still be correct
    auto = {r["doc_id"]: r["bits_per_token"]
            for r in text_ops.lm_cross_entropy(docs, model=model).collect()}
    assert auto == bc
    # min_count=2 drops every rare{i} from the vocabulary: totals
    # shrink to the 60 'common' tokens + vsize 1, and rare tokens score
    # as OOV against those totals
    pruned = text_ops.unigram_model(docs, min_count=2)
    prow = pruned.collect()
    assert len(prow) == 1 and prow[0]["token"] == "common"
    assert prow[0]["total"] == 60 and prow[0]["vsize"] == 1
    import math
    scored = {r["doc_id"]: r["bits_per_token"]
              for r in text_ops.lm_cross_entropy(
                  docs, model=pruned, broadcast_model=True).collect()}
    expect = round((2 * -math.log2(61 / 61) + -math.log2(1 / 61)) / 3, 4)
    assert scored[0] == expect


def test_semantic_near_dups_zero_norm_guard(spark):
    """An all-zero embedding (encoder failure mode) must emit NO pairs:
    cos_sim would be NaN, and NaN orders above every double in both
    Spark and DuckDB, so it would otherwise PASS >= threshold and fake
    a near-dup (ADVICE r7)."""
    from firebolt_spark.operators.similarity import semantic_near_dups

    emb = spark.createDataFrame(
        [(0, [0.0, 0.0, 0.0]),
         (1, [0.0, 0.0, 0.0]),
         (2, [1.0, 0.0, 0.0]),
         (3, [1.0, 0.001, 0.0])],
        "vec_id BIGINT, embedding ARRAY<DOUBLE>",
    )
    pairs = semantic_near_dups(emb, threshold=0.9, n_centroids=2,
                               kmeans_iters=1).collect()
    ids = {v for r in pairs for v in (r["vec_a"], r["vec_b"])}
    assert 0 not in ids and 1 not in ids
    for r in pairs:
        assert r["cos_sim"] == r["cos_sim"]  # no NaN survives


def test_temperature_mix_survives_colliding_column_names(spark):
    """An input that itself has threshold/n_rows/stratum columns joins
    cleanly (internal _mix_* aliases) and passes through unchanged
    (ADVICE r7)."""
    from firebolt_spark.operators import mixture

    df = spark.createDataFrame(
        [(i, "a" if i % 3 else "b", i * 10, 7, "keepme")
         for i in range(30)],
        "doc_id BIGINT, src STRING, threshold BIGINT, n_rows BIGINT, "
        "stratum STRING",
    )
    kept = mixture.temperature_mix(df, "src", "doc_id", alpha=1.0)
    assert kept.columns == df.columns  # user columns intact
    assert kept.count() == 30  # alpha=1 keeps everything
    assert kept.filter(F.col("stratum") == "keepme").count() == 30


def test_dedup_spans_overlap_catches_offset_shifted_passage(spark):
    """The VERDICT r7 'Next #1' property: a passage duplicated at a
    +1-word offset re-tiles under fixed windows (dedup_spans misses it)
    but produces identical OVERLAPPING windows, so dedup_spans_overlap
    removes it from the later document — and only it."""
    from firebolt_spark.operators.dedup import dedup_spans, dedup_spans_overlap

    P = "P1 P2 P3 P4 P5"
    docs = spark.createDataFrame(
        [(0, f"x1 x2 {P} y1"),
         (1, f"z1 z2 z3 {P} w1"),  # same passage, +1 word offset
         (2, "totally unrelated words here")],
        ["doc_id", "text"],
    )
    tiled = {r["doc_id"]: r["text_dedup"]
             for r in dedup_spans(docs, span_words=3).collect()}
    assert tiled[1] == f"z1 z2 z3 {P} w1"  # fixed tiles MISS the shift
    out = {r["doc_id"]: (r["n_words"], r["n_kept"], r["text_dedup"])
           for r in dedup_spans_overlap(docs, span_words=3).collect()}
    assert out[0] == (8, 8, f"x1 x2 {P} y1")   # first occurrence intact
    assert out[1] == (9, 4, "z1 z2 z3 w1")     # passage scrubbed, rest kept
    assert out[2] == (4, 4, "totally unrelated words here")


def test_dedup_spans_overlap_keep_first_within_doc_and_short_docs(spark):
    """A self-repeated phrase keeps only its first copy; documents
    shorter than span_words dedup as whole-text windows; NULL text
    behaves like empty text."""
    from firebolt_spark.operators.dedup import dedup_spans_overlap

    docs = spark.createDataFrame(
        [(0, "a b c x y a b c"),   # self-repeat at +5 offset
         (1, "tiny"),              # shorter than k
         (2, "tiny"),              # exact dup of a short doc
         (3, None)],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: (r["n_kept"], r["text_dedup"])
           for r in dedup_spans_overlap(docs, span_words=3).collect()}
    assert out[0] == (5, "a b c x y")          # second 'a b c' removed
    assert out[1] == (1, "tiny")               # first occurrence kept
    assert out[2] == (0, "")                   # later short dup scrubbed
    assert out[3][1] == ""                     # NULL == empty


def test_winnow_fingerprints_guarantee_and_density(spark):
    """Winnowing guarantee (Schleimer et al. 2003): documents sharing a
    passage of >= window + span_words - 1 words share at least one
    fingerprint at ANY offset; and the winnowed index is materially
    smaller than the full overlapping-gram set."""
    from firebolt_spark.operators.dedup import doc_windows, winnow_fingerprints

    k, w = 3, 4
    shared = " ".join(f"s{i}" for i in range(k + w - 1))  # exactly the bound
    docs = spark.createDataFrame(
        [(0, f"a1 a2 a3 {shared} a4"),
         (1, f"b1 {shared} b2 b3 b4 b5"),  # different offset
         (2, " ".join(f"u{i}" for i in range(40)))],
        ["doc_id", "text"],
    )
    fps = winnow_fingerprints(docs, span_words=k, window=w)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert by_doc[0] & by_doc[1], "offset-shifted shared passage must collide"
    assert not (by_doc[2] & (by_doc[0] | by_doc[1]))
    n_grams = doc_windows(docs, k).count()
    assert fps.count() < n_grams  # the index-compression point


def test_external_query_vectors_match_in_corpus_queries(spark, sf_dir):
    """query_vectors on the in-memory ANN paths (round 9 — the serving
    symmetry of the index probes' VERDICT r8 #7): an external literal
    equal to an indexed vector retrieves that vector's exact top-k on
    every path (bruteforce / LSH single-table / LSH multi-table / IVF)
    — minus the self-hit, which keys on the query id."""
    from firebolt_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vec0 = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]]
    paths = {
        "bruteforce": lambda ids, qv, k: S.cosine_topk(
            emb, ids, k=k, query_vectors=qv),
        "lsh1": lambda ids, qv, k: S.ann_lsh_topk(
            emb, ids, k=k, planes=3, tables=1, probes=2, query_vectors=qv),
        "lshN": lambda ids, qv, k: S.ann_lsh_topk(
            emb, ids, k=k, planes=3, tables=2, probes=2, query_vectors=qv),
        "ivf": lambda ids, qv, k: S.ann_ivf_topk(
            emb, ids, k=k, n_centroids=4, n_probe=2, query_vectors=qv),
    }
    for name, fn in paths.items():
        ref = {(r["vec_id"], r["cos_sim"])
               for r in fn([0], None, 10).collect()}
        ext = {(r["vec_id"], r["cos_sim"])
               for r in fn(None, [(-1, vec0)], 11).collect()
               if r["vec_id"] != 0}
        assert ext == ref and ref, name
        # mixing in-corpus ids and external literals in one call
        both = fn([5], [(-1, vec0)], 3).collect()
        assert {r["query_id"] for r in both} == {5, -1}, name


def test_ivf_assignment_string_ids_take_window_path(spark, sf_dir):
    """A STRING id_col (the operators accept any id column, and cluster
    ids are seeded from it) cannot ride the in-row -cluster negation —
    unary minus on a string yields NULL and would collapse every
    assignment into one NULL cluster. The numeric-check fallback keeps
    the legacy window path: assignments are non-null and identical to
    the numeric-id run on the same vectors (round-9 review)."""
    from firebolt_spark.operators.similarity import ivf_assign

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    as_str = emb.select(
        F.format_string("id%05d", F.col("vec_id")).alias("vec_id"),
        "embedding",
    )
    got_s, _ = ivf_assign(as_str, n_centroids=4, kmeans_iters=1)
    rows = got_s.select("vec_id", "cluster").collect()
    assert all(r["cluster"] is not None for r in rows)
    got_n, _ = ivf_assign(emb, n_centroids=4, kmeans_iters=1)
    num = {r["vec_id"]: r["cluster"] for r in
           got_n.select("vec_id", "cluster").collect()}
    # same vectors, same seeding order (string sort 'id00000'.. matches
    # numeric order by construction) -> identical partition
    by_str = {int(r["vec_id"][2:]): int(r["cluster"][2:]) for r in rows}
    assert by_str == num


def test_query_sources_explicit_vector_wins(spark, sf_dir):
    """An id passed in BOTH query_ids and query_vectors resolves to the
    explicit vector — one query row, not two mixed window partitions
    (round-9 review)."""
    from firebolt_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vec5 = [float(x) for x in
            emb.filter(F.col("vec_id") == 5).collect()[0]["embedding"]]
    both = cosine_topk(emb, query_ids=[0], k=5,
                       query_vectors=[(0, vec5)]).collect()
    only_ext = cosine_topk(emb, k=5, query_vectors=[(0, vec5)]).collect()
    key = lambda rows: {(r["query_id"], r["vec_id"], r["cos_sim"], r["rnk"])
                        for r in rows}
    assert key(both) == key(only_ext)
    assert len(both) == 5  # exactly one window partition for id 0


def test_dedup_spans_candidates_matches_unrestricted_on_long_dups(spark):
    """The winnow→exact composition (VERDICT r8 'Next #3'): when every
    cross-doc duplication is >= window + span_words - 1 words, the
    winnowing guarantee makes all involved docs candidates and the
    restricted pass equals dedup_spans_overlap row-for-row — including
    within-doc self-repeats (the in-row pre-distinct check) and NULL
    text."""
    from firebolt_spark.operators.dedup import (
        dedup_spans_candidates, dedup_spans_overlap,
    )

    k, w = 3, 2
    long_dup = " ".join(f"d{i}" for i in range(k + w - 1))
    docs = spark.createDataFrame(
        [(0, f"a1 a2 {long_dup} a3"),
         (1, f"b1 {long_dup} b2 b3"),        # same passage, shifted
         (2, " ".join(f"u{i}" for i in range(20))),   # unique
         (3, "p q r s p q r s p q r s"),     # internal self-repeat
         (4, None)],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["n_words"], r["n_kept"], r["text_dedup"])
           for r in dedup_spans_candidates(docs, span_words=k, window=w)
           .collect()}
    ref = {r["doc_id"]: (r["n_words"], r["n_kept"], r["text_dedup"])
           for r in dedup_spans_overlap(docs, span_words=k).collect()}
    assert got == ref
    assert got[2][1] == got[2][0]  # unique doc passes through whole
    assert got[3][1] < got[3][0]   # self-repeat caught via pre-distinct


def test_dedup_spans_candidates_guarantee_at_every_offset(spark):
    """The winnowing guarantee as a sweep: a passage of exactly
    window + span_words - 1 words (the bound) duplicated at EVERY word
    offset 0..6 of an otherwise-unique document is flagged and removed
    — the composed pass equals the unrestricted pass for every shift,
    so offset robustness survives the candidate restriction."""
    from firebolt_spark.operators.dedup import (
        dedup_spans_candidates, dedup_spans_overlap,
    )

    k, w = 3, 2
    passage = " ".join(f"p{i}" for i in range(w + k - 1))  # 4 words
    rows = [(0, f"base0 base1 {passage} base2")]
    for off in range(7):
        prefix = " ".join(f"u{off}_{j}" for j in range(off))
        body = f"{prefix} {passage}".strip() + f" t{off}_a t{off}_b"
        rows.append((off + 1, body))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_kept"], r["text_dedup"])
           for r in dedup_spans_candidates(docs, span_words=k, window=w)
           .collect()}
    ref = {r["doc_id"]: (r["n_kept"], r["text_dedup"])
           for r in dedup_spans_overlap(docs, span_words=k).collect()}
    assert got == ref
    for off in range(7):
        n_kept, text = got[off + 1]
        assert passage not in text, f"offset {off} survived"


def test_dedup_spans_candidates_containment_on_fixture(spark, sf_dir):
    """On the real fixture the restriction may MISS duplicates shorter
    than window + span_words - 1 words but can never remove more than
    the unrestricted pass: per-doc n_kept is bounded below by
    dedup_spans_overlap's, and every doc the composition scrubs is
    scrubbed identically (restricted winners are a competition among a
    SUBSET of docs, so a doc's removed set can only shrink)."""
    from firebolt_spark.operators.dedup import (
        dedup_spans_candidates, dedup_spans_overlap,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    got = {r["doc_id"]: r["n_kept"]
           for r in dedup_spans_candidates(docs, span_words=3, window=4)
           .collect()}
    ref = {r["doc_id"]: r["n_kept"]
           for r in dedup_spans_overlap(docs, span_words=3).collect()}
    assert got.keys() == ref.keys()
    assert all(got[d] >= ref[d] for d in got)
    # the fixture's duplication is long-passage-heavy: the composition
    # must find the overwhelming majority of removable words
    removed_got = sum(1 for d in got if got[d] < ref[d])
    assert removed_got <= len(got) * 0.05


def test_shingle_index_matches_in_session_and_survives_replay(spark, sf_dir, wh_table):
    """VERDICT r10 'Next #3': ngram_jaccard_pairs(shingle_index=) must
    return the identical pair set (the artifact is the same inverted
    index, bucketed), build+append must equal one full build, and a
    REPLAYED append (at-least-once ingestion) must not corrupt Jaccard
    counts — the defensive exchange-free dedup on the index read."""
    from firebolt_spark.operators.dedup import (
        append_shingle_index, build_shingle_index, ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    key = lambda df: {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
                      for r in df.collect()}
    tbl = wh_table("t_sh_idx")
    build_shingle_index(base, tbl, num_buckets=8)
    append_shingle_index(delta, tbl)
    ref = key(ngram_jaccard_pairs(docs, max_df=0.5))
    assert key(ngram_jaccard_pairs(
        docs, max_df=0.5, shingle_index=tbl
    )) == ref
    # replayed append: duplicate (doc_id, sh) rows land in storage,
    # results must stay exact
    append_shingle_index(delta, tbl)
    assert key(ngram_jaccard_pairs(
        docs, max_df=0.5, shingle_index=tbl
    )) == ref


def test_shingle_index_dedup_only_after_append(spark, sf_dir, wh_table):
    """Round-11 sf10 finding: the defensive (doc_id, sh) dedup ran on
    EVERY consumer of the index — four full-table aggregates per pairs
    job — even for build-only tables, which are duplicate-free by
    construction (shingle_table's per-row array_distinct). The
    firebolt.appended property now gates it: set by the first append
    (which may be an at-least-once replay), absent on a fresh build."""
    from firebolt_spark.operators.dedup import (
        _shingle_index_props, append_shingle_index, build_shingle_index,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    tbl = wh_table("t_sh_flag")
    build_shingle_index(base, tbl, num_buckets=8)
    assert "firebolt.appended" not in _shingle_index_props(spark, tbl)
    clean = plan(ngram_jaccard_pairs(
        base, max_df=0.5, shingle_index=tbl
    ))
    append_shingle_index(delta, tbl)
    assert _shingle_index_props(spark, tbl)["firebolt.appended"] == "1"
    deduped = plan(ngram_jaccard_pairs(
        docs, max_df=0.5, shingle_index=tbl
    ))
    # the appended table's plan carries the per-consumer dedup
    # aggregates the build-only plan skips
    assert deduped.count("Aggregate") > clean.count("Aggregate")


def test_scratch_table_sweeps_dead_pids_only(spark):
    """Per-process scratch tables (ADVICE r11) would accumulate one
    orphan per dead driver/bench/pytest process forever; _scratch_table
    reaps tables whose owning pid is gone and NEVER touches a live
    process's table (a live pid may be mid-probe — the race the naming
    scheme exists to prevent)."""
    import os

    from firebolt_spark.queries.llm import _scratch_table

    from firebolt_spark.queries.llm import _proc_starttime

    my_st = _proc_starttime(os.getpid())
    assert my_st is not None  # Linux container
    init_st = _proc_starttime(1)
    dead = "fb_q_minhash_idx_999999_sig"  # legacy name, pid gone
    # pid 1 is ALIVE: with its real starttime (or the legacy pid-only
    # name) the table must survive; with a wrong starttime the pid was
    # RECYCLED and the table must be reaped (VERDICT r12 Next #7a)
    live_legacy = "fb_q_minhash_idx_1_sig"
    live_stamped = f"fb_q_minhash_idx_1_{init_st}_sig"
    recycled = f"fb_q_minhash_idx_1_{init_st + 7}_sig"
    # our own pid but a PREVIOUS incarnation's starttime — also reaped
    prev_self = f"fb_q_minhash_idx_{os.getpid()}_{my_st - 50}_sig"
    mine = f"fb_q_minhash_idx_{os.getpid()}_{my_st}_sig"
    all_tables = (dead, live_legacy, live_stamped, recycled, prev_self, mine)
    for t in all_tables:
        spark.range(2).write.mode("overwrite").saveAsTable(t)
    try:
        tbl = _scratch_table("minhash_idx", spark)
        assert tbl == f"fb_q_minhash_idx_{os.getpid()}_{my_st}"
        assert not spark.catalog.tableExists(dead)
        assert not spark.catalog.tableExists(recycled)
        assert not spark.catalog.tableExists(prev_self)
        assert spark.catalog.tableExists(live_legacy)
        assert spark.catalog.tableExists(live_stamped)
        assert spark.catalog.tableExists(mine)
    finally:
        for t in all_tables:
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_shingle_index(spark, sf_dir, wh_table):
    """compact_shingle_index (round 12 — VERDICT r11 Next #4): after a
    replayed append, the table holds duplicate rows and every consumer
    pays the defensive dedup aggregate. Compaction rewrites
    duplicate-free, clears the flag, and the consumer plan drops back
    to the build-only shape — with BIT-IDENTICAL results. Idempotent:
    a second compact is a no-op."""
    from firebolt_spark.operators.dedup import (
        _shingle_index_props, append_shingle_index, build_shingle_index,
        compact_shingle_index, ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    def key(df):
        return {(r["doc_a"], r["doc_b"], round(r["jaccard"], 9))
                for r in df.collect()}

    tbl = wh_table("t_sh_compact")
    try:
        build_shingle_index(base, tbl, num_buckets=8)
        clean_aggs = plan(
            ngram_jaccard_pairs(base, max_df=0.5, shingle_index=tbl)
        ).count("Aggregate")
        append_shingle_index(delta, tbl)
        append_shingle_index(delta, tbl)  # at-least-once replay
        total = spark.table(tbl).count()
        distinct = spark.table(tbl).distinct().count()
        assert total > distinct  # duplicates physically present
        ref = key(ngram_jaccard_pairs(docs, max_df=0.5, shingle_index=tbl))

        compact_shingle_index(spark, tbl)
        props = _shingle_index_props(spark, tbl)
        assert "firebolt.appended" not in props
        assert props["firebolt.ngram_n"] == "3"  # build params preserved
        assert spark.table(tbl).count() == distinct  # storage reclaimed
        post = ngram_jaccard_pairs(docs, max_df=0.5, shingle_index=tbl)
        # the per-consumer dedup aggregate is GONE from the plan...
        assert plan(post).count("Aggregate") == clean_aggs
        # ...and the results are bit-identical to the flagged read
        assert key(post) == ref
        # no swap leftovers; rerun is a no-op
        assert not spark.catalog.tableExists(f"{tbl}_cstage")
        assert not spark.catalog.tableExists(f"{tbl}_cold")
        compact_shingle_index(spark, tbl)
        assert key(ngram_jaccard_pairs(
            docs, max_df=0.5, shingle_index=tbl
        )) == ref
    finally:
        for t in (f"{tbl}_cstage", f"{tbl}_cold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_aborts_on_concurrent_append(spark, sf_dir, wh_table, monkeypatch):
    """The compaction gen-guard (ADVICE r12): an append landing after
    the compaction's snapshot read bumps firebolt.append_gen, and the
    pre-swap re-check ABORTS the swap (stage dropped, flagged table
    untouched) instead of silently presenting a table missing the
    appended rows with the flag cleared. The contract stays
    single-writer; the guard makes a violation loud. Appends stamp the
    gen TWICE (flag-first before the write, gen-last after it) so a
    compaction that snapshotted mid-write also sees the change — the
    pre-write stamp alone would leave the whole write duration
    undetectable."""
    import pytest as _pytest

    from firebolt_spark.operators import dedup as dedup_mod
    from firebolt_spark.operators.dedup import (
        _compact_table, _shingle_index_props, append_shingle_index,
        build_shingle_index,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(60)
    tbl = wh_table("t_sh_race")
    try:
        build_shingle_index(docs.limit(40), tbl, num_buckets=4)
        append_shingle_index(docs.limit(10), tbl)
        stale_gen = _shingle_index_props(spark, tbl)["firebolt.append_gen"]
        # a second append lands "mid-compaction" — fresh gen
        append_shingle_index(docs.limit(5), tbl)
        before = spark.table(tbl).count()
        with _pytest.raises(RuntimeError, match="concurrent append"):
            _compact_table(
                spark, tbl,
                dedup_cols=["doc_id", "sh"], bucket_cols=["sh"],
                sort_cols=["sh"],
                stage_props={"firebolt.ngram_n": "3"},
                gen_guard=(tbl, stale_gen),
            )
        props = _shingle_index_props(spark, tbl)
        assert props.get("firebolt.appended") == "1"  # flag intact
        assert spark.table(tbl).count() == before     # rows intact
        assert not spark.catalog.tableExists(f"{tbl}_cstage")
        assert not spark.catalog.tableExists(f"{tbl}_cold")
        # gen-last: one append stamps twice — flag-first (crash
        # safety), then again after the write (guard coverage for a
        # compaction that snapshotted mid-write)
        stamps = []
        real_stamp = dedup_mod._stamp_appended

        def counting(s, t):
            stamps.append(t)
            real_stamp(s, t)

        monkeypatch.setattr(dedup_mod, "_stamp_appended", counting)
        pre_gen = _shingle_index_props(spark, tbl)["firebolt.append_gen"]
        append_shingle_index(docs.limit(3), tbl)
        monkeypatch.setattr(dedup_mod, "_stamp_appended", real_stamp)
        assert stamps == [tbl, tbl]
        assert (
            _shingle_index_props(spark, tbl)["firebolt.append_gen"]
            != pre_gen
        )

        # with the CURRENT gen the compact goes through
        from firebolt_spark.operators.dedup import compact_shingle_index

        compact_shingle_index(spark, tbl)
        assert "firebolt.appended" not in _shingle_index_props(spark, tbl)
    finally:
        for t in (f"{tbl}_cstage", f"{tbl}_cold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_minhash_index(spark, sf_dir, wh_table):
    """The MinHash twin: both tables rewritten duplicate-free (_bands
    first — the flag on _sig clears last), parameters preserved and
    still validated, probe matches bit-identical."""
    from firebolt_spark.operators.dedup import (
        _minhash_index_props, append_minhash_index, build_minhash_index,
        compact_minhash_index, incremental_near_dups,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 3 != 0).limit(120)
    newb = docs.filter(F.col("doc_id") % 3 == 0).limit(30)
    tbl = wh_table("t_mh_compact")
    try:
        build_minhash_index(base, tbl)
        matches, new_sigs = incremental_near_dups(newb, index_table=tbl)
        new_sigs = new_sigs.localCheckpoint()
        append_minhash_index(new_sigs, tbl)
        append_minhash_index(new_sigs, tbl)  # replay
        sig_total = spark.table(f"{tbl}_sig").count()
        sig_distinct = spark.table(f"{tbl}_sig").distinct().count()
        assert sig_total > sig_distinct
        ref = {tuple(r) for r in incremental_near_dups(
            newb, index_table=tbl
        )[0].collect()}

        compact_minhash_index(spark, tbl)
        props = _minhash_index_props(spark, tbl)
        assert "firebolt.appended" not in props
        assert "firebolt.minhash_k" in props  # params preserved
        assert spark.table(f"{tbl}_sig").count() == sig_distinct
        bands = spark.table(f"{tbl}_bands")
        assert bands.count() == bands.distinct().count()
        got = {tuple(r) for r in incremental_near_dups(
            newb, index_table=tbl
        )[0].collect()}
        assert got == ref
        compact_minhash_index(spark, tbl)  # no-op rerun
    finally:
        for t in (
            f"{tbl}_sig", f"{tbl}_bands",
            f"{tbl}_sig_cstage", f"{tbl}_sig_cold",
            f"{tbl}_bands_cstage", f"{tbl}_bands_cold",
        ):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_compact_swap_crash_recovery(spark, sf_dir, wh_table):
    """Every compaction crash window recovers on the next call: an
    orphaned stage beside an intact target is discarded (stale), and
    the between-renames window (target absent, compacted stage
    complete) is promoted — never a lost or duplicate-presented
    table."""
    from firebolt_spark.functions import write_bucketed
    from firebolt_spark.operators.dedup import (
        _shingle_index_props, append_shingle_index, build_shingle_index,
        compact_shingle_index, shingle_table,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(60)
    tbl = wh_table("t_sh_crash")
    try:
        build_shingle_index(docs, tbl, num_buckets=4)
        append_shingle_index(docs.limit(10), tbl)
        expect = spark.table(tbl).distinct().count()

        # window A: crash after the stage write, before any rename —
        # target intact + flagged; the stale stage must be dropped and
        # compaction still complete
        write_bucketed(
            spark.table(tbl).dropDuplicates(["doc_id", "sh"]),
            f"{tbl}_cstage", ["sh"], num_buckets=4, sort_cols=["sh"],
        )
        compact_shingle_index(spark, tbl)
        assert "firebolt.appended" not in _shingle_index_props(spark, tbl)
        assert spark.table(tbl).count() == expect

        # window B: crash between the renames — target name absent,
        # the compacted stage holds the complete data
        spark.sql(f"ALTER TABLE {tbl} RENAME TO {tbl}_cold")
        spark.sql(f"ALTER TABLE {tbl}_cold RENAME TO {tbl}_cstage")
        # (state: only _cstage exists, carrying the full compacted set)
        compact_shingle_index(spark, tbl)
        assert spark.catalog.tableExists(tbl)
        assert not spark.catalog.tableExists(f"{tbl}_cstage")
        assert spark.table(tbl).count() == expect
        assert "firebolt.ngram_n" in _shingle_index_props(spark, tbl)
    finally:
        for t in (f"{tbl}_cstage", f"{tbl}_cold"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_shingle_index_width_guard(spark, sf_dir, wh_table):
    """A mismatched-n index or a foreign table without the width
    property silently changes the metric — both refuse."""
    import pytest

    from firebolt_spark.operators.dedup import (
        build_shingle_index, ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    guard, foreign = wh_table("t_sh_guard"), wh_table("t_sh_foreign")
    build_shingle_index(docs.limit(20), guard, n=2, num_buckets=4)
    with pytest.raises(ValueError, match="n=2"):
        ngram_jaccard_pairs(docs, n=3, shingle_index=guard)
    docs.limit(5).select(
        "doc_id", F.col("text").alias("sh")
    ).write.saveAsTable(foreign)
    with pytest.raises(ValueError, match="ngram_n"):
        ngram_jaccard_pairs(docs, shingle_index=foreign)


def test_winnow_index_probe_bit_identical_and_skips_recompute(spark, sf_dir, tmp_path):
    """VERDICT r10 'Next #1': dedup_spans_candidates(index_path=) must
    return BIT-IDENTICAL results to the in-op path (the index is the
    same fp_rows, materialized), and its plan must read the index
    parquet instead of re-running the winnow — no array_min (the
    winnow's min-selector, unique to it) anywhere, the index location
    in its place."""
    from firebolt_spark.operators.dedup import (
        build_winnow_index, dedup_spans_candidates,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "winnow_idx")
    build_winnow_index(docs, path, span_words=3, window=4)

    indexed = dedup_spans_candidates(
        docs, span_words=3, window=4, index_path=path
    )
    plan = indexed._jdf.queryExecution().optimizedPlan().toString()
    assert "array_min" not in plan, "index probe must not re-winnow"
    # the index parquet scans are column-pruned: fingerprint:bigint in a
    # scan ReadSchema only occurs when the artifact is being read (the
    # in-op path has no scan producing a fingerprint column; BIGINT is
    # the r18 60-bit format)
    assert "fingerprint:bigint" in plan, "index scan missing from the plan"
    assert "EqualTo(_self_dup,true)" in plan, (
        "self-dup branch must push its filter into the index scan"
    )
    inop = dedup_spans_candidates(docs, span_words=3, window=4)
    assert "array_min" in inop._jdf.queryExecution().optimizedPlan().toString()

    key = lambda df: {
        r["doc_id"]: (r["n_words"], r["n_kept"], r["text_dedup"])
        for r in df.collect()
    }
    assert key(indexed) == key(inop)


def test_winnow_index_append_equals_rebuild_and_replay_idempotent(
    spark, sf_dir, tmp_path
):
    """Ingest-loop contract: build on the base corpus + append the
    delta == one build over the union (same probe result), and a
    replayed batch_id is a no-op (the _batches sidecar)."""
    from firebolt_spark.operators.dedup import (
        append_winnow_index, build_winnow_index, dedup_spans_candidates,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)

    inc = str(tmp_path / "winnow_inc")
    build_winnow_index(base, inc, span_words=3, window=4)
    append_winnow_index(delta, inc, batch_id=7)
    full = str(tmp_path / "winnow_full")
    build_winnow_index(docs, full, span_words=3, window=4)

    key = lambda df: {r["doc_id"]: (r["n_kept"], r["text_dedup"])
                      for r in df.collect()}
    assert key(
        dedup_spans_candidates(docs, span_words=3, window=4, index_path=inc)
    ) == key(
        dedup_spans_candidates(docs, span_words=3, window=4, index_path=full)
    )

    # replay: same batch_id appends nothing
    n_before = spark.read.parquet(inc).count()
    append_winnow_index(delta, inc, batch_id=7)
    assert spark.read.parquet(inc).count() == n_before


def test_winnow_index_append_crash_window_no_duplicates(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The winnow append inherits the staged commit protocol: a crash
    after the fingerprint files land but before the _batches record is
    written replays to exactly-once rows (the replay purges the crashed
    attempt's batch-tagged files first)."""
    import pytest

    from firebolt_spark.operators import similarity as sim
    from firebolt_spark.operators.dedup import (
        append_winnow_index, build_winnow_index,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)

    p = str(tmp_path / "winnow")
    build_winnow_index(base, p, span_words=3, window=4)
    full_ref = str(tmp_path / "winnow_ref")
    build_winnow_index(docs, full_ref, span_words=3, window=4)
    expected = spark.read.parquet(full_ref).count()

    real_record = sim._record_batch
    monkeypatch.setattr(sim, "_record_batch", lambda *a: (_ for _ in ()).throw(
        RuntimeError("injected crash before the _batches record")
    ))
    with pytest.raises(RuntimeError, match="injected crash"):
        append_winnow_index(delta, p, batch_id=3)
    monkeypatch.setattr(sim, "_record_batch", real_record)
    append_winnow_index(delta, p, batch_id=3)
    # exactly-once: base + delta == one build over the union, despite
    # the crashed first attempt having already moved its files in
    assert spark.read.parquet(p).count() == expected
    append_winnow_index(delta, p, batch_id=3)  # recorded: no-op
    assert spark.read.parquet(p).count() == expected


def test_winnow_index_meta_guards(spark, sf_dir, tmp_path):
    """The sidecar guard rail set: probe with mismatched build
    parameters refuses (granularity would silently change — the LSH
    planes-mismatch lesson), a foreign id column refuses, and
    append to a path with no _meta (broken/partial build) refuses."""
    import pytest

    from firebolt_spark.operators.dedup import (
        append_winnow_index, build_winnow_index, dedup_spans_candidates,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "winnow_meta")
    build_winnow_index(docs, path, span_words=3, window=4)

    with pytest.raises(ValueError, match="span_words"):
        dedup_spans_candidates(
            docs, span_words=4, window=4, index_path=path
        )
    with pytest.raises(ValueError, match="id_col"):
        append_winnow_index(
            docs.withColumnRenamed("doc_id", "other_id"), path,
            id_col="other_id",
        )
    with pytest.raises(ValueError, match="_meta"):
        append_winnow_index(docs, str(tmp_path / "nonexistent_idx"))


def test_semantic_near_dups_multi_assign_recall_gate(spark):
    """Round-8 gate (VERDICT r7 'Next #6'): SemDeDup's cluster
    restriction loses boundary pairs — measured recall at sf0.01,
    thr=0.35, 16 clusters is ~0.27 single-assignment. n_assign=2
    (top-2 cluster candidate generation) recovers it to ~0.63; gate at
    >= 0.5 so the multi-assign path can never silently regress. Also
    pins the containment ladder: pairs(m=1) subset of pairs(m=2)
    subset of exact pairs (same centroids, wider candidates, never
    false positives)."""
    from firebolt_spark.operators.similarity import (
        dot_fold, norm, semantic_near_dups,
    )

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings").select(
        "vec_id", "embedding")
    thr = 0.35
    c = emb.select("vec_id", "embedding", norm("embedding").alias("_n"))
    a, b = c.alias("a"), c.alias("b")
    cos = F.round(dot_fold("a.embedding", "b.embedding")
                  / (F.col("a._n") * F.col("b._n")), 4)
    truth = {(r["va"], r["vb"]) for r in
             a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
             .select(F.col("a.vec_id").alias("va"),
                     F.col("b.vec_id").alias("vb"), cos.alias("c"))
             .filter(F.col("c") >= thr).collect()}
    m1 = {(r["vec_a"], r["vec_b"]) for r in
          semantic_near_dups(emb, threshold=thr, n_centroids=16).collect()}
    m2_rows = semantic_near_dups(
        emb, threshold=thr, n_centroids=16, n_assign=2).collect()
    m2 = {(r["vec_a"], r["vec_b"]) for r in m2_rows}
    assert len(m2_rows) == len(m2)  # cross-cluster discoveries deduped
    assert m1 <= m2 <= truth
    assert len(m2) / len(truth) >= 0.5, f"recall {len(m2)/len(truth):.3f}"


def test_minhash_index_matches_in_memory_and_survives_replay(
    spark, sf_dir, wh_table
):
    """Round 11: incremental_near_dups(index_table=) probes a
    build_minhash_index artifact instead of an in-memory signature
    DataFrame — the match set must be identical, a build+append must
    equal one full build, and a REPLAYED append (at-least-once
    ingestion) must not duplicate match rows (the appended-gated
    signature dedup)."""
    from firebolt_spark.operators.dedup import (
        append_minhash_index, build_minhash_index, incremental_near_dups,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = docs.filter(F.col("doc_id") % 2 == 0)
    delta = docs.filter(F.col("doc_id") % 2 == 1)
    new_docs = docs.filter(F.col("doc_id") < 20).withColumn(
        "doc_id", F.col("doc_id") + 2000000
    )
    key = lambda df: {  # noqa: E731
        (r["new_doc_id"], r["index_doc_id"], round(r["est_jaccard"], 9))
        for r in df.collect()
    }
    ref, _ = incremental_near_dups(new_docs, minhash_signatures(docs))
    ref_key = key(ref)

    tbl = wh_table("t_mh_idx")
    try:
        build_minhash_index(base, tbl, num_buckets=8)
        delta_sig = minhash_signatures(delta).persist()
        append_minhash_index(delta_sig, tbl)
        got, _ = incremental_near_dups(new_docs, index_table=tbl)
        assert key(got) == ref_key
        # replayed append: duplicate signature + band rows land in
        # storage, the match multiset must stay exact
        append_minhash_index(delta_sig, tbl)
        replayed, _ = incremental_near_dups(new_docs, index_table=tbl)
        assert replayed.count() == len(ref_key)
        assert key(replayed) == ref_key
        delta_sig.unpersist()
    finally:
        # wh_table drops the minted name; the artifact's two suffixed
        # tables need their own cleanup
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_sig")
        spark.sql(f"DROP TABLE IF EXISTS {tbl}_bands")


def test_minhash_index_parameter_and_foreign_guards(spark, sf_dir, wh_table):
    """A mismatched (k, bands) call, a foreign table without the
    properties, and an ambiguous in-memory+on-disk call all refuse —
    a silent mismatch would change the band agreement probability."""
    import pytest

    from firebolt_spark.operators.dedup import (
        build_minhash_index, incremental_near_dups, minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    small = docs.limit(20)
    tbl = wh_table("t_mh_guard")
    foreign = wh_table("t_mh_foreign")
    try:
        build_minhash_index(small, tbl, num_buckets=4)
        with pytest.raises(ValueError, match="bands=16"):
            incremental_near_dups(small, index_table=tbl, bands=16)
        small.write.saveAsTable(f"{foreign}_sig")
        with pytest.raises(ValueError, match="minhash_k"):
            incremental_near_dups(small, index_table=foreign)
        with pytest.raises(ValueError, match="exactly one"):
            incremental_near_dups(
                small, minhash_signatures(small), index_table=tbl
            )
        with pytest.raises(ValueError, match="exactly one"):
            incremental_near_dups(small)
    finally:
        for t in (f"{tbl}_sig", f"{tbl}_bands", f"{foreign}_sig"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_text_index_stats_profiles_both_artifact_kinds(spark, sf_dir, wh_table):
    """text_index_stats (round 11): the cap/reindex-decision profile
    for the warehouse-table text indexes — shingle df counts on a
    build_shingle_index table, band-bucket population on a
    build_minhash_index artifact — with true counts, an exchange-free
    aggregate on the bucket layout, and foreign-table refusal."""
    import pytest

    from firebolt_spark.operators.dedup import (
        build_minhash_index, build_shingle_index, shingle_table,
        text_index_stats,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sh_tbl, mh_tbl = wh_table("t_stats_sh"), wh_table("t_stats_mh")
    build_shingle_index(docs, sh_tbl, num_buckets=8)
    try:
        build_minhash_index(docs, mh_tbl, num_buckets=8)

        stats = text_index_stats(spark, sh_tbl)
        assert stats.columns == ["sh", "n_docs"]
        # true df: the profile must agree with a direct count over the
        # same inverted index
        top = stats.first()
        direct = (
            shingle_table(docs)
            .filter(F.col("sh") == top["sh"])
            .count()
        )
        assert top["n_docs"] == direct
        # the aggregate runs on the bucket clustering: no hash Exchange
        plan = stats._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan

        mh_stats = text_index_stats(spark, mh_tbl)
        assert mh_stats.columns == ["band", "band_hash", "n_docs"]
        # every doc emits one row per band: totals must add up
        n_docs = docs.filter(F.col("text").isNotNull()).count()
        total = mh_stats.agg(F.sum("n_docs")).first()[0]
        from firebolt_spark.operators.dedup import N_BANDS

        assert total == n_docs * N_BANDS
        mh_plan = mh_stats._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in mh_plan
    finally:
        for t in (f"{mh_tbl}_sig", f"{mh_tbl}_bands"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    with pytest.raises(ValueError, match="neither"):
        text_index_stats(spark, wh_table("t_stats_none"))


def test_text_index_stats_profiles_winnow_path(spark, sf_dir, tmp_path):
    """text_index_stats over a build_winnow_index PATH: the fingerprint
    sharing profile (distinct docs per fingerprint) — the signal that a
    boilerplate span is about to degenerate candidate discovery — with
    true counts and refusal of a parquet directory without the _meta
    sidecar."""
    import pytest

    from firebolt_spark.operators.dedup import (
        build_winnow_index, text_index_stats, winnow_fingerprints,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    path = str(tmp_path / "winnow_stats_idx")
    build_winnow_index(docs, path, span_words=3, window=4)

    stats = text_index_stats(spark, path)
    assert stats.columns == ["fingerprint", "n_docs"]
    top = stats.first()
    # true sharing count: distinct docs carrying that fingerprint in
    # the public (already-distinct) fingerprint view
    direct = (
        winnow_fingerprints(docs, span_words=3, window=4)
        .filter(F.col("fingerprint") == top["fingerprint"])
        .count()
    )
    assert top["n_docs"] == direct

    plain = str(tmp_path / "plain_parquet")
    docs.limit(5).write.parquet(plain)
    with pytest.raises(ValueError, match="_meta"):
        text_index_stats(spark, plain)


def test_bmp_resize_nn_reference_and_identity_roundtrip(spark, sf_dir):
    """resize_media(decode_stub=False), round 11: the NN resample is
    bit-exact against an independent pure-Python reference (including
    the 4-byte row padding an arbitrary output width forces), an
    identity-dimension resize round-trips the pixel array byte-for-
    byte, the refreshed media_meta is truthful, and the output parses
    under the builtin SQL decoder with the new dimensions."""
    import hashlib
    import struct

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(40)
    media = multimodal.bmp_encode(docs)
    src = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}

    def ref_resize(payload, ow, oh):
        data_off = struct.unpack_from("<I", payload, 10)[0]
        w, h = struct.unpack_from("<ii", payload, 18)
        src_row = (3 * w + 3) // 4 * 4
        pix = payload[data_off:]
        dst_row = (3 * ow + 3) // 4 * 4
        out = bytearray(dst_row * oh)
        for j in range(oh):
            for i in range(ow):
                s = (j * h // oh) * src_row + 3 * (i * w // ow)
                d = j * dst_row + 3 * i
                out[d : d + 3] = pix[s : s + 3]
        return bytes(out)

    # width 6 → 18 pixel bytes + 2 pad bytes per row
    resized = multimodal.resize_media(media, 6, 3, decode_stub=False)
    for r in resized.collect():
        got = bytes(r["media"])
        assert got[54:] == ref_resize(src[r["doc_id"]], 6, 3)
        assert r["media_meta"]["n_bytes"] == len(got) == 54 + 20 * 3
        assert r["media_meta"]["sha"] == hashlib.sha256(got).hexdigest()
        assert r["media_meta"]["mime"] == "image/bmp"

    # the resized payload is a valid BMP for the builtin decoder
    dec = multimodal.bmp_decode(resized)
    for r in dec.select("width", "height", "n_pixel_bytes").collect():
        assert (r["width"], r["height"], r["n_pixel_bytes"]) == (6, 3, 60)

    # identity dims: pixel array byte-for-byte (header is normalized)
    one = media.filter(F.col("doc_id") == 7)
    pay = src[7]
    w, h = struct.unpack_from("<ii", pay, 18)
    ident = multimodal.resize_media(one, w, h, decode_stub=False).first()
    assert bytes(ident["media"])[54:] == pay[54:]


def test_wav_decode_known_samples_and_rejections():
    """INDEPENDENT known-answer check of the WAV codec (round 12): a
    minimal stereo PCM file assembled by hand (struct.pack, not our
    encoder) must decode to hand-computed mean/RMS in BOTH decoders;
    corrupt containers (bad magic, wrong bit depth, compressed format
    tag, truncation, odd data size) are refused, not mis-parsed."""
    import math
    import struct

    from firebolt_spark.operators.multimodal import _wav_decode_py

    samples = [100, -200, 300, -400, 32767, -32768]  # 3 frames stereo
    data = struct.pack("<6h", *samples)

    def wav(fmt=1, nch=2, rate=16000, bits=16, body=data):
        hdr = b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVE"
        hdr += b"fmt " + struct.pack(
            "<IHHIIHH", 16, fmt, nch, rate, rate * nch * bits // 8,
            nch * bits // 8, bits,
        )
        hdr += b"data" + struct.pack("<I", len(body))
        return hdr + body

    d = _wav_decode_py(wav())
    assert d is not None
    assert (d["n_channels"], d["sample_rate"], d["n_samples"]) == (2, 16000, 3)
    assert d["mean_pcm"] == round(sum(samples) / 6, 6)
    assert d["rms_pcm"] == round(
        math.sqrt(sum(v * v for v in samples) / 6), 6
    )

    assert _wav_decode_py(b"RIFX" + wav()[4:]) is None        # magic
    assert _wav_decode_py(wav(fmt=3)) is None                  # non-PCM
    # bits=8 became a SUPPORTED width in round 13 (see
    # test_wav_8bit_pcm_both_paths); 24-bit still refuses
    assert _wav_decode_py(wav(bits=24)) is None                # bit depth
    assert _wav_decode_py(wav()[:-2]) is None                  # truncated
    assert _wav_decode_py(wav(body=data[:-1])) is None         # odd size


def test_wav_builtin_decode_matches_pandas_decode(spark, sf_dir):
    """The two real WAV decode paths — the built-in hex-fold SQL
    expressions and the Arrow/pandas struct.unpack path — agree
    field-for-field over the fixture corpus, including the feature-
    schema mapping (width=channels, height=n_frames=samples,
    feature=[mean, rms, rate, duration])."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(60)
    media = multimodal.wav_encode(docs)
    builtin = {r["doc_id"]: r for r in multimodal.wav_decode(media).collect()}
    arrow = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            media, decode_stub=False
        ).collect()
    }
    assert set(builtin) == set(arrow) and len(builtin) == 60
    for doc_id, b in builtin.items():
        a = arrow[doc_id]
        assert a["width"] == b["n_channels"]
        assert a["height"] == a["n_frames"] == b["n_samples"]
        f = a["feature"]
        assert f[0] == b["mean_pcm"] and f[1] == b["rms_pcm"]
        assert f[2] == float(b["sample_rate"])
        assert f[3] == round(b["n_samples"] / b["sample_rate"], 6)
    # the builtin decoder NULLs out non-WAV payloads instead of erroring
    fake = multimodal.attach_media(docs.limit(3))
    for r in multimodal.wav_decode(fake).collect():
        assert r["n_channels"] is None and r["mean_pcm"] is None

    # fmt-tag refusal parity (ADVICE r12): a payload whose 'fmt ' tag
    # is corrupted but whose RIFF/WAVE/data magics are intact must be
    # refused by BOTH decode paths — r12's SQL path skipped the fmt
    # check and returned non-NULL stats where the pandas path refused
    import struct as _struct

    from firebolt_spark.operators.multimodal import _wav_decode_py

    body = _struct.pack("<4h", 1, -2, 3, -4)
    good = (
        b"RIFF" + _struct.pack("<I", 36 + len(body)) + b"WAVE"
        + b"fmt "
        + _struct.pack("<IHHIIHH", 16, 1, 2, 8000, 32000, 4, 16)
        + b"data" + _struct.pack("<I", len(body)) + body
    )
    bad = good[:12] + b"junk" + good[16:]
    assert _wav_decode_py(good) is not None and _wav_decode_py(bad) is None
    pair = spark.createDataFrame(
        [(1, bytearray(good)), (2, bytearray(bad))],
        "doc_id int, media binary",
    )
    got = {r["doc_id"]: r for r in multimodal.wav_decode(pair).collect()}
    assert got[1]["n_channels"] == 2 and got[1]["mean_pcm"] is not None
    assert got[2]["n_channels"] is None and got[2]["mean_pcm"] is None


def test_wav_resample_reference_and_identity(spark, sf_dir):
    """resample_audio(decode_stub=False): identity-rate resamples
    round-trip the interleaved sample array byte-for-byte, NN frame
    selection matches an independent reference at up- and down-sample
    rates (frames move whole — channels never mix), outputs re-parse
    under both decoders, meta is refreshed truthfully, and the stub /
    guard paths behave."""
    import hashlib
    import struct

    import pytest

    from firebolt_spark.operators.multimodal import _wav_decode_py

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(30)
    media = multimodal.wav_encode(docs)
    src = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}

    out = multimodal.resample_audio(media, 12000, decode_stub=False)
    for r in out.collect():
        got = bytes(r["media"])
        d = _wav_decode_py(got)
        assert d is not None and d["sample_rate"] == 12000
        sdec = _wav_decode_py(src[r["doc_id"]])
        nch, n_in = sdec["n_channels"], sdec["n_samples"]
        n_out = max(1, (n_in * 12000) // sdec["sample_rate"])
        assert (r["n_channels"], r["n_samples"]) == (nch, n_out)
        expect = []
        for j in range(n_out):
            base = ((j * n_in) // n_out) * nch
            expect.extend(sdec["samples"][base : base + nch])
        assert list(d["samples"]) == expect
        assert r["media_meta"]["n_bytes"] == len(got)
        assert r["media_meta"]["sha"] == hashlib.sha256(got).hexdigest()
        assert r["media_meta"]["mime"] == "audio/wav"

    # identity rate: sample array byte-for-byte
    one = media.filter(F.col("doc_id") == 5)
    sdec = _wav_decode_py(src[5])
    ident = multimodal.resample_audio(
        one, sdec["sample_rate"], decode_stub=False
    ).first()
    assert list(_wav_decode_py(bytes(ident["media"]))["samples"]) == list(
        sdec["samples"]
    )

    # builtin decoder parses the resampled output too
    dec = multimodal.wav_decode(out)
    assert dec.filter(F.col("sample_rate") != 12000).count() == 0

    # stub path: deterministic, meta-truthful, geometry NULL
    fake = multimodal.attach_media(docs.limit(4))
    a = multimodal.resample_audio(fake, 9000).collect()
    b = multimodal.resample_audio(fake, 9000).collect()
    assert [bytes(r["media"]) for r in a] == [bytes(r["media"]) for r in b]
    assert all(r["n_channels"] is None for r in a)
    with pytest.raises(Exception, match="unsupported media format"):
        multimodal.resample_audio(fake, 9000, decode_stub=False).collect()
    with pytest.raises(ValueError, match="target_rate"):
        multimodal.resample_audio(fake, 0)


def test_png_decode_known_filtered_scanlines():
    """INDEPENDENT known-answer check of the PNG unfilter (round 12):
    the filtered scanline bytes here were computed BY HAND from the
    PNG spec's filter definitions (not by our encoder), assembled into
    a minimal PNG with stdlib zlib, and the decoder must reconstruct
    the original pixels bit-exactly. Covers Sub+Paeth and Average+Up
    row pairings, including the modulo-256 wraparound cases."""
    import struct
    import zlib

    from firebolt_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk, _png_decode_py,
    )

    def build(scanlines: bytes, w: int, h: int) -> bytes:
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(scanlines))
            + _png_chunk(b"IEND", b"")
        )

    # pixels: row0 = (10,20,30),(40,50,60); row1 = (70,80,90),(15,25,35)
    pixels = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90, 15, 25, 35])

    # row0 Sub:   [10,20,30, 40-10,50-20,60-30]        = 10,20,30,30,30,30
    # row1 Paeth: i<3 predictor=b (above) -> 70-10 etc = 60,60,60
    #             i>=3 predictor=a (left) -> (15-70)%256 = 201 ...
    sub_paeth = (
        b"\x01" + bytes([10, 20, 30, 30, 30, 30])
        + b"\x04" + bytes([60, 60, 60, 201, 201, 201])
    )
    d = _png_decode_py(build(sub_paeth, 2, 2))
    assert d is not None and d["pixels"] == pixels

    # row0 Average (prev=0): [10,20,30, 40-10//2,50-20//2,60-30//2]
    # row1 Up: (70-40... no: x - prev) = 60,60,60,(15-40)%256=231 ...
    avg_up = (
        b"\x03" + bytes([10, 20, 30, 35, 40, 45])
        + b"\x02" + bytes([60, 60, 60, 231, 231, 231])
    )
    d = _png_decode_py(build(avg_up, 2, 2))
    assert d is not None and d["pixels"] == pixels
    assert d["width"] == 2 and d["height"] == 2
    # channel means over the known pixels (RGB order)
    assert d["mean_r"] == round((10 + 40 + 70 + 15) / 4, 6)
    assert d["mean_g"] == round((20 + 50 + 80 + 25) / 4, 6)
    assert d["mean_b"] == round((30 + 60 + 90 + 35) / 4, 6)


def test_png_codec_roundtrip_and_rejections():
    """Encode→decode recovers the pixel array bit-exactly under every
    filter type; the decoder refuses (None, never garbage) CRC
    corruption, truncation, bad magic, unsupported color types, and
    undefined filter bytes."""
    import struct
    import zlib

    from firebolt_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk, _png_decode_py, _png_encode_py,
    )

    pix = bytes(range(3 * 4 * 5))  # 4x5 RGB
    for filters in (None, [0, 1, 2, 3, 4], [4] * 5, [3] * 5, [1] * 5):
        p = _png_encode_py(pix, 4, 5, filters)
        d = _png_decode_py(p)
        assert d is not None and d["pixels"] == pix, filters

    p = _png_encode_py(pix, 4, 5)
    flip = bytearray(p); flip[25] ^= 1
    assert _png_decode_py(bytes(flip)) is None          # CRC mismatch
    assert _png_decode_py(p[: len(p) - 6]) is None      # truncated
    assert _png_decode_py(b"BM" + p[2:]) is None        # wrong magic

    # RGBA (color type 6) is out of scope: refuse, don't mis-decode
    ihdr6 = struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0)
    rgba = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr6)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x01\x02\x03\x04"))
        + _png_chunk(b"IEND", b"")
    )
    assert _png_decode_py(rgba) is None

    # undefined filter type byte inside a valid container
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    badf = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x07\x01\x02\x03"))
        + _png_chunk(b"IEND", b"")
    )
    assert _png_decode_py(badf) is None


def test_png_features_agree_with_bmp_decoder(spark, sf_dir):
    """Cross-codec consistency: png_encode and bmp_encode wrap the SAME
    md5-derived pixel stream, so the two REAL decoders — zlib inflate +
    unfilter vs. struct.unpack over raw rows — must report identical
    statistics modulo the RGB/BGR channel mirror. Two independent
    implementations agreeing on every row is the strongest in-container
    reference available (no external PNG reader exists here)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(60)
    png = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            multimodal.png_encode(docs), decode_stub=False
        ).collect()
    }
    bmp = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            multimodal.bmp_encode(docs), decode_stub=False
        ).collect()
    }
    assert set(png) == set(bmp) and len(png) == 60
    for doc_id, p in png.items():
        b = bmp[doc_id]
        assert (p["width"], p["height"], p["n_frames"]) == (
            b["width"], b["height"], b["n_frames"],
        )
        pf, bf = p["feature"], b["feature"]
        # PNG slot b == BMP slot r (stream position 2), and vice versa
        assert pf[0] == bf[2] and pf[1] == bf[1] and pf[2] == bf[0]
        assert pf[3] == bf[3]


def test_png_resize_reference_and_identity(spark, sf_dir):
    """resize_media over PNG payloads: identity dims round-trip the
    pixel array byte-for-byte, the NN resample matches an independent
    reference on the DECODED pixels, media_meta is refreshed truthfully,
    and the output re-parses under the real decoder."""
    import hashlib

    from firebolt_spark.operators.multimodal import _png_decode_py

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(30)
    media = multimodal.png_encode(docs)
    src = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}

    resized = multimodal.resize_media(media, 6, 3, decode_stub=False)
    for r in resized.collect():
        got = bytes(r["media"])
        d = _png_decode_py(got)
        assert d is not None and (d["width"], d["height"]) == (6, 3)
        s = _png_decode_py(src[r["doc_id"]])
        expect = bytearray()
        for j in range(3):
            for i in range(6):
                o = 3 * ((j * s["height"] // 3) * s["width"]
                         + (i * s["width"] // 6))
                expect += s["pixels"][o : o + 3]
        assert d["pixels"] == bytes(expect)
        assert r["media_meta"]["n_bytes"] == len(got)
        assert r["media_meta"]["sha"] == hashlib.sha256(got).hexdigest()
        assert r["media_meta"]["mime"] == "image/png"

    one = media.filter(F.col("doc_id") == 7)
    s = _png_decode_py(src[7])
    ident = multimodal.resize_media(
        one, s["width"], s["height"], decode_stub=False
    ).first()
    assert _png_decode_py(bytes(ident["media"]))["pixels"] == s["pixels"]


def test_resize_media_stub_and_guards(spark, sf_dir):
    """The stub path is deterministic and meta-truthful for formats the
    container can't decode; the real path refuses non-BMP; bad target
    dims refuse; the media_resize YAML node requires width/height."""
    import hashlib

    import pytest

    from firebolt_spark.operators.llm_nodes import MediaResizeNode

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text"
    ).limit(10)
    fake = multimodal.attach_media(docs)  # UTF-8 bytes, not BMP
    a = multimodal.resize_media(fake, 8, 4).collect()
    b = multimodal.resize_media(fake, 8, 4).collect()
    assert [bytes(r["media"]) for r in a] == [bytes(r["media"]) for r in b]
    for r in a:
        got = bytes(r["media"])
        assert len(got) == 54 + 24 * 4
        assert r["media_meta"]["n_bytes"] == len(got)
        assert r["media_meta"]["sha"] == hashlib.sha256(got).hexdigest()
        assert r["media_meta"]["mime"] == "image/fake"  # stub keeps mime

    with pytest.raises(Exception, match="unsupported media format"):
        multimodal.resize_media(fake, 8, 4, decode_stub=False).collect()
    with pytest.raises(ValueError, match="dims"):
        multimodal.resize_media(fake, 0, 4)
    with pytest.raises(ValueError, match="width"):
        MediaResizeNode({"height": 3})
    node = MediaResizeNode({"width": 6, "height": 3, "decode_stub": False})
    out = node.transform(multimodal.bmp_encode(docs))
    assert out.count() == 10 and "media_meta" in out.columns


def test_balance_media_bytes_bins_and_oversized_isolation(spark):
    """balance_media_bytes (round 11): the module docstring's
    byte-balance claim made real — every byte-contiguous bin totals at
    most budget + its largest regular payload, an oversized payload
    (the '2 GB video') sits ALONE in a dedicated bin instead of
    absorbing a budget's worth of neighbors, and the repartition
    preserves the row set at the requested partition count."""
    import pytest

    rows = [(i, b"x" * 1000) for i in range(60)] + [(60, b"y" * 940_000)]
    media = spark.createDataFrame(
        rows, "doc_id BIGINT, media BINARY"
    ).select(
        "doc_id",
        "media",
        F.struct(
            F.lit("video").alias("kind"),
            F.lit("video/fake").alias("mime"),
            F.length("media").cast("bigint").alias("n_bytes"),
            F.sha2("media", 256).alias("sha"),
        ).alias("media_meta"),
    )
    binned, budget = multimodal._byte_bins(media, 4, "doc_id")
    per_bin = {
        r["_bin"]: (r["total"], r["n"], r["mx"])
        for r in binned.groupBy("_bin")
        .agg(
            F.sum("_nb").alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max("_nb").alias("mx"),
        )
        .collect()
    }
    for b, (total, n, mx) in per_bin.items():
        if b < 0:  # dedicated oversized bin
            assert n == 1 and total >= budget
        else:
            assert total <= budget + mx
    # the huge payload is alone in a negative bin
    huge_bins = [b for b, (t, n, _) in per_bin.items() if t >= 940_000]
    assert huge_bins and all(b < 0 for b in huge_bins)
    assert all(per_bin[b][1] == 1 for b in huge_bins)

    out = multimodal.balance_media_bytes(media, 4)
    assert out.rdd.getNumPartitions() == 4
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == set(
        range(61)
    )
    assert set(out.columns) == {"doc_id", "media", "media_meta"}
    with pytest.raises(ValueError, match="num_partitions"):
        multimodal.balance_media_bytes(media, 0)


def test_dedup_lines_keep_first_structure_and_rebuild(spark):
    """dedup_lines (round 11, the C4 line-granularity move): a
    boilerplate line shared across documents survives only in its
    first (id, pos) occurrence, empty/whitespace lines are structure
    and always survive, a doc whose only line appeared earlier comes
    back empty, NULL text behaves as empty text, and untouched
    documents rebuild byte-for-byte — including their blank lines."""
    from firebolt_spark.operators.dedup import dedup_lines
    from firebolt_spark.operators.llm_nodes import LineDedupNode

    rows = [
        (0, "alpha beta\nshared boilerplate line\ngamma"),
        (1, "delta\nshared boilerplate line\n\nepsilon"),
        (2, "shared boilerplate line"),
        (3, ""),
        (4, None),
        (5, "alpha beta"),
        (6, "unique one\n\nunique two"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    got = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert (got[0]["n_lines"], got[0]["n_kept"]) == (3, 3)
    assert got[0]["text_dedup"] == rows[0][1]  # first occurrences win
    assert got[1]["text_dedup"] == "delta\n\nepsilon"  # blank kept
    assert (got[1]["n_lines"], got[1]["n_kept"]) == (4, 3)
    assert got[2]["text_dedup"] == "" and got[2]["n_kept"] == 0
    assert (got[3]["n_lines"], got[3]["n_kept"]) == (1, 1)  # structure
    assert got[4]["text_dedup"] == ""  # NULL ≡ empty
    assert got[5]["n_kept"] == 0  # single duplicate line dropped
    assert got[6]["text_dedup"] == rows[6][1]  # byte-for-byte rebuild

    # min_chars raises the structure floor: 10-char floor exempts the
    # duplicated 'alpha beta' (10 chars is NOT under the floor) but
    # exempts shorter lines from dedup
    floored = {
        r["doc_id"]: r
        for r in dedup_lines(df, min_chars=11).collect()
    }
    assert floored[5]["n_kept"] == 1  # 'alpha beta' now structure

    node = LineDedupNode({"min_chars": 2})
    out = node.transform(df)
    assert set(out.columns) == {"doc_id", "n_lines", "n_kept", "text_dedup"}
    assert out.count() == 7


def test_incremental_dedup_lines_across_batches(spark):
    """Three ingest batches through a growing line-digest index
    (round 11, the line analogue of the spans test above): a line
    admitted in batch N never survives in batch N+k, within-batch
    keep-first still applies, blank lines survive every batch, the
    index grows monotonically, and the union of survivors equals a
    one-shot dedup_lines over the concatenated corpus."""
    from firebolt_spark.operators.dedup import (
        dedup_lines, incremental_dedup_lines,
    )

    batches = [
        [(1, "alpha\nboiler"), (2, "beta\nboiler")],
        [(3, "boiler\n\ngamma"), (4, "delta")],
        [(5, "delta\nalpha"), (6, "unique\n")],
    ]
    index = None
    survivors = {}
    index_sizes = []
    for rows in batches:
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        deduped, new_digests = incremental_dedup_lines(df, index)
        for r in deduped.collect():
            survivors[r["doc_id"]] = (r["n_kept"], r["text_dedup"])
        index = (
            new_digests if index is None
            else index.union(new_digests).distinct()
        ).persist()
        index_sizes.append(index.count())
    assert index_sizes == sorted(index_sizes)  # monotone growth
    all_docs = spark.createDataFrame(
        [r for b in batches for r in b], ["doc_id", "text"]
    )
    oneshot = {r["doc_id"]: (r["n_kept"], r["text_dedup"])
               for r in dedup_lines(all_docs).collect()}
    assert survivors == oneshot
    # spot semantics: doc 5's lines were both admitted earlier
    # ('delta' by doc 4, 'alpha' by doc 1) -> fully scrubbed; doc 3
    # keeps its blank line (structure) but loses 'boiler' to doc 1
    assert survivors[5] == (0, "")
    assert survivors[3] == (2, "\ngamma")
    # the trailing newline of doc 6 is a kept empty line
    assert survivors[6] == (2, "unique\n")


def test_hashed_ngram_counts_features_and_buckets(spark):
    """hashed_ngram_counts (round 11): unigrams + adjacent bigrams with
    multiplicity, hashed into [0, n_buckets); NULL-text docs omitted;
    single-token docs emit no bigrams."""
    from firebolt_spark.operators.text import hashed_ngram_counts

    df = spark.createDataFrame(
        [(1, "a b a"), (2, "solo"), (3, None)], ["doc_id", "text"]
    )
    got = hashed_ngram_counts(df, n_buckets=8).collect()
    per_doc = {}
    for r in got:
        assert 0 <= r["bucket"] < 8
        per_doc[r["doc_id"]] = per_doc.get(r["doc_id"], 0) + r["cnt"]
    # doc 1: 3 unigrams + 2 bigrams = 5 features; doc 2: 1 unigram;
    # doc 3 (NULL) omitted entirely
    assert per_doc == {1: 5, 2: 1}


def test_classifier_score_logit_and_sigmoid(spark):
    """classifier_score: in-model features contribute their weights
    exactly; out-of-model features score zero; bias shifts the logit;
    the shuffled-join path (broadcast_weights=False) is bit-identical."""
    import math

    from firebolt_spark.operators.text import (
        classifier_score, hashed_ngram_counts,
    )

    df = spark.createDataFrame([(1, "x y"), (2, "q")], ["doc_id", "text"])
    # learn the actual buckets (collisions included), weight doc 1's
    # buckets that doc 2 does NOT share +1 each, and derive the exact
    # expected dot products from the observed counts
    fc = hashed_ngram_counts(df, n_buckets=64).collect()
    b1 = {r["bucket"] for r in fc if r["doc_id"] == 1}
    b2 = {r["bucket"] for r in fc if r["doc_id"] == 2}
    weighted = sorted(b1 - b2)
    assert weighted, "degenerate fixture: every doc-1 bucket collided"
    weights = spark.createDataFrame(
        [(b, 1.0) for b in weighted], ["bucket", "weight"]
    )
    exp1 = -1.0 + sum(
        r["cnt"] for r in fc if r["doc_id"] == 1 and r["bucket"] in weighted
    )
    got = {
        r["doc_id"]: r
        for r in classifier_score(
            df, weights, n_buckets=64, bias=-1.0
        ).collect()
    }
    # doc 1: 'x','y','x y' -> 3 features
    assert got[1]["n_features"] == 3
    assert got[1]["logit"] == exp1
    assert abs(got[1]["score"] - 1.0 / (1.0 + math.exp(-exp1))) < 5e-5
    # doc 2: every feature out-of-model -> bias only
    assert got[2]["n_features"] == 1
    assert got[2]["logit"] == -1.0
    shuffled = {
        r["doc_id"]: r
        for r in classifier_score(
            df, weights, n_buckets=64, bias=-1.0, broadcast_weights=False
        ).collect()
    }
    assert {k: (v["logit"], v["score"]) for k, v in got.items()} == {
        k: (v["logit"], v["score"]) for k, v in shuffled.items()
    }


def test_importance_weights_target_affinity(spark):
    """importance_weights (DSIR): target == raw gives log_weight 0 for
    every doc; against a distinct target slice, docs sharing the
    target's vocabulary outscore docs that don't."""
    from firebolt_spark.operators.text import (
        hashed_bucket_model, importance_weights,
    )

    df = spark.createDataFrame(
        [
            (1, "good clean prose", "tgt"),
            (2, "good clean words", "tgt"),
            (3, "spam junk noise", "raw"),
            (4, "good clean prose", "raw"),
        ],
        ["doc_id", "text", "kind"],
    )
    self_model = hashed_bucket_model(df, n_buckets=256)
    zero = importance_weights(df, self_model, raw_model=self_model,
                              n_buckets=256)
    assert {r["log_weight"] for r in zero.collect()} == {0.0}

    target = df.filter(df.kind == "tgt")
    got = {
        r["doc_id"]: r["log_weight"]
        for r in importance_weights(
            df, hashed_bucket_model(target, n_buckets=256), n_buckets=256
        ).collect()
    }
    # doc 4 repeats the target's exact text -> top score, tied with 1;
    # doc 3 shares nothing with the target -> strictly lowest
    assert got[4] == got[1]
    assert got[3] < min(got[1], got[2], got[4])


def test_hashed_feats_reuse_seam_bit_identical(spark):
    """r17 optimization seam: carry_cols leaves the (id, bucket, cnt)
    rows untouched; bucket_model_from_counts over a feature slice ==
    hashed_bucket_model over the matching doc slice; classifier_score
    and importance_weights fed the ONE precomputed feature table are
    bit-identical to their own internal recompute — the equivalence
    q_quality_selection / q_importance_weights now rely on to hash the
    corpus once instead of once per consumer."""
    from firebolt_spark.operators.text import (
        bucket_model_from_counts, classifier_score, hashed_bucket_model,
        hashed_ngram_counts, importance_weights,
    )

    df = spark.createDataFrame(
        [
            (1, "good clean prose good", "en"),
            (2, "rauschen und klang", "de"),
            (3, "good spam noise", "en"),
            (4, None, "en"),
            (5, "solo", "de"),
        ],
        ["doc_id", "text", "lang"],
    )
    base = hashed_ngram_counts(df, n_buckets=128)
    carried = hashed_ngram_counts(df, n_buckets=128, carry_cols=("lang",))
    assert sorted(
        (r["doc_id"], r["bucket"], r["cnt"]) for r in base.collect()
    ) == sorted(
        (r["doc_id"], r["bucket"], r["cnt"]) for r in carried.collect()
    )

    feats = carried.persist()
    try:
        # target model from the feature slice == model from the doc slice
        en_model = sorted(
            (r["bucket"], r["cnt"], r["total"])
            for r in bucket_model_from_counts(
                feats.filter(feats.lang == "en")
            ).collect()
        )
        ref_model = sorted(
            (r["bucket"], r["cnt"], r["total"])
            for r in hashed_bucket_model(
                df.filter(df.lang == "en"), n_buckets=128
            ).collect()
        )
        assert en_model == ref_model

        weights = spark.createDataFrame(
            [(b, ((b * 7) % 5 - 2) / 2.0) for b in range(128)],
            ["bucket", "weight"],
        )
        direct = sorted(
            tuple(r) for r in classifier_score(
                df, weights, n_buckets=128
            ).collect()
        )
        seamed = sorted(
            tuple(r) for r in classifier_score(
                df, weights, n_buckets=128, feats=feats.drop("lang")
            ).collect()
        )
        assert direct == seamed

        tgt = hashed_bucket_model(df.filter(df.lang == "en"), n_buckets=128)
        direct_iw = sorted(
            tuple(r) for r in importance_weights(
                df, tgt, n_buckets=128
            ).collect()
        )
        seamed_iw = sorted(
            tuple(r) for r in importance_weights(
                df,
                bucket_model_from_counts(feats.filter(feats.lang == "en")),
                n_buckets=128,
                feats=feats.drop("lang"),
            ).collect()
        )
        assert direct_iw == seamed_iw
    finally:
        feats.unpersist()


def test_weighted_sample_deterministic_and_guarded(spark):
    """weighted_sample (A-Res): the selected set is identical across
    repartitionings; NULL / non-positive weights are excluded; k >=
    eligible rows returns exactly the eligible set."""
    import pytest as _pytest

    from firebolt_spark.functions import weighted_sample

    rows = [(i, float(1 + (i % 7))) for i in range(200)]
    rows += [(900, None), (901, 0.0), (902, -3.0)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    a = sorted(
        r["doc_id"] for r in weighted_sample(df, "w", 25, "doc_id", "s").collect()
    )
    b = sorted(
        r["doc_id"]
        for r in weighted_sample(
            df.repartition(13), "w", 25, "doc_id", "s"
        ).collect()
    )
    assert a == b and len(a) == 25
    assert not {900, 901, 902} & set(a)
    everything = sorted(
        r["doc_id"]
        for r in weighted_sample(df, "w", 10_000, "doc_id", "s").collect()
    )
    assert everything == [i for i in range(200)]
    # a different salt draws a different sample (independence knob)
    c = sorted(
        r["doc_id"] for r in weighted_sample(df, "w", 25, "doc_id", "t").collect()
    )
    assert a != c
    with _pytest.raises(ValueError):
        weighted_sample(df, "w", 0, "doc_id")


def test_data_selection_nodes(spark, tmp_path):
    """The round-11 data-selection YAML nodes: classifier_score reads
    its weight table from parquet; importance_weights accepts exactly
    one of target_filter / target_model_path; weighted_sample validates
    its params."""
    import pytest as _pytest

    from firebolt_spark.operators.llm_nodes import (
        ClassifierScoreNode, ImportanceWeightsNode, WeightedSampleNode,
    )
    from firebolt_spark.operators.text import hashed_bucket_model

    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "gamma delta", "fr")],
        ["doc_id", "text", "lang"],
    )
    wpath = str(tmp_path / "weights")
    spark.createDataFrame([(0, 0.5)], ["bucket", "weight"]).write.parquet(wpath)
    scored = ClassifierScoreNode(
        {"weights_path": wpath, "n_buckets": 16}
    ).transform(df)
    assert {"doc_id", "n_features", "logit", "score"} == set(scored.columns)
    assert scored.count() == 2
    with _pytest.raises(ValueError):
        ClassifierScoreNode({})

    iw = ImportanceWeightsNode(
        {"target_filter": "lang = 'en'", "n_buckets": 16}
    ).transform(df)
    assert iw.count() == 2
    mpath = str(tmp_path / "model")
    hashed_bucket_model(df, n_buckets=16).write.parquet(mpath)
    iw2 = ImportanceWeightsNode(
        {"target_model_path": mpath, "n_buckets": 16}
    ).transform(df)
    assert {r["log_weight"] for r in iw2.collect()} == {0.0}
    with _pytest.raises(ValueError):
        ImportanceWeightsNode({})
    with _pytest.raises(ValueError):
        ImportanceWeightsNode(
            {"target_filter": "x", "target_model_path": "y"}
        )

    ws = WeightedSampleNode({"weight_col": "doc_id", "k": 1}).transform(df)
    assert ws.count() == 1
    with _pytest.raises(ValueError):
        WeightedSampleNode({"k": 3})


def test_gopher_quality_rules(spark):
    """gopher_quality (round 11): each of the six rules can
    independently reject a document; a compliant document passes; NULL
    text yields keep = 0 with NULL signals."""
    from firebolt_spark.operators.llm_nodes import GopherQualityNode
    from firebolt_spark.operators.text import gopher_quality

    good = "the quick brown fox and the lazy dog walked over sunny hills"
    docs = spark.createDataFrame(
        [
            (1, good),                              # passes all rules
            (2, "the and short"),                   # too few words
            (3, "a a a a a a of of of and and the"),  # mean word len < 3
            (4, ("1 2 3 4 5 6 7 8 9 10 of the")),   # alpha frac < 0.8
            (5, good.replace("the", "xx").replace("and", "yy")),  # no stops
            (6, "the boiler plate and " + "loop " * 8),  # dup words
            (7, None),                              # NULL text
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r
        for r in gopher_quality(
            docs, min_words=5, max_dup_word_frac=0.3
        ).collect()
    }
    assert got[1]["keep"] == 1
    assert got[2]["keep"] == 0 and got[2]["n_words"] == 3
    assert got[3]["keep"] == 0 and got[3]["mean_word_len"] < 3.0
    assert got[4]["keep"] == 0 and got[4]["alpha_word_frac"] < 0.8
    assert got[5]["keep"] == 0 and got[5]["stopword_hits"] < 2
    assert got[6]["keep"] == 0 and got[6]["dup_word_frac"] > 0.3
    assert got[7]["keep"] == 0 and got[7]["n_words"] is None
    # looping bigrams trip the top-bigram rule even with dup allowed
    loops = spark.createDataFrame(
        [(8, "the stop and go " + "tick tock " * 10)], ["doc_id", "text"]
    )
    r8 = gopher_quality(
        loops, min_words=5, max_dup_word_frac=1.0
    ).collect()[0]
    assert r8["keep"] == 0 and r8["top_bigram_frac"] > 0.2

    node_got = GopherQualityNode(
        {"min_words": 5, "max_dup_word_frac": 0.3}
    ).transform(docs)
    assert {r["doc_id"]: r["keep"] for r in node_got.collect()} == {
        k: v["keep"] for k, v in got.items()
    }


def test_gopher_quality_include_passthrough(spark):
    """include= carries input columns through the gate unchanged, so a
    downstream filter(keep=1) continues the pipeline without a corpus
    re-join (the q_quality_selection composition shape)."""
    from firebolt_spark.operators.text import gopher_quality

    df = spark.createDataFrame(
        [(1, "the quick brown fox and the dog ran over hills", "en")],
        ["doc_id", "text", "lang"],
    )
    got = gopher_quality(df, include=("text", "lang"), min_words=5).collect()[0]
    assert got["text"] == df.collect()[0]["text"]
    assert got["lang"] == "en"
    assert got["keep"] in (0, 1)


def test_importance_weights_empty_target_degrades_to_uniform(spark):
    """An empty target model (target_filter matching zero rows) must
    NOT annihilate the output via a 0-row broadcast crossJoin — it
    degrades to the Laplace limit (every feature scores 1/n_buckets
    under the target), so every doc still gets a row."""
    from firebolt_spark.operators.text import (
        hashed_bucket_model, importance_weights,
    )

    df = spark.createDataFrame(
        [(1, "alpha beta", "en"), (2, "gamma delta", "fr")],
        ["doc_id", "text", "lang"],
    )
    empty_target = hashed_bucket_model(
        df.filter("lang = 'xx'"), n_buckets=64
    )
    got = importance_weights(df, empty_target, n_buckets=64).collect()
    assert len(got) == 2
    assert all(r["log_weight"] is not None for r in got)


def test_weighted_sample_excludes_nan_weights(spark):
    """NaN weights must be excluded: Spark orders NaN above every
    double, so an unguarded NaN row would pass the > 0 filter and
    always win the descending top-k."""
    from firebolt_spark.functions import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 5.0), (3, float("nan"))], ["doc_id", "w"]
    )
    got = sorted(
        r["doc_id"] for r in weighted_sample(df, "w", 3, "doc_id").collect()
    )
    assert got == [1, 2]


def test_query_release_handles_survive_derivation(spark):
    """The declared DSIR queries re-attach the operator's persisted
    handles after orderBy/select, so functions.release() actually
    frees the feature/model caches (q_dedup_semantic convention)."""
    from firebolt_spark.queries import llm
    from tests.conftest import SF_DIR

    df = llm.q_importance_weights(spark, SF_DIR)
    handles = getattr(df, "_persisted_inputs", [])
    assert len(handles) == 3  # feats, target_model, raw_model
    sel = llm.q_quality_selection(spark, SF_DIR)
    assert len(getattr(sel, "_persisted_inputs", [])) == 3


def test_stratified_sample_two_phase_matches_brute_force(spark):
    """stratified_sample's two-phase top-k must select exactly the
    rows a brute-force per-stratum A-Res ranking selects, at any
    fan_in (phase 1 keeps each bucket's top-k, a superset of the
    stratum top-k, so the composition is exact by construction)."""
    import hashlib
    import math

    from firebolt_spark.functions import stratified_sample

    rows = [
        (i, ["en", "fr", "de"][i % 3], float(1 + (i * 7) % 13))
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "w"])

    def rank(doc_id, w):
        h = int(hashlib.md5(f"{doc_id}#s1".encode()).hexdigest()[:8], 16)
        return math.log((h + 0.5) / 2**32) / w

    expect = set()
    for lang in ("en", "fr", "de"):
        grp = sorted(
            (r for r in rows if r[1] == lang),
            key=lambda r: (-rank(r[0], r[2]), r[0]),
        )
        expect |= {r[0] for r in grp[:5]}

    for fan_in in (1, 4, 32):
        got = {
            r["doc_id"]
            for r in stratified_sample(
                df, "lang", "w", 5, "doc_id", salt="s1", fan_in=fan_in
            ).collect()
        }
        assert got == expect, f"fan_in={fan_in}"


def test_stratified_sample_small_stratum_kept_whole(spark):
    """A stratum with fewer than k positive-weight rows is kept in
    full; NULL stratum is one ordinary stratum; NULL/NaN/non-positive
    weights are excluded (zero inclusion probability)."""
    from firebolt_spark.functions import stratified_sample

    df = spark.createDataFrame(
        [
            (1, "en", 2.0),
            (2, "en", None),
            (3, None, 1.0),
            (4, None, float("nan")),
            (5, "fr", 0.0),
            (6, "fr", -3.0),
        ],
        ["doc_id", "lang", "w"],
    )
    got = sorted(
        r["doc_id"]
        for r in stratified_sample(df, "lang", "w", 10, "doc_id").collect()
    )
    assert got == [1, 3]


def test_stratified_sample_node(spark):
    """The stratified_sample YAML node validates its params and keeps
    k rows per stratum."""
    import pytest as _pytest

    from firebolt_spark.operators.llm_nodes import StratifiedSampleNode

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", float(i + 1)) for i in range(10)],
        ["doc_id", "lang", "w"],
    )
    out = StratifiedSampleNode(
        {"strata_col": "lang", "weight_col": "w", "k": 2}
    ).transform(df)
    by_lang = {}
    for r in out.collect():
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert {len(v) for v in by_lang.values()} == {2}
    with _pytest.raises(ValueError):
        StratifiedSampleNode({"weight_col": "w", "k": 2})


def test_token_budget_mix_matches_brute_force(spark):
    """token_budget_mix's two-phase grouped cumsum must keep exactly
    the rows a sequential per-stratum budget walk keeps, at any
    fan_in (contiguous hash ranges preserve the visit order, and the
    broadcast prefix offsets reconstruct the exact running total)."""
    import hashlib

    from firebolt_spark.operators.mixture import token_budget_mix

    rows = [
        (i, ["en", "fr", "de"][i % 3], 10 + (i * 37) % 90)
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "lang", "toks"])
    budgets = {"en": 300, "fr": 95}

    def h(doc_id):
        return int(hashlib.md5(f"{doc_id}#s2".encode()).hexdigest()[:8], 16)

    expect = set()
    for lang in ("en", "fr", "de"):
        budget = budgets.get(lang, 120)
        running = 0
        for r in sorted(
            (r for r in rows if r[1] == lang), key=lambda r: (h(r[0]), r[0])
        ):
            if running < budget:
                expect.add(r[0])
            running += r[2]

    for fan_in in (1, 4, 32):
        got = {
            r["doc_id"]
            for r in token_budget_mix(
                df, "lang", budgets, "toks", "doc_id",
                salt="s2", default_budget=120, fan_in=fan_in,
            ).collect()
        }
        assert got == expect, f"fan_in={fan_in}"


def test_token_budget_mix_edges(spark):
    """Budget edges: the boundary-crossing row is the LAST one in (a
    positive budget always admits at least one row, even one larger
    than the budget); a zero/absent budget excludes the stratum; NULL
    strata form one ordinary stratum under default_budget; NULL and
    negative token counts are excluded; zero-token rows consume
    nothing and pass while the budget is open."""
    from firebolt_spark.operators.mixture import token_budget_mix

    df = spark.createDataFrame(
        [
            (1, "en", 500),   # first in hash order or not — one of the
            (2, "en", 500),   # two en rows must cross the 600 boundary
            (3, "en", 500),
            (4, "fr", 50),    # fr absent from budgets -> default 0
            (5, None, 10),
            (6, None, None),
            (7, None, -5),
            (8, "de", 0),
        ],
        ["doc_id", "lang", "toks"],
    )
    got = sorted(
        r["doc_id"]
        for r in token_budget_mix(
            df, "lang", {"en": 600, "de": 1}, "toks", "doc_id",
            default_budget=20,
        ).collect()
    )
    # en: two of the three 500-token rows (0 < 600 and 500 < 600; the
    # third starts at 1000); fr: doc 4 is its boundary-crossing first
    # row under the default budget (0 < 20, even though 50 > 20); NULL
    # stratum: doc 5 only (6, 7 invalid); de: the zero-token row
    # passes a positive budget
    en_kept = [d for d in got if d in (1, 2, 3)]
    assert len(en_kept) == 2
    assert 4 in got
    assert 5 in got and 6 not in got and 7 not in got
    assert 8 in got
    # default_budget=0 (the default) excludes every unlisted stratum
    got0 = sorted(
        r["doc_id"]
        for r in token_budget_mix(
            df, "lang", {"en": 600}, "toks", "doc_id"
        ).collect()
    )
    assert all(d in (1, 2, 3) for d in got0) and len(got0) == 2


def test_token_budget_mix_node(spark):
    """The token_budget_mix YAML node validates params and applies the
    per-stratum budgets."""
    import pytest as _pytest

    from firebolt_spark.operators.llm_nodes import TokenBudgetMixNode

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr", 100) for i in range(10)],
        ["doc_id", "lang", "toks"],
    )
    out = TokenBudgetMixNode(
        {"strata_col": "lang", "budgets": {"en": 250}, "token_col": "toks"}
    ).transform(df)
    rows = out.collect()
    assert {r["lang"] for r in rows} == {"en"}
    assert len(rows) == 3  # 0 < 250, 100 < 250, 200 < 250
    with _pytest.raises(ValueError):
        TokenBudgetMixNode({"strata_col": "lang", "token_col": "toks"})


def test_kmv_sketch_merge_equals_one_shot(spark):
    """The KMV mergeability contract: sketch each shard, kmv_merge the
    shard sketches, and the result is BIT-IDENTICAL to the one-shot
    sketch of the whole corpus — per-shard sketch tables can stand in
    for the corpus. Also exact across fan_in choices."""
    from firebolt_spark.functions import kmv_merge, kmv_sketch

    df = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2]) for i in range(400)], ["doc_id", "lang"]
    )
    whole = {
        r["lang"]: r["kmv"]
        for r in kmv_sketch(
            df, "doc_id", k=32, group_cols=["lang"], salt="m"
        ).collect()
    }
    shards = [
        kmv_sketch(
            df.filter(F.col("doc_id") % 3 == s),
            "doc_id",
            k=32,
            group_cols=["lang"],
            salt="m",
            fan_in=1 + s,
        )
        for s in range(3)
    ]
    stacked = shards[0].unionByName(shards[1]).unionByName(shards[2])
    merged = {
        r["lang"]: r["kmv"]
        for r in kmv_merge(stacked, "kmv", k=32, group_cols=["lang"]).collect()
    }
    assert merged == whole


def test_kmv_estimate_accuracy_and_exact_fallback(spark):
    """Below k distinct values the estimate is EXACT (the sketch holds
    them all); above, the (k-1)·2^48/h_k estimator lands within the
    standard ~1/sqrt(k-2) error band (deterministic here — content
    hashes, no RNG — so the assertion is stable)."""
    from firebolt_spark.functions import kmv_estimate, kmv_sketch

    big = spark.range(5000).withColumnRenamed("id", "v")
    est = (
        kmv_sketch(big, "v", k=256, salt="s")
        .select(kmv_estimate("kmv", 256).alias("e"))
        .collect()[0]["e"]
    )
    # this salt's draw lands at 0.3% error; the empty-salt draw on the
    # same values sits at 3.2 sigma (20.3% with k=256) — both verified
    # against a pure-python KMV, the sketch itself is bit-exact
    assert abs(est - 5000) / 5000 < 0.20

    small = spark.range(40).withColumnRenamed("id", "v")
    exact = (
        kmv_sketch(small, "v", k=256)
        .select(kmv_estimate("kmv", 256).alias("e"))
        .collect()[0]["e"]
    )
    assert exact == 40.0


def test_kmv_merge_validates_parameters(spark):
    """kmv_merge's compatibility contract is ENFORCED, not documented
    (ADVICE r11): rows built with different salts, or a build k below
    the merge k, fail the merge job instead of silently mis-estimating.
    Legacy frames without the parameter columns still merge."""
    import pytest as _pytest

    from firebolt_spark.functions import kmv_merge, kmv_sketch

    df = spark.createDataFrame([(i,) for i in range(100)], ["v"])
    a = kmv_sketch(df, "v", k=32, salt="x")
    assert set(a.columns) == {"kmv", "kmv_k", "kmv_salt"}

    # mixed salts -> raise
    b = kmv_sketch(df, "v", k=32, salt="y")
    with _pytest.raises(Exception, match="incompatible sketch rows"):
        kmv_merge(a.unionByName(b), "kmv", k=32).collect()

    # merge k above the build k -> raise
    with _pytest.raises(Exception, match="incompatible sketch rows"):
        kmv_merge(a, "kmv", k=64).collect()

    # compatible rows -> merged, re-stamped with (merge k, shared salt)
    c = kmv_sketch(df.filter(F.col("v") >= 50), "v", k=32, salt="x")
    out = kmv_merge(a.unionByName(c), "kmv", k=16).collect()
    assert len(out) == 1
    row = out[0]
    assert len(row["kmv"]) == 16
    assert row["kmv_k"] == 16 and row["kmv_salt"] == "x"

    # legacy sketch rows (no parameter columns) merge unvalidated
    legacy = a.select("kmv")
    assert kmv_merge(legacy, "kmv", k=16).collect()[0]["kmv"] == row["kmv"]

    # HETEROGENEOUS build k (explicitly allowed: min build k >= merge
    # k) must equal the one-shot sketch — r12's distinct included the
    # (k, salt) meta columns, so a hash present under two build-k
    # values survived twice and inflated the merged array (ADVICE r12)
    d64 = kmv_sketch(df, "v", k=64, salt="x")
    het = kmv_merge(a.unionByName(d64), "kmv", k=32).collect()[0]
    one_shot = kmv_sketch(df, "v", k=32, salt="x").collect()[0]
    assert het["kmv"] == one_shot["kmv"]
    assert len(het["kmv"]) == len(set(het["kmv"]))


def test_kmv_estimate_k_col_validation(spark):
    """kmv_estimate(k_col=...) raises when asked to estimate at a k
    past the stored horizon (element_at would return a silent NULL
    estimate otherwise), and passes through unchanged at a valid k."""
    import pytest as _pytest

    from firebolt_spark.functions import kmv_estimate, kmv_sketch

    sk = kmv_sketch(spark.range(20).withColumnRenamed("id", "v"), "v", k=32)
    ok = sk.select(kmv_estimate("kmv", 32, k_col="kmv_k").alias("e"))
    assert ok.collect()[0]["e"] == 20.0
    bad = sk.select(kmv_estimate("kmv", 64, k_col="kmv_k").alias("e"))
    with _pytest.raises(Exception, match="exceeds the build k"):
        bad.collect()


def test_clusters_groundtruth_pair_cap():
    """The driver-side union-find's one corpus-dependent collect is
    size-guarded: past the cap it refuses with the sampled alternative
    instead of OOMing mid-collect (VERDICT r11 Next #6)."""
    import pytest as _pt

    from tools.check_clusters_groundtruth import collect_pairs_bounded

    class FakeDF:
        def __init__(self, n):
            self.n = n

        def count(self):
            return self.n

        def collect(self):
            return ["row"] * self.n

    assert collect_pairs_bounded(FakeDF(3), max_pairs=5) == ["row"] * 3
    with _pt.raises(SystemExit, match="too large for a driver-side"):
        collect_pairs_bounded(FakeDF(6), max_pairs=5)


def test_c4_line_filter_rules(spark):
    """Each C4 rule in isolation plus the page-level gates: terminal
    punctuation, the min-word floor, the javascript marker (any case),
    the curly-brace page drop, the min-kept-lines floor; NULL text is
    the empty page; the plan stays scan-only (no shuffle, no
    explode)."""
    from firebolt_spark.operators.text import c4_line_filter

    pages = [
        # 0: three good sentences -> kept page
        (0, "one two three four five.\nsix seven eight nine ten!\n"
            'quoted line with five words."'),
        # 1: good lines but a '{' anywhere drops the page
        (1, "one two three four five.\nsix seven eight nine ten.\n"
            "a b c d e.\nvar x = { }"),
        # 2: only two lines survive -> below the floor
        (2, "one two three four five.\nsix seven eight nine ten.\n"
            "short one.\nno punctuation here at all"),
        # 3: javascript in any case kills its line
        (3, "Please enable JAVASCRIPT to see this page.\n"
            "one two three four five.\nsix seven eight nine ten.\n"
            "eleven twelve thirteen fourteen fifteen."),
        (4, None),
    ]
    df = spark.createDataFrame(pages, "doc_id BIGINT, text STRING")
    out = {r["doc_id"]: r for r in c4_line_filter(df).collect()}

    assert (out[0]["n_kept"], out[0]["keep"]) == (3, 1)
    assert out[0]["text_clean"].count("\n") == 2
    assert (out[1]["n_kept"], out[1]["keep"]) == (3, 0)  # '{' drops page
    assert (out[2]["n_kept"], out[2]["keep"]) == (2, 0)  # below floor
    assert (out[3]["n_kept"], out[3]["keep"]) == (3, 1)  # js line gone
    assert "JAVASCRIPT" not in out[3]["text_clean"]
    assert (out[4]["n_lines"], out[4]["n_kept"], out[4]["keep"]) == (1, 0, 0)

    plan = c4_line_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Generate" not in plan


def test_group_quantiles_semantics(spark):
    """group_quantiles matches the SQL-standard definitions on known
    values (duplicates included), handles the q=0/q=1 edges where the
    upper bracketing rank has no histogram row, ignores NULL values,
    drops all-NULL groups, and validates its inputs."""
    import pytest as _pytest

    from firebolt_spark.functions import group_quantiles

    rows = (
        [("a", v) for v in (10, 10, 30, 40, 40)]
        + [("b", v) for v in (1, 2, 3, 4)]
        + [("b", None), ("c", None)]
    )
    df = spark.createDataFrame(rows, "g STRING, v INT")
    out = {
        (r["g"], r["q"]): (r["n"], r["quantile_cont"], r["quantile_disc"])
        for r in group_quantiles(
            df, "v", [0.0, 0.25, 0.5, 0.9, 1.0], ["g"]
        ).collect()
    }
    # group a: sorted 10,10,30,40,40 (n=5)
    assert out[("a", 0.5)] == (5, 30.0, 30)     # h=2 -> v_2
    assert out[("a", 0.25)] == (5, 10.0, 10)    # h=1 -> v_1
    assert out[("a", 0.9)] == (5, 40.0, 40)     # h=3.6 -> interp 40,40
    assert out[("a", 0.0)] == (5, 10.0, 10)
    assert out[("a", 1.0)] == (5, 40.0, 40)     # upper rank absent
    # group b: NULL ignored, n=4; q=0.25 -> h=0.75 -> 1 + .75*(2-1)
    assert out[("b", 0.25)] == (4, 1.75, 1)
    assert out[("b", 0.5)] == (4, 2.5, 2)
    # all-NULL group disappears
    assert not any(g == "c" for g, _ in out)

    with _pytest.raises(ValueError, match="non-empty"):
        group_quantiles(df, "v", [], ["g"])
    with _pytest.raises(ValueError, match="in \\[0, 1\\]"):
        group_quantiles(df, "v", [1.5], ["g"])

    # ungrouped: one global distribution (group_cols=None exercises
    # the explicit crossJoin path — ADVICE r12); sorted values are
    # 1,2,3,4,10,10,30,40,40 (n=9)
    g = {
        r["q"]: (r["n"], r["quantile_cont"], r["quantile_disc"])
        for r in group_quantiles(
            df.filter(F.col("v").isNotNull()), "v", [0.25, 0.5, 1.0]
        ).collect()
    }
    assert g[0.5] == (9, 10.0, 10)    # h=4 -> v_4
    assert g[0.25] == (9, 3.0, 3)     # h=2 -> v_2
    assert g[1.0] == (9, 40.0, 40)


def test_snapshot_diff_statuses(spark):
    """snapshot_diff classifies every key exactly: added (new only),
    removed (old only), changed (digest differs), unchanged (hidden
    unless asked); NULL keys are one ordinary key, NULL payloads
    digest via the sentinel (NULL -> 'x' is a change, not a
    collision), and composite keys compare null-safely."""
    from firebolt_spark.functions import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (None, "n")],
        "doc_id BIGINT, text STRING",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B"), (3, "x"), (4, "d")],
        "doc_id BIGINT, text STRING",
    )
    got = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(old, new, ["doc_id"], ["text"]).collect()
    }
    assert got == {
        2: "changed",   # b -> B
        3: "changed",   # NULL payload -> 'x'
        4: "added",
        None: "removed",  # NULL key matched null-safely, absent in new
    }
    full = {
        r["doc_id"]: r["status"]
        for r in snapshot_diff(
            old, new, ["doc_id"], ["text"], include_unchanged=True
        ).collect()
    }
    assert full[1] == "unchanged" and len(full) == 5


def test_snapshot_diff_payload_digest_null_vs_empty(spark):
    """The digest separates (NULL) from ('') and (NULL, 'a') from
    ('a', NULL) — the sentinel/separator encoding collides on none of
    the classic concat traps."""
    from firebolt_spark.functions import snapshot_diff

    old = spark.createDataFrame(
        [(1, None, "a"), (2, "", "")], "k BIGINT, p1 STRING, p2 STRING"
    )
    new = spark.createDataFrame(
        [(1, "a", None), (2, None, "")], "k BIGINT, p1 STRING, p2 STRING"
    )
    got = {
        r["k"]: r["status"]
        for r in snapshot_diff(old, new, ["k"], ["p1", "p2"]).collect()
    }
    assert got == {1: "changed", 2: "changed"}


def test_snapshot_diff_node(spark, tmp_path):
    """The snapshot_diff YAML node reads the stored snapshot from
    old_path and diffs the flowing frame against it."""
    import pytest as _pytest

    from firebolt_spark.operators.llm_nodes import SnapshotDiffNode

    old = spark.createDataFrame([(1, "a"), (2, "b")], ["doc_id", "text"])
    p = str(tmp_path / "snap")
    old.write.parquet(p)
    new = spark.createDataFrame([(2, "bb"), (3, "c")], ["doc_id", "text"])
    got = {
        r["doc_id"]: r["status"]
        for r in SnapshotDiffNode(
            {"old_path": p, "payload_cols": ["text"]}
        ).transform(new).collect()
    }
    assert got == {1: "removed", 2: "changed", 3: "added"}
    with _pytest.raises(ValueError):
        SnapshotDiffNode({"payload_cols": ["text"]})


def test_frequent_items_matches_brute_force(spark):
    """frequent_items' two-phase top-k returns exactly the per-group
    top-k by (count desc, value asc) at any fan_in, with ties broken
    deterministically; NULL values count as one ordinary value and a
    NULL group is one ordinary group."""
    from collections import Counter

    from firebolt_spark.functions import frequent_items

    rows = []
    for i in range(200):
        rows.append(
            (["en", "fr", None][i % 3], ["a", "b", "c", "d", None][i % 5])
        )
    df = spark.createDataFrame(rows, "lang STRING, v STRING")

    expect = {}
    for lang in ("en", "fr", None):
        counts = Counter(v for g, v in rows if g == lang)
        ranked = sorted(
            counts.items(), key=lambda t: (-t[1], t[0] if t[0] is not None else "")
        )
        expect[lang] = set(ranked[:3])

    for fan_in in (1, 4, 16):
        got = {}
        for r in frequent_items(
            df, "v", k=3, group_cols=["lang"], fan_in=fan_in
        ).collect():
            got.setdefault(r["lang"], set()).add((r["v"], r["cnt"]))
        # counts must agree exactly; membership may differ from the
        # python mirror only where NULL's sort position differs, so
        # compare counts per value
        assert {
            lang: {c for _, c in vals} for lang, vals in got.items()
        } == {lang: {c for _, c in vals} for lang, vals in expect.items()}
        for lang, vals in got.items():
            assert len(vals) == 3, f"{lang} fan_in={fan_in}"


def test_frequent_items_k_exceeds_distinct(spark):
    """k larger than the number of distinct values returns the whole
    histogram, exactly counted."""
    from firebolt_spark.functions import frequent_items

    df = spark.createDataFrame(
        [("x",), ("x",), ("y",)], "v STRING"
    )
    got = {r["v"]: r["cnt"] for r in frequent_items(df, "v", k=10).collect()}
    assert got == {"x": 2, "y": 1}


def test_interleave_strata_matches_brute_force(spark):
    """interleave_strata's two-phase rank equals the per-stratum
    row_number over (md5 hash, key) at any fan_in — each stratum's
    ranks are exactly 1..n with no gaps, and the interleaved sort
    order (rank, stratum) round-robins the strata."""
    import hashlib

    from firebolt_spark.operators.mixture import interleave_strata

    rows = [(i, ["en", "fr", None][i % 3]) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING")

    def h(doc_id):
        return int(hashlib.md5(f"{doc_id}#i".encode()).hexdigest()[:8], 16)

    expect = {}
    for lang in ("en", "fr", None):
        order = sorted(
            (t[0] for t in rows if t[1] == lang), key=lambda d: (h(d), d)
        )
        for pos, d in enumerate(order, start=1):
            expect[d] = pos

    for fan_in in (1, 4, 32):
        got = {
            r["doc_id"]: r["interleave_rank"]
            for r in interleave_strata(
                df, "lang", "doc_id", salt="i", fan_in=fan_in
            ).collect()
        }
        assert got == expect, f"fan_in={fan_in}"


def test_interleave_strata_node(spark):
    """The interleave_strata YAML node validates params and emits
    dense per-stratum ranks."""
    import pytest as _pytest

    from firebolt_spark.operators.llm_nodes import InterleaveStrataNode

    df = spark.createDataFrame(
        [(i, "en" if i % 2 else "fr") for i in range(8)],
        ["doc_id", "lang"],
    )
    out = InterleaveStrataNode({"strata_col": "lang"}).transform(df)
    ranks = {}
    for r in out.collect():
        ranks.setdefault(r["lang"], []).append(r["interleave_rank"])
    assert all(sorted(v) == [1, 2, 3, 4] for v in ranks.values())
    with _pytest.raises(ValueError):
        InterleaveStrataNode({})


def test_quantile_sketch_merge_equals_one_shot(spark):
    """The bottom-k rank sketch's mergeability contract (round 13 —
    VERDICT r12 Next #6): sketch each shard, merge the shard sketches,
    and the result is BIT-IDENTICAL to the one-shot sketch — including
    across fan_in choices and HETEROGENEOUS build k (min build k >=
    merge k), the case the r12 kmv_merge bug taught us to pin."""
    from firebolt_spark.functions import quantile_sketch, quantile_sketch_merge

    df = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], float(i * 7 % 101)) for i in range(400)],
        "doc_id BIGINT, lang STRING, score DOUBLE",
    )
    whole = {
        r["lang"]: r["qsk"]
        for r in quantile_sketch(
            df, "score", "doc_id", k=32, group_cols=["lang"], salt="m"
        ).collect()
    }
    shards = [
        quantile_sketch(
            df.filter(F.col("doc_id") % 3 == s),
            "score", "doc_id", k=32, group_cols=["lang"], salt="m",
            fan_in=1 + s,
        )
        for s in range(3)
    ]
    stacked = shards[0].unionByName(shards[1]).unionByName(shards[2])
    merged = {
        r["lang"]: r["qsk"]
        for r in quantile_sketch_merge(
            stacked, "qsk", k=32, group_cols=["lang"]
        ).collect()
    }
    assert merged == whole

    # heterogeneous build k: a k=64 part merged with a k=32 part at
    # merge k=32 equals the one-shot k=32 sketch, no duplicate tickets
    wide = quantile_sketch(
        df, "score", "doc_id", k=64, group_cols=["lang"], salt="m"
    )
    het = {
        r["lang"]: r["qsk"]
        for r in quantile_sketch_merge(
            stacked.unionByName(wide), "qsk", k=32, group_cols=["lang"]
        ).collect()
    }
    assert het == whole
    for arr in het.values():
        hs = [s["h"] for s in arr]
        assert hs == sorted(hs) and len(hs) == len(set(hs))


def test_quantile_sketch_merge_validates_and_dedupes_collisions(spark):
    """quantile_sketch_merge enforces the (salt, k) compatibility
    contract inside the merge aggregate (mixed salts or a build k
    below the merge k fail the job), merges legacy rows without the
    parameter columns, and resolves a 48-bit ticket collision across
    shards to the SMALLER value — the build-side rule."""
    import pytest as _pytest

    from firebolt_spark.functions import quantile_sketch, quantile_sketch_merge

    df = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "doc_id BIGINT, v DOUBLE"
    )
    a = quantile_sketch(df, "v", "doc_id", k=32, salt="x")
    assert set(a.columns) == {"qsk", "qsk_k", "qsk_salt"}
    b = quantile_sketch(df, "v", "doc_id", k=32, salt="y")
    with _pytest.raises(Exception, match="incompatible sketch rows"):
        quantile_sketch_merge(a.unionByName(b), "qsk", k=32).collect()
    with _pytest.raises(Exception, match="incompatible sketch rows"):
        quantile_sketch_merge(a, "qsk", k=64).collect()

    out = quantile_sketch_merge(a, "qsk", k=16).collect()[0]
    assert len(out["qsk"]) == 16
    assert out["qsk_k"] == 16 and out["qsk_salt"] == "x"
    legacy = a.select("qsk")
    assert (
        quantile_sketch_merge(legacy, "qsk", k=16).collect()[0]["qsk"]
        == out["qsk"]
    )

    # forced ticket collision: two shard rows share h=5 with different
    # values — the merged sketch keeps (5, 1.0), not both
    ddl = "qsk ARRAY<STRUCT<h: BIGINT, v: DOUBLE>>"
    s1 = spark.createDataFrame([([(5, 1.0), (9, 3.0)],)], ddl)
    s2 = spark.createDataFrame([([(5, 2.0), (7, 4.0)],)], ddl)
    got = quantile_sketch_merge(
        s1.unionByName(s2), "qsk", k=8
    ).collect()[0]["qsk"]
    assert [(s["h"], s["v"]) for s in got] == [(5, 1.0), (7, 4.0), (9, 3.0)]


def test_quantile_sketch_rank_error_within_dkw_bound(spark):
    """The sketch's accuracy contract: estimated quantiles land within
    the uniform-sampling DKW rank-error band eps = sqrt(ln(2/d)/(2k))
    (d = 0.01) of the true rank, across shaped distributions (uniform,
    quadratic-skew, heavy-duplicate) and salts. Deterministic: content
    hashes, no RNG, so the draw is fixed per (salt, ids) and the
    assertion is stable."""
    import math

    from firebolt_spark.functions import quantile_sketch, quantile_sketch_quantiles

    n, k = 4000, 256
    eps = math.sqrt(math.log(2 / 0.01) / (2 * k))  # ~0.102 at k=256
    dists = {
        "uniform": [float(i) for i in range(n)],
        "quadratic": [float(i * i) for i in range(n)],
        "dupheavy": [float(min(i % 97, 5)) for i in range(n)],
    }
    for name, values in dists.items():
        ordered = sorted(values)
        for salt in ("a", "b"):
            df = spark.createDataFrame(
                list(enumerate(values)), "doc_id BIGINT, v DOUBLE"
            )
            sk = quantile_sketch(df, "v", "doc_id", k=k, salt=salt)
            est = {
                r["q"]: r["est_disc"]
                for r in quantile_sketch_quantiles(
                    sk, [0.1, 0.25, 0.5, 0.75, 0.9]
                ).collect()
            }
            for q, v in est.items():
                # realized rank band of the estimate in the TRUE data
                lo_rank = next(
                    i for i, x in enumerate(ordered) if x >= v
                ) / n
                hi_rank = sum(1 for x in ordered if x <= v) / n
                assert lo_rank - eps <= q <= hi_rank + eps, (
                    f"{name}/{salt}: q={q} estimate {v} has true rank "
                    f"[{lo_rank:.3f}, {hi_rank:.3f}], outside ±{eps:.3f}"
                )


def test_priority_sketch_merge_equals_one_shot(spark):
    """Priority sampling's mergeability contract (round 13, beyond the
    verdict list): sketch each shard, merge the shard sketches, and
    the result is BIT-IDENTICAL to the one-shot sketch — sample AND
    tau — across fan_in choices and HETEROGENEOUS build k (min build
    k >= merge k). Tau is the hard part: the one-shot (k+1)-th
    priority may be an item NO shard sampled, recovered because it was
    then some shard's own tau."""
    from firebolt_spark.functions import priority_sketch, priority_sketch_merge

    df = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], float(1 + i * 13 % 97)) for i in range(400)],
        "doc_id BIGINT, lang STRING, w DOUBLE",
    )
    whole = {
        (r["lang"]): (r["psk"], r["psk_tau"])
        for r in priority_sketch(
            df, "w", "doc_id", k=16, group_cols=["lang"], salt="m"
        ).collect()
    }
    shards = [
        priority_sketch(
            df.filter(F.col("doc_id") % 3 == s),
            "w", "doc_id", k=16, group_cols=["lang"], salt="m",
            fan_in=1 + s,
        )
        for s in range(3)
    ]
    stacked = shards[0].unionByName(shards[1]).unionByName(shards[2])
    merged = {
        (r["lang"]): (r["psk"], r["psk_tau"])
        for r in priority_sketch_merge(
            stacked, "psk", k=16, group_cols=["lang"]
        ).collect()
    }
    assert merged == whole

    # heterogeneous build k: a k=32 part beside the k=16 shards, merged
    # at k=16, equals the one-shot k=16 sketch with no duplicate tickets
    wide = priority_sketch(
        df, "w", "doc_id", k=32, group_cols=["lang"], salt="m"
    )
    het = {
        (r["lang"]): (r["psk"], r["psk_tau"])
        for r in priority_sketch_merge(
            stacked.unionByName(wide), "psk", k=16, group_cols=["lang"]
        ).collect()
    }
    assert het == whole
    for arr, _tau in het.values():
        hs = [s["h"] for s in arr]
        assert len(hs) == len(set(hs))
        ps = [s["p"] for s in arr]
        assert ps == sorted(ps, reverse=True)


def test_priority_sketch_merge_validates_and_resolves_collisions(spark):
    """priority_sketch_merge enforces the (salt, k) compatibility
    contract (mixed salts or a build k below the merge k fail the
    job), re-stamps merged rows with (merge k, shared salt), merges
    legacy rows without the parameter columns, and resolves a ticket
    collision across shards to the LARGER weight — the build rule."""
    import pytest as _pytest

    from firebolt_spark.functions import priority_sketch, priority_sketch_merge

    df = spark.createDataFrame(
        [(i, float(1 + i)) for i in range(100)], "doc_id BIGINT, w DOUBLE"
    )
    a = priority_sketch(df, "w", "doc_id", k=32, salt="x")
    assert set(a.columns) == {"psk", "psk_tau", "psk_k", "psk_salt"}
    b = priority_sketch(df, "w", "doc_id", k=32, salt="y")
    with _pytest.raises(Exception, match="incompatible sketch rows"):
        priority_sketch_merge(a.unionByName(b), "psk", k=32).collect()
    with _pytest.raises(Exception, match="incompatible sketch rows"):
        priority_sketch_merge(a, "psk", k=64).collect()

    out = priority_sketch_merge(a, "psk", k=16).collect()[0]
    assert len(out["psk"]) == 16
    assert out["psk_k"] == 16 and out["psk_salt"] == "x"
    # a self-merge at the build k is a no-op (sample and tau)
    noop = priority_sketch_merge(a, "psk", k=32).collect()[0]
    orig = a.collect()[0]
    assert noop["psk"] == orig["psk"] and noop["psk_tau"] == orig["psk_tau"]
    legacy = a.select("psk", "psk_tau")
    lg = priority_sketch_merge(legacy, "psk", k=16).collect()[0]
    assert lg["psk"] == out["psk"] and lg["psk_tau"] == out["psk_tau"]

    # forced ticket collision: two shard rows share h=5 with different
    # weights — the merged sketch keeps the larger weight's entry once
    ddl = (
        "psk ARRAY<STRUCT<p: DOUBLE, h: BIGINT, w: DOUBLE>>, "
        "psk_tau DOUBLE"
    )
    s1 = spark.createDataFrame([([(10.0, 5, 1.0), (6.0, 9, 3.0)], 0.0)], ddl)
    s2 = spark.createDataFrame([([(20.0, 5, 2.0), (7.0, 7, 4.0)], 0.0)], ddl)
    got = priority_sketch_merge(
        s1.unionByName(s2), "psk", k=8
    ).collect()[0]["psk"]
    assert [(s["p"], s["h"], s["w"]) for s in got] == [
        (20.0, 5, 2.0), (7.0, 7, 4.0), (6.0, 9, 3.0)
    ]


def test_priority_sketch_totals_exact_and_estimator(spark):
    """The DLT subset-sum estimator contract: EXACT while the sketch
    is not full (tau = 0), and within the priority-sampling error band
    above (deterministic here — content hashes, no RNG, so the draw is
    fixed per salt and the assertion is stable). NULL / NaN /
    non-positive weights are excluded like weighted_sample."""
    from firebolt_spark.functions import priority_sketch, priority_sketch_totals

    small = spark.createDataFrame(
        [(i, float(i + 1)) for i in range(10)]
        + [(100, None), (101, float("nan")), (102, -3.0), (103, 0.0)],
        "doc_id BIGINT, w DOUBLE",
    )
    row = priority_sketch_totals(
        priority_sketch(small, "w", "doc_id", k=32, salt="t")
    ).collect()[0]
    assert row["n_sampled"] == 10
    assert row["tau"] == 0.0
    assert row["est_total_weight"] == 55.0  # exact: sum(1..10)

    big = spark.createDataFrame(
        [(i, float(1 + (i * 31) % 1000)) for i in range(5000)],
        "doc_id BIGINT, w DOUBLE",
    )
    exact = 5000 * (1 + 1000) / 2.0  # values cycle 1..1000 uniformly-ish
    est = priority_sketch_totals(
        priority_sketch(big, "w", "doc_id", k=256, salt="t")
    ).collect()[0]["est_total_weight"]
    # DLT: relative error ~ 1/sqrt(k); this salt's draw lands at <2%
    assert abs(est - exact) / exact < 0.10


def test_priority_sketch_tau_and_order_semantics(spark):
    """Pin the sketch internals against a pure-python replay: the
    lottery (md5-prefix 48-bit hash), the priority arithmetic, the
    canonical (p DESC, h DESC) order, tau = the (k+1)-th priority, and
    the duplicate-id larger-weight rule."""
    import hashlib

    from firebolt_spark.functions import priority_sketch

    rows = [(i, float(1 + i % 7)) for i in range(40)]
    k = 8

    def h48(v):
        return int(hashlib.md5(f"{v}#z".encode()).hexdigest()[:12], 16)

    cand = sorted(
        (((w * float(1 << 48)) / (h48(i) + 1.0), h48(i), w) for i, w in rows),
        key=lambda t: (t[0], t[1]),
        reverse=True,
    )
    got = priority_sketch(
        spark.createDataFrame(rows, "doc_id BIGINT, w DOUBLE"),
        "w", "doc_id", k=k, salt="z",
    ).collect()[0]
    assert [(s["p"], s["h"], s["w"]) for s in got["psk"]] == cand[:k]
    assert got["psk_tau"] == cand[k][0]

    # duplicate id (out-of-contract weights): larger weight wins its
    # single ticket — one deterministic fate, never two entries
    dup = spark.createDataFrame(
        [(1, 5.0), (1, 9.0), (2, 4.0)], "doc_id BIGINT, w DOUBLE"
    )
    arr = priority_sketch(dup, "w", "doc_id", k=8, salt="z").collect()[0][
        "psk"
    ]
    assert sorted(s["w"] for s in arr) == [4.0, 9.0]


def test_lzw_roundtrip_and_kwkwk():
    """The GIF LZW pair (round 13): encode→decode is identity across
    code-width boundaries and table-full CLEAR resets, and the decoder
    handles the KwKwK case (a code equal to the next unassigned entry)
    that run-heavy inputs make any conformant encoder emit."""
    import random

    from firebolt_spark.operators.multimodal import _lzw_decode, _lzw_encode

    rng = random.Random(7)
    cases = [b"", b"\x00", bytes([5] * 10), bytes(range(256)) * 3]
    for n in (1, 7, 100, 1000, 20000):
        cases.append(bytes(rng.randrange(256) for _ in range(n)))
        cases.append(bytes(rng.randrange(4) for _ in range(n)))
    cases += [
        bytes([1] * 30000),          # KwKwK chains
        bytes([0, 1] * 15000),       # alternation
        bytes(i % 16 for i in range(40000)),  # forces 4096-entry resets
    ]
    for mcs in (2, 3, 4, 8):
        for c in cases:
            if mcs < 8 and any(b >= (1 << mcs) for b in c):
                continue
            assert _lzw_decode(_lzw_encode(c, mcs), mcs, len(c)) == c

    # the minimal KwKwK stream: [1,1,1] at mcs=2 encodes as
    # CLEAR, 1, 6 (== next unassigned), EOI — decode must expand 6 to
    # prev + prev[0] = [1,1]
    assert _lzw_decode(_lzw_encode(bytes([1, 1, 1]), 2), 2, 3) == bytes(
        [1, 1, 1]
    )

    # malformed streams refuse: code past the table, bits exhausted
    assert _lzw_decode(b"", 2, 10) is None
    assert _lzw_decode(b"\xff\xff\xff", 2, 2) is None  # output overrun


def test_gif_decode_canonical_red_pixel():
    """INDEPENDENT known-answer check: the classic hand-assembled 1x1
    red GIF89a (2-entry palette, mcs=2, data codes 44 01) — bytes from
    the GIF89a spec walkthrough, NOT our encoder — must decode to one
    pure-red pixel."""
    from firebolt_spark.operators.multimodal import _gif_decode_py

    red = bytes.fromhex(
        "474946383961010001008000"
        "00ff000000000021f90400000000002c"
        "00000000010001000002024401003b"
    )
    d = _gif_decode_py(red)
    assert d is not None
    assert (d["width"], d["height"], d["n_frames"]) == (1, 1, 1)
    assert (d["mean_r"], d["mean_g"], d["mean_b"]) == (255.0, 0.0, 0.0)
    assert d["frame_means"] == [[255.0, 0.0, 0.0]]


def test_gif_codec_roundtrip_and_rejections():
    """Encode→decode recovers every frame's palette-index plane
    bit-exactly; the decoder refuses (None, never garbage) bad magic,
    truncation, sub-canvas frames, a missing trailer, and an index
    past the frame's palette."""
    import hashlib
    import struct

    from firebolt_spark.operators.multimodal import (
        _gif_decode_py, _gif_encode_py,
    )

    w, h = 8, 3
    frames = [
        (hashlib.md5(f"frame{f}".encode()).digest() * 2)[: w * h]
        for f in range(3)
    ]
    p = _gif_encode_py(frames, w, h)
    d = _gif_decode_py(p)
    assert d is not None and d["frames"] == frames
    assert (d["width"], d["height"], d["n_frames"]) == (w, h, 3)

    assert _gif_decode_py(b"BM" + p[2:]) is None        # wrong magic
    assert _gif_decode_py(p[:-1]) is None               # no trailer
    assert _gif_decode_py(p[:40]) is None               # truncated

    # image descriptor packed byte: header 13 + GCT 768, then the GCE
    # (8 bytes), then 0x2C + 8 descriptor bytes -> packed at +9
    idesc = 13 + 768 + 8
    assert p[idesc] == 0x2C
    flip = bytearray(p)
    flip[idesc + 1 : idesc + 3] = struct.pack("<H", 2)   # left offset
    assert _gif_decode_py(bytes(flip)) is None

    # an index plane referencing entries past a small palette refuses
    small = _gif_encode_py(
        [bytes([0, 1, 5, 1, 0, 1])], 3, 2, palette=bytes(6)
    )
    assert _gif_decode_py(small) is None


def test_gif_interlace_and_local_palettes():
    """Interlaced frames de-interlace through the appendix-E pass
    order (pinned by hand for h=5: stored rows map to 0,4,2,1,3) and
    a frame's LOCAL color table overrides the global one — both
    round-trip bit-exactly, and stats follow the per-frame palette."""
    import hashlib

    from firebolt_spark.operators.multimodal import (
        _gif_decode_py, _gif_encode_py, _gif_interlace_order,
    )

    assert _gif_interlace_order(5) == [0, 4, 2, 1, 3]
    assert _gif_interlace_order(9) == [0, 8, 4, 2, 6, 1, 3, 5, 7]

    w, h = 6, 5
    frames = [
        (hashlib.md5(f"il{f}".encode()).digest() * 2)[: w * h]
        for f in range(2)
    ]
    plain = _gif_encode_py(frames, w, h)
    laced = _gif_encode_py(frames, w, h, interlace=True)
    assert plain != laced  # rows genuinely stored in pass order
    d = _gif_decode_py(laced)
    assert d is not None and d["frames"] == frames
    assert d["frame_means"] == _gif_decode_py(plain)["frame_means"]

    # local palette: frame 1 maps every index to pure blue — overall
    # means must mix the global-palette frame with the all-blue one
    blue = bytes(
        v for _ in range(256) for v in (0, 0, 255)
    )
    mixed = _gif_encode_py(
        frames, w, h, frame_palettes=[None, blue]
    )
    dm = _gif_decode_py(mixed)
    assert dm is not None and dm["frames"] == frames
    assert dm["frame_means"][1] == [0.0, 0.0, 255.0]
    assert dm["frame_means"][0] == d["frame_means"][0]
    assert dm["frame_palettes"][1] == blue

    # a GIF with NO global palette but a local one on every frame
    nogct = _gif_encode_py(
        [frames[0]], w, h, palette=None, frame_palettes=[blue]
    )
    dn = _gif_decode_py(nogct)
    assert dn is not None and dn["frame_means"] == [[0.0, 0.0, 255.0]]


def test_gif_features_match_analytic_stats(spark, sf_dir):
    """The REAL GIF decode path end-to-end: gif_encode emits valid
    LZW-compressed multi-frame GIFs; extract_features(decode_stub=
    False) must report exactly the channel statistics computed
    analytically from the md5 index stream and the affine palette —
    the same arithmetic the SQL oracle replays."""
    import hashlib

    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(30)
    media = multimodal.gif_encode(docs)
    feats = {
        r["doc_id"]: r
        for r in multimodal.extract_features(
            media, decode_stub=False
        ).collect()
    }
    for rec in docs.select("doc_id", "text").collect():
        doc_id = int(rec["doc_id"])
        w, h = 4 * (1 + doc_id % 4), 1 + doc_id % 5
        nf = 1 + doc_id % 3
        sums, n = [0, 0, 0], 0
        for f in range(nf):
            digest = hashlib.md5(
                ((rec["text"] or "") + f"#f{f}").encode()
            ).digest()
            for i in (digest * 5)[: w * h]:
                sums[0] += (37 * i) % 256
                sums[1] += (59 * i) % 256
                sums[2] += (83 * i) % 256
                n += 1
        row = feats[doc_id]
        assert (row["width"], row["height"], row["n_frames"]) == (w, h, nf)
        got = list(row["feature"])  # [b, g, r, all]
        assert got[0] == round(sums[2] / n, 6)
        assert got[1] == round(sums[1] / n, 6)
        assert got[2] == round(sums[0] / n, 6)
        assert got[3] == round(sum(sums) / (3 * n), 6)


def test_gif_resize_reference_and_identity(spark, sf_dir):
    """GIF resize: identity dims round-trip every frame's index plane
    byte-for-byte; a real resize NN-selects indices with the shared
    (dst * src) // dst arithmetic on every frame; resize_media
    dispatches on the magic and the output re-parses."""
    import hashlib

    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal
    from firebolt_spark.operators.multimodal import (
        _gif_decode_py, _gif_encode_py, _gif_resize_py,
    )

    w, h = 8, 4
    frames = [
        (hashlib.md5(f"rz{f}".encode()).digest() * 2)[: w * h]
        for f in range(2)
    ]
    p = _gif_encode_py(frames, w, h)
    assert _gif_decode_py(_gif_resize_py(p, w, h))["frames"] == frames

    out = _gif_decode_py(_gif_resize_py(p, 3, 2))
    assert (out["width"], out["height"], out["n_frames"]) == (3, 2, 2)
    for f in range(2):
        expect = bytes(
            frames[f][(j * h // 2) * w + (i * w // 3)]
            for j in range(2)
            for i in range(3)
        )
        assert out["frames"][f] == expect

    # resize re-encodes with the SOURCE's palette: the canonical red
    # 1x1 GIF (2-entry palette, nothing like the fixture's) upscaled
    # must stay pure red — the fixture palette would turn it black
    red = bytes.fromhex(
        "474946383961010001008000"
        "00ff000000000021f90400000000002c"
        "00000000010001000002024401003b"
    )
    up = _gif_decode_py(_gif_resize_py(red, 2, 2))
    assert up is not None and (up["width"], up["height"]) == (2, 2)
    assert (up["mean_r"], up["mean_g"], up["mean_b"]) == (255.0, 0.0, 0.0)

    docs = load_table(spark, sf_dir, "documents").limit(8)
    media = multimodal.gif_encode(docs)
    rz = multimodal.resize_media(media, 5, 3, decode_stub=False).collect()
    assert rz and all(r["media_meta"]["mime"] == "image/gif" for r in rz)
    for r in rz:
        d = _gif_decode_py(bytes(r["media"]))
        assert d is not None and (d["width"], d["height"]) == (5, 3)


def test_gif_frames_real_extraction(spark, sf_dir):
    """gif_frames: one row per decoded frame with that frame's own
    channel means (REAL frame extraction, not index plumbing);
    every_nth strides at decode time; non-GIF payloads raise."""
    import pytest as _pytest

    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal

    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = multimodal.gif_encode(docs)
    nf = {
        r["doc_id"]: r["n_frames"]
        for r in multimodal.extract_features(
            media, decode_stub=False
        ).collect()
    }
    rows = multimodal.gif_frames(media).collect()
    assert len(rows) == sum(nf.values())
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["frame_idx"])
    assert all(
        sorted(v) == list(range(nf[k])) for k, v in by_doc.items()
    )

    strided = multimodal.gif_frames(media, every_nth=2).collect()
    assert all(r["frame_idx"] % 2 == 0 for r in strided)
    assert len(strided) == sum((v + 1) // 2 for v in nf.values())

    with _pytest.raises(Exception, match="unsupported media format"):
        multimodal.gif_frames(
            multimodal.bmp_encode(docs.limit(2))
        ).collect()
    with _pytest.raises(ValueError):
        multimodal.gif_frames(media, every_nth=0)


def test_png_grayscale_and_palette_decode():
    """PNG color types 0 (grayscale) and 3 (palette + PLTE) decode
    with RGB expansion (round 13): stats match the hand-computed
    values, Sub filtering at bpp=1 unfilters correctly, resize rides
    the expanded pixels, and malformed palette shapes refuse."""
    import struct
    import zlib

    from firebolt_spark.operators.multimodal import (
        _PNG_SIG, _png_chunk, _png_decode_py, _png_resize_py,
    )

    def build(color_type, scanlines, w, h, plte=None):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        out = _PNG_SIG + _png_chunk(b"IHDR", ihdr)
        if plte is not None:
            out += _png_chunk(b"PLTE", plte)
        return (
            out
            + _png_chunk(b"IDAT", zlib.compress(scanlines))
            + _png_chunk(b"IEND", b"")
        )

    # grayscale 3x2: row0 None-filtered, row1 Sub-filtered at bpp=1
    # (raw row1 = 40,50,60 -> sub deltas 40,10,10)
    gray = build(
        0,
        b"\x00" + bytes([10, 20, 30]) + b"\x01" + bytes([40, 10, 10]),
        3,
        2,
    )
    d = _png_decode_py(gray)
    assert d is not None
    expect = round((10 + 20 + 30 + 40 + 50 + 60) / 6, 6)
    assert d["mean_r"] == d["mean_g"] == d["mean_b"] == expect
    assert d["mean_all"] == expect
    assert d["pixels"][:6] == bytes([10, 10, 10, 20, 20, 20])

    # palette 2x2: PLTE red/green/blue, indices 0,1,2,0
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    pal = build(3, b"\x00\x00\x01" + b"\x00\x02\x00", 2, 2, plte)
    d = _png_decode_py(pal)
    assert d is not None
    assert d["mean_r"] == round(510 / 4, 6)
    assert d["mean_g"] == round(255 / 4, 6)
    assert d["mean_b"] == round(255 / 4, 6)
    # identity resize re-encodes the EXPANDED RGB and re-parses
    rz = _png_decode_py(_png_resize_py(pal, 2, 2))
    assert rz is not None and rz["pixels"] == d["pixels"]

    # refusals: index past PLTE, type 3 without PLTE, bad PLTE length
    over = build(3, b"\x00\x00\x07" + b"\x00\x02\x00", 2, 2, plte)
    assert _png_decode_py(over) is None
    assert _png_decode_py(build(3, b"\x00\x00\x01", 2, 1)) is None
    badp = build(3, b"\x00\x00\x01", 2, 1, plte=bytes([1, 2, 3, 4]))
    assert _png_decode_py(badp) is None


def test_gif_frame_stride_skips_decode_work():
    """_gif_decode_py(frame_stride=n): dropped frames are never
    LZW-decompressed (pinned by corrupting a dropped frame's LZW data
    while keeping its block structure — the strided parse must still
    succeed, the full parse must refuse), n_frames still counts every
    frame, and frame_idxs names the kept ones. Oversized palettes
    refuse at encode."""
    import hashlib

    import pytest as _pytest

    from firebolt_spark.operators.multimodal import (
        _gif_decode_py, _gif_encode_py,
    )

    w, h = 8, 3
    frames = [
        (hashlib.md5(f"st{f}".encode()).digest() * 2)[: w * h]
        for f in range(5)
    ]
    p = _gif_encode_py(frames, w, h)
    full = _gif_decode_py(p)
    d = _gif_decode_py(p, frame_stride=2)
    assert d is not None
    assert d["n_frames"] == 5
    assert d["frame_idxs"] == [0, 2, 4]
    assert d["frames"] == [frames[0], frames[2], frames[4]]
    assert d["frame_means"] == [
        full["frame_means"][i] for i in (0, 2, 4)
    ]

    # corrupt frame 1's LZW payload IN PLACE (same block lengths):
    # header 13 + GCT 768, then per frame GCE(8) + desc(10) + blocks
    pos = 13 + 768
    spans = []
    for _ in range(5):
        pos += 8  # GCE
        assert p[pos] == 0x2C
        pos += 11  # 0x2C + 9-byte descriptor + mcs
        start = pos
        while p[pos]:
            pos += 1 + p[pos]
        pos += 1  # terminator
        spans.append((start, pos))
    bad = bytearray(p)
    s1, e1 = spans[1]
    for i in range(s1 + 1, e1 - 1):  # flip data bytes, keep lengths
        bad[i] ^= 0xFF
    bad = bytes(bad)
    assert _gif_decode_py(bad) is None            # full parse refuses
    d2 = _gif_decode_py(bad, frame_stride=2)      # frame 1 never decoded
    assert d2 is not None and d2["frame_idxs"] == [0, 2, 4]
    assert d2["frames"][0] == frames[0]

    with _pytest.raises(ValueError, match="frame_stride"):
        _gif_decode_py(p, frame_stride=0)
    with _pytest.raises(ValueError, match="256 entries"):
        _gif_encode_py([frames[0]], w, h, palette=bytes(3 * 300))


def test_png_adam7_interlaced_decode():
    """Adam7-interlaced PNG decode (round 13): a test-built interlaced
    encoding of known pixels — pass geometry asserted by hand for 8x8
    (pass widths/heights 1,1,2,2,4,4,8 rows x the spec steps) — must
    decode to EXACTLY the same pixels as the plain encoding, across
    truecolor and grayscale, with Sub filtering inside a pass; a
    truncated pass stream refuses."""
    import struct
    import zlib

    from firebolt_spark.operators.multimodal import (
        _ADAM7, _PNG_SIG, _png_chunk, _png_decode_py, _png_encode_py,
        _png_filter_row,
    )

    def interlaced(pixels, w, h, color_type, bpp, sub=False):
        scan = bytearray()
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            prev = bytes(bpp * pw)
            for j in range(ph):
                y = y0 + j * dy
                row = b"".join(
                    pixels[bpp * (y * w + x0 + i * dx):][:bpp]
                    for i in range(pw)
                )
                ft = 1 if sub else 0
                scan.append(ft)
                scan += _png_filter_row(ft, row, prev, bpp=bpp)
                prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
            + _png_chunk(b"IEND", b"")
        )

    # hand-pinned 8x8 pass geometry: (pw, ph) per pass
    dims = [
        (((8 - x0 + dx - 1) // dx), ((8 - y0 + dy - 1) // dy))
        for x0, y0, dx, dy in _ADAM7
    ]
    assert dims == [
        (1, 1), (1, 1), (2, 1), (2, 2), (4, 2), (4, 4), (8, 4)
    ]

    w, h = 8, 8
    pix = bytes((i * 7 + 3) % 256 for i in range(3 * w * h))
    plain = _png_decode_py(_png_encode_py(pix, w, h))
    for sub in (False, True):
        d = _png_decode_py(interlaced(pix, w, h, 2, 3, sub=sub))
        assert d is not None and d["pixels"] == pix
        assert d["mean_all"] == plain["mean_all"]

    # non-multiple-of-8 dims exercise the empty/partial passes
    w2, h2 = 5, 3
    pix2 = bytes((i * 11 + 1) % 256 for i in range(3 * w2 * h2))
    d = _png_decode_py(interlaced(pix2, w2, h2, 2, 3, sub=True))
    assert d is not None and d["pixels"] == pix2

    # grayscale interlaced, expanded to RGB like the plain path
    g = bytes((i * 5 + 2) % 256 for i in range(w2 * h2))
    dg = _png_decode_py(interlaced(g, w2, h2, 0, 1))
    assert dg is not None
    assert dg["pixels"] == b"".join(bytes([v, v, v]) for v in g)

    # truncated interlaced stream refuses
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
    short = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" + bytes(3)))
        + _png_chunk(b"IEND", b"")
    )
    assert _png_decode_py(short) is None


def test_sketch_and_frame_nodes(spark):
    """The round-13 YAML nodes (kmv_sketch / quantile_sketch /
    priority_sketch / frequent_items / gif_frames) wrap their
    functions faithfully — each node's transform equals the direct
    call — required params are enforced, and all five resolve through
    the registry."""
    import pytest as _pytest

    from firebolt_spark import functions as FX
    from firebolt_spark.operators import multimodal
    from firebolt_spark.operators.llm_nodes import (
        FrequentItemsNode, GifFramesNode, KmvSketchNode,
        PrioritySketchNode, QuantileSketchNode,
    )
    from firebolt_spark.registry import get_registry

    reg = get_registry()
    for name in (
        "kmv_sketch", "quantile_sketch", "priority_sketch",
        "frequent_items", "gif_frames", "transcode_media",
    ):
        assert reg.has(name), name

    df = spark.createDataFrame(
        [(i, ["en", "fr"][i % 2], float(1 + i % 7)) for i in range(60)],
        "doc_id BIGINT, lang STRING, w DOUBLE",
    )
    node = KmvSketchNode(
        {"col": "doc_id", "k": 16, "group_cols": ["lang"], "salt": "n"}
    ).transform(df).collect()
    direct = FX.kmv_sketch(
        df, "doc_id", k=16, group_cols=["lang"], salt="n"
    ).collect()
    assert sorted(map(tuple, node)) == sorted(map(tuple, direct))

    qn = QuantileSketchNode(
        {"value_col": "w", "k": 16, "group_cols": ["lang"], "salt": "n"}
    ).transform(df).collect()
    qd = FX.quantile_sketch(
        df, "w", "doc_id", k=16, group_cols=["lang"], salt="n"
    ).collect()
    assert sorted(map(tuple, qn)) == sorted(map(tuple, qd))

    pn = PrioritySketchNode(
        {"weight_col": "w", "k": 8, "group_cols": ["lang"], "salt": "n"}
    ).transform(df).collect()
    pdct = FX.priority_sketch(
        df, "w", "doc_id", k=8, group_cols=["lang"], salt="n"
    ).collect()
    assert sorted(map(tuple, pn)) == sorted(map(tuple, pdct))

    fn = FrequentItemsNode(
        {"col": "w", "k": 3, "group_cols": ["lang"]}
    ).transform(df).collect()
    fd = FX.frequent_items(df, "w", k=3, group_cols=["lang"]).collect()
    assert sorted(map(tuple, fn)) == sorted(map(tuple, fd))

    docs = df.select("doc_id", F.col("lang").alias("text")).limit(6)
    media = multimodal.gif_encode(docs)
    gn = GifFramesNode({"every_nth": 2}).transform(media).collect()
    gd = multimodal.gif_frames(media, every_nth=2).collect()
    assert sorted(map(tuple, gn)) == sorted(map(tuple, gd))

    from firebolt_spark.operators.llm_nodes import TranscodeMediaNode

    for cls, bad in (
        (KmvSketchNode, {}),
        (QuantileSketchNode, {}),
        (PrioritySketchNode, {}),
        (FrequentItemsNode, {}),
        (GifFramesNode, {"every_nth": 0}),
        (TranscodeMediaNode, {}),
        (TranscodeMediaNode, {"to": "gif"}),
    ):
        with _pytest.raises(ValueError):
            cls(bad)


def test_transcode_media_cross_codec(spark, sf_dir):
    """transcode_media: BMP -> PNG is channel-faithful (decoded PNG
    features equal the BMP decoder's on the same payloads), GIF ->
    BMP takes frame 0 through its palette, round trips are pixel
    bit-exact, the media_meta refreshes truthfully, and the gif /
    unknown targets are refused by design."""
    import hashlib

    import pytest as _pytest

    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal
    from firebolt_spark.operators.multimodal import (
        _decode_rgb_py, _gif_decode_py, _png_decode_py,
    )

    docs = load_table(spark, sf_dir, "documents").limit(12)
    bmp = multimodal.bmp_encode(docs)
    png = multimodal.transcode_media(bmp, to="png")
    rows = png.collect()
    assert rows and all(
        r["media_meta"]["kind"] == "image"
        and r["media_meta"]["mime"] == "image/png"
        and bytes(r["media"])[:8] == bytes([0x89]) + b"PNG\r\n\x1a\n"
        and r["media_meta"]["n_bytes"] == len(bytes(r["media"]))
        and r["media_meta"]["sha"]
        == hashlib.sha256(bytes(r["media"])).hexdigest()
        for r in rows
    )

    # channel-faithful: PNG-decoded features == BMP-decoded features
    fb = sorted(map(tuple, multimodal.extract_features(
        bmp, decode_stub=False
    ).collect()))
    fp = sorted(map(tuple, multimodal.extract_features(
        png.select("doc_id", "media", "media_meta"), decode_stub=False
    ).collect()))
    assert [t[0:1] + t[4:] for t in fb] == [t[0:1] + t[4:] for t in fp]

    # round trip: BMP -> PNG -> BMP pixels bit-exact
    back = multimodal.transcode_media(png, to="bmp").collect()
    orig = {r["doc_id"]: bytes(r["media"]) for r in bmp.collect()}
    for r in back:
        assert (
            _decode_rgb_py(bytes(r["media"]))
            == _decode_rgb_py(orig[r["doc_id"]])
        )

    # GIF frame 0 -> PNG through the palette
    gif = multimodal.gif_encode(docs.limit(4))
    gp = multimodal.transcode_media(gif, to="png").collect()
    # a GIF animation (kind='video') transcodes to a STILL: kind=image
    assert all(r["media_meta"]["kind"] == "image" for r in gp)
    gsrc = {r["doc_id"]: bytes(r["media"]) for r in gif.collect()}
    for r in gp:
        d = _gif_decode_py(gsrc[r["doc_id"]])
        assert (
            _png_decode_py(bytes(r["media"]))["pixels"]
            == _decode_rgb_py(gsrc[r["doc_id"]])[2]
        )
        assert r["width"] == d["width"] and r["height"] == d["height"]

    with _pytest.raises(ValueError, match="quantization"):
        multimodal.transcode_media(bmp, to="gif")
    with _pytest.raises(ValueError, match="transcode target"):
        multimodal.transcode_media(bmp, to="jpeg")
    with _pytest.raises(Exception, match="unsupported media format"):
        multimodal.transcode_media(
            multimodal.wav_encode(docs.limit(2)), to="png"
        ).collect()


def test_wav_8bit_pcm_both_paths(spark):
    """8-bit PCM WAV (round 13 — the legacy width): the builtin-SQL
    and pandas decoders agree bit-for-bit on valid 8-bit payloads
    (midpoint-128 samples), both REFUSE other widths identically
    (NULL fields / None), the stats match hand-computed values, and
    resampling re-encodes at the source width."""
    import math
    import struct

    from firebolt_spark.operators import multimodal
    from firebolt_spark.operators.multimodal import (
        _wav_decode_py, _wav_encode_py, _wav_resample_py,
    )

    # mono 8-bit: samples (midpoint-signed) -128..127
    s8 = [-128, -1, 0, 1, 127, 64, -64, 32]
    p8 = _wav_encode_py(s8, 1, 8000, bits=8)
    d = _wav_decode_py(p8)
    assert d is not None and d["bits"] == 8
    assert d["n_channels"] == 1 and d["n_samples"] == 8
    n = len(s8)
    assert d["mean_pcm"] == round(sum(s8) / n, 6)
    assert d["rms_pcm"] == round(math.sqrt(sum(v * v for v in s8) / n), 6)

    # stereo 8-bit with an odd total byte count per channel refusal:
    # 3 bytes over 2 channels violates block alignment in BOTH paths
    bad_align = _wav_encode_py([0, 1, 2, 3], 2, 8000, bits=8)
    bad_align = bytearray(bad_align)
    # shrink data by one byte and fix both size fields
    bad_align[40:44] = struct.pack("<I", 3)
    bad_align[4:8] = struct.pack("<I", 36 + 3)
    bad_align = bytes(bad_align[:47])
    assert _wav_decode_py(bad_align) is None

    # 24-bit refused by both paths
    p24 = bytearray(_wav_encode_py([0, 1], 1, 8000, bits=16))
    p24[34:36] = struct.pack("<H", 24)
    assert _wav_decode_py(bytes(p24)) is None

    # the builtin-SQL path agrees on all of the above
    rows = spark.createDataFrame(
        [(1, p8), (2, bad_align), (3, bytes(p24))],
        "doc_id BIGINT, media BINARY",
    )
    got = {
        r["doc_id"]: r
        for r in multimodal.wav_decode(rows).collect()
    }
    assert got[1]["n_channels"] == 1 and got[1]["n_samples"] == 8
    assert got[1]["mean_pcm"] == d["mean_pcm"]
    assert got[1]["rms_pcm"] == d["rms_pcm"]
    for bad_id in (2, 3):
        assert got[bad_id]["n_channels"] is None
        assert got[bad_id]["mean_pcm"] is None

    # resample keeps the 8-bit width and the NN selection
    rz = _wav_resample_py(p8, 4000)
    dz = _wav_decode_py(rz)
    assert dz is not None and dz["bits"] == 8 and dz["sample_rate"] == 4000
    assert dz["n_samples"] == 4
    assert list(dz["samples"]) == [s8[(j * 8) // 4] for j in range(4)]


def test_wav_odd_chunk_riff_padding(spark):
    """RIFF word alignment (round 13 review): an odd-sized 8-bit data
    chunk — reachable only at 8-bit mono — is emitted WITH the spec's
    pad byte by both encoders, and both decoders accept the padded
    AND the unpadded legacy form identically (the pad is never read
    as a sample)."""
    import struct

    from firebolt_spark.operators import multimodal
    from firebolt_spark.operators.multimodal import (
        _wav_decode_py, _wav_encode_py,
    )

    s8 = [10, -20, 30]  # mono, odd byte count
    p = _wav_encode_py(s8, 1, 8000, bits=8)
    assert len(p) == 44 + 3 + 1 and p[-1] == 0          # pad emitted
    assert struct.unpack_from("<I", p, 4)[0] == 36 + 4  # riff size
    assert struct.unpack_from("<I", p, 40)[0] == 3      # data size
    d = _wav_decode_py(p)
    assert d is not None and list(d["samples"]) == s8

    unpadded = p[:-1]  # legacy writers omit the pad
    ru = bytearray(unpadded)
    ru[4:8] = struct.pack("<I", 36 + 3)
    d2 = _wav_decode_py(bytes(ru))
    assert d2 is not None and list(d2["samples"]) == s8

    # the builtin path accepts both forms with identical stats, and
    # the hex-expression encoder emits the padded form for odd chunks
    from firebolt_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    odd = docs.filter(  # nch=1 (even doc_id) and odd nsamp
        (F.col("doc_id") % 2 == 0) & ((16 + F.col("doc_id") % 25) % 2 == 1)
    ).limit(4)
    enc = multimodal.wav_encode(odd, bits=8).collect()
    assert enc
    for r in enc:
        payload = bytes(r["media"])
        dsz = struct.unpack_from("<I", payload, 40)[0]
        assert dsz % 2 == 1 and len(payload) == 45 + dsz
        assert _wav_decode_py(payload) is not None

    rows = spark.createDataFrame(
        [(1, p), (2, bytes(ru))], "doc_id BIGINT, media BINARY"
    )
    got = {r["doc_id"]: r for r in multimodal.wav_decode(rows).collect()}
    assert got[1]["mean_pcm"] == got[2]["mean_pcm"] == d["mean_pcm"]
    assert got[1]["n_samples"] == got[2]["n_samples"] == 3


def test_bmp_compressed_payloads_refused_everywhere(spark):
    """A 24-bpp BMP header with biCompression != 0 (BI_RLE / 
    BI_BITFIELDS) does NOT carry raw BGR rows; all four decode paths
    (SQL bmp_decode, _bmp_decode_py, _bmp_resize_py, _decode_rgb_py)
    must refuse it rather than mis-decode (ADVICE r13)."""
    import struct as st

    from firebolt_spark.operators.multimodal import (
        _bmp_decode_py, _bmp_resize_py, _decode_rgb_py, bmp_encode,
    )
    from firebolt_spark.catalog import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    good = bytes(bmp_encode(docs.limit(1)).collect()[0]["media"])
    assert _bmp_decode_py(good) is not None  # sanity: fixture decodes

    bad = bytearray(good)
    bad[30:34] = st.pack("<I", 3)  # BI_BITFIELDS
    bad = bytes(bad)

    assert _bmp_decode_py(bad) is None
    assert _bmp_resize_py(bad, 4, 4) is None
    assert _decode_rgb_py(bad) is None
    df = spark.createDataFrame(
        [(0, good), (1, bad)], "doc_id BIGINT, media BINARY"
    )
    from firebolt_spark.operators import multimodal as mm

    rows = {r["doc_id"]: r for r in mm.bmp_decode(df).collect()}
    assert rows[0]["mean_all"] is not None
    assert rows[1]["width"] is None and rows[1]["mean_all"] is None


def test_frequent_items_node_rejects_inapplicable_params():
    """FrequentItemsNode takes neither 'out_col' nor 'salt'
    (frequent_items is an exact count, not a salted sketch); a spec
    that sets them must fail loudly instead of being silently ignored
    (ADVICE r13)."""
    import pytest as _pytest

    from firebolt_spark.operators.llm_nodes import FrequentItemsNode

    FrequentItemsNode({"col": "source", "count_col": "n"})  # fine
    with _pytest.raises(ValueError, match="out_col"):
        FrequentItemsNode({"col": "source", "out_col": "n"})
    with _pytest.raises(ValueError, match="salt"):
        FrequentItemsNode({"col": "source", "salt": "x"})


def test_gif_frames_tolerates_missing_media_meta(spark):
    """gif_frames over media whose media_meta is NULL or lacks 'sha'
    (media from a non-encode source) must not die with an opaque
    KeyError inside the Arrow batch: the sha column falls back to the
    payload's own sha256 (ADVICE r13)."""
    import hashlib as _hashlib

    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal as mm

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    media = mm.gif_encode(docs.limit(3))
    bare = media.select("doc_id", "media").withColumn(
        "media_meta",
        F.lit(None).cast(
            "struct<kind:string,mime:string,n_bytes:bigint,sha:string>"
        ),
    )
    rows = mm.gif_frames(bare).collect()
    assert rows
    payloads = {r["doc_id"]: bytes(r["media"]) for r in media.collect()}
    for r in rows:
        assert r["sha"] == _hashlib.sha256(payloads[r["doc_id"]]).hexdigest()


def test_gif_composite_disposal_and_transparency():
    """Sub-canvas compositing (round 14): every disposal method against
    hand-computed canvases on a 3x2 screen with palette indices whose
    colors are the affine (37i, 59i, 83i) % 256.

    Layout: frame 0 fills the canvas with index 1; frame 1 paints a
    1x1 rect of index 2 at (1, 0) with index-7 transparency declared;
    frame 2 is full-canvas index 3 with a transparent hole (index 7)
    at every position — what shows through depends on frame 1's
    disposal."""
    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _GIF_PALETTE, _gif_decode_py, _gif_encode_py,
    )

    pal = np.frombuffer(_GIF_PALETTE, np.uint8).reshape(-1, 3)
    w, h = 3, 2
    f0 = bytes([1] * 6)
    f1 = bytes([2])
    f2 = bytes([3, 7, 3, 7, 3, 3])  # holes at positions 1 and 3

    def composited(disposal1):
        payload = _gif_encode_py(
            [f0, f1, f2], w, h,
            frame_rects=[(0, 0, 3, 2), (1, 0, 1, 1), (0, 0, 3, 2)],
            disposals=[1, disposal1, 0],
            transparent_idxs=[None, 7, 7],
            bg=5,
        )
        parsed = _gif_decode_py(payload)
        assert parsed is not None and parsed["rgb"]
        assert parsed["n_frames"] == 3
        return [
            np.frombuffer(fr, np.uint8).reshape(h, w, 3)
            for fr in parsed["frames"]
        ]

    for disposal1, hole1, hole3 in [
        (0, 2, 1),  # keep: frame 1's rect pixel persists at pos 1
        (1, 2, 1),  # explicit do-not-dispose: same
        (2, 5, 1),  # restore to background: pos 1 shows bg index 5
        (3, 1, 1),  # restore to previous: pos 1 back to frame 0's 1
    ]:
        frames = composited(disposal1)
        assert (frames[0] == pal[1]).all()
        expect1 = np.tile(pal[1], (h, w, 1))
        expect1[0, 1] = pal[2]
        assert (frames[1] == expect1).all(), disposal1
        expect2 = np.tile(pal[3], (h, w, 1))
        expect2[0, 1] = pal[hole1]  # hole over frame 1's rect
        expect2[1, 0] = pal[hole3]  # hole over untouched canvas
        assert (frames[2] == expect2).all(), disposal1

    # background seeding: a sub-canvas FIRST frame exposes pal[bg]
    p = _gif_encode_py(
        [f1], w, h, frame_rects=[(1, 0, 1, 1)], disposals=[0],
        transparent_idxs=[None], bg=9,
    )
    parsed = _gif_decode_py(p)
    assert parsed is not None and parsed["rgb"]
    first = np.frombuffer(parsed["frames"][0], np.uint8).reshape(h, w, 3)
    expect = np.tile(pal[9], (h, w, 1))
    expect[0, 1] = pal[2]
    assert (first == expect).all()


def test_gif_composite_refusals_and_stride():
    """Composite-shape guardrails: rect past the canvas, disposal > 3,
    no-GCT composite, and bad background index all refuse (None);
    stride skips the LZW decompress of disposal-2/3 dropped frames but
    still decodes persisting (disposal 0/1) dropped ones."""
    import struct as st

    from firebolt_spark.operators import multimodal as mm

    w, h = 4, 3
    f_full = bytes([1] * 12)
    f_sub = bytes([2, 3])

    good = mm._gif_encode_py(
        [f_full, f_sub], w, h,
        frame_rects=[(0, 0, 4, 3), (2, 1, 2, 1)],
        disposals=[1, 1], transparent_idxs=[None, None],
    )
    assert mm._gif_decode_py(good) is not None

    # rect past the canvas: corrupt frame 2's descriptor left to 3
    # (3 + fw 2 > w 4). The descriptor is locatable by its 0x2C + the
    # known (2,1,2,1) rect bytes.
    needle = b"\x2c" + st.pack("<HHHH", 2, 1, 2, 1)
    pos = good.index(needle)
    bad = bytearray(good)
    bad[pos + 1 : pos + 3] = st.pack("<H", 3)
    assert mm._gif_decode_py(bytes(bad)) is None

    # disposal > 3 refuses (encoder won't write it; patch the GCE)
    with pytest.raises(ValueError, match="disposal"):
        mm._gif_encode_py([f_full], w, h, disposals=[4])
    gce_payload = bytearray(good)
    gpos = gce_payload.index(b"\x21\xf9\x04")
    gce_payload[gpos + 3] = (5 << 2)  # disposal 5
    assert mm._gif_decode_py(bytes(gce_payload)) is None

    # composite with no global color table: background unresolvable
    lp = mm._GIF_PALETTE
    nogct = mm._gif_encode_py(
        [f_full, f_sub], w, h, palette=None, frame_palettes=[lp, lp],
        frame_rects=[(0, 0, 4, 3), (2, 1, 2, 1)], disposals=[1, 1],
    )
    assert mm._gif_decode_py(nogct) is None

    # background index past the GCT refuses in composite mode
    small_pal = bytes(range(48))  # 16 entries
    badbg = mm._gif_encode_py(
        [bytes([1] * 12), bytes([2, 3])], w, h, palette=small_pal,
        frame_rects=[(0, 0, 4, 3), (2, 1, 2, 1)],
        disposals=[1, 1], bg=200,
    )
    assert mm._gif_decode_py(badbg) is None

    # stride decode economy: 4 frames, drop odd ones. Frame 1 has
    # disposal 2 (never persists -> no LZW), frame 3 is past the last
    # kept frame (no LZW); frame 0/2 kept.
    payload = mm._gif_encode_py(
        [f_full, f_sub, f_full, f_sub], w, h,
        frame_rects=[(0, 0, 4, 3), (2, 1, 2, 1)] * 2,
        disposals=[1, 2, 1, 1], transparent_idxs=[None, 7, None, None],
    )
    calls = []
    real = mm._lzw_decode

    def spy(data, mcs, max_out):
        calls.append(max_out)
        return real(data, mcs, max_out)

    orig = mm._lzw_decode
    mm._lzw_decode = spy
    try:
        parsed = mm._gif_decode_py(payload, frame_stride=2)
    finally:
        mm._lzw_decode = orig
    assert parsed is not None and parsed["frame_idxs"] == [0, 2]
    assert len(calls) == 2  # only the two kept frames hit LZW


def test_balance_media_bytes_feeds_every_codec_path(spark):
    """balance_media_bytes composes with the REAL decode for every
    codec the way it does for BMP (VERDICT r13 Next #5): the byte-
    balanced repartition changes partitioning only — extract_features
    (decode_stub=False) over the balanced frame is row-for-row
    identical to the unbalanced run for BMP, PNG, GIF, and WAV media."""
    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal as mm

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(30)
    for enc in (mm.bmp_encode, mm.png_encode, mm.gif_encode, mm.wav_encode):
        media = enc(docs)
        plain = {
            r["doc_id"]: r
            for r in mm.extract_features(media, decode_stub=False).collect()
        }
        balanced = {
            r["doc_id"]: r
            for r in mm.extract_features(
                mm.balance_media_bytes(media, 4), decode_stub=False
            ).collect()
        }
        assert plain.keys() == balanced.keys(), enc.__name__
        for k in plain:
            assert plain[k] == balanced[k], (enc.__name__, k)


def test_png_unfilter_vectorized_parity():
    """The round-14 vectorized None/Sub/Up unfilter paths reconstruct
    byte-identically to the spec's sequential recurrence (reference
    implementation inline) across random rows, both bpp widths, and
    every filter type including the undefined ones."""
    import random

    from firebolt_spark.operators.multimodal import _paeth, _png_unfilter_row

    def reference(ftype, filt, prev, bpp=3):
        if ftype > 4:
            return None
        out = bytearray(len(filt))
        for i in range(len(filt)):
            a = out[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            f = filt[i]
            if ftype == 0:
                out[i] = f
            elif ftype == 1:
                out[i] = (f + a) & 0xFF
            elif ftype == 2:
                out[i] = (f + b) & 0xFF
            elif ftype == 3:
                out[i] = (f + (a + b) // 2) & 0xFF
            else:
                out[i] = (f + _paeth(a, b, c)) & 0xFF
        return bytes(out)

    rng = random.Random(7)
    for trial in range(120):
        bpp = rng.choice([1, 3])
        n = rng.randint(1, 97) * bpp if rng.random() < 0.9 else rng.randint(1, 50)
        filt = bytes(rng.randrange(256) for _ in range(n))
        prev = bytes(rng.randrange(256) for _ in range(n))
        for ft in range(6):
            assert _png_unfilter_row(ft, filt, prev, bpp) == reference(
                ft, filt, prev, bpp
            ), (trial, ft, bpp, n)


def test_transcode_composite_gif_takes_composited_frame0(spark):
    """transcode_media over a sub-canvas ANIMATED GIF (round 14): the
    single-frame target takes frame 0 AS COMPOSITED — background fill
    under a transparent sub-rect, not the raw index plane — so the
    emitted PNG's statistics equal gif_frames' frame-0 row."""
    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal as mm

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(8)
    media = mm.gif_anim_encode(docs)
    frame0 = {
        r["doc_id"]: r
        for r in mm.gif_frames(media).collect()
        if r["frame_idx"] == 0
    }
    png = mm.transcode_media(media, to="png")
    feats = {
        r["doc_id"]: r
        for r in mm.extract_features(png, decode_stub=False).collect()
    }
    assert feats.keys() == frame0.keys()
    for k, f in feats.items():
        # extract_features feature slots are [b, g, r, all]
        assert f["feature"][0] == frame0[k]["mean_b"], k
        assert f["feature"][1] == frame0[k]["mean_g"], k
        assert f["feature"][2] == frame0[k]["mean_r"], k
        assert (f["width"], f["height"]) == (
            frame0[k]["width"], frame0[k]["height"]
        ), k


def test_gif_composite_randomized_reference_parity():
    """Randomized reference-compositor parity (round 14): random
    canvases, rects, disposal methods (all four), transparency
    choices, and strides — the decoder's composited frames must match
    an independent straight-from-the-spec compositor byte-for-byte,
    per-frame means included, and strided decodes must agree with the
    full decode's kept frames. Fixed seed; 120 cases."""
    import random

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _GIF_PALETTE, _gif_decode_py, _gif_encode_py,
    )

    pal = np.frombuffer(_GIF_PALETTE, np.uint8).reshape(-1, 3)

    def reference(frames, rects, disposals, trans, w, h, bg):
        canvas = np.empty((h, w, 3), np.uint8)
        canvas[:] = pal[bg]
        outs = []
        for f, (l, t, fw, fh), d, T in zip(frames, rects, disposals, trans):
            a = np.frombuffer(f, np.uint8).reshape(fh, fw)
            mask = np.ones(a.shape, bool) if T is None else (a != T)
            prev = canvas.copy()
            canvas[t : t + fh, l : l + fw][mask] = pal[a[mask]]
            outs.append(canvas.copy())
            if d == 2:
                canvas[t : t + fh, l : l + fw] = pal[bg]
            elif d == 3:
                canvas = prev
        return outs

    rng = random.Random(42)
    for trial in range(120):
        w, h = rng.randint(1, 12), rng.randint(1, 9)
        n = rng.randint(1, 5)
        frames, rects, disps, trans = [], [], [], []
        for f in range(n):
            if f == 0 and rng.random() < 0.5:
                fw, fh, l, t = w, h, 0, 0
            else:
                fw = rng.randint(1, w)
                fh = rng.randint(1, h)
                l = rng.randint(0, w - fw)
                t = rng.randint(0, h - fh)
            frames.append(bytes(rng.randrange(256) for _ in range(fw * fh)))
            rects.append((l, t, fw, fh))
            disps.append(rng.choice([0, 1, 2, 3]))
            trans.append(rng.choice([None, None, 7, frames[-1][0]]))
        bg = rng.randrange(256)
        payload = _gif_encode_py(
            frames, w, h, frame_rects=rects, disposals=disps,
            transparent_idxs=trans, bg=bg,
        )
        got = _gif_decode_py(payload)
        want = reference(frames, rects, disps, trans, w, h, bg)
        indep = all(
            r == (0, 0, w, h) and T is None for r, T in zip(rects, trans)
        )
        assert got is not None and got["rgb"] == (not indep), trial
        if indep:
            continue
        assert got["n_frames"] == n
        for i, (fr, wf) in enumerate(zip(got["frames"], want)):
            assert fr == wf.tobytes(), (trial, i)
        for fm, wf in zip(got["frame_means"], want):
            s = wf.reshape(-1, 3).sum(axis=0)
            assert fm == [round(int(x) / (w * h), 6) for x in s], trial
        g2 = _gif_decode_py(payload, frame_stride=2)
        assert g2["frame_idxs"] == list(range(0, n, 2))
        for ki, fi in enumerate(g2["frame_idxs"]):
            assert g2["frames"][ki] == want[fi].tobytes(), (trial, fi)


def test_jpeg_table_cache_overflow_keeps_early_entries():
    """Overflow eviction (ADVICE r16 #4): pushing >256 distinct DHT
    byte-strings through the decoder-table cache must NOT wipe the
    early-inserted (hot, Annex-K-style) entries — only the newest
    slot churns, and the bound holds.  Correctness is eviction-proof
    (entries rebuild on miss); this pins the retention policy."""
    from firebolt_spark.operators import multimodal as mm

    mm._JPEG_TABLE_CACHE.clear()
    # 2 "hot" tables first (standard DC luma bits; distinct vals).
    bits = bytes([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0])
    hot = [(bits, bytes([v, v >> 8]) + bytes(10)) for v in (0, 1)]
    for b, v in hot:
        mm._jpeg_decoder_table_cached(b, v)
    built = {k: id(t) for k, t in mm._JPEG_TABLE_CACHE.items()}
    # 300 one-off tables, re-touching the hot pair throughout.
    for i in range(2, 302):
        mm._jpeg_decoder_table_cached(bits, bytes([i % 256, i >> 8]) + bytes(10))
        for b, v in hot:
            assert id(mm._jpeg_decoder_table_cached(b, v)) == built[(b, v)]
    assert len(mm._JPEG_TABLE_CACHE) <= 256
    for k in built:
        assert k in mm._JPEG_TABLE_CACHE
    mm._JPEG_TABLE_CACHE.clear()


def test_jpeg_roundtrip_exact_all_values():
    """The baseline-JPEG fixture combination (flat tiles, all-8s
    quantization) must decode EXACTLY — every one of the 256 gray
    values, through the real Huffman DC-difference chain across 256
    blocks (exercising every DC category and the byte-stuffing path),
    lands back bit-for-bit. Also pins the q=16 lossy arithmetic."""
    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_py,
    )

    p = _jpeg_encode_py(bytes(range(256)), 16, 16)
    d = _jpeg_decode_py(p)
    assert d is not None and (d["width"], d["height"]) == (128, 128)
    img = np.frombuffer(d["pixels"], np.uint8).reshape(128, 128)
    for r in range(16):
        for c in range(16):
            tile = img[8 * r : 8 * r + 8, 8 * c : 8 * c + 8]
            assert (tile == 16 * r + c).all(), (r, c)
    assert d["mean_all"] == round(sum(range(256)) / 256, 6)

    d16 = _jpeg_decode_py(_jpeg_encode_py(bytes([100, 201]), 2, 1, q=16))
    img16 = np.frombuffer(d16["pixels"], np.uint8).reshape(8, 16)

    def expected(v, q=16):
        dcq = round(8 * (v - 128) / q)
        return max(0, min(255, round(dcq * q / 8 + 128)))

    assert int(img16[0, 0]) == expected(100)
    assert int(img16[0, 8]) == expected(201)


def test_jpeg_ac_coefficients_against_literal_idct():
    """The AC path (run/size symbols, ZRL, magnitude bits, zigzag,
    dequant) verified against a LITERAL definition-formula IDCT: a
    hand-assembled entropy stream places nonzero coefficients at
    chosen zigzag positions using the declared canonical codes, and
    the decoded block must match the double-loop T.81 reconstruction
    to the same rint/clip."""
    import math
    import struct as st

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _JPEG_AC_BITS, _JPEG_AC_VALS, _JPEG_DC_BITS, _JPEG_DC_VALS,
        _JPEG_ZIGZAG, _JpegBitWriter, _jpeg_decode_py, _jpeg_huffman_codes,
        _jpeg_seg,
    )

    dc_codes = _jpeg_huffman_codes(_JPEG_DC_BITS)
    ac_codes = _jpeg_huffman_codes(_JPEG_AC_BITS)
    ac_of = {v: ac_codes[i] for i, v in enumerate(_JPEG_AC_VALS)}

    # one 8x8 block: DC=5, AC at zigzag k=1 -> +1, then 16 zeros (ZRL),
    # AC at k=18 -> -1 (0x11: run 1, size 1), EOB
    bw = _JpegBitWriter()
    ln, code = dc_codes[3]
    bw.put(code, ln)          # DC category 3
    bw.put(5, 3)              # diff = +5
    ln, code = ac_of[0x01]
    bw.put(code, ln)          # k=1: run 0 size 1
    bw.put(1, 1)              # +1
    ln, code = ac_of[0xF0]
    bw.put(code, ln)          # ZRL: k 2..17 zero
    ln, code = ac_of[0x11]
    bw.put(code, ln)          # run 1 size 1 -> k=19... run skips k=18
    bw.put(0, 1)              # -1
    ln, code = ac_of[0x00]
    bw.put(code, ln)          # EOB
    entropy = bw.flush()

    q = 8
    payload = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([q] * 64))
        + _jpeg_seg(0xC0, st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _jpeg_seg(
            0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS)
        )
        + _jpeg_seg(
            0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS)
        )
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )
    d = _jpeg_decode_py(payload)
    assert d is not None and (d["width"], d["height"]) == (8, 8)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(8, 8)

    coef = np.zeros(64)
    coef[0] = 5 * q
    coef[1] = 1 * q
    coef[19] = -1 * q  # ZRL(16) skips zigzag 2..17, run 1 skips 18
    F = np.zeros((8, 8))
    F.flat[_JPEG_ZIGZAG] = coef

    def C(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        C(u) * C(v) / 4 * F[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            ref[x, y] = s
    expect = np.clip(np.rint(ref + 128.0), 0, 255).astype(np.uint8)
    assert (got == expect).all()
    assert len(np.unique(got)) > 1  # the ACs genuinely shaped the block


def test_jpeg_refusals():
    """Everything outside the supported baseline scope (grayscale /
    4:4:4 / 4:2:0 / 4:2:2, restart intervals) refuses (None/
    ValueError), never approximates: sampling factors past 2,
    progressive SOF2, mismatched restart cadence, 16-bit DQT,
    truncation, undefined Huffman codes, and non-JPEG bytes under the
    FFD8 magic."""
    import struct as st

    from firebolt_spark.operators.multimodal import (
        _JPEG_AC_BITS, _JPEG_AC_VALS, _JPEG_DC_BITS, _JPEG_DC_VALS,
        _jpeg_decode_py, _jpeg_encode_py, _jpeg_seg,
    )

    good = _jpeg_encode_py(bytes([50, 60]), 2, 1)
    assert _jpeg_decode_py(good) is not None

    # truncated entropy stream
    assert _jpeg_decode_py(good[:-8]) is None
    # component count the frame header cannot carry (Nf=2, body sized
    # for 1) and an unsupported 2-component layout both refuse
    sof_at = good.index(b"\xff\xc0")
    bad = bytearray(good)
    bad[sof_at + 9] = 2
    assert _jpeg_decode_py(bytes(bad)) is None
    # sampling factors of 3 refuse (beyond the {1,2} scope); 2x2 on
    # the first component is the SUPPORTED 4:2:0 shape as of round 15
    # (this 2x1-tile stream happens to stay structurally consistent
    # under the reinterpretation: 1 MCU of 4 Y + Cb + Cr blocks = the
    # same 6 DC+EOB blocks, so it now decodes instead of refusing)
    color = _jpeg_encode_py(bytes(range(50, 56)), 2, 1)
    assert _jpeg_decode_py(color) is not None
    csof = color.index(b"\xff\xc0")
    bad = bytearray(color)
    assert bad[csof + 11] == 0x11
    bad[csof + 11] = 0x33
    assert _jpeg_decode_py(bytes(bad)) is None
    bad[csof + 11] = 0x22
    assert _jpeg_decode_py(bytes(bad)) is not None
    # progressive: marker C0 -> C2
    bad = bytearray(good)
    bad[sof_at + 1] = 0xC2
    assert _jpeg_decode_py(bytes(bad)) is None
    # restart intervals are SUPPORTED (r14) — but the cadence must
    # match the MCU count: DRI=1 over 2 MCUs with no RST emitted
    # refuses, and DRI=4 over 2 MCUs (no restart due) decodes fine
    head, tail = good[:sof_at], good[sof_at:]
    assert _jpeg_decode_py(
        head + _jpeg_seg(0xDD, st.pack(">H", 1)) + tail
    ) is None
    assert _jpeg_decode_py(
        head + _jpeg_seg(0xDD, st.pack(">H", 4)) + tail
    ) is not None
    # 16-bit quantization table (Pq=1)
    dqt_at = good.index(b"\xff\xdb")
    bad = bytearray(good)
    bad[dqt_at + 4] = 0x10
    assert _jpeg_decode_py(bytes(bad)) is None
    # garbage after the magic
    assert _jpeg_decode_py(b"\xff\xd8" + b"\x00" * 40) is None
    # missing AC table: drop the second DHT segment entirely
    parts = good.split(b"\xff\xc4")
    assert len(parts) == 3
    sos_tail = parts[2][parts[2].index(b"\xff\xda"):]
    assert _jpeg_decode_py(parts[0] + b"\xff\xc4" + parts[1] + sos_tail) is None
    # corrupted entropy bits must refuse or decode to SOMETHING -
    # never crash; all-ones tails hit the undefined-code guard
    bad = bytearray(good)
    bad[-3] ^= 0x55
    _jpeg_decode_py(bytes(bad))  # must not raise

    # encoder validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tile bytes"):
        _jpeg_encode_py(bytes([1, 2, 3]), 2, 1)
    with _pytest.raises(ValueError, match="q must be"):
        _jpeg_encode_py(bytes([1]), 1, 1, q=0)


def test_transcode_jpeg_to_png_is_channel_faithful(spark):
    """transcode_media over baseline JPEG (round 14): the decoded gray
    plane expands to r = g = b, the 4:4:4 color plane passes through as
    RGB, and the emitted PNG's statistics reproduce the JPEG fixture's
    analytic tile means (incl. the floor(x+0.5) YCbCr conversion) —
    two real codecs certified against each other through one byte
    stream, the JPEG twin of the BMP->PNG oracle."""
    import hashlib
    import math

    from firebolt_spark.catalog import load_table
    from firebolt_spark.operators import multimodal as mm

    def conv(y, cb, cr):
        r = math.floor(y + 1.402 * (cr - 128) + 0.5)
        g = math.floor(
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5
        )
        b = math.floor(y + 1.772 * (cb - 128) + 0.5)
        return tuple(max(0, min(255, v)) for v in (r, g, b))

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").limit(10)
    png = mm.transcode_media(mm.jpeg_encode(docs), to="png")
    feats = {
        r["doc_id"]: r
        for r in mm.extract_features(png, decode_stub=False).collect()
    }
    for r in docs.collect():
        doc_id = int(r["doc_id"])
        tx, ty = 1 + doc_id % 3, 1 + doc_id % 2
        n = tx * ty
        dig = hashlib.md5(((r["text"] or "") + "#j").encode()).digest()
        f = feats[doc_id]
        assert (f["width"], f["height"]) == (8 * tx, 8 * ty)
        if doc_id % 2:  # color
            trips = [(dig * 2)[3 * k : 3 * k + 3] for k in range(n)]
            rgb = [conv(*t) for t in trips]
            exp_b = round(sum(p[2] for p in rgb) / n, 6)
            exp_g = round(sum(p[1] for p in rgb) / n, 6)
            exp_r = round(sum(p[0] for p in rgb) / n, 6)
            assert f["feature"][:3] == [exp_b, exp_g, exp_r]
        else:  # gray: r = g = b
            mean = round(sum(dig[:n]) / n, 6)
            assert f["feature"][0] == f["feature"][1] == f["feature"][2] == mean


def test_jpeg_color_444_randomized_exact():
    """4:4:4 color decode (round 14): randomized flat (Y, Cb, Cr)
    tiles through the real interleaved-MCU entropy decode (three DC
    predictor chains) must land on EXACTLY the floor(x+0.5) JFIF
    conversion of the tile bytes — the integer-exactness the analytic
    oracle rests on."""
    import math
    import random

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_py,
    )

    def conv(y, cb, cr):
        r = math.floor(y + 1.402 * (cr - 128) + 0.5)
        g = math.floor(
            y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5
        )
        b = math.floor(y + 1.772 * (cb - 128) + 0.5)
        return tuple(max(0, min(255, v)) for v in (r, g, b))

    rng = random.Random(3)
    for trial in range(60):
        tx, ty = rng.randint(1, 4), rng.randint(1, 3)
        tiles = bytes(rng.randrange(256) for _ in range(3 * tx * ty))
        d = _jpeg_decode_py(_jpeg_encode_py(tiles, tx, ty))
        assert d is not None and d["bpp"] == 24, trial
        rgb = np.frombuffer(d["pixels"], np.uint8).reshape(8 * ty, 8 * tx, 3)
        for t in range(tx * ty):
            r0, c0 = 8 * (t // tx), 8 * (t % tx)
            tile = rgb[r0 : r0 + 8, c0 : c0 + 8]
            exp = conv(tiles[3 * t], tiles[3 * t + 1], tiles[3 * t + 2])
            assert (tile == exp).all(), (trial, t)


def test_jpeg_restart_intervals():
    """DRI/RST0-7 support (round 14): a restarted stream decodes
    bit-identically to its non-restarted twin across sizes, component
    counts, and intervals (per-segment byte alignment + DC predictor
    resets), the RST sequence numbers must cycle in order, a marker
    without a declared DRI refuses, and so does a dropped marker."""
    import random

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_py,
    )

    rng = random.Random(9)
    for trial in range(25):
        tx, ty = rng.randint(1, 5), rng.randint(1, 4)
        ncomp = rng.choice([1, 3])
        tiles = bytes(rng.randrange(256) for _ in range(ncomp * tx * ty))
        dri = rng.choice([1, 2, 3, 5, 9])
        plain = _jpeg_decode_py(_jpeg_encode_py(tiles, tx, ty))
        rst = _jpeg_decode_py(
            _jpeg_encode_py(tiles, tx, ty, restart_interval=dri)
        )
        assert rst is not None and rst["pixels"] == plain["pixels"], (
            trial, tx, ty, ncomp, dri,
        )

    wr = _jpeg_encode_py(bytes(range(40, 52)), 4, 3, restart_interval=2)
    assert _jpeg_decode_py(wr) is not None
    # marker without DRI
    dri_at = wr.index(b"\xff\xdd")
    assert _jpeg_decode_py(wr[:dri_at] + wr[dri_at + 6 :]) is None
    # out-of-order sequence number
    bad = bytearray(wr)
    bad[bad.index(b"\xff\xd0") + 1] = 0xD3
    assert _jpeg_decode_py(bytes(bad)) is None
    # dropped restart marker: wrong cadence
    r0 = wr.index(b"\xff\xd0")
    assert _jpeg_decode_py(wr[:r0] + wr[r0 + 2 :]) is None


def test_jpeg_decodes_foreign_huffman_tables():
    """The decoder loads ANY valid canonical tables from DHT — not
    just the ones our encoder declares. Rebuild a payload with a
    DIFFERENT (Annex-K-style skewed) DC table layout plus a reshuffled
    AC table, re-encode the entropy stream against them by hand, and
    the decode must land on the same pixels."""
    import struct as st

    from firebolt_spark.operators.multimodal import (
        _JpegBitWriter, _jpeg_decode_py, _jpeg_huffman_codes, _jpeg_seg,
    )

    # skewed DC table: the standard luminance layout (cat 0 rare-coded)
    dc_bits = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
    dc_vals = list(range(12))
    # AC table with EOB buried deeper and extra symbols around it
    ac_bits = [0, 0, 2, 2, 1, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
    ac_vals = [0x01, 0x11, 0x00, 0xF0, 0x02, 0x21]  # EOB is 3rd

    dc_codes = {v: c for v, c in zip(dc_vals, _jpeg_huffman_codes(dc_bits))}
    ac_codes = {v: c for v, c in zip(ac_vals, _jpeg_huffman_codes(ac_bits))}

    tiles = [13, 200, 77, 128]  # 4 MCUs, 2x2 grayscale
    bw = _JpegBitWriter()
    prev = 0
    for v in tiles:
        dcq = v - 128  # q = 8
        diff = dcq - prev
        prev = dcq
        s = abs(diff).bit_length()
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        ln, code = ac_codes[0x00]
        bw.put(code, ln)
    payload = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _jpeg_seg(0xC0, st.pack(">BHHB", 8, 16, 16, 1) + bytes([1, 0x11, 0]))
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(dc_bits) + bytes(dc_vals))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(ac_bits) + bytes(ac_vals))
        + _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    import numpy as np

    d = _jpeg_decode_py(payload)
    assert d is not None and (d["width"], d["height"]) == (16, 16)
    img = np.frombuffer(d["pixels"], np.uint8).reshape(16, 16)
    for t, v in enumerate(tiles):
        r0, c0 = 8 * (t // 2), 8 * (t % 2)
        assert (img[r0 : r0 + 8, c0 : c0 + 8] == v).all(), t


def _jpeg_rgb_ref(y, cb, cr):
    """Literal JFIF YCbCr -> RGB reference: floor(x + 0.5), clamped."""
    import math

    r = math.floor(y + 1.402 * (cr - 128) + 0.5)
    g = math.floor(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128) + 0.5)
    b = math.floor(y + 1.772 * (cb - 128) + 0.5)
    return tuple(max(0, min(255, v)) for v in (r, g, b))


def test_jpeg_420_roundtrip_exact_all_values():
    """The 4:2:0 fixture combination (flat quadrants, flat chroma per
    MCU, all-8s quantization) must decode EXACTLY for every one of the
    256 byte values in BOTH the luma and the chroma slots — through
    the real MCU-interleaved Huffman chain (4 luma blocks sharing one
    DC predictor, chroma predictors riding across MCUs) and the
    sample-replication upsample."""
    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_py,
    )

    # luma sweep: 64 MCUs (8x8), quadrants carry 0..255 in order,
    # chroma pinned neutral (128 -> r=g=b=Y exactly)
    tiles = bytearray()
    for k in range(64):
        tiles += bytes(range(4 * k, 4 * k + 4)) + bytes([128, 128])
    d = _jpeg_decode_py(_jpeg_encode_py(bytes(tiles), 8, 8, subsampling="420"))
    assert d is not None and (d["width"], d["height"], d["bpp"]) == (128, 128, 24)
    px = np.frombuffer(d["pixels"], np.uint8).reshape(128, 128, 3)
    assert (px[..., 0] == px[..., 1]).all() and (px[..., 0] == px[..., 2]).all()
    for k in range(64):
        mr, mc = divmod(k, 8)
        for j, (dr, dc) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
            quad = px[16 * mr + dr : 16 * mr + dr + 8,
                      16 * mc + dc : 16 * mc + dc + 8, 0]
            assert (quad == 4 * k + j).all(), (k, j)

    # chroma sweep: 256 MCUs, Cb = k, Cr = 255 - k, Y pinned at 128;
    # every decoded pixel must equal the literal floor(x+0.5) reference
    tiles = bytearray()
    for k in range(256):
        tiles += bytes([128] * 4) + bytes([k, 255 - k])
    d = _jpeg_decode_py(
        _jpeg_encode_py(bytes(tiles), 16, 16, subsampling="420")
    )
    assert d is not None and (d["width"], d["height"]) == (256, 256)
    px = np.frombuffer(d["pixels"], np.uint8).reshape(256, 256, 3)
    for k in range(256):
        mr, mc = divmod(k, 16)
        mcu = px[16 * mr : 16 * mr + 16, 16 * mc : 16 * mc + 16]
        want = _jpeg_rgb_ref(128, k, 255 - k)
        assert (mcu == want).all(), (k, tuple(mcu[0, 0]), want)


def test_jpeg_420_upsample_against_literal_reference():
    """NON-FLAT chroma through the 4:2:0 path, verified against a
    literal definition reference: a hand-assembled entropy stream puts
    an AC coefficient in the Cb block, the reference reconstructs each
    block with the double-loop T.81 IDCT, upsamples chroma with the
    definitional nearest map out[y][x] = plane[y // 2][x // 2], and
    converts with floor(x + 0.5) — the decode must match pixel-exact.
    This is the test that pins WHERE each chroma sample lands (the
    per-frame-mean oracles are placement-invariant)."""
    import math
    import struct as st

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _JPEG_AC_BITS, _JPEG_AC_VALS, _JPEG_DC_BITS, _JPEG_DC_VALS,
        _JPEG_ZIGZAG, _JpegBitWriter, _jpeg_decode_py,
        _jpeg_huffman_codes, _jpeg_seg,
    )

    dc_codes = _jpeg_huffman_codes(_JPEG_DC_BITS)
    ac_codes = _jpeg_huffman_codes(_JPEG_AC_BITS)
    ac_of = {v: ac_codes[i] for i, v in enumerate(_JPEG_AC_VALS)}
    q = 8

    def put_dc(bw, diff):
        s = abs(diff).bit_length()
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    def put_eob(bw):
        ln, code = ac_of[0x00]
        bw.put(code, ln)

    # one 16x16 MCU: four flat Y blocks (10, 40, 90, 160), Cb block
    # DC=-20 with AC +1 at zigzag k=1 and -2 at k=2 (NON-flat), Cr flat
    bw = _JpegBitWriter()
    y_dcs = [10 - 128, 40 - 128, 90 - 128, 160 - 128]
    prev = 0
    for dcq in y_dcs:
        put_dc(bw, dcq - prev)
        prev = dcq
        put_eob(bw)
    put_dc(bw, -20)  # Cb DC
    ln, code = ac_of[0x01]
    bw.put(code, ln)
    bw.put(1, 1)  # k=1: +1... magnitude 1 -> value +1; scale below
    ln, code = ac_of[0x02]  # run 0, size 2
    bw.put(code, ln)
    bw.put(0b01, 2)  # value -2 (negative two: complement code 01)
    put_eob(bw)
    put_dc(bw, 30)  # Cr DC (flat)
    put_eob(bw)
    entropy = bw.flush()

    sof = st.pack(">BHHB", 8, 16, 16, 3) + bytes(
        [1, 0x22, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    payload = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([q] * 64))
        + _jpeg_seg(0xC0, sof)
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
        + _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + entropy
        + b"\xff\xd9"
    )
    d = _jpeg_decode_py(payload)
    assert d is not None and (d["width"], d["height"], d["bpp"]) == (16, 16, 24)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(16, 16, 3)

    # literal reference: IDCT each block by the definition formula
    def C(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    def idct_ref(coef_zz):
        F = np.zeros((8, 8))
        F.flat[_JPEG_ZIGZAG] = coef_zz
        out = np.zeros((8, 8))
        for x in range(8):
            for yy in range(8):
                s = 0.0
                for u in range(8):
                    for v in range(8):
                        s += (
                            C(u) * C(v) / 4 * F[u, v]
                            * math.cos((2 * x + 1) * u * math.pi / 16)
                            * math.cos((2 * yy + 1) * v * math.pi / 16)
                        )
                out[x, yy] = s
        return np.clip(np.rint(out + 128.0), 0, 255).astype(np.uint8)

    yplane = np.zeros((16, 16), np.uint8)
    for j, (dr, dc) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
        coef = np.zeros(64)
        coef[0] = y_dcs[j] * q
        yplane[dr : dr + 8, dc : dc + 8] = idct_ref(coef)
    cb_coef = np.zeros(64)
    cb_coef[0] = -20 * q
    cb_coef[1] = 1 * q
    cb_coef[2] = -2 * q
    cb_block = idct_ref(cb_coef)
    cr_coef = np.zeros(64)
    cr_coef[0] = 30 * q
    cr_block = idct_ref(cr_coef)

    ref = np.zeros((16, 16, 3), np.uint8)
    for y in range(16):
        for x in range(16):
            # the definitional nearest/replication upsample map
            cb = int(cb_block[y // 2, x // 2])
            cr = int(cr_block[y // 2, x // 2])
            ref[y, x] = _jpeg_rgb_ref(int(yplane[y, x]), cb, cr)
    assert (got == ref).all()
    # the AC genuinely made the chroma block non-flat (else this test
    # collapses to the flat fixture it exists to go beyond)
    assert len(np.unique(cb_block)) > 1


def test_jpeg_420_randomized_parity_and_restarts():
    """Randomized 4:2:0 parity: random quadrant/chroma bytes, random
    MCU grids, random restart intervals — the decode must equal the
    analytic expectation everywhere (each quadrant 64 identical pixels
    of the literal conversion). Seeded, 25 draws."""
    import random

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_py,
    )

    rng = random.Random(0x1420)
    for _ in range(25):
        tx = rng.randint(1, 4)
        ty = rng.randint(1, 4)
        dri = rng.choice([0, 1, 2, 3, 7])
        tiles = bytes(rng.randrange(256) for _ in range(6 * tx * ty))
        p = _jpeg_encode_py(tiles, tx, ty, restart_interval=dri,
                            subsampling="420")
        d = _jpeg_decode_py(p)
        assert d is not None, (tx, ty, dri)
        px = np.frombuffer(d["pixels"], np.uint8).reshape(16 * ty, 16 * tx, 3)
        for k in range(tx * ty):
            mr, mc = divmod(k, tx)
            cb, cr = tiles[6 * k + 4], tiles[6 * k + 5]
            for j, (dr, dc) in enumerate([(0, 0), (0, 8), (8, 0), (8, 8)]):
                want = _jpeg_rgb_ref(tiles[6 * k + j], cb, cr)
                quad = px[16 * mr + dr : 16 * mr + dr + 8,
                          16 * mc + dc : 16 * mc + dc + 8]
                assert (quad == want).all(), (k, j, dri)


def test_jpeg_422_decodes():
    """4:2:2 (Y 2x1) rides the same sampling generalization: a
    hand-assembled 16x8 one-MCU payload (2 Y blocks + 1 Cb + 1 Cr)
    decodes with chroma replicated horizontally only."""
    import struct as st

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _JPEG_AC_BITS, _JPEG_AC_VALS, _JPEG_DC_BITS, _JPEG_DC_VALS,
        _JpegBitWriter, _jpeg_decode_py, _jpeg_huffman_codes, _jpeg_seg,
    )

    dc_codes = _jpeg_huffman_codes(_JPEG_DC_BITS)
    ac_codes = _jpeg_huffman_codes(_JPEG_AC_BITS)
    eob_ln, eob_code = ac_codes[_JPEG_AC_VALS.index(0x00)]
    bw = _JpegBitWriter()
    prev = {0: 0, 1: 0, 2: 0}
    for ci, v in [(0, 60), (0, 190), (1, 100), (2, 140)]:
        diff = (v - 128) - prev[ci]
        prev[ci] = v - 128
        s = abs(diff).bit_length()
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
        bw.put(eob_code, eob_ln)
    sof = st.pack(">BHHB", 8, 8, 16, 3) + bytes(
        [1, 0x21, 0, 2, 0x11, 0, 3, 0x11, 0]
    )
    payload = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([8] * 64))
        + _jpeg_seg(0xC0, sof)
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
        + _jpeg_seg(0xDA, bytes([3, 1, 0x00, 2, 0x00, 3, 0x00, 0, 63, 0]))
        + bw.flush()
        + b"\xff\xd9"
    )
    d = _jpeg_decode_py(payload)
    assert d is not None and (d["width"], d["height"]) == (16, 8)
    px = np.frombuffer(d["pixels"], np.uint8).reshape(8, 16, 3)
    left = _jpeg_rgb_ref(60, 100, 140)
    right = _jpeg_rgb_ref(190, 100, 140)
    assert (px[:, :8] == left).all() and (px[:, 8:] == right).all()


def test_decoder_backend_injection_parity(spark):
    """The codec swap seam is REAL (round 15 — VERDICT r14 Next #3):
    extract_features and gif_frames accept a decoder_backend callable
    that replaces the stdlib codecs inside the same Arrow-batched
    mapInPandas seam. Injecting a backend that delegates to the stdlib
    decoders yields BIT-IDENTICAL rows to the default path on every
    supported format (so a PIL/ffmpeg swap changes only the decode
    kernel, nothing around it), and a canned fake backend's values are
    plumbed through untouched."""
    from firebolt_spark.operators import multimodal
    from firebolt_spark.operators.multimodal import (
        _bmp_decode_py, _gif_decode_py, _jpeg_decode_py, _png_decode_py,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(8)], "doc_id LONG, text STRING"
    )

    def stdlib_backend(payload):
        if payload[:8] == multimodal._PNG_SIG:
            return _png_decode_py(payload)
        if payload[:6] in (b"GIF87a", b"GIF89a"):
            return _gif_decode_py(payload)
        if payload[:2] == b"\xff\xd8":
            return _jpeg_decode_py(payload)
        return _bmp_decode_py(payload)

    for encode in (
        multimodal.bmp_encode,
        multimodal.png_encode,
        multimodal.gif_encode,
        multimodal.jpeg_encode,
        lambda d: multimodal.jpeg_encode(d, subsampling="420"),
    ):
        media = encode(docs)
        base = multimodal.extract_features(media, decode_stub=False)
        injected = multimodal.extract_features(
            media, decode_stub=False, decoder_backend=stdlib_backend
        )
        assert base.schema == injected.schema
        assert sorted(map(tuple, base.collect())) == sorted(
            map(tuple, injected.collect())
        )

    # gif_frames: same contract, (payload, stride) signature
    anim = multimodal.gif_anim_encode(docs)
    base = multimodal.gif_frames(anim, every_nth=2)
    injected = multimodal.gif_frames(
        anim,
        every_nth=2,
        decoder_backend=lambda p, stride: _gif_decode_py(
            p, frame_stride=stride
        ),
    )
    assert base.schema == injected.schema
    assert sorted(map(tuple, base.collect())) == sorted(
        map(tuple, injected.collect())
    )

    # a canned "fast" backend (the PIL/ffmpeg stand-in) plumbs through
    def canned(payload):
        return {
            "width": 42, "height": 7, "n_frames": 3,
            "mean_r": 1.0, "mean_g": 2.0, "mean_b": 3.0, "mean_all": 2.0,
        }

    # no decode_stub=False here ON PURPOSE: a non-None backend implies
    # the real-decode path (round-15 review — the default stub branch
    # used to silently swallow the injected decoder)
    media = multimodal.bmp_encode(docs)
    rows = multimodal.extract_features(
        media, decoder_backend=canned
    ).collect()
    assert all(
        (r.width, r.height, r.n_frames, list(r.feature))
        == (42, 7, 3, [3.0, 2.0, 1.0, 2.0])
        for r in rows
    )

    # None from the backend keeps the refusal contract (ValueError,
    # not a crash or a silent drop)
    import pytest as _pytest

    bad = multimodal.extract_features(
        media, decode_stub=False, decoder_backend=lambda p: None
    )
    with _pytest.raises(Exception, match="unsupported media format"):
        bad.collect()


@pytest.mark.skipif(
    shutil.which("ffmpeg") is None or shutil.which("ffprobe") is None,
    reason="ffmpeg/ffprobe not installed (the documented modern-codec "
    "backend boundary, README); the seam itself is covered by "
    "test_decoder_backend_injection_parity",
)
def test_ffmpeg_backend_video_frames_parity(spark):
    """ENV-GATED ffmpeg parity for the video decoder_backend seam
    (round 16 — VERDICT r15 Next #7: activate the real-backend proof
    wherever ffmpeg exists, instead of only injecting stdlib fakes):
    an ffmpeg-backed ``(payload, stride) -> dict`` decodes the same
    AVI fixtures through ``video_frames``'s injection seam, and its
    per-frame channel means must match the dependency-free demuxer —
    exactly for DIB (raw pixels, any conformant decoder is
    bit-exact) and within 0.5 of a 0-255 channel mean for MJPG (flat
    DC-only tiles reconstruct exactly under every conformant IDCT;
    the half-level guard absorbs per-build rounding differences
    without letting a real decode bug through). Skips where ffmpeg
    is absent; on a real cluster image
    this is the proof the README's H.264/VP9 guidance rests on."""
    import json as _json

    from firebolt_spark.operators import multimodal

    def ffmpeg_backend(payload: bytes, stride: int) -> dict | None:
        import subprocess as _sp
        import tempfile

        import numpy as _np

        with tempfile.NamedTemporaryFile(suffix=".avi") as f:
            f.write(payload)
            f.flush()
            probe = _sp.run(
                ["ffprobe", "-v", "error", "-select_streams", "v:0",
                 "-show_entries", "stream=width,height",
                 "-of", "json", f.name],
                capture_output=True, check=True,
            )
            st = _json.loads(probe.stdout)["streams"][0]
            w, h = int(st["width"]), int(st["height"])
            raw = _sp.run(
                ["ffmpeg", "-v", "error", "-i", f.name, "-f", "rawvideo",
                 "-pix_fmt", "rgb24", "-"],
                capture_output=True, check=True,
            ).stdout
        frames = _np.frombuffer(raw, _np.uint8).reshape(-1, h, w, 3)
        idxs = list(range(0, len(frames), stride))
        return {
            "width": w,
            "height": h,
            "n_frames": len(frames),
            "frame_idxs": idxs,
            "frame_means": [
                [round(float(frames[i][..., c].mean()), 6) for c in range(3)]
                for i in idxs
            ],
        }

    docs = spark.createDataFrame(
        [(i, f"video doc {i}") for i in range(8)],
        "doc_id LONG, text STRING",
    )
    media = multimodal.avi_encode(docs)
    for every_nth in (1, 2):
        base = {
            (r.doc_id, r.frame_idx): r
            for r in multimodal.video_frames(media, every_nth=every_nth)
            .collect()
        }
        via_ffmpeg = {
            (r.doc_id, r.frame_idx): r
            for r in multimodal.video_frames(
                media, every_nth=every_nth, decoder_backend=ffmpeg_backend
            ).collect()
        }
        assert base.keys() == via_ffmpeg.keys()
        for key, b in base.items():
            g = via_ffmpeg[key]
            assert (b.width, b.height) == (g.width, g.height)
            tol = 0.0 if key[0] % 2 == 0 else 0.5  # DIB exact; MJPG guarded
            for ch in ("mean_r", "mean_g", "mean_b"):
                assert abs(getattr(b, ch) - getattr(g, ch)) <= tol, (
                    key, ch, getattr(b, ch), getattr(g, ch)
                )


def test_jpeg_dct_encoder_roundtrip_within_quantization():
    """The general forward-DCT encoder (round 15, the media_throughput
    generator): encode arbitrary content, decode with the real
    decoder, and the roundtrip error must stay within the
    quantization budget — near-lossless at q=1 (|err| <= 3 for 4:4:4,
    where the only loss is DCT float rounding), bounded at q=8. Also
    pins stream structure: full Annex-K-style tables decode, 4:2:0
    emits 2x2-sampled Y, gray emits one component, and the ORACLE
    encoder's flat output stays bit-exact through the same decoder."""
    import hashlib

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_dct_py,
    )

    # the SAME photo-like content the media_throughput bench row
    # measures — shared recipe, so the certified content and the
    # measured content cannot drift apart
    from firebolt_spark.operators.multimodal import _jpeg_photo_like_py

    img = _jpeg_photo_like_py("jpg#0")
    rgb = img.tobytes()

    p1 = _jpeg_encode_dct_py(rgb, 128, 128, q=1, subsampling="444")
    d = _jpeg_decode_py(p1)
    assert d is not None and (d["width"], d["height"], d["bpp"]) == (128, 128, 24)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(128, 128, 3)
    err = np.abs(got.astype(np.int32) - img.astype(np.int32))
    assert err.max() <= 3, err.max()

    p8 = _jpeg_encode_dct_py(rgb, 128, 128, q=8, subsampling="420")
    assert len(p8) < len(p1)  # quantization + subsampling genuinely compress
    d = _jpeg_decode_py(p8)
    assert d is not None
    got = np.frombuffer(d["pixels"], np.uint8).reshape(128, 128, 3)
    err = np.abs(got.astype(np.int32) - img.astype(np.int32))
    assert err.max() <= 48 and err.mean() <= 8, (err.max(), err.mean())

    # gray single-component frame
    pg = _jpeg_encode_dct_py(img[..., 0].tobytes(), 128, 128, q=1)
    d = _jpeg_decode_py(pg)
    assert d is not None and d["bpp"] == 8
    g = np.frombuffer(d["pixels"], np.uint8).reshape(128, 128)
    assert np.abs(g.astype(np.int32) - img[..., 0].astype(np.int32)).max() <= 2

    # non-MCU-multiple dims: edge padding encodes, decode crops back
    crop = img[:45, :30]
    d = _jpeg_decode_py(
        _jpeg_encode_dct_py(crop.tobytes(), 30, 45, q=1, subsampling="420")
    )
    assert d is not None and (d["width"], d["height"]) == (30, 45)

    import pytest as _pytest

    with _pytest.raises(ValueError, match="subsampling"):
        _jpeg_encode_dct_py(rgb, 128, 128, subsampling="422")
    with _pytest.raises(ValueError, match="bytes"):
        _jpeg_encode_dct_py(rgb[:-1], 128, 128)


def test_jpeg_dc_tie_rounding_and_fill_bytes_regressions():
    """Round-15 review regressions pinned. (1) DC-only planes go
    through the SAME stacked matmul as AC planes: at q=253, v=1 the
    dequantized DC -1012 puts dc/8 exactly on a half-integer tie
    where an algebraic dc/8 shortcut (tried and rejected) rounds
    half-even to 2 while the matmul's accumulation rounds to 1 — the
    decode must match the matmul/r14 value. (2) 0xFF fill bytes are
    tolerated INSIDE the scan too: before RST markers and before EOI
    (T.81 B.1.1.2), not just between header segments."""
    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_py,
    )

    d = _jpeg_decode_py(_jpeg_encode_py(bytes([1]), 1, 1, q=253))
    assert d is not None
    img = np.frombuffer(d["pixels"], np.uint8)
    assert (img == 1).all(), int(img[0])  # 2 = the rejected fast path

    # fill byte before EOI
    good = _jpeg_encode_py(bytes([50, 200]), 2, 1)
    base = _jpeg_decode_py(good)
    assert good.endswith(b"\xff\xd9")
    filled = good[:-2] + b"\xff" + good[-2:]
    d = _jpeg_decode_py(filled)
    assert d is not None and d["pixels"] == base["pixels"]

    # fill byte before an RST marker
    rst = _jpeg_encode_py(bytes([50, 200]), 2, 1, restart_interval=1)
    base = _jpeg_decode_py(rst)
    assert base is not None
    at = rst.index(b"\xff\xd0")
    d = _jpeg_decode_py(rst[:at] + b"\xff" + rst[at:])
    assert d is not None and d["pixels"] == base["pixels"]


def test_jpeg_progressive_equals_baseline():
    """PROGRESSIVE decode (round 15, T.81 Annex G): a progressively
    encoded payload and its baseline twin share the exact quantized
    coefficients (_jpeg_quantized_coefs) and the exact reconstruction
    (_jpeg_render), so their decodes must be BIT-IDENTICAL — across
    gray/4:4:4/4:2:0, q levels, non-MCU-multiple dims, and restart
    intervals (per-scan RST cycling with predictor/EOB-run/correction
    state resets). This is the end-to-end pin for all four scan
    kinds: DC first/refine, AC first (EOB runs), AC refine (the
    correction-bit walk, two successive-approximation passes for
    luma)."""
    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_dct_py, _jpeg_encode_prog_py,
        _jpeg_photo_like_py,
    )

    img = _jpeg_photo_like_py("jpg#0")
    rgb = img.tobytes()
    for sub in ("444", "420"):
        for q in (1, 8):
            db = _jpeg_decode_py(_jpeg_encode_dct_py(rgb, 128, 128, q=q, subsampling=sub))
            dp = _jpeg_decode_py(_jpeg_encode_prog_py(rgb, 128, 128, q=q, subsampling=sub))
            assert dp is not None, (sub, q)
            assert dp["pixels"] == db["pixels"], (sub, q)
            assert (dp["width"], dp["height"], dp["bpp"]) == (
                db["width"], db["height"], db["bpp"])

    gray = img[..., 0]
    db = _jpeg_decode_py(_jpeg_encode_dct_py(gray.tobytes(), 128, 128, q=2, subsampling="444"))
    dp = _jpeg_decode_py(_jpeg_encode_prog_py(gray.tobytes(), 128, 128, q=2))
    assert dp is not None and dp["pixels"] == db["pixels"] and dp["bpp"] == 8

    crop = img[:45, :30]
    db = _jpeg_decode_py(_jpeg_encode_dct_py(crop.tobytes(), 30, 45, q=8, subsampling="420"))
    for dri in (0, 1, 3, 7):
        dp = _jpeg_decode_py(_jpeg_encode_prog_py(
            crop.tobytes(), 30, 45, q=8, subsampling="420", restart_interval=dri))
        assert dp is not None and dp["pixels"] == db["pixels"], dri

    # randomized sweep: varied content/dims/q/subsampling, always exact
    import random
    rng = random.Random(0x9206)
    for trial in range(10):
        seed = f"prg#{trial}"
        im = _jpeg_photo_like_py(seed, size=64)
        tw = rng.randrange(17, 64)
        th = rng.randrange(17, 64)
        sub = rng.choice(("444", "420"))
        q = rng.choice((1, 4, 8, 16))
        dri = rng.choice((0, 0, 2, 5))
        part = np.ascontiguousarray(im[:th, :tw])
        db = _jpeg_decode_py(_jpeg_encode_dct_py(part.tobytes(), tw, th, q=q, subsampling=sub))
        dp = _jpeg_decode_py(_jpeg_encode_prog_py(
            part.tobytes(), tw, th, q=q, subsampling=sub, restart_interval=dri))
        assert dp is not None, (trial, tw, th, sub, q, dri)
        assert dp["pixels"] == db["pixels"], (trial, tw, th, sub, q, dri)


def test_jpeg_progressive_hand_assembled_refinement():
    """First-principles progressive vector — assembled bit-by-bit by
    hand so an encoder bug cannot cancel a decoder bug: 8x8 gray,
    q=1, three scans (DC first at Al=0; AC first at Al=1 placing +2
    at zigzag 1; AC refine to Al=0 turning it into +3 via a
    correction bit and inserting a new -1 at zigzag 2). The decode
    must match a literal definition-formula IDCT of the final
    coefficients F[0,0]=16, F[0,1]=3, F[1,0]=-1."""
    import math
    import struct as st

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _JPEG_FULL_DC_BITS, _JPEG_FULL_DC_VALS, _JPEG_PROG_AC_BITS,
        _JPEG_PROG_AC_VALS, _JPEG_ZIGZAG, _JpegBitWriter, _jpeg_decode_py,
        _jpeg_huffman_codes, _jpeg_seg,
    )

    dc_codes = _jpeg_huffman_codes(_JPEG_FULL_DC_BITS)
    # the uniform-8-bit AC table: symbol at VALS index i has code i
    ac_idx = {v: i for i, v in enumerate(_JPEG_PROG_AC_VALS)}

    head = (
        b"\xff\xd8"
        + _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
        + _jpeg_seg(0xC2, st.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_FULL_DC_BITS) + bytes(_JPEG_FULL_DC_VALS))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_PROG_AC_BITS) + bytes(_JPEG_PROG_AC_VALS))
    )

    def sos(ss, se, ah, al):
        return _jpeg_seg(0xDA, bytes([1, 1, 0x00, ss, se, (ah << 4) | al]))

    # scan 1: DC first, Ah=0 Al=0, diff = +16 (category 5)
    bw = _JpegBitWriter()
    ln, code = dc_codes[5]
    bw.put(code, ln)
    bw.put(16, 5)
    s1 = sos(0, 0, 0, 0) + bw.flush()
    # scan 2: AC first 1..63 at Al=1: (run 0, size 1) +1 at k=1
    # (stored as 1 << 1 = 2), then EOB
    bw = _JpegBitWriter()
    bw.put(ac_idx[0x01], 8)
    bw.put(1, 1)  # +1
    bw.put(ac_idx[0x00], 8)  # EOB
    s2 = sos(1, 63, 0, 1) + bw.flush()
    # scan 3: AC refine 1..63, Ah=1 Al=0: symbol (run 0, size 1) with
    # sign 0 (-1, lands at k=2), correction bit 1 for the nonzero at
    # k=1 (2 -> 3) read during the advance, then EOB for the tail
    bw = _JpegBitWriter()
    bw.put(ac_idx[0x01], 8)
    bw.put(0, 1)  # sign: negative
    bw.put(1, 1)  # correction bit for k=1
    bw.put(ac_idx[0x00], 8)  # EOB covering 3..63
    s3 = sos(1, 63, 1, 0) + bw.flush()

    payload = head + s1 + s2 + s3 + b"\xff\xd9"
    d = _jpeg_decode_py(payload)
    assert d is not None and (d["width"], d["height"], d["bpp"]) == (8, 8, 8)
    got = np.frombuffer(d["pixels"], np.uint8).reshape(8, 8)

    def C(u):
        return math.sqrt(0.5) if u == 0 else 1.0

    F = np.zeros((8, 8))
    F.flat[_JPEG_ZIGZAG[0]] = 16
    F.flat[_JPEG_ZIGZAG[1]] = 3
    F.flat[_JPEG_ZIGZAG[2]] = -1
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (
                        C(u) * C(v) / 4 * F[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            ref[x, y] = s
    expect = np.clip(np.rint(ref + 128.0), 0, 255).astype(np.uint8)
    assert (got == expect).all()
    assert len(np.unique(got)) > 1

    # the INCOMPLETE stream (refinement scan missing) refuses —
    # decode-to-full-precision or nothing, never an approximation
    assert _jpeg_decode_py(head + s1 + s2 + b"\xff\xd9") is None
    # double-coding a band refuses
    assert _jpeg_decode_py(head + s1 + s2 + s2 + s3 + b"\xff\xd9") is None
    # refinement with the wrong Ah (skipping a precision level) refuses
    bad3 = sos(1, 63, 2, 1) + s3[len(sos(1, 63, 1, 0)):]
    assert _jpeg_decode_py(head + s1 + s2 + bad3 + b"\xff\xd9") is None
    # AC scan before the component's DC scan refuses
    assert _jpeg_decode_py(head + s2 + s1 + s3 + b"\xff\xd9") is None


def test_jpeg_progressive_refusals_and_fuzz():
    """Progressive structural refusals (multi-component AC scan,
    band out of range, second frame header, bad restart cadence) and
    a corruption fuzz: random byte flips must refuse or decode —
    never crash."""
    import random

    from firebolt_spark.operators.multimodal import (
        _jpeg_decode_py, _jpeg_encode_prog_py, _jpeg_photo_like_py,
    )

    img = _jpeg_photo_like_py("jpg#1", size=32)
    p = _jpeg_encode_prog_py(img.tobytes(), 32, 32, q=8, subsampling="420")
    assert _jpeg_decode_py(p) is not None

    # multi-component AC scan: patch the luma AC-first SOS (1 comp)
    # into claiming Ss>0 with 3 components — structurally refused.
    # Find the second SOS (first is the interleaved DC scan).
    first = p.index(b"\xff\xda")
    second = p.index(b"\xff\xda", first + 2)
    bad = bytearray(p)
    assert bad[second + 4] == 1  # ns
    # can't just flip ns (length mismatch refuses first — also fine);
    # verify at least that the mismatch refuses rather than crashes
    bad[second + 4] = 3
    assert _jpeg_decode_py(bytes(bad)) is None
    # Se out of range
    bad = bytearray(p)
    se_at = second + 2 + 2 + 1 + 2 + 1  # len(2) + ns(1) + comp(2) + Ss(1) -> Se
    assert bad[se_at] == 5  # the luma 1..5 spectral split
    bad[se_at] = 64
    assert _jpeg_decode_py(bytes(bad)) is None
    # a second frame header refuses
    sof_at = p.index(b"\xff\xc2")
    sof_end = sof_at + 2 + int.from_bytes(p[sof_at + 2 : sof_at + 4], "big")
    seg = p[sof_at:sof_end]
    assert _jpeg_decode_py(p[:sof_end] + seg + p[sof_end:]) is None
    # restart cadence: declare DRI=2 without emitting RSTs
    import struct as st

    from firebolt_spark.operators.multimodal import _jpeg_seg

    assert _jpeg_decode_py(
        p[:sof_at] + _jpeg_seg(0xDD, st.pack(">H", 2)) + p[sof_at:]
    ) is None

    rng = random.Random(0xFADE)
    for _ in range(300):
        bad = bytearray(p)
        for _f in range(rng.randrange(1, 4)):
            bad[rng.randrange(2, len(bad) - 2)] ^= 1 << rng.randrange(8)
        _jpeg_decode_py(bytes(bad))  # must not raise


def test_jpeg_prog_review_regressions():
    """Round-15 progressive-review regressions pinned: (1) the SOF
    allocation cap — a 20-byte payload declaring 65535x65535 refuses
    instantly instead of OOMing the executor, for both frame types;
    (2) DC scans interleaving a SUBSET of the frame's components
    (custom scan scripts emit chroma-only DC scans) decode; (3) a
    quantization table must be defined before a component's first
    scan — DQT-after-the-fact refuses."""
    import struct as st

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _JPEG_FULL_DC_BITS, _JPEG_FULL_DC_VALS, _JPEG_PROG_AC_BITS,
        _JPEG_PROG_AC_VALS, _JpegBitWriter, _jpeg_decode_py,
        _jpeg_huffman_codes, _jpeg_seg,
    )

    # (1) allocation cap, progressive and baseline frame headers
    for sofm in (0xC2, 0xC0):
        huge = (
            b"\xff\xd8"
            + _jpeg_seg(sofm, st.pack(">BHHB", 8, 65535, 65535, 1)
                        + bytes([1, 0x11, 0]))
        )
        assert _jpeg_decode_py(huge) is None

    # (2)+(3): hand-build a 3-comp 4:4:4 progressive stream whose DC
    # arrives via TWO scans — luma alone (non-interleaved), then the
    # two chroma components interleaved as a subset DC scan — with
    # flat coefficients so the expectation is analytic.
    dc_codes = _jpeg_huffman_codes(_JPEG_FULL_DC_BITS)
    ac_idx = {v: i for i, v in enumerate(_JPEG_PROG_AC_VALS)}

    def dc_bits(bw, diff):
        s = abs(diff).bit_length()
        ln, code = dc_codes[s]
        bw.put(code, ln)
        if s:
            bw.put(diff if diff >= 0 else diff + (1 << s) - 1, s)

    dqt = _jpeg_seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = _jpeg_seg(
        0xC2,
        st.pack(">BHHB", 8, 8, 8, 3)
        + bytes([1, 0x11, 0, 2, 0x11, 0, 3, 0x11, 0]),
    )
    dht = (
        _jpeg_seg(0xC4, bytes([0x00]) + bytes(_JPEG_FULL_DC_BITS)
                  + bytes(_JPEG_FULL_DC_VALS))
        + _jpeg_seg(0xC4, bytes([0x10]) + bytes(_JPEG_PROG_AC_BITS)
                    + bytes(_JPEG_PROG_AC_VALS))
    )
    # scan A: luma DC only, Al=0, diff +16
    bw = _JpegBitWriter()
    dc_bits(bw, 16)
    scan_a = _jpeg_seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00])) + bw.flush()
    # scan B: chroma SUBSET interleaved DC, Al=0, diffs +8 and -8
    bw = _JpegBitWriter()
    dc_bits(bw, 8)
    dc_bits(bw, -8)
    scan_b = _jpeg_seg(
        0xDA, bytes([2, 2, 0x00, 3, 0x00, 0, 0, 0x00])
    ) + bw.flush()
    # AC scans: every component all-zero band 1..63 at Al=0 (EOB)
    ac_scans = b""
    for cid in (1, 2, 3):
        bw = _JpegBitWriter()
        bw.put(ac_idx[0x00], 8)
        ac_scans += _jpeg_seg(
            0xDA, bytes([1, cid, 0x00, 1, 63, 0x00])
        ) + bw.flush()

    payload = b"\xff\xd8" + dqt + sof + dht + scan_a + scan_b + ac_scans + b"\xff\xd9"
    d = _jpeg_decode_py(payload)
    assert d is not None and d["bpp"] == 24
    px = np.frombuffer(d["pixels"], np.uint8).reshape(8, 8, 3)
    # flat Y=130, Cb=129, Cr=127: r = floor(130 + 1.402*(-1) + .5)
    from tests.test_llm_ops import _jpeg_rgb_ref

    assert (px == _jpeg_rgb_ref(130, 129, 127)).all()

    # (3) the same stream with DQT moved AFTER the scans refuses
    payload_late_q = b"\xff\xd8" + sof + dht + scan_a + scan_b + ac_scans + dqt + b"\xff\xd9"
    assert _jpeg_decode_py(payload_late_q) is None


def test_avi_roundtrip_and_refusals():
    """AVI demux (round 15): known-answer DIB and MJPG roundtrips,
    randomized DIB parity vs a numpy reference, MJPG carrying 4:2:0
    AND progressive JPEG frames (the whole round-15 JPEG surface
    rides inside the container), and the refusal matrix — truncation,
    multi-stream, modern-codec fourcc, frame-count and dim
    mismatches, top-down DIB, chunk-kind/codec disagreement, and the
    allocation cap. Plus a 300-flip fuzz: refuse or decode, never
    crash."""
    import random
    import struct as st

    import numpy as np

    from firebolt_spark.operators.multimodal import (
        _avi_decode_py, _avi_encode_py, _jpeg_decode_py,
        _jpeg_encode_dct_py, _jpeg_encode_prog_py, _jpeg_encode_py,
        _jpeg_photo_like_py,
    )

    # known-answer DIB
    f0, f1 = bytes(range(24)), bytes(range(100, 124))
    p = _avi_encode_py([f0, f1], 4, 2, codec="DIB ")
    d = _avi_decode_py(p)
    assert d is not None and (d["width"], d["height"], d["n_frames"]) == (4, 2, 2)
    for i, f in enumerate((f0, f1)):
        want = tuple(
            round(float(np.frombuffer(f, np.uint8).reshape(-1, 3)[:, c].mean()), 6)
            for c in range(3)
        )
        assert d["frame_means"][i] == want, i

    # randomized DIB parity (odd widths exercise row padding)
    rng = random.Random(0xA51)
    for _ in range(25):
        w = rng.randrange(1, 9)
        h = rng.randrange(1, 6)
        nf = rng.randrange(1, 5)
        frames = [bytes(rng.randrange(256) for _ in range(3 * w * h)) for _ in range(nf)]
        d = _avi_decode_py(_avi_encode_py(frames, w, h, codec="DIB "))
        assert d is not None, (w, h, nf)
        for i, f in enumerate(frames):
            px = np.frombuffer(f, np.uint8).reshape(-1, 3)
            want = tuple(round(float(px[:, c].mean()), 6) for c in range(3))
            assert d["frame_means"][i] == want, (w, h, i)

    # MJPG: flat-tile baseline, real-content 4:2:0, AND progressive
    # frames all demux + decode; per-frame means must equal decoding
    # the same payloads directly
    img = _jpeg_photo_like_py("avi#x", size=32)
    jf = [
        _jpeg_encode_py(bytes([40, 200]), 2, 1),  # gray 16x8 -> wrong dims: refused below
    ]
    frames = [
        _jpeg_encode_dct_py(img.tobytes(), 32, 32, q=8, subsampling="420"),
        _jpeg_encode_prog_py(img.tobytes(), 32, 32, q=8, subsampling="420"),
        _jpeg_encode_dct_py(img.tobytes(), 32, 32, q=8, subsampling="444"),
    ]
    p = _avi_encode_py(frames, 32, 32, codec="MJPG")
    d = _avi_decode_py(p)
    assert d is not None and d["n_frames"] == 3
    for i, f in enumerate(frames):
        j = _jpeg_decode_py(f)
        assert d["frame_means"][i] == (j["mean_r"], j["mean_g"], j["mean_b"]), i
    # a frame whose own SOF dims contradict the container refuses
    assert _avi_decode_py(_avi_encode_py(jf, 32, 32, codec="MJPG")) is None

    # refusals
    assert _avi_decode_py(p[:-20]) is None  # truncated RIFF
    avih_at = p.index(b"avih") + 8
    bad = bytearray(p)
    bad[avih_at + 24] = 2  # dwStreams = 2
    assert _avi_decode_py(bytes(bad)) is None
    bad = bytearray(p)
    bad[avih_at + 16] ^= 1  # dwTotalFrames off by one
    assert _avi_decode_py(bytes(bad)) is None
    bad = bytearray(p)
    bad[avih_at + 32] += 1  # avih width contradicts strf
    assert _avi_decode_py(bytes(bad)) is None
    strf_at = p.index(b"strf") + 8
    bad = bytearray(p)
    bad[strf_at + 16 : strf_at + 20] = b"H264"  # modern codec fourcc
    assert _avi_decode_py(bytes(bad)) is None
    # top-down DIB (negative biHeight) refuses
    pd_ = _avi_encode_py([f0], 4, 2, codec="DIB ")
    strf_at = pd_.index(b"strf") + 8
    bad = bytearray(pd_)
    bad[strf_at + 8 : strf_at + 12] = st.pack("<i", -2)
    # keep avih height positive 2: dims cross-check uses abs()
    assert _avi_decode_py(bytes(bad)) is None
    # chunk kind vs codec disagreement: relabel 00dc as 00db
    bad = bytearray(p)
    at = bad.index(b"00dc")
    bad[at : at + 4] = b"00db"
    assert _avi_decode_py(bytes(bad)) is None
    # allocation cap on header dims
    huge = _avi_encode_py([f0], 4, 2, codec="DIB ")
    avih_at = huge.index(b"avih") + 8
    bad = bytearray(huge)
    bad[avih_at + 32 : avih_at + 36] = st.pack("<I", 1 << 15)
    bad[avih_at + 36 : avih_at + 40] = st.pack("<I", 1 << 15)
    strf_at = huge.index(b"strf") + 8
    bad[strf_at + 4 : strf_at + 8] = st.pack("<i", 1 << 15)
    bad[strf_at + 8 : strf_at + 12] = st.pack("<i", 1 << 15)
    assert _avi_decode_py(bytes(bad)) is None

    # stride economy: dropped MJPG frames are never JPEG-decoded
    import firebolt_spark.operators.multimodal as mm

    calls = []
    orig = mm._jpeg_decode_py
    mm._jpeg_decode_py = lambda pl: calls.append(1) or orig(pl)
    try:
        d = _avi_decode_py(p, frame_stride=2)
    finally:
        mm._jpeg_decode_py = orig
    assert d is not None and d["frame_idxs"] == [0, 2]
    assert len(calls) == 2  # frame 1 skipped at demux time

    # fuzz: refuse or decode, never crash
    rng = random.Random(0xA52)
    for _ in range(300):
        bad = bytearray(p)
        for _f in range(rng.randrange(1, 4)):
            bad[rng.randrange(0, len(bad))] ^= 1 << rng.randrange(8)
        _avi_decode_py(bytes(bad))

    # encoder validation
    import pytest as _pytest

    with _pytest.raises(ValueError, match="codec"):
        _avi_encode_py([f0], 4, 2, codec="H264")
    with _pytest.raises(ValueError, match="RGB bytes"):
        _avi_encode_py([f0[:-1]], 4, 2, codec="DIB ")
    with _pytest.raises(ValueError, match="JPEG"):
        _avi_encode_py([b"nope"], 4, 2, codec="MJPG")


def test_video_frames_operator_and_dispatch(spark):
    """video_frames over the avi_encode fixture: per-frame rows with
    the gif_frames schema, parse-time stride, decoder_backend
    injection parity, and the extract_features RIFF dispatch split
    (WAVE payloads keep the audio mapping, AVI payloads get real
    video rows with true n_frames)."""
    from firebolt_spark.operators import multimodal
    from firebolt_spark.operators.multimodal import _avi_decode_py

    docs = spark.createDataFrame(
        [(i, f"doc {i} text") for i in range(8)], "doc_id LONG, text STRING"
    )
    media = multimodal.avi_encode(docs)
    rows = multimodal.video_frames(media).collect()
    # frame counts: 2 + doc_id % 3 per doc
    import collections

    per_doc = collections.Counter(r.doc_id for r in rows)
    assert per_doc == {i: 2 + i % 3 for i in range(8)}
    # stride keeps frames 0, 2, ...
    strided = multimodal.video_frames(media, every_nth=2).collect()
    assert {(r.doc_id, r.frame_idx) for r in strided} == {
        (r.doc_id, r.frame_idx) for r in rows if r.frame_idx % 2 == 0
    }
    # backend injection parity (delegating backend == default path)
    injected = multimodal.video_frames(
        media,
        decoder_backend=lambda p, stride: _avi_decode_py(
            p, frame_stride=stride
        ),
    ).collect()
    assert sorted(map(tuple, injected)) == sorted(map(tuple, rows))

    # extract_features: AVI rows are real video (n_frames = true
    # count), WAV keeps the audio mapping
    feats = {
        r.doc_id: r
        for r in multimodal.extract_features(
            media, decode_stub=False
        ).collect()
    }
    for i in range(8):
        assert feats[i].n_frames == 2 + i % 3, i
        assert feats[i].kind == "video"
    wav = multimodal.wav_encode(docs)
    wf = multimodal.extract_features(wav, decode_stub=False).collect()
    assert all(r.feature[2] > 0 for r in wf)  # sample-rate slot intact
