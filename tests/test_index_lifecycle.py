"""Index lifecycle e2e — the reindex loop ``docs/ann_index.md``
describes: stream skewed ingest batches into an on-disk IVF index until
one cluster dominates, read ``index_stats`` (the reindex-decision
input), rebuild with more centroids, and measure the probe-cost
re-balance. Carried from VERDICT r9 Next #7 / r10 Next #4.

The skew model: each appended batch is drawn from the hot cluster's
rows, re-keyed and given a deterministic per-element jitter — a hot
REGION rather than a point mass, which is what real ingest drift looks
like (new documents concentrated around a trending topic). The frozen
build-time centroids assign the whole region to the one hot cluster;
only a rebuild can re-partition it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from firebolt_spark.catalog import load_table
from firebolt_spark.operators import similarity as sim
from tests.conftest import SF_DIR


def _profile(spark, path: str) -> dict[int, int]:
    return {
        int(r["cluster"]): int(r["n_vectors"])
        for r in sim.index_stats(spark, path).collect()
    }


def test_append_skew_stats_rebuild_rebalances_probe_cost(spark, tmp_path):
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 300)
    p = str(tmp_path / "ivf")
    sim.build_ivf_index(base, p, n_centroids=4)

    prof0 = _profile(spark, p)
    hot = max(prof0, key=prof0.get)

    # --- skewed ingest: 3 batches drawn from the hot cluster's rows,
    # re-keyed, jittered around their original directions ---
    idx = spark.read.parquet(p)
    vec_t = idx.schema["embedding"].dataType
    hot_rows = idx.filter(F.col("cluster") == hot).select("vec_id", "embedding")
    for k in range(1, 4):
        batch = hot_rows.select(
            (F.col("vec_id") + F.lit(100000 * k)).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x
                * (F.lit(1.0) + F.lit(0.05 * k) * F.sin(i.cast("double"))),
            ).cast(vec_t).alias("embedding"),
        )
        sim.append_ivf_index(batch, p, batch_id=k)

    # --- index_stats flags the drift: the hot cluster absorbed the
    # skew (frozen centroids can't re-partition it) and now dominates
    # every other cluster's probe cost ---
    prof1 = _profile(spark, p)
    assert prof1[hot] >= prof0[hot] * 3  # ~all 3 batches landed there
    others = [n for c, n in prof1.items() if c != hot]
    assert prof1[hot] > 2 * max(others)  # the doc's rebuild trigger

    # --- rebuild with more centroids (the corpus grew ~2x; the doc's
    # standard reindex response) from the drifted corpus itself ---
    full = spark.read.parquet(p).select("vec_id", "embedding")
    p2 = str(tmp_path / "ivf8")
    sim.build_ivf_index(full, p2, n_centroids=8)
    prof2 = _profile(spark, p2)

    # probe cost for a query is the population of its probed clusters;
    # the worst case is bounded by the biggest cluster, which the
    # rebuild at least halves (measured: 332 -> 127 on this fixture)
    assert max(prof2.values()) * 2 < max(prof1.values())

    # --- result quality survives the rebuild: an exhaustive probe
    # (n_probe = n_centroids) of the new index reproduces brute-force
    # cosine top-k over the drifted corpus exactly ---
    qids = [10, 20, 30]
    from_index = sim.ann_ivf_topk_from_index(
        spark, p2, query_ids=qids, k=5, n_probe=8
    )
    brute = sim.cosine_topk(full, query_ids=qids, k=5)
    assert sorted(map(tuple, from_index.collect())) == sorted(
        map(tuple, brute.collect())
    ), "exhaustive probe of the rebuilt index must equal brute force"


def test_shingle_append_boilerplate_stats_pick_the_cap(spark, wh_table):
    """The text analogue of the IVF drill above (round 11): ingest
    batches carrying a spreading boilerplate footer are appended to a
    shingle index; text_index_stats makes the drift measurable (the
    footer tier dwarfs every organic df); a max_df_count chosen FROM
    the profile — not guessed — removes exactly the boilerplate-only
    pairs while a true cross-batch near-dup pair survives the cap."""
    from firebolt_spark.operators.dedup import (
        append_shingle_index, build_shingle_index, ngram_jaccard_pairs,
        text_index_stats,
    )

    base = load_table(spark, SF_DIR, "documents").select(
        "doc_id", "text"
    ).filter(F.col("doc_id") < 300)
    tbl = wh_table("t_lifecycle_sh")
    build_shingle_index(base, tbl, num_buckets=8)

    FOOTER = " click here to subscribe to our newsletter today"
    DUP = "identical organic passage alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = []
    for k in (1, 2, 3):
        for i in range(40):
            organic = " ".join(f"u{k}w{i}t{j}" for j in range(12))
            rows.append((100000 * k + i, organic + FOOTER))
    # one true near-dup pair spanning the last batch
    rows += [(999001, DUP + FOOTER), (999002, DUP + FOOTER)]
    batch_all = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    for k in (1, 2, 3):
        lo, hi = 100000 * k, 100000 * k + 40
        b = batch_all.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            | (F.lit(k == 3) & (F.col("doc_id") >= 999000))
        )
        append_shingle_index(b, tbl)

    # --- the profile flags the drift: the footer tier (df = all 122
    # footered docs, exact) towers over the organic ceiling ---
    stats = text_index_stats(spark, tbl)
    dfs = [r["n_docs"] for r in stats.limit(200).collect()]
    top_df = dfs[0]
    assert top_df == 122
    organic_ceiling = next(v for v in dfs if v < top_df)
    assert top_df >= 3 * organic_ceiling
    cap = organic_ceiling  # the decision, read from the profile

    corpus = base.unionByName(batch_all)
    footer_only = lambda df: df.filter(  # noqa: E731
        (F.col("doc_a") >= 100000) & (F.col("doc_b") >= 100000)
        & ~((F.col("doc_a") == 999001) & (F.col("doc_b") == 999002))
    )
    uncapped = ngram_jaccard_pairs(corpus, threshold=0.1, shingle_index=tbl)
    assert footer_only(uncapped).count() > 1000  # the blowup is real
    capped = ngram_jaccard_pairs(
        corpus, threshold=0.1, shingle_index=tbl, max_df_count=cap
    )
    assert footer_only(capped).count() == 0
    # the true near-dup pair survives: its organic shingles carry it
    assert capped.filter(
        (F.col("doc_a") == 999001) & (F.col("doc_b") == 999002)
    ).count() == 1


def _topk(spark, path, qids, k=5, n_probe=2):
    return sorted(map(tuple, sim.ann_ivf_topk_from_index(
        spark, path, query_ids=qids, k=k, n_probe=n_probe
    ).collect()))


def test_compact_ann_index_ivf(spark, tmp_path):
    """compact_ann_index on an IVF artifact (round 13 — VERDICT r12
    Next #4): after N staged appends the index holds ~N small files per
    touched partition dir; compaction resets the file count to the
    build shape while the probe result, _meta, _centroids, and the
    _batches replay ledger stay EXACTLY as before — a replayed applied
    batch is still a no-op post-compact."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 300)
    p = str(tmp_path / "ivf")
    sim.build_ivf_index(base, p, n_centroids=4)
    vec_t = spark.read.parquet(p).schema["embedding"].dataType
    for k in (1, 2, 3):
        batch = emb.filter(
            (F.col("vec_id") >= 300 + 50 * (k - 1))
            & (F.col("vec_id") < 300 + 50 * k)
        ).select("vec_id", F.col("embedding").cast(vec_t).alias("embedding"))
        sim.append_ivf_index(batch, p, batch_id=k)
    sim.append_ivf_index(  # at-least-once replay: already a no-op
        emb.filter(F.col("vec_id") < 50).select(
            "vec_id", F.col("embedding").cast(vec_t).alias("embedding")
        ), p, batch_id=2,
    )
    qids = [10, 320, 410]
    ref = _topk(spark, p, qids)
    ref_rows = spark.read.parquet(p).count()
    files_before = sim.count_index_files(spark, p)
    meta_before = sim._read_index_meta(spark, p)

    sim.compact_ann_index(spark, p)

    files_after = sim.count_index_files(spark, p)
    assert files_after < files_before / 2  # the reclaim
    assert spark.read.parquet(p).count() == ref_rows  # same rows
    assert _topk(spark, p, qids) == ref  # bit-identical probe
    assert sim._read_index_meta(spark, p) == meta_before
    assert sim._applied_batches(spark, p) == {1, 2, 3}  # ledger intact
    # a replay of an applied batch is STILL a no-op post-compact
    sim.append_ivf_index(
        emb.filter(F.col("vec_id") < 50).select(
            "vec_id", F.col("embedding").cast(vec_t).alias("embedding")
        ), p, batch_id=3,
    )
    assert spark.read.parquet(p).count() == ref_rows
    # no swap leftovers
    import os

    assert not os.path.exists(p + "_cstage")
    assert not os.path.exists(p + "_cold")
    # and a fresh append + second compact still round-trips
    sim.append_ivf_index(
        emb.filter((F.col("vec_id") >= 450) & (F.col("vec_id") < 470)).select(
            "vec_id", F.col("embedding").cast(vec_t).alias("embedding")
        ), p, batch_id=4,
    )
    post = _topk(spark, p, qids)
    sim.compact_ann_index(spark, p)
    assert _topk(spark, p, qids) == post


def test_compact_ann_index_lsh(spark, tmp_path):
    """The LSH twin: (tbl, sig) layout compacts the same way, probes
    stay bit-identical, and the partition-pruned read shape survives
    (the probe never opens unprobed buckets — same plan contract as
    before the compact)."""
    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 300)
    p = str(tmp_path / "lsh")
    sim.build_lsh_index(base, p, planes=4, tables=2)
    vec_t = spark.read.parquet(p).schema["embedding"].dataType
    for k in (1, 2):
        batch = emb.filter(
            (F.col("vec_id") >= 300 + 60 * (k - 1))
            & (F.col("vec_id") < 300 + 60 * k)
        ).select("vec_id", F.col("embedding").cast(vec_t).alias("embedding"))
        sim.append_lsh_index(batch, p, batch_id=k)
    qids = [10, 320]

    def probe():
        return sorted(map(tuple, sim.ann_lsh_topk_from_index(
            spark, p, query_ids=qids, k=5
        ).collect()))

    ref = probe()
    rows = spark.read.parquet(p).count()
    files_before = sim.count_index_files(spark, p)
    sim.compact_ann_index(spark, p)
    assert sim.count_index_files(spark, p) < files_before
    assert spark.read.parquet(p).count() == rows
    assert probe() == ref
    assert sim._applied_batches(spark, p) == {1, 2}


def test_compact_ann_index_crash_and_race(spark, tmp_path, monkeypatch):
    """The compaction failure windows: (a) the between-renames window
    (index root absent, complete stage present) is promoted by the next
    call; (b) an orphaned stage beside an intact index is discarded;
    (c) a concurrent append landing between the snapshot and the swap
    aborts LOUDLY with the index untouched (single-writer contract,
    best-effort enforced via the _batches re-check); (d) a crashed
    append's half-moved files are purged, not folded in — the batch's
    later replay does not duplicate rows."""
    import os
    import shutil

    import pytest as _pytest

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    base = emb.filter(F.col("vec_id") < 200)
    p = str(tmp_path / "ivf")
    sim.build_ivf_index(base, p, n_centroids=4)
    vec_t = spark.read.parquet(p).schema["embedding"].dataType
    batch1 = emb.filter(
        (F.col("vec_id") >= 200) & (F.col("vec_id") < 240)
    ).select("vec_id", F.col("embedding").cast(vec_t).alias("embedding"))
    sim.append_ivf_index(batch1, p, batch_id=1)
    qids = [10, 210]
    ref = _topk(spark, p, qids)

    # (a) between-renames window: compact, then simulate the crash by
    # moving the result back to the stage name (path absent, stage
    # complete) — recovery must promote it
    sim.compact_ann_index(spark, p)
    ref_rows = spark.read.parquet(p).count()
    os.rename(p, p + "_cstage")
    sim.compact_ann_index(spark, p)
    assert spark.read.parquet(p).count() == ref_rows
    assert _topk(spark, p, qids) == ref

    # (b) orphaned (possibly partial) stage beside an intact index
    os.makedirs(p + "_cstage/garbage")
    sim.compact_ann_index(spark, p)
    assert not os.path.exists(p + "_cstage")
    assert _topk(spark, p, qids) == ref

    # (c) concurrent append between snapshot and swap -> loud abort
    real = sim._applied_batches
    calls = {"n": 0}

    def racing(spark_, path_):
        calls["n"] += 1
        got = real(spark_, path_)
        # compact_ann_index reads the ledger three times (staging
        # triage, snapshot, pre-swap re-check); the RE-CHECK — the 3rd
        # call — must see the NEW id a concurrent append just recorded
        # (the real race direction: live ⊃ snapshot)
        if calls["n"] == 3:
            return got | {999}
        return got

    monkeypatch.setattr(sim, "_applied_batches", racing)
    with _pytest.raises(RuntimeError, match="concurrent append"):
        sim.compact_ann_index(spark, p)
    monkeypatch.setattr(sim, "_applied_batches", real)
    assert not os.path.exists(p + "_cstage")  # stage dropped
    assert _topk(spark, p, qids) == ref       # index untouched

    # (d) crashed append attempt: stage a batch and half-move it, then
    # compact — the purge must drop the uncommitted rows so the
    # batch's replay applies cleanly, with no duplicates
    batch2 = emb.filter(
        (F.col("vec_id") >= 240) & (F.col("vec_id") < 260)
    ).select("vec_id", F.col("embedding").cast(vec_t).alias("embedding"))
    staging = f"{p}/_staging/b2"
    from firebolt_spark.functions import write_partitioned

    from firebolt_spark.operators.similarity import _move_tree, norm

    cents = spark.read.parquet(p + "/_centroids")
    assigned = sim._nearest(
        batch2.withColumn("_norm", norm("embedding")), cents,
        "vec_id", "embedding",
    )
    write_partitioned(
        assigned.select("vec_id", "embedding", "_norm", "cluster"),
        staging + "/data", ["cluster"],
    )
    _move_tree(spark, staging + "/data", p, 2)  # crash: moved, no record
    shutil.rmtree(staging + "/data")
    pre = spark.read.parquet(p).count()
    assert pre > ref_rows  # the half-moved rows are visible pre-compact
    sim.compact_ann_index(spark, p)
    assert spark.read.parquet(p).count() == ref_rows  # purged, not kept
    sim.append_ivf_index(batch2, p, batch_id=2)       # the replay
    rows_with_b2 = ref_rows + batch2.count()
    assert spark.read.parquet(p).count() == rows_with_b2

    # (e) a COMMITTED batch that crashed AFTER its _batches record but
    # before its staging cleanup: the leftover staging dir must NOT
    # get the batch's live rows purged (its replay is a no-op — the
    # rows would be lost forever); only the stale staging dir goes
    batch3 = emb.filter(
        (F.col("vec_id") >= 260) & (F.col("vec_id") < 275)
    ).select("vec_id", F.col("embedding").cast(vec_t).alias("embedding"))
    sim.append_ivf_index(batch3, p, batch_id=3)  # fully committed
    rows_with_b3 = rows_with_b2 + batch3.count()
    assert spark.read.parquet(p).count() == rows_with_b3
    os.makedirs(staging.replace("b2", "b3") + "/data")  # the crash relic
    sim.compact_ann_index(spark, p)
    assert spark.read.parquet(p).count() == rows_with_b3  # rows survive
    assert sim._applied_batches(spark, p) == {1, 2, 3}
    assert not os.path.exists(p + "/_staging")
    sim.append_ivf_index(batch3, p, batch_id=3)  # replay: still a no-op
    assert spark.read.parquet(p).count() == rows_with_b3


def test_compact_ann_index_auto_file_bound(spark, tmp_path):
    """max_records_per_file='auto' (ROADMAP r13 candidate): the bound
    derives from the index's own population profile — 4x the mean
    partition count — so near-mean partitions compact to ONE file per
    directory while a skewed hot partition splits into several, and
    the probe stays bit-identical. Non-'auto' strings are refused."""
    import math
    import os

    import pytest as _pytest

    emb = load_table(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    p = str(tmp_path / "ivf-auto")
    # a genuinely skewed build: 100 IDENTICAL vectors MUST share one
    # cluster, beside 50 organic ones whose LOW ids seed the centroids
    # (seeding is first-n-by-id — identical seeds would collapse every
    # centroid) — the hot-bucket shape index_stats flags
    hot = emb.filter(
        (F.col("vec_id") >= 300) & (F.col("vec_id") < 400)
    ).select(
        "vec_id", F.expr("transform(embedding, x -> 1.0D)").alias(
            "embedding"
        ),
    )
    rest = emb.filter(F.col("vec_id") < 50).select("vec_id", "embedding")
    sim.build_ivf_index(rest.unionByName(hot), p, n_centroids=8)

    stats = {
        tuple(r)[:-1][0]: r["n_vectors"]
        for r in sim.index_stats(spark, p).collect()
    }
    total, parts = sum(stats.values()), len(stats)
    assert max(stats.values()) >= 100  # the identical block stayed whole
    assert max(stats.values()) > 4 * total / parts  # skew is real
    bound = sim.auto_max_records_per_file(spark, p)
    assert bound == max(1, math.ceil(4 * total / parts))

    qids = [5, 320]
    ref = sorted(map(tuple, sim.ann_ivf_topk_from_index(
        spark, p, query_ids=qids, k=5
    ).collect()))
    sim.compact_ann_index(spark, p, max_records_per_file="auto")
    got = sorted(map(tuple, sim.ann_ivf_topk_from_index(
        spark, p, query_ids=qids, k=5
    ).collect()))
    assert got == ref

    # per-partition file counts: every partition has ceil(count/bound)
    # files — one for near-mean partitions, several for the hot one
    for cluster, count in stats.items():
        d = os.path.join(p, f"cluster={cluster}")
        n_files = len([
            f for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith(".")
        ])
        assert n_files == math.ceil(count / bound), (cluster, count, bound)
    hot_cluster = max(stats, key=stats.get)
    d = os.path.join(p, f"cluster={hot_cluster}")
    assert len([
        f for f in os.listdir(d) if f.endswith(".parquet")
    ]) > 1  # the hot bucket split into parallel-scannable files

    with _pytest.raises(ValueError, match="'auto'"):
        sim.compact_ann_index(spark, p, max_records_per_file="always")


def test_warehouse_audit_classifies_tables(spark, wh_table):
    """tools/warehouse_audit.py (VERDICT r13 Next #7): over a synthetic
    warehouse population — a plain table, a firebolt-tagged index with
    a pending append, a live-owner scratch incarnation, and an orphan
    scratch from a dead (pid, starttime) — the audit reports kind,
    footprint, firebolt.* props, owner liveness, and the
    needs-compaction flag without touching any table's data."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools")
    )
    import warehouse_audit

    plain = wh_table("aud_plain")
    spark.sql(f"CREATE TABLE {plain} AS SELECT 1 AS a")

    idx = wh_table("aud_index")
    spark.sql(f"CREATE TABLE {idx} AS SELECT 2 AS sh, 3 AS doc_id")
    spark.sql(
        f"ALTER TABLE {idx} SET TBLPROPERTIES "
        f"('firebolt.ngram_n' = '5', 'firebolt.appended' = '1')"
    )
    # a COMPACTED generation: appended reset to '0' — the stale
    # stuck-at-'1' detection must flag only the pending one
    idx_ok = wh_table("aud_index_ok")
    spark.sql(f"CREATE TABLE {idx_ok} AS SELECT 6 AS sh, 7 AS doc_id")
    spark.sql(
        f"ALTER TABLE {idx_ok} SET TBLPROPERTIES "
        f"('firebolt.ngram_n' = '5', 'firebolt.appended' = '0')"
    )

    me = os.getpid()
    my_st = warehouse_audit._proc_starttime(me)
    # REAL engine scratch names carry underscores in the kind tag
    # (fb_q_minhash_idx_*, fb_q_shingle_idx_*_sig) — the regex must
    # parse those, not just artificial single-word tags
    live = f"fb_q_minhash_idx_{me}_{my_st}"
    spark.sql(f"CREATE TABLE {live} AS SELECT 4 AS h")
    # a dead incarnation: this pid, but a starttime that can never
    # match, on a _sig companion name
    orphan = f"fb_q_shingle_idx_{me}_1_sig"
    spark.sql(f"CREATE TABLE {orphan} AS SELECT 5 AS h")
    try:
        rows = {r["table"]: r for r in warehouse_audit.audit(spark)}
        assert rows[plain.lower()]["kind"] == "table"
        assert rows[plain.lower()]["bytes"] > 0
        assert rows[plain.lower()]["files"] > 0
        assert rows[plain.lower()]["age_h"] is not None
        assert rows[plain.lower()]["age_h"] < 1.0

        r_idx = rows[idx.lower()]
        assert r_idx["kind"] == "index"
        assert r_idx["props"]["firebolt.ngram_n"] == "5"
        assert r_idx["needs_compaction"] is True
        # the compacted generation (appended='0') must NOT be flagged
        r_ok = rows[idx_ok.lower()]
        assert r_ok["kind"] == "index"
        assert "needs_compaction" not in r_ok

        assert rows[live.lower()]["kind"] == "scratch"
        assert rows[live.lower()]["owner_alive"] is True
        assert rows[orphan.lower()]["kind"] == "scratch"
        assert rows[orphan.lower()]["owner_alive"] is False

        # footprint ordering: rows come back largest-first
        sizes = [r["bytes"] for r in warehouse_audit.audit(spark)]
        assert sizes == sorted(sizes, reverse=True)

        # --json mode (round 15 — VERDICT r14 Next #7): the CLI's
        # machine output is one JSON line that round-trips to the
        # audit rows, stuck-at-'1' flag included; the human mode
        # carries the ORPHAN and needs-compaction notes
        import json as _json

        audit_rows = warehouse_audit.audit(spark)
        machine = warehouse_audit.render(audit_rows, as_json=True)
        assert "\n" not in machine
        parsed = _json.loads(machine)
        assert parsed == audit_rows
        by_name = {r["table"]: r for r in parsed}
        assert by_name[idx.lower()]["needs_compaction"] is True
        human = warehouse_audit.render(audit_rows, as_json=False)
        assert f"ORPHAN pid={os.getpid()}" in human
        assert "needs compaction" in human
        assert "firebolt.ngram_n=5" in human
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {live}")
        spark.sql(f"DROP TABLE IF EXISTS {orphan}")
