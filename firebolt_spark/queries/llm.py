"""LLM-data-pipeline query surface (SURVEY §7.1 M6) — oracle-checked.

Dedup (exact / minhash-LSH / simhash / n-gram Jaccard), similarity
search over embeddings, and text analysis over ``documents``; the
multimodal plumbing queries are rows-only (their decode step is a
deterministic stub — no SQL-expressible oracle by design).

The oracle SQL mirrors the Spark operators hash-for-hash (md5-based
hash families) so near-dup candidates and fingerprints are identical
across engines — see firebolt_spark/operators/{dedup,similarity,text}.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from firebolt_spark.catalog import load_table
from firebolt_spark.operators import dedup, multimodal, similarity, text
from firebolt_spark.operators.dedup import N_BANDS, N_MINHASH, SIMHASH_BITS

_QUERY_VEC_IDS = [0, 1, 2, 3, 4]
# the ONE spelling of the query-id set the embedding oracles interpolate
# (ADVICE r6: a hardcoded "IN (0, 1, 2, 3, 4)" would silently
# desynchronize from the Spark side if the Python list ever changed)
_IDS_SQL = ", ".join(map(str, _QUERY_VEC_IDS))


# the one spelling of the md5 bucket both engines key on (mirrors
# functions._hash_bucket, including the NULL→chr(0) sentinel)
def _bucket_sql(key: str, salt: str) -> str:
    return (
        f"(('0x' || substr(md5(coalesce(CAST({key} AS VARCHAR), chr(0))"
        f" || '#{salt}'), 1, 8))::BIGINT)"
    )




def _documents(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """The corpus table. ``spread=True`` opts a query into
    catalog.spread_small_input — ONLY for queries whose dominant cost
    is per-row expression work (md5 grams/features, window tiling,
    fingerprint folds): a compact single-row-group fixture file scans
    as ONE task, serializing that work onto one core. Measured r17 at
    sf0.1: the opted-in queries gain 0.3-1.8 s each, while a blanket
    spread COSTS shuffle-light queries ~0.2-0.5 s of pure exchange/AQE
    barrier — hence per-query opt-in, and a no-op at warehouse scale
    (inputs larger than the byte threshold are never touched)."""
    df = load_table(spark, sf_dir, "documents")
    if spread:
        from firebolt_spark.catalog import spread_small_input

        df = spread_small_input(spark, df, sf_dir, "documents")
    return df


def _documents_with_dups(
    spark: SparkSession, sf_dir: str, spread: bool = False
) -> DataFrame:
    """documents ∪ copies of the first 100 docs (offset ids) — gives the
    exact-dedup query real duplicate groups to find."""
    d = _documents(spark, sf_dir, spread=spread)
    dup = d.filter(F.col("doc_id") < 100).withColumn(
        "doc_id", F.col("doc_id") + 1000000
    )
    return d.unionAll(dup)


_DOCS_WITH_DUPS_SQL = """
    SELECT * FROM documents
    UNION ALL
    SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
    FROM documents WHERE doc_id < 100
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups (dedup.exact_duplicates): one row per content
    digest with the kept (min) doc_id and duplicate count — a single
    16-byte-digest shuffle, bodies never move."""
    return dedup.exact_duplicates(_documents_with_dups(spark, sf_dir))


Q_DEDUP_EXACT_SQL = f"""
    WITH docs AS ({_DOCS_WITH_DUPS_SQL})
    SELECT md5(text) AS content_hash,
           min(doc_id) AS keep_id,
           count(*) AS dup_count
    FROM docs
    GROUP BY md5(text)
"""


# ---- minhash LSH ----------------------------------------------------------

_SHINGLE_SQL = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
           FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i))
"""

# single-hash + k universal permutations, mirroring
# dedup.minhash_signatures verbatim (same MH_A/MH_B/MH_PRIME constants;
# ('0x'||hex)::BIGINT ≡ Spark's conv(hex,16,10) — parity tested)
_H32_SQL = "(('0x' || substr(md5(sh), 1, 8))::BIGINT)"
_MH_COLS = ", ".join(
    f"min(({dedup.MH_A[j]} * {_H32_SQL} + {dedup.MH_B[j]}) % {dedup.MH_PRIME})"
    f" AS h{j}"
    for j in range(N_MINHASH)
)
_ROWS_PER_BAND = N_MINHASH // N_BANDS
_BANDS_SQL = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({cols}) AS bh FROM mh".format(
        b=b,
        cols=" || '#' || ".join(
            f"CAST(h{b * _ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(_ROWS_PER_BAND)
        ),
    )
    for b in range(N_BANDS)
)
_MATCH_SUM = " + ".join(
    f"(CASE WHEN x.h{j} = y.h{j} THEN 1 ELSE 0 END)" for j in range(N_MINHASH)
)

# Hot-bucket caps for the three LSH band self-joins (the band-join
# analogue of max_df — see dedup.cap_bucket_size). Values are chosen to
# be a NO-OP at every tested scale (max observed bucket sizes at sf0.1:
# minhash 11, simhash 291, embedding-sig 20) so the oracle checks the
# cap MECHANISM while the declared results stay exact; a production run
# sets them from the reducer memory budget.
_MAX_BUCKET_BANDS = 1000
_MAX_BUCKET_SIMHASH = 10000
_MAX_BUCKET_SIG = 1000

# band buckets with the degenerate-bucket cap applied (QUALIFY mirrors
# Spark's window-count filter in cap_bucket_size)
_BANDSC_SQL = (
    f"SELECT * FROM bands QUALIFY "
    f"count(*) OVER (PARTITION BY band, bh) <= {_MAX_BUCKET_BANDS}"
)


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs (dedup.minhash_candidate_pairs):
    zero-shuffle in-row signatures, one-pass band emission, bucketed
    candidate join with est_jaccard scoring."""
    # spread (r18): the persisted signature build is a single fused
    # producer whose per-row shingle+md5+fold work otherwise inherits
    # the fixture's one-task-per-shard scan — same shape that decided
    # q_corpus_curation's opt-in. Measured: see OPTIMIZATION_r18.md.
    return dedup.minhash_candidate_pairs(
        _documents(spark, sf_dir, spread=True), max_bucket=_MAX_BUCKET_BANDS
    )


Q_DEDUP_MINHASH_SQL = f"""
    WITH {_SHINGLE_SQL},
    mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BANDS_SQL}),
    bandsc AS ({_BANDSC_SQL}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bandsc a JOIN bandsc b
               ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, ({_MATCH_SUM}) / {float(N_MINHASH)} AS est_jaccard
    FROM cand
    JOIN mh x ON x.doc_id = doc_a
    JOIN mh y ON y.doc_id = doc_b
    WHERE ({_MATCH_SUM}) / {float(N_MINHASH)} >= 0.5
"""


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters: connected components (min-id labels) over the
    minhash-LSH pairs, via alternating large-star/small-star (O(log n)
    rounds regardless of component diameter — the 100 TB-safe choice).
    Oracle: recursive-CTE transitive closure."""
    pairs = dedup.minhash_candidate_pairs(
        _documents(spark, sf_dir), max_bucket=_MAX_BUCKET_BANDS
    )
    return dedup.dedup_clusters_star(pairs)


# oracle SQL built by _make_clusters_sql() below (the pairs CTE embeds
# the full minhash query; the closure is recursive min-id reachability)


def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_df=0.5 exercises the hot-shingle document-frequency cap; the
    oracle SQL models the identical pruning, so the cap is checked, not
    just present."""
    return dedup.ngram_jaccard_pairs(_documents(spark, sf_dir), max_df=0.5)


def _make_clusters_sql() -> str:
    return f"""
    WITH RECURSIVE pairs AS ({Q_DEDUP_MINHASH_SQL}),
    e2 AS (
        SELECT doc_a AS src, doc_b AS dst FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    reach(node, r) AS (
        SELECT src, src FROM e2
        UNION
        SELECT e2.src, reach.r
        FROM e2 JOIN reach ON e2.dst = reach.node
    )
    SELECT node AS doc_id, min(r) AS cluster_id
    FROM reach
    GROUP BY node
"""


Q_DEDUP_NGRAM_SQL = f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
    hot AS (SELECT sh FROM sh GROUP BY sh
            HAVING count(*) > greatest(CAST(floor(
                0.5 * (SELECT count(*) FROM documents)) AS BIGINT), 1)),
    shc AS (SELECT * FROM sh WHERE sh NOT IN (SELECT sh FROM hot)),
    inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_inter
              FROM shc a JOIN shc b ON a.sh = b.sh AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
    SELECT doc_a, doc_b,
           n_inter / (sa.n_sh + sb.n_sh - n_inter) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    WHERE n_inter / (sa.n_sh + sb.n_sh - n_inter) >= 0.3
"""


# ---- simhash --------------------------------------------------------------

# 64-dim simhash, mirrored bit-for-bit from operators/dedup.simhash:
# dim i uses bit (i%4) of hex digit (i//4) of md5(token); bit 63 packs
# via its two's-complement value (see dedup.py docstring).
_SIM_DIMS = ", ".join(
    f"sum(CASE WHEN ((strpos('0123456789abcdef', substr(h, {i // 4 + 1}, 1)) - 1)"
    f" // {1 << (i % 4)}) % 2 = 1 THEN 1 ELSE -1 END) AS d{i}"
    for i in range(SIMHASH_BITS)
)
_SIM_PACK = " + ".join(
    f"(CASE WHEN d{i} > 0 THEN CAST({(1 << i) if i < 63 else '-9223372036854775807 - 1'} "
    f"AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
    for i in range(SIMHASH_BITS)
)

_SIMHASH_CTE = f"""
    tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
    th AS (SELECT doc_id, md5(tok) AS h FROM tok),
    dims AS (SELECT doc_id, {_SIM_DIMS} FROM th GROUP BY doc_id),
    sh2 AS (SELECT doc_id, CAST({_SIM_PACK} AS BIGINT) AS simhash FROM dims)
"""


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 64-bit SimHash fingerprints (dedup.simhash) — weighted
    sign-sum over shingle hashes, computed wholly in-row."""
    return dedup.simhash(_documents(spark, sf_dir))


Q_DEDUP_SIMHASH_SQL = f"""
    WITH {_SIMHASH_CTE}
    SELECT doc_id, simhash FROM sh2
"""


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within a Hamming radius
    (dedup.simhash_pairs): pigeonhole block equi-join — never
    all-pairs."""
    # spread: MEASURED AND REJECTED r18 (0.94x sf1 — within noise —
    # but 1.21x at sf0.1): unlike the minhash/curation builds, the
    # wall here is the pigeonhole block JOIN, not the signature
    # construction, so the spread exchange is mostly tax.
    return dedup.simhash_pairs(
        _documents(spark, sf_dir), max_bucket=_MAX_BUCKET_SIMHASH
    )


# The oracle mirrors the pigeonhole MECHANISM, not just its result: the
# 64-bit fingerprint splits into 4 16-bit blocks, candidates share an
# uncapped (block, block_val) bucket (QUALIFY = cap_bucket_size), and
# bit_count(xor) verifies true distance — so the block decomposition
# and the degenerate-bucket cap are both checked. With the cap a no-op
# (test scales), this equals the all-pairs hamming<=3 semantics by the
# pigeonhole principle.
_SIM_BLOCKS_SQL = " UNION ALL ".join(
    f"SELECT doc_id, simhash, {b} AS block, "
    f"(simhash >> {16 * b}) & 65535 AS block_val FROM sh2"
    for b in range(4)
)

Q_DEDUP_SIMHASH_PAIRS_SQL = f"""
    WITH {_SIMHASH_CTE},
    blks AS ({_SIM_BLOCKS_SQL}),
    blkc AS (SELECT * FROM blks QUALIFY
             count(*) OVER (PARTITION BY block, block_val) <= {_MAX_BUCKET_SIMHASH}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash AS sim_a, b.simhash AS sim_b
             FROM blkc a JOIN blkc b
               ON a.block = b.block AND a.block_val = b.block_val
              AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b,
           CAST(bit_count(xor(sim_a, sim_b)) AS INTEGER) AS hamming
    FROM cand
    WHERE bit_count(xor(sim_a, sim_b)) <= 3
"""


# ---- embedding-cosine near-dup -------------------------------------------

# synthetic embeddings are near-uniform (64-dim random ⇒ cosines cluster
# near 0); 0.35 sits in the top tail so the oracle comparison exercises
# real pairs rather than matching trivially on an empty result
_NEAR_DUP_THRESHOLD = 0.35

def _duck_plane(p: int, d: int, table: int = 0) -> str:
    # mirrors similarity._plane_component (instr ≡ strpos, both 1-based;
    # table t > 0 salts the md5 seed tag exactly as the Spark side does)
    tag = f"plane#{p}#{d}" if table == 0 else f"plane#T{table}:{p}#{d}"
    return (
        f"(strpos('0123456789abcdef', substr(md5('{tag}'), "
        f"1 + ({d} % 32), 1)) - 1 - 7.5)"
    )


def _duck_sig(planes: int, table: int = 0) -> str:
    """DuckDB mirror of similarity.lsh_signature(planes, table): bit p =
    sign(v · plane_p), flat left-associative per-plane sums — the same
    evaluation order as Spark's generated expression."""
    return " + ".join(
        "(CASE WHEN ("
        + " + ".join(
            f"CAST(embedding[{d + 1}] AS DOUBLE) * {_duck_plane(p, d, table)}"
            for d in range(similarity.EMB_DIM)
        )
        + f") > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    )


_DUCK_SIG = _duck_sig(similarity.NEAR_DUP_PLANES)


def _duck_dot(a: str, b: str) -> str:
    """Flat left-associative double dot of two DuckDB list columns —
    the same addition sequence as similarity.dot_fold's aggregate()
    fold, so the doubles agree bit-for-bit. The ONE definition every
    embedding oracle keys on."""
    return " + ".join(
        f"CAST({a}[{d + 1}] AS DOUBLE) * CAST({b}[{d + 1}] AS DOUBLE)"
        for d in range(similarity.EMB_DIM)
    )


_DUCK_DOT_AB = _duck_dot("a.embedding", "b.embedding")
_DUCK_DOT_EQ = _duck_dot("e.embedding", "q.q_vec")
_DUCK_NORM = "sqrt(" + " + ".join(
    f"CAST(embedding[{d + 1}] AS DOUBLE) * CAST(embedding[{d + 1}] AS DOUBLE)"
    for d in range(similarity.EMB_DIM)
) + ")"


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs: same-LSH-bucket candidates
    (md5-derived hyperplanes, engine-portable) scored with exact cosine.
    The oracle computes the identical signature, so the bucket-restricted
    semantics — the scale-safe shape — is itself what's checked."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.embedding_near_dups(
        emb, threshold=_NEAR_DUP_THRESHOLD, max_bucket=_MAX_BUCKET_SIG
    )


Q_DEDUP_EMBEDDING_SQL = f"""
    WITH e0 AS (
        SELECT vec_id, embedding,
               CAST(({_DUCK_SIG}) AS INTEGER) AS sig,
               {_DUCK_NORM} AS nrm
        FROM embeddings
    ),
    e AS (SELECT * FROM e0 QUALIFY
          count(*) OVER (PARTITION BY sig) <= {_MAX_BUCKET_SIG})
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(({_DUCK_DOT_AB}) / (a.nrm * b.nrm), 4) AS cos_sim
    FROM e a JOIN e b ON a.sig = b.sig AND a.vec_id < b.vec_id
    WHERE round(({_DUCK_DOT_AB}) / (a.nrm * b.nrm), 4) >= {_NEAR_DUP_THRESHOLD}
"""


# ---- similarity search ----------------------------------------------------

def q_similarity_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-k per query id (similarity.cosine_topk):
    broadcast queries, sequential-fold dot product, deterministic
    (score desc, id) ranking — the ANN recall baseline."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.cosine_topk(emb, _QUERY_VEC_IDS, k=10)


_DOT = (
    "(SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE)) "
    "FROM generate_series(1, 64) s(i))"
)
_NORM_E = (
    "sqrt((SELECT sum(CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)) "
    "FROM generate_series(1, 64) s(i)))"
)
_NORM_Q = (
    "sqrt((SELECT sum(CAST(q.q_vec[i] AS DOUBLE) * CAST(q.q_vec[i] AS DOUBLE)) "
    "FROM generate_series(1, 64) s(i)))"
)

Q_SIMILARITY_SQL = f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS q_vec
               FROM embeddings WHERE vec_id IN ({_IDS_SQL})),
    scored AS (
        SELECT q.query_id, e.vec_id,
               round({_DOT} / ({_NORM_E} * {_NORM_Q}), 4) AS cos_sim
        FROM embeddings e, q
        WHERE e.vec_id <> q.query_id)
    SELECT query_id, vec_id, cos_sim, rnk
    FROM (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
          FROM scored)
    WHERE rnk <= 10
"""


def q_similarity_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH ANN top-k — hash-matched oracle (VERDICT r4 #2 / r5 #4): the
    md5-derived hyperplanes make the bucket assignment engine-portable,
    so the *approximate* semantics (candidates = union of the query's
    own + Hamming-1-probed signature buckets across the default 8
    independent tables) is itself exactly SQL-expressible. Round 7
    checks the NEW recall-aware defaults (tables=8, probes=2 — VERDICT
    r6 #3); ``planes`` is pinned so the oracle SQL stays static across
    scale factors (the auto-planes path resolves from the corpus count
    and is covered by the pytest recall gate instead). Approximation
    QUALITY is pinned against brute force in tests and reported as
    bench ann_recall."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_lsh_topk(
        emb, _QUERY_VEC_IDS, k=10, planes=similarity.LSH_PLANES
    )


# same shape as Q_SIMILARITY_SQL with one change: candidates are
# restricted to the union, over the DEFAULT_LSH_TABLES independent
# plane sets, of the query's own bucket plus its Hamming-1 (bit-0
# flipped) probe bucket — mirroring _ann_lsh_topk_multitable's
# (tbl, sig) equi-join at the probes=2 default. The OR-join yields
# one row per candidate pair — the same set the Spark side's
# groupBy-dedup emits, with identical fold-order cosines.
_ANN_TABLES = similarity.DEFAULT_LSH_TABLES
_ANN_SIG_COLS = ",\n               ".join(
    f"CAST(({_duck_sig(similarity.LSH_PLANES, t)}) AS INTEGER) AS sig{t}"
    for t in range(_ANN_TABLES)
)
_ANN_Q_SIGS = ", ".join(f"sig{t} AS q_sig{t}" for t in range(_ANN_TABLES))
_ANN_MATCH = " OR ".join(
    f"e.sig{t} = q.q_sig{t} OR e.sig{t} = xor(q.q_sig{t}, 1)"
    for t in range(_ANN_TABLES)
)

Q_SIMILARITY_ANN_LSH_SQL = f"""
    WITH e AS (
        SELECT vec_id, embedding,
               {_ANN_SIG_COLS},
               {_DUCK_NORM} AS nrm
        FROM embeddings
    ),
    q AS (SELECT vec_id AS query_id, embedding AS q_vec, {_ANN_Q_SIGS},
                 nrm AS q_nrm
          FROM e WHERE vec_id IN ({_IDS_SQL})),
    scored AS (
        SELECT q.query_id, e.vec_id,
               round(({_DUCK_DOT_EQ}) / (e.nrm * q.q_nrm), 4) AS cos_sim
        FROM e JOIN q ON ({_ANN_MATCH}) AND e.vec_id <> q.query_id)
    SELECT query_id, vec_id, cos_sim, rnk
    FROM (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
          FROM scored)
    WHERE rnk <= 10
"""


def q_similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN top-k — hash-matched oracle (VERDICT r4 #3 / r5 #6).
    The whole pipeline is deterministic and engine-portable: seed
    centroids are the first n_centroids vectors by id, Lloyd means use
    exact DECIMAL sums (order-independent; see similarity.ivf_assign),
    and every dot product is a left-associative double fold mirrored
    term-for-term in the oracle's flat sums. The oracle unrolls the two
    Lloyd iterations as CTEs."""
    emb = load_table(spark, sf_dir, "embeddings")
    return similarity.ann_ivf_topk(emb, _QUERY_VEC_IDS, k=10)


def _ivf_chain_sql(n_centroids: int = 16) -> str:
    """The shared Lloyd-refinement CTE chain (seed → (assign →
    decimal-mean) × 2 → final assignment ``af``) — the WITH body both
    the IVF top-k oracle and the topic-cluster oracle build on."""
    dot_ec = _duck_dot("e.embedding", "c.c_vec")
    # one Lloyd iteration given assignment CTE name -> (means, cents)
    def means(assign: str) -> str:
        return f"""
        SELECT cluster, i - 1 AS pos,
               CAST(sum(CAST(CAST(embedding[i] AS DOUBLE) AS DECIMAL(30, 15)))
                    AS DOUBLE) / count(*) AS m
        FROM {assign}, generate_series(1, {similarity.EMB_DIM}) g(i)
        GROUP BY cluster, i"""

    def pack(mean_cte: str) -> str:
        return f"""
        SELECT cluster, c_vec, sqrt({_duck_dot("c_vec", "c_vec")}) AS c_norm
        FROM (SELECT cluster, list(m ORDER BY pos) AS c_vec
              FROM {mean_cte} GROUP BY cluster)"""

    def assign(cents: str) -> str:
        return f"""
        SELECT vec_id, embedding, nrm, cluster FROM (
            SELECT e.vec_id, e.embedding, e.nrm, c.cluster,
                   row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY (({dot_ec}) / (e.nrm * c.c_norm)) DESC,
                                c.cluster) AS _r
            FROM e, {cents} c) WHERE _r = 1"""

    return f"""
    e AS (SELECT vec_id, embedding, {_DUCK_NORM} AS nrm FROM embeddings),
    c0 AS (SELECT vec_id AS cluster, embedding AS c_vec, nrm AS c_norm
           FROM e ORDER BY vec_id LIMIT {n_centroids}),
    a1 AS ({assign("c0")}),
    m1 AS ({means("a1")}),
    c1 AS ({pack("m1")}),
    a2 AS ({assign("c1")}),
    m2 AS ({means("a2")}),
    c2 AS ({pack("m2")}),
    af AS ({assign("c2")})"""


def _make_ivf_sql(n_centroids: int = 16, n_probe: int = 4, k: int = 10) -> str:
    """DuckDB mirror of similarity.ann_ivf_topk's default call: Lloyd
    chain → probe top-n_probe centroids per query → bucket-restricted
    exact cosine top-k."""
    return f"""
    WITH {_ivf_chain_sql(n_centroids)},
    q AS (SELECT vec_id AS query_id, embedding AS q_vec, nrm AS q_nrm
          FROM af WHERE vec_id IN ({_IDS_SQL})),
    probes AS (
        SELECT query_id, q_vec, q_nrm, cluster FROM (
            SELECT q.query_id, q.q_vec, q.q_nrm, c.cluster,
                   row_number() OVER (PARTITION BY q.query_id
                       ORDER BY (({_duck_dot("q.q_vec", "c.c_vec")})
                                 / (q.q_nrm * c.c_norm)) DESC,
                                c.cluster) AS _r
            FROM q, c2 c) WHERE _r <= {n_probe}),
    scored AS (
        SELECT p.query_id, af.vec_id,
               round(({_duck_dot("af.embedding", "p.q_vec")})
                     / (af.nrm * p.q_nrm), 4) AS cos_sim
        FROM af JOIN probes p
          ON af.cluster = p.cluster AND af.vec_id <> p.query_id)
    SELECT query_id, vec_id, cos_sim, rnk
    FROM (SELECT *, CAST(row_number() OVER (
              PARTITION BY query_id ORDER BY cos_sim DESC, vec_id) AS INTEGER) AS rnk
          FROM scored)
    WHERE rnk <= {k}
"""


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic near-dups (similarity.semantic_near_dups):
    exact cosine scored only within k-means clusters — the candidate-
    bounded quadratic the SemDeDup paper trades for corpus-wide
    scoring. Threshold matches the sibling LSH-bucket near-dup query
    (the fixture's embeddings are near-random; 0.35 ≈ its p99 of
    same-cluster cosine). The oracle replays the same decimal-exact
    Lloyd chain + cluster cap + pair join, so what's certified is the
    cluster-restricted semantics itself."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # no orderBy: the driver compare is order-insensitive, and deriving
    # from the operator result would strip its release handle (the
    # persisted cluster assignment — track_persisted docstring)
    return similarity.semantic_near_dups(
        emb, threshold=_NEAR_DUP_THRESHOLD, max_cluster=_MAX_BUCKET_SIG
    )


def _make_semantic_sql(n_centroids: int = 16) -> str:
    dot_ab = _duck_dot("a.embedding", "b.embedding")
    return f"""
    WITH {_ivf_chain_sql(n_centroids)},
    capped AS (
        -- nrm > 0 BEFORE the cap count, mirroring the operator's
        -- zero-norm guard (NaN cos_sim would pass >= threshold in
        -- both engines — ADVICE r7)
        SELECT * FROM (SELECT af.*, count(*) OVER (PARTITION BY cluster) AS _n
                       FROM af WHERE nrm > 0)
        WHERE _n <= {_MAX_BUCKET_SIG}),
    pairs AS (
        SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cluster AS cluster,
               round(({dot_ab}) / (a.nrm * b.nrm), 4) AS cos_sim
        FROM capped a JOIN capped b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id)
    SELECT vec_a, vec_b, cluster, cos_sim
    FROM pairs WHERE cos_sim >= {_NEAR_DUP_THRESHOLD}
    ORDER BY vec_a, vec_b
"""


def q_topic_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topic bucketing (similarity.topic_clusters): every vector's
    k-means cluster + the cluster's population — all-integer output,
    so the oracle (the same decimal-exact Lloyd chain as the IVF
    oracle, unrolled as CTEs) is hash-exact with no rounding caveat.
    Downstream per-topic curation starts from exactly this table."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    # no orderBy — see q_dedup_semantic (handle preservation)
    return similarity.topic_clusters(emb, n_centroids=16)


def _make_topic_clusters_sql(n_centroids: int = 16) -> str:
    return f"""
    WITH {_ivf_chain_sql(n_centroids)},
    sizes AS (SELECT cluster, CAST(count(*) AS INT) AS cluster_size
              FROM af GROUP BY cluster)
    SELECT af.vec_id, af.cluster, sizes.cluster_size
    FROM af JOIN sizes USING (cluster)
    ORDER BY af.vec_id
"""


# ---- text analysis --------------------------------------------------------

def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc quality stats (text.text_stats): token/char counts,
    punct/stopword/upper ratios — one scan, column expressions only."""
    return text.text_stats(_documents(spark, sf_dir))


_STOP_EN = " + ".join(
    f"CAST((length(p) - length(replace(p, ' {w} ', ''))) // {len(w) + 2} AS INTEGER)"
    for w in text.LANG_PROFILES["en"]
)

Q_TEXT_STATS_SQL = f"""
    WITH d AS (SELECT *, ' ' || text || ' ' AS p,
                      string_split(text, ' ') AS t FROM documents)
    SELECT doc_id,
           CAST(length(text) AS INTEGER) AS n_chars,
           CAST(len(t) AS INTEGER) AS n_tokens,
           round(CAST(length(text) AS DOUBLE) / len(t), 4) AS avg_token_len,
           round(CAST(length(text) - length(translate(text, '.,;:!?''"()-', ''))
               AS DOUBLE) / length(text), 4) AS punct_ratio,
           round(CAST({_STOP_EN} AS DOUBLE) / len(t), 4) AS stopword_ratio
    FROM d
"""


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition gates (dup-word + top-bigram fractions) —
    zero-shuffle per-row folds in Spark; the oracle computes the same
    multiplicities the relational way (bigram unnest → groupBy → max),
    so the fold's longest-sorted-run == max-multiplicity equivalence is
    itself what the hash match certifies."""
    return text.repetition_stats(_documents(spark, sf_dir))


Q_TEXT_REPETITION_SQL = """
    WITH base AS (
        SELECT doc_id, string_split(trim(text), ' ') AS words FROM documents),
    sized AS (
        SELECT doc_id, words, len(words) AS n_words,
               len(list_distinct(words)) AS n_distinct
        FROM base),
    bg AS (
        -- scalar range() builds the index list in-row (DuckDB 1.0 has
        -- no lateral generate_series over a column)
        SELECT doc_id,
               unnest(list_transform(range(1, len(words)),
                      i -> words[i] || ' ' || words[i + 1])) AS bigram
        FROM sized
        WHERE len(words) >= 2),
    top AS (
        SELECT doc_id, max(cnt) AS top_cnt
        FROM (SELECT doc_id, bigram, count(*) AS cnt
              FROM bg GROUP BY doc_id, bigram)
        GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(s.n_words AS INTEGER) AS n_words,
           round(CASE WHEN s.n_words > 0
                      THEN CAST(s.n_words - s.n_distinct AS DOUBLE) / s.n_words
                      ELSE 0.0 END, 4) AS dup_word_frac,
           round(CASE WHEN s.n_words >= 2
                      THEN CAST(COALESCE(t.top_cnt, 0) AS DOUBLE) / (s.n_words - 1)
                      ELSE 0.0 END, 4) AS top_bigram_frac
    FROM sized s LEFT JOIN top t USING (doc_id)
"""


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher composite quality gate (text.gopher_quality, Rae et al.
    2021 §A1.1): all six heuristic rules — word-count bounds, mean
    word length, alpha-word fraction, stopword presence, bulk
    repetition, top-bigram looping — evaluated in one zero-shuffle
    scan against the ROUNDED signals, so the keep decision is
    bit-identical across engines. The oracle recomputes every signal
    the relational way (bigram unnest → groupBy → max), making the
    hash match certify the in-row folds AND the rule composition.
    max_dup_word_frac is raised to 0.55 for the fixtures (synthetic
    small-vocabulary word soup averages dup_word_frac ≈ 0.50; the
    published 0.3 default gates out every row, which would make the
    keep column a constant instead of a discriminating signal)."""
    return text.gopher_quality(
        _documents(spark, sf_dir), max_dup_word_frac=0.55
    ).orderBy("doc_id")


_GOPHER_STOPS = " + ".join(
    f"(CASE WHEN contains(' ' || s.text || ' ', ' {w} ') THEN 1 ELSE 0 END)"
    for w in text.LANG_PROFILES["en"]
)

Q_GOPHER_QUALITY_SQL = f"""
    WITH base AS (
        SELECT doc_id, text, string_split(trim(text), ' ') AS w
        FROM documents),
    sized AS (
        SELECT doc_id, text, w, len(w) AS n_words,
               len(list_distinct(w)) AS n_distinct
        FROM base),
    bg AS (
        SELECT doc_id,
               unnest(list_transform(range(1, len(w)),
                      i -> w[i] || ' ' || w[i + 1])) AS bigram
        FROM sized WHERE len(w) >= 2),
    top AS (
        SELECT doc_id, max(cnt) AS top_cnt
        FROM (SELECT doc_id, bigram, count(*) AS cnt
              FROM bg GROUP BY doc_id, bigram)
        GROUP BY doc_id),
    sig AS (
        SELECT s.doc_id, s.text,
               CAST(s.n_words AS INTEGER) AS n_words,
               round(CAST(length(replace(trim(s.text), ' ', '')) AS DOUBLE)
                     / s.n_words, 4) AS mean_word_len,
               round(CAST(len(list_filter(s.w,
                          x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                     / s.n_words, 4) AS alpha_word_frac,
               CAST({_GOPHER_STOPS} AS INTEGER) AS stopword_hits,
               round(CASE WHEN s.n_words > 0
                          THEN CAST(s.n_words - s.n_distinct AS DOUBLE)
                               / s.n_words
                          ELSE 0.0 END, 4) AS dup_word_frac,
               round(CASE WHEN s.n_words >= 2
                          THEN CAST(COALESCE(t.top_cnt, 0) AS DOUBLE)
                               / (s.n_words - 1)
                          ELSE 0.0 END, 4) AS top_bigram_frac
        FROM sized s LEFT JOIN top t USING (doc_id))
    SELECT doc_id, n_words, mean_word_len, alpha_word_frac, stopword_hits,
           dup_word_frac, top_bigram_frac,
           CASE WHEN text IS NULL THEN 0 ELSE CAST(
               (n_words BETWEEN 50 AND 100000)
               AND (mean_word_len BETWEEN 3.0 AND 10.0)
               AND alpha_word_frac >= 0.8
               AND stopword_hits >= 2
               AND dup_word_frac <= 0.55
               AND top_bigram_frac <= 0.2 AS INTEGER) END AS keep
    FROM sig ORDER BY doc_id
"""


# per-source training-mix fractions for q_sample_by_source; chosen so
# every branch of hash_sample_by executes (full keep, partial rates,
# and the default for every unlisted source)
_MIX_FRACTIONS = {"src0": 1.0, "src1": 0.5, "src2": 0.25, "src3": 0.0}
_MIX_DEFAULT = 0.1
_MIX_SALT = "mix1"


def q_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-source sampling mix (functions.hash_sample_by):
    each source keeps its configured fraction of documents, selected by
    a content hash of doc_id — reproducible row-for-row under any
    partitioning, retry, or engine (unlike Bernoulli sampleBy, whose
    RNG stream is partition-dependent). The oracle applies the same
    md5-threshold rule, so the hash match certifies the exact sampled
    row set, not just its size."""
    from firebolt_spark.functions import hash_sample_by

    docs = _documents(spark, sf_dir)
    return hash_sample_by(
        docs.select("doc_id", "source"),
        "source",
        _MIX_FRACTIONS,
        key_col="doc_id",
        salt=_MIX_SALT,
        default_fraction=_MIX_DEFAULT,
    ).orderBy("doc_id")


def _mix_threshold_sql() -> str:
    cases = " ".join(
        f"WHEN source = '{s}' THEN {int(f * float(1 << 32))}"
        for s, f in sorted(_MIX_FRACTIONS.items())
    )
    return f"(CASE {cases} ELSE {int(_MIX_DEFAULT * float(1 << 32))} END)"


Q_SAMPLE_BY_SOURCE_SQL = f"""
    SELECT doc_id, source FROM documents
    WHERE {_bucket_sql('doc_id', _MIX_SALT)} < {_mix_threshold_sql()}
    ORDER BY doc_id
"""


def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID (text.language_id): stopword-list hit
    ratios per language, argmax in-row — single scan."""
    return text.language_id(_documents(spark, sf_dir))


def _stop_count_sql(words: list[str]) -> str:
    return " + ".join(
        f"CAST((length(p) - length(replace(p, ' {w} ', ''))) // {len(w) + 2} AS INTEGER)"
        for w in words
    )


_LANGS = sorted(text.LANG_PROFILES)
_SCORE_COLS = ", ".join(
    f"({_stop_count_sql(text.LANG_PROFILES[lang])}) AS score_{lang}"
    for lang in text.LANG_PROFILES
)
_PRED_CASE = "CASE " + " ".join(
    f"WHEN score_{lang} = greatest({', '.join('score_' + x for x in _LANGS)}) "
    f"THEN '{lang}'"
    for lang in _LANGS
) + " END"

Q_TEXT_LANGID_SQL = f"""
    WITH d AS (SELECT *, ' ' || text || ' ' AS p FROM documents),
    scored AS (SELECT doc_id, lang AS lang_actual, {_SCORE_COLS} FROM d)
    SELECT scored.*, {_PRED_CASE} AS lang_pred FROM scored
"""


def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts (text.token_counts) —
    pure column expressions, one scan."""
    return text.token_counts(_documents(spark, sf_dir))


Q_TEXT_TOKENS_SQL = """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS INTEGER) AS ws_tokens,
           CAST(len(list_filter(regexp_split_to_array(text, '[^0-9A-Za-z]+'),
                    x -> x <> ''))
                + length(text) - length(translate(text, '.,;:!?''"()-', ''))
               AS INTEGER) AS bpe_ish_tokens,
           CAST(ceil(length(text) / 4.0) AS BIGINT) AS chars_div4_tokens
    FROM documents
"""

# shared hex-to-byte expansion over the _MM_DIMS_SQL pixel stream —
# ONE copy of the oracle-side byte arithmetic (a fix here lands in the
# features, PNG, and transcode oracles together)
_MM_BYTES_SQL = """
        SELECT doc_id, width, height, npix,
               i,
               16 * (instr('0123456789abcdef',
                           substr(pixhex, CAST(2 * i + 1 AS INTEGER), 1)) - 1)
                  + (instr('0123456789abcdef',
                           substr(pixhex, CAST(2 * i + 2 AS INTEGER), 1)) - 1)
                   AS byteval
        FROM dims, LATERAL (SELECT unnest(range(npix)) AS i) r
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprint (text.fingerprints): min md5
    over word shingles — a 1-permutation minhash signature per doc."""
    return text.fingerprints(_documents(spark, sf_dir))


Q_TEXT_FINGERPRINT_SQL = f"""
    WITH {_SHINGLE_SQL}
    SELECT doc_id, min(md5(sh)) AS fingerprint
    FROM sh
    GROUP BY doc_id
"""


def q_text_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token-window chunking (64-token chunks, 16 overlap)."""
    return text.chunk(_documents(spark, sf_dir), chunk_tokens=64, overlap=16)


Q_TEXT_CHUNKS_SQL = """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    starts AS (
        SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 16, 1), 48)) AS s
        FROM toks
    )
    SELECT doc_id,
           CAST((s - 1) // 48 AS INTEGER) AS chunk_idx,
           array_to_string(t[s:s+63], ' ') AS chunk_text,
           CAST(len(t[s:s+63]) AS INTEGER) AS n_chunk_tokens
    FROM starts
"""


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 vector quantization with per-vector scale.

    Declared queries must emit only scalar columns (the driver's
    canonicalizer sorts pandas frames, and list cells are unhashable —
    the round-1/round-2 ERR class), so the int8 vector is emitted as a
    deterministic comma-joined string; the operator itself keeps the
    array-typed ``embedding_q8``.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    q = similarity.quantize_int8(emb)
    return q.select(
        "vec_id",
        F.round("q_scale", 8).alias("q_scale_r"),
        F.array_join(
            F.col("embedding_q8").cast("array<int>").cast("array<string>"), ","
        ).alias("q8_csv"),
    )


Q_EMBED_QUANT_SQL = """
    WITH s AS (
        SELECT vec_id, embedding,
               greatest(list_max(list_transform(embedding,
                   x -> abs(CAST(x AS DOUBLE)))) / 127.0, 1e-12) AS q_scale
        FROM embeddings
    )
    SELECT vec_id,
           round(q_scale, 8) AS q_scale_r,
           array_to_string(list_transform(embedding,
               x -> CAST(CAST(round(CAST(x AS DOUBLE) / q_scale, 0) AS INTEGER)
                         AS VARCHAR)), ',') AS q8_csv
    FROM s
"""


def q_anomaly_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-user anomaly flags: |value - median| / MAD > 3 —
    median/MAD computed per user, joined back (two aggregations, no
    window-percentile dependence so both engines agree exactly)."""
    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "value")
    # med/mad are PER-USER tables — corpus-linear cardinality on a real
    # events stream, so no forced broadcast (a hint here is a driver
    # OOM at 100 TB). Both joins share the user_id shuffle key with the
    # aggregations that produce them, and AQE still picks a broadcast
    # when the user set is actually small (r9 VERDICT Next #2).
    med = e.groupBy("user_id").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = (
        e.join(med, "user_id")
        .withColumn("_adev", F.abs(F.col("value") - F.col("med")))
    )
    mad = dev.groupBy("user_id").agg(
        F.expr("percentile(_adev, 0.5)").alias("mad")
    )
    return (
        dev.join(mad, "user_id")
        .select(
            "event_id",
            "user_id",
            F.round("med", 4).alias("med"),
            F.round("mad", 4).alias("mad"),
            (F.col("_adev") > 3 * F.col("mad")).alias("is_anomaly"),
        )
    )


Q_ANOMALY_SQL = """
    WITH e AS (SELECT event_id, user_id, value FROM events),
    med AS (SELECT user_id, quantile_cont(value, 0.5) AS med
            FROM e GROUP BY user_id),
    dev AS (SELECT e.event_id, e.user_id, e.value, med.med,
                   abs(e.value - med.med) AS adev
            FROM e JOIN med USING (user_id)),
    mad AS (SELECT user_id, quantile_cont(adev, 0.5) AS mad
            FROM dev GROUP BY user_id)
    SELECT dev.event_id, dev.user_id,
           round(dev.med, 4) AS med,
           round(mad.mad, 4) AS mad,
           (dev.adev > 3 * mad.mad) AS is_anomaly
    FROM dev JOIN mad USING (user_id)
"""


def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profile (rows/non-null/nulls/exact distinct) of events."""
    from firebolt_spark.functions import profile

    e = load_table(spark, sf_dir, "events").select(
        "event_id",
        F.unix_micros("ts").alias("ts_us"),
        "user_id",
        "event_type",
        "value",
        "props",
    )
    return profile(e)


_PROFILE_COLS = ["event_id", "ts_us", "user_id", "event_type", "value", "props"]
Q_PROFILE_SQL = "\nUNION ALL\n".join(
    f"""
    SELECT '{c}' AS column_name,
           count(*) AS n_rows,
           count({c}) AS n_non_null,
           count(*) - count({c}) AS n_nulls,
           count(DISTINCT {c}) AS n_distinct
    FROM (SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type,
                 value, props FROM events)
    """
    for c in _PROFILE_COLS
)


def q_corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composition a training-data
    pipeline actually runs, as ONE declarative plan:

      quality gate (≥5 tokens, punct_ratio ≤ 0.3; scan-only)
      → exact-dedup keep (min doc_id per content digest; digest shuffle)
      → near-dup drop (minhash-LSH est_jaccard ≥ 0.9 drops the higher
        doc_id of each pair; banded buckets, never all-pairs)

    Returns the curated manifest (doc_id, n_tokens, stopword_ratio).
    Scale shape: the two keep/drop sides reduce to slim doc_id sets, so
    the final joins are broadcast-able; every stage is built from the
    operators this engine already oracle-checks individually.

    Round 18 (VERDICT r17 Next #3, guide §2.4/§5): ONE corpus pass.
    Stats, content digest and minhash signature are computed in a
    single chained projection and persisted as one narrow table
    (doc_id, 5 stats, BINARY(16) digest, 8 sig slots — never text);
    the quality gate, the exact-dedup keeper aggregate, the LSH bands
    and both scoring sides all read that cache. Before: three
    independent corpus scans (stats, exact digests, signatures), each
    re-parsing text. Result-identical: NULL-text docs — dropped by the
    signature pass's NOT NULL guard — could never reach the output
    anyway (their NULL n_tokens fails the quality gate, and the final
    join is quality-inner), and the keeper aggregate loses only the
    all-NULL digest group, whose keeper likewise can't pass quality.

    spread: r17 measured spread 1.7x WORSE here — that was the
    8-consumer shape, where every consumer's cached-partition reads
    contended. With ONE fused producer the objection inverts: the
    cache-population stage is the critical path and inherits the
    fixture's one-task-per-shard scan, idling the other cores
    (measured r18: unspread one-pass 1.13x worse than the 3-pass form
    at sf1; spread one-pass is the win — see OPTIMIZATION_r18.md).
    """
    docs = _documents_with_dups(spark, sf_dir, spread=True)
    base = dedup.minhash_signatures(
        text.text_stats(docs, carry_cols=("text",)).withColumn(
            # internal-only digest: BINARY(16) halves the keeper
            # aggregate's shuffle vs hex (unhex bijective — identical
            # groups; the r17 §2.3 pattern)
            "_dig", F.unhex(F.md5("text"))
        ),
        carry_cols=("n_tokens", "punct_ratio", "stopword_ratio", "_dig"),
    ).persist()
    quality = base.filter(
        (F.col("n_tokens") >= 5) & (F.col("punct_ratio") <= 0.3)
    )
    keep_exact = base.groupBy("_dig").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id")
    drop_near = (
        dedup.minhash_candidate_pairs(
            None, threshold=0.9, max_bucket=_MAX_BUCKET_BANDS,
            signatures=base.select(
                "doc_id", *[f"h{j}" for j in range(dedup.N_MINHASH)]
            ),
        )
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    from firebolt_spark.functions import track_persisted

    return track_persisted(
        quality.join(keep_exact, "doc_id")
        .join(drop_near, "doc_id", "left_anti")
        .select("doc_id", "n_tokens", "stopword_ratio"),
        base,
    )


Q_CORPUS_CURATION_SQL = f"""
    WITH docs AS ({_DOCS_WITH_DUPS_SQL}),
    d AS (SELECT *, ' ' || text || ' ' AS p,
                 string_split(text, ' ') AS t FROM docs),
    stats AS (SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_tokens,
           round(CAST(length(text) - length(translate(text, '.,;:!?''"()-', ''))
               AS DOUBLE) / length(text), 4) AS punct_ratio,
           round(CAST({_STOP_EN} AS DOUBLE) / len(t), 4) AS stopword_ratio
        FROM d),
    quality AS (SELECT * FROM stats WHERE n_tokens >= 5 AND punct_ratio <= 0.3),
    keep_exact AS (SELECT min(doc_id) AS doc_id FROM docs GROUP BY md5(text)),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM docs),
    sh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
           FROM toks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BANDS_SQL}),
    bandsc AS ({_BANDSC_SQL}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bandsc a JOIN bandsc b
               ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id),
    drop_near AS (SELECT DISTINCT doc_b AS doc_id FROM cand
                  JOIN mh x ON x.doc_id = doc_a
                  JOIN mh y ON y.doc_id = doc_b
                  WHERE ({_MATCH_SUM}) / {float(N_MINHASH)} >= 0.9)
    SELECT q.doc_id, q.n_tokens, q.stopword_ratio
    FROM quality q
    JOIN keep_exact k ON q.doc_id = k.doc_id
    WHERE q.doc_id NOT IN (SELECT doc_id FROM drop_near)
"""


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental ingest dedup — the realistic 100 TB workflow: a new
    batch (first 50 docs re-labeled) is scored against the EXISTING
    signature index; only the delta's shingles are computed. Oracle
    mirrors both signature tables and the band join."""
    docs = _documents(spark, sf_dir, spread=True)
    index_sigs = dedup.minhash_signatures(docs)
    new_docs = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 2000000
    )
    matches, _new_sigs = dedup.incremental_near_dups(new_docs, index_sigs)
    return matches


_NEW_DOCS_SQL = """
    SELECT doc_id + 2000000 AS doc_id, text
    FROM documents WHERE doc_id < 50
"""

_NEW_BANDS_SQL = " UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({cols}) AS bh FROM nmh".format(
        b=b,
        cols=" || '#' || ".join(
            f"CAST(h{b * _ROWS_PER_BAND + r} AS VARCHAR)"
            for r in range(_ROWS_PER_BAND)
        ),
    )
    for b in range(N_BANDS)
)

Q_DEDUP_INCREMENTAL_SQL = f"""
    WITH {_SHINGLE_SQL},
    mh AS (SELECT doc_id, {_MH_COLS} FROM sh GROUP BY doc_id),
    bands AS ({_BANDS_SQL}),
    ntoks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM ({_NEW_DOCS_SQL})),
    nsh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS sh
            FROM ntoks, UNNEST(generate_series(1, greatest(len(t) - 2, 1))) AS g(i)),
    nmh AS (SELECT doc_id, {_MH_COLS} FROM nsh GROUP BY doc_id),
    nbands AS ({_NEW_BANDS_SQL}),
    cand AS (SELECT DISTINCT a.doc_id AS new_doc_id, b.doc_id AS index_doc_id
             FROM nbands a JOIN bands b
               ON a.band = b.band AND a.bh = b.bh)
    SELECT new_doc_id, index_doc_id,
           ({_MATCH_SUM}) / {float(N_MINHASH)} AS est_jaccard
    FROM cand
    JOIN nmh x ON x.doc_id = new_doc_id
    JOIN mh y ON y.doc_id = index_doc_id
    WHERE ({_MATCH_SUM}) / {float(N_MINHASH)} >= 0.5
"""


def q_dedup_incremental_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ON-DISK MinHash index path of q_dedup_incremental (round
    11): the signature index is a build_minhash_index artifact — built
    fresh into deterministic scratch tables as part of this query's own
    plan (``_sig`` bucketed by doc_id, ``_bands`` by (band, band_hash))
    — so both index-side joins run exchange-free on the bucket layout
    and only the delta batch is shuffled. The operator contract says
    the match set is identical to the in-memory path, and this entry
    makes the driver's oracle enforce that — same SQL, artifact path
    exercised end-to-end."""
    from firebolt_spark.operators.similarity import _delete_dir

    docs = _documents(spark, sf_dir)
    tbl = _scratch_table("minhash_idx", spark)
    for t in (f"{tbl}_sig", f"{tbl}_bands"):
        if not spark.catalog.tableExists(t):
            # a PREVIOUS session's managed-table directory without a
            # catalog entry blocks saveAsTable(LOCATION_ALREADY_EXISTS);
            # this is our own deterministic scratch table, safe to clear
            _delete_dir(
                spark, spark.conf.get("spark.sql.warehouse.dir") + f"/{t}"
            )
    dedup.build_minhash_index(docs, tbl)
    new_docs = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 2000000
    )
    matches, _new_sigs = dedup.incremental_near_dups(
        new_docs, index_table=tbl
    )
    return matches


def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace-collapse + trim + lowercase normalization with a
    change flag — the canonical pre-dedup cleanup. Oracle mirrors the
    regex with DuckDB's 'g' flag (Spark regexp_replace is global by
    default)."""
    return text.normalize_text(_documents(spark, sf_dir)).select(
        "doc_id", "text_norm", "changed"
    )


Q_TEXT_NORMALIZE_SQL = r"""
    SELECT doc_id,
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS text_norm,
           (lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) <> text)
               AS changed
    FROM documents
"""


_SHARD_BUDGET = 4096


def q_shard_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy token-budget shard packing over documents (doc_id order,
    4096-token shards) via the scalable two-phase running sum — no
    single-partition window. Oracle: SUM() OVER (ORDER BY doc_id)."""
    return text.pack_shards(_documents(spark, sf_dir), _SHARD_BUDGET)


Q_SHARD_PACKING_SQL = f"""
    WITH t AS (SELECT doc_id,
                      CAST(len(string_split(text, ' ')) AS INTEGER) AS n_tokens
               FROM documents),
    c AS (SELECT doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                     AS cum
          FROM t)
    SELECT doc_id, n_tokens,
           CAST(floor((cum - n_tokens) / {float(_SHARD_BUDGET)}) AS INTEGER)
               AS shard_id
    FROM c
"""

_SEQ_LEN = 64  # fixture docs run ~20-60 whitespace tokens, so a 64-token
#               sequence forces both packings the op must get right:
#               multiple docs packed into one sequence AND single docs
#               split across 2+ sequence boundaries

# ONE span-derivation fragment shared by BOTH packing oracles
# (round-16 review: a verbatim duplicate meant the span oracle and the
# string-compared oracle could silently diverge on what "correct"
# packing is). Mirrors text.token_count (NULL/empty -> 0, filtered)
# and text.pack_sequences' cumsum + boundary arithmetic.
_SEQ_SPAN_CTES = f"""t AS (SELECT doc_id,
                      CASE WHEN text IS NULL OR text = '' THEN CAST(0 AS BIGINT)
                           ELSE CAST(len(string_split(text, ' ')) AS BIGINT)
                      END AS n_tokens
               FROM documents),
    tnz AS (SELECT * FROM t WHERE n_tokens > 0),
    c AS (SELECT doc_id, n_tokens,
                 CAST(sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT) AS cend
          FROM tnz),
    spans AS (
        SELECT doc_id, n_tokens, cend - n_tokens AS cstart, cend,
               CAST(s.seq_id AS BIGINT) AS seq_id
        FROM c, LATERAL (
            SELECT unnest(range((cend - n_tokens) // {_SEQ_LEN},
                                (cend - 1) // {_SEQ_LEN} + 1)) AS seq_id
        ) s
    )"""


def q_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style concat-and-split sequence packing (round 16 —
    text.pack_sequences): the corpus token stream in doc_id order cut
    into exactly-full 64-token training sequences, one row per
    (document, sequence) span with the in-sequence offset and length.
    The whole table is integer arithmetic off the two-phase global
    running total (SQL div on BIGINT, no double rounding), so the
    oracle replays it with a window cumsum + range() explode. A
    packing that drops a boundary cut, misplaces an offset, or skews
    the running total by one token hash-mismatches."""
    return text.pack_sequences(_documents(spark, sf_dir), _SEQ_LEN)


Q_SEQUENCE_PACK_SQL = f"""
    WITH {_SEQ_SPAN_CTES}
    SELECT doc_id, n_tokens, seq_id,
           CAST(greatest(cstart, seq_id * {_SEQ_LEN})
                - seq_id * {_SEQ_LEN} AS BIGINT) AS off_in_seq,
           CAST(greatest(cstart, seq_id * {_SEQ_LEN})
                - cstart AS BIGINT) AS off_in_doc,
           CAST(least(cend, (seq_id + 1) * {_SEQ_LEN})
                - greatest(cstart, seq_id * {_SEQ_LEN}) AS BIGINT) AS n_toks
    FROM spans
"""


def q_sequence_texts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packed training examples MATERIALIZED (round 16 —
    text.pack_sequence_texts): each 64-token sequence's actual text,
    stitched from the documents' token slices in stream order via
    off_in_doc/off_in_seq. The oracle rebuilds every sequence with
    array_slice + ordered string_agg, so a misplacced cut, a
    mis-sliced piece, or out-of-order stitching mismatches on the
    string itself — the strongest check the packing family has."""
    return text.pack_sequence_texts(_documents(spark, sf_dir), _SEQ_LEN)


Q_SEQUENCE_TEXTS_SQL = f"""
    WITH {_SEQ_SPAN_CTES},
    cuts AS (
        SELECT doc_id, seq_id,
               greatest(cstart, seq_id * {_SEQ_LEN})
                   - seq_id * {_SEQ_LEN} AS off_in_seq,
               greatest(cstart, seq_id * {_SEQ_LEN}) - cstart AS off_in_doc,
               least(cend, (seq_id + 1) * {_SEQ_LEN})
                   - greatest(cstart, seq_id * {_SEQ_LEN}) AS n_toks
        FROM spans
    ),
    pieces AS (
        SELECT seq_id, off_in_seq, n_toks,
               array_to_string(
                   string_split(d.text, ' ')[off_in_doc + 1 : off_in_doc + n_toks],
                   ' ') AS piece
        FROM cuts JOIN documents d USING (doc_id)
    )
    SELECT seq_id,
           string_agg(piece, ' ' ORDER BY off_in_seq) AS text,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_toks
    FROM pieces
    GROUP BY seq_id
"""


def q_sequence_materialize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental sequence materialization, batch-replayed (round 17
    — text.materialize_sequences, VERDICT r16 Next #3): an ingest
    stream paused mid-corpus ships only the training sequences it
    has moved PAST. The watermark is deterministic — the token
    total after the first half of the stream (doc_id < max//2) —
    and the cut is ``seq_id < watermark div 64``: the boundary
    sequence, partially filled at the pause, is withheld (emitting
    it would persist a corrupt short example — the round-16
    batch-boundary hazard). The two scalar aggregates that
    parameterize the cut are one-row driver lookups (the ledger
    read of the streaming recipe, drilled with mid-batch crashes in
    tests/test_streaming_e2e.py); the materialization itself is the
    shared span-stitch. The oracle recomputes watermark, cut, and
    every stitched string analytically — a boundary sequence leaked,
    a span double-counted after a simulated replay, or one token
    shifted across the pause mismatches on the text itself."""
    docs = _documents(spark, sf_dir)
    spans = text.pack_sequences(docs, _SEQ_LEN)
    # the "ledger read": two one-row aggregates standing in for the
    # streaming recipe's carried end_total (see the e2e drill)
    half = docs.agg((F.max("doc_id") / 2).cast("long").alias("k")).collect()[
        0
    ]["k"]
    watermark = (
        docs.filter(F.col("doc_id") < half)
        .agg(F.sum(text.token_count("text")).alias("w"))
        .collect()[0]["w"]
    ) or 0
    return text.materialize_sequences(
        spans, docs, _SEQ_LEN, below_total=watermark
    )


Q_SEQUENCE_MATERIALIZE_SQL = f"""
    WITH {_SEQ_SPAN_CTES},
    wm AS (
        SELECT CAST(CAST(sum(n_tokens) AS BIGINT) // {_SEQ_LEN} AS BIGINT)
                   AS cut
        FROM t
        WHERE doc_id < (SELECT CAST(max(doc_id) // 2 AS BIGINT)
                        FROM documents)
    ),
    cuts AS (
        SELECT doc_id, seq_id,
               greatest(cstart, seq_id * {_SEQ_LEN})
                   - seq_id * {_SEQ_LEN} AS off_in_seq,
               greatest(cstart, seq_id * {_SEQ_LEN}) - cstart AS off_in_doc,
               least(cend, (seq_id + 1) * {_SEQ_LEN})
                   - greatest(cstart, seq_id * {_SEQ_LEN}) AS n_toks
        FROM spans
        WHERE seq_id < (SELECT cut FROM wm)
    ),
    pieces AS (
        SELECT seq_id, off_in_seq, n_toks,
               array_to_string(
                   string_split(d.text, ' ')[off_in_doc + 1 : off_in_doc + n_toks],
                   ' ') AS piece
        FROM cuts JOIN documents d USING (doc_id)
    )
    SELECT seq_id,
           string_agg(piece, ' ' ORDER BY off_in_seq) AS text,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS n_toks
    FROM pieces
    GROUP BY seq_id
"""


# ---- benchmark decontamination --------------------------------------------

def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 20th doc (doc_id % 20 == 7)
    plays the eval set; the remaining corpus is scored by how many
    distinct word 5-grams it shares with it (n_hits; 0 = clean). The
    benchmark shingle table is broadcast — corpus never shuffles."""
    # spread (r18): the corpus side's 5-gram shingle explode +
    # broadcast probe is per-row work on the unsplittable fixture
    # scan. Measured: see OPTIMIZATION_r18.md.
    d = _documents(spark, sf_dir, spread=True)
    return dedup.decontaminate(
        d.filter(F.col("doc_id") % 20 != 7),
        d.filter(F.col("doc_id") % 20 == 7),
        n=5,
    )


Q_DECONTAMINATE_SQL = """
    WITH corpus AS (SELECT * FROM documents WHERE doc_id % 20 != 7),
    bench AS (SELECT * FROM documents WHERE doc_id % 20 = 7),
    ctoks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM corpus WHERE text IS NOT NULL),
    csh AS (SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS sh
            FROM ctoks,
                 UNNEST(generate_series(1, greatest(len(t) - 4, 1))) AS g(i)),
    btoks AS (SELECT doc_id, string_split(text, ' ') AS t
              FROM bench WHERE text IS NOT NULL),
    bsh AS (SELECT DISTINCT array_to_string(t[i:i+4], ' ') AS sh
            FROM btoks,
                 UNNEST(generate_series(1, greatest(len(t) - 4, 1))) AS g(i)),
    hits AS (SELECT c.doc_id, count(*) AS n_hits
             FROM csh c JOIN bsh USING (sh) GROUP BY c.doc_id)
    SELECT d.doc_id, CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits
    FROM corpus d LEFT JOIN hits h ON d.doc_id = h.doc_id
"""


# ---- multimodal: REAL dependency-free BMP codec (oracle-checked) ----------
#
# Round 4 (VERDICT r3 "Next #3"): the decode step is no longer a stub.
# bmp_encode builds valid 24-bpp BMPs from the documents fixture
# (dimensions from doc_id, pixels from repeat(md5(text))), bmp_decode
# parses them back with built-in hex-nibble arithmetic, and the oracle
# computes the EXPECTED stats analytically from the row — so any byte
# offset / endianness / channel-phase bug in the codec breaks the hash
# match. The old digest-stub path survives in extract_features
# (decode_stub=True) for formats that genuinely need PIL/ffmpeg.

def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode → decode round trip over real BMP bytes; scalar-only
    output (driver canonicalizer crashes on list cells — r1/r2 ERR
    class). Plan shape: scan-only, one HOF fold, no UDF/shuffle."""
    media = multimodal.bmp_encode(_documents(spark, sf_dir))
    return multimodal.bmp_decode(media)


_MM_DIMS_SQL = """
    SELECT doc_id,
           CAST(4 * (1 + doc_id % 4) AS INTEGER) AS width,
           CAST(1 + doc_id % 5 AS INTEGER) AS height,
           CAST(3 * (4 * (1 + doc_id % 4)) * (1 + doc_id % 5) AS INTEGER)
               AS npix,
           substr(repeat(md5(coalesce(text, '')), 15), 1,
                  2 * 3 * (4 * (1 + doc_id % 4)) * (1 + doc_id % 5))
               AS pixhex
    FROM documents
"""

Q_MULTIMODAL_FEATURES_SQL = f"""
    WITH dims AS ({_MM_DIMS_SQL}),
    b AS ({_MM_BYTES_SQL})
    SELECT doc_id,
           width,
           height,
           CAST(24 AS INTEGER) AS bpp,
           npix AS n_pixel_bytes,
           round(sum(CASE WHEN i % 3 = 0 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_b,
           round(sum(CASE WHEN i % 3 = 1 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_g,
           round(sum(CASE WHEN i % 3 = 2 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_r,
           round(sum(byteval) / CAST(npix AS DOUBLE), 6) AS mean_all
    FROM b
    GROUP BY doc_id, width, height, npix
"""


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real nearest-neighbor BMP resize (multimodal.resize_media,
    decode_stub=False, round 11) to a fixed 6x3 target, re-decoded
    with the builtin SQL codec. The oracle replays the NN source-pixel
    selection analytically over the deterministic fixture bytes; the 2
    zero pad bytes per row the 6-pixel width forces are modeled by the
    /60 denominator. Scalar-only output."""
    media = multimodal.bmp_encode(_documents(spark, sf_dir))
    resized = multimodal.resize_media(media, 6, 3, decode_stub=False)
    return multimodal.bmp_decode(resized).select(
        "doc_id", "width", "height", "n_pixel_bytes", "mean_all"
    )


Q_MULTIMODAL_RESIZE_SQL = """
    WITH src AS (
        SELECT doc_id,
               4 * (1 + doc_id % 4) AS w,
               1 + doc_id % 5 AS h,
               repeat(md5(coalesce(text, '')), 15) AS hx
        FROM documents),
    sel AS (
        SELECT doc_id, hx,
               3 * (((j.v * h) // 3) * w + ((i.v * w) // 6)) + c.v AS idx
        FROM src,
             LATERAL (SELECT unnest(range(3)) AS v) j,
             LATERAL (SELECT unnest(range(6)) AS v) i,
             LATERAL (SELECT unnest(range(3)) AS v) c),
    b AS (
        SELECT doc_id,
               16 * (instr('0123456789abcdef',
                           substr(hx, CAST(2 * idx + 1 AS INTEGER), 1)) - 1)
                  + (instr('0123456789abcdef',
                           substr(hx, CAST(2 * idx + 2 AS INTEGER), 1)) - 1)
                   AS byteval
        FROM sel)
    SELECT doc_id,
           CAST(6 AS INTEGER) AS width,
           CAST(3 AS INTEGER) AS height,
           CAST(60 AS INTEGER) AS n_pixel_bytes,
           round(sum(byteval) / 60.0, 6) AS mean_all
    FROM b
    GROUP BY doc_id
"""


def q_multimodal_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL audio decode end-to-end (round 12): multimodal.wav_encode
    emits valid 16-bit PCM WAVs (RIFF/fmt/data, mono or stereo, three
    sample rates — all from scan-only hex expressions, like the BMP
    encoder) and wav_decode parses them back with pure built-ins: one
    higher-order fold computes the exact signed-sample sum and sum of
    squares, so mean and RMS are engine-identical divisions of exact
    integers. The oracle recomputes the expectation analytically from
    the deterministic md5 sample stream — the audio twin of the
    BMP/PNG queries. Scalar-only output."""
    media = multimodal.wav_encode(_documents(spark, sf_dir))
    return multimodal.wav_decode(media)


Q_MULTIMODAL_WAV_SQL = """
    WITH dims AS (
        SELECT doc_id,
               CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
               CAST(([8000, 16000, 44100])[CAST(doc_id % 3 AS INTEGER) + 1]
                    AS INTEGER) AS sample_rate,
               CAST(16 + doc_id % 25 AS INTEGER) AS nsamp,
               CAST((1 + doc_id % 2) * (16 + doc_id % 25) AS INTEGER) AS n,
               substr(repeat(md5(coalesce(text, '')), 15), 1,
                      CAST(4 * (1 + doc_id % 2) * (16 + doc_id % 25)
                           AS INTEGER)) AS pcmhex
        FROM documents),
    raw AS (
        SELECT doc_id, n_channels, sample_rate, nsamp, n,
               (16 * (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * k + 1 AS INTEGER), 1)) - 1)
                   + (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * k + 2 AS INTEGER), 1)) - 1))
               + 256 *
               (16 * (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * k + 3 AS INTEGER), 1)) - 1)
                   + (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * k + 4 AS INTEGER), 1)) - 1))
                   AS v
        FROM dims, LATERAL (SELECT unnest(range(n)) AS k) r),
    sv AS (
        SELECT doc_id, n_channels, sample_rate, nsamp,
               CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
        FROM raw)
    SELECT doc_id, n_channels, sample_rate, nsamp AS n_samples,
           round(sum(s) / count(*), 6) AS mean_pcm,
           round(sqrt(sum(s * s) / count(*)), 6) AS rms_pcm
    FROM sv
    GROUP BY doc_id, n_channels, sample_rate, nsamp
"""


def q_multimodal_wav8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The legacy 8-bit PCM width end-to-end (round 13):
    multimodal.wav_encode(bits=8) emits valid unsigned-8-bit WAVs (one
    md5 byte per sample, same scan-only hex construction) and
    wav_decode's 8-bit fold reads them back as midpoint-128 signed
    samples. The oracle recomputes mean/RMS analytically from the md5
    byte stream minus 128 — certifying the width dispatch, the
    byte-per-sample geometry, and the unsigned-midpoint convention
    cross-engine. Scalar-only output."""
    media = multimodal.wav_encode(_documents(spark, sf_dir), bits=8)
    return multimodal.wav_decode(media)


Q_MULTIMODAL_WAV8_SQL = """
    WITH dims AS (
        SELECT doc_id,
               CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
               CAST(([8000, 16000, 44100])[CAST(doc_id % 3 AS INTEGER) + 1]
                    AS INTEGER) AS sample_rate,
               CAST(16 + doc_id % 25 AS INTEGER) AS nsamp,
               CAST((1 + doc_id % 2) * (16 + doc_id % 25) AS INTEGER) AS n,
               substr(repeat(md5(coalesce(text, '')), 15), 1,
                      CAST(2 * (1 + doc_id % 2) * (16 + doc_id % 25)
                           AS INTEGER)) AS pcmhex
        FROM documents),
    sv AS (
        SELECT doc_id, n_channels, sample_rate, nsamp,
               (16 * (instr('0123456789abcdef',
                            substr(pcmhex, CAST(2 * k + 1 AS INTEGER), 1)) - 1)
                   + (instr('0123456789abcdef',
                            substr(pcmhex, CAST(2 * k + 2 AS INTEGER), 1)) - 1))
                   - 128 AS s
        FROM dims, LATERAL (SELECT unnest(range(n)) AS k) r)
    SELECT doc_id, n_channels, sample_rate, nsamp AS n_samples,
           round(sum(s) / count(*), 6) AS mean_pcm,
           round(sqrt(sum(s * s) / count(*)), 6) AS rms_pcm
    FROM sv
    GROUP BY doc_id, n_channels, sample_rate, nsamp
"""


_RESAMPLE_RATE = 12000


def q_multimodal_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio resample end-to-end (round 12): wav_encode ->
    resample_audio(12 kHz, decode_stub=False) -> wav_decode. The three
    fixture rates exercise upsample (8 kHz, frames repeat), downsample
    (16 kHz) and heavy downsample (44.1 kHz); the oracle replays the
    nearest-neighbor frame selection analytically over the md5 sample
    stream — repetitions included — and certifies the re-decoded
    mean/RMS of the RESAMPLED file, so a converter that picked even
    one wrong source frame hash-mismatches. Scalar-only output."""
    media = multimodal.wav_encode(_documents(spark, sf_dir))
    resampled = multimodal.resample_audio(
        media, _RESAMPLE_RATE, decode_stub=False
    )
    return multimodal.wav_decode(resampled)


Q_MULTIMODAL_RESAMPLE_SQL = f"""
    WITH dims AS (
        SELECT doc_id,
               CAST(1 + doc_id % 2 AS INTEGER) AS n_channels,
               CAST(([8000, 16000, 44100])[CAST(doc_id % 3 AS INTEGER) + 1]
                    AS INTEGER) AS src_rate,
               CAST(16 + doc_id % 25 AS INTEGER) AS nsamp,
               substr(repeat(md5(coalesce(text, '')), 15), 1,
                      CAST(4 * (1 + doc_id % 2) * (16 + doc_id % 25)
                           AS INTEGER)) AS pcmhex
        FROM documents),
    sized AS (
        SELECT *, greatest(1, (nsamp * {_RESAMPLE_RATE}) // src_rate) AS n_out
        FROM dims),
    sel AS (
        SELECT doc_id, n_channels, nsamp, n_out,
               (((j.v * nsamp) // n_out) * n_channels + c.v) AS idx
        FROM sized,
             LATERAL (SELECT unnest(range(n_out)) AS v) j,
             LATERAL (SELECT unnest(range(n_channels)) AS v) c),
    raw AS (
        SELECT sel.doc_id AS doc_id, sel.n_channels AS n_channels,
               sel.nsamp AS nsamp, sel.n_out AS n_out,
               (16 * (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * idx + 1 AS INTEGER), 1)) - 1)
                   + (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * idx + 2 AS INTEGER), 1)) - 1))
               + 256 *
               (16 * (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * idx + 3 AS INTEGER), 1)) - 1)
                   + (instr('0123456789abcdef',
                            substr(pcmhex, CAST(4 * idx + 4 AS INTEGER), 1)) - 1))
                   AS v
        FROM sel JOIN dims ON sel.doc_id = dims.doc_id),
    sv AS (
        SELECT doc_id, n_channels, n_out,
               CASE WHEN v >= 32768 THEN v - 65536 ELSE v END AS s
        FROM raw)
    SELECT doc_id, n_channels,
           CAST({_RESAMPLE_RATE} AS INTEGER) AS sample_rate,
           CAST(n_out AS INTEGER) AS n_samples,
           round(sum(s) / count(*), 6) AS mean_pcm,
           round(sqrt(sum(s * s) / count(*)), 6) AS rms_pcm
    FROM sv
    GROUP BY doc_id, n_channels, n_out
"""


def q_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over DECODED fields: every 2nd pixel row of each
    BMP is a 'frame' (fixture convention n_frames = height)."""
    media = multimodal.bmp_encode(_documents(spark, sf_dir))
    feats = multimodal.bmp_decode(media)
    return feats.select(
        "doc_id",
        "width",
        F.explode(
            F.sequence(F.lit(0), F.col("height") - 1, F.lit(2))
        ).alias("frame_idx"),
    ).withColumn("frame_idx", F.col("frame_idx").cast("bigint"))


Q_MULTIMODAL_FRAMES_SQL = f"""
    WITH dims AS ({_MM_DIMS_SQL})
    SELECT doc_id, width, i AS frame_idx
    FROM dims, LATERAL (SELECT unnest(range(0, height, 2)) AS i) r
"""


def q_multimodal_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL PNG decode end-to-end (round 12 — VERDICT r11 Next #3):
    multimodal.png_encode emits valid zlib-compressed PNGs whose
    per-row filters cycle all five spec types, and
    extract_features(decode_stub=False) decodes them for real in the
    Arrow path (chunk walk, CRC verify, inflate, full unfilter). The
    oracle never decodes a PNG — it recomputes the expected channel
    statistics analytically from the deterministic md5 pixel stream,
    so a decoder that mis-unfilters even one row hash-mismatches.
    Scalar-only output (feature array unpacked into its slots). PNG
    stores RGB, so the [b, g, r] feature slots map to byte positions
    2/1/0 — the mirror of the BGR BMP oracle."""
    media = multimodal.png_encode(_documents(spark, sf_dir))
    feats = multimodal.extract_features(media, decode_stub=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.col("n_frames").cast("int").alias("n_frames"),
        F.element_at("feature", 1).alias("mean_b"),
        F.element_at("feature", 2).alias("mean_g"),
        F.element_at("feature", 3).alias("mean_r"),
        F.element_at("feature", 4).alias("mean_all"),
    )


Q_MULTIMODAL_PNG_SQL = f"""
    WITH dims AS ({_MM_DIMS_SQL}),
    b AS ({_MM_BYTES_SQL})
    SELECT doc_id,
           width,
           height,
           height AS n_frames,
           round(sum(CASE WHEN i % 3 = 2 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_b,
           round(sum(CASE WHEN i % 3 = 1 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_g,
           round(sum(CASE WHEN i % 3 = 0 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_r,
           round(sum(byteval) / CAST(npix AS DOUBLE), 6) AS mean_all
    FROM b
    GROUP BY doc_id, width, height, npix
"""


# shared GIF fixture arithmetic (round 13): per-frame md5 index stream
# over the affine palette (r, g, b) = (37i, 59i, 83i) mod 256 — the
# oracle recomputes channel statistics from bytes it never decodes
_MM_GIF_SQL = """
    SELECT doc_id,
           CAST(4 * (1 + doc_id % 4) AS INTEGER) AS width,
           CAST(1 + doc_id % 5 AS INTEGER) AS height,
           CAST((4 * (1 + doc_id % 4)) * (1 + doc_id % 5) AS INTEGER)
               AS npix,
           CAST(1 + doc_id % 3 AS INTEGER) AS nframes,
           f,
           substr(repeat(md5(coalesce(text, '') || '#f' || f), 5), 1,
                  2 * (4 * (1 + doc_id % 4)) * (1 + doc_id % 5))
               AS idxhex
    FROM documents,
         LATERAL (SELECT unnest(range(1 + doc_id % 3)) AS f) fr
"""

_MM_GIF_BYTES_SQL = """
        SELECT doc_id, width, height, npix, nframes, f, i,
               (16 * (instr('0123456789abcdef',
                            substr(idxhex, CAST(2 * i + 1 AS INTEGER), 1))
                      - 1)
                  + (instr('0123456789abcdef',
                           substr(idxhex, CAST(2 * i + 2 AS INTEGER), 1))
                     - 1)) AS idx
        FROM gdims, LATERAL (SELECT unnest(range(npix)) AS i) r
"""


def q_multimodal_gif(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL multi-frame GIF decode end-to-end (round 13):
    multimodal.gif_encode emits valid GIF89a payloads — real LZW
    compression, 1 + doc_id % 3 frames over the fixed affine palette —
    and extract_features(decode_stub=False) decodes them for real in
    the Arrow path (LZW decompress per frame, palette mapping,
    variable code widths and all). n_frames is the GENUINE frame
    count, the first real multi-frame modality. The oracle never
    decodes a GIF — it recomputes the channel statistics analytically
    from the per-frame md5 index stream and the palette arithmetic
    (r, g, b) = (37i, 59i, 83i) mod 256, so a decoder that drops a
    frame, mis-expands one LZW code, or misreads the palette
    hash-mismatches."""
    media = multimodal.gif_encode(_documents(spark, sf_dir))
    feats = multimodal.extract_features(media, decode_stub=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.col("n_frames").cast("int").alias("n_frames"),
        F.element_at("feature", 1).alias("mean_b"),
        F.element_at("feature", 2).alias("mean_g"),
        F.element_at("feature", 3).alias("mean_r"),
        F.element_at("feature", 4).alias("mean_all"),
    )


Q_MULTIMODAL_GIF_SQL = f"""
    WITH gdims AS ({_MM_GIF_SQL}),
    b AS ({_MM_GIF_BYTES_SQL})
    SELECT doc_id,
           width,
           height,
           nframes AS n_frames,
           round(sum((83 * idx) % 256)
                 / CAST(npix * nframes AS DOUBLE), 6) AS mean_b,
           round(sum((59 * idx) % 256)
                 / CAST(npix * nframes AS DOUBLE), 6) AS mean_g,
           round(sum((37 * idx) % 256)
                 / CAST(npix * nframes AS DOUBLE), 6) AS mean_r,
           round(sum((37 * idx) % 256 + (59 * idx) % 256 + (83 * idx) % 256)
                 / CAST(3 * npix * nframes AS DOUBLE), 6) AS mean_all
    FROM b
    GROUP BY doc_id, width, height, npix, nframes
"""


_MCUR_SPREAD = 10.0
_MCUR_MIN_W = 8


def q_media_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed MEDIA curation stage end-to-end (round 13 — the
    multimodal q_c4_pipeline): encode the corpus as multi-frame GIFs,
    decode every 2nd frame for REAL at parse time (gif_frames — LZW,
    palette, stride), reduce frames to per-document luminance spread
    and average, gate on stability (spread <= 10 across sampled
    frames) and minimum width, then roll the survivors up per
    language. One oracle certifies the whole chain: the per-frame
    codec statistics, the frame stride, the per-doc aggregation, the
    gate boundary, and the rollup. Scale shape: the codec is map-only
    Arrow batches; ONE narrow (doc_id, width, luma) aggregate and one
    broadcast-sized join to the doc table — frames never shuffle."""
    docs = _documents(spark, sf_dir)
    fr = multimodal.gif_frames(multimodal.gif_encode(docs), every_nth=2)
    luma = (
        F.col("mean_r") + F.col("mean_g") + F.col("mean_b")
    ) / F.lit(3.0)
    per_doc = (
        fr.withColumn("_luma", luma)
        .groupBy("doc_id", "width")
        .agg(
            (F.max("_luma") - F.min("_luma")).alias("spread"),
            F.avg("_luma").alias("luma"),
        )
    )
    kept = per_doc.filter(
        (F.col("spread") <= _MCUR_SPREAD)
        & (F.col("width") >= _MCUR_MIN_W)
    )
    return (
        kept.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.avg("luma"), 4).alias("avg_luma"),
        )
        .orderBy("lang")
    )


Q_MEDIA_CURATION_SQL = f"""
    WITH gdims AS ({_MM_GIF_SQL}),
    b AS ({_MM_GIF_BYTES_SQL}),
    fm AS (
        SELECT doc_id, width,
               round(sum((37 * idx) % 256) / CAST(npix AS DOUBLE), 6) AS mr,
               round(sum((59 * idx) % 256) / CAST(npix AS DOUBLE), 6) AS mg,
               round(sum((83 * idx) % 256) / CAST(npix AS DOUBLE), 6) AS mb
        FROM b
        WHERE f % 2 = 0
        GROUP BY doc_id, width, npix, f),
    pd AS (
        SELECT doc_id, width,
               max((mr + mg + mb) / 3.0) - min((mr + mg + mb) / 3.0)
                   AS spread,
               avg((mr + mg + mb) / 3.0) AS luma
        FROM fm GROUP BY doc_id, width),
    kept AS (
        SELECT d.lang, pd.luma
        FROM pd JOIN documents d USING (doc_id)
        WHERE pd.spread <= {_MCUR_SPREAD} AND pd.width >= {_MCUR_MIN_W})
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_kept,
           round(avg(luma), 4) AS avg_luma
    FROM kept GROUP BY lang ORDER BY lang
"""


def q_multimodal_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-codec transcode end-to-end (round 13):
    multimodal.transcode_media converts the BMP fixture to REAL PNGs
    (decode bottom-up BGR rows -> flip + channel-swap -> zlib
    re-encode), and extract_features(decode_stub=False) decodes those
    PNGs back. Channel-faithful by contract: the feature slots must
    equal the ORIGINAL BMP stream's analytic statistics — the same
    arithmetic as q_multimodal_features — so a transcoder that drops
    padding wrong, forgets the BGR swap, or mis-flips rows changes a
    mean and hash-mismatches. Two real codecs certified against each
    other through one byte stream."""
    media = multimodal.transcode_media(
        multimodal.bmp_encode(_documents(spark, sf_dir)), to="png"
    )
    feats = multimodal.extract_features(media, decode_stub=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.element_at("feature", 1).alias("mean_b"),
        F.element_at("feature", 2).alias("mean_g"),
        F.element_at("feature", 3).alias("mean_r"),
        F.element_at("feature", 4).alias("mean_all"),
    )


Q_MULTIMODAL_TRANSCODE_SQL = f"""
    WITH dims AS ({_MM_DIMS_SQL}),
    b AS ({_MM_BYTES_SQL})
    SELECT doc_id,
           width,
           height,
           round(sum(CASE WHEN i % 3 = 0 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_b,
           round(sum(CASE WHEN i % 3 = 1 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_g,
           round(sum(CASE WHEN i % 3 = 2 THEN byteval ELSE 0 END)
                 / (npix / 3.0), 6) AS mean_r,
           round(sum(byteval) / CAST(npix AS DOUBLE), 6) AS mean_all
    FROM b
    GROUP BY doc_id, width, height, npix
"""


_GIF_FRAME_STRIDE = 2


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL frame sampling (round 13): gif_frames strides every 2nd
    frame out of the decoded GIF at Arrow-batch time and reports each
    kept frame's OWN channel means — the video frame-sample operation
    over genuinely decoded frames (frame_sample's index plumbing was
    the placeholder). The oracle replays the per-frame md5 index
    stream + palette arithmetic for exactly the strided frame set, so
    frame ordering, stride selection, and per-frame statistics are all
    certified."""
    media = multimodal.gif_encode(_documents(spark, sf_dir))
    return multimodal.gif_frames(
        media, every_nth=_GIF_FRAME_STRIDE
    ).select(
        "doc_id", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b",
    )


Q_MULTIMODAL_GIF_FRAMES_SQL = f"""
    WITH gdims AS ({_MM_GIF_SQL}),
    b AS ({_MM_GIF_BYTES_SQL})
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           width,
           height,
           round(sum((37 * idx) % 256) / CAST(npix AS DOUBLE), 6) AS mean_r,
           round(sum((59 * idx) % 256) / CAST(npix AS DOUBLE), 6) AS mean_g,
           round(sum((83 * idx) % 256) / CAST(npix AS DOUBLE), 6) AS mean_b
    FROM b
    WHERE f % {_GIF_FRAME_STRIDE} = 0
    GROUP BY doc_id, f, width, height, npix
"""


def q_multimodal_gif_anim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-canvas GIF animation COMPOSITING end-to-end (round 14 —
    VERDICT r13 Next #3): multimodal.gif_anim_encode emits valid
    animated GIF89a payloads in the real-world delta shape — frame 0
    full-canvas, every later frame a sub-canvas rect with the GCE
    transparency flag set and disposal method 2 (restore to
    background) — and gif_frames runs the REAL decode + compositing
    (LZW per frame, transparent pixels exposing the canvas beneath,
    rect placement, disposal between frames) and reports each
    COMPOSITED frame's channel means. The oracle never decodes a GIF:
    with disposal 2 the canvas before every frame after the first is
    exactly the background color, so each composited frame's
    statistics are analytic — rect bytes contribute pal[idx] when
    opaque and pal[bg] when transparent (index 7), and the pixels
    outside the rect all contribute pal[bg]. A compositor that paints
    transparent pixels, skips the disposal, or misreads the background
    index hash-mismatches; rect PLACEMENT is placement-invariant to
    these per-frame means (the rect contributes the same sum wherever
    it lands on an all-background canvas), so placement is certified
    by tests/test_llm_ops.py::
    test_gif_composite_randomized_reference_parity's brute-force
    reference compositor, not by this oracle."""
    media = multimodal.gif_anim_encode(_documents(spark, sf_dir))
    return multimodal.gif_frames(media).select(
        "doc_id", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b",
    )


# the composited-frame fixture arithmetic: frame 0 covers the canvas
# opaquely; frame f >= 1 is a (fw x fh) rect at (left, top) over an
# all-background canvas (disposal 2), transparent index 7. Only fw*fh
# bytes per frame exist; the rest of the canvas is pal[bg].
Q_MULTIMODAL_GIF_ANIM_SQL = """
    WITH fr AS (
        SELECT doc_id,
               text,
               CAST(4 * (1 + doc_id % 4) AS INTEGER) AS width,
               CAST(1 + doc_id % 5 AS INTEGER) AS height,
               doc_id % 256 AS bg,
               f
        FROM documents,
             LATERAL (SELECT unnest(range(2 + doc_id % 3)) AS f) u
    ),
    rect AS (
        SELECT doc_id, width, height, bg, f,
               CAST(CASE WHEN f = 0 THEN width
                    ELSE 1 + (doc_id + 3 * f) % width END AS INTEGER) AS fw,
               CAST(CASE WHEN f = 0 THEN height
                    ELSE 1 + (doc_id + f) % height END AS INTEGER) AS fh,
               repeat(md5(coalesce(text, '') || '#a' || f), 5) AS idxhex
        FROM fr
    ),
    b AS (
        SELECT doc_id, width, height, bg, f, fw, fh, i,
               (16 * (instr('0123456789abcdef',
                            substr(idxhex, CAST(2 * i + 1 AS INTEGER), 1))
                      - 1)
                  + (instr('0123456789abcdef',
                           substr(idxhex, CAST(2 * i + 2 AS INTEGER), 1))
                     - 1)) AS idx
        FROM rect, LATERAL (SELECT unnest(range(fw * fh)) AS i) r
    )
    SELECT doc_id,
           CAST(f AS INTEGER) AS frame_idx,
           width,
           height,
           round((sum(CASE WHEN f > 0 AND idx = 7 THEN (37 * bg) % 256
                           ELSE (37 * idx) % 256 END)
                  + (width * height - fw * fh) * ((37 * bg) % 256))
                 / CAST(width * height AS DOUBLE), 6) AS mean_r,
           round((sum(CASE WHEN f > 0 AND idx = 7 THEN (59 * bg) % 256
                           ELSE (59 * idx) % 256 END)
                  + (width * height - fw * fh) * ((59 * bg) % 256))
                 / CAST(width * height AS DOUBLE), 6) AS mean_g,
           round((sum(CASE WHEN f > 0 AND idx = 7 THEN (83 * bg) % 256
                           ELSE (83 * idx) % 256 END)
                  + (width * height - fw * fh) * ((83 * bg) % 256))
                 / CAST(width * height AS DOUBLE), 6) AS mean_b
    FROM b
    GROUP BY doc_id, f, width, height, fw, fh, bg
"""


def q_multimodal_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL baseline JPEG decode end-to-end (round 14 — the codec
    boundary narrowed): multimodal.jpeg_encode emits valid baseline
    JPEGs — grayscale for even doc_ids, 4:4:4 COLOR for odd (three
    components, interleaved MCUs, per-component DC predictors) — with
    real Huffman entropy coding and canonical tables declared in DHT;
    extract_features(decode_stub=False) runs the genuine decode:
    marker walk, table loads, Huffman decode, dequantization, zigzag,
    the 8x8 type-III DCT per block, and the JFIF YCbCr -> RGB
    conversion as floor(x + 0.5). The fixture's flat tiles + all-8s
    quantization make every decoded component pixel EXACTLY its md5
    tile byte (pinned over all 256 values in tests), so the oracle
    recomputes the statistics analytically — replaying the identical
    IEEE conversion expression — and never decodes a JPEG. A decoder
    that mispredicts one DC difference, misreads a Huffman code,
    mis-scales the IDCT, or drifts the color conversion
    hash-mismatches."""
    media = multimodal.jpeg_encode(_documents(spark, sf_dir))
    feats = multimodal.extract_features(media, decode_stub=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.element_at("feature", 1).alias("mean_b"),
        F.element_at("feature", 2).alias("mean_g"),
        F.element_at("feature", 3).alias("mean_r"),
        F.element_at("feature", 4).alias("mean_all"),
    )


def _jpeg_hx(i: str) -> str:
    """Byte ``i`` (0-based SQL expression) of the hex string dighex."""
    return (
        f"(16 * (instr('0123456789abcdef',"
        f" substr(dighex, CAST(2 * ({i}) + 1 AS INTEGER), 1)) - 1)"
        f" + (instr('0123456789abcdef',"
        f" substr(dighex, CAST(2 * ({i}) + 2 AS INTEGER), 1)) - 1))"
    )


Q_MULTIMODAL_JPEG_SQL = f"""
    WITH jd AS (
        SELECT doc_id,
               CAST(1 + doc_id % 3 AS INTEGER) AS tx,
               CAST(1 + doc_id % 2 AS INTEGER) AS ty,
               doc_id % 2 = 1 AS is_color,
               repeat(md5(coalesce(text, '') || '#j'), 2) AS dighex
        FROM documents
    ),
    tb AS (
        SELECT doc_id, tx, ty, is_color,
               {_jpeg_hx("CASE WHEN is_color THEN 3 * k ELSE k END")} AS b0,
               {_jpeg_hx("3 * k + 1")} AS b1,
               {_jpeg_hx("3 * k + 2")} AS b2
        FROM jd, LATERAL (SELECT unnest(range(tx * ty)) AS k) r
    ),
    px AS (
        -- the conversion constants are written in e-notation so DuckDB
        -- types them DOUBLE: a bare 0.344136 parses as DECIMAL and the
        -- whole expression computes EXACTLY, diverging from the
        -- decoder's IEEE doubles at half-integer boundaries (found by
        -- the sf10 sweep: one tile in 500k docs hit x = 107.5 exactly
        -- in decimal but 107.4999... in binary)
        SELECT doc_id, tx, ty,
               CASE WHEN is_color THEN GREATEST(0, LEAST(255,
                   floor(b0 + 1.402e0 * (b2 - 128) + 0.5e0)))
                   ELSE b0 END AS r,
               CASE WHEN is_color THEN GREATEST(0, LEAST(255,
                   floor(b0 - 3.44136e-1 * (b1 - 128)
                            - 7.14136e-1 * (b2 - 128) + 0.5e0)))
                   ELSE b0 END AS g,
               CASE WHEN is_color THEN GREATEST(0, LEAST(255,
                   floor(b0 + 1.772e0 * (b1 - 128) + 0.5e0)))
                   ELSE b0 END AS b
        FROM tb
    )
    SELECT doc_id,
           CAST(8 * tx AS INTEGER) AS width,
           CAST(8 * ty AS INTEGER) AS height,
           round(sum(b) / CAST(tx * ty AS DOUBLE), 6) AS mean_b,
           round(sum(g) / CAST(tx * ty AS DOUBLE), 6) AS mean_g,
           round(sum(r) / CAST(tx * ty AS DOUBLE), 6) AS mean_r,
           round(sum(r + g + b) / CAST(3 * tx * ty AS DOUBLE), 6)
               AS mean_all
    FROM px
    GROUP BY doc_id, tx, ty
"""


def q_multimodal_jpeg_420(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4:2:0 CHROMA-SUBSAMPLED baseline JPEG decode end-to-end (round
    15 — VERDICT r14 Next #2, the dominant real-world JPEG shape):
    multimodal.jpeg_encode(subsampling='420') emits valid baseline
    JPEGs with Y at 2x2 and Cb/Cr at 1x1 sampling — interleaved
    16x16-pixel MCUs carrying four luma blocks + one chroma block
    each, restart interval doc_id % 3 MCUs so the cycling-RST framing
    rides along — and extract_features(decode_stub=False) runs the
    genuine decode: MCU-interleaved entropy decode with per-component
    DC predictors across the 4-luma-1-chroma block pattern,
    dequantization, IDCT, SAMPLE-REPLICATION chroma upsampling, and
    the floor(x+0.5) JFIF YCbCr -> RGB conversion. The fixture keeps
    chroma FLAT per MCU, so ANY correct upsampler is exact on it and
    the oracle recomputes every pixel analytically from the md5 byte
    stream: quadrant j of MCU k decodes to exactly (Y=byte(6k+j),
    Cb=byte(6k+4), Cr=byte(6k+5)). A decoder that mis-orders the MCU
    block pattern, crosses DC predictors between the four luma
    blocks, misplaces a chroma sample's 2x2 pixel block, or skips a
    restart reset hash-mismatches."""
    media = multimodal.jpeg_encode(
        _documents(spark, sf_dir), subsampling="420"
    )
    feats = multimodal.extract_features(media, decode_stub=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.element_at("feature", 1).alias("mean_b"),
        F.element_at("feature", 2).alias("mean_g"),
        F.element_at("feature", 3).alias("mean_r"),
        F.element_at("feature", 4).alias("mean_all"),
    )


# the 4:2:0 fixture arithmetic: MCU k's four 8x8 luma quadrants are
# bytes 6k..6k+3 of the repeated digest, its flat chroma pair bytes
# 6k+4 / 6k+5; each quadrant is 64 identical pixels, so per-image
# means are means over the 4 * tx * ty quadrant values. Conversion
# constants in e-notation so DuckDB types them DOUBLE (the r14 sf10
# lesson: bare decimals compute exactly and diverge from IEEE at
# half-integer floor boundaries).
Q_MULTIMODAL_JPEG_420_SQL = f"""
    WITH jd AS (
        SELECT doc_id,
               CAST(1 + doc_id % 2 AS INTEGER) AS tx,
               CAST(1 + doc_id % 3 AS INTEGER) AS ty,
               repeat(md5(coalesce(text, '') || '#j420'), 3) AS dighex
        FROM documents
    ),
    qd AS (
        SELECT doc_id, tx, ty,
               {_jpeg_hx("6 * k + j")} AS yv,
               {_jpeg_hx("6 * k + 4")} AS cb,
               {_jpeg_hx("6 * k + 5")} AS cr
        FROM jd,
             LATERAL (SELECT unnest(range(tx * ty)) AS k) r,
             LATERAL (SELECT unnest(range(4)) AS j) s
    ),
    px AS (
        SELECT doc_id, tx, ty,
               GREATEST(0, LEAST(255,
                   floor(yv + 1.402e0 * (cr - 128) + 0.5e0))) AS r,
               GREATEST(0, LEAST(255,
                   floor(yv - 3.44136e-1 * (cb - 128)
                            - 7.14136e-1 * (cr - 128) + 0.5e0))) AS g,
               GREATEST(0, LEAST(255,
                   floor(yv + 1.772e0 * (cb - 128) + 0.5e0))) AS b
        FROM qd
    )
    SELECT doc_id,
           CAST(16 * tx AS INTEGER) AS width,
           CAST(16 * ty AS INTEGER) AS height,
           round(sum(b) / CAST(4 * tx * ty AS DOUBLE), 6) AS mean_b,
           round(sum(g) / CAST(4 * tx * ty AS DOUBLE), 6) AS mean_g,
           round(sum(r) / CAST(4 * tx * ty AS DOUBLE), 6) AS mean_r,
           round(sum(r + g + b) / CAST(12 * tx * ty AS DOUBLE), 6)
               AS mean_all
    FROM px
    GROUP BY doc_id, tx, ty
"""


def q_multimodal_jpeg_prog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PROGRESSIVE JPEG decode end-to-end (round 15 — T.81 Annex G;
    REGISTERED IN ROUND 16: round 15's nine-slot new/changed budget
    was already committed when this landed, so per the rotation
    discipline the operator ships now with its pytest certification
    — test_jpeg_progressive_equals_baseline pins bit-identical pixels
    vs the baseline twin across gray/444/420/q/dims/restarts, plus a
    hand-assembled first-principles refinement vector — and takes its
    driver slot in the r16 rotation's 14-slot slack):
    multimodal.jpeg_encode(subsampling='prog') renders the round-14
    flat-tile grayscale geometry to pixels and pushes them through
    the REAL multi-scan progressive encoder (interleaved DC first at
    Al=1, spectral-split AC first scans, successive-approximation
    refinements down to Al=0, EOB-run coding, restart interval
    doc_id % 3), and extract_features(decode_stub=False) runs the
    real multi-scan decode. A flat tile's forward DCT is DC-only and
    quantizes exactly at q=8, so the decode reproduces the tile bytes
    exactly and the oracle recomputes the statistics from the md5
    stream. A decoder that drops a refinement bit plane, misreads an
    EOB run, or skips a DC refinement hash-mismatches."""
    media = multimodal.jpeg_encode(
        _documents(spark, sf_dir), subsampling="prog"
    )
    feats = multimodal.extract_features(media, decode_stub=False)
    return feats.select(
        "doc_id",
        "width",
        "height",
        F.element_at("feature", 4).alias("mean_gray"),
    )


Q_MULTIMODAL_JPEG_PROG_SQL = f"""
    WITH jd AS (
        SELECT doc_id,
               CAST(1 + doc_id % 3 AS INTEGER) AS tx,
               CAST(1 + doc_id % 2 AS INTEGER) AS ty,
               md5(coalesce(text, '') || '#jp') AS dighex
        FROM documents
    ),
    tb AS (
        SELECT doc_id, tx, ty, {_jpeg_hx("k")} AS b0
        FROM jd, LATERAL (SELECT unnest(range(tx * ty)) AS k) r
    )
    SELECT doc_id,
           CAST(8 * tx AS INTEGER) AS width,
           CAST(8 * ty AS INTEGER) AS height,
           round(sum(b0) / CAST(tx * ty AS DOUBLE), 6) AS mean_gray
    FROM tb
    GROUP BY doc_id, tx, ty
"""


def q_multimodal_video(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL video demux + per-frame decode end-to-end (round 15 —
    the video boundary narrows to actual demuxing; REGISTERED IN
    ROUND 16 with q_multimodal_jpeg_prog per the rotation budget,
    pytest-certified this round): multimodal.avi_encode emits valid
    single-stream AVIs — EVEN doc_ids uncompressed DIB (bottom-up
    padded BGR rows, pixel bytes = the md5 stream), ODD doc_ids MJPG — width varying on doc_id // 2 so both 1- and
    2-tile-wide frames occur — (each frame a complete flat-tile
    grayscale JPEG through the real entropy decode) — and video_frames runs the RIFF walk
    (avih/strh/strf cross-checks), per-frame chunk scan, and the
    per-frame pixel decode, emitting one row per frame with channel
    means. The oracle recomputes every frame's means from the digest
    bytes (DIB: BGR triplets of the md5 stream; MJPG: flat tiles
    decode to exactly their digest byte) — it never parses an AVI. A
    demuxer that mis-walks chunk padding, flips the bottom-up row
    order into wrong bytes-per-channel, or desyncs a JPEG frame
    hash-mismatches."""
    media = multimodal.avi_encode(_documents(spark, sf_dir))
    return multimodal.video_frames(media).select(
        "doc_id", "frame_idx", "width", "height",
        "mean_r", "mean_g", "mean_b",
    )


Q_MULTIMODAL_VIDEO_SQL = f"""
    WITH fr AS (
        SELECT doc_id, text,
               f
        FROM documents,
             LATERAL (SELECT unnest(range(2 + doc_id % 3)) AS f) u
    ),
    dib AS (
        -- even docs: 4x2 RGB frames, pixel bytes = md5(text#avf)
        -- repeated; mean_r over bytes 0,3,..,21 etc.
        SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
               4 AS width, 2 AS height,
               d.dighex
        FROM fr, LATERAL (
            SELECT repeat(md5(coalesce(text, '') || '#av' || f), 2) AS dighex
        ) d
        WHERE doc_id % 2 = 0
    ),
    dibpx AS (
        SELECT doc_id, frame_idx, width, height,
               {_jpeg_hx("3 * k")} AS r,
               {_jpeg_hx("3 * k + 1")} AS g,
               {_jpeg_hx("3 * k + 2")} AS b
        FROM dib, LATERAL (SELECT unnest(range(8)) AS k) px
    ),
    dibm AS (
        SELECT doc_id, frame_idx, width, height,
               round(avg(r), 6) AS mean_r,
               round(avg(g), 6) AS mean_g,
               round(avg(b), 6) AS mean_b
        FROM dibpx GROUP BY doc_id, frame_idx, width, height
    ),
    mj AS (
        -- odd docs: grayscale flat-tile MJPG, tile k of frame f =
        -- byte k of md5(text#avjf); gray means r=g=b
        SELECT doc_id, CAST(f AS INTEGER) AS frame_idx,
               CAST(8 * tx AS INTEGER) AS width, 8 AS height,
               d.dighex, tx
        FROM fr,
             LATERAL (SELECT CAST(1 + (doc_id // 2) % 2 AS INTEGER) AS tx) t,
             LATERAL (
                 SELECT md5(coalesce(text, '') || '#avj' || f) AS dighex
             ) d
        WHERE doc_id % 2 = 1
    ),
    mjm AS (
        SELECT doc_id, frame_idx, width, height,
               round(avg({_jpeg_hx("k")}), 6) AS mean_r,
               round(avg({_jpeg_hx("k")}), 6) AS mean_g,
               round(avg({_jpeg_hx("k")}), 6) AS mean_b
        FROM mj, LATERAL (SELECT unnest(range(tx)) AS k) tk
        GROUP BY doc_id, frame_idx, width, height
    )
    SELECT * FROM dibm UNION ALL SELECT * FROM mjm
"""


# ---------------------------------------------------------------------------
# round 7: training-mix construction + span-level dedup + LM quality

_MIX7_SALT = "mix7"
_SPLIT7_SALT = "split7"
_SPLIT7_WEIGHTS = {"train": 0.9, "val": 0.05, "test": 0.05}
_SPAN_WORDS = 3  # fixture vocabulary is ~31 words; 3-word tiles give a
#                  ~20% duplicate-span rate, so the keep-first + rebuild
#                  path is genuinely exercised (16-word default tiles
#                  would almost never collide on this synthetic corpus)

def q_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-0.5 domain resample (mixture.temperature_mix):
    per-source keep fraction (c_min/c_s)^0.5 — smallest source kept
    whole, bulk sources root-downsampled (the p ∝ c^alpha mix of
    multilingual LM training), selected by content hash. alpha=0.5 is
    pinned for the oracle because sqrt/div/mul/floor are all
    correctly-rounded IEEE ops, so both engines derive the identical
    integer threshold from the counts and the hash match certifies
    the exact sampled row set."""
    from firebolt_spark.operators import mixture

    docs = _documents(spark, sf_dir)
    # stratify on lang, not source: the fixture's sources are exactly
    # uniform (25 docs each), which would degenerate the mix to the
    # identity; lang is ~2.7x skewed (en-heavy), so the root-downsample
    # genuinely fires and the oracle certifies a non-trivial row set
    return mixture.temperature_mix(
        docs.select("doc_id", "lang"),
        "lang",
        key_col="doc_id",
        alpha=0.5,
        salt=_MIX7_SALT,
    ).orderBy("doc_id")


Q_TEMPERATURE_MIX_SQL = f"""
    WITH c AS (SELECT lang, count(*) AS cs FROM documents GROUP BY lang),
    m AS (SELECT min(cs) AS cmin FROM c),
    thr AS (SELECT lang,
                   CAST(floor(sqrt(CAST(cmin AS DOUBLE) / CAST(cs AS DOUBLE))
                              * 4294967296.0) AS BIGINT) AS t
            FROM c, m)
    SELECT d.doc_id, d.lang
    -- null-safe join: the operator treats a NULL stratum as a stratum
    -- (eqNullSafe); plain = would drop NULL-lang rows and desync the
    -- engines on corpora with NULL strata
    FROM documents d JOIN thr ON d.lang IS NOT DISTINCT FROM thr.lang
    WHERE {_bucket_sql('d.doc_id', _MIX7_SALT)} < t
    ORDER BY d.doc_id
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (mixture.hash_split):
    contiguous ranges of the 32-bit content-hash space, thresholds
    fixed at plan time as exact integers — a document keeps one split
    fate across reruns, engines, and incremental ingests (no
    test→train leakage). Oracle CASE is generated from the SAME
    split_thresholds() the operator uses."""
    from firebolt_spark.operators import mixture

    docs = _documents(spark, sf_dir)
    return mixture.hash_split(
        docs.select("doc_id"), "doc_id", _SPLIT7_WEIGHTS, salt=_SPLIT7_SALT
    ).orderBy("doc_id")


def _hash_split_sql() -> str:
    from firebolt_spark.operators.mixture import split_thresholds

    cuts = split_thresholds(_SPLIT7_WEIGHTS)
    b = _bucket_sql("doc_id", _SPLIT7_SALT)
    whens = " ".join(
        f"WHEN {b} < {thr} THEN '{name}'" for name, thr in cuts[:-1]
    )
    return f"""
        SELECT doc_id, CASE {whens} ELSE '{cuts[-1][0]}' END AS split
        FROM documents ORDER BY doc_id
    """


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact dedup (dedup.dedup_spans, Lee et al. 2022
    ExactSubstr analogue): tile docs into _SPAN_WORDS-word windows,
    drop every window already seen (keep-first in (doc_id, pos)
    order), rebuild surviving text in-row. The narrow digest shuffle
    decides; bodies move through exactly one doc-key join. The oracle
    replays tile → md5 → row_number keep-first → ordered string_agg,
    so the hash match certifies the rebuilt text byte-for-byte."""
    return dedup.dedup_spans(
        _documents(spark, sf_dir), span_words=_SPAN_WORDS
    ).orderBy("doc_id")


Q_DEDUP_SPANS_SQL = f"""
    WITH base AS (
        -- coalesce mirrors the operator: NULL text tiles as empty
        SELECT doc_id, string_split(trim(coalesce(text, '')), ' ') AS words
        FROM documents),
    sized AS (
        SELECT doc_id, words,
               CAST(ceil(len(words) / {_SPAN_WORDS}.0) AS INT) AS n_spans
        FROM base),
    spans AS (
        SELECT doc_id,
               unnest(range(0, n_spans)) AS pos,
               unnest(list_transform(range(0, n_spans),
                      i -> array_to_string(
                          words[i * {_SPAN_WORDS} + 1 : i * {_SPAN_WORDS} + {_SPAN_WORDS}],
                          ' '))) AS span
        FROM sized),
    ranked AS (
        SELECT doc_id, pos, span,
               row_number() OVER (PARTITION BY md5(span)
                                  ORDER BY doc_id, pos) AS rk
        FROM spans),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(span, ' ' ORDER BY pos) AS text_dedup
        FROM ranked WHERE rk = 1 GROUP BY doc_id)
    SELECT s.doc_id, s.n_spans,
           CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
           coalesce(a.text_dedup, '') AS text_dedup
    FROM sized s LEFT JOIN agg a USING (doc_id)
    ORDER BY s.doc_id
"""


def q_dedup_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line-level exact dedup across the corpus (dedup.dedup_lines —
    the C4 move, Raffel et al. 2020 §2.2, round 11): every line whose
    exact content appeared earlier in (doc_id, position) order is
    removed and documents are reassembled; sub-min_chars lines (empty/
    whitespace — document structure) are always kept. The oracle
    replays split-on-newline → md5 → row_number keep-first → rebuild,
    certifying the surviving text byte-for-byte (the fixture's exact-
    duplicate documents lose their single line to the first copy)."""
    return dedup.dedup_lines(_documents(spark, sf_dir)).orderBy("doc_id")


Q_DEDUP_LINES_SQL = """
    WITH base AS (
        -- coalesce mirrors the operator: NULL text splits as empty
        SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents),
    lines AS (
        SELECT doc_id,
               unnest(range(0, len(ls))) AS pos,
               unnest(ls) AS line
        FROM base),
    keep AS (
        SELECT doc_id, pos, line FROM (
            SELECT doc_id, pos, line,
                   row_number() OVER (PARTITION BY md5(line)
                                      ORDER BY doc_id, pos) AS rk
            FROM lines WHERE length(trim(line)) >= 1)
        WHERE rk = 1
        UNION ALL
        SELECT doc_id, pos, line FROM lines WHERE length(trim(line)) < 1),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS text_dedup
        FROM keep GROUP BY doc_id)
    SELECT b.doc_id, CAST(len(b.ls) AS INT) AS n_lines,
           CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
           coalesce(a.text_dedup, '') AS text_dedup
    FROM base b LEFT JOIN agg a USING (doc_id)
    ORDER BY b.doc_id
"""


def q_dedup_lines_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental line-level dedup (round 13): a new ingest batch
    (first 50 docs relabeled) is scrubbed against the corpus's
    persisted line-digest ledger via dedup.incremental_dedup_lines —
    the ingest-loop face of q_dedup_lines, exactly as
    q_dedup_incremental is for MinHash signatures. The ledger is built
    through the operator's own public path (an empty-index run's
    new_digests output — what a maintenance loop accumulates). Since
    the batch is an exact relabeled copy, every dedupable line is
    already in the ledger and only sub-min_chars structure lines
    survive; the oracle replays ledger → anti-join → within-batch
    keep-first → rebuild byte-for-byte."""
    from firebolt_spark.functions import track_persisted

    docs = _documents(spark, sf_dir)
    led_deduped, ledger = dedup.incremental_dedup_lines(docs)
    new_docs = docs.filter(F.col("doc_id") < 50).withColumn(
        "doc_id", F.col("doc_id") + 2000000
    )
    deduped, _new_digests = dedup.incremental_dedup_lines(new_docs, ledger)
    # re-attach BOTH calls' persisted intermediates to the frame the
    # caller actually holds (derived frames don't inherit handles, and
    # the ledger call's result frame is discarded) — release(result)
    # must be able to free the corpus-sized line-meta cache
    return track_persisted(
        deduped.orderBy("doc_id"),
        *getattr(led_deduped, "_persisted_inputs", ()),
        *getattr(deduped, "_persisted_inputs", ()),
    )


Q_DEDUP_LINES_INCREMENTAL_SQL = """
    WITH base AS (
        SELECT doc_id + 2000000 AS doc_id,
               string_split(coalesce(text, ''), chr(10)) AS ls
        FROM documents WHERE doc_id < 50),
    idx AS (
        SELECT DISTINCT md5(line) AS digest FROM (
            SELECT unnest(string_split(coalesce(text, ''), chr(10))) AS line
            FROM documents) t
        WHERE length(trim(line)) >= 1),
    lines AS (
        SELECT doc_id,
               unnest(range(0, len(ls))) AS pos,
               unnest(ls) AS line
        FROM base),
    fresh AS (
        SELECT doc_id, pos, line FROM lines
        WHERE length(trim(line)) >= 1
          AND md5(line) NOT IN (SELECT digest FROM idx)),
    keep AS (
        SELECT doc_id, pos, line FROM (
            SELECT doc_id, pos, line,
                   row_number() OVER (PARTITION BY md5(line)
                                      ORDER BY doc_id, pos) AS rk
            FROM fresh)
        WHERE rk = 1
        UNION ALL
        SELECT doc_id, pos, line FROM lines WHERE length(trim(line)) < 1),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS text_dedup
        FROM keep GROUP BY doc_id)
    SELECT b.doc_id, CAST(len(b.ls) AS INT) AS n_lines,
           CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
           coalesce(a.text_dedup, '') AS text_dedup
    FROM base b LEFT JOIN agg a USING (doc_id)
    ORDER BY b.doc_id
"""


_WINNOW_W = 4  # winnowing window (grams per min-selection)


def q_dedup_spans_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offset-robust span dedup (dedup.dedup_spans_overlap — the Lee
    et al. 2022 ExactSubstr semantics at window granularity, VERDICT
    r7 "Next #1"): every OVERLAPPING _SPAN_WORDS-word window is hashed,
    so a duplicated passage is caught at any word offset — the gap of
    q_dedup_spans' fixed tiles. A word is removed iff covered by a
    window whose content appeared earlier in (doc_id, pos) order. The
    oracle replays window → md5 → row_number keep-first → coverage
    filter → rebuild, certifying the surviving text byte-for-byte."""
    return dedup.dedup_spans_overlap(
        _documents(spark, sf_dir, spread=True), span_words=_SPAN_WORDS
    ).orderBy("doc_id")


Q_DEDUP_SPANS_OVERLAP_SQL = f"""
    WITH base AS (
        SELECT doc_id, string_split(trim(coalesce(text, '')), ' ') AS words
        FROM documents),
    sized AS (SELECT doc_id, words, len(words) AS n FROM base),
    wins AS (
        SELECT doc_id,
               unnest(range(0, greatest(n - {_SPAN_WORDS}, 0) + 1)) AS pos,
               unnest(list_transform(range(0, greatest(n - {_SPAN_WORDS}, 0) + 1),
                      p -> md5(array_to_string(
                          words[p + 1 : p + {_SPAN_WORDS}], ' ')))) AS digest
        FROM sized),
    ranked AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY digest
                                  ORDER BY doc_id, pos) AS rk
        FROM wins),
    dups AS (SELECT doc_id, list(pos ORDER BY pos) AS dup_pos
             FROM ranked WHERE rk > 1 GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(s.n AS INT) AS n_words,
           CAST(len(list_filter(s.words, (w, i) ->
                len(list_filter(coalesce(d.dup_pos, []), p ->
                    p <= i - 1 AND i - 1 < p + {_SPAN_WORDS})) = 0))
               AS INT) AS n_kept,
           -- coalesce: DuckDB's array_to_string([]) is NULL, Spark's
           -- array_join(array()) is '' — a fully-scrubbed doc must
           -- come back empty in both engines
           coalesce(array_to_string(list_filter(s.words, (w, i) ->
                len(list_filter(coalesce(d.dup_pos, []), p ->
                    p <= i - 1 AND i - 1 < p + {_SPAN_WORDS})) = 0), ' '), '')
               AS text_dedup
    FROM sized s LEFT JOIN dups d USING (doc_id)
    ORDER BY s.doc_id
"""


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprints (dedup.winnow_fingerprints — Schleimer et
    al. 2003/MOSS): min-hash of each _WINNOW_W consecutive overlapping
    _SPAN_WORDS-grams. The offset-robust candidate index that keeps
    the exact overlapping pass (q_dedup_spans_overlap) affordable at
    100 TB: any shared passage >= _WINNOW_W + _SPAN_WORDS - 1 words
    guarantees a shared fingerprint while the index stays
    ~2/(_WINNOW_W+1) of the gram volume. Round 18: the gram hash is
    a 60-bit BIGINT (first 15 md5 hex digits of the joined gram) —
    both engines compute it identically, so the fingerprint SET stays
    hash-exact while the minima compare and the distinct shuffle run
    on 8-byte integers."""
    # spread: ~1.08x loss at sf0.1 (6-round interleaved) but a large
    # win at sf1 where the same 2-row-group scan carries 10x the rows
    # of per-row gram hashing — the scale step dominates the decision.
    return dedup.winnow_fingerprints(
        _documents(spark, sf_dir, spread=True), span_words=_SPAN_WORDS, window=_WINNOW_W
    ).orderBy("doc_id", "fingerprint")


# The 60-bit BIGINT gram hash, mirroring dedup._gram_list verbatim:
# first 15 hex digits of the joined gram's md5 via the parity-tested
# ('0x'||hex)::BIGINT idiom (≡ Spark's conv(hex, 16, 10) cast BIGINT).
def _gram_hash_sql(k: int) -> str:
    return (
        f"list_transform(range(0, greatest(len(words) - {k}, 0) + 1), "
        f"p -> ('0x' || substr(md5(array_to_string("
        f"words[p + 1 : p + {k}], ' ')), 1, 15))::BIGINT)"
    )


Q_WINNOW_FINGERPRINTS_SQL = f"""
    WITH base AS (
        SELECT doc_id, string_split(trim(coalesce(text, '')), ' ') AS words
        FROM documents),
    grams AS (
        SELECT doc_id, {_gram_hash_sql(_SPAN_WORDS)} AS g
        FROM base),
    fps AS (
        SELECT doc_id,
               unnest(list_transform(range(0, greatest(len(g) - {_WINNOW_W}, 0) + 1),
                      j -> list_min(g[j + 1 : j + {_WINNOW_W}]))) AS fingerprint
        FROM grams)
    SELECT DISTINCT doc_id, fingerprint FROM fps
    ORDER BY doc_id, fingerprint
"""


def q_dedup_spans_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The winnow→exact composition (dedup.dedup_spans_candidates —
    VERDICT r8 "Next #3"): winnowed fingerprints select candidate
    documents (shared fingerprint across docs, or an internal repeat),
    and the exact offset-robust overlapping-window pass runs ONLY over
    the candidates; non-candidates pass through verbatim. Duplicated
    passages >= _WINNOW_W + _SPAN_WORDS - 1 words are removed exactly
    as q_dedup_spans_overlap would; within-doc repeats are caught at
    full span granularity via the pre-winnow gram check. The oracle
    replays winnow →
    candidate selection → restricted keep-first → rebuild, certifying
    the surviving text byte-for-byte."""
    # spread: parity at sf0.1 (1.00x min / 1.09x median, 6 interleaved
    # rounds) but ~2x at sf1 — the winnow gram hashing serializes on a
    # 2-task scan carrying 10x the rows; the scale step decides.
    return dedup.dedup_spans_candidates(
        _documents(spark, sf_dir, spread=True),
        span_words=_SPAN_WORDS,
        window=_WINNOW_W,
    ).orderBy("doc_id")


def _scratch_dir(kind: str, sf_dir: str) -> str:
    """Deterministic per-(kind, fixture) scratch path for index
    artifacts a query builds as part of its own plan — overwritten on
    every call, so repeated driver/bench runs reuse one location
    instead of leaking temp dirs."""
    import hashlib
    import os
    import tempfile

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:10]
    return os.path.join(tempfile.gettempdir(), f"fb_{kind}_{tag}")


def _proc_starttime(pid: int) -> int | None:
    """The process's start time in clock ticks since boot
    (``/proc/<pid>/stat`` field 22) — the disambiguator that makes a
    (pid, starttime) pair unique across pid reuse. None off-Linux or
    when the process is gone."""
    try:
        with open(f"/proc/{pid}/stat", "rb") as f:
            stat = f.read().decode("ascii", "replace")
        # the comm field (2) may contain spaces/parens; fields 3+ start
        # after the LAST ')', so field 22 is index 19 there
        return int(stat.rsplit(")", 1)[1].split()[19])
    except (OSError, IndexError, ValueError):
        return None


def _scratch_table(kind: str, spark: SparkSession | None = None) -> str:
    """Deterministic PER-PROCESS scratch table name for index
    artifacts a query builds in the shared spark-warehouse. The
    (pid, process-starttime) suffix is what keeps concurrent driver /
    bench / pytest processes from racing on one table (one overwriting
    ``_sig`` while another probes) — the same collision the tests'
    ``wh_table`` fixture prevents; within a process, repeated runs
    reuse the one name. The starttime component (round 13 — VERDICT
    r12 Next #7a) closes the pid-reuse hole: a bare-/proc liveness
    check would keep a dead process's table alive forever once an
    unrelated process recycles its pid, while (pid, starttime) is
    unique per process incarnation. When ``spark`` is passed, scratch
    tables left by DEAD incarnations are dropped first — safe because
    a dead process cannot be mid-probe."""
    import os

    if spark is not None:
        _sweep_dead_scratch(spark, kind)
    st = _proc_starttime(os.getpid())
    suffix = f"{os.getpid()}_{st}" if st is not None else str(os.getpid())
    return f"fb_q_{kind}_{suffix}"


def _sweep_dead_scratch(spark: SparkSession, kind: str) -> None:
    import os
    import re

    pat = re.compile(
        rf"^fb_q_{re.escape(kind)}_(\d+)(?:_(\d+))?(_sig|_bands)?$"
    )
    my_pid, my_st = os.getpid(), _proc_starttime(os.getpid())
    for t in spark.catalog.listTables():
        m = pat.match(t.name)
        if not m:
            continue
        pid, st = int(m.group(1)), m.group(2)
        if pid == my_pid and (
            my_st is None or st is None or int(st) == my_st
        ):
            # ours (or indistinguishable from ours off-Linux) — keep
            continue
        live_st = _proc_starttime(pid)
        if live_st is None:
            # owning process gone — cannot be mid-probe, reap
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        elif st is not None and live_st != int(st):
            # pid RECYCLED by an unrelated process: the recorded
            # incarnation is dead even though /proc/<pid> exists
            spark.sql(f"DROP TABLE IF EXISTS {t.name}")
        # else: a genuinely live owner (or a legacy pid-only name on a
        # live pid, where liveness is all we can check) — never touch


def q_dedup_spans_candidates_indexed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The ON-DISK winnow index path of the same composition (round
    11): candidate discovery probes a build_winnow_index artifact
    (built fresh into a deterministic scratch dir — the build IS part
    of what this query certifies) instead of re-winnowing in-op. The
    operator contract says the result is bit-identical to
    q_dedup_spans_candidates, and this entry makes the driver's oracle
    enforce that — same SQL, index path exercised end-to-end."""
    docs = _documents(spark, sf_dir)
    path = _scratch_dir("winnow_idx", sf_dir)
    dedup.build_winnow_index(
        docs, path, span_words=_SPAN_WORDS, window=_WINNOW_W
    )
    return dedup.dedup_spans_candidates(
        docs, span_words=_SPAN_WORDS, window=_WINNOW_W, index_path=path
    ).orderBy("doc_id")


def q_dedup_ngram_jaccard_indexed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-bucketed shingle-index path of q_dedup_ngram_jaccard
    (round 11): the inverted index is read from a build_shingle_index
    table (built fresh by the query — bucketed by ``sh``, so the
    candidate self-join and the hot-shingle aggregate run
    exchange-free) instead of shingling in-session. Same max_df=0.5
    cap, same oracle — the driver certifies the bucketed artifact path
    produces the identical pair set."""
    from firebolt_spark.operators.similarity import _delete_dir

    docs = _documents(spark, sf_dir)
    tbl = _scratch_table("shingle_idx", spark)
    if not spark.catalog.tableExists(tbl):
        # a PREVIOUS session's managed-table directory without a
        # catalog entry blocks saveAsTable(LOCATION_ALREADY_EXISTS);
        # this is our own per-process scratch table, safe to clear
        _delete_dir(
            spark,
            spark.conf.get("spark.sql.warehouse.dir") + f"/{tbl}",
        )
    dedup.build_shingle_index(docs, tbl, n=3)
    return dedup.ngram_jaccard_pairs(docs, max_df=0.5, shingle_index=tbl)


Q_DEDUP_SPANS_CANDIDATES_SQL = f"""
    WITH base AS (
        SELECT doc_id, string_split(trim(coalesce(text, '')), ' ') AS words
        FROM documents),
    grams AS (
        SELECT doc_id, words, {_gram_hash_sql(_SPAN_WORDS)} AS g
        FROM base),
    fp_all AS (
        SELECT doc_id,
               list_transform(range(0, greatest(len(g) - {_WINNOW_W}, 0) + 1),
                      j -> list_min(g[j + 1 : j + {_WINNOW_W}])) AS fl
        FROM grams),
    fp AS (SELECT DISTINCT doc_id, unnest(fl) AS fingerprint FROM fp_all),
    shared AS (SELECT fingerprint FROM fp
               GROUP BY fingerprint HAVING count(*) >= 2),
    cand AS (
        SELECT DISTINCT doc_id FROM fp JOIN shared USING (fingerprint)
        UNION
        -- within-doc repeats detected on the PRE-winnow gram array
        -- (full span granularity; the winnowed minima repeat in
        -- consecutive windows by construction)
        SELECT doc_id FROM grams WHERE len(g) != len(list_distinct(g))),
    sized AS (SELECT doc_id, words, len(words) AS n FROM base),
    wins AS (
        SELECT s.doc_id,
               unnest(range(0, greatest(n - {_SPAN_WORDS}, 0) + 1)) AS pos,
               unnest(list_transform(range(0, greatest(n - {_SPAN_WORDS}, 0) + 1),
                      p -> md5(array_to_string(
                          words[p + 1 : p + {_SPAN_WORDS}], ' ')))) AS digest
        FROM sized s JOIN cand USING (doc_id)),
    ranked AS (
        SELECT doc_id, pos,
               row_number() OVER (PARTITION BY digest
                                  ORDER BY doc_id, pos) AS rk
        FROM wins),
    dups AS (SELECT doc_id, list(pos ORDER BY pos) AS dup_pos
             FROM ranked WHERE rk > 1 GROUP BY doc_id)
    SELECT s.doc_id,
           CAST(s.n AS INT) AS n_words,
           CAST(len(list_filter(s.words, (w, i) ->
                len(list_filter(coalesce(d.dup_pos, []), p ->
                    p <= i - 1 AND i - 1 < p + {_SPAN_WORDS})) = 0))
               AS INT) AS n_kept,
           coalesce(array_to_string(list_filter(s.words, (w, i) ->
                len(list_filter(coalesce(d.dup_pos, []), p ->
                    p <= i - 1 AND i - 1 < p + {_SPAN_WORDS})) = 0), ' '), '')
               AS text_dedup
    FROM sized s LEFT JOIN dups d USING (doc_id)
    ORDER BY s.doc_id
"""


def q_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM cross-entropy per document (text.lm_cross_entropy)
    — the distributed stand-in for perplexity quality filtering
    (CCNet-style): token stream → broadcast vocabulary join → one
    narrow doc-key aggregation; bodies never shuffle. Self-scored
    against the corpus's own Laplace-smoothed unigram model; bits/token
    is a DECIMAL(30,15)-sum mean (order-independent, so both engines
    derive the bit-identical double before the round — ADVICE r7)."""
    return text.lm_cross_entropy(_documents(spark, sf_dir)).orderBy("doc_id")


Q_LM_QUALITY_SQL = """
    WITH tok AS (
        SELECT doc_id, unnest(string_split(trim(text), ' ')) AS token
        FROM documents),
    v AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    t AS (SELECT count(*) AS total, count(DISTINCT token) AS vsize FROM tok)
    SELECT doc_id, CAST(count(*) AS INT) AS n_tokens,
           round(CAST(sum(CAST(-log2(CAST(cnt + 1 AS DOUBLE)
                                     / CAST(total + vsize AS DOUBLE))
                               AS DECIMAL(30, 15))) AS DOUBLE)
                 / count(*), 4) AS bits_per_token
    FROM tok JOIN v USING (token), t
    GROUP BY doc_id ORDER BY doc_id
"""


# ---- hashed-feature quality scoring & data selection ----------------------

_FEAT_BUCKETS = 4096
_FEAT_SALT = "feat"

# unigram + adjacent-bigram feature stream → md5 bucket, WITH
# multiplicity — the SQL mirror of text.hashed_ngram_counts (the
# md5-bucket spelling is the repo-wide _H32 one; bigrams only for
# len >= 2 texts, matching the Spark-side IF guard). src parametrizes
# the corpus relation so q_quality_selection can run the same chain
# over its gated subset.
def _hashed_feats_ctes(src: str = "documents", materialized: bool = False) -> str:
    out = _HASHED_FEATS_CTES.replace("FROM documents", f"FROM {src}")
    if materialized:
        # fb is referenced by fc AND both DSIR models — at sf10 DuckDB's
        # CTE inlining recomputes the whole gate+feature chain per
        # reference and its spill exhausts the disk; materializing the
        # shared stream bounds the temp footprint
        out = out.replace("fb AS (", "fb AS MATERIALIZED (")
    return out


_HASHED_FEATS_CTES = f"""
    toks AS (
        SELECT doc_id, lang, string_split(trim(text), ' ') AS t
        FROM documents WHERE text IS NOT NULL),
    feats AS (
        SELECT doc_id, lang, unnest(t) AS f FROM toks
        UNION ALL
        SELECT doc_id, lang,
               unnest(list_transform(range(1, len(t)),
                      i -> t[i] || ' ' || t[i + 1])) AS f
        FROM toks WHERE len(t) >= 2),
    fb AS (
        SELECT doc_id, lang,
               CAST((('0x' || substr(md5(f || '#{_FEAT_SALT}'), 1, 8))::BIGINT)
                    % {_FEAT_BUCKETS} AS INTEGER) AS bucket
        FROM feats),
    fc AS (SELECT doc_id, bucket, count(*) AS cnt FROM fb GROUP BY ALL)"""


def _pseudo_weights(spark: SparkSession, n_buckets: int) -> DataFrame:
    """Deterministic md5-derived classifier weights in [-1, 1] — stands
    in for a trained fastText-style model so the oracle can rebuild the
    IDENTICAL weight table from nothing but SQL (a real deployment
    would load trained weights from a table instead)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("w#"), F.col("id").cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")
    return spark.range(n_buckets).select(
        F.col("id").cast("int").alias("bucket"),
        (((h % 2001).cast("double") - 1000) / 1000.0).alias("weight"),
    )


def q_classifier_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear quality-classifier inference over hashed n-gram features
    (text.classifier_score — the fastText-style CCNet/LLaMA "looks
    like reference text" filter): unigram+bigram counts hashed into a
    fixed bucket space, one broadcast join against the (bounded)
    weight table, exact decimal dot product, sigmoid. The oracle
    rebuilds the identical md5-derived weight table and hashes the
    same buckets, so logit AND score are certified value-for-value."""
    w = _pseudo_weights(spark, _FEAT_BUCKETS)
    return text.classifier_score(
        _documents(spark, sf_dir, spread=True),
        w,
        n_buckets=_FEAT_BUCKETS,
        salt=_FEAT_SALT,
    ).orderBy("doc_id")


Q_CLASSIFIER_SCORE_SQL = f"""
    WITH {_HASHED_FEATS_CTES},
    w AS (
        SELECT CAST(range AS INTEGER) AS bucket,
               CAST((CAST((('0x' || substr(md5('w#' || CAST(range AS VARCHAR)),
                            1, 8))::BIGINT) % 2001 AS DOUBLE) - 1000) / 1000.0
                    AS DECIMAL(20, 15)) AS w
        FROM range({_FEAT_BUCKETS})),
    dot AS (
        SELECT fc.doc_id, CAST(sum(fc.cnt) AS INTEGER) AS n_features,
               sum(COALESCE(w.w, CAST(0 AS DECIMAL(20, 15)))
                   * CAST(fc.cnt AS DECIMAL(10, 0))) AS d
        FROM fc LEFT JOIN w USING (bucket) GROUP BY fc.doc_id)
    SELECT doc_id, n_features,
           round(CAST(d AS DOUBLE), 4) + 0.0 AS logit,
           round(1.0 / (1.0 + exp(-CAST(d AS DOUBLE))), 4) AS score
    FROM dot ORDER BY doc_id
"""


def q_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (text.importance_weights, Xie et al.
    2023): log-likelihood ratio of each document's hashed-ngram
    features under a TARGET model (here: the corpus's English slice —
    the curated-reference stand-in) vs the RAW corpus model, Laplace-
    smoothed, summed exactly in decimal. High scores = "looks like the
    target distribution"; downstream selection is a threshold, top-k,
    or weighted_sample over exp(log_weight). Both model tables are
    bucket-bounded constants — broadcast joins only; the corpus pays
    one scan and two narrow aggregations (r17: ONE feature pass with
    ``lang`` carried serves the per-doc table AND the English-slice
    target model via ``bucket_model_from_counts`` — the corpus was
    previously tokenized+hashed a second time for the target)."""
    from firebolt_spark.functions import track_persisted

    docs = _documents(spark, sf_dir, spread=True)
    feats = text.hashed_ngram_counts(
        docs,
        n_buckets=_FEAT_BUCKETS,
        salt=_FEAT_SALT,
        carry_cols=("lang",),
    ).persist()
    res = text.importance_weights(
        docs,
        text.bucket_model_from_counts(feats.filter(F.col("lang") == "en")),
        n_buckets=_FEAT_BUCKETS,
        salt=_FEAT_SALT,
        feats=feats.drop("lang"),
    )
    # re-attach the operator's release handles: deriving (orderBy)
    # strips _persisted_inputs (see q_dedup_semantic's no-orderBy note)
    return track_persisted(
        res.orderBy("doc_id"),
        feats,
        *getattr(res, "_persisted_inputs", []),
    )


Q_IMPORTANCE_WEIGHTS_SQL = f"""
    WITH {_HASHED_FEATS_CTES},
    tm AS (SELECT bucket, count(*) AS t_cnt FROM fb WHERE lang = 'en'
           GROUP BY bucket),
    rm AS (SELECT bucket, count(*) AS r_cnt FROM fb GROUP BY bucket),
    tt AS (SELECT sum(t_cnt) AS t_total FROM tm),
    rt AS (SELECT sum(r_cnt) AS r_total FROM rm),
    llr AS (
        SELECT COALESCE(tm.bucket, rm.bucket) AS bucket,
               CAST(ln(CAST(COALESCE(t_cnt, 0) + 1 AS DOUBLE)
                       / CAST(t_total + {_FEAT_BUCKETS} AS DOUBLE))
                  - ln(CAST(COALESCE(r_cnt, 0) + 1 AS DOUBLE)
                       / CAST(r_total + {_FEAT_BUCKETS} AS DOUBLE))
                    AS DECIMAL(20, 15)) AS llr
        FROM tm FULL JOIN rm USING (bucket), tt, rt),
    oov AS (
        SELECT CAST(ln(CAST(1 AS DOUBLE)
                       / CAST(t_total + {_FEAT_BUCKETS} AS DOUBLE))
                  - ln(CAST(1 AS DOUBLE)
                       / CAST(r_total + {_FEAT_BUCKETS} AS DOUBLE))
                    AS DECIMAL(20, 15)) AS ollr
        FROM tt, rt)
    SELECT fc.doc_id, CAST(sum(fc.cnt) AS INTEGER) AS n_features,
           round(CAST(sum(COALESCE(llr.llr, oov.ollr)
                          * CAST(fc.cnt AS DECIMAL(10, 0))) AS DOUBLE),
                 4) + 0.0 AS log_weight
    FROM fc LEFT JOIN llr USING (bucket), oov
    GROUP BY fc.doc_id ORDER BY fc.doc_id
"""

_WSAMPLE_K = 100
_WSAMPLE_SALT = "ws1"


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling without replacement
    (functions.weighted_sample — Efraimidis & Spirakis A-Res with
    content-hash uniforms): keep k documents with probability ∝
    n_chars. The selected row SET is a pure function of (data, salt) —
    reproducible under any partitioning, retry, or engine — which
    Bernoulli/RNG sampling cannot promise; the oracle replays the
    identical ln(u)/w ranking, so the hash match certifies the exact
    sample membership. Global top-k is TakeOrdered: k rows cross the
    wire, never the corpus."""
    from firebolt_spark.functions import weighted_sample

    docs = _documents(spark, sf_dir).select("doc_id", "source", "n_chars")
    return weighted_sample(
        docs, "n_chars", _WSAMPLE_K, "doc_id", salt=_WSAMPLE_SALT
    ).orderBy("doc_id")


Q_WEIGHTED_SAMPLE_SQL = f"""
    WITH r AS (
        SELECT doc_id, source, n_chars,
               ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || '#{_WSAMPLE_SALT}'), 1, 8))::BIGINT)
                   ::DOUBLE + 0.5) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE) AS rk
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
    sel AS (SELECT doc_id, source, n_chars FROM r
            ORDER BY rk DESC, doc_id LIMIT {_WSAMPLE_K})
    SELECT * FROM sel ORDER BY doc_id
"""


_SSAMPLE_K = 30
_SSAMPLE_SALT = "strat1"


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stratum deterministic weighted sampling
    (functions.stratified_sample): within EACH language keep the k
    documents selected with probability ∝ n_chars — the quota form of
    q_weighted_sample, so no giant stratum crowds out rare languages
    in a training mix. Same content-hash A-Res ranking, so the oracle
    replays the identical per-stratum ln(u)/w top-k and the hash match
    certifies the exact per-language sample membership. The two-phase
    top-k (bucketed local phase, tiny survivor re-rank) keeps the
    per-stratum sort spread over fan_in × more tasks than the naive
    PARTITION BY lang window — the difference between tens of reducers
    and tens × fan_in at 100 TB."""
    from firebolt_spark.functions import stratified_sample

    docs = _documents(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return stratified_sample(
        docs, "lang", "n_chars", _SSAMPLE_K, "doc_id", salt=_SSAMPLE_SALT
    ).orderBy("doc_id")


Q_STRATIFIED_SAMPLE_SQL = f"""
    WITH r AS (
        SELECT doc_id, lang, source, n_chars,
               ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || '#{_SSAMPLE_SALT}'), 1, 8))::BIGINT)
                   ::DOUBLE + 0.5) / 4294967296.0)
                 / CAST(n_chars AS DOUBLE) AS rk
        FROM documents WHERE n_chars IS NOT NULL AND n_chars > 0),
    sel AS (SELECT doc_id, lang, source, n_chars,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY rk DESC, doc_id) AS rn
            FROM r)
    SELECT doc_id, lang, source, n_chars FROM sel
    WHERE rn <= {_SSAMPLE_K} ORDER BY doc_id
"""


_TBMIX_SALT = "tbm1"
_TBMIX_BUDGETS = {"en": 20000, "zh": 8000}
_TBMIX_DEFAULT = 10000


def q_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language TOKEN-budget mixture fill (mixture.token_budget_mix):
    walk each language's documents in deterministic content-hash order
    and keep a document iff the running n_chars total before it is
    still under that language's budget — the way a pretraining mix is
    actually specified (token quotas, not row quotas). The oracle
    replays the identical per-stratum ordered cumsum, so the hash
    match certifies the exact mix membership; the Spark side computes
    the cumsum in the two-phase grouped form (contiguous hash-range
    buckets + broadcast prefix offsets), never funneling a language
    through one reduce task."""
    from firebolt_spark.operators.mixture import token_budget_mix

    docs = _documents(spark, sf_dir).select(
        "doc_id", "lang", "source", "n_chars"
    )
    return token_budget_mix(
        docs,
        "lang",
        _TBMIX_BUDGETS,
        "n_chars",
        "doc_id",
        salt=_TBMIX_SALT,
        default_budget=_TBMIX_DEFAULT,
    ).orderBy("doc_id")


Q_TOKEN_BUDGET_MIX_SQL = f"""
    WITH r AS (
        SELECT doc_id, lang, source, n_chars,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                   || '#{_TBMIX_SALT}'), 1, 8))::BIGINT) AS u
        FROM documents WHERE n_chars IS NOT NULL AND n_chars >= 0),
    c AS (
        SELECT doc_id, lang, source, n_chars,
               sum(n_chars) OVER (PARTITION BY lang ORDER BY u, doc_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS cum
        FROM r)
    SELECT doc_id, lang, source, n_chars FROM c
    WHERE cum - n_chars < CASE lang
                            WHEN 'en' THEN {_TBMIX_BUDGETS["en"]}
                            WHEN 'zh' THEN {_TBMIX_BUDGETS["zh"]}
                            ELSE {_TBMIX_DEFAULT} END
    ORDER BY doc_id
"""


_KMV_K = 64
_KMV_SALT = "kmv1"


def q_distinct_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language KMV distinct-count sketch (functions.kmv_sketch):
    the k smallest distinct 48-bit content hashes of doc_id per
    language, plus the standard (k-1)·2^48/h_k estimate — the bounded-
    state, MERGEABLE corpus-stats primitive (per-shard sketch tables
    roll up via kmv_merge without re-touching data; merge == one-shot
    is pytest-pinned). Content-hashed, so the oracle replays the
    identical sketch and the hash match certifies sketch membership
    AND the estimate arithmetic; the fixture's languages exceed k, so
    the ESTIMATOR path is what's being certified, not the exact
    fallback."""
    from firebolt_spark.functions import kmv_estimate, kmv_sketch

    docs = _documents(spark, sf_dir)
    sk = kmv_sketch(
        docs, "doc_id", k=_KMV_K, group_cols=["lang"], salt=_KMV_SALT
    )
    return (
        sk.select(
            "lang",
            F.size("kmv").alias("n_sketch"),
            # k_col makes the estimate self-validating against the
            # sketch's stored build k (r12 — ADVICE r11 enforcement)
            F.round(
                kmv_estimate("kmv", _KMV_K, k_col="kmv_k"), 4
            ).alias("distinct_est"),
        )
        .orderBy("lang")
    )


Q_DISTINCT_SKETCH_SQL = f"""
    WITH h AS (
        SELECT DISTINCT lang,
               (('0x' || substr(md5(coalesce(CAST(doc_id AS VARCHAR), chr(0))
                                   || '#{_KMV_SALT}'), 1, 12))::BIGINT) AS hv
        FROM documents),
    r AS (SELECT lang, hv,
                 row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
          FROM h),
    s AS (SELECT lang,
                 count(*) FILTER (WHERE rn <= {_KMV_K}) AS n_sketch,
                 max(hv) FILTER (WHERE rn <= {_KMV_K}) AS hk,
                 count(*) AS n_distinct
          FROM r GROUP BY lang)
    SELECT lang, CAST(n_sketch AS INT) AS n_sketch,
           round(CASE WHEN n_distinct < {_KMV_K}
                      THEN CAST(n_distinct AS DOUBLE)
                      ELSE {_KMV_K - 1} * 281474976710656.0
                           / CAST(hk AS DOUBLE) END, 4) AS distinct_est
    FROM s ORDER BY lang
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff (functions.snapshot_diff): which doc_ids
    were added / removed / changed between two snapshot versions —
    the ingest-loop audit and the touch-only-the-delta input to every
    reindex/re-dedup decision. The two snapshots are derived
    deterministically from the fixture (old drops doc_id%7==0 and
    carries a ' [v1]' text suffix on doc_id%5==0; new drops
    doc_id%11==3), so the oracle rebuilds both sides and replays the
    identical digest full-outer join. Text never crosses the shuffle:
    each side reduces to (key, md5 digest) before the ONE equi-join a
    snapshot comparison minimally needs."""
    from firebolt_spark.functions import snapshot_diff

    docs = _documents(spark, sf_dir).select("doc_id", "text")
    old = docs.filter(F.col("doc_id") % 7 != 0).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [v1]"))
        ).otherwise(F.col("text")),
    )
    new = docs.filter(F.col("doc_id") % 11 != 3)
    return snapshot_diff(old, new, ["doc_id"], ["text"]).orderBy("doc_id")


Q_SNAPSHOT_DIFF_SQL = """
    WITH old AS (
        SELECT doc_id,
               md5(coalesce(CASE WHEN doc_id % 5 = 0
                                 THEN text || ' [v1]' ELSE text END,
                            chr(0))) AS sig
        FROM documents WHERE doc_id % 7 <> 0),
    new AS (
        SELECT doc_id, md5(coalesce(text, chr(0))) AS sig
        FROM documents WHERE doc_id % 11 <> 3),
    d AS (
        SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
               CASE WHEN old.sig IS NULL THEN 'added'
                    WHEN new.sig IS NULL THEN 'removed'
                    WHEN old.sig <> new.sig THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id)
    SELECT doc_id, status FROM d WHERE status <> 'unchanged'
    ORDER BY doc_id
"""


_FREQ_K = 8


def q_frequent_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-k tokens (functions.frequent_items): the exact
    heavy-hitters readout of a corpus profile — explode whitespace
    tokens, count per (lang, token), keep each language's k most
    frequent (ties by token). Counting partial-aggregates map-side;
    the top-k runs the same two-phase bucketed form as
    stratified_sample, so no language's token histogram funnels
    through one reduce task. The oracle replays the count + ranked
    window exactly."""
    from firebolt_spark.functions import frequent_items

    docs = _documents(spark, sf_dir)
    toks = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    return frequent_items(
        toks, "token", k=_FREQ_K, group_cols=["lang"]
    ).orderBy("lang", F.col("cnt").desc(), "token")


Q_FREQUENT_ITEMS_SQL = f"""
    WITH t AS (
        SELECT lang, unnest(string_split(trim(text), ' ')) AS token
        FROM documents),
    c AS (
        SELECT lang, token, count(*) AS cnt FROM t
        WHERE token <> '' GROUP BY lang, token),
    r AS (
        SELECT lang, token, cnt,
               row_number() OVER (PARTITION BY lang
                                  ORDER BY cnt DESC, token) AS rn
        FROM c)
    SELECT lang, token, cnt FROM r WHERE rn <= {_FREQ_K}
    ORDER BY lang, cnt DESC, token
"""


_ILV_SALT = "ilv1"


def q_interleave_strata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-interleaved training order (mixture.interleave_strata):
    every document gets its 1-based position within its language
    along the deterministic hash order — writing shards sorted by
    (interleave_rank, lang) spreads every domain evenly through the
    epoch instead of concatenating domain-sized clumps. The rank is a
    pure function of (data, salt); the oracle replays the identical
    per-stratum row_number, certifying the exact training order. The
    Spark side computes it via the two-phase grouped cumsum-of-ones
    (no language-sized window funnel)."""
    from firebolt_spark.operators.mixture import interleave_strata

    docs = _documents(spark, sf_dir).select("doc_id", "lang")
    return interleave_strata(
        docs, "lang", "doc_id", salt=_ILV_SALT
    ).orderBy("doc_id")


Q_INTERLEAVE_STRATA_SQL = f"""
    WITH r AS (
        SELECT doc_id, lang,
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                   || '#{_ILV_SALT}'), 1, 8))::BIGINT) AS u
        FROM documents)
    SELECT doc_id, lang,
           row_number() OVER (PARTITION BY lang
                              ORDER BY u, doc_id) AS interleave_rank
    FROM r ORDER BY doc_id
"""


def q_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The corpus-stats stage as ONE composed profile table: per
    language — document count, total chars, the KMV distinct-doc
    estimate (the sketch the 100 TB path maintains per shard and
    merges, exercised here on its estimator branch), and the most
    frequent token with its count (frequent_items k=1). Three small
    per-language aggregates broadcast-joined on lang: the corpus pays
    one scan per statistic family and the joins never shuffle it. One
    oracle certifies the whole profile — counts, sketch arithmetic,
    and heavy-hitter tie-breaks together."""
    from firebolt_spark.functions import (
        frequent_items, kmv_estimate, kmv_sketch,
    )

    docs = _documents(spark, sf_dir)
    base = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )
    sk = kmv_sketch(
        docs, "doc_id", k=_KMV_K, group_cols=["lang"], salt=_KMV_SALT
    ).select(
        "lang",
        F.round(
            kmv_estimate("kmv", _KMV_K, k_col="kmv_k"), 4
        ).alias("distinct_est"),
    )
    toks = docs.select(
        "lang",
        F.explode(F.split(F.trim(F.col("text")), " ")).alias("token"),
    ).filter(F.col("token") != "")
    top = frequent_items(toks, "token", k=1, group_cols=["lang"]).select(
        "lang",
        F.col("token").alias("top_token"),
        F.col("cnt").alias("top_token_cnt"),
    )
    return (
        base.join(F.broadcast(sk), "lang")
        .join(F.broadcast(top), "lang")
        .orderBy("lang")
    )


Q_CORPUS_PROFILE_SQL = f"""
    WITH base AS (
        SELECT lang, count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents GROUP BY lang),
    h AS (
        SELECT DISTINCT lang,
               (('0x' || substr(md5(coalesce(CAST(doc_id AS VARCHAR), chr(0))
                                   || '#{_KMV_SALT}'), 1, 12))::BIGINT) AS hv
        FROM documents),
    r AS (SELECT lang, hv,
                 row_number() OVER (PARTITION BY lang ORDER BY hv) AS rn
          FROM h),
    s AS (SELECT lang,
                 max(hv) FILTER (WHERE rn <= {_KMV_K}) AS hk,
                 count(*) AS n_distinct
          FROM r GROUP BY lang),
    est AS (SELECT lang,
                   round(CASE WHEN n_distinct < {_KMV_K}
                              THEN CAST(n_distinct AS DOUBLE)
                              ELSE {_KMV_K - 1} * 281474976710656.0
                                   / CAST(hk AS DOUBLE) END,
                         4) AS distinct_est
            FROM s),
    t AS (SELECT lang, unnest(string_split(trim(text), ' ')) AS token
          FROM documents),
    c AS (SELECT lang, token, count(*) AS cnt FROM t
          WHERE token <> '' GROUP BY lang, token),
    tr AS (SELECT lang, token, cnt,
                  row_number() OVER (PARTITION BY lang
                                     ORDER BY cnt DESC, token) AS rn
           FROM c),
    top AS (SELECT lang, token AS top_token, cnt AS top_token_cnt
            FROM tr WHERE rn = 1)
    SELECT base.lang, n_docs, total_chars, distinct_est,
           top_token, top_token_cnt
    FROM base JOIN est ON base.lang = est.lang
    JOIN top ON base.lang = top.lang
    ORDER BY base.lang
"""


_QUANTILE_QS = [0.25, 0.5, 0.75, 0.9]


def _c4_fabricate(docs: DataFrame) -> DataFrame:
    """Deterministic multi-line page fabrication shared by the two C4
    queries: six lines per doc, each exercising one cleaning rule (the
    fixture corpus is single-line). Mirrored verbatim by _C4_FAB_SQL."""
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(
                F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 40),
                F.lit(" alpha beta gamma."),
            ),
            F.lit("too short."),
            F.lit("you must enable JavaScript to continue."),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit("config = { a: 1 }")
            ).otherwise(
                F.substring(F.coalesce(F.col("text"), F.lit("")), 1, 25)
            ),
            F.when(
                F.col("doc_id") % 2 == 0,
                F.lit("the quick brown fox jumps over the lazy dog today!"),
            ).otherwise(F.lit("word word word word word?")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.lit("another well formed sentence with plenty of words here."),
            ).otherwise(F.lit("three words only")),
        ).alias("text"),
    )


def q_c4_line_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line + page cleaning (text.c4_line_filter, Raffel et
    al. 2020 SS2.2, round 12) over deterministically fabricated
    multi-line pages (the fixture corpus is single-line): each doc gets
    six lines exercising every rule — a passing sentence, a too-short
    line, a javascript-boilerplate line, an unpunctuated (or, every 7th
    doc, curly-brace code) line, and two parity-dependent lines that
    decide whether the page reaches the 3-kept-line floor. The oracle
    replays split -> list_filter -> rejoin, certifying the surviving
    text byte-for-byte plus the page keep decision."""
    return text.c4_line_filter(_c4_fabricate(_documents(spark, sf_dir)))


_C4_FAB_SQL = """
        SELECT doc_id,
               concat_ws(chr(10),
                   concat(substr(coalesce(text, ''), 1, 40),
                          ' alpha beta gamma.'),
                   'too short.',
                   'you must enable JavaScript to continue.',
                   CASE WHEN doc_id % 7 = 0 THEN 'config = { a: 1 }'
                        ELSE substr(coalesce(text, ''), 1, 25) END,
                   CASE WHEN doc_id % 2 = 0
                        THEN 'the quick brown fox jumps over the lazy dog today!'
                        ELSE 'word word word word word?' END,
                   CASE WHEN doc_id % 3 = 0
                        THEN 'another well formed sentence with plenty of words here.'
                        ELSE 'three words only' END
               ) AS t
        FROM documents
"""

Q_C4_LINE_FILTER_SQL = f"""
    WITH fab AS ({_C4_FAB_SQL}),
    f AS (
        SELECT doc_id, t,
               string_split(t, chr(10)) AS ls,
               list_filter(string_split(t, chr(10)),
                   x -> regexp_matches(trim(x), '[.!?"]$')
                        AND len(string_split_regex(trim(x), ' +')) >= 5
                        AND NOT contains(lower(x), 'javascript')) AS kept
        FROM fab)
    SELECT doc_id,
           CAST(len(ls) AS INT) AS n_lines,
           CAST(len(kept) AS INT) AS n_kept,
           array_to_string(kept, chr(10)) AS text_clean,
           CASE WHEN NOT contains(t, '{{') AND len(kept) >= 3
                THEN 1 ELSE 0 END AS keep
    FROM f
"""


def q_c4_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The C4 cleaning pipeline COMPOSED (round 12): rule-based line /
    page filtering (c4_line_filter) feeding corpus-wide line dedup
    (dedup_lines) — the order Raffel et al. 2020 §2.2 ran them. Pages
    that fail the gates never reach the dedup; the fabricated
    parity-dependent lines are identical ACROSS surviving pages, so
    the keep-first dedup visibly strips them from every page but the
    first. One declarative plan: the filter is scan-only, the dedup
    adds its one narrow line-digest shuffle; the corpus crosses the
    wire once. The oracle replays filter → page gate → split → md5 →
    keep-first → rebuild, certifying the final text byte-for-byte."""
    cleaned = text.c4_line_filter(_c4_fabricate(_documents(spark, sf_dir)))
    kept_pages = cleaned.filter(F.col("keep") == 1).select(
        "doc_id", F.col("text_clean").alias("text")
    )
    return dedup.dedup_lines(kept_pages).orderBy("doc_id")


Q_C4_PIPELINE_SQL = f"""
    WITH fab AS ({_C4_FAB_SQL}),
    f AS (
        SELECT doc_id, t,
               list_filter(string_split(t, chr(10)),
                   x -> regexp_matches(trim(x), '[.!?"]$')
                        AND len(string_split_regex(trim(x), ' +')) >= 5
                        AND NOT contains(lower(x), 'javascript')) AS kept
        FROM fab),
    pages AS (
        SELECT doc_id, array_to_string(kept, chr(10)) AS text
        FROM f
        WHERE NOT contains(t, '{{') AND len(kept) >= 3),
    base AS (
        SELECT doc_id, string_split(coalesce(text, ''), chr(10)) AS ls
        FROM pages),
    lines AS (
        SELECT doc_id,
               unnest(range(0, len(ls))) AS pos,
               unnest(ls) AS line
        FROM base),
    keep AS (
        SELECT doc_id, pos, line FROM (
            SELECT doc_id, pos, line,
                   row_number() OVER (PARTITION BY md5(line)
                                      ORDER BY doc_id, pos) AS rk
            FROM lines WHERE length(trim(line)) >= 1)
        WHERE rk = 1
        UNION ALL
        SELECT doc_id, pos, line FROM lines WHERE length(trim(line)) < 1),
    agg AS (
        SELECT doc_id, count(*) AS n_kept,
               string_agg(line, chr(10) ORDER BY pos) AS text_dedup
        FROM keep GROUP BY doc_id)
    SELECT b.doc_id, CAST(len(b.ls) AS INT) AS n_lines,
           CAST(coalesce(a.n_kept, 0) AS INT) AS n_kept,
           coalesce(a.text_dedup, '') AS text_dedup
    FROM base b LEFT JOIN agg a USING (doc_id)
    ORDER BY b.doc_id
"""


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing end-to-end (text.redact, round 12 — the operator
    had only pytest coverage): emails / phones / IPv4s / SSNs are
    seeded deterministically into the fixture text by doc_id parity,
    then redacted to typed tags with per-class counts. The redaction
    is a sequential regexp_replace chain, so the oracle replays the
    SAME pattern order with DuckDB's 'g' flag; counts mirror via
    regexp-split length (text coalesced to '' first — Spark's
    size(NULL) legacy -1 vs DuckDB NULL would diverge)."""
    docs = _documents(spark, sf_dir)
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.coalesce(F.col("text"), F.lit("")),
            F.when(
                F.col("doc_id") % 3 == 0,
                F.concat(
                    F.lit(" contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.com or admin@test.org"),
                ),
            )
            .when(
                F.col("doc_id") % 3 == 1,
                F.concat(
                    F.lit(" call 555-123-"),
                    F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
                    F.lit(" from 10.0.0.1"),
                ),
            )
            .otherwise(F.lit(" ssn 123-45-6789 backup 987-65-4321")),
        ).alias("text"),
    )
    out = text.redact(seeded)
    return out.select(
        "doc_id", "text_redacted", "n_email", "n_phone", "n_ipv4", "n_ssn"
    )


_PII_SEED_SQL = """
        SELECT doc_id,
               concat(coalesce(text, ''),
                   CASE WHEN doc_id % 3 = 0
                        THEN concat(' contact user', CAST(doc_id AS VARCHAR),
                                    '@example.com or admin@test.org')
                        WHEN doc_id % 3 = 1
                        THEN concat(' call 555-123-',
                                    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0'),
                                    ' from 10.0.0.1')
                        ELSE ' ssn 123-45-6789 backup 987-65-4321' END
               ) AS t
        FROM documents
"""

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\+?\d{1,3}[-. ]?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}"
_PII_IPV4 = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
_PII_SSN = r"\b\d{3}-\d{2}-\d{4}\b"

Q_PII_REDACT_SQL = f"""
    WITH seeded AS ({_PII_SEED_SQL}),
    r AS (
        SELECT doc_id, t,
               regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
        FROM seeded),
    r2 AS (
        SELECT doc_id, t, t1,
               regexp_replace(t1, '{_PII_PHONE}', '<PHONE>', 'g') AS t2
        FROM r),
    r3 AS (
        SELECT doc_id, t, t1, t2,
               regexp_replace(t2, '{_PII_IPV4}', '<IPV4>', 'g') AS t3
        FROM r2)
    SELECT doc_id,
           regexp_replace(t3, '{_PII_SSN}', '<SSN>', 'g') AS text_redacted,
           CAST(len(regexp_split_to_array(t, '{_PII_EMAIL}')) - 1 AS INT)
               AS n_email,
           CAST(len(regexp_split_to_array(t1, '{_PII_PHONE}')) - 1 AS INT)
               AS n_phone,
           CAST(len(regexp_split_to_array(t2, '{_PII_IPV4}')) - 1 AS INT)
               AS n_ipv4,
           CAST(len(regexp_split_to_array(t3, '{_PII_SSN}')) - 1 AS INT)
               AS n_ssn
    FROM r3
"""


def q_corpus_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT per-(language, source) n_chars quantiles (round 12 —
    VERDICT r11 Next #5): the length-distribution readout
    q_corpus_profile lacked, via functions.group_quantiles — a value
    histogram, ONE range-partitioned global cumsum turned per-group by
    broadcast start offsets, and bracketing-rank selection against a
    broadcast target table. No SinglePartition window (plan-pinned),
    no percentile_approx nondeterminism, no Spark exact-percentile
    per-group buffering — which is why DuckDB's quantile_cont /
    quantile_disc can oracle it bit-for-bit, q = 0.25/0.5/0.75/0.9,
    interpolated and discrete forms both."""
    from firebolt_spark.functions import group_quantiles

    return group_quantiles(
        _documents(spark, sf_dir), "n_chars", _QUANTILE_QS,
        ["lang", "source"],
    )


Q_CORPUS_QUANTILES_SQL = f"""
    WITH agg AS (
        SELECT lang, source, count(*) AS n,
               quantile_cont(n_chars, {_QUANTILE_QS}) AS qc,
               quantile_disc(n_chars, {_QUANTILE_QS}) AS qd
        FROM documents
        WHERE n_chars IS NOT NULL
        GROUP BY lang, source)
    SELECT lang, source,
           unnest({_QUANTILE_QS}::DOUBLE[]) AS q,
           n,
           round(unnest(qc), 6) AS quantile_cont,
           unnest(qd) AS quantile_disc
    FROM agg
"""


_QSK_K = 64
_QSK_QS = [0.25, 0.5, 0.9]


def q_quantile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bounded-state quantile sketch readout (round 13 —
    VERDICT r12 Next #6): per-language n_chars quantile ESTIMATES off
    functions.quantile_sketch, the deterministic bottom-k rank sample
    that is the streaming/rollup counterpart of the exact
    q_corpus_quantiles. The build is shard-merge-exact and
    content-hashed (no RNG), so DuckDB replays the whole path — the
    md5-prefix sampling lottery, the min-v collision rule, the k
    smallest tickets, and the sample's quantile_cont / quantile_disc
    readout — bit-for-bit."""
    from firebolt_spark.functions import (
        quantile_sketch, quantile_sketch_quantiles,
    )

    sk = quantile_sketch(
        _documents(spark, sf_dir), "n_chars", "doc_id",
        k=_QSK_K, group_cols=["lang"], salt="qs",
    )
    return quantile_sketch_quantiles(
        sk, _QSK_QS, group_cols=["lang"]
    ).orderBy("lang", "q")


Q_QUANTILE_SKETCH_SQL = f"""
    WITH h AS (
        SELECT lang,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#qs'),
                               1, 12))::BIGINT AS h,
               CAST(n_chars AS DOUBLE) AS v
        FROM documents
        WHERE n_chars IS NOT NULL),
    hd AS (SELECT lang, h, min(v) AS v FROM h GROUP BY lang, h),
    k AS (SELECT lang, h, v FROM hd
          QUALIFY row_number() OVER (PARTITION BY lang ORDER BY h)
                  <= {_QSK_K}),
    agg AS (
        SELECT lang, count(*) AS n_sampled,
               quantile_cont(v, {_QSK_QS}) AS qc,
               quantile_disc(v, {_QSK_QS}) AS qd
        FROM k GROUP BY lang)
    SELECT lang,
           unnest({_QSK_QS}::DOUBLE[]) AS q,
           n_sampled,
           round(unnest(qc), 6) AS est_cont,
           unnest(qd) AS est_disc
    FROM agg
    ORDER BY lang, q
"""


_PSK_K = 16
_PSK_SALT = "ps13"


def q_priority_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable weighted-sample sketch readout (round 13, beyond the
    verdict list): per-source total n_chars ESTIMATES off
    functions.priority_sketch — priority sampling (Duffield, Lund &
    Thorup 2007), the subset-sum counterpart of the KMV and bottom-k
    rank sketches. The query drives the MERGE path end-to-end: three
    doc_id-sharded sketches roll up through priority_sketch_merge
    (bit-equal to one-shot — pytest-pinned, so the oracle replays the
    one-shot lottery), then the DLT estimator sum(max(w, tau)) reads
    totals beside the exact sums it estimates. Content-hashed priority
    lottery (w·2^48/(h+1), no RNG), so DuckDB replays the priorities,
    the (k+1)-th-priority tau, and the estimate bit-for-bit; at k=16
    every fixture source (25 docs) exercises the ESTIMATOR path, not
    the exact fallback."""
    from firebolt_spark.functions import (
        priority_sketch,
        priority_sketch_merge,
        priority_sketch_totals,
    )

    docs = _documents(spark, sf_dir)
    # the three doc_id shards are built in ONE grouped pass (r17):
    # sketching with the shard id as an extra group key partitions the
    # rows exactly as three filtered builds would (each doc is in
    # exactly one shard), so the per-(source, shard) sketch rows —
    # sample, tau, metadata — are bit-identical to the former
    # filter-per-shard unionByName, while the corpus is scanned once
    # instead of three times and the plan is built once instead of
    # three times. The merge path is exercised unchanged: it still
    # rolls 3 independent shard sketches per source up to the one-shot
    # sketch.
    shards = priority_sketch(
        docs.withColumn("_shard", F.col("doc_id") % 3),
        "n_chars",
        "doc_id",
        k=_PSK_K,
        group_cols=["source", "_shard"],
        salt=_PSK_SALT,
    ).drop("_shard")
    merged = priority_sketch_merge(
        shards,
        "psk",
        k=_PSK_K,
        group_cols=["source"],
    )
    totals = priority_sketch_totals(merged, "psk", group_cols=["source"])
    w = F.col("n_chars").cast("double")
    exact = (
        docs.filter(w.isNotNull() & ~F.isnan(w) & (w > 0))
        .groupBy("source")
        .agg(F.round(F.sum(w), 6).alias("exact_total_weight"))
    )
    return totals.join(exact, "source").orderBy("source")


Q_PRIORITY_SKETCH_SQL = f"""
    WITH h AS (
        SELECT source,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                   || '#{_PSK_SALT}'), 1, 12))::BIGINT AS h,
               CAST(n_chars AS DOUBLE) AS w
        FROM documents
        WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0),
    hd AS (SELECT source, h, max(w) AS w FROM h GROUP BY source, h),
    p AS (SELECT source, h, w,
                 (w * 281474976710656.0) / (CAST(h AS DOUBLE) + 1.0) AS p
          FROM hd),
    r AS (SELECT *, row_number() OVER (PARTITION BY source
                                       ORDER BY p DESC, h DESC) AS rn
          FROM p),
    t AS (SELECT source,
                 coalesce(max(CASE WHEN rn = {_PSK_K + 1} THEN p END),
                          0.0) AS tau,
                 count(*) FILTER (WHERE rn <= {_PSK_K}) AS n_sampled
          FROM r GROUP BY source),
    est AS (SELECT r.source,
                   round(sum(greatest(r.w, t.tau)), 6) AS est_total_weight
            FROM r JOIN t USING (source)
            WHERE r.rn <= {_PSK_K}
            GROUP BY r.source),
    ex AS (SELECT source,
                  round(sum(CAST(n_chars AS DOUBLE)), 6)
                      AS exact_total_weight
           FROM documents
           WHERE n_chars IS NOT NULL AND CAST(n_chars AS DOUBLE) > 0
           GROUP BY source)
    SELECT t.source,
           CAST(t.n_sampled AS BIGINT) AS n_sampled,
           round(t.tau, 6) AS tau,
           est.est_total_weight,
           ex.exact_total_weight
    FROM t JOIN est USING (source) JOIN ex USING (source)
    ORDER BY source
"""


# ---- composed quality selection -------------------------------------------

_QSEL_MIN_WORDS = 20
_QSEL_MAX_DUP = 0.6
_QSEL_TAU = 0.5
_QSEL_K = 25
_QSEL_SALT = "qsel"


def q_quality_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed data-selection stage end-to-end — the pipeline a
    training-data run would actually execute: Gopher gate (keep=1,
    text carried through via ``include`` so NO corpus re-join) →
    fastText-style classifier score ≥ τ → DSIR importance weights over
    the gated set (target = its English slice) → deterministic A-Res
    sample of k docs ∝ exp(log_weight). One oracle certifies the whole
    chain: gate signals, both models, the decimal sums, the score
    filter, and the exact sample membership. The gate + feature-hash
    chain runs ONCE (r17): its narrow (doc, lang, bucket, cnt) output
    — features, never text, so NOT corpus-sized — is persisted and
    serves the classifier, the DSIR per-doc sum, and the DSIR target
    model; the two narrow (doc, score/weight) tables join on the doc
    key. Gate thresholds are the fixture-adapted ones (min_words=20,
    dup ≤ 0.6 — see q_gopher_quality's rationale)."""
    from firebolt_spark.functions import weighted_sample

    docs = _documents(spark, sf_dir, spread=True)
    gated = (
        text.gopher_quality(
            docs,
            include=("text", "lang"),
            min_words=_QSEL_MIN_WORDS,
            max_dup_word_frac=_QSEL_MAX_DUP,
        )
        .filter("keep = 1")
        .select("doc_id", "text", "lang")
    )
    from firebolt_spark.functions import track_persisted

    # ONE gate execution + ONE feature pass serve all three consumers
    # (classifier dot product, DSIR per-doc sum, DSIR target model):
    # the narrow (doc, lang, bucket, cnt) table is persisted; before
    # r17 the gopher gate + tokenize + md5-hash chain ran once PER
    # consumer (3 full corpus passes). Decimal sums keep every output
    # bit-identical.
    feats = text.hashed_ngram_counts(
        gated,
        n_buckets=_FEAT_BUCKETS,
        salt=_FEAT_SALT,
        carry_cols=("lang",),
    ).persist()
    fcore = feats.drop("lang")
    # FUSED scoring (r17): the classifier dot product and the DSIR
    # per-doc sum previously ran as two separate groupBy(doc_id)
    # aggregations over the same feature table, joined back on doc_id —
    # two feats passes, two shuffles, one join. Both are left-joins of
    # feats against a bucket-bounded broadcast table followed by an
    # exact decimal sum, so ONE combined (bucket, _w, _llr) broadcast
    # and ONE aggregate computes both columns; every expression below
    # (decimal quantization, coalesce fallbacks, round/sigmoid, the
    # canonical-zero + 0.0) is copied verbatim from classifier_score /
    # importance_weights, so scores and weights are bit-identical —
    # certified by the unchanged oracle.
    wdec = _pseudo_weights(spark, _FEAT_BUCKETS).select(
        F.col("bucket").cast("int").alias("bucket"),
        F.col("weight").cast("double").cast("decimal(20,15)").alias("_w"),
    )
    target_model = text.bucket_model_from_counts(
        feats.filter(F.col("lang") == "en")
    ).persist()
    raw_model = text.bucket_model_from_counts(fcore).persist()
    llr_tbl, oov = text.dsir_llr_tables(
        target_model, raw_model, _FEAT_BUCKETS
    )
    # wdec LEFT JOIN llr_tbl: equivalence with the two-pass form
    # requires wdec to be DENSE over [0, n_buckets) — _pseudo_weights
    # enumerates every bucket by construction, so no llr row is
    # dropped. A sparse real-world weight table would need a full
    # outer join (coalescing _w to the zero decimal) instead, or
    # uncovered buckets' _llr would silently collapse to the OOV
    # constant (ADVICE r17 #3).
    combined = F.broadcast(wdec.join(llr_tbl, "bucket", "left"))
    zero = F.lit(0).cast("decimal(20,15)")
    cnt_dec = F.col("cnt").cast("decimal(10,0)")
    per_doc = (
        fcore.join(combined, "bucket", "left")
        .crossJoin(F.broadcast(oov))
        .groupBy("doc_id")
        .agg(
            F.sum(F.coalesce(F.col("_w"), zero) * cnt_dec).alias("_dot"),
            F.sum(
                F.coalesce(F.col("_llr"), F.col("_oov_llr")) * cnt_dec
            ).alias("_dsum"),
        )
    )
    logit = F.lit(0.0) + F.col("_dot").cast("double")
    pool = (
        per_doc.select(
            "doc_id",
            F.round(
                F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 4
            ).alias("score"),
            (F.round(F.col("_dsum").cast("double"), 4) + F.lit(0.0)).alias(
                "log_weight"
            ),
        )
        .filter(F.col("score") >= _QSEL_TAU)
        .withColumn("w", F.exp(F.col("log_weight")))
    )
    return track_persisted(
        weighted_sample(pool, "w", _QSEL_K, "doc_id", salt=_QSEL_SALT)
        .select("doc_id", "score", "log_weight")
        .orderBy("doc_id"),
        feats,
        target_model,
        raw_model,
    )


_QSEL_GATE_SQL = f"""
    gbase AS (SELECT doc_id, text, lang,
                     string_split(trim(text), ' ') AS gw
              FROM documents),
    gsized AS (SELECT doc_id, text, lang, gw, len(gw) AS gn,
                      len(list_distinct(gw)) AS gnd
               FROM gbase),
    gbg AS (SELECT doc_id,
                   unnest(list_transform(range(1, len(gw)),
                          i -> gw[i] || ' ' || gw[i + 1])) AS bigram
            FROM gsized WHERE len(gw) >= 2),
    gtop AS (SELECT doc_id, max(cnt) AS top_cnt
             FROM (SELECT doc_id, bigram, count(*) AS cnt
                   FROM gbg GROUP BY doc_id, bigram)
             GROUP BY doc_id),
    gated AS MATERIALIZED (
        SELECT s.doc_id, s.text, s.lang
        FROM gsized s LEFT JOIN gtop t USING (doc_id)
        WHERE s.text IS NOT NULL
          AND s.gn BETWEEN {_QSEL_MIN_WORDS} AND 100000
          AND round(CAST(length(replace(trim(s.text), ' ', '')) AS DOUBLE)
                    / s.gn, 4) BETWEEN 3.0 AND 10.0
          AND round(CAST(len(list_filter(s.gw,
                     x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE)
                    / s.gn, 4) >= 0.8
          AND ({_GOPHER_STOPS}) >= 2
          AND round(CASE WHEN s.gn > 0
                         THEN CAST(s.gn - s.gnd AS DOUBLE) / s.gn
                         ELSE 0.0 END, 4) <= {_QSEL_MAX_DUP}
          AND round(CASE WHEN s.gn >= 2
                         THEN CAST(COALESCE(t.top_cnt, 0) AS DOUBLE)
                              / (s.gn - 1)
                         ELSE 0.0 END, 4) <= 0.2)"""

Q_QUALITY_SELECTION_SQL = f"""
    WITH {_QSEL_GATE_SQL},
    {_hashed_feats_ctes("gated", materialized=True)},
    w AS (
        SELECT CAST(range AS INTEGER) AS bucket,
               CAST((CAST((('0x' || substr(md5('w#' || CAST(range AS VARCHAR)),
                            1, 8))::BIGINT) % 2001 AS DOUBLE) - 1000) / 1000.0
                    AS DECIMAL(20, 15)) AS w
        FROM range({_FEAT_BUCKETS})),
    dot AS (
        SELECT fc.doc_id,
               sum(COALESCE(w.w, CAST(0 AS DECIMAL(20, 15)))
                   * CAST(fc.cnt AS DECIMAL(10, 0))) AS d
        FROM fc LEFT JOIN w USING (bucket) GROUP BY fc.doc_id),
    scores AS (
        SELECT doc_id,
               round(1.0 / (1.0 + exp(-CAST(d AS DOUBLE))), 4) AS score
        FROM dot),
    tm AS (SELECT bucket, count(*) AS t_cnt FROM fb WHERE lang = 'en'
           GROUP BY bucket),
    rm AS (SELECT bucket, count(*) AS r_cnt FROM fb GROUP BY bucket),
    tt AS (SELECT sum(t_cnt) AS t_total FROM tm),
    rt AS (SELECT sum(r_cnt) AS r_total FROM rm),
    llr AS (
        SELECT COALESCE(tm.bucket, rm.bucket) AS bucket,
               CAST(ln(CAST(COALESCE(t_cnt, 0) + 1 AS DOUBLE)
                       / CAST(t_total + {_FEAT_BUCKETS} AS DOUBLE))
                  - ln(CAST(COALESCE(r_cnt, 0) + 1 AS DOUBLE)
                       / CAST(r_total + {_FEAT_BUCKETS} AS DOUBLE))
                    AS DECIMAL(20, 15)) AS llr
        FROM tm FULL JOIN rm USING (bucket), tt, rt),
    oov AS (
        SELECT CAST(ln(CAST(1 AS DOUBLE)
                       / CAST(t_total + {_FEAT_BUCKETS} AS DOUBLE))
                  - ln(CAST(1 AS DOUBLE)
                       / CAST(r_total + {_FEAT_BUCKETS} AS DOUBLE))
                    AS DECIMAL(20, 15)) AS ollr
        FROM tt, rt),
    wts AS (
        SELECT fc.doc_id,
               round(CAST(sum(COALESCE(llr.llr, oov.ollr)
                              * CAST(fc.cnt AS DECIMAL(10, 0))) AS DOUBLE),
                     4) + 0.0 AS log_weight
        FROM fc LEFT JOIN llr USING (bucket), oov
        GROUP BY fc.doc_id),
    pool AS (
        SELECT s.doc_id, s.score, wt.log_weight, exp(wt.log_weight) AS wgt
        FROM scores s JOIN wts wt USING (doc_id)
        WHERE s.score >= {_QSEL_TAU}),
    ranked AS (
        SELECT doc_id, score, log_weight,
               ln(((('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || '#{_QSEL_SALT}'), 1, 8))::BIGINT)
                   ::DOUBLE + 0.5) / 4294967296.0) / wgt AS rk
        FROM pool),
    sel AS (SELECT doc_id, score, log_weight FROM ranked
            ORDER BY rk DESC, doc_id LIMIT {_QSEL_K})
    SELECT * FROM sel ORDER BY doc_id
"""


QUERIES = {
    "q_dedup_exact": q_dedup_exact,
    "q_dedup_minhash": q_dedup_minhash,
    "q_dedup_clusters": q_dedup_clusters,
    "q_dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "q_dedup_simhash": q_dedup_simhash,
    "q_dedup_simhash_pairs": q_dedup_simhash_pairs,
    "q_dedup_embedding": q_dedup_embedding,
    "q_corpus_curation": q_corpus_curation,
    "q_shard_packing": q_shard_packing,
    "q_sequence_pack": q_sequence_pack,
    "q_sequence_texts": q_sequence_texts,
    "q_sequence_materialize": q_sequence_materialize,
    "q_text_normalize": q_text_normalize,
    "q_dedup_incremental": q_dedup_incremental,
    "q_dedup_incremental_indexed": q_dedup_incremental_indexed,
    "q_similarity_bruteforce": q_similarity_bruteforce,
    "q_similarity_ann_lsh": q_similarity_ann_lsh,
    "q_similarity_ann_ivf": q_similarity_ann_ivf,
    "q_text_stats": q_text_stats,
    "q_text_repetition": q_text_repetition,
    "q_gopher_quality": q_gopher_quality,
    "q_sample_by_source": q_sample_by_source,
    "q_text_langid": q_text_langid,
    "q_text_token_counts": q_text_token_counts,
    "q_text_fingerprint": q_text_fingerprint,
    "q_text_chunks": q_text_chunks,
    "q_embedding_quantize": q_embedding_quantize,
    "q_profile_events": q_profile_events,
    "q_anomaly_scores": q_anomaly_scores,
    "q_multimodal_features": q_multimodal_features,
    "q_multimodal_resize": q_multimodal_resize,
    "q_multimodal_png": q_multimodal_png,
    "q_multimodal_wav": q_multimodal_wav,
    "q_multimodal_resample": q_multimodal_resample,
    "q_multimodal_frame_sample": q_multimodal_frame_sample,
    "q_decontaminate": q_decontaminate,
    "q_temperature_mix": q_temperature_mix,
    "q_hash_split": q_hash_split,
    "q_dedup_spans": q_dedup_spans,
    "q_dedup_lines": q_dedup_lines,
    "q_dedup_lines_incremental": q_dedup_lines_incremental,
    "q_dedup_spans_overlap": q_dedup_spans_overlap,
    "q_winnow_fingerprints": q_winnow_fingerprints,
    "q_dedup_spans_candidates": q_dedup_spans_candidates,
    "q_dedup_spans_candidates_indexed": q_dedup_spans_candidates_indexed,
    "q_dedup_ngram_jaccard_indexed": q_dedup_ngram_jaccard_indexed,
    "q_lm_quality": q_lm_quality,
    "q_classifier_score": q_classifier_score,
    "q_importance_weights": q_importance_weights,
    "q_weighted_sample": q_weighted_sample,
    "q_stratified_sample": q_stratified_sample,
    "q_token_budget_mix": q_token_budget_mix,
    "q_distinct_sketch": q_distinct_sketch,
    "q_snapshot_diff": q_snapshot_diff,
    "q_frequent_items": q_frequent_items,
    "q_interleave_strata": q_interleave_strata,
    "q_corpus_profile": q_corpus_profile,
    "q_corpus_quantiles": q_corpus_quantiles,
    "q_quantile_sketch": q_quantile_sketch,
    "q_priority_sketch": q_priority_sketch,
    "q_multimodal_gif": q_multimodal_gif,
    "q_multimodal_frames": q_multimodal_frames,
    "q_multimodal_gif_anim": q_multimodal_gif_anim,
    "q_multimodal_jpeg": q_multimodal_jpeg,
    "q_multimodal_jpeg_420": q_multimodal_jpeg_420,
    "q_multimodal_transcode": q_multimodal_transcode,
    "q_media_curation": q_media_curation,
    "q_multimodal_wav8": q_multimodal_wav8,
    "q_multimodal_jpeg_prog": q_multimodal_jpeg_prog,
    "q_multimodal_video": q_multimodal_video,
    "q_c4_line_filter": q_c4_line_filter,
    "q_c4_pipeline": q_c4_pipeline,
    "q_pii_redact": q_pii_redact,
    "q_quality_selection": q_quality_selection,
    "q_topic_clusters": q_topic_clusters,
    "q_dedup_semantic": q_dedup_semantic,
}

ORACLE = {
    "q_dedup_exact": Q_DEDUP_EXACT_SQL,
    "q_dedup_minhash": Q_DEDUP_MINHASH_SQL,
    "q_dedup_clusters": _make_clusters_sql(),
    "q_dedup_ngram_jaccard": Q_DEDUP_NGRAM_SQL,
    "q_dedup_simhash": Q_DEDUP_SIMHASH_SQL,
    "q_dedup_simhash_pairs": Q_DEDUP_SIMHASH_PAIRS_SQL,
    "q_dedup_embedding": Q_DEDUP_EMBEDDING_SQL,
    "q_corpus_curation": Q_CORPUS_CURATION_SQL,
    "q_shard_packing": Q_SHARD_PACKING_SQL,
    "q_sequence_pack": Q_SEQUENCE_PACK_SQL,
    "q_sequence_texts": Q_SEQUENCE_TEXTS_SQL,
    "q_sequence_materialize": Q_SEQUENCE_MATERIALIZE_SQL,
    "q_text_normalize": Q_TEXT_NORMALIZE_SQL,
    "q_dedup_incremental": Q_DEDUP_INCREMENTAL_SQL,
    "q_dedup_incremental_indexed": Q_DEDUP_INCREMENTAL_SQL,
    "q_similarity_bruteforce": Q_SIMILARITY_SQL,
    "q_text_stats": Q_TEXT_STATS_SQL,
    "q_text_repetition": Q_TEXT_REPETITION_SQL,
    "q_gopher_quality": Q_GOPHER_QUALITY_SQL,
    "q_sample_by_source": Q_SAMPLE_BY_SOURCE_SQL,
    "q_text_langid": Q_TEXT_LANGID_SQL,
    "q_text_token_counts": Q_TEXT_TOKENS_SQL,
    "q_text_fingerprint": Q_TEXT_FINGERPRINT_SQL,
    "q_text_chunks": Q_TEXT_CHUNKS_SQL,
    "q_embedding_quantize": Q_EMBED_QUANT_SQL,
    "q_profile_events": Q_PROFILE_SQL,
    "q_anomaly_scores": Q_ANOMALY_SQL,
    "q_multimodal_features": Q_MULTIMODAL_FEATURES_SQL,
    "q_multimodal_resize": Q_MULTIMODAL_RESIZE_SQL,
    "q_multimodal_png": Q_MULTIMODAL_PNG_SQL,
    "q_multimodal_wav": Q_MULTIMODAL_WAV_SQL,
    "q_multimodal_resample": Q_MULTIMODAL_RESAMPLE_SQL,
    "q_multimodal_frame_sample": Q_MULTIMODAL_FRAMES_SQL,
    "q_decontaminate": Q_DECONTAMINATE_SQL,
    "q_similarity_ann_lsh": Q_SIMILARITY_ANN_LSH_SQL,
    "q_similarity_ann_ivf": _make_ivf_sql(),
    "q_temperature_mix": Q_TEMPERATURE_MIX_SQL,
    "q_hash_split": _hash_split_sql(),
    "q_dedup_spans": Q_DEDUP_SPANS_SQL,
    "q_dedup_lines": Q_DEDUP_LINES_SQL,
    "q_dedup_lines_incremental": Q_DEDUP_LINES_INCREMENTAL_SQL,
    "q_dedup_spans_overlap": Q_DEDUP_SPANS_OVERLAP_SQL,
    "q_winnow_fingerprints": Q_WINNOW_FINGERPRINTS_SQL,
    "q_dedup_spans_candidates": Q_DEDUP_SPANS_CANDIDATES_SQL,
    "q_dedup_spans_candidates_indexed": Q_DEDUP_SPANS_CANDIDATES_SQL,
    "q_dedup_ngram_jaccard_indexed": Q_DEDUP_NGRAM_SQL,
    "q_lm_quality": Q_LM_QUALITY_SQL,
    "q_classifier_score": Q_CLASSIFIER_SCORE_SQL,
    "q_importance_weights": Q_IMPORTANCE_WEIGHTS_SQL,
    "q_weighted_sample": Q_WEIGHTED_SAMPLE_SQL,
    "q_stratified_sample": Q_STRATIFIED_SAMPLE_SQL,
    "q_token_budget_mix": Q_TOKEN_BUDGET_MIX_SQL,
    "q_distinct_sketch": Q_DISTINCT_SKETCH_SQL,
    "q_snapshot_diff": Q_SNAPSHOT_DIFF_SQL,
    "q_frequent_items": Q_FREQUENT_ITEMS_SQL,
    "q_interleave_strata": Q_INTERLEAVE_STRATA_SQL,
    "q_corpus_profile": Q_CORPUS_PROFILE_SQL,
    "q_corpus_quantiles": Q_CORPUS_QUANTILES_SQL,
    "q_quantile_sketch": Q_QUANTILE_SKETCH_SQL,
    "q_priority_sketch": Q_PRIORITY_SKETCH_SQL,
    "q_multimodal_gif": Q_MULTIMODAL_GIF_SQL,
    "q_multimodal_frames": Q_MULTIMODAL_GIF_FRAMES_SQL,
    "q_multimodal_gif_anim": Q_MULTIMODAL_GIF_ANIM_SQL,
    "q_multimodal_jpeg": Q_MULTIMODAL_JPEG_SQL,
    "q_multimodal_jpeg_420": Q_MULTIMODAL_JPEG_420_SQL,
    "q_multimodal_transcode": Q_MULTIMODAL_TRANSCODE_SQL,
    "q_media_curation": Q_MEDIA_CURATION_SQL,
    "q_multimodal_wav8": Q_MULTIMODAL_WAV8_SQL,
    "q_multimodal_jpeg_prog": Q_MULTIMODAL_JPEG_PROG_SQL,
    "q_multimodal_video": Q_MULTIMODAL_VIDEO_SQL,
    "q_c4_line_filter": Q_C4_LINE_FILTER_SQL,
    "q_c4_pipeline": Q_C4_PIPELINE_SQL,
    "q_pii_redact": Q_PII_REDACT_SQL,
    "q_quality_selection": Q_QUALITY_SELECTION_SQL,
    "q_topic_clusters": _make_topic_clusters_sql(),
    "q_dedup_semantic": _make_semantic_sql(),
}
