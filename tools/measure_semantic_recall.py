"""Measure SemDeDup (semantic_near_dups) recall vs brute force, and
k-means inertia vs iteration count (VERDICT r7 "Next #6"/"#8").

semantic_near_dups is ORACLE-EXACT for its declared, cluster-restricted
semantics; what the cluster restriction LOSES vs an unrestricted exact
pair scan is a measured property, mirrored on PERF.md like the LSH ANN
recall grid. Ground truth = the full a<b self-join at the same rounded
cosine threshold (quadratic — only feasible at small SF, which is the
point of measuring here and extrapolating by construction).

Usage: python tools/measure_semantic_recall.py [sf_dir] [--inertia]
Prints one JSON line per grid cell.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from firebolt_spark import get_spark  # noqa: E402
from firebolt_spark.catalog import load_table  # noqa: E402
from firebolt_spark.operators.similarity import (  # noqa: E402
    dot_fold, ivf_assign, norm, semantic_near_dups,
)


def true_pairs(emb, threshold):
    c = emb.select("vec_id", "embedding", norm("embedding").alias("_n"))
    a, b = c.alias("a"), c.alias("b")
    cos = F.round(
        dot_fold("a.embedding", "b.embedding")
        / (F.col("a._n") * F.col("b._n")), 4,
    )
    return (
        a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(F.col("a.vec_id").alias("va"),
                F.col("b.vec_id").alias("vb"), cos.alias("cos"))
        .filter(F.col("cos") >= threshold)
    )


def recall_grid(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding").persist()
    for threshold in (0.30, 0.35, 0.40):
        truth = {(r["va"], r["vb"])
                 for r in true_pairs(emb, threshold).collect()}
        for n_centroids in (4, 8, 16, 32, 64):
            for n_assign in (1, 2, 3):
                got = {(r["vec_a"], r["vec_b"])
                       for r in semantic_near_dups(
                           emb, threshold=threshold,
                           n_centroids=n_centroids, n_assign=n_assign,
                       ).collect()}
                assert got <= truth, "SemDeDup must be subset of exact"
                rec = len(got) / len(truth) if truth else 1.0
                print(json.dumps({
                    "sf_dir": sf_dir, "threshold": threshold,
                    "n_centroids": n_centroids, "n_assign": n_assign,
                    "true_pairs": len(truth), "found": len(got),
                    "recall": round(rec, 3),
                }), flush=True)


def inertia_vs_iters(spark, sf_dir):
    """Mean cosine similarity to the assigned centroid ("cohesion" —
    higher is better; 1 - cohesion is the cosine inertia) per Lloyd
    iteration count, for the kmeans_iters=2 default honesty note."""
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding").persist()
    for iters in (1, 2, 3, 4, 6):
        assigned, cents = ivf_assign(emb, 16, kmeans_iters=iters)
        coh = (
            assigned.join(F.broadcast(cents), "cluster")
            .select((dot_fold("embedding", "c_vec")
                     / (F.col("_norm") * F.col("c_norm"))).alias("s"))
            .agg(F.avg("s").alias("m"), F.min("s").alias("lo"))
            .collect()[0]
        )
        print(json.dumps({
            "sf_dir": sf_dir, "kmeans_iters": iters,
            "mean_cohesion": round(coh["m"], 4),
            "min_cohesion": round(coh["lo"], 4),
        }), flush=True)


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark("semantic-recall", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    if "--inertia" in sys.argv:
        inertia_vs_iters(spark, sf_dir)
    else:
        recall_grid(spark, sf_dir)
