"""ANN quality on a planted-cluster corpus.

The sf* embeddings are near-uniform random, so recall@k vs brute force
measures LSH concentration, not retrieval quality (a broken index can
still score ~0.5 there). The planted-cluster corpus
(generator.synth_clustered_embeddings) gives unambiguous ground truth:
a query's exact top-k are its cluster mates (within-cluster cosine
≈ 0.89 vs cross-cluster ≈ 0), so these recall assertions FAIL for a
broken index."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from zentity_spark.extras import (
    ann_topk_bruteforce,
    ann_topk_bucketed,
    ann_topk_ivf,
    banded_lsh_buckets,
)
from zentity_spark.generator import synth_clustered_embeddings

K = 10
QUERY = 7  # cluster 7 of 30


@pytest.fixture(scope="module")
def corpus(spark):
    # 30 clusters × 25 members = 750 vectors; each query has 24 true
    # mates, so exact top-10 is entirely within-cluster
    return synth_clustered_embeddings(
        spark, n_clusters=30, per_cluster=25, dim=64
    ).localCheckpoint()


@pytest.fixture(scope="module")
def brute(corpus):
    return {r["vec_id"] for r in ann_topk_bruteforce(corpus, QUERY, K).collect()}


def test_bruteforce_topk_is_cluster(corpus, brute):
    """Sanity of the planted ground truth: the exact top-k are cluster
    mates of the query (label = vec_id % n_clusters)."""
    assert len(brute) == K
    assert all(v % 30 == QUERY % 30 for v in brute)


def test_bucketed_recall_at_10(corpus, brute):
    got = {
        r["vec_id"]
        for r in ann_topk_bucketed(
            corpus, QUERY, K, dim=64, bands=16, planes_per_band=8
        ).collect()
    }
    recall = len(brute & got) / K
    assert recall >= 0.9, f"bucketed recall@10 = {recall}"


def test_ivf_recall_at_10(corpus, brute):
    got = {
        r["vec_id"]
        for r in ann_topk_ivf(
            corpus, QUERY, K, n_centroids=32, n_probe=8, n_iters=1
        ).collect()
    }
    recall = len(brute & got) / K
    assert recall >= 0.9, f"ivf recall@10 = {recall}"


def test_multiprobe_expands_probe_set_and_recall(corpus, brute):
    """multiprobe=1 probes Hamming-1 neighbor buckets: the probe set is
    a superset of the exact-bucket probe set, so recall can only stay
    or improve; with few bands it must recover the recall lost to the
    smaller band count."""
    bands, r = 8, 8
    b = banded_lsh_buckets(corpus, dim=64, bands=bands, planes_per_band=r)
    qb = b.where(F.col("vec_id") == QUERY).select("band", "bucket")

    def probe_ids(q):
        return {
            row["vec_id"]
            for row in b.join(F.broadcast(q), ["band", "bucket"])
            .where(F.col("vec_id") != QUERY).select("vec_id").distinct().collect()
        }

    exact = probe_ids(qb)
    variants = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << i)) for i in range(r)],
    )
    flipped = probe_ids(qb.select("band", F.explode(variants).alias("bucket")).distinct())
    assert exact <= flipped

    def recall(multiprobe):
        got = {
            row["vec_id"]
            for row in ann_topk_bucketed(
                corpus, QUERY, K, dim=64, bands=bands, planes_per_band=r,
                multiprobe=multiprobe,
            ).collect()
        }
        return len(brute & got) / K

    r0, r1 = recall(0), recall(1)
    assert r1 >= r0
    assert r1 >= 0.9, f"multiprobe recall@10 = {r1} (exact-bucket: {r0})"


def test_plane_expr_and_udf_bit_identical(spark):
    """The pure-expression bucket form (lsh_bucket_expr) is the parity
    REFERENCE for the Arrow-batched matmul UDF that replaced it in the
    hot path (PLANS.md rule 11): same md5-derived planes, same sign →
    bit packing, bit-identical buckets."""
    import random

    from pyspark.sql import functions as F

    from zentity_spark.extras import ann_lsh_buckets, lsh_bucket_expr

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)], 0) for i in range(64)]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")
    via_udf = {r["vec_id"]: r["bucket"]
               for r in ann_lsh_buckets(df, dim=16, n_planes=8).collect()}
    via_expr = {r["vec_id"]: r["bucket"]
                for r in df.select(
                    "vec_id",
                    lsh_bucket_expr(F.col("embedding"), 16, 8).alias("bucket"),
                ).collect()}
    assert via_udf == via_expr
