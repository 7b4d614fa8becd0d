"""Session-9 corpus ops: SemDeDup-style semantic dedup, unigram-LM
fluency scoring, per-doc TF-IDF keywords. The contract queries
oracle-check them against DuckDB on the testdata tables; these tests
pin the semantics on handcrafted fixtures (keeper rule, cluster
containment, exact log-prob arithmetic, rank tie-breaks)."""

import math

import pytest

from zentity_spark.extras import lm_quality, semantic_dedup, tfidf_keywords


def docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ----------------------------------------------------------------------
# semantic_dedup


def _emb_df(spark, rows, dim=4):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        f"vec_id long, embedding array<float>",
    )


def test_semantic_dedup_greedy_min_id_keeper(spark):
    # two tight bundles along different axes + one isolate; 2 centroids
    # put each bundle in its own cluster. Within a bundle every pair's
    # cosine is ~1, so only the min id survives.
    rows = [
        (0, [1, 0, 0, 0]),
        (1, [0.99, 0.01, 0, 0]),
        (2, [0.98, 0.02, 0, 0]),
        (10, [0, 0, 1, 0]),
        (11, [0, 0, 0.99, 0.01]),
        (20, [0, 1, 0, 0]),  # isolate: keeps regardless of cluster
    ]
    out = {
        r["vec_id"]: r
        for r in semantic_dedup(
            _emb_df(spark, rows), n_centroids=2, threshold=0.9, dim=4
        ).collect()
    }
    # the contract is the greedy min-id rule GIVEN the codebook's
    # assignment (the md5-sampled seeds may split a bundle across
    # clusters — the intra-cluster recall boundary SemDeDup accepts):
    # keep=False iff some lower-id vector in the SAME cluster has
    # cosine ≥ threshold
    vecs = dict(rows)

    def cos(a, b):
        va, vb = vecs[a], vecs[b]
        dot = sum(x * y for x, y in zip(va, vb))
        na = math.sqrt(sum(x * x for x in va))
        nb = math.sqrt(sum(x * x for x in vb))
        return round(dot / (na * nb), 6)

    for i, r in out.items():
        expect_keep = not any(
            j < i and out[j]["cid"] == r["cid"] and cos(i, j) >= 0.9
            for j in out
        )
        assert r["keep"] == expect_keep, (i, r)
    # the isolate has no ≥0.9 neighbor anywhere, so it must survive,
    # and the min id of each bundle always survives
    assert out[20]["keep"] and out[0]["keep"] and out[10]["keep"]
    # at least one true duplicate exists in the fixture and is dropped
    assert not all(r["keep"] for r in out.values())


def test_semantic_dedup_cross_cluster_pairs_ignored(spark):
    # identical vectors that the codebook splits across clusters must
    # BOTH be kept: the operator's contract is intra-cluster dedup (the
    # recall boundary SemDeDup accepts by design). With n_centroids =
    # n_vectors every vector seeds its own cluster (cid ties broken by
    # rounded cosine then cid, so each vector's own seed wins or ties
    # deterministically) — no pair shares a cluster.
    rows = [(0, [1, 0, 0, 0]), (1, [1, 0, 0, 0])]
    out = semantic_dedup(
        _emb_df(spark, rows), n_centroids=2, threshold=0.5, dim=4
    ).collect()
    cids = {r["vec_id"]: r["cid"] for r in out}
    if cids[0] == cids[1]:
        # identical vectors may still share a cluster (both cosines tie
        # on every centroid); then the greedy rule applies
        assert {r["vec_id"] for r in out if r["keep"]} == {0}
    else:
        assert all(r["keep"] for r in out)


def test_semantic_dedup_metrics_surface(spark):
    rows = [(i, [1.0 - i * 0.001, i * 0.001, 0, 0]) for i in range(6)]
    out, dropped = semantic_dedup(
        _emb_df(spark, rows), n_centroids=1, threshold=0.99, dim=4,
        with_metrics=True,
    )
    assert out.count() == 6
    # one cluster of 6, cap not hit → no dropped blocks
    assert dropped.count() == 0
    # cap smaller than the cluster → the whole cluster is dropped AND
    # reported; every vector then keeps (no pairs were generated)
    out2, dropped2 = semantic_dedup(
        _emb_df(spark, rows), n_centroids=1, threshold=0.99, dim=4,
        max_cluster_size=3, with_metrics=True,
    )
    assert dropped2.count() == 1
    assert all(r["keep"] for r in out2.collect())


# ----------------------------------------------------------------------
# lm_quality


def test_lm_quality_exact_arithmetic(spark):
    # corpus: a a a b  → p(a)=3/4, p(b)=1/4
    rows = [(0, "a a a"), (1, "b")]
    got = {r["doc_id"]: r for r in lm_quality(docs_df(spark, rows)).collect()}
    assert got[0]["n_tokens"] == 3
    assert got[0]["logprob_mean"] == pytest.approx(math.log(0.75), abs=1e-6)
    assert got[1]["n_tokens"] == 1
    assert got[1]["logprob_mean"] == pytest.approx(math.log(0.25), abs=1e-6)


def test_lm_quality_rare_tokens_score_lower(spark):
    rows = [
        (0, "the the the the the the the the"),
        (1, "zyxw qvut kjih gfed"),  # all singletons
    ]
    got = {r["doc_id"]: r for r in lm_quality(docs_df(spark, rows)).collect()}
    assert got[1]["logprob_mean"] < got[0]["logprob_mean"]


def test_lm_quality_empty_doc_is_null(spark):
    rows = [(0, "alpha beta"), (1, "   "), (2, "...!!!")]
    got = {r["doc_id"]: r for r in lm_quality(docs_df(spark, rows)).collect()}
    assert got[1]["n_tokens"] is None and got[1]["logprob_mean"] is None
    assert got[2]["n_tokens"] is None  # punctuation-only → zero tokens
    assert got[0]["n_tokens"] == 2


# ----------------------------------------------------------------------
# tfidf_keywords


def test_tfidf_keywords_scores_and_ranks(spark):
    # 2 docs; "common" appears in both (idf = ln(1) = 0), "rare" only in
    # doc 0 (idf = ln 2), twice (tf = 2)
    rows = [(0, "common rare rare"), (1, "common other")]
    got = tfidf_keywords(docs_df(spark, rows), k=5).collect()
    d0 = {r["token"]: r for r in got if r["doc_id"] == 0}
    assert d0["rare"]["kw_rank"] == 1
    assert d0["rare"]["score"] == pytest.approx(2 * math.log(2), abs=1e-6)
    assert d0["common"]["score"] == 0.0
    assert d0["rare"]["tf"] == 2


def test_tfidf_keywords_tie_break_and_cutoff(spark):
    # doc 0 has six singleton tokens all with the same score: the top-3
    # cutoff must pick the lexicographically first three (token ASC on
    # equal rounded score)
    rows = [(0, "delta echo alpha charlie bravo foxtrot"), (1, "zzz")]
    got = [
        r["token"]
        for r in tfidf_keywords(docs_df(spark, rows), k=3)
        .where("doc_id = 0")
        .orderBy("kw_rank")
        .collect()
    ]
    assert got == ["alpha", "bravo", "charlie"]
