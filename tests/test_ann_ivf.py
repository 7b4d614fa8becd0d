"""IVF-flat ANN: Lloyd refinement, determinism, plan shape.

The n_iters=0 config is oracle-checked against DuckDB SQL in
test_oracles (query ann_ivf_topk); this covers what SQL can't:
the iterative Lloyd step, and the zero-shuffle plan claim.
"""

import random

from pyspark.sql import functions as F

from zentity_spark.extras import (
    ann_topk_bruteforce,
    ann_topk_ivf,
    ivf_assign,
    ivf_centroids,
)

SF_DIR = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_lloyd_refinement_is_deterministic_and_partitions_corpus(spark):
    e = _emb(spark)
    c1 = ivf_centroids(e, n_centroids=8, n_iters=2)
    c2 = ivf_centroids(e, n_centroids=8, n_iters=2)
    assert c1 == c2
    a = ivf_assign(e, c1)
    n = e.count()
    assert a.count() == n
    assert a.select("vec_id").distinct().count() == n
    # every assigned cid is a real codebook entry
    cids = {cid for cid, _ in c1}
    assert {r["cid"] for r in a.select("cid").distinct().collect()} <= cids


def test_refined_ivf_topk_recall(spark):
    e = _emb(spark)
    brute = [r["vec_id"] for r in ann_topk_bruteforce(e, 0, 10).collect()]
    ivf = [
        r["vec_id"]
        for r in ann_topk_ivf(e, 0, 10, n_centroids=8, n_probe=4, n_iters=1).collect()
    ]
    assert len(ivf) == 10
    # probing half the codebook over near-uniform random vectors must
    # beat the random-scan expectation (~n_probe/n_centroids = 0.5)
    assert len(set(brute) & set(ivf)) >= 5


def test_search_plan_has_no_shuffle(spark):
    e = _emb(spark)
    df = ann_topk_ivf(e, 0, 10, n_centroids=8, n_probe=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # scan → map (inline cid argmax) → filter → TakeOrderedAndProject:
    # the probe-pruned search must not shuffle or join
    assert "TakeOrderedAndProject" in plan
    for node in ("Exchange", "SortMergeJoin", "BroadcastHashJoin"):
        assert node not in plan, f"unexpected {node} in IVF search plan:\n{plan}"
