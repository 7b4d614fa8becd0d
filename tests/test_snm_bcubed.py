"""Sorted-neighborhood blocking + B-cubed clustering metrics.

SNM (Hernández & Stolfo 1995): hand-computed windows over a known sort
order, brute-force parity on random data, and the scale invariant that
the global rank matches ORDER BY without a single-partition window.
B-cubed (Bagga & Baldwin 1998): textbook hand-worked example plus the
identity/degenerate clusterings where P, R are exactly 1 or known.
"""

import pytest
from pyspark.sql import functions as F

from zentity_spark.blocking import global_rank, sorted_neighborhood_pairs
from zentity_spark.clustering import bcubed_metrics


def test_global_rank_matches_order_by(spark):
    import random

    rng = random.Random(7)
    rows = [(f"k{rng.randrange(50):02d}", i) for i in range(500)]
    df = spark.createDataFrame(rows, "k string, id int").repartition(13)
    got = {
        r["id"]: r["rank"]
        for r in global_rank(df, ["k", "id"]).collect()
    }
    expect = {
        rid: i + 1
        for i, (_, rid) in enumerate(sorted(rows))
    }
    assert got == expect


def test_snm_hand_computed(spark):
    # sort order by key then id: b1, c2, d3, e4, f5 — window 3 pairs
    # each record with its 2 successors
    df = spark.createDataFrame(
        [("e", 4), ("b", 1), ("d", 3), ("c", 2), ("f", 5)], "k string, id int"
    )
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in sorted_neighborhood_pairs(df, "k", "id", window=3).collect()
    )
    assert got == [
        (1, 2, 1), (1, 3, 2),
        (2, 3, 1), (2, 4, 2),
        (3, 4, 1), (3, 5, 2),
        (4, 5, 1),
    ]


def test_snm_brute_force_parity(spark):
    import random

    rng = random.Random(11)
    rows = [("key%03d" % rng.randrange(40), i) for i in range(300)]
    df = spark.createDataFrame(rows, "k string, id int").repartition(9)
    w = 6
    got = sorted(
        (r["id_a"], r["id_b"], r["dist"])
        for r in sorted_neighborhood_pairs(df, "k", "id", window=w).collect()
    )
    ordered = [rid for _, rid in sorted(rows)]
    expect = sorted(
        (ordered[i], ordered[i + d], d)
        for i in range(len(ordered))
        for d in range(1, w)
        if i + d < len(ordered)
    )
    assert got == expect


def test_snm_window_validation(spark):
    df = spark.createDataFrame([("a", 1)], "k string, id int")
    with pytest.raises(ValueError):
        sorted_neighborhood_pairs(df, "k", "id", window=1)


def _metrics(spark, pred, gold):
    p = spark.createDataFrame(pred, "record_id string, cluster_id string")
    g = spark.createDataFrame(gold, "record_id string, gold_id string")
    return bcubed_metrics(p, g).collect()[0]


def test_bcubed_perfect(spark):
    pred = [("a", "1"), ("b", "1"), ("c", "2")]
    gold = [("a", "x"), ("b", "x"), ("c", "y")]
    m = _metrics(spark, pred, gold)
    assert m["n_records"] == 3
    assert m["bcubed_precision"] == pytest.approx(1.0)
    assert m["bcubed_recall"] == pytest.approx(1.0)
    assert m["bcubed_f1"] == pytest.approx(1.0)


def test_bcubed_all_singletons_vs_one_gold_class(spark):
    # every record its own cluster: precision 1; recall = 1/N each
    n = 8
    pred = [(str(i), str(i)) for i in range(n)]
    gold = [(str(i), "g") for i in range(n)]
    m = _metrics(spark, pred, gold)
    assert m["bcubed_precision"] == pytest.approx(1.0)
    assert m["bcubed_recall"] == pytest.approx(1.0 / n)


def test_bcubed_hand_worked(spark):
    # pred cluster A = {a,b,c} (gold x,x,y), cluster B = {d,e} (gold y,y)
    # per-record precision: a,b: 2/3; c: 1/3; d,e: 2/2 → mean = 11/15
    # per-record recall: gold x={a,b}: 2/2 each; gold y={c,d,e}:
    #   c: 1/3; d,e: 2/3 → mean = (1+1+1/3+2/3+2/3)/5 = 11/15
    pred = [("a", "A"), ("b", "A"), ("c", "A"), ("d", "B"), ("e", "B")]
    gold = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y"), ("e", "y")]
    m = _metrics(spark, pred, gold)
    assert m["bcubed_precision"] == pytest.approx(11 / 15)
    assert m["bcubed_recall"] == pytest.approx(11 / 15)
    assert m["bcubed_f1"] == pytest.approx(11 / 15)


def test_bcubed_inner_join_scope(spark):
    # records present in only one clustering are not scoreable
    pred = [("a", "A"), ("b", "A"), ("z", "Z")]
    gold = [("a", "x"), ("b", "x"), ("q", "x")]
    m = _metrics(spark, pred, gold)
    assert m["n_records"] == 2
    assert m["bcubed_precision"] == pytest.approx(1.0)
    assert m["bcubed_recall"] == pytest.approx(1.0)


def _pair_metrics(spark, pred, gold):
    from zentity_spark.clustering import pairwise_cluster_metrics

    p = spark.createDataFrame(pred, "record_id string, cluster_id string")
    g = spark.createDataFrame(gold, "record_id string, gold_id string")
    return pairwise_cluster_metrics(p, g).collect()[0]


def test_pairwise_hand_worked(spark):
    # same worlds as test_bcubed_hand_worked: contingency (A,x)=2,
    # (A,y)=1, (B,y)=2 → tp=2, sum_c=4, sum_g=4, n=5
    # exp = 4*4/10 = 1.6; ari = (2-1.6)/(4-1.6) = 1/6
    pred = [("a", "A"), ("b", "A"), ("c", "A"), ("d", "B"), ("e", "B")]
    gold = [("a", "x"), ("b", "x"), ("c", "y"), ("d", "y"), ("e", "y")]
    m = _pair_metrics(spark, pred, gold)
    assert m["pair_tp"] == 2
    assert m["pair_precision"] == pytest.approx(0.5)
    assert m["pair_recall"] == pytest.approx(0.5)
    assert m["pair_f1"] == pytest.approx(0.5)
    assert m["ari"] == pytest.approx(1 / 6)


def test_pairwise_perfect_and_trivial(spark):
    pred = [("a", "1"), ("b", "1"), ("c", "2")]
    gold = [("a", "x"), ("b", "x"), ("c", "y")]
    m = _pair_metrics(spark, pred, gold)
    assert (m["pair_precision"], m["pair_recall"], m["ari"]) == (1.0, 1.0, 1.0)
    # both all-singletons: chance-adjusted denominator 0 → ARI 1.0
    # (sklearn convention), precision/recall 0 (no same-cluster pairs)
    singles = [(x, x) for x in "abcd"]
    m2 = _pair_metrics(spark, singles, singles)
    assert m2["ari"] == pytest.approx(1.0)
    assert m2["pair_precision"] == 0.0 and m2["pair_f1"] == 0.0


def test_pairwise_vs_sklearn_formula_random(spark):
    # brute-force pair enumeration as the oracle on random worlds
    import itertools
    import random

    rng = random.Random(3)
    n = 60
    pred = [(str(i), str(rng.randrange(6))) for i in range(n)]
    gold = [(str(i), str(rng.randrange(4))) for i in range(n)]
    pm, gm = dict(pred), dict(gold)
    tp = fp = fn = 0
    for a, b in itertools.combinations(range(n), 2):
        sp = pm[str(a)] == pm[str(b)]
        sg = gm[str(a)] == gm[str(b)]
        tp += sp and sg
        fp += sp and not sg
        fn += sg and not sp
    m = _pair_metrics(spark, pred, gold)
    assert m["pair_tp"] == tp
    assert m["pair_precision"] == pytest.approx(tp / (tp + fp))
    assert m["pair_recall"] == pytest.approx(tp / (tp + fn))
