"""Unit semantics for round-3 operators: golden-record survivorship,
threshold sweep (incl. the global_cumsum two-pass helper), per-cluster
graph metrics (weighted path), and TF-adjustment's pair-sides default —
the branches the sf0.01 oracles don't reach."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from zentity_spark.blocking import global_cumsum
from zentity_spark.clustering import cluster_graph_metrics, threshold_sweep
from zentity_spark.fusion import golden_records
from zentity_spark.probabilistic import term_frequency_adjustment


def test_golden_records_rules_and_ties(spark):
    rows = [
        # cluster 1: modal tie a/b broken by smallest value; longest tie
        # by smallest; newest tie on ts by GREATEST value
        (1, "b", "xx", 5.0, "2020-01-02"),
        (1, "a", "yy", 3.0, "2020-01-02"),
        (1, "a", "z", 9.0, "2020-01-01"),
        (1, "b", None, 1.0, "2020-01-01"),
        # cluster 2: all-null name field survives as NULL
        (2, None, "qqq", 2.0, "2020-05-05"),
    ]
    df = spark.createDataFrame(
        rows, "cl int, name string, code string, amt double, ts string"
    )
    out = {
        r["cluster_id"]: r
        for r in golden_records(
            df, "cl",
            {"name": "most_frequent", "code": "longest",
             "amt": "max", "ts": "newest"},
            ts_col="ts",
        ).collect()
    }
    # modal: a and b both count 2 -> smallest value "a"
    assert out[1]["name"] == "a"
    # longest: xx and yy both len 2 -> smallest value "xx"
    assert out[1]["code"] == "xx"
    assert out[1]["amt"] == 9.0
    # newest: two rows at 2020-01-02 -> greatest value survives
    assert out[1]["ts"] == "2020-01-02"
    assert out[2]["name"] is None
    assert out[2]["code"] == "qqq"


def test_golden_records_validation(spark):
    df = spark.createDataFrame([(1, "a")], "cl int, v string")
    with pytest.raises(ValueError, match="unknown rules"):
        golden_records(df, "cl", {"v": "best"})
    with pytest.raises(ValueError, match="requires ts_col"):
        golden_records(df, "cl", {"v": "newest"})


def test_golden_records_most_frequent_only(spark):
    df = spark.createDataFrame(
        [(1, "x"), (1, "x"), (1, "y"), (2, None)], "cl int, v string"
    )
    out = {r["cluster_id"]: r["v"]
           for r in golden_records(df, "cl", {"v": "most_frequent"}).collect()}
    # cluster 2 (all-null field) still gets a row, with NULL
    assert out == {1: "x", 2: None}


def test_global_cumsum_matches_single_partition_window(spark):
    rows = [(i, (i * 7919) % 13, (i * 104729) % 5) for i in range(500)]
    df = spark.createDataFrame(rows, "k int, a int, b int").repartition(16)
    got = {
        r["k"]: (r["cum_a"], r["cum_b"])
        for r in global_cumsum(df, ["k"], ["a", "b"]).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r["k"]: (r["ca"], r["cb"])
        for r in df.withColumn("ca", F.sum("a").over(w))
        .withColumn("cb", F.sum("b").over(w)).collect()
    }
    assert got == want


def test_global_cumsum_double_column_no_truncation(spark):
    """Fractional sums must not be truncated through the partition
    offsets (regression: offsets were built with int() over a long
    schema, shifting every later partition by the dropped fraction)."""
    rows = [(i, 0.25) for i in range(200)]
    df = spark.createDataFrame(rows, "k int, x double").repartition(8)
    got = {r["k"]: r["cum_x"]
           for r in global_cumsum(df, ["k"], ["x"]).collect()}
    for k, v in got.items():
        assert v == pytest.approx((k + 1) * 0.25), (k, v)


def test_threshold_sweep_no_positives_recall_zero(spark):
    """All-negative labels: recall/f1 must be 0.0, not NULL."""
    df = spark.createDataFrame(
        [(0.9, 0), (0.5, 0)], "score double, label int"
    )
    for r in threshold_sweep(df, "score", "label").collect():
        assert r["recall"] == 0.0 and r["f1"] == 0.0


def test_threshold_sweep_hand_example(spark):
    # scores desc: 0.9(+), 0.8(+,-), 0.5(-)  -> thresholds 0.9/0.8/0.5
    df = spark.createDataFrame(
        [(0.9, 1), (0.8, 1), (0.8, 0), (0.5, 0)], "score double, label int"
    )
    out = {r["threshold"]: r for r in threshold_sweep(df, "score", "label").collect()}
    assert (out[0.9]["tp"], out[0.9]["fp"], out[0.9]["fn"]) == (1, 0, 1)
    assert out[0.9]["precision"] == 1.0 and out[0.9]["recall"] == 0.5
    assert (out[0.8]["tp"], out[0.8]["fp"]) == (2, 1)
    assert out[0.8]["recall"] == 1.0
    assert (out[0.5]["tp"], out[0.5]["fp"]) == (2, 2)
    assert out[0.5]["precision"] == 0.5
    f1 = out[0.8]["f1"]
    p = 2 / 3
    assert abs(f1 - round(2 * p * 1.0 / (p + 1.0), 6)) < 1e-9


def test_cluster_graph_metrics_weighted(spark):
    assign = spark.createDataFrame(
        [("a", "c1"), ("b", "c1"), ("c", "c1"), ("d", "c2")],
        "record_id string, cluster_id string",
    )
    edges = spark.createDataFrame(
        # triangle minus one edge in c1; a cross-cluster edge (dropped)
        [("a", "b", 0.9), ("b", "c", 0.4), ("c", "d", 0.99)],
        "src string, dst string, w double",
    )
    out = {r["cluster_id"]: r
           for r in cluster_graph_metrics(assign, edges, weight_col="w").collect()}
    c1 = out["c1"]
    assert (c1["n_nodes"], c1["n_edges"]) == (3, 2)
    assert abs(c1["density"] - round(2 * 2 / (3 * 2), 6)) < 1e-9
    assert c1["min_weight"] == 0.4
    assert abs(c1["avg_weight"] - 0.65) < 1e-9
    c2 = out["c2"]  # singleton: no possible pairs -> density 0
    assert (c2["n_nodes"], c2["n_edges"], c2["density"]) == (1, 0, 0.0)


def test_tf_adjustment_unknown_value_falls_back_to_base(spark):
    """An agreeing value missing from tf_source must get the GENERIC
    agreement weight, not a NULL that poisons downstream weight sums
    (regression: left-join miss left tf_adj_weight NULL)."""
    pairs = spark.createDataFrame(
        [(1, 2, "ZETA", "ZETA")], "id_a int, id_b int, va string, vb string"
    )
    tf_source = spark.createDataFrame([("x",), ("y",)], "v string")
    r = term_frequency_adjustment(
        pairs, "va", "vb", 0.9, 0.2, tf_source=tf_source, tf_col="v"
    ).collect()[0]
    assert r["agree"] == 1 and r["tf"] is None
    assert r["tf_adj_weight"] == r["base_weight"]
    assert r["tf_adj_weight"] is not None


def test_tf_adjustment_pair_sides_default(spark):
    # tf over pair SIDES (no tf_source): 4 side slots, "x" fills 3
    pairs = spark.createDataFrame(
        [(1, 2, "x", "x"), (3, 4, "x", "y")],
        "id_a int, id_b int, va string, vb string",
    )
    out = {(r["id_a"], r["id_b"]): r
           for r in term_frequency_adjustment(pairs, "va", "vb", 0.9, 0.2).collect()}
    agree = out[(1, 2)]
    assert agree["agree"] == 1
    assert agree["tf"] == 0.75
    assert abs(agree["tf_adj_weight"] - round(math.log2(0.9 / 0.75), 6)) < 1e-9
    dis = out[(3, 4)]
    assert dis["agree"] == 0 and dis["tf"] is None
    assert dis["tf_adj_weight"] == dis["base_weight"]
    # rare agreement must outweigh common agreement
    assert agree["tf_adj_weight"] < round(math.log2(0.9 / 0.25), 6)
