"""bfs_depths regime parity: the driver-frontier fast path, the fully
distributed path, and the mid-walk handoff (a level outgrowing
driver_frontier_cap) must all return the same (record_id, hop) set.
The bfs_hops contract query oracle-checks the values against DuckDB's
recursive CTE; these tests pin the regime switching itself."""

from pyspark.sql import functions as F

from zentity_spark.clustering import bfs_depths


def _edges(spark):
    # chain a0-a1-...-a5 with a fan: a2 also connects to b0..b3
    rows = [("a%d" % i, "a%d" % (i + 1)) for i in range(5)]
    rows += [("a2", "b%d" % i) for i in range(4)]
    return spark.createDataFrame(rows, "src string, dst string")


def _run(spark, cap):
    seeds = spark.createDataFrame([("a0",)], "record_id string")
    out = bfs_depths(_edges(spark), seeds, max_hops=10,
                     driver_frontier_cap=cap)
    return sorted((r["record_id"], r["hop"]) for r in out.collect())


EXPECT = sorted(
    [("a0", 0), ("a1", 1), ("a2", 2), ("a3", 3), ("a4", 4), ("a5", 5)]
    + [("b%d" % i, 3) for i in range(4)]
)


def test_driver_regime(spark):
    assert _run(spark, cap=50_000) == EXPECT


def test_distributed_regime(spark):
    # seeds (1) > cap (0 is clamped by the <= test) — force distributed
    # from hop 0 via a cap smaller than the seed set
    seeds2 = spark.createDataFrame([("a0",), ("zz",)], "record_id string")
    out = bfs_depths(_edges(spark), seeds2, max_hops=10,
                     driver_frontier_cap=1)
    got = sorted((r["record_id"], r["hop"]) for r in out.collect())
    assert got == sorted(EXPECT + [("zz", 0)])


def test_midwalk_handoff(spark):
    # cap=2: hop 3's level {a3, b0..b3} (5 nodes) outgrows the cap, so
    # hops 0-3 run driver-side and hops 4+ run distributed; results
    # must be seamless across the handoff
    assert _run(spark, cap=2) == EXPECT


def test_max_hops_truncates(spark):
    seeds = spark.createDataFrame([("a0",)], "record_id string")
    out = bfs_depths(_edges(spark), seeds, max_hops=2,
                     driver_frontier_cap=50_000)
    got = sorted((r["record_id"], r["hop"]) for r in out.collect())
    assert got == [("a0", 0), ("a1", 1), ("a2", 2)]
    # and the same truncation distributed
    out2 = bfs_depths(_edges(spark), seeds, max_hops=2,
                      driver_frontier_cap=2)
    assert sorted((r["record_id"], r["hop"]) for r in out2.collect()) == got


def test_hub_level_hands_off_before_driver_collect(spark):
    # a0 -> h, h -> b0..b9 (a 10-wide level). cap=4: the driver regime
    # walks a0 -> h, then the RAW neighbor probe of {h} (11 ids incl.
    # a0) outgrows the cap, so the walk must hand off BEFORE
    # materializing the level and still produce exact depths.
    rows = [("a0", "h")] + [("h", "b%d" % i) for i in range(10)]
    edges = spark.createDataFrame(rows, "src string, dst string")
    seeds = spark.createDataFrame([("a0",)], "record_id string")
    out = bfs_depths(edges, seeds, max_hops=5, driver_frontier_cap=4)
    got = sorted((r["record_id"], r["hop"]) for r in out.collect())
    assert got == sorted(
        [("a0", 0), ("h", 1)] + [("b%d" % i, 2) for i in range(10)]
    )
