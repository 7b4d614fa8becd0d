"""Transitive clustering: large-star / small-star connected components.

The reference resolves transitivity by its hop loop — an iterative
expanding semi-join against Elasticsearch until no new documents arrive
(Job.java:1075-1172 traverse; fixpoint at Job.java:1110-1113). The batch
analog over ALL entities at once is connected components on the verified
edge set. We implement the large-star/small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14) —
GraphFrames-free, pure DataFrame self-joins, O(log n) rounds:

  large-star: every node connects its LARGER neighbors to its minimum
              neighborhood label
  small-star: every node connects its smaller-or-equal neighbors (and
              itself) to that minimum

Each round is checkpointed (localCheckpoint) to truncate the growing
lineage — without this the plan doubles per iteration and the driver
OOMs long before the data does. Convergence = edge set unchanged,
detected with a deterministic (count, xor-of-hashes) signature: one
cheap aggregate instead of a full anti-join per round.

Cluster id = min record_id of the component (deterministic; string
ordering), matching the reference's determinism discipline (TreeMap /
TreeSet everywhere, CONTRIBUTING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _signature(edges: DataFrame) -> tuple[int, int]:
    row = edges.select(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("src", "dst")), F.lit(0)).alias("h"),
    ).collect()[0]
    return (row["n"], row["h"])


def _large_star(edges: DataFrame, n_parts: int) -> DataFrame:
    # explicit hash partitioning on the join/group key: the groupBy and
    # the join both reuse it (no further exchange), and an explicit
    # numPartitions is exempt from AQE coalescing — the round runs at
    # the edge-sized parallelism regardless of the session setting
    b = edges.union(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).repartition(n_parts, "src")
    mins = b.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("m"))
    return (
        b.join(mins, "src")
        .where(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
        .where(F.col("src") != F.col("dst"))
        .repartition(n_parts, "src", "dst")
        .dropDuplicates()
    )


def _small_star(edges: DataFrame, n_parts: int) -> DataFrame:
    # orient larger → smaller
    b = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).where(F.col("src") != F.col("dst")).repartition(n_parts, "src")
    mins = b.groupBy("src").agg(F.min("dst").alias("m"))
    joined = b.join(mins, "src")
    nbr_edges = joined.select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    self_edges = joined.select("src", F.col("m").alias("dst"))
    return (
        nbr_edges.union(self_edges)
        .where(F.col("src") != F.col("dst"))
        .repartition(n_parts, "src", "dst")
        .dropDuplicates()
    )


def connected_components(edges: DataFrame, max_iterations: int = 50) -> DataFrame:
    """edges(src, dst) → assignments(record_id, cluster_id) for every
    node that appears in an edge. Callers add singletons (records with no
    edges) as their own clusters.

    Shuffle sizing: the edge set after verification is typically orders
    of magnitude smaller than the input, and each round runs ~6 small
    shuffles — at the session's shuffle-partition setting the loop is
    pure task-scheduling overhead (measured: 64-partition rounds were
    3× slower than the same loop at 8 partitions on a 133K-edge graph).
    The loop therefore sizes every round's shuffles to ~250K
    edges/partition via EXPLICIT repartition(numPartitions, keys) on the
    join/group keys (never above the session setting, so big edge sets
    keep full parallelism). Explicit repartitioning — rather than
    mutating spark.sql.shuffle.partitions for the loop's duration —
    keeps the override scoped to these queries: concurrent work on the
    same SparkSession is unaffected."""
    e = (
        edges.select(F.col("src").cast("string"), F.col("dst").cast("string"))
        .where(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    spark = e.sparkSession
    n_edges = e.count()
    try:
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        session_parts = spark.sparkContext.defaultParallelism
    target = min(session_parts, max(8, n_edges // 250_000 + 1))
    prev_sig = None
    for _ in range(max_iterations):
        # each star is checkpointed separately — NOT fused into one job:
        # _small_star consumes its joined input twice (neighbor + self
        # edges), so fusing duplicates the whole large-star subplan in
        # both union branches (measured 1.6× slower than the extra
        # materialization job it saves)
        e = _large_star(e, target).localCheckpoint()
        e = _small_star(e, target).localCheckpoint()
        sig = _signature(e)
        if sig == prev_sig:
            break
        prev_sig = sig
    # converged: e is a star graph node→root
    roots = e.select(F.col("dst").alias("record_id")).distinct().withColumn(
        "cluster_id", F.col("record_id")
    )
    members = e.select(F.col("src").alias("record_id"), F.col("dst").alias("cluster_id"))
    return members.union(roots).dropDuplicates(["record_id"])


def bfs_depths(edges: DataFrame, seeds: DataFrame, max_hops: int = 100) -> DataFrame:
    """Iterative BFS over the edge set from seed records → (record_id,
    hop). The batch counterpart of the reference's `_hop` decoration: a
    doc's hop is the first iteration whose accumulated values reach it,
    which equals its BFS depth from the hop-0 set (value accumulation =
    frontier expansion)."""
    sym = edges.select("src", "dst").union(edges.select(F.col("dst"), F.col("src")))
    sym = sym.toDF("src", "dst").distinct().localCheckpoint()
    visited = (
        seeds.select(F.col("record_id")).distinct()
        .withColumn("hop", F.lit(0)).localCheckpoint()
    )
    frontier = visited
    hop = 0
    while hop < max_hops:
        hop += 1
        nxt = (
            sym.join(frontier.select(F.col("record_id").alias("src")), "src")
            .select(F.col("dst").alias("record_id"))
            .distinct()
            .join(visited.select("record_id"), "record_id", "left_anti")
            .withColumn("hop", F.lit(hop))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        # visited stays a LAZY union of already-checkpointed frontiers:
        # every leaf is materialized so lineage stays shallow, and we
        # skip re-materializing the whole accumulated set each hop
        # (which cost an O(|visited|) job per hop)
        visited = visited.union(nxt)
        frontier = nxt
    return visited
