"""Benchmark harness (driver contract).

Runs the headline entity-resolution pipeline over deterministic synthetic
transcripts (the workload the engine is built for) plus timed contract
queries over $SPARK_GRAFT_SF_DIR, and prints ONE JSON line:

  {"metric": ..., "value": <sec>, "unit": "sec",
   "queries": {...per-query sec...}, "sf": ...,
   "turns": N, "turns_per_sec": T, "pair_precision": p, "pair_recall": r}

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  BENCH_ENTITIES       override synthetic entity count
  BENCH_SCALING=1      also run the N vs 4N parallelism scaling probe
                       (local[8] vs local[32]) and report efficiency
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def make_spark(cpus: int, app: str = "zentity-bench"):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "48g")
        .getOrCreate()
    )


def run_pipeline(spark, n_entities: int):
    """Headline: full resolve_all on synthetic transcripts; returns
    (wall_sec, n_turns, precision, recall)."""
    from pyspark.sql import functions as F

    from zentity_spark.generator import BENCH_MODEL, synth_transcripts, true_pairs
    from zentity_spark.model import Model
    from zentity_spark.pipeline import ResolutionConfig, resolve_all

    turns = synth_transcripts(spark, n_entities=n_entities).localCheckpoint()
    n_turns = turns.count()

    t0 = time.time()
    result = resolve_all(
        spark,
        turns,
        Model(BENCH_MODEL),
        ResolutionConfig(entity_closure=False, max_block_size=5000,
                         max_value_frequency=100),
    )
    clusters = result.clusters.localCheckpoint()
    n_clusters = clusters.select("cluster_id").distinct().count()
    wall = time.time() - t0

    # pair-level quality vs ground truth (same-cluster pairs vs same-entity pairs)
    pred = (
        clusters.alias("l")
        .join(clusters.alias("r"), F.col("l.cluster_id") == F.col("r.cluster_id"))
        .where(F.col("l.record_id") < F.col("r.record_id"))
        .select(
            F.col("l.record_id").alias("id_l"), F.col("r.record_id").alias("id_r")
        )
    )
    truth = true_pairs(turns)
    tp = pred.join(truth, ["id_l", "id_r"]).count()
    np_ = pred.count()
    nt = truth.count()
    precision = tp / np_ if np_ else 1.0
    recall = tp / nt if nt else 1.0
    return wall, n_turns, precision, recall, n_clusters


QUERY_SUBSET = [
    "conv_assembly",
    "blocking_keys",
    "candidate_pairs",
    "pairs_levenshtein",
    "pairs_jaro_winkler",
    "connected_components",
    "composite_score",
    "dedup_exact",
    "minhash_signatures",
    "ann_topk",
    "text_quality",
    "sessionize",
]


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    n_entities = int(os.environ.get("BENCH_ENTITIES", "20000"))

    spark = make_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from zentity_spark.entry_queries import all_queries

    run_pipeline(spark, 1000)  # warm up JVM/codegen before timing
    wall, n_turns, precision, recall, n_clusters = run_pipeline(spark, n_entities)

    queries = {}
    qmap = all_queries()
    for name in QUERY_SUBSET:
        t0 = time.time()
        qmap[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        queries[name] = round(time.time() - t0, 3)

    out = {
        "metric": "resolve_all_wallclock",
        "value": round(wall, 3),
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "turns": n_turns,
        "turns_per_sec": round(n_turns / wall, 1),
        "entities": n_entities,
        "clusters": n_clusters,
        "pair_precision": round(precision, 6),
        "pair_recall": round(recall, 6),
        "cpus": cpus,
    }
    spark.stop()

    if os.environ.get("BENCH_SCALING") == "1":
        # scaling probe: the SAME job at two parallelism levels on the
        # same (larger) input — fixed driver costs must be amortized for
        # the comparison to measure compute scaling, hence the larger
        # default entity count
        sc_entities = int(os.environ.get("BENCH_SCALING_ENTITIES", "100000"))
        thr = {}
        for n in (8, 32):
            s = make_spark(n, app=f"zentity-scaling-{n}")
            s.sparkContext.setLogLevel("ERROR")
            run_pipeline(s, 2000)  # warm up JVM/codegen before timing
            w, nt, _, _, _ = run_pipeline(s, sc_entities)
            thr[n] = nt / w
            s.stop()
        out["scaling"] = {
            "throughput_local8": round(thr[8], 1),
            "throughput_local32": round(thr[32], 1),
            "efficiency_8_to_32": round((thr[32] / thr[8]) / 4.0, 4),
        }

    print(json.dumps(out))


if __name__ == "__main__":
    main()
