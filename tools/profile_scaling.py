"""Per-stage wall-clock profile of the bench pipeline at two parallelism
levels, to locate the serial fraction that caps scaling efficiency."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import make_spark

N = int(os.environ.get("PROF_ENTITIES", "100000"))


def profile(cpus):
    from pyspark.sql import functions as F

    from zentity_spark.generator import BENCH_MODEL, synth_transcripts
    from zentity_spark.model import Model
    from zentity_spark.compiler import compile_model
    from zentity_spark.transcripts import build_records, build_values, parse_turns
    from zentity_spark.blocking import blocking_keys, candidate_pairs
    from zentity_spark.pairs import gate_edges, verify_pairs
    from zentity_spark.clustering import connected_components

    spark = make_spark(cpus, f"prof-{cpus}")
    spark.sparkContext.setLogLevel("ERROR")
    t = {}

    turns = synth_transcripts(spark, n_entities=2000).localCheckpoint()
    turns.count()  # warm-up

    turns = synth_transcripts(spark, n_entities=N).localCheckpoint()
    n_turns = turns.count()

    compiled = compile_model(Model(BENCH_MODEL))

    def tick(name, fn):
        t0 = time.time()
        out = fn()
        t[name] = round(time.time() - t0, 2)
        return out

    values = tick("values+hotfilter", lambda: _values(spark, turns, compiled))
    records = tick(
        "build_records", lambda: build_records(values, compiled).localCheckpoint()
    )
    blocks = tick(
        "blocking_keys",
        lambda: blocking_keys(records, compiled, max_keys_per_record=256),
    )
    cand = tick(
        "candidate_pairs",
        lambda: candidate_pairs(blocks, max_block_size=5000)[0].localCheckpoint(),
    )
    t["n_cand"] = cand.count()
    pairs = tick("verify_pairs", lambda: verify_pairs(cand, compiled, records))
    edges = tick("gate_edges", lambda: gate_edges(pairs, compiled).localCheckpoint())
    t["n_edges"] = edges.count()
    cc = tick(
        "connected_components",
        lambda: connected_components(
            edges.select(F.col("id_l").alias("src"), F.col("id_r").alias("dst"))
        ).localCheckpoint(),
    )
    t["n_assigned"] = cc.count()
    clusters = tick(
        "final_join",
        lambda: records.select("record_id")
        .join(cc, "record_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "record_id"))
        .localCheckpoint(),
    )
    t["n_clusters"] = clusters.select("cluster_id").distinct().count()
    t["n_turns"] = n_turns
    t["total"] = round(sum(v for k, v in t.items() if not k.startswith("n_")), 2)
    spark.stop()
    return t


def _values(spark, turns, compiled):
    from pyspark.sql import functions as F

    from zentity_spark.transcripts import build_values

    values = build_values(spark, turns, compiled)
    hot = (
        values.groupBy("attribute", "raw")
        .agg(F.count_distinct("record_id").alias("freq"))
        .where(F.col("freq") > 100)
        .select("attribute", "raw")
    )
    return values.join(F.broadcast(hot), ["attribute", "raw"], "left_anti")


if __name__ == "__main__":
    import json

    for cpus in (int(a) for a in (sys.argv[1:] or ["8", "32"])):
        print(cpus, json.dumps(profile(cpus)))
