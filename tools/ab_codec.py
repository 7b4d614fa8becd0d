"""Interleaved fresh-subprocess A/B of spark.io.compression.codec on
the headline pipeline (same methodology as bench.scaling_probe: fresh
JVM per run, pinned, best-of interleaved reps).

Usage: python tools/ab_codec.py [cpus] [reps] [entities]
"""

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

WORKER = """
import json, sys, time
sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession
from bench import run_pipeline
codec, cpus, ents = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"ab-{codec}")
    .config("spark.sql.shuffle.partitions", str(max(cpus * 2, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.driver.memory", "48g")
    .config("spark.io.compression.codec", codec)
    .config("spark.driver.extraJavaOptions", "-XX:+UseParallelGC")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
run_pipeline(spark, 2000)
w, nt, p, r, _ = run_pipeline(spark, ents)
spark.stop()
print(json.dumps({"codec": codec, "tps": round(nt / w, 1)}))
"""


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    ents = int(sys.argv[3]) if len(sys.argv) > 3 else 400000
    best = {"lz4": 0.0, "zstd": 0.0}
    for rep in range(reps):
        for codec in ("lz4", "zstd"):
            cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, "-c",
                   WORKER, codec, str(cpus), str(ents)]
            proc = subprocess.run(cmd, capture_output=True, text=True,
                                  timeout=3600)
            lines = [l for l in proc.stdout.strip().splitlines()
                     if l.startswith("{")]
            if proc.returncode != 0 or not lines:
                print(f"rep {rep} {codec} failed: "
                      + "\n".join(proc.stderr.splitlines()[-3:]),
                      file=sys.stderr)
                continue
            r = json.loads(lines[-1])
            best[codec] = max(best[codec], r["tps"])
            print(json.dumps({"rep": rep, **r}), flush=True)
    print(json.dumps({"cpus": cpus, "best": best,
                      "zstd_over_lz4": round(best["zstd"] / max(best["lz4"], 0.1), 3)}))


if __name__ == "__main__":
    main()
