"""Snapshot-committed table storage with resume.

Production target is Apache Iceberg (atomic snapshot commits, time
travel, resume from last committed snapshot). This container has no
Iceberg runtime jar, so this module implements the same COMMIT SEMANTICS
over parquet + JSON manifests:

  <root>/<table>/data/<snapshot-id>/part-*.parquet   (written first)
  <root>/<table>/snapshots/<NNNNNNNN>.json           (atomic rename commit)

A snapshot manifest records the stage name, a config fingerprint, row
count, and the data path. Readers resolve the LATEST committed manifest
whose fingerprint matches — exactly how the pipeline resumes: a stage
whose inputs and config are unchanged is served from its last snapshot
instead of recomputed. A crash between data write and manifest rename
leaves an orphan data dir and NO visible snapshot — the stage reruns,
which is the Iceberg crash-consistency contract.

Swapping in real Iceberg is a one-line change per call site
(`df.writeTo(table).createOrReplace()` / `spark.read.format("iceberg")`),
kept behind this facade.
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def snapshots(self, table: str) -> list[dict]:
        snap_dir = os.path.join(self._table_dir(table), "snapshots")
        if not os.path.isdir(snap_dir):
            return []
        out = []
        for fn in sorted(os.listdir(snap_dir)):
            if fn.endswith(".json"):
                with open(os.path.join(snap_dir, fn)) as fh:
                    out.append(json.load(fh))
        return out

    def latest(self, table: str, fingerprint: str | None = None) -> dict | None:
        snaps = self.snapshots(table)
        if fingerprint is not None:
            snaps = [s for s in snaps if s.get("fingerprint") == fingerprint]
        return snaps[-1] if snaps else None

    def commit(self, df: DataFrame, table: str, stage: str,
               fingerprint: str = "", extra: dict | None = None,
               partition_by: list[str] | None = None) -> dict:
        """Write data, then atomically commit the snapshot manifest.
        partition_by hash-bucket columns map to Iceberg's bucket
        transform — readers prune untouched buckets (streaming
        incremental linkage reads only touched kb/rb partitions)."""
        table_dir = self._table_dir(table)
        snap_dir = os.path.join(table_dir, "snapshots")
        os.makedirs(snap_dir, exist_ok=True)
        snap_id = uuid.uuid4().hex[:12]
        data_path = os.path.join(table_dir, "data", snap_id)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)

        spark = df.sparkSession
        # Read back with the writer's schema: an empty partitioned write
        # leaves no part files, so schema inference would fail (Iceberg
        # keeps the schema in table metadata for the same reason).
        schema_json = df.schema.json()
        rows = spark.read.schema(df.schema).parquet(data_path).count()
        seq = len(self.snapshots(table))
        manifest = {
            "snapshot_id": snap_id,
            "sequence": seq,
            "table": table,
            "stage": stage,
            "fingerprint": fingerprint,
            "data_path": data_path,
            "rows": rows,
            "schema": schema_json,
            "committed_at": time.time(),
            **(extra or {}),
        }
        # atomic commit: write manifest to a temp file, rename into place
        fd, tmp = tempfile.mkstemp(dir=snap_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
        os.rename(tmp, os.path.join(snap_dir, f"{seq:08d}.json"))
        return manifest

    def read(self, spark: SparkSession, table: str,
             fingerprint: str | None = None) -> DataFrame | None:
        snap = self.latest(table, fingerprint)
        if snap is None:
            return None
        return self._read_snapshot(spark, snap)

    @staticmethod
    def _read_snapshot(spark: SparkSession, snap: dict,
                       extra_paths: list[str] | None = None) -> DataFrame:
        reader = spark.read
        if snap.get("schema"):  # empty snapshots have no files to infer from
            from pyspark.sql.types import StructType
            reader = reader.schema(
                StructType.fromJson(json.loads(snap["schema"])))
        return reader.parquet(snap["data_path"], *(extra_paths or []))

    def read_all(self, spark: SparkSession, table: str) -> DataFrame | None:
        """Union of every committed snapshot — append semantics, used for
        the observability `metrics` table (each stage commit appends)."""
        snaps = self.snapshots(table)
        if not snaps:
            return None
        return self._read_snapshot(
            spark, snaps[-1], [s["data_path"] for s in snaps[:-1]])


def query_log_metrics(spark: SparkSession, query_log: list[dict],
                      run_id: str) -> DataFrame:
    """Seeded-mode per-hop query audit rows (S7, Job.java:166-197
    serializeLoggedQuery): one row per (hop, query, index) with the
    resolver filters and hit count, ready to commit to the metrics
    store alongside the batch pipeline's partition counters."""
    rows = [
        (
            run_id, int(q["hop"]), int(q["query"]), q["index"],
            ",".join(q["resolvers"]), ",".join(q["term_resolvers"]),
            int(q.get("seed_ids", 0)), int(q["hits"]),
            bool(q.get("timed_out", False)),
        )
        for q in query_log
    ]
    schema = (
        "run_id string, hop int, query int, index string, resolvers string,"
        " term_resolvers string, seed_ids int, hits int, timed_out boolean"
    )
    return spark.createDataFrame(rows, schema)


def partition_metrics(df: DataFrame, stage: str, run_id: str) -> DataFrame:
    """Per-partition lineage counters (north_rule requirement): one row
    per (run, stage, partition) with its row count — computed with
    spark_partition_id(), no extra scan beyond the aggregation."""
    return (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.count("*").alias("rows"))
        .select(
            F.lit(run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("_pid").alias("partition_id"),
            "rows",
            F.current_timestamp().alias("recorded_at"),
        )
    )
