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
kept behind this facade; `iceberg_available()` is the capability probe
deciding which branch a deployment takes (always False in this sandbox —
documented substitution, no behavior change here).
"""

from __future__ import annotations

import json
import os
import tempfile
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_ICEBERG_PROBE: bool | None = None


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg Spark runtime is on the JVM classpath.

    Probes for the DataSource registration class rather than attempting
    a read (no table needed, no side effects). Deployments with the
    `iceberg-spark-runtime` jar + a configured catalog should route
    SnapshotStore commits through `df.writeTo(...)` and reads through
    `spark.read.format("iceberg")`; this sandbox has no jar and no
    network, so the parquet+manifest analog above is used everywhere
    (same commit semantics, documented substitution). Cached per
    process: the classpath cannot change under a running JVM."""
    global _ICEBERG_PROBE
    if _ICEBERG_PROBE is None:
        try:
            spark._jvm.java.lang.Class.forName(
                "org.apache.iceberg.spark.source.IcebergSource"
            )
            _ICEBERG_PROBE = True
        except Exception:
            _ICEBERG_PROBE = False
    return _ICEBERG_PROBE


def _parquet_rows(data_path: str) -> int:
    """Sum num_rows over every part file's footer under data_path
    (recursive: partitioned writes nest hive-style dirs). Local-FS
    analog of Iceberg's manifest record counts; an empty write has no
    part files and correctly counts 0.

    Matches Spark's HadoopFsUtils.shouldFilterOutPathName: a path
    component starting with '.' is always hidden; one starting with '_'
    is hidden UNLESS it contains '=' (a hive partition dir like
    `_col=v/` is read, `_temporary/` and `_SUCCESS` are not). A
    leftover staging part file must not be counted (manifest would
    over-count a read-back), and a partition column whose name starts
    with '_' must still be counted (it would under-count)."""
    import pyarrow.parquet as pq

    def hidden(name: str) -> bool:
        return name.startswith(".") or (
            name.startswith("_") and "=" not in name)

    total = 0
    for dirpath, dirs, files in os.walk(data_path):
        dirs[:] = [d for d in dirs if not hidden(d)]
        for fn in files:
            if fn.endswith(".parquet") and not hidden(fn):
                total += pq.ParquetFile(
                    os.path.join(dirpath, fn)).metadata.num_rows
    return total


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        # manifest cache: manifests are immutable once renamed into
        # place, so each file is parsed at most once per store instance.
        # Without this, every contains_fingerprint/commit/maintain call
        # re-opens the FULL history — O(batches) JSON parses per call,
        # O(batches²) over a stream's life (real Iceberg keeps this in
        # its metadata tree). Listing still hits the directory, so
        # manifests written by OTHER store instances are picked up.
        self._manifest_cache: dict[str, dict[str, dict]] = {}

    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def snapshots(self, table: str, include_replaced: bool = False) -> list[dict]:
        """Live snapshots in commit order. A compaction snapshot carries
        `replaces: [snapshot ids]`; the snapshots it replaced stay on
        disk as history (their manifests witness committed fingerprints
        for replay idempotence) but are hidden from reads — Iceberg's
        rewrite_data_files semantics."""
        snap_dir = os.path.join(self._table_dir(table), "snapshots")
        if not os.path.isdir(snap_dir):
            return []
        cache = self._manifest_cache.setdefault(table, {})
        names = sorted(fn for fn in os.listdir(snap_dir) if fn.endswith(".json"))
        for stale in set(cache) - set(names):  # externally removed
            del cache[stale]
        out = []
        for fn in names:
            m = cache.get(fn)
            if m is None:
                with open(os.path.join(snap_dir, fn)) as fh:
                    m = json.load(fh)
                cache[fn] = m
            out.append(m)
        if include_replaced:
            return out
        replaced = {sid for s in out for sid in s.get("replaces", [])}
        return [s for s in out if s["snapshot_id"] not in replaced]

    def latest(self, table: str, fingerprint: str | None = None) -> dict | None:
        snaps = self.snapshots(table)
        if fingerprint is not None:
            snaps = [s for s in snaps if s.get("fingerprint") == fingerprint]
        return snaps[-1] if snaps else None

    def contains_fingerprint(self, table: str, fingerprint: str) -> bool:
        """True if `fingerprint` was EVER committed, even if its snapshot
        was later compacted away — the correct replay-idempotence probe
        for streaming: a replayed micro-batch whose snapshot got
        compacted must not re-append (the compacted snapshot already
        holds its rows)."""
        return any(
            s.get("fingerprint") == fingerprint
            for s in self.snapshots(table, include_replaced=True)
        )

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

        # Schema from the writer, not read-back inference: an empty
        # partitioned write leaves no part files (Iceberg keeps the
        # schema in table metadata for the same reason).
        schema_json = df.schema.json()
        # Row count from the parquet FOOTERS, driver-side — exactly how
        # Iceberg manifests record per-file counts at write time. This
        # replaces a read-back Spark count job per commit (pure
        # scheduling overhead on small micro-batches: ~0.2-0.5s each,
        # dozens per stream) and still validates the write (a truncated
        # part file fails footer parse here, loudly).
        rows = _parquet_rows(data_path)
        # next sequence from manifest FILES (not live snapshots: replaced
        # manifests stay on disk, and reusing their number would clobber)
        seq = 1 + max(
            (s["sequence"] for s in self.snapshots(table, include_replaced=True)),
            default=-1,
        )
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
        # atomic + DURABLE commit: fsync the manifest bytes before the
        # rename and the directory entry after it — without the fsyncs a
        # power loss can leave a VISIBLE zero-length manifest (rename
        # journaled before the data), which would brick every later
        # snapshots() with a JSONDecodeError instead of the documented
        # "orphan data dir, no visible snapshot" crash contract
        fd, tmp = tempfile.mkstemp(dir=snap_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(manifest, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.rename(tmp, os.path.join(snap_dir, f"{seq:08d}.json"))
        dfd = os.open(snap_dir, os.O_RDONLY)
        try:
            os.fsync(dfd)
        finally:
            os.close(dfd)
        return manifest

    def read(self, spark: SparkSession, table: str,
             fingerprint: str | None = None) -> DataFrame | None:
        snap = self.latest(table, fingerprint)
        if snap is None:
            return None
        return self._read_snapshot(spark, snap)

    @staticmethod
    def _read_snapshot(spark: SparkSession, snap: dict) -> DataFrame:
        reader = spark.read
        if snap.get("schema"):  # empty snapshots have no files to infer from
            from pyspark.sql.types import StructType
            reader = reader.schema(
                StructType.fromJson(json.loads(snap["schema"])))
        return reader.parquet(snap["data_path"])

    def _read_union(self, spark: SparkSession, snaps: list[dict]) -> DataFrame:
        """Union snapshots one root at a time: a multi-path read of
        partitioned snapshot dirs trips Spark's partition discovery
        (CONFLICTING_DIRECTORY_STRUCTURES — each root is its own table
        layout). Snapshot count is bounded by maintain()'s geometric
        invariant, so the union stays O(log) wide."""
        from functools import reduce

        return reduce(
            DataFrame.unionByName,
            [self._read_snapshot(spark, s) for s in snaps],
        )

    def read_all(self, spark: SparkSession, table: str) -> DataFrame | None:
        """Union of every committed snapshot — append semantics, used for
        the observability `metrics` table (each stage commit appends)."""
        snaps = self.snapshots(table)
        if not snaps:
            return None
        return self._read_union(spark, snaps)

    def compact(self, spark: SparkSession, table: str,
                partition_by: list[str] | None = None,
                min_snapshots: int = 2, expire_data: bool = True,
                snapshots: list[dict] | None = None) -> dict | None:
        """Rewrite live snapshots (default: all) of an append table into
        ONE (Iceberg rewrite_data_files + expire_snapshots). Long-running
        streams append a snapshot per micro-batch, so without
        maintenance the per-read file count — and _read_bucket_dirs's
        per-snapshot path listing — grows without bound.

        Crash safety: the commit point is the compacted snapshot's
        manifest rename, which atomically carries `replaces`; a crash
        before it leaves the table untouched, a crash after it (mid
        data-dir expiry) leaves unreadable orphan dirs, exactly
        Iceberg's expire contract. Replaced manifests stay on disk so
        contains_fingerprint still witnesses every committed batch."""
        snaps = self.snapshots(table) if snapshots is None else snapshots
        if len(snaps) < min_snapshots:
            return None
        df = self._read_union(spark, snaps)
        manifest = self.commit(
            df, table, stage="compact",
            fingerprint=f"compact-{snaps[-1]['sequence']}",
            extra={"replaces": [s["snapshot_id"] for s in snaps],
                   "replaced_fingerprints": [s.get("fingerprint", "")
                                             for s in snaps]},
            partition_by=partition_by,
        )
        if expire_data:
            import shutil

            for s in snaps:
                shutil.rmtree(s["data_path"], ignore_errors=True)
        return manifest

    def commit_overwrite(self, df: DataFrame, table: str, stage: str,
                         fingerprint: str = "",
                         expire_data: bool = True) -> dict:
        """Overwrite-semantics commit (Iceberg REPLACE): the new snapshot
        replaces every live snapshot and the replaced data dirs are
        expired. For latest-semantics tables (e.g. the streaming
        per-batch clusters view) this keeps storage at ONE live
        snapshot instead of one corpus-sized snapshot per micro-batch,
        while replaced manifests still witness every fingerprint. Crash
        windows: before the manifest rename nothing changed; after it,
        a crash mid-expiry leaves unreadable orphan dirs (the Iceberg
        expire contract)."""
        prev = self.snapshots(table)
        manifest = self.commit(
            df, table, stage=stage, fingerprint=fingerprint,
            extra={"replaces": [s["snapshot_id"] for s in prev]} if prev else None,
        )
        if expire_data:
            import shutil

            for s in prev:
                shutil.rmtree(s["data_path"], ignore_errors=True)
        return manifest

    def maintain(self, spark: SparkSession, table: str,
                 partition_by: list[str] | None = None,
                 expire_data: bool = True) -> list[dict]:
        """Logarithmic merge maintenance (Bentley–Saxe / LSM
        size-tiering): restore the geometric invariant that every live
        snapshot holds at least as many rows as ALL snapshots committed
        after it combined, by merging the longest violating suffix and
        cascading. Live snapshot count stays O(log total rows) and each
        row is rewritten O(log total) times over the table's lifetime —
        unlike periodic full compaction, whose amortized per-batch cost
        is corpus-proportional. Safe to call every micro-batch: it's a
        manifest-listing no-op while the invariant holds."""
        merged = []
        while True:
            live = self.snapshots(table)
            cut = next(
                (i for i in range(len(live) - 1)
                 # max(rows,1): zero-row snapshots (valueless batches)
                 # must still merge away instead of piling up
                 if max(live[i]["rows"], 1)
                 < sum(max(s["rows"], 1) for s in live[i + 1:])),
                None,
            )
            if cut is None:
                return merged
            merged.append(self.compact(
                spark, table, partition_by=partition_by,
                expire_data=expire_data, snapshots=live[cut:]))


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
