"""Golden-record construction (survivorship / data fusion) over
resolved clusters.

The reference stops at the cluster: a resolution response returns every
matched document with its attributes and scores (Job.java hits array);
merging those documents into ONE canonical record per entity is the
step every MDM / entity-resolution deployment bolts on next (Bleiholder
& Naumann, "Data Fusion", ACM CS 2008 — the survivorship-rule
taxonomy). This module implements the standard rule set over a
(record, cluster) assignment as pure column aggregations:

  most_frequent  — the modal value; ties broken by SMALLEST value
  longest        — the longest string; ties broken by SMALLEST value
  newest         — the value on the row with the greatest `ts_col`;
                   ties broken by GREATEST value
  max / min      — numeric extremes

Scale shape: every rule is a groupBy(cluster) aggregation with
map-side partial combine — the only data-sized shuffles are keyed by
cluster id. most_frequent needs one extra (cluster, value)-grain
pre-aggregation per field; its per-cluster winners come back via a
cluster-keyed join of aggregated (already reduced) tables, never a
row-level join. Ties resolve via struct min/max encodings (JVM
lexicographic struct comparison), not window functions, so no
per-cluster sort materializes. NULL values are ignored per rule (an
all-NULL field yields NULL — survivorship picks evidence, not gaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES = ("most_frequent", "longest", "newest", "max", "min")


def golden_records(records: DataFrame, cluster_col: str,
                   rules: dict[str, str],
                   ts_col: str | None = None) -> DataFrame:
    """One canonical row per cluster: `cluster_id` + one column per
    entry of `rules` (field name → rule name from RULES), each carrying
    the surviving value under that rule. `ts_col` is required iff any
    field uses "newest"."""
    bad = {r for r in rules.values() if r not in RULES}
    if bad:
        raise ValueError(f"golden_records: unknown rules {sorted(bad)}")
    if "newest" in rules.values() and ts_col is None:
        raise ValueError("golden_records: rule 'newest' requires ts_col")

    cid = F.col(cluster_col).alias("cluster_id")
    aggs = []
    for field, rule in rules.items():
        v = F.col(field)
        if rule == "longest":
            # min(struct(-len, value)): longest first, then smallest value
            aggs.append(
                F.min(F.when(v.isNotNull(),
                             F.struct((-F.length(v)).alias("k"),
                                      v.alias("v"))))["v"].alias(field)
            )
        elif rule == "newest":
            aggs.append(
                F.max(F.when(v.isNotNull(),
                             F.struct(F.col(ts_col).alias("k"),
                                      v.alias("v"))))["v"].alias(field)
            )
        elif rule == "max":
            aggs.append(F.max(v).alias(field))
        elif rule == "min":
            aggs.append(F.min(v).alias(field))
    if aggs:
        base = records.groupBy(cid).agg(*aggs)
    else:
        base = records.select(cid).distinct()

    out = base
    for field, rule in rules.items():
        if rule != "most_frequent":
            continue
        v = F.col(field)
        counts = (
            records.where(v.isNotNull())
            .groupBy(cid, v.alias("_v"))
            .agg(F.count("*").alias("_c"))
        )
        # min(struct(-count, value)): modal first, then smallest value
        winner = counts.groupBy("cluster_id").agg(
            F.min(F.struct((-F.col("_c")).alias("k"),
                           F.col("_v").alias("v")))["v"].alias(field)
        )
        out = out.join(winner, "cluster_id", "left")
    return out


def entity_timeline(runs: DataFrame, run_col: str = "run_seq",
                    entity_col: str = "entity_id", attr_col: str = "attr",
                    value_col: str = "value") -> DataFrame:
    """SCD2-style attribute history across resolution runs — the
    temporal sibling of stable_entity_ids: once entity ids persist from
    run to run (clustering.stable_entity_ids), the next thing an MDM
    deployment records is WHEN each surviving attribute value held
    (slowly-changing-dimension type 2; Kimball's dimension-history
    pattern applied to golden-record output).

    Input: one row per (run, entity, attr) observation. Consecutive
    OBSERVATIONS (ordered by `run_col` within an (entity, attr)) that
    carry the same value collapse into one interval; a changed value
    opens a new interval (null-safe comparison: NULL is a value, not a
    wildcard). "Disappearance" only splits an interval when it is
    OBSERVED as a NULL-valued row for that run: lag() compares
    consecutive observations, not consecutive run_seq values, so an
    (entity, attr) simply ABSENT from an intermediate run is bridged
    into one interval (absence means "this run didn't assert the
    attribute", not "the value was retracted"). Emit explicit NULL
    observations if retraction should break intervals. Returns
    (entity_id, attr, value, first_run, last_run, n_runs, is_current)
    with is_current marking each (entity, attr)'s most recent interval.

    Scale shape: the lag/segment window partitions by (entity, attr)
    — partition size is bounded by the NUMBER OF RUNS (single digits
    in practice), never by corpus size, so the window sort is safe at
    any entity count; the island collapse is one keyed aggregation and
    the is_current flag one argmax self-join of the already-aggregated
    intervals table (same struct-min encoding as golden_records, no
    second window).
    """
    from pyspark.sql import Window

    e = F.col(entity_col).alias("entity_id")
    base = runs.select(e, F.col(attr_col).alias("attr"),
                       F.col(run_col).cast("long").alias("run_seq"),
                       F.col(value_col).alias("value"))
    w = Window.partitionBy("entity_id", "attr").orderBy("run_seq")
    seg = (
        base.withColumn("_prev", F.lag("value").over(w))
        .withColumn("_first", F.row_number().over(w) == 1)
        .withColumn(
            "_chg",
            (F.col("_first") | ~F.col("value").eqNullSafe(F.col("_prev")))
            .cast("int"),
        )
        .withColumn("_seg", F.sum("_chg").over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
    )
    intervals = seg.groupBy("entity_id", "attr", "_seg").agg(
        F.first("value").alias("value"),
        F.min("run_seq").alias("first_run"),
        F.max("run_seq").alias("last_run"),
        F.count("*").alias("n_runs"),
    )
    latest = intervals.groupBy("entity_id", "attr").agg(
        F.max("last_run").alias("_latest"))
    return (
        intervals.join(latest, ["entity_id", "attr"])
        .select(
            "entity_id", "attr", "value", "first_run", "last_run",
            "n_runs",
            (F.col("last_run") == F.col("_latest")).alias("is_current"),
        )
    )
