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
