"""Driver contract for the spark-graft builder (PySpark target).

- entry(spark): flagship — full entity-resolution pipeline
  (transcripts → blocking → pairwise verify → connected components)
  over transcripts derived from /root/testdata/sf0.001/events.parquet.
- queries(): one entry per implemented operator from SURVEY.md §2 plus
  the training-data-pipeline operators (dedup / ANN / text analysis /
  multimodal plumbing) and the round-2 additions (seeded traversal +
  scope + terms + weights, generic JSON extraction, banded-LSH ANN).
- oracle_sql(): DuckDB-runnable ANSI SQL equivalents for EVERY query —
  including soundex (expressed as a SQL code-list pipeline) and the
  seeded hop traversals (recursive-CTE bipartite BFS).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: resolve all entities in the transcript table derived
    from sf0.001 events, returning (record_id, cluster_id)."""
    from zentity_spark.entry_queries import ER_MODEL, transcripts_from_events
    from zentity_spark.model import Model
    from zentity_spark.pipeline import ResolutionConfig, resolve_all

    turns = transcripts_from_events(spark, SF_SMOKE)
    result = resolve_all(
        spark,
        turns,
        Model(ER_MODEL),
        ResolutionConfig(entity_closure=False),
    )
    return result.clusters.orderBy("record_id")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from zentity_spark.entry_queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from zentity_spark.entry_queries import all_oracles

    return all_oracles()
