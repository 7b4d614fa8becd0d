"""Regression tests for the session-15 review findings: NULL review
decisions, chunking stride bounds, streaming id hygiene (NULL ids, id
type normalization), dedup-store cap pinning, decimal-exact cumsum
offsets, and the widen-narrow-scan plan heuristic."""

from decimal import Decimal

import pytest
from pyspark.sql import functions as F


def test_apply_review_decisions_null_decision_is_hard_error(spark):
    from zentity_spark.clustering import apply_review_decisions

    assign = spark.createDataFrame(
        [("a", "a"), ("b", "a")], "record_id string, cluster_id string")
    edges = spark.createDataFrame([("a", "b")], "src string, dst string")
    decisions = spark.createDataFrame(
        [("a", "b", None)], "src string, dst string, decision string")
    with pytest.raises(ValueError, match="unknown review decision"):
        apply_review_decisions(assign, edges, decisions)


def test_chunk_documents_rejects_stride_over_window(spark):
    from zentity_spark.extras import chunk_documents

    d = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="stride"):
        chunk_documents(d, window=2, stride=3)
    # stride == window stays legal (disjoint chunks)
    rows = chunk_documents(d, window=2, stride=2).orderBy("chunk_idx").collect()
    assert [r.chunk_text for r in rows] == ["a b", "c"]


def test_incremental_dedup_null_id_is_hard_error(spark, tmp_path):
    from zentity_spark.streaming import incremental_dedup

    in_dir = str(tmp_path / "in")
    spark.createDataFrame([(None, "some text"), ("1", "other")],
                          "doc_id string, text string") \
        .coalesce(1).write.parquet(in_dir)
    stream = (spark.readStream.schema("doc_id string, text string")
              .parquet(in_dir))
    q = incremental_dedup(spark, stream, str(tmp_path / "dd"),
                          checkpoint_dir=str(tmp_path / "ck"))
    with pytest.raises(Exception, match="unsupported doc id|NULL"):
        q.awaitTermination(120)
        if q.exception():
            raise Exception(str(q.exception()))


def test_incremental_dedup_pins_max_block_size(spark, tmp_path):
    from zentity_spark.streaming import incremental_dedup

    in_dir = str(tmp_path / "in")
    spark.createDataFrame([("1", "a b c d"), ("2", "e f g h")],
                          "doc_id string, text string") \
        .coalesce(1).write.parquet(in_dir)

    def mk(cap, ck):
        stream = (spark.readStream.schema("doc_id string, text string")
                  .parquet(in_dir))
        return incremental_dedup(
            spark, stream, out_root, max_block_size=cap,
            checkpoint_dir=str(tmp_path / ck))

    out_root = str(tmp_path / "dd")
    q = mk(10000, "ck1")
    q.awaitTermination(120)
    assert q.exception() is None
    # resuming the SAME store with a different candidate-block cap
    # mixes candidate-generation regimes — hard error at call time
    with pytest.raises(ValueError, match="cannot resume"):
        mk(99999, "ck1")


def test_incremental_ann_index_int_ids_queryable(spark, tmp_path):
    """vec_id arriving as INT is normalized to long at ingest —
    xxhash64 is type-sensitive, so without the cast the rb partition
    dirs would be computed from int hashes and the long-keyed query
    would prune to the wrong dir and miss committed vectors."""
    from zentity_spark.streaming import ann_index_query, incremental_ann_index

    dim = 8
    comps = F.array(*[
        ((F.crc32(F.concat_ws("_", F.col("vec_id"), F.lit(j))) % 2001)
         - 1000).cast("double") / 1000.0
        for j in range(dim)
    ])
    emb = (spark.range(40)
           .select(F.col("id").cast("int").alias("vec_id"))
           .select("vec_id",
                   F.concat(F.lit("v"), F.col("vec_id")).alias("label"),
                   comps.alias("embedding")))
    in_dir = str(tmp_path / "in")
    emb.coalesce(1).write.parquet(in_dir)
    stream = (spark.readStream
              .schema("vec_id int, label string, embedding array<double>")
              .parquet(in_dir))
    out_root = str(tmp_path / "ann")
    q = incremental_ann_index(spark, stream, out_root, dim=dim, bands=4,
                              planes_per_band=4, n_buckets=8,
                              checkpoint_dir=str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert q.exception() is None
    top = ann_index_query(spark, out_root, query_vec_id=5, k=3).collect()
    assert all(r.vec_id != 5 for r in top)
    assert len(top) > 0  # probe found committed vectors


def test_global_cumsum_decimal_exact_past_2_53(spark):
    from zentity_spark.blocking import global_cumsum

    d = Decimal("90071992547409.93")  # > 2^53 when scaled to cents
    rows = [(i, d) for i in range(20)]
    df = spark.createDataFrame(rows, "k int, v decimal(16,2)")
    out = {r["k"]: r["cum_v"] for r in
           global_cumsum(df, ["k"], ["v"]).collect()}
    for i in range(20):
        assert out[i] == d * (i + 1), f"row {i} drifted: {out[i]}"


def test_widen_narrow_scan_ignores_sortkey_column_name(spark, tmp_path):
    from zentity_spark.extras import widen_narrow_scan

    p = str(tmp_path / "t")
    spark.range(100).select(
        F.col("id").alias("SortKey"),
        F.col("id").alias("JoinHint"),
    ).coalesce(1).write.parquet(p)
    df = spark.read.parquet(p)
    assert df.rdd.getNumPartitions() == 1
    widened = widen_narrow_scan(df)
    assert (widened.rdd.getNumPartitions()
            == spark.sparkContext.defaultParallelism)
    # a genuinely shuffled plan is still left alone
    agg = df.groupBy("SortKey").count()
    assert widen_narrow_scan(agg) is agg
