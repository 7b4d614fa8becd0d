"""Salted hot-block candidate generation must produce exactly the same
pair set as the plain self-join, while spreading a hot block's pairs
over multiple salt partitions."""

from pyspark.sql import functions as F

from zentity_spark.blocking import candidate_pairs


def _blocks(spark):
    # one hot key (600 records), several cold keys (10 records each)
    hot = spark.range(600).select(
        F.lit("r").alias("resolver"),
        F.lit(0).cast("long").alias("ckey"),
        F.concat(F.lit("h"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("record_id"),
    )
    cold = spark.range(50).select(
        F.lit("r").alias("resolver"),
        (F.col("id") % 5 + 1).cast("long").alias("ckey"),
        F.concat(F.lit("c"), F.lpad(F.col("id").cast("string"), 4, "0")).alias("record_id"),
    )
    return hot.unionByName(cold)


def _pairset(df):
    return {(r["id_l"], r["id_r"]) for r in df.collect()}


def test_salted_pairs_equal_unsalted(spark):
    blocks = _blocks(spark)
    plain, _ = candidate_pairs(blocks, max_block_size=None, salt_threshold=None)
    salted, _ = candidate_pairs(
        blocks, max_block_size=None, salt_threshold=100, salt_target=50
    )
    p = _pairset(plain)
    s = _pairset(salted)
    assert len(p) == 600 * 599 // 2 + 5 * (10 * 9 // 2)
    assert p == s


def test_salt_does_not_touch_cold_blocks(spark):
    blocks = _blocks(spark)
    # threshold above every block size → salted path must be a no-op
    a, _ = candidate_pairs(blocks, max_block_size=None, salt_threshold=10_000)
    b, _ = candidate_pairs(blocks, max_block_size=None, salt_threshold=None)
    assert _pairset(a) == _pairset(b)


def test_cap_and_salt_compose(spark):
    blocks = _blocks(spark)
    # cap drops the hot block entirely; salting then applies to nothing
    capped, dropped = candidate_pairs(
        blocks, max_block_size=500, salt_threshold=100, salt_target=50
    )
    assert dropped.count() == 1  # the hot key was reported
    assert len(_pairset(capped)) == 5 * (10 * 9 // 2)
